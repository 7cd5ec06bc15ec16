package graft

import org.apache.spark.sql.functions._
import graft.values.Warp

/** Coercion-algebra tests mirroring the reference's value-semantics matrix
  * (reference: WarpCore/Tests/WarpCoreTests/WarpCoreTests.swift:51-140). */
class WarpValueSpec extends SparkSpec {
  import spark.implicits._

  private def eval(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).collect()(0).get(0)

  test("\"13\" + 37 == 50 (string-number coercion, WarpCoreTests.swift:93)") {
    assert(eval(Warp.add(lit("13"), lit(37))) == 50.0)
  }

  test("\"12\" == 12 is true (lenient equality, WarpCoreTests.swift:122)") {
    assert(eval(Warp.eq(lit("12"), lit(12))) == true)
    assert(eval(Warp.eq(lit("12.0"), lit(12))) == true)
    assert(eval(Warp.neq(lit("12"), lit(13))) == true)
  }

  test("bool coerces to 1/0 in arithmetic (Value.swift:176-190)") {
    assert(eval(Warp.add(lit(true), lit(1))) == 2.0)
    assert(eval(Warp.add(lit(false), lit(1))) == 1.0)
  }

  test("numeric parse kernel edges: strictness, exponents, banned Inf (Value.swift:95-102,810-833)") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val p = (s: String) => Option(graft.functions.WarpNumExpr.parse(u(s))).map(_.doubleValue())
    assert(p("13") == Some(13.0) && p("-4.5") == Some(-4.5) && p(".5") == Some(0.5))
    assert(p("1e3") == Some(1000.0) && p("1E-2") == Some(0.01) && p("5.") == Some(5.0))
    assert(p("true") == Some(1.0) && p("FALSE") == Some(0.0))
    assert(p(" 5") == None && p("5 ") == None && p("") == None && p(".") == None)
    assert(p("1.2.3") == None && p("1e") == None && p("--5") == None && p("NaN") == None)
    assert(p("Infinity") == None && p("1e999") == None) // Inf is banned
  }

  test("strings with leading space do NOT parse as numbers (Value.swift:810-833)") {
    assert(eval(Warp.add(lit(" 13"), lit(1))) == null)
    assert(eval(Warp.add(lit("13x"), lit(1))) == null)
  }

  test("division by zero is invalid/null (Value.swift:511-520)") {
    assert(eval(Warp.div(lit(1), lit(0))) == null)
    assert(eval(Warp.mod(lit(1), lit(0))) == null)
  }

  test("pow of negative base with fractional exponent is invalid (NaN banned)") {
    assert(eval(Warp.pow(lit(-1.0), lit(0.5))) == null)
    assert(eval(Warp.pow(lit(2.0), lit(10))) == 1024.0)
  }

  test("& concatenates with coercion (Value.swift:503-509)") {
    assert(eval(Warp.cat(lit(1), lit("x"))) == "1x")
  }

  test("empty == empty is TRUE, unlike SQL (Value.swift:22-26)") {
    val nullCol = lit(null).cast("string")
    assert(eval(Warp.eq(nullCol, lit(null).cast("string"))) == true)
    assert(eval(Warp.eq(nullCol, lit("a"))) == false)
  }

  test("empty sorts below every value (WarpCoreTests.swift:77-78)") {
    assert(eval(Warp.lt(lit(null).cast("string"), lit(-1e9))) == true)
    assert(eval(Warp.gt(lit("1"), lit(null).cast("string"))) == true)
  }

  test("numeric cross-type ordering (\"9\" < 10)") {
    assert(eval(Warp.lt(lit("9"), lit(10))) == true)   // numeric, not lexicographic
    assert(eval(Warp.lt(lit("a"), lit("b"))) == true)
  }

  test("contains ~= is case-insensitive, ~~= strict (Value.swift:714-725)") {
    assert(eval(Warp.containsString(lit("Hello World"), lit("WORLD"))) == true)
    assert(eval(Warp.containsStringStrict(lit("Hello World"), lit("WORLD"))) == false)
  }

  test("regex match ±= insensitive / ±±= sensitive (Value.swift:727-749)") {
    assert(eval(Warp.matchesRegex(lit("Hello"), lit("^H.*O$"))) == true)
    assert(eval(Warp.matchesRegexStrict(lit("Hello"), lit("^H.*O$"))) == false)
  }

  test("filter keeps only strictly-true conditions (Data.swift:248-250)") {
    import graft.ops.WarpOps._
    val df = Seq(("a", "1"), ("b", "0"), ("c", "x"), ("d", "true")).toDF("k", "v")
    val kept = df.warpFilter(col("v")).select("k").as[String].collect().toSet
    assert(kept == Set("a", "d")) // "1" and "true" coerce to true; "x" invalid => dropped
  }
}
