package graft

import org.apache.spark.sql.functions._
import graft.formula.Formula
import graft.formula.Formula._

/** Formula parser tests mirroring the reference's parse/round-trip suites
  * (reference: WarpCoreTests.swift:670-756). */
class FormulaSpec extends SparkSpec {
  import spark.implicits._

  private def eval(formula: String): Any =
    Seq(1).toDF("x").select(Formula.column(formula).as("r")).collect()(0).get(0)

  private def evalOn(df: org.apache.spark.sql.DataFrame, formula: String): Any =
    df.select(Formula.column(formula).as("r")).collect()(0).get(0)

  test("arithmetic with precedence and parens") {
    assert(eval("=1+2*3") == 7.0)
    assert(eval("=(1+2)*3") == 9.0)
    assert(eval("=2^10") == 1024.0)
    assert(eval("=2^3^2") == 512.0) // right-assoc
    assert(eval("=-3+5") == 2.0)
    assert(eval("=10%3") == 1.0)    // binary modulo
  }

  test("percent and SI postfix multipliers (Language.swift:47)") {
    assert(eval("=50%") == 0.5)
    assert(eval("=2k") == 2000.0)
    assert(eval("=3M") == 3000000.0)
  }

  test("string literals, concatenation, coercion ('13'+37)") {
    assert(eval("=\"13\"+37") == 50.0)
    assert(eval("=\"a\" & \"b\" & 1") == "ab1")
    assert(eval("=UPPER(\"abc\")") == "ABC")
  }

  test("comparison operators incl. warp-specific ~= and ±=") {
    assert(eval("=1<2") == true)
    assert(eval("=\"12\"=12") == true)
    assert(eval("=\"Hello\"~=\"ELL\"") == true)
    assert(eval("=\"Hello\"~~=\"ELL\"") == false)
    assert(eval("=\"Hello\"±=\"^h.*o$\"") == true)
    assert(eval("=\"Hello\"±±=\"^h.*o$\"") == false)
    assert(eval("=1<>2") == true)
  }

  test("sibling column refs: [bracketed] and bare shorthand") {
    val df = Seq((3.0, 4.0)).toDF("a", "b")
    assert(evalOn(df, "=[a]+[b]") == 7.0)
    assert(evalOn(df, "=a*b") == 12.0)
    assert(evalOn(df, "=SQRT(a^2+b^2)") == 5.0)
  }

  test("foreign refs #[col] resolve via context") {
    val ctx = Ctx(
      sibling = n => lit(10).as(n),
      foreign = n => lit(32))
    val c = Formula.compile(Formula.parse("=[x]+#[y]"), ctx)
    assert(Seq(1).toDF("z").select(c).collect()(0).get(0) == 42.0)
  }

  test("identity @ resolves to inputValue (Expression.swift:290)") {
    val ctx = Ctx(inputValue = () => lit(5))
    val c = Formula.compile(Formula.parse("=@*2"), ctx)
    assert(Seq(1).toDF("z").select(c).collect()(0).get(0) == 10.0)
  }

  test("list literals, 1-based index, ->key lookup (Formula.swift grammar)") {
    assert(eval("={1;2;3}[2]") == 2.0)
    assert(eval("={\"k\";\"v\"}->\"k\"") == "v")
    assert(eval("=ITEMS({1;2;3})") == 3)
  }

  test("timestamp literal @123 is NSDate-epoch seconds (Value.swift:43-45)") {
    val r = eval("=@0")
    assert(r.toString.startsWith("2001-01-01"))
  }

  test("functions: IF/AND/OR, rounding, date parts") {
    assert(eval("=IF(1<2;\"y\";\"n\")") == "y")
    assert(eval("=IF(1<2,\"y\",\"n\")") == "y") // both separators
    assert(eval("=ROUND(2.345;2)") == 2.35)
    assert(eval("=YEAR.UTC(FROM.UNIX(0))") == 1970)
  }

  test("parse failures reject garbage (WarpCoreTests.swift:696-756)") {
    for (bad <- Seq("=1+", "=UPPER(", "=[unclosed", "=1 2", "=NOSUCHFN(1)", "={1;2"))
      assertThrows[IllegalArgumentException](eval(bad))
  }

  test("round-trip: parse(toFormula(parse(f))) == parse(f) (WarpCoreTests.swift:670-694)") {
    for (f <- Seq("=1+2*3", "=UPPER([name])&\"!\"", "=IF(a>1;{1;2};{3})",
                  "=SQRT(a^2+b^2)", "=\"x\"~=\"y\"", "=#[z]+@"))
      {
        val once = Formula.parse(f)
        val twice = Formula.parse("=" + Formula.toFormula(once))
        assert(once == twice, s"round-trip failed for $f")
      }
  }

  test("percent binds before minus regardless of spacing (reference has no binary %)") {
    // Formula.swift:329: modulus is `~` in the reference; % before `-` is
    // never a modulo operand, so `10%-3` reads (10%)-3. The spaced form
    // `10 % -3` is neither postfix (not adjacent) nor modulo: a parse
    // error, not a silent meaning switch — parenthesize for modulo.
    assert(eval("=10%-3") == -2.9)
    assertThrows[IllegalArgumentException](eval("=10 % -3"))
    assert(eval("=10%(-3)") == 10.0 % -3.0) // parenthesized operand: modulo
    assert(eval("=10%3") == 1.0)            // binary modulo still works
  }

  test("ANSI edges yield invalid, not job-killing throws") {
    assert(eval("={1;2}[5]") == null)  // out of range
    assert(eval("={1;2}[0]") == null)  // SQL arrays are 1-based
    assert(eval("""=READ.DATE("nonsense"; "yyyy-MM-dd")""") == null)
  }

  test("two-arg ROUND accepts computed decimals") {
    assert(eval("=ROUND(2.567; 1+1)") == 2.57)
    assert(eval("=ROUND(-2.5; 0)") == -3.0) // half away from zero
    val df = Seq((2.567, 2L)).toDF("x", "n")
    assert(evalOn(df, "=ROUND([x]; [n])") == 2.57)
  }

  test("string literals with backslashes round-trip through toFormula") {
    for (s <- Seq("a\\", "a\\\"b", "\\\\", "plain"))
      assert(Formula.parse("=" + Formula.toFormula(Formula.Lit(s))) == Formula.Lit(s), s)
  }

  test("nl: aliased canonicals unparse to their identity spelling") {
    // MIN has two nl spellings (MIN, KLEINSTE): unparse must pick the one
    // equal to the canonical, deterministically
    val nl = graft.values.WarpLanguage.nl
    val f = Formula.toFormula(Formula.parse("=MIN(1;2)", nl), nl)
    assert(f.startsWith("MIN("), f)
    assert(Formula.toFormula(Formula.parse("=GROOTSTE(1;2)", nl), nl).startsWith("MAX("))
  }

  test("nl: all 108 reference spellings parse to their canonical and round-trip") {
    val nl = graft.values.WarpLanguage.nl
    assert(nl.functionNames.size == 108) // complete Language.swift:252-358 table
    nl.functionNames.foreach { case (local, canon) =>
      Formula.parse(s"=$local(1)", nl) match {
        case Formula.Call(fn, _) => assert(fn == canon, s"$local -> $fn, want $canon")
        case other => fail(s"$local parsed to $other")
      }
      // unparse under nl, re-parse under nl: the canonical must survive
      val e = Formula.parse(s"=$local(1)", nl)
      Formula.parse("=" + Formula.toFormula(e, nl), nl) match {
        case Formula.Call(fn, _) => assert(fn == canon, s"$local round-trip lost $canon")
        case other => fail(s"$local round-tripped to $other")
      }
    }
  }

  test("constant folding: Catalyst folds literal subtrees (Expression.swift:43-48)") {
    // use a Range input (a LocalRelation would hide the folded Project);
    // the alias keeps the attribute name independent of the input tree
    val c = Formula.column("=1+2*3").as("r")
    val plan = spark.range(1).select(c).queryExecution.optimizedPlan.toString
    assert(plan.contains("7.0 AS r"), plan) // folded to a literal at plan time
  }

  // ==== empty-vs-invalid truth tables (Value.swift:22-45,
  //      Function.swift:973-1029,1509-1513, WarpCoreTests.swift:51-140) ====

  private val nullDf = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(null)),
      StructType(Seq(StructField("c", DoubleType))))
  }

  test("ISINVALID: true for errors, false for empty (Function.swift:1509-1513)") {
    assert(eval("=ISINVALID(1/0)") == true)
    assert(eval("=ISINVALID(4/2)") == false)
    assert(evalOn(nullDf, "=ISINVALID([c])") == false) // empty is VALID
    assert(evalOn(nullDf, "=ISEMPTY([c])") == true)
    assert(eval("=ISEMPTY(1/0)") == false)             // invalid is not empty
    assert(evalOn(nullDf, "=ISINVALID(1+[c])") == true) // 1 + empty is invalid
    assert(evalOn(nullDf, "=ISINVALID(UPPER([c]))") == true) // string fn on empty
  }

  test("IFERROR: fallback on invalid only; empty passes through (Function.swift:1028)") {
    assert(eval("=IFERROR(1/0;42)") == 42.0)
    assert(eval("=IFERROR(6/2;42)") == 3.0)
    assert(evalOn(nullDf, "=IFERROR([c];42)") == null) // empty stays empty
  }

  test("AND/OR: poison on invalid only; empty is just not-true (Function.swift:973-1010)") {
    assert(eval("=AND(1;TRUE)") == true)
    assert(eval("=AND(TRUE;FALSE)") == false)
    assert(evalOn(nullDf, "=AND(TRUE;[c])") == false)  // empty arg => false, not invalid
    assert(evalOn(nullDf, "=ISINVALID(AND(TRUE;[c]))") == false)
    assert(eval("=ISINVALID(AND(1/0;TRUE))") == true)  // invalid arg poisons
    assert(eval("=ISINVALID(OR(1/0;TRUE))") == true)
    assert(evalOn(nullDf, "=OR([c];TRUE)") == true)
    assert(eval("=NOT(1)") == false)
    assert(eval("=ISINVALID(NOT(1/0))") == true)
    assert(evalOn(nullDf, "=ISINVALID(NOT([c]))") == true) // empty has no bool form
  }

  test("comparisons: invalid equals nothing, empty equals empty (Value.swift:547-586)") {
    assert(eval("=(1/0)=(1/0)") == false)  // invalid == invalid is FALSE
    assert(eval("=(1/0)<>(1/0)") == true)
    assert(evalOn(nullDf, "=[c]=[c]") == true) // empty == empty
    assert(evalOn(nullDf, "=[c]=0") == false)  // empty is not zero
    assert(evalOn(nullDf, "=[c]=\"\"") == false) // empty is not empty string
  }

  test("WV operator edges: XOR/pow-NaN/concat-empty/modulo (Value.swift:484-545)") {
    assert(eval("=XOR(1;0)") == true)
    assert(eval("=XOR(TRUE;TRUE)") == false)
    assert(evalOn(nullDf, "=ISINVALID(XOR(TRUE;[c]))") == true) // empty: no bool form
    assert(eval("=ISINVALID((0-1)^0.5)") == true)  // NaN result is invalid
    assert(eval("=ISINVALID(1%0)") == true)        // mod by zero
    assert(evalOn(nullDf, "=ISINVALID(\"x\" & [c])") == true) // empty has no string form
    assert(evalOn(nullDf, "=[c]<0") == true)  // empty sorts below EVERY value
    assert(evalOn(nullDf, "=[c]<5") == true)  // (WarpCoreTests.swift:77-78)
    assert(evalOn(nullDf, "=[c]>0") == false)
    assert(eval("=IF(2;\"t\";\"f\")") == "f")      // boolValue(2) = false (int != 1)
    assert(eval("=ISINVALID(IF(2.5;1;2))") == true) // doubles have no bool form
  }

  test("COALESCE: first valid non-empty, else empty (Function.swift:985-991)") {
    assert(eval("=COALESCE(1/0;7)") == 7.0)
    assert(evalOn(nullDf, "=COALESCE([c];7)") == 7.0)
    assert(evalOn(nullDf, "=COALESCE([c];1/0)") == null)
  }

  test("locale: nl decimal comma, localized names, constants (Language.swift:69-380)") {
    import graft.values.WarpLanguage
    def evalNl(f: String): Any =
      Seq(1).toDF("x").select(Formula.compile(Formula.parse(f, WarpLanguage.nl)).as("r"))
        .collect()(0).get(0)
    assert(evalNl("=1,5+2") == 3.5)                       // decimal comma
    assert(evalNl("=ALS(1<2;\"j\";\"n\")") == "j")        // ALS = IF
    assert(evalNl("=GEMIDDELDE(1;2;3)") == 2.0)           // AVERAGE
    assert(evalNl("=WORTEL(16)") == 4.0)                  // SQRT
    assert(evalNl("=WAAR") == true)                       // constants
    assert(evalNl("=HOOFDLETTERS(\"ab\")") == "AB")       // UPPER
    assert(evalNl("=ALS.FOUT(1/0;42)") == 42.0)           // IFERROR
    assert(eval("=ISINVALID(ERROR)") == true)             // en invalid constant
    assert(evalNl("=LENGTE(\"abc\")+0") == 3.0)
  }

  test("locale: data-driven SI/IEC postfix multipliers (Language.swift:88-120)") {
    assert(eval("=2Ki") == 2048.0)
    assert(eval("=1Mi") == 1048576.0)
    assert(eval("=5m") == 0.005)   // milli
    assert(eval("=3T") == 3e12)    // tera
    assert(eval("=2E") == 2e18)    // exa: bare E is a postfix...
    assert(eval("=2E3") == 2000.0) // ...but E+digits is an exponent
  }

  test("scalar reducer forms and reference en spellings (Function.swift:17-20, Language.swift)") {
    assert(eval("=MEDIAN(1;2;3)") == 2.0)
    assert(eval("=MEDIAN(1;2;3;4)") == 2.5)
    assert(eval("=MEDIAN.LOW(1;2;3;4)") == 2.0)
    assert(eval("=MEDIAN.HIGH(1;2;3;4)") == 3.0)
    assert(eval("=MEDIAN.PACK(1;2;3;4)") == "2.0,3.0")
    assert(eval("=COUNT(1;\"x\";2)") == 2)       // numeric-convertible only
    assert(eval("=COUNTA(1;\"x\";2)") == 3)      // everything
    assert(eval("=VAR.S(1;2;3)") == 1.0)
    assert(eval("=STDEV.P(2;2;2)") == 0.0)
    assert(eval("=PACK.VALUES(\"a,b\";\"c\")") == "a$1b,c") // pack-escaped args
    assert(eval("=IDENTITY(42)") == 42L)
    // reference spellings alias onto the canonical table
    assert(eval("=REPLACE(\"a-b\";\"-\";\"+\")") == "a+b")
    assert(eval("=SIMILARITY(\"kitten\";\"sitting\")") == 3)
    assert(eval("=SMALL(3;1;2)") == 1.0)
    assert(eval("=SIZE.OF(ENCODE(\"ab\"))") == 2)
    assert(eval("=GLUE(LIST(\"a\";\"b\";\"c\");\"-\")") == "a-b-c")
    assert(eval("=SPLIT(\"a.b.c\";\".\")[2]") == "b") // literal separator, not regex
    assert(eval("=NTH(UNPACK(PACK(LIST(\"x\";\"y\")));2)") == "y")
    assert(eval("=WRITE.DATE(FROM.UNIX(0);\"yyyy\")") == "1970")
  }

  test("locale round-trip: toFormula in nl re-parses to the same AST") {
    import graft.values.WarpLanguage.nl
    for (f <- Seq("=ALS(1<2;1,5;2,5)", "=GEMIDDELDE([a];[b];3,5)", "=WAAR",
                  "=ALS.FOUT([x]/0;LEEG)")) {
      val once = Formula.parse(f, nl)
      val twice = Formula.parse("=" + Formula.toFormula(once, nl), nl)
      assert(once == twice, s"nl round-trip failed for $f -> ${Formula.toFormula(once, nl)}")
    }
    assert(Formula.toFormula(Formula.parse("=ALS(WAAR;1,5;2,5)", nl), nl)
      .contains("ALS")) // localized spelling preserved
  }

  test("deeply nested formulas compile and run (bounded tree growth)") {
    // 16 nesting levels: the guarded-value formulation grew ~4x per level
    // (millions of nodes); the unguarded one stays linear-ish
    val f = (1 to 16).foldLeft("[a]") { (acc, i) => s"(($acc+$i)*1)" }
    val df = Seq(2.0).toDF("a")
    val t0 = System.nanoTime()
    val r = df.select(Formula.columnFor(df.schema, "=" + f).as("r")).collect()(0).get(0)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(r == (1 to 16).foldLeft(2.0)(_ + _))
    assert(secs < 30.0, f"deep formula took $secs%.1f s")
  }

  test("typed sibling refs fold the coercion away (Ctx.forSchema)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("a", DoubleType), StructField("b", LongType)))
    val c = Formula.compile(Formula.parse("=[a]+[b]"), Formula.Ctx.forSchema(schema))
    val df = Seq((3.0, 4L)).toDF("a", "b")
    assert(df.select(c.as("r")).collect()(0).get(0) == 7.0)
    // no regex CASE tree in the typed plan
    val plan = df.select(c.as("r")).queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("rlike"))
  }
}
