package graft

import graft.formula.{Formula, Infer}

/** Programming-by-example inference tests, mirroring the reference's
  * 1-3-4-6=24 game test (WarpCoreTests.swift:893-900). */
class InferSpec extends SparkSpec {
  import spark.implicits._

  test("solves the 1-3-4-6 24 game (WarpCoreTests.swift:893-900)") {
    val row = Map[String, Any]("A" -> 1L, "B" -> 3L, "C" -> 4L, "D" -> 6L)
    val solutions = Infer.infer(None, 24L, row, level = 4)
    assert(solutions.nonEmpty, "can solve the 1-3-4-6 24 game")
    // every reported solution actually evaluates to 24
    solutions.foreach { s =>
      assert(Infer.evalLocal(s, row, null).exists(Infer.eqWarp(_, 24L)),
        s"bogus solution: ${Formula.toFormula(s)}")
    }
  }

  test("string transforms: infers UPPER, suffix concat, substring") {
    val row = Map[String, Any]("name" -> "john")
    assert(Infer.infer(None, "JOHN", row, level = 2)
      .exists(Formula.toFormula(_) == "UPPER([name])"))
    assert(Infer.infer(None, "john!", row, level = 2)
      .exists(Formula.toFormula(_) == "([name]&\"!\")"))
    assert(Infer.infer(None, "jo", row, level = 2)
      .exists(Formula.toFormula(_).startsWith("LEFT([name]")))
  }

  test("numeric completion: constant delta and scale") {
    val row = Map[String, Any]("v" -> 10L)
    val exprs = Infer.infer(None, 13L, row, level = 2).map(Formula.toFormula)
    assert(exprs.contains("([v]+3)"))
    val scaled = Infer.infer(None, 30L, row, level = 2).map(Formula.toFormula)
    assert(scaled.contains("([v]*3)"))
  }

  test("inferred formula compiles and runs distributed") {
    val row = Map[String, Any]("name" -> "john")
    val best = Infer.infer(None, "JOHN", row, level = 2)
      .find(Formula.toFormula(_) == "UPPER([name])").get
    val df = Seq("john", "jane").toDF("name")
    val out = df.select(Formula.compile(best).as("r")).as[String].collect().toSeq
    assert(out == Seq("JOHN", "JANE"))
  }

  test("simplest solutions come first (complexity ordering)") {
    val row = Map[String, Any]("a" -> 5L, "b" -> 5L)
    val sols = Infer.infer(None, 5L, row, level = 2)
    // a bare column ref must rank above arithmetic reconstructions
    assert(Seq("[a]", "[b]").contains(Formula.toFormula(sols.head)))
  }
}
