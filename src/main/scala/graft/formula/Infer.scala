package graft.formula

import Formula._

/** Programming-by-example expression inference
  * (reference: WarpCore/Sources/Expression.swift:112-196 `Expression.infer`
  * + per-node `suggest` hooks): find formulas that transform a row's
  * values into a target value, by iterative-deepening search over
  * suggested expression wrappers, pruning on complexity and de-duplicating
  * branches by their intermediate value.
  *
  * Candidates are evaluated with a LOCAL interpreter over the example row
  * (mirroring the Warp value algebra) — inference explores thousands of
  * tiny candidate expressions, which would be absurd as Spark jobs; the
  * WINNING formula is then compiled once via [[Formula.compile]] and runs
  * distributed like any other. This is an interactive-assist surface, not
  * a data-path operator.
  */
object Infer {

  // ---- local Warp value algebra (mirrors values/Warp.scala semantics)

  def numOf(v: Any): Option[Double] = v match {
    case null       => None
    case d: Double  => Some(d)
    case f: Float   => Some(f.toDouble)
    case i: Int     => Some(i.toDouble)
    case l: Long    => Some(l.toDouble)
    case b: Boolean => Some(if (b) 1.0 else 0.0)
    case s: String =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      Option(graft.functions.WarpNumExpr.parse(u)).map(_.doubleValue())
    case _ => None
  }

  def strOf(v: Any): Option[String] = v match {
    case null      => None
    case s: String => Some(s)
    case d: Double => Some(d.toString)
    case other     => Some(other.toString)
  }

  /** Lenient Warp equality (Value.swift:547-581). */
  def eqWarp(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case _ =>
      (numOf(a), numOf(b)) match {
        case (Some(x), Some(y)) => x == y
        case _ => strOf(a) == strOf(b)
      }
  }

  /** Local evaluator for the inference-relevant AST subset; None = invalid. */
  def evalLocal(e: Expr, row: Map[String, Any], inputValue: Any): Option[Any] = {
    def num(x: Expr): Option[Double] = evalLocal(x, row, inputValue).flatMap(numOf)
    def str(x: Expr): Option[String] = evalLocal(x, row, inputValue).flatMap(strOf)
    e match {
      case Lit(v)     => Some(v)
      case InvalidLit => None
      case Identity   => Option(inputValue)
      case Sibling(n) => row.get(n).orElse(row.find(_._1.equalsIgnoreCase(n)).map(_._2))
      case Bin(op, l, r) => op match {
        case "+" => for (a <- num(l); b <- num(r)) yield a + b
        case "-" => for (a <- num(l); b <- num(r)) yield a - b
        case "*" => for (a <- num(l); b <- num(r)) yield a * b
        case "/" => for (a <- num(l); b <- num(r); if b != 0.0) yield a / b
        // StrictMath, not math.pow: Spark's Pow evaluates StrictMath.pow
        // (platform-reproducible), while the Math.pow intrinsic can differ
        // in the last ulp — enough to fail the differential property
        case "^" => for (a <- num(l); b <- num(r);
                         v = StrictMath.pow(a, b); if !v.isNaN) yield v
        case "&" => for (a <- str(l); b <- str(r)) yield a + b
        case _   => None
      }
      case Call("UPPER", List(x))  => str(x).map(_.toUpperCase)
      case Call("LOWER", List(x))  => str(x).map(_.toLowerCase)
      case Call("TRIM", List(x))   => str(x).map(_.trim)
      case Call("LENGTH", List(x)) => str(x).map(_.length.toLong)
      case Call("NEGATE", List(x)) => num(x).map(-_)
      case Call("ABS", List(x))    => num(x).map(math.abs)
      case Call("SQRT", List(x))   => num(x).filter(_ >= 0).map(math.sqrt)
      case Call("LEFT", List(x, n)) =>
        for (s <- str(x); k <- num(n).map(_.toInt); if k <= s.length) yield s.take(k)
      case Call("RIGHT", List(x, n)) =>
        for (s <- str(x); k <- num(n).map(_.toInt); if k <= s.length) yield s.takeRight(k)
      case Call("MID", List(x, st, len)) =>
        for (s <- str(x); a <- num(st).map(_.toInt); l <- num(len).map(_.toInt);
             if a <= s.length) yield s.slice(a, math.min(s.length, a + l))
      case _ => None
    }
  }

  /** Complexity mirrors the reference (Expression.swift:32-34,213-215,
    * 330-332): literals cost 10 (inelegant), Identity 0, refs 1. */
  def complexity(e: Expr): Int = e match {
    case Bin(_, l, r)  => 1 + complexity(l) + complexity(r)
    case Call(_, as)   => 1 + as.map(complexity).sum
    case Lit(_)        => 10
    case Identity      => 0
    case _             => 1
  }

  /** Expression wrappers to try around `from` (the reference's suggest
    * hooks, Expression.swift:199-289 and Function.suggest). */
  private def suggest(from: Option[Expr], to: Any, row: Map[String, Any],
                      inputValue: Any): Seq[Expr] = from match {
    case None =>
      row.keys.toSeq.sorted.map(Sibling(_)) ++
        (if (inputValue != null) Seq(Identity) else Nil) :+ Lit(to)
    case Some(e) =>
      val cur = evalLocal(e, row, inputValue)
      val cols = row.keys.toSeq.sorted.map(Sibling(_))
      val arith = cols.flatMap { c =>
        Seq(Bin("+", e, c), Bin("*", e, c), Bin("-", e, c), Bin("-", c, e),
            Bin("/", e, c), Bin("/", c, e))
      }
      // constant completion: the delta/ratio that would land exactly on `to`
      val const = (cur.flatMap(numOf), numOf(to)) match {
        case (Some(c), Some(t)) if c != 0.0 =>
          Seq(Bin("+", e, Lit(t - c))) ++
            (if (t % c == 0.0) Seq(Bin("*", e, Lit(t / c))) else Nil)
        case _ => Nil
      }
      // string shapes
      val strops = (cur.flatMap(strOf), strOf(to)) match {
        case (Some(c), Some(t)) =>
          Seq(Call("UPPER", List(e)), Call("LOWER", List(e)), Call("TRIM", List(e))) ++
            (if (t.length < c.length && c.startsWith(t)) Seq(Call("LEFT", List(e, Lit(t.length.toLong)))) else Nil) ++
            (if (t.length < c.length && c.endsWith(t)) Seq(Call("RIGHT", List(e, Lit(t.length.toLong)))) else Nil) ++
            (if (t.length < c.length && c.contains(t))
               Seq(Call("MID", List(e, Lit(c.indexOf(t).toLong), Lit(t.length.toLong)))) else Nil) ++
            (if (t.startsWith(c) && t != c) Seq(Bin("&", e, Lit(t.drop(c.length)))) else Nil) ++
            (if (t.endsWith(c) && t != c) Seq(Bin("&", Lit(t.dropRight(c.length)), e)) else Nil)
        case _ => Nil
      }
      arith ++ const ++ strops
  }

  /** Mirror of `Expression.infer`: returns formulas (as ASTs) whose local
    * evaluation over `row` equals `toValue`, simplest first. */
  def infer(fromValue: Option[Expr], toValue: Any, row: Map[String, Any],
            inputValue: Any = null, level: Int = 3,
            maxComplexity: Int = Int.MaxValue,
            previousValues: Set[Any] = Set.empty): Seq[Expr] = {
    if (level <= 0) return Nil
    var budget = maxComplexity
    val out = scala.collection.mutable.ListBuffer[Expr]()
    val explore = scala.collection.mutable.ListBuffer[(Expr, Int)]()

    for (cand <- suggest(fromValue, toValue, row, inputValue)) {
      if (complexity(cand) <= budget) {
        evalLocal(cand, row, inputValue) match {
          case Some(r) if eqWarp(r, toValue) =>
            // the bare literal answer is a fallback, not a budget setter —
            // it must not crowd out constant-completion forms
            if (!cand.isInstanceOf[Lit])
              budget = math.min(budget, complexity(cand))
            out += cand
            explore += ((cand, complexity(cand)))
          case _ =>
            explore += ((cand, budget))
        }
      }
    }

    var seen = previousValues
    for ((cand, candBudget) <- explore if complexity(cand) <= budget) {
      evalLocal(cand, row, inputValue) match {
        case Some(r) if !seen.contains(r) =>
          seen = seen + r
          for (deeper <- infer(Some(cand), toValue, row, inputValue,
                               level - 1, math.min(budget, candBudget - 1), seen)
               if evalLocal(deeper, row, inputValue).exists(eqWarp(_, toValue)))
            out += deeper
        case _ => ()
      }
    }
    out.distinct.sortBy(complexity).toSeq
  }
}
