package graft.formula

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.values.Warp
import graft.functions.{WarpFunctions => WF}

/** The Warp formula language (reference: WarpCore/Sources/Formula.swift:21-353,
  * grammar :276-350; Expression AST Expression.swift:17-23) compiled to
  * Catalyst `Column` trees — one target replacing both the reference's
  * row-interpreter and its SQL translator.
  *
  * Surface (en locale):
  *   =UPPER([name]) & "!"     column refs in brackets, & concatenation
  *   #[col]                   foreign (join-side) column ref
  *   @                        current cell (Identity); @123 timestamp literal
  *   {1;2;3}                  list literal;  x[2] 1-based index;  x->"key" lookup
  *   50%, 2k, 3M              percent / SI postfix multipliers (Language.swift:47)
  *   binary ops: + - * / % ^ & = <> < > <= >= ~= ~~= ±= ±±=
  */
object Formula {

  // ===== AST (Expression.swift:17-23) =====
  sealed trait Expr
  case class Lit(v: Any) extends Expr
  case object InvalidLit extends Expr                     // `ERROR` / nl `FOUT`
  case object Identity extends Expr                       // `@`
  case class TimestampLit(seconds: Double) extends Expr   // `@123` — NSDate epoch
  case class Sibling(name: String) extends Expr           // `[col]`
  case class Foreign(name: String) extends Expr           // `#[col]`
  case class Bin(op: String, l: Expr, r: Expr) extends Expr
  case class Call(fn: String, args: List[Expr]) extends Expr
  case class ListLit(items: List[Expr]) extends Expr
  case class Index(target: Expr, idx: Expr) extends Expr  // `x[2]` (1-based)
  case class Lookup(target: Expr, key: Expr) extends Expr // `x->"key"`

  /** NSDate epoch offset (Value.swift:43-45): warp date = unix - 978307200. */
  val NsDateOffset = 978307200L

  // ===== parser: hand-rolled recursive descent; locale-driven literals,
  //       separators, constants and function names (Language.swift) =====

  def parse(input: String): Expr = parse(input, graft.values.WarpLanguage.en)
  def parse(input: String, lang: graft.values.WarpLanguage): Expr =
    new Parser(input, lang).parseFormula()

  final class Parser(input: String, lang: graft.values.WarpLanguage = graft.values.WarpLanguage.en) {
    private var pos = 0
    private def eof = pos >= input.length
    private def peek = input(pos)
    private def ws(): Unit = while (!eof && peek.isWhitespace) pos += 1
    private val decSep: Char = lang.decimalSeparator.head
    /** ';' always separates; ',' only in locales where it is not the
      * decimal separator (Language.swift:132-135). */
    private def isArgSep(c: Char): Boolean =
      c == ';' || (c == ',' && decSep != ',')
    private def fail(msg: String) =
      throw new IllegalArgumentException(s"formula parse error at $pos: $msg in '$input'")

    def parseFormula(): Expr = {
      ws()
      if (!eof && peek == '=') pos += 1 // optional leading =
      val e = parseOr()
      ws()
      if (!eof) fail(s"trailing input '${input.substring(pos)}'")
      e
    }

    // precedence: comparison < & < +- < */% < ^ < unary < postfix < atom
    private def parseOr(): Expr = parseComparison()

    private val cmpOps = List("<=", ">=", "<>", "~~=", "~=", "±±=", "±=", "=", "<", ">")
    private def parseComparison(): Expr = {
      var l = parseConcat()
      var done = false
      while (!done) {
        ws()
        cmpOps.find(op => input.startsWith(op, pos)) match {
          case Some(op) => pos += op.length; l = Bin(op, l, parseConcat())
          case None => done = true
        }
      }
      l
    }

    private def parseConcat(): Expr = {
      var l = parseAdd()
      ws()
      while (!eof && peek == '&') { pos += 1; l = Bin("&", l, parseAdd()); ws() }
      l
    }

    private def parseAdd(): Expr = {
      var l = parseMul()
      ws()
      while (!eof && (peek == '+' || peek == '-')) {
        val op = peek.toString; pos += 1
        l = Bin(op, l, parseMul()); ws()
      }
      l
    }

    private def parseMul(): Expr = {
      var l = parsePow()
      ws()
      // `%` is modulo as a binary op, percent as a postfix — postfix binds in
      // parseAtomPostfix; binary % must be followed by an operand
      while (!eof && (peek == '*' || peek == '/' ||
             (peek == '%' && { val p = pos; pos += 1; ws(); val ok = !eof && startsOperand; pos = p; ok }))) {
        val op = peek.toString; pos += 1
        l = Bin(op, l, parsePow()); ws()
      }
      l
    }

    // NO '-' here, matching the percent-postfix lookahead: the reference
    // grammar has no binary % at all (modulus is `~`, Formula.swift:329),
    // so `10%-3` must read as (10%)-3 with or without spaces — a `-` after
    // % is subtraction from the percent value, never a modulo operand
    private def startsOperand: Boolean =
      !eof && (peek.isDigit || peek.isLetter || "([{@#\"".contains(peek))

    private def parsePow(): Expr = {
      val l = parseUnary()
      ws()
      if (!eof && peek == '^') { pos += 1; Bin("^", l, parsePow()) } else l
    }

    private def parseUnary(): Expr = {
      ws()
      if (!eof && peek == '-') {
        pos += 1
        // fold unary minus into numeric literals: `-3` IS Lit(-3), so
        // printed negative literals round-trip through the parser
        parseUnary() match {
          case Lit(l: Long)   => Lit(-l)
          case Lit(d: Double) => Lit(-d)
          case other          => Bin("*", Lit(-1.0), other)
        }
      }
      else parsePostfix()
    }

    private def parsePostfix(): Expr = {
      var e = parseAtom()
      var done = false
      while (!done) {
        ws()
        if (!eof && peek == '[') {           // x[2] index
          pos += 1
          val idx = parseOr(); ws()
          if (eof || peek != ']') fail("expected ]")
          pos += 1
          e = Index(e, idx)
        } else if (!eof && input.startsWith("->", pos)) { // x->"key"
          pos += 2
          e = Lookup(e, parseAtom())
        } else done = true
      }
      e
    }

    private def parseAtom(): Expr = {
      ws()
      if (eof) fail("unexpected end")
      peek match {
        case '(' =>
          pos += 1; val e = parseOr(); ws()
          if (eof || peek != ')') fail("expected )")
          pos += 1; e
        case '{' => // list literal {a;b;c}
          pos += 1
          val items = scala.collection.mutable.ListBuffer[Expr]()
          ws()
          if (!eof && peek == '}') { pos += 1; return ListLit(Nil) }
          items += parseOr(); ws()
          while (!eof && isArgSep(peek)) { pos += 1; items += parseOr(); ws() }
          if (eof || peek != '}') fail("expected }")
          pos += 1
          ListLit(items.toList)
        case '"' =>
          pos += 1
          val sb = new StringBuilder
          while (!eof && peek != '"') {
            if (peek == '\\' && pos + 1 < input.length) { pos += 1; sb += peek }
            else sb += peek
            pos += 1
          }
          if (eof) fail("unterminated string")
          pos += 1
          Lit(sb.result())
        case '[' => // sibling column ref
          pos += 1
          val end = input.indexOf(']', pos)
          if (end < 0) fail("unterminated [column]")
          val name = input.substring(pos, end); pos = end + 1
          Sibling(name)
        case '#' => // foreign ref #[col]
          pos += 1
          if (eof || peek != '[') fail("expected [ after #")
          pos += 1
          val end = input.indexOf(']', pos)
          if (end < 0) fail("unterminated #[column]")
          val name = input.substring(pos, end); pos = end + 1
          Foreign(name)
        case '@' =>
          pos += 1
          if (!eof && peek.isDigit) {
            val start = pos
            while (!eof && (peek.isDigit || peek == '.')) pos += 1
            TimestampLit(input.substring(start, pos).toDouble)
          } else Identity
        case c if c.isDigit || (c == decSep && pos + 1 < input.length && input(pos + 1).isDigit) =>
          val sb = new StringBuilder
          var sawDot = false; var sawExp = false
          while (!eof && peek.isDigit) { sb += peek; pos += 1 }
          if (!eof && peek == decSep &&
              ((pos + 1 < input.length && input(pos + 1).isDigit) || sb.isEmpty)) {
            pos += 1; sb += '.'; sawDot = true
            while (!eof && peek.isDigit) { sb += peek; pos += 1 }
          }
          // exponent only when digits follow — a bare E is the exa postfix
          if (!eof && (peek == 'e' || peek == 'E') && {
              val p1 = pos + 1
              p1 < input.length && (input(p1).isDigit ||
                ((input(p1) == '+' || input(p1) == '-') &&
                  p1 + 1 < input.length && input(p1 + 1).isDigit))
            }) {
            sawExp = true; sb += 'e'; pos += 1
            if (peek == '+' || peek == '-') { sb += peek; pos += 1 }
            while (!eof && peek.isDigit) { sb += peek; pos += 1 }
          }
          val text = sb.result()
          // data-driven postfix multipliers (Language.swift:88-120).
          // `%` doubles as binary modulo: percent-postfix only when NOT
          // followed by another operand (`50%` vs `10%3`).
          def followedByOperand(after: Int): Boolean = {
            var p = after
            while (p < input.length && input(p).isWhitespace) p += 1
            p < input.length && (input(p).isDigit || input(p).isLetter ||
              "([{@#\"".contains(input(p)))
          }
          val postfix = lang.postfixes.keys.toList.sortBy(-_.length).find { pf =>
            input.startsWith(pf, pos) && {
              val after = pos + pf.length
              val notWord = after >= input.length || !input(after).isLetterOrDigit
              val percentOk = pf != "%" || !followedByOperand(after)
              notWord && percentOk
            }
          }
          postfix match {
            case Some(pf) =>
              pos += pf.length
              Lit(text.toDouble * lang.postfixes(pf))
            case None if !sawDot && !sawExp => Lit(text.toLong) // Warp .int
            case None => Lit(text.toDouble)
          }
        case c if c.isLetter =>
          val start = pos
          while (!eof && (peek.isLetterOrDigit || peek == '.' || peek == '_')) pos += 1
          val name = input.substring(start, pos)
          ws()
          if (!eof && peek == '(') {
            // localized function names map onto the canonical (en) table
            val up = name.toUpperCase
            val canonical = lang.functionNames.getOrElse(up, up)
            pos += 1
            val args = scala.collection.mutable.ListBuffer[Expr]()
            ws()
            if (!eof && peek == ')') { pos += 1; return Call(canonical, Nil) }
            args += parseOr(); ws()
            while (!eof && isArgSep(peek)) { pos += 1; args += parseOr(); ws() }
            if (eof || peek != ')') fail("expected )")
            pos += 1
            Call(canonical, args.toList)
          } else lang.constants.get(name.toUpperCase) match {
            case Some(graft.values.WarpLanguage.Invalid) => InvalidLit
            case Some(v)                                 => Lit(v)
            case None => Sibling(name) // bare column shorthand
          }
        case c => fail(s"unexpected '$c'")
      }
    }
  }

  // ===== unparse (round-trip, mirrors Formula.toFormula tests
  //       WarpCoreTests.swift:670-694; localized form Language.swift) =====

  def toFormula(e: Expr): String = toFormula(e, graft.values.WarpLanguage.en)

  def toFormula(e: Expr, lang: graft.values.WarpLanguage): String = {
    import graft.values.WarpLanguage
    // canonical -> localized spelling. nl maps several spellings to one
    // canonical (MIN/KLEINSTE, MAX/GROOTSTE): prefer the spelling that
    // EQUALS the canonical when the locale has one, else first-wins —
    // Map.map would keep an arbitrary hash-order "last" entry
    lazy val localName: Map[String, String] = {
      val firstWins = lang.functionNames.foldLeft(Map.empty[String, String]) {
        case (acc, (local, canon)) =>
          if (acc.contains(canon)) acc else acc + (canon -> local)
      }
      firstWins ++ lang.functionNames.collect {
        case (local, canon) if local == canon => canon -> local
      }
    }
    def constant(v: Any): Option[String] =
      lang.constants.collectFirst { case (name, cv) if cv == v => name }
    def num(d: Double): String = {
      val s = if (d == d.floor && d.abs < 1e15) d.toLong.toString else d.toString
      s.replace(".", lang.decimalSeparator)
    }
    val sep = lang.argumentSeparator
    def go(e: Expr): String = e match {
      case InvalidLit       => constant(WarpLanguage.Invalid).getOrElse("ERROR")
      case Lit(null)        => constant(null).getOrElse("NULL")
      case Lit(true)        => constant(true).getOrElse("TRUE")
      case Lit(false)       => constant(false).getOrElse("FALSE")
      // backslash FIRST: the parser treats \x as an escape for any x, so
      // an unescaped backslash before a quote would swallow the terminator
      case Lit(s: String)   =>
        "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      case Lit(d: Double)   => num(d)
      case Lit(v)           => v.toString
      case Identity         => "@"
      case TimestampLit(s)  => s"@${if (s == s.floor) s.toLong.toString else s.toString}"
      case Sibling(n)       => s"[$n]"
      case Foreign(n)       => s"#[$n]"
      case Bin(op, l, r)    =>
        val rs = go(r)
        // `%` is only BINARY when followed by an operand ("10%-3" reads as
        // percent-then-subtract, per the reference grammar) — parenthesize
        // a negative right side so binary modulo survives the round-trip
        val rsafe = if (op == "%" && rs.startsWith("-")) s"($rs)" else rs
        s"(${go(l)}$op$rsafe)"
      case Call(f, args)    =>
        s"${localName.getOrElse(f, f)}(${args.map(go).mkString(sep)})"
      case ListLit(items)   => s"{${items.map(go).mkString(sep)}}"
      case Index(t, i)      => s"${postfixTarget(t)}[${go(i)}]"
      case Lookup(t, k)     =>
        // the lookup key is parsed as an ATOM: a negative literal key
        // ("x->-3") would fail to re-parse, and a postfix key (x->a[1],
        // x->a->b) would re-associate onto the OUTER expression —
        // parenthesize those (parens ARE an atom), leaving ordinary
        // string/number keys untouched
        val ks = go(k)
        val atomSafe = k match {
          case _: Index | _: Lookup => false
          case _                    => !ks.startsWith("-")
        }
        s"${postfixTarget(t)}->${if (atomSafe) ks else s"($ks)"}"
    }
    // postfix (x[i], x->k) binds TIGHTER than unary minus in the parser:
    // a negative-literal target printed bare ("-3[1]") would re-parse as
    // -(3[1]) — parenthesize any target whose printed form leads with '-'
    def postfixTarget(t: Expr): String = {
      val ts = go(t)
      if (ts.startsWith("-")) s"($ts)" else ts
    }
    go(e)
  }

  // ===== compile to Catalyst Column =====

  import Warp.WV

  /** Compilation context: how column refs resolve. `types` (lower-cased
    * name -> DataType, e.g. from a DataFrame schema) lets the coercion
    * kernel use the typed fast path instead of the regex CASE tree. */
  final case class Ctx(
    sibling: String => Column = n => col(s"`$n`"),
    foreign: String => Column = n => throw new IllegalArgumentException(s"no foreign context for #[$n]"),
    inputValue: () => Column = () => throw new IllegalArgumentException("no @ (inputValue) in this context"),
    types: Map[String, org.apache.spark.sql.types.DataType] = Map.empty)

  object Ctx {
    /** Context resolving sibling refs against `df`'s schema (typed). */
    def forSchema(schema: org.apache.spark.sql.types.StructType): Ctx =
      Ctx(types = schema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap)
  }

  /** Compile to the error-tagged pair representation (Warp.WV): `.empty`
    * and `.invalid` stay distinct through the whole tree, collapsing to
    * null only at [[column]]/operator boundaries. */
  def compileWV(e: Expr, ctx: Ctx): WV = e match {
    case InvalidLit      => WV(lit(null), lit(true),
      Some(org.apache.spark.sql.types.NullType))
    case Lit(v)          => WV.fromLiteral(v)
    case Identity        => WV.pure(ctx.inputValue())
    case TimestampLit(s) => WV.pure(
      timestamp_seconds(lit(s + NsDateOffset)).cast("timestamp_ntz"),
      Some(org.apache.spark.sql.types.TimestampNTZType))
    case Sibling(n)      => WV.pure(ctx.sibling(n), ctx.types.get(n.toLowerCase))
    case Foreign(n)      => WV.pure(ctx.foreign(n), ctx.types.get(n.toLowerCase))
    case ListLit(items)  =>
      val vs = items.map(compileWV(_, ctx))
      WV(array(vs.map(_.v): _*), vs.map(_.inv).foldLeft(lit(false))(_ || _), None)
    case Index(t, i)     =>
      // fnNth, not bare element_at: under ANSI (Spark 4 default) an
      // out-of-range or zero index must become invalid, not kill the job
      Warp.liftCallW(Seq(compileWV(t, ctx), compileWV(i, ctx))) {
        case Seq(a, ix) => WF.fnNth(a, ix) }
    case Lookup(t, k)    =>
      Warp.liftCallW(Seq(compileWV(t, ctx), compileWV(k, ctx))) {
        case Seq(a, key) => WF.fnValueForKey(a, key) }
    case Bin(op, l, r) =>
      val (a, b) = (compileWV(l, ctx), compileWV(r, ctx))
      op match {
        case "+"   => Warp.addW(a, b)
        case "-"   => Warp.subW(a, b)
        case "*"   => Warp.mulW(a, b)
        case "/"   => Warp.divW(a, b)
        case "%"   => Warp.modW(a, b)
        case "^"   => Warp.powW(a, b)
        case "&"   => Warp.catW(a, b)
        case "="   => Warp.eqW(a, b)
        case "<>"  => Warp.neqW(a, b)
        case "<"   => Warp.ltW(a, b)
        case ">"   => Warp.gtW(a, b)
        case "<="  => Warp.lteW(a, b)
        case ">="  => Warp.gteW(a, b)
        case "~="  => Warp.containsW(a, b)
        case "~~=" => Warp.containsStrictW(a, b)
        case "±="  => Warp.matchesW(a, b)
        case "±±=" => Warp.matchesStrictW(a, b)
        case _     => throw new IllegalArgumentException(s"unknown operator $op")
      }
    case Call("ROUND", List(x, Lit(d))) if d.isInstanceOf[Double] || d.isInstanceOf[Long] =>
      val decimals = d match { case l: Long => l.toInt; case dd: Double => dd.toInt }
      Warp.liftCallW(Seq(compileWV(x, ctx)))(as => WF.fnRoundTo(as.head, decimals))
    case Call("ROUND", List(x, n)) => // dynamic decimals (non-literal operand)
      Warp.liftCallW(Seq(compileWV(x, ctx), compileWV(n, ctx))) {
        case Seq(v, d) => WF.fnRoundDyn(v, d) }
    case Call(f, args) => compileCall(f, args.map(compileWV(_, ctx)), ctx)
  }

  /** Compile to a plain Column (invalid collapsed to null). */
  def compile(e: Expr, ctx: Ctx = Ctx()): Column = compileWV(e, ctx).collapse

  /** The reference's en display names where they differ from this
    * compiler's canonical spellings (Language.swift allFunctions en table)
    * — reference formulas parse verbatim. */
  private val enAliases: Map[String, String] = Map(
    "REPLACE" -> "SUBSTITUTE", "REPLACE.PATTERN" -> "REGEXSUBSTITUTE",
    "COUNTA" -> "COUNTALL", "RANDBETWEEN" -> "RANDOMBETWEEN", "RAND" -> "RANDOM",
    "PACK.VALUES" -> "PACKSCALAR", "NORM.INV" -> "NORMAL.INV",
    "SIMILARITY" -> "LEVENSHTEIN", "ENCODEURL" -> "URLENCODE",
    "NOT.IN" -> "NOTIN", "SMALL" -> "MIN", "LARGE" -> "MAX",
    "TO.ISO8601.UTC" -> "TO.ISO8601", "RANDSTRING" -> "RANDOMSTRING",
    "DATE.FORMAT" -> "WRITE.DATE", "DATE.PARSE" -> "READ.DATE",
    "MEDIAN.LOW" -> "MEDIANLOW", "MEDIAN.HIGH" -> "MEDIANHIGH",
    "MEDIAN.PACK" -> "MEDIANPACK", "FROM.JSON" -> "JSON.DECODE",
    "READ.NUMBER" -> "PARSENUMBER", "HILBERT.D" -> "HILBERT.XY.TO.D",
    "HILBERT.X" -> "HILBERT.D.TO.X", "HILBERT.Y" -> "HILBERT.D.TO.Y",
    "SIZE.OF" -> "NUMBEROFBYTES", "TO.JSON" -> "JSON.ENCODE",
    "PACK" -> "PACK.LIST", "UNPACK" -> "UNPACK.LIST",
    "APPEND.LIST" -> "APPENDLIST")

  /** Logic/conditional functions compile on the tagged track (they are the
    * ones whose semantics hinge on empty-vs-invalid); the rest of the
    * closed library lifts its plain-Column builder via [[Warp.liftCallW]]
    * (argument invalidity propagates; null-from-coercion is invalid). */
  private def compileCall(f0: String, a: List[WV], ctx: Ctx): WV = {
    val f = enAliases.getOrElse(f0, f0)
    (f, a) match {
    case ("IF", List(c, t, e))       => Warp.ifW(c, t, e)
    case ("AND", as) if as.size >= 2 => Warp.andW(as)
    case ("OR", as) if as.size >= 2  => Warp.orW(as)
    case ("XOR", List(x, y))         => Warp.xorW(x, y)
    case ("NOT", List(x))            => Warp.notW(x)
    case ("COALESCE", as) if as.nonEmpty => Warp.coalesceW(as)
    case ("IFERROR", List(v, fb))    => Warp.ifErrorW(v, fb)
    case ("ISEMPTY", List(x))        => Warp.isEmptyW(x)
    case ("ISINVALID", List(x))      => Warp.isInvalidW(x)
    case ("IN", v :: set) if set.nonEmpty    => Warp.inW(v, set)
    case ("NOTIN", v :: set) if set.nonEmpty =>
      val in = Warp.inW(v, set); in.copy(v = !in.v)
    case _ => Warp.liftCallW(a)(cols => plainCall(f, cols.toList))
    }
  }

  /** Plain-Column function table (en-locale names; reference Function enum
    * Function.swift:21-134). Arity errors surface at compile time. */
  private def plainCall(f: String, a: List[Column]): Column = (f, a) match {
    case ("ABS", List(x))    => WF.fnAbsolute(x)
    case ("SQRT", List(x))   => WF.fnSqrt(x)
    case ("EXP", List(x))    => WF.fnExp(x)
    case ("LN", List(x))     => WF.fnLn(x)
    case ("LOG", List(x))    => WF.fnLog(x, lit(10))
    case ("LOG", List(x, b)) => WF.fnLog(x, b)
    case ("SIN", List(x))    => WF.fnSin(x)
    case ("COS", List(x))    => WF.fnCos(x)
    case ("TAN", List(x))    => WF.fnTan(x)
    case ("SINH", List(x))   => WF.fnSinh(x)
    case ("COSH", List(x))   => WF.fnCosh(x)
    case ("TANH", List(x))   => WF.fnTanh(x)
    case ("ASIN", List(x))   => WF.fnAsin(x)
    case ("ACOS", List(x))   => WF.fnAcos(x)
    case ("ATAN", List(x))   => WF.fnAtan(x)
    case ("FLOOR", List(x))  => WF.fnFloor(x)
    case ("CEILING", List(x)) => WF.fnCeiling(x)
    case ("ROUND", List(x))  => WF.fnRound(x)
    case ("SIGN", List(x))   => WF.fnSign(x)
    case ("NEGATE", List(x)) => WF.fnNegate(x)
    case ("POWER", List(x, y)) => WF.fnPower(x, y)
    case ("SUM", as)         => WF.fnSum(as: _*)
    case ("AVERAGE", as)     => WF.fnAverage(as: _*)
    case ("MIN", as)         => WF.fnMin(as: _*)
    case ("MAX", as)         => WF.fnMax(as: _*)
    case ("NORMAL.INV", List(p, m, s)) => WF.fnNormalInverse(p, m, s)
    case ("IDENTITY", List(x))   => x

    // scalar (argument-level) reducer forms (Function.swift:17-20)
    case ("COUNT", as)           => WF.fnCountScalar(as: _*)
    case ("COUNTALL", as)        => WF.fnCountAllScalar(as: _*)
    case ("COUNTDISTINCT", as)   => WF.fnCountDistinctScalar(as: _*)
    case ("MEDIAN", as) if as.nonEmpty     => WF.fnMedianScalar(as: _*)
    case ("MEDIANLOW", as) if as.nonEmpty  => WF.fnMedianLowScalar(as: _*)
    case ("MEDIANHIGH", as) if as.nonEmpty => WF.fnMedianHighScalar(as: _*)
    case ("MEDIANPACK", as) if as.nonEmpty => WF.fnMedianPackScalar(as: _*)
    case ("VAR.S", as) if as.nonEmpty      => WF.fnVarianceSampleScalar(as: _*)
    case ("VAR.P", as) if as.nonEmpty      => WF.fnVariancePopulationScalar(as: _*)
    case ("STDEV.S", as) if as.nonEmpty    => WF.fnStdevSampleScalar(as: _*)
    case ("STDEV.P", as) if as.nonEmpty    => WF.fnStdevPopulationScalar(as: _*)
    case ("PACKSCALAR", as) if as.nonEmpty => WF.fnPackScalar(as: _*)

    case ("UPPER", List(x))      => WF.fnUppercase(x)
    case ("LOWER", List(x))      => WF.fnLowercase(x)
    case ("PROPER", List(x))     => WF.fnCapitalize(x)
    case ("TRIM", List(x))       => WF.fnTrim(x)
    case ("LEFT", List(x, n))    => WF.fnLeft(x, n)
    case ("RIGHT", List(x, n))   => WF.fnRight(x, n)
    case ("MID", List(x, s, l))  => WF.fnMid(x, s, l)
    case ("LENGTH", List(x)) => WF.fnLength(x)
    case ("LEN", List(x))    => WF.fnLength(x)
    case ("SUBSTITUTE", List(x, f2, r)) => WF.fnSubstitute(x, f2, r)
    case ("REGEXSUBSTITUTE", List(x, p, r)) => WF.fnRegexSubstitute(x, p, r)
    case ("CONCAT", as)          => WF.fnConcat(as: _*)
    case ("LEVENSHTEIN", List(x, y)) => WF.fnLevenshtein(x, y)
    case ("URLENCODE", List(x))  => WF.fnUrlEncode(x)

    case ("NOW", Nil)            => WF.fnNow()
    case ("FROM.UNIX", List(x))  => WF.fnFromUnixTime(x)
    case ("TO.UNIX", List(x))    => WF.fnToUnixTime(x)
    case ("FROM.ISO8601", List(x)) => WF.fnFromISO8601(x)
    case ("TO.ISO8601", List(x)) => WF.fnToUTCISO8601(x)
    case ("FROM.EXCELDATE", List(x)) => WF.fnFromExcelDate(x)
    case ("TO.EXCELDATE", List(x)) => WF.fnToExcelDate(x)
    case ("DATE.UTC", List(y, m, d)) => WF.fnUtcDate(y, m, d)
    case ("YEAR.UTC", List(x))   => WF.fnUtcYear(x)
    case ("MONTH.UTC", List(x))  => WF.fnUtcMonth(x)
    case ("DAY.UTC", List(x))    => WF.fnUtcDay(x)
    case ("HOUR.UTC", List(x))   => WF.fnUtcHour(x)
    case ("MINUTE.UTC", List(x)) => WF.fnUtcMinute(x)
    case ("SECOND.UTC", List(x)) => WF.fnUtcSecond(x)
    case ("DURATION", List(x, y)) => WF.fnDuration(x, y)
    case ("AFTER", List(t, s))   => WF.fnAfter(t, s)

    case ("LIST", as)            => WF.fnList(as: _*)
    case ("SPLIT", List(x, s))   => WF.fnSplitCol(x, s)
    case ("GLUE", List(x, s))    => WF.fnGlueCol(x, s)
    case ("NTH", List(x, i))     => WF.fnNth(x, i)
    case ("VALUEFORKEY", List(x, k)) => WF.fnValueForKey(x, k)
    case ("ITEMS", List(x))      => WF.fnItems(x)
    case ("APPEND", List(x, v))  => WF.fnAppendValue(x, v)
    case ("APPENDLIST", List(x, y)) => WF.fnAppendList(x, y)
    case ("PACK.LIST", List(x))  => WF.fnPackList(x)
    case ("UNPACK.LIST", List(x)) => WF.fnUnpackList(x)

    case ("BASE64.ENCODE", List(x)) => WF.fnBase64Encode(x)
    case ("BASE64.DECODE", List(x)) => WF.fnBase64Decode(x)
    case ("HEX.ENCODE", List(x)) => WF.fnHexEncode(x)
    case ("HEX.DECODE", List(x)) => WF.fnHexDecode(x)
    case ("NUMBEROFBYTES", List(x)) => WF.fnNumberOfBytes(x)
    case ("JSON.ENCODE", List(x)) => WF.fnJsonEncode(x)
    case ("JSON.DECODE", List(x)) => WF.fnJsonDecodeVariant(x)
    case ("PARSENUMBER", List(x)) => WF.fnParseNumber(x)
    case ("ENCODE", List(x))      => WF.fnEncodeString(x)
    case ("DECODE", List(x))      => WF.fnDecodeString(x)

    case ("RANDOM", Nil)          => WF.fnRandom()
    case ("RANDOMBETWEEN", List(x, y)) => WF.fnRandomBetween(x, y)
    case ("RANDOMITEM", as) if as.nonEmpty  => WF.fnRandomItem(as: _*)
    case ("RANDOMSTRING", List(p)) => WF.fnRandomString(p)
    case ("UUID", Nil)            => WF.fnUuid()
    case ("CHOOSE", i :: as) if as.nonEmpty => WF.fnChoose(i, as: _*)

    // UTC-pinned sessions: local == UTC (documented deviation; the
    // reference formats in the viewer's zone, Function.swift:1398-1403)
    case ("TO.LOCALISO8601", List(x)) => WF.fnToUTCISO8601(x)
    case ("WRITE.DATE", List(t, fmt)) =>
      call_function("date_format", t, Warp.str(fmt))
    case ("READ.DATE", List(s, fmt)) => // try_: unparseable => invalid, not an ANSI throw
      call_function("try_to_timestamp", Warp.str(s), Warp.str(fmt))

    case ("HILBERT.XY.TO.D", List(n, x, y)) => WF.fnHilbertXYToD(n, x, y)
    case ("HILBERT.D.TO.X", List(n, d)) => WF.fnHilbertDToX(n, d)
    case ("HILBERT.D.TO.Y", List(n, d)) => WF.fnHilbertDToY(n, d)
    case ("POWER.UP", List(v, b))   => WF.fnPowerUp(v, b)
    case ("POWER.DOWN", List(v, b)) => WF.fnPowerDown(v, b)

    case _ => throw new IllegalArgumentException(
      s"unknown function or bad arity: $f/${a.size}")
  }

  /** One-call convenience: parse + compile against sibling columns. */
  def column(formula: String): Column = compile(parse(formula))

  /** Typed variant: resolve sibling refs against a known schema so the
    * compiled plan constant-folds and pushes down like hand-written
    * Columns. Optional locale drives literals/separators/function names. */
  def columnFor(schema: org.apache.spark.sql.types.StructType, formula: String,
                lang: graft.values.WarpLanguage = graft.values.WarpLanguage.en): Column =
    compile(parse(formula, lang), Ctx.forSchema(schema))
}
