package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document token/bigram repetition statistics in ONE pass — the
  * Gopher-style repetition signals ("Scaling Language Models", Rae et al.
  * 2021, Appendix A: duplicate-token and repeated-n-gram fractions) used to
  * filter boilerplate and degenerate documents from training corpora.
  *
  * Returns `array<long>` of
  * `[nTokens, nDistinctTokens, maxTokenFreq, nBigrams, nDistinctBigrams,
  * maxBigramFreq]`.
  *
  * Tokenization is exactly `split(trim(lower(s)), "\\s+")` (space-only SQL
  * trim, Java split with limit -1) — bit-compatible with
  * [[graft.pipeline.TextAnalysis.tokens]], [[LangScoresExpr]] and the
  * DuckDB `string_split_regex(trim(lower(text)), '\s+')` oracle. The
  * declarative alternative (array_sort + an aggregate-fold run-length
  * counter per statistic) evaluates interpreted per lambda call; this
  * kernel is one static JIT-compiled call per row inside whole-stage
  * codegen, so at 100 TB the whole scoring phase stays a pure map pass.
  * Counting is exact over token STRINGS (a HashMap per row, bounded by
  * document size) — no hash-collision caveat to carry into the oracle.
  */
object TokenStatsExpr {
  def compute(s: UTF8String): ArrayData = {
    val tokens = TextHash.tokenize(s)
    val n = tokens.length

    // one String-keyed pass assigns each DISTINCT token a dense id (still
    // exact — no hash-collision caveat) and counts frequencies unboxed
    val ids = new java.util.HashMap[String, Integer](math.max(4, n * 2))
    val freq = new Array[Int](math.max(1, n))
    val idSeq = new Array[Int](math.max(1, n))
    var distinct = 0
    var maxTf = 0
    var i = 0
    while (i < n) {
      var id = ids.putIfAbsent(tokens(i), distinct)
      if (id == null) { id = distinct; distinct += 1 }
      val c = freq(id) + 1
      freq(id) = c
      if (c > maxTf) maxTf = c
      idSeq(i) = id
      i += 1
    }

    // bigram counting over EXACT id pairs (ids are bijective with distinct
    // token strings, so (id1,id2) distinctness == joined-string
    // distinctness) in an open-addressed long->int map: no per-bigram
    // String concat, no boxing — this was the dominant cost of the pass
    var nDistinctBg = 0
    var maxBf = 0
    if (n > 1) {
      val cap = java.lang.Integer.highestOneBit(math.max(4, (n - 1) * 2 - 1)) << 1
      val mask = cap - 1
      val keys = new Array[Long](cap)
      java.util.Arrays.fill(keys, -1L)
      val counts = new Array[Int](cap)
      i = 0
      while (i < n - 1) {
        val key = (idSeq(i).toLong << 32) | idSeq(i + 1).toLong
        var slot = (TextHash.mix(key) & 0x7FFFFFFF).toInt & mask
        while (keys(slot) != -1L && keys(slot) != key) slot = (slot + 1) & mask
        if (keys(slot) == -1L) { keys(slot) = key; nDistinctBg += 1 }
        val c = counts(slot) + 1
        counts(slot) = c
        if (c > maxBf) maxBf = c
        i += 1
      }
    }

    UnsafeArrayData.fromPrimitiveArray(Array[Long](
      n.toLong, distinct.toLong, maxTf.toLong,
      math.max(n - 1, 0).toLong, nDistinctBg.toLong, maxBf.toLong))
  }
}

case class TokenStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TextHash.requireType(prettyName, child.dataType, StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_stats"
  protected override def nullSafeEval(input: Any): Any =
    TokenStatsExpr.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenStatsExpr.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenStatsExpr =
    copy(child = newChild)
}

/** `[nSegments, nDistinctSegments]` of a string split on ONE literal
  * character (`array<long>`) — the kernel behind the duplicate-line
  * filter. Declaratively this was `split(s, d, -1)` (an ArrayData of
  * per-line UTF8Strings) followed by `array_distinct` (a hash set AND a
  * second array rebuild) just to take two sizes; this is one scan with a
  * seen-set and no array materialization. Split semantics match Java
  * `split(d, -1)` exactly: n = separator count + 1, empty segments (and
  * the lone empty segment of an empty string) all count. Exact over
  * segment STRINGS — no hash-collision caveat. */
object SegmentDupStatsExpr {
  def compute(s: UTF8String, delim: Char): ArrayData = {
    val str = s.toString
    val seen = new java.util.HashSet[String]()
    var n = 0L
    var from = 0
    var i = 0
    val len = str.length
    while (i <= len) {
      if (i == len || str.charAt(i) == delim) {
        n += 1
        seen.add(str.substring(from, i))
        from = i + 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(Array[Long](n, seen.size.toLong))
  }
}

case class SegmentDupStatsExpr(child: Expression, delim: Char) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TextHash.requireType(prettyName, child.dataType, StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "segment_dup_stats"
  protected override def nullSafeEval(input: Any): Any =
    SegmentDupStatsExpr.compute(input.asInstanceOf[UTF8String], delim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SegmentDupStatsExpr.compute($c, (char) ${delim.toInt})")
  override protected def withNewChildInternal(newChild: Expression): SegmentDupStatsExpr =
    copy(child = newChild)
}

/** Length/shape statistics of a document in ONE pass:
  * `[nTokensWs, sumTokenLens, nBpe, punctCount, rawChars]` (`array<long>`).
  *
  * Declarative equivalents (what the quality-scoring operators previously
  * ran per row, verified bit-equal by PropertySpec):
  *  - nTokensWs     = `size(split(trim(lower(s)), "\\s+"))`, 0 for
  *    space-trim-empty input — Java split semantics exactly: a LEADING
  *    non-space whitespace char (space-only SQL trim leaves tabs) yields
  *    an empty first token, a trailing one an empty last token (limit -1)
  *  - sumTokenLens  = `aggregate(split(...), 0L, acc + length)` — an
  *    interpreted HOF per row (ArrayAggregate is CodegenFallback)
  *  - nBpe          = `size(regexp_extract_all(lower(s),
  *    "[a-z]+|[0-9]+|[^a-z0-9\\s]"))` — which BUILT the match array only
  *    to count it
  *  - punctCount    = `length(s) - length(regexp_replace(s,
  *    "[.,;:!?'\"()-]", ""))` — which REBUILT the string only to diff
  *    lengths (counted here over the lowered text: Unicode lowercasing
  *    never maps into, out of, or onto ASCII punctuation)
  *  - rawChars      = `length(s)` (code points, pre-lowercase — the İ→i̇
  *    class of mappings changes char counts)
  *  - digitCount / upperCount = the `[0-9]` / `[A-Z]` char counts
  *    (`length(s) - length(regexp_replace(s, cls, ""))`) — counted over
  *    the RAW UTF-8 bytes, where ASCII values never appear inside
  *    multi-byte sequences
  *  - nTokensNonEmpty (slot 8) = count of NON-EMPTY whitespace-separated
  *    runs — the split-edge-proof token count (`size(filter(split(s,
  *    "\\s+"), t -> length(t) > 0))`): identical to nTokensWs except it
  *    never counts the leading/trailing empty tokens Java split / DuckDB
  *    `string_split_regex` emit for edge whitespace, so cross-engine
  *    comparisons can't hinge on that edge behavior
  *
  * Replacing seven string/array-building passes with one scan is what
  * keeps corpus quality scoring a pure map pass at 100 TB. */
object TextStatsExpr {
  // Java regex \s (no UNICODE_CHARACTER_CLASS): [ \t\n\x0B\f\r]
  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'
  private def isPunct(c: Int): Boolean = c match {
    case '.' | ',' | ';' | ':' | '!' | '?' | '\'' | '"' | '(' | ')' | '-' => true
    case _ => false
  }

  def compute(s: UTF8String): ArrayData = {
    // length() == UTF8String.numChars (code points) — no String detour
    val rawChars = s.numChars().toLong
    val lower = s.toLowerCase.toString

    var punct = 0L
    var nBpe = 0L
    var prevCls = 0 // 0 ws, 1 letter-run, 2 digit-run, 3 single-other
    var i = 0
    while (i < lower.length) {
      val cp = lower.codePointAt(i)
      val cls =
        if (cp >= 'a' && cp <= 'z') 1
        else if (cp >= '0' && cp <= '9') 2
        else if (isWs(cp)) 0
        else 3
      if (cls == 3) nBpe += 1
      else if (cls != 0 && cls != prevCls) nBpe += 1
      prevCls = cls
      if (isPunct(cp)) punct += 1
      i += Character.charCount(cp)
    }

    // space-only SQL trim, then Java split-on-\s+ token accounting
    var from = 0
    var until = lower.length
    while (from < until && lower.charAt(from) == ' ') from += 1
    while (until > from && lower.charAt(until - 1) == ' ') until -= 1
    var nTokens = 0L
    var nNonEmpty = 0L // split-edge-proof: non-empty runs only
    var sumLens = 0L
    if (until > from) {
      if (isWs(lower.codePointAt(from))) nTokens += 1 // leading empty token
      var inRun = false
      var j = from
      while (j < until) {
        val cp = lower.codePointAt(j)
        if (isWs(cp)) inRun = false
        else {
          if (!inRun) { nNonEmpty += 1; inRun = true }
          sumLens += 1
        }
        j += Character.charCount(cp)
      }
      if (isWs(lower.codePointBefore(until))) nTokens += 1 // trailing empty
      nTokens += nNonEmpty
    }

    // ASCII digit / uppercase counts over the RAW UTF-8 bytes: 0x30-0x39
    // and 0x41-0x5A never appear as lead/continuation bytes, so a byte
    // scan counts exactly the ASCII chars [0-9] / [A-Z] match — and the
    // original (pre-lowercase) string, since Unicode lowercasing can
    // change code-point counts (İ -> i̇)
    val bytes = s.getBytes
    var digits = 0L
    var uppers = 0L
    var k = 0
    while (k < bytes.length) {
      val b = bytes(k)
      if (b >= '0' && b <= '9') digits += 1
      else if (b >= 'A' && b <= 'Z') uppers += 1
      k += 1
    }

    UnsafeArrayData.fromPrimitiveArray(Array[Long](
      nTokens, sumLens, nBpe, punct, rawChars, digits, uppers, nNonEmpty))
  }
}

case class TextStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TextHash.requireType(prettyName, child.dataType, StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "text_stats"
  protected override def nullSafeEval(input: Any): Any =
    TextStatsExpr.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsExpr.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
}
