package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document text-hashing kernels for the dedup pipeline.
  *
  * Why Expressions and not Column trees: shingling/minhashing/simhashing
  * are tight per-row loops (hundreds of tokens x dozens of hash functions).
  * Expressed as higher-order array functions they evaluate INTERPRETED
  * (ArrayAggregate/ArrayTransform are CodegenFallback) at ~µs per lambda
  * call; as a native expression each row is ONE static JIT-compiled call
  * inside whole-stage codegen, and — crucially for 100 TB — the whole
  * signature phase becomes a pure map pass with ZERO shuffle before the
  * LSH band-bucket join.
  *
  * Hashing is splitmix64-finalized FNV over UTF-8 bytes — deterministic,
  * engine-local (these operators are verified by recall properties, not a
  * SQL oracle).
  */
object TextHash {
  final val GOLDEN = 0x9E3779B97F4A7C15L

  /** Analysis-time input check for the kernel expressions: a wrong child
    * type must fail resolution with a readable message, not a
    * ClassCastException inside generated code. Nullability is ignored
    * (an array<long> with nullable elements still hashes fine — nulls
    * cannot occur in practice because the producers emit containsNull=false). */
  private[functions] def requireType(fn: String, actual: DataType,
                                     expected: DataType): TypeCheckResult =
    if (DataType.equalsIgnoreNullability(actual, expected))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn requires ${expected.simpleString} input, got ${actual.simpleString}")

  /** splitmix64 finalizer — strong 64-bit mixing, public-domain constant
    * set (Steele et al., "Fast splittable pseudorandom number generators"). */
  def mix(z0: Long): Long = {
    var z = z0 + GOLDEN
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over the bytes of `s[from..until)`, splitmix-finalized. */
  def hashRange(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xCBF29CE484222325L
    var i = from
    while (i < until) { h = (h ^ (bytes(i) & 0xFFL)) * 0x100000001B3L; i += 1 }
    mix(h)
  }

  /** Lower-case, whitespace-tokenize, hash each token. One allocation pass;
    * multiset order preserved. */
  def tokenHashes(s: UTF8String): Array[Long] = {
    val lower = s.toLowerCase.getBytes
    val n = lower.length
    val out = new java.util.ArrayList[Long]()
    var i = 0
    while (i <= n) {
      var j = i
      while (j < n && !isWs(lower(j))) j += 1
      if (j > i || (i == 0 && j == n)) out.add(hashRange(lower, i, j))
      else if (i == 0 && n == 0) out.add(hashRange(lower, 0, 0))
      i = j + 1
    }
    // split("\\s+") on a leading-separator string yields a leading "" token;
    // we instead emit only real tokens plus the single empty token for ""
    if (out.isEmpty) out.add(hashRange(lower, 0, 0))
    val arr = new Array[Long](out.size)
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    arr
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B

  private def isWsChar(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  /** Exact `split(trim(lower(s)), "\s+")` semantics, shared by every
    * string-token kernel ([[LangScoresExpr]], [[TokenStatsExpr]]) so their
    * "bit-compatible with [[graft.pipeline.TextAnalysis.tokens]] and the
    * DuckDB oracle" claim is structural, not copy-paste. SQL trim strips
    * SPACES only — Java String.trim would also strip tabs/newlines and
    * silently diverge from the declarative path on control-padded text.
    * Hand split (no regex engine): Java `"\\s+".split(t, -1)` == the
    * non-whitespace runs of t, plus a leading empty token when t starts
    * with whitespace and a trailing one when it ends with whitespace
    * (limit −1 keeps trailing empties; `\s` is the ASCII class, no
    * UNICODE_CHARACTER_CLASS) — differentially pinned in PropertySpec. */
  def tokenize(s: UTF8String): Array[String] = {
    val lower = s.toLowerCase.toString
    var from = 0
    var until = lower.length
    while (from < until && lower.charAt(from) == ' ') from += 1
    while (until > from && lower.charAt(until - 1) == ' ') until -= 1
    if (from >= until) return Array("") // split("", -1) == [""]
    val out = new scala.collection.mutable.ArrayBuffer[String](16)
    if (isWsChar(lower.charAt(from))) out += ""
    var i = from
    while (i < until) {
      if (isWsChar(lower.charAt(i))) i += 1
      else {
        var j = i
        while (j < until && !isWsChar(lower.charAt(j))) j += 1
        out += lower.substring(i, j)
        i = j
      }
    }
    if (isWsChar(lower.charAt(until - 1))) out += ""
    out.toArray
  }

  /** Distinct, sorted n-word shingle hashes (rolling combine of token
    * hashes). Fewer than n words => one shingle covering all words —
    * mirrors [[graft.pipeline.Dedup.shingles]]. */
  def shingleHashes(s: UTF8String, n: Int): ArrayData = {
    val th = tokenHashes(s)
    val raw =
      if (th.length >= n) {
        val out = new Array[Long](th.length - n + 1)
        var i = 0
        while (i < out.length) {
          var h = 1125899906842597L
          var j = 0
          while (j < n) { h = h * 31 + th(i + j); j += 1 }
          out(i) = mix(h)
          i += 1
        }
        out
      } else {
        var h = 1125899906842597L
        var j = 0
        while (j < th.length) { h = h * 31 + th(j); j += 1 }
        Array(mix(h))
      }
    java.util.Arrays.sort(raw)
    var uniq = 0
    var i = 0
    while (i < raw.length) {
      if (i == 0 || raw(i) != raw(i - 1)) { raw(uniq) = raw(i); uniq += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(raw, uniq))
  }

  /** k-function MinHash signature over a shingle-hash array: the i-th hash
    * family is mix(h ^ mix(i)), folded to its minimum in one pass. */
  def minhashSig(shingles: ArrayData, k: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val h = shingles.getLong(i)
      var f = 0
      while (f < k) {
        val v = mix(h ^ mix(f))
        if (v < sig(f)) sig(f) = v
        f += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** LSH band hashes: signature split into `bands` equal bands, each folded
    * to one 64-bit bucket key. */
  def bandHashes(sig: ArrayData, bands: Int): ArrayData = {
    val k = sig.numElements()
    // effective band count: bands > k would give rows = 0 and CONSTANT
    // per-band keys (every document collides in every LSH bucket); the
    // last band absorbs the k % b remainder so no signature entry is
    // silently dropped when bands does not divide k
    val b0 = math.min(bands, math.max(k, 1))
    val rows = if (b0 == 0) 0 else k / b0
    val out = new Array[Long](math.max(b0, 0))
    var b = 0
    while (b < b0) {
      var h = b.toLong
      val from = b * rows
      val until = if (b == b0 - 1) k else from + rows
      var j = from
      while (j < until) { h = mix(h ^ sig.getLong(j)); j += 1 }
      out(b) = h
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** 64-bit SimHash over the token multiset: per bit, the sign of the
    * +1/-1 vote sum across token hashes. */
  def simhash(s: UTF8String): Long = {
    val th = tokenHashes(s)
    val votes = new Array[Int](64)
    var i = 0
    while (i < th.length) {
      val h = th(i)
      var j = 0
      while (j < 64) {
        votes(j) += (((h >>> j) & 1L).toInt * 2) - 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }
}

case class ShingleHashExpr(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TextHash.requireType(prettyName, child.dataType, StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.shingleHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.shingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashExpr =
    copy(child = newChild)
}

case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TextHash.requireType(prettyName, child.dataType, ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.minhashSig(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.minhashSig($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

case class BandHashExpr(child: Expression, bands: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TextHash.requireType(prettyName, child.dataType, ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_hashes"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.bandHashes(input.asInstanceOf[ArrayData], bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.bandHashes($c, $bands)")
  override protected def withNewChildInternal(newChild: Expression): BandHashExpr =
    copy(child = newChild)
}

/** Per-document stopword scores for N languages in ONE pass: tokenizes
  * exactly like `split(lower(s), "\\s+")` (Java regex, limit -1 — leading
  * empty token kept) and returns `array<double>` of
  * stopword-matches/total-tokens per language. The declarative form (one
  * interpreted `filter` HOF per language, each re-splitting) dominated the
  * text-analysis bench; this is one static call per row. Division is the
  * same IEEE op, so results are bit-identical to the Column formulation. */
case class LangScoresExpr(child: Expression, lists: Seq[Seq[String]])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TextHash.requireType(prettyName, child.dataType, StringType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "lang_scores"

  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    lists.map { l =>
      val s = new java.util.HashSet[String]()
      l.foreach(s.add)
      s
    }.toArray

  protected override def nullSafeEval(input: Any): Any =
    LangScoresExpr.compute(input.asInstanceOf[UTF8String], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopSets", sets, "java.util.HashSet[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.LangScoresExpr.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): LangScoresExpr =
    copy(child = newChild)
}

object LangScoresExpr {
  def compute(s: UTF8String, sets: Array[java.util.HashSet[String]]): ArrayData = {
    val tokens = TextHash.tokenize(s)
    val out = new Array[Double](sets.length)
    var li = 0
    while (li < sets.length) {
      var matches = 0
      var i = 0
      while (i < tokens.length) {
        if (sets(li).contains(tokens(i))) matches += 1
        i += 1
      }
      out(li) = matches.toDouble / tokens.length.toDouble
      li += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TextHash.requireType(prettyName, child.dataType, StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.simhash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}
