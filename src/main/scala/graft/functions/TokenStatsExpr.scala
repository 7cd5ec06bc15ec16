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

    val tf = new java.util.HashMap[String, Integer]()
    var maxTf = 0
    var i = 0
    while (i < tokens.length) {
      val c = tf.getOrDefault(tokens(i), 0) + 1
      tf.put(tokens(i), c)
      if (c > maxTf) maxTf = c
      i += 1
    }

    val bf = new java.util.HashMap[String, Integer]()
    var maxBf = 0
    i = 0
    while (i < tokens.length - 1) {
      // tokens contain no whitespace, so ' ' is an unambiguous joiner
      val bg = tokens(i) + " " + tokens(i + 1)
      val c = bf.getOrDefault(bg, 0) + 1
      bf.put(bg, c)
      if (c > maxBf) maxBf = c
      i += 1
    }

    UnsafeArrayData.fromPrimitiveArray(Array[Long](
      tokens.length.toLong, tf.size.toLong, maxTf.toLong,
      math.max(tokens.length - 1, 0).toLong, bf.size.toLong, maxBf.toLong))
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
