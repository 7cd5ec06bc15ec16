package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE segmentation with a TRAINED merge list as ONE native kernel call
  * per document (reference tokenizer inference: the apply-merges half of
  * Sennrich et al. 2016; reference corpus ops in pixelspark/warp run
  * text transforms as per-row native steps, e.g. QBECalculateStep.swift).
  *
  * Why a kernel and not the declarative fold ([[graft.pipeline.Bpe]]
  * `segmentFold`): each merge is an `aggregate` HOF over the symbol
  * array, and ArrayAggregate is CodegenFallback — M merges evaluate
  * M interpreted lambda folds per WORD, and the generated wrapper code
  * grows linearly with M until it breaks codegen limits. Here the whole
  * merge list is applied inside one static JIT-compiled call: O(M·L)
  * tight in-place passes per word, constant generated-code size at any
  * M — at 100 TB segmentation stays a pure map pass inside whole-stage
  * codegen with a realistic (thousands-long) merge list.
  *
  * Semantics are bit-identical to the fold (differentially pinned in
  * BpeSpec): tokenize = `split(trim(lower(s)), "\\s+")` (TextHash
  * .tokenize), per word start from code-point characters + `</w>`, apply
  * each merge in rank order as a greedy left-to-right non-overlapping
  * replacement. Returns `array<array<string>>` — pieces per word.
  */
object BpeSegmentExpr {
  /** merges flattened as [a0, b0, a0+b0, a1, b1, a1+b1, ...]. */
  def flatten(merges: Seq[(String, String)]): Array[String] = {
    val f = new Array[String](merges.length * 3)
    var i = 0
    merges.foreach { case (a, b) =>
      f(i) = a; f(i + 1) = b; f(i + 2) = a + b; i += 3
    }
    f
  }

  /** Segment one word: initial symbols are code points (split("") never
    * cuts a surrogate pair) + the end-of-word marker; each merge is one
    * greedy in-place pass (write index trails read). Returns the symbol
    * array; the live prefix length is in `lenOut(0)`. */
  private[functions] def segmentWord(word: String, flat: Array[String],
                                     lenOut: Array[Int]): Array[String] = {
    var n = 0
    val syms = new Array[String](Character.codePointCount(word, 0, word.length) + 1)
    var ci = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      syms(n) = new String(Character.toChars(cp))
      n += 1
      ci += Character.charCount(cp)
    }
    syms(n) = graft.pipeline.Bpe.EndOfWord
    n += 1
    var m = 0
    while (m < flat.length && n > 1) {
      val a = flat(m); val b = flat(m + 1); val ab = flat(m + 2)
      var w = 0
      var i = 0
      while (i < n) {
        val cur = syms(i)
        if (w > 0 && b == cur && a == syms(w - 1)) syms(w - 1) = ab
        else { syms(w) = cur; w += 1 }
        i += 1
      }
      n = w
      m += 3
    }
    lenOut(0) = n
    syms
  }

  def compute(s: UTF8String, flat: Array[String]): ArrayData = {
    val words = TextHash.tokenize(s)
    val out = new Array[AnyRef](words.length)
    val lenOut = new Array[Int](1)
    var wi = 0
    while (wi < words.length) {
      val syms = segmentWord(words(wi), flat, lenOut)
      val n = lenOut(0)
      val pieces = new Array[AnyRef](n)
      var k = 0
      while (k < n) { pieces(k) = UTF8String.fromString(syms(k)); k += 1 }
      out(wi) = new GenericArrayData(pieces)
      wi += 1
    }
    new GenericArrayData(out)
  }
}

object BpeEncodeExpr {
  /** Segment + map to vocabulary ids in one pass, flattened across words
    * (the shape an LM pipeline feeds downstream). Unknown pieces (symbols
    * outside the training vocabulary) encode as id 0. */
  def compute(s: UTF8String, flat: Array[String],
              vocab: java.util.HashMap[String, Integer]): ArrayData = {
    val words = TextHash.tokenize(s)
    var buf = new Array[Int](64)
    var total = 0
    val lenOut = new Array[Int](1)
    var wi = 0
    while (wi < words.length) {
      val syms = BpeSegmentExpr.segmentWord(words(wi), flat, lenOut)
      val n = lenOut(0)
      if (total + n > buf.length)
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, total + n))
      var k = 0
      while (k < n) {
        val id = vocab.get(syms(k))
        buf(total) = if (id == null) 0 else id.intValue()
        total += 1
        k += 1
      }
      wi += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(buf, total))
  }
}

/** `bpe_encode(text)` — segmentation + vocabulary-id lookup fused in one
  * kernel call; `array<int>` of token ids flattened across words, id 0 =
  * unknown. The vocabulary (index = id) is frozen into the expression
  * like the merge list — at scale both ship as one plan-referenced
  * object, not per-row state. */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)],
                         vocab: Seq[String]) extends UnaryExpression {
  @transient private lazy val flat: Array[String] = BpeSegmentExpr.flatten(merges)
  @transient private lazy val vocabMap: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocab.length * 2)
    vocab.zipWithIndex.foreach { case (t, i) => m.putIfAbsent(t, i) }
    m
  }

  override def checkInputDataTypes(): TypeCheckResult =
    TextHash.requireType(prettyName, child.dataType, StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "bpe_encode"
  override def foldable: Boolean = child.foldable

  protected override def nullSafeEval(input: Any): Any =
    BpeEncodeExpr.compute(input.asInstanceOf[UTF8String], flat, vocabMap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mergesRef = ctx.addReferenceObj("bpeMerges", flat, "java.lang.String[]")
    val vocabRef = ctx.addReferenceObj("bpeVocab", vocabMap, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeEncodeExpr.compute($c, $mergesRef, $vocabRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

case class BpeSegmentExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  @transient private lazy val flat: Array[String] = BpeSegmentExpr.flatten(merges)

  override def checkInputDataTypes(): TypeCheckResult =
    TextHash.requireType(prettyName, child.dataType, StringType)
  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false), containsNull = false)
  override def prettyName: String = "bpe_segment"
  // pure function of the child — the merge list is frozen into the expression
  override def foldable: Boolean = child.foldable

  protected override def nullSafeEval(input: Any): Any =
    BpeSegmentExpr.compute(input.asInstanceOf[UTF8String], flat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mergesRef = ctx.addReferenceObj("bpeMerges", flat, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeSegmentExpr.compute($c, $mergesRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegmentExpr =
    copy(child = newChild)
}
