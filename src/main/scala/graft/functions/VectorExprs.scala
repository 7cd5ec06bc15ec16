package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two numeric arrays (float or double elements).
  *
  * Folds STRICTLY left-to-right in double — element i contributes
  * a(i)*b(i) in index order — so results are bit-identical to the
  * higher-order `aggregate(zip_with(a,b,_*_), 0.0, _+_)` formulation (and
  * to any external engine that folds lists in order), which is what the
  * correctness oracle compares against. The HOF formulation evaluates
  * interpreted at ~µs per element; this is one static call per row and
  * dominates every similarity operator's runtime (sketching, cosine
  * verify, top-k scoring). Mismatched lengths yield null (the zip_with
  * null-poisoning behavior). */
case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"
  // explicit pin of the BinaryExpression default (left && right foldable):
  // probe plans RELY on Catalyst folding norm(queryLiteral) =
  // sqrt(vec_dot(q, q)) into one literal — a non-foldable kernel would
  // re-run that dim-length loop per scanned row (PlanAuditSpec asserts the
  // fold), so the contract is stated here rather than inherited silently
  override def foldable: Boolean = left.foldable && right.foldable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // a wrong element type must fail ANALYSIS: getDouble over an int-
    // element ArrayData would reinterpret memory and return garbage
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    DotProductExpr.compute(a.asInstanceOf[ArrayData], isFloat(left),
      b.asInstanceOf[ArrayData], isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lf = isFloat(left); val rf = isFloat(right)
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val boxed = ctx.freshName("dot")
    ev.copy(code =
      code"""
        ${l.code}
        ${r.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${l.isNull} && !${r.isNull}) {
          java.lang.Double $boxed = graft.functions.DotProductExpr.compute(
            ${l.value}, $lf, ${r.value}, $rf);
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
        }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProductExpr = copy(left = newLeft, right = newRight)
}

/** Native random-hyperplane sketch: all `nBits` sign bits of plane·vec in
  * ONE pass over the vector, packed into `ceil(nBits/64)` longs
  * (word w, bit i = sign of plane 64w+i).
  *
  * The declarative formulation — nBits separate `when(vec_dot(v, plane_i)
  * > 0, ...)` columns OR-folded together — re-reads the vector nBits times
  * and at 256 bits generates pathological codegen (hundreds of literal
  * arrays in one method). This kernel is a single static call per row;
  * plane data is one flat double[] referenced from the generated code.
  * A vector whose length differs from the planes' dimension yields null
  * (same poisoning contract as [[DotProductExpr]]). */
case class SketchExpr(child: Expression, planes: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  private val nBits = planes.length
  private val dim = if (nBits == 0) 0 else planes(0).length
  require(nBits > 0 && planes.forall(_.length == dim),
    "sketch planes must be non-empty and rectangular")

  @transient private lazy val flat: Array[Double] = {
    val f = new Array[Double](nBits * dim)
    var b = 0
    while (b < nBits) { System.arraycopy(planes(b), 0, f, b * dim, dim); b += 1 }
    f
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sketch"
  // explicit pin of the UnaryExpression default (child.foldable): pure
  // function of the child — the planes are frozen into the expression
  override def foldable: Boolean = child.foldable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>/array<double> input, got ${other.simpleString}")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  protected override def nullSafeEval(v: Any): Any =
    SketchExpr.compute(v.asInstanceOf[ArrayData], isFloat, flat, nBits, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fl = isFloat
    val planesRef = ctx.addReferenceObj("sketchPlanes", flat, "double[]")
    val c = child.genCode(ctx)
    val out = ctx.freshName("sketch")
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        ArrayData ${ev.value} = null;
        if (!${c.isNull}) {
          ArrayData $out = graft.functions.SketchExpr.compute(
            ${c.value}, $fl, $planesRef, $nBits, $dim);
          if ($out != null) { ${ev.isNull} = false; ${ev.value} = $out; }
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): SketchExpr =
    copy(child = newChild)
}

object SketchExpr {
  def compute(v: ArrayData, vFloat: Boolean, flat: Array[Double],
              nBits: Int, dim: Int): ArrayData = {
    if (v.numElements() != dim) return null
    val vec = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (v.isNullAt(j)) return null
      vec(j) = if (vFloat) v.getFloat(j).toDouble else v.getDouble(j)
      j += 1
    }
    val words = new Array[Long]((nBits + 63) / 64)
    var b = 0
    while (b < nBits) {
      var acc = 0.0
      val off = b * dim
      var i = 0
      while (i < dim) { acc += flat(off + i) * vec(i); i += 1 }
      if (acc > 0) words(b / 64) |= (1L << (b % 64))
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(words)
  }
}

/** Native Hamming distance between two packed bit sketches
  * (`array<bigint>`, as produced by [[SketchExpr]]): one static call
  * XOR+POPCNTs all words. The declarative per-word formulation —
  * `bit_count(element_at(a,w) ^ element_at(b,w))` summed over words —
  * costs 2 ArrayData accessor expressions per word plus the adds; at a
  * 256-bit sketch that is ~8 boxed accessor calls per candidate PAIR,
  * which rivals the dot product the gate exists to avoid. Mismatched
  * lengths yield null (same poisoning contract as [[DotProductExpr]]). */
case class HammingDistExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "bits_hamming"
  // same explicit foldability pin as DotProductExpr: the query sketch is
  // a literal, so literal-vs-literal distances must fold
  override def foldable: Boolean = left.foldable && right.foldable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    HammingDistExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val boxed = ctx.freshName("hd")
    ev.copy(code =
      code"""
        ${l.code}
        ${r.code}
        boolean ${ev.isNull} = true;
        int ${ev.value} = 0;
        if (!${l.isNull} && !${r.isNull}) {
          java.lang.Integer $boxed = graft.functions.HammingDistExpr.compute(
            ${l.value}, ${r.value});
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.intValue(); }
        }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HammingDistExpr = copy(left = newLeft, right = newRight)
}

object HammingDistExpr {
  def compute(a: ArrayData, b: ArrayData): java.lang.Integer = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    Integer.valueOf(acc)
  }
}

object DotProductExpr {
  def compute(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null // zip_with pads with null => poison
    var acc = 0.0
    var i = 0
    while (i < n) {
      // a null ELEMENT poisons the product, exactly like the declarative
      // aggregate(zip_with(...)) — reading the slot raw would return
      // whatever bits happen to be there
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    Double.box(acc)
  }
}

/** Product-quantization encoder: split the vector into `m` equal
  * subspaces and emit, per subspace, the index of the nearest codebook
  * centroid (L2, ties to the lowest index — deterministic). Codebooks
  * are frozen into the expression like [[SketchExpr]]'s planes; one
  * static call per row inside whole-stage codegen — the declarative
  * m×k-argmin formulation would run interpreted per element.
  *
  * Output: array<int> of length m (code j in [0, k)). Null/ragged
  * input nulls out, same contract as the other vector kernels. */
case class PqEncodeExpr(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  private val m = codebooks.length
  private val k = if (m == 0) 0 else codebooks(0).length
  private val sub = if (k == 0) 0 else codebooks(0)(0).length
  require(m > 0 && k > 0 && sub > 0 &&
    codebooks.forall(cb => cb.length == k && cb.forall(_.length == sub)),
    "PQ codebooks must be non-empty and rectangular (m x k x sub)")

  @transient private lazy val flat: Array[Double] = {
    val f = new Array[Double](m * k * sub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        System.arraycopy(codebooks(j)(c), 0, f, (j * k + c) * sub, sub)
        c += 1
      }
      j += 1
    }
    f
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"
  // explicit pin of the UnaryExpression default: pure function of the child
  override def foldable: Boolean = child.foldable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>/array<double> input, got ${other.simpleString}")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  protected override def nullSafeEval(v: Any): Any =
    PqEncodeExpr.compute(v.asInstanceOf[ArrayData], isFloat, flat, m, k, sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fl = isFloat
    val cbRef = ctx.addReferenceObj("pqCodebooks", flat, "double[]")
    val c = child.genCode(ctx)
    val out = ctx.freshName("pqcodes")
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        ArrayData ${ev.value} = null;
        if (!${c.isNull}) {
          ArrayData $out = graft.functions.PqEncodeExpr.compute(
            ${c.value}, $fl, $cbRef, $m, $k, $sub);
          if ($out != null) { ${ev.isNull} = false; ${ev.value} = $out; }
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** Asymmetric-distance PQ scoring kernel: given the per-row code array
  * and the query's precomputed m×k dot TABLE (frozen into the expression
  * like [[PqEncodeExpr]]'s codebooks), returns
  * `Σ_j table(j·k + codes(j))` — the whole per-row ADC fold as ONE static
  * call inside whole-stage codegen. The declarative twin
  * (`aggregate(zip_with(codes, sequence(..), element_at(..)))`) runs
  * interpreted per ELEMENT (ArrayAggregate/ZipWith are CodegenFallback),
  * which is the first thing a 100 TB probe profile surfaces. Accumulation
  * order matches the declarative left fold exactly (j ascending from
  * 0.0), so results are bit-identical. Null/ragged/out-of-range codes
  * null out. */
case class PqAdcExpr(child: Expression, table: Array[Double], m: Int, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(m > 0 && k > 0 && table.length == m * k,
    s"ADC table must be m*k = ${m * k} doubles, got ${table.length}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"
  override def foldable: Boolean = child.foldable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<int> codes, got ${other.simpleString}")
    }

  protected override def nullSafeEval(v: Any): Any = {
    val r = PqAdcExpr.compute(v.asInstanceOf[ArrayData], table, m, k)
    if (r.isNaN) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("adcTable", table, "double[]")
    val c = child.genCode(ctx)
    val out = ctx.freshName("adc")
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${c.isNull}) {
          double $out = graft.functions.PqAdcExpr.compute(${c.value}, $tRef, $m, $k);
          if (!Double.isNaN($out)) { ${ev.isNull} = false; ${ev.value} = $out; }
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcExpr =
    copy(child = newChild)
}

object PqAdcExpr {
  /** NaN signals null (ragged length, null element, code out of range) —
    * a real ADC sum of finite table entries can never be NaN. */
  def compute(codes: ArrayData, table: Array[Double], m: Int, k: Int): Double = {
    if (codes.numElements() != m) return Double.NaN
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return Double.NaN
      val c = codes.getInt(j)
      if (c < 0 || c >= k) return Double.NaN
      acc += table(j * k + c)
      j += 1
    }
    acc
  }
}

object PqEncodeExpr {
  def compute(v: ArrayData, vFloat: Boolean, flat: Array[Double],
              m: Int, k: Int, sub: Int): ArrayData = {
    if (v.numElements() != m * sub) return null
    val vec = new Array[Double](m * sub)
    var i = 0
    while (i < vec.length) {
      if (v.isNullAt(i)) return null
      vec(i) = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestDist = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        var acc = 0.0
        val off = (j * k + c) * sub
        var d = 0
        while (d < sub) {
          val diff = vec(j * sub + d) - flat(off + d)
          acc += diff * diff
          d += 1
        }
        if (acc < bestDist) { bestDist = acc; best = c } // strict: ties keep lowest c
        c += 1
      }
      codes(j) = best
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(codes)
  }
}
