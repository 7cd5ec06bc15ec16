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
