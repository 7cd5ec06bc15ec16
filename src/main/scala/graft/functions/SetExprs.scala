package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Intersection CARDINALITY of two ascending-sorted long arrays: one merge
  * pass, no hash table, no per-element allocation — the verify kernel of
  * the prefix-filtered similarity joins ([[graft.pipeline.Dedup]]).
  *
  * `size(array_intersect(a, b))` on the same inputs builds an OpenHashSet
  * and a result array per ROW PAIR; over the millions of candidate pairs a
  * similarity join verifies, that allocation + hashing dominates the
  * stage. This kernel is O(|a|+|b|) primitive compares and returns the
  * count directly (the joins never need the intersection's ELEMENTS, only
  * its size).
  *
  * Contract: both inputs must be sorted ascending with no null elements
  * and no duplicates within one array (the callers build them with
  * `sort_array(collect_list(...))` over per-document DISTINCT token ids).
  * Elements only ever compare by `==`/`<`, so the count is EXACTLY the
  * set-intersection cardinality — no hashing, no collision caveat. */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "sorted_long_intersect_count"

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
    SortedLongIntersectCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(code =
      code"""
        ${l.code}
        ${r.code}
        boolean ${ev.isNull} = ${l.isNull} || ${r.isNull};
        int ${ev.value} = 0;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.SortedLongIntersectCount.compute(
            ${l.value}, ${r.value});
        }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersectCount {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}
