package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 removed `Column.expr` from the public surface; the converter
  * lives in `private[sql]` ExpressionUtils. This shim re-exports just the
  * Column -> Catalyst Expression accessor for graft's typed fast paths
  * (inspecting a column's resolved DataType to skip coercion wrappers).
  */
object GraftColumnAccess {
  /** Eagerly convert the ColumnNode tree to a Catalyst expression.
    * (ExpressionUtils.expression returns a lazy ColumnNodeExpression
    * wrapper whose `dataType` misleadingly reads NullType.) */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap a Catalyst expression back into a Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
