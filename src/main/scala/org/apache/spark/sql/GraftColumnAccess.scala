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

  /** Resolve a column's DataType against `df`'s already-analyzed plan by
    * substituting attribute references and looking plain function calls up
    * in the session registry (the Column DSL emits every operator as an
    * UnresolvedFunction) — a driver-side tree walk that avoids running a
    * whole analysis pass (`df.select(c).schema`) per call. Returns None
    * when the expression needs real analysis (implicit casts, lambda
    * binding, ambiguous names, ...) — callers fall back to their general
    * path. */
  def resolvedDataType(df: Dataset[Row], c: Column): Option[types.DataType] =
    try {
      val plan = df.queryExecution.analyzed
      val resolver = df.sparkSession.sessionState.conf.resolver
      val registry = df.sparkSession.sessionState.functionRegistry
      val bound = expression(c).transformUp {
        case u: catalyst.analysis.UnresolvedAttribute =>
          plan.resolve(u.nameParts, resolver).getOrElse(u)
        case f: catalyst.analysis.UnresolvedFunction
            if f.nameParts.size == 1 && !f.isDistinct && f.filter.isEmpty &&
              f.orderingWithinGroup.isEmpty && f.arguments.forall(_.resolved) =>
          try registry.lookupFunction(
            catalyst.FunctionIdentifier(f.nameParts.head), f.arguments)
          catch { case scala.util.control.NonFatal(_) => f }
      }
      if (bound.resolved) Some(bound.dataType) else None
    } catch { case scala.util.control.NonFatal(_) => None }
}
