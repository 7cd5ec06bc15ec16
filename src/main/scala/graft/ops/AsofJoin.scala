package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for every left row, attach the most recent right row with
  * the same key whose timestamp is <= the left row's timestamp — the
  * canonical "price/state at event time" join that Spark has no native
  * operator for (the brief's flagship custom-operator example; DuckDB
  * ships it as ASOF JOIN, which is what the correctness oracle uses).
  *
  * Shape: NOT a per-row range probe. Both sides are tagged and unioned,
  * then ONE window pass per key (ordered by time, right rows before left
  * rows at equal timestamps) carries the latest right payload forward via
  * `last(..., ignoreNulls)`. Cost = one shuffle on the key + a sorted
  * window — the same wide ops an equi-join would need; scales to
  * arbitrarily many right-side versions without a quadratic candidate
  * blow-up or an AQE-hostile range condition.
  */
object AsofJoin {

  /** @param keys       equi-key column names present on both sides
    * @param leftTs     left event-time column name
    * @param rightTs    right version-time column name
    * @param rightCols  right payload columns to attach (null when no
    *                   right version is <= the event time)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(rightCols.map(c => col(s"`$c`")): _*)

    val l = left
      .withColumn("__ts", col(s"`$leftTs`"))
      .withColumn("__side", lit(1)) // left AFTER right at equal ts (>= is inclusive)
      .withColumn("__payload", lit(null).cast(
        right.select(payload).schema.head.dataType))
    val r = right
      .select(keys.map(c => col(s"`$c`")) :+ col(s"`$rightTs`").as("__ts") :+
        lit(0).as("__side") :+ payload.as("__payload"): _*)
    // align left's full schema: right rows carry nulls for left columns.
    // The presence check must be case-INSENSITIVE like withColumn's
    // replacement semantics — a case-sensitive contains() on a right side
    // spelling the key as "ID" vs left's "id" would null out the join key
    // for every right row (all payloads land in one null partition)
    val rAligned = leftCols.foldLeft(r) { (d, c) =>
      if (d.columns.exists(_.equalsIgnoreCase(c))) d
      else d.withColumn(c, lit(null))
    }.select(l.columns.map(c => col(s"`$c`")): _*)

    val w = Window.partitionBy(keys.map(c => col(s"`$c`")): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(rAligned)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"`$c`")) ++
        rightCols.map(c => col("__asof").getField(c).as(c)): _*)
  }
}
