package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: pair each left row with the right intervals
  * containing its value — `lo <= v < hi` — without the cartesian+filter
  * plan Spark produces for a raw range predicate (BroadcastNestedLoopJoin:
  * fine for a broadcastable side, fatal for two big ones).
  *
  * Shape: bin both sides by a fixed width — the left row into the single
  * bin holding its value, each interval into every bin it overlaps
  * (bounded explode) — then a plain equi-join on the bin plus the exact
  * range filter. Each left row can meet a given interval through exactly
  * one bin (its own), so no dedup pass is needed. Shuffle keys are
  * uniform bin ids; pick `binWidth` near the typical interval width so
  * the explode factor stays small.
  */
object RangeJoin {

  def rangeJoin(left: DataFrame, leftVal: String,
                right: DataFrame, loCol: String, hiCol: String,
                binWidth: Double, joinType: String = "inner"): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val lb = left.withColumn("__bin",
      floor(col(s"`$leftVal`") / binWidth).cast("long"))
    val rb = right.withColumn("__bin",
      explode(sequence(
        floor(col(s"`$loCol`") / binWidth).cast("long"),
        floor(col(s"`$hiCol`") / binWidth).cast("long"))))
    lb.join(rb, Seq("__bin"), joinType)
      .filter(col(s"`$leftVal`") >= col(s"`$loCol`") &&
              col(s"`$leftVal`") < col(s"`$hiCol`"))
      .drop("__bin")
  }
}
