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
    require(Seq("inner", "left", "left_outer", "leftouter").contains(joinType),
      "rangeJoin supports inner and left joins (right rows explode per bin; " +
        "outer-preserving them would duplicate unmatched intervals)")
    val lb = left.withColumn("__lbin",
      floor(col(s"`$leftVal`") / binWidth).cast("long"))
    val rb = right.withColumn("__rbin",
      explode(sequence(
        floor(col(s"`$loCol`") / binWidth).cast("long"),
        floor(col(s"`$hiCol`") / binWidth).cast("long"))))
    // range predicate INSIDE the join condition: with a left join an
    // unmatched left row null-extends (a post-join filter would drop it).
    // Every reference is side-QUALIFIED (lb(...)/rb(...)): unqualified
    // col("...") would be AMBIGUOUS whenever both inputs share the value
    // or bound column names
    val cond = lb("__lbin") === rb("__rbin") &&
      lb(s"`$leftVal`") >= rb(s"`$loCol`") && lb(s"`$leftVal`") < rb(s"`$hiCol`")
    lb.join(rb, cond, joinType).drop("__lbin", "__rbin")
  }
}
