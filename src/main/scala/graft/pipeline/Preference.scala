package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Preference-pair construction for RLHF / DPO-style training data:
  * turn scored candidates grouped by prompt (or any grouping) into
  * (chosen, rejected) pairs with a minimum score margin.
  *
  * The all-pairs-per-group construction is quadratic in group size, so
  * the operator is capped by design: per group only the TOP-k candidates
  * pair as "chosen" and the BOTTOM-k as "rejected" — at most k² pairs per
  * group regardless of group cardinality, which is the shape that
  * survives prompts with thousands of sampled responses. Ranking is
  * deterministic: (score desc, id asc) for chosen, (score asc, id asc)
  * for rejected, so ties never make the output run-dependent.
  *
  * Scale shape: two bounded per-group rank passes — row_number windows
  * under a `<= k` filter, which Spark executes as WindowGroupLimit
  * top-k heaps (no full per-group sort, same plan shape pinned for
  * [[Sampling.sampleKPerGroup]]) — then a group-keyed join of two
  * k-bounded sides. No shuffle carries more than k rows per group.
  */
object Preference {

  /** (chosen, rejected) pairs per group with `score_chosen − score_rejected
    * >= margin`. Emits one row per surviving pair: the group columns,
    * chosen/rejected ids and scores, and the realized margin. */
  def preferencePairs(df: DataFrame, groupCols: Seq[(String, Column)],
                      idCol: Column, scoreCol: Column,
                      k: Int, margin: Long): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val gNames = groupCols.map(_._1)
    val base = df.select(groupCols.map { case (n, c) => c.as(n) }
      :+ idCol.as("__id") :+ scoreCol.as("__score"): _*)
      .filter(col("__id").isNotNull && col("__score").isNotNull)
    val gCols = gNames.map(col)
    val topW = Window.partitionBy(gCols: _*)
      .orderBy(col("__score").desc, col("__id").asc)
    val botW = Window.partitionBy(gCols: _*)
      .orderBy(col("__score").asc, col("__id").asc)
    val chosen = base.withColumn("__rn", row_number().over(topW))
      .filter(col("__rn") <= k)
      .select(gCols :+ col("__id").as("chosen_id")
        :+ col("__score").as("chosen_score"): _*)
    val rejected = base.withColumn("__rn", row_number().over(botW))
      .filter(col("__rn") <= k)
      .select(gCols :+ col("__id").as("rejected_id")
        :+ col("__score").as("rejected_score"): _*)
    chosen.join(rejected, gNames)
      .filter(col("chosen_score") - col("rejected_score") >= margin)
      .withColumn("margin", col("chosen_score") - col("rejected_score"))
  }
}
