package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Regular-grid resampling with forward fill — "one row per (key, step)
  * from each key's first event to its last, carrying the latest observed
  * value across the gaps". The batch complement to the streaming window
  * aggregates: dashboards and feature pipelines want dense, regular
  * series; event streams are sparse and bursty.
  *
  * Plan shape, in order:
  *  1. one hash aggregate to (key, bucket) keeping the LAST observation
  *     per bucket (`max_by` over the (ts, tiebreak) struct — deterministic
  *     under event-time ties);
  *  2. a per-key min/max aggregate (one row per key) exploded through
  *     `sequence()` into the dense bucket grid — rows ∝ keys × steps,
  *     independent of event volume;
  *  3. a left join of grid onto observations (both sides already keyed and
  *     bucketed — one shuffle each, co-partitioned);
  *  4. forward fill = `last(value, ignoreNulls)` over a per-key window
  *     ordered by bucket. Partitioned by key — the rankBy scale shape,
  *     never a global window.
  *
  * Buckets are integer epoch-microsecond steps (`floor(unix_micros/step)`)
  * — the same portability decision as retentionCohorts: integer bucket
  * arithmetic is engine-invariant where calendar truncation is not.
  */
object TimeSeries {

  /** Output: one row per (key, bucket) with `bucket_ts` (the bucket's
    * start as microsecond epoch), `<out>` (last observed value at or
    * before the bucket, forward-filled) and `filled` (true when the bucket
    * had no observation of its own). Leading buckets before a key's first
    * observation cannot occur (the grid starts at the first event). */
  def resampleFill(df: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String, stepUs: Long, tieBreak: String,
                   out: String = "value"): DataFrame = {
    require(stepUs > 0, s"stepUs must be > 0, got $stepUs")
    // NTZ -> LTZ cast before unix_micros: the engine runs sessions in UTC,
    // so the instant is unchanged (the q_sessionize/q_rolling recipe)
    val bucket = floor(unix_micros(
      col(tsCol).cast(org.apache.spark.sql.types.TimestampType)) / lit(stepUs)).as("__b")

    val obs = df.select(col(keyCol), bucket, col(tsCol), col(valueCol), col(tieBreak))
      .groupBy(col(keyCol), col("__b"))
      .agg(max_by(col(valueCol), struct(col(tsCol), col(tieBreak))).as("__obs"))

    val grid = df.select(col(keyCol), bucket)
      .groupBy(col(keyCol))
      .agg(min(col("__b")).as("__lo"), max(col("__b")).as("__hi"))
      .select(col(keyCol), explode(sequence(col("__lo"), col("__hi"))).as("__b"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("__b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    grid.join(obs, Seq(keyCol, "__b"), "left")
      .withColumn(out, last(col("__obs"), ignoreNulls = true).over(w))
      .withColumn("filled", col("__obs").isNull)
      .select(col(keyCol), (col("__b") * stepUs).as("bucket_ts"), col(out), col("filled"))
  }
}
