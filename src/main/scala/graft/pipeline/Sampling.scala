package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * Everything keys off a PORTABLE content hash of the row id (md5 hex →
  * integer bucket) rather than `rand()`: the same row lands in the same
  * split on every engine, every run, every cluster size — the property that
  * keeps train/test assignment stable across pipeline re-runs and lets a
  * SQL oracle verify the assignment exactly. Pure codegen'd column
  * expressions; a split/sample is one narrow map pass (or map+filter), no
  * shuffle at all.
  */
object Sampling {

  /** Uniform deterministic bucket in `[0, buckets)` from the id's md5.
    * 32 hash bits are used — plenty for bucket counts up to ~1e6 with
    * negligible modulo bias. Engine-portable: any SQL engine with md5()
    * computes the identical bucket. */
  def hashBucket(idCol: Column, buckets: Int = 10000): Column = {
    require(buckets > 0 && buckets <= (1 << 20), s"buckets must be in [1, 2^20], got $buckets")
    conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10).cast("long") % buckets
  }

  /** Split label ('train'/'val'/'test'/...) from cumulative weight ranges
    * over the hash-bucket space. Weights are normalized; the LAST label
    * absorbs rounding remainder so every bucket maps to exactly one label. */
  def splitLabel(idCol: Column, weights: Seq[(String, Double)],
                 buckets: Int = 10000): Column = {
    require(weights.nonEmpty, "splitLabel needs at least one (label, weight)")
    require(weights.forall(_._2 > 0), "split weights must be positive")
    val total = weights.map(_._2).sum
    val b = hashBucket(idCol, buckets)
    val thresholds = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .tail.map(f => math.round(f * buckets))
    // when-chain over cumulative thresholds; final otherwise = last label.
    // A null id must yield a null LABEL, not fall through every null
    // comparison into the last split (a batch of null ids would silently
    // flood the eval split); stratifiedSample's filter drops the same rows.
    val chain = weights.init.zip(thresholds.init)
      .foldRight(lit(weights.last._1): Column) {
        case (((label, _), t), rest) => when(b < t, label).otherwise(rest)
      }
    when(b.isNotNull, chain)
  }

  /** Add a `split` column with a stable train/val/test-style assignment. */
  def splitByHash(df: DataFrame, idCol: String, weights: Seq[(String, Double)],
                  buckets: Int = 10000, out: String = "split"): DataFrame =
    df.withColumn(out, splitLabel(col(idCol), weights, buckets))

  /** Deterministic stratified sample: keep a per-stratum fraction of rows,
    * selected by hash threshold (NOT rand()), so re-runs and engines agree
    * row-for-row. Strata absent from `fractions` fall back to
    * `defaultFraction` (0 = drop). Null ids are dropped (their bucket is
    * null, matching [[splitLabel]]'s null label). Scale shape: one
    * map+filter pass, the stratum lookup is a compiled when-chain — no
    * join, no shuffle. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0,
                       buckets: Int = 10000): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0, 1]")
    val b = hashBucket(col(idCol), buckets)
    val threshold = fractions.toSeq.sortBy(_._1).foldRight(
      lit(math.round(defaultFraction * buckets)): Column) {
      case ((stratum, f), rest) =>
        when(col(strataCol).cast("string") === stratum,
          math.round(f * buckets)).otherwise(rest)
    }
    df.filter(b < threshold)
  }

  /** Domain-balanced score filtering: keep the top `frac` of rows PER
    * SHARD by `scoreCol` (the curation move that a global threshold gets
    * wrong — one high-scoring domain would crowd out every other). Rank
    * position is percent_rank over (score desc, tie), so the cut is
    * exact, reproducible, and engine-portable: percent_rank is the
    * integer ratio (rank-1)/(n-1), and `tieCol` (unique per shard) makes
    * the ordering total — no nondeterministic boundary rows.
    *
    * Scale shape: one exchange hash-partitioned by shard + a per-shard
    * sort — the same shape as [[graft.pipeline.Packing.packSequences]];
    * nothing global, nothing collected. Shards must be numerous enough
    * to spread (domains/files, not a 3-value column) — the same contract
    * as any partitioned window. */
  def keepTopFraction(df: DataFrame, scoreCol: Column, shardCol: Column,
                      tieCol: Column, frac: Double,
                      out: String = "keep_frac"): DataFrame = {
    require(frac >= 0 && frac <= 1, s"frac must be in [0, 1], got $frac")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shardCol).orderBy(scoreCol.desc, tieCol)
    df.withColumn(out, percent_rank().over(w)).filter(col(out) <= frac)
  }
}
