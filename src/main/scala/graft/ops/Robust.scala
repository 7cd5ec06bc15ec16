package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust per-group outlier flagging — the modified z-score
  * (Iglewicz–Hoaglin): `0.6745 * (v - median) / MAD`, where MAD is the
  * median absolute deviation. Means and standard deviations are useless
  * for outlier screens on heavy-tailed corpus statistics (the outliers
  * drag the yardstick); the median/MAD pair is breakdown-point-0.5 robust.
  *
  * Scale shape: both medians ride [[BracketMedian.exactMedian]] — two
  * bounded-memory bracket passes (group medians, then medians of the
  * absolute deviations) and two key-joins back, never a whole-group
  * buffer. The per-group median table is tiny (one row per group), so the
  * joins broadcast under AQE.
  *
  * Degenerate groups where MAD = 0 (more than half the values identical)
  * get a null z-score and are never flagged — a zero yardstick measures
  * nothing, and silently dividing would flag every non-modal value with
  * an infinite score.
  *
  * (Reference scope: scale-extension family — the reference's statistical
  * surface stops at variance/stdev, Function.swift:2204-2268.)
  */
object Robust {

  /** Input rows plus `<out>` (the modified z-score) and `<out>_outlier`
    * (|z| > cutoff). Rows with a null value pass through with null z. */
  def outliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
               cutoff: Double = 3.5, accuracy: Int = 10000,
               out: String = "robust_z"): DataFrame = {
    require(groupCols.nonEmpty, "outliers needs at least one group column")
    require(cutoff > 0, s"cutoff must be > 0, got $cutoff")
    val v = graft.values.Warp.num(col(valueCol))

    val med = BracketMedian.exactMedian(df, groupCols, valueCol,
      accuracy, out = "__med")
    val medR = med.toDF(groupCols.map(c => s"__m_$c") :+ "__med": _*)
    def joinKeys(suffix: String) =
      groupCols.map(c => col(c) <=> col(s"${suffix}_$c")).reduce(_ && _)
    // LEFT + broadcast: groups whose values are all null have no median row
    // and must still pass through (null z, false flag); the per-group table
    // is one row per group, so the join never deserves a shuffle.
    val withMed = df.join(broadcast(medR), joinKeys("__m"), "left")
      .drop(groupCols.map(c => s"__m_$c"): _*)

    val dev = withMed.select((groupCols.map(col) :+
      abs(v - col("__med")).as("__dev")): _*)
    val mad = BracketMedian.exactMedian(dev, groupCols, "__dev",
      accuracy, out = "__mad")
    val madR = mad.toDF(groupCols.map(c => s"__d_$c") :+ "__mad": _*)

    val z = when(col("__mad") > 0,
      lit(0.6745) * (v - col("__med")) / col("__mad"))
    withMed.join(broadcast(madR), joinKeys("__d"), "left")
      .drop(groupCols.map(c => s"__d_$c"): _*)
      .withColumn(out, z)
      .withColumn(s"${out}_outlier", coalesce(abs(col(out)) > cutoff, lit(false)))
      .drop("__med", "__mad")
  }

  /** Median IMPUTATION: replace null/invalid values with their group's
    * exact median — the robust default for repairing numeric gaps before
    * training (means get dragged by the same outliers [[outliers]]
    * flags). Bracket median + one broadcast-size key join; rows in groups
    * with NO valid value at all keep null (there is nothing to impute
    * from); `<out>_was_null` marks the repaired rows. */
  def imputeMedian(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   accuracy: Int = 10000, out: String = "imputed"): DataFrame = {
    val v = graft.values.Warp.num(col(valueCol))
    val med = BracketMedian.exactMedian(df, groupCols, valueCol, accuracy, out = "__med")
    val medR = med.toDF(groupCols.map(c => s"__m_$c") :+ "__med": _*)
    df.join(broadcast(medR), groupCols.map(c => col(c) <=> col(s"__m_$c")).reduceOption(_ && _)
        .getOrElse(lit(true)), "left")
      .drop(groupCols.map(c => s"__m_$c"): _*)
      .withColumn(out, coalesce(v, col("__med")))
      .withColumn(s"${out}_was_null", v.isNull)
      .drop("__med")
  }

  /** Equi-DEPTH binning (quantile discretization): assign each row the
    * bucket index of its value among `nBins` per-group quantile cells —
    * the feature-engineering twin of the equi-WIDTH histogram. Edges come
    * from [[BracketMedian.exactQuantiles]] (bounded memory, exact); the
    * assignment is a broadcast join of the one-row-per-group edge table
    * plus a codegen'd comparison chain. Values equal to an edge go to the
    * LOWER bin (right-closed cells — ntile would need a per-group total
    * order; counting edges below needs only the edge table); bin ids run
    * 0..nBins-1. */
  def equiDepthBins(df: DataFrame, groupCols: Seq[String], valueCol: String,
                    nBins: Int, accuracy: Int = 10000,
                    out: String = "bin"): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val qs = (1 until nBins).map(i => s"__e$i" -> i.toDouble / nBins)
    val edges = BracketMedian.exactQuantiles(df, groupCols, valueCol, qs, accuracy)
    val edgesR = edges.toDF(groupCols.map(c => s"__b_$c") ++ qs.map(_._1): _*)
    val joined = df.join(broadcast(edgesR),
        groupCols.map(c => col(c) <=> col(s"__b_$c")).reduce(_ && _))
      .drop(groupCols.map(c => s"__b_$c"): _*)
    val v = graft.values.Warp.num(col(valueCol))
    // bin = number of edges strictly below the value
    val bin = qs.map { case (e, _) => when(v > col(e), 1).otherwise(0) }
      .reduce(_ + _)
    joined.withColumn(out, when(v.isNotNull, bin))
      .drop(qs.map(_._1): _*)
  }

  /** WINSORIZE: clamp each value into its group's [pLo, pHi] quantile
    * range — the robust alternative to dropping outliers when the row
    * must survive (training features, revenue columns). Exact edges from
    * [[BracketMedian.exactQuantiles]], broadcast back, one codegen'd
    * clamp; `<out>_clipped` marks affected rows. */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
                pLo: Double = 0.01, pHi: Double = 0.99, accuracy: Int = 10000,
                out: String = "winsorized"): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"need 0 <= pLo < pHi <= 1, got $pLo, $pHi")
    val v = graft.values.Warp.num(col(valueCol))
    val edges = BracketMedian.exactQuantiles(df, groupCols, valueCol,
      Seq("__lo" -> pLo, "__hi" -> pHi), accuracy)
    val edgesR = edges.toDF(groupCols.map(c => s"__w_$c") ++ Seq("__lo", "__hi"): _*)
    df.join(broadcast(edgesR),
        groupCols.map(c => col(c) <=> col(s"__w_$c")).reduce(_ && _), "left")
      .drop(groupCols.map(c => s"__w_$c"): _*)
      // least/greatest SKIP nulls, so an unguarded clamp would impute a null
      // value to the lower cap — a null must stay null
      .withColumn(out,
        when(v.isNotNull, least(greatest(v, col("__lo")), col("__hi"))))
      .withColumn(s"${out}_clipped", v.isNotNull && (v < col("__lo") || v > col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Join-key SKEW report — the diagnostic that decides between a plain
    * shuffle join, a broadcast, and [[graft.ops.WarpOps]]'s saltedJoin:
    * per-key row counts summarized as key cardinality, max/p50/p99 counts
    * and the max/median skew ratio. One hash aggregate to the per-key
    * count table (the only data-sized step), then the bounded-memory
    * bracket quantiles over COUNTS — groups-bounded, never another scan.
    * A `skew_ratio` in the hundreds says the hottest key will pin one
    * task; double digits is the salting threshold. */
  def skewReport(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "skewReport needs key columns")
    val counts = df.groupBy(keyCols.map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__g", lit(1))
    val qs = BracketMedian.exactQuantiles(counts, Seq("__g"), "__c",
      Seq("p50" -> 0.5, "p99" -> 0.99))
    counts.groupBy(col("__g"))
      .agg(count(lit(1)).as("n_keys"),
        max(col("__c")).as("max_cnt"),
        sum(col("__c")).as("n_rows"))
      .join(qs, "__g")
      .withColumn("skew_ratio", col("max_cnt").cast("double") / col("p50"))
      .select("n_keys", "n_rows", "max_cnt", "p50", "p99", "skew_ratio")
  }

  /** Two-sample DRIFT report ("did this week's corpus shift against last
    * week's?"): equi-width bins over the pooled range, per-bin counts for
    * both sides, cumulative shares, and the per-bin share gap — the
    * binned Kolmogorov–Smirnov statistic is the max `gap`. All-integer
    * counts until the final share division, so the report is exact and
    * engine-portable. Scale shape: one scalar min/max over the pooled
    * values, one hash aggregate per side, then windows over nBins rows —
    * the only "global" sort is over the bin table, whose size the CALLER
    * fixes (nBins), not the data. */
  def drift(dfA: DataFrame, dfB: DataFrame, valueCol: String,
            nBins: Int): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val spark = dfA.sparkSession
    val va = dfA.select(graft.values.Warp.num(col(valueCol)).as("__v"))
      .filter(col("__v").isNotNull)
    val vb = dfB.select(graft.values.Warp.num(col(valueCol)).as("__v"))
      .filter(col("__v").isNotNull)
    val mm = va.union(vb).agg(min(col("__v")), max(col("__v"))).head()
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    def bucket(c: Column): Column =
      if (hi <= lo) lit(0)
      else least(lit(nBins - 1),
        floor((c - lit(lo)) / lit(hi - lo) * nBins)).cast("int")
    def counts(d: DataFrame, out: String) =
      d.groupBy(bucket(col("__v")).as("bin")).agg(count(lit(1)).as(out))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val all = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    spark.range(nBins).select(col("id").cast("int").as("bin"))
      .join(counts(va, "__ca"), Seq("bin"), "left")
      .join(counts(vb, "__cb"), Seq("bin"), "left")
      .select(col("bin"), coalesce(col("__ca"), lit(0L)).as("cnt_a"),
        coalesce(col("__cb"), lit(0L)).as("cnt_b"))
      .withColumn("share_a",
        sum(col("cnt_a")).over(w).cast("double") / sum(col("cnt_a")).over(all))
      .withColumn("share_b",
        sum(col("cnt_b")).over(w).cast("double") / sum(col("cnt_b")).over(all))
      .withColumn("gap", abs(col("share_a") - col("share_b")))
  }
}
