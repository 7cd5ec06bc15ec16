package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact top-k frequent items at corpus scale ("what are the most common
  * tokens / domains / licenses across 100 TB?") without ever shuffling the
  * full key cardinality.
  *
  * The naive plan — `groupBy(item).count().orderBy(desc).limit(n)` — is
  * correct but shuffles one row per DISTINCT item; for web-scale token or
  * URL columns that is billions of keys through the exchange just to keep
  * twenty. The classical two-pass alternative (Misra–Gries candidates,
  * then an exact recount of only the candidates):
  *
  *  - Pass 1 (map-only): each partition keeps a Misra–Gries summary of at
  *    most `k` counters. The summary's guarantee: an item absent from a
  *    partition's sketch has local count ≤ n_p/(k+1) (each decrement step
  *    removes k+1 occurrences' worth of weight). Summing over partitions,
  *    an item absent from EVERY sketch has global count ≤ n/(k+1) — so the
  *    union of per-partition sketch keys is a SUPERSET of every item with
  *    frequency above n/(k+1). Only ≤ k·P candidate rows leave the map
  *    stage.
  *  - Pass 2: one more scan, broadcast-semi-joined to the candidate set,
  *    then an exact count of the survivors. Map-side partial aggregation
  *    bounds the shuffle at |candidates| rows per task; the final top-n is
  *    a `TakeOrderedAndProject` (per-partition heaps, no global sort).
  *
  * The result is EXACT whenever the true n-th most frequent item occurs
  * more than n_total/(k+1) times — for skewed real-world frequency
  * distributions (tokens, domains) a `k` of a few thousand makes that
  * threshold trivially met. [[mgSketch]] exposes pass 1 alone for callers
  * that want the one-scan approximate summary (counts there are lower
  * bounds, undercounting by at most n_p/(k+1) per partition).
  *
  * Reference scope: the reference's aggregation surface stops at exact
  * groupBy (Aggregation.swift); this operator is part of the scale
  * extension set, same family as warpCountDistinctApprox.
  */
object HeavyHitters {

  /** Pass 1: per-partition Misra–Gries summaries, one row per surviving
    * (partition, item) counter. `cnt` is the per-partition residual count
    * (a lower bound on the partition-local frequency; the undercount is at
    * most n_p/(k+1)). Map-only — no shuffle.
    */
  def mgSketch(df: DataFrame, valueCol: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(valueCol.cast("string").as("item"))
      .filter(col("item").isNotNull).as[String]
    items.mapPartitions { it =>
      val counts = new java.util.HashMap[String, Long](k * 2)
      while (it.hasNext) {
        val x = it.next()
        val c = counts.getOrDefault(x, 0L)
        if (c > 0L) counts.put(x, c + 1L)
        else if (counts.size < k) counts.put(x, 1L)
        else {
          // decrement-all: removes (k+1) occurrences' worth of weight (the
          // incoming item plus one from each counter); amortized O(1) per
          // element since every decremented unit was previously added
          val itr = counts.entrySet().iterator()
          while (itr.hasNext) {
            val e = itr.next()
            if (e.getValue == 1L) itr.remove() else e.setValue(e.getValue - 1L)
          }
        }
      }
      import scala.jdk.CollectionConverters._
      counts.entrySet().iterator().asScala.map(e => (e.getKey, e.getValue.longValue()))
    }.toDF("item", "cnt")
  }

  /** Exact top-`n` items PER GROUP ("top terms per source"). Spark-first:
    * a (group, item) count then a rank-filtered window — which the
    * optimizer executes as WindowGroupLimit, a partial per-partition
    * top-k BEFORE the shuffle, so the exchange carries at most n·k rows
    * per map task, not the full per-group item cardinality. Use
    * [[topKExact]] when there is no grouping (a global window would
    * serialize through one task). Ties break on item ascending. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], valueCol: Column,
                   n: Int): DataFrame = {
    require(groupCols.nonEmpty, "topKPerGroup needs group columns — use topKExact")
    require(n > 0, s"n must be > 0, got $n")
    val gs = groupCols.map(col)
    val counts = df.select(gs :+ valueCol.cast("string").as("item"): _*)
      .filter(col("item").isNotNull)
      .groupBy(gs :+ col("item"): _*).agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gs: _*).orderBy(col("cnt").desc, col("item").asc)
    counts.withColumn("rk", row_number().over(w)).filter(col("rk") <= n)
  }

  /** Exact top-`n` items by frequency, sketch-gated: Misra–Gries
    * candidates (pass 1), exact recount of candidates only (pass 2).
    * Exact iff the n-th item's true count exceeds n_total/(k+1) — the
    * caller picks `k` for the skew they expect (default 1<<14 counters ≈
    * a few hundred KB per task). Ties broken by item ascending so the
    * result is deterministic.
    */
  def topKExact(df: DataFrame, valueCol: Column, n: Int, k: Int = 1 << 14): DataFrame = {
    require(n > 0, s"n must be > 0, got $n")
    val cands = mgSketch(df, valueCol, k).select("item").distinct()
    df.select(valueCol.cast("string").as("item"))
      .filter(col("item").isNotNull)
      .join(broadcast(cands), Seq("item"), "left_semi")
      .groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("item").asc)
      .limit(n)
  }

  /** Count-Min sketch counters (Cormode & Muthukrishnan 2005): `depth`
    * hash rows × `width` buckets. Each occurrence increments one bucket
    * per row; a point estimate is the MIN over its `depth` buckets — an
    * upper bound on the true count (never under), with overestimate
    * bounded by n/width per row w.h.p.
    *
    * Scale shape: one scan, items expanded ×depth (a small constant),
    * then a hash aggregate whose OUTPUT is at most depth×width rows
    * regardless of item cardinality — map-side partials absorb the
    * per-partition mass, so the shuffle carries ≤ depth×width rows per
    * task. That bounded-output property is the whole point: frequency
    * state for an unbounded key space in a fixed, mergeable, broadcastable
    * table. Hashes are md5-derived (row-salted), so any SQL engine
    * reproduces the identical counter table.
    */
  def cmsCounters(df: DataFrame, valueCol: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1, 16], got $depth")
    require(width >= 1 && width <= (1 << 20), s"width must be in [1, 2^20], got $width")
    val r = explode(array((0 until depth).map(lit): _*)).as("r")
    df.select(valueCol.cast("string").as("item"))
      .filter(col("item").isNotNull)
      .select(col("item"), r)
      .withColumn("b",
        conv(substring(md5(concat_ws(":", col("r"), col("item"))), 1, 8), 16, 10)
          .cast("long") % width)
      .groupBy(col("r"), col("b")).agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates from a CMS counter table for a set of query items:
    * min over the item's `depth` buckets (missing bucket = 0). The
    * counter side is ≤ depth×width rows — broadcast — so estimating any
    * number of query items is a map-side join, no shuffle of the queries.
    */
  /** Frequent co-occurring item PAIRS with minimum support — the
    * A-Priori first join step (market baskets, co-cited documents,
    * co-occurring n-grams). The classic anti-monotone prune runs FIRST:
    * a pair can only reach `minSupport` baskets if BOTH items do, so
    * items below support are dropped before any pair is formed — on a
    * Zipfian item universe this removes the long tail before the
    * quadratic-per-basket step, and the surviving per-basket item lists
    * are what bound the pair explosion (a basket of b survivors yields
    * b·(b−1)/2 pairs; cap extreme baskets upstream if b is unbounded).
    * Items are deduped per basket (support = basket count, not
    * occurrence count); pairs are canonical (item1 < item2). */
  def frequentPairs(df: DataFrame, basketCol: Column, itemCol: Column,
                    minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val bi = df.select(basketCol.as("__b"), itemCol.as("__i")).distinct()
    val freq = bi.groupBy("__i").agg(count(lit(1)).as("__sup"))
      .filter(col("__sup") >= minSupport)
    val pruned = bi.join(freq.select("__i"), "__i")
    pruned.select(col("__b"), col("__i").as("item1"))
      .join(pruned.select(col("__b"), col("__i").as("item2")), Seq("__b"))
      .filter(col("item1") < col("item2"))
      .groupBy("item1", "item2").agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }

  /** Markov TRANSITION MATRIX over per-key event sequences: counts of
    * (event, next event) under strict (ts, tiebreak) ordering, with the
    * row-normalized transition probability — the product-analytics
    * "what happens after X" report and the bigram-LM counting shape.
    * The lag window is partitioned per key (group-bounded, never
    * global); the probability is ONE double division of exact counts. */
  def transitionMatrix(df: DataFrame, keyCol: Column, tsCol: Column,
                       eventCol: Column, tieCol: Column): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("__k").orderBy(col("__ts"), col("__tie"))
    val steps = df.select(keyCol.as("__k"), tsCol.as("__ts"),
        eventCol.as("prev_event"), tieCol.as("__tie"))
      .withColumn("next_event", lead(col("prev_event"), 1).over(win))
      .filter(col("next_event").isNotNull)
    val cnt = steps.groupBy("prev_event", "next_event")
      .agg(count(lit(1)).as("cnt"))
    val totals = cnt.groupBy("prev_event").agg(sum("cnt").as("__tot"))
    cnt.join(totals, "prev_event")
      .withColumn("p", col("cnt").cast("double") / col("__tot").cast("double"))
      .select(col("prev_event"), col("next_event"), col("cnt"), col("p"))
  }

  def cmsEstimate(counters: DataFrame, queries: DataFrame, itemCol: Column,
                  depth: Int, width: Int): DataFrame = {
    val r = explode(array((0 until depth).map(lit): _*)).as("r")
    queries.select(itemCol.cast("string").as("item")).distinct()
      .select(col("item"), r)
      .withColumn("b",
        conv(substring(md5(concat_ws(":", col("r"), col("item"))), 1, 8), 16, 10)
          .cast("long") % width)
      .join(broadcast(counters), Seq("r", "b"), "left_outer")
      .groupBy(col("item"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
