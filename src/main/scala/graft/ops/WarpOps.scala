package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.values.Warp

/** The `Dataset` operator algebra of the reference
  * (reference: WarpCore/Sources/Data.swift:216-319) re-expressed as lazy
  * DataFrame transformations. Every operator here builds a declarative
  * Catalyst plan — pushdown, pruning, join selection and partial
  * aggregation come from the optimizer, replacing the reference's
  * CoalescedDataset rewrites (Data.swift:375-755) and its three hand-written
  * engines (Raster/Transformer/SQL).
  */
object WarpOps {

  /** Multi-key sort order: each key an arbitrary expression with an
    * ascending flag and a numeric-vs-string collation flag; empty (null)
    * sorts below everything (Data.swift:81-111, SQL.swift:689-718). */
  final case class Order(expr: Column, ascending: Boolean = true, numeric: Boolean = true)

  /** Decomposable running-aggregate spec for [[WarpDataFrame.rankDistributed]]:
    * each case names an aggregate whose global running value can be
    * reconstituted from a per-range-bucket running value plus a combine
    * over the (tiny) bucket-prefix totals — the property that lets the
    * global running scan run parallel per bucket instead of in one
    * ordered partition. */
  sealed trait RunningAgg { def name: String }
  object RunningAgg {
    /** Running SQL sum of `value` (nulls ignored). */
    final case class RSum(name: String, value: Column) extends RunningAgg
    /** Global 1-based row number (= running count-all). */
    final case class RCount(name: String) extends RunningAgg
    /** Running minimum of `value` (nulls ignored). */
    final case class RMin(name: String, value: Column) extends RunningAgg
    /** Running maximum of `value` (nulls ignored). */
    final case class RMax(name: String, value: Column) extends RunningAgg
    /** Running mean of non-null `value` (SQL avg semantics). */
    final case class RAvg(name: String, value: Column) extends RunningAgg
  }

  implicit class WarpDataFrame(val df: DataFrame) extends AnyVal {

    /** filter: keep rows where expr evaluates to exactly true
      * (Data.swift:248-250). Boolean-typed conditions take the native
      * `filter` path (identical semantics: Spark drops null results) so
      * predicates stay pushable to the parquet scan; only non-boolean
      * expressions pay for the Warp bool-coercion wrapper. */
    def warpFilter(cond: Column): DataFrame = {
      // resolve the condition's type against the existing analyzed plan —
      // a driver-side expression-tree walk, NOT an extra per-call analysis
      // pass on deep filter chains. Conditions the walk cannot type
      // (implicit casts, lambdas) fall back to the one-projection analysis
      // `df.select(cond).schema` — correct, just not walk-cheap.
      val dt = org.apache.spark.sql.GraftColumnAccess
        .resolvedDataType(df, cond)
        .getOrElse(df.select(cond).schema.head.dataType)
      if (dt == org.apache.spark.sql.types.BooleanType) df.filter(cond)
      else df.filter(Warp.filterCond(cond))
    }

    /** calculate: compute N expressions from ONE snapshot of the input row;
      * new columns appended, existing overwritten in place; expressions must
      * NOT see each other's results (Data.swift:221-230). A single `select`
      * guarantees the snapshot — chained withColumn would not.
      */
    def calculate(calcs: Seq[(String, Column)]): DataFrame = {
      val existing = df.columns
      val lowerMap = calcs.map { case (n, c) => (n.toLowerCase, c) }.toMap
      val kept = existing.map { name =>
        lowerMap.get(name.toLowerCase).map(_.as(name)).getOrElse(col(s"`$name`"))
      }
      val existingLower = existing.map(_.toLowerCase).toSet
      val appended = calcs.collect {
        case (n, c) if !existingLower.contains(n.toLowerCase) => c.as(n)
      }
      df.select(kept ++ appended: _*)
    }

    /** selectColumns: project + reorder; names not present are silently
      * ignored; matching is case-insensitive, case-preserving
      * (Data.swift:256-258, Schema.swift:20-48). */
    def selectColumns(cols: Seq[String]): DataFrame = {
      val byLower = df.columns.map(c => c.toLowerCase -> c).toMap
      val present = cols.flatMap(c => byLower.get(c.toLowerCase))
      df.select(present.map(c => col(s"`$c`")): _*)
    }

    /** sort: multi-key; numeric flag decides the collation cast; empty
      * first on ascending, last on descending (mirrors reference NULLS
      * emulation, SQL.swift:689-718). */
    def warpSort(orders: Seq[Order]): DataFrame =
      df.orderBy(sortKeys(orders): _*) // one collation definition: sortKeys

    /** union by column name, case-insensitive, union-of-schemas, missing
      * cells => empty/null (Data.swift:300-304). */
    def warpUnion(other: DataFrame): DataFrame =
      df.unionByName(alignNames(df, other), allowMissingColumns = true)

    /** Rename `other`'s columns to the case-variant used in `df` where they
      * match case-insensitively, so unionByName merges them. */
    private def alignNames(left: DataFrame, right: DataFrame): DataFrame = {
      val byLower = left.columns.map(c => c.toLowerCase -> c).toMap
      right.columns.foldLeft(right) { (d, c) =>
        byLower.get(c.toLowerCase).filter(_ != c)
          .map(target => d.withColumnRenamed(c, target)).getOrElse(d)
      }
    }

    /** join: left-outer or inner over an arbitrary boolean condition; right
      * columns whose names collide with left columns are DROPPED, not
      * suffixed (Data.swift:113-145). Catalyst's ExtractEquiJoinKeys gives
      * the hash-join fast path the reference hand-rolled
      * (Raster.swift:374-477). Broadcast the right side when told it is a
      * small dimension. */
    def warpJoin(right: DataFrame, cond: Column, joinType: String,
                 broadcastRight: Boolean = false): DataFrame = {
      val leftLower = df.columns.map(_.toLowerCase).toSet
      val rightKept = right.columns.filterNot(c => leftLower.contains(c.toLowerCase))
      val r = if (broadcastRight) broadcast(right) else right
      df.join(r, cond, joinType)
        .select(df.columns.map(c => df(s"`$c`")) ++ rightKept.map(c => r(s"`$c`")): _*)
    }

    /** Materialize as a bucketed table: co-locates all rows with equal
      * keys in the same bucket file, so later equi-joins/aggregations on
      * `key` between tables bucketed the same way run WITHOUT a shuffle —
      * the pre-partitioning strategy for repeatedly-joined 100 TB fact
      * tables. (Spark bucketing rides the session catalog, hence a table
      * name rather than a path.) */
    def bucketize(table: String, key: String, buckets: Int): DataFrame = {
      df.write.mode("overwrite")
        .bucketBy(buckets, key).sortBy(key)
        .format("parquet").saveAsTable(table)
      df.sparkSession.table(table)
    }

    /** Skew-safe equi-join: shard the (large, skewed) left side's hot keys
      * across `salt` random shards and replicate the right side into every
      * shard, joining on (key, shard). The classic salting pattern for the
      * hot-key joins AQE's skew splitting can't fully absorb; the right
      * side grows ×salt, so use for moderate `salt` against dimension-ish
      * right sides. */
    def saltedJoin(right: DataFrame, key: String, salt: Int,
                   joinType: String = "inner"): DataFrame = {
      require(salt > 0, "salt must be positive")
      require(Seq("inner", "left", "left_outer", "leftouter").contains(joinType),
        "saltedJoin supports inner and left joins (the right side is " +
          "replicated per shard, so right/full-outer would emit one " +
          "null-extended row per shard for unmatched right keys)")
      val saltedLeft = df.withColumn("__salt", (rand(42) * salt).cast("int"))
      val expandedRight = right.withColumn("__salt",
        explode(array((0 until salt).map(lit): _*)))
      saltedLeft.join(expandedRight, Seq(key, "__salt"), joinType).drop("__salt")
    }

    /** rank: running (cumulative) aggregation — sort by orders, emit reducer
      * state so far per row (Data.swift:306-311). Generalizes
      * rank/row_number/running sum. Each agg builds its windowed column from
      * the running frame. NOTE: like the reference, the running state is
      * global — a single ordered partition. For 100 TB use the partitioned
      * variant [[rankBy]] to keep the window parallel per key.
      */
    def rank(aggs: Seq[(String, org.apache.spark.sql.expressions.WindowSpec => Column)],
             orders: Seq[Order]): DataFrame = {
      val w = Window.orderBy(sortKeys(orders): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.select(df.columns.map(c => col(s"`$c`")) ++
        aggs.map { case (name, f) => f(w).as(name) }: _*)
    }

    /** Distributed global running aggregation — [[rank]] semantics without
      * the single ordered partition, for the decomposable aggregate class
      * (sum / count(row_number) / min / max / avg). The bucketed prefix-sum
      * recipe (`Sampling.withRunningTokens` / the `Classifier` rank-sum
      * shape) lifted onto an ORDERED bucketing:
      *
      *  1. bounded action A: split points from a deterministic xxhash64
      *     sample of the key projection (r11 — one narrow count+sample
      *     scan, plus one refine scan when the input is under ~10^8 rows;
      *     no shuffle). The sampled keys are quantile-split on the driver
      *     and embedded as LITERAL split points, so bucket assignment is
      *     a pure deterministic function of the row's key (no dependence
      *     on exchange reuse or range-sampler seeds). Sample coarseness
      *     affects bucket EVENNESS only — correctness holds for arbitrary
      *     monotone boundaries. Callers with expensive upstream plans
      *     should cache `df`: the recipe scans it up to four times;
      *  2. bounded action B: per-bucket aggregate totals (scan +
      *     map-side combine, `buckets` rows collected), prefix-combined
      *     on the driver into per-bucket OFFSETS;
      *  3. the one shuffled pass: hash-exchange on the bucket id,
      *     per-bucket ordered window (parallel across executors),
      *     then per-row combine `running = offset ⊕ within-bucket running`
      *     via a broadcast join on the tiny offsets frame.
      *
      * Ties never straddle a split point (bucket id = count of boundaries
      * at-or-before the key, so equal keys share a bucket), and decimal /
      * integer partials combine exactly (associative), so results are
      * value-identical to the global-window [[rank]]. Float sums should be
      * routed through a decimal cast by the caller (the repo-wide `dsum`
      * discipline) — double addition is order-sensitive under ANY
      * parallel decomposition. At 100 TB: two narrow extra scans + one
      * hash shuffle with `buckets`-way parallel windows replace the
      * single-executor ordered pass; size `buckets` to the cluster. */
    def rankDistributed(aggs: Seq[RunningAgg], orders: Seq[Order],
                        buckets: Int = 32): DataFrame = {
      import RunningAgg._
      require(buckets >= 1, s"buckets must be >= 1, got $buckets")
      val spark = df.sparkSession
      val keys = sortKeys(orders)
      // normalized plain key exprs: same casts as sortKeys, no direction
      val plain = orders.map(o =>
        if (o.numeric) o.expr.cast("double") else o.expr.cast("string"))

      // ---- bounded action A (r11): split points from a DETERMINISTIC
      // hash-sample of the key projection — narrow key-only scans, no
      // `repartitionByRange` shuffle of the full key set (that shuffle
      // was ~half of q_rank's toy-scale cost in the r10 probe).
      // Correctness holds for ARBITRARY monotone boundaries (bucket id =
      // count of boundaries at-or-before the key), so sample coarseness
      // only affects bucket EVENNESS, never values. Sampling keys on
      // xxhash64 of the key tuple is deterministic in the data —
      // independent of partitioning, RNG seeds, and exchange reuse.
      //
      // Scan 1 piggybacks a 1-per-2^20 coarse sample onto the row count
      // (bounded: ~n/2^20 keys reach the driver — ~100k at 10^11 rows).
      // If the coarse sample is too thin for `buckets` quantiles (any
      // sub-10^8-row input), scan 2 re-samples at rate ~64*buckets/n,
      // collecting ≤ ~64 keys per bucket. Both scans prune to the key
      // columns only.
      val keyStruct = struct(plain.zipWithIndex.map { case (c, i) =>
        c.as(s"k$i") }: _*)
      def hashSample(mod: Long) =
        when(pmod(xxhash64(plain: _*), lit(mod)) === 0L, keyStruct)
      val probe = df.agg(count(lit(1)).as("__rk_n"),
        collect_list(hashSample(1L << 20)).as("__rk_s")).head()
      val n = probe.getLong(0)
      val coarse = probe.getSeq[org.apache.spark.sql.Row](1)
      val targetSamples = 64L * buckets
      val sampled: Seq[org.apache.spark.sql.Row] =
        if (n == 0L) Seq.empty
        else if (coarse.size >= 4 * buckets) coarse
        else {
          val r = math.max(1L, n / targetSamples)
          df.select(hashSample(r).as("__rk_s"))
            .where(col("__rk_s").isNotNull)
            .collect().map(_.getStruct(0)).toSeq
        }
      // driver-side sort under the Order collation (asc = nulls first /
      // NaN last, desc = the exact reverse — matching Spark's window
      // ordering), then buckets-1 evenly spaced split points
      val rowOrd: Ordering[org.apache.spark.sql.Row] =
        (a: org.apache.spark.sql.Row, b: org.apache.spark.sql.Row) => {
          var i = 0; var c = 0
          while (c == 0 && i < orders.size) {
            val (x, y) = (a.get(i), b.get(i))
            val base =
              if (x == null && y == null) 0
              else if (x == null) -1
              else if (y == null) 1
              else (x, y) match {
                case (dx: java.lang.Double, dy: java.lang.Double) =>
                  java.lang.Double.compare(dx, dy) // NaN greatest, like Spark
                case (sx: String, sy: String) => sx.compareTo(sy)
                case _ => 0
              }
            c = if (orders(i).ascending) base else -base
            i += 1
          }
          c
        }
      val sorted = sampled.sorted(rowOrd)
      val bounds: Seq[Seq[Any]] =
        if (sorted.isEmpty) Seq.empty
        else (1 until buckets).map { b =>
          val idx = math.min(((b.toLong * sorted.size) / buckets).toInt,
            sorted.size - 1)
          plain.indices.map(i => sorted(idx).get(i))
        }.distinct

      // "row key strictly-before boundary" under the Order collation
      // (asc = nulls first, desc = nulls last), boundary values embedded
      // as typed literals. NaN keys/boundaries are safe: Spark SQL's
      // <, > and <=> on doubles use the SQL collation (NaN greater than
      // every number, NaN <=> NaN true — NOT Java float semantics), so
      // bucket ids stay monotone with the window ordering even when the
      // sample picks a NaN split point (pinned by the PropertySpec
      // nan-mix law).
      def blit(v: Any, o: Order): Column = {
        val t = if (o.numeric) "double" else "string"
        if (v == null) lit(null).cast(t) else lit(v).cast(t)
      }
      def rowBefore(bound: Seq[Any]): Column =
        orders.indices.reverse.foldLeft(lit(false)) { case (rest, i) =>
          val k = plain(i); val bv = blit(bound(i), orders(i))
          val ltI =
            if (orders(i).ascending) (k.isNull && bv.isNotNull) || (k < bv)
            else (bv.isNull && k.isNotNull) || (k > bv)
          ltI || (k <=> bv && rest)
        }
      // bucket id = number of split points at-or-before this row's key:
      // pure function of the key + literal bounds, identical in every
      // pass that evaluates it
      val bucketCol =
        if (bounds.isEmpty) lit(0)
        else bounds.map(bd => when(rowBefore(bd), 0).otherwise(1)).reduce(_ + _)
      val nBuckets = bounds.size + 1

      // ---- bounded action B: per-bucket totals (map-side combined to at
      // most nBuckets rows), prefix-combined on the driver
      val totalAggs = aggs.zipWithIndex.flatMap { case (a, i) =>
        a match {
          case RSum(_, v)  => Seq(sum(v).as(s"__rk_t$i"))
          case RCount(_)   => Seq(count(lit(1)).as(s"__rk_t$i"))
          case RMin(_, v)  => Seq(min(v).as(s"__rk_t$i"))
          case RMax(_, v)  => Seq(max(v).as(s"__rk_t$i"))
          case RAvg(_, v)  => Seq(sum(v).as(s"__rk_t$i"), count(v).as(s"__rk_tc$i"))
        }
      }
      val totDf = df.withColumn("__rk_b", bucketCol)
        .groupBy("__rk_b").agg(totalAggs.head, totalAggs.tail: _*)
      val totSchema = totDf.schema
      val totByBucket: Map[Int, org.apache.spark.sql.Row] =
        totDf.collect().map(r => r.getInt(0) -> r).toMap

      // driver-side exact combiners over the collected JVM values
      def plusAny(a: Any, c: Any): Any = (a, c) match {
        case (null, x) => x
        case (x, null) => x
        case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.add(y)
        case (x: java.lang.Long, y: java.lang.Long) => java.lang.Long.valueOf(x + y)
        case (x: java.lang.Double, y: java.lang.Double) => java.lang.Double.valueOf(x + y)
        case (x, y) => throw new IllegalArgumentException(
          s"rankDistributed: unsupported sum type ${x.getClass}/${y.getClass}")
      }
      def cmpAny(a: Any, c: Any, takeMin: Boolean): Any = (a, c) match {
        case (null, x) => x
        case (x, null) => x
        case (x: Comparable[_], y) =>
          val d = x.asInstanceOf[Comparable[Any]].compareTo(y)
          if ((d <= 0) == takeMin) x else y
      }

      // offsets row per bucket: strictly-preceding prefix of each total
      val offFields = totSchema.fields.toSeq // (__rk_b, __rk_t0, ...)
      val prefixRows = new Array[org.apache.spark.sql.Row](nBuckets)
      val acc = new Array[Any](offFields.size - 1) // running prefix per total col
      for (bi <- 0 until nBuckets) {
        prefixRows(bi) = org.apache.spark.sql.Row.fromSeq(bi +: acc.toSeq)
        totByBucket.get(bi).foreach { r =>
          var ci = 1
          aggs.zipWithIndex.foreach { case (a, i) =>
            a match {
              case RSum(_, _) | RAvg(_, _) =>
                acc(ci - 1) = plusAny(acc(ci - 1), r.get(ci)); ci += 1
                if (a.isInstanceOf[RAvg]) {
                  acc(ci - 1) = plusAny(acc(ci - 1), r.get(ci)); ci += 1
                }
              case RCount(_) =>
                acc(ci - 1) = plusAny(acc(ci - 1), r.get(ci)); ci += 1
              case RMin(_, _) =>
                acc(ci - 1) = cmpAny(acc(ci - 1), r.get(ci), takeMin = true); ci += 1
              case RMax(_, _) =>
                acc(ci - 1) = cmpAny(acc(ci - 1), r.get(ci), takeMin = false); ci += 1
            }
          }
        }
      }
      val offSchema = org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("__rk_ob",
          org.apache.spark.sql.types.IntegerType, nullable = false) +:
          offFields.tail.map(f => f.copy(name = "__rk_p" + f.name.stripPrefix("__rk_t"))))
      val offsets = spark.createDataFrame(
        java.util.Arrays.asList(prefixRows: _*), offSchema)

      // ---- the one shuffled pass: per-bucket window + broadcast combine
      val wIn = Window.partitionBy(col("__rk_b")).orderBy(keys: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val base = df.withColumn("__rk_b", bucketCol)
      val withIn = aggs.zipWithIndex.foldLeft(base) { case (d, (a, i)) =>
        a match {
          case RSum(_, v)  => d.withColumn(s"__rk_in$i", sum(v).over(wIn))
          case RCount(_)   => d.withColumn(s"__rk_in$i", count(lit(1)).over(wIn))
          case RMin(_, v)  => d.withColumn(s"__rk_in$i", min(v).over(wIn))
          case RMax(_, v)  => d.withColumn(s"__rk_in$i", max(v).over(wIn))
          case RAvg(_, v)  => d.withColumn(s"__rk_in$i", sum(v).over(wIn))
                               .withColumn(s"__rk_inc$i", count(v).over(wIn))
        }
      }
      // null-safe ⊕: SQL aggregates ignore nulls, so a null side means
      // "no values yet on that side" and the other side passes through
      def nadd(l: Column, r: Column): Column =
        when(l.isNull, r).when(r.isNull, l).otherwise(l + r)
      val joined = withIn.join(broadcast(offsets), col("__rk_b") === col("__rk_ob"))
      val outCols = aggs.zipWithIndex.map { case (a, i) =>
        val in = col(s"__rk_in$i"); val p = col(s"__rk_p$i")
        (a match {
          case RSum(_, _)  => nadd(p, in)
          case RCount(_)   => coalesce(p, lit(0L)) + in
          case RMin(_, _)  => when(p.isNull, in).when(in.isNull, p).otherwise(least(p, in))
          case RMax(_, _)  => when(p.isNull, in).when(in.isNull, p).otherwise(greatest(p, in))
          case RAvg(_, _)  =>
            nadd(p, in) / (coalesce(col(s"__rk_pc$i"), lit(0L)) + col(s"__rk_inc$i"))
        }).as(a.name)
      }
      joined.select(df.columns.map(c => col(s"`$c`")) ++ outCols: _*)
    }

    /** Partitioned running aggregation — the scale-path variant of [[rank]]:
      * running state restarts per partition key, so Spark distributes the
      * window across executors instead of one global sort partition. */
    def rankBy(partitionBy: Seq[Column],
               aggs: Seq[(String, org.apache.spark.sql.expressions.WindowSpec => Column)],
               orders: Seq[Order]): DataFrame = {
      val w = Window.partitionBy(partitionBy: _*).orderBy(sortKeys(orders): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.select(df.columns.map(c => col(s"`$c`")) ++
        aggs.map { case (name, f) => f(w).as(name) }: _*)
    }

    /** Rolling event-time aggregation — the time-based sibling of
      * [[rankBy]]: per key, aggregate over the trailing `trailingMicros`
      * of EVENT TIME ending at each row (inclusive range frame on the
      * microsecond epoch), e.g. "events and value sum in the last hour,
      * per user, at every event". Row frames count rows; range frames
      * honor the actual timestamps — gaps and bursts behave correctly.
      *
      * Scale shape: identical to [[rankBy]] — one hash exchange on the
      * key, per-key ordered frame, distributed across executors; never a
      * global window. Microsecond integer ordering keeps the frame
      * arithmetic exact and engine-portable (a seconds cast truncates
      * sub-second timestamps; doubles drift). */
    def rollingByTime(partitionBy: Seq[Column], tsCol: Column, trailingMicros: Long,
                      aggs: Seq[(String, org.apache.spark.sql.expressions.WindowSpec => Column)])
        : DataFrame = {
      require(trailingMicros >= 0, s"trailing window must be >= 0, got $trailingMicros")
      val w = Window.partitionBy(partitionBy: _*).orderBy(unix_micros(tsCol))
        .rangeBetween(-trailingMicros, 0)
      df.select(df.columns.map(c => col(s"`$c`")) ++
        aggs.map { case (name, f) => f(w).as(name) }: _*)
    }

    /** Ordered funnel — per key, the earliest time each step predicate is
      * satisfied STRICTLY AFTER the previous step's time (the standard
      * event-analytics funnel: signup → click → purchase, in order). One
      * output row per key that entered step 1: `key`, a `t_<name>`
      * timestamp per step (null once the funnel is abandoned), and
      * `reached` = completed step count.
      *
      * Scale shape: each step is one filtered map-side-combined aggregate
      * of the events plus one key-keyed join against the (one row per
      * funnel-entrant, strictly shrinking) previous-step table — never a
      * self-join of events with events, never a per-key sort. Step
      * cardinality bounds the chain, not event volume. */
    def funnel(keyCol: Column, tsCol: Column,
               steps: Seq[(String, Column)]): DataFrame = {
      require(steps.nonEmpty, "funnel needs at least one step")
      require(steps.map(_._1).distinct.size == steps.size, "step names must be unique")
      val first = df.filter(steps.head._2)
        .groupBy(keyCol.as("key")).agg(min(tsCol).as(s"t_${steps.head._1}"))
      val chained = steps.sliding(2).collect { case Seq((prev, _), (name, pred)) =>
        (s"t_$prev", name, pred)
      }.foldLeft(first) { case (acc, (prevT, name, pred)) =>
        val nxt = df.join(acc.select(col("key"), col(prevT)), keyCol === col("key"))
          .filter(pred && tsCol > col(prevT))
          .groupBy(col("key")).agg(min(tsCol).as(s"t_$name"))
        acc.join(nxt, Seq("key"), "left")
      }
      chained.withColumn("reached",
        steps.map(s => when(col(s"t_${s._1}").isNotNull, 1).otherwise(0))
          .reduce(_ + _))
    }

    /** Retention cohorts — the third of the event-analytics trio (with
      * [[rollingByTime]] and [[funnel]]): assign each key to the period of
      * its FIRST event (the cohort), then count distinct keys active in
      * each later period, keyed by (cohort, period offset). Periods are
      * absolute epoch-based integer buckets of `periodMicros` (e.g. 7
      * days) — engine-portable integer arithmetic, no calendar-week
      * disagreement between engines.
      *
      * Scale shape: one min-aggregate per key (map-side combined), one
      * key-keyed join back, one (cohort, offset)-keyed distinct count.
      * Output cardinality is periods², independent of event volume. */
    def retentionCohorts(keyCol: Column, tsCol: Column,
                         periodMicros: Long): DataFrame = {
      require(periodMicros > 0, s"period must be positive, got $periodMicros")
      val us = unix_micros(tsCol)
      val period = floor(us / periodMicros).cast("long")
      val firsts = df.groupBy(keyCol.as("__r_key"))
        .agg(min(period).as("cohort"))
      df.select(keyCol.as("__r_k"), period.as("__r_p"))
        .join(firsts, col("__r_k") === col("__r_key"))
        .groupBy(col("cohort"), (col("__r_p") - col("cohort")).as("period_offset"))
        .agg(count_distinct(col("__r_k")).as("n_active"))
    }

    private def sortKeys(orders: Seq[Order]): Seq[Column] =
      orders.map { o =>
        val k = if (o.numeric) o.expr.cast("double") else o.expr.cast("string")
        if (o.ascending) k.asc_nulls_first else k.desc_nulls_last
      }

    /** flatten (melt/unpivot): one output row per cell; optional column
      * carrying the source column name and a row-identifier expression
      * (Data.swift:270-276). Spark-native `unpivot`. */
    def flatten(valueTo: String, columnNameTo: Option[String],
                rowIdentifier: Option[(String, Column)]): DataFrame = {
      val base = rowIdentifier match {
        case Some((name, expr)) => df.select(expr.as(name) +: df.columns.map(c => col(s"`$c`")): _*)
        case None               => df
      }
      val idCols = rowIdentifier.map(_._1).toSeq
      val valueCols = df.columns
      val nameCol = columnNameTo.getOrElse("__column")
      val melted = base.unpivot(
        idCols.map(c => col(s"`$c`")).toArray,
        valueCols.map(c => col(s"`$c`").cast("string")).toArray,
        nameCol, valueTo)
      if (columnNameTo.isEmpty) melted.drop(nameCol) else melted
    }

    /** pivot: spread the label-combinations of the horizontal group
      * expressions into generated columns `hval1_hval2_...`
      * (Data.swift:265, Raster.swift:984-1050). `horizontal` columns are
      * concatenated with `_` exactly like the reference's generated names
      * (Raster.swift:1012-1022).
      *
      * Pass `values` (the expected labels) whenever they are known: the
      * unbounded form runs an EAGER distinct-label job and collects the
      * labels to the driver at plan-build time — a full extra scan at
      * 100 TB, and unbounded label cardinality. The unbounded form stays
      * available for exploration and is label-capped by Spark's
      * `spark.sql.pivotMaxValues` (default 10000), matching the
      * reference's label-bounded pivot (Raster.swift:984-1050). */
    def warpPivot(horizontal: Seq[Column], vertical: Seq[String],
                  valueAgg: Column, values: Seq[String] = Nil): DataFrame = {
      val hkey = concat_ws("_", horizontal.map(_.cast("string")): _*)
      val grouped = df.withColumn("__h", hkey)
        .groupBy(vertical.map(c => col(s"`$c`")): _*)
      val pivoted =
        if (values.nonEmpty) grouped.pivot("__h", values)
        else grouped.pivot("__h")
      pivoted.agg(valueAgg)
    }

    /** explode vertically: one row per element of a split cell
      * (QBEExplodeStep.swift:230). */
    def explodeVertically(column: String, sep: String): DataFrame = {
      val cols = df.columns.map {
        // explode_outer: a null cell must keep its ROW (with a null part),
        // not silently delete it — split(null) is null and plain explode
        // emits zero rows for it
        case c if c.equalsIgnoreCase(column) => explode_outer(split(col(s"`$c`"), sep)).as(c)
        case c => col(s"`$c`")
      }
      df.select(cols.toSeq: _*)
    }

    /** explode horizontally: split a cell into N new columns
      * (QBEExplodeStep.swift:327). */
    def explodeHorizontally(column: String, sep: String, n: Int): DataFrame = {
      val parts = split(col(s"`$column`"), sep)
      val newCols = (0 until n).map(i => parts.getItem(i).as(s"${column}_${i + 1}"))
      df.select(df.columns.map(c => col(s"`$c`")) ++ newCols: _*)
    }

    /** dummies: one-hot encode — a boolean column `src_value` per distinct
      * value (QBEDummiesStep.swift:15-96). Distinct set is collected (small
      * by construction — it becomes the schema); `maxValues` guards against
      * a high-cardinality column exploding the schema: the distinct scan is
      * a one-column partial aggregation, so the guard costs nothing extra. */
    def dummies(column: String, maxValues: Int = 1000): DataFrame = {
      // null is not a dummy column: exclude it BEFORE the cardinality
      // guard, or maxValues distinct values + nulls spuriously fails
      val collected = df.select(col(s"`$column`").cast("string"))
        .filter(col(column).isNotNull).distinct()
        .limit(maxValues + 1).collect()
      require(collected.length <= maxValues,
        s"dummies: column $column has more than $maxValues distinct values")
      val values = collected.map(_.getString(0)).sorted
      val newCols = values.map(v =>
        (col(s"`$column`").cast("string") === v).as(s"${column}_$v"))
      df.select(df.columns.map(c => col(s"`$c`")) ++ newCols: _*)
    }

    /** search: keep rows where any column contains the string,
      * case-insensitive (QBESearchStep.swift:4). */
    def search(needle: String): DataFrame = {
      val cond = df.columns
        .map(c => lower(col(s"`$c`").cast("string")).contains(needle.toLowerCase))
        .reduce(_ || _)
      df.filter(coalesce(cond, lit(false)))
    }

    /** filter-set: per-column allowed-value filter => IN
      * (QBERowsStep.swift:88, Expression.swift:860-899). */
    def filterSet(column: String, values: Seq[Any]): DataFrame =
      df.filter(col(s"`$column`").isin(values: _*))

    /** rollup/cube: multi-level aggregation — a surface EXTENSION beyond
      * the reference (SURVEY §2.3: "no grouping sets anywhere in the
      * reference; Spark gives them free"). Same partial-aggregation
      * machinery as groupBy, so they scale identically. */
    def warpRollup(groups: Seq[Column], aggs: Seq[Column]): DataFrame =
      df.rollup(groups: _*).agg(aggs.head, aggs.tail: _*)
    def warpCube(groups: Seq[Column], aggs: Seq[Column]): DataFrame =
      df.cube(groups: _*).agg(aggs.head, aggs.tail: _*)

    /** transpose: full matrix flip, first column becomes the header
      * (Raster.swift:657-694). Delegates to Spark 4's native
      * `Dataset.transpose()` (same first-column-becomes-header contract);
      * only the name of the generated name-column differs. Like the
      * reference, transpose is inherently bounded by one row's worth of
      * columns — not a 100 TB operator (SQL.swift:1360-1363). */
    def warpTranspose(): DataFrame =
      df.transpose().withColumnRenamed("key", "column")

    /** unique: distinct values of one expression (Data.swift:252-254). */
    def unique(expr: Column, as: String): DataFrame = df.select(expr.as(as)).distinct()

    /** rename columns by mapping, case-insensitive on the source name;
      * unknown names ignored (QBERenameStep.swift:15). */
    def renameColumns(mapping: Map[String, String]): DataFrame = {
      val lower = mapping.map { case (k, v) => k.toLowerCase -> v }
      df.select(df.columns.map { c =>
        lower.get(c.toLowerCase) match {
          case Some(to) => col(s"`$c`").as(to)
          case None     => col(s"`$c`")
        }
      }: _*)
    }

    /** select/remove rows by example: keep (or drop) rows whose values in
      * `keyColumns` match one of the example tuples
      * (QBERowsStep.swift:15-87 — the reference builds an OR-of-ANDs
      * expression; the struct-IN form compiles to the same predicate and
      * stays pushable). */
    def rowsByExample(keyColumns: Seq[String], examples: Seq[Seq[Any]],
                      keep: Boolean = true): DataFrame = {
      // null-safe OR-of-ANDs, like the reference expression: an example
      // cell of empty matches an empty cell (Warp equality: empty == empty
      // is TRUE) — struct isin would make any null cell unmatchable
      val cond = examples.map { e =>
        keyColumns.zip(e).map { case (c, v) => col(s"`$c`") <=> lit(v) }
          .reduce(_ && _)
      }.reduce(_ || _)
      df.filter(if (keep) cond else !cond)
    }

    /** cache step: materialize upstream once, reuse across chains
      * (QBECacheStep.swift:15). Spark-native `persist`. */
    def cacheStep(): DataFrame = {
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df
    }

    /** clone step: reuse another chain's result by name
      * (QBECloneStep.swift:15) — register as a temp view; readers use
      * [[WarpOps.cloneOf]]. */
    def registerClone(name: String): DataFrame = {
      df.createOrReplaceTempView(name)
      df
    }

    /** random(n): uniform sample without replacement
      * (Transformer.swift:357-386 — reservoir sampling). */
    def randomSample(n: Int, seed: Long = 42L): DataFrame =
      df.orderBy(rand(seed)).limit(n)

    /** Column profile — the reference app's per-column descriptives panel
      * (QBEColumnViewController.swift:24-31,82-90: average, sample stdev,
      * min, max, countAll, countDistinct, countEmpty) as a first-class
      * operator: one row per profiled column, the whole profile in ONE
      * aggregate pass over the data (map-side combined; a per-column loop
      * of separate jobs would scan the table N times).
      *
      * avg/stdev coerce through Warp.num (non-numeric values are excluded,
      * the reference's reducer semantics); min/max use native ordering and
      * are emitted as strings so the row shape is column-type-independent.
      *
      * Scale contract: with `exactDistinct = false` (the default) distinct
      * counts are HLL sketches — the single pass stays a single pass at
      * any width. `exactDistinct = true` is the oracle-checkable twin: N
      * distinct aggregates make Catalyst expand the input N-fold before
      * the shuffle (visible as Expand in the plan) — exact answers, one
      * logical pass, N× the map-side rows; choose it for audits, not for
      * 100 TB routine profiling. */
    def profileColumns(cols: Seq[String],
                       exactDistinct: Boolean = false): DataFrame = {
      require(cols.nonEmpty, "profileColumns needs at least one column")
      val A = graft.functions.WarpAggregates
      def tag(kind: String, c: String) = s"__p_${kind}_$c"
      val aggs = cols.flatMap { c =>
        val x = col(s"`$c`")
        Seq(
          A.warpAverage(x).as(tag("avg", c)),
          A.warpStdevSample(x).as(tag("std", c)),
          min(x).cast("string").as(tag("min", c)),
          max(x).cast("string").as(tag("max", c)),
          A.warpCountAll().as(tag("n", c)),
          (if (exactDistinct) A.warpCountDistinct(x)
           else A.warpCountDistinctApprox(x)).as(tag("nd", c)),
          count(when(x.isNull, 1)).as(tag("ne", c)))
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      val entries = array(cols.map { c =>
        struct(lit(c).as("column"),
          col(tag("avg", c)).as("avg"), col(tag("std", c)).as("stdev"),
          col(tag("min", c)).as("min_val"), col(tag("max", c)).as("max_val"),
          col(tag("n", c)).as("n"), col(tag("nd", c)).as("n_distinct"),
          col(tag("ne", c)).as("n_empty"))
      }: _*)
      one.select(inline(entries))
    }

    /** Fixed-width histogram of one (Warp-coerced) numeric expression —
      * the profiler's distribution companion: `nBins` equal bins over
      * `[lo, hi)`, out-of-range and non-coercible values dropped, `hi`
      * itself folded into the last bin (the standard closed-top
      * convention). Output: (bin, bin_lo, bin_hi, n), bins with zero rows
      * omitted (it is an aggregate; densify with a Sequencer range join
      * if a chart needs empties).
      *
      * One map-side-combined aggregate over an integer bin key — at any
      * scale the shuffle carries ≤ nBins rows per partition. Explicit
      * bounds keep it one pass and deterministic; computing min/max
      * in-query would either cost a second pass or an approximation. */
    def histogram(expr: Column, lo: Double, hi: Double, nBins: Int): DataFrame = {
      require(nBins > 0 && nBins <= (1 << 20), s"nBins must be in [1, 2^20], got $nBins")
      require(lo < hi, s"need lo < hi, got [$lo, $hi)")
      val v = Warp.num(expr)
      val width = (hi - lo) / nBins
      val bin = when(v === hi, nBins - 1)
        .otherwise(floor((v - lit(lo)) / width).cast("int"))
      df.select(bin.as("bin"))
        .filter(col("bin").isNotNull && col("bin") >= 0 && col("bin") < nBins)
        .groupBy("bin")
        .agg(count(lit(1)).as("n"))
        .select(col("bin"),
          (lit(lo) + col("bin") * width).as("bin_lo"),
          (lit(lo) + (col("bin") + 1) * width).as("bin_hi"),
          col("n"))
    }
  }

  /** Resolve a chain registered with [[WarpDataFrame.registerClone]]. */
  def cloneOf(spark: org.apache.spark.sql.SparkSession, name: String): DataFrame =
    spark.table(name)

  /** Mergeable per-shard distinct sketches (Apache DataSketches HLL via
    * Spark's `hll_sketch_agg`) — the INCREMENTAL form of
    * [[WarpDataFrame.profileColumns]]'s approximate distinct: build one
    * sketch per shard (per day / per file / per source), persist the
    * binary column, and later count distincts over ANY shard subset by
    * merging sketches — no corpus rescan. The 100 TB pattern: a year of
    * distinct users = merging 365 daily sketches, milliseconds instead of
    * a petabyte scan. Merging is exact over sketches: union-then-estimate
    * equals the single-pass estimate at the same lgK (pinned in
    * WarpOpsSpec). */
  def distinctSketchByShard(df: DataFrame, shardCol: Column, valueCol: Column,
                            lgK: Int = 12): DataFrame =
    df.groupBy(shardCol.as("shard"))
      .agg(hll_sketch_agg(valueCol, lit(lgK)).as("sketch"))

  /** Merge a set of shard sketches into one distinct estimate. */
  def mergeDistinctSketches(sketches: DataFrame,
                            sketchCol: String = "sketch"): DataFrame =
    sketches.agg(
      hll_sketch_estimate(hll_union_agg(col(sketchCol), lit(true)))
        .as("n_distinct_est"))

  /** ENGINE-REPLAYABLE HyperLogLog — the md5 tier of
    * [[distinctSketchByShard]]'s DataSketches path (the same move as
    * Dedup.minhashPairsMd5): value hash = first 60 bits of md5, the top
    * `p` bits pick one of m = 2^p registers, the remaining 52 bits supply
    * `rho` = leading-zero run + 1, registers take the max, and the
    * Flajolet HLL estimator (with the standard linear-counting
    * small-range correction) reads the estimate out. Every step is
    * portable SQL — bucket/width come from hex substrings, rho from
    * `bin()` string length, and the register-sum `Σ 2^−M_j` is computed
    * as the INTEGER sum `Σ 2^(Mmax−M_j)` scaled by `2^−Mmax`, so the
    * reduction is exact and partition-order-invariant (a plain double sum
    * of 2^−M terms rounds order-dependently once registers differ by
    * >53). This is what makes `q_distinct_hll_md5` a hash-exact oracle
    * gate for the HLL register/estimator SHAPE, while the production
    * binary-sketch path stays rows-only.
    *
    * One row out: (m, used_registers, zeros, estimate, n_exact,
    * rel_error). The `n_exact` companion is a real count_distinct — at
    * gauge scale it is the point of the report; skip it at 100 TB and
    * trust the sketch. Scale shape: one map pass, an m-bounded register
    * aggregate, broadcast scalars — no corpus-sized shuffle beyond the
    * bucket groupBy. */
  /** Per-GROUP [[hllMd5Report]] — the realistic sketch shape (distinct
    * values per source/domain/tenant): registers key on (group, bucket),
    * the m-bounded register table aggregates per group, and the same
    * exact-integer register-sum estimator reads one row per group. The
    * per-group exact count rides along at gauge scale. Scale shape: one
    * map pass, a groups×m-bounded register aggregate, group-keyed joins
    * — never a corpus-sized shuffle beyond the register groupBy. */
  def hllMd5ReportByGroup(df: DataFrame, groupCol: Column, valueCol: Column,
                          p: Int = 4): DataFrame = {
    require(p % 4 == 0 && p >= 4 && p <= 12,
      s"p must be a multiple of 4 in [4, 12] (hex-substring buckets), got $p")
    val m = 1 << p
    val hexChars = p / 4
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val h = md5(valueCol.cast("string"))
    val regs = df.filter(valueCol.isNotNull && groupCol.isNotNull)
      .select(groupCol.as("grp"),
        conv(substring(h, 1, hexChars), 16, 10).cast("int").as("__b"),
        conv(substring(h, hexChars + 1, 13), 16, 10).cast("long").as("__w"))
      .withColumn("__rho",
        when(col("__w") === 0L, lit(53))
          .otherwise(lit(53) - length(bin(col("__w")))))
      .groupBy("grp", "__b").agg(max(col("__rho")).as("__M"))
    val stats = regs.groupBy("grp")
      .agg(count(lit(1)).as("__used"), max(col("__M")).as("__mx"))
    val one = regs.join(stats, "grp")
      .groupBy("grp")
      .agg(first(col("__used")).as("__used"), first(col("__mx")).as("__mx"),
        sum(pow(lit(2.0), col("__mx") - col("__M")).cast("long")).as("__S"))
    val exact = df.filter(valueCol.isNotNull && groupCol.isNotNull)
      .groupBy(groupCol.as("grp"))
      .agg(count_distinct(valueCol).as("__exact"))
    val zeros = lit(m) - col("__used")
    val denom = col("__S").cast("double") +
      zeros.cast("double") * pow(lit(2.0), col("__mx"))
    val eRaw = lit(alpha * m.toDouble * m) * pow(lit(2.0), col("__mx")) / denom
    val est = when(eRaw <= lit(2.5 * m) && zeros > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / zeros)).otherwise(eRaw)
    one.join(exact, "grp")
      .select(col("grp"), lit(m).as("m"), col("__used").as("used_registers"),
        zeros.cast("long").as("zeros"),
        round(est, 6).as("estimate"), col("__exact").as("n_exact"),
        when(col("__exact") > 0,
          round(abs(est - col("__exact")) / col("__exact"), 6))
          .as("rel_error"))
  }

  def hllMd5Report(df: DataFrame, valueCol: Column, p: Int = 4): DataFrame = {
    require(p % 4 == 0 && p >= 4 && p <= 12,
      s"p must be a multiple of 4 in [4, 12] (hex-substring buckets), got $p")
    val m = 1 << p
    val hexChars = p / 4
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val h = md5(valueCol.cast("string"))
    val regs = df.filter(valueCol.isNotNull)
      .select(conv(substring(h, 1, hexChars), 16, 10).cast("int").as("__b"),
        conv(substring(h, hexChars + 1, 13), 16, 10).cast("long").as("__w"))
      .withColumn("__rho",
        when(col("__w") === 0L, lit(53))
          .otherwise(lit(53) - length(bin(col("__w")))))
      .groupBy("__b").agg(max(col("__rho")).as("__M"))
    val stats = regs.agg(count(lit(1)).as("__used"),
      coalesce(max(col("__M")), lit(0)).as("__mx"))
    // a global aggregate emits its one row even over an EMPTY register
    // table (empty input) — the coalesces turn its nulls into the
    // all-registers-zero state, which the estimator maps to 0
    val one = regs.crossJoin(broadcast(stats))
      .agg(coalesce(first(col("__used")), lit(0L)).as("__used"),
        coalesce(first(col("__mx")), lit(0)).as("__mx"),
        coalesce(sum(pow(lit(2.0), col("__mx") - col("__M")).cast("long")),
          lit(0L)).as("__S"))
    val exact = df.filter(valueCol.isNotNull)
      .agg(count_distinct(valueCol).as("__exact"))
    val zeros = lit(m) - col("__used")
    val denom = col("__S").cast("double") +
      zeros.cast("double") * pow(lit(2.0), col("__mx"))
    val eRaw = lit(alpha * m.toDouble * m) * pow(lit(2.0), col("__mx")) / denom
    val est = when(eRaw <= lit(2.5 * m) && zeros > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / zeros)).otherwise(eRaw)
    one.crossJoin(broadcast(exact))
      .select(lit(m).as("m"), col("__used").as("used_registers"),
        zeros.cast("long").as("zeros"),
        round(est, 6).as("estimate"), col("__exact").as("n_exact"),
        when(col("__exact") > 0,
          round(abs(est - col("__exact")) / col("__exact"), 6))
          .as("rel_error"))
  }

  /** HLL SET ALGEBRA between groups — the sketch property that makes the
    * register representation worth keeping: per-bucket `max` of two
    * groups' registers IS the sketch of their union (no rescan), and
    * inclusion–exclusion `est(a) + est(b) − est(a∪b)` estimates the
    * intersection — the cross-source duplication probe at sketch cost.
    * Same md5-derived registers and exact-integer register-sum estimator
    * as [[hllMd5ReportByGroup]], so every pair's merged estimate replays
    * in external SQL; exact union/intersection companions ride along when
    * `exact = true` (the gauge default). At 100 TB pass `exact = false`:
    * the companions cost a full distinct over (group, value) plus a
    * pair-fanned recount, and the sketch is the whole point — sketch-only
    * mode emits null `n_union`/`n_inter` and never runs the distinct
    * frame or the per-pair recount.
    *
    * Scale shape: registers aggregate once per (group, bucket) — the only
    * data-sized pass; pair merges are equi-joins on an exploded
    * (pair, member) table over the groups×m-bounded register frame, never
    * a rescan of the corpus. Pair count grows |groups|² — this operator
    * is for group cardinalities you'd eyeball as a matrix (sources,
    * languages, shards), not for high-cardinality keys. The intersection
    * estimate can go negative on near-disjoint sets (standard
    * inclusion–exclusion behavior; clamp downstream if a lower bound of 0
    * is wanted). */
  def hllMd5SetAlgebra(df: DataFrame, groupCol: Column, valueCol: Column,
                       p: Int = 4, exact: Boolean = true): DataFrame = {
    require(p % 4 == 0 && p >= 4 && p <= 12,
      s"p must be a multiple of 4 in [4, 12] (hex-substring buckets), got $p")
    val m = 1 << p
    val hexChars = p / 4
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val h = md5(valueCol.cast("string"))
    val base = df.filter(valueCol.isNotNull && groupCol.isNotNull)
      .select(groupCol.as("grp"), valueCol.cast("string").as("__v"),
        conv(substring(h, 1, hexChars), 16, 10).cast("int").as("__b"),
        conv(substring(h, hexChars + 1, 13), 16, 10).cast("long").as("__w"))
    val regs = base
      .withColumn("__rho",
        when(col("__w") === 0L, lit(53))
          .otherwise(lit(53) - length(bin(col("__w")))))
      .groupBy("grp", "__b").agg(max(col("__rho")).as("__M"))
    // per-group estimates through the identical published read-out
    val per = hllMd5ReportByGroup(df, groupCol, valueCol, p)
      .select(col("grp"), col("estimate"), col("n_exact"))
    val pairs = per.select(col("grp").as("grp_a"))
      .crossJoin(per.select(col("grp").as("grp_b")))
      .filter(col("grp_a") < col("grp_b"))
    val members = pairs.select(col("grp_a"), col("grp_b"),
      explode(array(col("grp_a"), col("grp_b"))).as("grp"))
    // union sketch: per-bucket max over both members' registers
    val uRegs = members.join(regs, "grp")
      .groupBy("grp_a", "grp_b", "__b").agg(max(col("__M")).as("__M"))
    val uStats = uRegs.groupBy("grp_a", "grp_b")
      .agg(count(lit(1)).as("__used"), max(col("__M")).as("__mx"))
    val uOne = uRegs.join(uStats, Seq("grp_a", "grp_b"))
      .groupBy("grp_a", "grp_b")
      .agg(first(col("__used")).as("__used"), first(col("__mx")).as("__mx"),
        sum(pow(lit(2.0), col("__mx") - col("__M")).cast("long")).as("__S"))
    val zeros = lit(m) - col("__used")
    val denom = col("__S").cast("double") +
      zeros.cast("double") * pow(lit(2.0), col("__mx"))
    val eRaw = lit(alpha * m.toDouble * m) * pow(lit(2.0), col("__mx")) / denom
    val estU = when(eRaw <= lit(2.5 * m) && zeros > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / zeros)).otherwise(eRaw)
    // exact companions over the distinct (group, value) frame — gauge
    // mode only; sketch-only mode (exact = false) never rescans values
    val uExact =
      if (exact) {
        val dv = base.select(col("grp"), col("__v")).distinct()
        members.join(dv, "grp")
          .groupBy("grp_a", "grp_b")
          .agg(count_distinct(col("__v")).as("n_union"))
      } else pairs.select(col("grp_a"), col("grp_b"),
        lit(null).cast("long").as("n_union"))
    pairs
      .join(per.select(col("grp").as("grp_a"), col("estimate").as("est_a"),
        col("n_exact").as("__na")), "grp_a")
      .join(per.select(col("grp").as("grp_b"), col("estimate").as("est_b"),
        col("n_exact").as("__nb")), "grp_b")
      .join(uOne, Seq("grp_a", "grp_b"))
      .join(uExact, Seq("grp_a", "grp_b"))
      .select(col("grp_a"), col("grp_b"), col("est_a"), col("est_b"),
        round(estU, 6).as("est_union"),
        // inclusion–exclusion over the PUBLISHED 6-rounded estimates, so
        // the arithmetic replays on the external side bit-for-bit
        round(col("est_a") + col("est_b") - round(estU, 6), 6).as("est_inter"),
        col("n_union"),
        (col("__na") + col("__nb") - col("n_union")).as("n_inter"))
  }
}
