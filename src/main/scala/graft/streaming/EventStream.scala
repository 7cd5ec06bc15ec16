package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface for the engine.
  *
  * The reference's `Stream` protocol (WarpCore/Sources/Stream.swift) is a
  * pull-based batching abstraction — an execution detail that Catalyst
  * replaces wholesale. What a Spark-native engine owes its users instead
  * is the real streaming path: the same operators, incrementally over
  * unbounded input. This module gives the events table's query shapes
  * their streaming equivalents:
  *
  *  - [[readEvents]]: file-source stream over a parquet directory (each
  *    new file = a micro-batch; the 100 TB pattern is the same code over
  *    a Kafka source — swap `format`);
  *  - [[windowedCounts]]: watermarked tumbling-window aggregation —
  *    incremental partial aggregation, late data bounded by the watermark;
  *  - [[sessionize]]: custom state via mapGroupsWithState — per-user
  *    session assembly with an inactivity gap, the canonical
  *    KeyValueGroupedDataset state machine.
  */
object EventStream {

  final case class Event(user_id: Long, event_type: String, ts: java.sql.Timestamp, value: Double)
  final case class Session(user_id: Long, started: java.sql.Timestamp,
                           ended: java.sql.Timestamp, events: Long, total: Double)
  final case class SessionState(started: Long, ended: Long, events: Long, total: Double)

  /** Stream a directory of parquet event files (schema must be provided —
    * streaming sources cannot infer). */
  def readEvents(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Watermarked tumbling-window count/sum per event type. The watermark
    * bounds state: windows older than `lateness` close and emit finals
    * (append mode) — the incremental form of q_events_window. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
                     lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))

  /** Streaming exact dedup — the incremental form of
    * [[graft.pipeline.Dedup.exact]]: drop rows repeating the key columns
    * within the watermark horizon. State is bounded by the watermark
    * (expired keys age out), so this runs indefinitely over an unbounded
    * stream — the standard ingest-dedup stage of a training-data
    * pipeline. */
  def dedupStream(events: DataFrame, keyCols: Seq[String], tsCol: String,
                  lateness: String = "10 minutes"): DataFrame = {
    require(keyCols.nonEmpty, "dedupStream needs at least one key column")
    events
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
  }

  /** Streaming corpus intake: score quality, identify language, count
    * tokens, fingerprint, then watermark-dedup on the fingerprint — the
    * standard ingest stage of a training-data pipeline, incremental. The
    * batch pipeline columns ([[graft.pipeline.TextAnalysis]]) compose with
    * `readStream` UNCHANGED because they are pure map expressions; the
    * only stateful stage is the dedup, whose state the watermark bounds. */
  def ingestDocumentsStream(docs: DataFrame, textCol: String, tsCol: String,
                            lateness: String = "10 minutes",
                            modelWeights: Seq[Double] = Nil): DataFrame = {
    val ta = graft.pipeline.TextAnalysis
    val heur = docs
      .withColumn("quality", ta.qualityScore(col(textCol)))
      .withColumn("lang_id", ta.langId(col(textCol)))
      .withColumn("n_tokens", ta.tokenCountWs(col(textCol)))
      .withColumn("fp", ta.fingerprint64(col(textCol)))
    // trained-model scoring is a literal-weight map expression
    // (graft.pipeline.Classifier), so ONLINE inference composes with
    // readStream unchanged — train batch-side, ship the 7 weights, score
    // every arriving document with zero extra state
    val scored =
      if (modelWeights.isEmpty) heur
      else graft.pipeline.Classifier.scored(heur, textCol, modelWeights,
        outCol = "model_score")
    dedupStream(scored, Seq("fp"), tsCol, lateness)
  }

  /** Streaming dedup against a HISTORICAL corpus: drop stream documents
    * whose normalized-content fingerprint already exists in a static
    * fingerprint table (the batch corpus indexed once with
    * [[graft.pipeline.TextAnalysis.fingerprint64]]), THEN watermark-dedup
    * within the stream itself. Stream-static joins are stateless on the
    * static side — Spark re-broadcasts/joins per micro-batch without
    * accumulating state — so corpus size does not grow streaming state;
    * only the within-stream dedup holds (watermark-bounded) keys. This
    * is the ingest-time form of [[graft.pipeline.Dedup.exact]]: new data
    * never re-introduces content the corpus already has.
    *
    * With `bloomExpectedItems > 0` a Bloom filter over the corpus
    * fingerprints (built ONCE at query start — the static side never
    * changes within a query) gates each micro-batch map-side
    * ([[graft.pipeline.Dedup.bloomMightContain]]): documents the filter
    * rules out skip the anti-join entirely, so the per-batch join carries
    * only the ~(dup-rate + fpp) fraction of the stream — the difference
    * between re-joining every batch against a billion-key table and
    * probing a broadcast bitset. False positives die in the anti-join;
    * the result is identical either way. */
  def dedupAgainstCorpus(docs: DataFrame, corpusFps: DataFrame,
                         textCol: String, tsCol: String,
                         lateness: String = "10 minutes",
                         bloomExpectedItems: Long = 0,
                         bloomFpp: Double = 0.01): DataFrame = {
    val fps = corpusFps.select(col("fp"))
    val tagged = docs.withColumn("fp",
      graft.pipeline.TextAnalysis.fingerprint64(col(textCol)))
    val newOnly =
      if (bloomExpectedItems > 0) {
        val might = graft.pipeline.Dedup.bloomMightContain(
          fps, "fp", bloomExpectedItems, bloomFpp)
        val gate = might(xxhash64(col("fp")))
        tagged.filter(!gate)
          .unionByName(tagged.filter(gate).join(fps, Seq("fp"), "left_anti"))
      } else tagged.join(fps, Seq("fp"), "left_anti")
    dedupStream(newOnly, Seq("fp"), tsCol, lateness)
  }

  /** Streaming NEAR-dup intake screen — the incremental/online form of
    * [[graft.pipeline.Dedup.incrementalNearDup]]: each arriving document
    * is minhash-banded with the same one-pass kernels, its band keys
    * probe the STATIC persisted banded index
    * ([[graft.pipeline.Dedup.minhashLedger]] — a warehouse table bucketed
    * on (band, hash)), and surviving candidates verify EXACT Jaccard over
    * the stored shingle-hash sets, row-locally. Emits one
    * (stream doc, hist_id, jaccard) row per matching pair at/above the
    * threshold.
    *
    * Streaming shape: the band probe is a stream-static inner join
    * (stateless — the static side re-joins per micro-batch, no
    * accumulated state) against a (band, hash, hist_id) index that
    * carries NO shingle payloads (the bands-fold would otherwise
    * duplicate every history document's largest column ×bands through
    * the join). Candidate pairs dedup in the one stateful stage (a pair
    * sharing k bands matches k times; `dropDuplicatesWithinWatermark`
    * collapses them BEFORE any verify work), then a second stateless
    * stream-static join attaches the survivors' stored shingle sets and
    * the Jaccard verify is a pure projection. Degenerate history buckets
    * are capped at `maxBucket` like the batch twin, so one pathological
    * band key cannot amplify a micro-batch. */
  def nearDupScreenStream(docs: DataFrame, ledger: DataFrame,
                          textCol: String, idCol: String, tsCol: String,
                          shingleSize: Int = 5, numHashes: Int = 128,
                          bands: Int = 16, jaccardThreshold: Double = 0.8,
                          maxBucket: Int = 1000,
                          lateness: String = "10 minutes"): DataFrame = {
    val hist = ledger
      .select(col("id").as("hist_id"),
        posexplode(col("bhs")).as(Seq("__band", "__bh")))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("__band", "__bh").orderBy("hist_id")))
      .filter(col("__rn") <= maxBucket)
      .drop("__rn")
    // same kernels as Dedup.minhashLedger, inlined as a pure projection so
    // the event-time column rides along (a join back to the source would
    // be a stream-stream self-join)
    val banded = {
      import org.apache.spark.sql.GraftColumnAccess.{column => C, expression => E}
      import graft.functions.{ShingleHashExpr, MinHashSigExpr, BandHashExpr}
      docs.select(col(idCol), col(tsCol),
          C(ShingleHashExpr(E(col(textCol)), shingleSize)).as("__sh1"))
        .select(col(idCol), col(tsCol), col("__sh1"),
          C(BandHashExpr(E(C(MinHashSigExpr(E(col("__sh1")), numHashes))),
            bands)).as("__bhs"))
    }
    val pairs = banded
      .select(col(idCol), col(tsCol), col("__sh1"),
        posexplode(col("__bhs")).as(Seq("__band", "__bh")))
      .join(hist, Seq("__band", "__bh"))
      .select(col(idCol), col(tsCol), col("__sh1"), col("hist_id"))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(idCol, "hist_id")
    val inter = size(array_intersect(col("__sh1"), col("__sh2"))).cast("double")
    val uni = (size(col("__sh1")) + size(col("__sh2"))).cast("double") - inter
    pairs
      .join(ledger.select(col("id").as("hist_id"), col("shh").as("__sh2")),
        Seq("hist_id"))
      .withColumn("jaccard",
        when(uni === 0.0, 1.0).otherwise(inter / uni))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col(idCol), col("hist_id"), col("jaccard"), col(tsCol))
  }

  /** ENGINE-REPLAYABLE streaming intake screen — the md5 tier of
    * [[nearDupScreenStream]] probing a [[graft.pipeline.Dedup
    * .minhashLedgerMd5]] ledger: band keys and shingle sets are plain
    * built-in transforms (md5 min-hashes over raw shingle strings), so
    * the stream's admitted-pair output is exactly replayable by an
    * external SQL engine — the streaming surface's driver-level
    * correctness gate (`q_stream_neardup`). Same shape as the kernel
    * tier: static-side bucket cap, stream-static band join, watermarked
    * in-stream pair dedup, exact Jaccard verify, threshold filter.
    * Output: (idCol, hist_id, jaccard rounded to 9). */
  def nearDupScreenStreamMd5(docs: DataFrame, ledger: DataFrame,
                             textCol: String, idCol: String, tsCol: String,
                             shingleSize: Int = 3, numHashes: Int = 16,
                             bands: Int = 4, jaccardThreshold: Double = 0.5,
                             maxBucket: Int = 1000,
                             lateness: String = "10 minutes"): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val hist = ledger
      .select(col("id").as("hist_id"),
        posexplode(col("bhs")).as(Seq("__band", "__bh")))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("__band", "__bh").orderBy("hist_id")))
      .filter(col("__rn") <= maxBucket)
      .drop("__rn")
    val sigCols = (0 until numHashes).map { i =>
      array_min(transform(col("__sh1"), s =>
        conv(substring(md5(concat(lit(s"$i:"), s)), 1, 15), 16, 10)
          .cast("long"))).as(s"__sig$i")
    }
    val banded = docs
      .select(col(idCol), col(tsCol),
        array_distinct(graft.pipeline.Dedup.shingles(col(textCol), shingleSize))
          .as("__sh1"))
      .filter(size(col("__sh1")) > 0)
      .select(col(idCol) +: col(tsCol) +: col("__sh1") +: sigCols: _*)
      .select(col(idCol), col(tsCol), col("__sh1"),
        array((0 until bands).map { b =>
          concat_ws(",", (0 until r).map(j => col(s"__sig${b * r + j}")): _*)
        }: _*).as("__bhs"))
    val pairs = banded
      .select(col(idCol), col(tsCol), col("__sh1"),
        posexplode(col("__bhs")).as(Seq("__band", "__bh")))
      .join(hist, Seq("__band", "__bh"))
      .select(col(idCol), col(tsCol), col("__sh1"), col("hist_id"))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(idCol, "hist_id")
    val inter = size(array_intersect(col("__sh1"), col("__sh2"))).cast("double")
    val uni = (size(col("__sh1")) + size(col("__sh2"))).cast("double") - inter
    pairs
      .join(ledger.select(col("id").as("hist_id"), col("shh").as("__sh2")),
        Seq("hist_id"))
      .withColumn("jaccard",
        when(uni === 0.0, 1.0).otherwise(inter / uni))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col(idCol), col("hist_id"),
        round(col("jaccard"), 9).as("jaccard"), col(tsCol))
  }

  /** Streaming CONTAMINATION flagging: annotate a document stream with
    * `overlap` = the count of distinct word n-grams it shares with a
    * STATIC probe set (an eval benchmark) — the decontamination gate
    * applied at ingest time instead of in a batch sweep. The probe
    * grams are hash-reduced once ([[graft.pipeline.Dedup.contamination]]'s
    * kernel recipe), collected to a sorted long array — bounded by
    * contract: eval benchmarks are small; for probe sets beyond driver
    * memory use the batch `contamination` sweep — and BROADCAST as a
    * binary-search lookup. The stream side is then a PURE PROJECTION
    * (one kernel pass + k·log m lookups per document): stateless, no
    * watermark, no shuffle, state never grows. Gate downstream with
    * `filter(col("overlap") < threshold)`. */
  def contaminationFlagStream(docs: DataFrame, probes: DataFrame,
                              textCol: String, n: Int = 13): DataFrame = {
    import org.apache.spark.sql.GraftColumnAccess.{column => C, expression => E}
    import org.apache.spark.sql.expressions.UserDefinedFunction
    val spark = probes.sparkSession
    import spark.implicits._
    val probeGrams: Array[Long] = probes
      .select(explode(C(graft.functions.ShingleHashExpr(E(col(textCol)), n))).as("g"))
      .distinct().as[Long].collect().sorted
    val bc = spark.sparkContext.broadcast(probeGrams)
    val overlapOf: UserDefinedFunction = udf { hs: Seq[Long] =>
      if (hs == null) 0L
      else {
        var c = 0L
        val it = hs.iterator
        while (it.hasNext)
          if (java.util.Arrays.binarySearch(bc.value, it.next()) >= 0) c += 1
        c
      }
    }
    docs.withColumn("overlap",
      overlapOf(C(graft.functions.ShingleHashExpr(E(col(textCol)), n))))
  }

  /** Streaming embedding-space contamination screen — the intake twin of
    * [[graft.pipeline.Similarity.semanticContamination]]: each incoming
    * row's embedding is scored against the broadcast eval-probe matrix
    * and the best cosine, matching probe id, and a `contaminated` flag
    * ride along as columns. Stateless (no watermark, no state store):
    * probe sets are eval benchmarks, small by construction, collected
    * once at plan time and broadcast. Ties keep the lowest probe id
    * (probes are scanned in id order), matching the batch screen's
    * deterministic ordering. */
  def semanticScreenStream(docs: DataFrame, probes: DataFrame,
                           vecCol: String, probeIdCol: String,
                           tau: Double): DataFrame = {
    val spark = probes.sparkSession
    // probe AND row vectors are widened via a declarative array<double>
    // cast (exact for floats), so float and double embedding columns both
    // work — matching the batch twin's per-element widening instead of
    // assuming Float arrays and throwing ClassCastException on doubles
    val pr: Array[(Long, Array[Double], Double)] = probes
      .select(col(probeIdCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
      .map { r =>
        val v = r.getSeq[Double](1).toArray
        var n2 = 0.0; var i = 0
        while (i < v.length) { n2 += v(i) * v(i); i += 1 }
        (r.getLong(0), v, math.sqrt(n2))
      }.sortBy(_._1)
    val bc = spark.sparkContext.broadcast(pr)
    val best = udf { emb: Seq[Double] =>
      if (emb == null) (Double.NegativeInfinity, -1L)
      else {
        val v = emb.toArray
        var n2 = 0.0; var i = 0
        while (i < v.length) { n2 += v(i) * v(i); i += 1 }
        val nv = math.sqrt(n2)
        var bestCos = Double.NegativeInfinity; var bestId = -1L
        for ((pid, pv, pn) <- bc.value if pv.length == v.length) {
          var acc = 0.0; var d = 0
          while (d < v.length) { acc += v(d) * pv(d); d += 1 }
          val cos = acc / (nv * pn)
          if (cos > bestCos) { bestCos = cos; bestId = pid }
        }
        (bestCos, bestId)
      }
    }
    docs.withColumn("__best", best(col(vecCol).cast("array<double>")))
      .withColumn("probe_cosine", col("__best._1"))
      .withColumn("probe_id", when(col("__best._2") >= 0, col("__best._2")))
      .withColumn("contaminated", col("probe_cosine") >= tau)
      .drop("__best")
  }

  /** Watermarked stream-stream INTERVAL join (events ⋈ marks): each event
    * joins the marks of the same key whose timestamp lies within
    * [event.ts - tolerance, event.ts]. Both inputs carry watermarks and
    * the time-range predicate is part of the join condition — that pair is
    * what lets Spark EXPIRE join state on both sides (a mark older than
    * every possible future event ages out), the requirement for an
    * unbounded stream-stream join to run indefinitely. The batch
    * equivalent is [[graft.ops.RangeJoin]] with the same predicate
    * (equivalence pinned in StreamingSpec); the as-of "latest mark only"
    * refinement is a downstream max-by aggregation per event.
    *
    * `events` needs columns (key, ts, ...); `marks` needs (key, mts, ...).
    * Mark columns other than the key are carried through. */
  def intervalJoinMarks(events: DataFrame, marks: DataFrame, keyCol: String,
                        tolerance: String,
                        lateness: String = "10 minutes"): DataFrame = {
    val collisions = (marks.columns.toSet - keyCol) intersect events.columns.toSet
    require(collisions.isEmpty,
      s"rename mark columns colliding with event columns: ${collisions.mkString(", ")}")
    val e = events.withWatermark("ts", lateness).alias("e")
    val m = marks.withWatermark("mts", lateness).alias("m")
    val cond =
      col(s"e.`$keyCol`") === col(s"m.`$keyCol`") &&
        col("m.mts") >= col("e.ts") - expr(s"INTERVAL $tolerance") &&
        col("m.mts") <= col("e.ts")
    val markCols = marks.columns.filter(_ != keyCol)
      .map(c => col(s"m.`$c`")).toSeq
    e.join(m, cond, "inner")
      .select(events.columns.map(c => col(s"e.`$c`")).toSeq ++ markCols: _*)
  }

  /** Per-user sessionization that EMITS each session exactly once, when it
    * CLOSES — the production form of [[sessionize]] (which re-emits the
    * running session every micro-batch). flatMapGroupsWithState in append
    * mode: a session is output when a later event arrives past the gap, or
    * when the key times out idle. State per key is one small struct and
    * expires via the processing-time timeout, so the store is bounded by
    * the ACTIVE user population over an unbounded stream. */
  def sessionizeClosed(events: Dataset[Event], gapMs: Long,
                       expireIdleState: Boolean = false): Dataset[Session] = {
    import events.sparkSession.implicits._
    // Same trade-off as [[sessionize]]: the idle-timeout (which closes a
    // session when its user goes quiet and bounds the state store) is
    // opt-in because pending wake-up timers keep synchronous drains
    // (processAllAvailable, the test idiom) from returning. Production
    // streams with real triggers set expireIdleState = true.
    val timeoutConf =
      if (expireIdleState) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (user: Long, batch: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(Session(user, new java.sql.Timestamp(st.started),
              new java.sql.Timestamp(st.ended), st.events, st.total))
          } else {
            val closed = scala.collection.mutable.ListBuffer[Session]()
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var st = state.getOption.getOrElse(
              SessionState(Long.MaxValue, Long.MinValue, 0L, 0.0))
            sorted.foreach { e =>
              val t = e.ts.getTime
              if (st.events > 0 && t - st.ended > gapMs) {
                closed += Session(user, new java.sql.Timestamp(st.started),
                  new java.sql.Timestamp(st.ended), st.events, st.total)
                st = SessionState(t, t, 1L, e.value)
              } else {
                st = SessionState(math.min(st.started, t), math.max(st.ended, t),
                  st.events + 1, st.total + e.value)
              }
            }
            state.update(st)
            if (expireIdleState) state.setTimeoutDuration(gapMs)
            closed.iterator
          }
        })
  }

  final case class Admission(id: Long, key: String, admit_seq: Long)

  final case class WindowTopK(window_start: java.sql.Timestamp, item: String,
                              cnt: Long, rk: Int)

  final case class WindowBin(window_start: java.sql.Timestamp, bin: Int,
                             cnt: Long, share: Double)

  /** Streaming per-window HISTOGRAM of the value column — the online form
    * of the batch drift report's per-side binning: each tumbling window
    * emits its complete equi-width histogram (fixed [lo, hi) edges, out-
    * of-range values clamped to the edge bins) exactly once, when the
    * watermark closes it. Downstream drift monitoring is then a stateless
    * comparison of the emitted shares against a broadcast reference.
    * Same window-keyed state + event-time-timeout machinery as
    * [[trendingClosed]]; state is one count array of nBins longs per open
    * window. */
  def histogramClosed(events: Dataset[Event], windowMs: Long,
                      lo: Double, hi: Double, nBins: Int,
                      watermarkDelay: String = "10 seconds"): Dataset[WindowBin] = {
    import events.sparkSession.implicits._
    require(windowMs > 0 && nBins >= 2 && hi > lo,
      s"need windowMs>0, nBins>=2, hi>lo; got $windowMs, $nBins, [$lo,$hi)")
    def bin(v: Double): Int =
      math.min(nBins - 1, math.max(0, math.floor((v - lo) / (hi - lo) * nBins).toInt))
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(e => Math.floorDiv(e.ts.getTime, windowMs))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (win: Long, batch: Iterator[Event], state: GroupState[Array[Long]]) => {
          if (state.hasTimedOut) {
            val counts = state.get
            state.remove()
            val total = counts.sum.toDouble
            counts.iterator.zipWithIndex.map { case (c, b) =>
              WindowBin(new java.sql.Timestamp(win * windowMs), b, c,
                if (total == 0) 0.0 else c / total)
            }
          } else {
            val counts = state.getOption.getOrElse(new Array[Long](nBins))
            batch.foreach(e => counts(bin(e.value)) += 1L)
            state.update(counts)
            state.setTimeoutTimestamp(win * windowMs + windowMs)
            Iterator.empty
          }
        })
  }

  final case class WindowCentroid(window_start: java.sql.Timestamp, n: Long,
                                  centroid: Seq[Double])

  /** Streaming per-window EMBEDDING CENTROID — the online twin of
    * [[graft.pipeline.Cluster.embeddingDrift]]: each tumbling window
    * emits its mean vector exactly once on watermark close; downstream
    * drift monitoring is a stateless cosine against a broadcast reference
    * centroid. State per open window is one dim-length double sum array
    * plus a count — independent of event volume. Same window-keyed
    * state + event-time-timeout machinery as [[histogramClosed]].
    * Vectors shorter than `dim` contribute their prefix; longer ones are
    * truncated (corpus garbage must not grow state). */
  def centroidClosed(rows: Dataset[(java.sql.Timestamp, Seq[Float])],
                     windowMs: Long, dim: Int,
                     watermarkDelay: String = "10 seconds"): Dataset[WindowCentroid] = {
    import rows.sparkSession.implicits._
    require(windowMs > 0 && dim > 0, s"need windowMs>0, dim>0; got $windowMs, $dim")
    rows.toDF("ts", "vec").as[(java.sql.Timestamp, Seq[Float])]
      .withWatermark("ts", watermarkDelay)
      .groupByKey(r => Math.floorDiv(r._1.getTime, windowMs))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (win: Long, batch: Iterator[(java.sql.Timestamp, Seq[Float])],
         state: GroupState[(Array[Double], Long)]) => {
          if (state.hasTimedOut) {
            val (sums, n) = state.get
            state.remove()
            val c = if (n == 0) sums.toSeq else sums.map(_ / n.toDouble).toSeq
            Iterator.single(WindowCentroid(
              new java.sql.Timestamp(win * windowMs), n, c))
          } else {
            val (sums, n0) = state.getOption.getOrElse((new Array[Double](dim), 0L))
            var n = n0
            batch.foreach { case (_, v) =>
              if (v != null) {
                var i = 0
                while (i < v.length && i < dim) { sums(i) += v(i).toDouble; i += 1 }
                n += 1
              }
            }
            state.update((sums, n))
            state.setTimeoutTimestamp(win * windowMs + windowMs)
            Iterator.empty
          }
        })
  }

  /** Streaming TRENDING items: the top-k most frequent event types per
    * tumbling window, each window emitted EXACTLY ONCE — when the
    * watermark passes its end. Windowed counts alone can't rank (a rank
    * needs the window complete); this keys custom state by the window
    * bucket, accumulates a per-type count map (state bounded by the
    * type cardinality, never the event volume), and registers an
    * EVENT-TIME timeout at the window end so the watermark itself closes
    * the window. The batch twin is `q_trending` (same bucket arithmetic,
    * same tiebreak), letting the incremental operator be oracle-checked
    * through its batch equivalence (StreamingSpec). */
  def trendingClosed(events: Dataset[Event], windowMs: Long, k: Int,
                     watermarkDelay: String = "10 seconds"): Dataset[WindowTopK] = {
    import events.sparkSession.implicits._
    require(windowMs > 0 && k > 0, s"need windowMs>0, k>0; got $windowMs, $k")
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(e => Math.floorDiv(e.ts.getTime, windowMs))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (win: Long, batch: Iterator[Event], state: GroupState[Map[String, Long]]) => {
          if (state.hasTimedOut) {
            val counts = state.get
            state.remove()
            counts.toSeq.sortBy { case (i, c) => (-c, i) }.take(k).zipWithIndex.map {
              case ((item, c), r) =>
                WindowTopK(new java.sql.Timestamp(win * windowMs), item, c, r + 1)
            }.iterator
          } else {
            val m = batch.foldLeft(state.getOption.getOrElse(Map.empty[String, Long])) {
              (acc, e) => acc + (e.event_type -> (acc.getOrElse(e.event_type, 0L) + 1L))
            }
            state.update(m)
            state.setTimeoutTimestamp(win * windowMs + windowMs)
            Iterator.empty
          }
        })
  }

  /** Streaming per-key admission quota — the incremental twin of
    * [[graft.pipeline.Sampling.capPerGroup]]'s hard cap ("at most n
    * documents per source"): admit the first `n` rows per key, drop the
    * rest. Within a micro-batch, arrival order is made deterministic
    * (event time at FULL timestamp precision — (epoch-second, nanos) —
    * then id) so replays admit the same rows and the batch form is
    * SQL-oracle-matchable (q_stream_quota).
    *
    * A stream cannot re-rank history, so the quota is FIRST-ARRIVAL where
    * the batch cap is md5-rank — the standard intake-throttle semantics
    * (the batch form remains the one to use for retrospective curation).
    * State per key is ONE long (the admitted count): bounded by the key
    * population, not the stream length. Keys that reach their quota keep
    * the counter so late arrivals stay dropped; for churning key spaces
    * compose with a processing-time timeout (the [[sessionize]]
    * `expireIdleState` pattern) to age out closed quotas. */
  def capPerKeyStream(rows: Dataset[(Long, String, java.sql.Timestamp)],
                      n: Long): Dataset[Admission] = {
    import rows.sparkSession.implicits._
    require(n > 0, s"cap must be positive, got $n")
    rows
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, batch: Iterator[(Long, String, java.sql.Timestamp)],
         state: GroupState[Long]) => {
          val sorted = batch.toSeq.sortBy(r =>
            (r._3.getTime / 1000, r._3.getNanos, r._1))
          var admitted = state.getOption.getOrElse(0L)
          val out = Seq.newBuilder[Admission]
          for (r <- sorted if admitted < n) {
            admitted += 1
            out += Admission(r._1, key, admitted)
          }
          state.update(admitted)
          out.result().iterator
        })
  }

  /** Per-user sessionization with an inactivity gap: custom state via
    * mapGroupsWithState. State per key is one small struct.
    *
    * `expireIdleState` (processing-time timeout = the gap) bounds the
    * state store to the ACTIVE user population instead of every key ever
    * seen — REQUIRED for unbounded key spaces in production. It is opt-in
    * because pending wake-up timers keep synchronous drains
    * (`processAllAvailable`, the standard test idiom) from ever returning;
    * long-running queries with real triggers are unaffected. */
  def sessionize(events: Dataset[Event], gapMs: Long,
                 expireIdleState: Boolean = false): Dataset[Session] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (expireIdleState) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(timeoutConf)(
        (user: Long, batch: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            // idle past the gap: emit the closed session and drop state
            val st = state.get
            state.remove()
            Session(user, new java.sql.Timestamp(st.started),
              new java.sql.Timestamp(st.ended), st.events, st.total)
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var st = state.getOption.getOrElse(SessionState(Long.MaxValue, Long.MinValue, 0L, 0.0))
            sorted.foreach { e =>
              val t = e.ts.getTime
              st =
                if (st.events > 0 && t - st.ended > gapMs)
                  // gap exceeded: a real pipeline would emit the closed
                  // session here (flatMapGroupsWithState); we restart state
                  SessionState(t, t, 1L, e.value)
                else
                  SessionState(math.min(st.started, t), math.max(st.ended, t),
                    st.events + 1, st.total + e.value)
            }
            state.update(st)
            if (expireIdleState) state.setTimeoutDuration(gapMs)
            Session(user, new java.sql.Timestamp(st.started),
              new java.sql.Timestamp(st.ended), st.events, st.total)
          }
        })
  }
}
