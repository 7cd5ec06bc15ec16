package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity search over an embedding column (`array<float>`).
  *
  * Three tiers, same contract (top-k neighbors by cosine):
  *  - [[bruteTopK]]: exact scan — the correctness baseline; one pass, no
  *    shuffle except the final top-k (TakeOrderedAndProject).
  *  - [[lshTopK]]: random-hyperplane LSH — sign-bit sketch buckets the
  *    vectors so only a sliver of the corpus is scored; the scale path
  *    when the query set is large.
  *  - [[ivfTopK]]: inverted-file — vectors are pre-assigned to coarse
  *    centroids; a query scores only the `nProbe` nearest cells.
  *
  * Dot products run as higher-order array folds inside codegen (no UDF).
  * The exact fold accumulates in decimal so results are reproducible
  * across partition orders and match external oracles bit-for-bit.
  */
object Similarity {

  /** Dot product as a sequential left fold in double — bit-reproducible:
    * the fold order is the array order, independent of partitioning, and
    * identical to any engine that folds lists left-to-right (the DuckDB
    * oracle uses list_reduce). A native kernel
    * ([[graft.functions.DotProductExpr]]): the equivalent higher-order
    * `aggregate(zip_with(...))` evaluates interpreted and was the
    * similarity bench bottleneck. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnAccess.{column => C, expression => E}
    C(graft.functions.DotProductExpr(E(a), E(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force top-k by cosine against one query vector.
    * The plan is scan → project → TakeOrderedAndProject: each partition
    * keeps a local k-heap, the driver merges k×partitions rows — no full
    * sort, no wide shuffle, scales linearly with corpus size. */
  def bruteTopK(df: DataFrame, vecCol: String, idCol: String,
                query: Seq[Float], k: Int): DataFrame = {
    val q = typedLit(query)
    df.select(col(idCol), cosine(col(vecCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** HARD-NEGATIVE band scan: all vectors whose cosine against the query
    * falls in `[lo, hi)` — the contrastive-training mining primitive
    * ("close, but not a duplicate": above `hi` are positives/near-dups,
    * below `lo` are easy negatives that teach nothing). Exact and
    * map-only: scan → project → filter, no top-k heap, no shuffle; the
    * band predicate sits on a computed column so the only cost over a
    * count(*) is the dot kernel. Compose per-anchor via the batch kNN
    * machinery when mining negatives for a whole positive set; the
    * IVF-pruned variant ([[ivfBandScan]]) is the 100 TB path. Output is
    * ordered (cosine DESC, id) — hardest negatives first. */
  def bandScan(df: DataFrame, vecCol: String, idCol: String,
               query: Seq[Float], lo: Double, hi: Double): DataFrame = {
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val q = typedLit(query)
    df.select(col(idCol), cosine(col(vecCol), q).as("cosine"))
      .filter(col("cosine") >= lo && col("cosine") < hi)
      .orderBy(col("cosine").desc, col(idCol))
  }

  /** [[bandScan]] against a persisted IVF index, pruned to the `nProbe`
    * cells nearest the query (partition filter — probe I/O is
    * `nProbe/nCells` of the corpus). Approximate exactly like
    * [[ivfTopK]]: band members living in unprobed cells are missed;
    * widen `nProbe` for recall (negatives are plentiful — missing some
    * is the cheap side of the trade). */
  def ivfBandScan(spark: org.apache.spark.sql.SparkSession, path: String,
                  centroids: Array[Seq[Float]], vecCol: String, idCol: String,
                  query: Seq[Float], lo: Double, hi: Double,
                  nProbe: Int = 4): DataFrame = {
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val cells = nearestCells(centroids, query, nProbe)
    val q = typedLit(query)
    spark.read.parquet(path)
      .filter(col("__cell").isin(cells: _*))
      .select(col(idCol), cosine(col(vecCol), q).as("cosine"))
      .filter(col("cosine") >= lo && col("cosine") < hi)
      .orderBy(col("cosine").desc, col(idCol))
  }

  /** Deterministic random hyperplanes: `nBits` planes in `dim` dims. */
  def hyperplanes(dim: Int, nBits: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** ENGINE-REPLAYABLE hyperplanes: weight (b, d) is uniform in [-1, 1)
    * derived from the first 4 md5 bytes of `"lshp:b:d"` — the md5-bucket
    * recipe ([[Sampling]]) applied to projection directions, so an
    * external SQL engine can regenerate the exact planes
    * (`('0x' || substr(md5(s), 1, 8))::BIGINT / 4294967296.0 * 2.0 - 1.0`)
    * and replay the whole sketch → Hamming-gate → top-k retrieval
    * bit-for-bit. This is what makes `q_embed_recall_lsh` a determinate
    * quality gate rather than a rows-only entry. Uniform (not Gaussian)
    * directions cost a little sketch quality per bit versus
    * [[hyperplanes]]; for the recall GAUGE that trade is free — the gauge
    * measures recall, it doesn't need the best possible recall. */
  def hyperplanesMd5(dim: Int, nBits: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5") // digest() resets
    Array.tabulate(nBits) { b =>
      Array.tabulate(dim) { d =>
        val h = md.digest(s"lshp:$b:$d".getBytes("UTF-8"))
        val u = ((h(0) & 0xFFL) << 24) | ((h(1) & 0xFFL) << 16) |
          ((h(2) & 0xFFL) << 8) | (h(3) & 0xFFL)
        u.toDouble / 4294967296.0 * 2.0 - 1.0
      }
    }
  }

  /** Sign-bit sketch of a vector under the given hyperplanes, packed into
    * `ceil(nBits/64)` longs (`array<bigint>`). One native kernel pass over
    * the vector ([[graft.functions.SketchExpr]]) — the declarative
    * per-plane formulation re-reads the vector nBits times and generates
    * pathological codegen at wide sketches. */
  def sketch(vecCol: Column, planes: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.GraftColumnAccess.{column => C, expression => E}
    C(graft.functions.SketchExpr(E(vecCol), planes))
  }

  /** Johnson–Lindenstrauss random projection to `k` dimensions — the
    * continuous companion of the sign-bit [[sketch]]: `y_j = ⟨v, p_j⟩ ·
    * √(3/k)` with the SAME md5-derived uniform[−1,1) planes
    * ([[hyperplanesMd5]]), whose per-entry variance 1/3 makes the scale
    * factor norm-preserving in expectation. Fully deterministic and
    * engine-portable (the planes regenerate from md5 anywhere), so the
    * projection — the standard pre-reduction before clustering or ANN at
    * high dims — is oracle-checkable, unlike seeded Gaussian RP. Output
    * is long-form `(id, j, y)` (j 1-based); null vectors are dropped.
    *
    * Scale shape: one map pass, k dot kernels per row, planes are
    * literals — no shuffle at all. */
  def randomProject(df: DataFrame, vecCol: String, idCol: String,
                    k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val rows = df.filter(col(vecCol).isNotNull)
    val dim = rows.select(col(vecCol)).head().getSeq[Any](0).length
    val planes = hyperplanesMd5(dim, k)
    val scale = math.sqrt(3.0 / k)
    val comps = (0 until k).map { j =>
      struct(lit(j + 1).as("j"),
        round(dot(col(vecCol), typedLit(planes(j).toSeq)) * lit(scale), 6)
          .as("y"))
    }
    rows.select(col(idCol).as("id"), explode(array(comps: _*)).as("__c"))
      .select(col("id"), col("__c.j").as("j"), col("__c.y").as("y"))
  }

  /** Hamming distance between two packed sketches: one native kernel call
    * ([[graft.functions.HammingDistExpr]]) XOR+POPCNTs every word. The
    * previous per-word `bit_count(element_at ^ element_at)` chain spent
    * more on ArrayData accessors than the dot product it gates against
    * at small embedding dims. The kernel derives the word count from the
    * arrays; a width mismatch nulls out and the gate drops the pair.
    * (An earlier signature took an `nBits` parameter the kernel ignored —
    * dropped rather than left as a silent no-op.) */
  def hamming(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnAccess.{column => C, expression => E}
    C(graft.functions.HammingDistExpr(E(a), E(b)))
  }

  /** Driver-side sketch of one query vector (same packing as [[sketch]]). */
  def sketchLocal(planes: Array[Array[Double]], query: Seq[Float]): Array[Long] = {
    val words = new Array[Long]((planes.length + 63) / 64)
    for (i <- planes.indices) {
      var acc = 0.0
      var j = 0
      while (j < planes(i).length) { acc += planes(i)(j) * query(j); j += 1 }
      if (acc > 0) words(i / 64) |= (1L << (i % 64))
    }
    words
  }

  /** Names of the stored columns an index carries for `vecCol`. The
    * vector column's name is part of each column name, so a stored norm
    * or sketch can never be silently applied to a DIFFERENT vector column
    * (a bare `__norm`/`__sk` next to two vector columns would be
    * ambiguous poison). */
  def normColName(vecCol: String): String = s"__norm_$vecCol"
  def skColName(vecCol: String): String = s"__sk_$vecCol"

  /** Cosine against one query vector, using the stored norm column when
    * the frame carries one FOR THIS vector column (persisted indexes do)
    * — the stored norm replaces a second per-row dim-length pass that the
    * index already paid at build time. norm(queryLit) constant-folds
    * either way. */
  private def cosineVsQuery(d: DataFrame, vecCol: String, q: Column): Column =
    if (d.columns.contains(normColName(vecCol)))
      dot(col(vecCol), q) / (col(normColName(vecCol)) * norm(q))
    else cosine(col(vecCol), q)

  /** LSH top-k over a prebuilt index (see [[lshWriteIndex]]): score only
    * vectors whose sketch is within `maxHamming` bits of the query's
    * sketch — codegen'd per-word bit_counts folded into the scan,
    * followed by exact cosine on the surviving sliver (vector norms come
    * from the index's stored provenance-named norm column, not a per-row
    * recompute). */
  def lshTopKIndexed(indexed: DataFrame, vecCol: String, idCol: String,
                     query: Seq[Float], k: Int, nBits: Int = 16,
                     maxHamming: Int = 4, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(query.length, nBits, seed)
    val qSketch = sketchLocal(planes, query)
    indexed
      .filter(hamming(col(skColName(vecCol)), typedLit(qSketch.toSeq)) <= maxHamming)
      .select(col(idCol),
        cosineVsQuery(indexed, vecCol, typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Persist the LSH sketch index to parquet: the corpus plus its
    * `__sk_<vecCol>` sketch and `__norm_<vecCol>` (precomputed vector
    * norm) columns, written once.
    * Queries then pay ONLY a codegen'd bit_count filter over the stored
    * sketch plus one dot product on the surviving sliver — neither the
    * nBits·dim sketch products nor the per-vector norm is ever recomputed.
    * At 100 TB this is the "write the sketch column back next to the
    * embeddings" path; the index is the corpus + nBits/8 + 8 bytes/row. */
  def lshWriteIndex(df: DataFrame, vecCol: String, nBits: Int, dim: Int,
                    path: String, seed: Long = 42L): Unit = {
    val planes = hyperplanes(dim, nBits, seed)
    df.withColumn(skColName(vecCol), sketch(col(vecCol), planes))
      .withColumn(normColName(vecCol), norm(col(vecCol)))
      .write.mode("overwrite").parquet(path)
  }

  /** INCREMENTAL index maintenance: sketch only the new batch with the
    * SAME (dim, nBits, seed) plane family and append its rows to the
    * persisted index — a growing corpus must not re-sketch 100 TB of
    * history per intake batch. The planes are deterministic from the
    * parameters, so appended rows are bit-compatible with the original
    * build; probes over the merged index are indistinguishable from a
    * full rebuild (pinned in PipelineSpec). Callers own id uniqueness
    * across batches (the same contract as any append). */
  def lshAppendIndex(delta: DataFrame, vecCol: String, nBits: Int, dim: Int,
                     path: String, seed: Long = 42L): Unit = {
    val planes = hyperplanes(dim, nBits, seed)
    delta.withColumn(skColName(vecCol), sketch(col(vecCol), planes))
      .withColumn(normColName(vecCol), norm(col(vecCol)))
      .write.mode("append").parquet(path)
  }

  /** Query a parquet-persisted LSH index (see [[lshWriteIndex]]). The scan
    * reads only the (id, sketch, vector, norm) columns; the Hamming filter runs inside
    * whole-stage codegen before any cosine is computed. */
  def lshReadTopK(spark: org.apache.spark.sql.SparkSession, path: String,
                  vecCol: String, idCol: String, query: Seq[Float], k: Int,
                  nBits: Int = 16, maxHamming: Int = 4,
                  seed: Long = 42L): DataFrame =
    lshTopKIndexed(spark.read.parquet(path), vecCol, idCol, query, k,
      nBits, maxHamming, seed)

  /** One-shot convenience: sketch inline and query once — no persist (the
    * index is read exactly once, caching it would only leak a cached
    * DataFrame into the session). Use [[lshWriteIndex]] +
    * [[lshTopKIndexed]] when issuing many queries against the same
    * corpus. */
  def lshTopK(df: DataFrame, vecCol: String, idCol: String,
              query: Seq[Float], k: Int, nBits: Int = 16, maxHamming: Int = 4,
              seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(query.length, nBits, seed)
    lshTopKIndexed(df.withColumn(skColName(vecCol), sketch(col(vecCol), planes)),
      vecCol, idCol, query, k, nBits, maxHamming, seed)
  }

  /** Round-robin repartition of the scan side before an all-pairs join:
    * a small corpus often arrives as ONE parquet split, which would run
    * the entire broadcast nested-loop join in a single task regardless of
    * cluster width. At warehouse scale the source is already many splits
    * and this is a near-no-op (narrow rebalance, no key skew possible). */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)

  /** Brute-force kNN GRAPH: for every query row, the exact top-k cosine
    * neighbors in the corpus (self excluded). The query side broadcasts
    * (tiny vs the corpus); per pair the work is ONE dot product — norms
    * are precomputed once per side, not re-derived per pair. The final
    * per-query top-k is a window over (qid) — a single shuffle keyed by
    * query id. At 100 TB you would block the query set (broadcast B
    * queries at a time) and union; the per-block plan is exactly this one. */
  def knnGraphBrute(df: DataFrame, vecCol: String, idCol: String, k: Int,
                    queries: Option[DataFrame] = None): DataFrame =
    knnPairsTopK(df, vecCol, idCol, k, queries.getOrElse(df),
      gate = lit(true), withSketch = false)

  /** Sketch-gated kNN graph over a persisted LSH index (see
    * [[lshWriteIndex]]): same pair enumeration as [[knnGraphBrute]], but
    * each candidate pair is first tested with per-word `bit_count`s on the
    * stored sketches — only pairs within `maxHamming` ever pay a dot
    * product, and only survivors enter the top-k shuffle. This is THE
    * amortized-index win: the nBits·dim sketch dot products were paid once
    * at build time; per query-pair the gate costs 2 instructions per 64
    * bits. Sketch WIDTH sets the recall/prune trade: on weakly-clustered
    * corpora (true neighbors at cosine ~0.3) 64 bits cannot separate
    * neighbors from noise (recall 0.9 ⇒ ~40% of pairs pass), while 256
    * bits reaches recall ~0.95 with only ~12% passing. Approximate: a true
    * neighbor whose sketch distance exceeds `maxHamming` is missed (recall
    * pinned in PipelineSpec). */
  def knnGraphSketch(indexed: DataFrame, vecCol: String, idCol: String,
                     k: Int, maxHamming: Int,
                     queries: Option[DataFrame] = None): DataFrame =
    knnPairsTopK(indexed, vecCol, idCol, k, queries.getOrElse(indexed),
      // sketch gate FIRST: the cheap conjunct prunes before any dot product
      gate = hamming(col("sk"), col("qsk")) <= maxHamming,
      withSketch = true)

  /** Shared kNN shape: enumerate (corpus x broadcast queries) pairs, gate,
    * score the survivors with one dot product (norms precomputed per
    * side), then window per-query top-k. */
  private def knnPairsTopK(df: DataFrame, vecCol: String, idCol: String,
                           k: Int, queryDf: DataFrame, gate: Column,
                           withSketch: Boolean): DataFrame = {
    def side(d: DataFrame, id: String, v: String, nm: String, sk: String) = {
      // persisted-index inputs carry a precomputed norm column for this
      // vector column — reuse it instead of a second dim-length pass per
      // row per query block
      val nmCol =
        if (d.columns.contains(normColName(vecCol))) col(normColName(vecCol))
        else norm(col(vecCol))
      val cols = Seq(col(idCol).as(id), col(vecCol).as(v), nmCol.as(nm)) ++
        (if (withSketch) Seq(col(skColName(vecCol)).as(sk)) else Nil)
      d.select(cols: _*)
    }
    // zero-norm (and NaN-norm) vectors have no defined cosine: excluded
    // from BOTH sides here and (identically) from knnGraphGemm's pools,
    // so the two exact paths keep their bit-identical contract instead of
    // one ranking NaN-cosine rows first and the other silently dropping
    // them. The isnan guard is load-bearing: Spark SQL orders NaN GREATER
    // than every number, so `nq > 0.0` alone would keep NaN norms
    val pairs = side(spread(df), "id", "v", "nv", "sk")
      .crossJoin(broadcast(side(queryDf, "qid", "qv", "nq", "qsk")))
      .filter(gate && col("id") =!= col("qid") &&
        col("nv") > 0.0 && col("nq") > 0.0 &&
        !isnan(col("nv")) && !isnan(col("nq")))
      .select(col("qid"), col("id"),
        (dot(col("v"), col("qv")) / (col("nv") * col("nq"))).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cosine").desc, col("id"))
    pairs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Batch kNN over a prebuilt IVF index (see [[ivfWriteIndex]]): each
    * query scores only the rows of its `nProbe` nearest cells. The query
    * side ranks all `nCells` centroids declaratively (array_sort of
    * (−cos, cell) structs — nCells is small by construction), explodes to
    * (query, cell) pairs, and BROADCASTS into an equi-join on `__cell`,
    * so the corpus never shuffles and only candidate pairs pay a dot
    * product; the per-query top-k window is the only shuffle, carrying
    * candidates (nProbe/nCells of the corpus per query), not all pairs.
    * At query-set sizes past broadcast range, pass
    * `broadcastQueries = false`: the same operator becomes a
    * co-partitioned shuffle join on `__cell` — the index is already
    * partitioned by cell on disk, so its side arrives pre-bucketed, and
    * results are identical (pinned in PipelineSpec). Approximate like any
    * IVF probe: a true neighbor outside the probed cells is missed
    * (recall pinned in PipelineSpec). */
  def knnGraphIvf(assigned: DataFrame, centroids: Array[Seq[Float]],
                  vecCol: String, idCol: String, k: Int, nProbe: Int,
                  queries: DataFrame,
                  broadcastQueries: Boolean = true): DataFrame =
    knnGraphIvfCore(assigned, centroids.map(c => typedLit(c)), vecCol, idCol,
      k, nProbe, queries, broadcastQueries)

  /** [[knnGraphIvf]] over DOUBLE centroids — the deterministic-cell tier:
    * feed it [[Cluster.kmeansFit]]'s cells and the whole IVF retrieval
    * (cell ranking, probe join, top-k) is seedless and externally
    * replayable, which is what lets `q_embed_recall_ivf` oracle-check IVF
    * retrieval quality end-to-end. Same probe plan as the float tier; the
    * dot kernel widens per element, so float corpus vectors score against
    * double centroids exactly. */
  def knnGraphIvfExact(assigned: DataFrame, centroids: Array[Array[Double]],
                       vecCol: String, idCol: String, k: Int, nProbe: Int,
                       queries: DataFrame,
                       broadcastQueries: Boolean = true): DataFrame =
    knnGraphIvfCore(assigned, centroids.map(c => typedLit(c.toSeq)), vecCol,
      idCol, k, nProbe, queries, broadcastQueries)

  private def knnGraphIvfCore(assigned: DataFrame, centroids: Array[Column],
                              vecCol: String, idCol: String, k: Int,
                              nProbe: Int, queries: DataFrame,
                              broadcastQueries: Boolean): DataFrame = {
    val ranked = centroids.indices.map { i =>
      struct((lit(0.0) - cosine(col(vecCol), centroids(i))).as("negcos"),
        lit(i).as("cell"))
    }
    val qNorm =
      if (queries.columns.contains(normColName(vecCol))) col(normColName(vecCol))
      else norm(col(vecCol))
    val qcells = queries
      .select(col(idCol).as("qid"), col(vecCol).as("qv"), qNorm.as("nq"),
        slice(array_sort(array(ranked: _*)), 1, nProbe).as("__ranked"))
      .select(col("qid"), col("qv"), col("nq"),
        explode(transform(col("__ranked"), r => r.getField("cell"))).as("__cell"))
    val cNorm =
      if (assigned.columns.contains(normColName(vecCol))) col(normColName(vecCol))
      else norm(col(vecCol))
    val corpus = assigned.select(col("__cell"), col(idCol).as("id"),
      col(vecCol).as("v"), cNorm.as("nv"))
    val qside = if (broadcastQueries) broadcast(qcells) else qcells
    val pairs = corpus.join(qside, Seq("__cell"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        (dot(col("v"), col("qv")) / (col("nv") * col("nq"))).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cosine").desc, col("id"))
    pairs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** BLAS-blocked EXACT kNN graph — the brute graph's hot loop moved off
    * whole-stage codegen into dgemm. Same contract and (assuming the
    * margin, below) IDENTICAL output to [[knnGraphBrute]]: q_embed_knn's
    * oracle SQL gates this variant too. Shared zero-norm contract: a
    * vector with no nonzero element has no defined cosine and is excluded
    * from both sides on BOTH paths (brute filters `norm > 0`; here the
    * intake loops skip them) — pinned differentially in PipelineSpec.
    *
    * Why: the brute pair loop is a 400M-iteration generated function at
    * 20k vectors and its steady state is profile-compilation-bound
    * (PLANS.md r8: 254→67 s convergence at sf1 on this host). A
    * per-partition `dgemm` does the same multiply-adds vectorized with no
    * codegen warmup cliff, then candidate SELECTION keeps the top
    * `k + margin` per (query, partition), and only candidates are
    * re-scored with the EXACT left-fold arithmetic of
    * [[graft.functions.DotProductExpr]] (same accumulation order, same
    * norm expression) — so every emitted cosine is bit-identical to the
    * kernel's and the final window top-k reproduces the brute result.
    *
    * Exactness caveat, stated rather than hidden: a true top-k member is
    * lost only if dgemm's accumulation-order perturbation (~1e-15
    * relative) demotes it by more than `margin` positions within one
    * partition's candidate ranking — pinned differentially against
    * [[knnGraphBrute]] in PipelineSpec and by the exact oracle in CI.
    *
    * Scale shape (100 TB): queries broadcast once (m·dim doubles); each
    * corpus partition streams through block-sized dgemm calls (bounded
    * buffers: blockRows·dim input, blockRows·qChunk output), emits
    * O(m·(k+margin)) candidate rows, and the only shuffle is the final
    * per-query top-k window over candidates — `partitions·(k+margin)`
    * rows per query instead of the brute plan's full pair stream into
    * WindowGroupLimit. */
  /** Widen a collected vector to doubles element-by-element — the same
    * per-element widening [[graft.functions.DotProductExpr]] applies, so
    * arithmetic downstream is bit-identical for float AND double input
    * columns. */
  private[pipeline] def vecToDouble(s: Seq[Any]): Array[Double] = {
    val out = new Array[Double](s.length)
    var i = 0
    s.foreach { e =>
      out(i) = e match {
        case f: java.lang.Float  => f.toDouble
        case d: java.lang.Double => d
        case x                   => x.asInstanceOf[Number].doubleValue()
      }
      i += 1
    }
    out
  }

  def knnGraphGemm(df: DataFrame, vecCol: String, idCol: String, k: Int,
                   queries: Option[DataFrame] = None, margin: Int = 8,
                   blockRows: Int = 8192, qChunk: Int = 4096): DataFrame = {
    require(k > 0 && margin >= 0, s"need k > 0, margin >= 0; got $k, $margin")
    val spark = df.sparkSession
    val qdf = queries.getOrElse(df)
    // zero-norm queries have no defined cosine — dropped on the COMPUTED
    // norm exactly as knnPairsTopK (the brute path) filters nq > 0, so
    // NaN elements and squared-underflow vectors take the same branch on
    // both exact paths
    val qKept = qdf.select(col(idCol).cast("long"), col(vecCol)).collect()
      .map(r => (r.getLong(0), vecToDouble(r.getSeq[Any](1))))
      .filter { case (_, v) =>
        var acc = 0.0; var i = 0
        while (i < v.length) { acc += v(i) * v(i); i += 1 }
        acc > 0.0
      }
    val m = qKept.length
    if (m == 0) { // empty query slice (e.g. a chunked-run hash slice)
      import spark.implicits._
      return Seq.empty[(Long, Long, Double)].toDF("qid", "id", "cosine")
    }
    val dim = qKept(0)._2.length
    val qids = new Array[Long](m)
    val qmat = new Array[Double](m * dim) // row-major m×dim == col-major dim×m
    val qnorm = new Array[Double](m)
    var j = 0
    while (j < m) {
      val (qi, v) = qKept(j); qids(j) = qi
      var d0 = 0; var acc = 0.0
      while (d0 < dim) {
        val x = v(d0); qmat(j * dim + d0) = x; acc += x * x; d0 += 1
      }
      qnorm(j) = math.sqrt(acc); j += 1
    }
    val bq = spark.sparkContext.broadcast((qids, qmat, qnorm))
    val cap = k + margin
    val candRdd = df.select(col(idCol).cast("long"), col(vecCol))
      .rdd.mapPartitions { it =>
        val (qid, q, qn) = bq.value
        val blas = dev.ludovic.netlib.blas.BLAS.getInstance()
        // per-query candidate pools, flat: [j*cap + slot]
        val cScore = Array.fill(m.toLong.toInt * cap)(Double.NegativeInfinity)
        val cRow = new Array[Long](m * cap)
        val cVec = new Array[Array[Double]](m * cap)
        val cMin = new Array[Int](m) // slot of the pool minimum
        val ids = new Array[Long](blockRows)
        val vecs = new Array[Array[Double]](blockRows)
        val x = new Array[Double](blockRows * dim) // col-major dim×b
        // reciprocal norms: the selection loop multiplies instead of
        // dividing (ranking is monotone in dot/|v|, |v| > 0) — a divide
        // per pair is ~20 cycles against the ~3 the rest of the loop costs
        val rnv = new Array[Double](blockRows)
        val c = new Array[Double](blockRows * qChunk)
        def flush(b: Int): Unit = {
          var i = 0
          while (i < b) { // norms were taken at intake; this is a pure copy
            val v = vecs(i); var d0 = 0
            while (d0 < dim) { x(i * dim + d0) = v(d0); d0 += 1 }
            i += 1
          }
          var q0 = 0
          while (q0 < m) {
            val qc = math.min(qChunk, m - q0)
            // C (col-major b×qc) = Xᵀ(b×dim) · Q(dim×qc)
            blas.dgemm("T", "N", b, qc, dim, 1.0, x, 0, dim,
              q, q0 * dim, dim, 0.0, c, 0, b)
            var jj = 0
            while (jj < qc) {
              val qj = q0 + jj
              var ii = 0
              while (ii < b) {
                if (ids(ii) != qid(qj)) {
                  val s = c(jj * b + ii) * rnv(ii) // rank by dot/|v| (|q| const per query)
                  val base = qj * cap
                  val mn = base + cMin(qj)
                  // the pool's WORST slot orders by (score ASC, id DESC),
                  // the exact inverse of the final window's (cosine DESC,
                  // id ASC) — so with more tied candidates than the pool
                  // holds, the kept set is the cap SMALLEST ids of the tie
                  // class and the union with other partitions reproduces
                  // the brute result (a min-score-only eviction kept an
                  // arbitrary tied member and could emit a larger id)
                  if (s > cScore(mn) || (s == cScore(mn) && ids(ii) < cRow(mn))) {
                    cScore(mn) = s; cRow(mn) = ids(ii); cVec(mn) = vecs(ii)
                    // re-find the worst slot: min score, ties -> max id
                    var best = base; var t = base + 1
                    while (t < base + cap) {
                      if (cScore(t) < cScore(best) ||
                          (cScore(t) == cScore(best) && cRow(t) > cRow(best))) best = t
                      t += 1
                    }
                    cMin(qj) = best - base
                  }
                }
                ii += 1
              }
              jj += 1
            }
            q0 += qc
          }
        }
        var b = 0
        it.foreach { r =>
          val v = vecToDouble(r.getSeq[Any](1))
          var d0 = 0; var acc = 0.0
          while (d0 < dim) { val xv = v(d0); acc += xv * xv; d0 += 1 }
          if (acc > 0.0) { // zero-norm corpus rows: same exclusion as brute
            ids(b) = r.getLong(0); vecs(b) = v
            rnv(b) = 1.0 / math.sqrt(acc); b += 1
            if (b == blockRows) { flush(b); b = 0 }
          }
        }
        if (b > 0) flush(b)
        // exact re-score of survivors: the kernel's fold order, verbatim
        // (elements were widened to double at intake, exactly where
        // DotProductExpr.compute widens them)
        (0 until m).iterator.flatMap { qj =>
          val base = qj * cap
          (0 until cap).iterator.filter(s => cScore(base + s) > Double.NegativeInfinity)
            .map { s =>
              val v = cVec(base + s)
              var d0 = 0; var acc = 0.0; var n2 = 0.0
              while (d0 < dim) {
                val xv = v(d0)
                acc += xv * q(qj * dim + d0); n2 += xv * xv; d0 += 1
              }
              (qid(qj), cRow(base + s), acc / (math.sqrt(n2) * qn(qj)))
            }
        }
      }
    import spark.implicits._
    val pairs = candRdd.toDF("qid", "id", "cosine")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cosine").desc, col("id"))
    pairs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** [[knnGraphGemm]] for query sets too large to collect at once: the
    * query frame is split into `nChunks` deterministic id-hash slices,
    * each slice runs the blocked-dgemm graph against the full corpus, and
    * the union is EXACTLY the unchunked result (per-query top-k is
    * independent across queries — pinned in PipelineSpec). This is the
    * standard blocked-matmul trade made explicit: driver/broadcast memory
    * per job drops to m/nChunks query vectors, paid for with nChunks
    * corpus scans — at full-corpus self-graph scale pick nChunks so a
    * slice fits the broadcast budget and let the scheduler pipeline the
    * scans. */
  def knnGraphGemmChunked(df: DataFrame, vecCol: String, idCol: String,
                          k: Int, nChunks: Int,
                          queries: Option[DataFrame] = None, margin: Int = 8,
                          blockRows: Int = 8192, qChunk: Int = 4096): DataFrame = {
    require(nChunks > 0, s"nChunks must be positive, got $nChunks")
    val qdf = queries.getOrElse(df)
    (0 until nChunks).map { i =>
      knnGraphGemm(df, vecCol, idCol, k,
        Some(qdf.filter(pmod(xxhash64(col(idCol)), lit(nChunks)) === i)),
        margin, blockRows, qChunk)
    }.reduce(_.unionByName(_))
  }

  /** kNN label transfer — semi-supervised labeling over the EXACT kNN
    * graph: each query takes the majority label of its k nearest labeled
    * neighbors (cosine), ties broken deterministically by (votes DESC,
    * label ASC). The standard seed-labels-to-corpus move (label a few
    * thousand docs, propagate to millions by embedding neighborhood);
    * the embedding-space companion to Graph.labelPropagation, which
    * propagates over an explicit edge table instead.
    *
    * Querying the labeled corpus with itself is leave-one-out by
    * construction (the graph never pairs an id with itself), so the
    * output doubles as a labeling-quality gauge against known labels.
    *
    * Scale shape: inherits [[knnGraphGemm]]'s contract — queries are
    * driver-collected and broadcast (bounded by contract; chunk via
    * [[knnGraphGemmChunked]] for beyond-broadcast query sets), the corpus
    * streams through per-partition dgemm blocks, and only k+margin rows
    * per query leave the map side. The vote is one (query × k)-sized
    * groupBy plus a per-query window — bounded by the query set, never by
    * the corpus. Output: (qid, pred_label, votes). */
  def knnLabelTransfer(df: DataFrame, vecCol: String, idCol: String,
                       labelCol: String, k: Int,
                       queries: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val labeled = df.filter(col(labelCol).isNotNull)
    val graph = knnGraphGemm(labeled, vecCol, idCol, k, queries)
    val labels = labeled.select(col(idCol).cast("long").as("id"),
      col(labelCol).as("__lab"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("votes").desc, col("__lab"))
    graph.join(labels, "id")
      .groupBy(col("qid"), col("__lab"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("qid"), col("__lab").as("pred_label"), col("votes"))
  }

  /** Corpus geometry report: a histogram of pairwise cosines over a
    * SYSTEMATIC pair sample — each row pairs with the rows `stride` ids
    * ahead — split by whether the two rows share a label. The
    * separability gauge for an embedding space: healthy spaces show the
    * same-label mass shifted right of the cross-label mass; overlap
    * predicts poor retrieval/clustering before any index is built.
    * Deterministic (id-offset sampling, no RNG) and exact, so the
    * `q_embed_geometry` oracle replays it bit-for-bit. Scale shape: one
    * equi-join per stride on the 8-byte id (|strides|·n pairs total —
    * a FIXED multiple of the corpus, never quadratic), then a
    * map-side-combined count on (bucket, same_label). */
  def geometryReport(df: DataFrame, vecCol: String, idCol: String,
                     labelCol: String, strides: Seq[Long] = Seq(7L, 131L),
                     bins: Int = 20): DataFrame = {
    require(bins > 0 && strides.nonEmpty, "need bins > 0 and at least one stride")
    val base = df.select(col(idCol).cast("long").as("__id"), col(vecCol).as("__v"),
      col(labelCol).as("__l"))
    val probes = strides.map { s0 =>
      base.select(col("__id"), (col("__id") + s0).as("__id2"), col("__v"), col("__l"))
    }.reduce(_.unionByName(_))
    val pairs = probes.join(
      base.select(col("__id").as("__id2"), col("__v").as("__v2"), col("__l").as("__l2")),
      "__id2")
    pairs
      .select(
        least(lit(bins - 1), greatest(lit(0),
          floor((cosine(col("__v"), col("__v2")) + 1.0) / 2.0 * bins).cast("int")))
          .as("bucket"),
        (col("__l") === col("__l2")).as("same_label"))
      .groupBy("bucket", "same_label").agg(count(lit(1)).as("n"))
  }

  /** Embedding-space eval-set decontamination: every corpus row within
    * `tau` cosine of ANY probe vector, with the probe and the exact
    * cosine — the vector analogue of [[Dedup.contamination]]'s n-gram
    * screen (paraphrased or re-embedded benchmark leakage that shares no
    * n-grams still sits close in embedding space). Probes are an eval
    * set: small by construction, so they BROADCAST and the corpus is one
    * scan — no shuffle at all until the caller aggregates. Exact and
    * seedless (left-fold dot, same as [[cosine]]), so an external engine
    * replays it bit-for-bit; at 100 TB put [[knnGraphSketch]]'s Hamming
    * gate in front if the probe set ever grows past broadcast size. */
  def semanticContamination(corpus: DataFrame, probes: DataFrame,
                            vecCol: String, idCol: String,
                            probeIdCol: String, tau: Double): DataFrame = {
    corpus.select(col(idCol).as("id"), col(vecCol).as("__v"),
        norm(col(vecCol)).as("__nv"))
      .crossJoin(broadcast(probes.select(col(probeIdCol).as("probe_id"),
        col(vecCol).as("__qv"), norm(col(vecCol)).as("__nq"))))
      .select(col("id"), col("probe_id"),
        (dot(col("__v"), col("__qv")) / (col("__nv") * col("__nq"))).as("cosine"))
      .filter(col("cosine") >= tau)
  }

  /** Per-query recall@k of an approximate top-k result against the exact
    * one — the index-quality gauge that decides whether an ANN index
    * (LSH/IVF/PQ/int8) is trustworthy before it serves the full corpus:
    * run both paths on an evaluation sample, then deploy the cheap path
    * only if the recall distribution clears the bar. Inputs are any two
    * (qidCol, idCol) result frames (extra columns ignored); output is one
    * row per exact-side query — (qid, hits, total, recall).
    *
    * Scale shape: both inputs are already top-k-sized (queries·k rows,
    * never corpus-sized); the semi-join and the two groupBys shuffle on
    * the 8-byte qid only. */
  def recallReport(exact: DataFrame, approx: DataFrame,
                   qidCol: String = "qid", idCol: String = "id"): DataFrame = {
    val e = exact.select(col(qidCol).as("__q"), col(idCol).as("__i"))
    val a = approx.select(col(qidCol).as("__q"), col(idCol).as("__i"))
    val tot = e.groupBy("__q").agg(count(lit(1)).as("total"))
    val hits = e.join(a, Seq("__q", "__i"), "left_semi")
      .groupBy("__q").agg(count(lit(1)).as("hits"))
    tot.join(hits, Seq("__q"), "left")
      .select(col("__q").as(qidCol),
        coalesce(col("hits"), lit(0L)).as("hits"), col("total"),
        (coalesce(col("hits"), lit(0L)).cast("double") /
          col("total").cast("double")).as("recall"))
  }

  /** Build an IVF index: assign every vector to its nearest of `nCells`
    * coarse centroids — a deterministic corpus sample refined by
    * `kmeansIter` Lloyd iterations (k-means under cosine: cells average
    * their members, empty cells keep their old centroid). Returns
    * (assignments DF with `__cell`, centroid array).
    *
    * Scale shape: per Lloyd iteration the corpus is touched by ONE narrow
    * assignment pass (centroids broadcast as literals) plus an
    * element-wise mean keyed by (cell, position) — a shuffle of at most
    * nCells·dim rows, independent of corpus size. Lloyd balances the
    * Voronoi cells: on this (weakly clustered) test corpus measured
    * recall@20 gains are real but modest — nProbe=8 avg 0.63 -> 0.73 at
    * sf0.01, 0.77 -> 0.78 at sf0.1 — because uniform data has no cluster
    * structure to find; on genuinely clustered embeddings the refinement
    * is what makes IVF usable at small nProbe. LSH is the right tier for
    * unclustered corpora (see [[lshWriteIndex]]).
    *
    * Determinism caveat: the initial sample is fully deterministic, but
    * Lloyd's member means run through Spark `avg` over doubles, whose
    * partial-aggregation order is not guaranteed — two rebuilds of the
    * same corpus can produce bit-different centroids and hence slightly
    * different cell assignments. Recall contracts are pinned on the
    * probe results (PipelineSpec), not on centroid bits; callers needing
    * bit-stable rebuilds should persist the index once ([[ivfWriteIndex]])
    * rather than rebuild. */
  def ivfIndex(df: DataFrame, vecCol: String, idCol: String, nCells: Int,
               seed: Long = 42L, kmeansIter: Int = 2): (DataFrame, Array[Seq[Float]]) = {
    var centroids: Array[Seq[Float]] = df
      .select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol), lit(seed)))   // deterministic pseudo-random sample
      .limit(nCells)
      .collect()
      .map(_.getSeq[Float](1))
    def assign(cs: Array[Seq[Float]]): DataFrame = {
      val best = cs.indices.map { i =>
        struct(cosine(col(vecCol), typedLit(cs(i))).as("cos"), lit(i).as("cell"))
      }
      df.withColumn("__cell", greatest(best: _*).getField("cell"))
    }
    for (_ <- 0 until kmeansIter) {
      // element-wise member mean per cell: explode to (cell, pos, value),
      // average, reassemble position-ordered — bounded by nCells*dim rows
      val means = assign(centroids)
        .select(col("__cell"), posexplode(col(vecCol)))
        .groupBy(col("__cell"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("__cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          e => e.getField("m").cast("float")).as("centroid"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
      centroids = centroids.indices
        .map(i => means.getOrElse(i, centroids(i))).toArray
    }
    (assign(centroids), centroids)
  }

  /** Persist an IVF index partitioned BY CELL: queries that filter on
    * `__cell` then prune at the FILE level (partition pruning — the scan
    * never opens non-probed cells' files). This is the promised scale
    * path: index once, every query reads nProbe/nCells of the data. */
  def ivfWriteIndex(df: DataFrame, vecCol: String, idCol: String,
                    nCells: Int, path: String, seed: Long = 42L): Array[Seq[Float]] = {
    val (assignedRaw, centroids) = ivfIndex(df, vecCol, idCol, nCells, seed)
    // store the vector norm next to the cell assignment: probes then pay
    // one dot product per scanned row, not dot + a norm recompute
    val assigned = assignedRaw.withColumn(normColName(vecCol), norm(col(vecCol)))
    // centroids FIRST: the main index's _SUCCESS is the build-complete
    // marker (ensure* checks it), so everything it implies must already
    // exist — a crash between the two writes must never leave a
    // probe-breaking index that looks finished.
    // (Sibling path: a stray subdirectory inside `path` would break its
    // cell-partition discovery.)
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      centroids.toSeq.zipWithIndex.map { case (c, i) =>
        org.apache.spark.sql.Row(i, c)
      }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("centroid",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType), nullable = false))))
      .write.mode("overwrite").parquet(centroidsPath(path))
    assigned.write.mode("overwrite").partitionBy("__cell").parquet(path)
    centroids
  }

  private def centroidsPath(indexPath: String): String =
    indexPath.stripSuffix("/") + ".centroids"

  /** Load the centroid table written by [[ivfWriteIndex]]. */
  /** INCREMENTAL IVF maintenance: assign only the delta batch to the
    * index's EXISTING centroids and append into the cell partitions —
    * the standard IVF intake contract (cells stay fixed between periodic
    * rebuilds; appending never re-reads or re-centers history). Probes
    * over the merged index see the delta exactly as a full re-assign
    * against the same centroids would (pinned in PipelineSpec). */
  def ivfAppendIndex(delta: DataFrame, vecCol: String, idCol: String,
                     path: String): Unit = {
    val centroids = ivfReadCentroids(delta.sparkSession, path)
    val best = centroids.indices.map { i =>
      struct(cosine(col(vecCol), typedLit(centroids(i))).as("cos"), lit(i).as("cell"))
    }
    // project the delta to exactly the built index's data columns before
    // deriving norm/cell — a delta with extra (or missing) columns must
    // fail loudly here, not append rows whose parquet schema diverges
    val dataCols = delta.sparkSession.read.parquet(path).schema.fieldNames
      .filterNot(c => c == "__cell" || c == normColName(vecCol))
    require(dataCols.contains(idCol) && dataCols.contains(vecCol),
      s"index at $path does not carry ($idCol, $vecCol): ${dataCols.mkString(",")}")
    delta.select(dataCols.map(col).toSeq: _*)
      .withColumn("__cell", greatest(best: _*).getField("cell"))
      .withColumn(normColName(vecCol), norm(col(vecCol)))
      .write.mode("append").partitionBy("__cell").parquet(path)
  }

  def ivfReadCentroids(spark: org.apache.spark.sql.SparkSession,
                       path: String): Array[Seq[Float]] =
    spark.read.parquet(centroidsPath(path))
      .orderBy("cell").collect().map(_.getSeq[Float](1))

  /** Read + query a persisted IVF index (see [[ivfWriteIndex]]). The
    * `__cell` isin filter is a partition filter — check the scan's
    * PartitionFilters in explain(). */
  def ivfReadTopK(spark: org.apache.spark.sql.SparkSession, path: String,
                  centroids: Array[Seq[Float]], vecCol: String, idCol: String,
                  query: Seq[Float], k: Int, nProbe: Int = 4): DataFrame =
    ivfTopK(spark.read.parquet(path), centroids, vecCol, idCol, query, k, nProbe)

  /** IVF top-k: score only the vectors in the `nProbe` cells whose
    * centroids are nearest the query. */
  /** The `nProbe` cell ids whose centroids are nearest (by cosine) to the
    * query — driver arithmetic over the in-memory centroid table. */
  def nearestCells(centroids: Array[Seq[Float]], query: Seq[Float],
                   nProbe: Int): Seq[Int] = {
    def normLocal(v: Seq[Float]): Double =
      math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
    val qNorm = normLocal(query) // once, not per centroid
    def cosLocal(a: Seq[Float]): Double = {
      val d = a.zip(query).map { case (x, y) => x.toDouble * y.toDouble }.sum
      d / (normLocal(a) * qNorm)
    }
    centroids.indices.sortBy(i => -cosLocal(centroids(i))).take(nProbe)
  }

  def ivfTopK(assigned: DataFrame, centroids: Array[Seq[Float]],
              vecCol: String, idCol: String, query: Seq[Float], k: Int,
              nProbe: Int = 4): DataFrame = {
    val probeCells = nearestCells(centroids, query, nProbe)
    assigned
      .filter(col("__cell").isin(probeCells: _*))
      .select(col(idCol),
        cosineVsQuery(assigned, vecCol, typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Product-quantization codebooks from a deterministic corpus sample:
    * the `k` vectors with the smallest `xxhash64(id, seed)` become the
    * centroids of EVERY subspace (codebook j = subspace j of the same
    * sample — the standard sampled-codebook initialization; Lloyd
    * refinement per subspace would tighten cells but break exact
    * reproducibility, the [[ivfIndex]] caveat). Driver memory is
    * k·dim doubles — bounded, independent of corpus size. */
  def pqTrain(df: DataFrame, vecCol: String, idCol: String,
              m: Int = 8, k: Int = 256, seed: Long = 42L): Array[Array[Array[Double]]] = {
    val sampled = df.orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))
      .limit(k).select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sampled.nonEmpty, "pqTrain needs a non-empty corpus")
    val dim = sampled(0).length
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val sub = dim / m
    Array.tabulate(m, sampled.length)((j, c) => sampled(c).slice(j * sub, (j + 1) * sub))
  }

  /** Encode a corpus against PQ codebooks: per row, the m nearest-centroid
    * codes (ONE native kernel call — [[graft.functions.PqEncodeExpr]])
    * plus the reconstruction norm, which is pure table lookup: subspaces
    * are orthogonal, so |recon|² = Σ_j |cb_j[code_j]|², read from an
    * m·k literal of precomputed centroid norms. The corpus never moves:
    * encode is a map-only projection; store the (id, codes, norm) table
    * next to the corpus and the float vectors never need scanning again
    * (dim·4 bytes → m bytes per row, 32× at dim 64 / m 8). */
  def pqEncode(df: DataFrame, vecCol: String, idCol: String,
               codebooks: Array[Array[Array[Double]]],
               keep: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.GraftColumnAccess.{column => C, expression => E}
    val m = codebooks.length; val k = codebooks(0).length
    val norms2 = codebooks.flatMap(_.map(c => c.map(x => x * x).sum))
    val codes = C(graft.functions.PqEncodeExpr(E(col(vecCol)), codebooks))
    val kept = keep.map(col)
    val staged = df.select(col(idCol) +: codes.as("pq_codes") +: kept: _*)
    staged.select(col(idCol) +: col("pq_codes") +:
      sqrt(aggregate(zip_with(col("pq_codes"), sequence(lit(0), lit(m - 1)),
        (c, j) => element_at(typedLit(norms2.toSeq), (j * k + c + 1).cast("int"))),
        lit(0.0), _ + _)).as("pq_norm") +: kept: _*)
  }

  /** Persist a PQ index: the encoded (id, codes, norm) table plus the
    * codebooks beside it. Codebooks write FIRST — the encoded table's
    * _SUCCESS is the build-complete marker, so everything it implies
    * must already exist (the [[ivfWriteIndex]] crash-ordering
    * contract). The index is m+8 bytes per row: at dim 64 / m 8 a 32×
    * compression of the float corpus, and probes never read vectors. */
  def pqWriteIndex(df: DataFrame, vecCol: String, idCol: String,
                   codebooks: Array[Array[Array[Double]]], path: String): Unit = {
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    val rows = for {
      (cb, j) <- codebooks.zipWithIndex
      (c, ci) <- cb.zipWithIndex
    } yield org.apache.spark.sql.Row(j, ci, c.toSeq)
    spark.createDataFrame(rows.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("subspace",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("code",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("centroid",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType), nullable = false))))
      .write.mode("overwrite").parquet(codebooksPath(path))
    pqEncode(df, vecCol, idCol, codebooks).write.mode("overwrite").parquet(path)
  }

  private def codebooksPath(indexPath: String): String =
    indexPath.stripSuffix("/") + ".codebooks"

  /** Load the codebooks written by [[pqWriteIndex]]. */
  def pqReadCodebooks(spark: org.apache.spark.sql.SparkSession,
                      path: String): Array[Array[Array[Double]]] = {
    val rows = spark.read.parquet(codebooksPath(path))
      .orderBy("subspace", "code").collect()
    val m = rows.map(_.getInt(0)).max + 1
    val grouped = rows.groupBy(_.getInt(0))
    Array.tabulate(m)(j => grouped(j).sortBy(_.getInt(1))
      .map(_.getSeq[Double](2).toArray))
  }

  /** Probe a persisted PQ index (see [[pqWriteIndex]]). */
  def pqReadTopK(spark: org.apache.spark.sql.SparkSession, path: String,
                 codebooks: Array[Array[Array[Double]]], idCol: String,
                 query: Seq[Float], kTop: Int): DataFrame =
    pqTopK(spark.read.parquet(path), codebooks, idCol, query, kTop)

  /** Asymmetric-distance PQ top-k: the query precomputes its m·k dot
    * table against the codebooks on the driver; per corpus row the score
    * is m table lookups + one divide — no per-dimension work at all.
    * Approximate by construction (quantization error); recall is pinned
    * in PipelineSpec. Same shuffle-free TakeOrderedAndProject shape as
    * [[bruteTopK]]. */
  def pqTopK(encoded: DataFrame, codebooks: Array[Array[Array[Double]]],
             idCol: String, query: Seq[Float], kTop: Int): DataFrame = {
    val m = codebooks.length; val k = codebooks(0).length
    val sub = codebooks(0)(0).length
    require(query.length == m * sub, s"query dim ${query.length} != ${m * sub}")
    val qd = query.map(_.toDouble)
    val table = codebooks.zipWithIndex.flatMap { case (cb, j) =>
      cb.map(c => c.indices.map(d => c(d) * qd(j * sub + d)).sum)
    }
    val qNorm = math.sqrt(qd.map(x => x * x).sum)
    // ONE codegen'd kernel call per row ([[graft.functions.PqAdcExpr]]):
    // the declarative aggregate/zip_with/element_at fold is interpreted
    // per element and dominates the probe at corpus scale
    import org.apache.spark.sql.GraftColumnAccess.{column => C, expression => E}
    val dotT = C(graft.functions.PqAdcExpr(E(col("pq_codes")), table, m, k))
    encoded.select(col(idCol), (dotT / (col("pq_norm") * lit(qNorm))).as("cosine_pq"))
      .orderBy(col("cosine_pq").desc, col(idCol))
      .limit(kTop)
  }

  /** IVF-PQ: the two persisted index halves COMPOSED, the standard
    * billion-scale ANN architecture (FAISS's IndexIVFPQ re-expressed as a
    * partitioned parquet layout). The corpus is cell-partitioned by the
    * IVF assignment AND stored PQ-encoded (m+8 bytes per row), so a probe
    * (a) prunes to nProbe/nCells of the FILES via a partition filter and
    * (b) scores the survivors with the asymmetric-distance table — it
    * never reads a float vector at all. Probe I/O at 100 TB is
    * `(nProbe/nCells) · corpus/32` — both reduction factors multiply.
    *
    * Codebooks are trained GLOBALLY on raw vectors (not per-cell
    * residuals as FAISS defaults to): per-cell books would need k·nCells
    * driver centroids and make every cell's codes non-comparable across
    * cells; the sampled global book keeps exact rebuild determinism
    * (the [[pqTrain]] contract) at a modest recall cost, pinned in
    * PipelineSpec.
    *
    * Write ordering: centroids, then codebooks, then the encoded
    * cell-partitioned table — the main table's _SUCCESS is the
    * build-complete marker ([[ivfWriteIndex]] crash contract). */
  def ivfPqWriteIndex(df: DataFrame, vecCol: String, idCol: String,
                      nCells: Int, m: Int, k: Int, path: String,
                      seed: Long = 42L): (Array[Seq[Float]], Array[Array[Array[Double]]]) = {
    val (assigned, centroids) = ivfIndex(df, vecCol, idCol, nCells, seed)
    val books = pqTrain(df, vecCol, idCol, m, k, seed)
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      centroids.toSeq.zipWithIndex.map { case (c, i) =>
        org.apache.spark.sql.Row(i, c)
      }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("centroid",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType), nullable = false))))
      .write.mode("overwrite").parquet(centroidsPath(path))
    val rows = for {
      (cb, j) <- books.zipWithIndex
      (c, ci) <- cb.zipWithIndex
    } yield org.apache.spark.sql.Row(j, ci, c.toSeq)
    spark.createDataFrame(rows.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("subspace",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("code",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("centroid",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType), nullable = false))))
      .write.mode("overwrite").parquet(codebooksPath(path))
    pqEncode(assigned, vecCol, idCol, books, keep = Seq("__cell"))
      .write.mode("overwrite").partitionBy("__cell").parquet(path)
    (centroids, books)
  }

  /** Probe an IVF-PQ table: partition-prune to the nearest cells, then
    * ADC-score the encoded survivors ([[pqTopK]]). */
  def ivfPqTopK(encoded: DataFrame, centroids: Array[Seq[Float]],
                codebooks: Array[Array[Array[Double]]], idCol: String,
                query: Seq[Float], kTop: Int, nProbe: Int = 4): DataFrame = {
    val cells = nearestCells(centroids, query, nProbe)
    pqTopK(encoded.filter(col("__cell").isin(cells: _*)),
      codebooks, idCol, query, kTop)
  }

  /** Read + probe a persisted IVF-PQ index (see [[ivfPqWriteIndex]];
    * centroids/codebooks load via [[ivfReadCentroids]] /
    * [[pqReadCodebooks]] on the same path). */
  def ivfPqReadTopK(spark: org.apache.spark.sql.SparkSession, path: String,
                    centroids: Array[Seq[Float]],
                    codebooks: Array[Array[Array[Double]]], idCol: String,
                    query: Seq[Float], kTop: Int, nProbe: Int = 4): DataFrame =
    ivfPqTopK(spark.read.parquet(path), centroids, codebooks, idCol,
      query, kTop, nProbe)

  /** Int8 scalar quantization: per-vector (min, scale) affine codes —
    * the memory-bandwidth scale path for ANN (a float32 corpus shrinks
    * 4×; at 100 TB the scan is bandwidth-bound, so that is a 4× scan
    * speedup before any algorithmic gain). Codes are
    * `clamp(floor((x - lo) / scale), 0, 255)` with `scale =
    * (hi - lo)/255`; a constant vector (hi == lo) codes to all-zeros.
    *
    * Alongside the codes, the per-row code sums `q_csum = Σc_i` and
    * `q_csum2 = Σc_i²` are STORED (the stored-norm pattern): the
    * asymmetric probe's reconstructed norm is pure scalar arithmetic
    * over them, so probing never re-walks the codes except for the one
    * query dot product. Both sums are integer-valued (≤ dim·255²) —
    * exactly representable in doubles, so they are engine-reproducible
    * with NO float-ordering caveat.
    *
    * Everything is element-wise double arithmetic in a fixed order —
    * bit-reproducible by any engine evaluating the same formula (the
    * DuckDB oracle hash-matches codes AND probe scores). Projections
    * are staged so the min/max/scale aliases are multi-referenced and
    * CollapseProject keeps them materialized — re-inlined into the
    * transform lambda they would re-reduce the vector per ELEMENT
    * (interpreted HOF lambdas re-evaluate bound expressions). */
  def quantizeInt8(df: DataFrame, vecCol: String, idCol: String): DataFrame = {
    val staged = df.select(col(idCol), col(vecCol).as("__v"),
      array_min(col(vecCol)).cast("double").as("q_lo"),
      ((array_max(col(vecCol)).cast("double") -
        array_min(col(vecCol)).cast("double")) / 255.0).as("q_scale"))
    val coded = staged.select(col(idCol), col("q_lo"), col("q_scale"),
      when(col("q_scale") > 0.0,
        transform(col("__v"), x => least(lit(255), greatest(lit(0),
          floor((x.cast("double") - col("q_lo")) / col("q_scale")).cast("int")))))
        .otherwise(transform(col("__v"), _ => lit(0))).as("q_codes"))
    val codesD = col("q_codes").cast("array<double>")
    coded.select(col(idCol), col("q_lo"), col("q_scale"), col("q_codes"),
      dot(codesD, array_repeat(lit(1.0), size(col("q_codes")))).as("q_csum"),
      dot(codesD, codesD).as("q_csum2"))
  }

  /** Asymmetric top-k over an int8-quantized corpus (codes stay coded;
    * the query stays float): cosine against the AFFINE RECONSTRUCTION
    * `lo + c_i·scale`, decomposed so the per-row work is ONE kernel dot
    * product over the codes —
    *   dot(recon, q)  = lo·Σq + scale·dot(codes, q)
    *   |recon|²       = n·lo² + 2·lo·scale·Σc + scale²·Σc²
    * with Σc/Σc² read from the stored [[quantizeInt8]] columns and the
    * query-side constants folded on the driver. Same
    * TakeOrderedAndProject shape as [[bruteTopK]]. Score error vs exact
    * cosine is bounded by the quantization step (pinned in
    * PipelineSpec); ranking ties break on id. */
  def topKQuantized(qdf: DataFrame, idCol: String, query: Seq[Float],
                    k: Int): DataFrame = {
    val qd = query.map(_.toDouble)
    val sumQ = qd.sum
    val normQ = math.sqrt(qd.map(x => x * x).sum)
    val codesD = col("q_codes").cast("array<double>")
    val dotCQ = dot(codesD, typedLit(qd))
    val n = lit(qd.length.toDouble)
    val dotRQ = col("q_lo") * lit(sumQ) + col("q_scale") * dotCQ
    val norm2R = n * col("q_lo") * col("q_lo") +
      lit(2.0) * col("q_lo") * col("q_scale") * col("q_csum") +
      col("q_scale") * col("q_scale") * col("q_csum2")
    qdf.select(col(idCol), (dotRQ / (sqrt(norm2R) * lit(normQ))).as("cosine_q8"))
      .orderBy(col("cosine_q8").desc, col(idCol))
      .limit(k)
  }
}
