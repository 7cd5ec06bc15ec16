package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Cluster, Retrieval}

/** BM25 retrieval, token-window chunking, deterministic k-means. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // ---- BM25 ----------------------------------------------------------

  test("bm25 ranks the term-dense short document first and drops non-matches") {
    val df = Seq(
      (1L, "spark spark spark"),
      (2L, "spark and many other words diluting the match badly here now"),
      (3L, "nothing relevant at all in this one")).toDF("id", "text")
    val out = Retrieval.bm25TopK(df, "id", "text", Seq("spark"), k = 10)
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(0).getDouble(1) > out(1).getDouble(1))
  }

  test("bm25 multi-term scores sum per-term contributions (superset doc wins)") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta other words"),
      (3L, "alpha only here today")).toDF("id", "text")
    val out = Retrieval.bm25TopK(df, "id", "text", Seq("alpha", "beta"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(2L) > out(3L)) // two matching terms beat one at equal dl
  }

  test("bm25 idf discounts ubiquitous terms against rare ones") {
    // 'rare' appears in 1 of 6 docs, 'common' in all 6; equal tf and dl
    val docs = (1L to 5L).map(i => (i, "common filler words here")) :+
      (6L, "rare filler words here")
    val df = (docs :+ (7L, "common rare filler pad")).toDF("id", "text")
    val out = Retrieval.bm25TopK(df, "id", "text", Seq("rare", "common"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(6L) > out(1L)) // the rare-term doc outranks any common-only doc
  }

  // ---- chunking ------------------------------------------------------

  test("chunkByTokens without overlap reconstructs the token stream exactly") {
    val text = (1 to 53).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text)).toDF("id", "text")
    val chunks = Retrieval.chunkByTokens(df, "id", "text", chunkTokens = 10)
      .orderBy("chunk_id").collect()
    assert(chunks.length == 6) // 10+10+10+10+10+3
    assert(chunks.map(_.getAs[String]("chunk_text")).mkString(" ") == text)
    assert(chunks.map(_.getAs[Int]("chunk_tokens")).toSeq == Seq(10, 10, 10, 10, 10, 3))
    assert(chunks.map(_.getAs[Int]("chunk_id")).toSeq == (0 to 5))
  }

  test("chunkByTokens overlap repeats the window tail as the next head") {
    val text = (1 to 20).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text)).toDF("id", "text")
    val chunks = Retrieval.chunkByTokens(df, "id", "text", chunkTokens = 8, overlap = 3)
      .orderBy("chunk_id").collect()
    // stride 5: starts 0,5,10,15 -> lengths 8,8,8,5
    assert(chunks.map(_.getAs[Int]("chunk_tokens")).toSeq == Seq(8, 8, 8, 5))
    val first = chunks(0).getAs[String]("chunk_text").split(" ")
    val second = chunks(1).getAs[String]("chunk_text").split(" ")
    assert(first.takeRight(3).toSeq == second.take(3).toSeq)
  }

  test("chunkByTokens emits nothing for empty or whitespace-only documents") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "one two")).toDF("id", "text")
    val out = Retrieval.chunkByTokens(df, "id", "text", chunkTokens = 5).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(3L))
  }

  // ---- k-means -------------------------------------------------------

  private def vecs(rows: (Long, Seq[Float])*) = rows.toDF("id", "v")

  test("kmeans separates two obvious blobs and labels by lowest-id init") {
    val df = vecs(
      1L -> Seq(0f, 0f), 2L -> Seq(0.1f, 0f), 3L -> Seq(0f, 0.1f),
      10L -> Seq(5f, 5f), 11L -> Seq(5.1f, 5f), 12L -> Seq(5f, 5.1f))
    val out = Cluster.kmeansAssign(df, "v", "id", k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // init: ids 1 (cluster 0) and 2 (cluster 1); after convergence the
    // far blob must be uniform and distinct from the near blob
    assert(Set(out(1L), out(2L), out(3L)).size == 1 ||
      Set(out(10L), out(11L), out(12L)).size == 1)
    assert(out(1L) != out(10L))
    assert(out(10L) == out(11L) && out(11L) == out(12L))
  }

  test("kmeans end-to-end is deterministic across runs") {
    val emb = sf("embeddings")
    val out = Cluster.kmeansAssign(emb, "embedding", "vec_id", k = 4, iters = 2)
    val again = Cluster.kmeansAssign(emb, "embedding", "vec_id", k = 4, iters = 2)
    assert(out.orderBy("vec_id").collect().toSeq ==
      again.orderBy("vec_id").collect().toSeq)
  }

  test("kmeans is invariant to input partitioning (decimal-exact means)") {
    val emb = sf("embeddings").limit(100)
    val a = Cluster.kmeansAssign(emb.repartition(1), "embedding", "vec_id", k = 3, iters = 2)
      .orderBy("vec_id").collect().toSeq
    val b = Cluster.kmeansAssign(emb.repartition(7), "embedding", "vec_id", k = 3, iters = 2)
      .orderBy("vec_id").collect().toSeq
    assert(a == b)
  }

  test("kmeans keeps the previous centroid for an emptied cluster") {
    // identical init points: round 1 ties every row to cluster 0, so
    // cluster 1 is EMPTY that round and must keep its (1,1) centroid
    // without crashing; in round 2 that kept centroid reclaims the exact
    // (1,1) points while the drifted cluster-0 mean keeps the outlier
    val df = vecs(1L -> Seq(1f, 1f), 2L -> Seq(1f, 1f), 3L -> Seq(1.1f, 1f))
    val out = Cluster.kmeansAssign(df, "v", "id", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(1L) == out(2L) && out(3L) != out(1L))
  }

  test("kmeansSummary sizes sum to the corpus and mean_dist2 is nonnegative") {
    val emb = sf("embeddings")
    val s = Cluster.kmeansSummary(emb, "embedding", "vec_id", k = 4, iters = 1)
      .collect()
    assert(s.map(_.getAs[Long]("n")).sum == emb.count())
    assert(s.forall(_.getAs[Double]("mean_dist2") >= 0.0))
  }
}
