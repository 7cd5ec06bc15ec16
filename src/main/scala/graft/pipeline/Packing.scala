package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining: assign each document a position in a
  * fixed-token-budget training-sequence stream ("concat and chunk" — the
  * standard GPT-style data loader layout where documents are concatenated
  * in a stable order and the stream is cut every `budget` tokens).
  *
  * The assignment is pure arithmetic over a running token total, so it is
  * reproducible on any engine and SQL-oracle-checkable: a document's pack
  * is `floor(start / budget)` where `start` is the token count of
  * everything before it in its shard's stream. A document may straddle a
  * pack boundary — `pack_offset` (= `start % budget`) tells the loader
  * where inside the pack it begins, which is exactly the information a
  * chunking data loader needs.
  *
  * Scale shape (100 TB): the running total is a window sum PARTITIONED BY
  * SHARD (source/domain/file), so the sort is per-shard, not global —
  * shards process in parallel and no single-partition global scan exists.
  * Packing an entire corpus as ONE stream would serialize it through one
  * partition; shard-relative packing is what a multi-host data loader
  * consumes anyway (each host reads its shards independently).
  */
object Packing {

  /** Add `pack_id` / `pack_offset` / `n_tokens` columns.
    *
    * @param tokensCol integer token count per row (any tokenizer — pair
    *                  with [[TextAnalysis.tokenCountWs]] or the BPE-ish
    *                  counter for text columns)
    * @param shardCol  stream partition key (e.g. source); packing is
    *                  independent per shard
    * @param orderCol  stable within-shard order (e.g. doc id) — must be
    *                  unique per shard for a deterministic stream
    * @param budget    tokens per training sequence, e.g. 2048
    */
  /** Padding-waste report: how many padded cells a fixed-size batching of
    * the corpus burns under (a) arrival-order batching vs (b)
    * length-sorted bucketing — the "sort by length before batching"
    * training-efficiency decision, quantified. Each strategy assigns a
    * global batch id from a DISTRIBUTED row number
    * ([[graft.ops.WarpOps.WarpDataFrame.rankDistributed]] — no
    * single-partition window), then per batch the padded cell count is
    * `rows_in_batch × batch_max_tokens`; one summary row per strategy.
    * All integer until the final rounded ratio. */
  def padWasteReport(df: DataFrame, idCol: Column, tokensCol: Column,
                     batchSize: Int): DataFrame = {
    require(batchSize > 0, s"batchSize must be > 0, got $batchSize")
    import graft.ops.WarpOps._
    val base = df
      .select(idCol.cast("long").as("id"),
        coalesce(tokensCol.cast("long"), lit(0L)).as("toks"))
      .filter(col("id").isNotNull)
    def strat(name: String, orders: Seq[Order]): DataFrame =
      base.rankDistributed(Seq(RunningAgg.RCount("rn")), orders)
        .withColumn("batch", floor((col("rn") - 1) / batchSize))
        .groupBy("batch")
        .agg(count(lit(1)).as("n"), max(col("toks")).as("mx"),
          sum(col("toks")).as("tk"))
        .agg(count(lit(1)).as("n_batches"), sum(col("n")).as("n_docs"),
          sum(col("tk")).as("token_sum"),
          sum(col("n") * col("mx")).as("padded_cells"))
        .select(lit(name).as("strategy"), col("n_docs"), col("n_batches"),
          col("token_sum"), col("padded_cells"),
          graft.pipeline.TextAnalysis.ratioDouble9(
            col("padded_cells") - col("token_sum"), col("padded_cells"))
            .as("waste_ratio"))
    strat("arrival", Seq(Order(col("id"))))
      .unionByName(strat("sorted", Seq(Order(col("toks")), Order(col("id")))))
  }

  def packSequences(df: DataFrame, tokensCol: Column, shardCol: Column,
                    orderCol: Column, budget: Int): DataFrame = {
    require(budget > 0, s"pack budget must be positive, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val toks = tokensCol.cast("long")
    val start = sum(toks).over(w) - toks
    df.withColumn("n_tokens", toks)
      .withColumn("pack_id", floor(start / budget))
      .withColumn("pack_offset", (start % budget).cast("long"))
  }
}
