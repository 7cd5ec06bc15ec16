package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering: a linear (logistic) classifier trained
  * WITH Spark aggregations and applied as a pure column expression — the
  * CCNet/fastText-style "train a small model on labeled seeds, score the
  * whole corpus" recipe, re-expressed Spark-first.
  *
  * Scale shape, the part that matters at 100 TB:
  *   - featurization is a one-pass, map-only projection (every feature is
  *     portable string arithmetic — the exact formulas the q_text_quality
  *     oracle already verifies);
  *   - training featurizes the (usually sampled) labeled set ONCE into a
  *     compact (features, label) table — 7 doubles per row — and
  *     localCheckpoints it, then each gradient-descent iteration is ONE
  *     map-side-combined aggregate producing dim+1 sums; the driver holds
  *     only the weight vector (8 doubles), never any data;
  *   - scoring with trained weights is a literal-weight sigmoid — a pure
  *     codegen'd map pass with zero shuffle, oracle-checkable in any SQL
  *     engine (`q_classify_score`).
  *
  * Determinism: each gradient addend is cast to DECIMAL(30,15) before the
  * sum, making the per-iteration reduction EXACT and therefore independent
  * of partial-aggregation order — two trainings on the same data produce
  * byte-identical weights on any cluster size (pinned in ClassifierSpec).
  * The decimal cast truncates each addend at 1e-15 — far below any
  * gradient signal — and bounds: |err| < 1 and features are capped to
  * [0, 1], so DECIMAL(30,15) can never overflow at any corpus size
  * (10^15 rows of magnitude-1 addends fit in the 15 integer digits).
  *
  * Reference analogue: the reference ships heuristic quality formulas only
  * (see TextAnalysis.qualityScore); a trainable filter is part of the
  * beyond-reference LLM-pipeline surface.
  */
object Classifier {

  /** Number of features [[features]] produces; weights have length dim+1
    * (the last entry is the intercept). */
  val dim = 6

  /** Fixed interpretable feature vector, every entry in [0, 1] and every
    * entry portable SQL arithmetic (DuckDB-expressible — the scoring
    * oracle recomputes all six exactly):
    *   1. capped length            `least(len/1000, 1)`
    *   2. punctuation ratio        (TextAnalysis.punctRatio)
    *   3. English stopword ratio   (TextAnalysis.stopwordRatio "en")
    *   4. capped mean word length  `least(mean_wlen/10, 1)`
    *   5. digit character ratio
    *   6. uppercase character ratio
    */
  def features(textCol: Column): Column = {
    val t = coalesce(textCol, lit(""))
    val len = length(t).cast("double")
    // every ratio rides the one-pass text_stats kernel (digit/upper
    // included) — with codegen subexpression elimination the whole
    // vector costs ONE text_stats + ONE lang_scores call per row
    array(
      least(len / 1000.0, lit(1.0)),
      TextAnalysis.punctRatio(t),
      TextAnalysis.stopwordRatio(t, "en"),
      least(TextAnalysis.meanWordLength(t) / 10.0, lit(1.0)),
      TextAnalysis.digitRatio(t),
      TextAnalysis.upperRatio(t))
  }

  /** Linear score `sigmoid(w · x + b)` with LITERAL weights — a trained
    * model applied as a map-only expression. `weights` has length
    * [[dim]]+1; the last entry is the intercept. */
  def score(featCol: Column, weights: Seq[Double]): Column = {
    require(weights.length == dim + 1,
      s"weights must have length ${dim + 1} (dim + intercept), got ${weights.length}")
    val z = (0 until dim)
      .map(j => element_at(featCol, j + 1) * lit(weights(j)))
      .foldLeft(lit(weights(dim)).cast("double"))(_ + _)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** [[score]] over raw text in ONE column expression. Because the sigmoid
    * reads every feature, inlining [[features]] here duplicates the whole
    * feature computation once per weight — fine for tests/small data, but
    * the plan you want at scale is [[scored]], which materializes the
    * feature array in its own projection (Catalyst's CollapseProject
    * keeps a multiply-referenced non-trivial alias in its own Project, so
    * the features are computed once per row). */
  def scoreText(textCol: Column, weights: Seq[Double]): Column =
    score(features(textCol), weights)

  /** Score a corpus: features computed ONCE per row in a dedicated
    * projection, then the literal-weight sigmoid — two stacked map-only
    * projects, zero shuffle, whole-stage codegen'd. */
  def scored(df: DataFrame, textCol: String, weights: Seq[Double],
             outCol: String = "score"): DataFrame = {
    val fc = s"__feat_$textCol"
    df.withColumn(fc, features(col(textCol)))
      .withColumn(outCol, score(col(fc), weights))
      .drop(fc)
  }

  /** Train a logistic-regression quality classifier by full-batch gradient
    * descent. `labelCol` must evaluate to 0/1. Returns `dim+1` weights
    * (intercept last).
    *
    * Each iteration runs ONE aggregate over the checkpointed compact
    * feature table: `g_j = Σ (σ(w·x) − y)·x_j` summed as exact decimals
    * (order-independent → deterministic), then the driver applies
    * `w ← w − lr·(g/n + l2·w)`. At 100 TB train on a deterministic hash
    * sample ([[Sampling.splitLabel]]) — a linear model saturates long
    * before the full corpus — and score everything with [[score]]. */
  def trainLogistic(df: DataFrame, featCol: Column, labelCol: Column,
                    iters: Int = 30, lr: Double = 2.0,
                    l2: Double = 0.0): Array[Double] = {
    require(iters > 0, s"iters must be > 0, got $iters")
    val data = df.select(featCol.as("__x"), labelCol.cast("double").as("__y"))
      .localCheckpoint(true)
    try {
      val n = data.count().toDouble
      require(n > 0, "cannot train on an empty dataset")
      val w = Array.fill(dim + 1)(0.0)
      for (_ <- 1 to iters) {
        // error term in its own projection: the sigmoid is computed once
        // per row, not once per gradient component (CollapseProject keeps
        // the multiply-referenced alias separate)
        val errDf = data.select(col("__x"),
          (score(col("__x"), w.toSeq) - col("__y")).as("__e"))
        val aggs = (0 until dim).map(j =>
          sum((col("__e") * element_at(col("__x"), j + 1)).cast("decimal(30,15)"))) :+
          sum(col("__e").cast("decimal(30,15)"))
        val g = errDf.agg(aggs.head, aggs.tail: _*).head()
        for (j <- 0 to dim) {
          val gj = g.getDecimal(j).doubleValue() / n
          val reg = if (j < dim) l2 * w(j) else 0.0
          w(j) -= lr * (gj + reg)
        }
      }
      w
    } finally data.unpersist()
  }

  /** Trained weights as a small DataFrame (idx, name, weight) — the
    * shippable artifact (mirrors how Bpe.trainMerges returns the merge
    * table). Weight values are rounded to 9 decimals for presentation;
    * training itself is exact-decimal deterministic. */
  def weightTable(df: DataFrame, textCol: String, labelCol: Column,
                  iters: Int = 30, lr: Double = 2.0,
                  l2: Double = 0.0): DataFrame = {
    val w = trainLogistic(df, features(col(textCol)), labelCol, iters, lr, l2)
    val names = Seq("len_cap", "punct_ratio", "stopword_en", "mean_wlen_cap",
      "digit_ratio", "upper_ratio", "intercept")
    val spark = df.sparkSession
    import spark.implicits._
    w.toSeq.zipWithIndex
      .map { case (v, i) => (i, names(i), BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .toDF("idx", "name", "weight")
  }
}
