package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Classifier

/** Trainable logistic quality classifier: convergence on separable data,
  * byte-identical determinism, regularization shrinkage, and the literal-
  * weight scoring formula. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // Two clearly separable styles: "good" English prose (stopwords, mixed
  // case, moderate punctuation) vs "junk" (digit/symbol-heavy shouting).
  private def corpus = {
    val good = (1 to 40).map(i =>
      (i.toLong, s"The quick brown fox number $i jumps over the lazy dog and it was a fine day in the field.", 1.0))
    val junk = (41 to 80).map(i =>
      (i.toLong, s"$i$i$i !!! BUY NOW $i%%% 0000 CLICK $i###### WIN ${i * 7} $$$$ 111 222 333 !!!", 0.0))
    (good ++ junk).toDF("id", "text", "label")
  }

  test("training separates good prose from junk (accuracy >= 0.95)") {
    val df = corpus
    val w = Classifier.trainLogistic(df, Classifier.features(col("text")), col("label"))
    assert(w.length == Classifier.dim + 1)
    val acc = Classifier.scored(df, "text", w.toSeq)
      .select((when(col("score") > 0.5, 1.0).otherwise(0.0) === col("label"))
        .cast("double").as("hit"))
      .agg(avg("hit")).head().getDouble(0)
    assert(acc >= 0.95, s"expected >= 0.95 accuracy on separable styles, got $acc")
    // the stopword feature must push toward "good": its weight is positive
    assert(w(2) > 0.0, s"stopword_en weight should be positive, got ${w(2)}")
  }

  test("training is byte-identical across runs (exact-decimal gradients)") {
    val df = corpus
    val w1 = Classifier.trainLogistic(df, Classifier.features(col("text")), col("label"), iters = 10)
    val w2 = Classifier.trainLogistic(df, Classifier.features(col("text")), col("label"), iters = 10)
    assert(w1.toSeq == w2.toSeq)
    // and across a different partitioning of the same rows
    val w3 = Classifier.trainLogistic(df.repartition(7), Classifier.features(col("text")), col("label"), iters = 10)
    assert(w1.toSeq == w3.toSeq)
  }

  test("L2 regularization shrinks the weight norm") {
    val df = corpus
    def norm(w: Array[Double]) = math.sqrt(w.take(Classifier.dim).map(x => x * x).sum)
    val free = Classifier.trainLogistic(df, Classifier.features(col("text")), col("label"), iters = 15)
    val reg = Classifier.trainLogistic(df, Classifier.features(col("text")), col("label"), iters = 15, l2 = 0.5)
    assert(norm(reg) < norm(free))
  }

  test("score is the literal-weight sigmoid over the feature vector") {
    val w = Seq(0.5, -1.0, 2.0, 0.25, -0.75, 1.5, -0.1)
    val df = Seq((Seq(0.2, 0.1, 0.3, 0.4, 0.0, 0.05))).toDF("x")
    val got = df.select(Classifier.score(col("x"), w)).head().getDouble(0)
    val z = (0 until 6).map(j => w(j) * df.head().getSeq[Double](0)(j)).sum + w(6)
    assert(math.abs(got - 1.0 / (1.0 + math.exp(-z))) < 1e-12)
  }

  test("weightTable returns the shippable artifact with named rows") {
    val t = Classifier.weightTable(corpus, "text", col("label"), iters = 5)
      .orderBy("idx").collect()
    assert(t.length == Classifier.dim + 1)
    assert(t.map(_.getAs[String]("name")).toSeq ==
      Seq("len_cap", "punct_ratio", "stopword_en", "mean_wlen_cap",
        "digit_ratio", "upper_ratio", "intercept"))
  }

  test("features are null-safe and bounded to [0, 1]") {
    val df = Seq(Some("Hello World 42!"), Some(""), None).toDF("text")
    val rows = df.select(Classifier.features(col("text")).as("f")).collect()
    rows.foreach { r =>
      val f = r.getSeq[Double](0)
      assert(f.length == Classifier.dim)
      f.foreach(v => assert(v >= 0.0 && v <= 1.0, s"feature out of range: $f"))
    }
  }

  // ---- evaluation suite -------------------------------------------------

  private def auc(df: org.apache.spark.sql.DataFrame, buckets: Int = 1024) =
    Classifier.aucReport(df, col("s"), col("y"), buckets).head()

  test("aucReport: perfect separation is 1.0, inverted is 0.0, constant is 0.5") {
    val sep = (Seq.tabulate(20)(i => (0.8 + i * 0.001, 1L)) ++
      Seq.tabulate(30)(i => (0.1 + i * 0.001, 0L))).toDF("s", "y")
    val r = auc(sep)
    assert(r.getAs[Long]("npos") == 20 && r.getAs[Long]("nneg") == 30)
    assert(r.getAs[Double]("auc") == 1.0)
    val inv = sep.select(col("s"), (lit(1L) - col("y")).as("y"))
    assert(auc(inv).getAs[Double]("auc") == 0.0)
    // all scores tied: every pair is a half-win regardless of labels
    val const = Seq((0.5, 1L), (0.5, 1L), (0.5, 0L), (0.5, 0L), (0.5, 0L))
      .toDF("s", "y")
    assert(auc(const).getAs[Double]("auc") == 0.5)
  }

  test("aucReport matches the O(n^2) pair definition with ties present") {
    val data = Seq(
      (0.9, 1L), (0.8, 0L), (0.8, 1L), (0.7, 1L), (0.7, 0L), (0.7, 0L),
      (0.4, 1L), (0.4, 0L), (0.2, 0L), (0.1, 1L), (0.1, 0L), (0.05, 0L))
    val pos = data.filter(_._2 == 1L).map(_._1)
    val neg = data.filter(_._2 == 0L).map(_._1)
    val pairs = for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0
    val want = pairs.sum / (pos.size * neg.size)
    val got = auc(data.toDF("s", "y")).getAs[Double]("auc")
    assert(math.abs(got - want) < 1e-9, s"got $got want $want")
  }

  test("aucReport is invariant to bucket count and input partitioning") {
    val df = corpus
    val sc = Classifier.scored(df, "text",
      Seq(1.0, -2.0, 4.0, 1.0, -3.0, -2.0, -1.0))
      .select(round(col("score"), 6).as("s"), col("label").cast("long").as("y"))
    val a1 = auc(sc, buckets = 1)
    val a2 = auc(sc, buckets = 1024)
    val a3 = auc(sc.repartition(13), buckets = 64)
    assert(a1.getAs[Double]("auc") == a2.getAs[Double]("auc"))
    assert(a1.getAs[Double]("auc") == a3.getAs[Double]("auc"))
    // separable corpus: the demo weights should rank well above chance
    assert(a1.getAs[Double]("auc") > 0.9)
  }

  test("aucReport: NaN/null scores and null labels are excluded; empty class -> null auc") {
    val df = Seq((Some(0.9), Some(1L)), (Some(Double.NaN), Some(0L)),
      (None: Option[Double], Some(0L)), (Some(0.2), None: Option[Long]),
      (Some(0.3), Some(0L))).toDF("s", "y")
    val r = auc(df)
    assert(r.getAs[Long]("npos") == 1 && r.getAs[Long]("nneg") == 1)
    assert(r.getAs[Double]("auc") == 1.0)
    val onlyPos = Seq((0.9, 1L), (0.8, 1L)).toDF("s", "y")
    assert(auc(onlyPos).isNullAt(2))
  }

  test("calibrationReport: fixed bins with exact counts, means and pos rates") {
    val df = Seq((0.05, 0L), (0.08, 0L), (0.55, 1L), (0.58, 0L), (0.95, 1L),
      (1.0, 1L)).toDF("s", "y")
    val rows = Classifier.calibrationReport(df, col("s"), col("y"))
      .orderBy("bin").collect()
    assert(rows.map(_.getAs[Int]("bin")).toSeq == Seq(0, 5, 9))
    val b0 = rows(0)
    assert(b0.getAs[Long]("n") == 2 && b0.getAs[Double]("pos_rate") == 0.0)
    assert(math.abs(b0.getAs[Double]("mean_score") - 0.065) < 1e-9)
    // score exactly 1.0 clamps into the top bin instead of bin 10
    val b9 = rows(2)
    assert(b9.getAs[Long]("n") == 2 && b9.getAs[Double]("pos_rate") == 1.0)
  }

  test("thresholdReport: one-pass sweep matches per-threshold filters, guards empty cuts") {
    val df = Seq((0.9, 1L), (0.7, 0L), (0.6, 1L), (0.3, 0L), (0.1, 1L))
      .toDF("s", "y")
    val rows = Classifier.thresholdReport(df, col("s"), col("y"),
      Seq(0.5, 0.95)).orderBy("threshold").collect()
    val at05 = rows(0)
    assert(at05.getAs[Long]("predicted") == 3 && at05.getAs[Long]("tp") == 2)
    assert(math.abs(at05.getAs[Double]("precision") - 2.0 / 3) < 1e-9)
    assert(math.abs(at05.getAs[Double]("recall") - 2.0 / 3) < 1e-9)
    assert(math.abs(at05.getAs[Double]("f1") - 2.0 / 3) < 1e-9)
    // nothing above 0.95: precision must be NULL, not Infinity/NaN
    val at95 = rows(1)
    assert(at95.getAs[Long]("predicted") == 0)
    assert(at95.isNullAt(at95.fieldIndex("precision")))
    assert(at95.getAs[Double]("recall") == 0.0)
  }
}
