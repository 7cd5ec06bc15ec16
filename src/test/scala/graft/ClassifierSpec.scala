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
}
