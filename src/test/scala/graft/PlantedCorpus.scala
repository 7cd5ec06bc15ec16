package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import java.nio.file.{Files, Path, Paths}

/** Deterministic NON-degenerate documents corpus for local text-operator
  * falsifiability (VERDICT r12 item 5) — see [[PlantedCorpusSpec]] for
  * the rationale. Built at a fixed path so `Test/runMain graft.OneOff
  * <query> /tmp/graft_planted` replays a single entry against it during
  * triage. The dir holds a planted `documents.parquet` plus symlinks to
  * the other nine sf0.001 tables, so ANY catalog entry runs against it.
  */
object PlantedCorpus {
  val fixedPath = "/tmp/graft_planted"

  /** (doc_id, text, lang, source); every q_diag_profile feature present. */
  def docs: Seq[(java.lang.Long, String, String, String)] = {
    val base = Seq(
      // normal mixed-case prose with digits + punctuation
      "The quick Brown Fox jumps over 42 lazy dogs, twice daily.",
      "Model training used 8x100 nodes for 3.5 days (v2 run).",
      "Rain in SPAIN falls MAINLY on the plain -- 1967 survey!",
      // heavy uppercase / acronym
      "NASA AND IBM SIGNED THE 1981 MOU IN D.C. HEADQUARTERS",
      // digit-dense
      "0123456789 86400 3600 1024 65535 2147483647 9000000000",
      // tabs, CR, LF, VT, FF embedded
      "col1\tcol2\tcol3\nrow1\t1\t2\rrow234",
      // 2-byte UTF-8 accents
      "café naïve résumé über jalapeño",
      // 3-byte CJK
      "中文文本处理 模型训练 数据集",
      // 4-byte supplementary (music, math, emoji)
      "clef 𝄞 math 𝕊 face 😀 done",
      // NFD combining marks (a+acute, e+grave)
      "nfd áccent èxample ö umlaut",
      // Cyrillic + Greek
      "привет мир αβγ Δελτα",
      // unicode whitespace: NBSP, en-space, ideographic space
      "nbsp word en space ideo　space",
      // ASCII control char (SOH) + DEL
      "ctlchar delchar end",
      // punctuation-dense
      "<html> { \"key\": [1, 2, 3]; } #tag @user ~50% $9.99 a=b|c",
      // long repeat (repetition / boilerplate detectors)
      "spam ham " * 40,
      // short
      "ok")
    val sources = Seq("src0", "src1", "src2", "src3")
    val langs = Seq("en", "de", "zh")
    val rows = scala.collection.mutable.ArrayBuffer.empty[(java.lang.Long, String, String, String)]
    var id = 0L
    for (s <- sources.indices; l <- langs.indices; (t, i) <- base.zipWithIndex
         if (i + s + l) % 3 == 0) { // ~1/3 of combos: 64 rows, all features kept
      rows += ((Long.box(id), t, langs(l), sources(s)))
      id += 10
    }
    // exact duplicate pair + near-duplicate pair (dedup family fodder)
    rows += ((Long.box(id), base.head, "en", "src1")); id += 10
    rows += ((Long.box(id), base.head.replace("twice", "thrice"), "en", "src2")); id += 10
    rows += ((Long.box(id), base(1), "de", "src3")); id += 10
    // NULL text, empty text, whitespace-only text, NULL lang
    rows += ((Long.box(id), null, "en", "src0")); id += 10
    rows += ((Long.box(id), "", "de", "src1")); id += 10
    rows += ((Long.box(id), " \t\n  ", "zh", "src2")); id += 10
    rows += ((Long.box(id), "plain text with no language tag", null, "src3"))
    rows.toSeq
  }

  /** Writes documents.parquet (single file, testdata layout) + symlinks
    * the other 9 sf0.001 tables into `dir`; rebuilds from scratch. */
  def build(spark: SparkSession, dir: Path): Path = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory && !Files.isSymbolicLink(f.toPath))
        Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(dir.toFile)
    Files.createDirectories(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rows = docs.map { case (id, t, l, s) =>
      val n: java.lang.Long =
        if (t == null) null else Long.box(t.codePointCount(0, t.length).toLong)
      Row(id, t, l, s, n)
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val stage = dir.resolve("stage")
    df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = Files.list(stage).filter(_.toString.endsWith(".parquet"))
      .findFirst().orElseThrow()
    Files.move(part, dir.resolve("documents.parquet"))
    rm(stage.toFile)
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings"))
      Files.createSymbolicLink(dir.resolve(s"$t.parquet"),
        Paths.get(s"/root/testdata/sf0.001/$t.parquet"))
    dir
  }

  /** Build at the fixed path (for OneOff-style manual triage). */
  def ensure(spark: SparkSession): Path = build(spark, Paths.get(fixedPath))
}
