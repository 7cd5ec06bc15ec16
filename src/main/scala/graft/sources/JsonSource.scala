package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON source with the reference's whole-document shape detection
  * (reference: WarpConduit/Sources/JSONStream.swift:16-168): a document is
  * read as
  *  - array of objects  -> one row per object, columns from the keys;
  *  - array of values   -> one row per value, single column "value";
  *  - single object     -> one row;
  *  - single value      -> one 1x1 table ("value").
  *
  * Additionally (beyond the reference) JSON-Lines input — the shape a
  * 100 TB corpus actually ships in — is detected and read with Spark's
  * splittable line-per-record scan; the whole-document shapes necessarily
  * parse per file (`multiLine`), exactly like the reference's whole-doc
  * parser. */
object JsonSource {

  def read(spark: SparkSession, path: String): DataFrame = {
    // Shape-detect on the first bytes of the (first) file, like the
    // reference's whole-doc JSONSerialization pass — a driver-side peek,
    // not a data scan.
    val head = spark.read.text(path).limit(10).collect().map(_.getString(0))
    val firstNonEmpty = head.find(_.trim.nonEmpty).map(_.trim).getOrElse("")
    val jsonl = firstNonEmpty.startsWith("{") &&
      head.count(l => l.trim.startsWith("{") && l.trim.endsWith("}")) > 1

    if (jsonl) {
      spark.read.json(path) // line-per-record: splittable, parallel
    } else if (firstNonEmpty.startsWith("{") || firstNonEmpty.startsWith("[")) {
      val std = spark.read.option("multiLine", "true").json(path)
      val cols = std.columns
      if (cols.nonEmpty && !(cols.length == 1 && cols(0).startsWith("_corrupt"))) std
      else readValueArray(spark, path) // array-of-values: [1, "x", ...]
    } else {
      readValueArray(spark, path) // bare scalar document
    }
  }

  /** Array-of-values / single-value documents: one "value" column. */
  private def readValueArray(spark: SparkSession, path: String): DataFrame = {
    val whole = spark.read.option("wholetext", "true").text(path)
    val asArray = whole.select(
      from_json(col("value"), ArrayType(StringType)).as("arr"),
      col("value"))
    asArray.select(
      explode(
        when(col("arr").isNotNull, col("arr"))
          .otherwise(array(trim(col("value"))))).as("value"))
  }

  /** Write as JSON-Lines (the scale-friendly exchange shape). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
