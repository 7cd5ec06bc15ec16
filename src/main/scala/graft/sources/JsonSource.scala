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
    // Shape-detect on the first lines of the (first) file, like the
    // reference's whole-doc JSONSerialization pass — a driver-side peek,
    // not a data scan. JSON-Lines = 2+ non-empty lines, EACH a complete
    // JSON value on its own (validated with Jackson, not a prefix guess).
    val head = spark.read.text(path).limit(10).collect()
      .map(_.getString(0).trim).filter(_.nonEmpty)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def selfContained(l: String): Boolean =
      try { mapper.readTree(l); true } catch { case _: Exception => false }
    val jsonl = head.length > 1 && head.forall(selfContained)
    val firstNonEmpty = head.headOption.getOrElse("")

    if (jsonl && firstNonEmpty.startsWith("{")) {
      spark.read.json(path) // object per line: splittable, parallel
    } else if (jsonl) {
      // scalar/array per line: one "value" row per line (arrays kept as
      // their JSON text — the reference has no JSONL notion at all)
      spark.read.text(path).select(trim(col("value")).as("value"))
        .filter(length(col("value")) > 0)
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
          // bare scalar: decode through the JSON reader so "hello" loses
          // its quotes like array elements do; non-JSON text passes raw
          .otherwise(array(coalesce(
            get_json_object(trim(col("value")), "$"),
            trim(col("value")))))).as("value"))
  }

  /** Write as JSON-Lines (the scale-friendly exchange shape). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
