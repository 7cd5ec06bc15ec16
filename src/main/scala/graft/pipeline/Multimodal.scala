package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns plus a typed metadata struct, with decode / feature-extract /
  * frame-sample operators whose SPARK SIDE (schema, batching, partition
  * shape) is real and tested, while the codec itself is a clearly-marked
  * deterministic STUB — the actual image/audio libraries are not in this
  * container (and on a real cluster would be swapped in per-executor).
  *
  * Design points for 100 TB:
  *  - binary payloads never pass through the driver; all operators are
  *    `mapPartitions` over executor-local batches, the Scala analog of
  *    `mapInPandas` (one decode context per partition, amortized).
  *  - metadata lives in a separate struct column so pruning a query to
  *    metadata-only never reads the blob bytes from parquet (columnar
  *    projection does this for free).
  *  - decoded features come back as fixed-width `array<float>` so the
  *    downstream similarity operators (see [[Similarity]]) apply directly.
  */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("data", BinaryType),
    StructField("meta", mediaMetaType)))

  /** Wrap an existing table into the media schema, treating a string
    * column's bytes as the payload (used by tests to fabricate media).
    * Metadata derives from the payload length with plain arithmetic so an
    * external SQL oracle can reproduce it. */
  def fabricate(df: DataFrame, idCol: String, payloadCol: String, format: String): DataFrame = {
    val len = length(col(payloadCol)).cast(LongType)
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      encode(col(payloadCol), "UTF-8").as("data"),
      struct(
        lit(format).as("format"),
        ((len * 7) % 1920 + 1).cast(IntegerType).as("width"),
        ((len * 13) % 1080 + 1).cast(IntegerType).as("height"),
        ((len * 131) % 600000).as("duration_ms")).as("meta"))
  }

  // ======================================================================
  // STUB CODEC — deterministic fake standing in for libjpeg/ffmpeg/etc.
  // Real deployment swaps `decodeStub` for the native decoder; everything
  // around it (batching, schema, partitioning) is production-shaped.
  // ======================================================================

  /** STUB: "decode" bytes to a dim-sized float feature vector by seeding a
    * PRNG from the content hash. Deterministic per payload. */
  private[pipeline] def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val seed = java.util.Arrays.hashCode(bytes).toLong
    val rnd = new scala.util.Random(seed)
    Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
  }

  /** Feature extraction: one decoder context per PARTITION (the expensive
    * init a real codec needs), then batch-decode rows through it. This is
    * the `mapInPandas` shape in Scala: executor-local, no driver traffic.
    * Runs as a Dataset `mapPartitions` (NOT an RDD detour): the plan stays
    * a single Catalyst node, so column pruning below, AQE above, and the
    * Tungsten binary format end-to-end are all preserved. */
  def extractFeatures(df: DataFrame, dim: Int = 64): DataFrame = {
    val outSchema = df.schema.add(StructField("features", ArrayType(FloatType)))
    val dataIdx = df.schema.fieldIndex("data")
    df.mapPartitions { rows =>
      // real codec would be initialized HERE, once per partition
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](dataIdx)
        val feat = if (bytes == null) null else decodeStub(bytes, dim)
        Row.fromSeq(r.toSeq :+ feat)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Frame sampling: emit `n` evenly-spaced "frames" per video payload —
    * one output row per frame (explode shape). Frame bytes are STUB
    * slices; offsets/indices are the real contract. */
  def sampleFrames(df: DataFrame, n: Int): DataFrame = {
    // n=0 would make sequence(0, -1) count DOWN ([0, -1]: two bogus
    // frames) and the ts_ms division ANSI-throw
    require(n > 0, s"sampleFrames needs n > 0 frames, got $n")
    val frames = transform(sequence(lit(0), lit(n - 1)), i =>
      struct(
        i.as("frame_idx"),
        // integral milliseconds (floor): the metadata contract is LongType
        // offsets, not fractional doubles
        floor(i * coalesce(col("meta.duration_ms"), lit(0L)) / n)
          .cast("long").as("ts_ms"),
        // STUB: a real implementation decodes the frame at ts_ms
        substring(col("data"), 1, 16).as("frame_data")))
    df.select(col("media_id"), explode(frames).as("frame"))
      .select(col("media_id"), col("frame.frame_idx"), col("frame.ts_ms"), col("frame.frame_data"))
  }

  /** Resize: metadata-level transform (real systems rewrite the payload;
    * the STUB rewrites dimensions and tags the format). Shows the
    * "metadata-only plan never touches blobs" property — this projection
    * reads zero payload bytes from parquet. */
  def resizeMeta(df: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val w = col("meta.width"); val h = col("meta.height")
    val scale = least(lit(maxW).cast("double") / w, lit(maxH).cast("double") / h, lit(1.0))
    df.withColumn("meta", struct(
      concat(col("meta.format"), lit("-resized")).as("format"),
      // round, not floor: 640/1920 as a double is a hair BELOW 1/3, so
      // floor would undersize the limiting dimension (639x359 for a
      // 1920x1080 input bounded to 640x480)
      round(w * scale).cast(IntegerType).as("width"),
      round(h * scale).cast(IntegerType).as("height"),
      col("meta.duration_ms").as("duration_ms")))
  }
}
