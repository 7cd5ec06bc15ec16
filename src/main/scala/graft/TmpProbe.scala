package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.WarpOps._
object TmpProbe {
  def t[A](name: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"PROBE $name ${(System.nanoTime()-t0)/1e9}%.2f"); r }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val near = docs.warpFilter(col("doc_id") < 50).calculate(Seq(
      "doc_id" -> (col("doc_id") + 100000),
      "text" -> concat(col("text"), lit(" zz yy xx"))))
    val all = docs.warpUnion(near)
    t("count")(all.count())
    val shTab = all.select(col("doc_id").as("id"), array_distinct(graft.pipeline.Dedup.shingles(col("text"), 5)).as("sh"))
    t("shingles-noop")(shTab.write.mode("overwrite").format("noop").save())
    val exploded = shTab.select(col("id"), explode(col("sh")).as("s")).select(col("id"), xxhash64(col("s")).as("h"))
    t("explode-count")(exploded.count())
    val sig = exploded.groupBy("id").agg(array((0 until 64).map(i => min(xxhash64(col("h"), lit(i)))): _*).as("sig"))
    t("sig-noop")(sig.write.mode("overwrite").format("noop").save())
    t("full-pairs")(graft.pipeline.Dedup.minhashPairs(all, "text", "doc_id", 5, 64, 16, 0.5)
      .write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
