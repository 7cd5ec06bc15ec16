package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-row HTTP crawl step (reference:
  * Warp/Sources/Model/Steps/QBECrawlStep.swift:16-60,232): a URL per row,
  * fetched with bounded concurrency (reference: 50 in flight) and a rate
  * cap (reference: 256 requests/s), producing body/status/error/time
  * columns.
  *
  * Spark shape: `mapPartitions` over the Dataset (staying on the Dataset
  * API — no RDD detour, AQE intact), one connection pool per partition.
  * The rate cap is enforced per partition at `maxRps / numPartitions` —
  * at scale a global limiter needs an external token service, which is
  * out of engine scope (same trade the reference makes per-process).
  *
  * The fetcher is pluggable. The default is an OFFLINE DETERMINISTIC STUB
  * (this environment has no egress): status 200, body "stub:" + md5(url).
  * A real deployment plugs in an HTTP client here; everything else —
  * batching, concurrency, schema — is the production shape.
  */
object Crawl {

  /** url => (status, body, error) */
  type Fetcher = String => (Int, String, Option[String])

  val stubFetcher: Fetcher = { url =>
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(url.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (200, s"stub:$hex", None)
  }

  def crawl(df: DataFrame, urlCol: String,
            fetcher: Fetcher = stubFetcher,
            maxConcurrency: Int = 50, maxRps: Int = 256,
            fetchTimeoutSec: Int = 120): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = inSchema
      .add("crawl_status", IntegerType)
      .add("crawl_body", StringType)
      .add("crawl_error", StringType)
      .add("crawl_time", DoubleType)
    val urlIdx = inSchema.fieldIndex(urlCol)
    require(maxRps > 0, "maxRps must be positive")
    val partitions = math.max(1, df.rdd.getNumPartitions)
    // fractional per-partition rates are fine (launch spacing > 1 s); a
    // 1-rps floor would let the AGGREGATE rate exceed maxRps whenever
    // partitions > maxRps
    val rpsPerPartition = maxRps.toDouble / partitions

    df.mapPartitions { rows =>
      import scala.concurrent.{Await, Future, ExecutionContext}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.max(1, maxConcurrency))
      // the task may stop pulling mid-iterator (limit/abort): tie pool
      // shutdown to task completion, not iterator exhaustion
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => pool.shutdown()))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val minNanosPerReq = (1e9 / rpsPerPartition).toLong
      var lastLaunch = 0L

      val out = rows.grouped(math.max(1, maxConcurrency)).flatMap { batch =>
        // launch the whole window concurrently, pacing launches to the cap
        val futures = batch.map { r =>
          val wait = lastLaunch + minNanosPerReq - System.nanoTime()
          if (wait > 0) Thread.sleep(wait / 1000000, (wait % 1000000).toInt)
          lastLaunch = System.nanoTime()
          val url = r.getString(urlIdx)
          val t0 = System.nanoTime()
          r -> Future {
            val res =
              try fetcher(url)
              catch { case e: Throwable => (0, null: String, Some(e.toString)) }
            (res, (System.nanoTime() - t0) / 1e9)
          }
        }
        // ONE deadline for the whole window, not a fresh timeout per
        // future: the drains run sequentially, and per-future timeouts
        // would let a window of hung fetches wait maxConcurrency x timeout
        val deadline = System.nanoTime() + fetchTimeoutSec * 1000000000L
        futures.map { case (r, fut) =>
          val remaining = math.max(1L, deadline - System.nanoTime())
          val ((status, body, err), dt) =
            try Await.result(fut, Duration(remaining, "ns"))
            catch { case e: Throwable => ((0, null: String, Some(e.toString)), 0.0) }
          Row.fromSeq(r.toSeq ++ Seq(status, body, err.orNull, dt))
        }
      }
      new Iterator[Row] {
        def hasNext: Boolean = { val h = out.hasNext; if (!h) pool.shutdown(); h }
        def next(): Row = out.next() // shutdown also hooked on task completion
      }
    }(Encoders.row(outSchema))
  }
}
