package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HTTP source (reference: Warp/Sources/Model/Steps/QBEHTTPStep.swift:73):
  * fetch one URL into a one-row table (url, status, body, error, time).
  * Rides the [[Crawl]] machinery — same pluggable fetcher, same offline
  * deterministic stub by default (no egress in this environment). */
object HttpSource {
  def read(spark: SparkSession, url: String,
           fetcher: Crawl.Fetcher = Crawl.stubFetcher): DataFrame = {
    import spark.implicits._
    Crawl.crawl(Seq(url).toDF("url"), "url", fetcher, maxConcurrency = 1)
  }
}
