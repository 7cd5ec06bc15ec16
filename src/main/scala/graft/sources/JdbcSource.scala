package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC sources for PostgreSQL / MySQL / SQLite
  * (reference: WarpConduit/Sources/PostgresStream.swift:916,
  * MySQLStream.swift:771, SQLiteStream.swift:738).
  *
  * The reference's architecture pushed Warp expressions down into each
  * database — including registering WARP_FUNCTION/WARP_BINARY UDFs inside
  * SQLite so non-SQL functions still executed remotely
  * (SQLiteStream.swift:239-265,381-400) and per-dialect feature tables
  * (MySQL: no window functions, MySQLStream.swift:37; Postgres: windows
  * supported, PostgresStream.swift:24). Under Spark that machinery is
  * obsolete: the database is only a SCAN source; every Warp operator runs
  * in Spark itself, and Spark's JDBC relation already pushes down the
  * filters/projections that matter for scan volume.
  *
  * Scale note: a naive JDBC read is one connection = one partition. For
  * anything beyond a dimension table use [[readPartitioned]], which splits
  * the scan into `numPartitions` range-parallel queries — the standard
  * Spark idiom for bulk-extracting a warehouse table.
  */
object JdbcSource {

  def postgres(spark: SparkSession, host: String, port: Int, db: String,
               table: String, user: String, password: String): DataFrame =
    read(spark, s"jdbc:postgresql://$host:$port/$db", table,
      Map("user" -> user, "password" -> password))

  def mysql(spark: SparkSession, host: String, port: Int, db: String,
            table: String, user: String, password: String): DataFrame =
    read(spark, s"jdbc:mysql://$host:$port/$db", table,
      Map("user" -> user, "password" -> password))

  def sqlite(spark: SparkSession, file: String, table: String): DataFrame =
    read(spark, s"jdbc:sqlite:$file", table, Map.empty)

  /** Embedded Apache Derby — the in-process, serverless engine (ships with
    * Spark), filling the same "file-backed SQL database" role SQLite has
    * in the reference (SQLiteStream.swift:738). It exercises the identical
    * code path as the server engines: Spark's JDBC relation, dialect type
    * mapping, batched-insert sink, range-partitioned bulk read. */
  private val derbyOpts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  def derby(spark: SparkSession, dbDir: String, table: String): DataFrame =
    read(spark, s"jdbc:derby:$dbDir", table, derbyOpts)

  def derbyPartitioned(spark: SparkSession, dbDir: String, table: String,
                       partitionColumn: String, lowerBound: Long,
                       upperBound: Long, numPartitions: Int): DataFrame =
    readPartitioned(spark, s"jdbc:derby:$dbDir", table, partitionColumn,
      lowerBound, upperBound, numPartitions, derbyOpts)

  def derbyWrite(df: DataFrame, dbDir: String, table: String,
                 mode: SaveMode = SaveMode.Overwrite): Unit = {
    // a KILLED writer JVM can leave the embedded database unrecoverable
    // ("Failed to start database"); the roundtrip artifact is always
    // regenerated whole, so a boot failure just wipes and recreates it
    if (mode == SaveMode.Overwrite && new java.io.File(dbDir).exists()) {
      val probe = scala.util.Try {
        java.sql.DriverManager.getConnection(s"jdbc:derby:$dbDir").close()
      }
      if (probe.isFailure) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete()
        }
        rm(new java.io.File(dbDir))
      }
    }
    write(df, s"jdbc:derby:$dbDir;create=true", table, derbyOpts, mode)
  }

  /** Single-partition read — dimension tables only. */
  def read(spark: SparkSession, url: String, table: String,
           options: Map[String, String]): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(options).load()

  /** Range-partitioned parallel read — the bulk-extract path. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lowerBound: Long, upperBound: Long,
                      numPartitions: Int,
                      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound).option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .options(options).load()

  /** JDBC sink (MutableData.swift:138-141 `.import` mutation; the SQL
    * `INSERT INTO ... SELECT` fast path of SQL.swift:381-427 becomes a
    * parallel batched-insert write). */
  def write(df: DataFrame, url: String, table: String,
            options: Map[String, String], mode: SaveMode = SaveMode.Append): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(options).mode(mode).save()
}
