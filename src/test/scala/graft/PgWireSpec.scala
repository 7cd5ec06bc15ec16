package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources.PgWire

/** Pure-JVM PostgreSQL wire-protocol client against a REAL locally
  * provisioned server (initdb + pg_ctl, trust auth): the live twin of the
  * pinned PG dialect matrix in SourcesSpec. Every test is skipped (not
  * failed) when the environment lacks PostgreSQL — the oracle-gated
  * `q_pg_roundtrip` row is the authoritative driver-side gate. */
class PgWireSpec extends SparkSpec {

  private lazy val conn: Option[PgWire.Conn] =
    try Some(PgWire.ensureLocalServer())
    catch { case _: Throwable => None }

  test("type matrix round-trips through COPY and text results") {
    assume(conn.isDefined, "PostgreSQL unavailable in this environment")
    val c = conn.get
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("b", BooleanType),
      StructField("i", IntegerType), StructField("d", DoubleType),
      StructField("s", StringType), StructField("bin", BinaryType),
      StructField("dec", DecimalType(10, 3))))
    val rows = Seq(
      Row(1L, true, 42, 1.5, "plain", Array[Byte](0, 1, -1), BigDecimal("12.345").bigDecimal),
      // COPY text-format escapes: tab, newline, CR, backslash
      Row(2L, false, -7, -0.25, "a\tb\nc\rd\\e", Array[Byte](127), BigDecimal("-0.001").bigDecimal),
      // unicode (2/3/4-byte UTF-8) survives the wire both ways
      Row(3L, null, null, null, "café 中𝄞", null, null),
      Row(4L, true, 0, 0.0, "", Array.emptyByteArray, BigDecimal("0.000").bigDecimal))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    PgWire.writeTable(df, c, "pgwire_types")
    val back = PgWire.read(spark, c, "pgwire_types", "id", numPartitions = 3)
      .orderBy("id").collect()
    assert(back.length == 4)
    val r2 = back(1)
    assert(r2.getString(4) == "a\tb\nc\rd\\e")
    assert(r2.getAs[Array[Byte]](5).toSeq == Seq(127.toByte))
    val r3 = back(2)
    assert(r3.getString(4) == "café 中𝄞")
    assert(r3.isNullAt(1) && r3.isNullAt(2) && r3.isNullAt(3) && r3.isNullAt(5))
    assert(back(0).getAs[java.math.BigDecimal](6).compareTo(
      new java.math.BigDecimal("12.345")) == 0)
    assert(back(3).getAs[Array[Byte]](5).length == 0)
  }

  test("partitioned read covers every row exactly once") {
    assume(conn.isDefined, "PostgreSQL unavailable in this environment")
    val c = conn.get
    import spark.implicits._
    val df = spark.range(500).selectExpr("id", "CAST(id * 3 AS STRING) AS v")
    PgWire.writeTable(df, c, "pgwire_parts")
    val back = PgWire.read(spark, c, "pgwire_parts", "id", numPartitions = 7)
    assert(back.rdd.getNumPartitions == 7)
    assert(back.count() == 500)
    assert(back.select("id").as[Long].collect().toSet == (0L until 500L).toSet)
  }

  test("distributed COPY loads concurrently from executor partitions") {
    assume(conn.isDefined, "PostgreSQL unavailable in this environment")
    val c = conn.get
    import spark.implicits._
    val df = spark.range(3000).repartition(6)
      .selectExpr("id", "'r' || CAST(id AS STRING) AS v")
    PgWire.writeTableDistributed(df, c, "pgwire_dist")
    val back = PgWire.read(spark, c, "pgwire_dist", "id", numPartitions = 4)
    assert(back.count() == 3000)
    assert(back.select("id").as[Long].collect().toSet == (0L until 3000L).toSet)
  }

  test("partitioned read keeps NULL-key rows; timestamptz normalizes to UTC") {
    assume(conn.isDefined, "PostgreSQL unavailable in this environment")
    val c = conn.get
    PgWire.execute(c, "DROP TABLE IF EXISTS pgwire_nulls")
    PgWire.execute(c,
      "CREATE TABLE pgwire_nulls (k bigint, v text, ts timestamptz)")
    PgWire.execute(c,
      "INSERT INTO pgwire_nulls VALUES " +
        "(1, 'a', '2024-01-15 10:30:00+00'), " +
        "(NULL, 'null-key', '2024-01-15 12:00:00+02'), " +
        "(2, NULL, NULL), (NULL, 'null-key-2', NULL)")
    val back = PgWire.read(spark, c, "pgwire_nulls", "k", numPartitions = 3).collect()
    assert(back.length == 4, s"NULL-key rows dropped: got ${back.length}")
    assert(back.count(_.isNullAt(0)) == 2)
    val ts = back.filter(r => !r.isNullAt(0) && r.getLong(0) == 1L).head
      .getAs[java.time.LocalDateTime]("ts")
    assert(ts == java.time.LocalDateTime.parse("2024-01-15T10:30:00"))
    val ts2 = back.filter(r => !r.isNullAt(2) && r.isNullAt(0)).head
      .getAs[java.time.LocalDateTime]("ts") // +02 offset -> 10:00 UTC
    assert(ts2 == java.time.LocalDateTime.parse("2024-01-15T10:00:00"))
  }

  test("server-side errors surface with the postgres message") {
    assume(conn.isDefined, "PostgreSQL unavailable in this environment")
    val e = intercept[RuntimeException] {
      PgWire.execute(conn.get, "SELECT * FROM table_that_does_not_exist_xyz")
    }
    assert(e.getMessage.contains("42P01") || e.getMessage.contains("does not exist"))
  }
}
