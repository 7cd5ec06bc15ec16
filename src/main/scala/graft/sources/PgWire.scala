package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

/** Pure-JVM PostgreSQL client speaking the PUBLIC frontend/backend wire
  * protocol, version 3 (postgresql.org/docs/current/protocol.html) — no
  * JDBC driver jar anywhere. The same move [[SqliteFile]] made for the
  * SQLite on-disk format, applied to the reference's live-database
  * connector surface (reference: `WarpConduit/Sources/PostgresStream
  * .swift:916`, which likewise implements its own protocol client rather
  * than shipping libpq).
  *
  * Supported: trust-auth startup, simple query ('Q') with text-format
  * results, COPY ... FROM STDIN (text format) for bulk ingest, and OID →
  * Spark type mapping for the scalar types the engine's tables use.
  *
  * Scale shape: [[read]] is a PARTITIONED executor-side scan — the driver
  * fetches only the zero-row schema; each task opens its own socket and
  * pulls `WHERE mod(<key>, n) = p`, so a 1000-executor cluster spreads
  * the table across 1000 independent backend connections exactly like the
  * classic JDBC partitioned read. [[writeTable]] streams COPY text rows
  * per input partition through `toLocalIterator` (bounded driver memory,
  * same single-artifact contract as the reference's SQL sinks).
  */
object PgWire {

  final case class Conn(host: String, port: Int, db: String, user: String)

  // ---------- low-level protocol ----------

  private final class Wire(conn: Conn) extends AutoCloseable {
    private val sock = new Socket()
    sock.connect(new InetSocketAddress(conn.host, conn.port), 10000)
    sock.setTcpNoDelay(true)
    private val in = new DataInputStream(new BufferedInputStream(sock.getInputStream, 1 << 16))
    private val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream, 1 << 16))

    startup()

    private def cstr(s: String): Array[Byte] = s.getBytes(UTF_8) :+ 0.toByte

    private def startup(): Unit = {
      val params = cstr("user") ++ cstr(conn.user) ++
        cstr("database") ++ cstr(conn.db) ++
        cstr("client_encoding") ++ cstr("UTF8") :+ 0.toByte
      out.writeInt(8 + params.length)
      out.writeInt(196608) // protocol 3.0
      out.write(params)
      out.flush()
      // consume until ReadyForQuery; require AuthenticationOk (trust)
      var ready = false
      while (!ready) {
        val (tag, body) = readMessage()
        tag match {
          case 'R' =>
            val code = ((body(0) & 0xFF) << 24) | ((body(1) & 0xFF) << 16) |
              ((body(2) & 0xFF) << 8) | (body(3) & 0xFF)
            require(code == 0,
              s"server requested auth method $code; only trust (0) is supported")
          case 'E' => throw new RuntimeException(s"postgres error: ${errorText(body)}")
          case 'Z' => ready = true
          case _ => // ParameterStatus 'S', BackendKeyData 'K', notices
        }
      }
    }

    private def readMessage(): (Char, Array[Byte]) = {
      val tag = in.readByte().toChar
      val len = in.readInt()
      val body = new Array[Byte](len - 4)
      in.readFully(body)
      (tag, body)
    }

    private def errorText(body: Array[Byte]): String = {
      // sequence of (fieldType byte, cstring); 'M' is the human message
      val sb = new StringBuilder
      var i = 0
      while (i < body.length && body(i) != 0) {
        val f = body(i).toChar; i += 1
        val start = i
        while (body(i) != 0) i += 1
        val v = new String(body, start, i - start, UTF_8); i += 1
        if (f == 'S' || f == 'M' || f == 'C') sb.append(s"$f=$v ")
      }
      sb.toString.trim
    }

    /** Simple query: returns (fields, rows) with text-format values
      * (null = NULL). Multiple result sets are not needed here. */
    def query(sql: String): (Seq[(String, Int)], Seq[Array[String]]) = {
      out.writeByte('Q')
      val b = cstr(sql)
      out.writeInt(4 + b.length)
      out.write(b)
      out.flush()
      var fields: Seq[(String, Int)] = Nil
      val rows = scala.collection.mutable.ArrayBuffer[Array[String]]()
      var err: String = null
      var done = false
      while (!done) {
        val (tag, body) = readMessage()
        tag match {
          case 'T' => fields = parseRowDescription(body)
          case 'D' => rows += parseDataRow(body)
          case 'E' => err = errorText(body)
          case 'Z' => done = true
          case _ => // CommandComplete 'C', notices, EmptyQuery 'I'
        }
      }
      if (err != null) throw new RuntimeException(s"postgres error: $err")
      (fields, rows.toSeq)
    }

    private def parseRowDescription(body: Array[Byte]): Seq[(String, Int)] = {
      val bb = java.nio.ByteBuffer.wrap(body)
      val n = bb.getShort.toInt
      (0 until n).map { _ =>
        val start = bb.position()
        while (body(bb.position()) != 0) bb.position(bb.position() + 1)
        val name = new String(body, start, bb.position() - start, UTF_8)
        bb.position(bb.position() + 1) // NUL
        bb.getInt; bb.getShort // table oid, column no
        val typeOid = bb.getInt
        bb.getShort; bb.getInt; bb.getShort // typlen, typmod, format
        (name, typeOid)
      }
    }

    private def parseDataRow(body: Array[Byte]): Array[String] = {
      val bb = java.nio.ByteBuffer.wrap(body)
      val n = bb.getShort.toInt
      val out = new Array[String](n)
      var i = 0
      while (i < n) {
        val len = bb.getInt
        if (len >= 0) {
          out(i) = new String(body, bb.position(), len, UTF_8)
          bb.position(bb.position() + len)
        } // else NULL -> null
        i += 1
      }
      out
    }

    /** COPY table FROM STDIN (text format): feed rows, then CopyDone. */
    def copyIn(sql: String, rows: Iterator[String]): Unit = {
      out.writeByte('Q')
      val b = cstr(sql)
      out.writeInt(4 + b.length)
      out.write(b)
      out.flush()
      val (tag, body) = readMessage()
      tag match {
        case 'G' => // CopyInResponse
        case 'E' => throw new RuntimeException(s"postgres error: ${errorText(body)}")
        case other => throw new RuntimeException(s"unexpected $other to COPY")
      }
      val buf = new StringBuilder
      def flushBuf(): Unit = if (buf.nonEmpty) {
        val data = buf.toString.getBytes(UTF_8)
        out.writeByte('d'); out.writeInt(4 + data.length); out.write(data)
        buf.clear()
      }
      rows.foreach { r =>
        buf.append(r).append('\n')
        if (buf.length > 60000) flushBuf()
      }
      flushBuf()
      out.writeByte('c'); out.writeInt(4) // CopyDone
      out.flush()
      var done = false
      var err: String = null
      while (!done) {
        val (t, bd) = readMessage()
        t match {
          case 'E' => err = errorText(bd)
          case 'Z' => done = true
          case _ =>
        }
      }
      if (err != null) throw new RuntimeException(s"postgres error: $err")
    }

    override def close(): Unit = {
      try { out.writeByte('X'); out.writeInt(4); out.flush() } // Terminate
      catch { case _: Throwable => }
      sock.close()
    }
  }

  // ---------- type mapping (pg_type OIDs, public catalog) ----------

  private def oidToSpark(oid: Int): DataType = oid match {
    case 16 => BooleanType
    case 17 => BinaryType
    case 20 => LongType
    case 21 => ShortType
    case 23 => IntegerType
    case 25 | 1042 | 1043 => StringType // text, bpchar, varchar
    case 700 => FloatType
    case 701 => DoubleType
    case 1082 => DateType
    case 1114 | 1184 => TimestampNTZType // timestamp, timestamptz (as NTZ text)
    case 1700 => DecimalType(38, 18)
    case _ => StringType // unknown types surface as their text form
  }

  private def parseValue(text: String, dt: DataType): Any =
    if (text == null) null
    else dt match {
      case BooleanType => text == "t"
      case ShortType => text.toShort
      case IntegerType => text.toInt
      case LongType => text.toLong
      case FloatType => text.toFloat
      case DoubleType => text.toDouble
      case _: DecimalType => new java.math.BigDecimal(text)
      case BinaryType =>
        require(text.startsWith("\\x"), s"unsupported bytea format: $text")
        val hex = text.drop(2)
        Array.tabulate[Byte](hex.length / 2)(i =>
          Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte)
      case DateType => java.sql.Date.valueOf(text)
      case TimestampNTZType =>
        // timestamptz (OID 1184) text carries a zone offset ("...+05:30",
        // "...+00"); normalize to the UTC wall clock. Plain timestamp
        // (1114) has no offset and parses directly.
        val iso = text.replace(' ', 'T')
        if (iso.matches(".*[+-]\\d\\d(:?\\d\\d)?$")) {
          val padded = if (iso.matches(".*[+-]\\d\\d$")) iso + ":00" else iso
          java.time.OffsetDateTime.parse(padded)
            .withOffsetSameInstant(java.time.ZoneOffset.UTC).toLocalDateTime
        } else java.time.LocalDateTime.parse(iso)
      case _ => text
    }

  private def sparkToPgType(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case ByteType | ShortType => "smallint"
    case IntegerType => "integer"
    case LongType => "bigint"
    case FloatType => "real"
    case DoubleType => "double precision"
    case StringType => "text"
    case BinaryType => "bytea"
    case DateType => "date"
    case _: TimestampNTZType => "timestamp"
    case TimestampType => "timestamp"
    case d: DecimalType => s"numeric(${d.precision},${d.scale})"
    case other => throw new IllegalArgumentException(s"unsupported type $other")
  }

  /** COPY text-format escaping: backslash, tab, newline, CR; NULL = \N. */
  private def copyField(v: Any): String = v match {
    case null => "\\N"
    case b: Boolean => if (b) "t" else "f"
    case bytes: Array[Byte] =>
      "\\\\x" + bytes.map(b => f"${b & 0xFF}%02x").mkString // \x escaped for COPY
    case s: String =>
      val sb = new StringBuilder(s.length + 8)
      s.foreach {
        case '\\' => sb.append("\\\\")
        case '\t' => sb.append("\\t")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case c => sb.append(c)
      }
      sb.toString
    case other => other.toString
  }

  // ---------- public API ----------

  /** Driver-side simple query -> local DataFrame (for DDL probes and
    * small reads; table scans should use [[read]]). */
  def query(spark: SparkSession, conn: Conn, sql: String): DataFrame = {
    val w = new Wire(conn)
    try {
      val (fields, rows) = w.query(sql)
      val schema = StructType(fields.map { case (n, oid) =>
        StructField(n, oidToSpark(oid), nullable = true) })
      val parsed = rows.map(r => Row.fromSeq(
        r.toSeq.zip(schema.fields).map { case (v, f) => parseValue(v, f.dataType) }))
      spark.createDataFrame(spark.sparkContext.parallelize(parsed.toSeq, 1), schema)
    } finally w.close()
  }

  def execute(conn: Conn, sql: String): Unit = {
    val w = new Wire(conn)
    try { w.query(sql); () } finally w.close()
  }

  /** Partitioned executor-side read: the driver fetches only the LIMIT 0
    * schema; each of `numPartitions` tasks opens its own wire connection
    * and scans `WHERE mod(abs(hashtext(<keyCol>::text)), n) = p` — the
    * standard partitioned-JDBC shape, driverless and jarless. */
  def read(spark: SparkSession, conn: Conn, table: String, keyCol: String,
           numPartitions: Int = 4): DataFrame = {
    require(numPartitions > 0, s"numPartitions must be positive, got $numPartitions")
    val probe = new Wire(conn)
    val schema = try {
      val (fields, _) = probe.query(s"SELECT * FROM $table LIMIT 0")
      StructType(fields.map { case (n, oid) =>
        StructField(n, oidToSpark(oid), nullable = true) })
    } finally probe.close()
    val types = schema.fields.map(_.dataType)
    val rdd = spark.sparkContext
      .parallelize(0 until numPartitions, numPartitions)
      .mapPartitions { ps =>
        ps.flatMap { p =>
          val w = new Wire(conn)
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit](_ => w.close()))
          // cast to bigint BEFORE abs: abs(int4min) would overflow int4.
          // NULL keys hash to NULL and would match NO partition predicate
          // (silent row loss) — partition 0 owns them explicitly.
          val nullArm = if (p == 0) s" OR $keyCol IS NULL" else ""
          val (_, rows) = w.query(
            s"SELECT * FROM $table WHERE mod(abs(hashtext($keyCol::text)::bigint), $numPartitions) = $p$nullArm")
          w.close()
          rows.map(r => Row.fromSeq(
            r.toSeq.zip(types.toSeq).map { case (v, t) => parseValue(v, t) }))
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** CREATE TABLE (drop-first) + COPY FROM STDIN bulk load (driver-side
    * single connection; bounded memory via toLocalIterator). */
  def writeTable(df: DataFrame, conn: Conn, table: String): Unit = {
    val cols = df.schema.fields
      .map(f => s""""${f.name}" ${sparkToPgType(f.dataType)}""").mkString(", ")
    execute(conn, s"""DROP TABLE IF EXISTS $table""")
    execute(conn, s"""CREATE TABLE $table ($cols)""")
    val w = new Wire(conn)
    try {
      val it = df.toLocalIterator()
      val lines = new Iterator[String] {
        def hasNext: Boolean = it.hasNext
        def next(): String = it.next().toSeq.map(copyField).mkString("\t")
      }
      w.copyIn(s"COPY $table FROM STDIN", lines)
    } finally w.close()
  }

  /** DISTRIBUTED bulk load: every partition opens its own wire connection
    * and COPYs concurrently — PostgreSQL serializes heap extension per
    * backend, so N executors stream N COPYs into one table without
    * coordination. This is the 100 TB-ingest shape (the driver never sees
    * a row); [[writeTable]] remains the single-artifact convenience. */
  def writeTableDistributed(df: DataFrame, conn: Conn, table: String): Unit = {
    val cols = df.schema.fields
      .map(f => s""""${f.name}" ${sparkToPgType(f.dataType)}""").mkString(", ")
    execute(conn, s"""DROP TABLE IF EXISTS $table""")
    execute(conn, s"""CREATE TABLE $table ($cols)""")
    appendDistributed(df, conn, table)
  }

  /** Distributed COPY append into an EXISTING table (no DDL) — the
    * per-micro-batch sink shape for Structured Streaming foreachBatch:
    * each batch partition streams its own COPY, exactly-once left to the
    * caller's trigger/checkpoint discipline. */
  def appendDistributed(df: DataFrame, conn: Conn, table: String): Unit =
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val w = new Wire(conn)
        try w.copyIn(s"COPY $table FROM STDIN",
          rows.map(_.toSeq.map(copyField).mkString("\t")))
        finally w.close()
      }
    }

  /** CREATE-only DDL for [[appendDistributed]] callers. */
  def createTable(conn: Conn, table: String, schema: StructType): Unit = {
    val cols = schema.fields
      .map(f => s""""${f.name}" ${sparkToPgType(f.dataType)}""").mkString(", ")
    execute(conn, s"""DROP TABLE IF EXISTS $table""")
    execute(conn, s"""CREATE TABLE $table ($cols)""")
  }

  // ---------- local server provisioning (driver environment) ----------

  /** Default coordinates for the locally-provisioned server. */
  val local: Conn = Conn("127.0.0.1", 55432, "postgres", "graft")

  private def sh(cmd: String*): (Int, String) = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), UTF_8)
    (p.waitFor(), out)
  }

  private def listening(conn: Conn): Boolean =
    try { new Wire(conn).close(); true } catch { case _: Throwable => false }

  /** Ensure a local PostgreSQL server is up at [[local]], provisioning a
    * throwaway cluster under /tmp if none is listening. Postgres refuses
    * to run as root, so a root caller provisions via a dedicated system
    * user (idempotent useradd). Throws with the failing step's output if
    * the environment genuinely lacks PostgreSQL — the caller's oracle row
    * then reports a determinate err instead of silently passing. */
  def ensureLocalServer(): Conn = synchronized {
    if (listening(local)) return local
    val bins = Seq("/usr/lib/postgresql/15/bin", "/usr/local/bin", "/usr/bin")
    val initdb = bins.map(b => new java.io.File(s"$b/initdb")).find(_.canExecute)
      .getOrElse(throw new IllegalStateException("initdb not found: PostgreSQL not installed"))
      .getAbsolutePath
    val pgctl = new java.io.File(initdb).getParent + "/pg_ctl"
    val data = "/tmp/graft_pgdata"
    val asRoot = System.getProperty("user.name") == "root"
    def run(label: String, cmd: String): Unit = {
      val (rc, out) =
        if (asRoot) sh("su", "pguser", "-c", cmd) else sh("sh", "-c", cmd)
      if (rc != 0) throw new IllegalStateException(s"$label failed (rc=$rc): ${out.take(500)}")
    }
    if (asRoot) { sh("useradd", "-m", "pguser"); () } // idempotent
    if (!new java.io.File(s"$data/PG_VERSION").exists()) {
      sh("sh", "-c", s"rm -rf $data && mkdir -p $data" +
        (if (asRoot) s" && chown pguser $data" else ""))
      run("initdb", s"$initdb -D $data -U ${local.user} --auth=trust")
    }
    // start may lose a cross-PROCESS race (forked bench JVMs share the
    // cluster): a failed start is fine as long as SOMEONE got it up
    try run("pg_ctl start",
      s"$pgctl -D $data -l /tmp/graft_pg.log -o '-p ${local.port} -k /tmp -c listen_addresses=127.0.0.1' start")
    catch { case e: IllegalStateException => if (listening(local)) () else throw e }
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (!listening(local)) {
      if (System.nanoTime() > deadline)
        throw new IllegalStateException("postgres did not come up on 127.0.0.1:" + local.port)
      Thread.sleep(200)
    }
    local
  }
}
