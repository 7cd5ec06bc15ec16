package graft.sources

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Full DataSource V2 connector over live PostgreSQL via the pure-JVM
  * [[PgWire]] protocol client — streaming SOURCE (the polling-ingest
  * shape every warehouse pipeline runs: "stream the rows that arrived
  * since the last batch"), batch READ, and native batch/streaming WRITE
  * through the V2 commit protocol (per-task transactional COPY stages,
  * atomic driver-side promote, epoch-ledgered streaming commits) — with
  * no JDBC jar and no driver-side row buffering.
  *
  * DataSource V2 micro-batch contract:
  *   - OFFSET = the high-water mark of a MONOTONIC integral key column
  *     (`keycol` option — an append-only ingest id/sequence; NULLs are
  *     excluded by contract). `latestOffset` asks the server for
  *     `max(key)`; a batch is the half-open key window (start, end].
  *   - Each batch is RANGE-SPLIT into `numpartitions` executor tasks;
  *     every task opens its own wire connection and consumes its slice
  *     INCREMENTALLY (O(row) task memory, indexable `>`/`<=` predicates —
  *     the [[PgWire.readRange]] scale shape).
  *   - Exactly-once within the stream: offsets are checkpointed by the
  *     engine, a replayed batch re-reads the same immutable key window.
  *     Rows must be append-only up to the key (updates behind the
  *     high-water mark are invisible, as in any offset-polled source).
  *   - `Trigger.AvailableNow` is supported: the target offset is pinned
  *     at `prepareForTriggerAvailableNow`, so a run drains exactly the
  *     rows present at start and stops — the deterministic, oracle-gated
  *     shape `q_stream_pg_source` verifies.
  *   - Admission control: `maxkeysperbatch` caps each batch's key-window
  *     advance, so a large backfill arrives as a sequence of bounded
  *     micro-batches (under AvailableNow the engine loops batches until
  *     the pinned target is reached) instead of one unbounded window.
  *
  * Usage:
  * {{{
  * spark.readStream.format("graft.sources.PgStreamSource")
  *   .option("host", c.host).option("port", c.port).option("db", c.db)
  *   .option("user", c.user).option("table", "events_in")
  *   .option("keycol", "event_id").option("numpartitions", 4)
  *   .load()
  * }}}
  */
class PgStreamSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PgWire.fetchSchema(PgStreamSource.connOf(options),
      PgStreamSource.required(options, "table"))

  // writes carry the dataframe's schema (the target table may not exist
  // yet — the write creates it); reads without a user schema still infer
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new PgStreamSource.PgTable(schema,
      new CaseInsensitiveStringMap(properties))
}

object PgStreamSource {

  private[sources] def required(o: CaseInsensitiveStringMap, k: String): String = {
    val v = o.get(k)
    require(v != null && v.nonEmpty, s"PgStreamSource: missing option '$k'")
    v
  }

  private[sources] def connOf(o: CaseInsensitiveStringMap): PgWire.Conn =
    PgWire.Conn(
      required(o, "host"), required(o, "port").toInt,
      required(o, "db"), required(o, "user"),
      Option(o.get("password")).getOrElse(""),
      ssl = Option(o.get("ssl")).getOrElse("disable"),
      sslRootCert = Option(o.get("sslrootcert")))

  /** The stream offset: high-water mark of the monotonic key. */
  final case class KeyOffset(max: Long) extends Offset {
    override def json(): String = s"""{"max":$max}"""
  }
  private def parseOffset(json: String): KeyOffset = {
    val m = """\{\s*"max"\s*:\s*(-?\d+)\s*\}""".r
    json match {
      case m(v) => KeyOffset(v.toLong)
      case other => throw new IllegalArgumentException(s"bad PgStreamSource offset: $other")
    }
  }

  private final class PgTable(tableSchema: StructType,
                              options: CaseInsensitiveStringMap)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
    override def name(): String = s"pgstream:${options.get("table")}"
    override def schema(): StructType = tableSchema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
        TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
        TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE)
    override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder =
      new PgScanBuilder(tableSchema, options)
    override def newWriteBuilder(
        info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
      // queryId: stable across restarts FROM THE SAME CHECKPOINT, fresh
      // otherwise — exactly the run identity the epoch ledger needs
      new PgWriteBuilder(info.schema(), options, info.queryId())
  }

  // ---------- DataSource V2 WRITE: the V2 commit protocol mapped onto
  // staged transactional COPY — each task stages into its own table
  // inside one server transaction (a failed/aborted task's stage simply
  // rolls back), the driver's job commit promotes every stage into the
  // target in ONE transaction (atomic all-or-nothing; truncate-mode
  // deletes inside the same transaction, so overwrite is atomic too),
  // and streaming epochs gate through the <table>__epochs ledger for
  // exactly-once under replay ----------

  private final case class PgStageCommit(stage: String)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

  private final class PgWriteBuilder(schema: StructType,
                                     options: CaseInsensitiveStringMap,
                                     queryId: String)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
    private var truncateFirst = false
    override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
      truncateFirst = true; this
    }
    override def build(): org.apache.spark.sql.connector.write.Write =
      new org.apache.spark.sql.connector.write.Write {
        override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
          new PgBatchWrite(schema, options, truncateFirst)
        override def toStreaming
          : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
          new PgStreamingWrite(schema, options, truncateFirst, queryId)
      }
  }

  private def promoteStages(conn: PgWire.Conn, table: String,
                            stages: Seq[String], truncateFirst: Boolean,
                            run: Option[(String, Long)]): Unit = {
    val led = run.map { case (r, e) =>
      s"INSERT INTO ${table}__epochs VALUES (${PgWire.sqlStringLit(r)}, $e); "
    }.getOrElse("")
    val del = if (truncateFirst) s"DELETE FROM $table; " else ""
    val ins = stages.map(s =>
      s"INSERT INTO $table SELECT * FROM $s; DROP TABLE $s;").mkString(" ")
    PgWire.execute(conn, s"BEGIN; $led$del$ins COMMIT")
  }

  private def dropStages(conn: PgWire.Conn, stages: Seq[String]): Unit =
    stages.foreach(s =>
      try PgWire.execute(conn, s"DROP TABLE IF EXISTS $s")
      catch { case _: Throwable => })

  private def stagesOf(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
    : Seq[String] =
    messages.toSeq.collect { case PgStageCommit(s) => s }

  private final class PgBatchWrite(schema: StructType,
                                   options: CaseInsensitiveStringMap,
                                   truncateFirst: Boolean)
    extends org.apache.spark.sql.connector.write.BatchWrite {
    private val conn = connOf(options)
    private val table = required(options, "table")
    private val nonce =
      java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    PgWire.createTable(conn, table, schema) // ensure target (never drops)

    override def createBatchWriterFactory(
        info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory =
      new PgDataWriterFactory(conn, table, schema, nonce)
    override def commit(
        messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit =
      promoteStages(conn, table, stagesOf(messages), truncateFirst, None)
    // NOTE: if the driver dies between task commits and this job commit,
    // the committed stage tables of the dead run are orphaned (a fresh
    // run uses a fresh nonce and never references them); sweep
    // <table>__v2_% when reclaiming space after a crashed job
    override def abort(
        messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit =
      dropStages(conn, stagesOf(messages))
  }

  private final class PgStreamingWrite(schema: StructType,
                                       options: CaseInsensitiveStringMap,
                                       truncateFirst: Boolean,
                                       queryId: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
    private val conn = connOf(options)
    private val table = required(options, "table")
    private val nonce =
      java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    PgWire.createTable(conn, table, schema)
    PgWire.ensureLedger(conn, table) // keyed (run, epoch): see ensureLedger

    override def createStreamingWriterFactory(
        info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
      new PgDataWriterFactory(conn, table, schema, nonce)
    override def commit(epochId: Long,
        messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
      val stages = stagesOf(messages)
      if (PgWire.epochSeen(conn, table, queryId, epochId)) {
        dropStages(conn, stages); return // replay from this run: no-op
      }
      // truncateFirst flows through: Complete output mode replaces the
      // table contents atomically each epoch instead of accumulating
      try promoteStages(conn, table, stages, truncateFirst,
        run = Some((queryId, epochId)))
      catch {
        // lost a promote race ON THE LEDGER: the (run, epoch) PK rolled
        // this transaction back whole — the epoch landed exactly once
        // elsewhere. A unique-violation from the TARGET's own
        // constraints is NOT swallowed: it propagates and fails the
        // batch loudly.
        case e: RuntimeException
            if e.getMessage != null && e.getMessage.contains("23505") &&
              e.getMessage.contains("__epochs") =>
          dropStages(conn, stages)
      }
    }
    override def abort(epochId: Long,
        messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit =
      dropStages(conn, stagesOf(messages))
  }

  private final class PgDataWriterFactory(conn: PgWire.Conn, table: String,
                                          schema: StructType, nonce: String)
    extends org.apache.spark.sql.connector.write.DataWriterFactory
    with org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
      new PgDataWriter(conn, table, schema,
        PgWire.stageIdent(s"${table}__v2_${nonce}_${partitionId}_$taskId"))
    override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
      new PgDataWriter(conn, table, schema,
        PgWire.stageIdent(s"${table}__v2_${nonce}_e${epochId}_${partitionId}_$taskId"))
  }

  /** One task's writer: stage-table CREATE + binary COPY inside a single
    * server transaction. `commit` finishes the COPY (committing the
    * stage) and reports the stage name; `abort` drops the socket, which
    * rolls the open transaction — and the stage with it — back, so a
    * failed or speculative task attempt leaves nothing behind. */
  private final class PgDataWriter(conn: PgWire.Conn, table: String,
                                   schema: StructType, stage: String)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
    private val types = schema.fields.map(_.dataType)
    private val toScala =
      CatalystTypeConverters.createToScalaConverter(schema)
    private lazy val wire = {
      val w = new PgWire.Wire(conn)
      w.copyBeginBinary(PgWire.stageCopySql(stage, PgWire.ddlColumns(schema)))
      w
    }
    override def write(r: InternalRow): Unit =
      wire.copyPut(PgWire.encodeBinaryRow(
        toScala(r).asInstanceOf[org.apache.spark.sql.Row].toSeq, types))
    override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
      wire.copyFinishBinary() // empty partitions still create their stage
      wire.close()
      PgStageCommit(stage)
    }
    override def abort(): Unit =
      try wire.close() catch { case _: Throwable => }
    override def close(): Unit = ()
  }

  /** Column pruning + filter pushdown: a projection/filter in the Spark
    * plan becomes a narrower SELECT list and an extra server-side WHERE —
    * at scale the server ships only the referenced columns and rows, and
    * an index on a filtered column turns the slice scan into an index
    * scan. Pushed filters are ALSO left in the Spark plan (they are
    * returned as residuals), so a conservative translation can never
    * change results. */
  private final class PgScanBuilder(tableSchema: StructType,
                                    options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
    import org.apache.spark.sql.sources.Filter

    private var requiredSchema: StructType = tableSchema
    private var pushed: Array[Filter] = Array.empty

    override def pruneColumns(required: StructType): Unit =
      requiredSchema = required

    override def pushFilters(filters: Array[Filter]): Array[Filter] = {
      pushed = filters.filter(f => toPgPredicate(f).isDefined)
      filters // everything stays a residual: pushdown only pre-filters
    }
    override def pushedFilters(): Array[Filter] = pushed

    override def build(): Scan = {
      val where = pushed.flatMap(toPgPredicate)
        .map(p => s"($p)").mkString(" AND ")
      val extra = if (where.isEmpty) None else Some(where)
      new Scan {
        override def readSchema(): StructType = requiredSchema
        override def description(): String = {
          val cols = requiredSchema.fields.map(_.name).mkString(",")
          s"pgstream:${options.get("table")} cols=[$cols] " +
            s"PushedFilters=[${pushed.mkString(", ")}]"
        }
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new PgMicroBatchStream(requiredSchema, options, extra)
        // same connector, batch shape: spark.read.format(...) scans the
        // whole current key span through the identical range partitions
        // and per-task incremental wire readers
        override def toBatch: org.apache.spark.sql.connector.read.Batch =
          new PgBatchScan(requiredSchema, options, extra)
      }
    }
  }

  private def quoteIdent(name: String): String =
    "\"" + name.replace("\"", "\"\"") + "\""

  /** Conservative Spark-Filter → PostgreSQL predicate translation: plain
    * column references and bool/number/string/decimal literals only;
    * anything else (dates, nested fields, exotic ops) returns None and
    * simply isn't pushed. */
  private[sources] def toPgPredicate(
      f: org.apache.spark.sql.sources.Filter): Option[String] = {
    import org.apache.spark.sql.sources._
    def col(a: String): Option[String] =
      if (a.contains(".")) None else Some(quoteIdent(a))
    def lit(v: Any): Option[String] = v match {
      case s: String => Some("'" + s.replace("'", "''") + "'")
      case b: Boolean => Some(if (b) "true" else "false")
      case _: Byte | _: Short | _: Int | _: Long => Some(v.toString)
      case fl: Float => if (fl.isNaN || fl.isInfinite) None else Some(fl.toString)
      case d: Double => if (d.isNaN || d.isInfinite) None else Some(d.toString)
      case d: java.math.BigDecimal => Some(d.toPlainString)
      case d: scala.math.BigDecimal => Some(d.bigDecimal.toPlainString)
      case _ => None
    }
    def bin(a: String, op: String, v: Any): Option[String] =
      for { c <- col(a); l <- lit(v) } yield s"$c $op $l"
    // ORDERING on strings is collation-dependent (PG en_US sorts 'a' < 'B';
    // Spark compares binary UTF-8) — the server could exclude rows the
    // residual Spark filter would keep. Push string ordering never;
    // equality/IN are safe (deterministic collations tie-break by bytes).
    def ord(a: String, op: String, v: Any): Option[String] =
      if (v.isInstanceOf[String]) None else bin(a, op, v)
    f match {
      case EqualTo(a, v) => bin(a, "=", v)
      case GreaterThan(a, v) => ord(a, ">", v)
      case GreaterThanOrEqual(a, v) => ord(a, ">=", v)
      case LessThan(a, v) => ord(a, "<", v)
      case LessThanOrEqual(a, v) => ord(a, "<=", v)
      case IsNull(a) => col(a).map(c => s"$c IS NULL")
      case IsNotNull(a) => col(a).map(c => s"$c IS NOT NULL")
      case In(a, vs) if vs.nonEmpty =>
        val lits = vs.toSeq.map(lit)
        if (lits.exists(_.isEmpty)) None
        else col(a).map(c => s"$c IN (${lits.flatten.mkString(", ")})")
      case StringStartsWith(a, p) =>
        // escape LIKE metacharacters so the prefix is literal
        val esc = p.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
        for { c <- col(a); l <- lit(esc + "%") } yield s"$c LIKE $l"
      case And(l, r) =>
        for { a <- toPgPredicate(l); b <- toPgPredicate(r) } yield s"($a AND $b)"
      case Or(l, r) =>
        for { a <- toPgPredicate(l); b <- toPgPredicate(r) } yield s"($a OR $b)"
      case Not(c) => toPgPredicate(c).map(p => s"NOT ($p)")
      case _ => None
    }
  }

  private final class PgBatchScan(schema: StructType,
                                  options: CaseInsensitiveStringMap,
                                  extraWhere: Option[String])
    extends org.apache.spark.sql.connector.read.Batch {
    private val conn = connOf(options)
    private val table = required(options, "table")
    private val keyCol = required(options, "keycol")
    private val numPartitions =
      Option(options.get("numpartitions")).map(_.toInt).getOrElse(4)

    override def planInputPartitions(): Array[InputPartition] = {
      val w = new PgWire.Wire(conn)
      val (lo, hi) =
        try {
          val (_, rows) = w.query(
            s"SELECT min($keyCol)::bigint, max($keyCol)::bigint FROM $table " +
              s"WHERE $keyCol IS NOT NULL")
          val r = rows.headOption.getOrElse(Array[String](null, null))
          (Option(r(0)).map(_.toLong), Option(r(1)).map(_.toLong))
        } finally w.close()
      // shared slicer: identical NULL-ownership and boundary rules as
      // PgWire.readRange (partition 0 keeps NULL-key rows; an empty key
      // span still reads the NULL-only slice)
      val bounds = for { a <- lo; b <- hi } yield (a, b)
      PgWire.rangePredicates(keyCol, bounds, numPartitions)
        .map(p => PgRangePartition(p): InputPartition).toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new PgReaderFactory(conn, table, schema, extraWhere)
  }

  private final class PgMicroBatchStream(schema: StructType,
                                         options: CaseInsensitiveStringMap,
                                         extraWhere: Option[String])
    extends MicroBatchStream with SupportsTriggerAvailableNow {
    private val conn = connOf(options)
    private val table = required(options, "table")
    private val keyCol = required(options, "keycol")
    private val numPartitions =
      Option(options.get("numpartitions")).map(_.toInt).getOrElse(4)
    require(numPartitions > 0, "numpartitions must be positive")
    // admission control: cap how far the key window advances per batch —
    // a 100 TB backfill must arrive as bounded micro-batches, not one
    // giant window. Keys are the unit (== rows when the key is a dense
    // sequence; an upper bound on rows otherwise, since keys are unique)
    private val maxKeysPerBatch: Option[Long] =
      Option(options.get("maxkeysperbatch")).map(_.toLong)
    require(maxKeysPerBatch.forall(_ > 0), "maxkeysperbatch must be positive")
    // pinned target for Trigger.AvailableNow (engine calls prepare first)
    @volatile private var availableNowTarget: Offset = _

    /** One probe round trip: (min(key)-1, max(key)); both Long.MinValue
      * when the table has no non-NULL keys. Transient connection failures
      * are retried with backoff — a network blip during a driver-side
      * offset poll must not kill the whole streaming query (executor
      * reads already get Spark's task retries). */
    private def serverBounds(): (Long, Long) = {
      var attempt = 0
      while (true) {
        try {
          val w = new PgWire.Wire(conn)
          try {
            val (_, rows) = w.query(
              s"SELECT min($keyCol)::bigint, max($keyCol)::bigint FROM $table " +
                s"WHERE $keyCol IS NOT NULL")
            val r = rows.headOption.getOrElse(Array[String](null, null))
            return (Option(r(0)).map(_.toLong - 1).getOrElse(Long.MinValue),
              Option(r(1)).map(_.toLong).getOrElse(Long.MinValue))
          } finally w.close()
        } catch {
          case _: java.io.IOException if attempt < 3 =>
            attempt += 1
            Thread.sleep(250L << attempt) // 500ms, 1s, 2s
          case e: RuntimeException if attempt < 3 && {
              // server-sent transients: starting up / shutting down
              // (57P03), too many connections (53300), connection
              // failure (08006) — the same blip class as an IOException
              val m = Option(e.getMessage).getOrElse("")
              m.contains("57P03") || m.contains("53300") || m.contains("08006")
            } =>
            attempt += 1
            Thread.sleep(250L << attempt)
        }
      }
      throw new IllegalStateException("unreachable")
    }
    private def serverMax(): Long = serverBounds()._2
    private def serverMinMinusOne(): Long = serverBounds()._1

    override def prepareForTriggerAvailableNow(): Unit = {
      val (minM1, mx) = serverBounds()
      availableNowTarget = KeyOffset(math.max(mx, minM1))
    }

    override def initialOffset(): Offset = {
      val start = Option(options.get("startkey")).map(_.toLong)
        .getOrElse(serverMinMinusOne())
      KeyOffset(start)
    }

    override def latestOffset(): Offset =
      if (availableNowTarget != null) availableNowTarget
      else {
        val mx = serverMax()
        if (mx == Long.MinValue) initialOffset() else KeyOffset(mx)
      }

    // SupportsAdmissionControl (via SupportsTriggerAvailableNow): each
    // batch advances toward the pinned AvailableNow target (or the live
    // high-water mark), clamped to at most maxKeysPerBatch keys — under
    // Trigger.AvailableNow the engine keeps issuing batches until the
    // prepared target is reached, so a capped drain becomes a SEQUENCE
    // of bounded micro-batches instead of one unbounded window
    override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit = {
      import org.apache.spark.sql.connector.read.streaming.ReadLimit
      maxKeysPerBatch.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())
    }

    override def latestOffset(start: Offset,
                              limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
      import org.apache.spark.sql.connector.read.streaming.ReadMaxRows
      val lo = start.asInstanceOf[KeyOffset].max
      val target =
        if (availableNowTarget != null) availableNowTarget.asInstanceOf[KeyOffset].max
        else {
          val mx = serverMax()
          if (mx == Long.MinValue) lo else mx
        }
      val cap = limit match {
        case r: ReadMaxRows => Some(r.maxRows())
        case _ => maxKeysPerBatch
      }
      val hi = cap match {
        case Some(n) =>
          val stepped = lo + n // saturate on overflow
          if (stepped < lo) target else math.min(target, stepped)
        case None => target
      }
      KeyOffset(math.max(hi, lo))
    }

    override def deserializeOffset(json: String): Offset = parseOffset(json)

    override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
      val lo = start.asInstanceOf[KeyOffset].max
      val hi = end.asInstanceOf[KeyOffset].max
      if (hi <= lo) return Array.empty
      // split the half-open window (lo, hi] into contiguous slices — the
      // same indexable range shape as PgWire.readRange
      val span = BigInt(hi) - BigInt(lo)
      val n = numPartitions.min(span.min(Int.MaxValue).toInt).max(1)
      (0 until n).map { p =>
        val a = BigInt(lo) + span * p / n
        val b = BigInt(lo) + span * (p + 1) / n
        PgRangePartition(s"$keyCol > $a AND $keyCol <= $b"): InputPartition
      }.toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new PgReaderFactory(conn, table, schema, extraWhere)

    override def commit(end: Offset): Unit = ()
    override def stop(): Unit = ()
  }

  private final case class PgRangePartition(predicate: String) extends InputPartition

  private final class PgReaderFactory(conn: PgWire.Conn, table: String,
                                      schema: StructType,
                                      extraWhere: Option[String])
    extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val range = partition.asInstanceOf[PgRangePartition].predicate
      val pred = extraWhere.map(w => s"($range) AND $w").getOrElse(range)
      // pruned projection; an empty required schema (pure count) still
      // needs one emitted row per match, so select a constant
      val select =
        if (schema.isEmpty) "1"
        else schema.fields.map(f => quoteIdent(f.name)).mkString(", ")
      new PartitionReader[InternalRow] {
        private val wire = new PgWire.Wire(conn)
        private val toCatalyst =
          CatalystTypeConverters.createToCatalystConverter(schema)
        // extended protocol, binary result formats (PgWire.queryStreamBinary):
        // values arrive as Spark-layer objects, O(row) task memory
        private val rows =
          wire.queryStreamBinary(s"SELECT $select FROM $table WHERE $pred")._2
        private var current: InternalRow = _
        override def next(): Boolean =
          if (rows.hasNext) {
            val r = rows.next()
            current =
              if (schema.isEmpty) InternalRow.empty
              else toCatalyst(org.apache.spark.sql.Row.fromSeq(
                scala.collection.immutable.ArraySeq.unsafeWrapArray(r)))
                .asInstanceOf[InternalRow]
            true
          } else false
        override def get(): InternalRow = current
        override def close(): Unit = wire.close()
      }
    }
  }
}
