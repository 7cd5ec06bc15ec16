package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Parquet-backed mutable dataset / warehouse — the full
  * `DatasetMutation` surface of the reference
  * (reference: WarpCore/Sources/MutableData.swift:40-196: truncate, drop,
  * insert, import-with-mapping, alter, rename, update, delete).
  *
  * Spark has no in-place row mutation; each mutation is expressed the
  * warehouse-native way:
  *  - insert/import  -> append write (the reference's `INSERT INTO ...
  *    SELECT` fast path, SQL.swift:381-427, becomes a parallel append);
  *  - update/delete  -> read-transform-rewrite into a staging directory,
  *    then atomic-ish swap (rename). This is exactly the copy-on-write
  *    strategy of parquet table formats; at production scale the same
  *    calls map 1:1 onto a table format with transactional commit;
  *  - alter/rename   -> projection rewrite.
  *
  * Everything flows through DataFrames: mutations are distributed jobs,
  * never driver-side row loops.
  */
final class ParquetWarehouse(spark: SparkSession, root: String) {

  private def dir(table: String) = s"$root/$table"
  private def historyDir(table: String) = s"$root/_history/$table"

  def exists(table: String): Boolean =
    new java.io.File(dir(table)).exists()

  def read(table: String): DataFrame = spark.read.parquet(dir(table))

  /** alter(Schema) with a non-existing table = create (MutableData.swift:145). */
  def create(table: String, df: DataFrame): Unit = {
    delete(new java.io.File(historyDir(table))) // new table identity: no history
    df.write.mode("overwrite").parquet(dir(table))
  }

  def drop(table: String): Unit = {
    delete(new java.io.File(dir(table)))
    delete(new java.io.File(historyDir(table)))
  }

  // ---- snapshot versioning (time travel) -------------------------------
  //
  // Every mutation retires the pre-mutation state into
  // `_history/<table>/v<N>` instead of destroying it:
  //  - rewrite-style mutations RENAME the old directory aside — the full
  //    new copy was being written anyway, so retention is one directory
  //    rename, zero extra bytes;
  //  - append-style mutations HARD-LINK the current part files into the
  //    snapshot — metadata-only, the bytes are shared between versions
  //    (parquet part files are immutable once written, so sharing is safe).
  // This is the flat-parquet equivalent of a table format's manifest
  // versioning: old versions share unchanged files with new ones, and
  // [[vacuum]] is the retention sweep that reclaims unreferenced bytes.
  // The LIVE directory always holds exactly the current files, so direct
  // directory readers (footer audits, pruned probes) see only version HEAD.

  /** Retired version numbers available for [[readVersion]], ascending.
    * The live table is version max+1 (or 1 if never mutated). */
  def versions(table: String): Seq[Int] = {
    val fs = new java.io.File(historyDir(table)).listFiles()
    if (fs == null) Seq.empty
    else fs.filter(f => f.isDirectory && f.getName.startsWith("v"))
      .map(_.getName.drop(1).toInt).sorted.toSeq
  }

  /** Version number of the live table state. */
  def currentVersion(table: String): Int =
    versions(table).lastOption.getOrElse(0) + 1

  /** Read the table as of version `v` (1 = as created). The live version
    * reads the live directory; retired versions read their snapshot. */
  def readVersion(table: String, v: Int): DataFrame = {
    val cur = currentVersion(table)
    require(v >= 1 && v <= cur, s"version $v out of range [1, $cur] for $table")
    if (v == cur) read(table)
    else spark.read.parquet(s"${historyDir(table)}/v$v")
  }

  /** Drop all but the newest `keepLast` retired versions — the retention
    * sweep. Bytes shared with the live table (hard links) survive; only
    * exclusively-held bytes are reclaimed. */
  def vacuum(table: String, keepLast: Int): Unit = {
    require(keepLast >= 0, s"keepLast must be >= 0, got $keepLast")
    versions(table).dropRight(keepLast).foreach { v =>
      delete(new java.io.File(s"${historyDir(table)}/v$v"))
    }
  }

  /** Snapshot the current live state as the next retired version by
    * hard-linking its part files (fallback: copy, if the filesystem
    * refuses links). Used by append-style mutations; rewrite-style
    * mutations retire the whole directory by rename instead. */
  private def snapshotByLink(table: String): Unit = {
    val v = currentVersion(table)
    val dst = new java.io.File(s"${historyDir(table)}/v$v")
    dst.mkdirs()
    dataFiles(table).foreach { f =>
      val target = new java.io.File(dst, f.getName).toPath
      try java.nio.file.Files.createLink(target, f.toPath)
      catch { case _: UnsupportedOperationException | _: java.io.IOException =>
        java.nio.file.Files.copy(f.toPath, target); () }
    }
  }

  def truncate(table: String): Unit = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], read(table).schema)
    rewrite(table, _ => empty)
  }

  /** insert rows: missing columns filled with empty, extra columns
    * discarded (MutableData.swift:133-137). */
  def insert(table: String, rows: DataFrame): Unit = {
    val target = read(table).schema
    val aligned = rows.select(target.fields.map { f =>
      if (rows.columns.exists(_.equalsIgnoreCase(f.name)))
        col(s"`${f.name}`").cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)
    snapshotByLink(table)
    aligned.write.mode("append").parquet(dir(table))
  }

  /** import with column mapping: keys = target columns, values = source
    * columns; unmapped target columns become empty (MutableData.swift:138-141). */
  def importInto(table: String, source: DataFrame, mapping: Map[String, String]): Unit = {
    val target = read(table).schema
    val projected = source.select(target.fields.map { f =>
      mapping.get(f.name) match {
        case Some(src) => col(s"`$src`").cast(f.dataType).as(f.name)
        case None      => lit(null).cast(f.dataType).as(f.name)
      }
    }.toSeq: _*)
    snapshotByLink(table)
    projected.write.mode("append").parquet(dir(table))
  }

  /** alter: reshape to the given columns — existing columns carried over,
    * new ones empty (MutableData.swift:145-147). */
  def alter(table: String, columns: StructType): Unit =
    rewrite(table, df => df.select(columns.fields.map { f =>
      if (df.columns.exists(_.equalsIgnoreCase(f.name)))
        col(s"`${f.name}`").cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*))

  /** rename columns (MutableData.swift:149-151). */
  def renameColumns(table: String, mapping: Map[String, String]): Unit = {
    import graft.ops.WarpOps._
    rewrite(table, _.renameColumns(mapping))
  }

  /** update: for rows matching the key values, set `column` to `new` when
    * it currently equals `old` (MutableData.swift:153-156). */
  def update(table: String, key: Map[String, Any], column: String,
             oldValue: Any, newValue: Any): Unit =
    rewrite(table, { df =>
      // null-safe <=>: an empty key/old value must MATCH empty cells
      // (Warp equality: empty == empty is TRUE) — === would null the
      // predicate and silently no-op the whole mutation
      val keyMatch = key.map { case (k, v) => col(s"`$k`") <=> lit(v) }
        .reduceOption(_ && _).getOrElse(lit(true))
      df.withColumn(column,
        when(keyMatch && (col(s"`$column`") <=> lit(oldValue)), lit(newValue))
          .otherwise(col(s"`$column`")))
    })

  /** MERGE (upsert): rows of `updates` replace existing rows with the
    * same `keyCols` values and append otherwise — one copy-on-write
    * rewrite (anti-join on the keys + union), the table-format MERGE INTO
    * contract expressed through the same staging swap as every mutation.
    * Null-safe key equality, like [[update]]/[[deleteRows]]. Updates are
    * aligned to the table schema (missing columns null, extra dropped —
    * the [[insert]] contract). The updates side must carry one row per
    * key; at scale the anti-join shuffles on the key (or broadcasts when
    * the batch is small — AQE's call). */
  def merge(table: String, updates: DataFrame, keyCols: Seq[String]): Unit = {
    require(keyCols.nonEmpty, "merge needs key columns")
    val target = read(table).schema
    val aligned = updates.select(target.fields.map { f =>
      if (updates.columns.exists(_.equalsIgnoreCase(f.name)))
        col(s"`${f.name}`").cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)
    rewrite(table, { df =>
      val keyed = aligned.select(keyCols.map(c => col(s"`$c`").as(s"__u_$c")): _*).distinct()
      df.join(keyed,
          keyCols.map(c => col(s"`$c`") <=> col(s"__u_$c")).reduce(_ && _),
          "left_anti")
        .unionByName(aligned)
    })
  }

  /** delete rows identified by key tuples (MutableData.swift:158-160). */
  def deleteRows(table: String, keys: Seq[Map[String, Any]]): Unit =
    rewrite(table, { df =>
      val cond = keys.map(k =>
        k.map { case (c, v) => col(s"`$c`") <=> lit(v) }.reduce(_ && _))
        .reduceOption(_ || _).getOrElse(lit(false))
      df.filter(!cond)
    })

  /** Number of parquet data files currently backing the table. Filesystem
    * metadata only — no data scan. */
  def fileCount(table: String): Int = dataFiles(table).length

  private def dataFiles(table: String): Array[java.io.File] = {
    val fs = new java.io.File(dir(table)).listFiles()
    if (fs == null) Array.empty
    else fs.filter(f => f.isFile && f.getName.endsWith(".parquet"))
  }

  private def targetFileCount(table: String, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    val total = dataFiles(table).map(_.length).sum
    math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
  }

  /** Compact the small files an append-heavy table accumulates into
    * ~`targetBytes`-sized files. The file budget comes from FILESYSTEM
    * METADATA (sum of part-file sizes), never a row count — sizing the
    * rewrite must not cost a table scan at 100 TB. The merge itself is a
    * `coalesce`, not a `repartition`: compaction reduces file count, so no
    * shuffle is needed — each output task concatenates a handful of input
    * splits. Same staging-dir swap as every other mutation. At warehouse
    * scale with hive-partitioned tables the identical call applies per
    * partition directory; this table layout is flat, so it is table-wide.
    *
    * (Reference scope: the reference's warehouse, SQLiteStream.swift, is a
    * SQL database and has no small-file problem; this is part of the
    * parquet-warehouse scale surface, like the staging swap itself.)
    */
  def compact(table: String, targetBytes: Long = 128L << 20): Unit = {
    val n = targetFileCount(table, targetBytes)
    rewrite(table, _.coalesce(n))
  }

  /** Rewrite the table RANGE-CLUSTERED on `cols`: rows land in files whose
    * `cols` ranges are disjoint (repartitionByRange) and sorted within each
    * file (sortWithinPartitions). Parquet footers then carry tight per-file
    * and per-row-group min/max for `cols`, so any reader — Spark predicate
    * pushdown included — skips every file whose range misses the filter.
    * This is the vanilla-parquet equivalent of Z-ordering a table format:
    * the layout, not a manifest, is what makes point/range queries on the
    * cluster key cheap at 100 TB. One range-exchange (sampled boundaries)
    * plus a local sort per file; file budget again from filesystem sizes.
    */
  def clusterBy(table: String, cols: Seq[String], targetBytes: Long = 128L << 20): Unit = {
    require(cols.nonEmpty, "clusterBy needs at least one column")
    val n = targetFileCount(table, targetBytes)
    val cs = cols.map(c => col(s"`$c`"))
    rewrite(table, _.repartitionByRange(n, cs: _*).sortWithinPartitions(cs: _*))
  }

  /** Keyed DIFF of two tables ("what changed between yesterday's corpus
    * and today's?"): one row per key present in either side, classified
    * `added` / `removed` / `changed` (any non-key column differs,
    * null-safely) — unchanged keys are dropped. A full-outer join on the
    * key, nothing else; at scale both sides shuffle once on the key (or
    * the smaller broadcasts). Returns the key columns plus `diff_kind`.
    */
  def diffTables(oldTable: String, newTable: String,
                 keyCols: Seq[String]): DataFrame =
    diffFrames(read(oldTable), read(newTable), keyCols)

  /** [[diffTables]] across the version history: what changed between two
    * points in a table's mutation timeline ("which corpus rows moved
    * between yesterday's training snapshot and today's?"). */
  def diffVersions(table: String, oldV: Int, newV: Int,
                   keyCols: Seq[String]): DataFrame =
    diffFrames(readVersion(table, oldV), readVersion(table, newV), keyCols)

  private def diffFrames(o: DataFrame, n: DataFrame,
                         keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "diffTables needs key columns")
    require(o.columns.map(_.toLowerCase).sorted.sameElements(
      n.columns.map(_.toLowerCase).sorted),
      s"schemas differ: ${o.columns.toSeq} vs ${n.columns.toSeq}")
    val valueCols = o.columns.filterNot(c => keyCols.exists(_.equalsIgnoreCase(c)))
    // presence markers rather than key-null checks: a NULL key is a
    // legitimate row and must not read as "absent"
    val oR = o.toDF(o.columns.map(c => s"__o_$c"): _*)
      .withColumn("__o_present", lit(true))
    val nR = n.toDF(n.columns.map(c => s"__n_$c"): _*)
      .withColumn("__n_present", lit(true))
    val joined = oR.join(nR,
      keyCols.map(c => col(s"`__o_$c`") <=> col(s"`__n_$c`")).reduce(_ && _),
      "full_outer")
    val inOld = col("__o_present").isNotNull
    val inNew = col("__n_present").isNotNull
    val changed = valueCols.map(c => !(col(s"`__o_$c`") <=> col(s"`__n_$c`")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined
      .withColumn("diff_kind",
        when(!inOld, lit("added"))
          .when(!inNew, lit("removed"))
          .when(changed, lit("changed")))
      .filter(col("diff_kind").isNotNull)
      .select(keyCols.map(c =>
        coalesce(col(s"`__o_$c`"), col(s"`__n_$c`")).as(c)) :+ col("diff_kind"): _*)
  }

  /** 2-D locality clustering: rewrite the table ordered along a HILBERT
    * curve over two numeric columns, so files carry tight footer min/max
    * on BOTH dimensions and a range predicate on either column (or both)
    * skips most row groups. [[clusterBy]] is optimal for one key and
    * useless for the second; the space-filling curve splits the benefit.
    * Each column is first equi-width bucketed into 2^order cells between
    * its own min/max (one scalar aggregate — no scan beyond it), then the
    * curve index orders the rewrite. The curve kernel is the same
    * `fnHilbertXYToD` the formula language exposes (reference has the
    * scalar, Function.swift; the LAYOUT use is the scale extension). */
  def clusterByCurve(table: String, colX: String, colY: String,
                     order: Int = 16, targetBytes: Long = 128L << 20): Unit = {
    require(order >= 1 && order <= 30, s"order must be in [1,30], got $order")
    val n = targetFileCount(table, targetBytes)
    val side = 1L << order
    val (cx, cy) = (col(s"`$colX`").cast("double"), col(s"`$colY`").cast("double"))
    val mm = read(table).agg(min(cx), max(cx), min(cy), max(cy)).head()
    if (mm.isNullAt(0) || mm.isNullAt(2)) return // empty/all-null: nothing to lay out
    def bucket(c: Column, lo: Double, hi: Double) =
      if (hi <= lo) lit(0L)
      else least(lit(side - 1), floor((c - lit(lo)) / lit(hi - lo) * side).cast("long"))
    val d = graft.functions.WarpFunctions.fnHilbertXYToD(lit(side),
      bucket(cx, mm.getDouble(0), mm.getDouble(1)),
      bucket(cy, mm.getDouble(2), mm.getDouble(3)))
    rewrite(table, _.withColumn("__curve", d)
      .repartitionByRange(n, col("__curve"))
      .sortWithinPartitions(col("__curve"))
      .drop("__curve"))
  }

  /** copy-on-write rewrite with staging-dir swap. Rename results are
    * CHECKED: a failed swap must surface as an error, never silently drop
    * the mutation or lose the table. The displaced pre-mutation directory
    * is RETIRED into the version history (one rename — the snapshot costs
    * nothing beyond the rewrite that was happening anyway). */
  /** ANALYZE: per-column statistics of a warehouse table — row count,
    * null count, exact distinct count, min/max (rendered as strings, the
    * SUMMARIZE convention). This is the stats surface a table format
    * feeds its pruning and join-planning from. One aggregation pass; the
    * only driver action is the single stats row. Exact NDV via
    * count-distinct costs an Expand at true scale — swap in approx HLL
    * there; the exact form is the oracle-checkable gauge. */
  def analyze(table: String, cols: Seq[String] = Nil): DataFrame =
    ParquetWarehouse.stats(read(table), cols)

  /** Initialize a slowly-changing-dimension (SCD Type 2) table: every
    * source row becomes an OPEN version — `valid_from = ts`,
    * `valid_to = null`, `is_current = true`. The bookkeeping columns ride
    * as plain data; history then accrues through [[scd2Apply]]. */
  def scd2Init(table: String, df: DataFrame, ts: Long): Unit =
    create(table, df
      .withColumn("valid_from", lit(ts))
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true)))

  /** Apply a change batch to an SCD Type 2 dimension — the warehouse-
    * native "update with history" (the table-format counterpart of the
    * reference's in-place update, MutableData.swift:142-156, when the
    * consumer needs every prior version queryable by validity interval).
    *
    * Semantics per change row (change batches must be key-unique):
    *  - key exists, any attribute differs: the open version closes
    *    (`valid_to = ts`, `is_current = false`) and a new open version
    *    is inserted with `valid_from = ts`;
    *  - key exists, all attributes `<=>`-equal: NO new version (change
    *    detection, not blind versioning);
    *  - new key: one new open version.
    *
    * Scale shape: one key-equality join of the CURRENT slice against the
    * batch decides closes/inserts; historical (already-closed) versions
    * pass through untouched. No windows, no driver loops — at table-format
    * scale the same plan lands as a partition-pruned copy-on-write merge
    * touching only files holding changed keys. */
  def scd2Apply(table: String, changes: DataFrame, keyCols: Seq[String],
                ts: Long): Unit = {
    require(keyCols.nonEmpty, "scd2Apply needs key columns")
    val book = Seq("valid_from", "valid_to", "is_current")
    rewrite(table, { dim =>
      val attrCols = dim.columns.filterNot(c =>
        keyCols.contains(c) || book.contains(c)).toSeq
      val ch = changes.select((keyCols ++ attrCols)
        .map(c => col(s"`$c`").cast(dim.schema(c).dataType).as(s"__c_$c"))
        :+ lit(true).as("__c_hit"): _*)
      val keyEq = keyCols.map(c => col(s"`$c`") <=> col(s"__c_$c")).reduce(_ && _)
      val attrSame = attrCols.map(c => col(s"`$c`") <=> col(s"__c_$c"))
        .reduceOption(_ && _).getOrElse(lit(true))
      val cur = dim.filter(col("is_current"))
      val hist = dim.filter(!col("is_current"))
      // current rows annotated with their matching change (if any); the
      // __c_hit marker — not a key's null-ness — decides "matched", so
      // null business keys (joinable under <=>) stay correct
      val matched = cur.join(ch, keyEq, "left")
      val kept = matched
        .filter(col("__c_hit").isNull || attrSame)
        .select(dim.columns.map(c => col(s"`$c`")): _*)
      val closed = matched
        .filter(col("__c_hit").isNotNull && !attrSame)
        .select(dim.columns.map(c => col(s"`$c`")): _*)
        .withColumn("valid_to", lit(ts))
        .withColumn("is_current", lit(false))
      // inserts: changed keys (differing attrs) + brand-new keys
      val changedKeys = matched.filter(col("__c_hit").isNotNull && !attrSame)
        .select((keyCols ++ attrCols).map(c => col(s"__c_$c")): _*)
      val newKeys = ch.join(cur,
          keyCols.map(c => col(s"__c_$c") <=> col(s"`$c`")).reduce(_ && _),
          "left_anti")
        .select((keyCols ++ attrCols).map(c => col(s"__c_$c")): _*)
      val inserts = changedKeys.unionByName(newKeys)
        .select((keyCols ++ attrCols).map(c => col(s"__c_$c").as(c)): _*)
        .withColumn("valid_from", lit(ts))
        .withColumn("valid_to", lit(null).cast("long"))
        .withColumn("is_current", lit(true))
        .select(dim.columns.map(c => col(s"`$c`")): _*)
      hist.unionByName(kept).unionByName(closed).unionByName(inserts)
    })
  }

  /** The dimension as of time `t`: versions whose validity interval
    * covers `t` — the SCD2 point-in-time read. */
  def scd2AsOf(table: String, t: Long): DataFrame =
    read(table).filter(col("valid_from") <= t &&
      (col("valid_to").isNull || col("valid_to") > t))

  private def rewrite(table: String, f: DataFrame => DataFrame): Unit = {
    val staging = dir(table) + ".staging"
    f(read(table)).write.mode("overwrite").parquet(staging)
    val live = new java.io.File(dir(table))
    val old = new java.io.File(dir(table) + ".old")
    delete(old)
    if (!live.renameTo(old))
      throw new java.io.IOException(s"warehouse: cannot move $live aside for swap")
    if (!new java.io.File(staging).renameTo(live)) {
      old.renameTo(live) // roll back so the table survives
      throw new java.io.IOException(s"warehouse: staging swap failed for $table")
    }
    val snap = new java.io.File(s"${historyDir(table)}/v${currentVersion(table)}")
    snap.getParentFile.mkdirs()
    if (!old.renameTo(snap)) delete(old) // retention is best-effort, the swap is not
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(delete)
    if (f.exists()) f.delete()
  }
}

object ParquetWarehouse {

  /** Declarative DATA-QUALITY AUDIT — the warehouse "expectations" /
    * constraint-check surface (NOT NULL, uniqueness, value range): one
    * violations-count row per rule. Rules never fail the job; the report
    * is the artifact a pipeline gates on.
    *
    * Scale shape: all NOT-NULL and range rules evaluate in ONE
    * aggregation pass over the table; each uniqueness rule is one
    * map-side-combined distinct-count aggregate on its key set
    * (violations = rows − distinct keys, counting every row beyond the
    * first of a duplicate key). Null keys count as a key value, matching
    * SQL DISTINCT semantics. */
  def audit(df: DataFrame,
            notNull: Seq[String] = Nil,
            unique: Seq[Seq[String]] = Nil,
            ranges: Seq[(String, Double, Double)] = Nil): DataFrame = {
    require(notNull.nonEmpty || unique.nonEmpty || ranges.nonEmpty,
      "audit needs at least one rule")
    val spark = df.sparkSession
    import spark.implicits._
    val scanAggs =
      notNull.map(c =>
        sum(when(col(s"`$c`").isNull, 1L).otherwise(0L))
          .as(s"not_null:$c")) ++
      ranges.map { case (c, lo, hi) =>
        sum(when(col(s"`$c`").isNotNull &&
            (col(s"`$c`") < lo || col(s"`$c`") > hi), 1L).otherwise(0L))
          .as(s"range:$c")
      }
    val scanRules: Seq[(String, Long)] =
      if (scanAggs.isEmpty) Nil
      else {
        val row = df.agg(scanAggs.head, scanAggs.tail: _*).collect()(0)
        // positional read: a column listed twice (in notNull or ranges)
        // produces duplicate aliases, and getAs-by-name would resolve
        // both to the FIRST aggregate, silently mis-reporting the second
        row.schema.fieldNames.zipWithIndex
          .map { case (n, i) => n -> row.getLong(i) }.toSeq
      }
    val uniqueRules: Seq[(String, Long)] = unique.map { keys =>
      val r = df.agg(count(lit(1)).as("n"),
        count_distinct(struct(keys.map(c => col(s"`$c`")): _*)).as("d"))
        .collect()(0)
      s"unique:${keys.mkString(",")}" -> (r.getLong(0) - r.getLong(1))
    }
    (scanRules ++ uniqueRules).map { case (rule, v) => (rule, v, v == 0L) }
      .toDF("rule", "violations", "passed")
  }

  /** Column statistics of an arbitrary DataFrame (see
    * [[ParquetWarehouse.analyze]]): one wide aggregation, one 1-row
    * driver action, one stats row per requested column. Min/max are
    * rendered through `CAST(... AS STRING)` — exact for integral and
    * string columns; floating columns inherit Spark's double formatting
    * and should be gauged numerically instead. */
  def stats(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val names = if (cols.isEmpty) df.columns.toSeq else cols
    require(names.nonEmpty, "stats needs at least one column")
    val aggs = names.flatMap { c => Seq(
      count(col(s"`$c`")).as(s"__nn_$c"),
      countDistinct(col(s"`$c`")).as(s"__nd_$c"),
      min(col(s"`$c`")).cast("string").as(s"__mn_$c"),
      max(col(s"`$c`")).cast("string").as(s"__mx_$c")) }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*).collect()(0)
    val n = row.getLong(row.fieldIndex("__n"))
    val spark = df.sparkSession
    import spark.implicits._
    names.map { c =>
      val nn = row.getLong(row.fieldIndex(s"__nn_$c"))
      (c, n, n - nn, row.getLong(row.fieldIndex(s"__nd_$c")),
        Option(row.getString(row.fieldIndex(s"__mn_$c"))).orNull,
        Option(row.getString(row.fieldIndex(s"__mx_$c"))).orNull)
    }.toDF("col_name", "n_rows", "n_nulls", "ndv", "min_val", "max_val")
  }
}
