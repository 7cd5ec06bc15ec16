package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.values.WarpLanguage

/** CSV source/sink with the reference's semantics
  * (reference: WarpConduit/Sources/CSVStream.swift:19-181 reader,
  * Warp/Sources/Model/Steps/QBECSVStep.swift:135 writer).
  *
  * Reader contract:
  *  - header row de-duplicated like the reference: a second "a" becomes
  *    "a_B", a third "a_C" (CSVStream.swift:64-77 via
  *    Column.defaultNameForIndex, Schema.swift:65-77);
  *  - without headers, columns are named A, B, ... Z, AA ... (base-26);
  *  - cells are strings; empty cell = empty (null). With a locale, cells
  *    that spell a localized number (grouping/decimal separators of the
  *    language, Language.swift:502-516) are normalized to exchange form
  *    ('.' decimal, no grouping) so the Warp coercion kernel reads them;
  *  - [[inferTyped]] optionally lifts all-numeric columns to long/double —
  *    the columnar analog of the reference's per-cell Value typing (one
  *    extra aggregate scan; scale-safe partial aggregation).
  *
  * The reader is a thin veneer over `spark.read.csv`, so at scale it keeps
  * Spark's splittable, parallel CSV scan and pushdown on derived frames.
  */
object CsvSource {

  /** Excel-style base-26 column name for an index (Schema.swift:65-77). */
  def defaultNameForIndex(index: Int): String = {
    var i = index
    val sb = new StringBuilder
    while ({
      sb.insert(0, ('A' + i % 26).toChar)
      i = i / 26 - 1
      i >= 0
    }) ()
    sb.result()
  }

  /** De-duplicate header names the reference way: n-th repeat of `name`
    * becomes `name_<base26(n)>` (CSVStream.swift:64-77). */
  def dedupHeaders(names: Seq[String]): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    names.foreach { n =>
      if (!out.contains(n)) out += n
      else {
        // reference counts existing occurrences to pick the suffix; we
        // additionally bump until unique (the reference appends into an
        // OrderedSet, which would silently drop a third duplicate)
        var c = out.count(_ == n)
        var candidate = s"${n}_${defaultNameForIndex(c)}"
        while (out.contains(candidate)) {
          c += 1; candidate = s"${n}_${defaultNameForIndex(c)}"
        }
        out += candidate
      }
    }
    out.toList
  }

  /** Normalize cells that spell a localized number to exchange form; other
    * cells pass through untouched. */
  def normalizeLocalized(c: Column, lang: WarpLanguage): Column = {
    val g = java.util.regex.Pattern.quote(lang.groupingSeparator)
    val d = java.util.regex.Pattern.quote(lang.decimalSeparator)
    val localizedNum = s"^[+-]?(\\d{1,3}($g\\d{3})+|\\d+)($d\\d+)?([eE][+-]?\\d+)?$$"
    val normalized = {
      val ungrouped = regexp_replace(c, g, "")
      if (lang.decimalSeparator == ".") ungrouped
      else regexp_replace(ungrouped, d, ".")
    }
    when(c.rlike(localizedNum), normalized).otherwise(c)
  }

  /** Lexicographically-first plain data file under `path` (the path itself
    * when it is a file) — the one whose first line is the header. Hidden
    * and metadata files (`_SUCCESS`, dotfiles) are skipped like Spark's
    * own file index does. */
  private def firstDataFile(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    if (!st.isDirectory) path
    else fs.listStatus(p).iterator
      .filter(s => s.isFile && s.getLen > 0)
      .map(_.getPath)
      .filterNot(n => n.getName.startsWith("_") || n.getName.startsWith("."))
      .map(_.toString).toSeq.sorted
      .headOption.getOrElse(path)
  }

  /** Read a CSV into an all-string DataFrame under the reference's header
    * and locale rules. */
  def read(spark: SparkSession, path: String, sep: String = ",",
           hasHeaders: Boolean = true,
           locale: Option[WarpLanguage] = Some(WarpLanguage.en)): DataFrame = {
    val base = spark.read
      .option("header", hasHeaders.toString)
      .option("sep", sep)
      .option("nullValue", "")
      .option("inferSchema", "false")
      .csv(path)
    val named =
      if (hasHeaders) {
        // re-derive OUR names from the raw header tokens (Spark mangles
        // duplicates its own way); the header row is re-read through the
        // CSV parser so quoting/escaping match the data rows. The header
        // file is resolved EXPLICITLY (lexicographically-first data file,
        // matching Spark's own multi-file header choice) — limit(1) over a
        // directory scan returns whichever split is packed first, not the
        // first line of the first file.
        val headerFile = firstDataFile(spark, path)
        val headerRows = spark.read.option("header", "false").option("sep", sep)
          .csv(headerFile).limit(1).collect()
        if (headerRows.isEmpty) throw new IllegalArgumentException(
          s"no header row found in $headerFile (empty or blank-line-only file)")
        val rawHeader = headerRows(0).toSeq.map(v => if (v == null) "" else v.toString)
        base.toDF(dedupHeaders(rawHeader): _*)
      } else {
        base.toDF(base.columns.indices.map(defaultNameForIndex): _*)
      }
    locale match {
      case Some(lang) if lang.decimalSeparator != "." || lang.groupingSeparator != "" =>
        named.select(named.columns.map(c =>
          normalizeLocalized(col(s"`$c`"), lang).as(c)): _*)
      case _ => named
    }
  }

  /** Lift all-numeric string columns to typed columns: a column whose
    * non-null cells all parse as Warp numbers becomes double (long when
    * every cell is integral). One aggregate pass over the data decides the
    * schema — the columnar analog of per-cell Value typing. */
  def inferTyped(df: DataFrame): DataFrame = {
    import graft.values.Warp
    val checks = df.columns.flatMap { c =>
      val v = col(s"`$c`")
      val n = Warp.num(v)
      Seq(
        max(when(v.isNotNull && n.isNull, 1).otherwise(0)).as(s"__bad_$c"),
        // fractional OR outside Long range: either way the long cast is
        // unsafe (ANSI CAST_OVERFLOW), so such columns stay double
        max(when(n.isNotNull && (n =!= floor(n) || abs(n) > 9.2e18), 1)
          .otherwise(0)).as(s"__frac_$c"),
        // every non-null cell long-parses DIRECTLY from its string — the
        // only route that keeps ids beyond 2^53 exact (double round-trips
        // lose low bits; DbfSource parses longs directly for this reason)
        max(when(v.isNotNull && v.try_cast(LongType).isNull, 1)
          .otherwise(0)).as(s"__notlong_$c"),
        max(when(v.isNotNull, 1).otherwise(0)).as(s"__any_$c"))
    }
    val r = df.agg(checks.head, checks.tail: _*).collect()(0)
    df.select(df.columns.map { c =>
      val bad = r.getAs[Int](s"__bad_$c") == 1
      val frac = r.getAs[Int](s"__frac_$c") == 1
      val notlong = r.getAs[Int](s"__notlong_$c") == 1
      val any = r.getAs[Int](s"__any_$c") == 1
      val v = col(s"`$c`")
      if (bad || !any) v.as(c)
      else if (!notlong) v.try_cast(LongType).as(c) // exact string->long
      else if (frac) graft.values.Warp.num(v).as(c)
      // integral-by-value spellings ("1.0", "2e3"): double->long fallback
      else graft.values.Warp.num(v).cast(LongType).as(c)
    }: _*)
  }

  /** Write a DataFrame as CSV with the reference's value formatting
    * (QBECSVStep.swift:135, Language.csvRow Language.swift:518-560):
    * booleans as 1/0, timestamps as ISO-8601 UTC, '.' decimals, header
    * row. Strings quote only when needed (the reference always quotes —
    * indistinguishable after any conforming reader). */
  def write(df: DataFrame, path: String, sep: String = ","): Unit = {
    val out = df.select(df.schema.fields.map { f =>
      val c = col(s"`${f.name}`")
      f.dataType match {
        case BooleanType => // null stays null (empty cell), not 0
          when(c.isNull, lit(null).cast(IntegerType))
            .when(c, 1).otherwise(0).as(f.name)
        case TimestampType => // instant: render in UTC regardless of session tz
          date_format(to_utc_timestamp(c, current_timezone()),
            "yyyy-MM-dd'T'HH:mm:ss'Z'").as(f.name)
        case TimestampNTZType => // naive wall time: NO zone suffix — a 'Z'
          // would relabel the wall time as a UTC instant (silently shifting
          // its meaning for any conforming reader)
          date_format(c, "yyyy-MM-dd'T'HH:mm:ss").as(f.name)
        case _ => c.as(f.name)
      }
    }: _*)
    out.write.mode("overwrite")
      .option("header", "true").option("sep", sep).option("nullValue", "")
      .csv(path)
  }
}
