package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** dBase (DBF) source (reference: WarpConduit/Sources/DBFStream.swift:132,
  * built on shapelib). Implements the public dBase III layout directly:
  * 32-byte header (record count at 4..7 LE, header/record sizes at
  * 8..11), 32-byte field descriptors terminated by 0x0D, then fixed-width
  * ASCII records with a deletion flag byte.
  *
  * Field types: C(haracter) -> string, N/F -> double (long when the
  * descriptor has no decimals), L(ogical) -> boolean, D(ate yyyymmdd) ->
  * date; anything else -> string.
  *
  * DBF is a small-file legacy interchange format (the reference treats it
  * the same way); files parse driver-side like its single-stream reader.
  * A directory of DBF files can be unioned by the caller. */
object DbfSource {

  private final case class Field(name: String, ftype: Char, len: Int, decimals: Int)

  def read(spark: SparkSession, path: String): DataFrame = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    def u8(i: Int): Int = bytes(i) & 0xFF
    val recordCount = u8(4) | (u8(5) << 8) | (u8(6) << 16) | (u8(7) << 24)
    val headerSize = u8(8) | (u8(9) << 8)
    val recordSize = u8(10) | (u8(11) << 8)

    // field descriptors: 32 bytes each from offset 32 until 0x0D
    val fields = scala.collection.mutable.ListBuffer[Field]()
    var off = 32
    while (off < headerSize && u8(off) != 0x0D) {
      val nameEnd = (off until off + 11).find(i => bytes(i) == 0).getOrElse(off + 11)
      val name = new String(bytes, off, nameEnd - off, "ISO-8859-1").trim
      fields += Field(name, u8(off + 11).toChar, u8(off + 16), u8(off + 17))
      off += 32
    }

    // a DBF N field is at most 18 digits, which always fits Long — typing
    // zero-decimal fields as double would corrupt ids beyond 2^53
    val schema = StructType(fields.map { f =>
      val dt = f.ftype match {
        case 'N' | 'F' => if (f.decimals == 0 && f.len <= 18) LongType else DoubleType
        case 'L'       => BooleanType
        case 'D'       => DateType
        case _         => StringType
      }
      StructField(f.name, dt)
    }.toSeq)

    val rows = (0 until recordCount).flatMap { r =>
      val base = headerSize + r * recordSize
      if (base + recordSize > bytes.length || u8(base) == 0x2A) None // deleted
      else {
        var pos = base + 1
        val vals = fields.map { f =>
          // ISO-8859-1: DBF text is code-page bytes, not ASCII — replacing
          // accented characters with U+FFFD would corrupt every C field
          val raw = new String(bytes, pos, f.len, "ISO-8859-1").trim
          pos += f.len
          if (raw.isEmpty) null
          else f.ftype match {
            case 'N' | 'F' =>
              if (f.decimals == 0 && f.len <= 18)
                scala.util.Try(raw.toLong).getOrElse(null)
              else scala.util.Try(raw.toDouble).getOrElse(null)
            case 'L' => // '?' marks unknown in dBase logicals
              if ("YyTt".contains(raw.head)) true
              else if ("NnFf".contains(raw.head)) false
              else null
            case 'D' => scala.util.Try(
              java.sql.Date.valueOf(java.time.LocalDate.parse(raw,
                java.time.format.DateTimeFormatter.BASIC_ISO_DATE))).getOrElse(null)
            case _ => raw
          }
        }
        Some(Row.fromSeq(vals.toSeq))
      }
    }
    val list = new java.util.ArrayList[Row](rows.size)
    rows.foreach(list.add)
    spark.createDataFrame(list, schema)
  }

  /** dBase III writer (reference: QBEDBFStep.swift export). DBF is a
    * single-file desktop EXPORT format: rows stream through the driver
    * (`toLocalIterator`), exactly like the reference's single-stream
    * writer — use it for bounded results (a report, a dimension table),
    * never as a warehouse sink. Column names truncate to DBF's
    * 10-character limit; strings are written as ISO-8859-1; string field
    * widths come from ONE aggregate pass over the data (distributed);
    * unsupported column types fail fast. */
  def write(df: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions.{col, count, length, lit, max}
    val strCols = df.schema.fields.filter(_.dataType == StringType).map(_.name)
    // ONE aggregate pass decides the string widths AND the header record
    // count, so a changing/nondeterministic source cannot give the header
    // a different row count than the layout was sized for
    val (widths: Map[String, Int], n: Long) = {
      val aggs = strCols.map(c => max(length(col(s"`$c`"))).as(c)) :+
        count(lit(1)).as("__n")
      val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      (strCols.zipWithIndex.map { case (c, i) =>
        c -> (if (r.isNullAt(i)) 1 else math.min(254, math.max(1, r.getInt(i))))
      }.toMap, r.getLong(strCols.length))
    }
    val fields = df.schema.fields.map { f =>
      val name = f.name.take(10)
      f.dataType match {
        case StringType => Field(name, 'C', widths(f.name), 0)
        case LongType | IntegerType | ShortType | ByteType => Field(name, 'N', 18, 0)
        case DoubleType | FloatType => Field(name, 'N', 18, 6)
        case BooleanType => Field(name, 'L', 1, 0)
        case DateType => Field(name, 'D', 8, 0)
        case dt => throw new IllegalArgumentException(
          s"DBF cannot store column ${f.name} of type ${dt.simpleString}")
      }
    }
    val recordSize = 1 + fields.map(_.len).sum
    val headerSize = 32 + fields.length * 32 + 1
    require(n <= Int.MaxValue, "DBF record count is a 32-bit field")

    val out = new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path)))
    try {
      val header = java.nio.ByteBuffer.allocate(32)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val today = java.time.LocalDate.now()
      header.put(0x03.toByte).put((today.getYear - 1900).toByte)
        .put(today.getMonthValue.toByte).put(today.getDayOfMonth.toByte)
      header.putInt(n.toInt).putShort(headerSize.toShort).putShort(recordSize.toShort)
      out.write(header.array())
      fields.foreach { f =>
        val fd = new Array[Byte](32)
        val nb = f.name.getBytes("ISO-8859-1")
        System.arraycopy(nb, 0, fd, 0, math.min(nb.length, 10))
        fd(11) = f.ftype.toByte; fd(16) = f.len.toByte; fd(17) = f.decimals.toByte
        out.write(fd)
      }
      out.write(0x0D)

      val pads = " " * 254
      def padLeft(s: String, len: Int): String =
        if (s.length >= len) s else pads.substring(0, len - s.length) + s
      // C values truncate at the field width (dBase semantics; width is the
      // observed max capped at 254, so truncation only fires at the cap) —
      // writing past the slot would shift every later field and row
      def fitRight(s: String, len: Int): String =
        if (s.length > len) s.substring(0, len)
        else if (s.length == len) s
        else s + pads.substring(0, len - s.length)

      val it = df.toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        out.write(' ')
        var i = 0
        while (i < fields.length) {
          val f = fields(i)
          val cell: String =
            if (row.isNullAt(i)) pads.substring(0, f.len)
            else f.ftype match {
              case 'C' => fitRight(row.get(i).toString, f.len)
              case 'N' =>
                val s =
                  if (f.decimals == 0) row.get(i) match {
                    case l: Long => l.toString
                    case x => x.toString
                  }
                  else String.format(java.util.Locale.ROOT, s"%.${f.decimals}f",
                    Double.box(row.get(i) match {
                      case d: Double => d
                      case fl: Float => fl.toDouble
                    }))
                if (s.length > f.len) throw new IllegalArgumentException(
                  s"value $s overflows DBF field ${f.name}(${f.len})")
                padLeft(s, f.len)
              case 'L' => if (row.getBoolean(i)) "T" else "F"
              case 'D' =>
                val d8 = row.getAs[java.sql.Date](i).toLocalDate
                  .format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE)
                if (d8.length != 8) throw new IllegalArgumentException(
                  s"date $d8 does not fit DBF's yyyymmdd field ${f.name}")
                d8
            }
          out.write(cell.getBytes("ISO-8859-1"))
          i += 1
        }
      }
      out.write(0x1A)
    } finally out.close()
  }
}
