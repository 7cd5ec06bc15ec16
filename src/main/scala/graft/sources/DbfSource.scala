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
}
