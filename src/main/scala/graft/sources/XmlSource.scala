package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** XML sink/source in the reference's export document shape
  * (reference: Warp/Sources/Model/Steps/QBEXMLStep.swift:41-110):
  * {{{
  * <graph xmlns="http://dialogicplatform.com/data/1.0">
  *   <status>ok</status> <meta>...</meta> <details>...</details>
  *   <axes>...</axes>
  *   <grid>
  *     <row><cell>colA</cell><cell>colB</cell></row>   <!-- header -->
  *     <row><cell>1</cell><cell>x</cell></row>          <!-- data -->
  *   </grid>
  * </graph>
  * }}}
  * An XML document is a single sequential file, so like the reference the
  * writer streams rows through the driver (`toLocalIterator` — no full
  * collect) and the reader parses driver-side. This is an interchange
  * format, not a bulk-storage path.
  */
object XmlSource {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  def write(df: DataFrame, path: String, title: String = ""): Unit = {
    val w = java.nio.file.Files.newBufferedWriter(java.nio.file.Paths.get(path))
    try {
      w.write("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
      w.write("<graph xmlns=\"http://dialogicplatform.com/data/1.0\">\n")
      w.write("  <status>ok</status>\n")
      w.write("  <meta><system>graft</system><domain></domain><input></input></meta>\n")
      w.write(s"  <details><type>multidimensional</type><title>${esc(title)}</title>" +
        "<source></source><comment></comment></details>\n")
      w.write("  <axes><axis pos=\"X1\">X</axis><axis pos=\"Y1\">Y</axis></axes>\n")
      w.write("  <grid>\n")
      w.write(df.columns.map(c => s"<cell>${esc(c)}</cell>")
        .mkString("    <row>", "", "</row>\n"))
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        w.write((0 until r.length).map { i =>
          val v = r.get(i)
          s"<cell>${if (v == null) "" else esc(v.toString)}</cell>"
        }.mkString("    <row>", "", "</row>\n"))
      }
      w.write("  </grid>\n</graph>\n")
    } finally w.close()
  }

  /** Read a graph/grid document back: first grid row is the header
    * (de-duplicated like CSV), every cell a string. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val doc = dbf.newDocumentBuilder().parse(new java.io.File(path))
    val rows = doc.getElementsByTagName("row")
    def cells(i: Int): Seq[String] = {
      val r = rows.item(i).asInstanceOf[org.w3c.dom.Element]
      val cs = r.getElementsByTagName("cell")
      (0 until cs.getLength).map(j => cs.item(j).getTextContent)
    }
    require(rows.getLength > 0, s"no <row> elements in $path")
    val header = CsvSource.dedupHeaders(cells(0))
    val schema = StructType(header.map(StructField(_, StringType)))
    val data = new java.util.ArrayList[Row](math.max(0, rows.getLength - 1))
    (1 until rows.getLength).foreach { i =>
      val vs = cells(i).map(v => if (v.isEmpty) null else v)
      data.add(Row.fromSeq(vs.padTo(header.size, null).take(header.size)))
    }
    spark.createDataFrame(data, schema)
  }
}
