package graft.io

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable.{ArrayBuffer, ListBuffer}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S4 — Excel (.xlsx) scan (reference `preprocessing/correlation_graph_ui.py:84-87`
  * reads datasets via `pandas.read_excel`). No Excel library is available
  * offline, so this is a minimal JDK-only reader: .xlsx is a zip of XML
  * parts — unzip + StAX-parse the first worksheet (shared strings and
  * inline strings both supported), first row = header, every cell a
  * string (the lenient-scan contract; cast downstream like the CSV path).
  *
  * Scale note: the reference's Excel inputs are hand-edited sheets (KB-MB,
  * driver-side by nature). The parse happens on the driver and feeds the
  * normal DataFrame path; anything big arrives as CSV/parquet instead.
  */
object ExcelSource {

  /** Column index of a cell ref: "A1" -> 0, "BC12" -> 54. */
  private[io] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  /** Parse the first worksheet into rows of (possibly null) strings. */
  private def parseRows(path: String): Seq[Array[String]] = {
    val zip = new ZipFile(path)
    try {
      def slurpShared(): IndexedSeq[String] = {
        val e = zip.getEntry("xl/sharedStrings.xml")
        if (e == null) return IndexedSeq.empty
        val in = zip.getInputStream(e)
        try {
          val r = XMLInputFactory.newInstance().createXMLStreamReader(in)
          val out = ArrayBuffer.empty[String]
          var cur: StringBuilder = null
          var inT = false
          while (r.hasNext) {
            r.next() match {
              case XMLStreamConstants.START_ELEMENT =>
                r.getLocalName match {
                  case "si" => cur = new StringBuilder
                  case "t" => inT = true
                  case _ =>
                }
              case XMLStreamConstants.CHARACTERS if inT && cur != null =>
                cur.append(r.getText)
              case XMLStreamConstants.END_ELEMENT =>
                r.getLocalName match {
                  case "t" => inT = false
                  case "si" => out += cur.toString; cur = null
                  case _ =>
                }
              case _ =>
            }
          }
          out.toIndexedSeq
        } finally in.close()
      }
      val shared = slurpShared()
      val sheet = {
        // first worksheet part (sheet1 by the standard naming)
        val e = Option(zip.getEntry("xl/worksheets/sheet1.xml")).getOrElse {
          val en = zip.entries()
          var found: ZipEntry = null
          while (en.hasMoreElements && found == null) {
            val x = en.nextElement()
            if (x.getName.startsWith("xl/worksheets/") && x.getName.endsWith(".xml"))
              found = x
          }
          require(found != null, s"no worksheet part in $path")
          found
        }
        zip.getInputStream(e)
      }
      try {
        val r = XMLInputFactory.newInstance().createXMLStreamReader(sheet)
        val rows = ListBuffer.empty[Array[String]]
        var row: ArrayBuffer[String] = null
        var cellIdx = 0
        var cellType = ""
        var inV = false
        var inIsT = false
        var text = new StringBuilder
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case "row" => row = ArrayBuffer.empty[String]
                case "c" =>
                  val ref = Option(r.getAttributeValue(null, "r"))
                  cellIdx = ref.map(colIndex).getOrElse(row.size)
                  cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
                case "v" => inV = true; text = new StringBuilder
                case "t" if cellType == "inlineStr" => inIsT = true; text = new StringBuilder
                case _ =>
              }
            case XMLStreamConstants.CHARACTERS if inV || inIsT =>
              text.append(r.getText)
            case XMLStreamConstants.END_ELEMENT =>
              r.getLocalName match {
                case "v" =>
                  inV = false
                  val v = if (cellType == "s") shared(text.toString.trim.toInt)
                          else text.toString
                  while (row.size <= cellIdx) row += null
                  row(cellIdx) = v
                case "t" if inIsT =>
                  inIsT = false
                  while (row.size <= cellIdx) row += null
                  row(cellIdx) = text.toString
                case "row" => rows += row.toArray; row = null
                case _ =>
              }
            case _ =>
          }
        }
        rows.toSeq
      } finally sheet.close()
    } finally zip.close()
  }

  /** Read an Excel workbook into an all-string DataFrame, first row as
    * header. Dispatches on MAGIC BYTES, not extension: `PK` = .xlsx
    * (zip+XML, below), `D0 CF 11 E0` = legacy .xls (OLE2/BIFF8 —
    * [[XlsSource]]) — a mislabeled file still reads, matching
    * pandas.read_excel's engine sniffing. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val head = {
      val in = new java.io.FileInputStream(path)
      try { val b = new Array[Byte](4); in.read(b); b } finally in.close()
    }
    if ((head(0) & 0xFF) == 0xD0 && (head(1) & 0xFF) == 0xCF)
      return XlsSource.read(spark, path)
    val rows = parseRows(path)
    require(rows.nonEmpty, s"empty sheet in $path")
    val header = rows.head.map(h => if (h == null) "" else h.trim)
    val width = math.max(header.length, rows.map(_.length).max)
    val names = (0 until width).map(i =>
      if (i < header.length && header(i).nonEmpty) header(i) else s"_c$i")
    val schema = StructType(names.map(n => StructField(n, StringType, nullable = true)))
    val data = rows.tail.map(r =>
      Row.fromSeq((0 until width).map(i => if (i < r.length) r(i) else null)))
    spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
  }

  /** Minimal single-sheet .xlsx writer (inline strings) — fixture
    * generation for tests/queries; also the reference's "export to
    * Excel" parity for small driver-side tables. */
  def write(rows: Seq[Seq[String]], path: String): Unit = {
    def cellRef(c: Int, r: Int): String = {
      var n = c + 1; val sb = new StringBuilder
      while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
      sb.toString + (r + 1)
    }
    def xmlEsc(s: String): String = s.replace("&", "&amp;")
      .replace("<", "&lt;").replace(">", "&gt;")
    val sheetXml = {
      val sb = new StringBuilder(
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" + "\n" +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      rows.zipWithIndex.foreach { case (cells, ri) =>
        sb.append(s"""<row r="${ri + 1}">""")
        cells.zipWithIndex.foreach { case (v, ci) =>
          if (v != null)
            sb.append(s"""<c r="${cellRef(ci, ri)}" t="inlineStr"><is><t>${xmlEsc(v)}</t></is></c>""")
        }
        sb.append("</row>")
      }
      sb.append("</sheetData></worksheet>").toString
    }
    val parts = Seq(
      "[Content_Types].xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
          """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
          """</Types>"""),
      "_rels/.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
          """</Relationships>"""),
      "xl/workbook.xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
          """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>"""),
      "xl/_rels/workbook.xml.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
          """</Relationships>"""),
      "xl/worksheets/sheet1.xml" -> sheetXml)
    val out = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try parts.foreach { case (name, content) =>
      out.putNextEntry(new ZipEntry(name))
      out.write(content.getBytes(StandardCharsets.UTF_8))
      out.closeEntry()
    } finally out.close()
  }
}
