package graft.pipeline

import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S1/S4 — minimal self-contained xlsx source/sink (the reference's primary
  * format: `pd.read_excel` at /root/reference/preprocessing.py:303,
  * `to_excel` at preprocessing.py:531). An xlsx is a zip of XML parts; this
  * adapter reads/writes exactly the parts needed (sharedStrings + one
  * worksheet), driver-side BY DESIGN: the reference's workbooks are ~5k-row
  * report/interchange files. Data-scale IO stays on Parquet — this exists so
  * a reference user can point the engine at their existing workbooks.
  *
  * All cells surface as strings (header row = column names), mirroring the
  * pipeline's cast-with-null-on-error stage (PreprocessPipeline) doing type
  * assignment downstream.
  */
object ExcelIO {

  private val MaxRows = 1048575 // xlsx sheet limit minus header

  /** Read one worksheet into a DataFrame of strings (first row = header).
    * `sheet` is an entry name (`sheet1`…`sheetN`) or a DISPLAY name — the
    * reference addresses sheets by their (Korean) display names
    * (pd.read_excel sheet_name; preprocessing.py:303), so both resolve.
    */
  def readXlsx(spark: SparkSession, path: String,
               sheet: String = "sheet1"): DataFrame = {
    val zip = new ZipFile(path)
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zip.getInputStream(e)))
        .getOrElse(IndexedSeq.empty)
      val entry = Option(zip.getEntry(s"xl/worksheets/$sheet.xml"))
        .orElse(resolveDisplayName(zip, sheet)
          .flatMap(p => Option(zip.getEntry(p))))
        .getOrElse(throw new IllegalArgumentException(
          s"no worksheet '$sheet' in $path; entries: " +
            zip.entries().asIterator().asScala
              .map(_.getName).filter(_.startsWith("xl/worksheets"))
              .mkString(", ")))
      val rows = parseSheet(zip.getInputStream(entry), shared)
      require(rows.nonEmpty, s"empty worksheet '$sheet' in $path")
      val header = rows.head.map(h => Option(h).getOrElse(""))
      val width = header.length
      val data = rows.tail.map { r =>
        Row.fromSeq(r.padTo(width, null).take(width).toSeq)
      }
      val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(data.toSeq), schema)
    } finally zip.close()
  }

  /** Write a DataFrame (stringified) as a single-sheet xlsx workbook. */
  def writeXlsx(df: DataFrame, path: String): Unit =
    writeWorkbook(Seq("Sheet1" -> df), path)

  /** S5 — multi-sheet workbook: the reference's `pd.ExcelWriter` with named
    * sheets (preprocessing.py:552-569, LDA_Analysis.py:553-565) as ONE xlsx
    * artifact. Sheet entry names are sheet1..sheetN (readXlsx's `sheet`
    * parameter); display names carry the given (e.g. Korean) titles. One
    * shared-strings table serves every sheet.
    */
  def writeWorkbook(sheets: Seq[(String, DataFrame)], path: String): Unit = {
    require(sheets.nonEmpty, "a workbook needs at least one sheet")
    sheets.foreach { case (name, _) =>
      require(name.nonEmpty && name.length <= 31 && !name.exists("[]:*?/\\".contains(_)),
        s"invalid xlsx sheet name: '$name'")
    }
    // shared-strings table (also exercises the reader's t="s" path)
    val strings = ArrayBuffer.empty[String]
    val index = scala.collection.mutable.HashMap.empty[String, Int]
    def sid(s: String): Int =
      index.getOrElseUpdate(s, { strings += s; strings.length - 1 })
    val sheetXmls = sheets.map { case (_, df) =>
      val header = df.columns.toIndexedSeq
      val rows = df.collect().map(_.toSeq.map(v => if (v == null) null else v.toString))
      require(rows.length <= MaxRows,
        s"xlsx sink is for report-scale tables (${rows.length} rows)")
      val allRows = header.map(identity[String]) +: rows.toIndexedSeq
      val sheetXml = new StringBuilder(
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      allRows.zipWithIndex.foreach { case (r, i) =>
        sheetXml.append(s"""<row r="${i + 1}">""")
        r.zipWithIndex.foreach { case (v, j) =>
          if (v != null)
            sheetXml.append(
              s"""<c r="${colRef(j)}${i + 1}" t="s"><v>${sid(v)}</v></c>""")
        }
        sheetXml.append("</row>")
      }
      sheetXml.append("</sheetData></worksheet>")
      sheetXml.toString
    }
    val n = sheets.size
    val sstXml = strings.map(s => s"<si><t xml:space=\"preserve\">${xmlEscape(s)}</t></si>")
      .mkString(
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          s"""<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${strings.length}" uniqueCount="${strings.length}">""",
        "", "</sst>")
    val sheetOverrides = (1 to n).map(i =>
      s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
      .mkString
    val sheetDecls = sheets.zipWithIndex.map { case ((name, _), i) =>
      s"""<sheet name="${xmlEscape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    val sheetRels = (1 to n).map(i =>
      s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""")
      .mkString
    val parts = Seq(
      "[Content_Types].xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
          sheetOverrides +
          """<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>""" +
          """</Types>"""),
      "_rels/.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
          """</Relationships>"""),
      "xl/workbook.xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
          s"""<sheets>$sheetDecls</sheets></workbook>"""),
      "xl/_rels/workbook.xml.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          sheetRels +
          s"""<Relationship Id="rId${n + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>""" +
          """</Relationships>"""),
      "xl/sharedStrings.xml" -> sstXml) ++
      sheetXmls.zipWithIndex.map { case (xml, i) =>
        s"xl/worksheets/sheet${i + 1}.xml" -> xml
      }
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try parts.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    } finally zos.close()
  }

  /** Display name → worksheet part path, via workbook.xml (name → r:id)
    * and workbook.xml.rels (r:id → target). None when the name is unknown
    * or the workbook parts are absent.
    */
  private def resolveDisplayName(zip: ZipFile, name: String): Option[String] = {
    def attrs(entry: String, element: String,
              keys: Seq[String]): Seq[Map[String, String]] =
      Option(zip.getEntry(entry)).map { e =>
        val reader = XMLInputFactory.newInstance()
          .createXMLStreamReader(zip.getInputStream(e))
        val out = ArrayBuffer.empty[Map[String, String]]
        while (reader.hasNext) {
          if (reader.next() == XMLStreamConstants.START_ELEMENT &&
            reader.getLocalName == element) {
            out += keys.flatMap { k =>
              // r:id is namespaced; match on local name
              (0 until reader.getAttributeCount)
                .find(i => reader.getAttributeLocalName(i) == k)
                .map(i => k -> reader.getAttributeValue(i))
            }.toMap
          }
        }
        reader.close()
        out.toSeq
      }.getOrElse(Seq.empty)
    for {
      decl <- attrs("xl/workbook.xml", "sheet", Seq("name", "id"))
        .find(_.get("name").contains(name))
      rid <- decl.get("id")
      rel <- attrs("xl/_rels/workbook.xml.rels", "Relationship",
        Seq("Id", "Target")).find(_.get("Id").contains(rid))
      target <- rel.get("Target")
    } yield if (target.startsWith("/")) target.drop(1) else s"xl/$target"
  }

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"; case '<' => "&lt;"; case '>' => "&gt;"
      case '"' => "&quot;"; case c => c.toString
    }

  /** 0-based column index → A1-style column letters. */
  def colRef(j: Int): String = {
    var n = j
    val sb = new StringBuilder
    while (n >= 0) { sb.insert(0, ('A' + n % 26).toChar); n = n / 26 - 1 }
    sb.toString
  }

  /** A1-style reference → 0-based column index. */
  def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1
  }

  private def parseSharedStrings(in: java.io.InputStream): IndexedSeq[String] = {
    val reader = XMLInputFactory.newInstance().createXMLStreamReader(in)
    val out = ArrayBuffer.empty[String]
    var current: StringBuilder = null
    var inT = false
    while (reader.hasNext) {
      reader.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          reader.getLocalName match {
            case "si" => current = new StringBuilder
            case "t" => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inT && current != null =>
          current.append(reader.getText)
        case XMLStreamConstants.END_ELEMENT =>
          reader.getLocalName match {
            case "si" => out += current.toString; current = null
            case "t" => inT = false
            case _ =>
          }
        case _ =>
      }
    }
    reader.close()
    out.toIndexedSeq
  }

  /** Rows of (possibly sparse) cells as strings; shared-string, inline,
    * formula-string and numeric cells supported.
    */
  private def parseSheet(in: java.io.InputStream,
                         shared: IndexedSeq[String]): IndexedSeq[Array[String]] = {
    val reader = XMLInputFactory.newInstance().createXMLStreamReader(in)
    val rows = ArrayBuffer.empty[Array[String]]
    var cells: ArrayBuffer[String] = null
    var cellCol = -1
    var cellType = ""
    var inV = false
    var inIsT = false
    var value: StringBuilder = null
    def endCell(): Unit = if (cellCol >= 0 && value != null) {
      while (cells.length <= cellCol) cells += null
      val raw = value.toString
      cells(cellCol) = cellType match {
        case "s" => shared(raw.trim.toInt)
        case _ => raw
      }
      cellCol = -1; value = null
    }
    while (reader.hasNext) {
      reader.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          reader.getLocalName match {
            case "row" => cells = ArrayBuffer.empty[String]
            case "c" =>
              endCell()
              cellCol = Option(reader.getAttributeValue(null, "r"))
                .map(colIndex).getOrElse(if (cells == null) 0 else cells.length)
              cellType = Option(reader.getAttributeValue(null, "t")).getOrElse("n")
            case "v" => inV = true; value = new StringBuilder
            case "t" if cellType == "inlineStr" =>
              inIsT = true; if (value == null) value = new StringBuilder
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inV || inIsT =>
          value.append(reader.getText)
        case XMLStreamConstants.END_ELEMENT =>
          reader.getLocalName match {
            case "v" => inV = false
            case "t" if inIsT => inIsT = false
            case "c" => endCell()
            case "row" => rows += cells.toArray; cells = null
            case _ =>
          }
        case _ =>
      }
    }
    reader.close()
    rows.toIndexedSeq
  }

}
