package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S4 XLSX scan + S6 workbook sink with NO external codec: an .xlsx is a
  * zip of XML parts (ECMA-376), so JDK-only `java.util.zip` + StAX cover
  * the reference's xlsx surface (`pd.read_excel` of review sheets,
  * `xlsxwriter` workbook with Permits + Universe-of-Valid-PINs sheets —
  * chicago/permit_cleaning.py:962-1134,
  * format_reviewed_permits_for_upload.py:71-90).
  *
  * Scale stance:
  *   - READ is executor-parallel per FILE: `binaryFile` source → flatMap
  *     parse, one task per workbook. A single workbook is reviewer-scale by
  *     format contract (Excel caps a sheet at 2^20 rows) — many workbooks
  *     (e.g. one per legacy year×tab) scan in parallel across executors.
  *   - WRITE collects to the driver: justified for the same reason — a
  *     workbook is a reviewer artifact with a hard 2^20-row ceiling, never
  *     bulk data (bulk output goes to the parquet/CSV sinks). Enforced with
  *     an explicit row-count guard rather than silently truncating.
  *
  * Cells are read/written as strings (the reference's sheets are typed
  * downstream by the pipeline's own parsers, SURVEY §2.9); formatting/
  * protection decoration stays scoped out per SURVEY §7.4.
  */
object Xlsx {

  /** Hard ceiling per sheet (the xlsx format's own row limit). */
  val MaxRows: Int = 1048576

  // ======================= read =======================

  /** All sheets' (sheetName, header, rows) parsed from one workbook's bytes.
    * Cell types handled: shared string (t="s"), inline string
    * (t="inlineStr"), formula-string (t="str"), and raw numeric/plain <v>.
    * Missing cells inside a row are null; rows are padded to header width.
    */
  private[graft] def parseWorkbook(bytes: Array[Byte]): Seq[(String, Seq[String], Seq[Seq[String]])] = {
    val parts = readZip(bytes)
    val shared = parts.get("xl/sharedStrings.xml").map(parseSharedStrings).getOrElse(Vector.empty)
    val sheetTargets = sheetNameToTarget(parts)
    sheetTargets.map { case (name, target) =>
      val rows = parts
        .get(target)
        .map(parseSheet(_, shared))
        .getOrElse(Seq.empty)
      val width = rows.foldLeft(0)((w, r) => math.max(w, r.length))
      val padded = rows.map(r => r.padTo(width, null: String))
      if (padded.isEmpty) (name, Seq.empty[String], Seq.empty[Seq[String]])
      else (name, padded.head.map(h => if (h == null) "" else h), padded.tail)
    }
  }

  private def readZip(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    var e: ZipEntry = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out += e.getName -> zin.readAllBytes()
      e = zin.getNextEntry
    }
    zin.close()
    out.result()
  }

  /** workbook.xml sheet order + name, resolved through workbook.xml.rels to
    * the worksheet part path.
    */
  private def sheetNameToTarget(parts: Map[String, Array[Byte]]): Seq[(String, String)] = {
    val rels: Map[String, String] = parts
      .get("xl/_rels/workbook.xml.rels")
      .map { b =>
        collectAttrs(b, "Relationship", Seq("Id", "Target")).map { a =>
          val t = a("Target")
          a("Id") -> (if (t.startsWith("/")) t.drop(1) else "xl/" + t)
        }.toMap
      }
      .getOrElse(Map.empty)
    parts
      .get("xl/workbook.xml")
      .map { b =>
        collectAttrs(b, "sheet", Seq("name", "id")).map { a =>
          a("name") -> rels.getOrElse(a("id"), "xl/worksheets/sheet1.xml")
        }
      }
      .getOrElse(Seq.empty)
  }

  /** StAX pass collecting the wanted attributes of every `elem` element.
    * The r:id attribute is matched by local name ("id") to dodge namespace
    * prefix variance across producers.
    */
  private def collectAttrs(
      bytes: Array[Byte],
      elem: String,
      wanted: Seq[String]
  ): Seq[Map[String, String]] = {
    val r = newReader(bytes)
    val out = Seq.newBuilder[Map[String, String]]
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == elem) {
        val m = (0 until r.getAttributeCount).map { i =>
          r.getAttributeLocalName(i) -> r.getAttributeValue(i)
        }.toMap
        if (wanted.forall(m.contains)) out += m
      }
    }
    r.close()
    out.result()
  }

  private def parseSharedStrings(bytes: Array[Byte]): Vector[String] = {
    val r = newReader(bytes)
    val out = Vector.newBuilder[String]
    var inSi = false
    var inRPh = false // phonetic (furigana) runs are annotations, not value
    val sb = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" =>
          inSi = true; sb.clear()
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
          inSi = false; out += sb.toString
        case XMLStreamConstants.START_ELEMENT if r.getLocalName == "rPh" =>
          inRPh = true
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "rPh" =>
          inRPh = false
        case XMLStreamConstants.START_ELEMENT if inSi && !inRPh && r.getLocalName == "t" =>
          sb.append(r.getElementText) // getElementText advances past </t>
        case _ => ()
      }
    }
    r.close()
    out.result()
  }

  private def parseSheet(bytes: Array[Byte], shared: Vector[String]): Seq[Seq[String]] = {
    val r = newReader(bytes)
    val rows = Seq.newBuilder[Seq[String]]
    var cells: scala.collection.mutable.ArrayBuffer[String] = null
    var cellCol = -1
    var cellType = ""
    var inIs = false
    var inRPh = false
    val text = new StringBuilder
    val isBuf = new StringBuilder // inline strings may span several rich-text <t> runs
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => cells = scala.collection.mutable.ArrayBuffer.empty[String]
            case "c" if cells != null =>
              val ref = Option(r.getAttributeValue(null, "r"))
              cellCol = ref.map(colIndex).getOrElse(cells.length)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
            case "is"  => inIs = true; isBuf.clear()
            case "rPh" => inRPh = true
            case "v" if cells != null =>
              text.clear(); text.append(r.getElementText)
              putCell(cells, cellCol, decode(text.toString, cellType, shared))
            case "t" if inIs && !inRPh && cells != null =>
              isBuf.append(r.getElementText)
            case _ => ()
          }
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "row" => rows += cells.toSeq; cells = null
            case "is" =>
              inIs = false
              if (cells != null) putCell(cells, cellCol, isBuf.toString)
            case "rPh" => inRPh = false
            case _     => ()
          }
        case _ => ()
      }
    }
    r.close()
    rows.result()
  }

  private def putCell(
      cells: scala.collection.mutable.ArrayBuffer[String],
      col: Int,
      v: String
  ): Unit = {
    while (cells.length <= col) cells += (null: String)
    cells(col) = v
  }

  private def decode(v: String, t: String, shared: Vector[String]): String = t match {
    case "s" => shared.lift(v.trim.toInt).orNull
    case _   => v
  }

  /** "BC12" -> 0-based column index 54. */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  private def newReader(bytes: Array[Byte]) = {
    val f = XMLInputFactory.newInstance()
    // never resolve external entities from untrusted workbook XML
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }

  /** Duplicate header names get pandas-style `_2`, `_3`… suffixes (first
    * occurrence keeps the bare name). Applied to BOTH the schema header and
    * each file's header before by-name alignment, so the nth "amount"
    * column of one file lands in the nth "amount" slot of the schema —
    * without this the by-name slot map silently last-wins and the
    * StructType carries duplicate field names.
    */
  private def mangleDupes(header: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    header.map { h =>
      val n = seen.getOrElse(h, 0) + 1
      seen(h) = n
      if (n == 1) h else s"${h}_$n"
    }
  }

  /** Scan every workbook under `path` (glob ok) as one DataFrame: the
    * header row of `sheet` (default: each workbook's first sheet) in the
    * lexicographically first file CONTAINING that sheet becomes the
    * all-string schema (a workbook lacking the sheet contributes no rows
    * and no schema; if NO file has it, the scan fails loudly instead of
    * returning a zero-column frame). Every workbook's rows are aligned to
    * that schema BY HEADER NAME — reordered columns land correctly, columns
    * a file lacks are null, extra columns are dropped, duplicate header
    * names are disambiguated positionally (see [[mangleDupes]]). One task
    * per workbook file via the binaryFile source, so many workbooks parse
    * in parallel across executors.
    */
  def read(spark: SparkSession, path: String, sheet: Option[String] = None): DataFrame = {
    val bin = spark.read.format("binaryFile").load(path).select("path", "content")
    // header probe runs distributed (one parse per file, executors); only
    // the per-file (path, header) pairs come back to the driver
    val headers: Array[(String, Seq[String])] = bin.rdd.flatMap { row =>
      val all = parseWorkbook(row.getAs[Array[Byte]](1))
      sheet.fold(all.headOption)(s => all.find(_._1 == s))
        .map(c => row.getString(0) -> c._2)
    }.collect()
    require(
      headers.nonEmpty,
      s"no workbook under $path contains ${sheet.fold("any sheet")(s => s"sheet '$s'")}"
    )
    val refHeader = mangleDupes(headers.minBy(_._1)._2).toIndexedSeq
    val parsed = bin.select("content").rdd.flatMap { row =>
      val all = parseWorkbook(row.getAs[Array[Byte]](0))
      val chosen = sheet.fold(all.headOption)(s => all.find(_._1 == s))
      chosen.toSeq.flatMap { case (_, fileHeader, rows) =>
        // align this workbook's columns to the reference header by name
        val slot: Map[String, Int] = mangleDupes(fileHeader).zipWithIndex.toMap
        val take: IndexedSeq[Int] = refHeader.map(h => slot.getOrElse(h, -1))
        rows.map { r =>
          Row.fromSeq(take.map(i => if (i >= 0 && i < r.length) r(i) else null))
        }
      }
    }
    val schema = StructType(refHeader.map(h => StructField(h, StringType, nullable = true)))
    spark.createDataFrame(parsed, schema)
  }

  // ======================= write =======================

  /** Write DataFrames as one workbook, one sheet each (header = columns,
    * cells = string render, null = blank cell). Collects to the driver —
    * a workbook is a reviewer-scale artifact by format contract; exceeding
    * the xlsx row ceiling fails loudly instead of truncating.
    */
  def writeSheets(sheets: Seq[(String, DataFrame)], path: String): Unit = {
    val content = sheets.map { case (name, df) =>
      val header = df.columns.toSeq
      val rendered = df
        .select(df.columns.map(c => col(c).cast("string")): _*)
        .collect()
        .map(r => (0 until r.length).map(i => r.getString(i)))
        .toSeq
      require(
        rendered.length < MaxRows,
        s"sheet '$name' has ${rendered.length} rows; xlsx caps at $MaxRows — use the parquet/CSV sinks for bulk data"
      )
      (name, header +: rendered)
    }
    val bytes = buildWorkbook(content)
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    java.nio.file.Files.write(f.toPath, bytes)
  }

  /** Minimal valid ECMA-376 package: content types, root rels, workbook,
    * workbook rels, one sheet part per sheet. Inline strings only (no
    * sharedStrings part needed); no styles (formatting is out of scope).
    */
  private[graft] def buildWorkbook(sheets: Seq[(String, Seq[Seq[String]])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    def part(name: String, body: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(body.getBytes("UTF-8"))
      zip.closeEntry()
    }
    val n = sheets.length
    part(
      "[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        (1 to n).map(i =>
          s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>"""
        ).mkString +
        """</Types>"""
    )
    part(
      "_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        """</Relationships>"""
    )
    part(
      "xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
        sheets.zipWithIndex.map { case ((name, _), i) =>
          s"""<sheet name="${escape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
        }.mkString +
        """</sheets></workbook>"""
    )
    part(
      "xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        (1 to n).map(i =>
          s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>"""
        ).mkString +
        """</Relationships>"""
    )
    sheets.zipWithIndex.foreach { case ((_, rows), i) =>
      val body = new StringBuilder(
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>"""
      )
      rows.zipWithIndex.foreach { case (cells, ri) =>
        body.append(s"""<row r="${ri + 1}">""")
        cells.zipWithIndex.foreach { case (v, ci) =>
          if (v != null)
            body.append(
              s"""<c r="${colRef(ci)}${ri + 1}" t="inlineStr"><is><t xml:space="preserve">${escape(v)}</t></is></c>"""
            )
        }
        body.append("</row>")
      }
      body.append("</sheetData></worksheet>")
      part(s"xl/worksheets/sheet${i + 1}.xml", body.toString)
    }
    zip.close()
    bos.toByteArray
  }

  /** 0-based column index -> "A", "Z", "AA", ... */
  private[graft] def colRef(idx: Int): String = {
    var i = idx + 1
    val sb = new StringBuilder
    while (i > 0) {
      val rem = (i - 1) % 26
      sb.insert(0, ('A' + rem).toChar)
      i = (i - 1) / 26
    }
    sb.toString
  }

  /** XML-escape; control characters below 0x20 (except tab/LF/CR) are
    * illegal in XML 1.0 even as numeric references, so they are dropped —
    * the same lossy mapping every spreadsheet writer applies.
    */
  private def escape(s: String): String =
    s.flatMap {
      case '&'  => "&amp;"
      case '<'  => "&lt;"
      case '>'  => "&gt;"
      case '"'  => "&quot;"
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => ""
      case c    => c.toString
    }
}
