package graft.sources

import graft.SparkSpecBase
import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

/** JDK-only XLSX codec (S4 scan / S6 sink). */
class XlsxSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(name: String): String =
    s"/tmp/graft_cache/xlsx_spec/$name-${System.nanoTime()}.xlsx"

  test("multi-sheet write → read roundtrip, named-sheet resolution") {
    val a = Seq(("1", "alpha"), ("2", "beta & <gamma>")).toDF("id", "name")
    val b = Seq(("x", "9"), ("y", null: String)).toDF("k", "v")
    val path = tmp("rt")
    Xlsx.writeSheets(Seq("First" -> a, "Second Sheet" -> b), path)
    val gotA = Xlsx.read(spark, path, Some("First")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(gotA == Set(("1", "alpha"), ("2", "beta & <gamma>"))) // XML escaping survives
    val gotB = Xlsx.read(spark, path, Some("Second Sheet")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(gotB == Set(("x", "9"), ("y", null))) // null -> blank cell -> null
    // default = first sheet
    assert(Xlsx.read(spark, path).columns.toSeq == Seq("id", "name"))
  }

  test("shared-string cells resolve through xl/sharedStrings.xml") {
    // hand-built workbook using the shared-strings encoding (our writer uses
    // inline strings, so this path needs its own fixture)
    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    def part(n: String, b: String): Unit = {
      zip.putNextEntry(new ZipEntry(n)); zip.write(b.getBytes("UTF-8")); zip.closeEntry()
    }
    part("xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    part("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>""")
    part("xl/sharedStrings.xml",
      """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><si><t>hdr</t></si><si><t>hello</t></si></sst>""")
    part("xl/worksheets/sheet1.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c r="A1" t="s"><v>0</v></c></row>""" +
        """<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>42</v></c></row>""" +
        """</sheetData></worksheet>""")
    zip.close()
    val sheets = Xlsx.parseWorkbook(bos.toByteArray)
    assert(sheets.length == 1)
    val (name, header, rows) = sheets.head
    // row 2 is wider than the header row: header padded (blank name), the
    // numeric cell read as its raw <v> text
    assert(name == "S" && header == Seq("hdr", ""))
    assert(rows == Seq(Seq("hello", "42")))
  }

  test("sparse rows: skipped cells come back null at their column position") {
    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    def part(n: String, b: String): Unit = {
      zip.putNextEntry(new ZipEntry(n)); zip.write(b.getBytes("UTF-8")); zip.closeEntry()
    }
    part("xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    part("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>""")
    part("xl/worksheets/sheet1.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c r="A1" t="inlineStr"><is><t>a</t></is></c><c r="C1" t="inlineStr"><is><t>c</t></is></c></row>""" +
        """<row r="2"><c r="B2"><v>7</v></c></row>""" +
        """</sheetData></worksheet>""")
    zip.close()
    val (_, header, rows) = Xlsx.parseWorkbook(bos.toByteArray).head
    assert(header == Seq("a", null, "c").map(h => if (h == null) "" else h))
    assert(rows == Seq(Seq(null, "7", null)))
  }

  test("many workbooks scan as one DataFrame via glob (one task per file)") {
    val dir = s"/tmp/graft_cache/xlsx_spec/multi-${System.nanoTime()}"
    (1 to 3).foreach { i =>
      val df = Seq((s"$i", s"wb$i")).toDF("id", "src")
      Xlsx.writeSheets(Seq("Data" -> df), s"$dir/wb$i.xlsx")
    }
    val got = Xlsx.read(spark, s"$dir/*.xlsx", Some("Data"))
    assert(got.columns.toSeq == Seq("id", "src"))
    assert(got.collect().map(_.getString(1)).sorted.toSeq == Seq("wb1", "wb2", "wb3"))
    // the scan parallelizes per FILE: 3 files -> 3 input partitions
    assert(got.rdd.getNumPartitions >= 3)
  }

  test("reads the reference's real production crosswalk workbook") {
    // produced by Excel/openxlsx, not our own writer — validates the codec
    // against shared-string encoding and real-world part layout
    val p = "/root/reference/chicago/legacy_permits/crosswalk.xlsx"
    assume(new java.io.File(p).exists())
    val df = Xlsx.read(spark, p)
    assert(df.columns.toSeq == Seq("meta_pin", "year", "tab", "original_pin"))
    val rows = df.collect()
    assert(rows.length == 49)
    // a real reviewer artifact: mostly 14-digit pin pairs, plus a zero row
    // and free-text annotation rows at the tail — all read faithfully
    val pinRows = rows.filter(r =>
      r.getString(0) != null && r.getString(0).matches("\\d{14}"))
    assert(pinRows.length >= 45)
    assert(pinRows.forall(_.getString(3).matches("\\d{14}")))
    assert(pinRows.map(_.getString(1)).toSet.subsetOf(Set("2021", "2022", "2023")))
    assert(rows.exists(r => r.getString(0) != null && r.getString(0).contains("Green font")))
  }

  test("multi-file scan aligns heterogeneous workbooks by header name") {
    val dir = s"/tmp/graft_cache/xlsx_spec/hetero-${System.nanoTime()}"
    // a_* sorts first -> its header (id, src) is the schema; the second
    // workbook has the columns REVERSED plus an extra one
    Xlsx.writeSheets(Seq("Data" -> Seq(("1", "wb1")).toDF("id", "src")), s"$dir/a_wb1.xlsx")
    Xlsx.writeSheets(Seq("Data" -> Seq(("wb2", "extra", "2")).toDF("src", "junk", "id")), s"$dir/b_wb2.xlsx")
    val got = Xlsx.read(spark, s"$dir/*.xlsx", Some("Data")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("1", "wb1"), ("2", "wb2")), s"by-name alignment broken: $got")
  }

  test("schema falls back to the first file that HAS the sheet; absent everywhere fails loudly") {
    val dir = s"/tmp/graft_cache/xlsx_spec/fallback-${System.nanoTime()}"
    // a_* sorts first but lacks the "Data" sheet — its file must contribute
    // neither schema nor rows, NOT collapse the scan to zero columns
    Xlsx.writeSheets(Seq("Other" -> Seq(("x", "y")).toDF("p", "q")), s"$dir/a_other.xlsx")
    Xlsx.writeSheets(Seq("Data" -> Seq(("1", "wb1")).toDF("id", "src")), s"$dir/b_data.xlsx")
    val got = Xlsx.read(spark, s"$dir/*.xlsx", Some("Data"))
    assert(got.columns.toSeq == Seq("id", "src"))
    assert(got.collect().map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("1", "wb1")))
    val err = intercept[IllegalArgumentException] {
      Xlsx.read(spark, s"$dir/*.xlsx", Some("Nope")).collect()
    }
    assert(err.getMessage.contains("Nope"))
  }

  test("duplicate header names disambiguate positionally instead of last-wins") {
    // two "v" columns (hand-built: real-world sheets have them, our own
    // writer can't): both must survive with distinct schema names, values
    // kept in their original positions
    val path = tmp("dupes")
    val bytes = Xlsx.buildWorkbook(
      Seq("Data" -> Seq(Seq("k", "v", "v"), Seq("a", "first", "second")))
    )
    val f = new java.io.File(path)
    f.getParentFile.mkdirs()
    java.nio.file.Files.write(f.toPath, bytes)
    val got = Xlsx.read(spark, path, Some("Data"))
    assert(got.columns.toSeq == Seq("k", "v", "v_2"))
    val r = got.collect().head
    assert((r.getString(0), r.getString(1), r.getString(2)) == (("a", "first", "second")))
  }

  test("rich-text inline strings concatenate runs; phonetic runs are skipped") {
    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    def part(n: String, b: String): Unit = {
      zip.putNextEntry(new ZipEntry(n)); zip.write(b.getBytes("UTF-8")); zip.closeEntry()
    }
    part("xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    part("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>""")
    part("xl/sharedStrings.xml",
      """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><si><t>東京</t><rPh sb="0" eb="2"><t>トウキョウ</t></rPh></si></sst>""")
    part("xl/worksheets/sheet1.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c r="A1" t="inlineStr"><is><r><t>Hello </t></r><r><t>World</t></r></is></c><c r="B1" t="s"><v>0</v></c></row>""" +
        """</sheetData></worksheet>""")
    zip.close()
    val (_, header, _) = Xlsx.parseWorkbook(bos.toByteArray).head
    assert(header == Seq("Hello World", "東京"))
  }

  test("column reference math") {
    assert(Xlsx.colRef(0) == "A" && Xlsx.colRef(25) == "Z" && Xlsx.colRef(26) == "AA")
    assert(Xlsx.colIndex("A1") == 0 && Xlsx.colIndex("Z9") == 25 && Xlsx.colIndex("BC12") == 54)
    (0 until 200).foreach(i => assert(Xlsx.colIndex(Xlsx.colRef(i) + "1") == i))
  }
}
