package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._

import graft.sources.{Tables, XlsxReader}

/** Round-trips for the `.xlsx` (SpreadsheetML) workbook path — fixture
  * ZIPs are assembled from raw XML part strings, independent of the
  * reader's parsing code.
  */
class XlsxSpec extends SparkSpec {

  private def zip(parts: (String, String)*): Array[Byte] = {
    val bout = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bout)
    parts.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes(UTF_8))
      z.closeEntry()
    }
    z.close()
    bout.toByteArray
  }

  private val ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
  private val rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

  private def fixture: Array[Byte] = zip(
    "xl/workbook.xml" ->
      s"""<?xml version="1.0"?>
         |<workbook xmlns="$ns" xmlns:r="$rns"><sheets>
         |  <sheet name="dados" sheetId="1" r:id="rId1"/>
         |  <sheet name="Consumação" sheetId="2" r:id="rId2"/>
         |</sheets></workbook>""".stripMargin,
    "xl/_rels/workbook.xml.rels" ->
      s"""<?xml version="1.0"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
         |  <Relationship Id="rId1" Type="$rns/worksheet" Target="worksheets/sheet1.xml"/>
         |  <Relationship Id="rId2" Type="$rns/worksheet" Target="worksheets/sheet2.xml"/>
         |</Relationships>""".stripMargin,
    "xl/sharedStrings.xml" ->
      s"""<?xml version="1.0"?>
         |<sst xmlns="$ns" count="4" uniqueCount="4">
         |  <si><t>ano</t></si>
         |  <si><t>consumo</t></si>
         |  <si><r><t>ação </t></r><r><t>café</t></r></si>
         |  <si><t>2024</t></si>
         |</sst>""".stripMargin,
    // sheet1: header from shared strings, numerics (integral + float),
    // a boolean, an inline string, and an r-less cell (sequential col)
    "xl/worksheets/sheet1.xml" ->
      s"""<?xml version="1.0"?>
         |<worksheet xmlns="$ns"><sheetData>
         |  <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>
         |  <row r="2"><c r="A2" t="s"><v>3</v></c><c r="B2"><v>42</v></c><c r="C2" t="b"><v>1</v></c></row>
         |  <row r="3"><c t="s"><v>3</v></c><c><v>3.14</v></c><c t="inlineStr"><is><t>solto</t></is></c></row>
         |</sheetData></worksheet>""".stripMargin,
    // sheet2: sparse row/col refs leave gaps as nulls
    "xl/worksheets/sheet2.xml" ->
      s"""<?xml version="1.0"?>
         |<worksheet xmlns="$ns"><sheetData>
         |  <row r="1"><c r="A1" t="s"><v>2</v></c><c r="C1"><v>7</v></c></row>
         |  <row r="3"><c r="B3" t="str"><v>cached</v></c></row>
         |</sheetData></worksheet>""".stripMargin)

  test("loadSheets reads a .xlsx: shared/rich/inline strings, numerics, booleans, gaps") {
    val f = Files.createTempFile("graft_wb", ".xlsx")
    Files.write(f, fixture)
    val sheets = Tables.loadSheets(spark, f.toString)
    assert(sheets.keySet == Set("dados", "Consumação"))

    val s1 = sheets("dados")
    assert(s1.columns.toSeq == Seq("_sheet_row", "ano", "consumo", "ação café"),
      "rich-run shared string must concatenate")
    val rows = s1.orderBy("_sheet_row").collect().map(_.toSeq.drop(1))
    assert(rows(0) == Seq("2024", "42", "TRUE"))
    assert(rows(1) == Seq("2024", "3.14", "solto"),
      "r-less cells advance sequentially; inline strings pass through")

    val s2grid = XlsxReader.sheets(fixture).toMap.apply("Consumação")
    assert(s2grid(0).toSeq == Seq("ação café", null, "7"), "column gap must stay null")
    assert(s2grid(1).forall(_ == null), "skipped row r=2 must be all-null")
    assert(s2grid(2)(1) == "cached", "formula cached string (t=str)")
  }

  test("colOf decodes multi-letter column references") {
    assert(XlsxReader.colOf("A1") == 0)
    assert(XlsxReader.colOf("Z9") == 25)
    assert(XlsxReader.colOf("AA3") == 26)
    assert(XlsxReader.colOf("AZ1") == 51)
    assert(XlsxReader.colOf("BA12") == 52)
  }

  test("a non-xlsx zip is refused loudly") {
    val f = Files.createTempFile("graft_notx", ".xlsx")
    Files.write(f, zip("hello.txt" -> "nope"))
    val err = intercept[IllegalArgumentException] {
      Tables.loadSheets(spark, f.toString)
    }
    assert(err.getMessage.contains("workbook.xml"))
  }
}
