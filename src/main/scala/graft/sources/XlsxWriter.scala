package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal writer for `.xlsx` workbooks (OOXML SpreadsheetML) — the
  * exact INVERSE of [[XlsxReader]], same public-spec/no-dependency
  * approach: the container is a ZIP (`java.util.zip`), the parts are
  * hand-rendered XML. Closes the one reference-adjacent surface the
  * reader left open (the reference discusses workbook export next to
  * its csv path, tratamento_epe.rmd:359): graft can now both ingest
  * AND land a human-facing workbook artifact.
  *
  * Contract (mirrors the reader's): a workbook is a DRIVER-SIDE
  * landing artifact — sheets are string grids, small by nature (the
  * format itself caps at 2^20 rows; anything at scale lands as
  * parquet/csv through the ordinary sinks). Every cell writes as an
  * inline string (`t="inlineStr"`, `xml:space="preserve"`) — no
  * sharedStrings table, no numeric formats — so
  * `XlsxReader.sheets(XlsxWriter.write(g)) == g` holds cell for cell
  * (null and empty cells are skipped on write and surface as null on
  * read, the reader's dense-grid convention). ZIP entry timestamps
  * are pinned so identical grids produce identical bytes run to run.
  */
object XlsxWriter {

  /** Hard cap from the SpreadsheetML spec (2^20 rows per sheet). */
  val MaxRows: Int = 1 << 20

  private def xmlEscape(s: String): String = {
    // SpreadsheetML escape discipline: a literal `_x` in cell text is
    // written `_x005F_x` FIRST, so the `_xHHHH_` sequences emitted for
    // control chars below are unambiguous and [[XlsxReader]] (and
    // Excel) can decode both back losslessly
    val esc = s.replace("_x", "_x005F_x")
    val b = new StringBuilder(esc.length + 8)
    esc.foreach {
      case '&' => b.append("&amp;")
      case '<' => b.append("&lt;")
      case '>' => b.append("&gt;")
      case '"' => b.append("&quot;")
      // control chars below 0x20 (except \t \n) are illegal in XML
      // 1.0 — a stray NUL in a cell would corrupt the whole part. \r
      // is legal but XML parsers normalize it to \n in text content,
      // so it must ride the escape channel to survive the round-trip
      case c if c < ' ' && c != '\t' && c != '\n' =>
        b.append(f"_x${c.toInt}%04X_")
      case c => b.append(c)
    }
    b.toString
  }

  // sheet-name attributes take plain XML escaping only: the reader
  // returns attribute values verbatim, and _xHHHH_ decoding is a cell
  // -text convention — escaping names would break the name round-trip
  private def attrEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")

  /** 0-based column index → `A1`-style column letters (colOf inverse). */
  private[graft] def colName(i: Int): String = {
    var n = i
    val b = new StringBuilder
    while (n >= 0) {
      b.insert(0, ('A' + n % 26).toChar)
      n = n / 26 - 1
    }
    b.toString
  }

  private def sheetXml(grid: Seq[Seq[String]]): String = {
    val b = new StringBuilder
    b.append("<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n")
    b.append("<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
    grid.zipWithIndex.foreach { case (cells, r) =>
      if (cells.exists(c => c != null && c.nonEmpty)) {
        b.append(s"""<row r="${r + 1}">""")
        cells.zipWithIndex.foreach { case (v, c) =>
          if (v != null && v.nonEmpty) {
            b.append(s"""<c r="${colName(c)}${r + 1}" t="inlineStr"><is><t xml:space="preserve">""")
            b.append(xmlEscape(v))
            b.append("</t></is></c>")
          }
        }
        b.append("</row>")
      }
    }
    b.append("</sheetData></worksheet>")
    b.toString
  }

  /** Render (sheetName, string grid) pairs into `.xlsx` bytes. */
  def write(sheets: Seq[(String, Seq[Seq[String]])]): Array[Byte] = {
    require(sheets.nonEmpty, "at least one sheet")
    require(sheets.map(_._1).distinct.size == sheets.size,
      "sheet names must be unique")
    sheets.foreach { case (name, grid) =>
      require(name.nonEmpty && name.length <= 31 &&
        !name.exists("[]:*?/\\".contains(_)),
        s"illegal sheet name for xlsx: '$name'")
      require(grid.size <= MaxRows,
        s"sheet '$name' has ${grid.size} rows; xlsx caps at $MaxRows — " +
          "a grid that size is not a workbook artifact, land it as parquet")
    }
    val n = sheets.size
    val contentTypes = {
      val overrides = (1 to n).map(i =>
        s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n" +
        "<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/content-types\">" +
        "<Default Extension=\"rels\" ContentType=\"application/vnd.openxmlformats-package.relationships+xml\"/>" +
        "<Default Extension=\"xml\" ContentType=\"application/xml\"/>" +
        "<Override PartName=\"/xl/workbook.xml\" ContentType=\"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml\"/>" +
        overrides + "</Types>"
    }
    val rootRels =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n" +
        "<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
        "<Relationship Id=\"rId1\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument\" Target=\"xl/workbook.xml\"/>" +
        "</Relationships>"
    val workbook = {
      val defs = sheets.zipWithIndex.map { case ((name, _), i) =>
        s"""<sheet name="${attrEscape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
      }.mkString
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n" +
        "<workbook xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\" " +
        "xmlns:r=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships\">" +
        s"<sheets>$defs</sheets></workbook>"
    }
    val wbRels = {
      val rels = (1 to n).map(i =>
        s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""").mkString
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n" +
        "<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
        rels + "</Relationships>"
    }
    val parts: Seq[(String, String)] =
      Seq("[Content_Types].xml" -> contentTypes,
        "_rels/.rels" -> rootRels,
        "xl/workbook.xml" -> workbook,
        "xl/_rels/workbook.xml.rels" -> wbRels) ++
        sheets.zipWithIndex.map { case ((_, grid), i) =>
          s"xl/worksheets/sheet${i + 1}.xml" -> sheetXml(grid)
        }
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    parts.foreach { case (name, body) =>
      val e = new ZipEntry(name)
      e.setTime(0L) // pinned timestamp: same grids → same bytes
      zos.putNextEntry(e)
      zos.write(body.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }
}
