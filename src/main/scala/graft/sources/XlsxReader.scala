package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

/** Minimal reader for `.xlsx` workbooks (OOXML SpreadsheetML) — the
  * modern sibling of [[XlsReader]], same public-spec/no-dependency
  * approach: the container is a ZIP (`java.util.zip`), the parts are
  * XML (JDK StAX). Same contract as the BIFF8 path: sheets surface as
  * string grids, the caller's wrangling owns typing; a workbook is a
  * driver-side landing artifact (see [[XlsReader]]'s scale note).
  *
  * Parts read: `xl/workbook.xml` (sheet names + relationship ids),
  * `xl/_rels/workbook.xml.rels` (rid → worksheet part),
  * `xl/sharedStrings.xml` (rich runs concatenated per spec), and each
  * worksheet part (`<c r="A1" t="...">` cells: shared/inline/
  * formula-cached strings, booleans, numerics). External entities and
  * DTDs are disabled on the XML factory (untrusted input).
  */
object XlsxReader {

  private def factory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f
  }

  private def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out += e.getName -> zin.readAllBytes()
      zin.closeEntry()
      e = zin.getNextEntry
    }
    out.result()
  }

  private def reader(bytes: Array[Byte]): XMLStreamReader =
    factory.createXMLStreamReader(new ByteArrayInputStream(bytes))

  private def attr(r: XMLStreamReader, name: String): Option[String] = {
    var i = 0
    var found: Option[String] = None
    while (found.isEmpty && i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == name) found = Some(r.getAttributeValue(i))
      i += 1
    }
    found
  }

  /** Decode SpreadsheetML `_xHHHH_` escapes in cell text — the spec's
    * channel for chars illegal in XML 1.0 (control chars). Exactly
    * four hex digits between `_x` and `_`; anything else passes
    * through verbatim. `_x005F_` decodes to `_`, which is how a
    * literal `_xHHHH_` in the original text survives the round-trip
    * ([[XlsxWriter]] writes the matching escapes).
    */
  private[graft] def decodeEscapes(s: String): String = {
    if (!s.contains("_x")) s
    else {
      def hex(c: Char): Boolean =
        (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')
      val b = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        if (i + 6 < s.length && s.charAt(i) == '_' && s.charAt(i + 1) == 'x' &&
            s.charAt(i + 6) == '_' &&
            hex(s.charAt(i + 2)) && hex(s.charAt(i + 3)) &&
            hex(s.charAt(i + 4)) && hex(s.charAt(i + 5))) {
          b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
          i += 7
        } else { b.append(s.charAt(i)); i += 1 }
      }
      b.toString
    }
  }

  /** `A1` → 0-based column index. */
  private[graft] def colOf(ref: String): Int = {
    var c = 0
    var i = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      c = c * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    c - 1
  }

  /** Shared strings: one entry per `<si>`, rich runs' `<t>` texts
    * concatenated. */
  private def sharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val r = reader(bytes)
    val out = IndexedSeq.newBuilder[String]
    val sb = new StringBuilder
    var inSi = false
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = true; sb.clear()
            case "t" if inSi => inT = true
            case _ => ()
          }
        case XMLStreamConstants.CHARACTERS if inT =>
          sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = false; out += decodeEscapes(sb.toString)
            case "t" => inT = false
            case _ => ()
          }
        case _ => ()
      }
    }
    out.result()
  }

  /** Match the BIFF8 path's all-string rendering: integral numerics
    * drop the trailing `.0`, non-numerics pass through raw. */
  private def renderNum(raw: String): String =
    try {
      val d = raw.toDouble
      if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString
    } catch { case _: NumberFormatException => raw }

  private def parseSheet(
      bytes: Array[Byte], sst: IndexedSeq[String]): Vector[Vector[String]] = {
    val r = reader(bytes)
    val cells = Map.newBuilder[(Int, Int), String]
    var row = -1
    var nextCol = 0
    var cellCol = 0
    var cellType = ""
    var inV = false
    var inIs = false
    var inT = false
    val value = new StringBuilder
    var maxRow = -1
    var maxCol = -1
    def commit(): Unit = {
      val s = cellType match {
        case "s" => sst.lift(value.toString.trim.toInt).getOrElse("")
        case "b" => if (value.toString.trim == "1") "TRUE" else "FALSE"
        case "e" => null
        case "str" | "inlineStr" => decodeEscapes(value.toString)
        case _ => renderNum(value.toString.trim)
      }
      if (s != null && value.nonEmpty) {
        cells += (row, cellCol) -> s
        maxRow = math.max(maxRow, row); maxCol = math.max(maxCol, cellCol)
      }
    }
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              row = attr(r, "r").map(_.toInt - 1).getOrElse(row + 1)
              nextCol = 0
            case "c" =>
              cellCol = attr(r, "r").map(colOf).getOrElse(nextCol)
              nextCol = cellCol + 1
              cellType = attr(r, "t").getOrElse("")
              value.clear()
            case "v" => inV = true
            case "is" => inIs = true
            case "t" if inIs => inT = true
            case _ => ()
          }
        case XMLStreamConstants.CHARACTERS if inV || inT =>
          value.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "c" => commit()
            case "v" => inV = false
            case "is" => inIs = false
            case "t" => inT = false
            case _ => ()
          }
        case _ => ()
      }
    }
    if (maxRow < 0) Vector.empty
    else {
      val m = cells.result()
      Vector.tabulate(maxRow + 1, maxCol + 1)((rw, c) => m.getOrElse((rw, c), null))
    }
  }

  /** Parse a `.xlsx` byte array into (sheetName → dense string grid),
    * workbook sheet order preserved. */
  def sheets(bytes: Array[Byte]): Seq[(String, Vector[Vector[String]])] = {
    val parts = zipEntries(bytes)
    val wb = parts.getOrElse("xl/workbook.xml",
      throw new IllegalArgumentException("not an .xlsx: no xl/workbook.xml part"))
    // rid -> worksheet part path
    val rels: Map[String, String] =
      parts.get("xl/_rels/workbook.xml.rels").map { relBytes =>
        val r = reader(relBytes)
        val m = Map.newBuilder[String, String]
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT &&
              r.getLocalName == "Relationship") {
            val id = attr(r, "Id").getOrElse("")
            val target = attr(r, "Target").getOrElse("")
            val path =
              if (target.startsWith("/")) target.drop(1) else s"xl/$target"
            m += id -> path
          }
        }
        m.result()
      }.getOrElse(Map.empty)
    // sheet order + names + rids from workbook.xml
    val wr = reader(wb)
    val sheetDefs = Seq.newBuilder[(String, String)]
    while (wr.hasNext) {
      if (wr.next() == XMLStreamConstants.START_ELEMENT && wr.getLocalName == "sheet") {
        val name = attr(wr, "name").getOrElse("")
        val rid = attr(wr, "id").getOrElse("") // r:id resolves by local name
        sheetDefs += name -> rid
      }
    }
    val sst = parts.get("xl/sharedStrings.xml")
      .map(sharedStrings).getOrElse(IndexedSeq.empty)
    sheetDefs.result().zipWithIndex.map { case ((name, rid), i) =>
      val path = rels.getOrElse(rid, s"xl/worksheets/sheet${i + 1}.xml")
      val body = parts.getOrElse(path,
        throw new IllegalArgumentException(s"worksheet part missing: $path"))
      name -> parseSheet(body, sst)
    }
  }
}
