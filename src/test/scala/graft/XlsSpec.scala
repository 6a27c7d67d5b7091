package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_16LE
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{Tables, XlsReader}

/** Spec-following BIFF8 + CFB writer used ONLY to generate `.xls`
  * fixtures for [[XlsReader]] round-trips (MS-XLS / MS-CFB public
  * specs; no Excel available in this environment). The writer is
  * deliberately independent of the reader's code paths: it lays out
  * sectors, FAT/DIFAT, directory entries, and BIFF records from the
  * spec, so a reader bug can't cancel against a writer bug sharing
  * the same helper.
  */
object XlsTestWriter {
  private def le(n: Int): ByteBuffer = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
  def u16(v: Int): Array[Byte] = le(2).putShort(0, v.toShort).array
  def u32(v: Int): Array[Byte] = le(4).putInt(0, v).array
  def f64(d: Double): Array[Byte] = le(8).putDouble(0, d).array
  def cat(bs: Array[Byte]*): Array[Byte] = bs.flatten.toArray
  def rec(id: Int, payload: Array[Byte]): Array[Byte] =
    cat(u16(id), u16(payload.length), payload)

  def chars(s: String, utf16: Boolean): Array[Byte] =
    if (utf16) s.getBytes(UTF_16LE) else s.map(_.toByte).toArray

  /** XLUnicodeString / unformatted XLUnicodeRichExtendedString:
    * u16 cch + flags + chars */
  def xlStr(s: String, utf16: Boolean): Array[Byte] =
    cat(u16(s.length), Array[Byte](if (utf16) 1 else 0), chars(s, utf16))

  /** ShortXLUnicodeString (BOUNDSHEET name): u8 cch + flags + chars */
  def str8(s: String, utf16: Boolean): Array[Byte] =
    cat(Array[Byte](s.length.toByte, if (utf16) 1 else 0), chars(s, utf16))

  def bofGlobals: Array[Byte] =
    rec(0x0809, cat(u16(0x0600), u16(0x0005), u16(0x0dbb), u16(0x07cc), u32(0), u32(0)))
  def bofSheet: Array[Byte] =
    rec(0x0809, cat(u16(0x0600), u16(0x0010), u16(0x0dbb), u16(0x07cc), u32(0), u32(0)))
  def eof: Array[Byte] = rec(0x000a, Array.empty)

  def labelSst(rw: Int, col: Int, isst: Int): Array[Byte] =
    rec(0x00fd, cat(u16(rw), u16(col), u16(0), u32(isst)))
  def number(rw: Int, col: Int, d: Double): Array[Byte] =
    rec(0x0203, cat(u16(rw), u16(col), u16(0), f64(d)))
  /** RK encodings: integer ((v<<2)|0x2), optionally /100 (|0x1), or
    * truncated IEEE double (top 30 bits). */
  def rkInt(v: Int, x100: Boolean = false): Int = (v << 2) | 0x2 | (if (x100) 1 else 0)
  def rkDouble(d: Double): Int =
    (((java.lang.Double.doubleToLongBits(d) >> 32) & 0xfffffffcL).toInt)
  def rk(rw: Int, col: Int, rkv: Int): Array[Byte] =
    rec(0x027e, cat(u16(rw), u16(col), u16(0), u32(rkv)))
  def mulrk(rw: Int, colFirst: Int, rks: Seq[Int]): Array[Byte] =
    rec(0x00bd, cat((Seq(u16(rw), u16(colFirst)) ++
      rks.map(r => cat(u16(0), u32(r))) :+ u16(colFirst + rks.size - 1)): _*))
  def boolerr(rw: Int, col: Int, b: Boolean): Array[Byte] =
    rec(0x0205, cat(u16(rw), u16(col), u16(0),
      Array[Byte](if (b) 1 else 0, 0)))
  def label(rw: Int, col: Int, s: String, utf16: Boolean = false): Array[Byte] =
    rec(0x0204, cat(u16(rw), u16(col), u16(0), xlStr(s, utf16)))
  def formula(rw: Int, col: Int, cached: Double): Array[Byte] =
    rec(0x0006, cat(u16(rw), u16(col), u16(0), f64(cached), u16(0), u32(0), u16(0)))

  def sst(strings: Seq[(String, Boolean)]): Array[Byte] =
    rec(0x00fc, cat((Seq(u32(strings.size), u32(strings.size)) ++
      strings.map { case (s, u) => xlStr(s, u) }): _*))

  /** SST whose LAST string's characters split across a CONTINUE record
    * at the halfway point; the continuation restates its own encoding
    * flag (`contUtf16`), which per spec may differ from the head's.
    */
  def sstWithContinue(
      strings: Seq[(String, Boolean)], contUtf16: Boolean): Array[Byte] = {
    val (last, lastU) = strings.last
    val headPart = last.substring(0, last.length / 2)
    val restPart = last.substring(last.length / 2)
    val p1 = cat((Seq(u32(strings.size), u32(strings.size)) ++
      strings.init.map { case (s, u) => xlStr(s, u) } :+
      cat(u16(last.length), Array[Byte](if (lastU) 1 else 0),
        chars(headPart, lastU))): _*)
    val p2 = cat(Array[Byte](if (contUtf16) 1 else 0), chars(restPart, contUtf16))
    cat(rec(0x00fc, p1), rec(0x003c, p2))
  }

  /** Assemble the `Workbook` stream: globals substream (BOF,
    * BOUNDSHEETs, SST, EOF), then one substream per sheet; BOUNDSHEET
    * lbPlyPos offsets patched to the final sheet positions.
    */
  def workbook(
      sstRecords: Array[Byte],
      sheets: Seq[(String, Boolean, Array[Byte])]): Array[Byte] = {
    val bsPayloads = sheets.map { case (n, u, _) => cat(u32(0), u16(0), str8(n, u)) }
    val globals = cat((bofGlobals +: bsPayloads.map(p => rec(0x0085, p)) :+
      sstRecords :+ eof): _*)
    var off = globals.length
    val sheetStreams = sheets.map { case (_, _, cells) =>
      val s = cat(bofSheet, cells, eof)
      val o = off
      off += s.length
      (o, s)
    }
    val full = cat((globals +: sheetStreams.map(_._2)): _*)
    val buf = ByteBuffer.wrap(full).order(ByteOrder.LITTLE_ENDIAN)
    var pos = bofGlobals.length
    sheets.indices.foreach { i =>
      buf.putInt(pos + 4, sheetStreams(i)._1) // lbPlyPos inside the record
      pos += 4 + bsPayloads(i).length
    }
    full
  }

  // ---- CFB container --------------------------------------------------

  private val FREESECT = -1
  private val ENDOFCHAIN = -2
  private val FATSECT = -3

  /** Wrap `data` as the `Workbook` stream of a v3 CFB file. Streams
    * under 4096 bytes go through the mini-FAT/mini-stream, larger ones
    * through regular sectors — per spec, which is exactly what makes
    * both reader paths testable.
    */
  def cfb(data: Array[Byte]): Array[Byte] = {
    val sectorSize = 512
    val miniSize = 64
    val useMini = data.length < 4096
    def sectorsFor(len: Int, size: Int) = (len + size - 1) / size

    val (nMiniFatSectors, payloadSectors, miniFatEntries, miniStreamData) =
      if (useMini) {
        val nMini = sectorsFor(data.length, miniSize)
        val ms = data ++ new Array[Byte](nMini * miniSize - data.length)
        val container = sectorsFor(ms.length, sectorSize)
        val entries = (0 until nMini).map(i => if (i == nMini - 1) ENDOFCHAIN else i + 1)
        (1, container, entries, ms)
      } else (0, sectorsFor(data.length, sectorSize), Seq.empty[Int], Array.empty[Byte])

    var nFat = 1
    while (nFat * (sectorSize / 4) < nFat + 1 + nMiniFatSectors + payloadSectors) nFat += 1
    val dirId = nFat
    val miniFatId = if (useMini) Some(nFat + 1) else None
    val payloadStart = nFat + 1 + nMiniFatSectors

    val fat = Array.fill(nFat * (sectorSize / 4))(FREESECT)
    (0 until nFat).foreach(i => fat(i) = FATSECT)
    fat(dirId) = ENDOFCHAIN
    miniFatId.foreach(i => fat(i) = ENDOFCHAIN)
    (0 until payloadSectors).foreach { k =>
      fat(payloadStart + k) =
        if (k == payloadSectors - 1) ENDOFCHAIN else payloadStart + k + 1
    }

    def entry(name: String, typ: Int, start: Int, size: Long, child: Int): Array[Byte] = {
      val b = le(128)
      val nb = name.getBytes(UTF_16LE)
      var i = 0
      while (i < nb.length) { b.put(i, nb(i)); i += 1 }
      b.putShort(64, (nb.length + 2).toShort)
      b.put(66, typ.toByte)
      b.put(67, 1.toByte)
      b.putInt(68, -1)
      b.putInt(72, -1)
      b.putInt(76, child)
      b.putInt(116, start)
      b.putLong(120, size)
      b.array
    }
    val dir = cat(
      entry("Root Entry", 5,
        if (useMini) payloadStart else ENDOFCHAIN,
        if (useMini) miniStreamData.length.toLong else 0L, child = 1),
      entry("Workbook", 2,
        if (useMini) 0 else payloadStart, data.length.toLong, child = -1),
      new Array[Byte](128), new Array[Byte](128))

    val h = le(512)
    h.putLong(0, 0xe11ab1a1e011cfd0L)
    h.putShort(24, 0x003e)
    h.putShort(26, 0x0003)
    h.putShort(28, 0xfffe.toShort)
    h.putShort(30, 9)
    h.putShort(32, 6)
    h.putInt(44, nFat)
    h.putInt(48, dirId)
    h.putInt(56, 4096)
    h.putInt(60, miniFatId.getOrElse(ENDOFCHAIN))
    h.putInt(64, nMiniFatSectors)
    h.putInt(68, ENDOFCHAIN)
    h.putInt(72, 0)
    (0 until 109).foreach(i => h.putInt(76 + i * 4, if (i < nFat) i else FREESECT))

    val out = new java.io.ByteArrayOutputStream()
    out.write(h.array)
    val fatBytes = le(nFat * sectorSize)
    fat.indices.foreach(i => fatBytes.putInt(i * 4, fat(i)))
    out.write(fatBytes.array)
    out.write(dir)
    miniFatId.foreach { _ =>
      val mf = le(sectorSize)
      (0 until sectorSize / 4).foreach(i =>
        mf.putInt(i * 4, if (i < miniFatEntries.length) miniFatEntries(i) else FREESECT))
      out.write(mf.array)
    }
    val payload = if (useMini) miniStreamData else data
    out.write(payload)
    val pad = payloadSectors * sectorSize - payload.length
    if (pad > 0) out.write(new Array[Byte](pad))
    out.toByteArray
  }
}

/** Round-trips for the dependency-free `.xls` ingest (A4): a real
  * 3-sheet BIFF8 workbook in a real CFB container, both sector paths
  * (regular + mini-stream), every cell record type, unicode sheet
  * names/strings, and SST CONTINUE splits with encoding re-flags.
  */
class XlsSpec extends SparkSpec {
  import XlsTestWriter._

  private def writeXls(bytes: Array[Byte]): String = {
    val f = Files.createTempFile("graft_wb", ".xls")
    Files.write(f, bytes)
    f.toString
  }

  test("loadSheets reads a 3-sheet .xls: headers, strings, every numeric record type") {
    // sheet 1: header + 80 filler rows pushes the stream over the 4096
    // mini cutoff → regular-sector path
    val strings = Seq(
      ("ANO", false), ("REGIAO", false), ("CONSUMO", false), ("FLAG", false),
      ("2004", false), ("NORTE", false), ("Consumação ação café", true))
    val sheet1 = cat((Seq(
      labelSst(0, 0, 0), labelSst(0, 1, 1), labelSst(0, 2, 2), labelSst(0, 3, 3)) ++
      (1 to 80).flatMap { r =>
        Seq(labelSst(r, 0, 4), labelSst(r, 1, 5), number(r, 2, r * 1.5),
          boolerr(r, 3, r % 2 == 0))
      }): _*)
    // sheet 2 (unicode name): RK int, RK /100, RK double, MULRK run,
    // inline LABEL, FORMULA cached result
    val sheet2 = cat(
      labelSst(0, 0, 0), labelSst(0, 1, 1), labelSst(0, 2, 2),
      rk(1, 0, rkInt(42)), rk(1, 1, rkInt(123, x100 = true)), rk(1, 2, rkDouble(2.5)),
      mulrk(2, 0, Seq(rkInt(7), rkInt(8), rkInt(9))),
      label(3, 0, "inline"), formula(3, 1, 7.5), labelSst(3, 2, 6))
    val sheet3 = cat(labelSst(0, 0, 2), number(1, 0, 3.25))
    val wb = workbook(sst(strings), Seq(
      ("CONSUMIDORES TOTAIS", false, sheet1),
      ("Consumação", true, sheet2),
      ("resumo", false, sheet3)))
    assert(wb.length >= 4096, s"fixture must exercise the regular-sector path: ${wb.length}")
    val path = writeXls(cfb(wb))

    val sheets = Tables.loadSheets(spark, path)
    assert(sheets.keySet == Set("CONSUMIDORES TOTAIS", "Consumação", "resumo"))

    val s1 = sheets("CONSUMIDORES TOTAIS")
    assert(s1.columns.toSeq == Seq("_sheet_row", "ANO", "REGIAO", "CONSUMO", "FLAG"))
    assert(s1.count() == 80)
    val r1 = s1.filter(col("CONSUMO") === "3").head()
    assert(r1.getString(1) == "2004" && r1.getString(2) == "NORTE" &&
      r1.getString(4) == "TRUE")
    assert(r1.getInt(0) == 2, "_sheet_row carries the 1-based data-row position")
    // integral doubles render without a trailing .0; non-integral keep it
    assert(s1.filter(col("CONSUMO") === "4.5").count() == 1)

    val s2 = sheets("Consumação")
    val rows2 = s2.orderBy("_sheet_row").collect().map(_.toSeq.drop(1))
    assert(rows2(0) == Seq("42", "1.23", "2.5"))
    assert(rows2(1) == Seq("7", "8", "9"))
    assert(rows2(2) == Seq("inline", "7.5", "Consumação ação café"))

    assert(sheets("resumo").columns.toSeq == Seq("_sheet_row", "CONSUMO"))
    assert(sheets("resumo").head().getString(1) == "3.25")
  }

  test("a small .xls lands in the CFB mini-stream and still reads") {
    val strings = Seq(("k", false), ("v", false), ("x", false))
    val sheet = cat(labelSst(0, 0, 0), labelSst(0, 1, 1),
      labelSst(1, 0, 2), number(1, 1, 99))
    val wb = workbook(sst(strings), Seq(("mini", false, sheet)))
    assert(wb.length < 4096, "fixture must exercise the mini-stream path")
    val sheets = Tables.loadSheets(spark, writeXls(cfb(wb)))
    val df = sheets("mini")
    assert(df.columns.toSeq == Seq("_sheet_row", "k", "v"))
    assert(df.head().toSeq == Seq(1, "x", "99"))
  }

  test("SST strings spanning CONTINUE records decode with re-flagged encoding") {
    // compressed head + compressed continuation, and a UTF-16 head
    // whose continuation switches to compressed (legal per spec: the
    // flag byte is restated at every split)
    val longAscii = "abcdefghijklmnopqrstuvwxyz0123456789" * 3
    val utf16Head = "ção é ããõ ééé ííí úúú ôôô"
    val wb1 = workbook(
      sstWithContinue(Seq(("h", false), (longAscii, false)), contUtf16 = false),
      Seq(("s", false, cat(labelSst(0, 0, 0), labelSst(1, 0, 1)))))
    val df1 = Tables.loadSheets(spark, writeXls(cfb(wb1)))("s")
    assert(df1.head().getString(1) == longAscii)

    val wb2 = workbook(
      sstWithContinue(Seq(("h", false), (utf16Head, true)), contUtf16 = false),
      Seq(("s", false, cat(labelSst(0, 0, 0), labelSst(1, 0, 1)))))
    val df2 = Tables.loadSheets(spark, writeXls(cfb(wb2)))("s")
    assert(df2.head().getString(1) == utf16Head)
  }

  test("a non-xls file is refused loudly, not misparsed") {
    val f = Files.createTempFile("graft_notxls", ".xls")
    Files.write(f, "this is not a compound file".getBytes)
    val err = intercept[IllegalArgumentException] {
      Tables.loadSheets(spark, f.toString)
    }
    assert(err.getMessage.contains("magic"))
  }
}
