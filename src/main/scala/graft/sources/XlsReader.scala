package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal reader for legacy Excel `.xls` workbooks — the format the
  * reference pipeline actually downloads and reads
  * (tratamento_epe.R:57-66, `read_xls` per sheet). Two public specs,
  * no external dependencies:
  *
  *  - MS-CFB (compound file binary): the container. 512-byte sectors,
  *    a FAT of sector chains (DIFAT header entries + chained DIFAT
  *    sectors), a directory stream, and a mini-FAT/mini-stream for
  *    streams under 4096 bytes.
  *  - MS-XLS (BIFF8): the `Workbook` stream. Globals substream (SST
  *    shared strings + BOUNDSHEET sheet directory), then one substream
  *    per sheet with cell records (LABELSST, NUMBER, RK, MULRK, LABEL,
  *    BOOLERR, FORMULA/STRING).
  *
  * Scale note: a workbook is a DRIVER-SIDE landing artifact, exactly
  * as in the reference (one ~MB file fetched monthly) — parse once,
  * hand the sheets to Spark as small local DataFrames, and let the
  * wrangling pipeline write parquet for anything that needs to scale.
  * `.xls` is not splittable and never belongs on the hot path.
  *
  * Out of scope (documented, not silent): cell FORMATTING — Excel
  * serial date numbers surface as their numeric value (the caller owns
  * date conversion, as the reference's regex-on-strings wrangling
  * does); rich-text runs and phonetic data are skipped per spec
  * lengths; formulas surface as their CACHED result.
  */
object XlsReader {

  // ---------------------------------------------------------------- CFB

  private final val CfbMagic = 0xe11ab1a1e011cfd0L

  /** Parse a CFB container into its named streams. */
  private[graft] def cfbStreams(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 512 && buf.getLong(0) == CfbMagic,
      "not a CFB (.xls) file: bad magic")
    val sectorShift = buf.getShort(30).toInt
    val sectorSize = 1 << sectorShift
    val miniShift = buf.getShort(32).toInt
    val miniSize = 1 << miniShift
    val numFatSectors = buf.getInt(44)
    val firstDirSector = buf.getInt(48)
    val miniCutoff = buf.getInt(56)
    val firstMiniFatSector = buf.getInt(60)
    val firstDifatSector = buf.getInt(68)
    val numDifatSectors = buf.getInt(72)

    def sectorOffset(sector: Int): Int = 512 + sector * sectorSize

    // DIFAT: 109 FAT sector numbers in the header, then chained DIFAT
    // sectors (last 4 bytes of each = next DIFAT sector)
    val difat = Array.newBuilder[Int]
    var i = 0
    while (i < 109) {
      val s = buf.getInt(76 + i * 4)
      if (s >= 0) difat += s
      i += 1
    }
    var difatSector = firstDifatSector
    var difatGuard = 0
    while (difatSector >= 0 && difatGuard <= numDifatSectors + 1) {
      val off = sectorOffset(difatSector)
      var j = 0
      while (j < sectorSize / 4 - 1) {
        val s = buf.getInt(off + j * 4)
        if (s >= 0) difat += s
        j += 1
      }
      difatSector = buf.getInt(off + sectorSize - 4)
      difatGuard += 1
    }
    val fatSectors = difat.result()
    require(fatSectors.length >= numFatSectors, "CFB: truncated DIFAT")

    // FAT: concatenation of the FAT sectors; FAT(i) = next sector in
    // i's chain (or ENDOFCHAIN = -2)
    val fat = new Array[Int](fatSectors.length * (sectorSize / 4))
    var fi = 0
    fatSectors.foreach { s =>
      val off = sectorOffset(s)
      var j = 0
      while (j < sectorSize / 4) { fat(fi) = buf.getInt(off + j * 4); fi += 1; j += 1 }
    }

    def readChain(start: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var s = start
      var guard = 0
      while (s >= 0) {
        require(guard <= fat.length, "CFB: FAT chain cycle")
        val off = sectorOffset(s)
        out.write(bytes, off, math.min(sectorSize, bytes.length - off))
        s = fat(s)
        guard += 1
      }
      out.toByteArray
    }

    // directory entries: 128 bytes each — name (64 bytes UTF-16 +
    // length), type (1 byte at 66), start sector (u32 at 116),
    // size (u64 at 120; u32 suffices for .xls)
    val dirBytes = readChain(firstDirSector)
    case class Entry(name: String, entryType: Int, start: Int, size: Long)
    val entries = (0 until dirBytes.length / 128).map { k =>
      val e = ByteBuffer.wrap(dirBytes, k * 128, 128).order(ByteOrder.LITTLE_ENDIAN)
      val nameLen = e.getShort(k * 128 + 64).toInt
      val name =
        if (nameLen >= 2)
          new String(dirBytes, k * 128, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
        else ""
      Entry(name, e.get(k * 128 + 66).toInt, e.getInt(k * 128 + 116),
        e.getLong(k * 128 + 120))
    }

    // mini-stream: the ROOT entry's chain, addressed in mini sectors
    // through the mini-FAT
    val root = entries.find(_.entryType == 5)
    lazy val miniStream = root.map(r => readChain(r.start)).getOrElse(Array.emptyByteArray)
    lazy val miniFat: Array[Int] = {
      if (firstMiniFatSector < 0) Array.emptyIntArray
      else {
        val mf = readChain(firstMiniFatSector)
        val arr = new Array[Int](mf.length / 4)
        val mb = ByteBuffer.wrap(mf).order(ByteOrder.LITTLE_ENDIAN)
        var j = 0
        while (j < arr.length) { arr(j) = mb.getInt(j * 4); j += 1 }
        arr
      }
    }
    def readMiniChain(start: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var s = start
      var guard = 0
      while (s >= 0) {
        require(guard <= miniFat.length, "CFB: mini-FAT chain cycle")
        out.write(miniStream, s * miniSize, math.min(miniSize, miniStream.length - s * miniSize))
        s = miniFat(s)
        guard += 1
      }
      out.toByteArray
    }

    entries.filter(_.entryType == 2).map { e =>
      val data =
        if (e.size < miniCutoff) readMiniChain(e.start) else readChain(e.start)
      e.name -> data.take(e.size.toInt)
    }.toMap
  }

  // --------------------------------------------------------------- BIFF8

  /** Cursor over record payloads that may span CONTINUE records.
    * BIFF8 strings restate their compressed/UTF-16 flag byte at every
    * CONTINUE boundary that splits character data — the cursor exposes
    * that boundary so [[readString]] can honor it.
    */
  private final class Cursor(segments: IndexedSeq[Array[Byte]]) {
    private var seg = 0
    private var pos = 0
    def hasRemaining: Boolean =
      seg < segments.length && (pos < segments(seg).length || {
        var s = seg + 1
        while (s < segments.length && segments(s).isEmpty) s += 1
        s < segments.length
      })
    private def ensure(): Unit = {
      while (seg < segments.length && pos >= segments(seg).length) { seg += 1; pos = 0 }
      require(seg < segments.length, "BIFF: read past end of record")
    }
    def u8(): Int = { ensure(); val b = segments(seg)(pos) & 0xff; pos += 1; b }
    def u16(): Int = u8() | (u8() << 8)
    def u32(): Long = (u16().toLong | (u16().toLong << 16)) & 0xffffffffL
    def f64(): Double = {
      val b = new Array[Byte](8)
      var i = 0
      while (i < 8) { b(i) = u8().toByte; i += 1 }
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getDouble
    }
    def skip(n: Long): Unit = { var i = 0L; while (i < n && hasRemaining) { u8(); i += 1 } }
    /** true when the NEXT byte sits in a later segment — i.e. the read
      * position is at a CONTINUE boundary and a string's character data
      * resumes with a fresh encoding-flag byte. Must not advance the
      * segment pointer: the caller decides whether the next byte is a
      * flag or a character.
      */
    def atSegmentBoundary: Boolean =
      seg < segments.length && pos >= segments(seg).length && hasRemaining
  }

  /** XLUnicodeRichExtendedString (SST form when `rich` is true;
    * LABEL/STRING records use the same shape). cch already read when
    * cchAlreadyRead is set (BOUNDSHEET's short form reads cch as u8
    * before calling).
    */
  private def readString(c: Cursor, cch: Int): String = {
    val flags = c.u8()
    var highByte = (flags & 0x01) != 0
    val rich = (flags & 0x08) != 0
    val ext = (flags & 0x04) != 0
    val cRun = if (rich) c.u16() else 0
    val cbExt = if (ext) c.u32() else 0L
    val sb = new java.lang.StringBuilder(cch)
    var read = 0
    while (read < cch) {
      if (c.atSegmentBoundary) {
        // character data continues in the next CONTINUE record: fresh
        // flag byte decides the encoding of the REMAINING characters
        highByte = (c.u8() & 0x01) != 0
      }
      if (highByte) sb.append((c.u8() | (c.u8() << 8)).toChar)
      else sb.append((c.u8() & 0xff).toChar)
      read += 1
    }
    c.skip(cRun.toLong * 4 + cbExt)
    sb.toString
  }

  /** One parsed sheet: name + sparse cell grid as strings. */
  final case class Sheet(name: String, cells: Map[(Int, Int), String], nRows: Int, nCols: Int)

  /** Render a cell double the way `read_xls`-style all-text ingestion
    * expects: integral values without a trailing `.0`.
    */
  private def renderNum(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

  private def decodeRk(rk: Long): Double = {
    val fX100 = (rk & 0x1L) != 0
    val fInt = (rk & 0x2L) != 0
    val v =
      if (fInt) (rk.toInt >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk & 0xfffffffcL) << 32)
    if (fX100) v / 100.0 else v
  }

  /** Parse the `Workbook` BIFF8 stream into sheets of string cells. */
  private[graft] def parseWorkbook(stream: Array[Byte]): Seq[Sheet] = {
    val buf = ByteBuffer.wrap(stream).order(ByteOrder.LITTLE_ENDIAN)

    // walk records from `start` until the matching EOF; group CONTINUE
    // payloads with their owner record
    final case class Rec(id: Int, segments: IndexedSeq[Array[Byte]])
    def records(start: Int): (Seq[Rec], Int) = {
      val out = Seq.newBuilder[Rec]
      var off = start
      var open: (Int, Vector[Array[Byte]]) = null
      def flush(): Unit = if (open != null) { out += Rec(open._1, open._2); open = null }
      var done = -1
      while (done < 0 && off + 4 <= stream.length) {
        val id = buf.getShort(off).toInt & 0xffff
        val len = buf.getShort(off + 2).toInt & 0xffff
        val payload = java.util.Arrays.copyOfRange(stream, off + 4, off + 4 + len)
        if (id == 0x003c && open != null) { // CONTINUE
          open = (open._1, open._2 :+ payload)
        } else {
          flush()
          open = (id, Vector(payload))
        }
        off += 4 + len
        if (id == 0x000a) { flush(); done = off } // EOF
      }
      flush()
      (out.result(), if (done < 0) off else done)
    }

    // ---- globals substream: SST + BOUNDSHEET directory
    val (globals, _) = records(0)
    require(globals.headOption.exists(_.id == 0x0809), "BIFF: missing BOF")

    val sst: IndexedSeq[String] = globals.find(_.id == 0x00fc).map { r =>
      val c = new Cursor(r.segments)
      c.u32() // total refs
      val unique = c.u32().toInt
      (0 until unique).map { _ => readString(c, c.u16()) }
    }.getOrElse(IndexedSeq.empty)

    val bounds = globals.filter(_.id == 0x0085).map { r =>
      val c = new Cursor(r.segments)
      val lbPlyPos = c.u32().toInt
      val grbit = c.u16()
      val cch = c.u8()
      val name = readString(c, cch)
      (lbPlyPos, grbit, name)
    }

    // ---- one substream per worksheet (sheet type = high byte 0)
    bounds.filter { case (_, grbit, _) => (grbit >> 8) == 0 }.map {
      case (pos, _, name) =>
        val (recs, _) = records(pos)
        val cells = Map.newBuilder[(Int, Int), String]
        recs.foreach { r =>
          val c = new Cursor(r.segments)
          r.id match {
            case 0x00fd => // LABELSST
              val rw = c.u16(); val col = c.u16(); c.u16()
              val isst = c.u32().toInt
              if (isst < sst.length) cells += (rw, col) -> sst(isst)
            case 0x0203 => // NUMBER
              val rw = c.u16(); val col = c.u16(); c.u16()
              cells += (rw, col) -> renderNum(c.f64())
            case 0x027e => // RK
              val rw = c.u16(); val col = c.u16(); c.u16()
              cells += (rw, col) -> renderNum(decodeRk(c.u32()))
            case 0x00bd => // MULRK: run of RKs on one row
              val total = r.segments.map(_.length).sum
              val n = (total - 6) / 6
              val rw = c.u16(); val colFirst = c.u16()
              var k = 0
              while (k < n) {
                c.u16() // ixfe
                cells += (rw, colFirst + k) -> renderNum(decodeRk(c.u32()))
                k += 1
              }
            case 0x0204 => // LABEL (inline string cell)
              val rw = c.u16(); val col = c.u16(); c.u16()
              cells += (rw, col) -> readString(c, c.u16())
            case 0x0205 => // BOOLERR
              val rw = c.u16(); val col = c.u16(); c.u16()
              val v = c.u8(); val fErr = c.u8()
              if (fErr == 0) cells += (rw, col) -> (if (v != 0) "TRUE" else "FALSE")
            case 0x0006 => // FORMULA: cached numeric result (or marker)
              val rw = c.u16(); val col = c.u16(); c.u16()
              val b = new Array[Byte](8)
              var i = 0
              while (i < 8) { b(i) = c.u8().toByte; i += 1 }
              val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
              // 0xFFFF in the last two bytes marks a non-numeric cached
              // result (string follows in a STRING record — handled by
              // the next case when present); otherwise an IEEE double
              if ((bb.getShort(6) & 0xffff) != 0xffff)
                cells += (rw, col) -> renderNum(bb.getDouble(0))
            case _ => ()
          }
        }
        val m = cells.result()
        val nRows = if (m.isEmpty) 0 else m.keys.map(_._1).max + 1
        val nCols = if (m.isEmpty) 0 else m.keys.map(_._2).max + 1
        Sheet(name, m, nRows, nCols)
    }
  }

  /** Parse a `.xls` byte array into (sheetName → dense string grid). */
  def sheets(bytes: Array[Byte]): Seq[(String, Vector[Vector[String]])] = {
    val streams = cfbStreams(bytes)
    val wb = streams.getOrElse("Workbook",
      streams.getOrElse("Book",
        throw new IllegalArgumentException(
          s"no Workbook stream in .xls; streams: ${streams.keys.mkString(", ")}")))
    parseWorkbook(wb).map { s =>
      val grid = Vector.tabulate(s.nRows, s.nCols)((r, c) => s.cells.getOrElse((r, c), null))
      s.name -> grid
    }
  }
}
