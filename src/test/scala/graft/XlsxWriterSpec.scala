package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.{Tables, XlsxReader, XlsxWriter}

/** The workbook EXPORT path: write → read round-trips through the
  * independent reader, plus the driver-artifact guards.
  */
class XlsxWriterSpec extends SparkSpec {

  test("write → XlsxReader.sheets round-trips grids cell for cell") {
    val g1: Seq[Seq[String]] = Seq(
      Seq("ano", "consumo", "nota"),
      Seq("2024", "42", "escaped &<>\"' ok"),
      Seq("2025", "3.14", "ação café"))
    val g2: Seq[Seq[String]] = Seq(
      Seq("k", "v"),
      Seq(null, "gap stays null"), // null cell skipped on write
      Seq("  padded  ", "x")) // xml:space=preserve keeps edges
    val bytes = XlsxWriter.write(Seq("dados" -> g1, "Consumação" -> g2))
    val back = XlsxReader.sheets(bytes)
    assert(back.map(_._1) == Seq("dados", "Consumação"), "sheet order preserved")
    assert(back.head._2.map(_.toSeq) == g1.map(_.toSeq))
    assert(back(1)._2.map(_.toSeq) == g2.map(_.toSeq))
  }

  test("control chars and literal _xHHHH_ text round-trip via the SpreadsheetML escape channel") {
    // control chars below 0x20 are illegal in XML 1.0 and must ride
    // the _xHHHH_ channel; \r is legal but parser-normalized to \n,
    // so it rides too; literal `_x0041_`-style TEXT must come back as
    // text (the _x005F_ escape on write), not decode to 'A'
    val g: Seq[Seq[String]] = Seq(
      Seq("nul\u0000mid", "\u0001", "end\u001f"),
      Seq("cr\rlf\ncrlf\r\n", "tab\tok", "_x0041_ stays text"),
      Seq("_x", "_x005F_", "plain _ underscore"))
    val back = XlsxReader.sheets(XlsxWriter.write(Seq("esc" -> g)))
    assert(back.head._2.map(_.toSeq) == g.map(_.toSeq),
      s"escape round-trip broke: ${back.head._2}")
  }

  test("fuzz: random unicode grids round-trip write -> read cell for cell") {
    // deterministic generator (seeded): astral-plane chars, control
    // chars, XML-special chars, _x-escape lookalikes, 255-char cells,
    // ragged rows. Empty/null cells skip on write and surface as null
    // on read (the dense-grid convention); trailing all-null rows and
    // columns drop entirely — the expectation below applies that
    // normalization before comparing.
    val rnd = new scala.util.Random(42)
    val alphabets: IndexedSeq[String] = IndexedSeq(
      "abcXYZ09 ", "&<>\"'", "_x005F_", "_x0041_", "_x",
      "\u00e7\u00e3\u00e9\u00df\u4e2d\u6587",
      "\ud83d\ude00\ud83c\udf55", // astral plane (surrogate pairs)
      "\u0000\u0001\u0007\u001f", "\t\n\r", "  ")
    def repairSurrogates(s: String): String = {
      // a split surrogate pair is invalid UTF-16 — no text encoding
      // can carry it, so the generator repairs rather than emits it
      val chars = s.toCharArray
      var i = 0
      while (i < chars.length) {
        if (Character.isHighSurrogate(chars(i)) &&
            (i + 1 >= chars.length || !Character.isLowSurrogate(chars(i + 1))))
          chars(i) = 'H'
        else if (Character.isLowSurrogate(chars(i)) &&
            (i == 0 || !Character.isHighSurrogate(chars(i - 1))))
          chars(i) = 'L'
        i += 1
      }
      new String(chars)
    }
    def cell(): String =
      if (rnd.nextInt(10) == 0) null
      else {
        val len = rnd.nextInt(4) match {
          case 0 => rnd.nextInt(5)
          case 1 => 255 // the long-cell class
          case _ => rnd.nextInt(30)
        }
        val b = new StringBuilder
        while (b.length < len) {
          val a = alphabets(rnd.nextInt(alphabets.size))
          b.append(a.charAt(rnd.nextInt(a.length)))
        }
        repairSurrogates(b.toString)
      }
    for (trial <- 0 until 25) {
      val nRows = 1 + rnd.nextInt(8)
      val grid: Seq[Seq[String]] =
        (0 until nRows).map(_ => (0 to rnd.nextInt(6)).map(_ => cell()))
      val nCols = grid.map(_.size).max
      val dense = grid.map(r =>
        (0 until nCols).map(c => r.lift(c) match {
          case Some(v) if v != null && v.nonEmpty => v
          case _ => null
        }))
      val lastRow = dense.lastIndexWhere(_.exists(_ != null))
      val expected =
        if (lastRow < 0) Vector.empty
        else {
          val lastCol = (0 until nCols)
            .lastIndexWhere(c => dense.exists(_(c) != null))
          dense.take(lastRow + 1).map(_.take(lastCol + 1).toVector).toVector
        }
      val back = XlsxReader.sheets(XlsxWriter.write(Seq("f" -> grid)))
      assert(back.head._2 == expected,
        s"trial $trial: wrote $grid\nexpected $expected\ngot ${back.head._2}")
    }
  }

  test("identical grids produce identical bytes (pinned zip timestamps)") {
    val g = Seq("s" -> Seq(Seq("a", "b"), Seq("1", "2")))
    assert(XlsxWriter.write(g).sameElements(XlsxWriter.write(g)))
  }

  test("colName is colOf's inverse across the multi-letter boundary") {
    for (i <- 0 until 800)
      assert(XlsxReader.colOf(XlsxWriter.colName(i) + "1") == i, s"col $i")
    assert(XlsxWriter.colName(0) == "A")
    assert(XlsxWriter.colName(25) == "Z")
    assert(XlsxWriter.colName(26) == "AA")
    assert(XlsxWriter.colName(51) == "AZ")
    assert(XlsxWriter.colName(52) == "BA")
  }

  test("illegal sheet names, duplicate names, and oversized grids are refused") {
    val g = Seq(Seq("a"))
    intercept[IllegalArgumentException] { XlsxWriter.write(Seq("a/b" -> g)) }
    intercept[IllegalArgumentException] { XlsxWriter.write(Seq("" -> g)) }
    intercept[IllegalArgumentException] {
      XlsxWriter.write(Seq("x" -> g, "x" -> g))
    }
    intercept[IllegalArgumentException] { XlsxWriter.write(Seq.empty) }
  }

  test("writeXlsx → loadSheets round-trips a frame on the all-string contract") {
    import spark.implicits._
    val df = Seq((2024, "norte", 10.5), (2025, "sul", 3.0))
      .toDF("ano", "regiao", "valor")
      .orderBy("ano") // sheet row order is the frame's order — caller sorts
    val dir = Files.createTempDirectory("graft_wbout")
    val path = dir.resolve("out.xlsx").toString
    Tables.writeXlsx(spark, path, Seq("folha" -> df))
    val back = Tables.loadSheets(spark, path)("folha")
    assert(back.columns.toSeq == Seq("_sheet_row", "ano", "regiao", "valor"))
    val rows = back.orderBy("_sheet_row").collect().map(_.toSeq.drop(1))
    assert(rows(0) == Seq("2024", "norte", "10.5"))
    assert(rows(1) == Seq("2025", "sul", "3.0"))
  }

  test("writeXlsx refuses a frame past maxRows before collecting it whole") {
    import spark.implicits._
    val big = spark.range(100).select(col("id").cast("string").as("v"))
    val dir = Files.createTempDirectory("graft_wbcap")
    val err = intercept[IllegalArgumentException] {
      Tables.writeXlsx(spark, dir.resolve("big.xlsx").toString,
        Seq("s" -> big), maxRows = 50)
    }
    assert(err.getMessage.contains("maxRows"))
  }

  test("publish is atomic: a pre-existing file is replaced, no .part residue") {
    import spark.implicits._
    val df1 = Seq("um").toDF("v")
    val df2 = Seq("dois").toDF("v")
    val dir = Files.createTempDirectory("graft_wbpub")
    val path = dir.resolve("wb.xlsx").toString
    Tables.writeXlsx(spark, path, Seq("s" -> df1))
    Tables.writeXlsx(spark, path, Seq("s" -> df2))
    val grid = XlsxReader.sheets(Files.readAllBytes(Paths.get(path)))
    assert(grid.head._2(1).head == "dois", "second publish wins")
    assert(!Files.list(dir).iterator().hasNext ||
      Files.list(dir).filter(p => p.getFileName.toString.endsWith(".part"))
        .count() == 0, "no temp residue")
  }
}
