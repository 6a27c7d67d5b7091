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
