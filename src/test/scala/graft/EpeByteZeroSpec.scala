package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Reshape
import graft.sources.Tables

/** The reference pipeline FROM BYTE ZERO: download.file → read_xls per
  * sheet → slice(-1:-3) → na.locf year fill-down → TOTAL-row filter →
  * numeric casts → pivot_longer → date construction
  * (tratamento_epe.R:39-47, 57-66, 80-200) — every step running on
  * graft's own surface: `Tables.fetch` + the dependency-free `.xls`
  * reader + the §2.B wrangling operators, with `_sheet_row` carrying
  * the sheet order the slice/fill-down semantics are defined by.
  */
class EpeByteZeroSpec extends SparkSpec {
  import XlsTestWriter._
  import spark.implicits._

  /** One Shape-A sheet: header, 3 junk banner rows, then year-sparse
    * class rows with 12 month values; `rows` = (anoOrNull, classe,
    * firstMonthValue) with month m getting value `first + m - 1`.
    */
  private def shapeASheet(rows: Seq[(Option[Int], String, Double)]): Array[Byte] = {
    val header = (0 until 2).map(i => labelSst(0, i, i)) ++
      (1 to 12).map(m => labelSst(0, m + 1, 2 + m - 1))
    val junk = Seq(
      labelSst(1, 0, 14), labelSst(2, 0, 15), labelSst(3, 0, 16))
    val data = rows.zipWithIndex.flatMap { case ((ano, classe, first), i) =>
      val r = i + 4
      ano.map(a => number(r, 0, a)).toSeq ++
        Seq(label(r, 1, classe)) ++
        (1 to 12).map(m => number(r, m + 1, first + m - 1))
    }
    cat((header ++ junk ++ data): _*)
  }

  // SST: 0="ANO", 1="CLASSE", 2..13="m1".."m12", 14..16 junk banners
  private val sstStrings: Seq[(String, Boolean)] =
    Seq(("ANO", false), ("CLASSE", false)) ++
      (1 to 12).map(m => (s"m$m", false)) ++
      Seq(("EMPRESA DE PESQUISA ENERGÉTICA", true),
        ("CONSUMO MENSAL DE ENERGIA ELÉTRICA (MWh)", true),
        ("FONTE: EPE", false))

  test("fetch → .xls → slice/fill-down/filter/unpivot/date reproduces the long table") {
    val wb = cfb(workbook(sst(sstStrings), Seq(
      ("RESIDENCIAL", false, shapeASheet(Seq(
        (Some(2004), "CATIVO", 1.0),
        (None, "LIVRE", 101.0),
        (Some(2005), "CATIVO", 13.0),
        (None, "TOTAL GERAL", 999.0)))),
      ("INDUSTRIAL", false, shapeASheet(Seq(
        (Some(2004), "CATIVO", 31.0),
        (None, "TOTAL", 999.0)))))))
    val src = Files.createTempDirectory("graft_epe_src")
    Files.write(src.resolve("consumo.xls"), wb)
    val landing = Files.createTempDirectory("graft_epe_land").toString

    // 1. DOWNLOAD (R:39-47)
    val landed = Tables.fetch(src.resolve("consumo.xls").toUri.toString, landing)
    // 2. READ every sheet (R:57-66), bind with sheet provenance
    val sheets = Tables.loadSheets(spark, landed)
    assert(sheets.keySet == Set("RESIDENCIAL", "INDUSTRIAL"))
    val bound = Reshape.bindRows(
      sheets.toSeq.sortBy(_._1).map { case (n, df) =>
        df.withColumn("sheet", lit(n)) }: _*)
    // 3. slice(-1:-3): drop the 3 banner rows under the header, per
    //    sheet, by the explicit sheet order (R:89)
    val sliced = Reshape.sliceRows(bound, Seq(col("_sheet_row")),
      from = 4, until = -1, partitionBy = Seq(col("sheet")))
    // 4. na.locf: fill the sparse year down the sheet (R:100)
    val filled = Reshape.fillDownCols(sliced, Seq("ANO"),
      orderBy = Seq(col("_sheet_row")), partitionBy = Seq(col("sheet")))
    // 5. regex row filter: TOTAL rows out (R:113)
    val kept = filled.filter(!col("CLASSE").rlike("^TOTAL"))
    // 6. bulk numeric cast + unpivot the 12 month columns + date
    //    (R:120-145)
    val long = Reshape.pivotLonger(
        Reshape.castMatching(kept, "^m[0-9]+$", "double"),
        Seq("sheet", "ANO", "CLASSE"), (1 to 12).map(m => s"m$m"),
        "mes_raw", "valor")
      .filter(col("valor").isNotNull)
      .withColumn("mes", regexp_extract(col("mes_raw"), "([0-9]+)$", 1).cast("int"))
      .withColumn("ano", col("ANO").cast("int"))
      .withColumn("data", make_date(col("ano"), col("mes"), lit(1)))
      .select("sheet", "CLASSE", "ano", "mes", "data", "valor")

    val got = long.as[(String, String, Int, Int, java.sql.Date, Double)]
      .collect().toSet
    val expect = (for {
      (sheet, classe, ano, first) <- Seq(
        ("RESIDENCIAL", "CATIVO", 2004, 1.0),
        ("RESIDENCIAL", "LIVRE", 2004, 101.0), // year FILLED DOWN
        ("RESIDENCIAL", "CATIVO", 2005, 13.0),
        ("INDUSTRIAL", "CATIVO", 2004, 31.0))
      m <- 1 to 12
    } yield (sheet, classe, ano, m,
      java.sql.Date.valueOf(f"$ano-$m%02d-01"), first + m - 1)).toSet
    assert(got.size == 48, s"expected 48 long rows, got ${got.size}")
    assert(got == expect,
      s"diff: extra=${got -- expect}, missing=${expect -- got}")
  }
}
