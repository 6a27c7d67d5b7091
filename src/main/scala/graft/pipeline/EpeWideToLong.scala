package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Reshape
import graft.queries.dec

/** Spark-first re-expression of the reference's full pipeline
  * (tratamento_epe.R:80-278): a pivoted monthly "sheet" is unpivoted to
  * a long table, dimension columns are regex-derived and conditionally
  * rewritten, several slices are union-aligned, and a concatenated
  * selector key is built.
  *
  * The reference reads Excel sheets; here the wide sheets are built
  * deterministically from the `orders` table (one sheet keyed by order
  * priority, one by order status) so the flagship query has a DuckDB
  * oracle twin. Every step maps to a SURVEY §2.B operator:
  * pivotWider (B12) → renameWith (B9) → castMatching (B17) →
  * pivotLonger (B11) → regex extract/replace + case norm (B4/B6/B7) →
  * conditional rewrite (B2) → regex row filter (B5) → bindRows (B15) →
  * make_date (B14) → concat_ws key (B16).
  */
object EpeWideToLong {

  /** Wide monthly sheet: one row per (classe, ano); m1..m12 hold the
    * exact decimal month sums (the analogue of one pivoted EPE sheet).
    */
  def monthlyWide(orders: DataFrame, classe: Column): DataFrame = {
    val base = orders.select(
      classe.as("classe"),
      year(col("o_orderdate")).as("ano"),
      month(col("o_orderdate")).as("mes"),
      col("o_totalprice"))
    val wide = Reshape.pivotWider(
      base, Seq("classe", "ano"), "mes", 1 to 12, sum(dec(col("o_totalprice"))))
    Reshape.renameWith(wide, "^[0-9]+$", c => s"m$c")
  }

  /** Wide sheet → long (classe, ano, mes, valor, data) rows. */
  def sheetToLong(wide: DataFrame): DataFrame = {
    val casted = Reshape.castMatching(wide, "^m[0-9]+$", "double")
    Reshape
      .pivotLonger(casted, Seq("classe", "ano"), (1 to 12).map(m => s"m$m"),
        "mes_raw", "valor")
      .filter(col("valor").isNotNull)
      .withColumn("mes", regexp_extract(col("mes_raw"), "([0-9]+)$", 1).cast("int"))
      .drop("mes_raw")
      .withColumn("data", make_date(col("ano"), col("mes"), lit(1)))
  }

  /** Full pipeline over `orders`: two sheets, regex dims, union, key. */
  def run(orders: DataFrame): DataFrame = {
    // Sheet 1: keyed by priority "N-LABEL" → dado = leading digit,
    // abertura = upper(label) with a conditional rewrite.
    val s1 = sheetToLong(monthlyWide(orders, col("o_orderpriority")))
      .withColumn("dado", regexp_extract(col("classe"), "^([0-9])", 1))
      .withColumn("abertura", upper(regexp_replace(col("classe"), "^[0-9]-", "")))
      .withColumn("abertura",
        when(col("abertura") === "NOT SPECIFIED", "NAO ESPECIFICADO")
          .otherwise(col("abertura")))
    // Sheet 2: keyed by order status; deliberately lacks `dado` so the
    // union exercises schema alignment.
    val s2 = sheetToLong(monthlyWide(orders, col("o_orderstatus")))
      .withColumn("abertura", upper(col("classe")))
    Reshape.bindRows(s1, s2)
      .filter(!col("abertura").rlike("^TOTAL"))
      .withColumn("dado", coalesce(col("dado"), lit("STATUS")))
      .withColumn("selector",
        concat_ws(" - ", col("dado"), col("abertura"), lit("MERCADO")))
      .select("selector", "ano", "mes", "data", "valor")
      .orderBy("selector", "ano", "mes")
  }
}
