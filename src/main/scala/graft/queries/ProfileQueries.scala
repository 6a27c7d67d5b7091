package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Profile

/** Profiling queries (SURVEY §2.C24-C25): the "look at what arrived"
  * surface — long-format column profiles and fixed-width histograms,
  * both single-aggregation-pass shapes.
  */
object ProfileQueries {

  /** Columns profiled by q_profile; mixed types on purpose (integers,
    * doubles, strings, a timestamp) — min/max render as strings, and
    * the oracle proves the renderings agree across engines.
    */
  private val profCols = Seq(
    "l_orderkey", "l_quantity", "l_extendedprice",
    "l_returnflag", "l_linestatus", "l_shipdate")

  private def profColSql(c: String): String =
    s"""SELECT '$c' AS col_name,
       |  CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
       |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
       |  CAST(min($c) AS VARCHAR) AS min_val,
       |  CAST(max($c) AS VARCHAR) AS max_val
       |FROM lineitem""".stripMargin

  val all: Seq[Q] = Seq(

    // C24: one-pass long-format column profile. exactDistinct=true so
    // DuckDB's exact COUNT(DISTINCT) is the twin; the scale default is
    // HLL++ (see Profile.profile scaladoc).
    Q(
      "q_profile",
      profCols.map(profColSql).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    ) { (s, dir) =>
      Profile.profile(table(s, dir, "lineitem"), profCols, exactDistinct = true)
        .orderBy("col_name")
    },

    // C25: fixed-width histogram of extended price — map-side-combined
    // groupBy on the bin id, O(nBins) result regardless of input size.
    Q(
      "q_histogram",
      """SELECT
        |  CAST(least(21, greatest(0, CAST(floor(l_extendedprice / 5000.0) AS INTEGER))) AS INTEGER) AS bin,
        |  round(CAST(least(21, greatest(0, CAST(floor(l_extendedprice / 5000.0) AS INTEGER))) AS INTEGER) * 5000.0, 4) AS bin_lo,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem WHERE l_extendedprice IS NOT NULL
        |GROUP BY 1, 2 ORDER BY bin""".stripMargin
    ) { (s, dir) =>
      Profile.histogram(table(s, dir, "lineitem"),
          col("l_extendedprice"), lo = 0.0, hi = 110000.0, nBins = 22)
        .orderBy("bin")
    }
  )
}
