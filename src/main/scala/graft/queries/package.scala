package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query registry shared by SparkEntry / Verify / Bench.
  *
  * Every oracle-able query follows the determinism contract (SURVEY §3):
  * identical lower-case aliases on both sides, money via exact
  * decimal(18,2) sums cast back to double, derived doubles rounded to
  * 4 dp identically, no raw timestamps, deterministic ORDER BY.
  */
package object queries {

  /** A named query: Spark plan + optional DuckDB oracle SQL twin. */
  final case class Q(
      name: String,
      spark: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  object Q {
    def apply(name: String, oracle: String)(
        fn: (SparkSession, String) => DataFrame): Q =
      Q(name, fn, Some(oracle))
    /** rows-only: no portable SQL twin (seeded hash families etc.). */
    def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): Q =
      Q(name, fn, None)
  }

  /** Exact money arithmetic: cast to decimal(18,2) (order-independent
    * exact sums), do the arithmetic, cast the final value back to double.
    */
  def dec(c: Column): Column = c.cast("decimal(18,2)")
  def dsum(c: Column): Column = sum(dec(c)).cast("double")
  def r4(c: Column): Column = round(c, 4)

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    sources.Tables.load(s, dir, name)

  /** DuckDB expression for the shared tokenizer over column `c` — the
    * cross-engine contract behind every text oracle (lower → strip
    * non-letter/digit → split on whitespace → drop empties). ONE copy
    * on purpose: an edit here must hit every text query's twin at
    * once, never drift per file.
    */
  private[queries] def tkSql(c: String): String =
    s"""list_filter(regexp_split_to_array(regexp_replace(lower($c), '[^\\p{L}\\p{Nd}\\s]', ' ', 'g'), '\\s+'), t -> len(t) > 0)"""
}
