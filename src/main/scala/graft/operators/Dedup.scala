package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/** Deduplication operators for LLM-training-data pipelines (SURVEY §2.D).
  *
  * All variants avoid cartesian pairwise work: exact dedup is a single
  * hash aggregation; near-dup variants generate candidate pairs through
  * banding / inverted-index blocking so the join keys bound the work.
  */
object Dedup {

  /** Exact content dedup: md5-hash groupBy, min-id winner per group.
    * One shuffle on the 128-bit fingerprint; partial aggregation does
    * the heavy lifting map-side at scale.
    */
  def exact(df: DataFrame, text: Column, id: Column): DataFrame =
    df.groupBy(md5(text).as("fp"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Rows of `df` surviving exact dedup (the min-id representative). */
  def exactKeep(df: DataFrame, text: Column, id: Column): DataFrame = {
    val winners = exact(df, text, id).select(col("keep_id"))
    df.join(winners, id === col("keep_id"), "left_semi")
  }
}
