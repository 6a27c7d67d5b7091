package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — SURVEY §2.C10 (batch twin of the
  * streaming `EventStreams.sessionize`).
  *
  * Classic two-window formulation: a lag marks rows that open a new
  * session (gap from the previous row exceeds `maxGap`), a running sum
  * of those markers numbers the sessions per key. Both windows share
  * the same (key, order) partitioning, so Catalyst plans ONE exchange +
  * ONE sort and evaluates both windows in a single WindowExec pass —
  * the shuffle cost is identical to a plain groupBy on the key.
  */
object Sessionize {

  /** Assign a session id (1-based, per key) to every row.
    *
    * @param df      input
    * @param keys    session scope (e.g. user_id)
    * @param ts      numeric event-time column (any monotone unit)
    * @param maxGap  gap (same unit as ts) that closes a session
    * @param order   extra tiebreak columns after ts
    */
  def assign(
      df: DataFrame,
      keys: Seq[String],
      ts: Column,
      maxGap: Column,
      order: Seq[Column] = Nil,
      sessionCol: String = "session_id"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ts.asc +: order.map(_.asc): _*)
    val gap = ts - lag(ts, 1).over(w)
    df.withColumn("__new", when(gap.isNull || gap > maxGap, 1L).otherwise(0L))
      .withColumn(sessionCol,
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }

  /** One row per session with span and per-session aggregates. */
  def summarize(
      df: DataFrame,
      keys: Seq[String],
      ts: Column,
      maxGap: Column,
      order: Seq[Column] = Nil,
      aggs: Seq[Column] = Nil): DataFrame = {
    val assigned = assign(df, keys, ts, maxGap, order)
    val outAggs = Seq(
      count(lit(1)).as("n_events"),
      min(ts).as("start_ts"),
      max(ts).as("end_ts")) ++ aggs
    assigned
      .groupBy((keys.map(col) :+ col("session_id")): _*)
      .agg(outAggs.head, outAggs.tail: _*)
  }
}
