package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dense time-grid resampling — the gap-filling step between raw event
  * history and anything that assumes a regular calendar (dashboards,
  * forecasting features, rate baselines): most keys have NO event in
  * most buckets, and a groupBy leaves those buckets silently absent.
  *
  * `dense` expands every key's history to a contiguous fixed-step
  * bucket grid (its own min..max bucket), aggregates observed rows per
  * bucket, zero-fills counts/sums, and carries the last observed sum
  * forward (LOCF) into empty buckets.
  *
  * Scale shape: one partial-aggregated groupBy(key, bucket) over the
  * events; the grid comes from a per-key `sequence` explode (generated
  * from that aggregate — never a driver loop, never a cartesian with a
  * calendar table); one left join back on (key, bucket); one
  * key-partitioned window for the carry. Bucket arithmetic stays in
  * integer µs (`ts - ts mod step`) — no float division of epoch
  * numbers. Grid size is data-bounded per key (its own active span),
  * so a key active for a week never pays a year of rows.
  */
object Resample {

  def dense(
      df: DataFrame,
      key: Column,
      tsUs: Column,
      value: Column,
      stepUs: Long): DataFrame = {
    require(stepUs > 0, "stepUs must be positive")
    val step = lit(stepUs)
    val observed = df
      .select(key.as("key"),
        (tsUs.cast("long") - pmod(tsUs.cast("long"), step)).as("bucket_us"),
        value.as("__v"))
      .groupBy("key", "bucket_us")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("__v").cast("decimal(18,2)")).cast("double").as("__sum"))
    val grid = observed
      .groupBy("key")
      .agg(min(col("bucket_us")).as("__mn"), max(col("bucket_us")).as("__mx"))
      .select(col("key"),
        explode(sequence(col("__mn"), col("__mx"), step)).as("bucket_us"))
    grid.join(observed, Seq("key", "bucket_us"), "left")
      .select(
        col("key"), col("bucket_us"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        round(coalesce(col("__sum"), lit(0.0)), 4).as("sum_value"),
        round(
          graft.functions.fillDown(col("__sum"),
            orderBy = Seq(col("bucket_us")), partitionBy = Seq(col("key"))),
          4).as("carried_value"))
  }
}
