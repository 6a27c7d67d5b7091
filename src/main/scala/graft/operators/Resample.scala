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
  * Scale shape — ONE pass, no join: a partial-aggregated
  * groupBy(key, bucket) over the events, a key-partitioned `lead`
  * window, then each observed bucket EMITS its own row plus the gap
  * rows up to the next observed bucket (`sequence` explode, so the
  * grid is generated where the data already lives — never a driver
  * loop, never a calendar cartesian, and the carry value is simply
  * the generating row's sum, no second window). Bucket arithmetic
  * stays in integer µs (`ts - ts mod step`) — no float division of
  * epoch numbers. Grid size is data-bounded per key (its own active
  * span), so a key active for a week never pays a year of rows.
  * (An earlier grid-aggregate + left-join form computed the bucket
  * aggregate twice — two full input scans at scale; this shape scans
  * once, PlanSpec pins it.)
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
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy("bucket_us")
    observed
      .withColumn("__next", lead(col("bucket_us"), 1).over(w))
      .select(col("key"), col("n_events"), col("__sum"),
        posexplode(
          sequence(col("bucket_us"),
            coalesce(col("__next") - step, col("bucket_us")), step))
          .as(Seq("__pos", "bucket_us")))
      .select(
        col("key"), col("bucket_us"),
        when(col("__pos") === 0, col("n_events")).otherwise(0L).as("n_events"),
        when(col("__pos") === 0, round(col("__sum"), 4)).otherwise(0.0).as("sum_value"),
        round(col("__sum"), 4).as("carried_value"))
  }
}
