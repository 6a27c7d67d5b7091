package graft

import org.apache.spark.sql.functions._

import graft.operators.Resample

/** Grid construction and LOCF carry for dense resampling; exact value
  * agreement is covered by the q_resample DuckDB oracle.
  */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  test("dense fills per-key gaps with zero counts and carried sums") {
    // key 1: events in buckets 0 and 30 (step 10) -> grid 0,10,20,30;
    // key 2: single bucket -> one row, no gaps
    val df = Seq(
      (1L, 1L, 2.0), (1L, 3L, 3.0),   // bucket 0, sum 5.0
      (1L, 35L, 7.0),                 // bucket 30
      (2L, 12L, 1.5)                  // bucket 10
    ).toDF("k", "ts_us", "v")
    val out = Resample.dense(df, $"k", $"ts_us", $"v", stepUs = 10L)
      .orderBy("key", "bucket_us")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(out.map(r => (r._1, r._2)).toSeq ==
      Seq((1L, 0L), (1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L)))
    // observed buckets keep their counts/sums
    assert(out(0) == ((1L, 0L, 2L, 5.0, 5.0)))
    assert(out(3) == ((1L, 30L, 1L, 7.0, 7.0)))
    // gap buckets: zero count, zero sum, carried last observation
    assert(out(1) == ((1L, 10L, 0L, 0.0, 5.0)))
    assert(out(2) == ((1L, 20L, 0L, 0.0, 5.0)))
    // single-bucket key emits exactly its own bucket
    assert(out(4) == ((2L, 10L, 1L, 1.5, 1.5)))
  }
}
