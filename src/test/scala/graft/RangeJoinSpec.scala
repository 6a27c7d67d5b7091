package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq((1L, 5.0), (2L, 45.0), (3L, 999.0)).toDF("pid", "p")
  private val intervals = Seq((10, 0.0, 50.0), (20, 40.0, 120.0)).toDF("iid", "lo", "hi")

  test("pointInInterval inner matches the plain BETWEEN join") {
    val out = RangeJoin.pointInInterval(points, intervals,
        col("p"), col("lo"), col("hi"), binWidth = 25.0)
      .select("pid", "iid").as[(Long, Int)].collect().toSet
    assert(out === Set((1L, 10), (2L, 10), (2L, 20)))
  }

  test("pointInInterval left keeps unmatched points null-extended exactly once") {
    val out = RangeJoin.pointInInterval(points, intervals,
        col("p"), col("lo"), col("hi"), binWidth = 25.0, joinType = "left")
      .select($"pid", $"iid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getInt(1))))
    assert(out.toSet === Set((1L, Some(10)), (2L, Some(10)), (2L, Some(20)), (3L, None)))
    assert(out.count(_._1 == 3L) === 1, "unmatched point must appear exactly once")
  }

  test("pointInInterval rejects right/full join types") {
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, intervals,
        col("p"), col("lo"), col("hi"), binWidth = 25.0, joinType = "full")
    }
  }

  test("intervalOverlap matches the naive inequality join with no duplicate pairs") {
    // deterministic fixture with spans well past binWidth so many pairs
    // share several bins — the canonical-bin guard must emit each pair
    // exactly once
    val left = (0L until 60L).map(i => (i, (i * 7 % 97).toDouble, (i * 7 % 97 + i % 23 + 1).toDouble))
      .toDF("lid", "llo", "lhi")
    val right = (0L until 25L).map(j => (j, (j * 11 % 89).toDouble, (j * 11 % 89 + j % 31 + 2).toDouble))
      .toDF("rid", "rlo", "rhi")
    val got = RangeJoin.intervalOverlap(left, right,
        col("llo"), col("lhi"), col("rlo"), col("rhi"), binWidth = 5.0)
      .select("lid", "rid").as[(Long, Long)].collect()
    val want = left.crossJoin(right)
      .filter(col("llo") <= col("rhi") && col("rlo") <= col("lhi"))
      .select("lid", "rid").as[(Long, Long)].collect()
    assert(got.length === got.toSet.size, "duplicate pairs emitted")
    assert(got.toSet === want.toSet)
  }

  test("intervalOverlap property: random signed intervals match the naive join exactly") {
    // negative coordinates exercise floor-toward-minus-infinity binning;
    // fractional widths exercise non-integer bin boundaries
    val rnd = new scala.util.Random(7)
    for (binWidth <- Seq(3.0, 5.5, 10.0)) {
      val left = (0L until 40L).map { i =>
        val lo = rnd.nextDouble() * 100 - 50
        (i, lo, lo + rnd.nextDouble() * 25)
      }.toDF("lid", "llo", "lhi")
      val right = (0L until 20L).map { j =>
        val lo = rnd.nextDouble() * 100 - 50
        (j, lo, lo + rnd.nextDouble() * 40)
      }.toDF("rid", "rlo", "rhi")
      val got = RangeJoin.intervalOverlap(left, right,
          col("llo"), col("lhi"), col("rlo"), col("rhi"), binWidth)
        .select("lid", "rid").as[(Long, Long)].collect()
      val want = left.crossJoin(right)
        .filter(col("llo") <= col("rhi") && col("rlo") <= col("lhi"))
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      assert(got.length == got.toSet.size, s"dup pairs at width $binWidth")
      assert(got.toSet == want, s"mismatch at width $binWidth")
    }
  }

  test("intervalOverlap handles touching endpoints (closed intervals)") {
    val l = Seq((1L, 0.0, 10.0)).toDF("lid", "llo", "lhi")
    val r = Seq((2L, 10.0, 20.0), (3L, 10.5, 20.0)).toDF("rid", "rlo", "rhi")
    val got = RangeJoin.intervalOverlap(l, r,
        col("llo"), col("lhi"), col("rlo"), col("rhi"), binWidth = 4.0)
      .select("rid").as[Long].collect().toSet
    assert(got === Set(2L), "endpoint touch [0,10]x[10,20] must match; [10.5,..] must not")
  }
}
