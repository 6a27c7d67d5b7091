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
}
