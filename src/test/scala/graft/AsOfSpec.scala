package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq((1L, 100L), (1L, 200L), (2L, 150L))
    .toDF("k", "lt")
  private val right = Seq((1L, 90L, "a"), (1L, 180L, "b"), (2L, 160L, "c"))
    .toDF("k", "rt", "v")

  test("backward: latest right at-or-before, null when none") {
    val out = AsOf.joinBackward(left, right, Seq("k"), "lt", "rt",
        rightPayload = Seq("v", "rt"), rightOrder = Seq("rt"))
      .select("k", "lt", "v").as[(Long, Long, String)].collect().toSet
    assert(out == Set((1L, 100L, "a"), (1L, 200L, "b"), (2L, 150L, null)))
  }

  test("backward tolerance nulls out matches older than the bound") {
    val out = AsOf.joinBackward(left, right, Seq("k"), "lt", "rt",
        rightPayload = Seq("v"), rightOrder = Seq("rt"),
        tolerance = Some(lit(15L)))
      .select("k", "lt", "v").as[(Long, Long, String)].collect().toSet
    // (1,100): match rt=90 at distance 10 ≤ 15 → kept;
    // (1,200): match rt=180 at distance 20 > 15 → nulled
    assert(out == Set((1L, 100L, "a"), (1L, 200L, null), (2L, 150L, null)))
  }

  test("forward: earliest right at-or-after, inclusive on equality") {
    val l2 = Seq((1L, 180L), (1L, 185L), (2L, 170L)).toDF("k", "lt")
    val out = AsOf.joinForward(l2, right, Seq("k"), "lt", "rt",
        rightPayload = Seq("v", "rt"), rightOrder = Seq("rt"))
      .select("k", "lt", "v").as[(Long, Long, String)].collect().toSet
    assert(out == Set((1L, 180L, "b"), (1L, 185L, null), (2L, 170L, null)))
  }
}
