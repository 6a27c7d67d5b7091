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

  test("exec: custom physical as-of matches the window form on fixtures and edges") {
    // same fixtures as the window-form tests, plus null keys/ts edges
    val out = AsOf.joinBackwardExec(left, right, Seq("k"), "lt", "rt",
        rightPayload = Seq("v", "rt"), rightOrder = Seq("rt"))
      .select("k", "lt", "v").as[(Long, Long, String)].collect().toSet
    assert(out == Set((1L, 100L, "a"), (1L, 200L, "b"), (2L, 150L, null)), out.toString)
    // tolerance
    val tol = AsOf.joinBackwardExec(left, right, Seq("k"), "lt", "rt",
        rightPayload = Seq("v"), rightOrder = Seq("rt"), toleranceUs = Some(15L))
      .select("k", "lt", "v").as[(Long, Long, String)].collect().toSet
    assert(tol == Set((1L, 100L, "a"), (1L, 200L, null), (2L, 150L, null)), tol.toString)
    // null keys / null ts: null-key or null-ts left rows match nothing
    // (but survive); null-key/null-ts right rows match nothing
    val ln = Seq((Some(1L), Some(100L)), (None, Some(100L)), (Some(1L), None))
      .toDF("k", "lt")
    val rn = Seq((Some(1L), Some(90L), "a"), (None, Some(80L), "x"),
        (Some(1L), None, "y")).toDF("k", "rt", "v")
    val nOut = AsOf.joinBackwardExec(ln, rn, Seq("k"), "lt", "rt",
        rightPayload = Seq("v"), rightOrder = Seq("rt"))
      .select("lt", "v").as[(Option[Long], String)].collect().toSet
    assert(nOut == Set((Some(100L), "a"), (Some(100L), null), (None, null)), nOut.toString)
  }

  test("unmatched rows null out NON-NULLABLE payload columns too (both forms)") {
    // rt comes from a Seq-derived frame → nullable=false; an unmatched
    // left row must still read NULL, not a silently-unboxed 0
    for (form <- Seq("window", "exec")) {
      val out = (if (form == "window")
          AsOf.joinBackward(left, right, Seq("k"), "lt", "rt",
            rightPayload = Seq("v", "rt"), rightOrder = Seq("rt"))
        else
          AsOf.joinBackwardExec(left, right, Seq("k"), "lt", "rt",
            rightPayload = Seq("v", "rt"), rightOrder = Seq("rt")))
        .select("k", "lt", "rt").as[(Long, Long, Option[Long])].collect().toSet
      assert(out.contains((2L, 150L, None)),
        s"$form: unmatched long payload must be null: $out")
    }
  }

  test("null-ts right rows match nothing in BOTH forms (no minus-infinity match)") {
    val rNull = Seq((Some(1L), Option.empty[Long], "x")).toDF("k", "rt", "v")
    val l1 = Seq((1L, 100L)).toDF("k", "lt")
    val w = AsOf.joinBackward(l1, rNull, Seq("k"), "lt", "rt",
        rightPayload = Seq("v"), rightOrder = Seq("rt"))
      .select("v").as[String].collect().toSeq
    val e = AsOf.joinBackwardExec(l1, rNull, Seq("k"), "lt", "rt",
        rightPayload = Seq("v"), rightOrder = Seq("rt"))
      .select("v").as[String].collect().toSeq
    assert(w == Seq(null) && e == Seq(null),
      s"NULL <= lt is unknown, not a match: window=$w exec=$e")
  }

  test("exec: plans AsOfJoinExec and agrees with the window form on a real self-join") {
    val ev = sources.Tables.events(spark, sf)
      .withColumn("ts_us", expr("ts_ns div 1000"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event"), col("user_id"), col("ts_us").as("p_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_event"), col("user_id"), col("ts_us").as("c_us"))
    val exec = AsOf.joinBackwardExec(purchases, clicks, Seq("user_id"),
      "p_us", "c_us", rightPayload = Seq("c_event", "c_us"), rightOrder = Seq("c_event"))
    // physical nodes print with the Exec suffix stripped
    assert(exec.queryExecution.executedPlan.toString.contains("AsOfJoin "),
      "custom strategy did not plan the custom operator:\n" +
        exec.queryExecution.executedPlan)
    val window = AsOf.joinBackward(purchases, clicks, Seq("user_id"),
      "p_us", "c_us", rightPayload = Seq("c_event", "c_us"), rightOrder = Seq("c_event"))
    val e = exec.orderBy("p_event").collect().toSeq
    val w = window.orderBy("p_event").collect().toSeq
    assert(e == w, s"exec != window form: ${e.take(3)} vs ${w.take(3)}")
  }

  test("forward: earliest right at-or-after, inclusive on equality") {
    val l2 = Seq((1L, 180L), (1L, 185L), (2L, 170L)).toDF("k", "lt")
    val out = AsOf.joinForward(l2, right, Seq("k"), "lt", "rt",
        rightPayload = Seq("v", "rt"), rightOrder = Seq("rt"))
      .select("k", "lt", "v").as[(Long, Long, String)].collect().toSet
    assert(out == Set((1L, 180L, "b"), (1L, 185L, null), (2L, 170L, null)))
  }
}
