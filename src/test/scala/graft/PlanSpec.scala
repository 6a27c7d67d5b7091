package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan assertions: the scale properties SURVEY §5 claims must
  * be visible in `explain` — parquet pushdown, pruned schemas,
  * broadcast dims, partial aggregation, exchange reuse, partitioned
  * windows. These specs pin them so a regression (a lost broadcast
  * hint, a filter that stops pushing) fails loudly instead of silently
  * costing a full scan at scale.
  */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  private def run(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q_pushdown_scan pushes filters and prunes columns at the parquet scan") {
    val plan = planOf("q_pushdown_scan")
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("l_shipdate"), plan)
    // pruned read schema: none of the unprojected columns appear
    assert(!plan.contains("l_partkey") && !plan.contains("l_returnflag"),
      s"scan reads unprojected columns:\n$plan")
  }

  test("q_join_pricing broadcasts every dimension side") {
    val plan = planOf("q_join_pricing")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 3, s"expected >=3 broadcast joins (customer/nation/region), got $broadcasts:\n$plan")
  }

  test("q1_agg uses partial (map-side) aggregation") {
    val plan = planOf("q1_agg")
    assert(plan.contains("partial_"), s"no partial aggregation:\n$plan")
  }

  test("windows are partitioned - no global single-partition window anywhere") {
    for (name <- Seq("q_topn_per_group", "q_window_running", "q_sessionize", "q_asof_join")) {
      val plan = planOf(name)
      // a global window shows as 'Window [...], []' (empty partition spec)
      val bad = "Window .*partitionBy=\\[\\]".r.findFirstIn(plan)
      assert(bad.isEmpty, s"$name has a global window:\n$plan")
    }
  }

  test("sessionize evaluates both windows in one WindowExec pass / one exchange") {
    val df = SparkEntry.queries("q_sessionize")(spark, sf)
    val plan = run(df)
    // lag marker + running sum share (key, order): Spark must not add a
    // second sort or exchange between them
    val windows = "Window".r.findAllIn(plan).length
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"sessionize shuffles $exchanges times:\n$plan")
    assert(windows >= 2, plan) // two logical windows...
  }

  test("ngramJaccard reuses the shingle exchange instead of rescanning") {
    val df = SparkEntry.queries("q_dedup_jaccard")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("TableCacheQueryStage"),
      s"no exchange reuse in jaccard plan:\n$plan")
  }

  test("binned range join never plans a product join") {
    val df = SparkEntry.queries("q_range_join")(spark, sf)
    val plan = run(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"range join degenerated to a product:\n$plan")
  }

  test("asof join shuffles each input once (union form, no range join)") {
    val df = SparkEntry.queries("q_asof_join")(spark, sf)
    val plan = run(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"asof degenerated to a product join:\n$plan")
  }

  test("brute-force ANN broadcasts the query side, never the corpus") {
    val df = SparkEntry.queries("q_ann_topk")(spark, sf)
    val plan = run(df)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"query side not broadcast:\n$plan")
  }

  test("epe pipeline scans the fact table once (pre-aggregated cube feeds both sheets)") {
    val df = SparkEntry.queries("q_epe_pipeline")(spark, sf)
    df.collect()
    // AQE's toString appends an "== Initial Plan ==" copy — count scans
    // only in the final plan section
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val scans = "Scan parquet".r.findAllIn(plan).length
    val reused = plan.contains("ReusedExchange")
    assert(scans <= 1 || reused,
      s"flagship scans orders $scans times with no exchange reuse:\n$plan")
  }

  test("whole-stage codegen covers the relational hot paths") {
    for (name <- Seq("q1_agg", "q_join_pricing", "q_mutate_when")) {
      // codegen spans only materialize in the FINAL adaptive plan
      val plan = run(SparkEntry.queries(name)(spark, sf))
      assert(plan.contains("*("), s"$name has no whole-stage codegen spans:\n$plan")
    }
  }
}
