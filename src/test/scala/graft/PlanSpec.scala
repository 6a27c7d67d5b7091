package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.WindowExec

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

  test("q_corpus_build composes five stages without plan blow-up (bounded exchanges)") {
    val df = SparkEntry.queries("q_corpus_build")(spark, sf)
    val plan = run(df)
    // the chain's stage seams are materialized (localCheckpoint), so
    // the executed tail must stay linear: un-seamed, branch reuse
    // re-inlined the whole upstream per consumer and the same query
    // planned 217 exchanges (measured r13) — the blow-up this test
    // exists to catch
    val total = "Exchange".r.findAllIn(plan).length
    val hash = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hash <= 8, s"q_corpus_build tail pays $hash keyed shuffles:\n$plan")
    assert(total <= 20, s"q_corpus_build tail plans $total exchanges:\n$plan")
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

  /** Every physical node in the executed plan, descending through AQE
    * wrappers and materialized query stages (plan-string regexes can't
    * see partition specs — WindowExec's toString never prints them).
    */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
    case s: QueryStageExec => s +: allNodes(s.plan)
    case other => other +: other.children.flatMap(allNodes)
  }

  /** A window is global when its partition spec is empty OR constant
    * (`partitionBy(lit(1))` is the same single-partition landmine in
    * disguise).
    */
  private def globalWindows(df: DataFrame): Seq[WindowExec] = {
    df.collect()
    allNodes(df.queryExecution.executedPlan).collect {
      case w: WindowExec if w.partitionSpec.isEmpty || w.partitionSpec.forall(_.foldable) => w
    }
  }

  test("windows are partitioned - no global single-partition window anywhere") {
    // q_rfm_sketch is on this list BY CONTRACT: the sketched RFM
    // scorer exists precisely to eliminate exact rfm's three
    // single-partition ntile sorts (r14 verdict's one weak component)
    for (name <- Seq("q_topn_per_group", "q_window_running", "q_sessionize",
        "q_asof_join", "q_epe_shape_b", "q_pack_sequences", "q_quantile_bucket",
        "q_tfidf_topterms", "q_dedup_sorted", "q_dedup_spans",
        "q_perplexity_buckets", "q_admit_budget", "q_shuffle_shards",
        "q_token_loops", "q_seasonal", "q_decontaminate_spans",
        "q_level_shift", "q_attribution_credit", "q_rfm_sketch")) {
      val df = SparkEntry.queries(name)(spark, sf)
      val bad = globalWindows(df)
      assert(bad.isEmpty, s"$name has a global window: ${bad.mkString("\n")}")
    }
  }

  test("q_hill_tail plans a partial top-(k+1) per map task, no full-key window buffer") {
    // The r15 verdict's one real plan finding: hillTail used to stack
    // count(*).over(partitionBy key) under the rank filter, which (a)
    // buffered EVERY row of a low-cardinality key through one task's
    // window sort and (b) blocked InferWindowGroupLimit. The fix moves
    // the count to a groupBy join-back and keeps `__r <= k+1` directly
    // above row_number, so Spark 4 plans WindowGroupLimitExec (partial
    // per-map-task top-(k+1)) and no window carries an unbounded frame.
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    val df = SparkEntry.queries("q_hill_tail")(spark, sf)
    df.collect()
    val nodes = allNodes(df.queryExecution.executedPlan)
    val limits = nodes.collect { case w: WindowGroupLimitExec => w }
    assert(limits.nonEmpty,
      s"q_hill_tail lost its WindowGroupLimitExec rewrite:\n${df.queryExecution.executedPlan}")
    val unbounded = nodes.collect {
      case w: WindowExec if w.toString.contains("unboundedfollowing") => w
    }
    assert(unbounded.isEmpty,
      s"q_hill_tail buffers full key partitions through an unbounded window frame:\n${unbounded.mkString("\n")}")
  }

  test("registry-wide audit: every global window sits above an aggregate") {
    // The hand-picked list above pins NO-global-window for queries
    // where even a bounded one would be a bug; this sweep holds the
    // weaker invariant EVERYWHERE: a global window is legal only over
    // a frame already collapsed by aggregation (the q_auc pattern —
    // bounded by distinct scores/bins, not corpus rows). The audited
    // query never EXECUTES (window partition specs are fixed before
    // AQE), but BUILDING a handful of registry entries runs real
    // driver-metadata jobs (BPE/unigram/IVF training, power
    // iteration, percentile cuts) — that is those operators'
    // documented collect-as-config shape, not this test's choice.
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    for (q <- SparkEntry.registry) {
      val df = q.spark(spark, sf)
      val bad = allNodes(df.queryExecution.executedPlan).collect {
        case w: WindowExec
          if w.partitionSpec.isEmpty || w.partitionSpec.forall(_.foldable) => w
      }.filterNot { w =>
        val st = allNodes(w.child)
        st.exists(_.isInstanceOf[HashAggregateExec]) ||
          st.exists(_.isInstanceOf[ObjectHashAggregateExec]) ||
          st.exists(_.isInstanceOf[SortAggregateExec])
      }
      assert(bad.isEmpty,
        s"${q.name}: global window over non-aggregated input:\n${bad.mkString("\n")}")
    }
  }

  test("bounded-frame ordered passes: every global window sits above an aggregate") {
    // q_auc / q_ks_test / q_calibration DO plan a global window — by
    // design, over a frame ALREADY COLLAPSED by groupBy to a bounded
    // size (<= 10^dp distinct scores / nBins rows). The invariant to
    // pin is that the window's subtree contains that aggregation —
    // a global window directly over row-level data is the scale bug.
    for (name <- Seq("q_auc", "q_ks_test", "q_calibration")) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val windows = allNodes(df.queryExecution.executedPlan).collect {
        case w: WindowExec => w
      }
      assert(windows.nonEmpty, s"$name: expected the bounded ordered pass")
      windows.foreach { w =>
        val subtree = allNodes(w.child)
        val hasAgg = subtree.exists(
          _.isInstanceOf[org.apache.spark.sql.execution.aggregate.HashAggregateExec]) ||
          subtree.exists(
            _.isInstanceOf[org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec]) ||
          subtree.exists(
            _.isInstanceOf[org.apache.spark.sql.execution.aggregate.SortAggregateExec])
        assert(hasAgg,
          s"$name: global window runs over NON-aggregated (unbounded) input:\n$w")
      }
    }
  }

  test("the global-window detector actually detects one (not vacuously green)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{lit, row_number}
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.config.Configurator
    // this test PLANTS global windows on purpose; mute WindowExec's
    // single-partition warning so a clean test log stays the signal
    // that no real operator plans one
    val windowLogger = classOf[WindowExec].getName
    val prev = LogManager.getLogger(windowLogger).getLevel
    Configurator.setLevel(windowLogger, Level.ERROR)
    try {
      val df = spark.range(10).toDF("i")
      val empty = df.withColumn("rn",
        row_number().over(Window.orderBy("i")))
      assert(globalWindows(empty).nonEmpty, "empty partition spec not detected")
      val const = df.withColumn("rn",
        row_number().over(Window.partitionBy(lit(1)).orderBy("i")))
      assert(globalWindows(const).nonEmpty, "constant partition spec not detected")
    } finally Configurator.setLevel(windowLogger, prev)
  }

  test("promoteFirstRowToHeader plans no window and no global sort") {
    import org.apache.spark.sql.functions.col
    val df = spark.range(100).selectExpr("cast(id as string) a", "cast(id*2 as string) b", "id rn")
    val out = graft.operators.Reshape.promoteFirstRowToHeader(df, Seq(col("rn")))
    out.collect()
    val nodes = allNodes(out.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[WindowExec]), "header promotion uses a window")
    assert(!nodes.exists(_.nodeName.toLowerCase.contains("sort")),
      s"header promotion sorts:\n${out.queryExecution.executedPlan}")
  }

  test("chrF and ngramOverlap plan as shuffle-free row-local projections") {
    import org.apache.spark.sql.functions.col
    val d = sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id").as("id"), col("text"))
    val plans = Seq(
      graft.operators.Eval.chrF(d, col("id"), col("text"), col("text")),
      graft.operators.Eval.ngramOverlap(d, col("id"), col("text"), col("text")))
      .map(run)
    plans.foreach { plan =>
      // the r10 rework's whole point: same-row gram stats must never
      // hash-shuffle, aggregate, or join (scaleOut's round-robin
      // spread is the only exchange allowed)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(!plan.contains("HashAggregate"), plan)
      assert(!plan.toLowerCase.contains("join"), plan)
    }
  }

  test("asOfEnrich plans as a broadcast probe on the event side (E38's stateless contract)") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val ev = sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
    val dim = ev.select(col("user_id")).distinct()
      .select(col("user_id"), (col("user_id") % 100).as("eff_us"),
        col("user_id").cast("string").as("tier"))
    val out = graft.streaming.EventStreams.asOfEnrich(
      ev, dim, Seq("user_id"), "ts_us", "eff_us", Seq("tier"))
    val plan = run(out)
    // the event side must probe a BROADCAST history — a sort-merge
    // join here would shuffle the whole stream per micro-batch, which
    // is exactly what the operator exists to avoid
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("ewmaChart pays exactly one keyed exchange for the partition-local walk") {
    import org.apache.spark.sql.functions.{col, count, expr, lit}
    // the operator itself (no presentation orderBy): bucket groupBy +
    // repartition(key) are the only legal shuffles — the recurrence
    // is a partition-local kernel and must add none
    val buckets = sources.Tables.events(spark, sf)
      .groupBy(col("event_type"),
        expr("ts_ns div 3600000000000").as("b"))
      .agg(count(lit(1)).as("n"))
    val df = graft.operators.Stats.ewmaChart(
      buckets, col("event_type"), col("b"), col("n"))
    val plan = finalPlan(run(df))
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"ewmaChart shuffles $exchanges times:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"ewmaChart sorts globally:\n$plan")
  }

  test("cusum evaluates both window layers in one keyed exchange") {
    val df = SparkEntry.queries("q_cusum")(spark, sf)
    val plan = finalPlan(run(df))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    // hourly-bucket agg + the two same-partitioning window layers:
    // one shuffle for the groupBy, one for the windows, never more —
    // and all three Window operators must share ONE sort
    assert(exchanges <= 2, s"cusum shuffles $exchanges times:\n$plan")
    val sorts = "Sort \\[key".r.findAllIn(plan).length
    assert(sorts <= 2, s"cusum sorts $sorts times (windows must share):\n$plan")
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

  test("dropBoilerplateLines materializes the lines frame once for its three consumers") {
    val df = SparkEntry.queries("q_dedup_lines")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TableCacheQueryStage") || plan.contains("InMemoryTableScan"),
      s"fingerprinted lines not cached — segmentation would run 3x:\n$plan")
  }

  test("ngramJaccard reuses the shingle exchange instead of rescanning") {
    val df = SparkEntry.queries("q_dedup_jaccard")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("TableCacheQueryStage"),
      s"no exchange reuse in jaccard plan:\n$plan")
  }

  test("levelShift computes all five window moments in one keyed exchange") {
    val df = SparkEntry.queries("q_level_shift")(spark, sf)
    val plan = run(df)
    // trailing and leading frames share (key, bucket) partitioning —
    // Spark must not re-exchange between them; one shuffle for the
    // hourly aggregate, one for the window partitioning
    val exchanges = "Exchange hashpartitioning".r.findAllIn(finalPlan(plan)).size
    assert(exchanges <= 2, s"levelShift shuffles $exchanges times:\n$plan")
  }

  test("span decontamination is a semi-join over hashed shingles, never a product") {
    val df = SparkEntry.queries("q_decontaminate_spans")(spark, sf)
    val plan = run(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"span decontamination degenerated to a product:\n$plan")
    assert(plan.contains("LeftSemi"), s"probe match is not a semi-join:\n$plan")
  }

  test("interval-overlap join never plans a product join") {
    val df = SparkEntry.queries("q_interval_overlap")(spark, sf)
    val plan = run(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"interval overlap degenerated to a product:\n$plan")
  }

  test("pageRank rounds are keyed joins, never products") {
    val df = SparkEntry.queries("q_pagerank")(spark, sf)
    val plan = run(df)
    assert(!plan.contains("CartesianProduct"),
      s"pagerank planned a cartesian product:\n$plan")
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

  test("custom physical asof plans a streaming merge: no window, two co-partition exchanges") {
    val df = SparkEntry.queries("q_asof_exec")(spark, sf)
    val plan = run(df)
    assert(plan.contains("AsOfJoin "), s"custom operator not planned:\n$plan")
    assert(!plan.contains("Window"), s"exec asof must not need a window:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(finalPlan(plan)).size
    assert(exchanges == 2, s"expected exactly the two co-partition exchanges, got $exchanges:\n$plan")
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

  test("tfidf aggregates partially and broadcasts the doc count") {
    val df = SparkEntry.queries("q_tfidf_topterms")(spark, sf)
    val plan = run(df)
    assert(plan.contains("partial_"), s"tf counts not map-side combined:\n$plan")
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastNestedLoopJoin"),
      s"n_docs scalar not broadcast:\n$plan")
  }

  test("whole-stage codegen covers the relational hot paths") {
    for (name <- Seq("q1_agg", "q_join_pricing", "q_mutate_when")) {
      // codegen spans only materialize in the FINAL adaptive plan
      val plan = run(SparkEntry.queries(name)(spark, sf))
      assert(plan.contains("*("), s"$name has no whole-stage codegen spans:\n$plan")
    }
  }

  test("unigramLogProb reuses the term exchange (one tokenization pass feeds model and probe)") {
    // ReusedExchange only materializes in the FINAL adaptive plan
    val plan = run(SparkEntry.queries("q_unigram_logprob")(spark, sf))
    assert(plan.contains("ReusedExchange"),
      s"term exchange not shared between tf aggregate and join probe:\n$plan")
  }

  test("dsirWeights reuses the feature exchange (one tokenization pass feeds model and probe)") {
    val plan = run(SparkEntry.queries("q_dsir_weights")(spark, sf))
    assert(plan.contains("ReusedExchange"),
      s"feature exchange not shared between count aggregate and scoring join:\n$plan")
  }

  test("resample scans the input once and plans no join (gap rows are generated in place)") {
    val plan = planOf("q_resample")
    assert("Scan parquet".r.findAllIn(plan).length == 1,
      s"dense resampling must not re-scan the input for its grid:\n$plan")
    assert(!plan.contains("Join"), s"single-pass resample must not join:\n$plan")
  }

  // AQE's toString appends an "== Initial Plan ==" copy — count scans
  // only in the final plan section
  private def finalPlan(plan: String): String = plan.split("== Initial Plan ==")(0)

  test("profile runs all column aggregates in one pass over one scan") {
    val df = SparkEntry.queries("q_profile")(spark, sf)
    val plan = finalPlan(run(df))
    assert("Scan parquet".r.findAllIn(plan).length == 1,
      s"profile must scan the table exactly once:\n$plan")
  }

  test("quality report: row-predicate checks share one scan; structural checks add their own") {
    val df = SparkEntry.queries("q_quality_checks")(spark, sf)
    val plan = finalPlan(run(df))
    // 4 row-predicate checks + unique + foreign-key child = 3 lineitem
    // scans and 1 orders scan — NOT one scan per row-predicate check
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans <= 4, s"quality checks plan $scans scans (row checks not fused):\n$plan")
  }

  test("histogram aggregates map-side (partial) on the bin id") {
    val df = SparkEntry.queries("q_histogram")(spark, sf)
    val plan = finalPlan(run(df))
    assert(plan.contains("partial_"), s"histogram counts not map-side combined:\n$plan")
    assert("Scan parquet".r.findAllIn(plan).length == 1, plan)
  }

  test("topShingles plans a distributed top-k, not a global sort or window") {
    val docs = sources.Tables.load(spark, sf, "documents")
    val df = graft.operators.TextMetrics.topShingles(
      docs, org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("text"), n = 2, k = 20)
    val plan = run(df)
    assert(plan.contains("TakeOrderedAndProject"),
      s"heavy-hitter top-k not planned as TakeOrderedAndProject:\n$plan")
    assert(!plan.contains("WindowExec"), s"unexpected window in top-k plan:\n$plan")
    assert(plan.contains("partial_"), s"doc-frequency count not map-side combined:\n$plan")
  }

  test("entity resolution plans block-local equi-joins, never a product") {
    // both the batch and incremental tiers: the levenshtein predicate
    // must ride an equi-join on the blocking key, not a nested loop
    for (name <- Seq("q_entity_resolve", "q_entity_resolve_incr")) {
      val plan = planOf(name)
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$name plans a product join:\n$plan")
    }
  }

  test("salted join stays an equi-join on key+salt, no product, small side exploded not looped") {
    val plan = planOf("q_salted_join")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"salting must not degrade the join to a product:\n$plan")
    assert(plan.contains("partial_"), s"post-join agg not map-side combined:\n$plan")
  }

  test("bootstrap resampling explodes in place: no product, partial aggregation on the resample key") {
    for (name <- Seq("q_bootstrap_ci", "q_bootstrap_lift")) {
      val plan = planOf(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$plan")
      assert(plan.contains("Generate explode") || plan.contains("explode"),
        s"$name lost the in-place resample explode:\n$plan")
      assert(plan.contains("partial_"),
        s"$name resample means not map-side combined:\n$plan")
    }
  }

  test("quantile normalization: keyed rank windows only; the reference count is a broadcast") {
    val df = SparkEntry.queries("q_quantile_norm")(spark, sf)
    val bad = globalWindows(df)
    assert(bad.isEmpty, s"q_quantile_norm has a global window: ${bad.mkString("\n")}")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"reference count should ride a broadcast:\n$plan")
  }
}
