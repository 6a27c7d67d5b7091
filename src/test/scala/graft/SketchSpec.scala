package graft

import org.apache.spark.sql.functions._

/** Error bounds for the sketch aggregates (q_approx_stats). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact per group") {
    val li = sources.Tables.load(spark, sf, "lineitem")
    val approx = li.groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_orderkey", rsd = 0.01).as("a"))
      .as[(String, Long)].collect().toMap
    val exact = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("n"))
      .as[(String, Long)].collect().toMap
    for ((k, e) <- exact) {
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$k: approx $a vs exact $e")
    }
    // the bounded-verdict query reports the same contract as booleans
    val out = SparkEntry.queries("q_approx_stats")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("distinct_within"), r.toString)
      assert(r.getAs[Boolean]("median_within"), r.toString)
    }
  }

  test("percentile_approx brackets the exact median") {
    val li = sources.Tables.load(spark, sf, "lineitem")
    val approx = li.groupBy($"l_returnflag")
      .agg(percentile_approx($"l_quantity", lit(0.5), lit(1000))
        .cast("double").as("a"))
      .as[(String, Double)].collect().toMap
    val exact = li.groupBy($"l_returnflag")
      .agg(percentile($"l_quantity", lit(0.5)).as("m"))
      .as[(String, Double)].collect().toMap
    for ((k, e) <- exact) {
      val a = approx(k)
      assert(math.abs(a - e) / math.max(e, 1.0) <= 0.1, s"$k: approx $a vs exact $e")
    }
  }

  test("freqSketch under capacity is EXACT and shard-merge == whole-stream (C60)") {
    import graft.functions.FreqItemsSketch._
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 20 distinct items, capacity 64 → zero purges, everything exact
    val rows = (1 to 400).map(i => (i % 4, s"item${i % 20}")).toDF("shard", "it")
    val whole = rows.agg(freqSketch(col("it"), 64).as("s"))
      .select(explode(freqTopItems(col("s"), 25)).as("r")).select("r.*")
      .collect().map(r => r.getAs[String]("item") -> r.getAs[Long]("estimate")).toMap
    assert(whole.size == 20)
    assert(whole.values.forall(_ == 20L)) // 400/20 exact
    // per-shard sketches merged == the whole-stream sketch's answers
    val merged = rows.groupBy("shard").agg(freqSketch(col("it"), 64).as("s"))
      .agg(freqMerge(col("s"), 64).as("m"))
      .select(explode(freqTopItems(col("m"), 25)).as("r")).select("r.*")
      .collect().map(r => r.getAs[String]("item") -> r.getAs[Long]("estimate")).toMap
    assert(merged == whole)
  }

  test("freqSketch never misses a true heavy hitter and bounds bracket truth (C60)") {
    import graft.functions.FreqItemsSketch._
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 3000 distinct light items force purges at capacity 64; one item
    // carries 20% of the stream
    val heavy = Seq.fill(1500)("the-heavy-one")
    val light = (1 to 6000).map(i => s"light$i")
    val rows = (heavy ++ light).toDF("it")
    val out = rows.agg(freqSketch(col("it"), 64).as("s"))
      .select(explode(freqTopItems(col("s"), 5)).as("r")).select("r.*")
      .collect()
    val top = out.head
    assert(top.getAs[String]("item") == "the-heavy-one")
    assert(top.getAs[Long]("lower_bound") <= 1500L)
    assert(top.getAs[Long]("upper_bound") >= 1500L)
    // point estimate never undercounts below lb and brackets truth
    val est = rows.agg(freqSketch(col("it"), 64).as("s"))
      .select(freqEstimate(col("s"), lit("the-heavy-one"))).collect()(0).getLong(0)
    assert(est >= 1500L - (7500L / 64) && est >= 1500L * 9 / 10)
  }

  test("freqBounds brackets truth for tracked AND untracked items (C60)") {
    import graft.functions.FreqItemsSketch._
    val heavy = Seq.fill(1500)("the-heavy-one")
    val light = (1 to 6000).map(i => s"light$i")
    val sk = (heavy ++ light).toDF("it").agg(freqSketch(col("it"), 64).as("s"))
    // tracked heavy item: lb <= 1500 <= ub
    val hb = sk.select(freqBounds(col("s"), lit("the-heavy-one")).as("b"))
      .select("b.*").collect()(0)
    assert(hb.getAs[Long]("lower_bound") <= 1500L
      && 1500L <= hb.getAs[Long]("upper_bound"), hb.toString)
    // purged/untracked light item: true count 1 must still be bracketed
    // (estimate may be 0, ub = sketch max error — the deterministic
    // contract the q_freq_sketch bounded-verdict oracle relies on)
    val lb = sk.select(freqBounds(col("s"), lit("light1")).as("b"))
      .select("b.*").collect()(0)
    assert(lb.getAs[Long]("lower_bound") <= 1L
      && 1L <= lb.getAs[Long]("upper_bound"), lb.toString)
    // never-seen item: bounds must bracket 0
    val nb = sk.select(freqBounds(col("s"), lit("never-seen")).as("b"))
      .select("b.*").collect()(0)
    assert(nb.getAs[Long]("lower_bound") <= 0L
      && 0L <= nb.getAs[Long]("upper_bound"), nb.toString)
  }

  test("theta sketches: exact under capacity, shard-merge == whole, intersection on planted sets (D129)") {
    import graft.functions.ThetaSketch._
    // A = {0..499}, B = {250..749}: |A|=|B|=500, |A∩B|=250 — all far
    // under 2^12 capacity, so every estimate must be EXACT
    val a = (0 until 500).map(i => (i % 4, s"item$i")).toDF("shard", "it")
    val b = (250 until 750).map(i => (i % 4, s"item$i")).toDF("shard", "it")
    val skA = a.agg(thetaSketch(col("it")).as("s"))
    val skB = b.agg(thetaSketch(col("it")).as("s"))
    assert(skA.select(thetaEstimate(col("s"))).as[Double].head() == 500.0)
    val inter = skA.crossJoin(skB.withColumnRenamed("s", "s2"))
      .select(thetaIntersectEstimate(col("s"), col("s2"))).as[Double].head()
    assert(inter == 250.0, s"exact-capacity intersection drifted: $inter")
    // per-shard sketches merged == the whole-stream sketch's answer
    val merged = a.groupBy("shard").agg(thetaSketch(col("it")).as("s"))
      .agg(thetaUnion(col("s")).as("m"))
      .select(thetaEstimate(col("m"))).as[Double].head()
    assert(merged == 500.0, s"shard-merge drifted: $merged")
    // over capacity (lgK=4 → 16 nominal entries): sanity-bound the
    // estimate at a LOOSE 75% ceiling — deliberately far above the
    // published ~25% 3σ rse for lgK=4, so the assertion survives any
    // library resampling change while still catching a broken
    // serialization path (which reads orders of magnitude off)
    val big = (0 until 20000).map(i => s"v$i").toDF("it")
    val est = big.agg(thetaSketch(col("it"), lgK = 4).as("s"))
      .select(thetaEstimate(col("s"))).as[Double].head()
    assert(math.abs(est - 20000.0) / 20000.0 <= 0.75,
      s"over-capacity estimate out of envelope: $est")
  }

  test("theta set difference: exact a-not-b under capacity; disjoint and subset edges; SQL name (D138)") {
    import graft.functions.ThetaSketch._
    // A = {0..499}, B = {250..749}: |A \ B| = 250, |B \ A| = 250 —
    // under capacity, so the estimates must be EXACT
    val a = (0 until 500).map(i => s"item$i").toDF("it")
    val b = (250 until 750).map(i => s"item$i").toDF("it")
    val sks = a.agg(thetaSketch(col("it")).as("sa"))
      .crossJoin(b.agg(thetaSketch(col("it")).as("sb")))
    val (ab, ba) = sks.select(
        thetaDiffEstimate(col("sa"), col("sb")).as("ab"),
        thetaDiffEstimate(col("sb"), col("sa")).as("ba"))
      .as[(Double, Double)].head()
    assert(ab == 250.0 && ba == 250.0, s"a-not-b drifted: $ab / $ba")
    // subset: A \ A = 0; disjoint: A \ C = |A|
    val c = (10000 until 10500).map(i => s"item$i").toDF("it")
    val edges = a.agg(thetaSketch(col("it")).as("sa"))
      .crossJoin(c.agg(thetaSketch(col("it")).as("sc")))
      .select(thetaDiffEstimate(col("sa"), col("sa")).as("self"),
        thetaDiffEstimate(col("sa"), col("sc")).as("disj"))
      .as[(Double, Double)].head()
    assert(edges == ((0.0, 500.0)), s"edge cases drifted: $edges")
    // SQL registration matches the Column API
    a.createOrReplaceTempView("t_theta_a")
    b.createOrReplaceTempView("t_theta_b")
    val viaSql = spark.sql(
      """SELECT theta_diff_estimate(
        |  (SELECT theta_sketch(it) FROM t_theta_a),
        |  (SELECT theta_sketch(it) FROM t_theta_b)) AS d""".stripMargin)
      .as[Double].head()
    assert(viaSql == 250.0, s"SQL theta_diff_estimate drifted: $viaSql")
  }

  test("theta_* SQL names match the Column API across sketch->union->intersect") {
    import graft.functions.ThetaSketch._
    val df = (0 until 300).map(i => (i % 3, s"t$i")).toDF("g", "it")
    df.createOrReplaceTempView("t_theta")
    val viaSql = spark.sql(
      """SELECT theta_estimate(theta_union(sk)) AS e,
        |       theta_intersect_estimate(theta_union(sk), theta_union(sk)) AS i
        |FROM (SELECT theta_sketch(it, 12) AS sk FROM t_theta GROUP BY g)""".stripMargin)
      .as[(Double, Double)].head()
    val viaCol = df.groupBy("g").agg(thetaSketch(col("it"), 12).as("sk"))
      .agg(thetaUnion(col("sk")).as("m"))
      .select(thetaEstimate(col("m")).as("e"),
        thetaIntersectEstimate(col("m"), col("m")).as("i"))
      .as[(Double, Double)].head()
    assert(viaSql == viaCol && viaSql._1 == 300.0 && viaSql._2 == 300.0)
    // int items coerce to strings like the Column wrapper casts
    assert(spark.sql("SELECT theta_estimate(theta_sketch(x)) AS e " +
      "FROM (SELECT id % 10 AS x FROM range(100))").as[Double].head() == 10.0)
  }
}
