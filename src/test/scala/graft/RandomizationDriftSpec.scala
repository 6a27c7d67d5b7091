package graft

import org.apache.spark.sql.functions._

import graft.operators.Stats

/** r13 stats wave: Cliff's delta (C110), 1-D Wasserstein (C111), Hill
  * tail index (C112), sign-flip randomization test (C113), Markov
  * stationary distribution (C116), Page-Hinkley drift (C117).
  */
class RandomizationDriftSpec extends SparkSpec {
  import spark.implicits._

  test("cliffsDelta: hand-counted pairs, ties contribute zero") {
    // a = {1, 2, 3}, b = {2}: pairs a>b = 1 (the 3), a<b = 1 (the 1),
    // tie = 1 -> delta = 0
    val df = Seq((1.0, true), (2.0, true), (3.0, true), (2.0, false))
      .toDF("v", "a")
    val r = Stats.cliffsDelta(df, col("v"), col("a"))
      .select("n_a", "n_b", "delta").as[(Long, Long, Double)].head()
    assert(r == ((3L, 1L, 0.0)))
    // full dominance: delta = 1, magnitude large
    val dom = Seq((10.0, true), (11.0, true), (1.0, false), (2.0, false))
      .toDF("v", "a")
    val d = Stats.cliffsDelta(dom, col("v"), col("a"))
      .select("delta", "magnitude").as[(Double, String)].head()
    assert(d == ((1.0, "large")))
  }

  test("cliffsDelta: empty side degenerate") {
    val df = Seq((1.0, true)).toDF("v", "a")
    val r = Stats.cliffsDelta(df, col("v"), col("a"))
      .select("delta", "magnitude", "degenerate")
      .as[(Double, String, Boolean)].head()
    assert(r == ((0.0, "negligible", true)))
  }

  test("wasserstein1d: a pure location shift costs exactly the shift") {
    // identical shapes offset by 2.0 -> W1 = 2.0
    val a = Seq(1.0, 2.0, 3.0, 4.0).map(("a", _))
    val b = Seq(3.0, 4.0, 5.0, 6.0).map(("b", _))
    val df = (a ++ b).toDF("g", "v")
    val r = Stats.wasserstein1d(df, col("g"), col("v"), "a", "b")
      .select("emd").as[Double].head()
    assert(math.abs(r - 2.0) < 1e-6, r.toString)
    // identical samples -> 0
    val same = (a ++ a.map { case (_, v) => ("b", v) }).toDF("g", "v")
    assert(Stats.wasserstein1d(same, col("g"), col("v"), "a", "b")
      .select("emd").as[Double].head() == 0.0)
  }

  test("hillTail: planted Pareto recovers alpha, short keys degenerate") {
    // exact Pareto(alpha=2) quantiles: x_i = (n/i)^(1/2); Hill on the
    // top-k of an exact quantile ladder estimates ~alpha
    val n = 2000
    val xs = (1 to n).map(i => ("p", math.pow(n.toDouble / i, 0.5)))
    val df = xs.toDF("k", "v")
    val r = Stats.hillTail(df, col("k"), col("v"), k = 100)
      .select("alpha", "degenerate").as[(Double, Boolean)].head()
    assert(!r._2 && math.abs(r._1 - 2.0) < 0.25, r.toString)
    val short = (1 to 10).map(i => ("s", i.toDouble)).toDF("k", "v")
    assert(Stats.hillTail(short, col("k"), col("v"), k = 50)
      .select("degenerate").as[Boolean].head())
  }

  test("signFlipTest: planted one-sided shift is significant, symmetric null is not") {
    // 40 subjects, every diff = +1.0 -> |T_obs| = 40; any sign flip
    // strictly shrinks it, so p = 1/65 (the add-one floor)
    val shifted = (1 to 40).flatMap(u => Seq(
      (u.toLong, "a", 2.0), (u.toLong, "b", 1.0))).toDF("u", "g", "v")
    val r = Stats.signFlipTest(shifted, col("u"), col("g"), col("v"), "a", "b")
      .select("n_subjects", "t_obs", "p_value", "significant")
      .as[(Long, Double, Double, Boolean)].head()
    assert(r._1 == 40L && r._2 == 40.0 && r._4, r.toString)
    assert(math.abs(r._3 - 1.0 / 65) < 1e-4)
    // exactly balanced +1/-1 diffs: T_obs = 0, every permutation ties
    // or beats it -> p = 1
    val balanced = (1 to 40).flatMap { u =>
      val d = if (u % 2 == 0) 1.0 else -1.0
      Seq((u.toLong, "a", 1.0 + d), (u.toLong, "b", 1.0))
    }.toDF("u", "g", "v")
    val b0 = Stats.signFlipTest(balanced, col("u"), col("g"), col("v"), "a", "b")
      .select("t_obs", "significant").as[(Double, Boolean)].head()
    assert(b0._1 == 0.0 && !b0._2)
  }

  test("markovStationary matches the analytic two-state chain") {
    // chain a->b always, b->a always: period-2, but power iteration
    // from uniform stays (0.5, 0.5) every round
    val flip = (1 to 20).flatMap(u => (0 to 9).map(i =>
      (u.toLong, i.toLong, i.toLong, if (i % 2 == 0) "a" else "b")))
      .toDF("u", "o", "tb", "s")
    val r = Stats.markovStationary(flip, col("u"), col("o"), col("s"),
        col("tb"), iters = 50)
      .select("state", "stationary").as[(String, Double)].collect().toMap
    assert(math.abs(r("a") - 0.5) < 1e-4 && math.abs(r("b") - 0.5) < 1e-4)
    // biased chain: a->a 3/4, a->b 1/4; b->a always.
    // pi = (4/5, 1/5) analytically
    val seq5 = Seq("a", "a", "a", "a", "b") // transitions a->a x3, a->b, b->(next a)
    val biased = (1 to 50).flatMap(u => (0 until 20).map(i =>
      (u.toLong, i.toLong, i.toLong, seq5(i % 5)))).toDF("u", "o", "tb", "s")
    val p = Stats.markovStationary(biased, col("u"), col("o"), col("s"),
        col("tb"), iters = 50)
      .select("state", "stationary").as[(String, Double)].collect().toMap
    assert(math.abs(p("a") - 0.8) < 0.01 && math.abs(p("b") - 0.2) < 0.01, p.toString)
  }

  test("markovStationary: absorbing state self-loops and swallows the mass") {
    // a -> b, b -> b ... terminal state b never leaves
    val df = (1 to 10).map(u => (u.toLong, Seq(0L, 1L), "x")).flatMap {
      case (u, os, _) => Seq((u, 0L, 0L, "a"), (u, 1L, 1L, "b"))
    }.toDF("u", "o", "tb", "s")
    val r = Stats.markovStationary(df, col("u"), col("o"), col("s"),
        col("tb"), iters = 50)
      .select("state", "stationary", "is_absorbing")
      .as[(String, Double, Boolean)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(r("b")._2 && !r("a")._2)
    assert(r("b")._1 > 0.99 && r("a")._1 < 0.01)
  }

  test("pageHinkley: a planted level shift alarms, a stable series never does") {
    val stable = (0 until 50).map(i => ("k", i.toLong, 10.0 + (i % 2)))
      .toDF("g", "b", "v")
    val s = Stats.pageHinkley(stable, col("g"), col("b"), col("v"),
      delta = 0.5, lambda = 8.0)
    assert(s.filter(col("alarm")).count() == 0L)
    // mean jumps 10 -> 20 at bucket 30: the running-mean lag
    // accumulates (x - mean - delta) > 0 until PH crosses lambda
    val shifted = (0 until 60).map(i =>
      ("k", i.toLong, if (i < 30) 10.0 else 20.0)).toDF("g", "b", "v")
    val a = Stats.pageHinkley(shifted, col("g"), col("b"), col("v"),
        delta = 0.5, lambda = 8.0)
      .filter(col("alarm")).select(min(col("bucket"))).as[Long].head()
    assert(a >= 30L && a <= 35L, s"first alarm at $a")
  }

  test("seasonalMannKendall flags drift the plain MK drowns in a cycle") {
    // strong period-4 cycle (amplitude 100) + slow drift (+0.2/cycle);
    // plain MK's cross-phase pairs swamp the drift signal
    val vals = (0 until 80).map { t =>
      val cycle = Seq(0.0, 100.0, 50.0, -80.0)(t % 4)
      ("k", t.toLong, cycle + 0.2 * (t / 4))
    }.toDF("g", "t", "v")
    val seasonal = Stats.seasonalMannKendall(vals, col("g"), col("t"),
        col("v"), period = 4)
      .select("s", "z", "n_seasons").as[(Long, Double, Long)].head()
    // every within-season pair rises: S = 4 seasons x C(20,2) = 760
    assert(seasonal._1 == 760L && seasonal._3 == 4L, seasonal.toString)
    assert(seasonal._2 > 1.96)
    val plain = Stats.mannKendall(vals.toDF("g", "t", "v"), col("g"),
        col("t"), col("v"), computeSen = false)
      .select("z").as[Double].head()
    assert(math.abs(plain) < seasonal._2, s"plain $plain vs ${seasonal._2}")
  }

  test("ebShrink pulls small-n rates toward the prior and can flip a ranking") {
    // many stable keys around 0.5, one 2/2=1.0 key, one 180/300=0.6
    val per = (1 to 40).map(i => (i.toLong, 50L + (i % 7), 100L)) ++
      Seq((100L, 2L, 2L), (101L, 180L, 300L))
    val df = per.flatMap { case (u, x, n) =>
      (1L to n).map(j => (u, j <= x))
    }.toDF("u", "hit")
    val r = Stats.ebShrink(df, col("u"), col("hit").cast("long"), lit(1L))
      .select("key", "rate", "shrunk_rate", "degenerate")
      .as[(Long, Double, Double, Boolean)].collect()
      .map(t => t._1 -> t).toMap
    assert(!r(100L)._4)
    // raw: 1.0 > 0.6; shrunk: the 2-trial key collapses toward ~0.5
    assert(r(100L)._2 == 1.0 && r(101L)._2 == 0.6)
    assert(r(100L)._3 < r(101L)._3, s"${r(100L)} vs ${r(101L)}")
    assert(r(100L)._3 > 0.4 && r(100L)._3 < 1.0)
  }

  test("holmBonferroni is stepwise-stricter than BH and flags untested") {
    val hyp = Seq(("a", 0.001), ("b", 0.011), ("c", 0.02), ("d", 0.9))
      .toDF("k", "p")
      .unionByName(Seq(("e", Option.empty[Double])).toDF("k", "p"))
    val r = Stats.holmBonferroni(hyp, col("k"), col("p"), alpha = 0.05)
      .collect().map(x => x.getString(0) -> x).toMap
    // adj: a = min(1, 4x0.001) = 0.004; b = max(0.004, 3x0.011=0.033);
    // c = max(0.033, 2x0.02=0.04); d = max(..., 1x0.9) = 0.9
    assert(r("a").getAs[Boolean]("discovery"))
    assert(r("b").getAs[Boolean]("discovery"))
    assert(r("c").getAs[Boolean]("discovery"))
    assert(!r("d").getAs[Boolean]("discovery"))
    assert(math.abs(r("c").getAs[Double]("adj_p") - 0.04) < 1e-9)
    assert(r("e").getAs[Boolean]("untested") && !r("e").getAs[Boolean]("discovery"))
  }

  test("dominantPeriod finds a planted period-6 cycle; flat series degenerate") {
    val vals = (0 until 120).map(t =>
      ("k", t.toLong, Seq(0.0, 5.0, 9.0, 5.0, 0.0, -9.0)(t % 6)))
      .toDF("g", "b", "v")
    val r = Stats.dominantPeriod(vals, col("g"), col("b"), col("v"),
        maxLag = 24)
      .select("period", "significant", "degenerate")
      .as[(Int, Boolean, Boolean)].head()
    assert(r._1 == 6 && r._2 && !r._3, r.toString)
    val flatS = (0 until 60).map(t => ("k", t.toLong, 3.0)).toDF("g", "b", "v")
    val f = Stats.dominantPeriod(flatS, col("g"), col("b"), col("v"))
      .select("degenerate").as[Boolean].head()
    assert(f)
  }

  test("lorenzCurve: uniform masses walk the diagonal, one whale bends it") {
    import graft.operators.Profile
    val uni = (1 to 100).map(i => ("u", 10L)).toDF("g", "m")
    val r = Profile.lorenzCurve(uni, col("g"), col("m"), nBins = 10)
      .orderBy("bin").select("cum_row_share", "cum_mass_share")
      .as[(Double, Double)].collect()
    r.foreach { case (rows, mass) => assert(math.abs(rows - mass) < 1e-6) }
    // 99 rows of 1 + one of 901: bottom 90% carries under 10% of mass
    val whale = ((1 to 99).map(_ => ("w", 1L)) :+ (("w", 901L))).toDF("g", "m")
    val w = Profile.lorenzCurve(whale, col("g"), col("m"), nBins = 10)
      .orderBy("bin").select("bin", "cum_mass_share")
      .as[(Int, Double)].collect().toMap
    assert(w(9) < 0.1 && w(10) == 1.0, w.toString)
  }

  test("consistentHashPlan moves ~1/9 on 8->9 shards; every row keeps exactly one segment per ring") {
    import graft.operators.Sampling
    val keys = (1L to 5000L).map(Tuple1(_)).toDF("k")
    val plan = Sampling.consistentHashPlan(keys, col("k"), nOld = 8,
      nNew = 9, vnodes = 32)
    assert(plan.count() == 5000L) // one (old, new) row per key - no segment gaps/overlaps
    val moved = plan.filter(col("moved")).count().toDouble / 5000.0
    assert(moved > 0.02 && moved < 0.35, s"moved fraction $moved")
    // rows that move must land on shards (consistency sanity)
    assert(plan.filter(col("shard_new") < 0 || col("shard_new") > 8).count() == 0)
  }
}
