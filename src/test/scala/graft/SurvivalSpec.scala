package graft

import org.apache.spark.sql.functions._

import graft.operators.Stats

/** C108 Kaplan-Meier + C109 log-rank: hand-computed curves, censoring,
  * the absorbing (d = n) tail, and curve-separation verdicts.
  */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("kaplanMeier reproduces the hand-computed life table") {
    // classic toy: durations 1,1,2*,3,4 (star = censored at 2)
    // t=1: n=5, d=2 -> S = 3/5 = 0.6
    // t=3: n=2 (one censored at 2), d=1 -> S = 0.6 * 1/2 = 0.3
    // t=4: n=1, d=1 -> S = 0 (absorbing d = n)
    val df = Seq(
      ("g", 1L, true), ("g", 1L, true), ("g", 2L, false),
      ("g", 3L, true), ("g", 4L, true)
    ).toDF("grp0", "dur", "obs")
    val out = Stats.kaplanMeier(df, col("grp0"), col("dur"), col("obs"))
      .orderBy("t")
      .select("t", "n_risk", "n_event", "n_censor", "survival")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3, r._4)) ==
      Seq((1L, 5L, 2L, 0L), (3L, 2L, 1L, 0L), (4L, 1L, 1L, 0L)))
    assert(math.abs(out(0)._5 - 0.6) < 2e-6)
    assert(math.abs(out(1)._5 - 0.3) < 2e-6)
    assert(out(2)._5 == 0.0) // absorbing: the whole risk set died
  }

  test("kaplanMeier: censor-only times never emit a row but do shrink the risk set") {
    val df = Seq(
      ("g", 1L, true), ("g", 2L, false), ("g", 2L, false), ("g", 5L, true)
    ).toDF("grp0", "dur", "obs")
    val out = Stats.kaplanMeier(df, col("grp0"), col("dur"), col("obs"))
      .orderBy("t").select("t", "n_risk", "survival")
      .as[(Long, Long, Double)].collect().toSeq
    // t=2 has no event row; t=5's risk set is 1 (two censored left)
    assert(out.map(_._1) == Seq(1L, 5L))
    assert(out(1)._2 == 1L)
    assert(out(1)._3 == 0.0)
  }

  test("logRank: identical curves score ~0, separated curves flag") {
    val same = (1 to 40).flatMap(i => Seq(
      ("a", (i % 5 + 1).toLong, true), ("b", (i % 5 + 1).toLong, true)))
      .toDF("g", "dur", "obs")
    val s0 = Stats.logRank(same, col("g"), col("dur"), col("obs"), "a", "b")
      .select("chi2", "significant").as[(Double, Boolean)].head()
    assert(s0._1 == 0.0 && !s0._2)
    // group b survives 10x longer
    val split = ((1 to 40).map(i => ("a", (i % 3 + 1).toLong, true)) ++
      (1 to 40).map(i => ("b", (i % 3 + 20).toLong, true)))
      .toDF("g", "dur", "obs")
    val s1 = Stats.logRank(split, col("g"), col("dur"), col("obs"), "a", "b")
      .select("chi2", "significant").as[(Double, Boolean)].head()
    assert(s1._1 > 3.841 && s1._2, s1.toString)
  }

  test("logRank: empty side is degenerate, not a throw") {
    val df = Seq(("a", 1L, true), ("a", 2L, true)).toDF("g", "dur", "obs")
    val r = Stats.logRank(df, col("g"), col("dur"), col("obs"), "a", "b")
      .select("n_b", "chi2", "degenerate").as[(Long, Double, Boolean)].head()
    assert(r == ((0L, 0.0, true)))
  }
}
