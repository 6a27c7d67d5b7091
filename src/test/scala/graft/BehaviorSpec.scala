package graft

import org.apache.spark.sql.functions._

import graft.operators.{Behavior, Profile, Stats}

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  test("funnel requires steps in order: out-of-order completions don't count") {
    // u1 does A->B in order; u2 does B before A (B must not count);
    // u3 only A. Times are plain integers.
    val ev = Seq(
      (1L, 10L, "A"), (1L, 20L, "B"),
      (2L, 10L, "B"), (2L, 20L, "A"),
      (3L, 10L, "A")
    ).toDF("u", "t", "et")
    val f = Behavior.funnel(ev, col("u"), col("t"), col("et"), Seq("A", "B"))
      .collect().map(r => r.getInt(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(f(1) == ((3L, 1.0)), f.toString)          // all three did A
    assert(f(2) == ((1L, 0.333333)), f.toString)     // only u1 did B after A
  }

  test("funnel step at the same instant as the previous counts (at-or-after)") {
    val ev = Seq((1L, 10L, "A"), (1L, 10L, "B")).toDF("u", "t", "et")
    val f = Behavior.funnel(ev, col("u"), col("t"), col("et"), Seq("A", "B"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(f(2) == 1L)
  }

  test("retentionCohorts buckets by first-active period and counts returns") {
    // bucket = 100 us. u1 active in w0,w2; u2 in w1; u3 in w0,w1
    val ev = Seq(
      (1L, 10L), (1L, 250L),
      (2L, 150L),
      (3L, 50L), (3L, 110L)
    ).toDF("u", "ts")
    val r = Behavior.retentionCohorts(ev, col("u"), col("ts"), bucketUs = 100L)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(r((0L, 0L)) == 2L)  // u1, u3 first in w0
    assert(r((0L, 2L)) == 1L)  // u1 returns in w2
    assert(r((0L, 1L)) == 1L)  // u3 returns in w1
    assert(r((1L, 0L)) == 1L)  // u2 cohort w1
  }

  test("rollingActiveUsers: trailing-window distinct counts, exact") {
    // bucket 10us, window 3. u1 active at w0 and w5; u2 at w1.
    val ev = Seq((1L, 5L), (1L, 52L), (2L, 15L)).toDF("u", "ts")
    val r = Behavior.rollingActiveUsers(ev, col("u"), col("ts"),
        bucketUs = 10L, windowPeriods = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // w0: u1 -> periods 0,1,2 ; w1: u2 -> periods 1,2,3 ; w5: u1 -> 5,6,7
    assert(r == Map(0L -> 1L, 1L -> 2L, 2L -> 2L, 3L -> 1L,
      5L -> 1L, 6L -> 1L, 7L -> 1L), r.toString)
  }

  test("newVsReturning: first period counts as new, later activity as returning") {
    // bucket 10: u1 active w0,w1; u2 active w1 only
    val ev = Seq((1L, 0L), (1L, 12L), (2L, 15L)).toDF("u", "ts")
    val r = Behavior.newVsReturning(ev, col("u"), col("ts"), bucketUs = 10L)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r == Map(0L -> ((1L, 0L)), 1L -> ((1L, 1L))), r.toString)
  }

  test("twoSampleZ: clearly separated groups are significant, identical groups are not") {
    import graft.operators.Stats
    val sep = (Seq.tabulate(20)(i => ("a", 10.0 + i % 3)) ++
      Seq.tabulate(20)(i => ("b", 50.0 + i % 3))).toDF("g", "v")
    val Array(s1) = Stats.twoSampleZ(sep, col("g"), col("v"), "a", "b").collect()
    assert(s1.getBoolean(5), s1.toString)
    assert(s1.getDouble(4) < -10, s1.toString) // a far below b
    val same = (Seq.tabulate(20)(i => ("a", 10.0 + i % 3)) ++
      Seq.tabulate(20)(i => ("b", 10.0 + i % 3))).toDF("g", "v")
    val Array(s2) = Stats.twoSampleZ(same, col("g"), col("v"), "a", "b").collect()
    assert(!s2.getBoolean(5) && s2.getDouble(4) == 0.0, s2.toString)
  }

  test("twoSampleZ: empty input yields zeros (not nulls); significance is sign-symmetric") {
    import graft.operators.Stats
    // empty input: every aggregate is NULL upstream — the contract says
    // (0, 0.0, 0, 0.0, 0.0, false), not a NULL cascade
    val empty = Seq.empty[(String, Double)].toDF("g", "v")
    val Array(e) = Stats.twoSampleZ(empty, col("g"), col("v"), "a", "b").collect()
    assert(e.getLong(0) == 0L && e.getLong(2) == 0L, e.toString)
    assert(e.getDouble(4) == 0.0 && !e.getBoolean(5), e.toString)
    // sign symmetry: swapping the group labels flips z's sign exactly
    // (toward-zero truncation) and never flips `significant`
    val sep = (Seq.tabulate(20)(i => ("a", 10.0 + i % 3)) ++
      Seq.tabulate(20)(i => ("b", 50.0 + i % 3))).toDF("g", "v")
    val Array(ab) = Stats.twoSampleZ(sep, col("g"), col("v"), "a", "b").collect()
    val Array(ba) = Stats.twoSampleZ(sep, col("g"), col("v"), "b", "a").collect()
    assert(ab.getDouble(4) == -ba.getDouble(4), s"$ab vs $ba")
    assert(ab.getBoolean(5) == ba.getBoolean(5), s"$ab vs $ba")
  }

  test("boxplot: quartiles and whisker outliers on a known distribution") {
    // group g: 1..9 plus a wild outlier 100
    val df = ((1 to 9).map(v => ("g", v.toDouble)) :+ (("g", 100.0))).toDF("k", "v")
    val Array(r) = Profile.boxplot(df, col("k"), col("v")).collect()
    // n=10; quantile_cont: p25=3.25, p50=5.5, p75=7.75; iqr=4.5;
    // upper whisker=14.5 -> only 100 is outside
    assert(r.getLong(1) == 10L)
    assert(r.getDouble(2) == 3.25 && r.getDouble(3) == 5.5 && r.getDouble(4) == 7.75)
    assert(r.getLong(5) == 1L)
  }

  test("prCurve: hand-computed confusion counts at every threshold, one row per cut") {
    // scores: positives at .9 .6 .4, negatives at .8 .3 .1; null score row excluded
    val df = Seq(
      (Some(0.9), Some(true)), (Some(0.6), Some(true)), (Some(0.4), Some(true)),
      (Some(0.8), Some(false)), (Some(0.3), Some(false)), (Some(0.1), Some(false)),
      (None, Some(true)), (Some(0.5), None)
    ).toDF("score", "y")
    val r = Stats.prCurve(df, col("score"), col("y"), Seq(0.5, 0.85))
      .orderBy("threshold").collect()
      .map(x => (x.getDouble(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getDouble(5), x.getDouble(6), x.getDouble(7)))
    // t=0.5: pred+ = {.9+,.6+,.8-} -> tp=2 fp=1 fn=1 tn=2; p=.6667 r=.6667
    assert(r(0) == ((0.5, 2L, 1L, 1L, 2L, 0.6667, 0.6667, 0.6667)))
    // t=0.85: pred+ = {.9+} -> tp=1 fp=0 fn=2 tn=3; p=1.0 r=.3333
    assert(r(1)._1 == 0.85)
    assert((r(1)._2, r(1)._3, r(1)._4, r(1)._5) == ((1L, 0L, 2L, 3L)))
    assert((r(1)._6, r(1)._7) == ((1.0, 0.3333)))
    assert(r(1)._8 == math.floor(2.0 * 1.0 * 0.3333 / 1.3333 * 1e4 + 0.5) / 1e4)
  }

  test("prCurve: empty/degenerate frames report zero rows, 0/0 ratios are 0.0") {
    val empty = Seq.empty[(Option[Double], Option[Boolean])].toDF("score", "y")
    val r = Stats.prCurve(empty, col("score"), col("y"), Seq(0.5)).collect()
    assert(r.length == 1)
    val x = r.head
    assert((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)) == ((0L, 0L, 0L, 0L)))
    assert((x.getDouble(5), x.getDouble(6), x.getDouble(7)) == ((0.0, 0.0, 0.0)))
  }
}
