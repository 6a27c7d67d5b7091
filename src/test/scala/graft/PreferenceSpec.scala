package graft

import org.apache.spark.sql.functions._

import graft.operators.Preference

/** SURVEY §2.D85-D87: preference pair assembly, Bradley-Terry MM
  * ratings, Wilson-bounded win rates.
  */
class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  test("pairsFromGroups picks argmax/argmin with deterministic tie-breaks and flags") {
    val samples = Seq(
      // group 1: clean pair, gap 30
      (1L, 10L, "the long winning answer", 40.0),
      (1L, 11L, "a short one", 10.0),
      (1L, 12L, "middle answer", 25.0),
      // group 2: all rewards tied — chosen = min id, rejected = max id
      (2L, 20L, "alpha", 5.0),
      (2L, 21L, "beta", 5.0),
      (2L, 22L, "gamma", 5.0),
      // group 3: singleton
      (3L, 30L, "alone", 9.0),
      // group 4: chosen and rejected share content (case/punct variant)
      (4L, 40L, "Same Body!", 50.0),
      (4L, 41L, "same body", 1.0)
    ).toDF("g", "id", "resp", "rew")
    val out = Preference.pairsFromGroups(samples, col("g"), col("id"),
      col("resp"), col("rew"), minGap = 10.0).orderBy("group_key").collect()

    assert(out(0).getAs[Long]("chosen_id") == 10L)
    assert(out(0).getAs[Long]("rejected_id") == 11L)
    assert(out(0).getAs[Double]("reward_gap") == 30.0)
    assert(out(0).getAs[Boolean]("valid"))

    assert(out(1).getAs[Long]("chosen_id") == 20L)
    assert(out(1).getAs[Long]("rejected_id") == 22L)
    assert(!out(1).getAs[Boolean]("valid")) // gap 0 < 10

    // singleton: chosen == rejected, invalid on n_samples AND fingerprint
    assert(out(2).getAs[Long]("n_samples") == 1L)
    assert(out(2).getAs[Long]("chosen_id") == 30L)
    assert(out(2).getAs[Long]("rejected_id") == 30L)
    assert(!out(2).getAs[Boolean]("distinct_response"))
    assert(!out(2).getAs[Boolean]("valid"))

    // normalized-identical responses fail distinct_response despite the gap
    assert(out(3).getAs[Double]("reward_gap") == 49.0)
    assert(!out(3).getAs[Boolean]("distinct_response"))
    assert(!out(3).getAs[Boolean]("valid"))
  }

  test("pairsFromGroups is one exchange: both windows and the aggregate share partitioning") {
    val samples = Seq((1L, 1L, "a", 1.0), (1L, 2L, "b", 2.0))
      .toDF("g", "id", "resp", "rew")
    val plan = Preference.pairsFromGroups(samples, col("g"), col("id"),
      col("resp"), col("rew")).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("bradleyTerry orders a dominance chain and normalizes to mean 1") {
    // A(0) beats B(1) 3x, B beats C(2) 3x, A beats C 3x, plus one
    // upset each way so no pair is degenerate.
    val games = (Seq.fill(3)((0L, 1L)) ++ Seq.fill(3)((1L, 2L)) ++
      Seq.fill(3)((0L, 2L)) ++ Seq((1L, 0L), (2L, 1L)))
      .toDF("winner", "loser")
    val out = Preference.bradleyTerry(games, col("winner"), col("loser"),
      iterations = 3).orderBy("player").collect()
    val ratings = out.map(_.getAs[Double]("rating"))
    assert(ratings(0) > ratings(1) && ratings(1) > ratings(2),
      s"dominance chain broken: ${ratings.toSeq}")
    assert(math.abs(ratings.sum - 3.0) < 1e-4,
      s"mean-1 normalization: sum = ${ratings.sum}")
  }

  test("bradleyTerry is invariant to input row order") {
    val games = Seq((0L, 1L), (0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L))
      .toDF("winner", "loser")
    val a = Preference.bradleyTerry(games, col("winner"), col("loser"))
      .orderBy("player").collect().map(_.getAs[Double]("rating")).toSeq
    val b = Preference.bradleyTerry(games.orderBy(rand(11)), col("winner"), col("loser"))
      .orderBy("player").collect().map(_.getAs[Double]("rating")).toSeq
    assert(a == b)
  }

  test("bradleyTerry smooths never-winners above zero") {
    val games = Seq((0L, 1L), (0L, 1L)).toDF("winner", "loser")
    val out = Preference.bradleyTerry(games, col("winner"), col("loser"))
      .orderBy("player").collect()
    assert(out(1).getAs[Double]("rating") > 0.0)
    assert(out(0).getAs[Double]("rating") > out(1).getAs[Double]("rating"))
  }

  test("groupAdvantage: GRPO normalization with tied and singleton groups") {
    val rollouts = Seq(
      (1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 30.0), (1L, 4L, 40.0),
      (2L, 5L, 7.0), (2L, 6L, 7.0), (2L, 7L, 7.0), // fully tied
      (3L, 8L, 99.0) // singleton
    ).toDF("g", "id", "r")
    val out = Preference.groupAdvantage(rollouts, col("g"), col("id"), col("r"))
      .orderBy("group_key", "sample_id").collect()
    // group 1: mean 25, pop std sqrt(125) ≈ 11.1803; adv of r=10:
    val sd = math.sqrt(125.0)
    val exp = (10.0 - 25.0) / (sd + 1e-4)
    def t4z(x: Double) = math.signum(x) * (math.floor(math.abs(x) * 1e4) / 1e4) + 0.0
    assert(out(0).getAs[Double]("advantage") == t4z(exp))
    assert(out(0).getAs[Double]("group_mean") == 25.0)
    assert(out(0).getAs[Double]("group_std") == t4z(sd))
    // advantages within a group are symmetric here: a(10) == -a(40)
    assert(out(0).getAs[Double]("advantage") == -out(3).getAs[Double]("advantage"))
    // tied group: every advantage exactly 0 (no-signal outcome)
    (4 to 6).foreach(i => assert(out(i).getAs[Double]("advantage") == 0.0))
    // singleton: std 0, advantage 0, sample kept
    assert(out(7).getAs[Double]("advantage") == 0.0)
    assert(out(7).getAs[Long]("group_n") == 1L)
  }

  test("bestOfN: keeps the best accepted sample and flags starved groups") {
    val rollouts = Seq(
      (1L, 1L, 5.0), (1L, 2L, 9.0), (1L, 3L, 9.0), (1L, 4L, 2.0), // tie at 9
      (2L, 5L, 1.0), (2L, 6L, 3.0) // nothing clears the bar
    ).toDF("g", "id", "r")
    val out = Preference.bestOfN(rollouts, col("g"), col("id"), col("r"),
      minReward = 4.0).orderBy("group_key").collect()
    assert(out(0).getAs[Long]("n_candidates") == 4L)
    assert(out(0).getAs[Long]("n_accepted") == 3L)
    assert(out(0).getAs[Long]("kept_id") == 2L) // tie at 9.0 → smaller id
    assert(out(0).getAs[Double]("kept_reward") == 9.0)
    assert(out(0).getAs[Double]("accept_rate") == 0.75)
    assert(!out(0).getAs[Boolean]("starved"))
    assert(out(1).getAs[Long]("n_accepted") == 0L)
    assert(out(1).isNullAt(out(1).fieldIndex("kept_id")))
    assert(out(1).getAs[Boolean]("starved"))
  }

  test("winRates: Wilson lower bound ranks 95/100 above 2/2") {
    val sure = (1 to 95).map(_ => (10L, 20L)) ++ (1 to 5).map(_ => (20L, 10L))
    val lucky = Seq((30L, 40L), (30L, 40L))
    val out = Preference.winRates((sure ++ lucky).toDF("winner", "loser"),
      col("winner"), col("loser")).collect()
      .map(r => r.getAs[Long]("player") -> r).toMap
    assert(out(30L).getAs[Double]("win_rate") == 1.0)
    assert(out(10L).getAs[Double]("win_rate") == 0.95)
    assert(out(10L).getAs[Double]("wilson_lo") > out(30L).getAs[Double]("wilson_lo"),
      "95/100 must outrank 2/2 on the lower bound")
    // hand-check 95/100 against the closed form
    val (p, n, z) = (0.95, 100.0, 1.96)
    val z2 = z * z
    val lo = (p + z2 / (n * 2.0) - z * math.sqrt(p * (1 - p) / n + z2 / (n * n * 4.0))) /
      (1.0 + z2 / n)
    assert(out(10L).getAs[Double]("wilson_lo") == math.floor(lo * 1e4) / 1e4)
  }

  test("lengthBias: hand-computed counts, sign test, ties excluded, strong bias flags") {
    import graft.operators.Preference
    // lens (chosen, rejected): (5,3) (2,4) (4,4) (6,1) →
    // longer 2, shorter 1, tie 1; sd=5; z=(2−1.5)/√0.75
    val pairs = Seq(("abcde", "abc"), ("ab", "abcd"),
      ("abcd", "wxyz"), ("abcdef", "a")).toDF("c", "r")
    val Array(o) = Preference.lengthBias(pairs, col("c"), col("r")).collect()
    assert(o.getLong(0) == 4L && o.getLong(1) == 2L
      && o.getLong(2) == 1L && o.getLong(3) == 1L, o.toString)
    assert(o.getDouble(4) == math.floor(2.0 / 3.0 * 1e6) / 1e6)
    assert(o.getDouble(5) == 1.25)
    val zRaw = (2.0 - 3.0 / 2.0) / math.sqrt(3.0 / 4.0)
    assert(o.getDouble(6) == math.floor(zRaw * 1e4) / 1e4, o.toString)
    assert(!o.getBoolean(7))
    // longer always wins over 30 pairs: strongly significant
    val biased = Seq.tabulate(30)(i => ("longer" + "x" * i, "s")).toDF("c", "r")
    val Array(b) = Preference.lengthBias(biased, col("c"), col("r")).collect()
    assert(b.getBoolean(7) && b.getDouble(4) == 1.0, b.toString)
    // all ties: no verdict, clean zeros
    val ties = Seq(("aa", "bb"), ("cc", "dd")).toDF("c", "r")
    val Array(t) = Preference.lengthBias(ties, col("c"), col("r")).collect()
    assert(t.getLong(3) == 2L && t.getDouble(6) == 0.0 && !t.getBoolean(7))
  }
}
