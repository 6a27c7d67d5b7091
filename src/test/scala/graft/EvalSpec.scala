package graft

import org.apache.spark.sql.functions._

import graft.operators.Eval

/** SURVEY §2.D90-D93: pass@k estimation, self-consistency majority
  * vote, McNemar paired comparison, Cohen's kappa agreement.
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("passAtK matches the closed form, short-circuits, and flags undersampling") {
    val df = Seq(
      // problem 1: n=5, c=2 → pass@2 = 1 - C(3,2)/C(5,2) = 1 - 3/10 = 0.7
      (1L, true), (1L, true), (1L, false), (1L, false), (1L, false),
      // problem 2: n=4, c=3 → failures 1 < k=2 → exactly 1.0
      (2L, true), (2L, true), (2L, true), (2L, false),
      // problem 3: n=3, c=0 → pass@2 = 1 - C(3,2)/C(3,2) = 0.0
      (3L, false), (3L, false), (3L, false),
      // problem 4: n=1 < k → undefined, flagged
      (4L, true)
    ).toDF("p", "ok")
    val out = Eval.passAtK(df, col("p"), col("ok"), k = 2)
      .orderBy("problem_key").collect()
    assert(out(0).getAs[Double]("pass_at_2") == 0.7)
    assert(!out(0).getAs[Boolean]("undersampled"))
    assert(out(1).getAs[Double]("pass_at_2") == 1.0)
    assert(out(2).getAs[Double]("pass_at_2") == 0.0)
    assert(out(3).isNullAt(out(3).fieldIndex("pass_at_2")))
    assert(out(3).getAs[Boolean]("undersampled"))
  }

  test("passAtK past the exact-lane bound switches to double ratios instead of overflowing") {
    // k=8, n=300: the falling-factorial BIGINT product would exceed
    // 2^63 (300^8 ≈ 6.6e19) and wrap; the guard switches to the
    // per-factor ratio product
    val rows = (1 to 300).map(i => (1L, i <= 150))
    val out = Eval.passAtK(rows.toDF("p", "ok"), col("p"), col("ok"), k = 8)
      .collect()(0)
    val expected = {
      val r = (0 until 8).map(i => (150.0 - i) / (300.0 - i)).product
      math.floor((1.0 - r) * 1e4) / 1e4
    }
    val got = out.getAs[Double]("pass_at_8")
    assert(got == expected, s"got $got expected $expected")
    assert(got > 0.99 && got <= 1.0)
  }

  test("passAtK at k=1 equals the plain accuracy ratio") {
    val df = Seq((1L, true), (1L, false), (1L, false), (1L, false))
      .toDF("p", "ok")
    val out = Eval.passAtK(df, col("p"), col("ok"), k = 1).collect()
    // 1 - C(3,1)/C(4,1) = 1 - 3/4 = 0.25
    assert(out(0).getAs[Double]("pass_at_1") == 0.25)
  }

  test("majorityVote picks the modal answer with count-then-answer tie-break; abstentions never win") {
    val df = Seq(
      // problem 1: b×2, a×1 → consensus b, agreement 2/3
      (1L, Some("b")), (1L, Some("b")), (1L, Some("a")),
      // problem 2: a×2, b×2 tie → lexicographically smaller a wins
      (2L, Some("a")), (2L, Some("a")), (2L, Some("b")), (2L, Some("b")),
      // problem 3: one vote + two abstentions → consensus z over nulls,
      // agreement 1/1 (abstentions excluded from the denominator)
      (3L, Some("z")), (3L, None), (3L, None),
      // problem 4: all abstained → no consensus
      (4L, None), (4L, None)
    ).toDF("p", "ans")
    val out = Eval.majorityVote(df, col("p"), col("ans"))
      .orderBy("problem_key").collect()
    assert(out(0).getAs[String]("consensus") == "b")
    assert(out(0).getAs[Long]("consensus_votes") == 2L)
    assert(out(0).getAs[Double]("agreement") == 0.6666)
    assert(out(1).getAs[String]("consensus") == "a")
    assert(out(2).getAs[String]("consensus") == "z")
    assert(out(2).getAs[Long]("n_samples") == 3L)
    assert(out(2).getAs[Long]("n_voted") == 1L)
    assert(out(2).getAs[Double]("agreement") == 1.0)
    assert(out(3).isNullAt(out(3).fieldIndex("consensus")))
    assert(out(3).getAs[Long]("n_voted") == 0L)
    assert(out(3).isNullAt(out(3).fieldIndex("agreement")))
  }

  test("mcnemar counts the 2x2 exactly, applies continuity correction, skips ungraded") {
    // both=3, neither=2, a_only=6, b_only=1, one row ungraded each side
    val rows =
      Seq.fill(3)((Some(true), Some(true))) ++
        Seq.fill(2)((Some(false), Some(false))) ++
        Seq.fill(6)((Some(true), Some(false))) ++
        Seq((Some(false), Some(true))) ++
        Seq((None: Option[Boolean], Some(true)), (Some(true), None: Option[Boolean]))
    val out = Eval.mcnemar(rows.toDF("a", "b"), col("a"), col("b")).collect()(0)
    assert(out.getAs[Long]("n_items") == 12L)
    assert(out.getAs[Long]("n_skipped") == 2L)
    assert(out.getAs[Long]("a_only") == 6L)
    assert(out.getAs[Long]("b_only") == 1L)
    // chi2 = (|6-1|-1)^2 / 7 = 16/7 = 2.2857
    assert(out.getAs[Double]("chi2") == 2.2857)
    assert(!out.getAs[Boolean]("significant"))
    // acc_a = 9/12 = 0.75, acc_b = 4/12 = 0.3333
    assert(out.getAs[Double]("acc_a") == 0.75)
    assert(out.getAs[Double]("acc_b") == 0.3333)
  }

  test("mcnemar with zero discordant pairs reports chi2 = 0, not significant") {
    val df = Seq((true, true), (false, false), (true, true)).toDF("a", "b")
    val out = Eval.mcnemar(df, col("a"), col("b")).collect()(0)
    assert(out.getAs[Double]("chi2") == 0.0)
    assert(!out.getAs[Boolean]("significant"))
  }

  test("mcnemar flags a lopsided disagreement as significant") {
    // a_only=20, b_only=2 → chi2 = (18-1)^2/22 = 289/22 = 13.1363 > 3.8415
    val rows = Seq.fill(20)((true, false)) ++ Seq.fill(2)((false, true))
    val out = Eval.mcnemar(rows.toDF("a", "b"), col("a"), col("b")).collect()(0)
    assert(out.getAs[Double]("chi2") == 13.1363)
    assert(out.getAs[Boolean]("significant"))
  }

  test("cohenKappa matches the textbook 2x2 hand computation") {
    // Classic: 20 yes/yes, 5 yes/no, 10 no/yes, 15 no/no (n=50)
    // po = 35/50 = 0.7; pe = (25*30 + 25*20)/2500 = 1250/2500 = 0.5
    // kappa = 0.2/0.5 = 0.4 — but 0.7 is inexact in binary
    // (35/50 → 0.699999…96), so the IEEE quotient is 0.39999…
    // and 4-dp toward-zero truncation reports 0.3999 in BOTH engines
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val out = Eval.cohenKappa(rows.toDF("a", "b"), col("a"), col("b")).collect()(0)
    assert(out.getAs[Long]("n_items") == 50L)
    assert(out.getAs[Long]("n_agree") == 35L)
    assert(out.getAs[Double]("p_observed") == 0.7)
    assert(out.getAs[Double]("p_expected") == 0.5)
    assert(out.getAs[Double]("kappa") == 0.3999)
    assert(!out.getAs[Boolean]("degenerate"))
  }

  test("cohenKappa treats NULL as a real label class and handles worse-than-chance") {
    // A: (x, x, null, null), B: (x, y, x, null)
    // agree: row1 (x,x) + row4 (null,null) = 2; po = 0.5
    // rows: x→2, null→2; cols: x→2, y→1, null→1
    // pe_num = x:2*2 + null:2*1 = 6 → pe = 6/16 = 0.375
    // kappa = (0.5-0.375)/0.625 = 0.2
    val df = Seq((Some("x"), Some("x")), (Some("x"), Some("y")),
      (None: Option[String], Some("x")), (None: Option[String], None: Option[String]))
      .toDF("a", "b")
    val out = Eval.cohenKappa(df, col("a"), col("b")).collect()(0)
    assert(out.getAs[Long]("n_agree") == 2L)
    assert(out.getAs[Double]("p_expected") == 0.375)
    assert(out.getAs[Double]("kappa") == 0.2)

    // Perfect systematic disagreement on a 2-label space: po=0, pe=0.5,
    // kappa = -1 exactly (toward-zero truncation must keep the sign)
    val anti = Seq(("x", "y"), ("y", "x"), ("x", "y"), ("y", "x")).toDF("a", "b")
    val out2 = Eval.cohenKappa(anti, col("a"), col("b")).collect()(0)
    assert(out2.getAs[Double]("kappa") == -1.0)
  }

  test("cohenKappa degenerate constant annotators report kappa 0 with the flag") {
    val df = Seq(("k", "k"), ("k", "k")).toDF("a", "b")
    val out = Eval.cohenKappa(df, col("a"), col("b")).collect()(0)
    assert(out.getAs[Double]("kappa") == 0.0)
    assert(out.getAs[Boolean]("degenerate"))
  }

  test("classReport: hand-computed per-class, phantom class, macro/micro") {
    // a: n_true=4 tp=3 n_pred=4 → P=R=0.75; b: 3/2/3 → 2/3;
    // c: truth-only (P NULL, R 0); z: phantom pred (P 0, R NULL);
    // macro counts NULLs as 0: (0.75 + 0.6666666)/4 = 0.3541;
    // micro = accuracy = 5/8 = 0.625. NULL rows drop.
    val rows = Seq(
      ("a", "a"), ("a", "a"), ("a", "a"), ("a", "b"),
      ("b", "b"), ("b", "b"), ("b", "z"),
      ("c", "a"),
      (null, "a"), ("a", null)
    ).toDF("y", "p")
    val out = Eval.classReport(rows, col("y"), col("p"))
      .orderBy("class").collect()
      .map(r => r.getAs[String]("class") -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n_true") == 4L && a.getAs[Long]("tp") == 3L)
    assert(a.getAs[Double]("precision") == 0.75 && a.getAs[Double]("f1") == 0.75)
    val b = out("b")
    assert(b.getAs[Double]("precision") == 0.6666)
    assert(b.getAs[Double]("recall") == 0.6666)
    val c = out("c")
    assert(c.isNullAt(c.fieldIndex("precision")))
    assert(c.getAs[Double]("recall") == 0.0)
    assert(c.isNullAt(c.fieldIndex("f1")))
    val z = out("z")
    assert(z.getAs[Long]("n_true") == 0L && z.getAs[Long]("n_pred") == 1L)
    assert(z.getAs[Double]("precision") == 0.0)
    assert(z.isNullAt(z.fieldIndex("recall")))
    val mac = out("__macro__")
    assert(mac.getAs[Long]("n_true") == 8L && mac.getAs[Long]("tp") == 5L)
    assert(mac.getAs[Double]("precision") == 0.3541)
    assert(mac.getAs[Double]("recall") == 0.3541)
    val mic = out("__micro__")
    assert(mic.getAs[Double]("precision") == 0.625)
    assert(mic.getAs[Double]("recall") == 0.625)
    assert(mic.getAs[Double]("f1") == 0.625)
    assert(out.size == 6)
  }

  test("ngramOverlap: hand-computed precisions, clipping, rouge, bleu core") {
    val df = Seq(
      // prefix: p1=p2=p3=1, p4 NULL (3 tokens) → bleu NULL;
      // rouge1 = 3/6, rouge2 = 2/5, length_ratio = 0.5
      (1L, "the cat sat", "the cat sat on the mat"),
      // clipping: p1 = min(4,1)/4 = 0.25; p2..p4 = 0 → bleu exact 0;
      // rouge1 = 1/2, rouge2 = 0, ratio 2.0
      (2L, "the the the the", "the cat"),
      // identical: everything 1
      (3L, "a b c d e", "a b c d e"),
      // empty candidate: p NULL (nothing measurable), rouge 0 (measured)
      (4L, "", "x y")
    ).toDF("id", "cand", "ref")
    val out = Eval.ngramOverlap(df, col("id"), col("cand"), col("ref"))
      .orderBy("id").collect()
    val r1 = out(0)
    assert(r1.getAs[Double]("p1") == 1.0 && r1.getAs[Double]("p3") == 1.0)
    assert(r1.isNullAt(r1.fieldIndex("p4")))
    assert(r1.isNullAt(r1.fieldIndex("bleu_p")))
    assert(r1.getAs[Double]("rouge1_recall") == 0.5)
    assert(r1.getAs[Double]("rouge2_recall") == 0.4)
    assert(r1.getAs[Double]("length_ratio") == 0.5)
    val r2 = out(1)
    assert(r2.getAs[Double]("p1") == 0.25)
    assert(r2.getAs[Double]("p2") == 0.0)
    assert(r2.getAs[Double]("bleu_p") == 0.0)
    assert(r2.getAs[Double]("rouge1_recall") == 0.5)
    assert(r2.getAs[Double]("rouge2_recall") == 0.0)
    assert(r2.getAs[Double]("length_ratio") == 2.0)
    val r3 = out(2)
    assert(r3.getAs[Double]("bleu_p") == 1.0)
    assert(r3.getAs[Double]("p4") == 1.0)
    assert(r3.getAs[Double]("rouge1_recall") == 1.0)
    val r4 = out(3)
    assert(r4.getAs[Long]("len_cand") == 0L)
    assert(r4.isNullAt(r4.fieldIndex("p1")))
    assert(r4.getAs[Double]("rouge1_recall") == 0.0)
  }

  test("chrF: hand-computed order averages, whitespace stripping, NULL contract") {
    val df = Seq(
      // n=1: P=4/4, R=4/6; n=2: P=3/3, R=3/5 →
      // chrP = 1.0, chrR = (2/3 + 3/5)/2, F2 = 5PR/(4P+R)
      (1L, "abcd", "abcdef"),
      // whitespace is stripped before gramming: same as row 1
      (2L, "a b cd", "ab c def"),
      // identical → all 1.0
      (3L, "xyz", "xyz"),
      // empty candidate: chrp / chrf2 NULL, chrr measured 0
      (4L, "", "ab")
    ).toDF("id", "cand", "ref")
    val out = Eval.chrF(df, col("id"), col("cand"), col("ref"), maxN = 2)
      .orderBy("id").collect()
    val expR = (4.0 / 6.0 + 3.0 / 5.0) / 2
    val expF = math.floor(5.0 * 1.0 * expR / (4.0 * 1.0 + expR) * 1e4) / 1e4
    for (i <- 0 to 1) {
      val r = out(i)
      assert(r.getAs[Double]("chrp") == 1.0, r.toString)
      assert(r.getAs[Double]("chrr") == math.floor(expR * 1e4) / 1e4, r.toString)
      assert(r.getAs[Double]("chrf2") == expF, r.toString)
      assert(r.getAs[Long]("len_cand") == 4L && r.getAs[Long]("len_ref") == 6L)
    }
    val r3 = out(2)
    assert(r3.getAs[Double]("chrp") == 1.0 && r3.getAs[Double]("chrr") == 1.0
      && r3.getAs[Double]("chrf2") == 1.0, r3.toString)
    val r4 = out(3)
    assert(r4.isNullAt(r4.fieldIndex("chrp")), r4.toString)
    assert(r4.getAs[Double]("chrr") == 0.0, r4.toString)
    assert(r4.isNullAt(r4.fieldIndex("chrf2")), r4.toString)
  }

  test("wilsonInterval: formula replay, clamping at 0/1, NULL exclusion") {
    val df = Seq(
      ("a", Some(true)), ("a", Some(false)), ("a", Some(false)), ("a", Some(false)),
      ("z", Some(false)), ("z", Some(false)),
      ("o", Some(true)), ("o", Some(true)),
      ("n", None), ("n", Some(true))).toDF("g", "ok")
    val out = Eval.wilsonInterval(df, col("g"), col("ok"))
      .collect().map(r => r.getString(0) -> r).toMap
    def wilson(k: Long, n: Long): (Double, Double, Double) = {
      val z = 1.96; val z2 = z * z
      val nd = n.toDouble; val p = k.toDouble / nd
      val denom = 1.0 + z2 / nd
      val center = (p + z2 / (nd * 2.0)) / denom
      val half = z * math.sqrt(p * (1.0 - p) / nd + z2 / (nd * nd * 4.0)) / denom
      def f6(x: Double) = math.floor(x * 1e6) / 1e6
      (f6(p), f6(math.max(0.0, center - half)), f6(math.min(1.0, center + half)))
    }
    val (ra, la, ha) = wilson(1, 4)
    val a = out("a")
    assert(a.getLong(1) == 4L && a.getLong(2) == 1L)
    assert(a.getDouble(3) == ra && a.getDouble(4) == la && a.getDouble(5) == ha)
    // all-fail clamps lo at exactly 0; all-pass clamps hi at exactly 1
    assert(out("z").getDouble(4) == 0.0 && out("z").getDouble(3) == 0.0)
    assert(out("o").getDouble(5) == 1.0 && out("o").getDouble(3) == 1.0)
    // the NULL outcome is unmeasured: group n has n = 1, not 2
    assert(out("n").getLong(1) == 1L && out("n").getLong(2) == 1L)
  }

  test("cochranQ: textbook 3-system table, incomplete-block exclusion, degenerate all-pass") {
    // G = (3,3,1), L = (2,3,1,1) → Q = 2·(3·19−49)/(3·7−15) = 8/3
    val base = Seq(
      (1L, "a", true), (1L, "b", true), (1L, "c", false),
      (2L, "a", true), (2L, "b", true), (2L, "c", true),
      (3L, "a", true), (3L, "b", false), (3L, "c", false),
      (4L, "a", false), (4L, "b", true), (4L, "c", false))
    val df = base.toDF("i", "s", "x")
    val Array(r) = Eval.cochranQ(df, col("i"), col("s"), col("x")).collect()
    assert(r.getLong(0) == 4L && r.getLong(1) == 0L && r.getLong(2) == 3L)
    assert(r.getLong(3) == 2L)
    assert(r.getDouble(4) == math.floor(2.0 * 8.0 / 6.0 * 1e4) / 1e4, r.toString)
    assert(!r.getBoolean(5))
    // an item graded by only one system is excluded, Q unchanged
    val withPartial = (base :+ ((5L, "a", true))).toDF("i", "s", "x")
    val Array(p) = Eval.cochranQ(withPartial, col("i"), col("s"), col("x")).collect()
    assert(p.getLong(0) == 4L && p.getLong(1) == 1L)
    assert(p.getDouble(4) == r.getDouble(4))
    // every system passes every item: zero denominator, flagged
    val all = (1L to 3L).flatMap(i => Seq("a", "b").map(s => (i, s, true)))
      .toDF("i", "s", "x")
    val Array(d) = Eval.cochranQ(all, col("i"), col("s"), col("x")).collect()
    assert(d.getBoolean(5) && d.getDouble(4) == 0.0, d.toString)
    // NULL item/system rows are unattributable and excluded (the
    // friedman filter): the statistic is byte-identical with them
    val noisy = (base.map { case (i, s, x) => (Some(i), Some(s), x) } ++
      Seq((None, Some("a"), true), (Some(7L), None, false)))
      .toDF("i", "s", "x")
    val Array(nz) = Eval.cochranQ(noisy, col("i"), col("s"), col("x")).collect()
    assert(nz.toSeq == r.toSeq, s"$nz vs $r")
  }

  test("friedman: perfect-consistency chi2 = n(k-1), mid-rank ties, exclusion, all-tied degenerate") {
    def frame(rows: Seq[(Long, String, Double)]) = rows.toDF("i", "s", "v")
    // a < b < c on every item: chi2 = 12/(4·3·4)·224 − 48 = 8 = n(k−1)
    val strict = (1L to 4L).flatMap(i =>
      Seq((i, "a", 1.0), (i, "b", 2.0), (i, "c", 3.0)))
    val Array(r) = Eval.friedman(frame(strict), col("i"), col("s"), col("v"))
      .collect()
    assert(r.getLong(0) == 4L && r.getLong(2) == 3L && r.getLong(3) == 2L)
    assert(r.getDouble(4) == 8.0 && r.getDouble(5) == 8.0, r.toString)
    assert(!r.getBoolean(6))
    // item 4 fully tied: mid-ranks 2 each → chi2 = 4.5, C = 0.75, adj = 6
    val tied = (1L to 3L).flatMap(i =>
      Seq((i, "a", 1.0), (i, "b", 2.0), (i, "c", 3.0))) ++
      Seq((4L, "a", 5.0), (4L, "b", 5.0), (4L, "c", 5.0))
    val Array(t) = Eval.friedman(frame(tied), col("i"), col("s"), col("v"))
      .collect()
    assert(t.getDouble(4) == 4.5 && t.getDouble(5) == 6.0, t.toString)
    // an item scored by one system only is excluded, stats unchanged
    val Array(x) = Eval.friedman(frame(strict :+ ((9L, "a", 7.0))),
      col("i"), col("s"), col("v")).collect()
    assert(x.getLong(0) == 4L && x.getLong(1) == 1L
      && x.getDouble(4) == 8.0, x.toString)
    // every item fully tied: the correction denominator vanishes
    val flat = (1L to 3L).flatMap(i =>
      Seq((i, "a", 1.0), (i, "b", 1.0), (i, "c", 1.0)))
    val Array(d) = Eval.friedman(frame(flat), col("i"), col("s"), col("v"))
      .collect()
    assert(d.getBoolean(6) && d.getDouble(5) == 0.0, d.toString)
  }

  test("fleissKappa hand computation with varying n and a singleton exclusion") {
    // A: [x,x,x] P=1; B: [x,y] P=0; C: [y,y,y,x] P=(10-4)/12=0.5;
    // D: [x] excluded (n<2). P̄ = 1.5/3 = 0.5.
    // Marginals over retained: x=5, y=4, N=9 → P̄_e = 41/81.
    // κ = (0.5 − 41/81)/(1 − 41/81) = (−1/162)·(81/40) = −0.0125 exact.
    val df = Seq(
      ("A", "x"), ("A", "x"), ("A", "x"),
      ("B", "x"), ("B", "y"),
      ("C", "y"), ("C", "y"), ("C", "y"), ("C", "x"),
      ("D", "x")
    ).toDF("item", "cat")
    val out = Eval.fleissKappa(df, col("item"), col("cat")).collect()(0)
    assert(out.getAs[Long]("n_items") == 3L)
    assert(out.getAs[Long]("n_ratings") == 9L)
    assert(out.getAs[Long]("n_categories") == 2L)
    assert(out.getAs[Double]("p_bar") == 0.5)
    assert(out.getAs[Double]("p_expected") == 0.5061) // floor(41/81 ·1e4)
    assert(out.getAs[Double]("kappa") == -0.0125)
    assert(!out.getAs[Boolean]("degenerate"))
  }

  test("krippendorffAlpha: hand-exact nominal alpha with missingness") {
    // A [x,x] diag 2, B [y,y] diag 2, C [x,y] diag 0, D [x] excluded.
    // n = 6, A = 4 → D_o = 2; margins x=3, y=3 → D_e = (36−18)/5 = 3.6;
    // α = 1 − 2/3.6 = 0.4444 (toward zero at 4 dp).
    val df = Seq(
      ("A", "x"), ("A", "x"), ("B", "y"), ("B", "y"),
      ("C", "x"), ("C", "y"), ("D", "x")
    ).toDF("item", "cat")
    val out = Eval.krippendorffAlpha(df, col("item"), col("cat")).collect()(0)
    assert(out.getAs[Long]("n_items") == 3L)
    assert(out.getAs[Long]("n_pairable") == 6L)
    assert(out.getAs[Double]("d_o") == 2.0)
    assert(out.getAs[Double]("d_e") == 3.6)
    assert(out.getAs[Double]("alpha") == 0.4444)
    assert(!out.getAs[Boolean]("degenerate"))

    // chance-level: A [x,x], B [x,y], C [y,y,x] → D_o = 4, D_e = 4, α = 0
    val chance = Seq(("A", "x"), ("A", "x"), ("B", "x"), ("B", "y"),
      ("C", "y"), ("C", "y"), ("C", "x")).toDF("item", "cat")
    val c = Eval.krippendorffAlpha(chance, col("item"), col("cat")).collect()(0)
    assert(c.getAs[Double]("alpha") == 0.0 && !c.getAs[Boolean]("degenerate"))

    // single category everywhere: D_e = 0 → degenerate
    val mono = Seq(("A", "x"), ("A", "x"), ("B", "x"), ("B", "x"))
      .toDF("item", "cat")
    val m = Eval.krippendorffAlpha(mono, col("item"), col("cat")).collect()(0)
    assert(m.getAs[Boolean]("degenerate") && m.getAs[Double]("alpha") == 0.0)
  }

  test("fleissKappa perfect agreement, degenerate single category, empty input") {
    // unanimous items over 2 categories: P̄=1, P̄_e=0.5, κ=1
    val perfect = Seq(("A", "x"), ("A", "x"), ("B", "y"), ("B", "y"))
      .toDF("item", "cat")
    val p = Eval.fleissKappa(perfect, col("item"), col("cat")).collect()(0)
    assert(p.getAs[Double]("kappa") == 1.0)
    assert(!p.getAs[Boolean]("degenerate"))

    // one category everywhere: P̄_e = 1 → κ reports 0 + flag
    val mono = Seq(("A", "x"), ("A", "x"), ("B", "x"), ("B", "x"))
      .toDF("item", "cat")
    val m = Eval.fleissKappa(mono, col("item"), col("cat")).collect()(0)
    assert(m.getAs[Double]("p_bar") == 1.0)
    assert(m.getAs[Double]("kappa") == 0.0)
    assert(m.getAs[Boolean]("degenerate"))

    // NULL categories drop; all-singleton input leaves zero items
    val empty = Seq(("A", Option.empty[String]), ("B", Some("x")))
      .toDF("item", "cat")
    val e = Eval.fleissKappa(empty, col("item"), col("cat")).collect()(0)
    assert(e.getAs[Long]("n_items") == 0L)
    assert(e.getAs[Double]("kappa") == 0.0)
    assert(e.getAs[Boolean]("degenerate"))
  }

  test("retrievalMetrics: hand-computed hits/MRR/nDCG, no-hit, empty gold, perfect list") {
    import spark.implicits._
    val res = Seq(
      (1L, "a", 1), (1L, "b", 2), (1L, "c", 3), // b relevant at rank 2
      (2L, "a", 1), (2L, "b", 2), (2L, "c", 3), // nothing relevant
      (3L, "a", 1), (3L, "b", 2), (3L, "c", 3), // empty gold set
      (4L, "p", 1), (4L, "q", 2), (4L, "r", 3)) // top-2 = the whole gold set
      .toDF("qid", "did", "rank")
    val gold = Seq(
      (1L, "b"), (1L, "x"), (1L, "y"),
      (2L, "z"),
      (4L, "p"), (4L, "q"),
      (5L, "m"), (5L, "n")) // query 5 has gold but NO results at all
      .toDF("gq", "gd")
    val r = Eval.retrievalMetrics(res, col("qid"), col("did"), col("rank"),
        gold, col("gq"), col("gd"), k = 3)
      .orderBy("query_id")
      .as[(Long, Long, Long, Double, Double, Double, Double)].collect()
    val d2 = Eval.ndcgDiscount(2)
    val ndcg1 = BigDecimal(d2 / Eval.idcgAt(3))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(0) == ((1L, 3L, 1L, 0.3333, 0.3333, 0.5, ndcg1)), s"${r(0)}")
    assert(r(1) == ((2L, 1L, 0L, 0.0, 0.0, 0.0, 0.0)))
    assert(r(2) == ((3L, 0L, 0L, 0.0, 0.0, 0.0, 0.0)))
    // perfect top-2 against a 2-item gold: recall 1, mrr 1, ndcg 1
    assert(r(3) == ((4L, 2L, 2L, 0.6667, 1.0, 1.0, 1.0)), s"${r(3)}")
    // a query the retrieval tier returned NOTHING for must still
    // surface as an all-zero row (silently absent would inflate
    // macro averages — review)
    assert(r.length == 5)
    assert(r(4) == ((5L, 2L, 0L, 0.0, 0.0, 0.0, 0.0)), s"${r(4)}")
  }

  test("bootstrapCI: determinism, point mean, bound ordering, constant collapse, tiny group") {
    import spark.implicits._
    val df = (0 until 300).map { i =>
      (if (i % 2 == 0) "a" else "b", i.toLong, (i % 13).toDouble) }
      .toDF("g", "id", "v")
    def run() = Eval.bootstrapCI(df, col("g"), col("id"), col("v"), b = 100)
      .orderBy("group_key").collect().map(_.toSeq)
    val r = run()
    assert(r.sameElements(run()), "bootstrap must be RNG-free")
    val a = run().head
    // point mean is the plain group mean (150 evens mod 13), 6-dp
    val vs = (0 until 300).filter(_ % 2 == 0).map(_ % 13)
    val exp = BigDecimal(vs.sum.toDouble / vs.size)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(a(2) == exp, s"${a(2)} vs $exp")
    // bounds bracket sanely and resamples are full
    assert(a.asInstanceOf[Seq[Any]](3).asInstanceOf[Double] <=
      a(4).asInstanceOf[Double])
    assert(a(5) == 100L)
    // constant values: every resample mean collapses to the constant
    val const = (0 until 50).map(i => ("c", i.toLong, 7.25)).toDF("g", "id", "v")
    val rc = Eval.bootstrapCI(const, col("g"), col("id"), col("v"), b = 50)
      .collect()(0)
    assert(rc.getAs[Double]("ci_lo") == 7.25 && rc.getAs[Double]("ci_hi") == 7.25)
    // single-row group: ~37% of resamples draw weight 0 and are
    // excluded; the survivors' mean is the lone value
    val one = Seq(("z", 1L, 3.5)).toDF("g", "id", "v")
    val ro = Eval.bootstrapCI(one, col("g"), col("id"), col("v"), b = 200)
      .collect()(0)
    assert(ro.getAs[Long]("n_resamples") > 0 &&
      ro.getAs[Long]("n_resamples") < 200)
    assert(ro.getAs[Double]("ci_lo") == 3.5 && ro.getAs[Double]("ci_hi") == 3.5)
  }

  test("D142 rbo: identical rankings = 1, disjoint prefixes = 0, hand overlap in between") {
    // 5 items, scoreA == scoreB -> X_d = d at every depth, RBO = 1
    // (truncated at k = 5 it's the depth-5 partial sum / its own max)
    val same = (1 to 30).map(i => ("g", i.toLong, (100 - i).toDouble,
      (100 - i).toDouble)).toDF("g", "id", "sa", "sb")
    val r1 = Eval.rbo(same, col("g"), col("id"), col("sa"), col("sb"), k = 20)
      .select("overlap_at_k", "rbo").as[(Double, Double)].head()
    assert(r1._1 == 1.0)
    // truncated-at-k identical-ranking RBO = (1-p) sum_{d<=k} p^(d-1)
    // = 1 - p^k
    assert(math.abs(r1._2 - (1.0 - math.pow(0.9, 20))) < 1e-4, r1.toString)
    // disjoint top-20s: scoreA ranks ids 1..20 first, scoreB ranks
    // ids 21..40 first -> no overlap anywhere
    val dis = (1 to 40).map { i =>
      val sa = if (i <= 20) 1000.0 - i else 100.0 - i
      val sb = if (i > 20) 1000.0 - i else 100.0 - i
      ("g", i.toLong, sa, sb)
    }.toDF("g", "id", "sa", "sb")
    val r0 = Eval.rbo(dis, col("g"), col("id"), col("sa"), col("sb"), k = 20)
      .select("overlap_at_k", "rbo").as[(Double, Double)].head()
    assert(r0 == ((0.0, 0.0)), r0.toString)
  }
}
