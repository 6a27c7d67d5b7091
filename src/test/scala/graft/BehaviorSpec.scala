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

  test("funnelWindowed: a step outside the gap doesn't count; huge gap equals the plain funnel") {
    import graft.operators.Behavior
    // u1 converts within the gap; u2's step-2 lands 100ns after
    // step 1 with a gap cap of 10 — dropped from step 2 onward
    val ev = Seq(
      (1L, 0L, "a"), (1L, 5L, "b"),
      (2L, 0L, "a"), (2L, 100L, "b")).toDF("u", "t", "et")
    val out = Behavior.funnelWindowed(ev, col("u"), col("t"), col("et"),
        Seq("a", "b"), maxGapNs = 10L)
      .orderBy("step").collect()
    assert(out(0).getLong(2) == 2L && out(1).getLong(2) == 1L, out.toSeq.toString)
    // a cap wider than every gap reproduces the uncapped funnel
    val wide = Behavior.funnelWindowed(ev, col("u"), col("t"), col("et"),
        Seq("a", "b"), maxGapNs = 1000000L)
      .orderBy("step").collect().map(_.toSeq).toSeq
    val plain = Behavior.funnel(ev, col("u"), col("t"), col("et"),
        Seq("a", "b")).orderBy("step").collect().map(_.toSeq).toSeq
    assert(wide == plain)
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

  test("anovaOneWay: hand-computed F and eta²; degenerate designs; NULLs excluded") {
    import graft.operators.Stats
    // a={1,2,3} b={5,6,7} c={11,12,13}: SSW=6, SSB=152, F=(152/2)/(6/6)=76
    val d = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 5.0), ("b", 6.0), ("b", 7.0),
      ("c", 11.0), ("c", 12.0), ("c", 13.0)).toDF("g", "v")
    val Array(r) = Stats.anovaOneWay(d, col("g"), col("v")).collect()
    assert(r.getLong(0) == 9L && r.getLong(1) == 3L, r.toString)
    assert(r.getDouble(2) == 152.0 && r.getDouble(3) == 6.0, r.toString)
    assert(r.getDouble(4) == 76.0, r.toString)
    assert(r.getDouble(5) == math.floor(152.0 / 158.0 * 1e4) / 1e4, r.toString)
    assert(!r.getBoolean(6), r.toString)
    // NULL group / NULL value rows are unmeasured, not zero
    val dn = d.union(Seq((null: String, 99.0)).toDF("g", "v"))
      .union(Seq(("b", null: java.lang.Double)).toDF("g", "v"))
    val Array(rn) = Stats.anovaOneWay(dn, col("g"), col("v")).collect()
    assert(rn.getDouble(4) == 76.0 && rn.getLong(0) == 9L, rn.toString)
    // single group and zero within-variance both degenerate to f=0
    val single = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    val Array(s) = Stats.anovaOneWay(single, col("g"), col("v")).collect()
    assert(s.getDouble(4) == 0.0 && s.getBoolean(6), s.toString)
    val flat = Seq(("a", 5.0), ("a", 5.0), ("b", 9.0), ("b", 9.0)).toDF("g", "v")
    val Array(fl) = Stats.anovaOneWay(flat, col("g"), col("v")).collect()
    assert(fl.getBoolean(6) && fl.getDouble(4) == 0.0 && fl.getDouble(2) == 16.0,
      fl.toString)
    // empty input: clean zero row, no NULL cascade
    val Array(e) = Stats.anovaOneWay(Seq.empty[(String, Double)].toDF("g", "v"),
      col("g"), col("v")).collect()
    assert(e.getLong(0) == 0L && e.getDouble(4) == 0.0 && e.getBoolean(6), e.toString)
  }

  test("welchAnova: hand-computed F* and dof2; zero-variance/small-group degenerate; NULLs excluded; empty") {
    import graft.operators.Stats
    // a={1,3}: mean 2, s²=2, w=1; b={10,14}: mean 12, s²=8, w=0.25
    // W=1.25, m=4, A=1·4+0.25·64=20, B=0.2²+0.8²=0.68
    // k=2 → F*=A/(k−1)=20; dof2=3/(3·0.68)=1.47058…→1.4705
    val d = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 14.0)).toDF("g", "v")
    val Array(r) = Stats.welchAnova(d, col("g"), col("v")).collect()
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L, r.toString)
    assert(r.getAs[Double]("f_welch") == 20.0, r.toString)
    assert(r.getAs[Long]("dof1") == 1L, r.toString)
    assert(r.getAs[Double]("dof2") == 1.4705, r.toString)
    assert(!r.getAs[Boolean]("degenerate"))
    // NULL group / NULL value rows are unmeasured, not zero
    val dn = d.union(Seq((null: String, 99.0)).toDF("g", "v"))
      .union(Seq(("b", null: java.lang.Double)).toDF("g", "v"))
    val Array(rn) = Stats.welchAnova(dn, col("g"), col("v")).collect()
    assert(rn.getAs[Double]("f_welch") == 20.0 && rn.getLong(0) == 4L, rn.toString)
    // a zero-variance group is an infinite weight: degenerate, f 0
    val flat = Seq(("a", 5.0), ("a", 5.0), ("b", 1.0), ("b", 2.0)).toDF("g", "v")
    val Array(fl) = Stats.welchAnova(flat, col("g"), col("v")).collect()
    assert(fl.getAs[Boolean]("degenerate") && fl.getAs[Double]("f_welch") == 0.0,
      fl.toString)
    // ...including NON-DYADIC constants, where the truncated s² lane
    // leaves a ~5e-8 residue that would otherwise fake a finite
    // precision weight (the r11 review find): min==max must decide
    val flat01 = Seq(("a", 0.1), ("a", 0.1), ("a", 0.1),
      ("b", 1.0), ("b", 2.0)).toDF("g", "v")
    val Array(f01) = Stats.welchAnova(flat01, col("g"), col("v")).collect()
    assert(f01.getAs[Boolean]("degenerate") && f01.getAs[Double]("f_welch") == 0.0,
      f01.toString)
    // a singleton group has no variance estimate: degenerate
    val single = Seq(("a", 1.0), ("a", 3.0), ("b", 7.0)).toDF("g", "v")
    val Array(sg) = Stats.welchAnova(single, col("g"), col("v")).collect()
    assert(sg.getAs[Boolean]("degenerate"), sg.toString)
    // empty input: one clean degenerate row, no NULL cascade
    val Array(e) = Stats.welchAnova(Seq.empty[(String, Double)].toDF("g", "v"),
      col("g"), col("v")).collect()
    assert(e.getLong(0) == 0L && e.getAs[Double]("f_welch") == 0.0
      && e.getAs[Boolean]("degenerate"), e.toString)
  }

  test("mannKendall: hand-computed S/Var(S)/z/Sen with ties; constant series degenerate; key isolation") {
    import graft.operators.Stats
    // v = [1,2,3,2,5]: S = 7; one tied value pair (t=2) → Var(S) =
    // (5·4·15 − 2·1·9)/18 = 282/18; z = 6/sqrt(282/18);
    // pairwise slopes sorted have their ceil(10/2)=5th value = 1.0
    val d = Seq(("k", 0L, 1.0), ("k", 1L, 2.0), ("k", 2L, 3.0),
      ("k", 3L, 2.0), ("k", 4L, 5.0),
      ("flat", 0L, 4.0), ("flat", 1L, 4.0), ("flat", 2L, 4.0))
      .toDF("g", "x", "v")
    val rows = Stats.mannKendall(d, col("g"), col("x"), col("v"))
      .orderBy("key").collect().map(r => r.getString(0) -> r).toMap
    val k = rows("k")
    assert(k.getAs[Long]("n") == 5L && k.getAs[Long]("s") == 7L, k.toString)
    val zExp = 6.0 / math.sqrt(282.0 / 18.0)
    assert(k.getAs[Double]("z") == math.floor(zExp * 1e4) / 1e4, k.toString)
    assert(k.getAs[Double]("sen_slope") == 1.0, k.toString)
    assert(!k.getAs[Boolean]("degenerate"))
    // a constant series: S = 0, Var(S) = 0 → degenerate, null slope
    val f = rows("flat")
    assert(f.getAs[Long]("s") == 0L && f.getAs[Boolean]("degenerate")
      && f.getAs[Double]("z") == 0.0 && f.isNullAt(f.fieldIndex("sen_slope")),
      f.toString)
    // a strictly falling series lands the mirrored z
    val fall = Seq.tabulate(5)(i => ("d", i.toLong, 5.0 - i)).toDF("g", "x", "v")
    val Array(fr) = Stats.mannKendall(fall, col("g"), col("x"), col("v")).collect()
    assert(fr.getAs[Long]("s") == -10L, fr.toString)
    assert(fr.getAs[Double]("sen_slope") == -1.0, fr.toString)
    assert(fr.getAs[Double]("z") < 0, fr.toString)
  }

  test("mannKendall: long series run in O(n log n) with computeSen=false; Sen guard throws loudly") {
    import graft.operators.Stats
    // 50k points/key — the r11 pair join would have built 1.25e9 pairs
    // per key; the merge-count kernel finishes in seconds. A strictly
    // rising series has S = n(n−1)/2 exactly; a sawtooth checks a
    // non-trivial inversion count at length ([s]=2·asc−desc pairs
    // hand-derivable: v = i % 2 gives S = #(0→1 pairs) − #(1→0 pairs)
    // = n²/4 − (n/2)(n/2 − 1)/2·2 ... asserted against a direct
    // O(n²)-free closed form below).
    val n = 50000
    val rise = Seq.tabulate(n)(i => ("up", i.toLong, i.toDouble))
    val d = rise.toDF("g", "x", "v")
    val Array(r) = Stats.mannKendall(d, col("g"), col("x"), col("v"),
      computeSen = false).collect()
    assert(r.getAs[Long]("n") == n.toLong)
    assert(r.getAs[Long]("s") == n.toLong * (n - 1) / 2, r.toString)
    assert(r.getAs[Double]("z") > 0)
    assert(r.isNullAt(r.fieldIndex("sen_slope")), "computeSen=false => sen NULL")
    // alternating 0/1 series: for i<j, sign(v_j − v_i) ≠ 0 only when
    // parities differ; each (even i, odd j) pair is +1, (odd i, even j)
    // is −1. With n even: #(even,odd i<j) = Σ_{k}(n/2 − k) over even
    // positions ... by symmetry S = n/2 (only adjacent-parity ordering
    // asymmetry survives). Derive independently: pairs with i even,
    // j odd, i<j: count = Σ_{e=0,2,..}(#odds > e) = Σ_{k=0}^{m−1}(m−k)
    // = m(m+1)/2; i odd, j even: m(m−1)/2 (m = n/2). S = m.
    val m = 1000
    val saw = Seq.tabulate(2 * m)(i => ("saw", i.toLong, (i % 2).toDouble))
    val Array(sr) = Stats.mannKendall(saw.toDF("g", "x", "v"), col("g"),
      col("x"), col("v"), computeSen = false).collect()
    assert(sr.getAs[Long]("s") == m.toLong, sr.toString)
    // Sen's slope stays quadratic, so a series past senMaxN must FAIL
    // LOUDLY, naming the fix — never silently build the pair frame
    val big = Seq.tabulate(101)(i => ("k", i.toLong, i.toDouble)).toDF("g", "x", "v")
    val ex = intercept[Exception] {
      Stats.mannKendall(big, col("g"), col("x"), col("v"), senMaxN = 100L).collect()
    }
    def rootMsg(t: Throwable): String =
      if (t.getCause == null) t.getMessage else t.getMessage + " | " + rootMsg(t.getCause)
    assert(rootMsg(ex).contains("senMaxN"), rootMsg(ex).take(400))
    // raising the guard deliberately works
    val ok = Stats.mannKendall(big, col("g"), col("x"), col("v"), senMaxN = 200L)
      .collect()
    assert(ok.head.getAs[Double]("sen_slope") == 1.0)
  }

  test("kendallTau: hand-computed tau-b with ties both sides; degenerate constant side; key isolation") {
    import graft.operators.Stats
    // no ties: x=[1,2,3,4], y=[1,3,2,4] → C=5, D=1, S=4, tau=4/6
    // ties both sides: x=[1,1,2,3], y=[2,5,2,7] → S=2, nx=ny=5, tau=0.4
    // constant y → degenerate
    val d = Seq(
      ("a", 1.0, 1.0), ("a", 2.0, 3.0), ("a", 3.0, 2.0), ("a", 4.0, 4.0),
      ("b", 1.0, 2.0), ("b", 1.0, 5.0), ("b", 2.0, 2.0), ("b", 3.0, 7.0),
      ("c", 1.0, 9.0), ("c", 2.0, 9.0), ("c", 3.0, 9.0))
      .toDF("g", "x", "y")
    val rows = Stats.kendallTau(d, col("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = rows("a")
    assert(a.getAs[Long]("n") == 4L && a.getAs[Long]("s") == 4L, a.toString)
    assert(a.getAs[Double]("tau_b") == math.floor(4.0 / 6.0 * 1e4) / 1e4, a.toString)
    assert(!a.getAs[Boolean]("degenerate"))
    val b = rows("b")
    assert(b.getAs[Long]("s") == 2L && b.getAs[Double]("tau_b") == 0.4, b.toString)
    val c = rows("c")
    assert(c.getAs[Long]("s") == 0L && c.getAs[Double]("tau_b") == 0.0
      && c.getAs[Boolean]("degenerate"), c.toString)
    // anti-correlated series lands tau = −1 exactly
    val neg = Seq.tabulate(6)(i => ("z", i.toDouble, -i.toDouble)).toDF("g", "x", "y")
    val Array(zr) = Stats.kendallTau(neg, col("g"), col("x"), col("y")).collect()
    assert(zr.getAs[Double]("tau_b") == -1.0, zr.toString)
  }

  test("runsTest: clumped vs alternating hand-z; one-sided key degenerate") {
    import graft.operators.Stats
    // n=6, n1=n0=3: mu = 4, sigma^2 = 18*12/(36*5) = 1.2
    // TTTFFF: runs 2 -> z = -2/sqrt(1.2); TFTFTF: runs 6 -> +2/sqrt(1.2)
    val d = (Seq.tabulate(6)(i => ("clump", i.toLong, i < 3))
      ++ Seq.tabulate(6)(i => ("alt", i.toLong, i % 2 == 0))
      ++ Seq.tabulate(4)(i => ("allt", i.toLong, true))).toDF("g", "x", "f")
    val rows = Stats.runsTest(d, col("g"), col("x"), col("f"))
      .collect().map(r => r.getString(0) -> r).toMap
    val zExp = math.floor(2.0 / math.sqrt(1.2) * 1e4) / 1e4
    val cl = rows("clump")
    assert(cl.getAs[Long]("runs") == 2L && cl.getAs[Double]("z") == -zExp, cl.toString)
    val al = rows("alt")
    assert(al.getAs[Long]("runs") == 6L && al.getAs[Double]("z") == zExp, al.toString)
    assert(!cl.getAs[Boolean]("degenerate") && !al.getAs[Boolean]("degenerate"))
    // a one-sided key has a single possible arrangement — degenerate
    val at = rows("allt")
    assert(at.getAs[Long]("runs") == 1L && at.getAs[Double]("z") == 0.0
      && at.getAs[Boolean]("degenerate"), at.toString)
    // r12 edge-audit class: a singleton key must flag, never throw
    val Array(solo) = Stats.runsTest(Seq(("s", 1L, true)).toDF("g", "x", "f"),
      col("g"), col("x"), col("f")).collect()
    assert(solo.getAs[Boolean]("degenerate"))
  }

  test("kendallW: perfect/reversed/tied panels hand-computed; unbalanced panel degenerate") {
    import graft.operators.{Eval => Ev}
    // m=2 raters agree perfectly on 3 items -> W = 1
    val agree = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
      (1L, "b", 1.0), (2L, "b", 2.0), (3L, "b", 3.0)).toDF("i", "r", "s")
    val Array(w1) = Ev.kendallW(agree, col("i"), col("r"), col("s")).collect()
    assert(w1.getAs[Long]("n_items") == 3L && w1.getAs[Long]("n_raters") == 2L)
    assert(w1.getAs[Double]("w") == 1.0 && !w1.getAs[Boolean]("degenerate"), w1.toString)
    // exactly reversed rankings: every R_i equal -> W = 0
    val rev = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (1L, "b", 3.0), (2L, "b", 2.0), (3L, "b", 1.0)).toDF("i", "r", "s")
    val Array(w0) = Ev.kendallW(rev, col("i"), col("r"), col("s")).collect()
    assert(w0.getAs[Double]("w") == 0.0 && !w0.getAs[Boolean]("degenerate"), w0.toString)
    // ties: rater b scores (1,1,2) -> midranks (1.5,1.5,3), T_b = 6;
    // R = (2.5, 3.5, 6), W = 78/84 = 0.9285 (4-dp floor)
    val tied = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (1L, "b", 1.0), (2L, "b", 1.0), (3L, "b", 2.0)).toDF("i", "r", "s")
    val Array(wt) = Ev.kendallW(tied, col("i"), col("r"), col("s")).collect()
    assert(wt.getAs[Double]("w") == math.floor(78.0 / 84.0 * 1e4) / 1e4, wt.toString)
    // a missing rating breaks the balanced-panel contract -> degenerate
    val unbal = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (1L, "b", 3.0), (2L, "b", 2.0)).toDF("i", "r", "s")
    val Array(wu) = Ev.kendallW(unbal, col("i"), col("r"), col("s")).collect()
    assert(wu.getAs[Boolean]("degenerate") && wu.getAs[Double]("w") == 0.0, wu.toString)
  }

  test("jonckheereTerpstra: hand-computed S and tie-corrected Var(S); one-group degenerate") {
    import graft.operators.Stats
    // groups 1:[1,2], 2:[2,3]: cross pairs (1,2)+ (1,3)+ (2,2)0 (2,3)+
    // -> S = 3. N=4, tx: 2 groups of 2 -> Σt(t−1)(2t+5) = 36, ty:
    // value 2 twice -> 18. term1 = (156−36−18)/18 = 5.6667; term2 = 0
    // (t−2 = 0 everywhere); term3 = 4·2/(2·4·3) = 1/3. Var = 6.
    // z = 3/√6 = 1.2247.
    val d = Seq(("k", 1L, 1.0), ("k", 1L, 2.0), ("k", 2L, 2.0), ("k", 2L, 3.0))
      .toDF("g", "grp", "v")
    val Array(r) = Stats.jonckheereTerpstra(d, col("g"), col("grp"), col("v"))
      .collect()
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("s") == 3L, r.toString)
    assert(r.getAs[Double]("z") == math.floor(3.0 / math.sqrt(6.0) * 1e4) / 1e4,
      r.toString)
    assert(!r.getAs[Boolean]("degenerate") && !r.getAs[Boolean]("significant"))
    // a single group has no cross pairs and zero x-variance — degenerate
    val one = Seq(("k", 1L, 1.0), ("k", 1L, 2.0), ("k", 1L, 3.0)).toDF("g", "grp", "v")
    val Array(o) = Stats.jonckheereTerpstra(one, col("g"), col("grp"), col("v"))
      .collect()
    assert(o.getAs[Double]("z") == 0.0 && o.getAs[Boolean]("degenerate"), o.toString)
    // r12 edge audit: a SINGLETON key zeroes term3's 2n(n−1) inside
    // the variance — must degenerate-flag, never ANSI-throw
    val solo = Seq(("s", 1L, 5.0)).toDF("g", "grp", "v")
    val Array(so) = Stats.jonckheereTerpstra(solo, col("g"), col("grp"), col("v"))
      .collect()
    assert(so.getAs[Boolean]("degenerate") && so.getAs[Double]("z") == 0.0, so.toString)
    // a perfect staircase across 4 groups is decisively significant
    val stair = (1 to 4).flatMap(g => (1 to 10).map(i =>
      ("k", g.toLong, g * 100.0 + i))).toDF("g", "grp", "v")
    val Array(st) = Stats.jonckheereTerpstra(stair, col("g"), col("grp"), col("v"))
      .collect()
    assert(st.getAs[Long]("s") == 600L, st.toString) // 6 group pairs × 100
    assert(st.getAs[Boolean]("significant"), st.toString)
  }

  test("cochranArmitage: hand-computed perfect-trend z; all-success degenerate") {
    import graft.operators.Stats
    // w=1: 1/10, w=2: 5/10, w=3: 9/10 -> T=38, W1=60, W2=140, p̄=.5
    // num = 38−30 = 8, var = .25·(140−120) = 5, z = 8/√5 = 3.5777
    val d = (Seq.tabulate(10)(i => (1L, i < 1)) ++
      Seq.tabulate(10)(i => (2L, i < 5)) ++
      Seq.tabulate(10)(i => (3L, i < 9))).toDF("w", "ok")
    val Array(r) = Stats.cochranArmitage(d, col("w"), col("ok")).collect()
    assert(r.getAs[Long]("n") == 30L && r.getAs[Long]("successes") == 15L)
    assert(r.getAs[Double]("z") == math.floor(8.0 / math.sqrt(5.0) * 1e4) / 1e4,
      r.toString)
    assert(r.getAs[Boolean]("significant") && !r.getAs[Boolean]("degenerate"))
    // all-success has no binomial variance — degenerate zero
    val all = Seq((1L, true), (2L, true), (3L, true)).toDF("w", "ok")
    val Array(a) = Stats.cochranArmitage(all, col("w"), col("ok")).collect()
    assert(a.getAs[Double]("z") == 0.0 && a.getAs[Boolean]("degenerate"))
    // r12 edge audit: an EMPTY input's p̄ = 0/0 lives inside the guard
    // — must degenerate-flag, never ANSI-throw
    val none = Seq.empty[(Long, Boolean)].toDF("w", "ok")
    val Array(e) = Stats.cochranArmitage(none, col("w"), col("ok")).collect()
    assert(e.getAs[Long]("n") == 0L && e.getAs[Boolean]("degenerate"), e.toString)
  }

  test("partialCorrelation: y = x + z with orthogonal x,z partials to ~1; constant-z degenerate") {
    import graft.operators.Stats
    // x,z ∈ {0,1}²; y = x+z: r_xy = r_yz = 1/√2, r_xz = 0 →
    // partial r_xy·z = (1/√2)/√(1−1/2) = 1 exactly (y | z is x)
    val d = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0))
      .map { case (x, z) => (x, x + z, z) }.toDF("x", "y", "z")
    val Array(r) = Stats.partialCorrelation(d, col("x"), col("y"), col("z"))
      .collect()
    assert(r.getAs[Double]("r_xz") == 0.0, r.toString)
    assert(r.getAs[Double]("partial_r") >= 0.9999, r.toString)
    assert(!r.getAs[Boolean]("degenerate"))
    // constant z: no variance to partial out — degenerate
    val cz = Seq((1.0, 2.0, 5.0), (2.0, 4.0, 5.0), (3.0, 7.0, 5.0)).toDF("x", "y", "z")
    val Array(c) = Stats.partialCorrelation(cz, col("x"), col("y"), col("z"))
      .collect()
    assert(c.getAs[Boolean]("degenerate") && c.getAs[Double]("partial_r") == 0.0)
  }

  test("selfSimilarity: identical-adjacent pair scores 1, disjoint scores 0; exact lane mean") {
    import graft.operators.{Eval => Ev}
    val d = Seq((1L, "g", "a b c"), (2L, "g", "a b c"), (3L, "g", "x y z"))
      .toDF("id", "src", "text")
    val Array(r) = Ev.selfSimilarity(d, col("src"), col("id"), col("text"))
      .collect()
    assert(r.getAs[Long]("n_pairs") == 2L, r.toString)
    assert(r.getAs[Double]("mean_rouge_lf") == 0.5, r.toString)
    assert(r.getAs[Double]("max_rouge_lf") == 1.0, r.toString)
  }

  test("effectSize: hand-computed Cohen/Hedges/Glass; degenerate singleton group") {
    import graft.operators.Stats
    // a={1,3}: mean 2, s²=2; b={10,14}: mean 12, s²=8.
    // s_pooled = sqrt((2+8)/2) = sqrt(5); d = -10/sqrt(5) = -4.4721…
    // J = 1 - 3/(4·4-9) = 4/7; g = d·J = -2.5555…; Δ = -10/sqrt(8)
    val d = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 14.0)).toDF("g", "v")
    val Array(r) = Stats.effectSize(d, col("g"), col("v"), "a", "b").collect()
    def t4(x: Double) = math.signum(x) * math.floor(math.abs(x) * 1e4) / 1e4 + 0.0
    assert(r.getAs[Double]("mean_diff") == -10.0, r.toString)
    assert(r.getAs[Double]("cohen_d") == t4(-10.0 / math.sqrt(5.0)), r.toString)
    assert(r.getAs[Double]("hedges_g") == t4(-10.0 / math.sqrt(5.0) * (4.0 / 7.0)),
      r.toString)
    assert(r.getAs[Double]("glass_delta") == t4(-10.0 / math.sqrt(8.0)), r.toString)
    assert(!r.getAs[Boolean]("degenerate"))
    // a singleton side has no variance estimate — degenerate zeros
    val one = Seq(("a", 1.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val Array(o) = Stats.effectSize(one, col("g"), col("v"), "a", "b").collect()
    assert(o.getAs[Double]("cohen_d") == 0.0 && o.getAs[Boolean]("degenerate"))
    // r12 edge audit: TWO singletons zero the pooled-sd denominator
    // inside the guard itself — must degenerate-flag, never ANSI-throw
    // (codegen CSE evaluates the guard's subexpressions eagerly)
    val two = Seq(("a", 1.0), ("b", 5.0)).toDF("g", "v")
    val Array(tw) = Stats.effectSize(two, col("g"), col("v"), "a", "b").collect()
    assert(tw.getAs[Boolean]("degenerate") && tw.getAs[Double]("cohen_d") == 0.0)
  }

  test("decompositionStrength: pure-seasonal vs pure-trend vs mixed series land the right F") {
    import graft.operators.Stats
    // period 3. "seas": exact 3-cycle, flat trend -> resid 0, Var(tr)=0
    // (degenerate trend side, f_trend 0) but f_seasonal = 1. "trend":
    // linear ramp -> seasonal ~0 (degenerate seasonal side), f_trend 1.
    val pat = Seq(10.0, 0.0, 5.0)
    val d = (Seq.tabulate(21)(i => ("seas", i.toLong, pat(i % 3)))
      ++ Seq.tabulate(21)(i => ("trend", i.toLong, i.toDouble))).toDF("g", "b", "v")
    val rows = Stats.decompositionStrength(d, col("g"), col("b"), col("v"),
      period = 3).collect().map(r => r.getString(0) -> r).toMap
    val se = rows("seas")
    assert(se.getAs[Double]("f_seasonal") == 1.0 && se.getAs[Double]("f_trend") == 0.0
      && se.getAs[Boolean]("degenerate"), se.toString)
    val tr = rows("trend")
    assert(tr.getAs[Double]("f_trend") == 1.0 && tr.getAs[Double]("f_seasonal") == 0.0
      && tr.getAs[Boolean]("degenerate"), tr.toString)
    // mixed noisy-ish series: both strengths interior, no degeneracy
    val mixed = Seq.tabulate(30)(i =>
      ("m", i.toLong, i * 0.5 + pat(i % 3) + (if (i % 7 == 0) 1.0 else 0.0)))
      .toDF("g", "b", "v")
    val Array(m) = Stats.decompositionStrength(mixed, col("g"), col("b"),
      col("v"), period = 3).collect()
    assert(!m.getAs[Boolean]("degenerate"), m.toString)
    assert(m.getAs[Double]("f_trend") > 0.9, m.toString)
    assert(m.getAs[Double]("f_seasonal") > 0.5, m.toString)
  }

  test("holtWintersChart: hand-walked period-2 integer lanes; seasonal ring; key isolation") {
    import graft.operators.Stats
    // v = [10, 0, 10, 0], p=2, α=β=γ=1/2, hand-walked micro-lanes:
    // t2: s=5e6 b=-2.5e6 c=-2.5e6 resid=-10; t3: s=6.25e6 b=-0.625e6
    // c=1.875e6 resid=7.5; t4: s=4.0625e6 b=-1.40625e6 c=-3.28125e6
    // resid=-3.125 (cprev = the t2 seasonal — the RING, not the last c)
    val d = (Seq.tabulate(4)(i => ("k", i.toLong, if (i % 2 == 0) 10.0 else 0.0))
      ++ Seq(("solo", 0L, 7.0))).toDF("g", "x", "v")
    val rows = Stats.holtWintersChart(d, col("g"), col("x"), col("v"),
      period = 2, alphaNum = 1, alphaDen = 2, betaNum = 1, betaDen = 2,
      gammaNum = 1, gammaDen = 2, band = 2.0)
      .orderBy("key", "bucket").collect()
    val k = rows.filter(_.getString(0) == "k")
    assert(k(0).getAs[Double]("level") == 10.0 && k(0).isNullAt(k(0).fieldIndex("resid")))
    assert(k(1).getAs[Double]("level") == 5.0 && k(1).getAs[Double]("trend") == -2.5
      && k(1).getAs[Double]("seasonal") == -2.5 && k(1).getAs[Double]("resid") == -10.0
      && k(1).getAs[Boolean]("alarm"), k(1).toString)
    assert(k(2).getAs[Double]("level") == 6.25 && k(2).getAs[Double]("trend") == -0.625
      && k(2).getAs[Double]("seasonal") == 1.875 && k(2).getAs[Double]("resid") == 7.5,
      k(2).toString)
    assert(k(3).getAs[Double]("level") == 4.0625 && k(3).getAs[Double]("trend") == -1.40625
      && k(3).getAs[Double]("seasonal") == -3.28125 && k(3).getAs[Double]("resid") == -3.125,
      k(3).toString)
    // key isolation: the singleton key restarts state
    val solo = rows.filter(_.getString(0) == "solo").head
    assert(solo.getAs[Double]("level") == 7.0 && solo.isNullAt(solo.fieldIndex("resid")))
  }

  test("bestChangepoint: exact argmax on a planted step; minSeg bounds; short-series degenerate") {
    import graft.operators.Stats
    // [0,0,0,10,10,10]: gain peaks at k=3 with 150.0 (micro²/1e12 =
    // value² units); means 0 / 10 exact
    val d = (Seq.tabulate(6)(i => ("k", (i + 1).toLong, if (i < 3) 0.0 else 10.0))
      ++ Seq(("tiny", 1L, 1.0), ("tiny", 2L, 9.0), ("tiny", 3L, 9.0))).toDF("g", "x", "v")
    val rows = Stats.bestChangepoint(d, col("g"), col("x"), col("v"), minSeg = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val k = rows("k")
    assert(k.getAs[Long]("n") == 6L && k.getAs[Long]("split_x") == 3L
      && k.getAs[Long]("n_left") == 3L, k.toString)
    assert(k.getAs[Double]("mean_left") == 0.0 && k.getAs[Double]("mean_right") == 10.0)
    assert(k.getAs[Double]("gain") == 150.0, k.toString)
    assert(!k.getAs[Boolean]("degenerate"))
    // n=3 < 2·minSeg: no admissible split
    val tiny = rows("tiny")
    assert(tiny.isNullAt(tiny.fieldIndex("split_x")) && tiny.getAs[Double]("gain") == 0.0
      && tiny.getAs[Boolean]("degenerate"), tiny.toString)
  }

  test("changepoints: planted two-break series — single form reports one, BinSeg reports both; min-gain stop; flat series empty") {
    import graft.operators.Stats
    // two level shifts: 0 (x 1-10) → 10 (x 11-20) → 25 (x 21-30)
    val d = Seq.tabulate(30) { i =>
      val v = if (i < 10) 0.0 else if (i < 20) 10.0 else 25.0
      ("k", (i + 1).toLong, v)
    }.toDF("g", "x", "v")
    // the single-split form provably reports only ONE break
    val single = Stats.bestChangepoint(d, col("g"), col("x"), col("v"))
      .collect()
    assert(single.length == 1 && !single.head.getAs[Boolean]("degenerate"))
    // BinSeg finds BOTH breaks, positions exact
    val multi = Stats.changepoints(d, col("g"), col("x"), col("v"),
        minSeg = 2, maxDepth = 3, minGain = 1.0)
      .orderBy("cp_index").collect()
    assert(multi.map(_.getAs[Long]("split_x")).toSeq == Seq(10L, 20L),
      multi.mkString(","))
    assert(multi.map(_.getAs[Int]("cp_index")).toSeq == Seq(1, 2))
    // the first round picks the larger contrast (x=20 splits 10-means
    // from 25s); the second refines the left child at x=10
    val byX = multi.map(r => r.getAs[Long]("split_x") -> r.getAs[Int]("depth")).toMap
    assert(byX(20L) == 1 && byX(10L) == 2, byX.toString)
    // segment-local means are exact
    val cp10 = multi.find(_.getAs[Long]("split_x") == 10L).get
    assert(cp10.getAs[Double]("mean_left") == 0.0
      && cp10.getAs[Double]("mean_right") == 10.0, cp10.toString)
    // min-gain stop: a threshold above every gain emits nothing
    assert(Stats.changepoints(d, col("g"), col("x"), col("v"),
      minGain = 1e9).count() == 0L)
    // flat series: zero changepoints, not a crash
    val flat = Seq.tabulate(10)(i => ("f", (i + 1).toLong, 5.0)).toDF("g", "x", "v")
    assert(Stats.changepoints(flat, col("g"), col("x"), col("v")).count() == 0L)
  }

  test("theilSen: outlier-robust slope and intercept; degenerate singleton; guard throws") {
    import graft.operators.Stats
    // v = 2x + 5 with one wild outlier: OLS would bend, Theil-Sen
    // reports slope=2 intercept=5 exactly (median rank picks)
    val d = (Seq((0L, 5.0), (1L, 7.0), (2L, 9.0), (3L, 100.0), (4L, 13.0))
      .map { case (x, v) => ("k", x, v) } ++ Seq(("one", 0L, 3.0))).toDF("g", "x", "v")
    val rows = Stats.theilSen(d, col("g"), col("x"), col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val k = rows("k")
    assert(k.getAs[Double]("slope") == 2.0 && k.getAs[Double]("intercept") == 5.0,
      k.toString)
    val one = rows("one")
    assert(one.isNullAt(one.fieldIndex("slope")) && one.getAs[Boolean]("degenerate"))
    // n >= 2 but ALL-EQUAL order values: zero pairs, NULL slope — must
    // carry the degenerate flag, never an unflagged NULL row
    val flat = Seq(("f", 7L, 1.0), ("f", 7L, 2.0), ("f", 7L, 3.0)).toDF("g", "x", "v")
    val fr = Stats.theilSen(flat, col("g"), col("x"), col("v")).collect().head
    assert(fr.getAs[Long]("n") == 3L && fr.isNullAt(fr.fieldIndex("slope"))
      && fr.getAs[Boolean]("degenerate"), fr.toString)
    // quadratic-pair guard fails loudly past senMaxN
    val big = Seq.tabulate(51)(i => ("k", i.toLong, i.toDouble)).toDF("g", "x", "v")
    val ex = intercept[Exception] {
      Stats.theilSen(big, col("g"), col("x"), col("v"), senMaxN = 50L).collect()
    }
    def rootMsg(t: Throwable): String =
      if (t.getCause == null) String.valueOf(t.getMessage)
      else String.valueOf(t.getMessage) + " | " + rootMsg(t.getCause)
    assert(rootMsg(ex).contains("senMaxN"), rootMsg(ex).take(400))
  }

  test("gamesHowell: hand-computed q and Welch-Satterthwaite dof; degenerate pair flags") {
    import graft.operators.Stats
    // a={1,3}: mean 2, s²=2, v=1; b={10,14}: mean 12, s²=8, v=4
    // q = 10/sqrt((1+4)/2) = 10/sqrt(2.5); dof = 25/(1+16) = 25/17
    val d = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 14.0)).toDF("g", "v")
    val Array(r) = Stats.gamesHowell(d, col("g"), col("v")).collect()
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getAs[Double]("mean_diff") == -10.0, r.toString)
    assert(r.getAs[Double]("q") ==
      math.floor(10.0 / math.sqrt(2.5) * 1e4) / 1e4, r.toString)
    assert(r.getAs[Double]("dof") ==
      math.floor(25.0 / 17.0 * 1e4) / 1e4, r.toString)
    assert(!r.getAs[Boolean]("degenerate"))
    // a zero-variance side degenerates ITS pairs only
    val mix = d.union(Seq(("c", 7.0), ("c", 7.0)).toDF("g", "v"))
    val rows = Stats.gamesHowell(mix, col("g"), col("v"))
      .orderBy("grp_a", "grp_b").collect()
    assert(rows.length == 3)
    val byPair = rows.map(x => (x.getString(0), x.getString(1)) -> x).toMap
    assert(!byPair(("a", "b")).getAs[Boolean]("degenerate"))
    assert(byPair(("a", "c")).getAs[Boolean]("degenerate")
      && byPair(("a", "c")).getAs[Double]("q") == 0.0)
    assert(byPair(("b", "c")).getAs[Boolean]("degenerate"))
    // ...but its mean_diff still reports
    assert(byPair(("a", "c")).getAs[Double]("mean_diff") == -5.0)
    // a NON-DYADIC constant group (three 0.1s) must degenerate too:
    // the truncated s² lane's ~5e-8 residue would otherwise produce a
    // huge q with degenerate=false (the r11 review find)
    val nd = Seq(("a", 0.1), ("a", 0.1), ("a", 0.1),
      ("b", 1.0), ("b", 3.0)).toDF("g", "v")
    val Array(nr) = Stats.gamesHowell(nd, col("g"), col("v")).collect()
    assert(nr.getAs[Boolean]("degenerate") && nr.getAs[Double]("q") == 0.0,
      nr.toString)
  }

  test("tukeyHsd: hand-computed pairwise q; precision 1 sanity vs anova; degenerate flags") {
    import graft.operators.Stats
    // same design as the anova spec: MSE = SSW/(N-k) = 6/6 = 1;
    // SE per pair = sqrt(1/2 * (1/3 + 1/3)) = sqrt(1/3);
    // q(a,b) = 4/sqrt(1/3), q(a,c) = 10/sqrt(1/3), q(b,c) = 6/sqrt(1/3)
    val d = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 5.0), ("b", 6.0), ("b", 7.0),
      ("c", 11.0), ("c", 12.0), ("c", 13.0)).toDF("g", "v")
    val rows = Stats.tukeyHsd(d, col("g"), col("v"))
      .orderBy("grp_a", "grp_b").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
    def q(diff: Double) = math.floor(diff / math.sqrt(1.0 / 3.0) * 1e4) / 1e4
    assert(rows(0).getAs[Double]("q") == q(4.0), rows(0).toString)
    assert(rows(1).getAs[Double]("q") == q(10.0), rows(1).toString)
    assert(rows(2).getAs[Double]("q") == q(6.0), rows(2).toString)
    // mean_diff is signed toward-zero truncation: a - b = -4
    assert(rows(0).getAs[Double]("mean_diff") == -4.0, rows(0).toString)
    assert(rows.forall(!_.getAs[Boolean]("degenerate")))
    // zero within-variance: every pair degenerate with q = 0, but the
    // mean differences still report
    val flat = Seq(("a", 5.0), ("a", 5.0), ("b", 9.0), ("b", 9.0)).toDF("g", "v")
    val Array(fr) = Stats.tukeyHsd(flat, col("g"), col("v")).collect()
    assert(fr.getAs[Boolean]("degenerate") && fr.getAs[Double]("q") == 0.0
      && fr.getAs[Double]("mean_diff") == -4.0, fr.toString)
    // ...and NON-DYADIC constant groups, whose truncated ssw lane
    // carries a ~1e-7 residue, must flag exactly the same way (the
    // r11 review find): all-constant is decided by min==max per group
    val flat01 = Seq(("a", 0.1), ("a", 0.1), ("a", 0.1),
      ("b", 0.2), ("b", 0.2), ("b", 0.2)).toDF("g", "v")
    val Array(f01) = Stats.tukeyHsd(flat01, col("g"), col("v")).collect()
    assert(f01.getAs[Boolean]("degenerate") && f01.getAs[Double]("q") == 0.0,
      f01.toString)
    // unequal n uses the Tukey-Kramer SE: a(n=2) vs b(n=4)
    val uneq = Seq(("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", 6.0),
      ("b", 8.0), ("b", 9.0)).toDF("g", "v")
    val Array(u) = Stats.tukeyHsd(uneq, col("g"), col("v")).collect()
    // means 2 and 7; SSW = 2 + 10 = 12, MSE = 12/4 = 3
    val se = math.sqrt(3.0 / 2.0 * (1.0 / 2 + 1.0 / 4))
    assert(u.getAs[Double]("q") == math.floor(5.0 / se * 1e4) / 1e4, u.toString)
  }

  test("brownForsythe: hand-computed W on median-centered deviations; equal spreads give 0") {
    import graft.operators.Stats
    // a=[1,2,3,10]: type-1 median = x_ceil(2) = 2 → z=[1,0,1,8]
    // b=[5,5,5,5]: z=[0,0,0,0] → SSB=12.5, SSW=41, W=(12.5/1)/(41/6)
    val d = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 10.0),
      ("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 5.0)).toDF("g", "v")
    val Array(r) = Stats.brownForsythe(d, col("g"), col("v")).collect()
    assert(r.getLong(0) == 8L && r.getLong(1) == 2L, r.toString)
    assert(r.getDouble(2) == 12.5 && r.getDouble(3) == 41.0, r.toString)
    assert(r.getDouble(4) == math.floor(75.0 / 41.0 * 1e4) / 1e4, r.toString)
    assert(!r.getBoolean(6), r.toString)
    // identical spreads around different centers: W = 0 exactly
    val eq = Seq(("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", 7.0)).toDF("g", "v")
    val Array(e) = Stats.brownForsythe(eq, col("g"), col("v")).collect()
    assert(e.getDouble(4) == 0.0 && e.getDouble(2) == 0.0 && !e.getBoolean(6),
      e.toString)
  }

  test("kruskalWallis: hand-computed ranks, tie correction, degenerate all-tied") {
    import graft.operators.Stats
    def fl4(x: Double) = math.floor(x * 1e4) / 1e4
    // no ties: a={1,2} b={3,4} → R_a=3, R_b=7, ΣR²/n = 29
    val d = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)).toDF("g", "v")
    val Array(r) = Stats.kruskalWallis(d, col("g"), col("v")).collect()
    val h1 = 12.0 / (4.0 * 5.0) * 29.0 - 3.0 * 5.0
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L && r.getLong(2) == 1L)
    assert(r.getDouble(3) == fl4(h1) && r.getDouble(4) == fl4(h1), r.toString)
    assert(!r.getBoolean(5), r.toString)
    // ties: a={1,1} b={1,2} → mid-rank 2 for the tied triple, rank 4
    // for the 2; ΣR²/n = 26; ΣT = 24, N³−N = 60 → corr = 1 − 24/60
    val t = Seq(("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 2.0)).toDF("g", "v")
    val Array(rt) = Stats.kruskalWallis(t, col("g"), col("v")).collect()
    val h2 = 12.0 / (4.0 * 5.0) * 26.0 - 3.0 * 5.0
    val corr = 1.0 - 24.0 / 60.0
    assert(rt.getDouble(3) == fl4(math.max(0.0, h2)), rt.toString)
    assert(rt.getDouble(4) == fl4(math.max(0.0, h2) / corr), rt.toString)
    assert(!rt.getBoolean(5), rt.toString)
    // every observation tied: the correction denominator vanishes
    val flat = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0)).toDF("g", "v")
    val Array(fl) = Stats.kruskalWallis(flat, col("g"), col("v")).collect()
    assert(fl.getBoolean(5) && fl.getDouble(4) == 0.0, fl.toString)
    // empty input: zero row, no NULL cascade
    val Array(e) = Stats.kruskalWallis(
      Seq.empty[(String, Double)].toDF("g", "v"), col("g"), col("v")).collect()
    assert(e.getLong(0) == 0L && e.getBoolean(5), e.toString)
  }

  test("cusum: hand-computed one-sided sums, alarms, downward shift, key isolation") {
    import graft.operators.Stats
    // upward burst: x=[3,3,10,10,3,3], target 3, slack .5 →
    // hi = [0,0,6.5,13,12.5,12], lo all 0
    val d = (Seq(3.0, 3.0, 10.0, 10.0, 3.0, 3.0).zipWithIndex.map {
      case (v, i) => ("k", i.toLong, v)
    } ++ Seq.tabulate(4)(i => ("flat", i.toLong, 3.0))).toDF("g", "b", "v")
    val out = Stats.cusum(d, col("g"), col("b"), col("v"),
        target = 3.0, slack = 0.5, threshold = 8.0)
      .filter(col("key") === "k").orderBy("bucket").collect()
    assert(out.map(_.getDouble(3)).toSeq == Seq(0.0, 0.0, 6.5, 13.0, 12.5, 12.0))
    assert(out.map(_.getBoolean(5)).toSeq ==
      Seq(false, false, false, true, true, true))
    assert(out.forall(r => r.getDouble(4) == 0.0 && !r.getBoolean(6)))
    // the flat key never accumulates (isolation across keys)
    val flat = Stats.cusum(d, col("g"), col("b"), col("v"),
        target = 3.0, slack = 0.5, threshold = 8.0)
      .filter(col("key") === "flat").collect()
    assert(flat.forall(r => r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0))
    // downward drift trips the LOW side only
    val dn = Seq(3.0, 3.0, 1.0, 1.0, 1.0, 1.0).zipWithIndex.map {
      case (v, i) => ("k", i.toLong, v)
    }.toDF("g", "b", "v")
    val lo = Stats.cusum(dn, col("g"), col("b"), col("v"),
        target = 3.0, slack = 0.5, threshold = 4.0)
      .orderBy("bucket").collect()
    assert(lo.map(_.getDouble(4)).toSeq == Seq(0.0, 0.0, 1.5, 3.0, 4.5, 6.0))
    assert(lo.map(_.getBoolean(6)).toSeq ==
      Seq(false, false, false, false, true, true))
    assert(lo.forall(!_.getBoolean(5)))
  }

  test("sprt: crossings at the exact walk steps, earliest decision flagged, continue in between") {
    import graft.operators.Stats
    // p0=0.4, p1=0.6: step ±0.4054651; upper 2.7725887 (7 wins),
    // lower −1.5581446 (4 losses)
    val wins = Seq.tabulate(8)(i => ("w", i.toLong, true))
    val losses = Seq.tabulate(5)(i => ("l", i.toLong, false))
    val mixed = Seq.tabulate(6)(i => ("m", i.toLong, i % 2 == 0))
    val df = (wins ++ losses ++ mixed).toDF("k", "o", "x")
    val out = Stats.sprt(df, col("k"), col("o"), col("x"), p0 = 0.4, p1 = 0.6)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    assert(out(("w", 5L)).getString(3) == "continue")
    assert(out(("w", 6L)).getString(3) == "accept_h1" &&
      out(("w", 6L)).getBoolean(4))
    assert(out(("w", 7L)).getString(3) == "accept_h1" &&
      !out(("w", 7L)).getBoolean(4), "only the FIRST crossing is flagged")
    assert(out(("w", 2L)).getDouble(2) == math.floor(3 * 0.4054651 * 1e4) / 1e4)
    assert(out(("l", 2L)).getString(3) == "continue")
    assert(out(("l", 3L)).getString(3) == "accept_h0" &&
      out(("l", 3L)).getBoolean(4))
    assert(mixed.indices.forall(i => out(("m", i.toLong)).getString(3) == "continue"))
  }

  test("cmhTest: hand-computed two-stratum table, single-row exclusion, no-association zero") {
    import graft.operators.Stats
    // per stratum: a=3, r1=4, c1=4, n=8 → E=2, V=256/448;
    // two identical strata → CMH = 4 / (2·t7(V))
    def stratum(k: String) = Seq.fill(3)((k, true, true)) ++ Seq((k, true, false)) ++
      Seq((k, false, true)) ++ Seq.fill(3)((k, false, false))
    val d = (stratum("s1") ++ stratum("s2")).toDF("k", "e", "o")
    val Array(r) = Stats.cmhTest(d, col("k"), col("e"), col("o")).collect()
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L && r.getLong(2) == 16L)
    val v7 = math.floor(256.0 / 448.0 * 1e7) / 1e7
    assert(r.getDouble(3) == math.floor(4.0 / (2 * v7) * 1e4) / 1e4, r.toString)
    assert(!r.getBoolean(4))
    // a single-row stratum is excluded, statistic unchanged
    val Array(x) = Stats.cmhTest(
      (stratum("s1") ++ stratum("s2") :+ (("tiny", true, true)))
        .toDF("k", "e", "o"),
      col("k"), col("e"), col("o")).collect()
    assert(x.getLong(0) == 2L && x.getLong(1) == 1L
      && x.getDouble(3) == r.getDouble(3), x.toString)
    // perfectly balanced: a == E in every stratum → CMH = 0
    def balanced(k: String) = Seq((k, true, true), (k, true, false),
      (k, false, true), (k, false, false))
    val Array(z) = Stats.cmhTest((balanced("a") ++ balanced("b")).toDF("k", "e", "o"),
      col("k"), col("e"), col("o")).collect()
    assert(z.getDouble(3) == 0.0 && !z.getBoolean(4), z.toString)
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

  test("auc: hand-computed rank-sum with ties, perfect and inverted rankings") {
    // pos at .9 .7 .4, neg at .7 .3: pairs = 3*2 = 6
    // (.9 beats both) = 2, (.7 vs .7 tie = .5, .7 > .3) = 1.5, (.4 > .3) = 1
    // AUC = 4.5/6 = 0.75
    val df = Seq((0.9, true), (0.7, true), (0.4, true), (0.7, false), (0.3, false))
      .toDF("score", "y")
    val r = Stats.auc(df, col("score"), col("y")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((5L, 3L, 2L)))
    assert(r.getDouble(3) == 0.75)
    val perfect = Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false)).toDF("score", "y")
    assert(Stats.auc(perfect, col("score"), col("y")).collect().head.getDouble(3) == 1.0)
    val inverted = Seq((0.1, true), (0.2, true), (0.8, false), (0.9, false)).toDF("score", "y")
    assert(Stats.auc(inverted, col("score"), col("y")).collect().head.getDouble(3) == 0.0)
    // one-sided input: uninformative 0.5
    val onlyPos = Seq((0.9, true), (0.1, true)).toDF("score", "y")
    val d = Stats.auc(onlyPos, col("score"), col("y")).collect().head
    assert(d.getLong(2) == 0L && d.getDouble(3) == 0.5)
  }

  test("ksTest: hand-computed supremum; identical samples give D=0") {
    // A = {1,2,3}, B = {3,4,5}: at v=2 |2/3 - 0| = 2/3 is the sup
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 3.0), ("b", 4.0), ("b", 5.0))
      .toDF("g", "v")
    val r = Stats.ksTest(df, col("g"), col("v"), "a", "b").collect().head
    assert((r.getLong(0), r.getLong(1)) == ((3L, 3L)))
    assert(r.getDouble(2) == math.floor(2.0 / 3.0 * 1e6) / 1e6)
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)).toDF("g", "v")
    val s = Stats.ksTest(same, col("g"), col("v"), "a", "b").collect().head
    assert(s.getDouble(2) == 0.0 && !s.getBoolean(4))
    // clearly shifted large samples reject
    val big = ((1 to 500).map(i => ("a", i / 100.0)) ++
      (1 to 500).map(i => ("b", 3.0 + i / 100.0))).toDF("g", "v")
    assert(Stats.ksTest(big, col("g"), col("v"), "a", "b").collect().head.getBoolean(4))
    // empty input: one degenerate row
    val e = Stats.ksTest(same.filter(col("g") === "zzz"), col("g"), col("v"), "a", "b")
      .collect().head
    assert((e.getLong(0), e.getLong(1), e.getDouble(2)) == ((0L, 0L, 0.0)))
  }

  test("chiSquared: 2x2 fixture matches the textbook formula; independence gives ~0") {
    // | 30 10 | 10 30 |: chi2 = n(ad-bc)^2 / (r1 r2 c1 c2) = 80*640000/2560000 = 20
    val rows = Seq.fill(30)(("x", "u")) ++ Seq.fill(10)(("x", "v")) ++
      Seq.fill(10)(("y", "u")) ++ Seq.fill(30)(("y", "v"))
    val r = Stats.chiSquared(rows.toDF("a", "b"), col("a"), col("b")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((80L, 4L, 1L)))
    assert(math.abs(r.getDouble(3) - 20.0) < 1e-5)
    // cramers v for 2x2 = sqrt(chi2/n) = 0.5
    assert(math.abs(r.getDouble(4) - 0.5) < 1e-4)
    // perfectly independent layout: every cell = expected -> chi2 = 0
    val ind = Seq.fill(20)(("x", "u")) ++ Seq.fill(20)(("x", "v")) ++
      Seq.fill(20)(("y", "u")) ++ Seq.fill(20)(("y", "v"))
    assert(Stats.chiSquared(ind.toDF("a", "b"), col("a"), col("b"))
      .collect().head.getDouble(3) == 0.0)
    // single-level column: dof 0, chi2 0
    val one = Seq(("x", "u"), ("x", "v")).toDF("a", "b")
    val o = Stats.chiSquared(one, col("a"), col("b")).collect().head
    assert(o.getLong(2) == 0L && o.getDouble(3) == 0.0)
    // null is a real level, not a dropped row
    val withNull = Seq((Some("x"), "u"), (None, "v"), (None, "u"), (Some("x"), "v"))
      .toDF("a", "b")
    assert(Stats.chiSquared(withNull, col("a"), col("b")).collect().head.getLong(0) == 4L)
  }

  test("seasonalDecompose: recovers planted linear trend + zero-sum seasonal pattern") {
    // value = 100 + 0.1*b + eff(b % 5); a centered 5-window covers each
    // phase exactly once, so MA = 100 + 0.1*b and detrended = eff
    val eff = Array(5.0, -5.0, 0.0, 2.0, -2.0)
    val rows = (0L until 50L).map(b => (1L, b, 100.0 + 0.1 * b + eff((b % 5).toInt)))
    val out = Stats.seasonalDecompose(rows.toDF("k", "b", "v"),
        col("k"), col("b"), col("v"), period = 5)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(1), Option(r.get(3)).map(_.asInstanceOf[Double]),
        r.getDouble(4), Option(r.get(5)).map(_.asInstanceOf[Double])))
    assert(out.length == 50)
    // edge rows (first/last 2) have no full window: null trend/residual
    assert(out.take(2).forall(r => r._2.isEmpty && r._4.isEmpty))
    assert(out.takeRight(2).forall(r => r._2.isEmpty && r._4.isEmpty))
    // interior: trend ~ 100 + 0.1*b, seasonal ~ eff(phase), residual ~ 0
    out.drop(2).dropRight(2).foreach { case (b, t, s, r) =>
      assert(math.abs(t.get - (100.0 + 0.1 * b)) < 1e-3, s"trend at $b: ${t.get}")
      assert(math.abs(s - eff((b % 5).toInt)) < 1e-3, s"seasonal at $b: $s")
      assert(math.abs(r.get) < 1e-2, s"residual at $b: ${r.get}")
    }
  }

  test("calibration: hand-computed bins, clamping, and ECE") {
    // bin 0: scores .05 (neg), bin 9: 1.2 clamps in, .95 (both pos)
    val df = Seq((0.05, false), (0.95, true), (1.2, true), (-0.1, false))
      .toDF("score", "y")
    val r = Stats.calibration(df, col("score"), col("y"), nBins = 10)
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getDouble(2), x.getDouble(3),
        x.getDouble(4), x.getDouble(5)))
    assert(r.length == 2)
    // bin 0: n=2 (.05 and clamped -0.1), mean=floor(-.05/2*1e4)/1e4... -0.025 -> t4floor
    val b0 = r(0); val b9 = r(1)
    assert(b0._1 == 0 && b0._2 == 2L && b0._4 == 0.0)
    assert(b9._1 == 9 && b9._2 == 2L && b9._4 == 1.0)
    // bin 9 mean: the exact-decimal sum 2.150000 casts to double and
    // halves BEFORE the 4-dp floor — replicate that op order exactly
    // (floor(2.15/2*1e4) lands on 10750.0; floor(1.075*1e4) does not:
    // the contract is determinism of one op sequence, not decimal
    // niceness)
    val mean9 = math.floor(2.15 / 2 * 1e4) / 1e4
    assert(b9._3 == mean9 && math.abs(b9._5 - (mean9 - 1.0)) < 1e-12)
    // ece identical on every row; the operator rounds each gap into a
    // 6-dp DECIMAL before the weighted sum (0.074999... -> 0.075000),
    // so the exact-decimal numerator is 2*0.075 + 2*0.025 = 0.200000
    assert(b0._6 == b9._6)
    assert(b0._6 == math.floor(0.2 / 4 * 1e4) / 1e4)
  }

  test("attributionCredit: linear/first/last hand-computed; window excludes, ties break by id, creditless conversions absent") {
    // u1: P1 v=30 with touches click(950) view(960) click(990); the
    //     click at 850 is outside the 100us lookback of ts 1000
    // u2: P2 v=12 with ONE view exactly AT the conversion ts (boundary in)
    // u3: conversion with no touches -> contributes nothing
    // u4: P3 v=10 with two clicks at the SAME ts -> id tiebreak
    val ev = Seq(
      (1L, 100L, 1000L, "purchase", 30.0), (1L, 1L, 950L, "click", 0.0),
      (1L, 2L, 960L, "view", 0.0), (1L, 3L, 990L, "click", 0.0),
      (1L, 4L, 850L, "click", 0.0),
      (2L, 101L, 2000L, "purchase", 12.0), (2L, 5L, 2000L, "view", 0.0),
      (3L, 103L, 5000L, "purchase", 9.0),
      (4L, 102L, 3000L, "purchase", 10.0), (4L, 6L, 2950L, "click", 0.0),
      (4L, 7L, 2950L, "click", 0.0)
    ).toDF("u", "id", "ts", "t", "v")
    val out = Behavior.attributionCredit(ev, col("u"), col("id"), col("ts"),
        col("t"), col("v"), "purchase", Seq("click", "view"), lookbackUs = 100L)
      .orderBy("channel")
      .as[(String, Long, Long, Double, Double, Double)].collect()
    // click: P1 linear 10+10, P3 linear 5+5 = 30; first = P1's 30 + P3's
    // 10 (id 6 wins the tie) = 40; last = P1's 30 + P3's 10 (id 7) = 40
    assert(out(0) == (("click", 4L, 2L, 30.0, 40.0, 40.0)), out(0).toString)
    // view: P1's middle touch (linear only) + P2's sole touch (all three)
    assert(out(1) == (("view", 2L, 2L, 22.0, 12.0, 12.0)), out(1).toString)
  }

  test("levelShift: hand-computed step flags; flat-baseline sentinel; edges report zeros") {
    import graft.operators.Stats
    // key "t": 1,2,3 then 10,11,12 — at the step bucket pre = 2, sd = 1,
    // post = 11, shift = 9, z = 9 (> 2). key "s": flat 10s then flat
    // 20s — sd = 0, shift != 0 -> flagged with the z = 0 sentinel.
    val rows =
      Seq.tabulate(6)(i => ("t", i.toLong, if (i < 3) 1.0 + i else 7.0 + i)) ++
      Seq.tabulate(8)(i => ("s", i.toLong, if (i < 4) 10.0 else 20.0))
    val out = Stats.levelShift(rows.toDF("k", "bucket", "v"),
        col("k"), col("bucket"), col("v"), width = 3, zThresh = 2.0)
      .select("k", "bucket", "pre_mean", "post_mean", "shift", "shift_z", "changepoint")
      .as[(String, Long, Double, Double, Double, Double, Boolean)]
      .collect().sortBy(r => (r._1, r._2))
    val s = out.filter(_._1 == "s")
    val t = out.filter(_._1 == "t")
    // t: only bucket 3 has full windows ([0,2] / [3,5])
    assert(t(3) == (("t", 3L, 2.0, 11.0, 9.0, 9.0, true)), t(3).toString)
    // every edge row (no full window pair) reports zeros, un-flagged
    (t.take(3) ++ t.drop(4)).foreach { r =>
      assert((r._3, r._4, r._5, r._6, r._7) == ((0.0, 0.0, 0.0, 0.0, false)), r.toString)
    }
    // s: buckets 3,4,5 have full windows; bucket 4 is the step (pre
    // window [1,3] all 10s -> sd 0, post [4,6] all 20s): flagged, z=0
    assert(s(4) == (("s", 4L, 10.0, 20.0, 10.0, 0.0, true)), s(4).toString)
    // bucket 3: pre all-10 flat, post mixed (10,20,20): flagged too
    // (sd = 0, shift = 20/3 - 10 != 0) — the filter has width 3
    assert(s(3)._7 && s(3)._6 == 0.0, s(3).toString)
    // bucket 5: pre (10,10,20) has sd > 0 -> a real z, NOT the
    // sentinel, and it stays under threshold (z ≈ 1.15): un-flagged.
    // Replicate the operator's exact double path: moments from exact
    // sums, then pre = s/n, var = (ss - s²/n)/(n-1)
    val sd = math.sqrt((600.0 - 1600.0 / 3.0) / 2.0)
    val zRaw = (20.0 - 40.0 / 3.0) / sd
    val zExp = math.signum(zRaw) * math.floor(math.abs(zRaw) * 1e4) / 1e4
    assert(s(5)._6 == zExp && !s(5)._7, s"${s(5)} vs $zExp")
  }

  test("topPaths: sliding windows per user, global counts, tie order, k cap") {
    import spark.implicits._
    val ev = Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "B"), (1L, 30L, 3L, "C"), (1L, 40L, 4L, "D"),
      (2L, 10L, 5L, "A"), (2L, 20L, 6L, "B"), (2L, 30L, 7L, "C"))
      .toDF("u", "t", "eid", "et")
    val r = Behavior.topPaths(ev, col("u"), col("t"), col("et"),
        tiebreak = col("eid"), len = 3, k = 10)
      .as[(String, Long)].collect()
    assert(r.toSeq == Seq(("A>B>C", 2L), ("B>C>D", 1L)), s"got ${r.toSeq}")
    // k caps; count ties break on path ascending
    val r1 = Behavior.topPaths(ev, col("u"), col("t"), col("et"),
      tiebreak = col("eid"), len = 2, k = 2).as[(String, Long)].collect()
    assert(r1.toSeq == Seq(("A>B", 2L), ("B>C", 2L)), s"got ${r1.toSeq}")
  }

  test("interArrival: hand-computed gaps and exact percentiles; single-event keys drop") {
    import spark.implicits._
    val ev = Seq(
      ("a", 10L, 1L), ("a", 20L, 2L), ("a", 45L, 3L), ("a", 100L, 4L),
      ("b", 5L, 5L), // one event: no gap, no row
      ("c", 7L, 6L), ("c", 7L, 7L)) // same-instant pair: gap 0 counts
      .toDF("k", "t", "eid")
    val r = Behavior.interArrival(ev, col("k"), col("t"), col("eid"))
      .orderBy("key").as[(String, Long, Double, Long, Long)].collect()
    // a: gaps 10,25,55 -> mean 30, p50 = rank ceil(1.5)=2 -> 25,
    //    p90 = rank ceil(2.7)=3 -> 55
    assert(r.toSeq == Seq(
      ("a", 3L, 30.0, 25L, 55L),
      ("c", 1L, 0.0, 0L, 0L)), s"got ${r.toSeq}")
  }

  test("brierDecomposition: hand-computed Murphy terms; identity holds for bin-constant forecasts") {
    import spark.implicits._
    // two bins at s=0.2 (1 of 4 positive) and s=0.8 (3 of 4 positive)
    val rows = Seq.fill(1)((0.2, true)) ++ Seq.fill(3)((0.2, false)) ++
      Seq.fill(3)((0.8, true)) ++ Seq.fill(1)((0.8, false))
    val r = Stats.brierDecomposition(rows.toDF("s", "y"), col("s"), col("y"),
      nBins = 2).collect()(0)
    assert(r.getAs[Long]("n") == 8L)
    // replicate the per-row float ops exactly (floors are part of the
    // contract, not noise)
    def t7(x: Double) = math.floor(x * 1e7) / 1e7
    val sq = rows.map { case (s, y) =>
      BigDecimal(t7((s - (if (y) 1 else 0)) * (s - (if (y) 1 else 0)))) }.sum
    val expBrier = math.floor(sq.toDouble / 8 * 1e4) / 1e4
    assert(r.getAs[Double]("brier") == expBrier, s"${r.getAs[Double]("brier")} vs $expBrier")
    // (0.2-as-double − 0.25)² lands a hair BELOW 0.0025, so the 7-dp
    // floor truncates bin 0's term down — the contract is the op
    // sequence, not decimal niceness (the q_calibration precedent)
    assert(r.getAs[Double]("reliability") == 0.0024)
    assert(r.getAs[Double]("resolution") == 0.0625)
    assert(r.getAs[Double]("uncertainty") == 0.25)
    // Murphy identity (exact for bin-constant forecasts, up to floors):
    // brier ≈ rel − res + unc
    val ident = r.getAs[Double]("reliability") - r.getAs[Double]("resolution") +
      r.getAs[Double]("uncertainty")
    assert(math.abs(ident - r.getAs[Double]("brier")) < 2e-4, s"$ident")
    // degenerate: constant perfect forecasts — everything 0 except n
    val perfect = Seq((1.0, true), (1.0, true), (0.0, false)).toDF("s", "y")
    val rp = Stats.brierDecomposition(perfect, col("s"), col("y"), nBins = 2)
      .collect()(0)
    assert(rp.getAs[Double]("brier") == 0.0 && rp.getAs[Double]("reliability") == 0.0)
  }

  test("bootstrapLift: planted shift detected with a positive CI, determinism, exact point means") {
    import spark.implicits._
    // treatment = control + 10 exactly: lift 10, every resample diff
    // near 10, so the CI must sit strictly above zero
    val df = (0 until 200).map { i =>
      val v = (i % 17).toDouble
      if (i % 2 == 0) (true, i.toLong, v + 10.0) else (false, i.toLong, v) }
      .toDF("t", "id", "v")
    def run() = Stats.bootstrapLift(df, col("t"), col("id"), col("v"), b = 100)
      .collect()(0)
    val r = run()
    assert(r.toSeq == run().toSeq, "bootstrap lift must be RNG-free")
    assert(r.getAs[Long]("n_treat") == 100L && r.getAs[Long]("n_control") == 100L)
    // both arms hold the same multiset of (i % 17) values, shifted
    val base = (0 until 200).filter(_ % 2 == 1).map(_ % 17)
    val mc = BigDecimal(base.sum.toDouble / base.size)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val treatVals = (0 until 200).filter(_ % 2 == 0).map(i => (i % 17) + 10)
    val mt = BigDecimal(treatVals.sum.toDouble / treatVals.size)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("mean_control") == mc)
    assert(r.getAs[Double]("mean_treat") == mt)
    assert(r.getAs[Double]("ci_lo") > 5.0 && r.getAs[Double]("ci_hi") < 15.0,
      s"CI ${r.getAs[Double]("ci_lo")}..${r.getAs[Double]("ci_hi")} should bracket ~10")
    assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("ci_hi"))
    assert(r.getAs[Double]("p_positive") == 1.0)
    assert(r.getAs[Long]("n_resamples") == 100L)
  }

  test("transitionMatrix: hand-computed counts, per-user ordering, same-ts tiebreak") {
    import spark.implicits._
    // u1: A->B->A->C; u2: B->B; u3: two same-ts events ordered by id
    val ev = Seq(
      (1L, 1L, 10L, "A"), (1L, 2L, 20L, "B"), (1L, 3L, 30L, "A"), (1L, 4L, 40L, "C"),
      (2L, 5L, 10L, "B"), (2L, 6L, 20L, "B"),
      (3L, 7L, 50L, "X"), (3L, 8L, 50L, "Y"))
      .toDF("u", "eid", "t", "et")
    val r = Behavior.transitionMatrix(ev, col("u"), col("t"), col("et"),
        tiebreak = col("eid"))
      .orderBy("from_event", "to_event")
      .as[(String, String, Long, Double)].collect()
    assert(r.toSeq == Seq(
      ("A", "B", 1L, 0.5), ("A", "C", 1L, 0.5),
      ("B", "A", 1L, 0.5), ("B", "B", 1L, 0.5),
      ("X", "Y", 1L, 1.0)))
    // no cross-user transition leaked: u2's last B never pairs with
    // u3's X (would appear as B->X)
    assert(!r.exists(t => t._1 == "B" && t._2 == "X"))
  }

  test("isotonicCalibration: hand-computed PAV pooling, cascade, equal rates, range guard") {
    import spark.implicits._
    def rows(spec: (Double, Int, Int)*): Seq[(Double, Boolean)] =
      spec.flatMap { case (s, pos, neg) =>
        Seq.fill(pos)((s, true)) ++ Seq.fill(neg)((s, false)) }
    // buckets (width 1/4): rates 0.25, 0.75, 0.25, 1.0 — buckets 1+2
    // violate and pool to 0.5; 0 and 3 stand alone
    val df = rows((0.1, 1, 3), (0.3, 3, 1), (0.6, 1, 3), (0.9, 2, 0)).toDF("s", "y")
    val r = Stats.isotonicCalibration(df, col("s"), col("y"), buckets = 4)
      .orderBy("bucket")
      .select("bucket", "score_lo", "n", "n_pos", "pool_start", "pool_n",
        "pool_pos", "calibrated")
      .as[(Int, Double, Long, Long, Int, Long, Long, Double)].collect()
    assert(r.toSeq == Seq(
      (0, 0.0, 4L, 1L, 0, 4L, 1L, 0.25),
      (1, 0.25, 4L, 3L, 1, 8L, 4L, 0.5),
      (2, 0.5, 4L, 1L, 1, 8L, 4L, 0.5),
      (3, 0.75, 2L, 2L, 3, 2L, 2L, 1.0)))
    // full cascade: strictly decreasing rates pool into ONE pool
    val casc = rows((0.1, 2, 0), (0.3, 1, 1), (0.6, 0, 2)).toDF("s", "y")
    val rc = Stats.isotonicCalibration(casc, col("s"), col("y"), buckets = 4)
      .select("pool_start", "calibrated").distinct()
      .as[(Int, Double)].collect()
    assert(rc.toSeq == Seq((0, 0.5)), s"cascade: ${rc.toSeq}")
    // EQUAL adjacent rates stay separate pools (strict-violation form)
    val eq = rows((0.1, 1, 1), (0.3, 2, 2)).toDF("s", "y")
    val re = Stats.isotonicCalibration(eq, col("s"), col("y"), buckets = 4)
      .orderBy("bucket").select("bucket", "pool_start", "calibrated")
      .as[(Int, Int, Double)].collect()
    assert(re.toSeq == Seq((0, 0, 0.5), (1, 1, 0.5)))
    // out-of-range / NULL scores are excluded; score 1.0 lands in the
    // top bucket (clamped, not dropped)
    val guard = Seq((1.5, true), (-0.2, true), (1.0, true), (0.99, false))
      .toDF("s", "y")
    val rg = Stats.isotonicCalibration(guard, col("s"), col("y"), buckets = 4)
      .select("bucket", "n", "n_pos").as[(Int, Long, Long)].collect()
    assert(rg.toSeq == Seq((3, 2L, 1L)))
    // NULL labels are EXCLUDED, not counted as negatives (the
    // calibration/brierDecomposition contract): with three NULL-label
    // rows in the same bucket, n and the pooled rate must match the
    // two-labeled-row frame exactly
    val withNulls = Seq((0.1, java.lang.Boolean.TRUE),
      (0.1, java.lang.Boolean.FALSE), (0.1, null: java.lang.Boolean),
      (0.1, null: java.lang.Boolean), (0.1, null: java.lang.Boolean))
      .toDF("s", "y")
    val rn = Stats.isotonicCalibration(withNulls, col("s"), col("y"), buckets = 4)
      .select("bucket", "n", "n_pos", "calibrated")
      .as[(Int, Long, Long, Double)].collect()
    assert(rn.toSeq == Seq((0, 2L, 1L, 0.5)),
      s"NULL labels must be excluded, not counted as negatives: ${rn.toSeq}")
    // monotonicity property on a noisy synthetic slope
    val noisy = (0 until 400).map { i =>
      val s = (i % 101) / 100.0
      (s, ((i * 53 + 11) % 100) < s * 70 + 15) }.toDF("s", "y")
    val cal = Stats.isotonicCalibration(noisy, col("s"), col("y"), buckets = 20)
      .orderBy("bucket").select("calibrated").as[Double].collect()
    assert(cal.zip(cal.tail).forall { case (a, b) => a <= b },
      s"not monotone: ${cal.toSeq}")
  }

  test("quantileCI: hand-computed rank bracket, clamping, ties") {
    import graft.operators.Stats
    // n=25: nq=12.5, se=1.96·2.5=4.9 → ranks lo=7, pt=13, hi=19
    val d = (1 to 25).map(i => ("a", i.toDouble)).toDF("g", "v")
    val r = Stats.quantileCI(d, col("g"), col("v")).collect()(0)
    assert(r.getAs[Long]("rank_lo") == 7L && r.getAs[Long]("rank_hi") == 19L)
    assert(r.getAs[Double]("point") == 13.0)
    assert(r.getAs[Double]("ci_lo") == 7.0 && r.getAs[Double]("ci_hi") == 19.0)

    // n=2: lo clamps to 1, hi clamps to n
    val tiny = Seq(("a", 10.0), ("a", 20.0)).toDF("g", "v")
    val t = Stats.quantileCI(tiny, col("g"), col("v")).collect()(0)
    assert(t.getAs[Double]("point") == 10.0)
    assert(t.getAs[Double]("ci_lo") == 10.0 && t.getAs[Double]("ci_hi") == 20.0)

    // all-equal values: every endpoint is that value
    val ties = Seq.fill(9)(("a", 3.5)).toDF("g", "v")
    val e = Stats.quantileCI(ties, col("g"), col("v")).collect()(0)
    assert(e.getAs[Double]("ci_lo") == 3.5 && e.getAs[Double]("ci_hi") == 3.5)
    assert(e.getAs[Double]("point") == 3.5)
  }

  test("srmCheck: balanced passes, skew flags, undeclared arm flags, empty degenerates") {
    import graft.operators.Stats
    val even = (Seq.fill(50)("a") ++ Seq.fill(50)("b")).toDF("arm")
    val ok = Stats.srmCheck(even, col("arm"), Seq("a" -> 0.5, "b" -> 0.5))
      .collect()
    assert(ok.forall(!_.getAs[Boolean]("srm_flagged")))
    assert(ok.forall(_.getAs[Double]("chi2") == 0.0))
    assert(ok.head.getAs[Double]("n_expected") == 50.0)

    // 90/10 on a declared 50/50: terms (40)²/50 = 32 each → chi2 64
    val skew = (Seq.fill(90)("a") ++ Seq.fill(10)("b")).toDF("arm")
    val bad = Stats.srmCheck(skew, col("arm"), Seq("a" -> 0.5, "b" -> 0.5))
      .collect()
    assert(bad.forall(_.getAs[Boolean]("srm_flagged")))
    assert(bad.head.getAs[Double]("chi2") == 64.0)
    assert(bad.head.getAs[Double]("chi2_term") == 32.0)

    // balanced declared arms + traffic in an arm the design ignores
    val ghost = (Seq.fill(50)("a") ++ Seq.fill(50)("b") ++ Seq.fill(5)("x"))
      .toDF("arm")
    val g = Stats.srmCheck(ghost, col("arm"), Seq("a" -> 0.5, "b" -> 0.5))
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(g.size == 3)
    assert(g("x").isNullAt(g("x").fieldIndex("frac_expected")))
    assert(g.values.forall(_.getAs[Boolean]("srm_flagged")))
    assert(g("a").getAs[Double]("chi2") == 0.0) // the χ² itself is clean

    val empty = Seq.empty[String].toDF("arm")
    val e = Stats.srmCheck(empty, col("arm"), Seq("a" -> 0.5, "b" -> 0.5))
      .collect()
    assert(e.forall(_.getAs[Boolean]("degenerate")))
    assert(e.forall(!_.getAs[Boolean]("srm_flagged")))

    intercept[IllegalArgumentException] {
      Stats.srmCheck(even, col("arm"), Seq("a" -> 0.7, "b" -> 0.7))
    }
  }

  test("cuped: perfectly linear covariate eliminates variance; hand-exact theta") {
    // y = 2x globally → pooled θ = 2, x̄ = 3; group A (x=1,2,3),
    // B (x=4,5): adjusted means both equal 6, adjusted variances 0,
    // reduction exactly 1.
    val df = Seq(
      ("A", 2.0, 1.0), ("A", 4.0, 2.0), ("A", 6.0, 3.0),
      ("B", 8.0, 4.0), ("B", 10.0, 5.0)
    ).toDF("g", "y", "x")
    val out = graft.operators.Stats.cuped(df, col("g"), col("y"), col("x"))
      .orderBy("grp").collect()
    val a = out(0); val b = out(1)
    assert(a.getAs[Double]("theta") == 2.0)
    assert(a.getAs[Double]("mean_raw") == 4.0 && a.getAs[Double]("mean_adj") == 6.0)
    assert(a.getAs[Double]("var_raw") == 4.0 && a.getAs[Double]("var_adj") == 0.0)
    assert(a.getAs[Double]("var_reduction") == 1.0)
    assert(b.getAs[Double]("mean_raw") == 9.0 && b.getAs[Double]("mean_adj") == 6.0)
    assert(b.getAs[Double]("var_adj") == 0.0)
    assert(!a.getAs[Boolean]("degenerate"))
  }

  test("cuped: constant covariate degenerates to theta 0, report equals raw") {
    val df = Seq(("A", 1.0, 5.0), ("A", 3.0, 5.0), ("B", 2.0, 5.0),
      ("B", 4.0, 5.0)).toDF("g", "y", "x")
    val out = graft.operators.Stats.cuped(df, col("g"), col("y"), col("x"))
      .orderBy("grp").collect()
    assert(out.forall(_.getAs[Boolean]("degenerate")))
    assert(out.forall(r => r.getAs[Double]("theta") == 0.0))
    assert(out.forall(r =>
      r.getAs[Double]("mean_adj") == r.getAs[Double]("mean_raw")))
    assert(out.forall(r =>
      r.getAs[Double]("var_adj") == r.getAs[Double]("var_raw")))
  }
}
