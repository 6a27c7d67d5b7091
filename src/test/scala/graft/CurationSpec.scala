package graft

import org.apache.spark.sql.functions._

import graft.operators.{Packing, Sampling}

/** API invariants for the curation operators; exact value agreement is
  * covered by the DuckDB oracles (q_sample_split, q_pack_sequences,
  * q_tfidf_topterms).
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("splitAssign labels every row into contiguous deterministic splits") {
    val df = spark.range(10000).toDF("id")
    val out = Sampling.splitAssign(df, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).cache()
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 10000)
    // deterministic: same assignment on re-run
    val again = Sampling.splitAssign(df, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(out.join(again.withColumnRenamed("split", "split2"), "id")
      .filter($"split" =!= $"split2").count() == 0)
    // roughly proportional (multiplicative-hash striding over 1000
    // buckets is near-uniform on sequential keys)
    assert(counts("train") > 7000 && counts("train") < 9000, counts.toString)
  }

  test("hashSample keeps a stable subset of about the requested fraction") {
    val df = spark.range(10000).toDF("id")
    val s1 = Sampling.hashSample(df, col("id"), 0.1).as[Long].collect().toSet
    val s2 = Sampling.hashSample(df, col("id"), 0.1).as[Long].collect().toSet
    assert(s1 == s2, "sample is not deterministic")
    assert(s1.size > 700 && s1.size < 1300, s"10% of 10k -> got ${s1.size}")
    // nested property: a 5% sample is a subset of the 10% sample
    val s3 = Sampling.hashSample(df, col("id"), 0.05).as[Long].collect().toSet
    assert(s3.subsetOf(s1), "samples are not nested")
  }

  test("stratifiedSample takes an exact nested quota from every group") {
    val df = spark.range(3000).select(
      col("id"), concat(lit("g"), pmod(col("id"), lit(7))).as("g"))
    val s25 = Sampling.stratifiedSample(df, col("g"), col("id"), 0.25)
      .as[(Long, String)].collect()
    val sizes = df.groupBy("g").count().as[(String, Long)].collect().toMap
    val got = s25.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    sizes.foreach { case (g, n) =>
      assert(got(g) == math.ceil(0.25 * n).toLong, s"group $g: ${got(g)} of $n")
    }
    // nested: the 5% stratified sample is a subset of the 25% one
    val s05 = Sampling.stratifiedSample(df, col("g"), col("id"), 0.05)
      .as[(Long, String)].collect().map(_._1).toSet
    assert(s05.subsetOf(s25.map(_._1).toSet), "stratified samples are not nested")
  }

  test("stratifiedSample two-phase selection IS the rank selection (r16 scale shape)") {
    // the bucket-threshold form must pick the IDENTICAL row set as the
    // straightforward rank-window form it replaced — verified against
    // an in-test rank replay on a skewed fixture (one whale stratum,
    // one tiny one, fractions landing mid-bucket both sides)
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(5000).select(
      col("id"),
      when(pmod(col("id"), lit(50)) === 0, "tiny").otherwise("whale").as("g"))
    for (f <- Seq(0.25, 0.031, 1.0)) {
      val got = Sampling.stratifiedSample(df, col("g"), col("id"), f)
        .as[(Long, String)].collect().map(_._1).toSet
      val w = Window.partitionBy("g")
      val expected = df
        .withColumn("__rk", row_number().over(
          w.orderBy(Sampling.hashBucket(col("id")).asc, col("id").asc)))
        .withColumn("__n", count(lit(1)).over(w))
        .filter(col("__rk") <= ceil(lit(f) * col("__n")))
        .as[(Long, String, Int, Long)].collect().map(_._1).toSet
      assert(got == expected,
        s"f=$f: two-phase and rank selections differ by ${(got diff expected) ++ (expected diff got)}")
    }
    // fraction 0 keeps nothing
    assert(Sampling.stratifiedSample(df, col("g"), col("id"), 0.0).count() == 0L)
  }

  test("capPerGroup keeps exactly the cap per big group, whole small groups, nested") {
    // 4 groups: g0..g2 have 300 rows each, g3 has 40 (under every cap)
    val df = spark.range(940).select(
      col("id"),
      when(col("id") < 900, concat(lit("g"), col("id") % 3))
        .otherwise(lit("g3")).as("g"))
    val c100 = Sampling.capPerGroup(df, col("g"), col("id"), maxRows = 100)
      .as[(Long, String)].collect()
    val got = c100.groupBy(_._2).view.mapValues(_.length).toMap
    assert(got == Map("g0" -> 100, "g1" -> 100, "g2" -> 100, "g3" -> 40), got.toString)
    // the selection is exactly the naive rule: top-100 by (bucket, key)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy(Sampling.hashBucket(col("id")).asc, col("id").asc)
    val naive = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 100).select("id").as[Long].collect().toSet
    assert(c100.map(_._1).toSet == naive, "two-phase cap != naive top-N rule")
    // nested: the cap-30 selection is a subset of the cap-100 one
    val c30 = Sampling.capPerGroup(df, col("g"), col("id"), maxRows = 30)
      .as[(Long, String)].collect().map(_._1).toSet
    assert(c30.subsetOf(c100.map(_._1).toSet), "caps are not nested")
    assert(c30.size == 4 * 30, s"cap 30 bites all four groups: ${c30.size}")
  }

  test("capPerGroup caps the NULL group and excludes null keys from quota") {
    val df = spark.range(300).select(
      when(col("id") < 200, lit(null).cast("string")).otherwise(lit("g"))
        .as("g"),
      when(col("id") === 299, lit(null).cast("long")).otherwise(col("id"))
        .as("id"))
    val out = Sampling.capPerGroup(df, col("g"), col("id"), maxRows = 50)
      .as[(String, Option[Long])].collect()
    val byG = out.groupBy(_._1).view.mapValues(_.length).toMap
    // null group (200 rows) capped at 50; 'g' group has 100 rows minus
    // the one null-key row = 99 → capped at 50; null keys never appear
    assert(byG == Map((null: String) -> 50, "g" -> 50), byG.toString)
    assert(out.forall(_._2.nonEmpty), "null-key rows must be excluded")
  }

  test("contamination scores probe members 1.0 and disjoint docs 0.0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine"),
      // doc 3 shares its first 8 words with doc 1 (= probe)
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    val probes = docs.filter($"doc_id" === 1L)
    val full = graft.operators.Dedup.contamination(
        docs, col("doc_id"), col("text"), probes, col("text"), n = 5)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(full(1L)._4 == 1.0, s"probe doc not fully contaminated: ${full(1L)}")
    assert(full(2L)._4 == 0.0, s"disjoint doc contaminated: ${full(2L)}")
    // doc 3: 6 shingles, 4 of them inside the shared 8-word prefix
    assert(full(3L)._2 == 6L && full(3L)._3 == 4L, full(3L).toString)
  }

  test("contaminationBloom is row-identical to exact contamination on real documents") {
    val d = sources.Tables.load(spark, sf, "documents").select(col("doc_id"), col("text"))
    val probes = Sampling.hashSample(d, col("doc_id"), 0.08)
    val exact = graft.operators.Dedup.contamination(
        d, col("doc_id"), col("text"), probes, col("text"), n = 5)
      .as[(Long, Long, Long, Double)].collect().toSet
    val bloom = graft.operators.Dedup.contaminationBloom(
        d, col("doc_id"), col("text"), probes, col("text"), n = 5)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty && bloom == exact,
      s"bloom/exact diverge: ${(bloom -- exact).take(3)} vs ${(exact -- bloom).take(3)}")
  }

  test("BloomMightContain: no false negatives, bounded false positives, codegen-evaluated") {
    import org.apache.spark.util.sketch.BloomFilter
    val bf = BloomFilter.create(1000, 0.01)
    (0L until 1000L).foreach(i => bf.putLong(i * 7919L))
    val keys = spark.range(20000).select((col("id") - 10000L).as("k"))
    val hits = keys.filter(graft.functions.BloomMightContain.mightContain(col("k") * 7919L, bf))
      .as[Long].collect().toSet
    val members = (0L until 1000L).toSet
    assert(members.subsetOf(hits), "bloom dropped a true member (false negative)")
    assert(hits.size - members.size < 400,
      s"fp count ${hits.size - members.size} far above 1% of 19000 trials")
  }

  test("hashBucket is defined on the full long range (ANSI-safe) incl. negatives") {
    // the docstring recommends pre-hashing adversarial keys with
    // xxhash64 — full-range longs; the mod-first form must neither
    // overflow (ANSI ArithmeticException) nor go negative
    val out = spark.range(5000)
      .select(Sampling.hashBucket(xxhash64(col("id"))).as("b"))
      .agg(min("b"), max("b")).as[(Long, Long)].head()
    assert(out._1 >= 0 && out._2 < 1000, s"bucket range violated: $out")
    // extreme and negative keys
    val edge = Seq(Long.MaxValue, Long.MinValue + 1, -1L, 0L).toDF("k")
      .select(Sampling.hashBucket(col("k")).as("b")).as[Long].collect()
    assert(edge.forall(b => b >= 0 && b < 1000), s"edge buckets: ${edge.toSeq}")
  }

  test("temperatureMixture tilts keep-rates toward the tail group and nests across targets") {
    // 900/100 skew, alpha=0.5: w = (30, 10), rates = T·w/40/n →
    // at T=200: big 200·30/40/900 = 16.6%, small 200·10/40/100 = 50%
    val df = spark.range(1000).select(col("id"),
      when(col("id") < 900, "big").otherwise("small").as("grp"))
    val out = Sampling.temperatureMixture(df, col("grp"), col("id"), targetRows = 200)
    val by = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rBig = by("big") / 900.0
    val rSmall = by("small") / 100.0
    assert(rSmall > 2 * rBig, s"tail group must be upsampled: big=$rBig small=$rSmall")
    assert(math.abs(rBig - 0.1666) < 0.05 && math.abs(rSmall - 0.5) < 0.1,
      s"realized rates near analytic ones: big=$rBig small=$rSmall")
    val total = by.values.sum
    assert(math.abs(total - 200L) <= 30, s"total near target: $total")
    // alpha = 1 is natural sampling: both groups keep ~T/N = 20%
    val nat = Sampling.temperatureMixture(df, col("grp"), col("id"),
        targetRows = 200, alpha = 1.0)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(nat("big") / 900.0 - 0.2) < 0.05 &&
      math.abs(nat("small") / 100.0 - 0.2) < 0.1,
      s"alpha=1 must reproduce natural proportions: $nat")
    // nesting: a smaller target selects a subset of a larger one
    val small = Sampling.temperatureMixture(df, col("grp"), col("id"), targetRows = 100)
      .select("id").as[Long].collect().toSet
    val big = out.select("id").as[Long].collect().toSet
    assert(small.subsetOf(big), "raising targetRows must never evict a row")
  }

  test("mixtureSample applies per-group rates, a default, and nests across rates") {
    val df = spark.range(20000).select(
      col("id"),
      concat(lit("s"), pmod(col("id"), lit(4))).as("src"))
    val rates = Seq("s0" -> 1.0, "s1" -> 0.5, "s2" -> 0.1)
    val out = Sampling.mixtureSample(df, col("src"), col("id"), rates,
      defaultRate = 0.02).cache()
    val counts = out.groupBy("src").count().as[(String, Long)].collect().toMap
    // s0 keeps everything; others land near rate × 5000 (hash buckets
    // are uniform but not exact per group)
    assert(counts("s0") == 5000)
    assert(math.abs(counts("s1") - 2500) < 250, s"s1: ${counts("s1")}")
    assert(math.abs(counts("s2") - 500) < 120, s"s2: ${counts("s2")}")
    assert(math.abs(counts.getOrElse("s3", 0L) - 100) < 60, s"s3 default: ${counts.get("s3")}")
    // nested: shrinking a rate keeps a subset of the previous sample —
    // re-weighting a mixture never churns already-selected rows
    val shrunk = Sampling.mixtureSample(df, col("src"), col("id"),
      Seq("s0" -> 1.0, "s1" -> 0.2, "s2" -> 0.1), defaultRate = 0.02)
    val bigS1 = out.filter(col("src") === "s1").select("id").as[Long].collect().toSet
    val smallS1 = shrunk.filter(col("src") === "s1").select("id").as[Long].collect().toSet
    assert(smallS1.subsetOf(bigS1) && smallS1.nonEmpty)
    // deterministic: a re-run selects the identical rows
    val rerun = Sampling.mixtureSample(df, col("src"), col("id"), rates,
      defaultRate = 0.02)
    assert(rerun.select("id").as[Long].collect().toSet ==
      out.select("id").as[Long].collect().toSet)
  }

  test("mixtureToBudget: in-plan rates hit the budget shares, clamp, whitelist, and nest") {
    import graft.operators.Sampling
    // srcA: 10 rows × 10 tokens = 100; srcB same; srcC unlisted
    val rows = for (src <- Seq("srcA", "srcB", "srcC"); i <- 0 until 10)
      yield (src.hashCode.toLong * 100 + i, src, 10L)
    val df = rows.toDF("id", "source", "n_toks")
    // budget 50, w(A)=1.0 → rate 0.5 → cut 500; w(B)=0 → cut 0; C dropped
    val out = Sampling.mixtureToBudget(df, $"source", $"id", $"n_toks",
      Seq("srcA" -> 1.0, "srcB" -> 0.0), budgetTokens = 50L)
    val bySrc = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(!bySrc.contains("srcB") && !bySrc.contains("srcC"))
    val kept = bySrc.getOrElse("srcA", 0L)
    // exactly the rows whose bucket < 500 — deterministic, roughly half
    val expected = df.filter($"source" === "srcA")
      .filter(Sampling.hashBucket($"id") < 500).count()
    assert(kept == expected && kept > 0)
    // clamp: budget ≥ total mass keeps EVERY row of the listed source
    val all = Sampling.mixtureToBudget(df, $"source", $"id", $"n_toks",
      Seq("srcA" -> 1.0), budgetTokens = 1000L)
    assert(all.count() == 10)
    // nesting: shrinking the budget never adds rows, only removes
    val small = Sampling.mixtureToBudget(df, $"source", $"id", $"n_toks",
      Seq("srcA" -> 1.0), budgetTokens = 20L)
      .select("id").as[Long].collect().toSet
    val big = out.filter($"source" === "srcA").select("id").as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("binPackFFD: exact FFD placement, capacity respected, oversize quarantined") {
    // budget 10, lengths 6,5,4,3,2 -> FFD: bin0=[6,4], bin1=[5,3,2]
    val docs = Seq((1L, 6L), (2L, 5L), (3L, 4L), (4L, 3L), (5L, 2L), (6L, 15L))
      .toDF("doc_id", "n")
      .withColumn("shard", lit("s"))
    val out = Packing.binPackFFD(docs, col("shard"), col("doc_id"), col("n"), budget = 10L)
      .select("id", "bin_id", "oversize")
      .as[(Long, Long, Boolean)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // doc6 (len 15) is placed FIRST (longest) into bin 0, flagged
    // oversize; nothing else can ever join its negative-capacity bin
    assert(out(6L) == ((0L, true)))
    assert(out(1L) == ((1L, false)) && out(3L) == ((1L, false)), s"got $out")
    assert(out(2L) == ((2L, false)) && out(4L) == ((2L, false)) && out(5L) == ((2L, false)))
    // capacity check: no non-oversize bin exceeds the budget
    val fill = out.toSeq.filterNot(_._2._2).groupBy(_._2._1)
      .map { case (b, ds) => b -> ds.map(d => Map(1L -> 6L, 2L -> 5L, 3L -> 4L, 4L -> 3L, 5L -> 2L)(d._1)).sum }
    assert(fill.values.forall(_ <= 10L), s"bin overflow: $fill")
  }

  test("binPackFFD: shards pack independently; every doc appears exactly once") {
    val docs = spark.range(500).select(
      col("id").as("doc_id"),
      pmod(col("id"), lit(4)).cast("string").as("shard"),
      (pmod(col("id") * 37, lit(300)) + 1).as("n"))
    val out = Packing.binPackFFD(docs, col("shard"), col("doc_id"), col("n"), budget = 512L)
      .select("shard", "id", "n_tokens", "bin_id")
      .as[(String, Long, Long, Long)].collect()
    assert(out.length == 500 && out.map(_._2).distinct.length == 500)
    // per (shard, bin): total <= budget
    out.groupBy(t => (t._1, t._4)).foreach { case (k, rows) =>
      assert(rows.map(_._3).sum <= 512L, s"bin $k over budget")
    }
    // FFD efficiency: bins used <= 11/9 * lower bound + 1 per shard
    out.groupBy(_._1).foreach { case (sh, rows) =>
      val lower = math.ceil(rows.map(_._3).sum / 512.0)
      val used = rows.map(_._4).distinct.length
      assert(used <= math.ceil(11.0 / 9.0 * lower) + 1, s"shard $sh: $used bins vs lb $lower")
    }
  }

  test("packSequences: offsets stay under budget and sequences are contiguous per shard") {
    val docs = spark.range(1000).select(
      col("id").as("doc_id"),
      pmod(col("id"), lit(4)).as("shard"),
      (pmod(col("id") * 37, lit(300)) + 1).as("n_toks"))
    val out = Packing.packSequences(docs, col("shard"), Seq(col("doc_id")),
      col("n_toks"), budget = 512)
      .select("doc_id", "shard", "n_toks", "seq_id", "tok_offset")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.length == 1000)
    assert(out.forall(_._5 < 512), "tok_offset must be < budget")
    // within a shard, seq_id is non-decreasing in doc order and the
    // exclusive cumulative sum reconstructs offsets exactly
    out.groupBy(_._2).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      var cum = 0L
      sorted.foreach { case (_, _, n, seq, off) =>
        assert(seq == cum / 512 && off == cum % 512)
        cum += n
      }
    }
  }

  test("lengthBucketBatches: desc-length grouping, id tiebreak, shard isolation") {
    // shard A tokens by id: 1→100, 2→10, 3→90, 4→5, 5→80; sorted desc
    // → batches {100,90} {80,10} {5}: total padding 10+70+0 = 80 (the
    // arrival-order grouping would waste 175). shard B: one doc.
    val d = Seq(
      ("A", 1L, 100L), ("A", 2L, 10L), ("A", 3L, 90L),
      ("A", 4L, 5L), ("A", 5L, 80L),
      ("B", 9L, 7L)
    ).toDF("sh", "id", "nt")
    val out = Packing.lengthBucketBatches(d, col("sh"), col("id"), col("nt"), 2)
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(out(("A", 1L)) == 0L && out(("A", 3L)) == 0L)
    assert(out(("A", 5L)) == 1L && out(("A", 2L)) == 1L)
    assert(out(("A", 4L)) == 2L)
    assert(out(("B", 9L)) == 0L)
    // equal lengths: id asc pins the order
    val ties = Seq(("A", 1L, 50L), ("A", 2L, 50L), ("A", 3L, 50L))
      .toDF("sh", "id", "nt")
    val t = Packing.lengthBucketBatches(ties, col("sh"), col("id"), col("nt"), 2)
      .as[(String, Long, Long, Long)].collect().map(r => r._2 -> r._4).toMap
    assert(t(1L) == 0L && t(2L) == 0L && t(3L) == 1L)
  }

  test("packBySimilarity: related docs pack adjacently per cluster, clusters independent") {
    // two tight 2-d clusters around (0,0) and (10,10); fixed centroids
    // so assignment is exact. Cluster 0: ids 1,2,3 tokens 300 each →
    // seq 0,0,1 offsets 0,300,88 under budget 512; cluster 1: ids
    // 11,12 tokens 500,100 → seq 0,0 offsets 0,500... 500 >= 512? no:
    // cum=500 < 512 → seq 0 offset 500. Restarting at 0 proves
    // cluster-local packing.
    val docs = Seq(
      (1L, Seq(0.0, 0.1), 300L), (2L, Seq(0.1, 0.0), 300L),
      (3L, Seq(0.0, 0.0), 300L),
      (11L, Seq(10.0, 10.1), 500L), (12L, Seq(10.1, 10.0), 100L)
    ).toDF("id", "v", "n_toks")
    val cents = Array(Array(0.0, 0.0), Array(10.0, 10.0))
    val out = Packing.packBySimilarity(docs, col("id"), col("v"),
        col("n_toks"), cents, budget = 512)
      .select("id", "cluster", "seq_id", "tok_offset")
      .as[(Long, Int, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 0 && out(11L)._2 == 1)
    assert(out(1L)._3 == 0L && out(1L)._4 == 0L)
    assert(out(2L)._3 == 0L && out(2L)._4 == 300L)
    assert(out(3L)._3 == 1L && out(3L)._4 == 88L)
    // cluster 1 restarts its own sequence ids at 0
    assert(out(11L)._3 == 0L && out(11L)._4 == 0L)
    assert(out(12L)._3 == 0L && out(12L)._4 == 500L)
  }

  test("curriculumOrder: stages partition by difficulty, positions follow stage order") {
    // difficulties 1..90: stage 1 = 1..30, 2 = 31..60, 3 = 61..90
    val d = (1L to 90L).map(i => (i, i % 3, i.toDouble)).toDF("id", "shard", "diff")
    val out = Sampling.curriculumOrder(d, col("id"), col("diff"), col("shard"), nStages = 3)
      .select(col("id"), col("shard"), col("stage"), col("train_pos"))
      .as[(Long, Long, Int, Long)].collect()
    val stageOf = out.map(r => r._1 -> r._3).toMap
    assert((1L to 30L).forall(stageOf(_) == 1))
    assert((31L to 60L).forall(stageOf(_) == 2))
    assert((61L to 90L).forall(stageOf(_) == 3))
    // within each shard: positions dense from 1, stage non-decreasing
    out.groupBy(_._2).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._4)
      assert(ordered.map(_._4).toSeq == (1L to rows.length).toSeq)
      assert(ordered.map(_._3).toSeq == ordered.map(_._3).sorted.toSeq,
        "positions do not respect stage order")
    }
    // within a stage, order is scrambled (not plain id order)
    val s1 = out.filter(r => r._2 == 0 && r._3 == 1).sortBy(_._4).map(_._1)
    assert(s1.length > 5 && s1.toSeq != s1.sorted.toSeq)
  }

  test("shuffleShards: deterministic, dense per-shard positions, balanced, decorrelated") {
    val df = (0L until 1000L).map(i => (i, s"d$i")).toDF("id", "payload")
    val a = Sampling.shuffleShards(df, col("id"), nShards = 8)
      .select(col("id"), col("shard"), col("position"))
      .as[(Long, Int, Long)].collect()
    val b = Sampling.shuffleShards(df, col("id"), nShards = 8)
      .select(col("id"), col("shard"), col("position"))
      .as[(Long, Int, Long)].collect()
    assert(a.toSet == b.toSet, "not deterministic")
    // positions dense 1..n within each shard
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // sequential ids spread over ALL shards, roughly evenly (the
    // mult2 ≡ -20 regression planted 1000 ids into 3 shards)
    val sizes = a.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet == (0 until 8).toSet, s"shards hit: ${sizes.keySet}")
    assert(sizes.values.forall(n => n > 80 && n < 170), s"imbalanced: $sizes")
    // shard order is not id order: within a shard, consecutive
    // positions are not consecutive ids
    val shard0 = a.filter(_._2 == 0).sortBy(_._3).map(_._1)
    assert(shard0.sliding(2).count(p => p(1) == p(0) + 8) < shard0.length / 4)
  }

  test("epochPlan: hand-computed targets, cap, and deficit") {
    // A: 10 docs x 10 tokens = 100; B: same. budget 300, w = .9/.1,
    // maxEpochs 2: A target 270 -> capped at 2.0 epochs, planned 200,
    // deficit 70; B target 30 -> 0.3 epochs, planned 30, no deficit
    val d = ((0 until 10).map(i => (s"a$i", "A", 10L)) ++
      (0 until 10).map(i => (s"b$i", "B", 10L))).toDF("id", "src", "tok")
    val plan = Sampling.epochPlan(d, col("src"), col("tok"),
        Seq("A" -> 0.9, "B" -> 0.1), budgetTokens = 300L, maxEpochs = 2.0)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(plan.length == 2)
    assert(plan(0) == (("A", 100L, 270L, 2.0, 200L, 70L, true)))
    assert(plan(1) == (("B", 100L, 30L, 0.3, 30L, 0L, false)))
    // unlisted source drops; zero-mass source drops
    val d2 = d.unionByName(Seq(("c0", "C", 5L)).toDF("id", "src", "tok"))
    assert(Sampling.epochPlan(d2, col("src"), col("tok"),
      Seq("A" -> 1.0), 300L).count() == 1L)
  }

  test("epochize: full copies + deterministic fractional extras, nested under budget") {
    val d = ((0L until 10L).map(i => (i, "A", 10L)) ++
      (10L until 20L).map(i => (i, "B", 10L))).toDF("id", "src", "tok")
    // A at 2.0 epochs exactly: every A row twice, epochs 1 and 2
    val out = Sampling.epochize(d, col("src"), col("id"), col("tok"),
        Seq("A" -> 0.9, "B" -> 0.1), budgetTokens = 300L, maxEpochs = 2.0)
      .select(col("id"), col("src"), col("epoch"))
      .as[(Long, String, Int)].collect()
    val aRows = out.filter(_._2 == "A")
    assert(aRows.length == 20)
    assert((0L until 10L).forall(i =>
      aRows.filter(_._1 == i).map(_._3).sorted.toSeq == Seq(1, 2)))
    // B at 0.3 epochs: exactly the rows whose bucket < 300, once each
    val bKept = out.filter(_._2 == "B").map(_._1).toSet
    val expB = (10L until 20L).filter { i =>
      (((i % 1000003L + 1000003L) % 1000003L) * 427799L % 1000003L % 1000L) < 300L
    }.toSet
    assert(bKept == expB)
    assert(out.filter(_._2 == "B").forall(_._3 == 1))
    // nesting: doubling the budget only ADDS (id, epoch) pairs
    val big = Sampling.epochize(d, col("src"), col("id"), col("tok"),
        Seq("A" -> 0.9, "B" -> 0.1), budgetTokens = 600L, maxEpochs = 4.0)
      .select(col("id"), col("epoch")).as[(Long, Int)].collect().toSet
    assert(out.map(r => (r._1, r._3)).toSet.subsetOf(big))
  }

  test("unimaxAllocation water-fills: small groups saturate, the rest share the waterline") {
    // caps at 1 epoch: A=2, B=5, C=10; budget 12 → A sat 2, B sat 5
    // (exactly at the line), C gets λ*=5
    val d = Seq(("A", 2L), ("B", 5L), ("C", 10L)).toDF("g", "tok")
    val out = Sampling.unimaxAllocation(d, col("g"), col("tok"),
        budgetTokens = 12L, maxEpochs = 1.0)
      .orderBy("group").collect()
    assert(out.map(r => (r.getAs[String]("group"),
      r.getAs[Double]("alloc_tokens"), r.getAs[Boolean]("saturated"))).toSeq ==
      Seq(("A", 2.0, true), ("B", 5.0, true), ("C", 5.0, false)))
    assert(out(2).getAs[Double]("epochs") == 0.5)
    // allocations exhaust the budget exactly
    assert(out.map(_.getAs[Double]("alloc_tokens")).sum == 12.0)
  }

  test("unimaxAllocation degenerates to all-saturated and to uniform") {
    val d = Seq(("A", 2L), ("B", 5L)).toDF("g", "tok")
    // budget ≥ Σcap at 2 epochs (14): everything saturates at its cap
    val sat = Sampling.unimaxAllocation(d, col("g"), col("tok"),
        budgetTokens = 100L, maxEpochs = 2.0)
      .orderBy("group").collect()
    assert(sat.map(_.getAs[Double]("alloc_tokens")).toSeq == Seq(4.0, 10.0))
    assert(sat.forall(_.getAs[Boolean]("saturated")))
    assert(sat.map(_.getAs[Double]("epochs")).toSeq == Seq(2.0, 2.0))
    // tiny budget: nobody saturates, uniform B/k
    val uni = Sampling.unimaxAllocation(d, col("g"), col("tok"),
        budgetTokens = 2L, maxEpochs = 2.0)
      .orderBy("group").collect()
    assert(uni.map(_.getAs[Double]("alloc_tokens")).toSeq == Seq(1.0, 1.0))
    assert(uni.forall(!_.getAs[Boolean]("saturated")))
  }

  test("doremiWeights replays the exponentiated-gradient trajectory by hand") {
    // two domains, two steps, eta = 1:
    // step 1: logits (0.5, 0.1) → α = softmax = (e^.5, e^.1)/Z1
    // step 2: cum logits (0.5+0.3, 0.1+0.7) = (0.8, 0.8) → α = (.5, .5)
    val d = Seq(("a", 1L, 0.5), ("b", 1L, 0.1),
      ("a", 2L, 0.3), ("b", 2L, 0.7)).toDF("dom", "st", "x")
    val out = Sampling.doremiWeights(d, col("dom"), col("st"), col("x"))
      .orderBy("domain").collect()
    // replicate the kernel's integer-lane softmax: e-terms floor onto
    // the 7-dp grid (micro-units), alphas re-floor before the mean
    def e7(x: Double) = math.floor(math.exp(x) * 1e7)
    def a7(a: Double) = math.floor(a * 1e7)
    val z1 = e7(0.0) + e7(-0.4) // stabilized against max .5
    val a1 = e7(0.0) / z1
    val b1 = e7(-0.4) / z1
    val wa = math.floor((a7(a1) + a7(0.5)) / 1e7 / 2 * 1e4) / 1e4
    val wb = math.floor((a7(b1) + a7(0.5)) / 1e7 / 2 * 1e4) / 1e4
    assert(out(0).getAs[Double]("weight") == wa, out(0).toString)
    assert(out(1).getAs[Double]("weight") == wb, out(1).toString)
    assert(out.forall(_.getAs[Long]("n_steps") == 2L))
  }

  test("doremiWeights: a missing (domain, step) cell counts as zero excess, not a dropped domain") {
    // domain b absent at step 2 — grid completion keeps it normalized
    val d = Seq(("a", 1L, 0.0), ("b", 1L, 0.0), ("a", 2L, 1.0))
      .toDF("dom", "st", "x")
    val out = Sampling.doremiWeights(d, col("dom"), col("st"), col("x"))
      .orderBy("domain").collect()
    // step1 α=(.5,.5); step2 logits (1,0) → αa = e/(e+1), on the
    // kernel's 7-dp integer lanes
    def e7(x: Double) = math.floor(math.exp(x) * 1e7)
    def a7(a: Double) = math.floor(a * 1e7)
    val a2 = e7(0.0) / (e7(0.0) + e7(-1.0))
    assert(out(0).getAs[Double]("weight") ==
      math.floor((a7(0.5) + a7(a2)) / 1e7 / 2 * 1e4) / 1e4)
    // weights still sum to ~1 (two domains)
    val s = out.map(_.getAs[Double]("weight")).sum
    assert(s > 0.999 && s <= 1.0)
  }

  test("effectiveSampleSize: hand-computed ess, outlier collapse, non-positive exclusion") {
    import spark.implicits._
    import graft.operators.Sampling
    val df = Seq(
      ("g", 1.0), ("g", 1.0), ("g", 1.0), ("g", 1.0), // uniform: ess = n
      ("h", 3.0), ("h", 1.0), // (4)²/10 = 1.6
      ("d", 1.0), ("d", -5.0), ("d", 0.0)) // ≤0 dropped, reported
      .toDF("src", "w")
    val r = Sampling.effectiveSampleSize(df, col("src"), col("w"))
      .orderBy("group_key")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(r.toSeq == Seq(
      ("d", 1L, 2L, 1.0, 1.0),
      ("g", 4L, 0L, 4.0, 1.0),
      ("h", 2L, 0L, 1.6, 0.8)), s"got ${r.toSeq}")
    // one huge weight: ess collapses toward 1 no matter the row count
    val skew = (("k", 1000.0) +: Seq.fill(99)(("k", 1.0))).toDF("src", "w")
    val rs = Sampling.effectiveSampleSize(skew, col("src"), col("w"))
      .as[(String, Long, Long, Double, Double)].collect()(0)
    assert(rs._2 == 100L && rs._4 < 1.3, s"ess should collapse: $rs")
  }

  test("mutualInformation: perfect dependence = 1 bit, independence = 0, degenerate margins safe") {
    import spark.implicits._
    import graft.operators.Stats
    val dep = (Seq.fill(5)(("x", "x")) ++ Seq.fill(5)(("y", "y"))).toDF("a", "b")
    val rd = Stats.mutualInformation(dep, col("a"), col("b")).collect()(0)
    assert(rd.getAs[Long]("n") == 10L)
    assert(rd.getAs[Double]("mi") == 1.0 && rd.getAs[Double]("nmi") == 1.0)
    assert(rd.getAs[Double]("h_a") == 1.0 && rd.getAs[Double]("h_b") == 1.0)
    val ind = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v")).toDF("a", "b")
    val ri = Stats.mutualInformation(ind, col("a"), col("b")).collect()(0)
    assert(ri.getAs[Double]("mi") == 0.0 && ri.getAs[Double]("nmi") == 0.0)
    // single-valued side: zero entropy must NOT divide by zero
    val deg = Seq(("x", "u"), ("x", "v")).toDF("a", "b")
    val rg = Stats.mutualInformation(deg, col("a"), col("b")).collect()(0)
    assert(rg.getAs[Double]("h_a") == 0.0 && rg.getAs[Double]("nmi") == 0.0)
    assert(rg.getAs[Double]("mi") == 0.0)
  }

  test("mutualInformation: NULL is a real level — null-safe margin joins keep its cells in the MI sum") {
    import spark.implicits._
    import graft.operators.Stats
    // perfectly dependent, but one level of each column is NULL: with
    // plain equi-joins the NULL cells drop from the MI sum (while nn
    // and the entropies still count them) and MI understates; with
    // null-safe joins this is exactly 1 bit, same as the x/y twin
    val dep = (Seq.fill(5)((null: String, null: String)) ++
      Seq.fill(5)(("y", "y")))
      .toDF("a", "b")
    val r = Stats.mutualInformation(dep, col("a"), col("b")).collect()(0)
    assert(r.getAs[Long]("n") == 10L, s"got $r")
    assert(r.getAs[Double]("mi") == 1.0 && r.getAs[Double]("nmi") == 1.0,
      s"NULL-level cells must stay in the MI sum: $r")
  }

  test("fimTransform: reassembly invariant, sentinel order, rates 0/1, determinism") {
    import graft.operators.Packing
    val docs = Seq.tabulate(60)(i =>
      (i.toLong, s"fn main$i() { return compute($i) + $i; }"))
      .toDF("id", "text")
    val byId = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Packing.fimTransform(docs, col("id"), col("text")).collect()
    assert(out.map(_.getString(1)).toSet == Set("plain", "psm", "spm"),
      "all three modes appear at 0.5/0.5 rates over 60 docs")
    out.foreach { r =>
      val (id, mode, txt) = (r.getLong(0), r.getString(1), r.getString(2))
      if (mode == "plain") {
        assert(txt == byId(id) && r.isNullAt(3))
      } else {
        val Seq(p, s, m) = Seq("<|fim_pre|>", "<|fim_suf|>", "<|fim_mid|>")
        assert(txt.startsWith(if (mode == "psm") p else s), r.toString)
        // parse by sentinel positions, reassemble the original
        val iM = txt.indexOf(m)
        val mid = txt.substring(iM + m.length)
        val (pre, suf) = if (mode == "psm") {
          val iS = txt.indexOf(s)
          (txt.substring(p.length, iS), txt.substring(iS + s.length, iM))
        } else {
          val iP = txt.indexOf(p)
          (txt.substring(iP + p.length, iM), txt.substring(s.length, iP))
        }
        assert(pre + mid + suf == byId(id), s"reassembly failed for $r")
        assert(r.getLong(3) == pre.length && r.getLong(4) == mid.length
          && r.getLong(5) == suf.length, r.toString)
      }
    }
    // rate 0: everything plain; rate 1 + spm 0: everything psm
    val none = Packing.fimTransform(docs, col("id"), col("text"), fimRate = 0)
      .select("mode").distinct().collect().map(_.getString(0)).toSeq
    assert(none == Seq("plain"))
    val allPsm = Packing.fimTransform(docs, col("id"), col("text"),
        fimRate = 1, spmRate = 0)
      .select("mode").distinct().collect().map(_.getString(0)).toSeq
    assert(allPsm == Seq("psm"))
    // determinism: identical output on re-run
    val again = Packing.fimTransform(docs, col("id"), col("text")).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // NULL text is plain passthrough even at fimRate=1: no split
    // happened, so the row must not claim spm/psm with NULL fim_text
    val withNull = (Seq((0L, "real text"), (1L, null: String)))
      .toDF("id", "text")
    val nOut = Packing.fimTransform(withNull, col("id"), col("text"),
        fimRate = 1, spmRate = 0)
      .orderBy("id").collect()
    assert(nOut(0).getString(1) == "psm")
    assert(nOut(1).getString(1) == "plain" && nOut(1).isNullAt(2)
      && nOut(1).isNullAt(3) && nOut(1).isNullAt(4) && nOut(1).isNullAt(5),
      s"NULL text must report mode=plain with NULL counts: ${nOut(1)}")
  }
}
