package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset-split assignment — the
  * reproducibility layer every training-data pipeline needs: the same
  * row lands in the same sample/split on every run, every engine, every
  * cluster size (no RNG, no partition-order dependence, no seed
  * drift between Spark versions).
  *
  * The bucket is pure integer arithmetic (Knuth multiplicative hash mod
  * a prime, folded to 1000 per-mille buckets), so it is portable SQL —
  * the DuckDB oracles replay it exactly. It is deliberately NOT
  * cryptographic: keys are ids, the goal is stable stratification, and
  * at 100 TB the whole thing stays a codegen'd projection — no shuffle,
  * no UDF, no driver participation. For adversarial keys pre-hash with
  * xxhash64 first (Spark-side only).
  */
object Sampling {

  val buckets: Int = 1000

  private val prime = 1000003L
  private val mult = 2654435761L % prime // 427799; (k·A) mod p == ((k mod p)·(A mod p)) mod p

  /** Per-mille bucket in [0, 1000) from an integer key — defined for
    * the FULL long range: the key is reduced mod p before the
    * multiply, so the product stays < p² ≈ 10¹² and can't overflow
    * (the naive `key * A` form overflows for |key| > ~3.5e9 — which
    * Spark 4's default ANSI mode turns into a job-killing
    * ArithmeticException, and which the docstring's own advice of
    * pre-hashing with xxhash64 would guarantee). pmod keeps negative
    * keys in [0, p) exactly like the SQL twin below.
    */
  def hashBucket(key: Column): Column =
    pmod(pmod(key.cast("long"), lit(prime)) * lit(mult), lit(prime)) % lit(buckets.toLong)

  /** The same bucket as ANSI SQL over column name `key` (oracle twin);
    * the `(x % p + p) % p` idiom mirrors pmod for negative keys.
    */
  def hashBucketSql(key: String): String =
    s"(((($key % $prime + $prime) % $prime) * $mult) % $prime % ${buckets})"

  /** [[hashBucket]] with a CALLER-SIZED modulus — a deterministic
    * pseudorandom draw in [0, m) per key (FIM split offsets, salted
    * position picks). Same overflow-safe reduce-then-multiply chain;
    * `m` must be positive and ≪ p for negligible modulo bias.
    */
  def hashMod(key: Column, m: Column): Column =
    pmod(pmod(key.cast("long"), lit(prime)) * lit(mult), lit(prime)) % m

  /** SQL twin of [[hashMod]] (oracle side). */
  def hashModSql(key: String, m: String): String =
    s"(((($key % $prime + $prime) % $prime) * $mult) % $prime % ($m))"

  /** Deterministic `fraction` sample: keeps rows whose bucket falls
    * below fraction×1000. Same rows survive on every run and engine.
    */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    df.filter(hashBucket(key) < math.round(fraction * buckets))
  }

  /** Deterministic stratified sampling: EXACTLY ceil(fraction × |group|)
    * rows from every group (so no stratum is ever empty), chosen by
    * hash-bucket order with the key as tiebreak — the same rows on
    * every run/engine, and nested across fractions (a 5% stratified
    * sample is a subset of the 25% one, per group).
    *
    * `hashSample` keeps a fraction only in expectation per stratum;
    * this is the exact-quota form used for balanced eval sets and
    * per-source corpus mixing.
    *
    * Scale shape (r16, the [[capPerGroup]] design): strata are FEW —
    * sources, languages — so the obvious one-window-per-group form
    * serializes entire strata through single tasks at 100 TB. Instead:
    * (1) a map-side-combined (group, bucket) count — ≤ [[buckets]]
    * rows per group however big the group — plus cumulative/total
    * windows over THAT tiny frame find each group's quota
    * (ceil(f·n)), threshold bucket, and residual quota inside it;
    * (2) rows below the threshold bucket pass a pure codegen'd filter
    * after a broadcast join (the bulk of the data never shuffles at
    * all), and only the boundary bucket's rows (~1/1000 of each
    * group) pay a ranked window for the remainder. The selected SET
    * is identical to the rank form — same (bucket, key) order, same
    * quota — so oracles and the nested-fraction property are
    * unchanged. Null hash buckets (null keys) coalesce to -1: they
    * sort first, exactly where the window's nulls-first ordering put
    * them before.
    */
  def stratifiedSample(
      df: DataFrame,
      group: Column,
      key: Column,
      fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    if (fraction == 0.0) return df.limit(0) // quota ceil(0)=0 everywhere
    val w = org.apache.spark.sql.expressions.Window
    val cols = df.columns
    val withB = df.withColumn("__g", group)
      .withColumn("__b", coalesce(hashBucket(key), lit(-1L)))
    val counts = withB.groupBy("__g", "__b").agg(count(lit(1)).as("__c"))
    val cum = sum(col("__c")).over(w.partitionBy(col("__g")).orderBy(col("__b").asc))
    val nTot = sum(col("__c")).over(w.partitionBy(col("__g")))
    // quota >= 1 (f > 0) and <= n, so every non-empty group has exactly
    // one threshold row: the first bucket where the running count
    // reaches the quota, carrying how many of ITS rows still fit
    val thresholds = counts
      .withColumn("__cum", cum)
      .withColumn("__q", ceil(lit(fraction) * nTot).cast("long"))
      .filter(col("__cum") >= col("__q") && col("__cum") - col("__c") < col("__q"))
      .select(col("__g").as("__tg"), col("__b").as("__tb"),
        (col("__q") - (col("__cum") - col("__c"))).as("__r"))
    // null-safe: the NULL group is a stratum like any other
    val joined = withB.join(broadcast(thresholds),
      col("__g") <=> col("__tg"), "left")
    val below = joined.filter(col("__b") < col("__tb"))
    val boundary = joined.filter(col("__b") === col("__tb"))
      .withColumn("__rk", row_number()
        .over(w.partitionBy(col("__g")).orderBy(key.asc)))
      .filter(col("__rk") <= col("__r"))
      .drop("__rk")
    below.unionByName(boundary)
      .select(cols.map(col): _*)
  }

  /** Deterministic data-mixture sampling — the per-source rate control
    * behind training-data mixtures ("keep 100% of books, 25% of web,
    * 5% of logs"): each row survives iff its hash bucket falls below
    * its group's rate. Groups absent from `rates` get `defaultRate`.
    *
    * Pure codegen'd projection + filter (no shuffle, no RNG): the same
    * rows survive on every run, engine, and cluster size, and because
    * all rates share one bucket function the samples are NESTED — the
    * 5% slice of a source is a subset of its 25% slice, so a mixture
    * can be re-weighted without churning previously selected rows
    * (incremental corpus rebuilds keep their history).
    */
  def mixtureSample(
      df: DataFrame,
      group: Column,
      key: Column,
      rates: Seq[(String, Double)],
      defaultRate: Double = 0.0): DataFrame = {
    require(rates.nonEmpty, "at least one (group, rate) required")
    require((defaultRate +: rates.map(_._2)).forall(r => r >= 0 && r <= 1),
      "rates must be in [0,1]")
    val cut = rates.foldRight(lit(math.round(defaultRate * buckets))) {
      case ((label, r), rest) =>
        when(group === label, lit(math.round(r * buckets))).otherwise(rest)
    }
    df.filter(hashBucket(key) < cut)
  }

  /** Token-BUDGET mixture: derive each source's keep rate IN-PLAN so
    * the sampled corpus hits a global token budget at target source
    * proportions — the planning step in front of [[mixtureSample]]
    * ("build me a 500 B-token mix at 60% books / 30% web / 10% code")
    * without a driver-side pre-pass over the corpus.
    *
    * rate_s = min(1, budget·w_s / tokens_s), so each listed source
    * contributes ≈ min(its whole mass, its budget share) in
    * EXPECTATION (hash buckets are uniform; the spec pins the exact
    * deterministic outcome). Sources not in `weights` are dropped —
    * an explicit mixture is a whitelist. Weights are the target
    * shares of the budget; they need not sum to 1.
    *
    * Shape at scale: one partial-aggregated groupBy producing a
    * ≤|sources|-row frame, broadcast back, then the same codegen'd
    * bucket filter as every other sampler — the corpus itself is
    * never shuffled. Same nesting guarantee as [[mixtureSample]]:
    * raising the budget (or a weight) only ever ADDS rows. The
    * per-mille cut TRUNCATES (floor) like [[weightedSample]] — it is
    * evaluated in-plan on both engines, where round() half-up is
    * repr-dependent (SURVEY §6 r4).
    */
  def mixtureToBudget(
      df: DataFrame,
      group: Column,
      key: Column,
      tokenCount: Column,
      weights: Seq[(String, Double)],
      budgetTokens: Long): DataFrame = {
    require(weights.nonEmpty, "at least one (group, weight) required")
    require(weights.forall(_._2 >= 0), "weights must be >= 0")
    require(budgetTokens > 0, "budgetTokens must be positive")
    val d = df.withColumn("__grp", group).withColumn("__tok", tokenCount.cast("long"))
    val wCol = weights.foldRight(lit(null).cast("double")) {
      case ((g, w), rest) => when(col("__grp") === g, lit(w)).otherwise(rest)
    }
    val cuts = d.groupBy("__grp").agg(sum(col("__tok")).as("__tot"))
      .withColumn("__w", wCol)
      .filter(col("__w").isNotNull)
      .select(col("__grp"),
        floor(least(lit(1.0),
          lit(budgetTokens.toDouble) * col("__w") / col("__tot")) * lit(buckets))
          .as("__cut"))
    d.join(broadcast(cuts), Seq("__grp"))
      .filter(hashBucket(key) < col("__cut"))
      .drop("__grp", "__tok", "__cut")
  }

  /** Deterministic PER-ROW-weighted sampling — quality-weighted corpus
    * selection ("keep a document with probability equal to its quality
    * score"): each row survives iff its hash bucket falls below its
    * OWN weight × 1000. Same guarantees as [[mixtureSample]] (no RNG,
    * no shuffle, engine-portable, nested: raising a row's weight never
    * evicts it), with the rate coming from a column instead of a
    * per-group table. Weights outside [0,1] clamp. The per-mille cut
    * TRUNCATES (floor): unlike the sibling samplers, whose cuts are
    * rounded DRIVER-side by math.round, this cut is evaluated per row
    * in both engines, and Spark's round() half-ups the decimal repr
    * where other engines round the binary value (SURVEY §6 r4);
    * floor of the shared double is repr-independent.
    */
  def weightedSample(df: DataFrame, key: Column, weight: Column): DataFrame =
    df.filter(hashBucket(key) <
      floor(least(lit(1.0), greatest(lit(0.0), weight)) * buckets))

  /** TEMPERATURE-based mixture sampling (the mT5/XLM-R multilingual
    * recipe, Xue et al. NAACL'21 §3.1): sample group g with
    * probability ∝ n_g^alpha, so alpha = 1 reproduces natural
    * proportions and alpha → 0 flattens toward uniform — the standard
    * way to keep head languages/sources from drowning the tail
    * without hand-tuning per-group rates ([[mixtureSample]] is the
    * hand-tuned sibling). Per-group keep rate:
    * min(1, targetRows · n_g^alpha / Σ n^alpha / n_g), realized by
    * the same hash-bucket cut as [[weightedSample]] — RNG-free,
    * nested, engine-portable.
    *
    * Determinism: n_g^alpha is TRUNCATED at 7 dp and the denominator
    * sums those truncations over exact decimals (the psi contract —
    * a plain double sum's value depends on partition order); all
    * downstream arithmetic is IEEE mul/div on engine-identical
    * doubles, and the per-mille cut floors (repr-independent).
    * alpha = 0.5 (the common choice) computes via sqrt, which IEEE
    * requires correctly rounded — bit-identical in any engine; other
    * alphas use pow, whose last ulp is libm-specific (deterministic
    * per engine, oracle parity not guaranteed at rate boundaries).
    *
    * Shape at scale: one partial-aggregated group count, a broadcast
    * rate table (group cardinality = sources/languages — config-
    * sized), one per-row filter. No shuffle of the data itself.
    */
  def temperatureMixture(
      df: DataFrame,
      group: Column,
      key: Column,
      targetRows: Long,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha in (0,1]: 1 = natural, ->0 = uniform")
    require(targetRows > 0, "targetRows must be positive")
    val d = df.withColumn("__grp", group).withColumn("__key", key)
    val nD = col("__n").cast("double")
    val powN = if (alpha == 0.5) sqrt(nD) else pow(nD, lit(alpha))
    val w = d.groupBy(col("__grp")).agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(powN * 1e7) / 1e7)
    val tot = w.agg(
      sum(col("__w").cast("decimal(28,7)")).cast("double").as("__wsum"))
    val rates = w.crossJoin(broadcast(tot))
      .select(col("__grp"),
        least(lit(1.0),
          lit(targetRows.toDouble) * col("__w") / col("__wsum") / col("__n"))
          .as("__rate"))
    d.join(broadcast(rates), "__grp")
      .filter(hashBucket(col("__key")) < floor(col("__rate") * buckets))
      .drop("__grp", "__key", "__rate")
  }

  /** Deterministic per-group row cap — domain capping ("keep at most
    * N documents per domain/source"), the corpus-balancing step that
    * stops a handful of mega-domains from dominating a training mix.
    * Selection rule: the `maxRows` smallest (hashBucket(key), key)
    * pairs per group survive — same rows on every run/engine, and
    * NESTED like the other samplers (raising the cap only ever adds
    * rows, so a rebuilt mixture keeps its history). `key` must be
    * unique within a group and non-null (ids are; null-key rows are
    * excluded like in every other sampler here).
    *
    * Scale shape: deliberately NOT one `row_number` window per group —
    * on a mega-domain that serializes the whole group through a single
    * task. Instead: (1) a map-side-combined (group, bucket) count —
    * at most [[buckets]] rows per group no matter how big the group —
    * plus a window over THAT tiny frame finds each group's exact
    * threshold bucket and the residual quota inside it; (2) rows below
    * the threshold bucket pass through a pure codegen'd filter, and
    * only the boundary bucket's rows (~1/1000 of the group) pay a
    * ranked window for the remainder. Costs one extra (linear) scan of
    * the input; the threshold frame only contains groups that actually
    * reach the cap, so it broadcasts.
    */
  def capPerGroup(
      df: DataFrame,
      group: Column,
      key: Column,
      maxRows: Int): DataFrame = {
    require(maxRows > 0, "maxRows must be positive")
    val w = org.apache.spark.sql.expressions.Window
    // null keys hash to a NULL bucket that satisfies neither phase-2
    // filter but WOULD consume quota in the phase-1 counts (nulls sort
    // first in the cum window) — exclude them up front, matching the
    // other samplers where a null key never survives the bucket
    // comparison
    val withB = df.filter(key.isNotNull)
      .withColumn("__g", group).withColumn("__b", hashBucket(key))
    val counts = withB.groupBy("__g", "__b").agg(count(lit(1)).as("__c"))
    val cum = sum(col("__c"))
      .over(w.partitionBy(col("__g")).orderBy(col("__b").asc))
    // the first bucket where the running count reaches the cap, and
    // how many of ITS rows still fit (groups under the cap produce no
    // row here — the left join below keeps them whole)
    val thresholds = counts.withColumn("__cum", cum)
      .filter(col("__cum") >= maxRows && col("__cum") - col("__c") < maxRows)
      .select(col("__g").as("__tg"), col("__b").as("__tb"),
        (lit(maxRows.toLong) - (col("__cum") - col("__c"))).as("__r"))
    // null-safe comparator: the NULL group is a group like any other —
    // a plain === would never match its threshold row and the cap
    // would silently not apply to it
    val joined = withB.join(broadcast(thresholds),
      col("__g") <=> col("__tg"), "left")
    val below = joined.filter(col("__tb").isNull || col("__b") < col("__tb"))
    val boundary = joined.filter(col("__b") === col("__tb"))
      .withColumn("__rk", row_number()
        .over(w.partitionBy(col("__g")).orderBy(key.asc)))
      .filter(col("__rk") <= col("__r"))
      .drop("__rk")
    below.unionByName(boundary)
      .drop("__g", "__b", "__tg", "__tb", "__r")
  }

  /** Deterministic train/val/test (or any) split assignment: `splits`
    * maps label → weight; weights are normalized and laid out as
    * contiguous bucket ranges, so every row gets exactly one label.
    */
  def splitAssign(
      df: DataFrame,
      key: Column,
      splits: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "positive weights required")
    val total = splits.map(_._2).sum
    val cuts = splits.scanLeft(0L) { case (acc, (_, w)) =>
      acc + math.round(w / total * buckets)
    }.tail
    val b = hashBucket(key)
    val expr = splits.zip(cuts).init.foldRight(lit(splits.last._1)) {
      case (((label, _), cut), rest) => when(b < cut, label).otherwise(rest)
    }
    df.withColumn(splitCol, expr)
  }

  /** Deterministic SOURCE-INTERLEAVED training order: within each
    * shard, rows take positions round-robin across sources (the row
    * ranked r in its source sorts at (r, source)), so no source ever
    * clumps — a batch drawn from any contiguous span sees the mixture,
    * not a run of one crawl. The cure for the sorted-by-source order
    * a partitioned ingest naturally produces, without RNG (same
    * hash-free determinism as [[splitAssign]]).
    *
    * Shape at scale: two SHARD-partitioned windows (never global —
    * [[graft.operators.Packing.packSequences]]' contract); shards
    * order independently, exactly like per-worker data loaders.
    * Adds `train_pos` (1-based within shard).
    */
  /** Deterministic global shuffle into training shards — the "write
    * the corpus in random order" step before materializing
    * webdataset/TFRecord-style shards: every row gets a pseudorandom
    * scramble key (a SECOND Knuth hash, decoupled from the sampling
    * bucket so sharding never correlates with sample membership), its
    * shard = scramble mod nShards, and a dense 1-based `position`
    * within the shard in scramble order. Same row → same (shard,
    * position) on every run, engine, and cluster size; no RNG.
    *
    * One keyed window per shard (position), partitioned by the shard
    * key — never global. The per-shard manifest (row/token counts a
    * loader reads first) is one partial-agg groupBy away and ships in
    * the oracle twin.
    */
  def shuffleShards(df: DataFrame, key: Column, nShards: Int): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    val scramble = shuffleScramble(key)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__scr"), key)
    df.withColumn("__scr", scramble)
      .withColumn("shard", (col("__scr") % nShards).cast("int"))
      .withColumn("position", row_number().over(w).cast("long"))
      .drop("__scr")
  }

  // second multiplier (xxhash PRIME2 reduced mod p). NOT any number
  // coprime to p: a multiplier congruent to a small value mod p (the
  // first attempt, 999983 ≡ −20) makes scramble = −20k for sequential
  // keys, and scramble mod nShards then hits only a few residues —
  // sequential ids landed in 3 of 8 shards
  private val mult2 = 2246822519L % prime // 815781

  /** The scramble hash as a Column (and [[shuffleScrambleSql]] as its
    * SQL twin) — `(key mod p)·A₂ mod p`, full-long-range safe like
    * [[hashBucket]].
    */
  def shuffleScramble(key: Column): Column =
    pmod(pmod(key.cast("long"), lit(prime)) * lit(mult2), lit(prime))

  def shuffleScrambleSql(key: String): String =
    s"(((($key % $prime + $prime) % $prime) * $mult2) % $prime)"

  /** First-come token-budget ADMISSION: within each shard, walk docs
    * in `orderKey` order and admit while the tokens admitted so far
    * are under `budget` — the "fill a 10 B-token bucket, then close
    * the tap" gate (distinct from [[mixtureToBudget]], which thins
    * probabilistically: admission is exact, ordered, and
    * arrival-faithful — the right semantics when the stream is
    * already curated and the budget is a hard stop). The straddling
    * doc is admitted (tokens_before < budget decides; budgets are
    * soft by one doc — the standard packing convention).
    *
    * One keyed-window cumulative sum, partitioned by shard — never
    * global; `tokens_before` survives as a column (= the exclusive
    * cumsum), so downstream packing can reuse it. Streaming twin:
    * [[graft.streaming.EventStreams.admitStream]] (identical
    * assignment across micro-batches — the spec proves it).
    */
  def admitToBudget(
      df: DataFrame,
      shard: Column,
      orderKey: Column,
      tokenCount: Column,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shard).orderBy(orderKey)
      .rowsBetween(Long.MinValue, -1)
    df.withColumn("tokens_before",
        coalesce(sum(tokenCount.cast("long")).over(w), lit(0L)))
      .filter(col("tokens_before") < budget)
  }

  /** Epoch/repetition plan for a DATA-CONSTRAINED mixture (Muennighoff
    * et al., "Scaling Data-Constrained Language Models", NeurIPS'23):
    * when budget·w_s EXCEEDS a source's token mass, the source must
    * repeat — and repeating pays off up to ~4 epochs, after which
    * marginal value decays to ~zero. This is [[mixtureToBudget]]'s
    * upsampling counterpart: that operator derives keep-RATES ≤ 1;
    * this one derives EPOCHS, capped at `maxEpochs`, and reports the
    * deficit the cap leaves unfilled (the "you don't have enough
    * books" alarm, surfaced BEFORE a 100 TB materialization).
    *
    * One partial-aggregated groupBy to a ≤|sources|-row frame; epochs
    * = min(maxEpochs, target/have) truncated 4 dp (floor — in-plan,
    * repr-independent); target = floor(budget·w) and planned =
    * floor(epochs·have) as exact longs; `capped` compares exact longs
    * (target > floor(maxEpochs·have)). Sources not in `weights` are
    * dropped — an explicit mixture is a whitelist.
    *
    * Returns (source, have_tokens, target_tokens, epochs,
    * planned_tokens, deficit_tokens, capped).
    */
  def epochPlan(
      df: DataFrame,
      group: Column,
      tokenCount: Column,
      weights: Seq[(String, Double)],
      budgetTokens: Long,
      maxEpochs: Double = 4.0): DataFrame = {
    require(weights.nonEmpty, "at least one (group, weight) required")
    require(weights.forall(_._2 >= 0), "weights must be >= 0")
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(maxEpochs > 0, "maxEpochs must be positive")
    val wCol = weights.foldRight(lit(null).cast("double")) {
      case ((g, w), rest) => when(col("source") === g, lit(w)).otherwise(rest)
    }
    val tot = df.select(group.as("source"), tokenCount.cast("long").as("__tok"))
      .groupBy("source").agg(sum(col("__tok")).as("have_tokens"))
      .withColumn("__w", wCol)
      .filter(col("__w").isNotNull && col("have_tokens") > 0)
    val target = floor(lit(budgetTokens.toDouble) * col("__w")).cast("long")
    val epochs = floor(least(lit(maxEpochs),
      col("target_tokens").cast("double") / col("have_tokens").cast("double")) * 1e4) / 1e4
    tot.withColumn("target_tokens", target)
      .withColumn("epochs", epochs)
      .withColumn("planned_tokens",
        floor(col("epochs") * col("have_tokens").cast("double")).cast("long"))
      .withColumn("deficit_tokens",
        greatest(lit(0L), col("target_tokens") - col("planned_tokens")))
      .withColumn("capped", col("target_tokens") >
        floor(lit(maxEpochs) * col("have_tokens").cast("double")).cast("long"))
      .select("source", "have_tokens", "target_tokens", "epochs",
        "planned_tokens", "deficit_tokens", "capped")
  }

  /** Materialize an [[epochPlan]]: each surviving row repeats
    * floor(epochs) times, plus one more copy iff its hash bucket
    * falls under the fractional remainder's per-mille cut — so a
    * source planned at 2.3 epochs emits every doc twice and a
    * deterministic 30% of docs a third time, and a source planned at
    * 0.3 epochs degrades to exactly [[mixtureSample]]'s behavior
    * (full copies = 0, fractional cut selects). The output carries an
    * `epoch` column (1-based copy index) so downstream shuffling /
    * curriculum ordering can treat repeats as distinct training rows.
    *
    * Deterministic end to end (plan math + hash cut — no RNG), nested
    * (raising budget/weights only adds copies), and the corpus is
    * never shuffled: the ≤|sources| plan broadcasts onto a codegen'd
    * explode. At 100 TB the repeats are materialized BY THE SCAN
    * (explode in the projection), not stored.
    */
  def epochize(
      df: DataFrame,
      group: Column,
      key: Column,
      tokenCount: Column,
      weights: Seq[(String, Double)],
      budgetTokens: Long,
      maxEpochs: Double = 4.0): DataFrame = {
    val plan = epochPlan(df, group, tokenCount, weights, budgetTokens, maxEpochs)
      .select(col("source").as("__src"), col("epochs").as("__e"))
    val full = floor(col("__e")).cast("int")
    val fracCut = floor((col("__e") - floor(col("__e"))) * buckets)
    val copies = full + when(hashBucket(key) < fracCut, 1).otherwise(0)
    df.join(broadcast(plan), group === col("__src"))
      .withColumn("__copies", copies)
      .withColumn("epoch",
        explode(when(col("__copies") >= 1, sequence(lit(1), col("__copies")))
          // Spark's sequence(1, 0) yields DESCENDING [1, 0], not empty
          // — guard to an empty array so zero-copy rows drop
          .otherwise(array().cast("array<int>"))))
      .drop("__src", "__e", "__copies")
  }

  /** Curriculum training order — easy-first (or any
    * difficulty-staged) ordering without a global sort: `nStages`
    * difficulty stages from EXACT global percentile cutoffs (one
    * aggregate; k−1 doubles of driver metadata — the IVF-centroid
    * contract), then within each shard rows order by (stage,
    * scramble, key) via ONE keyed window — stages progress
    * easy→hard, and WITHIN a stage the order is the deterministic
    * shuffle ([[shuffleScramble]]), so a batch drawn from one stage
    * still sees a mixture. Exact `percentile` keeps the oracle
    * replayable (boxplot's convention); swap `approx_percentile` in
    * at corpus scale where a ±ε stage boundary is irrelevant.
    *
    * Returns the input + (stage, train_pos).
    */
  def curriculumOrder(
      df: DataFrame,
      key: Column,
      difficulty: Column,
      shard: Column,
      nStages: Int): DataFrame = {
    require(nStages >= 2, "nStages must be >= 2")
    val probs = (1 until nStages).map(i => lit(i.toDouble / nStages))
    val cuts = df.agg(percentile(difficulty, array(probs: _*)).as("c"))
      .collect().head.getSeq[Double](0)
    val stage = cuts.foldLeft(lit(1)) { (acc, c) =>
      acc + when(difficulty > c, 1).otherwise(0)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shard).orderBy(col("stage"), shuffleScramble(key), key)
    df.withColumn("stage", stage)
      .withColumn("train_pos", row_number().over(w).cast("long"))
  }

  def interleaveSources(
      df: DataFrame,
      shard: Column,
      source: Column,
      orderKey: Column): DataFrame = {
    val wSrc = org.apache.spark.sql.expressions.Window
      .partitionBy(shard, source).orderBy(orderKey)
    val wShard = org.apache.spark.sql.expressions.Window
      .partitionBy(shard).orderBy(col("__src_rank"), source, orderKey)
    df.withColumn("__src_rank", row_number().over(wSrc))
      .withColumn("train_pos", row_number().over(wShard).cast("long"))
      .drop("__src_rank")
  }

  /** UniMax token allocation (Chung et al. ICLR'23): distribute a
    * token budget UNIFORMLY across groups, capped at `maxEpochs`
    * epochs of each group's own tokens — the fairness-first mixture
    * (vs [[epochPlan]]'s caller-chosen weights and
    * [[temperatureMixture]]'s power law): no group is over-repeated
    * past its cap, and budget freed by small groups saturating
    * WATER-FILLS into the rest.
    *
    * Closed form instead of the iterative redistribution loop: with
    * caps sorted ascending (rank i of k, ties (cap, group) —
    * deterministic), group i SATURATES iff
    * cap_i ≤ λ_i = (B − cumcap_{i−1}) / (k − i + 1), and every
    * unsaturated group receives the waterline λ* = λ at the FIRST
    * unsaturated rank (a 1-row aggregate broadcast back). B ≥ Σcap
    * degenerates to all-saturated; a tiny B to uniform B/k. Shape:
    * one partial-agg groupBy to the ≤|groups| frame, one window over
    * that AGGREGATED frame (registry-audit class), one broadcast
    * join — the corpus is touched once.
    *
    * Output per group: (group, n_tokens, cap_tokens, alloc_tokens,
    * epochs, saturated); alloc/epochs 4-dp floor, derivation replayed
    * textually by the oracle. Compose with [[epochize]] (epochs
    * column in, copies out) to materialize.
    */
  def unimaxAllocation(
      df: DataFrame,
      group: Column,
      tokenCount: Column,
      budgetTokens: Long,
      maxEpochs: Double = 4.0): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(maxEpochs > 0, "maxEpochs must be positive")
    val tot = df.select(group.as("group"), tokenCount.cast("long").as("__tok"))
      .groupBy("group").agg(sum(col("__tok")).as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("cap_tokens", col("n_tokens").cast("double") * maxEpochs)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cap_tokens").asc, col("group").asc)
    val k = tot.agg(count(lit(1)).as("k"))
    val ranked = tot.crossJoin(broadcast(k))
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__cumprev",
        coalesce(sum(col("cap_tokens")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0.0)))
      .withColumn("__lambda",
        (lit(budgetTokens.toDouble) - col("__cumprev")) /
          (col("k") - col("__rn") + 1).cast("double"))
      .withColumn("saturated", col("cap_tokens") <= col("__lambda"))
    // λ at the FIRST unsaturated rank — λ of later ranks is computed
    // against a cumprev that includes unsaturated caps and is garbage
    val waterline = ranked.agg(
        min(when(!col("saturated"), struct(col("__rn"), col("__lambda"))))
          .as("__s"))
      .select(col("__s.__lambda").as("__wl"))
    ranked.crossJoin(broadcast(waterline))
      .withColumn("alloc_tokens",
        Num.t4floor(when(col("saturated"), col("cap_tokens"))
          .otherwise(col("__wl"))))
      .withColumn("epochs",
        Num.t4floor(when(col("saturated"), col("cap_tokens"))
          .otherwise(col("__wl")) / col("n_tokens").cast("double")))
      .select("group", "n_tokens", "cap_tokens", "alloc_tokens", "epochs",
        "saturated")
  }

  /** DoReMi domain-weight estimation (Xie et al. '23), the data-side
    * half: given per-(domain, step) EXCESS LOSSES from the proxy-vs-
    * reference run, replay the exponentiated-gradient trajectory
    *
    *   α_t = softmax(log α_{t−1} + η · excess_t)      (per step)
    *   ŵ   = mean_t α_t                               (the output)
    *
    * exactly — the returned ŵ is DoReMi's final domain mixture, fed
    * into [[epochPlan]]/[[mixtureToBudget]] as weights. Shapes: the
    * cumulative logit is ONE domain-partitioned ordered window over
    * the (domain, step) frame (bounded by domains × steps — training
    * telemetry, not corpus); the per-step softmax normalizer is a
    * step-keyed partial-agg groupBy joined back (AQE-broadcast); the
    * final mean is one more groupBy. Missing (domain, step) cells
    * contribute zero excess (the domain wasn't sampled that step) via
    * the complete-grid cross of distinct domains × steps — dropping
    * them would silently renormalize against a shrunken domain set.
    *
    * Numerics: excess losses quantize to 6-dp decimals before the
    * cumulative sum (order-independent), logits stabilize against the
    * per-step MAX before exp; exp/softmax doubles are NOT
    * bit-contracted cross-engine (libm), so the operator is rows-only
    * at the driver gate — exactness is spec-pinned on hand-computed
    * trajectories. 4-dp floor on reported weights.
    */
  def doremiWeights(
      losses: DataFrame,
      domain: Column,
      step: Column,
      excessLoss: Column,
      eta: Double = 1.0): DataFrame = {
    require(eta > 0, "eta must be positive")
    // pre-aggregate to ONE row per (domain, step): finer-grained
    // telemetry (several loss rows per cell) would otherwise duplicate
    // through the grid left-join and silently double-count into every
    // later step's logit (caught in review); SUM is the merge —
    // excess losses over a step's minibatches add
    // per-ROW 6-dp micro-unit quantization before the merge sum:
    // exact integer-decimal addition is order-independent (a raw
    // double sum would drift with partitioning) and replays in SQL
    val t = losses.select(domain.as("domain"), step.cast("long").as("step"),
        excessLoss.cast("double").as("__x"))
      .groupBy("domain", "step")
      .agg(sum((col("__x") * 1e6).cast("decimal(24,0)")).as("__x6"))
    // complete grid: every domain at every step (missing cell = 0)
    val domains = t.select("domain").distinct()
    val steps = t.select("step").distinct()
    val grid = domains.crossJoin(steps)
      .join(t, Seq("domain", "step"), "left")
      .withColumn("__x6",
        coalesce(col("__x6"), lit(0).cast("decimal(24,0)")))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("domain").orderBy("step")
    val logit = (sum(col("__x6")).over(wCum).cast("double") / 1e6) * eta
    val withLogit = grid.withColumn("__logit", logit)
    val perStep = withLogit.groupBy("step")
      .agg(max(col("__logit")).as("__mx"))
    // softmax terms floor onto the 7-dp grid as INTEGER micro-units
    // (the power-iteration lane7 contract): libm exp() is not
    // bit-contracted cross-engine, but floor7 absorbs its last-ulp
    // variance, and every sum after (__z7, the weight mean) is exact
    // integer arithmetic — order-independent AND what lets the
    // q_doremi oracle replay the whole trajectory in SQL. The max
    // term always contributes e^0 = 1, so __z7 is never zero.
    val expd = withLogit.join(perStep, Seq("step"))
      .withColumn("__e7",
        floor(exp(col("__logit") - col("__mx")) * 1e7).cast("long"))
    val norm = expd.groupBy("step")
      .agg(sum(col("__e7")).as("__z7"), count(lit(1)).as("__k"))
    expd.join(norm, Seq("step"))
      .withColumn("__alpha",
        col("__e7").cast("double") / col("__z7").cast("double"))
      .withColumn("__a7", floor(col("__alpha") * 1e7).cast("long"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_steps"),
        Num.t4floor(sum(col("__a7")).cast("double") / 1e7 / count(lit(1)))
          .as("weight"),
        Num.t4floor(max(col("__alpha"))).as("peak_weight"))
  }

  /** EFFECTIVE SAMPLE SIZE of an importance-weighted corpus slice —
    * the diagnostic every weighting scheme (DSIR D50, DoReMi D98,
    * temperature mixing D53) should report before training on its
    * weights: ess = (Σw)²/Σw² collapses toward 1 when a few rows
    * carry all the mass (the weighted corpus is effectively tiny no
    * matter its row count), and `ess_ratio` = ess/n says what
    * fraction of the data is really contributing. One partial-agg
    * pass per group over 6-dp-prerounded decimal weight lanes (exact,
    * order-independent); ratios 4-dp floor. Non-positive/NULL weights
    * are excluded and reported (`n_dropped`) — a negative weight is a
    * bug upstream, not a sample.
    */
  def effectiveSampleSize(
      df: DataFrame,
      group: Column,
      weight: Column): DataFrame = {
    val w6 = round(col("__w"), 6).cast("decimal(24,6)")
    df.select(group.as("group_key"), weight.cast("double").as("__w"))
      .groupBy("group_key")
      .agg(
        coalesce(sum(when(col("__w") > 0, 1L)), lit(0L)).as("n"),
        coalesce(sum(when(col("__w").isNull || !(col("__w") > 0), 1L)), lit(0L))
          .as("n_dropped"),
        sum(when(col("__w") > 0, w6)).as("__sw"),
        sum(when(col("__w") > 0, w6 * w6)).as("__sww"))
      .select(col("group_key"), col("n"), col("n_dropped"),
        (floor(col("__sw").cast("double") * col("__sw").cast("double")
          / col("__sww").cast("double") * 1e4) / 1e4).as("ess"),
        (floor(col("__sw").cast("double") * col("__sw").cast("double")
          / col("__sww").cast("double") / col("n") * 1e4) / 1e4)
          .as("ess_ratio"))
  }

  /** Consistent-hash ring segments for `nShards` shards × `vnodes`
    * virtual nodes on a 2^20 ring — pure integer arithmetic from the
    * module's shared hash constants, so the ring is a config-sized
    * pure function both engines (and any future backfill) rebuild
    * identically. Returns (lo exclusive, hi inclusive, shard) segments
    * covering [0, ringSize); position ties across vnodes resolve to
    * the smallest shard id.
    */
  def ringIntervals(
      nShards: Int,
      vnodes: Int,
      ringSize: Long = 1L << 20): Seq[(Long, Long, Int)] = {
    require(nShards >= 1 && vnodes >= 1, "nShards and vnodes must be >= 1")
    val pts = (for { s <- 0 until nShards; v <- 0 until vnodes } yield {
      val key = s.toLong * 131071L + v.toLong
      val pos = (((key % prime + prime) % prime) * mult) % prime % ringSize
      (pos, s)
    }).sorted
    val dedup = pts.foldLeft(Vector.empty[(Long, Int)]) { (acc, e) =>
      if (acc.nonEmpty && acc.last._1 == e._1) acc else acc :+ e
    }
    val segs = dedup.sliding(2).collect {
      case Seq((lo, _), (hi, s)) => (lo, hi, s)
    }.toVector
    // wrap: positions past the last vnode (and at/below the first)
    // belong to the FIRST vnode clockwise — the ring's smallest point
    ((-1L, dedup.head._1, dedup.head._2) +: segs) :+
      ((dedup.last._1, ringSize - 1, dedup.head._2))
  }

  /** Consistent-hash shard REBALANCE plan: where does every row live
    * under `nOld` shards, where under `nNew`, and what fraction moves?
    * The 100 TB point of consistent hashing is the answer "≈1/(n+1) of
    * the corpus" instead of mod-sharding's "almost all of it" — this
    * operator PROVES that for the actual key population before anyone
    * schedules the migration.
    *
    * Shape at scale: both rings are config-sized driver metadata
    * (nShards × vnodes segments, [[ringIntervals]]); each row computes
    * ONE integer hash position and broadcast-range-joins the two
    * segment tables (a few hundred rows each) — per-row work is two
    * bounded lookups in whole-stage codegen, no shuffle beyond the
    * caller's. Deterministic end to end: same constants, same plan,
    * any engine.
    */
  def consistentHashPlan(
      df: DataFrame,
      key: Column,
      nOld: Int,
      nNew: Int,
      vnodes: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ringSize = 1L << 20
    val oldIv = ringIntervals(nOld, vnodes, ringSize)
      .toDF("__lo_o", "__hi_o", "shard_old")
    val newIv = ringIntervals(nNew, vnodes, ringSize)
      .toDF("__lo_n", "__hi_n", "shard_new")
    val t = df.select(key.as("__k"),
      hashMod(key, lit(ringSize)).as("__pos"))
    t.join(org.apache.spark.sql.functions.broadcast(oldIv),
        col("__pos") > col("__lo_o") && col("__pos") <= col("__hi_o"))
      .join(org.apache.spark.sql.functions.broadcast(newIv),
        col("__pos") > col("__lo_n") && col("__pos") <= col("__hi_n"))
      .select(col("__k").as("key"), col("__pos").as("ring_pos"),
        col("shard_old"), col("shard_new"),
        (col("shard_old") =!= col("shard_new")).as("moved"))
  }
}
