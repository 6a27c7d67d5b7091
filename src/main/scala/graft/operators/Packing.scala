package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pre-training: documents are concatenated in
  * a deterministic order and chunked into fixed token budgets
  * ("concat-then-chunk"), so every training sequence is full and no
  * tokens are dropped between documents.
  *
  * Packing is per-`shard` (the window is ALWAYS partitioned — one
  * global packing order would serialize 100 TB through one task and is
  * rejected by construction). Shards pack independently, exactly like
  * per-worker packing in a distributed tokenizer; a doc's sequence id
  * is stable across runs because shard and order are deterministic
  * functions of the data.
  */
object Packing {

  /** Assign each document a (shard-local) sequence id under a token
    * budget: seq_id = floor(exclusive-running-token-sum / budget).
    * Documents longer than the budget simply span sequences (their
    * tokens still count contiguously), matching concat-then-chunk.
    *
    * Output adds: `seq_id` (long), `tok_offset` (the doc's first-token
    * position within its sequence).
    */
  def packSequences(
      df: DataFrame,
      shard: Column,
      orderBy: Seq[Column],
      nTokens: Column,
      budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(shard).orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = coalesce(sum(nTokens).over(w), lit(0L))
    df.withColumn("__cum", cum)
      // `div` (integer division), NOT floor(a / b): the double division
      // loses exactness past 2^53 cumulative tokens — the same mantissa
      // hazard Tables.events guards against for epoch-nanos
      .withColumn("seq_id", expr(s"__cum div ${budget.toLong}"))
      .withColumn("tok_offset", pmod(col("__cum"), lit(budget.toLong)))
      .drop("__cum")
  }

  /** WHOLE-document bin packing, first-fit-decreasing — the packing
    * mode for fine-tuning / eval batching where documents must NOT
    * span sequences ([[packSequences]] is the pre-training
    * concat-then-chunk mode that splits them). FFD's classic guarantee
    * (≤ 11/9·OPT + 6/9 bins) comes from placing documents longest-
    * first; a doc longer than the budget gets a bin of its own,
    * flagged `oversize` (quarantine-by-flag, the Multimodal contract).
    *
    * Shape at scale: packing is per-`shard` exactly like
    * [[packSequences]] (a global packing order would serialize the
    * corpus through one task); each shard's docs are hash-routed to
    * one partition and greedily placed by a partition-local kernel —
    * state is one open-bin list per shard, bounded by shard size.
    * Deterministic: (n_tokens desc, id asc) placement order.
    * Output: (shard, id, n_tokens, bin_id, oversize).
    */
  def binPackFFD(
      df: DataFrame,
      shard: Column,
      id: Column,
      nTokens: Column,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("shard", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_tokens", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("bin_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("oversize", org.apache.spark.sql.types.BooleanType)))
    val prep = df
      .select(shard.cast("string").as("shard"), id.cast("long").as("id"),
        nTokens.cast("long").as("n_tokens"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("n_tokens").desc, col("id").asc)
    prep.mapPartitions { rows =>
      // partitions hold whole shards (hash routing above); shards are
      // contiguous after the sort, so one open-bin list suffices and
      // resets at each shard boundary
      var curShard: String = null
      var remaining = scala.collection.mutable.ArrayBuffer.empty[Long]
      rows.map { r =>
        val sh = r.getString(0); val did = r.getLong(1); val n = r.getLong(2)
        if (sh != curShard) { curShard = sh; remaining = scala.collection.mutable.ArrayBuffer.empty[Long] }
        var i = 0
        var placed = -1
        while (placed < 0 && i < remaining.length) {
          if (remaining(i) >= n) placed = i else i += 1
        }
        if (placed < 0) { remaining += (budget - n); placed = remaining.length - 1 }
        else remaining(placed) -= n
        org.apache.spark.sql.Row(sh, did, n, placed.toLong, n > budget)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Length-bucketed batch assignment — the PADDING-mode counterpart
    * of [[packSequences]]' concat mode, for fine-tuning/eval loaders
    * that pad each batch to its longest member instead of splitting
    * documents: per shard, documents order by (n_tokens DESC, id) and
    * group into consecutive `batchSize`-doc batches, so near-equal
    * lengths share a batch and the padding a batch wastes
    * (n_docs·max − Σ len) is minimized for its neighborhood — the
    * standard dynamic-batching trick. Deterministic: the id tiebreak
    * pins equal-length order, so batch ids are stable across runs.
    * Output per doc: (shard, id, n_tokens, batch_id); the padding
    * report is one groupBy over this frame (see q_length_batches).
    * Per-shard windows only — the packSequences partitioning
    * contract; a global length sort would serialize the corpus.
    */
  def lengthBucketBatches(
      df: DataFrame,
      shard: Column,
      id: Column,
      nTokens: Column,
      batchSize: Int): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("n_tokens").desc, col("id").asc)
    df.select(shard.cast("string").as("shard"), id.cast("long").as("id"),
        nTokens.cast("long").as("n_tokens"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("batch_id", expr(s"(__rn - 1) div ${batchSize.toLong}"))
      .drop("__rn")
  }

  /** Similarity-ordered sequence packing — the cluster approximation
    * of In-Context Pretraining (Shi et al., ICLR'24): instead of
    * concatenating documents in arrival order, related documents pack
    * ADJACENTLY so a training sequence carries coherent context
    * across its document boundaries. The paper's traveling-salesman
    * nearest-neighbor chain is corpus-sequential and cannot run at
    * 100 TB; the scalable form is coarse-cluster-then-order: the IVF
    * quantizer's cells are the coherence unit, each cell packs
    * independently as its own shard ([[packSequences]]'s
    * always-partitioned window — a global similarity chain would
    * serialize the corpus through one task), and within a cell the
    * deterministic id order keeps the packing stable across runs.
    * Output: (id, cluster, n_tokens, seq_id, tok_offset) — seq ids
    * are CLUSTER-local, exactly packSequences' shard contract.
    */
  def packBySimilarity(
      corpus: DataFrame,
      id: Column,
      vec: Column,
      nTokens: Column,
      centroids: Array[Array[Double]],
      budget: Int): DataFrame = {
    val toks = corpus.select(id.as("id"), nTokens.cast("long").as("n_tokens"))
    val asg = Similarity.ivfAssign(corpus, id, vec, centroids)
      .select(col("id"), col("cluster"))
    packSequences(asg.join(toks, "id"), col("cluster"), Seq(col("id")),
        col("n_tokens"), budget)
      .select(col("id"), col("cluster"), col("n_tokens"), col("seq_id"),
        col("tok_offset"))
  }

  /** FIM (fill-in-the-middle) transformation (Bavarian et al.,
    * "Efficient Training of Language Models to Fill in the Middle",
    * '22) — the code-corpus preprocessing step that teaches infilling:
    * a deterministic fraction of documents is split at two
    * pseudorandom character positions into (prefix, middle, suffix)
    * and re-serialized with sentinel tokens, PSM order
    * `pre‖prefix‖suf‖suffix‖mid‖middle` or the paper's SPM variant
    * `suf‖suffix‖pre‖prefix‖mid‖middle`; the rest pass through as
    * `plain`. Character = Unicode code point (the chrF substring
    * contract, so the SQL twin lands on identical splits). NULL-text
    * rows are plain passthrough: no split happened, so they must not
    * claim an spm/psm mode regardless of what the id hash selects.
    *
    * Determinism: apply/mode decisions ride [[Sampling.hashBucket]]
    * on salted id keys, split offsets ride [[Sampling.hashMod]] over
    * len+1 — RNG-free and engine-replayable; re-running never churns
    * which docs transform (the hash-nested sampling contract). One
    * codegen'd projection, no shuffle, no state. Returns (id, mode,
    * fim_text, n_prefix, n_middle, n_suffix) — char counts NULL for
    * plain rows (unmeasured, not zero).
    */
  def fimTransform(
      df: DataFrame,
      id: Column,
      text: Column,
      fimRate: Double = 0.5,
      spmRate: Double = 0.5,
      preTok: String = "<|fim_pre|>",
      sufTok: String = "<|fim_suf|>",
      midTok: String = "<|fim_mid|>"): DataFrame = {
    require(fimRate >= 0 && fimRate <= 1, "fimRate in [0,1]")
    require(spmRate >= 0 && spmRate <= 1, "spmRate in [0,1]")
    val t = df.select(id.cast("long").as("id"), text.as("text"))
    val len = length(col("text"))
    val applyFim = col("text").isNotNull &&
      Sampling.hashBucket(col("id") * 31 + 3) <
        math.round(fimRate * Sampling.buckets)
    val spm = Sampling.hashBucket(col("id") * 31 + 4) <
      math.round(spmRate * Sampling.buckets)
    val o1 = Sampling.hashMod(col("id") * 31 + 1, len + 1)
    val o2 = Sampling.hashMod(col("id") * 31 + 2, len + 1)
    val lo = least(o1, o2)
    val hi = greatest(o1, o2)
    val prefix = col("text").substr(lit(1), lo.cast("int"))
    val middle = col("text").substr((lo + 1).cast("int"), (hi - lo).cast("int"))
    val suffix = col("text").substr((hi + 1).cast("int"), (len - hi).cast("int"))
    val psm = concat(lit(preTok), prefix, lit(sufTok), suffix, lit(midTok), middle)
    val spmText = concat(lit(sufTok), suffix, lit(preTok), prefix, lit(midTok), middle)
    t.select(
      col("id"),
      when(!applyFim, lit("plain")).when(spm, lit("spm"))
        .otherwise(lit("psm")).as("mode"),
      when(!applyFim, col("text")).when(spm, spmText)
        .otherwise(psm).as("fim_text"),
      when(applyFim, lo.cast("long")).as("n_prefix"),
      when(applyFim, (hi - lo).cast("long")).as("n_middle"),
      when(applyFim, (len - hi).cast("long")).as("n_suffix"))
  }

  /** D150: head+tail token truncation — the long-document budget
    * policy that beats naive head-only truncation for training data:
    * documents over `budget` tokens keep the first
    * ceil(budget·headFrac) and the last budget−that tokens (LongT5 /
    * "middle truncation" family — the lead carries the thesis, the
    * tail the conclusion; the middle is the cheapest cut), rebuilt
    * with a single ellipsis marker between the halves. Documents at
    * or under budget pass through whole. Output text is the
    * NORMALIZED token stream re-joined (the shared tokenizer's
    * lower/strip contract) — the downstream packer consumes tokens,
    * not raw bytes.
    *
    * Pure per-row projection — no shuffle, no window, no state;
    * tokenization runs ONCE per row (the array-wrap lambda trick).
    * Deterministic by construction: the cut is a pure function of
    * the token count.
    *
    * Returns one row per doc: (doc_id, n_tokens, kept_head,
    * kept_tail, was_truncated, truncated_text).
    */
  def headTailTruncate(
      docs: DataFrame,
      id: Column,
      text: Column,
      budget: Int = 512,
      headFrac: Double = 0.75,
      marker: String = "..."): DataFrame = {
    require(budget >= 2, "budget must be >= 2 (one head and one tail token)")
    require(headFrac > 0 && headFrac < 1, "headFrac in (0, 1)")
    // nHead clamps to budget-1 (r15 advice): when ceil(budget*headFrac)
    // == budget (e.g. budget=2, headFrac=0.75) the unclamped split kept
    // budget+1 tokens — over budget, and a doc of exactly budget+1
    // tokens was flagged truncated with nothing excised. head+tail must
    // equal budget exactly for every (budget, headFrac).
    val nHead = math.min(budget - 1, math.max(1, math.ceil(budget * headFrac).toInt))
    val nTail = budget - nHead
    docs.select(id.as("doc_id"), text.as("__text"))
      .select(col("doc_id"), flatten(transform(
        array(graft.functions.tokens(col("__text"))), tk => tk)).as("__tk"))
      .select(col("doc_id"),
        size(col("__tk")).cast("long").as("n_tokens"),
        when(size(col("__tk")) <= budget, size(col("__tk")).cast("long"))
          .otherwise(lit(nHead.toLong)).as("kept_head"),
        when(size(col("__tk")) <= budget, 0L)
          .otherwise(lit(nTail.toLong)).as("kept_tail"),
        (size(col("__tk")) > budget).as("was_truncated"),
        when(size(col("__tk")) <= budget, array_join(col("__tk"), " "))
          .otherwise(concat(
            array_join(slice(col("__tk"), 1, nHead), " "),
            lit(" " + marker + " "),
            array_join(slice(col("__tk"), -nTail, nTail), " ")))
          .as("truncated_text"))
  }
}
