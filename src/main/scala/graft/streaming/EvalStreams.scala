package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of the [[graft.operators.Eval]] family (SURVEY
  * §2.E21): rollout verdicts arrive as a stream (a sampling fleet
  * writes one row per chain as it finishes), and the consensus board
  * stays CURRENT per problem instead of re-aggregating the rollout
  * table per refresh.
  */
object EvalStreams {

  case class VoteIn(problem_key: Long, answer: Option[String])

  /** Per-problem vote state: the histogram of answers seen so far —
    * bounded by the problem's distinct-answer space (an eval answer
    * domain, not a corpus), plus the two totals.
    */
  case class MvState(nSamples: Long, nVoted: Long, counts: Map[String, Long])

  case class MvOut(
      problem_key: Long, n_samples: Long, n_voted: Long,
      n_distinct_answers: Long, consensus: Option[String],
      consensus_votes: Option[Long], agreement: Option[Double])

  /** Unsigned lexicographic order on UTF-8 bytes — Spark's binary
    * string comparison, which JVM `String.compareTo` (UTF-16 code
    * units) disagrees with for supplementary-plane characters.
    */
  private[graft] val utf8Ordering: Ordering[String] =
    (x: String, y: String) => {
      val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(a.length, b.length)
      var r = 0
      while (r == 0 && i < n) {
        r = java.lang.Integer.compare(a(i) & 0xff, b(i) & 0xff)
        i += 1
      }
      if (r != 0) r else java.lang.Integer.compare(a.length, b.length)
    }

  case class GradeIn(problem_key: Long, correct: Option[Boolean])

  case class PkState(n: Long, c: Long)

  case class PkOut(
      problem_key: Long, n_samples: Long, n_correct: Long,
      pass_at_k: Option[Double], undersampled: Boolean)

  /** E22: streaming pass@k — the stateful twin of
    * [[graft.operators.Eval.passAtK]]: graded rollouts stream in, the
    * per-problem estimate stays CURRENT. State is TWO longs per
    * problem (attempts, correct); each touching micro-batch emits the
    * problem's current row, last emission == batch digit for digit
    * (the same integer product lanes, single double division, 4-dp
    * floor; n−c < k short-circuits to exactly 1.0, n < k reports
    * NULL + `undersampled`). A NULL verdict counts toward `n_samples`
    * and not `n_correct` — the batch aggregate's semantics — instead
    * of killing the query on a non-nullable encoder field (caught in
    * review). NULL problem keys are dropped: streaming state needs an
    * addressable key (batch reports them as one NULL-keyed row — the
    * one documented divergence). No watermark — counts never
    * un-count. Past the exact-lane bound ⌊2^(63/k)⌋ the product
    * switches to double ratios exactly like batch.
    */
  def passAtKStream(grades: DataFrame, k: Int): Dataset[PkOut] = {
    require(k >= 1 && k <= 8, s"k must be in [1, 8], got $k")
    implicit val inEnc = Encoders.product[GradeIn]
    implicit val outEnc = Encoders.product[PkOut]
    implicit val stEnc = Encoders.product[PkState]
    implicit val longEnc = Encoders.scalaLong
    val nMaxExact = graft.operators.Eval.exactLaneBound(k)
    grades.select(col("problem_key").cast("long"),
        col("correct").cast("boolean"))
      .filter(col("problem_key").isNotNull)
      .as[GradeIn]
      .groupByKey(_.problem_key)
      .flatMapGroupsWithState[PkState, PkOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (pk: Long, rows: Iterator[GradeIn], state: GroupState[PkState]) =>
          var st = state.getOption.getOrElse(PkState(0L, 0L))
          rows.foreach { r =>
            st = PkState(st.n + 1, st.c + (if (r.correct.contains(true)) 1L else 0L))
          }
          state.update(st)
          if (st.n == 0L) Iterator.empty
          else {
            val f = st.n - st.c
            val pk4 =
              if (st.n < k) None
              else if (f < k) Some(1.0)
              else if (st.n <= nMaxExact) {
                val num = (0 until k).map(i => f - i).product
                val den = (0 until k).map(i => st.n - i).product
                Some(math.floor((1.0 - num.toDouble / den.toDouble) * 1e4) / 1e4)
              } else {
                val ratio = (0 until k)
                  .map(i => (f - i).toDouble / (st.n - i).toDouble).product
                Some(math.floor((1.0 - ratio) * 1e4) / 1e4)
              }
            Iterator.single(PkOut(pk, st.n, st.c, pk4, st.n < k))
          }
      }
  }

  /** E21: streaming self-consistency majority vote — the stateful twin
    * of [[graft.operators.Eval.majorityVote]]. Each micro-batch that
    * touches a problem emits ONE row with the problem's CURRENT
    * consensus, so the last emitted row per problem equals the batch
    * operator's row exactly once all chains have arrived (the
    * E19/D81 delivery contract, proven across batch splits in the
    * spec). Tie-break, abstention handling (NULL answers count toward
    * `n_samples`, never toward the vote or the agreement denominator),
    * and the 4-dp-floor agreement replay batch digit for digit.
    *
    * State per problem is the answer HISTOGRAM — bounded by the
    * answer domain (numeric finals, option letters), not by chains:
    * 10k chains over 40 distinct answers hold 40 map entries. No
    * watermark (a consensus never un-counts; wrap with a TTL timeout
    * for state GC once an eval round closes). NULL problem keys are
    * dropped (streaming state needs an addressable key — the E22
    * contract); the answer tie-break compares UTF-8 BYTES, not JVM
    * UTF-16 code units, because that is the order Spark's
    * min-over-struct uses in batch — the two disagree on
    * supplementary-plane answers (caught in review).
    */
  def majorityVoteStream(votes: DataFrame): Dataset[MvOut] = {
    implicit val inEnc = Encoders.product[VoteIn]
    implicit val outEnc = Encoders.product[MvOut]
    implicit val stEnc = Encoders.product[MvState]
    implicit val longEnc = Encoders.scalaLong
    votes.select(col("problem_key").cast("long"),
        col("answer").cast("string"))
      .filter(col("problem_key").isNotNull)
      .as[VoteIn]
      .groupByKey(_.problem_key)
      .flatMapGroupsWithState[MvState, MvOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (pk: Long, rows: Iterator[VoteIn], state: GroupState[MvState]) =>
          var st = state.getOption.getOrElse(MvState(0L, 0L, Map.empty))
          rows.foreach { r =>
            st = r.answer match {
              case Some(a) => MvState(st.nSamples + 1, st.nVoted + 1,
                st.counts.updated(a, st.counts.getOrElse(a, 0L) + 1L))
              case None => MvState(st.nSamples + 1, st.nVoted, st.counts)
            }
          }
          state.update(st)
          if (st.nSamples == 0L) Iterator.empty
          else if (st.counts.isEmpty)
            Iterator.single(MvOut(pk, st.nSamples, 0L, 0L, None, None, None))
          else {
            // (count desc, answer asc in UTF-8 byte order) — the batch
            // min-over-struct rule
            val (ans, cnt) = st.counts.minBy { case (a, c) => (-c, a) }(
              Ordering.Tuple2(Ordering.Long, utf8Ordering))
            // batch t4floor replayed: floor((votes / voted) * 1e4) / 1e4
            val agree = math.floor(cnt.toDouble / st.nVoted * 1e4) / 1e4
            Iterator.single(MvOut(pk, st.nSamples, st.nVoted,
              st.counts.size.toLong, Some(ans), Some(cnt), Some(agree)))
          }
      }
  }

  case class RetIn(query_id: Long, doc_id: Long, rank: Int)

  /** Per-query retrieval state: hit count, first relevant rank (0 =
    * none yet), DCG as exact 7-dp integer micro-units (the discounts
    * are 7-dp decimals, so the sum is exact integer addition — the
    * batch operator's decimal lanes).
    */
  case class RetState(hits: Long, first: Int, dcg7: Long)

  case class RetOut(
      query_id: Long, n_gold: Long, hits: Long,
      precision_at_k: Double, recall_at_k: Double,
      mrr: Double, ndcg_at_k: Double)

  /** E29: streaming retrieval metrics — the stateful twin of
    * [[graft.operators.Eval.retrievalMetrics]]: ranked results stream
    * in (a serving tier logs one row per returned doc), the
    * per-query scoreboard stays CURRENT. The gold relevance set is
    * DRIVER METADATA (benchmark-suite-sized, the broadcast contract —
    * same reasoning as the E16 decontamination Bloom): a
    * query_id → relevant-doc-set map compiled into the stream.
    *
    * State is (hits, first-relevant rank, dcg) — three numbers per
    * query; each touching micro-batch emits the query's current row,
    * and the LAST emission equals the batch operator digit for digit
    * (same 7-dp discount decimals, same 4-dp HALF_UP rounds, same
    * idcg lookup at min(k, n_gold)). Duplicate (doc, rank) rows count
    * twice, exactly as the batch join does. One documented
    * divergence, the E22 NULL-key precedent: gold queries the stream
    * NEVER touches can't emit (no state to key) — the batch
    * operator's full join surfaces them as all-zero rows; reconcile
    * with one batch pass when completeness matters. No watermark —
    * results never un-rank.
    */
  def retrievalMetricsStream(
      results: DataFrame,
      gold: Map[Long, Set[Long]],
      k: Int): Dataset[RetOut] = {
    require(k >= 1 && k <= 100, "k in [1, 100]")
    implicit val inEnc = Encoders.product[RetIn]
    implicit val outEnc = Encoders.product[RetOut]
    implicit val stEnc = Encoders.product[RetState]
    implicit val longEnc = Encoders.scalaLong
    val disc7: Array[Long] = (1 to k).map(i =>
      math.round(graft.operators.Eval.ndcgDiscount(i) * 1e7)).toArray
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    results.select(col("query_id").cast("long"), col("doc_id").cast("long"),
        col("rank").cast("int"))
      .filter(col("query_id").isNotNull &&
        col("rank") >= 1 && col("rank") <= k)
      .as[RetIn]
      .groupByKey(_.query_id)
      .flatMapGroupsWithState[RetState, RetOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (q: Long, rows: Iterator[RetIn], state: GroupState[RetState]) =>
          val rel = gold.getOrElse(q, Set.empty)
          var st = state.getOption.getOrElse(RetState(0L, 0, 0L))
          rows.foreach { r =>
            if (rel.contains(r.doc_id)) {
              st = RetState(st.hits + 1,
                if (st.first == 0 || r.rank < st.first) r.rank else st.first,
                st.dcg7 + disc7(r.rank - 1))
            }
          }
          state.update(st)
          val nGold = rel.size.toLong
          val recall =
            if (nGold == 0) 0.0 else r4(st.hits.toDouble / nGold)
          val ndcg =
            if (nGold == 0 || st.hits == 0) 0.0
            else r4(st.dcg7.toDouble / 1e7 /
              graft.operators.Eval.idcgAt(math.min(k.toLong, nGold).toInt))
          val mrr = if (st.first == 0) 0.0 else r4(1.0 / st.first)
          Iterator.single(RetOut(q, nGold, st.hits,
            r4(st.hits.toDouble / k), recall, mrr, ndcg))
      }
  }
}
