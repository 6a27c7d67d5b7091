package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of the [[graft.operators.Chat]] family (SURVEY
  * §2.E19): conversations arrive as turn streams (a live chat ingest
  * writes turns as they happen; a backfill replays shards), and the
  * validator keeps the per-conversation verdict CURRENT instead of
  * re-scanning the corpus.
  */
object ChatStreams {

  case class TurnIn(conv_id: Long, turn_idx: Int, role: String, content: String)

  /** Per-conversation validator state — O(1): counts and role
    * bookkeeping only, never the turns themselves.
    */
  case class CvState(
      nTurns: Long, firstRole: String, lastRole: String,
      alternates: Boolean, noEmpty: Boolean)

  case class CvOut(
      conv_id: Long, n_turns: Long, starts_user: Boolean, alternates: Boolean,
      no_empty: Boolean, ends_assistant: Boolean, min_turns: Boolean,
      valid: Boolean)

  /** E19: streaming conversation validation — the stateful twin of
    * [[graft.operators.Chat.validate]]. Per conversation the state
    * carries (n_turns, first/last role, alternates-so-far,
    * no-empty-so-far); each micro-batch that touches a conversation
    * emits ONE row with the conversation's CURRENT flags, so the last
    * emitted row per conversation equals the batch operator's row
    * exactly once its turns have all arrived (the spec's claim, proven
    * across batch splits). A dashboard keyed on conv_id upserts these
    * into a live validity board; `min_turns`/`valid` flip as the
    * conversation grows, the monotone-false flags (alternates,
    * no_empty) never recover — same semantics as batch on the same
    * prefix.
    *
    * O(1) state per conversation, no watermark (a verdict never needs
    * eviction to stay correct; callers wanting state GC can wrap the
    * call with a TTL timeout). Ordering contract as
    * [[EventStreams.funnelStream]]: per-key delivery in `turn_idx`
    * order ACROSS batches; within a batch rows sort here.
    */
  def validateStream(turns: DataFrame, minTurns: Int = 2): Dataset[CvOut] = {
    implicit val inEnc = Encoders.product[TurnIn]
    implicit val outEnc = Encoders.product[CvOut]
    implicit val stEnc = Encoders.product[CvState]
    implicit val longEnc = Encoders.scalaLong
    turns.select(col("conv_id").cast("long"), col("turn_idx").cast("int"),
        col("role").cast("string"), col("content").cast("string"))
      .as[TurnIn]
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[CvState, CvOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (cid: Long, rows: Iterator[TurnIn], state: GroupState[CvState]) =>
          var st = state.getOption.getOrElse(
            CvState(0L, null, null, alternates = true, noEmpty = true))
          rows.toSeq.sortBy(_.turn_idx).foreach { r =>
            st = CvState(
              nTurns = st.nTurns + 1,
              firstRole = if (st.nTurns == 0L) r.role else st.firstRole,
              lastRole = r.role,
              alternates = st.alternates && (st.nTurns == 0L || r.role != st.lastRole),
              noEmpty = st.noEmpty && r.content.trim.nonEmpty)
          }
          state.update(st)
          if (st.nTurns == 0L) Iterator.empty
          else {
            val startsUser = st.firstRole == "user"
            val endsAssistant = st.lastRole == "assistant"
            val minOk = st.nTurns >= minTurns
            Iterator.single(CvOut(cid, st.nTurns, startsUser, st.alternates,
              st.noEmpty, endsAssistant, minOk,
              startsUser && st.alternates && st.noEmpty && endsAssistant && minOk))
          }
      }
  }
}
