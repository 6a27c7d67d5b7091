package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{normFingerprint, tokens}

/** Conversation / SFT-data operators over the canonical FLAT turn frame
  * `(conv_id, turn_idx, role, content)` — one row per turn, ordered by
  * `turn_idx` within a conversation.
  *
  * The flat frame, not array-of-structs, is the scale-native shape: a
  * 100 TB chat corpus has conversations of wildly varying length, and a
  * per-conversation array materializes the whole conversation in one
  * aggregation buffer (collect_list has no partial aggregation and a
  * single mega-thread dialog can blow an executor). Every operator here
  * is either a pure projection, a partial-aggregable `groupBy(conv_id)`,
  * or a `Window.partitionBy(conv_id)` whose hash partitioning the
  * following aggregate REUSES (one exchange total — pinned in
  * ChatSpec's plan assertion). Assembly into arrays is offered for
  * hand-off to trainers ([[assemble]]) but is deliberately the LAST
  * step of a pipeline, never an intermediate.
  *
  * The reference corpus (msamuelms/epe_data_wrangling) has no chat
  * data — this family is part of the training-data surface the engine
  * adds on top (see SURVEY §2.D80-D84), in the shape ChatML-style SFT
  * pipelines need: structural validation, loss-mask accounting,
  * prompt-level dedup.
  */
object Chat {

  private def turnCols(df: DataFrame, convId: Column, turnIdx: Column,
      role: Column, content: Column): DataFrame =
    df.select(convId.as("conv_id"), turnIdx.as("turn_idx"),
      role.as("role"), content.as("content"))

  /** Flat turns → one row per conversation with the turn array
    * (`array<struct<role,content>>` sorted by `turn_idx`) plus the
    * scalar shape columns trainers filter on. `array_sort` on the
    * collected `(turn_idx, role, content)` structs gives deterministic
    * order regardless of shuffle arrival; the struct's FIRST field is
    * the sort key by struct-comparison semantics.
    *
    * One shuffle (the groupBy); the array is built once, at the edge.
    */
  def assemble(df: DataFrame, convId: Column, turnIdx: Column,
      role: Column, content: Column): DataFrame = {
    val t = turnCols(df, convId, turnIdx, role, content)
    t.groupBy("conv_id")
      .agg(
        count(lit(1)).as("n_turns"),
        min_by(col("role"), col("turn_idx")).as("first_role"),
        max_by(col("role"), col("turn_idx")).as("last_role"),
        sum(length(col("content"))).as("total_chars"),
        array_sort(collect_list(struct(col("turn_idx"), col("role"), col("content"))))
          .as("sorted"))
      .withColumn("turns",
        transform(col("sorted"), s => struct(s("role"), s("content"))))
      .drop("sorted")
  }

  /** Structural validation per conversation — the gate in front of any
    * SFT trainer. Flags (all boolean, reported separately so attrition
    * analysis can see WHICH rule eats the corpus, same discipline as
    * the Gopher gate):
    *
    *   - `starts_user`:     first turn's role is `user`
    *   - `alternates`:      no two consecutive turns share a role
    *   - `no_empty`:        every turn has non-whitespace content
    *   - `ends_assistant`:  last turn's role is `assistant`
    *   - `min_turns`:       at least `minTurns` turns
    *   - `valid`:           conjunction of the above
    *
    * Shape: one `lag` window over `(conv_id, turn_idx)` computes the
    * consecutive-role comparison per row, then `groupBy(conv_id)` with
    * `bool_and`/`min_by`/`max_by` — all partial-aggregable. The
    * aggregate's required hash partitioning on `conv_id` is already
    * satisfied by the window's, so the whole operator is ONE exchange.
    */
  def validate(df: DataFrame, convId: Column, turnIdx: Column,
      role: Column, content: Column, minTurns: Int = 2): DataFrame = {
    val t = turnCols(df, convId, turnIdx, role, content)
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t.withColumn("__prev_role", lag(col("role"), 1).over(w))
      .groupBy("conv_id")
      .agg(
        count(lit(1)).as("n_turns"),
        (min_by(col("role"), col("turn_idx")) === "user").as("starts_user"),
        bool_and(col("__prev_role").isNull || col("role") =!= col("__prev_role"))
          .as("alternates"),
        bool_and(length(trim(col("content"))) > 0).as("no_empty"),
        (max_by(col("role"), col("turn_idx")) === "assistant").as("ends_assistant"))
      .withColumn("min_turns", col("n_turns") >= minTurns)
      .withColumn("valid",
        col("starts_user") && col("alternates") && col("no_empty") &&
          col("ends_assistant") && col("min_turns"))
  }

  /** Loss-mask token accounting per conversation: under the standard
    * SFT recipe only ASSISTANT turns are trainable (user/system tokens
    * are attention context but masked out of the loss), and every turn
    * costs a fixed chat-template overhead (`<|im_start|>role\n` …
    * `<|im_end|>` framing — `overheadPerTurn` tokens, default 4).
    *
    *   total_tokens     = Σ tokens(content) + overhead·n_turns
    *   trainable_tokens = Σ tokens(content) over assistant turns
    *   mask_ratio       = trainable / total, 4-dp floor
    *
    * Token counts use the shared whitespace tokenizer contract
    * ([[graft.functions.tokens]] — the same `tkSql` every text oracle
    * replays). Pure projection + ONE partial-aggregable groupBy; the
    * per-turn tokenize runs map-side, so the shuffle carries only
    * per-conversation partial sums.
    */
  def lossMask(df: DataFrame, convId: Column, turnIdx: Column,
      role: Column, content: Column, overheadPerTurn: Int = 4): DataFrame = {
    val t = turnCols(df, convId, turnIdx, role, content)
    val nTok = size(tokens(col("content"))).cast("long")
    t.select(col("conv_id"), col("role"), nTok.as("__n_tok"))
      .groupBy("conv_id")
      .agg(
        count(lit(1)).as("n_turns"),
        (sum(col("__n_tok")) + count(lit(1)) * overheadPerTurn).as("total_tokens"),
        coalesce(sum(when(col("role") === "assistant", col("__n_tok"))), lit(0L))
          .as("trainable_tokens"))
      .withColumn("mask_ratio",
        Num.t4floor(col("trainable_tokens").cast("double") / col("total_tokens")))
  }

  /** Prompt-level dedup: conversations whose FIRST USER TURN normalizes
    * to the same fingerprint are duplicates of the same task — the
    * standard SFT near-dup axis (the assistant side varies per sample;
    * the prompt is the identity). Keeps the smallest `conv_id` per
    * fingerprint; emits one row per conversation with its fingerprint,
    * the keeper, and the verdict, so callers can either filter
    * (`kept`) or audit group sizes.
    *
    * Shape: filter to user turns → `min_by` per conversation (one
    * partial-aggregable shuffle on conv_id) → fingerprint → per-
    * fingerprint keeper via a second aggregate + an equi-join back on
    * the fingerprint. Fingerprint groups are duplicate clusters —
    * bounded small by construction — so AQE plans the join's build
    * side locally; conversations with NO user turn get fingerprint
    * `null` and are their own keeper (flag-not-crash).
    */
  def promptDedup(df: DataFrame, convId: Column, turnIdx: Column,
      role: Column, content: Column): DataFrame = {
    val t = turnCols(df, convId, turnIdx, role, content)
    val firstUser = t.where(col("role") === "user")
      .groupBy("conv_id")
      .agg(min_by(col("content"), col("turn_idx")).as("__prompt"))
      .select(col("conv_id"), normFingerprint(col("__prompt")).as("prompt_fp"))
    val allConvs = t.select(col("conv_id")).distinct()
      .join(firstUser, Seq("conv_id"), "left")
    val keepers = firstUser.groupBy("prompt_fp")
      .agg(min(col("conv_id")).as("keeper"))
    allConvs.join(keepers, Seq("prompt_fp"), "left")
      .select(col("conv_id"), col("prompt_fp"),
        coalesce(col("keeper"), col("conv_id")).as("keeper"))
      .withColumn("kept", col("conv_id") === col("keeper"))
  }

  /** Corpus-level per-role shape report: turn counts, conversation
    * reach, char/token mass and 4-dp-floor means per role — the first
    * thing to look at when an SFT mix is assembled from many sources
    * (a corpus whose `system` role carries 40% of the tokens is a
    * template bug). ONE partial-aggregable groupBy on `role` (distinct
    * conversations per role via exact `count(DISTINCT conv_id)` —
    * role cardinality is ~3, the re-shuffle is trivial).
    */
  def turnStats(df: DataFrame, convId: Column, turnIdx: Column,
      role: Column, content: Column): DataFrame = {
    val t = turnCols(df, convId, turnIdx, role, content)
    t.select(col("conv_id"), col("role"),
        length(col("content")).cast("long").as("__chars"),
        size(tokens(col("content"))).cast("long").as("__toks"))
      .groupBy("role")
      .agg(
        count(lit(1)).as("n_turns"),
        countDistinct(col("conv_id")).as("n_convs"),
        sum(col("__chars")).as("total_chars"),
        sum(col("__toks")).as("total_tokens"))
      .withColumn("avg_chars",
        Num.t4floor(col("total_chars").cast("double") / col("n_turns")))
      .withColumn("avg_tokens",
        Num.t4floor(col("total_tokens").cast("double") / col("n_turns")))
  }

  /** Context-window truncation planner — the SFT preprocessing step
    * for conversations longer than the training window: keep every
    * `system` turn plus the LONGEST SUFFIX of dialog turns that fits
    * the remaining budget (recency wins — the standard chat-template
    * policy; dropping the tail instead would discard exactly the
    * turns the next reply conditions on). Per turn: kept flag and a
    * reason (`system` / `kept` / `dropped`), so the caller can
    * rebuild the truncated conversation or aggregate an attrition
    * report. A system share that alone exceeds the budget still
    * keeps system turns (flagged by every dialog turn dropping).
    *
    * Shape: two windows per conversation key — one unordered sum for
    * the system share, one turn-DESC running sum for the suffix cost
    * — one exchange; exact integer token accounting throughout; ties
    * impossible by contract (turn_idx unique per conversation, the
    * chat-family input rule).
    */
  def truncatePlan(df: DataFrame, convId: Column, turnIdx: Column,
      role: Column, nTokens: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val t = df.select(convId.as("conv_id"), turnIdx.cast("int").as("turn_idx"),
      role.as("role"), nTokens.cast("long").as("n_tokens"))
    val wc = org.apache.spark.sql.expressions.Window.partitionBy("conv_id")
    val wDesc = org.apache.spark.sql.expressions.Window
      .partitionBy("conv_id").orderBy(col("turn_idx").desc)
      .rowsBetween(Long.MinValue, 0)
    val staged = t
      .withColumn("__sys",
        sum(when(col("role") === "system", col("n_tokens")).otherwise(0L)).over(wc))
      .withColumn("__suf",
        sum(when(col("role") =!= "system", col("n_tokens")).otherwise(0L)).over(wDesc))
    val kept = col("role") === "system" ||
      col("__suf") <= greatest(lit(budget) - col("__sys"), lit(0L))
    staged.select(col("conv_id"), col("turn_idx"), col("role"), col("n_tokens"),
      kept.as("kept"),
      when(col("role") === "system", lit("system"))
        .when(kept, lit("kept")).otherwise(lit("dropped")).as("reason"))
  }
}
