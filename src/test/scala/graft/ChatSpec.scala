package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Chat

/** SURVEY §2.D80-D84: conversation / SFT-data operators over the flat
  * turn frame, hand-computed on a fixture corpus with every violation
  * class planted.
  */
class ChatSpec extends SparkSpec {
  import spark.implicits._

  // Fixture: four conversations.
  //   1: well-formed user/assistant/user/assistant
  //   2: role repeat (user, user) + missing final assistant
  //   3: blank middle turn
  //   4: single system-led turn (no user turn at all)
  private lazy val turns = Seq(
    (1L, 0, "user", "What is Spark?"),
    (1L, 1, "assistant", "A distributed query engine."),
    (1L, 2, "user", "Thanks!"),
    (1L, 3, "assistant", "Anytime."),
    (2L, 0, "user", "Hello there."),
    (2L, 1, "user", "Hello again?"),
    (3L, 0, "user", "What is Spark?"),
    (3L, 1, "assistant", "   "),
    (3L, 2, "user", "Hm?"),
    (3L, 3, "assistant", "Sorry - an engine."),
    (4L, 0, "system", "You are terse.")
  ).toDF("conv_id", "turn_idx", "role", "content")

  private def cols = (col("conv_id"), col("turn_idx"), col("role"), col("content"))

  test("assemble builds sorted turn arrays with shape columns") {
    val out = Chat.assemble(turns, cols._1, cols._2, cols._3, cols._4)
      .orderBy("conv_id")
    val rows = out.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    val c1 = rows(0)
    assert(c1.getAs[Long]("n_turns") == 4L)
    assert(c1.getAs[String]("first_role") == "user")
    assert(c1.getAs[String]("last_role") == "assistant")
    // array order follows turn_idx regardless of input order
    val shuffled = Chat.assemble(turns.orderBy(rand(7)), cols._1, cols._2, cols._3, cols._4)
      .where(col("conv_id") === 1L).select("turns").head()
    val arr = shuffled.getSeq[Row](0)
    assert(arr.map(_.getString(1)) == Seq(
      "What is Spark?", "A distributed query engine.", "Thanks!", "Anytime."))
    assert(arr.map(_.getString(0)) == Seq("user", "assistant", "user", "assistant"))
  }

  test("validate flags each planted violation in isolation") {
    val out = Chat.validate(turns, cols._1, cols._2, cols._3, cols._4)
      .orderBy("conv_id").collect()
    def flags(r: Row) = (r.getAs[Boolean]("starts_user"), r.getAs[Boolean]("alternates"),
      r.getAs[Boolean]("no_empty"), r.getAs[Boolean]("ends_assistant"),
      r.getAs[Boolean]("min_turns"), r.getAs[Boolean]("valid"))
    assert(flags(out(0)) == ((true, true, true, true, true, true)))
    assert(flags(out(1)) == ((true, false, true, false, true, false)))
    assert(flags(out(2)) == ((true, true, false, true, true, false)))
    assert(flags(out(3)) == ((false, true, true, false, false, false)))
  }

  test("validate is one exchange: the aggregate reuses the window's partitioning") {
    val plan = Chat.validate(turns, cols._1, cols._2, cols._3, cols._4)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("lossMask counts assistant-trainable tokens under the shared tokenizer") {
    val out = Chat.lossMask(turns, cols._1, cols._2, cols._3, cols._4)
      .orderBy("conv_id").collect()
    // conv 1: tokens 3+4+1+1 = 9, +4 turns * 4 overhead = 25 total;
    // assistant turns carry 4+1 = 5 trainable.
    val c1 = out(0)
    assert(c1.getAs[Long]("total_tokens") == 25L)
    assert(c1.getAs[Long]("trainable_tokens") == 5L)
    assert(c1.getAs[Double]("mask_ratio") == math.floor(5.0 / 25.0 * 1e4) / 1e4)
    // conv 4 has no assistant turn: zero trainable, ratio 0.
    val c4 = out(3)
    assert(c4.getAs[Long]("trainable_tokens") == 0L)
    assert(c4.getAs[Double]("mask_ratio") == 0.0)
  }

  test("promptDedup keeps the smallest conv_id per normalized first user turn") {
    val out = Chat.promptDedup(turns, cols._1, cols._2, cols._3, cols._4)
      .orderBy("conv_id").collect()
    // convs 1 and 3 share the prompt "What is Spark?" → keeper 1.
    assert(out(0).getAs[Long]("keeper") == 1L && out(0).getAs[Boolean]("kept"))
    assert(out(2).getAs[Long]("keeper") == 1L && !out(2).getAs[Boolean]("kept"))
    // conv 2 is its own keeper; conv 4 (no user turn) survives with null fp.
    assert(out(1).getAs[Long]("keeper") == 2L && out(1).getAs[Boolean]("kept"))
    assert(out(3).getAs[Long]("keeper") == 4L && out(3).getAs[Boolean]("kept"))
    assert(out(3).isNullAt(out(3).fieldIndex("prompt_fp")))
    // normalization: case/punct variants of the same prompt collide
    val variant = Seq((9L, 0, "user", "what is SPARK??")).toDF("conv_id", "turn_idx", "role", "content")
    val merged = Chat.promptDedup(turns.union(variant), cols._1, cols._2, cols._3, cols._4)
      .where(col("conv_id") === 9L).head()
    assert(merged.getAs[Long]("keeper") == 1L)
  }

  test("turnStats reports per-role mass and means") {
    val out = Chat.turnStats(turns, cols._1, cols._2, cols._3, cols._4)
      .orderBy("role").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("assistant", "system", "user"))
    val user = out(2)
    assert(user.getAs[Long]("n_turns") == 6L)
    assert(user.getAs[Long]("n_convs") == 3L)
    val asst = out(0)
    assert(asst.getAs[Long]("n_turns") == 4L)
    // "   " tokenizes to zero tokens but still counts as a turn;
    // "Sorry - an engine." drops the dash: sorry/an/engine = 3.
    assert(asst.getAs[Long]("total_tokens") == 4L + 1L + 0L + 3L)
  }

  test("truncatePlan: longest fitting suffix kept, system always survives, over-budget system drops all dialog") {
    import graft.operators.Chat
    // conv 1: system 10, dialog [100, 50, 80, 60], budget 200 →
    // remaining 190; suffix costs 60/140/190/290 → t1..t3 kept, t0 dropped
    val t = Seq(
      (1L, -1, "system", 10L), (1L, 0, "user", 100L), (1L, 1, "assistant", 50L),
      (1L, 2, "user", 80L), (1L, 3, "assistant", 60L),
      // conv 2: the system share alone exceeds the budget
      (2L, -1, "system", 300L), (2L, 0, "user", 5L), (2L, 1, "assistant", 5L))
      .toDF("c", "i", "r", "n")
    val out = Chat.truncatePlan(t, col("c"), col("i"), col("r"), col("n"),
        budget = 200L)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getBoolean(4), r.getString(5))).toMap
    assert(out((1L, -1)) == ((true, "system")))
    assert(out((1L, 0)) == ((false, "dropped")))
    assert(out((1L, 1)) == ((true, "kept")) && out((1L, 2)) == ((true, "kept"))
      && out((1L, 3)) == ((true, "kept")))
    assert(out((2L, -1)) == ((true, "system")))
    assert(out((2L, 0)) == ((false, "dropped")) && out((2L, 1)) == ((false, "dropped")))
  }
}
