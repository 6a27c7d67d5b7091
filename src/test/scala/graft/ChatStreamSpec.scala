package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Chat, TextMetrics}
import graft.streaming.ChatStreams

/** E19: streaming conversation validation == batch Chat.validate,
  * proven across micro-batch splits on both a violation fixture and
  * real documents.
  */
class ChatStreamSpec extends SparkSpec {
  import spark.implicits._

  private def lastPerConv(table: String): Map[Long, Row] =
    spark.table(table).collect()
      .groupBy(_.getAs[Long]("conv_id"))
      .map { case (k, rows) => k -> rows.maxBy(_.getAs[Long]("n_turns")) }

  private def batchRows(df: org.apache.spark.sql.DataFrame): Map[Long, Row] =
    Chat.validate(df, col("conv_id"), col("turn_idx"), col("role"), col("content"))
      .collect().map(r => r.getAs[Long]("conv_id") -> r).toMap

  private val flagCols = Seq("n_turns", "starts_user", "alternates", "no_empty",
    "ends_assistant", "min_turns", "valid")

  private def assertSame(streamed: Map[Long, Row], batch: Map[Long, Row]): Unit = {
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (cid, s) =>
      val b = batch(cid)
      flagCols.foreach { c =>
        assert(s.getAs[Any](c) == b.getAs[Any](c),
          s"conv $cid flag $c: stream=${s.getAs[Any](c)} batch=${b.getAs[Any](c)}")
      }
    }
  }

  test("E19 stream == batch: validator fixture with a violation spanning the batch split") {
    val input = MemoryStream[(Long, Int, String, String)](spark)
    val df = input.toDF().toDF("conv_id", "turn_idx", "role", "content")
    val q = ChatStreams.validateStream(df)
      .writeStream.format("memory").queryName("e19_out").outputMode("append").start()
    try {
      // batch 1: conv 1 first half; conv 2's FIRST user turn (its
      // repeated-role partner arrives in batch 2 — the cross-batch
      // lastRole proof); conv 4 complete (system-led singleton)
      input.addData(
        (1L, 0, "user", "What is Spark?"),
        (1L, 1, "assistant", "A distributed query engine."),
        (2L, 0, "user", "Hello there."),
        (4L, 0, "system", "You are terse."))
      q.processAllAvailable()
      // batch 2: rest of conv 1; conv 2's repeat; conv 3 with blank turn
      input.addData(
        (1L, 2, "user", "Thanks!"),
        (1L, 3, "assistant", "Anytime."),
        (2L, 1, "user", "Hello again?"),
        (3L, 0, "user", "What is Spark?"),
        (3L, 1, "assistant", "   "),
        (3L, 2, "user", "Hm?"),
        (3L, 3, "assistant", "Sorry - an engine."))
      q.processAllAvailable()

      val all = Seq(
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
      assertSame(lastPerConv("e19_out"), batchRows(all))

      // and the cross-batch violation is actually flagged
      val c2 = lastPerConv("e19_out")(2L)
      assert(!c2.getAs[Boolean]("alternates"))
    } finally q.stop()
  }

  test("E19 stream == batch over real documents split mid-conversation") {
    val docs = table(spark, sf, "documents")
    val turns = TextMetrics.splitSentences(
        docs.select(col("doc_id"), concat(col("text"), lit(". Tail! Done.")).as("text")),
        col("doc_id"), col("text"))
      .select(col("id").as("conv_id"), col("sent_pos").cast("int").as("turn_idx"),
        when(col("sent_pos") % 2 === 0, lit("user")).otherwise(lit("assistant")).as("role"),
        col("sentence").as("content"))
      .cache()
    val rows = turns.as[(Long, Int, String, String)].collect()

    val input = MemoryStream[(Long, Int, String, String)](spark)
    val df = input.toDF().toDF("conv_id", "turn_idx", "role", "content")
    val q = ChatStreams.validateStream(df)
      .writeStream.format("memory").queryName("e19_docs").outputMode("append").start()
    try {
      // per-conv turn order across batches: early turns first
      input.addData(rows.filter(_._2 < 2).toSeq)
      q.processAllAvailable()
      input.addData(rows.filter(_._2 >= 2).toSeq)
      q.processAllAvailable()
      assertSame(lastPerConv("e19_docs"), batchRows(turns.toDF()))
    } finally {
      q.stop()
      turns.unpersist()
    }
  }

  private def table(s: org.apache.spark.sql.SparkSession, dir: String, name: String) =
    graft.sources.Tables.load(s, dir, name)
}
