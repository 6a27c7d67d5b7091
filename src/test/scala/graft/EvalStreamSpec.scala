package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Eval
import graft.streaming.EvalStreams

/** E21: streaming majority vote == batch Eval.majorityVote, proven
  * across micro-batch splits including a consensus lead change and a
  * tie resolved by the lexicographic rule.
  */
class EvalStreamSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("n_samples", "n_voted", "n_distinct_answers",
    "consensus", "consensus_votes", "agreement")

  private def lastPerProblem(table: String): Map[Long, Row] =
    spark.table(table).collect()
      .groupBy(_.getAs[Long]("problem_key"))
      .map { case (k, rows) => k -> rows.maxBy(_.getAs[Long]("n_samples")) }

  private def batchRows(df: org.apache.spark.sql.DataFrame): Map[Long, Row] =
    Eval.majorityVote(df, col("problem_key"), col("answer"))
      .collect().map(r => r.getAs[Long]("problem_key") -> r).toMap

  private def assertSame(streamed: Map[Long, Row], batch: Map[Long, Row]): Unit = {
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (pk, s) =>
      val b = batch(pk)
      cols.foreach { c =>
        assert(s.getAs[Any](c) == b.getAs[Any](c),
          s"problem $pk col $c: stream=${s.getAs[Any](c)} batch=${b.getAs[Any](c)}")
      }
    }
  }

  test("E21 stream == batch across a lead change, a tie, and abstentions") {
    val input = MemoryStream[(Long, Option[String])](spark)
    val df = input.toDF().toDF("problem_key", "answer")
    val q = EvalStreams.majorityVoteStream(df)
      .writeStream.format("memory").queryName("e21_out").outputMode("append").start()
    try {
      // batch 1: problem 1 leads with b; problem 2 all abstained so far
      input.addData((1L, Some("b")), (1L, Some("b")), (1L, Some("a")),
        (2L, None), (2L, None))
      q.processAllAvailable()
      val mid = lastPerProblem("e21_out")
      assert(mid(1L).getAs[String]("consensus") == "b")
      assert(mid(2L).isNullAt(mid(2L).fieldIndex("consensus")))

      // batch 2: problem 1's lead flips to a; problem 2 gets one vote
      input.addData((1L, Some("a")), (1L, Some("a")), (2L, Some("z")))
      q.processAllAvailable()
      assert(lastPerProblem("e21_out")(1L).getAs[String]("consensus") == "a")

      // batch 3: back to a 3-3 tie — lexicographic rule keeps a; one
      // more abstention on problem 1 grows n_samples only
      input.addData((1L, Some("b")), (1L, None))
      q.processAllAvailable()

      val all = Seq(
        (1L, Some("b")), (1L, Some("b")), (1L, Some("a")),
        (2L, None: Option[String]), (2L, None: Option[String]),
        (1L, Some("a")), (1L, Some("a")), (2L, Some("z")),
        (1L, Some("b")), (1L, None: Option[String])
      ).toDF("problem_key", "answer")
      assertSame(lastPerProblem("e21_out"), batchRows(all))
      val p1 = lastPerProblem("e21_out")(1L)
      assert(p1.getAs[String]("consensus") == "a")
      assert(p1.getAs[Long]("n_samples") == 7L)
      assert(p1.getAs[Long]("n_voted") == 6L)
      assert(p1.getAs[Double]("agreement") == 0.5)
    } finally q.stop()
  }

  test("E22 stream == batch pass@k across batch splits, incl. short-circuit and undersampled") {
    val input = MemoryStream[(Long, Boolean)](spark)
    val df = input.toDF().toDF("problem_key", "correct")
    val q = EvalStreams.passAtKStream(df, k = 2)
      .writeStream.format("memory").queryName("e22_out").outputMode("append").start()
    try {
      // batch 1: problem 1 at n=3 (1 correct); problem 2 undersampled (n=1)
      input.addData((1L, true), (1L, false), (1L, false), (2L, true))
      q.processAllAvailable()
      val mid = spark.table("e22_out").collect()
        .groupBy(_.getAs[Long]("problem_key"))
        .map { case (k0, rs) => k0 -> rs.maxBy(_.getAs[Long]("n_samples")) }
      assert(mid(2L).getAs[Boolean]("undersampled"))
      assert(mid(2L).isNullAt(mid(2L).fieldIndex("pass_at_k")))

      // batch 2: problem 1 grows to n=5 c=2; problem 2 to n=4 c=3
      // (failures 1 < k → exactly 1.0)
      input.addData((1L, true), (1L, false),
        (2L, true), (2L, true), (2L, false))
      q.processAllAvailable()

      val all = Seq((1L, true), (1L, false), (1L, false), (2L, true),
        (1L, true), (1L, false), (2L, true), (2L, true), (2L, false))
        .toDF("problem_key", "correct")
      val batch = graft.operators.Eval.passAtK(all, col("problem_key"),
        col("correct"), k = 2)
        .collect().map(r => r.getAs[Long]("problem_key") -> r).toMap
      val last = spark.table("e22_out").collect()
        .groupBy(_.getAs[Long]("problem_key"))
        .map { case (k0, rs) => k0 -> rs.maxBy(_.getAs[Long]("n_samples")) }
      last.foreach { case (pk, s) =>
        val b = batch(pk)
        assert(s.getAs[Long]("n_samples") == b.getAs[Long]("n_samples"))
        assert(s.getAs[Long]("n_correct") == b.getAs[Long]("n_correct"))
        assert(s.getAs[Any]("pass_at_k") == b.getAs[Any]("pass_at_2"),
          s"problem $pk: stream=${s.getAs[Any]("pass_at_k")} batch=${b.getAs[Any]("pass_at_2")}")
        assert(s.getAs[Boolean]("undersampled") == b.getAs[Boolean]("undersampled"))
      }
      assert(last(2L).getAs[Double]("pass_at_k") == 1.0) // short-circuit
    } finally q.stop()
  }

  test("utf8Ordering matches Spark's binary string order on supplementary-plane answers") {
    // ﬁ (U+FB01, 3 UTF-8 bytes EF AC 81) vs 𝟙 (U+1D7D9, 4 bytes F0 9D 9F 99):
    // UTF-8 bytes put ﬁ first; UTF-16 code units put the surrogate first
    val fi = "ﬁ"
    val one = "𝟙"
    assert(graft.streaming.EvalStreams.utf8Ordering.compare(fi, one) < 0)
    assert(fi.compareTo(one) > 0) // the JVM order the kernel must NOT use
    // agree with Spark's min-over-struct on the same pair
    val sparkMin = Seq((1L, fi), (1L, one)).toDF("k", "a")
      .groupBy("k").agg(min(struct(lit(0L).as("z"), col("a"))).as("s"))
      .collect()(0).getAs[org.apache.spark.sql.Row]("s").getString(1)
    assert(sparkMin == fi)
  }

  test("E22 passAtKStream tolerates NULL verdicts like batch instead of dying") {
    val input = MemoryStream[(Long, Option[Boolean])](spark)
    val df = input.toDF().toDF("problem_key", "correct")
    val q = EvalStreams.passAtKStream(df, k = 2)
      .writeStream.format("memory").queryName("e22_null").outputMode("append").start()
    try {
      input.addData((1L, Some(true)), (1L, None), (1L, Some(false)))
      q.processAllAvailable()
      val rows = spark.table("e22_null").collect()
      val last = rows.maxBy(_.getAs[Long]("n_samples"))
      assert(last.getAs[Long]("n_samples") == 3L) // null counted in n
      assert(last.getAs[Long]("n_correct") == 1L) // but not in c
      val batch = graft.operators.Eval.passAtK(
        Seq((1L, Some(true)), (1L, None: Option[Boolean]), (1L, Some(false)))
          .toDF("problem_key", "correct"),
        col("problem_key"), col("correct"), k = 2).collect()(0)
      assert(last.getAs[Double]("pass_at_k") == batch.getAs[Double]("pass_at_2"))
    } finally q.stop()
  }

  test("E29 stream == batch retrieval metrics across a batch split; gold-only divergence documented") {
    // gold: q1 -> {10, 11, 12}; q2 -> {20}; q3 -> {30} (never
    // retrieved — the documented stream divergence); q4 absent from
    // gold but retrieved. k = 3. q1's relevant docs straddle the
    // batch split so hits/first/dcg carry through state; rank 4 rows
    // must not count; a duplicated (q2, 20, rank 1) counts twice,
    // mirroring the batch join.
    val gold = Map(1L -> Set(10L, 11L, 12L), 2L -> Set(20L), 3L -> Set(30L))
    val goldDf = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (3L, 30L))
      .toDF("query_id", "doc_id")
    val results = Seq(
      (1L, 10L, 1), (1L, 99L, 2),
      // -- split --
      (1L, 11L, 3), (1L, 12L, 4), // rank 4: beyond k, never counts
      (2L, 20L, 1), (2L, 20L, 1), // duplicate row counts twice
      (4L, 40L, 1))
    val input = MemoryStream[(Long, Long, Int)](spark)
    val q = EvalStreams.retrievalMetricsStream(
        input.toDF().toDF("query_id", "doc_id", "rank"), gold, k = 3)
      .writeStream.format("memory").queryName("e29_out").outputMode("append").start()
    try {
      input.addData(results.take(2)); q.processAllAvailable()
      input.addData(results.drop(2)); q.processAllAvailable()
      // last emission per query
      val streamed = spark.table("e29_out").collect()
        .groupBy(_.getAs[Long]("query_id"))
        .map { case (k2, rows) => k2 -> rows.last }
      val batch = Eval.retrievalMetrics(
          results.toDF("query_id", "doc_id", "rank"),
          col("query_id"), col("doc_id"), col("rank"),
          goldDf, col("query_id"), col("doc_id"), k = 3)
        .collect().map(r => r.getAs[Long]("query_id") -> r).toMap
      // every touched query matches batch digit for digit
      for (qid <- streamed.keySet) {
        val s = streamed(qid); val b = batch(qid)
        assert(s.getAs[Long]("n_gold") == b.getAs[Long]("n_gold"), s"$qid n_gold")
        assert(s.getAs[Long]("hits") == b.getAs[Long]("hits"), s"$qid hits")
        assert(s.getAs[Double]("precision_at_k") == b.getAs[Double]("precision_at_3"), s"$qid p")
        assert(s.getAs[Double]("recall_at_k") == b.getAs[Double]("recall_at_3"), s"$qid r")
        assert(s.getAs[Double]("mrr") == b.getAs[Double]("mrr"), s"$qid mrr")
        assert(s.getAs[Double]("ndcg_at_k") == b.getAs[Double]("ndcg_at_3"), s"$qid ndcg")
      }
      // hand checks: q1 hits 2 (ranks 1, 3), q2 hits 2 via the dup
      assert(streamed(1L).getAs[Long]("hits") == 2L)
      assert(streamed(1L).getAs[Double]("mrr") == 1.0)
      assert(streamed(2L).getAs[Long]("hits") == 2L)
      assert(streamed(4L).getAs[Long]("n_gold") == 0L &&
        streamed(4L).getAs[Double]("ndcg_at_k") == 0.0)
      // the documented divergence: untouched gold query 3 is absent
      // from the stream, present (all-zero) in batch
      assert(!streamed.contains(3L) && batch.contains(3L))
    } finally q.stop()
  }

  test("E21 stream == batch on real documents split across batches") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select((col("doc_id") % 40).as("problem_key"),
        when(col("doc_id") % 17 === 0, lit(null))
          .otherwise((col("n_chars") % 10).cast("string")).as("answer"))
      .cache()
    val rows = docs.as[(Long, Option[String])].collect()
    val input = MemoryStream[(Long, Option[String])](spark)
    val df = input.toDF().toDF("problem_key", "answer")
    val q = EvalStreams.majorityVoteStream(df)
      .writeStream.format("memory").queryName("e21_docs").outputMode("append").start()
    try {
      val (h1, h2) = rows.splitAt(rows.length / 2)
      input.addData(h1.toSeq); q.processAllAvailable()
      input.addData(h2.toSeq); q.processAllAvailable()
      assertSame(lastPerProblem("e21_docs"), batchRows(docs))
    } finally {
      q.stop()
      docs.unpersist()
    }
  }
}
