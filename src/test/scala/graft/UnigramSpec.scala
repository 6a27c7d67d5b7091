package graft

import org.apache.spark.sql.functions._

import graft.operators.Unigram

/** SURVEY §2.D96/D96b: unigram-LM (SentencePiece-style) tokenizer
  * training and Viterbi segmentation.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def handModel(entries: (String, Double)*) =
    entries.toSeq.toDF("piece", "log_prob")

  test("segmentPieces decodes the Viterbi-best split under a hand model") {
    val model = handModel(
      "low" -> -1.0, "er" -> -2.0,
      "l" -> -5.0, "o" -> -5.0, "w" -> -5.0, "e" -> -5.0, "r" -> -5.0)
    val docs = Seq((1L, "lower low")).toDF("id", "text")
    val out = Unigram.segmentPieces(docs, col("id"), col("text"), model)
      .orderBy("word_pos", "piece_pos").collect()
    // "lower" → low(-1) + er(-2) = -3 beats any char split (≥ -15)
    val w0 = out.filter(_.getAs[Int]("word_pos") == 0)
    assert(w0.map(_.getAs[String]("piece")).toSeq == Seq("low", "er"))
    assert(w0.forall(!_.getAs[Boolean]("is_unk")))
    val w1 = out.filter(_.getAs[Int]("word_pos") == 1)
    assert(w1.map(_.getAs[String]("piece")).toSeq == Seq("low"))
  }

  test("segmentPieces falls back to flagged unk chars and always decodes") {
    val model = handModel("l" -> -2.0, "o" -> -2.0)
    val docs = Seq((1L, "lox")).toDF("id", "text")
    val out = Unigram.segmentPieces(docs, col("id"), col("text"), model)
      .orderBy("piece_pos").collect()
    assert(out.map(_.getAs[String]("piece")).toSeq == Seq("l", "o", "x"))
    assert(out.map(_.getAs[Boolean]("is_unk")).toSeq ==
      Seq(false, false, true))
  }

  test("segmentPieces prefers the longer piece on an exact score tie") {
    // "ab" via ["ab"](-4) ties ["a","b"](-2-2): longest-last-piece rule
    val model = handModel("ab" -> -4.0, "a" -> -2.0, "b" -> -2.0)
    val docs = Seq((1L, "ab")).toDF("id", "text")
    val out = Unigram.segmentPieces(docs, col("id"), col("text"), model)
      .collect()
    assert(out.map(_.getAs[String]("piece")).toSeq == Seq("ab"))
  }

  test("train learns whole-word pieces on a textbook corpus and segments with them") {
    val corpus = Seq.fill(10)("low") ++ Seq.fill(8)("lowest") ++
      Seq.fill(8)("newest") ++ Seq.fill(6)("wider")
    val docs = corpus.grouped(4).map(_.mkString(" ")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toSeq.toDF("id", "text")
    val model = Unigram.train(docs, col("text"),
      vocabSize = 14, seedSize = 60, maxPieceLen = 6)
    val pieces = model.select("piece").as[String].collect().toSet
    // high-frequency whole words survive pruning as single pieces
    assert(pieces.contains("low"), s"vocab was $pieces")
    assert(pieces.contains("est") || pieces.contains("newest"),
      s"vocab was $pieces")
    // every training word decodes with zero unks under its own model
    val counts = Unigram.segmentCounts(docs, col("id"), col("text"), model)
      .agg(sum("n_unk_pieces")).collect()(0).getLong(0)
    assert(counts == 0L)
  }

  test("train is deterministic: identical data gives byte-identical models") {
    val docs = Seq((1L, "spark scala spark table scala spark"),
      (2L, "table scan table spark")).toDF("id", "text")
    def fit() = Unigram.train(docs, col("text"), vocabSize = 12,
      seedSize = 40, maxPieceLen = 5)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(fit() == fit())
  }

  test("segmentCounts accounting is exact under a hand model") {
    val model = handModel(
      "spark" -> -1.0, "s" -> -3.0, "p" -> -3.0, "a" -> -3.0,
      "r" -> -3.0, "k" -> -3.0)
    // "spark spark go": spark=1 piece ×2, "go" = 2 unk chars
    val docs = Seq((7L, "spark spark go")).toDF("id", "text")
    val out = Unigram.segmentCounts(docs, col("id"), col("text"), model)
      .collect()(0)
    assert(out.getAs[Long]("n_words") == 3L)
    assert(out.getAs[Long]("n_pieces") == 4L)
    assert(out.getAs[Long]("n_unk_pieces") == 2L)
    assert(out.getAs[Double]("pieces_per_word") == 1.3333)
  }
}
