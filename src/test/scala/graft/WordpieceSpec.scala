package graft

import org.apache.spark.sql.functions._

import graft.operators.Wordpiece

/** WordPiece tokenization (SURVEY §2.D128): vocabulary induction,
  * greedy longest-match segmentation, the [UNK] dead-end contract,
  * and per-document accounting.
  */
class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  test("buildVocab: chars per alignment class always in; multi-char pieces frequency-ranked") {
    val docs = Seq.fill(5)("unable unable undo").toDF("text")
    val v = Wordpiece.buildVocab(docs, col("text"), maxPieces = 3)
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getLong(2)))
    // word-initial 'u' appears in every token (15 occurrences); 'n'
    // only as a continuation
    assert(v.contains(("u", false, 15L)))
    assert(v.exists(p => p._1 == "n" && p._2))
    assert(!v.exists(p => p._1 == "n" && !p._2), "n never starts a word")
    // the top multi-char continuations of this corpus: 'na'/'nable'
    // class pieces all share freq 10 ('unable' x10); ranking is
    // (freq desc, cont asc, piece asc) so 'un' (15, word-initial
    // substring) must be the first multi-char piece
    val multi = v.filter(p => p._1.length >= 2)
    assert(multi.length == 3)
    assert(multi.map(_._1).contains("un") && multi.forall(_._3 >= 10L), multi.mkString(","))
  }

  test("segmentWords: greedy longest-match with ## continuations; [UNK] on a dead end") {
    // vocab: un (initial), ##able, ##do, plus the chars needed
    val vocab = Seq(
      ("un", false, 1L), ("able", true, 1L), ("do", true, 1L),
      ("u", false, 1L), ("n", true, 1L), ("a", true, 1L), ("b", true, 1L),
      ("l", true, 1L), ("e", true, 1L), ("d", true, 1L), ("o", true, 1L))
      .toDF("piece", "cont", "freq")
    val out = Wordpiece.segmentWords(
        Seq("unable", "undo", "unq").toDF("w"), vocab)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getBoolean(3)))).toMap
    // longest match first: un + ##able beats u/n char walk
    assert(out("unable") == (("un ##able", 2L, false)), out.toString)
    assert(out("undo") == (("un ##do", 2L, false)))
    // 'q' unseen as a continuation: the WHOLE word collapses to [UNK]
    assert(out("unq") == ((Wordpiece.Unk, 1L, true)))
  }

  test("segmentWords on the corpus' own vocab never dead-ends; longest match is positional") {
    val docs = Seq("interna international nation", "nation internal").toDF("text")
    val vocab = Wordpiece.buildVocab(docs, col("text"), maxPieces = 50)
    val words = docs.select(explode(graft.functions.tokens(col("text"))).as("w"))
      .distinct()
    val segd = Wordpiece.segmentWords(words, vocab).collect()
    assert(segd.nonEmpty && segd.forall(!_.getBoolean(3)),
      s"own-corpus vocab must cover every word: ${segd.mkString(",")}")
    // reassembly: stripping ## and spaces restores the word
    segd.foreach { r =>
      assert(r.getString(1).replace("##", "").replace(" ", "") == r.getString(0), r.toString)
      assert(r.getLong(2) == r.getString(1).split(" ").length.toLong)
    }
  }

  test("encodeIds: dense display-form ids, long format, [UNK] encodes as vocab size") {
    val docs = Seq((1L, "aa ab"), (2L, "ab aa")).toDF("id", "text")
    val vocab = Wordpiece.buildVocab(docs, col("text"), maxPieces = 1)
    // vocab display forms: chars a (initial), ##a, ##b, plus ONE
    // multi-char piece (aa or ab by the freq/tiebreak order)
    val out = Wordpiece.encodeIds(docs, col("id"), col("text"), vocab)
      .orderBy("id", "word_pos", "piece_pos").collect()
    // same word in different docs encodes to identical id sequences
    val seqOf = out.groupBy(r => (r.getLong(0), r.getInt(1)))
      .view.mapValues(_.sortBy(_.getInt(2)).map(_.getLong(3)).toSeq).toMap
    assert(seqOf((1L, 0)) == seqOf((2L, 1)), "aa must encode identically in both docs")
    assert(seqOf((1L, 1)) == seqOf((2L, 0)))
    assert(out.forall(!_.getBoolean(4)), "own-corpus vocab never UNKs")
    // ids are dense and in-range
    val ids = out.map(_.getLong(3)).toSet
    val vocabSize = vocab.select(
      when(col("cont"), concat(lit("##"), col("piece"))).otherwise(col("piece")))
      .distinct().count()
    assert(ids.forall(i => i >= 0 && i < vocabSize), s"$ids vs $vocabSize")
    // a held vocab missing 'b' entirely: 'ab' becomes [UNK] = |vocab|
    val held = Wordpiece.buildVocab(Seq("aa aa").toDF("text"), col("text"),
      maxPieces = 0)
    val heldSize = held.select(
      when(col("cont"), concat(lit("##"), col("piece"))).otherwise(col("piece")))
      .distinct().count()
    val o2 = Wordpiece.encodeIds(docs, col("id"), col("text"), held)
      .filter(col("is_unk")).collect()
    assert(o2.nonEmpty && o2.forall(_.getLong(3) == heldSize),
      s"UNK must encode as vocab size $heldSize: ${o2.mkString(",")}")
  }

  test("segment: per-doc accounting sums pieces over word occurrences, flags UNK words") {
    val docs = Seq((1L, "aa ab aa"), (2L, "ab")).toDF("id", "text")
    // vocab covers 'a' both classes but 'b' only as continuation of a
    // held-out corpus that never saw it... build from doc 1+2 so no UNK
    val vocab = Wordpiece.buildVocab(docs, col("text"), maxPieces = 0)
    val out = Wordpiece.segment(docs, col("id"), col("text"), vocab)
      .orderBy("id").collect()
    // maxPieces=0: char-only vocab, every 2-char word = 2 pieces
    assert(out(0).getLong(1) == 3L && out(0).getLong(2) == 6L
      && out(0).getLong(3) == 0L, out(0).toString)
    assert(out(1).getLong(1) == 1L && out(1).getLong(2) == 2L)
    // a held vocabulary missing 'b' entirely: 'ab' words go UNK
    // (counted as 1 piece, flagged)
    val held = Wordpiece.buildVocab(Seq("aa aa").toDF("text"), col("text"),
      maxPieces = 0)
    val o2 = Wordpiece.segment(docs, col("id"), col("text"), held)
      .orderBy("id").collect()
    assert(o2(0).getLong(2) == 2L + 1L + 2L && o2(0).getLong(3) == 1L,
      o2(0).toString)
  }
}
