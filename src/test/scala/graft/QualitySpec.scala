package graft

import org.apache.spark.sql.functions._

import graft.operators.Quality
import graft.operators.Quality._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("report counts each violation family exactly, in caller order") {
    val df = Seq(
      (Some(1), Some(5.0), Some("A")),
      (Some(2), Some(500.0), Some("X")), // range + accepted violations
      (None, Some(5.0), Some("N")),      // null key
      (Some(1), None, Some("A"))         // duplicate key; null value ok
    ).toDF("k", "v", "flag")
    val parent = Seq(1, 3).toDF("pk") // k=2 dangles
    val r = Quality.report(df, Seq(
      NotNull("k"),
      InRange("v", 0.0, 100.0),
      AcceptedValues("flag", Seq("A", "N", "R")),
      Violates("v_is_5", col("v") === 5.0),
      Unique(Seq("k")),
      ForeignKey("k", parent, "pk")))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getBoolean(2)))
    assert(r.map(_._1).toSeq == Seq(
      "not_null(k)", "in_range(v, 0.0, 100.0)", "accepted_values(flag)",
      "violates(v_is_5)", "unique(k)", "foreign_key(k)"))
    val m = r.map(x => x._1 -> (x._2, x._3)).toMap
    assert(m("not_null(k)") == ((1L, false)))
    assert(m("in_range(v, 0.0, 100.0)") == ((1L, false)))
    assert(m("accepted_values(flag)") == ((1L, false)))
    assert(m("violates(v_is_5)") == ((2L, false)))
    assert(m("unique(k)") == ((1L, false)))       // k=1 twice -> 1 extra row
    assert(m("foreign_key(k)") == ((1L, false)))  // k=2 dangles (null k skipped)
  }

  test("report on clean data passes every check") {
    val df = Seq((1, 1.0), (2, 2.0)).toDF("k", "v")
    val r = Quality.report(df, Seq(NotNull("k"), Unique(Seq("k")),
        InRange("v", 0.0, 10.0)))
      .collect()
    assert(r.forall(_.getBoolean(2)), r.mkString(";"))
    assert(r.forall(_.getLong(1) == 0L))
  }

  test("report on an empty frame yields zero violations, not nulls") {
    val df = Seq.empty[(Int, Double)].toDF("k", "v")
    val r = Quality.report(df, Seq(NotNull("k"), Unique(Seq("k"))))
      .collect()
    assert(r.forall(x => x.getLong(1) == 0L && x.getBoolean(2)))
  }

  test("attrition counts the cascade cumulatively; null predicate = drop") {
    // 10 docs: stage1 keeps 6 (one via-null drop), stage2 keeps 4 of those,
    // stage3 keeps 3 of those. Rows failing an EARLIER stage must not
    // count against a later one even when the later predicate is true.
    val df = Seq(
      (1, Some(true), true, true),   // survives all
      (2, Some(true), true, true),   // survives all
      (3, Some(true), true, true),   // survives all
      (4, Some(true), true, false),  // dropped at 3
      (5, Some(true), false, true),  // dropped at 2
      (6, Some(true), false, true),  // dropped at 2
      (7, Some(false), true, true),  // dropped at 1 (p2/p3 true but unseen)
      (8, Some(false), true, true),
      (9, Some(false), true, true),
      (10, None, true, true)         // null gate = dropped at 1
    ).toDF("id", "p1", "p2", "p3")
    val r = Quality.attrition(df, Seq(
        "one" -> col("p1"), "two" -> col("p2"), "three" -> col("p3")))
      .orderBy("stage_idx").collect()
      .map(x => (x.getString(1), x.getLong(2), x.getLong(3), x.getLong(4),
        x.getDouble(5), x.getDouble(6)))
    assert(r.toSeq == Seq(
      ("one", 10L, 6L, 4L, 0.4, 0.6),
      ("two", 6L, 4L, 2L, 0.3333, 0.4),
      ("three", 4L, 3L, 1L, 0.25, 0.3)))
  }

  test("attrition on an empty frame reports zero rows per stage, no nulls") {
    val df = Seq.empty[(Int, Boolean)].toDF("id", "p")
    val r = Quality.attrition(df, Seq("only" -> col("p"))).collect()
    assert(r.length == 1)
    val x = r.head
    assert((x.getLong(2), x.getLong(3), x.getLong(4)) == ((0L, 0L, 0L)))
    assert((x.getDouble(5), x.getDouble(6)) == ((0.0, 0.0)))
  }

  test("c4Filter applies each line rule and page rule independently") {
    val page = Seq(
      // doc 1: 5 good sentences + 2 droppable lines → kept
      (1L, Seq(
        "the first line is a full sentence.",
        "no",                                     // 2 words → dropped
        "this line has words but no ending",      // no punct → dropped
        "a second proper sentence right here!",
        "does a question count as a sentence?",
        "the fourth full sentence appears now.",
        "and the fifth one closes the page.").mkString("\n")),
      // doc 2: javascript line dropped → only 4 sentences → not kept
      (2L, Seq(
        "the first line is a full sentence.",
        "please enable javascript to continue reading.",
        "a second proper sentence right here!",
        "does a question count as a sentence?",
        "the fourth full sentence appears now.").mkString("\n")),
      // doc 3: lorem ipsum page flag
      (3L, Seq(
        "one full sentence sits here quietly.",
        "two full sentences sit here quietly.",
        "three full sentences sit here quietly.",
        "four full sentences sit here quietly.",
        "lorem ipsum dolor sit amet indeed it does.").mkString("\n")),
      // doc 4: curly brace page flag
      (4L, "var x = { a: 1 };\n" + Seq.fill(5)(
        "an otherwise perfectly acceptable sentence.").mkString("\n")),
      // doc 5: bad word page flag (whole-word match)
      (5L, Seq.fill(4)("an otherwise perfectly acceptable sentence.")
        .mkString("\n") + "\nthe naughtyword appears in this line sadly."),
      // doc 6: bad word only as a SUBSTRING → must NOT flag
      (6L, Seq.fill(5)("the naughtywordish term is a different word.")
        .mkString("\n"))
    ).toDF("id", "page")
    val out = Quality.c4Filter(page, col("id"), col("page"),
      badWords = Seq("naughtyword")).orderBy("doc_id").collect()

    assert(out(0).getAs[Boolean]("kept"))
    assert(out(0).getAs[Long]("n_lines") == 7L)
    assert(out(0).getAs[Long]("n_kept_lines") == 5L)
    assert(out(0).getAs[Long]("n_sentences") == 5L)
    assert(!out(0).getAs[String]("clean_text").contains("no ending"))

    assert(!out(1).getAs[Boolean]("kept")) // js line gone → 4 sentences
    assert(out(1).getAs[Long]("n_kept_lines") == 4L)
    assert(!out(1).getAs[String]("clean_text").toLowerCase.contains("javascript"))

    assert(out(2).getAs[Boolean]("has_lorem") && !out(2).getAs[Boolean]("kept"))
    assert(out(3).getAs[Boolean]("has_brace") && !out(3).getAs[Boolean]("kept"))
    assert(out(4).getAs[Boolean]("has_bad_word") && !out(4).getAs[Boolean]("kept"))
    assert(!out(5).getAs[Boolean]("has_bad_word"))
    assert(out(5).getAs[Boolean]("kept"))
  }

  test("c4Filter bad-word matching survives symbol-edged and uppercase-configured entries") {
    val page = Seq(
      (1L, "check this a$$ right here in plain text."),
      (2L, "the word class is entirely innocent here.") // 'a$$' not present
    ).toDF("id", "page")
    // symbol-edged entry (\b would never fire) + uppercase config
    val out = Quality.c4Filter(page, col("id"), col("page"),
      badWords = Seq("A$$"), minSentences = 1).orderBy("doc_id").collect()
    assert(out(0).getAs[Boolean]("has_bad_word"))
    assert(!out(1).getAs[Boolean]("has_bad_word"))
  }

  test("c4Filter keeps a trailing-quote sentence and an empty page yields empty clean_text") {
    val page = Seq(
      (1L, "\"a quoted sentence still ends properly.\""),
      (2L, "")).toDF("id", "page")
    val out = Quality.c4Filter(page, col("id"), col("page"))
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_kept_lines") == 1L)
    assert(out(1).getAs[Long]("n_kept_lines") == 0L)
    assert(out(1).getAs[String]("clean_text") == "")
    assert(!out(1).getAs[Boolean]("kept"))
  }
}
