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
}
