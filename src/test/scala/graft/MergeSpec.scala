package graft

import org.apache.spark.sql.functions._

import graft.operators.{Merge, Profile}

class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("applyChanges: latest-wins update, delete, insert, untouched passthrough") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (1L, "a1", "U", 1),  // superseded
      (1L, "a2", "U", 2),  // wins
      (2L, "b", "D", 1),   // delete
      (9L, "z", "I", 1)    // insert
    ).toDF("k", "v", "op", "ver")
    val out = Merge.applyChanges(base, changes, Seq("k"), col("ver"), col("op"))
      .as[(Long, String)].collect().toSet
    assert(out === Set((1L, "a2"), (3L, "c"), (9L, "z")))
  }

  test("applyChanges: delete superseded by a later upsert resurrects the row") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((1L, "x", "D", 1), (1L, "a9", "U", 2)).toDF("k", "v", "op", "ver")
    val out = Merge.applyChanges(base, changes, Seq("k"), col("ver"), col("op"))
      .as[(Long, String)].collect().toSet
    assert(out === Set((1L, "a9")))
  }

  test("scd2 builds half-open validity chains with one open current row per key") {
    val log = Seq((1L, 10, "p1"), (1L, 20, "p2"), (1L, 30, "p3"), (2L, 5, "q1"))
      .toDF("k", "ver", "v")
    val out = Merge.scd2(log, Seq("k"), col("ver"))
      .select($"k", $"effective_from", $"effective_to", $"is_current")
      .as[(Long, Int, Option[Int], Boolean)].collect().toSet
    assert(out === Set(
      (1L, 10, Some(20), false), (1L, 20, Some(30), false),
      (1L, 30, None, true), (2L, 5, None, true)))
  }

  test("keySkew ranks heavy keys with exact share and ratio") {
    // 6 rows of 'hot', 1 each of 'c1'..'c2' -> 8 rows, 3 keys
    val df = (Seq.fill(6)("hot") ++ Seq("c1", "c2")).toDF("k")
    val rows = Profile.keySkew(df, col("k"), topK = 2)
      .as[(String, Long, Double, Double)].collect()
    assert(rows.head == (("hot", 6L, 0.75, 2.25)))
    assert(rows.length == 2 && rows(1)._1 == "c1")
  }
}
