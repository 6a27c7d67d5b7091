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

  test("applyChanges property: one-shot apply == version-split sequential apply == model") {
    // the fixpoint/composition property E8's snapshot loop relies on,
    // checked on randomized feeds against a driver-side reference model
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 8) {
      val baseRows = (0L to 5L).filter(_ => rnd.nextBoolean()).map(k => (k, s"b$k"))
      val feed = (1 to 12).map { i =>
        val k = rnd.nextInt(8).toLong
        val op = Seq("I", "U", "D")(rnd.nextInt(3))
        val ver = rnd.nextInt(4) + 1
        (k, s"v$i", op, ver)
      }
      val base = baseRows.toDF("k", "v")
      val changes = feed.toDF("k", "v", "op", "ver")

      // driver-side reference model: per key, winner = max version,
      // ties -> op-ascending (D < I < U wins... D first); D deletes
      val model = {
        val winners = feed.groupBy(_._1).map { case (k, cs) =>
          val w = cs.minBy(c => (-c._4, c._3))
          k -> w
        }
        val untouched = baseRows.filterNot(r => winners.contains(r._1))
        (untouched ++ winners.values.collect {
          case (k, v, op, _) if op != "D" => (k, v)
        }).toSet
      }

      val oneShot = Merge.applyChanges(base, changes, Seq("k"), col("ver"), col("op"))
        .as[(Long, String)].collect().toSet
      assert(oneShot == model, s"one-shot != model for feed $feed base $baseRows")

      // split on a version threshold -> monotone across batches
      val lo = feed.filter(_._4 <= 2).toDF("k", "v", "op", "ver")
      val hi = feed.filter(_._4 > 2).toDF("k", "v", "op", "ver")
      val sequential = Merge.applyChanges(
          Merge.applyChanges(base, lo, Seq("k"), col("ver"), col("op")),
          hi, Seq("k"), col("ver"), col("op"))
        .as[(Long, String)].collect().toSet
      assert(sequential == oneShot,
        s"sequential != one-shot for feed $feed base $baseRows")
    }
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
