package graft

import org.apache.spark.sql.functions._

import graft.functions.RollingHashWinnow
import graft.operators.TextMetrics

class TextMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("winnowing guarantees a shared fingerprint for shared substrings >= w+k-1") {
    // two documents sharing a 64-char run (> w + k - 1 = 23) must share
    // at least one winnowed fingerprint (Schleimer et al., SIGMOD'03)
    val shared = "the quick brown fox jumps over the lazy dog again and again ok"
    val df = Seq(
      (1L, s"prefix one $shared trailing text here"),
      (2L, s"completely different opening $shared and another ending")).toDF("id", "text")
    val fps = df.select(col("id"), RollingHashWinnow.winnowFingerprint(col("text"), 8, 16).as("f"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty,
      "no shared fingerprint for a shared 63-char substring")
  }

  test("winnowing fingerprints are deterministic and non-empty on real docs") {
    val d = sources.Tables.load(spark, sf, "documents").limit(50)
    val twice = d.select(
      RollingHashWinnow.winnowFingerprint(col("text")).as("a"),
      RollingHashWinnow.winnowFingerprint(col("text")).as("b"))
      .as[(Seq[Long], Seq[Long])].collect()
    assert(twice.forall { case (a, b) => a == b && a.nonEmpty })
  }

  test("winnowPairs pairs documents sharing a long run, not unrelated ones") {
    val shared = "the quick brown fox jumps over the lazy dog again and again today"
    val df = Seq(
      (1L, s"first document begins here $shared and then ends"),
      (2L, s"second doc other opening $shared closing words differ"),
      (3L, "totally unrelated content about distributed query engines and shuffles"))
      .toDF("id", "text")
    val pairs = graft.operators.Dedup.winnowPairs(df, col("id"), col("text"), minShared = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"shared-run pair missing: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"unrelated doc paired: $pairs")
  }

  test("langId prefers the language whose markers dominate") {
    val df = Seq(
      (1L, "the cat and the dog of the house is that it for"),
      (2L, "el perro y la casa de los gatos con una que y"),
      (3L, "xyzzy qwerty asdf")).toDF("doc_id", "text")
    val out = TextMetrics.withLangId(df, col("text"))
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "und")
  }

  test("quality score rewards in-range token stats") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then it runs off"),
      (2L, "a b c")).toDF("doc_id", "text")
    val q = TextMetrics.withQuality(df, col("text"))
      .select("doc_id", "quality").as[(Long, Double)].collect().toMap
    assert(q(1L) > q(2L), s"expected doc 1 to outscore doc 2: $q")
  }
}
