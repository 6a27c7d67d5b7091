package graft

import org.apache.spark.sql.functions._

/** Error bounds for the sketch aggregates (q_approx_stats). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact per group") {
    val li = sources.Tables.load(spark, sf, "lineitem")
    val approx = SparkEntry.queries("q_approx_stats")(spark, sf)
      .select($"l_returnflag", $"approx_orders").as[(String, Long)].collect().toMap
    val exact = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("n"))
      .as[(String, Long)].collect().toMap
    for ((k, e) <- exact) {
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$k: approx $a vs exact $e")
    }
  }

  test("percentile_approx brackets the exact median") {
    val li = sources.Tables.load(spark, sf, "lineitem")
    val approx = SparkEntry.queries("q_approx_stats")(spark, sf)
      .select($"l_returnflag", $"approx_med").as[(String, Double)].collect().toMap
    val exact = li.groupBy($"l_returnflag")
      .agg(percentile($"l_quantity", lit(0.5)).as("m"))
      .as[(String, Double)].collect().toMap
    for ((k, e) <- exact) {
      val a = approx(k)
      assert(math.abs(a - e) / math.max(e, 1.0) <= 0.1, s"$k: approx $a vs exact $e")
    }
  }
}
