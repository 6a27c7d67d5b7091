package graft

import org.apache.spark.sql.functions._

/** Co-located (bucketed) joins: the zero-shuffle join path SURVEY §5
  * relies on for repeated fact-fact joins at scale.
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key needs no shuffle") {
    val li = sources.Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_extendedprice")
    val o = sources.Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice")
    sources.Tables.writeBucketed(li, "b_lineitem", Seq("l_orderkey"), 8)
    sources.Tables.writeBucketed(o, "b_orders", Seq("o_orderkey"), 8)
    try {
      // disable broadcast so the join must pick sort-merge — the
      // bucketed layout should satisfy its distribution requirement
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val n = joined.head().getLong(0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(n == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
