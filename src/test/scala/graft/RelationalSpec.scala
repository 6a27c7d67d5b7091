package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("every registered query runs and is non-degenerate on sf0.001") {
    SparkEntry.registry.foreach { q =>
      val df = q.spark(spark, sf)
      assert(df.columns.nonEmpty, s"${q.name}: no columns")
      assert(df.count() > 0, s"${q.name}: empty result")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1_agg: six (returnflag, linestatus) groups, exact sums") {
    val rows = SparkEntry.queries("q1_agg")(spark, sf).collect()
    assert(rows.length === 6)
    // exact decimal path: sums are finite, 2-dp-representable
    rows.foreach { r =>
      val v = r.getAs[Double]("sum_base")
      assert(v > 0 && math.abs(v * 100 - math.rint(v * 100)) < 1e-6)
    }
  }

  test("q_topn_per_group: rn bounded and ranked by acctbal desc") {
    val rows = SparkEntry.queries("q_topn_per_group")(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("rn")).forall(rn => rn >= 1 && rn <= 3))
    rows.groupBy(_.getAs[String]("c_mktsegment")).foreach { case (_, g) =>
      val byRn = g.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("c_acctbal"))
      assert(byRn.zip(byRn.tail).forall { case (a, b) => a >= b })
    }
  }

  test("dedup exact keeps one representative per distinct text") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val doubled = docs.unionByName(
      docs.withColumn("doc_id", col("doc_id") + 1000000))
    val kept = operators.Dedup.exactKeep(doubled, col("text"), col("doc_id"))
    assert(kept.count() === docs.count())
    // winners are the min-id copies (the originals)
    assert(kept.filter(col("doc_id") >= 1000000).count() === 0)
  }
}
