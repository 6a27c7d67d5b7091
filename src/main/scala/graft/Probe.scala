package graft

import org.apache.spark.sql.functions._

/** Scratch probe for local dev (kept out of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.functions.{shingles, tokens}
    import graft.operators.scaleOut

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val d = sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("id"), col("text"))
    val trunc = d.select(
      (col("id") + 1000000).as("id"),
      array_join(
        slice(tokens(col("text")), lit(1),
          greatest(floor(size(tokens(col("text"))) * 4 / 5), lit(1)).cast("int")),
        " ").as("text"))
    val docs = d.unionByName(trunc)

    time("full query")(graft.operators.Dedup.ngramJaccard(
      docs, col("id"), col("text"), 5, 20, 0.5).count())

    val sh = scaleOut(docs.select(col("id"), col("text").as("__text")))
      .select(col("id"), explode(array_distinct(shingles(tokens(col("__text")), 5))).as("sh"))
      .repartition(col("sh"))
    time("shingle explode only")(sh.count())
    val rare = sh.groupBy("sh").count()
      .filter(col("count") >= 2 && col("count") <= 20).select("sh")
    time("rare index")(rare.count())
    val indexed = sh.join(rare, Seq("sh"), "left_semi")
    time("indexed semi-join")(indexed.count())
    val inter = indexed.as("a")
      .join(indexed.as("b"), col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    time("pair join + group")(inter.count())

    // ALTERNATIVE: df-cap via a window over the existing sh partitioning
    // (one pass; no rare-groupBy, no semi-join)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("sh")
    val idx2 = sh.withColumn("__df", count(lit(1)).over(w))
      .filter(col("__df") >= 2 && col("__df") <= 20).drop("__df")
    val inter2 = idx2.as("a")
      .join(idx2.as("b"), col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    time("windowed df-cap pair join")(inter2.count())
    println(s"[probe] pair parity: ${inter.count()} vs ${inter2.count()}")

    spark.stop()
  }
}
