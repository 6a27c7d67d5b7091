package graft

/** Scratch (not registered): r14 100x scaled-parameter probe. */
object ScratchDebug {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = Engine.session("scratch-100x")
    val dir = sys.env.getOrElse("SCRATCH_DIR", "/tmp/graft_sf10")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[100x] $label rows=$n wall=${(System.nanoTime()-t0)/1e9}%.1f s")
    }
    val c = spark.read.parquet(s"$dir/customer.parquet")
    val u = c.select(col("c_custkey").as("id"), col("c_name").as("t"))
      .unionByName(c.select((col("c_custkey") + 50000000000L).as("id"),
        concat(substring(col("c_name"), 1, 5), lit("X"),
          substring(col("c_name"), 7, 1000000)).as("t")))
    time("editdist block=last11")(
      graft.operators.Dedup.editDistancePairs(u, col("id"), col("t"),
        block = substring(col("t"), -11, 11), maxDist = 2).count())
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val ue = e.select(col("vec_id").as("id"), col("embedding").as("v"))
      .unionByName(e.select((col("vec_id") + 50000000000L).as("id"),
        concat(array(element_at(col("embedding"), 1) + lit(0.01f)),
          slice(col("embedding"), 2, 63)).as("v")))
    time("embedding LSH auto-planes")(
      graft.operators.Dedup.embeddingCosineLSH(ue, col("id"), col("v"),
        threshold = 0.99, dim = 64, nPlanes = 0).count())
    val c2 = c.select(col("c_custkey").as("id"), reverse(col("c_name")).as("sk"))
    time("sorted-neighborhood blockPrefix=6")(
      graft.operators.Dedup.sortedNeighbors(c2, col("id"), col("sk"),
        window = 4, maxDist = 5, blockPrefix = 6).count())
    spark.stop()
  }
}
