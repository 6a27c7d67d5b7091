package graft

/** Scratch (not registered): count chrf_stats occurrences in plans. */
object ScratchExplain {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("scratch-explain")
    val df = SparkEntry.queries("q_chrf")(spark, "/root/testdata/sf0.01")
    val plan = df.queryExecution.optimizedPlan.treeString
    println("chrf_stats occurrences in optimized plan: " +
      "chrf_stats".r.findAllIn(plan).length)
    val bs = SparkEntry.queries("q_bootstrap_ci")(spark, "/root/testdata/sf0.01")
    println("=== bootstrap_ci optimized ===")
    println(bs.queryExecution.optimizedPlan.treeString.take(2500))
    spark.stop()
  }
}
