package graft

/** Per-round benchmark: run every registered query on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-bench")
    // Warm the JVM/codegen once so measured times reflect the plans,
    // not first-query classloading.
    SparkEntry.queries.get("q1_agg").foreach { fn =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // SPARK_GRAFT_ONLY=q_a,q_b restricts the run (local iteration aid);
    // the driver never sets it, so round benches always cover everything
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    // min of two runs per query: the first run pays codegen/classload,
    // the min reflects the steady-state plan cost
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
        val t = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        // per-query isolation: several operators localCheckpoint
        // intermediates (cluster propagation, IVF k-means, incremental
        // indexes); in one long-lived JVM those blocks otherwise pile
        // up and tax every LATER query with GC pressure — r03 measured
        // q_epe_shape_b at 9.0 s mid-suite vs 1.0 s isolated
        spark.sqlContext.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        t
      }
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failed queries stay visible as -1 in `queries` but must not
    // SUBTRACT from the headline total (a failing round would otherwise
    // report a better-looking number than a passing one)
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
