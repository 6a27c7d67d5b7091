package graft

/** Per-round benchmark: run every registered query on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-bench")
    // Force FULL materialization of the declared output. count() is
    // not that: the optimizer legally deletes a left join whose
    // aggregated right side is provably duplicate-free when only row
    // COUNT is demanded — q_chrf's entire gram pipeline collapsed to
    // a checkpoint-scan count and benched at 1.1 s where the honest
    // cost was ~15 s (caught r10). The noop sink evaluates every
    // output column of the plan AS DECLARED and discards rows
    // executor-side — no driver collect, no filesystem write.
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // Warm the JVM/codegen once so measured times reflect the plans,
    // not first-query classloading.
    SparkEntry.queries.get("q1_agg").foreach { fn =>
      try exec(fn(spark, sfDir)) catch { case _: Throwable => () }
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
        val ok = try { exec(fn(spark, sfDir)); true } catch { case _: Throwable => false }
        val t = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        // per-query isolation: several operators localCheckpoint
        // intermediates (cluster propagation, IVF k-means, incremental
        // indexes); in one long-lived JVM those blocks otherwise pile
        // up and tax every LATER query with GC pressure — r03 measured
        // q_epe_shape_b at 9.0 s mid-suite vs 1.0 s isolated. blocking =
        // true: an async unpersist races the next timed query and
        // contaminates its measurement (r7 judge measured up to 12×
        // inflation on q_cms_heavy from exactly this line)
        spark.sqlContext.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        t
      }
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    def jmap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP) }
        .mkString("{", ",", "}")
    // failed queries stay visible as -1 in `queries` but must not
    // SUBTRACT from the headline total (a failing round would otherwise
    // report a better-looking number than a passing one)
    val total = results.map(_._2).filter(_ >= 0).sum
    // The driver keeps only the LAST 2000 chars of stdout: a JSON line
    // carrying all ~137 per-query times loses its head and parses as
    // null (the r2-r4 artifact truncation). So the full record goes to
    // a FILE and the printed line stays compact — headline total, the
    // 15 slowest queries (the ones a perf reader needs), any failures,
    // and the detail path — comfortably inside the capture window.
    val detailPath = new java.io.File(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_detail.json")).getAbsolutePath
    // "force":"noop" marks the materialization methodology so the
    // round_check drift stage never compares a noop-forced round
    // against a count()-forced one row for row (the r10 flip)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(detailPath),
      s"""{"metric":"total","value":$total,"unit":"sec","force":"noop","queries":${jmap(results)},"sf":"$sfDir"}""")
    val failed = results.filter(_._2 < 0)
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(15)
    println(s"""{"metric":"total","value":$total,"unit":"sec","force":"noop","n_queries":${results.size},"n_failed":${failed.size},"queries":${jmap(failed ++ slowest)},"detail":"$detailPath","sf":"$sfDir"}""")
    spark.stop()
  }
}
