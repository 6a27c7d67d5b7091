package graft

import org.apache.spark.sql.DataFrame

package object operators {

  /** Ensure a CPU-bound kernel stage has at least the cluster's
    * parallelism. Small inputs (a single parquet split, a compact doc
    * table) otherwise serialize expensive per-row work — tokenization,
    * shingling, hashing — onto one task. At real scale inputs arrive
    * in many splits and this is a no-op; the repartition only fires
    * when the source under-splits, and shuffles just the projected
    * kernel input (id + text), not the full table.
    *
    * The decision reads `inputFiles` (leaf-relation file listing — no
    * physical planning) instead of `df.rdd.getNumPartitions`, which
    * would force a full non-AQE physical plan of the fragment just to
    * count splits, planning every kernel input twice. Fragments with
    * no file source (LocalRelation fixtures) count as 0 files and get
    * spread — exactly the under-split case the guard exists for.
    */
  def scaleOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val nFiles = try df.inputFiles.length catch { case _: Exception => 0 }
    if (nFiles >= target) df else df.repartition(target)
  }
}
