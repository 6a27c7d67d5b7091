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
    */
  def scaleOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
