package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pre-training: documents are concatenated in
  * a deterministic order and chunked into fixed token budgets
  * ("concat-then-chunk"), so every training sequence is full and no
  * tokens are dropped between documents.
  *
  * Packing is per-`shard` (the window is ALWAYS partitioned — one
  * global packing order would serialize 100 TB through one task and is
  * rejected by construction). Shards pack independently, exactly like
  * per-worker packing in a distributed tokenizer; a doc's sequence id
  * is stable across runs because shard and order are deterministic
  * functions of the data.
  */
object Packing {

  /** Assign each document a (shard-local) sequence id under a token
    * budget: seq_id = floor(exclusive-running-token-sum / budget).
    * Documents longer than the budget simply span sequences (their
    * tokens still count contiguously), matching concat-then-chunk.
    *
    * Output adds: `seq_id` (long), `tok_offset` (the doc's first-token
    * position within its sequence).
    */
  def packSequences(
      df: DataFrame,
      shard: Column,
      orderBy: Seq[Column],
      nTokens: Column,
      budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(shard).orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = coalesce(sum(nTokens).over(w), lit(0L))
    df.withColumn("__cum", cum)
      // `div` (integer division), NOT floor(a / b): the double division
      // loses exactness past 2^53 cumulative tokens — the same mantissa
      // hazard Tables.events guards against for epoch-nanos
      .withColumn("seq_id", expr(s"__cum div ${budget.toLong}"))
      .withColumn("tok_offset", pmod(col("__cum"), lit(budget.toLong)))
      .drop("__cum")
  }
}
