package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-replication utility for SCALING spot-benchmarks: builds an
  * N× replica of a testdata scale-factor directory so the bench suite
  * can be driven at 10× the largest provided SF (the "would the plan
  * survive a scale-up" check in SURVEY §5).
  *
  * Replication is content-PERTURBED, not copy-paste, so workload
  * shape stays representative:
  *  - `documents.text` gets a per-replica vowel rotation + tag token:
  *    planted near-dup structure inside each replica is preserved
  *    (one transformation per replica), while cross-replica shingle
  *    overlap stays low — a naive 10× copy would turn every doc into
  *    a 10-member duplicate cluster and inflate pair joins ~100×,
  *    which is NOT what a 10× corpus looks like.
  *  - `embeddings` shift their first component per replica (the same
  *    perturbation family the LSH oracles use), keeping geometry
  *    realistic without collapsing replicas onto each other.
  *  - fact-table keys (doc/vec/event/order/part/supp ids) offset by
  *    replica × 10⁸ to stay collision-free; `nation`/`region` dims
  *    are NOT replicated (10× growth grows facts, not countries).
  *
  * Usage: runMain graft.BenchScale <srcSfDir> <outDir> <factor>
  */
object BenchScale {
  private val Off = 100000000L

  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS) = args
    val factor = factorS.toInt
    val spark = Engine.session("graft-bench-scale")

    def replicate(name: String)(fn: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val scaled = (0 until factor).map(i => fn(base, i)).reduce(_ unionByName _)
      scaled.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[bench-scale] $name: ${base.count()} -> ${scaled.count()}")
    }
    def copy(name: String): Unit = {
      spark.read.parquet(s"$src/$name.parquet")
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[bench-scale] $name: copied")
    }

    val vowels = "aeiou"
    replicate("documents") { (df, i) =>
      val rot = vowels.drop(i % 5) + vowels.take(i % 5)
      df.select(
        (col("doc_id") + lit(i * Off)).as("doc_id"),
        concat(lit(s"r$i "), translate(col("text"), vowels, rot)).as("text"),
        col("lang"), col("source"),
        (col("n_chars") + lit(3)).as("n_chars"))
    }
    replicate("embeddings") { (df, i) =>
      df.select(
        (col("vec_id") + lit(i * Off)).as("vec_id"),
        concat(array(element_at(col("embedding"), 1) + lit(0.05f * i)),
          slice(col("embedding"), 2, 63)).as("embedding"),
        col("label"))
    }
    replicate("events") { (df, i) =>
      df.select(
        (col("event_id") + lit(i * Off)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(i * Off)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }
    replicate("lineitem") { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * Off))
        .withColumn("l_partkey", col("l_partkey") + lit(i * Off))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * Off))
    }
    replicate("orders") { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * Off))
        .withColumn("o_custkey", col("o_custkey") + lit(i * Off))
    }
    replicate("customer") { (df, i) =>
      // c_name re-derives from the OFFSET key (the TPC-H rule:
      // 'Customer#' + 9-digit key): the naive copy left every name
      // verbatim ×factor, turning each name-blocked dedup block into a
      // factor-sized duplicate cluster and inflating pair joins
      // ~factor² (the same unrealism the documents vowel-rotation
      // avoids). Key-derived names keep the realistic shape: unique
      // names whose digit tails collide uniformly across the 10^k
      // block space, exactly like a real ×factor customer table. Width
      // 11: offset keys reach factor×10^8 and lpad TRUNCATES overlong
      // inputs — a 9-wide pad silently collided every 10th replica.
      df.withColumn("c_custkey", col("c_custkey") + lit(i * Off))
        .withColumn("c_name",
          concat(lit("Customer#"), lpad(col("c_custkey").cast("string"), 11, "0")))
    }
    replicate("supplier") { (df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(i * Off))
    }
    replicate("part") { (df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(i * Off))
    }
    copy("nation")
    copy("region")
    spark.stop()
  }
}
