package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §2.D6/D7).
  *
  * `bruteForceTopK` is the exact baseline: broadcast the (small) query
  * side across the corpus — one pass, no shuffle of the corpus, exact
  * cosine via codegen'd zip_with/aggregate. The scale path is
  * `lshTopK`: seeded random-hyperplane signs bucket both sides, the
  * join is bucket-local, and only in-bucket candidates pay the cosine.
  */
object Similarity {

  /** Exact top-k by cosine: every query (broadcast) against every
    * corpus row. Ranking uses round(sim, 6) with id tiebreak so the
    * ordering is reproducible across engines.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      corpusId: Column,
      corpusVec: Column,
      queryId: Column,
      queryVec: Column,
      k: Int): DataFrame = {
    val c = corpus.select(corpusId.as("id"), corpusVec.as("v"))
    val q = queries.select(queryId.as("query_id"), queryVec.as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_key").desc, col("id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cos_sim", cosine(col("v"), col("qv")))
      .withColumn("sim_key", round(col("cos_sim"), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("id").as("vec_id"), round(col("cos_sim"), 4).as("cos_sim"))
  }

  /** Seeded random hyperplanes (row-major, plane i = planes(i)); the
    * same constants feed both the Spark plan and the generated oracle
    * SQL so the two engines bucket identically.
    */
  def hyperplanes(dim: Int, nPlanes: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Random-hyperplane signature: sign bit per plane, packed into a
    * long. Planes are seeded literals compiled into the plan — no
    * driver-side data movement, identical across executors.
    */
  def hyperplaneBucket(vec: Column, dim: Int, nPlanes: Int, seed: Long): Column = {
    val planes = hyperplanes(dim, nPlanes, seed)
    planes.zipWithIndex.foldLeft(lit(0L)) { case (acc, (p, i)) =>
      acc.bitwiseOR(
        when(dot(vec, array(p.map(lit): _*)) > 0d, lit(1L << i)).otherwise(lit(0L)))
    }
  }

  /** ANN top-k restricted to the query's hyperplane bucket. Recall is
    * tunable via nPlanes (fewer planes → bigger buckets → higher
    * recall, more cosine work). The candidate join is an equi-join on
    * the bucket — shuffle on a long key, never cartesian.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      corpusId: Column,
      corpusVec: Column,
      queryId: Column,
      queryVec: Column,
      k: Int,
      dim: Int = 64,
      nPlanes: Int = 8,
      seed: Long = 42L): DataFrame = {
    val c = corpus.select(corpusId.as("id"), corpusVec.as("v"),
      hyperplaneBucket(corpusVec, dim, nPlanes, seed).as("bucket"))
    val q = queries.select(queryId.as("query_id"), queryVec.as("qv"),
      hyperplaneBucket(queryVec, dim, nPlanes, seed).as("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_key").desc, col("id").asc)
    c.join(broadcast(q), "bucket")
      .filter(col("id") =!= col("query_id"))
      .withColumn("cos_sim", cosine(col("v"), col("qv")))
      .withColumn("sim_key", round(col("cos_sim"), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("id").as("vec_id"), round(col("cos_sim"), 4).as("cos_sim"))
  }
}
