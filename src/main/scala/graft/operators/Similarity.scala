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

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) of N ranked
    * candidate lists — THE hybrid-retrieval merge (BM25 ⊕ dense cosine
    * ⊕ freshness prior …): score(d) = Σ_lists 1/(k0 + rank_list(d)),
    * docs absent from a list contribute nothing. Rank-based, so the
    * lists' raw scores never need calibrating against each other.
    *
    * Every input must carry (query_id, doc_id, rank). Contributions
    * are EXACT integer lanes — 10¹² DIV (k0+rank) — so the per-doc sum
    * is order-independent and engine-portable (a double 1/(k0+r) sum
    * would depend on reduction order). Shape at scale: one union, one
    * keyed partial-aggregated groupBy, one per-query ranking window —
    * candidate lists are top-k-bounded, so windows stay tiny. Returns
    * (query_id, fused_rank, doc_id, rrf_e12), fused_rank ≤ topK.
    */
  def rrfFuse(lists: Seq[DataFrame], k0: Int = 60, topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k0 >= 1 && topK >= 1, "k0 and topK must be positive")
    val contribs = lists.map(_.select(col("query_id"), col("doc_id"),
      expr(s"1000000000000 div ($k0 + rank)").as("__c")))
    val fused = contribs.reduce(_.unionByName(_))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("__c")).as("rrf_e12"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_e12").desc, col("doc_id").asc)
    fused.withColumn("fused_rank", row_number().over(w).cast("int"))
      .filter(col("fused_rank") <= topK)
      .select("query_id", "fused_rank", "doc_id", "rrf_e12")
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

  /** Squared-distance scores of `vec` against every centroid, as one
    * array column: dist²(v,c) = v·v − 2c·v + c·c, and v·v is constant
    * per row, so ranking uses score_c = c·c − 2·(c·v). Each c·v is the
    * codegen'd DotProduct; the array lands in ONE projection so the
    * interpreted array ops read a materialized value.
    */
  private def centroidScores(vec: Column, centroids: Array[Array[Double]]): Column =
    array(centroids.map { c =>
      lit(c.map(x => x * x).sum) - dot(vec, array(c.map(lit): _*)) * 2d
    }: _*)

  /** Deterministic k-means coarse quantizer for IVF: seeded init (the
    * `nCentroids` lowest-id vectors), `iters` Lloyd rounds where the
    * assignment is a distributed argmin over broadcast centroid
    * literals and the re-estimation is one posexplode + groupBy(avg).
    * Centroids are k×dim doubles — driver metadata by definition (like
    * column names), NOT data on the driver; every per-row computation
    * stays distributed and codegen'd. Empty clusters keep their old
    * centroid. Returns the trained centroids.
    *
    * `trainFraction` < 1 trains on a deterministic hash-sample — the
    * FAISS recipe at scale: a coarse quantizer needs only enough
    * vectors per centroid to estimate means, so at 100 TB you train on
    * a sliver and pay the full-corpus scan ONCE for assignment, not
    * once per Lloyd round. The training set is localCheckpoint'd so the
    * rounds iterate over materialized blocks, not a re-decoded parquet
    * scan.
    */
  def trainIvfCentroids(
      corpus: DataFrame,
      id: Column,
      vec: Column,
      nCentroids: Int,
      iters: Int = 5,
      trainFraction: Double = 1.0): Array[Array[Double]] = {
    require(trainFraction > 0 && trainFraction <= 1, "trainFraction in (0,1]")
    val all = corpus.select(id.as("id"), vec.as("v"))
    val base = (if (trainFraction < 1.0) Sampling.hashSample(all, col("id"), trainFraction)
                else all).localCheckpoint()
    var centroids = base.orderBy(col("id").asc).limit(nCentroids)
      .select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    for (_ <- 1 to iters) {
      val scored = base.withColumn("__scores", centroidScores(col("v"), centroids))
      val assigned = scored.withColumn("cluster",
        expr("array_position(__scores, array_min(__scores))").cast("int") - 1)
      val means = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos").agg(avg(col("x")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (c, rows) =>
          c -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray
        }
      centroids = centroids.indices.map(i => means.getOrElse(i, centroids(i))).toArray
    }
    centroids
  }

  /** The trained coarse quantizer as a PERSISTABLE frame
    * ((cluster, centroid) rows) — store it next to the assignment
    * table like any other index artifact ([[ivfAssign]];
    * `Dedup.fingerprintIndex` is the same pattern for exact dedup).
    */
  def centroidsToDf(spark: org.apache.spark.sql.SparkSession,
      centroids: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toSeq.toDF("cluster", "centroid")
  }

  /** Read a stored quantizer back ([[centroidsToDf]] round-trip). */
  def centroidsFromDf(df: DataFrame): Array[Array[Double]] =
    df.select(col("cluster"), col("centroid"))
      .collect()
      .sortBy(_.getInt(0))
      .map(_.getSeq[Double](1).toArray)

  /** Assign every corpus vector to its nearest coarse centroid —
    * (id, v, cluster), THE inverted-file index table. At 100 TB this
    * is the artifact you PERSIST (bucketed by cluster:
    * `Tables.writeBucketed`) and probe many times; the full-corpus
    * scan is paid once here, not per query batch.
    */
  def ivfAssign(
      corpus: DataFrame,
      id: Column,
      vec: Column,
      centroids: Array[Array[Double]]): DataFrame =
    corpus.select(id.as("id"), vec.as("v"))
      .withColumn("__scores", centroidScores(col("v"), centroids))
      .withColumn("cluster",
        expr("array_position(__scores, array_min(__scores))").cast("int") - 1)
      .drop("__scores")

  /** Probe a STORED IVF index: each query ranks the centroids, visits
    * its `nProbe` nearest clusters, and pays exact cosine only there —
    * candidate work O(|corpus|·nProbe/nCentroids) per query, never
    * cartesian; the probe frame broadcasts.
    */
  def ivfProbe(
      index: DataFrame,
      centroids: Array[Array[Double]],
      queries: DataFrame,
      queryId: Column,
      queryVec: Column,
      k: Int,
      nProbe: Int): DataFrame = {
    val probeW = Window.partitionBy(col("query_id")).orderBy(col("__s").asc, col("cluster").asc)
    val q = queries.select(queryId.as("query_id"), queryVec.as("qv"))
      .withColumn("__scores", centroidScores(col("qv"), centroids))
      .select(col("query_id"), col("qv"),
        posexplode(col("__scores")).as(Seq("cluster", "__s")))
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nProbe)
      .select(col("query_id"), col("qv"), col("cluster"))
    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_key").desc, col("id").asc)
    index.join(broadcast(q), "cluster")
      .filter(col("id") =!= col("query_id"))
      .withColumn("cos_sim", cosine(col("v"), col("qv")))
      .withColumn("sim_key", round(col("cos_sim"), 6))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("id").as("vec_id"), round(col("cos_sim"), 4).as("cos_sim"))
  }

  /** ANN top-k via IVF (inverted-file index): corpus vectors are
    * bucketed by nearest coarse centroid; each query probes its
    * `nProbe` nearest centroid buckets and pays exact cosine only
    * there. The standard large-scale ANN layout (FAISS-style IVF-Flat)
    * expressed as two equi-joins — candidate work is
    * O(|corpus|·nProbe/nCentroids) per query, never cartesian, and the
    * bucket assignment reuses the codegen'd DotProduct kernel.
    *
    * One-shot composition of the index lifecycle
    * ([[trainIvfCentroids]] → [[ivfAssign]] → [[ivfProbe]]); an
    * incremental pipeline calls the phases itself and PERSISTS the
    * quantizer + assignment between arrivals.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      corpusId: Column,
      corpusVec: Column,
      queryId: Column,
      queryVec: Column,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      iters: Int = 5,
      trainFraction: Double = 1.0): DataFrame = {
    val centroids =
      trainIvfCentroids(corpus, corpusId, corpusVec, nCentroids, iters, trainFraction)
    ivfProbe(ivfAssign(corpus, corpusId, corpusVec, centroids),
      centroids, queries, queryId, queryVec, k, nProbe)
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

  /** MULTI-PROBE hyperplane LSH top-k (Lv et al., VLDB'07): each query
    * probes its own bucket PLUS every bucket at Hamming distance 1
    * (one sign bit flipped) — the standard recall lever when a true
    * neighbor sits just across one hyperplane. The corpus-side index
    * is untouched (still exactly one bucket per corpus vector — the
    * artifact you persist); only the broadcast query side fans out
    * ×(nPlanes+1), so recall climbs toward brute force at ZERO extra
    * corpus shuffle or storage. Exact cosine still ranks candidates;
    * a vector found through two probes counts once (distinct before
    * ranking).
    */
  def lshTopKMultiProbe(
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
    val base = hyperplaneBucket(queryVec, dim, nPlanes, seed)
    // probe set: the home bucket + one per flipped sign bit
    val probeBuckets = array((base +: (0 until nPlanes).map(i =>
      base.bitwiseXOR(lit(1L << i)))): _*)
    val q = queries.select(queryId.as("query_id"), queryVec.as("qv"),
      explode(probeBuckets).as("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_key").desc, col("id").asc)
    // dedup multi-probe hits on the slim (query, id) pair BEFORE
    // vectors attach — a candidate found via two probes pays one cosine
    val cand = c.select(col("id"), col("bucket"))
      .join(broadcast(q.select(col("query_id"), col("bucket"))), "bucket")
      .filter(col("id") =!= col("query_id"))
      .select("query_id", "id").distinct()
    cand
      .join(c.select(col("id"), col("v")), "id")
      .join(broadcast(queries.select(queryId.as("query_id"), queryVec.as("qv"))),
        "query_id")
      .withColumn("cos_sim", cosine(col("v"), col("qv")))
      .withColumn("sim_key", round(col("cos_sim"), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("id").as("vec_id"), round(col("cos_sim"), 4).as("cos_sim"))
  }

  /** Per-group embedding centroids in LONG format (group, dim, mean_v)
    * — the semantic summary behind topic drift monitoring, per-source
    * cluster seeds, and label prototypes. Long format on purpose: no
    * array reassembly, so the whole thing is one posexplode + one
    * partial-aggregated groupBy(group, dim) — scales to any corpus and
    * any dimensionality, and the caller can pivot a small result back
    * to arrays if needed.
    *
    * Determinism follows the [[GraphOps.pageRank]] contract: each
    * component is TRUNCATED at 7 dp (floor — repr-independent where
    * round-half-up is not), summed over exact decimals, and the mean
    * is truncated again. `dim` is 1-based (matching SQL subscripts).
    */
  def centroids(df: DataFrame, group: Column, vec: Column): DataFrame = {
    def t7(c: Column): Column = floor(c * 1e7) / 1e7
    df.select(group.as("grp"), posexplode(vec).as(Seq("pos", "v")))
      .groupBy(col("grp"), (col("pos") + 1).as("dim"))
      .agg(
        count(lit(1)).as("n"),
        sum(t7(col("v").cast("double")).cast("decimal(28,7)")).as("s"))
      .select(col("grp"), col("dim"),
        t7(col("s").cast("double") / col("n")).as("mean_v"))
  }
}
