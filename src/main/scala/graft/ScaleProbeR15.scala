package graft

import org.apache.spark.sql.functions._

/** r15 scale probe (kept out of the driver contract): measured
  * evidence for the round's new scale claims.
  *
  *  1. C129b — exact rfm's three single-partition ntile sorts vs
  *     rfmSketched's broadcast KLL boundaries at 2M synthetic users:
  *     wall time for both, plus the score-agreement profile (sketched
  *     quintiles may differ ±1 at boundaries by contract — measure
  *     how often).
  *  2. D149 — duplicatedNgramTrim over the ~sf1 replica corpus (50k
  *     docs): wall time + corpus-level trim fraction (the operator's
  *     cost is the two shingle passes; no pair join anywhere).
  *  3. D150 — headTailTruncate over the same corpus: pure projection,
  *     should read at scan speed.
  *
  * Output: one JSON file (args(0), default SCALE_PROBE_r15.json).
  */
object ScaleProbeR15 {
  def main(args: Array[String]): Unit = {
    val outPath = args.lift(0).getOrElse("SCALE_PROBE_r15.json")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val nUsers = args.lift(1).map(_.toInt).getOrElse(2000000)
    val spark = Engine.session("graft-scale-probe-r15")
    import spark.implicits._

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def d2(x: Double): String =
      BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString

    // -- 1. RFM at 2M users: ~3 events per user, deterministic values
    val day = 86400L * 1000000000L
    val events = spark.range(0, nUsers.toLong * 3)
      .select((col("id") % nUsers).as("user_id"),
        (lit(day) * 30 + (col("id") % 97) * day).as("ts_ns"),
        ((col("id") % 251) + 1).cast("double").as("value"))
      .localCheckpoint()
    val (exactRows, tExact) = timed {
      graft.operators.Behavior.rfm(events, col("user_id"), col("ts_ns"),
        col("value")).write.format("noop").mode("overwrite").save()
    }
    val (_, tSketch) = timed {
      graft.operators.Behavior.rfmSketched(events, col("user_id"),
        col("ts_ns"), col("value")).write.format("noop").mode("overwrite").save()
    }
    // agreement profile on a deterministic 1% slice (collect-free:
    // aggregate the |delta| histogram). Compared on the MONETARY and
    // RECENCY axes — the fixture's frequency is constant (3/user), a
    // total tie mass where exact ntile SPLITS ties by user_id position
    // (a rank artifact) while the sketched scorer gives the whole tie
    // one score by documented contract; comparing that axis measures
    // the fixture, not the operator.
    val ex = graft.operators.Behavior.rfm(events, col("user_id"),
        col("ts_ns"), col("value"))
      .filter(graft.operators.Sampling.hashBucket(col("user_id")) < 10)
      .select(col("user_id"), col("m_score").as("me"), col("r_score").as("re"))
    val sk = graft.operators.Behavior.rfmSketched(events, col("user_id"),
        col("ts_ns"), col("value"))
      .filter(graft.operators.Sampling.hashBucket(col("user_id")) < 10)
      .select(col("user_id"), col("m_score").as("ms"), col("r_score").as("rs"))
    val agree = ex.join(sk, Seq("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("me") === col("ms"), 1L).otherwise(0L)).as("eq"),
        sum(when(abs(col("me") - col("ms")) <= 1, 1L).otherwise(0L)).as("w1"),
        sum(when(col("re") === col("rs"), 1L).otherwise(0L)).as("req"),
        sum(when(abs(col("re") - col("rs")) <= 1, 1L).otherwise(0L)).as("rw1"))
      .collect()(0)

    // -- 2/3. trim + truncate over the replica corpus
    val docs = sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val nDocs = docs.count()
    val (trimStats, tTrim) = timed {
      graft.operators.Dedup.duplicatedNgramTrim(docs, col("doc_id"),
          col("text"), n = 3, minDf = 5)
        .agg(sum(col("n_tokens")).as("nt"), sum(col("n_dropped")).as("nd"))
        .collect()(0)
    }
    val (_, tTrunc) = timed {
      graft.operators.Packing.headTailTruncate(docs, col("doc_id"),
          col("text"), budget = 256)
        .write.format("noop").mode("overwrite").save()
    }

    val json =
      s"""{"sf_dir":"$sfDir","n_docs":$nDocs,
         |"rfm_2m_users":{"n_users":$nUsers,
         |  "exact_ntile_wall_s":${d2(tExact)},
         |  "sketched_kll_wall_s":${d2(tSketch)},
         |  "sample_n":${agree.getLong(0)},"m_score_equal":${agree.getLong(1)},
         |  "m_score_within_1":${agree.getLong(2)},
         |  "r_score_equal":${agree.getLong(3)},
         |  "r_score_within_1":${agree.getLong(4)}},
         |"dup_trim_sf1":{"wall_s":${d2(tTrim)},
         |  "tokens":${trimStats.getLong(0)},"dropped":${trimStats.getLong(1)}},
         |"headtail_truncate_sf1":{"wall_s":${d2(tTrunc)}}}"""
        .stripMargin.replace("\n", "")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json)
    println(json)
    spark.stop()
  }
}
