package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Packing, Sampling, TextMetrics}

/** Corpus-curation queries (SURVEY §2.D16-D19): corpus statistics
  * (TF-IDF), deterministic sampling / dataset splits, and sequence
  * packing — the reproducibility-critical steps between "cleaned
  * documents" and "training batches". All three are fully
  * SQL-expressible, so each has an exact DuckDB twin.
  */
object CurationQueries {

  /** DuckDB expression for the shared tokenizer over column `c`. */
  private def tkSql(c: String): String =
    s"""list_filter(regexp_split_to_array(regexp_replace(lower($c), '[^\\p{L}\\p{Nd}\\s]', ' ', 'g'), '\\s+'), t -> len(t) > 0)"""

  val all: Seq[Q] = Seq(

    // D17: per-document top-3 TF-IDF terms. Smoothed idf; ties break
    // on term; scores rounded to 4 dp on both engines.
    Q(
      "q_tfidf_topterms",
      s"""WITH t AS (
         |  SELECT doc_id, unnest(${tkSql("text")}) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
         |s AS (
         |  SELECT doc_id, term,
         |    round(tf * ln((n_docs + 1) * 1.0 / (df + 1)), 4) AS score
         |  FROM tf JOIN dfq USING (term) CROSS JOIN n),
         |r AS (
         |  SELECT doc_id, term, score,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
         |  FROM s)
         |SELECT doc_id AS id, CAST(rank AS INT) AS rank, term, score
         |FROM r WHERE rank <= 3
         |ORDER BY id, rank""".stripMargin
    ) { (s, dir) =>
      TextMetrics.tfidfTopTerms(table(s, dir, "documents"), col("doc_id"), col("text"), k = 3)
        .orderBy("id", "rank")
    },

    // D18: deterministic per-mille bucketing → 90/5/5 split assignment
    // plus a 10% hash sample, all pure integer arithmetic replayed
    // exactly by the oracle (same rows on every engine and run).
    Q(
      "q_sample_split", {
        val b = Sampling.hashBucketSql("doc_id")
        s"""SELECT doc_id,
           |  CAST($b AS BIGINT) AS bucket,
           |  CASE WHEN $b < 900 THEN 'train'
           |       WHEN $b < 950 THEN 'val'
           |       ELSE 'test' END AS split,
           |  CAST($b < 100 AS INT) AS in_sample
           |FROM documents
           |ORDER BY doc_id""".stripMargin
      }
    ) { (s, dir) =>
      Sampling.splitAssign(table(s, dir, "documents"), col("doc_id"),
          Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .select(
          col("doc_id"),
          Sampling.hashBucket(col("doc_id")).as("bucket"),
          col("split"),
          (Sampling.hashBucket(col("doc_id")) < 100).cast("int").as("in_sample"))
        .orderBy("doc_id")
    },

    // D19: concat-then-chunk sequence packing under a 512-token budget,
    // sharded 8 ways (the window is partitioned by construction).
    Q(
      "q_pack_sequences",
      s"""WITH t AS (
         |  SELECT doc_id, doc_id % 8 AS shard,
         |    len(${tkSql("text")}) AS n_toks
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, shard, n_toks,
         |    coalesce(sum(n_toks) OVER (
         |      PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         |  FROM t)
         |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
         |  CAST(n_toks AS BIGINT) AS n_toks,
         |  CAST(cum // 512 AS BIGINT) AS seq_id,
         |  CAST(cum % 512 AS BIGINT) AS tok_offset
         |FROM c
         |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val docs = table(s, dir, "documents").select(
        col("doc_id"),
        pmod(col("doc_id"), lit(8L)).as("shard"),
        size(graft.functions.tokens(col("text"))).cast("long").as("n_toks"))
      Packing.packSequences(docs, col("shard"), Seq(col("doc_id")),
          col("n_toks"), budget = 512)
        .select(col("doc_id"), col("shard"), col("n_toks"),
          col("seq_id").cast("long").as("seq_id"), col("tok_offset"))
        .orderBy("doc_id")
    }
  )
}
