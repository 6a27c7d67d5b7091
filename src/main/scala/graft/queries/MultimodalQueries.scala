package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal binary-column plumbing (SURVEY §2.D12). The oracle-able
  * part is the pack step — opaque binary payload + typed metadata; the
  * decode/frame kernels are partition-local stubs covered by
  * MultimodalSpec (no portable SQL exists for a codec seam).
  */
object MultimodalQueries {

  val all: Seq[Q] = Seq(
    Q(
      "q_binary_meta",
      """SELECT doc_id,
        |  ['png', 'jpeg', 'webp'][CAST(doc_id % 3 AS INT) + 1] AS format,
        |  CAST(32 + (doc_id * 7) % 97 AS INT) AS width,
        |  CAST(32 + (doc_id * 13) % 61 AS INT) AS height,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |FROM documents
        |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Multimodal.pack(table(s, dir, "documents"), col("doc_id"), col("text"))
        .select(
          col("doc_id"),
          col("meta.format").as("format"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.n_bytes").as("n_bytes"))
        .orderBy("doc_id")
    }
  )
}
