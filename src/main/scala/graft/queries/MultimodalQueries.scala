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
    },

    // D12b: strided frame sampling over the binary payload — the
    // explode-shaped video-pipeline op, oracle-checked byte-for-byte
    // (ASCII corpus → frames decode to comparable strings).
    Q(
      "q_media_frames",
      """WITH m AS (
        |  SELECT doc_id, text,
        |    greatest(CAST(floor(octet_length(encode(text)) / 64) AS BIGINT), 1) AS nf
        |  FROM documents)
        |SELECT doc_id, CAST(i AS INT) AS frame_idx,
        |  CAST(octet_length(encode(substring(text, CAST(i AS INT) * 64 + 1, 64))) AS INT) AS frame_bytes,
        |  substring(text, CAST(i AS INT) * 64 + 1, 64) AS frame_str
        |FROM (SELECT doc_id, text, unnest(range(0, nf, 4)) AS i FROM m)
        |ORDER BY doc_id, frame_idx""".stripMargin
    ) { (s, dir) =>
      val packed = Multimodal.pack(table(s, dir, "documents"), col("doc_id"), col("text"))
      Multimodal.sampleFrames(packed, frameBytes = 64, stride = 4)
        .select(
          col("doc_id"),
          col("frame_idx").cast("int").as("frame_idx"),
          col("frame_bytes").cast("int").as("frame_bytes"),
          col("frame").cast("string").as("frame_str"))
        .orderBy("doc_id", "frame_idx")
    }
  )
}
