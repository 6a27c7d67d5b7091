package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal binary-column plumbing (SURVEY §2.D12). The oracle-able
  * parts are the pack step (opaque binary payload + typed metadata) and
  * frame sampling (byte-for-byte); the image decode kernel is REAL
  * (javax.imageio inside the partition kernel) but has no portable SQL
  * twin — `q_media_decode` is rows-only with exact-pixel assertions in
  * MultimodalSpec.
  */
object MultimodalQueries {

  /** The q_media_phash corpus: deterministic per-cell-hash PNGs where
    * id i and i+1000 are photometric near-twins (one perturbed pixel),
    * plus text payloads that must stay out of Hamming pairing. ONE
    * builder shared by the near-dup query and its Hamming audit —
    * never a drifting copy.
    */
  private def phashCorpus(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    def png(i: Long, perturb: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) {
        // dHash keys on gradient-sign STRUCTURE, so each id gets its
        // own structure: a per-cell integer hash of (i, x, y), not a
        // phase shift of one shared gradient (those all look alike)
        val cell = (i * 2654435761L + x * 40503L + y * 2738L) & 0xFFFFFFFFL
        val lum = ((cell ^ (cell >> 13)) & 0xFF).toInt
        img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
      }
      if (perturb) {
        val px = (i % 16).toInt; val py = ((i * 7) % 16).toInt
        img.setRGB(px, py, img.getRGB(px, py) ^ 0x00282828)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = (0L until 30L).flatMap(i =>
      Seq((i, png(i, perturb = false)), (i + 1000L, png(i, perturb = true))))
    import s.implicits._
    val imgDf = rows.toDF("doc_id", "payload")
    val txtDf = table(s, dir, "documents").limit(40)
      .select((col("doc_id") + 2000000).as("doc_id"),
        col("text").cast("binary").as("payload"))
    Multimodal.pack(imgDf.unionByName(txtDf), col("doc_id"), col("payload"))
  }

  /** The q_media_audio_neardup corpus: id i and i+1000 are gain/wobble
    * square-wave twins (one envelope window nudged), plus text
    * payloads. Shared by the near-dup query and its Hamming audit.
    */
  private def audioNearDupCorpus(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    def wave(i: Long, tweak: Boolean): Array[Short] =
      Array.tabulate(650) { j =>
        val w = j / 10
        val amp = 500 + ((w * (2654435761L + i * 9176L)) & 0x7FF).toInt +
          (if (tweak && w == (i % 65).toInt) 3 else 0)
        (if (j % 2 == 0) amp else -amp).toShort
      }
    val wavs = (0L until 25L).flatMap { i =>
      Seq((i, Multimodal.wavPcm16(8000, 1, wave(i, tweak = false))),
        (i + 1000L, Multimodal.wavPcm16(8000, 1, wave(i, tweak = true))))
    }
    import s.implicits._
    val wavDf = wavs.toDF("doc_id", "media")
    val txtDf = table(s, dir, "documents").limit(20)
      .select((col("doc_id") + 2000000).as("doc_id"),
        col("text").cast("binary").as("media"))
    wavDf.unionByName(txtDf)
  }

  val all: Seq[Q] = Seq(

    // D12: real image decode through the partition-local kernel — a
    // deterministic mixed corpus (RGB gradient PNGs keyed by id, plus
    // text payloads that must take the decoded=false fallback), decoded
    // and aggregated. DuckDB has no PNG codec → rows-only.
    Q.rowsOnly("q_media_decode") { (s, dir) =>
      val pngs = (0L until 50L).map { i =>
        val w = 2 + (i % 3).toInt
        val h = 2 + (i % 2).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w)
          img.setRGB(x, y, (((i * 41 + x * 17 + y * 7) % 256).toInt << 16) |
            ((i % 256).toInt << 8) | ((x * y) % 256))
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (i, bos.toByteArray)
      }
      import s.implicits._
      val imgDf = pngs.toDF("doc_id", "payload")
      val txtDf = table(s, dir, "documents").limit(50)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text").cast("binary").as("payload"))
      val packed = Multimodal.pack(imgDf.unionByName(txtDf), col("doc_id"), col("payload"))
      Multimodal.decodeFeatures(packed, dim = 16)
        .select(col("doc_id"), col("decoded"), col("width"), col("height"),
          round(element_at(col("features"), 1), 4).as("f_mean_r"),
          round(element_at(col("features"), 4), 4).as("f_hist0"))
        .orderBy("doc_id")
    },
    // D12d: REAL audio decode through the pure-JVM WAV kernel — a
    // deterministic corpus of id-keyed square waves (amplitude, period,
    // and rate all vary by id) plus text payloads that must take the
    // decoded=false fallback. DuckDB has no audio codec → rows-only;
    // hand-computed exactness lives in MultimodalSpec.
    Q.rowsOnly("q_media_audio") { (s, dir) =>
      val wavs = (0L until 40L).map { i =>
        val amp = (500 + i * 37).toShort
        val period = 1 + (i % 4).toInt
        val samples = Array.tabulate(64) { j =>
          (if ((j / period) % 2 == 0) amp else (-amp).toShort): Short
        }
        (i, Multimodal.wavPcm16(8000 + i.toInt * 100, 1, samples))
      }
      import s.implicits._
      val wavDf = wavs.toDF("doc_id", "media")
      val txtDf = table(s, dir, "documents").limit(20)
        .select((col("doc_id") + 1000000).as("doc_id"),
          col("text").cast("binary").as("media"))
      Multimodal.audioFeatures(wavDf.unionByName(txtDf))
        .select(col("doc_id"), col("decoded"), col("sample_rate"),
          col("channels"), col("n_frames"), col("duration_us"),
          round(col("rms"), 6).as("rms"),
          round(col("zero_cross_rate"), 6).as("zcr"),
          round(col("peak"), 6).as("peak"))
        .orderBy("doc_id")
    },

    // D42b: audio near-dup over the energy-envelope fingerprint — id i
    // and i+1000 are gain/wobble twins (one envelope window nudged),
    // text payloads stay out of pairing entirely. No DuckDB audio
    // codec → rows-only; planted exactness in MultimodalSpec.
    Q.rowsOnly("q_media_audio_neardup") { (s, dir) =>
      graft.operators.Dedup.audioNearDup(
          audioNearDupCorpus(s, dir), maxDist = 6)
        .orderBy("id_a", "id_b")
    },

    // D42/D42b audit: the two Hamming media tiers scored against
    // BRUTE all-pairs Hamming over their own decoded signatures — the
    // 8×8-bit pigeonhole blocking measured as fact rather than argued
    // from the chunk arithmetic (P = R = 1.0 expected; DedupSpec
    // asserts the floor, MultimodalSpec keeps the planted-twin view).
    // The corpora are the near-dup queries' own builders (shared
    // helpers, never drifting copies) — audit-sized by construction,
    // which is what makes the quadratic truth tier safe. Codec bytes
    // → rows-only.
    Q.rowsOnly("q_audit_media_hamming") { (s, dir) =>
      import graft.operators.Dedup
      val imgSigs = Multimodal.perceptualHash(phashCorpus(s, dir))
        .filter(col("decoded"))
        .select(col("doc_id").as("id"), col("phash").as("sig"))
        .localCheckpoint()
      val audSigs = Multimodal.audioFingerprint(audioNearDupCorpus(s, dir))
        .filter(col("decoded"))
        .select(col("doc_id").as("id"), col("sig"))
        .localCheckpoint()
      Dedup.auditPairs(
          Dedup.hammingPairs(imgSigs, maxDist = 6, nChunks = 8),
          Dedup.hammingPairsBrute(imgSigs, maxDist = 6))
        .withColumn("tier", lit("dhash_vs_brute_hamming"))
        .unionByName(Dedup.auditPairs(
            Dedup.hammingPairs(audSigs, maxDist = 6, nChunks = 8),
            Dedup.hammingPairsBrute(audSigs, maxDist = 6))
          .withColumn("tier", lit("audio_vs_brute_hamming")))
        .select("tier", "n_found", "n_truth", "n_hit",
          "precision", "recall", "f1")
        .orderBy("tier")
    },

    // D42: perceptual-hash image near-dup — deterministic gradient
    // PNGs where id i and i+1000 are photometric near-twins (one
    // perturbed pixel), plus text payloads that must stay out of
    // Hamming pairing entirely. DuckDB has no PNG codec → rows-only;
    // planted-recall exactness lives in MultimodalSpec/DedupSpec.
    Q.rowsOnly("q_media_phash") { (s, dir) =>
      graft.operators.Dedup.imageNearDup(phashCorpus(s, dir), maxDist = 6)
        .orderBy("id_a", "id_b")
    },
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
    },

    // D100: scene-change detection over the sampled frame stream —
    // rows-only (decode-kernel features, the q_media_decode class);
    // boundary exactness is MultimodalSpec's planted-cut proof.
    Q.rowsOnly("q_media_scenes") { (s, dir) =>
      val docs = table(s, dir, "documents")
      graft.operators.Multimodal.sceneChanges(docs, col("doc_id"),
          col("text").cast("binary"), frameBytes = 64, stride = 1,
          threshold = 0.1)
        .orderBy("video_id", "frame_idx")
    }
  )
}
