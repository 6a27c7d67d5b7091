package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val packed = Multimodal.pack(
    sources.Tables.load(spark, sf, "documents").limit(50),
    col("doc_id"), col("text")).cache()

  test("pack produces opaque binary + typed metadata") {
    val row = packed.select("media", "meta.format", "meta.n_bytes", "doc_id", "n_chars").head()
    assert(row.getAs[Array[Byte]](0).nonEmpty)
    assert(Set("png", "jpeg", "webp").contains(row.getString(1)))
    // ASCII corpus → bytes == chars; the contract is n_bytes tracks payload
    assert(row.getLong(2) == row.getAs[Long]("n_chars"))
  }

  test("decodeFeatures is partition-local, batched, deterministic, schema-stable") {
    val out = Multimodal.decodeFeatures(packed, dim = 16, batchSize = 8)
    assert(out.schema.fieldNames.toSeq ==
      Seq("doc_id", "decoded", "width", "height", "features"))
    val rows = out.collect()
    assert(rows.length == 50)
    // text bytes are not an image: every row takes the flagged fallback
    assert(rows.forall(!_.getAs[Boolean]("decoded")))
    assert(rows.forall(_.getAs[scala.collection.Seq[Float]]("features").length == 16))
    // deterministic: same input → same features
    val again = Multimodal.decodeFeatures(packed, dim = 16, batchSize = 8).collect()
    assert(rows.map(_.getAs[scala.collection.Seq[Float]]("features").toList).toSeq ==
      again.map(_.getAs[scala.collection.Seq[Float]]("features").toList).toSeq)
    // no shuffle in the plan: decode must stay embarrassingly parallel
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode plan shuffles:\n$plan")
  }

  test("decodeFeatures decodes a real PNG through javax.imageio with exact pixel features") {
    // 2x2 PNG: red, green / blue, white — written through the real codec
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000); img.setRGB(1, 0, 0x00FF00)
    img.setRGB(0, 1, 0x0000FF); img.setRGB(1, 1, 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val df = Seq((7L, bos.toByteArray)).toDF("doc_id", "media")
      .withColumn("meta", struct(
        lit("png").as("format"), lit(0).as("width"), lit(0).as("height"),
        length(col("media")).cast("long").as("n_bytes")))
    val r = Multimodal.decodeFeatures(df, dim = 16).head()
    assert(r.getAs[Boolean]("decoded"), "PNG bytes must go through the real codec")
    // dimensions come from the DECODED image, not the declared meta (0x0)
    assert(r.getAs[Int]("width") == 2 && r.getAs[Int]("height") == 2)
    val f = r.getAs[scala.collection.Seq[Float]]("features")
    // channel means: each channel is 255 in exactly 2 of 4 pixels -> 0.5
    assert(f(0) == 0.5f && f(1) == 0.5f && f(2) == 0.5f)
    // luminance: r/g/b pixels all have lum 85 -> bucket 85*13/256 = 4;
    // white has lum 255 -> bucket 255*13/256 = 12
    assert(f(3 + 4) == 0.75f && f(3 + 12) == 0.25f)
    assert(f.sum == 0.5f * 3 + 1.0f, "histogram must sum to 1")
  }

  test("q_media_decode mixes real decodes and flagged fallbacks") {
    val out = SparkEntry.queries("q_media_decode")(spark, sf).collect()
    assert(out.length == 100)
    val (dec, fall) = out.partition(_.getAs[Boolean]("decoded"))
    assert(dec.length == 50 && fall.length == 50)
    // decoded rows report codec dimensions (2..4 x 2..3), not packed meta
    assert(dec.forall(r => r.getAs[Int]("width") >= 2 && r.getAs[Int]("width") <= 4))
  }

  test("resizeImages downsamples with exact nearest-neighbor pixels; non-images pass through") {
    // 4x4 PNG of 2x2 solid quadrants: NN-downsample to 2x2 must pick
    // one exact quadrant color per target pixel
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val q = Array(0xFF0000, 0x00FF00, 0x0000FF, 0xFFFFFF)
    for (y <- 0 until 4; x <- 0 until 4)
      img.setRGB(x, y, q((y / 2) * 2 + (x / 2)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val df = Seq((1L, bos.toByteArray), (2L, "not an image".getBytes))
      .toDF("doc_id", "media")
      .withColumn("meta", struct(
        lit("png").as("format"), lit(9).as("width"), lit(9).as("height"),
        length(col("media")).cast("long").as("n_bytes")))
    val out = Multimodal.resizeImages(df, targetW = 2, targetH = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    val ok = out(1L)
    assert(ok.getAs[Boolean]("decoded") && ok.getAs[Int]("width") == 2)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(ok.getAs[Array[Byte]]("media")))
    assert(back.getWidth == 2 && back.getHeight == 2)
    val got = for (y <- 0 until 2; x <- 0 until 2) yield back.getRGB(x, y) & 0xFFFFFF
    assert(got == Seq(0xFF0000, 0x00FF00, 0x0000FF, 0xFFFFFF), got.map(_.toHexString))
    // non-image passes through unchanged, flagged, with declared dims
    val bad = out(2L)
    assert(!bad.getAs[Boolean]("decoded") && bad.getAs[Int]("width") == 9)
    assert(new String(bad.getAs[Array[Byte]]("media")) == "not an image")
  }

  private def testPng(seed: Int, brightnessShift: Int = 0, flipPixel: Boolean = false,
      invert: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) {
      // dHash sees luminance GRADIENT SIGNS, so "different content"
      // means different structure, not a different seed: invert flips
      // the horizontal gradient direction
      val gx = if (invert) 15 - x else x
      // values kept in [0, 200] so a +shift never clamps — a uniform
      // brightness shift must leave every dHash gradient sign intact
      val r = (seed * 37 + gx * 12) % 200 + brightnessShift
      val g = (seed * 53 + y * 11) % 200 + brightnessShift
      val b = (gx * y + seed) % 200 + brightnessShift
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    // (3,4) IS on the 9×8 dHash sample grid (src x ∈ {0,1,3,5,7,8,10,
    // 12,14}, src y even) — a blown-out sampled pixel must flip at
    // least the gradient sign against its right neighbor
    if (flipPixel) img.setRGB(3, 4, 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def packOf(rows: Seq[(Long, Array[Byte])]) =
    Multimodal.pack(rows.toDF("doc_id", "payload"), col("doc_id"), col("payload"))

  test("perceptualHash: dHash invariant under uniform brightness, moved by content") {
    val df = packOf(Seq(
      1L -> testPng(7), 2L -> testPng(7, brightnessShift = 40),
      3L -> testPng(7, flipPixel = true), 4L -> testPng(7, invert = true),
      5L -> "not an image".getBytes, 6L -> "not an image".getBytes))
    val h = Multimodal.perceptualHash(df).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    assert(h(1)._1 && h(2)._1 && h(3)._1 && h(4)._1)
    // uniform brightness shift: every pairwise luminance gradient keeps
    // its sign → identical dHash
    assert(h(1)._2 == h(2)._2)
    // one blown-out pixel: a few gradient signs flip, most survive
    val d13 = java.lang.Long.bitCount(h(1)._2 ^ h(3)._2)
    assert(d13 > 0 && d13 <= 6, s"single-pixel edit moved $d13 bits")
    // different content: far in Hamming space
    assert(java.lang.Long.bitCount(h(1)._2 ^ h(4)._2) > 6)
    // undecodable: flagged, but equal bytes still get equal hashes
    assert(!h(5)._1 && !h(6)._1 && h(5)._2 == h(6)._2)
  }

  test("imageNearDup recovers planted photometric twins, excludes text payloads") {
    val rows = (0 until 10).flatMap { i =>
      Seq((i.toLong, testPng(i)), (i + 100L, testPng(i, flipPixel = true)))
    } ++ Seq((500L, "plain text".getBytes), (501L, "plain text".getBytes))
    val pairs = graft.operators.Dedup.imageNearDup(packOf(rows), maxDist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (i <- 0 until 10)
      assert(pairs.contains((i.toLong, i + 100L)), s"planted twin $i missing")
    // identical text payloads share an FNV hash but must NOT be paired
    assert(!pairs.exists(p => p._1 >= 500L || p._2 >= 500L))
  }

  test("hammingPairs pigeonhole: exact recall at radius nChunks-1, none past it") {
    // adversarial spread: 7 flipped bits landing in 7 DIFFERENT 8-bit
    // chunks — exactly one shared chunk left, the pigeonhole minimum
    val base = 0x5A5A5A5A5A5A5A5AL
    val spread7 = (0 until 7).foldLeft(base)((s, c) => s ^ (1L << (c * 8)))
    val spread8 = spread7 ^ (1L << 56) // all 8 chunks differ
    val sigs = Seq((1L, base), (2L, spread7), (3L, spread8))
      .toDF("id", "sig")
    val p7 = graft.operators.Dedup.hammingPairs(sigs, maxDist = 7, nChunks = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(p7.contains((1L, 2L, 7)), "radius-7 pair must survive 8-chunk blocking")
    assert(!p7.exists(p => p._1 == 1L && p._2 == 3L), "distance-8 pair must not pass")
  }

  test("sampleFrames emits strided fixed-size chunks") {
    val frames = Multimodal.sampleFrames(packed, frameBytes = 64, stride = 4)
    val byDoc = frames.groupBy("doc_id").agg(
      count(lit(1)).as("n"), max("frame_idx").as("max_idx")).collect()
    assert(byDoc.nonEmpty)
    val f = frames.filter(col("frame_idx") === 0).head()
    assert(f.getAs[Array[Byte]]("frame").length == 64)
    // stride respected
    assert(frames.select("frame_idx").as[Int].collect().forall(_ % 4 == 0))
  }

  test("audioFeatures: hand-computed PCM features; stereo mixdown, 8-bit, and garbage fallback") {
    // mono 16-bit, 8 frames of alternating ±1000 at 8000 Hz
    val monoWav = Multimodal.wavPcm16(8000, 1,
      Array.tabulate(8)(i => (if (i % 2 == 0) 1000 else -1000).toShort))
    // stereo 16-bit: mono mix = [0, +2000, 0, -2000] / 32768
    val stereoWav = Multimodal.wavPcm16(8000, 2,
      Array[Short](1000, -1000, 1000, 3000, -1000, 1000, -1000, -3000))
    // 8-bit mono hand-assembled: samples [128, 255, 0, 128] at 4000 Hz
    // -> normalized [0, 127/128, -1, 0]
    val pcm8 = {
      val bb = java.nio.ByteBuffer.allocate(44 + 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 4)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(4000).putInt(4000).putShort(1).putShort(8)
        .put("data".getBytes("US-ASCII")).putInt(4)
      Seq(128, 255, 0, 128).foreach(v => bb.put(v.toByte))
      bb.array()
    }
    val rows = Seq(
      (1L, monoWav), (2L, stereoWav), (3L, pcm8),
      (4L, "definitely not audio bytes at all".getBytes("UTF-8")),
      (5L, monoWav.take(20))) // truncated header
    val out = Multimodal.audioFeatures(rows.toDF("doc_id", "media"))
      .orderBy("doc_id")
      .as[(Long, Boolean, Int, Int, Int, Long, Long, Double, Double, Double)]
      .collect()
    val a16 = 1000.0 / 32768.0
    assert(out(0) == ((1L, true, 8000, 1, 16, 8L, 1000L, a16, 1.0, a16)),
      out(0).toString)
    val m = 2000.0 / 32768.0
    val stereoRms = math.sqrt((m * m + m * m) / 4)
    assert(out(1) == ((2L, true, 8000, 2, 16, 4L, 500L, stereoRms, 1.0 / 3, m)),
      out(1).toString)
    val x255 = 127.0 / 128.0
    val rms8 = math.sqrt((x255 * x255 + 1.0) / 4)
    assert(out(2) == ((3L, true, 4000, 1, 8, 4L, 1000L, rms8, 2.0 / 3, 1.0)),
      out(2).toString)
    assert(out(3) == ((4L, false, 0, 0, 0, 0L, 0L, 0.0, 0.0, 0.0)))
    assert(out(4) == ((5L, false, 0, 0, 0, 0L, 0L, 0.0, 0.0, 0.0)))
    // the encoder round-trips through the decoder byte-exactly
    val again = Multimodal.audioFeatures(Seq((9L, monoWav)).toDF("doc_id", "media"))
      .as[(Long, Boolean, Int, Int, Int, Long, Long, Double, Double, Double)]
      .head()
    assert(again == out(0).copy(_1 = 9L))
  }

  test("audioNearDup: envelope twins pair within radius, distinct material and non-audio stay out") {
    // 65 windows x 10 frames; per-window amplitude pattern = the
    // envelope structure the fingerprint keys on
    def wave(seed: Long, tweak: Int => Int = _ => 0): Array[Short] =
      Array.tabulate(650) { j =>
        val w = j / 10
        val amp = 500 + ((w * seed) & 0x7FF).toInt + tweak(w)
        (if (j % 2 == 0) amp else -amp).toShort
      }
    val a = Multimodal.wavPcm16(8000, 1, wave(2654435761L))
    // twin: ONE window's amplitude nudged -> at most 2 envelope bits flip
    val aTwin = Multimodal.wavPcm16(8000, 1,
      wave(2654435761L, w => if (w == 30) 3 else 0))
    val other = Multimodal.wavPcm16(8000, 1, wave(40503L))
    val rows = Seq(
      (1L, a), (2L, aTwin), (3L, other),
      (4L, "not audio".getBytes("UTF-8")))
    val pairs = graft.operators.Dedup.audioNearDup(
        rows.toDF("doc_id", "media"), maxDist = 6)
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)), pairs.toString)
    assert(pairs.head._3 <= 2)
  }

  test("sceneChanges flags exactly the content boundary; uniform video stays quiet (D100)") {
    // video 1: 4 frames of 'a' bytes then 4 of 'z' — one hard cut;
    // video 2: uniform — no cuts
    val vids = Seq(
      (1L, "a" * 256 + "z" * 256),
      (2L, "m" * 512)).toDF("id", "payload")
    val out = Multimodal.sceneChanges(vids, col("id"),
        col("payload").cast("binary"), frameBytes = 64, stride = 1,
        threshold = 0.1)
      .orderBy("video_id", "frame_idx").collect()
    val v1 = out.filter(_.getAs[Long]("video_id") == 1L)
    assert(v1.length == 8)
    assert(v1(0).isNullAt(v1(0).fieldIndex("frame_dist"))) // no predecessor
    assert(!v1(0).getAs[Boolean]("scene_change"))
    val cuts = v1.filter(_.getAs[Boolean]("scene_change"))
      .map(_.getAs[Int]("frame_idx")).toSeq
    assert(cuts == Seq(4), s"cuts at $cuts")
    val v2 = out.filter(_.getAs[Long]("video_id") == 2L)
    assert(v2.forall(!_.getAs[Boolean]("scene_change")))
    // within-scene distances are exactly zero (identical frames)
    assert(v1(2).getAs[Double]("frame_dist") == 0.0)
  }

  test("E24 sceneChangeStream == batch sceneChanges across a split inside a scene and at the cut") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val vids = Seq(
      (1L, "a" * 256 + "z" * 256),
      (2L, "m" * 512)).toDF("id", "payload")
    val feats = Multimodal.frameFeatures(vids, col("id"),
        col("payload").cast("binary"), frameBytes = 64, stride = 1)
      .collect()
      .map(r => (r.getAs[Long]("video_id"), r.getAs[Int]("frame_idx"),
        r.getAs[scala.collection.Seq[Float]]("features").toSeq))
    val input = MemoryStream[(Long, Int, Seq[Float])](spark)
    val q = graft.streaming.EventStreams.sceneChangeStream(
        input.toDF().toDF("video_id", "frame_idx", "features"),
        threshold = 0.1)
      .writeStream.format("memory").queryName("e24_out").outputMode("append").start()
    try {
      // batch 1 ends mid-scene for video 2 and right BEFORE the cut
      // for video 1 — the cross-batch state carry is the proof
      input.addData(feats.filter(f => f._2 < 4).toSeq)
      q.processAllAvailable()
      input.addData(feats.filter(f => f._2 >= 4).toSeq)
      q.processAllAvailable()
      val streamed = spark.table("e24_out").collect()
        .map(r => (r.getAs[Long]("video_id"), r.getAs[Int]("frame_idx")) ->
          ((r.getAs[Any]("frame_dist"), r.getAs[Boolean]("scene_change")))).toMap
      val batch = Multimodal.sceneChanges(vids, col("id"),
          col("payload").cast("binary"), frameBytes = 64, stride = 1,
          threshold = 0.1)
        .collect()
        .map(r => (r.getAs[Long]("video_id"), r.getAs[Int]("frame_idx")) ->
          ((r.getAs[Any]("frame_dist"), r.getAs[Boolean]("scene_change")))).toMap
      assert(streamed == batch, s"streamed $streamed vs batch $batch")
      // the cut itself arrived in batch 2 against batch-1 state
      assert(streamed((1L, 4))._2)
    } finally q.stop()
  }
}
