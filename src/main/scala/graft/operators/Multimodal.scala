package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing — SURVEY §2.D12.
  *
  * Media payloads are opaque `binary` columns plus a typed metadata
  * struct; transforms (decode → feature-extract → thumbnail) run as
  * partition-local batch kernels over the binary bytes. The image
  * decode is REAL: `javax.imageio` (in the JDK — PNG/JPEG/BMP/GIF)
  * runs inside the partition kernel; payloads no codec accepts (e.g.
  * text bytes, or formats like webp that need an external plugin) fall
  * back to a deterministic byte-fold and are flagged `decoded=false` —
  * the total-function shape a production pipeline needs (quarantine by
  * flag, never a task crash on one corrupt file). Audio/video codecs
  * (ffmpeg-class) are the remaining external seam.
  *
  * Scale notes: decode work is embarrassingly parallel and stays inside
  * `mapPartitions` — no shuffle, no driver round-trip; batches bound
  * peak memory the way a vectorized Pandas-UDF batch would; the output
  * schema is fixed so downstream Catalyst still prunes columns.
  */
object Multimodal {

  /** Typed metadata carried next to every media payload. */
  val metaType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** Pack a text/bytes column as a media payload with deterministic
    * metadata (format from id mod 3; dimensions hashed from the id).
    * In production this is the ingest seam where real media files and
    * their container headers arrive.
    */
  def pack(df: DataFrame, id: Column, payload: Column): DataFrame = {
    val fmt = element_at(array(lit("png"), lit("jpeg"), lit("webp")),
      (pmod(id, lit(3)) + 1).cast("int"))
    val bin = payload.cast("binary")
    df.withColumn("media", bin)
      .withColumn("meta", struct(
        fmt.as("format"),
        (lit(32) + pmod(id * 7, lit(97))).cast("int").as("width"),
        (lit(32) + pmod(id * 13, lit(61))).cast("int").as("height"),
        length(bin).cast("long").as("n_bytes")))
  }

  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("decoded", BooleanType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /** Fallback kernel for payloads no installed codec accepts: folds the
    * raw bytes into `dim` accumulators. Deterministic, so undecodable
    * rows still carry a stable signature (dedup/grouping keeps working)
    * instead of nulls or a task failure.
    */
  private def byteFold(bytes: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      acc(i % dim) += (bytes(i) & 0xFF) / 255.0f
      i += 1
    }
    acc
  }

  /** Real image decode via `javax.imageio` + fixed-size feature vector:
    * features(0..2) = mean R/G/B in [0,1]; features(3..dim-1) = a
    * luminance histogram over dim-3 integer buckets, normalized by
    * pixel count. Integer bucket math keeps it bit-deterministic across
    * JVMs. Returns None when no registered ImageReader accepts the
    * bytes.
    */
  private def decodeImage(bytes: Array[Byte], dim: Int): Option[(Int, Int, Array[Float])] = {
    require(dim >= 4, "feature dim must leave room for 3 channel means + histogram")
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }
    img.map { im =>
      val w = im.getWidth
      val h = im.getHeight
      val nBuckets = dim - 3
      val hist = new Array[Long](nBuckets)
      var rSum = 0L; var gSum = 0L; var bSum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = im.getRGB(x, y)
          val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
          rSum += r; gSum += g; bSum += b
          hist(((r + g + b) / 3) * nBuckets / 256) += 1L
          x += 1
        }
        y += 1
      }
      val px = w.toLong * h
      val feats = new Array[Float](dim)
      feats(0) = (rSum.toDouble / px / 255.0).toFloat
      feats(1) = (gSum.toDouble / px / 255.0).toFloat
      feats(2) = (bSum.toDouble / px / 255.0).toFloat
      var i = 0
      while (i < nBuckets) { feats(3 + i) = (hist(i).toDouble / px).toFloat; i += 1 }
      (w, h, feats)
    }
  }

  /** Decode + feature-extract each media payload, `batchSize` rows at a
    * time within each partition (the JVM analogue of `mapInPandas`
    * batch shape: bounded memory, vectorizable kernel, zero shuffle).
    * Input needs columns (doc_id, media, meta); output is
    * (doc_id, decoded, width, height, features[dim]) — width/height
    * come from the DECODED image when a codec accepted the bytes, else
    * from the declared metadata with `decoded=false`.
    */
  def decodeFeatures(df: DataFrame, dim: Int = 16, batchSize: Int = 64): DataFrame = {
    val enc = Encoders.row(decodedSchema)
    df.select(col("doc_id"), col("media"), col("meta.width"), col("meta.height"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // batch boundary = where a vectorized decoder would take an
          // Arrow batch; per-batch allocation stays bounded.
          batch.iterator.map { r =>
            val bytes = r.getAs[Array[Byte]]("media")
            // total function, incl. null payload/metadata: the
            // quarantine contract is "flag, never crash the task"
            val safeBytes = if (bytes == null) Array.empty[Byte] else bytes
            val mw = if (r.isNullAt(2)) 0 else r.getInt(2)
            val mh = if (r.isNullAt(3)) 0 else r.getInt(3)
            decodeImage(safeBytes, dim) match {
              case Some((w, h, feats)) => Row(r.getLong(0), true, w, h, feats.toSeq)
              case None =>
                Row(r.getLong(0), false, mw, mh, byteFold(safeBytes, dim).toSeq)
            }
          }
        }
      }(enc)
  }

  private val resizedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("decoded", BooleanType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("media", BinaryType)))

  /** Bit-deterministic nearest-neighbor resample: target pixel (x,y)
    * reads source pixel (x·srcW/dstW, y·srcH/dstH) with integer math —
    * no AWT rendering pipeline, whose interpolation can vary by JVM.
    */
  private def resizeNearest(
      im: java.awt.image.BufferedImage, w: Int, h: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out.setRGB(x, y, im.getRGB(x * im.getWidth / w, y * im.getHeight / h))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Normalize every decodable image payload to `targetW`×`targetH`
    * (the preprocessing step in front of any vision encoder) and
    * re-encode as PNG — same partition-local batched kernel shape as
    * `decodeFeatures`, zero shuffle. Undecodable payloads pass through
    * unchanged with `decoded=false` and their declared dimensions, so
    * one corrupt file quarantines instead of failing the task.
    */
  def resizeImages(
      df: DataFrame, targetW: Int, targetH: Int, batchSize: Int = 64): DataFrame = {
    require(targetW >= 1 && targetH >= 1, "target dimensions must be >= 1")
    val enc = Encoders.row(resizedSchema)
    df.select(col("doc_id"), col("media"), col("meta.width"), col("meta.height"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val bytes = r.getAs[Array[Byte]]("media")
            val img =
              try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
              catch { case _: Exception => None }
            img match {
              case Some(im) =>
                val bos = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(resizeNearest(im, targetW, targetH), "png", bos)
                Row(r.getLong(0), true, targetW, targetH, bos.toByteArray)
              case None =>
                Row(r.getLong(0), false, r.getInt(2), r.getInt(3), bytes)
            }
          }
        }
      }(enc)
  }

  private val phashSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("decoded", BooleanType),
    StructField("phash", LongType)))

  /** 64-bit difference hash (dHash) of a decoded image: integer
    * nearest-neighbor sample onto a 9×8 luminance grid, bit k set when
    * grid(x,y) > grid(x+1,y). All-integer math (same contract as
    * `resizeNearest`) keeps the hash bit-identical across JVMs; small
    * photometric edits (brightness shift, re-encode, minor crops) move
    * only a few bits, so near-duplicate images sit within a small
    * Hamming distance — the image twin of SimHash over text.
    */
  private def dHash64(im: java.awt.image.BufferedImage): Long = {
    val gw = 9; val gh = 8
    val lum = new Array[Int](gw * gh)
    var y = 0
    while (y < gh) {
      var x = 0
      while (x < gw) {
        val rgb = im.getRGB(x * im.getWidth / gw, y * im.getHeight / gh)
        lum(y * gw + x) = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var k = 0
    while (k < 64) {
      val row = k / 8; val colI = k % 8
      if (lum(row * gw + colI) > lum(row * gw + colI + 1)) bits |= (1L << k)
      k += 1
    }
    bits
  }

  /** FNV-1a fold of raw bytes — the deterministic signature for
    * payloads no codec accepts, so undecodable rows still dedup on
    * exact byte equality instead of nulling out.
    */
  private def fnv64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xFFL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Perceptual hash per media payload — same partition-local batched
    * kernel shape as `decodeFeatures` (zero shuffle, bounded batches).
    * Decodable images get the 64-bit dHash (`decoded=true`); payloads
    * no codec accepts get an exact byte-content FNV hash flagged
    * `decoded=false`, so they can still exact-dedup but never enter
    * Hamming near-dup pairing (a byte hash has no metric meaning).
    */
  def perceptualHash(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val enc = Encoders.row(phashSchema)
    df.select(col("doc_id"), col("media"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val bytes = r.getAs[Array[Byte]]("media")
            val safeBytes = if (bytes == null) Array.empty[Byte] else bytes
            val img =
              try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(safeBytes)))
              catch { case _: Exception => None }
            img match {
              case Some(im) => Row(r.getLong(0), true, dHash64(im))
              case None     => Row(r.getLong(0), false, fnv64(safeBytes))
            }
          }
        }
      }(enc)
  }

  /** Frame sampling for a (stub) video payload: every `stride`-th
    * chunk of `frameBytes` bytes becomes one "frame" row — the
    * explode-shaped op a video pipeline needs, expressed declaratively
    * so it stays in codegen (substring/sequence, no UDF).
    */
  def sampleFrames(df: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    val nFrames = greatest(floor(length(col("media")) / frameBytes), lit(1L))
    df.withColumn("frame_idx",
        explode(sequence(lit(0), (nFrames - 1).cast("int"), lit(stride))))
      .withColumn("frame",
        expr(s"substring(media, frame_idx * $frameBytes + 1, $frameBytes)"))
      .select(col("doc_id"), col("frame_idx"), col("frame"),
        length(col("frame")).as("frame_bytes"))
  }

  /** D100: scene-change detection over a sampled frame stream — the
    * boundary detector a video-curation pipeline needs before
    * per-scene dedup/captioning: consecutive frames' feature vectors
    * ([[decodeFeatures]]' kernel — real decode when a codec accepts
    * the bytes, deterministic byteFold otherwise) compare by
    * mean-absolute distance under ONE video-keyed ordered window;
    * `scene_change` flags distances above `threshold`. A video's first
    * frame has no predecessor: NULL distance, never flagged.
    *
    * Plumbing: frames ride through the batched decode kernel under a
    * composite id (video·10⁶ + frame) so the kernel stays unchanged —
    * bounded by the documented 10⁶-frames-per-video contract; the
    * distance is a 16-lane fold, evaluated once per row.
    */
  /** Sampled frames with their feature vectors — the shared front half
    * of [[sceneChanges]] and its streaming twin
    * ([[graft.streaming.EventStreams]] E24): (video_id, frame_idx,
    * features). Frames ride the batched decode kernel under a
    * composite video·10⁶+frame id so the kernel stays unchanged.
    */
  def frameFeatures(
      df: DataFrame,
      id: Column,
      media: Column,
      frameBytes: Int = 64,
      stride: Int = 4,
      dim: Int = 16): DataFrame = {
    val frames = sampleFrames(
      df.select(id.cast("long").as("doc_id"), media.as("media")),
      frameBytes, stride)
    val keyed = frames.select(
      (col("doc_id") * 1000000L + col("frame_idx")).as("doc_id"),
      col("frame").as("media"),
      struct(lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height")).as("meta"))
    decodeFeatures(keyed, dim)
      .select(expr("doc_id div 1000000").as("video_id"),
        pmod(col("doc_id"), lit(1000000L)).cast("int").as("frame_idx"),
        col("features"))
  }

  def sceneChanges(
      df: DataFrame,
      id: Column,
      media: Column,
      frameBytes: Int = 64,
      stride: Int = 4,
      dim: Int = 16,
      threshold: Double = 0.1): DataFrame = {
    val feats = frameFeatures(df, id, media, frameBytes, stride, dim)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("video_id").orderBy("frame_idx")
    // distance on 1/255-QUANTIZED lanes: each feature recovers its
    // integer lane via round(f·255) (byteFold lanes are integral
    // there up to float noise orders below .5; decoded-image lanes
    // quantize to the same 1/255 grid the pixels live on), the
    // |Δ|-sum is then an exact integer in double, and the one
    // division + 4-dp floor replays bit-for-bit in the stream twin
    // AND the SQL oracle — the repo's decimal-lane determinism
    // contract applied to a float-vector metric.
    val dist = aggregate(
      zip_with(col("features"), col("__prev"),
        (a, b) => abs(round(a.cast("double") * 255) - round(b.cast("double") * 255))),
      lit(0.0), (acc, x) => acc + x) / (dim * 255.0)
    feats.withColumn("__prev", lag(col("features"), 1).over(w))
      .withColumn("frame_dist",
        when(col("__prev").isNull, lit(null).cast("double"))
          .otherwise(floor(dist * 1e4) / 1e4))
      .select(col("video_id"), col("frame_idx"), col("frame_dist"),
        (col("frame_dist").isNotNull && col("frame_dist") > threshold)
          .as("scene_change"))
  }

  /** Minimal RIFF/WAVE PCM encoder (mono-or-interleaved 16-bit) — the
    * fixture/sink half of [[audioFeatures]]: deterministic bytes, no
    * codec dependency. `interleaved` holds channel-interleaved frames.
    */
  def wavPcm16(rate: Int, channels: Int, interleaved: Array[Short]): Array[Byte] = {
    require(rate > 0 && channels >= 1, "positive rate, >=1 channel")
    require(interleaved.length % channels == 0, "partial trailing frame")
    val dataLen = interleaved.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2).putShort((channels * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    interleaved.foreach(bb.putShort)
    bb.array()
  }

  /** Parse a RIFF/WAVE PCM payload into (sampleRate, channels, bits,
    * mono-mixed samples in [-1, 1]); None for anything that is not
    * uncompressed 8/16-bit PCM (the quarantine contract routes those
    * to `decoded = false`, never a task crash).
    */
  private def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Double])] = {
    def u8(i: Int) = bytes(i) & 0xFF
    def u16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def s16(i: Int) = u16(i).toShort.toInt
    def u32(i: Int) = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    if (bytes.length < 44) return None
    if (new String(bytes, 0, 4, "US-ASCII") != "RIFF" ||
        new String(bytes, 8, 4, "US-ASCII") != "WAVE") return None
    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None
    while (pos + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val size = u32(pos + 4)
      if (size < 0 || size > Int.MaxValue) return None
      val body = pos + 8
      if (id == "fmt " && body + 16 <= bytes.length) {
        if (u16(body) != 1) return None // PCM only
        fmt = Some((u16(body + 2), u32(body + 4).toInt, u16(body + 14)))
      } else if (id == "data") {
        data = Some((body, math.min(size.toInt, bytes.length - body)))
      }
      pos = body + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    (fmt, data) match {
      case (Some((ch, rate, bits)), Some((off, len)))
          if ch >= 1 && rate > 0 && (bits == 8 || bits == 16) =>
        val bytesPer = bits / 8
        val frames = len / (ch * bytesPer)
        val mono = new Array[Double](frames)
        var f = 0
        while (f < frames) {
          var acc = 0.0
          var c = 0
          while (c < ch) {
            val i = off + (f * ch + c) * bytesPer
            acc += (if (bits == 8) (u8(i) - 128) / 128.0 else s16(i) / 32768.0)
            c += 1
          }
          mono(f) = acc / ch
          f += 1
        }
        Some((rate, ch, bits, mono))
      case _ => None
    }
  }

  private val audioSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("decoded", BooleanType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits", IntegerType),
    StructField("n_frames", LongType),
    StructField("duration_us", LongType),
    StructField("rms", DoubleType),
    StructField("zero_cross_rate", DoubleType),
    StructField("peak", DoubleType)))

  /** 64-bit energy-envelope fingerprint — the audio analogue of the
    * image dHash: the mono-mixed stream splits into 65 equal windows,
    * each reduces to its RMS energy, and bit i records whether window
    * i+1 is louder than window i. Like dHash it keys on envelope
    * STRUCTURE (the rise/fall shape), so it survives uniform gain
    * changes and re-encoding amplitude wobble while distinct material
    * diverges — the cheap codec-free near-dup signature tier; content
    * fingerprinting with spectral landmarks is the heavier tier above
    * it. Payloads shorter than 65 frames or undecodable report
    * `decoded = false` (their envelope carries no structure to hash).
    *
    * Output: (doc_id, decoded, sig) — feed [[graft.operators.Dedup.hammingPairs]]
    * (8×8-bit chunks, radius ≤ 7) exactly like the image tier.
    */
  def audioFingerprint(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("decoded", BooleanType),
      StructField("sig", LongType)))
    val enc = Encoders.row(schema)
    df.select(col("doc_id"), col("media"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val bytes = r.getAs[Array[Byte]]("media")
            val safe = if (bytes == null) Array.empty[Byte] else bytes
            decodeWav(safe) match {
              case Some((_, _, _, mono)) if mono.length >= 65 =>
                val env = new Array[Double](65)
                var w = 0
                while (w < 65) {
                  val lo = (mono.length.toLong * w / 65).toInt
                  val hi = (mono.length.toLong * (w + 1) / 65).toInt
                  var sumSq = 0.0
                  var i = lo
                  while (i < hi) { sumSq += mono(i) * mono(i); i += 1 }
                  env(w) = if (hi > lo) math.sqrt(sumSq / (hi - lo)) else 0.0
                  w += 1
                }
                var sig = 0L
                var b = 0
                while (b < 64) {
                  if (env(b + 1) > env(b)) sig |= (1L << b)
                  b += 1
                }
                Row(r.getLong(0), true, sig)
              case _ => Row(r.getLong(0), false, 0L)
            }
          }
        }
      }(enc)
  }

  /** REAL audio decode + feature extraction — the audio sibling of
    * [[decodeFeatures]], and deliberately codec-free: RIFF/WAVE PCM
    * parses in pure JVM integer math (no native audio libs exist in
    * the runtime, and none are needed for the dominant archival
    * format), so the kernel is bit-deterministic across executors.
    * Per payload: header metadata plus the row-local summary features
    * curation filters on — RMS energy, zero-crossing rate (the
    * silence/noise discriminator), and peak amplitude — over the
    * mono-mixed stream. Non-WAV / compressed payloads report
    * `decoded = false` with zeros (flag, never crash).
    *
    * Same batched `mapPartitions` shape as the image kernel: bounded
    * memory, zero shuffle; duration uses integer µs arithmetic
    * (frames · 1e6 / rate) so it replays exactly.
    */
  def audioFeatures(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val enc = Encoders.row(audioSchema)
    df.select(col("doc_id"), col("media"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val bytes = r.getAs[Array[Byte]]("media")
            val safe = if (bytes == null) Array.empty[Byte] else bytes
            decodeWav(safe) match {
              case Some((rate, ch, bits, mono)) =>
                val n = mono.length
                var sumSq = 0.0
                var peak = 0.0
                var crossings = 0L
                var i = 0
                while (i < n) {
                  val x = mono(i)
                  sumSq += x * x
                  if (math.abs(x) > peak) peak = math.abs(x)
                  if (i > 0 && ((x >= 0) != (mono(i - 1) >= 0))) crossings += 1
                  i += 1
                }
                val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
                val zcr = if (n <= 1) 0.0 else crossings.toDouble / (n - 1)
                Row(r.getLong(0), true, rate, ch, bits, n.toLong,
                  n.toLong * 1000000L / rate, rms, zcr, peak)
              case None =>
                Row(r.getLong(0), false, 0, 0, 0, 0L, 0L, 0.0, 0.0, 0.0)
            }
          }
        }
      }(enc)
  }
}
