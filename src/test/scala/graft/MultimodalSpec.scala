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
}
