package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing — SURVEY §2.D12.
  *
  * Media payloads are opaque `binary` columns plus a typed metadata
  * struct; transforms (decode → feature-extract → thumbnail) run as
  * partition-local batch kernels over the binary bytes — the Spark-side
  * shape (schema, batching, partition locality, no shuffle) is real and
  * tested, while the codec itself is a clearly marked deterministic
  * STUB where libjpeg/ffmpeg would sit in production (those libraries
  * are not in this container).
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
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /** STUB decode kernel: a real implementation hands `bytes` to an
    * image codec and returns pixel data. This deterministic fake folds
    * the bytes into `dim` accumulators so specs can assert exact
    * values end-to-end. Marked clearly as the production seam.
    */
  private def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    // PRODUCTION SEAM: replace with codec call (e.g. javax.imageio /
    // ffmpeg via JNI). Everything around this function — schema,
    // batching, partition locality — is the real pipeline.
    val acc = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      acc(i % dim) += (bytes(i) & 0xFF) / 255.0f
      i += 1
    }
    acc
  }

  /** Decode + feature-extract each media payload, `batchSize` rows at a
    * time within each partition (the JVM analogue of `mapInPandas`
    * batch shape: bounded memory, vectorizable kernel, zero shuffle).
    * Input needs columns (doc_id, media, meta); output is
    * (doc_id, width, height, features[dim]).
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
            Row(r.getLong(0), r.getInt(2), r.getInt(3), decodeStub(bytes, dim).toSeq)
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
}
