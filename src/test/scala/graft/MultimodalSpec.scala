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
    assert(out.schema.fieldNames.toSeq == Seq("doc_id", "width", "height", "features"))
    val rows = out.collect()
    assert(rows.length == 50)
    assert(rows.forall(_.getAs[scala.collection.Seq[Float]]("features").length == 16))
    // deterministic: same input → same features
    val again = Multimodal.decodeFeatures(packed, dim = 16, batchSize = 8).collect()
    assert(rows.map(_.getAs[scala.collection.Seq[Float]]("features").toList).toSeq ==
      again.map(_.getAs[scala.collection.Seq[Float]]("features").toList).toSeq)
    // no shuffle in the plan: decode must stay embarrassingly parallel
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode plan shuffles:\n$plan")
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
