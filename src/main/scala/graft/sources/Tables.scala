package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loader / writer over a scale-factor directory of parquet files.
  *
  * Mirrors the reference's multi-source ingest (tratamento_epe.R:55-72
  * reads every workbook sheet into a named list); here each table is a
  * parquet directory and the "list" is name → DataFrame.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** CSV with an explicit schema (schema inference would double-scan —
    * never at 100 TB) or header-only when the caller accepts strings.
    */
  def loadCsv(
      spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schema.fold(r)(s => r.schema(s)).csv(path)
  }

  def loadJson(
      spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** All tables of a scale-factor dir, name → DataFrame. */
  def loadAll(spark: SparkSession, dir: String): Map[String, DataFrame] =
    names.map(n => n -> load(spark, dir, n)).toMap

  /** events with the ns-precision timestamp normalized to a µs
    * TimestampType column `ts` plus exact `ts_ns` (epoch nanos, long).
    * Parquet stores TIMESTAMP(NANOS) which Spark reads as long when
    * `spark.sql.legacy.parquet.nanosAsLong` is set.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // `div` (integer division), NOT `/`: epoch-nanos exceed a
        // double's 53-bit mantissa, so `/ 1000` would round the
        // microsecond off by ±1 for most rows.
        raw
          .withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ => raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
    }
  }

  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Bucketed catalog table: co-locates rows by `bucketCols` so equi-
    * joins and aggregations on those keys read both sides pre-shuffled
    * — at 100 TB the difference between a full-corpus exchange per join
    * and none. Both join sides must use the same bucket count.
    */
  def writeBucketed(
      df: DataFrame, tableName: String,
      bucketCols: Seq[String], numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)
}
