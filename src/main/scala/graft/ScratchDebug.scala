package graft

/** Scratch (not registered): ad-hoc divergence debugging. */
object ScratchDebug {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = Engine.session("scratch-debug")
    import graft.functions.tokens
    val d0 = spark.read.parquet("/tmp/graft_sf1/documents.parquet")
      .filter(col("lang").isNotNull)
      .select(col("lang").as("__g0"),
        least(lit(1.0), size(tokens(col("text"))) / lit(400.0)).as("__v0"))
    val t = d0.select(col("__g0").cast("string").as("__g"),
      round(col("__v0").cast("double"), 6).as("__v"))
    val vg = t.groupBy("__v", "__g").agg(count(lit(1)).as("__nvg"))
    val vt = vg.groupBy("__v").agg(sum(col("__nvg")).as("__t"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__v")).rowsBetween(Long.MinValue, -1)
    def b13(c: org.apache.spark.sql.Column) = c.cast("decimal(13,0)")
    def b19(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    val vtc = vt
      .withColumn("__cum", coalesce(sum(col("__t")).over(w), lit(0L)))
      .withColumn("__tc",
        (b13(col("__t")) * b13(col("__t")) * b13(col("__t")) - col("__t"))
          .cast("decimal(38,0)"))
    val perG = vg.join(vtc, "__v")
      .groupBy("__g").agg(
        sum(col("__nvg")).as("__n"),
        sum((b19(col("__nvg")) * (b19(col("__cum")) * 2 + col("__t") + 1))
          .cast("decimal(38,0)")).as("__r2"))
    val term7 = (floor(col("__r2").cast("double") * col("__r2").cast("double")
      / (col("__n").cast("double") * 4.0) * 1e7) / 1e7).cast("decimal(30,7)")
    perG.select(col("__g"), col("__n"), col("__r2"), term7.as("t7")).show(false)
    val m = perG.agg(
      coalesce(sum(col("__n")), lit(0L)).as("__nn"),
      count(lit(1)).as("__k"),
      sum(term7).as("__s"))
    m.show(false)
    spark.stop()
  }
}
