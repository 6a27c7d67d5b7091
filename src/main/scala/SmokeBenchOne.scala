import graft._
object SmokeBenchOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args
    val spark = Engine.session("smoke-bench")
    // warm
    SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.write.mode("overwrite").format("noop").save()
    println(f"TIME=${(System.nanoTime() - t0) / 1e9}%.2f ROWS=${df.count()}")
    spark.stop()
  }
}
