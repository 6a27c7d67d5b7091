package graft

/** Scratch probe for local dev (kept out of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("probe")
    val ev = sources.Tables.events(spark, "/root/testdata/sf0.001")
    ev.printSchema()
    ev.show(3, truncate = false)
    spark.stop()
  }
}
