package graft

/** Scratch (not registered): r14 edge harness — every NEW operator
  * through the degenerate shapes unit specs miss (empty input,
  * singleton, one-group key, all-equal values, short series).
  * Pass = no throw and a sane row count printed.
  */
object ScratchDebug {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = Engine.session("scratch-edge-r14")
    import spark.implicits._
    import graft.operators.{Behavior, Dedup, Stats}

    def runCase(name: String)(body: => Long): Unit =
      try println(f"$name%-46s rows=${body}")
      catch { case e: Throwable =>
        println(s"$name THREW: ${e.getClass.getSimpleName}: ${e.getMessage}")
        throw e
      }

    val empty = Seq.empty[(String, Long, Double)].toDF("g", "b", "v")
    val single = Seq(("g", 1L, 5.0)).toDF("g", "b", "v")
    val flat = (0 until 5).map(i => ("g", i.toLong, 7.0)).toDF("g", "b", "v")
    val short3 = (0 until 3).map(i => ("g", i.toLong, i.toDouble)).toDF("g", "b", "v")

    for ((nm, df) <- Seq(("empty", empty), ("single", single),
        ("flat", flat), ("short3", short3))) {
      runCase(s"ljungBox $nm")(
        Stats.ljungBox(df, col("g"), col("b"), col("v"), maxLag = 3).count())
      runCase(s"kpss $nm")(
        Stats.kpss(df, col("g"), col("b"), col("v")).count())
      runCase(s"durbinWatson $nm")(
        Stats.durbinWatson(df, col("g"), col("b"), col("v")).count())
      runCase(s"cooksDistance $nm")(
        Stats.cooksDistance(df, col("g"), col("b"), col("v")).count())
      runCase(s"grubbs $nm")(
        Stats.grubbs(df, col("g"), col("v")).count())
      runCase(s"bartlett $nm")(
        Stats.bartlett(df, col("g"), col("v")).count())
      runCase(s"forecastability $nm")(
        Stats.forecastability(df, col("g"), col("b"), col("v"), period = 4).count())
      runCase(s"rfm $nm")(
        Behavior.rfm(df.select(col("b").as("user_id"),
          (col("b") * 1000L).as("ts_ns"), col("v").as("value")),
          col("user_id"), col("ts_ns"), col("value")).count())
    }

    val emptyDocs = Seq.empty[(Long, String)].toDF("id", "text")
    val oneDoc = Seq((1L, "just one document here")).toDF("id", "text")
    val emptyText = Seq((1L, ""), (2L, "   ")).toDF("id", "text")
    val emptyPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val onePair = Seq((1L, 2L)).toDF("id_a", "id_b")
    for ((nm, docs) <- Seq(("emptyDocs", emptyDocs), ("oneDoc", oneDoc),
        ("emptyText", emptyText))) {
      runCase(s"duplicatedNgramCoverage $nm")(
        Dedup.duplicatedNgramCoverage(docs, col("id"), col("text"), 3, 2, 0.5).count())
      runCase(s"weightedJaccardVerify $nm emptyPairs")(
        Dedup.weightedJaccardVerify(docs, col("id"), col("text"), emptyPairs).count())
      runCase(s"weightedJaccardVerify $nm onePair")(
        Dedup.weightedJaccardVerify(docs, col("id"), col("text"), onePair).count())
      runCase(s"duplicationWeights $nm")(
        Dedup.duplicationWeights(docs, col("id"), emptyPairs).count())
    }
    // kruskal's new exact lanes on degenerate shapes
    runCase("kruskalWallis empty")(
      Stats.kruskalWallis(empty, col("g"), col("v")).count())
    runCase("kruskalWallis single")(
      Stats.kruskalWallis(single, col("g"), col("v")).count())
    runCase("kruskalWallis all-tied")(
      Stats.kruskalWallis(flat, col("g"), col("v")).count())
    println("[edge-r14] ALL PASS")
    spark.stop()
  }
}
