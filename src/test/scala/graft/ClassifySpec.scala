package graft

import org.apache.spark.sql.functions._

import graft.operators.{Classify, TextMetrics}

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  // planted separable corpus: class markers + shared filler
  private def corpus() = Seq(
    (1, 1, "the quick brown fox superb superb quality prose"),
    (2, 1, "a plain sentence with superb writing and clear flow"),
    (3, 1, "superb superb clear report about rivers and rain"),
    (4, 1, "clear superb notes on the weather and the tides"),
    (5, 0, "the quick brown fox garbled garbled spam noise"),
    (6, 0, "a plain sentence with garbled junk and spam flow"),
    (7, 0, "garbled spam spam report about rivers and rain"),
    (8, 0, "spam garbled notes on the weather and the tides")
  ).toDF("id", "y", "text")

  test("trainLogistic learns planted marker signs and separates the corpus") {
    val model = Classify.trainLogistic(
      corpus(), col("id"), col("text"), col("y"), iters = 30, learningRate = 2.0)
    val w = Classify.termWeights(model).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(w("superb") > 0.1)
    assert(w("clear") > 0.0)
    assert(w("garbled") < -0.1)
    assert(w("spam") < 0.0)
    // neutral filler stays near zero, well inside the marker margin
    assert(math.abs(w("the")) < w("superb") / 2)
    // closing the loop: the apply side separates perfectly on the
    // training corpus using the trained table + extracted bias
    val scored = TextMetrics.linearTextScore(
        corpus(), col("id"), col("text"),
        Classify.termWeights(model), col("term"), col("weight"),
        bias = Classify.biasOf(model))
      .join(corpus().select(col("id"), col("y")), "id")
      .select(col("y"), col("positive")).collect()
    assert(scored.forall(r => (r.getInt(0) == 1) == r.getBoolean(1)))
  }

  test("training is deterministic: two runs produce identical weights") {
    def run() = Classify.trainLogistic(
        corpus(), col("id"), col("text"), col("y"), iters = 5, learningRate = 1.0)
      .orderBy("term").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(run() == run())
  }

  test("decay shrinks weights toward zero; zero-token docs are excluded") {
    val df = corpus().unionByName(Seq((9, 1, "!!! ???")).toDF("id", "y", "text"))
    val plain = Classify.trainLogistic(
      df, col("id"), col("text"), col("y"), iters = 10, learningRate = 1.0)
    val shrunk = Classify.trainLogistic(
      df, col("id"), col("text"), col("y"), iters = 10, learningRate = 1.0,
      decay = 0.8)
    val wp = Classify.termWeights(plain).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ws = Classify.termWeights(shrunk).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(ws("superb")) < math.abs(wp("superb")))
    assert(math.abs(ws("garbled")) < math.abs(wp("garbled")))
    // doc 9 tokenizes to nothing: same vocabulary as without it, and
    // the bias row reflects 8 trainable docs (balanced -> near zero)
    assert(!wp.contains(""))
    assert(math.abs(Classify.biasOf(plain)) < 0.2)
  }
}
