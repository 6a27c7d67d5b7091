package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank on a star graph: replayed truncation arithmetic, leaves at the teleport floor") {
    // 2,3,4 all point at 1; nothing points back. N=4, d=0.85.
    // The expected values replay the operator's own determinism
    // contract in plain Scala doubles: 7-dp truncation at each step.
    def t7(x: Double): Double = math.floor(x * 1e7) / 1e7
    val leaf = t7((1.0 - 0.85) / 4 + 0.85 * 0.0) // stable from iter 1 on
    val hub = t7((1.0 - 0.85) / 4 + 0.85 * (3 * t7(leaf / 1)))
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L)).toDF("s", "d")
    val r = GraphOps.pageRank(edges, col("s"), col("d"), iterations = 3)
      .as[(Long, Double)].collect().toMap
    assert(r(2L) == leaf && r(3L) == leaf && r(4L) == leaf, r.toString)
    assert(r(1L) == hub, s"got ${r(1L)}, want $hub")
    assert(r(1L) > r(2L), "hub must outrank leaves")
  }

  test("pageRank on a cycle is uniform at 1/N") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val r = GraphOps.pageRank(edges, col("s"), col("d"), iterations = 5)
      .as[(Long, Double)].collect().toMap
    // cycle is mass-preserving: every node keeps (truncated) 1/3
    val third = math.floor(1.0 / 3 * 1e7) / 1e7
    assert(r.values.forall(v => math.abs(v - third) < 2e-7), r.toString)
  }
}
