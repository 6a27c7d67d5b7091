package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** Graph-analytics queries (SURVEY §2.D30): link-graph ranking for
  * crawl curation. The oracle unrolls the SAME fixed iteration count
  * in SQL; the determinism contract (7 dp per-edge contributions,
  * exact decimal sums, 7 dp ranks, all arithmetic in DOUBLE) makes the
  * replay bit-identical.
  */
object GraphQueries {

  /** One PageRank round in DuckDB, reading CTE `prev` → producing
    * `cur`. Constants are cast to DOUBLE FIRST so DuckDB's exact
    * decimal literals don't diverge from Spark's IEEE arithmetic, and
    * 7-dp values are TRUNCATED (floor(x*1e7)/1e7) — floor of the
    * shared double is repr-independent where round-half-up is not
    * (see GraphOps.pageRank).
    */
  private def prIter(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT nodes.v,
       |    floor(((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n.cnt +
       |      CAST(0.85 AS DOUBLE) * coalesce(CAST(s.m AS DOUBLE), 0.0)) * 1e7) / 1e7 AS r
       |  FROM nodes CROSS JOIN n
       |  LEFT JOIN (
       |    SELECT e.dst AS v,
       |      sum(CAST(floor($prev.r / outd.deg * 1e7) / 1e7 AS DECIMAL(28,7))) AS m
       |    FROM e JOIN $prev ON e.src = $prev.v JOIN outd ON e.src = outd.src
       |    GROUP BY 1) s ON s.v = nodes.v)""".stripMargin

  val all: Seq[Q] = Seq(

    // D30: PageRank over a 500-node link graph derived from lineitem,
    // 3 fixed iterations, oracle-replayed exactly.
    Q(
      "q_pagerank",
      s"""WITH e AS (
         |  SELECT DISTINCT l_orderkey % 500 AS src, l_partkey % 500 AS dst
         |  FROM lineitem WHERE l_orderkey % 500 <> l_partkey % 500),
         |nodes AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
         |n AS (SELECT count(*) AS cnt FROM nodes),
         |outd AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
         |r0 AS (
         |  SELECT v, floor(CAST(1.0 AS DOUBLE) / cnt * 1e7) / 1e7 AS r
         |  FROM nodes CROSS JOIN n),
         |${prIter("r0", "it1")},
         |${prIter("it1", "it2")},
         |${prIter("it2", "it3")}
         |SELECT v AS node, r AS pr FROM it3 ORDER BY node""".stripMargin
    ) { (s, dir) =>
      val li = table(s, dir, "lineitem")
      val edges = li.select(
          (col("l_orderkey") % 500).as("src"),
          (col("l_partkey") % 500).as("dst"))
        .filter(col("src") =!= col("dst"))
      GraphOps.pageRank(edges, col("src"), col("dst"),
          iterations = 3, damping = 0.85)
        .select(col("node"), col("rank").as("pr"))
        .orderBy("node")
    }
  )
}
