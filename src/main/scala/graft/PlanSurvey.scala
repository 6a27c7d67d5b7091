package graft

import java.nio.file.{Files, Paths}

/** Scratch (not registered): full-registry plan-shape survey — one
  * JSON line per declared query with the operator counts the
  * optimization guide says to look at (§7.2): Exchange count, join
  * strategies, window nodes (and whether any carries an unbounded
  * following frame), WindowGroupLimit rewrites, scan pushdown
  * markers, and any non-codegen red flags (BatchEvalPython never
  * appears — no UDFs). No codegen field: under AQE the pre-execution
  * plan carries no `[codegen id]` annotations, so counting them here
  * would always read zero; the codegen contract is enforced instead
  * by PlanSpec over executed plans.
  *
  * Plans are the ANALYZED physical plans pre-execution (AQE initial),
  * the same text committed to plans/rN.
  *
  * Usage: runMain graft.PlanSurvey <sfDir> <outFile>
  */
object PlanSurvey {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outFile) = args
    val spark = Engine.session("graft-plansurvey")
    val sb = new StringBuilder
    def count(s: String, token: String): Int =
      s.sliding(token.length).count(_ == token)
    SparkEntry.registry.map(_.name).sorted.foreach { name =>
      val line =
        try {
          val df = SparkEntry.queries(name)(spark, sfDir)
          val p = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          // FormattedMode prints most operators as `Name (id)` in the
          // tree — match on `Name (`. Joins carry the join type between
          // name and id (`BroadcastHashJoin Inner BuildRight (4)`), so
          // count their detail headers `(4) BroadcastHashJoin` instead
          // (exactly one per node). Shuffle exchanges = `Exchange (`
          // minus the broadcast ones, which also end in "Exchange (".
          val joins = Seq("BroadcastHashJoin", "SortMergeJoin",
            "ShuffledHashJoin", "BroadcastNestedLoopJoin")
            .map(j => s""""$j": ${count(p, s") $j")}""").mkString(", ")
          s"""{"query": "$name", "shuffle_exchanges": ${count(p, "Exchange (") - count(p, "BroadcastExchange (")}, """ +
            s""""broadcast_exchanges": ${count(p, "BroadcastExchange (")}, """ +
            s""""windows": ${count(p, "Window (")}, """ +
            s""""window_group_limits": ${count(p, "WindowGroupLimit (")}, """ +
            s""""unbounded_following": ${count(p, "unboundedfollowing")}, """ +
            s""""pushed_filters": ${count(p, "PushedFilters: [") - count(p, "PushedFilters: []")}, """ +
            s"""$joins, "python_eval": ${count(p, "BatchEvalPython")}}"""
        } catch {
          case e: Throwable =>
            s"""{"query": "$name", "error": "${e.getClass.getSimpleName}"}"""
        }
      sb.append(line).append('\n')
      println(s"[plansurvey] $name")
    }
    Files.writeString(Paths.get(outFile), sb.toString)
    spark.stop()
  }
}
