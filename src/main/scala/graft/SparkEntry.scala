package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All query groups, in SURVEY §2 order. */
  def registry: Seq[Q] =
    RelationalQueries.all ++ WranglingQueries.all ++ TemporalQueries.all ++
      TextQueries.all ++ DedupQueries.all ++ MultimodalQueries.all ++
      CurationQueries.all ++ ProfileQueries.all ++ MergeQueries.all ++
      MergeQueries.snapshotQueries ++
      GraphQueries.all ++ ChatQueries.all ++ PreferenceQueries.all ++
      EvalQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_epe_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.spark).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver records a weaker rows-only check there).
    */
  def oracleSql: Map[String, String] =
    registry.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
