package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{GraphQueries, PipelineQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every `queries` entry with an `oracleSql` entry is hash-compared by the
  * driver against DuckDB on the same parquet tables (sf0.01).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * top-10 PageRank entities of the events-derived link graph. */
  def entry(spark: SparkSession): DataFrame =
    GraphQueries.queries("g_top_pagerank")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    GraphQueries.queries ++ RelationalQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    GraphQueries.oracles ++ RelationalQueries.oracles ++ PipelineQueries.oracles
}
