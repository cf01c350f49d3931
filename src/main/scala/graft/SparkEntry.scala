package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are grouped by capability area; each module exposes a
  * `queries` map (Spark plans) and an `oracle` map (DuckDB-dialect
  * ANSI SQL over the same parquet tables). Keys must be globally
  * unique; result column names must match the oracle exactly.
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (RelationalQueries.queries, RelationalQueries.oracle),
      (EventLogQueries.queries, EventLogQueries.oracle),
      (TextQueries.queries, TextQueries.oracle),
      (DedupQueries.queries, DedupQueries.oracle),
      (SimQueries.queries, SimQueries.oracle),
      (XesQueries.queries, XesQueries.oracle),
      (MinerQueries.queries, MinerQueries.oracle)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_dfg_edges")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_._2).toMap
}
