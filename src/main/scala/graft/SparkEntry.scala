package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are grouped by domain under graft.queries; each map entry has a
  * DuckDB oracle in `oracleSql` unless the operator is not SQL-expressible
  * (those get rows-only checks + ScalaTest golden specs). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * sum by (event_type) of rate(value[6h]) over the events stream — the
    * engine's signature sum(rate(...)) shape. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    PromQueries.defs("q27_sum_rate_6h")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.defs ++ PromQueries.defs ++ PromEngineQueries.defs ++
      HistQueries.defs ++ PipelineQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ PromQueries.oracles ++ PromEngineQueries.oracles ++
      HistQueries.oracles ++ PipelineQueries.oracles
}
