package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each query is `(SparkSession, sfDir) => DataFrame`; the driver writes
  * the result to parquet and hash-compares it against `oracleSql` run by
  * DuckDB over the same parquet tables (sf0.01), and times `.count()`
  * over all of them at sf0.1 for the bench.
  */
object SparkEntry {

  /** Flagship: the reference's full core path — synthesize Debezium
    * envelopes from `orders`, parse, LWW-dedup, project to silver
    * (`/root/reference/jobs/build_orders_silver.py:24-95`). */
  def entry(spark: SparkSession): DataFrame =
    PipelineQueries.queries("q_cdc_silver_rebuild")(
      spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    PipelineQueries.queries ++
      RelationalQueries.queries ++
      ExtQueries.queries

  /** DuckDB-runnable ANSI SQL twin for each query. */
  def oracleSql: Map[String, String] =
    PipelineQueries.oracles ++
      RelationalQueries.oracles ++
      ExtQueries.oracles
}
