package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) / §7 (plan).
  *
  * Every implemented operator gets a `queries` entry (Spark side) and,
  * where ANSI-SQL-expressible, an `oracleSql` entry (DuckDB side) with
  * identical column names. Aggregates avoid order-dependent double
  * sums (integral cents / bigint; fixed-operand double divisions) so
  * results are bit-stable across engines and shuffle orders.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. q_pipeline is the end-to-end training-data prep chain:
    * quality-filter → exact-dedup → per-source corpus stats. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_pipeline")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ AnalyticQueries.queries ++ TextQueries.queries ++
      DedupQueries.queries ++ MultimodalQueries.queries ++ ExtraQueries.queries ++
      FunctionQueries.queries ++ SketchQueries.queries ++ PipelineQueries.queries ++
      BpeQueries.queries

  /** DuckDB-equivalent SQL per query key; identical output column names. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ AnalyticQueries.oracleSql ++ TextQueries.oracleSql ++
      DedupQueries.oracleSql ++ MultimodalQueries.oracleSql ++ ExtraQueries.oracleSql ++
      FunctionQueries.oracleSql ++ SketchQueries.oracleSql ++ PipelineQueries.oracleSql ++
      BpeQueries.oracleSql
}
