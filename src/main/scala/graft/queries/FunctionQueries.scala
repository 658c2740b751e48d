package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CoreOps._
import graft.sources.Tables

/** Scalar-function surface coverage: pivot, string functions,
  * date/time extraction — the "every function a reference user needs"
  * breadth layer, each bit-matched against DuckDB.
  */
object FunctionQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // pivot: per-user event-type counts as columns (typed pivot with
    // an explicit value list — required at scale; an unlisted pivot
    // needs an extra distinct pass over the data).
    "q_pivot" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)),

    // array-function surface: set algebra over each doc's token halves
    // (intersect/union/distinct are the building blocks every overlap
    // metric reduces to). Sizes only — element ORDER of set results is
    // engine-specific, cardinality is not.
    "q_array_funcs" -> ((s, dir) => {
      val toks = split(trim(col("text")), "\\s+")
      val n = size(toks)
      val half = floor(n.cast("double") / 2).cast("int")
      val a = slice(toks, lit(1), half)
      val b = slice(toks, half + 1, n - half)
      Tables.documents(s, dir).mapRecords(
        col("doc_id"),
        n.cast("bigint").as("n_tokens"),
        size(array_distinct(toks)).cast("bigint").as("n_distinct"),
        size(array_intersect(a, b)).cast("bigint").as("n_common"),
        size(array_union(a, b)).cast("bigint").as("n_union"))
    }),

    // scalar string functions (codegen'd built-ins, no UDFs).
    "q_string_funcs" -> ((s, dir) =>
      Tables.part(s, dir).mapRecords(
        col("p_partkey"),
        upper(col("p_brand")).as("u"),
        lower(col("p_name")).as("l"),
        lpad(col("p_brand"), 12, "*").as("padded"),
        translate(col("p_type"), " ", "_").as("t"),
        substring(col("p_name"), 1, 5).as("pfx"),
        length(col("p_name")).cast("bigint").as("len"),
        reverse(col("p_brand")).as("rev"),
        concat_ws("|", col("p_brand"), col("p_type")).as("joined"),
        coalesce(nullif(col("p_brand"), lit("Brand#1")), lit("DEFAULT")).as("nn")
      )),

    // date/time part extraction (UTC session; dow normalized to the
    // 0=Sunday convention shared with DuckDB).
    "q_date_parts" -> ((s, dir) =>
      Tables.orders(s, dir).mapRecords(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("bigint").as("y"),
        month(col("o_orderdate")).cast("bigint").as("m"),
        dayofmonth(col("o_orderdate")).cast("bigint").as("d"),
        quarter(col("o_orderdate")).cast("bigint").as("q"),
        (dayofweek(col("o_orderdate")) - 1).cast("bigint").as("dow"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym")
      ))
  )

  val oracleSql: Map[String, String] = Map(
    "q_pivot" ->
      """SELECT user_id,
        |       count(*) FILTER (event_type = 'click') AS click,
        |       count(*) FILTER (event_type = 'view') AS view,
        |       count(*) FILTER (event_type = 'purchase') AS purchase,
        |       count(*) FILTER (event_type = 'signup') AS signup,
        |       count(*) FILTER (event_type = 'error') AS error
        |FROM events GROUP BY user_id""".stripMargin,
    "q_array_funcs" ->
      raw"""WITH t AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
           |  FROM documents),
           |h AS (
           |  SELECT doc_id, toks,
           |         toks[1:len(toks)//2] AS a,
           |         toks[len(toks)//2+1:len(toks)] AS b
           |  FROM t)
           |SELECT doc_id,
           |       CAST(len(toks) AS BIGINT) AS n_tokens,
           |       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           |       CAST(len(list_intersect(a, b)) AS BIGINT) AS n_common,
           |       CAST(len(list_distinct(a || b)) AS BIGINT) AS n_union
           |FROM h""".stripMargin,
    "q_string_funcs" ->
      """SELECT p_partkey,
        |       upper(p_brand) AS u,
        |       lower(p_name) AS l,
        |       lpad(p_brand, 12, '*') AS padded,
        |       translate(p_type, ' ', '_') AS t,
        |       substr(p_name, 1, 5) AS pfx,
        |       CAST(length(p_name) AS BIGINT) AS len,
        |       reverse(p_brand) AS rev,
        |       concat_ws('|', p_brand, p_type) AS joined,
        |       coalesce(nullif(p_brand, 'Brand#1'), 'DEFAULT') AS nn
        |FROM part""".stripMargin,
    "q_date_parts" ->
      """SELECT o_orderkey,
        |       CAST(year(o_orderdate) AS BIGINT) AS y,
        |       CAST(month(o_orderdate) AS BIGINT) AS m,
        |       CAST(dayofmonth(o_orderdate) AS BIGINT) AS d,
        |       CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |       CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
        |       strftime(o_orderdate, '%Y-%m') AS ym
        |FROM orders""".stripMargin
  )
}
