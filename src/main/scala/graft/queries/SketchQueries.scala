package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CoreOps._
import graft.sketch.Sketches
import graft.sources.Tables

/** SURVEY.md §2.8 — sketch-aggregator queries.
  *
  * Sketches are approximate, so straight hash-matching against exact
  * SQL is impossible. Two oracle patterns make them gate-able anyway:
  *
  *  - tolerance flag: the Spark side computes BOTH the sketch estimate
  *    and the exact answer and emits `estimate within ε of exact` as a
  *    boolean next to the exact value; the oracle emits the exact
  *    value and literal `true`. A sketch drifting out of its error
  *    bound hash-mismatches.
  *  - sketch-guided exact: heavy hitters run Misra-Gries only to find
  *    candidates, then recount exactly — the RESULT is exact, so the
  *    oracle is a plain GROUP BY/HAVING.
  */
object SketchQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.8/39 HLL distinct counts: exact_n (hash-matched) + in-bound flag.
    "q_hll_distinct" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_orderkey")).cast("bigint").as("exact_n"),
          Sketches.hll(xxhash64(col("l_orderkey"))).as("__est"))
        .select(col("l_returnflag"), col("exact_n"),
          (abs(col("__est") - col("exact_n")) <= col("exact_n") * 0.05).as("hll_ok"))),

    // §2.8/40 exact heavy hitters via MG candidates + exact recount:
    // users holding ≥ 0.8% of all events (integral threshold math).
    "q_heavy_hitters" -> ((s, dir) =>
      Sketches.heavyHitters(Tables.events(s, dir), col("user_id"), shareNum = 8, shareDen = 1000)
        .select(col("key").as("user_id"), col("cnt"))),

    // §2.8/39b Count-Min-guided exact frequency gate: users with ≥ 60
    // events. The sketch (one-sided estimates) prunes candidates; the
    // exact recount makes the result oracle-identical to GROUP BY /
    // HAVING regardless of sketch collisions.
    "q_cms_gate" -> ((s, dir) =>
      Sketches.cmsFrequencyGate(Tables.events(s, dir), col("user_id"), minCount = 60)
        .select(col("key").as("user_id"), col("cnt"))),

    // §2.8/46 bloom-pruned exact semi join: orders of customers in a
    // selective segment — the sketch prunes the probe side before the
    // exact join; result identical to a plain semi join.
    "q_bloom_join" -> ((s, dir) => {
      val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      graft.sketch.BloomFilter
        .bloomSemiJoin(Tables.orders(s, dir), col("o_custkey"), cust, col("c_custkey"))
        .mapRecords(col("o_orderkey"), col("o_custkey"))
    }),

    // §2.8/41 t-digest quantiles: group count (hash-matched) + rank-
    // tolerance flags — estimate must land between the exact
    // percentiles at q ± 0.01 (computed with Spark's exact percentile).
    "q_tdigest_quantiles" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .withColumn("cents", round(col("l_extendedprice") * 100).cast("bigint"))
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          Sketches.tdigest(col("cents")).as("__d"),
          expr("percentile(cents, array(0.49, 0.51, 0.94, 0.96))").as("__b"))
        .select(col("l_returnflag"), col("n"),
          Sketches.tdigestQuantile(col("__d"), 0.50)
            .between(element_at(col("__b"), 1), element_at(col("__b"), 2)).as("p50_ok"),
          Sketches.tdigestQuantile(col("__d"), 0.95)
            .between(element_at(col("__b"), 3), element_at(col("__b"), 4)).as("p95_ok")))
  )

  val oracleSql: Map[String, String] = Map(
    "q_hll_distinct" ->
      """SELECT l_returnflag,
        |       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_n,
        |       true AS hll_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_heavy_hitters" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM events
        |GROUP BY user_id
        |HAVING COUNT(*) * 1000 >= 8 * (SELECT COUNT(*) FROM events)""".stripMargin,
    "q_cms_gate" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM events
        |GROUP BY user_id
        |HAVING COUNT(*) >= 60""".stripMargin,
    "q_bloom_join" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')""".stripMargin,
    "q_tdigest_quantiles" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |       true AS p50_ok, true AS p95_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin
  )
}
