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

    // §2.8/40c priority sampling: exactly PrioK docs, heavy (long)
    // ones more likely, with Horvitz–Thompson weight estimates —
    // fixed-SIZE weighted sampling (the Bernoulli gate's complement),
    // integer-scaled priorities so both engines rank identically.
    "q_priority_sample" -> ((s, dir) =>
      graft.sketch.Sketches.prioritySample(
        Tables.documents(s, dir), col("doc_id"), col("n_chars"),
        k = PrepParams.PrioK)),

    // §2.8/46b Bloom-ledger novelty screen: the corpus history
    // (doc_id ≢ 0 mod 3) contributes per-drop Bloom registers,
    // merged by bit-OR; the incoming batch keeps only rows whose
    // content fingerprint is NOT in history — Bloom-certain novels
    // skip the join, candidates get the exact anti-join confirm, so
    // the RESULT is exact (the oracle replays the plain anti-join;
    // the registers shape the plan, never the answer).
    "q_bloom_novel" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val history = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      // two drops of history, summarized independently then merged —
      // exercising OR-mergeability on the gate path
      val ledger = graft.sketch.BloomLedger
        .dropSummary(history.filter(pmod(col("doc_id"), lit(3)) === 1), "d1",
          md5(col("text")), numBits = 1 << 16)
        .unionAll(graft.sketch.BloomLedger.dropSummary(
          history.filter(pmod(col("doc_id"), lit(3)) === 2), "d2",
          md5(col("text")), numBits = 1 << 16))
      graft.sketch.BloomLedger.novelExact(
          history, md5(col("text")),
          docs, md5(col("text")), graft.sketch.BloomLedger.merged(ledger))
        .select(col("doc_id"))
    }),

    // §2.8/39b incremental stats ledger: three overlapping "crawl
    // drops" of the documents table are summarized independently
    // (counts + token sums + HLL register blobs per source), then the
    // whole-corpus stats come from MERGING THE SUMMARIES ALONE — no
    // corpus rescan. merge_exact pins the algebraic identity
    // (union-of-sketches ≡ sketch-of-union: merged estimate ==
    // direct full-corpus estimate, bit-equal); hll_ok pins the error
    // bound vs the exact distinct count. The additive columns
    // (n_docs, total_tokens) hash-match the oracle's replay —
    // including the double-counted overlap rows, which is precisely
    // what the DISTINCT estimate must not double-count.
    "q_stats_ledger" -> ((s, dir) => {
      import graft.sketch.StatsLedger
      val docs = Tables.documents(s, dir)
      val toks = size(split(trim(col("text")), "\\s+"))
      def drop(pred: org.apache.spark.sql.Column, id: String) =
        StatsLedger.dropSummary(docs.filter(pred), id, col("source"), col("doc_id"), toks)
      val ledger = drop(pmod(col("doc_id"), lit(3)) === 0 || pmod(col("doc_id"), lit(7)) === 0, "d0")
        .unionAll(drop(pmod(col("doc_id"), lit(3)) === 1, "d1"))
        .unionAll(drop(pmod(col("doc_id"), lit(3)) === 2, "d2"))
      val merged = StatsLedger.merge(ledger)
      val direct = docs.groupBy(col("source").as("group"))
        .agg(
          Sketches.hll(xxhash64(col("doc_id"))).as("__direct_est"),
          countDistinct(col("doc_id")).as("__exact_n"))
      merged.join(direct, "group")
        .select(col("group").as("source"), col("n_docs"), col("total_tokens"), col("n_drops"),
          (col("distinct_keys_est") === col("__direct_est")).as("merge_exact"),
          (abs(col("distinct_keys_est") - col("__exact_n")) <= col("__exact_n") * 0.05).as("hll_ok"))
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
    "q_stats_ledger" ->
      raw"""WITH toks AS (
           |  SELECT doc_id, source,
           |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_toks
           |  FROM documents),
           |d AS (
           |  SELECT 'd0' AS drop_id, * FROM toks WHERE doc_id % 3 = 0 OR doc_id % 7 = 0
           |  UNION ALL SELECT 'd1', * FROM toks WHERE doc_id % 3 = 1
           |  UNION ALL SELECT 'd2', * FROM toks WHERE doc_id % 3 = 2)
           |SELECT source,
           |       CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(sum(n_toks) AS BIGINT) AS total_tokens,
           |       CAST(count(DISTINCT drop_id) AS BIGINT) AS n_drops,
           |       true AS merge_exact,
           |       true AS hll_ok
           |FROM d GROUP BY source""".stripMargin,
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
    "q_priority_sample" -> {
      val k = PrepParams.PrioK
      raw"""WITH b AS (
           |  SELECT doc_id AS key, CAST(n_chars AS BIGINT) AS w,
           |         (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 268435456) + 1 AS u
           |  FROM documents WHERE n_chars >= 1),
           |p AS (SELECT key, w, (w * 268435456) // u AS pri FROM b),
           |r AS (SELECT * FROM (
           |        SELECT *, row_number() OVER (ORDER BY pri DESC, key ASC) AS rn FROM p)
           |      WHERE rn <= ${k + 1}),
           |t AS (SELECT CAST(coalesce(max(CASE WHEN rn = ${k + 1} THEN pri END), 0) AS BIGINT) AS tau FROM r)
           |SELECT key, w, pri, tau, greatest(w, tau) AS est
           |FROM r CROSS JOIN t WHERE rn <= $k""".stripMargin
    },

    "q_bloom_novel" ->
      """SELECT d.doc_id FROM documents d
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM documents h
        |  WHERE h.doc_id % 3 <> 0 AND md5(h.text) = md5(d.text))""".stripMargin,
    "q_tdigest_quantiles" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |       true AS p50_ok, true AS p95_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin
  )
}
