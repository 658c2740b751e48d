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

  /** q_kmv_overlap sketch size: 16 keeps the CAPPED estimator path
    * exercised at every sf (sources hold ≥25 distinct docs at sf0.01)
    * while staying honest about being a sketch; production would run
    * 2^12+. The estimate math is exact integer / IEEE-double either
    * way, so the oracle replays it bit-for-bit at any k. */
  val KmvK = 16

  /** q_join_discovery: the profiled key columns (display name, table,
    * column) — ONE spec shared by the Spark lambda and the oracle
    * builder so the two sides can't drift — and the per-column KMV
    * size (64: containment per-mille needs a denser sample than the
    * overlap matrix's 16). */
  private[queries] val JoinDiscCols = Seq(
    ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
    ("orders.o_orderkey", "orders", "o_orderkey"),
    ("orders.o_custkey", "orders", "o_custkey"),
    ("customer.c_custkey", "customer", "c_custkey"),
    ("lineitem.l_partkey", "lineitem", "l_partkey"),
    ("part.p_partkey", "part", "p_partkey"),
    // string columns: true negatives — sequential synthetic integer
    // ids alias numerically (custkey values ⊂ partkey values), so the
    // flag's discrimination shows on the cross-type pairs
    ("documents.source", "documents", "source"),
    ("events.event_type", "events", "event_type"))
  val JoinDiscK = 64

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.8/39c KMV theta-sketch set operations: per-source bottom-k
    // sketches over portable 60-bit text hashes, then pairwise overlap
    // estimates from the k-row summaries alone — the "how much do two
    // crawls overlap" question answered WITHOUT the quadratic exact
    // join. The corpus is scanned once (sketch build, map-side
    // partial KMV buffers); the pair stage touches only
    // n_sources × k retained hashes.
    "q_kmv_overlap" -> ((s, dir) =>
      Sketches.kmvOverlapReport(Tables.documents(s, dir), col("source"),
        col("text"), KmvK, "source_a", "source_b")),

    // §2.8/39f join-key discovery: pairwise inclusion-dependency
    // estimates over named key columns from different tables — KMV
    // sketch per column, retained-sample containment per-mille in
    // both directions, joinable flag at 900‰. Each table scanned
    // once; the pair stage reads n_cols × k retained hashes.
    "q_join_discovery" -> ((s, dir) => {
      def tbl(n: String) = n match {
        case "lineitem" => Tables.lineitem(s, dir)
        case "orders"   => Tables.orders(s, dir)
        case "customer" => Tables.customer(s, dir)
        case "part"     => Tables.part(s, dir)
        case "documents" => Tables.documents(s, dir)
        case "events"   => Tables.events(s, dir)
      }
      Sketches.inclusionReport(
        JoinDiscCols.map { case (nm, t, c) => (nm, tbl(t), col(c)) }, JoinDiscK)
    }),

    // §2.8/39e AMS F2 (tug-of-war) second-moment sketch: the skew
    // detector — per event_type, Σ f_k² over user_id estimated from 60
    // ±1 lanes riding ONE portable hash per row; integer-exact math so
    // the oracle replays estimate AND exact side bit-for-bit. At scale
    // only the sketch runs; the exact join here is the audit.
    "q_f2_skew" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val est = Sketches.amsF2(ev, col("event_type"), col("user_id"))
      val exact = ev
        .groupBy(col("event_type").as("g"), col("user_id"))
        .agg(count(lit(1)).as("f"))
        .groupBy("g").agg(sum(expr("f * f")).as("f2_exact"))
      est.join(exact, "g")
        .select(col("g").as("event_type"), col("n"), col("f2_exact"), col("f2_est"),
          expr("(abs(f2_est - f2_exact) * 1000) div f2_exact").as("err_pm"))
    }),

    // §2.8/39 HLL distinct counts: exact_n (hash-matched) + in-bound flag.
    "q_hll_distinct" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_orderkey")).cast("bigint").as("exact_n"),
          Sketches.hll(xxhash64(col("l_orderkey"))).as("__est"))
        .select(col("l_returnflag"), col("exact_n"),
          (abs(col("__est") - col("exact_n")) <= col("exact_n") * 0.05).as("hll_ok"))),

    // §2.8/39d KMV ledger: two simulated historical drops contribute
    // one sketch row each; the incoming drop's overlap vs the MERGED
    // register is the whole report — zero corpus access at screen
    // time. The oracle replays the DIRECT union sketch (merged ≡
    // direct is the spec-pinned mergeability contract) and the same
    // set-algebra math bit-for-bit.
    "q_kmv_ledger" -> ((s, dir) => {
      val k = KmvK
      val docs = Tables.documents(s, dir)
      val ledger = graft.sketch.KmvLedger.dropSummary(
          docs.filter(col("doc_id") % 3 === 1), "d1", col("text"), k)
        .union(graft.sketch.KmvLedger.dropSummary(
          docs.filter(col("doc_id") % 3 === 2), "d2", col("text"), k))
      graft.sketch.KmvLedger.overlapVsHistory(
        docs.filter(col("doc_id") % 3 === 0), col("text"),
        graft.sketch.KmvLedger.merged(ledger))
    }),

    // §2.8/40 exact heavy hitters via MG candidates + exact recount:
    // users holding ≥ 0.8% of all events (integral threshold math).
    "q_heavy_hitters" -> ((s, dir) =>
      Sketches.heavyHitters(Tables.events(s, dir), col("user_id"), shareNum = 8, shareDen = 1000)
        .select(col("key").as("user_id"), col("cnt"))),

    // §2.8/40e per-group heavy hitters: per language, the terms
    // holding ≥ 15‰ of that language's token stream (the "top terms
    // per source" datasheet question) — one Misra-Gries sketch per
    // group, then an exact recount of the broadcast candidates, so
    // the result is oracle-identical per-group GROUP BY / HAVING.
    // Terms are pre-hashed for the sketch (typed Long aggregator) and
    // the strings recovered from the vocab-sized fingerprint map.
    "q_group_heavy" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("lang"), explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
        .withColumn("h", xxhash64(col("term")))
      val hh = Sketches.heavyHittersByGroup(toks, col("lang"), col("h"),
        shareNum = 15, shareDen = 1000)
      hh.join(broadcast(toks.groupBy("h").agg(min("term").as("term"))), col("key") === col("h"))
        .select(col("grp").as("lang"), col("term"), col("cnt"))
    }),

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

    // §2.8/40d per-SOURCE priority sampling: k docs per source via
    // bounded GroupTopK heaps (≤ k+1 rows per (partition, group)
    // cross the one exchange), same integer priorities as the global
    // operator — the balanced-corpus sampler with unbiased
    // per-source totals.
    "q_group_priority_sample" -> ((s, dir) =>
      graft.sketch.Sketches.groupPrioritySample(
          Tables.documents(s, dir), col("source"), col("doc_id"),
          col("n_chars"), k = PrepParams.GroupPrioK)
        .withColumnRenamed("grp", "source")),

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

    // §2.8/39g incremental OLS trend ledger: three event drops each
    // contribute exact integer regression sums (x = epoch hour
    // centered on the 2024-01-01T00Z launch hour so sums stay small
    // AND additive); the rollup's slope and Sxy/Sxx numerators are
    // identical to a direct pass because the sums are plainly
    // additive — which is exactly what the oracle replays.
    "q_ols_ledger" -> ((s, dir) => {
      import graft.sketch.OlsLedger
      val ev = Tables.events(s, dir)
        .withColumn("cents", round(col("value") * 100).cast("bigint"))
        .withColumn("hour", expr(
          "(unix_micros(ts) div 3600000000L) - " +
            "(CASE WHEN unix_micros(ts) % 3600000000L < 0 THEN 1 ELSE 0 END)"))
      val ref = 473352L // 2024-01-01T00:00Z in epoch hours
      def drop(pred: org.apache.spark.sql.Column, id: String) =
        OlsLedger.dropSummary(ev.filter(pred), id, col("event_type"),
          col("hour"), col("cents"), ref)
      val ledger = drop(pmod(col("event_id"), lit(3)) === 0, "d0")
        .unionAll(drop(pmod(col("event_id"), lit(3)) === 1, "d1"))
        .unionAll(drop(pmod(col("event_id"), lit(3)) === 2, "d2"))
      OlsLedger.merge(ledger).withColumnRenamed("grp", "event_type")
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

  /** q_kmv_overlap replay — shared with the q_source_report
    * capstone oracle. */
  private[queries] lazy val kmvOverlapSql: String = {
    val k = KmvK
    val m = 1152921504606846976L // 2^60, the portableHash64 space
    raw"""WITH h AS (
           |  SELECT DISTINCT source, ('0x' || substr(md5(text), 1, 15))::BIGINT AS hash
           |  FROM documents),
           |r AS (
           |  SELECT source, hash,
           |         row_number() OVER (PARTITION BY source ORDER BY hash) AS rk,
           |         count(*) OVER (PARTITION BY source) AS nd
           |  FROM h),
           |sk AS (SELECT source, hash, nd FROM r WHERE rk <= $k),
           |par AS (
           |  SELECT source,
           |         CASE WHEN min(nd) < $k THEN CAST($m AS BIGINT) ELSE max(hash) END AS theta,
           |         CASE WHEN min(nd) < $k THEN CAST(count(*) AS BIGINT)
           |              ELSE CAST(floor(${k - 1}.0 * $m / CAST(max(hash) AS DOUBLE)) AS BIGINT)
           |         END AS est
           |  FROM sk GROUP BY source),
           |pairs AS (
           |  SELECT a.source AS source_a, b.source AS source_b,
           |         a.est AS est_a, b.est AS est_b,
           |         LEAST(a.theta, b.theta) AS th
           |  FROM par a JOIN par b ON a.source < b.source),
           |cm AS (
           |  SELECT x.source AS sa, y.source AS sb, x.hash AS hash
           |  FROM sk x JOIN sk y ON x.hash = y.hash AND x.source < y.source),
           |com AS (
           |  SELECT p.source_a, p.source_b, CAST(count(c.hash) AS BIGINT) AS common
           |  FROM pairs p LEFT JOIN cm c
           |    ON c.sa = p.source_a AND c.sb = p.source_b AND c.hash <= p.th
           |  GROUP BY p.source_a, p.source_b),
           |un AS (
           |  SELECT p.source_a, p.source_b, CAST(count(DISTINCT s.hash) AS BIGINT) AS union_n
           |  FROM pairs p JOIN sk s ON s.source IN (p.source_a, p.source_b) AND s.hash <= p.th
           |  GROUP BY p.source_a, p.source_b)
           |SELECT p.source_a, p.source_b, c.common, u.union_n,
           |       CAST(floor(CAST(c.common AS DOUBLE) * $m / CAST(p.th AS DOUBLE)) AS BIGINT) AS est_overlap,
           |       CAST(floor(CAST(u.union_n AS DOUBLE) * $m / CAST(p.th AS DOUBLE)) AS BIGINT) AS est_union,
           |       CASE WHEN u.union_n = 0 THEN 0
           |            ELSE CAST(floor(CAST(1000 * c.common AS DOUBLE) / CAST(u.union_n AS DOUBLE)) AS BIGINT)
           |       END AS jacc_pm,
           |       p.est_a, p.est_b
           |FROM pairs p
           |JOIN com c ON c.source_a = p.source_a AND c.source_b = p.source_b
           |JOIN un u ON u.source_a = p.source_a AND u.source_b = p.source_b""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q_kmv_ledger" -> {
      val k = KmvK
      val m = 1152921504606846976L
      raw"""WITH ha AS (
           |  SELECT DISTINCT ('0x' || substr(md5(text), 1, 15))::BIGINT AS hash
           |  FROM documents WHERE doc_id % 3 = 0),
           |hb AS (
           |  SELECT DISTINCT ('0x' || substr(md5(text), 1, 15))::BIGINT AS hash
           |  FROM documents WHERE doc_id % 3 <> 0),
           |sa AS (SELECT hash FROM ha ORDER BY hash LIMIT $k),
           |sb AS (SELECT hash FROM hb ORDER BY hash LIMIT $k),
           |pa AS (SELECT max(hash) AS kth, count(*) AS n FROM sa),
           |pb AS (SELECT max(hash) AS kth, count(*) AS n FROM sb),
           |th AS (
           |  SELECT LEAST(CASE WHEN pa.n < $k THEN $m ELSE pa.kth END,
           |               CASE WHEN pb.n < $k THEN $m ELSE pb.kth END) AS th,
           |         CASE WHEN pa.n < $k THEN CAST(pa.n AS BIGINT)
           |              ELSE CAST(floor(${k - 1}.0 * $m / CAST(pa.kth AS DOUBLE)) AS BIGINT) END AS est_batch,
           |         CASE WHEN pb.n < $k THEN CAST(pb.n AS BIGINT)
           |              ELSE CAST(floor(${k - 1}.0 * $m / CAST(pb.kth AS DOUBLE)) AS BIGINT) END AS est_history
           |  FROM pa, pb),
           |cm AS (
           |  SELECT CAST(count(*) AS BIGINT) AS common
           |  FROM sa JOIN sb USING (hash) CROSS JOIN th WHERE hash <= th.th),
           |un AS (
           |  SELECT CAST(count(*) AS BIGINT) AS union_n
           |  FROM (SELECT hash FROM sa UNION SELECT hash FROM sb) u
           |  CROSS JOIN th WHERE u.hash <= th.th)
           |SELECT cm.common, un.union_n,
           |       CAST(floor(CAST(cm.common AS DOUBLE) * $m / CAST(th.th AS DOUBLE)) AS BIGINT) AS est_overlap,
           |       CAST(floor(CAST(un.union_n AS DOUBLE) * $m / CAST(th.th AS DOUBLE)) AS BIGINT) AS est_union,
           |       CASE WHEN un.union_n = 0 THEN 0
           |            ELSE CAST(floor(CAST(1000 * cm.common AS DOUBLE) / CAST(un.union_n AS DOUBLE)) AS BIGINT)
           |       END AS jacc_pm,
           |       th.est_batch, th.est_history
           |FROM cm, un, th""".stripMargin
    },
    // Full bit-for-bit replay of the KMV math: same 60-bit md5 hash,
    // same (k−1)·M/θ and common·M/θ divisions (every input exactly
    // representable in binary64, so floor() agrees across engines).
    "q_kmv_overlap" -> kmvOverlapSql,
    // Full bit-for-bit replay of the inclusion profiling: same 60-bit
    // hashes, same bottom-k sketches, same joint-θ retained-sample
    // containment per-mille and capacity-aware distinct estimates.
    "q_join_discovery" -> {
      val k = JoinDiscK
      val m = 1152921504606846976L // 2^60
      val cols = JoinDiscCols.map { case (nm, t, c) =>
        s"SELECT '$nm' AS g, CAST($c AS VARCHAR) AS v FROM $t"
      }.mkString("\n  UNION ALL ")
      raw"""WITH vals AS (
           |  $cols),
           |h AS (SELECT DISTINCT g, ('0x' || substr(md5(v), 1, 15))::BIGINT AS hash FROM vals),
           |r AS (
           |  SELECT g, hash,
           |         row_number() OVER (PARTITION BY g ORDER BY hash) AS rk,
           |         count(*) OVER (PARTITION BY g) AS nd
           |  FROM h),
           |sk AS (SELECT g, hash, nd FROM r WHERE rk <= $k),
           |par AS (
           |  SELECT g,
           |         CASE WHEN min(nd) < $k THEN CAST($m AS BIGINT) ELSE max(hash) END AS theta,
           |         CASE WHEN min(nd) < $k THEN CAST(count(*) AS BIGINT)
           |              ELSE CAST(floor(${k - 1}.0 * $m / CAST(max(hash) AS DOUBLE)) AS BIGINT)
           |         END AS est
           |  FROM sk GROUP BY g),
           |pairs AS (
           |  SELECT a.g AS ga, b.g AS gb, a.est AS ea, b.est AS eb,
           |         LEAST(a.theta, b.theta) AS th
           |  FROM par a JOIN par b ON a.g < b.g),
           |an AS (SELECT p.ga, p.gb, CAST(count(*) AS BIGINT) AS n
           |       FROM pairs p JOIN sk s ON s.g = p.ga AND s.hash <= p.th GROUP BY 1, 2),
           |bn AS (SELECT p.ga, p.gb, CAST(count(*) AS BIGINT) AS n
           |       FROM pairs p JOIN sk s ON s.g = p.gb AND s.hash <= p.th GROUP BY 1, 2),
           |cm AS (SELECT p.ga, p.gb, CAST(count(*) AS BIGINT) AS n
           |       FROM pairs p
           |       JOIN sk x ON x.g = p.ga AND x.hash <= p.th
           |       JOIN sk y ON y.g = p.gb AND y.hash = x.hash
           |       GROUP BY 1, 2)
           |SELECT p.ga AS col_a, p.gb AS col_b, p.ea AS est_a, p.eb AS est_b,
           |       CASE WHEN coalesce(an.n, 0) = 0 THEN 0
           |            ELSE (coalesce(cm.n, 0) * 1000) // an.n END AS cont_a_pm,
           |       CASE WHEN coalesce(bn.n, 0) = 0 THEN 0
           |            ELSE (coalesce(cm.n, 0) * 1000) // bn.n END AS cont_b_pm,
           |       CAST(GREATEST(
           |         CASE WHEN coalesce(an.n, 0) = 0 THEN 0
           |              ELSE (coalesce(cm.n, 0) * 1000) // an.n END,
           |         CASE WHEN coalesce(bn.n, 0) = 0 THEN 0
           |              ELSE (coalesce(cm.n, 0) * 1000) // bn.n END) >= 900 AS INT) AS joinable
           |FROM pairs p
           |LEFT JOIN an ON an.ga = p.ga AND an.gb = p.gb
           |LEFT JOIN bn ON bn.ga = p.ga AND bn.gb = p.gb
           |LEFT JOIN cm ON cm.ga = p.ga AND cm.gb = p.gb""".stripMargin
    },

    // Full bit-for-bit replay of the AMS math: same 60-bit md5 hash,
    // lane signs from its bits, Z_j = 2·ones_j − n, estimate
    // (Σ Z_j²) // 60 — all integer, so est AND exact hash-match.
    "q_f2_skew" ->
      raw"""WITH h AS (
           |  SELECT event_type AS g,
           |         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
           |  FROM events),
           |lanes AS (
           |  SELECT g, j, CAST(sum((h >> j) & 1) AS BIGINT) AS ones, count(*) AS n
           |  FROM h, (SELECT unnest(range(60)) AS j) t GROUP BY g, j),
           |est AS (
           |  SELECT g, max(n) AS n,
           |         CAST(sum((2 * ones - n) * (2 * ones - n)) // 60 AS BIGINT) AS f2_est
           |  FROM lanes GROUP BY g),
           |ex AS (
           |  SELECT g, CAST(sum(f * f) AS BIGINT) AS f2_exact FROM (
           |    SELECT event_type AS g, user_id, count(*) AS f FROM events GROUP BY 1, 2)
           |  GROUP BY g)
           |SELECT est.g AS event_type, est.n, ex.f2_exact, est.f2_est,
           |       (abs(est.f2_est - ex.f2_exact) * 1000) // ex.f2_exact AS err_pm
           |FROM est JOIN ex USING (g)""".stripMargin,
    "q_hll_distinct" ->
      """SELECT l_returnflag,
        |       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_n,
        |       true AS hll_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_ols_ledger" ->
      """WITH e AS (
        |  SELECT event_type,
        |         (((epoch_us(ts) // 3600000000) - CASE WHEN epoch_us(ts) % 3600000000 < 0 THEN 1 ELSE 0 END) - 473352) AS cx,
        |         CAST(round(value * 100) AS BIGINT) AS y
        |  FROM events),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(cx) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |             CAST(sum(cx * y) AS BIGINT) AS sxy, CAST(sum(cx * cx) AS BIGINT) AS sxx
        |      FROM e GROUP BY 1)
        |SELECT event_type, n, CAST(3 AS BIGINT) AS n_drops,
        |       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
        |            ELSE CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope,
        |       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
        |            ELSE (CAST(sy AS DOUBLE)
        |                  - (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE))
        |                    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) END AS intercept,
        |       n * sxy - sx * sy AS sxy_num,
        |       n * sxx - sx * sx AS sxx_num
        |FROM s""".stripMargin,
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
    "q_group_heavy" ->
      raw"""WITH tok AS (
           |  SELECT lang, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
           |  FROM documents
           |), tot AS (
           |  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1
           |), c AS (
           |  SELECT lang, term, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1, 2
           |)
           |SELECT lang, term, cnt
           |FROM c JOIN tot USING (lang) WHERE cnt * 1000 >= 15 * n""".stripMargin,
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

    "q_group_priority_sample" -> {
      val k = PrepParams.GroupPrioK
      raw"""WITH b AS (
           |  SELECT source, doc_id AS key, CAST(n_chars AS BIGINT) AS w,
           |         (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 268435456) + 1 AS u
           |  FROM documents WHERE n_chars >= 1),
           |p AS (SELECT source, key, w, (w * 268435456) // u AS pri FROM b),
           |r AS (SELECT * FROM (
           |        SELECT *, row_number() OVER (PARTITION BY source ORDER BY pri DESC, key ASC) AS rn
           |        FROM p)
           |      WHERE rn <= ${k + 1}),
           |t AS (SELECT source,
           |             CAST(coalesce(max(CASE WHEN rn = ${k + 1} THEN pri END), 0) AS BIGINT) AS tau
           |      FROM r GROUP BY source)
           |SELECT r.source, key, w, pri, t.tau, greatest(w, t.tau) AS est
           |FROM r JOIN t USING (source) WHERE rn <= $k""".stripMargin
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
