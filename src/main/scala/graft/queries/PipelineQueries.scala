package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CoreOps._
import graft.operators.GraphOps
import graft.operators.JsonShred._
import graft.operators.Relational._
import graft.operators.Timeseries._
import graft.sources.Tables

/** Third analytic wave: time-series reshaping (gap-fill resampling,
  * transition counting, interval concurrency), column profiling,
  * explicit grouping sets, Pareto skyline, and median/MAD robust
  * outliers. All oracle-gated against DuckDB.
  */
object PipelineQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // State-transition (Markov) counts over per-user event streams.
    "q_transitions" -> ((s, dir) =>
      Tables.events(s, dir)
        .transitions(col("user_id"), Seq(unix_micros(col("ts")), col("event_id")),
          col("event_type"))),

    // Hourly resample of each user's latest event value, forward-
    // filled across empty hours.
    "q_gap_fill" -> ((s, dir) =>
      Tables.events(s, dir)
        .gapFill(col("user_id"), unix_micros(col("ts")), col("event_id"),
          round(col("value") * 100).cast("bigint"), stepUs = 3600000000L)),

    // CUSUM changepoint scan over hourly event counts: cumulative
    // deviation from the global mean (division-free: B·n − T), peak
    // |cusum| marks the sustained rate shift. Bucket agg over the
    // stream, everything after over ≤ B bucket rows.
    "q_cusum" -> ((s, dir) =>
      Tables.events(s, dir)
        .cusumDrift(unix_micros(col("ts")), stepUs = 3600000000L)),

    // §2.2/22ae4 Kaplan–Meier survival over user lifetimes (6-hour
    // buckets): users whose last event sits within 12 hours of the
    // corpus horizon are censored (at-risk, not churned) — the
    // product-limit Ŝ(t) carried exactly as the qlog64 sum km_q64.
    // 12 h splits the synthetic gap-to-horizon distribution (median
    // ≈7 h) so both churned and censored users exist at every sf.
    "q_survival" -> ((s, dir) =>
      graft.operators.Timeseries.kaplanMeier(
        Tables.events(s, dir), col("user_id"), unix_micros(col("ts")),
        censorWindowUs = 43200000000L, bucketUs = 21600000000L)),

    // §2.5/43f2 per-arm conversion readout: users hash-split 50/25/25,
    // a user converts if they ever purchase; exact per-mille rate +
    // the Agresti–Coull z=2 interval (bit-stable IEEE op chain).
    "q_conversion_ci" -> ((s, dir) =>
      graft.quality.Validate.conversionReport(
        Tables.events(s, dir),
        graft.text.TextPrep.splitAssign(col("user_id"), 50, 25),
        col("user_id"),
        col("event_type") === "purchase")),

    // §2.2/22as12 leakage-safe LOO target encoding: each event's type
    // encoded as the mean value-cents of the OTHER events sharing it.
    "q_target_encode" -> ((s, dir) =>
      graft.operators.Relational.RelationalOps(
          Tables.events(s, dir).select(col("event_id"), col("event_type"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents")))
        .targetEncodeLoo(col("event_type"), col("cents"))),

    // §2.2/22as13 trimmed mean per event_type over the [50‰, 950‰]
    // nearest-rank slice — the robust-center complement of winsorize.
    "q_trimmed_mean" -> ((s, dir) =>
      graft.operators.Relational.RelationalOps(Tables.events(s, dir))
        .trimmedMean(col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)"), 50, 950)
        .withColumnRenamed("g", "event_type")),

    // §2.2/22v3 Herfindahl concentration per event_type: is a type's
    // volume all one user? hhi_bp + inverse-Simpson effective users,
    // both exact floor divisions.
    "q_hhi" -> ((s, dir) =>
      graft.operators.Relational.RelationalOps(Tables.events(s, dir))
        .concentration(col("event_type"), col("user_id"))
        .withColumnRenamed("grp", "event_type")),

    // §2.2/22ae5 time-weighted average value per user: each
    // observation weighted by its holding period — the
    // irregular-sampling-robust mean, exact integer num/den.
    "q_twap" -> ((s, dir) =>
      graft.operators.Timeseries.timeWeightedAvg(
        Tables.events(s, dir), col("user_id"), unix_micros(col("ts")),
        expr("CAST(round(value * 100) AS BIGINT)"))),

    // §2.2/22ae6 exact integer EWMA per user: α = 1/16 exponential
    // smoothing of spend cents over the (ts, value) order — every
    // step an exact floor division (pmod-corrected so truncating and
    // flooring engines agree on negative deltas), bit-replayed by the
    // oracle's list_reduce.
    "q_ewma" -> ((s, dir) =>
      graft.operators.Timeseries.ewmaByKey(
        Tables.events(s, dir), col("user_id"), unix_micros(col("ts")),
        expr("CAST(round(value * 100) AS BIGINT)"), halfShift = 4)
        .withColumnRenamed("key", "user_id")),

    // §2.2/22aw3 mutual information between lang and source: the
    // feature-dependence / leakage audit in exact qlog64 integers —
    // per observed cell PMI + contribution, with the corpus total
    // repeated per row.
    "q_mi" -> ((s, dir) =>
      graft.operators.Relational.RelationalOps(Tables.documents(s, dir))
        .mutualInformation(col("lang"), col("source"))),

    // §2.2/22ak6 k-core of the part↔supplier sourcing graph (k = 10,
    // ≤ 8 synchronous peel rounds with fixpoint early-exit — 2 rounds
    // suffice on this graph at every sf): the dense-backbone split.
    "q_kcore" -> ((s, dir) =>
      graft.operators.GraphOps.kCore(
        Tables.lineitem(s, dir).select(
          (col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst")),
        k = 10L, maxRounds = 8)),

    // §2.2/47d Benford first-digit audit over price cents: observed
    // vs the published log10(1+1/d) per-mille constants, Nigrini MAD
    // as an exact integer — the fabricated-data forensic.
    "q_benford" -> ((s, dir) =>
      graft.quality.Validate.benfordAudit(
        Tables.lineitem(s, dir),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))),

    // k-anonymity risk audit: (event_type, hour) combos shared by
    // fewer than 5 events are re-identification risks — the release
    // gate beside PII redaction; output is only the risky combos.
    "q_k_anon" -> ((s, dir) =>
      graft.quality.Validate.kAnonymityRisk(
        Tables.events(s, dir),
        Seq(col("event_type"),
          expr("(unix_micros(ts) div 3600000000L) - (CASE WHEN unix_micros(ts) % 3600000000L < 0 THEN 1 ELSE 0 END)").as("hour")),
        k = 5L)),

    // §2.5/43f sample-ratio-mismatch audit over the hash split:
    // expected arms LEFT-drive the report so a vanished arm shows up
    // as n = 0; dev = n·W − w·N is exactly 0 at a perfect ratio.
    "q_srm" -> ((s, dir) =>
      graft.quality.Validate.srmAudit(
        Tables.documents(s, dir),
        graft.text.TextPrep.splitAssign(col("doc_id"), 90, 5),
        Seq(("train", 90L), ("val", 5L), ("test", 5L)))),

    // Distribution-drift report: does the incoming drop's length
    // distribution match the reference corpus? Cross-multiplied
    // integer proportion drift per 256-char bucket — zero ⇔ share
    // unchanged; one aggregate over the union, then bucket-row math.
    "q_dist_drift" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.operators.TableDiff.distributionDrift(
        docs.filter(col("doc_id") % 3 =!= 0),
        docs.filter(col("doc_id") % 3 === 0),
        expr("n_chars div 256"), expr("n_chars div 256"))
    }),

    // Per-key CUSUM: which event TYPE's rate shifted, and when —
    // per-key baselines, per-key ordered windows, no global funnel.
    "q_cusum_by_key" -> ((s, dir) =>
      Tables.events(s, dir)
        .cusumDriftBy(col("event_type"), unix_micros(col("ts")),
          stepUs = 3600000000L)),

    // Concurrent-session count per hour: sessionize, roll up to
    // [start, end] intervals, count interval overlap per hour bucket.
    "q_concurrency" -> ((s, dir) =>
      Tables.events(s, dir)
        .sessionize(col("user_id"), col("ts"), 30L * 60 * 1000000)
        .reduceByKey(
          Seq(col("user_id"), col("session_id")),
          Seq(min(unix_micros(col("ts"))).as("start_us"),
            max(unix_micros(col("ts"))).as("end_us")))
        .concurrency(col("start_us"), col("end_us"), stepUs = 3600000000L)),

    // Single-pass column profile (count/nulls/distinct/min/max).
    "q_profile" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .profile(Seq("l_orderkey", "l_returnflag", "l_linestatus"))),

    // Explicit GROUPING SETS: (flag, status), (flag), and grand total.
    "q_grouping_sets" -> ((s, dir) =>
      Tables.lineitem(s, dir).groupingSetsAgg(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq()),
        Seq(col("l_returnflag"), col("l_linestatus")),
        Seq(sum(col("l_quantity").cast("bigint")).as("sum_qty"), count(lit(1)).as("n")))),

    // Pareto skyline of parts: no part both smaller and cheaper.
    "q_skyline" -> ((s, dir) =>
      Tables.part(s, dir)
        .skyline2D(col("p_size").cast("bigint"),
          round(col("p_retailprice") * 100).cast("bigint"))),

    // RANGE-frame trailing window: per-user sum of the last hour's
    // event values BY TIMESTAMP RANGE (not row count) — peers with
    // equal timestamps enter the frame together, and gaps shrink it.
    "q_range_frame" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600000000L, 0)
      Tables.events(s, dir)
        .withColumn("cents", round(col("value") * 100).cast("bigint"))
        .select(col("event_id"), col("user_id"),
          sum(col("cents")).over(w).as("hour_cents"))
    }),

    // Percentile-gated quality filter: keep docs whose length sits
    // inside their language's [p5, p95] window — the adaptive
    // "trim the tails" gate (per-lang stats broadcast back to rows).
    "q_length_gate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val stats = docs.groupBy(col("lang").as("__lang"))
        .agg(expr("percentile(n_chars, 0.05D)").as("p5"),
          expr("percentile(n_chars, 0.95D)").as("p95"))
      docs.join(broadcast(stats), col("lang") === col("__lang"))
        .filter(col("n_chars") >= col("p5") && col("n_chars") <= col("p95"))
        .select(col("doc_id"), col("lang"), col("n_chars").cast("bigint").as("n_chars"))
    }),

    // Exact interpolated percentiles per group (p50/p90/p99 of integral
    // cents — sort-based exact, both engines interpolate at (n−1)·q).
    "q_percentiles" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("cents", round(col("value") * 100).cast("bigint"))
        .groupBy(col("event_type"))
        .agg(
          expr("percentile(cents, 0.5D)").as("p50"),
          expr("percentile(cents, 0.9D)").as("p90"),
          expr("percentile(cents, 0.99D)").as("p99"))),

    // Weighted source mixing: per-source keep rates (e.g. upsample
    // src1, drop most of src2), decided by each doc's md5 bucket.
    "q_mixture" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .mixtureSample(col("source"), col("doc_id"),
          Map("src0" -> 80, "src1" -> 100, "src2" -> 20), defaultPct = 50)),

    // Temperature-scaled mixture weights (α = 0.5): per-source token
    // share → sqrt-flattened sampling weight + boost factor.
    "q_temperature" -> ((s, dir) =>
      graft.text.TextPrep.temperatureWeights(
        Tables.documents(s, dir), col("source"),
        graft.text.TextAnalysis.tokenCount(col("text")))),

    // §2.5/43g UniMax budget allocation (arXiv:2304.09151): equal
    // token shares per language under a 2-epoch cap — the paper's
    // sequential waterfilling loop re-expressed as window arithmetic
    // over the per-language table (UniMaxSpec proves loop parity).
    "q_unimax" -> ((s, dir) =>
      graft.text.UniMax.allocateRelative(
        Tables.documents(s, dir), col("lang"), col("text"),
        PrepParams.UnimaxBudgetNum, PrepParams.UnimaxBudgetDen,
        PrepParams.UnimaxEpochsMilli)),

    // §2.5/43g2 the allocation materialized as per-document repeat
    // counts: full epochs for everyone in a funded language plus a
    // deterministic md5-ordered partial pass for the remainder.
    "q_unimax_sample" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val alloc = graft.text.UniMax.allocateRelative(docs, col("lang"), col("text"),
        PrepParams.UnimaxBudgetNum, PrepParams.UnimaxBudgetDen,
        PrepParams.UnimaxEpochsMilli)
      graft.text.UniMax.materializeCopies(docs, col("lang"), col("text"),
        col("doc_id"), alloc)
    }),

    // Greedy sequence packing: batch assignment per 2000-token budget
    // within 8 hash shards (one packed stream per data-loader worker).
    "q_pack" -> ((s, dir) =>
      graft.text.TextPrep.packByTokenBudget(
        Tables.documents(s, dir)
          .select(col("doc_id"), pmod(col("doc_id"), lit(8)).as("shard"), col("text")),
        col("shard"), Seq(col("doc_id")),
        graft.text.TextAnalysis.tokenCount(col("text")), budget = 2000L)
        .select(col("doc_id"), col("shard"), col("n_tokens"), col("batch_id"))),

    // The packed sequences themselves: per (shard, batch) the member
    // docs concatenated in doc_id order — what a data loader reads.
    // Per-batch state is bounded by the token budget by construction.
    "q_pack_sequences" -> ((s, dir) =>
      graft.text.TextPrep.packSequences(
        Tables.documents(s, dir)
          .select(col("doc_id"), pmod(col("doc_id"), lit(8)).as("shard"), col("text")),
        col("shard"), Seq(col("doc_id")), col("text"),
        graft.text.TextAnalysis.tokenCount(col("text")), budget = 2000L)
        .select(col("shard"), col("batch_id"), col("n_docs"), col("n_tokens"),
          col("packed_text"))),

    // Context-window prep capstone: chunk documents into overlapping
    // 50-token windows, pack the chunks into 500-token batches per
    // shard, materialize the packed sequences — the full
    // document→training-sequence path as ONE cross-engine gate
    // (packed text md5-hashed like q_chunk, exact content check).
    "q_chunk_pack" -> ((s, dir) => {
      val chunks = graft.text.TextPrep.chunkTokens(
          Tables.documents(s, dir), col("text"), col("doc_id"),
          chunkSize = 50, overlap = 10)
        .withColumn("shard", pmod(col("doc_id"), lit(8)))
      graft.text.TextPrep.packSequences(chunks, col("shard"),
          Seq(col("doc_id"), col("chunk_id")), col("chunk"),
          col("n_tokens"), budget = 500L)
        .select(col("shard"), col("batch_id"), col("n_docs"), col("n_tokens"),
          md5(col("packed_text")).as("packed_md5"))
    }),

    // Session path mining: length-3 event-type paths per user.
    "q_paths" -> ((s, dir) =>
      Tables.events(s, dir)
        .pathKGrams(col("user_id"), Seq(unix_micros(col("ts")), col("event_id")),
          col("event_type"), k = 3)),

    // Corpus Zipf head: top-40 tokens with rank and cumulative count.
    "q_vocab" -> ((s, dir) =>
      graft.text.TextAnalysis.vocabZipf(Tables.documents(s, dir), col("text"), k = 40)),

    // Balanced training subset: 100 deterministic docs per language.
    "q_stratified" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"))
        .stratifiedSample(col("lang"), col("doc_id"), nPerClass = 100)),

    // Gopher/FineWeb-style per-source frequency cap via the Corpus
    // facade: keep the 15 longest docs (id tiebreak) per source — the
    // over-represented-domain guard. Rides the GroupTopK physical
    // operator: map tasks forward ≤ cap rows per (source, partition).
    "q_source_cap" -> ((s, dir) =>
      graft.Corpus(Tables.documents(s, dir), col("text"), col("doc_id"))
        .capPerSource(col("source"), maxDocs = PrepParams.SourceCapMax)
        .df.select(col("doc_id"), col("source"), col("n_chars"))),

    // PageRank over the bipartite part→supplier sourcing graph (ids
    // disambiguated 2k / 2k+1), 3 fixed iterations, scaled-integer
    // arithmetic — bit-identical to the oracle's chained-CTE replay.
    "q_pagerank" -> ((s, dir) =>
      GraphOps.pageRank(
        Tables.lineitem(s, dir).select(
          (col("l_partkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst")),
        iters = 3)),

    // §2.2/22ak5 label-propagation communities over the same
    // part→supplier sourcing graph as q_pagerank: 3 deterministic
    // synchronous rounds (most-frequent neighbor label, ties → min),
    // replayed as a CTE chain in the oracle.
    "q_lpa" -> ((s, dir) =>
      GraphOps.labelPropagation(
        Tables.lineitem(s, dir).select(
          (col("l_partkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst")),
        iters = 3)),

    // §2.2/22as8 per-source quantile normalization: each doc's score
    // mapped to its within-source rank per-mille — the equalization
    // step before one cross-source threshold; one rank window per
    // source, exact integers.
    "q_quantile_norm" -> ((s, dir) =>
      Tables.documents(s, dir)
        .quantileNormalize(col("source"), col("n_chars"), col("doc_id"))
        .select(col("doc_id"), col("source"), col("n_chars"), col("pct_pm"))),

    // §2.2/22as11 winsorization: per event_type, clamp value cents to
    // the nearest-rank [50‰, 950‰] cutoffs — robust prep that keeps n
    // stable; exact integer ranks, no interpolation float. One window
    // pass + a broadcast cutoff join-back.
    "q_winsorize" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("value_cents", expr("CAST(round(value * 100) AS BIGINT)"))
        .winsorize(col("event_type"), col("value_cents"), 50, 950)
        .select(col("event_id"), col("event_type"), col("value_cents"),
          col("lo_cut"), col("hi_cut"), col("winsorized"))),

    // §2.2/22as9 block-jackknife sensitivity: per event_type, how far
    // the mean value (cents) moves if any 1/32 hash block of the data
    // vanishes — the "is this metric driven by one shard" audit, two
    // tiny aggregates, all-integer.
    "q_block_jackknife" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
          col("event_id"))
        .blockJackknife(col("event_type"), col("cents"), col("event_id"))
        .select(col("g").as("event_type"), col("n"), col("mean"), col("lo"), col("hi"))),

    // TrustRank over the UNDIRECTED part↔supplier sourcing graph:
    // teleport mass restricted to the trusted supplier registry
    // (s_suppkey ≡ 0 mod 5 — the stand-in for a vetted-domain list),
    // 3 fixed iterations, scaled-integer — proximity-to-seeds trust
    // scores, the crawl-quality propagation algorithm.
    "q_trustrank" -> ((s, dir) => {
      val e0 = Tables.lineitem(s, dir).select(
        (col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = Tables.supplier(s, dir)
        .filter(pmod(col("s_suppkey"), lit(5)) === 0)
        .select((col("s_suppkey") * 2 + 1).as("id"))
      GraphOps.personalizedPageRank(edges, seeds, iters = 3)
    }),

    // §2.2/22ae3 half-life-decayed trending counts: top-25 users by
    // recency-weighted activity (1-day half-life, power-of-two decay
    // — exact integers), with all-time totals for the surge-vs-volume
    // contrast.
    "q_trending" -> ((s, dir) => {
      val ranked = Tables.events(s, dir)
        .decayedCounts(col("user_id"), to_date(col("ts")))
        .orderBy(col("score").desc, col("k").asc).limit(25)
      ranked
        .withColumn("rank", row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("k").asc)))
        .select(col("k").as("user_id"), col("total"), col("score"), col("rank"))
    }),

    // §2.2/22as10 frequent co-purchase pairs with association-rule
    // stats: top-25 part pairs sharing an order, confidence and lift
    // in integer per-mille — in-row pair generation per basket, pair
    // work linear in orders.
    "q_copurchase" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .frequentPairs(col("l_orderkey"), col("l_partkey"), k = 25)),

    // k-hop seed expansion over the same undirected sourcing graph as
    // q_trustrank: frontier and cumulative reach per hop from the
    // trusted supplier registry — coverage/saturation profile.
    "q_khop" -> ((s, dir) => {
      val e0 = Tables.lineitem(s, dir).select(
        (col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = Tables.supplier(s, dir)
        .filter(pmod(col("s_suppkey"), lit(5)) === 0)
        .select((col("s_suppkey") * 2 + 1).as("id"))
      GraphOps.khopReach(edges, seeds, hops = 3)
    }),

    // Nested-JSON round trip: pack each order's line items into one
    // JSON document, re-parse with an explicit from_json schema, and
    // shred back to typed rows. The oracle computes the equivalent
    // flat projection directly — equality proves the whole
    // pack→parse→explode path is lossless and correctly typed.
    "q_json_shred" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .packJsonPerKey(col("l_orderkey"),
          Seq("p" -> col("l_partkey"), "q" -> col("l_quantity").cast("bigint")))
        .shredJson(col("doc"), "key BIGINT, items ARRAY<STRUCT<p: BIGINT, q: BIGINT>>")
        .select(col("key").as("o_orderkey"), col("p").as("partkey"), col("q").as("qty"))),

    // Median/MAD robust outliers among event values per event type.
    "q_mad_outliers" -> ((s, dir) =>
      Tables.events(s, dir)
        .madOutliers(Seq(col("event_type")),
          round(col("value") * 100).cast("bigint"), k = 3.0,
          keep = Seq(col("event_id"))))
  )

  val oracleSql: Map[String, String] = Map(
    "q_transitions" ->
      """WITH t AS (
        |  SELECT event_type AS from_state,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY epoch_us(ts), event_id) AS to_state
        |  FROM events)
        |SELECT from_state, to_state, count(*) AS n
        |FROM t WHERE to_state IS NOT NULL GROUP BY 1, 2""".stripMargin,
    "q_gap_fill" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id,
        |         CAST(round(value * 100) AS BIGINT) AS cents,
        |         ((epoch_us(ts) // 3600000000) - CASE WHEN epoch_us(ts) % 3600000000 < 0 THEN 1 ELSE 0 END) AS bucket
        |  FROM events),
        |obs AS (
        |  SELECT user_id, bucket, cents FROM (
        |    SELECT user_id, bucket, cents,
        |           row_number() OVER (PARTITION BY user_id, bucket
        |                              ORDER BY us DESC, event_id DESC) AS rn
        |    FROM e) WHERE rn = 1),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(min(bucket), max(bucket))) AS bucket
        |  FROM e GROUP BY user_id)
        |SELECT g.user_id AS key, g.bucket,
        |       last_value(o.cents IGNORE NULLS)
        |         OVER (PARTITION BY g.user_id ORDER BY g.bucket
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
        |FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.bucket = o.bucket""".stripMargin,
    "q_survival" ->
      s"""WITH spans AS (
         |  SELECT user_id, CAST(min(epoch_us(ts)) AS BIGINT) AS f,
         |         CAST(max(epoch_us(ts)) AS BIGINT) AS l
         |  FROM events GROUP BY user_id
         |), h AS (SELECT max(l) AS h FROM spans),
         |pu AS (
         |  SELECT (l - f) // 21600000000 AS t,
         |         CASE WHEN h - l >= 43200000000 THEN 1 ELSE 0 END AS obs
         |  FROM spans CROSS JOIN h
         |), tbl AS (
         |  SELECT t, CAST(sum(obs) AS BIGINT) AS n_churn,
         |         CAST(sum(1 - obs) AS BIGINT) AS n_censored
         |  FROM pu GROUP BY t
         |), r AS (
         |  SELECT t, n_churn, n_censored,
         |         CAST(sum(n_churn + n_censored) OVER (ORDER BY t DESC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk
         |  FROM tbl
         |), st AS (
         |  SELECT t, n_risk, n_churn, n_censored,
         |         CASE WHEN n_churn = n_risk THEN NULL
         |              ELSE (${qlogSql("(n_risk - n_churn)")}) - (${qlogSql("n_risk")})
         |         END AS step,
         |         max(CASE WHEN n_churn = n_risk THEN 1 ELSE 0 END) OVER (ORDER BY t
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead
         |  FROM r
         |)
         |SELECT t, n_risk, n_churn, n_censored,
         |       CASE WHEN dead = 1 THEN NULL
         |            ELSE CAST(sum(step) OVER (ORDER BY t
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |       END AS km_q64
         |FROM st""".stripMargin,
    "q_conversion_ci" ->
      """WITH per AS (
        |  SELECT CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 50 THEN 'train'
        |              WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 75 THEN 'val'
        |              ELSE 'test' END AS arm,
        |         user_id,
        |         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |a AS (SELECT arm, CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS x
        |      FROM per GROUP BY arm),
        |d AS (SELECT arm, n, x, (1000 * x) // n AS rate_pm,
        |             CAST(x + 2 AS DOUBLE) / CAST(n + 4 AS DOUBLE) AS pt
        |      FROM a),
        |h AS (SELECT *, 2.0 * sqrt(pt * (1.0 - pt) / CAST(n + 4 AS DOUBLE)) AS hw FROM d)
        |SELECT arm, n, x, rate_pm, pt - hw AS ci_lo, pt + hw AS ci_hi
        |FROM h""".stripMargin,
    "q_target_encode" ->
      """WITH b AS (
        |  SELECT event_id, event_type,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |w AS (
        |  SELECT event_id, event_type, cents,
        |         CAST(sum(cents) OVER (PARTITION BY event_type) AS BIGINT) - cents AS loo_num,
        |         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) - 1 AS loo_den
        |  FROM b)
        |SELECT event_id, event_type, cents, loo_num, loo_den,
        |       CASE WHEN loo_den = 0 THEN NULL
        |            ELSE (loo_num // loo_den) * 1000
        |               + ((loo_num % loo_den) * 1000) // loo_den
        |       END AS loo_milli
        |FROM w""".stripMargin,
    "q_trimmed_mean" ->
      """WITH v AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |r AS (
        |  SELECT event_type, v,
        |         row_number() OVER (PARTITION BY event_type ORDER BY v) AS rk,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM v),
        |k AS (
        |  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
        |         CAST(count(*) AS BIGINT) AS n_kept,
        |         CAST(sum(v) AS BIGINT) AS trimmed_sum
        |  FROM r
        |  WHERE rk >= greatest((n * 50 + 999) // 1000, 1)
        |    AND rk <= greatest((n * 950 + 999) // 1000, 1)
        |  GROUP BY event_type)
        |SELECT event_type, n, n_kept, trimmed_sum,
        |       (trimmed_sum // n_kept) * 1000
        |         + ((trimmed_sum % n_kept) * 1000) // n_kept AS trimmed_milli
        |FROM k""".stripMargin,
    "q_hhi" ->
      """WITH c AS (
        |  SELECT event_type AS grp, user_id AS k, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |a AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n,
        |             CAST(count(*) AS BIGINT) AS n_keys, sum(c * c) AS c2
        |      FROM c GROUP BY grp)
        |SELECT grp AS event_type, n, n_keys,
        |       CAST((c2 * 10000) // (CAST(n AS HUGEINT) * n) AS BIGINT) AS hhi_bp,
        |       CAST((CAST(n AS HUGEINT) * n * 1000) // c2 AS BIGINT) AS eff_milli
        |FROM a""".stripMargin,
    "q_twap" ->
      """WITH b AS (
        |  SELECT user_id AS key, CAST(epoch_us(ts) AS BIGINT) AS us,
        |         CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events),
        |l AS (SELECT key, us, v,
        |             lead(us) OVER (PARTITION BY key ORDER BY us, v) - us AS dt
        |      FROM b),
        |a AS (SELECT key, CAST(count(*) AS BIGINT) AS n_obs,
        |             CAST(max(us) - min(us) AS BIGINT) AS span_us,
        |             CAST(sum(v * coalesce(dt, 0)) AS BIGINT) AS twap_num,
        |             CAST(sum(coalesce(dt, 0)) AS BIGINT) AS twap_den
        |      FROM l GROUP BY key)
        |SELECT key, n_obs, span_us, twap_num, twap_den,
        |       CASE WHEN twap_den = 0 THEN NULL
        |            ELSE (twap_num // twap_den) * 1000
        |               + ((twap_num % twap_den) * 1000) // twap_den
        |       END AS twap_milli
        |FROM a""".stripMargin,
    "q_ewma" ->
      """WITH o AS (
        |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t,
        |         CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events),
        |l AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_obs,
        |         list(v ORDER BY t, v) AS xs
        |  FROM o GROUP BY user_id)
        |SELECT user_id, n_obs,
        |       CAST(list_reduce(xs, (acc, x) ->
        |         acc + (x - acc - (((x - acc) % 16 + 16) % 16)) // 16) AS BIGINT) AS ewma
        |FROM l""".stripMargin,
    "q_mi" ->
      s"""WITH grid AS (
         |  SELECT CAST(lang AS VARCHAR) AS x, CAST(source AS VARCHAR) AS y,
         |         CAST(count(*) AS BIGINT) AS c_xy
         |  FROM documents GROUP BY 1, 2),
         |mx AS (SELECT x, CAST(sum(c_xy) AS BIGINT) AS c_x FROM grid GROUP BY x),
         |my AS (SELECT y, CAST(sum(c_xy) AS BIGINT) AS c_y FROM grid GROUP BY y),
         |tot AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n FROM grid),
         |cells AS (
         |  SELECT x, y, c_xy, c_x, c_y, n,
         |         (${qlogSql("(c_xy * n)")}) - (${qlogSql("(c_x * c_y)")}) AS pmi_q64
         |  FROM grid JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot),
         |c2 AS (SELECT *, c_xy * pmi_q64 AS contrib_q64 FROM cells)
         |SELECT x, y, c_xy, c_x, c_y, n, pmi_q64, contrib_q64,
         |       CAST(sum(contrib_q64) OVER () AS BIGINT) AS mi_q64_total
         |FROM c2""".stripMargin,
    "q_kcore" -> {
      // unrolled synchronous peel: extra rounds past the fixpoint are
      // no-ops, so 8 fixed rounds ≡ the operator's early-exit run.
      // MATERIALIZED is load-bearing: every round reads its
      // predecessor 3× and DuckDB inlines CTEs by default — the
      // un-hinted chain expands to ~3⁸ plan copies and never finishes
      val rounds = (1 to 8).map { i =>
        val (p, c) = (s"r${i - 1}", s"r$i")
        s"""k$c AS MATERIALIZED (SELECT a FROM $p GROUP BY a HAVING count(*) >= 10),
           |$c AS MATERIALIZED (SELECT r.a, r.b FROM $p r
           |       JOIN k$c ka ON r.a = ka.a JOIN k$c kb ON r.b = kb.a)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (
         |  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |  FROM lineitem),
         |r0 AS MATERIALIZED (SELECT src AS a, dst AS b FROM e0
         |       UNION SELECT dst, src FROM e0),
         |$rounds
         |SELECT a AS id, CAST(count(*) AS BIGINT) AS deg FROM r8 GROUP BY a""".stripMargin
    },
    "q_benford" ->
      """WITH v AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem
        |  WHERE CAST(round(l_extendedprice * 100) AS BIGINT) > 0),
        |o AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INT) AS digit,
        |             CAST(count(*) AS BIGINT) AS n
        |      FROM v GROUP BY 1),
        |d AS (SELECT * FROM (VALUES (1, 301), (2, 176), (3, 125), (4, 97), (5, 79),
        |                            (6, 67), (7, 58), (8, 51), (9, 46)) AS t(digit, expected_pm)),
        |j AS (SELECT d.digit, CAST(coalesce(n, 0) AS BIGINT) AS n,
        |             CAST(expected_pm AS BIGINT) AS expected_pm
        |      FROM d LEFT JOIN o USING (digit)),
        |w AS (SELECT digit, n, expected_pm, CAST(sum(n) OVER () AS BIGINT) AS nn FROM j),
        |e AS (SELECT digit, n, (1000 * n) // greatest(nn, 1) AS observed_pm, expected_pm
        |      FROM w),
        |f AS (SELECT *, observed_pm - expected_pm AS dev_pm FROM e)
        |SELECT digit, n, observed_pm, expected_pm, dev_pm,
        |       CAST(sum(abs(dev_pm)) OVER () AS BIGINT) // 9 AS mad_pm
        |FROM f""".stripMargin,
    "q_cusum" ->
      """WITH b AS (
        |  SELECT ((epoch_us(ts) // 3600000000) - CASE WHEN epoch_us(ts) % 3600000000 < 0 THEN 1 ELSE 0 END) AS bucket,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS nb, CAST(sum(n) AS BIGINT) AS tot FROM b),
        |d AS (SELECT bucket, n, t.nb * n - t.tot AS dev FROM b CROSS JOIN t),
        |c AS (SELECT bucket, n, dev,
        |             CAST(sum(dev) OVER (ORDER BY bucket
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cusum
        |      FROM d)
        |SELECT bucket, n, dev, cusum,
        |       CAST(abs(cusum) = max(abs(cusum)) OVER () AS INT) AS is_peak
        |FROM c""".stripMargin,

    "q_srm" ->
      """WITH a AS (
        |  SELECT CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90 THEN 'train'
        |              WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 95 THEN 'val'
        |              ELSE 'test' END AS arm
        |  FROM documents),
        |c AS (SELECT arm, CAST(count(*) AS BIGINT) AS n FROM a GROUP BY arm),
        |e AS (SELECT * FROM (VALUES ('train', CAST(90 AS BIGINT)),
        |                            ('val', CAST(5 AS BIGINT)),
        |                            ('test', CAST(5 AS BIGINT))) AS t(arm, expected_w)),
        |j AS (SELECT coalesce(e.arm, c.arm) AS arm,
        |             CAST(coalesce(c.n, 0) AS BIGINT) AS n,
        |             CAST(coalesce(e.expected_w, 0) AS BIGINT) AS expected_w
        |      FROM e FULL OUTER JOIN c ON e.arm = c.arm),
        |t2 AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM j)
        |SELECT arm, n, expected_w,
        |       (1000 * expected_w) // 100 AS expected_pm,
        |       (1000 * n) // greatest(tot, 1) AS observed_pm,
        |       n * 100 - expected_w * tot AS dev
        |FROM j CROSS JOIN t2""".stripMargin,

    "q_k_anon" ->
      """SELECT event_type, ((epoch_us(ts) // 3600000000) - CASE WHEN epoch_us(ts) % 3600000000 < 0 THEN 1 ELSE 0 END) AS hour,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1, 2 HAVING count(*) < 5""".stripMargin,

    "q_dist_drift" ->
      """WITH u AS (
        |  SELECT n_chars // 256 AS bucket,
        |         CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS side
        |  FROM documents),
        |c AS (
        |  SELECT bucket,
        |         CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
        |         CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
        |  FROM u GROUP BY bucket),
        |t AS (SELECT CAST(sum(n_ref) AS BIGINT) AS tr, CAST(sum(n_new) AS BIGINT) AS tn FROM c)
        |SELECT bucket, n_ref, n_new,
        |       (1000 * n_ref) // greatest(tr, 1) AS share_ref_pm,
        |       (1000 * n_new) // greatest(tn, 1) AS share_new_pm,
        |       CAST(n_new * tr - n_ref * tn AS BIGINT) AS drift
        |FROM c CROSS JOIN t""".stripMargin,

    "q_cusum_by_key" ->
      """WITH b AS (
        |  SELECT event_type AS key, ((epoch_us(ts) // 3600000000) - CASE WHEN epoch_us(ts) % 3600000000 < 0 THEN 1 ELSE 0 END) AS bucket,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT key, CAST(count(*) AS BIGINT) AS nb, CAST(sum(n) AS BIGINT) AS tot
        |      FROM b GROUP BY key),
        |d AS (SELECT b.key, bucket, n, t.nb * n - t.tot AS dev
        |      FROM b JOIN t USING (key)),
        |c AS (SELECT key, bucket, n, dev,
        |             CAST(sum(dev) OVER (PARTITION BY key ORDER BY bucket
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cusum
        |      FROM d)
        |SELECT key, bucket, n, dev, cusum,
        |       CAST(abs(cusum) = max(abs(cusum)) OVER (PARTITION BY key) AS INT) AS is_peak
        |FROM c""".stripMargin,

    "q_concurrency" ->
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sess AS (
        |  SELECT user_id,
        |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id,
        |         epoch_us(ts) AS us
        |  FROM flagged
        |), iv AS (
        |  SELECT min(us) AS start_us, max(us) AS end_us
        |  FROM sess GROUP BY user_id, session_id
        |)
        |SELECT bucket, count(*) AS n_active FROM (
        |  SELECT unnest(generate_series(((start_us // 3600000000) - CASE WHEN start_us % 3600000000 < 0 THEN 1 ELSE 0 END), ((end_us // 3600000000) - CASE WHEN end_us % 3600000000 < 0 THEN 1 ELSE 0 END))) AS bucket
        |  FROM iv)
        |GROUP BY bucket""".stripMargin,
    "q_profile" ->
      """WITH s AS (SELECT count(*) AS n_rows,
        |  count(l_orderkey) AS c1, count(DISTINCT l_orderkey) AS d1,
        |  CAST(min(l_orderkey) AS VARCHAR) AS mn1, CAST(max(l_orderkey) AS VARCHAR) AS mx1,
        |  count(l_returnflag) AS c2, count(DISTINCT l_returnflag) AS d2,
        |  CAST(min(l_returnflag) AS VARCHAR) AS mn2, CAST(max(l_returnflag) AS VARCHAR) AS mx2,
        |  count(l_linestatus) AS c3, count(DISTINCT l_linestatus) AS d3,
        |  CAST(min(l_linestatus) AS VARCHAR) AS mn3, CAST(max(l_linestatus) AS VARCHAR) AS mx3
        |  FROM lineitem)
        |SELECT 'l_orderkey' AS col_name, n_rows, n_rows - c1 AS n_null, d1 AS n_distinct,
        |       mn1 AS min_str, mx1 AS max_str FROM s
        |UNION ALL
        |SELECT 'l_returnflag', n_rows, n_rows - c2, d2, mn2, mx2 FROM s
        |UNION ALL
        |SELECT 'l_linestatus', n_rows, n_rows - c3, d3, mn3, mx3 FROM s""".stripMargin,
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin,
    "q_skyline" ->
      """WITH p AS (
        |  SELECT DISTINCT CAST(p_size AS BIGINT) AS x,
        |                  CAST(round(p_retailprice * 100) AS BIGINT) AS y
        |  FROM part WHERE p_size IS NOT NULL AND p_retailprice IS NOT NULL)
        |SELECT x, y FROM p a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p b
        |  WHERE b.x <= a.x AND b.y <= a.y AND (b.x < a.x OR b.y < a.y))""".stripMargin,
    "q_range_frame" ->
      """SELECT event_id, user_id,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
        |         PARTITION BY user_id ORDER BY epoch_us(ts)
        |         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS hour_cents
        |FROM events""".stripMargin,
    "q_length_gate" ->
      """WITH s AS (
        |  SELECT lang,
        |         quantile_cont(n_chars, 0.05) AS p5,
        |         quantile_cont(n_chars, 0.95) AS p95
        |  FROM documents GROUP BY lang)
        |SELECT doc_id, d.lang, CAST(n_chars AS BIGINT) AS n_chars
        |FROM documents d JOIN s ON d.lang = s.lang
        |WHERE n_chars >= p5 AND n_chars <= p95""".stripMargin,
    "q_percentiles" ->
      """SELECT event_type,
        |       quantile_cont(CAST(round(value * 100) AS BIGINT), 0.5) AS p50,
        |       quantile_cont(CAST(round(value * 100) AS BIGINT), 0.9) AS p90,
        |       quantile_cont(CAST(round(value * 100) AS BIGINT), 0.99) AS p99
        |FROM events GROUP BY event_type""".stripMargin,
    "q_mixture" ->
      """SELECT doc_id, source FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 <
        |      CASE source WHEN 'src0' THEN 80 WHEN 'src1' THEN 100
        |                  WHEN 'src2' THEN 20 ELSE 50 END""".stripMargin,
    "q_temperature" ->
      raw"""WITH s AS (
           |  SELECT source,
           |         CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
           |  FROM documents GROUP BY source
           |), t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM s)
           |SELECT source, n_tokens,
           |       CAST(n_tokens AS DOUBLE) / total AS share,
           |       sqrt(CAST(n_tokens AS DOUBLE) / total) AS weight,
           |       sqrt(CAST(n_tokens AS DOUBLE) / total) / (CAST(n_tokens AS DOUBLE) / total) AS boost
           |FROM s CROSS JOIN t""".stripMargin,
    "q_pack" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, shard, n_tokens,
        |       (CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |        - n_tokens) // 2000 AS batch_id
        |FROM d""".stripMargin,
    "q_pack_sequences" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 8 AS shard, text,
        |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, shard, text, n_tokens,
        |         (CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |          - n_tokens) // 2000 AS batch_id
        |  FROM d)
        |SELECT shard, batch_id, count(*) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |       string_agg(text, chr(10) ORDER BY doc_id) AS packed_text
        |FROM p GROUP BY shard, batch_id""".stripMargin,
    "q_chunk_pack" ->
      raw"""WITH t AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
           |  FROM documents
           |), ch AS (
           |  SELECT doc_id, toks, len(toks) AS n,
           |         unnest(generate_series(0, CAST(1 + ceil(greatest(len(toks) - 50, 0) / 40.0) AS BIGINT) - 1)) AS chunk_id
           |  FROM t WHERE len(toks) >= 1
           |), c AS (
           |  SELECT doc_id, doc_id % 8 AS shard, chunk_id,
           |         array_to_string(toks[CAST(chunk_id * 40 + 1 AS BIGINT):CAST(chunk_id * 40 + 50 AS BIGINT)], ' ') AS chunk,
           |         CAST(least(n - chunk_id * 40, 50) AS BIGINT) AS n_tokens
           |  FROM ch
           |), p AS (
           |  SELECT shard, doc_id, chunk_id, chunk, n_tokens,
           |         (CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id, chunk_id
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |          - n_tokens) // 500 AS batch_id
           |  FROM c)
           |SELECT shard, batch_id, count(*) AS n_docs,
           |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           |       md5(string_agg(chunk, chr(10) ORDER BY doc_id, chunk_id)) AS packed_md5
           |FROM p GROUP BY shard, batch_id""".stripMargin,
    "q_paths" ->
      """WITH t AS (
        |  SELECT event_type AS s1,
        |         lead(event_type, 1) OVER w AS s2,
        |         lead(event_type, 2) OVER w AS s3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
        |SELECT s1, s2, s3, count(*) AS n
        |FROM t WHERE s3 IS NOT NULL GROUP BY 1, 2, 3""".stripMargin,
    "q_vocab" ->
      """WITH tok AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |  FROM documents),
        |c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
        |r AS (SELECT token, cnt,
        |             row_number() OVER (ORDER BY cnt DESC, token) AS rank
        |      FROM c ORDER BY cnt DESC, token LIMIT 40)
        |SELECT token, cnt, rank,
        |       CAST(sum(cnt) OVER (ORDER BY rank) AS BIGINT) AS cum_cnt
        |FROM r""".stripMargin,
    "q_stratified" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 100""".stripMargin,
    "q_source_cap" ->
      s"""SELECT doc_id, source, n_chars FROM (
        |  SELECT doc_id, source, n_chars,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY length(text) DESC, doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= ${PrepParams.SourceCapMax}""".stripMargin,
    "q_lpa" -> {
      def round(prev: String, cur: String): String =
        s"""$cur AS (
           |  SELECT id, label FROM (
           |    SELECT s.a AS id, l.label, count(*) AS c,
           |           row_number() OVER (PARTITION BY s.a
           |                              ORDER BY count(*) DESC, l.label ASC) AS rn
           |    FROM sym s JOIN $prev l ON s.b = l.id
           |    GROUP BY s.a, l.label) WHERE rn = 1)""".stripMargin
      s"""WITH e0 AS (
         |  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem),
         |sym AS (SELECT src AS a, dst AS b FROM e0 UNION SELECT dst, src FROM e0),
         |l0 AS (SELECT DISTINCT a AS id, a AS label FROM sym),
         |${round("l0", "l1")},
         |${round("l1", "l2")},
         |${round("l2", "l3")}
         |SELECT CAST(id AS BIGINT) AS id, CAST(label AS BIGINT) AS label FROM l3""".stripMargin
    },
    "q_pagerank" ->
      """WITH edges AS (
        |  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem),
        |nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
        |params AS (SELECT 1000000000000 // count(*) AS base FROM nodes),
        |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
        |it0 AS (SELECT nd.id, b.base AS pr FROM nodes nd CROSS JOIN params b),
        |it1 AS (
        |  SELECT nd.id, (15 * b.base) // 100 + (85 * COALESCE(c.s, 0)) // 100 AS pr
        |  FROM nodes nd CROSS JOIN params b
        |  LEFT JOIN (
        |    SELECT e.dst AS id, CAST(SUM(p.pr // d.d) AS BIGINT) AS s
        |    FROM edges e JOIN it0 p ON e.src = p.id JOIN deg d ON e.src = d.src
        |    GROUP BY e.dst) c ON nd.id = c.id),
        |it2 AS (
        |  SELECT nd.id, (15 * b.base) // 100 + (85 * COALESCE(c.s, 0)) // 100 AS pr
        |  FROM nodes nd CROSS JOIN params b
        |  LEFT JOIN (
        |    SELECT e.dst AS id, CAST(SUM(p.pr // d.d) AS BIGINT) AS s
        |    FROM edges e JOIN it1 p ON e.src = p.id JOIN deg d ON e.src = d.src
        |    GROUP BY e.dst) c ON nd.id = c.id),
        |it3 AS (
        |  SELECT nd.id, (15 * b.base) // 100 + (85 * COALESCE(c.s, 0)) // 100 AS pr
        |  FROM nodes nd CROSS JOIN params b
        |  LEFT JOIN (
        |    SELECT e.dst AS id, CAST(SUM(p.pr // d.d) AS BIGINT) AS s
        |    FROM edges e JOIN it2 p ON e.src = p.id JOIN deg d ON e.src = d.src
        |    GROUP BY e.dst) c ON nd.id = c.id)
        |SELECT id, pr FROM it3""".stripMargin,
    "q_trending" ->
      """WITH daily AS (
        |  SELECT user_id AS k, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
        |         count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT max(d) AS t FROM daily),
        |s AS (
        |  SELECT k, CAST(sum(c) AS BIGINT) AS total,
        |         CAST(sum(CASE WHEN t.t - d >= 63 THEN 0
        |                       ELSE c // (CAST(1 AS BIGINT) << CAST(t.t - d AS INT)) END)
        |              AS BIGINT) AS score
        |  FROM daily CROSS JOIN t GROUP BY k)
        |SELECT k AS user_id, total, score,
        |       CAST(row_number() OVER (ORDER BY score DESC, k) AS INTEGER) AS rank
        |FROM s ORDER BY score DESC, k LIMIT 25""".stripMargin,
    "q_copurchase" ->
      """WITH p AS (
        |  SELECT DISTINCT a.l_orderkey AS o, a.l_partkey AS pa, b.l_partkey AS pb
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |pc AS (SELECT pa, pb, count(*) AS cnt FROM p GROUP BY 1, 2),
        |ic AS (SELECT l_partkey AS it, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS c
        |       FROM lineitem GROUP BY 1),
        |nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM lineitem),
        |top AS (
        |  SELECT pa, pb, CAST(cnt AS BIGINT) AS cnt,
        |         CAST(row_number() OVER (ORDER BY cnt DESC, pa, pb) AS INTEGER) AS rank
        |  FROM pc ORDER BY cnt DESC, pa, pb LIMIT 25)
        |SELECT t.pa AS part_a, t.pb AS part_b, t.cnt, t.rank,
        |       (1000 * t.cnt) // ca.c AS conf_a_pm,
        |       (1000 * t.cnt * nb.n) // (ca.c * cb.c) AS lift_pm
        |FROM top t
        |JOIN ic ca ON ca.it = t.pa
        |JOIN ic cb ON cb.it = t.pb
        |CROSS JOIN nb""".stripMargin,
    "q_khop" ->
      """WITH e0 AS (
        |  SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem),
        |edges AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)),
        |nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
        |f0 AS (SELECT id FROM nodes WHERE id IN (
        |         SELECT DISTINCT s_suppkey * 2 + 1 FROM supplier WHERE s_suppkey % 5 = 0)),
        |r0 AS (SELECT id FROM f0),
        |f1 AS (SELECT DISTINCT e.dst AS id FROM edges e JOIN f0 ON e.src = f0.id
        |       WHERE e.dst NOT IN (SELECT id FROM r0)),
        |r1 AS (SELECT id FROM r0 UNION SELECT id FROM f1),
        |f2 AS (SELECT DISTINCT e.dst AS id FROM edges e JOIN f1 ON e.src = f1.id
        |       WHERE e.dst NOT IN (SELECT id FROM r1)),
        |r2 AS (SELECT id FROM r1 UNION SELECT id FROM f2),
        |f3 AS (SELECT DISTINCT e.dst AS id FROM edges e JOIN f2 ON e.src = f2.id
        |       WHERE e.dst NOT IN (SELECT id FROM r2)),
        |r3 AS (SELECT id FROM r2 UNION SELECT id FROM f3)
        |SELECT CAST(0 AS BIGINT) AS hop, (SELECT count(*) FROM f0) AS frontier_n,
        |       (SELECT count(*) FROM r0) AS reached_n
        |UNION ALL SELECT 1, (SELECT count(*) FROM f1), (SELECT count(*) FROM r1)
        |UNION ALL SELECT 2, (SELECT count(*) FROM f2), (SELECT count(*) FROM r2)
        |UNION ALL SELECT 3, (SELECT count(*) FROM f3), (SELECT count(*) FROM r3)""".stripMargin,
    "q_quantile_norm" ->
      """SELECT doc_id, source, n_chars,
        |       CAST(CASE WHEN n = 1 THEN 0
        |                 ELSE ((rk - 1) * 1000) // (n - 1) END AS BIGINT) AS pct_pm
        |FROM (SELECT doc_id, source, n_chars,
        |             row_number() OVER (PARTITION BY source
        |                                ORDER BY n_chars, doc_id) AS rk,
        |             count(*) OVER (PARTITION BY source) AS n
        |      FROM documents)""".stripMargin,
    "q_winsorize" ->
      """WITH v AS (
        |  SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS value_cents
        |  FROM events
        |), r AS (
        |  SELECT event_type, value_cents,
        |         row_number() OVER (PARTITION BY event_type ORDER BY value_cents) AS rk,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM v
        |), cuts AS (
        |  SELECT event_type,
        |         CAST(min(CASE WHEN rk = greatest((n * 50 + 999) // 1000, 1)
        |                       THEN value_cents END) AS BIGINT) AS lo_cut,
        |         CAST(min(CASE WHEN rk = greatest((n * 950 + 999) // 1000, 1)
        |                       THEN value_cents END) AS BIGINT) AS hi_cut
        |  FROM r GROUP BY event_type
        |)
        |SELECT event_id, event_type, value_cents, lo_cut, hi_cut,
        |       least(greatest(value_cents, lo_cut), hi_cut) AS winsorized
        |FROM v JOIN cuts USING (event_type)""".stripMargin,
    "q_block_jackknife" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 32 AS b,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sb,
        |         count(*) AS nb
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT g, b, sb, nb,
        |             CAST(sum(sb) OVER (PARTITION BY g) AS BIGINT) AS s,
        |             CAST(sum(nb) OVER (PARTITION BY g) AS BIGINT) AS n FROM b)
        |SELECT g AS event_type, max(n) AS n, CAST(max(s // n) AS BIGINT) AS mean,
        |       CAST(min(CASE WHEN n = nb THEN NULL
        |                     ELSE (s - sb) // (n - nb) END) AS BIGINT) AS lo,
        |       CAST(max(CASE WHEN n = nb THEN NULL
        |                     ELSE (s - sb) // (n - nb) END) AS BIGINT) AS hi
        |FROM t GROUP BY g""".stripMargin,
    "q_trustrank" ->
      """WITH e0 AS (
        |  SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem),
        |edges AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)),
        |nodes0 AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
        |sd AS (SELECT DISTINCT s_suppkey * 2 + 1 AS id FROM supplier
        |       WHERE s_suppkey % 5 = 0),
        |nodes AS (
        |  SELECT n.id, CASE WHEN s.id IS NULL THEN 0 ELSE 1 END AS seed
        |  FROM nodes0 n LEFT JOIN sd s ON n.id = s.id),
        |params AS (SELECT 1000000000000 // CAST(sum(seed) AS BIGINT) AS base FROM nodes),
        |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
        |it0 AS (SELECT nd.id, nd.seed * b.base AS pr FROM nodes nd CROSS JOIN params b),
        |it1 AS (
        |  SELECT nd.id, nd.seed * ((15 * b.base) // 100) + (85 * COALESCE(c.s, 0)) // 100 AS pr
        |  FROM nodes nd CROSS JOIN params b
        |  LEFT JOIN (
        |    SELECT e.dst AS id, CAST(SUM(p.pr // d.d) AS BIGINT) AS s
        |    FROM edges e JOIN it0 p ON e.src = p.id JOIN deg d ON e.src = d.src
        |    GROUP BY e.dst) c ON nd.id = c.id),
        |it2 AS (
        |  SELECT nd.id, nd.seed * ((15 * b.base) // 100) + (85 * COALESCE(c.s, 0)) // 100 AS pr
        |  FROM nodes nd CROSS JOIN params b
        |  LEFT JOIN (
        |    SELECT e.dst AS id, CAST(SUM(p.pr // d.d) AS BIGINT) AS s
        |    FROM edges e JOIN it1 p ON e.src = p.id JOIN deg d ON e.src = d.src
        |    GROUP BY e.dst) c ON nd.id = c.id),
        |it3 AS (
        |  SELECT nd.id, nd.seed * ((15 * b.base) // 100) + (85 * COALESCE(c.s, 0)) // 100 AS pr
        |  FROM nodes nd CROSS JOIN params b
        |  LEFT JOIN (
        |    SELECT e.dst AS id, CAST(SUM(p.pr // d.d) AS BIGINT) AS s
        |    FROM edges e JOIN it2 p ON e.src = p.id JOIN deg d ON e.src = d.src
        |    GROUP BY e.dst) c ON nd.id = c.id)
        |SELECT id, pr FROM it3""".stripMargin,
    "q_json_shred" ->
      """SELECT l_orderkey AS o_orderkey, l_partkey AS partkey,
        |       CAST(l_quantity AS BIGINT) AS qty
        |FROM lineitem""".stripMargin,
    "q_mad_outliers" ->
      """WITH b AS (
        |  SELECT event_id, event_type,
        |         CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events),
        |m AS (SELECT event_type, median(CAST(v AS DOUBLE)) AS med FROM b GROUP BY 1),
        |wm AS (SELECT b.event_id, b.event_type, b.v, m.med FROM b JOIN m USING (event_type)),
        |d AS (SELECT event_type, median(abs(CAST(v AS DOUBLE) - med)) AS mad
        |      FROM wm GROUP BY 1)
        |SELECT wm.event_id, wm.event_type, CAST(wm.v AS BIGINT) AS value
        |FROM wm JOIN d USING (event_type)
        |WHERE abs(CAST(wm.v AS DOUBLE) - wm.med) > 3.0 * d.mad""".stripMargin,
    "q_unimax" ->
      s"""$unimaxAllocCte
         |SELECT lang, tokens, capacity, capped, alloc,
         |       (alloc * 1000) // greatest(tokens, 1) AS epochs_milli
         |FROM alloc""".stripMargin,
    "q_unimax_sample" ->
      s"""$unimaxAllocCte,
         |d AS (
         |  SELECT doc_id, lang,
         |         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT d.doc_id, d.lang, d.n_tokens, a.tokens, a.alloc,
         |         CAST(sum(d.n_tokens) OVER (
         |           PARTITION BY d.lang
         |           ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
         |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM d JOIN alloc a ON d.lang = a.lang)
         |SELECT doc_id, lang, n_tokens,
         |       (alloc // greatest(tokens, 1)) +
         |       CASE WHEN cum - n_tokens < (alloc % greatest(tokens, 1))
         |            THEN 1 ELSE 0 END AS copies
         |FROM c
         |WHERE (alloc // greatest(tokens, 1)) +
         |      CASE WHEN cum - n_tokens < (alloc % greatest(tokens, 1))
         |           THEN 1 ELSE 0 END >= 1""".stripMargin
  )

  /** Full UniMax replay ([[graft.text.UniMax.allocate]]): per-language
    * token counts, relative budget, funded-prefix test, and the
    * integer fair-share split with its mod-remainder on the last
    * budget-bound languages — bit-for-bit the Spark windows. */
  /** qlog64 (NaiveBayes.qlog64) replayed in DuckDB: bit-length +
    * linear-mantissa chord, all-integer (same macro as TextQueries). */
  private def qlogSql(x: String): String =
    s"64 * (length(bin($x)) - 1) + " +
      s"CAST(floor(($x * 64) / pow(2, length(bin($x)) - 1)) AS BIGINT) - 64"

  private lazy val unimaxAllocCte: String = {
    val (num, den, em) = (PrepParams.UnimaxBudgetNum, PrepParams.UnimaxBudgetDen,
      PrepParams.UnimaxEpochsMilli)
    raw"""WITH s AS (
         |  SELECT lang,
         |         CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS tokens
         |  FROM documents GROUP BY lang),
         |t AS (SELECT CAST(sum(tokens) AS BIGINT) AS total FROM s),
         |b AS (
         |  SELECT lang, tokens, (tokens * $em) // 1000 AS capacity,
         |         (total * $num) // $den AS B
         |  FROM s CROSS JOIN t),
         |$unimaxChainCtes""".stripMargin
  }

  /** The allocation chain from a `b` CTE (lang, tokens, capacity, B)
    * to the `alloc` CTE — shared with the cluster-balanced sampler,
    * whose `b` derives from IVF cell sizes instead of language token
    * counts. */
  private[graft] lazy val unimaxChainCtes: String =
    raw"""f AS (
         |  SELECT lang, tokens, capacity, B,
         |         row_number() OVER (ORDER BY capacity, lang) AS idx,
         |         CAST(sum(capacity) OVER (ORDER BY capacity, lang
         |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         |         count(*) OVER () AS n
         |  FROM b),
         |g AS (
         |  SELECT *, CASE WHEN capacity * (n - idx + 1) <= B - (cum - capacity)
         |                 THEN 1 ELSE 0 END AS flag
         |  FROM f),
         |h AS (
         |  SELECT *, min(flag) OVER (ORDER BY capacity, lang
         |              ROWS UNBOUNDED PRECEDING) = 1 AS capped
         |  FROM g),
         |i AS (
         |  SELECT *,
         |    CAST(sum(CASE WHEN capped THEN capacity ELSE 0 END) OVER () AS BIGINT) AS cap_mass,
         |    CAST(sum(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS BIGINT) AS ncap
         |  FROM h),
         |alloc AS (
         |  SELECT lang, tokens, capacity, capped,
         |         CASE WHEN capped THEN capacity ELSE
         |           (B - cap_mass) // greatest(n - ncap, 1) +
         |           CASE WHEN (idx - ncap) >
         |                     ((n - ncap) - ((B - cap_mass) % greatest(n - ncap, 1)))
         |                THEN 1 ELSE 0 END
         |         END AS alloc
         |  FROM i)""".stripMargin
}
