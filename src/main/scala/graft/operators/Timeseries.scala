package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series reshaping operators: regular-grid resampling with
  * forward fill, state-transition counting, and interval-overlap
  * (concurrency) aggregation. The reference (shmr) leaves these to
  * driver-side glue over `map`/`reduce_by_key`; here each is a single
  * declarative plan.
  *
  * Scale notes: all three shuffle once on the entity key (or the
  * bucket). Grid densification explodes at most (span / step) rows per
  * key — bounded and predictable, unlike a global sweep-line sort
  * which would funnel 100 TB of interval endpoints through one ordered
  * partition. Forward fill is a window `last(ignoreNulls)` over the
  * same key partitioning Catalyst already shuffled for the grid join,
  * so the exchange is reused.
  */
object Timeseries {

  /** Floor-division bucket floor(us / stepUs) in pure 64-bit integer
    * arithmetic: truncating `div` nudged down one when a negative ts
    * leaves a remainder. Exact at EVERY long magnitude (the previous
    * floor(double) form drifted past 2^53) and engine-portable — the
    * oracle replays it as
    * `(us // step) - CASE WHEN us % step < 0 THEN 1 ELSE 0 END`
    * (DuckDB `//` truncates toward zero exactly like Spark's `div`).
    * `usCol` must be a resolvable column NAME (the `div` operator is
    * only reachable through SQL text). */
  private[operators] def floorBucket(usCol: String, stepUs: Long): Column = {
    require(stepUs > 0, "stepUs must be positive")
    expr(s"($usCol div ${stepUs}L) - (CASE WHEN $usCol % ${stepUs}L < 0 THEN 1 ELSE 0 END)")
  }

  implicit class TimeseriesOps(private val df: DataFrame) extends AnyVal {

    /** Half-life-decayed activity counts — trending detection: each
      * key's events weighted by recency with a one-day-grain
      * half-life, `score = Σ_d count_d div 2^(T−d)` where T is the
      * corpus's latest day. Yesterday counts half of today, an event
      * older than 62 days counts 0 — exact integer arithmetic
      * (power-of-two decay = a shift, no transcendental), so scores
      * replay bit-for-bit and a key's "recent surge vs all-time
      * volume" contrast (score vs total) is engine-stable.
      *
      * Scale shape: one (key, day) count aggregate, then per key the
      * ≤ calendar-span day rows fold IN-ROW (collect_list bounded by
      * days, never by events); the global latest day is a broadcast
      * 1-row aggregate. Output: (key, total, score). */
    def decayedCounts(key: Column, dayCol: Column): DataFrame = {
      val daily = df.groupBy(key.as("k"), datediff(dayCol, lit("1970-01-01")).as("d"))
        .agg(count(lit(1)).as("c"))
      val latest = daily.agg(max("d").as("t"))
      daily.groupBy("k")
        .agg(sum("c").as("total"), collect_list(struct(col("d"), col("c"))).as("ds"))
        .crossJoin(broadcast(latest))
        .withColumn("score", expr(
          "aggregate(ds, CAST(0 AS BIGINT), (acc, x) -> acc + " +
            "CASE WHEN t - x.d >= 63 THEN CAST(0 AS BIGINT) " +
            "ELSE x.c div shiftleft(CAST(1 AS BIGINT), CAST(t - x.d AS INT)) END)"))
        .select(col("k"), col("total"), col("score"))
    }

    /** Resample to a regular `stepUs` grid per key and forward-fill.
      *
      * Buckets run from each key's first to last observation. Within a
      * bucket the value of the LATEST observation wins (latest by
      * (tsUs, tieBreak) — supply a unique tie-break column so the
      * reduction is shuffle-order independent); empty buckets carry
      * the previous bucket's value forward. Output: (key, bucket,
      * value) with `bucket` = floor(epoch-µs / stepUs).
      *
      * Plan shape: one hash aggregate per (key, bucket) [max over a
      * struct — partial map-side combine], one per-key min/max
      * aggregate + `sequence` explode for the grid, a shuffle join of
      * grid to observations on (key, bucket), then the forward-fill
      * window on the key. All post-aggregate stages share the key
      * hash partitioning.
      */
    def gapFill(key: Column, tsUs: Column, tieBreak: Column, value: Column,
        stepUs: Long): DataFrame = {
      val obs = df
        .select(key.as("__k"), tsUs.as("__us"), tieBreak.as("__tb"), value.as("__v"))
        .withColumn("bucket", floorBucket("__us", stepUs))
        .groupBy(col("__k"), col("bucket"))
        .agg(max(struct(col("__us"), col("__tb"), col("__v"))).getField("__v").as("__obs"))
      val grid = df
        .select(key.as("__k"), tsUs.as("__us"))
        .select(col("__k"), floorBucket("__us", stepUs).as("__b"))
        .groupBy(col("__k"))
        .agg(min(col("__b")).as("__lo"), max(col("__b")).as("__hi"))
        .select(col("__k"), explode(sequence(col("__lo"), col("__hi"))).as("bucket"))
      val filled = grid.join(obs, Seq("__k", "bucket"), "left")
        .withColumn("value",
          last(col("__obs"), ignoreNulls = true)
            .over(Window.partitionBy(col("__k")).orderBy(col("bucket"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      filled.select(col("__k").as("key"), col("bucket"), col("value"))
    }

    /** Count (state → next-state) transitions per key, ordered by
      * `order` within the key. The classic Markov-chain / clickstream
      * building block. One shuffle on the key for the `lead` window,
      * then a hash aggregate on the (from, to) pair. */
    def transitions(key: Column, order: Seq[Column], state: Column): DataFrame = {
      val w = Window.partitionBy(key).orderBy(order: _*)
      df.select(state.as("from_state"), lead(state, 1).over(w).as("to_state"))
        .filter(col("to_state").isNotNull)
        .groupBy(col("from_state"), col("to_state"))
        .agg(count(lit(1)).as("n"))
    }

    /** Count length-`k` state paths (k-grams) per key — the
      * generalization of [[transitions]] to longer clickstream /
      * session paths. One shuffle on the key serves all k−1 `lead`
      * windows (same partitioning + ordering), then one hash aggregate
      * on the path tuple. Output columns s1..sk, n. */
    def pathKGrams(key: Column, order: Seq[Column], state: Column, k: Int): DataFrame = {
      require(k >= 2)
      val w = Window.partitionBy(key).orderBy(order: _*)
      val cols = (1 to k).map(i =>
        (if (i == 1) state else lead(state, i - 1).over(w)).as(s"s$i"))
      df.select(cols: _*)
        .filter(col(s"s$k").isNotNull)
        .groupBy((1 to k).map(i => col(s"s$i")): _*)
        .agg(count(lit(1)).as("n"))
    }

    /** Interval-overlap count: how many [startUs, endUs] intervals
      * overlap each `stepUs` bucket. Each interval explodes into the
      * buckets it covers (inclusive on both ends), then one hash
      * aggregate per bucket — explode factor is bounded by
      * interval-length / step, so no global ordered sweep is needed.
      * Intervals with end < start are dropped. */
    def concurrency(startUs: Column, endUs: Column, stepUs: Long): DataFrame =
      df.filter(endUs >= startUs)
        .select(startUs.as("__s"), endUs.as("__e"))
        .select(explode(sequence(
          floorBucket("__s", stepUs), floorBucket("__e", stepUs))).as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_active"))

    /** CUSUM changepoint scan over event-count buckets (Page 1954):
      * bucket the stream, then track the cumulative deviation of each
      * bucket's count from the global mean — a sustained rate shift
      * drives |cusum| to its extremum AT the changepoint, which
      * single-bucket noise cannot. Division-free: with B buckets and
      * T total events, dev_b = B·n_b − T (sums to zero), so cusum is
      * exact integer arithmetic and the peak flag is exact.
      *
      * Plan shape: one hash aggregate per bucket (map-side combined),
      * then ALL remaining work — totals, running sum, peak — runs
      * over the ≤ B bucket rows (time-span/step, corpus-size-
      * independent): a broadcast totals join and one ordered window
      * over those B rows. Output: (bucket, n, dev, cusum, is_peak).
      */
    /** Per-key [[cusumDrift]]: each key gets its own B/T baseline and
      * cusum track — "which SOURCE'S rate shifted, and when" for a
      * crawl monitor. One (key, bucket) aggregate over the stream,
      * then per-key totals (join keyed on the same hash) and the
      * per-key ordered window over that key's ≤ B bucket rows — no
      * single-partition funnel anywhere. */
    def cusumDriftBy(key: Column, tsUs: Column, stepUs: Long): DataFrame = {
      val buckets = df
        .select(key.as("key"), tsUs.as("__us"))
        .select(col("key"), floorBucket("__us", stepUs).as("bucket"))
        .groupBy("key", "bucket").agg(count(lit(1)).as("n"))
      val totals = buckets.groupBy("key")
        .agg(count(lit(1)).as("__b"), sum("n").as("__t"))
      val w = Window.partitionBy("key").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy("key")
      buckets.join(totals, "key")
        .withColumn("dev", col("__b") * col("n") - col("__t"))
        .withColumn("cusum", sum("dev").over(w))
        .withColumn("is_peak",
          (abs(col("cusum")) === max(abs(col("cusum"))).over(wAll)).cast("int"))
        .select("key", "bucket", "n", "dev", "cusum", "is_peak")
    }

    def cusumDrift(tsUs: Column, stepUs: Long): DataFrame = {
      val buckets = df
        .select(tsUs.as("__us"))
        .select(floorBucket("__us", stepUs).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
      val totals = buckets.agg(
        count(lit(1)).as("__b"), sum("n").as("__t"))
      val dev = buckets.crossJoin(broadcast(totals))
        .withColumn("dev", col("__b") * col("n") - col("__t"))
      val w = Window.partitionBy(lit(0)).orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy(lit(0))
      dev
        .withColumn("cusum", sum("dev").over(w))
        .withColumn("is_peak",
          (abs(col("cusum")) === max(abs(col("cusum"))).over(wAll)).cast("int"))
        .select("bucket", "n", "dev", "cusum", "is_peak")
    }
  }

  /** Time-weighted average per key — the metric a plain mean gets
    * wrong whenever observations are irregularly spaced (a sensor
    * that reports MORE when the value is high biases the mean up;
    * TWAP weights each observation by how long it was current):
    * each observation holds from its timestamp to the next one's, so
    * twap = Σ vᵢ·(tᵢ₊₁ − tᵢ) / Σ (tᵢ₊₁ − tᵢ) over the key's ordered
    * stream, the last observation contributing nothing (its holding
    * period is unobserved). Emitted as exact integers — twap_num /
    * twap_den (value must be integral, e.g. cents) and twap_milli =
    * (1000·num) div den, NULL when the span is empty (a single
    * observation, or every timestamp equal). Equal-timestamp
    * neighbors: the stream is ordered (ts, value), so all but the
    * value-largest of an instant hold for dt = 0 and the largest
    * carries the gap to the next instant — a stated, deterministic
    * tiebreak the oracle replays, not an engine accident.
    *
    * Scale shape: ONE key-keyed exchange — the lead() window and the
    * per-key aggregate share the hash-on-key distribution; output is
    * key-sized. Integer bound: Σ v·dt ≤ 2⁶³ — cents × µs spans
    * overflow a long past ~10⁶ value·years per key; pre-scale dt to
    * ms or value to whole units, documented not silent. */
  def timeWeightedAvg(df: DataFrame, key: Column, tsUs: Column,
      value: Column): DataFrame = {
    val byK = Window.partitionBy("__k").orderBy(col("__us").asc, col("__v").asc)
    df.select(key.as("__k"), tsUs.cast("long").as("__us"), value.cast("long").as("__v"))
      .withColumn("__dt", lead(col("__us"), 1).over(byK) - col("__us"))
      .groupBy(col("__k").as("key"))
      .agg(
        count(lit(1)).as("n_obs"),
        (max("__us") - min("__us")).as("span_us"),
        sum(col("__v") * coalesce(col("__dt"), lit(0L))).as("twap_num"),
        sum(coalesce(col("__dt"), lit(0L))).as("twap_den"))
      .withColumn("twap_milli",
        when(col("twap_den") === 0, lit(null).cast("long"))
          // split form: (n div d)·1000 + ((n mod d)·1000) div d — no
          // intermediate exceeds the result (num·1000 overflows a long
          // on µs·cents sums; the priorityExact precedent)
          .otherwise(expr(
            "(twap_num div twap_den) * 1000 + ((twap_num % twap_den) * 1000) div twap_den")))
  }

  /** Exact integer EWMA per key — exponential smoothing with
    * α = 2^−halfShift, the classic "current level" estimate for
    * irregular keyed streams (sensor baselines, per-user spend level):
    * s₀ = x₀, sₜ = sₜ₋₁ + ⌊(xₜ − sₜ₋₁) / 2^halfShift⌋ over the key's
    * (ts, value)-ordered observations. The power-of-two α makes every
    * step an exact integer FLOOR division (computed as
    * (δ − pmod(δ, 2^s)) div 2^s — portable: Spark's `div` truncates
    * toward zero while other engines floor, and the two disagree on
    * negative deltas; subtracting the positive mod first makes the
    * dividend exact so truncation ≡ floor), so the whole trajectory
    * replays bit-for-bit in any engine. Equal-(ts, value) neighbors
    * fold identical values — order among full duplicates is
    * immaterial, the stated total order covers everything else.
    *
    * Scale shape: ONE key-keyed exchange; the fold is a per-key HOF
    * over the collected (ts, value) sequence, so per-key history must
    * fit a task. `maxObs` is the loud guard on that contract: a key
    * with more observations fails the job with a message naming the
    * key and the windowed-decay alternative (22ae3's trending counts)
    * instead of silently OOMing an executor. The check runs after the
    * key's sequence is gathered, so it catches the common 10–100×
    * overshoot cleanly; a key too large to even gather still dies
    * inside Spark's own memory accounting — set maxObs from the
    * entity-lifetime bound you actually expect, not from executor
    * memory. Returns (key, n_obs, ewma). */
  def ewmaByKey(df: DataFrame, key: Column, tsUs: Column, value: Column,
      halfShift: Int, maxObs: Int = 1 << 20): DataFrame = {
    require(halfShift >= 1 && halfShift <= 32, "halfShift must be in [1, 32]")
    require(maxObs >= 1, "maxObs must be positive")
    val d = 1L << halfShift
    val fold =
      s"aggregate(slice(__seq, 2, greatest(size(__seq) - 1, 0)), __seq[0].__v, " +
        s"(acc, e) -> acc + (e.__v - acc - (((e.__v - acc) % ${d}L + ${d}L) % ${d}L)) div ${d}L)"
    df.select(key.as("key"), tsUs.cast("long").as("__ts"), value.cast("long").as("__v"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_obs"),
        expr("sort_array(collect_list(struct(__ts, __v)))").as("__seq"))
      // the guard lives INSIDE the ewma expression so column pruning
      // can never drop it: the hot branch raises, the sane branch folds
      .withColumn("ewma", when(col("n_obs") > maxObs,
        raise_error(concat(
          lit("ewmaByKey: key "), col("key").cast("string"),
          lit(" has "), col("n_obs").cast("string"),
          lit(s" observations (> maxObs = $maxObs); per-key history must fit a task" +
            " — use the windowed decay form (Timeseries.decayedCounts, SURVEY 22ae3)" +
            " for unbounded keys, or raise maxObs deliberately"))).cast("long"))
        .otherwise(expr(fold)))
      .select(col("key"), col("n_obs"), col("ewma"))
  }

  /** Kaplan–Meier survival estimator (Kaplan & Meier 1958) over an
    * event log — "what share of users is still active after t
    * buckets?" with the censoring done right: a user whose last event
    * sits within `censorWindowUs` of the corpus horizon has NOT been
    * observed to churn and only contributes to the at-risk counts,
    * the error every naive retention query makes. Per user: lifetime
    * = (last − first) in `bucketUs` buckets, churned iff the horizon
    * is ≥ censorWindowUs past their last event. Per distinct
    * lifetime t: n_risk = users with lifetime ≥ t, n_churn /
    * n_censored leaving at t, and the product-limit survival
    * Ŝ(t) = Π_{t'≤t} (1 − d/n) carried EXACTLY as the qlog64 sum
    * km_q64 = Σ qlog64(n−d) − qlog64(n) (64 units = 1 bit of decay;
    * the float product is one pow(2, km_q64/64) away, applied by the
    * consumer so no cross-engine pow enters the gate). Ŝ hits exact
    * zero only when everyone still at risk churns at one t — only
    * possible at the maximum lifetime — reported as NULL (log 0).
    *
    * Scale shape: one user-keyed aggregate (map-side partial min/max)
    * collapses the corpus to one row per user; the lifetime table is
    * ≤ span/bucket rows, so the two cumulative windows run on a
    * deliberately single-partition frame that is bounded by the time
    * span, never by the corpus. Horizon is a 1-row broadcast. */
  def kaplanMeier(df: DataFrame, id: Column, tsUs: Column,
      censorWindowUs: Long, bucketUs: Long = 86400000000L): DataFrame = {
    require(censorWindowUs >= 0, "censorWindowUs must be non-negative")
    require(bucketUs > 0, "bucketUs must be positive")
    val q = graft.quality.NaiveBayes.qlog64 _
    val spans = df.groupBy(id.as("__id"))
      .agg(min(tsUs).as("__first"), max(tsUs).as("__last"))
    val horizon = spans.agg(max("__last").as("__h"))
    val perUser = spans.crossJoin(broadcast(horizon))
      .withColumn("__lt", col("__last") - col("__first"))
      .withColumn("t", expr(s"__lt div ${bucketUs}L"))
      .withColumn("__obs",
        (col("__h") - col("__last") >= censorWindowUs).cast("long"))
    val tbl = perUser.groupBy("t").agg(
      sum("__obs").as("n_churn"),
      sum(lit(1L) - col("__obs")).as("n_censored"))
    val wDesc = Window.partitionBy(lit(0)).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAsc = Window.partitionBy(lit(0)).orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    tbl
      .withColumn("n_risk", sum(col("n_churn") + col("n_censored")).over(wDesc))
      .withColumn("__step",
        when(col("n_churn") === col("n_risk"), lit(null).cast("long"))
          .otherwise(q(col("n_risk") - col("n_churn")) - q(col("n_risk"))))
      .withColumn("__dead",
        max((col("n_churn") === col("n_risk")).cast("int")).over(wAsc))
      .withColumn("km_q64",
        when(col("__dead") === 1, lit(null).cast("long"))
          .otherwise(sum("__step").over(wAsc)))
      .select("t", "n_risk", "n_churn", "n_censored", "km_q64")
  }
}
