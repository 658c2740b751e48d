package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic operators beyond the shmr surface — the pieces a user of
  * the reference would otherwise hand-roll with `reduce_by_key` +
  * driver-side glue (reference shmr has no window/rollup/session
  * support; see SURVEY.md §2.2).
  *
  * Scale notes: every operator here is a single declarative plan —
  * top-k per group is one shuffle on the partition keys; global top-k
  * plans as TakeOrderedAndProject (per-partition heap + merge, no
  * full sort); sessionization is one shuffle on the user key with two
  * window passes over the same partitioning (Catalyst reuses the
  * exchange).
  */
object Relational {

  implicit class RelationalOps(private val df: DataFrame) extends AnyVal {

    /** Top-k rows per group, deterministic via explicit ordering. */
    def topKPerGroup(partitionKeys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
      val w = Window.partitionBy(partitionKeys: _*).orderBy(order: _*)
      df.withColumn("__graft_rn", row_number().over(w))
        .filter(col("__graft_rn") <= k)
        .drop("__graft_rn")
    }

    /** Global top-k (TakeOrderedAndProject — no full sort at scale). */
    def topK(k: Int, order: Column*): DataFrame = df.orderBy(order: _*).limit(k)

    /** Deterministic hash sample: keep rows whose md5-bucket of `key`
      * falls below `pct` (out of 100). Unlike `df.sample`, the result
      * is a pure function of the key — stable across runs, engines,
      * partitionings, and re-executions after failures, which is what
      * a reproducible training-data subset requires. Use an integral
      * or string key (floating-point keys stringify differently across
      * engines). */
    def sampleByHash(key: Column, pct: Int): DataFrame = {
      require(pct >= 0 && pct <= 100)
      df.filter(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % 100 < pct)
    }

    /** Weighted mixture sampling: keep each row with a per-source
      * probability (`rates`, percent; `defaultPct` for unlisted
      * sources) decided by the row's md5 bucket — the deterministic
      * "upsample wiki, downsample crawl" source-mixing step of a
      * training-data recipe. Pure function of (source, id): stable
      * across runs/engines/partitionings, no shuffle at all (a scan
      * filter that pushes past column pruning). Rates map is compiled
      * into a when-chain — fine for the usual handful of sources;
      * broadcast-join a rates table instead if sources number in the
      * thousands. */
    def mixtureSample(sourceCol: Column, id: Column, rates: Map[String, Int],
        defaultPct: Int = 0): DataFrame = {
      require((rates.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100))
      val bucket = conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % 100
      val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
        case (acc, (s, p)) => when(sourceCol === s, lit(p)).otherwise(acc)
      }
      df.filter(bucket < rate)
    }

    /** Deterministic stratified sample: at most `nPerClass` rows per
      * class, selected by md5(id) order — a pure function of the data,
      * so the same balanced subset comes back across runs, engines,
      * partitionings, and failure re-executions (class-imbalance
      * correction for training sets; cf. [[sampleByHash]] for the
      * unstratified rate version). One shuffle on the class key; the
      * per-class ranking is a bounded window scan, and skewed giant
      * classes stream through it without materializing (row_number
      * needs no buffering beyond the sort run). */
    def stratifiedSample(classCol: Column, id: Column, nPerClass: Int): DataFrame = {
      val w = Window.partitionBy(classCol).orderBy(md5(id.cast("string")).asc, id.asc)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= nPerClass)
        .drop("__rn")
    }

    /** Per-group quantile normalization: map each row's score to its
      * within-group rank position in exact integer per-mille —
      * `pct_pm = ⌊1000·(rank−1)/(n−1)⌋` with rank from a total
      * (score, id) order. The score-equalization step before fusing
      * heterogeneous sources under ONE threshold: perplexity from
      * different domains isn't comparable raw, its within-source
      * quantile is. Cost: one rank window per group (each group
      * sorts within its partitions — groups are sources, so the
      * partitioning is as wide as the source list; for truly giant
      * single groups the t-digest sketch is the approximate
      * alternative). Singleton groups pin to 0. */
    def quantileNormalize(group: Column, score: Column, id: Column): DataFrame = {
      val w = Window.partitionBy(group).orderBy(score.asc, id.asc)
      val cw = Window.partitionBy(group)
      df.withColumn("__rk", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(cw))
        .withColumn("pct_pm",
          when(col("__n") === 1, lit(0L))
            .otherwise(expr("((__rk - 1) * 1000) div (__n - 1)")))
        .drop("__rk", "__n")
    }

    /** Winsorization: clamp an integral `value` to the nearest-rank
      * [loPerMille, hiPerMille] percentiles of ITS group — the
      * standard robust-prep step before means/OLS on heavy-tailed
      * metrics (clipping, unlike dropping, keeps n and the row set
      * stable). Nearest-rank (type-1) cutoffs — the value at rank
      * max(1, ceil(p·n/1000)) under value order — are exact integers:
      * the value AT a rank is well-defined under ties no matter how
      * row identities break them, so the whole operator replays
      * bit-for-bit with no interpolation float. Emits the input
      * columns + `lo_cut`/`hi_cut`/`winsorized`.
      *
      * Scale shape: one group-keyed window pass ranks values; the two
      * cutoff rows per group collapse to a group-sized frame that
      * joins back broadcast — the corpus stream is never shuffled a
      * second time. */
    def winsorize(group: Column, value: Column,
        loPerMille: Long, hiPerMille: Long): DataFrame = {
      require(0 <= loPerMille && loPerMille <= hiPerMille && hiPerMille <= 1000)
      val byG = Window.partitionBy("__g")
      // NULL values never enter the rank order (n and the cutoff ranks
      // count non-null values only — Spark ranks NULLS FIRST while the
      // oracle ranks NULLS LAST, so letting them rank would shift the
      // cutoffs engine-dependently) and winsorize to NULL below
      val cuts = df.select(group.as("__g"), value.cast("long").as("__v"))
        .filter(col("__v").isNotNull)
        .withColumn("__rk", row_number().over(byG.orderBy(col("__v").asc)))
        .withColumn("__n", count(lit(1)).over(byG))
        .withColumn("__klo", greatest(expr(s"(__n * $loPerMille + 999) div 1000"), lit(1L)))
        .withColumn("__khi", greatest(expr(s"(__n * $hiPerMille + 999) div 1000"), lit(1L)))
        .filter(col("__rk") === col("__klo") || col("__rk") === col("__khi"))
        .groupBy("__g").agg(
          min(when(col("__rk") === col("__klo"), col("__v"))).as("lo_cut"),
          min(when(col("__rk") === col("__khi"), col("__v"))).as("hi_cut"))
      df.join(broadcast(cuts), group <=> col("__g"), "left")
        .drop("__g")
        .withColumn("winsorized",
          // explicit NULL: Spark's least/greatest SKIP nulls, so a
          // NULL value would otherwise clamp to lo_cut instead of
          // staying NULL (and all-NULL groups carry no cuts row at
          // all — hence the left join)
          when(value.isNull, lit(null).cast("long"))
            .otherwise(least(greatest(value.cast("long"), col("lo_cut")), col("hi_cut"))))
    }

    /** Leakage-safe target encoding (the leave-one-out variant): each
      * row's categorical `key` is replaced by the mean target of the
      * OTHER rows sharing it — loo = (S_k − v) / (n_k − 1) — the
      * feature-engineering standard that, unlike the naive per-key
      * mean, never leaks a row's own label into its own feature (the
      * classic train-time overfit). Exact integers: loo_num = S_k − v,
      * loo_den = n_k − 1, and loo_milli via the split division
      * (n div d)·1000 + ((n mod d)·1000) div d (no overflowing
      * 1000·S intermediate). Singleton keys report NULL — there is no
      * "other rows" mean, and NULL is the honest encoding (impute
      * downstream with the global mean if desired).
      *
      * Scale shape: ONE key-keyed exchange — the per-key sum and
      * count are a single window over the hash-on-key distribution;
      * no second pass, no join-back. */
    def targetEncodeLoo(key: Column, target: Column): DataFrame = {
      val byK = Window.partitionBy(col("__te_k"))
      df.withColumn("__te_k", key)
        .withColumn("__te_v", target.cast("long"))
        .withColumn("loo_num", sum("__te_v").over(byK) - col("__te_v"))
        .withColumn("loo_den", count(lit(1)).over(byK) - 1L)
        .withColumn("loo_milli",
          when(col("loo_den") === 0, lit(null).cast("long"))
            .otherwise(expr(
              "(loo_num div loo_den) * 1000 + ((loo_num % loo_den) * 1000) div loo_den")))
        .drop("__te_k", "__te_v")
    }

    /** Trimmed mean per group: the mean over the nearest-rank
      * [lo‰, hi‰] slice — the robust-center complement of
      * [[winsorize]] (clipping keeps n; trimming drops the tails
      * outright, the Olympic-scoring estimator). Rank bounds are the
      * same nearest-rank positions winsorize cuts at, so the two
      * operators quote consistent tails. Exact integers: per group
      * n, n_kept, trimmed_sum, and trimmed_milli via the split
      * division; one group-keyed window pass ranks values and the
      * rollup reuses its partitioning. */
    def trimmedMean(group: Column, value: Column,
        loPerMille: Long, hiPerMille: Long): DataFrame = {
      require(0 <= loPerMille && loPerMille <= hiPerMille && hiPerMille <= 1000)
      val byG = Window.partitionBy("__g")
      // NULLs are dropped before ranking (same contract as winsorize:
      // Spark ranks NULLS FIRST, the oracle NULLS LAST — n counts
      // non-null values only, and a missing value is not a tail)
      df.select(group.as("__g"), value.cast("long").as("__v"))
        .filter(col("__v").isNotNull)
        .withColumn("__rk", row_number().over(byG.orderBy(col("__v").asc)))
        .withColumn("__n", count(lit(1)).over(byG))
        .withColumn("__klo", greatest(expr(s"(__n * $loPerMille + 999) div 1000"), lit(1L)))
        .withColumn("__khi", greatest(expr(s"(__n * $hiPerMille + 999) div 1000"), lit(1L)))
        .filter(col("__rk") >= col("__klo") && col("__rk") <= col("__khi"))
        .groupBy(col("__g").as("g"))
        .agg(max("__n").as("n"), count(lit(1)).as("n_kept"),
          sum("__v").as("trimmed_sum"))
        .withColumn("trimmed_milli", expr(
          "(trimmed_sum div n_kept) * 1000 + ((trimmed_sum % n_kept) * 1000) div n_kept"))
    }

    /** Block-jackknife sensitivity audit of a per-group mean: rows
      * hash into `blocks` fixed blocks, and each block's
      * leave-one-out mean `(S − S_b) div (n − n_b)` measures how far
      * the metric moves if that 1/B slice of the data vanishes — "is
      * this number driven by one shard?" answered in one pass with
      * all-integer arithmetic (`value` must be integral, e.g. cents).
      * Emits per group: n, mean (floored), lo/hi (min/max
      * leave-one-block-out means). lo ≈ hi ≈ mean says the metric is
      * stable; a gap says one block owns it. Two tiny aggregates —
      * (group, block) then (group) — nothing row-sized shuffles
      * twice. */
    def blockJackknife(group: Column, value: Column, key: Column,
        blocks: Int = 32): DataFrame = {
      val blk = pmod(graft.functions.Hashing.portableHash64(key), lit(blocks.toLong))
      df.select(group.as("g"), value.cast("long").as("v"), blk.as("b"))
        .groupBy("g", "b").agg(sum("v").as("sb"), count(lit(1)).as("nb"))
        .withColumn("s", sum("sb").over(Window.partitionBy("g")))
        .withColumn("n", sum("nb").over(Window.partitionBy("g")))
        // a group whose rows all hash to one block has no leave-one-out
        // mean — NULL, skipped by min/max on both engines
        .withColumn("loo",
          expr("CASE WHEN n = nb THEN NULL ELSE (s - sb) div (n - nb) END"))
        .groupBy("g").agg(
          max("n").as("n"),
          expr("max(s div n)").as("mean"),
          min("loo").as("lo"),
          max("loo").as("hi"))
    }

    /** Frequent co-occurring pair mining with association-rule stats:
      * the top-k item pairs sharing a basket (order, session, doc),
      * each with support count, directional confidence
      * `⌊1000·cnt/cnt_a⌋` and lift `⌊1000·cnt·N/(cnt_a·cnt_b)⌋` —
      * lift > 1000 means the pair co-occurs MORE than independence
      * predicts, the affinity signal recommenders and
      * curriculum-mixing analyses read. Baskets are per-group sorted
      * DISTINCT item arrays; canonical pairs generate IN-ROW (m²
      * per basket on basket size m — bounded by basket width, never
      * by corpus size), so pair work is linear in baskets. One
      * basket aggregate, one pair aggregate, item counts
      * broadcast-joined onto the TakeOrdered top-k. */
    def frequentPairs(basket: Column, item: Column, k: Int): DataFrame = {
      val baskets = graft.operators.Checkpoints.eager(
        df.groupBy(basket.as("__o"))
          .agg(sort_array(collect_set(item)).as("si")))
      val pairs = baskets.select(explode(expr(
        "flatten(transform(sequence(1, size(si)), i -> " +
          "filter(transform(sequence(1, size(si)), j -> " +
          "CASE WHEN j > i THEN named_struct('a', element_at(si, i), 'b', element_at(si, j)) " +
          "ELSE NULL END), p -> p IS NOT NULL)))")).as("p"))
        .select(col("p.a").as("part_a"), col("p.b").as("part_b"))
      val top = pairs.groupBy("part_a", "part_b").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("part_a").asc, col("part_b").asc).limit(k)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("cnt").desc, col("part_a").asc, col("part_b").asc)))
      val itemCnt = baskets.select(explode(col("si")).as("it"))
        .groupBy("it").agg(count(lit(1)).as("c"))
      val n = baskets.agg(count(lit(1)).as("n_baskets"))
      top
        .join(broadcast(itemCnt.select(col("it").as("part_a"), col("c").as("__ca"))), "part_a")
        .join(broadcast(itemCnt.select(col("it").as("part_b"), col("c").as("__cb"))), "part_b")
        .crossJoin(broadcast(n))
        .select(col("part_a"), col("part_b"), col("cnt"), col("rank"),
          expr("(1000 * cnt) div __ca").as("conf_a_pm"),
          expr("(1000 * cnt * n_baskets) div (__ca * __cb)").as("lift_pm"))
    }

    /** Trailing-window z-score (anomaly screen): each row scored
      * against the previous `lookback` rows of its key. The window
      * aggregates are exact integers (count/sum/sum-of-squares over an
      * integral value column); the mean/stddev/z arithmetic is a fixed
      * double expression, so scores are bit-stable across engines and
      * shuffle orders. Rows without ≥2 predecessors or with zero
      * variance are dropped (no score, no verdict). `order` must
      * totally order rows within a key (ties would make the row frame
      * nondeterministic). */
    def movingZScore(key: Column, order: Seq[Column], valueInt: Column, lookback: Int): DataFrame = {
      val w = Window.partitionBy(key).orderBy(order: _*).rowsBetween(-lookback, -1)
      val nD = col("__n").cast("double")
      val sD = col("__s").cast("double")
      val varNum = col("__ss").cast("double") - sD * sD / nD
      df.withColumn("__v", valueInt)
        .withColumn("__n", count(lit(1)).over(w))
        .withColumn("__s", sum(col("__v")).over(w))
        .withColumn("__ss", sum(col("__v") * col("__v")).over(w))
        .filter(col("__n") >= 2 && varNum > 0.0)
        .withColumn("z", (col("__v").cast("double") - sD / nD) / sqrt(varNum / (nD - 1.0)))
        .drop("__v", "__n", "__s", "__ss")
    }

    /** Fixed-width histogram per group: bin = floor(value / width)
      * (floor, not truncation — matches SQL `//` on negatives too).
      * One hash aggregate, exact integers. */
    def histogram(groupKeys: Seq[Column], valueInt: Column, binWidth: Long): DataFrame =
      df.groupBy(groupKeys :+ floor(valueInt.cast("double") / binWidth).cast("long").as("bin"): _*)
        .agg(count(lit(1)).as("n"))

    /** Pearson correlation per group from exact integral sums
      * (n, Σx, Σy, Σxy, Σx², Σy² as bigints; the final r is one fixed
      * double expression) — unlike `corr()`, the aggregate is
      * shuffle-order independent and engine-portable. Caller is
      * responsible for scaling inputs so the squared sums fit int64
      * (≈3·10⁹ rows of 1e3-scale values; beyond that, widen to
      * DECIMAL). */
    def pearson(groupKeys: Seq[Column], x: Column, y: Column): DataFrame = {
      val nD = col("__n").cast("double")
      val sxD = col("__sx").cast("double")
      val syD = col("__sy").cast("double")
      df.groupBy(groupKeys: _*)
        .agg(
          count(lit(1)).as("__n"),
          sum(x).as("__sx"), sum(y).as("__sy"),
          sum(x * y).as("__sxy"), sum(x * x).as("__sxx"), sum(y * y).as("__syy"))
        .withColumn("r",
          (nD * col("__sxy").cast("double") - sxD * syD) /
            (sqrt(nD * col("__sxx").cast("double") - sxD * sxD) *
              sqrt(nD * col("__syy").cast("double") - syD * syD)))
        .withColumnRenamed("__n", "n")
        .drop("__sx", "__sy", "__sxy", "__sxx", "__syy")
    }

    /** Spearman rank correlation per group (Spearman 1904) — the
      * monotone-association complement of [[pearson]]: Pearson on the
      * tie-AVERAGED ranks, robust to outliers and to any monotone
      * rescaling of either metric (the right default when "bigger
      * docs score higher?" is the question and neither axis is
      * linear). Ranks are carried as the INTEGER 2×average-rank
      * (a tied run starting at min-rank lo with m members has
      * 2·avg = 2·lo + m − 1 — the aucExact identity); the 2× scale
      * cancels in ρ. All five sums accumulate as decimal(38,0)
      * (DuckDB: HUGEINT) — Σ(rank·rank) tops 2⁶³ past ~1M rows per
      * group where a long sum would wrap — and the three
      * integer-exact moment differences meet the only doubles at the
      * final sqrt/divide. One-class groups (constant x or y →
      * zero variance) report NULL, the undefined-ρ convention.
      *
      * Scale shape: the two rank windows and both tie-run counts all
      * share the hash-on-group distribution — ONE group-keyed
      * exchange (two in-partition sorts), then a group-sized
      * aggregate. Exact while 2n ranks and 4n² products fit a long
      * (n ≤ ~2³¹ per group) and 4n⁴ fits 38 digits (n ≤ ~10⁹). */
    def spearman(groupKeys: Seq[Column], x: Column, y: Column): DataFrame = {
      val gNames = groupKeys.indices.map(i => s"__g$i")
      val outNames = df.select(groupKeys: _*).columns.toSeq
      val gCols = gNames.map(col)
      val base = df.select(
        groupKeys.zip(gNames).map { case (c, n) => c.as(n) } ++
          Seq(x.cast("long").as("__x"), y.cast("long").as("__y")): _*)
      val byG = Window.partitionBy(gCols: _*)
      val ranked = base
        .withColumn("__rx",
          rank().over(byG.orderBy(col("__x"))) * 2
            + count(lit(1)).over(Window.partitionBy(gCols :+ col("__x"): _*)) - 1)
        .withColumn("__ry",
          rank().over(byG.orderBy(col("__y"))) * 2
            + count(lit(1)).over(Window.partitionBy(gCols :+ col("__y"): _*)) - 1)
      val dec = "decimal(38,0)"
      val agg = ranked.groupBy(gCols: _*)
        .agg(
          count(lit(1)).cast(dec).as("__n"),
          sum(col("__rx").cast(dec)).as("__sx"),
          sum(col("__ry").cast(dec)).as("__sy"),
          sum((col("__rx") * col("__ry")).cast(dec)).as("__sxy"),
          sum((col("__rx") * col("__rx")).cast(dec)).as("__sxx"),
          sum((col("__ry") * col("__ry")).cast(dec)).as("__syy"))
        .withColumn("__num", col("__n") * col("__sxy") - col("__sx") * col("__sy"))
        .withColumn("__dx", col("__n") * col("__sxx") - col("__sx") * col("__sx"))
        .withColumn("__dy", col("__n") * col("__syy") - col("__sy") * col("__sy"))
      val renamed = gNames.zip(outNames).foldLeft(agg: DataFrame) {
        case (d, (g, o)) => d.withColumnRenamed(g, o)
      }
      renamed
        .withColumn("n", col("__n").cast("long"))
        .withColumn("rho",
          when(col("__dx") === 0 || col("__dy") === 0, lit(null).cast("double"))
            .otherwise(col("__num").cast("double") /
              (sqrt(col("__dx").cast("double")) * sqrt(col("__dy").cast("double")))))
        .select(outNames.map(col) ++ Seq(col("n"), col("rho")): _*)
    }

    /** Exact weighted (lower) median per group: the smallest value v
      * whose cumulative weight reaches half the group's total —
      * 2·cum(v) ≥ W with cum inclusive of v's whole tie class. The
      * "median doc length weighted by tokens" / "median price
      * weighted by quantity" statistic, integer-exact (no
      * interpolation, so it replays on any engine). Values
      * pre-aggregate per (group, v) first, so the rank window runs
      * over distinct values, not rows; one group-keyed exchange
      * serves the aggregate and the window. */
    def weightedMedian(group: Seq[Column], value: Column, weight: Column): DataFrame = {
      val outNames = df.select(group: _*).columns.toSeq
      val gNames = group.indices.map(i => s"__g$i")
      val perV = df.select(
        group.zip(gNames).map { case (c, n) => c.as(n) } :+
          value.cast("long").as("__v") :+ weight.cast("long").as("__w"): _*)
        .groupBy((gNames.map(col) :+ col("__v")): _*)
        .agg(sum(col("__w")).as("__wv"))
      val wCum = Window.partitionBy(gNames.map(col): _*).orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(gNames.map(col): _*)
      perV
        .withColumn("__cum", sum(col("__wv")).over(wCum))
        .withColumn("__tot", sum(col("__wv")).over(wAll))
        .filter(col("__cum") * 2 >= col("__tot"))
        .groupBy(gNames.map(col): _*)
        .agg(min(col("__v")).as("wmedian"), max(col("__tot")).as("total_w"))
        .select(gNames.zip(outNames).map { case (g, n) => col(g).as(n) } :+
          col("wmedian") :+ col("total_w"): _*)
    }

    /** Exact Gini coefficient of `value`'s distribution per group, in
      * integer per-mille — the corpus-balance audit ("is one source's
      * token mass dominated by a few giant documents"): G = (2·Σ i·xᵢ
      * − (n+1)·Σx) / (n·Σx) over values sorted ascending, 1-based
      * ranks, cross-multiplied to gini_pm = its ⌊·1000⌋. Equal values
      * make the rank order immaterial (Σ i·xᵢ is tie-invariant), so
      * the statistic is deterministic without a tiebreak. NULL for
      * groups with zero total (all-zero values). One group-keyed
      * exchange serves the rank window and the aggregate.
      *
      * Overflow: Σ i·xᵢ and the cross-multiplied numerator accumulate
      * as decimal(38,0) (the oracle's HUGEINT), exactly like the
      * concentration/spearman siblings — BIGINT wraps at n·x̄ past
      * 2⁶³ (a few billion rows of modest values), decimal holds to
      * n²·x̄ < 10³⁸. The final ‰ quotient is long by construction. */
    def giniByGroup(group: Seq[Column], value: Column): DataFrame = {
      val outNames = df.select(group: _*).columns.toSeq
      val gNames = group.indices.map(i => s"__g$i")
      val base = df.select(
        group.zip(gNames).map { case (c, n) => c.as(n) } :+
          value.cast("long").as("__x"): _*)
      val wOrd = Window.partitionBy(gNames.map(col): _*).orderBy(col("__x"))
      base
        .withColumn("__i", row_number().over(wOrd))
        .groupBy(gNames.map(col): _*)
        .agg(count(lit(1)).as("n"),
          sum(col("__x").cast("decimal(28,0)")).as("__sx"),
          sum(col("__i").cast("decimal(19,0)") * col("__x").cast("decimal(19,0)"))
            .as("__six"))
        .withColumn("gini_pm",
          when(col("__sx") <= 0, lit(null).cast("long")).otherwise(
            expr("(1000 * (2 * __six - (n + 1) * __sx)) div (n * __sx)")))
        .select(gNames.zip(outNames).map { case (g, n) => col(g).as(n) } :+
          col("n") :+ col("gini_pm"): _*)
    }

    /** Per-group ordinary-least-squares trend line — "is spend /
      * volume / quality drifting up or down per key": slope and
      * intercept of y over x within each group, plus the EXACT
      * integer numerators so the fit is auditable and engine-portable.
      *
      * x is centered on the group's min (emitted as `x0`) before any
      * sum — epoch-scale x would overflow Σx² long before the data is
      * big; centered, the sums stay integral and exact (caller keeps
      * |x − x0| ≲ 2^20 and |y| ≲ 2^21 at 2^21 rows per group). slope =
      * Sxy/Sxx with Sxy = nΣxy − ΣxΣy, Sxx = nΣx² − (Σx)² as exact
      * longs; the two divisions are the only floats, computed in the
      * same order both engines, so doubles replay bit-identically.
      * intercept is at x = x0 (the centered frame), NULL slope /
      * intercept when all x coincide (Sxx = 0 — no ANSI div-by-zero).
      *
      * Plan shape: the min-x window and the final aggregate share ONE
      * group-keyed exchange (same partitioning); no broadcast of a
      * group-sized relation anywhere, so per-entity groups scale. */
    def groupOls(group: Seq[Column], x: Column, y: Column): DataFrame = {
      val outNames = df.select(group: _*).columns.toSeq
      val gNames = group.indices.map(i => s"__g$i")
      val base = df.select(
        group.zip(gNames).map { case (c, n) => c.as(n) } :+
          x.cast("long").as("__x") :+ y.cast("long").as("__y"): _*)
      val w = Window.partitionBy(gNames.map(col): _*)
      val cent = base
        .withColumn("__x0", min(col("__x")).over(w))
        .withColumn("__cx", col("__x") - col("__x0"))
      val s = cent.groupBy((gNames.map(col) :+ col("__x0")): _*)
        .agg(count(lit(1)).as("n"),
          sum(col("__cx")).as("__sx"), sum(col("__y")).as("__sy"),
          sum(col("__cx") * col("__y")).as("__sxy"),
          sum(col("__cx") * col("__cx")).as("__sxx"))
        .withColumn("sxy_num", col("n") * col("__sxy") - col("__sx") * col("__sy"))
        .withColumn("sxx_num", col("n") * col("__sxx") - col("__sx") * col("__sx"))
        .withColumn("slope", when(col("sxx_num") === 0, lit(null).cast("double"))
          .otherwise(col("sxy_num").cast("double") / col("sxx_num").cast("double")))
        .withColumn("intercept", when(col("sxx_num") === 0, lit(null).cast("double"))
          .otherwise((col("__sy").cast("double") - col("slope") * col("__sx").cast("double")) /
            col("n").cast("double")))
      s.select(gNames.zip(outNames).map { case (g, n) => col(g).as(n) } ++
        Seq(col("__x0").as("x0"), col("n"), col("slope"), col("intercept"),
          col("sxy_num"), col("sxx_num")): _*)
    }

    /** Cohort retention: bucket entities by the period of their first
      * activity, then count distinct entities active at each period
      * offset from their cohort. Periods are integral floor-divisions
      * of epoch-µs (exact for any timestamp below 2^53 µs ≈ year
      * 2255). Two aggregates + one join on the entity key — the
      * (entity, period) de-dup happens first, so the join carries at
      * most one row per entity-period. */
    def retention(entity: Column, tsUs: Column, periodUs: Long): DataFrame = {
      val ev = df.select(entity.as("__e"),
          floor(tsUs.cast("double") / periodUs).cast("long").as("__p"))
        .distinct()
      val cohort = ev.groupBy("__e").agg(min("__p").as("__c"))
      ev.join(cohort, "__e")
        .groupBy(col("__c").as("cohort"), (col("__p") - col("__c")).as("week_offset"))
        .agg(count(lit(1)).as("users"))
    }

    /** Ordered funnel: per entity, the earliest time each stage is
      * reached with stages strictly in order (stage i counts only
      * after stage i-1's first completion). Returns (stage, entities)
      * — classic conversion analysis. One aggregate per stage over
      * the same entity partitioning; min-reduction is shuffle-order
      * independent. */
    def funnel(entity: Column, ts: Column, stageCol: Column, stages: Seq[String]): DataFrame = {
      require(stages.nonEmpty)
      val base = df.select(entity.as("__e"), ts.as("__ts"), stageCol.as("__s"))
      // reached(i): per entity, min ts of stage i events after reached(i-1).
      // Built as ONE plan (no per-stage driver actions): each stage's
      // reachers union into a long (stage, entity) table, counted once.
      var reached = base.filter(col("__s") === stages.head)
        .groupBy("__e").agg(min(col("__ts")).as("__t"))
      var all = reached.select(lit(stages.head).as("stage"), col("__e"))
      for (s <- stages.tail) {
        reached = base.filter(col("__s") === s)
          .join(reached, "__e")
          .filter(col("__ts") > col("__t"))
          .groupBy("__e").agg(min(col("__ts")).as("__t"))
        all = all.unionByName(reached.select(lit(s).as("stage"), col("__e")))
      }
      all.groupBy("stage").agg(count(lit(1)).as("entities"))
    }

    /** Keep rows with a match in `right` (shuffle- or broadcast-semi). */
    def semiJoin(right: DataFrame, joinExprs: Column, broadcastRight: Boolean = false): DataFrame =
      df.join(if (broadcastRight) broadcast(right) else right, joinExprs, "left_semi")

    /** Keep rows without a match in `right`. */
    def antiJoin(right: DataFrame, joinExprs: Column, broadcastRight: Boolean = false): DataFrame =
      df.join(if (broadcastRight) broadcast(right) else right, joinExprs, "left_anti")

    /** ROLLUP aggregation (hierarchical subtotals in one pass). */
    def rollupAgg(keys: Seq[Column], aggs: Seq[Column]): DataFrame =
      df.rollup(keys: _*).agg(aggs.head, aggs.tail: _*)

    /** CUBE aggregation (all grouping-set combinations in one pass). */
    def cubeAgg(keys: Seq[Column], aggs: Seq[Column]): DataFrame =
      df.cube(keys: _*).agg(aggs.head, aggs.tail: _*)

    /** Explicit GROUPING SETS — the general form of rollup/cube when
      * only specific key combinations are wanted (one Expand + one
      * hash aggregate; cheaper than cube when sets ⊂ powerset). */
    def groupingSetsAgg(sets: Seq[Seq[Column]], keys: Seq[Column], aggs: Seq[Column]): DataFrame =
      df.groupingSets(sets, keys: _*).agg(aggs.head, aggs.tail: _*)

    /** Column profiling: one row per requested column with row count,
      * null count, exact distinct count, and min/max rendered as
      * strings. One aggregation job per column over just that column —
      * parquet prunes the scan to a single column, and the distinct
      * count is a group-then-count (full map-side combine), not a
      * multi-`count(DISTINCT)` Expand that would push rows × columns
      * through a single aggregate. Pass columns whose string rendering
      * is engine-portable: integrals, strings, dates — not raw
      * doubles. */
    def profile(cols: Seq[String]): DataFrame = {
      require(cols.nonEmpty)
      val nRows = df.agg(count(lit(1)).as("n_rows"))
      val per = cols.map { c =>
        df.select(col(c).as("__v"))
          .groupBy(col("__v")).agg(count(lit(1)).as("__c"))
          .agg(
            coalesce(sum(when(col("__v").isNotNull, col("__c"))), lit(0L)).as("n_values"),
            count(col("__v")).as("n_distinct"),
            min(col("__v")).cast("string").as("min_str"),
            max(col("__v")).cast("string").as("max_str"))
          .select(lit(c).as("col_name"), col("n_values"), col("n_distinct"),
            col("min_str"), col("max_str"))
      }
      per.reduce(_.unionAll(_)).crossJoin(broadcast(nRows))
        .select(col("col_name"), col("n_rows"),
          (col("n_rows") - col("n_values")).as("n_null"),
          col("n_distinct"), col("min_str"), col("max_str"))
    }

    /** 2-D skyline (Pareto frontier, minimizing both `x` and `y`):
      * points not dominated by any other point (q dominates p when
      * q.x ≤ p.x, q.y ≤ p.y, and q < p on at least one axis).
      * Returns the distinct non-dominated (x, y) points.
      *
      * Two-stage plan for scale: stage 1 computes a LOCAL skyline per
      * input partition (window over `spark_partition_id()`, ordered
      * (x, y) scan keeping strict running-min of y) — dominance is
      * transitive, so the global skyline is a subset of the union of
      * local skylines. Stage 2 re-runs the same scan globally over the
      * (tiny) survivor set. 100 TB of points never meet a global sort;
      * only the pruned survivors do. */
    def skyline2D(x: Column, y: Column): DataFrame = {
      def prune(pts: DataFrame, part: Seq[Column]): DataFrame = {
        val w = Window.partitionBy(part: _*).orderBy(col("x").asc, col("y").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        pts.withColumn("__miny", min(col("y")).over(w))
          .filter(col("__miny").isNull || col("y") < col("__miny"))
          .drop("__miny")
      }
      val distinctPts = df.select(x.as("x"), y.as("y")).na.drop().distinct()
      val local = prune(distinctPts.withColumn("__pid", spark_partition_id()), Seq(col("__pid")))
        .drop("__pid")
      prune(local, Nil)
    }

    /** Robust outlier screen per group via median/MAD: flag rows where
      * |v − median| > k·MAD (MAD = median of |v − median|). Exact
      * medians over an integral value column — midpoints are exact
      * halves, bit-stable across engines. Two small per-group
      * aggregates broadcast-joined back to the rows; groups with
      * MAD = 0 flag every off-median row (k·0 = 0), matching the
      * textbook definition. Returns the flagged rows only. */
    def madOutliers(group: Seq[Column], valueInt: Column, k: Double, keep: Seq[Column]): DataFrame = {
      // group expressions are aliased to generated names (__g0, __g1,
      // ...) for the two join-backs — a computed grouping (e.g. a
      // bucket expression) has no stable string name to join on. The
      // OUTPUT re-aliases them to the names the analyzer would give
      // the bare projection, so simple columns keep their names.
      val outNames = df.select(group: _*).columns.toSeq
      val gNames = group.indices.map(i => s"__g$i")
      val base = df.select(
        keep ++ group.zip(gNames).map { case (c, n) => c.as(n) } :+
          valueInt.cast("double").as("__v"): _*)
      val med = base.groupBy(gNames.map(col): _*).agg(median(col("__v")).as("__med"))
      val withMed = base.join(broadcast(med), gNames)
      val mad = withMed.groupBy(gNames.map(col): _*)
        .agg(median(abs(col("__v") - col("__med"))).as("__mad"))
      withMed.join(broadcast(mad), gNames)
        .filter(abs(col("__v") - col("__med")) > lit(k) * col("__mad"))
        .select(keep ++ gNames.zip(outNames).map { case (g, n) => col(g).as(n) } :+
          col("__v").cast("long").as("value"): _*)
    }

    /** Sliding-frame aggregate over an ordered per-key window, e.g.
      * a moving sum of the last `preceding`+1 rows. The ordering must
      * be total (add a tie-break column) for deterministic frames. */
    def movingAgg(
        partitionKeys: Seq[Column],
        order: Seq[Column],
        preceding: Int,
        aggExpr: Column => Column,
        valueCol: Column,
        as: String
    ): DataFrame = {
      val w = Window
        .partitionBy(partitionKeys: _*)
        .orderBy(order: _*)
        .rowsBetween(-preceding, Window.currentRow)
      df.withColumn(as, aggExpr(valueCol).over(w))
    }

    /** Time-bucketed aggregation: truncate `ts` to `unit`
      * (e.g. "hour") and aggregate per bucket + extra keys. */
    def timeBucketAgg(ts: Column, unit: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
      df.groupBy(date_trunc(unit, ts).as("bucket") +: keys: _*)
        .agg(aggs.head, aggs.tail: _*)

    /** Gap-based sessionization: a new session starts when the gap to
      * the previous event of the same `userKey` exceeds `gapMicros`.
      * Computed on integral epoch-µs (engine-portable, no interval
      * arithmetic). One shuffle on the user key; both window passes
      * and the final aggregate reuse that partitioning. */
    def sessionize(userKey: Column, ts: Column, gapMicros: Long): DataFrame = {
      val w = Window.partitionBy(userKey).orderBy(ts)
      val tsUs = unix_micros(ts)
      val prevUs = lag(tsUs, 1).over(w)
      val isNew = when(prevUs.isNull || (tsUs - prevUs) > gapMicros, 1).otherwise(0)
      df.withColumn("__graft_new", isNew)
        .withColumn(
          "session_id",
          sum(col("__graft_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        )
        .drop("__graft_new")
    }

    /** Herfindahl–Hirschman concentration per group — "is this
      * slice's volume all one key?" (one crawl domain owning a
      * source, one user owning an event type): HHI = Σ shareᵢ² over
      * the keys inside the group, reported in exact basis points
      * hhi_bp = (Σ cᵢ²·10000) div N², plus the effective key count
      * (inverse Simpson) eff_milli = (N²·1000) div Σ cᵢ² — "this
      * source behaves like 3.2 domains". Both are single floor
      * divisions over exact integer sums (Σ cᵢ² accumulates as
      * decimal(38,0); oracle HUGEINT) so the audit replays
      * bit-for-bit. hhi_bp = 10000 ⇔ monopoly; ≈ 10000/k ⇔ uniform
      * over k keys.
      *
      * Scale shape: one (group, key) count aggregate (map-side
      * partials) then a group-sized rollup over the key rows — the
      * corpus shuffles once, keyed (group, key). */
    def concentration(group: Column, key: Column): DataFrame = {
      val dec = "decimal(38,0)"
      df.select(group.as("grp"), key.as("__k"))
        .groupBy("grp", "__k").agg(count(lit(1)).as("__c"))
        .groupBy("grp").agg(
          sum("__c").cast(dec).as("__n"),
          count(lit(1)).as("n_keys"),
          sum((col("__c") * col("__c")).cast(dec)).as("__c2"))
        .withColumn("hhi_bp", expr("(__c2 * 10000) div (__n * __n)").cast("long"))
        .withColumn("eff_milli", expr("(__n * __n * 1000) div __c2").cast("long"))
        .select(col("grp"), col("__n").cast("long").as("n"),
          col("n_keys"), col("hhi_bp"), col("eff_milli"))
    }

    /** Mutual information between two categorical columns, the
      * feature-dependence / leakage audit ("is `source` secretly a
      * proxy for `lang`?"): per observed (x, y) cell, the pointwise
      * mutual information pmi_q64 = qlog64(c_xy·N) − qlog64(c_x·c_y)
      * in exact integer qlog64 units (64 = 1 bit), its MI
      * contribution contrib_q64 = c_xy·pmi_q64 (so N·MI_bits·64 =
      * Σ contrib — the exact integer total, one division away from
      * MI), and mi_q64_total repeated on every row for one-frame
      * consumption. Independent columns → every pmi ≈ 0; a
      * deterministic mapping → pmi ≈ qlog64(N) − qlog64(c_y).
      *
      * Scale shape: ONE corpus-sized exchange builds the (x, y)
      * contingency grid (map-side partials); both margins derive
      * from the grid and join back broadcast (each ≤ distinct-value
      * sized); the total is a 1-row broadcast. qlog64 exact while
      * c_x·c_y ≤ 2⁴⁷ — beyond ~10⁷ rows pre-scale the four counts by
      * a shared power of two (PMI is a log ratio, shift-invariant). */
    def mutualInformation(x: Column, y: Column): DataFrame = {
      val q = graft.quality.NaiveBayes.qlog64 _
      val grid = Checkpoints.eager(
        df.select(x.cast("string").as("x"), y.cast("string").as("y"))
          .groupBy("x", "y").agg(count(lit(1)).as("c_xy")))
      val mx = grid.groupBy("x").agg(sum("c_xy").as("c_x"))
      val my = grid.groupBy("y").agg(sum("c_xy").as("c_y"))
      val tot = grid.agg(sum("c_xy").as("n"))
      val cells = grid
        .join(broadcast(mx), "x")
        .join(broadcast(my), "y")
        .crossJoin(broadcast(tot))
        .withColumn("pmi_q64", q(col("c_xy") * col("n")) - q(col("c_x") * col("c_y")))
        .withColumn("contrib_q64", col("c_xy") * col("pmi_q64"))
      cells
        .withColumn("mi_q64_total",
          sum("contrib_q64").over(Window.partitionBy(lit(0))))
        .select("x", "y", "c_xy", "c_x", "c_y", "n",
          "pmi_q64", "contrib_q64", "mi_q64_total")
    }
  }
}
