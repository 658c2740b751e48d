package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Aggregators
import graft.operators.CoreOps._
import graft.operators.Relational._
import graft.similarity.{IvfAnn, Similarity}
import graft.sources.Tables

/** Second analytic wave: window frames, cube, set ops, exact median,
  * element-wise array aggregation, custom typed Aggregator, IVF ANN.
  */
object ExtraQueries {

  private def quantized(s: SparkSession, dir: String): DataFrame =
    Similarity.prepareQuantized(Tables.embeddings(s, dir), col("embedding"), col("vec_id"), col("label"))

  /** [[quantized]] materialized ONCE per query (released at the
    * harness's query boundary): the ANN builds consume the prepared
    * corpus many times over — Lloyd rounds, inverted-list assignment,
    * PQ encoding, probes, exact re-ranks — and each lazy consumer
    * re-paid the parquet vector decode, the fan-out exchange and the
    * quantization pass (guide §1.2/§5: persist what is reused when
    * recompute is expensive). */
  private def quantizedCk(s: SparkSession, dir: String): DataFrame =
    graft.operators.Checkpoints.eager(quantized(s, dir))

  /** Zone-mapped scratch copies, built once per (JVM, sf dir): the
    * production shape is build-once/probe-per-query, so the gate and
    * the bench measure the PROBE (manifest planning + pruned scan),
    * not the one-time clustering rewrite — the same amortization the
    * persisted-index rows use. */
  private val zoneCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def zonedLineitem(s: SparkSession, dir: String): String =
    zoneCache.computeIfAbsent(dir, d => {
      val out = java.nio.file.Files.createTempDirectory("graft_zonemap")
        .toFile.getPath + "/lineitem"
      graft.sources.ZoneMaps.writeClustered(Tables.lineitem(s, d), out, 8, "l_orderkey")
      out
    })

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.2/22ax2 zone-map pruned range scan: the file-level min/max
    // manifest (sources.ZoneMaps) planned BEFORE the scan — pruned
    // files never produce tasks. The residual filter makes the result
    // provably the plain filtered scan's; the oracle IS that scan.
    "q_zone_prune" -> ((s, dir) =>
      graft.sources.ZoneMaps
        .readRange(s, zonedLineitem(s, dir), "l_orderkey", 1000L, 1999L)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice", "l_returnflag", "l_linestatus")),

    // sliding-frame window: moving sum of last 3 events per user.
    "q_moving_sum" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("value_cents", round(col("value") * 100).cast("bigint"))
        .movingAgg(
          Seq(col("user_id")),
          Seq(col("ts"), col("event_id")),
          2,
          sum(_),
          col("value_cents"),
          "mov_sum"
        )
        .mapRecords(col("event_id"), col("mov_sum"))),

    // deterministic global rank without a single-task window: range
    // shuffle + per-partition offsets (graft.operators.Ordering). Keyed
    // by the SNM fingerprint so the two queries share parameters.
    "q_global_rank" -> ((s, dir) => {
      val key = substring(
        regexp_replace(lower(col("text")), "[^a-z0-9]", ""), 1, PrepParams.SnmKeyLen)
      graft.operators.Ordering.globalRank(
          Tables.documents(s, dir).select(col("doc_id"), key.as("__k")),
          Seq(col("__k"), col("doc_id")), rankCol = "rank")
        .mapRecords(col("doc_id"), col("rank"))
    }),

    // Seeded deterministic corpus shuffle: reproducible random
    // permutation rank from md5(seed|key) — the pre-sharding
    // "shuffle once before training" step, same scale shape as
    // q_global_rank (uniform hash keys → balanced range partitions).
    "q_shuffle_rank" -> ((s, dir) =>
      graft.operators.Ordering.shuffleRank(
          Tables.documents(s, dir).select(col("doc_id")),
          col("doc_id"), seed = 42L)
        .select(col("doc_id"), col("shuffle_rank"))),

    // SCD type-2 dimension build: change log → contiguous half-open
    // validity intervals per key, open-ended current row flagged.
    "q_scd2" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      graft.operators.TemporalJoins.scd2(
          ev.select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("__us")),
          col("user_id"), col("__us"), Seq(col("__us"), col("event_id")))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("valid_from_us"), col("valid_to_us"), col("is_current"))
    }),

    // CUBE over two dimensions.
    "q_cube" -> ((s, dir) =>
      Tables.lineitem(s, dir).cubeAgg(
        Seq(col("l_returnflag"), col("l_linestatus")),
        Seq(sum(col("l_quantity").cast("bigint")).as("sum_qty"), count(lit(1)).as("n"))
      )),

    // set difference: BUILDING-segment customers minus big-balance ones.
    "q_except" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      c.filterRecords(col("c_mktsegment") === "BUILDING")
        .mapRecords(col("c_custkey"), col("c_name"))
        .exceptRecords(
          c.filterRecords(col("c_acctbal") > 5000).mapRecords(col("c_custkey"), col("c_name"))
        )
    }),

    // set intersection (distinct semantics, same one-shuffle shape as
    // except): suppliers shipping in BOTH years.
    "q_intersect" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.filterRecords(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
        .mapRecords(col("l_suppkey"))
        .intersectRecords(
          li.filterRecords(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1998-01-01")
            .mapRecords(col("l_suppkey")))
    }),

    // exact interpolated median per event_type (integer cents input).
    "q_median" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("value_cents", round(col("value") * 100).cast("bigint"))
        .reduceByKey(
          Seq(col("event_type")),
          Seq(expr("percentile(value_cents, 0.5)").as("median_cents"))
        )),

    // element-wise centroid sums per label (array aggregation at scale:
    // posexplode -> (label, dim) integer sums; exact cross-engine).
    "q_embed_centroid" -> ((s, dir) =>
      quantized(s, dir)
        .select(col("label"), posexplode(col("e")).as(Seq("i", "v")))
        .reduceByKey(
          Seq(col("label"), col("i")),
          Seq(sum(col("v")).cast("bigint").as("s"), count(lit(1)).as("n"))
        )),

    // custom typed Aggregator (UDAF): quantity-weighted mean price.
    "q_weighted_avg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .withColumn("price_cents", round(col("l_extendedprice") * 100).cast("bigint"))
        .withColumn("qty", col("l_quantity").cast("bigint"))
        .groupBy(col("l_returnflag"))
        .agg(Aggregators.weightedMean(col("price_cents"), col("qty")).as("w_mean"))),

    // ASOF left join: for each click, the user's latest signup at or
    // before it (union + carry-forward window; single shuffle on user).
    "q_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filterRecords(col("event_type") === "click")
        .mapRecords(col("user_id"), col("event_id"), unix_micros(col("ts")).as("c_us"))
      val signups = ev.filterRecords(col("event_type") === "signup")
        .mapRecords(col("user_id"), col("event_id").as("s_id"), unix_micros(col("ts")).as("s_us"))
      graft.operators.TemporalJoins
        .asofJoin(clicks, signups, "user_id", col("c_us"), col("s_us"), Seq("s_id", "s_us"))
        .mapRecords(col("event_id"), col("s_id"), col("s_us"))
    }),

    // §2.2/22j4 NEAREST as-of: each click picks its time-closest
    // signup, before or after (ties backward) — one union, one key
    // shuffle, both directional windows on the same partitioning.
    "q_asof_nearest" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filterRecords(col("event_type") === "click")
        .mapRecords(col("user_id"), col("event_id"), unix_micros(col("ts")).as("c_us"))
      val signups = ev.filterRecords(col("event_type") === "signup")
        .mapRecords(col("user_id"), col("event_id").as("s_id"), unix_micros(col("ts")).as("s_us"))
      graft.operators.TemporalJoins
        .asofJoinNearest(clicks, signups, "user_id", col("c_us"), col("s_us"),
          Seq("s_id", "s_us"), "s_us")
        .mapRecords(col("event_id"), col("s_id"), col("s_us"))
    }),

    // §2.2/22j3 FORWARD as-of: each click picks the NEXT purchase of
    // the same user at-or-after it — the time-to-next-event join.
    "q_asof_forward" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filterRecords(col("event_type") === "click")
        .mapRecords(col("user_id"), col("event_id"), unix_micros(col("ts")).as("c_us"))
      val purchases = ev.filterRecords(col("event_type") === "purchase")
        .mapRecords(col("user_id"), col("event_id").as("p_id"), unix_micros(col("ts")).as("p_us"))
      graft.operators.TemporalJoins
        .asofJoinForward(clicks, purchases, "user_id", col("c_us"), col("p_us"), Seq("p_id", "p_us"))
        .mapRecords(col("event_id"), col("p_id"), col("p_us"))
    }),

    // bucketed range join: purchases within 1 hour after a click by the
    // same user (equi-join on time buckets + exact post-filter).
    "q_range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filterRecords(col("event_type") === "purchase")
        .mapRecords(col("user_id"), col("event_id").as("p_id"), unix_micros(col("ts")).as("p_us"))
      val clicks = ev.filterRecords(col("event_type") === "click")
        .mapRecords(col("user_id"), col("event_id").as("c_id"), unix_micros(col("ts")).as("c_us"))
      graft.operators.TemporalJoins
        .rangeJoinBucketed(purchases, clicks, "user_id",
          col("p_us"), col("c_us"), col("c_us") + 3600000000L, bucketUs = 3600000000L)
        .mapRecords(col("c_id"), col("p_id"))
    }),

    // §2.2/22k2 interval×interval OVERLAP join (two-sided range join):
    // per-(user, type, day) activity intervals, co-active user pairs
    // from the bucketed overlap join (each pair emitted once, in the
    // overlap-start bucket — no distinct), top-25 pairs by co-active
    // windows. All-pairs co-activity is INHERENTLY quadratic in
    // per-window actives, so the pair stream is HASH-BLOCKED: a pair
    // survives iff both users share a portable-hash block (4 blocks →
    // an unbiased 1-in-4 pair sample, consistent across windows so
    // each surviving pair's window count stays exact; B is the
    // work-vs-coverage dial at 100 TB, partner caps the other lever).
    // The oracle replays the plain overlap semantics + block rule;
    // the time-bucketing must be transparent.
    "q_interval_join" -> ((s, dir) =>
      graft.operators.TemporalJoins.coActivePairs(
        Tables.events(s, dir), col("user_id"), col("event_type"), col("ts"),
        bucketUs = 10800000000L, blocks = 4, topK = 25)),

    // IVF ANN — fully oracle-gated: the whole deterministic build
    // (seed cells → Lloyd passes → floor-mean centroids → inverted
    // lists → nprobe probe → exact rank) is replayed as a DuckDB CTE
    // chain in integer/fixed-order-double arithmetic. All parameters
    // come from AnnParams so the lambda and annIvfSql cannot drift.
    "q_ann_ivf" -> ((s, dir) => {
      val corpus = quantizedCk(s, dir)
      val qs = corpus.filter(pmod(col("vec_id"), lit(AnnParams.QueryMod)) === 0)
      IvfAnn.annIvf(corpus, qs, k = AnnParams.IvfK,
          numCentroids = AnnParams.IvfCentroids, nprobe = AnnParams.IvfNprobe,
          lloydIters = AnnParams.IvfLloydIters)
        .withColumn("rank", col("rank").cast("bigint"))
    }),

    // §2.4/29d cluster-purity report: the IVF assignment (shared
    // build with q_ann_ivf) rolled up per cell — size, majority
    // label, exact milli purity. The corpus-organization audit a
    // cluster-balanced sampler or SemDeDup run reads first.
    "q_cluster_stats" -> ((s, dir) => {
      val corpus = quantizedCk(s, dir)
      val cents = IvfAnn.centroids(corpus, AnnParams.IvfCentroids, AnnParams.IvfLloydIters)
      // label rides THROUGH the top-1 heap — no vec_id self-alignment
      val lab = IvfAnn.assign(corpus, cents, carry = Seq("label"))
      import org.apache.spark.sql.expressions.Window
      lab.groupBy("c_id", "label").agg(count(lit(1)).as("nl"))
        .withColumn("n", sum("nl").over(Window.partitionBy("c_id")))
        .withColumn("__rn", row_number().over(
          Window.partitionBy("c_id").orderBy(col("nl").desc, col("label").asc)))
        .filter(col("__rn") === 1)
        .select(col("c_id"), col("n"), col("label").as("top_label"),
          col("nl").as("top_n"), expr("(nl * 1000) div n").as("purity_milli"))
    }),

    // §2.4/29e cluster-balanced sampling: UniMax allocation COMPOSED
    // over the IVF cells — equal per-cell shares of a half-corpus
    // budget, capped at one epoch (no vector repeats), so head
    // clusters downsample to the fair share and tail clusters
    // survive whole. MetaCLIP/DataComp-style balancing with the
    // waterfill done exactly.
    "q_cluster_sample" -> ((s, dir) => {
      val corpus = quantizedCk(s, dir)
      val cents = IvfAnn.centroids(corpus, AnnParams.IvfCentroids, AnnParams.IvfLloydIters)
      // the assignment feeds the size aggregate AND the selection
      // join — checkpoint once or the argmin scan runs twice
      val asg = graft.operators.Checkpoints.eager(IvfAnn.assign(corpus, cents))
      val sizes = asg.groupBy("c_id").agg(count(lit(1)).as("n_vecs"))
      val total = sizes.agg(sum("n_vecs").cast("bigint").as("__total"))
      val alloc = graft.text.UniMax.allocate(
        sizes.crossJoin(broadcast(total)),
        col("c_id"), col("n_vecs"), expr("__total div 2"), maxEpochsMilli = 1000)
      graft.text.UniMax.takeAllocated(asg, col("c_id"), col("vec_id"), alloc)
    }),

    // SemDeDup semantic dedup: IVF-cluster the corpus, then id-ordered
    // greedy keep-one within each cell at cosine >= SemDedupTau. The
    // oracle replays the identical IVF build (shared CTE prefix with
    // q_ann_ivf) and the same pair sweep.
    "q_semdedup" -> ((s, dir) =>
      graft.similarity.SemDedup.semDedup(quantizedCk(s, dir),
        numCentroids = AnnParams.IvfCentroids, lloydIters = AnnParams.IvfLloydIters,
        tau = AnnParams.SemDedupTau,
        maxCellSize = graft.similarity.CellCap.Fixed(AnnParams.SemDedupMaxCell))),

    // PQ-screened SemDeDup: same clustering/policy/output as
    // q_semdedup, but within-cell pairs are scored on PQ codes via a
    // broadcast SDC table first; survivors of the tau−margin screen
    // get the exact integer-cosine re-check at tau. Oracle replays
    // codebooks, encoding, SDC screen and re-check.
    "q_semdedup_pq" -> ((s, dir) =>
      graft.similarity.SemDedup.semDedupPq(quantizedCk(s, dir),
        numCentroids = AnnParams.IvfCentroids, lloydIters = AnnParams.IvfLloydIters,
        tau = AnnParams.SemDedupTau, margin = AnnParams.SemDedupPqMargin,
        m = AnnParams.PqM, subDim = AnnParams.PqSubDim, pqK = AnnParams.PqK,
        pqIters = AnnParams.PqIters,
        maxCellSize = graft.similarity.CellCap.Fixed(AnnParams.SemDedupMaxCell))),

    // IVF-PQ ANN: q_ann_ivf's coarse quantizer + per-subspace
    // product-quantization codebooks, ADC shortlist, exact re-rank.
    // The oracle replays the whole thing — coarse build (shared CTE
    // prefix), 4 per-subspace Lloyd chains, encoding, ADC, re-rank.
    "q_ann_ivfpq" -> ((s, dir) => {
      val corpus = quantizedCk(s, dir)
      val qs = corpus.filter(pmod(col("vec_id"), lit(AnnParams.QueryMod)) === 0)
      graft.similarity.PqAnn.annIvfPq(corpus, qs,
          k = AnnParams.IvfK, numCentroids = AnnParams.IvfCentroids,
          nprobe = AnnParams.IvfNprobe, lloydIters = AnnParams.IvfLloydIters,
          m = AnnParams.PqM, subDim = AnnParams.PqSubDim, pqK = AnnParams.PqK,
          pqIters = AnnParams.PqIters, refine = AnnParams.PqRefine)
        .withColumn("rank", col("rank").cast("bigint"))
    }),

    // §2.4/28h2 ANN-backed mutual-kNN: the corpus-scale form of
    // q_mutual_knn — the brute population-vs-itself pass is replaced
    // by an IVF pre-screen (cells from a deterministic Lloyd build,
    // candidates from the probe⋈inverted-list cell join), so nothing
    // population-sized broadcasts. The oracle replays the ENTIRE
    // chain: population slice, IVF build, nprobe probe, exact ranked
    // cosine, reciprocal self-join.
    "q_mutual_knn_ann" -> ((s, dir) => {
      val corpus = quantizedCk(s, dir)
      val pop = corpus.filter(pmod(col("vec_id"), lit(AnnParams.MutualMod)) === 0)
      Similarity.mutualKnnAnn(pop, AnnParams.MutualK,
          numCentroids = AnnParams.MutualAnnCentroids,
          nprobe = AnnParams.MutualAnnNprobe,
          lloydIters = AnnParams.MutualAnnIters)
        .withColumn("rank_ab", col("rank_ab").cast("bigint"))
        .withColumn("rank_ba", col("rank_ba").cast("bigint"))
    }),

    // §2.4/28h3 PQ-screened mutual-kNN: q_mutual_knn_ann's IVF
    // pre-screen with the inverted lists carrying PQ CODES instead of
    // exact vectors (the 8× memory squeeze), candidates scored by ADC
    // lookup, a MutualPqRefine-deep shortlist re-ranked by exact
    // integer cosine, then the reciprocal tail. The oracle replays
    // EVERYTHING on the population slice: coarse build, per-subspace
    // codebook Lloyd chains, encoding, ADC, shortlist, exact re-rank,
    // reciprocity — both pruning knobs (nprobe < centroids,
    // refine < |pop|) exercised.
    "q_mutual_knn_pq" -> ((s, dir) => {
      val corpus = quantizedCk(s, dir)
      val pop = corpus.filter(pmod(col("vec_id"), lit(AnnParams.MutualMod)) === 0)
      Similarity.mutualKnnPq(pop, AnnParams.MutualK,
          numCentroids = AnnParams.MutualAnnCentroids,
          nprobe = AnnParams.MutualAnnNprobe,
          lloydIters = AnnParams.MutualAnnIters,
          m = AnnParams.PqM, subDim = AnnParams.PqSubDim,
          pqK = AnnParams.PqK, pqIters = AnnParams.PqIters,
          refine = AnnParams.MutualPqRefine)
        .withColumn("rank_ab", col("rank_ab").cast("bigint"))
        .withColumn("rank_ba", col("rank_ba").cast("bigint"))
    })
  )

  /** Quantized cosine between two aliased relations (integer dot cast
    * to double over the product of norms — the exact operand order the
    * Spark side uses, so doubles are bit-equal). */
  private def cosSql(a: String, ae: String, an: String, b: String, be: String, bn: String): String =
    s"CAST(CAST(list_sum(list_transform(range(len($a.$ae)), i -> $a.$ae[i+1] * $b.$be[i+1])) AS BIGINT) AS DOUBLE)" +
      s" / (sqrt(CAST($a.$an AS DOUBLE)) * sqrt(CAST($b.$bn AS DOUBLE)))"

  /** IVF-build replay, generated from [[AnnParams]]: the WITH-prefix
    * covering quantized corpus `n`, seeds (non-zero norm, smallest
    * vec_ids), `iters` assign/floor-mean rounds (each guarded
    * cnrm > 0, mirroring IvfAnn.centroids), and the final inverted-list
    * assignment `asg(vec_id, c_id)`. `src` names the CTE the build
    * clusters (the full corpus `n`, or a slice declared via `extra`);
    * shared by the q_ann_ivf / q_semdedup / q_mutual_knn_ann oracles —
    * one replay, several consumers, zero drift.
    * Returns (ctePrefix, finalCentroidCteName). */
  private def ivfBuildCtesOn(src: String, centroids: Int, iters: Int,
      extra: String = ""): (String, String) = {
    // one Lloyd round: assign corpus to cents `prev` → rebuild `c$i`
    def round(i: Int, prev: String): String = {
      val cos = cosSql(src, "e", "nrm", "p", "ce", "cnrm")
      raw"""a$i AS (
           |  SELECT vec_id, c_id FROM (
           |    SELECT $src.vec_id, p.c_id,
           |           row_number() OVER (PARTITION BY $src.vec_id ORDER BY $cos DESC, p.c_id ASC) AS rn
           |    FROM $src CROSS JOIN $prev p
           |  ) WHERE rn = 1
           |),
           |e$i AS (
           |  SELECT a$i.c_id, unnest(range(len($src.e))) AS i, unnest($src.e) AS v
           |  FROM a$i JOIN $src ON a$i.vec_id = $src.vec_id
           |),
           |m$i AS (
           |  SELECT c_id, i, CAST(floor(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
           |  FROM e$i GROUP BY c_id, i
           |),
           |l$i AS (SELECT c_id, list(m ORDER BY i) AS ce FROM m$i GROUP BY c_id),
           |c$i AS (
           |  SELECT * FROM (
           |    SELECT c_id, ce, CAST(list_sum(list_transform(ce, x -> x * x)) AS BIGINT) AS cnrm
           |    FROM l$i
           |  ) WHERE cnrm > 0
           |)""".stripMargin
    }
    val rounds = (1 to iters)
      .map(i => round(i, if (i == 1) "seeds" else s"c${i - 1}"))
      .mkString(",\n")
    val fin = s"c$iters"
    val finCos = cosSql(src, "e", "nrm", "c", "ce", "cnrm")
    val extraPart = if (extra.isEmpty) "" else s"\n$extra,"
    val prefix = raw"""WITH ${DedupQueries.quantCte},$extraPart
         |seeds AS (
         |  SELECT vec_id AS c_id, e AS ce, nrm AS cnrm FROM $src
         |  WHERE nrm > 0 ORDER BY vec_id LIMIT $centroids
         |),
         |$rounds,
         |asg AS (
         |  SELECT vec_id, c_id FROM (
         |    SELECT $src.vec_id, c.c_id,
         |           row_number() OVER (PARTITION BY $src.vec_id ORDER BY $finCos DESC, c.c_id ASC) AS rn
         |    FROM $src CROSS JOIN $fin c
         |  ) WHERE rn = 1
         |)""".stripMargin
    (prefix, fin)
  }

  private lazy val ivfBuildCtes: (String, String) =
    ivfBuildCtesOn("n", AnnParams.IvfCentroids, AnnParams.IvfLloydIters)

  /** Full IVF ANN replay: the shared build prefix, then the nprobe
    * probe and exact ranked cosine over the probed cells. */
  private val annIvfSql: String = {
    import AnnParams.{IvfK, IvfNprobe, QueryMod}
    val (prefix, fin) = ivfBuildCtes
    val finCos = cosSql("n", "e", "nrm", "c", "ce", "cnrm")
    raw"""$prefix,
         |probe AS (
         |  SELECT q_id, c_id FROM (
         |    SELECT n.vec_id AS q_id, c.c_id,
         |           row_number() OVER (PARTITION BY n.vec_id ORDER BY $finCos DESC, c.c_id ASC) AS rn
         |    FROM n CROSS JOIN $fin c WHERE n.vec_id % $QueryMod = 0
         |  ) WHERE rn <= $IvfNprobe
         |),
         |cand AS (
         |  SELECT p.q_id, b.vec_id AS neighbor_id, ${cosSql("a", "e", "nrm", "b", "e", "nrm")} AS cos
         |  FROM probe p
         |  JOIN asg g ON p.c_id = g.c_id
         |  JOIN n b ON g.vec_id = b.vec_id
         |  JOIN n a ON p.q_id = a.vec_id
         |  WHERE p.q_id <> b.vec_id
         |)
         |SELECT q_id, neighbor_id, rank, cos FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM cand
         |) WHERE rank <= $IvfK""".stripMargin
  }

  /** SemDeDup replay: the shared IVF-build prefix, then members with
    * vectors, the id-ordered within-cell duplicate sweep, and the
    * per-vector verdict. */
  /** IVF-PQ replay, generated from [[AnnParams]]: the shared coarse
    * build prefix, then per subspace s — sub-vectors (q0_s), seed
    * codewords by smallest vec_ids (k0_s), PqIters integer-L2
    * assign/floor-mean rounds, dense re-numbering (dn_s), final
    * encoding assignment (f_s) — then the code table (enc), the
    * nprobe coarse probe, ADC scoring via the per-subspace codeword
    * join, the PqRefine shortlist, and the exact cosine re-rank.
    * MATERIALIZED is load-bearing exactly as in the BPE chain: the
    * per-round CTEs are referenced several times each and DuckDB
    * inlines plain CTEs. */
  /** The PQ build replay shared by the q_ann_ivfpq, q_semdedup_pq and
    * q_mutual_knn_pq oracles: per-subspace Lloyd chains, dense
    * re-numbering, the code table `enc(vec_id, codes)` and the
    * codeword table `dna(s, dcid, ce, cnrm)`. `src` names the CTE the
    * codebooks train on (the full corpus `n`, or a declared slice). */
  private def pqBuildCtesOn(src: String): String = {
    import AnnParams.{PqIters, PqK, PqM, PqSubDim}
    def subDot(se: String, ce: String) =
      s"CAST(list_sum(list_transform(range($PqSubDim), j -> $se[j + 1] * $ce[j + 1])) AS BIGINT)"
    def subChain(s: Int): String = {
      val q0 = raw"""q0_$s AS MATERIALIZED (
           |  SELECT vec_id, list_transform(range($PqSubDim), j -> e[${s * PqSubDim} + j + 1]) AS se
           |  FROM $src
           |)""".stripMargin
      val k0 = raw"""k0_$s AS (
           |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, se AS ce,
           |         CAST(list_sum(list_transform(se, x -> x * x)) AS BIGINT) AS cnrm
           |  FROM (SELECT vec_id, se FROM q0_$s ORDER BY vec_id LIMIT $PqK)
           |)""".stripMargin
      val rounds = (1 to PqIters).map { i =>
        raw"""a${i}_$s AS MATERIALIZED (
             |  SELECT vec_id, cid FROM (
             |    SELECT v.vec_id, c.cid,
             |           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             |             c.cnrm - 2 * ${subDot("v.se", "c.ce")} ASC, c.cid ASC) AS rn
             |    FROM q0_$s v CROSS JOIN k${i - 1}_$s c
             |  ) WHERE rn = 1
             |),
             |g${i}_$s AS (
             |  SELECT cid, j, CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS mu
             |  FROM (SELECT a.cid, unnest(range(len(v.se))) AS j, unnest(v.se) AS x
             |        FROM a${i}_$s a JOIN q0_$s v ON a.vec_id = v.vec_id)
             |  GROUP BY cid, j
             |),
             |k${i}_$s AS MATERIALIZED (
             |  SELECT cid, ce, CAST(list_sum(list_transform(ce, x -> x * x)) AS BIGINT) AS cnrm
             |  FROM (SELECT cid, list(mu ORDER BY j) AS ce FROM g${i}_$s GROUP BY cid)
             |)""".stripMargin
      }.mkString(",\n")
      val dn = raw"""dn_$s AS MATERIALIZED (
           |  SELECT CAST(row_number() OVER (ORDER BY cid) - 1 AS INT) AS dcid, ce, cnrm
           |  FROM k${PqIters}_$s
           |)""".stripMargin
      val f = raw"""f_$s AS (
           |  SELECT vec_id, dcid FROM (
           |    SELECT v.vec_id, d.dcid,
           |           row_number() OVER (PARTITION BY v.vec_id ORDER BY
           |             d.cnrm - 2 * ${subDot("v.se", "d.ce")} ASC, d.dcid ASC) AS rn
           |    FROM q0_$s v CROSS JOIN dn_$s d
           |  ) WHERE rn = 1
           |)""".stripMargin
      Seq(q0, k0, rounds, dn, f).mkString(",\n")
    }
    val chains = (0 until PqM).map(subChain).mkString(",\n")
    val encArms = (0 until PqM)
      .map(s => s"SELECT vec_id, $s AS s, dcid FROM f_$s").mkString("\n    UNION ALL ")
    val dnaArms = (0 until PqM)
      .map(s => s"SELECT $s AS s, dcid, ce, cnrm FROM dn_$s").mkString("\n    UNION ALL ")
    raw"""$chains,
         |enc AS MATERIALIZED (
         |  SELECT vec_id, list(dcid ORDER BY s) AS codes
         |  FROM ($encArms) GROUP BY vec_id
         |),
         |dna AS MATERIALIZED (
         |  $dnaArms
         |)""".stripMargin
  }

  private lazy val pqBuildCtes: String = pqBuildCtesOn("n")

  private val annIvfPqSql: String = {
    import AnnParams.{IvfK, IvfNprobe, PqRefine, PqSubDim, QueryMod}
    val (prefix, fin) = ivfBuildCtes
    val finCos = cosSql("n", "e", "nrm", "c", "ce", "cnrm")
    val exactCos = cosSql("a", "e", "nrm", "b", "e", "nrm")
    raw"""$prefix,
         |$pqBuildCtes,
         |probe AS (
         |  SELECT q_id, c_id FROM (
         |    SELECT n.vec_id AS q_id, c.c_id,
         |           row_number() OVER (PARTITION BY n.vec_id ORDER BY $finCos DESC, c.c_id ASC) AS rn
         |    FROM n CROSS JOIN $fin c WHERE n.vec_id % $QueryMod = 0
         |  ) WHERE rn <= $IvfNprobe
         |),
         |cand AS (
         |  SELECT p.q_id, g.vec_id FROM probe p JOIN asg g ON p.c_id = g.c_id
         |  WHERE p.q_id <> g.vec_id
         |),
         |adc AS MATERIALIZED (
         |  SELECT c.q_id, c.vec_id,
         |         CAST(sum(CAST(list_sum(list_transform(range($PqSubDim), j -> a.e[d.s * $PqSubDim + j + 1] * d.ce[j + 1])) AS BIGINT)) AS BIGINT) AS adot,
         |         CAST(sum(d.cnrm) AS BIGINT) AS anrm,
         |         max(a.nrm) AS qnrm
         |  FROM cand c
         |  JOIN n a ON c.q_id = a.vec_id
         |  JOIN enc e2 ON c.vec_id = e2.vec_id
         |  JOIN dna d ON d.dcid = e2.codes[d.s + 1]
         |  GROUP BY c.q_id, c.vec_id
         |),
         |sl AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id,
         |           row_number() OVER (PARTITION BY q_id ORDER BY
         |             CASE WHEN anrm <= 0 OR qnrm <= 0 THEN CAST(-2.0 AS DOUBLE)
         |                  ELSE CAST(adot AS DOUBLE) / (sqrt(CAST(anrm AS DOUBLE)) * sqrt(CAST(qnrm AS DOUBLE))) END DESC,
         |             vec_id ASC) AS rn
         |    FROM adc
         |  ) WHERE rn <= $PqRefine
         |)
         |SELECT q_id, neighbor_id, rank, cos FROM (
         |  SELECT s.q_id, b.vec_id AS neighbor_id, $exactCos AS cos,
         |         row_number() OVER (PARTITION BY s.q_id ORDER BY $exactCos DESC, b.vec_id ASC) AS rank
         |  FROM sl s JOIN n b ON s.vec_id = b.vec_id JOIN n a ON s.q_id = a.vec_id
         |) WHERE rank <= $IvfK""".stripMargin
  }

  /** ANN-backed mutual-kNN replay: the IVF build runs over the
    * MutualMod population slice `pop` (MutualAnnCentroids cells,
    * MutualAnnIters rounds), every population vector probes its
    * MutualAnnNprobe nearest cells, exact cosine ranks the probed-cell
    * candidates to MutualK, and the reciprocal self-join keeps pairs
    * ranked mutually — q_mutual_knn's tail verbatim. */
  private val mutualKnnAnnSql: String = {
    import AnnParams.{MutualAnnCentroids, MutualAnnIters, MutualAnnNprobe, MutualK, MutualMod}
    val (prefix, fin) = ivfBuildCtesOn("pop", MutualAnnCentroids, MutualAnnIters,
      extra = s"pop AS (SELECT * FROM n WHERE vec_id % $MutualMod = 0)")
    val finCos = cosSql("pop", "e", "nrm", "c", "ce", "cnrm")
    raw"""$prefix,
         |probe AS (
         |  SELECT q_id, c_id FROM (
         |    SELECT pop.vec_id AS q_id, c.c_id,
         |           row_number() OVER (PARTITION BY pop.vec_id ORDER BY $finCos DESC, c.c_id ASC) AS rn
         |    FROM pop CROSS JOIN $fin c
         |  ) WHERE rn <= $MutualAnnNprobe
         |),
         |cand AS (
         |  SELECT p.q_id, b.vec_id AS nid, ${cosSql("a", "e", "nrm", "b", "e", "nrm")} AS cos
         |  FROM probe p
         |  JOIN asg g ON p.c_id = g.c_id
         |  JOIN pop b ON g.vec_id = b.vec_id
         |  JOIN pop a ON p.q_id = a.vec_id
         |  WHERE p.q_id <> b.vec_id
         |),
         |knn AS (
         |  SELECT q_id, nid, cos, rnk FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, nid ASC) AS rnk
         |    FROM cand
         |  ) WHERE rnk <= $MutualK
         |)
         |SELECT a.q_id AS id_a, a.nid AS id_b,
         |       CAST(a.rnk AS BIGINT) AS rank_ab,
         |       CAST(b.rnk AS BIGINT) AS rank_ba, a.cos
         |FROM knn a JOIN knn b ON a.q_id = b.nid AND a.nid = b.q_id
         |WHERE a.q_id < a.nid""".stripMargin
  }

  /** PQ-screened mutual-kNN replay: the coarse build and PQ codebooks
    * both train on the MutualMod population slice `pop`; every
    * population vector probes MutualAnnNprobe cells, probed-cell
    * candidates are ADC-scored against the per-query codeword lookup,
    * the MutualPqRefine shortlist gets the exact cosine re-rank to
    * MutualK, and the reciprocal self-join keeps mutual pairs. */
  private val mutualKnnPqSql: String = {
    import AnnParams.{MutualAnnCentroids, MutualAnnIters, MutualAnnNprobe, MutualK,
      MutualMod, MutualPqRefine, PqSubDim}
    val (prefix, fin) = ivfBuildCtesOn("pop", MutualAnnCentroids, MutualAnnIters,
      extra = s"pop AS (SELECT * FROM n WHERE vec_id % $MutualMod = 0)")
    val finCos = cosSql("pop", "e", "nrm", "c", "ce", "cnrm")
    val exactCos = cosSql("a", "e", "nrm", "b", "e", "nrm")
    raw"""$prefix,
         |${pqBuildCtesOn("pop")},
         |probe AS (
         |  SELECT q_id, c_id FROM (
         |    SELECT pop.vec_id AS q_id, c.c_id,
         |           row_number() OVER (PARTITION BY pop.vec_id ORDER BY $finCos DESC, c.c_id ASC) AS rn
         |    FROM pop CROSS JOIN $fin c
         |  ) WHERE rn <= $MutualAnnNprobe
         |),
         |cand AS (
         |  SELECT p.q_id, g.vec_id FROM probe p JOIN asg g ON p.c_id = g.c_id
         |  WHERE p.q_id <> g.vec_id
         |),
         |adc AS MATERIALIZED (
         |  SELECT c.q_id, c.vec_id,
         |         CAST(sum(CAST(list_sum(list_transform(range($PqSubDim), j -> a.e[d.s * $PqSubDim + j + 1] * d.ce[j + 1])) AS BIGINT)) AS BIGINT) AS adot,
         |         CAST(sum(d.cnrm) AS BIGINT) AS anrm,
         |         max(a.nrm) AS qnrm
         |  FROM cand c
         |  JOIN pop a ON c.q_id = a.vec_id
         |  JOIN enc e2 ON c.vec_id = e2.vec_id
         |  JOIN dna d ON d.dcid = e2.codes[d.s + 1]
         |  GROUP BY c.q_id, c.vec_id
         |),
         |sl AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id,
         |           row_number() OVER (PARTITION BY q_id ORDER BY
         |             CASE WHEN anrm <= 0 OR qnrm <= 0 THEN CAST(-2.0 AS DOUBLE)
         |                  ELSE CAST(adot AS DOUBLE) / (sqrt(CAST(anrm AS DOUBLE)) * sqrt(CAST(qnrm AS DOUBLE))) END DESC,
         |             vec_id ASC) AS rn
         |    FROM adc
         |  ) WHERE rn <= $MutualPqRefine
         |),
         |knn AS (
         |  SELECT q_id, nid, cos, rnk FROM (
         |    SELECT s.q_id, b.vec_id AS nid, $exactCos AS cos,
         |           row_number() OVER (PARTITION BY s.q_id ORDER BY $exactCos DESC, b.vec_id ASC) AS rnk
         |    FROM sl s JOIN pop b ON s.vec_id = b.vec_id JOIN pop a ON s.q_id = a.vec_id
         |  ) WHERE rnk <= $MutualK
         |)
         |SELECT a.q_id AS id_a, a.nid AS id_b,
         |       CAST(a.rnk AS BIGINT) AS rank_ab,
         |       CAST(b.rnk AS BIGINT) AS rank_ba, a.cos
         |FROM knn a JOIN knn b ON a.q_id = b.nid AND a.nid = b.q_id
         |WHERE a.q_id < a.nid""".stripMargin
  }

  private val semDedupSql: String = {
    val (prefix, _) = ivfBuildCtes
    raw"""$prefix,
         |mem AS (
         |  SELECT g.vec_id, g.c_id, b.e, b.nrm FROM asg g JOIN n b ON g.vec_id = b.vec_id
         |),
         |dups AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM mem a JOIN mem b ON a.c_id = b.c_id AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a", "e", "nrm", "b", "e", "nrm")} >= ${AnnParams.SemDedupTau}
         |)
         |SELECT m.vec_id, m.c_id, (d.vec_id IS NOT NULL) AS is_dup
         |FROM mem m LEFT JOIN dups d ON m.vec_id = d.vec_id""".stripMargin
  }

  /** PQ-screened SemDeDup replay: coarse prefix + PQ build, then the
    * within-cell pair set scored on codes (symmetric distance via the
    * per-subspace codeword join — the oracle's SDC), the tau−margin
    * screen, and the exact integer-cosine re-check at tau. */
  private val semDedupPqSql: String = {
    import AnnParams.{PqSubDim, SemDedupPqMargin, SemDedupTau}
    val (prefix, _) = ivfBuildCtes
    val screen = SemDedupTau - SemDedupPqMargin
    raw"""$prefix,
         |$pqBuildCtes,
         |prs AS (
         |  SELECT a.vec_id AS va, b.vec_id AS vb
         |  FROM asg a JOIN asg b ON a.c_id = b.c_id AND a.vec_id < b.vec_id
         |),
         |apx AS MATERIALIZED (
         |  SELECT p.va, p.vb,
         |         CAST(sum(CAST(list_sum(list_transform(range($PqSubDim), j -> da.ce[j + 1] * db.ce[j + 1])) AS BIGINT)) AS BIGINT) AS adot,
         |         CAST(sum(da.cnrm) AS BIGINT) AS anrm,
         |         CAST(sum(db.cnrm) AS BIGINT) AS bnrm
         |  FROM prs p
         |  JOIN enc ea ON p.va = ea.vec_id
         |  JOIN enc eb ON p.vb = eb.vec_id
         |  JOIN dna da ON da.dcid = ea.codes[da.s + 1]
         |  JOIN dna db ON db.s = da.s AND db.dcid = eb.codes[db.s + 1]
         |  GROUP BY 1, 2
         |),
         |cand AS (
         |  SELECT va, vb FROM apx
         |  WHERE CASE WHEN anrm <= 0 OR bnrm <= 0 THEN CAST(-2.0 AS DOUBLE)
         |             ELSE CAST(adot AS DOUBLE) / (sqrt(CAST(anrm AS DOUBLE)) * sqrt(CAST(bnrm AS DOUBLE))) END >= $screen
         |),
         |dups AS (
         |  SELECT DISTINCT c.vb AS vec_id
         |  FROM cand c JOIN n a ON c.va = a.vec_id JOIN n b ON c.vb = b.vec_id
         |  WHERE ${cosSql("a", "e", "nrm", "b", "e", "nrm")} >= $SemDedupTau
         |)
         |SELECT g.vec_id, g.c_id, (d.vec_id IS NOT NULL) AS is_dup
         |FROM asg g LEFT JOIN dups d ON g.vec_id = d.vec_id""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q_global_rank" ->
      raw"""SELECT doc_id,
           |       CAST(row_number() OVER (
           |         ORDER BY substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'),
           |                         1, ${PrepParams.SnmKeyLen}),
           |                  doc_id) - 1 AS BIGINT) AS rank
           |FROM documents""".stripMargin,
    "q_shuffle_rank" ->
      """SELECT doc_id,
        |       CAST(row_number() OVER (
        |         ORDER BY md5('42' || '|' || CAST(doc_id AS VARCHAR)),
        |                  CAST(doc_id AS VARCHAR)) - 1 AS BIGINT) AS shuffle_rank
        |FROM documents""".stripMargin,
    "q_scd2" ->
      """SELECT event_id, user_id, event_type,
        |       CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
        |       CAST(lead(epoch_us(ts)) OVER w AS BIGINT) AS valid_to_us,
        |       lead(epoch_us(ts)) OVER w IS NULL AS is_current
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)""".stripMargin,
    "q_ann_ivf" -> annIvfSql,
    "q_mutual_knn_ann" -> mutualKnnAnnSql,
    "q_mutual_knn_pq" -> mutualKnnPqSql,
    "q_cluster_sample" -> {
      val (prefix, _) = ivfBuildCtes
      raw"""$prefix,
           |b AS (
           |  SELECT c_id AS lang, tokens, (tokens * 1000) // 1000 AS capacity,
           |         total // 2 AS B
           |  FROM (SELECT c_id, CAST(count(*) AS BIGINT) AS tokens FROM asg GROUP BY 1)
           |  CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS total FROM asg)),
           |${PipelineQueries.unimaxChainCtes}
           |SELECT vec_id, c_id FROM (
           |  SELECT g.vec_id, g.c_id, a.alloc,
           |         row_number() OVER (PARTITION BY g.c_id
           |           ORDER BY md5(CAST(g.vec_id AS VARCHAR)), g.vec_id) AS rn
           |  FROM asg g JOIN alloc a ON g.c_id = a.lang
           |) WHERE rn <= alloc""".stripMargin
    },

    "q_cluster_stats" -> {
      val (prefix, _) = ivfBuildCtes
      raw"""$prefix,
           |clab AS (
           |  SELECT g.c_id, n.label, count(*) AS nl
           |  FROM asg g JOIN n ON g.vec_id = n.vec_id GROUP BY 1, 2),
           |ctot AS (SELECT c_id, CAST(sum(nl) AS BIGINT) AS n FROM clab GROUP BY 1)
           |SELECT c_id, n, label AS top_label, nl AS top_n,
           |       (nl * 1000) // n AS purity_milli
           |FROM (
           |  SELECT l.c_id, t.n, l.label, CAST(l.nl AS BIGINT) AS nl,
           |         row_number() OVER (PARTITION BY l.c_id ORDER BY l.nl DESC, l.label ASC) AS rn
           |  FROM clab l JOIN ctot t USING (c_id)
           |) WHERE rn = 1""".stripMargin
    },
    "q_ann_ivfpq" -> annIvfPqSql,
    "q_semdedup" -> semDedupSql,
    "q_semdedup_pq" -> semDedupPqSql,
    "q_zone_prune" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |       l_quantity, l_extendedprice, l_returnflag, l_linestatus
        |FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 1999""".stripMargin,
    "q_moving_sum" ->
      """SELECT event_id,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT))
        |         OVER (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov_sum
        |FROM events""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       count(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "q_except" ->
      """SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT
        |SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000""".stripMargin,
    "q_intersect" ->
      """SELECT l_suppkey FROM lineitem
        |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        |INTERSECT
        |SELECT l_suppkey FROM lineitem
        |WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'""".stripMargin,
    "q_median" ->
      """SELECT event_type,
        |       median(CAST(round(value * 100) AS BIGINT)) AS median_cents
        |FROM events GROUP BY event_type""".stripMargin,
    "q_embed_centroid" ->
      raw"""WITH q AS (
           |  SELECT label,
           |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS e
           |  FROM embeddings
           |)
           |SELECT label, i, CAST(sum(e[i+1]) AS BIGINT) AS s, count(*) AS n
           |FROM q, (SELECT unnest(range(64)) AS i) t
           |GROUP BY label, i""".stripMargin,
    "q_asof_join" ->
      """WITH clicks AS (SELECT user_id, event_id, epoch_us(ts) AS c_us FROM events WHERE event_type = 'click'),
        |     signups AS (SELECT user_id, event_id AS s_id, epoch_us(ts) AS s_us FROM events WHERE event_type = 'signup')
        |SELECT clicks.event_id, s_id, s_us
        |FROM clicks ASOF LEFT JOIN signups
        |  ON clicks.user_id = signups.user_id AND clicks.c_us >= signups.s_us""".stripMargin,
    "q_asof_nearest" ->
      """WITH clicks AS (SELECT user_id, event_id, epoch_us(ts) AS c_us FROM events WHERE event_type = 'click'),
        |     signups AS (SELECT user_id, event_id AS s_id, epoch_us(ts) AS s_us FROM events WHERE event_type = 'signup'),
        |b AS (SELECT clicks.event_id, c_us, s_id AS b_id, s_us AS b_us
        |      FROM clicks ASOF LEFT JOIN signups
        |        ON clicks.user_id = signups.user_id AND clicks.c_us >= signups.s_us),
        |f AS (SELECT clicks.event_id, s_id AS f_id, s_us AS f_us
        |      FROM clicks ASOF LEFT JOIN signups
        |        ON clicks.user_id = signups.user_id AND clicks.c_us <= signups.s_us)
        |SELECT b.event_id,
        |       CASE WHEN b_us IS NULL THEN f_id WHEN f_us IS NULL THEN b_id
        |            WHEN c_us - b_us <= f_us - c_us THEN b_id ELSE f_id END AS s_id,
        |       CASE WHEN b_us IS NULL THEN f_us WHEN f_us IS NULL THEN b_us
        |            WHEN c_us - b_us <= f_us - c_us THEN b_us ELSE f_us END AS s_us
        |FROM b JOIN f USING (event_id)""".stripMargin,
    "q_asof_forward" ->
      """WITH clicks AS (SELECT user_id, event_id, epoch_us(ts) AS c_us FROM events WHERE event_type = 'click'),
        |     purchases AS (SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_us FROM events WHERE event_type = 'purchase')
        |SELECT clicks.event_id, p_id, p_us
        |FROM clicks ASOF LEFT JOIN purchases
        |  ON clicks.user_id = purchases.user_id AND clicks.c_us <= purchases.p_us""".stripMargin,
    "q_range_join" ->
      """WITH c AS (SELECT user_id, event_id AS c_id, epoch_us(ts) AS c_us FROM events WHERE event_type = 'click'),
        |     p AS (SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_us FROM events WHERE event_type = 'purchase')
        |SELECT c_id, p_id
        |FROM c JOIN p ON c.user_id = p.user_id AND p.p_us BETWEEN c.c_us AND c.c_us + 3600000000""".stripMargin,
    "q_interval_join" ->
      """WITH iv AS (
        |  SELECT user_id, event_type AS et, date_trunc('day', ts) AS d,
        |         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 4 AS bk,
        |         epoch_us(min(ts)) AS s, epoch_us(max(ts)) AS e
        |  FROM events GROUP BY 1, 2, 3, 4),
        |p AS (
        |  SELECT a.user_id AS ua, b.user_id AS ub
        |  FROM iv a JOIN iv b ON a.d = b.d AND a.et = b.et AND a.bk = b.bk
        |                      AND a.user_id < b.user_id
        |                      AND a.s <= b.e AND b.s <= a.e),
        |c AS (SELECT ua, ub, count(*) AS n_windows FROM p GROUP BY 1, 2)
        |SELECT ua AS user_a, ub AS user_b, CAST(n_windows AS BIGINT) AS n_windows,
        |       CAST(row_number() OVER (ORDER BY n_windows DESC, ua, ub) AS INTEGER) AS rank
        |FROM c ORDER BY n_windows DESC, ua, ub LIMIT 25""".stripMargin,
    "q_weighted_avg" ->
      """SELECT l_returnflag,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE)
        |         / sum(CAST(l_quantity AS BIGINT)) AS w_mean
        |FROM lineitem GROUP BY l_returnflag""".stripMargin
  )
}
