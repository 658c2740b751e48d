package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** Similarity search over embedding columns (SURVEY.md §2.4).
  *
  * Two tiers:
  *   - Brute-force cosine top-k: broadcast the (small) query set
  *     against the corpus — no shuffle over the corpus, one window
  *     per query for ranking.
  *   - LSH (random hyperplane) ANN: signature buckets computed per
  *     row (narrow), candidates from a bucket equi-join — the scale
  *     path when the query set is itself huge.
  *
  * Numeric portability: [[quantize]] maps float vectors to integral
  * 1e-6 grid longs; dot/norm over longs are exact integer math, so
  * cosine values are bit-identical in any engine (the DuckDB oracle
  * mirrors them). The double-precision fast path skips quantization.
  */
object Similarity {

  /** Quantize a float vector column to longs on the 1e-6 grid. */
  def quantize(v: Column): Column =
    transform(v, x => round(x.cast("double") * 1e6).cast("long"))

  /** Exact integer dot product of two quantized vectors — native
    * codegen'd Catalyst expression (tight primitive loop inside
    * whole-stage codegen; see graft.plans.DotProductLong). */
  def dotQ(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftFunctions.dotLong(a, b)

  /** HOF formulation of dotQ (interpreted) — reference semantics the
    * native expression is spec-checked against. */
  def dotQHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Double-precision dot product (fast path, no quantization). */
  def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity between two quantized vectors (deterministic
    * operand order: dot / (sqrt(na) * sqrt(nb))). */
  def cosineQ(dot: Column, normA: Column, normB: Column): Column =
    dot.cast("double") / (sqrt(normA.cast("double")) * sqrt(normB.cast("double")))

  /** Corpus prepared for quantized cosine: id, payload cols, quantized
    * vector `e` and its exact squared norm `nrm`. */
  def prepareQuantized(df: DataFrame, vec: Column, id: Column, extra: Column*): DataFrame =
    df.select(id.as("vec_id") +: extra :+ quantize(vec).as("e"): _*)
      .withColumn("nrm", dotQ(col("e"), col("e")))

  /** Int8 scalar quantization (SQ8) — the memory-side half of ANN at
    * scale: each vector compresses 8× to per-vector (min, max) plus
    * one byte per dimension, the standard trick for fitting billions
    * of embeddings in RAM (FAISS SQ8). Codes are round-half-up
    * `(v−mn)·255/(mx−mn)` computed ENTIRELY in integer arithmetic on
    * the 1e-6 grid, so codes and reconstruction error are bit-equal
    * across engines and shuffle orders. Returns per vector: (vec_id,
    * mn, mx, sum_codes, err_total) — sum_codes as a cheap code-level
    * checksum, err_total the exact L1 reconstruction error in
    * micro-units. Row-parallel, no shuffle. */
  def scalarQuantize(df: DataFrame, vec: Column, id: Column): DataFrame =
    df.select(id.as("vec_id"), quantize(vec).as("__e"))
      .withColumn("mn", array_min(col("__e")))
      .withColumn("mx", array_max(col("__e")))
      .withColumn("codes", expr(
        "CASE WHEN mx = mn THEN transform(__e, v -> CAST(0 AS BIGINT)) " +
        "ELSE transform(__e, v -> ((v - mn) * 510 + (mx - mn)) div ((mx - mn) * 2)) END"))
      .withColumn("err_total", expr(
        "aggregate(zip_with(codes, __e, (q, v) -> abs(mn + (q * (mx - mn) * 2 + 255) div 510 - v)), " +
        "CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .select(col("vec_id"), col("mn"), col("mx"),
        expr("aggregate(codes, CAST(0 AS BIGINT), (a, x) -> a + x)").as("sum_codes"),
        col("err_total"))

  /** Per-group top-k + rank column, backed by the custom GroupTopK
    * operator: bounded heaps select the k rows (partial phase before
    * the exchange — only k rows per (group, partition) shuffle,
    * where window rank would shuffle and sort every candidate), then
    * a window over the ≤ groups·k survivors attaches `rank`. The
    * survivors arrive already clustered on `part`, so the rank window
    * adds no exchange. `order` must be a total order for row_number
    * determinism. */
  private[graft] def rankedTopK(df: DataFrame, part: Column, order: Seq[Column], k: Int): DataFrame = {
    val top = org.apache.spark.sql.graft.GraftPlans.groupTopK(df, Seq(part), order, k)
    top.withColumn("rank", row_number().over(Window.partitionBy(part).orderBy(order: _*)))
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors by quantized cosine. Query side is broadcast; the
    * corpus is scanned once with no shuffle; ranking shuffles only
    * (query, candidate) pairs. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = broadcast(
      queries.select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qnrm"))
    )
      .crossJoin(corpus)
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos", cosineQ(dotQ(col("qe"), col("e")), col("qnrm"), col("nrm")))
    rankedTopK(scored, col("q_id"), Seq(col("cos").desc, col("vec_id").asc), k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cos"))
  }

  /** Mutual-kNN pairs (reciprocal nearest neighbors): (a, b) kept
    * only when b ∈ knn(a) AND a ∈ knn(b) — the classic
    * precision-over-recall tightening of neighbor graphs (one-sided
    * kNN edges into a hub vector are usually noise; mutual edges are
    * the trustworthy ones for dedup candidates, label propagation
    * seeds, or embedding-graph clustering). One row per unordered
    * pair with both directed ranks and the shared integer-grid
    * cosine.
    *
    * Plan shape: ONE [[cosineTopK]] pass over the population (the
    * population broadcasts against itself through a single scan +
    * bounded GroupTopK), then the mutual check is a self-join of the
    * k·N edge list on the reversed key — edge-list-sized, never
    * corpus-sized. The population broadcast bounds this form: for
    * populations past broadcast size use [[mutualKnnAnn]], which
    * replaces the brute pass with an IVF pre-screen and never
    * broadcasts the population. */
  def mutualKnn(population: DataFrame, k: Int): DataFrame =
    reciprocalPairs(graft.operators.Checkpoints.eager(
      cosineTopK(population, population, k)))

  /** Mutual-kNN with an IVF pre-screen — the corpus-scale form of
    * [[mutualKnn]]: the population is clustered by the deterministic
    * IVF coarse quantizer ([[IvfAnn.centroids]]), each vector probes
    * its `nprobe` nearest cells, candidates come from a cell-id
    * equi-join of probes against inverted lists, and the exact
    * integer-cosine top-k + reciprocal self-join run on that bounded
    * candidate stream. Per-vector work drops from O(N) to
    * O(N·nprobe/numCentroids) — at numCentroids ≈ √N
    * ([[IvfAnn.suggestCentroids]]) total pair work is O(nprobe·N^1.5)
    * instead of O(N²), and nothing population-sized is ever broadcast
    * (the only broadcast is the numCentroids-row centroid table; the
    * probe⋈list join shuffles on cell id).
    *
    * Semantics: identical contract to [[mutualKnn]] restricted to the
    * probed-cell neighbor graph — a reciprocal pair is kept iff each
    * side ranks the other within ITS top-k among its own probed
    * candidates. At nprobe = numCentroids the screen is exhaustive
    * and the output is bit-equal to [[mutualKnn]] (SimilaritySpec
    * pins this; IvfRecallSpec covers the recall-vs-nprobe curve). */
  def mutualKnnAnn(population: DataFrame, k: Int, numCentroids: Int, nprobe: Int,
      lloydIters: Int = 1): DataFrame =
    reciprocalPairs(graft.operators.Checkpoints.eager(
      IvfAnn.annIvf(population, population, k, numCentroids, nprobe, lloydIters)))

  /** [[mutualKnnAnn]] against a PERSISTED [[IvfIndex]] — the
    * recurring-pipeline form: `mutualKnnAnn` retrains the coarse
    * quantizer and rebuilds the inverted lists on every call (a
    * measured ~1 s constant at gate scale, dev/scaleup_mutual_r11b),
    * which a nightly job pays pointlessly. Here the index is built
    * once ([[IvfIndex.create]] on the same population) and each run
    * only probes: the bucketed cells table arrives pre-partitioned
    * (zero corpus-side exchange), the stored centroid table is the
    * only broadcast, and the reciprocal tail is unchanged.
    *
    * Bit-equality: [[IvfAnn.centroids]] is deterministic, so an index
    * created with the same (numCentroids, lloydIters) makes this
    * row-identical to the inline `mutualKnnAnn` at the same nprobe/k
    * (SimilaritySpec pins it). The population probed must be the
    * population indexed — reciprocity is only defined within one
    * vector set (append-heavy corpora re-create or
    * [[IvfIndex.rebalance]] when drift warrants,
    * [[IvfIndex.driftStats]] is the gauge). */
  def mutualKnnIndexed(spark: org.apache.spark.sql.SparkSession, table: String,
      population: DataFrame, k: Int, nprobe: Int): DataFrame =
    reciprocalPairs(graft.operators.Checkpoints.eager(
      IvfIndex.probe(spark, table, population, k, nprobe)))

  /** Mutual-kNN with the IVF + PQ pre-screen — the memory-side
    * completion of [[mutualKnnAnn]]: the pre-screen's inverted lists
    * carry `m` one-byte-scale PQ codes per vector instead of the
    * exact vector (the 8× squeeze that fits billion-vector lists in
    * executor memory), candidates are scored by ADC lookup against
    * the query's precomputed table, a `refine`-deep shortlist per
    * vector gets the exact integer-cosine re-rank, and the reciprocal
    * self-join runs on the re-ranked k·N edge list — [[PqAnn.annIvfPq]]
    * composed population-vs-itself, [[mutualKnn]]'s tail verbatim.
    *
    * Semantics: reciprocal pairs within the probed-cell,
    * ADC-shortlisted neighbor graph. At nprobe = numCentroids and
    * refine ≥ population size the screen is exhaustive and the output
    * is bit-equal to [[mutualKnn]] (SimilaritySpec pins this; the
    * q_mutual_knn_pq oracle replays the whole pruned chain —
    * codebooks, encoding, ADC, refine, re-rank, reciprocity). */
  def mutualKnnPq(population: DataFrame, k: Int, numCentroids: Int, nprobe: Int,
      lloydIters: Int, m: Int, subDim: Int, pqK: Int, pqIters: Int,
      refine: Int): DataFrame =
    reciprocalPairs(graft.operators.Checkpoints.eager(
      PqAnn.annIvfPq(population, population, k, numCentroids, nprobe, lloydIters,
        m, subDim, pqK, pqIters, refine)))

  /** [[mutualKnnPq]] against a PERSISTED [[PqIndex]] — the
    * recurring-pipeline form of the PQ screen: `mutualKnnPq` retrains
    * the coarse quantizer AND the m PQ codebooks and re-encodes the
    * population every call (measured as its dominant cost once the
    * scoring folds went native — dev/scaleup_mutual_r13); here the
    * index is built once ([[PqIndex.create]] on the same population)
    * and each run probes the stored codes: native-ADC screen,
    * refine-deep exact re-rank against the population's own vectors,
    * reciprocal tail verbatim. Training determinism + the shared
    * probe tail ([[PqAnn.probeCoded]]) make it row-identical to the
    * inline `mutualKnnPq` at the build's params (PqIndexSpec pins
    * it). The population probed must be the population indexed. */
  def mutualKnnPqIndexed(spark: org.apache.spark.sql.SparkSession, table: String,
      population: DataFrame, k: Int, nprobe: Int, refine: Int): DataFrame =
    reciprocalPairs(graft.operators.Checkpoints.eager(
      PqIndex.probe(spark, table, population, population, k, nprobe, refine)))

  /** Shared mutual tail: keep (a, b) iff each appears in the other's
    * directed top-k edge list — a self-join of the k·N edge list on
    * the reversed key, edge-list-sized, never corpus-sized. */
  private def reciprocalPairs(knn: DataFrame): DataFrame = {
    val rev = knn.select(col("q_id").as("__rq"), col("neighbor_id").as("__rn"),
      col("rank").as("rank_ba"))
    knn.join(rev, col("q_id") === col("__rn") && col("neighbor_id") === col("__rq"))
      .filter(col("q_id") < col("neighbor_id"))
      .select(col("q_id").as("id_a"), col("neighbor_id").as("id_b"),
        col("rank").as("rank_ab"), col("rank_ba"), col("cos"))
  }

  /** kNN label-agreement audit: classify each query vector by
    * majority vote over the labels of its k nearest corpus vectors
    * (quantized cosine), and report the vote against the query's own
    * label — the standard embedding-space sanity check for
    * label/cluster coherence in curation pipelines (a kNN probe).
    *
    * Inputs are [[prepareQuantized]] frames carrying a `label` column.
    * Plan shape: the (small) query set broadcasts against a single
    * corpus scan; GroupTopK bounds the per-query candidate heap before
    * the ONE exchange on q_id; the vote groupBy and argmax window both
    * reuse that q_id clustering, so no further shuffle. Ties are
    * deterministic end-to-end: candidates by (cos desc, vec_id asc),
    * votes by (votes desc, label asc) — bit-identical in any engine
    * thanks to integer-grid cosine. */
  def knnClassify(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = broadcast(
      queries.select(col("vec_id").as("q_id"), col("label").as("true_label"),
        col("e").as("qe"), col("nrm").as("qnrm"))
    )
      .crossJoin(corpus)
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos", cosineQ(dotQ(col("qe"), col("e")), col("qnrm"), col("nrm")))
    val top = rankedTopK(scored, col("q_id"), Seq(col("cos").desc, col("vec_id").asc), k)
    top
      .groupBy(col("q_id"), col("true_label"), col("label").as("cand_label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("vr",
        row_number().over(Window.partitionBy(col("q_id")).orderBy(col("votes").desc, col("cand_label").asc)))
      .filter(col("vr") === 1)
      .select(col("q_id"), col("true_label"), col("cand_label").as("pred_label"),
        col("votes"), (col("true_label") === col("cand_label")).cast("int").as("correct"))
  }

  /** Triplet / hard-negative mining — the contrastive-training data
    * op: for each anchor vector, the single most-similar SAME-label
    * vector (the hardest positive is deliberately NOT used; rank-1
    * positive is the standard batch-hard choice) and the k most
    * similar DIFFERENT-label vectors (the hard negatives), with the
    * margin violation flagged (`neg_cos > pos_cos` — the triplets a
    * metric-learning loss would actually train on).
    *
    * Inputs are [[prepareQuantized]] frames carrying a `label`
    * column. Plan shape: ONE corpus scan — anchors broadcast, every
    * candidate scored once with an `is_neg` flag, and a single
    * GroupTopK over (q_id, is_neg) bounds both the positive and the
    * negative heap before the one exchange; the tiny survivor set is
    * checkpointed so the positive/negative split does not rescan the
    * corpus. The pos⋈neg join is anchor-count-sized. Anchors whose
    * label is singleton keep their negatives with a NULL positive
    * (left join), never silently dropped. Integer-grid cosine makes
    * every tie deterministic cross-engine. */
  def mineTriplets(corpus: DataFrame, anchors: DataFrame, k: Int): DataFrame = {
    val scored = broadcast(
      anchors.select(col("vec_id").as("q_id"), col("label").as("true_label"),
        col("e").as("qe"), col("nrm").as("qnrm"))
    )
      .crossJoin(corpus)
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos", cosineQ(dotQ(col("qe"), col("e")), col("qnrm"), col("nrm")))
      .withColumn("is_neg", (col("label") =!= col("true_label")).cast("int"))
    val top = graft.operators.Checkpoints.eager(
      org.apache.spark.sql.graft.GraftPlans
        .groupTopK(scored, Seq(col("q_id"), col("is_neg")),
          Seq(col("cos").desc, col("vec_id").asc), k)
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("q_id"), col("is_neg"))
            .orderBy(col("cos").desc, col("vec_id").asc)))
        .select(col("q_id"), col("true_label"), col("vec_id"), col("label"),
          col("is_neg"), col("rank"), col("cos")))
    val pos = top.filter(col("is_neg") === 0 && col("rank") === 1)
      .select(col("q_id"), col("vec_id").as("pos_id"), col("cos").as("pos_cos"))
    val neg = top.filter(col("is_neg") === 1)
      .select(col("q_id"), col("true_label"), col("vec_id").as("neg_id"),
        col("label").as("neg_label"), col("rank"), col("cos").as("neg_cos"))
    neg.join(pos, Seq("q_id"), "left")
      .select(col("q_id"), col("true_label"), col("pos_id"), col("pos_cos"),
        col("neg_id"), col("neg_label"), col("rank"), col("neg_cos"),
        (col("neg_cos") > col("pos_cos")).cast("int").as("violation"))
  }

  /** Leave-one-out nearest-centroid probe (Rocchio classification):
    * score every vector against each label's mean vector — with the
    * vector itself REMOVED from its own label's centroid, so the
    * probe never self-leaks — and predict the argmax-cosine label.
    *
    * Exact cross-engine without any division: cosine is
    * scale-invariant, so cos(q, mean) = cos(q, S_l − e_q·[l = l₀])
    * where S_l is the label's quantized SUM vector — integer sums,
    * integer dots, one double division at the end (num = dot(q,S_l) −
    * ind·‖q‖², den = ‖S_l‖² − ind·(2·dot(q,S_l) − ‖q‖²)).
    *
    * Scale shape: the ONLY shuffled data is (label, dim) partial sums
    * and the ≤|labels| centroid rows — the corpus itself is never
    * shuffled; scoring is a broadcast of one centroid-array row and a
    * per-row HOF sweep. Ties argmax to the smaller label (centroids
    * sorted ascending, strict `>` in the fold). */
  def centroidClassify(corpus: DataFrame): DataFrame =
    scoreAgainstCentroids(corpus, labelCentroids(corpus), excludeSelf = true)
      .select(col("vec_id").as("q_id"), col("label").as("true_label"),
        col("best.lab").as("pred_label"), col("best.cos").as("best_cos"),
        (col("label") === col("best.lab")).cast("int").as("correct"))

  /** Per-label quantized SUM vectors + squared norms — the trained
    * "model" side of centroid classification: (label, cs, ss), tiny
    * (≤ |labels| rows), persistable and broadcastable. Only
    * (label, dim) partial sums shuffle; the corpus does not. */
  def labelCentroids(corpus: DataFrame): DataFrame =
    corpus
      .select(col("label"), posexplode(col("e")).as(Seq("i", "v")))
      .groupBy(col("label"), col("i")).agg(sum(col("v")).cast("long").as("s"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(i, s))), x -> x.s)").as("cs"))
      .withColumn("ss", dotQ(col("cs"), col("cs")))

  /** Classify vectors OUTSIDE the training set against a standing
    * [[labelCentroids]] frame (no self-exclusion — the inference
    * form; [[centroidClassify]] is the leave-one-out audit form).
    * Returns (vec_id, pred_label, best_cos); input needs
    * [[prepareQuantized]] shape but no label column. */
  def classifyAgainst(vectors: DataFrame, centroids: DataFrame): DataFrame =
    scoreAgainstCentroids(vectors, centroids, excludeSelf = false)
      .select(col("vec_id"), col("best.lab").as("pred_label"), col("best.cos").as("best_cos"))

  /** Shared centroid scorer: broadcast ONE collected centroid-array
    * row, per-row HOF sweep for argmax cosine (ties to the smaller
    * label — centroids sorted ascending, strict `>` in the fold).
    * With `excludeSelf`, the row's own label's centroid is corrected
    * by −e_q via the three-dot identity (needs a `label` column). */
  private def scoreAgainstCentroids(
      vectors: DataFrame, centroids: DataFrame, excludeSelf: Boolean): DataFrame = {
    val cents = centroids.agg(
      expr("array_sort(collect_list(named_struct('label', label, 'cs', cs, 'ss', ss)))").as("cents"))
    val selfNum =
      if (excludeSelf) "(CASE WHEN label = s.lab THEN nrm ELSE CAST(0 AS BIGINT) END)"
      else "CAST(0 AS BIGINT)"
    val selfDen =
      if (excludeSelf) "(CASE WHEN label = s.lab THEN 2 * s.dsq - nrm ELSE CAST(0 AS BIGINT) END)"
      else "CAST(0 AS BIGINT)"
    vectors
      .crossJoin(broadcast(cents))
      .withColumn("sc1", expr(
        "transform(cents, ct -> named_struct('lab', ct.label, 'ss', ct.ss, " +
          "'dsq', aggregate(zip_with(e, ct.cs, (x, y) -> x * y), CAST(0 AS BIGINT), (a, x) -> a + x)))"))
      // degenerate-centroid guard: a label with exactly one member has
      // an EMPTY leave-one-out centroid (ss − selfDen = 0 → 0/0 NaN);
      // score it at the fold's −2.0 floor so it can never win — if NO
      // centroid is scorable the fold stays at (lab = −1, cos = −2.0),
      // and the oracle replays the same convention via LEFT JOIN
      .withColumn("sc2", expr(
        s"transform(sc1, s -> named_struct('lab', s.lab, 'cos', " +
          s"CASE WHEN s.ss - $selfDen <= 0 THEN CAST(-2.0 AS DOUBLE) ELSE " +
          s"CAST(s.dsq - $selfNum AS DOUBLE) " +
          s"/ (sqrt(CAST(s.ss - $selfDen AS DOUBLE)) * sqrt(CAST(nrm AS DOUBLE))) END))"))
      .withColumn("best", expr(
        "aggregate(sc2, named_struct('lab', -1, 'cos', CAST(-2.0 AS DOUBLE)), " +
          "(acc, s) -> CASE WHEN s.cos > acc.cos THEN s ELSE acc END)"))
  }

  /** All corpus pairs (blocked on `blockKey`) with quantized cosine
    * >= tau — embedding near-duplicate detection. */
  def cosinePairs(corpus: DataFrame, blockKey: String, tau: Double): DataFrame =
    corpus
      .as("a")
      .join(
        corpus.as("b"),
        col(s"a.$blockKey") === col(s"b.$blockKey") && col("a.vec_id") < col("b.vec_id")
      )
      .withColumn("cos", cosineQ(dotQ(col("a.e"), col("b.e")), col("a.nrm"), col("b.nrm")))
      .filter(col("cos") >= tau)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cos"))

  /** Deterministic random hyperplanes: `bits` planes × `dim` components,
    * seeded, QUANTIZED to longs on the 1e-6 grid. Integer components
    * mean the signature dot products are exact integer math — the same
    * signatures fall out of any engine (the DuckDB oracle embeds this
    * matrix as a literal and replays the bucketing bit-for-bit). */
  def hyperplanes(bits: Int, dim: Int, seed: Long = 42L): Array[Array[Long]] = {
    val rnd = new Random(seed)
    Array.fill(bits, dim)(math.round((rnd.nextDouble() * 2 - 1) * 1e6))
  }

  /** LSH signature: bit i = [dot(v, plane_i) >= 0], as a "0101…"
    * string key. The plane matrix is a single typedlit, iterated
    * data-style — inlining one literal array per bit instead blows
    * the expression tree up to O(bits × dim) nodes and dominates
    * runtime with analysis/compile cost. The dot uses the native
    * DotProductLong expression: inside this transform() lambda it
    * evaluates INTERPRETED (higher-order functions are
    * CodegenFallback), but it still skips the intermediate array the
    * zip_with formulation would allocate per plane. Computed per-row
    * (narrow, no shuffle). */
  def lshSignature(vec: Column, planes: Array[Array[Long]]): Column = {
    val planesLit = typedlit(planes.map(_.toSeq).toSeq)
    array_join(
      transform(planesLit, p => when(dotQ(vec, p) >= 0, lit("1")).otherwise(lit("0"))),
      ""
    )
  }

  /** ANN candidates: queries and corpus meet in identical LSH buckets
    * (single equi-join on the signature), then exact cosine ranks the
    * candidates. Recall is tuned by `bits` (fewer bits → bigger
    * buckets → higher recall, more work). */
  def annLsh(corpus: DataFrame, queries: DataFrame, bits: Int, dim: Int, k: Int): DataFrame = {
    val planes = hyperplanes(bits, dim)
    val cSig = corpus.withColumn("sig", lshSignature(col("e"), planes))
    val qSig = queries
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qnrm"))
      .withColumn("sig", lshSignature(col("qe"), planes))
    val cand = broadcast(qSig)
      .join(cSig, Seq("sig"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos", cosineQ(dotQ(col("qe"), col("e")), col("qnrm"), col("nrm")))
    rankedTopK(cand, col("q_id"), Seq(col("cos").desc, col("vec_id").asc), k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cos"))
  }
}
