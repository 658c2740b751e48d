package graft.queries

/** Single source of truth for the ANN / similarity query parameters
  * that must agree between the Spark query lambdas and the DuckDB
  * oracle SQL they are gated against. Editing a value here changes
  * BOTH sides; the pre-advice state hard-coded them independently in
  * the lambda and the SQL string, so one edit silently broke the gate.
  */
object AnnParams {
  /** Every vec_id ≡ 0 (mod QueryMod) is a query vector. */
  val QueryMod = 100

  // LSH ANN (q_ann_lsh)
  val LshBits = 8
  val LshDim = 64
  val LshK = 5

  // Brute-force cosine (q_cosine_topk)
  val CosineK = 5

  // Mutual-kNN pairs (q_mutual_knn): vec_id ≡ 0 (mod MutualMod) is
  // the population — a DENSER slice than QueryMod so reciprocal edges
  // actually exist at sf0.001 (population ~20 there, ~200 at sf0.01)
  val MutualMod = 10
  val MutualK = 5

  // ANN-backed mutual-kNN (q_mutual_knn_ann): same population slice
  // and k as q_mutual_knn, IVF pre-screen sized for that slice. The
  // operator takes suggestCentroids(N) at corpus scale — the gate pins
  // a fixed, oracle-replayable build. Nprobe < centroids so the gate
  // exercises the PRUNED path (the exhaustive nprobe = centroids case
  // is the bit-equality spec in SimilaritySpec).
  val MutualAnnCentroids = 8
  val MutualAnnNprobe = 3
  val MutualAnnIters = 2

  // IVF ANN (q_ann_ivf)
  val IvfK = 5
  val IvfCentroids = 16
  val IvfNprobe = 4

  /** Lloyd refinement passes for the IVF coarse quantizer. One pass
    * (the r3 state) leaves centroids very close to their seed vectors;
    * a second pass measurably tightens cells (see IvfRecallSpec). The
    * oracle CTE chain replays exactly this many rounds. */
  val IvfLloydIters = 2

  /** Semantic dedup (q_semdedup) cosine threshold. The clustering
    * reuses the IVF coarse quantizer above (IvfCentroids cells,
    * IvfLloydIters passes), so the oracle shares q_ann_ivf's
    * assignment CTE chain. The synthetic embeddings are near-random
    * (pairwise cosine tops out ≈ 0.45), hence the low tau — real
    * SemDeDup runs sit at 0.95+ on model embeddings. */
  val SemDedupTau = 0.35

  /** Worst-case cell cap for q_semdedup: cells above this are
    * hash-split before the all-pairs sweep (SemDedup.semDedup's
    * maxCellSize). Chosen far above any cell the sf0.01/sf0.1 corpora
    * can produce (≤ corpus size), so the oracle's uncapped per-cell
    * replay stays byte-identical while the query still exercises the
    * capped code path (every cell lands in sub-shard 0). The capped
    * semantics themselves are spec-gated with a genuinely dense
    * cluster in SimilaritySpec. */
  val SemDedupMaxCell = 65536

  // IVF-PQ ANN (q_ann_ivfpq): the 64-dim grid splits into PqM
  // subspaces of PqSubDim dims, PqK codewords each (trained with
  // PqIters integer-L2 Lloyd rounds); ADC shortlists PqRefine
  // candidates per query before the exact re-rank to IvfK. The
  // coarse quantizer is exactly q_ann_ivf's (shared oracle CTEs).
  val PqM = 8
  val PqSubDim = 8
  val PqK = 64
  val PqIters = 2
  val PqRefine = 40

  /** q_mutual_knn_pq: ADC-shortlist depth for the PQ-screened
    * mutual-kNN — deliberately BELOW the population size so the gate
    * exercises the pruned ADC path (exhaustive refine ≥ |pop| is the
    * bit-equality spec in SimilaritySpec), and ≥ MutualK so the exact
    * re-rank has a full shortlist to rank. */
  val MutualPqRefine = 10

  /** q_semdedup_pq: SDC-screen margin — pairs whose PQ-code cosine
    * clears SemDedupTau − this go to the exact re-check. 0.2 is wide
    * enough that no true dup pair of the sf corpora is screened out
    * (SimilaritySpec pins verdict equality with exact semDedup at
    * sf0.001), narrow enough that the screen actually prunes. */
  val SemDedupPqMargin = 0.2

  // kNN label-agreement audit (q_knn_classify): every vec_id ≡ 0

  // (mod KnnMod) is a held-out query classified by majority vote over
  // its KnnK nearest corpus vectors. A denser query set than
  // QueryMod's — classification accuracy needs more samples than
  // neighbor-list checks do.
  val KnnMod = 10
  val KnnK = 10

  // Triplet / hard-negative mining (q_hard_negatives): every vec_id
  // ≡ 0 (mod TripletMod) is an anchor; per anchor, the rank-1
  // same-label positive and the TripletNegK nearest different-label
  // negatives, margin violations flagged.
  val TripletMod = 10
  val TripletNegK = 5
}
