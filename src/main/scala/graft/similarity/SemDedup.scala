package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Similarity.{cosineQ, dotQ}

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): cluster the embedding corpus with the IVF
  * coarse quantizer, then within each cluster mark every vector that
  * has a LOWER-id cluster-mate with cosine >= tau as a semantic
  * duplicate. The id order makes the sweep deterministic and
  * replayable: it is exactly the greedy scan that walks each cluster
  * in id order and keeps the first representative of every
  * epsilon-neighborhood it meets.
  *
  * Scale shape: clustering is the [[IvfAnn]] build (broadcast
  * centroid table, no corpus shuffle); the duplicate scan is
  * per-cluster all-pairs — C(|cell|, 2) work, which is the SemDeDup
  * design point: with nlist ≈ √N cells the expected cell holds √N
  * vectors and total pair work is O(N^1.5), not the O(N²) of a
  * corpus-wide sweep. The pair join carries only (id, cluster,
  * vector) and the duplicate set reduces to bare ids before joining
  * back, so nothing document-sized ever shuffles twice.
  */
object SemDedup {

  /** Per-vector semantic-dedup verdicts: (vec_id, c_id, is_dup) for
    * every corpus vector — `is_dup` = true iff a lower-id vector in
    * the same IVF cell has cosine >= tau. Survivors are the
    * `!is_dup` rows; callers drop or keep at will (the verdict table
    * joins back to payloads on vec_id).
    *
    * `corpus` must be [[Similarity.prepareQuantized]] shaped
    * (vec_id, e, nrm). Centroid build parameters mirror [[IvfAnn]];
    * at scale pick numCentroids ≈ √N ([[IvfAnn.suggestCentroids]]).
    */
  def semDedup(corpus: DataFrame, numCentroids: Int, lloydIters: Int, tau: Double): DataFrame = {
    val cents = IvfAnn.centroids(corpus, numCentroids, lloydIters)
    val asg = IvfAnn.assign(corpus, cents)
    val mem = asg.join(corpus.select(col("vec_id"), col("e"), col("nrm")), "vec_id")
    val dups = mem.as("a")
      .join(mem.as("b"),
        col("a.c_id") === col("b.c_id") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", cosineQ(dotQ(col("a.e"), col("b.e")), col("a.nrm"), col("b.nrm")))
      .filter(col("cos") >= tau)
      .select(col("b.vec_id").as("vec_id"))
      .distinct()
    asg.join(dups.withColumn("__d", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("c_id"), coalesce(col("__d"), lit(false)).as("is_dup"))
  }
}
