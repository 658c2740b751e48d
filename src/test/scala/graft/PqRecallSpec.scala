package graft

import org.apache.spark.sql.functions._

import graft.queries.AnnParams
import graft.similarity.{PqAnn, Similarity}

/** IVF-PQ characterization on the real sf0.01 embeddings (500
  * vectors, 25 queries). Everything is deterministic (seeded
  * codebooks, integer L2 / ADC math), so the numbers are exact:
  * at the gate config (16 cells, nprobe=4, m=8×8 dims, k=64,
  * refine=40) PQ recall@5 equals plain IVF's 0.72 — the ADC
  * shortlist + exact re-rank recover every true neighbour the probed
  * cells contain, leaving the coarse probe as the only loss, which is
  * exactly the regime a tuned IVFPQ+refine deployment targets. */
class PqRecallSpec extends SparkSpecBase {
  import spark.implicits._

  private val k = 5
  private val cells = AnnParams.IvfCentroids

  private lazy val corpus = Similarity.prepareQuantized(
    graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01"),
    col("embedding"), col("vec_id"), col("label"))
  private lazy val qs = corpus.filter(col("vec_id") % 20 === 0)

  private lazy val brute = Similarity.cosineTopK(corpus, qs, k)
    .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet

  private def pq(nprobe: Int, refine: Int) = {
    val out = PqAnn.annIvfPq(corpus, qs, k, cells, nprobe,
        lloydIters = AnnParams.IvfLloydIters, m = AnnParams.PqM,
        subDim = AnnParams.PqSubDim, pqK = AnnParams.PqK,
        pqIters = AnnParams.PqIters, refine = refine)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    graft.operators.Checkpoints.releaseAll()
    out
  }

  private def recall(s: Set[(Long, Long)]): Double =
    (s intersect brute).size.toDouble / brute.size

  test("gate-config recall matches plain IVF: the refine step hides the PQ approximation") {
    val r = recall(pq(nprobe = 4, refine = AnnParams.PqRefine))
    assert(r >= 0.65, s"IVF-PQ recall@5 at the gate config regressed: $r (measured 0.72)")
  }

  test("recall is monotone in the refine depth") {
    val shallow = recall(pq(nprobe = 4, refine = k))
    val deep = recall(pq(nprobe = 4, refine = AnnParams.PqRefine))
    assert(shallow <= deep, s"refine depth hurt recall: $shallow > $deep")
  }

  test("probing all cells with an exhaustive shortlist is bit-identical to brute force") {
    // shortlist ≥ corpus ⇒ ADC only orders candidates the exact
    // re-rank then fully re-scores — any divergence here is a bug in
    // the candidate plumbing, not an approximation
    val out = PqAnn.annIvfPq(corpus, qs, k, cells, nprobe = cells,
        lloydIters = AnnParams.IvfLloydIters, m = AnnParams.PqM,
        subDim = AnnParams.PqSubDim, pqK = AnnParams.PqK,
        pqIters = AnnParams.PqIters, refine = 1000)
      .select("q_id", "neighbor_id", "rank", "cos").as[(Long, Long, Int, Double)].collect().toSet
    val bf = Similarity.cosineTopK(corpus, qs, k)
      .select("q_id", "neighbor_id", "rank", "cos").as[(Long, Long, Int, Double)].collect().toSet
    assert(out === bf)
  }

  test("encode emits one in-range dense codeword id per subspace") {
    val cbs = PqAnn.codebooks(corpus, AnnParams.PqM, AnnParams.PqSubDim,
      AnnParams.PqK, AnnParams.PqIters)
    val codes = PqAnn.encode(corpus, cbs)
      .select("codes").as[Seq[Int]].collect()
    assert(codes.length === 500)
    assert(codes.forall(c => c.length === AnnParams.PqM))
    assert(codes.forall(_.forall(d => d >= 0 && d < AnnParams.PqK)))
    // the codebook must actually discriminate: many distinct codes
    assert(codes.map(_.mkString(",")).distinct.length > 400)
  }
}
