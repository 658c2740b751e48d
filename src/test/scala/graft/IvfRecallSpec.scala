package graft

import org.apache.spark.sql.functions._

import graft.similarity.{IvfAnn, Similarity}

/** Recall characterization of the IVF ANN path against brute force on
  * the real sf0.01 embeddings (500 vectors, 25 query points). The
  * whole pipeline is deterministic (seeded centroids, integer math),
  * so thresholds are exact reproducible values with margin, measured
  * by ProfileIvf:
  *
  *   iters=1: nprobe 1→0.264, 4→0.640, 8→0.848, 16→1.000
  *   iters=2: nprobe 1→0.288, 4→0.688, 8→0.896, 16→1.000
  *
  * This is the recall-vs-nprobe tuning evidence behind the guidance in
  * IvfAnn's scaladoc (numCentroids ≈ √N, nprobe chosen for the recall
  * target, extra Lloyd passes tighten cells).
  */
class IvfRecallSpec extends SparkSpecBase {
  import spark.implicits._

  private val k = 5
  private val cells = 16

  private lazy val corpus = Similarity.prepareQuantized(
    graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01"),
    col("embedding"), col("vec_id"), col("label"))
  private lazy val qs = corpus.filter(col("vec_id") % 20 === 0)

  private lazy val brute = Similarity.cosineTopK(corpus, qs, k)
    .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet

  private def recall(nprobe: Int, iters: Int): Double = {
    val ivf = IvfAnn.annIvf(corpus, qs, k, cells, nprobe, iters)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    (ivf intersect brute).size.toDouble / brute.size
  }

  test("recall rises monotonically with nprobe and the tuned config clears 0.65") {
    val r1 = recall(1, 2)
    val r4 = recall(4, 2)
    val r16 = recall(16, 2)
    assert(r1 <= r4 && r4 <= r16, s"recall not monotone in nprobe: $r1, $r4, $r16")
    assert(r4 >= 0.65, s"tuned recall@5 (16 cells, nprobe=4, 2 Lloyd iters) regressed: $r4")
    assert(r16 === 1.0, s"probing every cell must be exhaustive: $r16")
  }

  test("second Lloyd pass tightens cells: recall at nprobe=4 improves over one pass") {
    // deterministic on this dataset: 0.640 (1 pass) → 0.688 (2 passes)
    assert(recall(4, 1) < recall(4, 2))
  }

  test("suggestCentroids follows the sqrt(N) rule, clamped") {
    assert(IvfAnn.suggestCentroids(0) === 1)
    assert(IvfAnn.suggestCentroids(1) === 1)
    assert(IvfAnn.suggestCentroids(500) === 22)
    assert(IvfAnn.suggestCentroids(1000000) === 1000)
    assert(IvfAnn.suggestCentroids(Long.MaxValue) === 65536) // clamp
    // monotone over realistic sizes
    val sizes = Seq(10L, 100L, 10000L, 1000000L, 100000000L)
    val cs = sizes.map(IvfAnn.suggestCentroids)
    assert(cs === cs.sorted)
  }

  test("suggestCentroids-sized build at sf0.1: recall knee measured and pinned") {
    // the √N sizing path the 100 TB story depends on, exercised on the
    // largest local corpus (sf0.1: N=2000 → 45 cells). These synthetic
    // embeddings are near-random — NO cluster structure, the measured
    // worst case for IVF (cell membership carries little signal, so
    // recall needs a large probe fraction: 11/45 → 0.62, 22/45 → 0.83,
    // 32/45 → 0.93, measured by ProfileIvfScale). Real model
    // embeddings cluster hard, which is what the nprobe ≈ nlist/4
    // guidance in IvfAnn's scaladoc assumes; this spec pins the
    // random-data floor so a regression in the build path (seeding,
    // Lloyd, probe ranking) shows up as a recall drop.
    val corpus01 = Similarity.prepareQuantized(
      graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.1"),
      col("embedding"), col("vec_id"), col("label"))
    val n = corpus01.count()
    val cells01 = IvfAnn.suggestCentroids(n)
    assert(cells01 === math.ceil(math.sqrt(n.toDouble)).toInt)
    val qs01 = corpus01.filter(col("vec_id") % 100 === 0)
    val brute01 = Similarity.cosineTopK(corpus01, qs01, k)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall01(nprobe: Int): Double = {
      val ivf = IvfAnn.annIvf(corpus01, qs01, k, cells01, nprobe, lloydIters = 2)
        .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
      graft.operators.Checkpoints.releaseAll()
      (ivf intersect brute01).size.toDouble / brute01.size
    }
    val rQuarter = recall01(cells01 / 4)
    val rHalf = recall01(cells01 / 2)
    val rKnee = recall01(32)
    assert(rQuarter <= rHalf && rHalf <= rKnee,
      s"recall not monotone in nprobe: $rQuarter, $rHalf, $rKnee")
    assert(rHalf >= 0.80, s"recall@5 at nprobe=nlist/2 regressed: $rHalf (measured 0.83)")
    assert(rKnee >= 0.90, s"recall@5 at the measured 0.9 knee regressed: $rKnee (measured 0.93)")
  }

  test("probing all cells is bit-identical to brute force, ranks included") {
    val ivf = IvfAnn.annIvf(corpus, qs, k, cells, nprobe = cells, lloydIters = 2)
      .select("q_id", "neighbor_id", "rank", "cos").as[(Long, Long, Int, Double)].collect().toSet
    val bf = Similarity.cosineTopK(corpus, qs, k)
      .select("q_id", "neighbor_id", "rank", "cos").as[(Long, Long, Int, Double)].collect().toSet
    assert(ivf === bf)
  }
}
