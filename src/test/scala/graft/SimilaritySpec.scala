package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private def vecs = Seq(
    (0L, 0, Array(1.0f, 0.0f, 0.0f)),
    (1L, 0, Array(0.9f, 0.1f, 0.0f)),  // close to 0
    (2L, 0, Array(0.0f, 1.0f, 0.0f)),  // orthogonal to 0
    (3L, 0, Array(-1.0f, 0.0f, 0.0f)), // opposite of 0
    (100L, 0, Array(1.0f, 0.05f, 0.0f))
  ).toDF("vec_id", "label", "embedding")

  private def corpus = Similarity.prepareQuantized(vecs, col("embedding"), col("vec_id"), col("label"))

  test("cosineTopK ranks by true cosine order") {
    val qs = corpus.filter(col("vec_id") === 100L)
    val out = Similarity.cosineTopK(corpus, qs, 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(out === Seq(0L, 1L, 2L)) // closest first, opposite excluded by k
  }

  test("cosinePairs finds high-cosine pairs within block") {
    val pairs = Similarity.cosinePairs(corpus, "label", 0.95)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 100L)))
    assert(!pairs.contains((0L, 3L)))
  }

  test("mutualKnn keeps only reciprocal edges, once per unordered pair") {
    val got = Similarity.mutualKnn(corpus, k = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute replay: directed knn at k=2, then reciprocal filter
    val knn = Similarity.cosineTopK(corpus, corpus, 2)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val expected = knn.filter { case (a, b) => a < b && knn.contains((b, a)) }
    assert(got === expected)
    assert(got.contains((0L, 100L))) // the tight pair is mutual
    // every pair appears once, a < b
    assert(got.forall { case (a, b) => a < b })
  }

  test("mutualKnnAnn at exhaustive probe settings is bit-equal to mutualKnn") {
    // 40 deterministic pseudo-random vectors — big enough that the IVF
    // cells are non-trivial and reciprocal edges exist
    val rnd = new scala.util.Random(7)
    val pts = (0 until 40).map { i =>
      (i.toLong, i % 4, Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("vec_id", "label", "embedding")
    val pop = Similarity.prepareQuantized(pts, col("embedding"), col("vec_id"), col("label"))
    val brute = Similarity.mutualKnn(pop, k = 3)
      .select("id_a", "id_b", "rank_ab", "rank_ba", "cos")
      .as[(Long, Long, Int, Int, Double)].collect().toSet
    // nprobe = numCentroids → the screen is exhaustive: every cell is
    // probed, the candidate set is the full population, bit-equality
    val ann = Similarity.mutualKnnAnn(pop, k = 3, numCentroids = 5, nprobe = 5, lloydIters = 2)
      .select("id_a", "id_b", "rank_ab", "rank_ba", "cos")
      .as[(Long, Long, Int, Int, Double)].collect().toSet
    assert(brute.nonEmpty)
    assert(ann === brute)
  }

  test("mutualKnnPq at exhaustive settings is bit-equal to mutualKnn") {
    val rnd = new scala.util.Random(7)
    val pts = (0 until 40).map { i =>
      (i.toLong, i % 4, Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("vec_id", "label", "embedding")
    val pop = Similarity.prepareQuantized(pts, col("embedding"), col("vec_id"), col("label"))
    val brute = Similarity.mutualKnn(pop, k = 3)
      .select("id_a", "id_b", "rank_ab", "rank_ba", "cos")
      .as[(Long, Long, Int, Int, Double)].collect().toSet
    // nprobe = numCentroids (every cell probed) AND refine ≥ |pop|
    // (the ADC shortlist keeps every candidate): the PQ screen is
    // exhaustive and the exact re-rank makes the output bit-equal
    val pq = Similarity.mutualKnnPq(pop, k = 3, numCentroids = 5, nprobe = 5,
        lloydIters = 2, m = 4, subDim = 2, pqK = 40, pqIters = 2, refine = 40)
      .select("id_a", "id_b", "rank_ab", "rank_ba", "cos")
      .as[(Long, Long, Int, Int, Double)].collect().toSet
    assert(brute.nonEmpty)
    assert(pq === brute)
  }

  test("mutualKnnIndexed against a prebuilt IvfIndex is bit-equal to the inline mutualKnnAnn") {
    val rnd = new scala.util.Random(7)
    val pts = (0 until 40).map { i =>
      (i.toLong, i % 4, Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("vec_id", "label", "embedding")
    val pop = Similarity.prepareQuantized(pts, col("embedding"), col("vec_id"), col("label"))
      .select("vec_id", "e", "nrm")
    val wh = java.nio.file.Files.createTempDirectory("graft_mki").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_mki LOCATION '$wh'")
    try {
      graft.similarity.IvfIndex.create(spark, pop, "graft_mki.idx", 2,
        graft.similarity.IvfIndex.Params(numCentroids = 5, lloydIters = 2))
      // PRUNED settings on both sides — the training determinism is
      // what makes the persisted index interchangeable mid-pipeline
      val inline = Similarity.mutualKnnAnn(pop, k = 3, numCentroids = 5,
          nprobe = 3, lloydIters = 2)
        .select("id_a", "id_b", "rank_ab", "rank_ba", "cos")
        .as[(Long, Long, Int, Int, Double)].collect().toSet
      val indexed = Similarity.mutualKnnIndexed(spark, "graft_mki.idx", pop,
          k = 3, nprobe = 3)
        .select("id_a", "id_b", "rank_ab", "rank_ba", "cos")
        .as[(Long, Long, Int, Int, Double)].collect().toSet
      assert(inline.nonEmpty)
      assert(indexed === inline)
    } finally spark.sql("DROP DATABASE IF EXISTS graft_mki CASCADE")
  }

  test("mutualKnnAnn pruned to one probe still recovers in-cell mutual pairs") {
    // two tight, well-separated clusters: the IVF build puts each in
    // its own cell, so even nprobe = 1 keeps all within-cluster
    // candidates and the mutual pairs inside each cluster survive
    val pts = Seq(
      (10L, 1, Array(1.0f, 0.02f, 0.0f)), (11L, 1, Array(0.98f, 0.05f, 0.0f)),
      (12L, 1, Array(1.0f, 0.0f, 0.03f)),
      (20L, 2, Array(0.02f, 1.0f, 0.0f)), (21L, 2, Array(0.0f, 0.97f, 0.05f)),
      (22L, 2, Array(0.04f, 1.0f, 0.01f))
    ).toDF("vec_id", "label", "embedding")
    val pop = Similarity.prepareQuantized(pts, col("embedding"), col("vec_id"), col("label"))
    val ann = Similarity.mutualKnnAnn(pop, k = 2, numCentroids = 2, nprobe = 1, lloydIters = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // every vector's 2 nearest within its cell are its cluster-mates →
    // all three within-cluster pairs of each cluster are mutual
    assert(ann === Set((10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L), (20L, 22L), (21L, 22L)))
  }

  test("annLsh candidates agree with brute force on its bucket hits") {
    val qs = corpus.filter(col("vec_id") === 100L)
    val ann = Similarity.annLsh(corpus, qs, bits = 4, dim = 3, k = 3)
      .select("neighbor_id", "cos").as[(Long, Double)].collect().toMap
    val brute = Similarity.cosineTopK(corpus, qs, 4)
      .select("neighbor_id", "cos").as[(Long, Double)].collect().toMap
    // every ANN hit must carry the exact brute-force cosine
    ann.foreach { case (id, c) => assert(brute(id) === c) }
    // the identical-direction vector lands in the same bucket → recalled
    assert(ann.contains(0L))
  }

  test("knnClassify majority-votes separable clusters correctly, ties to the smaller label") {
    // two tight, well-separated clusters (x-axis label 1, y-axis label 2)
    val pts = Seq(
      (10L, 1, Array(1.0f, 0.02f, 0.0f)), (11L, 1, Array(0.98f, 0.05f, 0.0f)),
      (12L, 1, Array(1.0f, 0.0f, 0.03f)),
      (20L, 2, Array(0.02f, 1.0f, 0.0f)), (21L, 2, Array(0.0f, 0.97f, 0.05f)),
      (22L, 2, Array(0.04f, 1.0f, 0.01f))
    ).toDF("vec_id", "label", "embedding")
    val c = Similarity.prepareQuantized(pts, col("embedding"), col("vec_id"), col("label"))
    val out = Similarity.knnClassify(c, c, k = 2)
      .select("q_id", "true_label", "pred_label", "votes", "correct")
      .as[(Long, Int, Int, Long, Int)].collect().sortBy(_._1)
    assert(out.length === 6)
    // each point's 2 nearest (self excluded) are its own cluster → unanimous, correct
    out.foreach { case (q, t, p, v, ok) =>
      assert(p === t && v === 2L && ok === 1, s"q=$q voted $p ($v votes) vs true $t")
    }
    // k=4 forces a 2-2 split for every query: vote tie breaks to the
    // SMALLER label deterministically (votes desc, label asc)
    val tied = Similarity.knnClassify(c, c, k = 4)
      .select("pred_label", "votes").as[(Int, Long)].collect()
    assert(tied.forall { case (p, v) => p === 1 && v === 2L })
  }

  test("mineTriplets picks the rank-1 positive, ranked hard negatives, and flags violations") {
    // label 0 hugs the x-axis; label 1 the y-axis; label 2 is a
    // SINGLETON sitting on the x-axis — a hard negative for label 0
    // that outranks the true positive (a margin violation), and an
    // anchor with no positive at all.
    val pts = Seq(
      (0L, 0, Array(1.0f, 0.0f, 0.0f)), (1L, 0, Array(0.9f, 0.2f, 0.0f)),
      (10L, 1, Array(0.0f, 1.0f, 0.0f)), (11L, 1, Array(0.1f, 0.95f, 0.0f)),
      (20L, 2, Array(1.0f, 0.01f, 0.0f))
    ).toDF("vec_id", "label", "embedding")
    val c = Similarity.prepareQuantized(pts, col("embedding"), col("vec_id"), col("label"))
    val out = Similarity.mineTriplets(c, c, k = 2)
      .select("q_id", "pos_id", "neg_id", "rank", "violation")
      .as[(Long, Option[Long], Long, Int, Option[Int])].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4)).toMap
    // anchor 0: positive is 1; nearest negative is the label-2 imposter
    // at cos≈1 > cos(0,1) → violation; second negative doesn't violate
    val a0 = out(0L)
    assert(a0.map(_._3).toSeq === Seq(20L, 11L))
    assert(a0.forall(_._2.contains(1L)))
    assert(a0.map(_._5).toSeq === Seq(Some(1), Some(0)))
    // the singleton-label anchor keeps its negatives with a NULL
    // positive and NULL violation — never silently dropped
    val a20 = out(20L)
    assert(a20.nonEmpty && a20.forall(t => t._2.isEmpty && t._5.isEmpty))
    // every anchor emits ≤ k negatives, ranks dense from 1
    out.values.foreach(rows => assert(rows.map(_._4).toSeq === (1 to rows.length).toSeq))
  }

  test("centroidClassify excludes self from its own label's centroid") {
    // A's own-label LOO centroid is just B (orthogonal → cos 0), so A
    // must flip to label 2 (cos ≈ 0.63). WITH self-leak the label-1
    // centroid would be A+B = (1,1,0) → cos 0.707 > 0.63 → pred 1:
    // this fixture fails if the leave-one-out correction is dropped.
    val pts = Seq(
      (1L, 1, Array(1.0f, 0.0f, 0.0f)),   // A
      (2L, 1, Array(0.0f, 1.0f, 0.0f)),   // B
      (3L, 2, Array(0.65f, 0.76f, 0.0f)), // C
      (4L, 2, Array(0.6f, 0.8f, 0.0f))    // C2
    ).toDF("vec_id", "label", "embedding")
    val c = Similarity.prepareQuantized(pts, col("embedding"), col("vec_id"), col("label"))
    val pred = Similarity.centroidClassify(c)
      .select("q_id", "pred_label").as[(Long, Int)].collect().toMap
    assert(pred(1L) === 2, "self-leak: A kept its own label")
    assert(pred(2L) === 2)
    assert(pred(3L) === 2 && pred(4L) === 2) // tight label-2 pair stays put
  }

  test("centroidClassify guards singleton-label leave-one-out centroids") {
    // label 1 has exactly ONE member: its LOO centroid is empty
    // (ss − selfDen = 0 → unguarded 0/0 NaN). The guard floors it at
    // −2.0 so vector 1 scores only against label 2's real centroid.
    val pts = Seq(
      (1L, 1, Array(1.0f, 0.0f, 0.0f)),
      (2L, 2, Array(0.0f, 1.0f, 0.0f)),
      (3L, 2, Array(0.1f, 0.9f, 0.0f))
    ).toDF("vec_id", "label", "embedding")
    val c = Similarity.prepareQuantized(pts, col("embedding"), col("vec_id"), col("label"))
    val out = Similarity.centroidClassify(c)
      .select("q_id", "pred_label", "best_cos").as[(Long, Int, Double)].collect()
    assert(out.forall(!_._3.isNaN), "NaN cosine leaked through the guard")
    val m = out.map(r => r._1 -> r).toMap
    assert(m(1L)._2 === 2 && m(1L)._3 > -1.0)

    // fully degenerate corner: a single-label single-vector corpus has
    // NO scorable centroid — the fold stays at its (−1, −2.0) floor
    val solo = Similarity.prepareQuantized(
      Seq((10L, 7, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "label", "embedding"),
      col("embedding"), col("vec_id"), col("label"))
    val r = Similarity.centroidClassify(solo)
      .select("pred_label", "best_cos", "correct").as[(Int, Double, Int)].head()
    assert(r === ((-1, -2.0, 0)))
  }

  test("IVF ANN recalls the true nearest neighbours on real embeddings") {
    import graft.similarity.IvfAnn
    val corpus = Similarity.prepareQuantized(
      graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001"),
      col("embedding"), col("vec_id"), col("label"))
    val qs = corpus.filter(col("vec_id") % 100 === 0)
    val ivf = IvfAnn.annIvf(corpus, qs, k = 5, numCentroids = 8, nprobe = 4)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brute = Similarity.cosineTopK(corpus, qs, 5)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (ivf intersect brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall@5 too low: $recall") // nprobe=4/8 cells scanned
  }

  test("scalarQuantize emits exact codes and bounded reconstruction error") {
    val df = Seq(
      (1L, Seq(0.0f, 1.0f, 0.5f)),
      (2L, Seq(0.25f, 0.25f, 0.25f)) // constant vector → all-zero codes
    ).toDF("vec_id", "embedding")
    val out = Similarity.scalarQuantize(df, col("embedding"), col("vec_id"))
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // v1: micro units [0, 1e6, 5e5]; codes 0,255,128; only the midpoint
    // reconstructs off-grid: |501961 − 500000| = 1961 ≤ range/510
    assert(out(1L) === ((1L, 0L, 1000000L, 383L, 1961L)))
    assert(out(2L) === ((2L, 250000L, 250000L, 0L, 0L)))
  }

  test("scalarQuantize error stays within range/510 per dimension (randomized)") {
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 50L).map(i => (i, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
    val out = Similarity.scalarQuantize(vecs.toDF("vec_id", "embedding"),
        col("embedding"), col("vec_id"))
      .select(col("vec_id"), col("mx") - col("mn"), col("err_total"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (id, range, err) =>
      assert(err <= 16L * (range / 510 + 1), s"vec $id: err=$err range=$range")
    }
  }

  test("semDedup verdicts match a brute-force replay of the greedy sweep") {
    import graft.similarity.SemDedup
    val tau = 0.3
    val corpus = Similarity.prepareQuantized(
      graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001"),
      col("embedding"), col("vec_id"), col("label"))
    val verdicts = SemDedup.semDedup(corpus, numCentroids = 8, lloydIters = 1, tau = tau,
        maxCellSize = graft.similarity.CellCap.Unbounded)
      .as[(Long, Long, Boolean)].collect()
    // full coverage, one verdict per vector
    val n = corpus.count()
    assert(verdicts.length.toLong === n)
    assert(verdicts.map(_._1).distinct.length.toLong === n)
    // replay: same assignment, exact cosines, dup ⇔ lower-id cell-mate ≥ tau
    val vecs = corpus.select(col("vec_id"), col("e"), col("nrm"))
      .as[(Long, Seq[Long], Long)].collect()
      .map { case (id, e, nrm) => id -> ((e.toArray, nrm)) }.toMap
    def cos(a: Long, b: Long): Double = {
      val ((ea, na), (eb, nb)) = (vecs(a), vecs(b))
      var d = 0L; var i = 0
      while (i < ea.length) { d += ea(i) * eb(i); i += 1 }
      d.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
    val byCell = verdicts.groupBy(_._2)
    var dupsSeen = 0
    byCell.values.foreach { cell =>
      val ids = cell.map(_._1).sorted
      cell.foreach { case (id, _, isDup) =>
        val expected = ids.takeWhile(_ < id).exists(a => cos(a, id) >= tau)
        assert(isDup === expected, s"vec $id: got $isDup, expected $expected")
        if (expected) dupsSeen += 1
      }
    }
    assert(dupsSeen > 0, "tau chosen so the sweep actually fires")
  }

  test("semDedup maxCellSize bounds pair work on a dense cluster, exact under the cap") {
    import graft.similarity.SemDedup
    // one dense cluster: 400 near-identical vectors (all pairwise
    // cos ≈ 1) — the boilerplate-pages worst case where a single IVF
    // cell would otherwise cost C(400,2) pairs
    val rnd = new scala.util.Random(3)
    val dense = (1L to 400L).map { i =>
      (i, Seq.tabulate(16)(d => 0.9f + (if (d == (i % 16).toInt) 0.001f * rnd.nextInt(5) else 0f)))
    }
    val corpus = Similarity.prepareQuantized(dense.toDF("vec_id", "embedding"),
      col("embedding"), col("vec_id"))
    val cap = 50
    val capped = SemDedup.semDedup(corpus, numCentroids = 1, lloydIters = 1,
        tau = 0.99, maxCellSize = graft.similarity.CellCap.Fixed(cap))
      .as[(Long, Long, Boolean)].collect()
    // every vector except each sub-shard's min id is flagged: the
    // number of survivors IS the number of sub-shards — bounded by
    // ceil(400/cap) = 8, against exactly 1 uncapped. Pair work per
    // shard is C(shardSize, 2), so total pair cost is capped at
    // ~nsub * C(E[shard], 2) instead of C(400, 2).
    val survivors = capped.count(!_._3)
    assert(survivors >= 1 && survivors <= math.ceil(400.0 / cap).toInt,
      s"survivors=$survivors must be within [1, nsub]")
    // a cap the cell fits under must be byte-identical to uncapped
    val uncapped = SemDedup.semDedup(corpus, numCentroids = 1, lloydIters = 1, tau = 0.99,
        maxCellSize = graft.similarity.CellCap.Unbounded)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    val bigCap = SemDedup.semDedup(corpus, numCentroids = 1, lloydIters = 1,
        tau = 0.99, maxCellSize = graft.similarity.CellCap.Fixed(400))
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(bigCap === uncapped)
    assert(uncapped.count(!_._3) === 1) // min id is the only survivor
  }

  test("semDedupPq: exact precision, bounded recall, full-margin equality vs exact") {
    import graft.queries.AnnParams
    import graft.similarity.{CellCap, SemDedup}
    val corpus = Similarity.prepareQuantized(
      graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001"),
      col("embedding"), col("vec_id"), col("label"))
    val exact = SemDedup.semDedup(corpus, numCentroids = 8, lloydIters = 1,
        tau = AnnParams.SemDedupTau, maxCellSize = CellCap.Unbounded)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    def pqRun(margin: Double) = SemDedup.semDedupPq(corpus, numCentroids = 8, lloydIters = 1,
        tau = AnnParams.SemDedupTau, margin = margin,
        m = AnnParams.PqM, subDim = AnnParams.PqSubDim, pqK = AnnParams.PqK,
        pqIters = AnnParams.PqIters, maxCellSize = CellCap.Unbounded)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    val exactDups = exact.filter(_._3).map(_._1).toSet
    assert(exactDups.nonEmpty, "tau chosen so the sweep actually fires")
    // (1) precision is EXACT at any margin: the integer-cosine
    // re-check kills every SDC false positive
    val pq = pqRun(AnnParams.SemDedupPqMargin)
    val pqDups = pq.filter(_._3).map(_._1).toSet
    assert(pqDups.subsetOf(exactDups))
    // (2) recall at the default margin stays high even on these
    // near-random synthetic embeddings (the PQ worst case — real
    // model embeddings cluster and reconstruct far tighter)
    assert(pqDups.size.toDouble >= 0.85 * exactDups.size,
      s"recall ${pqDups.size}/${exactDups.size} below 0.85")
    // (3) a full-width margin (screen ≤ −1 passes every pair) makes
    // the screen a no-op and the verdicts exactly equal
    assert(pqRun(1.0 + AnnParams.SemDedupTau) === exact)
  }

  test("semDedupPq cap still bounds pair work on a dense cluster") {
    import graft.similarity.{CellCap, SemDedup}
    val rnd = new scala.util.Random(3)
    val dense = (1L to 400L).map { i =>
      (i, Seq.tabulate(16)(d => 0.9f + (if (d == (i % 16).toInt) 0.001f * rnd.nextInt(5) else 0f)))
    }
    val corpus = Similarity.prepareQuantized(dense.toDF("vec_id", "embedding"),
      col("embedding"), col("vec_id"))
    def run(cap: CellCap) = SemDedup.semDedupPq(corpus, numCentroids = 1, lloydIters = 1,
        tau = 0.99, margin = 0.2, m = 4, subDim = 4, pqK = 8, pqIters = 1,
        maxCellSize = cap)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    val cap = 50
    val capped = run(CellCap.Fixed(cap))
    val survivors = capped.count(!_._3)
    assert(survivors >= 1 && survivors <= math.ceil(400.0 / cap).toInt,
      s"survivors=$survivors must be within [1, nsub]")
    // near-identical vectors: every pair clears the SDC screen, the
    // exact re-check decides — so uncapped PQ ≡ uncapped exact
    val uncappedPq = run(CellCap.Unbounded)
    val uncappedExact = SemDedup.semDedup(corpus, numCentroids = 1, lloydIters = 1,
        tau = 0.99, maxCellSize = CellCap.Unbounded)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(uncappedPq === uncappedExact)
    assert(uncappedPq.count(!_._3) === 1)
  }

  test("CellCap.Auto equals Fixed(4·N/cells) and splits a skewed cell by default") {
    import graft.similarity.{CellCap, SemDedup}
    // skewed corpus: 40 outliers spread over one-hot axes 1..8 take
    // the SMALLEST ids (so the deterministic seed pick spans the
    // axes), then 360 identical axis-0 vectors (the boilerplate
    // cluster) — they tie on every centroid and land in one cell,
    // whose 360 ≫ 4× the ~50 average, so the default cap must engage
    // without any tuning
    val rows = (1L to 40L).map { i =>
      (i, Seq.tabulate(16)(d => if (d == 1 + (i % 8).toInt) 1.0f else 0f))
    } ++ (41L to 400L).map { i =>
      (i, Seq.tabulate(16)(d => if (d == 0) 1.0f else 0f))
    }
    val corpus = Similarity.prepareQuantized(rows.toDF("vec_id", "embedding"),
      col("embedding"), col("vec_id"))
    val auto = SemDedup.semDedup(corpus, numCentroids = 9, lloydIters = 2, tau = 0.99,
        maxCellSize = CellCap.Auto)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    // Auto's contract: identical to Fixed(4·N/non-empty-cells)
    val cells = auto.map(_._2).distinct.length
    val cap = math.max(1, 4 * 400 / cells)
    val fixed = SemDedup.semDedup(corpus, numCentroids = 9, lloydIters = 2, tau = 0.99,
        maxCellSize = CellCap.Fixed(cap))
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(auto === fixed)
    // the scenario must actually exercise the split: enough non-empty
    // cells that the cap lands under the dense cell's 360 vectors, so
    // Auto keeps more than the single uncapped survivor there
    assert(cells >= 5, s"cells=$cells — geometry no longer skewed, fix the fixture")
    assert(cap < 360)
    val unbounded = SemDedup.semDedup(corpus, numCentroids = 9, lloydIters = 2, tau = 0.99,
        maxCellSize = CellCap.Unbounded)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(auto.count(!_._3) > unbounded.count(!_._3))
    // balanced corpora: Auto is byte-identical to Unbounded (cells at
    // or under 4× average never split)
    val denseOnly = Similarity.prepareQuantized(
      rows.drop(40).toDF("vec_id", "embedding"), col("embedding"), col("vec_id"))
    val aAuto = SemDedup.semDedup(denseOnly, numCentroids = 1, lloydIters = 1, tau = 0.99,
        maxCellSize = CellCap.Auto)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    val aUnb = SemDedup.semDedup(denseOnly, numCentroids = 1, lloydIters = 1, tau = 0.99,
        maxCellSize = CellCap.Unbounded)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(aAuto === aUnb)
  }

  test("quantized cosine equals double cosine within quantization error") {
    val a = corpus.filter(col("vec_id") === 0L)
    val pair = Similarity.cosinePairs(corpus, "label", -2.0)
      .filter(col("vec_a") === 0L && col("vec_b") === 1L)
      .select("cos").as[Double].head()
    val expected = 0.9 / math.sqrt(0.9 * 0.9 + 0.1 * 0.1) // hand-computed on floats≈doubles
    assert(math.abs(pair - expected) < 1e-4)
  }
}
