package graft

import org.apache.spark.sql.functions._

import graft.text.Rerank

class RerankSpec extends SparkSpecBase {
  import spark.implicits._

  test("trainLinear learns the exact centroid-difference weights and separates the classes") {
    // positives live on f1, negatives on f2
    val train = Seq(
      (1L, 10L, 1L, 1), (2L, 12L, 2L, 1), (3L, 11L, 1L, 1),
      (4L, 1L, 10L, 0), (5L, 2L, 12L, 0), (6L, 1L, 11L, 0)
    ).toDF("id", "f1", "f2", "y")
    val w = Rerank.trainLinear(train, Seq(col("f1"), col("f2")), col("y"))
    val ws = w.select("w").as[Seq[Long]].head()
    // hand replay: n_pos = n_neg = 3, Σ_pos = (33, 4), Σ_neg = (4, 33)
    // → w = (3·33 − 3·4, 3·4 − 3·33) = (87, −87)
    assert(ws === Seq(87L, -87L))
    val scored = Rerank.score(train, Seq(col("f1"), col("f2")), w)
      .select("y", "rr_score").as[(Int, Long)].collect()
    val posMin = scored.filter(_._1 == 1).map(_._2).min
    val negMax = scored.filter(_._1 == 0).map(_._2).max
    assert(posMin > negMax) // linearly separable data separates exactly
  }

  test("rerank breaks a BM25 tie toward the trained-quality document") {
    // training: relevant docs are the longer ones at comparable bm25
    val train = Seq(
      (100L, 50L, 200L, 1), (101L, 50L, 30L, 0),
      (102L, 40L, 180L, 1), (103L, 60L, 25L, 0)
    ).toDF("id", "bm25", "len", "y")
    val w = Rerank.trainLinear(train, Seq(col("bm25"), col("len")), col("y"))
    // two candidates with IDENTICAL bm25 — the score a plain BM25 tail
    // can only tie-break arbitrarily (by id)
    val cands = Seq(("q1", 1L, 50L, 30L), ("q1", 2L, 50L, 200L))
      .toDF("q", "doc", "bm25", "len")
    val out = Rerank.rerank(cands, col("q"), Seq(col("bm25"), col("len")), w, col("doc"))
      .select("doc", "rr_rank").as[(Long, Int)].collect().toMap
    assert(out(2L) === 1) // the long relevant-looking doc wins the tie
    assert(out(1L) === 2)
  }

  test("trainLinear refuses empty and single-class training sets") {
    val oneClass = Seq((1L, 2L, 1)).toDF("id", "f1", "y")
    intercept[IllegalArgumentException] {
      Rerank.trainLinear(oneClass, Seq(col("f1")), col("y"))
    }
  }
}
