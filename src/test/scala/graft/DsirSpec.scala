package graft

import org.apache.spark.sql.functions._

import graft.quality.Dsir

/** DSIR importance resampling (arXiv:2302.03169): trained hashed
  * n-gram ratio grid + integer importance weights. Fixture-driven
  * behavior checks on top of the full oracle replay (q_dsir). */
class DsirSpec extends SparkSpecBase {
  import spark.implicits._

  private val B = 64

  test("target-like documents outrank off-domain ones") {
    val target = Seq((1L, "alpha beta gamma alpha beta"),
      (2L, "beta gamma alpha beta gamma")).toDF("doc_id", "text")
    val raw = Seq(
      (10L, "alpha beta gamma beta alpha"),   // on-domain
      (11L, "delta epsilon zeta delta zeta"), // off-domain
      (12L, "gamma alpha beta alpha gamma"),  // on-domain
      (13L, "eta theta iota eta theta")       // off-domain
    ).toDF("doc_id", "text")
    val sel = Dsir.select(raw, col("text"), col("doc_id"),
        target, col("text"), col("doc_id"), k = 2, buckets = B)
      .select("doc_id").as[Long].collect().toSet
    assert(sel === Set(10L, 12L))
  }

  test("bigram features separate docs with identical unigram bags") {
    // same words, different adjacency: the target's strong "fast car"
    // bigram must pull the matching order ahead
    val target = Seq((1L, "fast car fast car fast car")).toDF("doc_id", "text")
    val raw = Seq((10L, "fast car fast car"), (11L, "car fast car fast"))
      .toDF("doc_id", "text")
    val ratios = Dsir.logRatios(target, col("text"), col("doc_id"),
      raw, col("text"), col("doc_id"), buckets = B)
    val w = Dsir.importanceWeights(raw, col("text"), col("doc_id"), ratios, B)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w(10L) > w(11L),
      s"matching word order must score higher: ${w(10L)} vs ${w(11L)}")
  }

  test("unseen vocabulary scores finitely via the Laplace floor") {
    val target = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val raw = Seq((10L, "alpha beta"), (11L, "qqqq wwww eeee"))
      .toDF("doc_id", "text")
    val sel = Dsir.select(raw, col("text"), col("doc_id"),
      target, col("text"), col("doc_id"), k = 2, buckets = B)
    val rows = sel.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.keySet === Set(10L, 11L))
    assert(rows(10L) > rows(11L))
  }

  test("select ranks by the reusable logRatios + importanceWeights halves") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val target = docs.filter(col("lang") === "en")
    val ratios = Dsir.logRatios(target, col("text"), col("doc_id"),
      docs, col("text"), col("doc_id"), buckets = B)
    val manual = Dsir.importanceWeights(docs, col("text"), col("doc_id"), ratios, B)
      .orderBy(col("iw").desc, col("doc_id").asc).limit(5)
      .select("doc_id").as[Long].collect().toSeq
    val viaSelect = Dsir.select(docs, col("text"), col("doc_id"),
        target, col("text"), col("doc_id"), k = 5, buckets = B)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(viaSelect === manual)
    // the target slice itself should dominate the selection
    val langOf = docs.select("doc_id", "lang").as[(Long, String)].collect().toMap
    assert(viaSelect.count(langOf(_) == "en") >= 4,
      s"top-5 under an en target should be mostly en: $viaSelect")
  }
}
