package graft

import org.apache.spark.sql.functions._

import graft.similarity.Similarity
import graft.text.HashEmbed

/** Native HashedBow projection: parity with the composed
  * explode/groupBy formulation, SQL registration, and the
  * text→vector bridge into the integer-cosine operators. */
class HashEmbedSpec extends SparkSpecBase {
  import spark.implicits._

  private val D = 32

  private def docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")

  test("native projection equals the composed explode/groupBy formulation") {
    def bucket(c: org.apache.spark.sql.Column) =
      pmod(conv(substring(md5(c), 1, 7), 16, 10).cast("long"), lit(D.toLong))
    def sign(c: org.apache.spark.sql.Column) =
      when(pmod(conv(substring(md5(c), 8, 1), 16, 10).cast("long"), lit(2L)) === 1, 1L)
        .otherwise(-1L)
    val composed = docs
      .select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("t"))
      .groupBy(col("doc_id"), bucket(col("t")).as("pos"))
      .agg(sum(sign(col("t"))).as("v"))
    val native = docs
      .select(col("doc_id"), posexplode(HashEmbed.hashedBow(col("text"), D)).as(Seq("pos", "v")))
      .filter(col("v") =!= 0)
    assert(native.count() > 0)
    assert(native.exceptAll(composed).count() === 0)
    assert(composed.filter(col("v") =!= 0).exceptAll(native).count() === 0)
  }

  test("SQL-registered graft_hashed_bow matches the Column API") {
    docs.limit(20).createOrReplaceTempView("__hb_docs")
    val viaSql = spark.sql(s"SELECT doc_id, graft_hashed_bow(text, $D) AS e FROM __hb_docs")
    val viaCol = docs.limit(20).select(col("doc_id"), HashEmbed.hashedBow(col("text"), D).as("e"))
    assert(viaSql.exceptAll(viaCol).count() === 0)
  }

  test("an exact duplicate is its own nearest neighbour at cosine 1") {
    val baseIds = docs.select("doc_id").as[Long].collect().sorted.take(10)
    val base = docs.filter(col("doc_id").isin(baseIds: _*)).select(col("doc_id"), col("text"))
    val dupOf = baseIds.head
    val dup = base.filter(col("doc_id") === dupOf)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val emb = HashEmbed.embedDocuments(base.unionAll(dup), col("text"), col("doc_id"), D)
    val qs = emb.filter(col("vec_id") >= 100000L)
    val top = Similarity.cosineTopK(emb, qs, 1).head()
    assert(top.getLong(1) === dupOf) // neighbor = the original
    assert(top.getDouble(3) === 1.0)
  }

  test("hashed embeddings drive SemDedup end to end on text alone") {
    // duplicate a slice of real docs under new ids: semantic dedup over
    // the HASHED projections must drop exactly the planted copies
    val base = docs.select(col("doc_id"), col("text"))
    val planted = base.filter(pmod(col("doc_id"), lit(7)) === 0)
      .select((col("doc_id") + 500000L).as("doc_id"), col("text"))
    val all = base.unionAll(planted)
    val emb = HashEmbed.embedDocuments(all, col("text"), col("doc_id"), D)
    val keptIds = graft.similarity.SemDedup
      .semDedup(emb, numCentroids = 4, lloydIters = 2, tau = 0.999)
      .filter(!col("is_dup"))
      .select("vec_id").as[Long].collect().toSet
    val plantedIds = planted.select("doc_id").as[Long].collect().toSet
    // every planted exact-duplicate pair loses at least one member
    // (the corpus also carries its OWN generator near-dups, so other
    // drops are legitimate — the pair guarantee is the invariant)
    assert(plantedIds.forall(p => !keptIds.contains(p) || !keptIds.contains(p - 500000L)),
      "a duplicate pair can keep at most one member")
    val dropped = all.select("doc_id").as[Long].collect().toSet -- keptIds
    assert(plantedIds.exists(p => dropped.contains(p) || dropped.contains(p - 500000L)),
      "planted duplicates must be detected")
  }
}
