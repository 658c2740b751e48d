package graft

import org.apache.spark.sql.functions._

import graft.sketch.{BloomFilter, BloomLedger}

/** Bloom-ledger contracts: OR-mergeability (bit-equal to a single
  * register over the union), the no-false-negative guarantee, the
  * exact mode's plan-not-answer property, idempotent parquet appends,
  * and the mixed-config refusal. */
class BloomLedgerSpec extends SparkSpecBase {
  import spark.implicits._

  private val Bits = 1 << 12
  private def docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")

  test("OR of per-drop registers is bit-equal to the single-shot register") {
    val a = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val b = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
    val perDrop = BloomLedger.merged(
      BloomLedger.dropSummary(a, "a", md5(col("text")), Bits)
        .unionAll(BloomLedger.dropSummary(b, "b", md5(col("text")), Bits)))
    val oneShot = BloomLedger.dropSummary(docs, "all", md5(col("text")), Bits)
    val w1 = perDrop.select("words").head().getSeq[Long](0)
    val w2 = oneShot.select("words").head().getSeq[Long](0)
    assert(w1 === w2)
  }

  test("no false negatives: every historical key flags might_seen") {
    val history = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
    val merged = BloomLedger.merged(
      BloomLedger.dropSummary(history, "h", md5(col("text")), Bits))
    val screened = BloomLedger.screen(docs, md5(col("text")), merged)
    // every doc whose text exists in history must flag
    val missed = screened.filter(!col("might_seen"))
      .join(history.select(md5(col("text")).as("__fp")).distinct(),
        md5(col("text")) === col("__fp"), "left_semi")
    assert(missed.count() === 0)
    // and the screen is not vacuous: some rows are certainly novel
    assert(screened.filter(!col("might_seen")).count() > 0)
  }

  test("novelExact equals the plain anti-join regardless of FP rate") {
    // tiny register → heavy FP pressure; the exact confirm must erase it
    val tinyBits = 64
    val history = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
    val merged = BloomLedger.merged(
      BloomLedger.dropSummary(history, "h", md5(col("text")), tinyBits))
    val got = BloomLedger.novelExact(history, md5(col("text")),
        docs, md5(col("text")), merged)
      .select("doc_id").as[Long].collect().toSet
    val want = docs.join(history.select(md5(col("text")).as("__fp")).distinct(),
        md5(col("text")) === col("__fp"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(got === want)
  }

  test("appends are idempotent per drop id and round-trip parquet") {
    val path = java.nio.file.Files.createTempDirectory("bloomledger").toString + "/ledger"
    val a = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val b = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
    BloomLedger.append(path, BloomLedger.dropSummary(a, "a", md5(col("text")), Bits))
    BloomLedger.append(path, BloomLedger.dropSummary(b, "b", md5(col("text")), Bits))
    // retry of drop b must overwrite, not duplicate
    BloomLedger.append(path, BloomLedger.dropSummary(b, "b", md5(col("text")), Bits))
    val ledger = spark.read.parquet(path)
    assert(ledger.count() === 2)
    val viaDisk = BloomLedger.mergedFrom(spark, path).select("words").head().getSeq[Long](0)
    val direct = BloomLedger.dropSummary(docs, "all", md5(col("text")), Bits)
      .select("words").head().getSeq[Long](0)
    assert(viaDisk === direct)
  }

  test("merged refuses mixed register configurations") {
    val mixed = BloomLedger.dropSummary(docs, "a", md5(col("text")), 1 << 10)
      .unionAll(BloomLedger.dropSummary(docs, "b", md5(col("text")), 1 << 11))
    val e = intercept[IllegalArgumentException] { BloomLedger.merged(mixed) }
    assert(e.getMessage.contains("mixed register configs"))
  }
}
