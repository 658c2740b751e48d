package graft

import org.apache.spark.sql.functions._

import graft.dedup.{Components, Decontam, Dedup}
import graft.text.{TextAnalysis, TextPrep}

/** The facade must be pure delegation: every chain row-identical to
  * the manual composition of the (individually oracle-gated)
  * operators it wraps. Runs on the real sf0.001 documents table. */
class CorpusSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
  private def corpus = Corpus(docs, col("text"), col("doc_id"))

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").as[Long].collect().toSet

  test("quality + exact dedup + near dedup chain equals manual composition") {
    val chained = corpus.qualityFilter(30).exactDedup().nearDedup().df
    val gated = docs.filter(TextAnalysis.tokenCount(col("text")) >= 30)
    val exact = Dedup.exactDedupKeyed(gated, col("text"), col("doc_id")).drop("fp", "group_n")
    val manual = Components.keepOnePerCluster(exact, col("doc_id"),
      Dedup.minhashCandidatePairs(exact, col("text"), col("doc_id")), "doc_a", "doc_b")
    assert(ids(chained) === ids(manual))
    assert(ids(chained).nonEmpty && ids(chained).size < docs.count())
  }

  test("keep-best near dedup keeps one per cluster, preferring length") {
    val kept = corpus.nearDedupKeepBest().df
    val minId = corpus.nearDedup().df
    assert(kept.count() === minId.count()) // same cluster structure, maybe different reps
  }

  test("decontaminate and screenAgainst delegate exactly") {
    val bench = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
    val rest = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0)
    val viaFacade = Corpus(rest, col("text"), col("doc_id"))
      .decontaminate(bench, col("text"), col("doc_id")).df
    val manual = Decontam.decontaminate(rest, col("text"), col("doc_id"),
      bench, col("text"), col("doc_id"), 3, 3)
    assert(ids(viaFacade) === ids(manual))

    val screened = Corpus(bench, col("text"), col("doc_id"))
      .screenAgainst(rest, col("text"), col("doc_id")).df
    val manualScreen = Dedup.minhashNovel(
      rest.select(col("doc_id"), col("text")), bench, col("text"), col("doc_id"))
    assert(ids(screened) === ids(manualScreen))
  }

  test("screenAgainst works with non-default column names on both sides") {
    // the facade accepts arbitrary Columns — a corpus named (url, body)
    // screened by a batch named (key, content) must behave exactly like
    // the default-named case
    val bench = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
    val rest = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0)
    val renamedBatch = bench.select(col("doc_id").as("key"), col("text").as("content"))
    val renamedCorpus = rest.select(col("doc_id").as("url"), col("text").as("body"))
    val screened = Corpus(renamedBatch, col("content"), col("key"))
      .screenAgainst(renamedCorpus, col("body"), col("url")).df
      .select(col("key")).as[Long].collect().toSet
    val defaultNamed = Corpus(bench, col("text"), col("doc_id"))
      .screenAgainst(rest, col("text"), col("doc_id")).df
      .select(col("doc_id")).as[Long].collect().toSet
    assert(screened === defaultNamed)
  }

  test("splitAssign and stats close the pipeline") {
    val out = corpus.qualityFilter(30).splitAssign().df
    val splits = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(splits.keySet === Set("train", "val", "test"))
    assert(splits("train") > splits("val"))
    val st = corpus.stats(col("source"))
    assert(st.count() === 20) // 20 sources in the synthetic corpus
    // stats values match the independent aggregate
    val manual = docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(trim(col("text")), "\\s+")).cast("bigint")).as("total_tokens"))
    assert(st.orderBy("source").collect().toSeq === manual.orderBy("source").collect().toSeq)
  }
}
