package graft

import org.apache.spark.sql.functions._

import graft.quality.{Datasheet, HeuristicRules}

/** Per-source corpus datasheet: hand-computed fixture values plus
  * consistency with the individually-gated battery operators on real
  * testdata. q_datasheet is the oracle gate. */
class DatasheetSpec extends SparkSpecBase {
  import spark.implicits._

  test("fixture: volume, langs, dup mass and vocab per source") {
    val docs = Seq(
      (1L, "Hello world hello world.", "en", "A"),
      (2L, "Hello world hello world.", "en", "A"), // exact dup of 1
      (3L, "alpha beta", "en", "B"),
      (4L, "alpha beta", "fr", "B")                // dup of 3, new lang
    ).toDF("doc_id", "text", "lang", "source")
    val out = Datasheet.perSource(docs, col("text"), col("doc_id"),
        col("source"), col("lang"))
      .select("source", "n_docs", "n_tokens", "n_chars", "n_langs",
        "dup_docs", "vocab")
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    // A: 4+4 tokens, 24+24 chars, vocab {hello, world, world.}
    assert(out("A") === (("A", 2L, 8L, 48L, 1L, 1L, 3L)))
    // B: same text under two langs — dup counts by content, langs = 2
    assert(out("B") === (("B", 2L, 4L, 20L, 2L, 1L, 2L)))
  }

  test("pass counts agree with the battery predicates on testdata") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val ds = Datasheet.perSource(docs, col("text"), col("doc_id"),
      col("source"), col("lang"), minWords = 20, maxWords = 500)
    val got = ds.agg(
        sum("n_docs"), sum("gopher_pass"), sum("rep_pass"), sum("c4_pass"))
      .as[(Long, Long, Long, Long)].head()
    val expectG = docs.filter(HeuristicRules.gopherPass(col("text"), 20, 500)).count()
    val expectR = docs.filter(HeuristicRules.repetitionPass(col("text"))).count()
    val expectC = docs.filter(HeuristicRules.c4Pass(col("text"))).count()
    assert(got === ((500L, expectG, expectR, expectC)))
  }
}
