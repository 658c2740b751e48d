package graft

import org.apache.spark.sql.functions._

import graft.text.Search

/** Exact phrase search: overlap semantics, variable phrase lengths,
  * normalization, and brute-force parity on real testdata.
  * q_phrase_search is the oracle gate. */
class SearchSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], phrases: Seq[String]) =
    Search.phraseOccurrences(
        docs.toDF("doc_id", "text"), col("text"), col("doc_id"),
        phrases.toDF("phrase"), col("phrase"), col("phrase"))
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("overlapping occurrences count every start position") {
    val out = run(Seq(1L -> "a a a a"), Seq("a a"))
    assert(out(("a a", 1L)) === 3L)
  }

  test("variable phrase lengths in one call; absent phrases emit nothing") {
    val out = run(
      Seq(1L -> "the quick brown fox and the quick red fox",
        2L -> "nothing to see here"),
      Seq("the quick", "the quick brown fox", "purple cow"))
    assert(out(("the quick", 1L)) === 2L)
    assert(out(("the quick brown fox", 1L)) === 1L)
    assert(!out.keys.exists(_._1 == "purple cow"))
    assert(!out.keys.exists(_._2 == 2L))
  }

  test("matching is lowercase and whitespace-normalized") {
    val out = run(Seq(1L -> "  The   QUICK fox  "), Seq("the quick"))
    assert(out(("the quick", 1L)) === 1L)
  }

  test("a phrase prefix present without its suffix does not match") {
    // "b c" opens a candidate at the doc tail — start+1 must NOT hit
    val out = run(Seq(1L -> "a b c"), Seq("b c d", "b c"))
    assert(out.get(("b c d", 1L)) === None)
    assert(out(("b c", 1L)) === 1L)
  }

  test("brute-force parity on testdata with corpus-derived phrases") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val phrases = Search.topPhrases(docs, col("text"), n = 2, k = 3)
      .as[String].collect().toSeq
    val got = Search.phraseOccurrences(docs, col("text"), col("doc_id"),
        phrases.toDF("phrase"), col("phrase"), col("phrase"))
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val raw = docs.select("doc_id", "text").as[(Long, String)].collect()
    val expect = (for {
      (id, text) <- raw
      ph <- phrases
      pt = ph.split(" ")
      toks = text.trim.toLowerCase.split("\\s+")
      c = (0 to toks.length - pt.length)
        .count(p => toks.slice(p, p + pt.length).sameElements(pt))
      if c > 0
    } yield (ph, id) -> c.toLong).toMap
    assert(got === expect)
    assert(got.nonEmpty)
  }
}
