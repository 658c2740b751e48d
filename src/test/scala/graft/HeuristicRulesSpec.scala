package graft

import org.apache.spark.sql.functions._

import graft.quality.HeuristicRules

/** Gopher document rules + C4 line rules: each rule isolated on a
  * crafted fixture, predicate/report consistency, and the facade
  * stages. q_gopher_rules / q_c4_rules are the oracle gates. */
class HeuristicRulesSpec extends SparkSpecBase {
  import spark.implicits._

  // 25 DISTINCT filler words (2 stopwords, mean length in [3,10], no
  // repeated 2-gram) keep every rule passing except the one a crafted
  // doc breaks on purpose
  private val words23 = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
    "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november", "oscar",
    "papa", "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey")
  private val filler = ("the" +: "of" +: words23).mkString(" ")

  private def gopher(rows: (Long, String)*) =
    HeuristicRules.gopherRules(rows.toDF("doc_id", "text"), col("text"), col("doc_id"),
        minWords = 20, maxWords = 80)
      .select("doc_id", "pass_word_count", "pass_mean_len", "pass_stop", "pass_alpha",
        "pass_dup2", "pass")
      .as[(Long, Int, Int, Int, Int, Int, Int)].collect().map(r => r._1 -> r).toMap

  test("each Gopher rule fails in isolation on its crafted doc") {
    val got = gopher(
      1L -> filler,                                    // everything passes
      2L -> "the of and",                              // too few words
      3L -> (filler + " " + Seq.fill(20)("a b").mkString(" ")), // mean len < 3
      4L -> Seq.fill(15)("alpha beta gamma").mkString(" "),     // no stopword hits
      // alpha ratio: 6 of 25 words are pure digits → 19/25 < 0.8
      5L -> (("the" +: "of" +: words23.take(17))
        ++ Seq("111", "222", "333", "444", "555", "666")).mkString(" "),
      6L -> ("the of " + Seq.fill(30)("dup gram").mkString(" ")) // one 2-gram dominates
    )
    assert(got(1L) === ((1L, 1, 1, 1, 1, 1, 1)))
    assert(got(2L)._2 === 0 && got(2L)._7 === 0)       // word count
    assert(got(3L)._3 === 0, got(3L))                  // mean length
    assert(got(4L)._4 === 0 && got(4L)._2 === 1)       // stopwords
    assert(got(5L)._5 === 0, got(5L))                  // alpha ratio
    assert(got(6L)._6 === 0, got(6L))                  // top-2-gram coverage
  }

  test("top-2-gram tie breaks to the lexicographically smallest gram") {
    val out = HeuristicRules.gopherRules(
        Seq((1L, "b a b a")).toDF("doc_id", "text"), col("text"), col("doc_id"))
      .select("top2_count", "top2_gram").as[(Long, String)].head()
    // grams: "b a"(×2)? no — "b a","a b","b a" → "b a"=2, "a b"=1
    assert(out === ((2L, "b a")))
  }

  test("gopherPass predicate agrees with the report's pass column") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val viaPred = docs.filter(HeuristicRules.gopherPass(col("text"), 20, 80))
      .select("doc_id").as[Long].collect().toSet
    val viaReport = HeuristicRules.gopherRules(docs, col("text"), col("doc_id"), 20, 80)
      .filter(col("pass") === 1).select("doc_id").as[Long].collect().toSet
    assert(viaPred === viaReport)
    assert(viaPred.nonEmpty && viaPred.size < docs.count(), "rules should bind both ways")
  }

  test("C4 line rules keep terminal-punctuated 3+-word lines and count sentences") {
    val page = Seq(
      "This line stays right here.",   // kept
      "Too short.",                    // < 3 words
      "no terminal punctuation here",  // no terminal
      "Another proper sentence stays!",
      "And a third one does too?",
      "A fourth keeper arrives now.",
      "The fifth one closes it out.").mkString("\n")
    val out = HeuristicRules.c4LineRules(
        Seq((1L, page), (2L, "curly { brace page with no luck."),
          (3L, "Lorem ipsum dolor sit amet and more words here.")).toDF("doc_id", "text"),
        col("text"), col("doc_id"))
      .select("doc_id", "n_lines", "n_kept_lines", "n_sentences", "has_lorem", "has_brace", "pass")
      .as[(Long, Long, Long, Long, Int, Int, Int)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 7L, 5L, 5L, 0, 0, 1)))
    assert(out(2L)._6 === 1 && out(2L)._7 === 0)
    assert(out(3L)._5 === 1 && out(3L)._7 === 0)
  }

  test("facade stages: gopher filter ledgers drops, c4 rewrites text in place") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val g = Corpus(docs, col("text"), col("doc_id")).audited.gopherQualityFilter(20, 80)
    val kept = g.df.select("doc_id").as[Long].collect().toSet
    val all = docs.select("doc_id").as[Long].collect().toSet
    assert(g.dropLedger.select("doc_id").as[Long].collect().toSet === (all -- kept))

    val pages = Seq(
      (1L, ("Keep this full sentence now please. " * 6).trim),
      (2L, "no keepers anywhere at all")).toDF("doc_id", "text")
    val c = Corpus(pages, col("text"), col("doc_id")).audited.c4LineFilter()
    val out = c.df.select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out.keySet === Set(1L))
    assert(out(1L).split("\n").forall(_.endsWith(".")))
    assert(c.dropLedger.select("doc_id").as[Long].collect().toSet === Set(2L))
  }

  // ---- repetition-signal battery --------------------------------

  private def repSignals(rows: (Long, String)*) =
    HeuristicRules.repetitionSignals(rows.toDF("doc_id", "text"),
      col("text"), col("doc_id"))

  test("duplicate line and paragraph mass on crafted multi-line docs") {
    // gate data has no newlines, so the line/paragraph signals are
    // proved here: dup counts are occurrences beyond the first of
    // each distinct member, dup chars their character mass
    val out = repSignals(
        1L -> "dog\ncat\ndog\ncat\ndog",   // lines: 5, distinct 2
        2L -> "x y\n\nx y")                 // paras: [x y, x y]
      .select("doc_id", "n_lines", "dup_lines", "dup_line_chars",
        "n_paras", "dup_paras", "dup_para_chars")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 5L, 3L, 9L, 1L, 0L, 0L)))
    // lines of doc 2 are ["x y", "", "x y"] — one dup of 3 chars
    assert(out(2L) === ((2L, 3L, 1L, 3L, 2L, 1L, 3L)))
  }

  test("top n-gram coverage: count x length, ties keep the smallest gram") {
    val out = repSignals(
        1L -> "a b a b a b",   // "a b"x3 beats "b a"x2; 3-grams tie at 2
        2L -> "q w e r t y")   // all grams unique -> c<2 -> 0 (RP2 convention)
      .select("doc_id", "text_chars", "top2_chars", "top3_chars")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // top2 = 3·len("a b") = 9; top3 tie ("a b a" vs "b a b", both x2)
    // keeps the lexicographically smallest -> 2·len("a b a") = 10
    assert(out(1L) === ((1L, 11L, 9L, 10L)))
    assert(out(2L)._3 === 0L && out(2L)._4 === 0L)
  }

  test("duplicated n-gram mass counts occurrences beyond the first") {
    val t = "one two three four five one two three four five"
    val out = repSignals(1L -> t)
      .select("dup5_chars", "dup6_chars").as[(Long, Long)].head()
    // "one two three four five" (23 chars) appears twice among the
    // six 5-grams -> (2-1)·23; no 6-gram repeats
    assert(out === ((23L, 0L)))
  }

  test("repetitionPass predicate agrees with the report's pass column") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val viaPred = docs.filter(HeuristicRules.repetitionPass(col("text")))
      .select("doc_id").as[Long].collect().toSet
    val viaReport = HeuristicRules.repetitionSignals(docs, col("text"), col("doc_id"))
      .filter(col("pass") === 1).select("doc_id").as[Long].collect().toSet
    assert(viaPred === viaReport)
    assert(viaPred.nonEmpty && viaPred.size < 500,
      s"crafted synthetic text should trip some repetition rule: ${viaPred.size}")

    // facade stage keeps exactly the passing docs and ledgers the rest
    val c = Corpus(docs, col("text"), col("doc_id")).audited.repetitionFilter()
    assert(c.df.select("doc_id").as[Long].collect().toSet === viaPred)
  }
}
