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

  test("bm25Rank replays an independent local model on a randomized corpus") {
    def qlog(x: Long): Long = {
      val bl = 64 - java.lang.Long.numberOfLeadingZeros(x)
      64L * (bl - 1) + math.floor(x.toDouble * 64 / math.pow(2.0, bl - 1)).toLong - 64L
    }
    val rnd = new scala.util.Random(41)
    val vocab = (0 until 12).map(i => s"w$i")
    val docs = (1L to 50L).map(i =>
      (i, (0 until rnd.nextInt(30) + 1).map(_ => vocab(rnd.nextInt(12))).mkString(" ")))
    val terms = Seq("w0", "w3", "w7")
    val out = Search.bm25Rank(docs.toDF("doc_id", "text"), col("text"), col("doc_id"),
        terms, topK = 10)
      .as[(Long, Long, Int)].collect()
    // local replay
    val toks = docs.map { case (i, t) => i -> t.trim.toLowerCase.split("\\s+").toSeq }.toMap
    val n = docs.size.toLong
    val tl = toks.values.map(_.size.toLong).sum
    val scores = docs.map { case (i, _) =>
      val dl = toks(i).size.toLong
      i -> terms.map { t =>
        val tf = toks(i).count(_ == t).toLong
        val df = docs.count(d => toks(d._1).contains(t)).toLong
        if (tf == 0) 0L
        else ((qlog(2 * n + 2) - qlog(2 * df + 1)) * (22 * tf * tl)) /
          (10 * tl * tf + 3 * tl + 9 * dl * n)
      }.sum
    }.filter(_._2 > 0)
    val expect = scores.sortBy { case (id, s) => (-s, id) }.take(10)
      .zipWithIndex.map { case ((id, s), r) => (id, s, r + 1) }
    assert(out.toSeq === expect)
  }

  test("bm25Rank: rare terms outrank common, shorter docs outrank longer at equal tf") {
    val filler = (1 to 40).map(i => (100L + i, "x y z x y z")) // background mass
    val docs = filler ++ Seq(
      (1L, "rare a b c"),             // rare term, short doc
      (2L, "rare a b c d e f g h i"), // same tf of rare, longer doc
      (3L, "x a b c"))                // only the ubiquitous term
    val out = Search.bm25Rank(docs.toDF("doc_id", "text"), col("text"), col("doc_id"),
        Seq("rare", "x"), topK = 50)
      .as[(Long, Long, Int)].collect().map(r => r._1 -> r._2).toMap
    assert(out(1L) > out(2L), "length normalization favors the shorter doc")
    assert(out(2L) > out(3L), "idf favors the rare term over the ubiquitous one")
  }
}
