package graft

import org.apache.spark.sql.functions._

import graft.dedup.SentenceDedup

/** C4 3-sentence-span dedup: sentence-aligned detection (the behavior
  * token-stride windows can't give), punctuation-less subdivision,
  * the keep-first scrub policy, and full brute-force parity on the
  * real sf0.001 corpus. q_sentence_dedup is the oracle gate. */
class SentenceDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val S = 8

  // -- local brute force: same segmentation + policy, plain Scala ----

  private def segment(text: String, s: Int): Vector[(String, Long, Long)] = {
    val toks = text.trim.split("\\s+").toVector.zipWithIndex
    // punctuation sentence id = terminals strictly before the token
    var run = 0
    val withS1 = toks.map { case (t, i) =>
      val s1 = run
      if (t.nonEmpty && ".!?".contains(t.last)) run += 1
      (t, i.toLong, s1)
    }
    withS1.groupBy(_._3).toVector.sortBy(_._1).flatMap { case (_, sent) =>
      sent.sortBy(_._2).grouped(s).map { chunk =>
        (chunk.map(_._1).mkString(" "), chunk.head._2, chunk.last._2)
      }
    }
  }

  private def bruteSpans(docs: Seq[(Long, String)]): Set[(Long, Long, Long, Long, Long)] = {
    val occ = docs.flatMap { case (id, text) =>
      val sents = segment(text, S)
      sents.sliding(3).zipWithIndex.collect {
        case (w, si) if w.size == 3 =>
          (id, si.toLong, w.head._2, w.last._3, w.map(_._1).mkString(" "))
      }
    }
    val byText = occ.groupBy(_._5).filter(_._2.size >= 2)
    byText.values.flatten.map(o => (o._1, o._2, o._3, o._4,
      byText(o._5).size.toLong)).toSet
  }

  private def sparkSpans(docs: Seq[(Long, String)]): Set[(Long, Long, Long, Long, Long)] =
    SentenceDedup.duplicatedSentenceSpans(
        docs.toDF("doc_id", "text"), col("text"), col("doc_id"), S)
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  // -- fixtures ------------------------------------------------------

  test("sentence-aligned: shared sentences found despite different token offsets") {
    // the shared 3 sentences start at token 2 in doc 1 and token 4 in
    // doc 2 — a fixed token-stride window dedup would only match if
    // the phases happened to align; sentence alignment is exact
    val docs = Seq(
      (1L, "short intro. alpha beta gamma. delta epsilon. zeta eta theta."),
      (2L, "a much longer intro here. alpha beta gamma. delta epsilon. zeta eta theta."))
    val got = sparkSpans(docs)
    assert(got === bruteSpans(docs))
    // each doc reports exactly one duplicated span (the shared one)
    assert(got.map(_._1) === Set(1L, 2L))
    assert(got.forall(_._5 == 2L))
    // and it starts where the shared sentences start in EACH doc
    assert(got.collect { case (1L, _, st, _, _) => st } === Set(2L))
    assert(got.collect { case (2L, _, st, _, _) => st } === Set(5L))
  }

  test("punctuation-less docs subdivide every maxSentTokens tokens") {
    val twenty = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, twenty), (2L, twenty), (3L, "something else entirely"))
    val got = sparkSpans(docs)
    assert(got === bruteSpans(docs))
    // 20 tokens → sentences of 8/8/4 → exactly one 3-sentence span,
    // duplicated across docs 1 and 2; doc 3 has <3 sentences
    assert(got === Set((1L, 0L, 0L, 19L, 2L), (2L, 0L, 0L, 19L, 2L)))
  }

  test("scrub keeps the first occurrence and deletes the rest") {
    val twentyFour = (1 to 24).map(i => s"w$i").mkString(" ")
    val docs = Seq((5L, twentyFour), (9L, twentyFour),
      (7L, "unique doc with nothing shared at all"))
    val out = SentenceDedup.scrubDuplicatedSentenceSpans(
        docs.toDF("doc_id", "text"), col("text"), col("doc_id"), S)
      .as[(Long, String, Long)].collect().sortBy(_._1).toList
    // 24 tokens → 3 sentences → one span per doc; doc 5 is canonical
    // (min doc_id) and survives whole; doc 9's only span is scrubbed →
    // every sentence covered → the doc disappears; doc 7 untouched
    assert(out.map(_._1) === List(5L, 7L))
    assert(out.head._2 === twentyFour && out.head._3 === 3L)
    assert(out(1)._2 === "unique doc with nothing shared at all")
  }

  test("corpus facade stage rewrites text in place and ledgers vanished docs") {
    val twentyFour = (1 to 24).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, twentyFour), (2L, twentyFour), (3L, "keep me as i am please"))
      .toDF("doc_id", "text")
    val c = Corpus(docs, col("text"), col("doc_id")).audited.scrubSentences(S)
    val kept = c.df.select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(kept.keySet === Set(1L, 3L))
    assert(kept(1L) === twentyFour)
    assert(c.dropLedger.select("doc_id").as[Long].collect().toSet === Set(2L))
  }

  test("brute-force parity on the real sf0.001 documents table") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val local = docs.select("doc_id", "text").as[(Long, String)].collect().toSeq
    val got = SentenceDedup.duplicatedSentenceSpans(docs, col("text"), col("doc_id"), S)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === bruteSpans(local))
    assert(got.nonEmpty, "fixture should contain duplicated spans at sf0.001")
  }
}
