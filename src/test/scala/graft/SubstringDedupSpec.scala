package graft

import org.apache.spark.sql.functions._
import scala.util.Random

import graft.dedup.SubstringDedup

class SubstringDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val W = 3

  test("duplicatedSpans finds a span shared by two docs and merges its windows") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta unique1 tail1"),
      (2L, "head2 alpha beta gamma delta epsilon zeta other2"),
      (3L, "completely different words nothing shared here at all")
    ).toDF("doc_id", "text")
    val out = SubstringDedup.duplicatedSpans(docs, col("text"), col("doc_id"), W)
      .as[(Long, Long, Long, Long)].collect().toSet
    // "alpha..zeta" = 6 tokens → 4 dup 3-gram windows, one merged span
    // per doc at its own offset (doc1 positions 0-5, doc2 1-6)
    assert(out === Set((1L, 0L, 5L, 4L), (2L, 1L, 6L, 4L)))
  }

  test("duplicatedSpans counts within-doc repetition as duplication") {
    val docs = Seq(
      (1L, "loop one two three loop one two three end")
    ).toDF("doc_id", "text")
    val out = SubstringDedup.duplicatedSpans(docs, col("text"), col("doc_id"), W)
      .as[(Long, Long, Long, Long)].collect().toSet
    // "loop one two three" repeats at positions 0 and 4; the two
    // window runs overlap (positions 0,1 and 4,5) and merge into one
    // span covering tokens 0..7
    assert(out === Set((1L, 0L, 7L, 4L)))
  }

  test("docs shorter than the window produce no spans and survive the scrub untouched") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, null: String)).toDF("doc_id", "text")
    assert(SubstringDedup.duplicatedSpans(docs, col("text"), col("doc_id"), W).count() === 0)
    val scrub = SubstringDedup.scrubDuplicatedSpans(docs, col("text"), col("doc_id"), W)
      .as[(Long, String, Long)].collect().toSet
    assert(scrub === Set((1L, "a b", 2L), (2L, "a b", 2L)))
  }

  test("scrubDuplicatedSpans keeps the canonical first occurrence, deletes the rest") {
    val docs = Seq(
      (1L, "alpha beta gamma delta keepme1"),
      (2L, "pre2 alpha beta gamma delta post2")
    ).toDF("doc_id", "text")
    val out = SubstringDedup.scrubDuplicatedSpans(docs, col("text"), col("doc_id"), W)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 1 holds the canonical (min doc_id, pos) windows → untouched;
    // doc 2 loses tokens 1-4, keeps its frame
    assert(out(1L) === (("alpha beta gamma delta keepme1", 5L)))
    assert(out(2L) === (("pre2 post2", 2L)))
  }

  test("a doc that is entirely a second occurrence disappears from the scrub") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta")
    ).toDF("doc_id", "text")
    val out = SubstringDedup.scrubDuplicatedSpans(docs, col("text"), col("doc_id"), W)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out === Map(1L -> (("alpha beta gamma delta", 4L))))
  }

  test("duplicatedSpans matches a brute-force reference on random docs") {
    val rnd = new Random(42)
    // tiny vocabulary forces genuine duplicated runs
    val vocab = Vector("aa", "bb", "cc", "dd")
    val docs = (1L to 30L).map { i =>
      (i, Seq.fill(4 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // brute force: multiset of windows, dup set, per-doc interval merge
    val wins = docs.flatMap { case (id, t) =>
      val toks = t.split("\\s+").toVector
      (0 to toks.length - W).map(p => (id, p.toLong, toks.slice(p, p + W).mkString(" ")))
    }
    val dup = wins.groupBy(_._3).filter(_._2.size >= 2).keySet
    val expected = wins.filter(w => dup(w._3)).groupBy(_._1).flatMap { case (id, ws) =>
      val ps = ws.map(_._2).sorted
      val spans = ps.foldLeft(List.empty[(Long, Long, Long)]) {
        case ((s, e, n) :: rest, p) if p <= e + 1 => (s, math.max(e, p + W - 1), n + 1) :: rest
        case (acc, p)                             => (p, p + W - 1, 1L) :: acc
      }
      spans.map { case (s, e, n) => (id, s, e, n) }
    }.toSet
    val out = SubstringDedup.duplicatedSpans(docs.toDF("doc_id", "text"),
      col("text"), col("doc_id"), W)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out === expected)
  }
}
