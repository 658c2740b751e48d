package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

/** Hand-computable fixtures for the trained BPE tokenizer: the merge
  * loop's argmax/tie/exhaustion behavior, the fold-application
  * semantics the oracle's simultaneous replay must equal, the OOV
  * character fallback, and the word-type cap. */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  private def types(docs: Seq[String]) =
    Bpe.wordTypes(docs.toDF("text"), col("text"), maxTypes = 1 << 20)

  test("trainMerges learns pair-frequency argmax merges in order and stops when exhausted") {
    // word counts: ab×4, cd×3 → round 1 pair (a,b):4 beats (c,d):3;
    // round 2 merges (c,d); round 3 has no 2-symbol word left → stop
    val t = types(Seq("ab ab ab cd", "ab cd cd"))
    assert(Bpe.trainMerges(t, 5) === Seq(("a", "b"), ("c", "d")))
  }

  test("merges chain into multi-character subwords across rounds") {
    // xy×2 (once standalone, once inside xyz): round 1 (x,y):3
    // [2 from xy + 1 inside xyz]... counts: words xy:2, xyz:1 →
    // pairs r1: (x,y):3, (y,z):1 → merge xy; r2: (xy,z):1 → merge xyz
    val t = types(Seq("xy xyz", "xy"))
    val m = Bpe.trainMerges(t, 4)
    assert(m === Seq(("x", "y"), ("xy", "z")))
    val sym = Bpe.symbolize(t, m).select($"word", $"sym").as[(String, Seq[String])]
      .collect().toMap
    assert(sym("xy") === Seq("xy") && sym("xyz") === Seq("xyz"))
  }

  test("candidate pairs require distinct symbols: runs never merge") {
    // only pair in "aa"/"aaa" is (a,a) — excluded by the lft ≠ rgt
    // rule that makes the fold equal the oracle's simultaneous
    // replay, so training learns nothing and words stay characters
    val t = types(Seq("aa aaa aa"))
    assert(Bpe.trainMerges(t, 3) === Seq.empty)
  }

  test("fold application is greedy left-to-right and non-overlapping") {
    // merge (a,b) over abab → [ab, ab]; over bab → [b, ab]; a learned
    // symbol never re-combines within the same merge's application
    val out = spark.range(1).toDF()
      .select(
        Bpe.symbolsExpr("'abab'", Seq(("a", "b"))).as("s1"),
        Bpe.symbolsExpr("'bab'", Seq(("a", "b"))).as("s2"),
        Bpe.symbolsExpr("'abc'", Seq(("a", "b"), ("ab", "c"))).as("s3"))
      .as[(Seq[String], Seq[String], Seq[String])].head()
    assert(out._1 === Seq("ab", "ab"))
    assert(out._2 === Seq("b", "ab"))
    assert(out._3 === Seq("abc"))
  }

  test("tokenCounts joins the vocabulary and falls back to characters for OOV words") {
    val train = types(Seq("ab ab ab cd", "ab cd cd"))
    val merges = Bpe.trainMerges(train, 5)
    val vocab = Bpe.symbolize(train, merges)
    // "ab cd" → 2 words, 2 tokens; "ab zzz" → zzz is OOV → 3 char
    // tokens + 1 vocab token
    val docs = Seq((1L, "ab cd"), (2L, "ab zzz")).toDF("doc_id", "text")
    val rows = Bpe.tokenCounts(docs, col("text"), Seq(col("doc_id")), vocab)
      .select($"doc_id", $"n_words", $"n_tokens").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows(1L) === ((2L, 2L)))
    assert(rows(2L) === ((2L, 4L)))
  }

  test("the word-type cap keeps the heaviest types deterministically") {
    val t = Bpe.wordTypes(Seq("ab ab ab cd cd ef").toDF("text"), col("text"), maxTypes = 2)
    val kept = t.select($"word", $"cnt").as[(String, Long)].collect().toSet
    assert(kept === Set(("ab", 3L), ("cd", 2L)))
  }
}
