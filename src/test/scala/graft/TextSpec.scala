package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

class TextSpec extends SparkSpecBase {
  import spark.implicits._

  test("tokenCount and bpeTokenCount") {
    val df = Seq("  hello world  ", "don't stop-me now").toDF("t")
    val out = df.select(
      TextAnalysis.tokenCount(col("t")),
      TextAnalysis.bpeTokenCount(col("t"))
    ).as[(Int, Int)].collect()
    assert(out(0) === ((2, 2)))
    assert(out(1) === ((3, 7))) // don ' t stop - me now
  }

  test("langId picks the language with most stopword hits") {
    val df = Seq(
      "the cat and the dog in a house",
      "der hund und die katze ist von hier",
      "le chat et la maison est de paris",
      "xyzzy qwerty asdf"
    ).toDF("t")
    val out = df.select(TextAnalysis.langId(col("t"))).as[String].collect().toSeq
    assert(out === Seq("en", "de", "fr", "unknown"))
  }

  test("fingerprint is whitespace/case-insensitive") {
    val df = Seq(("A  b\tC", "a b c"), ("x", "y")).toDF("s1", "s2")
    val out = df.select(
      TextAnalysis.fingerprint(col("s1")) === TextAnalysis.fingerprint(col("s2"))
    ).as[Boolean].collect().toSeq
    assert(out === Seq(true, false))
  }

  test("vocabHits counts stopword occurrences") {
    val df = Seq("the the a of x").toDF("t")
    val out = df.select(
      TextAnalysis.vocabHits(TextAnalysis.tokenize(col("t")), TextAnalysis.enStopwords)
    ).as[Int].head()
    assert(out === 4)
  }
}
