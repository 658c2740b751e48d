package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Per-source corpus datasheet — the "datasheets for datasets"
  * (Gebru et al. 2018, arXiv:1803.09010) summary every corpus release
  * ships: volume, language spread, heuristic-quality pass rates,
  * exact-duplicate mass and vocabulary size, one row per source.
  *
  * Scale shape: the corpus is scanned once per aggregate family and
  * every exchange is narrow — (source) keyed sums for the volume and
  * pass-rate block (all verdicts computed IN-ROW by the zero-shuffle
  * batteries of [[HeuristicRules]]), a (source, md5-fingerprint)
  * aggregate for duplicate mass, a (source, lang) distinct and a
  * (source, token) distinct for spread/vocabulary. No joins against
  * anything corpus-sized — the per-source frames the final join sees
  * are |sources| rows. All metrics are integral, so the DuckDB oracle
  * replays them exactly; rates are left to the reader (numerator and
  * denominator are both in the row).
  */
object Datasheet {

  /** One row per source: n_docs, n_tokens, n_chars, n_langs,
    * gopher_pass, c4_pass, rep_pass (documents passing each heuristic
    * battery), dup_docs (exact-duplicate occurrences beyond the first
    * of each distinct normalized text, WITHIN the source — the
    * cross-source story is `q_source_overlap`'s), vocab (distinct
    * lowercase whitespace tokens). */
  def perSource(df: DataFrame, text: Column, id: Column, source: Column,
      lang: Column, minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val docs = df.select(
      source.as("source"), lang.as("lang"),
      TextAnalysis.tokenCount(text).cast("bigint").as("__tok"),
      length(text).cast("bigint").as("__chr"),
      HeuristicRules.gopherPass(text, minWords, maxWords).cast("bigint").as("__pg"),
      HeuristicRules.c4Pass(text).cast("bigint").as("__pc"),
      HeuristicRules.repetitionPass(text).cast("bigint").as("__pr"),
      TextAnalysis.fingerprint(text).as("__fp"))

    val volume = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("__tok").as("n_tokens"),
      sum("__chr").as("n_chars"),
      sum("__pg").as("gopher_pass"),
      sum("__pc").as("c4_pass"),
      sum("__pr").as("rep_pass"))
    // separate narrow distinct instead of count(DISTINCT lang) inside
    // the volume aggregate: avoids the Expand double-scan plan
    val langs = docs.select("source", "lang").distinct()
      .groupBy("source").agg(count(lit(1)).as("n_langs"))
    val dups = docs.groupBy("source", "__fp").agg(count(lit(1)).as("__c"))
      .groupBy("source").agg(sum(col("__c") - 1).as("dup_docs"))
    val vocab = df
      .select(source.as("source"),
        explode(split(trim(lower(text)), "\\s+")).as("__t"))
      .distinct()
      .groupBy("source").agg(count(lit(1)).as("vocab"))

    volume.join(langs, Seq("source")).join(dups, Seq("source"))
      .join(vocab, Seq("source"))
  }
}
