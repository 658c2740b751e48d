package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact phrase search over a document corpus — "which documents
  * contain these phrases, and how often" (attribution, targeted
  * decontamination, grep-at-scale). Posting-list design:
  *
  *  1. the phrase set (assumed small — it is the QUERY) broadcasts as
  *     (phrase, k, token-fingerprint) rows;
  *  2. the corpus explodes once into positional postings
  *     (doc, pos, fp), immediately semi-joined against the broadcast
  *     phrase-token set — only positions of phrase vocabulary survive
  *     (for typical phrase sets that is a sliver of the corpus, and
  *     the parquet scan itself stays one pass);
  *  3. every posting matching a phrase's FIRST token opens a
  *     candidate (phrase, doc, start); each candidate must then hit a
  *     posting at (doc, start+k) for every k of the phrase — one
  *     equi-join between two phrase-vocabulary-sized frames;
  *  4. candidates with |phrase| hits are occurrences (overlapping
  *     occurrences all count: starts, not covered spans).
  *
  * Tokens travel as 128-bit two-lane xxhash fingerprints (the r8
  * shuffle-width discipline) — token TEXT never reaches an exchange;
  * a fingerprint collision would need both 64-bit lanes to collide on
  * the same (doc, pos).
  *
  * Tokenization matches the engine convention: lowercase,
  * whitespace-split — a phrase matches iff its token sequence appears
  * verbatim in the document's token sequence.
  */
object Search {

  private def fp(tok: Column): Seq[Column] =
    Seq(xxhash64(tok).as("t1"), xxhash64(lit(7L), tok).as("t2"))

  /** The corpus's positional-postings relation (doc_id, pos, t1, t2)
    * — the tokenize+explode pass every probe otherwise re-pays, and
    * exactly what [[SearchIndex]] persists bucketed. */
  private[text] def postings(docs: DataFrame, text: Column, id: Column): DataFrame =
    docs.select(id.as("doc_id"),
        posexplode(TextAnalysis.tokenize(lower(text))).as(Seq("pos", "__tok")))
      .select(col("doc_id") +: col("pos") +: fp(col("__tok")): _*)

  /** One row per (phrase, doc) with the number of (possibly
    * overlapping) occurrences. Phrases with no match emit nothing. */
  def phraseOccurrences(docs: DataFrame, text: Column, id: Column,
      phrases: DataFrame, phraseText: Column, phraseId: Column): DataFrame =
    occurrencesFromPostings(postings(docs, text, id), phrases, phraseText, phraseId)

  /** The probe core over ANY postings relation — fresh (computed by
    * [[phraseOccurrences]]) or persisted ([[SearchIndex.probe]]);
    * identical results by shared code path. */
  private[text] def occurrencesFromPostings(posts: DataFrame,
      phrases: DataFrame, phraseText: Column, phraseId: Column): DataFrame = {
    val phToks = split(trim(lower(phraseText)), "\\s+")
    val ph = phrases
      .select(phraseId.as("phrase"), posexplode(phToks).as(Seq("k", "__tok")))
      .select(col("phrase") +: col("k") +: fp(col("__tok")): _*)
    val plen = phrases.select(phraseId.as("phrase"), size(phToks).as("plen"))

    // positional postings restricted to phrase vocabulary; consumed
    // twice (candidate open + verify), so materialized once
    val toks = graft.operators.Checkpoints.eager(
      posts.join(broadcast(ph.select("t1", "t2").distinct()), Seq("t1", "t2"), "left_semi"))

    val starts = toks
      .join(broadcast(ph.filter(col("k") === 0).drop("k")), Seq("t1", "t2"))
      .select(col("phrase"), col("doc_id"), col("pos").as("start"))
    val checks = starts.join(broadcast(ph), Seq("phrase"))
      .select(col("phrase"), col("doc_id"), col("start"),
        (col("start") + col("k")).as("pos"), col("t1"), col("t2"))
    checks.join(toks, Seq("doc_id", "pos", "t1", "t2"))
      .groupBy("phrase", "doc_id", "start").agg(count(lit(1)).as("__hits"))
      .join(broadcast(plen), Seq("phrase"))
      .filter(col("__hits") === col("plen"))
      .groupBy("phrase", "doc_id").agg(count(lit(1)).as("n_occurrences"))
  }

  /** The corpus's most frequent word n-grams — a deterministic
    * self-contained phrase set for gates and smoke tests (count ties
    * break to the lexicographically smallest gram). */
  def topPhrases(docs: DataFrame, text: Column, n: Int, k: Int): DataFrame =
    docs.select(explode(graft.dedup.Dedup.shinglesRaw(text, n)).as("phrase"))
      .groupBy("phrase").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("phrase").asc).limit(k)
      .select("phrase")
}
