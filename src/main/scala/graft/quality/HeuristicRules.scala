package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The published heuristic quality-rule batteries every production
  * pretraining pipeline runs before the trained gates — Gopher's
  * document rules (Rae et al. 2021, arXiv:2112.11446 appendix A) and
  * C4's line rules (Raffel et al. 2019, arXiv:1910.10683 §2.2) — as
  * scan-time, ZERO-shuffle operators: every metric and verdict is
  * computed inside the row with higher-order array expressions, so a
  * 100 TB screen is one codegen'd pass over the corpus with nothing
  * exchanged (the [[graft.Corpus]] stages are pure scan filters).
  *
  * All decisions are integer / cross-multiplied (no division), so the
  * DuckDB oracles replay every verdict bit-for-bit. Ratio thresholds
  * are documented next to each flag in the exact rational form used.
  */
object HeuristicRules {

  private def toks(text: Column): Column = split(trim(text), "\\s+")
  private def nWords(text: Column): Column = size(toks(text)).cast("bigint")
  private def nCharsTok(text: Column): Column =
    aggregate(transform(toks(text), t => length(t).cast("bigint")), lit(0L), (a, x) => a + x)
  private def stopHits(text: Column): Column =
    size(filter(transform(toks(text), t => lower(t)),
      t => t.isInCollection(graft.text.TextAnalysis.enStopwords))).cast("bigint")
  private def alphaWords(text: Column): Column =
    size(filter(toks(text), t => t.rlike("[A-Za-z]"))).cast("bigint")

  /** Most frequent word 2-gram of the doc as struct(c, g) — count
    * ties keep the lexicographically smallest gram (sorted-distinct
    * fold with a strict `>`). In-row O(g²) over the native codegen
    * shingle array; docs under 2 tokens yield (0, ""). */
  private def top2Best(text: Column): Column = {
    val g = graft.dedup.Dedup.shinglesRaw(text, 2)
    aggregate(
      array_sort(array_distinct(g)),
      struct(lit(0L).as("c"), lit("").as("g")),
      (acc, x) => {
        val cnt = size(filter(g, y => y === x)).cast("bigint")
        when(cnt > acc.getField("c"), struct(cnt.as("c"), x.as("g"))).otherwise(acc)
      })
  }

  /** The five Gopher verdicts as one boolean scan predicate — the
    * [[graft.Corpus.gopherQualityFilter]] stage filters on this
    * directly (no join, no shuffle). Rules, in exact integer form:
    * minWords ≤ n ≤ maxWords; 3n ≤ chars ≤ 10n (mean token length in
    * [3,10]); ≥ 2 stopword hits; 10·alpha ≥ 8n (≥80% words carry a
    * letter); 5·top2cnt·len(top2gram) ≤ chars + n − 1 (the most
    * frequent 2-gram covers ≤20% of the characters incl. joining
    * spaces). */
  def gopherPass(text: Column, minWords: Int = 50, maxWords: Int = 100000): Column = {
    val n = nWords(text); val c = nCharsTok(text); val best = top2Best(text)
    n >= minWords && n <= maxWords &&
      lit(3L) * n <= c && c <= lit(10L) * n &&
      stopHits(text) >= 2 &&
      lit(10L) * alphaWords(text) >= lit(8L) * n &&
      lit(5L) * best.getField("c") * length(best.getField("g")).cast("bigint") <= c + n - 1
  }

  /** Per-document Gopher report (one row per doc): the raw metrics,
    * every per-rule verdict, and the conjunction — the audit form of
    * [[gopherPass]] (the q_gopher_rules oracle gate replays it all). */
  def gopherRules(df: DataFrame, text: Column, id: Column,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame =
    df.select(
        id.as("doc_id"),
        nWords(text).as("n_words"),
        nCharsTok(text).as("n_chars_tok"),
        stopHits(text).as("stop_hits"),
        alphaWords(text).as("alpha_words"),
        top2Best(text).as("__best"))
      .select(col("doc_id"), col("n_words"), col("n_chars_tok"), col("stop_hits"),
        col("alpha_words"),
        col("__best.c").as("top2_count"), col("__best.g").as("top2_gram"))
      .withColumn("pass_word_count",
        (col("n_words") >= minWords && col("n_words") <= maxWords).cast("int"))
      .withColumn("pass_mean_len",
        (lit(3L) * col("n_words") <= col("n_chars_tok") &&
          col("n_chars_tok") <= lit(10L) * col("n_words")).cast("int"))
      .withColumn("pass_stop", (col("stop_hits") >= 2).cast("int"))
      .withColumn("pass_alpha",
        (lit(10L) * col("alpha_words") >= lit(8L) * col("n_words")).cast("int"))
      .withColumn("pass_dup2",
        (lit(5L) * col("top2_count") * length(col("top2_gram")).cast("bigint")
          <= col("n_chars_tok") + col("n_words") - 1).cast("int"))
      .withColumn("pass",
        (col("pass_word_count") === 1 && col("pass_mean_len") === 1 &&
          col("pass_stop") === 1 && col("pass_alpha") === 1 &&
          col("pass_dup2") === 1).cast("int"))

  /** C4 line keeper: ends in terminal punctuation (`.`/`!`/`?`/`"`
    * after right-trim) AND carries ≥ 3 whitespace words. */
  private def keptLines(text: Column): Column =
    filter(split(text, "\n"),
      l => rtrim(l).rlike("[.!?\"]$") && size(split(trim(l), "\\s+")) >= 3)

  /** Terminal-mark count of a string (the C4 "sentence" proxy). */
  private def sentenceCount(s: Column): Column =
    (length(s) - length(regexp_replace(s, "[.!?]", ""))).cast("bigint")

  /** The C4 page text after line filtering (kept lines re-joined). */
  def c4CleanText(text: Column): Column = array_join(keptLines(text), "\n")

  /** The C4 page verdict over the CLEANED text: ≥ 5 sentences, no
    * "lorem ipsum", no `{`. Scan predicate, zero shuffles. */
  def c4Pass(text: Column): Column =
    sentenceCount(c4CleanText(text)) >= 5 &&
      !contains(lower(text), lit("lorem ipsum")) &&
      !contains(text, lit("{"))

  /** Per-document C4 line-rule report: (doc_id, n_lines,
    * n_kept_lines, n_sentences, has_lorem, has_brace, clean_text,
    * pass) — the audit form; the filter form is
    * [[graft.Corpus.c4LineFilter]] (rewrite text to [[c4CleanText]],
    * keep [[c4Pass]] docs). */
  def c4LineRules(df: DataFrame, text: Column, id: Column): DataFrame =
    df.select(
        id.as("doc_id"),
        size(split(text, "\n")).cast("bigint").as("n_lines"),
        size(keptLines(text)).cast("bigint").as("n_kept_lines"),
        c4CleanText(text).as("clean_text"),
        contains(lower(text), lit("lorem ipsum")).cast("int").as("has_lorem"),
        contains(text, lit("{")).cast("int").as("has_brace"))
      .withColumn("n_sentences", sentenceCount(col("clean_text")))
      .withColumn("pass",
        (col("n_sentences") >= 5 && col("has_lorem") === 0 && col("has_brace") === 0)
          .cast("int"))
      .select(col("doc_id"), col("n_lines"), col("n_kept_lines"), col("n_sentences"),
        col("has_lorem"), col("has_brace"), col("clean_text"), col("pass"))
}
