package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C4-style sentence-span deduplication (Raffel et al., "Exploring the
  * Limits of Transfer Learning…", arXiv:1910.10683 §2.2: "we discarded
  * all but one of any three-sentence span occurring more than once in
  * the data set").
  *
  * The unit is the SENTENCE, not a fixed token stride — that is the
  * whole point vs [[SubstringDedup]]: C4's spans are aligned to
  * linguistic boundaries, so a boilerplate paragraph is caught once
  * as the same three sentences everywhere it appears, instead of as
  * w different phase-shifted token windows.
  *
  * Segmentation (engine-portable, no NLP dependency): a sentence ends
  * at a token whose last character is `.`/`!`/`?`; punctuation-less
  * runs longer than `maxSentTokens` are subdivided every
  * `maxSentTokens` tokens — the standard fallback for OCR/ASR text
  * with no terminals (otherwise such documents would form one
  * unbounded "sentence" and silently opt out of the dedup).
  *
  * Scale shape: the token stream exchanges ONCE on doc_id and every
  * per-document step (terminal-count running sum, subdivision,
  * sentence aggregation, sentence indexing, 3-sentence lead) rides
  * that one partitioning — sentence and span keys all start with
  * doc_id, so Catalyst inserts sorts, not shuffles. Spans then
  * project to (doc_id, sent_idx, 60-bit portable fingerprint) before
  * the corpus-wide duplicate exchange — span TEXT never shuffles.
  * The duplicated-span set is unbounded (like [[SubstringDedup]]'s),
  * so duplicate detection is a window over the uniform fingerprint,
  * never a broadcast.
  */
object SentenceDedup {

  val SpanSentences = 3 // the C4 constant

  /** (doc_id, si, stext, s_start, s_end): ordered sentence table —
    * si is the 0-based sentence index, s_start/s_end the 0-based
    * inclusive token positions. */
  private[graft] def sentences(df: DataFrame, text: Column, id: Column,
      maxSentTokens: Int): DataFrame = {
    require(maxSentTokens >= 1)
    val tok = df.select(id.as("doc_id"),
        posexplode(split(trim(text), "\\s+")).as(Seq("tp", "tok")))
      .withColumn("tp", col("tp").cast("long"))
    val byDoc = Window.partitionBy("doc_id").orderBy("tp")
    // terminals strictly BEFORE the token: a terminal token closes its
    // own sentence, the next token opens the next one
    val seg = tok.withColumn("s1",
      coalesce(sum(when(col("tok").rlike("[.!?]$"), 1L).otherwise(0L))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val seg2 = seg
      .withColumn("__mn", min(col("tp")).over(Window.partitionBy("doc_id", "s1")))
      .withColumn("sub", expr(s"(tp - __mn) div $maxSentTokens"))
    val sent = seg2.groupBy(col("doc_id"), col("s1"), col("sub"))
      .agg(
        array_join(transform(sort_array(collect_list(struct(col("tp"), col("tok")))),
          s => s.getField("tok")), " ").as("stext"),
        min(col("tp")).as("s_start"),
        max(col("tp")).as("s_end"))
    sent
      .withColumn("si",
        (row_number().over(Window.partitionBy("doc_id").orderBy(col("s1"), col("sub"))) - 1)
          .cast("long"))
      .drop("s1", "sub")
  }

  /** (doc_id, si, span_start, span_end, h): every 3-sentence span with
    * its 60-bit portable fingerprint (same md5-prefix family as the
    * winnow fingerprints — the DuckDB oracle replays it exactly). */
  private def spans(sent: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("si")
    sent
      .withColumn("__t1", lead(col("stext"), 1).over(byDoc))
      .withColumn("__t2", lead(col("stext"), 2).over(byDoc))
      .withColumn("__e2", lead(col("s_end"), 2).over(byDoc))
      .filter(col("__t2").isNotNull)
      .select(col("doc_id"), col("si"), col("s_start").as("span_start"),
        col("__e2").as("span_end"),
        conv(substring(md5(concat_ws(" ", col("stext"), col("__t1"), col("__t2"))), 1, 15),
          16, 10).cast("long").as("h"))
  }

  /** Report every occurrence of a duplicated 3-sentence span:
    * (doc_id, sent_idx, span_start, span_end, n_occ). */
  def duplicatedSentenceSpans(df: DataFrame, text: Column, id: Column,
      maxSentTokens: Int): DataFrame = {
    val sp = spans(sentences(df, text, id, maxSentTokens))
    val withN = sp.withColumn("n_occ", count(lit(1)).over(Window.partitionBy("h")))
    withN.filter(col("n_occ") >= 2)
      .select(col("doc_id"), col("si").as("sent_idx"),
        col("span_start"), col("span_end"), col("n_occ"))
  }

  /** C4's policy: keep the first occurrence (min (doc_id, si) — the
    * deterministic canonical) of each duplicated 3-sentence span and
    * delete the sentences of every other occurrence, then rebuild:
    * (doc_id, clean_text, n_sentences_kept). Documents with fewer
    * than 3 sentences carry no span and pass untouched; a document
    * whose every sentence sat in non-canonical duplicated spans
    * disappears. */
  def scrubDuplicatedSentenceSpans(df: DataFrame, text: Column, id: Column,
      maxSentTokens: Int): DataFrame = {
    val sent = sentences(df, text, id, maxSentTokens)
    val sp = spans(sent)
    val byH = Window.partitionBy("h")
    val ranked = sp
      .withColumn("__c", count(lit(1)).over(byH))
      .withColumn("__rn", row_number().over(byH.orderBy(col("doc_id"), col("si"))))
    val covered = ranked.filter(col("__c") >= 2 && col("__rn") >= 2)
      .select(col("doc_id"),
        explode(sequence(col("si"), col("si") + (SpanSentences - 1))).as("si"))
      .distinct()
    sent.join(covered, Seq("doc_id", "si"), "left_anti")
      .groupBy("doc_id")
      .agg(
        array_join(transform(sort_array(collect_list(struct(col("si"), col("stext")))),
          s => s.getField("stext")), " ").as("clean_text"),
        count(lit(1)).as("n_sentences_kept"))
  }
}
