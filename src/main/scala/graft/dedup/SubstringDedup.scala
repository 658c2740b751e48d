package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring deduplication (Lee et al., "Deduplicating Training
  * Data Makes Language Models Better", arXiv:2107.06499): find token
  * spans that occur verbatim more than once ANYWHERE in the corpus —
  * across documents or repeated within one — and either report them
  * ([[duplicatedSpans]]) or delete every occurrence after the first
  * ([[scrubDuplicatedSpans]]).
  *
  * Distinct from the other dedup family members: `removeFrequentGrams`
  * scrubs CORPUS-FREQUENT grams (boilerplate, doc-freq ≥ threshold —
  * a small broadcastable set); this catches a span duplicated exactly
  * twice, the long-tail case the paper shows dominates memorization.
  * `MinHashDedup`/`simhash` flag whole near-dup DOCUMENTS; this finds
  * the duplicated RANGES inside otherwise-distinct documents.
  *
  * The paper builds a corpus suffix array; the standard distributed
  * substitute (used by the public Spark/BigQuery reimplementations) is
  * a rolling window of `windowTokens` tokens: any duplicated
  * substring of ≥ windowTokens tokens is a run of duplicated windows,
  * so merging overlapping/adjacent duplicated windows per document
  * recovers the maximal duplicated spans exactly (granularity
  * windowTokens at the edges).
  *
  * Scale shape: the window stream is one row per token position —
  * projected to (doc_id, pos, 128-bit fingerprint) before any
  * exchange, so the duplicate-detection shuffle carries ~24 B/row
  * (two xxhash64 lanes — digest-grade collision math at half the
  * bytes of an md5 hex string) no matter the
  * document size, the same fingerprint-width discipline as
  * `TableDiff`. The duplicated-hash set is NOT broadcast (unlike the
  * boilerplate gram set it is unbounded — at 100 TB it is most of the
  * corpus's repeated mass); the join stays a shuffle join on the
  * uniform md5 key, skew-free by construction. Span merge is one
  * window pass per document (range-partitioned by doc_id; window
  * buffers spill, and a document's dup windows are ≤ its token
  * count). The window stream feeds two consumers and is deliberately
  * recomputed, not persisted (§5 persistence discipline: a narrow
  * scan + codegen shingle pass; callers that loop should persist the
  * input themselves).
  */
object SubstringDedup {

  /** Maximal duplicated token spans per document:
    * (doc_id, span_start, span_end, n_windows) with 0-based inclusive
    * token positions. A span is any merge of overlapping-or-adjacent
    * `windowTokens`-grams each occurring ≥ `minCount` times in the
    * corpus (within-doc repeats count — a doc that repeats itself is
    * exactly the degenerate case the scrub must catch). */
  def duplicatedSpans(
      df: DataFrame,
      text: Column,
      id: Column,
      windowTokens: Int,
      minCount: Long = 2L
  ): DataFrame = {
    require(windowTokens >= 2 && minCount >= 2)
    val wins = windowHashes(df, text, id, windowTokens)
    val dup = wins.groupBy("h1", "h2").agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minCount).select("h1", "h2")
    val cov = wins.join(dup, Seq("h1", "h2")).select(col("doc_id"), col("p"))
    mergeSpans(cov, windowTokens)
  }

  /** Delete every occurrence of a duplicated window except the first
    * (Spark-order canonical: min (doc_id, pos) per window hash — the
    * paper's "keep one copy" policy) and rebuild the documents:
    * (doc_id, clean_text, n_kept). A document whose every token sat
    * in non-canonical duplicated spans disappears; documents shorter
    * than `windowTokens` pass through untouched. */
  def scrubDuplicatedSpans(
      df: DataFrame,
      text: Column,
      id: Column,
      windowTokens: Int,
      minCount: Long = 2L
  ): DataFrame = {
    require(windowTokens >= 2 && minCount >= 2)
    val wins = windowHashes(df, text, id, windowTokens)
    // one exchange on the fingerprint serves both the occurrence
    // count and the canonical rank (same partitioning, two Window nodes)
    val byH = Window.partitionBy("h1", "h2")
    val ranked = wins
      .withColumn("__c", count(lit(1)).over(byH))
      .withColumn("__rn", row_number().over(byH.orderBy(col("doc_id"), col("p"))))
    val covered = ranked.filter(col("__c") >= minCount && col("__rn") >= 2)
      .select(col("doc_id"),
        explode(sequence(col("p"), col("p") + (windowTokens - 1))).as("tp"))
      .distinct()
    val tokPos = df.select(id.as("doc_id"),
      posexplode(Dedup.tokens(text)).as(Seq("tp", "tok")))
      .withColumn("tp", col("tp").cast("long"))
    tokPos.join(covered, Seq("doc_id", "tp"), "left_anti")
      .groupBy("doc_id")
      .agg(
        array_join(transform(sort_array(collect_list(struct(col("tp"), col("tok")))),
          s => s.getField("tok")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
  }

  /** (doc_id, p, h1, h2): 128-bit two-lane xxhash fingerprint of the
    * `windowTokens`-gram starting at 0-based token position p — the
    * fingerprint-width projection both entry points shuffle instead
    * of text. Two independent 64-bit lanes keep the collision math of
    * a 128-bit digest (a false duplicate needs BOTH lanes to collide,
    * ~(#windows)²·2⁻¹²⁹ — negligible at 10¹² corpus windows) at half
    * the shuffle bytes of the md5 hex string this used to carry. */
  private def windowHashes(df: DataFrame, text: Column, id: Column, w: Int): DataFrame =
    df.select(id.as("doc_id"), posexplode(Dedup.shinglesRaw(text, w)).as(Seq("p", "g")))
      .select(col("doc_id"), col("p").cast("long").as("p"),
        xxhash64(col("g")).as("h1"), xxhash64(lit(7L), col("g")).as("h2"))

  /** Merge overlapping-or-adjacent duplicated windows (cov: doc_id, p)
    * into maximal spans. Classic interval coalescing: a window starts
    * a new span iff its start exceeds the running max end (+1 for
    * adjacency) of everything before it; the running-sum of those
    * breaks is the span id, which partitioning by doc_id already
    * co-locates — the groupBy adds no exchange. */
  private def mergeSpans(cov: DataFrame, w: Int): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("p")
    val prev = byDoc.rowsBetween(Window.unboundedPreceding, -1)
    cov
      .withColumn("__brk",
        when(col("p") <= coalesce(max(col("p")).over(prev), lit(Long.MinValue / 2)) + w, 0)
          .otherwise(1))
      .withColumn("__gid", sum(col("__brk")).over(byDoc))
      .groupBy(col("doc_id"), col("__gid"))
      .agg(
        min(col("p")).as("span_start"),
        (max(col("p")) + (w - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .drop("__gid")
  }
}
