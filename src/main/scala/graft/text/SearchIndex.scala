package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Warehouse

/** Persisted positional-postings search index — the build-once /
  * probe-per-drop shape for exact phrase search, completing the
  * build-once family (MinHash band index 24e4, IVF index 29f, the
  * Bloom/KMV/stats ledgers) on the SEARCH side.
  *
  * [[Search.phraseOccurrences]] re-pays the corpus tokenize+explode
  * on every probe — the dominant cost, since the phrase set is tiny.
  * Here the postings relation (doc_id, pos, t1, t2) is written ONCE
  * as a warehouse table bucketed + bucket-sorted on the token
  * fingerprint, and every probe is [[Search.occurrencesFromPostings]]
  * over that scan: the phrase vocabulary broadcasts into a semi-join
  * against the pre-bucketed postings — the corpus-sized relation is
  * never tokenized again and never shuffles (the surviving sliver is
  * phrase-vocabulary-sized). Appends write a new drop's postings into
  * the same bucket layout — ingest cost proportional to the drop;
  * Spark refuses a mismatched bucket spec, so a wrong `nBuckets`
  * fails loudly rather than corrupting the layout.
  *
  * Probe results are bit-identical to [[Search.phraseOccurrences]]
  * by shared code path (spec-pinned in SearchIndexSpec).
  */
object SearchIndex {

  /** Build the postings table from scratch (one tokenize+explode +
    * the one bucket-layout shuffle, paid once). */
  def create(corpus: DataFrame, text: Column, id: Column, table: String,
      nBuckets: Int): Unit =
    Warehouse.writeBucketed(Search.postings(corpus, text, id), table,
      Seq("t1", "t2"), nBuckets)

  /** Append a new drop's postings into the existing layout. */
  def append(docs: DataFrame, text: Column, id: Column, table: String,
      nBuckets: Int): Unit =
    Search.postings(docs, text, id)
      .write.bucketBy(nBuckets, "t1", "t2").sortBy("t1", "t2")
      .mode(org.apache.spark.sql.SaveMode.Append)
      .saveAsTable(table)

  /** Exact phrase occurrences against the stored postings — the
    * corpus is neither re-tokenized nor shuffled. */
  def probe(spark: SparkSession, table: String, phrases: DataFrame,
      phraseText: Column, phraseId: Column): DataFrame =
    Search.occurrencesFromPostings(spark.table(table), phrases, phraseText, phraseId)
}
