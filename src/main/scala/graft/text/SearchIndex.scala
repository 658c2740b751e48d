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

  /** Build the BM25 statistics index: the (t, doc_id, tf, dl) term-
    * frequency relation bucketed on the term (ONE tokenize+explode +
    * one bucket-layout shuffle, paid once) plus the 1-row (n, tl)
    * corpus-stats table. After this, ranking never re-tokenizes the
    * corpus: a probe reads only the query terms' buckets. */
  def createBm25(corpus: DataFrame, text: Column, id: Column, table: String,
      nBuckets: Int): Unit = {
    val toks = corpus.select(id.as("doc_id"),
      TextAnalysis.tokenize(lower(text)).as("tk"))
    val tf = toks
      .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
        explode(col("tk")).as("t"))
      .groupBy("t", "doc_id").agg(count(lit(1)).as("tf"), min("dl").as("dl"))
    Warehouse.writeBucketed(tf, table, Seq("t"), nBuckets)
    toks.agg(count(lit(1)).cast("long").as("n"),
        sum(size(col("tk"))).cast("long").as("tl"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(s"${table}_stats")
  }

  /** Append a drop's term frequencies into the BM25 layout and fold
    * its (n, tl) delta into the stats row — ingest cost proportional
    * to the DROP; the merged stats are collected (2 single-row
    * frames) so the overwrite never reads the table it replaces. */
  def appendBm25(docs: DataFrame, text: Column, id: Column, table: String,
      nBuckets: Int): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(id.as("doc_id"),
      TextAnalysis.tokenize(lower(text)).as("tk"))
    toks
      .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
        explode(col("tk")).as("t"))
      .groupBy("t", "doc_id").agg(count(lit(1)).as("tf"), min("dl").as("dl"))
      .write.bucketBy(nBuckets, "t").sortBy("t")
      .mode(org.apache.spark.sql.SaveMode.Append)
      .saveAsTable(table)
    val delta = toks.agg(count(lit(1)).cast("long").as("n"),
      sum(size(col("tk"))).cast("long").as("tl")).as[(Long, Long)].head()
    val old = spark.table(s"${table}_stats").as[(Long, Long)].head()
    Seq((old._1 + delta._1, old._2 + delta._2)).toDF("n", "tl")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(s"${table}_stats")
  }

  /** BM25 top-k against the stored index: the term filter prunes to
    * the query vocabulary's buckets, df derives from the surviving
    * sliver (exactly the corpus df — a term's df only counts docs
    * containing it), and the scoring tail is the SAME code as
    * [[Search.bm25Rank]], so probe results are bit-identical to the
    * scan path by construction (spec-pinned). */
  def bm25Probe(spark: SparkSession, table: String, terms: Seq[String],
      topK: Int): DataFrame = {
    require(terms.nonEmpty && topK >= 1)
    val tf = spark.table(table).filter(col("t").isInCollection(terms))
    Search.bm25Score(tf, broadcast(spark.table(s"${table}_stats")), topK)
  }
}
