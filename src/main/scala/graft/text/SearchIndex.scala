package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    * the one bucket-layout shuffle, paid once). The table is
    * additionally PARTITIONED on `drop_id` (the build rides as drop
    * "base"): each ingested drop owns one partition directory, which
    * is what makes [[append]] idempotent — bucketing on the token
    * fingerprints is orthogonal (each partition directory holds one
    * file per bucket; scans still arrive bucket-clustered). */
  def create(corpus: DataFrame, text: Column, id: Column, table: String,
      nBuckets: Int): Unit =
    // generation-versioned behind a stable view (LiveTable): probes
    // resolve `table` as usual; compaction and re-creates stage the
    // next generation and commit with one atomic view swap
    graft.sources.LiveTable.createGeneration(corpus.sparkSession, table) { phys =>
      Search.postings(corpus, text, id).withColumn("drop_id", lit("base"))
        .write.partitionBy("drop_id")
        .bucketBy(nBuckets, "t1", "t2").sortBy("t1", "t2")
        .mode(org.apache.spark.sql.SaveMode.Overwrite)
        .saveAsTable(phys)
    }

  /** Append a new drop's postings into the existing layout,
    * IDEMPOTENT per drop id: a dynamic partition overwrite on
    * `drop_id` (the [[graft.sketch.StatsLedger]] discipline) — a
    * crash-retried or replayed ingestion rewrites exactly its own
    * partition instead of double-inserting its postings, which would
    * silently double [[probe]]'s occurrence counts. The bucket spec
    * comes from the table's catalog metadata. */
  def append(docs: DataFrame, text: Column, id: Column, table: String,
      dropId: String): Unit = {
    require(dropId.nonEmpty && dropId != "base",
      "append needs a per-drop id ('base' names the create-time corpus)")
    graft.sources.LiveTable.insertPartitionOverwriteLive(
      Search.postings(docs, text, id).withColumn("drop_id", lit(dropId)), table, dropId)
  }

  /** Consolidate the postings table's append history to ONE
    * `drop_id=base` partition (one file per bucket again) — probes are
    * bit-equal before/after, spec-pinned. Claim-guarded and
    * crash-healable ([[graft.sources.TableCompact]]); consumes the
    * append history (don't replay pre-compaction drop ids after —
    * the age-gate discipline of the other compact passes). */
  def compact(spark: SparkSession, table: String,
      newBuckets: Option[Int] = None): graft.sources.TableCompact.CompactStats =
    graft.sources.TableCompact.compact(spark, table, Seq("t1", "t2"), Seq("t1", "t2"),
      newBuckets = newBuckets)

  /** Consolidate the BM25 index: the tf table to one base partition,
    * then the stats ledger to ONE summed (n, tl) row. Order matters
    * for [[bm25Probe]]'s torn check (tfDrops ⊆ statDrops): after the
    * tf compact, {base} is a subset of any stats partition set, and
    * the ledger's SUM is unchanged until its own compact lands — a
    * crash between the two passes leaves a correct, probe-able index
    * either way. */
  def compactBm25(spark: SparkSession, table: String,
      newBuckets: Option[Int] = None):
      (graft.sources.TableCompact.CompactStats, graft.sources.TableCompact.CompactStats) = {
    val tf = graft.sources.TableCompact.compact(spark, table, Seq("t"), Seq("t"),
      newBuckets = newBuckets)
    val st = graft.sources.TableCompact.compact(spark, s"${table}_stats", Nil, Nil,
      df => df.agg(sum("n").cast("long").as("n"), sum("tl").cast("long").as("tl")))
    (tf, st)
  }

  /** Exact phrase occurrences against the stored postings — the
    * corpus is neither re-tokenized nor shuffled. */
  def probe(spark: SparkSession, table: String, phrases: DataFrame,
      phraseText: Column, phraseId: Column): DataFrame =
    Search.occurrencesFromPostings(spark.table(table), phrases, phraseText, phraseId)

  private def tfOf(docs: DataFrame, text: Column, id: Column): DataFrame = {
    val toks = bm25Toks(docs, text, id)
    toks
      .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
        explode(col("tk")).as("t"))
      .groupBy("t", "doc_id").agg(count(lit(1)).as("tf"), min("dl").as("dl"))
  }

  private def bm25Toks(docs: DataFrame, text: Column, id: Column): DataFrame =
    docs.select(id.as("doc_id"), TextAnalysis.tokenize(lower(text)).as("tk"))

  private def statsDelta(docs: DataFrame, text: Column, id: Column): DataFrame =
    bm25Toks(docs, text, id).agg(count(lit(1)).cast("long").as("n"),
      coalesce(sum(size(col("tk"))).cast("long"), lit(0L)).as("tl"))

  /** Build the BM25 statistics index: the (t, doc_id, tf, dl) term-
    * frequency relation bucketed on the term (ONE tokenize+explode +
    * one bucket-layout shuffle, paid once) plus the per-drop (n, tl)
    * corpus-stats LEDGER. Both tables are partitioned on `drop_id`:
    * each drop's term rows live in their own partition of the tf
    * table, and its (n, tl) contribution is one row of the stats
    * ledger — [[bm25Probe]] sums the ledger (drop-count-sized), so no
    * append ever reads-modifies-writes global state. After this,
    * ranking never re-tokenizes the corpus: a probe reads only the
    * query terms' buckets. */
  def createBm25(corpus: DataFrame, text: Column, id: Column, table: String,
      nBuckets: Int): Unit = {
    val spark = corpus.sparkSession
    graft.sources.LiveTable.createGeneration(spark, table) { phys =>
      tfOf(corpus, text, id).withColumn("drop_id", lit("base"))
        .write.partitionBy("drop_id")
        .bucketBy(nBuckets, "t").sortBy("t")
        .mode(org.apache.spark.sql.SaveMode.Overwrite)
        .saveAsTable(phys)
    }
    graft.sources.LiveTable.createGeneration(spark, s"${table}_stats") { phys =>
      statsDelta(corpus, text, id).withColumn("drop_id", lit("base"))
        .write.partitionBy("drop_id")
        .mode(org.apache.spark.sql.SaveMode.Overwrite)
        .saveAsTable(phys)
    }
  }

  // test seam: a simulated crash BETWEEN the tf-partition write and
  // the stats-ledger write (SearchIndexSpec's torn-commit test drives
  // it; production never sets it)
  private[graft] var failBetweenBm25Writes: Boolean = false

  /** Append a drop's term frequencies + its (n, tl) stats-ledger row,
    * IDEMPOTENT per drop id: both writes are dynamic partition
    * overwrites on `drop_id`, so a crash-retried or replayed ingestion
    * rewrites exactly its own partitions — never double-appends tf
    * rows, never double-counts the corpus stats. Ingest cost is
    * proportional to the DROP.
    *
    * The two writes are still two commits; the tf partition lands
    * first, so the only torn state a crash can leave is "tf rows
    * present, ledger row missing" — which [[bm25Probe]] detects and
    * refuses LOUDLY (partition-set check) instead of silently
    * mis-ranking with a stale n/tl, and which replaying this call
    * heals completely. */
  def appendBm25(docs: DataFrame, text: Column, id: Column, table: String,
      dropId: String): Unit = {
    require(dropId.nonEmpty && dropId != "base",
      "appendBm25 needs a per-drop id ('base' names the create-time corpus)")
    graft.sources.LiveTable.insertPartitionOverwriteLive(
      tfOf(docs, text, id).withColumn("drop_id", lit(dropId)), table, dropId)
    if (failBetweenBm25Writes)
      sys.error("simulated crash between bm25 tf and stats writes")
    graft.sources.LiveTable.insertPartitionOverwriteLive(
      statsDelta(docs, text, id).withColumn("drop_id", lit(dropId)),
      s"${table}_stats", dropId)
  }

  /** BM25 top-k against the stored index: the term filter prunes to
    * the query vocabulary's buckets, df derives from the surviving
    * sliver (exactly the corpus df — a term's df only counts docs
    * containing it), the (n, tl) corpus stats are the SUM of the
    * drop-count-sized stats ledger (integer-exact, so bit-equal to a
    * fresh whole-corpus build), and the scoring tail is the SAME code
    * as [[Search.bm25Rank]], so probe results are bit-identical to the
    * scan path by construction (spec-pinned).
    *
    * Refuses loudly when the index is TORN — a tf partition whose drop
    * never landed its stats-ledger row (a crash between
    * [[appendBm25]]'s two writes): ranking would silently use a stale
    * n/tl against the new rows. Replaying the drop's append heals it.
    * The check is metadata-only (two partition listings). A stats row
    * WITHOUT tf rows is legitimate (a drop whose docs tokenized
    * empty). */
  def bm25Probe(spark: SparkSession, table: String, terms: Seq[String],
      topK: Int): DataFrame = {
    require(terms.nonEmpty && topK >= 1)
    // partition listings need the PHYSICAL generation tables (views
    // reject SHOW PARTITIONS); the data reads below go through the view
    val tfPhys = graft.sources.LiveTable.resolve(spark, table)
    val statsPhys = graft.sources.LiveTable.resolve(spark, s"${table}_stats")
    val tfDrops = spark.sql(s"SHOW PARTITIONS $tfPhys")
      .collect().map(_.getString(0)).toSet
    val statDrops = spark.sql(s"SHOW PARTITIONS $statsPhys")
      .collect().map(_.getString(0)).toSet
    require(tfDrops.subsetOf(statDrops),
      s"bm25 index $table is torn: tf partitions ${tfDrops.diff(statDrops).mkString(", ")} " +
        "have no stats-ledger row (a crash between appendBm25's writes) — " +
        "replay appendBm25 for those drops before probing")
    val tf = spark.table(table).filter(col("t").isInCollection(terms))
    val stats = spark.table(s"${table}_stats")
      .agg(sum("n").cast("long").as("n"), sum("tl").cast("long").as("tl"))
    Search.bm25Score(tf, broadcast(stats), topK)
  }
}
