package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH band index — the build-once / probe-per-drop
  * form of [[Dedup.minhashNovel]].
  *
  * `minhashNovel` re-shingles and re-minhashes the WHOLE corpus on
  * every call; correct, but at 100 TB the corpus-side signature pass
  * dwarfs the actual screen of a daily crawl drop. The index
  * materializes the corpus's (band_id, band_key, doc_id) rows ONCE as
  * a bucketed, bucket-sorted warehouse table keyed on the band
  * columns, so every later probe:
  *
  *   - never touches corpus text again (the probe reads the index's
  *     band columns only — column pruning drops doc_id for the
  *     novelty screen),
  *   - never shuffles the corpus side again (bucket layout IS the
  *     join partitioning; only the drop-sized batch side exchanges,
  *     into the bucket count),
  *   - stays incremental: accepted novel docs [[append]] their bands
  *     into the same bucket layout — ingest cost proportional to the
  *     drop, not the corpus.
  *
  * The per-query saving vs `minhashNovel` is exactly the §2.2c
  * bucketed-join argument (one shuffle paid at ingest replaces one
  * corpus shuffle + full signature recompute per probe), applied to
  * the dedup pipeline's hottest recurring job.
  *
  * Band semantics are [[Dedup.minhashBandKeys]] verbatim (same
  * params object → same keys), so [[screenNovel]] is row-identical to
  * `minhashNovel` by construction — `MinhashIndexSpec` asserts it.
  */
object MinhashIndex {

  /** Banding parameters; must match between [[create]], [[append]],
    * and every probe against the same table (the band keys are a
    * function of them). */
  final case class Params(
      shingleN: Int = 3,
      numBands: Int = 4,
      rowsPerBand: Int = 2,
      portable: Boolean = false)

  private def bands(df: DataFrame, text: Column, id: Column, p: Params): DataFrame =
    Dedup.minhashBandKeys(df, text, id, p.shingleN, p.numBands, p.rowsPerBand, p.portable)
      .select(col("band_id"), col("band_key"), col("doc_id"))

  /** Build the index table from the current corpus. `nBuckets` sizes
    * the permanent layout (bucket ≈ one task's worth; both probe
    * shuffles and appends inherit it). The table is additionally
    * PARTITIONED on `drop_id` (the build rides as drop "base"): each
    * ingested drop owns one partition directory, which is what makes
    * [[append]] idempotent — bucketing on the band columns is
    * orthogonal (each partition directory holds one file per bucket,
    * and a scan still arrives bucket-clustered). */
  def create(corpus: DataFrame, text: Column, id: Column, table: String,
      nBuckets: Int, p: Params = Params()): Unit =
    // generation-versioned behind a stable view (LiveTable): probes
    // resolve `table` as usual; compaction and re-creates stage the
    // next generation and commit with one atomic view swap
    graft.sources.LiveTable.createGeneration(corpus.sparkSession, table) { phys =>
      bands(corpus, text, id, p).withColumn("drop_id", lit("base"))
        .write.partitionBy("drop_id")
        .bucketBy(nBuckets, "band_id", "band_key")
        .sortBy("band_id", "band_key")
        .mode(org.apache.spark.sql.SaveMode.Overwrite)
        .saveAsTable(phys)
    }

  /** Append the bands of accepted new docs into the existing layout,
    * IDEMPOTENT per drop id: the write is a dynamic partition
    * overwrite on `drop_id` (the [[graft.sketch.StatsLedger]]
    * discipline), so a crash-retried or replayed ingestion rewrites
    * exactly its own partition instead of double-inserting its bands —
    * a duplicated band row would silently raise collision counts in
    * [[probePairs]]. Distinct drops never touch each other's
    * partitions, and Spark refuses a mismatched bucket spec, so a
    * wrong `nBuckets` fails loudly rather than corrupting the layout. */
  def append(docs: DataFrame, text: Column, id: Column, table: String,
      nBuckets: Int, dropId: String, p: Params = Params()): Unit = {
    require(dropId.nonEmpty && dropId != "base",
      "append needs a per-drop id ('base' names the create-time corpus)")
    graft.sources.LiveTable.insertPartitionOverwriteLive(
      bands(docs, text, id, p).withColumn("drop_id", lit(dropId)), table, dropId)
  }

  /** Consolidate the append history: rewrite the current band rows as
    * ONE `drop_id=base` partition under the same bucket layout — a
    * year of nightly appends is ~365 partitions of small files, each
    * costing a listing + footer fetches on every probe; compaction
    * returns the table to one file per bucket. ZERO-DOWNTIME: the
    * rewrite stages the next [[graft.sources.LiveTable]] generation
    * and commits with one atomic view swap — concurrent probes read
    * whichever generation they resolved, bit-equal either way
    * (spec-pinned); claim-guarded, crash-healable. `newBuckets`
    * evolves the bucket count in the same pass (the index rebucket).
    *
    * Compaction CONSUMES the append history: a pre-compaction drop id
    * replayed afterwards would land in a fresh (now-empty) partition
    * and duplicate its rows — run compaction only after the ingest
    * retry window has closed (the [[graft.sources.Versioned.vacuum]]
    * age-gate discipline). */
  def compact(spark: SparkSession, table: String,
      newBuckets: Option[Int] = None): graft.sources.TableCompact.CompactStats =
    graft.sources.TableCompact.compact(spark, table,
      Seq("band_id", "band_key"), Seq("band_id", "band_key"), newBuckets = newBuckets)

  /** The novelty screen: batch rows that share NO band with the
    * indexed corpus — row-identical to `Dedup.minhashNovel(corpus,
    * batch, …)` but the corpus side is one pruned, pre-partitioned
    * index scan. */
  def screenNovel(spark: SparkSession, table: String, batch: DataFrame,
      text: Column, id: Column, p: Params = Params()): DataFrame = {
    val idx = spark.table(table)
      .select(col("band_id").as("__ix_band"), col("band_key").as("__ix_key"))
    val batchBands = bands(batch, text, id, p)
    val dupIds = batchBands
      .join(idx, col("band_id") === col("__ix_band") && col("band_key") === col("__ix_key"),
        "left_semi")
      .select(col("doc_id").as("__dup_id"))
      .distinct()
    batch.join(dupIds, id === col("__dup_id"), "left_anti")
  }

  /** Attribution probe: (corpus_doc, batch_doc) candidate pairs —
    * which indexed doc does each duplicate batch doc collide with
    * (the evidence row a review queue wants next to every
    * rejection). */
  def probePairs(spark: SparkSession, table: String, batch: DataFrame,
      text: Column, id: Column, p: Params = Params()): DataFrame = {
    val idx = spark.table(table)
      .select(col("band_id").as("__ix_band"), col("band_key").as("__ix_key"),
        col("doc_id").as("corpus_doc"))
    bands(batch, text, id, p)
      .join(idx, col("band_id") === col("__ix_band") && col("band_key") === col("__ix_key"))
      .select(col("corpus_doc"), col("doc_id").as("batch_doc"))
      .distinct()
  }
}
