package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index — the build-once / probe-per-batch form of
  * [[PqAnn.annIvfPq]], completing the persisted-index family
  * ([[IvfIndex]] 29f, [[graft.dedup.MinhashIndex]] 24e4,
  * [[graft.text.SearchIndex]] 50d/50e2) with the memory-side ANN
  * shape (SURVEY.md §2.4/29f2).
  *
  * `annIvfPq` retrains the coarse quantizer AND the `m` per-subspace
  * PQ codebooks and re-encodes the whole corpus on every call —
  * measured as the dominant cost of the PQ mutual-kNN form at sandbox
  * scale once the scoring folds went native (dev/scaleup_mutual_r13):
  * a recurring pipeline repays seconds of Lloyd training per run for
  * an identical model. The index persists, atomically:
  *
  *   - `<table>_pqcents_g%05d`: the coarse quantizer (c_id, ce, cnrm);
  *   - `<table>_pqbooks_g%05d`: the PQ codebooks (s, dcid, ce, cnrm);
  *   - `<table>_pqcells`: the inverted lists — (c_id, vec_id, codes)
  *     with `codes` the m dense codeword ids, bucketed + bucket-sorted
  *     on c_id (probes read them pre-partitioned, zero corpus-side
  *     exchange) and partitioned on `drop_id` (appends are idempotent
  *     dynamic partition overwrites). The lists carry CODES ONLY — m
  *     ints per vector instead of the full quantized array, the 8×+
  *     squeeze that fits billion-vector lists in executor memory.
  *
  * The trained state (cents + books) is generation-versioned and
  * committed by [[GenPointer]]'s atomic pointer-file swap — a crash
  * mid-create leaves any previous generation intact; [[vacuumGens]]
  * reclaims the rest.
  *
  * Probes need the caller's `corpus` frame for the exact refine
  * re-rank (the index stores no exact vectors — FAISS's IVFPQ+refine
  * keeps the exact store outside the lists the same way) and are
  * bit-identical to `annIvfPq` at the same build params by shared
  * code path ([[PqAnn.probeCoded]]) + training determinism —
  * PqIndexSpec pins it. */
object PqIndex {

  /** Training parameters, fixed at [[create]] time. */
  final case class Params(numCentroids: Int, lloydIters: Int,
      m: Int, subDim: Int, pqK: Int, pqIters: Int)

  private def cellsTable(table: String) = s"${table}_pqcells"
  private def centsTable(table: String, gen: Int) = f"${table}_pqcents_g$gen%05d"
  private def booksTable(table: String, gen: Int) = f"${table}_pqbooks_g$gen%05d"

  private def liveGen(spark: SparkSession, table: String): Int =
    GenPointer.live(spark, table, "pq")

  /** The live generation's coarse quantizer / PQ codebooks. */
  def coarseCentroids(spark: SparkSession, table: String): DataFrame =
    spark.table(centsTable(table, liveGen(spark, table)))
  def codebooks(spark: SparkSession, table: String): DataFrame =
    spark.table(booksTable(table, liveGen(spark, table)))

  /** Train coarse quantizer + codebooks on the corpus, encode and
    * assign every vector, persist everything, commit with the pointer
    * swap. `corpus` must be in [[Similarity.prepareQuantized]] shape.
    * A first create is crash-safe (no pointer until everything is
    * written); a RE-create is the offline rebuild path — it overwrites
    * the cells table in place (run without concurrent probes). */
  def create(spark: SparkSession, corpus: DataFrame, table: String,
      nBuckets: Int, p: Params): Unit = {
    val gen = GenPointer.read(spark, table, "pq").map(_ + 1).getOrElse(1)
    val coarse = IvfAnn.centroids(corpus, p.numCentroids, p.lloydIters)
    coarse.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(centsTable(table, gen))
    // final Lloyd round checkpointed inside the build; the table write
    // below materializes the dense renumbering — no second eager
    val cbs = PqAnn.codebooks(corpus, p.m, p.subDim, p.pqK, p.pqIters)
    cbs.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(booksTable(table, gen))
    val storedCoarse = spark.table(centsTable(table, gen))
    val storedBooks = spark.table(booksTable(table, gen))
    graft.sources.LiveTable.createGeneration(spark, cellsTable(table)) { phys =>
      // codes computed in the SAME pass as the assignment, carried
      // through the top-1 heap — no vec_id self-alignment join
      IvfAnn.assign(PqAnn.encode(corpus, storedBooks), storedCoarse, carry = Seq("codes"))
        .select(col("c_id"), col("vec_id"), col("codes"))
        .withColumn("drop_id", lit("base"))
        .write.partitionBy("drop_id")
        .bucketBy(nBuckets, "c_id").sortBy("c_id")
        .mode(org.apache.spark.sql.SaveMode.Overwrite)
        .saveAsTable(phys)
    }
    graft.operators.Checkpoints.release(cbs)
    GenPointer.swap(spark, table, "pq", gen)
  }

  /** Append new vectors: assigned + encoded against the STORED model
    * (no retrain), written as an IDEMPOTENT dynamic partition
    * overwrite on `drop_id` — a crash-retried ingestion rewrites
    * exactly its own partition. Re-create when drift warrants (the
    * [[IvfIndex.driftStats]] gauge applies to the coarse level). */
  def append(spark: SparkSession, docs: DataFrame, table: String,
      dropId: String): Unit = {
    require(dropId.nonEmpty && dropId != "base",
      "append needs a per-drop id ('base' names the create-time corpus)")
    val gen = liveGen(spark, table)
    graft.sources.LiveTable.insertPartitionOverwriteLive(
      IvfAnn.assign(PqAnn.encode(docs, spark.table(booksTable(table, gen))),
          spark.table(centsTable(table, gen)), carry = Seq("codes"))
        .select(col("c_id"), col("vec_id"), col("codes"))
        .withColumn("drop_id", lit(dropId)),
      cellsTable(table), dropId)
  }

  /** IVF-PQ ANN top-k against the persisted index: coarse probe by
    * the stored quantizer, native-ADC scoring of the stored CODES, a
    * refine-deep shortlist, exact integer-cosine re-rank against the
    * caller's `corpus` vectors — [[PqAnn.probeCoded]] verbatim, so
    * bit-identical to `annIvfPq` at the build's params. The cells side
    * arrives pre-partitioned (bucket layout); only the query batch
    * exchanges. */
  def probe(spark: SparkSession, table: String, queries: DataFrame,
      corpus: DataFrame, k: Int, nprobe: Int, refine: Int): DataFrame =
    PqAnn.probeCoded(coarseCentroids(spark, table), codebooks(spark, table),
      spark.table(cellsTable(table)), queries, corpus, k, nprobe, refine)

  /** Reclaim superseded generations' coarse/codebook tables (never the
    * live one). Returns the dropped table names. */
  def vacuumGens(spark: SparkSession, table: String): Seq[String] =
    GenPointer.vacuum(spark, table, Seq("pqcents", "pqbooks"),
      liveGen(spark, table))

  /** Consolidate the coded-lists table's append history to ONE
    * `drop_id=base` partition (one file per bucket again) — probe
    * results bit-equal before/after, spec-pinned. Claim-guarded and
    * crash-healable ([[graft.sources.TableCompact]]); consumes the
    * append history (don't replay pre-compaction drop ids after). */
  def compact(spark: SparkSession, table: String,
      newBuckets: Option[Int] = None): graft.sources.TableCompact.CompactStats =
    graft.sources.TableCompact.compact(spark, cellsTable(table), Seq("c_id"), Seq("c_id"),
      newBuckets = newBuckets)
}
