package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Similarity.{cosineQ, dotQ}
import graft.sources.Warehouse

/** Persisted IVF index — the build-once / probe-per-batch form of
  * [[IvfAnn.annIvf]], mirroring [[graft.dedup.MinhashIndex]] on the
  * similarity side.
  *
  * `annIvf` retrains the coarse quantizer and re-assigns the WHOLE
  * corpus on every call; correct for one-shot jobs, but a serving or
  * recurring-batch pipeline probes the same corpus thousands of
  * times. The index materializes:
  *
  *   - `<table>_cells`: the inverted lists (c_id, vec_id, e, nrm),
  *     bucketed AND bucket-sorted on c_id — the probe join reads
  *     them pre-partitioned, so the corpus side never exchanges
  *     again (the §2.2c bucketed-join argument: one shuffle paid at
  *     build time replaces a corpus shuffle per probe);
  *   - `<table>_centroids`: the trained quantizer (c_id, ce, cnrm),
  *     numCentroids rows — broadcast whole at probe time.
  *
  * Probes are incremental-friendly: new vectors [[append]] by
  * assigning against the STORED centroids (no retrain) into the same
  * bucket layout — ingest cost proportional to the drop, not the
  * corpus. Training determinism ([[IvfAnn.centroids]]: deterministic
  * seeds, floor-mean, checkpointed rounds) makes [[probe]]
  * row-identical to `annIvf` with the same params — `IvfIndexSpec`
  * asserts bit-equality and the exchange-free cells scan.
  */
object IvfIndex {

  /** Training parameters, fixed at [[create]] time; probes only need
    * the table names. */
  final case class Params(numCentroids: Int, lloydIters: Int = 2)

  private def cellsTable(table: String) = s"${table}_cells"
  private def centsTable(table: String) = s"${table}_centroids"

  /** Train the coarse quantizer on the corpus, assign every vector,
    * persist centroids + bucketed inverted lists. `corpus` must be in
    * [[Similarity.prepareQuantized]] shape: (vec_id, e, nrm). */
  def create(spark: SparkSession, corpus: DataFrame, table: String,
      nBuckets: Int, p: Params): Unit = {
    val cents = IvfAnn.centroids(corpus, p.numCentroids, p.lloydIters)
    cents.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(centsTable(table))
    val stored = spark.table(centsTable(table))
    Warehouse.writeBucketed(
      IvfAnn.assign(corpus, stored).join(corpus, "vec_id")
        .select(col("c_id"), col("vec_id"), col("e"), col("nrm")),
      cellsTable(table), Seq("c_id"), nBuckets)
    graft.operators.Checkpoints.release(cents)
  }

  /** Append new vectors into the existing layout: assigned against
    * the STORED centroids (no retrain — the standard IVF ingest
    * path; retrain by re-running [[create]] when drift warrants).
    * Spark refuses a mismatched bucket spec, so a wrong `nBuckets`
    * fails loudly rather than corrupting the layout. */
  def append(spark: SparkSession, docs: DataFrame, table: String,
      nBuckets: Int): Unit =
    IvfAnn.assign(docs, spark.table(centsTable(table))).join(docs, "vec_id")
      .select(col("c_id"), col("vec_id"), col("e"), col("nrm"))
      .write.bucketBy(nBuckets, "c_id").sortBy("c_id")
      .mode(org.apache.spark.sql.SaveMode.Append)
      .saveAsTable(cellsTable(table))

  /** ANN top-k against the index: nprobe nearest cells per query by
    * the broadcast stored quantizer, exact cosine within those cells
    * only. The cells side arrives pre-partitioned (bucket layout) —
    * only the query-batch side exchanges. */
  def probe(spark: SparkSession, table: String, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val cents = spark.table(centsTable(table))
    val lists = spark.table(cellsTable(table))
    val qs = queries.select(col("vec_id").as("q_id"), col("e").as("qe"),
      col("nrm").as("qnrm"))
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("__ccos").desc, col("c_id").asc)
    val probed = qs
      .crossJoin(broadcast(cents))
      .withColumn("__ccos", cosineQ(dotQ(col("qe"), col("ce")), col("qnrm"), col("cnrm")))
      .withColumn("__crn", row_number().over(probeW))
      .filter(col("__crn") <= nprobe)
      .select(col("q_id"), col("qe"), col("qnrm"), col("c_id"))
    val cand = probed
      .join(lists, "c_id")
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos", cosineQ(dotQ(col("qe"), col("e")), col("qnrm"), col("nrm")))
    Similarity.rankedTopK(cand, col("q_id"), Seq(col("cos").desc, col("vec_id").asc), k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cos"))
  }
}
