package graft.dedup

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Checkpoints

/** Persisted incremental connected-components ledger — the
  * clustering-side completion of the build-once dedup family
  * (SURVEY.md §2.3/24e5). The MinHash band index (MinhashIndex)
  * already delivers a new drop's near-dup PAIRS at drop cost; before
  * this ledger, turning those pairs into cluster decisions re-ran
  * `connectedComponents` over the corpus-wide pair graph every time.
  * The ledger persists the (id, cluster_id) labeling and merges each
  * drop's edges into it INCREMENTALLY:
  *
  *  1. the drop's edges are projected onto the CLUSTER graph — each
  *     endpoint is replaced by its current cluster label (its own id
  *     when unseen), so the merge problem is drop-edge-sized, never
  *     corpus-sized;
  *  2. `Components.connectedComponents` runs on that tiny projected
  *     graph (for real drops this takes the single-task union-find
  *     fast path — exactly "local union-find over the affected
  *     components");
  *  3. only rows whose cluster id actually merged are relabeled, and
  *     only the label-table BUCKETS holding an affected or new row
  *     are rewritten (labels are hash-partitioned on id — an id never
  *     changes buckets, so dynamic partition overwrite leaves every
  *     untouched bucket's files alone).
  *
  * Correctness: cluster labels are component MINIMA, and min-label
  * merging is a semilattice fold — `append(d1); append(d2)` produces
  * the exact labeling of `connectedComponents(d1 ∪ d2)` (spec-pinned
  * bit-equal), appends commute, a replayed drop is a no-op, and a
  * crash-interrupted append (some buckets new, some old) HEALS on
  * replay: a half-applied merge leaves mixed labels that the replay's
  * cluster graph simply connects again, and min(new, old) = new.
  *
  * Scale shape: the only corpus-sized artifact is the label table
  * itself (near-dup-doc-count rows, tiny next to the corpus). An
  * append reads it once (pruned: the endpoint lookup broadcasts the
  * drop's endpoints; the relabel scan broadcasts the affected-cluster
  * set) and rewrites only affected buckets. Nothing ever collects to
  * the driver.
  */
object ClusterLedger {

  /** What an append did: how many label rows merged into a different
    * cluster, how many new ids were registered, and which buckets were
    * rewritten (audit hook — untouched buckets prove the incremental
    * contract). */
  final case class AppendStats(relabeled: Long, newIds: Long, rewrittenBuckets: Seq[Int])

  private def labelsDir(path: String) = s"$path/labels"

  /** The current labeling: (id, cluster_id) for every node any
    * appended pair graph has mentioned. Empty frame (same schema as
    * the pairs' id columns) when nothing was appended yet. */
  def labels(spark: SparkSession, path: String): DataFrame = {
    val dir = new java.io.File(labelsDir(path))
    require(dir.exists(), s"no cluster ledger at $path")
    spark.read.parquet(dir.getPath).select("id", "cluster_id")
  }

  private def metaFile(path: String) = new java.io.File(path, "_cluster_meta.json")
  private val BucketsRe = """"numBuckets"\s*:\s*(\d+)""".r.unanchored

  /** Merge one drop's near-dup pairs into the ledger. `numBuckets` is
    * fixed at ledger creation (the first append persists it) and a
    * later append with a DIFFERENT value is refused loudly: ids hash
    * to buckets, so a silent mismatch writes a relabeled row into its
    * new-count bucket while the stale copy survives in the old one —
    * duplicate labels. (The first 100-seed fuzz sweep of this family
    * produced exactly that corruption before this guard existed.)
    * Returns [[AppendStats]]. */
  def append(path: String, pairs: DataFrame, a: String, b: String,
      numBuckets: Int = 64): AppendStats = {
    require(numBuckets > 0)
    val spark = pairs.sparkSession
    val dir = labelsDir(path)
    val exists = new java.io.File(dir).exists()
    val meta = metaFile(path)
    if (exists && meta.exists()) {
      val text = new String(java.nio.file.Files.readAllBytes(meta.toPath), "UTF-8")
      val persisted = text match {
        case BucketsRe(n) => n.toInt
        case _ => sys.error(s"bad cluster-ledger meta: $text")
      }
      require(numBuckets == persisted,
        s"cluster ledger at $path was created with numBuckets=$persisted; " +
          s"append called with $numBuckets — ids hash to buckets, a mismatch orphans rows")
    }

    // the drop's edge list — evaluated twice (endpoint lookup + new-id
    // scan), so materialize once; drops are small by construction.
    // Rows with a null endpoint are dropped (a pair needs two sides;
    // register a singleton as the self-pair (x, x))
    val e = Checkpoints.eager(
      pairs.select(col(a).as("__u"), col(b).as("__v"))
        .filter(col("__u").isNotNull && col("__v").isNotNull))

    val cur =
      if (exists) spark.read.parquet(dir)
      else {
        val idType = e.schema.fields.head.dataType
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id", idType),
            org.apache.spark.sql.types.StructField("cluster_id", idType),
            org.apache.spark.sql.types.StructField("bkt", org.apache.spark.sql.types.IntegerType))))
      }

    // 1. endpoints → current cluster labels (unseen endpoint = itself).
    //    The drop side is broadcast; the label table streams past it.
    val ends = e.select(col("__u").as("__nid")).union(e.select(col("__v").as("__nid"))).distinct()
    val endLab = Checkpoints.eager(
      ends.join(cur.select(col("id").as("__nid"), col("cluster_id").as("__ncl")),
          Seq("__nid"), "left")
        .select(col("__nid"), coalesce(col("__ncl"), col("__nid")).as("__ncl")))
    // 2. the projected cluster graph: one edge per drop edge, plus a
    //    self-loop per endpoint cluster so isolated new nodes register
    val clEdges = e
      .join(endLab.select(col("__nid").as("__u"), col("__ncl").as("cu")), Seq("__u"))
      .join(endLab.select(col("__nid").as("__v"), col("__ncl").as("cv")), Seq("__v"))
      .select(col("cu"), col("cv"))
      .union(endLab.select(col("__ncl").as("cu"), col("__ncl").as("cv")))
    // 3. drop-sized merge (single-task union-find under the threshold)
    val remap = Checkpoints.eager(
      Components.connectedComponents(clEdges, "cu", "cv")
        .select(col("id").as("__old"), col("cluster_id").as("__new")))
    val moved = Checkpoints.eager(remap.filter(col("__old") =!= col("__new")))

    // 4. relabel only rows of clusters that actually merged (broadcast
    //    the moved set — it is bounded by the drop's edge count)
    val relabeled = Checkpoints.eager(cur
      .join(broadcast(moved), cur("cluster_id") === col("__old"))
      .select(cur("id"), col("__new").as("cluster_id")))
    // 5. register ids the ledger has never seen, at their merged label
    val newRows = ends
      .join(cur.select(col("id").as("__nid")), Seq("__nid"), "left_anti")
      .join(remap, col("__nid") === col("__old"), "left")
      .select(col("__nid").as("id"), coalesce(col("__new"), col("__nid")).as("cluster_id"))

    val touched = relabeled.unionByName(newRows)
      .withColumn("bkt", pmod(xxhash64(col("id").cast("string")), lit(numBuckets)).cast("int"))
    // 6. affected buckets must be rewritten WHOLE (dynamic partition
    //    overwrite replaces the entire partition): carry their
    //    untouched co-resident rows through unchanged. Relabeled ids
    //    are excluded via the moved-cluster anti-join; brand-new ids
    //    are not in `cur` by construction.
    val out = Checkpoints.eager {
      if (!exists) touched
      else {
        val bkts = touched.select("bkt").distinct()
        val carried = cur
          .join(broadcast(bkts), Seq("bkt"), "left_semi")
          .join(broadcast(moved), cur("cluster_id") === col("__old"), "left_anti")
          .select(col("id"), col("cluster_id"), col("bkt"))
        touched.select("id", "cluster_id", "bkt").unionByName(carried)
      }
    }
    val stats = AppendStats(
      relabeled = relabeled.count(),
      newIds = newRows.count(),
      rewrittenBuckets = out.select("bkt").distinct().collect().map(_.getInt(0)).toSeq.sorted)
    // `out` is materialized (eager checkpoint) BEFORE the overwrite —
    // never read the files being replaced mid-write
    out.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bkt")
      .parquet(dir)
    // persist the layout contract after the first successful write (a
    // pre-guard ledger missing its meta adopts the caller's value)
    if (!meta.exists())
      java.nio.file.Files.write(meta.toPath,
        s"""{"numBuckets": $numBuckets}""".getBytes("UTF-8"))
    // release only THIS append's checkpoints — a caller's own eager
    // frames stay alive
    Seq(e, endLab, remap, moved, relabeled, out).foreach(Checkpoints.release)
    stats
  }
}
