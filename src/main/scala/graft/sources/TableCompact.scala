package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Compaction for the `drop_id`-partitioned persisted-index family
  * ([[graft.dedup.MinhashIndex]], [[graft.text.SearchIndex]],
  * [[graft.similarity.IvfIndex]], [[graft.similarity.PqIndex]]).
  *
  * Nightly appends are idempotent dynamic partition overwrites — each
  * drop owns one `drop_id=<id>` partition directory. Correct, but a
  * year of drops is ~365 partitions of small files per index, each
  * costing a listing + parquet-footer fetches on EVERY probe; and
  * [[graft.similarity.IvfIndex.rebalance]]'s dead list rows were only
  * reclaimable by a full re-create. This is the maintenance pass
  * between the appends — the [[Versioned.compact]] /
  * [[graft.dedup.ClusterLedger.compact]] template applied to catalog
  * tables: rewrite the CURRENT rows as one consolidated `drop_id=base`
  * partition (one file per bucket again), preserving the table's
  * bucket layout so probes stay exchange-free and later appends keep
  * landing in their own partitions.
  *
  * Commit discipline: catalog tables have no manifest to atomically
  * swap, so the publish is staged + claim-guarded with a DETECTED
  * residual window (the [[graft.text.SearchIndex.appendBm25]]
  * torn-state precedent — loud, heal-able, never silent):
  *
  *  1. a [[CommitSlot]] claim (`_compact_<table>` in the database
  *     directory) serializes compactions and lets a crashed one's
  *     retry steal the stale claim safely;
  *  2. the consolidated rows stage into a SEPARATE table
  *     (`<table>__compacting`) under the same bucket spec — the live
  *     table is untouched while the expensive write runs;
  *  3. the live partition set is re-listed and compared to the entry
  *     listing: an append that landed mid-compact aborts the publish
  *     (its drop would otherwise be silently dropped by the swap);
  *  4. the swap is two catalog ops — DROP live, RENAME staging — with
  *     a crash seam between them. A crash there leaves the table
  *     MISSING (loud: every probe fails by name, nothing mis-ranks)
  *     and [[heal]] (run automatically at the next compact, or
  *     manually) completes the rename; a crash before the drop leaves
  *     the staging table, which heal removes. Run compaction from the
  *     maintenance schedule, not under live probes — the same offline
  *     contract as the index re-create paths.
  *
  * Probe results are bit-equal before/after by construction (same
  * rows, same layout) — each index's spec pins it, plus the
  * partition- and file-count assertions. */
object TableCompact {

  /** What a compaction did: live rows carried, rows dropped by the
    * index's filter (IVF dead rows), partitions and files before →
    * after. */
  final case class CompactStats(rows: Long, droppedRows: Long,
      partitionsBefore: Int, partitionsAfter: Int,
      filesBefore: Int, filesAfter: Int)

  // test seam for crash-point specs/fuzz: a simulated kill between the
  // catalog ops (one-shot — consumed on fire). Production never sets it.
  private[graft] var crashPoint: Option[String] = None
  private def maybeCrash(point: String): Unit =
    if (crashPoint.contains(point)) {
      crashPoint = None
      sys.error(s"simulated crash at compact point '$point'")
    }

  private def stagingName(table: String): String = s"${table}__compacting"

  private def claimFile(spark: SparkSession, table: String): java.io.File = {
    val (db, bare) = table.lastIndexOf('.') match {
      case -1 => (spark.catalog.currentDatabase, table)
      case i => (table.substring(0, i), table.substring(i + 1))
    }
    val loc = spark.catalog.getDatabase(db).locationUri
    val dir = if (loc.contains(":")) new java.io.File(new java.net.URI(loc).getPath)
      else new java.io.File(loc)
    dir.mkdirs()
    new java.io.File(dir, s"_compact_$bare")
  }

  private def numBuckets(spark: SparkSession, table: String): Option[Int] =
    spark.sql(s"DESCRIBE FORMATTED $table").collect()
      .find(r => Option(r.getString(0)).exists(_.trim == "Num Buckets"))
      .map(_.getString(1).trim.toInt)

  private def partitions(spark: SparkSession, table: String): Set[String] =
    spark.sql(s"SHOW PARTITIONS $table").collect().map(_.getString(0)).toSet

  private def dataFiles(spark: SparkSession, table: String): Int =
    spark.table(table).inputFiles.length

  /** Repair a crashed compaction: complete the rename when the live
    * table is missing and the staged one exists; drop a stale staging
    * table when the live one survived. No-op otherwise. Returns what
    * it did. */
  def heal(spark: SparkSession, table: String): String = {
    val staging = stagingName(table)
    val liveExists = spark.catalog.tableExists(table)
    val stagingExists = spark.catalog.tableExists(staging)
    (liveExists, stagingExists) match {
      case (false, true) =>
        spark.sql(s"ALTER TABLE $staging RENAME TO $table")
        // the catalog rename moves the managed directory but carries the
        // partition entries' OLD locations along — rebuild them from the
        // moved directory tree or the table lists zero files
        spark.sql(s"ALTER TABLE $table RECOVER PARTITIONS")
        spark.sql(s"REFRESH TABLE $table")
        "completed-rename"
      case (true, true) =>
        spark.sql(s"DROP TABLE $staging")
        "dropped-stale-staging"
      case _ => "noop"
    }
  }

  /** Consolidate `table` (drop_id-partitioned, optionally bucketed) to
    * one `drop_id=base` partition holding exactly `filter(current
    * rows)`. `bucketCols`/`sortCols` restate the table's layout (they
    * must match the catalog's — the bucket count is read from it). */
  def compact(spark: SparkSession, table: String,
      bucketCols: Seq[String], sortCols: Seq[String],
      filter: DataFrame => DataFrame = identity): CompactStats = {
    val startedMs = System.currentTimeMillis()
    val claim = CommitSlot.acquire(claimFile(spark, table), startedMs)
      .getOrElse(throw new ConcurrentWriteException(
        s"another writer holds the compaction slot for $table — " +
          "compactions are single-writer; retry later"))
    try {
      heal(spark, table) // a crashed predecessor's leftovers, under the claim
      val staging = stagingName(table)
      val nb = numBuckets(spark, table)
      val parts0 = partitions(spark, table)
      val filesBefore = dataFiles(spark, table)
      val cur = spark.table(table)
      val before = cur.count()
      val kept = filter(cur)
      val dataCols = kept.columns.filter(_ != "drop_id").toSeq
      val rows = kept.count()
      val flat = kept
        .select(dataCols.map(col) :+ lit("base").as("drop_id"): _*)
      // a bucketed write emits one file per (task × bucket); compaction
      // exists to get back to ONE file per bucket, so cluster each
      // bucket's rows into one task first (repartition's hash IS the
      // bucket hash — same Murmur3-pmod); non-bucketed ledgers collapse
      // to a single file
      val staged = (nb, bucketCols) match {
        case (Some(n), cs @ (_ +: _)) => flat.repartition(n, cs.map(col): _*)
        case _ => flat.coalesce(1)
      }
      val w0 = staged.write.partitionBy("drop_id")
        .mode(org.apache.spark.sql.SaveMode.Overwrite)
      val w = (nb, bucketCols) match {
        case (Some(n), c +: rest) =>
          val bw = w0.bucketBy(n, c, rest: _*)
          sortCols match {
            case s +: srest => bw.sortBy(s, srest: _*)
            case _ => bw
          }
        case _ => w0
      }
      // execute the staging write with bucketed READING disabled: the
      // source scan otherwise claims the repartition's required
      // distribution (same hash, same count) and the planner elides the
      // exchange, but the multi-partition-dir scan does not actually
      // execute bucket-aligned — tasks hold mixed buckets and the write
      // splits one file per (task × bucket) instead of one per bucket
      val bucketingKey = "spark.sql.sources.bucketing.enabled"
      val oldBucketing = spark.conf.getOption(bucketingKey)
      spark.conf.set(bucketingKey, "false")
      try w.saveAsTable(staging)
      finally oldBucketing match {
        case Some(v) => spark.conf.set(bucketingKey, v)
        case None => spark.conf.unset(bucketingKey)
      }
      maybeCrash("staged")
      // an append that committed while we staged owns a partition the
      // staged table lacks — swapping would silently drop its rows
      val parts1 = partitions(spark, table)
      if (parts1 != parts0) {
        spark.sql(s"DROP TABLE IF EXISTS $staging")
        throw new ConcurrentWriteException(
          s"concurrent append detected on $table while compacting " +
            s"(partitions ${parts0.size} -> ${parts1.size}) — re-run the compaction")
      }
      if (!claim.owned())
        throw new ConcurrentWriteException(
          s"compaction claim for $table was stolen mid-stage — abandoning")
      spark.sql(s"DROP TABLE $table")
      maybeCrash("swapped")
      spark.sql(s"ALTER TABLE $staging RENAME TO $table")
      spark.sql(s"ALTER TABLE $table RECOVER PARTITIONS")
      spark.sql(s"REFRESH TABLE $table")
      val filesAfter = dataFiles(spark, table)
      CompactStats(rows, before - rows, parts0.size, partitions(spark, table).size,
        filesBefore, filesAfter)
    } finally claim.release()
  }
}
