package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed warehouse tables — the pre-shuffle layout for REPEATED
  * fact-fact joins and aggregations on the same key.
  *
  * Bucketing hash-partitions data into a fixed number of files per
  * partition AT WRITE TIME and records the layout in the catalog;
  * every later join/aggregate on the bucket key then runs with NO
  * exchange (Spark proves co-partitioning from metadata). One shuffle
  * paid once at ingest replaces one shuffle per query — at 100 TB the
  * difference between an ingest-time cost and an every-query cost.
  * Sorted buckets additionally let sort-merge join skip its sort.
  *
  * Bucket-count discipline: both sides of a join need the same count
  * (or a divisor, with `spark.sql.bucketing.coalesceBucketsInJoin`);
  * size buckets so one bucket ≈ one task's worth (128–512 MB).
  */
object Warehouse {

  /** Write `df` as a bucketed, bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      nBuckets: Int, sorted: Boolean = true): Unit = {
    val w = df.write.bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sorted) w.sortBy(bucketCols.head, bucketCols.tail: _*) else w)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Dynamic-partition-overwrite insert into a catalog table: only the
    * partitions PRESENT IN `df` are replaced; everything else is
    * untouched. This is the idempotence primitive of the persisted
    * index family (MinhashIndex/IvfIndex/SearchIndex appends — each
    * drop owns its `drop_id` partition, so a crash-retried ingestion
    * rewrites exactly itself). `insertInto` ignores the per-write
    * `partitionOverwriteMode` OPTION (it only reaches path-based
    * writes), so the session conf is set around the insert and
    * restored after — a plain `mode(Overwrite).insertInto` under the
    * default static mode would silently clobber every other drop's
    * partition. Columns match POSITIONALLY (partition column last).
    *
    * The conf window is SERIALIZED process-wide: the mode is a
    * session conf, so two concurrent appends on the same session could
    * otherwise interleave set/insert/restore such that one thread's
    * restore lands before the other's insert executes — that insert
    * would then run in STATIC mode with SaveMode.Overwrite and
    * truncate every other drop's partition, the exact loss this
    * helper exists to prevent. Appends are drop-sized, so the
    * serialization costs nothing at scale (cross-process writers have
    * their own sessions and confs — unaffected). */
  private val overwriteModeLock = new Object
  def insertPartitionOverwrite(df: DataFrame, table: String): Unit =
    overwriteModeLock.synchronized {
      val spark = df.sparkSession
      val key = "spark.sql.sources.partitionOverwriteMode"
      val old = spark.conf.getOption(key)
      spark.conf.set(key, "dynamic")
      try df.write.mode(SaveMode.Overwrite).insertInto(table)
      finally old match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }

  /** Join two same-bucketed tables on their bucket key — exchange-free
    * by catalog metadata (assert with [[isExchangeFree]] in tests). */
  def bucketJoin(spark: SparkSession, left: String, right: String,
      on: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), on, joinType)

  /** True when the physical plan contains no key-repartitioning
    * exchange — the property bucketing exists to buy. */
  def isExchangeFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
