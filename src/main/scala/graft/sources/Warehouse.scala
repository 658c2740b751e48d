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
