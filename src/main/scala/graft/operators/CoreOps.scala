package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spark-native re-expression of the shmr operator surface.
  *
  * Reference semantics (all paths in /root/reference):
  *   - `shmr/partition.py` — per-partition `map`, `flat_map`, `filter`,
  *     `distinct(key_fn)`, `reduce`, `reduce_by_key`, `split_by_key`,
  *     `join`, `count`, `head`, `apply`.
  *   - `shmr/partitions.py` — all-partition `coalesce`, `concat`,
  *     `reduce`, `count`, `head`.
  *
  * Design notes (100 TB scale):
  *   - Everything is a declarative Column expression over
  *     DataFrame/Dataset, so Catalyst gets predicate pushdown, column
  *     pruning, whole-stage codegen and AQE for free. No RDDs, no UDFs.
  *   - shmr's "partition" (one file) maps to a Spark partition; ops that
  *     shmr runs per-file (`xargs -P`) here run per-partition across the
  *     cluster with the same semantics and managed shuffles.
  *   - Aggregations use hash aggregation with map-side partial combine
  *     (Spark default); `reduceByKey` therefore shuffles only partial
  *     states, mirroring (and beating) shmr's in-memory dict fold.
  */
object CoreOps {

  /** Untyped (DataFrame) combinators — schema-dynamic path. */
  implicit class DataFrameOps(private val df: DataFrame) extends AnyVal {

    /** shmr `partition.map`: per-record projection/computation.
      * Declarative so it fuses into whole-stage codegen with the scan. */
    def mapRecords(cols: Column*): DataFrame = df.select(cols: _*)

    /** shmr `partition.flat_map`: one record → many. `arrayCol` is
      * exploded into `as`; `keep` columns are carried along. */
    def flatMapRecords(arrayCol: Column, as: String, keep: Column*): DataFrame =
      df.select(keep :+ explode(arrayCol).as(as): _*)

    /** shmr `partition.filter` (delete_on_empty is moot: empty Spark
      * partitions cost nothing downstream). Pushed down to the scan
      * when `pred` only references scan columns. */
    def filterRecords(pred: Column): DataFrame = df.filter(pred)

    /** shmr `partition.distinct(key_fn)` on a projection: exact
      * distinct of the given columns (hash aggregate, partial combine). */
    def distinctRecords(cols: Column*): DataFrame = df.select(cols: _*).distinct()

    /** shmr `partition.distinct(key_fn)` keeping the whole record:
      * one representative row per key. shmr keeps the first in file
      * order; distributed data has no file order, so the caller names a
      * deterministic tie-break ordering instead. Single shuffle on key. */
    def distinctBy(keys: Seq[Column], tieBreak: Seq[Column]): DataFrame = {
      val w = Window.partitionBy(keys: _*).orderBy(tieBreak: _*)
      df.withColumn("__graft_rn", row_number().over(w))
        .filter(col("__graft_rn") === 1)
        .drop("__graft_rn")
    }

    /** shmr `partition.reduce` / `partitions.reduce`: global fold →
      * one row. Spark computes partial aggregates per partition and
      * merges — same shape as shmr's per-file fold + final merge, but
      * with no driver involvement until the single-row result. */
    def reduceRecords(agg: Column, aggs: Column*): DataFrame = df.agg(agg, aggs: _*)

    /** shmr `partition.reduce_by_key`: keyed fold. Hash aggregate with
      * map-side combine; shuffles only partial states. */
    def reduceByKey(keys: Seq[Column], aggs: Seq[Column]): DataFrame =
      df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)

    /** shmr `partition.split_by_key`: route each record to bucket
      * `key mod n` and co-locate buckets. The bucket id is kept as a
      * column (`bucketCol`) so downstream ops and writers can use it;
      * `repartition` on the bucket expression gives the physical
      * co-location shmr achieved with n output files. */
    def splitByKey(key: Column, n: Int, bucketCol: String = "bucket"): DataFrame =
      df.withColumn(bucketCol, pmod(key, lit(n)).cast("int"))
        .repartition(n, col(bucketCol))

    /** shmr `partition.join`: inner hash-join by key. shmr loads one
      * side fully into a dict — the moral equivalent of a broadcast
      * hash join, so small sides should pass `broadcastRight = true`;
      * large-large joins shuffle both sides on the key (with AQE skew
      * splitting). */
    def keyedJoin(
        right: DataFrame,
        joinExprs: Column,
        joinType: String = "inner",
        broadcastRight: Boolean = false
    ): DataFrame =
      df.join(if (broadcastRight) broadcast(right) else right, joinExprs, joinType)

    /** Schema-evolution union: append batches whose schemas drifted —
      * columns are matched BY NAME and absent columns null-fill, the
      * ingestion reality when upstream producers add fields over time
      * (positional union would silently scramble them). */
    def unionEvolved(others: DataFrame*): DataFrame =
      others.foldLeft(df)((acc, o) => acc.unionByName(o, allowMissingColumns = true))

    /** shmr `partition.join`'s actual OUTPUT SHAPE: per key present
      * on both sides, one row (key, [left values], [right values]) —
      * the reference emits grouped records, not a flat row per pair.
      * Arrays are sorted for determinism. Two hash aggregates + one
      * equi-join on the same key → the aggregates' partitioning is
      * reusable for the join (no extra shuffle). */
    def groupedJoin(right: DataFrame, leftKey: String, rightKey: String,
        leftVal: Column, rightVal: Column): DataFrame =
      df.groupBy(col(leftKey)).agg(sort_array(collect_list(leftVal)).as("lefts"))
        .join(
          right.groupBy(col(rightKey).as(leftKey)).agg(sort_array(collect_list(rightVal)).as("rights")),
          leftKey)

    /** shmr `partition.count` as a relation (one row, column `n`) so it
      * composes; `countRecords` below is the eager action. */
    def countRelation(name: String = "n"): DataFrame = df.agg(count(lit(1)).as(name))

    def countRecords(): Long = df.count()

    /** shmr `partition.head`: deterministic top-n (shmr's head is
      * file-order; distributed head needs an explicit ordering).
      * Spark plans this as TakeOrderedAndProject — per-partition top-n
      * then a single merge, no full sort. */
    def headRecords(n: Int, order: Column*): DataFrame = df.orderBy(order: _*).limit(n)

    /** shmr `partitions.coalesce`: re-chunk into n partitions without a
      * shuffle (narrow). Use `repartitionRecords` when balance matters
      * more than avoiding the shuffle. */
    def coalescePartitions(n: Int): DataFrame = df.coalesce(n)

    def repartitionRecords(n: Int): DataFrame = df.repartition(n)

    /** shmr `partitions.concat`: merge several partitioned datasets
      * into one relation (by column name, like shmr's schema-agnostic
      * line concat). */
    def concatPartitions(others: DataFrame*): DataFrame =
      others.foldLeft(df)(_ unionByName _)

    /** Set difference (distinct rows of this not in `other`). */
    def exceptRecords(other: DataFrame): DataFrame = df.except(other)

    /** Set intersection (distinct rows present in both). */
    def intersectRecords(other: DataFrame): DataFrame = df.intersect(other)

    /** shmr `partition.apply`: run a side-effecting function over every
      * record (foreach action). Returns the record count for
      * verifiability. */
    def applyRecords(f: org.apache.spark.sql.Row => Unit): Long = {
      val counter = df.sparkSession.sparkContext.longAccumulator("graft.applyRecords")
      df.foreach { r => f(r); counter.add(1L) }
      counter.value
    }
  }

  /** Typed (Dataset[T]) combinators — the type-safe path for
    * user-defined record types, mirroring shmr's arbitrary-Python-object
    * records. Prefer the untyped Column path when the logic is
    * expressible there (codegen); use these when genuinely imperative. */
  implicit class DatasetOps[T](private val ds: Dataset[T]) extends AnyVal {
    def mapRecords[U: Encoder](f: T => U): Dataset[U] = ds.map(f)
    def flatMapRecords[U: Encoder](f: T => IterableOnce[U]): Dataset[U] = ds.flatMap(f)
    def filterRecords(f: T => Boolean): Dataset[T] = ds.filter(f)
    def reduceRecords(f: (T, T) => T): T = ds.reduce(f)
    def applyRecords(f: T => Unit): Unit = ds.foreach(f)
  }
}
