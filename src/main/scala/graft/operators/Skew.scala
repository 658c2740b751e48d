package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins (SURVEY.md §5). AQE's skew-join split
  * handles most cases at runtime; explicit salting is the planned-
  * ahead variant for known-pathological keys (e.g. the null/default
  * key holding 30% of a 100 TB fact table).
  */
object Skew {

  /** Salted equi-join: scatter the (large, skewed) probe side across
    * `salts` sub-keys and replicate the build side once per salt, so
    * one hot key fans out over `salts` reducers instead of one.
    *
    * Result is row-identical to `probe.join(build, key)`; only the
    * shuffle distribution changes. Build-side replication multiplies
    * its size by `salts` — keep the build side the smaller one.
    *
    * The salt is a CONTENT hash (not monotonically_increasing_id): a
    * row hashes to the same salt on task retry and across AQE
    * replans, so recomputation of one partition cannot route rows
    * differently from the original attempt.
    *
    * `saltCols` picks what gets hashed — pass the probe's natural row
    * key (an order id, an event id). Hashing the DEFAULT (every
    * column) is always correct but reads every column: the salt
    * expression defeats the scan's column pruning, so a 3-column
    * projection over a 16-column fact suddenly scans all 16. Rows
    * identical on `saltCols` share a salt — only pathological for a
    * hot key made of such rows, which exact-dedup upstream removes.
    */
  /** Key-skew profile: the topN heaviest keys with their row share —
    * the report that decides whether a join needs salting (one key
    * holding 30% of the table does; a flat top-10 does not). One
    * map-side-combined aggregate over the key, a broadcast single-row
    * total, top-N through TakeOrderedAndProject (per-partition heaps;
    * the key spectrum never sorts globally). `share` is one
    * correctly-rounded division — portable. */
  def skewProfile(df: DataFrame, key: Column, topN: Int): DataFrame = {
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").cast("bigint").as("__total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share", col("cnt").cast("double") / col("__total"))
      .drop("__total")
      .orderBy(col("cnt").desc, col("key").asc)
      .limit(topN)
  }

  def saltedJoin(probe: DataFrame, build: DataFrame, key: String, salts: Int,
      saltCols: Seq[Column] = Nil): DataFrame = {
    val hashed = if (saltCols.nonEmpty) saltCols else probe.columns.map(col).toIndexedSeq
    val salted = probe.withColumn(
      "__graft_salt", pmod(xxhash64(hashed: _*), lit(salts.toLong)))
    val replicated = build.withColumn("__graft_salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted
      .join(replicated, Seq(key, "__graft_salt"))
      .drop("__graft_salt")
  }
}
