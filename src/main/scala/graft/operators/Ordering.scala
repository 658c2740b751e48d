package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global ordering without a global bottleneck.
  *
  * `row_number() OVER (ORDER BY ...)` funnels the whole relation
  * through ONE task — the textbook scale-killer for "assign each row
  * its global position". The scalable shape is the one Spark's own
  * sort machinery uses: range-repartition on the order key (disjoint,
  * ordered key ranges per partition), sort within partitions, then
  * shift each partition's local ordinals by the total row count of
  * the partitions before it. The offset table is one tiny row per
  * partition — broadcast back, never collected to the driver.
  */
object Ordering {

  /** Adds a 0-based dense global rank column under `order` (which
    * must be a TOTAL order — give it a unique tiebreak column, or
    * ranks are nondeterministic across runs).
    *
    * Local ordinals come from `monotonically_increasing_id()` — which
    * is consecutive within a partition — measured AFTER the
    * within-partition sort, so `mid - min(mid)` is exactly the local
    * row index and no second full-width exchange (a
    * `Window.partitionBy(pid)` would hash-shuffle everything again)
    * is needed. Costs one range shuffle + one extra pass over the
    * sorted data for the per-partition counts.
    */
  def globalRank(df: DataFrame, order: Seq[Column], rankCol: String = "rank",
      numPartitions: Option[Int] = None): DataFrame = {
    val sorted = numPartitions
      .map(n => df.repartitionByRange(n, order: _*))
      .getOrElse(df.repartitionByRange(order: _*))
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
    // one row per partition: row count + first local ordinal
    // the cumulative window runs over ONE ROW PER PARTITION (hundreds,
    // not the data); the constant partition key states that on purpose
    // and keeps WindowExec's single-partition warning out of the logs
    val offsets = sorted.groupBy("__pid")
      .agg(count(lit(1)).as("__cnt"), min(col("__mid")).as("__base"))
      .withColumn("__off",
        coalesce(sum(col("__cnt")).over(
          Window.partitionBy(lit(0)).orderBy("__pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__base", "__off")
    sorted.join(broadcast(offsets), "__pid")
      .withColumn(rankCol, col("__off") + (col("__mid") - col("__base")))
      .drop("__pid", "__mid", "__base", "__off", "__cnt")
  }

  /** Seeded deterministic corpus shuffle: a reproducible random
    * permutation rank from the md5 of (seed, key) — the pre-sharding
    * "shuffle the corpus once before training" step, stable across
    * reruns, retries and partitionings (same seed ⇒ same permutation;
    * new seed ⇒ fresh permutation). Rides [[globalRank]]'s range
    * shuffle — md5 output is uniform, so the range partitions are
    * balanced by construction and no single task sees the corpus. */
  def shuffleRank(df: DataFrame, key: Column, seed: Long,
      rankCol: String = "shuffle_rank"): DataFrame =
    globalRank(df, Seq(md5(concat_ws("|", lit(seed), key.cast("string"))), key.cast("string")),
      rankCol)
}
