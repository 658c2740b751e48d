package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins Spark has no native operator for (SURVEY.md
  * §2.2 extension; the "as-of / range join" class the DataFrame API
  * can't express as a single equi-join).
  *
  * Both are built as shuffle-friendly compositions — no
  * BroadcastNestedLoopJoin, no inequality-join cross products:
  *
  *   - [[asofJoin]]: union the two sides, one window pass with a
  *     carry-forward (`last(_, ignoreNulls)`) over (key, time) —
  *     O(n log n) in the partition, single shuffle on the key.
  *   - [[rangeJoinBucketed]]: quantize intervals to time buckets,
  *     equi-join points on (key, bucket), post-filter the exact
  *     range — the standard bucketed range-join optimization; each
  *     (point, interval) pair meets in exactly one bucket (the
  *     point's), so no dedup is needed.
  */
object TemporalJoins {

  /** For each left row, attach the payload of the latest right row of
    * the same `key` with `rightTs <= leftTs` (ASOF left join).
    *
    * `payload` columns must exist on `right`; they come back
    * null-filled for left rows with no earlier right row. Timestamps
    * are integral (epoch µs) for engine portability.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTsUs: Column,
      rightTsUs: Column,
      payload: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns
    val lTagged = left
      .withColumn("__ts", leftTsUs)
      .withColumn("__tag", lit(1))
      .select(col(key) +: col("__ts") +: col("__tag") +:
        leftCols.filter(_ != key).map(col) ++: payload.map(p => lit(null).cast(right.schema(p).dataType).as(p)): _*)
    val rTagged = right
      .withColumn("__ts", rightTsUs)
      .withColumn("__tag", lit(0))
      .select(col(key) +: col("__ts") +: col("__tag") +:
        leftCols.filter(_ != key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++: payload.map(col): _*)
    // right rows sort before left rows at equal ts (ASOF includes ==)
    val w = Window
      .partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(lTagged.unionByName(rTagged)) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    carried.filter(col("__tag") === 1).drop("__ts", "__tag")
  }

  /** Pairs (point, interval) of the same `key` with
    * `startUs <= pointUs <= endUs`. `bucketUs` should be on the order
    * of the typical interval length: larger buckets → fewer replicas
    * of each interval, more post-filtering; smaller → the reverse. */
  def rangeJoinBucketed(
      points: DataFrame,
      intervals: DataFrame,
      key: String,
      pointUs: Column,
      startUs: Column,
      endUs: Column,
      bucketUs: Long
  ): DataFrame = {
    val iv = intervals
      .withColumn("__start", startUs)
      .withColumn("__end", endUs)
      .withColumn("__b", explode(sequence(floor(col("__start") / bucketUs), floor(col("__end") / bucketUs))))
    val pt = points
      .withColumn("__pt", pointUs)
      .withColumn("__b", floor(col("__pt") / bucketUs))
    pt.join(iv, Seq(key, "__b"))
      .filter(col("__pt") >= col("__start") && col("__pt") <= col("__end"))
      .drop("__b", "__pt", "__start", "__end")
  }
}
