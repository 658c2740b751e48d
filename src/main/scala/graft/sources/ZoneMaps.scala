package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, Encoders, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps — a min/max manifest consulted BEFORE the
  * scan (SURVEY.md §2.2/22ax2).
  *
  * Spark's parquet reader prunes ROW GROUPS from footer statistics,
  * but only after the file has been listed, a task scheduled, and the
  * footer fetched; at 100 TB the dominant cost of a selective range
  * query is often exactly that per-file overhead across the files
  * that contain nothing. A zone map (Moerkotte's small materialized
  * aggregates, VLDB '98 — the mechanism behind Delta/Iceberg file
  * statistics) fixes the altitude: one manifest row per data file
  * with the file's [min, max] per clustered column, so planning reads
  * a file-count-sized table and pruned files never produce tasks at
  * all.
  *
  * The manifest lives in `path/_zonemap` — an underscore-prefixed
  * directory, which Spark's file index treats as metadata and skips,
  * so plain `spark.read.parquet(path)` readers are untouched. It is
  * itself parquet (no bespoke codec, mergeable, schema-evolvable) and
  * is rebuilt by ONE column-pruned pass over the data grouped by
  * `input_file_name()`.
  *
  * Zone maps earn their keep only when values are clustered — a
  * random layout gives every file the global [min, max] and prunes
  * nothing — so [[writeClustered]] range-partitions and sorts by the
  * query column first, the same discipline as
  * [[Layout.writeZOrderedParquet]] one dimension down. Bounds are
  * stored in two type families ([[Versioned.zoneBound]]): BIGINT for
  * integral columns and binary-ordered strings for string/date
  * columns (dates render as ISO `yyyy-MM-dd`, which sorts exactly
  * like the date); double/decimal/timestamp columns are REFUSED —
  * a truncated bound would prune files that contain in-range rows,
  * silently breaking the pruned ≡ plain contract. Those types keep
  * riding parquet footer stats under the sorted layout.
  *
  * [[readRange]]'s file selection collects the manifest to the driver
  * — file-count-sized, the same altitude every manifest-based table
  * format plans at — and always re-applies the residual filter, so
  * the result set is provably the plain filtered scan's regardless of
  * how coarse the zones are. A missing manifest degrades to the full
  * filtered scan, never to an error.
  */
object ZoneMaps {

  private def mapDir(path: String): String = new File(path, "_zonemap").getPath

  /** Build (or rebuild) the manifest for an existing parquet
    * directory: one scan reading only `statsCols`, one manifest row
    * per data file. */
  def buildStats(spark: SparkSession, path: String, statsCols: Seq[String]): Unit = {
    require(statsCols.nonEmpty)
    val schema = spark.read.parquet(path).schema
    val aggs = statsCols.flatMap { c =>
      val family = Versioned.zoneBound(schema(c).dataType) // integral/string/date only — loud
      Seq(min(col(c)).cast(family).as(s"lo_$c"), max(col(c)).cast(family).as(s"hi_$c"))
    }
    spark.read.parquet(path)
      .select(input_file_name().as("file") +: statsCols.map(col): _*)
      .groupBy("file")
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(mapDir(path))
  }

  /** Write `df` clustered on `orderBy` (range-partition + in-file
    * sort, making zones disjoint and the map selective) and build the
    * manifest over `statsCols` (defaults to the cluster column). */
  def writeClustered(df: DataFrame, path: String, numPartitions: Int,
      orderBy: String, statsCols: Seq[String] = Seq.empty): Unit = {
    df.repartitionByRange(numPartitions, col(orderBy))
      .sortWithinPartitions(col(orderBy))
      .write.mode(SaveMode.Overwrite).parquet(path)
    buildStats(df.sparkSession, path,
      if (statsCols.isEmpty) Seq(orderBy) else statsCols)
  }

  /** `lo ≤ c ≤ hi` over a zone-mapped directory: prune files whose
    * zone provably misses the range (an all-NULL zone has NULL
    * bounds, fails the overlap predicate, and is correctly pruned —
    * NULL never satisfies a range filter), then apply the residual
    * filter to the survivors. Exactly the rows of the plain filtered
    * scan, by construction. */
  def readRange(spark: SparkSession, path: String, c: String, lo: Long, hi: Long): DataFrame =
    readRangeTyped(spark, path, c, lo, hi)

  /** String/date flavor: binary string order — pass ISO `yyyy-MM-dd`
    * bounds for date zone columns. */
  def readRange(spark: SparkSession, path: String, c: String, lo: String, hi: String): DataFrame =
    readRangeTyped(spark, path, c, lo, hi)

  /** The bound family column `c`'s zones were WRITTEN in ("long" or
    * "string"), read from the manifest's own schema — the
    * authoritative router for [[readRange]] callers that hold textual
    * bounds: a string column of numeric-looking values must probe the
    * string family, or binary-ordered bounds (min '100', max '9')
    * compared numerically would prune files holding in-range rows.
    * None when no manifest exists or it doesn't cover `c`. */
  def boundFamily(spark: SparkSession, path: String, c: String): Option[String] = {
    val zm = new File(mapDir(path))
    if (!zm.exists()) None
    else spark.read.parquet(zm.getPath).schema.fields.find(_.name == s"lo_$c")
      .map(_.dataType match {
        case org.apache.spark.sql.types.LongType => "long"
        case _ => "string"
      })
  }

  private def readRangeTyped(spark: SparkSession, path: String, c: String,
      lo: Any, hi: Any): DataFrame = {
    val zm = new File(mapDir(path))
    val full = spark.read.parquet(path)
    val residual = col(c) >= lit(lo) && col(c) <= lit(hi)
    if (!zm.exists()) full.filter(residual)
    else {
      val files = spark.read.parquet(zm.getPath)
        .filter(col(s"lo_$c") <= lit(hi) && col(s"hi_$c") >= lit(lo))
        .select(col("file")).as(Encoders.STRING).collect()
      if (files.isEmpty) full.filter(residual).limit(0)
      else spark.read.schema(full.schema).parquet(files.toIndexedSeq: _*).filter(residual)
    }
  }
}
