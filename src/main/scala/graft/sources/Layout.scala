package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * A single-key sorted layout ([[PartitionedFiles.writeSortedParquet]])
  * makes parquet row-group min/max stats selective on ONE column; a
  * range query on any other column still reads every file. Interleaving
  * the bits of two keys (Morton code) and sorting by that puts rows
  * close in BOTH dimensions into the same files, so 2-D box queries
  * prune most files via footer stats alone — the standard warehouse
  * trick (Delta/Iceberg `ZORDER BY`) for "filter by user AND by time"
  * workloads, built here from plain Column ops (constant-shift
  * bit-twiddling, fully codegen'd — no UDF).
  */
object Layout {

  /** Morton code of two non-negative integral columns, `bits` low bits
    * each (default 16 → a 32-bit z-value): x's bit i lands at 2i, y's
    * at 2i+1. Values are masked to `bits` first, so out-of-range keys
    * degrade gracefully (cluster by low bits) instead of colliding. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31)
    val mask = (1L << bits) - 1
    val xm = x.cast("long").bitwiseAND(lit(mask))
    val ym = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftrightunsigned(xm, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftrightunsigned(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Write parquet z-ordered on (x, y): range-partition then sort by
    * the Morton code, so both the file ranges and the row groups are
    * 2-D-clustered. The z column itself is not persisted. */
  def writeZOrderedParquet(df: DataFrame, path: String, numPartitions: Int,
      x: Column, y: Column, bits: Int = 16): Unit = {
    val cols = df.columns.map(col).toSeq
    df.withColumn("__z", zValue(x, y, bits))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .select(cols: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Compact a directory of (too many small) parquet files to
    * ~`targetFiles` — the periodic maintenance pass that keeps
    * streaming-upsert output readable (each small file costs a task
    * and a footer fetch at scan time). Rewrites to a temp dir then
    * swaps, so a concurrent reader never sees a half-written table. */
  def compactParquet(df: DataFrame, path: String, targetFiles: Int): Unit = {
    val tmp = path + "__compact_tmp"
    df.coalesce(targetFiles).write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = new java.io.File(path)
    val bak = new java.io.File(path + "__compact_old")
    if (fs.exists()) { require(fs.renameTo(bak)) }
    require(new java.io.File(tmp).renameTo(fs))
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    if (bak.exists()) rm(bak)
  }
}
