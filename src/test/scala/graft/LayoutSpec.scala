package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{Layout, PartitionedFiles}

class LayoutSpec extends SparkSpecBase {
  import spark.implicits._

  test("zValue interleaves bits (known Morton codes)") {
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (7L, 0L), (0L, 7L), (5L, 3L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), bits = 8)).as[Long].collect().toSeq
    // z(5,3): x=101 → bits 0,4; y=011 → bits 1,3 → 1+2+8+16 = 27
    assert(out === Seq(0L, 1L, 2L, 3L, 21L, 42L, 27L))
  }

  test("z-ordered layout prunes 2-D box queries better than 1-D sorted") {
    val grid = for { x <- 0 until 32; y <- 0 until 32 } yield (x.toLong, y.toLong)
    val df = scala.util.Random.shuffle(grid).toDF("x", "y").repartition(8)

    val zDir = Files.createTempDirectory("graft_z").toString + "/t"
    val xDir = Files.createTempDirectory("graft_x").toString + "/t"
    Layout.writeZOrderedParquet(df, zDir, numPartitions = 8, col("x"), col("y"))
    PartitionedFiles.writeSortedParquet(df, xDir, numPartitions = 8, Seq("x"))

    def filesTouched(dir: String): Long = spark.read.parquet(dir)
      .filter(col("y") < 2) // thin slab on the NON-sort dimension
      .select(input_file_name()).distinct().count()

    // x-sorted: every x-slice file holds some y<2 rows → all touched;
    // z-order: low-y rows have low z and cluster into the head files
    val (zf, xf) = (filesTouched(zDir), filesTouched(xDir))
    assert(xf === 8L, s"x=$xf")
    assert(zf < xf, s"z=$zf x=$xf")
    // the layout is lossless
    assert(spark.read.parquet(zDir).filter(col("y") < 2).count() === 64)
  }

  test("compactParquet collapses a many-file table in place") {
    val dir = Files.createTempDirectory("graft_c").toString + "/t"
    val df = spark.range(1000).select(col("id"), (col("id") % 7).as("k"))
    df.repartition(20).write.parquet(dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet")) === 20)
    Layout.compactParquet(spark.read.parquet(dir), dir, targetFiles = 2)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet")) <= 2)
    val back = spark.read.parquet(dir)
    assert(back.count() === 1000)
    assert(back.agg(sum("id")).as[Long].head() === 499500L)
  }
}
