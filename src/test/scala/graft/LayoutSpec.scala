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

  test("ZoneMaps: pruned range read equals the plain filtered scan and touches fewer files") {
    import graft.sources.ZoneMaps
    val dir = Files.createTempDirectory("graft_zm").toString + "/t"
    val df = spark.range(10000)
      .select(col("id").as("k"), (col("id") % 97).as("v"))
      .repartition(13) // random layout in, clustered layout out
    ZoneMaps.writeClustered(df, dir, numPartitions = 10, orderBy = "k")

    val pruned = ZoneMaps.readRange(spark, dir, "k", 2000L, 2499L)
    val plain = spark.read.parquet(dir).filter(col("k") >= 2000 && col("k") <= 2499)
    assert(pruned.orderBy("k").as[(Long, Long)].collect().toSeq ===
      plain.orderBy("k").as[(Long, Long)].collect().toSeq)
    // 500 of 10000 clustered keys live in 1-2 of the 10 zone files
    assert(pruned.inputFiles.length < spark.read.parquet(dir).inputFiles.length,
      s"pruned=${pruned.inputFiles.length}")
    assert(pruned.inputFiles.length <= 2)
  }

  test("ZoneMaps: empty overlap yields zero rows; missing manifest degrades to a full scan") {
    import graft.sources.ZoneMaps
    val dir = Files.createTempDirectory("graft_zm2").toString + "/t"
    val df = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("v"))
    ZoneMaps.writeClustered(df, dir, numPartitions = 4, orderBy = "k")

    val none = ZoneMaps.readRange(spark, dir, "k", 5000L, 6000L)
    assert(none.count() === 0)
    assert(none.schema.fieldNames.toSeq === Seq("k", "v"))

    // manifest removed → same rows via the fallback filtered scan
    def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }
    rm(new java.io.File(dir, "_zonemap"))
    val back = ZoneMaps.readRange(spark, dir, "k", 10L, 19L)
    assert(back.as[(Long, Long)].collect().toSet === (10L to 19L).map(k => (k, k * 2)).toSet)
  }

  test("ZoneMaps: the underscore manifest dir is invisible to plain readers") {
    import graft.sources.ZoneMaps
    val dir = Files.createTempDirectory("graft_zm3").toString + "/t"
    val df = spark.range(50).select(col("id").as("k"), lit("x").as("s"))
    ZoneMaps.writeClustered(df, dir, numPartitions = 2, orderBy = "k")
    // a reader that has never heard of zone maps sees exactly the data
    val plain = spark.read.parquet(dir)
    assert(plain.count() === 50)
    assert(plain.schema.fieldNames.toSeq === Seq("k", "s"))
  }
}
