package graft

/** Manual drive mirroring the reference's OWN test suite
  * (reference tests/test_partition.py, test_partitions.py) against the
  * graft CLI: count, map-extract, reduce-sum, split_by_key's
  * key-mod-n bucket invariant, and coalesce by records-per-partition.
  * Run: sbt "Test/runMain graft.DriveShmrParity"
  */
object DriveShmrParity {
  def main(args: Array[String]): Unit = {
    val tmp = "/tmp/drive_shmr_parity"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    new java.io.File(tmp).mkdirs()

    // synthesize a people.csv like the reference fixture: 100 rows,
    // columns (id, first, last, age); deterministic ages
    val ages = (0 until 100).map(i => 18 + (i * 37) % 60)
    val csv = "id,first,last,age\n" + ages.zipWithIndex
      .map { case (a, i) => s"$i,fn$i,ln$i,$a" }.mkString("\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$tmp/people.csv"), csv)
    val expectedSum = ages.map(_.toLong).sum

    // test_count: partition.count → 100
    Cli.main(Array("-i", s"$tmp/people.csv", "-f", "csv",
      "--schema", "id long, first string, last string, age long",
      "partition.count", "--outfile", s"$tmp/count.txt"))
    val n = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$tmp/count.txt")).trim
    println(s"COUNT=$n") // expect 100

    // test_map + test_reduce: extract age, sum it
    Cli.main(Array("-i", s"$tmp/people.csv", "-f", "csv",
      "--schema", "id long, first string, last string, age long",
      "partition.reduce", "--aggs", "sum(age) AS s", "--outfile", s"$tmp/sum"))
    // test_split_by_key: bucket = age % 5, one directory per bucket
    Cli.main(Array("-i", s"$tmp/people.csv", "-f", "csv",
      "--schema", "id long, first string, last string, age long",
      "partition.split_by_key", "--key", "age", "--num-partitions", "5",
      "--outfile", s"$tmp/split"))
    // test_coalesce: 100 records / 50 per partition → 2 files
    Cli.main(Array("-i", s"$tmp/people.csv", "-f", "csv",
      "--schema", "id long, first string, last string, age long",
      "partitions.coalesce", "--records-per-partition", "50",
      "--outfile", s"$tmp/co"))

    locally {
      val spark = GraftSession.builder("verify-parity", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import org.apache.spark.sql.functions._
      val s = graft.sources.PartitionedFiles.readCsv(spark, s"$tmp/sum", header = true, Some("s long"))
        .head().getLong(0)
      println(s"SUM=$s EXPECT=$expectedSum")
      // split invariant: every row in bucket=b has age % 5 == b
      val bad = graft.sources.PartitionedFiles
        .readJsonl(spark, s"$tmp/split/bucket=*",
          Some("id long, first string, last string, age long"))
        .withColumn("bucket",
          regexp_extract(input_file_name(), "bucket=(\\d+)", 1).cast("long"))
        .filter(pmod(col("age"), lit(5)) =!= col("bucket")).count()
      println(s"SPLIT_VIOLATIONS=$bad") // expect 0
      val coFiles = new java.io.File(s"$tmp/co").listFiles()
        .count(_.getName.endsWith(".csv"))
      println(s"CO_FILES=$coFiles") // expect 2
      spark.stop()
    }
  }
}
