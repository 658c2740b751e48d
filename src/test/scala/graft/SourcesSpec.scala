package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.PartitionedFiles

class SourcesSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_src").toString

  private def sample = Seq((1L, "ann", 30), (2L, "bob", 25), (3L, "cat", 40)).toDF("id", "name", "age")

  test("jsonl round-trip with meta sidecar") {
    val dir = tmp() + "/out"
    PartitionedFiles.writeJsonl(sample, dir, numPartitions = 2)
    val back = PartitionedFiles.readJsonl(spark, dir, Some("id long, name string, age long"))
    assert(back.select("id", "name").as[(Long, String)].collect().toSet ===
      Set((1L, "ann"), (2L, "bob"), (3L, "cat")))
    assert(PartitionedFiles.readMetaCount(dir) === Some(3L))
  }

  test("gzipped jsonl reads transparently (shmr get_open_fn parity)") {
    val dir = tmp() + "/gz"
    PartitionedFiles.writeJsonl(sample, dir, numPartitions = 1, codec = Some("gzip"))
    assert(new java.io.File(dir).listFiles().exists(_.getName.endsWith(".json.gz")))
    val back = PartitionedFiles.readJsonl(spark, dir, Some("id long, name string, age long"))
    assert(back.count() === 3)
  }

  test("csv round-trip with header (skip_nrows=1 parity)") {
    val dir = tmp() + "/csv"
    PartitionedFiles.writeCsv(sample, dir, numPartitions = 1, header = true)
    val back = PartitionedFiles.readCsv(spark, dir, header = true, Some("id long, name string, age int"))
    assert(back.as[(Long, String, Int)].collect().toSet === Set((1L, "ann", 30), (2L, "bob", 25), (3L, "cat", 40)))
    assert(PartitionedFiles.readMetaCount(dir) === Some(3L))
  }

  test("text round-trip") {
    val dir = tmp() + "/txt"
    PartitionedFiles.writeText(sample.select(concat_ws(",", col("id"), col("name")).as("value")), dir, 1)
    val back = PartitionedFiles.readText(spark, dir)
    assert(back.as[String].collect().toSet === Set("1,ann", "2,bob", "3,cat"))
  }

  test("parquet and orc round-trip with typed schema and meta sidecar") {
    for ((fmt, write, read) <- Seq[(String,
        (org.apache.spark.sql.DataFrame, String, Int) => Unit,
        String => org.apache.spark.sql.DataFrame)](
      ("parquet", (d, p, n) => PartitionedFiles.writeParquet(d, p, n), p => PartitionedFiles.readParquet(spark, p)),
      ("orc", (d, p, n) => PartitionedFiles.writeOrc(d, p, n), p => PartitionedFiles.readOrc(spark, p)))) {
      val dir = tmp() + s"/$fmt"
      write(sample, dir, 2)
      val back = read(dir)
      assert(back.schema.map(f => (f.name, f.dataType)).toSet ===
        sample.schema.map(f => (f.name, f.dataType)).toSet, fmt)
      assert(back.select("id", "age").as[(Long, Int)].collect().toSet ===
        Set((1L, 30), (2L, 25), (3L, 40)), fmt)
      assert(PartitionedFiles.readMetaCount(dir) === Some(3L), fmt)
    }
  }

  test("readMetaCount absent returns None") {
    assert(PartitionedFiles.readMetaCount(tmp()) === None)
  }

  test("meta sidecar lists every part file, executor-assembled") {
    // multi-file output: the sidecar must carry one entry per data
    // file, counts summing to the total — assembled via the
    // single-partition distributed write (no driver-side collect of
    // the file list), then promoted to its sidecar name
    val dir = tmp() + "/multi"
    val df = spark.range(100).select(col("id"), (col("id") % 7).as("grp"))
    PartitionedFiles.writeParquet(df, dir, numPartitions = 4)
    val sidecar = new java.io.File(dir, "_graft_meta.json")
    assert(sidecar.exists())
    val s = Files.readString(sidecar.toPath)
    val fileEntries = """"file": "([^"]+)", "n_records": (\d+)""".r.findAllMatchIn(s).toList
    assert(fileEntries.length === 4, s)
    assert(fileEntries.map(_.group(2).toLong).sum === 100L)
    fileEntries.foreach(m => assert(m.group(1).startsWith("part-"), s))
    assert(PartitionedFiles.readMetaCount(dir) === Some(100L))
    // the tmp write dir is cleaned up
    assert(!new java.io.File(dir, "_graft_meta_tmp").exists())
  }

  test("sorted parquet export: disjoint ordered ranges per file, no global sort") {
    val dir = tmp() + "/sorted"
    val df = spark.range(1000).select((col("id") * 7919 % 1000).as("k"), col("id").as("v"))
    PartitionedFiles.writeSortedParquet(df.toDF(), dir, numPartitions = 4, Seq("k"))
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length === 4)
    // each file internally sorted; file ranges strictly ordered
    val ranges = files.map { f =>
      val ks = spark.read.parquet(f.getAbsolutePath).select("k").as[Long].collect()
      assert(ks.sameElements(ks.sorted), f.getName)
      (ks.head, ks.last)
    }
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) => assert(hi <= lo) }
    // the whole dataset survives
    assert(spark.read.parquet(dir).count() === 1000)
  }

  test("readJsonlAudit keeps malformed lines in _corrupt_record") {
    val dir = java.nio.file.Files.createTempDirectory("graft_audit").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/part-0.jsonl"),
      """{"id": 1, "v": "ok"}
        |{"id": 2 "v": "missing comma"}
        |{"id": 3, "v": "ok"}
        |not json at all
        |{"id": 5, "v": "ok"}
        |""".stripMargin)
    // collect once: Spark disallows scans whose only referenced column
    // is the corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    val rows = PartitionedFiles.readJsonlAudit(spark, dir, "id BIGINT, v STRING")
      .select("id", "v", "_corrupt_record")
      .as[(Option[Long], Option[String], Option[String])].collect().toSet
    val good = rows.collect { case (Some(id), Some(v), None) => (id, v) }
    assert(good === Set((1L, "ok"), (3L, "ok"), (5L, "ok")))
    val bad = rows.collect { case (_, _, Some(c)) => c }
    assert(bad === Set("""{"id": 2 "v": "missing comma"}""", "not json at all"))
    // corrupt rows carry null data columns (Spark PERMISSIVE contract)
    assert(rows.forall { case (id, _, c) => c.isEmpty || id.isEmpty })
  }

  test("hive-partitioned parquet prunes non-matching directories at plan time") {
    val dir = tmp() + "/hive"
    val df = Seq((1L, "en", 10), (2L, "en", 20), (3L, "de", 30), (4L, "fr", 40))
      .toDF("id", "lang", "v")
    PartitionedFiles.writeParquetPartitionedBy(df, dir, Seq("lang"))
    // layout: one directory per partition value
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs === Set("lang=en", "lang=de", "lang=fr"))

    val back = PartitionedFiles.readParquetPartitioned(spark, dir)
      .filter(col("lang") === "en")
    // the predicate must land as a PartitionFilters entry on the scan,
    // not a post-scan Filter: non-matching directories are never opened
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"), plan)
    assert(back.select("id", "v").as[(Long, Int)].collect().toSet ===
      Set((1L, 10), (2L, 20)))
    // partition pruning leaves only lang=en files in the actual scan
    val scannedFiles = back.select(input_file_name()).distinct().as[String].collect()
    assert(scannedFiles.nonEmpty && scannedFiles.forall(_.contains("lang=en")))
  }

  test("shmrLayout: literal {auto:05d} names, delete-on-empty, sidecar rewritten") {
    val dir = java.nio.file.Files.createTempDirectory("shmr_layout").toString
    val df = spark.range(6).toDF("id").withColumn("v", col("id") * 10)
      .repartition(8) // more partitions than rows
    PartitionedFiles.writeJsonl(df, dir, 8)
    // Spark's lazy file creation already skips record-less partitions
    // (shmr's delete_on_empty is inherently satisfied for
    // Spark-written output) — deleteEmpty matters for files an
    // EXTERNAL producer left behind; simulate one
    val before = new java.io.File(dir).listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(before <= 6, "empty partitions must not produce files")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "external-empty.json"), "")
    val finalNames = PartitionedFiles.shmrLayout(dir, "chunk-{auto}", deleteEmpty = true)
    // the record-less external file is gone; survivors renamed
    assert(finalNames.nonEmpty && finalNames.length === before)
    assert(!new java.io.File(dir, "external-empty.json").exists())
    assert(finalNames.zipWithIndex.forall { case (n, i) => n.startsWith(f"chunk-$i%05d") })
    val onDisk = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.getName).sorted
    assert(onDisk.toSeq === finalNames.sorted)
    // sidecar rewritten to the new names; count and data intact
    assert(PartitionedFiles.readMetaCount(dir) === Some(6L))
    val meta = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "_graft_meta.json"))
    finalNames.foreach(n => assert(meta.contains(n), s"sidecar missing $n"))
    val back = PartitionedFiles.readJsonl(spark, dir, Some("id long, v long"))
    assert(back.as[(Long, Long)].collect().toSet === (0L until 6L).map(i => (i, i * 10)).toSet)
    // a counterless template over multiple files must refuse, not overwrite
    if (finalNames.length > 1) {
      val ex = intercept[IllegalArgumentException] {
        PartitionedFiles.shmrLayout(dir, "fixed.jsonl")
      }
      assert(ex.getMessage.contains("collides"))
    }
  }

  test("shmrLayout: two-phase rename survives a target equal to another source's name") {
    // the data-loss scenario the staging exists for: 'aaa.json' maps to
    // 'part-00000.json' — the CURRENT name of the other source. A
    // direct move would overwrite it before its own rename.
    val dir = java.nio.file.Files.createTempDirectory("shmr_swap")
    java.nio.file.Files.writeString(dir.resolve("aaa.json"), """{"k": "first"}""")
    java.nio.file.Files.writeString(dir.resolve("part-00000.json"), """{"k": "second"}""")
    val out = PartitionedFiles.shmrLayout(dir.toString, "part-{auto}")
    assert(out === Seq("part-00000.json", "part-00001.json"))
    // both payloads survive, mapped in lexicographic source order
    assert(java.nio.file.Files.readString(dir.resolve("part-00000.json")).contains("first"))
    assert(java.nio.file.Files.readString(dir.resolve("part-00001.json")).contains("second"))
    // no stage debris left behind
    assert(!new java.io.File(dir.toString).listFiles()
      .exists(_.getName.startsWith(".__graft_stage_")))
  }

  test("shmrLayout: refuses a target that equals an untouched (non-renamed) file") {
    val dir = java.nio.file.Files.createTempDirectory("shmr_clash")
    java.nio.file.Files.writeString(dir.resolve("a.json"), """{"k": 1}""")
    java.nio.file.Files.writeString(dir.resolve("_notes.json"), "do not overwrite")
    val ex = intercept[IllegalArgumentException] {
      PartitionedFiles.shmrLayout(dir.toString, "_notes")
    }
    assert(ex.getMessage.contains("overwrite"))
    // nothing moved, nothing lost
    assert(java.nio.file.Files.readString(dir.resolve("_notes.json")) === "do not overwrite")
    assert(java.nio.file.Files.readString(dir.resolve("a.json")).contains("1"))
  }

  test("shmrLayout: refuses to run over leftover stage files from an interrupted pass") {
    val dir = java.nio.file.Files.createTempDirectory("shmr_stage")
    java.nio.file.Files.writeString(dir.resolve("a.json"), """{"k": 1}""")
    java.nio.file.Files.writeString(dir.resolve(".__graft_stage_00000"), """{"k": "stranded"}""")
    val ex = intercept[IllegalArgumentException] {
      PartitionedFiles.shmrLayout(dir.toString, "part-{auto}")
    }
    assert(ex.getMessage.contains("interrupted"))
    // the stranded data file is preserved for manual recovery
    assert(java.nio.file.Files.readString(dir.resolve(".__graft_stage_00000")).contains("stranded"))
    assert(java.nio.file.Files.readString(dir.resolve("a.json")).contains("1"))
  }
}
