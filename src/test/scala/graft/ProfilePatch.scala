package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Versioned

// scratch: the merge-on-read scale claim measured head-to-head.
// At x1/x4/x16 of sf0.1 documents (ProfileScaleUp.amplify — rotated
// copies, genuinely new content), a CONSTANT-SIZE scattered drop
// (every 997th doc_id of the x1 id range — touches every bucket, the
// merge-unfriendly shape) is applied to an identical pre-published
// 16-bucket warehouse twice: once as a MERGE (survivor rewrite of
// every touched bucket — cost grows with the corpus) and once as a
// PATCH (delta layer — cost is O(drop), must stay FLAT). Also timed:
// the reconciled read after the patch vs the plain read (the read
// amplification a pending layer costs) and the fold that clears it.
// sbt "Test/runMain graft.ProfilePatch" → dev/scaleup_patch_r15.json
object ProfilePatch {

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("prof-patch", "local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val factors = Seq(1, 4, 16)
    val dirs = factors.map(m => m -> ProfileScaleUp.amplify(spark, m)).toMap

    def publish(dir: String): (String, DataFrame) = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("source"), col("text"))
      val root = java.nio.file.Files.createTempDirectory("prof_patch").toString + "/t"
      require(Versioned.promoteBucketed(docs, root, "doc_id", 16).promoted)
      (root, docs)
    }
    // constant-size drop regardless of amplification: x1-range ids only
    def mkDrop(docs: DataFrame): DataFrame =
      docs.filter(col("doc_id") < 10000000L && pmod(col("doc_id"), lit(997)) === 0)
        .select(col("doc_id"), col("source"),
          concat(col("text"), lit(" v2")).as("text"), lit(false).as("del"))

    // JIT warmup on the largest scale, both paths
    locally {
      val (r1, d1) = publish(dirs(16)); val dr = mkDrop(d1)
      require(Versioned.merge(dr, r1, deleted = col("del")).merged)
      val (r2, d2) = publish(dirs(16))
      require(Versioned.patch(mkDrop(d2), r2, deleted = col("del")).patched)
      Versioned.read(spark, r2).count()
      require(Versioned.foldDeltas(spark, r2).merged)
    }

    case class Row(m: Int, dropRows: Long, mergeS: Double, patchS: Double,
      readPlainS: Double, readPatchedS: Double, foldS: Double)
    val rows = for (m <- factors) yield {
      val (mergeRoot, docs) = publish(dirs(m))
      val (patchRoot, _) = publish(dirs(m))
      val drop = mkDrop(docs).localCheckpoint()
      val n = drop.count()
      val mergeS = time { require(Versioned.merge(drop, mergeRoot, deleted = col("del")).merged) }
      val patchS = time { require(Versioned.patch(drop, patchRoot, deleted = col("del")).patched) }
      val readPlainS = time { Versioned.read(spark, mergeRoot).count() }
      val readPatchedS = time { Versioned.read(spark, patchRoot).count() }
      val foldS = time { require(Versioned.foldDeltas(spark, patchRoot).merged) }
      println(f"x$m%-3d drop=$n%6d merge=$mergeS%7.2fs patch=$patchS%7.2fs " +
        f"read(plain)=$readPlainS%6.2fs read(patched)=$readPatchedS%6.2fs fold=$foldS%7.2fs")
      Row(m, n, mergeS, patchS, readPlainS, readPatchedS, foldS)
    }

    def alpha(lo: Double, hi: Double): Double = math.log(hi / lo) / math.log(4.0)
    val Seq(r1, r4, r16) = rows
    val json =
      s"""{"drop_rows": ${r1.dropRows},
         | "merge_s":        {"x1": ${r1.mergeS}, "x4": ${r4.mergeS}, "x16": ${r16.mergeS}, "alpha_4_16": ${alpha(r4.mergeS, r16.mergeS)}},
         | "patch_s":        {"x1": ${r1.patchS}, "x4": ${r4.patchS}, "x16": ${r16.patchS}, "alpha_4_16": ${alpha(r4.patchS, r16.patchS)}},
         | "read_plain_s":   {"x1": ${r1.readPlainS}, "x4": ${r4.readPlainS}, "x16": ${r16.readPlainS}},
         | "read_patched_s": {"x1": ${r1.readPatchedS}, "x4": ${r4.readPatchedS}, "x16": ${r16.readPatchedS}},
         | "fold_s":         {"x1": ${r1.foldS}, "x4": ${r4.foldS}, "x16": ${r16.foldS}}}""".stripMargin
    val out = sys.env.getOrElse("SCALEUP_OUT", "dev/scaleup_patch_r15.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(s"wrote $out")
    spark.stop()
  }
}
