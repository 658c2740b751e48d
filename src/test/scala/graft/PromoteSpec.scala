package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.quality.Validate
import graft.sources.Versioned
import graft.sources.Versioned.DiffGate

/** Write-audit-publish promotion (SURVEY.md §2.2/22bh): a failed
  * audit must leave the live pointer untouched, readers must never
  * observe a half-written or unvalidated version, vacuum must keep
  * the in-flight-reader grace set. */
class PromoteSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_promote").toString + "/corpus"

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private val checks = Seq(
    Validate.NotNull("id_not_null", col("doc_id")),
    Validate.Unique("id_unique", Seq(col("doc_id"))))

  test("first promotion publishes v00001 and read returns it") {
    val root = freshRoot()
    val r = Versioned.promote(docs(1L -> "a", 2L -> "b"), root, checks)
    assert(r.promoted && r.version === 1 && r.path === "v00001")
    assert(r.violations.forall(_._2 == 0L))
    assert(Versioned.currentManifest(root).map(_.path) === Some("v00001"))
    assert(Versioned.read(spark, root).count() === 2)
  }

  test("failed validation leaves the live pointer untouched and clears staging") {
    val root = freshRoot()
    assert(Versioned.promote(docs(1L -> "a", 2L -> "b"), root, checks).promoted)
    val bad = Seq((1L, "x"), (1L, "dup")).toDF("doc_id", "text")
    val r = Versioned.promote(bad, root, checks)
    assert(!r.promoted)
    assert(r.reason.exists(_.contains("id_unique")))
    // pointer still v1, data still the good corpus
    assert(Versioned.currentManifest(root).map(_.version) === Some(1))
    assert(Versioned.read(spark, root).orderBy("doc_id").as[(Long, String)].collect()
      === Array(1L -> "a", 2L -> "b"))
    // no staging or half-published directory remains
    val leftovers = new File(root).listFiles().map(_.getName)
      .filter(n => n.startsWith("_staging") || n == "v00002")
    assert(leftovers.isEmpty, leftovers.toSeq)
  }

  test("diff gate refuses a rebuild that moves too much of the live corpus") {
    val root = freshRoot()
    assert(Versioned.promote(docs(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"),
      root, checks).promoted)
    // half the keys changed → 500 per mille > 100 allowed
    val churn = docs(1L -> "A!", 2L -> "B!", 3L -> "c", 4L -> "d")
    val r = Versioned.promote(churn, root, checks,
      Some(DiffGate("doc_id", "text", maxChangedPerMille = 100L)))
    assert(!r.promoted && r.reason.exists(_.contains("diff gate")))
    assert(r.diffStats.toMap.getOrElse("changed", 0L) === 2L)
    assert(Versioned.currentManifest(root).map(_.version) === Some(1))
    // an additive drop under the threshold sails through
    val grow = docs(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d", 5L -> "e")
    val r2 = Versioned.promote(grow, root, checks,
      Some(DiffGate("doc_id", "text", maxChangedPerMille = 100L)))
    assert(r2.promoted && r2.version === 2)
    assert(Versioned.read(spark, root).count() === 5)
  }

  test("an in-flight reader of the previous version survives a promotion") {
    val root = freshRoot()
    assert(Versioned.promote(docs(1L -> "a", 2L -> "b"), root, checks).promoted)
    val inFlight = Versioned.read(spark, root) // resolves the v1 manifest NOW
    assert(Versioned.promote(docs(10L -> "x", 11L -> "y", 12L -> "z"),
      root, checks).promoted)
    // new readers see v2; the v1 plan still scans intact v1 files
    assert(Versioned.read(spark, root).count() === 3)
    assert(inFlight.count() === 2)
    assert(inFlight.orderBy("doc_id").as[(Long, String)].collect()
      === Array(1L -> "a", 2L -> "b"))
  }

  test("rollback publishes the old data as a NEW version — history is never rewritten") {
    val root = freshRoot()
    assert(Versioned.promote(docs(1L -> "a"), root, checks).promoted)
    assert(Versioned.promote(docs(1L -> "a", 2L -> "b"), root, checks).promoted)
    val m = Versioned.rollback(root)
    // the rollback IS version 3, pointing at v1's directory
    assert(m.version === 3 && m.path === "v00001")
    assert(Versioned.read(spark, root).count() === 1)
    // the chain shows all three publishes; v2's entry is untouched
    assert(Versioned.versions(root).map(m => (m.version, m.path))
      === Seq((1, "v00001"), (2, "v00002"), (3, "v00001")))
    // the rolled-back-from data is still time-travel readable
    assert(Versioned.readVersion(spark, root, 2).count() === 2)
    // the next promotion continues the chain with fresh data
    val r = Versioned.promote(docs(1L -> "a", 9L -> "i"), root, checks)
    assert(r.promoted && r.version === 4)
    assert(Versioned.read(spark, root).orderBy("doc_id").as[(Long, String)].collect()
      === Array(1L -> "a", 9L -> "i"))
  }

  test("readVersion time-travels through the manifest chain") {
    val root = freshRoot()
    for (i <- 1 to 3)
      assert(Versioned.promote(docs((1L to i.toLong).map(j => j -> s"d$j"): _*),
        root, checks).promoted)
    assert(Versioned.readVersion(spark, root, 1).count() === 1)
    assert(Versioned.readVersion(spark, root, 2).count() === 2)
    assert(Versioned.readVersion(spark, root, 3).count() === 3)
    val e = intercept[RuntimeException](Versioned.readVersion(spark, root, 9))
    assert(e.getMessage.contains("never published"))
  }

  test("targeted rollback re-publishes any retained version by number") {
    val root = freshRoot()
    for (i <- 1 to 3)
      assert(Versioned.promote(docs((1L to i.toLong).map(j => j -> s"d$j"): _*),
        root, checks).promoted)
    val m = Versioned.rollback(root, toVersion = 1)
    assert(m.version === 4 && m.path === "v00001")
    assert(Versioned.read(spark, root).count() === 1)
    intercept[IllegalArgumentException](Versioned.rollback(root, toVersion = 4))
  }

  test("vacuum keeps live + previous + the retention window, drops the rest") {
    val root = freshRoot()
    for (i <- 1 to 5)
      assert(Versioned.promote(docs((1L to i.toLong).map(j => j -> s"d$j"): _*),
        root, checks).promoted)
    val dropped = Versioned.vacuum(root, retainLast = 2)
    assert(dropped === Seq("v00001", "v00002", "v00003"))
    val dirs = new File(root).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("v00004", "v00005"))
    assert(Versioned.read(spark, root).count() === 5)
    // vacuumed versions stay in the chain and fail loudly, not blindly
    assert(Versioned.versions(root).map(_.version) === Seq(1, 2, 3, 4, 5))
    val e = intercept[IllegalArgumentException](Versioned.readVersion(spark, root, 1))
    assert(e.getMessage.contains("vacuumed"))
    // the one-step rollback target (previous = v00004) survived
    Versioned.rollback(root)
    assert(Versioned.read(spark, root).count() === 4)
    intercept[IllegalArgumentException](Versioned.vacuum(root, retainLast = 0))
  }

  test("a stale staging directory from a crashed promotion is cleared") {
    val root = freshRoot()
    assert(Versioned.promote(docs(1L -> "a"), root, checks).promoted)
    val stale = new File(root, "_staging_v00002")
    stale.mkdirs()
    Files.write(new File(stale, "garbage").toPath, Array[Byte](1, 2, 3))
    val r = Versioned.promote(docs(1L -> "a", 2L -> "b"), root, checks)
    assert(r.promoted && r.version === 2)
    assert(Versioned.read(spark, root).count() === 2)
  }
}
