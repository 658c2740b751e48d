package graft

import org.apache.spark.sql.functions._

import graft.dedup.{ClusterLedger, Components}

class ClusterLedgerSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_clusterledger").toString

  test("two-drop append equals full connectedComponents over the union, bit-equal") {
    // d1: {1,2} {3,4} {10 singleton via self-pair}
    val d1 = Seq((1L, 2L), (3L, 4L), (10L, 10L)).toDF("a", "b")
    // d2: bridges {1,2}+{3,4} through 2-3, attaches 20 to {3,4},
    // brand-new component {5,6}
    val d2 = Seq((2L, 3L), (5L, 6L), (4L, 20L)).toDF("a", "b")
    val path = tmp()
    ClusterLedger.append(path, d1, "a", "b")
    ClusterLedger.append(path, d2, "a", "b")
    val got = ClusterLedger.labels(spark, path).as[(Long, Long)].collect().toSet
    val full = Components.connectedComponents(d1.union(d2), "a", "b")
      .as[(Long, Long)].collect().toSet
    assert(got === full)
    assert(got.contains((10L, 10L))) // self-pair singleton survives untouched
    assert(got.contains((20L, 1L))) // transitive merge reaches the global min
    assert(got.contains((5L, 5L)) && got.contains((6L, 5L)))
  }

  test("append order does not matter and a replayed drop is a no-op") {
    val d1 = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val d2 = Seq((2L, 3L), (7L, 8L)).toDF("a", "b")
    val p12 = tmp(); val p21 = tmp()
    ClusterLedger.append(p12, d1, "a", "b")
    ClusterLedger.append(p12, d2, "a", "b")
    ClusterLedger.append(p21, d2, "a", "b")
    ClusterLedger.append(p21, d1, "a", "b")
    val l12 = ClusterLedger.labels(spark, p12).as[(Long, Long)].collect().toSet
    val l21 = ClusterLedger.labels(spark, p21).as[(Long, Long)].collect().toSet
    assert(l12 === l21)
    // replay the last drop: crash-retry shape — labels unchanged, the
    // merge sees only self-edges (no cluster moves, no new ids)
    val stats = ClusterLedger.append(p12, d2, "a", "b")
    assert(stats.relabeled === 0L)
    assert(stats.newIds === 0L)
    val replayed = ClusterLedger.labels(spark, p12).as[(Long, Long)].collect().toSet
    assert(replayed === l12)
  }

  test("appends rewrite only buckets holding an affected or new id") {
    val nb = 16
    // a wide first drop: 40 singletons spread across many buckets
    val d1 = (0L until 40L).map(i => (i, i)).toDF("a", "b")
    val path = tmp()
    ClusterLedger.append(path, d1, "a", "b", numBuckets = nb)
    def bucketFiles(): Map[String, Set[String]] = {
      val root = new java.io.File(s"$path/labels")
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("bkt="))
        .map(d => d.getName ->
          d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => f.getName + ":" + f.lastModified()).toSet)
        .toMap
    }
    val before = bucketFiles()
    // second drop merges exactly two existing singletons
    val stats = ClusterLedger.append(path, Seq((7L, 23L)).toDF("a", "b"), "a", "b", numBuckets = nb)
    val after = bucketFiles()
    val rewritten = stats.rewrittenBuckets.map(b => s"bkt=$b").toSet
    assert(rewritten.size < before.size, "expected a strict subset of buckets rewritten")
    // every untouched bucket's files are byte-for-byte the same objects
    for ((bkt, files) <- before if !rewritten.contains(bkt))
      assert(after(bkt) === files, s"untouched bucket $bkt was rewritten")
    // and the labeling is still exactly the full recompute
    val got = ClusterLedger.labels(spark, path).as[(Long, Long)].collect().toSet
    val full = Components.connectedComponents(
      d1.union(Seq((7L, 23L)).toDF("a", "b")), "a", "b").as[(Long, Long)].collect().toSet
    assert(got === full)
  }

  test("a mismatched bucket count is refused loudly, never silently orphaning rows") {
    val path = tmp()
    ClusterLedger.append(path, Seq((1L, 2L)).toDF("a", "b"), "a", "b", numBuckets = 8)
    val e = intercept[IllegalArgumentException] {
      ClusterLedger.append(path, Seq((2L, 3L)).toDF("a", "b"), "a", "b", numBuckets = 4)
    }
    assert(e.getMessage.contains("numBuckets=8"))
    // the matching count still appends fine
    ClusterLedger.append(path, Seq((2L, 3L)).toDF("a", "b"), "a", "b", numBuckets = 8)
    assert(ClusterLedger.labels(spark, path).as[(Long, Long)].collect().toSet
      === Set((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("string ids work end-to-end (UTF-8 min-label order preserved)") {
    val d1 = Seq(("b", "c"), ("x", "y")).toDF("a", "b")
    val d2 = Seq(("a", "c")).toDF("a", "b") // new global min joins {b,c}
    val path = tmp()
    ClusterLedger.append(path, d1, "a", "b")
    ClusterLedger.append(path, d2, "a", "b")
    val got = ClusterLedger.labels(spark, path).as[(String, String)].collect().toSet
    assert(got === Set(("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")))
  }
}
