package graft

import org.apache.spark.sql.functions._

import graft.operators.TableDiff

class TableDiffSpec extends SparkSpecBase {
  import spark.implicits._

  test("distributionDrift: zero where shares match, signed where they diverge") {
    // ref: 6 in bucket 0, 2 in bucket 1 (75/25); new: 2 and 2 (50/50)
    val ref = (Seq.fill(6)(0L) ++ Seq.fill(2)(1L)).toDF("b")
    val neu = (Seq.fill(2)(0L) ++ Seq.fill(2)(1L)).toDF("b")
    val out = TableDiff.distributionDrift(ref, neu, col("b"), col("b"))
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // drift = n_new·T_ref − n_ref·T_new: bucket0 2·8−6·4 = −8 (under-
    // represented in the drop), bucket1 2·8−2·4 = +8; shares 750/500, 250/500
    assert(out.toSeq === Seq(
      (0L, 6L, 2L, 750L, 500L, -8L),
      (1L, 2L, 2L, 250L, 500L, 8L)))
    assert(out.map(_._6).sum === 0L, "drift sums to zero across buckets")
    // identical distributions → all-zero drift
    val same = TableDiff.distributionDrift(ref, ref, col("b"), col("b"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(same.forall(_._6 === 0L))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val neu = Seq((2L, "b"), (3L, "c2"), (5L, "e")).toDF("doc_id", "text")
    val out = TableDiff.snapshotDiff(old, neu,
      col("doc_id"), col("doc_id"), col("text"), col("text"), keyName = "doc_id")
      .as[(Long, String)].collect().toSet
    assert(out === Set(
      (1L, "removed"), (2L, "unchanged"), (3L, "changed"), (5L, "added")))
  }

  test("snapshotDiff: null content is a value, not a missing row") {
    // null fingerprints must not masquerade as absent rows — presence
    // is tracked separately, content compares null-safe
    val old = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("doc_id", "text")
    val neu = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("doc_id", "text")
    val out = TableDiff.snapshotDiff(old, neu,
      col("doc_id"), col("doc_id"), col("text"), col("text"))
      .as[(Long, String)].collect().toSet
    assert(out === Set((1L, "unchanged"), (2L, "changed")))
  }

  test("snapshotDiff matches a brute-force reference on random snapshots") {
    val rnd = new scala.util.Random(7)
    def snap() = (1L to 120L).flatMap { k =>
      if (rnd.nextInt(4) == 0) None
      else Some(k -> (if (rnd.nextInt(5) == 0) null else s"v${rnd.nextInt(3)}"))
    }.toMap
    val oldM = snap(); val newM = snap()
    val expected = (oldM.keySet ++ newM.keySet).map { k =>
      val st = (oldM.get(k), newM.get(k)) match {
        case (None, Some(_))          => "added"
        case (Some(_), None)          => "removed"
        case (Some(a), Some(b))       => if (a == b) "unchanged" else "changed"
        case (None, None)             => sys.error("unreachable")
      }
      (k, st)
    }
    val out = TableDiff.snapshotDiff(
      oldM.toSeq.toDF("doc_id", "text"), newM.toSeq.toDF("doc_id", "text"),
      col("doc_id"), col("doc_id"), col("text"), col("text"), keyName = "doc_id")
      .as[(Long, String)].collect().toSet
    assert(out === expected)
  }

  test("snapshotDiff resolves per-side columns with different names") {
    // the two snapshots need not share column names — per-side Column
    // params resolve against their own frame
    val old = Seq((1L, "a")).toDF("id_v1", "body_v1")
    val neu = Seq((1L, "a"), (2L, "b")).toDF("id_v2", "body_v2")
    val out = TableDiff.snapshotDiff(old, neu,
      col("id_v1"), col("id_v2"), col("body_v1"), col("body_v2"), keyName = "k")
      .as[(Long, String)].collect().toSet
    assert(out === Set((1L, "unchanged"), (2L, "added")))
  }

  test("snapshotDiffStats aggregates status counts") {
    val old = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val neu = Seq((2L, "b2"), (3L, "c")).toDF("doc_id", "text")
    val stats = TableDiff.snapshotDiffStats(TableDiff.snapshotDiff(old, neu,
      col("doc_id"), col("doc_id"), col("text"), col("text")))
      .as[(String, Long)].collect().toMap
    assert(stats === Map("removed" -> 1L, "changed" -> 1L, "added" -> 1L))
  }
}
