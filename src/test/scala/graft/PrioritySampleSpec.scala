package graft

import org.apache.spark.sql.functions._

import graft.sketch.Sketches

/** Priority sampling (Duffield–Lund–Thorup): the distributed
  * TakeOrdered formulation must equal a literal single-threaded
  * replay of the scaled-priority math, and the Horvitz–Thompson
  * structure must hold (τ binds, estimates floor at w·2^28,
  * Σ estimates tracks the true total). */
class PrioritySampleSpec extends SparkSpecBase {
  import spark.implicits._

  private val Scale = 1L << 28

  /** Literal reference: same md5 draw, same scaled priority, same
    * (pri desc, key asc) order, computed sequentially. */
  private def reference(rows: Seq[(Long, Long)], k: Int): (Seq[(Long, Long, Long)], Long) = {
    val pri = rows.filter(_._2 >= 1).map { case (key, w) =>
      val md5hex = java.security.MessageDigest.getInstance("MD5")
        .digest(key.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString.take(7)
      val u = java.lang.Long.parseLong(md5hex, 16) % Scale + 1
      (key, w, (w * Scale) / u)
    }.sortBy { case (key, _, p) => (-p, key) }
    val tau = if (pri.size > k) pri(k)._3 else 0L
    (pri.take(k), tau)
  }

  test("distributed selection equals the sequential replay on random weights") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 300L).map(i => (i, 1L + rnd.nextInt(5000).toLong))
    val df = rows.toDF("id", "wt")
    val got = Sketches.prioritySample(df, col("id"), col("wt"), k = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val (want, tau) = reference(rows, 25)
    assert(got.map(t => (t._1, t._2, t._3)).toSeq === want)
    assert(got.forall(_._4 === tau), "every row carries the same threshold")
    assert(got.forall(t => t._5 === math.max(t._2, tau)), "estimate = max(w, tau)")
    // HT sanity: the estimated total tracks the true total within a
    // loose factor — unbiasedness is in expectation, but a
    // deterministic draw this size should land well inside 2x
    val estTotal = got.map(_._5).sum.toDouble
    val trueTotal = rows.map(_._2).sum.toDouble
    assert(estTotal > trueTotal / 2 && estTotal < trueTotal * 2,
      s"est $estTotal vs true $trueTotal")
  }

  test("k >= n returns everything with tau = 0 and exact estimates") {
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "wt")
    val got = Sketches.prioritySample(df, col("id"), col("wt"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(got.length === 3)
    assert(got.forall(_._3 === 0L))
    assert(got.forall(t => t._4 === t._2), "tau=0 → estimate is exact")
  }

  test("per-group sampling equals the global operator run on each group alone") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 240L).map(i => (s"g${i % 3}", i, 1L + rnd.nextInt(5000).toLong))
    val df = rows.toDF("g", "id", "wt").repartition(16)
    val got = Sketches.groupPrioritySample(df, col("g"), col("id"), col("wt"), k = 12)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(t => (t._1, -t._4, t._2))
    val want = rows.map(_._1).distinct.sorted.flatMap { g =>
      Sketches.prioritySample(
          rows.filter(_._1 == g).map(t => (t._2, t._3)).toDF("id", "wt"),
          col("id"), col("wt"), k = 12)
        .collect()
        .map(r => (g, r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(t => (-t._4, t._2))
    }
    assert(got.toSeq === want.toSeq) // same priorities, τ and estimates per group, bit-equal
  }

  test("non-positive weights are excluded by contract") {
    val df = Seq((1L, 5L), (2L, 0L), (3L, -4L)).toDF("id", "wt")
    val got = Sketches.prioritySample(df, col("id"), col("wt"), k = 5)
      .select("key").as[Long].collect().toSet
    assert(got === Set(1L))
  }

  test("weights past 2^35 sample exactly while the priority fits a long") {
    // r9 advice: w·2^28 used to wrap silently in non-ANSI mode for
    // w ≥ 2^35. The decomposed priority (w div u)·2^28 + ((w mod u)·
    // 2^28) div u handles any weight whose TRUE priority fits BIGINT —
    // check it against exact BigInt math well past the old ceiling.
    val ws = Seq(1L << 36, (1L << 40) + 12345L, 3L * (1L << 38), 7L)
    val df = ws.zipWithIndex.map { case (w, i) => (i.toLong + 1, w) }.toDF("id", "wt")
    val got = Sketches.prioritySample(df, col("id"), col("wt"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    ws.zipWithIndex.foreach { case (w, i) =>
      val key = i.toLong + 1
      val md5hex = java.security.MessageDigest.getInstance("MD5")
        .digest(key.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString.take(7)
      val u = java.lang.Long.parseLong(md5hex, 16) % Scale + 1
      val want = (BigInt(w) * Scale / u).toLong
      assert(got(key) === want, s"key=$key w=$w")
    }
  }

  test("a priority past 2^63 raises loudly instead of wrapping") {
    // w div u >= 2^35 ⟺ true priority >= 2^63: must be an error, not
    // a silently negative priority corrupting τ and the HT estimates
    val df = Seq((1L, Long.MaxValue)).toDF("id", "wt") // any u keeps w/u >= 2^35
    val e = intercept[Exception] {
      Sketches.prioritySample(df, col("id"), col("wt"), k = 1).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("overflows BIGINT")), e.toString)
  }
}
