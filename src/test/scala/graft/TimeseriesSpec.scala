package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational._
import graft.operators.Timeseries._

class TimeseriesSpec extends SparkSpecBase {
  import spark.implicits._

  test("ewmaByKey folds exact floor-division steps, negative deltas included") {
    import org.apache.spark.sql.functions.col
    // hand trace at halfShift 2 (α = 1/4): s₀ = 100;
    // δ = −100 → floor(−100/4) = −25 → 75; δ = −25 → floor(−6.25) = −7 → 68
    val df = Seq((1L, 30L, 50L), (1L, 10L, 100L), (1L, 20L, 0L), (2L, 5L, -9L))
      .toDF("k", "ts", "v") // deliberately out of ts order
    val out = graft.operators.Timeseries
      .ewmaByKey(df, col("k"), col("ts"), col("v"), halfShift = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out === Map(1L -> (3L, 68L), 2L -> (1L, -9L)))
    // truncation-vs-floor would give 74/−6 instead — the pmod
    // correction is load-bearing on negative deltas
  }

  test("ewmaByKey refuses a hot key loudly at maxObs; the boundary itself is exact") {
    import org.apache.spark.sql.functions.col
    val rows = (0 until 11).map(i => (1L, i.toLong, 100L)) :+ ((2L, 0L, 5L))
    val df = rows.toDF("k", "ts", "v")
    // exactly AT the cap: folds normally (constant series → ewma = 100)
    val atCap = graft.operators.Timeseries
      .ewmaByKey(df.filter(col("ts") < 10L || col("k") === 2L),
        col("k"), col("ts"), col("v"), halfShift = 2, maxObs = 10)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(atCap === Map(1L -> (10L, 100L), 2L -> (1L, 5L)))
    // one past the cap: the job fails with the guard's message, naming
    // the key and the windowed alternative — not an executor OOM
    val e = intercept[Exception] {
      graft.operators.Timeseries
        .ewmaByKey(df, col("k"), col("ts"), col("v"), halfShift = 2, maxObs = 10)
        .collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + chain(t.getCause)
    val msg = chain(e)
    assert(msg.contains("ewmaByKey: key 1 has 11 observations"), msg)
    assert(msg.contains("decayedCounts"), msg)
  }

  test("decayedCounts: recent surge outranks bigger stale volume, exact halving per day") {
    // key A: 8 events today; key B: 40 events ten days ago; key C:
    // spread 4/2/1 over the last three days (hand-traced score)
    val today = java.sql.Date.valueOf("2024-03-20")
    def day(minus: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 3, 20).minusDays(minus).toString)
    val rows =
      Seq.fill(8)(("A", today)) ++
        Seq.fill(40)(("B", day(10))) ++
        Seq.fill(4)(("C", today)) ++ Seq.fill(2)(("C", day(1))) ++ Seq.fill(1)(("C", day(2)))
    val out = rows.toDF("k", "d").decayedCounts(col("k"), col("d"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("A") === ((8L, 8L)))
    assert(out("B") === ((40L, 40L / 1024L))) // 40 div 2^10 = 0
    assert(out("C") === ((7L, 4L + 2L / 2L + 1L / 4L))) // 4 + 1 + 0 = 5
    // the surge ranks above the stale heavyweight despite 5x volume
    assert(out("A")._2 > out("B")._2 && out("C")._2 > out("B")._2)
  }

  test("cusumDrift peaks exactly at a sustained rate shift") {
    // 10 buckets of width 10µs: rate 1 for buckets 0-4, rate 3 for 5-9
    val low = (0 until 5).map(b => b * 10L + 1)
    val high = (5 until 10).flatMap(b => Seq(b * 10L + 1, b * 10L + 2, b * 10L + 3))
    val df = (low ++ high).toDF("us")
    val out = df.cusumDrift(col("us"), stepUs = 10L)
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Int)].collect()
    // dev = B·n − T = 10·n − 20: −10 on low buckets, +10 on high
    assert(out.map(_._3).toSeq === Seq.fill(5)(-10L) ++ Seq.fill(5)(10L))
    assert(out.map(_._4).toSeq === Seq(-10L, -20, -30, -40, -50, -40, -30, -20, -10, 0))
    assert(out.map(_._5).toSeq === Seq(0, 0, 0, 0, 1, 0, 0, 0, 0, 0),
      "the |cusum| extremum sits on the last pre-shift bucket")
    assert(out.map(_._3).sum === 0L, "deviations sum to zero by construction")
  }

  test("cusumDriftBy tracks each key's shift independently") {
    // key a: shift after bucket 4 (as the global fixture); key b: flat
    val a = (0 until 5).map(b => ("a", b * 10L + 1)) ++
      (5 until 10).flatMap(b => Seq(("a", b * 10L + 1), ("a", b * 10L + 2), ("a", b * 10L + 3)))
    val bRows = (0 until 4).map(b => ("b", b * 10L + 1))
    val out = (a ++ bRows).toDF("k", "us")
      .cusumDriftBy(col("k"), col("us"), stepUs = 10L)
      .orderBy("key", "bucket")
      .as[(String, Long, Long, Long, Long, Int)].collect()
    val (oa, ob) = out.partition(_._1 == "a")
    assert(oa.map(_._5).toSeq === Seq(-10L, -20, -30, -40, -50, -40, -30, -20, -10, 0))
    assert(oa.map(_._6).toSeq === Seq(0, 0, 0, 0, 1, 0, 0, 0, 0, 0))
    // flat key: dev = 4·1 − 4 = 0 everywhere, every bucket ties the peak
    assert(ob.map(_._4).forall(_ === 0L))
    assert(ob.map(_._6).forall(_ === 1))
  }

  test("gapFill densifies and forward-fills per key") {
    // key 1: observations in buckets 0 and 3 (step=10) → buckets 1,2 carry v=5
    val df = Seq(
      (1L, 2L, 100L, 5L),   // bucket 0
      (1L, 5L, 101L, 7L),   // bucket 0, later ts wins
      (1L, 31L, 102L, 9L),  // bucket 3
      (2L, 12L, 103L, 1L)   // bucket 1 only
    ).toDF("k", "us", "id", "v")
    val out = df.gapFill(col("k"), col("us"), col("id"), col("v"), stepUs = 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set(
      (1L, 0L, 7L), (1L, 1L, 7L), (1L, 2L, 7L), (1L, 3L, 9L),
      (2L, 1L, 1L)))
  }

  test("gapFill picks latest-in-bucket by (ts, tieBreak)") {
    val df = Seq((1L, 5L, 1L, 10L), (1L, 5L, 2L, 20L)).toDF("k", "us", "id", "v")
    val out = df.gapFill(col("k"), col("us"), col("id"), col("v"), stepUs = 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 0L, 20L)))
  }

  test("transitions counts ordered state pairs per key") {
    val df = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"),
      (2L, 1L, "a"), (2L, 2L, "b")
    ).toDF("k", "t", "s")
    val out = df.transitions(col("k"), Seq(col("t")), col("s"))
      .as[(String, String, Long)].collect().toSet
    assert(out === Set(("a", "b", 2L), ("b", "a", 1L)))
  }

  test("concurrency counts overlapping intervals per bucket") {
    val df = Seq((0L, 25L), (10L, 15L), (30L, 30L), (40L, 39L)).toDF("s", "e")
    val out = df.concurrency(col("s"), col("e"), stepUs = 10L)
      .as[(Long, Long)].collect().toSet
    // [0,25]→buckets 0,1,2; [10,15]→1; [30,30]→3; [40,39] dropped
    assert(out === Set((0L, 1L), (1L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("profile reports counts, nulls, distinct, min/max strings") {
    val df = Seq(
      (Some(3L), Some("b")), (Some(1L), None), (Some(3L), Some("a"))
    ).toDF("x", "s")
    val out = df.profile(Seq("x", "s"))
      .as[(String, Long, Long, Long, String, String)].collect().toSet
    assert(out === Set(
      ("x", 3L, 0L, 2L, "1", "3"),
      ("s", 3L, 1L, 2L, "a", "b")))
  }

  test("groupingSetsAgg computes exactly the requested sets") {
    val df = Seq(("A", "x", 1L), ("A", "y", 2L), ("B", "x", 4L)).toDF("f", "g", "v")
    val out = df.groupingSetsAgg(
        Seq(Seq(col("f")), Seq()), Seq(col("f"), col("g")),
        Seq(sum(col("v")).as("s")))
      .select(col("f"), col("g"), col("s"))
      .as[(Option[String], Option[String], Long)].collect().toSet
    assert(out === Set(
      (Some("A"), None, 3L), (Some("B"), None, 4L), (None, None, 7L)))
  }

  test("skyline2D keeps exactly the non-dominated points") {
    val df = Seq(
      (1L, 9L), (2L, 7L), (2L, 8L), (3L, 7L), (4L, 4L), (5L, 5L), (4L, 4L), (6L, 1L)
    ).toDF("a", "b")
    val out = df.skyline2D(col("a"), col("b")).as[(Long, Long)].collect().toSet
    // (2,8) dominated by (2,7); (3,7) by (2,7); (5,5) by (4,4); dup (4,4) collapses
    assert(out === Set((1L, 9L), (2L, 7L), (4L, 4L), (6L, 1L)))
  }

  test("skyline2D keeps duplicate-coordinate points once (no self-domination)") {
    val df = Seq((1L, 1L), (1L, 1L)).toDF("a", "b")
    assert(df.skyline2D(col("a"), col("b")).count() === 1L)
  }

  test("pathKGrams counts length-k state paths per key") {
    val df = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "a"),
      (2L, 1L, "a"), (2L, 2L, "b") // too short for k=3
    ).toDF("k", "t", "s")
    val out = df.pathKGrams(col("k"), Seq(col("t")), col("s"), k = 3)
      .as[(String, String, String, Long)].collect().toSet
    assert(out === Set(("a", "b", "c", 1L), ("b", "c", "a", 1L)))
  }

  test("stratifiedSample caps per class deterministically") {
    val df = (1L to 10L).map(i => (i, if (i <= 7) "big" else "small")).toDF("id", "c")
    val a = df.stratifiedSample(col("c"), col("id"), nPerClass = 3)
      .as[(Long, String)].collect().toSet
    val b = df.repartition(7).stratifiedSample(col("c"), col("id"), nPerClass = 3)
      .as[(Long, String)].collect().toSet
    assert(a === b) // pure function of the data, not the partitioning
    assert(a.count(_._2 == "big") === 3)
    assert(a.count(_._2 == "small") === 3)
  }

  test("mixtureSample applies per-source rates deterministically") {
    val df = (1L to 400L).map(i => (i, if (i % 2 == 0) "keep" else "drop")).toDF("id", "src")
    val out = df.mixtureSample(col("src"), col("id"), Map("keep" -> 100, "drop" -> 0))
      .as[(Long, String)].collect().toSet
    assert(out.size === 200 && out.forall(_._2 == "keep"))
    // unlisted sources fall back to defaultPct; rate is id-hash determined
    val half = df.mixtureSample(col("src"), col("id"), Map.empty, defaultPct = 50)
    val again = df.repartition(7).mixtureSample(col("src"), col("id"), Map.empty, defaultPct = 50)
    assert(half.collect().toSet === again.collect().toSet)
    val n = half.count()
    assert(n > 120 && n < 280) // ~50% of 400, md5-bucket noise allowed
  }

  test("madOutliers flags |v - median| > k * MAD per group") {
    // group A: values 1..5 + 100 → med 3.5, MAD 1.5, |100-3.5| > 4.5 → outlier
    val df = (Seq((1L, "A", 100L)) ++ (1L to 5L).map(v => (v + 1L, "A", v)))
      .toDF("id", "g", "v")
    val out = df.madOutliers(Seq(col("g")), col("v"), k = 3.0, keep = Seq(col("id")))
      .as[(Long, String, Long)].collect().toSet
    assert(out === Set((1L, "A", 100L)))
  }

  test("madOutliers groups by a COMPUTED expression (r9 advice)") {
    // grouping on id div 10 used to fail analysis (col(c.toString) on a
    // non-trivial expression); the generated-alias join must handle it
    val df = (Seq((1L, 100L)) ++ (2L to 6L).map(i => (i, i))).toDF("id", "v")
    val out = df.madOutliers(Seq((col("id") % 100L * 0L).as("bucket")), col("v"),
        k = 3.0, keep = Seq(col("id")))
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 0L, 100L))) // all rows share bucket 0; same outlier
    assert(df.madOutliers(Seq(col("id") % 2L), col("v"), k = 3.0, keep = Seq(col("id")))
      .columns.length === 3) // unaliased computed group still analyzes
  }

  test("bucketing floors negative timestamps (r9 advice: integer floor-div)") {
    // ts = -1 µs belongs to bucket -1 (floor), not bucket 0 (truncate):
    // a truncating div would double-width bucket 0 around the epoch
    val df = Seq((1L, -1L, 10L), (2L, -3600000001L, 20L), (3L, 1L, 30L))
      .toDF("id", "us", "v")
    val buckets = df.cusumDrift(col("us"), stepUs = 3600000000L)
      .select("bucket").as[Long].collect().sorted
    assert(buckets.toSeq === Seq(-2L, -1L, 0L))
    val conc = df.concurrency(col("us"), col("us") + 1L, stepUs = 3600000000L)
      .select("bucket").as[Long].collect().sorted
    assert(conc.contains(-1L) && conc.contains(-2L))
  }

  test("winsorize: nearest-rank cutoffs clamp tails, keep the middle, survive ties") {
    // group a: 1..10 → klo = ceil(10·100/1000) = 1 → lo=1... use 200/800:
    // klo = ceil(10·200/1000) = 2 → lo_cut = 2; khi = ceil(10·800/1000) = 8 → hi_cut = 8
    val a = (1L to 10L).map(v => ("a", v))
    val b = Seq(("b", 5L), ("b", 5L), ("b", 5L)) // all ties: cuts = 5
    val df = (a ++ b).toDF("g", "v")
    val out = df.winsorize(col("g"), col("v"), 200, 800)
      .select("g", "v", "lo_cut", "hi_cut", "winsorized")
      .as[(String, Long, Long, Long, Long)].collect()
    val byA = out.filter(_._1 == "a").map(r => r._2 -> r._5).toMap
    assert(out.filter(_._1 == "a").forall(r => r._3 == 2L && r._4 == 8L))
    assert(byA(1L) === 2L && byA(2L) === 2L && byA(5L) === 5L && byA(9L) === 8L && byA(10L) === 8L)
    assert(out.filter(_._1 == "b").forall(r => r._3 == 5L && r._4 == 5L && r._5 == 5L))
    assert(out.length === 13, "clipping keeps every row")
  }

  test("winsorize matches a local nearest-rank replay on random heavy-tailed groups") {
    val rnd = new scala.util.Random(59)
    val rows = (1 to 500).map(i =>
      (s"g${rnd.nextInt(4)}", (math.exp(rnd.nextGaussian() * 2) * 100).toLong, i.toLong))
    val out = rows.toDF("g", "v", "id").winsorize(col("g"), col("v"), 50, 950)
      .select("id", "winsorized").as[(Long, Long)].collect().toMap
    val byG = rows.groupBy(_._1)
    val expect = rows.map { case (g, v, id) =>
      val vs = byG(g).map(_._2).sorted
      val n = vs.size.toLong
      val lo = vs((math.max((n * 50 + 999) / 1000, 1L) - 1).toInt)
      val hi = vs((math.max((n * 950 + 999) / 1000, 1L) - 1).toInt)
      id -> math.min(math.max(v, lo), hi)
    }.toMap
    assert(out === expect)
  }

  test("weightedMedian: lower weighted median with tie classes and a replay check") {
    // group a: values 1(w3), 2(w1), 5(w2) → W=6, cum(1)=3, 2·3 ≥ 6 → 1
    // group b: values 10(w1), 20(w1) → W=2, cum(10)=1, 2 ≥ 2 → 10
    val df = Seq(("a", 1L, 2L), ("a", 1L, 1L), ("a", 2L, 1L), ("a", 5L, 2L),
      ("b", 10L, 1L), ("b", 20L, 1L)).toDF("g", "v", "w")
    assert(df.weightedMedian(Seq(col("g")), col("v"), col("w"))
      .as[(String, Long, Long)].collect().toSet === Set(("a", 1L, 6L), ("b", 10L, 2L)))
    // randomized replay: smallest v with 2·cum ≥ W
    val rnd = new scala.util.Random(17)
    val big = (0 until 400).map(_ =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(50).toLong, 1L + rnd.nextInt(9).toLong))
      .toDF("g", "v", "w")
    val got = big.weightedMedian(Seq(col("g")), col("v"), col("w"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    big.as[(String, Long, Long)].collect().groupBy(_._1).foreach { case (g, rows) =>
      val byV = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
      val tot = byV.map(_._2).sum
      val med = byV.scanLeft((0L, 0L)) { case ((_, c), (v, wv)) => (v, c + wv) }
        .tail.find { case (_, cum) => 2 * cum >= tot }.get._1
      assert(got(g) === ((med, tot)), g)
    }
  }

  test("giniByGroup: equality → 0, extreme concentration → high, NULL on zero mass") {
    val eq = Seq.fill(8)(("a", 10L)).toDF("g", "x")
    assert(eq.giniByGroup(Seq(col("g")), col("x"))
      .as[(String, Long, Option[Long])].collect().toSeq === Seq(("a", 8L, Some(0L))))
    // one doc owns everything: G = (n−1)/n = 3/4 → 750‰
    val conc = Seq(("b", 0L), ("b", 0L), ("b", 0L), ("b", 100L)).toDF("g", "x")
    assert(conc.giniByGroup(Seq(col("g")), col("x"))
      .as[(String, Long, Option[Long])].collect().toSeq === Seq(("b", 4L, Some(750L))))
    val zero = Seq(("c", 0L), ("c", 0L)).toDF("g", "x")
    assert(zero.giniByGroup(Seq(col("g")), col("x"))
      .as[(String, Long, Option[Long])].collect().toSeq === Seq(("c", 2L, None)))
  }

  test("groupOls: hand-computed line, epoch-scale x centered, degenerate x → NULL") {
    // group a: y = 2x + 1 exactly at x = 10^12 + {0,1,2} (x0 centering
    // keeps the sums small); group b: all x equal → Sxx = 0 → NULLs
    val base = 1000000000000L
    val df = (Seq((0L, 1L), (1L, 3L), (2L, 5L)).map { case (dx, y) => ("a", base + dx, y) } ++
      Seq(("b", 7L, 10L), ("b", 7L, 20L))).toDF("g", "x", "y")
    val out = df.groupOls(Seq(col("g")), col("x"), col("y"))
      .as[(String, Long, Long, Option[Double], Option[Double], Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val a = out("a")
    assert(a._2 === base && a._3 === 3L)
    assert(a._4 === Some(2.0) && a._5 === Some(1.0))
    // Sxy = 3·13 − 3·9 = 12, Sxx = 3·5 − 9 = 6
    assert(a._6 === 12L && a._7 === 6L)
    val b = out("b")
    assert(b._4.isEmpty && b._5.isEmpty && b._7 === 0L)
  }

  test("groupOls slope/intercept match a least-squares replay on random groups") {
    val rnd = new scala.util.Random(23)
    val df = (0 until 300).map(_ =>
      (s"g${rnd.nextInt(4)}", rnd.nextInt(100).toLong, rnd.nextInt(1000).toLong - 500L))
      .toDF("g", "x", "y")
    val got = df.groupOls(Seq(col("g")), col("x"), col("y"))
      .as[(String, Long, Long, Option[Double], Option[Double], Long, Long)].collect()
    val byG = df.as[(String, Long, Long)].collect().groupBy(_._1)
    got.foreach { case (g, x0, n, slope, intercept, sxyNum, sxxNum) =>
      val pts = byG(g).map { case (_, x, y) => (x - x0, y) }
      assert(x0 === byG(g).map(_._2).min)
      assert(n === pts.length)
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      assert(sxyNum === n * sxy - sx * sy)
      assert(sxxNum === n * sxx - sx * sx)
      assert(slope === Some(sxyNum.toDouble / sxxNum.toDouble))
      assert(intercept === Some((sy.toDouble - slope.get * sx.toDouble) / n.toDouble))
    }
  }

  private def qlog(x: Long): Long = {
    val bl = 64 - java.lang.Long.numberOfLeadingZeros(x)
    64L * (bl - 1) + math.floor(x * 64.0 / math.pow(2.0, bl - 1)).toLong - 64L
  }

  test("targetEncodeLoo: own row excluded, singleton NULL, negative split division") {
    val df = Seq(("a", 10L), ("a", 20L), ("a", 60L), ("solo", 5L), ("neg", -7L), ("neg", 0L))
      .toDF("k", "v")
    val got = df.targetEncodeLoo(col("k"), col("v"))
      .select("k", "v", "loo_num", "loo_den", "loo_milli")
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got(("a", 10L)) === ((80L, 2L, Some(40000L))))
    assert(got(("a", 60L)) === ((30L, 2L, Some(15000L))))
    assert(got(("solo", 5L)) === ((0L, 0L, None)))
    // -7/1 → -7000 exactly through the split form
    assert(got(("neg", 0L)) === ((-7L, 1L, Some(-7000L))))
  }

  test("targetEncodeLoo matches a local leave-one-out replay on random frames") {
    val rnd = new scala.util.Random(83)
    val rows = (1 to 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(6)}", rnd.nextInt(2000).toLong - 500L))
    val got = rows.toDF("id", "k", "v").targetEncodeLoo(col("k"), col("v"))
      .select("id", "loo_num", "loo_den", "loo_milli")
      .as[(Long, Long, Long, Option[Long])].collect().map(r => r._1 -> r).toMap
    val byK = rows.groupBy(_._2)
    rows.foreach { case (id, k, v) =>
      val s = byK(k).map(_._3).sum
      val n = byK(k).size.toLong
      val (num, den) = (s - v, n - 1)
      val milli = if (den == 0) None
        else Some((num / den) * 1000 + ((num % den) * 1000) / den)
      assert(got(id) === ((id, num, den, milli)), s"row $id")
    }
  }

  test("trimmedMean: drops exactly the winsorize tails; all-ties group keeps everything") {
    // a: 1..10 at [200,800]‰ → keep ranks 2..8 → sum 2+..+8 = 35, n_kept 7
    val a = (1L to 10L).map(v => ("a", v))
    val b = Seq(("b", 5L), ("b", 5L), ("b", 5L))
    val got = (a ++ b).toDF("g", "v").trimmedMean(col("g"), col("v"), 200, 800)
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("a") === (("a", 10L, 7L, 35L, 5000L)))
    assert(got("b") === (("b", 3L, 3L, 15L, 5000L)))
  }

  test("concentration: monopoly 10000bp, uniform 10000/k, local replay") {
    val df = (Seq.fill(5)(("mono", 1L)) ++
      (1 to 4).flatMap(k => Seq.fill(3)(("uni", k.toLong))) ++
      Seq(("skew", 1L), ("skew", 1L), ("skew", 1L), ("skew", 2L))).toDF("g", "k")
    val got = df.concentration(col("g"), col("k"))
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("mono") === (("mono", 5L, 1L, 10000L, 1000L)))
    assert(got("uni") === (("uni", 12L, 4L, 2500L, 4000L)))
    // skew: c = (3,1), N=4 → c2=10 → hhi = 100000/16 = 6250, eff = 1600
    assert(got("skew") === (("skew", 4L, 2L, 6250L, 1600L)))
  }

  test("timeWeightedAvg: holds weight the mean; single-obs and zero-span NULL; tie rule") {
    // key a: v=100 holds [0,10), v=200 holds [10,40) → num=100·10+200·30=7000,
    // den=40 → twap 175.000
    val df = Seq(
      ("a", 0L, 100L), ("a", 10L, 200L), ("a", 40L, 999L), // last obs holds nothing
      ("b", 5L, 7L),                                        // single obs → NULL
      ("c", 3L, 1L), ("c", 3L, 9L)                          // zero span → NULL
    ).toDF("k", "us", "v")
    val got = graft.operators.Timeseries.timeWeightedAvg(
        df, col("k"), col("us"), col("v"))
      .as[(String, Long, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") === (("a", 3L, 40L, 7000L, 40L, Some(175000L))))
    assert(got("b") === (("b", 1L, 0L, 0L, 0L, None)))
    assert(got("c") === (("c", 2L, 0L, 0L, 0L, None)))
    // equal-ts tie: the value-LARGEST of the instant carries the gap
    val tie = Seq(("t", 0L, 5L), ("t", 0L, 50L), ("t", 10L, 1L)).toDF("k", "us", "v")
    val r = graft.operators.Timeseries.timeWeightedAvg(
        tie, col("k"), col("us"), col("v"))
      .as[(String, Long, Long, Long, Long, Option[Long])].head()
    assert(r === (("t", 3L, 10L, 500L, 10L, Some(50000L))))
  }

  test("timeWeightedAvg matches a local ordered-hold replay on random streams") {
    val rnd = new scala.util.Random(67)
    val rows = (1 to 300).map(_ =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(50).toLong, rnd.nextInt(1000).toLong - 200L))
    val got = graft.operators.Timeseries.timeWeightedAvg(
        rows.toDF("k", "us", "v"), col("k"), col("us"), col("v"))
      .as[(String, Long, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    rows.groupBy(_._1).foreach { case (k, rs) =>
      val ord = rs.map(r => (r._2, r._3)).sorted
      val holds = ord.zip(ord.tail).map { case ((t0, v0), (t1, _)) => (v0, t1 - t0) }
      val num = holds.map { case (v, dt) => v * dt }.sum
      val den = holds.map(_._2).sum
      val exp = if (den == 0) None
        else Some((num / den) * 1000 + ((num % den) * 1000) / den)
      assert(got(k) === ((k, rs.size.toLong,
        ord.last._1 - ord.head._1, num, den, exp)), s"key $k")
    }
  }

  test("spearman: monotone ±1, undefined-variance NULL, tie-averaged local replay") {
    val df = Seq(
      ("up", 1L, 10L), ("up", 2L, 20L), ("up", 3L, 900L),   // any monotone map → 1
      ("dn", 1L, 5L), ("dn", 2L, 4L), ("dn", 3L, 1L),       // reversed → −1
      ("flat", 7L, 1L), ("flat", 7L, 2L)).toDF("g", "x", "y") // zero x-variance
    val got = df.spearman(Seq(col("g")), col("x"), col("y"))
      .as[(String, Long, Option[Double])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // ranks (2,4,6) both axes: num = dx = dy = 24 → ρ = 24/(√24·√24),
    // the exact IEEE value both engines produce (≈1 up to the sqrt ulp)
    val one = 24.0 / (math.sqrt(24.0) * math.sqrt(24.0))
    assert(got("up") === ((3L, Some(one))))
    assert(got("dn") === ((3L, Some(-one))))
    assert(got("flat") === ((2L, None)))
  }

  test("spearman matches a local tie-averaged rank replay on random frames") {
    val rnd = new scala.util.Random(43)
    val rows = (1 to 400).map(_ =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(10).toLong, rnd.nextInt(10).toLong))
    val got = rows.toDF("g", "x", "y").spearman(Seq(col("g")), col("x"), col("y"))
      .as[(String, Long, Option[Double])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      def ranks2(vs: Seq[Long]): Seq[Long] = {
        val sorted = vs.sorted
        vs.map { v =>
          val lo = sorted.indexOf(v) + 1L
          val m = sorted.count(_ == v).toLong
          2 * lo + m - 1
        }
      }
      val rx = ranks2(rs.map(_._2)); val ry = ranks2(rs.map(_._3))
      val n = rs.size.toLong
      val (sx, sy) = (rx.sum, ry.sum)
      val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
      val (sxx, syy) = (rx.map(a => a * a).sum, ry.map(a => a * a).sum)
      val (num, dx, dy) = (n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)
      val exp = if (dx == 0 || dy == 0) None
        else Some(num.toDouble / (math.sqrt(dx.toDouble) * math.sqrt(dy.toDouble)))
      assert(got(g) === ((n, exp)), s"group $g")
    }
  }

  test("mutualInformation: balanced independence is exactly zero everywhere") {
    val df = (for (x <- Seq("a", "b"); y <- Seq("c", "d"); _ <- 1 to 3)
      yield (x, y)).toDF("x", "y")
    val got = df.mutualInformation(col("x"), col("y"))
      .select("pmi_q64", "contrib_q64", "mi_q64_total")
      .as[(Long, Long, Long)].collect()
    assert(got.length === 4)
    assert(got.forall(_ === ((0L, 0L, 0L))))
  }

  test("mutualInformation: a deterministic mapping scores qlog64(n) − qlog64(c_y) per cell") {
    val df = Seq.fill(4)(("u", "u")) ++ Seq.fill(2)(("v", "v"))
    val got = df.toDF("x", "y").mutualInformation(col("x"), col("y"))
      .select("x", "c_xy", "pmi_q64", "mi_q64_total")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("u")._3 === qlog(4L * 6L) - qlog(4L * 4L))
    assert(got("v")._3 === qlog(2L * 6L) - qlog(2L * 2L))
    val tot = 4L * got("u")._3 + 2L * got("v")._3
    assert(got.values.forall(_._4 === tot))
  }

  test("mutualInformation matches a local qlog64 replay on random frames") {
    val rnd = new scala.util.Random(31)
    val rows = (1 to 300).map(_ => (s"x${rnd.nextInt(4)}", s"y${rnd.nextInt(3)}"))
    val got = rows.toDF("x", "y").mutualInformation(col("x"), col("y"))
      .select("x", "y", "c_xy", "c_x", "c_y", "n", "pmi_q64", "contrib_q64", "mi_q64_total")
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long)].collect()
    val cxy = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cx = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cy = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    val exp = cxy.map { case ((x, y), c) =>
      (x, y) -> (qlog(c * n) - qlog(cx(x) * cy(y)))
    }
    val tot = cxy.map { case (k, c) => c * exp(k) }.sum
    assert(got.length === cxy.size)
    got.foreach { case (x, y, c, cX, cY, nn, pmi, contrib, mi) =>
      assert((c, cX, cY, nn) === ((cxy((x, y)), cx(x), cy(y), n)))
      assert(pmi === exp((x, y)))
      assert(contrib === c * pmi)
      assert(mi === tot)
    }
  }

  test("kaplanMeier: hand-traced censoring, risk sets and qlog64 steps") {
    // horizon = 10; censorWindow = 2 → u1 (last=10) censored, u2
    // (last=8) and u3 (last=5) observed churns. bucket=4 → lifetimes
    // u1:2 u2:2 u3:0.
    val df = Seq((1L, 0L), (1L, 10L), (2L, 0L), (2L, 8L), (3L, 5L), (3L, 5L))
      .toDF("id", "us")
    val got = graft.operators.Timeseries.kaplanMeier(
        df, col("id"), col("us"), censorWindowUs = 2L, bucketUs = 4L)
      .orderBy("t")
      .as[(Long, Long, Long, Long, Option[Long])].collect()
    // t=0: n=3 d=1 → step q(2)−q(3); t=2: n=2 d=1 c=1 → step q(1)−q(2)
    assert(got(0) === ((0L, 3L, 1L, 0L, Some(qlog(2) - qlog(3)))))
    assert(got(1) === ((2L, 2L, 1L, 1L, Some(qlog(2) - qlog(3) + qlog(1) - qlog(2)))))
  }

  test("kaplanMeier: survival hits exact zero only at the max lifetime, reported NULL") {
    // both users churn (horizon far past), same lifetime → d = n at
    // the only row
    val df = Seq((1L, 0L), (1L, 4L), (2L, 1L), (2L, 5L), (9L, 100L))
      .toDF("id", "us")
    val got = graft.operators.Timeseries.kaplanMeier(
        df, col("id"), col("us"), censorWindowUs = 10L, bucketUs = 4L)
      .orderBy("t").as[(Long, Long, Long, Long, Option[Long])].collect()
    // u9's single event IS the horizon → censored at lifetime 0.
    assert(got(0) === ((0L, 3L, 0L, 1L, Some(0L))))
    assert(got(1)._1 === 1L)
    assert(got(1)._3 === 2L)   // both remaining churn here → Ŝ = 0
    assert(got(1)._5 === None) // exact zero is NULL in log space
  }

  test("kaplanMeier: randomized local product-limit replay") {
    val rnd = new scala.util.Random(11)
    val events = (1 to 60).flatMap { u =>
      (0 to rnd.nextInt(5)).map(_ => (u.toLong, rnd.nextInt(100).toLong))
    }
    val df = events.toDF("id", "us")
    val got = graft.operators.Timeseries.kaplanMeier(
        df, col("id"), col("us"), censorWindowUs = 30L, bucketUs = 7L)
      .orderBy("t").as[(Long, Long, Long, Long, Option[Long])].collect()
    val byU = events.groupBy(_._1).toSeq.map { case (_, es) =>
      (es.map(_._2).min, es.map(_._2).max)
    }
    val h = byU.map(_._2).max
    val lives = byU.map { case (f, l) => ((l - f) / 7L, h - l >= 30L) }
    val ts = got.map(_._1)
    assert(ts.toSet === lives.map(_._1).toSet)
    var acc = 0L
    var dead = false
    got.foreach { case (t, nRisk, d, c, km) =>
      assert(nRisk === lives.count(_._1 >= t))
      assert(d === lives.count(v => v._1 == t && v._2))
      assert(c === lives.count(v => v._1 == t && !v._2))
      if (d == nRisk) dead = true
      if (!dead) { acc += qlog(nRisk - d) - qlog(nRisk); assert(km === Some(acc)) }
      else assert(km === None)
    }
  }
}
