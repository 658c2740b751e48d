package graft

import org.apache.spark.sql.functions._

import graft.sketch.Sketches

class SketchSpec extends SparkSpecBase {
  import spark.implicits._

  test("hll estimates distinct counts within the p=12 error bound") {
    // 10k distinct values, each appearing 1-3 times
    val df = spark.range(10000).select(col("id") % 10000 as "v")
      .union(spark.range(5000).select(col("id") % 10000 as "v"))
    val est = df.select(Sketches.hll(xxhash64(col("v")))).as[Long].head()
    assert(math.abs(est - 10000.0) / 10000.0 < 0.05) // 3σ at p=12 is ~4.8%
  }

  test("hll merge across partitions equals single-partition result") {
    val one = spark.range(5000).repartition(1).select(Sketches.hll(xxhash64(col("id")))).as[Long].head()
    val many = spark.range(5000).repartition(16).select(Sketches.hll(xxhash64(col("id")))).as[Long].head()
    assert(one === many) // register-max merge is exact, independent of partitioning
  }

  test("hll linear-counting small range is near-exact") {
    val est = spark.range(50).select(Sketches.hll(xxhash64(col("id")))).as[Long].head()
    assert(est === 50L)
  }

  test("misra-gries candidates contain every key above n/(k+1)") {
    // 1000 background keys once each + two heavy keys
    val df = spark.range(1000).select(col("id").as("k"))
      .union(spark.range(300).select(lit(7777L).as("k")))
      .union(spark.range(200).select(lit(8888L).as("k")))
    val out = df.repartition(8)
      .agg(Sketches.misraGries(col("k"), k = 20).as("mg"))
      .select(col("mg.keys"), col("mg.n")).as[(Seq[Long], Long)].head()
    assert(out._2 === 1500L)
    assert(out._1.contains(7777L) && out._1.contains(8888L)) // freq > n/(k+1) ≈ 71
    assert(out._1.size <= 20)
  }

  test("heavyHitters returns exact counts for keys above the share") {
    val df = spark.range(1000).select(col("id").as("k"))
      .union(spark.range(300).select(lit(7777L).as("k")))
      .union(spark.range(200).select(lit(8888L).as("k")))
    val out = Sketches.heavyHitters(df.repartition(8), col("k"), shareNum = 1, shareDen = 10)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(7777L -> 300L, 8888L -> 200L)) // exact, not sketch estimates
  }

  test("heavyHittersByGroup: per-group exact counts, independent of input order and layout") {
    // group A: heavy 7777 (300 of 1300); group B: heavy 8888 (60 of 160);
    // 7777 also appears lightly in B (must NOT qualify there)
    val df = spark.range(1000).select(lit("A").as("g"), col("id").as("k"))
      .union(spark.range(300).select(lit("A").as("g"), lit(7777L).as("k")))
      .union(spark.range(100).select(lit("B").as("g"), col("id").as("k")))
      .union(spark.range(60).select(lit("B").as("g"), lit(8888L).as("k")))
      .union(spark.range(5).select(lit("B").as("g"), lit(7777L).as("k")))
    val expect = Map(("A", 7777L) -> 300L, ("B", 8888L) -> 60L)
    for (layout <- Seq(df.repartition(8), df.orderBy(rand(42)).coalesce(1), df.repartition(3, col("k")))) {
      val out = Sketches.heavyHittersByGroup(layout, col("g"), col("k"), shareNum = 1, shareDen = 10)
        .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
      assert(out === expect)
    }
  }

  test("heavyHittersByGroup matches exact GROUP BY/HAVING on a randomized zipfy stream") {
    val rnd = new scala.util.Random(31)
    val rows = (1 to 4000).map { _ =>
      val g = s"g${rnd.nextInt(4)}"
      val k = math.min(rnd.nextInt(200), rnd.nextInt(200)).toLong // skew to low keys
      (g, k)
    }
    val df = rows.toDF("g", "k").repartition(7)
    val out = Sketches.heavyHittersByGroup(df, col("g"), col("k"), shareNum = 2, shareDen = 100)
      .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val exact = rows.groupBy(identity).map { case ((g, k), v) => (g, k) -> v.size.toLong }
    val totals = rows.groupBy(_._1).map { case (g, v) => g -> v.size.toLong }
    val expect = exact.filter { case ((g, _), c) => c * 100 >= totals(g) * 2 }
    assert(out === expect)
  }

  test("count-min estimates are one-sided and tight for heavy keys") {
    // 1000 light keys (1×) + two heavy keys; w=2048 → expected noise ≤ ~2·1500/2048 < 2
    val df = spark.range(1000).select(col("id").as("k"))
      .union(spark.range(300).select(lit(7777L).as("k")))
      .union(spark.range(200).select(lit(8888L).as("k")))
      .repartition(8)
    val sk = df.agg(Sketches.cms(xxhash64(col("k")), d = 4, w = 2048).as("s"))
      .select(col("s.table").as("t"), col("s.n").as("n"))
    assert(sk.select("n").as[Long].head() === 1500L)
    val probes = Seq(7777L -> 300L, 8888L -> 200L, 5L -> 1L, 999L -> 1L)
    val est = probes.map(_._1).toDF("k").crossJoin(sk)
      .select(col("k"), Sketches.cmsEstimate(col("t"), xxhash64(col("k")), 4, 2048).as("e"))
      .as[(Long, Long)].collect().toMap
    for ((k, exact) <- probes) {
      assert(est(k) >= exact, s"CMS underestimated key $k") // one-sided guarantee
      assert(est(k) <= exact + 15, s"CMS estimate ${est(k)} far above exact $exact for $k")
    }
  }

  test("count-min merge across partitions equals single-partition sketch") {
    val df = spark.range(20000).select((col("id") % 500).as("k"))
    def tableOf(parts: Int) =
      df.repartition(parts).agg(Sketches.cms(xxhash64(col("k")), 4, 256).as("s"))
        .select(col("s.table")).as[Seq[Long]].head()
    assert(tableOf(1) === tableOf(16)) // element-wise add merge is exact
  }

  test("cmsFrequencyGate returns exact counts above the threshold") {
    val df = spark.range(1000).select(col("id").as("k"))
      .union(spark.range(300).select(lit(7777L).as("k")))
      .union(spark.range(200).select(lit(8888L).as("k")))
    val out = Sketches.cmsFrequencyGate(df.repartition(8), col("k"), minCount = 100)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(7777L -> 300L, 8888L -> 200L)) // exact, not estimates
  }

  test("bloom filter: no false negatives, plausible FP rate, probe matches builder") {
    import graft.sketch.BloomFilter
    val keys = spark.range(2000).select((col("id") * 7 + 1).as("k"))
    val bloom = keys.agg(BloomFilter.bloomAgg(xxhash64(col("k")), 1 << 16, 5).as("b"))
      .select(col("b.words").as("bloom"))
    // every inserted key must pass (no false negatives)
    val misses = keys.crossJoin(bloom)
      .filter(!BloomFilter.mightContain(col("bloom"), xxhash64(col("k")), 1 << 16, 5))
      .count()
    assert(misses === 0L)
    // disjoint keys mostly fail (FP rate ~ (1-e^(-kn/m))^k ≈ 0.5% here)
    val fps = spark.range(20000).select((col("id") * 7 + 3).as("k")) // ≡ 3 mod 7: disjoint
      .crossJoin(bloom)
      .filter(BloomFilter.mightContain(col("bloom"), xxhash64(col("k")), 1 << 16, 5))
      .count()
    assert(fps < 600L, s"false positive count $fps out of 20000")
  }

  test("bloomSemiJoin equals the plain semi join") {
    import graft.sketch.BloomFilter
    val probe = spark.range(5000).select(col("id").as("k"), (col("id") % 97).as("payload"))
    val build = spark.range(300).select((col("id") * 13).as("bk"))
    val pruned = BloomFilter.bloomSemiJoin(probe, col("k"), build, col("bk"), 1 << 16, 5)
      .select("k", "payload").as[(Long, Long)].collect().toSet
    val plain = probe.join(build, col("k") === col("bk"), "left_semi")
      .select("k", "payload").as[(Long, Long)].collect().toSet
    assert(pruned === plain)
    assert(plain.nonEmpty)
  }

  test("inclusionReport: below-capacity containment is exact and directional") {
    // fk ⊆ pk strictly: every fk value is a pk value, only half the
    // pk values are referenced; disjoint column shares nothing
    val pk = (1L to 40L).toDF("id")
    val fk = (1L to 40L by 2).toDF("ref")
    val other = (1000L to 1019L).toDF("x")
    val out = Sketches.inclusionReport(Seq(
        ("a.pk", pk, col("id")), ("b.fk", fk, col("ref")), ("c.x", other, col("x"))),
        k = 64)
      .select("col_a", "col_b", "est_a", "est_b", "cont_a_pm", "cont_b_pm", "joinable")
      .as[(String, String, Long, Long, Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // below capacity the sketch IS the value set: exact everything
    val ab = out(("a.pk", "b.fk"))
    assert(ab._3 === 40L && ab._4 === 20L)
    assert(ab._5 === 500L && ab._6 === 1000L && ab._7 === 1) // fk fully inside pk
    val ac = out(("a.pk", "c.x"))
    assert(ac._5 === 0L && ac._6 === 0L && ac._7 === 0)
  }

  test("amsF2 matches a literal tug-of-war replay and is partition-invariant") {
    import graft.functions.Hashing
    val keys = (0L until 400L).map(i => i % 37) // repeated keys, known freqs
    val df = keys.toDF("k").withColumn("g", lit("a"))
    val est = Sketches.amsF2(df.repartition(7), col("g"), col("k"))
      .select("n", "f2_est").as[(Long, Long)].head()
    // literal replay: same portable hash, per-lane ±1 sums, (Σ Z²) div 60
    val hs = df.select(Hashing.portableHash64(col("k"))).as[Long].collect()
    val zs = (0 until 60).map(j => hs.map(h => if (((h >> j) & 1L) == 1L) 1L else -1L).sum)
    assert(est === ((400L, zs.map(z => z * z).sum / 60)))
    val single = Sketches.amsF2(df.repartition(1), col("g"), col("k"))
      .select("f2_est").as[Long].head()
    assert(single === est._2) // integer lane sums: partition-free
  }

  test("amsF2 tracks a planted hot key: skewed F2 well above uniform F2") {
    val uniform = (0L until 1000L).toDF("k").withColumn("g", lit("u"))
    // same row count, but one key owns half the rows: F2 ≈ 250k vs 1k
    val skewed = ((0L until 500L) ++ Seq.fill(500)(9999L)).toDF("k").withColumn("g", lit("s"))
    val out = Sketches.amsF2(uniform.union(skewed), col("g"), col("k"))
      .select("g", "f2_est").as[(String, Long)].collect().toMap
    assert(out("s") > out("u") * 20, s"skewed ${out("s")} vs uniform ${out("u")}")
  }

  test("kmv sketch is the k smallest distinct hashes, partition-invariant") {
    val hashes = spark.range(4000).select((xxhash64(col("id")) % 100000 + 100000) as "h")
    val one = hashes.repartition(1).select(Sketches.kmv(col("h"), 32)).as[Seq[Long]].head()
    val many = hashes.repartition(16).select(Sketches.kmv(col("h"), 32)).as[Seq[Long]].head()
    val brute = hashes.as[Long].collect().distinct.sorted.take(32).toSeq
    assert(one === brute)
    assert(many === brute) // sorted-distinct-union merge is order/partition-free
  }

  test("kmv below capacity is exact: estimate = distinct count, overlap = exact overlap") {
    val k = 64
    val a = spark.range(40).select(graft.functions.Hashing.portableHash64(col("id")) as "h")
    val b = spark.range(25, 55).select(graft.functions.Hashing.portableHash64(col("id")) as "h")
    val ska = a.select(Sketches.kmv(col("h"), k) as "sk")
    val skb = b.select(Sketches.kmv(col("h"), k) as "sk")
    assert(ska.select(Sketches.kmvDistinctEstimate(col("sk"), k)).as[Long].head() === 40L)
    val j = ska.crossJoin(skb.select(col("sk") as "sk2"))
    val (common, est) = Sketches.kmvOverlapEstimate(col("sk"), col("sk2"), k)
    val (c, e) = j.select(common, est).as[(Long, Long)].head()
    assert(c === 15L) // ids 25..39 shared; distinct hashes so exact
    assert(e === 15L) // θ = full space below capacity → estimate degrades to exact
  }

  test("kmv capped estimator tracks the true distinct count and overlap") {
    val k = 256
    // 20k distinct ids, two sources sharing half
    val a = spark.range(20000).select(graft.functions.Hashing.portableHash64(col("id")) as "h")
    val b = spark.range(10000, 30000).select(graft.functions.Hashing.portableHash64(col("id")) as "h")
    val ska = a.select(Sketches.kmv(col("h"), k) as "sk")
    val est = ska.select(Sketches.kmvDistinctEstimate(col("sk"), k)).as[Long].head()
    assert(math.abs(est - 20000.0) / 20000.0 < 0.2) // ~1/sqrt(k) ≈ 6% rse, 3σ margin
    val j = ska.crossJoin(b.select(Sketches.kmv(col("h"), k) as "sk2"))
    val (_, ovEst) = Sketches.kmvOverlapEstimate(col("sk"), col("sk2"), k)
    val ov = j.select(ovEst).as[Long].head()
    assert(ov > 5000 && ov < 15000, s"overlap estimate $ov far from true 10000")
  }

  test("kmv ledger: merged registers equal the direct union sketch, appends idempotent") {
    import graft.sketch.KmvLedger
    val dir = java.nio.file.Files.createTempDirectory("kmv_ledger").toString
    val d0 = spark.range(0, 300).select(concat(lit("doc"), col("id")) as "text")
    val d1 = spark.range(200, 500).select(concat(lit("doc"), col("id")) as "text")
    val d2 = spark.range(450, 700).select(concat(lit("doc"), col("id")) as "text")
    val k = 64
    KmvLedger.append(dir, KmvLedger.dropSummary(d0, "d0", col("text"), k))
    KmvLedger.append(dir, KmvLedger.dropSummary(d1, "d1", col("text"), k))
    KmvLedger.append(dir, KmvLedger.dropSummary(d2, "d2", col("text"), k))
    val merged = KmvLedger.mergedFrom(spark, dir)
      .select("sketch").as[Seq[Long]].head()
    val direct = d0.union(d1).union(d2)
      .select(Sketches.kmv(graft.functions.Hashing.portableHash64(col("text")), k))
      .as[Seq[Long]].head()
    assert(merged === direct) // union-of-sketches ≡ sketch-of-union, bit-equal
    // replayed append rewrites its own partition: merged unchanged
    KmvLedger.append(dir, KmvLedger.dropSummary(d1, "d1", col("text"), k))
    val after = KmvLedger.mergedFrom(spark, dir).select("sketch").as[Seq[Long]].head()
    assert(after === direct)
  }

  test("kmv ledger refuses mixed sketch sizes") {
    import graft.sketch.KmvLedger
    val d = spark.range(10).select(concat(lit("x"), col("id")) as "text")
    val mixed = KmvLedger.dropSummary(d, "a", col("text"), 32)
      .union(KmvLedger.dropSummary(d, "b", col("text"), 64))
    assertThrows[IllegalArgumentException](KmvLedger.merged(mixed))
  }

  test("kmv ledger overlap-vs-history is exact below capacity") {
    import graft.sketch.KmvLedger
    val hist = spark.range(0, 40).select(concat(lit("doc"), col("id")) as "text")
    val batch = spark.range(30, 60).select(concat(lit("doc"), col("id")) as "text")
    val merged = KmvLedger.merged(KmvLedger.dropSummary(hist, "h", col("text"), 256))
    val r = KmvLedger.overlapVsHistory(batch, col("text"), merged)
      .select("common", "est_overlap", "jacc_pm", "est_batch", "est_history")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r._1 === 10L) // docs 30..39 shared, everything under capacity → exact
    assert(r._2 === 10L)
    assert(r._3 === 166L) // ⌊1000·10/60⌋
    assert(r._4 === 30L)
    assert(r._5 === 40L)
  }

  test("tdigest quantiles land within rank tolerance of exact") {
    val n = 20000
    val rnd = new scala.util.Random(42)
    // skewed data: mixture of uniform + heavy tail
    val vals = Seq.fill(n)(if (rnd.nextDouble() < 0.9) rnd.nextInt(1000).toLong else 1000L + rnd.nextInt(100000))
    val df = vals.toDF("v").repartition(16)
    val digest = df.agg(Sketches.tdigest(col("v")).as("d"))
    val row = digest.select(
      Sketches.tdigestQuantile(col("d"), 0.5).as("p50"),
      Sketches.tdigestQuantile(col("d"), 0.95).as("p95"),
      Sketches.tdigestQuantile(col("d"), 0.99).as("p99")
    ).head()
    val sorted = vals.sorted
    def exactAtRank(q: Double) = sorted((q * (n - 1)).toInt)
    // rank-tolerance check: estimate must fall between exact values at q±0.01
    for ((q, est) <- Seq(0.5 -> row.getDouble(0), 0.95 -> row.getDouble(1), 0.99 -> row.getDouble(2))) {
      val lo = exactAtRank(math.max(0, q - 0.01)).toDouble
      val hi = exactAtRank(math.min(1, q + 0.01)).toDouble
      assert(est >= lo && est <= hi, s"q=$q est=$est not in [$lo,$hi]")
    }
  }

  test("tdigest digest is bounded and merge-invariant in size") {
    val df = spark.range(50000).select(col("id").as("v"))
    val d1 = df.repartition(1).agg(Sketches.tdigest(col("v")).as("d")).select(size(col("d.means"))).as[Int].head()
    val d32 = df.repartition(32).agg(Sketches.tdigest(col("v")).as("d")).select(size(col("d.means"))).as[Int].head()
    assert(d1 <= 200 && d32 <= 200) // k1 scale: ≤ δ centroids regardless of input size / layout
  }

  test("stats ledger: persisted drop summaries roll up without rescanning, overlap not double-counted") {
    import graft.sketch.StatsLedger
    val tmp = java.nio.file.Files.createTempDirectory("graft-ledger").toString
    val path = s"$tmp/ledger"
    // three overlapping drops over 0..29999, two groups (id % 2)
    val all = spark.range(30000)
      .select(col("id"), (col("id") % 2).cast("string").as("grp"), lit(5L).as("toks"))
    val preds = Seq(
      "d0" -> (col("id") < 15000),
      "d1" -> (col("id") >= 10000 && col("id") < 25000), // overlaps d0 and d2
      "d2" -> (col("id") >= 20000))
    preds.foreach { case (did, p) =>
      StatsLedger.append(path,
        StatsLedger.dropSummary(all.filter(p), did, col("grp"), col("id"), col("toks")))
    }
    val rolled = StatsLedger.corpusStats(spark, path).orderBy("group").collect()
    assert(rolled.map(_.getAs[Long]("n_drops")).toSeq === Seq(3L, 3L))
    // additive columns replay the per-drop sums (overlap double-counts by design)
    val expectRows = preds.map { case (_, p) => all.filter(p).count() }.sum
    assert(rolled.map(_.getAs[Long]("n_docs")).sum === expectRows)
    assert(rolled.map(_.getAs[Long]("total_tokens")).sum === expectRows * 5L)
    // the distinct estimate must NOT double-count the overlap: merged
    // ledger estimate == direct full-data estimate, bit-equal (the
    // union-of-sketches ≡ sketch-of-union identity), and within the
    // p=12 bound of the true 15000 per group
    val direct = all.groupBy("grp")
      .agg(Sketches.hll(xxhash64(col("id"))).as("est"))
      .orderBy("grp").select("est").as[Long].collect()
    val merged = rolled.map(_.getAs[Long]("distinct_keys_est"))
    assert(merged.toSeq === direct.toSeq, "merged-sketch estimate diverged from direct estimate")
    merged.foreach(e => assert(math.abs(e - 15000L) <= 15000 * 0.05))

    // append is idempotent per drop id: retrying an ingestion rewrites
    // that drop's partition, the rollup is unchanged
    StatsLedger.append(path,
      StatsLedger.dropSummary(all.filter(preds(1)._2), "d1", col("grp"), col("id"), col("toks")))
    val replayed = StatsLedger.corpusStats(spark, path).orderBy("group").collect()
    assert(replayed.map(_.getAs[Long]("n_drops")).toSeq === Seq(3L, 3L))
    assert(replayed.map(_.getAs[Long]("n_docs")).sum === expectRows)
  }
}
