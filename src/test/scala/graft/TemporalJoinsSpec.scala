package graft

import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

class TemporalJoinsSpec extends SparkSpecBase {
  import spark.implicits._

  test("asofJoin picks latest right row at-or-before, null when none") {
    val left = Seq((1L, 100L, "c1"), (1L, 50L, "c2"), (2L, 10L, "c3")).toDF("k", "ts", "name")
    val right = Seq((1L, 100L, "r100"), (1L, 60L, "r60"), (1L, 200L, "r200")).toDF("k", "rts", "tag")
    val out = TemporalJoins
      .asofJoin(left, right, "k", col("ts"), col("rts"), Seq("tag"))
      .select("name", "tag").as[(String, Option[String])].collect().toMap
    assert(out("c1") === Some("r100")) // equal ts matches (ASOF >=)
    assert(out("c2") === None)         // earliest right is 60 > 50
    assert(out("c3") === None)         // no right rows for key 2
  }

  test("asofJoinForward picks earliest right row at-or-after, null when none") {
    val left = Seq((1L, 100L, "c1"), (1L, 250L, "c2"), (2L, 10L, "c3")).toDF("k", "ts", "name")
    val right = Seq((1L, 100L, "r100"), (1L, 60L, "r60"), (1L, 200L, "r200")).toDF("k", "rts", "tag")
    val out = TemporalJoins
      .asofJoinForward(left, right, "k", col("ts"), col("rts"), Seq("tag"))
      .select("name", "tag").as[(String, Option[String])].collect().toMap
    assert(out("c1") === Some("r100")) // equal ts matches (forward ASOF <=)
    assert(out("c2") === None)         // latest right is 200 < 250
    assert(out("c3") === None)         // no right rows for key 2
    // forward/backward agree only when the match IS the exact ts
    val back = TemporalJoins.asofJoin(left, right, "k", col("ts"), col("rts"), Seq("tag"))
      .select("name", "tag").as[(String, Option[String])].collect().toMap
    assert(back("c1") === Some("r100") && back("c2") === Some("r200"))
  }

  test("asofJoinNearest picks the time-closest side, ties go backward") {
    val left = Seq((1L, 100L, "mid"), (1L, 55L, "closerBack"), (1L, 95L, "tie"), (2L, 7L, "lonely"))
      .toDF("k", "ts", "name")
    val right = Seq((1L, 50L, 50L, "r50"), (1L, 140L, 140L, "r140")).toDF("k", "rts", "rus", "tag")
    val out = TemporalJoins
      .asofJoinNearest(left, right, "k", col("ts"), col("rts"), Seq("tag", "rus"), "rus")
      .select("name", "tag").as[(String, Option[String])].collect().toMap
    assert(out("mid") === Some("r140"))        // 100: back 50 Δ50, fwd 140 Δ40 → forward
    assert(out("closerBack") === Some("r50"))  // 55: Δ5 vs Δ85
    assert(out("tie") === Some("r50"))         // 95: Δ45 both → backward wins
    assert(out("lonely") === None)             // no right rows for key 2
  }

  test("asofJoin is deterministic on duplicate (key, ts) right rows; payload from one row") {
    val left = Seq((1L, 100L, "c1")).toDF("k", "ts", "name")
    // two right rows tie exactly on (k, rts): tie-break = max payload struct,
    // and both payload columns must come from THAT row (never mixed).
    val right = Seq((1L, 100L, "a", 10L), (1L, 100L, "b", 2L)).toDF("k", "rts", "tag", "rid")
    val outs = (1 to 5).map { _ =>
      TemporalJoins.asofJoin(left, right, "k", col("ts"), col("rts"), Seq("tag", "rid"))
        .select("name", "tag", "rid").as[(String, String, Long)].collect().toSeq
    }
    assert(outs.distinct.size === 1)                    // run-to-run deterministic
    assert(outs.head === Seq(("c1", "b", 2L)))          // max struct row, columns paired
  }

  test("scd2 builds contiguous half-open intervals that asofJoin agrees with") {
    val changes = Seq(
      (1L, 100L, "bronze", 10L), (1L, 200L, "silver", 11L), (1L, 300L, "gold", 12L),
      (2L, 150L, "bronze", 20L)
    ).toDF("k", "us", "tier", "cid")
    val dim = TemporalJoins.scd2(changes, col("k"), col("us"), Seq(col("us"), col("cid")))
    val rows = dim.select("k", "tier", "valid_from_us", "valid_to_us", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(rows === Set(
      (1L, "bronze", 100L, Some(200L), false),
      (1L, "silver", 200L, Some(300L), false),
      (1L, "gold", 300L, None, true),
      (2L, "bronze", 150L, None, true)))
    // the intervals answer point-in-time lookups exactly like asofJoin
    val probes = Seq((1L, 99L, 1L), (1L, 100L, 2L), (1L, 250L, 3L), (1L, 300L, 4L), (2L, 500L, 5L))
      .toDF("k", "pts", "pid")
    val viaAsof = TemporalJoins.asofJoin(probes, changes.select(col("k"), col("us"), col("tier")),
        "k", col("pts"), col("us"), Seq("tier"))
      .select("pid", "tier").as[(Long, Option[String])].collect().toSet
    val viaDim = probes.join(dim,
        probes("k") === dim("k") && col("pts") >= col("valid_from_us") &&
          (col("valid_to_us").isNull || col("pts") < col("valid_to_us")), "left")
      .select(col("pid"), col("tier")).as[(Long, Option[String])].collect().toSet
    assert(viaDim === viaAsof)
    assert(viaAsof === Set((1L, None), (2L, Some("bronze")), (3L, Some("silver")),
      (4L, Some("gold")), (5L, Some("bronze"))))
  }

  test("intervalJoinBucketed: overlap semantics, emitted exactly once across buckets") {
    // intervals deliberately span MANY buckets (bucket=100, lengths up
    // to 1500) so a pair can co-occur in several — the collect below
    // is a BAG (Seq), so any double emission fails the multiset compare
    val rnd = new scala.util.Random(11)
    val left = Seq.fill(60)((rnd.nextInt(3).toLong, rnd.nextInt(5000).toLong)).zipWithIndex
      .map { case ((k, s), i) => (k, s, s + rnd.nextInt(1500).toLong, i.toLong) }
      .toDF("k", "as_", "ae", "aid")
    val right = Seq.fill(60)((rnd.nextInt(3).toLong, rnd.nextInt(5000).toLong)).zipWithIndex
      .map { case ((k, s), i) => (k, s, s + rnd.nextInt(1500).toLong, i.toLong) }
      .toDF("k", "bs", "be", "bid")
    val bucketed = TemporalJoins
      .intervalJoinBucketed(left, right, "k",
        col("as_"), col("ae"), col("bs"), col("be"), bucketUs = 100)
      .select("aid", "bid").as[(Long, Long)].collect().toSeq.sorted
    val naive = left.join(right, Seq("k"))
      .filter(col("as_") <= col("be") && col("bs") <= col("ae"))
      .select("aid", "bid").as[(Long, Long)].collect().toSeq.sorted
    assert(bucketed === naive)
    assert(naive.nonEmpty && naive.distinct.size === naive.size)
    // touching endpoints count as overlap; disjoint intervals don't
    val l1 = Seq((1L, 0L, 10L, 0L)).toDF("k", "as_", "ae", "aid")
    val r1 = Seq((1L, 10L, 20L, 0L), (1L, 11L, 20L, 1L)).toDF("k", "bs", "be", "bid")
    val touch = TemporalJoins.intervalJoinBucketed(l1, r1, "k",
      col("as_"), col("ae"), col("bs"), col("be"), bucketUs = 4)
      .select("bid").as[Long].collect().toSeq
    assert(touch === Seq(0L))
  }

  test("rangeJoinBucketed equals the naive inequality join") {
    val rnd = new scala.util.Random(7)
    val points = Seq.fill(300)((rnd.nextInt(3).toLong, rnd.nextInt(10000).toLong)).zipWithIndex
      .map { case ((k, t), i) => (k, t, i.toLong) }.toDF("k", "pt", "pid")
    val ivs = Seq.fill(50)((rnd.nextInt(3).toLong, rnd.nextInt(9000).toLong)).zipWithIndex
      .map { case ((k, s), i) => (k, s, s + rnd.nextInt(2000).toLong, i.toLong) }.toDF("k", "s", "e", "iid")
    val bucketed = TemporalJoins
      .rangeJoinBucketed(points, ivs, "k", col("pt"), col("s"), col("e"), bucketUs = 512)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(ivs, Seq("k"))
      .filter(col("pt") >= col("s") && col("pt") <= col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(bucketed === naive)
    assert(naive.nonEmpty)
  }

  test("coActivePairs: blocks=1 is exact, blocked modes are consistent subsets") {
    val rnd = new scala.util.Random(11)
    val events = Seq.fill(800) {
      val u = rnd.nextInt(20).toLong
      val et = s"t${rnd.nextInt(2)}"
      val us = 1700000000000000L + rnd.nextInt(4) * 86400000000L + rnd.nextInt(86400) * 1000000L
      (u, et, new java.sql.Timestamp(us / 1000L))
    }.toDF("user_id", "event_type", "ts")
    def run(blocks: Int) = TemporalJoins.coActivePairs(
      events, col("user_id"), col("event_type"), col("ts"),
      bucketUs = 10800000000L, blocks = blocks, topK = 1000)
      .select("user_a", "user_b", "n_windows").as[(Long, Long, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
    val exact = run(1)
    assert(exact.nonEmpty)
    // exact mode equals the brute-force overlap count over the
    // per-(user, type, day) interval rollup
    val iv = events.groupBy(col("user_id"), col("event_type").as("et"),
        date_trunc("DAY", col("ts")).as("d"))
      .agg(min(unix_micros(col("ts"))).as("s"), max(unix_micros(col("ts"))).as("e"))
      .as[(Long, String, java.sql.Timestamp, Long, Long)].collect()
    val brute = (for {
      (ua, eta, da, sa, ea) <- iv
      (ub, etb, db, sb, eb) <- iv
      if ua < ub && eta == etb && da == db && sa <= eb && sb <= ea
    } yield (ua, ub)).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(exact === brute)
    // a blocked run never invents pairs, and every surviving pair's
    // window count is the exact one (sampling prunes pairs, not rows)
    val sampled = run(4)
    assert(sampled.keySet.subsetOf(exact.keySet))
    sampled.foreach { case (p, n) => assert(exact(p) === n, p) }
  }

  test("attribution: hand-traced credits; equal-ts position ties break by event id") {
    // user 1: view@10, click@20 → buy@30 (first=view, last=click, n=2)
    //         click@25 also in window → n=3, last=click@25
    // user 2: two touches at the SAME ts: ids 41 < 42 → first=view(41), last=click(42)
    // user 3: touch outside the window, conversion unattributed (absent)
    // user 1 second buy@35: same three touches credit it again
    val ev = Seq(
      (1L, "view", 10L, 10L), (1L, "click", 20L, 11L), (1L, "click", 25L, 12L),
      (1L, "purchase", 30L, 13L), (1L, "purchase", 35L, 14L),
      (2L, "view", 50L, 41L), (2L, "click", 50L, 42L), (2L, "purchase", 55L, 43L),
      (3L, "view", 100L, 60L), (3L, "purchase", 500L, 61L)
    ).toDF("user_id", "event_type", "ts_us", "event_id")
    val out = graft.operators.TemporalJoins.attribution(ev,
        col("user_id"), col("event_type"), col("ts_us"), col("event_id"),
        convType = "purchase", touchTypes = Seq("click", "view"),
        windowUs = 100L, bucketUs = 32L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // conversions: 13 (n=3 v,c,c), 14 (n=3), 43 (n=2 tie: first view, last click)
    assert(out("view") === ((3L, 0L, 3L, 2 * 333333L + 500000L)))
    assert(out("click") === ((0L, 3L, 5L, 4 * 333333L + 500000L)))
    assert(!out.contains("signup"))
  }

  test("attribution equals a brute-force replay on a randomized stream") {
    val rnd = new scala.util.Random(77)
    val types = Seq("click", "view", "signup", "purchase")
    val rows = (1 to 600).map(i =>
      (rnd.nextInt(12).toLong, types(rnd.nextInt(4)), rnd.nextInt(1000).toLong, i.toLong))
    val w = 64L
    val out = graft.operators.TemporalJoins.attribution(
        rows.toDF("u", "t", "ts", "id"), col("u"), col("t"), col("ts"), col("id"),
        "purchase", Seq("click", "view", "signup"), windowUs = w, bucketUs = 17L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val convs = rows.filter(_._2 == "purchase")
    val touches = rows.filter(_._2 != "purchase")
    val perConv = convs.map { case (u, _, cts, cid) =>
      cid -> touches.filter(t => t._1 == u && t._3 >= cts - w && t._3 <= cts - 1)
        .sortBy(t => (t._3, t._4))
    }.filter(_._2.nonEmpty)
    val expect = touches.map(_._2).distinct.flatMap { ch =>
      val first = perConv.count(_._2.head._2 == ch).toLong
      val last = perConv.count(_._2.last._2 == ch).toLong
      val pairs = perConv.map(_._2.count(_._2 == ch).toLong).sum
      val micro = perConv.map(c => c._2.count(_._2 == ch).toLong * (1000000L / c._2.size)).sum
      if (pairs == 0) None else Some(ch -> ((first, last, pairs, micro)))
    }.toMap
    assert(out === expect)
  }
}
