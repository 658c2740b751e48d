package graft

import org.apache.spark.sql.functions._
import graft.operators.CoreOps._
import graft.operators.Relational._

class CoreOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def people = Seq(
    (1L, "ann", 30), (2L, "bob", 25), (3L, "cat", 30), (4L, "dan", 25), (5L, "eve", 40)
  ).toDF("id", "name", "age")

  test("mapRecords projects and computes") {
    val out = people.mapRecords(col("id"), (col("age") * 2).as("age2")).collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1))).toSet === Set((1L, 60), (2L, 50), (3L, 60), (4L, 50), (5L, 80)))
  }

  test("flatMapRecords explodes arrays") {
    val df = Seq((1L, "a b"), (2L, "c")).toDF("id", "s")
    val out = df.flatMapRecords(split(col("s"), " "), "w", col("id")).as[(Long, String)].collect().toSet
    assert(out === Set((1L, "a"), (1L, "b"), (2L, "c")))
  }

  test("distinctBy keeps deterministic representative per key") {
    val out = people.distinctBy(Seq(col("age")), Seq(col("id"))).as[(Long, String, Int)].collect().toSet
    assert(out === Set((1L, "ann", 30), (2L, "bob", 25), (5L, "eve", 40)))
  }

  test("reduceByKey aggregates with map-side combine semantics") {
    val out = people.reduceByKey(Seq(col("age")), Seq(count(lit(1)).as("n"), sum(col("id")).as("s")))
      .as[(Int, Long, Long)].collect().toSet
    assert(out === Set((30, 2L, 4L), (25, 2L, 6L), (40, 1L, 5L)))
  }

  test("splitByKey buckets by key mod n and keeps bucket column") {
    val out = people.splitByKey(col("id"), 2)
    assert(out.rdd.getNumPartitions === 2)
    val buckets = out.select("id", "bucket").as[(Long, Int)].collect().toMap
    assert(buckets === Map(1L -> 1, 2L -> 0, 3L -> 1, 4L -> 0, 5L -> 1))
    // co-location: each bucket value lives entirely in one partition
    val perPart = out.select("bucket").rdd
      .mapPartitionsWithIndex((i, it) => it.map(r => (r.getInt(0), i)).distinct)
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).distinct.length)
    assert(perPart.values.forall(_ === 1))
  }

  test("keyedJoin inner join matches by key") {
    val orders = Seq((10L, 1L), (11L, 1L), (12L, 3L)).toDF("oid", "pid")
    val out = orders.keyedJoin(people, col("pid") === col("id"), broadcastRight = true)
      .select("oid", "name").as[(Long, String)].collect().toSet
    assert(out === Set((10L, "ann"), (11L, "ann"), (12L, "cat")))
  }

  test("headRecords is deterministic top-n") {
    val out = people.headRecords(2, col("age").desc, col("id").asc).select("id").as[Long].collect().toSeq
    assert(out === Seq(5L, 1L))
  }

  test("concat + coalesce preserve content") {
    val a = people.filterRecords(col("id") <= 2)
    val b = people.filterRecords(col("id") > 2)
    val out = a.concatPartitions(b).coalescePartitions(1)
    assert(out.rdd.getNumPartitions === 1)
    assert(out.countRecords() === 5)
  }

  test("applyRecords visits every record") {
    assert(people.applyRecords(_ => ()) === 5L)
  }

  test("topKPerGroup ranks within groups") {
    val out = people.topKPerGroup(Seq(col("age")), Seq(col("id").desc), 1)
      .select("id").as[Long].collect().toSet
    assert(out === Set(3L, 4L, 5L))
  }

  test("exceptRecords / intersectRecords are set ops") {
    val a = Seq(1, 2, 3, 3).toDF("x")
    val b = Seq(2).toDF("x")
    assert(a.exceptRecords(b).as[Int].collect().toSet === Set(1, 3))
    assert(a.intersectRecords(b).as[Int].collect().toSeq === Seq(2))
  }

  test("WeightedMean aggregator matches hand computation") {
    val df = Seq((10L, 1L), (20L, 3L)).toDF("v", "w")
    val m = df.agg(graft.functions.Aggregators.weightedMean(col("v"), col("w"))).as[Double].head()
    assert(m === (10.0 * 1 + 20.0 * 3) / 4)
  }

  test("groupedJoin emits shmr's grouped (key, lefts, rights) shape, inner on key") {
    val l = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d")).toDF("k", "lv")
    val r = Seq((1L, 30L), (1L, 10L), (2L, 20L)).toDF("rk", "rv")
    val out = l.groupedJoin(r, "k", "rk", col("lv"), col("rv"))
      .as[(Long, Seq[String], Seq[Long])].collect().toSet
    // key 3 has no right rows -> absent (inner); arrays sorted
    assert(out === Set((1L, Seq("a", "b"), Seq(10L, 30L)), (2L, Seq("c"), Seq(20L))))
  }

  test("movingZScore scores against the trailing window only") {
    val df = Seq((1L, 1L, 10L), (1L, 2L, 10L), (1L, 3L, 12L), (1L, 4L, 100L))
      .toDF("k", "t", "v")
    val out = df.movingZScore(col("k"), Seq(col("t")), col("v"), lookback = 10)
      .select("t", "z").as[(Long, Double)].collect().toMap
    // t=1: no history; t=2: one row; t=3: window [10,10] has zero
    // variance — all dropped. Only t=4 scores, against [10,10,12]:
    // mean 32/3, sample sd sqrt(4/3)/... = 1.1547, z ≈ 77.365
    assert(out.keySet === Set(4L))
    assert(math.abs(out(4L) - 77.365) < 0.001)
  }

  test("histogram bins by floor division") {
    val out = Seq(("a", 0L), ("a", 19L), ("a", 20L), ("b", 45L)).toDF("g", "v")
      .histogram(Seq(col("g")), col("v"), binWidth = 20L)
      .as[(String, Long, Long)].collect().toSet
    assert(out === Set(("a", 0L, 2L), ("a", 1L, 1L), ("b", 2L, 1L)))
  }

  test("pearson is exact on perfectly correlated and anti-correlated data") {
    val df = Seq(("p", 1L, 10L), ("p", 2L, 20L), ("p", 3L, 30L),
      ("m", 1L, 30L), ("m", 2L, 20L), ("m", 3L, 10L)).toDF("g", "x", "y")
    val out = df.pearson(Seq(col("g")), col("x"), col("y"))
      .select("g", "r").as[(String, Double)].collect().toMap
    assert(math.abs(out("p") - 1.0) < 1e-12)
    assert(math.abs(out("m") + 1.0) < 1e-12)
  }

  test("retention buckets users by first-activity cohort") {
    // period = 100 µs for the test; user 1 starts period 0, active 0 and 2;
    // user 2 starts period 2, active 2 only; user 3 starts 0, active 0,1
    val ev = Seq((1L, 10L), (1L, 250L), (2L, 210L), (3L, 50L), (3L, 150L), (3L, 199L))
      .toDF("u", "us")
    val out = ev.retention(col("u"), col("us"), periodUs = 100L)
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((0L, 0L, 2L), (0L, 2L, 1L), (0L, 1L, 1L), (2L, 0L, 1L)))
  }

  test("funnel enforces strict stage ordering") {
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, 10L, "signup"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2: purchase BEFORE click — purchase stage not reached
      (2L, 10L, "signup"), (2L, 30L, "click"), (2L, 20L, "purchase"),
      // user 3: no signup — never enters the funnel
      (3L, 10L, "click"), (3L, 20L, "purchase"),
      // user 4: signup only
      (4L, 10L, "signup")
    ).toDF("u", "t", "s")
    val out = ev.funnel(col("u"), col("t"), col("s"), Seq("signup", "click", "purchase"))
      .as[(String, Long)].collect().toMap
    assert(out === Map("signup" -> 3L, "click" -> 2L, "purchase" -> 1L))
  }

  test("sampleByHash is deterministic and key-stable across partitionings") {
    val a = spark.range(2000).toDF("id").sampleByHash(col("id"), 30)
      .as[Long].collect().toSet
    val b = spark.range(2000).toDF("id").repartition(13).sampleByHash(col("id"), 30)
      .as[Long].collect().toSet
    assert(a === b)                       // partitioning-independent
    assert(a.size > 450 && a.size < 750)  // ~30% of 2000
  }

  test("quantileNormalize maps scores to within-group rank per-mille; singleton pins to 0") {
    val df = Seq(
      ("a", 10L, 1L), ("a", 20L, 2L), ("a", 30L, 3L), ("a", 40L, 4L), ("a", 50L, 5L),
      ("b", 1000L, 6L), ("b", 2000L, 7L), // different scale, same quantiles
      ("c", 7L, 8L)                       // singleton group
    ).toDF("g", "score", "id")
    val out = df.quantileNormalize(col("g"), col("score"), col("id"))
      .select("g", "id", "pct_pm").as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // group a: 5 rows → 0, 250, 500, 750, 1000
    assert((1L to 5L).map(i => out(("a", i))) === Seq(0L, 250L, 500L, 750L, 1000L))
    // group b's wildly different scale lands on the SAME grid — the point
    assert(out(("b", 6L)) === 0L && out(("b", 7L)) === 1000L)
    assert(out(("c", 8L)) === 0L)
  }

  test("blockJackknife: planted outlier block moves lo/hi; uniform data stays tight") {
    // 64 uniform values + one block-concentrated outlier burst: keys
    // chosen so the burst hashes into a single block by construction
    val base = (0L until 64L).map(i => ("t", 100L, i))
    val out0 = base.toDF("g", "v", "k")
      .blockJackknife(col("g"), col("v"), col("k"), blocks = 8)
      .select("n", "mean", "lo", "hi").as[(Long, Long, Long, Long)].head()
    assert(out0 === ((64L, 100L, 100L, 100L))) // constant data: loo means all equal
    // add heavy rows all under ONE key (one block): dropping that
    // block must pull the mean down to ~the base value
    val spiked = base ++ Seq.fill(8)(("t", 10000L, 999L))
    val out1 = spiked.toDF("g", "v", "k")
      .blockJackknife(col("g"), col("v"), col("k"), blocks = 8)
      .select("n", "mean", "lo", "hi").as[(Long, Long, Long, Long)].head()
    assert(out1._2 > 1000L, out1.toString)  // spike dominates the mean
    assert(out1._3 <= 110L, out1.toString)  // leave the spike block out → base mean
    assert(out1._4 >= out1._2)              // dropping a base block raises it
  }

  test("frequentPairs counts basket pairs with exact confidence and lift") {
    // baskets: {1,2,3}, {1,2}, {2,3}, {4} → pair (1,2) in 2 of 4,
    // cnt_1=2, cnt_2=3, lift = 1000·2·4/(2·3) = 1333
    val df = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L), (10L, 2L), // dup item must not double-count
      (11L, 1L), (11L, 2L),
      (12L, 2L), (12L, 3L),
      (13L, 4L)
    ).toDF("o", "it")
    val out = df.frequentPairs(col("o"), col("it"), k = 10)
      .select("part_a", "part_b", "cnt", "conf_a_pm", "lift_pm")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(out((1L, 2L))._3 === 2L)
    assert(out((1L, 2L))._4 === 1000L)           // conf(1→2) = 2/2
    assert(out((1L, 2L))._5 === 1333L)           // lift
    assert(out((2L, 3L))._3 === 2L)
    assert(out((2L, 3L))._4 === (1000L * 2 / 3)) // conf(2→3) = 2/3
    assert(!out.contains((1L, 4L)))              // never co-bought
  }

  test("sessionize splits on gap") {
    val ev = Seq(
      (1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:10:00"), (1L, "2024-01-01 01:00:00"),
      (2L, "2024-01-01 00:00:00")
    ).toDF("user_id", "s").withColumn("ts", to_timestamp(col("s")))
    val out = ev.sessionize(col("user_id"), col("ts"), 30L * 60 * 1000000)
      .select("user_id", "session_id").as[(Long, Long)].collect()
    assert(out.count { case (u, sid) => u == 1L && sid == 1L } === 2)
    assert(out.count { case (u, sid) => u == 1L && sid == 2L } === 1)
    assert(out.count { case (u, sid) => u == 2L && sid == 1L } === 1)
  }
}
