package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphOps

class GraphOpsSpec extends SparkSpecBase {
  import spark.implicits._

  // graph: 1→2, 1→3, 2→3; scale=1000 → base=333, tele=(15*333)/100=49
  private def edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")

  test("pageRank iteration 1 matches hand-computed scaled-integer values") {
    // contrib: node2 ← 333 div 2 = 166; node3 ← 166 + 333 div 1 = 499
    // pr1: 1 → 49; 2 → 49 + (85*166) div 100 = 190; 3 → 49 + (85*499) div 100 = 473
    val out = GraphOps.pageRank(edges, iters = 1, scale = 1000L)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 49L, 2L -> 190L, 3L -> 473L))
  }

  test("pageRank zero iterations returns uniform base mass") {
    val out = GraphOps.pageRank(edges, iters = 0, scale = 1000L)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 333L, 2L -> 333L, 3L -> 333L))
  }

  test("pageRank sink accumulates, source decays to teleport floor") {
    val out = GraphOps.pageRank(edges, iters = 3, scale = 1000L)
      .as[(Long, Long)].collect().toMap
    assert(out(1L) === 49L)            // pure source: teleport only
    assert(out(3L) > out(2L))          // sink outranks intermediate
    assert(out(2L) > out(1L))
  }

  test("pageRank deduplicates parallel edges") {
    val dup = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val a = GraphOps.pageRank(dup, 2, 1000L).as[(Long, Long)].collect().toSet
    val b = GraphOps.pageRank(edges, 2, 1000L).as[(Long, Long)].collect().toSet
    assert(a === b)
  }

  test("pageRankWeighted splits rank proportionally to edge weight") {
    // 1→2 (w=3), 1→3 (w=1): wsum(1)=4; contrib 2 ← (333*3) div 4 = 249,
    // 3 ← (333*1) div 4 = 83; pr1: 2 → 49 + (85*249) div 100 = 260,
    // 3 → 49 + (85*83) div 100 = 119, 1 → 49
    val we = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val out = GraphOps.pageRankWeighted(we, iters = 1, scale = 1000L)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 49L, 2L -> 260L, 3L -> 119L))
  }

  test("pageRankWeighted with unit weights equals unweighted pageRank; multi-edges pre-sum") {
    val unit = edges.withColumn("w", lit(1L))
    val w = GraphOps.pageRankWeighted(unit, 3, 1000L).as[(Long, Long)].collect().toMap
    val u = GraphOps.pageRank(edges, 3, 1000L).as[(Long, Long)].collect().toMap
    assert(w === u)
    // the same edge twice at w=1 equals once at w=2 (ratios unchanged
    // here since node 1's mass splits 2:1 either way)
    val dup = Seq((1L, 2L, 1L), (1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L)).toDF("src", "dst", "w")
    val merged = Seq((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L)).toDF("src", "dst", "w")
    assert(GraphOps.pageRankWeighted(dup, 2, 1000L).as[(Long, Long)].collect().toMap
      === GraphOps.pageRankWeighted(merged, 2, 1000L).as[(Long, Long)].collect().toMap)
  }

  test("personalizedPageRank: teleport lands only on seeds, trust decays with distance") {
    // chain 1→2→3→4 plus seed 1: mass enters at 1 and halves (85%,
    // then integer floors) per hop; non-seed sources hold 0 inflow
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val out = GraphOps.personalizedPageRank(chain, seeds, iters = 3, scale = 1000L)
      .as[(Long, Long)].collect().toMap
    // base = 1000, tele = 150 on the seed only; hand-traced wave:
    // it1 (150, 850, 0, 0) → it2 (150, 127, 722, 0) →
    // it3 (150, 127, 107, 613) — the sink holds the travelling pulse
    assert(out === Map(1L -> 150L, 2L -> 127L, 3L -> 107L, 4L -> 613L))
    // a node with no path from any seed gets exactly 0
    val two = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
    val o2 = GraphOps.personalizedPageRank(two, seeds, 2, 1000L).as[(Long, Long)].collect().toMap
    assert(o2(3L) === 0L && o2(4L) === 0L)
    // seeds absent from the graph are ignored; all-absent seeds refuse
    assertThrows[IllegalArgumentException] {
      GraphOps.personalizedPageRank(chain, Seq(99L).toDF("id"), 1, 1000L)
    }
  }

  test("khopReach: frontier wave on a chain, revisits excluded, disconnected nodes never reached") {
    // chain 1→2→3→4 plus a back-edge 3→1 (must NOT re-enter the
    // frontier) and an isolated edge 8→9
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (3L, 1L), (8L, 9L)).toDF("src", "dst")
    val out = GraphOps.khopReach(g, Seq(1L).toDF("id"), hops = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out === Array((0L, 1L, 1L), (1L, 1L, 2L), (2L, 1L, 3L), (3L, 1L, 4L)))
    // seeds absent from the graph contribute nothing; saturation sticks at 0
    val sat = GraphOps.khopReach(g, Seq(8L, 77L).toDF("id"), hops = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(sat === Array((0L, 1L, 1L), (1L, 1L, 2L), (2L, 0L, 2L), (3L, 0L, 2L)))
  }

  test("triangles enumerates each triangle exactly once (K4 + tail)") {
    // K4 on {1..4} (4 triangles) + a tail 4-5-6 (none)
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("a", "b")
    val got = GraphOps.triangles(e, "a", "b")
      .as[(Long, Long, Long)].collect().sorted.toList
    assert(got === List((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("triangles matches brute force on a random graph with hubs") {
    val rnd = new scala.util.Random(7)
    // a hub node (0) connected to everything + random sparse edges —
    // the degree orientation must keep the hub's wedge set bounded
    val base = (1L to 20L).map(i => (0L, i))
    val extra = Seq.fill(40)((rnd.nextInt(21).toLong, rnd.nextInt(21).toLong))
      .filter { case (x, y) => x != y }
      .map { case (x, y) => (math.min(x, y), math.max(x, y)) }
    val edges = (base ++ extra).distinct
    val got = GraphOps.triangles(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long)].collect().toSet
    val adj = edges.toSet
    val nodes = (0L to 20L).toList
    val expect = (for {
      x <- nodes; y <- nodes if y > x && adj((x, y))
      z <- nodes if z > y && adj((y, z)) && adj((x, z))
    } yield (x, y, z)).toSet
    assert(got === expect)
    assert(got.size === got.toList.length)
  }

  test("labelPropagation: two triangles over a bridge settle into two communities") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
      .toDF("src", "dst")
    val out = GraphOps.labelPropagation(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    // hand-traced synchronous rounds (ties → min label)
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("labelPropagation matches a synchronous brute-force replay on random graphs") {
    val rnd = new scala.util.Random(31)
    val edges = Seq.fill(60)((rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
      .filter { case (a, b) => a != b }.distinct
    val sym = (edges ++ edges.map(_.swap)).distinct
    val nodes = sym.map(_._1).distinct
    var labels = nodes.map(n => n -> n).toMap
    for (_ <- 1 to 4) {
      labels = nodes.map { n =>
        val neigh = sym.filter(_._1 == n).map(e => labels(e._2))
        val best = neigh.groupBy(identity).toSeq.map { case (l, o) => (o.size, l) }
        n -> best.sortBy { case (c, l) => (-c, l) }.head._2
      }.toMap
    }
    val got = GraphOps.labelPropagation(edges.toDF("src", "dst"), iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(got === labels)
  }

  test("kCore: pendant drops, triangle survives, and a path cascades to empty") {
    // triangle 1-2-3 with pendant 4: 2-core = the triangle, deg 2 each
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val got = GraphOps.kCore(tri, k = 2L).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // path 1-2-3-4-5: every peel exposes new endpoints → empty 2-core,
    // needs MULTIPLE rounds (the cascade the bounded unroll must cover)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    assert(GraphOps.kCore(path, k = 2L).count() === 0L)
    // bounded peel: maxRounds=1 stops after one synchronous round —
    // ends dropped, the 2-3-4 remnant still present
    val one = GraphOps.kCore(path, k = 2L, maxRounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(one === Map(2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("kCore matches a local synchronous peel on random graphs") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val n = 20 + rnd.nextInt(20)
      val edges = (1 to 80).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val k = 2L + rnd.nextInt(3)
      // local replay
      var adj = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
      var changed = true
      while (changed) {
        val deg = adj.groupBy(_._1).view.mapValues(_.size).toMap
        val keep = deg.filter(_._2 >= k).keySet
        val next = adj.filter { case (a, b) => keep(a) && keep(b) }
        changed = next.size != adj.size
        adj = next
      }
      val expected = adj.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val got = GraphOps.kCore(edges.toDF("src", "dst"), k, maxRounds = 30)
        .as[(Long, Long)].collect().toMap
      assert(got === expected, s"trial $trial k=$k")
    }
  }
}
