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
}
