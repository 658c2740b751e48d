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
}
