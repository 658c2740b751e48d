package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.text.UniMax

/** UniMax allocation (arXiv:2304.09151 Alg. 1): the window-arithmetic
  * formulation must equal a LITERAL replay of the paper's sequential
  * waterfilling loop — including integer-division remainder drift —
  * on random instances, plus the structural edges (all capped, zero
  * budget, single language, ties). */
class UniMaxSpec extends SparkSpecBase {
  import spark.implicits._

  /** The paper's loop, verbatim with integer division: visit groups
    * in (capacity asc, lang asc) order; each takes
    * min(capacity, remaining div groupsLeft). */
  private def sequential(caps: Seq[(String, Long)], budget: Long): Map[String, Long] = {
    var rem = budget
    var left = caps.size
    val out = scala.collection.mutable.Map[String, Long]()
    for ((lang, c) <- caps.sortBy { case (l, c) => (c, l) }) {
      val share = if (left == 0) 0L else rem / left
      val a = math.min(c, share)
      out(lang) = a
      rem -= a
      left -= 1
    }
    out.toMap
  }

  private def allocate(tokens: Seq[(String, Long)], budget: Long,
      epochsMilli: Long): Map[String, Long] = {
    val df = tokens.toDF("lang", "tokens")
    UniMax.allocate(df, col("lang"), col("tokens"), lit(budget), epochsMilli)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
  }

  test("window formulation replays the sequential loop on random instances") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 40) {
      val n = 1 + rnd.nextInt(8)
      val tokens = (0 until n).map(i => (f"l$i%02d", 1L + rnd.nextInt(1000)))
      val em = 1000L * (1 + rnd.nextInt(3)) // 1..3 epoch cap
      val caps = tokens.map { case (l, t) => (l, t * em / 1000) }
      val totalCap = caps.map(_._2).sum
      // budgets straddling the interesting range, incl. over-supply
      val budget = rnd.nextInt(3) match {
        case 0 => rnd.nextLong(totalCap + 1)
        case 1 => totalCap + rnd.nextInt(100)
        case _ => totalCap / 2
      }
      val got = allocate(tokens, budget, em)
      val want = sequential(caps, budget)
      assert(got === want, s"trial $trial: tokens=$tokens budget=$budget em=$em")
      assert(got.values.sum === math.min(budget, totalCap),
        s"trial $trial allocates the full feasible budget")
    }
  }

  test("capacity ties and equal-share boundaries replay exactly") {
    // c = share exactly at a middle position (the capped/bound edge)
    val tokens = Seq(("a", 3L), ("b", 4L), ("c", 100L))
    assert(allocate(tokens, 11L, 1000L) === sequential(tokens, 11L))
    // all-equal capacities, remainder forced onto the tail
    val eq = Seq(("a", 10L), ("b", 10L), ("c", 10L))
    assert(allocate(eq, 17L, 1000L) === sequential(eq, 17L))
    assert(allocate(eq, 17L, 1000L).values.sum === 17L)
  }

  test("degenerate instances: over-supplied, zero budget, singleton") {
    assert(allocate(Seq(("a", 5L), ("b", 7L)), 1000L, 2000L)
      === Map("a" -> 10L, "b" -> 14L)) // all capped at 2 epochs
    assert(allocate(Seq(("a", 5L), ("b", 7L)), 0L, 1000L)
      === Map("a" -> 0L, "b" -> 0L))
    assert(allocate(Seq(("solo", 9L)), 4L, 1000L) === Map("solo" -> 4L))
  }

  test("materializeCopies: full epochs plus md5-ordered partial pass, by budget") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val alloc = UniMax.allocateRelative(docs, col("lang"), col("text"),
      queries.PrepParams.UnimaxBudgetNum, queries.PrepParams.UnimaxBudgetDen,
      queries.PrepParams.UnimaxEpochsMilli)
    val allocRows = alloc.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(4))).toMap
    val copies = UniMax.materializeCopies(docs, col("lang"), col("text"),
      col("doc_id"), alloc)
    // per language: Σ copies·n_tokens lands within one doc of alloc
    val perLang = copies.groupBy("lang")
      .agg(sum(col("copies") * col("n_tokens")).as("got"),
        max(col("n_tokens")).as("maxDoc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(perLang.nonEmpty)
    for ((lang, got, maxDoc) <- perLang) {
      val (_, alloc) = allocRows(lang)
      assert(got >= alloc && got < alloc + maxDoc,
        s"$lang materializes alloc=$alloc within one-doc slack, got $got")
    }
    // a budget below supply must leave at least one language partial
    assert(allocRows.values.exists { case (tokens, alloc) => alloc > tokens },
      "epoch cap admits >1 pass for at least one language at this config")
  }
}
