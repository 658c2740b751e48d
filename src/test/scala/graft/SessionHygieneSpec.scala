package graft

import graft.operators.Checkpoints

/** Session-degradation guard (the regression test for the r4 bench
  * finding): operator-internal eager checkpoints must not accumulate
  * pinned storage blocks across a multi-query session, and cheap
  * queries must run as fast AFTER a pass of checkpoint-heavy
  * operators as before it.
  *
  * Would have failed on the round-4 build, where connected
  * components / PageRank / IVF / lang-profile each leaked their
  * checkpoint blocks for the rest of the session (142-query bench ran
  * 1.54× slower than the same queries isolated).
  */
class SessionHygieneSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  // checkpoint-heavy operators, as the harness runs them
  private val heavy = Seq("q_dedup_cluster", "q_pagerank", "q_triangles",
    "q_lang_profile", "q_ann_ivf", "q_cluster_star", "q_semdedup")
  // cheap join-free queries — the ones that regressed 2.7–5.3× in r4
  private val cheap = Seq("q_percentiles", "q_rank_funcs", "q_redact",
    "q_reduce_by_key", "q_count")

  private def run(names: Seq[String]): Unit = names.foreach { n =>
    SparkEntry.queries(n)(spark, sf).count()
    Checkpoints.releaseAll() // the harness's query boundary
  }

  private def timeCheap(): Double = {
    val t0 = System.nanoTime()
    run(cheap)
    (System.nanoTime() - t0) / 1e9
  }

  test("heavy operators leave no pinned blocks behind a query boundary") {
    Checkpoints.releaseAll()
    val baseline = spark.sparkContext.getPersistentRDDs.size
    run(heavy)
    assert(Checkpoints.pendingCount === 0)
    assert(spark.sparkContext.getPersistentRDDs.size === baseline,
      "operator checkpoints must be gone after releaseAll")
  }

  test("release and releaseAll are safe on already-unpersisted blocks") {
    // drain robustness: blocks can vanish under the registry (manual
    // unpersist here; context shutdown in the field — the isStopped
    // guard covers that path, untestable in-suite without killing the
    // shared session). The drain must neither throw nor double-count.
    Checkpoints.releaseAll()
    val df = Checkpoints.eager(spark.range(100).toDF("id"))
    assert(Checkpoints.pendingCount === 1)
    // rip the blocks out from under the registry
    org.apache.spark.sql.graft.CheckpointBlocks.rddOf(df)
      .foreach(_.unpersist(blocking = true))
    assert(Checkpoints.releaseAll() === 1) // drains the entry, no throw
    assert(Checkpoints.pendingCount === 0)
    // release() of an untracked frame is a no-op
    Checkpoints.release(df)
    assert(Checkpoints.releaseAll() === 0)
  }

  test("cheap queries do not degrade after a checkpoint-heavy pass") {
    run(cheap) // warmup: codegen + JIT
    val before = (1 to 3).map(_ => timeCheap()).min
    (1 to 2).foreach(_ => run(heavy))
    val after = (1 to 3).map(_ => timeCheap()).min
    val ratio = after / before
    info(f"cheap-query pass: before=$before%.2fs after=$after%.2fs ratio=$ratio%.2f")
    assert(ratio < 1.5, f"session degraded: cheap queries $ratio%.2fx slower after heavy pass")
  }
}
