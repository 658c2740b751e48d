package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame

/** Session-scoped registry of the storage blocks pinned by
  * operator-internal eager local checkpoints.
  *
  * Iterative operators (connected components, PageRank, Lloyd) must
  * cut lineage with an eager `localCheckpoint` or their plans grow
  * with the iteration count — but a local checkpoint pins its blocks
  * until driver GC, and across a long session the accumulation
  * degrades every later query (measured: a 142-query bench ran 1.5×
  * slower than the same queries isolated; see SURVEY §5). This
  * registry closes the loop:
  *
  *  - inside an iteration, a superseded round's blocks are released
  *    the moment the next round is materialized ([[release]]), so a
  *    k-round algorithm pins one round's blocks, not k;
  *  - the blocks that must outlive the operator call (they back the
  *    returned lazy plan) stay registered, and the harness — Verify,
  *    Bench, or any long-running caller — drops them between queries
  *    with [[releaseAll]].
  *
  * Releasing is only safe once the consuming query's results are
  * materialized: a checkpointed plan has no lineage to recompute
  * from, so re-executing a released DataFrame fails. That is the
  * contract: `releaseAll()` marks a query boundary.
  */
object Checkpoints {
  // WEAK keys: the registry is an eager-release accelerator, not an
  // ownership root. A long-lived library caller that never reaches a
  // releaseAll() boundary must not accumulate pinned blocks forever —
  // once the caller drops its last reference to a checkpointed frame,
  // the RDD becomes weakly reachable, the entry evaporates, and
  // Spark's ContextCleaner unpersists the blocks exactly as it would
  // have for a bare localCheckpoint. releaseAll() stays the eager
  // path for harnesses that mark query boundaries explicitly.
  private val tracked: java.util.Map[RDD[_], java.lang.Boolean] =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[RDD[_], java.lang.Boolean]())

  /** Eager local checkpoint whose blocks are registered for release
    * at the next query boundary. Drop-in for `df.localCheckpoint(true)`
    * in library operators. */
  def eager(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint(eager = true)
    org.apache.spark.sql.graft.CheckpointBlocks.rddOf(out)
      .foreach(tracked.put(_, java.lang.Boolean.TRUE))
    out
  }

  // A tracked RDD can outlive its SparkContext (test harnesses stop
  // and rebuild sessions); the blocks died with the context, so
  // skipping is the correct outcome. The isStopped guard handles the
  // common case; the catch covers only the guard-to-unpersist race
  // (context stopping concurrently throws IllegalStateException from
  // assertNotStopped). Anything else — an NPE from a live
  // BlockManager path included — is a real bug and propagates.
  private def unpersistQuietly(r: RDD[_]): Unit =
    if (!r.sparkContext.isStopped) {
      try r.unpersist(blocking = false)
      catch { case _: IllegalStateException => () }
    }

  /** [[eager]] that also returns the checkpoint's ROW COUNT from the
    * SAME materializing job: the checkpoint is marked lazily and the
    * count() action materializes it — one driver-synchronous job where
    * eager-then-count paid two. For loop bodies that checkpoint every
    * round AND test convergence on the round's size (kCore, khop,
    * ClusterLedger), that is one job per round saved (guide §1.2). */
  def eagerCount(df: DataFrame): (DataFrame, Long) = {
    val out = df.localCheckpoint(eager = false)
    org.apache.spark.sql.graft.CheckpointBlocks.rddOf(out)
      .foreach(tracked.put(_, java.lang.Boolean.TRUE))
    val n = out.count()
    (out, n)
  }

  /** [[eagerCount]] + [[eagerClaiming]]'s opportunistic partitioning
    * claim, read AFTER the count materialized the checkpoint (the
    * adaptive plan's final partitioning only exists post-execution). */
  def eagerCountClaiming(df: DataFrame, keys: Seq[String]): (DataFrame, Long) = {
    val (ck, n) = eagerCount(df)
    (org.apache.spark.sql.graft.GraftPlans.claimIfHashPartitioned(ck, df, keys), n)
  }

  /** [[eager]] for a loop-INVARIANT relation that per-round joins /
    * aggregates key on `keys`: physically hash-clusters the rows
    * (`repartition(n, keys)`), checkpoints, and carries the
    * partitioning claim through the lineage cut
    * ([[org.apache.spark.sql.graft.ClaimHashPartitioned]]) — so each
    * round's join exchanges only the other side, instead of
    * re-exchanging this relation every round (guide §2.4; a bare
    * checkpoint scan reports UnknownPartitioning and round 15 measured
    * pre-partitioning WITHOUT the claim as a pure regression).
    *
    * `n` defaults to the session's shuffle-partition count — the same
    * count EnsureRequirements gives the per-round exchanges, so the
    * co-partitioned joins line up without extra exchanges on either
    * side; scale-adaptive via `spark.sql.shuffle.partitions`, never a
    * pinned constant. */
  def eagerHashPartitioned(df: DataFrame, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    eagerClaiming(df.repartition(n, keys.map(col): _*), keys)
  }

  /** [[eager]] + an OPPORTUNISTIC partitioning claim: checkpoint `df`
    * exactly as given and claim `HashPartitioning(keys, n)` only if
    * the executed plan's final output partitioning actually is that
    * (read off the plan, never asserted blind — AQE-coalesced reads,
    * round-robin layouts etc. simply keep the plain checkpoint).
    *
    * The zero-extra-exchange pattern: put `repartition(n, keys)`
    * BELOW a distinct/aggregate whose grouping keys contain `keys` —
    * hash(keys) satisfies that operator's ClusteredDistribution, so
    * the repartition REPLACES the exchange the operator would have
    * inserted anyway, and the claim then rides downstream joins /
    * aggregates keyed on `keys` for free (guide §2.4; the round-15
    * attempt ADDED the exchange on top and measured a regression). */
  def eagerClaiming(df: DataFrame, keys: Seq[String]): DataFrame = {
    val ck = eager(df)
    org.apache.spark.sql.graft.GraftPlans.claimIfHashPartitioned(ck, df, keys)
  }

  /** Release the blocks behind a checkpoint produced by [[eager]]
    * right now — for loop intermediates superseded by the next
    * materialized round. No-op on non-checkpoint DataFrames, so loop
    * seeds can be passed unconditionally. */
  def release(df: DataFrame): Unit =
    org.apache.spark.sql.graft.CheckpointBlocks.rddOf(df).foreach { r =>
      if (tracked.remove(r) != null) unpersistQuietly(r)
    }

  /** Release every outstanding operator checkpoint (query boundary).
    * Returns the number of block sets released.
    *
    * JVM-global by design — a boundary declares "no in-flight plan
    * still reads an operator checkpoint". Callers running queries
    * CONCURRENTLY (e.g. a streaming foreachBatch next to a batch
    * session) must not call this mid-flight; use [[release]] on the
    * frames they own instead. */
  def releaseAll(): Int = {
    // snapshot under the map's lock (synchronizedMap iteration
    // contract), unpersist outside it — unpersist talks to the
    // BlockManager and must not hold the registry lock
    val snapshot = {
      val s = new java.util.ArrayList[RDD[_]]()
      tracked.synchronized {
        s.addAll(tracked.keySet())
        tracked.clear()
      }
      s
    }
    snapshot.forEach(unpersistQuietly(_))
    snapshot.size()
  }

  /** Outstanding operator checkpoints (diagnostics / tests). */
  def pendingCount: Int = tracked.size
}
