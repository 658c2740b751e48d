package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Pipeline-level persistence scoping.
  *
  * Library operators in graft stay lazy on purpose: an eager
  * checkpoint inside an operator pins blocks until driver GC, and
  * across a many-query session the accumulation degrades everything
  * (measured: 60 s → 80 s full bench; see SURVEY §5). When a CALLER
  * knows a relation feeds several expensive consumers — a gram table
  * before a self-join, a cleaned corpus before N analyses — the right
  * tool is a persist whose lifetime the caller scopes explicitly.
  * `withPersisted` makes the unpersist impossible to forget.
  */
object Pipelines {

  /** Persist `df` for the duration of `body`, then release the blocks
    * (blocking unpersist — the memory is back before this returns).
    * The body receives the SAME DataFrame, now backed by the cache;
    * results computed inside must be materialized (collected/written)
    * before the block exits, or they will recompute from lineage. */
  def withPersisted[T](df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK)(body: DataFrame => T): T = {
    df.persist(level)
    try body(df)
    finally df.unpersist(blocking = true)
  }

  /** Scope several relations at once (e.g. dims + a pruned fact). */
  def withPersistedAll[T](dfs: Seq[DataFrame],
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK)(body: => T): T = {
    dfs.foreach(_.persist(level))
    try body
    finally dfs.foreach(_.unpersist(blocking = true))
  }
}
