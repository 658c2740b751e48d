// Hosted under org.apache.spark.sql.* because LogicalRDD is
// private[sql] — same placement technique as the native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Handle extraction for checkpointed Datasets: an (eager) local
  * checkpoint replaces the logical plan with a `LogicalRDD` over the
  * persisted internal-row RDD — that RDD is the owner of the pinned
  * storage blocks, and unpersisting it is the only way to release
  * them before driver GC. */
object CheckpointBlocks {
  def rddOf(df: Dataset[_]): Option[RDD[_]] = df.queryExecution.logical match {
    case l: LogicalRDD                              => Some(l.rdd)
    // a partitioning claim wraps the checkpoint scan it annotates —
    // the blocks are still the wrapped LogicalRDD's
    case ClaimHashPartitioned(_, _, l: LogicalRDD)  => Some(l.rdd)
    case _                                          => None
  }
}
