package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009)
  * over quality signals: each signal contributes
  * ⌊SCALE / (K + rank)⌋ with rank the document's 1-based position
  * under that signal (descending, doc-id tiebreak); the fused score
  * is the sum. Rank fusion needs no calibration between signals —
  * only their orderings matter — which is exactly why production
  * curation stacks (multiple heuristic + model scores of wildly
  * different scales) reach for it.
  *
  * Everything is integer: ranks come from
  * [[graft.operators.Ordering.globalRank]] (range shuffle +
  * per-partition offsets — no single-task window at any corpus
  * size), contributions are integer division, the sum is exact. Any
  * integer signal drops in: LM scores, NB log-odds, DSIR weights,
  * the in-row heuristics.
  *
  * Scale shape: one range exchange PER SIGNAL (the unavoidable cost
  * of a true global ordering) over narrow (id, signal) rows, then
  * ONE hash aggregate over the unioned contributions. The signal
  * frame is checkpointed once, not recomputed per signal.
  */
object Ensemble {

  def rrf(df: DataFrame, id: Column, signals: Seq[(String, Column)],
      k: Long = 60L, scale: Long = 1000000L): DataFrame = {
    require(signals.nonEmpty)
    val base = graft.operators.Checkpoints.eager(
      df.select(id.as("__id") +: signals.map { case (n, c) => c.as(s"__s_$n") }: _*))
    val parts = signals.map { case (n, _) =>
      graft.operators.Ordering
        .globalRank(base.select(col("__id"), col(s"__s_$n").as("__s")),
          Seq(col("__s").desc, col("__id").asc), "__r")
        .select(col("__id"),
          expr(s"${scale}L div (${k}L + __r + 1L)").as("__c"))
    }
    parts.reduce(_ unionAll _)
      .groupBy("__id")
      .agg(sum("__c").as("rrf_score"), count(lit(1)).as("n_signals"))
      .select(col("__id").as("id"), col("rrf_score"), col("n_signals"))
  }
}
