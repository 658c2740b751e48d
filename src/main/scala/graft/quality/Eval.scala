package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier evaluation artifacts over any (true, pred) frame — the
  * shared audit layer for every label probe in the engine (the
  * Naive-Bayes screen, the nearest-centroid probe, the kNN vote):
  * per-class one-vs-rest counts and exact milli-scaled
  * precision/recall/F1, all integer arithmetic so any engine replays
  * them bit-for-bit.
  *
  * Scale shape: three tiny aggregates over the predictions frame
  * (per-class tp / pred mass / true mass — each ≤ \|classes\| rows,
  * broadcast for assembly). The predictions frame itself is the
  * largest input and it is already probe-sized, never corpus-sized.
  */
object Eval {

  /** One row per class observed as truth OR prediction:
    * (lab, tp, fp, fn, precision_milli, recall_milli, f1_milli).
    * Undefined ratios (empty denominator) report 0 — the
    * deterministic, engine-portable convention. */
  def perClassMetrics(preds: DataFrame, truth: Column, pred: Column): DataFrame = {
    // five consumers read the predictions (class set ×2, tp, pred
    // mass, true mass) — checkpoint the probe ONCE or each aggregate
    // re-derives the full upstream probe plan (q_nb_eval measured 29
    // exchanges un-checkpointed, 4 with it)
    val p = graft.operators.Checkpoints.eager(
      preds.select(truth.cast("string").as("t"), pred.cast("string").as("p")))
    val classes = p.select(col("t").as("lab")).union(p.select(col("p"))).distinct()
    val tp = p.filter(col("t") === col("p"))
      .groupBy(col("t").as("lab")).agg(count(lit(1)).as("tp"))
    val predMass = p.groupBy(col("p").as("lab")).agg(count(lit(1)).as("n_pred"))
    val trueMass = p.groupBy(col("t").as("lab")).agg(count(lit(1)).as("n_true"))
    classes
      .join(broadcast(tp), Seq("lab"), "left")
      .join(broadcast(predMass), Seq("lab"), "left")
      .join(broadcast(trueMass), Seq("lab"), "left")
      .na.fill(0L, Seq("tp", "n_pred", "n_true"))
      .withColumn("fp", col("n_pred") - col("tp"))
      .withColumn("fn", col("n_true") - col("tp"))
      .withColumn("precision_milli",
        when(col("n_pred") === 0, 0L).otherwise(expr("(tp * 1000) div n_pred")))
      .withColumn("recall_milli",
        when(col("n_true") === 0, 0L).otherwise(expr("(tp * 1000) div n_true")))
      .withColumn("f1_milli",
        when(col("n_pred") + col("n_true") === 0, 0L)
          .otherwise(expr("(2 * tp * 1000) div (n_pred + n_true)")))
      .select("lab", "tp", "fp", "fn", "precision_milli", "recall_milli", "f1_milli")
  }
}
