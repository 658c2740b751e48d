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

  /** Exact grouped AUC via the Mann–Whitney rank-sum identity
    * (Hanley & McNeil 1982): AUC = (R − n⁺(n⁺+1)/2) / (n⁺·n⁻) where
    * R is the sum of the positives' ranks under score order with
    * ties given their AVERAGE rank — the textbook estimator, kept
    * all-integer by carrying 2× the rank sum (a tied run starting at
    * min-rank `lo` with `m` members has 2·avg = 2·lo + m − 1, an
    * integer no matter the run length). Emits per group: n_pos,
    * n_neg, auc_num = 2R − n⁺(n⁺+1), auc_den = 2·n⁺·n⁻, and
    * auc_milli = (num·1000) div den (NULL when a group has no
    * positives or no negatives — AUC is undefined there, and NULL is
    * the engine-portable convention). auc_num/auc_den carry the
    * exact rational for consumers that need more than milli.
    *
    * Scale shape: ONE group-keyed exchange — the rank window and the
    * (group, score) tie-run count share the same hash-on-group
    * distribution (the second window's clustering is a superset of
    * the first's partitioning) — then a group-sized aggregate.
    * Integer bound: 2R ≤ 2n² and num·1000 must fit a long, exact to
    * ~2²⁷ rows per group; beyond, pre-bucket scores (the rank-sum
    * over bucket mid-ranks) or stratify — documented, not silent. */
  def aucExact(df: DataFrame, group: Column, score: Column,
      positive: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byG = Window.partitionBy("__g")
    df.select(group.as("__g"), score.cast("long").as("__s"),
        positive.cast("boolean").as("__pos"))
      .withColumn("__rk", rank().over(byG.orderBy(col("__s").asc)))
      .withColumn("__m",
        count(lit(1)).over(Window.partitionBy(col("__g"), col("__s"))))
      .groupBy(col("__g").as("g"))
      .agg(
        sum(when(col("__pos"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("__pos"), 1L).otherwise(0L)).as("n_neg"),
        sum(when(col("__pos"), expr("2 * __rk + __m - 1")).otherwise(0L)).as("__r2"))
      .withColumn("auc_num", col("__r2") - col("n_pos") * (col("n_pos") + 1))
      .withColumn("auc_den", col("n_pos") * col("n_neg") * 2)
      .withColumn("auc_milli",
        when(col("auc_den") === 0, lit(null).cast("long"))
          .otherwise(expr("(auc_num * 1000) div auc_den")))
      .select("g", "n_pos", "n_neg", "auc_num", "auc_den", "auc_milli")
  }
}
