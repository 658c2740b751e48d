package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained pairwise reranking for the retrieval stack's last mile
  * (SURVEY.md §2.5/50f) — the stage after BM25/RRF: a linear scorer
  * over integer feature columns (BM25 score, cosine, keyness, length,
  * …) that learns from labeled examples and re-orders a candidate
  * list. Cross-encoder rerankers do this with a model; this is the
  * exact-arithmetic version a Spark pipeline can train and apply
  * in-engine.
  *
  * Training rule: the class-centroid difference (Rocchio's direction,
  * the closed-form one-pass linear discriminant):
  *   w_j = n_neg · Σ_{y=1} x_j − n_pos · Σ_{y=0} x_j
  * — the un-normalized difference of class means, cross-multiplied so
  * every quantity stays an exact integer (no division, no floats).
  * The rule is ORDER-INDEPENDENT (a perceptron pass depends on row
  * order, which no distributed engine should promise), deterministic,
  * and one aggregate over the training set. Scores are s = Σ w_j·x_j;
  * s > 0 leans positive-class. Scale of w is irrelevant to ranking.
  *
  * Overflow bound: |w_j| ≤ n·Σ|x_j| must fit a long — at 10⁶ training
  * rows keep |x_j| ≲ 10⁶ (scores then bounded by m·n²·x̄² ≲ 2⁶³);
  * past that, pre-scale features, documented not silent.
  *
  * Scale shape: training is one posexplode aggregate (feature-count ×
  * partitions partial rows shuffle — never the corpus) plus a 1-row
  * count; scoring broadcasts the single weight row and folds per-row
  * (zero shuffles). Reranking a candidate list adds one bounded
  * GroupTopK-style window per query, exactly the BM25 tail it
  * replaces.
  */
object Rerank {

  /** Learn integer weights from `train`: `label` must be 0/1.
    * Returns ONE row: (w: array<long> aligned with `features`,
    * n_pos, n_neg). Refuses single-class training sets (no direction
    * to learn — and silently returning zeros would rank arbitrarily). */
  def trainLinear(train: DataFrame, features: Seq[Column], label: Column): DataFrame = {
    require(features.nonEmpty)
    val base = train.select(
      array(features.map(_.cast("long")): _*).as("__x"),
      label.cast("long").as("__y"))
    val counts = base.agg(
      sum(col("__y")).as("n_pos"),
      sum(lit(1L) - col("__y")).as("n_neg"))
    val sums = base
      .select(col("__y"), posexplode(col("__x")).as(Seq("i", "v")))
      .groupBy("i")
      .agg(
        sum(when(col("__y") === 1L, col("v")).otherwise(0L)).as("__sp"),
        sum(when(col("__y") === 0L, col("v")).otherwise(0L)).as("__sn"))
    val out = sums.crossJoin(broadcast(counts))
      .select(col("i"),
        (col("n_neg") * col("__sp") - col("n_pos") * col("__sn")).as("w"),
        col("n_pos"), col("n_neg"))
      .groupBy("n_pos", "n_neg")
      .agg(expr("transform(array_sort(collect_list(struct(i, w))), s -> s.w)").as("w"))
      .select("w", "n_pos", "n_neg")
    val head = out.collect()
    require(head.nonEmpty, "Rerank.trainLinear: empty training set")
    require(head.head.getLong(1) > 0 && head.head.getLong(2) > 0,
      "Rerank.trainLinear: training set must contain both classes")
    // the validation collect already ran the training job — hand
    // consumers the collected row as a literal frame, so scoring /
    // reranking broadcasts one local row instead of re-running the
    // posexplode aggregate per consumer
    train.sparkSession.createDataFrame(
      java.util.Arrays.asList(head.head), out.schema)
  }

  /** Score every row: `out` = Σ w_j · feature_j (exact long). The
    * 1-row weight frame is broadcast; scoring is a narrow per-row
    * fold — zero shuffles. */
  def score(df: DataFrame, features: Seq[Column], weights: DataFrame,
      out: String = "rr_score"): DataFrame =
    df.withColumn("__x", array(features.map(_.cast("long")): _*))
      .crossJoin(broadcast(weights.select(col("w").as("__w"))))
      .withColumn(out, expr(
        "aggregate(zip_with(__x, __w, (a, b) -> a * b), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
      .drop("__x", "__w")

  /** Rerank a per-query candidate list: score, then rank within each
    * query by (score desc, tiebreak asc) — the deterministic total
    * order a downstream top-k consumes. */
  def rerank(candidates: DataFrame, query: Column, features: Seq[Column],
      weights: DataFrame, tiebreak: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    score(candidates, features, weights)
      .withColumn("rr_rank", row_number().over(
        Window.partitionBy(query).orderBy(col("rr_score").desc, tiebreak.asc)))
  }
}
