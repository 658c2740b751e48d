package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * arXiv:2302.03169): pick raw-corpus documents whose hashed n-gram
  * distribution looks like a TARGET domain. The state-of-practice
  * trained selection rule for "give me web data that reads like
  * Wikipedia/books/my eval domain" — the trained counterpart of the
  * heuristic Gopher/C4 gates and the label-driven [[NaiveBayes]]
  * screen (DSIR needs only an unlabeled target sample, not labels).
  *
  * Paper recipe, re-expressed in the engine's integer discipline:
  *
  *   - features: hashed unigrams AND bigrams (§3.1) into `buckets`
  *     md5 buckets — computed IN-ROW as one array, so the corpus
  *     contributes exactly two map-side-combined count aggregates
  *     (target model, raw model) and one per-doc weight aggregate;
  *   - bag-of-ngrams models: Laplace-smoothed bucket distributions
  *     p (target) and q (raw), log-transformed by the same
  *     fixed-point [[NaiveBayes.qlog64]] chord as the NB classifier,
  *     so every weight is an exact integer any engine reproduces;
  *   - importance weight of a document: Σ_occurrences
  *     (log p_f − log q_f) — exploded features joined against the
  *     BROADCAST ≤`buckets`-row ratio grid, summed per doc
  *     (one fingerprint-width shuffle, text never moves);
  *   - selection: the paper resamples ∝ w; the deterministic
  *     variant here takes the top-k by (weight desc, id asc) via
  *     TakeOrdered — k rows cross the wire, no global sort. A
  *     Gumbel-noise draw would need a transcendental; determinism
  *     wins for cross-engine gating (documented deviation).
  *
  * Scale shape at 100 TB: two count aggregates + one weight shuffle
  * over the raw corpus, all map-side combinable; the model/ratio
  * frames are KB-sized broadcasts at any corpus size.
  */
object Dsir {

  /** In-row hashed unigram+bigram feature array of a text column —
    * md5-bucketed, engine-portable (same hash family as
    * [[NaiveBayes.featureBucket]]). */
  def features(text: Column, buckets: Int): Column = {
    def bucket(c: Column): Column =
      pmod(conv(substring(md5(c), 1, 7), 16, 10).cast("long"), lit(buckets.toLong))
    val toks = split(trim(lower(text)), "\\s+")
    val uni = transform(toks, t => bucket(t))
    val bi = zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, b) => bucket(concat(a, lit(" "), b)))
    concat(uni, bi)
  }

  private def featureStream(df: DataFrame, text: Column, id: Column,
      buckets: Int): DataFrame =
    df.select(id.as("doc_id"), explode(features(text, buckets)).as("f"))

  /** The trained half: per-bucket log-probability RATIOS
    * qlog64(p_f) − qlog64(q_f) as one ≤`buckets`-row frame (f, dw) —
    * persistable, broadcastable, reusable across crawl drops exactly
    * like [[NaiveBayes.model]]. Every bucket materializes (Laplace
    * floor), so scoring needs no missing-key case. */
  def logRatios(target: DataFrame, targetText: Column, targetId: Column,
      raw: DataFrame, rawText: Column, rawId: Column,
      buckets: Int = 512, scaleBits: Int = 40): DataFrame = {
    val spark = raw.sparkSession
    val scale = 1L << scaleBits
    def counts(df: DataFrame, text: Column, id: Column, name: String): DataFrame =
      featureStream(df, text, id, buckets).groupBy("f")
        .agg(count(lit(1)).as(name))
    val t = counts(target, targetText, targetId, "n_t")
    val r = counts(raw, rawText, rawId, "n_r")
    val tMass = t.agg(sum("n_t").cast("bigint").as("m_t"))
    val rMass = r.agg(sum("n_r").cast("bigint").as("m_r"))
    spark.range(buckets).select(col("id").as("f"))
      .join(broadcast(t), Seq("f"), "left").na.fill(0L, Seq("n_t"))
      .join(broadcast(r), Seq("f"), "left").na.fill(0L, Seq("n_r"))
      .crossJoin(broadcast(tMass)).crossJoin(broadcast(rMass))
      .withColumn("dw",
        NaiveBayes.qlog64(expr(s"((n_t + 1) * ${scale}L) div (m_t + $buckets)")) -
          NaiveBayes.qlog64(expr(s"((n_r + 1) * ${scale}L) div (m_r + $buckets)")))
      .select(col("f"), col("dw"))
  }

  /** Per-document integer importance weights against a trained ratio
    * frame: (doc_id, iw). One broadcast join + one per-doc sum —
    * the new-drop / streaming inference half. */
  def importanceWeights(raw: DataFrame, text: Column, id: Column,
      ratios: DataFrame, buckets: Int = 512): DataFrame =
    featureStream(raw, text, id, buckets)
      .join(broadcast(ratios), Seq("f"))
      .groupBy("doc_id")
      .agg(sum("dw").as("iw"))

  /** Train on (target, raw), score raw, keep the top `k` documents by
    * (iw desc, doc_id asc): (doc_id, iw, rank). TakeOrdered ships k
    * rows; the rank window runs over the k survivors only. */
  def select(raw: DataFrame, text: Column, id: Column,
      target: DataFrame, targetText: Column, targetId: Column,
      k: Int, buckets: Int = 512, scaleBits: Int = 40): DataFrame = {
    val ratios = logRatios(target, targetText, targetId, raw, text, id, buckets, scaleBits)
    val top = importanceWeights(raw, text, id, ratios, buckets)
      .orderBy(col("iw").desc, col("doc_id").asc)
      .limit(k)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("iw").desc, col("doc_id").asc)))
  }
}
