package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff between two versions of a keyed table — the audit
  * step of an incremental corpus pipeline (what did this crawl drop
  * add/remove/rewrite?), complementing `Dedup.minhashNovel` (which
  * screens CONTENT novelty; this tracks KEY-level lifecycle).
  *
  * Classifies every key present in either snapshot as
  * `added` / `removed` / `changed` / `unchanged` by comparing a
  * content fingerprint. Reference analog: shmr pipelines re-derive
  * this by joining dataset versions manually (no built-in op) — here
  * it is one operator with one plan shape.
  *
  * Scale shape: both sides are projected to (key, md5-fingerprint) AT
  * THE SCAN (Catalyst prunes every other column before the exchange),
  * then a single full-outer shuffle join on the key. The shuffle
  * carries ~48 bytes/row regardless of document size — diffing two
  * 100 TB snapshots moves only the fingerprint table. No broadcast
  * hint: the sides are comparable in size by construction, and AQE
  * can still elect one if a side turns out tiny. md5 (not xxhash64)
  * so the fingerprint is engine-portable and the operator is
  * oracle-gated end-to-end (q_corpus_diff).
  *
  * Contract: each snapshot has at most one row per key (a corpus id;
  * enforce upstream with `exactDedup`/`distinctBy` if unsure) — a
  * duplicated key would fan out through the full-outer join. Null
  * content is legal: null-vs-null compares `unchanged`,
  * null-vs-value `changed` (null-safe equality), matching the
  * oracle's IS DISTINCT FROM.
  */
object TableDiff {

  /** One row per key in either snapshot: (keyName, status).
    * Per-side Column params — the two frames may carry different
    * column names for the same role (and Columns resolve against the
    * frame they meet, so sharing one param across sides is the
    * name-collision trap). */
  def snapshotDiff(
      old: DataFrame,
      neu: DataFrame,
      oldKey: Column,
      newKey: Column,
      oldContent: Column,
      newContent: Column,
      keyName: String = "id"
  ): DataFrame = {
    // presence markers are separate from the fingerprint: a null
    // fingerprint means null CONTENT, not a missing row
    val o = old.select(oldKey.as("__td_okey"),
      md5(oldContent.cast("string")).as("__td_ofp"), lit(1).as("__td_op"))
    val n = neu.select(newKey.as("__td_nkey"),
      md5(newContent.cast("string")).as("__td_nfp"), lit(1).as("__td_np"))
    o.join(n, col("__td_okey") === col("__td_nkey"), "full_outer")
      .select(
        coalesce(col("__td_nkey"), col("__td_okey")).as(keyName),
        when(col("__td_op").isNull, lit("added"))
          .when(col("__td_np").isNull, lit("removed"))
          .when(!(col("__td_ofp") <=> col("__td_nfp")), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** The one-line summary a pipeline gates on (e.g. "refuse to
    * promote if >5% of the corpus changed"): status → row count. */
  def snapshotDiffStats(diff: DataFrame): DataFrame =
    diff.groupBy(col("status")).agg(count(lit(1)).as("n"))

  /** Distribution-drift report between a reference corpus and an
    * incoming drop: bucket both sides by the same integer signal and
    * compare per-bucket PROPORTIONS with cross-multiplied integers —
    * drift_b = n_new_b·T_ref − n_ref_b·T_new is exactly zero when the
    * bucket's share is unchanged, positive where the drop
    * over-represents the bucket, and the per-mille shares make the
    * report human-readable. The "did the length/score distribution of
    * this crawl shift" gate, with no floats anywhere (a χ²-style
    * statistic would need division; proportion drift ranks buckets
    * identically for a fixed pair of totals).
    *
    * Plan shape: one conditional-sum aggregate per bucket over the
    * union (map-side combined), the 2-value totals broadcast back —
    * everything after the aggregate is |buckets|-row arithmetic.
    * Output: (bucket, n_ref, n_new, share_ref_pm, share_new_pm,
    * drift). */
  def distributionDrift(ref: DataFrame, neu: DataFrame,
      refBucket: Column, newBucket: Column): DataFrame =
    driftAgainstProfile(
      ref.select(refBucket.cast("long").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_ref")),
      neu, newBucket)

  /** [[distributionDrift]] against a PRECOMPUTED reference profile
    * (bucket, n_ref) — the build-once form: the reference corpus is
    * summarized a single time and every drop (or every streaming
    * trigger) compares against the stored profile without touching
    * the reference again. Same output columns, same integer math. */
  def driftAgainstProfile(refCounts: DataFrame, neu: DataFrame,
      newBucket: Column): DataFrame = {
    val newCounts = neu.select(newBucket.cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_new"))
    val counts = refCounts
      .select(col("bucket").cast("long").as("bucket"), col("n_ref").cast("long").as("n_ref"))
      .join(newCounts, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val totals = counts.agg(
      sum("n_ref").as("__tr"), sum("n_new").as("__tn"))
    counts.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_ref"), col("n_new"),
        expr("(1000 * n_ref) div greatest(__tr, 1)").as("share_ref_pm"),
        expr("(1000 * n_new) div greatest(__tn, 1)").as("share_new_pm"),
        (col("n_new") * col("__tr") - col("n_ref") * col("__tn")).as("drift"))
  }
}
