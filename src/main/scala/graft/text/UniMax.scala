package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** UniMax language/source budget allocation (Chung et al.,
  * arXiv:2304.09151 "UniMax: Fairer and More Effective Language
  * Sampling for Large-Scale Multilingual Pretraining", Algorithm 1) —
  * the sampling rule that replaced temperature mixing for mT5-class
  * models: give every language an equal share of the token budget,
  * except never take more than `maxEpochs` passes over what a
  * language actually has.
  *
  * The paper's algorithm is a SEQUENTIAL loop — visit languages in
  * increasing order of capped supply, give each
  * `min(capacity, remaining budget / remaining languages)` and shrink
  * the budget as you go. Re-expressed here as pure window arithmetic
  * over the per-language table (one pass, no driver loop):
  *
  *   - a language is FULLY FUNDED iff, in (capacity asc, lang asc)
  *     order, `capacity · langs_remaining ≤ budget − capacity_cum_before`
  *     held for it and every language before it (a prefix-AND of the
  *     test — once a language overflows its fair share, everything
  *     after it is budget-bound too, since capacities only grow);
  *   - the remaining budget R after funding that prefix splits evenly
  *     over the r budget-bound languages: integer fair share
  *     `q = R div r`, and the `R mod r` leftover units land on the
  *     LAST languages in the same order — exactly what the sequential
  *     `remaining div langs_left` loop produces (proved against a
  *     literal loop replay in UniMaxSpec on random instances).
  *
  * Everything is integer-exact (`div`/`mod`, milli-epoch capacities),
  * so the DuckDB oracle replays the allocation bit-for-bit.
  *
  * Scale shape: the corpus contributes ONE map-side-combined
  * aggregate (per-language token counts); the allocation itself runs
  * over #languages rows — window warnings about a single partition
  * are bounded by construction, same as the vocabZipf rank window.
  */
object UniMax {

  /** Core allocation over a per-group stats frame (ONE ROW PER GROUP;
    * tiny by construction). `budget` must be a column resolvable
    * against `perGroup` rows (callers attach it — see
    * [[allocateRelative]]). `maxEpochsMilli` caps a group's
    * allocation at tokens·maxEpochs (2000 = at most two passes over
    * any language's data).
    *
    * Returns (lang, tokens, capacity, capped, alloc, epochs_milli):
    * `capped` groups contribute everything they have; the rest split
    * the leftover evenly. Σ alloc = min(budget, Σ capacity) exactly.
    */
  def allocate(perGroup: DataFrame, group: Column, tokens: Column, budget: Column,
      maxEpochsMilli: Long): DataFrame = {
    require(maxEpochsMilli >= 1, "epoch cap must be >= 1 milli-epoch")
    val base = perGroup.select(group.as("lang"), tokens.cast("long").as("tokens"),
        budget.cast("long").as("__B"))
      .withColumn("capacity", expr(s"(tokens * ${maxEpochsMilli}L) div 1000"))
    val wOrd = Window.orderBy(col("capacity").asc, col("lang").asc)
    val wPre = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(lit(0))
    val flagged = base
      .withColumn("__idx", row_number().over(wOrd))
      .withColumn("__cum", sum(col("capacity")).over(wPre))
      .withColumn("__n", count(lit(1)).over(wAll))
      // fair-share test assuming every earlier (smaller) language was
      // fully funded: capacity · remaining ≤ budget − funded-so-far
      .withColumn("__flag",
        (col("capacity") * (col("__n") - col("__idx") + 1) <=
          col("__B") - (col("__cum") - col("capacity"))).cast("int"))
      .withColumn("capped", min(col("__flag")).over(wPre) === 1)
    flagged
      .withColumn("__cap_mass", sum(when(col("capped"), col("capacity")).otherwise(0L)).over(wAll))
      .withColumn("__ncap", sum(when(col("capped"), 1L).otherwise(0L)).over(wAll))
      // NOTE: names differ by more than case — Spark's default
      // case-insensitive resolution makes withColumn("__R") REPLACE a
      // prior "__r" silently
      .withColumn("__nbound", col("__n") - col("__ncap"))
      .withColumn("__rem", col("__B") - col("__cap_mass"))
      // leftover R splits q = R div r each; the R mod r odd units go to
      // the last languages in allocation order (1-indexed rank among
      // the budget-bound set is __idx − __ncap: the funded set is a
      // prefix, so the bound set is contiguous)
      .withColumn("alloc", when(col("capped"), col("capacity")).otherwise(
        expr("(__rem div greatest(__nbound, 1)) + " +
          "CASE WHEN (__idx - __ncap) > (__nbound - (__rem % greatest(__nbound, 1))) " +
          "THEN 1 ELSE 0 END")))
      .withColumn("epochs_milli", expr("(alloc * 1000) div greatest(tokens, 1)"))
      .select("lang", "tokens", "capacity", "capped", "alloc", "epochs_milli")
  }

  /** Corpus front end: count whitespace tokens per `group` (one
    * map-side-combined shuffle — the only corpus-sized work), set the
    * budget RELATIVE to the corpus (`total · budgetNum div budgetDen`
    * tokens — scale-free, so the same configuration exercises the
    * same capped/bound structure at every SF), and allocate. */
  def allocateRelative(df: DataFrame, group: Column, text: Column,
      budgetNum: Long, budgetDen: Long, maxEpochsMilli: Long): DataFrame = {
    require(budgetNum >= 0 && budgetDen >= 1)
    val perGroup = df.groupBy(group.as("lang"))
      .agg(sum(TextAnalysis.tokenCount(text)).cast("bigint").as("n_tokens"))
    val total = perGroup.agg(sum("n_tokens").cast("bigint").as("__total"))
    allocate(perGroup.crossJoin(broadcast(total)),
      col("lang"), col("n_tokens"),
      expr(s"(__total * ${budgetNum}L) div ${budgetDen}L"), maxEpochsMilli)
  }

  /** Unit-weight selection under an allocation: keep each group's
    * first `alloc` rows in the deterministic md5 order — the
    * cluster-balanced / per-group cap sampler for row-counted (not
    * token-weighted) budgets; [[materializeCopies]] is the
    * token-weighted, epoch-capable form. One window per group, the
    * tiny allocation broadcast. */
  def takeAllocated(df: DataFrame, group: Column, id: Column, alloc: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("__um_g"))
      .orderBy(md5(id.cast("string")).asc, id.asc)
    df.withColumn("__um_g", group)
      .join(broadcast(alloc.select(col("lang").as("__um_g"), col("alloc"))), "__um_g")
      .withColumn("__um_rn", row_number().over(w))
      .filter(col("__um_rn") <= col("alloc"))
      .drop("__um_g", "__um_rn", "alloc")
  }

  /** Materialize an allocation as per-document repeat counts — the
    * frame a training-data writer consumes. A language allocated
    * `alloc` tokens takes `alloc div tokens` FULL passes over its
    * documents plus a partial pass: documents in the deterministic
    * md5 order ([[TextPrep.sampleByTokenBudget]]'s draw) whose
    * cumulative token count starts inside `alloc mod tokens` get one
    * extra copy. Only docs with copies ≥ 1 appear. Plan shape: the
    * tiny allocation broadcast onto the corpus, one window per
    * language for the cumulative sum — the same single exchange the
    * plain budget sampler costs. */
  def materializeCopies(df: DataFrame, group: Column, text: Column, id: Column,
      alloc: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(id.cast("string")).asc, id.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(group.as("lang"), id.as("doc_id"),
        TextAnalysis.tokenCount(text).cast("long").as("n_tokens"))
      .join(broadcast(alloc.select(col("lang"), col("tokens"), col("alloc"))), "lang")
      .withColumn("__full", expr("alloc div greatest(tokens, 1)"))
      .withColumn("__part", expr("alloc % greatest(tokens, 1)"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("copies",
        col("__full") + when(col("__cum") - col("n_tokens") < col("__part"), 1L).otherwise(0L))
      .filter(col("copies") >= 1)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("copies"))
  }
}
