package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination (SURVEY.md §2.3/22be): flag training
  * documents that share at least `minHits` distinct word n-grams with
  * any document of an evaluation/benchmark set — the test-set
  * contamination screen every serious pretraining pipeline runs
  * (GPT-3's 13-gram and LLaMA's n-gram overlap checks are this
  * operator with different parameters).
  *
  * Shape for 100 TB: the corpus side explodes to (doc, gram) rows and
  * NEVER shuffles on content — the benchmark side is small by nature
  * (eval suites are MBs, not TBs), so its gram set is broadcast and
  * the only exchange is the per-(doc, bench) hit count aggregate,
  * bounded by actual overlaps rather than corpus size. Shingling is
  * the native codegen [[org.apache.spark.sql.graft.WordShingles]]
  * via [[Dedup.shingles]] (distinct per document, so `count` equals
  * distinct shared grams).
  */
object Decontam {

  /** (doc_id, bench_id, n_hits) for every corpus×benchmark pair with
    * `n_hits >= minHits` distinct shared n-grams. */
  def ngramContamination(
      corpus: DataFrame, text: Column, id: Column,
      bench: DataFrame, benchText: Column, benchId: Column,
      n: Int, minHits: Long): DataFrame = {
    require(n >= 1 && minHits >= 1)
    val cg = corpus.select(id.as("doc_id"), explode(Dedup.shingles(text, n)).as("g"))
    val bg = bench.select(benchId.as("bench_id"), explode(Dedup.shingles(benchText, n)).as("g"))
    cg.join(broadcast(bg), "g")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
  }

  /** The clean corpus: drop every document flagged against any
    * benchmark document — the removal step downstream of the audit
    * view above. */
  def decontaminate(
      corpus: DataFrame, text: Column, id: Column,
      bench: DataFrame, benchText: Column, benchId: Column,
      n: Int, minHits: Long): DataFrame = {
    val flagged = ngramContamination(corpus, text, id, bench, benchText, benchId, n, minHits)
      .select(col("doc_id").as("__contaminated_id")).distinct()
    corpus.join(flagged, id === col("__contaminated_id"), "left_anti")
  }
}
