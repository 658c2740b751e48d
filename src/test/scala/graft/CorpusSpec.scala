package graft

import org.apache.spark.sql.functions._

import graft.dedup.{Components, Decontam, Dedup}
import graft.text.{TextAnalysis, TextPrep}

/** The facade must be pure delegation: every chain row-identical to
  * the manual composition of the (individually oracle-gated)
  * operators it wraps. Runs on the real sf0.001 documents table. */
class CorpusSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
  private def corpus = Corpus(docs, col("text"), col("doc_id"))

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").as[Long].collect().toSet

  test("quality + exact dedup + near dedup chain equals manual composition") {
    val chained = corpus.qualityFilter(30).exactDedup().nearDedup().df
    val gated = docs.filter(TextAnalysis.tokenCount(col("text")) >= 30)
    val exact = Dedup.exactDedupKeyed(gated, col("text"), col("doc_id")).drop("fp", "group_n")
    val manual = Components.keepOnePerCluster(exact, col("doc_id"),
      Dedup.minhashCandidatePairs(exact, col("text"), col("doc_id")), "doc_a", "doc_b")
    assert(ids(chained) === ids(manual))
    assert(ids(chained).nonEmpty && ids(chained).size < docs.count())
  }

  test("keep-best near dedup keeps one per cluster, preferring length") {
    val kept = corpus.nearDedupKeepBest().df
    val minId = corpus.nearDedup().df
    assert(kept.count() === minId.count()) // same cluster structure, maybe different reps
  }

  test("decontaminate and screenAgainst delegate exactly") {
    val bench = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
    val rest = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0)
    val viaFacade = Corpus(rest, col("text"), col("doc_id"))
      .decontaminate(bench, col("text"), col("doc_id")).df
    val manual = Decontam.decontaminate(rest, col("text"), col("doc_id"),
      bench, col("text"), col("doc_id"), 3, 3)
    assert(ids(viaFacade) === ids(manual))

    val screened = Corpus(bench, col("text"), col("doc_id"))
      .screenAgainst(rest, col("text"), col("doc_id")).df
    val manualScreen = Dedup.minhashNovel(
      rest.select(col("doc_id"), col("text")), bench, col("text"), col("doc_id"))
    assert(ids(screened) === ids(manualScreen))
  }

  test("decontaminateSemantic drops the paraphrase, and the ledger attributes it") {
    import spark.implicits._
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val in = Seq(
      (1L, "dog tonight jumps quick the brown over lazy fox the"), // shuffled paraphrase
      (2L, "completely unrelated text about catalyst plans and wide shuffles")
    ).toDF("doc_id", "text")
    val audited = Corpus(in, col("text"), col("doc_id")).audited
      .decontaminate(bench, col("text"), col("doc_id"), n = 3, minHits = 1)
      .decontaminateSemantic(bench, col("text"), col("doc_id"), dim = 64, tau = 0.99)
    assert(ids(audited.df) === Set(2L)) // the gram screen missed doc 1; semantic caught it
    val ledger = audited.dropLedger.select("doc_id", "stage")
      .as[(Long, String)].collect().toSet
    assert(ledger === Set((1L, "decontaminate_semantic")))
  }

  test("simhash and winnow near-dedup stages equal manual composition") {
    val viaSim = corpus.nearDedupSimhash().df
    val simPairs = Dedup.simhashPairs(Dedup.simhash(docs, col("text"), col("doc_id")))
    val manualSim = Components.keepOnePerCluster(docs, col("doc_id"), simPairs, "doc_a", "doc_b")
    assert(ids(viaSim) === ids(manualSim))
    assert(ids(viaSim).nonEmpty)

    val viaWin = corpus.nearDedupWinnow().df
    val winPairs = TextAnalysis.winnowPairs(docs, col("text"), col("doc_id"))
    val manualWin = Components.keepOnePerCluster(docs, col("doc_id"), winPairs, "doc_a", "doc_b")
    assert(ids(viaWin) === ids(manualWin))
    assert(ids(viaWin).nonEmpty && ids(viaWin).size < docs.count())
  }

  test("lmQualityFilter keeps exactly the docs under the rare-token ratio") {
    val rareMax = 100L
    val scores = TextAnalysis.lmScore(docs, col("text"), col("doc_id"), rareMax)
      .select(col("doc_id"), col("n_tokens"), col("n_rare"))
      .as[(Long, Long, Long)].collect()
    // self-calibrating threshold: the corpus median rare ratio, so the
    // gate provably separates regardless of the synthetic vocabulary
    val maxRatio = scores.map { case (_, n, rare) => rare.toDouble / n }.sorted
      .apply(scores.length / 2)
    val out = corpus.lmQualityFilter(rareMax, maxRatio).df
    val expect = scores.collect { case (id, n, rare) if rare.toDouble <= maxRatio * n => id }.toSet
    assert(ids(out) === expect)
    assert(expect.nonEmpty && expect.size < scores.length,
      s"median ratio $maxRatio must separate the corpus")
    // schema untouched: the score columns do not leak
    assert(out.columns.toSeq === docs.columns.toSeq)
  }

  test("bigramQualityFilter gates on rare-bigram ratio; short docs pass") {
    val rareMax = 25L
    val scores = TextAnalysis.bigramLmScore(docs, col("text"), col("doc_id"), rareMax)
      .select(col("doc_id"), col("n_bigrams"), col("n_rare"))
      .as[(Long, Long, Long)].collect()
    val maxRatio = scores.map { case (_, n, rare) => rare.toDouble / n }.sorted
      .apply(scores.length / 2)
    val out = corpus.bigramQualityFilter(rareMax, maxRatio).df
    val expect = scores.collect { case (id, n, rare) if rare.toDouble <= maxRatio * n => id }.toSet
    assert(ids(out) === expect)
    assert(expect.nonEmpty && expect.size < scores.length)
    assert(out.columns.toSeq === docs.columns.toSeq)
    // a 1-token doc has no bigram evidence → passes the gate
    val tiny = Seq((7777L, "solo", "x", "s", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val withTiny = Corpus(docs.unionByName(tiny), col("text"), col("doc_id"))
      .bigramQualityFilter(rareMax, maxRatio).df
    assert(ids(withTiny).contains(7777L))
  }

  test("keepPplBuckets keeps exactly the selected per-language terciles") {
    val buckets = TextPrep.perplexityBuckets(docs, col("text"), col("doc_id"), col("lang"), 100L)
      .select(col("doc_id"), col("bucket")).as[(Long, Int)].collect().toMap
    val kept = corpus.keepPplBuckets(col("lang"), rareMax = 100L).df
    assert(ids(kept) === buckets.collect { case (id, b) if b <= 2 => id }.toSet)
    assert(kept.columns.toSeq === docs.columns.toSeq)
    // tail-only selection is the complement within the bucketed set
    val tail = corpus.keepPplBuckets(col("lang"), 100L, keep = Set(3)).df
    assert(ids(tail) === buckets.collect { case (id, b) if b == 3 => id }.toSet)
    assert(ids(tail).nonEmpty && (ids(tail) & ids(kept)).isEmpty)
    // audited: drops attributed to the ppl_buckets stage
    val audited = corpus.audited.keepPplBuckets(col("lang"), 100L)
    val ledger = audited.dropLedger.select($"stage", $"doc_id").as[(String, Long)].collect()
    assert(ledger.forall(_._1 == "ppl_buckets"))
    assert(ledger.map(_._2).toSet === ids(tail))
  }

  test("temperatureSample keeps the max-boost source whole and downsamples heads") {
    val out = corpus.temperatureSample(col("source")).df
    val w = TextPrep.temperatureWeights(docs, col("source"),
        TextAnalysis.tokenCount(col("text")))
      .select(col("source"), col("boost")).as[(String, Double)].collect().toMap
    val maxBoost = w.values.max
    val inBySrc = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    val outBySrc = out.groupBy("source").count().as[(String, Long)].collect().toMap
    // the most-boosted source passes entirely (p = 1)
    val tailSrc = w.maxBy(_._2)._1
    assert(outBySrc(tailSrc) === inBySrc(tailSrc))
    // every source's keep rate tracks boost/maxBoost within noise
    w.foreach { case (s, b) =>
      val rate = outBySrc.getOrElse(s, 0L).toDouble / inBySrc(s)
      val p = b / maxBoost
      assert(math.abs(rate - p) < 0.35, s"source $s: rate $rate vs p $p")
    }
    // deterministic: re-evaluation with different partitioning is identical
    assert(ids(out) === ids(Corpus(docs.repartition(13), col("text"), col("doc_id"))
      .temperatureSample(col("source")).df))
  }

  test("screenAgainst works with non-default column names on both sides") {
    // the facade accepts arbitrary Columns — a corpus named (url, body)
    // screened by a batch named (key, content) must behave exactly like
    // the default-named case
    val bench = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
    val rest = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0)
    val renamedBatch = bench.select(col("doc_id").as("key"), col("text").as("content"))
    val renamedCorpus = rest.select(col("doc_id").as("url"), col("text").as("body"))
    val screened = Corpus(renamedBatch, col("content"), col("key"))
      .screenAgainst(renamedCorpus, col("body"), col("url")).df
      .select(col("key")).as[Long].collect().toSet
    val defaultNamed = Corpus(bench, col("text"), col("doc_id"))
      .screenAgainst(rest, col("text"), col("doc_id")).df
      .select(col("doc_id")).as[Long].collect().toSet
    assert(screened === defaultNamed)
  }

  test("semanticDedup delegates to SemDedup verdicts exactly (default Auto cap)") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .withColumn("text", concat(lit("doc "), col("vec_id")))
    val viaFacade = Corpus(emb, col("text"), col("vec_id"))
      .semanticDedup(col("embedding"), tau = 0.3, numCentroids = 8, lloydIters = 1).df
    val prepared = graft.similarity.Similarity.prepareQuantized(
      emb, col("embedding"), col("vec_id"))
    val manualKeep = graft.similarity.SemDedup
      .semDedup(prepared, numCentroids = 8, lloydIters = 1, tau = 0.3)
      .filter(!col("is_dup")).select("vec_id").as[Long].collect().toSet
    val facadeIds = viaFacade.select("vec_id").as[Long].collect().toSet
    assert(facadeIds === manualKeep)
    assert(facadeIds.nonEmpty && facadeIds.size < emb.count())
    // survivors keep their full original rows
    assert(viaFacade.columns.toSeq === emb.columns.toSeq)
  }

  test("capPerSource equals the row_number selection and binds the cap") {
    val cap = 3
    val viaFacade = corpus.capPerSource(col("source"), cap).df
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(length(col("text")).desc, col("doc_id").asc)
    val manual = docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap).drop("__rn")
    assert(ids(viaFacade) === ids(manual))
    // the cap binds: no source exceeds it, and at least one source hits it
    val per = viaFacade.groupBy("source").count().as[(String, Long)].collect()
    assert(per.forall(_._2 <= cap) && per.exists(_._2 == cap))
    // custom order is honored (shortest-first flips the selection)
    val shortest = corpus.capPerSource(col("source"), cap,
      order = Seq(length(col("text")).asc, col("doc_id").asc)).df
    assert(ids(shortest) !== ids(viaFacade))
  }

  test("scrubSubstrings rewrites text in place and stays chainable") {
    val viaFacade = corpus.scrubSubstrings(windowTokens = 8).df
    val manual = graft.dedup.SubstringDedup
      .scrubDuplicatedSpans(docs, col("text"), col("doc_id"), 8)
    assert(ids(viaFacade) === ids(manual))
    // schema preserved, text rewritten to the scrubbed form
    assert(viaFacade.columns.toSet === docs.columns.toSet)
    val facadeText = viaFacade.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toMap
    val manualText = manual.select(col("doc_id"), col("clean_text"))
      .as[(Long, String)].collect().toMap
    assert(facadeText === manualText)
    // the chain continues on scrubbed text
    val chained = corpus.scrubSubstrings(8).qualityFilter(10).df
    assert(ids(chained).subsetOf(ids(viaFacade)))
  }

  test("dropLedger partitions the input and attributes each doc to its first dropping stage") {
    val audited = corpus.audited
      .qualityFilter(30)
      .nearDedup(portable = true)
      .capPerSource(col("source"), maxDocs = 15)
    val ledger = audited.dropLedger
    assert(ledger.columns.toSeq === Seq("doc_id", "stage_idx", "stage"))

    // partition property: dropped ∪ kept = input, disjoint, no doc twice
    val droppedIds = ids(ledger)
    val keptIds = ids(audited.df)
    assert(droppedIds.intersect(keptIds).isEmpty)
    assert(droppedIds ++ keptIds === ids(docs))
    assert(ledger.count() === droppedIds.size.toLong, "a doc attributed to two stages")

    // per-stage attribution matches the manual replay
    val s1 = docs.filter(TextAnalysis.tokenCount(col("text")) >= 30)
    val s2 = Components.keepOnePerCluster(s1, col("doc_id"),
      Dedup.minhashCandidatePairs(s1, col("text"), col("doc_id"), 3, 4, 2, portable = true),
      "doc_a", "doc_b")
    val s3 = org.apache.spark.sql.graft.GraftPlans.groupTopK(
      s2, Seq(col("source")), Seq(length(col("text")).desc, col("doc_id").asc), 15)
    val byStage = ledger.select($"stage", $"doc_id").as[(String, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byStage.getOrElse("quality_filter", Set.empty) === ids(docs) -- ids(s1))
    assert(byStage.getOrElse("near_dedup", Set.empty) === ids(s1) -- ids(s2))
    assert(byStage.getOrElse("cap_per_source", Set.empty) === ids(s2) -- ids(s3))
    // stage_idx follows chain order
    val idxOf = ledger.select($"stage", $"stage_idx").distinct()
      .as[(String, Int)].collect().toMap
    assert(idxOf === Map("quality_filter" -> 1, "near_dedup" -> 2, "cap_per_source" -> 3))

    // non-dropping stages contribute empty entries, and the ledger
    // requires an audited chain
    val withSplit = audited.splitAssign()
    assert(withSplit.dropLedger.count() === ledger.count())
    assert(corpus.audited.dropLedger.count() === 0L)
    intercept[IllegalStateException](corpus.qualityFilter(30).dropLedger)
  }

  test("dropLedger stays one-row-per-doc when a stage's input carries duplicate ids") {
    // duplicate ids in the audited input (e.g. .audited placed before
    // exactDedup on a corpus with repeated doc_ids) must not multiply
    // ledger rows: the post-anti-join distinct restores the contract
    val dup = docs.unionAll(docs.limit(50))
    val audited = Corpus(dup, col("text"), col("doc_id")).audited.qualityFilter(30)
    val ledger = audited.dropLedger
    val dropped = ledger.select($"doc_id").as[Long].collect()
    assert(dropped.length === dropped.distinct.length, "duplicate ledger rows for duplicated ids")
    assert(dropped.toSet === ids(dup) -- ids(audited.df))
  }

  test("splitAssign and stats close the pipeline") {
    val out = corpus.qualityFilter(30).splitAssign().df
    val splits = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(splits.keySet === Set("train", "val", "test"))
    assert(splits("train") > splits("val"))
    val st = corpus.stats(col("source"))
    assert(st.count() === 20) // 20 sources in the synthetic corpus
    // stats values match the independent aggregate
    val manual = docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(trim(col("text")), "\\s+")).cast("bigint")).as("total_tokens"))
    assert(st.orderBy("source").collect().toSeq === manual.orderBy("source").collect().toSeq)
  }
}
