package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CoreOps._
import graft.sources.Tables
import graft.text.{TextAnalysis, TextPrep}

/** SURVEY.md §2.5 — text analysis queries + DuckDB oracles.
  * All integer intermediates / fixed-operand double divisions, so
  * values are bit-identical across engines. */
object TextQueries {

  private val stopList = TextAnalysis.enStopwords

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.5/50c TextRank keywords: PageRank over the token
    // co-occurrence graph (2-token window, in-row pair generation,
    // vocabulary-sized edge set) — rewards connectivity, not raw
    // frequency; 3 fixed scaled-integer iterations, oracle replays
    // the whole chain.
    "q_textrank" -> ((s, dir) =>
      TextAnalysis.textRank(Tables.documents(s, dir), col("text"))),

    // §2.5/31p vocabulary-coverage curve: occurrence mass covered by
    // the top-k vocab entries per budget k — the vocab-sizing report;
    // range-shuffled global rank, integer per-mille.
    "q_vocab_coverage" -> ((s, dir) =>
      TextAnalysis.vocabCoverage(Tables.documents(s, dir), col("text"),
        Seq(1L, 2L, 4L, 8L, 16L, 32L))),

    // §2.5/32 token counting: whitespace + BPE-ish pre-tokenizer.
    "q_token_count" -> ((s, dir) =>
      Tables.documents(s, dir).mapRecords(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("bigint").as("n_tokens"),
        TextAnalysis.bpeTokenCount(col("text")).cast("bigint").as("n_subtokens")
      )),

    // §2.5/31 quality scoring: type/token ratio, stopword ratio,
    // mean token length, composite score.
    "q_quality" -> ((s, dir) => {
      val toks = TextAnalysis.tokenize(col("text"))
      val lowerToks = transform(toks, t => lower(t))
      val nTokens = size(toks)
      val nTypes = size(array_distinct(toks))
      val stopHits = TextAnalysis.vocabHits(lowerToks, stopList)
      val charSum = TextAnalysis.sumTokenLengths(toks)
      val ttr = nTypes.cast("double") / nTokens
      val stopRatio = stopHits.cast("double") / nTokens
      Tables.documents(s, dir).mapRecords(
        col("doc_id"),
        nTokens.cast("bigint").as("n_tokens"),
        nTypes.cast("bigint").as("n_types"),
        stopHits.cast("bigint").as("stop_hits"),
        charSum.cast("bigint").as("char_sum"),
        ttr.as("ttr"),
        stopRatio.as("stop_ratio"),
        (ttr * 0.5 + stopRatio * 0.5).as("quality_score")
      )
    }),

    // §2.5/30 language ID (stopword-hit argmax, deterministic ties).
    "q_lang_id" -> ((s, dir) =>
      Tables.documents(s, dir).mapRecords(
        col("doc_id"),
        TextAnalysis.langId(col("text")).as("pred_lang")
      )),

    // §2.5/30b char-ngram language profiles: train per-lang top-50
    // 3-gram profiles on the corpus, then classify every doc by
    // broadcast-join gram voting (deterministic integer scores).
    "q_lang_profile" -> ((s, dir) =>
      TextAnalysis.langProfileAndClassify(
        Tables.documents(s, dir), col("text"), col("doc_id"), col("lang"))),

    // §2.5/42 PII redaction (chained engine-portable regexes); output
    // keyed by content hash so the oracle compares redacted payloads.
    "q_redact" -> ((s, dir) =>
      Tables.documents(s, dir).mapRecords(
        col("doc_id"),
        md5(TextPrep.redactPii(col("text"))).as("redacted_md5")
      )),

    // §2.5/42b regex extraction surface: per-doc counts of all / distinct
    // long lowercase runs (regexp_extract_all — codegen'd, row-parallel).
    "q_regex_extract" -> ((s, dir) =>
      Tables.documents(s, dir).mapRecords(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit("[a-z]{5,}"), lit(0))).cast("bigint").as("n_long"),
        size(array_distinct(regexp_extract_all(col("text"), lit("[a-z]{5,}"), lit(0))))
          .cast("bigint").as("n_long_distinct")
      )),

    // §2.5/43 deterministic train/val/test hash split.
    "q_split_assign" -> ((s, dir) =>
      Tables.documents(s, dir).mapRecords(
        col("doc_id"),
        TextPrep.splitAssign(col("doc_id")).as("split")
      )),

    // §2.5/44 overlapping token chunking (context-window prep).
    "q_chunk" -> ((s, dir) =>
      TextPrep.chunkTokens(Tables.documents(s, dir), col("text"), col("doc_id"),
          chunkSize = 50, overlap = 10)
        .mapRecords(col("doc_id"), col("chunk_id"), col("n_tokens"),
          md5(col("chunk")).as("chunk_md5"))),

    // §2.5/45 word-repetition screen (Gopher-style quality rule).
    "q_repetition" -> ((s, dir) =>
      TextPrep.repetitionRatio(Tables.documents(s, dir), col("text"), col("doc_id"))),

    // §2.5/43b deterministic token-budget sampling: a fixed token
    // budget per source in md5-hash order (uniform, rerun-stable,
    // prefix-monotone in the budget). Budget shared via PrepParams.
    "q_token_sample" -> ((s, dir) =>
      TextPrep.sampleByTokenBudget(
          Tables.documents(s, dir), col("source"), col("doc_id"),
          graft.text.TextAnalysis.tokenCount(col("text")),
          budget = PrepParams.SampleTokenBudget)
        .select(col("doc_id"), col("source"), col("n_tokens"))),

    // §2.5/45b corpus-frequency boilerplate removal: n-grams in >=
    // BoilerMinDocFreq distinct docs are boilerplate; every covered
    // token position is scrubbed and the text rebuilt in order.
    // Parameters shared with the oracle via PrepParams.
    "q_boilerplate" -> ((s, dir) =>
      TextPrep.removeFrequentGrams(Tables.documents(s, dir), col("text"), col("doc_id"),
        n = PrepParams.BoilerN, minDocFreq = PrepParams.BoilerMinDocFreq)),

    // §2.5/31b unigram-LM quality score (CCNet-style perplexity proxy,
    // integer-exact; rare threshold shared with the oracle via
    // PrepParams).
    "q_lm_score" -> ((s, dir) =>
      TextAnalysis.lmScore(Tables.documents(s, dir), col("text"), col("doc_id"),
        rareMax = PrepParams.LmRareMax)),

    // §2.5/31d CCNet head/middle/tail buckets: per-language terciles
    // of the unigram-LM mean-frequency proxy, assigned by broadcast
    // percentile cutoffs (no per-language sort).
    "q_ppl_buckets" -> ((s, dir) =>
      TextPrep.perplexityBuckets(Tables.documents(s, dir), col("text"), col("doc_id"),
        col("lang"), rareMax = PrepParams.LmRareMax)),

    // §2.5/31c bigram-LM quality score: the order-2 CCNet proxy —
    // catches shuffled/template-stitched text whose unigrams are all
    // corpus-common but whose word PAIRS are unseen. Integer-exact;
    // rare threshold shared with the oracle via PrepParams.
    "q_bigram_lm" -> ((s, dir) =>
      TextAnalysis.bigramLmScore(Tables.documents(s, dir), col("text"), col("doc_id"),
        rareMax = PrepParams.BgRareMax)),

    // §2.5/31c2 interpolated Kneser–Ney bigram LM (the KenLM/CCNet
    // family member): continuation-probability backoff scores text by
    // how many distinct contexts its words complete, not raw pair
    // frequency. qlog64 fixed-point — the whole likelihood replays
    // bit-for-bit in the oracle's CTE chain.
    "q_kn_lm" -> ((s, dir) =>
      TextAnalysis.knBigramScore(Tables.documents(s, dir), col("text"), col("doc_id"))),

    // §2.5/50e BM25-ranked retrieval: Okapi weighting (Lucene
    // positive-idf form) in exact integer arithmetic — one floor
    // division per (doc, term), so the ranking replays bit-for-bit.
    // The query-vocabulary filter runs BEFORE the tf aggregate's
    // exchange; top-k is TakeOrdered, no global sort.
    "q_bm25" -> ((s, dir) =>
      graft.text.Search.bm25Rank(Tables.documents(s, dir), col("text"), col("doc_id"),
        terms = PrepParams.Bm25Terms, topK = PrepParams.Bm25TopK)),

    // §2.5/50f trained linear reranker: class-centroid-difference
    // weights (exact cross-multiplied integers, order-independent —
    // the one-pass linear discriminant) learned on the doc_id%5≠0
    // split with label lang='en' over four integer features (tokens,
    // chars, distinct tokens, digit chars), then the held-out docs
    // reranked per source by Σw·x. The oracle replays training AND
    // scoring; ranks are the deterministic (score desc, id) order.
    "q_rerank" -> ((s, dir) => {
      val toks = split(trim(col("text")), "\\s+")
      val f = Tables.documents(s, dir).select(
        col("doc_id"), col("source"), col("lang"),
        size(toks).cast("long").as("f1"),
        col("n_chars").cast("long").as("f2"),
        size(array_distinct(toks)).cast("long").as("f3"),
        length(regexp_replace(col("text"), "[^0-9]", "")).cast("long").as("f4"))
      val feats = Seq(col("f1"), col("f2"), col("f3"), col("f4"))
      val w = graft.text.Rerank.trainLinear(
        f.filter(pmod(col("doc_id"), lit(5)) =!= 0), feats,
        (col("lang") === "en").cast("long"))
      graft.text.Rerank.rerank(
          f.filter(pmod(col("doc_id"), lit(5)) === 0),
          col("source"), feats, w, col("doc_id"))
        .filter(col("rr_rank") <= 10)
        .select(col("doc_id"), col("source"), col("rr_score"),
          col("rr_rank").cast("bigint").as("rank"))
    }),

    // §2.5/50f2 BM25 → trained rerank composition: the retrieval
    // stack's actual last mile — the Bm25TopK candidate list from
    // q_bm25's exact ranking, re-ordered by the q_rerank-trained
    // quality weights. The final window is a single ≤ topK-row frame
    // (the "No Partition Defined" warning is the known benign
    // final-assembly shape — k rows, not the corpus).
    "q_rerank_bm25" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val toks = split(trim(col("text")), "\\s+")
      val f = docs.select(
        col("doc_id"), col("lang"),
        size(toks).cast("long").as("f1"),
        col("n_chars").cast("long").as("f2"),
        size(array_distinct(toks)).cast("long").as("f3"),
        length(regexp_replace(col("text"), "[^0-9]", "")).cast("long").as("f4"))
      val feats = Seq(col("f1"), col("f2"), col("f3"), col("f4"))
      val w = graft.text.Rerank.trainLinear(
        f.filter(pmod(col("doc_id"), lit(5)) =!= 0), feats,
        (col("lang") === "en").cast("long"))
      val cands = graft.text.Search.bm25Rank(docs, col("text"), col("doc_id"),
          terms = PrepParams.Bm25Terms, topK = PrepParams.Bm25TopK)
        .select(col("doc_id"), col("bm25_64"))
      graft.text.Rerank.rerank(cands.join(f, "doc_id"), lit(1), feats, w, col("doc_id"))
        .select(col("doc_id"), col("bm25_64"), col("rr_score"),
          col("rr_rank").cast("bigint").as("rank"))
    }),

    // §2.5/32b tokenizer fertility per language: subtokens-per-word
    // ratio (the "how much does this tokenizer fragment lang X"
    // diagnostic that drives vocab sizing). Integer sums + one
    // correctly-rounded division.
    "q_fertility" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(
          sum(TextAnalysis.tokenCount(col("text")).cast("long")).cast("bigint").as("n_words"),
          sum(TextAnalysis.bpeTokenCount(col("text")).cast("long")).cast("bigint").as("n_subtokens"))
        .withColumn("fertility", col("n_subtokens").cast("double") / col("n_words"))),

    // §2.5/47 data-quality expectation suite over orders (one plan,
    // one (rule, violations) row per check).
    "q_validate" -> ((s, dir) => {
      import graft.quality.Validate._
      violations(Tables.orders(s, dir), Seq(
        NotNull("custkey_not_null", col("o_custkey")),
        Unique("orderkey_unique", Seq(col("o_orderkey"))),
        InRange("totalprice_range", col("o_totalprice"), lit(0.0), lit(1e9)),
        RefIntegrity("custkey_fk", col("o_custkey"),
          Tables.customer(s, dir), col("c_custkey")),
        Satisfies("date_after_1990", col("o_orderdate") >= "1990-01-01")))
    }),

    // §2.5/48 top-3 TF-IDF terms per doc (GroupTopK selection; ln used
    // for ordering only, never compared).
    "q_tfidf" -> ((s, dir) =>
      TextAnalysis.tfidfTopTerms(Tables.documents(s, dir), col("text"), col("doc_id"), k = 3)),

    // §2.5/49 top-20 PMI collocations (exact rational ordering — one
    // correctly-rounded division, no transcendentals).
    "q_collocations" -> ((s, dir) =>
      TextAnalysis.collocationsTopK(Tables.documents(s, dir), col("text"), k = 20, minCount = 5)),

    // §2.5/50 inverted index (term → df + positional postings).
    "q_inverted_index" -> ((s, dir) =>
      TextAnalysis.invertedIndex(Tables.documents(s, dir), col("text"), col("doc_id"))),

    // §2.5/33 document fingerprint (normalized content hash).
    "q_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir).mapRecords(
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp")
      )),

    // §2.5/33c winnowing fingerprints (MOSS): min-hash of each sliding
    // char-gram window — the substring-level near-dup signature.
    "q_winnow" -> ((s, dir) =>
      TextAnalysis.winnowFingerprints(Tables.documents(s, dir), col("text"), col("doc_id"),
        k = PrepParams.WinnowK, w = PrepParams.WinnowW)),

    // §2.5/33d substring-level near-dup pairs: ≥ MinShared shared
    // winnowing fingerprints (the MOSS verdict), boilerplate
    // fingerprints dropped at MaxDocFreq.
    "q_winnow_pairs" -> ((s, dir) =>
      TextAnalysis.winnowPairs(Tables.documents(s, dir), col("text"), col("doc_id"),
        k = PrepParams.WinnowK, w = PrepParams.WinnowW,
        minShared = PrepParams.WinnowMinShared, maxDocFreq = PrepParams.WinnowMaxDocFreq)),

    // §2.5/48b token-distribution drift between corpus halves:
    // exact cross-multiplied integer ranking, no division anywhere.
    "q_token_drift" -> ((s, dir) =>
      TextAnalysis.tokenDriftTopK(Tables.documents(s, dir), col("text"),
        pmod(col("doc_id"), lit(2)) === 0, k = PrepParams.DriftTopK)),

    // §2.5/43d weighted Bernoulli sampling: keep docs with probability
    // ∝ length (capped at 1), rerun-stable, zero shuffles.
    "q_weighted_sample" -> ((s, dir) =>
      Tables.documents(s, dir)
        .filter(graft.text.TextPrep.weightedSample(
          col("doc_id"), col("n_chars"), PrepParams.WSampleThreshold))
        .mapRecords(col("doc_id"), col("source"), col("n_chars"))),

    // Flagship composition: the canonical training-data prep pipeline —
    // quality-filter → exact-dedup (first per fingerprint) → per-source
    // corpus stats. One declarative plan: filter fuses with the scan,
    // dedup is one shuffle on the (uniform) fingerprint, stats one more
    // hash aggregate.
    "q_pipeline" -> ((s, dir) => {
      val toks = TextAnalysis.tokenize(col("text"))
      val lowerToks = transform(toks, t => lower(t))
      val scored = Tables.documents(s, dir)
        .withColumn("n_tokens", size(toks))
        .withColumn("stop_hits", TextAnalysis.vocabHits(lowerToks, stopList))
        .filter(col("n_tokens") >= 30 &&
          col("stop_hits").cast("double") / col("n_tokens") <= 0.4)
      scored
        .distinctBy(Seq(TextAnalysis.fingerprint(col("text"))), Seq(col("doc_id")))
        .reduceByKey(
          Seq(col("source")),
          Seq(count(lit(1)).as("n_docs"), sum(col("n_tokens")).cast("bigint").as("total_tokens"))
        )
    }),

    // §2.5/31b trained Naive-Bayes language/quality probe: multinomial
    // NB over hashed token buckets, trained on doc_id ≢ 0 (mod
    // NbHoldMod), scored on the held-out slice — all-integer
    // fixed-point log weights, fully oracle-replayed (training AND
    // inference).
    "q_nb_quality" -> ((s, dir) =>
      graft.quality.NaiveBayes.holdoutProbe(
        Tables.documents(s, dir), col("text"), col("doc_id"), col("lang"),
        holdMod = PrepParams.NbHoldMod, buckets = PrepParams.NbBuckets,
        scaleBits = PrepParams.NbScaleBits)),

    // §2.5/31e3 margin-calibration (reliability) report over the NB
    // probe: fixed-width integer log-score-margin bins vs per-bin
    // accuracy — is the classifier's confidence worth thresholding
    // on? No softmax, no global ntile sort; shares the oracle CTE
    // chain with q_nb_quality.
    "q_nb_calibration" -> ((s, dir) =>
      graft.quality.NaiveBayes.holdoutCalibration(
        Tables.documents(s, dir), col("text"), col("doc_id"), col("lang"),
        holdMod = PrepParams.NbHoldMod, buckets = PrepParams.NbBuckets,
        scaleBits = PrepParams.NbScaleBits, marginWidth = PrepParams.NbCalibWidth)),

    // §2.5/31j DSIR importance resampling (arXiv:2302.03169): select
    // the raw docs whose hashed unigram+bigram distribution looks
    // like the target domain (lang='en' plays the target sample) —
    // trained ratio grid + integer importance weights, deterministic
    // top-k. Training AND scoring fully oracle-replayed.
    "q_dsir" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.quality.Dsir.select(
        docs, col("text"), col("doc_id"),
        docs.filter(col("lang") === "en"), col("text"), col("doc_id"),
        k = PrepParams.DsirTopK, buckets = PrepParams.DsirBuckets,
        scaleBits = PrepParams.DsirScaleBits)
    }),

    // §2.5/31k modern-curation capstone: Gopher rule battery → exact
    // dedup → DSIR domain selection → deterministic split assignment,
    // the whole trained-stack path as ONE cross-engine gate (the
    // heuristic-stack counterpart is q_corpus). Composes the
    // individually-gated stages through the Corpus facade.
    "q_curation" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      // DSIR reads the cleaned frame three times (target counts, raw
      // counts, weight scan) — checkpoint once or each scan re-runs
      // the gopher battery + dedup window (measured 5.8 → 2.9 s)
      val cleaned = graft.operators.Checkpoints.eager(
        graft.Corpus(docs, col("text"), col("doc_id"))
          .gopherQualityFilter(PrepParams.GopherMinWords, PrepParams.GopherMaxWords)
          .exactDedup()
          .df)
      graft.quality.Dsir.select(
          cleaned, col("text"), col("doc_id"),
          cleaned.filter(col("lang") === "en"), col("text"), col("doc_id"),
          k = PrepParams.DsirTopK, buckets = PrepParams.DsirBuckets,
          scaleBits = PrepParams.DsirScaleBits)
        .withColumn("split", graft.text.TextPrep.splitAssign(col("doc_id")))
    }),

    // §2.5/31f Gopher document-rule battery: per-doc metrics + every
    // per-rule verdict, all in-row (zero shuffles), integer-exact.
    "q_gopher_rules" -> ((s, dir) =>
      graft.quality.HeuristicRules.gopherRules(
        Tables.documents(s, dir), col("text"), col("doc_id"),
        minWords = PrepParams.GopherMinWords, maxWords = PrepParams.GopherMaxWords)),

    // §2.5/31g C4 line-rule report: kept-line filtering, sentence
    // floor, lorem-ipsum/brace tells, rebuilt clean text.
    "q_c4_rules" -> ((s, dir) =>
      graft.quality.HeuristicRules.c4LineRules(
        Tables.documents(s, dir), col("text"), col("doc_id"))),

    // §2.5/45c Gopher repetition-signal battery: duplicate line/
    // paragraph mass, top {2,3,4}-gram coverage, duplicated
    // {5..10}-gram mass + the combined verdict — all in-row via
    // sorted-gram folds (zero shuffles), integer-exact.
    "q_rep_signals" -> ((s, dir) =>
      graft.quality.HeuristicRules.repetitionSignals(
        Tables.documents(s, dir), col("text"), col("doc_id"))),

    // §2.5/50b exact phrase search via positional postings: the
    // corpus's five most frequent 3-grams as the phrase set, counts
    // of (possibly overlapping) occurrences per (phrase, doc).
    "q_phrase_search" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.text.Search.phraseOccurrences(docs, col("text"), col("doc_id"),
        graft.text.Search.topPhrases(docs, col("text"), n = 3, k = 5),
        col("phrase"), col("phrase"))
    }),

    // §2.5/47b per-source corpus datasheet: volume, language spread,
    // heuristic pass rates, exact-dup mass, vocabulary — one release
    // report row per source, all integral.
    "q_datasheet" -> ((s, dir) =>
      graft.quality.Datasheet.perSource(
        Tables.documents(s, dir), col("text"), col("doc_id"),
        col("source"), col("lang"),
        minWords = PrepParams.GopherMinWords, maxWords = PrepParams.GopherMaxWords)),

    // §2.5/47c source release-report capstone: the per-source
    // datasheet joined with each source's NEAREST NEIGHBOUR by KMV
    // Jaccard (the "is this source redundant with one we already
    // ship?" column a release review asks first). Two corpus scans
    // (datasheet + sketch build), then everything is n_sources-row
    // arithmetic; ties broken (jacc desc, peer asc) in both engines.
    "q_source_report" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val sheet = graft.quality.Datasheet.perSource(
        docs, col("text"), col("doc_id"), col("source"), col("lang"),
        minWords = PrepParams.GopherMinWords, maxWords = PrepParams.GopherMaxWords)
      val ov = graft.sketch.Sketches.kmvOverlapReport(
        docs, col("source"), col("text"), SketchQueries.KmvK, "source_a", "source_b")
      val sym = ov.select(col("source_a").as("source"), col("source_b").as("peer"), col("jacc_pm"))
        .unionAll(ov.select(col("source_b").as("source"), col("source_a").as("peer"), col("jacc_pm")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("jacc_pm").desc, col("peer").asc)
      val nearest = sym.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(col("source"), col("peer").as("nearest_source"),
          col("jacc_pm").as("nearest_jacc_pm"))
      sheet.join(nearest, Seq("source"), "left")
    }),

    // §2.5/31n vocabulary-richness (Heaps'-law) report per source:
    // token mass, types, hapaxes and exact per-mille ratios — the
    // crawl-saturation indicator.
    "q_vocab_richness" -> ((s, dir) =>
      graft.text.TextAnalysis.vocabRichness(
          Tables.documents(s, dir), col("text"), col("source"))
        .withColumnRenamed("grp", "source")),

    // §2.5/31m token-entropy signal: per-doc Shannon entropy in
    // exact integer qlog64 units, computed IN-ROW by a sorted run
    // fold — the gibberish/one-token-spam gate, zero shuffles
    // (pinned).
    "q_entropy" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id") +: graft.text.TextAnalysis.tokenEntropy(col("text")): _*)),

    // §2.5/30d Unicode NFC normalization (native codegen expression,
    // ASCII fast path): the canonicalization that must precede any
    // content hashing — composed and decomposed accents are the same
    // text but different bytes. Output is the normalized fingerprint
    // plus an already-NFC flag.
    "q_normalize" -> ((s, dir) => {
      import org.apache.spark.sql.graft.GraftTextFunctions.normalizeNfc
      Tables.documents(s, dir).select(
        col("doc_id"),
        md5(normalizeNfc(col("text"))).as("nfc_md5"),
        (normalizeNfc(col("text")) === col("text")).cast("int").as("already_nfc"))
    }),

    // §2.5/30c character-class profile: the charset screen before
    // language-ID — letters/digits/space/punct/other counts per doc,
    // five global regexp_replace folds in one codegen'd scan, zero
    // shuffles (pinned).
    "q_char_classes" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id") +: graft.text.TextAnalysis.charClassProfile(col("text")): _*)),

    // §2.5/31l reciprocal-rank-fusion quality ensemble: three
    // calibration-free integer signals (length, type-token ratio,
    // mean word length — any integer signal drops in) fused by RRF —
    // one range exchange per signal over (id, signal) rows, one hash
    // aggregate over the unioned contributions. Everything integer,
    // ties broken by doc_id in both engines.
    "q_quality_ensemble" -> ((s, dir) => {
      val t = graft.text.TextAnalysis.tokenCount(col("text")).cast("long")
      graft.quality.Ensemble.rrf(
          Tables.documents(s, dir).filter(t >= 1),
          col("doc_id"),
          Seq(
            "len" -> t,
            "ttr" -> expr("(1000 * size(array_distinct(split(lower(trim(text)), '\\\\s+')))) div size(split(trim(text), '\\\\s+'))"),
            "wchar" -> expr("(1000 * length(text)) div size(split(trim(text), '\\\\s+'))")))
        .withColumnRenamed("id", "doc_id")
    }),

    // §2.5/31l2 RRF selection as a Corpus stage: keep the 100
    // best-fused documents (score desc, id asc — deterministic), the
    // multi-signal complement of the single-score gates. Output is
    // the kept (doc_id, source) pairs.
    "q_rrf_select" -> ((s, dir) => {
      val t = graft.text.TextAnalysis.tokenCount(col("text")).cast("long")
      graft.Corpus(
          Tables.documents(s, dir).filter(t >= 1), col("text"), col("doc_id"))
        .rrfSelect(Seq(
          "len" -> t,
          "ttr" -> expr("(1000 * size(array_distinct(split(lower(trim(text)), '\\\\s+')))) div size(split(trim(text), '\\\\s+'))"),
          "wchar" -> expr("(1000 * length(text)) div size(split(trim(text), '\\\\s+'))")),
          n = 100)
        .df.select(col("doc_id"), col("source"))
    }),

    // §2.5/31e2 per-class precision/recall/F1 over the NB held-out
    // probe — the shared Eval audit layer, integer milli metrics.
    "q_nb_eval" -> ((s, dir) =>
      graft.quality.Eval.perClassMetrics(
        graft.quality.NaiveBayes.holdoutProbe(
          Tables.documents(s, dir), col("text"), col("doc_id"), col("lang"),
          holdMod = PrepParams.NbHoldMod, buckets = PrepParams.NbBuckets,
          scaleBits = PrepParams.NbScaleBits),
        col("true_label"), col("pred_label"))),

    // §2.5/31e5 exact grouped AUC (Mann–Whitney rank-sum, tie-averaged
    // ranks carried as 2×rank-sum integers): per source, how well
    // document length rank-separates English from the rest — the
    // threshold-free complement of the P/R/F1 audit. Groups with no
    // positives (or none negative) report NULL, the undefined-AUC
    // convention.
    "q_auc" -> ((s, dir) =>
      graft.quality.Eval.aucExact(Tables.documents(s, dir),
          col("source"), col("n_chars"), col("lang") === "en")
        .withColumnRenamed("g", "source")),

    // §2.5/48c Dunning G² keyness: top-10 overused terms per source
    // in qlog64-exact log-likelihood units — the corpus-linguistics
    // "what is distinctive about this slice" statistic, calibrated
    // for rare counts where raw TF-IDF over-fires.
    "q_keyness" -> ((s, dir) =>
      graft.text.TextAnalysis.keyness(Tables.documents(s, dir),
          col("text"), col("source"), topK = 10)
        .withColumnRenamed("grp", "source")),

    // §2.5/48d c-TF-IDF cluster labeling (BERTopic's topic-term
    // statistic): top-10 characteristic terms per lang, each class's
    // text treated as one document, score the exact integer
    // tf·(qlog64(ft·C + N) − qlog64(ft·C)).
    "q_ctfidf" -> ((s, dir) =>
      graft.text.TextAnalysis.ctfidfTopTerms(Tables.documents(s, dir),
          col("text"), col("lang"), topK = 10)
        .withColumnRenamed("grp", "lang")),

    // §2.5/48e distinct-n diversity per source: templated sources
    // collapse (low distinct share) where per-document repetition
    // screens can't see across documents. n ∈ {1,2,3}.
    "q_distinct_n" -> ((s, dir) =>
      graft.text.TextAnalysis.distinctN(Tables.documents(s, dir),
          col("text"), col("source"))
        .withColumnRenamed("grp", "source")),

    // §2.5/48f per-source distributional novelty KL(source ‖ corpus)
    // over token unigrams — one number per source, exact qlog64.
    "q_kl_source" -> ((s, dir) =>
      graft.text.TextAnalysis.sourceKl(Tables.documents(s, dir),
          col("text"), col("source"))
        .withColumnRenamed("grp", "source")),

    // §2.5/31q Flesch–Kincaid grade as the exact integer rational
    // fk_milli = (390·W² + 11800·Syl·S − 15590·S·W) div (S·W) —
    // in-row, zero shuffles.
    "q_readability" -> ((s, dir) =>
      graft.text.TextAnalysis.readability(
        Tables.documents(s, dir), col("text"), col("doc_id"))),

    // §2.5/42c Luhn PAN screen: 13–19 digit runs with their mod-10
    // checksum verdict (real card numbers vs long ids) over a
    // deterministic card-like column fabricated from doc_id — the
    // synthetic corpus carries no digit runs, the operator is real.
    "q_luhn" -> ((s, dir) =>
      graft.text.TextPrep.luhnScreen(
        Tables.documents(s, dir).withColumn("pan_text",
          concat(lit("ref 4"), lpad(col("doc_id").cast("string"), 14, "0"),
            pmod(col("doc_id"), lit(10L)).cast("string"), lit(" end"))),
        col("pan_text"), col("doc_id"))),

    // §2.5/31c confusion matrix over the NB probe — which languages
    // the trained model bleeds into which (same audit-artifact shape
    // as q_label_confusion over the centroid probe).
    "q_nb_confusion" -> ((s, dir) =>
      graft.quality.NaiveBayes.holdoutProbe(
          Tables.documents(s, dir), col("text"), col("doc_id"), col("lang"),
          holdMod = PrepParams.NbHoldMod, buckets = PrepParams.NbBuckets,
          scaleBits = PrepParams.NbScaleBits)
        .groupBy(col("true_label"), col("pred_label"))
        .agg(count(lit(1)).as("n")))
  )

  private val stopSqlList = stopList.map(w => s"'$w'").mkString(", ")

  /** Full weighted-TextRank replay: positional tokenization, windowed
    * co-occurrence pair COUNTS, mirrored weighted edges, and the same
    * 3-iteration scaled-integer weighted-PageRank chain shape as
    * q_pagerank's oracle (contribution (pr·w) // W_src) — generated
    * per iteration so iters edits can't desync the two sides. */
  private val textRankSql: String = {
    val iters = 3
    val its = (1 to iters).map { i =>
      s"""it$i AS (
         |  SELECT nd.id, (15 * b.base) // 100 + (85 * COALESCE(c.s, 0)) // 100 AS pr
         |  FROM nodes nd CROSS JOIN params b
         |  LEFT JOIN (
         |    SELECT e.dst AS id, CAST(SUM(p.pr * e.w // d.wsum) AS BIGINT) AS s
         |    FROM edges e JOIN it${i - 1} p ON e.src = p.id JOIN deg d ON e.src = d.src
         |    GROUP BY e.dst) c ON nd.id = c.id),""".stripMargin
    }.mkString("\n")
    raw"""WITH tok AS (
         |  SELECT doc_id, unnest(range(len(toks))) AS tp, unnest(toks) AS tok
         |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
         |        FROM documents)),
         |cp AS (
         |  SELECT least(a.tok, b.tok) AS x, greatest(a.tok, b.tok) AS y,
         |         count(*) AS w
         |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.tp IN (a.tp + 1, a.tp + 2)
         |  WHERE a.tok <> b.tok GROUP BY 1, 2),
         |edges AS (SELECT x AS src, y AS dst, w FROM cp
         |          UNION ALL SELECT y, x, w FROM cp),
         |nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
         |params AS (SELECT 1000000000000 // count(*) AS base FROM nodes),
         |deg AS (SELECT src, CAST(sum(w) AS BIGINT) AS wsum FROM edges GROUP BY src),
         |it0 AS (SELECT nd.id, b.base AS pr FROM nodes nd CROSS JOIN params b),
         |$its
         |r AS (SELECT id, pr,
         |             CAST(row_number() OVER (ORDER BY pr DESC, id ASC) AS INTEGER) AS rank
         |      FROM it$iters ORDER BY pr DESC, id ASC LIMIT 40)
         |SELECT id AS token, pr, rank FROM r""".stripMargin
  }

  /** BM25 replay CTE chain ending in `s(doc_id, bm25_64)` — shared by
    * the q_bm25 ranking oracle and the q_rerank_bm25 composition. */
  private lazy val bm25Ctes: String = {
    val termList = PrepParams.Bm25Terms.map(t => s"'$t'").mkString(", ")
    raw"""tok AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts FROM documents
         |), st AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(len(ts)) AS BIGINT) AS tl FROM tok
         |), inst AS (
         |  SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl, unnest(ts) AS t FROM tok
         |), tf AS (
         |  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf, CAST(min(dl) AS BIGINT) AS dl
         |  FROM inst WHERE t IN ($termList) GROUP BY 1, 2
         |), dfx AS (
         |  SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
         |), c AS (
         |  SELECT doc_id,
         |         ((${qlogSql("(2 * n + 2)")} - (${qlogSql("(2 * df + 1)")})) * (22 * tf * tl))
         |           // (10 * tl * tf + 3 * tl + 9 * dl * n) AS c
         |  FROM tf JOIN dfx USING (t) CROSS JOIN st
         |), s AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS bm25_64 FROM c GROUP BY 1
         |)""".stripMargin
  }

  /** Linear-reranker training replay: features `f`, training split
    * `tr`, class counts `c`, per-class sums `s2`, weights
    * `w(w1..w4)` — shared by q_rerank and q_rerank_bm25. */
  private lazy val rerankTrainCtes: String =
    raw"""f AS (
         |  SELECT doc_id, source, lang,
         |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS f1,
         |         CAST(n_chars AS BIGINT) AS f2,
         |         CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS f3,
         |         CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS f4
         |  FROM documents),
         |tr AS (SELECT * FROM f WHERE doc_id % 5 <> 0),
         |cc AS (
         |  SELECT CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         |         CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS n_neg
         |  FROM tr),
         |s2 AS (
         |  SELECT CAST(sum(CASE WHEN lang = 'en' THEN f1 ELSE 0 END) AS BIGINT) AS sp1,
         |         CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE f1 END) AS BIGINT) AS sn1,
         |         CAST(sum(CASE WHEN lang = 'en' THEN f2 ELSE 0 END) AS BIGINT) AS sp2,
         |         CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE f2 END) AS BIGINT) AS sn2,
         |         CAST(sum(CASE WHEN lang = 'en' THEN f3 ELSE 0 END) AS BIGINT) AS sp3,
         |         CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE f3 END) AS BIGINT) AS sn3,
         |         CAST(sum(CASE WHEN lang = 'en' THEN f4 ELSE 0 END) AS BIGINT) AS sp4,
         |         CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE f4 END) AS BIGINT) AS sn4
         |  FROM tr),
         |w AS (
         |  SELECT n_neg * sp1 - n_pos * sn1 AS w1, n_neg * sp2 - n_pos * sn2 AS w2,
         |         n_neg * sp3 - n_pos * sn3 AS w3, n_neg * sp4 - n_pos * sn4 AS w4
         |  FROM s2 CROSS JOIN cc)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_textrank" -> textRankSql,
    "q_vocab_coverage" ->
      raw"""WITH f AS (
           |  SELECT t, count(*) AS cnt
           |  FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
           |        FROM documents)
           |  GROUP BY t),
           |r AS (SELECT t, cnt, row_number() OVER (ORDER BY cnt DESC, t ASC) AS rank FROM f),
           |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM f),
           |ks AS (SELECT CAST(unnest([1, 2, 4, 8, 16, 32]) AS BIGINT) AS k)
           |SELECT ks.k, CAST(sum(r.cnt) AS BIGINT) AS covered, tot.total,
           |       (CAST(sum(r.cnt) AS BIGINT) * 1000) // tot.total AS coverage_pm
           |FROM ks JOIN r ON r.rank <= ks.k CROSS JOIN tot
           |GROUP BY ks.k, tot.total""".stripMargin,
    "q_winnow" -> {
      val (k, w) = (PrepParams.WinnowK, PrepParams.WinnowW)
      raw"""WITH g AS (
           |  SELECT doc_id,
           |         unnest(generate_series(1, length(lower(text)) - ${k - 1})) AS pos,
           |         unnest(list_transform(generate_series(1, length(lower(text)) - ${k - 1}),
           |                i -> substr(lower(text), i, $k))) AS gr
           |  FROM documents WHERE length(lower(text)) >= $k),
           |h AS (
           |  SELECT doc_id, pos, ('0x' || substr(md5(gr), 1, 15))::BIGINT AS h FROM g),
           |m AS (
           |  SELECT doc_id, h,
           |         min(h) OVER (PARTITION BY doc_id ORDER BY pos
           |                      ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) AS mn
           |  FROM h)
           |SELECT DISTINCT doc_id, h AS fp FROM m WHERE h = mn""".stripMargin
    },
    "q_winnow_pairs" -> {
      val (k, w) = (PrepParams.WinnowK, PrepParams.WinnowW)
      raw"""WITH g AS (
           |  SELECT doc_id,
           |         unnest(generate_series(1, length(lower(text)) - ${k - 1})) AS pos,
           |         unnest(list_transform(generate_series(1, length(lower(text)) - ${k - 1}),
           |                i -> substr(lower(text), i, $k))) AS gr
           |  FROM documents WHERE length(lower(text)) >= $k),
           |h AS (
           |  SELECT doc_id, pos, ('0x' || substr(md5(gr), 1, 15))::BIGINT AS h FROM g),
           |m AS (
           |  SELECT doc_id, h,
           |         min(h) OVER (PARTITION BY doc_id ORDER BY pos
           |                      ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) AS mn
           |  FROM h),
           |fp AS (SELECT DISTINCT doc_id, h AS fp FROM m WHERE h = mn),
           |keep AS (SELECT fp FROM fp GROUP BY fp
           |         HAVING count(*) BETWEEN 2 AND ${PrepParams.WinnowMaxDocFreq}),
           |fk AS (SELECT f.doc_id, f.fp FROM fp f JOIN keep USING (fp))
           |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS shared
           |FROM fk a JOIN fk b ON a.fp = b.fp AND a.doc_id < b.doc_id
           |GROUP BY 1, 2 HAVING count(*) >= ${PrepParams.WinnowMinShared}""".stripMargin
    },
    "q_token_drift" ->
      raw"""WITH tok AS (
           |  SELECT doc_id % 2 = 0 AS ga,
           |         unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
           |  FROM documents),
           |c AS (
           |  SELECT token,
           |         CAST(sum(CASE WHEN ga THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
           |         CAST(sum(CASE WHEN NOT ga THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
           |  FROM tok GROUP BY token),
           |t AS (SELECT sum(cnt_a) AS ta, sum(cnt_b) AS tb FROM c)
           |SELECT token, cnt_a, cnt_b, rank FROM (
           |  SELECT token, cnt_a, cnt_b,
           |         CAST(row_number() OVER (
           |           ORDER BY abs(CAST(cnt_a AS HUGEINT) * tb - CAST(cnt_b AS HUGEINT) * ta) DESC,
           |                    token ASC) AS BIGINT) AS rank
           |  FROM c, t
           |) WHERE rank <= ${PrepParams.DriftTopK}""".stripMargin,
    "q_weighted_sample" ->
      raw"""SELECT doc_id, source, n_chars FROM documents
           |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
           |        * ${PrepParams.WSampleThreshold}
           |      < n_chars * ${1L << 28}""".stripMargin,
    "q_inverted_index" ->
      raw"""WITH tok AS (
           |  SELECT doc_id, unnest(ts) AS term, unnest(range(len(ts))) AS pos
           |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts FROM documents)
           |), pd AS (
           |  SELECT term, doc_id,
           |         doc_id || ':' || string_agg(CAST(pos AS VARCHAR), ',' ORDER BY pos) AS entry
           |  FROM tok GROUP BY term, doc_id
           |)
           |SELECT term, CAST(count(*) AS BIGINT) AS df,
           |       string_agg(entry, ';' ORDER BY doc_id) AS postings
           |FROM pd GROUP BY term""".stripMargin,
    "q_collocations" ->
      raw"""WITH toks AS (
           |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w FROM documents
           |), uni AS (
           |  SELECT w, CAST(count(*) AS BIGINT) AS n1 FROM toks GROUP BY w
           |), nt AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM toks),
           |sh AS (
           |  SELECT doc_id, list_transform(range(len(t)-1), i -> t[i+1] || ' ' || t[i+2]) AS g
           |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents)
           |  WHERE len(t) >= 2
           |), bi AS (
           |  SELECT g AS b, CAST(count(*) AS BIGINT) AS n12
           |  FROM (SELECT unnest(g) AS g FROM sh) GROUP BY g
           |  HAVING count(*) >= 5
           |)
           |SELECT string_split(b, ' ')[1] AS w1, string_split(b, ' ')[2] AS w2,
           |       n12, u1.n1 AS c1, u2.n1 AS c2,
           |       CAST(n12 * nt.nt AS DOUBLE) / (u1.n1 * u2.n1) AS ratio
           |FROM bi
           |JOIN uni u1 ON string_split(b, ' ')[1] = u1.w
           |JOIN uni u2 ON string_split(b, ' ')[2] = u2.w
           |CROSS JOIN nt
           |ORDER BY ratio DESC, b ASC LIMIT 20""".stripMargin,
    "q_tfidf" ->
      raw"""WITH tok AS (
           |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
           |  FROM documents
           |), tf AS (
           |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, term
           |), dfq AS (
           |  SELECT term, CAST(count(*) AS BIGINT) AS dfq FROM tf GROUP BY term
           |), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
           |scored AS (
           |  SELECT tf.doc_id, tf.term, tf.tf, dfq.dfq,
           |         CAST(tf.tf AS DOUBLE) * ln(CAST(n.n AS DOUBLE) / dfq.dfq) AS s
           |  FROM tf JOIN dfq USING (term) CROSS JOIN n
           |)
           |SELECT doc_id, term, tf, dfq FROM scored
           |QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, term ASC) <= 3""".stripMargin,
    "q_validate" ->
      """SELECT 'custkey_not_null' AS rule, CAST(count(*) FILTER (o_custkey IS NULL) AS BIGINT) AS violations FROM orders
        |UNION ALL SELECT 'orderkey_unique', CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders
        |UNION ALL SELECT 'totalprice_range', CAST(count(*) FILTER (o_totalprice IS NULL OR o_totalprice < 0.0 OR o_totalprice > 1e9) AS BIGINT) FROM orders
        |UNION ALL SELECT 'custkey_fk', CAST(count(*) AS BIGINT) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        |UNION ALL SELECT 'date_after_1990', CAST(count(*) FILTER (NOT coalesce(o_orderdate >= DATE '1990-01-01', false)) AS BIGINT) FROM orders""".stripMargin,
    "q_redact" ->
      raw"""SELECT doc_id,
           |       md5(regexp_replace(regexp_replace(regexp_replace(text,
           |         '${TextPrep.EmailRe}', '<EMAIL>', 'g'),
           |         '${TextPrep.Ipv4Re}', '<IP>', 'g'),
           |         '${TextPrep.PhoneRe}', '<PHONE>', 'g')) AS redacted_md5
           |FROM documents""".stripMargin,
    "q_regex_extract" ->
      raw"""SELECT doc_id,
           |       CAST(len(regexp_extract_all(text, '[a-z]{5,}')) AS BIGINT) AS n_long,
           |       CAST(len(list_distinct(regexp_extract_all(text, '[a-z]{5,}'))) AS BIGINT) AS n_long_distinct
           |FROM documents""".stripMargin,
    "q_split_assign" ->
      raw"""SELECT doc_id,
           |       CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90 THEN 'train'
           |            WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 95 THEN 'val'
           |            ELSE 'test' END AS split
           |FROM documents""".stripMargin,
    "q_chunk" ->
      raw"""WITH t AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
           |  FROM documents
           |), c AS (
           |  SELECT doc_id, toks, len(toks) AS n,
           |         unnest(generate_series(0, CAST(1 + ceil(greatest(len(toks) - 50, 0) / 40.0) AS BIGINT) - 1)) AS chunk_id
           |  FROM t WHERE len(toks) >= 1
           |)
           |SELECT doc_id, chunk_id,
           |       CAST(least(n - chunk_id * 40, 50) AS BIGINT) AS n_tokens,
           |       md5(array_to_string(toks[CAST(chunk_id * 40 + 1 AS BIGINT):CAST(chunk_id * 40 + 50 AS BIGINT)], ' ')) AS chunk_md5
           |FROM c""".stripMargin,
    "q_repetition" ->
      raw"""WITH tok AS (
           |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
           |  FROM documents
           |), c AS (
           |  SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t
           |)
           |SELECT doc_id,
           |       CAST(max(c) AS BIGINT) AS max_rep,
           |       CAST(sum(c) AS BIGINT) AS n_tokens,
           |       CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS rep_ratio
           |FROM c GROUP BY doc_id""".stripMargin,
    "q_token_sample" ->
      raw"""WITH d AS (
           |  SELECT doc_id, source,
           |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
           |  FROM documents),
           |c AS (
           |  SELECT doc_id, source, n_tokens,
           |         sum(n_tokens) OVER (
           |           PARTITION BY source
           |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |  FROM d)
           |SELECT doc_id, source, n_tokens FROM c
           |WHERE cum - n_tokens < ${PrepParams.SampleTokenBudget}""".stripMargin,
    "q_boilerplate" ->
      raw"""WITH toks AS (
           |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents
           |),
           |g3 AS (
           |  SELECT doc_id, unnest(range(len(t)-2)) AS p, t FROM toks
           |),
           |g AS (SELECT doc_id, p, t[p+1] || ' ' || t[p+2] || ' ' || t[p+3] AS g FROM g3),
           |freq AS (
           |  SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS df FROM g GROUP BY g)
           |  WHERE df >= ${PrepParams.BoilerMinDocFreq}
           |),
           |covered AS (
           |  SELECT DISTINCT g.doc_id, unnest(range(p, p+3)) AS tp FROM g JOIN freq USING (g)
           |),
           |tok_pos AS (SELECT doc_id, unnest(range(len(t))) AS tp, t FROM toks),
           |kept AS (
           |  SELECT tok_pos.doc_id, tp, t[tp+1] AS tok
           |  FROM tok_pos LEFT JOIN covered USING (doc_id, tp)
           |  WHERE covered.tp IS NULL
           |)
           |SELECT doc_id, array_to_string(list(tok ORDER BY tp), ' ') AS clean_text,
           |       CAST(count(*) AS BIGINT) AS n_kept
           |FROM kept GROUP BY doc_id""".stripMargin,
    "q_fertility" ->
      raw"""SELECT lang,
           |       CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_words,
           |       CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS n_subtokens,
           |       CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]'))) AS DOUBLE)
           |         / sum(len(string_split_regex(trim(text), '\s+'))) AS fertility
           |FROM documents GROUP BY lang""".stripMargin,
    "q_lm_score" ->
      raw"""WITH tok AS (
           |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
           |  FROM documents
           |), tf AS (
           |  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, t
           |), freq AS (
           |  SELECT t, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY t
           |)
           |SELECT doc_id,
           |       CAST(sum(tf) AS BIGINT) AS n_tokens,
           |       CAST(sum(tf * cnt) AS BIGINT) AS sum_freq,
           |       CAST(sum(CASE WHEN cnt <= ${PrepParams.LmRareMax} THEN tf ELSE 0 END) AS BIGINT) AS n_rare,
           |       CAST(sum(tf * cnt) AS DOUBLE) / sum(tf) AS mean_freq
           |FROM tf JOIN freq USING (t)
           |GROUP BY doc_id""".stripMargin,
    "q_ppl_buckets" ->
      raw"""WITH tok AS (
           |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
           |  FROM documents
           |), tf AS (
           |  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, t
           |), freq AS (
           |  SELECT t, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY t
           |), score AS (
           |  SELECT doc_id, CAST(sum(tf * cnt) AS DOUBLE) / sum(tf) AS mean_freq
           |  FROM tf JOIN freq USING (t) GROUP BY doc_id
           |), sl AS (
           |  SELECT d.doc_id, d.lang, s.mean_freq
           |  FROM documents d JOIN score s USING (doc_id)
           |), cuts AS (
           |  SELECT lang,
           |         quantile_cont(mean_freq, 2.0/3.0) AS c1,
           |         quantile_cont(mean_freq, 1.0/3.0) AS c2
           |  FROM sl GROUP BY lang
           |)
           |SELECT doc_id, lang, mean_freq,
           |       CASE WHEN mean_freq >= c1 THEN 1
           |            WHEN mean_freq >= c2 THEN 2
           |            ELSE 3 END AS bucket
           |FROM sl JOIN cuts USING (lang)""".stripMargin,
    "q_bigram_lm" ->
      raw"""WITH tok AS (
           |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts FROM documents
           |), bg AS (
           |  SELECT doc_id,
           |         unnest(list_transform(range(len(ts) - 1), i -> ts[i+1] || ' ' || ts[i+2])) AS g
           |  FROM tok WHERE len(ts) >= 2
           |), tf AS (
           |  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS tf FROM bg GROUP BY doc_id, g
           |), freq AS (
           |  SELECT g, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY g
           |)
           |SELECT doc_id,
           |       CAST(sum(tf) AS BIGINT) AS n_bigrams,
           |       CAST(sum(tf * cnt) AS BIGINT) AS sum_freq,
           |       CAST(sum(CASE WHEN cnt <= ${PrepParams.BgRareMax} THEN tf ELSE 0 END) AS BIGINT) AS n_rare,
           |       CAST(sum(tf * cnt) AS DOUBLE) / sum(tf) AS mean_freq
           |FROM tf JOIN freq USING (g)
           |GROUP BY doc_id""".stripMargin,
    "q_kn_lm" ->
      raw"""WITH tok AS (
           |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts FROM documents
           |), inst AS (
           |  SELECT doc_id, g.w1 AS w1, g.w2 AS w2 FROM (
           |    SELECT doc_id, unnest(list_transform(range(len(ts) - 1),
           |           i -> struct_pack(w1 := ts[i+1], w2 := ts[i+2]))) AS g
           |    FROM tok WHERE len(ts) >= 2)
           |), tf AS (
           |  SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS tf FROM inst GROUP BY 1, 2, 3
           |), cb AS (
           |  SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c12 FROM tf GROUP BY 1, 2
           |), ctx AS (
           |  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1, CAST(count(*) AS BIGINT) AS n1fw
           |  FROM cb GROUP BY 1
           |), cont AS (
           |  SELECT w2, CAST(count(*) AS BIGINT) AS ncont FROM cb GROUP BY 1
           |), tt AS (
           |  SELECT CAST(count(*) AS BIGINT) AS t FROM cb
           |), scn AS (
           |  SELECT tf.doc_id, tf.tf,
           |         (CASE WHEN 4 * c12 - 3 > 0 THEN 4 * c12 - 3 ELSE 0 END) * t
           |           + 3 * n1fw * ncont AS num,
           |         4 * c1 * t AS den
           |  FROM tf JOIN cb USING (w1, w2) JOIN ctx USING (w1) JOIN cont USING (w2)
           |  CROSS JOIN tt
           |), sc AS (
           |  SELECT doc_id, tf, ${qlogSql("num")} - (${qlogSql("den")}) AS lp FROM scn
           |)
           |SELECT doc_id,
           |       CAST(sum(tf) AS BIGINT) AS n_bigrams,
           |       CAST(sum(tf * lp) AS BIGINT) AS kn_ll64,
           |       CAST(CAST(sum(tf * lp) AS BIGINT) AS DOUBLE) / CAST(sum(tf) AS BIGINT) AS kn_avg
           |FROM sc GROUP BY doc_id""".stripMargin,
    "q_bm25" ->
      raw"""WITH $bm25Ctes
           |SELECT doc_id, bm25_64,
           |       CAST(row_number() OVER (ORDER BY bm25_64 DESC, doc_id) AS INTEGER) AS rank
           |FROM s ORDER BY bm25_64 DESC, doc_id LIMIT ${PrepParams.Bm25TopK}""".stripMargin,
    "q_rerank_bm25" ->
      raw"""WITH $bm25Ctes,
           |bm AS (
           |  SELECT doc_id, bm25_64 FROM s
           |  ORDER BY bm25_64 DESC, doc_id LIMIT ${PrepParams.Bm25TopK}),
           |$rerankTrainCtes,
           |cand AS (
           |  SELECT bm.doc_id, bm.bm25_64,
           |         f1 * w1 + f2 * w2 + f3 * w3 + f4 * w4 AS rr_score
           |  FROM bm JOIN f ON bm.doc_id = f.doc_id CROSS JOIN w)
           |SELECT doc_id, bm25_64, rr_score,
           |       CAST(row_number() OVER (ORDER BY rr_score DESC, doc_id) AS BIGINT) AS rank
           |FROM cand""".stripMargin,
    "q_token_count" ->
      raw"""SELECT doc_id,
           |       CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
           |       CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_subtokens
           |FROM documents""".stripMargin,
    "q_rerank" ->
      raw"""WITH $rerankTrainCtes,
           |sc AS (
           |  SELECT doc_id, source, f1 * w1 + f2 * w2 + f3 * w3 + f4 * w4 AS rr_score
           |  FROM f CROSS JOIN w WHERE doc_id % 5 = 0)
           |SELECT doc_id, source, rr_score, rank FROM (
           |  SELECT *, CAST(row_number() OVER (
           |    PARTITION BY source ORDER BY rr_score DESC, doc_id) AS BIGINT) AS rank
           |  FROM sc)
           |WHERE rank <= 10""".stripMargin,
    "q_quality" ->
      raw"""WITH t AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
           |), m AS (
           |  SELECT doc_id,
           |         len(toks) AS n_tokens,
           |         len(list_distinct(toks)) AS n_types,
           |         len(list_filter(list_transform(toks, x -> lower(x)), x -> x IN ($stopSqlList))) AS stop_hits,
           |         CAST(list_sum(list_transform(toks, x -> len(x))) AS BIGINT) AS char_sum
           |  FROM t
           |)
           |SELECT doc_id,
           |       CAST(n_tokens AS BIGINT) AS n_tokens,
           |       CAST(n_types AS BIGINT) AS n_types,
           |       CAST(stop_hits AS BIGINT) AS stop_hits,
           |       char_sum,
           |       CAST(n_types AS DOUBLE) / n_tokens AS ttr,
           |       CAST(stop_hits AS DOUBLE) / n_tokens AS stop_ratio,
           |       (CAST(n_types AS DOUBLE) / n_tokens) * 0.5 + (CAST(stop_hits AS DOUBLE) / n_tokens) * 0.5 AS quality_score
           |FROM m""".stripMargin
        .replace("$stopSqlList", stopSqlList),
    "q_lang_profile" ->
      raw"""WITH grams AS (
           |  SELECT doc_id, lang, substr(t, CAST(i AS INT), 3) AS g
           |  FROM (
           |    SELECT doc_id, lang, lower(text) AS t,
           |           unnest(generate_series(1, length(lower(text)) - 2)) AS i
           |    FROM documents WHERE length(lower(text)) >= 3
           |  )
           |), prof AS (
           |  SELECT lang, g, 51 - row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, g ASC) AS weight
           |  FROM grams GROUP BY lang, g
           |  QUALIFY row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, g ASC) <= 50
           |), scores AS (
           |  SELECT d.doc_id, p.lang, CAST(SUM(p.weight) AS BIGINT) AS score
           |  FROM grams d JOIN prof p ON d.g = p.g
           |  GROUP BY d.doc_id, p.lang
           |)
           |SELECT doc_id, lang AS lang_pred, score FROM scores
           |QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) = 1""".stripMargin,
    "q_lang_id" ->
      raw"""WITH t AS (
           |  SELECT doc_id, list_transform(string_split_regex(trim(text), '\s+'), x -> lower(x)) AS toks
           |  FROM documents
           |), s AS (
           |  SELECT doc_id,
           |         len(list_filter(toks, x -> x IN (${TextAnalysis.enStopwords.map(w => s"'$w'").mkString(", ")}))) AS en,
           |         len(list_filter(toks, x -> x IN (${TextAnalysis.deStopwords.map(w => s"'$w'").mkString(", ")}))) AS de,
           |         len(list_filter(toks, x -> x IN (${TextAnalysis.frStopwords.map(w => s"'$w'").mkString(", ")}))) AS fr,
           |         len(list_filter(toks, x -> x IN (${TextAnalysis.esStopwords.map(w => s"'$w'").mkString(", ")}))) AS es
           |  FROM t
           |)
           |SELECT doc_id,
           |       CASE WHEN greatest(en, de, fr, es) = 0 THEN 'unknown'
           |            WHEN en = greatest(en, de, fr, es) THEN 'en'
           |            WHEN de = greatest(en, de, fr, es) THEN 'de'
           |            WHEN fr = greatest(en, de, fr, es) THEN 'fr'
           |            ELSE 'es' END AS pred_lang
           |FROM s""".stripMargin,
    "q_fingerprint" ->
      raw"""SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
           |FROM documents""".stripMargin,
    "q_pipeline" ->
      raw"""WITH scored AS (
           |  SELECT doc_id, source, text,
           |         len(string_split_regex(trim(text), '\s+')) AS n_tokens,
           |         len(list_filter(list_transform(string_split_regex(trim(text), '\s+'), x -> lower(x)),
           |                         x -> x IN ($stopSqlList))) AS stop_hits
           |  FROM documents
           |), filtered AS (
           |  SELECT * FROM scored
           |  WHERE n_tokens >= 30 AND CAST(stop_hits AS DOUBLE) / n_tokens <= 0.4
           |), deduped AS (
           |  SELECT *, row_number() OVER (
           |    PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
           |    ORDER BY doc_id) AS rn
           |  FROM filtered
           |)
           |SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
           |FROM deduped WHERE rn = 1 GROUP BY source""".stripMargin
        .replace("$stopSqlList", stopSqlList),

    "q_rep_signals" -> repSignalsSql,

    "q_vocab_richness" ->
      raw"""WITH c AS (
           |  SELECT source, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
           |  FROM documents),
           |g AS (SELECT source, t, CAST(count(*) AS BIGINT) AS c FROM c GROUP BY 1, 2)
           |SELECT source,
           |       CAST(sum(c) AS BIGINT) AS n_tokens,
           |       CAST(count(*) AS BIGINT) AS n_types,
           |       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           |       CAST((1000 * count(*)) // sum(c) AS BIGINT) AS ttr_pm,
           |       CAST((1000 * sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)) // greatest(count(*), 1) AS BIGINT) AS hapax_share_pm
           |FROM g GROUP BY source""".stripMargin,
    "q_entropy" -> {
      raw"""WITH tok AS (
           |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
           |  FROM documents),
           |c AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
           |n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
           |e AS (
           |  SELECT c.doc_id,
           |         CAST(sum(c * ((${qlogSql("n")}) - (${qlogSql("c")}))) AS BIGINT) AS ent64
           |  FROM c JOIN n USING (doc_id) GROUP BY 1)
           |SELECT e.doc_id, n.n AS n_tokens, e.ent64,
           |       (100 * e.ent64) // n.n AS ent_ct
           |FROM e JOIN n USING (doc_id)""".stripMargin
    },
    "q_normalize" ->
      """SELECT doc_id, md5(nfc_normalize(text)) AS nfc_md5,
        |       CAST(nfc_normalize(text) = text AS INT) AS already_nfc
        |FROM documents""".stripMargin,
    "q_char_classes" ->
      raw"""SELECT doc_id,
           |  CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
           |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
           |  CAST(length(text) - length(regexp_replace(text, '[ \t\n\r]', '', 'g')) AS BIGINT) AS n_space,
           |  CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{}<>/@#$$%&*+=_~|-]', '', 'g')) AS BIGINT) AS n_punct,
           |  CAST(length(text)
           |       - (length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')))
           |       - (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
           |       - (length(text) - length(regexp_replace(text, '[ \t\n\r]', '', 'g')))
           |       - (length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{}<>/@#$$%&*+=_~|-]', '', 'g'))) AS BIGINT) AS n_other
           |FROM documents""".stripMargin,
    "q_quality_ensemble" -> qualityEnsembleSql,
    "q_rrf_select" ->
      raw"""SELECT d.doc_id, d.source
           |FROM documents d JOIN (
           |  SELECT doc_id FROM ($qualityEnsembleSql)
           |  ORDER BY rrf_score DESC, doc_id ASC LIMIT 100
           |) k USING (doc_id)""".stripMargin,
    "q_datasheet" -> datasheetSql,
    "q_source_report" ->
      raw"""SELECT s.*, n.nearest_source, n.nearest_jacc_pm
           |FROM ($datasheetSql) s
           |LEFT JOIN (
           |  SELECT source, peer AS nearest_source, jacc_pm AS nearest_jacc_pm
           |  FROM (
           |    SELECT source, peer, jacc_pm,
           |           row_number() OVER (PARTITION BY source ORDER BY jacc_pm DESC, peer ASC) AS rn
           |    FROM (
           |      SELECT source_a AS source, source_b AS peer, jacc_pm
           |      FROM (${SketchQueries.kmvOverlapSql})
           |      UNION ALL
           |      SELECT source_b AS source, source_a AS peer, jacc_pm
           |      FROM (${SketchQueries.kmvOverlapSql})
           |    )
           |  ) WHERE rn = 1
           |) n USING (source)""".stripMargin,

    "q_phrase_search" ->
      raw"""WITH ptoks AS (
           |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
           |  FROM documents),
           |pg AS (
           |  SELECT doc_id,
           |         unnest(CASE WHEN len(t) < 3 THEN []
           |                ELSE list_transform(range(len(t) - 2),
           |                       i -> array_to_string(t[i+1:i+3], ' ')) END) AS gram
           |  FROM ptoks),
           |ptop AS (
           |  SELECT gram FROM (SELECT gram, count(*) AS c FROM pg GROUP BY 1)
           |  ORDER BY c DESC, gram ASC LIMIT 5)
           |SELECT gram AS phrase, doc_id, count(*) AS n_occurrences
           |FROM pg JOIN ptop USING (gram)
           |GROUP BY 1, 2""".stripMargin,

    "q_gopher_rules" ->
      s"""WITH ${gopherCtes("documents")}
         |SELECT doc_id, n_words, n_chars_tok, stop_hits, alpha_words,
         |       top2_count, top2_gram,
         |       pass_word_count, pass_mean_len, pass_stop, pass_alpha, pass_dup2, pass
         |FROM gverdict""".stripMargin,

    "q_c4_rules" ->
      raw"""SELECT doc_id,
           |       CAST(len(lines) AS BIGINT) AS n_lines,
           |       CAST(len(kept) AS BIGINT) AS n_kept_lines,
           |       CAST(length(ct) - length(regexp_replace(ct, '[.!?]', '', 'g')) AS BIGINT) AS n_sentences,
           |       has_lorem, has_brace, ct AS clean_text,
           |       CAST(length(ct) - length(regexp_replace(ct, '[.!?]', '', 'g')) >= 5
           |            AND has_lorem = 0 AND has_brace = 0 AS INT) AS pass
           |FROM (
           |  SELECT doc_id, lines, kept,
           |         coalesce(array_to_string(kept, chr(10)), '') AS ct,
           |         CAST(contains(lower(text), 'lorem ipsum') AS INT) AS has_lorem,
           |         CAST(contains(text, '{') AS INT) AS has_brace, text
           |  FROM (
           |    SELECT doc_id, text, lines,
           |           list_filter(lines, l -> regexp_matches(rtrim(l), '[.!?"]$$')
           |                                   AND len(string_split_regex(trim(l), '\s+')) >= 3) AS kept
           |    FROM (SELECT doc_id, text, string_split(text, chr(10)) AS lines FROM documents)
           |  )
           |)""".stripMargin,

    "q_nb_quality" -> nbQualitySql,
    "q_nb_calibration" -> nbCalibrationSql,
    "q_nb_eval" -> EvalSql.over(nbQualitySql, "true_label", "pred_label"),
    "q_auc" ->
      """WITH r AS (
        |  SELECT source, n_chars, CAST(lang = 'en' AS INT) AS pos,
        |         rank() OVER (PARTITION BY source ORDER BY n_chars) AS rk,
        |         count(*) OVER (PARTITION BY source, n_chars) AS m
        |  FROM documents
        |), a AS (
        |  SELECT source,
        |         CAST(sum(pos) AS BIGINT) AS n_pos,
        |         CAST(sum(1 - pos) AS BIGINT) AS n_neg,
        |         CAST(sum(CASE WHEN pos = 1 THEN 2 * rk + m - 1 ELSE 0 END) AS BIGINT) AS r2
        |  FROM r GROUP BY source
        |)
        |SELECT source, n_pos, n_neg,
        |       r2 - n_pos * (n_pos + 1) AS auc_num,
        |       n_pos * n_neg * 2 AS auc_den,
        |       CASE WHEN n_pos * n_neg = 0 THEN NULL
        |            ELSE ((r2 - n_pos * (n_pos + 1)) * 1000) // (n_pos * n_neg * 2)
        |       END AS auc_milli
        |FROM a""".stripMargin,
    "q_keyness" -> {
      def cell(x: String, row: String, colT: String) =
        s"(CASE WHEN $x = 0 THEN 0 ELSE $x * " +
          s"((${qlogSql(s"($x * n)")}) - (${qlogSql(s"($row * $colT)")})) END)"
      raw"""WITH grid AS (
           |  SELECT source AS grp, t AS term, CAST(count(*) AS BIGINT) AS a
           |  FROM (SELECT source,
           |               unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
           |        FROM documents)
           |  GROUP BY 1, 2
           |), rtot AS (SELECT grp, CAST(sum(a) AS BIGINT) AS rt FROM grid GROUP BY grp),
           |ctot AS (SELECT term, CAST(sum(a) AS BIGINT) AS ct FROM grid GROUP BY term),
           |ntot AS (SELECT CAST(sum(a) AS BIGINT) AS n FROM grid),
           |sc AS (
           |  SELECT grp, term, a, rt, ct, n,
           |         ct - a AS b, rt - a AS c, n - rt - ct + a AS d
           |  FROM grid JOIN rtot USING (grp) JOIN ctot USING (term) CROSS JOIN ntot
           |), g AS (
           |  SELECT grp, term, a, n, rt, ct,
           |         2 * (${cell("a", "rt", "ct")}
           |            + ${cell("b", "(n - rt)", "ct")}
           |            + ${cell("c", "rt", "(n - ct)")}
           |            + ${cell("d", "(n - rt)", "(n - ct)")}) AS g2_q64
           |  FROM sc
           |)
           |SELECT grp AS source, term, a, g2_q64, krank FROM (
           |  SELECT grp, term, a, g2_q64,
           |         row_number() OVER (PARTITION BY grp
           |                            ORDER BY g2_q64 DESC, term) AS krank
           |  FROM g WHERE a * n > rt * ct
           |) WHERE krank <= 10""".stripMargin
    },
    "q_ctfidf" ->
      raw"""WITH grid AS (
           |  SELECT lang AS grp, t AS term, CAST(count(*) AS BIGINT) AS tf
           |  FROM (SELECT lang,
           |               unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
           |        FROM documents)
           |  GROUP BY 1, 2
           |), ctot AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ft FROM grid GROUP BY term),
           |tot AS (SELECT CAST(count(DISTINCT grp) AS BIGINT) AS nc,
           |               CAST(sum(tf) AS BIGINT) AS n FROM grid),
           |sc AS (
           |  SELECT grp, term, tf,
           |         tf * ((${qlogSql("(ft * nc + n)")}) - (${qlogSql("(ft * nc)")})) AS score_q64
           |  FROM grid JOIN ctot USING (term) CROSS JOIN tot
           |)
           |SELECT grp AS lang, term, tf, score_q64, krank FROM (
           |  SELECT grp, term, tf, score_q64,
           |         row_number() OVER (PARTITION BY grp
           |                            ORDER BY score_q64 DESC, term) AS krank
           |  FROM sc
           |) WHERE krank <= 10""".stripMargin,
    "q_distinct_n" -> {
      def branch(n: Int): String = {
        val gram = (1 to n).map(i => s"toks[i+$i]").mkString(" || ' ' || ")
        raw"""SELECT source, $n AS n,
             |       CAST(sum(c) AS BIGINT) AS n_grams,
             |       CAST(count(*) AS BIGINT) AS n_distinct,
             |       (1000 * CAST(count(*) AS BIGINT))
             |         // greatest(CAST(sum(c) AS BIGINT), 1) AS distinct_pm
             |FROM (
             |  SELECT source, g, CAST(count(*) AS BIGINT) AS c FROM (
             |    SELECT source, unnest(list_transform(range(len(toks) - ${n - 1}),
             |                   i -> $gram)) AS g
             |    FROM (SELECT source, string_split_regex(trim(lower(text)), '\s+') AS toks
             |          FROM documents)
             |  ) GROUP BY source, g
             |) GROUP BY source""".stripMargin
      }
      Seq(1, 2, 3).map(branch).mkString("\nUNION ALL\n")
    },
    "q_kl_source" ->
      raw"""WITH grid AS (
           |  SELECT source AS grp, t AS term, CAST(count(*) AS BIGINT) AS c
           |  FROM (SELECT source,
           |               unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
           |        FROM documents)
           |  GROUP BY 1, 2
           |), rtot AS (SELECT grp, CAST(sum(c) AS BIGINT) AS ns FROM grid GROUP BY grp),
           |ctot AS (SELECT term, CAST(sum(c) AS BIGINT) AS ct FROM grid GROUP BY term),
           |ntot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM grid),
           |kl AS (
           |  SELECT grp, ns,
           |         c * ((${qlogSql("(c * n)")}) - (${qlogSql("(ns * ct)")})) AS k
           |  FROM grid JOIN rtot USING (grp) JOIN ctot USING (term) CROSS JOIN ntot
           |)
           |SELECT grp AS source, max(ns) AS n_tokens,
           |       CAST(sum(k) AS BIGINT) AS kl_q64_sum,
           |       CAST(sum(k) AS BIGINT) // max(ns) AS kl_avg_q64
           |FROM kl GROUP BY grp""".stripMargin,
    "q_readability" ->
      raw"""SELECT doc_id, w, s, syl,
           |       (390 * w * w + 11800 * syl * s - 15590 * s * w) // (s * w) AS fk_milli
           |FROM (
           |  SELECT doc_id,
           |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS w,
           |         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS s,
           |         CAST(list_sum(list_transform(
           |                string_split_regex(trim(lower(text)), '\s+'),
           |                t -> greatest(len(regexp_extract_all(t, '[aeiouy]+')), 1))) AS BIGINT) AS syl
           |  FROM documents WHERE trim(text) <> ''
           |)""".stripMargin,
    "q_luhn" ->
      """WITH p AS (
        |  SELECT doc_id,
        |         concat('ref 4', lpad(CAST(doc_id AS VARCHAR), 14, '0'),
        |                CAST(doc_id % 10 AS VARCHAR), ' end') AS pan_text
        |  FROM documents),
        |c AS (SELECT doc_id, unnest(regexp_extract_all(pan_text, '[0-9]{13,19}')) AS cand
        |      FROM p),
        |d AS (SELECT doc_id, cand, unnest(range(1, len(cand) + 1)) AS pos FROM c),
        |s AS (SELECT doc_id, cand,
        |             CAST(sum(CASE WHEN (len(cand) - pos) % 2 = 1
        |                           THEN 2 * dig - CASE WHEN dig >= 5 THEN 9 ELSE 0 END
        |                           ELSE dig END) AS BIGINT) AS tot
        |      FROM (SELECT doc_id, cand, pos,
        |                   CAST(substr(cand, CAST(pos AS INT), 1) AS INT) AS dig
        |            FROM d)
        |      GROUP BY doc_id, cand)
        |SELECT doc_id, cand, CAST(tot % 10 = 0 AS INT) AS luhn_valid FROM s""".stripMargin,
    "q_dsir" -> dsirSql,
    "q_curation" ->
      s"""WITH ${gopherCtes("documents")},
         |gpass AS (SELECT doc_id FROM gverdict WHERE pass = 1),
         |cl AS (SELECT d.doc_id, d.lang, d.text FROM documents d JOIN gpass USING (doc_id)),
         |dd AS (
         |  SELECT doc_id, lang, text FROM (
         |    SELECT cl.*, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |    FROM cl
         |  ) WHERE rn = 1),
         |${dsirCtes("dd")}
         |SELECT doc_id, iw, row_number() OVER (ORDER BY iw DESC, doc_id) AS rank,
         |       CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90 THEN 'train'
         |            WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 95 THEN 'val'
         |            ELSE 'test' END AS split
         |FROM dsir_top""".stripMargin,
    "q_nb_confusion" ->
      s"""SELECT true_label, pred_label, count(*) AS n
         |FROM ($nbQualitySql)
         |GROUP BY 1, 2""".stripMargin
  )

  /** Full repetition-signal replay (HeuristicRules.repetitionSignals):
    * line/paragraph duplicate mass via list_distinct, per-n gram
    * stats via unnest + GROUP BY (set-identical to the Spark side's
    * in-row sorted fold: same counts, same smallest-gram tie-break via
    * (c DESC, gram ASC), same c≥2 top convention), and the combined
    * Gopher verdict in the exact cross-multiplied rational forms. */
  private lazy val repSignalsSql: String =
    s"WITH ${repCtes("documents")}\nSELECT * FROM rverdict"

  /** Repetition-battery CTE chain over any (doc_id, text) relation:
    * emits `rverdict` = all 17 integer signals + the combined pass.
    * Shared by q_rep_signals and the datasheet capstone. */
  private def repCtes(src: String): String = {
    def grams(n: Int): String =
      raw"""gr$n AS (
           |  SELECT doc_id, gram, count(*) AS c, length(gram) AS gl
           |  FROM (SELECT doc_id,
           |          unnest(CASE WHEN len(ltoks) < $n THEN []
           |                 ELSE list_transform(range(len(ltoks) - $n + 1),
           |                        i -> array_to_string(ltoks[i+1:i+$n], ' ')) END) AS gram
           |        FROM rbase)
           |  GROUP BY 1, 2
           |)""".stripMargin
    def top(n: Int): String =
      raw"""top$n AS (
           |  SELECT doc_id, CAST(CASE WHEN c >= 2 THEN c * gl ELSE 0 END AS BIGINT) AS chars
           |  FROM (SELECT doc_id, c, gl,
           |          row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram ASC) AS rn
           |        FROM gr$n) WHERE rn = 1
           |)""".stripMargin
    def dup(n: Int): String =
      raw"""dup$n AS (
           |  SELECT doc_id, CAST(sum((c - 1) * gl) AS BIGINT) AS chars
           |  FROM gr$n WHERE c > 1 GROUP BY 1
           |)""".stripMargin
    def seq(col: String, pre: String): String =
      s"""CAST(len($col) AS BIGINT) AS n_$pre,
         |CAST(len($col) - len(list_distinct($col)) AS BIGINT) AS dup_$pre,
         |CAST(coalesce(list_sum(list_transform($col, x -> length(x))), 0)
         |   - coalesce(list_sum(list_transform(list_distinct($col), x -> length(x))), 0)
         |     AS BIGINT) AS dup_${pre}_chars""".stripMargin
    val gramCtes = ((2 to 10).map(grams) ++ (2 to 4).map(top) ++ (5 to 10).map(dup))
      .mkString(",\n")
    val topJoins = (2 to 4).map(n => s"LEFT JOIN top$n t$n USING (doc_id)").mkString("\n")
    val dupJoins = (5 to 10).map(n => s"LEFT JOIN dup$n d$n USING (doc_id)").mkString("\n")
    val topCols = (2 to 4).map(n => s"coalesce(t$n.chars, 0) AS top${n}_chars").mkString(",\n")
    val dupCols = (5 to 10).map(n => s"coalesce(d$n.chars, 0) AS dup${n}_chars").mkString(",\n")
    raw"""rbase AS (
         |  SELECT doc_id,
         |         CAST(length(text) AS BIGINT) AS text_chars,
         |         string_split(text, chr(10)) AS lines,
         |         string_split(text, chr(10) || chr(10)) AS paras,
         |         string_split_regex(trim(lower(text)), '\s+') AS ltoks
         |  FROM $src
         |),
         |rseq AS (
         |  SELECT doc_id, text_chars,
         |         ${seq("lines", "lines")},
         |         ${seq("paras", "paras")}
         |  FROM rbase
         |),
         |$gramCtes,
         |rwide AS (
         |  SELECT rseq.doc_id, text_chars,
         |         n_lines, dup_lines, dup_lines_chars AS dup_line_chars,
         |         n_paras, dup_paras, dup_paras_chars AS dup_para_chars,
         |         $topCols,
         |         $dupCols
         |  FROM rseq
         |  $topJoins
         |  $dupJoins
         |),
         |rverdict AS (
         |SELECT *,
         |       CAST(10 * dup_lines <= 3 * n_lines
         |        AND 10 * dup_paras <= 3 * n_paras
         |        AND 5 * dup_line_chars <= text_chars
         |        AND 5 * dup_para_chars <= text_chars
         |        AND 5 * top2_chars <= text_chars
         |        AND 50 * top3_chars <= 9 * text_chars
         |        AND 25 * top4_chars <= 4 * text_chars
         |        AND 20 * dup5_chars <= 3 * text_chars
         |        AND 50 * dup6_chars <= 7 * text_chars
         |        AND 100 * dup7_chars <= 13 * text_chars
         |        AND 25 * dup8_chars <= 3 * text_chars
         |        AND 100 * dup9_chars <= 11 * text_chars
         |        AND 10 * dup10_chars <= text_chars AS INT) AS pass
         |FROM rwide
         |)""".stripMargin
  }

  /** Per-source datasheet replay (quality.Datasheet.perSource): the
    * three heuristic batteries' per-doc verdicts come from the shared
    * CTE builders (gopherCtes / repCtes) plus an inline C4 pass, then
    * four per-source aggregate families joined on source. */
  /** q_quality_ensemble replay — shared with the q_rrf_select stage
    * oracle. */
  private[queries] lazy val qualityEnsembleSql: String =
    raw"""WITH base AS (
         |  SELECT doc_id,
         |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS toks,
         |         CAST(len(list_distinct(string_split_regex(lower(trim(text)), '\s+'))) AS BIGINT) AS dtoks,
         |         CAST(length(text) AS BIGINT) AS chrs
         |  FROM documents),
         |sig AS (
         |  SELECT doc_id, toks AS s_len,
         |         (1000 * dtoks) // toks AS s_ttr,
         |         (1000 * chrs) // toks AS s_wchar
         |  FROM base WHERE toks >= 1),
         |r AS (
         |  SELECT doc_id,
         |         row_number() OVER (ORDER BY s_len DESC, doc_id ASC) AS r1,
         |         row_number() OVER (ORDER BY s_ttr DESC, doc_id ASC) AS r2,
         |         row_number() OVER (ORDER BY s_wchar DESC, doc_id ASC) AS r3
         |  FROM sig)
         |SELECT doc_id,
         |       CAST(1000000 // (60 + r1) + 1000000 // (60 + r2) + 1000000 // (60 + r3) AS BIGINT) AS rrf_score,
         |       CAST(3 AS BIGINT) AS n_signals
         |FROM r""".stripMargin

  private[queries] lazy val datasheetSql: String =
    raw"""WITH ${gopherCtes("documents")},
         |${repCtes("documents")},
         |c4p AS (
         |  SELECT doc_id,
         |         CAST(length(ct) - length(regexp_replace(ct, '[.!?]', '', 'g')) >= 5
         |              AND has_lorem = 0 AND has_brace = 0 AS BIGINT) AS pc
         |  FROM (
         |    SELECT doc_id, coalesce(array_to_string(kept, chr(10)), '') AS ct,
         |           CAST(contains(lower(text), 'lorem ipsum') AS INT) AS has_lorem,
         |           CAST(contains(text, '{') AS INT) AS has_brace
         |    FROM (SELECT doc_id, text,
         |            list_filter(string_split(text, chr(10)),
         |              l -> regexp_matches(rtrim(l), '[.!?"]$$')
         |                   AND len(string_split_regex(trim(l), '\s+')) >= 3) AS kept
         |          FROM documents)
         |  )
         |),
         |ds AS (
         |  SELECT doc_id, source, lang,
         |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok,
         |         CAST(length(text) AS BIGINT) AS n_chr,
         |         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
         |  FROM documents),
         |dbase AS (
         |  SELECT source,
         |         count(*) AS n_docs,
         |         CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |         CAST(sum(n_chr) AS BIGINT) AS n_chars,
         |         CAST(sum(g.pass) AS BIGINT) AS gopher_pass,
         |         CAST(sum(c.pc) AS BIGINT) AS c4_pass,
         |         CAST(sum(r.pass) AS BIGINT) AS rep_pass
         |  FROM ds
         |  JOIN gverdict g USING (doc_id)
         |  JOIN c4p c USING (doc_id)
         |  JOIN rverdict r USING (doc_id)
         |  GROUP BY 1),
         |dlangs AS (SELECT source, count(*) AS n_langs
         |           FROM (SELECT DISTINCT source, lang FROM ds) GROUP BY 1),
         |ddups AS (SELECT source, CAST(sum(c - 1) AS BIGINT) AS dup_docs
         |          FROM (SELECT source, fp, count(*) AS c FROM ds GROUP BY 1, 2)
         |          GROUP BY 1),
         |dvocab AS (SELECT source, count(*) AS vocab
         |           FROM (SELECT DISTINCT source,
         |                   unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
         |                 FROM documents) GROUP BY 1)
         |SELECT dbase.source, n_docs, n_tokens, n_chars, gopher_pass, c4_pass,
         |       rep_pass, n_langs, dup_docs, vocab
         |FROM dbase
         |JOIN dlangs USING (source)
         |JOIN ddups USING (source)
         |JOIN dvocab USING (source)""".stripMargin

  /** Gopher rule-battery CTE chain over any source relation `src`
    * (doc_id, text): emits gverdict = metrics + per-rule passes +
    * the combined `pass`. Shared by q_gopher_rules and the curation
    * capstone. */
  private def gopherCtes(src: String): String = {
    val (lo, hi) = (PrepParams.GopherMinWords, PrepParams.GopherMaxWords)
    raw"""gbase AS (
         |  SELECT doc_id,
         |         CAST(len(toks) AS BIGINT) AS n_words,
         |         CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS n_chars_tok,
         |         CAST(len(list_filter(list_transform(toks, x -> lower(x)),
         |                              x -> x IN ($stopSqlList))) AS BIGINT) AS stop_hits,
         |         CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha_words,
         |         CASE WHEN len(ltoks) < 2 THEN []
         |              ELSE list_transform(range(len(ltoks) - 1), i -> ltoks[i+1] || ' ' || ltoks[i+2]) END AS g
         |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks,
         |               string_split_regex(trim(lower(text)), '\s+') AS ltoks
         |        FROM $src)
         |),
         |gtg AS (
         |  SELECT doc_id, gram, count(*) AS c
         |  FROM (SELECT doc_id, unnest(g) AS gram FROM gbase) GROUP BY 1, 2
         |),
         |gtop AS (
         |  SELECT doc_id, gram AS top2_gram, c AS top2_count FROM (
         |    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram ASC) AS rn
         |    FROM gtg
         |  ) WHERE rn = 1
         |),
         |gverdict AS (
         |  SELECT doc_id, n_words, n_chars_tok, stop_hits, alpha_words,
         |         top2_count, top2_gram,
         |         pass_word_count, pass_mean_len, pass_stop, pass_alpha, pass_dup2,
         |         CAST(pass_word_count = 1 AND pass_mean_len = 1 AND pass_stop = 1
         |              AND pass_alpha = 1 AND pass_dup2 = 1 AS INT) AS pass
         |  FROM (
         |    SELECT b.doc_id, b.n_words, b.n_chars_tok, b.stop_hits, b.alpha_words,
         |           CAST(coalesce(t.top2_count, 0) AS BIGINT) AS top2_count,
         |           coalesce(t.top2_gram, '') AS top2_gram,
         |           CAST(b.n_words >= $lo AND b.n_words <= $hi AS INT) AS pass_word_count,
         |           CAST(3 * b.n_words <= b.n_chars_tok AND b.n_chars_tok <= 10 * b.n_words AS INT) AS pass_mean_len,
         |           CAST(b.stop_hits >= 2 AS INT) AS pass_stop,
         |           CAST(10 * b.alpha_words >= 8 * b.n_words AS INT) AS pass_alpha,
         |           CAST(5 * CAST(coalesce(t.top2_count, 0) AS BIGINT) * length(coalesce(t.top2_gram, ''))
         |                <= b.n_chars_tok + b.n_words - 1 AS INT) AS pass_dup2
         |    FROM gbase b LEFT JOIN gtop t USING (doc_id)
         |  )
         |)""".stripMargin
  }

  /** qlog64 (NaiveBayes.qlog64) replayed in DuckDB: bit-length +
    * linear-mantissa chord, all-integer (`x`·64 stays ≤ 2^53 so the
    * double division is exact). */
  private def qlogSql(x: String): String =
    s"64 * (length(bin($x)) - 1) + " +
      s"CAST(floor(($x * 64) / pow(2, length(bin($x)) - 1)) AS BIGINT) - 64"

  /** Full DSIR replay (graft.quality.Dsir): hashed unigram+bigram
    * feature stream, Laplace-smoothed target/raw models, qlog64
    * ratio grid, per-doc weight sums, deterministic top-k. */
  private lazy val dsirSql: String =
    s"""WITH ${dsirCtes("documents")}
       |SELECT doc_id, iw, row_number() OVER (ORDER BY iw DESC, doc_id) AS rank
       |FROM dsir_top""".stripMargin

  /** DSIR CTE chain over any source relation `src` (must carry
    * doc_id, lang, text): emits dsir_top = the selected (doc_id, iw)
    * rows. Shared by q_dsir and the curation capstone. */
  private def dsirCtes(src: String): String = {
    val b = PrepParams.DsirBuckets
    val k = PrepParams.DsirTopK
    val scale = 1L << PrepParams.DsirScaleBits
    raw"""toks AS (
         |  SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\s+') AS tk
         |  FROM $src),
         |feat AS (
         |  SELECT doc_id, lang, ('0x' || substr(md5(g), 1, 7))::BIGINT % $b AS f
         |  FROM (SELECT doc_id, lang, unnest(list_concat(
         |          tk, list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i + 1]))) AS g
         |        FROM toks)),
         |tc AS (SELECT f, count(*) AS n_t FROM feat WHERE lang = 'en' GROUP BY 1),
         |rc AS (SELECT f, count(*) AS n_r FROM feat GROUP BY 1),
         |tm AS (SELECT CAST(sum(n_t) AS BIGINT) AS m_t FROM tc),
         |rmass AS (SELECT CAST(sum(n_r) AS BIGINT) AS m_r FROM rc),
         |grid AS (
         |  SELECT bk.f, coalesce(tc.n_t, 0) AS n_t, coalesce(rc.n_r, 0) AS n_r, m_t, m_r
         |  FROM (SELECT unnest(range($b)) AS f) bk
         |  LEFT JOIN tc ON tc.f = bk.f
         |  LEFT JOIN rc ON rc.f = bk.f
         |  CROSS JOIN tm CROSS JOIN rmass),
         |ratio AS (
         |  SELECT f, ${qlogSql(s"((n_t + 1) * $scale) // (m_t + $b)")} -
         |            (${qlogSql(s"((n_r + 1) * $scale) // (m_r + $b)")}) AS dw
         |  FROM grid),
         |w AS (
         |  SELECT feat.doc_id, CAST(sum(r.dw) AS BIGINT) AS iw
         |  FROM feat JOIN ratio r ON feat.f = r.f GROUP BY 1),
         |dsir_top AS (SELECT doc_id, iw FROM w ORDER BY iw DESC, doc_id LIMIT $k)""".stripMargin
  }

  /** Full NB replay: training (counts, smoothing, priors) AND
    * inference (weight sum + argmax) in one DuckDB query. */
  /** The NB chain through `fin` (per held-out doc, every class's
    * integer score) — shared by q_nb_quality's argmax replay and
    * q_nb_calibration's margin-bin replay so the training/scoring
    * replay can't drift between the two gates. */
  private lazy val nbFinCtes: String = {
    val b = PrepParams.NbBuckets
    val m = PrepParams.NbHoldMod
    val scale = 1L << PrepParams.NbScaleBits
    raw"""tok AS (
         |  SELECT doc_id, true_label,
         |         ('0x' || substr(md5(t), 1, 7))::BIGINT % $b AS f
         |  FROM (SELECT doc_id, lang AS true_label,
         |               unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
         |        FROM documents)
         |),
         |tr AS (SELECT * FROM tok WHERE doc_id % $m <> 0),
         |te AS (SELECT * FROM tok WHERE doc_id % $m = 0),
         |counts AS (SELECT true_label AS lab, f, count(*) AS n FROM tr GROUP BY 1, 2),
         |mass AS (SELECT lab, CAST(sum(n) AS BIGINT) AS n_lab FROM counts GROUP BY 1),
         |cdocs AS (SELECT lang AS lab, count(*) AS d_lab FROM documents
         |          WHERE doc_id % $m <> 0 GROUP BY 1),
         |tot AS (SELECT count(*) AS n_docs FROM documents WHERE doc_id % $m <> 0),
         |grid AS (
         |  SELECT c.lab, bk.f, coalesce(n.n, 0) AS n, ms.n_lab
         |  FROM cdocs c
         |  CROSS JOIN (SELECT unnest(range($b)) AS f) bk
         |  LEFT JOIN counts n ON n.lab = c.lab AND n.f = bk.f
         |  JOIN mass ms ON ms.lab = c.lab
         |),
         |w AS (
         |  SELECT lab, f, ${qlogSql(s"((n + 1) * $scale) // (n_lab + $b)")} AS w
         |  FROM grid
         |),
         |pri AS (
         |  SELECT lab, ${qlogSql(s"(d_lab * $scale) // n_docs")} AS prior
         |  FROM cdocs CROSS JOIN tot
         |),
         |sc AS (
         |  SELECT te.doc_id, te.true_label, w.lab, CAST(sum(w.w) AS BIGINT) AS sw
         |  FROM te JOIN w ON te.f = w.f
         |  GROUP BY 1, 2, 3
         |),
         |fin AS (
         |  SELECT sc.doc_id, sc.true_label, sc.lab, sc.sw + pri.prior AS score
         |  FROM sc JOIN pri ON sc.lab = pri.lab
         |)""".stripMargin
  }

  private lazy val nbQualitySql: String =
    raw"""WITH $nbFinCtes
         |SELECT doc_id, true_label, pred_label, score, correct FROM (
         |  SELECT doc_id, true_label, lab AS pred_label, score,
         |         CAST(true_label = lab AS INT) AS correct,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lab ASC) AS rk
         |  FROM fin
         |) WHERE rk = 1""".stripMargin

  /** Margin-calibration replay: top-2 scores per doc from the shared
    * chain, fixed-width integer margin bins, per-bin accuracy. */
  private lazy val nbCalibrationSql: String =
    raw"""WITH $nbFinCtes,
         |sel AS (
         |  SELECT doc_id,
         |         max(CASE WHEN rk = 1 THEN CAST(true_label = lab AS BIGINT) END) AS ok,
         |         max(CASE WHEN rk = 1 THEN score END) AS s1,
         |         max(CASE WHEN rk = 2 THEN score END) AS s2
         |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
         |                                     ORDER BY score DESC, lab ASC) AS rk
         |        FROM fin)
         |  WHERE rk <= 2 GROUP BY doc_id
         |)
         |SELECT (s1 - s2) // ${PrepParams.NbCalibWidth} AS margin_bin,
         |       count(*) AS n, CAST(sum(ok) AS BIGINT) AS n_correct,
         |       (CAST(sum(ok) AS BIGINT) * 1000) // count(*) AS acc_pm
         |FROM sel WHERE s2 IS NOT NULL
         |GROUP BY 1""".stripMargin
}
