package graft.queries

/** Single source of truth for the text-prep / dedup query parameters
  * that must agree between the Spark lambdas and their DuckDB oracle
  * SQL (same contract as [[AnnParams]] — editing one side silently
  * broke the gate before these were shared). */
object PrepParams {
  // q_decontam: every doc_id ≡ 0 (mod BenchMod) plays the eval set.
  // DecontamN and BoilerN are pinned to 3 because the shared oracle
  // shingle CTE (DedupQueries.shinglesCteOn) is written as 3-grams.
  val BenchMod = 50
  val DecontamN = 3
  val DecontamMinHits = 3

  // q_rouge_capped / q_rouge_cap_audit: grade at most this many
  // flagged pairs per corpus doc (most-severe by screen hits,
  // bench_id tie-break) — the production bound for adversarial
  // corpora where one doc flags against thousands of bench items.
  // The capped pair screens at minHits = 1 (vs the uncapped anchor's
  // 3) so the cap actually BINDS at sf0.01 (docs flag up to 4 pairs
  // there; at the anchor's screen point every doc flags exactly one
  // and a cap gate would assert nothing).
  val RougeMaxPairsPerDoc = 2
  val RougeCapMinHits = 1L

  // q_decontam_sem: hashed-BoW cosine threshold for the semantic
  // screen. Probed on the synthetic corpora: 0.8 flags a real pair set
  // (564 at sf0.001, 391 at sf0.01) while 0.9 leaves single digits —
  // real model embeddings would sit at 0.9+ (the SemDeDup experience);
  // the hashed projection is noisier, hence the lower gate point.
  val SemDecontamTau = 0.8

  // q_source_overlap: md5 fingerprint of the first OpeningTokens tokens
  val OpeningTokens = 5

  // q_boilerplate
  val BoilerN = 3
  val BoilerMinDocFreq = 5

  // q_token_sample: per-source token budget — small enough that the
  // budget actually binds at sf0.01 (sources carry ~1350 tokens)
  val SampleTokenBudget = 500L

  // q_bigram_lm: bigrams with corpus count <= BgRareMax are rare.
  // At sf0.01 the 916 distinct bigrams have counts 1..48 (median 29),
  // so 25 marks a real rare tail while most mass stays common.
  val BgRareMax = 25L

  // q_bm25: bag-of-terms query mixing the rare 'dup' (df≈25 at
  // sf0.01 — high idf) with three common vocabulary words, so the
  // ranking exercises both idf spread and the length normalization.
  val Bm25Terms: Seq[String] = Seq("dup", "spark", "merge", "window")
  val Bm25TopK = 50

  // q_lm_score: tokens with corpus occurrence count <= LmRareMax count
  // as rare. The synthetic vocabulary is 31 tokens with counts 26..964
  // at sf0.01, so 100 separates a genuinely rare tail token from the
  // common mass at the gate SF.
  val LmRareMax = 100L

  // q_corpus_diff: the "new" snapshot drops doc_id ≡ 0 (mod RemoveMod),
  // rewrites text at doc_id ≡ 0 (mod ChangeMod), and adds fresh docs at
  // AddOffset + doc_id for doc_id ≡ 0 (mod AddMod) — all four statuses
  // populated at sf0.01 (500 docs → ~29 removed / ~34 changed / ~21 added)
  val DiffRemoveMod = 17
  val DiffChangeMod = 13
  val DiffAddMod = 23
  val DiffAddOffset = 10000000L

  // q_source_cap: per-source doc cap — 15 of the 25 docs/source at
  // sf0.01, so the cap binds on every source.
  val SourceCapMax = 15

  // q_substring_spans / q_substring_scrub: exact substring dedup
  // window width (tokens) and the paper's ≥2 occurrence threshold. 8
  // tokens keeps real duplicated spans at sf0.01 (~1k dup windows)
  // while staying above the by-chance-collision floor.
  val SubstrWindow = 8
  val SubstrMinCount = 2L

  // q_gopher_rules: the word-count window — 20..80 makes the rule
  // actually bind at sf0.01 (docs carry 10..99 tokens; Gopher's
  // published 50..100k window would fail only the shortest docs)
  val GopherMinWords = 20
  val GopherMaxWords = 80

  // q_sentence_dedup: C4 3-sentence-span dedup — sentence fallback
  // width for punctuation-less text (the synthetic corpus has no
  // terminals, so every doc segments into 8-token sentences; 8 keeps
  // real duplicated spans at sf0.01: 187 occurrences over 43 docs).
  val SentMaxTokens = 8

  // q_incr_dedup: every doc_id ≡ 0 (mod IncrBatchMod) plays the
  // "new crawl drop"; the rest is the existing corpus.
  val IncrBatchMod = 4

  // q_winnow: char-gram size and window width (guarantee threshold
  // = WinnowW + WinnowK - 1 = 8 chars, density ≈ 2/(WinnowW+1)).
  // q_winnow_pairs: pairs sharing ≥ MinShared fingerprints, after
  // dropping boilerplate fingerprints in > MaxDocFreq docs.
  val WinnowK = 5
  val WinnowW = 4
  val WinnowMinShared = 10L
  val WinnowMaxDocFreq = 50L

  // q_token_drift: top-k tokens by |share_A − share_B| (A = even ids)
  val DriftTopK = 10

  // q_weighted_sample: inclusion probability = min(1, n_chars/this) —
  // the corpus median is ~306 chars at sf0.01, so the gate binds for
  // most documents without being degenerate either way
  val WSampleThreshold = 400L

  // q_nb_quality / q_nb_confusion: trained Naive-Bayes probe — hashed
  // feature buckets, fixed-point log scale, and the held-out slice
  // (doc_id ≡ 0 mod NbHoldMod scores, the rest trains). 256 buckets
  // comfortably hold the 31-token synthetic vocabulary collision-free
  // in expectation; 2^40 scale keeps (n+1)·scale inside a long for
  // per-(class, bucket) counts up to 4M (SURVEY §2.5 note).
  val NbBuckets = 256
  val NbHoldMod = 4
  val NbScaleBits = 40

  /** q_nb_calibration margin-bin width in qlog64 score units: held-out
    * margins span ≈15–700 on the sf corpora, so 128 spreads them over
    * ~5 equal-width bins with double-digit populations each. */
  val NbCalibWidth = 128L

  // q_dsir: hashed unigram+bigram buckets, fixed-point log scale, and
  // the deterministic top-k. 512 buckets give the ~31-token synthetic
  // vocabulary's ~900 distinct bigrams a low-collision grid; k = 60
  // selects a strict subset at sf0.01 (500 docs) and exercises the
  // all-docs-ranked branch at sf0.001 (50 docs).
  val DsirBuckets = 512
  val DsirScaleBits = 40
  val DsirTopK = 60

  // q_priority_sample: fixed sample size — small enough that the
  // threshold τ binds at sf0.001 (≥ 50 docs) and the estimate branch
  // max(w, τ) exercises both sides at sf0.01
  val PrioK = 40

  // q_group_priority_sample: per-source sample size — 8 < 25 (the
  // smallest per-source doc count at any sf), so the per-group
  // threshold τ binds for EVERY source and the GroupTopK heap cap
  // is exercised everywhere
  val GroupPrioK = 8

  // q_hash_embed / q_text_knn: signed hashed bag-of-words projection
  // dimension and the text-kNN gate (every doc_id ≡ 0 mod TextKnnMod
  // queries for its TextKnnK lexical nearest neighbours). 64 dims keep
  // the oracle's per-component replay compact while the ~31-token
  // synthetic vocabulary still spreads over most buckets.
  val HashDim = 64
  val TextKnnMod = 25
  val TextKnnK = 3

  // q_unimax / q_unimax_sample: budget = total_tokens · 8 div 5
  // (RELATIVE to the corpus, so the same funded-prefix / budget-bound
  // structure appears at every SF: the four smaller languages fit
  // under the 2-epoch cap, `en` is budget-bound), cap = 2000
  // milli-epochs (at most two passes over any language's data).
  val UnimaxBudgetNum = 8L
  val UnimaxBudgetDen = 5L
  val UnimaxEpochsMilli = 2000L

  // q_sorted_neighbors: sort-key fingerprint length, window size, and
  // the Jaccard gate as a rational (i·Den ≥ u·Num keeps the pair).
  // τ = 0.9: the synthetic corpus has a 31-token vocabulary, so word
  // SETS of unrelated docs already overlap heavily — only a high bar
  // separates true near-dups (160 pairs at sf0.01) from the mass.
  val SnmKeyLen = 30
  val SnmWindow = 5
  val SnmTauNum = 9
  val SnmTauDen = 10
}
