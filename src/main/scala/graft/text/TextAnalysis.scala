package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (SURVEY.md §2.5):
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * Everything is built from native higher-order array expressions
  * (`split`/`filter`/`transform`/`aggregate`) — no UDFs, no
  * serialization boundary, distributed-safe at any scale. Integer
  * intermediates keep results bit-identical across engines.
  */
object TextAnalysis {

  /** Whitespace tokenizer (shmr's str records → word arrays). */
  def tokenize(text: Column): Column = split(trim(text), "\\s+")

  /** Token count. */
  def tokenCount(text: Column): Column = size(tokenize(text))

  /** BPE-ish subword proxy: alphanumeric runs + single non-space
    * symbols, the usual pre-tokenization regex family. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Count of tokens that belong to `vocab` (e.g. stopwords). */
  def vocabHits(tokens: Column, vocab: Seq[String]): Column =
    size(filter(tokens, t => t.isInCollection(vocab)))

  val enStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  val deStopwords: Seq[String] = Seq("der", "die", "das", "und", "ist", "von")
  val frStopwords: Seq[String] = Seq("le", "la", "les", "et", "est", "de")
  val esStopwords: Seq[String] = Seq("el", "la", "los", "y", "es", "de")

  /** Sum of token lengths (exact integer fold → portable). */
  def sumTokenLengths(tokens: Column): Column =
    aggregate(transform(tokens, t => length(t)), lit(0), (acc, x) => acc + x)

  /** Character-class profile: integer counts of letters / digits /
    * whitespace / punctuation / other per document — the charset
    * screen that runs BEFORE language-ID in a crawl pipeline (route
    * by script, drop binary-junk docs whose "other" mass is high).
    * Each count is one global regexp_replace length difference —
    * in-row, codegen, zero shuffles; classes are explicit ASCII sets
    * so the regexes mean the same thing in every engine. Columns:
    * (n_alpha, n_digit, n_space, n_punct, n_other). */
  def charClassProfile(text: Column): Seq[Column] = {
    def cnt(cls: String) =
      (length(text) - length(regexp_replace(text, cls, ""))).cast("long")
    val alpha = cnt("[A-Za-z]")
    val digit = cnt("[0-9]")
    val space = cnt("[ \\t\\n\\r]")
    val punct = cnt("[.,;:!?'\"()\\[\\]{}<>/@#$%&*+=_~|-]")
    val other = length(text).cast("long") - alpha - digit - space - punct
    Seq(alpha.as("n_alpha"), digit.as("n_digit"), space.as("n_space"),
      punct.as("n_punct"), other.as("n_other"))
  }

  /** Per-document token Shannon entropy in exact integer qlog64
    * units (64 units = 1 bit): ent64 = Σ_types c·(qlog64(N) −
    * qlog64(c)) over the doc's own token counts — the
    * gibberish-vs-natural-text signal (uniform noise maxes it,
    * one-token spam zeroes it) that quality stacks run alongside the
    * repetition battery. COMPUTED IN-ROW: tokens are sorted and run
    * lengths folded in one pass (the repetition-battery pattern), so
    * the corpus never shuffles — at 100 TB this is a scan, not an
    * explode+groupBy. Emits (n_tokens, ent64, ent_ct) with ent_ct =
    * ⌊100·ent64/N⌋, the per-token entropy in centi-qlog units —
    * integer division, so every column replays bit-for-bit. */
  def tokenEntropy(text: Column): Seq[Column] = {
    val toksSorted = array_sort(tokenize(lower(text)))
    val n = size(toksSorted).cast("long")
    val qn = graft.quality.NaiveBayes.qlog64(n)
    def closeRun(run: Column) = run * (qn - graft.quality.NaiveBayes.qlog64(run))
    val folded = aggregate(
      toksSorted,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"), lit(0L).as("acc")),
      (st, t) => when(st.getField("run") === 0L,
          struct(t.as("prev"), lit(1L).as("run"), lit(0L).as("acc")))
        .when(t <=> st.getField("prev"),
          struct(t.as("prev"), (st.getField("run") + 1L).as("run"),
            st.getField("acc").as("acc")))
        .otherwise(struct(t.as("prev"), lit(1L).as("run"),
          (st.getField("acc") + closeRun(st.getField("run"))).as("acc"))),
      st => when(st.getField("run") > 0L,
        st.getField("acc") + closeRun(st.getField("run"))).otherwise(0L))
    val ent = folded.cast("long")
    val scaled = lit(100L) * ent
    val entCt = ((scaled - pmod(scaled, n)) / n).cast("long") // exact ⌊100·ent/N⌋
    Seq(n.as("n_tokens"), ent.as("ent64"), entCt.as("ent_ct"))
  }

  /** Language ID: stopword-hit score per language, deterministic
    * argmax (fixed priority order on ties). N-gram profiles would be
    * the production upgrade; the hit-count heuristic is the standard
    * cheap first pass and is engine-portable for the oracle. */
  def langId(text: Column): Column = {
    val toks = transform(tokenize(text), t => lower(t))
    val en = vocabHits(toks, enStopwords)
    val de = vocabHits(toks, deStopwords)
    val fr = vocabHits(toks, frStopwords)
    val es = vocabHits(toks, esStopwords)
    val m = greatest(en, de, fr, es)
    when(m === 0, lit("unknown"))
      .when(en === m, lit("en"))
      .when(de === m, lit("de"))
      .when(fr === m, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Document fingerprint: stable content hash of the
    * whitespace-normalized, lowercased text. Portable (md5) so
    * fingerprints can be joined across engines/runs. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Winnowing fingerprints (Schleimer–Wilkerson–Aiken, the MOSS
    * algorithm): hash every char k-gram, slide a w-gram window over
    * the positions, keep each window's minimum hash. Any two docs
    * sharing a substring of length ≥ w+k−1 share a fingerprint, at
    * expected density 2/(w+1) of the gram count — local document
    * edits only perturb fingerprints near the edit.
    *
    * Trailing-window variant: position p's window is the last w grams
    * ending at p (truncated at the doc start), so docs shorter than w
    * grams still fingerprint and no boundary special-case exists.
    * Hashes are the portable 60-bit md5 family, so the selection
    * replays exactly in any engine.
    *
    * ZERO shuffles: the whole selection runs inside the native
    * [[org.apache.spark.sql.graft.WinnowHashes]] expression (one
    * O(len) pass per row, monotonic-deque sliding min) and only the
    * ~2/(w+1)-density fingerprints explode — the composed
    * formulation (posexplode → hash → per-doc window min → filter)
    * ships EVERY char-gram of the corpus through an exchange first.
    * Fingerprints are distinct within a doc by construction, so no
    * post-distinct either. */
  def winnowFingerprints(df: org.apache.spark.sql.DataFrame, text: Column, id: Column,
      k: Int = 5, w: Int = 4): org.apache.spark.sql.DataFrame =
    df.select(id.as("doc_id"),
      explode(org.apache.spark.sql.graft.GraftTextFunctions.winnowHashes(text, k, w)).as("fp"))

  /** Substring-level near-dup pairs from shared winnowing
    * fingerprints: docs sharing ≥ `minShared` fingerprints copied a
    * run of text from each other even when their word sets diverge
    * (the MOSS verdict). Same bounded group-by-fingerprint shape as
    * the n-gram pair scorer: fingerprints held by a single doc never
    * leave the aggregate, `maxDocFreq` drops boilerplate fingerprints
    * (and bounds the collected lists). */
  def winnowPairs(df: org.apache.spark.sql.DataFrame, text: Column, id: Column,
      k: Int = 5, w: Int = 4, minShared: Long = 10,
      maxDocFreq: Long = 50): org.apache.spark.sql.DataFrame = {
    val fp = winnowFingerprints(df, text, id, k, w)
    val byFp = fp.groupBy("fp").agg(sort_array(collect_set(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) >= 2 && size(col("ds")) <= maxDocFreq)
    byFp.select(col("ds"), posexplode(col("ds")).as(Seq("i", "doc_a")))
      .select(col("doc_a"), explode(slice(col("ds"), col("i") + 2, size(col("ds")))).as("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Token-distribution drift between two corpus slices: the top-k
    * tokens by absolute share difference |cnt_a/A − cnt_b/B|, ranked
    * EXACTLY via the cross-multiplied integer |cnt_a·B − cnt_b·A|
    * (same ordering, no division) — the domain-shift diagnostic run
    * between crawls, sources, or time windows. One token aggregate +
    * a broadcast totals row; products go through decimal(38,0) so the
    * ranking key survives 100 TB-scale counts without overflow. */
  def tokenDriftTopK(df: org.apache.spark.sql.DataFrame, text: Column, isA: Column,
      k: Int): org.apache.spark.sql.DataFrame = {
    val tok = df.select(isA.as("__ga"), explode(split(trim(lower(text)), "\\s+")).as("token"))
    val counts = tok.groupBy("token").agg(
      sum(when(col("__ga"), 1L).otherwise(0L)).as("cnt_a"),
      sum(when(!col("__ga"), 1L).otherwise(0L)).as("cnt_b"))
    val tot = counts.agg(sum(col("cnt_a")).as("__ta"), sum(col("cnt_b")).as("__tb"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    counts.crossJoin(broadcast(tot))
      .withColumn("__key", abs(dec(col("cnt_a")) * dec(col("__tb")) - dec(col("cnt_b")) * dec(col("__ta"))))
      .orderBy(col("__key").desc, col("token").asc)
      .limit(k)
      .withColumn("rank", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(lit(0)).orderBy(col("__key").desc, col("token").asc)).cast("bigint"))
      .select(col("token"), col("cnt_a"), col("cnt_b"), col("rank"))
  }

  /** Top-k TF-IDF terms per document: term frequencies and document
    * frequencies as exact integer aggregates, scored tf · ln(N/df),
    * per-doc selection through the custom GroupTopK operator (bounded
    * heaps — the full scored vocabulary never sorts).
    *
    * Cross-engine note: ln is not correctly-rounded in every libm, so
    * the score is used for SELECTION only and not emitted; exact ties
    * (same (tf, df)) break on the term text, which both engines
    * resolve identically. */
  def tfidfTopTerms(df: org.apache.spark.sql.DataFrame, text: Column, id: Column, k: Int): org.apache.spark.sql.DataFrame = {
    val tok = df.select(id.as("doc_id"), explode(split(trim(lower(text)), "\\s+")).as("term"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dfq"))
    val nDocs = df.agg(count(lit(1)).as("__n"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(nDocs))
      .withColumn("__s", col("tf").cast("double") * log(col("__n").cast("double") / col("dfq")))
    org.apache.spark.sql.graft.GraftPlans
      .groupTopK(scored, Seq(col("doc_id")), Seq(col("__s").desc, col("term").asc), k)
      .select(col("doc_id"), col("term"), col("tf"), col("dfq"))
  }

  /** Top-k bigram collocations by PMI. PMI = ln(N·n12/(n1·n2)) is
    * monotone in the rational N·n12/(n1·n2), so ranking uses that
    * ratio as ONE double division (division is correctly rounded —
    * bit-identical in every engine; no transcendental anywhere).
    * `minCount` drops noise bigrams before ranking. Bigram stream =
    * word 2-shingles (native WordShingles), unigram counts from the
    * same token stream — two aggregates and a join on the component
    * words. */
  def collocationsTopK(df: org.apache.spark.sql.DataFrame, text: Column, k: Int,
      minCount: Long = 5): org.apache.spark.sql.DataFrame = {
    val toks = df.select(explode(tokenize(lower(text))).as("w"))
    val uni = toks.groupBy("w").agg(count(lit(1)).as("n1"))
    val totalTokens = toks.agg(count(lit(1)).as("__nt"))
    val bi = df.select(explode(graft.dedup.Dedup.shinglesRaw(text, 2)).as("b"))
      .groupBy("b").agg(count(lit(1)).as("n12"))
      .filter(col("n12") >= minCount)
      .withColumn("w1", split(col("b"), " ").getItem(0))
      .withColumn("w2", split(col("b"), " ").getItem(1))
    bi
      .join(uni.select(col("w").as("w1"), col("n1").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("n1").as("c2")), "w2")
      .crossJoin(broadcast(totalTokens))
      .withColumn("ratio",
        (col("n12") * col("__nt")).cast("double") / (col("c1") * col("c2")))
      .orderBy(col("ratio").desc, col("b").asc)
      .limit(k)
      .select(col("w1"), col("w2"), col("n12"), col("c1"), col("c2"), col("ratio"))
  }

  /** Inverted index: term → document frequency + posting list with
    * token positions, the search-index building block. Two nested
    * aggregations (term×doc positions, then term postings), both
    * sorted for determinism. At scale the index shards naturally by
    * the term hash (the groupBy key); postings serialize as
    * `doc:pos,pos` strings so the structure round-trips any engine. */
  def invertedIndex(df: org.apache.spark.sql.DataFrame, text: Column, id: Column): org.apache.spark.sql.DataFrame = {
    val tok = df.select(id.as("doc_id"),
      posexplode(tokenize(lower(text))).as(Seq("pos", "term")))
    val perDoc = tok.groupBy("term", "doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("__ps"))
      .withColumn("__entry",
        concat(col("doc_id").cast("string"), lit(":"),
          array_join(transform(col("__ps"), p => p.cast("string")), ",")))
    perDoc.groupBy("term")
      .agg(count(lit(1)).as("df"),
        array_join(array_sort(collect_list(
          struct(col("doc_id"), col("__entry")))).getField("__entry"), ";").as("postings"))
  }

  // ---------------------------------------------- char-ngram profiles

  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.expressions.Window

  /** (doc-ish key, char n-gram) rows: one explode of the native
    * [[org.apache.spark.sql.graft.CharShingles]] array (tight codegen
    * loop per row — no position-sequence allocation, no per-gram
    * substring expression). Texts shorter than n produce no rows. */
  private def charGrams(df: DataFrame, key: Column, keyName: String, text: Column, n: Int): DataFrame =
    df.select(key.as(keyName),
      explode(org.apache.spark.sql.graft.GraftTextFunctions.charShingles(text, n)).as("g"))

  /** Gram OCCURRENCE counts per (keys..., gram) — the corpus explode
    * reduced once, so profile training and classification can share it
    * instead of re-exploding the corpus per consumer. */
  private def charGramCounts(df: DataFrame, keys: Seq[(String, Column)], text: Column,
      n: Int): DataFrame =
    df.select(keys.map { case (kn, c) => c.as(kn) } :+
        explode(org.apache.spark.sql.graft.GraftTextFunctions.charShingles(text, n)).as("g"): _*)
      .groupBy(keys.map(k => col(k._1)) :+ col("g"): _*)
      .agg(count(lit(1)).as("c"))

  /** Train profiles AND classify the same corpus in one pass: the
    * char-gram explode+count runs ONCE, keyed (doc, lang, gram), is
    * checkpointed, and feeds both the per-language profile aggregation
    * and the per-document scoring join — at corpus scale the explode
    * is the dominant cost and halving it is the whole game. Results
    * are identical to charNgramProfiles → langIdNgram. The checkpoint
    * is corpus-sized: callers running many queries in one session
    * should release it at query boundaries via
    * [[graft.operators.Checkpoints.releaseAll]] (Verify/Bench do). */
  def langProfileAndClassify(df: DataFrame, text: Column, id: Column, lang: Column,
      n: Int = 3, topK: Int = 50): DataFrame = {
    // repartition DOC rows by id before the gram explode: the
    // (doc, lang, gram) count aggregate then runs under the doc_id
    // partitioning with no exchange of exploded gram rows — text
    // bytes cross the wire once instead of ~20× that in gram-count
    // pairs (guide §2.3: shuffle the lightweight proxy; here the raw
    // doc IS the lighter side of its own explode)
    // explicit partition count: without it AQE coalesces the tiny
    // doc-byte exchange to ~1 partition and serializes the explode —
    // the gram AGGREGATE work downstream of this exchange is the
    // expensive part and must keep full parallelism
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val base = graft.operators.Checkpoints.eager(
      charGramCounts(df.repartition(parts, id), Seq("doc_id" -> id, "__lang" -> lang), text, n))
    val profCounts = base.groupBy(col("__lang").as("lang"), col("g"))
      .agg(sum("c").as("c"))
    // GroupTopK before the rank window: the partial per-partition heap
    // bounds what the lang exchange carries to topK rows per
    // (lang, partition); the window then ranks ≤ topK rows per lang
    val w = Window.partitionBy("lang").orderBy(col("c").desc, col("g").asc)
    val profiles = org.apache.spark.sql.graft.GraftPlans
      .groupTopK(profCounts, Seq(col("lang")), Seq(col("c").desc, col("g").asc), topK)
      .withColumn("__r", row_number().over(w))
      .select(col("lang"), col("g"), (lit(topK + 1) - col("__r")).cast("long").as("weight"))
    // per-doc argmax via GroupTopK (score desc, lang asc — the same
    // deterministic tie-break the row_number window applied)
    val scores = base.join(broadcast(profiles), "g")
      .groupBy("doc_id", "lang").agg(sum(col("c") * col("weight")).as("score"))
    org.apache.spark.sql.graft.GraftPlans
      .groupTopK(scores, Seq(col("doc_id")), Seq(col("score").desc, col("lang").asc), 1)
      .select(col("doc_id"), col("lang").as("lang_pred"), col("score"))
  }

  /** Train per-language character n-gram profiles (Cavnar–Trenkle
    * style): the topK most frequent grams per language, weighted
    * topK+1-rank (rank ties broken by gram text — deterministic).
    * The profile is tiny (langs × topK rows) — broadcast it. */
  def charNgramProfiles(df: DataFrame, text: Column, lang: Column,
      n: Int = 3, topK: Int = 50): DataFrame = {
    val counts = charGrams(df, lang, "lang", text, n).groupBy("lang", "g").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("lang").orderBy(col("c").desc, col("g").asc)
    counts.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= topK)
      .select(col("lang"), col("g"), (lit(topK + 1) - col("__r")).cast("long").as("weight"))
  }

  /** Language ID against trained profiles: every gram occurrence of a
    * doc votes its profile weight per language; deterministic argmax
    * (score desc, lang asc). Docs shorter than n or sharing no gram
    * with any profile are absent (no evidence, no verdict).
    * Integer scores keep it engine-portable. */
  def langIdNgram(df: DataFrame, text: Column, id: Column,
      profiles: DataFrame, n: Int = 3): DataFrame = {
    val grams = charGrams(df, id, "doc_id", text, n)
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("lang").asc)
    grams.join(broadcast(profiles), "g")
      .groupBy("doc_id", "lang").agg(sum("weight").as("score"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("lang").as("lang_pred"), col("score"))
  }

  /** Unigram language-model quality score (the CCNet-style filter,
    * integer-exact): corpus-wide token occurrence counts, then per
    * document the token count, the summed corpus frequency of its
    * tokens, the rare-token count (corpus frequency <= rareMax), and
    * the mean token frequency (one correctly-rounded division —
    * engine-portable). ln is monotone, so thresholding mean_freq
    * makes the same keep/drop decision as thresholding the mean
    * unigram log-likelihood — without a transcendental anywhere in
    * the comparison path; low mean frequency / high rare fraction ≈
    * high perplexity under the unigram LM.
    *
    * Scale shape: one token explode reduced immediately to (doc,
    * term) tf pairs (map-side combine shrinks the corpus-sized stream
    * before its single shuffle), a vocabulary-sized aggregate over
    * tf, a join back on term, one final per-doc aggregate. */
  def lmScore(df: DataFrame, text: Column, id: Column, rareMax: Long): DataFrame = {
    val tf = df.select(id.as("doc_id"), explode(tokenize(lower(text))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val freq = tf.groupBy("t").agg(sum("tf").as("cnt"))
    scoreTf(tf, freq, rareMax)
  }

  /** Bigram-LM quality score — [[lmScore]] one model order up, same
    * integer-exact no-transcendental style: per document, the count
    * of token BIGRAMS, the summed corpus frequency of those bigrams,
    * the rare-bigram count (corpus frequency ≤ `rareMax`) and the
    * mean bigram frequency (one double division at the end). The
    * order-2 signal catches what unigrams structurally cannot:
    * shuffled or template-stitched text whose every WORD is
    * corpus-common but whose word PAIRS are unseen — the actual CCNet
    * filter is an n-gram LM for exactly this reason. Documents with
    * fewer than 2 tokens are absent (no bigram, no evidence).
    *
    * Scale shape: bigrams come from the native codegen 2-gram
    * shingles and are fingerprinted (two-lane xxhash) BEFORE the
    * per-doc tf aggregate and the frequency join — bigram text never
    * reaches an exchange, the same width discipline as
    * `removeFrequentGrams`. */
  def bigramLmScore(df: DataFrame, text: Column, id: Column, rareMax: Long): DataFrame = {
    val tf = bigramTf(df, text, id)
    scoreBigramTf(tf, tf.groupBy("h1", "h2").agg(sum("tf").as("cnt")), rareMax)
  }

  /** The bigram-LM table itself: (h1, h2, cnt) fingerprinted corpus
    * bigram frequencies — the "trained model" half of
    * [[bigramLmScore]], reusable to score OTHER corpora/batches
    * against this reference distribution (the standard hashed-n-gram
    * LM-feature construction: keys are opaque, counts are what
    * matter). */
  def bigramFrequencies(df: DataFrame, text: Column): DataFrame =
    df.select(explode(graft.dedup.Dedup.shinglesRaw(text, 2)).as("g"))
      .select(xxhash64(col("g")).as("h1"), xxhash64(lit(7L), col("g")).as("h2"))
      .groupBy("h1", "h2").agg(count(lit(1)).as("cnt"))

  /** Score `df` against a REFERENCE bigram LM ([[bigramFrequencies]]
    * of the standing corpus): same outputs as [[bigramLmScore]], but
    * bigrams absent from the reference count as frequency 0
    * (maximally rare) — the incremental-pipeline shape, mirroring
    * [[lmScoreAgainst]] one model order up. */
  def bigramLmScoreAgainst(df: DataFrame, text: Column, id: Column, freq: DataFrame,
      rareMax: Long): DataFrame =
    scoreBigramTf(bigramTf(df, text, id), freq, rareMax, leftJoin = true)

  private def bigramTf(df: DataFrame, text: Column, id: Column): DataFrame =
    df.select(id.as("doc_id"), explode(graft.dedup.Dedup.shinglesRaw(text, 2)).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("h1"), xxhash64(lit(7L), col("g")).as("h2"))
      .groupBy("doc_id", "h1", "h2").agg(count(lit(1)).as("tf"))

  /** Interpolated Kneser–Ney bigram LM score (Kneser & Ney 1995;
    * Chen & Goodman 1998), the actual family behind the KenLM models
    * CCNet-style quality filters use — [[bigramLmScore]] reports raw
    * pair frequency, which OVER-trusts frequent-but-context-bound
    * words (the "San Francisco" problem: "Francisco" is frequent yet
    * follows almost nothing but "San"); KN's continuation probability
    * P_cont(w₂) = N₁₊(•w₂)/N₁₊(••) backs off by how many DISTINCT
    * contexts a word completes, not how often it occurs.
    *
    * Per doc-bigram instance, with absolute discount D = 3/4 (Chen &
    * Goodman's benchmark setting) cleared of fractions by scaling
    * through 4:
    *
    *   P(w₂|w₁) = [max(4·c₁₂ − 3, 0)·T + 3·N₁₊(w₁•)·N₁₊(•w₂)]
    *              / [4·c₁• · T]
    *
    * — an exact integer rational (c₁₂ = bigram count, c₁• = w₁'s
    * context mass, T = distinct bigram types). Its log is taken in
    * [[graft.quality.NaiveBayes.qlog64]] fixed-point (64 units =
    * 1 bit) as qlog64(num) − qlog64(den), so the whole score replays
    * bit-for-bit on any engine; self-scoring guarantees c₁₂ ≥ 1 so
    * num ≥ T > 0. Output per doc: `n_bigrams`, the summed instance
    * log-likelihood `kn_ll64` (exact integer), and `kn_avg` (the one
    * double division at the end — the per-bigram mean, i.e. negated
    * log-perplexity in qlog64 units).
    *
    * Scale shape: the corpus is tokenized once into per-position
    * (doc, hash(w₁), hash(w₂)) instances reduced immediately to per-
    * doc tf pairs (map-side combine before the one corpus-wide
    * exchange — word text never reaches a shuffle); the bigram-type
    * model (a1, a2, c12) is checkpointed once (model-sized, NOT
    * corpus-sized) and its three derived statistics (context mass +
    * follower types per w₁, predecessor types per w₂, the 1-row type
    * total) are vocabulary-sized aggregates that join back by
    * broadcast. qlog64's chord is exact while 64·x fits a double
    * (x ≤ 2^47): num ≤ 4·c₁₂·T bounds the safe corpus at roughly
    * c₁₂·T < 3.5e13 — beyond that, pre-scale num AND den by the same
    * power of two (monotone, engine-portable) before the chord. */
  def knBigramScore(df: DataFrame, text: Column, id: Column): DataFrame = {
    val inst = df
      .select(id.as("doc_id"), tokenize(lower(text)).as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> named_struct(" +
          "'a1', xxhash64(element_at(tk, i)), 'a2', xxhash64(element_at(tk, i + 1))))")).as("p"))
      .select(col("doc_id"), col("p.a1").as("a1"), col("p.a2").as("a2"))
    val tf = inst.groupBy("doc_id", "a1", "a2").agg(count(lit(1)).as("tf"))
    val cb = graft.operators.Checkpoints.eager(
      tf.groupBy("a1", "a2").agg(sum("tf").cast("bigint").as("c12")))
    val ctx = cb.groupBy("a1")
      .agg(sum("c12").cast("bigint").as("c1"), count(lit(1)).as("n1fw"))
    val cont = cb.groupBy("a2").agg(count(lit(1)).as("ncont"))
    val tt = cb.agg(count(lit(1)).as("t"))
    tf.join(cb, Seq("a1", "a2"))
      .join(ctx, Seq("a1"))
      .join(cont, Seq("a2"))
      .crossJoin(broadcast(tt))
      .withColumn("__num",
        greatest(lit(4L) * col("c12") - lit(3L), lit(0L)) * col("t") +
          lit(3L) * col("n1fw") * col("ncont"))
      .withColumn("__den", lit(4L) * col("c1") * col("t"))
      .withColumn("__lp",
        graft.quality.NaiveBayes.qlog64(col("__num")) -
          graft.quality.NaiveBayes.qlog64(col("__den")))
      .groupBy("doc_id")
      .agg(
        sum("tf").cast("bigint").as("n_bigrams"),
        sum(col("tf") * col("__lp")).cast("bigint").as("kn_ll64"))
      .withColumn("kn_avg", col("kn_ll64").cast("double") / col("n_bigrams"))
  }

  private def scoreBigramTf(tf: DataFrame, freq: DataFrame, rareMax: Long,
      leftJoin: Boolean = false): DataFrame =
    tf.join(freq, Seq("h1", "h2"), if (leftJoin) "left" else "inner")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .groupBy("doc_id")
      .agg(
        sum("tf").cast("bigint").as("n_bigrams"),
        sum(col("tf") * col("cnt")).cast("bigint").as("sum_freq"),
        sum(when(col("cnt") <= rareMax, col("tf")).otherwise(lit(0L))).cast("bigint").as("n_rare"))
      .withColumn("mean_freq", col("sum_freq").cast("double") / col("n_bigrams"))

  /** TextRank keyword extraction (Mihalcea & Tarau 2004, weighted
    * variant): PageRank over the token co-occurrence graph — tokens
    * are nodes, an edge connects tokens appearing within a 2-token
    * window, its weight the corpus-wide co-occurrence count, and the
    * stationary importance score ranks keywords. Unlike raw
    * frequency (q_vocab), TextRank rewards tokens whose
    * co-occurrences concentrate on well-connected partners; the
    * weighted form stays discriminative even when a small vocabulary
    * makes the unweighted graph complete.
    *
    * Scale shape: co-occurrence pairs are generated IN-ROW from each
    * doc's token array (flatten/transform — no positional self-join,
    * which would shuffle every token twice), then canonicalized and
    * count-aggregated to the vocabulary²-bounded weighted edge set;
    * that tiny graph is checkpointed once, mirrored, and handed to
    * the scaled-integer [[graft.operators.GraphOps.pageRankWeighted]]
    * (3 fixed iterations — bit-identical to the oracle's chained-CTE
    * replay). The corpus is scanned exactly once; everything after
    * the pair aggregate is vocabulary-sized. Top-k runs as
    * TakeOrdered, the rank window only over the k survivors. */
  def textRank(df: DataFrame, text: Column, iters: Int = 3, topK: Int = 40): DataFrame = {
    val pairs = df
      .select(tokenize(lower(text)).as("w"))
      .select(explode(expr(
        "flatten(transform(sequence(1, greatest(size(w) - 1, 1)), i -> filter(array(" +
          "named_struct('a', element_at(w, i), 'b', try_element_at(w, i + 1)), " +
          "named_struct('a', element_at(w, i), 'b', try_element_at(w, i + 2))), " +
          "p -> p.b IS NOT NULL AND p.a <> p.b)))")).as("p"))
      .select(least(col("p.a"), col("p.b")).as("x"),
        greatest(col("p.a"), col("p.b")).as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("w"))
    val und = graft.operators.Checkpoints.eager(pairs)
    val edges = und.select(col("x").as("src"), col("y").as("dst"), col("w"))
      .union(und.select(col("y").as("src"), col("x").as("dst"), col("w")))
    val ranked = graft.operators.GraphOps.pageRankWeighted(edges, iters)
      .orderBy(col("pr").desc, col("id").asc).limit(topK)
    ranked.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("pr").desc, col("id").asc)))
      .select(col("id").as("token"), col("pr"), col("rank"))
  }

  /** Vocabulary-coverage curve: what fraction of all token
    * OCCURRENCES do the top-k vocabulary entries cover, for each
    * budget k — the report that sizes a tokenizer vocabulary (or a
    * stopword list) before training one: the k where the curve
    * saturates is the budget worth paying for. Frequencies aggregate
    * once; ranking rides [[graft.operators.Ordering.globalRank]]'s
    * RANGE shuffle (vocabulary-sized, never single-partition); each
    * budget's covered mass is one broadcast-join + aggregate over the
    * ranked vocab. Integer per-mille output replays exactly.
    * Columns: (k, covered, total, coverage_pm). */
  def vocabCoverage(df: DataFrame, text: Column, ks: Seq[Long]): DataFrame = {
    val freq = tokenFrequencies(df, text)
    val ranked = graft.operators.Checkpoints.eager(
      graft.operators.Ordering.globalRank(freq, Seq(col("cnt").desc, col("t").asc)))
    val total = ranked.agg(sum("cnt").as("total"))
    val kdf = df.sparkSession.createDataFrame(
      ks.map(Tuple1(_))).toDF("k")
    // globalRank is 0-based: the first k entries are rank < k
    ranked.join(broadcast(kdf), col("rank") < col("k"))
      .groupBy("k").agg(sum("cnt").as("covered"))
      .crossJoin(broadcast(total))
      .select(col("k"), col("covered"), col("total"),
        expr("(covered * 1000) div total").as("coverage_pm"))
  }

  /** The unigram-LM table itself: (t, cnt) corpus token frequencies —
    * the "trained model" half of [[lmScore]], reusable to score OTHER
    * corpora/batches against this reference distribution. */
  def tokenFrequencies(df: DataFrame, text: Column): DataFrame =
    df.select(explode(tokenize(lower(text))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("cnt"))

  /** Score `df` against a REFERENCE unigram LM (`freq` = (t, cnt)
    * from [[tokenFrequencies]], typically trained on the standing
    * corpus by the batch pipeline): same outputs as [[lmScore]], but
    * tokens absent from the reference count as frequency 0 (maximally
    * rare) — the incremental-pipeline shape, where each new crawl
    * drop is scored against the distribution of the corpus it is
    * about to join rather than against itself. */
  def lmScoreAgainst(df: DataFrame, text: Column, id: Column, freq: DataFrame,
      rareMax: Long): DataFrame = {
    val tf = df.select(id.as("doc_id"), explode(tokenize(lower(text))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    scoreTf(tf, freq, rareMax, leftJoin = true)
  }

  private def scoreTf(tf: DataFrame, freq: DataFrame, rareMax: Long,
      leftJoin: Boolean = false): DataFrame =
    tf.join(freq, Seq("t"), if (leftJoin) "left" else "inner")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .groupBy("doc_id")
      .agg(
        sum("tf").cast("bigint").as("n_tokens"),
        sum(col("tf") * col("cnt")).cast("bigint").as("sum_freq"),
        sum(when(col("cnt") <= rareMax, col("tf")).otherwise(lit(0L))).cast("bigint").as("n_rare"))
      .withColumn("mean_freq", col("sum_freq").cast("double") / col("n_tokens"))

  /** Corpus vocabulary head (Zipf profile): the top-k tokens by
    * frequency with their rank and cumulative count — the "what share
    * of the corpus do the k most common words cover" curve that guides
    * stopword lists and tokenizer vocab sizing.
    *
    * Scale shape: token explode → map-side-combined hash aggregate
    * (vocab-sized output, corpus-sized input), then top-k via
    * TakeOrderedAndProject (per-partition heaps — the full vocabulary
    * never sorts globally); only the k survivors meet the
    * single-partition ranking window. Counts stay integral. */
  def vocabZipf(df: DataFrame, text: Column, k: Int): DataFrame = {
    val top = df.select(explode(tokenize(lower(text))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc).limit(k)
    val w = Window.orderBy(col("cnt").desc, col("token").asc)
    top.withColumn("rank", row_number().over(w))
      .withColumn("cum_cnt",
        sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Vocabulary-richness report per group (the Heaps'-law numbers a
    * corpus datasheet quotes): token mass, type count, hapax count
    * (types seen once — the growth frontier; a shrinking hapax share
    * across drops means the crawl is saturating), and the type/token
    * ratio per-mille as an exact integer. One (group, token)
    * aggregate — partial map-side counts — then a per-group rollup
    * over the type rows; the corpus shuffles once, keyed on the
    * uniform token. */
  def vocabRichness(df: DataFrame, text: Column, group: Column): DataFrame =
    df.select(group.as("grp"), explode(tokenize(lower(text))).as("__t"))
      .groupBy("grp", "__t").agg(count(lit(1)).as("__c"))
      .groupBy("grp").agg(
        sum("__c").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("__c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("grp"), col("n_tokens"), col("n_types"), col("n_hapax"),
        expr("(1000 * n_types) div n_tokens").as("ttr_pm"),
        expr("(1000 * n_hapax) div greatest(n_types, 1)").as("hapax_share_pm"))

  /** Distinctive terms per group by Dunning's log-likelihood ratio
    * (Dunning 1993, "Accurate Methods for the Statistics of Surprise
    * and Coincidence") — the corpus-linguistics keyness statistic
    * that, unlike raw TF-IDF, is calibrated for rare counts: each
    * (group, term) forms the 2×2 contingency [a = term in group,
    * b = term elsewhere, c = other terms in group, d = the rest] and
    * G² = 2·Σ O·ln(O/E) with E the independence expectation
    * row·col/N. Computed in qlog64 fixed-point (64 units = 1 bit —
    * a positive multiple of the natural-log G², so ranking and the
    * zero point are preserved): each observed-cell term is the exact
    * integer O·(qlog64(O·N) − qlog64(row·col)), O = 0 contributing 0.
    * Emits the top-k OVERUSED terms per group (a·N > rt·ct — the
    * group's keywords, not its gaps) as (grp, term, a, g2_q64,
    * krank), ties broken by term.
    *
    * Scale shape: ONE corpus-sized exchange builds the (group, term)
    * count grid (map-side partials), checkpointed once; every later
    * step is grid-keyed — the term-total join deliberately NOT
    * broadcast (vocab-sized at corpus scale), the group totals and
    * grand total broadcast (groups-sized / 1 row). Integer bound:
    * O·N and row·col ≤ ~2⁴⁷ for the exact qlog64 chord — beyond
    * ~10⁷ tokens per side, pre-scale all four cells by a shared
    * power of two (G² is scale-equivariant), documented not silent. */
  def keyness(df: DataFrame, text: Column, group: Column,
      topK: Int = 15): DataFrame = {
    val q = graft.quality.NaiveBayes.qlog64 _
    val grid = graft.operators.Checkpoints.eager(
      df.select(group.as("grp"), explode(tokenize(lower(text))).as("term"))
        .groupBy("grp", "term").agg(count(lit(1)).as("a")))
    val rowTot = grid.groupBy("grp").agg(sum("a").as("rt"))
    val colTot = grid.groupBy("term").agg(sum("a").as("ct"))
    val nTot = grid.agg(sum("a").as("n"))
    def cell(x: Column, row: Column, colT: Column): Column =
      when(x === 0L, 0L).otherwise(x * (q(x * col("n")) - q(row * colT)))
    val scored = grid
      .join(colTot, "term")
      .join(broadcast(rowTot), "grp")
      .crossJoin(broadcast(nTot))
      .withColumn("b", col("ct") - col("a"))
      .withColumn("c", col("rt") - col("a"))
      .withColumn("d", col("n") - col("rt") - col("ct") + col("a"))
      .withColumn("g2_q64",
        (cell(col("a"), col("rt"), col("ct"))
          + cell(col("b"), col("n") - col("rt"), col("ct"))
          + cell(col("c"), col("rt"), col("n") - col("ct"))
          + cell(col("d"), col("n") - col("rt"), col("n") - col("ct"))) * 2L)
    val w = Window.partitionBy("grp").orderBy(col("g2_q64").desc, col("term").asc)
    scored.filter(col("a") * col("n") > col("rt") * col("ct"))
      .withColumn("krank", row_number().over(w))
      .filter(col("krank") <= topK)
      .select("grp", "term", "a", "g2_q64", "krank")
  }

  /** Per-group distributional novelty: KL(group ‖ corpus) over the
    * token unigram distributions — "which source is most unusual as a
    * whole?", the one-number-per-source complement of drift (48b,
    * A-vs-B) and keyness (48c, per-term). Exact qlog64 integers:
    * kl_q64_sum = Σ_t c_st·(qlog64(c_st·N) − qlog64(N_s·c_t)) — which
    * is 64·N_s·KL_bits, so kl_avg_q64 = sum div N_s is the per-token
    * KL in qlog64 units (64 = 1 bit). No smoothing needed: the sum
    * runs over the group's OWN tokens, and c_t ≥ c_st > 0 there.
    * KL ≥ 0 with equality iff the group matches the corpus mix.
    *
    * Scale shape: the keyness grid — one corpus exchange into the
    * checkpointed (group, token) counts, token totals joined
    * grid-keyed (vocab-sized, NOT broadcast), group totals + grand
    * total broadcast. qlog64 exact while c·N ≤ 2⁴⁷, pre-scale
    * beyond, documented. */
  def sourceKl(df: DataFrame, text: Column, group: Column): DataFrame = {
    val q = graft.quality.NaiveBayes.qlog64 _
    val grid = graft.operators.Checkpoints.eager(
      df.select(group.as("grp"), explode(tokenize(lower(text))).as("term"))
        .groupBy("grp", "term").agg(count(lit(1)).as("c")))
    val rowTot = grid.groupBy("grp").agg(sum("c").as("ns"))
    val colTot = grid.groupBy("term").agg(sum("c").as("ct"))
    val nTot = grid.agg(sum("c").as("n"))
    grid
      .join(colTot, "term")
      .join(broadcast(rowTot), "grp")
      .crossJoin(broadcast(nTot))
      .withColumn("__kl", col("c") * (q(col("c") * col("n")) - q(col("ns") * col("ct"))))
      .groupBy("grp").agg(
        max("ns").as("n_tokens"), sum("__kl").as("kl_q64_sum"))
      .withColumn("kl_avg_q64", expr("kl_q64_sum div n_tokens"))
      .select("grp", "n_tokens", "kl_q64_sum", "kl_avg_q64")
  }

  /** Class-based TF-IDF (Grootendorst 2022, the BERTopic topic-term
    * score): treat each GROUP's concatenated text as one document and
    * score term t in class c as tf_{t,c} · ln(1 + A/f_t) with A the
    * average token mass per class and f_t the corpus frequency — the
    * standard automatic topic/cluster labeling statistic. Cleared of
    * fractions: 1 + A/f_t = (f_t·C + N)/(f_t·C) (C classes, N total
    * tokens), so the score is the exact integer
    * tf · (qlog64(f_t·C + N) − qlog64(f_t·C)) — engine-portable, no
    * float log. Emits the top-k terms per class (ties by term).
    * Keyness (G²) asks "surprisingly overused vs the rest?";
    * c-TF-IDF asks "characteristically frequent here?" — the two
    * labeling statistics curators actually compare.
    *
    * Scale shape: identical to [[keyness]] — one corpus-sized
    * exchange into the checkpointed (group, term) grid, term totals
    * joined grid-keyed (NOT broadcast: vocab-sized), the class count
    * and token total broadcast 1-row. qlog64 exact while f_t·C + N
    * ≤ 2⁴⁷; beyond, pre-scale f_t, N by a shared power of two. */
  def ctfidfTopTerms(df: DataFrame, text: Column, group: Column,
      topK: Int = 15): DataFrame = {
    val q = graft.quality.NaiveBayes.qlog64 _
    val grid = graft.operators.Checkpoints.eager(
      df.select(group.as("grp"), explode(tokenize(lower(text))).as("term"))
        .groupBy("grp", "term").agg(count(lit(1)).as("tf")))
    val colTot = grid.groupBy("term").agg(sum("tf").as("ft"))
    val totals = grid.agg(
      countDistinct("grp").as("nc"), sum("tf").as("n"))
    val scored = grid
      .join(colTot, "term")
      .crossJoin(broadcast(totals))
      .withColumn("score_q64",
        col("tf") * (q(col("ft") * col("nc") + col("n")) - q(col("ft") * col("nc"))))
    val w = Window.partitionBy("grp").orderBy(col("score_q64").desc, col("term").asc)
    scored
      .withColumn("krank", row_number().over(w))
      .filter(col("krank") <= topK)
      .select("grp", "term", "tf", "score_q64", "krank")
  }

  /** Distinct-n diversity (Li et al. 2016's distinct-1/2; the
    * n-gram-diversity complement of Self-BLEU, Zhu et al. 2018): per
    * group and n, how many of the slice's n-grams are DISTINCT —
    * collapsing templated/boilerplate sources score low where
    * per-document repetition screens (45/45c) can't see across
    * documents. One row per (group, n): total n-gram mass, distinct
    * n-gram count, and the exact per-mille ratio.
    *
    * Scale shape: per n, one (group, gram) map-side-combined
    * aggregate (the native codegen WordShingles stream) then a
    * group-sized rollup — the corpus shuffles once per n, keyed on
    * the uniform gram; the ns are independent branches unioned at
    * group-row size. */
  def distinctN(df: DataFrame, text: Column, group: Column,
      ns: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1))
    ns.map { n =>
      df.select(group.as("grp"),
          explode(graft.dedup.Dedup.shinglesRaw(text, n)).as("__g"))
        .groupBy("grp", "__g").agg(count(lit(1)).as("__c"))
        .groupBy("grp").agg(
          sum("__c").as("n_grams"), count(lit(1)).as("n_distinct"))
        .select(col("grp"), lit(n).cast("int").as("n"),
          col("n_grams"), col("n_distinct"),
          expr("(1000 * n_distinct) div greatest(n_grams, 1)").as("distinct_pm"))
    }.reduce(_ unionAll _)
  }

  /** Flesch–Kincaid grade level (Kincaid et al. 1975) as an EXACT
    * integer rational — the classic readability screen (an original
    * GPT-3-era quality-filter signal): grade = 0.39·(W/S) +
    * 11.8·(Syl/W) − 15.59, cleared of fractions to
    * fk_milli = (390·W² + 11800·Syl·S − 15590·S·W) div (S·W), ONE
    * truncating division so the score replays bit-for-bit (both
    * engines truncate toward zero). Sentences = runs of [.!?]
    * (floored at 1 — unpunctuated text is one sentence); syllables =
    * vowel-group count per word floored at 1, the standard heuristic.
    * Everything is in-row native array/regexp expressions — zero
    * shuffles, pure scan work, trivially 100 TB-safe. Empty/
    * whitespace-only docs are excluded — no grade exists. */
  def readability(df: DataFrame, text: Column, id: Column): DataFrame =
    df.filter(trim(text) =!= "").select(
        id.as("doc_id"),
        size(tokenize(text)).cast("long").as("w"),
        greatest(size(regexp_extract_all(text, lit("[.!?]+"), lit(0))), lit(1))
          .cast("long").as("s"),
        aggregate(
          transform(tokenize(lower(text)),
            t => greatest(size(regexp_extract_all(t, lit("[aeiouy]+"), lit(0))), lit(1))),
          lit(0L), (acc, x) => acc + x).as("syl"))
      .filter(col("w") >= 1)
      .withColumn("fk_milli",
        expr("(390 * w * w + 11800 * syl * s - 15590 * s * w) div (s * w)"))
}
