package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data preparation operators (SURVEY.md §2.5 extension):
  * the steps between "raw corpus" and "training shards" that aren't
  * analysis but transformation — redaction, splitting, chunking,
  * repetition screens.
  *
  * All declarative Column ops; regex patterns restricted to the
  * common subset of Java regex and RE2 (character classes, bounded
  * repetition, no lookaround) so the DuckDB oracles run the exact
  * same patterns.
  */
object TextPrep {

  /** Redaction patterns (applied in order). Kept deliberately simple
    * and engine-portable; a production deployment would add locale
    * variants, but the pipeline shape (chained regexp_replace inside
    * one codegen projection) is the real thing. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\+?[0-9][0-9()\\-\\. ]{7,}[0-9]"

  /** Scrub PII-ish spans with typed placeholder tokens. */
  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, EmailRe, "<EMAIL>")
    val i = regexp_replace(e, Ipv4Re, "<IP>")
    regexp_replace(i, PhoneRe, "<PHONE>")
  }

  /** Luhn mod-10 validity (Luhn 1960, ISO/IEC 7812) of a digit-string
    * column, IN-ROW: from the right, every second digit doubles (2d,
    * minus 9 when d ≥ 5 — the digit-sum identity), and the total must
    * divide by 10. This is the checksum every payment-card number
    * carries, so a PAN redaction pass gated on it keeps the 13–19
    * digit regex from mass-redacting order ids and timestamps — a
    * plain digit-run regex fires on ~10× more spans than actually
    * checksum. Pure array/substring expressions, zero shuffles. */
  def luhnValid(cand: Column): Column = {
    val L = length(cand)
    val total = aggregate(
      transform(sequence(lit(1), L), p => {
        val d = cand.substr(p, lit(1)).cast("int")
        when((L - p) % 2 === 1,
          d * 2 - when(d >= 5, 9).otherwise(0)).otherwise(d)
      }),
      lit(0), (acc, x) => acc + x)
    total % 10 === 0
  }

  /** PAN screen over a text column: every 13–19 digit run, with its
    * Luhn verdict — the redaction pre-pass that separates real card
    * numbers (redact) from long ids (keep). One row per candidate;
    * in-row extraction + checksum, the only shuffle is whatever the
    * consumer does next. */
  def luhnScreen(df: DataFrame, text: Column, id: Column): DataFrame =
    df.select(id.as("doc_id"),
        explode(regexp_extract_all(text, lit("[0-9]{13,19}"), lit(0))).as("cand"))
      .withColumn("luhn_valid", luhnValid(col("cand")).cast("int"))

  /** Weighted Bernoulli (Poisson) sampling predicate: keep a row with
    * probability min(1, weight/threshold) — longer/heavier documents
    * proportionally more often — decided by a pure function of the
    * row key, so the sample is rerun- and retry-stable and the filter
    * runs at scan time with ZERO shuffles. The uniform draw is the
    * first 7 md5 hex chars (28 bits) and the comparison is an integer
    * cross-multiplication, exact in any engine; threshold must stay
    * under 2^35 so the products stay inside a BIGINT. The weight is
    * clamped to the threshold before multiplying — the keep
    * probability caps at 1 there anyway, and an unclamped 2^35+ weight
    * would overflow BIGINT silently (non-ANSI) and flip the predicate
    * for exactly the heaviest rows. */
  def weightedSample(key: Column, weight: Column, threshold: Long): Column = {
    require(threshold >= 1 && threshold < (1L << 35))
    val h = conv(substring(md5(key.cast("string")), 1, 7), 16, 10).cast("long")
    h * threshold < least(weight.cast("long"), lit(threshold)) * (1L << 28)
  }

  /** Deterministic train/val/test assignment from a stable content
    * key: bucket = first 8 hex chars of md5(key) mod 100, split by
    * cumulative percentage thresholds. Reproducible in any engine,
    * stable across runs/reshuffles — the property a dataset split
    * must have. */
  def splitAssign(key: Column, trainPct: Int = 90, valPct: Int = 5): Column = {
    require(trainPct + valPct < 100)
    val bucket = conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % 100
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Chunk documents into overlapping token windows (context-window
    * prep): chunk i covers tokens [i·(size−overlap), …+size). Emits
    * (doc key, chunk_id, chunk text, chunk token count); the final
    * partial chunk is kept. Declarative: one explode of chunk
    * indices + array slice — row-parallel, no shuffle. */
  def chunkTokens(df: DataFrame, text: Column, id: Column,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize >= 1 && overlap >= 0 && overlap < chunkSize)
    val step = chunkSize - overlap
    df.select(id.as("doc_id"), split(trim(text), "\\s+").as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") >= 1)
      // number of chunks: 1 + ceil(max(0, n - size) / step)
      .withColumn("__nc", lit(1) + ceil(greatest(col("__n") - chunkSize, lit(0)).cast("double") / step).cast("int"))
      .select(col("doc_id"), col("__toks"), explode(sequence(lit(0), col("__nc") - 1)).as("chunk_id"))
      .select(
        col("doc_id"),
        col("chunk_id").cast("long").as("chunk_id"),
        array_join(slice(col("__toks"), col("chunk_id") * step + 1, lit(chunkSize)), " ").as("chunk"),
        least(size(col("__toks")) - col("chunk_id") * step, lit(chunkSize)).cast("long").as("n_tokens"))
  }

  /** Greedy sequence packing: assign documents to training batches by
    * filling a token budget in a deterministic order within each
    * shard. batch_id = floor(exclusive-prefix-sum(tokens) / budget) —
    * the budget window a document STARTS in (documents may straddle a
    * boundary; samplers that need hard caps truncate downstream).
    *
    * Sharding is the scale lever: a single global packing order would
    * funnel everything through one ordered partition, so callers pass
    * a shard key (hash bucket, source, date) and packing happens
    * independently per shard — exactly how multi-host training data
    * gets laid out anyway (one packed stream per data-loader worker).
    * All-integer arithmetic; the assignment is a pure function of
    * (shard, order, tokens). */
  def packByTokenBudget(df: DataFrame, shard: Column, order: Seq[Column],
      tokens: Column, budget: Long): DataFrame = {
    require(budget >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shard).orderBy(order.map(_.asc): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // withColumn REPLACES an existing n_tokens (e.g. chunkTokens
    // output) instead of adding an ambiguous duplicate
    df.withColumn("n_tokens", tokens.cast("long"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("batch_id", expr(s"(__cum - n_tokens) div $budget"))
      .drop("__cum")
  }

  /** Materialize the packed training sequences themselves: one row
    * per (shard, batch) with the member documents concatenated in
    * `order` — the construction step after [[packByTokenBudget]]'s
    * assignment, producing what a data loader actually reads.
    *
    * Scale shape: the per-batch collect is BOUNDED BY THE TOKEN
    * BUDGET by construction (a batch holds ~budget tokens plus one
    * straddling doc), so the group aggregate never materializes an
    * unbounded list; batches form within shards, so the only
    * exchange is the same per-shard one the assignment already
    * needed. Deterministic: members sort by `order` inside the
    * struct sort. */
  def packSequences(df: DataFrame, shard: Column, order: Seq[Column], text: Column,
      tokens: Column, budget: Long, sep: String = "\n"): DataFrame = {
    val packed = packByTokenBudget(df, shard, order, tokens, budget)
    val member = struct(order.zipWithIndex.map { case (c, i) => c.as(s"__o$i") } :+
      text.as("__t"): _*)
    packed.groupBy(shard.as("shard"), col("batch_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").cast("bigint").as("n_tokens"),
        array_join(transform(sort_array(collect_list(member)), s => s.getField("__t")), sep)
          .as("packed_text"))
  }

  /** Word-repetition screen (Gopher-style quality rule): frequency of
    * the single most repeated lowercase token over the token count.
    * High ratios flag boilerplate/spam. Computed distributed
    * (explode + two-level aggregate), not per-row array scans. */
  def repetitionRatio(df: DataFrame, text: Column, id: Column): DataFrame =
    df.select(id.as("doc_id"), explode(TextAnalysis.tokenize(lower(text))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max(col("c")).as("max_rep"), sum(col("c")).as("n_tokens"))
      .select(col("doc_id"), col("max_rep"), col("n_tokens"),
        (col("max_rep").cast("double") / col("n_tokens")).as("rep_ratio"))

  /** Deterministic token-budget sampling: per group (source,
    * language, …), keep documents in md5-hash order until the group's
    * token budget is exhausted — "give me ~N tokens of src_X" as a
    * reproducible operator. Hash order makes the sample (a) uniform
    * (hash is content-random), (b) stable under reruns and row order,
    * and (c) PREFIX-monotone: raising the budget only ADDS documents,
    * never swaps them — the property that lets a 1B-token pilot
    * corpus grow into the 100B run without re-shuffling what models
    * already trained on. The last (straddling) doc is kept, same
    * convention as [[packByTokenBudget]]. One shuffle on the group
    * key; integral cumulative sums, engine-portable. */
  def sampleByTokenBudget(df: DataFrame, group: Column, id: Column,
      tokens: Column, budget: Long): DataFrame = {
    require(budget >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(md5(id.cast("string")).asc, id.asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__tok", tokens.cast("long"))
      .withColumn("__cum", sum(col("__tok")).over(w))
      .filter(col("__cum") - col("__tok") < budget)
      .drop("__cum")
      .withColumnRenamed("__tok", "n_tokens")
  }

  /** Temperature-scaled source-mixing weights — the multilingual /
    * multi-source balancing rule (mT5 arXiv:1910.10683 §3.2, XLM-R
    * arXiv:1911.02116 §3.1): a source holding token share p of the
    * corpus is sampled with weight ∝ p^α, α < 1 flattening the
    * distribution so head sources stop drowning the tail. Emits per
    * source: exact token count, share, the α = 0.5 weight, and
    * `boost` = weight / share (the per-document over/under-sampling
    * factor a sampler applies downstream).
    *
    * α is fixed at 0.5 because p^0.5 = sqrt(p) is CORRECTLY ROUNDED
    * in IEEE 754 (pow is not in every libm) — every emitted double is
    * bit-identical across engines: share is one division, weight one
    * sqrt, boost one more division. No cross-source float sum: each
    * row normalizes independently against the integer grand total
    * (callers renormalize weights when they need probabilities — a
    * deterministic reduce over #sources values, not corpus-sized).
    *
    * Scale shape: one map-side-combined aggregate over (source) plus
    * a broadcast of the single-row total. */
  /** CCNet's head/middle/tail selection shape: per LANGUAGE, bucket
    * documents into terciles of the unigram-LM quality proxy
    * ([[TextAnalysis.lmScore]]'s mean corpus token frequency — high =
    * corpus-typical = "head", the slice CCNet keeps or upweights).
    * Returns (doc_id, lang, mean_freq, bucket) with bucket 1 = head,
    * 2 = middle, 3 = tail.
    *
    * Scale shape: NO per-language global sort — the per-language
    * tercile CUTOFFS are one tiny aggregate (#langs rows, exact
    * interpolated percentile, broadcast back) and assignment is a
    * scan-time comparison, so a corpus that is 95% one language costs
    * the same as a balanced one. Ties at a cutoff bucket upward
    * (`>=`), an order-free rule both engines apply identically. */
  def perplexityBuckets(df: DataFrame, text: Column, id: Column, lang: Column,
      rareMax: Long): DataFrame = {
    val scores = graft.text.TextAnalysis.lmScore(df, text, id, rareMax)
      .select(col("doc_id"), col("mean_freq"))
    val scored = df.select(id.as("doc_id"), lang.as("lang")).join(scores, "doc_id")
    val cuts = scored.groupBy("lang")
      .agg(expr("percentile(mean_freq, array(2.0D/3.0D, 1.0D/3.0D))").as("__c"))
    scored.join(broadcast(cuts), "lang")
      .withColumn("bucket",
        when(col("mean_freq") >= element_at(col("__c"), 1), 1)
          .when(col("mean_freq") >= element_at(col("__c"), 2), 2)
          .otherwise(3))
      .select(col("doc_id"), col("lang"), col("mean_freq"), col("bucket"))
  }

  def temperatureWeights(df: DataFrame, source: Column, tokens: Column): DataFrame = {
    val perSource = df.groupBy(source.as("source"))
      .agg(sum(tokens.cast("long")).cast("bigint").as("n_tokens"))
    val total = perSource.agg(sum("n_tokens").cast("bigint").as("__total"))
    perSource.crossJoin(broadcast(total))
      .withColumn("share", col("n_tokens").cast("double") / col("__total"))
      .withColumn("weight", sqrt(col("share")))
      .withColumn("boost", col("weight") / col("share"))
      .drop("__total")
  }

  /** Corpus-frequency boilerplate removal (the RefinedWeb/CCNet-style
    * "frequent n-gram" scrub): any word n-gram appearing in at least
    * `minDocFreq` distinct documents is boilerplate (headers, nav
    * text, license banners), and every token position it covers is
    * deleted from every document. Emits (doc_id, clean_text, n_kept);
    * a document whose every token is boilerplate disappears.
    *
    * Scale shape: grams come from the native codegen WordShingles
    * (gram index = start position, so coverage is a pure sequence
    * explode); the boilerplate gram set is SMALL by definition
    * (corpus-frequent) → broadcast back against the positional gram
    * stream; the rebuild groups each document's surviving (pos,
    * token) pairs once. No document-content shuffle except that
    * per-document rebuild. The positional gram stream feeds two
    * consumers (frequency aggregate, coverage join) and is
    * DELIBERATELY recomputed rather than persisted: it is a narrow
    * scan + codegen shingle pass, and per the §5 persistence
    * discipline caching inside a library operator pins executor
    * memory the caller can't see — callers that loop this operator
    * should persist the input themselves. */
  def removeFrequentGrams(df: DataFrame, text: Column, id: Column,
      n: Int, minDocFreq: Long): DataFrame = {
    require(n >= 1 && minDocFreq >= 2)
    // fingerprint-width discipline (as in TableDiff / SubstringDedup):
    // gram TEXT never reaches an exchange — the doc-frequency
    // aggregate and the coverage join key on a 128-bit two-lane
    // xxhash fingerprint (16 B vs ~40 B word 3-grams, so the one
    // corpus-sized shuffle here carries ~40% of the bytes). A gram
    // falsely marked boilerplate needs BOTH lanes to collide:
    // ~(#grams)²·2⁻¹²⁹ — negligible even at 10¹² corpus grams.
    val g3 = df.select(id.as("doc_id"),
      posexplode(graft.dedup.Dedup.shinglesRaw(text, n)).as(Seq("p", "g")))
      .select(col("doc_id"), col("p"),
        xxhash64(col("g")).as("h1"), xxhash64(lit(7L), col("g")).as("h2"))
    val freq = g3.groupBy("h1", "h2")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDocFreq)
      .select("h1", "h2")
    // both sides of the position anti-join hash-cluster by doc_id up
    // front: hash(doc_id) satisfies the covered-distinct's clustering
    // (doc_id ⊆ {doc_id, tp}), the anti-join's, and the final rebuild
    // aggregate's — so after these two exchanges the join AND the
    // per-doc rebuild run exchange-free (guide §2.4; previously the
    // distinct, both join sides and the rebuild each exchanged
    // position rows, the rebuild carrying the token text)
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val covered = g3.join(broadcast(freq), Seq("h1", "h2"))
      .select(col("doc_id"), explode(sequence(col("p"), col("p") + (n - 1))).as("tp"))
      .repartition(parts, col("doc_id"))
      .distinct()
    val tokPos = df.select(id.as("doc_id"),
      posexplode(graft.dedup.Dedup.tokens(text)).as(Seq("tp", "tok")))
      .repartition(parts, col("doc_id"))
    tokPos.join(covered, Seq("doc_id", "tp"), "left_anti")
      .groupBy("doc_id")
      .agg(
        array_join(transform(sort_array(collect_list(struct(col("tp"), col("tok")))),
          s => s.getField("tok")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
  }
}
