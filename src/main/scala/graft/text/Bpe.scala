package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trained byte-pair-encoding (BPE) subword tokenizer (SURVEY.md
  * §2.5/32c-32e) — the operator that converts every token-budget
  * stage (packing, sampling, fertility) from a whitespace proxy to
  * real learned subword counts.
  *
  * Training is the classic Sennrich merge loop re-expressed for a
  * cluster (reference scope: shmr pipelines tokenize with external
  * tools; this makes tokenizer TRAINING itself a first-class
  * distributed operator):
  *
  *   1. ONE corpus scan builds the word-type table (word, count) —
  *      all further work runs on types, not occurrences. The table is
  *      capped at the top `maxTypes` types by (count desc, word asc)
  *      so driver/exchange state stays bounded at any corpus size
  *      (the standard practice: tail types carry negligible pair
  *      mass). The capped table is local-checkpointed once; every
  *      merge round scans the in-memory copy.
  *   2. Each round symbolizes every word with the merges learned so
  *      far (a constant-size expression: one fold over a literal
  *      merge list), counts adjacent symbol pairs weighted by word
  *      count, and takes the argmax pair — ONE aggregate job and a
  *      single-row collect per round, the Lloyd/PageRank iterative
  *      pattern (the merge must become an expression literal for the
  *      next round, so the one-row driver hop is inherent, and tiny).
  *   3. Encoding joins text words against the BROADCAST symbolized
  *      vocabulary — per-occurrence fold work is never repeated at
  *      scale; out-of-vocabulary words fall back to one token per
  *      character (their untrained state).
  *
  * Determinism contract (what makes the DuckDB oracle replay
  * bit-identical): words are lowercase `[a-z0-9]+` runs, so symbols
  * are always safe ASCII; pair argmax ties break (count desc, left
  * asc, right asc) in binary order; and candidate pairs REQUIRE
  * left ≠ right. The last rule is load-bearing twice over: with
  * left ≠ right, occurrences of a pair can never overlap, so the
  * sequential left-to-right fold Spark evaluates and the simultaneous
  * window-marking replay the oracle evaluates provably produce the
  * same symbol sequence (a run like "aaa" under a hypothetical (a,a)
  * merge is exactly the case where they would diverge).
  */
object Bpe {

  /** Word regex shared with every oracle: lowercase alphanumeric runs. */
  val WordSplitRe = "[^a-z0-9]+"

  /** (word, cnt) types from one corpus scan, capped to the heaviest
    * `maxTypes` types (count desc, word asc — deterministic, and the
    * per-partition top-k TakeOrdered keeps the exchange bounded). */
  def wordTypes(df: DataFrame, text: Column, maxTypes: Int): DataFrame = {
    require(maxTypes >= 1)
    df.select(explode(split(lower(text), WordSplitRe)).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).cast("long").as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(maxTypes)
  }

  /** One word-occurrence row per document: (passthrough cols, word).
    * Same split + empty-filter as [[wordTypes]] so the vocabulary and
    * the encoded stream can never disagree on segmentation. */
  def docWords(df: DataFrame, text: Column, passthrough: Seq[Column]): DataFrame =
    df.select(passthrough :+ explode(split(lower(text), WordSplitRe)).as("word"): _*)
      .filter(col("word") =!= "")

  private def charsSql(wordExpr: String): String =
    s"transform(sequence(1, length($wordExpr)), __ci -> substring($wordExpr, __ci, 1))"

  /** One merge applied as a left-to-right fold: append each symbol,
    * or — when the running tail is `l` and the symbol is `r` — replace
    * the tail with the merged symbol. try_element_at keeps the empty
    * accumulator NULL-safe under ANSI mode. Symbols are embedded as
    * literals, guarded to the `[a-z0-9]` alphabet the word regex
    * guarantees (no escaping surface). */
  private def applyOneSql(child: String, l: String, r: String, lvl: Int): String = {
    require(l.matches("[a-z0-9]+") && r.matches("[a-z0-9]+"), s"unsafe symbol: '$l' '$r'")
    s"aggregate($child, cast(array() as array<string>), (a$lvl, s$lvl) -> " +
      s"CASE WHEN try_element_at(a$lvl, -1) = '$l' AND s$lvl = '$r' " +
      s"THEN concat(slice(a$lvl, 1, size(a$lvl) - 1), array('$l$r')) " +
      s"ELSE concat(a$lvl, array(s$lvl)) END)"
  }

  /** Symbol sequence of `wordExpr` under an ordered merge list — the
    * characters folded through each merge in rank order. Constant
    * plan size: merges are literals, not joins. */
  def symbolsExpr(wordExpr: String, merges: Seq[(String, String)]): Column =
    expr(merges.zipWithIndex.foldLeft(charsSql(wordExpr)) {
      case (acc, ((l, r), i)) => applyOneSql(acc, l, r, i)
    })

  /** Learn up to `numMerges` merges from a (word, cnt) type table.
    * Each round is one aggregate over the (checkpointed, capped) type
    * table plus a single-row argmax collect; rounds where no
    * two-distinct-symbol pair remains end training early (the oracle
    * replays such rounds as no-ops). */
  def trainMerges(types: DataFrame, numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0)
    // callers should pass an already-checkpointed type table (see
    // BpeQueries.trained) so the SAME materialization feeds both the
    // merge rounds here and the later symbolize/encode join — this
    // eager is then a cheap no-op re-pin of the in-memory blocks
    val t = graft.operators.Checkpoints.eager(types)
    // Incremental symbolization: round i previously re-folded every
    // word FROM CHARACTERS through all i−1 learned merges (i nested
    // interpreted `aggregate` HOFs per word — O(numMerges²) fold work
    // over the type table across training). Applying only the NEW
    // merge to the carried symbol column is the same left-to-right
    // fold BPE defines — merge lists apply sequentially, so
    // fold(chars, m1..mi) ≡ applyOne(fold(chars, m1..mi−1), mi) —
    // and each round's checkpointed (cnt, sym) table is bounded by
    // the maxTypes cap. One constant-size aggregate per round
    // (guide §1.2: fix the per-round algorithm before anything else).
    var symCkpt = graft.operators.Checkpoints.eager(
      t.select(col("cnt"), expr(charsSql("word")).as("sym")))
    var sym = symCkpt
    var merges = Vector.empty[(String, String)]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val top = sym
        .select(col("cnt"), explode(expr(
          "filter(transform(sym, (s, i) -> named_struct('lft', s, 'rgt', try_element_at(sym, i + 2))), " +
            "p -> p.rgt IS NOT NULL AND p.lft <> p.rgt)")).as("p"))
        .groupBy(col("p.lft").as("lft"), col("p.rgt").as("rgt"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("lft").asc, col("rgt").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges = merges :+ ((l, r))
        if (merges.size < numMerges) {
          // apply the new merge lazily; materialize every 4th round
          // (the pageRank i%4 lineage-cut cadence) so a round costs at
          // most 3 stacked folds and a checkpoint job lands only every
          // few merges — per-round checkpoints measurably cost more
          // than they save on the capped type table
          val applied = sym.select(col("cnt"),
            expr(applyOneSql("sym", l, r, merges.size)).as("sym"))
          if (merges.size % 4 == 0) {
            val next = graft.operators.Checkpoints.eager(applied)
            graft.operators.Checkpoints.release(symCkpt)
            symCkpt = next
            sym = next
          } else sym = applied
        }
      }
    }
    graft.operators.Checkpoints.release(symCkpt)
    merges
  }

  /** The trained model as a frame: (rank, lft, rgt), rank 1-based in
    * merge order — persistable next to the corpus like any other
    * model artifact (band index, centroids, LM table). */
  def mergesDf(spark: SparkSession, merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r), i) => ((i + 1).toLong, l, r) }
      .toDF("rank", "lft", "rgt")
  }

  /** Symbolized vocabulary: the type table plus each word's final
    * symbol sequence and subword count — the broadcastable artifact
    * encoding joins against. */
  def symbolize(types: DataFrame, merges: Seq[(String, String)]): DataFrame =
    types
      .withColumn("sym", symbolsExpr("word", merges))
      .withColumn("n_sym", size(col("sym")).cast("long"))

  /** Per-document word and BPE-token counts: explode words, broadcast
    * join the symbolized vocabulary, aggregate back per `keys`.
    * Out-of-vocabulary words (only possible when the type cap bound)
    * count one token per character. The corpus shuffles once, on the
    * group keys — the vocabulary side never shuffles. */
  def tokenCounts(df: DataFrame, text: Column, keys: Seq[Column], vocab: DataFrame): DataFrame =
    docWords(df, text, keys)
      .join(broadcast(vocab.select(col("word"), col("n_sym"))), Seq("word"), "left")
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n_words"),
        sum(coalesce(col("n_sym"), length(col("word")).cast("long"))).as("n_tokens"))
}
