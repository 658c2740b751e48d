package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.Bpe

/** BPE tokenizer parameters shared between the Spark lambdas and the
  * generated DuckDB oracle CTE chain (same one-source-of-truth
  * contract as [[AnnParams]]). */
object BpeParams {
  /** Merge rounds. The sf corpora have a 31-word vocabulary, so 16
    * merges learn real multi-character subwords without exhausting
    * the pair supply (each round is one aggregate + one-row collect;
    * the oracle replays exactly this many CTE rounds). */
  val NumMerges = 16

  /** Word-type cap (count desc, word asc). Far above any test-SF
    * vocabulary — the cap exists so driver/exchange state is bounded
    * at open-web corpus scale, and the oracle replays it as ORDER BY
    * … LIMIT so both engines agree even when it binds. */
  val MaxWordTypes = 1 << 20

  /** q_bpe_pack token budget per training batch (BPE tokens). */
  val PackBudget = 2000L
}

/** Trained-BPE queries (SURVEY.md §2.5/32c-32e): merge-table
  * training, document tokenization, per-language fertility, and
  * token-budget packing re-gated on LEARNED subword counts. The
  * oracle side replays the full training loop — word types, each
  * merge round's pair argmax, the merge applications — as a
  * generated CTE chain, so the gate covers training, not just
  * application. */
object BpeQueries {

  /** Word types checkpointed ONCE: the same materialized blocks feed
    * every merge round and the encode-side vocabulary join, so the
    * corpus word aggregate runs exactly one time per query. */
  private def trained(s: SparkSession, dir: String): (DataFrame, Seq[(String, String)]) = {
    val types = graft.operators.Checkpoints.eager(
      Bpe.wordTypes(Tables.documents(s, dir), col("text"), BpeParams.MaxWordTypes))
    val merges = Bpe.trainMerges(types, BpeParams.NumMerges)
    (types, merges)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.5/32c the learned merge table itself — training is the
    // operator under test; ranks are merge order.
    "q_bpe_merges" -> ((s, dir) => {
      val (_, merges) = trained(s, dir)
      Bpe.mergesDf(s, merges)
    }),

    // §2.5/32d document tokenization under the trained model:
    // words + learned-subword counts per document (broadcast
    // vocabulary join; OOV falls back to per-character tokens).
    "q_bpe_tokens" -> ((s, dir) => {
      val (types, merges) = trained(s, dir)
      Bpe.tokenCounts(Tables.documents(s, dir), col("text"), Seq(col("doc_id")),
        Bpe.symbolize(types, merges))
    }),

    // §2.5/32d per-language tokenizer fertility on REAL subword
    // counts (q_fertility's regex proxy upgraded): integer
    // milli-tokens-per-word, exact in any engine.
    "q_bpe_fertility" -> ((s, dir) => {
      val (types, merges) = trained(s, dir)
      Bpe.tokenCounts(Tables.documents(s, dir), col("text"), Seq(col("lang")),
          Bpe.symbolize(types, merges))
        .withColumn("fert_milli", expr("(n_tokens * 1000) div n_words"))
    }),

    // §2.5/32e sequence packing on real token counts — the budget a
    // data loader actually fills. Per-source shards, doc_id order.
    "q_bpe_pack" -> ((s, dir) => {
      val (types, merges) = trained(s, dir)
      val perDoc = Bpe.tokenCounts(Tables.documents(s, dir), col("text"),
        Seq(col("doc_id"), col("source")), Bpe.symbolize(types, merges))
      graft.text.TextPrep.packByTokenBudget(perDoc, col("source"), Seq(col("doc_id")),
          col("n_tokens"), budget = BpeParams.PackBudget)
        .select(col("doc_id"), col("source"), col("n_tokens"), col("batch_id"))
    })
  )

  // ---------------------------------------------------------------
  // DuckDB replay. One generated WITH-prefix replays the whole
  // training loop: w0 = capped word types with character symbols;
  // each round r unnests symbols with positions (u), attaches
  // lead/lag neighbours (x), counts distinct-symbol adjacent pairs
  // (p), takes the argmax merge (m), and rebuilds symbol lists with
  // that merge applied simultaneously (w) — provably identical to
  // the Spark fold because candidate pairs require lft ≠ rgt (no
  // overlapping occurrences). An exhausted round has empty m{r}:
  // every COALESCE(.., FALSE) guard turns it into a no-op, matching
  // Spark's early stop.
  // ---------------------------------------------------------------

  private def round(r: Int): String = {
    val prev = s"w${r - 1}"
    // AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and
    // x{r}/m{r} are each referenced several times per round — without
    // materialization the 16-round chain re-derives w0 exponentially
    // many times (observed as an fd-exhaustion error on the parquet)
    raw"""u$r AS (SELECT word, cnt, unnest(range(len(sym))) AS pos, unnest(sym) AS s FROM $prev),
         |x$r AS MATERIALIZED (
         |  SELECT word, cnt, pos, s,
         |         lead(s) OVER (PARTITION BY word ORDER BY pos) AS nx,
         |         lag(s)  OVER (PARTITION BY word ORDER BY pos) AS pv
         |  FROM u$r
         |),
         |p$r AS (
         |  SELECT s AS lft, nx AS rgt, CAST(sum(cnt) AS BIGINT) AS c
         |  FROM x$r WHERE nx IS NOT NULL AND s <> nx GROUP BY s, nx
         |),
         |m$r AS MATERIALIZED (SELECT lft, rgt FROM p$r ORDER BY c DESC, lft ASC, rgt ASC LIMIT 1),
         |w$r AS MATERIALIZED (
         |  SELECT word, cnt,
         |         list(CASE WHEN COALESCE(s = (SELECT lft FROM m$r) AND nx = (SELECT rgt FROM m$r), FALSE)
         |                   THEN s || (SELECT rgt FROM m$r) ELSE s END ORDER BY pos) AS sym
         |  FROM x$r
         |  WHERE NOT COALESCE(s = (SELECT rgt FROM m$r) AND pv = (SELECT lft FROM m$r), FALSE)
         |  GROUP BY word, cnt
         |)""".stripMargin
  }

  /** The shared training prefix: w0 … w{NumMerges}. */
  private lazy val trainCtes: (String, String) = {
    import BpeParams.{MaxWordTypes, NumMerges}
    val w0 = raw"""w0 AS MATERIALIZED (
         |  SELECT word, cnt,
         |         list_transform(range(length(word)), i -> substr(word, CAST(i + 1 AS INT), 1)) AS sym
         |  FROM (
         |    SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
         |      SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS word FROM documents
         |    ) WHERE word <> '' GROUP BY word
         |    ORDER BY cnt DESC, word ASC LIMIT $MaxWordTypes
         |  )
         |)""".stripMargin
    val rounds = (1 to NumMerges).map(round).mkString(",\n")
    (s"WITH $w0,\n$rounds", s"w$NumMerges")
  }

  /** Tokenization suffix: per-document word stream LEFT JOINed to the
    * final vocabulary (OOV → one token per character). */
  private lazy val docTokensCtes: String = {
    val (prefix, fin) = trainCtes
    raw"""$prefix,
         |dw AS (
         |  SELECT doc_id, lang, source,
         |         unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS word
         |  FROM documents
         |),
         |dj AS (
         |  SELECT d.doc_id, d.lang, d.source,
         |         CAST(COALESCE(len(v.sym), length(d.word)) AS BIGINT) AS t
         |  FROM dw d LEFT JOIN $fin v ON d.word = v.word
         |  WHERE d.word <> ''
         |)""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q_bpe_merges" -> {
      val (prefix, _) = trainCtes
      val arms = (1 to BpeParams.NumMerges)
        .map(r => s"SELECT CAST($r AS BIGINT) AS rank, lft, rgt FROM m$r")
        .mkString("\nUNION ALL ")
      s"$prefix\n$arms"
    },

    "q_bpe_tokens" ->
      raw"""$docTokensCtes
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, CAST(sum(t) AS BIGINT) AS n_tokens
           |FROM dj GROUP BY doc_id""".stripMargin,

    "q_bpe_fertility" ->
      raw"""$docTokensCtes
           |SELECT lang, CAST(count(*) AS BIGINT) AS n_words, CAST(sum(t) AS BIGINT) AS n_tokens,
           |       (CAST(sum(t) AS BIGINT) * 1000) // CAST(count(*) AS BIGINT) AS fert_milli
           |FROM dj GROUP BY lang""".stripMargin,

    "q_bpe_pack" ->
      raw"""$docTokensCtes,
           |pk AS (
           |  SELECT doc_id, source, CAST(sum(t) AS BIGINT) AS n_tokens
           |  FROM dj GROUP BY doc_id, source
           |)
           |SELECT doc_id, source, n_tokens,
           |       (CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |        - n_tokens) // ${BpeParams.PackBudget} AS batch_id
           |FROM pk""".stripMargin
  )
}
