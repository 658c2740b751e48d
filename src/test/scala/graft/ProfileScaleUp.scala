package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// scratch: scaling evidence BEYOND the sandbox's largest testdata SF.
// The sf0.1 documents/embeddings tables are amplified 4x and 16x
// (~sf0.4 / ~sf1.6 equivalents) and the heavy document/embedding
// queries are timed at x1/x4/x16 in ONE JVM. Copies are NOT
// duplicates: copy k rotates each document's token sequence (and each
// embedding vector) by k positions, so shingle/gram/window content is
// genuinely new while lengths, vocabulary and per-doc structure are
// preserved — the workload scales like "more unique data", not like a
// dedup-collapsible clone farm. alpha = log4(t_hi/t_lo) per 4x step
// (1 = linear, 0 = overhead-bound).
// sbt "Test/runMain graft.ProfileScaleUp" → prints table, writes
// dev/scaleup_r9.json.
object ProfileScaleUp {

  private val base = "/root/testdata/sf0.1"
  private val root = "/tmp/graft_scaleup"

  /** Rotate an array column left by k (identity when k = 0 or k ≥ len). */
  private def rot(a: org.apache.spark.sql.Column, k: Int) =
    when(size(a) > k,
      concat(slice(a, lit(k + 1), size(a) - k), slice(a, lit(1), lit(k)))).otherwise(a)

  private[graft] def amplify(spark: SparkSession, m: Int): String = {
    val dir = s"$root/x$m"
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val embs = spark.read.parquet(s"$base/embeddings.parquet")
    val evs = spark.read.parquet(s"$base/events.parquet")
    val dCopies = (0 until m).map { k =>
      docs.select(
        (col("doc_id") + lit(k.toLong * 10_000_000L)).as("doc_id"),
        array_join(rot(split(col("text"), " "), k), " ").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    val eCopies = (0 until m).map { k =>
      embs.select(
        (col("vec_id") + lit(k.toLong * 10_000_000L)).as("vec_id"),
        rot(col("embedding"), k).as("embedding"),
        col("label"))
    }
    // events scale as "more users over the same calendar window" —
    // copy k shifts the entity ids, so per-user structure (lifetimes,
    // sessions, attribution windows) is preserved while every keyed
    // exchange sees genuinely more keys
    val vCopies = (0 until m).map { k =>
      evs.select(
        (col("event_id") + lit(k.toLong * 100_000_000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(k.toLong * 10_000_000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }
    dCopies.reduce(_ unionAll _).repartition(32)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    eCopies.reduce(_ unionAll _).repartition(32)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    vCopies.reduce(_ unionAll _).repartition(32)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Fresh-root zone-mapped publish + one lifecycle merge, with or
    * without zone-clustered staging; returns the merged read (the
    * count() forces the whole publish path). */
  private def whMergeZones(spark: SparkSession, dir: String, cluster: Boolean): DataFrame = {
    import graft.sources.Versioned
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val root = java.nio.file.Files.createTempDirectory("scaleup_whzc").toString + "/t"
    require(Versioned.promoteBucketed(docs, root, "doc_id", 16,
      zoneCols = Seq("doc_id")).promoted)
    val drop = docs.filter(pmod(col("doc_id"), lit(13)) === 0)
      .select(col("doc_id"), col("source"),
        concat(col("text"), lit(" v2")).as("text"), lit(false).as("del"))
      .repartition(32) // value-shuffled staging input — the worst case
    require(Versioned.merge(drop, root, deleted = col("del"),
      zoneCluster = cluster).merged)
    Versioned.read(spark, root)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("prof-scaleup", "local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val factors = Seq(1, 4, 16)
    val dirs = factors.map(m => m -> amplify(spark, m)).toMap

    // heavy queries that read only documents/embeddings; pass names
    // as args to profile a subset (written to dev/scaleup_r9b.json,
    // leaving the full-run artifact intact)
    val defaultNames = Seq(
      "q_dedup_minhash", "q_dedup_ngram", "q_fuzzy_join", "q_containment",
      "q_substring_spans", "q_boilerplate", "q_lang_profile", "q_semdedup",
      "q_ann_ivf", "q_ann_ivfpq", "q_bpe_tokens", "q_dsir",
      "q_nb_quality", "q_curation",
      // r10 additions: ROUGE pair grading + the stop-gram audit
      "q_rouge_overlap", "q_stop_grams",
      // r11 additions: incremental CC ledger (two temp-ledger appends
      // per run — the timed cost IS the append path), semantic
      // decontamination + verdict join, trained linear reranker
      "q_cluster_incr", "q_decontam_sem", "q_rerank",
      // r12 additions: bucketed warehouse merge (promote + one drop
      // merge per run — the timed cost IS the publish path) and the
      // PQ-screened mutual-kNN
      "q_warehouse_merge", "q_mutual_knn_pq",
      // r13 additions: the schema-evolution merge (same fresh-root
      // publish shape as q_warehouse_merge) and the zone-pruned range
      // read (cached build — the timed cost IS the pruned read)
      "q_warehouse_evolve", "q_warehouse_range",
      // r14 additions: the BOUNDED rouge grading (must run flat where
      // the uncapped anchor grows with flagged pairs) and the string
      // zone-pruned range read (cached build, timed cost IS the read)
      "q_rouge_capped", "q_warehouse_range_str",
      // r15 additions: the composite-key merge (fresh-root publish —
      // the tuple hash must scale like the single-key one) and the
      // rebucket lifecycle (promote + merge + full 8->32 rewrite per
      // run — the timed cost IS the table rewrite, compaction-class
      // by contract)
      "q_warehouse_merge2", "q_warehouse_rebucket",
      // r15 additions (merge-on-read): the two-layer patch publish —
      // O(drop) write cost that must stay FLAT while q_warehouse_merge
      // (same lifecycle as bucket rewrites) grows with the corpus —
      // and the fold that rewrites the layers' touched buckets back
      // into the base
      "q_warehouse_patch", "q_warehouse_patch_fold")
    val names = if (args.nonEmpty) args.toSeq else defaultNames
    val outFile = sys.env.getOrElse("SCALEUP_OUT",
      if (args.nonEmpty) "dev/scaleup_r15b.json" else "dev/scaleup_r15.json")

    def time(n: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.operators.Checkpoints.releaseAll()
      dt
    }

    // JIT/codegen warmup on the LARGEST amplification so every timed
    // run below is steady-state
    for (n <- names) { try time(n, dirs(16)) catch { case _: Throwable => } }

    val results = for (n <- names) yield {
      val per = for (m <- factors) yield {
        time(n, dirs(m)) // per-dir warmup (footer caches, AQE stats)
        math.min(time(n, dirs(m)), time(n, dirs(m)))
      }
      n -> per
    }

    // the UNBOUNDED gram-pair sweep goes super-linear on this corpus
    // (tiny ~100-word vocabulary → every gram is hot → C(d,2)
    // candidate concentration, the documented inherent cost). Since
    // r10 the registry default is DocFreqCap.Fixed(64) — the r10 full
    // profile measured the relative Auto cap NOT binding here (mean
    // df scales with the corpus' own heat: 39.9 s / alpha 1.9, same
    // as Unbounded) — so the main rows above measure the absolute-
    // capped default; the variants below pin both policy ends.
    val capped: Seq[(String, String => org.apache.spark.sql.DataFrame)] = if (args.nonEmpty) Seq() else Seq(
      "q_dedup_ngram_df64" -> (dir => graft.dedup.Dedup.ngramJaccardPairs(
        graft.sources.Tables.documents(spark, dir), col("text"), col("doc_id"),
        n = 3, tau = 0.5, maxDocFreq = graft.dedup.DocFreqCap.Fixed(64))),
      "q_containment_df64" -> (dir => graft.dedup.Dedup.containmentPairs(
        graft.sources.Tables.documents(spark, dir), col("text"), col("doc_id"),
        n = 3, tau = 0.8, maxDocFreq = graft.dedup.DocFreqCap.Fixed(64))),
      // the opt-out sweep: what the DEFAULT used to cost before
      // DocFreqCap.Auto became the default (r9's 38.8/39.6 s rows)
      "q_dedup_ngram_unbounded" -> (dir => graft.dedup.Dedup.ngramJaccardPairs(
        graft.sources.Tables.documents(spark, dir), col("text"), col("doc_id"),
        n = 3, tau = 0.5, maxDocFreq = graft.dedup.DocFreqCap.Unbounded)),
      "q_containment_unbounded" -> (dir => graft.dedup.Dedup.containmentPairs(
        graft.sources.Tables.documents(spark, dir), col("text"), col("doc_id"),
        n = 3, tau = 0.8, maxDocFreq = graft.dedup.DocFreqCap.Unbounded)),
      // r15: the zone-clustered merge staging's PUBLISH overhead (one
      // extra range exchange over the touched-bucket-sized staging) —
      // timed against the identical unclustered publish; the pruning
      // BENEFIT is spec-pinned (strictly fewer files), this pins the
      // cost side at scale
      "wh_merge_zones_plain" -> (dir => whMergeZones(spark, dir, cluster = false)),
      "wh_merge_zones_clustered" -> (dir => whMergeZones(spark, dir, cluster = true)))
    def timeDf(mk: String => org.apache.spark.sql.DataFrame, dir: String): Double = {
      val t0 = System.nanoTime()
      mk(dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.operators.Checkpoints.releaseAll()
      dt
    }
    val cappedResults = for ((n, mk) <- capped) yield {
      try timeDf(mk, dirs(16)) catch { case _: Throwable => } // warmup
      val per = for (m <- factors) yield {
        timeDf(mk, dirs(m))
        math.min(timeDf(mk, dirs(m)), timeDf(mk, dirs(m)))
      }
      n -> per
    }

    def alpha(lo: Double, hi: Double): Double = math.log(hi / lo) / math.log(4.0)
    println(f"${"query"}%-18s ${"x1"}%8s ${"x4"}%8s ${"x16"}%8s ${"a(1->4)"}%8s ${"a(4->16)"}%9s")
    val rows = (results ++ cappedResults).map { case (n, Seq(a, b, c)) =>
      println(f"$n%-18s $a%8.3f $b%8.3f $c%8.3f ${alpha(a, b)}%8.2f ${alpha(b, c)}%9.2f")
      java.util.Locale.setDefault(java.util.Locale.ROOT)
      s"""{"query":"$n","x1":$a,"x4":$b,"x16":$c,""" +
        s""""alpha_1_4":${alpha(a, b)},"alpha_4_16":${alpha(b, c)}}"""
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile),
      rows.mkString("[\n", ",\n", "\n]"))
    spark.stop()
  }
}
