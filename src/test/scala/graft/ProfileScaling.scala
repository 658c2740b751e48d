package graft

// scratch: scaling-curve evidence for the heaviest queries — run each
// at sf0.001/0.01/0.1 in ONE JVM (shared JIT/codegen state, so the
// cross-SF ratios are apples-to-apples) and fit per-decade growth
// exponents: alpha = log10(t_hi/t_lo) for a 10x data step, so alpha=1
// is linear scaling and alpha<=0 means fixed overhead dominates.
// sbt "Test/runMain graft.ProfileScaling"  → prints table, writes
// dev/scaling_r8.json (r7 curves preserved in dev/scaling_r7.json).
object ProfileScaling {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("prof-scaling", "local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfs = Seq("0.001", "0.01", "0.1")
    // the bench head: every query that has topped 1.2s in a full
    // sf0.1 session across r5-r8, plus the r8-rewritten gram-shuffle
    // family and the two new ledger queries
    val names = Seq(
      "q_semdedup", "q_ann_ivf", "q_cluster_star", "q_pagerank",
      "q_corpus", "q_keep_best", "q_triangles", "q_tfidf",
      "q_fuzzy_join", "q_containment", "q_dedup_ngram",
      "q_substring_spans", "q_substring_scrub", "q_boilerplate",
      "q_drop_ledger", "q_stats_ledger", "q_bigram_lm",
      // r9 additions: the trained-model and sentence/PQ dedup family
      "q_nb_quality", "q_sentence_dedup", "q_semdedup_pq",
      "q_ann_ivfpq", "q_bpe_tokens", "q_dsir", "q_nb_eval",
      // wave 7-9 additions: the interval pair stream is the only one
      // with super-linear intermediate growth (per-day co-activity
      // pairs ~ quadratic in daily active users) — watch its alpha
      "q_interval_join", "q_textrank", "q_trustrank",
      "q_hard_negatives", "q_join_discovery", "q_f2_skew",
      // r10 additions: iterative LPA + the ROUGE pair grader
      "q_lpa", "q_rouge_overlap")

    def time(n: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.operators.Checkpoints.releaseAll()
      dt
    }

    // global warmup at the largest SF first: codegen + JIT reach
    // steady state before anything is timed (subset runs are JIT-cold
    // otherwise and their small-SF numbers read high)
    for (n <- names) { try time(n, "/root/testdata/sf0.1") catch { case _: Throwable => } }

    val results = for (n <- names) yield {
      val per = for (sf <- sfs) yield {
        val dir = s"/root/testdata/sf$sf"
        time(n, dir) // per-SF warmup: footer caches, AQE stats
        math.min(time(n, dir), time(n, dir))
      }
      n -> per
    }

    def alpha(lo: Double, hi: Double): Double = math.log10(hi / lo)
    println(f"${"query"}%-16s ${"sf0.001"}%8s ${"sf0.01"}%8s ${"sf0.1"}%8s ${"a(1->2)"}%8s ${"a(2->3)"}%8s")
    val rows = results.map { case (n, Seq(a, b, c)) =>
      println(f"$n%-16s $a%8.3f $b%8.3f $c%8.3f ${alpha(a, b)}%8.2f ${alpha(b, c)}%8.2f")
      s"""{"query":"$n","sf0.001":$a,"sf0.01":$b,"sf0.1":$c,""" +
        s""""alpha_001_01":${alpha(a, b)},"alpha_01_1":${alpha(b, c)}}"""
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("dev/scaling_r10.json"),
      rows.mkString("[\n", ",\n", "\n]"))
    spark.stop()
  }
}
