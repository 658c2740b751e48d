package graft

/** Manual profiler (not a test): prints the key-shuffle count of each
  * heavy query's executed plan — the numbers PlanAuditSpec's shuffle
  * budgets are pinned from. */
object ProfileShuffles {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpecBase.session
    val dir = "/root/testdata/sf0.001"
    val targets = Seq(
      "q_lang_profile", "q_pagerank", "q_tfidf", "q_json_shred",
      "q_tpch_q3", "q_tpch_q4", "q_tpch_q5", "q_tpch_q7", "q_tpch_q8",
      "q_tpch_q10", "q_tpch_q18", "q_star_join", "q_pipeline",
      "q_mad_outliers", "q_zscore", "q_repetition", "q_vocab",
      "q_cluster_star", "q_corpus", "q_corpus_facade", "q_dedup_cluster", "q_dedup_minhash",
      "q_dedup_ngram", "q_containment", "q_fuzzy_join",
      "q_ann_lsh", "q_ann_ivf", "q_cosine_topk", "q_sessionize",
      "q_session_window", "q_decontam", "q_source_overlap", "q_boilerplate", "q_token_sample",
      "q_semdedup", "q_lm_score", "q_keep_best", "q_temperature", "q_phash",
      "q_fertility", "q_skew_profile", "q_cms_gate", "q_incr_dedup",
      "q_sorted_neighbors", "q_global_rank", "q_winnow", "q_weighted_sample",
      "q_winnow_pairs", "q_token_drift", "q_lsh_recall", "q_triangles", "q_scd2",
      "q_update_capstone", "q_corpus_diff", "q_substring_spans", "q_substring_scrub",
      "q_source_cap", "q_drop_ledger", "q_stats_ledger",
      "q_nb_quality", "q_nb_confusion", "q_sentence_dedup", "q_semdedup_pq",
      "q_gopher_rules", "q_c4_rules",
      "q_unimax", "q_unimax_sample", "q_dsir", "q_hash_embed", "q_text_knn",
      "q_nb_eval", "q_centroid_eval", "q_bloom_novel",
      "q_rep_signals", "q_datasheet", "q_phrase_search", "q_scene_cuts",
      "q_textrank", "q_trustrank", "q_hard_negatives", "q_f2_skew",
      "q_interval_join", "q_nb_calibration", "q_join_discovery",
      "q_vocab_coverage", "q_quantile_norm", "q_block_jackknife",
      "q_khop", "q_copurchase", "q_trending",
      "q_kcore", "q_kn_lm", "q_keyness", "q_bm25", "q_group_heavy",
      "q_ctfidf", "q_mi", "q_winsorize", "q_attribution", "q_auc",
      "q_survival", "q_spearman", "q_twap", "q_hhi", "q_luhn",
      "q_readability", "q_benford", "q_zone_prune",
      "q_distinct_n", "q_kl_source", "q_mutual_knn", "q_cc_sizes",
      "q_target_encode", "q_trimmed_mean",
      "q_mutual_knn_ann", "q_cluster_incr", "q_decontam_sem", "q_rerank",
      "q_rerank_bm25", "q_ewma")
    for (q <- targets) {
      try {
        val p = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
        val n = "Exchange (hash|range)partitioning".r.findAllIn(p).length
        println(s"SHUFFLES $q $n")
      } catch {
        case e: Exception => println(s"SHUFFLES $q ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
