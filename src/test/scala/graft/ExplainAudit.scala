package graft

// scratch: plan audit; sbt "Test/runMain graft.ExplainAudit"
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("audit", "local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (n <- Seq("q_filter", "q_join", "q_star_join", "q_reduce_by_key", "q_cosine_topk",
                  "q_group_topk", "q_bloom_join", "q_hll_distinct", "q_dedup_ngram")) {
      println(s"===== $n =====")
      val plan = SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // keep it terse: operator lines + pushed filters + readschema
      plan.linesIterator.foreach { l =>
        if (l.matches("^\\(\\d+\\).*") || l.contains("PushedFilters") || l.contains("ReadSchema"))
          println(l.take(150))
      }
    }
    spark.stop()
  }
}
