package graft
object ExplainFuzzy {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("ef", "local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.queries.DedupQueries.queries("q_fuzzy_join")(spark, "/root/testdata/sf0.01")
    df.count()  // let AQE finalize
    val plan = df.queryExecution.executedPlan.toString
    println("REUSED_EXCHANGES=" + "ReusedExchange".r.findAllIn(plan).length)
    println("EXCHANGES=" + "Exchange hashpartitioning".r.findAllIn(plan).length)
    println("SCANS=" + "FileScan parquet".r.findAllIn(plan).length)
    spark.stop()
  }
}
