package graft
object ProbeAqeReuse {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpecBase.session
    for (q <- Seq("q_sorted_neighbors", "q_global_rank")) {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      df.collect()
      val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      println(s"PROBE $q RANGE=" + "Exchange rangepartitioning".r.findAllIn(fin).length +
        " REUSED=" + "ReusedExchange".r.findAllIn(fin).length +
        " STAGES=" + "ShuffleQueryStage".r.findAllIn(fin).length)
    }
    spark.stop()
  }
}
