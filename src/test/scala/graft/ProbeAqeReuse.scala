package graft
object ProbeAqeReuse {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpecBase.session
    val df = SparkEntry.queries("q_sorted_neighbors")(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val fin = p.split("== Initial Plan ==").head // final section only
    println("FINAL_RANGE=" + "Exchange rangepartitioning".r.findAllIn(fin).length)
    println("FINAL_REUSED_EXCH=" + "ReusedExchange".r.findAllIn(fin).length)
    println("FINAL_STAGES=" + "ShuffleQueryStage".r.findAllIn(fin).length)
    spark.stop()
  }
}
