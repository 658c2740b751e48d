package graft

import org.apache.spark.sql.functions._

// scratch: r16 debug — does claimIfHashPartitioned see the repartition?
object ProbeClaim {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("probe_claim").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df0 = (1 to 100000).map(i => (i.toLong % 997, i.toLong)).toDF("src", "dst")
    val rep = df0.repartition(8, col("src"))
    val ck = graft.operators.Checkpoints.eager(rep)
    println("executedPlan class: " + rep.queryExecution.executedPlan.getClass.getName)
    println("outputPartitioning: " + rep.queryExecution.executedPlan.outputPartitioning)
    println("ck logical: " + ck.queryExecution.logical.getClass.getName)
    val claimed = org.apache.spark.sql.graft.GraftPlans.claimIfHashPartitioned(ck, rep, Seq("src"))
    println("claimed logical: " + claimed.queryExecution.logical)
    // does a groupBy on src now skip the exchange?
    println(claimed.groupBy("src").count().queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode))
    spark.stop()
  }
}
