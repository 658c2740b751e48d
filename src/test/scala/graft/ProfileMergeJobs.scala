package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions._

// scratch: per-job breakdown of one query (default q_warehouse_merge).
//   sbt "Test/runMain graft.ProfileMergeJobs [q_name]"
object ProfileMergeJobs {
  def main(args: Array[String]): Unit = {
    val q = if (args.nonEmpty) args(0) else "q_warehouse_merge"
    val spark = GraftSession.builder("prof_merge").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.properties.getProperty("callSite.short", "?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, site) = starts.getOrDefault(je.jobId, (0L, "?"))
        println(f"job ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.2fs  $site")
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // warm the JIT once, untimed
    SparkEntry.queries(q)(spark, dir).count()
    graft.operators.Checkpoints.releaseAll()
    Thread.sleep(500)
    println("===== timed run =====")
    val t0 = System.nanoTime()
    SparkEntry.queries(q)(spark, dir).count()
    println(f"total ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    Thread.sleep(500)
    spark.stop()
  }
}
