package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

// scratch: round-16 per-job profiler.
//   sbt "Test/runMain graft.ProfileJobsR16 q_name"
// Runs one query twice (warm) and prints EVERY driver job of the
// second run: wall ms, stage/task counts, and the call site that
// launched it — the measure-first breakdown (guide §1) for queries
// whose cost is job count, not bytes.
object ProfileJobsR16 {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileJobsR16 q_name")
    val name = args(0)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("prof_jobs_r16").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class J(t0: Long, site: String, nStages: Int, nTasks: Int)
    val starts = new ConcurrentHashMap[Int, J]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val p = Option(js.properties)
        val site = p.flatMap(pp => Option(pp.getProperty("spark.job.description")))
          .orElse(p.flatMap(pp => Option(pp.getProperty("callSite.short"))))
          .getOrElse("?").replace('\n', ' ').take(110)
        starts.put(js.jobId,
          J(System.nanoTime(), site, js.stageInfos.size, js.stageInfos.map(_.numTasks).sum))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { j =>
          val ms = (System.nanoTime() - j.t0) / 1e6
          lines.add(je.jobId ->
            f"  job ${je.jobId}%4d ${ms}%8.1f ms stages=${j.nStages}%2d tasks=${j.nTasks}%5d  ${j.site}")
        }
      }
    }
    // warmup
    try SparkEntry.queries(name)(spark, dir).count()
    catch { case e: Throwable => println(s"$name warmup FAILED: $e") }
    graft.operators.Checkpoints.releaseAll()

    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    try SparkEntry.queries(name)(spark, dir).count()
    catch { case e: Throwable => println(s"$name FAILED: $e") }
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    println(f"$name warm ${dt}%.2fs, ${lines.size} jobs:")
    lines.toArray(Array.empty[(Int, String)]).sortBy(_._1).foreach(l => println(l._2))
    graft.operators.Checkpoints.releaseAll()
    spark.stop()
  }
}
