package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

// scratch: round-15 optimization profiler.
//   sbt "Test/runMain graft.ProfileR16 <before|after> q_a,q_b,..."
// For each named query: dump the formatted plan to
// plans/r16/<q>_<tag>.txt and run it twice (warm), reporting per-run
// wall time, job count, stage count, task count, and shuffle
// read/write bytes from a SparkListener — the measure-first numbers
// the optimization guide (§1) asks for before and after every change.
object ProfileR16 {
  def main(args: Array[String]): Unit = {
    val tag = if (args.nonEmpty) args(0) else "before"
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("prof_r16").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names: Seq[String] =
      if (args.length > 1) args(1).split(',').map(_.trim).filter(_.nonEmpty).toSeq
      else Seq.empty
    require(names.nonEmpty, "usage: ProfileR16 <tag> q_a,q_b,...")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicLong(0L)
    val shufR = new AtomicLong(0L)
    val shufW = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks.toLong)
        shufR.addAndGet(sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        shufW.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    Files.createDirectories(Paths.get("plans/r16"))

    for (n <- names) {
      // plan dump (pre-execution initial plan; AQE markers included)
      try {
        val plan = SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"plans/r16/${n}_$tag.txt"), plan)
      } catch { case e: Throwable => println(s"$n plan dump failed: $e") }
      graft.operators.Checkpoints.releaseAll()
      val nRuns = if (sys.env.contains("SPARK_GRAFT_PLANS_ONLY")) 0 else 2
      for (i <- 1 to nRuns) {
        jobs.set(0); stages.set(0); tasks.set(0L); shufR.set(0L); shufW.set(0L)
        val t0 = System.nanoTime()
        try SparkEntry.queries(n)(spark, dir).count()
        catch { case e: Throwable => println(s"$n run$i FAILED: $e") }
        val dt = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously; give them a beat
        Thread.sleep(200)
        println(f"$n%-26s $tag run$i ${dt}%7.2fs jobs=${jobs.get}%3d stages=${stages.get}%4d " +
          f"tasks=${tasks.get}%6d shufR=${shufR.get / 1e6}%9.1fMB shufW=${shufW.get / 1e6}%9.1fMB")
        graft.operators.Checkpoints.releaseAll()
      }
    }
    spark.stop()
  }
}
