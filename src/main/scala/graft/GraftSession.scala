package graft

import org.apache.spark.sql.SparkSession

/** Tuned [[SparkSession]] factory for the graft engine.
  *
  * The reference engine (binh-vu/shmr, `/root/reference/shmr/main.py`)
  * assumes a single host with external parallelism (`xargs -P`); graft
  * instead targets real clusters, so every knob here is cluster-safe:
  * AQE re-plans partition counts and skew at runtime, shuffle
  * partitions default to the local core count but should be sized
  * ~2-3x total executor cores on a cluster.
  */
object GraftSession {
  def builder(
      appName: String = "graft",
      master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
  ): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")

  def getOrCreate(appName: String = "graft"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
