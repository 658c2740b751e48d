package graft

// Manual end-to-end drive of the public API (sources + streaming);
// invoked via: sbt "Test/runMain graft.DriveManual"
object DriveManual {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = GraftSession.builder("drive", "local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.sources.PartitionedFiles
    import graft.streaming.EventStreams

    val df = Seq((1L, "ann", 30), (2L, "bob", 25), (3L, "cat", 40)).toDF("id", "name", "age")
    PartitionedFiles.writeJsonl(df, "/tmp/drive_jsonl", 2, codec = Some("gzip"))
    println("META_COUNT=" + PartitionedFiles.readMetaCount("/tmp/drive_jsonl"))
    val back = PartitionedFiles.readJsonl(spark, "/tmp/drive_jsonl", Some("id long, name string, age long"))
    println("ROUNDTRIP=" + back.orderBy("id").collect().mkString(";"))

    val evDir = "/tmp/drive_events"
    val ev = Seq(
      (1L, "2024-01-01 00:05:00", 1L, "click", 1.0),
      (2L, "2024-01-01 00:20:00", 1L, "click", 2.0),
      (3L, "2024-01-01 01:10:00", 2L, "view", 3.0)
    ).toDF("event_id", "s", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    PartitionedFiles.writeJsonl(ev, evDir, 1)
    val stream = spark.readStream
      .schema("event_id long, user_id long, event_type string, value double, ts timestamp")
      .json(evDir)
    val q = EventStreams.windowedCounts(stream, watermark = "0 seconds")
      .writeStream.format("memory").queryName("drive_wc").outputMode("append").start()
    q.processAllAvailable()
    val ev2 = Seq((9L, "2024-01-02 00:00:00", 9L, "x", 0.0))
      .toDF("event_id", "s", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    ev2.coalesce(1).write.mode("append").json(evDir)
    q.processAllAvailable()
    q.stop()
    println("STREAMED=" + spark.table("drive_wc").orderBy("bucket", "event_type").collect().mkString(";"))
    spark.stop()
  }
}
