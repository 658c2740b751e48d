package graft

// manual drive: file-source stream enriched with a static dim
object DriveEnrich {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = GraftSession.builder("drive-enrich", "local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // stage real events as a jsonl stream source
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("event_type"))
    graft.sources.PartitionedFiles.writeJsonl(ev, "/tmp/enrich_src", 2)
    val dim = spark.range(0, 8).select(col("id").as("user_id"),
      when(col("id") % 2 === 0, "gold").otherwise("basic").as("tier"))
    val stream = spark.readStream
      .schema("event_id long, user_id long, event_type string").json("/tmp/enrich_src")
    val q = graft.streaming.EventStreams.enriched(stream, dim, "user_id")
      .writeStream.format("memory").queryName("drv_enr").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("drv_enr")
    println("ENRICHED_ROWS=" + got.count())
    println("TIER_SPLIT=" + got.groupBy("tier").count().collect().toList)
    println("NULL_TIER_ROWS=" + got.filter(col("tier").isNull).count())
    println("NULL_FOR_COVERED=" + got.filter(col("user_id") < 8 && col("tier").isNull).count())
    println("BAD_TIERS=" + got.filter((col("user_id") % 2 === 0 && col("tier") =!= "gold") ||
      (col("user_id") % 2 === 1 && col("tier") =!= "basic")).count())
    spark.stop()
  }
}
