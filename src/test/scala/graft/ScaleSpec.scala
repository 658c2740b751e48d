package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class ScaleSpec extends SparkSpecBase {
  import spark.implicits._

  test("saltedJoin is row-identical to a plain join under skew") {
    // 10k rows, 90% on one hot key
    val probe = spark.range(10000)
      .select(when(col("id") % 10 === 0, col("id")).otherwise(0L).as("k"), col("id").as("v"))
    val build = Seq((0L, "hot"), (10L, "a"), (20L, "b")).toDF("k", "name")
    val plain = probe.join(build, "k").agg(count(lit(1)), sum(col("v"))).as[(Long, Long)].head()
    val salted = Skew.saltedJoin(probe, build, "k", 8).agg(count(lit(1)), sum(col("v"))).as[(Long, Long)].head()
    assert(salted === plain)
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    // the no-code-change skew path: when salting is not wired in, AQE
    // must still split the hot partition of a shuffled join. Thresholds
    // lowered so the 95%-hot-key toy triggers the same machinery a
    // 100 TB skewed shuffle does.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val pad = "x" * 64
      val probe = spark.range(50000)
        .select(when(col("id") % 20 === 0, col("id")).otherwise(0L).as("k"),
          concat(lit(pad), col("id")).as("v"))
      val build = spark.range(0, 50000, 10).select(col("id").as("k"), (col("id") * 3).as("w"))
      val joined = probe.join(build, "k")
      // run through joined's OWN QueryExecution (count() would build a
      // separate one and leave this plan un-adapted)
      assert(joined.collect().length === 50000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE should mark the hot-key join partition skewed:\n${plan.take(1200)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed tables co-locate the join: no shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bk LOCATION '$wh'")
      graft.sources.Warehouse.writeBucketed(
        spark.range(1000).select(col("id"), (col("id") * 2).as("x")),
        "graft_bk.t1", Seq("id"), nBuckets = 4)
      graft.sources.Warehouse.writeBucketed(
        spark.range(1000).select(col("id"), (col("id") + 5).as("y")),
        "graft_bk.t2", Seq("id"), nBuckets = 4)
      val joined = graft.sources.Warehouse.bucketJoin(spark, "graft_bk.t1", "graft_bk.t2", Seq("id"))
      assert(graft.sources.Warehouse.isExchangeFree(joined),
        s"bucketed join should not shuffle:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() === 1000)
      // an aggregation on the bucket key is exchange-free too
      val agg = spark.table("graft_bk.t1").groupBy("id").agg(sum("x"))
      assert(graft.sources.Warehouse.isExchangeFree(agg),
        s"bucketed agg should not shuffle:\n${agg.queryExecution.executedPlan}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bk.t1")
      spark.sql("DROP TABLE IF EXISTS graft_bk.t2")
      spark.sql("DROP DATABASE IF EXISTS graft_bk")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
