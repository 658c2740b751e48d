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

  test("bucketed tables co-locate the join: no shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bk LOCATION '$wh'")
      spark.range(1000).select(col("id"), (col("id") * 2).as("x"))
        .write.bucketBy(4, "id").sortBy("id").mode("overwrite").saveAsTable("graft_bk.t1")
      spark.range(1000).select(col("id"), (col("id") + 5).as("y"))
        .write.bucketBy(4, "id").sortBy("id").mode("overwrite").saveAsTable("graft_bk.t2")
      val joined = spark.table("graft_bk.t1").join(spark.table("graft_bk.t2"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() === 1000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bk.t1")
      spark.sql("DROP TABLE IF EXISTS graft_bk.t2")
      spark.sql("DROP DATABASE IF EXISTS graft_bk")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
