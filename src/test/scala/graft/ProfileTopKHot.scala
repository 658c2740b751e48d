package graft

import org.apache.spark.sql.functions._

/** Manual hot-path profiler for the GroupTopK partial phase: 10M rows,
  * 100k groups, k=5 — heap maintenance dominates, not job overhead. */
object ProfileTopKHot {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpecBase.session
    val df = spark.range(10L * 1000 * 1000)
      .select(col("id"), pmod(col("id"), lit(100000L)).as("g"),
        pmod(col("id") * 2654435761L, lit(1000000L)).as("v"))
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = org.apache.spark.sql.graft.GraftPlans
        .groupTopK(df, Seq(col("g")), Seq(col("v").asc, col("id").asc), 5)
        .count()
      println(f"HOT run$i n=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
