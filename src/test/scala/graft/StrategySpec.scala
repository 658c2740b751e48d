package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.graft.GraftPlans

class StrategySpec extends SparkSpecBase {
  import spark.implicits._

  private def randomDf = {
    val rnd = new scala.util.Random(7)
    // duplicate values on purpose: the (v desc, id asc) order is total
    Seq.fill(5000)((rnd.nextInt(20).toLong, rnd.nextInt(100).toLong))
      .zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
      .toDF("g", "v", "id")
      .repartition(16)
  }

  test("groupTopK equals the window row_number formulation") {
    val df = randomDf
    val custom = GraftPlans.groupTopK(df, Seq(col("g")), Seq(col("v").desc, col("id").asc), 5)
      .select("g", "v", "id").as[(Long, Long, Long)].collect().toSet
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val windowed = df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= 5)
      .select("g", "v", "id").as[(Long, Long, Long)].collect().toSet
    assert(custom === windowed)
    assert(custom.size === 20 * 5)
  }

  test("groupTopK plans as partial -> exchange -> final (bounded shuffle)") {
    val df = randomDf
    val plan = GraftPlans.groupTopK(df, Seq(col("g")), Seq(col("v").desc, col("id").asc), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GraftGroupTopKPartial"))
    assert(plan.contains("GraftGroupTopKFinal"))
    // partial runs BELOW the exchange: only <= k rows per (group, partition) shuffle
    val iPartial = plan.indexOf("GraftGroupTopKPartial")
    val iFinal = plan.indexOf("GraftGroupTopKFinal")
    val iExchange = plan.indexOf("Exchange")
    assert(iFinal < iExchange && iExchange < iPartial) // tree prints top-down
  }

  test("groupTopK handles k larger than group size and single groups") {
    val df = Seq((1L, 10L, 1L), (1L, 20L, 2L), (2L, 5L, 3L)).toDF("g", "v", "id")
    val out = GraftPlans.groupTopK(df, Seq(col("g")), Seq(col("v").desc), 10)
      .select("g", "id").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 1L), (1L, 2L), (2L, 3L))) // everything kept
  }

  test("partial-phase flush keeps results exact under a tiny memory bound") {
    val df = randomDf
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val expected = df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= 5)
      .select("g", "v", "id").as[(Long, Long, Long)].collect().toSet
    val key = org.apache.spark.sql.graft.GroupTopKStrategy.FlushConfKey
    spark.conf.set(key, "3") // flush every 3 groups — forces many partial flushes
    try {
      val custom = GraftPlans.groupTopK(df, Seq(col("g")), Seq(col("v").desc, col("id").asc), 5)
        .select("g", "v", "id").as[(Long, Long, Long)].collect().toSet
      assert(custom === expected)
    } finally spark.conf.unset(key)
  }
}
