package graft

// scratch profiler: sbt "Test/runMain graft.ProfilePhash"
// A/B of the native AHash64 expression vs the composed HOF+hex
// formulation it replaced (hash-only, no dedup shuffle).
object ProfilePhash {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = GraftSession.builder("prof", "local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("m"))
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }
    t("warmup count")(docs.count())
    def hof = docs.filter(octet_length(col("m")) > 0)
      .select(col("doc_id"), col("m").as("__m"), octet_length(col("m")).cast("long").as("__n"))
      .withColumn("__s", expr(
        "transform(sequence(0, 63), i -> " +
          "CAST(conv(hex(substring(__m, CAST((i * __n) DIV 64 AS INT) + 1, 1)), 16, 10) AS BIGINT))"))
      .withColumn("__t", expr("aggregate(__s, CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .select(col("doc_id"), expr(
        "array_join(transform(__s, v -> CASE WHEN v * 64 > __t THEN '1' ELSE '0' END), '')").as("ahash"))
    def native = graft.multimodal.Multimodal.aHash(docs, col("m"), col("doc_id"))
    (1 to 3).foreach { i =>
      t(s"hof pass $i")(hof.count())
      t(s"native pass $i")(native.count())
    }
    spark.stop()
  }
}
