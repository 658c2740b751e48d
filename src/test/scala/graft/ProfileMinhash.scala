package graft

// scratch profiler: sbt "Test/runMain graft.ProfileMinhash"
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = GraftSession.builder("prof", "local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = graft.sources.Tables.documents(spark, dir)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }
    t("warmup count")(docs.count())
    val gramsRaw = docs.select(col("doc_id"), explode(graft.dedup.Dedup.shinglesRaw(col("text"), 3)).as("g"))
    t("explode grams")(gramsRaw.count())
    val sig = graft.dedup.Dedup.minhashSignatures(docs, col("text"), col("doc_id"), 3, 8, portable = true)
    t("signatures md5")(sig.count())
    val sigFast = graft.dedup.Dedup.minhashSignatures(docs, col("text"), col("doc_id"), 3, 8, portable = false)
    t("signatures xxh")(sigFast.count())
    val pairs = graft.dedup.Dedup.minhashCandidatePairs(docs, col("text"), col("doc_id"), 3, 4, 2, portable = true)
    t("pairs full")(pairs.count())
    spark.stop()
  }
}
