package graft

// scratch: warm repeated timings of the heavy queries; sbt "Test/runMain graft.ProfileTop"
object ProfileTop {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("prof", "local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val names = Seq("q_dedup_ngram", "q_dedup_minhash", "q_ann_lsh", "q_dedup_simhash", "q_star_join")
    for (n <- names; i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).count()
      println(f"$n%-20s run$i ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    spark.stop()
  }
}
