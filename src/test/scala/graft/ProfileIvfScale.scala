package graft

// scratch profiler: sbt "Test/runMain graft.ProfileIvfScale"
// recall-vs-nprobe at sf0.1 with the suggestCentroids (√N) sizing
object ProfileIvfScale {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.similarity.{IvfAnn, Similarity}
    val spark = GraftSession.builder("prof", "local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val corpus = Similarity.prepareQuantized(
      graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.1"),
      col("embedding"), col("vec_id"), col("label"))
    val n = corpus.count()
    val cells = IvfAnn.suggestCentroids(n)
    println(s"N=$n suggested cells=$cells")
    val k = 5
    val qs = corpus.filter(col("vec_id") % 100 === 0)
    val brute = Similarity.cosineTopK(corpus, qs, k)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    for (nprobe <- Seq(cells / 8, cells / 4, cells / 2, 32, cells)) {
      val t0 = System.nanoTime()
      val ivf = IvfAnn.annIvf(corpus, qs, k, cells, nprobe, lloydIters = 2)
        .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val r = (ivf intersect brute).size.toDouble / brute.size
      println(f"nprobe=$nprobe%3d recall@$k = $r%.3f  (${(System.nanoTime()-t0)/1e9}%.1fs)")
      graft.operators.Checkpoints.releaseAll()
    }
    spark.stop()
  }
}
