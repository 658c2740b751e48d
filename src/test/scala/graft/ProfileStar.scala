package graft

// scratch: where does q_cluster_star spend time?
// sbt "Test/runMain graft.ProfileStar"
object ProfileStar {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = GraftSession.builder("profile-star", "local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm
    graft.queries.DedupQueries.queries("q_cluster_star")(spark, dir).count()

    val pairs = time("pairs (minhash)") {
      val p = graft.dedup.Dedup.minhashCandidatePairs(
        graft.sources.Tables.documents(spark, dir), col("text"), col("doc_id"),
        shingleN = 3, numBands = 4, rowsPerBand = 2, portable = true).localCheckpoint(true)
      println(s"  n_pairs=${p.count()}")
      p
    }
    time("star components")(
      graft.dedup.Components.connectedComponentsStar(pairs, "doc_a", "doc_b").count())
    time("label propagation")(
      graft.dedup.Components.connectedComponents(pairs, "doc_a", "doc_b").count())
    spark.stop()
  }
}
