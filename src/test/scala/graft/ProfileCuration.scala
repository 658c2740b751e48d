package graft

import org.apache.spark.sql.functions._

// scratch: decompose q_curation's big checkpoint job.
//   sbt "Test/runMain graft.ProfileCuration"
object ProfileCuration {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("prof_cur").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = graft.sources.Tables.documents(spark, dir)
    import graft.queries.PrepParams
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label%-44s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      graft.operators.Checkpoints.releaseAll()
    }
    val gp = graft.quality.HeuristicRules.gopherPass(
      col("text"), PrepParams.GopherMinWords, PrepParams.GopherMaxWords)
    for (i <- 1 to 2) {
      time(s"r$i scan count")(docs.count())
      time(s"r$i gopher filter count")(docs.filter(gp).count())
      time(s"r$i gopher + exactDedup count") {
        graft.Corpus(docs, col("text"), col("doc_id"))
          .gopherQualityFilter(PrepParams.GopherMinWords, PrepParams.GopherMaxWords)
          .exactDedup().df.count()
      }
      time(s"r$i cleaned checkpoint") {
        val c = graft.operators.Checkpoints.eager(
          graft.Corpus(docs, col("text"), col("doc_id"))
            .gopherQualityFilter(PrepParams.GopherMinWords, PrepParams.GopherMaxWords)
            .exactDedup().df)
        graft.operators.Checkpoints.release(c)
      }
      time(s"r$i full q_curation") {
        SparkEntry.queries("q_curation")(spark, dir).count()
      }
    }
    spark.stop()
  }
}
