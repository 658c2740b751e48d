package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.sources.Tables

// scratch: where does q_dedup_ngram time go? sbt "Test/runMain graft.ProfileNgram"
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("prof", "local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$label%-28s run$i ${(System.nanoTime() - t0) / 1e9}%6.2fs  rows=$n")
      }
    val docs = Tables.documents(spark, dir)
    time("explode shingles")(docs.select(col("doc_id"), explode(Dedup.shinglesRaw(col("text"), 3)).as("g")).count())
    time("g0 = distinct grams")(docs.select(col("doc_id"), explode(Dedup.shinglesRaw(col("text"), 3)).as("g")).distinct().count())
    time("full ngramJaccardPairs")(Dedup.ngramJaccardPairs(docs, col("text"), col("doc_id"), 3, 0.5).count())
    spark.stop()
  }
}
