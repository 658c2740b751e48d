package graft

import org.apache.spark.sql.functions._
import graft.similarity.{IvfAnn, Similarity}

/** Manual recall profiler (not a test): prints the recall curve that
  * IvfRecallSpec's thresholds are calibrated from. */
object ProfileIvf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpecBase.session
    import spark.implicits._
    val corpus = Similarity.prepareQuantized(
      graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01"),
      col("embedding"), col("vec_id"), col("label"))
    val qs = corpus.filter(col("vec_id") % 20 === 0)
    val brute = Similarity.cosineTopK(corpus, qs, 5)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    for (iters <- Seq(1, 2); np <- Seq(1, 2, 4, 8, 16)) {
      val ivf = IvfAnn.annIvf(corpus, qs, k = 5, numCentroids = 16, nprobe = np, lloydIters = iters)
        .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val recall = (ivf intersect brute).size.toDouble / brute.size
      println(f"PROFILE iters=$iters nprobe=$np%2d recall=$recall%.3f")
    }
    spark.stop()
  }
}
