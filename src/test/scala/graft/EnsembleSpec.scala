package graft

import org.apache.spark.sql.functions._

import graft.quality.Ensemble

/** RRF fusion: the distributed globalRank formulation must equal a
  * literal sequential replay of rank-then-reciprocal on random
  * signals, and the structural properties (calibration-freeness,
  * signal count) must hold. */
class EnsembleSpec extends SparkSpecBase {
  import spark.implicits._

  test("rrf equals the sequential replay on random integer signals") {
    val rnd = new scala.util.Random(13)
    val rows = (1L to 200L).map(i =>
      (i, rnd.nextInt(1000).toLong, rnd.nextInt(50).toLong))
    val df = rows.toDF("id", "a", "b").repartition(16)
    val got = Ensemble.rrf(df, col("id"), Seq("a" -> col("a"), "b" -> col("b")))
      .as[(Long, Long, Long)].collect().sortBy(_._1)

    def ranks(sig: Seq[(Long, Long)]): Map[Long, Long] =
      sig.sortBy { case (id, s) => (-s, id) }.zipWithIndex
        .map { case ((id, _), r) => id -> (r + 1L) }.toMap
    val ra = ranks(rows.map(t => (t._1, t._2)))
    val rb = ranks(rows.map(t => (t._1, t._3)))
    val want = rows.map(_._1).sorted.map(id =>
      (id, 1000000L / (60L + ra(id)) + 1000000L / (60L + rb(id)), 2L))
    assert(got.toSeq === want)
  }

  test("rrfSelect keeps exactly n best-fused docs and the ledger attributes drops") {
    val docs = (1L to 40L).map(i => (i, ("w " * i.toInt).trim)).toDF("doc_id", "text")
    val c = graft.Corpus(docs, col("text"), col("doc_id")).audited
      .rrfSelect(Seq("len" -> size(split(col("text"), " ")).cast("long")), n = 10)
    val kept = c.df.select("doc_id").as[Long].collect().toSet
    assert(kept === (31L to 40L).toSet) // single signal: top-10 by length
    val ledger = c.dropLedger.collect()
    assert(ledger.length === 30)
    assert(ledger.forall(_.getAs[String]("stage") == "rrf_select"))
  }

  test("rrf is calibration-free: scaling a signal leaves the fusion unchanged") {
    val rows = (1L to 50L).map(i => (i, i * 7 % 50, i * 13 % 50))
    val df = rows.toDF("id", "a", "b")
    val base = Ensemble.rrf(df, col("id"), Seq("a" -> col("a"), "b" -> col("b")))
      .as[(Long, Long, Long)].collect().toSet
    val scaled = Ensemble.rrf(df, col("id"),
        Seq("a" -> (col("a") * 1000 + 7), "b" -> col("b")))
      .as[(Long, Long, Long)].collect().toSet
    assert(base === scaled) // only orderings matter, monotone transforms are free
  }
}
