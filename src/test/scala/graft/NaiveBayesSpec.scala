package graft

import org.apache.spark.sql.functions._

import graft.quality.NaiveBayes

/** Trained Naive-Bayes probe: qlog64 exactness, separable-fixture
  * learning, resubstitution scoring shape, tie-break determinism, and
  * the Corpus facade gate (q_nb_quality / q_nb_confusion are the
  * oracle gates for the full sf replay). */
class NaiveBayesSpec extends SparkSpecBase {
  import spark.implicits._

  // -- qlog64: the fixed-point chord log -----------------------------

  test("qlog64 is exact on powers of two and within chord error elsewhere") {
    val xs = Seq(1L, 2L, 3L, 7L, 8L, 1000L, 1048576L, 1L << 40, (1L << 41) - 1)
    val got = xs.toDF("x").select(col("x"), NaiveBayes.qlog64(col("x")).as("q"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L) === 0L)
    assert(got(2L) === 64L)
    assert(got(8L) === 192L)
    assert(got(1048576L) === 64L * 20)
    assert(got(1L << 40) === 64L * 40)
    // chord under-approximates log2 by at most 0.0861 bit → 5.6 units
    for (x <- xs) {
      val exact = 64.0 * (math.log(x.toDouble) / math.log(2.0))
      assert(got(x) <= exact + 1e-6, s"x=$x")
      assert(got(x) >= exact - 6.6, s"x=$x") // 5.6 chord + 1 floor
    }
  }

  test("qlog64 is monotone non-decreasing") {
    val xs = (1L to 300L) ++ Seq(1L << 20, (1L << 20) + 1, 1L << 39)
    val got = xs.toDF("x").select(NaiveBayes.qlog64(col("x")).as("q"))
      .as[Long].collect()
    assert(got.zip(got.tail).forall { case (a, b) => a <= b })
  }

  // -- learning on a separable fixture -------------------------------

  private def fixture = Seq(
    (1L, "apple banana apple cherry apple", "fruit"),
    (2L, "banana apple banana banana cherry", "fruit"),
    (3L, "apple cherry cherry banana apple", "fruit"),
    (5L, "bolt nut bolt washer nut bolt", "hardware"),
    (6L, "nut washer washer bolt nut nut", "hardware"),
    (7L, "washer bolt nut washer washer", "hardware")
  ).toDF("doc_id", "text", "label")

  test("classifier separates disjoint-vocabulary classes perfectly") {
    val f = fixture
    val out = NaiveBayes.classify(
      f, col("text"), col("doc_id"), col("label"),
      f, col("text"), col("doc_id"), col("label"))
      .select("doc_id", "true_label", "pred_label", "correct")
      .as[(Long, String, String, Int)].collect().sortBy(_._1)
    assert(out.length === 6)
    assert(out.forall(r => r._2 === r._3 && r._4 === 1))
  }

  test("held-out scoring only emits the held-out slice") {
    val f = fixture
    // holdMod 5 → doc_ids 5 (and 0 if present) are held out
    val out = NaiveBayes.holdoutProbe(f, col("text"), col("doc_id"), col("label"), holdMod = 5)
    assert(out.select("doc_id").as[Long].collect().toSet === Set(5L))
  }

  test("holdoutCalibration bins margins, partitions the held-out slice, exact integer accuracy") {
    // hold out docs 3 and 6 (mod 3): both score against the
    // disjoint-vocabulary model with a large positive margin → one
    // populated high-confidence region, every doc correct
    val out = NaiveBayes.holdoutCalibration(
      fixture, col("text"), col("doc_id"), col("label"), holdMod = 3, marginWidth = 64L)
      .select("margin_bin", "n", "n_correct", "acc_pm")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.map(_._2).sum === 2L) // every held-out doc lands in exactly one bin
    out.foreach { case (_, n, ok, pm) =>
      assert(ok === n && pm === 1000L)
    }
    // a misleading score must show up as sub-1000 acc_pm: flip one
    // held-out doc's label so its (confident) prediction is wrong
    val flipped = fixture.withColumn("label",
      when(col("doc_id") === 3L, lit("hardware")).otherwise(col("label")))
    val bad = NaiveBayes.holdoutCalibration(
      flipped, col("text"), col("doc_id"), col("label"), holdMod = 3, marginWidth = 64L)
      .select("n", "n_correct").as[(Long, Long)].collect()
    assert(bad.map(_._1).sum === 2L && bad.map(_._2).sum === 1L)
  }

  test("unseen-vocabulary doc falls back to priors with ASC tie-break") {
    // 'zzz' hashes to some bucket; both classes have symmetric counts
    // for it (zero), class masses are equal (15 tokens each), and doc
    // counts are equal → scores tie exactly → smallest label wins.
    val test = Seq((9L, "zzz", "fruit")).toDF("doc_id", "text", "label")
    val out = NaiveBayes.classify(
      fixture, col("text"), col("doc_id"), col("label"),
      test, col("text"), col("doc_id"), col("label"))
      .select("pred_label").as[String].collect()
    assert(out.toSeq === Seq("fruit")) // 'fruit' < 'hardware'
  }

  test("scores are integers reproducible across two runs (determinism)") {
    val run = () => NaiveBayes.classify(
      fixture, col("text"), col("doc_id"), col("label"),
      fixture, col("text"), col("doc_id"), col("label"))
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    assert(run() === run())
  }

  test("model frame round-trips parquet and scores identically (persistable model)") {
    val f = fixture
    val m = graft.quality.NaiveBayes.model(f, col("text"), col("doc_id"), col("label"))
    val dir = java.nio.file.Files.createTempDirectory("nb_model").toString
    m.write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    val direct = graft.quality.NaiveBayes
      .scoreAgainst(f, col("text"), col("doc_id"), m)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    val viaDisk = graft.quality.NaiveBayes
      .scoreAgainst(f, col("text"), col("doc_id"), reloaded)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(viaDisk === direct)
    assert(m.count() === 2L * 256) // full grid: every (class, bucket) pair
  }

  // -- Corpus facade gate --------------------------------------------

  test("nbLabelFilter keeps exactly the self-consistent docs and ledgers the rest") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val c = Corpus(docs, col("text"), col("doc_id")).audited
      .nbLabelFilter(col("lang"))
    val keptIds = c.df.select("doc_id").as[Long].collect().toSet
    val manual = NaiveBayes.classify(
      docs, col("text"), col("doc_id"), col("lang"),
      docs, col("text"), col("doc_id"), col("lang"))
    val selfConsistent = manual.filter(col("correct") === 1)
      .select("doc_id").as[Long].collect().toSet
    assert(keptIds === selfConsistent)
    val ledger = c.dropLedger.select("doc_id").as[Long].collect().toSet
    val all = docs.select("doc_id").as[Long].collect().toSet
    assert(ledger === (all -- keptIds))
    assert(c.dropLedger.select("stage").distinct().as[String].collect().toSet
      === (if (ledger.isEmpty) Set.empty[String] else Set("nb_label_filter")))
  }
}
