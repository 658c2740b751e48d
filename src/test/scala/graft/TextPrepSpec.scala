package graft

import org.apache.spark.sql.functions._

import graft.text.TextPrep

class TextPrepSpec extends SparkSpecBase {
  import spark.implicits._

  test("redactPii scrubs emails, IPs and phone numbers") {
    val df = Seq(
      "contact bob@example.com or +1 (555) 123-4567",
      "server at 10.0.42.7 responded",
      "nothing sensitive here"
    ).toDF("t")
    val out = df.select(TextPrep.redactPii(col("t"))).as[String].collect().toSeq
    assert(out(0) === "contact <EMAIL> or <PHONE>")
    assert(out(1) === "server at <IP> responded")
    assert(out(2) === "nothing sensitive here")
  }

  test("sampleByTokenBudget: uniform hash order, prefix-monotone in the budget") {
    val docs = (1L to 40L).map(i => (i, if (i % 2 == 0) "a" else "b", "w " * i.toInt))
      .toDF("doc_id", "source", "text")
    val tokens = size(split(trim(col("text")), "\\s+"))
    def ids(budget: Long): Set[Long] =
      TextPrep.sampleByTokenBudget(docs, col("source"), col("doc_id"), tokens, budget)
        .select("doc_id").as[Long].collect().toSet
    val small = ids(50)
    val big = ids(200)
    // raising the budget only ADDS documents (pilot corpus grows into
    // the full run without resampling)
    assert(small.subsetOf(big), s"$small not within $big")
    assert(small.nonEmpty && big.size > small.size)
    // per group, the sample minus its straddling doc stays under budget
    val perGroup = TextPrep.sampleByTokenBudget(docs, col("source"), col("doc_id"), tokens, 50)
      .groupBy("source").agg(sum("n_tokens").as("t"), max("n_tokens").as("m"))
      .select("t", "m").as[(Long, Long)].collect()
    perGroup.foreach { case (t, m) => assert(t - m < 50, s"total $t max $m") }
  }

  test("removeFrequentGrams scrubs covered spans and drops emptied docs") {
    // "begin legal notice" appears in 3 docs → boilerplate at df>=3;
    // doc 4 is ONLY boilerplate and must disappear entirely
    val docs = Seq(
      (1L, "begin legal notice alpha beta gamma"),
      (2L, "delta begin legal notice epsilon"),
      (3L, "zeta eta theta iota kappa"),
      (4L, "begin legal notice")
    ).toDF("doc_id", "text")
    val out = TextPrep.removeFrequentGrams(docs, col("text"), col("doc_id"), n = 3, minDocFreq = 3)
      .select("doc_id", "clean_text", "n_kept").as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === (("alpha beta gamma", 3L)))
    assert(out(2L) === (("delta epsilon", 2L))) // mid-document span removed, order kept
    assert(out(3L) === (("zeta eta theta iota kappa", 5L))) // untouched
    assert(!out.contains(4L)) // fully-boilerplate doc removed
  }

  test("splitAssign is deterministic and roughly proportioned") {
    val df = spark.range(10000).select(col("id"))
    val counts = df.select(TextPrep.splitAssign(col("id")).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts("train") > 8500 && counts("train") < 9500) // ~90%
    assert(counts("val") > 250 && counts("val") < 750)       // ~5%
    // deterministic: same assignment on re-evaluation
    val twice = df.select(TextPrep.splitAssign(col("id")).as("a"), TextPrep.splitAssign(col("id")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(twice === 0L)
  }

  test("chunkTokens covers every token with the right overlap") {
    val text = (1 to 95).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text)).toDF("id", "t")
    val chunks = TextPrep.chunkTokens(df, col("t"), col("id"), chunkSize = 50, overlap = 10)
      .orderBy("chunk_id")
      .select("chunk_id", "chunk", "n_tokens").as[(Long, String, Long)].collect()
    assert(chunks.length === 3) // starts at 0, 40, 80
    assert(chunks(0)._2.startsWith("w1 ") && chunks(0)._3 === 50L)
    assert(chunks(1)._2.startsWith("w41 ") && chunks(1)._3 === 50L)
    assert(chunks(2)._2.startsWith("w81 ") && chunks(2)._3 === 15L) // partial tail kept
    // overlap: last 10 tokens of chunk 0 = first 10 of chunk 1
    assert(chunks(0)._2.split(" ").takeRight(10).toSeq === chunks(1)._2.split(" ").take(10).toSeq)
  }

  test("chunkTokens emits a single chunk for short docs") {
    val out = TextPrep.chunkTokens(Seq((1L, "a b c")).toDF("id", "t"), col("t"), col("id"), 50, 10)
      .select("chunk_id", "n_tokens").as[(Long, Long)].collect().toSeq
    assert(out === Seq((0L, 3L)))
  }

  test("repetitionRatio flags repeated-token documents") {
    val df = Seq(
      (1L, "spam spam spam spam ham"),
      (2L, "all tokens here are unique")
    ).toDF("id", "t")
    val out = TextPrep.repetitionRatio(df, col("t"), col("id"))
      .select("doc_id", "max_rep", "n_tokens", "rep_ratio")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 4L, 5L, 0.8)))
    assert(out(2L) === ((2L, 1L, 5L, 0.2)))
  }

  test("packByTokenBudget assigns batches by exclusive prefix sum per shard") {
    // shard A tokens in id order: 600, 500, 600, 500 → starts 0,600,1100,1700
    // budget 1000 → batches 0,0,1,1; shard B: 900,900 → starts 0,900 → 0,0
    val df = Seq(
      (1L, "A", 600L), (2L, "A", 500L), (3L, "A", 600L), (4L, "A", 500L),
      (5L, "B", 900L), (6L, "B", 900L)
    ).toDF("id", "shard", "tok")
    val out = TextPrep.packByTokenBudget(df, col("shard"), Seq(col("id")), col("tok"), 1000L)
      .select("id", "batch_id").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 0L, 6L -> 0L))
  }

  test("packByTokenBudget is partitioning-independent") {
    val df = (1L to 40L).map(i => (i, i % 4, 100L + i)).toDF("id", "shard", "tok")
    val a = TextPrep.packByTokenBudget(df, col("shard"), Seq(col("id")), col("tok"), 500L)
      .select("id", "batch_id").as[(Long, Long)].collect().toSet
    val b = TextPrep.packByTokenBudget(df.repartition(13), col("shard"), Seq(col("id")), col("tok"), 500L)
      .select("id", "batch_id").as[(Long, Long)].collect().toSet
    assert(a === b)
  }

  test("packSequences concatenates batch members in order, partition-invariant") {
    val df = Seq(
      (1L, 0L, "a b c"),   // 3 tokens
      (2L, 0L, "d e"),     // 2 -> cum 5, batch 0 full at budget 5
      (3L, 0L, "f"),       // batch 1
      (4L, 1L, "x y z w")  // other shard
    ).toDF("id", "shard", "txt")
    def run(d: org.apache.spark.sql.DataFrame) =
      TextPrep.packSequences(d, col("shard"), Seq(col("id")), col("txt"),
          graft.text.TextAnalysis.tokenCount(col("txt")), budget = 5L, sep = "\n")
        .select("shard", "batch_id", "n_docs", "n_tokens", "packed_text")
        .as[(Long, Long, Long, Long, String)].collect().toSet
    val out = run(df)
    assert(out === Set(
      (0L, 0L, 2L, 5L, "a b c\nd e"),
      (0L, 1L, 1L, 1L, "f"),
      (1L, 0L, 1L, 4L, "x y z w")))
    assert(run(df.repartition(7)) === out) // assignment + concat order stable
  }

  test("weightedSample keeps rows with probability ~ weight/threshold") {
    val df = spark.range(20000).select(col("id"), (col("id") % 100 + 1).as("w"))
    val kept = df.filter(TextPrep.weightedSample(col("id"), col("w"), threshold = 100))
    // E[keep] = mean(w/100) = 50.5% ± sampling noise
    val rate = kept.count().toDouble / 20000
    assert(rate > 0.48 && rate < 0.53, s"rate $rate")
    // weight ≥ threshold ⇒ always kept; weight = 0 ⇒ never kept
    assert(df.filter(col("w") === 100 && !TextPrep.weightedSample(col("id"), col("w"), 100)).count() === 0L)
    assert(spark.range(100).filter(TextPrep.weightedSample(col("id"), lit(0L), 100)).count() === 0L)
    // deterministic: same rows on a re-evaluation with different partitioning
    val a = kept.select("id").as[Long].collect().toSet
    val b = df.repartition(17).filter(TextPrep.weightedSample(col("id"), col("w"), 100))
      .select("id").as[Long].collect().toSet
    assert(a === b)
    // a weight past 2^35 must still mean "always keep" — unclamped it
    // would overflow BIGINT (non-ANSI) and silently DROP exactly the
    // heaviest rows
    assert(spark.range(100)
      .filter(!TextPrep.weightedSample(col("id"), lit(1L << 40), 100)).count() === 0L)
  }

  test("temperatureWeights flattens shares with exact alpha=0.5 math") {
    // tokens: A=900, B=100 → shares 0.9/0.1; weights sqrt → 0.9487/0.3162;
    // boost = weight/share → tail source B boosted ~3.16x, head damped
    val df = Seq(("A", 900L), ("B", 100L)).toDF("src", "tok")
    val out = TextPrep.temperatureWeights(df, col("src"), col("tok"))
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("A")._2 === 900L && out("B")._2 === 100L)
    assert(out("A")._3 === 0.9 && out("B")._3 === 0.1)
    assert(out("A")._4 === math.sqrt(0.9) && out("B")._4 === math.sqrt(0.1))
    assert(out("B")._5 > 3.16 && out("B")._5 < 3.17) // tail upsampled
    assert(out("A")._5 < 1.06)                       // head nearly flat
  }

  test("perplexityBuckets: per-language terciles, ordering invariant, partition") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextPrep.perplexityBuckets(docs, col("text"), col("doc_id"), col("lang"), 100L)
      .select(col("lang"), col("bucket"), col("mean_freq"))
      .as[(String, Int, Double)].collect()
    assert(out.length === docs.count()) // every doc bucketed exactly once
    out.groupBy(_._1).foreach { case (lang, rows) =>
      val byBucket = rows.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
      assert(byBucket.keySet === Set(1, 2, 3), s"$lang missing a bucket")
      // the >= cutoff rule makes the buckets strictly ordered slices
      assert(byBucket(1).min >= byBucket(2).max, s"$lang head/middle overlap")
      assert(byBucket(2).min >= byBucket(3).max, s"$lang middle/tail overlap")
      // terciles: balanced up to cutoff ties
      val n = rows.length
      assert(byBucket.values.forall(b => b.size >= n / 6), s"$lang badly skewed buckets")
    }
  }
}
