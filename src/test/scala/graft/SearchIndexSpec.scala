package graft

import org.apache.spark.sql.functions._
import graft.text.{Search, SearchIndex}

/** The persisted postings index must be probe-identical to the
  * fresh-tokenize path AND deliver the at-scale property it exists
  * for: probes read the bucketed postings layout without re-tokenizing
  * or shuffling the corpus side. */
class SearchIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")

  private def phrases = Search.topPhrases(docs, col("text"), n = 3, k = 5)

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long)] =
    df.select("phrase", "doc_id", "n_occurrences").as[(String, Long, Long)].collect().toSet

  private def withIndex(nBuckets: Int)(body: String => Unit): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft_si").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_si LOCATION '$wh'")
    try {
      SearchIndex.create(docs, col("text"), col("doc_id"), "graft_si.idx", nBuckets)
      body("graft_si.idx")
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graft_si CASCADE")
    }
  }

  test("probe through the index is bit-identical to phraseOccurrences") {
    withIndex(4) { table =>
      val viaIndex = SearchIndex.probe(spark, table, phrases, col("phrase"), col("phrase"))
      val fresh = Search.phraseOccurrences(docs, col("text"), col("doc_id"),
        phrases, col("phrase"), col("phrase"))
      assert(rows(viaIndex) === rows(fresh))
      assert(rows(viaIndex).nonEmpty)
    }
  }

  test("append ingests a drop's postings; its occurrences are findable; a replay changes nothing") {
    withIndex(4) { table =>
      val target = phrases.orderBy(col("phrase").asc).limit(1)
        .as[String].head()
      val drop = Seq((999999L, s"zz $target zz $target zz")).toDF("doc_id", "text")
      SearchIndex.append(drop, col("text"), col("doc_id"), table, dropId = "d1")
      def occ() = SearchIndex.probe(spark, table, phrases, col("phrase"), col("phrase"))
        .filter(col("doc_id") === 999999L)
        .select("phrase", "n_occurrences").as[(String, Long)].collect().toSeq
      assert(occ() === Seq((target, 2L)))
      // a crash-retried (replayed) append overwrites its own drop_id
      // partition — occurrence counts do NOT double
      SearchIndex.append(drop, col("text"), col("doc_id"), table, dropId = "d1")
      assert(occ() === Seq((target, 2L)))
      assert(spark.table(table).filter(col("drop_id") === "d1").count() ===
        spark.table(table).filter(col("drop_id") === "d1")
          .dropDuplicates("doc_id", "pos").count())
    }
  }

  test("bm25Probe through the stats index is bit-identical to the scan path") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bm").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bm LOCATION '$wh'")
    try {
      val terms = Seq("dup", "spark", "merge")
      SearchIndex.createBm25(docs, col("text"), col("doc_id"), "graft_bm.tf", 4)
      val viaIndex = SearchIndex.bm25Probe(spark, "graft_bm.tf", terms, topK = 15)
        .as[(Long, Long, Int)].collect().toSeq
      val fresh = Search.bm25Rank(docs, col("text"), col("doc_id"), terms, 15)
        .as[(Long, Long, Int)].collect().toSeq
      assert(viaIndex === fresh)
      assert(viaIndex.nonEmpty)

      // append a drop stuffed with a query term: it must outrank
      // everything, and the probe must equal a fresh rank over the
      // UNION corpus (stats ledger summed, df/idf shifted corpus-wide)
      val drop = Seq((999999L, "dup dup dup dup")).toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("drop"))
        .withColumn("n_chars", lit(15L))
      SearchIndex.appendBm25(drop, col("text"), col("doc_id"), "graft_bm.tf", "d1")
      val after = SearchIndex.bm25Probe(spark, "graft_bm.tf", terms, topK = 15)
        .as[(Long, Long, Int)].collect().toSeq
      val freshUnion = Search.bm25Rank(
        docs.select("doc_id", "text").unionByName(drop.select("doc_id", "text")),
        col("text"), col("doc_id"), terms, 15)
        .as[(Long, Long, Int)].collect().toSeq
      assert(after === freshUnion)
      assert(after.head._1 === 999999L, "the stuffed drop doc must rank first")
      // a replayed append is a no-op: same partitions overwritten, the
      // probe stays bit-equal (no double-counted tf rows or stats)
      SearchIndex.appendBm25(drop, col("text"), col("doc_id"), "graft_bm.tf", "d1")
      assert(SearchIndex.bm25Probe(spark, "graft_bm.tf", terms, topK = 15)
        .as[(Long, Long, Int)].collect().toSeq === after)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graft_bm CASCADE")
    }
  }

  test("compact consolidates postings and the bm25 pair to one base partition; probes bit-equal") {
    withIndex(4) { table =>
      val drop = Seq((999999L, "zz graft graft zz")).toDF("doc_id", "text")
      SearchIndex.append(drop, col("text"), col("doc_id"), table, dropId = "d1")
      val before = rows(SearchIndex.probe(spark, table, phrases, col("phrase"), col("phrase")))
      val filesBefore = spark.table(table).inputFiles.length
      val st = SearchIndex.compact(spark, table)
      assert(st.partitionsBefore === 2 && st.partitionsAfter === 1)
      assert(spark.sql(
          s"SHOW PARTITIONS ${graft.sources.LiveTable.resolve(spark, table)}")
        .collect().map(_.getString(0)).toSeq === Seq("drop_id=base"))
      assert(spark.table(table).inputFiles.length < filesBefore)
      assert(spark.table(table).inputFiles.length <= 4)
      assert(rows(SearchIndex.probe(spark, table, phrases, col("phrase"), col("phrase")))
        === before)
    }
    // the bm25 pair: tf table back to one file per bucket, stats ledger
    // to ONE summed row — probe bit-equal through both passes
    val wh = java.nio.file.Files.createTempDirectory("graft_bmcp").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bmcp LOCATION '$wh'")
    try {
      val terms = Seq("dup", "spark", "merge")
      SearchIndex.createBm25(docs, col("text"), col("doc_id"), "graft_bmcp.tf", 4)
      val drop = Seq((999999L, "dup dup dup dup")).toDF("doc_id", "text")
      SearchIndex.appendBm25(drop, col("text"), col("doc_id"), "graft_bmcp.tf", "d1")
      val before = SearchIndex.bm25Probe(spark, "graft_bmcp.tf", terms, topK = 15)
        .as[(Long, Long, Int)].collect().toSeq
      val (tf, stS) = SearchIndex.compactBm25(spark, "graft_bmcp.tf")
      assert(tf.partitionsAfter === 1 && stS.partitionsAfter === 1)
      assert(spark.table("graft_bmcp.tf_stats").count() === 1L,
        "the stats ledger compacts to one summed row")
      assert(SearchIndex.bm25Probe(spark, "graft_bmcp.tf", terms, topK = 15)
        .as[(Long, Long, Int)].collect().toSeq === before)
      // later appends keep working and stay bit-consistent
      val drop2 = Seq((999998L, "merge merge merge")).toDF("doc_id", "text")
      SearchIndex.appendBm25(drop2, col("text"), col("doc_id"), "graft_bmcp.tf", "d2")
      val freshUnion = Search.bm25Rank(
        docs.select("doc_id", "text").unionByName(drop).unionByName(drop2),
        col("text"), col("doc_id"), terms, 15).as[(Long, Long, Int)].collect().toSeq
      assert(SearchIndex.bm25Probe(spark, "graft_bmcp.tf", terms, topK = 15)
        .as[(Long, Long, Int)].collect().toSeq === freshUnion)
    } finally spark.sql("DROP DATABASE IF EXISTS graft_bmcp CASCADE")
  }

  test("a crash between appendBm25's tf and stats writes is refused loudly and the replay heals") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bmc").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bmc LOCATION '$wh'")
    try {
      val terms = Seq("dup", "spark", "merge")
      SearchIndex.createBm25(docs, col("text"), col("doc_id"), "graft_bmc.tf", 4)
      val drop = Seq((999999L, "dup dup merge")).toDF("doc_id", "text")
      // simulated crash: tf partition landed, stats-ledger row did not
      SearchIndex.failBetweenBm25Writes = true
      val e = intercept[RuntimeException](
        SearchIndex.appendBm25(drop, col("text"), col("doc_id"), "graft_bmc.tf", "d1"))
      assert(e.getMessage.contains("simulated crash"))
      SearchIndex.failBetweenBm25Writes = false
      // the torn index refuses to rank — the old code would silently
      // score the new tf rows against a stale (n, tl)
      val torn = intercept[IllegalArgumentException](
        SearchIndex.bm25Probe(spark, "graft_bmc.tf", terms, topK = 15))
      assert(torn.getMessage.contains("torn"), torn.getMessage)
      // replaying the SAME append heals: both partitions overwritten,
      // probe bit-equal to a fresh whole-union build
      SearchIndex.appendBm25(drop, col("text"), col("doc_id"), "graft_bmc.tf", "d1")
      val healed = SearchIndex.bm25Probe(spark, "graft_bmc.tf", terms, topK = 15)
        .as[(Long, Long, Int)].collect().toSeq
      val freshUnion = Search.bm25Rank(
        docs.select("doc_id", "text")
          .unionByName(drop.select("doc_id", "text")),
        col("text"), col("doc_id"), terms, 15)
        .as[(Long, Long, Int)].collect().toSeq
      assert(healed === freshUnion)
    } finally {
      SearchIndex.failBetweenBm25Writes = false
      spark.sql("DROP DATABASE IF EXISTS graft_bmc CASCADE")
    }
  }

  test("probe plans: broadcast vocabulary = zero exchanges; huge vocabulary = bucketed scan") {
    // occurrencesFromPostings checkpoints the vocabulary-pruned
    // postings, so the final probe plan reads the checkpoint; the
    // at-scale properties live in the PRUNING plan. Two regimes:
    withIndex(4) { table =>
      val vocab = phrases.select(xxhash64(col("phrase")).as("t1"),
        xxhash64(lit(7L), col("phrase")).as("t2"))
      // (a) normal probe: the vocabulary broadcasts — the postings
      // side reaches the semi-join with NO exchange of any kind
      val bPlan = spark.table(table)
        .join(broadcast(vocab), Seq("t1", "t2"), "left_semi")
        .queryExecution.executedPlan.toString
      // (the vocabulary DERIVATION aggregates — what must not appear
      // is any exchange keyed on the postings fingerprints)
      assert(!"Exchange hashpartitioning\\(t1".r.findAllIn(bPlan).hasNext,
        s"broadcast probe must not exchange the postings:\n$bPlan")
      assert(!bPlan.contains("posexplode"), "pruning must not re-tokenize")
      // (b) a vocabulary too big to broadcast: the bucket layout
      // absorbs the postings-side exchange — only the vocab shuffles
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plan = spark.table(table)
          .join(vocab, Seq("t1", "t2"), "left_semi")
          .queryExecution.executedPlan.toString
        val scanLine = plan.linesIterator
          .find(l => l.contains("FileScan") && l.contains("idx")).getOrElse("")
        assert(scanLine.contains("Bucketed: true"),
          s"postings scan should use the bucket layout:\n$plan")
        val exchanges = "Exchange hashpartitioning\\(t1".r.findAllIn(plan).length
        assert(exchanges === 1,
          s"only the vocabulary side may shuffle into the buckets:\n$plan")
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
