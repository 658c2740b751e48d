package graft

// Manual end-to-end drive of the CLI surface incl. gzip round-trips;
// invoked via: sbt "Test/runMain graft.DriveCli"
object DriveCli {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions.{col, expr, md5}
    val tmp = "/tmp/drive_cli"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))

    // seed input: jsonl written by the library
    locally {
      val spark = GraftSession.builder("seed", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      val df = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("id", "v")
      graft.sources.PartitionedFiles.writeJsonl(df, s"$tmp/in", 2)
      spark.stop()
    }

    // CLI: map with gzip output
    Cli.main(Array("-i", s"$tmp/in", "-f", "json", "--schema", "id long, v long",
      "partition.map", "--expr", "id, v * 2 AS v2", "--outfile", s"$tmp/gz", "--codec", "gzip"))
    val gzFiles = new java.io.File(s"$tmp/gz").listFiles().filter(_.getName.endsWith(".json.gz"))
    println("GZ_FILES=" + gzFiles.length)

    // CLI: read the gzipped output transparently, aggregate
    Cli.main(Array("-i", s"$tmp/gz", "-f", "json", "--schema", "id long, v2 long",
      "partition.reduce", "--aggs", "sum(v2) AS s, count(1) AS n", "--outfile", s"$tmp/agg"))

    locally {
      val spark = GraftSession.builder("verify", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val out = graft.sources.PartitionedFiles
        .readJsonl(spark, s"$tmp/agg", Some("s long, n long")).select(col("s"), col("n")).head()
      println("AGG=" + out) // expect [200,4]
      spark.stop()
    }

    // CLI: join the mapped output back to the original by id
    Cli.main(Array("-i", s"$tmp/in", "-f", "json", "--schema", "id long, v long",
      "partition.join", "--with", s"$tmp/gz", "--with-schema", "id long, v2 long",
      "--key", "id", "--with-key", "id", "--outfile", s"$tmp/joined"))
    locally {
      val spark = GraftSession.builder("verifyJ", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val rows = graft.sources.PartitionedFiles
        .readJsonl(spark, s"$tmp/joined", Some("id long, v long, with_id long, v2 long"))
        .select(col("id"), col("v"), col("v2")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      println("JOINED=" + rows.mkString(",")) // expect v2 = 2v for 4 rows
      spark.stop()
    }

    // CLI: keyed distinct (shmr distinct-by-key; deterministic keeper)
    Cli.main(Array("-i", s"$tmp/in", "-f", "json", "--schema", "id long, v long",
      "partition.distinct", "--expr", "id % 2 AS parity, id, v",
      "--key", "parity", "--order", "id", "--outfile", s"$tmp/dk"))
    locally {
      val spark = GraftSession.builder("verifyD", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val rows = graft.sources.PartitionedFiles
        .readJsonl(spark, s"$tmp/dk", Some("parity long, id long, v long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      println("DISTINCT_BY=" + rows.mkString(",")) // expect (0,2,20),(1,1,10)
      spark.stop()
    }

    // CLI: apply (side-effect stream; reports the record count)
    Cli.main(Array("-i", s"$tmp/in", "-f", "json", "--schema", "id long, v long",
      "partition.apply", "--expr", "assert_true(v >= 0)"))

    // CLI over columnar input: aggregate the real parquet region table
    Cli.main(Array("-i", "/root/testdata/sf0.001/region.parquet", "-f", "parquet",
      "partition.reduce", "--aggs", "count(1) AS n", "--outfile", s"$tmp/pq", "--codec", "snappy"))
    locally {
      val spark = GraftSession.builder("verify2", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val n = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/pq").head().getLong(0)
      println("PARQUET_N=" + n) // expect 5 regions
      spark.stop()
    }

    // ---- LLM-pipeline verbs over the real sf0.001 documents table ----
    val docs = "/root/testdata/sf0.001/documents.parquet"

    // dedup-minhash (keep-one representative per near-dup cluster)
    Cli.main(Array("-i", docs, "-f", "parquet",
      "dedup-minhash", "--text", "text", "--id", "doc_id",
      "--outfile", s"$tmp/deduped"))
    // and the raw candidate pairs
    Cli.main(Array("-i", docs, "-f", "parquet",
      "dedup-minhash", "--text", "text", "--id", "doc_id", "--emit", "pairs",
      "--outfile", s"$tmp/pairs"))
    // and the quality-aware keeper (longest text per cluster, id tiebreak)
    Cli.main(Array("-i", docs, "-f", "parquet",
      "dedup-minhash", "--text", "text", "--id", "doc_id", "--emit", "keep-best",
      "--order", "length(text) DESC, doc_id", "--outfile", s"$tmp/dedupedBest"))
    locally {
      val spark = GraftSession.builder("verifyDedup", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val kept = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/deduped")
      val keptBest = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/dedupedBest")
      val pairs = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/pairs")
      val expectKept = graft.dedup.Components.keepOnePerCluster(
        in, col("doc_id"),
        graft.dedup.Dedup.minhashCandidatePairs(in, col("text"), col("doc_id")),
        "doc_a", "doc_b").count()
      // keep-best keeps exactly one row per cluster too — same count,
      // possibly different representatives
      println(s"DEDUP_KEEP=${kept.count()} EXPECT=$expectKept " +
        s"KEEP_BEST=${keptBest.count()} PAIRS=${pairs.count()} IN=${in.count()}")
      spark.stop()
    }

    // pack (token-budget batching per shard)
    Cli.main(Array("-i", docs, "-f", "parquet",
      "pack", "--text", "text", "--id", "doc_id", "--shard", "pmod(doc_id, 8)",
      "--budget", "2000", "--outfile", s"$tmp/packed"))
    locally {
      val spark = GraftSession.builder("verifyPack", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import org.apache.spark.sql.functions.{max => smax, sum => ssum}
      val packed = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/packed")
      // a batch may exceed the budget only via its last (straddling)
      // doc: total minus the largest member must stay under budget
      val overBudget = packed.groupBy("shard", "batch_id")
        .agg(ssum("n_tokens").as("t"), smax("n_tokens").as("m"))
        .filter(col("t") - col("m") >= 2000L).count()
      val nBatches = packed.select("shard", "batch_id").distinct().count()
      println(s"PACK_ROWS=${packed.count()} BATCHES=$nBatches OVER=$overBudget")
      spark.stop()
    }

    // decontam (drop corpus docs overlapping the "benchmark" = every
    // 50th doc, exported first)
    locally {
      val spark = GraftSession.builder("seedBench", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val bench = graft.sources.PartitionedFiles.readParquet(spark, docs)
        .filter(col("doc_id") % 50 === 0)
      graft.sources.PartitionedFiles.writeParquet(bench, s"$tmp/bench", 1)
      spark.stop()
    }
    Cli.main(Array("-i", docs, "-f", "parquet",
      "decontam", "--bench", s"$tmp/bench", "--text", "text", "--id", "doc_id",
      "--min-hits", "3", "--outfile", s"$tmp/decontaminated"))
    locally {
      val spark = GraftSession.builder("verifyDecontam", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val n = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/decontaminated").count()
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val expected = graft.dedup.Decontam.decontaminate(
        in, col("text"), col("doc_id"),
        in.filter(col("doc_id") % 50 === 0), col("text"), col("doc_id"),
        n = 3, minHits = 3).count()
      println(s"DECONTAM=$n EXPECT=$expected")
      spark.stop()
    }

    // boilerplate (frequent-gram scrub)
    Cli.main(Array("-i", docs, "-f", "parquet",
      "boilerplate", "--text", "text", "--id", "doc_id", "--min-doc-freq", "5",
      "--outfile", s"$tmp/scrubbed"))
    locally {
      val spark = GraftSession.builder("verifyBp", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val out = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/scrubbed")
      val kept = out.agg(org.apache.spark.sql.functions.sum("n_kept")).head().getLong(0)
      println(s"BOILERPLATE_DOCS=${out.count()} TOKENS_KEPT=$kept")
      spark.stop()
    }

    // scrub-spans (exact substring dedup, both emit modes)
    Cli.main(Array("-i", docs, "-f", "parquet",
      "scrub-spans", "--text", "text", "--id", "doc_id", "--window", "8",
      "--outfile", s"$tmp/despanned"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "scrub-spans", "--text", "text", "--id", "doc_id", "--window", "8",
      "--emit", "spans", "--outfile", s"$tmp/spans"))
    locally {
      val spark = GraftSession.builder("verifySpans", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val clean = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/despanned")
      val spans = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/spans")
      // library-call parity on the same input
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val lib = graft.dedup.SubstringDedup
        .scrubDuplicatedSpans(in, col("text"), col("doc_id"), 8)
      val cliKept = clean.agg(org.apache.spark.sql.functions.sum("n_kept")).head().getLong(0)
      val libKept = lib.agg(org.apache.spark.sql.functions.sum("n_kept")).head().getLong(0)
      println(s"SCRUB_SPANS docs=${clean.count()} spans=${spans.count()} OK=${cliKept == libKept}")
      spark.stop()
    }

    // validate (data-quality expectations in one pass)
    Cli.main(Array("-i", docs, "-f", "parquet",
      "validate", "--not-null", "doc_id,text", "--unique", "doc_id",
      "--check", "length(text) > 0; doc_id >= 0",
      "--outfile", s"$tmp/validated"))
    locally {
      val spark = GraftSession.builder("verifyVal", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val rules = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/validated")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      println(s"VALIDATE=$rules ALL_CLEAN=${rules.values.forall(_ == 0L)} N_RULES=${rules.size}")
      spark.stop()
    }

    // sample-tokens (deterministic per-source token budget)
    Cli.main(Array("-i", docs, "-f", "parquet",
      "sample-tokens", "--text", "text", "--id", "doc_id", "--group", "source",
      "--budget", "500", "--outfile", s"$tmp/sampled"))
    locally {
      val spark = GraftSession.builder("verifySample", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val out = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/sampled")
      val n = out.count()
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val expected = graft.text.TextPrep.sampleByTokenBudget(
        in, col("source"), col("doc_id"),
        graft.text.TextAnalysis.tokenCount(col("text")), 500L).count()
      println(s"SAMPLE_TOKENS=$n EXPECT=$expected OF=${in.count()}")
      spark.stop()
    }

    // split-assign (deterministic train/val/test)
    Cli.main(Array("-i", docs, "-f", "parquet",
      "split-assign", "--key", "doc_id", "--outfile", s"$tmp/split"))
    locally {
      val spark = GraftSession.builder("verifySplit", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val out = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/split")
      val byCli = out.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val byLib = in.withColumn("split", graft.text.TextPrep.splitAssign(col("doc_id")))
        .groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      println(s"SPLIT_CLI=$byCli MATCH=${byCli == byLib}")
      spark.stop()
    }

    // lm-score (unigram-LM quality proxy)
    Cli.main(Array("-i", docs, "-f", "parquet",
      "lm-score", "--text", "text", "--id", "doc_id", "--rare-max", "100",
      "--outfile", s"$tmp/lm"))
    locally {
      val spark = GraftSession.builder("verifyLm", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val out = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/lm")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val expected = graft.text.TextAnalysis.lmScore(in, col("text"), col("doc_id"), 100L)
      println(s"LM_SCORE=${out.count()} EXPECT=${expected.count()} " +
        s"MATCH=${out.exceptAll(expected).isEmpty && expected.exceptAll(out).isEmpty}")
      spark.stop()
    }

    // semdedup (semantic dedup over embeddings; low tau — the synthetic
    // vectors are near-random)
    val emb = "/root/testdata/sf0.001/embeddings.parquet"
    Cli.main(Array("-i", emb, "-f", "parquet",
      "semdedup", "--vec", "embedding", "--id", "vec_id",
      "--centroids", "8", "--iters", "1", "--tau", "0.3",
      "--outfile", s"$tmp/semdedup"))
    locally {
      val spark = GraftSession.builder("verifySem", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val kept = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/semdedup").count()
      val total = graft.sources.PartitionedFiles.readParquet(spark, emb).count()
      println(s"SEMDEDUP_KEPT=$kept OF=$total DROPPED_SOME=${kept < total && kept > 0}")
      spark.stop()
    }

    // novel (incremental corpus screen): screen the file against
    // itself — every doc band-collides with its own corpus copy, so
    // nothing is novel; a clean end-to-end signal for the verb

    Cli.main(Array("-i", docs, "-f", "parquet",
      "novel", "--corpus", docs, "--text", "text", "--id", "doc_id",
      "--outfile", s"$tmp/novel"))
    locally {
      val spark = GraftSession.builder("verifyNovel", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val n = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/novel").count()
      println(s"NOVEL_VS_SELF=$n") // expect 0
      spark.stop()
    }

    // neighbors (sorted-neighborhood candidate pairs)
    Cli.main(Array("-i", docs, "-f", "parquet",
      "neighbors", "--text", "text", "--id", "doc_id", "--window", "5",
      "--outfile", s"$tmp/snm"))
    locally {
      val spark = GraftSession.builder("verifySnm", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val p = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/snm")
      // n docs in a window of 5 → Σ_{d=1..4}(n−d) = 4n−10 pairs,
      // every rank_dist in [1,4]
      val n = graft.sources.PartitionedFiles.readParquet(spark, docs).count()
      val ok = p.count() == n * 4 - 10 &&
        p.filter(!col("rank_dist").between(1, 4)).count() == 0
      println(s"SNM_PAIRS=${p.count()} EXPECT=${n * 4 - 10} OK=$ok")
      spark.stop()
    }

    // sample-weighted (length-proportional Bernoulli keep)
    Cli.main(Array("-i", docs, "-f", "parquet",
      "sample-weighted", "--key", "doc_id", "--weight", "n_chars",
      "--threshold", "400", "--outfile", s"$tmp/wsample"))
    // winnow (MOSS fingerprints)
    Cli.main(Array("-i", docs, "-f", "parquet",
      "winnow", "--text", "text", "--id", "doc_id", "--outfile", s"$tmp/winnow"))
    locally {
      val spark = GraftSession.builder("verifyWs", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val total = graft.sources.PartitionedFiles.readParquet(spark, docs).count()
      val ws = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/wsample").count()
      val wn = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/winnow")
      println(s"WSAMPLE=$ws OF=$total BINDS=${ws > 0 && ws < total} " +
        s"WINNOW_FPS=${wn.count()} DOCS=${wn.select("doc_id").distinct().count()}")
      spark.stop()
    }

    // scd2 (validity intervals from a jsonl change log)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$tmp/changes.jsonl"),
      """{"user_id": 1, "us": 100, "cid": 1, "tier": "bronze"}
        |{"user_id": 1, "us": 200, "cid": 2, "tier": "silver"}
        |{"user_id": 2, "us": 150, "cid": 3, "tier": "bronze"}
        |""".stripMargin)
    Cli.main(Array("-i", s"$tmp/changes.jsonl", "-f", "json",
      "--schema", "user_id BIGINT, us BIGINT, cid BIGINT, tier STRING",
      "scd2", "--key", "user_id", "--ts", "us", "--order", "us, cid",
      "--outfile", s"$tmp/scd2"))
    locally {
      val spark = GraftSession.builder("verifyScd", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val d = graft.sources.PartitionedFiles.readJsonl(spark, s"$tmp/scd2")
      val current = d.filter(col("is_current")).count()
      val closed = d.filter(col("valid_to_us") === 200L).count()
      println(s"SCD2_ROWS=${d.count()} CURRENT=$current CLOSED_AT_200=$closed " +
        s"OK=${d.count() == 3 && current == 2 && closed == 1}")
      spark.stop()
    }

    // schema-check (drift report: one re-typed, one missing, one extra)
    Cli.main(Array("-i", docs, "-f", "parquet",
      "schema-check", "--expect",
      "doc_id BIGINT, text STRING, lang INT, missing_col STRING, n_chars BIGINT",
      "--outfile", s"$tmp/drift"))
    locally {
      val spark = GraftSession.builder("verifyDrift", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val drift = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/drift")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      println(s"DRIFT=$drift OK=${
        drift("doc_id") == "ok" && drift("lang") == "type_changed" &&
        drift("missing_col") == "missing" && drift("source") == "extra"}")
      spark.stop()
    }

    // shmr-literal output naming: {auto:05d} template + delete-on-empty
    Cli.main(Array("-i", s"$tmp/in", "-f", "json", "--schema", "id long, v long",
      "partition.map", "--expr", "id, v", "--outfile", s"$tmp/named",
      "--names", "chunk-{auto}.jsonl", "--delete-on-empty", "true"))
    locally {
      val named = new java.io.File(s"$tmp/named").listFiles()
        .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .map(_.getName).sorted
      println(s"SHMR_NAMES=${named.mkString(",")} " +
        s"OK=${named.zipWithIndex.forall { case (n, i) => n == f"chunk-$i%05d.jsonl" }}")
    }

    // shuffle (seeded permutation) and pack-sequences (materialized batches)
    Cli.main(Array("-i", docs, "-f", "parquet",
      "shuffle", "--key", "doc_id", "--seed", "7", "--outfile", s"$tmp/shuffled"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "pack-sequences", "--text", "text", "--id", "doc_id",
      "--shard", "pmod(doc_id, 4)", "--budget", "2000",
      "--outfile", s"$tmp/packedseq"))
    locally {
      val spark = GraftSession.builder("verifyShufPack", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val sh = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/shuffled")
      val ranks = sh.select("shuffle_rank").collect().map(_.getLong(0)).sorted
      val ps = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/packedseq")
      val nDocs = ps.agg(org.apache.spark.sql.functions.sum("n_docs")).head().getLong(0)
      println(s"SHUFFLE_PERM=${ranks.sameElements(0L until ranks.length)} " +
        s"PACKSEQ_BATCHES=${ps.count()} DOCS=$nDocs OK=${nDocs == 500}")
      spark.stop()
    }

    // diff (corpus snapshot lifecycle): old = docs minus every 5th,
    // with every 7th (surviving) text rewritten; new = the file itself
    locally {
      val spark = GraftSession.builder("seedOld", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val old = in.filter(col("doc_id") % 5 =!= 0)
        .withColumn("text", org.apache.spark.sql.functions.when(
          col("doc_id") % 7 === 0, org.apache.spark.sql.functions.concat(
            col("text"), org.apache.spark.sql.functions.lit(" OLD")))
          .otherwise(col("text")))
      graft.sources.PartitionedFiles.writeParquet(old, s"$tmp/docs_old", 2)
      spark.stop()
    }
    Cli.main(Array("-i", docs, "-f", "parquet",
      "diff", "--old", s"$tmp/docs_old", "--key", "doc_id", "--content", "text",
      "--key-name", "doc_id", "--outfile", s"$tmp/diff"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "diff", "--old", s"$tmp/docs_old", "--key", "doc_id", "--content", "text",
      "--emit", "stats", "--outfile", s"$tmp/diffstats"))
    locally {
      val spark = GraftSession.builder("verifyDiff", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val byStatus = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/diff")
        .groupBy("status").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val added = in.filter(col("doc_id") % 5 === 0).count()
      val changed = in.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 7 === 0).count()
      val stats = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/diffstats")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      println(s"DIFF=$byStatus OK=${
        byStatus.getOrElse("added", 0L) == added &&
        byStatus.getOrElse("changed", 0L) == changed &&
        byStatus.getOrElse("removed", 0L) == 0L &&
        stats == byStatus.filter(_._2 > 0)}")
      spark.stop()
    }

    // corpus (the whole prep chain as one verb: quality floor, exact +
    // near dedup, LM gate, decontamination, temperature mixture, split)
    Cli.main(Array("-i", docs, "-f", "parquet",
      "corpus", "--text", "text", "--id", "doc_id",
      "--min-tokens", "30", "--near", "minhash-best",
      "--lm-rare-max", "100", "--lm-max-rare-ratio", "0.9",
      "--decontam", s"$tmp/bench",
      "--source-cap", "10",
      "--temperature", "source", "--split", "90,5",
      "--outfile", s"$tmp/corpus"))
    locally {
      val spark = GraftSession.builder("verifyCorpus", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val out = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/corpus")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val bench = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/bench")
      val expect = Corpus(in, col("text"), col("doc_id"))
        .qualityFilter(30).exactDedup().nearDedupKeepBest()
        .lmQualityFilter(100L, 0.9)
        .decontaminate(bench, col("text"), col("doc_id"))
        .capPerSource(col("source"), 10)
        .temperatureSample(col("source"))
        .splitAssign(90, 5).df
      val n = out.count()
      val splits = out.select("split").distinct().count()
      println(s"CORPUS=$n EXPECT=${expect.count()} SPLITS=$splits " +
        s"OK=${n == expect.count() && n > 0 && splits >= 2}")
      spark.stop()
    }

    // phrase-search: corpus-derived top phrases, library parity
    Cli.main(Array("-i", docs, "-f", "parquet",
      "phrase-search", "--text", "text", "--id", "doc_id",
      "--n", "2", "--top", "3",
      "--outfile", s"$tmp/phrases"))
    locally {
      val spark = GraftSession.builder("verifyPhrases", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val out = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/phrases")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val expect = graft.text.Search.phraseOccurrences(in, col("text"), col("doc_id"),
        graft.text.Search.topPhrases(in, col("text"), n = 2, k = 3),
        col("phrase"), col("phrase"))
      val same = out.except(expect).count() == 0 && expect.except(out).count() == 0
      println(s"PHRASES=${out.count()} OK=${same && out.count() > 0}")
      spark.stop()
    }

    // kmv-overlap: pairwise source overlap matrix, library parity
    Cli.main(Array("-i", docs, "-f", "parquet",
      "kmv-overlap", "--text", "text", "--group", "source", "--k", "16",
      "--outfile", s"$tmp/kmv"))
    locally {
      val spark = GraftSession.builder("verifyKmv", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val out = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/kmv")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val expect = graft.sketch.Sketches.kmvOverlapReport(
        in, col("source"), col("text"), 16)
      val same = out.except(expect).count() == 0 && expect.except(out).count() == 0
      println(s"KMV=${out.count()} OK=${same && out.count() > 0}")
      spark.stop()
    }

    // drift: profile the ref slice once, report a drop against it
    locally {
      val spark = GraftSession.builder("prepDrift", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      graft.sources.PartitionedFiles.readParquet(spark, docs)
        .filter(expr("doc_id % 3 <> 0"))
        .write.mode("overwrite").parquet(s"$tmp/drift_ref")
      spark.stop()
    }
    Cli.main(Array("-i", s"$tmp/drift_ref", "-f", "parquet",
      "drift", "--mode", "profile", "--bucket", "n_chars div 256",
      "--outfile", s"$tmp/drift_profile"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "drift", "--mode", "report", "--profile", s"$tmp/drift_profile",
      "--bucket", "n_chars div 256", "--outfile", s"$tmp/drift_report"))
    locally {
      val spark = GraftSession.builder("verifyDrift", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val out = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/drift_report")
      val expect = graft.operators.TableDiff.distributionDrift(
        in.filter(expr("doc_id % 3 <> 0")), in,
        expr("n_chars div 256"), expr("n_chars div 256"))
      val same = out.except(expect).count() == 0 && expect.except(out).count() == 0
      println(s"DISTDRIFT=${out.count()} OK=${same && out.count() > 0}")
      spark.stop()
    }

    // rrf: quality-signal fusion, library parity
    Cli.main(Array("-i", docs, "-f", "parquet",
      "rrf", "--id", "doc_id",
      "--signals", "len=size(split(trim(text),'\\\\s+'));chars=n_chars",
      "--outfile", s"$tmp/rrf"))
    locally {
      val spark = GraftSession.builder("verifyRrf", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val out = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/rrf")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val expect = graft.quality.Ensemble.rrf(in, col("doc_id"),
        Seq("len" -> expr("size(split(trim(text),'\\\\s+'))"), "chars" -> col("n_chars")))
      val same = out.except(expect).count() == 0 && expect.except(out).count() == 0
      println(s"RRF=${out.count()} OK=${same && out.count() > 0}")
      spark.stop()
    }

    // datasheet: per-source release report, library parity
    Cli.main(Array("-i", docs, "-f", "parquet",
      "datasheet", "--text", "text", "--id", "doc_id",
      "--gopher-min-words", "20", "--gopher-max-words", "500",
      "--outfile", s"$tmp/datasheet"))
    locally {
      val spark = GraftSession.builder("verifyDatasheet", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val out = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/datasheet")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val expect = graft.quality.Datasheet.perSource(in, col("text"), col("doc_id"),
        col("source"), col("lang"), minWords = 20, maxWords = 500)
      val same = out.except(expect).count() == 0 && expect.except(out).count() == 0
      println(s"DATASHEET=${out.count()} OK=${same && out.count() > 0}")
      spark.stop()
    }

    // corpus --rules: the heuristic batteries (Gopher doc rules +
    // repetition battery) as chain stages, library-parity checked
    Cli.main(Array("-i", docs, "-f", "parquet",
      "corpus", "--text", "text", "--id", "doc_id",
      "--rules", "gopher,repetition",
      "--gopher-min-words", "20", "--gopher-max-words", "500",
      "--dedup", "none", "--near", "none",
      "--outfile", s"$tmp/corpus_rules"))
    locally {
      val spark = GraftSession.builder("verifyCorpusRules", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val out = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/corpus_rules")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val expect = Corpus(in, col("text"), col("doc_id"))
        .gopherQualityFilter(20, 500).repetitionFilter().df
      val n = out.count()
      println(s"CORPUS_RULES=$n EXPECT=${expect.count()} " +
        s"OK=${n == expect.count() && n > 0 && n < in.count()}")
      spark.stop()
    }

    // corpus --emit ledger: same chain, but write WHO was dropped WHERE
    Cli.main(Array("-i", docs, "-f", "parquet",
      "corpus", "--text", "text", "--id", "doc_id",
      "--min-tokens", "30", "--near", "minhash",
      "--source-cap", "10",
      "--emit", "ledger",
      "--outfile", s"$tmp/ledger"))
    locally {
      val spark = GraftSession.builder("verifyLedger", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val ledger = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/ledger")
      val audited = Corpus(in, col("text"), col("doc_id")).audited
        .qualityFilter(30).exactDedup().nearDedup()
        .capPerSource(col("source"), 10)
      val expect = audited.dropLedger
      val sameRows = ledger.select("doc_id", "stage_idx", "stage").except(expect).count() == 0 &&
        expect.except(ledger.select("doc_id", "stage_idx", "stage")).count() == 0
      val partitions = ledger.count() + audited.df.count() == in.count()
      println(s"LEDGER=${ledger.count()} OK=${sameRows && partitions && ledger.count() > 0}")
      spark.stop()
    }

    // stats-ledger: two drops appended (second re-appended to prove
    // idempotence), then rolled up — library-parity vs a direct
    // whole-corpus aggregate
    Cli.main(Array("-i", docs, "-f", "parquet",
      "stats-ledger", "--mode", "append", "--ledger", s"$tmp/sledger",
      "--drop-id", "d0", "--group", "source", "--key", "doc_id", "--text", "text"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "stats-ledger", "--mode", "append", "--ledger", s"$tmp/sledger",
      "--drop-id", "d1", "--group", "source", "--key", "doc_id || '_b'", "--text", "text"))
    Cli.main(Array("-i", docs, "-f", "parquet", // retry of d1 must overwrite, not duplicate
      "stats-ledger", "--mode", "append", "--ledger", s"$tmp/sledger",
      "--drop-id", "d1", "--group", "source", "--key", "doc_id || '_b'", "--text", "text"))
    Cli.main(Array("-i", s"$tmp/sledger", "-f", "parquet",
      "stats-ledger", "--mode", "rollup", "--outfile", s"$tmp/sstats"))
    locally {
      val spark = GraftSession.builder("verifySL", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val stats = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/sstats")
      val nDocs = in.count()
      val row = stats.agg(org.apache.spark.sql.functions.sum("n_docs"),
        org.apache.spark.sql.functions.sum("n_drops")).head()
      // both drops counted once each (idempotent retry), 2 drops/group
      println(s"SLEDGER docs=${row.getLong(0)} OK=${row.getLong(0) == 2 * nDocs &&
        stats.filter(col("n_drops") =!= 2).count() == 0}")
      spark.stop()
    }

    // centroid-classify: confusion matrix totals the vector count
    Cli.main(Array("-i", emb, "-f", "parquet",
      "centroid-classify", "--vec", "embedding", "--id", "vec_id", "--label", "label",
      "--emit", "confusion", "--outfile", s"$tmp/conf"))
    locally {
      val spark = GraftSession.builder("verifyCC", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val nVecs = graft.sources.PartitionedFiles.readParquet(spark, emb).count()
      val conf = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/conf")
      val total = conf.agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
      println(s"CONFUSION total=$total OK=${total == nVecs}")
      spark.stop()
    }

    // nb-classify --emit keep: library-parity vs Corpus.nbLabelFilter
    Cli.main(Array("-i", docs, "-f", "parquet",
      "nb-classify", "--text", "text", "--id", "doc_id", "--label", "lang",
      "--emit", "keep", "--outfile", s"$tmp/nbkeep"))
    locally {
      val spark = GraftSession.builder("verifyNB", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val kept = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/nbkeep")
      val expect = Corpus(in, col("text"), col("doc_id")).nbLabelFilter(col("lang")).df
      val same = kept.select("doc_id").except(expect.select("doc_id")).count() == 0 &&
        expect.select("doc_id").except(kept.select("doc_id")).count() == 0
      println(s"NBKEEP=${kept.count()} OK=${same && kept.count() > 0}")
      spark.stop()
    }

    // embed → knn: text-only lexical nearest neighbours through the
    // persisted integer-vector frame — library-parity vs cosineTopK
    Cli.main(Array("-i", docs, "-f", "parquet",
      "embed", "--text", "text", "--id", "doc_id", "--dim", "32",
      "--outfile", s"$tmp/hemb"))
    locally {
      val spark = GraftSession.builder("prepKNN", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/hemb")
        .filter(expr("vec_id % 25 = 0"))
        .write.mode("overwrite").parquet(s"$tmp/hemb_q")
      spark.stop()
    }
    Cli.main(Array("-i", s"$tmp/hemb", "-f", "parquet",
      "knn", "--queries", s"$tmp/hemb_q", "--k", "2", "--prepared", "true",
      "--outfile", s"$tmp/hknn"))
    locally {
      val spark = GraftSession.builder("verifyKNN", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val emb = graft.text.HashEmbed.embedDocuments(in, col("text"), col("doc_id"), 32)
      val expect = graft.similarity.Similarity.cosineTopK(
        emb, emb.filter(expr("vec_id % 25 = 0")), 2)
      val got = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/hknn")
      val same = got.select("q_id", "neighbor_id", "rank")
        .except(expect.select("q_id", "neighbor_id", "rank")).count() == 0 &&
        expect.select("q_id", "neighbor_id", "rank")
          .except(got.select("q_id", "neighbor_id", "rank")).count() == 0
      println(s"HKNN=${got.count()} OK=${same && got.count() > 0}")
      spark.stop()
    }

    // bpe: train a merge table, persist it, tokenize the same corpus
    // from the stored artifact — library-parity vs the in-process path
    Cli.main(Array("-i", docs, "-f", "parquet",
      "bpe", "--mode", "train", "--text", "text", "--merges", "8",
      "--outfile", s"$tmp/bpe_merges"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "bpe", "--mode", "tokens", "--text", "text", "--id", "doc_id",
      "--merges-table", s"$tmp/bpe_merges", "--outfile", s"$tmp/bpe_tokens"))
    locally {
      val spark = GraftSession.builder("verifyBPE", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val types = graft.text.Bpe.wordTypes(in, col("text"), 100000)
      val merges = graft.text.Bpe.trainMerges(types, 8)
      val expect = graft.text.Bpe.tokenCounts(in, col("text"), Seq(col("doc_id")),
        graft.text.Bpe.symbolize(types, merges))
      val got = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/bpe_tokens")
      val same = got.except(expect).count() == 0 && expect.except(got).count() == 0
      val nm = spark.read.parquet(s"$tmp/bpe_merges").count()
      println(s"BPECLI merges=$nm OK=${same && nm == 8 && got.count() > 0}")
      spark.stop()
    }

    // bloom-ledger: two history drops appended (one retried), then the
    // exact novel set — library-parity vs a plain anti-join
    locally {
      val spark = GraftSession.builder("prepBL", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      in.filter(expr("doc_id % 3 = 1")).write.mode("overwrite").parquet(s"$tmp/bl_h1")
      in.filter(expr("doc_id % 3 = 2")).write.mode("overwrite").parquet(s"$tmp/bl_h2")
      in.filter(expr("doc_id % 3 <> 0")).write.mode("overwrite").parquet(s"$tmp/bl_history")
      spark.stop()
    }
    Cli.main(Array("-i", s"$tmp/bl_h1", "-f", "parquet",
      "bloom-ledger", "--mode", "append", "--ledger", s"$tmp/bledger",
      "--drop-id", "h1", "--key", "md5(text)", "--bits", "65536"))
    Cli.main(Array("-i", s"$tmp/bl_h2", "-f", "parquet",
      "bloom-ledger", "--mode", "append", "--ledger", s"$tmp/bledger",
      "--drop-id", "h2", "--key", "md5(text)", "--bits", "65536"))
    Cli.main(Array("-i", s"$tmp/bl_h2", "-f", "parquet", // retry of h2: overwrite, not duplicate
      "bloom-ledger", "--mode", "append", "--ledger", s"$tmp/bledger",
      "--drop-id", "h2", "--key", "md5(text)", "--bits", "65536"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "bloom-ledger", "--mode", "novel", "--ledger", s"$tmp/bledger",
      "--corpus", s"$tmp/bl_history", "--key", "md5(text)",
      "--outfile", s"$tmp/bl_novel"))
    locally {
      val spark = GraftSession.builder("verifyBL", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val history = in.filter(expr("doc_id % 3 <> 0"))
      val novel = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/bl_novel")
      val expect = in.join(history.select(md5(col("text")).as("__fp")).distinct(),
        md5(col("text")) === col("__fp"), "left_anti")
      val same = novel.select("doc_id").except(expect.select("doc_id")).count() == 0 &&
        expect.select("doc_id").except(novel.select("doc_id")).count() == 0
      val nDrops = spark.read.parquet(s"$tmp/bledger").count()
      println(s"BLOOMNOVEL=${novel.count()} OK=${same && novel.count() > 0 && nDrops == 2}")
      spark.stop()
    }

    // kmv-ledger: two history drops appended (one retried), then the
    // incoming batch's overlap report — library parity, merged ≡ direct
    Cli.main(Array("-i", s"$tmp/bl_h1", "-f", "parquet",
      "kmv-ledger", "--mode", "append", "--ledger", s"$tmp/kledger",
      "--drop-id", "h1", "--text", "text", "--k", "64"))
    Cli.main(Array("-i", s"$tmp/bl_h2", "-f", "parquet",
      "kmv-ledger", "--mode", "append", "--ledger", s"$tmp/kledger",
      "--drop-id", "h2", "--text", "text", "--k", "64"))
    Cli.main(Array("-i", s"$tmp/bl_h2", "-f", "parquet", // retry of h2: overwrite, not duplicate
      "kmv-ledger", "--mode", "append", "--ledger", s"$tmp/kledger",
      "--drop-id", "h2", "--text", "text", "--k", "64"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "kmv-ledger", "--mode", "overlap", "--ledger", s"$tmp/kledger",
      "--text", "text", "--outfile", s"$tmp/kmv_report"))
    locally {
      val spark = GraftSession.builder("verifyKL", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val out = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/kmv_report")
      val direct = graft.sketch.KmvLedger.merged(
        graft.sketch.KmvLedger.dropSummary(
          in.filter(expr("doc_id % 3 <> 0")), "all", col("text"), 64))
      val expect = graft.sketch.KmvLedger.overlapVsHistory(in, col("text"), direct)
      val same = out.except(expect).count() == 0 && expect.except(out).count() == 0
      val nDrops = spark.read.parquet(s"$tmp/kledger").count()
      println(s"KMVLEDGER common=${out.select("common").head().getLong(0)} " +
        s"OK=${same && nDrops == 2}")
      spark.stop()
    }

    // dsir --emit keep: library-parity vs Corpus.dsirSelect (the
    // target sample is the en slice materialized to parquet first)
    locally {
      val spark = GraftSession.builder("prepDSIR", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      graft.sources.PartitionedFiles.readParquet(spark, docs)
        .filter(col("lang") === "en")
        .write.mode("overwrite").parquet(s"$tmp/dsir_target")
      spark.stop()
    }
    Cli.main(Array("-i", docs, "-f", "parquet",
      "dsir", "--target", s"$tmp/dsir_target", "--text", "text", "--id", "doc_id",
      "--k", "10", "--buckets", "128", "--outfile", s"$tmp/dsirkeep"))
    locally {
      val spark = GraftSession.builder("verifyDSIR", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val kept = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/dsirkeep")
      val expect = Corpus(in, col("text"), col("doc_id"))
        .dsirSelect(in.filter(col("lang") === "en"), col("text"), col("doc_id"),
          k = 10, buckets = 128).df
      val same = kept.select("doc_id").except(expect.select("doc_id")).count() == 0 &&
        expect.select("doc_id").except(kept.select("doc_id")).count() == 0
      println(s"DSIRKEEP=${kept.count()} OK=${same && kept.count() == 10}")
      spark.stop()
    }

    // unimax: allocation sums to the relative budget; copies parity
    Cli.main(Array("-i", docs, "-f", "parquet",
      "unimax", "--group", "lang", "--text", "text", "--outfile", s"$tmp/unimax"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "unimax", "--group", "lang", "--text", "text", "--id", "doc_id",
      "--emit", "copies", "--outfile", s"$tmp/unimax_copies"))
    locally {
      val spark = GraftSession.builder("verifyUM", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val alloc = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/unimax")
      val copies = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/unimax_copies")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val totalTokens = in.agg(org.apache.spark.sql.functions.sum(
        graft.text.TextAnalysis.tokenCount(col("text")))).head().getLong(0)
      val allocSum = alloc.agg(org.apache.spark.sql.functions.sum("alloc")).head().getLong(0)
      val budget = totalTokens * 8 / 5
      println(s"UNIMAX alloc=$allocSum budget=$budget OK=${allocSum == budget &&
        alloc.count() == 5 && copies.count() > 0}")
      spark.stop()
    }

    // quantile-norm: within-source score equalization, library parity
    Cli.main(Array("-i", docs, "-f", "parquet",
      "quantile-norm", "--group", "source", "--score", "n_chars", "--id", "doc_id",
      "--outfile", s"$tmp/qnorm"))
    locally {
      val spark = GraftSession.builder("verifyQN", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val out = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/qnorm")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val expect = graft.operators.Relational.RelationalOps(in)
        .quantileNormalize(col("source"), col("n_chars"), col("doc_id"))
      val same = out.except(expect).count() == 0 && expect.except(out).count() == 0
      println(s"QNORM=${out.count()} OK=${same && out.count() > 0}")
      spark.stop()
    }

    // trending: decayed counts over a derived day column, library parity
    Cli.main(Array("-i", docs, "-f", "parquet",
      "trending", "--key", "source",
      "--day", "date_add(DATE '2024-01-01', CAST(doc_id % 40 AS INT))",
      "--outfile", s"$tmp/trending"))
    locally {
      val spark = GraftSession.builder("verifyTrend", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val out = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/trending")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val expect = graft.operators.Timeseries.TimeseriesOps(in)
        .decayedCounts(col("source"),
          expr("date_add(DATE '2024-01-01', CAST(doc_id % 40 AS INT))"))
      val same = out.except(expect).count() == 0 && expect.except(out).count() == 0
      println(s"TRENDING=${out.count()} OK=${same && out.count() > 0}")
      spark.stop()
    }

    // skew: AMS F2 report, library parity
    Cli.main(Array("-i", docs, "-f", "parquet",
      "skew", "--group", "source", "--key", "lang",
      "--outfile", s"$tmp/skew"))
    locally {
      val spark = GraftSession.builder("verifySkew", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val out = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/skew")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val expect = graft.sketch.Sketches.amsF2(in, col("source"), col("lang"))
      val same = out.except(expect).count() == 0 && expect.except(out).count() == 0
      println(s"SKEW=${out.count()} OK=${same && out.count() > 0}")
      spark.stop()
    }

    // keywords: weighted TextRank, library parity
    Cli.main(Array("-i", docs, "-f", "parquet",
      "keywords", "--text", "text", "--top", "10",
      "--outfile", s"$tmp/keywords"))
    locally {
      val spark = GraftSession.builder("verifyKw", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val out = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/keywords")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val expect = graft.text.TextAnalysis.textRank(in, col("text"), topK = 10)
      val same = out.except(expect).count() == 0 && expect.except(out).count() == 0
      println(s"KEYWORDS=${out.count()} OK=${same && out.count() == 10}")
      spark.stop()
    }

    // triplets: hard-negative mining over embeddings, library parity
    Cli.main(Array("-i", emb, "-f", "parquet",
      "triplets", "--vec", "embedding", "--id", "vec_id", "--label", "label",
      "--anchor-mod", "25", "--k", "3", "--outfile", s"$tmp/triplets"))
    locally {
      val spark = GraftSession.builder("verifyTrip", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val out = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/triplets")
      val in = graft.sources.PartitionedFiles.readParquet(spark, emb)
      val corpus = graft.similarity.Similarity.prepareQuantized(
        in, col("embedding"), col("vec_id"), col("label"))
      val expect = graft.similarity.Similarity.mineTriplets(
        corpus, corpus.filter(expr("vec_id % 25 = 0")), 3)
      val same = out.except(expect).count() == 0 && expect.except(out).count() == 0
      println(s"TRIPLETS=${out.count()} OK=${same && out.count() > 0}")
      spark.stop()
    }

    // scrub-sentences: library-parity vs the operator
    Cli.main(Array("-i", docs, "-f", "parquet",
      "scrub-sentences", "--text", "text", "--id", "doc_id",
      "--emit", "spans", "--outfile", s"$tmp/sspans"))
    locally {
      val spark = GraftSession.builder("verifySS", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val spans = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/sspans")
      val expect = graft.dedup.SentenceDedup
        .duplicatedSentenceSpans(in, col("text"), col("doc_id"), 8).count()
      println(s"SSPANS=${spans.count()} OK=${spans.count() == expect && expect > 0}")
      spark.stop()
    }

    // promote: write-audit-publish over the real documents table —
    // publish v1, have a broken rebuild refused, roll back
    val proot = s"$tmp/versioned"
    Cli.main(Array("-i", docs, "-f", "parquet",
      "promote", "--root", proot, "--not-null", "doc_id,text",
      "--unique", "doc_id", "--outfile", s"$tmp/prom1"))
    // a rebuild that silently dropped >95% of the corpus must be
    // refused by the diff gate (exit via sys.error), leaving v1 live
    Cli.main(Array("-i", docs, "-f", "parquet",
      "partition.filter", "--expr", "doc_id % 20 = 0",
      "--outfile", s"$tmp/sliver"))
    val refused =
      try {
        Cli.main(Array("-i", s"$tmp/sliver", "-f", "parquet",
          "promote", "--root", proot, "--unique", "doc_id",
          "--diff-key", "doc_id", "--diff-content", "text",
          "--max-changed-pm", "50",
          "--outfile", s"$tmp/prom_refused"))
        false
      } catch { case e: RuntimeException => e.getMessage.contains("promotion refused") }
    Cli.main(Array("-i", docs, "-f", "parquet",
      "promote", "--root", proot, "--action", "current",
      "--outfile", s"$tmp/prom_cur"))
    locally {
      val spark = GraftSession.builder("verifyProm", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val live = graft.sources.Versioned.read(spark, proot)
      val cur = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/prom_cur")
        .filter(col("name") === "version").head().getString(2)
      println(s"PROMOTE=${live.count()} OK=${refused && live.count() == in.count() && cur == "1"}")
      spark.stop()
    }
    // time travel: publish a v2 sliver legitimately (no diff gate),
    // roll back to v1 by number (publishes v3), list the chain,
    // read-version v2, then vacuum with a retention floor
    Cli.main(Array("-i", s"$tmp/sliver", "-f", "parquet",
      "promote", "--root", proot, "--unique", "doc_id",
      "--outfile", s"$tmp/prom2"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "promote", "--root", proot, "--action", "rollback", "--to-version", "1",
      "--outfile", s"$tmp/prom_rb"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "promote", "--root", proot, "--action", "history",
      "--outfile", s"$tmp/prom_hist"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "promote", "--root", proot, "--action", "read-version", "--to-version", "2",
      "--outfile", s"$tmp/prom_v2"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "promote", "--root", proot, "--action", "vacuum", "--retain", "2",
      "--outfile", s"$tmp/prom_vac"))
    locally {
      val spark = GraftSession.builder("verifyTT", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val live = graft.sources.Versioned.read(spark, proot)          // v3 = v1's data
      val hist = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/prom_hist")
      val v2 = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/prom_v2")
      val sliverN = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/sliver").count()
      val ok = live.count() == in.count() &&              // rollback landed on v1 data
        hist.count() == 3 &&                              // chain: v1, v2, v3(rollback)
        v2.count() == sliverN                             // time travel reads v2
      println(s"TIMETRAVEL=${hist.count()} OK=$ok")
      // timestamp as-of through the CLI: v2's publish stamp from the
      // history output resolves back to v2's data
      val t2 = hist.filter(col("version") === 2).select("ts").head().getLong(0)
      spark.stop()
      Cli.main(Array("-f", "parquet",
        "promote", "--root", proot, "--action", "read-asof", "--ts", t2.toString,
        "--outfile", s"$tmp/prom_asof"))
      val spark2 = GraftSession.builder("verifyAsOf", "local[4]", 4).getOrCreate()
      spark2.sparkContext.setLogLevel("ERROR")
      val asof = graft.sources.PartitionedFiles.readParquet(spark2, s"$tmp/prom_asof")
      println(s"READASOF=${asof.count()} OK=${t2 > 0 && asof.count() == sliverN}")
      spark2.stop()
    }

    // warehouse merge: bucketed publish, then one drop upserts 2 keys,
    // deletes 1 and inserts 1 by rewriting only its touched buckets
    val wroot = s"$tmp/bucketed"
    Cli.main(Array("-i", docs, "-f", "parquet",
      "promote", "--root", wroot, "--action", "promote-bucketed",
      "--key", "doc_id", "--buckets", "16", "--unique", "doc_id",
      "--outfile", s"$tmp/wm1"))
    locally {
      val spark = GraftSession.builder("mkDrop", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      Seq(
        (0L, Option("updated zero"), Option("en"), Option("s0"), Option(12L), false),
        (1L, Option("updated one"), Option("en"), Option("s0"), Option(11L), false),
        (2L, Option.empty[String], Option.empty[String], Option.empty[String], Option.empty[Long], true),
        (900000L, Option("brand new doc"), Option("en"), Option("drop"), Option(13L), false))
        .toDF("doc_id", "text", "lang", "source", "n_chars", "del")
        .write.mode("overwrite").parquet(s"$tmp/wdrop")
      spark.stop()
    }
    Cli.main(Array("-i", s"$tmp/wdrop", "-f", "parquet",
      "promote", "--root", wroot, "--action", "merge",
      "--deleted", "del", "--unique", "doc_id", "--max-changed-pm", "500",
      "--outfile", s"$tmp/wm2"))
    Cli.main(Array("-i", s"$tmp/wdrop", "-f", "parquet",
      "promote", "--root", wroot, "--action", "diff-versions",
      "--from-version", "1", "--to-version", "2",
      "--diff-key", "doc_id", "--diff-content", "text",
      "--outfile", s"$tmp/wdiff"))
    Cli.main(Array("-i", s"$tmp/wdrop", "-f", "parquet",
      "promote", "--root", wroot, "--action", "compact",
      "--unique", "doc_id", "--outfile", s"$tmp/wcompact"))
    locally {
      val spark = GraftSession.builder("verifyMerge", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      val in = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val live = graft.sources.Versioned.read(spark, wroot)
      val rep = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/wm2")
      val merged = rep.filter(col("name") === "merged").head().getString(2)
      val diff = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/wdiff")
        .as[(Long, String)].collect().toMap
      val ok = merged == "true" &&
        live.count() == in.count() && // -1 delete +1 insert
        live.filter(col("doc_id") === 0L).head().getString(1) == "updated zero" &&
        live.filter(col("doc_id") === 2L).count() == 0 &&
        live.filter(col("doc_id") === 900000L).count() == 1 &&
        graft.sources.Versioned.readVersion(spark, wroot, 1).count() == in.count() &&
        diff(0L) == "changed" && diff(2L) == "removed" && diff(900000L) == "added" &&
        // post-compact: one owning directory, content unchanged
        graft.sources.Versioned.currentManifest(wroot)
          .flatMap(_.buckets).get.owner.filter(_.nonEmpty).distinct.size == 1
      println(s"WHMERGE=${live.count()} OK=$ok")
      spark.stop()
    }

    // zone-mapped warehouse + retry merge + range read: publish with
    // --zones doc_id, merge through --retry (single writer — exercises
    // the retry wrapper's pass-through), then read-range must equal
    // the filtered live read
    val zroot = s"$tmp/zoned_bucketed"
    Cli.main(Array("-i", docs, "-f", "parquet",
      "promote", "--root", zroot, "--action", "promote-bucketed",
      "--key", "doc_id", "--buckets", "8", "--zones", "doc_id",
      "--unique", "doc_id", "--outfile", s"$tmp/wz1"))
    Cli.main(Array("-i", s"$tmp/wdrop", "-f", "parquet",
      "promote", "--root", zroot, "--action", "merge",
      "--deleted", "del", "--retry", "3", "--max-changed-pm", "500",
      "--outfile", s"$tmp/wz2"))
    Cli.main(Array("-i", s"$tmp/wdrop", "-f", "parquet",
      "promote", "--root", zroot, "--action", "read-range",
      "--range-col", "doc_id", "--lo", "0", "--hi", "10",
      "--outfile", s"$tmp/wzrange"))
    locally {
      val spark = GraftSession.builder("verifyZoned", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val ranged = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/wzrange")
      val expect = graft.sources.Versioned.read(spark, zroot)
        .filter(col("doc_id") >= 0L && col("doc_id") <= 10L)
      val ok = graft.sources.Versioned.currentManifest(zroot)
          .flatMap(_.buckets).map(_.zones) == Some(Seq("doc_id")) &&
        ranged.count() == expect.count() && ranged.count() > 0 &&
        ranged.filter(col("doc_id") === 0L).head().getString(1) == "updated zero" &&
        ranged.filter(col("doc_id") === 2L).count() == 0 // deleted key absent
      println(s"WHZONE=${ranged.count()} OK=$ok")
      spark.stop()
    }

    // cluster-ledger: minhash pairs → two CLI appends (split by
    // parity) → labels must equal the full-graph clustering
    Cli.main(Array("-i", docs, "-f", "parquet",
      "dedup-minhash", "--text", "text", "--id", "doc_id", "--emit", "pairs",
      "--outfile", s"$tmp/clpairs"))
    Cli.main(Array("-i", s"$tmp/clpairs", "-f", "parquet",
      "partition.filter", "--expr", "(doc_a + doc_b) % 2 = 0",
      "--outfile", s"$tmp/clpairs_even"))
    Cli.main(Array("-i", s"$tmp/clpairs", "-f", "parquet",
      "partition.filter", "--expr", "(doc_a + doc_b) % 2 <> 0",
      "--outfile", s"$tmp/clpairs_odd"))
    val clroot = s"$tmp/cluster_ledger"
    Cli.main(Array("-i", s"$tmp/clpairs_even", "-f", "parquet",
      "cluster-ledger", "--mode", "append", "--ledger", clroot,
      "--a", "doc_a", "--b", "doc_b", "--outfile", s"$tmp/clstats1"))
    Cli.main(Array("-i", s"$tmp/clpairs_odd", "-f", "parquet",
      "cluster-ledger", "--mode", "append", "--ledger", clroot,
      "--a", "doc_a", "--b", "doc_b", "--outfile", s"$tmp/clstats2"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "cluster-ledger", "--mode", "vacuum", "--ledger", clroot,
      "--outfile", s"$tmp/clvac"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "cluster-ledger", "--mode", "labels", "--ledger", clroot,
      "--outfile", s"$tmp/cllabels"))
    locally {
      val spark = GraftSession.builder("verifyClusterLedger", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      val pairs = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/clpairs")
      val expect = graft.dedup.Components.connectedComponents(pairs, "doc_a", "doc_b")
        .as[(Long, Long)].collect().toSet
      val got = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/cllabels")
        .as[(Long, Long)].collect().toSet
      println(s"CLUSTERLEDGER=${got.size} OK=${got == expect && got.nonEmpty}")
      spark.stop()
    }

    // coactive: interval-overlap pair mining, library parity in BOTH
    // modes — sampled (--blocks 4) and exact (--blocks 1)
    val events = "/root/testdata/sf0.001/events.parquet"
    Cli.main(Array("-i", events, "-f", "parquet",
      "coactive", "--user", "user_id", "--type", "event_type",
      "--ts", "cast(ts as timestamp)",
      "--blocks", "4", "--top", "25", "--outfile", s"$tmp/coactive4"))
    Cli.main(Array("-i", events, "-f", "parquet",
      "coactive", "--user", "user_id", "--type", "event_type",
      "--ts", "cast(ts as timestamp)",
      "--blocks", "1", "--top", "25", "--outfile", s"$tmp/coactive1"))
    locally {
      val spark = GraftSession.builder("verifyCoact", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val in = graft.sources.PartitionedFiles.readParquet(spark, events)
      def expect(blocks: Int) = graft.operators.TemporalJoins.coActivePairs(
        in, col("user_id"), col("event_type"), col("ts").cast("timestamp"),
        bucketUs = 10800000000L, blocks = blocks, topK = 25)
      val got4 = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/coactive4")
      val got1 = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/coactive1")
      val ok4 = got4.except(expect(4)).count() == 0 && expect(4).except(got4).count() == 0
      val ok1 = got1.except(expect(1)).count() == 0 && expect(1).except(got1).count() == 0
      println(s"COACTIVE4=${got4.count()} COACTIVE1=${got1.count()} OK=${ok4 && ok1}")
      spark.stop()
    }

    // trend / balance / stop-grams: library parity over real tables
    Cli.main(Array("-i", events, "-f", "parquet",
      "trend", "--group", "event_type",
      "--x", "unix_micros(cast(ts as timestamp)) div 3600000000",
      "--y", "cast(round(value * 100) as bigint)",
      "--outfile", s"$tmp/trendrep"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "balance", "--group", "source", "--value", "n_chars",
      "--outfile", s"$tmp/balancerep"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "stop-grams", "--text", "text", "--id", "doc_id", "--cap", "4",
      "--outfile", s"$tmp/stopgrams"))
    locally {
      val spark = GraftSession.builder("verifyTrend", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import graft.operators.Relational._
      val ev = graft.sources.PartitionedFiles.readParquet(spark, events)
      val dd = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val gotT = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/trendrep")
      val expT = ev.groupOls(Seq(col("event_type")),
        expr("unix_micros(cast(ts as timestamp)) div 3600000000"),
        expr("cast(round(value * 100) as bigint)"))
      val okT = gotT.except(expT).count() == 0 && expT.except(gotT).count() == 0
      val gotB = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/balancerep")
      val expB = dd.giniByGroup(Seq(col("source")), col("n_chars"))
      val okB = gotB.except(expB).count() == 0 && expB.except(gotB).count() == 0
      val gotS = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/stopgrams")
      val expS = graft.dedup.Dedup.stopGrams(dd, col("text"), col("doc_id"),
        cap = graft.dedup.DocFreqCap.Fixed(4))
      val okS = gotS.except(expS).count() == 0 && expS.except(gotS).count() == 0
      println(s"TREND=${gotT.count()} BALANCE=${gotB.count()} STOPGRAMS=${gotS.count()} " +
        s"OK=${okT && okB && okS && gotS.count() > 0}")
      spark.stop()
    }

    // winsorize / attribution / heavy-keys / bm25: r10 wave-2 verbs,
    // library parity for each
    Cli.main(Array("-i", events, "-f", "parquet",
      "winsorize", "--group", "event_type",
      "--value", "cast(round(value * 100) as bigint)", "--lo", "50", "--hi", "950",
      "--outfile", s"$tmp/winsor"))
    Cli.main(Array("-i", events, "-f", "parquet",
      "attribution", "--user", "user_id", "--type", "event_type",
      "--ts-us", "unix_micros(cast(ts as timestamp))", "--id", "event_id",
      "--conv", "purchase", "--touch", "click,view,signup",
      "--window-hours", "24", "--bucket-hours", "24",
      "--outfile", s"$tmp/attrib"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "heavy-keys", "--group", "lang", "--key", "xxhash64(source)",
      "--num", "100", "--den", "1000",
      "--outfile", s"$tmp/heavykeys"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "bm25", "--text", "text", "--id", "doc_id", "--terms", "dup,spark,merge",
      "--top", "20", "--outfile", s"$tmp/bm25"))
    locally {
      val spark = GraftSession.builder("verifyWave2", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import graft.operators.Relational._
      val ev = graft.sources.PartitionedFiles.readParquet(spark, events)
      val dd = graft.sources.PartitionedFiles.readParquet(spark, docs)
      def same(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
        a.except(b).count() == 0 && b.except(a).count() == 0
      val okW = same(
        graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/winsor"),
        ev.winsorize(col("event_type"), expr("cast(round(value * 100) as bigint)"), 50, 950))
      val okA = same(
        graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/attrib"),
        graft.operators.TemporalJoins.attribution(ev, col("user_id"), col("event_type"),
          expr("unix_micros(cast(ts as timestamp))"), col("event_id"),
          "purchase", Seq("click", "view", "signup"), 86400000000L, 86400000000L))
      val okH = same(
        graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/heavykeys"),
        graft.sketch.Sketches.heavyHittersByGroup(dd, col("lang"),
          expr("xxhash64(source)"), 100, 1000))
      val gotR = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/bm25")
      val okR = same(gotR,
        graft.text.Search.bm25Rank(dd, col("text"), col("doc_id"),
          Seq("dup", "spark", "merge"), 20))
      println(s"WINSOR_ATTRIB_HEAVY_BM25 OK=${okW && okA && okH && okR && gotR.count() == 20}")
      spark.stop()
    }

    // auc / keyness / survival: r10 wave-4 verbs, library parity
    Cli.main(Array("-i", docs, "-f", "parquet",
      "auc", "--group", "source", "--score", "n_chars",
      "--positive", "lang = 'en'", "--outfile", s"$tmp/auc"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "keyness", "--text", "text", "--group", "lang", "--top", "5",
      "--outfile", s"$tmp/keyness"))
    Cli.main(Array("-i", events, "-f", "parquet",
      "survival", "--id", "user_id", "--ts-us", "unix_micros(cast(ts as timestamp))",
      "--censor-hours", "12", "--bucket-hours", "6",
      "--outfile", s"$tmp/survival"))
    locally {
      val spark = GraftSession.builder("verifyWave4", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val ev = graft.sources.PartitionedFiles.readParquet(spark, events)
      val dd = graft.sources.PartitionedFiles.readParquet(spark, docs)
      def same(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
        a.except(b).count() == 0 && b.except(a).count() == 0
      val okA = same(
        graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/auc"),
        graft.quality.Eval.aucExact(dd, col("source"), col("n_chars"),
          expr("lang = 'en'")))
      val okK = same(
        graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/keyness"),
        graft.text.TextAnalysis.keyness(dd, col("text"), col("lang"), topK = 5))
      val gotS = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/survival")
      val okS = same(gotS,
        graft.operators.Timeseries.kaplanMeier(ev, col("user_id"),
          expr("unix_micros(cast(ts as timestamp))"), 43200000000L, 21600000000L))
      println(s"AUC_KEYNESS_SURVIVAL OK=${okA && okK && okS && gotS.count() > 0}")
      spark.stop()
    }

    // ctfidf / mi / kcore / benford: r10 wave-5 verbs, library parity
    Cli.main(Array("-i", docs, "-f", "parquet",
      "ctfidf", "--text", "text", "--group", "lang", "--top", "4",
      "--outfile", s"$tmp/ctfidf"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "mi", "--x", "lang", "--y", "source", "--outfile", s"$tmp/mi"))
    Cli.main(Array("-i", events, "-f", "parquet",
      "kcore", "--src", "user_id * 2", "--dst", "pmod(xxhash64(event_type), 1000000) * 2 + 1",
      "--k", "3", "--rounds", "8", "--outfile", s"$tmp/kcore"))
    Cli.main(Array("-i", events, "-f", "parquet",
      "benford", "--value", "cast(round(value * 100) as bigint)",
      "--outfile", s"$tmp/benford"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "spearman", "--group", "lang", "--x", "n_chars",
      "--y", "size(split(trim(text), '\\\\s+'))", "--outfile", s"$tmp/spearman"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "hhi", "--group", "lang", "--key", "source", "--outfile", s"$tmp/hhi"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "distinct-n", "--text", "text", "--group", "source", "--ns", "1,3",
      "--outfile", s"$tmp/distinctn"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "kl-source", "--text", "text", "--group", "source",
      "--outfile", s"$tmp/klsource"))
    Cli.main(Array("-i", s"$tmp/pairs", "-f", "parquet",
      "cc-sizes", "--a", "doc_a", "--b", "doc_b", "--outfile", s"$tmp/ccsizes"))
    locally {
      val spark = GraftSession.builder("verifyWave5", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val ev = graft.sources.PartitionedFiles.readParquet(spark, events)
      val dd = graft.sources.PartitionedFiles.readParquet(spark, docs)
      def same(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
        a.except(b).count() == 0 && b.except(a).count() == 0
      val okC = same(
        graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/ctfidf"),
        graft.text.TextAnalysis.ctfidfTopTerms(dd, col("text"), col("lang"), topK = 4))
      val okM = same(
        graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/mi"),
        graft.operators.Relational.RelationalOps(dd)
          .mutualInformation(col("lang"), col("source")))
      val okK2 = same(
        graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/kcore"),
        graft.operators.GraphOps.kCore(
          ev.select(expr("user_id * 2").as("src"),
            expr("pmod(xxhash64(event_type), 1000000) * 2 + 1").as("dst")), 3L, 8))
      val gotB = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/benford")
      val okB = same(gotB,
        graft.quality.Validate.benfordAudit(ev,
          expr("cast(round(value * 100) as bigint)")))
      val okSp = same(
        graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/spearman"),
        graft.operators.Relational.RelationalOps(dd).spearman(Seq(col("lang")),
          col("n_chars"), expr("size(split(trim(text), '\\\\s+'))")))
      val okH2 = same(
        graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/hhi"),
        graft.operators.Relational.RelationalOps(dd)
          .concentration(col("lang"), col("source")))
      val okDn = same(
        graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/distinctn"),
        graft.text.TextAnalysis.distinctN(dd, col("text"), col("source"), Seq(1, 3)))
      val okKl = same(
        graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/klsource"),
        graft.text.TextAnalysis.sourceKl(dd, col("text"), col("source")))
      val okCc = same(
        graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/ccsizes"),
        graft.dedup.Components.componentSizes(
          graft.dedup.Components.connectedComponents(
            graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/pairs"),
            "doc_a", "doc_b"), col("cluster_id")))
      assert(okCc, "cc-sizes CLI parity")
      println(s"CTFIDF_MI_KCORE_BENFORD_SPEARMAN_HHI_DN_KL OK=${okC && okM && okK2 && okB && okSp && okH2 && okDn && okKl && gotB.count() == 9}")
      spark.stop()
    }

    // trimmed-mean / target-encode: r10 wave-10 verbs, library parity
    Cli.main(Array("-i", events, "-f", "parquet",
      "trimmed-mean", "--group", "event_type",
      "--value", "cast(round(value * 100) as bigint)", "--lo", "100", "--hi", "900",
      "--outfile", s"$tmp/trimmed"))
    Cli.main(Array("-i", events, "-f", "parquet",
      "target-encode", "--key", "event_type",
      "--target", "cast(round(value * 100) as bigint)",
      "--outfile", s"$tmp/tenc"))
    Cli.main(Array("-i", events, "-f", "parquet",
      "conversion-ci", "--arm", "pmod(user_id, 2)", "--entity", "user_id",
      "--converted", "event_type = 'purchase'", "--outfile", s"$tmp/convci"))
    locally {
      val spark = GraftSession.builder("verifyWave10", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val ev = graft.sources.PartitionedFiles.readParquet(spark, events)
      def same(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
        a.except(b).count() == 0 && b.except(a).count() == 0
      val okTm = same(
        graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/trimmed"),
        graft.operators.Relational.RelationalOps(ev).trimmedMean(col("event_type"),
          expr("cast(round(value * 100) as bigint)"), 100, 900))
      val okTe = same(
        graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/tenc"),
        graft.operators.Relational.RelationalOps(ev).targetEncodeLoo(col("event_type"),
          expr("cast(round(value * 100) as bigint)")))
      val okCi = same(
        graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/convci"),
        graft.quality.Validate.conversionReport(ev, expr("pmod(user_id, 2)"),
          col("user_id"), expr("event_type = 'purchase'")))
      println(s"TRIMMED_TARGETENC_CONVCI OK=${okTm && okTe && okCi}")
      spark.stop()
    }

    // twap / readability / luhn: r10 wave-7 verbs, library parity
    Cli.main(Array("-i", events, "-f", "parquet",
      "twap", "--key", "user_id", "--ts-us", "unix_micros(cast(ts as timestamp))",
      "--value", "cast(round(value * 100) as bigint)",
      "--outfile", s"$tmp/twap"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "readability", "--text", "text", "--id", "doc_id",
      "--outfile", s"$tmp/readability"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "luhn", "--text", "concat('x 4', lpad(cast(doc_id as string), 14, '0'), '1 y')",
      "--id", "doc_id", "--outfile", s"$tmp/luhn"))
    locally {
      val spark = GraftSession.builder("verifyWave7", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val ev = graft.sources.PartitionedFiles.readParquet(spark, events)
      val dd = graft.sources.PartitionedFiles.readParquet(spark, docs)
      def same(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
        a.except(b).count() == 0 && b.except(a).count() == 0
      val okT = same(
        graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/twap"),
        graft.operators.Timeseries.timeWeightedAvg(ev, col("user_id"),
          expr("unix_micros(cast(ts as timestamp))"),
          expr("cast(round(value * 100) as bigint)")))
      val okR = same(
        graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/readability"),
        graft.text.TextAnalysis.readability(dd, col("text"), col("doc_id")))
      val gotL = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/luhn")
      val okL = same(gotL,
        graft.text.TextPrep.luhnScreen(dd,
          expr("concat('x 4', lpad(cast(doc_id as string), 14, '0'), '1 y')"),
          col("doc_id")))
      println(s"TWAP_READABILITY_LUHN OK=${okT && okR && okL && gotL.count() > 0}")
      spark.stop()
    }

    // zonemap: write-clustered + pruned read round-trip vs plain filter
    Cli.main(Array("-i", docs, "-f", "parquet",
      "zonemap", "--action", "write", "--out", s"$tmp/zm/docs",
      "--key", "doc_id", "--parts", "6"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "zonemap", "--action", "read", "--out", s"$tmp/zm/docs",
      "--key", "doc_id", "--lo", "100", "--hi", "199",
      "--outfile", s"$tmp/zmread"))
    locally {
      val spark = GraftSession.builder("verifyZm", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val dd = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val got = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/zmread")
      val exp = dd.filter(col("doc_id") >= 100 && col("doc_id") <= 199)
      val ok = got.except(exp).count() == 0 && exp.except(got).count() == 0
      println(s"ZONEMAP=${got.count()} OK=${ok && got.count() > 0}")
      spark.stop()
    }

    // zonemap string family: build stats over the string column, read
    // a string range (non-numeric --lo/--hi routes to the string
    // overload), equal to the plain filtered read
    Cli.main(Array("-i", docs, "-f", "parquet",
      "zonemap", "--action", "build", "--out", s"$tmp/zm/docs", "--key", "source"))
    Cli.main(Array("-i", docs, "-f", "parquet",
      "zonemap", "--action", "read", "--out", s"$tmp/zm/docs",
      "--key", "source", "--lo", "src10", "--hi", "src15",
      "--outfile", s"$tmp/zmreadstr"))
    locally {
      val spark = GraftSession.builder("verifyZmStr", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val dd = graft.sources.PartitionedFiles.readParquet(spark, docs)
      val got = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/zmreadstr")
      val exp = dd.filter(col("source") >= "src10" && col("source") <= "src15")
      val ok = got.except(exp).count() == 0 && exp.except(got).count() == 0
      println(s"ZONEMAP_STR=${got.count()} OK=${ok && got.count() > 0}")
      spark.stop()
    }

    // index-compact: build a postings index and append a drop in a
    // LIVE session (not stopped — Cli.main's getOrCreate reuses it, so
    // the in-memory catalog carries the table into the CLI call; with
    // a persistent metastore the command works across invocations),
    // then the CLI compacts it to one base partition and reports stats
    locally {
      val spark = GraftSession.builder("seedIdx", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      val whDir = java.nio.file.Files.createTempDirectory("drive_idx").toString
      spark.sql(s"CREATE DATABASE IF NOT EXISTS drive_idx LOCATION '$whDir'")
      val base = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta")).toDF("doc_id", "text")
      val drop = Seq((3L, "alpha beta beta")).toDF("doc_id", "text")
      graft.text.SearchIndex.create(base, col("text"), col("doc_id"),
        "drive_idx.posts", nBuckets = 2)
      graft.text.SearchIndex.append(drop, col("text"), col("doc_id"),
        "drive_idx.posts", dropId = "d0")
      // no spark.stop(): the CLI call below must see the catalog
    }
    Cli.main(Array("-f", "parquet", "index-compact", "--kind", "postings",
      "--table", "drive_idx.posts", "--outfile", s"$tmp/idxcompact"))
    locally {
      val spark = GraftSession.builder("verifyIdx", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val st = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/idxcompact")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val ok = st.contains(("postings", "partitions_after", 1L)) &&
        st.exists { case (_, k, v) => k == "partitions_before" && v == 2L }
      println(s"INDEX_COMPACT=${st.length} OK=$ok")
      spark.stop()
    }

    // r15: warehouse maintain — a merge chain trips the owner-spread
    // threshold; ONE CLI verb compacts and vacuums; reads bit-equal
    val mroot = java.nio.file.Files.createTempDirectory("drive_maint").toString + "/t"
    locally {
      val spark = GraftSession.builder("seedMaint", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      val base = (1L to 30L).map(j => j -> s"d$j").toDF("doc_id", "text")
      require(graft.sources.Versioned.promoteBucketed(base, mroot, "doc_id", 8).promoted)
      for (i <- 1 to 4)
        require(graft.sources.Versioned.merge(
          Seq((100L + i, s"x$i", false)).toDF("doc_id", "text", "del"),
          mroot, deleted = col("del")).merged)
      spark.stop()
    }
    Cli.main(Array("-f", "parquet", "promote", "--action", "maintain",
      "--root", mroot, "--max-owner-dirs", "2", "--retain", "1",
      "--outfile", s"$tmp/maint"))
    locally {
      val spark = GraftSession.builder("verifyMaint", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val rep = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/maint")
        .collect().map(r => (r.getString(1), r.getString(2))).toMap
      val after = graft.sources.Versioned.describe(spark, mroot)
        .collect().map(r => (r.getString(0), r.getString(1))).toMap
      val rows = graft.sources.Versioned.read(spark, mroot).count()
      val ok = rep("compacted") == "true" && after("owner_directories") == "1" &&
        rows == 34L
      println(s"MAINTAIN=${rep.size} OK=$ok")
      spark.stop()
    }

    // r15: rebucket via the CLI — 8 -> 16 buckets, content row-equal
    Cli.main(Array("-f", "parquet", "promote", "--action", "rebucket",
      "--root", mroot, "--buckets", "16", "--outfile", s"$tmp/rebkt"))
    locally {
      val spark = GraftSession.builder("verifyRebkt", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val after = graft.sources.Versioned.describe(spark, mroot)
        .collect().map(r => (r.getString(0), r.getString(1))).toMap
      val ok = after("num_buckets") == "16" &&
        graft.sources.Versioned.read(spark, mroot).count() == 34L &&
        graft.sources.Versioned.lookup(spark, mroot, 101L).count() == 1L
      println(s"REBUCKET=${after("num_buckets")} OK=$ok")
      spark.stop()
    }

    // r15: merge --zone-cluster — staged rows range-cluster on the
    // zone column; the merged read stays exact
    val zcroot = java.nio.file.Files.createTempDirectory("drive_zc").toString + "/t"
    locally {
      val spark = GraftSession.builder("seedZc", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      val base = (1L to 60L).map(j => j -> s"d$j").toDF("doc_id", "text")
        .repartitionByRange(4, col("doc_id"))
      require(graft.sources.Versioned.promoteBucketed(base, zcroot, "doc_id", 4,
        zoneCols = Seq("doc_id")).promoted)
      val drop = (1L to 60L).filter(_ % 5 == 0).map(j => (j, s"d$j v2", false))
        .toDF("doc_id", "text", "del")
      graft.sources.PartitionedFiles.writeParquet(drop, s"$tmp/zcdrop", 2)
      spark.stop()
    }
    Cli.main(Array("-i", s"$tmp/zcdrop", "-f", "parquet", "promote", "--action", "merge",
      "--root", zcroot, "--deleted", "del", "--zone-cluster", "true",
      "--outfile", s"$tmp/zcmerge"))
    locally {
      val spark = GraftSession.builder("verifyZc", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      val got = graft.sources.Versioned.read(spark, zcroot)
        .as[(Long, String)].collect().toMap
      val ok = got.size == 60 && got(5L) == "d5 v2" && got(7L) == "d7" &&
        graft.sources.Versioned.readRange(spark, zcroot, "doc_id", 10L, 20L)
          .count() == 11L
      println(s"ZONE_CLUSTER_MERGE=${got.size} OK=$ok")
      spark.stop()
    }

    // r15: index-maintain — the append history exceeds the partition
    // threshold; one CLI verb compacts (zero-downtime view swap) and
    // vacuums superseded generations; probes stay exact
    locally {
      val spark = GraftSession.builder("seedIdxM", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      val whDir = java.nio.file.Files.createTempDirectory("drive_idxm").toString
      spark.sql(s"CREATE DATABASE IF NOT EXISTS drive_idxm LOCATION '$whDir'")
      val base = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta")).toDF("doc_id", "text")
      graft.text.SearchIndex.create(base, col("text"), col("doc_id"),
        "drive_idxm.posts", nBuckets = 2)
      for (i <- 0 until 3)
        graft.text.SearchIndex.append(
          Seq((10L + i, s"alpha beta run$i")).toDF("doc_id", "text"),
          col("text"), col("doc_id"), "drive_idxm.posts", dropId = s"d$i")
      // no spark.stop(): the CLI call below must see the catalog
    }
    Cli.main(Array("-f", "parquet", "index-maintain", "--kind", "postings",
      "--table", "drive_idxm.posts", "--max-partitions", "2",
      "--keep-previous", "false", "--outfile", s"$tmp/idxmaint"))
    locally {
      val spark = GraftSession.builder("verifyIdxM", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val st = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/idxmaint")
        .collect().map(r => (r.getString(1), r.getString(2)))
      val ok = st.contains(("partitions_after", "1")) &&
        st.contains(("compacted", "true")) &&
        st.exists { case (k, v) => k == "vacuumed" && v.contains("__g00001") }
      println(s"INDEX_MAINTAIN=${st.length} OK=$ok")
      spark.stop()
    }

    // r15: tail-feed — the streaming change-feed consumer as a CLI
    // verb: first call drains the publish history into diff rows;
    // a re-run with nothing new published emits nothing (the file
    // source's checkpointed offsets); a later merge arrives as
    // exactly its own diff
    val froot = java.nio.file.Files.createTempDirectory("drive_feed").toString + "/t"
    val fck = java.nio.file.Files.createTempDirectory("drive_feed_ck").toString
    locally {
      val spark = GraftSession.builder("seedFeed", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      require(graft.sources.Versioned.promoteBucketed(
        Seq(1L -> "a", 2L -> "b").toDF("doc_id", "text"), froot, "doc_id", 4).promoted)
      require(graft.sources.Versioned.merge(
        Seq((2L, "b v2", false), (3L, "c", false)).toDF("doc_id", "text", "del"),
        froot, deleted = col("del")).merged)
      spark.stop()
    }
    Cli.main(Array("-f", "parquet", "promote", "--action", "tail-feed",
      "--root", froot, "--checkpoint", fck,
      "--diff-key", "doc_id", "--diff-content", "text",
      "--outfile", s"$tmp/feed1"))
    locally {
      val spark = GraftSession.builder("verifyFeed", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      val got = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/feed1")
        .select(col("version"), col("doc_id"), col("status"))
        .as[(Int, Long, String)].collect().toSet
      val ok = got == Set((1, 1L, "added"), (1, 2L, "added"),
        (2, 1L, "unchanged"), (2, 2L, "changed"), (2, 3L, "added"))
      println(s"TAILFEED=${got.size} OK=$ok")
      // publish one more version for the resume run below
      require(graft.sources.Versioned.merge(
        Seq((1L, null.asInstanceOf[String], true)).toDF("doc_id", "text", "del"),
        froot, deleted = col("del")).merged)
      spark.stop()
    }
    Cli.main(Array("-f", "parquet", "promote", "--action", "tail-feed",
      "--root", froot, "--checkpoint", fck,
      "--diff-key", "doc_id", "--diff-content", "text",
      "--outfile", s"$tmp/feed2"))
    locally {
      val spark = GraftSession.builder("verifyFeed2", "local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      val got = graft.sources.PartitionedFiles.readParquet(spark, s"$tmp/feed2")
        .select(col("version"), col("doc_id"), col("status"))
        .as[(Int, Long, String)].collect().toSet
      val ok = got == Set((3, 1L, "removed"), (3, 2L, "unchanged"), (3, 3L, "unchanged"))
      println(s"TAILFEED_RESUME=${got.size} OK=$ok")
      spark.stop()
    }
  }
}

