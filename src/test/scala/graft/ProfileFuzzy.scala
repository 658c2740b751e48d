package graft

// scratch: q_fuzzy_join stage cost split; sbt "Test/runMain graft.ProfileFuzzy"
object ProfileFuzzy {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = GraftSession.builder("profile-fuzzy", "local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    graft.queries.DedupQueries.queries("q_fuzzy_join")(spark, dir).count() // warm

    val base = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").as("__t"))
    val g0 = base.select(col("doc_id"), length(col("__t")).as("__len"),
      explode(graft.dedup.Dedup.shinglesRaw(col("__t"), 3)).as("g")).distinct()
      .localCheckpoint(true)
    time("gram explode+distinct")(g0.count())
    val keep = g0.groupBy("g").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= 2 && col("__df") <= 50).select("g").localCheckpoint(true)
    time("docfreq filter")(println(s"  kept_grams=${keep.count()}"))
    val g = g0.join(keep, "g").localCheckpoint(true)
    time("gram join")(g.count())
    val cand = g.as("a")
      .join(g.as("b"), col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id")
        && abs(col("a.__len") - col("b.__len")) <= 6)
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("__shared"))
      .filter(col("__shared") >= 3)
      .select(col("doc_a"), col("doc_b")).localCheckpoint(true)
    time("candidate self-join")(println(s"  n_cand=${cand.count()}"))
    time("levenshtein verify") {
      cand.join(base.select(col("doc_id").as("doc_a"), col("__t").as("__ta")), "doc_a")
        .join(base.select(col("doc_id").as("doc_b"), col("__t").as("__tb")), "doc_b")
        .withColumn("dist", levenshtein(col("__ta"), col("__tb"), 6).cast("long"))
        .filter(col("dist").between(0, 6)).count()
    }
    spark.stop()
  }
}
