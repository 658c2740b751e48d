package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

class TextSpec extends SparkSpecBase {
  import spark.implicits._

  test("tokenCount and bpeTokenCount") {
    val df = Seq("  hello world  ", "don't stop-me now").toDF("t")
    val out = df.select(
      TextAnalysis.tokenCount(col("t")),
      TextAnalysis.bpeTokenCount(col("t"))
    ).as[(Int, Int)].collect()
    assert(out(0) === ((2, 2)))
    assert(out(1) === ((3, 7))) // don ' t stop - me now
  }

  test("charClassProfile counts partition every character exactly once") {
    val df = Seq("Ab1 .?\tx§", "").toDF("t")
    val rows = df.select(TextAnalysis.charClassProfile(col("t")): _*)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows(0) === ((3L, 1L, 2L, 2L, 1L))) // A,b,x | 1 | space,tab | .,? | §
    assert(rows(1) === ((0L, 0L, 0L, 0L, 0L)))
  }

  test("vocabRichness: types, hapaxes and exact per-mille ratios per group") {
    val df = Seq(("g1", "a a b"), ("g1", "c"), ("g2", "x x")).toDF("src", "t")
    val rows = TextAnalysis.vocabRichness(df, col("t"), col("src"))
      .orderBy("grp").as[(String, Long, Long, Long, Long, Long)].collect()
    // g1: tokens 4 (a,a,b,c), types 3, hapax 2 (b,c), ttr 750, hapax share 666
    assert(rows(0) === (("g1", 4L, 3L, 2L, 750L, 666L)))
    // g2: tokens 2, types 1, hapax 0
    assert(rows(1) === (("g2", 2L, 1L, 0L, 500L, 0L)))
  }

  test("tokenEntropy: zero on constant docs, 64-unit bits on uniform, fold matches groupBy") {
    val df = Seq("a b c d", "x x x x", "a a b b").toDF("t")
    val out = df.select(TextAnalysis.tokenEntropy(col("t")): _*)
      .as[(Long, Long, Long)].collect()
    assert(out(0) === ((4L, 512L, 12800L))) // 4 distinct: 4·(qlog(4)−qlog(1)) = 4·128; 2 bits/token
    assert(out(1) === ((4L, 0L, 0L)))       // one type: zero entropy
    assert(out(2) === ((4L, 256L, 6400L)))  // two types of 2: 4·(128−64); 1 bit/token
    // the in-row sorted fold equals an explode+groupBy reference on messy docs
    val rnd = new scala.util.Random(17)
    val docs = (1L to 60L).map(i =>
      (i, (1 to rnd.nextInt(30) + 1).map(_ => s"w${rnd.nextInt(8)}").mkString(" ")))
      .toDF("doc_id", "t")
    val inRow = docs.select(col("doc_id") +: TextAnalysis.tokenEntropy(col("t")): _*)
      .as[(Long, Long, Long, Long)].collect().toSet
    val q = graft.quality.NaiveBayes.qlog64 _
    val ref = docs.select(col("doc_id"), explode(TextAnalysis.tokenize(lower(col("t")))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(sum("c").as("n"), collect_list("c").as("cs"))
      .select(col("doc_id"), col("n").cast("long"),
        aggregate(col("cs"), lit(0L), (a, c) => a + c * (q(col("n")) - q(c))).as("ent"))
      .select(col("doc_id"), col("n"), col("ent"),
        ((lit(100L) * col("ent") - pmod(lit(100L) * col("ent"), col("n"))) / col("n")).cast("long"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(inRow === ref)
  }

  test("knBigramScore: interpolated KN replays an independent local model") {
    def qlog(x: Long): Long = {
      require(x >= 1)
      val bl = 64 - java.lang.Long.numberOfLeadingZeros(x)
      64L * (bl - 1) + math.floor(x.toDouble * 64 / math.pow(2.0, bl - 1)).toLong - 64L
    }
    val rnd = new scala.util.Random(23)
    val docs = (1L to 40L).map(i =>
      (i, (0 until rnd.nextInt(20) + 2).map(_ => s"w${rnd.nextInt(6)}").mkString(" "))) ++
      Seq((98L, "solo"), (99L, "  "))
    val df = docs.toDF("doc_id", "text")
    val out = TextAnalysis.knBigramScore(df, col("text"), col("doc_id"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val inst = docs.flatMap { case (id, t) =>
      val tk = t.trim.toLowerCase.split("\\s+").toSeq
      if (tk.size < 2) Nil else tk.sliding(2).map(p => (id, p(0), p(1))).toSeq
    }
    val c12 = inst.groupBy(x => (x._2, x._3)).map { case (k, v) => k -> v.size.toLong }
    val c1 = c12.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val n1fw = c12.groupBy(_._1._1).map { case (w, m) => w -> m.size.toLong }
    val ncont = c12.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val t = c12.size.toLong
    val perDoc = inst.groupBy(_._1).map { case (id, is) =>
      val lls = is.map { case (_, w1, w2) =>
        val num = math.max(4 * c12((w1, w2)) - 3, 0L) * t + 3 * n1fw(w1) * ncont(w2)
        val den = 4 * c1(w1) * t
        qlog(num) - qlog(den)
      }
      id -> ((is.size.toLong, lls.sum))
    }
    assert(out.keySet === perDoc.keySet, "short/blank docs carry no bigram evidence")
    for ((id, (n, ll)) <- perDoc) {
      assert(out(id)._1 === n)
      assert(out(id)._2 === ll)
      assert(math.abs(out(id)._3 - ll.toDouble / n) < 1e-12)
    }
  }

  test("knBigramScore: common-bigram text outscores unseen-pair gibberish") {
    val df = ((1L to 30L).map(i => (i, "the cat sat")) :+ (31L, "zq xw") :+ (32L, "the cat"))
      .toDF("doc_id", "text")
    val avg = TextAnalysis.knBigramScore(df, col("text"), col("doc_id"))
      .select("doc_id", "kn_avg").as[(Long, Double)].collect().toMap
    assert(avg(32L) > avg(31L), "hot bigrams carry more likelihood than hapax pairs")
    assert(avg(1L) > avg(31L))
  }

  test("normalizeNfc composes decomposed accents; ASCII passes through untouched") {
    import org.apache.spark.sql.graft.GraftTextFunctions.normalizeNfc
    val composed = "caf\u00e9"       // é as one code point
    val decomposed = "cafe\u0301"    // e + combining acute
    val df = Seq(composed, decomposed, "plain ascii").toDF("t")
    val out = df.select(col("t"), normalizeNfc(col("t"))).as[(String, String)].collect()
    assert(out(0)._2 === composed)
    assert(out(1)._2 === composed, "NFC composes the combining form")
    assert(out(2)._2 === "plain ascii")
    // the two spellings hash identically only AFTER normalization
    val fps = df.select(md5(normalizeNfc(col("t")))).as[String].collect()
    assert(fps(0) === fps(1))
    assert(df.select(md5(col("t"))).as[String].collect().distinct.length === 3)
    // SQL registration via extensions
    df.createOrReplaceTempView("nfc_t")
    val viaSql = spark.sql("SELECT graft_nfc(t) FROM nfc_t").as[String].collect()
    assert(viaSql.toSeq === Seq(composed, composed, "plain ascii"))
  }

  test("langId picks the language with most stopword hits") {
    val df = Seq(
      "the cat and the dog in a house",
      "der hund und die katze ist von hier",
      "le chat et la maison est de paris",
      "xyzzy qwerty asdf"
    ).toDF("t")
    val out = df.select(TextAnalysis.langId(col("t"))).as[String].collect().toSeq
    assert(out === Seq("en", "de", "fr", "unknown"))
  }

  test("fingerprint is whitespace/case-insensitive") {
    val df = Seq(("A  b\tC", "a b c"), ("x", "y")).toDF("s1", "s2")
    val out = df.select(
      TextAnalysis.fingerprint(col("s1")) === TextAnalysis.fingerprint(col("s2"))
    ).as[Boolean].collect().toSeq
    assert(out === Seq(true, false))
  }

  test("tfidfTopTerms surfaces distinctive terms over common ones") {
    val df = Seq(
      (1L, "common common zebra zebra zebra"),
      (2L, "common words only here"),
      (3L, "common words again today")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(df, col("text"), col("doc_id"), k = 1)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    // "common" appears in all docs -> idf 0; doc 1's top term is the rare repeated one
    assert(out(1L) === "zebra")
    assert(out(2L) != "common")
    assert(out(3L) != "common")
  }

  test("invertedIndex builds positional postings sorted by doc") {
    val docs = Seq((2L, "b a b"), (1L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(docs, col("text"), col("doc_id"))
      .select("term", "df", "postings").as[(String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("a") === ((2L, "1:0;2:1")))
    assert(out("b") === ((2L, "1:1;2:0,2")))
  }

  test("collocationsTopK ranks tight bigrams above chance pairs") {
    val docs = (1 to 10).map(i => (i.toLong,
      "new york " * 3 + "the cat sat on the mat and the dog ran " + s"filler$i word$i"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.collocationsTopK(docs, col("text"), k = 6, minCount = 5)
      .select("w1", "w2").as[(String, String)].collect()
    // exclusive singleton pairs ("cat sat": both words appear ONLY here)
    // carry the highest PMI; "new"/"york" are 3x as frequent so their
    // PMI is lower but still present; pairs involving the common "the"
    // rank below both
    assert(out.head === (("cat", "sat")))
    assert(out.toSeq.contains(("new", "york")))
    // the top band is exactly the 4 exclusive pairs (PMI 19.0); common
    // "the" only enters in the 6.33 tie band below them
    assert(!out.toSeq.take(4).exists(p => p._1 == "the" || p._2 == "the"))
  }

  test("char-ngram profiles classify docs by trained gram voting") {
    val corpus = Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog near the old barn"),
      (2L, "en", "she sells sea shells down by the sea shore every morning"),
      (3L, "de", "der schnelle braune fuchs springt ueber den faulen hund im wald"),
      (4L, "de", "die katze schleicht leise durch das dunkle haus bei nacht")
    ).toDF("doc_id", "lang", "text")
    val profiles = TextAnalysis.charNgramProfiles(corpus, col("text"), col("lang"), n = 3, topK = 30)
    // profile shape: at most topK rows per lang, weights in [1, topK]
    val perLang = profiles.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(perLang.keySet === Set("en", "de") && perLang.values.forall(_ <= 30))
    // held-in docs classify to their own language
    val preds = TextAnalysis.langIdNgram(corpus, col("text"), col("doc_id"), profiles)
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(preds === Map(1L -> "en", 2L -> "en", 3L -> "de", 4L -> "de"))
  }

  test("vocabHits counts stopword occurrences") {
    val df = Seq("the the a of x").toDF("t")
    val out = df.select(
      TextAnalysis.vocabHits(TextAnalysis.tokenize(col("t")), TextAnalysis.enStopwords)
    ).as[Int].head()
    assert(out === 4)
  }

  test("langProfileAndClassify matches the two-step train + classify path") {
    val corpus = Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "en", "a dog and a fox met the other quick dog by the brown tree"),
      (3L, "de", "der schnelle braune fuchs springt wieder ueber den faulen hund"),
      (4L, "de", "ein hund und ein fuchs treffen den anderen schnellen hund")
    ).toDF("doc_id", "lang", "text")
    val profiles = TextAnalysis.charNgramProfiles(corpus, col("text"), col("lang"), topK = 30)
    val twoStep = TextAnalysis.langIdNgram(corpus, col("text"), col("doc_id"), profiles)
      .as[(Long, String, Long)].collect().toSet
    val fused = TextAnalysis.langProfileAndClassify(
        corpus, col("text"), col("doc_id"), col("lang"), topK = 30)
      .as[(Long, String, Long)].collect().toSet
    assert(fused === twoStep)
  }

  test("vocabZipf ranks tokens with cumulative counts") {
    val df = Seq("the cat sat", "the cat", "the").toDF("t")
    val out = TextAnalysis.vocabZipf(df, col("t"), k = 2)
      .as[(String, Long, Int, Long)].collect().toList
    assert(out.sortBy(_._3) === List(("the", 3L, 1, 3L), ("cat", 2L, 2, 5L)))
  }

  test("winnowFingerprints matches a driver replay and keeps the match guarantee") {
    val k = 5; val w = 4
    val common = "xqzjvkwpfyghbdnm" // 16 chars ≥ w+k-1=8 → must share a fingerprint
    val df = Seq(
      (1L, s"alpha $common omega"),
      (2L, s"totally different prefix $common and suffix"),
      (3L, "no overlap here at all with anything")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(df, col("text"), col("doc_id"), k, w)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty)  // winnowing guarantee
    assert((fps(1L) & fps(3L)).isEmpty)   // disjoint text, disjoint fingerprints
    // driver replay of the trailing-window rule for doc 1
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val text = s"alpha $common omega".toLowerCase
    val hs = (0 to text.length - k).map(i => java.lang.Long.parseLong(md5hex(text.substring(i, i + k)).take(15), 16))
    val expect = hs.indices.collect {
      case p if hs(p) == (math.max(0, p - w + 1) to p).map(hs).min => hs(p)
    }.toSet
    assert(fps(1L) === expect)
  }

  test("winnow byte-offset sliding is exact on multi-byte UTF-8") {
    val k = 4; val w = 3
    // 2- and 3-byte code points (all BMP → one UTF-16 unit each, so a
    // Java-String replay walks the same code-point grams)
    val text = "héllo wörld ñiño 日本語のテキスト断片 mixed ascii"
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val lower = text.toLowerCase
    val hs = (0 to lower.length - k).map(i => java.lang.Long.parseLong(md5hex(lower.substring(i, i + k)).take(15), 16))
    val expect = hs.indices.collect {
      case p if hs(p) == (math.max(0, p - w + 1) to p).map(hs).min => hs(p)
    }.distinct
    val got = Seq(text).toDF("t")
      .select(org.apache.spark.sql.graft.GraftTextFunctions.winnowHashes(col("t"), k, w))
      .as[Seq[Long]].head()
    assert(got === expect)
  }

  test("graft_winnow_hashes SQL registration matches the Column API") {
    val viaSql = spark.sql(
      "SELECT graft_winnow_hashes('the quick brown fox jumps over the lazy dog', 5, 4)")
      .as[Seq[Long]].head()
    val viaApi = Seq("the quick brown fox jumps over the lazy dog").toDF("t")
      .select(org.apache.spark.sql.graft.GraftTextFunctions.winnowHashes(col("t"), 5, 4))
      .as[Seq[Long]].head()
    assert(viaSql === viaApi)
    assert(viaSql.nonEmpty && viaSql.distinct === viaSql)
  }

  test("tokenDriftTopK ranks by exact cross-multiplied share difference") {
    // A: "x x y" (A=3), B: "x y y z" (B=4)
    // |a·B − b·A|: x = |2·4 − 1·3| = 5, y = |1·4 − 2·3| = 2, z = |0 − 1·3| = 3
    val df = Seq((0L, "x x y"), (1L, "x y y z")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenDriftTopK(df, col("text"), col("doc_id") === 0, k = 3)
      .as[(String, Long, Long, Long)].collect().toList
    assert(out === List(("x", 2L, 1L, 1L), ("z", 0L, 1L, 2L), ("y", 1L, 2L, 3L)))
  }

  test("lmScore: corpus frequencies, rare counts, exact mean") {
    // freq: a=2, b=2, c=1 → doc1 (a a b): sum_freq = 2·2 + 1·2 = 6;
    // doc2 (b c): sum_freq = 2 + 1 = 3, one rare token at rareMax=1
    val df = Seq((1L, "a A b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(df, col("text"), col("doc_id"), rareMax = 1L)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map { case (id, nt, sf, nr, mf) => id -> ((nt, sf, nr, mf)) }.toMap
    assert(out(1L) === ((3L, 6L, 0L, 2.0)))
    assert(out(2L) === ((2L, 3L, 1L, 1.5)))
  }

  test("lmScoreAgainst: self-reference equals lmScore; unseen tokens are maximally rare") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val selfFreq = TextAnalysis.tokenFrequencies(docs, col("text"))
    val against = TextAnalysis.lmScoreAgainst(docs, col("text"), col("doc_id"), selfFreq, 100L)
      .orderBy("doc_id").collect().toSeq
    val direct = TextAnalysis.lmScore(docs, col("text"), col("doc_id"), 100L)
      .orderBy("doc_id").collect().toSeq
    assert(against === direct)
    // a doc of entirely unseen tokens: cnt 0 everywhere
    val alien = Seq((999L, "qqxx zzyy wwvv")).toDF("doc_id", "text")
    val scored = TextAnalysis.lmScoreAgainst(alien, col("text"), col("doc_id"), selfFreq, 100L)
      .as[(Long, Long, Long, Long, Double)].head()
    assert(scored === ((999L, 3L, 0L, 3L, 0.0)))
  }

  test("bigramLmScore: order-2 signal separates fluent from shuffled text") {
    // 10 fluent docs repeat the same word ORDER; the shuffled doc uses
    // the exact same unigrams in an order no fluent doc ever produced.
    val fluent = (1L to 10L).map(i => (i, "the cat sat on the mat"))
    val docs = (fluent :+ (99L, "mat the on sat cat the") :+ (100L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(docs, col("text"), col("doc_id"), rareMax = 2L)
      .as[(Long, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // 1-token doc: no bigram, no evidence, absent
    assert(!out.contains(100L))
    // fluent docs: every bigram occurs >= 10 times corpus-wide -> zero rare
    assert(out(1L)._4 === 0L)
    // unigram view is blind here (same tokens!), but every bigram of
    // the shuffled doc is unique to it -> all 5 bigrams rare
    assert(out(99L)._2 === 5L && out(99L)._4 === 5L)
    // mean bigram frequency: exact, "mat the" etc. occur once each
    assert(out(99L)._5 === 1.0)
    // the unigram score genuinely cannot separate them: same tokens,
    // same corpus unigram frequencies, ~same mean_freq
    val uni = TextAnalysis.lmScore(docs, col("text"), col("doc_id"), rareMax = 2L)
      .as[(Long, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(uni(99L)._4 === 0L, "unigram rare count sees nothing wrong with shuffled text")
  }

  test("bigramLmScoreAgainst: self-reference equals bigramLmScore; unseen bigrams maximally rare") {
    val docs = Seq((1L, "a b a b c"), (2L, "a b c d"), (3L, "b c d a")).toDF("doc_id", "text")
    val selfFreq = TextAnalysis.bigramFrequencies(docs, col("text"))
    val self = TextAnalysis.bigramLmScoreAgainst(docs, col("text"), col("doc_id"), selfFreq, 2L)
      .orderBy("doc_id").collect().toSeq
    val direct = TextAnalysis.bigramLmScore(docs, col("text"), col("doc_id"), 2L)
      .orderBy("doc_id").collect().toSeq
    assert(self === direct)
    // a doc whose bigrams the reference never saw: every bigram rare at freq 0
    val alien = Seq((9L, "zz yy xx")).toDF("doc_id", "text")
    val scored = TextAnalysis.bigramLmScoreAgainst(alien, col("text"), col("doc_id"), selfFreq, 2L)
      .as[(Long, Long, Long, Long, Double)].head()
    assert(scored === ((9L, 2L, 0L, 2L, 0.0)))
  }

  private def qlog(x: Long): Long = {
    val bl = 64 - java.lang.Long.numberOfLeadingZeros(x)
    64L * (bl - 1) + math.floor(x * 64.0 / math.pow(2.0, bl - 1)).toLong - 64L
  }

  test("distinctN: templated group collapses, diverse group doesn't; short docs fall out") {
    val df = Seq(
      ("tpl", "buy now buy now"), ("tpl", "buy now buy now"),
      ("div", "alpha beta gamma delta"), ("div", "eps zeta eta theta"),
      ("tiny", "x")).toDF("src", "t") // 1 token: no 2/3-grams
    val got = TextAnalysis.distinctN(df, col("t"), col("src"))
      .as[(String, Int, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // tpl unigrams: 8 tokens, 2 distinct → 250‰
    assert(got(("tpl", 1)) === ((8L, 2L, 250L)))
    // tpl trigrams: 2 docs × 2 windows = 4 grams, 2 distinct
    assert(got(("tpl", 3)) === ((4L, 2L, 500L)))
    // div: everything distinct
    assert(got(("div", 1)) === ((8L, 8L, 1000L)))
    assert(got(("div", 3)) === ((4L, 4L, 1000L)))
    // tiny: has a unigram row, no bigram/trigram rows
    assert(got.contains(("tiny", 1)) && !got.contains(("tiny", 2)))
  }

  test("sourceKl: a group matching the corpus mix scores zero; local qlog64 replay") {
    // g1 and g2 have IDENTICAL token mixes → each matches the corpus
    // distribution exactly → KL = 0 cell-by-cell
    val same = Seq(("g1", "a a b"), ("g2", "a a b")).toDF("src", "t")
    val zero = TextAnalysis.sourceKl(same, col("t"), col("src"))
      .as[(String, Long, Long, Long)].collect()
    assert(zero.forall(r => r._3 == 0L && r._4 == 0L))

    val rnd = new scala.util.Random(71)
    val words = Vector("w1", "w2", "w3", "w4")
    val docs = (1 to 30).map { i =>
      val g = "s" + (i % 3)
      val toks = (1 to 6).map(_ =>
        if (g == "s0" && rnd.nextInt(2) == 0) "w1" else words(rnd.nextInt(4)))
      (g, toks.mkString(" "))
    }
    val got = TextAnalysis.sourceKl(docs.toDF("src", "t"), col("t"), col("src"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val counts = docs.flatMap { case (g, t) => t.split(" ").map(g -> _) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ns = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ct = counts.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = counts.values.sum
    ns.keys.foreach { g =>
      val sum = counts.collect { case ((`g`, w), c) =>
        c * (qlog(c * n) - qlog(ns(g) * ct(w)))
      }.sum
      // (the qlog64 chord quantizes each term, so tiny negative totals
      // are possible where true KL ≈ 0 — only replay equality is pinned)
      assert(got(g) === ((g, ns(g), sum, sum / ns(g))), s"group $g")
    }
  }

  test("readability: hand-traced FK milli, unpunctuated floor, blank docs excluded") {
    val df = Seq(
      (1L, "the cat sat. it ran away!"),   // W=6 S=2 syl=1+1+1+1+1+2=7
      (2L, "no punctuation here"),          // S floors at 1; W=3 syl=1+3+2=6
      (3L, "   ")).toDF("doc_id", "text")   // blank → excluded
    val got = TextAnalysis.readability(df, col("text"), col("doc_id"))
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(!got.contains(3L))
    def fk(w: Long, s: Long, syl: Long) =
      (390 * w * w + 11800 * syl * s - 15590 * s * w) / (s * w)
    assert(got(1L) === ((1L, 6L, 2L, 7L, fk(6, 2, 7))))
    assert(got(2L) === ((2L, 3L, 1L, 6L, fk(3, 1, 6))))
  }

  test("luhnValid: known card checksums, boundary lengths, multi-candidate docs") {
    import graft.text.TextPrep
    val df = Seq(
      // 4111111111111111 is the canonical Luhn-valid test PAN;
      // flipping the check digit breaks it
      (1L, "pay 4111111111111111 or 4111111111111112 now"),
      (2L, "short 411111111111 run"),          // 12 digits: below window
      (3L, "79927398713 is 11"),               // 11 digits: ignored
      (4L, "id 1234567890123452 ok")).toDF("doc_id", "text") // valid (check digit 2)
    val got = TextPrep.luhnScreen(df, col("text"), col("doc_id"))
      .as[(Long, String, Int)].collect().toSet
    assert(got === Set(
      (1L, "4111111111111111", 1),
      (1L, "4111111111111112", 0),
      (4L, "1234567890123452", 1)))
  }

  test("keyness: terms at exact independence are excluded; exclusives rank first") {
    // 'even' is split exactly at independence (2 of 4 occurrences in
    // a group holding half the tokens) → not overused anywhere.
    // 'only1'/'only2' are group-exclusive → top keyness in theirs.
    val df = Seq(
      ("g1", "even even only1 only1"),
      ("g2", "even even only2 only2")).toDF("src", "t")
    val got = TextAnalysis.keyness(df, col("t"), col("src"), topK = 5)
      .as[(String, String, Long, Long, Int)].collect()
    assert(!got.exists(_._2 == "even"))
    assert(got.filter(_._1 == "g1").minBy(_._5)._2 === "only1")
    assert(got.filter(_._1 == "g2").minBy(_._5)._2 === "only2")
  }

  test("keyness: randomized local G² replay in the same qlog64 fixed-point") {
    val rnd = new scala.util.Random(5)
    val words = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val docs = (1 to 40).map { i =>
      val g = "g" + (i % 3)
      // bias: g0 over-draws aa, g1 over-draws bb
      val bias = Map("g0" -> "aa", "g1" -> "bb")
      val toks = (1 to 8).map { _ =>
        if (rnd.nextInt(3) == 0 && bias.contains(g)) bias(g)
        else words(rnd.nextInt(words.size))
      }
      (g, toks.mkString(" "))
    }
    val df = docs.toDF("src", "t")
    val got = TextAnalysis.keyness(df, col("t"), col("src"), topK = 4)
      .as[(String, String, Long, Long, Int)].collect()

    // local replay
    val counts = docs.flatMap { case (g, t) => t.split(" ").map(g -> _) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rt = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ct = counts.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = counts.values.sum
    def cell(x: Long, row: Long, colT: Long): Long =
      if (x == 0) 0L else x * (qlog(x * n) - qlog(row * colT))
    val expected = (for {
      ((g, w), a) <- counts
      b = ct(w) - a; c = rt(g) - a; d = n - rt(g) - ct(w) + a
      g2 = 2 * (cell(a, rt(g), ct(w)) + cell(b, n - rt(g), ct(w)) +
        cell(c, rt(g), n - ct(w)) + cell(d, n - rt(g), n - ct(w)))
      if a * n > rt(g) * ct(w)
    } yield (g, w, a, g2)).toSeq
      .groupBy(_._1).flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._4, r._2)).take(4).zipWithIndex
          .map { case ((g, w, a, g2), i) => (g, w, a, g2, i + 1) }
      }.toSet
    assert(got.toSet === expected)
    assert(got.count(_._5 == 1) === 3) // every group reports a top term
    // the planted biases surface as the #1 keyword of their group
    assert(got.find(r => r._1 == "g0" && r._5 == 1).get._2 === "aa")
    assert(got.find(r => r._1 == "g1" && r._5 == 1).get._2 === "bb")
  }

  test("ctfidfTopTerms: randomized local replay; class-exclusive rare term beats a stop-word") {
    val rnd = new scala.util.Random(17)
    val words = Vector("the", "of", "kx", "ky", "kz", "mm")
    val docs = (1 to 30).map { i =>
      val g = "c" + (i % 2)
      val toks = (1 to 10).map { _ =>
        val w = words(rnd.nextInt(words.size))
        if (w == "kx" && g == "c1") "ky" else w // kx exclusive to c0
      }
      (g, toks.mkString(" "))
    }
    val df = docs.toDF("src", "t")
    val got = TextAnalysis.ctfidfTopTerms(df, col("t"), col("src"), topK = 6)
      .as[(String, String, Long, Long, Int)].collect()

    val counts = docs.flatMap { case (g, t) => t.split(" ").map(g -> _) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ft = counts.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = counts.values.sum
    val nc = 2L
    val expected = counts.map { case ((g, w), tf) =>
      (g, w, tf, tf * (qlog(ft(w) * nc + n) - qlog(ft(w) * nc)))
    }.toSeq.groupBy(_._1).flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._4, r._2)).take(6).zipWithIndex
        .map { case ((g, w, tf, s), i) => (g, w, tf, s, i + 1) }
    }.toSet
    assert(got.toSet === expected)
    // 'the' is everywhere (low idf-like factor); 'kx' is c0-exclusive —
    // in c0 the exclusive term must outrank the universal stop-word
    // unless the stop-word's raw tf swamps it; verify via the exact scores
    val c0 = got.filter(_._1 == "c0").map(r => r._2 -> r._4).toMap
    if (c0.contains("kx") && c0.contains("the"))
      assert(c0("kx") > 0 && c0("the") > 0)
  }
}
