package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaRecord, FakeCodec}

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private def media = Seq(
    MediaRecord(1L, "hello world".getBytes("UTF-8"), "img", Some(2), Some(2), None),
    MediaRecord(2L, Array[Byte](0, 1, 2, 3), "audio", None, None, Some(1000L)),
    MediaRecord(3L, Array.empty[Byte], "img", None, None, None)
  ).toDS()

  test("extractFeatures decodes batched per partition") {
    val out = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f).toMap
    assert(out(1L).n_bytes === 11L)
    assert(out(1L).header_hex === "68656c6c6f20776f") // "hello wo"
    assert(out(1L).decoded_ok)
    assert(out(2L).mean_byte === 1.5)
    assert(!out(3L).decoded_ok && out(3L).n_bytes === 0L)
  }

  test("byteFeatures declarative path agrees with typed path") {
    val declarative = Multimodal
      .byteFeatures(media.toDF(), col("media"), col("media_id"))
      .select("media_id", "n_bytes", "header_hex")
      .as[(Long, Long, String)].collect().map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    val typed = Multimodal.extractFeatures(media)
      .select("media_id", "n_bytes", "header_hex")
      .as[(Long, Long, String)].collect().map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    assert(declarative === typed)
  }

  test("frameSlices declarative path equals FakeCodec.frameSample") {
    val declarative = Multimodal
      .frameSlices(media.toDF(), col("media"), col("media_id"), frameSize = 4, stride = 2)
      .select("media_id", "frame_id", "frame")
      .as[(Long, Long, Array[Byte])].collect()
      .map { case (id, f, bytes) => (id, f, bytes.toSeq) }.toSet
    val typed = media.collect().flatMap { r =>
      FakeCodec.frameSample(r.media, frameSize = 4, stride = 2).zipWithIndex
        .map { case (frame, i) => (r.media_id, i.toLong * 2, frame.toSeq) }
    }.toSet
    assert(declarative === typed)
    assert(declarative.exists(_._1 == 1L)) // "hello world" = 11 bytes -> frames 0 and 2
  }

  test("detectFormat sniffs container magic bytes") {
    val rows = Seq(
      (1L, Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a)),           // PNG
      (2L, Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)),  // JPEG
      (3L, "RIFF1234WAVE".getBytes("UTF-8")),                                 // RIFF
      (4L, Array[Byte](0, 0, 0, 0x18, 0x66, 0x74, 0x79, 0x70)),              // mp4 ftyp at offset 4
      (5L, "plain text".getBytes("UTF-8"))
    ).toDF("id", "media")
    val out = rows.select(col("id"), Multimodal.detectFormat(col("media")).as("f"))
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "png", 2L -> "jpeg", 3L -> "riff", 4L -> "mp4", 5L -> "unknown"))
  }

  test("mediaStats aggregates byte totals per group") {
    val rows = Seq(("a", Array[Byte](1, 2, 3)), ("a", Array[Byte](1)), ("b", Array[Byte](9, 9))).toDF("g", "media")
    val out = Multimodal.mediaStats(rows, col("media"), col("g"))
      .select("grp", "n", "total_bytes", "min_bytes", "max_bytes")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(out === Set(("a", 2L, 4L, 1L, 3L), ("b", 1L, 2L, 2L, 2L)))
  }

  test("frameSample stub keeps stride shape") {
    val frames = FakeCodec.frameSample((0 until 100).map(_.toByte).toArray, frameSize = 10, stride = 2)
    assert(frames.length === 5)
    assert(frames.head.toSeq === (0 until 10).map(_.toByte))
  }

  test("aHash: mean-threshold bits, identical payloads share a hash") {
    import org.apache.spark.sql.functions.col
    // 64 bytes 0..63: samples are the bytes themselves, mean 31.5 →
    // bits 0..31 zero, 32..63 one
    val ramp = (0 until 64).map(_.toByte).toArray
    val df = Seq((1L, ramp), (2L, ramp), (3L, Array.fill(64)(7.toByte))).toDF("id", "m")
    val hashes = Multimodal.aHash(df, col("m"), col("id"))
      .as[(Long, String)].collect().toMap
    assert(hashes(1L) === "0" * 32 + "1" * 32)
    assert(hashes(2L) === hashes(1L))
    assert(hashes(3L) === "0" * 64) // constant payload: nothing above mean
    val groups = Multimodal.aHashDedup(df, col("m"), col("id"))
      .as[(Long, String, Long)].collect().map(r => r._2 -> ((r._1, r._3))).toMap
    assert(groups(hashes(1L)) === ((1L, 2L))) // min-id rep, two members
    assert(groups("0" * 64) === ((3L, 1L)))
  }

  test("native AHash64 bit-matches the composed HOF formulation") {
    import org.apache.spark.sql.functions.{col, expr, octet_length}
    // irregular lengths (sampling index rounding) + a sub-64-byte
    // payload (repeated samples) + text-like bytes
    val payloads = Seq(
      1L -> Array.tabulate(1)(_.toByte),
      2L -> Array.tabulate(63)(i => (i * 37 % 251).toByte),
      3L -> Array.tabulate(65)(i => (i * 91 % 256).toByte),
      4L -> Array.tabulate(1000)(i => (i * 17 % 256).toByte),
      5L -> "the quick brown fox jumps over the lazy dog".getBytes("UTF-8"))
    val df = payloads.toDF("id", "m")
    val native = Multimodal.aHash(df, col("m"), col("id"))
      .as[(Long, String)].collect().toMap
    val hof = df.filter(octet_length(col("m")) > 0)
      .select(col("id"), col("m").as("__m"), octet_length(col("m")).cast("long").as("__n"))
      .withColumn("__s", expr(
        "transform(sequence(0, 63), i -> " +
          "CAST(conv(hex(substring(__m, CAST((i * __n) DIV 64 AS INT) + 1, 1)), 16, 10) AS BIGINT))"))
      .withColumn("__t", expr("aggregate(__s, CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .select(col("id"), expr(
        "array_join(transform(__s, v -> CASE WHEN v * 64 > __t THEN '1' ELSE '0' END), '')"))
      .as[(Long, String)].collect().toMap
    assert(native === hof)
    // registered SQL surface
    df.createOrReplaceTempView("ahash_probe")
    val viaSql = spark.sql("SELECT id, graft_ahash64(m) AS h FROM ahash_probe WHERE octet_length(m) > 0")
      .as[(Long, String)].collect().toMap
    assert(viaSql === native)
  }

  test("energySegments merges consecutive active frames, splits on silence") {
    // 4 frames of 16 samples: loud, loud, silent (all 128 → energy 0), loud
    val loud = Array.fill[Byte](16)(0)          // (0-128)^2 · 16 = 262144 per frame
    val silent = Array.fill[Byte](16)(128.toByte)
    val payload = loud ++ loud ++ silent ++ loud
    val df = Seq((7L, payload)).toDF("media_id", "media")
    val segs = Multimodal.energySegments(df, col("media"), col("media_id"),
        frameSize = 16, minEnergyPerSample = 2048L)
      .orderBy("seg_start")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(segs.toSeq === Seq((0L, 1L, 2L, 2 * 262144L), (3L, 3L, 1L, 262144L)))
    // threshold is per-sample: a short tail frame must not get an
    // unfair advantage — 8 silent bytes stay inactive
    val tail = Multimodal.energySegments(
        Seq((8L, loud ++ silent.take(8))).toDF("media_id", "media"),
        col("media"), col("media_id"), frameSize = 16, minEnergyPerSample = 2048L)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(tail.toSeq === Seq((0L, 0L)))
  }

  test("media embed → quantize → cosine retrieval end to end") {
    import graft.similarity.Similarity
    import org.apache.spark.sql.functions.col
    // two near-identical payloads + one with a very different byte mix
    val recs = Seq(
      MediaRecord(1L, ("aaaa bbbb cccc" * 10).getBytes("UTF-8"), "img", None, None, None),
      MediaRecord(2L, ("aaaa bbbb cccd" * 10).getBytes("UTF-8"), "img", None, None, None),
      MediaRecord(3L, Array.tabulate(200)(i => (i % 251).toByte), "img", None, None, None)
    ).toDS()
    val embedded = Multimodal.embedMedia(recs).toDF()
    val corpus = Similarity.prepareQuantized(embedded, col("embedding"), col("media_id"))
    val queries = corpus.filter(col("vec_id") === 1L)
    val top = Similarity.cosineTopK(corpus, queries, k = 1)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect()
    assert(top.toList === List((1L, 2L))) // nearest neighbor is the near-dup
  }

  test("sceneCuts: repeated frames are no cut, a content switch is") {
    import org.apache.spark.sql.functions._
    // 4 identical 16-byte "frames" of one texture, then 4 of a very
    // different byte mix: one transition should clear the bit budget
    val still = "abcdabcdabcdabcd" * 4
    // byte-threshold pattern 0011 per 'abcd' vs 01 per 'az' — the
    // boundary transition flips 32 of 64 aHash bits, within-half
    // transitions flip none
    val other = "azazazazazazazaz" * 4
    val media = Seq((1L, still + other), (2L, still + still))
      .toDF("media_id", "text")
      .select(col("media_id"), col("text").cast("binary").as("media"))
    val out = Multimodal.sceneCuts(media, col("media"), col("media_id"),
        frameSize = 16, cutBits = 16)
      .select("media_id", "frame_id", "hamming", "is_cut")
      .as[(Long, Long, Long, Int)].collect()
    val byId = out.groupBy(_._1)
    // doc 2: all frames identical -> every hamming 0, zero cuts
    assert(byId(2L).forall(r => r._3 === 0L && r._4 === 0))
    // doc 1: exactly the still->other boundary (frame 4) is a cut;
    // transitions within each half are identical frames
    val cuts = byId(1L).filter(_._4 == 1).map(_._2).toSet
    assert(cuts === Set(4L), s"expected the boundary cut only: ${byId(1L).toList}")
  }
}
