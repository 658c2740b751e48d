package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.sources.Tables

/** SURVEY.md §2.6 — multimodal binary-column queries.
  *
  * The documents table's text bytes stand in for media payloads: the
  * binary transport, schema and batching are identical to real media;
  * only the codec is faked (see Multimodal.FakeCodec).
  */
object MultimodalQueries {

  private def asMedia(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"), col("source"), col("text").cast("binary").as("media"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.6/35a declarative byte features on a binary column (oracle-gated).
    "q_multimodal" -> ((s, dir) =>
      Multimodal.byteFeatures(asMedia(s, dir), col("media"), col("media_id"))),

    // §2.6/35h energy-based activity segmentation (audio-VAD
    // stand-in): 16-byte frames score Σ(v−128)², frames at or above
    // 2048·frame_len are active, consecutive active frames merge into
    // segments (oracle: the q_media_decode byte math per frame + a
    // gaps-and-islands window).
    "q_energy_segments" -> ((s, dir) =>
      Multimodal.energySegments(asMedia(s, dir), col("media"), col("media_id"),
        frameSize = 16, minEnergyPerSample = 2048L)),

    // §2.6/35c declarative frame sampling: every 4th 16-byte window
    // (oracle: hex-slice of the encoded blob in DuckDB).
    "q_frame_sample" -> ((s, dir) =>
      Multimodal.frameSlices(asMedia(s, dir), col("media"), col("media_id"), frameSize = 16, stride = 4)
        .select(col("media_id"), col("frame_id"), lower(hex(col("frame"))).as("frame_hex"))),

    // §2.6/35g scene-cut detection: per-frame aHash, hamming between
    // consecutive frames, cut when >= 16 of 64 bits flip (oracle:
    // frame hex slices -> the q_phash sampling math per frame -> a
    // lag window).
    "q_scene_cuts" -> ((s, dir) =>
      Multimodal.sceneCuts(asMedia(s, dir), col("media"), col("media_id"),
        frameSize = 16, cutBits = 16)),

    // §2.6/35d per-source media corpus stats (the partition-sizing /
    // routing aggregate that precedes any decode).
    "q_media_stats" -> ((s, dir) =>
      Multimodal.mediaStats(asMedia(s, dir), col("media"), col("source"))
        .withColumnRenamed("grp", "source")),

    // §2.6/35f perceptual-hash (aHash) dedup groups: 64 sampled bytes
    // thresholded on their integer mean, grouped by identical hash
    // (oracle: the same sampling replayed over the hex blob).
    "q_phash" -> ((s, dir) =>
      Multimodal.aHashDedup(asMedia(s, dir), col("media"), col("media_id"))),

    // §2.6/35b typed per-partition batched decode path (oracle-gated:
    // FakeCodec's header/mean byte arithmetic is replayed in DuckDB
    // blob SQL): the mapInPandas-shaped plumbing through
    // Dataset[MediaRecord].
    "q_media_decode" -> ((s, dir) => {
      import s.implicits._
      val media = asMedia(s, dir).select(
        col("media_id"),
        col("media"),
        lit("img").as("format"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("bigint").as("duration_ms")
      ).as[Multimodal.MediaRecord]
      Multimodal.extractFeatures(media).toDF()
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_energy_segments" ->
      """WITH b AS (
        |  SELECT doc_id AS media_id, hex(encode(text)) AS h,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents WHERE octet_length(encode(text)) > 0
        |), fr AS (
        |  SELECT media_id, h, n, unnest(generate_series(0, (n + 15) // 16 - 1)) AS f FROM b
        |), byt AS (
        |  SELECT media_id, f, unnest(generate_series(f * 16, least(n, f * 16 + 16) - 1)) AS i, h
        |  FROM fr
        |), v AS (
        |  SELECT media_id, f,
        |         (strpos('0123456789ABCDEF', substr(h, i*2+1, 1)) - 1) * 16 +
        |         (strpos('0123456789ABCDEF', substr(h, i*2+2, 1)) - 1) AS v
        |  FROM byt
        |), e AS (
        |  SELECT media_id, f, CAST(sum((v-128)*(v-128)) AS BIGINT) AS energy,
        |         CAST(count(*) AS BIGINT) AS flen
        |  FROM v GROUP BY media_id, f
        |), a AS (
        |  SELECT media_id, f, energy,
        |         f - row_number() OVER (PARTITION BY media_id ORDER BY f) AS isl
        |  FROM e WHERE energy >= 2048 * flen)
        |SELECT media_id, CAST(min(f) AS BIGINT) AS seg_start,
        |       CAST(max(f) AS BIGINT) AS seg_end,
        |       CAST(count(*) AS BIGINT) AS n_frames,
        |       CAST(sum(energy) AS BIGINT) AS energy
        |FROM a GROUP BY media_id, isl""".stripMargin,
    "q_multimodal" ->
      """SELECT doc_id AS media_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       lower(substr(hex(encode(text)), 1, 16)) AS header_hex,
        |       md5(text) AS payload_md5
        |FROM documents""".stripMargin,
    "q_media_stats" ->
      """SELECT source,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        |       CAST(MIN(octet_length(encode(text))) AS BIGINT) AS min_bytes,
        |       CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
        |FROM documents GROUP BY source""".stripMargin,
    "q_frame_sample" ->
      """SELECT media_id, f AS frame_id,
        |       lower(substr(hex(blob), CAST(f * 32 + 1 AS BIGINT), 32)) AS frame_hex
        |FROM (
        |  SELECT doc_id AS media_id, encode(text) AS blob,
        |         unnest(generate_series(0, (octet_length(encode(text)) + 15) // 16 - 1)) AS f
        |  FROM documents
        |) WHERE f % 4 = 0""".stripMargin,
    "q_phash" ->
      """WITH b AS (
        |  SELECT doc_id AS media_id, hex(encode(text)) AS h,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents WHERE octet_length(encode(text)) > 0
        |), s AS (
        |  SELECT media_id, i,
        |         (strpos('0123456789ABCDEF', substr(h, CAST((i*n)//64 AS BIGINT)*2+1, 1))-1)*16 +
        |         (strpos('0123456789ABCDEF', substr(h, CAST((i*n)//64 AS BIGINT)*2+2, 1))-1) AS v
        |  FROM b, (SELECT unnest(range(64)) AS i) t
        |), a AS (
        |  SELECT media_id,
        |         array_to_string(list(CASE WHEN v*64 > total THEN '1' ELSE '0' END ORDER BY i), '') AS ahash
        |  FROM (SELECT media_id, i, v, SUM(v) OVER (PARTITION BY media_id) AS total FROM s)
        |  GROUP BY media_id
        |)
        |SELECT min(media_id) AS media_id, ahash, count(*) AS group_n
        |FROM a GROUP BY ahash""".stripMargin,
    // per-frame aHash (q_phash's sampling math over each 16-byte hex
    // slice), then a lag window per media: hamming of consecutive
    // frame hashes, cut at >= 16 flipped bits.
    "q_scene_cuts" ->
      """WITH mb AS (
        |  SELECT doc_id AS media_id, hex(encode(text)) AS bh,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS nb
        |  FROM documents WHERE octet_length(encode(text)) > 0
        |), mf AS (
        |  SELECT media_id, unnest(generate_series(0, (nb + 15) // 16 - 1)) AS f, bh FROM mb
        |), fh AS (
        |  SELECT media_id, f, substr(bh, CAST(f * 32 + 1 AS BIGINT), 32) AS h FROM mf
        |), fs AS (
        |  SELECT media_id, f, i,
        |         (strpos('0123456789ABCDEF', substr(h, CAST((i * (len(h) // 2)) // 64 AS BIGINT) * 2 + 1, 1)) - 1) * 16 +
        |         (strpos('0123456789ABCDEF', substr(h, CAST((i * (len(h) // 2)) // 64 AS BIGINT) * 2 + 2, 1)) - 1) AS v
        |  FROM fh, (SELECT unnest(range(64)) AS i) t
        |), fa AS (
        |  SELECT media_id, f,
        |         array_to_string(list(CASE WHEN v * 64 > total THEN '1' ELSE '0' END ORDER BY i), '') AS ahash
        |  FROM (SELECT media_id, f, i, v, SUM(v) OVER (PARTITION BY media_id, f) AS total FROM fs)
        |  GROUP BY media_id, f
        |), fl AS (
        |  SELECT media_id, f AS frame_id, ahash,
        |         lag(ahash) OVER (PARTITION BY media_id ORDER BY f) AS prev
        |  FROM fa
        |)
        |SELECT media_id, frame_id, hamming, CAST(hamming >= 16 AS INT) AS is_cut
        |FROM (
        |  SELECT media_id, frame_id,
        |         CAST(len(list_filter(range(64),
        |           i -> substr(ahash, CAST(i + 1 AS BIGINT), 1)
        |                <> substr(prev, CAST(i + 1 AS BIGINT), 1))) AS BIGINT) AS hamming
        |  FROM fl WHERE prev IS NOT NULL
        |)""".stripMargin,
    // FakeCodec.decode replayed in pure SQL: hex-expand the blob, decode
    // each hex pair via strpos arithmetic, integral byte sum, ONE double
    // division (bit-equal to Spark's sum.toDouble / length).
    "q_media_decode" ->
      """WITH b AS (
        |  SELECT doc_id AS media_id, hex(encode(text)) AS h,
        |         octet_length(encode(text)) AS n
        |  FROM documents
        |), bytes AS (
        |  SELECT media_id, n, h, unnest(generate_series(0, n - 1)) AS i FROM b
        |), vals AS (
        |  SELECT media_id, n, h,
        |         (strpos('0123456789ABCDEF', substr(h, i*2+1, 1)) - 1) * 16 +
        |         (strpos('0123456789ABCDEF', substr(h, i*2+2, 1)) - 1) AS v
        |  FROM bytes
        |)
        |SELECT media_id, CAST(any_value(n) AS BIGINT) AS n_bytes,
        |       lower(substr(any_value(h), 1, 16)) AS header_hex,
        |       CAST(SUM(v) AS DOUBLE) / CAST(any_value(n) AS DOUBLE) AS mean_byte,
        |       any_value(n) > 0 AS decoded_ok
        |FROM vals GROUP BY media_id""".stripMargin
  )
}
