package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY.md §2.6): media payloads travel
  * as opaque `binary` columns with typed metadata alongside; decode /
  * feature-extraction runs batched per partition.
  *
  * The actual codec calls are STUBBED (this container has no image/
  * audio libraries — see `FakeCodec`); everything Spark-side is real:
  * schema, binary column plumbing, per-partition batching (the Scala
  * equivalent of `mapInPandas` batch shape), and partition sizing
  * guidance (media rows are large — size partitions by bytes via
  * `spark.sql.files.maxPartitionBytes`, not row count).
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRecord(
      media_id: Long,
      media: Array[Byte],
      format: String,       // "img" | "audio" | "video"
      width: Option[Int],
      height: Option[Int],
      duration_ms: Option[Long]
  )

  case class MediaFeatures(
      media_id: Long,
      n_bytes: Long,
      header_hex: String,
      mean_byte: Double,
      decoded_ok: Boolean
  )

  /** Deterministic stand-in for a real decoder (??? in production
    * terms: swap for an actual codec). Operates on raw bytes only, so
    * the plumbing it validates — batch iteration, binary transport,
    * schema — is exactly what a real codec needs. */
  object FakeCodec {
    def decode(bytes: Array[Byte]): (String, Double, Boolean) = {
      val header = bytes.take(8).map(b => f"${b & 0xff}%02x").mkString
      val mean = if (bytes.isEmpty) 0.0 else bytes.map(b => (b & 0xff).toLong).sum.toDouble / bytes.length
      (header, mean, bytes.nonEmpty)
    }

    /** Frame-sample stub: every `stride`-th fixed-size window of the
      * payload (the batch/stride shape of real video frame sampling). */
    def frameSample(bytes: Array[Byte], frameSize: Int, stride: Int): Seq[Array[Byte]] =
      bytes.grouped(frameSize).zipWithIndex.collect { case (f, i) if i % stride == 0 => f }.toSeq
  }

  /** Batched per-partition feature extraction — the mapInPandas-shaped
    * path: one codec context per partition, records streamed through
    * it, no per-row UDF overhead. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codecs would init native context here, once per partition
      it.map { r =>
        val (header, mean, ok) = FakeCodec.decode(r.media)
        MediaFeatures(r.media_id, r.media.length.toLong, header, mean, ok)
      }
    }
  }

  case class MediaEmbedding(media_id: Long, embedding: Seq[Float])

  /** Fake embedding model: a 16-bin byte histogram, L1-normalized —
    * the mapPartitions-shaped stage where a real image/audio encoder
    * (one model context per partition, records streamed through)
    * would produce its vector. Deterministic, so the downstream
    * retrieval path is testable end to end; swap `embed` for a real
    * model and every join/partition shape downstream stays valid. */
  def embedMedia(media: Dataset[MediaRecord], bins: Int = 16): Dataset[MediaEmbedding] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real encoders init weights here, once per partition
      it.map { r =>
        val hist = new Array[Long](bins)
        r.media.foreach(b => hist((b & 0xff) * bins / 256) += 1)
        val n = math.max(1L, r.media.length.toLong)
        MediaEmbedding(r.media_id, hist.toSeq.map(h => h.toFloat / n))
      }
    }
  }

  /** Declarative frame sampling: every `stride`-th `frameSize`-byte
    * window of the payload (the trailing partial frame included, like
    * [[FakeCodec.frameSample]]). Pure Column ops — sequence + explode
    * + binary substring — so frame extraction runs inside codegen and
    * scales row-parallel with no shuffle; a real video pipeline swaps
    * the byte-window for codec keyframe offsets but keeps this plan
    * shape (explode of per-row frame indices). */
  def frameSlices(df: DataFrame, media: org.apache.spark.sql.Column, id: org.apache.spark.sql.Column,
      frameSize: Int, stride: Int): DataFrame = {
    require(frameSize >= 1 && stride >= 1)
    df.select(id.as("media_id"), media.as("__m"))
      .withColumn("__nf", expr(s"(octet_length(__m) + ${frameSize - 1}) div $frameSize"))
      .filter(col("__nf") > 0)
      .select(col("media_id"), col("__m"),
        explode(sequence(lit(0L), col("__nf") - 1)).as("frame_id"))
      .filter(col("frame_id") % stride === 0)
      .select(col("media_id"), col("frame_id"),
        expr(s"substring(__m, frame_id * $frameSize + 1, $frameSize)").as("frame"))
  }

  /** Container format sniffing from magic bytes — the first gate of
    * any media ingest (route by real format, not file extension).
    * Declarative prefix compares on the binary column (codegen). */
  def detectFormat(media: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def magic(hexPrefix: String) =
      lower(hex(substring(media, 1, hexPrefix.length / 2))) === hexPrefix.toLowerCase
    when(magic("89504E47"), "png")
      .when(magic("FFD8FF"), "jpeg")
      .when(magic("47494638"), "gif")
      .when(magic("52494646"), "riff") // wav/avi/webp container
      .when(magic("66747970") || lower(hex(substring(media, 5, 4))) === "66747970", "mp4") // ftyp at 0 or 4
      .when(magic("494433") || magic("FFFB"), "mp3")
      .otherwise("unknown")
  }

  /** Per-group media corpus stats (count / bytes / size extremes) —
    * what a pipeline uses to size `maxPartitionBytes` and decide
    * routing before any decode. One hash aggregate, integral sums. */
  def mediaStats(df: DataFrame, media: org.apache.spark.sql.Column,
      group: org.apache.spark.sql.Column): DataFrame =
    df.groupBy(group.as("grp"))
      .agg(
        count(lit(1)).as("n"),
        sum(octet_length(media).cast("bigint")).as("total_bytes"),
        min(octet_length(media)).cast("bigint").as("min_bytes"),
        max(octet_length(media)).cast("bigint").as("max_bytes"))

  /** Perceptual hash (aHash) of a media payload: 64 evenly-spaced
    * byte samples (the stand-in for an 8×8 downscaled luma grid — a
    * real image pipeline swaps the byte sampling for decode+resize
    * and keeps everything after), each thresholded against the
    * integer mean of the 64 samples (`v·64 > Σv` — no division),
    * packed as a 64-char bit string. Identical aHashes ⇒ perceptual
    * duplicates; the standard first pass of image dedup. Native
    * codegen expression ([[org.apache.spark.sql.graft.AHash64]]) —
    * one tight loop over the binary, row-parallel, no shuffle. Empty
    * payloads are dropped (no pixels, no hash). */
  def aHash(df: DataFrame, media: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column): DataFrame =
    df.filter(octet_length(media) > 0)
      .select(id.as("media_id"),
        org.apache.spark.sql.graft.GraftMediaFunctions.aHash64(media).as("ahash"))

  /** Perceptual dedup groups: one row per distinct aHash with the
    * min-id representative and the duplicate count — the same output
    * shape as exact text dedup, one shuffle on the (uniform) hash. */
  def aHashDedup(df: DataFrame, media: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column): DataFrame =
    aHash(df, media, id)
      .groupBy("ahash")
      .agg(min("media_id").as("media_id"), count(lit(1)).as("group_n"))
      .select(col("media_id"), col("ahash"), col("group_n"))

  /** Hamming distance between two equal-length bit strings (the
    * [[aHash]] output format) as a Column fold. */
  def hammingBits(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      bits: Int = 64): org.apache.spark.sql.Column =
    aggregate(
      transform(sequence(lit(0), lit(bits - 1)),
        i => when(a.substr(i + 1, lit(1)) =!= b.substr(i + 1, lit(1)), lit(1L))
          .otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)

  /** Scene-cut detection over sampled frames: perceptual hash every
    * consecutive frame ([[frameSlices]] stride 1 → [[aHash]]'s native
    * expression per frame), then flag frame transitions whose aHash
    * hamming distance clears `cutBits` — the shot-boundary heuristic
    * every video curation pipeline runs before per-scene sampling. A
    * real pipeline swaps the byte-window frames for decoded keyframes
    * and keeps this exact plan: explode (no shuffle) → native hash
    * (no shuffle) → ONE exchange on media_id for the lag window.
    * Emits every transition: (media_id, frame_id, hamming, is_cut). */
  def sceneCuts(df: DataFrame, media: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column, frameSize: Int, cutBits: Int): DataFrame = {
    val frames = frameSlices(df, media, id, frameSize, stride = 1)
      .filter(octet_length(col("frame")) > 0)
      .select(col("media_id"), col("frame_id"),
        org.apache.spark.sql.graft.GraftMediaFunctions.aHash64(col("frame")).as("ahash"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_id")
    frames
      .withColumn("__prev", lag("ahash", 1).over(w))
      .filter(col("__prev").isNotNull)
      .withColumn("hamming", hammingBits(col("ahash"), col("__prev")))
      .withColumn("is_cut", (col("hamming") >= cutBits).cast("int"))
      .select(col("media_id"), col("frame_id"), col("hamming"), col("is_cut"))
  }

  /** Energy-based activity segmentation (the audio-curation VAD
    * stand-in): payload bytes play unsigned PCM samples (a real
    * pipeline swaps in decoded audio and keeps everything after —
    * same contract as [[aHash]]'s byte grid). Non-overlapping frames
    * of `frameSize` samples score the integer energy
    * Σ (v − 128)² over the frame; a frame is ACTIVE when
    * energy ≥ minEnergyPerSample · frame_len (cross-multiplied, no
    * division); maximal runs of consecutive active frames become
    * segments via the gaps-and-islands trick (frame_id − run rank).
    * Plan shape: explode (no shuffle) → per-frame integer fold (no
    * shuffle) → ONE exchange on media_id for the run window + segment
    * aggregate. Output: (media_id, seg_start, seg_end, n_frames,
    * energy) — one row per voiced segment, everything integer. */
  def energySegments(df: DataFrame, media: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column, frameSize: Int,
      minEnergyPerSample: Long): DataFrame = {
    val frames = frameSlices(df, media, id, frameSize, stride = 1)
      .filter(octet_length(col("frame")) > 0)
    val energy = frames.select(
      col("media_id"), col("frame_id"),
      octet_length(col("frame")).cast("long").as("flen"),
      aggregate(
        transform(sequence(lit(1), octet_length(col("frame"))),
          i => conv(hex(substring(col("frame"), i, lit(1))), 16, 10).cast("long")),
        lit(0L), (acc, v) => acc + (v - 128L) * (v - 128L)).as("energy"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_id")
    energy
      .filter(col("energy") >= lit(minEnergyPerSample) * col("flen"))
      .withColumn("__isl", col("frame_id") - row_number().over(w))
      .groupBy(col("media_id"), col("__isl"))
      .agg(min("frame_id").as("seg_start"), max("frame_id").as("seg_end"),
        count(lit(1)).as("n_frames"), sum("energy").as("energy"))
      .select("media_id", "seg_start", "seg_end", "n_frames", "energy")
  }

  /** Declarative (codegen) variant for pure-byte features — when the
    * "decode" is expressible as Column ops, skip the typed boundary
    * entirely. Used by the oracle-gated q_multimodal. */
  def byteFeatures(df: DataFrame, media: org.apache.spark.sql.Column, id: org.apache.spark.sql.Column): DataFrame =
    df.select(
      id.as("media_id"),
      octet_length(media).cast("bigint").as("n_bytes"),
      lower(hex(substring(media, 1, 8))).as("header_hex"),
      md5(media).as("payload_md5")
    )
}
