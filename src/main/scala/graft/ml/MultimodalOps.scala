package graft.ml

import graft.GQuery
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata.
  *
  * All three media families decode for REAL with zero external jars:
  * `javax.imageio` PNG through [[ImageCodec]], `javax.sound.sampled` WAV
  * through [[AudioCodec]], and MJPEG-in-AVI video through [[VideoCodec]]
  * (RIFF container walk + per-frame ImageIO JPEG decode) — each with a
  * correctness gate verifying an actual encode → decode round trip
  * against a codec-free SQL oracle. In all
  * cases the Spark-side shape is what matters at scale: decode runs
  * executor-side on the scan partitioning, media bytes never shuffle, and
  * only small extracted features flow downstream.
  */
object MultimodalOps {

  /** Schema of a multimodal asset row. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType),
      StructField("content_id", StringType))), nullable = true)))

  /** Build an asset table from the documents fixture: text bytes stand in
    * for media payloads (deterministic; no codec libs in this container).
    */
  def assets(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id").as("asset_id"),
      when(col("doc_id") % 2 === 0, lit("image/png")).otherwise(lit("audio/wav"))
        .as("media_type"),
      col("text").cast("binary").as("payload"),
      struct(
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        substring(md5(col("text")), 1, 8).as("content_id")).as("meta"))

  /** Synthetic PNG asset table: every row carries REAL PNG bytes (encoded
    * executor-side by `ImageIO` from the deterministic pixel formula in
    * [[ImageCodec.syntheticImage]]). Dimensions vary per asset (w ∈ [8,16],
    * h ∈ [8,14]) so decode genuinely recovers them from the PNG header.
    */
  def imageAssets(s: SparkSession, d: String): DataFrame = {
    val enc = udf((id: Long, w: Int, h: Int) =>
      ImageCodec.encodePng(ImageCodec.syntheticImage(id, w, h)))
    documents(s, d).select(
        col("doc_id").as("asset_id"),
        lit("image/png").as("media_type"),
        (lit(8) + col("doc_id") % 9).cast("int").as("gen_w"),
        (lit(8) + col("doc_id") % 7).cast("int").as("gen_h"))
      .withColumn("payload", enc(col("asset_id"), col("gen_w"), col("gen_h")))
      .drop("gen_w", "gen_h")
  }

  /** Real image decode → pixel statistics, executor-side; payloads never
    * shuffle and are dropped right after. Dimensions come from the decoded
    * PNG, not the generator.
    */
  def decodeImageStats(assets: DataFrame): DataFrame = {
    val dec = udf((p: Array[Byte]) => ImageCodec.decodeStats(p))
    assets.withColumn("s", dec(col("payload"))).drop("payload")
  }

  /** Real frame sampling: decode once per asset, emit one row per
    * horizontal band with its pixel stats ([[ImageCodec.frameStats]]).
    */
  def sampleImageFrames(assets: DataFrame, n: Int): DataFrame = {
    val fr = udf((p: Array[Byte]) => ImageCodec.frameStats(p, n))
    assets.select(col("asset_id"), explode(fr(col("payload"))).as("f"))
      .select(col("asset_id"), col("f.frame_idx").as("frame_idx"),
        col("f.f_h").as("f_h"), col("f.mean_r").as("mean_r"))
  }

  /** Synthetic WAV asset table: every row carries REAL RIFF/WAV bytes
    * (encoded executor-side by `javax.sound.sampled` from the
    * deterministic sample formula in [[AudioCodec.syntheticWave]]).
    * Lengths vary per asset (n ∈ [200,236]) so decode genuinely recovers
    * them from the PCM payload, not the generator.
    */
  def audioAssets(s: SparkSession, d: String): DataFrame = {
    val enc = udf((id: Long, n: Int) =>
      AudioCodec.encodeWav(AudioCodec.syntheticWave(id, n), 8000))
    documents(s, d).select(
        col("doc_id").as("asset_id"),
        lit("audio/wav").as("media_type"),
        (lit(200) + col("doc_id") % 37).cast("int").as("gen_n"))
      .withColumn("payload", enc(col("asset_id"), col("gen_n")))
      .drop("gen_n")
  }

  /** Real WAV decode → sample statistics, executor-side; payloads never
    * shuffle and are dropped right after. Format and length come from the
    * decoded RIFF stream, not the generator.
    */
  def decodeAudioStats(assets: DataFrame): DataFrame = {
    val dec = udf((p: Array[Byte]) => AudioCodec.decodeStats(p))
    assets.withColumn("s", dec(col("payload"))).drop("payload")
  }

  /** Synthetic MJPEG-AVI asset table: every row carries a REAL AVI
    * container (RIFF writer in [[VideoCodec]]) holding 3-6 quality-1.0
    * JPEG frames, encoded executor-side. Frame count, dimensions, and fps
    * vary per asset so decode genuinely recovers them from the container
    * headers and per-frame JPEG decode — not from the generator.
    */
  def videoAssets(s: SparkSession, d: String): DataFrame = {
    val enc = udf((id: Long, nf: Int, w: Int, h: Int, fps: Int) =>
      VideoCodec.encodeAvi(
        (0 until nf).map(f => VideoCodec.syntheticFrame(id, f, w, h)), fps))
    documents(s, d).select(
        col("doc_id").as("asset_id"),
        lit("video/x-msvideo").as("media_type"),
        (lit(3) + col("doc_id") % 4).cast("int").as("gen_nf"),
        (lit(16) + (col("doc_id") % 3) * 8).cast("int").as("gen_w"),
        (lit(16) + (col("doc_id") % 2) * 8).cast("int").as("gen_h"),
        (lit(10) + col("doc_id") % 5).cast("int").as("gen_fps"))
      .withColumn("payload", enc(col("asset_id"), col("gen_nf"),
        col("gen_w"), col("gen_h"), col("gen_fps")))
      .drop("gen_nf", "gen_w", "gen_h", "gen_fps")
  }

  /** Real video decode → one row per frame: RIFF walk, per-frame ImageIO
    * JPEG decode, stats executor-side; the AVI payload never shuffles —
    * the explode happens over the small stats array AFTER `drop("payload")`.
    */
  def decodeVideoFrames(assets: DataFrame): DataFrame = {
    val dec = udf((p: Array[Byte]) => {
      val (meta, frames) = VideoCodec.decodeFrameStats(p)
      (meta, frames)
    })
    assets.withColumn("v", dec(col("payload"))).drop("payload")
      .select(col("asset_id"),
        col("v._1.fps").as("fps"), col("v._1.n_frames").as("n_frames"),
        explode(col("v._2")).as("f"))
      .select(col("asset_id"), col("fps"), col("n_frames"),
        col("f.frame_idx").as("frame_idx"),
        col("f.f_w").as("f_w"), col("f.f_h").as("f_h"),
        col("f.mean_gray").as("mean_gray"))
  }

  /** Decode → feature vector, dispatching on `media_type` — every branch a
    * real JDK codec ([[ImageCodec]] PNG, [[AudioCodec]] WAV,
    * [[VideoCodec]] MJPEG-AVI); unknown types fail loudly. The decode
    * closure is the one place graft accepts opaque per-row code (a codec
    * cannot be a Catalyst expression); it runs executor-side on the scan
    * partitioning — payload bytes never shuffle, and `drop("payload")`
    * right after means only small features flow downstream. A production
    * build swaps the closure for an Arrow-batched bridge with identical
    * signature.
    */
  def decodeMediaFeatures(mediaType: String, payload: Array[Byte]): Array[Double] =
    mediaType match {
      case "image/png" =>
        val s = ImageCodec.decodeStats(payload)
        Array(s.width.toDouble, s.height.toDouble, s.mean_r, s.mean_g, s.mean_b)
      case "audio/wav" =>
        val s = AudioCodec.decodeStats(payload)
        Array(s.sample_rate.toDouble, s.n_samples.toDouble, s.mean, s.peak.toDouble, s.rms)
      case "video/x-msvideo" =>
        val (meta, frames) = VideoCodec.decodeFrameStats(payload)
        Array(meta.width.toDouble, meta.height.toDouble, meta.fps.toDouble,
          frames.length.toDouble,
          frames.map(_.mean_gray).sum.toDouble / frames.length)
      case other =>
        throw new IllegalArgumentException(s"no codec for media type $other")
    }

  /** Decode → feature columns via [[decodeMediaFeatures]]. */
  def decodeFeatures(assets: DataFrame): DataFrame = {
    val decode = udf((m: String, p: Array[Byte]) => decodeMediaFeatures(m, p))
    assets.withColumn("features", decode(col("media_type"), col("payload")))
      .drop("payload")
  }

  // Metadata extraction is pure SQL → oracle-checkable.
  private val qMultimodalMeta = GQuery(
    "q_multimodal_meta",
    (s, d) =>
      assets(s, d).select(
        col("asset_id"),
        col("media_type"),
        col("meta.n_bytes").as("n_bytes"),
        col("meta.content_id").as("content_id")),
    Some("""SELECT doc_id AS asset_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END
                     AS media_type,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   substr(md5(text), 1, 8) AS content_id
            FROM documents"""))

  // REAL decode gate: ImageIO-encoded PNGs are ImageIO-decoded and the
  // recovered dimensions + exact per-channel pixel means (plus the mean of
  // a 4x4 nearest-neighbor resize of the decoded raster) must match a
  // codec-free oracle that re-derives every pixel from the deterministic
  // generator formula. A wrong decode, a lossy write, a channel swap, or a
  // resize off-by-one all hash-mismatch.
  private val qMultimodalDecode = GQuery(
    "q_multimodal_decode",
    (s, d) =>
      decodeImageStats(imageAssets(s, d)).select(
        col("asset_id"),
        col("s.width").as("width"),
        col("s.height").as("height"),
        graft.functions.stableRound(col("s.mean_r"), 4).as("mean_r"),
        graft.functions.stableRound(col("s.mean_g"), 4).as("mean_g"),
        graft.functions.stableRound(col("s.mean_b"), 4).as("mean_b"),
        graft.functions.stableRound(col("s.rs_mean_r"), 4).as("rs_mean_r")),
    Some("""WITH dims AS (
              SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
              FROM documents
            ),
            px AS (
              SELECT doc_id, w, h, p % w AS x, p // w AS y
              FROM dims, (SELECT unnest(range(0, 224)) AS p) WHERE p < w * h
            ),
            full_stats AS (
              SELECT doc_id,
                     avg((doc_id * 31 + 7 * x + 13 * y) % 256) AS mr,
                     avg((doc_id * 17 + 5 * x + 11 * y) % 256) AS mg,
                     avg((doc_id * 29 + 3 * x + 19 * y) % 256) AS mb
              FROM px GROUP BY doc_id
            ),
            rs AS (
              SELECT doc_id,
                     avg((doc_id * 31 + 7 * ((p % 4) * w // 4)
                          + 13 * ((p // 4) * h // 4)) % 256) AS rr
              FROM dims, (SELECT unnest(range(0, 16)) AS p)
              GROUP BY doc_id
            )
            SELECT d.doc_id AS asset_id,
                   CAST(d.w AS INT) AS width,
                   CAST(d.h AS INT) AS height,
                   floor(f.mr * 10000 + 0.5) / 10000 AS mean_r,
                   floor(f.mg * 10000 + 0.5) / 10000 AS mean_g,
                   floor(f.mb * 10000 + 0.5) / 10000 AS mean_b,
                   floor(r.rr * 10000 + 0.5) / 10000 AS rs_mean_r
            FROM dims d
            JOIN full_stats f ON d.doc_id = f.doc_id
            JOIN rs r ON d.doc_id = r.doc_id"""))

  // REAL resize gate: PNG payloads go through the full payload-level
  // pipeline — decode, nearest-neighbor resample to a fixed 6x5 target,
  // PNG re-encode — and the RESIZED payloads are then independently
  // re-decoded; recovered dimensions and exact channel means must match a
  // codec-free oracle that re-derives each sampled source pixel from the
  // generator formula (x_src = x*w/6, y_src = y*h/5, integer floor). A
  // resize off-by-one, a lossy re-encode, or a channel swap all
  // hash-mismatch.
  private val qMultimodalResize = GQuery(
    "q_multimodal_resize",
    (s, d) =>
      decodeImageStats(resizeImages(imageAssets(s, d), 6, 5)).select(
        col("asset_id"),
        col("s.width").as("width"),
        col("s.height").as("height"),
        graft.functions.stableRound(col("s.mean_r"), 4).as("mean_r"),
        graft.functions.stableRound(col("s.mean_g"), 4).as("mean_g"),
        graft.functions.stableRound(col("s.mean_b"), 4).as("mean_b")),
    Some("""WITH dims AS (
              SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
              FROM documents
            ),
            px AS (
              SELECT doc_id, ((p % 6) * w) // 6 AS x, ((p // 6) * h) // 5 AS y
              FROM dims, (SELECT unnest(range(0, 30)) AS p)
            )
            SELECT doc_id AS asset_id,
                   CAST(6 AS INT) AS width,
                   CAST(5 AS INT) AS height,
                   floor(avg((doc_id * 31 + 7 * x + 13 * y) % 256) * 10000 + 0.5)
                     / 10000 AS mean_r,
                   floor(avg((doc_id * 17 + 5 * x + 11 * y) % 256) * 10000 + 0.5)
                     / 10000 AS mean_g,
                   floor(avg((doc_id * 29 + 3 * x + 19 * y) % 256) * 10000 + 0.5)
                     / 10000 AS mean_b
            FROM px GROUP BY doc_id"""))

  // REAL audio gate: javax.sound.sampled-encoded WAVs are decoded back —
  // RIFF header parse (sample rate, channels), little-endian 16-bit PCM
  // unpack — and the recovered format + integer-exact sample statistics
  // (mean, |peak|, rms) must match a codec-free oracle re-deriving every
  // sample from the deterministic waveform formula. A header misparse, an
  // endianness flip, or a sign-extension bug all hash-mismatch.
  private val qMultimodalAudio = GQuery(
    "q_multimodal_audio",
    (s, d) =>
      decodeAudioStats(audioAssets(s, d)).select(
        col("asset_id"),
        col("s.sample_rate").as("sample_rate"),
        col("s.channels").as("channels"),
        col("s.n_samples").as("n_samples"),
        graft.functions.stableRound(col("s.mean"), 4).as("mean"),
        col("s.peak").as("peak"),
        graft.functions.stableRound(col("s.rms"), 4).as("rms")),
    Some("""WITH dims AS (
              SELECT doc_id, 200 + doc_id % 37 AS n FROM documents
            ),
            smp AS (
              SELECT doc_id, n, (doc_id * 31 + 7 * t) % 4096 - 2048 AS s
              FROM dims, (SELECT unnest(range(0, 237)) AS t) WHERE t < n
            )
            SELECT doc_id AS asset_id,
                   8000 AS sample_rate,
                   1 AS channels,
                   CAST(max(n) AS BIGINT) AS n_samples,
                   floor(CAST(sum(s) AS DOUBLE) / max(n) * 10000 + 0.5)
                     / 10000 AS mean,
                   CAST(max(abs(s)) AS INT) AS peak,
                   floor(sqrt(CAST(sum(s * s) AS DOUBLE) / max(n)) * 10000 + 0.5)
                     / 10000 AS rms
            FROM smp GROUP BY doc_id"""))

  /** REAL image resize behind the (payload → payload) seam: ImageIO PNG
    * decode → exact nearest-neighbor raster resample
    * ([[ImageCodec.resizeNearest]]) → PNG re-encode. Runs executor-side
    * like decode; the resized payload stays local and only stats rows
    * flow downstream. Null/undecodable payloads return null (the caller's
    * filter decides whether that is an error).
    */
  def resizeImage(payload: Array[Byte], dw: Int, dh: Int): Array[Byte] = {
    if (payload == null) return null
    val img = ImageCodec.decode(payload)
    if (img == null) null
    else ImageCodec.encodePng(ImageCodec.resizeNearest(img, dw, dh))
  }

  /** Distributed resize over an asset table: payload column replaced by
    * the re-encoded resized PNG, n_bytes/content_id metadata refreshed.
    * Pure per-row work — no shuffle of its own at any scale.
    */
  def resizeImages(assets: DataFrame, dw: Int, dh: Int): DataFrame = {
    val rz = udf((p: Array[Byte]) => resizeImage(p, dw, dh))
    assets
      .withColumn("payload", rz(col("payload")))
      .withColumn("meta", struct(
        length(col("payload")).cast("long").as("n_bytes"),
        substring(md5(col("payload")), 1, 8).as("content_id")))
  }

  /** Frame sampling: split a media payload into `n` contiguous frames,
    * one row per frame with its own metadata — the explode happens AFTER
    * the per-asset scan so payload bytes still never shuffle (each frame
    * row carries only its slice), and downstream per-frame decode runs on
    * the same executor partitioning.
    */
  def sampleFrames(assets: DataFrame, n: Int): DataFrame = {
    assets
      .withColumn("frame_idx", explode(sequence(lit(0L), lit(n.toLong - 1L))))
      .withColumn("frame", expr("substring(payload, CAST(frame_idx * meta.n_bytes DIV " +
        s"$n AS INT) + 1, CAST((frame_idx + 1) * meta.n_bytes DIV $n - " +
        s"frame_idx * meta.n_bytes DIV $n AS INT))"))
      .select(col("asset_id"), col("media_type"), col("frame_idx"),
        length(col("frame")).cast("long").as("f_bytes"),
        substring(md5(col("frame")), 1, 8).as("f_id"),
        col("frame"))
  }

  // REAL frame gate: each decoded PNG is sliced into 4 horizontal bands
  // ("frames" of a still image; true multi-frame video decode is
  // q_multimodal_video) and per-band heights + red-channel means must match
  // the formula-derived oracle. Band boundary bugs shift rows between
  // bands and change the means.
  private val qMultimodalFrames = GQuery(
    "q_multimodal_frames",
    (s, d) =>
      sampleImageFrames(imageAssets(s, d), 4).select(
        col("asset_id"), col("frame_idx"), col("f_h"),
        graft.functions.stableRound(col("mean_r"), 4).as("mean_r")),
    Some("""WITH dims AS (
              SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
              FROM documents
            ),
            band AS (
              SELECT doc_id, w, h, i,
                     (i * h) // 4 AS y0, ((i + 1) * h) // 4 AS y1
              FROM dims, (SELECT unnest(range(0, 4)) AS i)
            )
            SELECT b.doc_id AS asset_id,
                   CAST(b.i AS INT) AS frame_idx,
                   CAST(b.y1 - b.y0 AS INT) AS f_h,
                   floor(avg((b.doc_id * 31 + 7 * (p % b.w)
                              + 13 * (b.y0 + p // b.w)) % 256) * 10000 + 0.5)
                     / 10000 AS mean_r
            FROM band b, (SELECT unnest(range(0, 224)) AS p)
            WHERE p < b.w * (b.y1 - b.y0)
            GROUP BY b.doc_id, b.i, b.y0, b.y1"""))

  // REAL video gate: VideoCodec-written MJPEG-AVIs are container-parsed and
  // frame-decoded back — RIFF walk (header fps / frame count), per-frame
  // ImageIO JPEG decode — and recovered fps, frame count, per-frame decoded
  // dimensions and the bit-exact solid-gray means must match a codec-free
  // oracle re-deriving them from the integer generator formula. Every
  // column is integral, so the compare has no float surface at all. A
  // header misparse, an off-by-one chunk walk, a dropped/duplicated frame,
  // or any JPEG quantization drift all hash-mismatch.
  private val qMultimodalVideo = GQuery(
    "q_multimodal_video",
    (s, d) => decodeVideoFrames(videoAssets(s, d)),
    Some("""WITH dims AS (
              SELECT doc_id, 3 + doc_id % 4 AS nf,
                     16 + (doc_id % 3) * 8 AS w, 16 + (doc_id % 2) * 8 AS h,
                     10 + doc_id % 5 AS fps
              FROM documents)
            SELECT doc_id AS asset_id,
                   CAST(fps AS INT) AS fps,
                   CAST(nf AS INT) AS n_frames,
                   CAST(i AS INT) AS frame_idx,
                   CAST(w AS INT) AS f_w, CAST(h AS INT) AS f_h,
                   CAST((doc_id * 31 + 7 * i) % 256 AS BIGINT) AS mean_gray
            FROM dims, (SELECT unnest(range(0, 7)) AS i) WHERE i < nf"""))

  val queries: Seq[GQuery] =
    Seq(qMultimodalMeta, qMultimodalDecode, qMultimodalResize,
      qMultimodalFrames, qMultimodalAudio, qMultimodalVideo)
}
