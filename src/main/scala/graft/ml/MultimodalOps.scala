package graft.ml

import graft.GQuery
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata. The container has no image/audio codecs, so the decode step is
  * a clearly-marked deterministic stub (`StubDecode`) — the Spark-side
  * plumbing (schema, batching, partition-wise decode, metadata extraction)
  * is real and is what matters at scale: decode runs `mapPartitions`-style
  * per executor, media bytes never shuffle, and only small extracted
  * features flow downstream.
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

  /** STUB media decode: a real deployment plugs a codec (JNI/FFI or a
    * Python worker via a Pandas-UDF bridge) into this exact signature —
    * batch of payload bytes in, fixed-size feature vector out. Here it is a
    * deterministic fake: byte histogram moments, so tests have stable
    * output. Runs per-partition; payload bytes never leave the executor.
    */
  def stubDecodeFeatures(payload: Array[Byte]): Array[Double] = {
    // ??? <- real codec goes here (image decode / resize / frame-sample)
    if (payload == null || payload.isEmpty) Array.fill(4)(0.0)
    else {
      val n = payload.length.toDouble
      val mean = payload.map(b => (b & 0xff).toDouble).sum / n
      val mx = payload.map(b => (b & 0xff).toDouble).max
      val mn = payload.map(b => (b & 0xff).toDouble).min
      Array(n, mean, mx, mn)
    }
  }

  /** Decode → feature columns. The decode closure is the one place graft
    * accepts opaque per-row code (a codec cannot be a Catalyst expression);
    * it runs executor-side on the scan partitioning — payload bytes never
    * shuffle, and `drop("payload")` right after means only small features
    * flow downstream. A production build swaps the closure for an
    * Arrow-batched bridge with identical signature.
    */
  def decodeFeatures(assets: DataFrame): DataFrame = {
    val decode = udf((p: Array[Byte]) => stubDecodeFeatures(p))
    assets.withColumn("features", decode(col("payload"))).drop("payload")
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

  // The stub features are byte-histogram moments over the (ascii)
  // stand-in payloads — pure arithmetic DuckDB can replicate char-wise,
  // which upgrades this from a rows-only check to a full oracle. A real
  // codec would drop the oracle back to rows-only (codec output is not
  // SQL-expressible), keeping the same plumbing assertions.
  private val qMultimodalDecode = GQuery(
    "q_multimodal_decode",
    (s, d) =>
      decodeFeatures(assets(s, d)).select(
        col("asset_id"), col("media_type"),
        graft.functions.stableRound(element_at(col("features"), 2), 4).as("byte_mean"),
        element_at(col("features"), 1).cast("long").as("n_bytes")),
    Some("""SELECT doc_id AS asset_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END
                     AS media_type,
                   floor((list_sum(list_transform(range(1, length(text) + 1),
                          i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS DOUBLE)))
                          / length(text)) * 10000 + 0.5) / 10000 AS byte_mean,
                   CAST(length(text) AS BIGINT) AS n_bytes
            FROM documents"""))

  /** STUB resize: strided byte sample down to `target` bytes — a real
    * codec swaps in behind the same (payload → payload) signature. Keeps
    * the resized payload executor-local like decode.
    */
  def resizeStub(payload: Array[Byte], target: Int): Array[Byte] = {
    // ??? <- real image resize goes here
    if (payload == null || payload.length <= target) payload
    else Array.tabulate(target)(i => payload(i * (payload.length / target)))
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

  // Frame slicing of the (ascii) stand-in payloads is pure byte algebra,
  // so the oracle mirrors it with substr on the text — frame boundaries,
  // sizes, and content ids must all agree.
  private val qMultimodalFrames = GQuery(
    "q_multimodal_frames",
    (s, d) =>
      sampleFrames(assets(s, d), 4).drop("frame"),
    Some("""SELECT doc_id AS asset_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END
                     AS media_type,
                   CAST(i AS BIGINT) AS frame_idx,
                   CAST(((i + 1) * length(text)) // 4 - (i * length(text)) // 4 AS BIGINT)
                     AS f_bytes,
                   substr(md5(substr(text, CAST((i * length(text)) // 4 AS INT) + 1,
                     CAST(((i + 1) * length(text)) // 4 - (i * length(text)) // 4 AS INT))), 1, 8)
                     AS f_id
            FROM documents, (SELECT unnest(generate_series(0, 3)) AS i)"""))

  val queries: Seq[GQuery] = Seq(qMultimodalMeta, qMultimodalDecode, qMultimodalFrames)
}
