package graft.streaming

import graft.GQuery
import graft.functions._
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gate queries for the streaming operators, run in batch mode over the
  * events table (the plans are streaming-valid — StreamSpec proves that —
  * and batch-mode results are DuckDB-checkable).
  */
object StreamQueries {

  private val qStreamWindow = GQuery(
    "q_stream_window",
    (s, d) => {
      val raw = events(s, d)
      // value has an exact 2-decimal domain and windows GROW with sf, so
      // the per-window sum runs as DECIMAL — exact at any accumulation
      // order/partitioning (the q_agg sf100 lesson) — and converts to
      // double once at the end.
      val ev = raw.select(eventTime(raw, "ts").as("ts"),
        col("event_type"), col("value").cast("decimal(18,2)").as("value"))
      WindowOps.windowedCounts(ev, "1 hour", "1 hour")
        .select(unix_micros(col("window_start")).as("ws"),
          col("event_type"), col("n"),
          stableRound(col("total").cast("double"), 2).as("total"))
    },
    Some("""SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS ws,
                   event_type, count(*) AS n,
                   floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                         * 100 + 0.5) / 100 AS total
            FROM events GROUP BY 1, 2"""))

  private val qSessionWindow = GQuery(
    "q_session_window",
    (s, d) => {
      val raw = events(s, d)
      // DECIMAL session totals for the same reason as q_stream_window:
      // a hot user's session grows with sf, and exact-domain money sums
      // must not depend on accumulation order.
      val ev = raw.select(eventTime(raw, "ts").as("ts"),
        col("user_id"), col("value").cast("decimal(18,2)").as("value"))
      WindowOps.sessionWindows(ev, "30 minutes")
        .select(col("user_id"),
          unix_micros(col("session_start")).as("ss"),
          unix_micros(col("session_end")).as("se"),
          col("n"), stableRound(col("total").cast("double"), 2).as("total"))
    },
    Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
                 gaps AS (SELECT *, CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                                         OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
                          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
                 sess AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                                   ROWS UNBOUNDED PRECEDING) AS sid
                          FROM gaps)
            SELECT user_id, epoch_us(min(ts)) AS ss,
                   epoch_us(max(ts) + INTERVAL 30 MINUTE) AS se,
                   count(*) AS n,
                   floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                         * 100 + 0.5) / 100 AS total
            FROM sess GROUP BY user_id, sid"""),
    headline = true)

  // transaction reassembly (design.md:96-131): bundle events per txn,
  // emit only transactions whose done marker arrived
  private val qTxnBundle = GQuery(
    "q_txn_bundle",
    (s, d) => {
      val ev = events(s, d).select(
        col("user_id").as("txn"),
        col("event_id").cast("long").as("seqno"),
        col("event_type").as("payload"),
        (col("event_type") === "error").as("done"))
      TxnOps.assembleBatch(ev).select("txn", "records", "n")
    },
    Some("""WITH e AS (SELECT user_id AS txn, event_id AS seqno,
                              event_type AS payload, event_type = 'error' AS done
                       FROM events)
            SELECT txn, string_agg(payload, ',' ORDER BY seqno) AS records,
                   count(*) AS n
            FROM e GROUP BY txn HAVING bool_or(done)"""))

  /** The streaming MinHash-LSH near-dup path, replayed batch-style:
    * Spark runs `flatMapGroupsWithState` in batch queries too (one
    * invocation per key over empty state), which is exactly the "replay
    * the whole stream as one micro-batch" semantics. With event time
    * derived from doc_id, bucket ownership goes to the lowest doc_id, so
    * the candidate set must equal a batch replica computed with the same
    * band keys — compared in-plan, asserted as booleans the constant
    * oracle row pins (the q_ann_lsh self-verification pattern).
    */
  private val qStreamMinhash = GQuery(
    "q_stream_minhash",
    (s, d) => {
      import s.implicits._
      val docs = documents(s, d)
      // Band rows computed ONCE (fused native band expression, persisted)
      // and fed to BOTH sides — the streaming stateful stage and the batch
      // replica — so the comparison is over identical bucket keys.
      val bandRows = docs
        .select(col("doc_id").cast("long").as("doc_id"),
          timestamp_micros(col("doc_id").cast("long")).as("ts"),
          explode(graft.functions.MinHashExprs.minhashBands(
            graft.functions.TextExprs.shingleHashesNative(col("text"), 3),
            32, 8)).as("bk"))
        .select(col("bk.band").as("band"), col("bk.bucket").as("bucket"),
          col("doc_id"), col("ts"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val stream = StreamDedup.candidatesFromHits(
          bandRows.as[StreamDedup.BandHit], ttlMs = 1L << 40)
        .toDF().select("doc_id", "dup_of", "band", "bucket")
      // batch replica over the same rows: owner = min doc_id per bucket
      val batch = bandRows
        .withColumn("dup_of",
          min("doc_id").over(Window.partitionBy("band", "bucket")))
        .filter(col("doc_id") =!= col("dup_of"))
        .select("doc_id", "dup_of", "band", "bucket")
      val cmp = stream.withColumn("src", lit(1))
        .unionByName(batch.withColumn("src", lit(2)))
        .groupBy("doc_id", "dup_of", "band", "bucket")
        .agg(count_distinct(col("src")).as("nsrc"))
        .agg((count(lit(1)) > 0).as("nonempty"),
          (coalesce(sum(when(col("nsrc") < 2, 1).otherwise(0)), lit(0)) === 0)
            .as("stream_matches_batch"))
      docs.agg(count(lit(1)).as("n_docs")).crossJoin(cmp)
    },
    Some("""SELECT count(*) AS n_docs, true AS nonempty,
                   true AS stream_matches_batch
            FROM documents"""))

  val queries: Seq[GQuery] =
    Seq(qStreamWindow, qSessionWindow, qTxnBundle, qStreamMinhash)
}
