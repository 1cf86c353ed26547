package graft.streaming

import graft.GQuery
import graft.functions.stableRound
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Gate queries for the streaming operators, run in batch mode over the
  * events table (the plans are streaming-valid — StreamSpec proves that —
  * and batch-mode results are DuckDB-checkable).
  */
object StreamQueries {

  private val qStreamWindow = GQuery(
    "q_stream_window",
    (s, d) => {
      val ev = events(s, d).select(eventTime(col("ts")).as("ts"),
        col("event_type"), col("value"))
      WindowOps.windowedCounts(ev, "1 hour", "1 hour")
        .select(unix_micros(col("window_start")).as("ws"),
          col("event_type"), col("n"),
          stableRound(col("total"), 2).as("total"))
    },
    Some("""SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS ws,
                   event_type, count(*) AS n,
                   floor(sum(value) * 100 + 0.5) / 100 AS total
            FROM events GROUP BY 1, 2"""))

  private val qSessionWindow = GQuery(
    "q_session_window",
    (s, d) => {
      val ev = events(s, d).select(eventTime(col("ts")).as("ts"),
        col("user_id"), col("value"))
      WindowOps.sessionWindows(ev, "30 minutes")
        .select(col("user_id"),
          unix_micros(col("session_start")).as("ss"),
          unix_micros(col("session_end")).as("se"),
          col("n"), stableRound(col("total"), 2).as("total"))
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
                   count(*) AS n, floor(sum(value) * 100 + 0.5) / 100 AS total
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

  val queries: Seq[GQuery] = Seq(qStreamWindow, qSessionWindow, qTxnBundle)
}
