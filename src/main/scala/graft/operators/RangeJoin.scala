package graft.operators

import graft.GQuery
import graft.sources.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Range (interval-containment) join — match each left row to the
  * interval rows with the same key and `start <= ts < end`. Spark executes
  * a raw inequality join as a broadcast nested loop (quadratic, and the
  * build side must fit in memory); the scalable formulation is chunk
  * bucketing:
  *
  *   1. pick a chunk size (default: the max interval length, so every
  *      interval covers at most 2 chunks);
  *   2. register each interval under every chunk it covers, each left row
  *      under its single chunk;
  *   3. equi-join on (keys, chunk) — a plain hash join — then filter the
  *      exact containment predicate.
  *
  * Because a left row carries exactly one chunk id, each (row, interval)
  * match is produced exactly once — no distinct needed. Shuffle volume is
  * rows + intervals × chunks-covered, all through ONE hash exchange.
  */
object RangeJoin {

  /** Join interval columns onto `left` where
    * `start <= left.ts < end`, matching on `keys`. Intervals with
    * `end <= start` are dropped (empty ranges match nothing).
    *
    * @param chunkSize bucket width in ts units; defaults to the max
    *                  interval length (computed in one tiny aggregate) so
    *                  interval replication is at most 2×. Override when
    *                  interval lengths are heavily skewed — a few huge
    *                  intervals would otherwise set a huge chunk and pack
    *                  everything into few buckets.
    */
  def rangeJoin(left: DataFrame, intervals: DataFrame, keys: Seq[String],
      tsCol: String, startCol: String, endCol: String,
      chunkSize: Option[Long] = None): DataFrame = {
    val iv0 = intervals.filter(col(endCol) > col(startCol))
    val chunk = chunkSize.getOrElse(
      math.max(1L, iv0.agg(max(col(endCol) - col(startCol))).head() match {
        case r if r.isNullAt(0) => 1L
        // the difference type follows the column type (int/short/long)
        case r => r.getAs[Number](0).longValue()
      }))
    require(chunk > 0, s"rangeJoin: chunkSize must be positive, got $chunk")
    // identifiers backtick-quoted: names with spaces/dots/keywords must
    // not break the generated expression
    val iv = iv0.withColumn("_chunk",
      explode(sequence(expr(s"`$startCol` div $chunk"),
        expr(s"(`$endCol` - 1) div $chunk"))))
    left.withColumn("_chunk", expr(s"`$tsCol` div $chunk"))
      .join(iv, keys :+ "_chunk")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("_chunk")
  }

  // Gate: purchase-to-purchase windows per user (half-open), each click
  // assigned to the window containing it. The oracle is the plain
  // inequality join DuckDB executes directly.
  private val qRangeJoin = GQuery(
    "q_range_join",
    (s, d) => {
      val raw = events(s, d)
      val ev = raw.withColumn("ts", eventMicros(raw, "ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val w = Window.partitionBy("user_id").orderBy("ts")
      val intervals = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts")).distinct()
        .withColumn("window_start", col("ts"))
        .withColumn("window_end", lead(col("ts"), 1).over(w))
        .filter(col("window_end").isNotNull)
        .select("user_id", "window_start", "window_end")
      rangeJoin(clicks, intervals, Seq("user_id"), "ts",
        "window_start", "window_end")
        .select("event_id", "user_id", "ts", "window_start", "window_end")
    },
    Some("""WITH e AS (
              SELECT event_id, user_id, epoch_us(ts) AS ts
              FROM events WHERE event_type = 'click'),
            p AS (
              SELECT DISTINCT user_id, epoch_us(ts) AS ts
              FROM events WHERE event_type = 'purchase'),
            iv AS (
              SELECT user_id, ts AS window_start,
                     lead(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       AS window_end
              FROM p)
            SELECT e.event_id, e.user_id, e.ts, iv.window_start, iv.window_end
            FROM e JOIN iv
              ON e.user_id = iv.user_id
             AND e.ts >= iv.window_start AND e.ts < iv.window_end"""))

  val queries: Seq[GQuery] = Seq(qRangeJoin)
}
