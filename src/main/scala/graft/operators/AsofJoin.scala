package graft.operators

import graft.GQuery
import graft.sources.Tables._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row with the same key
  * and `right.ts <= left.ts` (inclusive). Spark has no built-in as-of
  * join; the classic scalable formulation is union + keyed running
  * `last(ignoreNulls)`:
  *
  *   1. union both sides on (keys, ts), right rows carrying their payload,
  *      left rows null there;
  *   2. one window per key ordered by (ts, side) — right sorts before left
  *      at equal ts so equality is inclusive — propagating the last seen
  *      payload forward;
  *   3. keep the left rows.
  *
  * Scale shape: ONE hash shuffle on the join keys and a per-key sort —
  * identical cost to a regular aggregation over the same keys; no
  * range-condition theta join (which Spark would execute as a broadcast
  * nested loop), no per-row subquery. Skewed keys behave like any skewed
  * aggregation (AQE handles moderate skew; salt hot keys upstream).
  */
object AsofJoin {

  /** Join `right`'s `payload` columns onto `left` as-of `tsCol`, matching
    * on `keys`. Output carries the left columns plus `asof_<payload>`
    * columns (null when no right row precedes the left row).
    *
    * `right` must be unique per (keys, ts) — pre-aggregate if not (which
    * right row "the" match is would otherwise be undefined, in any engine).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payload: Seq[String]): DataFrame = {
    // The payload travels as ONE struct: it is non-null for every right
    // row even when individual fields are null, so last(ignoreNulls)
    // always picks the whole latest right row — a per-column fill would
    // skip genuinely-null fields (returning a stale earlier value) and
    // could tear the output across different right rows.
    val r = right.select(
      (keys :+ tsCol).map(col) :+
        struct(payload.map(col): _*).as("_asof_payload"): _*)
      .withColumn("_side", lit(0))
    val u = left.withColumn("_side", lit(1))
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = u.withColumn("_asof_payload",
      last(col("_asof_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    payload.foldLeft(filled) { (d, c) =>
      d.withColumn(s"asof_$c", col("_asof_payload").getField(c))
    }.drop("_side", "_asof_payload")
  }

  /** Skew escape hatch: the same as-of semantics with the shuffle keyed on
    * (keys, time-bucket) instead of keys alone, so one hot key spreads
    * over `buckets` reducers instead of serializing one.
    *
    * Correctness across bucket boundaries comes from carry-in rows: for
    * every (left-key, bucket) the latest right row from ALL earlier
    * buckets is injected at the bucket start (side -1, sorting before any
    * in-bucket row — its true ts is strictly below the bucket start), so
    * the bucket-local running last equals the global running last.
    * Carry-ins are built on a per-(key, bucket) aggregate of the right
    * side — keys × buckets rows, metadata scale next to the row data —
    * then a tiny per-key window (≤ `buckets` rows per partition)
    * cumulates them; no raw row ever crosses a bucket.
    *
    * `tsCol` must be integral (epoch micros in the gates). Output is
    * column-identical to [[asofJoin]] — AsofJoinSpec pins equality on a
    * 90%-one-key corpus.
    */
  def asofJoinSkewed(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payload: Seq[String], buckets: Int = 32): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val bounds = left.select(col(tsCol).cast("long").as("t"))
      .unionByName(right.select(col(tsCol).cast("long").as("t")))
      .agg(min("t"), max("t")).collect()(0)
    if (bounds.isNullAt(0)) // one or both sides empty: nothing to salt
      return asofJoin(left, right, keys, tsCol, payload)
    val lo = bounds.getLong(0)
    val width = math.max(1L, (bounds.getLong(1) - lo) / buckets + 1)
    // exact integer floor-div via pmod: (d - d%w)/w divides exactly, so
    // the double division introduces no rounding at any ts magnitude
    def bucketOf(c: Column): Column = {
      val d = c.cast("long") - lit(lo)
      ((d - pmod(d, lit(width))) / lit(width)).cast("long")
    }

    val r = right.select(
      (keys :+ tsCol).map(col) :+
        struct(payload.map(col): _*).as("_asof_payload"): _*)
      .withColumn("_side", lit(0))
      .withColumn("_bucket", bucketOf(col(tsCol)))
    // bucket-final right row per (keys, bucket): unique (keys, ts) makes
    // max(struct(ts, payload)) the well-defined latest
    val bucketLast = r.groupBy((keys.map(col) :+ col("_bucket")): _*)
      .agg(max(struct(col(tsCol), col("_asof_payload"))).as("_m"))
      .select(keys.map(col) :+ col("_bucket") :+
        col("_m._asof_payload").as("_p"): _*)
    // full (left-keys × buckets) grid, so every bucket a left row can land
    // in has a carry-in even when nearby buckets hold no right rows
    val grid = left.select(keys.map(col): _*).distinct()
      .crossJoin(left.sparkSession.range(buckets).select(col("id").as("_bucket")))
    val cumW = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_bucket").asc)
      .rowsBetween(Window.unboundedPreceding, -1) // strictly earlier buckets
    val carry = grid.join(bucketLast, keys :+ "_bucket", "left")
      .withColumn("_carry", last(col("_p"), ignoreNulls = true).over(cumW))
      .filter(col("_carry").isNotNull)
      .select(keys.map(col) :+ col("_bucket") :+
        (lit(lo) + col("_bucket") * lit(width)).as(tsCol) :+ // bucket start
        col("_carry").as("_asof_payload"): _*)
      .withColumn("_side", lit(-1))

    val u = left.withColumn("_side", lit(1))
      .withColumn("_bucket", bucketOf(col(tsCol)))
      .unionByName(r, allowMissingColumns = true)
      .unionByName(carry, allowMissingColumns = true)
    val w = Window.partitionBy((keys :+ "_bucket").map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = u.withColumn("_asof_payload",
      last(col("_asof_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    payload.foldLeft(filled) { (d, c) =>
      d.withColumn(s"asof_$c", col("_asof_payload").getField(c))
    }.drop("_side", "_bucket", "_asof_payload")
  }

  // Gate: each click joined to the user's most recent purchase at or
  // before it; the oracle is DuckDB's native ASOF LEFT JOIN. Purchases
  // pre-aggregate to unique (user_id, ts) so the match is well-defined.
  private val qAsofJoin = GQuery(
    "q_asof_join",
    (s, d) => {
      val raw = events(s, d)
      val ev = raw.withColumn("ts", eventMicros(raw, "ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(max("value").as("purchase_value"))
        .withColumn("purchase_ts", col("ts"))
      asofJoin(clicks, purchases, Seq("user_id"), "ts",
        Seq("purchase_ts", "purchase_value"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_purchase_ts").as("purchase_ts"),
          col("asof_purchase_value").as("purchase_value"))
    },
    Some("""WITH e AS (
              SELECT event_id, user_id, epoch_us(ts) AS ts
              FROM events WHERE event_type = 'click'),
            p AS (
              SELECT user_id, epoch_us(ts) AS ts, max(value) AS purchase_value
              FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
            SELECT e.event_id, e.user_id, e.ts,
                   p.ts AS purchase_ts, p.purchase_value
            FROM e ASOF LEFT JOIN p
              ON e.user_id = p.user_id AND e.ts >= p.ts"""))

  // The skew escape hatch must be COLUMN-IDENTICAL to the plain as-of
  // join, so it shares the oracle: same clicks-to-latest-purchase query
  // through the time-bucketed shuffle with carry-in rows. A divergence
  // between the two formulations (or from DuckDB's native ASOF) fails the
  // hash gate.
  private val qAsofJoinSkewed = GQuery(
    "q_asof_join_skewed",
    (s, d) => {
      val raw = events(s, d)
      val ev = raw.withColumn("ts", eventMicros(raw, "ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(max("value").as("purchase_value"))
        .withColumn("purchase_ts", col("ts"))
      asofJoinSkewed(clicks, purchases, Seq("user_id"), "ts",
        Seq("purchase_ts", "purchase_value"), buckets = 16)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_purchase_ts").as("purchase_ts"),
          col("asof_purchase_value").as("purchase_value"))
    },
    Some("""WITH e AS (
              SELECT event_id, user_id, epoch_us(ts) AS ts
              FROM events WHERE event_type = 'click'),
            p AS (
              SELECT user_id, epoch_us(ts) AS ts, max(value) AS purchase_value
              FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
            SELECT e.event_id, e.user_id, e.ts,
                   p.ts AS purchase_ts, p.purchase_value
            FROM e ASOF LEFT JOIN p
              ON e.user_id = p.user_id AND e.ts >= p.ts"""))

  val queries: Seq[GQuery] = Seq(qAsofJoin, qAsofJoinSkewed)
}
