package graft.operators

import graft.GQuery
import graft.sources.Tables._
import org.apache.spark.sql.DataFrame
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

  // Gate: each click joined to the user's most recent purchase at or
  // before it; the oracle is DuckDB's native ASOF LEFT JOIN. Purchases
  // pre-aggregate to unique (user_id, ts) so the match is well-defined.
  private val qAsofJoin = GQuery(
    "q_asof_join",
    (s, d) => {
      val ev = events(s, d).withColumn("ts", eventMicros(col("ts")))
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

  val queries: Seq[GQuery] = Seq(qAsofJoin)
}
