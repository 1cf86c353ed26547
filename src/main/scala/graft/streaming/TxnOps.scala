package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Transaction reassembly — the design.md consumer model of the reference
  * (design.md:96-131; demo/etl.zed:12, demo/consume-*.zson): CDC events
  * tagged with a transaction id accumulate until the `done` event arrives,
  * then the whole bundle is emitted:
  * `records:=collect(this), done:=or(value.done) by txn`.
  *
  * Batch formulation (oracle-checkable) and a streaming stateful
  * formulation (mapGroupsWithState — bundles survive across micro-batches
  * until their done marker shows up).
  */
object TxnOps {

  /** Batch: one row per complete transaction with its collected records
    * (ordered by seqno for determinism).
    */
  def assembleBatch(events: DataFrame): DataFrame =
    events
      .groupBy("txn")
      .agg(
        expr("bool_or(done)").as("complete"),
        array_join(
          transform(array_sort(collect_list(struct(col("seqno"), col("payload")))),
            x => x.getField("payload")),
          ",").as("records"),
        count(lit(1)).as("n"))
      .filter(col("complete"))

  final case class TxnEvent(txn: Long, seqno: Long, payload: String, done: Boolean)
  final case class TxnBundle(txn: Long, records: Seq[String], n: Long)
  final case class TxnRec(seqno: Long, payload: String)
  // (state class must be encoder-friendly: Seq of a named case class —
  // List[(Long, String)] breaks state-store codegen)
  final case class TxnBuf(records: Seq[TxnRec], done: Boolean)

  /** Streaming: accumulate per-txn state across micro-batches; emit the
    * bundle when its done marker arrives, then drop the state. Incomplete
    * transactions stay buffered (a production deployment adds a timeout
    * for abandoned transactions).
    */
  def assembleStream(events: Dataset[TxnEvent]): Dataset[TxnBundle] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.txn)
      .flatMapGroupsWithState[TxnBuf, TxnBundle](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (txn: Long, it: Iterator[TxnEvent], state: GroupState[TxnBuf]) =>
          val prev = state.getOption.getOrElse(TxnBuf(Nil, done = false))
          val evs = it.toList
          // collect(this) semantics: every record joins the bundle,
          // including the one carrying the done marker
          val buf = TxnBuf(
            prev.records ++ evs.map(e => TxnRec(e.seqno, e.payload)),
            prev.done || evs.exists(_.done))
          if (buf.done) {
            state.remove()
            val sorted = buf.records.sortBy(_.seqno).map(_.payload)
            Iterator.single(TxnBundle(txn, sorted, sorted.size.toLong))
          } else {
            state.update(buf)
            Iterator.empty
          }
      }
  }

  final case class TimedTxnEvent(txn: Long, seqno: Long, payload: String,
      done: Boolean, ts: java.sql.Timestamp)
  /** `complete=false` rows are the dead-letter channel: transactions whose
    * done marker never arrived within the TTL.
    */
  final case class TxnResult(txn: Long, records: Seq[String], n: Long,
      complete: Boolean)

  /** Streaming assembly with an event-time TTL: a transaction that stays
    * incomplete for `ttlMs` past the watermark emits on the dead-letter
    * channel (`complete=false`) and its state drops — bounded state for
    * abandoned transactions instead of buffering forever.
    *
    * Caller must set a watermark on `ts` before calling (event-time
    * timeouts require one); at 100 TB scale this is what keeps the state
    * store from accreting every crashed producer's half-finished txn.
    *
    * @param metrics optional ops counters (completed / timed-out /
    *                in-flight) updated from the state function — see
    *                [[StreamMetrics.TxnMetrics]] for the delivery contract
    */
  def assembleStreamWithTtl(events: Dataset[TimedTxnEvent], ttlMs: Long,
      metrics: Option[StreamMetrics.TxnMetrics] = None): Dataset[TxnResult] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.txn)
      .flatMapGroupsWithState[TxnBuf, TxnResult](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (txn: Long, it: Iterator[TimedTxnEvent], state: GroupState[TxnBuf]) =>
          if (state.hasTimedOut) {
            val buf = state.get
            state.remove()
            metrics.foreach { m => m.timedOut.add(1); m.inFlight.add(-1) }
            val sorted = buf.records.sortBy(_.seqno).map(_.payload)
            Iterator.single(TxnResult(txn, sorted, sorted.size.toLong, complete = false))
          } else {
            val hadState = state.exists
            val prev = state.getOption.getOrElse(TxnBuf(Nil, done = false))
            val evs = it.toList
            val buf = TxnBuf(
              prev.records ++ evs.map(e => TxnRec(e.seqno, e.payload)),
              prev.done || evs.exists(_.done))
            if (buf.done) {
              state.remove()
              metrics.foreach { m =>
                m.completed.add(1)
                if (hadState) m.inFlight.add(-1)
              }
              val sorted = buf.records.sortBy(_.seqno).map(_.payload)
              Iterator.single(TxnResult(txn, sorted, sorted.size.toLong, complete = true))
            } else {
              state.update(buf)
              metrics.foreach(m => if (!hadState) m.inFlight.add(1))
              // Deadline = newest event in this txn + TTL, kept strictly
              // ahead of the watermark (setTimeoutTimestamp requires it).
              val maxTs = evs.map(_.ts.getTime).foldLeft(0L)(math.max)
              state.setTimeoutTimestamp(
                math.max(maxTs + ttlMs, state.getCurrentWatermarkMs() + 1))
              Iterator.empty
            }
          }
      }
  }
}
