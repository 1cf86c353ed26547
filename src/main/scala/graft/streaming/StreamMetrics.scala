package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.util.LongAccumulator

/** Ops metrics for the stateful streaming operators (the ROADMAP seam):
  * named Spark accumulators updated inside the state functions, visible in
  * the Spark UI and scrapeable from the driver, plus an engine-level
  * state-size gauge fed by `StreamingQueryProgress`.
  *
  * Accumulator counts are at-least-once under task retries — operational
  * gauges for dashboards and alerts ("dead-letters are climbing", "bucket
  * state stopped shrinking"), not exactly-once billing counters. The
  * emitted DATA (bundles, dead-letters, candidates) remains exactly-once
  * via the sink; these just instrument it.
  */
object StreamMetrics {

  /** Transaction-assembly counters ([[TxnOps.assembleStreamWithTtl]]).
    * Serializable (the session is not retained) — instances ride into the
    * state function's closure; accumulators merge back on the driver.
    */
  final class TxnMetrics(spark: SparkSession) extends Serializable {
    /** Bundles emitted complete. */
    val completed: LongAccumulator =
      spark.sparkContext.longAccumulator("graft.txn.completed")
    /** Transactions dead-lettered by the event-time TTL. */
    val timedOut: LongAccumulator =
      spark.sparkContext.longAccumulator("graft.txn.timedOut")
    /** Net in-flight transactions (state entries): +1 when a txn starts
      * buffering, −1 when it completes or dead-letters.
      */
    val inFlight: LongAccumulator =
      spark.sparkContext.longAccumulator("graft.txn.inFlight")
  }

  /** Stream-dedup counters ([[StreamDedup.candidatesFromHits]]). Same
    * serializability contract as [[TxnMetrics]].
    */
  final class DedupMetrics(spark: SparkSession) extends Serializable {
    /** Net occupied (band, bucket) state entries: +1 on first arrival,
      * −1 when the TTL reclaims an idle bucket. Invariant (modulo retry
      * over-counting): bucketsLive == bucketsCreated − bucketsExpired.
      */
    val bucketsLive: LongAccumulator =
      spark.sparkContext.longAccumulator("graft.dedup.bucketsLive")
    /** Buckets ever claimed by a first arrival. */
    val bucketsCreated: LongAccumulator =
      spark.sparkContext.longAccumulator("graft.dedup.bucketsCreated")
    /** Buckets reclaimed by the event-time TTL. */
    val bucketsExpired: LongAccumulator =
      spark.sparkContext.longAccumulator("graft.dedup.bucketsExpired")
    /** Candidate pairs emitted. */
    val candidates: LongAccumulator =
      spark.sparkContext.longAccumulator("graft.dedup.candidates")
  }

  /** Engine-level state-size gauge: records each streaming query's latest
    * total state rows (and rows updated last batch) from progress events.
    * Register with `spark.streams.addListener`; progress delivery is
    * asynchronous, so scrapers read the latest observed value.
    */
  final class StateGaugeListener extends StreamingQueryListener {
    private val stateRowsByQuery =
      new java.util.concurrent.ConcurrentHashMap[java.util.UUID, Long]()
    @volatile private var lastUpdatedRows: Long = 0L

    def stateRows(queryId: java.util.UUID): Option[Long] =
      Option(stateRowsByQuery.get(queryId))
    def totalStateRows: Long = {
      var sum = 0L
      stateRowsByQuery.values().forEach(v => sum += v)
      sum
    }
    def rowsUpdatedLastBatch: Long = lastUpdatedRows

    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val ops = e.progress.stateOperators
      if (ops.nonEmpty) {
        stateRowsByQuery.put(e.progress.id, ops.map(_.numRowsTotal).sum)
        lastUpdatedRows = ops.map(_.numRowsUpdated).sum
      }
    }
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }
}
