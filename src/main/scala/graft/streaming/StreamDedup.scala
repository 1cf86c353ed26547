package graft.streaming

import graft.functions._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection at ingest: the batch MinHash-LSH
  * candidate generation (ml.DedupOps) re-expressed over an unbounded
  * stream with `flatMapGroupsWithState`.
  *
  * Shape mirrors the batch path exactly — signature and band keys are the
  * same per-row expressions (same coefficients, so batch and stream agree
  * on what collides) — but bucket ownership lives in keyed state: the
  * first document to arrive in a (band, bucket) owns it; every later
  * arrival emits a candidate pair (doc, owner). Downstream verification
  * (exact jaccard over the pair) is stateless and identical to batch.
  *
  * Scale: state is one (firstId, lastSeen) entry per occupied bucket —
  * bounded by corpus diversity, not stream length — and event-time
  * timeouts drop buckets idle past `ttlMs`, so state can't grow without
  * bound. Keys hash-partition across executors; no global structure.
  */
object StreamDedup {

  final case class BandHit(band: Int, bucket: Long, doc_id: Long,
      ts: java.sql.Timestamp)
  final case class BucketState(firstId: Long, lastMs: Long)
  final case class Candidate(doc_id: Long, dup_of: Long, band: Int, bucket: Long)

  /** Candidate near-dup pairs from a streaming documents frame
    * (`doc_id`, `text`, event-time column `tsCol`).
    *
    * @param delay watermark delay (late data beyond it is dropped)
    * @param ttlMs bucket-ownership lifetime after the last arrival; an
    *              idle bucket's state is reclaimed once the watermark
    *              passes lastSeen + ttlMs
    */
  def minhashCandidates(docs: DataFrame, tsCol: String, delay: String,
      ttlMs: Long, shingleN: Int = 3, k: Int = 64,
      bands: Int = 16,
      metrics: Option[StreamMetrics.DedupMetrics] = None): Dataset[Candidate] = {
    import docs.sparkSession.implicits._
    // One fused native expression from shingle hashes to band keys: the
    // sliced-Column formulation duplicates the whole shingle pipeline
    // k×bands times at the expression level, and with no persist barrier
    // available in a streaming plan that really runs k×bands times once
    // codegen falls back to interpreted (see MinHashExprs).
    val hits = docs
      .withWatermark(tsCol, delay)
      .select(col("doc_id"), col(tsCol).as("ts"),
        explode(graft.functions.MinHashExprs.minhashBands(
          graft.functions.TextExprs.shingleHashesNative(col("text"), shingleN),
          k, bands)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bucket").as("bucket"),
        col("doc_id"), col("ts"))
      .as[BandHit]
    candidatesFromHits(hits, ttlMs, metrics)
  }

  /** The stateful stage alone, over precomputed band hits — the seam the
    * batch-replay gate uses to feed both the streaming semantics and the
    * batch replica from ONE materialized band-row set.
    *
    * @param metrics optional ops counters (live/expired buckets, candidate
    *                pairs) — see [[StreamMetrics.DedupMetrics]]
    */
  def candidatesFromHits(hits: Dataset[BandHit], ttlMs: Long,
      metrics: Option[StreamMetrics.DedupMetrics] = None): Dataset[Candidate] = {
    import hits.sparkSession.implicits._
    hits
      .groupByKey(h => (h.band, h.bucket))
      .flatMapGroupsWithState[BucketState, Candidate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((band, bucket), hits, state) =>
          if (state.hasTimedOut) {
            state.remove()
            metrics.foreach { m => m.bucketsExpired.add(1); m.bucketsLive.add(-1) }
            Iterator.empty
          } else {
            // deterministic first-arrival within the micro-batch
            val sorted = hits.toSeq.sortBy(h => (h.ts.getTime, h.doc_id))
            val hadState = state.exists
            var st = state.getOption
            val out = Seq.newBuilder[Candidate]
            for (h <- sorted) st match {
              case None =>
                st = Some(BucketState(h.doc_id, h.ts.getTime))
              case Some(s) =>
                if (s.firstId != h.doc_id)
                  out += Candidate(h.doc_id, s.firstId, band, bucket)
                st = Some(s.copy(lastMs = math.max(s.lastMs, h.ts.getTime)))
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + ttlMs)
            }
            val cands = out.result()
            metrics.foreach { m =>
              if (!hadState && st.nonEmpty) {
                m.bucketsLive.add(1); m.bucketsCreated.add(1)
              }
              m.candidates.add(cands.size)
            }
            cands.iterator
          }
      }
  }
}
