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

  /** Continuous CROSS-BATCH near-dup against a persisted
    * [[graft.ml.MinHashStore]] (r15 verdict #6): the `foreachBatch` body
    * for a streaming documents frame (`doc_id`, `text`). Each micro-batch
    * is probed against the store (the store-only ESTIMATE path — history
    * text stays in cold storage, the steady-state pipeline shape the
    * batch store proved at sf100), the pair frame is handed to `onPairs`
    * (consume it eagerly — its cache pins release when the call returns),
    * and the batch is appended AFTERWARD so it never matches itself.
    * Unlike [[minhashCandidates]] — whose bucket ownership lives in
    * bounded flatMapGroupsWithState state and forgets evicted buckets —
    * the store remembers every prior batch at parquet prices, so a
    * near-dup of ANY earlier document is caught, not just recent ones.
    *
    * Micro-batch REPLAY (foreachBatch is at-least-once): the append goes
    * through [[graft.ml.MinHashStore.Store.appendBatch]] — data files
    * and the `#batch` high-water mark publish in ONE atomic manifest
    * commit (r16 verdict #1: the old three-write append left crash
    * windows that re-appended the batch or stranded bands without sigs),
    * scoped to this query's checkpoint lineage (the `#query` mark — a
    * fresh checkpoint's batch ids restart at 0 and fail fast instead of
    * silently skipping). The probe anti-joins its own batch's doc ids
    * out of the hit set, so a replayed batch — whose rows are already in
    * the store — reports the same pairs the original did instead of
    * matching its own appended copy.
    *
    * FRAGMENTATION: each append adds files to the store
    * ([[graft.ml.MinHashStore.Store.compactTo]] documents the cost
    * curve). With `compactEvery > 0` the sink compacts ITSELF: every N
    * batches it runs the fragmentation check (one driver listing —
    * `compactTo` returns the same store when tidy), flips its own store
    * pointer to the new generation between micro-batches, records the
    * flip durably as a `_successor` pointer at the ORIGINAL store path
    * (so a restarted query resolves to the live generation,
    * [[graft.ml.MinHashStore.resolveLive]]), and deletes the
    * intermediate generation it created previously (data survives — the
    * new generation hard-links unchanged files). The manual idiom (stop
    * query → `compactTo` → restart on the returned store) still works;
    * `compactEvery = 0` disables auto-compaction.
    *
    * SINGLE WRITER per store: one streaming query owns a store's commit
    * log — the manifest sequence assumes no concurrent publisher.
    */
  def minhashStoreForeachBatch(store: graft.ml.MinHashStore.Store,
      threshold: Double, maxBucket: Int = 1000, compactEvery: Int = 0,
      maxFilesPerBand: Int = 8)(
      onPairs: (Long, DataFrame) => Unit): (DataFrame, Long) => Unit = {
    // the live generation: follow successor pointers left by a previous
    // incarnation's auto-compaction, so a restart that rebuilds this
    // closure from the ORIGINAL store resumes on the generation holding
    // every append made since the flip
    var cur = graft.ml.MinHashStore.resolveLive(store)
    (batch: DataFrame, batchId: Long) => {
      val docs = batch.select(col("doc_id"), col("text"))
      val queryId = Option(batch.sparkSession.sparkContext
        .getLocalProperty("sql.streaming.queryId"))
      val h = cur.probeEstimateHandle(docs, threshold, maxBucket)
      try {
        val own = docs.select(col("doc_id").as("hist_id"))
        onPairs(batchId, h.pairs.join(broadcast(own), Seq("hist_id"), "left_anti"))
      } finally h.close()
      cur.appendBatch(docs, batchId, queryId)
      if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
        // unique generation path per attempt: a crashed flip leaves an
        // orphan dir (bounded by crash count), never a name collision
        val nonce = java.util.UUID.randomUUID().toString.take(8)
        val gen = cur.compactTo(s"${store.path}@g$batchId-$nonce", maxFilesPerBand)
        if (gen.path != cur.path) {
          // durable flip FIRST (atomic replace at the original path),
          // then retire the intermediate generation this sink created —
          // never the caller's original store
          store.writeSuccessor(gen.path)
          val prev = cur
          cur = gen
          if (prev.path != store.path) prev.delete()
        }
      }
    }
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
