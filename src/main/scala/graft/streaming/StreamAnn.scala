package graft.streaming

import graft.ml.{IvfIndex, IvfPq, IvfPqIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous embedding ingest into the disk ANN indexes: the
  * `foreachBatch` sinks that close the maintenance loop UNPROMPTED — the
  * scheduling policy the batch `maintain` API left to the caller
  * (ROADMAP: "when to run maintain unprompted" was the one open IVF
  * next-step). Mirrors [[StreamDedup.minhashStoreForeachBatch]]'s
  * generation discipline on the vector side.
  *
  * Shape per micro-batch (`vec_id`, `v` columns):
  *
  *  1. exactly-once append via `appendBatch` — deterministic per-batch
  *     file names + the lineage-scoped `_stream_batch` high-water mark
  *     make a foreachBatch replay a no-op and sweep a crashed attempt's
  *     partial files (see [[graft.ml.IvfIndex.guardedCellAppend]]);
  *  2. every `maintainEvery` batches, run the health-gated `maintain`
  *     tick: `health` reads cell stats (metadata scale — corpus-free for
  *     PQ, one sampled scan for raw IVF), and only a non-"ok"
  *     recommendation pays for a new generation (compact / splitMerge /
  *     retrain with recall audit + escalation). A tidy tick costs one
  *     stats read — the sink can afford a short cadence.
  *
  * GENERATION FLIP: when `maintain` returns a new index, the sink first
  * carries the streaming mark into the new generation (without it, a
  * crash-after-flip replay would re-append a batch the new generation
  * already incorporates — retrain rewrites the full corpus including
  * every appended batch), then records the flip durably as a
  * `_successor` pointer at the ORIGIN index path (atomic replace; a
  * restarted query rebuilds this closure from the origin and
  * [[graft.ml.IvfIndex.resolveLive]] lands on the live generation), and
  * finally retires the intermediate generation it created previously —
  * never the caller's origin. A crash between maintain and the flip
  * leaves an orphan generation dir (bounded by crash count, never a
  * correctness issue); a crash between flip and retire leaks one
  * intermediate generation the same way.
  *
  * SINGLE WRITER per index: one streaming query owns the high-water
  * mark and the successor chain — same contract as the MinHashStore
  * sink. A fresh checkpoint lineage fails fast in `appendBatch`;
  * re-bind intentionally with [[graft.ml.IvfIndex.resetStreamMark]].
  *
  * At 100 TB: appends touch only the cells the batch lands in, health
  * is cell-count-bounded, and splitMerge's cost is proportional to the
  * drifted fraction — the sink's steady-state cost scales with the
  * BATCH, with occasional maintenance amortized over `maintainEvery`
  * micro-batches. The retrain escalation (full corpus rewrite at scan
  * parallelism) remains the honest worst case, now scheduled instead of
  * manual.
  */
object StreamAnn {

  /** The raw-vector IVF sink. `onMaintain` sees every maintenance tick's
    * [[graft.ml.IvfIndex.MaintainResult]] (including "ok" no-ops) — wire
    * it to ops logging; consume eagerly.
    */
  def ivfForeachBatch(index: IvfIndex, maintainEvery: Int = 0,
      policy: IvfIndex.MaintainPolicy = IvfIndex.MaintainPolicy())(
      onMaintain: (Long, IvfIndex.MaintainResult) => Unit = (_, _) => ())
      : (DataFrame, Long) => Unit = {
    var cur = IvfIndex.resolveLive(index)
    (batch: DataFrame, batchId: Long) => {
      val queryId = Option(batch.sparkSession.sparkContext
        .getLocalProperty("sql.streaming.queryId"))
      IvfIndex.appendBatch(cur, batch.select(col("vec_id"), col("v")),
        batchId, queryId)
      if (maintainEvery > 0 && (batchId + 1) % maintainEvery == 0) {
        val res = IvfIndex.maintain(cur, genPath(index.path, batchId), policy)
        if (res.index.path != cur.path) {
          IvfIndex.copyStreamMark(index.spark, cur.path, res.index.path)
          index.writeSuccessor(res.index.path)
          val prev = cur
          cur = res.index
          if (prev.path != index.path) prev.delete()
        }
        onMaintain(batchId, res)
      }
    }
  }

  /** The PQ sink — the memory-feasible index at 100 TB. `corpus` is the
    * raw-vector source of truth (the PQ index stores codes only): a
    * retrain tick — and its recall audit — reads it; lazy because most
    * ticks never do. It must COVER everything appended so far (e.g. the
    * lake table the same pipeline appends vectors to upstream) and MAY
    * run ahead of the stream: the sink restricts it to the vec_ids the
    * index actually stores before handing it to `maintain` — without
    * that, `IvfPq.retrain` (which rebuilds from the corpus frame
    * verbatim) would import rows the stream has not delivered yet, and
    * their later micro-batches would append them AGAIN.
    */
  def ivfPqForeachBatch(index: IvfPqIndex, corpus: () => DataFrame,
      maintainEvery: Int = 0,
      policy: IvfPq.MaintainPolicy = IvfPq.MaintainPolicy())(
      onMaintain: (Long, IvfPq.MaintainResult) => Unit = (_, _) => ())
      : (DataFrame, Long) => Unit = {
    var cur = IvfPq.resolveLive(index)
    (batch: DataFrame, batchId: Long) => {
      val queryId = Option(batch.sparkSession.sparkContext
        .getLocalProperty("sql.streaming.queryId"))
      IvfPq.appendBatch(cur, batch.select(col("vec_id"), col("v")),
        batchId, queryId)
      if (maintainEvery > 0 && (batchId + 1) % maintainEvery == 0) {
        val stored = index.spark.read.parquet(s"${cur.path}/cells")
          .select("vec_id")
        val res = IvfPq.maintain(cur,
          corpus().join(stored, Seq("vec_id"), "left_semi"),
          genPath(index.path, batchId), policy)
        if (res.index.path != cur.path) {
          IvfIndex.copyStreamMark(index.spark, cur.path, res.index.path)
          index.writeSuccessor(res.index.path)
          val prev = cur
          cur = res.index
          if (prev.path != index.path) prev.delete()
        }
        onMaintain(batchId, res)
      }
    }
  }

  /** Unique generation path per maintenance attempt: a crashed flip
    * leaves an orphan dir, never a name collision with a retry.
    */
  private def genPath(origin: String, batchId: Long): String =
    s"$origin@g$batchId-${java.util.UUID.randomUUID().toString.take(8)}"
}
