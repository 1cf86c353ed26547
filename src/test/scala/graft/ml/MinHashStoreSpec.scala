package graft.ml

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted incremental near-dup path: build a signature store from
  * history, probe new batches against it without recomputing history
  * signatures, append, repeat.
  */
class MinHashStoreSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private val hist = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "spark structured streaming processes unbounded data with watermarks and stateful operators"),
    (3L, "parquet columnar storage enables predicate pushdown and column pruning for analytic scans"),
    (4L, "a completely unrelated recipe for sourdough bread with a long fermentation schedule"),
    (5L, "minhash signatures approximate jaccard similarity between shingled token sets efficiently"))
    .toDF("doc_id", "text")

  private val batch = Seq(
    (101L, "spark structured streaming processes unbounded data with watermarks and stateful operators"), // exact dup of 2
    (102L, "parquet columnar storage enables predicate pushdown and column pruning for analytical scans"), // near dup of 3
    (103L, "an entirely fresh document about graph algorithms and connected components at scale"))
    .toDF("doc_id", "text")

  /** Exact cross-batch reference: all-pairs jaccard over the same shingle
    * sets (no LSH) — on this corpus every true pair sits far above the
    * banding's recall knee, so probe == reference is exact equality.
    */
  private def directCross(b: org.apache.spark.sql.DataFrame,
      h: org.apache.spark.sql.DataFrame, thr: Double): Set[(Long, Long)] = {
    val a = DedupOps.minhashed(b).select(col("doc_id").as("new_id"), col("sh").as("sh_n"))
    val c = DedupOps.minhashed(h).select(col("doc_id").as("hist_id"), col("sh").as("sh_h"))
    a.crossJoin(c)
      .select(col("new_id"), col("hist_id"),
        graft.functions.jaccard(col("sh_n"), col("sh_h")).as("sim"))
      .filter(col("sim") >= thr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("new_id", "hist_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("probe finds exactly the cross-batch near-dups; history text only semi-joined") {
    val path = java.nio.file.Files.createTempDirectory("mhstore").toString
    val store = MinHashStore.build(hist, path)
    val probed = store.probe(batch, hist, 0.5)
    assert(pairs(probed) == directCross(batch, hist, 0.5))
    assert(pairs(probed).contains((101L, 2L)) && pairs(probed).contains((102L, 3L)))
    assert(!pairs(probed).exists(_._1 == 103L), "unique doc matched history")
    // the history TEXT frame must enter the plan only through the
    // candidate semi-join (shortlist-scale re-shingle), never as a full
    // signature pass
    val plan = probed.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(500))
  }

  test("append grows the store: a later batch matches earlier appended docs") {
    val path = java.nio.file.Files.createTempDirectory("mhstore2").toString
    val store = MinHashStore.build(hist, path)
    store.append(batch) // batch ids become history for the next round
    val batch2 = Seq(
      (201L, "an entirely fresh document about graph algorithms and connected components at scale"), // dup of appended 103
      (202L, "yet another document that matches nothing stored so far in any way"))
      .toDF("doc_id", "text")
    val histNow = hist.unionByName(batch)
    val got = pairs(store.probe(batch2, histNow, 0.5))
    assert(got.contains((201L, 103L)), s"appended doc not findable: $got")
    assert(!got.exists(_._1 == 202L))
    assert(got == directCross(batch2, histNow, 0.5))
  }

  test("bucket cap is union MEMBERSHIP (minhashPairs semantics), not the pair product") {
    // 6 identical history docs + 2 identical batch docs share every
    // bucket: membership 8 ≤ cap 10 must KEEP the 12 cross pairs even
    // though the hist×new product (12 per band) exceeds the cap — a
    // product-counted cap (the first r15 cut) silently dropped exactly
    // this shape while a union minhashPairs run kept it
    val text = "a boilerplate paragraph repeated across many crawled pages verbatim every time"
    val h = (1L to 6L).map(i => (i, text)).toDF("doc_id", "text")
    val b = Seq((101L, text), (102L, text)).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("mhstore-cap").toString
    val store = MinHashStore.build(h, path)
    val kept = pairs(store.probe(b, h, 0.5, maxBucket = 10))
    assert(kept.size == 12, s"expected all 12 cross pairs, got ${kept.size}: $kept")
    // and past the membership cap the bucket drops, as in minhashPairs
    assert(pairs(store.probe(b, h, 0.5, maxBucket = 7)).isEmpty)
  }

  test("empty-store bootstrap: build from nothing, probe finds nothing, first append lights it up") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("mhstore-empty").toString
    val store = MinHashStore.build(Seq.empty[(Long, String)].toDF("doc_id", "text"), path)
    // the streaming bootstrap shape: no history yet — probes return
    // empty instead of failing schema inference on footer-less dirs
    assert(store.probe(batch, hist.limit(0), 0.5).isEmpty)
    assert(store.probeEstimate(batch, 0.5).isEmpty)
    assert(MinHashStore.readParams(spark, path).contains(MinHashStore.CurrentParams))
    store.append(hist)
    val got = pairs(store.probe(batch, hist, 0.5))
    assert(got == directCross(batch, hist, 0.5) && got.contains((101L, 2L)))
  }

  test("probing a store built under different signature params fails fast, naming both") {
    val path = java.nio.file.Files.createTempDirectory("mhstore-params").toString
    MinHashStore.build(hist, path)
    // forge the manifest of a store built by a differently-parameterized
    // build (k=64, 16 bands) — the failure mode the manifest exists for
    java.nio.file.Files.write(java.nio.file.Paths.get(path, "_params.json"),
      """{"shingleN":5,"k":64,"bands":16,"rowsPerBand":4,"tokenizer":"graft-shingle-v0"}"""
        .getBytes("UTF-8"))
    // drop Hadoop LocalFileSystem's checksum sidecar — the nio rewrite
    // above invalidated it (a real mismatched store writes its own)
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path, "._params.json.crc"))
    val store = MinHashStore.Store(spark, path)
    val e = intercept[IllegalArgumentException](store.probe(batch, hist, 0.5))
    assert(e.getMessage.contains("k=64") || e.getMessage.contains("64"), e.getMessage)
    assert(e.getMessage.contains("32"), s"message must name BOTH sets: ${e.getMessage}")
    intercept[IllegalArgumentException](store.probeEstimate(batch, 0.5))
    intercept[IllegalArgumentException](store.append(batch))
    // a matching manifest (what build writes) passes
    val path2 = java.nio.file.Files.createTempDirectory("mhstore-params2").toString
    val ok = MinHashStore.build(hist, path2)
    assert(MinHashStore.readParams(spark, path2).contains(MinHashStore.CurrentParams))
    assert(pairs(ok.probe(batch, hist, 0.5)).nonEmpty)
  }

  test("probeHandle.close releases every cache pin the probe created") {
    val path = java.nio.file.Files.createTempDirectory("mhstore-rel").toString
    val store = MinHashStore.build(hist, path)
    val cm = spark.sharedState.cacheManager
    cm.clearCache()
    assert(cm.isEmpty)
    val h = store.probeHandle(batch, hist, 0.5)
    assert(pairs(h.pairs) == directCross(batch, hist, 0.5))
    assert(!cm.isEmpty, "probe should have pinned its batch/candidate frames")
    h.close()
    assert(cm.isEmpty, "close() must unpersist every pin the probe created")
    // estimate variant: same contract
    val h2 = store.probeEstimateHandle(batch, 0.35)
    assert(pairs(h2.pairs).contains((101L, 2L)))
    assert(!cm.isEmpty)
    h2.close()
    assert(cm.isEmpty)
  }

  test("probeEstimate agrees with probe on this corpus without reading history text") {
    val path = java.nio.file.Files.createTempDirectory("mhstore3").toString
    val store = MinHashStore.build(hist, path)
    // exact dup estimates 1.0; the near-dup pair's estimate is noisy
    // (stderr ~0.09 at k=32) so assert at a loosened threshold
    val est = pairs(store.probeEstimate(batch, 0.35))
    assert(est.contains((101L, 2L)) && est.contains((102L, 3L)))
    assert(!est.exists(_._1 == 103L))
  }
}
