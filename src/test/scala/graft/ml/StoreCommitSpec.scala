package graft.ml

import graft.GraftSession
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The persisted stores' crash/replay commit contracts (r16 verdict #1 and
  * #5): MinHashStore appends publish data files + streaming mark in ONE
  * atomic manifest commit, so a crash at the widest window (after the data
  * moves, before the publish) leaves nothing visible and a replay commits
  * exactly once; the ANN indexes get the same exactly-once row counts from
  * deterministic per-batch file names + a swept replay.
  */
class StoreCommitSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def hist = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "spark structured streaming processes unbounded data with watermarks and stateful operators"),
    (3L, "a completely unrelated recipe for sourdough bread with a long fermentation schedule"))
    .toDF("doc_id", "text")

  private def batch1 = Seq(
    (101L, "spark structured streaming processes unbounded data with watermarks and stateful operators"),
    (102L, "an entirely fresh document about graph algorithms and connected components at scale"))
    .toDF("doc_id", "text")

  private def batch2 = Seq(
    (201L, "an entirely fresh document about graph algorithms and connected components at scale"))
    .toDF("doc_id", "text")

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("new_id", "hist_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("a crash between data moves and manifest publish is invisible; replay commits exactly once") {
    val store = MinHashStore.build(hist, Files.createTempDirectory("mhs-crash").toString)
    val twin = MinHashStore.build(hist, Files.createTempDirectory("mhs-clean").toString)
    val sigs0 = store.signatures.count()
    val bands0 = store.bandRows.count()
    val preCrash = pairs(store.probeEstimate(batch1, 0.5))

    // the widest crash window the old three-write append left open
    intercept[IllegalStateException] {
      store.appendCommit(batch1, Some(0L), Some("qA"), crashBeforePublish = true)
    }
    // nothing of the crashed attempt is visible: counts, probe results
    assert(store.signatures.count() == sigs0, "crashed append leaked sig rows")
    assert(store.bandRows.count() == bands0, "crashed append leaked band rows")
    assert(pairs(store.probeEstimate(batch1, 0.5)) == preCrash)

    // replay (foreachBatch redelivers batch 0): commits exactly once...
    assert(store.appendBatch(batch1, 0L, Some("qA")))
    twin.append(batch1)
    assert(store.signatures.count() == twin.signatures.count(),
      "replayed append must not duplicate the crashed attempt's rows")
    assert(store.bandRows.count() == twin.bandRows.count())
    // ...and a replay AFTER the successful commit is a guarded no-op
    assert(!store.appendBatch(batch1, 0L, Some("qA")))
    assert(store.signatures.count() == twin.signatures.count())
    // downstream probes agree with the never-crashed twin exactly
    assert(pairs(store.probeEstimate(batch2, 0.5)) ==
      pairs(twin.probeEstimate(batch2, 0.5)))
    assert(pairs(store.probeEstimate(batch2, 0.5)).contains((201L, 102L)),
      "cross-batch near-dup must survive the crash/replay cycle")
    assert(store.batchMark == ((0L, Some("qA"))))
  }

  test("compactTo follows the commit log: orphans from a crashed append are dropped") {
    val store = MinHashStore.build(hist, Files.createTempDirectory("mhs-orphan").toString)
    intercept[IllegalStateException] {
      store.appendCommit(batch1, None, None, crashBeforePublish = true)
    }
    val committedSigs = store.signatures.count()
    val answer = pairs(store.probeEstimate(batch1, 0.5))
    // force a full rewrite generation: every committed row survives, the
    // orphaned (uncommitted) files do not come back
    val gen = store.compactTo(
      Files.createTempDirectory("mhs-orphan-gen").toString, maxFilesPerBand = 0)
    assert(gen.path != store.path)
    assert(gen.signatures.count() == committedSigs,
      "compaction resurrected uncommitted orphan files")
    assert(pairs(gen.probeEstimate(batch1, 0.5)) == answer)
  }

  test("lineage guard: a fresh checkpoint's batch ids fail fast; resetStreamMark re-binds") {
    val store = MinHashStore.build(hist, Files.createTempDirectory("mhs-lineage").toString)
    assert(store.appendBatch(batch1, 0L, Some("qA")))
    assert(store.appendBatch(batch2, 1L, Some("qA")))
    // a NEW checkpoint restarts batch ids from 0: silently comparing them
    // against qA's high-water mark would skip genuinely new batches
    val fresh = Seq((301L, "totally new content arriving under a fresh checkpoint lineage"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalStateException] { store.appendBatch(fresh, 0L, Some("qB")) }
    assert(e.getMessage.contains("qA") && e.getMessage.contains("qB"))
    assert(store.signatures.count() == hist.count() + 3)
    // the operator re-bind: mark cleared, every stored doc still probeable
    store.resetStreamMark()
    assert(store.appendBatch(fresh, 0L, Some("qB")))
    assert(store.batchMark == ((0L, Some("qB"))))
    assert(pairs(store.probeEstimate(
      Seq((401L, "an entirely fresh document about graph algorithms and connected components at scale"))
        .toDF("doc_id", "text"), 0.5)).nonEmpty,
      "pre-reset history must remain probeable")
  }

  test("legacy store (no commit log) migrates on first appendBatch, honoring its marker") {
    val path = Files.createTempDirectory("mhs-legacy").toString
    val store = MinHashStore.build(hist, path)
    // strip the store back to pre-manifest shape: no _commits, a loose
    // _stream_batch marker — what a pre-r17 streaming sink left behind
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration).getRawFileSystem
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/_commits"), true)
    Files.write(java.nio.file.Paths.get(s"$path/_stream_batch"), "1".getBytes("UTF-8"))
    val legacyRows = store.bandRows.count()
    assert(legacyRows > 0, "legacy directory read must still work")
    // batch 1 is at the legacy high-water mark: the migrated guard skips it
    assert(!store.appendBatch(batch1, 1L, Some("qA")))
    assert(store.signatures.count() == hist.count())
    // batch 2 is new: appends, and the mark now lives in the manifest
    assert(store.appendBatch(batch1, 2L, Some("qA")))
    assert(store.batchMark == ((2L, Some("qA"))))
    assert(!Files.exists(java.nio.file.Paths.get(s"$path/_stream_batch")),
      "migration consumes the legacy marker file")
  }

  test("IvfIndex/IvfPq appendBatch: replay is a no-op, a crashed partial batch is swept") {
    val dir = "/root/testdata/sf0.001"
    val corpus = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val newVecs = corpus.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("v"))
    val base = corpus.filter(col("vec_id") % 7 =!= 0)

    val ivf = IvfIndex.build(base, Files.createTempDirectory("ivf-replay").toString, cells = 4)
    val n0 = spark.read.parquet(s"${ivf.path}/cells").count()
    val nNew = newVecs.count()
    assert(IvfIndex.appendBatch(ivf, newVecs, 0L))
    assert(spark.read.parquet(s"${ivf.path}/cells").count() == n0 + nNew)
    // replay of the committed batch: no row-count change
    assert(!IvfIndex.appendBatch(ivf, newVecs, 0L))
    assert(spark.read.parquet(s"${ivf.path}/cells").count() == n0 + nNew)
    // a crashed attempt of batch 1 left a partial file under the batch's
    // deterministic name prefix: the replay sweeps it before re-appending
    val cellsDir = java.nio.file.Paths.get(ivf.path, "cells")
    val someCell = Files.list(cellsDir).filter(p =>
      p.getFileName.toString.startsWith("cell=")).findFirst().get()
    val donor = Files.list(someCell).filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.copy(donor, someCell.resolve("b1-x-999.parquet"))
    assert(IvfIndex.appendBatch(ivf, newVecs.limit(5), 1L))
    assert(spark.read.parquet(s"${ivf.path}/cells").count() == n0 + nNew + 5,
      "partial-crash leftovers must be swept, not double-counted")

    val pq = IvfPq.build(base, Files.createTempDirectory("ivfpq-replay").toString,
      cells = 4, m = 4)
    val p0 = spark.read.parquet(s"${pq.path}/cells").count()
    assert(IvfPq.appendBatch(pq, newVecs, 0L))
    val p1 = spark.read.parquet(s"${pq.path}/cells").count()
    assert(p1 == p0 + nNew)
    assert(!IvfPq.appendBatch(pq, newVecs, 0L))
    assert(spark.read.parquet(s"${pq.path}/cells").count() == p1)
  }
}
