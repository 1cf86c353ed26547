package graft.ml

import graft.GraftSession
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Small-file compaction for the append-mode stores (IvfIndex, IvfPq,
  * MinHashStore): every append adds task-count files per partition dir,
  * so steady-state pipelines fragment their indexes — compaction rewrites
  * ONLY the fragmented dirs into a new generation and hard-links the
  * rest, and the compacted generation must answer every query exactly as
  * the fragmented one did.
  */
class CompactSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  val dir = "/root/testdata/sf0.001"

  private def baseCorpus: DataFrame = Tables.embeddings(spark, dir)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** `n` shifted-id copies of the biggest cell's vectors — appends that
    * all land in (and fragment) one known cell.
    */
  private def pileBatches(idx: => DataFrame, cents: DataFrame, biggest: Int,
      n: Int): Seq[DataFrame] =
    (1 to n).map { i =>
      AnnOps.assignCells(baseCorpus, cents)
        .filter(col("cell") === biggest).select("vec_id", "v")
        .withColumn("vec_id", col("vec_id") + lit(1000000L * i))
    }

  private def inode(p: java.nio.file.Path): AnyRef =
    java.nio.file.Files.readAttributes(p,
      classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey

  test("IvfIndex.compact: fragmented cells rewritten, tidy cells linked, results identical") {
    val corpus = baseCorpus.persist()
    val path = java.nio.file.Files.createTempDirectory("ivf-compact").toString
    val idx = IvfIndex.build(corpus, s"$path/gen0", cells = 5, trainIters = 2)
    val biggest = idx.stats.orderBy(col("n").desc).head().getInt(0)
    pileBatches(corpus, idx.centroids, biggest, 5)
      .foreach(b => IvfIndex.append(idx, b))

    val counts0 = IvfIndex.cellFileCounts(spark, s"$path/gen0/cells")
    assert(counts0(biggest) > 5, s"appends should fragment cell $biggest: $counts0")
    val queries = corpus.filter(col("vec_id") < 10)
    val before = idx.search(queries, 5, nprobe = 3)
      .orderBy("q_id", "rk").collect().toSeq

    val idx2 = IvfIndex.compact(idx, s"$path/gen1", maxFilesPerCell = 5)
    assert(idx2.path == s"$path/gen1")
    val counts1 = IvfIndex.cellFileCounts(spark, s"$path/gen1/cells")
    assert(counts1(biggest) <= 1, s"fragmented cell not compacted: $counts1")
    // same data, same answers
    val after = idx2.search(queries, 5, nprobe = 3)
      .orderBy("q_id", "rk").collect().toSeq
    assert(after == before)
    assert(spark.read.parquet(s"$path/gen1/cells").count() ==
      spark.read.parquet(s"$path/gen0/cells").count())
    // a tidy cell's files are the SAME inodes — linked, not rewritten
    import java.nio.file.{Files, Paths}
    val tidy = counts0.filter(_._2 <= 5).keys.head
    Files.list(Paths.get(s"$path/gen0/cells/cell=$tidy")).forEach { f =>
      if (f.getFileName.toString.endsWith(".parquet")) {
        val twin = Paths.get(s"$path/gen1/cells/cell=$tidy").resolve(f.getFileName)
        assert(Files.exists(twin) && inode(f) == inode(twin),
          s"tidy cell $tidy was rewritten: $twin")
      }
    }
    // nothing fragmented -> no new generation
    assert(IvfIndex.compact(idx2, s"$path/gen2", maxFilesPerCell = 5) eq idx2)
    assert(!Files.exists(Paths.get(s"$path/gen2")))
    corpus.unpersist()
  }

  test("IvfPq.compact: same contract over the codes layout, sidecars linked") {
    val corpus = baseCorpus.persist()
    val path = java.nio.file.Files.createTempDirectory("ivfpq-compact").toString
    val idx = IvfPq.build(corpus, s"$path/gen0", cells = 5, m = 8, k = 16, iters = 2)
    val biggest = idx.stats.orderBy(col("n").desc).head().getInt(0)
    pileBatches(corpus, idx.cellCentroids, biggest, 5)
      .foreach(b => IvfPq.append(idx, b))

    val full = corpus // queries only need (vec_id, v); corpus is the re-rank side
    val queries = corpus.filter(col("vec_id") < 10)
    val before = idx.search(full, queries, 5, nprobe = 3, shortlist = 50)
      .orderBy("q_id", "rk").collect().toSeq

    val idx2 = IvfPq.compact(idx, s"$path/gen1", maxFilesPerCell = 5)
    assert(idx2.path == s"$path/gen1")
    val counts1 = IvfIndex.cellFileCounts(spark, s"$path/gen1/cells")
    assert(counts1(biggest) <= 1, s"fragmented cell not compacted: $counts1")
    val after = idx2.search(full, queries, 5, nprobe = 3, shortlist = 50)
      .orderBy("q_id", "rk").collect().toSeq
    assert(after == before)
    // metadata sidecars carried (linked) and byte-equal as frames
    assert(idx2.codebook.collect().toSet == idx.codebook.collect().toSet)
    assert(idx2.stats.collect().toSet == idx.stats.collect().toSet)
    corpus.unpersist()
  }

  test("maintain applies compact unprompted when geometry is healthy but files fragment") {
    val corpus = baseCorpus.persist()
    val path = java.nio.file.Files.createTempDirectory("ivf-maintcomp").toString
    val idx = IvfIndex.build(corpus, s"$path/gen0", cells = 5, trainIters = 2)
    // distribution-preserving appends: whole-corpus copies under fresh
    // ids — every cell scales equally (no skew, no drift), only the file
    // counts grow: the pure-fragmentation state
    for (i <- 1 to 6)
      IvfIndex.append(idx, corpus.withColumn("vec_id", col("vec_id") + lit(1000000L * i)))
    val budget = 4
    val frag0 = IvfIndex.cellFileCounts(spark, s"$path/gen0/cells")
      .count(_._2 > budget)
    assert(frag0 > 0, "appends should fragment past the test budget")

    val res = IvfIndex.maintain(idx, s"$path/gen1",
      IvfIndex.MaintainPolicy(maxFilesPerCell = budget))
    assert(res.action == "compact", s"expected compact, got ${res.action}")
    assert(res.report.fragmentedCells.nonEmpty)
    assert(res.report.splitCandidates.isEmpty && res.report.appendDrift < 0.05)
    assert(res.recall.isEmpty, "compaction is audit-free: results provably identical")
    assert(IvfIndex.cellFileCounts(spark, s"$path/gen1/cells")
      .forall(_._2 <= budget), "maintained generation still fragmented")
    // and the next tick is quiet
    val again = IvfIndex.maintain(res.index, s"$path/gen2",
      IvfIndex.MaintainPolicy(maxFilesPerCell = budget))
    assert(again.action == "ok" && (again.index eq res.index))
    corpus.unpersist()
  }

  test("MinHashStore.compactTo: probe parity, manifest + stream marker carried") {
    import spark.implicits._
    val hist = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "spark structured streaming processes unbounded data with watermarks and stateful operators"),
      (3L, "a completely unrelated recipe for sourdough bread with a long fermentation schedule"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("mhs-compact").toString
    val store = MinHashStore.build(hist, s"$path/gen0")
    // fragment: several tiny appends (each adds files to every band dir)
    for (i <- 1 to 6)
      store.append(Seq((100L + i,
        s"filler document number $i about nothing in particular with enough words to shingle"))
        .toDF("doc_id", "text"))
    // a streaming high-water marker to carry over
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/gen0/_stream_batch"), "5".getBytes("UTF-8"))

    val batch = Seq(
      (201L, "spark structured streaming processes unbounded data with watermarks and stateful operators"),
      (202L, "filler document number 3 about nothing in particular with enough words to shingle"))
      .toDF("doc_id", "text")
    val histNow = hist.unionByName((1 to 6).map(i => (100L + i,
      s"filler document number $i about nothing in particular with enough words to shingle"))
      .toDF("doc_id", "text"))
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("new_id", "hist_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = pairs(store.probe(batch, histNow, 0.5))
    val beforeEst = pairs(store.probeEstimate(batch, 0.35))
    assert(before.contains((201L, 2L)) && before.contains((202L, 103L)))

    val counts0 = IvfIndex.cellFileCounts(spark, s"$path/gen0/bands", "band=")
    assert(counts0.values.max > 3, s"appends should fragment bands: $counts0")
    val store2 = store.compactTo(s"$path/gen1", maxFilesPerBand = 3)
    assert(store2.path == s"$path/gen1")
    val counts1 = IvfIndex.cellFileCounts(spark, s"$path/gen1/bands", "band=")
    assert(counts1.values.max <= 1, s"bands not compacted: $counts1")
    // identical answers from the compacted generation
    assert(pairs(store2.probe(batch, histNow, 0.5)) == before)
    assert(pairs(store2.probeEstimate(batch, 0.35)) == beforeEst)
    // manifest + streaming marker carried (the mark rides the new
    // generation's commit log since r17, not a loose marker file)
    assert(MinHashStore.readParams(spark, s"$path/gen1")
      .contains(MinHashStore.CurrentParams))
    assert(store2.batchMark._1 == 5L, s"carried mark: ${store2.batchMark}")
    // tidy store: no new generation
    assert(store2.compactTo(s"$path/gen2", maxFilesPerBand = 3) eq store2)
  }
}
