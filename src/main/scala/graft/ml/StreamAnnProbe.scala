package graft.ml

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool: steady-state evidence for the streaming ANN ingest sink
  * ([[graft.streaming.StreamAnn.ivfForeachBatch]]) — the claims are
  * (1) per-micro-batch append cost stays FLAT as the index grows (an
  * append touches only the cells the batch lands in), (2) the
  * unprompted maintenance tick is cheap when the index is healthy and
  * pays for itself when it isn't (fragmentation from many small
  * appends → compact), and (3) probe recall holds across the run —
  * the sink keeps the index at its query-path contract without any
  * manual stop-compact-restart cycle.
  *
  * Splits an sf dir's embeddings into an initial half plus `batches`
  * equal micro-batches, drives the EXACT sink closure per batch (what a
  * writeStream.foreachBatch would call), printing each batch's wall
  * time, the live generation's per-cell file ceiling, and — after every
  * maintenance tick — the action taken plus a self-query recall sample
  * on the LIVE generation.
  *
  * usage: run_main.sh graft.ml.StreamAnnProbe [sfDir] [batches] [maintainEvery] [pq]
  *   4th arg `pq` drives [[graft.streaming.StreamAnn.ivfPqForeachBatch]]
  *   instead — the memory-feasible index at 100 TB — with an
  *   over-covering corpus provider (the full embeddings table), so the
  *   sink's stored-vec_id restriction is exercised at scale too.
  */
object StreamAnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val batches = if (args.length > 1) args(1).toInt else 16
    val maintainEvery = if (args.length > 2) args(2).toInt else 4
    val pqMode = args.length > 3 && args(3) == "pq"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = corpus.count()
    val cells = math.max(16, math.sqrt(n / 2.0).toInt)

    val hist = corpus.filter(col("vec_id") % 2 === 0)
    def batch(b: Int): DataFrame = corpus.filter(
      col("vec_id") % 2 === 1 &&
        pmod(expr("vec_id div 2"), lit(batches.toLong)) === b)

    def maxFilesPerCellAt(p: String): Int = {
      val cellsDir = new java.io.File(s"$p/cells")
      cellsDir.listFiles().filter(_.isDirectory)
        .map(_.listFiles().count(_.getName.endsWith(".parquet")))
        .foldLeft(0)(math.max)
    }

    if (pqMode) {
      val nprobe = math.max(3, cells / 10)
      val path = java.nio.file.Files.createTempDirectory("stream-pq-probe").toString
      val t0 = System.nanoTime()
      val origin = IvfPq.build(hist, path, cells = cells, m = 8)
      println(f"STREAMPQ build dir=$sfDir n=$n cells=$cells m=8 batches=$batches " +
        f"every=$maintainEvery hist=${hist.count()} wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
      // the provider deliberately OVER-COVERS (whole table, both splits):
      // the sink must restrict retrains to delivered vec_ids
      val sink = graft.streaming.StreamAnn.ivfPqForeachBatch(origin,
        () => corpus, maintainEvery,
        IvfPq.MaintainPolicy(maxFilesPerCell = 8, targetFilesPerCell = 1,
          recallQueries = 32, k = 5, nprobe = nprobe)) { (bid, r) =>
        println(f"STREAMPQ tick=$bid action=${r.action} " +
          f"appendDrift=${r.report.appendDrift}%.4f frag=${r.report.fragmentedCells.size} " +
          f"recallAudit=${r.recall.map(v => f"$v%.3f").getOrElse("-")}")
      }
      var seen = hist.count()
      for (b <- 0 until batches) {
        spark.sharedState.cacheManager.clearCache()
        val bd = batch(b)
        val t = System.nanoTime()
        sink(bd, b.toLong)
        seen += bd.count()
        val live = IvfPq.resolveLive(origin)
        println(f"STREAMPQ batch=$b wall=${(System.nanoTime() - t) / 1e9}%.2fs " +
          f"indexed=$seen maxFiles=${maxFilesPerCellAt(live.path)}")
      }
      val live = IvfPq.resolveLive(origin)
      val stored = spark.read.parquet(s"${live.path}/cells").select("vec_id")
      val storedCorpus = corpus.join(stored, Seq("vec_id"), "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tq = System.nanoTime()
      val rec = IvfPq.measureRecall(live, storedCorpus, k = 5, nprobe = nprobe)
      val tRec = (System.nanoTime() - tq) / 1e9
      val control = IvfPq.build(storedCorpus,
        java.nio.file.Files.createTempDirectory("stream-pq-ctl").toString,
        cells = cells, m = 8)
      val recCtl = IvfPq.measureRecall(control, storedCorpus, k = 5, nprobe = nprobe)
      println(f"STREAMPQ final live=${live.path} storedRows=${stored.count()} " +
        f"recall=$rec%.3f freshControl=$recCtl%.3f auditWall=$tRec%.1fs " +
        f"maxFiles=${maxFilesPerCellAt(live.path)}")
      spark.stop()
      return
    }

    val path = java.nio.file.Files.createTempDirectory("stream-ann-probe").toString
    val t0 = System.nanoTime()
    val origin = IvfIndex.build(hist, path, cells = cells)
    println(f"STREAMANN build dir=$sfDir n=$n cells=$cells batches=$batches " +
      f"every=$maintainEvery hist=${hist.count()} wall=${(System.nanoTime() - t0) / 1e9}%.1fs")

    def maxFilesPerCell(p: String): Int = maxFilesPerCellAt(p)
    // nprobe sized to the cell count (the recall lever: ~10% of cells
    // probed — ScaleSpec's sf1 receipt reads 0.99 at 12.5%); driftTol
    // sits ABOVE the quantizer's generalization gap (in-distribution
    // appends read appendDrift ≈ 0.065 at ~100 training points/cell —
    // k-means centroids overfit their training mass, so FRESH points
    // from the same distribution score a slightly lower assignment
    // cosine; a tolerance below the gap retrains on every tick for
    // nothing — see BENCHNOTES round 17)
    val nprobe = math.max(3, cells / 10)
    val policy = IvfIndex.MaintainPolicy(maxFilesPerCell = 8,
      targetFilesPerCell = 1, driftTol = 0.12,
      recallQueries = 32, k = 5, nprobe = nprobe)
    val sink = graft.streaming.StreamAnn.ivfForeachBatch(origin,
      maintainEvery, policy) { (bid, r) =>
      println(f"STREAMANN tick=$bid action=${r.action} " +
        f"appendDrift=${r.report.appendDrift}%.4f frag=${r.report.fragmentedCells.size} " +
        f"recallAudit=${r.recall.map(v => f"$v%.3f").getOrElse("-")}")
    }
    var seen = hist.count()
    for (b <- 0 until batches) {
      spark.sharedState.cacheManager.clearCache()
      val bd = batch(b)
      val t = System.nanoTime()
      sink(bd, b.toLong)
      seen += bd.count()
      val live = IvfIndex.resolveLive(origin)
      println(f"STREAMANN batch=$b wall=${(System.nanoTime() - t) / 1e9}%.2fs " +
        f"indexed=$seen maxFiles=${maxFilesPerCell(live.path)}")
    }
    val live = IvfIndex.resolveLive(origin)
    val tq = System.nanoTime()
    val rec = IvfIndex.measureRecall(live, k = 5, nprobe = nprobe, nQueries = 32)
    val tRec = (System.nanoTime() - tq) / 1e9
    // control: a fresh single-shot build over the SAME final corpus —
    // the bar the maintained index must hold
    val control = IvfIndex.build(
      spark.read.parquet(s"${live.path}/cells").select("vec_id", "v"),
      java.nio.file.Files.createTempDirectory("stream-ann-ctl").toString,
      cells = cells)
    val recCtl = IvfIndex.measureRecall(control, k = 5, nprobe = nprobe, nQueries = 32)
    println(f"STREAMANN final live=${live.path} recall=$rec%.3f " +
      f"freshControl=$recCtl%.3f auditWall=$tRec%.1fs " +
      f"maxFiles=${maxFilesPerCell(live.path)}")
    spark.stop()
  }
}
