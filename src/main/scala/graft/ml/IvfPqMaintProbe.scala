package graft.ml

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev tool: scale evidence for the PQ index's maintenance loop — the
  * claims are (a) `health` is a cheap corpus-free monitor (narrow
  * (cell,qerr) scan + one listing) that flags drift at scale, (b)
  * `splitMerge` cost tracks the drifted FRACTION (hard-linked
  * survivors), and (c) one `maintain` tick restores recall on a drifted
  * corpus where a frozen index decayed.
  *
  * usage: run_main.sh graft.ml.IvfPqMaintProbe [sfDir] [cells]
  */
object IvfPqMaintProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata-sf10")
    val cells = if (args.length > 1) args(1).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.l2normalize
    val corpus = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        l2normalize(col("embedding").cast("array<double>")).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = corpus.count()
    val dim = corpus.select(size(col("v"))).head().getInt(0)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val base = java.nio.file.Files.createTempDirectory("ivfpq-maint-probe").toString

    // --- section 1: localized pile-up -> splitMerge (cost ∝ fraction) ---
    val (idx, tBuild) = time(IvfPq.build(corpus, s"$base/gen0",
      cells = cells, m = 8, k = 64, iters = 2))
    val biggest = idx.stats.orderBy(col("n").desc).head().getInt(0)
    val pile = AnnOps.assignCells(corpus, idx.cellCentroids)
      .filter(col("cell") === biggest).select("vec_id", "v")
      .withColumn("vec_id", col("vec_id") + 10000000L)
      .withColumn("v", expr(
        "transform(v, (x, i) -> x + 0.002 * double((vec_id * 7 + i * 13) % 11 - 5))"))
      .withColumn("v", l2normalize(col("v")))
    IvfPq.append(idx, pile)
    val (h1, tHealth) = time(IvfPq.health(idx, splitFactor = 1.5))
    val (gen1, tSplit) = time(IvfPq.splitMerge(idx, s"$base/gen1",
      splitFactor = 1.5, subCells = 4))
    val rewritten = IvfIndex.cellFileCounts(spark, s"$base/gen0/cells").keySet
      .diff(IvfIndex.cellFileCounts(spark, s"$base/gen1/cells").keySet).size
    println(f"PQMAINT pile dir=$sfDir n=$n cells=$cells build=${tBuild}%.1fs " +
      f"health=${tHealth}%.1fs (rec=${h1.recommendation} " +
      f"split=${h1.splitCandidates.size} appendDrift=${h1.appendDrift}%.3f) " +
      f"splitMerge=${tSplit}%.1fs cells_rewritten=$rewritten/${cells} " +
      f"(vs build ${tBuild}%.1fs — fraction-cost claim)")

    // --- section 2: distribution drift -> retrain restores recall -------
    val driftRows = for (c <- 0 until 8; m <- 0 until (n / 16).toInt) yield {
      val raw = Array.tabulate(dim) { d =>
        (((c * 37 + d * 13) % 19) - 9).toDouble +
          2.5 * (((m * 5 + d * 3 + c) % 11) - 5)
      }
      val nn = math.sqrt(raw.map(x => x * x).sum)
      Row(20000000L + c.toLong * (n / 16) + m, raw.map(_ / nn).toSeq)
    }
    val drift = spark.createDataFrame(
      spark.sparkContext.parallelize(driftRows, 32),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("v", ArrayType(DoubleType)))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val idxD = IvfPq.build(corpus, s"$base/dgen0", cells = cells, m = 8, k = 64, iters = 2)
    IvfPq.append(idxD, drift)
    val full = corpus.unionByName(drift)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (h2, tHealth2) = time(IvfPq.health(idxD))
    val before = IvfPq.measureRecall(idxD, full, nQueries = 64)
    // the floor demands maintenance not degrade the index — the audit
    // net that escalates a wrong cheap action to a retrain
    val (res, tMaint) = time(IvfPq.maintain(idxD, full, s"$base/dgen1",
      IvfPq.MaintainPolicy(recallFloor = before)))
    // the axis the monitor actually reads: the appended rows' stored
    // reconstruction error, frozen codebook vs retrained codebook — two
    // narrow (vec_id, qerr) scans restricted to the drift id range
    def driftQerr(p: String): Double =
      IvfIndex.readOwn(spark, s"$p/cells", Some("cell"))
        .filter(col("vec_id") >= 20000000L)
        .agg(avg("qerr")).head().getDouble(0)
    println(f"PQMAINT drift dir=$sfDir appended=${drift.count()} " +
      f"health=${tHealth2}%.1fs (rec=${h2.recommendation} appendDrift=${h2.appendDrift}%.3f) " +
      f"recall_before=${before}%.3f action=${res.action} " +
      f"recall_after=${res.recall.getOrElse(-1.0)}%.3f maintain=${tMaint}%.1fs " +
      f"drift_qerr_frozen=${driftQerr(s"$base/dgen0")}%.4f " +
      f"drift_qerr_retrained=${driftQerr(res.index.path)}%.4f")
    spark.stop()
  }
}
