package graft.ml

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Dev tool: scale evidence for disk-index compaction — the claim is
  * that append-count file growth (not data growth) inflates probe cost,
  * and one [[IvfIndex.compact]] generation restores it while answering
  * every query identically.
  *
  * Builds an IVF index over half an sf dir's embeddings, appends the
  * other half in `batches` slices (the steady-state ingest shape), then
  * times the same probe on the fragmented and the compacted generation
  * and cross-checks row equality.
  *
  * usage: run_main.sh graft.ml.CompactProbe [sfDir] [cells] [batches]
  */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata-sf10")
    val cells = if (args.length > 1) args(1).toInt else 64
    val batches = if (args.length > 2) args(2).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = corpus.count()

    val base = java.nio.file.Files.createTempDirectory("compact-probe").toString
    val seed = corpus.filter(col("vec_id") % 2 === 0)
    val idx = IvfIndex.build(seed, s"$base/gen0", cells = cells, trainIters = 2)
    val rest = corpus.filter(col("vec_id") % 2 === 1)
    for (b <- 0 until batches)
      IvfIndex.append(idx, rest.filter(pmod(col("vec_id"), lit(2L * batches)) === (2 * b + 1)))
    val files0 = IvfIndex.cellFileCounts(spark, s"$base/gen0/cells").values.sum

    val queries = corpus.filter(col("vec_id") < 80)
    def timeSearch(i: IvfIndex): (Double, Long) = {
      val times = (1 to 5).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        val c = i.search(queries, 5, nprobe = 8).count()
        ((System.nanoTime() - t0) / 1e9, c)
      }
      (times.map(_._1).sorted.apply(2), times.head._2)
    }
    val (tFrag, rows0) = timeSearch(idx)

    val t0 = System.nanoTime()
    val idx2 = IvfIndex.compact(idx, s"$base/gen1", maxFilesPerCell = 4)
    val tCompact = (System.nanoTime() - t0) / 1e9
    val files1 = IvfIndex.cellFileCounts(spark, s"$base/gen1/cells").values.sum
    val (tComp, rows1) = timeSearch(idx2)

    val a = idx.search(queries, 5, nprobe = 8).orderBy("q_id", "rk").collect().toSeq
    val b = idx2.search(queries, 5, nprobe = 8).orderBy("q_id", "rk").collect().toSeq
    println(f"COMPACT_SCALE dir=$sfDir n=$n cells=$cells batches=$batches " +
      f"files=$files0->$files1 probe_frag=${tFrag}%.2fs probe_compact=${tComp}%.2fs " +
      f"compact_cost=${tCompact}%.1fs rows=$rows0/$rows1 equal=${a == b}")
    spark.stop()
  }
}
