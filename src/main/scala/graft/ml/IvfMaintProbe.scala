package graft.ml

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev tool: [[IvfPqMaintProbe]]'s sibling for the raw-vector IVF index —
  * checks that the COSINE-axis monitor ([[IvfIndex.health]]) keeps its
  * sensitivity at scale (the PQ probe caught its qerr-axis tolerance
  * mis-calibrated against a rich codebook; this verifies the IVF
  * default isn't hiding the same class of miss), and records the
  * maintenance costs at sf10.
  *
  * usage: run_main.sh graft.ml.IvfMaintProbe [sfDir] [cells]
  */
object IvfMaintProbe {
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
    val base = java.nio.file.Files.createTempDirectory("ivf-maint-probe").toString

    val (idx, tBuild) = time(IvfIndex.build(corpus, s"$base/gen0",
      cells = cells, trainIters = 2))

    // in-distribution pile-up: splitMerge expected, appendDrift ~0
    val biggest = idx.stats.orderBy(col("n").desc).head().getInt(0)
    val pile = spark.read.parquet(s"$base/gen0/cells")
      .filter(col("cell") === biggest).select("vec_id", "v")
      .withColumn("vec_id", col("vec_id") + 10000000L)
      .withColumn("v", expr(
        "transform(v, (x, i) -> x + 0.002 * double((vec_id * 7 + i * 13) % 11 - 5))"))
      .withColumn("v", l2normalize(col("v")))
    IvfIndex.append(idx, pile)
    val (h1, tHealth1) = time(IvfIndex.health(idx, splitFactor = 1.5))
    println(f"IVFMAINT pile dir=$sfDir n=$n cells=$cells build=${tBuild}%.1fs " +
      f"health=${tHealth1}%.1fs rec=${h1.recommendation} " +
      f"split=${h1.splitCandidates.size} appendDrift=${h1.appendDrift}%.4f")

    // foreign drift (the sf0.001 IvfRetrainSpec formula at sf10 mass):
    // retrain expected — the sensitivity check the PQ probe failed
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
    val idxD = IvfIndex.build(corpus, s"$base/dgen0", cells = cells, trainIters = 2)
    IvfIndex.append(idxD, drift)
    val (h2, tHealth2) = time(IvfIndex.health(idxD))
    println(f"IVFMAINT drift dir=$sfDir appended=${driftRows.size} " +
      f"health=${tHealth2}%.1fs rec=${h2.recommendation} " +
      f"appendDrift=${h2.appendDrift}%.4f (driftTol 0.05)")
    spark.stop()
  }
}
