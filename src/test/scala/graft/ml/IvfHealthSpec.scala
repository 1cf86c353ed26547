package graft.ml

import graft.GraftSession
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The maintenance TRIGGER: [[IvfIndex.health]] compares a cheap sampled
  * scan against the build-time per-cell snapshot and recommends
  * ok / splitMerge / retrain — so the expensive actions IvfRetrainSpec
  * proves out run when the statistics say so, not on a blind schedule.
  */
class IvfHealthSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  val dir = "/root/testdata/sf0.001"

  private def baseCorpus: DataFrame = Tables.embeddings(spark, dir)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Same drifted-region construction as IvfRetrainSpec: tight clusters
    * nowhere near the fixture embeddings, pure integer formula.
    */
  private def driftVectors(dim: Int, count: Int): DataFrame = {
    val rows = for {
      c <- 0 until 8
      m <- 0 until count
    } yield {
      val raw = Array.tabulate(dim) { d =>
        (((c * 37 + d * 13) % 19) - 9).toDouble +
          2.5 * (((m * 5 + d * 3 + c) % 11) - 5)
      }
      val n = math.sqrt(raw.map(x => x * x).sum)
      Row(1000000L + c * count + m, raw.map(_ / n).toSeq)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("v", ArrayType(DoubleType)))))
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("fresh build reports ok: no drift, no size outliers") {
    val corpus = baseCorpus.persist()
    val path = java.nio.file.Files.createTempDirectory("ivf-health0").toString
    val idx = IvfIndex.build(corpus, s"$path/gen0", cells = 10, trainIters = 3)
    val h = IvfIndex.health(idx)
    info(f"skew=${h.sizeSkew}%.2f drift=${h.simDrift}%.4f cellDrop=${h.appendDrift}%.4f -> ${h.recommendation}")
    assert(h.recommendation == "ok")
    assert(math.abs(h.simDrift) < 1e-9, "stats vs snapshot of the same data must agree")
    assert(h.appendDrift < 1e-9)
    assert(h.cells.map(_.size).sum == corpus.count())
    assert(h.cells.forall(c => c.size == c.buildSize))
    corpus.unpersist()
  }

  test("distribution drift is flagged for retrain BEFORE base recall decays") {
    val corpus = baseCorpus.persist()
    val dim = corpus.select(size(col("v"))).head().getInt(0)
    val path = java.nio.file.Files.createTempDirectory("ivf-health1").toString
    val idx = IvfIndex.build(corpus, s"$path/gen0", cells = 10, trainIters = 3)

    // "before recall visibly decays" baseline: base-region query results
    // through the fresh index, pre-append
    val queries = corpus.filter(col("vec_id") % 20 === 0)
    val exact = pairs(AnnOps.bruteForceTopK(corpus, queries, 5))
    val got0 = pairs(idx.search(queries, 5, nprobe = 2))
    val recall0 = (exact & got0).size.toDouble / exact.size

    // an EARLY slice of the IvfRetrainSpec drift (56 vectors on a 500-vector
    // corpus) — long before the appended region dominates any cell
    val earlyDrift = driftVectors(dim, count = 7).persist()
    IvfIndex.append(idx, earlyDrift)

    val h = IvfIndex.health(idx)
    info(f"skew=${h.sizeSkew}%.2f drift=${h.simDrift}%.4f cellDrop=${h.appendDrift}%.4f -> ${h.recommendation}")
    assert(h.recommendation == "retrain",
      s"far-from-centroid appends must flag retrain, got ${h.recommendation}")
    assert(h.appendDrift > 0.05,
      s"the appended mass's quality gap must carry the early signal, got ${h.appendDrift}")

    // the monitor fired while base-query recall is UNCHANGED — the early
    // warning precedes any visible quality decay for existing data
    val got1 = pairs(idx.search(queries, 5, nprobe = 2))
    val recall1 = (exact & got1).size.toDouble / exact.size
    info(f"base recall before/after early drift: $recall0%.2f / $recall1%.2f")
    assert(recall1 >= recall0 - 0.02,
      s"monitor should fire before recall decays: $recall0 -> $recall1")
    corpus.unpersist(); earlyDrift.unpersist()
  }

  test("in-distribution pile-up is flagged for splitMerge, not retrain") {
    val corpus = baseCorpus.persist()
    val path = java.nio.file.Files.createTempDirectory("ivf-health2").toString
    val idx = IvfIndex.build(corpus, s"$path/gen0", cells = 10, trainIters = 3)

    // duplicate the biggest cell's vectors under fresh ids: appends that sit
    // EXACTLY on the trained distribution (mean sim unchanged) but
    // concentrate in one cell — localized maintenance, not a retrain
    val biggest = idx.stats.orderBy(col("n").desc).head().getInt(0)
    val pile = spark.read.parquet(s"$path/gen0/cells")
      .filter(col("cell") === biggest).select("vec_id", "v")
      .withColumn("vec_id", col("vec_id") + 3000000L)
    IvfIndex.append(idx, pile)

    val h = IvfIndex.health(idx, splitFactor = 1.5)
    info(f"skew=${h.sizeSkew}%.2f drift=${h.simDrift}%.4f " +
      f"split=${h.splitCandidates} -> ${h.recommendation}")
    assert(h.recommendation == "splitMerge",
      s"in-distribution pile-up must flag splitMerge, got ${h.recommendation}")
    assert(h.appendDrift < 0.05, "duplicated in-distribution vectors add no sim drift")
    assert(h.splitCandidates.contains(biggest))
    corpus.unpersist()
  }

  test("maintain: drifted corpus -> one call applies retrain and restores recall") {
    val corpus = baseCorpus.persist()
    val dim = corpus.select(size(col("v"))).head().getInt(0)
    val path = java.nio.file.Files.createTempDirectory("ivf-maint1").toString
    val idx = IvfIndex.build(corpus, s"$path/gen0", cells = 10, trainIters = 3)
    // the recall SLO is what a HEALTHY index of this family delivers on
    // this corpus (self-query recall at the policy's nprobe is bounded by
    // the quantizer's intrinsic quality, not 1.0) — maintenance restores
    // the healthy band, it cannot exceed the family's ceiling
    val healthy = IvfIndex.measureRecall(idx)
    // the full IvfRetrainSpec drift corpus — recall through the frozen
    // quantizer decays below the healthy band before maintenance
    val drift = driftVectors(dim, count = 25).persist()
    IvfIndex.append(idx, drift)
    val before = IvfIndex.measureRecall(idx)
    val floor = healthy - 0.05
    val res = IvfIndex.maintain(idx, s"$path/gen1",
      IvfIndex.MaintainPolicy(recallFloor = floor))
    info(f"action=${res.action} healthy=$healthy%.2f drifted=$before%.2f after=${res.recall.get}%.2f")
    assert(res.action == "retrain", s"drift must drive a retrain, got ${res.action}")
    assert(res.index.path == s"$path/gen1")
    assert(res.recall.get >= floor,
      s"maintenance must restore the healthy band: ${res.recall.get} < $floor")
    assert(res.recall.get > before,
      s"maintenance must improve the drifted index: $before -> ${res.recall.get}")
    // old generation untouched until the caller flips its pointer
    assert(idx.centroids.count() == 10)
    corpus.unpersist(); drift.unpersist()
  }

  test("maintain: healthy index is a no-op; pile-up applies splitMerge and clears the floor") {
    val corpus = baseCorpus.persist()
    val path = java.nio.file.Files.createTempDirectory("ivf-maint2").toString
    val idx = IvfIndex.build(corpus, s"$path/gen0", cells = 10, trainIters = 3)
    val healthy = IvfIndex.measureRecall(idx)
    val ok = IvfIndex.maintain(idx, s"$path/never")
    assert(ok.action == "ok" && (ok.index eq idx) && ok.recall.isEmpty)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/never")))

    // in-distribution pile-up: the biggest cell's vectors under fresh ids
    // with a small DETERMINISTIC jitter (renormalized) — exact duplicates
    // would make the recall audit a tie-break lottery between brute force
    // and the probed scan, and no amount of maintenance clears that
    val biggest = idx.stats.orderBy(col("n").desc).head().getInt(0)
    val pile = spark.read.parquet(s"$path/gen0/cells")
      .filter(col("cell") === biggest).select("vec_id", "v")
      .withColumn("vec_id", col("vec_id") + 3000000L)
      .withColumn("v", expr(
        "transform(v, (x, i) -> x + 0.002 * double((vec_id * 7 + i * 13) % 11 - 5))"))
      .withColumn("v", graft.functions.l2normalize(col("v")))
    IvfIndex.append(idx, pile)
    val floor = healthy - 0.05
    val res = IvfIndex.maintain(idx, s"$path/gen1",
      IvfIndex.MaintainPolicy(splitFactor = 1.5, recallFloor = floor))
    info(f"action=${res.action} healthy=$healthy%.2f recall=${res.recall.get}%.2f")
    assert(res.action == "splitMerge" || res.action == "splitMerge->retrain")
    assert(res.recall.get >= floor,
      s"maintenance must stay in the healthy band: ${res.recall.get} < $floor")
    corpus.unpersist()
  }

  test("sampled health agrees with exact health on the recommendation") {
    val corpus = baseCorpus.persist()
    val dim = corpus.select(size(col("v"))).head().getInt(0)
    val path = java.nio.file.Files.createTempDirectory("ivf-health3").toString
    val idx = IvfIndex.build(corpus, s"$path/gen0", cells = 10, trainIters = 3)
    IvfIndex.append(idx, driftVectors(dim, count = 25))
    val exact = IvfIndex.health(idx)
    val sampled = IvfIndex.health(idx, sampleFraction = 0.5)
    info(f"exact cellDrop=${exact.appendDrift}%.4f sampled cellDrop=${sampled.appendDrift}%.4f")
    assert(exact.recommendation == sampled.recommendation)
    corpus.unpersist()
  }

  test("deep k-means training stays caller-proof (lineage checkpointed)") {
    // Each Lloyd's round nests the previous round's plan; without the
    // periodic localCheckpoint a trainIters=20 caller re-derives a
    // 20-deep plan per action (quadratic analysis cost, driver OOM at
    // width). The checkpoint every 3 rounds bounds the final plan to the
    // last ≤3 rounds' lineage regardless of iters.
    val corpus = baseCorpus.limit(200).persist()
    val cents = AnnOps.kmeansCells(corpus, k = 4, iters = 20)
    val planLines = cents.queryExecution.optimizedPlan.numberedTreeString.linesIterator.size
    assert(planLines < 120, s"k-means plan not checkpointed: $planLines lines")
    assert(cents.count() == 4)
    corpus.unpersist()
  }
}
