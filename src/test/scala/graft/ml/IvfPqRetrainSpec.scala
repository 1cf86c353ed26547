package graft.ml

import graft.GraftSession
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The PQ index's maintenance contract, mirroring IvfRetrainSpec /
  * IvfHealthSpec: [[IvfPq.append]] keeps BOTH quantizers frozen, so a
  * drifting corpus inflates the stored per-row quantization error and
  * decays probe recall; [[IvfPq.health]] reads the inflation from the
  * codes-only store (no corpus access), and [[IvfPq.maintain]] applies
  * splitMerge (corpus-free, on decoded reconstructions) or retrain (the
  * only action that touches source vectors) and audits recall.
  */
class IvfPqRetrainSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  val dir = "/root/testdata/sf0.001"

  // unit-normalized, per the q_ann_pq lesson (both quantizers train on
  // the sphere) — and the drift fixtures are unit vectors, so qerr on the
  // two populations is comparable
  private def baseCorpus: DataFrame = Tables.embeddings(spark, dir)
    .select(col("vec_id"),
      graft.functions.l2normalize(col("embedding").cast("array<double>")).as("v"))

  /** Same drifted-region construction as IvfRetrainSpec: 8 tight clusters
    * nowhere near the fixture embeddings, pure integer formula.
    */
  private def driftVectors(dim: Int, count: Int, amp: Double = 2.5): DataFrame = {
    val rows = for {
      c <- 0 until 8
      m <- 0 until count
    } yield {
      val raw = Array.tabulate(dim) { d =>
        (((c * 37 + d * 13) % 19) - 9).toDouble +
          amp * (((m * 5 + d * 3 + c) % 11) - 5)
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

  test("fresh build reports ok; snapshot equals a fresh scan of the stored qerr") {
    val corpus = baseCorpus.persist()
    val path = java.nio.file.Files.createTempDirectory("ivfpq-health0").toString
    val idx = IvfPq.build(corpus, s"$path/gen0", cells = 10, m = 8, k = 64, iters = 3)
    val h = IvfPq.health(idx)
    info(f"skew=${h.sizeSkew}%.2f qerrDrift=${h.qerrDrift}%.4f " +
      f"appendDrift=${h.appendDrift}%.4f -> ${h.recommendation}")
    assert(h.recommendation == "ok")
    assert(math.abs(h.qerrDrift) < 1e-9, "stats vs snapshot of the same data must agree")
    assert(h.appendDrift < 1e-9)
    assert(h.cells.map(_.size).sum == corpus.count())
    assert(h.cells.forall(c => c.size == c.buildSize))
    corpus.unpersist()
  }

  test("out-of-distribution appends inflate stored qerr and flag retrain — no corpus read") {
    val corpus = baseCorpus.persist()
    val dim = corpus.select(size(col("v"))).head().getInt(0)
    val path = java.nio.file.Files.createTempDirectory("ivfpq-health1").toString
    val idx = IvfPq.build(corpus, s"$path/gen0", cells = 10, m = 8, k = 64, iters = 3)

    // an EARLY drift slice (56 vectors on a 500-vector corpus)
    val earlyDrift = driftVectors(dim, count = 7).persist()
    IvfPq.append(idx, earlyDrift)

    val h = IvfPq.health(idx)
    info(f"skew=${h.sizeSkew}%.2f qerrDrift=${h.qerrDrift}%.4f " +
      f"appendDrift=${h.appendDrift}%.4f -> ${h.recommendation}")
    assert(h.recommendation == "retrain",
      s"codebook-misfit appends must flag retrain, got ${h.recommendation}")
    assert(h.appendDrift > 0.5,
      s"appended mass's qerr inflation must carry the signal, got ${h.appendDrift}")
    corpus.unpersist(); earlyDrift.unpersist()
  }

  test("append-only drift decays probe recall; retrain restores it") {
    val corpus = baseCorpus.persist()
    val dim = corpus.select(size(col("v"))).head().getInt(0)
    val drift = driftVectors(dim, count = 25).persist()
    val full = corpus.unionByName(drift)

    val path = java.nio.file.Files.createTempDirectory("ivfpq-drift").toString
    val idx = IvfPq.build(corpus, s"$path/gen0", cells = 10, m = 8, k = 64, iters = 3)
    IvfPq.append(idx, drift)

    // queries from the drifted region; ground truth over the FULL corpus
    val queries = drift.filter(col("vec_id") % 25 < 4)
    val exact = pairs(AnnOps.bruteForceTopK(full, queries, 5))

    val frozen = pairs(idx.search(full, queries, 5, nprobe = 2))
    val frozenRecall = (exact & frozen).size.toDouble / exact.size

    val idx2 = IvfPq.retrain(idx, full, s"$path/gen1", iters = 2)
    // old generation still readable; new one keeps the index shape
    assert(idx.cellCentroids.count() == 10)
    assert(idx2.cellCentroids.count() == 10)
    val retrained = pairs(idx2.search(full, queries, 5, nprobe = 2))
    val retrainedRecall = (exact & retrained).size.toDouble / exact.size

    info(f"frozen recall=$frozenRecall%.2f retrained recall=$retrainedRecall%.2f")
    assert(idx2.spark.read.parquet(s"$path/gen1/cells").count() == full.count())
    assert(retrainedRecall > frozenRecall + 0.05,
      s"retrain should restore what drift cost: frozen=$frozenRecall " +
        s"retrained=$retrainedRecall")
    corpus.unpersist(); drift.unpersist()
  }

  test("maintain: pile-up applies corpus-free splitMerge (survivors hard-linked); drift applies retrain") {
    val corpus = baseCorpus.persist()
    val dim = corpus.select(size(col("v"))).head().getInt(0)
    val path = java.nio.file.Files.createTempDirectory("ivfpq-maint").toString
    val idx = IvfPq.build(corpus, s"$path/gen0", cells = 10, m = 8, k = 64, iters = 3)
    val healthy = IvfPq.measureRecall(idx, corpus, shortlist = 100)

    // healthy index: maintain is a no-op and writes nothing
    val ok = IvfPq.maintain(idx, corpus, s"$path/never")
    assert(ok.action == "ok" && (ok.index eq idx) && ok.recall.isEmpty)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/never")))

    // in-distribution pile-up: the biggest cell's SOURCE vectors under
    // fresh ids with a deterministic jitter (stays in-distribution, so
    // qerr doesn't inflate — the splitMerge trigger, not retrain)
    val biggest = idx.stats.orderBy(col("n").desc).head().getInt(0)
    val pile = AnnOps.assignCells(corpus, idx.cellCentroids)
      .filter(col("cell") === biggest).select("vec_id", "v")
      .withColumn("vec_id", col("vec_id") + 3000000L)
      .withColumn("v", expr(
        "transform(v, (x, i) -> x + 0.002 * double((vec_id * 7 + i * 13) % 11 - 5))"))
      .persist()
    IvfPq.append(idx, pile)
    val fullPile = corpus.unionByName(pile)

    val before = idx.cellCentroids.collect().map(_.getInt(0)).toSet
    val res = IvfPq.maintain(idx, fullPile, s"$path/gen1",
      IvfPq.MaintainPolicy(splitFactor = 1.5, recallFloor = healthy - 0.15,
        auditShortlist = 100))
    info(f"pile-up action=${res.action} healthy=$healthy%.2f recall=${res.recall.get}%.2f")
    assert(res.action == "splitMerge" || res.action == "splitMerge->retrain", res.action)
    assert(res.recall.get >= healthy - 0.15,
      s"maintenance must clear the floor: ${res.recall.get}")
    if (res.action == "splitMerge") {
      // nothing lost, fresh sub-cells exist, survivors are hard links
      val after = res.index.cellCentroids.collect().map(_.getInt(0)).toSet
      assert(after.exists(_ > before.max), s"no split cells in $after")
      assert(res.index.spark.read.parquet(s"$path/gen1/cells").count() ==
        fullPile.count())
      import java.nio.file.{Files, Paths}
      val survivor = (before & after).head
      val srcDir = Paths.get(s"$path/gen0/cells/cell=$survivor")
      val linked = Files.list(srcDir).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.getFileName.toString.endsWith(".parquet"))
      assert(linked.nonEmpty)
      linked.foreach { f =>
        val twin = Paths.get(s"$path/gen1/cells/cell=$survivor").resolve(f.getFileName)
        assert(Files.exists(twin), s"survivor file not carried over: $twin")
        val k0 = Files.readAttributes(f,
          classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey
        val k1 = Files.readAttributes(twin,
          classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey
        assert(k0 == k1, s"survivor file was rewritten, not linked: $twin")
      }
    }

    // full drift on a fresh index: one maintain call applies retrain and
    // restores recall over the drifted corpus
    val idxD = IvfPq.build(corpus, s"$path/dgen0", cells = 10, m = 8, k = 64, iters = 3)
    val drift = driftVectors(dim, count = 25).persist()
    IvfPq.append(idxD, drift)
    val fullD = corpus.unionByName(drift)
    val beforeR = IvfPq.measureRecall(idxD, fullD, shortlist = 100)
    val resD = IvfPq.maintain(idxD, fullD, s"$path/dgen1",
      IvfPq.MaintainPolicy(recallFloor = healthy - 0.15, auditShortlist = 100))
    info(f"drift action=${resD.action} before=$beforeR%.2f after=${resD.recall.get}%.2f")
    assert(resD.action == "retrain", s"drift must drive a retrain, got ${resD.action}")
    assert(resD.index.path == s"$path/dgen1")
    assert(resD.recall.get > beforeR,
      s"maintenance must improve the drifted index: $beforeR -> ${resD.recall.get}")
    corpus.unpersist(); pile.unpersist(); drift.unpersist()
  }
}
