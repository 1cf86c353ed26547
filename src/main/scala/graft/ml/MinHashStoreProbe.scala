package graft.ml

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Dev tool: scale evidence for the incremental near-dup store — the
  * claim is that probing a bounded new batch against persisted history
  * signatures costs batch-compute + one store scan, vs re-signaturing
  * the whole union the way a fresh [[DedupOps.minhashPairs]] run would.
  *
  * Splits an sf dir's documents 2:1 (history : batch), builds the store
  * over history, then times (a) store probe of the batch and (b) the
  * union re-run baseline, and cross-checks the probe's pairs against the
  * union run's cross-split subset (both verify exact jaccard, so the
  * pair sets must agree wherever both looked — the store probe looks at
  * strictly cross-split pairs).
  *
  * usage: run_main.sh graft.ml.MinHashStoreProbe [sfDir]
  */
object MinHashStoreProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    // MH_SPLIT=K: batch = every Kth doc (steady-state history >> batch);
    // default 3 matches the q_dedup_minhash_incr gate split
    val split = sys.env.get("MH_SPLIT").map(_.toLong).getOrElse(3L)
    val hist = docs.filter(col("doc_id") % split =!= 0)
    val batch = docs.filter(col("doc_id") % split === 0)
    val n = docs.count()

    val path = java.nio.file.Files.createTempDirectory("mhstore-probe").toString
    val t0 = System.nanoTime()
    val store = MinHashStore.build(hist, path)
    val tBuild = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    // one cap for BOTH the probe and the union baseline below — capping
    // only the probe would break match_union's ground-truth meaning
    val cap = sys.env.get("MH_CAP").map(_.toInt).getOrElse(1000)
    val probed = store.probe(batch, hist, 0.5, maxBucket = cap)
      .select("new_id", "hist_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val tProbe = (System.nanoTime() - t1) / 1e9

    val tE0 = System.nanoTime()
    val nEst = store.probeEstimate(batch, 0.5).count()
    val tEst = (System.nanoTime() - tE0) / 1e9

    // baseline: what a non-incremental pipeline does per batch — full
    // union re-run; its cross-split pairs are the probe's ground truth
    spark.sharedState.cacheManager.clearCache()
    val t2 = System.nanoTime()
    val unionPairs = DedupOps.minhashPairs(docs, 0.5, maxBucket = cap)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val tUnion = (System.nanoTime() - t2) / 1e9
    val crossFromUnion = unionPairs.flatMap { case (a, b) =>
      // union pairs are (a < b); normalize to (new, hist) orientation
      Seq((a, b), (b, a))
    }.filter { case (x, y) => x % split == 0 && y % split != 0 }

    println(f"MHSTORE_SCALE dir=$sfDir n=$n split=$split " +
      f"build=${tBuild}%.1fs probe=${tProbe}%.1fs est=${tEst}%.1fs (est_pairs=$nEst) union_rerun=${tUnion}%.1fs " +
      s"pairs=${probed.size} match_union=${probed == crossFromUnion}")
    spark.stop()
  }
}
