package graft.ml

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Dev tool: steady-state evidence for the streaming near-dup sink
  * ([[graft.streaming.StreamDedup.minhashStoreForeachBatch]]) — the
  * claim is that per-micro-batch cost (probe + append) stays roughly
  * FLAT as the store grows, because a probe touches batch-scale compute
  * plus one narrow store scan, while the non-incremental alternative
  * (re-running minhashPairs on the union) grows with the corpus.
  *
  * Splits an sf dir's documents into an initial history plus `batches`
  * equal micro-batches, drives the EXACT sink body per batch (the same
  * function a writeStream.foreachBatch would call), and prints each
  * batch's wall time, pair count, and the store's growing size. The
  * union-re-run baseline is timed at the first and last batch only
  * (it's the expensive path — that's the point).
  *
  * usage: run_main.sh graft.ml.StreamStoreProbe [sfDir] [batches]
  */
object StreamStoreProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val batches = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = docs.count()

    // history = half; the rest arrives as `batches` micro-batches
    val hist = docs.filter(col("doc_id") % 2 === 0)
    def batch(b: Int) = docs.filter(
      col("doc_id") % 2 === 1 &&
        pmod(expr("doc_id div 2"), lit(batches.toLong)) === b)

    val path = java.nio.file.Files.createTempDirectory("stream-store-probe").toString
    val t0 = System.nanoTime()
    val store = MinHashStore.build(hist, path)
    println(f"STREAMSTORE build dir=$sfDir n=$n batches=$batches " +
      f"hist=${hist.count()} wall=${(System.nanoTime() - t0) / 1e9}%.1fs")

    var seen = hist.count()
    val sink = graft.streaming.StreamDedup.minhashStoreForeachBatch(store, 0.5) {
      (bid, pairs) => println(f"STREAMSTORE batch=$bid pairs=${pairs.count()}")
    }
    for (b <- 0 until batches) {
      spark.sharedState.cacheManager.clearCache()
      val bd = batch(b)
      val t = System.nanoTime()
      sink(bd, b.toLong)
      seen += bd.count()
      println(f"STREAMSTORE tick=$b wall=${(System.nanoTime() - t) / 1e9}%.2fs store_docs=$seen")
    }

    // the non-incremental alternative at first/last store size
    def unionTime(upToBatch: Int): Double = {
      spark.sharedState.cacheManager.clearCache()
      val corpus = docs.filter(col("doc_id") % 2 === 0 ||
        pmod(expr("doc_id div 2"), lit(batches.toLong)) <= upToBatch)
      val t = System.nanoTime()
      DedupOps.minhashPairs(corpus, 0.5).count()
      (System.nanoTime() - t) / 1e9
    }
    println(f"STREAMSTORE union_first=${unionTime(0)}%.1fs union_last=${unionTime(batches - 1)}%.1fs")
    spark.stop()
  }
}
