package graft

import org.apache.spark.sql.functions._

/** Scale-run differential check for `q_ann_batch` (dev tool, like Verify):
  * at sf levels where the DuckDB all-pairs oracle is intractable, the
  * distributed-query exact search is verified against the independent
  * broadcast-query formulation on the SAME corpus — two different physical
  * plans (shuffled-hash block join + heap agg vs broadcast join + heap
  * agg) that must produce identical top-k rows.
  *
  * Optional `nchunks chunk` args restrict the check to the query slice
  * `vec_id % nchunks == chunk`. Each query's top-k is independent of
  * every other query, so chunking the QUERY batch partitions the exact
  * full check; at sf100 the whole 10k batch's shuffle spill (two plans ×
  * 20M-row corpus) exceeds the box's free disk, while 10 × 1k-query
  * chunks in fresh JVMs reclaim spill at process exit
  * (tools/check_annbatch_sf100.sh drives the loop).
  *
  * Prints one line: `ANN_BATCH_DIFF rows=<n> equal=<bool>`.
  */
object AnnBatchCheck {
  def main(args: Array[String]): Unit = {
    val (sfDir, slice) = args match {
      case Array(s) => (s, None)
      case Array(s, n, k) => (s, Some((n.toInt, k.toInt)))
      case _ =>
        System.err.println("usage: AnnBatchCheck <sfDir> [nchunks chunk]")
        sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val allQueries = graft.ml.AnnOps.batchQueries(corpus)
    val queries = slice.fold(allQueries) { case (n, k) =>
      allQueries.filter(pmod(col("vec_id"), lit(n.toLong)) === k.toLong)
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def canon(df: org.apache.spark.sql.DataFrame): Array[String] =
      df.orderBy("q_id", "rk").collect().map(_.toString)
    val dist = canon(graft.ml.AnnOps.bruteForceTopKDistributed(corpus, queries, 3))
    val bcast = canon(graft.ml.AnnOps.bruteForceTopK(corpus, queries, 3))
    val equal = java.util.Arrays.equals(
      dist.asInstanceOf[Array[AnyRef]], bcast.asInstanceOf[Array[AnyRef]])
    if (!equal) {
      dist.zip(bcast).zipWithIndex.collectFirst {
        case ((d, b), i) if d != b => System.err.println(s"first diff at $i:\n  $d\n  $b")
      }
    }
    println(s"ANN_BATCH_DIFF rows=${dist.length} equal=$equal")
    spark.stop()
    if (!equal) sys.exit(1)
  }
}
