package graft.ml

import graft.functions.{cosine, topkPairs}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF+PQ: the standard big-ANN index layout (FAISS-style) from the two
  * pieces already built here — coarse cells ([[AnnOps.kmeansCells]]) for
  * partition pruning, PQ codes ([[Pq]]) for in-cell compression.
  *
  * On disk the index stores ONLY (vec_id, codes) parquet partitioned by
  * cell, plus the two (metadata-scale) codebooks. A query at 100 TB then
  * touches: nprobe cell directories (partition pruning — no file I/O on
  * the rest), code lookups per candidate (no vector math), and exact
  * re-rank against the source table for just the shortlist. The full
  * vectors never live in the index at all.
  */
final case class IvfPqIndex(spark: SparkSession, path: String) {

  def cellCentroids: DataFrame = spark.read.parquet(s"$path/cell_centroids")
  def codebook: DataFrame = spark.read.parquet(s"$path/codebook")

  /** Two-stage search: ADC shortlist over the probed cells' codes, exact
    * cosine re-rank of the shortlist against `corpus` (the source table —
    * re-rank I/O is shortlist-sized, keyed by vec_id).
    *
    * Every per-query rank rides the bounded k-heap
    * ([[graft.functions.topkPairs]]): the probe keeps nprobe cells, the
    * shortlist keeps `shortlist` ids per query (keyed on −d2 so "best" =
    * lowest distance, ties on n_id asc like the old window), and the final
    * re-rank is the shared [[AnnOps.scoredTopK]] tail — no per-query sort
    * window anywhere, so no stage collapses a query's candidates into one
    * task at scale.
    */
  /** [[search]] with a CORPUS-FRACTION shortlist — the scale-correct
    * default (the q_ann_pq lesson: ADC ranking error at a fixed
    * compression budget pushes true neighbors past any FIXED cutoff as
    * the corpus grows, so recall at a constant `shortlist` decays with
    * scale; IvfScaleProbe shows the decay at 10× — 0.94 → 0.67 at a
    * constant 200). The bound is `frac` of the PROBED population, sized
    * from the probed cells' parquet FOOTERS — driver-side metadata, zero
    * Spark jobs — then delegated to [[search]].
    */
  def searchFrac(corpus: DataFrame, queries: DataFrame, topK: Int,
      nprobe: Int = 3, frac: Double = 0.01): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac out of range: $frac")
    // the probe set is query-dependent; the footer bound uses ALL cells'
    // counts scaled by nprobe/cells — a uniform-occupancy estimate that
    // is exact in aggregate and errs toward a LARGER shortlist when the
    // probed cells are the fuller ones (the safe direction for recall).
    // Cell dirs and footers are walked DRIVER-side (the cells/ layout is
    // partitioned by cell, so row counts come from each cell=N dir's
    // parquet footers; the cell count is the dir listing) — zero Spark
    // jobs before the plan is built. Any metadata surprise falls back to
    // the default absolute shortlist rather than failing the search.
    val probedRows: Option[Double] =
      try {
        val cellsDir = new org.apache.hadoop.fs.Path(s"$path/cells")
        val fsys = cellsDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val subdirs = fsys.listStatus(cellsDir).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
        val counts = subdirs.map(s =>
          graft.sources.Tables.footerRowCount(spark, s.getPath.toString))
        if (counts.isEmpty || counts.exists(_.isEmpty)) None
        else Some(counts.flatten.sum *
          math.min(nprobe, subdirs.size).toDouble / subdirs.size)
      } catch { case scala.util.control.NonFatal(_) => None }
    probedRows match {
      case Some(rows) =>
        search(corpus, queries, topK, nprobe,
          math.max(topK, math.ceil(rows * frac).toInt))
      case None => search(corpus, queries, topK, nprobe)
    }
  }

  def search(corpus: DataFrame, queries: DataFrame, topK: Int,
      nprobe: Int = 3, shortlist: Int = 50): DataFrame = {
    // probe: nprobe nearest cells per query against the broadcast centroids
    val probed = queries.select(col("vec_id").as("q_id"), col("v"))
      .join(broadcast(cellCentroids))
      .select(col("q_id"), col("v"), col("cell"),
        cosine(col("v"), col("cent")).as("csim"))
      .groupBy("q_id")
      .agg(first("v").as("v"),
        topkPairs(col("csim"), col("cell").cast("long"), nprobe).as("pc"))
      .select(col("q_id"), col("v"),
        transform(col("pc.n_id"), c => c.cast("int")).as("cells"))
    // literal cell list → partition pruning on the codes scan
    val cellIds = probed.select(explode(col("cells")).as("c")).distinct()
      .collect().map(_.getInt(0)).sorted
    val scan = spark.read.parquet(s"$path/cells")
      .filter(col("cell").isin(cellIds.toSeq.map(_.asInstanceOf[Any]): _*))

    // ADC over probed cells only: a code row scores against a query iff
    // its cell is in that query's probe set
    val qDf = Pq.queryTables(codebook, probed.select(col("q_id").as("vec_id"), col("v")))
      .join(probed.select(col("q_id"), col("cells")), Seq("q_id"))
    val cand = scan.select(col("vec_id").as("n_id"), col("codes"), col("cell"))
      .join(broadcast(qDf), array_contains(col("cells"), col("cell")) &&
        col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), Pq.adcDist.as("d2"))
      .groupBy("q_id")
      .agg(topkPairs(negate(col("d2")), col("n_id"), shortlist).as("top"))
      .select(col("q_id"), explode(col("top.n_id")).as("n_id"))

    // exact re-rank of the shortlist against the source vectors
    AnnOps.scoredTopK(
      cand
        .join(broadcast(queries.select(col("vec_id").as("q_id"), col("v").as("qv"))), Seq("q_id"))
        .join(corpus.select(col("vec_id").as("n_id"), col("v").as("nv")), Seq("n_id")),
      topK)
  }
}

object IvfPq {

  /** Train both quantizers, encode, and persist the index. */
  def build(corpus: DataFrame, path: String, cells: Int = 10, m: Int = 8,
      k: Int = 16, iters: Int = 3): IvfPqIndex = {
    val spark = corpus.sparkSession
    val cellCents = AnnOps.kmeansCells(corpus, cells, iters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val book = Pq.train(corpus, m, k, iters)
    try {
      val assigned = AnnOps.assignCells(corpus, cellCents) // vec_id, v, cell
      val codes = Pq.encode(corpus, book)                  // vec_id, codes
      assigned.select(col("vec_id"), col("cell"))
        .join(codes, Seq("vec_id"))
        .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
      cellCents.write.mode("overwrite").parquet(s"$path/cell_centroids")
      book.write.mode("overwrite").parquet(s"$path/codebook")
    } finally {
      cellCents.unpersist()
      book.unpersist()
    }
    IvfPqIndex(spark, path)
  }
}
