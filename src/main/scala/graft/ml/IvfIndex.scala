package graft.ml

import graft.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Disk-backed IVF index: the 100 TB path for ANN search.
  *
  * `build` trains the coarse quantizer (k-means, [[AnnOps.kmeansCells]]),
  * assigns every corpus vector to its nearest cell, and writes the corpus
  * parquet **partitioned by cell** alongside the centroid table. `search`
  * resolves each query's `nprobe` nearest cells against the (tiny,
  * broadcast) centroid table, then scans ONLY those cell partitions — the
  * cell filter is a literal `IN` over a driver-side cell list (metadata
  * scale: bounded by the cell count, not the corpus), so Spark's partition
  * pruning drops every non-probed directory before any file I/O.
  *
  * At 1000 executors over 100 TB: cells ≈ √N directories, a probe touches
  * nprobe of them, and the scan parallelism within a probed cell is still
  * per-file. No shuffle of the corpus at any point — candidates join the
  * broadcast query set.
  */
final case class IvfIndex(spark: SparkSession, path: String) {

  def centroids: DataFrame = spark.read.parquet(s"$path/centroids")

  /** The probed-cell scan for a query set; exposed for plan inspection. */
  def probedScan(queries: DataFrame, nprobe: Int): (DataFrame, DataFrame) = {
    val cents = centroids
    val probe = Window.partitionBy("q_id").orderBy(col("csim").desc, col("cell").asc)
    val probed = queries.select(col("vec_id").as("q_id"), col("v").as("qv"))
      .join(broadcast(cents))
      .select(col("q_id"), col("qv"), col("cell"),
        cosine(col("qv"), col("cent")).as("csim"))
      .withColumn("pr", row_number().over(probe))
      .filter(col("pr") <= nprobe)
      .select(col("q_id"), col("qv"), col("cell"))
    // literal cell list -> partition pruning in the parquet scan
    val cellIds = probed.select("cell").distinct().collect().map(_.getInt(0)).sorted
    val scan = spark.read.parquet(s"$path/cells")
      .filter(col("cell").isin(cellIds.toSeq.map(_.asInstanceOf[Any]): _*))
    (probed, scan)
  }

  def search(queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val (probed, scan) = probedScan(queries, nprobe)
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id").asc)
    scan.select(col("vec_id").as("n_id"), col("cell"), col("v").as("nv"))
      .join(broadcast(probed), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        stableRound(cosine(col("qv"), col("nv")), 4).as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rk").cast("long").as("rk"))
  }
}

object IvfIndex {

  /** Train, assign, and persist. `corpus` needs (vec_id, v) columns. */
  def build(corpus: DataFrame, path: String, cells: Int = 10,
      trainIters: Int = 3): IvfIndex = {
    val spark = corpus.sparkSession
    val cents = AnnOps.kmeansCells(corpus, cells, trainIters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      AnnOps.assignCells(corpus, cents)
        .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
      cents.write.mode("overwrite").parquet(s"$path/centroids")
    } finally cents.unpersist()
    IvfIndex(spark, path)
  }

  /** Incrementally index new vectors against the EXISTING quantizer:
    * assign to the trained cells and append into their partitions — no
    * retrain, no rewrite of prior data (dynamic partition append only
    * touches the cells the new batch lands in). The quantizer drifts as
    * the corpus distribution does; rebuild when probe recall degrades —
    * the standard IVF maintenance contract.
    */
  def append(index: IvfIndex, newVectors: DataFrame): IvfIndex = {
    val cents = index.centroids
    AnnOps.assignCells(newVectors, cents)
      .write.mode("append").partitionBy("cell").parquet(s"${index.path}/cells")
    index
  }

  /** Re-train for a drifted corpus: re-run the coarse quantizer over the
    * CURRENT stored corpus (original build plus every append) and build a
    * fresh index GENERATION at `newPath` — immutable-generation
    * maintenance, the standard production pattern: readers keep using the
    * old generation until the caller flips its pointer, so there is no
    * in-place atomicity window to get wrong. A re-partition is inherent to
    * re-training (cell membership changes), so the full rewrite is the
    * honest cost; at 100 TB it is one partitioned write at scan
    * parallelism — the corpus never shuffles, cell assignment joins the
    * broadcast centroid table exactly as in [[build]].
    *
    * When to call: [[append]] keeps centroids frozen, so as the corpus
    * distribution drifts, new vectors concentrate in (and straddle) cells
    * trained on the old distribution and probe recall decays —
    * IvfRetrainSpec demonstrates the decay and the restore.
    */
  def retrain(index: IvfIndex, newPath: String, cells: Int = 10,
      trainIters: Int = 3): IvfIndex = {
    val stored = index.spark.read.parquet(s"${index.path}/cells")
      .select("vec_id", "v")
    build(stored, newPath, cells, trainIters)
  }
}
