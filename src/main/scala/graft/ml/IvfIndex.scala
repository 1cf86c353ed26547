package graft.ml

import graft.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  def centroids: DataFrame = IvfIndex.readOwn(spark, s"$path/centroids")

  /** Build-time per-cell snapshot (cell, n, mean_sim) written by [[IvfIndex.build]];
    * the frozen reference [[IvfIndex.health]] measures drift against.
    */
  def stats: DataFrame = IvfIndex.readOwn(spark, s"$path/stats")

  /** The next live generation, when a streaming sink's maintenance has
    * flipped past this index — see [[IvfIndex.resolveLive]].
    */
  def successor: Option[IvfIndex] =
    StoreIo.readSuccessor(StoreIo.fsOf(spark, path), path)
      .map(IvfIndex(spark, _))

  /** Record `newPath` as this index's live successor (atomic replace).
    * A streaming sink writes this at the ORIGIN path on every
    * maintenance flip, so restarts resolve to the live generation.
    */
  def writeSuccessor(newPath: String): Unit =
    StoreIo.writeSuccessor(StoreIo.fsOf(spark, path), path, newPath)

  /** Delete this index's directory — for retiring a superseded
    * generation after a flip. Hard-linked files survive in the
    * generation that linked them; only this generation's names go.
    */
  def delete(): Unit = {
    StoreIo.fsOf(spark, path)
      .delete(new org.apache.hadoop.fs.Path(path), true)
    ()
  }

  /** The probed-cell scan for a query set; exposed for plan inspection.
    *
    * The per-query nprobe-nearest-cell pick rides the bounded k-heap
    * ([[graft.functions.topkPairs]], same (csim desc, cell asc) ranking the
    * old rank window used) — the exchange carries |Q| × nprobe entries, not
    * the |Q| × cells pair stream a per-query sort window would shuffle into
    * one task per query.
    *
    * CONSTRUCTION IS JOB-FREE: the old implementation ran a
    * `distinct().collect()` Spark job here to turn the probed cells into a
    * literal `IN` for static partition pruning. Now the probe side carries
    * a literal `IN` over the STORED cell universe instead — a driver-side
    * dir listing of `cells/` (metadata scale, zero jobs), semantically a
    * no-op since probed cells are centroid cells — which is exactly the
    * selective-predicate signal Spark's dynamic-partition-pruning rule
    * needs on the build side of the cell join: the partitioned `cells/`
    * scan gets a runtime DynamicPruning filter equal to the probed cell
    * set, reusing the probe broadcast. Same file pruning the collect()
    * bought, no job before the plan exists (PlanAuditSpec pins both).
    */
  def probedScan(queries: DataFrame, nprobe: Int): (DataFrame, DataFrame) = {
    val cents = centroids
    val universe = IvfIndex.listedCells(spark, path)
    val probed = queries.select(col("vec_id").as("q_id"), col("v").as("qv"))
      .join(broadcast(cents))
      .select(col("q_id"), col("qv"), col("cell"),
        cosine(col("qv"), col("cent")).as("csim"))
      .groupBy("q_id")
      .agg(first("qv").as("qv"),
        topkPairs(col("csim"), col("cell").cast("long"), nprobe).as("pc"))
      .select(col("q_id"), col("qv"), explode(col("pc.n_id")).as("_cl"))
      .select(col("q_id"), col("qv"), col("_cl").cast("int").as("cell"))
      .filter(col("cell").isin(universe: _*))
    val scan = IvfIndex.readOwn(spark, s"$path/cells", Some("cell"))
    (probed, scan)
  }

  /** Probed-cell scan → shared bounded-heap top-k tail ([[AnnOps.scoredTopK]],
    * no rank window): per-partition k-entry heaps partial-merge, so the agg
    * exchange carries partitions × |Q| × k entries regardless of cell size.
    *
    * BOUNDED-QUERY CONTRACT: `broadcast(probed)` ships |Q| × nprobe rows
    * (each carrying its query vector) through the driver — right for
    * interactive / dashboard-sized query sets, and the broadcast is what
    * lets dynamic partition pruning drop every non-probed cell directory
    * before file I/O. Bulk query batches go through [[searchDistributed]].
    */
  def search(queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val (probed, scan) = probedScan(queries, nprobe)
    AnnOps.scoredTopK(
      scan.select(col("vec_id").as("n_id"), col("cell"), col("v").as("nv"))
        .join(broadcast(probed), Seq("cell"))
        .filter(col("q_id") =!= col("n_id")),
      k)
  }

  /** [[search]] for BULK query batches: the query set stays a DataFrame
    * end to end — never collected to or broadcast from the driver, so
    * driver memory is flat in |Q| (the million-query contract,
    * [[AnnOps.bruteForceTopKDistributed]]'s sibling for the disk index).
    *
    * Shape: probe as in [[probedScan]] (centroids are index METADATA and
    * always broadcast — the "no broadcast" contract is about the
    * query-derived side), then a shuffled-hash join on `cell` co-locates
    * each cell's stored vectors with every query probing that cell; the
    * pair stream folds into bounded per-partition k-heaps, so the agg
    * exchange carries partitions × |Q| × k entries. Parallelism is the
    * probed-cell count — at 100 TB that is ~√N directories, far above any
    * cluster's core count, and k-means keeps cell occupancy balanced.
    *
    * No dynamic partition pruning here by design: DPP only reuses
    * broadcasts, and a bulk batch probes essentially the whole cell
    * universe anyway — the scan reading all cells is the workload, not a
    * missed prune. For query sets small enough that pruning matters, use
    * [[search]].
    */
  def searchDistributed(queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val (probed, scan) = probedScan(queries, nprobe)
    AnnOps.scoredTopK(
      scan.select(col("vec_id").as("n_id"), col("cell"), col("v").as("nv"))
        .join(probed.hint("shuffle_hash"), Seq("cell"))
        .filter(col("q_id") =!= col("n_id")),
      k)
  }
}

object IvfIndex {

  /** Read one of the index's OWN persisted parquet layouts with its
    * footer schema supplied explicitly ([[graft.sources.Tables
    * .footerSparkSchema]] — driver-side metadata): `spark.read.parquet`
    * alone runs a schema-inference Spark job per read, which is what
    * kept search-plan construction from being job-free. `partCol`
    * appends the dir-partition column (not present in footers) typed as
    * `partType` — every current layout partitions on an int (`cell=N`,
    * `band=N`), but the type is a caller parameter so a future long or
    * string partition column fails loudly at the call site instead of
    * silently mis-typing dir values. Falls back to the inferring read if
    * the footer key is missing.
    */
  private[ml] def readOwn(spark: SparkSession, p: String,
      partCol: Option[String] = None,
      partType: org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.IntegerType): DataFrame =
    graft.sources.Tables.footerSparkSchema(spark, p) match {
      case Some(s0) =>
        val s = partCol.filterNot(s0.fieldNames.contains)
          .map(c => s0.add(c, partType))
          .getOrElse(s0)
        spark.read.schema(s).parquet(p)
      case None => spark.read.parquet(p)
    }

  /** Driver-side listing of a disk index's stored cell universe: one FS
    * listing of `cells/` (metadata scale — bounded by the cell count, not
    * the corpus), ZERO Spark jobs. The partition layout (`cell=N` dirs) is
    * this library's own write contract ([[build]] partitionBy("cell")).
    * Sorted so literal `IN` lists built from it are deterministic.
    */
  private[ml] def listedCells(spark: SparkSession, path: String): Seq[Int] = {
    val cellsDir = new org.apache.hadoop.fs.Path(s"$path/cells")
    val fsys = cellsDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsys.listStatus(cellsDir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .map(_.getPath.getName.stripPrefix("cell=").toInt)
      .sorted
  }

  /** Hard-link every parquet file of the given cells from one generation's
    * cells dir into another — O(1) metadata per file, no data read or
    * rewritten (an object-store binding would use a server-side copy or a
    * manifest reference; the local link carries the same
    * immutable-generation contract). Shared by both disk indexes'
    * splitMerge paths. The copy fallback covers BOTH failure shapes a
    * link can take: UnsupportedOperationException (FS has no links) and
    * IOException — a cross-device link is EXDEV, surfaced as
    * FileSystemException, not UnsupportedOperation (r16 advice).
    */
  private[ml] def linkCellFiles(srcCellsPath: String, dstCellsPath: String,
      cells: Seq[Int], prefix: String = "cell="): Unit = {
    import java.nio.file.{Files, Paths}
    for (c <- cells.sorted) {
      val src = Paths.get(srcCellsPath, s"$prefix$c")
      val dst = Paths.get(dstCellsPath, s"$prefix$c")
      Files.createDirectories(dst)
      Files.list(src).forEach { f =>
        val name = f.getFileName.toString
        if (name.endsWith(".parquet"))
          try Files.createLink(dst.resolve(name), f)
          catch {
            case _: UnsupportedOperationException | _: java.io.IOException =>
              Files.copy(f, dst.resolve(name)); ()
          }
      }
    }
  }

  /** Hard-link (or copy, cross-device — see [[linkCellFiles]] on the
    * catch shape) every file of a metadata-scale dir into a new
    * generation — centroids/codebooks/stats sidecars during compaction.
    */
  private[ml] def linkDir(src: String, dst: String): Unit = {
    import java.nio.file.{Files, Paths}
    val s = Paths.get(src)
    if (!Files.isDirectory(s)) return
    Files.createDirectories(Paths.get(dst))
    Files.list(s).forEach { f =>
      if (Files.isRegularFile(f)) {
        val t = Paths.get(dst).resolve(f.getFileName)
        try Files.createLink(t, f)
        catch {
          case _: UnsupportedOperationException | _: java.io.IOException =>
            Files.copy(f, t); ()
        }
      }
    }
  }

  /** One file's link-or-copy into a new generation, creating parent
    * dirs — the per-file flavor of [[linkCellFiles]] for callers whose
    * file universe comes from a commit log rather than a directory
    * listing ([[MinHashStore.Store.compactTo]]).
    */
  private[ml] def linkOrCopyFile(src: String, dst: String): Unit = {
    import java.nio.file.{Files, Paths}
    val d = Paths.get(dst)
    Files.createDirectories(d.getParent)
    try { Files.createLink(d, Paths.get(src)); () }
    catch {
      case _: UnsupportedOperationException | _: java.io.IOException =>
        Files.copy(Paths.get(src), d); ()
    }
  }

  /** Driver-side per-cell parquet FILE counts — one FS listing per cell
    * dir, metadata scale. The fragmentation signal [[compactCells]] acts
    * on.
    */
  private[ml] def cellFileCounts(spark: SparkSession, cellsPath: String,
      prefix: String = "cell="): Map[Int, Int] = {
    val dir = new org.apache.hadoop.fs.Path(cellsPath)
    val fsys = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsys.listStatus(dir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .map { s =>
        val n = fsys.listStatus(s.getPath)
          .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        s.getPath.getName.stripPrefix(prefix).toInt -> n
      }.toMap
  }

  /** Shared small-file compaction over a `cells/` layout (r16): every
    * [[append]] adds task-count files to each touched cell dir, so a
    * steady-state pipeline appending thousands of batches fragments the
    * index — scan task count and footer/listing overhead grow with the
    * APPEND count instead of the data size, the classic LSM small-file
    * problem. Cells at or under `maxFilesPerCell` hard-link into the new
    * generation untouched; fragmented cells rewrite partition-pruned at
    * ~`targetFilesPerCell` files (a salted repartition, so one giant
    * cell still writes in parallel). Data is byte-identical in content —
    * only file boundaries change — so sidecar metadata (centroids,
    * stats, codebooks) links over unchanged. Returns None when nothing
    * is fragmented (no new generation written).
    */
  private[ml] def compactCells(spark: SparkSession, path: String,
      newPath: String, maxFilesPerCell: Int, targetFilesPerCell: Int,
      readCells: String => DataFrame): Option[Seq[Int]] = {
    require(targetFilesPerCell >= 1, s"targetFilesPerCell: $targetFilesPerCell")
    val cellsPath = s"$path/cells"
    val counts = cellFileCounts(spark, cellsPath)
    val fragmented = counts.filter(_._2 > maxFilesPerCell).keys.toSeq.sorted
    if (fragmented.isEmpty) return None
    val keep = (counts.keySet -- fragmented).toSeq.sorted
    linkCellFiles(cellsPath, s"$newPath/cells", keep)
    readCells(cellsPath)
      .filter(col("cell").isin(fragmented.map(_.asInstanceOf[Any]): _*))
      .repartition(fragmented.size * targetFilesPerCell, col("cell"),
        pmod(xxhash64(col("vec_id")), lit(targetFilesPerCell.toLong)))
      .write.mode("append").partitionBy("cell").parquet(s"$newPath/cells")
    Some(fragmented)
  }

  /** [[compactCells]] for this index: rewrites only fragmented cells,
    * links everything else (cells, centroids, stats). Same
    * immutable-generation contract as [[retrain]]/[[splitMerge]] — the
    * caller flips its pointer when it accepts. Run it on the same
    * maintenance tick as [[health]]; the file counts it reads are one
    * driver-side listing.
    */
  def compact(index: IvfIndex, newPath: String, maxFilesPerCell: Int = 8,
      targetFilesPerCell: Int = 1): IvfIndex =
    compactCells(index.spark, index.path, newPath, maxFilesPerCell,
      targetFilesPerCell, p => readOwn(index.spark, p, Some("cell"))) match {
      case None => index
      case Some(_) =>
        linkDir(s"${index.path}/centroids", s"$newPath/centroids")
        linkDir(s"${index.path}/stats", s"$newPath/stats")
        IvfIndex(index.spark, newPath)
    }

  /** Per-cell (cell, n, mean_sim) over stored cells: scan + broadcast
    * centroid join + per-cell aggregate — output is cell-count rows
    * (metadata scale), the scan never shuffles the corpus.
    */
  private def cellStats(spark: SparkSession, path: String,
      sampleFraction: Double = 1.0): DataFrame = {
    val cents = spark.read.parquet(s"$path/centroids")
    val stored0 = spark.read.parquet(s"$path/cells")
    val stored = if (sampleFraction < 1.0)
      stored0.sample(withReplacement = false, sampleFraction, seed = 42L)
    else stored0
    stored.join(broadcast(cents), Seq("cell"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n"),
        avg(cosine(col("v"), col("cent"))).as("mean_sim"))
  }

  /** Train, assign, and persist. `corpus` needs (vec_id, v) columns.
    * Alongside cells and centroids, a per-cell (n, mean_sim) snapshot is
    * written — the frozen reference [[health]] measures drift against.
    */
  def build(corpus: DataFrame, path: String, cells: Int = 10,
      trainIters: Int = 3): IvfIndex = {
    val spark = corpus.sparkSession
    val cents = AnnOps.kmeansCells(corpus, cells, trainIters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      AnnOps.assignCells(corpus, cents)
        .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
      cents.write.mode("overwrite").parquet(s"$path/centroids")
      cellStats(spark, path).write.mode("overwrite").parquet(s"$path/stats")
    } finally cents.unpersist()
    IvfIndex(spark, path)
  }

  /** One cell's line in a [[HealthReport]]: current vs build-time size and
    * mean assignment similarity (NaN build side for cells born after build).
    */
  final case class CellHealth(cell: Int, size: Long, buildSize: Long,
      meanSim: Double, buildMeanSim: Double)

  /** Drift diagnosis: bounded by the cell count, cheap enough to run on
    * every maintenance tick. `simDrift` is the corpus-weighted global mean
    * assignment-cosine drop since build; `appendDrift` isolates the
    * APPENDED vectors' own assignment quality (derived per cell from the
    * two snapshots, no recency tracking needed) — the sensitive
    * statistic: it is undiluted by however much well-fitting build-time
    * mass shares the cell.
    */
  final case class HealthReport(cells: Seq[CellHealth], sizeSkew: Double,
      simDrift: Double, appendDrift: Double, splitCandidates: Seq[Int],
      mergeCandidates: Seq[Int], fragmentedCells: Seq[Int],
      recommendation: String)

  /** Cheap drift monitor — the trigger for the maintenance actions above.
    * One sampled scan of the stored cells (broadcast centroid join,
    * per-cell aggregate, cell-count output rows) compared against the
    * build-time snapshot:
    *
    *  - `appendDrift` = the worst per-cell assignment-quality gap of the
    *    vectors appended SINCE build. The appended mass's own mean cosine
    *    is algebra over the two snapshots — current (n, sim) vs build-time
    *    (bn, bsim) gives `(n·sim − bn·bsim)/(n − bn)` — so no recency
    *    bookkeeping is needed, and the statistic is undiluted by the
    *    well-fitting build-time vectors sharing the cell (a plain mean
    *    drop would stay under any threshold until the drifted mass is a
    *    large fraction of the corpus — an early warning that arrives only
    *    after recall already decayed). Appends sitting farther from their
    *    centroid than the training distribution did are the direct symptom
    *    of drift under a frozen quantizer: above `driftTol` → **retrain**.
    *  - `sizeSkew` = max cell size / mean cell size: appends concentrating
    *    in few cells — localized drift. Cells past `splitFactor`× mean (or
    *    under `mergeFraction`×) with acceptable global drift →
    *    **splitMerge** (touch only those cells).
    *  - otherwise → **ok**.
    *
    * At 100 TB: `sampleFraction` bounds the scan (the statistics are means
    * over millions of vectors per cell — a 1% sample estimates them
    * tightly), and the report is cell-count rows. IvfHealthSpec shows the
    * monitor flagging the IvfRetrainSpec drift corpus BEFORE probe recall
    * visibly decays.
    */
  def health(index: IvfIndex, sampleFraction: Double = 1.0,
      splitFactor: Double = 2.0, mergeFraction: Double = 0.1,
      driftTol: Double = 0.05, maxFilesPerCell: Int = 16): HealthReport = {
    val spark = index.spark
    // sampled counts scale up to full-size estimates so the split/merge
    // thresholds and append-mass algebra compare like with like
    val now = cellStats(spark, index.path, sampleFraction)
      .collect().map(r => r.getInt(0) ->
        (math.round(r.getLong(1) / sampleFraction), r.getDouble(2))).toMap
    val ref = index.stats
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val cells = now.keySet.union(ref.keySet).toSeq.sorted.map { c =>
      val (n, s) = now.getOrElse(c, (0L, Double.NaN))
      val (bn, bs) = ref.getOrElse(c, (0L, Double.NaN))
      CellHealth(c, n, bn, s, bs)
    }
    val total = now.values.map(_._1).sum
    val mean = total.toDouble / math.max(now.size, 1)
    val sizeSkew = if (now.isEmpty) 0.0 else now.values.map(_._1).max / mean
    def weighted(m: Map[Int, (Long, Double)]): Double = {
      val n = m.values.map(_._1).sum
      if (n == 0) Double.NaN else m.values.map { case (c, s) => c * s }.sum / n
    }
    val simDrift = weighted(ref) - weighted(now)
    // worst per-cell quality gap of the appended mass alone; cells whose
    // append mass is a handful of vectors are skipped (a sampling artifact
    // or one stray vector is not a drift signal)
    val appendDrift = cells.flatMap { c =>
      val newMass = c.size - c.buildSize
      if (c.buildMeanSim.isNaN || c.meanSim.isNaN ||
          newMass < math.max(5L, c.buildSize / 50)) None
      else {
        val appendedMean =
          (c.size * c.meanSim - c.buildSize * c.buildMeanSim) / newMass
        Some(c.buildMeanSim - appendedMean)
      }
    }.foldLeft(0.0)(math.max)
    val split = now.filter(_._2._1 > splitFactor * mean).keys.toSeq.sorted
    val merge = (now.filter(_._2._1 < mergeFraction * mean).keySet -- split.toSet)
      .toSeq.sorted
    // fragmentation (one driver-side listing): append-count file growth —
    // the cheapest condition, checked only when geometry is healthy (a
    // splitMerge/retrain rewrite defragments what it touches anyway)
    val fragmented = cellFileCounts(index.spark, s"${index.path}/cells")
      .filter(_._2 > maxFilesPerCell).keys.toSeq.sorted
    val rec =
      if (appendDrift > driftTol) "retrain"
      else if (split.nonEmpty || merge.nonEmpty) "splitMerge"
      else if (fragmented.nonEmpty) "compact"
      else "ok"
    HealthReport(cells, sizeSkew, simDrift, appendDrift, split, merge,
      fragmented, rec)
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

  /** [[append]] behind the replay guard a streaming ingest loop needs
    * (r16 verdict #5): foreachBatch is at-least-once, and a replayed
    * plain `append` silently duplicates vec_ids — inflating cells and
    * distorting [[health]]'s size-based recommendations. Returns true
    * when the batch appended, false when the guard skipped a replay.
    * Single writer per index, same contract as the MinHashStore sink.
    */
  def appendBatch(index: IvfIndex, newVectors: DataFrame,
      batchId: Long, queryId: Option[String] = None): Boolean =
    guardedCellAppend(index.spark, index.path, batchId, queryId) { staging =>
      AnnOps.assignCells(newVectors, index.centroids)
        .write.partitionBy("cell").parquet(staging)
    }

  /** Follow the successor chain left by a streaming sink's maintenance
    * flips to the live generation (see [[graft.streaming.StreamAnn]]).
    */
  def resolveLive(index: IvfIndex): IvfIndex =
    IvfIndex(index.spark, StoreIo.resolveLivePath(index.spark, index.path))

  /** Exactly-once batch append over a `cells/` layout WITHOUT touching
    * the read path (the ANN indexes read whole cell dirs, with runtime
    * DPP on `cell=` — a commit-log reader would change every search
    * plan):
    *
    *  - the `_stream_batch` high-water mark (temp + atomic-rename
    *    updates, [[StoreIo.replaceSmallAtomic]]) skips any batch at or
    *    below it — the replay-after-successful-commit case;
    *  - data files land under DETERMINISTIC per-batch names
    *    (`b<batchId>-<lineage>-<i>.parquet`), so a replay of a batch
    *    that crashed MID-append first sweeps the partial files that
    *    attempt left and redoes the whole batch — duplicates cannot
    *    accumulate. Between a crash and its replay the partial batch is
    *    transiently visible to searches (bounded staleness, converges
    *    on replay) — the trade for keeping searches commit-log-free.
    *    The name carries a LINEAGE token (hash of the query id, `x`
    *    when none): after [[resetStreamMark]] re-binds the index to a
    *    fresh checkpoint, the new stream's restarted batch ids would
    *    otherwise collide with — and sweep — the previous lineage's
    *    COMMITTED files of the same number.
    */
  private[ml] def guardedCellAppend(spark: SparkSession, path: String,
      batchId: Long, queryId: Option[String] = None)(
      write: String => Unit): Boolean = {
    val fs = StoreIo.fsOf(spark, path)
    val (hw, lineage) = streamMark(spark, path)
    // lineage guard (same contract as MinHashStore.appendBatch): a fresh
    // checkpoint directory restarts batch ids at 0, so comparing them
    // against a mark carried from a DIFFERENT lineage would silently
    // skip genuinely new batches — fail fast; resetStreamMark re-binds.
    for (q <- queryId; l <- lineage)
      if (l != q) throw new IllegalStateException(
        s"index at $path is bound to streaming checkpoint lineage $l " +
          s"but this batch arrives under $q; call resetStreamMark to " +
          "intentionally re-bind it to the new stream")
    if (batchId <= hw) return false
    val lin = queryId.map(q => java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(q))).getOrElse("x")
    val prefix = s"b$batchId-$lin-"
    // sweep partial files from a crashed attempt of THIS batch (same
    // lineage only — a prior lineage's committed b<id> files are data)
    val cellsDir = new org.apache.hadoop.fs.Path(s"$path/cells")
    if (fs.exists(cellsDir))
      for (d <- fs.listStatus(cellsDir) if d.isDirectory;
           f <- fs.listStatus(d.getPath)
           if f.isFile && f.getPath.getName.startsWith(prefix))
        fs.delete(f.getPath, false)
    val staging = s"$path/_staging-b$batchId-$lin"
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    write(staging)
    var i = 0
    val st = new org.apache.hadoop.fs.Path(staging)
    if (fs.exists(st))
      for (d <- fs.listStatus(st).sortBy(_.getPath.getName)
           if d.isDirectory && d.getPath.getName.startsWith("cell=")) {
        val dst = new org.apache.hadoop.fs.Path(s"$path/cells/${d.getPath.getName}")
        fs.mkdirs(dst)
        for (f <- fs.listStatus(d.getPath).sortBy(_.getPath.getName)
             if f.isFile && f.getPath.getName.endsWith(".parquet")) {
          val t = new org.apache.hadoop.fs.Path(dst, s"$prefix$i.parquet")
          require(fs.rename(f.getPath, t), s"staged move failed: ${f.getPath} -> $t")
          i += 1
        }
      }
    fs.delete(st, true)
    StoreIo.replaceSmallAtomic(fs,
      new org.apache.hadoop.fs.Path(s"$path/_stream_batch"),
      (batchId.toString +: queryId.toSeq).mkString("\n"))
    true
  }

  /** The streaming high-water mark and its checkpoint lineage for an
    * index at `path`: (-1, None) when unmarked. Line 1 of the marker is
    * the batch id; line 2 (absent on pre-lineage markers) the query id.
    */
  def streamMark(spark: SparkSession, path: String): (Long, Option[String]) =
    StoreIo.readSmall(StoreIo.fsOf(spark, path),
      new org.apache.hadoop.fs.Path(s"$path/_stream_batch"))
      .map { s =>
        val ls = s.split("\n", -1).map(_.trim)
        (ls(0).toLong, ls.drop(1).find(_.nonEmpty))
      }
      .getOrElse((-1L, None))

  /** Clear the streaming mark — the operator action that intentionally
    * re-binds an existing index to a NEW stream (fresh checkpoint
    * lineage) after [[guardedCellAppend]]'s fail-fast guard fired.
    */
  def resetStreamMark(spark: SparkSession, path: String): Unit = {
    StoreIo.fsOf(spark, path)
      .delete(new org.apache.hadoop.fs.Path(s"$path/_stream_batch"), false)
    ()
  }

  /** Carry the streaming mark into a maintenance-created generation —
    * BEFORE the durable successor flip, or a crash-after-flip replay
    * would re-append a batch the new generation already incorporates.
    */
  private[graft] def copyStreamMark(spark: SparkSession, from: String,
      to: String): Unit =
    StoreIo.readSmall(StoreIo.fsOf(spark, from),
      new org.apache.hadoop.fs.Path(s"$from/_stream_batch"))
      .foreach { body =>
        StoreIo.replaceSmallAtomic(StoreIo.fsOf(spark, to),
          new org.apache.hadoop.fs.Path(s"$to/_stream_batch"), body)
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

  /** Partial retrain for LOCALIZED drift: where [[retrain]] re-quantizes
    * and rewrites the whole corpus, `splitMerge` touches only the cells the
    * drift landed in. Every untouched cell's parquet files are HARD-LINKED
    * into the new generation directory — O(1) metadata per file, no data
    * read or rewritten (an object-store binding would use a server-side
    * copy or a manifest reference; the local link carries the same
    * immutable-generation contract) — so maintenance cost scales with the
    * drifted FRACTION of the corpus, not its size. At 100 TB that is the
    * difference between rewriting 100 TB and rewriting a handful of hot
    * cells.
    *
    * Selection is size-based — the observable symptom of drift under a
    * frozen quantizer is that appends concentrate in a few cells: cells
    * larger than `splitFactor` × the mean are re-quantized into `subCells`
    * fresh cells (k-means over just that cell's partition-pruned vectors);
    * cells smaller than `mergeFraction` × the mean are dissolved into their
    * nearest surviving centroid (their vectors land as ADDITIONAL files in
    * the target cell's directory — linked files are never modified). The
    * driver loops over selected cells only: bounded by the cell count,
    * metadata scale. Returns the new generation; the old one stays
    * readable until the caller flips its pointer, exactly as [[retrain]].
    *
    * Probe-budget contract: a query that would have probed a split cell
    * needs up to `subCells` probes to cover the same vectors, so recall at
    * the OLD nprobe is preserved at `nprobe × subCells` in the worst case
    * (typically much less — that bound assumes every probe hit a split
    * cell). At a fixed nprobe a finer index probes relatively less of the
    * corpus and recall can drop by construction; scale nprobe with the
    * split, then tune back down against a recall gate.
    */
  def splitMerge(index: IvfIndex, newPath: String, splitFactor: Double = 2.0,
      mergeFraction: Double = 0.1, subCells: Int = 2,
      trainIters: Int = 3): IvfIndex = {
    val spark = index.spark
    val cellsPath = s"${index.path}/cells"
    // one row per cell — metadata scale
    val sizes = spark.read.parquet(cellsPath).groupBy("cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val mean = sizes.values.sum.toDouble / sizes.size
    val toSplit = sizes.filter(_._2 > splitFactor * mean).keySet
    val toMerge = sizes.filter(_._2 < mergeFraction * mean).keySet -- toSplit
    if (toSplit.isEmpty && toMerge.isEmpty) return index
    val survivors = sizes.keySet -- toSplit -- toMerge

    // fresh sub-quantizers, one per split cell; ids allocated past max
    var nextId = sizes.keySet.max + 1
    var newCents = List.empty[DataFrame]
    var rewritten = List.empty[DataFrame]
    for (c <- toSplit.toSeq.sorted) {
      val cellVecs = spark.read.parquet(cellsPath) // partition-pruned: one dir
        .filter(col("cell") === c).select("vec_id", "v")
      // kmeansCells numbers cells 1..subCells; shift into the fresh id range
      val sub = AnnOps.kmeansCells(cellVecs, subCells, trainIters)
        .withColumn("cell", (col("cell") + lit(nextId - 1)).cast("int"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      nextId += subCells
      newCents ::= sub
      rewritten ::= AnnOps.assignCells(cellVecs, sub)
    }
    val survivorCents = index.centroids
      .filter(col("cell").isin(survivors.toSeq.map(_.asInstanceOf[Any]): _*))
    val finalCents = (survivorCents :: newCents).reduce(_.unionByName(_))
    if (toMerge.nonEmpty) {
      val mergeVecs = spark.read.parquet(cellsPath)
        .filter(col("cell").isin(toMerge.toSeq.map(_.asInstanceOf[Any]): _*))
        .select("vec_id", "v")
      rewritten ::= AnnOps.assignCells(mergeVecs, finalCents)
    }

    // new generation: link survivor files, write only the rewritten cells
    linkCellFiles(cellsPath, s"$newPath/cells", survivors.toSeq)
    rewritten.reduce(_.unionByName(_))
      .write.mode("append").partitionBy("cell").parquet(s"$newPath/cells")
    finalCents.write.mode("overwrite").parquet(s"$newPath/centroids")

    // stats for the new generation at drifted-fraction cost: carry the old
    // snapshot rows for cells whose files were linked untouched, recompute
    // (partition-pruned) only the cells this pass wrote into — the fresh
    // sub-cells plus any survivor cell that absorbed merged vectors.
    val mergeTargets: Set[Int] =
      if (toMerge.isEmpty) Set.empty
      else rewritten.head.select("cell").distinct().collect().map(_.getInt(0)).toSet
    val touched = ((sizes.keySet.max + 1) until nextId).toSet ++ mergeTargets
    val untouched = survivors -- mergeTargets
    val carried = index.stats
      .filter(col("cell").isin(untouched.toSeq.map(_.asInstanceOf[Any]): _*))
    cellStats(spark, newPath)
      .filter(col("cell").isin(touched.toSeq.map(_.asInstanceOf[Any]): _*))
      .unionByName(carried)
      .write.mode("overwrite").parquet(s"$newPath/stats")
    newCents.foreach(_.unpersist())
    IvfIndex(spark, newPath)
  }

  /** Knobs for the closed maintenance loop [[maintain]]. Health thresholds
    * mirror [[health]]'s defaults; `recallFloor` is the index's own
    * quality bar — maintenance is not "done" until a post-action probe
    * audit clears it (or escalation is exhausted).
    */
  final case class MaintainPolicy(
      sampleFraction: Double = 1.0,
      splitFactor: Double = 2.0, mergeFraction: Double = 0.1,
      // CALIBRATE driftTol above the quantizer's GENERALIZATION GAP:
      // k-means centroids overfit their training mass, so HELD-OUT
      // in-distribution appends score a lower assignment cosine than
      // the build snapshot — 0.055-0.071 at sf1 and ~0.088 at sf10
      // with cells ≈ √N (tools/logs/streamann_sf{1,10}_r17.log; the
      // r16 probe's 0.0000 re-appended training points themselves,
      // which has no gap by construction). A tolerance below the gap
      // retrains on every maintenance tick for nothing; streaming
      // sinks at cells ≈ √N should set ~0.12 (StreamAnnProbe's
      // setting — both rungs' ticks correctly chose compact, and the
      // maintained recall matched a fresh rebuild).
      driftTol: Double = 0.05,
      subCells: Int = 2, trainIters: Int = 3,
      retrainCells: Int = 0, // 0 = keep the current centroid count
      // same bar the q_ann_ivf gate pins (recallSummary floor 0.65 at
      // nprobe=3): the audit holds the maintained index to the recall
      // contract its QUERY path already promises
      recallFloor: Double = 0.65, recallQueries: Int = 32,
      k: Int = 5, nprobe: Int = 3,
      // fragmentation budget for the "compact" recommendation (16 ≈ 2×
      // a fresh build's worst per-cell file count at default parallelism)
      maxFilesPerCell: Int = 16, targetFilesPerCell: Int = 1,
      escalate: Boolean = true)

  /** Outcome of one [[maintain]] tick: the (possibly unchanged) index, the
    * health report that drove it, the action applied ("ok", "splitMerge",
    * "retrain", or "splitMerge->retrain" after escalation), and the
    * post-action recall audit (None when no action ran).
    */
  final case class MaintainResult(index: IvfIndex, report: HealthReport,
      action: String, recall: Option[Double])

  /** Probe-recall audit against the index's OWN stored corpus: a bounded
    * deterministic self-query sample (md5-ordered, `nQueries` rows) whose
    * exact top-k is one broadcast-join corpus scan — at 100 TB this is a
    * single extra pass over the cells, the bounded price of knowing a
    * maintenance action actually restored quality.
    */
  def measureRecall(index: IvfIndex, k: Int = 5, nprobe: Int = 3,
      nQueries: Int = 32): Double = {
    val stored = index.spark.read.parquet(s"${index.path}/cells")
      .select("vec_id", "v")
    val queries = stored
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(nQueries)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val exact = AnnOps.bruteForceTopK(stored, queries, k).select("q_id", "n_id")
      val got = index.search(queries, k, nprobe).select("q_id", "n_id")
      val tot = exact.count()
      if (tot == 0) 1.0 else exact.intersect(got).count().toDouble / tot
    } finally queries.unpersist()
  }

  /** The closed loop the monitor exists for: run [[health]], apply its
    * recommendation as a NEW GENERATION at `newPath` (splitMerge links
    * untouched cells; retrain rewrites), then audit probe recall against
    * `policy.recallFloor`. A splitMerge that fails its audit escalates to
    * a full retrain at `newPath-retrain` (localized surgery was the cheap
    * bet; the floor is the contract). "ok" applies nothing and audits
    * nothing. The caller flips its generation pointer to `result.index`
    * when it accepts the result — same immutable-generation contract as
    * [[retrain]]/[[splitMerge]].
    */
  def maintain(index: IvfIndex, newPath: String,
      policy: MaintainPolicy = MaintainPolicy()): MaintainResult = {
    val h = health(index, policy.sampleFraction, policy.splitFactor,
      policy.mergeFraction, policy.driftTol, policy.maxFilesPerCell)
    def retrainTo(path: String): IvfIndex = {
      val cells = if (policy.retrainCells > 0) policy.retrainCells
        else index.centroids.count().toInt
      retrain(index, path, cells, policy.trainIters)
    }
    h.recommendation match {
      case "ok" => MaintainResult(index, h, "ok", None)
      case "compact" =>
        // no recall audit: compaction only moves file boundaries —
        // CompactSpec pins row-identical results across the generation
        MaintainResult(compact(index, newPath, policy.maxFilesPerCell,
          policy.targetFilesPerCell), h, "compact", None)
      case "retrain" =>
        val next = retrainTo(newPath)
        MaintainResult(next, h, "retrain",
          Some(measureRecall(next, policy.k, policy.nprobe, policy.recallQueries)))
      case "splitMerge" =>
        val next = splitMerge(index, newPath, policy.splitFactor,
          policy.mergeFraction, policy.subCells, policy.trainIters)
        val r = measureRecall(next, policy.k, policy.nprobe, policy.recallQueries)
        if (r >= policy.recallFloor || !policy.escalate)
          MaintainResult(next, h, "splitMerge", Some(r))
        else {
          val esc = retrainTo(s"$newPath-retrain")
          MaintainResult(esc, h, "splitMerge->retrain",
            Some(measureRecall(esc, policy.k, policy.nprobe, policy.recallQueries)))
        }
    }
  }
}
