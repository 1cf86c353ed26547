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

  def cellCentroids: DataFrame = IvfIndex.readOwn(spark, s"$path/cell_centroids")
  def codebook: DataFrame = IvfIndex.readOwn(spark, s"$path/codebook")

  /** Build-time per-cell (cell, n, mean_qerr) snapshot written by
    * [[IvfPq.build]] — the frozen reference [[IvfPq.health]] measures
    * codebook drift against.
    */
  def stats: DataFrame = IvfIndex.readOwn(spark, s"$path/stats")

  /** The next live generation, when a streaming sink's maintenance has
    * flipped past this index — see [[IvfPq.resolveLive]].
    */
  def successor: Option[IvfPqIndex] =
    StoreIo.readSuccessor(StoreIo.fsOf(spark, path), path)
      .map(IvfPqIndex(spark, _))

  /** Record `newPath` as this index's live successor (atomic replace) —
    * written at the ORIGIN path on every maintenance flip.
    */
  def writeSuccessor(newPath: String): Unit =
    StoreIo.writeSuccessor(StoreIo.fsOf(spark, path), path, newPath)

  /** Delete this index's directory — for retiring a superseded
    * generation after a flip (hard-linked files survive in the
    * generation that linked them).
    */
  def delete(): Unit = {
    StoreIo.fsOf(spark, path)
      .delete(new org.apache.hadoop.fs.Path(path), true)
    ()
  }

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
  /** [[search]] with an explicit CORPUS-FRACTION shortlist — what
    * `shortlist = 0` (the default) resolves to with `frac =
    * [[IvfPq.DefaultShortlistFrac]]`. Kept as a named entry point for
    * callers tuning the fraction. The bound is `frac` of the PROBED
    * population, sized from the probed cells' parquet FOOTERS —
    * driver-side metadata, zero Spark jobs — then delegated to [[search]].
    */
  def searchFrac(corpus: DataFrame, queries: DataFrame, topK: Int,
      nprobe: Int = 3, frac: Double = IvfPq.DefaultShortlistFrac): DataFrame =
    search(corpus, queries, topK, nprobe,
      footerShortlist(topK, nprobe, frac).getOrElse(IvfPq.FallbackShortlist))

  /** `frac` of the probed population from driver-side metadata, or None
    * when the footers can't be read. The probe set is query-dependent;
    * the footer bound uses ALL cells' counts scaled by nprobe/cells — a
    * uniform-occupancy estimate that is exact in aggregate and errs
    * toward a LARGER shortlist when the probed cells are the fuller ones
    * (the safe direction for recall). Cell dirs and footers are walked
    * DRIVER-side (the cells/ layout is partitioned by cell, so row counts
    * come from each cell=N dir's parquet footers; the cell count is the
    * dir listing) — zero Spark jobs before the plan is built.
    */
  private def footerShortlist(topK: Int, nprobe: Int, frac: Double): Option[Int] = {
    require(frac > 0 && frac <= 1, s"frac out of range: $frac")
    try {
      val cellsDir = new org.apache.hadoop.fs.Path(s"$path/cells")
      val fsys = cellsDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val subdirs = fsys.listStatus(cellsDir).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      val counts = subdirs.map(s =>
        graft.sources.Tables.footerRowCount(spark, s.getPath.toString))
      if (counts.isEmpty || counts.exists(_.isEmpty)) None
      else {
        val rows = counts.flatten.sum *
          math.min(nprobe, subdirs.size).toDouble / subdirs.size
        Some(math.max(topK, math.ceil(rows * frac).toInt))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Resolve the shortlist bound: `> 0` = caller's absolute override;
    * `<= 0` (the DEFAULT) = [[IvfPq.DefaultShortlistFrac]] of the probed
    * population, sized from parquet footers. The fraction is the
    * scale-correct default (r15 verdict #2): ADC ranking error at a fixed
    * compression budget pushes true neighbors past any FIXED cutoff as
    * the corpus grows — the sf100 probe read fixed-200 recall at 0.19
    * where the 5% fraction held 0.92 (`tools/logs/ivfscale_sf100_r15.log`).
    * Unreadable footers fall back to a fixed [[IvfPq.FallbackShortlist]]
    * rather than failing the search.
    */
  private def resolveShortlist(topK: Int, nprobe: Int, shortlist: Int): Int =
    if (shortlist > 0) shortlist
    else footerShortlist(topK, nprobe, IvfPq.DefaultShortlistFrac)
      .getOrElse(IvfPq.FallbackShortlist)

  /** Interactive / bounded-query search: the per-(query, probed-cell) ADC
    * build side broadcasts (|Q| × nprobe rows, each carrying its M×K
    * table), which is what lets dynamic partition pruning drop every
    * non-probed cell directory before file I/O. Bulk query batches go
    * through [[searchDistributed]].
    *
    * CONSTRUCTION IS JOB-FREE (PlanAuditSpec pin): the probed-cell `IN`
    * literal comes from a driver-side dir listing of `cells/`
    * ([[IvfIndex.listedCells]] — the stored universe, zero Spark jobs),
    * not a `distinct().collect()` of the probe frame; exactness to the
    * per-query probe set is the cell equi-join itself, and the universe
    * `IN` is the selective-predicate signal the DPP rule wants on the
    * build side. The ADC tables build in-plan
    * ([[Pq.queryTablesDistributed]] — no driver collect of the queries),
    * and the codebook density check rides a 1-row stats frame to
    * execution time.
    */
  def search(corpus: DataFrame, queries: DataFrame, topK: Int,
      nprobe: Int = 3, shortlist: Int = 0): DataFrame =
    searchImpl(corpus, queries, topK, nprobe,
      resolveShortlist(topK, nprobe, shortlist), bulk = false)

  /** [[search]] for BULK query batches: the query set stays a DataFrame
    * end to end — never collected to or broadcast from the driver
    * (driver memory flat in |Q|, the million-query contract;
    * [[graft.ml.Pq.searchTopKDistributed]]'s sibling for the disk
    * index). The codes scan and the per-(query, probed-cell) ADC tables
    * meet in a shuffled-hash join on `cell`; the shortlist and the exact
    * re-rank keep every per-query rank on bounded k-heaps, and the
    * re-rank joins stay shuffles too. The centroid/codebook broadcasts
    * remain — those are index METADATA, not query data. No dynamic
    * partition pruning by design: DPP only reuses broadcasts, and a bulk
    * batch probes essentially the whole cell universe anyway.
    */
  def searchDistributed(corpus: DataFrame, queries: DataFrame, topK: Int,
      nprobe: Int = 3, shortlist: Int = 0): DataFrame =
    searchImpl(corpus, queries, topK, nprobe,
      resolveShortlist(topK, nprobe, shortlist), bulk = true)

  private def searchImpl(corpus: DataFrame, queries: DataFrame, topK: Int,
      nprobe: Int, shortlist: Int, bulk: Boolean): DataFrame = {
    // probe: nprobe nearest cells per query against the broadcast
    // centroids (index metadata), through the bounded k-heap
    val universe = IvfIndex.listedCells(spark, path)
    val probedCells = queries.select(col("vec_id").as("q_id"), col("v"))
      .join(broadcast(cellCentroids))
      .select(col("q_id"), col("cell"), cosine(col("v"), col("cent")).as("csim"))
      .groupBy("q_id")
      .agg(topkPairs(col("csim"), col("cell").cast("long"), nprobe).as("pc"))
      .select(col("q_id"), explode(col("pc.n_id")).as("_cl"))
      .select(col("q_id"), col("_cl").cast("int").as("cell"))
      .filter(col("cell").isin(universe: _*))
    val scan = IvfIndex.readOwn(spark, s"$path/cells", Some("cell"))

    // ADC over probed cells only: each stored code row lives in exactly
    // one cell, so the (cell, q_id)-keyed equi-join yields each
    // (query, candidate) pair once — same pair stream the old
    // array_contains join produced, but equi-keyed (DPP-able, and the
    // bulk path can shuffle on it)
    // bulk: every query-scale join is hinted shuffle_hash — without the
    // hints AQE happily BROADCASTS whichever query-derived frame looks
    // small (probe rows, the ADC tables, the shortlist), which is exactly
    // the driver-memory dependence on |Q| this path exists to avoid; a
    // shuffled-hash build is per-partition executor memory instead
    val qT = Pq.queryTablesDistributed(codebook, queries)
    val codes = scan.select(col("vec_id").as("n_id"), col("codes"), col("cell"))
    val paired =
      if (bulk) {
        // one composite build (probe rows ⋈ tables) — no DPP in bulk by
        // design, and the pair stream shuffles once, on cell
        val build = probedCells.join(qT.hint("shuffle_hash"), Seq("q_id"))
        codes.join(build.hint("shuffle_hash"), Seq("cell"))
      } else
        // TWO slim broadcasts, cell join first: AQE's adaptive DPP rule
        // only keeps the runtime partition filter when it can REUSE the
        // cell join's broadcast for the pruning subquery, and a composite
        // (probe ⋈ tables) build side defeats that match — the filter
        // silently degrades to dynamicpruningexpression(true) and the
        // scan reads every cell (caught by IvfScaleProbe's cells_read
        // metric; DedupSpec pins the pruned count now). The second
        // broadcast attaches each pair's ADC table by q_id in place — a
        // hash lookup, no shuffle of the pair stream.
        codes.join(broadcast(probedCells), Seq("cell"))
          .join(broadcast(qT), Seq("q_id"))
    val cand = paired
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), Pq.adcDist.as("d2"))
      .groupBy("q_id")
      .agg(topkPairs(negate(col("d2")), col("n_id"), shortlist).as("top"))
      .select(col("q_id"), explode(col("top.n_id")).as("n_id"))

    // exact re-rank of the shortlist against the source vectors —
    // shortlist-scale I/O keyed by vec_id
    val qv = queries.select(col("vec_id").as("q_id"), col("v").as("qv"))
    val nv = corpus.select(col("vec_id").as("n_id"), col("v").as("nv"))
    val withQ = cand
      .join(if (bulk) qv.hint("shuffle_hash") else broadcast(qv), Seq("q_id"))
    val rerank =
      if (bulk) withQ.hint("shuffle_hash").join(nv, Seq("n_id"))
      else withQ.join(nv, Seq("n_id"))
    AnnOps.scoredTopK(rerank, topK)
  }
}

object IvfPq {

  /** The default shortlist as a fraction of the probed population — the
    * value the sf100 scale ladder proved out (recall 0.92 at 2M vectors
    * where fixed-200 collapsed to 0.19).
    */
  val DefaultShortlistFrac: Double = 0.05

  /** Absolute shortlist used only when the cells/ footers can't be read
    * (foreign layout, metadata surprise) — the legacy fixed default.
    */
  val FallbackShortlist: Int = 50

  /** Train both quantizers, encode, and persist the index.
    *
    * Each stored row carries its quantization error alongside the codes
    * ((vec_id, codes, qerr) partitioned by cell — one float per row, the
    * price of drift monitoring with NO corpus access: [[health]] compares
    * a narrow (cell, qerr) scan against the build-time snapshot written
    * here, where the [[IvfIndex]] sibling must re-join vectors against
    * centroids). Search plans project (vec_id, codes, cell), so the extra
    * column never enters a query's scan.
    */
  def build(corpus: DataFrame, path: String, cells: Int = 10, m: Int = 8,
      k: Int = 16, iters: Int = 3): IvfPqIndex = {
    val spark = corpus.sparkSession
    val cellCents = AnnOps.kmeansCells(corpus, cells, iters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val book = Pq.train(corpus, m, k, iters)
    try {
      val assigned = AnnOps.assignCells(corpus, cellCents) // vec_id, v, cell
      val codes = Pq.encodeWithError(corpus, book)         // vec_id, codes, qerr
      assigned.select(col("vec_id"), col("cell"))
        .join(codes, Seq("vec_id"))
        .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
      cellCents.write.mode("overwrite").parquet(s"$path/cell_centroids")
      book.write.mode("overwrite").parquet(s"$path/codebook")
      cellQerrStats(spark, path).write.mode("overwrite").parquet(s"$path/stats")
    } finally {
      cellCents.unpersist()
      book.unpersist()
    }
    IvfPqIndex(spark, path)
  }

  /** Per-cell (cell, n, mean_qerr) over the stored codes: ONE narrow scan
    * of (cell, qerr) — columnar-pruned, no vectors, no joins — with
    * cell-count output rows.
    */
  private def cellQerrStats(spark: SparkSession, path: String,
      sampleFraction: Double = 1.0): DataFrame = {
    val stored0 = IvfIndex.readOwn(spark, s"$path/cells", Some("cell"))
      .select("cell", "qerr")
    val stored = if (sampleFraction < 1.0)
      stored0.sample(withReplacement = false, sampleFraction, seed = 42L)
    else stored0
    stored.groupBy("cell")
      .agg(count(lit(1)).as("n"), avg("qerr").as("mean_qerr"))
  }

  /** Incrementally index new vectors against the EXISTING quantizers:
    * assign to the trained cells, encode with the trained codebooks, and
    * append into the cell partitions — no retrain, no rewrite of prior
    * data (same discipline as [[IvfIndex.append]]). Both quantizers stay
    * frozen, so drift now has TWO symptoms: probe recall decays (cell
    * geometry stale) and per-row qerr inflates (codebook reconstructing
    * vectors it wasn't trained on) — the second is what [[health]] reads,
    * and it's the cheaper, earlier signal.
    */
  def append(index: IvfPqIndex, newVectors: DataFrame): IvfPqIndex = {
    // pinned for the write: cell assignment and code encoding are two
    // independent consumers of the batch — unpinned, an expensive
    // upstream lineage would compute twice (IvfIndex.append has one
    // consumer and needs no pin)
    val nv = newVectors
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val assigned = AnnOps.assignCells(nv, index.cellCentroids)
      val codes = Pq.encodeWithError(nv, index.codebook)
      assigned.select(col("vec_id"), col("cell"))
        .join(codes, Seq("vec_id"))
        .write.mode("append").partitionBy("cell").parquet(s"${index.path}/cells")
    } finally { nv.unpersist(); () }
    index
  }

  /** [[append]] behind the at-least-once replay guard — see
    * [[IvfIndex.appendBatch]]: a replayed micro-batch must not
    * double-encode its vec_ids into the cells (duplicates inflate cell
    * sizes AND the appended-mass qerr that [[health]]'s drift signal
    * reads). Returns true when the batch appended, false on a skipped
    * replay. The per-row qerr persists at encode exactly as in
    * [[append]] — only the commit discipline differs.
    */
  def appendBatch(index: IvfPqIndex, newVectors: DataFrame,
      batchId: Long, queryId: Option[String] = None): Boolean =
    IvfIndex.guardedCellAppend(index.spark, index.path, batchId,
        queryId) { staging =>
      val nv = newVectors
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val assigned = AnnOps.assignCells(nv, index.cellCentroids)
        val codes = Pq.encodeWithError(nv, index.codebook)
        assigned.select(col("vec_id"), col("cell"))
          .join(codes, Seq("vec_id"))
          .write.partitionBy("cell").parquet(staging)
      } finally { nv.unpersist(); () }
    }

  /** One cell's line in a PQ [[HealthReport]]: current vs build-time size
    * and mean quantization error (NaN build side for cells born after
    * build).
    */
  final case class CellHealth(cell: Int, size: Long, buildSize: Long,
      meanQerr: Double, buildMeanQerr: Double)

  /** Drift diagnosis for the codes-only index — bounded by the cell
    * count. `qerrDrift` is the corpus-weighted global mean quantization
    * error RISE since build, normalized by the build-time mean;
    * `appendDrift` isolates the APPENDED rows' own reconstruction
    * quality (derived per cell from the two snapshots — same algebra as
    * [[IvfIndex.health]], error axis instead of cosine).
    */
  final case class HealthReport(cells: Seq[CellHealth], sizeSkew: Double,
      qerrDrift: Double, appendDrift: Double, splitCandidates: Seq[Int],
      mergeCandidates: Seq[Int], fragmentedCells: Seq[Int],
      recommendation: String)

  /** Cheap drift monitor over the PQ index, NO corpus access (the stored
    * per-row qerr was computed at encode time, while the raw vector was
    * in hand — it is exactly the appended mass's codebook fit, frozen
    * per row):
    *
    *  - `appendDrift` = worst per-cell RELATIVE reconstruction-error
    *    inflation of rows appended since build:
    *    `(appendedMeanQerr − buildMeanQerr) / globalBuildMeanQerr`, with
    *    the appended mass's mean recovered from the two snapshots as
    *    `(n·cur − bn·bcur)/(n − bn)`. Appends reconstructing worse than
    *    the training distribution are the direct symptom of codebook
    *    drift: above `driftTol` → **retrain** (needs the source corpus —
    *    the PQ store keeps no vectors). The inflation's magnitude
    *    shrinks as codebook quality grows (a rich codebook reconstructs
    *    even foreign vectors tolerably): equally foreign drift read 0.51
    *    on a 500-vector build but 0.19 on a 200k-vector k=64 build
    *    (IvfPqMaintProbe) — hence the 0.15 default, with [[maintain]]'s
    *    recall-audited escalation as the net for whatever a fixed
    *    threshold misses.
    *  - `sizeSkew` / split / merge candidates as in [[IvfIndex.health]]:
    *    localized pile-up with acceptable codebook fit → **splitMerge**
    *    (cell surgery on decoded reconstructions — no corpus needed).
    *  - otherwise → **ok**.
    *
    * At 100 TB the current snapshot is one sampled scan of TWO int/float
    * columns — far cheaper than the IvfIndex sibling's vector-×-centroid
    * join, which is the point of persisting qerr per row.
    */
  def health(index: IvfPqIndex, sampleFraction: Double = 1.0,
      splitFactor: Double = 2.0, mergeFraction: Double = 0.1,
      driftTol: Double = 0.15, maxFilesPerCell: Int = 16): HealthReport = {
    val spark = index.spark
    val now = cellQerrStats(spark, index.path, sampleFraction)
      .collect().map(r => r.getInt(0) ->
        (math.round(r.getLong(1) / sampleFraction), r.getDouble(2))).toMap
    val ref = index.stats
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val cells = now.keySet.union(ref.keySet).toSeq.sorted.map { c =>
      val (n, e) = now.getOrElse(c, (0L, Double.NaN))
      val (bn, be) = ref.getOrElse(c, (0L, Double.NaN))
      CellHealth(c, n, bn, e, be)
    }
    val total = now.values.map(_._1).sum
    val mean = total.toDouble / math.max(now.size, 1)
    val sizeSkew = if (now.isEmpty) 0.0 else now.values.map(_._1).max / mean
    def weighted(m: Map[Int, (Long, Double)]): Double = {
      val n = m.values.map(_._1).sum
      if (n == 0) Double.NaN else m.values.map { case (c, e) => c * e }.sum / n
    }
    val buildGlobal = weighted(ref)
    // normalizer: the build-time global mean error — relative inflation is
    // scale-free across embedding dims/norms (an absolute qerr threshold
    // would mean nothing across corpora); a degenerate all-zero build
    // (identical vectors) can't normalize, so guard with a tiny floor
    val norm = math.max(buildGlobal, 1e-12)
    val qerrDrift = (weighted(now) - buildGlobal) / norm
    val appendDrift = cells.flatMap { c =>
      val newMass = c.size - c.buildSize
      if (c.buildMeanQerr.isNaN || c.meanQerr.isNaN ||
          newMass < math.max(5L, c.buildSize / 50)) None
      else {
        val appendedMean =
          (c.size * c.meanQerr - c.buildSize * c.buildMeanQerr) / newMass
        Some((appendedMean - c.buildMeanQerr) / norm)
      }
    }.foldLeft(0.0)(math.max)
    val split = now.filter(_._2._1 > splitFactor * mean).keys.toSeq.sorted
    val merge = (now.filter(_._2._1 < mergeFraction * mean).keySet -- split.toSet)
      .toSeq.sorted
    // fragmentation (one driver-side listing) — see IvfIndex.health
    val fragmented = IvfIndex.cellFileCounts(index.spark, s"${index.path}/cells")
      .filter(_._2 > maxFilesPerCell).keys.toSeq.sorted
    val rec =
      if (appendDrift > driftTol) "retrain"
      else if (split.nonEmpty || merge.nonEmpty) "splitMerge"
      else if (fragmented.nonEmpty) "compact"
      else "ok"
    HealthReport(cells, sizeSkew, qerrDrift, appendDrift, split, merge,
      fragmented, rec)
  }

  /** Re-train BOTH quantizers for a drifted corpus as a fresh index
    * generation at `newPath` — the full rebuild, and the only action that
    * needs the SOURCE corpus (the store keeps codes, not vectors; a new
    * codebook cannot be trained from its own reconstructions).
    * `cells`/`m`/`k` default (0) to the current index's shape. Readers
    * keep using the old generation until the caller flips its pointer —
    * the immutable-generation contract of [[IvfIndex.retrain]].
    */
  def retrain(index: IvfPqIndex, corpus: DataFrame, newPath: String,
      cells: Int = 0, m: Int = 0, k: Int = 0, iters: Int = 3): IvfPqIndex = {
    val c = if (cells > 0) cells else index.cellCentroids.count().toInt
    val shape = index.codebook.agg(
      (max(col("m")) + 1).as("m"), (max(col("k")) + 1).as("k")).head()
    build(corpus, newPath,
      c, if (m > 0) m else shape.getInt(0), if (k > 0) k else shape.getInt(1),
      iters)
  }

  /** Partial maintenance for LOCALIZED drift, NO corpus access: the
    * coarse cells the pile-up landed in are re-clustered over the PQ
    * RECONSTRUCTIONS of their stored codes ([[Pq.decode]] — within
    * sqrt(qerr) of the originals, and centroid means average the
    * per-vector error out), every untouched cell's files hard-link into
    * the new generation, and the rewritten rows keep their codes and
    * qerr untouched — both are properties of the VECTOR and the frozen
    * codebook, independent of which cell owns the row. Maintenance cost
    * scales with the drifted fraction, exactly as [[IvfIndex.splitMerge]];
    * the probe-budget contract there carries over unchanged.
    */
  def splitMerge(index: IvfPqIndex, newPath: String, splitFactor: Double = 2.0,
      mergeFraction: Double = 0.1, subCells: Int = 2,
      trainIters: Int = 3): IvfPqIndex = {
    val spark = index.spark
    val cellsPath = s"${index.path}/cells"
    val stored = IvfIndex.readOwn(spark, cellsPath, Some("cell"))
    // one row per cell — metadata scale
    val sizes = stored.groupBy("cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val mean = sizes.values.sum.toDouble / sizes.size
    val toSplit = sizes.filter(_._2 > splitFactor * mean).keySet
    val toMerge = sizes.filter(_._2 < mergeFraction * mean).keySet -- toSplit
    if (toSplit.isEmpty && toMerge.isEmpty) return index
    val survivors = sizes.keySet -- toSplit -- toMerge

    val book = index.codebook
    var nextId = sizes.keySet.max + 1
    var newCents = List.empty[DataFrame]
    var rewritten = List.empty[DataFrame]
    var pinned = List.empty[DataFrame]
    for (c <- toSplit.toSeq.sorted) {
      val cellCodes = stored.filter(col("cell") === c) // partition-pruned
        .select("vec_id", "codes", "qerr")
      // pinned through the final write: the decode feeds every Lloyd
      // round of the sub-quantizer AND the re-assignment join, and those
      // plans evaluate lazily at write time
      val recon = Pq.decode(cellCodes, book)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pinned ::= recon
      val sub = AnnOps.kmeansCells(recon, subCells, trainIters)
        .withColumn("cell", (col("cell") + lit(nextId - 1)).cast("int"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      nextId += subCells
      newCents ::= sub
      rewritten ::= AnnOps.assignCells(recon, sub)
        .select(col("vec_id"), col("cell"))
        .join(cellCodes, Seq("vec_id"))
    }
    val survivorCents = index.cellCentroids
      .filter(col("cell").isin(survivors.toSeq.map(_.asInstanceOf[Any]): _*))
    val finalCents = (survivorCents :: newCents).reduce(_.unionByName(_))
    if (toMerge.nonEmpty) {
      val mergeCodes = stored
        .filter(col("cell").isin(toMerge.toSeq.map(_.asInstanceOf[Any]): _*))
        .select("vec_id", "codes", "qerr")
      rewritten ::= AnnOps.assignCells(Pq.decode(mergeCodes, book), finalCents)
        .select(col("vec_id"), col("cell"))
        .join(mergeCodes, Seq("vec_id"))
    }

    IvfIndex.linkCellFiles(cellsPath, s"$newPath/cells", survivors.toSeq)
    rewritten.reduce(_.unionByName(_))
      .write.mode("append").partitionBy("cell").parquet(s"$newPath/cells")
    finalCents.write.mode("overwrite").parquet(s"$newPath/cell_centroids")
    book.write.mode("overwrite").parquet(s"$newPath/codebook")

    // stats at drifted-fraction cost: carry untouched cells' snapshot
    // rows, recompute only cells this pass wrote into
    val mergeTargets: Set[Int] =
      if (toMerge.isEmpty) Set.empty
      else rewritten.head.select("cell").distinct().collect().map(_.getInt(0)).toSet
    val touched = ((sizes.keySet.max + 1) until nextId).toSet ++ mergeTargets
    val untouched = survivors -- mergeTargets
    val carried = index.stats
      .filter(col("cell").isin(untouched.toSeq.map(_.asInstanceOf[Any]): _*))
    cellQerrStats(spark, newPath)
      .filter(col("cell").isin(touched.toSeq.map(_.asInstanceOf[Any]): _*))
      .unionByName(carried)
      .write.mode("overwrite").parquet(s"$newPath/stats")
    (newCents ++ pinned).foreach { c => c.unpersist(); () }
    IvfPqIndex(spark, newPath)
  }

  /** Small-file compaction for the PQ index — [[IvfIndex.compact]]'s
    * sibling over the same `cells/` layout (appends fragment this index
    * identically): fragmented cells rewrite, everything else (cells,
    * cell_centroids, codebook, stats) hard-links into the new
    * generation. Codes and qerr are per-row data, untouched by the
    * rewrite.
    */
  def compact(index: IvfPqIndex, newPath: String, maxFilesPerCell: Int = 8,
      targetFilesPerCell: Int = 1): IvfPqIndex =
    IvfIndex.compactCells(index.spark, index.path, newPath, maxFilesPerCell,
      targetFilesPerCell,
      p => IvfIndex.readOwn(index.spark, p, Some("cell"))) match {
      case None => index
      case Some(_) =>
        IvfIndex.linkDir(s"${index.path}/cell_centroids", s"$newPath/cell_centroids")
        IvfIndex.linkDir(s"${index.path}/codebook", s"$newPath/codebook")
        IvfIndex.linkDir(s"${index.path}/stats", s"$newPath/stats")
        IvfPqIndex(index.spark, newPath)
    }

  /** Probe-recall audit against the SOURCE corpus: a bounded
    * deterministic self-query sample (md5-ordered, `nQueries` rows) whose
    * exact top-k is one broadcast-join corpus scan — the bounded price of
    * knowing a maintenance action actually restored quality.
    */
  def measureRecall(index: IvfPqIndex, corpus: DataFrame, k: Int = 5,
      nprobe: Int = 3, nQueries: Int = 32, shortlist: Int = 0): Double = {
    val queries = corpus
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(nQueries)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val exact = AnnOps.bruteForceTopK(corpus, queries, k).select("q_id", "n_id")
      val got = index.search(corpus, queries, k, nprobe, shortlist)
        .select("q_id", "n_id")
      val tot = exact.count()
      if (tot == 0) 1.0 else exact.intersect(got).count().toDouble / tot
    } finally { queries.unpersist(); () }
  }

  /** Knobs for [[maintain]] — [[IvfIndex.MaintainPolicy]]'s PQ sibling.
    * `driftTol` is on the RELATIVE qerr-inflation axis (see [[health]]);
    * the recall floor matches the q_ann_ivfpq gate's pinned bar (0.50 at
    * nprobe=3 — the compounded cell-pruning × code-quantization
    * approximation).
    */
  final case class MaintainPolicy(
      sampleFraction: Double = 1.0,
      splitFactor: Double = 2.0, mergeFraction: Double = 0.1,
      driftTol: Double = 0.15,
      subCells: Int = 2, trainIters: Int = 3,
      retrainCells: Int = 0, // 0 = keep the current centroid count
      recallFloor: Double = 0.50, recallQueries: Int = 32,
      k: Int = 5, nprobe: Int = 3,
      // audit shortlist: 0 = the production default (footer-sized corpus
      // fraction); tiny test corpora need an absolute override because 5%
      // of a few hundred rows barely exceeds topK
      auditShortlist: Int = 0,
      // fragmentation budget for the "compact" recommendation
      maxFilesPerCell: Int = 16, targetFilesPerCell: Int = 1,
      escalate: Boolean = true)

  /** Outcome of one [[maintain]] tick — see [[IvfIndex.MaintainResult]]. */
  final case class MaintainResult(index: IvfPqIndex, report: HealthReport,
      action: String, recall: Option[Double])

  /** The closed maintenance loop for the PQ-coded index — the index you
    * actually run at 100 TB for memory reasons, so a from-scratch rebuild
    * on every drift is ITS scale-killer (r15 verdict #3): run [[health]]
    * (no corpus access), apply its recommendation as a new generation
    * (splitMerge works on decoded reconstructions — also corpus-free;
    * only retrain touches `corpus`), then audit probe recall against
    * `policy.recallFloor`, escalating a failed splitMerge to a full
    * retrain. The caller flips its generation pointer to `result.index`
    * when it accepts — the immutable-generation contract throughout.
    */
  /** Follow the successor chain left by a streaming sink's maintenance
    * flips to the live generation (see [[graft.streaming.StreamAnn]]).
    */
  def resolveLive(index: IvfPqIndex): IvfPqIndex =
    IvfPqIndex(index.spark, StoreIo.resolveLivePath(index.spark, index.path))

  def maintain(index: IvfPqIndex, corpus: DataFrame, newPath: String,
      policy: MaintainPolicy = MaintainPolicy()): MaintainResult = {
    val h = health(index, policy.sampleFraction, policy.splitFactor,
      policy.mergeFraction, policy.driftTol, policy.maxFilesPerCell)
    h.recommendation match {
      case "ok" => MaintainResult(index, h, "ok", None)
      case "compact" =>
        // no recall audit: compaction only moves file boundaries —
        // CompactSpec pins row-identical results across the generation
        MaintainResult(compact(index, newPath, policy.maxFilesPerCell,
          policy.targetFilesPerCell), h, "compact", None)
      case "retrain" =>
        val next = retrain(index, corpus, newPath, policy.retrainCells,
          iters = policy.trainIters)
        MaintainResult(next, h, "retrain",
          Some(measureRecall(next, corpus, policy.k, policy.nprobe,
            policy.recallQueries, policy.auditShortlist)))
      case "splitMerge" =>
        val next = splitMerge(index, newPath, policy.splitFactor,
          policy.mergeFraction, policy.subCells, policy.trainIters)
        val r = measureRecall(next, corpus, policy.k, policy.nprobe,
          policy.recallQueries, policy.auditShortlist)
        if (r >= policy.recallFloor || !policy.escalate)
          MaintainResult(next, h, "splitMerge", Some(r))
        else {
          val esc = retrain(index, corpus, s"$newPath-retrain",
            policy.retrainCells, iters = policy.trainIters)
          MaintainResult(esc, h, "splitMerge->retrain",
            Some(measureRecall(esc, corpus, policy.k, policy.nprobe,
              policy.recallQueries, policy.auditShortlist)))
        }
    }
  }
}
