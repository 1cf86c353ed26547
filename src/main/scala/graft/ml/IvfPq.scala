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
