package graft.ml

import graft.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH signature store: the INCREMENTAL near-dup path.
  *
  * [[DedupOps.minhashPairs]] answers "which documents in THIS corpus are
  * near-dups of each other" — one batch, signatures recomputed per run.
  * A training-data pipeline's steady state is different: a bounded new
  * batch arrives and must dedup against a 100 TB HISTORY whose text
  * should be neither re-tokenized nor re-scanned per batch. The store
  * persists exactly what that probe needs — per-document signatures and
  * their exploded LSH band rows, parquet partitioned by `band` — so a
  * probe is: signature the NEW batch (batch-scale compute), broadcast its
  * band rows, stream ONE scan of the store's band rows through the
  * bucket join, and verify only the candidate pairs. History text is
  * touched only to re-shingle the candidate hit set (shortlist-scale,
  * the IvfPq re-rank shape) — or not at all with [[MinHashStore.Store
  * .probeEstimate]], which verifies on the stored signatures alone.
  *
  * Scale shape (1000 executors, 100 TB history):
  *  - the store scan is a straight parquet stream of (band, bucket,
  *    doc_id) — narrow rows, no text, no shuffle of the store;
  *  - the new batch broadcasts (bounded by the batch contract — this is
  *    the interactive side of the same trade [[graft.ml.IvfIndex]]
  *    documents; a batch past broadcast size should be split);
  *  - the per-bucket cap is on TOTAL bucket membership (stored + batch
  *    occupants, [[DedupOps.minhashPairs]]'s union semantics), counted
  *    on the pre-pair store-hit stream — never a shuffle of the store,
  *    and never a cap on the hist×new product;
  *  - `append` is an append-mode parquet write of the new batch's rows —
  *    the store grows without rewriting history (same discipline as
  *    [[IvfIndex.append]]).
  *
  * ID CONTRACT: history and probe batches must use disjoint `doc_id`
  * spaces (the pipeline's natural state — ids are offsets/uuids); pairs
  * are returned as (new_id, hist_id, sim).
  */
object MinHashStore {

  private val Bands = 8
  private val RowsPerBand = 4

  /** The signature parameters a store is built under. Persisted at `build`
    * as `_params.json` and validated by every `append`/`probe`/
    * `probeEstimate` (r15 verdict #4): signatures from DIFFERENT
    * parameters still bucket-join and still divide matching components by
    * k, so a silent mismatch doesn't error — it produces garbage
    * similarity estimates against every stored document. Fail fast
    * instead, naming both parameter sets.
    *
    * `tokenizer` names the shingle-pipeline implementation version; bump
    * it whenever [[graft.functions.TextExprs.shingleHashesNative]] or
    * [[graft.functions.MinHashExprs.minhashSigNative]] change semantics.
    */
  final case class Params(shingleN: Int, k: Int, bands: Int,
      rowsPerBand: Int, tokenizer: String) {
    private[ml] def json: String =
      s"""{"shingleN":$shingleN,"k":$k,"bands":$bands,""" +
        s""""rowsPerBand":$rowsPerBand,"tokenizer":"$tokenizer"}"""
  }

  /** What this code signatures with today: trigram shingles, k=32
    * permutations ([[DedupOps.minhashed]]'s defaults), 8×4 banding.
    */
  private[ml] val CurrentParams = Params(3, 32, Bands, RowsPerBand, "graft-shingle-v1")

  private def paramsPath(path: String) = s"$path/_params.json"

  private def writeParams(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(paramsPath(path))
    val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fsys.create(p, true)
    try out.write(CurrentParams.json.getBytes("UTF-8")) finally out.close()
  }

  private[ml] def readParams(spark: SparkSession, path: String): Option[Params] = {
    val p = new org.apache.hadoop.fs.Path(paramsPath(path))
    val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fsys.exists(p)) None
    else {
      val in = fsys.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      def num(k: String) = s"""\"$k\"\\s*:\\s*(\\d+)""".r
        .findFirstMatchIn(s).map(_.group(1).toInt)
      val tok = """"tokenizer"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(s).map(_.group(1))
      for (n <- num("shingleN"); k <- num("k"); b <- num("bands");
           r <- num("rowsPerBand"); t <- tok) yield Params(n, k, b, r, t)
    }
  }

  /** Pinned SLIM signature frame (doc_id, sig) for one corpus — what the
    * two store writes and the estimate probe consume. The pin is
    * mandatory (two consumers; unpinned each would tokenize/shingle/
    * signature the whole frame independently — the minhashPairs barrier
    * lesson), and it deliberately projects the heavy shingle arrays away
    * BEFORE caching: pinning the full minhashed base cost more in cache
    * serialization of `sh` than the saved second pass (same-box A/B at
    * sf10 — only [[Store.probe]], which verifies on shingles, pins the
    * full base). Eager-materializing callers unpersist in a finally.
    */
  private def pinnedSigs(docs: DataFrame): DataFrame =
    DedupOps.minhashed(docs).select(col("doc_id"), col("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  private def bandsOf(sigs: DataFrame): DataFrame = sigs
    .select(col("doc_id"), explode(lshBands(col("sig"), Bands, RowsPerBand)).as("bk"))
    .select(col("bk.band").as("band"), col("bk.bucket").as("bucket"), col("doc_id"))

  /** Create a store at `path` from the initial history corpus
    * ((doc_id, text) columns). The corpus signatures ONCE (pinned slim
    * frame, eager prime) and feeds both writes; the pin is released
    * before returning.
    */
  def build(docs: DataFrame, path: String): Store = {
    val spark = docs.sparkSession
    val sigs = pinnedSigs(docs)
    try {
      sigs.count()
      bandsOf(sigs).write.mode("overwrite").partitionBy("band").parquet(s"$path/bands")
      sigs.write.mode("overwrite").parquet(s"$path/sigs")
    } finally { sigs.unpersist(); () }
    writeParams(spark, path)
    Store(spark, path)
  }

  /** A probe result paired with the cache pins it rides on (r15 verdict
    * #5): the returned frame is LAZY — its plan depends on the pinned
    * batch/candidate frames, so they cannot be unpersisted before the
    * caller consumes it. `close()` releases them; call it after the frame
    * is fully consumed (collected, written, counted). Steady-state
    * pipelines probing many batches through one session use this handle
    * (or [[Store.probeCollect]]) so cached blocks don't accumulate until
    * LRU pressure.
    */
  final class ProbeHandle private[MinHashStore] (val pairs: DataFrame,
      pins: Seq[DataFrame]) extends AutoCloseable {
    override def close(): Unit = pins.foreach { p => p.unpersist(); () }
  }

  final case class Store(spark: SparkSession, path: String) {

    /** One manifest read per Store instance (driver-side, metadata
      * scale); a store written before manifests existed validates as
      * legacy (nothing recorded to check against).
      */
    private lazy val storedParams: Option[Params] = readParams(spark, path)

    /** Fail fast when the store was built under different signature
      * parameters than this code signatures with — a mismatch doesn't
      * error downstream, it silently corrupts every similarity estimate.
      */
    private def requireParams(): Unit = storedParams.foreach { p =>
      require(p == CurrentParams,
        s"MinHashStore at $path was built with $p but this build signatures " +
          s"with $CurrentParams; rebuild the store (or run the matching " +
          "library version) instead of probing across parameter sets")
    }

    /** (band, bucket, doc_id) — footer-schema read (no inference job),
      * `band` from the dir partitioning. A store with no rows yet (built
      * empty — the streaming bootstrap — or every append still pending)
      * has no parquet footers to read a schema from; it reads as an
      * explicit EMPTY frame rather than failing schema inference, so the
      * first probe simply finds nothing and the first append lights the
      * store up.
      */
    def bandRows: DataFrame =
      if (graft.sources.Tables.footerSparkSchema(spark, s"$path/bands").isEmpty)
        emptyFrame("band INT, bucket BIGINT, doc_id BIGINT")
      else IvfIndex.readOwn(spark, s"$path/bands", Some("band"))

    /** (doc_id, sig) for the whole history; empty-store contract as
      * [[bandRows]].
      */
    def signatures: DataFrame =
      if (graft.sources.Tables.footerSparkSchema(spark, s"$path/sigs").isEmpty)
        emptyFrame("doc_id BIGINT, sig ARRAY<BIGINT>")
      else IvfIndex.readOwn(spark, s"$path/sigs")

    private def emptyFrame(ddl: String): DataFrame =
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(ddl))

    /** Grow the store with a new batch (append-mode writes — history is
      * never rewritten). Call AFTER probing the batch, so the batch does
      * not match itself.
      */
    def append(docs: DataFrame): Unit = {
      requireParams()
      val sigs = MinHashStore.pinnedSigs(docs)
      try {
        sigs.count()
        MinHashStore.bandsOf(sigs).write.mode("append")
          .partitionBy("band").parquet(s"$path/bands")
        sigs.write.mode("append").parquet(s"$path/sigs")
      } finally { sigs.unpersist(); () }
    }

    /** Small-file compaction into a NEW store generation (r16): every
      * [[append]] adds task-count files to each band dir (and to sigs/),
      * so a pipeline appending thousands of batches fragments the store —
      * the probe's one-scan cost grows with the APPEND count instead of
      * the data size, the same LSM small-file problem
      * [[IvfIndex.compact]] solves for the ANN indexes. Band dirs at or
      * under `maxFilesPerBand` hard-link; fragmented bands rewrite
      * partition-pruned with a salted repartition (`targetFilesPerBand`
      * files each); sigs rewrite under the equivalent budget. The params
      * manifest and the streaming high-water mark carry over, so a
      * [[graft.streaming.StreamDedup.minhashStoreForeachBatch]] pipeline
      * can flip its Store pointer between micro-batches. Returns `this`
      * (no new generation) when nothing is fragmented.
      */
    def compactTo(newPath: String, maxFilesPerBand: Int = 8,
        targetFilesPerBand: Int = 1): Store = {
      requireParams()
      require(targetFilesPerBand >= 1, s"targetFilesPerBand: $targetFilesPerBand")
      val bandsPath = s"$path/bands"
      val counts = IvfIndex.cellFileCounts(spark, bandsPath, "band=")
      val fragBands = counts.filter(_._2 > maxFilesPerBand).keys.toSeq.sorted
      val sigFiles = {
        val dir = new org.apache.hadoop.fs.Path(s"$path/sigs")
        val fsys = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fsys.listStatus(dir).count(f =>
          f.isFile && f.getPath.getName.endsWith(".parquet"))
      }
      val sigBudget = maxFilesPerBand * counts.size.max(1)
      if (fragBands.isEmpty && sigFiles <= sigBudget) return this
      // bands: link the tidy dirs, rewrite the fragmented ones pruned
      IvfIndex.linkCellFiles(bandsPath, s"$newPath/bands",
        (counts.keySet -- fragBands).toSeq, "band=")
      if (fragBands.nonEmpty)
        bandRows
          .filter(col("band").isin(fragBands.map(_.asInstanceOf[Any]): _*))
          .repartition(fragBands.size * targetFilesPerBand, col("band"),
            pmod(xxhash64(col("doc_id")), lit(targetFilesPerBand.toLong)))
          .write.mode("append").partitionBy("band").parquet(s"$newPath/bands")
      // sigs: rewrite when fragmented, link otherwise
      if (sigFiles > sigBudget)
        signatures.repartition(targetFilesPerBand * counts.size.max(1))
          .write.mode("overwrite").parquet(s"$newPath/sigs")
      else IvfIndex.linkDir(s"$path/sigs", s"$newPath/sigs")
      copyMarker(paramsPath(path), paramsPath(newPath))
      copyMarker(s"$path/_stream_batch", s"$newPath/_stream_batch")
      Store(spark, newPath)
    }

    /** Copy a small driver-written marker file into the new generation if
      * it exists (manifest, streaming high-water mark).
      */
    private def copyMarker(src: String, dst: String): Unit = {
      val s = new org.apache.hadoop.fs.Path(src)
      val fsys = s.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fsys.exists(s))
        org.apache.hadoop.fs.FileUtil.copy(fsys, s, fsys,
          new org.apache.hadoop.fs.Path(dst), false, true,
          spark.sparkContext.hadoopConfiguration)
      ()
    }

    /** Candidate (new_id, hist_id) pairs from the bucket join — shared by
      * both verification variants. One store scan, broadcast new-batch
      * band rows. The per-bucket cap applies to the bucket's TOTAL
      * MEMBERSHIP (stored + batch occupants), exactly
      * [[DedupOps.minhashPairs]]'s semantics on the union corpus — a cap
      * on the joined hist×new product would silently drop buckets the
      * union run keeps (e.g. 501 stored × 2 batch = 1002 pairs but only
      * 503 members). Counted BEFORE pairing: store rows first meet just
      * the distinct probed-bucket keys (with the batch occupancy riding
      * along), the membership window runs on that pre-pair stream, and
      * only surviving buckets expand against individual batch rows.
      */
    private def candidates(newBands: DataFrame, maxBucket: Int): DataFrame = {
      val nb = newBands.select(col("band"), col("bucket"), col("doc_id").as("new_id"))
      val bucketN = nb.groupBy("band", "bucket").agg(count(lit(1)).as("_nb"))
      val hits = bandRows.join(broadcast(bucketN), Seq("band", "bucket"))
      val capped =
        if (maxBucket == Int.MaxValue) hits
        else {
          val w = Window.partitionBy("band", "bucket")
          hits.withColumn("_hb", count(lit(1)).over(w))
            .filter(col("_hb") + col("_nb") <= maxBucket)
        }
      capped.join(broadcast(nb), Seq("band", "bucket"))
        .select(col("new_id"), col("doc_id").as("hist_id"))
        .distinct()
    }

    /** Near-dup pairs of `newDocs` against the stored history, verified
      * EXACTLY: candidate hist ids re-shingle from `historyDocs`
      * (shortlist-scale COMPUTE — a semi-join prunes to the hit set
      * before any tokenization; the scan still reads the history text
      * column once, so the exact path is history-I/O-bound where
      * [[probeEstimate]] is store-only — MinHashStoreProbe at sf10 with a
      * 1% batch: union re-run 7.5 s, exact probe 4.3 s, estimate 2.3 s,
      * identical pair sets). Same trigram/k=32/8×4 parameters and the
      * same exact-jaccard semantics as [[DedupOps.minhashPairs]], so the
      * two compose: run minhashPairs WITHIN the batch, probe the store
      * ACROSS batches, then [[append]].
      *
      * LIFECYCLE: the pinned batch/candidate frames stay cached for the
      * returned frame's lifetime (LRU-evicted under pressure). Long-lived
      * sessions probing many batches should use [[probeHandle]] and
      * `close()` after consuming each result.
      */
    def probe(newDocs: DataFrame, historyDocs: DataFrame, threshold: Double,
        maxBucket: Int = 1000, prime: Boolean = true): DataFrame =
      probeHandle(newDocs, historyDocs, threshold, maxBucket, prime).pairs

    /** [[probe]] with its cache pins exposed for release: the returned
      * handle's `close()` unpersists the pinned batch base and candidate
      * frame once the pair frame has been consumed — the lifecycle hook
      * plain `probe` (which leaves the pins to LRU eviction, documented
      * there) does not offer.
      */
    def probeHandle(newDocs: DataFrame, historyDocs: DataFrame, threshold: Double,
        maxBucket: Int = 1000, prime: Boolean = true): ProbeHandle = {
      requireParams()
      // one persisted batch base feeds band rows AND the verify shingles —
      // the minhashPairs discipline (without it the batch tokenizes twice
      // and the probe lost to the union re-run baseline at sf1;
      // MinHashStoreProbe is the receipt). With `prime = true` (the
      // execution default) the two pinned frames materialize eagerly so
      // AQE's concurrent branches don't race the cold cache — which makes
      // this SIDE-EFFECTING like minhashPairs; plan-only consumers pass
      // prime = false.
      val nb = DedupOps.minhashed(newDocs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      if (prime) nb.count()
      val newBands = MinHashStore.bandsOf(nb)
      // cand feeds BOTH the history semi-join and the final pair join —
      // unpinned, the store scan + bucket window would run once per
      // consumer; candidate-scale rows, so the pin is cheap
      val cand = candidates(newBands, maxBucket)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      if (prime) cand.count()
      // broadcast the (bounded) candidate id list into the semi-join so
      // the history scan STREAMS — an unhinted semi would sort-merge-
      // shuffle the whole history table on doc_id to meet it
      val histSh = DedupOps.minhashed(
          historyDocs.join(
            broadcast(cand.select(col("hist_id").as("doc_id")).distinct()),
            Seq("doc_id"), "left_semi"))
        .select(col("doc_id").as("hist_id"), col("sh").as("sh_h"))
      val newSh = nb.select(col("doc_id").as("new_id"), col("sh").as("sh_n"))
      val pairs = cand
        .join(newSh, Seq("new_id"))
        .join(histSh, Seq("hist_id"))
        .select(col("new_id"), col("hist_id"),
          jaccard(col("sh_n"), col("sh_h")).as("sim"))
        .filter(col("sim") >= threshold)
      new ProbeHandle(pairs, Seq(nb, cand))
    }

    /** [[probe]] without touching history text: similarity is the
      * MinHash ESTIMATE (matching signature components / k — an unbiased
      * estimator of jaccard with stderr ≈ √(j(1−j)/k), ~0.09 at k=32
      * around the 0.5 threshold). The store-only variant for pipelines
      * whose history text is cold storage; thresholds should be set with
      * the estimator noise in mind.
      */
    def probeEstimate(newDocs: DataFrame, threshold: Double,
        maxBucket: Int = 1000, prime: Boolean = true): DataFrame =
      probeEstimateHandle(newDocs, threshold, maxBucket, prime).pairs

    /** [[probeEstimate]] with its cache pin exposed for release — see
      * [[probeHandle]].
      */
    def probeEstimateHandle(newDocs: DataFrame, threshold: Double,
        maxBucket: Int = 1000, prime: Boolean = true): ProbeHandle = {
      requireParams()
      // pinned SLIM batch frame (sigs + bands are two consumers, and the
      // estimate never needs shingles); prime = true (default) is
      // side-effecting like probe
      val newSigs = MinHashStore.pinnedSigs(newDocs)
      if (prime) newSigs.count()
      val newBands = MinHashStore.bandsOf(newSigs)
      val cand = candidates(newBands, maxBucket)
      val k = size(col("sig_n"))
      // the candidate frame (bounded: batch × bucket occupancy) carries
      // its query signatures and BROADCASTS against the history signature
      // table — history sigs stream through the join; an unhinted join
      // here would sort-merge-shuffle the ENTIRE history sig table on
      // hist_id to meet a shortlist-sized probe
      val candSig = cand.join(
        newSigs.select(col("doc_id").as("new_id"), col("sig").as("sig_n")),
        Seq("new_id"))
      val pairs = signatures.select(col("doc_id").as("hist_id"), col("sig").as("sig_h"))
        .join(broadcast(candSig), Seq("hist_id"))
        .select(col("new_id"), col("hist_id"),
          (size(filter(zip_with(col("sig_n"), col("sig_h"), _ === _),
            (x: org.apache.spark.sql.Column) => x)) / k.cast("double")).as("sim"))
        .filter(col("sim") >= threshold)
      new ProbeHandle(pairs, Seq(newSigs))
    }
  }
}
