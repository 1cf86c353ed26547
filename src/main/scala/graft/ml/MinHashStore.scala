package graft.ml

import graft.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{Path => HPath}

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
  *  - `append` stages the new batch's rows and publishes them with ONE
  *    atomic manifest commit — the store grows without rewriting
  *    history, and a crashed append is invisible (see COMMIT PROTOCOL).
  *
  * COMMIT PROTOCOL (r16 verdict #1): an append used to be three
  * non-atomic writes (bands parquet, sigs parquet, streaming marker) —
  * three crash windows under foreachBatch's at-least-once replay, each
  * yielding duplicate store rows (duplicate output pairs forever) or
  * bands without their signatures. Now every store mutation is:
  * stage the batch's files under `_staging-<nonce>/`, move them into the
  * live tree under nonce names (invisible — readers list files via the
  * commit log, not the directory), then publish ONE manifest under
  * `_commits/` (temp + atomic rename) that names the batch's band files,
  * its sig files, and its streaming batch mark together. A crash at any
  * point leaves either the whole commit or none of it visible; replayed
  * batches are skipped by the mark recorded IN the same manifest
  * ([[Store.appendBatch]]). Orphaned data files from a crashed attempt
  * stay invisible and are dropped by the next [[Store.compactTo]].
  * Same discipline as [[graft.lake.Pool.append]].
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

  private def writeParams(spark: SparkSession, path: String): Unit =
    StoreIo.replaceSmallAtomic(StoreIo.fsOf(spark, path),
      new HPath(paramsPath(path)), CurrentParams.json)

  private[ml] def readParams(spark: SparkSession, path: String): Option[Params] =
    StoreIo.readSmall(StoreIo.fsOf(spark, path), new HPath(paramsPath(path))).flatMap { s =>
      def num(k: String) = s"""\"$k\"\\s*:\\s*(\\d+)""".r
        .findFirstMatchIn(s).map(_.group(1).toInt)
      val tok = """"tokenizer"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(s).map(_.group(1))
      for (n <- num("shingleN"); k <- num("k"); b <- num("bands");
           r <- num("rowsPerBand"); t <- tok) yield Params(n, k, b, r, t)
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

  /** One commit-log entry: the data files it published (store-relative),
    * the streaming batch mark it carries, the checkpoint lineage (query
    * id) that mark belongs to, and whether it RESETS the mark (the
    * operator escape hatch for intentionally re-binding a store to a new
    * stream — see [[Store.resetStreamMark]]).
    */
  private final case class Commit(files: Seq[String], batch: Option[Long],
      query: Option[String], reset: Boolean)

  /** Create a store at `path` from the initial history corpus
    * ((doc_id, text) columns). The corpus signatures ONCE (pinned slim
    * frame, eager prime) and feeds both writes; the pin is released
    * before returning. Publishes a fresh commit log (one baseline
    * manifest naming everything written), replacing any prior log at
    * the path — `build` is the overwrite operation.
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
    val store = Store(spark, path)
    val fs = StoreIo.fsOf(spark, path)
    fs.delete(new HPath(store.commitsDir), true)
    store.publishManifest(store.listDataRels(), None, None)
    store
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

  /** Follow `_successor` pointers to the LIVE generation of a store: the
    * streaming sink's auto-compaction records each generation flip at
    * the ORIGINAL store path ([[graft.streaming.StreamDedup
    * .minhashStoreForeachBatch]]), so a restarted query that rebuilds
    * its closure from the original path resumes on the generation that
    * holds every append made since — not the stale pre-compaction one.
    */
  def resolveLive(store: Store): Store = {
    var cur = store
    var hops = 0
    while (hops < 1000) {
      cur.successor match {
        case Some(next) => cur = next; hops += 1
        case None => return cur
      }
    }
    throw new IllegalStateException(
      s"MinHashStore successor chain from ${store.path} exceeds 1000 hops (cycle?)")
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

    // ------------------------------------------------------------------
    // commit log
    // ------------------------------------------------------------------

    private[MinHashStore] def commitsDir = s"$path/_commits"

    /** Sorted commit-log listing — one driver FS listing, metadata scale.
      * Each append publishes one manifest; [[compactTo]] folds them back
      * into one, so the log length is bounded by the compaction cadence,
      * not the store's lifetime append count.
      */
    private def manifestPaths(): Seq[HPath] = {
      val d = new HPath(commitsDir)
      val fs = StoreIo.fsOf(spark, path)
      if (!fs.exists(d)) Seq.empty
      else fs.listStatus(d).toSeq.map(_.getPath)
        .filter(p => p.getName.endsWith(".txt") && !p.getName.startsWith("."))
        .sortBy(_.getName)
    }

    private def manifested: Boolean = manifestPaths().nonEmpty

    private def readCommit(p: HPath): Commit = {
      val fs = StoreIo.fsOf(spark, path)
      val lines = StoreIo.readSmall(fs, p).getOrElse("")
        .split('\n').iterator.map(_.trim).filter(_.nonEmpty).toSeq
      Commit(
        files = lines.filterNot(_.startsWith("#")),
        batch = lines.collectFirst { case l if l.startsWith("#batch ") =>
          l.stripPrefix("#batch ").trim.toLong },
        query = lines.collectFirst { case l if l.startsWith("#query ") =>
          l.stripPrefix("#query ").trim },
        reset = lines.contains("#reset"))
    }

    private def commits(): Seq[Commit] = manifestPaths().map(readCommit)

    /** Publish one manifest — THE commit point for every store mutation.
      * Temp + atomic rename, so readers never see a partial manifest;
      * sequence-numbered names keep the log ordered. Single writer per
      * store is the documented streaming contract ([[appendBatch]]).
      */
    private[MinHashStore] def publishManifest(rels: Seq[String],
        batch: Option[Long], query: Option[String],
        reset: Boolean = false): Unit = {
      val fs = StoreIo.fsOf(spark, path)
      fs.mkdirs(new HPath(commitsDir))
      val last = manifestPaths().lastOption
        .map(_.getName.takeWhile(_.isDigit).toInt).getOrElse(-1)
      val nonce = java.util.UUID.randomUUID().toString.take(8)
      val name = f"${last + 1}%06d-$nonce.txt"
      val body = ((if (reset) Seq("#reset") else Nil) ++
        batch.map(b => s"#batch $b") ++
        query.map(q => s"#query $q") ++ rels).mkString("\n")
      StoreIo.publishSmallAtomic(fs, new HPath(s"$commitsDir/$name"), body)
    }

    /** Walk the store's data dirs for every parquet file actually on
      * disk, as store-relative paths — the baseline for migrating a
      * pre-manifest store and the post-write listing [[compactTo]]
      * publishes for a fresh generation (whose dirs contain only what
      * compaction itself just wrote).
      */
    private[MinHashStore] def listDataRels(): Seq[String] = {
      val fs = StoreIo.fsOf(spark, path)
      val out = Seq.newBuilder[String]
      val bandsDir = new HPath(s"$path/bands")
      if (fs.exists(bandsDir))
        for (d <- fs.listStatus(bandsDir).sortBy(_.getPath.getName)
             if d.isDirectory && d.getPath.getName.startsWith("band=");
             f <- fs.listStatus(d.getPath).sortBy(_.getPath.getName)
             if f.isFile && f.getPath.getName.endsWith(".parquet"))
          out += s"bands/${d.getPath.getName}/${f.getPath.getName}"
      val sigsDir = new HPath(s"$path/sigs")
      if (fs.exists(sigsDir))
        for (f <- fs.listStatus(sigsDir).sortBy(_.getPath.getName)
             if f.isFile && f.getPath.getName.endsWith(".parquet"))
          out += s"sigs/${f.getPath.getName}"
      out.result()
    }

    /** One-time migration of a pre-manifest store: publish a baseline
      * manifest naming the data files already on disk, folding a legacy
      * `_stream_batch` marker file into it. Until a store is manifested
      * a crashed append is indistinguishable from a committed one, so
      * every mutation path runs this first.
      */
    private def ensureManifested(): Unit = if (!manifested) {
      val fs = StoreIo.fsOf(spark, path)
      val legacyMark = new HPath(s"$path/_stream_batch")
      val legacy = StoreIo.readSmall(fs, legacyMark).map(_.trim.toLong)
      publishManifest(listDataRels(), legacy, None)
      // the migration CONSUMES the legacy marker: from here the manifest
      // is authoritative, and a stale file must not resurrect a mark
      // after resetStreamMark
      if (legacy.isDefined) fs.delete(legacyMark, false)
      ()
    }

    /** Store-relative committed data files under `sub` ("bands"/"sigs"):
      * None for a legacy (pre-manifest) store that reads by directory
      * listing. Files moved into place by a crashed append whose
      * manifest never published are NOT listed — that invisibility is
      * the atomic-commit contract.
      */
    private def committedRels(sub: String): Option[Seq[String]] = {
      val ms = manifestPaths()
      if (ms.isEmpty) None
      else Some(ms.flatMap(m => readCommit(m).files)
        .filter(_.startsWith(sub + "/")))
    }

    // ------------------------------------------------------------------
    // readers
    // ------------------------------------------------------------------

    /** (band, bucket, doc_id): manifested stores read exactly the
      * committed file list (footer-schema read, `basePath` recovers the
      * `band` dir-partition column — partition pruning still applies);
      * legacy stores read the directory. A store with no committed rows
      * yet reads as an explicit EMPTY frame rather than failing schema
      * inference, so the first probe simply finds nothing and the first
      * append lights the store up.
      */
    def bandRows: DataFrame = committedRels("bands") match {
      case Some(rels) => readCommitted(rels, s"$path/bands", Some("band"))
      case None =>
        if (graft.sources.Tables.footerSparkSchema(spark, s"$path/bands").isEmpty)
          emptyFrame("band INT, bucket BIGINT, doc_id BIGINT")
        else IvfIndex.readOwn(spark, s"$path/bands", Some("band"))
    }

    /** (doc_id, sig) for the whole history; empty-store and legacy
      * contracts as [[bandRows]].
      */
    def signatures: DataFrame = committedRels("sigs") match {
      case Some(rels) => readCommitted(rels, s"$path/sigs", None)
      case None =>
        if (graft.sources.Tables.footerSparkSchema(spark, s"$path/sigs").isEmpty)
          emptyFrame("doc_id BIGINT, sig ARRAY<BIGINT>")
        else IvfIndex.readOwn(spark, s"$path/sigs")
    }

    private def readCommitted(rels: Seq[String], basePath: String,
        partCol: Option[String]): DataFrame = {
      if (rels.isEmpty)
        return emptyFrame(if (partCol.isDefined)
          "band INT, bucket BIGINT, doc_id BIGINT"
        else "doc_id BIGINT, sig ARRAY<BIGINT>")
      val files = rels.map(r => s"$path/$r")
      // footer schema from ONE committed file (driver-side) — same
      // no-inference-job discipline as IvfIndex.readOwn
      graft.sources.Tables.footerSparkSchema(spark, files.head) match {
        case Some(s0) =>
          val s = partCol.filterNot(s0.fieldNames.contains)
            .map(c => s0.add(c, org.apache.spark.sql.types.IntegerType))
            .getOrElse(s0)
          spark.read.schema(s).option("basePath", basePath).parquet(files: _*)
        case None =>
          spark.read.option("basePath", basePath).parquet(files: _*)
      }
    }

    private def emptyFrame(ddl: String): DataFrame =
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(ddl))

    // ------------------------------------------------------------------
    // writers
    // ------------------------------------------------------------------

    /** Grow the store with a new batch — ONE atomic commit (see COMMIT
      * PROTOCOL above). Call AFTER probing the batch, so the batch does
      * not match itself. Streaming sinks use [[appendBatch]], which adds
      * the replay guard.
      */
    def append(docs: DataFrame): Unit = appendCommit(docs, None, None)

    /** The streaming high-water mark: the largest `#batch` recorded by
      * any commit since the last `#reset`, with the checkpoint lineage
      * (`#query`) recorded alongside it; (-1, None) when unmarked.
      * Legacy stores fall back to the `_stream_batch` marker file.
      */
    def batchMark: (Long, Option[String]) = {
      val cs = commits()
      val scoped = cs.lastIndexWhere(_.reset) match {
        case -1 => cs
        case i => cs.drop(i + 1)
      }
      val marked = scoped.flatMap(c => c.batch.map(_ -> c.query))
      if (marked.nonEmpty) marked.maxBy(_._1)
      else StoreIo.readSmall(StoreIo.fsOf(spark, path),
        new HPath(s"$path/_stream_batch"))
        .map(s => (s.trim.toLong, Option.empty[String]))
        .getOrElse((-1L, None))
    }

    /** Replay-guarded streaming append — exactly-once on top of
      * foreachBatch's at-least-once: the data files and the `#batch`
      * mark publish in the SAME manifest, and a batch at or below the
      * high-water mark is skipped, so a replayed micro-batch (crash
      * after the commit, before the checkpoint advanced) is a no-op and
      * a crash BEFORE the commit left nothing visible to skip.
      *
      * `queryId` scopes the mark to one checkpoint lineage: batch ids
      * restart from 0 under a fresh checkpoint directory, so comparing
      * them against a mark carried from a DIFFERENT lineage would
      * silently skip genuinely new batches (r16 advice). A lineage
      * mismatch fails fast; to intentionally re-bind an existing store
      * to a new stream, call [[resetStreamMark]] first.
      *
      * Returns true when the batch appended, false when the guard
      * skipped it.
      */
    def appendBatch(docs: DataFrame, batchId: Long,
        queryId: Option[String] = None): Boolean = {
      val (hw, storedQ) = batchMark
      if (queryId.isDefined && storedQ.isDefined && queryId != storedQ)
        throw new IllegalStateException(
          s"MinHashStore at $path carries batch mark $hw from streaming query " +
            s"${storedQ.get}, but this append arrives from query ${queryId.get} " +
            s"(batch $batchId): a fresh checkpoint restarts batch ids from 0, so " +
            "the carried mark cannot order these appends. Resume the original " +
            "checkpoint, or call resetStreamMark() to re-bind the store to the " +
            "new lineage.")
      if (batchId <= hw) false
      else {
        appendCommit(docs, Some(batchId), queryId.orElse(storedQ))
        true
      }
    }

    /** Clear the streaming mark (an empty `#reset` commit): the operator
      * escape hatch for re-binding an existing store to a NEW streaming
      * checkpoint lineage, whose batch ids restart from 0. Every stored
      * document remains probeable; only the replay guard forgets.
      */
    def resetStreamMark(): Unit = {
      ensureManifested()
      publishManifest(Nil, None, None, reset = true)
    }

    /** Stage, move, publish — the one writer everything funnels through.
      * `crashBeforePublish` is the test seam for the commit protocol: it
      * aborts AFTER the data files are in place but BEFORE the manifest
      * publishes, the widest crash window the old three-write append
      * left open.
      */
    private[ml] def appendCommit(docs: DataFrame, batchId: Option[Long],
        queryId: Option[String], crashBeforePublish: Boolean = false): Unit = {
      requireParams()
      ensureManifested()
      val fs = StoreIo.fsOf(spark, path)
      val nonce = java.util.UUID.randomUUID().toString.take(8)
      val staging = s"$path/_staging-$nonce"
      val sigs = MinHashStore.pinnedSigs(docs)
      try {
        sigs.count()
        MinHashStore.bandsOf(sigs).write
          .partitionBy("band").parquet(s"$staging/bands")
        sigs.write.parquet(s"$staging/sigs")
      } finally { sigs.unpersist(); () }
      val rels = moveStaged(staging, nonce)
      if (crashBeforePublish)
        throw new IllegalStateException(
          "appendCommit: injected crash before manifest publish")
      publishManifest(rels, batchId, queryId)
      fs.delete(new HPath(staging), true)
      ()
    }

    /** Move staged data files into the live tree under nonce names —
      * never visible to manifest readers until the commit publishes.
      */
    private def moveStaged(staging: String, nonce: String): Seq[String] = {
      val fs = StoreIo.fsOf(spark, path)
      val rels = Seq.newBuilder[String]
      var i = 0
      def move(src: HPath, relDir: String): Unit = {
        val rel = s"$relDir/c$nonce-$i.parquet"
        require(fs.rename(src, new HPath(s"$path/$rel")),
          s"staged move failed: $src -> $path/$rel")
        rels += rel
        i += 1
      }
      val sb = new HPath(s"$staging/bands")
      if (fs.exists(sb))
        for (d <- fs.listStatus(sb).sortBy(_.getPath.getName)
             if d.isDirectory && d.getPath.getName.startsWith("band=")) {
          fs.mkdirs(new HPath(s"$path/bands/${d.getPath.getName}"))
          for (f <- fs.listStatus(d.getPath).sortBy(_.getPath.getName)
               if f.isFile && f.getPath.getName.endsWith(".parquet"))
            move(f.getPath, s"bands/${d.getPath.getName}")
        }
      val ss = new HPath(s"$staging/sigs")
      if (fs.exists(ss)) {
        fs.mkdirs(new HPath(s"$path/sigs"))
        for (f <- fs.listStatus(ss).sortBy(_.getPath.getName)
             if f.isFile && f.getPath.getName.endsWith(".parquet"))
          move(f.getPath, "sigs")
      }
      rels.result()
    }

    // ------------------------------------------------------------------
    // maintenance
    // ------------------------------------------------------------------

    /** Small-file compaction into a NEW store generation (r16): every
      * [[append]] adds task-count files to each band dir (and to sigs/),
      * so a pipeline appending thousands of batches fragments the store —
      * the probe's one-scan cost grows with the APPEND count instead of
      * the data size, the same LSM small-file problem
      * [[IvfIndex.compact]] solves for the ANN indexes. Band dirs at or
      * under `maxFilesPerBand` hard-link; fragmented bands rewrite
      * partition-pruned with a salted repartition (`targetFilesPerBand`
      * files each); sigs rewrite under the equivalent budget. Counts,
      * links, and rewrites all follow the COMMITTED file lists, so
      * orphans from crashed appends are dropped, not resurrected; the
      * new generation publishes ONE manifest carrying the streaming
      * batch mark (so the replay guard survives the flip) — which also
      * folds the commit log back to a single entry. Returns `this`
      * (no new generation) when nothing is fragmented.
      */
    def compactTo(newPath: String, maxFilesPerBand: Int = 8,
        targetFilesPerBand: Int = 1): Store = {
      requireParams()
      require(targetFilesPerBand >= 1, s"targetFilesPerBand: $targetFilesPerBand")
      ensureManifested()
      val bandRels = committedRels("bands").getOrElse(Nil)
      val byBand: Map[Int, Seq[String]] = bandRels.groupBy(r =>
        r.split('/')(1).stripPrefix("band=").toInt)
      val fragBands = byBand.filter(_._2.size > maxFilesPerBand).keys.toSeq.sorted
      val sigRels = committedRels("sigs").getOrElse(Nil)
      val sigBudget = maxFilesPerBand * byBand.size.max(1)
      if (fragBands.isEmpty && sigRels.size <= sigBudget) return this
      // bands: link the tidy dirs' committed files, rewrite the
      // fragmented bands partition-pruned
      for (b <- (byBand.keySet -- fragBands).toSeq.sorted; r <- byBand(b).sorted)
        IvfIndex.linkOrCopyFile(s"$path/$r", s"$newPath/$r")
      if (fragBands.nonEmpty)
        bandRows
          .filter(col("band").isin(fragBands.map(_.asInstanceOf[Any]): _*))
          .repartition(fragBands.size * targetFilesPerBand, col("band"),
            pmod(xxhash64(col("doc_id")), lit(targetFilesPerBand.toLong)))
          .write.mode("append").partitionBy("band").parquet(s"$newPath/bands")
      // sigs: rewrite when fragmented, link otherwise
      if (sigRels.size > sigBudget)
        signatures.repartition(targetFilesPerBand * byBand.size.max(1))
          .write.mode("overwrite").parquet(s"$newPath/sigs")
      else for (r <- sigRels.sorted)
        IvfIndex.linkOrCopyFile(s"$path/$r", s"$newPath/$r")
      writeParams(spark, newPath)
      val (hw, q) = batchMark
      val next = Store(spark, newPath)
      // a fresh generation dir contains ONLY what compaction just wrote/
      // linked, so the full walk IS the committed set — one manifest
      next.publishManifest(next.listDataRels(),
        if (hw >= 0) Some(hw) else None, q)
      next
    }

    /** The next live generation, when a streaming sink's auto-compaction
      * has flipped past this store — see [[MinHashStore.resolveLive]].
      */
    def successor: Option[Store] =
      StoreIo.readSmall(StoreIo.fsOf(spark, path),
        new HPath(s"$path/_successor"))
        .map(_.trim).filter(_.nonEmpty).map(Store(spark, _))

    /** Record `newPath` as this store's live successor (atomic replace —
      * a crash leaves either the old pointer or the new one). The sink
      * writes this at the ORIGINAL store path on every auto-compaction
      * flip, so the chain is one hop deep in steady state.
      */
    def writeSuccessor(newPath: String): Unit =
      StoreIo.replaceSmallAtomic(StoreIo.fsOf(spark, path),
        new HPath(s"$path/_successor"), newPath)

    /** Delete this store's directory — for retiring a superseded
      * generation after a flip. Hard-linked files survive in the
      * generation that linked them; only this generation's names go.
      */
    def delete(): Unit = {
      StoreIo.fsOf(spark, path).delete(new HPath(path), true)
      ()
    }

    // ------------------------------------------------------------------
    // probes
    // ------------------------------------------------------------------

    /** Candidate (new_id, hist_id) pairs from the bucket join — shared by
      * both verification variants. One store scan, broadcast new-batch
      * band rows. The per-bucket cap applies to the bucket's TOTAL
      * MEMBERSHIP (stored + batch occupants, [[DedupOps.minhashPairs]]'s
      * semantics on the union corpus) — a cap on the joined hist×new
      * product would silently drop buckets the union run keeps (e.g. 501
      * stored × 2 batch = 1002 pairs but only 503 members). Counted
      * BEFORE pairing: store rows first meet just the distinct
      * probed-bucket keys (with the batch occupancy riding along), the
      * membership window runs on that pre-pair stream, and only
      * surviving buckets expand against individual batch rows.
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
