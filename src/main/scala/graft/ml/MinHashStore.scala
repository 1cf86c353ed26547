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
    Store(spark, path)
  }

  final case class Store(spark: SparkSession, path: String) {

    /** (band, bucket, doc_id) — footer-schema read (no inference job),
      * `band` from the dir partitioning.
      */
    def bandRows: DataFrame = IvfIndex.readOwn(spark, s"$path/bands", Some("band"))

    /** (doc_id, sig) for the whole history. */
    def signatures: DataFrame = IvfIndex.readOwn(spark, s"$path/sigs")

    /** Grow the store with a new batch (append-mode writes — history is
      * never rewritten). Call AFTER probing the batch, so the batch does
      * not match itself.
      */
    def append(docs: DataFrame): Unit = {
      val sigs = MinHashStore.pinnedSigs(docs)
      try {
        sigs.count()
        MinHashStore.bandsOf(sigs).write.mode("append")
          .partitionBy("band").parquet(s"$path/bands")
        sigs.write.mode("append").parquet(s"$path/sigs")
      } finally { sigs.unpersist(); () }
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
      */
    def probe(newDocs: DataFrame, historyDocs: DataFrame, threshold: Double,
        maxBucket: Int = 1000, prime: Boolean = true): DataFrame = {
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
      cand
        .join(newSh, Seq("new_id"))
        .join(histSh, Seq("hist_id"))
        .select(col("new_id"), col("hist_id"),
          jaccard(col("sh_n"), col("sh_h")).as("sim"))
        .filter(col("sim") >= threshold)
    }

    /** [[probe]] without touching history text: similarity is the
      * MinHash ESTIMATE (matching signature components / k — an unbiased
      * estimator of jaccard with stderr ≈ √(j(1−j)/k), ~0.09 at k=32
      * around the 0.5 threshold). The store-only variant for pipelines
      * whose history text is cold storage; thresholds should be set with
      * the estimator noise in mind.
      */
    def probeEstimate(newDocs: DataFrame, threshold: Double,
        maxBucket: Int = 1000, prime: Boolean = true): DataFrame = {
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
      signatures.select(col("doc_id").as("hist_id"), col("sig").as("sig_h"))
        .join(broadcast(candSig), Seq("hist_id"))
        .select(col("new_id"), col("hist_id"),
          (size(filter(zip_with(col("sig_n"), col("sig_h"), _ === _),
            (x: org.apache.spark.sql.Column) => x)) / k.cast("double")).as("sim"))
        .filter(col("sim") >= threshold)
    }
  }
}
