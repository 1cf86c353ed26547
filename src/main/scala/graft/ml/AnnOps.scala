package graft.ml

import graft.GQuery
import graft.functions._
import graft.functions.stableRound
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * Three tiers:
  *  - brute-force cosine top-k: the exactness baseline. The (small) query
  *    set broadcasts; the corpus streams — no shuffle of the corpus, a
  *    per-partition partial top-k then a tiny global top-k.
  *  - LSH (random hyperplanes): signature bucketing bounds the candidate
  *    set; recall tested against brute force in AnnSpec.
  *  - IVF: coarse quantizer (here: per-label centroids, i.e. a trained
  *    partition assignment) → probe nearest cells only. This is the 100 TB
  *    path: cells are pre-partitioned on disk, a probe reads a fraction of
  *    the corpus.
  */
object AnnOps {

  private def corpus(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("v"))

  /** Brute-force cosine top-k for each query vector: the corpus streams
    * against the broadcast query set, and [[graft.functions.topkPairs]]
    * keeps a bounded k-entry heap per (query, partition) on the map side —
    * the exchange carries partitions × queries × k entries, never the full
    * |corpus| × |queries| pair stream a rank window would shuffle. The sim
    * is rounded BEFORE the aggregate so ranking ties resolve exactly like
    * the oracle's `row_number() OVER (ORDER BY sim DESC, n_id ASC)`.
    *
    * BOUNDED-QUERY CONTRACT: `broadcast(q)` materializes the query set on
    * the driver before shipping it — correct and fastest for interactive /
    * dashboard-sized query sets (up to roughly the broadcast threshold).
    * For large query batches use [[bruteForceTopKDistributed]], which
    * keeps queries as a DataFrame end to end and never drives them through
    * driver memory.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("v").as("qv"))
    val c = corpus.select(col("vec_id").as("n_id"), col("v").as("nv"))
    scoredTopK(c.join(broadcast(q), col("q_id") =!= col("n_id")), k)
  }

  /** Shared tail of every exact-search variant: codegen'd cosine, rounded
    * BEFORE the aggregate, bounded per-partition heaps, tiny final merge.
    */
  private[ml] def scoredTopK(pairs: DataFrame, k: Int): DataFrame =
    pairs
      .select(col("q_id"), col("n_id"),
        stableRound(cosine(col("qv"), col("nv")), 4).as("sim"))
      .groupBy("q_id")
      .agg(topkPairs(col("sim"), col("n_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("rk0", "t")))
      .select(col("q_id"), col("t.n_id").as("n_id"), col("t.sim").as("sim"),
        (col("rk0") + 1).cast("long").as("rk"))

  /** Distributed-query exact top-k: the query set stays a DataFrame end to
    * end — never collected to or broadcast from the driver, so driver
    * memory is flat in |Q| (the contract a million-query batch needs).
    *
    * Shape: the corpus hashes into `blocks` buckets on its id; the query
    * set replicates across those buckets through an ordinary shuffle
    * (|Q| × blocks small rows — executor-to-executor, no driver hop), and
    * a shuffled hash join on the bucket id block-partitions the
    * query × corpus product. No cartesian node, no broadcast exchange.
    * The pair stream is scored inside whole-stage codegen and immediately
    * folded into per-partition k-entry heaps ([[topkPairs]]), so the only
    * volume crossing the agg exchange is blocks × |Q| × k.
    */
  def bruteForceTopKDistributed(corpus: DataFrame, queries: DataFrame, k: Int,
      blocks: Int = 0): DataFrame = {
    val p = if (blocks > 0) blocks
      else corpus.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val c = corpus.select(col("vec_id").as("n_id"), col("v").as("nv"),
      pmod(xxhash64(col("vec_id")), lit(p.toLong)).cast("int").as("cb"))
    val q = queries.select(col("vec_id").as("q_id"), col("v").as("qv"))
      .withColumn("cb", explode(sequence(lit(0), lit(p - 1))))
    // build side = the per-bucket query slice (every bucket sees all |Q|
    // queries, the point of the replication); corpus streams through
    scoredTopK(
      c.join(q.hint("shuffle_hash"), Seq("cb")).filter(col("q_id") =!= col("n_id")), k)
  }

  /** A 20×-amplified deterministic query batch derived from the corpus —
    * 10,000 queries at the gate's 500-vector base — each variant an
    * element-wise perturbation a codec-free SQL oracle reproduces exactly.
    */
  private[graft] def batchQueries(corpus: DataFrame): DataFrame =
    corpus.filter(col("vec_id") < 500)
      .withColumn("j", explode(sequence(lit(0L), lit(19L))))
      .select((col("vec_id") * 20 + col("j")).as("vec_id"),
        transform(col("v"), (x, i) =>
          x + (((col("j") * 7 + i * 3) % 11) - 5) * lit(0.05)).as("v"))

  // The 10k-query batch gate: exact top-3 for 10,000 queries against the
  // full corpus through the distributed (no-driver-broadcast) plan,
  // hash-checked against DuckDB. DistributedQuerySpec additionally pins
  // the plan shape (ShuffledHashJoin, zero BroadcastExchange).
  private val qAnnBatch = GQuery(
    "q_ann_batch",
    (s, d) => bruteForceTopKDistributed(corpus(s, d), batchQueries(corpus(s, d)), 3),
    Some("""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                 q AS (SELECT vec_id * 20 + j AS q_id,
                              [v[CAST(i AS INT) + 1]
                               + ((j * 7 + i * 3) % 11 - 5) * CAST(0.05 AS DOUBLE)
                               FOR i IN range(64)] AS v
                       FROM c, (SELECT unnest(range(0, 20)) AS j)
                       WHERE vec_id < 500),
                 p AS (SELECT q.q_id, n.vec_id AS n_id,
                              floor(list_cosine_similarity(q.v, n.v) * 10000 + 0.5) / 10000 AS sim
                       FROM q JOIN c n ON q.q_id <> n.vec_id),
                 r AS (SELECT q_id, n_id, sim,
                              row_number() OVER (PARTITION BY q_id
                                                 ORDER BY sim DESC, n_id ASC) AS rk
                       FROM p)
            SELECT q_id, n_id, sim, CAST(rk AS BIGINT) AS rk FROM r WHERE rk <= 3"""))

  // The bulk-IVF gate (r14 verdict #2): the same 10k-query batch served
  // by the DISTRIBUTED in-plan IVF search — probe frame shuffled on the
  // cell label, exact reference side on the distributed brute-force plan,
  // no query-derived broadcast anywhere — with a pinned recall floor
  // (self-verifying-gate shape). DistributedQuerySpec pins the join
  // strategy; this pins the CORRECTNESS row for the bulk path.
  private val qAnnIvfBatch = GQuery(
    "q_ann_ivf_batch",
    (s, d) => {
      val all = corpus(s, d)
      val qs = batchQueries(all)
      recallSummary(
        recallVsExact(all, qs, 3, ivfTopKDistributed(all, qs, 3, nprobe = 3),
          distributedExact = true),
        0.65, None)
    },
    Some("""SELECT count(*) AS n_queries, true AS avg_recall_ge_065
            FROM embeddings CROSS JOIN (SELECT unnest(range(0, 20)) AS j)
            WHERE vec_id < 500"""))

  private val qAnnTopK = GQuery(
    "q_ann_topk",
    (s, d) => {
      val all = corpus(s, d)
      bruteForceTopK(all, all.filter(col("vec_id") < 20), 5)
    },
    Some("""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                 p AS (SELECT q.vec_id AS q_id, n.vec_id AS n_id,
                              floor(list_cosine_similarity(q.v, n.v) * 10000 + 0.5) / 10000 AS sim
                       FROM c q JOIN c n ON q.vec_id < 20 AND q.vec_id <> n.vec_id),
                 r AS (SELECT q_id, n_id, sim,
                              row_number() OVER (PARTITION BY q_id
                                                 ORDER BY sim DESC, n_id ASC) AS rk
                       FROM p)
            SELECT q_id, n_id, sim, CAST(rk AS BIGINT) AS rk FROM r WHERE rk <= 5"""),
    headline = true)

  /** Multi-table hyperplane-LSH top-k: `tables` independent sign-random
    * projections of `planes` bits each; a query probes its bucket and all
    * 1-bit flips (multi-probe) in every table. Candidate generation is
    * narrow — only (table, sig, id) shuffles; vectors re-join on the
    * deduped candidate pairs. Recall/efficiency tunes with (tables, planes)
    * per the standard cosine-LSH collision model.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      planes: Int = 8, tables: Int = 16): DataFrame = {
    // all tables' signatures in ONE pass over each side via the native
    // HyperplaneSigsExpr (one expression, no 128-literal codegen)
    def allSigs(df: DataFrame, idAs: String): DataFrame =
      df.select(col("vec_id").as(idAs),
        posexplode(graft.functions.HyperplaneSigsExpr
          .hyperplaneSigs(col("v"), planes, tables)).as(Seq("tbl", "sig")))
    val corpusSigs = allSigs(corpus, "n_id")
    val flips = lit(0L) +: (0 until planes).map(b => lit(1L << b))
    val querySigs = allSigs(queries, "q_id")
      .withColumn("sig", explode(array(flips.map(f => col("sig").bitwiseXOR(f)): _*)))
    val cand = corpusSigs.join(broadcast(querySigs), Seq("tbl", "sig"))
      .filter(col("q_id") =!= col("n_id"))
      .select("q_id", "n_id").distinct()
    scoredTopK(
      cand
        .join(queries.select(col("vec_id").as("q_id"), col("v").as("qv")), Seq("q_id"))
        .join(corpus.select(col("vec_id").as("n_id"), col("v").as("nv")), Seq("n_id")),
      k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rk").cast("long").as("rk"))
  }

  /** Per-query recall of `approx` top-k vs exact brute-force top-k, both
    * computed in the same Catalyst plan (the VERDICT-r2 self-verifying-gate
    * shape): the gate's oracle pins a recall floor instead of trusting a
    * rows-only count. Queries with no approx hits get recall 0.
    */
  def recallVsExact(corpus: DataFrame, queries: DataFrame, k: Int,
      approx: DataFrame, distributedExact: Boolean = false): DataFrame = {
    // bulk query batches keep the exact side on the distributed plan too
    // (a 10k-query broadcast defeats the point of auditing the bulk path)
    val exact = (if (distributedExact) bruteForceTopKDistributed(corpus, queries, k)
      else bruteForceTopK(corpus, queries, k)).select(col("q_id"), col("n_id"))
    val hits = exact
      .join(approx.select(col("q_id"), col("n_id")), Seq("q_id", "n_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("hits"))
    queries.select(col("vec_id").as("q_id"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"), (coalesce(col("hits"), lit(0L)) / lit(k.toDouble)).as("recall"))
  }

  /** Collapse per-query recalls to a single oracle-checkable row: the query
    * count plus pinned recall-floor booleans. The floors sit well under the
    * observed recalls at sf0.001/sf0.01 (LSH avg .84/.86 min .60; IVF avg
    * .73/.78; PQ avg .75/.76) so the gate fails only on a real regression.
    */
  private def recallSummary(recall: DataFrame, avgFloor: Double,
      minFloor: Option[Double]): DataFrame = {
    def nm(p: String, t: Double) = f"${p}_recall_ge_${(t * 100).toInt}%03d"
    val cols = Seq(count(lit(1)).as("n_queries"),
      (avg(col("recall")) >= avgFloor).as(nm("avg", avgFloor))) ++
      minFloor.map(t => (min(col("recall")) >= t).as(nm("min", t)))
    recall.agg(cols.head, cols.tail: _*)
  }

  private def recallOracle(avgFloor: Double, minFloor: Option[Double]): String = {
    def nm(p: String, t: Double) = f"${p}_recall_ge_${(t * 100).toInt}%03d"
    val extra = minFloor.map(t => s", true AS ${nm("min", t)}").getOrElse("")
    s"""SELECT count(*) AS n_queries, true AS ${nm("avg", avgFloor)}$extra
        FROM embeddings WHERE vec_id < 20"""
  }

  private val qAnnLsh = GQuery(
    "q_ann_lsh",
    (s, d) => {
      val all = corpus(s, d)
      val qs = all.filter(col("vec_id") < 20)
      recallSummary(recallVsExact(all, qs, 5, lshTopK(all, qs, 5)), 0.75, Some(0.4))
    },
    Some(recallOracle(0.75, Some(0.4))),
    headline = true)

  /** Train a coarse quantizer: Lloyd's k-means over cosine similarity,
    * deterministic init (the k lowest vec_ids), all in DataFrame ops —
    * each iteration is one broadcast-join assign + one mean-reduce.
    *
    * TRAINING SAMPLE CAP (`trainCap` × k rows, the standard coarse-
    * quantizer practice): past the cap the Lloyd iterations run on a
    * deterministic hash-filter sample — a narrow predicate, no shuffle
    * — so training cost stops growing with the corpus (sf100 build
    * dropped ~336 s → ~2 min at 1M vectors / 1000 cells), and, just as
    * important, the build-time stats snapshot (always computed over the
    * FULL corpus) then predominantly measures HELD-OUT assignment
    * quality: the drift monitor's training-overfit gap — which SCALES
    * with the cell count (in-distribution appends read appendDrift
    * 0.065 / 0.088 / 0.16 at cells 100 / 316 / 1000 against
    * full-corpus-trained snapshots, r17 StreamAnnProbe receipts) —
    * self-cancels instead of needing a per-scale driftTol recalibration.
    * Corpora at or under the cap (every correctness gate) train on
    * every row, byte-identical to the uncapped behavior.
    */
  def kmeansCells(corpus: DataFrame, k: Int, iters: Int,
      trainCap: Int = 256): DataFrame = {
    val ss = corpus.sparkSession
    val vType = corpus.schema("v").dataType
    val cap = trainCap.toLong * k
    val n = corpus.count()
    // sample only when the stride keeps the sample AT or ABOVE the cap
    // (n/cap ≥ 2): a fractional stride rounded up would undershoot —
    // observed at the sf1 rung, where a forced 50% sample left 156
    // points/cell (under the 256 floor) and IVF recall fell 0.99 → 0.71
    val train = if (trainCap > 0 && n >= 2 * cap) {
      corpus.filter(pmod(xxhash64(col("vec_id")), lit(n / cap)) === 0)
    } else corpus
    // Deterministic init: the k lowest vec_ids, numbered on the driver —
    // k rows is metadata scale, and it avoids a partition-less global
    // window (the pattern PlanAuditSpec bans).
    val init = train.orderBy("vec_id").limit(k).select("v").collect()
    var cents = ss.createDataFrame(
      java.util.Arrays.asList(init.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row(i + 1, r.get(0))
      }: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("cent", vType))))
    for (it <- 0 until iters) {
      // argmax via the bounded heap (k=1): the shuffle carries one row
      // per VECTOR, not one per vector × cell as the old rank window did
      val assigned = argmaxCell(train, cents)
      cents = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg("x").as("m"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          p => p.getField("m")).as("cent"))
      // Cut the lineage every few rounds (the ClusterOps discipline):
      // without it each iteration's plan nests the previous one's, so a
      // caller passing trainIters=20 re-derives a 20-deep plan per action
      // and analysis cost grows quadratically. The frame is k rows —
      // checkpoint cost is trivial; eager so the cut actually happens here.
      if ((it + 1) % 3 == 0 && it + 1 < iters) cents = cents.localCheckpoint(true)
    }
    cents
  }

  /** Nearest-cell argmax through the bounded heap — the shared kernel of
    * training and assignment. Ranking is (csim desc, cell asc), exactly
    * the old per-vector rank window's order, but the map side reduces to
    * one heap entry per vector so the exchange carries |corpus| rows
    * instead of |corpus| × cells.
    */
  private def argmaxCell(corpus: DataFrame, cents: DataFrame): DataFrame =
    corpus.join(broadcast(cents))
      .select(col("vec_id"), col("v"), col("cell"),
        cosine(col("v"), col("cent")).as("csim"))
      .groupBy("vec_id")
      .agg(first("v").as("v"),
        topkPairs(col("csim"), col("cell").cast("long"), 1).as("pc"))
      .select(col("vec_id"), col("v"),
        element_at(col("pc.n_id"), 1).cast("int").as("cell"))

  /** Assign each corpus vector to its trained cell. */
  def assignCells(corpus: DataFrame, cents: DataFrame): DataFrame =
    argmaxCell(corpus, cents)

  /** IVF with a trained quantizer: probe the `nprobe` nearest cells. At
    * scale the cell assignment is precomputed and the corpus is stored
    * partitioned by cell, so a probe reads only those partitions.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nprobe: Int,
      cells: Int = 10, trainIters: Int = 3): DataFrame =
    ivfTopKImpl(corpus, queries, k, nprobe, cells, trainIters, distributed = false)

  /** [[ivfTopK]] for BULK query batches: the query set stays a DataFrame
    * end to end — the |Q| × nprobe probe frame meets the assigned corpus
    * in a shuffled-hash join on the cell label instead of a driver
    * broadcast (the in-plan sibling of [[graft.ml.IvfIndex
    * .searchDistributed]]; centroids still broadcast — index metadata).
    * Driver memory flat in |Q|; the bounded k-heap tail is shared.
    */
  def ivfTopKDistributed(corpus: DataFrame, queries: DataFrame, k: Int,
      nprobe: Int, cells: Int = 10, trainIters: Int = 3): DataFrame =
    ivfTopKImpl(corpus, queries, k, nprobe, cells, trainIters, distributed = true)

  private def ivfTopKImpl(corpus: DataFrame, queries: DataFrame, k: Int,
      nprobe: Int, cells: Int, trainIters: Int, distributed: Boolean): DataFrame = {
    // local centroid frame (metadata scale) instead of a persist that
    // outlives the call — see ivfPqTopK
    val centsDf = kmeansCells(corpus, cells, trainIters)
    val cents = corpus.sparkSession.createDataFrame(
      java.util.Arrays.asList(centsDf.collect(): _*), centsDf.schema)
    val assigned = assignCells(corpus, cents)
      .withColumnRenamed("cell", "label")
    ivfSearch(assigned, cents.withColumnRenamed("cell", "label"), queries, k,
      nprobe, distributed)
  }

  private def ivfSearch(corpusWithCells: DataFrame, cents: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int,
      distributed: Boolean = false): DataFrame = {
    val corpus = corpusWithCells
    // probe through the bounded heap (label ids as pair ids — the same
    // (csim desc, label asc) ranking the old probe window used)
    val labelType = cents.schema("label").dataType
    // fail fast: the probe routes labels through topk_pairs as longs; a
    // non-numeric label would CAST to null, update() skips null ids, and
    // the search would silently return empty results
    require(labelType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"ivfSearch cell labels must be numeric, got $labelType")
    val cells = queries.select(col("vec_id").as("q_id"), col("v").as("qv"))
      .join(broadcast(cents))
      .select(col("q_id"), col("qv"), col("label"), cosine(col("qv"), col("cent")).as("csim"))
      .groupBy("q_id")
      .agg(first("qv").as("qv"),
        topkPairs(col("csim"), col("label").cast("long"), nprobe).as("pc"))
      .select(col("q_id"), col("qv"),
        explode(col("pc.n_id")).as("_lbl"))
      .select(col("q_id"), col("qv"), col("_lbl").cast(labelType).as("label"))
    // probed-cell scan → shared bounded-heap top-k tail (no rank window).
    // distributed = bulk contract: the probe frame is |Q|-scale, so it
    // must never broadcast — shuffled-hash on the cell label instead
    scoredTopK(
      corpus.select(col("vec_id").as("n_id"), col("label"), col("v").as("nv"))
        .join(if (distributed) cells.hint("shuffle_hash") else broadcast(cells),
          Seq("label"))
        .filter(col("q_id") =!= col("n_id")),
      k)
  }

  private val qAnnIvf = GQuery(
    "q_ann_ivf",
    (s, d) => {
      val all = corpus(s, d)
      val qs = all.filter(col("vec_id") < 20)
      recallSummary(recallVsExact(all, qs, 5, ivfTopK(all, qs, 5, 3)), 0.65, None)
    },
    Some(recallOracle(0.65, None)))

  private val qAnnPq = GQuery(
    "q_ann_pq",
    (s, d) => {
      val all = corpus(s, d).select(col("vec_id"), col("v"))
      val qs = all.filter(col("vec_id") < 20)
      // PQ/ADC ranks by L2 but the search target is cosine: on raw
      // vectors the two orderings diverge as the corpus grows (recall
      // fell under the floor at sf0.1). Unit-normalizing before
      // train/encode makes L2² = 2·(1−cos) — the SAME ordering — which
      // is the standard normalize-then-PQ design for cosine ANN. The
      // rerank corpus stays raw (cosine is scale-invariant).
      val allN = all.select(col("vec_id"), l2normalize(col("v")).as("v"))
      val qsN = qs.select(col("vec_id"), l2normalize(col("v")).as("v"))
      val cents = Pq.train(allN, m = 8, k = 16, iters = 2)
      val codes = Pq.encode(allN, cents)
      // Shortlist scales as a corpus fraction (10%): ADC ranking error at
      // a fixed compression budget pushes true neighbors past any FIXED
      // cutoff as the corpus grows; rerank cost stays queries×shortlist.
      // (A 10% rerank is for PQ-alone search at this corpus scale — at
      // billions of vectors PQ always sits behind IVF pruning, ml.IvfPq,
      // where the fraction applies per probed cell.) The fraction is
      // computed in-plan (searchWithRerankFrac) — no driver count() job.
      recallSummary(
        recallVsExact(all, qs, 5,
          Pq.searchWithRerankFrac(codes, cents, all, qsN, 5, 10)),
        0.65, None)
    },
    Some(recallOracle(0.65, None)))

  // ---- IVF+PQ combined: the big-ANN index layout, as one plan -----------
  // The disk-backed index (ml.IvfPq / IvfPqIndex.search) is spec-tested;
  // this gate runs the SAME two-stage search — coarse-cell probe → ADC
  // shortlist over probed cells only → exact cosine re-rank — as a single
  // Catalyst plan with a pinned recall floor, so the combined path has a
  // CORRECTNESS row like its IVF-only (q_ann_ivf) and PQ-only (q_ann_pq)
  // siblings. Per the q_ann_pq lesson both quantizers train on
  // unit-normalized vectors (L2² = 2·(1−cos), same ordering); the re-rank
  // stays raw. The shortlist is a fraction of the PROBED-cell population
  // (nprobe/cells of the corpus), not the whole corpus — the cost shape
  // that makes IVF+PQ the billions-of-vectors layout.
  /** The in-plan IVF+PQ search the gate (and AnnRecallProbe) runs: both
    * quantizers trained on unit-normalized vectors, probe, ADC shortlist
    * restricted to probed cells, exact raw-vector re-rank. Returns the
    * usual (q_id, n_id, sim, rk) top-k frame.
    */
  private[ml] def ivfPqTopK(all: DataFrame, qs: DataFrame, k: Int,
      nprobe: Int = 3, cells: Int = 10): DataFrame = {
    val spark = all.sparkSession
    val allN = all.select(col("vec_id"), l2normalize(col("v")).as("v"))
    val qsN = qs.select(col("vec_id"), l2normalize(col("v")).as("v"))
    // Land the trained centroids in a LOCAL frame: `cells` rows is
    // metadata scale (kmeansCells itself collects that many for init),
    // downstream consumers stop re-deriving the Lloyd's lineage, and —
    // unlike the r12 persist — nothing stays cached after the call
    // (repeated bench invocations used to accumulate centroid blocks).
    val centsDf = kmeansCells(allN, cells, 2)
    val cents = spark.createDataFrame(
      java.util.Arrays.asList(centsDf.collect(): _*), centsDf.schema)
    val assigned = assignCells(allN, cents) // vec_id, v, cell
    val book = Pq.train(allN, m = 8, k = 16, iters = 2)
    val codes = Pq.encode(allN, book)
      .join(assigned.select(col("vec_id"), col("cell")), Seq("vec_id"))
    // probe: nprobe nearest cells per query against the broadcast
    // centroids, through the bounded heap (cell ids as pair ids — same
    // (csim desc, cell asc) ranking the old probe window used); one row
    // per query carrying its (normalized) vector and probed-cell list
    val probed = qsN.select(col("vec_id").as("q_id"), col("v"))
      .join(broadcast(cents))
      .select(col("q_id"), col("v"), col("cell"),
        cosine(col("v"), col("cent")).as("csim"))
      .groupBy("q_id")
      .agg(first("v").as("v"),
        topkPairs(col("csim"), col("cell").cast("long"), nprobe).as("pc"))
      .select(col("q_id"), col("v"),
        transform(col("pc"), p => p.getField("n_id").cast("int")).as("cells"))
    // ADC shortlist over probed cells only: a code row scores against a
    // query iff its cell is in that query's probe set (the in-plan form
    // of the disk index's partition pruning). The shortlist BOUND — a
    // fraction of the probed population — rides the plan as a 1-row
    // broadcast stats frame feeding topk_pairs' dynamic k: no driver
    // count() job, and no per-query global-sort window (the map side
    // reduces to bounded heaps; negate(d2) reuses the (d2 asc, n_id asc)
    // ranking, the searchTopKDistributed pattern).
    val cstats = all.groupBy().agg(count(lit(1)).as("cnt"))
    val sl = greatest(lit(50L),
      floor(col("cnt") * nprobe / cells / 10)).cast("int")
    val qDf = Pq.queryTables(book, probed.select(col("q_id").as("vec_id"), col("v")))
      .join(probed.select(col("q_id"), col("cells")), Seq("q_id"))
    val cand = codes.select(col("vec_id").as("n_id"), col("codes"), col("cell"))
      .crossJoin(broadcast(cstats))
      .join(broadcast(qDf), array_contains(col("cells"), col("cell")) &&
        col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), Pq.adcDist.as("d2"), sl.as("sl"))
      .groupBy("q_id")
      .agg(topkPairsDyn(negate(col("d2")), col("n_id"), col("sl")).as("top"))
      .select(col("q_id"), explode(col("top.n_id")).as("n_id"))
    // exact re-rank of the shortlist on the raw vectors — the shared
    // bounded-heap tail, not a rank window
    scoredTopK(
      cand
        .join(broadcast(qs.select(col("vec_id").as("q_id"), col("v").as("qv"))), Seq("q_id"))
        .join(all.select(col("vec_id").as("n_id"), col("v").as("nv")), Seq("n_id")),
      k)
  }

  // ---- SQ8 scalar quantization: the bandwidth tier ----------------------
  // Per-dimension affine uint8 codes (the FAISS SQ8 layout): train is one
  // min/max pass reduced to a single broadcastable stats row; encode is an
  // in-row transform. The 100 TB story is I/O: the persisted codes table
  // is 1 byte/dim vs 8 for float64 — the shortlist pass scans 8× less —
  // while 8-bit quantization error is small enough that a corpus-fraction
  // shortlist + exact re-rank recovers near-exact recall (vs PQ's lossier
  // sub-quantizers, which trade more recall for 1 byte per SUBSPACE).

  /** Train: per-dimension [min,max] over the corpus, reduced to ONE row of
    * (mins, maxs) arrays — metadata-scale, broadcastable like a codebook.
    * The corpus COUNT rides along in the same pass (every dimension
    * appears once per corpus row, so any per-dimension count IS |C|):
    * that is what lets the search size its corpus-fraction shortlist
    * in-plan instead of with a driver `count()` job.
    */
  private[ml] def sqStats(corpus: DataFrame): DataFrame =
    corpus.select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("pos").agg(min("x").as("mn"), max("x").as("mx"),
        count(lit(1)).as("n"))
      .groupBy()
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("mn")))),
          p => p.getField("mn")).as("mins"),
        transform(array_sort(collect_list(struct(col("pos"), col("mx")))),
          p => p.getField("mx")).as("maxs"),
        max(col("n")).as("cnt"))

  /** Encode: half-up affine uint8 code per dimension; a degenerate
    * dimension (max == min) codes to 0 and decodes back to its min.
    */
  private[ml] def sqEncode(corpus: DataFrame, stats: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(stats))
      .select(col("vec_id"),
        transform(col("v"), (x, i) => {
          val mn = element_at(col("mins"), i + 1)
          val mx = element_at(col("maxs"), i + 1)
          when(mx > mn, floor((x - mn) / (mx - mn) * 255.0 + 0.5))
            .otherwise(0.0).cast("int")
        }).as("codes"))

  /** SQ8 search: shortlist by cosine of the DEQUANTIZED codes against the
    * raw query (deterministic — codes and stats are exact functions of the
    * corpus), then the usual exact re-rank of the shortlist on raw
    * vectors. Shortlist scales as a corpus fraction, per the q_ann_pq
    * rationale.
    */
  def sqTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val stats = sqStats(corpus)
    val codes = sqEncode(corpus, stats)
    val deq = transform(col("codes"), (c, i) => {
      val mn = element_at(col("mins"), i + 1)
      val mx = element_at(col("maxs"), i + 1)
      mn + c * (mx - mn) / 255.0
    })
    // corpus-fraction shortlist through the bounded per-partition heaps:
    // the bound comes from the stats row's cnt (same broadcast the
    // dequantize already rides), so there is no driver count() job and no
    // per-query global-sort window — the exchange carries partitions ×
    // queries × bound entries at most, and each reducer streams its
    // merge in O(n log bound) instead of sorting the corpus per query.
    val sl = greatest(lit(50L), floor(col("cnt") / 10)).cast("int")
    val cand = codes.crossJoin(broadcast(stats))
      .join(broadcast(queries.select(col("vec_id").as("q_id"), col("v").as("qv"))),
        col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        stableRound(cosine(deq, col("qv")), 4).as("asim"), sl.as("sl"))
      .groupBy("q_id")
      .agg(topkPairsDyn(col("asim"), col("n_id"), col("sl")).as("top"))
      .select(col("q_id"), explode(col("top.n_id")).as("n_id"))
    // exact re-rank of the shortlist on raw vectors — shared heap tail
    scoredTopK(
      cand
        .join(broadcast(queries.select(col("vec_id").as("q_id"), col("v").as("qv"))), Seq("q_id"))
        .join(corpus.select(col("vec_id").as("n_id"), col("v").as("nv")), Seq("n_id")),
      k)
  }

  private val qAnnSq = GQuery(
    "q_ann_sq",
    (s, d) => {
      val all = corpus(s, d).select(col("vec_id"), col("v"))
      val qs = all.filter(col("vec_id") < 20)
      recallSummary(recallVsExact(all, qs, 5, sqTopK(all, qs, 5)), 0.85, None)
    },
    Some(recallOracle(0.85, None)))

  private val qAnnIvfPq = GQuery(
    "q_ann_ivfpq",
    (s, d) => {
      val all = corpus(s, d).select(col("vec_id"), col("v"))
      val qs = all.filter(col("vec_id") < 20)
      // floor 0.50 under the observed 0.61–0.79 avg band (sf0.001/0.01/
      // 0.1/1: .67/.73/.61/.79, AnnRecallProbe) — fails only on a real
      // regression, same margin discipline as the IVF/PQ siblings
      recallSummary(recallVsExact(all, qs, 5, ivfPqTopK(all, qs, 5)), 0.50, None)
    },
    Some(recallOracle(0.50, None)))

  // ---- vector utilities as oracled gates --------------------------------
  // Per-row array math (norms, unit-normalization): identical sequential
  // fold order on both engines, so values agree to well under the 1e-4
  // rounding. Scan-speed, no shuffle.
  private val qEmbedNorm = GQuery(
    "q_embed_norm",
    (s, d) => {
      val v = col("embedding").cast("array<double>")
      // exploded to scalar rows: the driver's compare hashes scalar
      // columns, not arrays
      embeddings(s, d)
        .select(col("vec_id"), stableRound(l2norm(v), 4).as("norm"),
          posexplode(transform(l2normalize(v),
            x => floor(x * 1e4 + 0.5) / 1e4)).as(Seq("pos0", "x")))
        .select(col("vec_id"), col("norm"),
          (col("pos0") + 1).cast("long").as("pos"), col("x"))
    },
    Some("""WITH e AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                     sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
                       x -> x * x), 'sum')) AS n
              FROM embeddings),
            u AS (
              SELECT vec_id, n,
                     CASE WHEN n = 0 THEN v
                          ELSE list_transform(v, x -> x / n) END AS unit
              FROM e)
            SELECT vec_id, floor(n * 10000 + 0.5) / 10000 AS norm,
                   CAST(generate_subscripts(unit, 1) AS BIGINT) AS pos,
                   floor(unnest(unit) * 10000 + 0.5) / 10000 AS x
            FROM u"""))

  /** Scale-path mean pooling: explode to (key, pos, x), two-phase avg per
    * dimension, reassemble the (dimension-bounded) centroid array. Unlike
    * the collect_list fold in [[qMeanPool]] — which exists because the
    * ORACLE needs a deterministic float-accumulation order — this shape
    * partial-aggregates before the shuffle and never materializes a
    * per-key vector list, so it survives millions of vectors per key.
    */
  def meanPoolByKey(df: DataFrame, keyCol: String, vecCol: String): DataFrame =
    df.select(col(keyCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(keyCol, "pos").agg(avg("x").as("m"))
      .groupBy(keyCol)
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        p => p.getField("m")).as("centroid"))

  // Mean-pooling per label: vectors are sorted by vec_id before the fold
  // so both engines accumulate in the same order (floating addition is
  // order-sensitive; the sort makes the result engine-independent).
  // 100 TB note: the oracle gate uses the deterministic collect_list fold;
  // production at scale should use [[meanPoolByKey]] (asserted equal in
  // TopKSpec up to float-reassociation error).
  private val qMeanPool = GQuery(
    "q_mean_pool",
    (s, d) => {
      val v = col("embedding").cast("array<double>")
      embeddings(s, d)
        .select(col("label").cast("long").as("label"),
          struct(col("vec_id"), v.as("v")).as("sv"))
        .groupBy("label")
        .agg(array_sort(collect_list(col("sv"))).as("svs"))
        .select(col("label"),
          posexplode(transform(meanPool(transform(col("svs"), s => s.getField("v"))),
            x => floor(x * 1e4 + 0.5) / 1e4)).as(Seq("pos0", "x")))
        .select(col("label"), (col("pos0") + 1).cast("long").as("pos"), col("x"))
    },
    Some("""WITH e AS (
              SELECT CAST(label AS BIGINT) AS label, vec_id,
                     CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings),
            g AS (
              SELECT label, list(v ORDER BY vec_id) AS vs FROM e GROUP BY label),
            m AS (
              SELECT label,
                     list_transform(
                       reduce(vs, (a, b) -> list_transform(range(1, len(a) + 1),
                                                           i -> a[i] + b[i])),
                       x -> x / len(vs)) AS c
              FROM g)
            SELECT label, CAST(generate_subscripts(c, 1) AS BIGINT) AS pos,
                   floor(unnest(c) * 10000 + 0.5) / 10000 AS x
            FROM m"""))

  // Nearest-centroid assignment (embedding-space labeling / outlier
  // screening): label centroids via the deterministic sorted fold (same
  // engine-independent accumulation as q_mean_pool), then every vector
  // scores against the broadcast centroid table and takes the argmax.
  // One broadcast join + per-vector argmax — the corpus never shuffles.
  private val qCentroidAssign = GQuery(
    "q_centroid_assign",
    (s, d) => {
      val e = embeddings(s, d).select(col("vec_id"),
        col("label").cast("long").as("label"),
        col("embedding").cast("array<double>").as("v"))
      val cents = e
        .select(col("label"), struct(col("vec_id"), col("v")).as("sv"))
        .groupBy("label").agg(array_sort(collect_list(col("sv"))).as("svs"))
        .select(col("label").as("c_label"),
          meanPool(transform(col("svs"), sv => sv.getField("v"))).as("cent"))
      // per-vector argmax through the bounded heap (k=1): (sim desc,
      // c_label asc) ranking, identical rows to the old rank window but
      // one shuffled row per VECTOR instead of one per vector × centroid
      e.join(broadcast(cents))
        .select(col("vec_id"), col("label"), col("c_label"),
          stableRound(cosine(col("v"), col("cent")), 4).as("sim"))
        .groupBy("vec_id")
        .agg(first("label").as("true_label"),
          topkPairs(col("sim"), col("c_label"), 1).as("pc"))
        .select(col("vec_id"), col("true_label"),
          element_at(col("pc.n_id"), 1).as("assigned_label"),
          element_at(col("pc.sim"), 1).as("sim"),
          (col("true_label") === element_at(col("pc.n_id"), 1)).as("is_match"))
    },
    Some("""WITH e AS (
              SELECT vec_id, CAST(label AS BIGINT) AS label,
                     CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings),
            g AS (SELECT label, list(v ORDER BY vec_id) AS vs FROM e GROUP BY label),
            c AS (
              SELECT label AS c_label,
                     list_transform(
                       reduce(vs, (a, b) -> list_transform(range(1, len(a) + 1),
                                                           i -> a[i] + b[i])),
                       x -> x / len(vs)) AS cent
              FROM g),
            p AS (
              SELECT e.vec_id, e.label, c.c_label,
                     floor(list_cosine_similarity(e.v, c.cent) * 10000 + 0.5) / 10000 AS sim
              FROM e CROSS JOIN c),
            r AS (
              SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY sim DESC, c_label ASC) AS rk
              FROM p)
            SELECT vec_id, label AS true_label, c_label AS assigned_label,
                   sim, label = c_label AS is_match
            FROM r WHERE rk = 1"""))

  val queries: Seq[GQuery] =
    Seq(qAnnTopK, qAnnBatch, qAnnIvfBatch, qAnnLsh, qAnnIvf, qAnnPq, qAnnIvfPq, qAnnSq,
      qEmbedNorm, qMeanPool, qCentroidAssign)
}
