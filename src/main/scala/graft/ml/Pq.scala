package graft.ml

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product quantization: the vector-compression path for ANN at 100 TB.
  *
  * A D-dim float vector becomes M small integer codes (one per subspace,
  * each the id of the nearest of K trained centroids) — 64 dims × 8 bytes
  * → 8 codes, a 64× memory cut — and search runs against the codes with
  * asymmetric distance (query stays exact; per-query M×K lookup tables
  * replace the D-dim dot products).
  *
  * Everything is DataFrame-shaped: training explodes vectors into
  * (vec_id, subspace, subvector) rows so all M subspace k-means runs
  * proceed concurrently in one plan per Lloyd round (keyed shuffles, no
  * driver loops over data); only the trained codebook — M×K subvectors,
  * metadata scale — ever reaches the driver, where it becomes the literal
  * lookup tables that keep ADC scoring inside WholeStageCodegen.
  */
object Pq {

  /** Explode vectors into (vec_id, m, sv) subvector rows. */
  private def subvectors(corpus: DataFrame, m: Int, dsub: Int): DataFrame =
    corpus.select(col("vec_id"), explode(array((0 until m).map(i =>
      struct(lit(i).as("m"), slice(col("v"), i * dsub + 1, dsub).as("sv"))): _*)).as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.sv").as("sv"))

  private def l2sq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** Train codebooks: Lloyd's k-means per subspace, deterministic init
    * (the K lowest vec_ids' subvectors). Returns (m, k, cent).
    *
    * Training caps at `trainCap` × K vectors past that size — same
    * deterministic hash-filter sample (and same two rationales) as
    * [[AnnOps.kmeansCells]]: Lloyd cost stops growing with the corpus,
    * and the build-time qerr snapshot (encoded over the FULL corpus)
    * then measures held-out reconstruction quality, keeping the drift
    * monitor's in-distribution baseline honest. At-or-under-cap corpora
    * (every correctness gate) train on every row, unchanged.
    *
    * The default cap is 4× the coarse quantizer's: a codebook centroid
    * sees only a D/M-dim slice and ADC ranking error COMPOUNDS across
    * the M subspaces, so PQ recall is far more sample-sensitive — at
    * the sf1 rung, a 256×K codebook sample read default-frac recall
    * 0.59 where full training reads 0.73.
    */
  def train(corpus: DataFrame, m: Int = 8, k: Int = 16, iters: Int = 3,
      trainCap: Int = 1024): DataFrame = {
    val dim = corpus.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by $m subspaces")
    val dsub = dim / m
    val capRows = trainCap.toLong * k
    val n = corpus.count()
    // stride sampling only past 2× the cap, keeping the sample at or
    // above capRows — see AnnOps.kmeansCells's undershoot note
    val tcorp = if (trainCap > 0 && n >= 2 * capRows) {
      corpus.filter(pmod(xxhash64(col("vec_id")), lit(n / capRows)) === 0)
    } else corpus
    val sub = subvectors(tcorp, m, dsub)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // deterministic init WITHOUT a per-subspace sort window (a
    // Window.partitionBy("m") funnels each subspace's ENTIRE corpus
    // through one task just to pick k seed rows): the K lowest vec_ids
    // come from a bounded TakeOrdered (orderBy + limit), and each id's
    // rank becomes its centroid index via a literal map — k is
    // codebook-sized, so the collect is driver-safe. Same seeds, same
    // indexes as the old window form.
    val initIds = tcorp.select("vec_id").orderBy("vec_id").limit(k)
      .collect().map(_.getLong(0))
    val idIdx = map(initIds.zipWithIndex.flatMap { case (id, i) =>
      Seq(lit(id), lit(i)) }: _*)
    var cents = sub
      .filter(col("vec_id").isin(initIds.map(_.asInstanceOf[Any]): _*))
      .select(col("m"), element_at(idIdx, col("vec_id")).as("k"),
        col("sv").as("cent"))
    for (_ <- 0 until iters) {
      val assigned = sub.join(broadcast(cents), Seq("m"))
        .select(col("vec_id"), col("m"), col("sv"),
          struct(l2sq(col("sv"), col("cent")).as("d2"), col("k").as("k")).as("dk"))
        .groupBy("vec_id", "m")
        .agg(first("sv").as("sv"), min("dk").as("best"))
        .select(col("m"), col("best.k").as("k"), col("sv"))
      cents = assigned
        .select(col("m"), col("k"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy("m", "k", "pos").agg(avg("x").as("c"))
        .groupBy("m", "k")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
          p => p.getField("c")).as("cent"))
    }
    // land the trained codebook in a LOCAL frame: M×K rows is metadata
    // scale, consumers stop re-deriving the Lloyd's lineage, and nothing
    // stays persisted after the call (the old persist leaked one cached
    // codebook per invocation; its eager count() job is gone too)
    val spark = corpus.sparkSession
    val out = spark.createDataFrame(
      java.util.Arrays.asList(cents.collect(): _*), cents.schema)
    sub.unpersist()
    out
  }

  /** Encode every vector as its M nearest-centroid codes: (vec_id, codes). */
  def encode(corpus: DataFrame, cents: DataFrame): DataFrame =
    encodeWithError(corpus, cents).drop("qerr")

  /** [[encode]] plus the per-vector QUANTIZATION ERROR: (vec_id, codes,
    * qerr) where qerr is the L2² distance between the vector and its PQ
    * reconstruction — the subspaces are disjoint, so the sum of the M
    * per-subspace min distances IS the full reconstruction error, free in
    * the same aggregation that picks the codes. The error is only
    * computable while the raw vector is in hand (encode/append time);
    * persisting it per row is what lets [[IvfPq.health]] measure codebook
    * drift later from the codes-only store, no corpus access.
    */
  private[ml] def encodeWithError(corpus: DataFrame, cents: DataFrame): DataFrame = {
    val m = cents.agg(max("m")).head().getInt(0) + 1
    val dim = corpus.select(size(col("v"))).head().getInt(0)
    val sub = subvectors(corpus, m, dim / m)
    sub.join(broadcast(cents), Seq("m"))
      .select(col("vec_id"), col("m"),
        struct(l2sq(col("sv"), col("cent")).as("d2"), col("k").as("k")).as("dk"))
      .groupBy("vec_id", "m").agg(min("dk").as("best"))
      .select(col("vec_id"), col("m"), col("best.k").as("code"),
        col("best.d2").as("d2"))
      .groupBy("vec_id")
      .agg(transform(array_sort(collect_list(struct(col("m"), col("code")))),
        p => p.getField("code")).as("codes"),
        sum("d2").as("qerr"))
  }

  /** Asymmetric-distance top-kNN: exact query subvectors against the
    * codebook produce per-query M×K distance tables (driver-built literal
    * metadata), then every corpus item scores with M array lookups — a
    * single codegen'd expression, no vector math per pair.
    */
  /** Per-query M×K ADC lookup tables as a tiny broadcastable DataFrame
    * (q_id, table). Codebook and queries are metadata scale; the tables
    * are what let the corpus pass run on codes alone.
    *
    * BOUNDED-QUERY CONTRACT: this collects the query set to the driver
    * (each per-query table is built in a driver loop) — right for
    * interactive query sets, wrong for million-query batches. Large
    * batches go through [[queryTablesDistributed]] /
    * [[searchTopKDistributed]], which build the same tables executor-side.
    */
  private[ml] def queryTables(cents: DataFrame, queries: DataFrame): DataFrame = {
    val spark = cents.sparkSession
    // codebook to driver: M×K×dsub doubles — metadata scale
    val book: Map[(Int, Int), Array[Double]] = cents.collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        r.getSeq[Double](2).toArray).toMap
    val m = book.keys.map(_._1).max + 1
    val k = book.keys.map(_._2).max + 1
    val dsub = book.head._2.length
    val qRows = queries.select(col("vec_id").as("q_id"), col("v")).collect().map { r =>
      val v = r.getSeq[Double](1).toArray
      val table: Seq[Seq[Double]] = (0 until m).map { mi =>
        (0 until k).map { ki =>
          val c = book((mi, ki))
          var d = 0.0
          var i = 0
          while (i < dsub) { val t = v(mi * dsub + i) - c(i); d += t * t; i += 1 }
          d
        }
      }
      Row(r.getLong(0), table)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(qRows.toSeq, 1),
      StructType(Seq(StructField("q_id", LongType),
        StructField("table", ArrayType(ArrayType(DoubleType))))))
  }

  /** Reconstruct each coded vector's PQ APPROXIMATION — the concatenation
    * of its M chosen centroids: (vec_id, v). The approximation is within
    * sqrt(qerr) L2 of the original by construction, which is what makes
    * it usable for COARSE-quantizer maintenance ([[IvfPq.splitMerge]]'s
    * cell re-clustering) on a store that keeps no raw vectors: cell
    * centroids are means over many reconstructions, so the per-vector
    * error largely averages out.
    */
  private[ml] def decode(codes: DataFrame, cents: DataFrame): DataFrame = {
    val book = cents.select(col("m").as("_m"), col("k").as("_k"), col("cent"))
    codes.select(col("vec_id"), posexplode(col("codes")).as(Seq("m", "code")))
      .join(broadcast(book),
        col("m") === col("_m") && col("code").cast("int") === col("_k"))
      .groupBy("vec_id")
      .agg(flatten(transform(array_sort(collect_list(struct(col("m"), col("cent")))),
        p => p.getField("cent"))).as("v"))
  }

  /** The codegen'd ADC score: M array lookups summed. */
  private[ml] def adcDist = aggregate(
    zip_with(col("codes"), col("table"),
      (c, row) => element_at(row, c.cast("int") + 1)),
    lit(0.0), (acc, x) => acc + x)

  /** Executor-side ADC tables: the same (q_id, table) rows as
    * [[queryTables]] — bit-identical doubles, both fold subvector
    * differences in index order — but built entirely in-plan, so queries
    * never reach the driver. The codebook (M×K rows, genuine metadata)
    * broadcasts; each query row scores against every centroid through
    * codegen'd array ops, then two keyed aggregations (query-set scale)
    * assemble the M×K table per query.
    */
  private[ml] def queryTablesDistributed(cents: DataFrame,
      queries: DataFrame): DataFrame = {
    // The table rows are assembled POSITIONALLY (array_sort over collected
    // (k, d2) / (m, trow) pairs), so a sparse codebook — e.g. Lloyd's
    // groupBy dropping a cluster that attracted no points — would shift
    // every later entry and make element_at return silently wrong
    // distances. Fail loudly instead: every (m, k) in [0,M)×[0,K) must be
    // present exactly once. The check (and the dsub the slice needs) rides
    // the plan as a 1-row broadcast stats frame — the sqTopK pattern — so
    // CONSTRUCTING the tables launches zero Spark jobs; a sparse codebook
    // raises at execution instead (metadata-scale frame, evaluated once).
    val mk = (max(col("m")) + 1).cast("long") * (max(col("k")) + 1)
    val stats = cents.agg(mk.as("mk"), count(lit(1)).as("cnt"),
      countDistinct(col("m"), col("k")).as("dcnt"),
      first(size(col("cent"))).as("dsub0"))
    val checked = stats.select(
      when(col("cnt") === col("mk") && col("dcnt") === col("mk"), col("dsub0"))
        .otherwise(raise_error(format_string(
          "PQ codebook not dense: %d rows (%d distinct (m,k)) for M*K=%d; " +
            "retrain with more data or smaller k",
          col("cnt"), col("dcnt"), col("mk")))).as("dsub"))
    queries.select(col("vec_id").as("q_id"), col("v"))
      .crossJoin(broadcast(cents)) // |Q| × (M×K tiny codebook)
      .crossJoin(broadcast(checked)) // 1 row: density witness + dsub
      .select(col("q_id"), col("m"), col("k"),
        l2sq(slice(col("v"), (col("m") * col("dsub") + 1).cast("int"),
          col("dsub")), col("cent")).as("d2"))
      .groupBy("q_id", "m")
      .agg(transform(array_sort(collect_list(struct(col("k"), col("d2")))),
        p => p.getField("d2")).as("trow"))
      .groupBy("q_id")
      .agg(transform(array_sort(collect_list(struct(col("m"), col("trow")))),
        p => p.getField("trow")).as("table"))
  }

  /** Distributed-query ADC search: same ranking as [[searchTopK]]
    * (d2 asc, n_id asc) but the query side stays a DataFrame end to end —
    * block-partitioned against the code table exactly like
    * [[graft.ml.AnnOps.bruteForceTopKDistributed]], with bounded
    * [[graft.functions.topkPairs]] heaps (keyed on -d2 so "best" = lowest
    * distance) instead of a rank window. Driver memory flat in |Q|.
    */
  def searchTopKDistributed(codes: DataFrame, cents: DataFrame,
      queries: DataFrame, topK: Int, blocks: Int = 0): DataFrame = {
    import graft.functions.topkPairs
    val p = if (blocks > 0) blocks
      else codes.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val c = codes.select(col("vec_id").as("n_id"), col("codes"),
      pmod(xxhash64(col("vec_id")), lit(p.toLong)).cast("int").as("cb"))
    val q = queryTablesDistributed(cents, queries)
      .withColumn("cb", explode(sequence(lit(0), lit(p - 1))))
    c.join(q.hint("shuffle_hash"), Seq("cb"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), adcDist.as("d2"))
      .groupBy("q_id")
      .agg(topkPairs(negate(col("d2")), col("n_id"), topK).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("rk0", "t")))
      .select(col("q_id"), col("t.n_id").as("n_id"),
        negate(col("t.sim")).as("d2"), (col("rk0") + 1).cast("int").as("rk"))
  }

  def searchTopK(codes: DataFrame, cents: DataFrame, queries: DataFrame,
      topK: Int): DataFrame = {
    import graft.functions.topkPairs
    // bounded per-partition heaps on negate(d2) — the (d2 asc, n_id asc)
    // ranking without a per-query global-sort window (the
    // searchTopKDistributed shape, broadcast-query variant)
    val qDf = queryTables(cents, queries)
    codes.select(col("vec_id").as("n_id"), col("codes"))
      .join(broadcast(qDf), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), adcDist.as("d2"))
      .groupBy("q_id")
      .agg(topkPairs(negate(col("d2")), col("n_id"), topK).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("rk0", "t")))
      .select(col("q_id"), col("t.n_id").as("n_id"),
        negate(col("t.sim")).as("d2"), (col("rk0") + 1).cast("int").as("rk"))
  }

  /** The production two-stage search: ADC shortlists `shortlist`
    * candidates from the compressed codes (the only full-corpus pass —
    * code lookups, no vector math), then the shortlist alone re-ranks
    * with exact cosine against the uncompressed vectors. Accuracy is the
    * codebook's recall@shortlist; cost is the compressed scan plus
    * `shortlist × queries` exact distances.
    *
    * `shortlist <= 0` (the DEFAULT, r16 — the same flip
    * [[graft.ml.IvfPqIndex.search]] made) sizes the shortlist as a
    * corpus FRACTION in-plan via [[searchWithRerankFrac]] (|C|/20 = 5%,
    * floor 50): a fixed cutoff's recall decays as the corpus grows, the
    * q_ann_pq lesson.
    */
  def searchWithRerank(codes: DataFrame, cents: DataFrame, corpus: DataFrame,
      queries: DataFrame, topK: Int, shortlist: Int = 0): DataFrame =
    if (shortlist <= 0) searchWithRerankFrac(codes, cents, corpus, queries, topK, 20)
    else rerank(searchTopK(codes, cents, queries, shortlist).select("q_id", "n_id"),
      corpus, queries, topK)

  /** [[searchWithRerank]] with the shortlist sized as a CORPUS FRACTION
    * (|C| / denom, floor 50) computed inside the plan — a 1-row count
    * aggregate feeding topk_pairs' dynamic bound — so callers need no
    * driver-side `count()` job to apply the "shortlist scales with the
    * corpus" rule (see the q_ann_pq rationale).
    */
  def searchWithRerankFrac(codes: DataFrame, cents: DataFrame, corpus: DataFrame,
      queries: DataFrame, topK: Int, denom: Int = 10): DataFrame = {
    import graft.functions.topkPairsDyn
    val qDf = queryTables(cents, queries)
    val cstats = codes.groupBy().agg(count(lit(1)).as("cnt"))
    val sl = greatest(lit(50L), floor(col("cnt") / denom)).cast("int")
    val cand = codes.select(col("vec_id").as("n_id"), col("codes"))
      .crossJoin(broadcast(cstats))
      .join(broadcast(qDf), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), adcDist.as("d2"), sl.as("sl"))
      .groupBy("q_id")
      .agg(topkPairsDyn(negate(col("d2")), col("n_id"), col("sl")).as("top"))
      .select(col("q_id"), explode(col("top.n_id")).as("n_id"))
    rerank(cand, corpus, queries, topK)
  }

  /** Exact-cosine re-rank of a (q_id, n_id) candidate set — the shared
    * bounded-heap tail (rounded sim, (sim desc, n_id asc) ties), not a
    * rank window.
    */
  private def rerank(cand: DataFrame, corpus: DataFrame, queries: DataFrame,
      topK: Int): DataFrame = {
    import graft.functions.{cosine, stableRound, topkPairs}
    cand
      .join(broadcast(queries.select(col("vec_id").as("q_id"), col("v").as("qv"))), Seq("q_id"))
      .join(corpus.select(col("vec_id").as("n_id"), col("v").as("nv")), Seq("n_id"))
      .select(col("q_id"), col("n_id"),
        stableRound(cosine(col("qv"), col("nv")), 4).as("sim"))
      .groupBy("q_id")
      .agg(topkPairs(col("sim"), col("n_id"), topK).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("rk0", "t")))
      .select(col("q_id"), col("t.n_id").as("n_id"), col("t.sim").as("sim"),
        (col("rk0") + 1).cast("long").as("rk"))
  }
}
