package graft.ml

import graft.GQuery
import graft.functions._
import graft.functions.stableRound
import graft.sources.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * and embedding-cosine near-dup.
  *
  * Scale design: every near-dup variant is *candidate-generation by
  * bucketing* (explode band keys → shuffle on bucket → pairs within bucket)
  * so the cross-product never materializes. At 100 TB the only quadratic
  * term is within-bucket, bounded by band tuning; skewed buckets are handled
  * by AQE skew-join splitting plus an explicit per-bucket size cap.
  */
object DedupOps {

  // ---- exact dedup: content-hash groupBy --------------------------------
  private val qDedupExact = GQuery(
    "q_dedup_exact",
    (s, d) =>
      documents(s, d)
        .groupBy(md5(col("text")).as("h"))
        .agg(min("doc_id").cast("long").as("keep_id"),
          count(lit(1)).as("n_copies")),
    Some("""SELECT md5(text) AS h, CAST(min(doc_id) AS BIGINT) AS keep_id,
                   count(*) AS n_copies
            FROM documents GROUP BY 1"""),
    headline = true)

  /** Shared doc→signature prep. k=32 hashes, 8 bands × 4 rows. Native
    * one-pass expressions on both stages: the fused shingle-hash replaces
    * the interpreted `shingleHashes(shingles(tokens(…)))` chain, and the
    * signature runs k permutations as one loop instead of the k-copy
    * `array(array_min(transform(…)) × k)` tree (TextExprsSpec /
    * MinHashExprsSpec pin value parity).
    */
  private[ml] def minhashed(df: DataFrame, k: Int = 32): DataFrame =
    df.select(
      col("doc_id"),
      TextExprs.shingleHashesNative(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", MinHashExprs.minhashSigNative(col("sh"), k))

  /** MinHash-LSH candidate pairs with exact-jaccard verification.
    * Pipeline: shingle → minhash sig → band keys → explode → within-bucket
    * candidate pairs → verify jaccard on shingle sets.
    *
    * Plan shape matters at scale:
    *  - the signature base is persisted — without the barrier Catalyst
    *    inlines the k-permutation minhash expression into all 8 band keys
    *    on every candidate-generation branch (a ~500× recompute measured
    *    at sf0.1);
    *  - band rows carry only (band, bucket, doc_id) — the shingle arrays
    *    never enter the exploded candidate shuffle, and candidate pairs
    *    expand IN-ROW from one bucket-membership aggregation (r18: the
    *    former window-capped sort-merge self-join read that exchange twice
    *    and sorted it twice for the same pair multiset);
    *  - verification re-joins the (doc_id, shingles) base once per side on
    *    the deduped candidate pairs only.
    *
    * NOTE: with `prime = true` (the execution default) this is
    * SIDE-EFFECTING — it runs one Spark job to materialize the persisted
    * signature base before returning the plan, and the base stays cached
    * (MEMORY_AND_DISK) for the returned DataFrame's lifetime; Spark's LRU
    * eviction reclaims the blocks under pressure. Plan-only consumers
    * (explain, plan audits, composing callers that may never execute)
    * should pass `prime = false` to get a pure lazy plan.
    */
  def minhashPairs(docs: DataFrame, threshold: Double,
      maxBucket: Int = 1000, prime: Boolean = true): DataFrame = {
    // Band keys come from the fused native MinHashBandsExpr (one pass from
    // shingle hashes; MinHashExprsSpec pins it value-identical to
    // lshBands(minhashSignature(sh, 32), 8, 4)): the 32-long signature
    // column existed ONLY to feed the interpreted lshBands HOF chain
    // (slice+transform+array_join per band), so the persisted base now
    // carries 8 (band, bucket) structs instead of sig + that per-band
    // interpreted walk. Identical buckets → identical candidates → the
    // same pairs, byte for byte.
    val base = docs.select(
      col("doc_id"),
      TextExprs.shingleHashesNative(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("bks", MinHashExprs.minhashBands(col("sh"), 32, 8))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Prime the cache with ONE pass before the plan fans out: AQE runs the
    // downstream branches (band explode + two verification joins) as
    // concurrent jobs, and when the persisted base is not yet materialized
    // they RACE — every branch schedules a full set of scan tasks that
    // then serialize on the per-block cache locks, a convoy that occupies
    // slots×branches task slots to do one branch's work (QueryProfile: 4
    // near-identical materialization stages per cold run). One eager pass
    // is strictly cheaper at any scale than branches racing for it.
    if (prime) base.count()
    val allBands = base
      .select(col("doc_id"), explode(col("bks")).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    // Per-bucket size cap: a bucket of n members yields n² candidate pairs,
    // so one pathological bucket (mass-duplicated boilerplate all sharing a
    // signature) can dominate the whole job. Buckets past the cap are
    // dropped from NEAR-dup candidate generation — their members are
    // near-identical by construction and exact dedup already collapses
    // them.
    //
    // Candidate generation is ONE aggregation on the (band, bucket)
    // exchange — collect each bucket's (bounded) membership list, apply
    // the size cap to the list, and expand the strictly-ordered pairs
    // in-row ([[graft.functions.OrderedPairsGen]], a lazy generator) —
    // instead of the previous window-count + sort-merge SELF-JOIN, whose
    // plan read the same exchange twice and sorted it twice (once per
    // join side) to produce the identical pair multiset. Same single
    // exchange, same cap semantics (size(list) == the window count for
    // the non-null doc_ids the pairs are made of), same pairs into
    // `distinct`. An earlier separate-count + broadcast-anti-join variant
    // re-shuffled the band rows three times and cost +41%; this shape
    // shuffles them once and sorts them zero times (the aggregation
    // hash-groups; its sort-based fallback only engages past the in-memory
    // group budget).
    val cand = allBands
      .groupBy(col("band"), col("bucket"))
      .agg(collect_list(col("doc_id")).as("_ids"))
      .filter(size(col("_ids")).between(2, maxBucket))
      .select(graft.functions.OrderedPairsGen.orderedPairs(col("_ids"))
        .as(Seq("a", "b")))
      .distinct()
    val shingleSets = base.select(col("doc_id"), col("sh"))
    cand
      .join(shingleSets.select(col("doc_id").as("a"), col("sh").as("sh_a")), Seq("a"))
      .join(shingleSets.select(col("doc_id").as("b"), col("sh").as("sh_b")), Seq("b"))
      .select(col("a"), col("b"), jaccard(col("sh_a"), col("sh_b")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  // Oracle note: the DuckDB side computes EXACT all-pairs jaccard over the
  // same trigram shingles (string sets; the Spark side's 64-bit shingle
  // hashes are collision-free at corpus scale, so the set algebra agrees).
  // The hash-match therefore also certifies LSH recall = 1.0 on the gate
  // corpus — at its 8-band/4-row setting, a pair at the 0.5 threshold
  // collides with probability 1-(1-0.5^4)^8 ≈ 0.4, but every actual
  // near-dup in the synthetic corpus sits at sim ≥ 0.9 where collision
  // probability is ≈ 1.
  private val qDedupMinhash = GQuery(
    "q_dedup_minhash",
    (s, d) =>
      minhashPairs(documents(s, d), 0.5)
        .select(col("a"), col("b"), stableRound(col("sim"), 4).as("sim")),
    Some("""WITH d AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> len(x) > 0) AS w
              FROM documents),
            g AS (
              SELECT doc_id,
                     list_distinct(CASE WHEN len(w) <= 3 THEN [array_to_string(w, ' ')]
                       ELSE list_transform(generate_series(1, len(w) - 2),
                              i -> array_to_string(w[i:i+2], ' ')) END) AS grams
              FROM d),
            p AS (
              SELECT l.doc_id AS a, r.doc_id AS b,
                     CAST(len(list_intersect(l.grams, r.grams)) AS DOUBLE) /
                     len(list_distinct(l.grams || r.grams)) AS rawsim
              FROM g l JOIN g r ON l.doc_id < r.doc_id)
            SELECT a, b, floor(rawsim * 10000 + 0.5) / 10000 AS sim
            FROM p WHERE rawsim >= 0.5"""),
    headline = true)

  // ---- incremental NEAR-dup: new batch vs persisted signature store -----
  // The steady-state pipeline shape: history's signatures/band rows live
  // in a MinHashStore (parquet, partitioned by band); a probe signatures
  // only the new batch, streams ONE scan of the store, and re-shingles
  // history text for the candidate hit set alone. Same shingle/signature/
  // banding parameters and exact-jaccard semantics as q_dedup_minhash, so
  // the DuckDB oracle is the same gram algebra restricted to cross-batch
  // pairs (and the LSH-recall-=1 argument above carries over unchanged —
  // every real near-dup in the corpus sits at sim ≥ 0.9).
  /** Deterministic per-PROCESS gate-store root, deleted at JVM exit (r16
    * advice): the pid suffix keeps two concurrent harness runs on one
    * machine from racing a shared store (one's overwrite build vs the
    * other's probe read), and the shutdown hook keeps each run's
    * sf-scale parquet from accumulating under /tmp across runs —
    * overwrite-mode only ever reclaimed space WITHIN one process.
    */
  private lazy val gateStoreRoot: java.nio.file.Path = {
    val root = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft-mhstore-gate-${ProcessHandle.current().pid()}")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        if (java.nio.file.Files.exists(root)) {
          java.nio.file.Files.walk(root)
            .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach { p => java.nio.file.Files.deleteIfExists(p); () }
        }
      } catch { case scala.util.control.NonFatal(_) => () },
      "graft-gate-store-cleanup"))
    root
  }

  private val qDedupMinhashIncr = GQuery(
    "q_dedup_minhash_incr",
    (s, d) => {
      val docs = documents(s, d)
      val hist = docs.filter(col("doc_id") % 3 =!= 0)
      val batch = docs.filter(col("doc_id") % 3 === 0)
      // deterministic per-PROCESS-per-sf path, overwrite-mode build:
      // repeated gate invocations within one run (Verify passes,
      // plan-audit sweeps) REPLACE the store instead of leaking a fresh
      // temp dir of sf-scale parquet each run, while the pid token keeps
      // two concurrent harness runs on the same machine from racing one
      // shared store (one's overwrite build vs the other's probe read)
      val storeDir = gateStoreRoot.resolve(new java.io.File(d).getName).toString
      val store = MinHashStore.build(hist, storeDir)
      store.probe(batch, hist, 0.5)
        .select(col("new_id"), col("hist_id"), stableRound(col("sim"), 4).as("sim"))
    },
    Some("""WITH d AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> len(x) > 0) AS w
              FROM documents),
            g AS (
              SELECT doc_id,
                     list_distinct(CASE WHEN len(w) <= 3 THEN [array_to_string(w, ' ')]
                       ELSE list_transform(generate_series(1, len(w) - 2),
                              i -> array_to_string(w[i:i+2], ' ')) END) AS grams
              FROM d),
            p AS (
              SELECT n.doc_id AS new_id, h.doc_id AS hist_id,
                     CAST(len(list_intersect(n.grams, h.grams)) AS DOUBLE) /
                     len(list_distinct(n.grams || h.grams)) AS rawsim
              FROM g n JOIN g h ON n.doc_id % 3 = 0 AND h.doc_id % 3 <> 0)
            SELECT new_id, hist_id, floor(rawsim * 10000 + 0.5) / 10000 AS sim
            FROM p WHERE rawsim >= 0.5"""))

  // ---- SimHash near-dup: 64-bit signature, hamming ≤ 6 -------------------
  /** Deliberately NOT eager-primed (unlike [[minhashPairs]]): the two
    * sides of the block self-join do race to materialize the cold cache
    * (QueryProfile shows two near-identical duplicate stages), but with
    * only TWO racing consumers the duplicate work runs on otherwise-idle
    * cores, while an eager prime SERIALIZES a full extra pass before the
    * plan starts — measured +22% on cold totals at sf0.1 (interleaved
    * A/B, n=18/side, median 0.738 s unprimed vs 0.927 s primed, r17).
    * minhashPairs' prime survives the same test because its base feeds
    * FOUR branches, each scheduling a full task set.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    // persist: the 64-bit-sum signature expression is expensive and feeds
    // both sides of the block self-join
    val sigs = docs
      .select(col("doc_id"),
        graft.functions.SimHash64Expr.simhash64Native(tokens(col("text"))).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Block on 4 x 16-bit chunks: two sigs within hamming 3 of each other
    // share at least one exact chunk (pigeonhole over 4 blocks); for
    // maxHamming 6 this is a recall-oriented heuristic blocking, the
    // standard simhash table trick.
    val chunks = sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("blk"),
          call_function("shiftright", col("sig"), lit(i * 16)).bitwiseAND(0xffffL)
            .as("chunk"))): _*)).as("c"))
      .select(col("doc_id"), col("sig"), col("c.blk"), col("c.chunk"))
    val l = chunks.select(col("blk"), col("chunk"), col("doc_id").as("a"), col("sig").as("sig_a"))
    val r = chunks.select(col("blk"), col("chunk"), col("doc_id").as("b"), col("sig").as("sig_b"))
    l.join(r, Seq("blk", "chunk"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), hamming64(col("sig_a"), col("sig_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  private val qDedupSimhash = GQuery(
    "q_dedup_simhash",
    (s, d) => simhashPairs(documents(s, d), 6),
    Some(SimhashOracle.sql(6)),
    headline = true)

  /** Within-block all-pairs join with salted parallelism. A blocked
    * self-join's parallelism is the number of BLOCKS, not the data volume
    * — at 10× corpus scale the per-block n² work lands on the same
    * handful of tasks and one reducer burns for hours (observed at a
    * local sf1 run: one task, 10+ CPU-minutes). The left side takes salt
    * hash(aCol) % salts; the right side replicates to every salt, so each
    * (a, b) pair is generated exactly once — via a's salt — while the
    * quadratic work spreads over blocks × salts tasks. Replication costs
    * salts× of the RIGHT rows through the shuffle, linear and tiny next
    * to the quadratic pair stream it parallelizes.
    */
  private[ml] def saltedBlockPairs(l: DataFrame, r: DataFrame,
      blockCols: Seq[String], aCol: String, salts: Int = 32): DataFrame = {
    val lS = l.withColumn("_salt",
      pmod(xxhash64(col(aCol)), lit(salts.toLong)).cast("int"))
      // The explicit repartition is the point, not an afterthought: when
      // the right side is small enough to broadcast there is NO shuffle in
      // this join, so left parallelism = input FILE partitions — a compact
      // single-file table runs its whole quadratic pair stream on one task
      // no matter how the salt distributes keys. Repartitioning the salted
      // left (linear rows, cheap) pins parallel tasks under both broadcast
      // and sort-merge plans; the explicit count keeps AQE from coalescing
      // the small-by-bytes shuffle whose per-row JOIN cost it cannot see.
      .repartition(salts, (blockCols :+ "_salt").map(col): _*)
    val rS = r.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    lS.join(rS, blockCols :+ "_salt").drop("_salt")
  }

  /** Label-blocked exact cosine pairs over the embeddings table — shared
    * by q_dedup_embed and the clustering gates, salted per
    * [[saltedBlockPairs]].
    */
  private[ml] def embedPairs(s: SparkSession, d: String,
      threshold: Double): DataFrame = {
    val emb = embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    val l = emb.select(col("label"), col("vec_id").as("a"), col("v").as("va"))
    val r = emb.select(col("label"), col("vec_id").as("b"), col("v").as("vb"))
    saltedBlockPairs(l, r, Seq("label"), "a")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), stableRound(cosine(col("va"), col("vb")), 4).as("sim"))
      .filter(col("sim") >= threshold)
  }

  // ---- n-gram Jaccard (exact, blocked) -----------------------------------
  // Exact trigram-set jaccard over candidate pairs blocked by (lang, source)
  // — the "verify" side without LSH; quadratic within block only.
  private val qNgramJaccard = GQuery(
    "q_ngram_jaccard",
    (s, d) => {
      val docs = documents(s, d).select(col("doc_id"), col("lang"), col("source"),
        array_distinct(graft.functions.TextExprs.shinglesTextNative(col("text"), 3)).as("grams"))
      val l = docs.select(col("lang"), col("source"), col("doc_id").as("a"), col("grams").as("ga"))
      val r = docs.select(col("lang"), col("source"), col("doc_id").as("b"), col("grams").as("gb"))
      saltedBlockPairs(l, r, Seq("lang", "source"), "a")
        .filter(col("a") < col("b"))
        .select(col("a"), col("b"), stableRound(jaccard(col("ga"), col("gb")), 4).as("sim"))
        .filter(col("sim") >= 0.3)
    },
    Some("""WITH d AS (
              SELECT doc_id, lang, source,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> len(x) > 0) AS w
              FROM documents),
            g AS (
              SELECT doc_id, lang, source,
                     list_distinct(CASE WHEN len(w) <= 3 THEN [array_to_string(w, ' ')]
                       ELSE list_transform(generate_series(1, len(w) - 2),
                              i -> array_to_string(w[i:i+2], ' ')) END) AS grams
              FROM d),
            p AS (
              SELECT l.doc_id AS a, r.doc_id AS b,
                     floor((CAST(len(list_intersect(l.grams, r.grams)) AS DOUBLE) /
                            len(list_distinct(l.grams || r.grams))) * 10000 + 0.5) / 10000 AS sim
              FROM g l JOIN g r
                ON l.lang = r.lang AND l.source = r.source AND l.doc_id < r.doc_id)
            SELECT a, b, sim FROM p WHERE sim >= 0.3"""))

  // ---- benchmark decontamination ----------------------------------------
  // Flag corpus documents sharing >= 3 trigram shingles with a "benchmark"
  // set (here: doc_id < 5 stands in for an eval benchmark). Scale shape:
  // the benchmark n-gram set is tiny and broadcasts; the corpus explodes
  // to (doc_id, gram) but the overlap count partial-aggregates before the
  // one shuffle on doc_id — no corpus self-join anywhere.
  private val qContamination = GQuery(
    "q_contamination",
    (s, d) => {
      val docs = documents(s, d).select(col("doc_id"),
        array_distinct(graft.functions.TextExprs.shinglesTextNative(col("text"), 3)).as("grams"))
      val bench = docs.filter(col("doc_id") < 5)
        .select(explode(col("grams")).as("g")).distinct()
      docs.filter(col("doc_id") >= 5)
        .select(col("doc_id"), explode(col("grams")).as("g"))
        .join(broadcast(bench), Seq("g"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
        .filter(col("n_overlap") >= 3)
    },
    Some("""WITH d AS (
              SELECT doc_id,
                     list_distinct(CASE WHEN len(w) <= 3 THEN [array_to_string(w, ' ')]
                       ELSE list_transform(generate_series(1, len(w) - 2),
                              i -> array_to_string(w[i:i+2], ' ')) END) AS grams
              FROM (SELECT doc_id,
                           list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
                                       x -> len(x) > 0) AS w
                    FROM documents)),
            bench AS (SELECT DISTINCT unnest(grams) AS g FROM d WHERE doc_id < 5),
            corpus AS (SELECT doc_id, unnest(grams) AS g FROM d WHERE doc_id >= 5)
            SELECT c.doc_id, count(*) AS n_overlap
            FROM corpus c JOIN bench b ON c.g = b.g
            GROUP BY c.doc_id HAVING count(*) >= 3"""))

  // ---- embedding-cosine near-dup pairs ----------------------------------
  // Exact within label blocks (cheap blocking on provided cluster labels).
  private val qDedupEmbed = GQuery(
    "q_dedup_embed",
    (s, d) => embedPairs(s, d, 0.35),
    Some("""SELECT a, b, sim FROM (
              SELECT e1.vec_id AS a, e2.vec_id AS b,
                     floor(list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]), CAST(e2.embedding AS DOUBLE[])) * 10000 + 0.5) / 10000 AS sim
              FROM embeddings e1 JOIN embeddings e2
                ON e1.label = e2.label AND e1.vec_id < e2.vec_id)
            WHERE sim >= 0.35"""))

  // ---- incremental dedup: a new batch against the historical corpus ----
  // The production shape: the historical side reduces to its distinct
  // fingerprint set (at scale: a persisted/bucketed fingerprint pool, not
  // a rescan) and the new batch LEFT-ANTI/SEMI joins against it — the new
  // batch never joins the historical documents themselves, only the
  // fingerprints. Within-batch dups resolve by min(doc_id) as usual.
  // Verdict per new doc: 'historical' (seen before), 'batch' (dup inside
  // the new batch), or 'fresh'.
  // ---- Bloom-filter incremental dedup ------------------------------------
  // The 100 TB cross-dataset shape of q_dedup_incremental: instead of
  // joining the new batch against the historical corpus's distinct
  // fingerprint SET (whose broadcast grows with history), history reduces
  // to a COMPACT Bloom filter (~1.2 MB per million fingerprints at 1% fpp)
  // built by one partial-merged aggregation and broadcast to the scan;
  // probes are codegen'd bit tests. False negatives are impossible by
  // construction; false positives would route to an exact confirm in a
  // real pipeline. The gate is self-verifying IN-PLAN: it carries the
  // exact distinct-fingerprint side too (the verification baseline, like
  // the ANN gates' in-plan exact top-k) and emits one summary row whose
  // exact-derivable fields (batch size, true-dup count) hash-match the
  // DuckDB oracle while the bloom-behavior fields must come out as the
  // oracle's literals: zero false negatives, measured FPR under 2%.
  /** History → `shards` Bloom filters partitioned by `pmod(hash, shards)`,
    * packed into ONE struct-valued scalar subquery — a single history scan
    * and a single aggregate (each shard's BloomFilterAggregate sees only
    * its slice via a null-out `when`; aggregates skip nulls). The probe
    * routes to its shard with the same modulus through the
    * `GetStructField(<scalar subquery>, i)` form `might_contain` accepts
    * alongside constants and bare subqueries. `shards == 1` degenerates to
    * the old monolith bit-for-bit. This is the "shard by key range past
    * the 2^31-bit cap" path: total capacity becomes shards × 256 MB while
    * each filter stays a broadcastable plan constant.
    *
    * Returns the probe constructor: given the probe-side hash column,
    * yields the boolean might-contain column.
    */
  private[ml] def shardedBloomFilter(hist: DataFrame, histHash: Column,
      itemsPerShard: Long, bitsPerShard: Long, shards: Int): Column => Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, GetStructField}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.Bridge
    // shards <= 64 bounds the probe's when-chain depth below the Janino
    // codegen-depth hazard documented for when-chains (Compiler.scala); at
    // ~224M items/shard that is ~14B history fingerprints — past it, shard
    // by an outer key split, not more branches.
    require(shards >= 1 && shards <= 64 && bitsPerShard <= Int.MaxValue.toLong,
      s"bloom shard sizing out of range: shards=$shards bits=$bitsPerShard")
    val aggs = (0 until shards).map { i =>
      val slice = if (shards == 1) histHash
        else when(pmod(histHash, lit(shards.toLong)) === i, histHash)
      Bridge.column(new BloomFilterAggregate(
        Bridge.expression(slice),
        Bridge.expression(lit(itemsPerShard)),
        Bridge.expression(lit(bitsPerShard))).toAggregateExpression()).as(s"bf$i")
    }
    // one subquery instance reused across probe branches: same exprId, so
    // the plan executes the aggregation once and broadcasts the struct
    val sub = Bridge.expression(Bridge.scalarSubquery(hist.agg(struct(aggs: _*).as("bfs"))))
    (probeHash: Column) => {
      def mc(i: Int): Column = Bridge.column(BloomFilterMightContain(
        GetStructField(sub, i, Some(s"bf$i")), Bridge.expression(probeHash)))
      if (shards == 1) mc(0)
      else (1 until shards).foldLeft(
        when(pmod(probeHash, lit(shards.toLong)) === 0, mc(0))) {
        (acc, i) => acc.when(pmod(probeHash, lit(shards.toLong)) === i, mc(i))
      }
    }
  }

  /** Filter sizing from the session's Bloom clamps: Spark SILENTLY
    * Math.min's BloomFilterAggregate's args against
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits`
    * (defaults 4M/67M) — past that a filter stops growing with no error
    * and saturates. GraftSession raises the ceilings to 400M items /
    * 2^31 bits; this asserts the computed sizing is under the LIVE
    * session's values so an unraised session fails loudly instead of
    * shipping a saturating filter.
    */
  private[ml] def bloomSizing(s: SparkSession, histUpper: Long,
      bitsPerItem: Double = 9.6): (Long, Long, Int) = {
    val maxItems = s.conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits = s.conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    val capBits = math.min(Int.MaxValue.toLong, maxBits)
    val totalBits = (histUpper * bitsPerItem).toLong
    val shards = math.max(1L, (totalBits + capBits - 1) / capBits).toInt
    val itemsPerShard = (histUpper + shards - 1) / shards
    val bitsPerShard = math.min(capBits, (itemsPerShard * bitsPerItem).toLong)
    require(itemsPerShard <= maxItems && bitsPerShard <= maxBits,
      s"bloom sizing (items=$itemsPerShard, bits=$bitsPerShard per shard × $shards) " +
        s"exceeds session clamps (maxNumItems=$maxItems, maxNumBits=$maxBits): " +
        "Spark would clamp SILENTLY and the filter would saturate — raise " +
        "spark.sql.optimizer.runtime.bloomFilter.* (GraftSession sets both)")
    (itemsPerShard, bitsPerShard, shards)
  }

  private val qDedupBloom = GQuery(
    "q_dedup_bloom",
    (s, d) => {
      val docs = documents(s, d).withColumn("fp",
        md5(array_join(array_sort(array_distinct(tokens(col("text")))), " ")))
      val isHist = col("source").rlike("^src[0-9]$")
      // Size the filter from the table's row count (a parquet-footer
      // metadata aggregate — no data scan) so bits-per-item stays ~9.6 at
      // ANY scale: the original fixed 1M-item sizing saturated at sf100
      // (2.5M-fingerprint history → measured FPR above the 2% bound — the
      // sf100 rung's scale catch that round). The count is an UPPER bound
      // on history cardinality, so the FPR bound only tightens. Past the
      // per-filter 2^31-bit (256 MB) cap the sizing SHARDS the filter by
      // hash range (`shardedBloomFilter`) instead of growing one monolith;
      // at every tested sf shards == 1 and the plan is the old monolith.
      // row count from parquet footers when available (driver metadata
      // read, no Spark job); the count() fallback covers non-fixture
      // sources
      val histUpper = math.max(1000000L,
        graft.sources.Tables.footerRowCount(s, s"$d/documents.parquet")
          .getOrElse(documents(s, d).count()))
      val (itemsPerShard, bitsPerShard, shards) = bloomSizing(s, histUpper)
      val probe = shardedBloomFilter(
        docs.filter(isHist), xxhash64(col("fp")), itemsPerShard, bitsPerShard, shards)
      val histSet = docs.filter(isHist).select("fp").distinct()
      val probed = docs.filter(!isHist)
        .withColumn("flagged", probe(xxhash64(col("fp"))))
        .join(broadcast(histSet.withColumn("_h", lit(true))), Seq("fp"), "left")
        .withColumn("isdup", col("_h").isNotNull)
      probed.agg(
        count(lit(1)).as("n_batch"),
        sum(when(col("isdup"), 1L).otherwise(0L)).as("n_true_dup"),
        sum(when(col("isdup") && !col("flagged"), 1L).otherwise(0L)).as("false_neg"),
        (sum(when(!col("isdup") && col("flagged"), 1L).otherwise(0L))
          <= count(lit(1)) * lit(0.02)).as("fpr_ok"))
    },
    Some("""WITH f AS (SELECT doc_id, source,
                   md5(list_aggregate(list_sort(list_distinct(
                     list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
                                 x -> x <> ''))), 'string_agg', ' ')) AS fp
                 FROM documents),
            hist AS (SELECT DISTINCT fp FROM f WHERE regexp_matches(source, '^src[0-9]$')),
            batch AS (SELECT * FROM f WHERE NOT regexp_matches(source, '^src[0-9]$'))
            SELECT count(*) AS n_batch,
                   CAST(count(*) FILTER (WHERE fp IN (SELECT fp FROM hist)) AS BIGINT)
                     AS n_true_dup,
                   CAST(0 AS BIGINT) AS false_neg,
                   true AS fpr_ok
            FROM batch"""))

  private val qDedupIncremental = GQuery(
    "q_dedup_incremental",
    (s, d) => {
      // normalized bag-of-words fingerprint (sorted distinct tokens) so
      // reordered/duplicated-word variants collide — raw md5(text) would
      // make the gate degenerate on this corpus (0 cross-split dups)
      val docs = documents(s, d).withColumn("fp",
        md5(array_join(array_sort(array_distinct(tokens(col("text")))), " ")))
      // deterministic split: src0..src9 = historical corpus, rest = new
      val isHist = col("source").rlike("^src[0-9]$")
      val hist = docs.filter(isHist).select("fp").distinct()
      val batch = docs.filter(!isHist)
      val firstInBatch = batch.groupBy("fp")
        .agg(min("doc_id").cast("long").as("first_id"))
      batch
        .join(broadcast(hist.withColumn("_hist", lit(true))), Seq("fp"), "left")
        .join(firstInBatch, Seq("fp"))
        .select(col("doc_id"), col("fp"),
          when(col("_hist").isNotNull, "historical")
            .when(col("doc_id") =!= col("first_id"), "batch")
            .otherwise("fresh").as("verdict"))
    },
    Some("""WITH f AS (SELECT doc_id, source,
                   md5(list_aggregate(list_sort(list_distinct(
                     list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
                                 x -> x <> ''))), 'string_agg', ' ')) AS fp
                 FROM documents),
            hist AS (SELECT DISTINCT fp FROM f WHERE regexp_matches(source, '^src[0-9]$')),
            batch AS (SELECT * FROM f WHERE NOT regexp_matches(source, '^src[0-9]$')),
            firsts AS (SELECT fp, CAST(min(doc_id) AS BIGINT) AS first_id
                       FROM batch GROUP BY fp)
            SELECT b.doc_id, b.fp,
                   CASE WHEN h.fp IS NOT NULL THEN 'historical'
                        WHEN b.doc_id <> fi.first_id THEN 'batch'
                        ELSE 'fresh' END AS verdict
            FROM batch b
            LEFT JOIN hist h USING (fp)
            JOIN firsts fi USING (fp)"""))

  val queries: Seq[GQuery] =
    Seq(qDedupExact, qDedupMinhash, qDedupMinhashIncr, qDedupSimhash,
      qNgramJaccard, qDedupEmbed, qContamination, qDedupIncremental,
      qDedupBloom)
}
