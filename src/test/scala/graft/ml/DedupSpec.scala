package graft.ml

import graft.GraftSession
import graft.functions._
import graft.functions.SimHash64Expr.simhash64Native
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quality checks for the near-dup / ANN operators: the native Catalyst
  * SimHash expression agrees with the built-in-composition formulation,
  * MinHash-LSH achieves full recall against exact all-pairs jaccard on the
  * test corpus, and LSH/IVF ANN recall is measured against brute force.
  */
class DedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(8)
  val dir = "/root/testdata/sf0.001"

  test("native SimHash64Expr == builtin composition, interpreted and codegen") {
    val docs = Tables.documents(spark, dir).limit(200)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val both = docs.select(col("doc_id"),
      simhash64Native(col("toks")).as("native"),
      simhash64(col("toks")).as("builtin"))
    val diff = both.filter(col("native") =!= col("builtin")).count()
    assert(diff == 0)
    // also exercise the interpreted path explicitly
    val row = both.head()
    assert(row.getLong(1) == row.getLong(2))
  }

  test("minhash bucket cap drops pathological buckets, keeps normal pairs") {
    import spark.implicits._
    // 30 identical docs (one signature, one bucket of 30) + one true
    // near-dup pair of a distinct text
    val boiler = (1L to 30L).map(i => (i, "common boilerplate header repeated verbatim on every page of the site"))
    val near = Seq(
      (100L, "a genuinely unique document about catalyst optimizer internals and shuffle planning"),
      (101L, "a genuinely unique document about catalyst optimizer internals and shuffle plans"))
    val docs = (boiler ++ near).toDF("doc_id", "text")
    // cap below the boilerplate cluster: its n^2 pairs disappear
    val capped = DedupOps.minhashPairs(docs, 0.5, maxBucket = 10)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L)),
      s"only the near-dup pair survives the cap, got $capped")
    // with the cap above the cluster size everything is found again
    val uncapped = DedupOps.minhashPairs(docs, 0.5, maxBucket = 1000).count()
    assert(uncapped == 30L * 29 / 2 + 1, s"got $uncapped")
  }

  test("minhash-LSH recall == 1.0 vs exact all-pairs jaccard (sf0.001)") {
    val docs = Tables.documents(spark, dir)
    val grams = docs.select(col("doc_id"),
      array_distinct(shingles(tokens(col("text")), 3)).as("g"))
    val exact = grams.select(col("doc_id").as("a"), col("g").as("ga"))
      .crossJoin(grams.select(col("doc_id").as("b"), col("g").as("gb")))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), jaccard(col("ga"), col("gb")).as("sim"))
      .filter(col("sim") >= 0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupOps.minhashPairs(docs, 0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain near-duplicates")
    assert(lsh == exact,
      s"LSH missed=${(exact -- lsh).take(5)} extra=${(lsh -- exact).take(5)}")
  }

  test("ann: LSH and IVF recall vs brute force") {
    val corpus = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    val queries = corpus.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(AnnOps.bruteForceTopK(corpus, queries, 5))
    val lsh = pairs(AnnOps.lshTopK(corpus, queries, 5))
    val ivf = pairs(AnnOps.ivfTopK(corpus, queries, 5, 4))
    val lshRecall = (brute & lsh).size.toDouble / brute.size
    val ivfRecall = (brute & ivf).size.toDouble / brute.size
    info(f"LSH recall=$lshRecall%.2f IVF recall=$ivfRecall%.2f")
    assert(lshRecall >= 0.5, s"LSH recall too low: $lshRecall")
    // k-means-trained quantizer (3 Lloyd iterations) probing 4/10 cells
    assert(ivfRecall >= 0.6, s"IVF recall too low: $ivfRecall")
  }

  test("ivf index on disk: probes prune to their cell partitions") {
    val corpus = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val queries = corpus.filter(col("vec_id") < 20)
    val path = java.nio.file.Files.createTempDirectory("ivf").toString
    val idx = IvfIndex.build(corpus, path, cells = 10, trainIters = 3)

    // the probed search reads only nprobe-worth of cell directories (a
    // small query set — a broad one legitimately touches every cell).
    // Pruning is DYNAMIC now (plan construction is job-free, r14 verdict
    // #3): the cells scan carries a DynamicPruning partition filter fed by
    // the probe broadcast, so the evidence is the executed scan's
    // partitions-read metric, not a static IN literal.
    val narrow = idx.search(corpus.filter(col("vec_id") < 3), 5, nprobe = 2)
    narrow.collect()
    val scans = graft.PlanTestUtil.allNodes(narrow.queryExecution.executedPlan)
      .collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.partitionFilters.exists(_.exists(
              _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning])) => s
      }
    assert(scans.nonEmpty, "cells scan lost its DynamicPruning partition filter")
    val totalCells = idx.centroids.count()
    val scannedCells = scans.map(_.metrics("numPartitions").value).max
    assert(scannedCells < totalCells,
      s"probe should not touch all $totalCells cells (touched $scannedCells)")

    // results match the in-memory IVF quality bar
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(AnnOps.bruteForceTopK(corpus, queries, 5))
    val fromDisk = pairs(idx.search(queries, 5, nprobe = 4))
    val recall = (brute & fromDisk).size.toDouble / brute.size
    info(f"disk-IVF recall=$recall%.2f")
    assert(recall >= 0.6, s"disk-IVF recall too low: $recall")

    // incremental append: a duplicate of a query vector (shifted id)
    // indexes into the existing cells and is immediately findable
    val dup = queries.limit(1)
      .select((col("vec_id") + 100000L).as("vec_id"), col("v"))
    IvfIndex.append(idx, dup)
    val qid = queries.limit(1).select("vec_id").head().getLong(0)
    val hits = idx.search(queries.limit(1), 1, nprobe = 2)
      .select("n_id").collect().map(_.getLong(0)).toSeq
    assert(hits == Seq(qid + 100000L),
      s"appended duplicate should be the top-1 neighbor, got $hits")
  }

  test("connected components match union-find (chains, stars, singletons)") {
    import spark.implicits._
    // chain 1-2-3-4, triangle 10-11-12 + pendant 13, pair 20-21,
    // adversarial long chain 30..39 (worst case for star contraction)
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (12L, 13L),
      (20L, 21L)) ++ (30L until 39L).map(i => (i, i + 1))
    val pairs = edges.toDF("a", "b")
    val got = ClusterOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // reference: driver-side union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val want = nodes.map(n => n -> find(n)).toMap
    assert(got == want)
  }

  test("product quantization: 8x compression, ADC recall vs brute force") {
    val corpus = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val queries = corpus.filter(col("vec_id") < 20)
    val cents = Pq.train(corpus, m = 8, k = 64, iters = 5)
    val codes = Pq.encode(corpus, cents)
    // codes really are M small ints (the 64-dim vector became 8 codes)
    val sample = codes.head()
    assert(sample.getSeq[Int](1).size == 8)

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // unit-norm embeddings: cosine top-k == L2 top-k, so brute-force
    // cosine is the right exactness bar for ADC
    val brute = pairs(AnnOps.bruteForceTopK(corpus, queries, 5))
    // production shape: ADC shortlists from codes, exact re-rank on the
    // shortlist only — so the metric that matters is shortlist recall
    // (Jegou et al.'s recall@R), not ADC's own top-5 ordering
    val short = pairs(Pq.searchTopK(codes, cents, queries, 50))
    val recallAt50 = (brute & short).size.toDouble / brute.size
    val adc5 = pairs(Pq.searchTopK(codes, cents, queries, 5))
    val recallAt5 = (brute & adc5).size.toDouble / brute.size
    info(f"PQ-ADC recall@5=$recallAt5%.2f recall@50=$recallAt50%.2f")
    assert(recallAt50 >= 0.8, s"PQ shortlist recall too low: $recallAt50")

    // two-stage (shortlist + exact re-rank) recovers everything the
    // shortlist contains — the end-to-end production accuracy
    val reranked = pairs(Pq.searchWithRerank(codes, cents, corpus, queries, 5))
    val rerankRecall = (brute & reranked).size.toDouble / brute.size
    info(f"PQ rerank recall@5=$rerankRecall%.2f")
    assert(rerankRecall >= 0.8, s"PQ rerank recall too low: $rerankRecall")
  }

  test("ivf+pq index: pruned cells, compressed scoring, re-rank recall") {
    val corpus = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val queries = corpus.filter(col("vec_id") < 20)
    val path = java.nio.file.Files.createTempDirectory("ivfpq").toString
    val idx = IvfPq.build(corpus, path, cells = 10, m = 8, k = 64, iters = 4)

    // the on-disk index is codes only — no raw vectors (qerr is the
    // per-row quantization error the drift monitor reads, one float)
    val stored = spark.read.parquet(s"$path/cells")
    assert(stored.columns.toSet == Set("vec_id", "codes", "cell", "qerr"),
      stored.columns.toSeq)

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(AnnOps.bruteForceTopK(corpus, queries, 5))
    val got = pairs(idx.search(corpus, queries, 5, nprobe = 5, shortlist = 80))
    val recall = (brute & got).size.toDouble / brute.size
    info(f"IVF+PQ recall=$recall%.2f")
    // compounded approximation (cell pruning × code quantization) — the
    // bar is the IVF probe recall floor, the binding constraint here
    assert(recall >= 0.55, s"IVF+PQ recall too low: $recall")

    // corpus-fraction shortlist (footer-sized, zero pre-plan Spark jobs)
    // must produce exactly what the absolute call with the same computed
    // bound produces — recompute the bound the way searchFrac does
    val cellDirs = new java.io.File(s"$path/cells").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("cell="))
    val total = stored.count()
    val sl = math.max(5, math.ceil(
      total * math.min(5, cellDirs).toDouble / cellDirs * 0.16).toInt)
    val gotFrac = pairs(idx.searchFrac(corpus, queries, 5, nprobe = 5, frac = 0.16))
    val gotAbs = pairs(idx.search(corpus, queries, 5, nprobe = 5, shortlist = sl))
    assert(gotFrac == gotAbs,
      s"searchFrac(0.16) != search(shortlist=$sl): ${gotFrac.size} vs ${gotAbs.size}")

    // the DEFAULT (shortlist unset) IS the footer-sized fraction path now
    // (r16): a bare search must equal searchFrac at DefaultShortlistFrac
    val gotDefault = pairs(idx.search(corpus, queries, 5, nprobe = 5))
    val gotDefaultFrac = pairs(idx.searchFrac(corpus, queries, 5, nprobe = 5,
      frac = IvfPq.DefaultShortlistFrac))
    assert(gotDefault == gotDefaultFrac,
      s"default search != searchFrac(${IvfPq.DefaultShortlistFrac})")
  }

  test("exact dedup keeps one representative per content hash") {
    val out = graft.Registry.byName("q_dedup_exact").run(spark, dir)
    val total = out.agg(sum("n_copies")).head().getLong(0)
    assert(total == Tables.documents(spark, dir).count())
  }

  test("sharded bloom filter == monolith verdicts at a forced-small bit cap") {
    val gate = graft.Registry.byName("q_dedup_bloom")
    val maxBitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val maxItemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val savedBits = spark.conf.get(maxBitsKey)
    val savedItems = spark.conf.get(maxItemsKey)
    try {
      // monolith: GraftSession ceilings, 1M-item floor → 9.6M bits, 1 shard
      val mono = gate.run(spark, dir).head()
      // force sharding: cap 3M bits → ceil(9.6M/3M) = 4 shards of 250k
      // items / 2.4M bits. The gate row's fields are all deterministic
      // under any correctly-sized filter (exact counts, false_neg = 0 by
      // Bloom construction, fpr_ok from a 2% bound) so the rows must match.
      spark.conf.set(maxBitsKey, "3000000")
      val sharded = gate.run(spark, dir).head()
      assert(sharded == mono, s"sharded=$sharded mono=$mono")
      // direct shard-routing check: every history hash must be flagged
      // (false negatives are impossible per shard, and routing must send
      // each probe to the shard that absorbed it)
      val docs = Tables.documents(spark, dir).withColumn("fp",
        md5(array_join(array_sort(array_distinct(tokens(col("text")))), " ")))
      val probe = DedupOps.shardedBloomFilter(
        docs, xxhash64(col("fp")), itemsPerShard = 300, bitsPerShard = 4096, shards = 4)
      val misses = docs.withColumn("hit", probe(xxhash64(col("fp"))))
        .filter(!col("hit")).count()
      assert(misses == 0, s"$misses self-probe misses across shards")
      // oversizing the session's clamps fails LOUDLY (Spark alone would
      // silently Math.min the args and ship a saturating filter)
      spark.conf.set(maxItemsKey, "200000")
      val e = intercept[IllegalArgumentException] { gate.run(spark, dir) }
      assert(e.getMessage.contains("maxNumItems"), e.getMessage)
    } finally {
      spark.conf.set(maxBitsKey, savedBits)
      spark.conf.set(maxItemsKey, savedItems)
    }
  }
}
