package graft.ml

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed query side of exact/PQ ANN search must (1) return
  * exactly what the driver-side variants return and (2) plan without any
  * driver materialization of the query set — no BroadcastExchange, a
  * shuffled hash join on the corpus-block id, bounded topk_pairs heaps.
  */
class DistributedQuerySpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)
  val dir = "/root/testdata/sf0.001"

  private def corpus = graft.sources.Tables.embeddings(spark, dir)
    .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))

  test("bruteForceTopKDistributed equals the broadcast variant row for row") {
    val qs = corpus.filter(col("vec_id") < 50)
    val a = AnnOps.bruteForceTopK(corpus, qs, 5)
      .orderBy("q_id", "rk").collect().toSeq
    val b = AnnOps.bruteForceTopKDistributed(corpus, qs, 5, blocks = 7)
      .orderBy("q_id", "rk").collect().toSeq
    assert(a == b)
  }

  test("distributed exact-search plan: no broadcast, shuffled hash join, heap agg") {
    val plan = AnnOps.bruteForceTopKDistributed(
      corpus, AnnOps.batchQueries(corpus), 3).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"), "query set must never broadcast")
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("ShuffledHashJoin"), plan.linesIterator.take(12).mkString("\n"))
    assert(plan.contains("partial_topk_pairs"),
      "pair stream must fold into per-partition heaps before the exchange")
  }

  test("queryTablesDistributed builds bit-identical ADC tables in-plan") {
    val qs = corpus.filter(col("vec_id") < 20)
    val cents = Pq.train(corpus, m = 8, k = 8, iters = 1)
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) ->
        r.getSeq[scala.collection.Seq[Double]](1).map(_.toVector).toVector)
      .toMap
    assert(norm(Pq.queryTables(cents, qs)) == norm(Pq.queryTablesDistributed(cents, qs)))
  }

  test("queryTablesDistributed rejects a sparse codebook (dropped cluster)") {
    // Lloyd's update loses a k that attracted no points → the positional
    // table build would silently shift ADC entries; it must fail loudly.
    // The check rides the plan as a 1-row stats frame (construction stays
    // job-free), so the failure surfaces at EXECUTION, wrapped in Spark's
    // task-failure chain — walk the causes for the message.
    val qs = corpus.filter(col("vec_id") < 5)
    val cents = Pq.train(corpus, m = 8, k = 8, iters = 1)
    val sparse = cents.filter(!(col("m") === 3 && col("k") === 5))
    val e = intercept[Throwable] {
      Pq.queryTablesDistributed(sparse, qs).collect()
    }
    val messages = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(messages.contains("not dense"), messages)
  }

  test("searchTopKDistributed ranks exactly like searchTopK") {
    val qs = corpus.filter(col("vec_id") < 20)
    val cents = Pq.train(corpus, m = 8, k = 8, iters = 1)
    val codes = Pq.encode(corpus, cents)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val a = Pq.searchTopK(codes, cents, qs, 5)
        .orderBy("q_id", "rk").collect().toSeq
      val b = Pq.searchTopKDistributed(codes, cents, qs, 5, blocks = 5)
        .orderBy("q_id", "rk").collect().toSeq
      assert(a == b)
    } finally codes.unpersist()
  }

  test("batchQueries amplifies 500 base vectors to 10k distinct ids") {
    val q = AnnOps.batchQueries(corpus)
    assert(q.select("vec_id").distinct().count() ==
      math.min(500, corpus.count()) * 20)
  }

  // ---- disk-index bulk-query variants (r14 verdict #2) -------------------
  // The persisted indexes must serve million-row query batches without the
  // query set ever reaching the driver: searchDistributed mirrors
  // bruteForceTopKDistributed/searchTopKDistributed — a shuffled-hash join
  // on `cell` replaces broadcast(probed/build), the bounded k-heap tail
  // stays. Recall contract: identical rows to the broadcast path (the
  // probe, scoring, and ranking are the same expressions — only join
  // strategies differ).

  private def queryBroadcasts(df: org.apache.spark.sql.DataFrame) = {
    df.collect() // settle AQE so the final plan's join strategies are real
    graft.PlanTestUtil.allNodes(df.queryExecution.executedPlan).collect {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
          // index metadata (centroids/codebook/1-row stats) may broadcast;
          // anything carrying query-derived columns must not
          if b.output.exists(a => Set("q_id", "qv", "table").contains(a.name)) => b
    }
  }

  test("ivfTopKDistributed equals ivfTopK row for row, no query broadcast") {
    // the in-plan bulk-IVF path behind q_ann_ivf_batch: deterministic
    // given the same trained cells, so parity with the broadcast variant
    // is exact row equality; the probe frame must meet the assigned
    // corpus in a shuffled-hash join
    val qs = corpus.filter(col("vec_id") < 50)
    val a = AnnOps.ivfTopK(corpus, qs, 5, nprobe = 3)
      .orderBy("q_id", "rk").collect().toSeq
    val dist = AnnOps.ivfTopKDistributed(corpus, qs, 5, nprobe = 3)
    val b = dist.orderBy("q_id", "rk").collect().toSeq
    assert(a.nonEmpty && a == b)
    assert(queryBroadcasts(dist).isEmpty,
      "query-derived frame broadcast in ivfTopKDistributed")
    assert(dist.queryExecution.executedPlan.toString.contains("ShuffledHashJoin"))
  }

  test("IvfIndex.searchDistributed equals search row for row, no query broadcast") {
    val qs = corpus.filter(col("vec_id") < 50)
    val path = java.nio.file.Files.createTempDirectory("dist-ivf").toString
    val ivf = IvfIndex.build(corpus.select(col("vec_id"), col("v")), path,
      cells = 5, trainIters = 1)
    val a = ivf.search(qs, 5, nprobe = 2).orderBy("q_id", "rk").collect().toSeq
    val dist = ivf.searchDistributed(qs, 5, nprobe = 2)
    val b = dist.orderBy("q_id", "rk").collect().toSeq
    assert(a.nonEmpty && a == b)
    assert(queryBroadcasts(dist).isEmpty,
      "query-derived frame broadcast in IvfIndex.searchDistributed")
    val plan = dist.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), plan.linesIterator.take(15).mkString("\n"))
  }

  test("IvfPqIndex.searchDistributed equals search row for row, no query broadcast") {
    val qs = corpus.filter(col("vec_id") < 50)
    val c = corpus.select(col("vec_id"), col("v"))
    val path = java.nio.file.Files.createTempDirectory("dist-ivfpq").toString
    val ivfpq = IvfPq.build(c, path, cells = 5, m = 8, k = 16, iters = 1)
    val a = ivfpq.search(c, qs, 5, nprobe = 2, shortlist = 30)
      .orderBy("q_id", "rk").collect().toSeq
    val dist = ivfpq.searchDistributed(c, qs, 5, nprobe = 2, shortlist = 30)
    val b = dist.orderBy("q_id", "rk").collect().toSeq
    assert(a.nonEmpty && a == b)
    assert(queryBroadcasts(dist).isEmpty,
      "query-derived frame broadcast in IvfPqIndex.searchDistributed")
    val plan = dist.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), plan.linesIterator.take(15).mkString("\n"))
  }
}
