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
    val qs = corpus.filter(col("vec_id") < 5)
    val cents = Pq.train(corpus, m = 8, k = 8, iters = 1)
    val sparse = cents.filter(!(col("m") === 3 && col("k") === 5))
    val e = intercept[IllegalArgumentException] {
      Pq.queryTablesDistributed(sparse, qs).collect()
    }
    assert(e.getMessage.contains("not dense"))
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
}
