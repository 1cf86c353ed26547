package graft.ml

import graft.GraftSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)

  test("shuffle order is a rerun-stable permutation, shards bounded") {
    val run1 = graft.Registry.byName("q_shuffle_order")
      .run(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val run2 = graft.Registry.byName("q_shuffle_order")
      .run(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(run1.sorted.sameElements(run2.sorted))           // deterministic
    assert(run1.map(_._1).distinct.length == run1.length)    // every doc once
    // (shard, pos) is a dense unique order within each shard
    val byShard = run1.groupBy(_._2)
    assert(byShard.forall { case (_, rows) =>
      rows.map(_._3).sorted.sameElements(1L to rows.length) })
  }

  test("mixture sampling hits the per-source target rates") {
    val out = graft.Registry.byName("q_mixture")
      .run(spark, "/root/testdata/sf0.001")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rate-1.0 sources keep everything; sampled sources land near rate
    // (exact counts are deterministic; the tolerance covers small strata)
    for ((src, n) <- totals) {
      val idx = src.stripPrefix("src").toInt
      val rate = Seq(1.0, 0.5, 0.25, 0.125)(idx % 4)
      val kept = out.getOrElse(src, 0L).toDouble
      if (rate == 1.0) assert(kept == n.toDouble, s"$src must keep all")
      else assert(math.abs(kept / n - rate) < 0.25, s"$src kept $kept/$n, want ~$rate")
    }
  }

  test("distributed prefix sum == single-window cumsum") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, i % 7 + 1)).toDF("id", "n")
      .repartition(8) // scrambled input placement
    val got = PackOps.prefixSum(df, "id", "n", partitions = 5)
      .select("id", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = df.withColumn("cum",
      sum("n").over(Window.orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("packing fills budgets in order; long docs span sequences") {
    import spark.implicits._
    val docs = Seq((1L, 300L), (2L, 300L), (3L, 700L), (4L, 100L))
      .toDF("doc_id", "n_tokens")
    val out = PackOps.packSequences(docs, budget = 512L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    // prefix sums: 0, 300, 600, 1300 → seq = prefix/512, off = prefix%512
    assert(out == Seq((1L, 0L, 0L), (2L, 0L, 300L), (3L, 1L, 88L), (4L, 2L, 276L)))
  }
}
