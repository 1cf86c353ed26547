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

  test("prefix sum stays correct AND parallel on high-offset integral keys") {
    // r17 advice: the unshifted octave bucket of an epoch-millisecond-like
    // key domain is 2^(bitLength−m) wide — the whole batch lands in 1-2
    // buckets and the running-sum window funnels through one task. The
    // min-key normalization must (a) keep cum exact and (b) spread the
    // domain across many buckets.
    import spark.implicits._
    val base = 1755475200000L // epoch-ms-like magnitude
    val df = (0L until 4000L).map(i => (base + i * 3, i % 5 + 1))
      .toDF("ts", "n").repartition(8)
    val got = PackOps.prefixSum(df, "ts", "n", partitions = 8)
      .select("ts", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = df.withColumn("cum",
      sum("n").over(Window.orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("ts", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
    // the shifted bucket spreads the domain (the unshifted one collapses
    // it into ≤ 2 buckets at this magnitude)
    import graft.functions.OffsetBucketExpr.{offsetBucketNative, offsetBucketShifted}
    val m = graft.etl.OctaveScan.octaveBits(8)
    val unshifted = df.select(offsetBucketNative(col("ts"), m).as("b"))
      .distinct().count()
    val shifted = df.select(
      offsetBucketShifted(col("ts"), lit(base), m).as("b")).distinct().count()
    assert(unshifted <= 2, s"premise broke: unshifted spread $unshifted")
    assert(shifted >= 8, s"shifted spread too narrow: $shifted buckets")
  }

  test("prefix sum on negative and mixed-sign domains (shift spreads bucket −1)") {
    import spark.implicits._
    val df = (-2000L until 2000L).map(i => (i, (i % 3).abs + 1))
      .toDF("k", "n").repartition(6)
    val got = PackOps.prefixSum(df, "k", "n", partitions = 6)
      .select("k", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = df.withColumn("cum",
      sum("n").over(Window.orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("k", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("saturating shift is monotone across a > 2^63 key span") {
    // keys spanning [min+δ, MaxValue]: key − min overflows for the high
    // end; the saturating subtract must clamp (weakly monotone), never
    // wrap into bucket −1 below lower keys — cum stays exact either way
    import spark.implicits._
    val keys = Seq(Long.MinValue + 1, -5L, 0L, 5L,
      Long.MaxValue - 1, Long.MaxValue)
    val df = keys.map(k => (k, 1L)).toDF("k", "n")
    val got = PackOps.prefixSum(df, "k", "n", partitions = 4)
      .orderBy("k").select("cum").collect().map(_.getLong(0)).toSeq
    assert(got == (1L to keys.length).toSeq)
    // direct monotonicity of the bucket under saturation
    import graft.functions.OffsetBucketExpr.offsetBucketShifted
    val bks = df.select(col("k"),
      offsetBucketShifted(col("k"), lit(Long.MinValue + 1), 6).as("b"))
      .orderBy("k").collect().map(_.getInt(1)).toSeq
    assert(bks == bks.sorted, s"shifted buckets not monotone: $bks")
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
