package graft.ml

import graft.GraftSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)

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
