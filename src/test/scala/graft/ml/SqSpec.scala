package graft.ml

import graft.GraftSession
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** SQ8 scalar-quantization edge cases the recall gate can't see: code
  * range, degenerate (constant) dimensions, and the per-dimension
  * reconstruction error bound of affine uint8 quantization.
  */
class SqSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private def frame(vs: Seq[Seq[Double]]) =
    spark.createDataFrame(
      java.util.Arrays.asList(vs.zipWithIndex.map { case (v, i) =>
        Row(i.toLong, v)
      }: _*),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("v", ArrayType(DoubleType)))))

  test("codes stay in [0,255]; min maps to 0, max to 255") {
    val corpus = frame(Seq(Seq(-3.0, 10.0), Seq(1.0, 20.0), Seq(5.0, 15.0)))
    val codes = AnnOps.sqEncode(corpus, AnnOps.sqStats(corpus))
      .orderBy("vec_id").collect().map(_.getSeq[Int](1))
    assert(codes.flatten.forall(c => c >= 0 && c <= 255))
    assert(codes(0)(0) == 0)   // -3 is dim-0 min
    assert(codes(2)(0) == 255) // 5 is dim-0 max
    assert(codes(0)(1) == 0)   // 10 is dim-1 min
    assert(codes(1)(1) == 255) // 20 is dim-1 max
  }

  test("degenerate (constant) dimension codes to 0 everywhere") {
    val corpus = frame(Seq(Seq(7.0, 1.0), Seq(7.0, 2.0), Seq(7.0, 3.0)))
    val codes = AnnOps.sqEncode(corpus, AnnOps.sqStats(corpus))
      .collect().map(_.getSeq[Int](1))
    assert(codes.forall(_.head == 0))
  }

  test("dequantized reconstruction error <= half a quantization step per dim") {
    val vs = (0 until 50).map(i => Seq(math.sin(i * 0.7) * 4, i * 0.3 - 5, 2.5))
    val corpus = frame(vs)
    val stats = AnnOps.sqStats(corpus)
    val deq = AnnOps.sqEncode(corpus, stats).crossJoin(broadcast(stats))
      .select(col("vec_id"), transform(col("codes"), (c, i) => {
        val mn = element_at(col("mins"), i + 1)
        val mx = element_at(col("maxs"), i + 1)
        mn + c * (mx - mn) / 255.0
      }).as("d"))
      .orderBy("vec_id").collect().map(_.getSeq[Double](1))
    // per-dim ranges: dim0 span <= 8, dim1 span ~14.7, dim2 degenerate
    val spans = Seq(
      vs.map(_(0)).max - vs.map(_(0)).min,
      vs.map(_(1)).max - vs.map(_(1)).min,
      0.0)
    for ((orig, got) <- vs.zip(deq); d <- 0 until 3)
      assert(math.abs(orig(d) - got(d)) <= spans(d) / 255.0 / 2 + 1e-9,
        s"dim $d: ${orig(d)} vs ${got(d)}")
  }
}
