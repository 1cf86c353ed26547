package graft.functions

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native cosine to the builtin-composed Column formulation it
  * replaces — bit-for-bit (IEEE addition order matters), including the
  * zero-norm, empty, null-element, and length-mismatch edges.
  */
class VectorExprsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  test("native cosine equals the column formulation bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian()), Array.fill(64)(rnd.nextGaussian()))
    } ++ Seq(
      (200L, Array.fill(64)(0.0), Array.fill(64)(1.0)), // zero norm -> 0.0
      (201L, Array.empty[Double], Array.empty[Double])) // empty -> 0.0
    val df = vecs.toDF("id", "a", "b")
    val rows = df.select(col("id"),
      cosine(col("a"), col("b")).as("nat"),
      cosineColumns(col("a"), col("b")).as("ref")).collect()
    rows.foreach { r =>
      val nat = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      val ref = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      // bit-for-bit: compare raw long bits, not within an epsilon
      assert(nat.map(java.lang.Double.doubleToRawLongBits) ==
        ref.map(java.lang.Double.doubleToRawLongBits),
        s"id ${r.getLong(0)}: native $nat vs reference $ref")
    }
    assert(rows.length == 202)
  }

  test("doGenCode compiles: codegen-only mode matches interpreted eval") {
    import spark.implicits._
    // CODEGEN_ONLY makes janino failures throw instead of silently falling
    // back to nullSafeEval — this pins that the generated Java is valid,
    // which the parity test alone would not catch.
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val rnd = new scala.util.Random(7)
      val df = (0 until 50).map { i =>
        (i.toLong, Array.fill(16)(rnd.nextGaussian()), Array.fill(16)(rnd.nextGaussian()))
      }.toDF("id", "a", "b")
      val rows = df.select(col("id"),
        cosine(col("a"), col("b")).as("nat"),
        cosineColumns(col("a"), col("b")).as("ref")).collect()
      rows.foreach { r =>
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(2)))
      }
      assert(rows.length == 50)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("null array, null element, and length mismatch all yield null (like zip_with)") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq(Some(1.0), Some(2.0))), None: Option[Seq[Option[Double]]]),
      (2L, Some(Seq(Some(1.0), None)), Some(Seq(Some(1.0), Some(2.0)))),
      (3L, Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(3.0))))
    ).toDF("id", "a", "b")
    val rows = df.select(col("id"),
      cosine(col("a"), col("b")).as("nat"),
      cosineColumns(col("a"), col("b")).as("ref")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2) && r.isNullAt(1),
        s"id ${r.getLong(0)}: expected null/null, got $r")
    }
  }
}
