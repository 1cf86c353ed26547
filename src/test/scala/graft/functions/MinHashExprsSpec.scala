package graft.functions

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native one-pass MinHash expressions to the Column formulations
  * they replace: same signatures, same band buckets, value for value —
  * including the empty-shingle edge where array_min yields nulls and
  * array_join collapses them to "".
  */
class MinHashExprsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "pack my box with five dozen liquor jugs",
    "single",
    "two words",
    "Repeated repeated repeated repeated words words words",
    "punctuation, only!!! and... numbers 123 456",
    "")

  private def docs = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("native signature equals the column-expression signature") {
    val sh = shingleHashes(shingles(tokens(col("text")), 3))
    val both = docs.select(col("doc_id"),
      minhashSignature(sh, 32).as("col_sig"),
      MinHashExprs.minhashSigNative(sh, 32).as("nat_sig"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Any](1) == r.getSeq[Any](2),
        s"signature mismatch for doc ${r.getLong(0)}")
    }
  }

  test("native band keys equal lshBands over the column signature") {
    val sh = shingleHashes(shingles(tokens(col("text")), 3))
    val both = docs.select(col("doc_id"),
      lshBands(minhashSignature(sh, 32), 8, 4).as("col_bands"),
      MinHashExprs.minhashBands(sh, 32, 8).as("nat_bands"))
    both.collect().foreach { r =>
      assert(r.getSeq[Any](1) == r.getSeq[Any](2),
        s"band keys mismatch for doc ${r.getLong(0)}")
    }
  }

  test("doGenCode compiles: codegen-only mode matches interpreted eval") {
    // the reference-object doGenCode must emit valid Java — CODEGEN_ONLY
    // turns a silent interpreted fallback into a hard failure
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val sh = TextExprs.shingleHashesNative(col("text"), 3)
      val rows = docs.select(col("doc_id"),
        lshBands(minhashSignature(shingleHashes(shingles(tokensColumns(col("text")), 3)), 32), 8, 4).as("ref"),
        MinHashExprs.minhashBands(sh, 32, 8).as("nat")).collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getSeq[Any](1) == r.getSeq[Any](2),
        s"codegen band keys mismatch for doc ${r.getLong(0)}"))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("empty shingle-hash array: null signature, bucket of empty string") {
    import spark.implicits._
    val empty = Seq((1L, Array.empty[Long])).toDF("doc_id", "sh")
    val r = empty.select(
      minhashSignature(col("sh"), 4).as("col_sig"),
      MinHashExprs.minhashSigNative(col("sh"), 4).as("nat_sig"),
      lshBands(minhashSignature(col("sh"), 4), 2, 2).as("col_bands"),
      MinHashExprs.minhashBands(col("sh"), 4, 2).as("nat_bands")).collect()(0)
    assert(r.getSeq[Any](0) == r.getSeq[Any](1))
    assert(r.getSeq[Any](2) == r.getSeq[Any](3))
  }
}
