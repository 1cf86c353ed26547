package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass MinHash expressions.
  *
  * The Column formulation of a k-permutation signature
  * (`array(array_min(transform(hashes, …)) × k)`) references the shingle
  * pipeline k times, and slicing band keys out of it references THAT k×bands
  * times — a 256-copy expression tree at k=32/8 bands. Whole-stage codegen
  * would de-duplicate it, but the generated method blows past the JIT limit
  * and Spark silently falls back to interpreted eval, where every copy
  * really runs (~500× recompute; the same blowup DedupOps works around with
  * a persist barrier, which streaming plans cannot use). These expressions
  * evaluate the child ONCE per row and run the permutations as tight loops.
  *
  * Value parity is exact (MinHashExprsSpec pins it): same splitmix64
  * coefficients, same `pmod(h*a+b, 2^61-1)` with Java wrap-around multiply
  * (the non-ANSI semantics GraftSession pins), same
  * `xxhash64(join(sig-slice cast to string, "_"), seed 42)` bucket hash.
  */
private object MinHash {
  val M: Long = (1L << 61) - 1

  def mins(arr: ArrayData, k: Int): Array[Long] = {
    val n = arr.numElements()
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = coeff("minhash-a", i)
      val b = coeff("minhash-b", i)
      var mn = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = arr.getLong(j) * a + b // wraps, like non-ANSI Spark
        val m = v % M
        val p = if (m < 0) m + M else m
        if (p < mn) mn = p
        j += 1
      }
      out(i) = mn
      i += 1
    }
    out
  }
}

/** array<long> shingle hashes → array<long> k-permutation signature.
  * Equals `minhashSignature` column-for-column; empty input yields the
  * all-null array `array_min(empty)` produces there.
  */
case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  /** Called from both eval and generated code. */
  def run(arr: ArrayData): ArrayData =
    if (arr.numElements() == 0)
      new GenericArrayData(Array.fill[Any](k)(null))
    else
      new GenericArrayData(MinHash.mins(arr, k))

  override protected def nullSafeEval(input: Any): Any =
    run(input.asInstanceOf[ArrayData])

  // reference-object call, NOT CodegenFallback — the fallback path would
  // re-materialize the input row inside whole-stage codegen spans
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSigExpr", this, classOf[MinHashSigExpr].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.run($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** array<long> shingle hashes → array<struct<band:int,bucket:long>> LSH
  * band keys, the fused `lshBands(minhashSignature(…))` — one child eval,
  * one pass. Output shape matches `lshBands` so callers explode the same
  * way.
  */
case class MinHashBandsExpr(child: Expression, k: Int, bands: Int)
    extends UnaryExpression {

  private val rowsPerBand = k / bands
  require(bands * rowsPerBand == k, s"k=$k not divisible into $bands bands")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("bucket", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "minhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    run(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashBandsExpr", this,
      classOf[MinHashBandsExpr].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.run($input);")
  }

  /** Called from both eval and generated code. */
  def run(arr: ArrayData): ArrayData = {
    val empty = arr.numElements() == 0
    val sig = if (empty) null else MinHash.mins(arr, k)
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      // array_join drops null elements (no delimiter either), so an empty
      // signature joins to "" in the column formulation
      val s = if (empty) "" else {
        val sb = new java.lang.StringBuilder(rowsPerBand * 20)
        var r = 0
        while (r < rowsPerBand) {
          if (r > 0) sb.append('_')
          sb.append(sig(b * rowsPerBand + r))
          r += 1
        }
        sb.toString
      }
      val bucket = XxHash64Function.hash(
        UTF8String.fromString(s), StringType, 42L)
      out(b) = new GenericInternalRow(Array[Any](b, bucket))
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBandsExpr =
    copy(child = newChild)
}

object MinHashExprs {
  import org.apache.spark.sql.graftbridge.Bridge

  def minhashSigNative(hashes: Column, k: Int): Column =
    Bridge.column(MinHashSigExpr(Bridge.expression(hashes), k))

  def minhashBands(hashes: Column, k: Int, bands: Int): Column =
    Bridge.column(MinHashBandsExpr(Bridge.expression(hashes), k, bands))
}
