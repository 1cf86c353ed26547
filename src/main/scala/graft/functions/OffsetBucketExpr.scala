package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Range bucket of a non-negative long key that is a PURE MONOTONE function
  * of the key — no min/max statistics job needed to pick boundaries.
  *
  * Scheme (octave + m high bits): keys below 2^m map to themselves; larger
  * keys map to `t·2^m + (key >> t)` where `t = bitLength(key) − m`. Each
  * power-of-two octave splits into 2^m sub-ranges, so for keys spanning any
  * range the largest bucket holds ≈ 1/2^m of a uniform key population,
  * and the total bucket count is ≤ (64−m+1)·2^m — metadata scale at any m
  * the shuffle-partition count implies (m=12 → ≤ ~217k).
  *
  * Monotone: t is non-decreasing in the key; within one t the mapping is a
  * right shift; across t₁<t₂, bucket₁ < (t₁+1)·2^m ≤ t₂·2^m ≤ bucket₂.
  * Negative keys (out of contract for kafka offsets) all land in bucket −1,
  * which still sorts below every non-negative bucket — ordering holds.
  *
  * Why an expression: there is no leading-zeros builtin, and a
  * floor(log2(double)) formulation can break monotonicity at octave
  * boundaries via floating rounding. One `Long.numberOfLeadingZeros` call,
  * fixed codegen size.
  */
case class OffsetBucketExpr(child: Expression, m: Int) extends UnaryExpression {

  // Upper bound 25 keeps the Int bucket id overflow-free: a non-negative
  // long key has bitLength ≤ 63, so t ≤ 63−m and bucket < (t+1)·2^m ≤
  // (64−m)·2^m, which fits Int iff m ≤ 25 ((64−25)·2^25 ≈ 1.31e9 < 2^31;
  // m=26 gives 38·2^26 ≈ 2.55e9 — silent negative buckets that would
  // break the documented monotonicity).
  require(m >= 1 && m <= 25, s"octave bits out of range: $m")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "offset_bucket"

  override protected def nullSafeEval(input: Any): Any = {
    val o = input.asInstanceOf[Long]
    Integer.valueOf(OffsetBucketExpr.bucket(o, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, o => {
      val t = ctx.freshName("t")
      s"""
        if ($o < 0L) {
          ${ev.value} = -1;
        } else if ($o < (1L << $m)) {
          ${ev.value} = (int) $o;
        } else {
          int $t = 64 - java.lang.Long.numberOfLeadingZeros($o) - $m;
          ${ev.value} = $t * (1 << $m) + (int) ($o >>> $t);
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): OffsetBucketExpr =
    copy(child = newChild)
}

object OffsetBucketExpr {

  private[functions] def bucket(o: Long, m: Int): Int =
    if (o < 0L) -1
    else if (o < (1L << m)) o.toInt
    else {
      val t = 64 - java.lang.Long.numberOfLeadingZeros(o) - m
      t * (1 << m) + (o >>> t).toInt
    }

  /** Column API: monotone octave bucket of a long key; `m` high bits per
    * octave (≈ 2^m-way parallelism over a uniform key range).
    */
  def offsetBucketNative(key: Column, m: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      OffsetBucketExpr(
        org.apache.spark.sql.graftbridge.Bridge.expression(key.cast("long")), m))
}
