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

/** [[OffsetBucketExpr]] of the SHIFTED key `key − base` (saturating): the
  * min-key normalization for arbitrary integral domains. The octave
  * scheme's bucket width is 2^(bitLength(key)−m), so a key population
  * clustered at a high offset (epoch milliseconds, snowflake ids) collapses
  * into one or two enormous buckets — the single-task window the scheme
  * exists to avoid (r17 advice). Subtracting the domain's minimum (a plan
  * constant — scalar subquery or literal) re-bases any domain to
  * dense-from-0, where the octave split spreads it ≈ 2^m ways.
  *
  * Monotonicity (what the prefix-sum needs) is preserved: key − base is
  * strictly monotone in key for a fixed base, SATURATING the subtraction
  * at ±Long.MaxValue/MinValue on a > 2^63 span keeps it weakly monotone
  * (ties collapse into one bucket, which the within-bucket ordering then
  * sorts), and [[OffsetBucketExpr]] is monotone in its input.
  */
case class ShiftedOffsetBucketExpr(left: Expression, right: Expression, m: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(m >= 1 && m <= 25, s"octave bits out of range: $m")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "offset_bucket_shifted"

  override protected def nullSafeEval(key: Any, base: Any): Any =
    Integer.valueOf(OffsetBucketExpr.bucket(
      OffsetBucketExpr.saturatingSub(
        key.asInstanceOf[Long], base.asInstanceOf[Long]), m))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (key, base) => {
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      s"""
        long $d = $key - $base;
        if ((($key ^ $base) & ($key ^ $d)) < 0) {
          $d = $key >= 0L ? Long.MAX_VALUE : Long.MIN_VALUE;
        }
        if ($d < 0L) {
          ${ev.value} = -1;
        } else if ($d < (1L << $m)) {
          ${ev.value} = (int) $d;
        } else {
          int $t = 64 - java.lang.Long.numberOfLeadingZeros($d) - $m;
          ${ev.value} = $t * (1 << $m) + (int) ($d >>> $t);
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShiftedOffsetBucketExpr =
    copy(left = newLeft, right = newRight)
}

object OffsetBucketExpr {

  /** key − base, saturating at ±Long extremes instead of wrapping (a wrap
    * would break bucket monotonicity on a > 2^63 key span).
    */
  private[functions] def saturatingSub(key: Long, base: Long): Long = {
    val d = key - base
    if (((key ^ base) & (key ^ d)) < 0)
      if (key >= 0L) Long.MaxValue else Long.MinValue
    else d
  }

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

  /** Column API: monotone octave bucket of `key − base` (saturating) —
    * `base` is a plan constant (literal or scalar subquery), typically the
    * domain's min key; see [[ShiftedOffsetBucketExpr]].
    */
  def offsetBucketShifted(key: Column, base: Column, m: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      ShiftedOffsetBucketExpr(
        org.apache.spark.sql.graftbridge.Bridge.expression(key.cast("long")),
        org.apache.spark.sql.graftbridge.Bridge.expression(base.cast("long")), m))
}
