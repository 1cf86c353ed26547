package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash-64 over a token array.
  *
  * The built-in-composition version (functions.simhash64) walks the token
  * array 64 times (once per bit) through higher-order functions; this
  * expression makes one pass per row, accumulating all 64 bit-counters —
  * O(n) instead of O(64n) — with the same xxhash64(seed=42) token hashes so
  * both formulations agree bit-for-bit (cross-checked in DedupSpec).
  *
  * Codegen: emits a tight loop via doGenCode (no virtual calls per token),
  * keeping the expression inside WholeStageCodegen.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      val sig = ctx.freshName("sig")
      val xxh = classOf[XXH64].getName
      s"""
        int[] $counts = new int[64];
        for (int $i = 0; $i < $arr.numElements(); $i++) {
          if (!$arr.isNullAt($i)) {
            org.apache.spark.unsafe.types.UTF8String $s = $arr.getUTF8String($i);
            long $h = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(),
              $s.numBytes(), 42L);
            for (int $j = 0; $j < 64; $j++) {
              if ((($h >>> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
            }
          }
        }
        long $sig = 0L;
        for (int $j = 0; $j < 64; $j++) {
          if ($counts[$j] > 0) $sig |= (1L << $j);
        }
        ${ev.value} = $sig;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash64Expr {
  /** Column API for the native expression. */
  def simhash64Native(tokens: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      SimHash64Expr(org.apache.spark.sql.graftbridge.Bridge.expression(tokens)))
}
