package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native one-pass cosine similarity over two array<double> columns.
  *
  * The Column formulation (`aggregate(zip_with(a, b, _*_), 0.0, _+_)` per
  * dot product, three of them) is built from higher-order functions, which
  * are CodegenFallback in Spark: every evaluation interprets a deep
  * expression tree, allocating a zipped array and boxing each element.
  * On the quadratic near-dup paths that evaluation IS the workload — tens
  * of millions of pairs × 64 dims. This expression runs the same
  * arithmetic as three tight loops.
  *
  * Value parity with [[graft.functions.cosine]]'s Column formulation is
  * exact and pinned by VectorExprsSpec: identical left-fold accumulation
  * order (IEEE addition is order-sensitive), `sqrt(Σa²) * sqrt(Σb²)`
  * denominator, 0.0 on zero norms, null on null/length-mismatched/
  * null-element inputs — the same outcomes null propagation gives the
  * Column version.
  */
case class CosineExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    while (i < nx) { if (x.isNullAt(i)) return null; i += 1 }
    i = 0
    while (i < ny) { if (y.isNullAt(i)) return null; i += 1 }
    var dx = 0.0
    i = 0
    while (i < nx) { val v = x.getDouble(i); dx += v * v; i += 1 }
    var dy = 0.0
    i = 0
    while (i < ny) { val v = y.getDouble(i); dy += v * v; i += 1 }
    val denom = math.sqrt(dx) * math.sqrt(dy)
    if (denom == 0.0) java.lang.Double.valueOf(0.0)
    else if (nx != ny) null // zip_with's null padding nulls the dot product
    else {
      var dot = 0.0
      i = 0
      while (i < nx) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
      java.lang.Double.valueOf(dot / denom)
    }
  }

  /** Same loops as [[nullSafeEval]], emitted into whole-stage codegen so
    * the quadratic pair stages never leave generated code (the fallback
    * path boxes an InternalRow per call).
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xs, ys) => {
      val i = ctx.freshName("i")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val anyNull = ctx.freshName("anyNull")
      val dx = ctx.freshName("dx")
      val dy = ctx.freshName("dy")
      val dot = ctx.freshName("dot")
      val denom = ctx.freshName("denom")
      val v = ctx.freshName("v")
      s"""
         |final int $nx = $xs.numElements();
         |final int $ny = $ys.numElements();
         |boolean $anyNull = false;
         |for (int $i = 0; $i < $nx && !$anyNull; $i++) $anyNull = $xs.isNullAt($i);
         |for (int $i = 0; $i < $ny && !$anyNull; $i++) $anyNull = $ys.isNullAt($i);
         |if ($anyNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dx = 0.0;
         |  for (int $i = 0; $i < $nx; $i++) { final double $v = $xs.getDouble($i); $dx += $v * $v; }
         |  double $dy = 0.0;
         |  for (int $i = 0; $i < $ny; $i++) { final double $v = $ys.getDouble($i); $dy += $v * $v; }
         |  final double $denom = java.lang.Math.sqrt($dx) * java.lang.Math.sqrt($dy);
         |  if ($denom == 0.0) {
         |    ${ev.value} = 0.0;
         |  } else if ($nx != $ny) {
         |    ${ev.isNull} = true;
         |  } else {
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $nx; $i++) $dot += $xs.getDouble($i) * $ys.getDouble($i);
         |    ${ev.value} = $dot / $denom;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineExpr =
    copy(left = newLeft, right = newRight)
}

/** Native one-pass L2 normalization of an array<double>.
  *
  * The Column formulation (`when(l2norm(a) === 0, a).otherwise(
  * transform(a, x => x / l2norm(a)))`) embeds the norm — itself an
  * O(dim) aggregate — INSIDE the transform lambda, so interpreted
  * evaluation recomputes it once per element: O(dim²) per vector, the
  * same higher-order re-evaluation class the sf10 ladder exposed for
  * shingles. This expression computes the norm once and divides once.
  * Parity with the Column form: zero vectors pass through unchanged,
  * null input → null, a null ELEMENT nulls EVERY output slot (the
  * element nulls the norm, and x / null is null for all x — exactly what
  * the composed version computes), and the sum-of-squares accumulates in
  * the same left-to-right IEEE order.
  */
case class L2NormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "l2_normalize"

  override protected def nullSafeEval(input: Any): Any = run(input.asInstanceOf[ArrayData])

  /** Called from both eval and generated code. */
  def run(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i))
        return new org.apache.spark.sql.catalyst.util.GenericArrayData(
          new Array[Any](n)) // null norm nulls every slot, like the Column form
      i += 1
    }
    var ss = 0.0
    i = 0
    while (i < n) { val v = a.getDouble(i); ss += v * v; i += 1 }
    val norm = math.sqrt(ss)
    if (norm == 0.0) a
    else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        out(i) = java.lang.Double.valueOf(a.getDouble(i) / norm)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("l2normExpr", this, classOf[L2NormalizeExpr].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.run($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): L2NormalizeExpr =
    copy(child = newChild)
}

object VectorExprs {
  import org.apache.spark.sql.graftbridge.Bridge

  def cosineNative(a: Column, b: Column): Column =
    Bridge.column(CosineExpr(
      Bridge.expression(a.cast("array<double>")),
      Bridge.expression(b.cast("array<double>"))))

  def l2normalizeNative(a: Column): Column =
    Bridge.column(L2NormalizeExpr(Bridge.expression(a.cast("array<double>"))))
}
