package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Index of a double key in a constant sorted boundary array: returns the
  * number of boundaries strictly below the key (the insertion point), i.e.
  * the range-bucket id for two-phase distributed scans ([[graft.ml.PackOps]]).
  *
  * Why native: the composed formulation is a sum of per-boundary indicator
  * terms — O(boundaries) work per row AND a generated-code body that grows
  * with the shuffle-partition count, which knocks the projection out of
  * whole-stage codegen (Janino's 64 KB method cap) exactly at cluster-scale
  * partition counts. This expression is one `Arrays.binarySearch` over a
  * referenced constant array: O(log n) per row, fixed code size at any n.
  *
  * Child must be DoubleType (callers cast); boundaries must be sorted and
  * distinct, which [[graft.ml.PackOps.prefixSum]] guarantees
  * (`.distinct.sorted` on the quantile probes).
  */
case class SearchSortedExpr(child: Expression, bounds: Seq[Double])
    extends UnaryExpression {

  // child must resolve to DoubleType — the [[searchSortedNative]] builder
  // inserts the cast (AbstractDataType/ImplicitCastInputTypes are
  // sql-private, so the contract lives in the builder, not the analyzer)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "search_sorted"

  @transient private lazy val arr: Array[Double] = bounds.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val idx = java.util.Arrays.binarySearch(arr, input.asInstanceOf[Double])
    Integer.valueOf(if (idx >= 0) idx else -idx - 1)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val b = ctx.addReferenceObj("bounds", arr, "double[]")
      val idx = ctx.freshName("idx")
      s"""
        int $idx = java.util.Arrays.binarySearch($b, $v);
        ${ev.value} = $idx >= 0 ? $idx : -$idx - 1;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SearchSortedExpr =
    copy(child = newChild)
}

object SearchSortedExpr {
  /** Column API: bucket id of `v` among sorted distinct `bounds`. */
  def searchSortedNative(v: Column, bounds: Array[Double]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      SearchSortedExpr(
        org.apache.spark.sql.graftbridge.Bridge.expression(v.cast("double")),
        bounds.toSeq))
}
