package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All multi-table LSH signatures in one expression: input array<double>
  * vector → array<long> of `tables` bit-signatures (`planes` bits each).
  *
  * Replaces tables×planes separate aggregate/zip_with Column expressions,
  * whose generated Java (128 inlined 64-element literal arrays) cost ~3 s
  * of janino compilation per query. Here the sign matrices live once in
  * the expression instance and the work is a tight triple loop.
  */
case class HyperplaneSigsExpr(child: Expression, planes: Int, tables: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_sigs"

  // sign matrices [table][plane][dim]; dims resolved lazily from the first
  // row (all vectors in a column share dimensionality)
  @transient private var signs: Array[Array[Array[Double]]] = _
  @transient private var dims: Int = -1

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (signs == null || dims != n) {
      dims = n
      signs = Array.tabulate(tables, planes)((t, p) => planeSigns(t, p, n))
    }
    val vec = new Array[Double](n)
    var i = 0
    while (i < n) { vec(i) = arr.getDouble(i); i += 1 }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var p = 0
      while (p < planes) {
        val s = signs(t)(p)
        var dot = 0.0
        var d = 0
        while (d < n) { dot += vec(d) * s(d); d += 1 }
        if (dot > 0) sig |= (1L << p)
        p += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigsExpr =
    copy(child = newChild)
}

object HyperplaneSigsExpr {
  def hyperplaneSigs(vec: Column, planes: Int, tables: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      HyperplaneSigsExpr(
        org.apache.spark.sql.graftbridge.Bridge.expression(vec), planes, tables))
}
