package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exclusive prefix sums over a SORTED (bucket, count) struct array:
  * element i of the result is (bucket_i, Σ count_j for j < i).
  *
  * Why an expression: Spark has fold (`aggregate`) and map (`transform`)
  * higher-order functions but no scan, so an in-plan exclusive prefix
  * over an array is otherwise O(n²) `aggregate(slice(...))` per element —
  * 14M interpreted ops per row at the renumber's bucket counts. This is
  * one O(n) pass, evaluated once per GROUP row (topics), never on a data
  * row, so CodegenFallback costs nothing measurable and keeps the struct
  * plumbing simple.
  *
  * Used by [[graft.etl.OctaveScan]] to turn per-(key, bucket) counts into
  * exclusive bucket bases with a single tiny aggregation instead of a
  * window + triangular-join chain of AQE stages.
  */
case class PrefixBasesExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("bkt", IntegerType, nullable = false),
    StructField("base", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _) if s.length == 2 &&
          s(0).dataType == IntegerType && s(1).dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"prefix_bases needs array<struct<int,bigint>>, got $dt")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var acc = 0L
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      out(i) = new GenericInternalRow(Array[Any](row.getInt(0), acc))
      acc += row.getLong(1)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "prefix_bases"
  override protected def withNewChildInternal(c: Expression): PrefixBasesExpr =
    copy(child = c)
}

object PrefixBasesExpr {
  def prefixBases(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(PrefixBasesExpr(Bridge.expression(c)))
  }
}
