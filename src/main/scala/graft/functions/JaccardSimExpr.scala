package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaccard similarity of two arrays in ONE pass over each side, no array
  * materialization — the native replacement for
  * `size(array_intersect(a,b)) / size(array_union(a,b))` with the
  * `union == 0 → 1.0` guard ([[graft.functions.jaccardColumns]] keeps that
  * formulation as the parity reference).
  *
  * The builtin pair builds TWO hash sets per evaluation twice over
  * (array_intersect and array_union each re-hash both inputs), then
  * materializes both result ARRAYS just for their lengths. This expression
  * computes |distinct(a) ∩ distinct(b)| and |distinct(a) ∪ distinct(b)|
  * from one set build + one probe pass and allocates nothing but the sets.
  * It sits in the inner verification loop of every minhash gate
  * (q_dedup_minhash, q_dedup_minhash_incr, the MinHashStore probes) and
  * q_ngram_jaccard.
  *
  * Value parity with the builtin formulation (JaccardExprSpec):
  *  - distinct semantics: duplicates on either side count once, exactly as
  *    array_intersect/array_union dedup;
  *  - a null ELEMENT is one distinct value (in the intersection iff both
  *    sides carry a null — array_intersect/union semantics);
  *  - union empty (both arrays empty) → 1.0, same as the guard.
  *  - one deliberate divergence, impossible on the query paths: a NULL
  *    ARRAY input yields null here, where the legacy column formulation
  *    yields 1.0 through `size(null) = -1` on both numerator and
  *    denominator (−1/−1). Every caller builds both sides from non-null
  *    shingle pipelines (the minhash bases filter `size(sh) > 0`), and the
  *    DuckDB oracles return NULL there too, so null-in → null is the
  *    oracle-faithful choice. Pinned by JaccardExprSpec.
  *
  * Element types covered: LongType (shingle hashes — specialized primitive
  * set, no boxing) and StringType (text n-grams — UTF8String keys, whose
  * equals/hashCode agree with Spark's binary string equality).
  */
case class JaccardSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  private lazy val isLongElem: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
        if lt == rt && (lt == LongType || lt == StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jaccard_sim wants two array<long> or two array<string>, got " +
            s"${left.dataType.sql} and ${right.dataType.sql}")
    }
  }

  /** Called from both eval and generated code. */
  def run(a: ArrayData, b: ArrayData): Double = {
    var inter = 0
    var extra = 0 // distinct values of b not in a
    var da = 0    // distinct values of a
    if (isLongElem) {
      val setA = new org.apache.spark.util.collection.OpenHashSet[Long](
        math.max(a.numElements(), 1))
      var nullA = false
      var i = 0
      val na = a.numElements()
      while (i < na) {
        if (a.isNullAt(i)) nullA = true
        else setA.add(a.getLong(i))
        i += 1
      }
      da = setA.size + (if (nullA) 1 else 0)
      val seenB = new org.apache.spark.util.collection.OpenHashSet[Long](
        math.max(b.numElements(), 1))
      var nullB = false
      var j = 0
      val nb = b.numElements()
      while (j < nb) {
        if (b.isNullAt(j)) {
          if (!nullB) { nullB = true; if (nullA) inter += 1 else extra += 1 }
        } else {
          val v = b.getLong(j)
          if (!seenB.contains(v)) {
            seenB.add(v)
            if (setA.contains(v)) inter += 1 else extra += 1
          }
        }
        j += 1
      }
    } else {
      val setA = new java.util.HashSet[UTF8String]()
      var nullA = false
      var i = 0
      val na = a.numElements()
      while (i < na) {
        if (a.isNullAt(i)) nullA = true
        else setA.add(a.getUTF8String(i))
        i += 1
      }
      da = setA.size + (if (nullA) 1 else 0)
      val seenB = new java.util.HashSet[UTF8String]()
      var nullB = false
      var j = 0
      val nb = b.numElements()
      while (j < nb) {
        if (b.isNullAt(j)) {
          if (!nullB) { nullB = true; if (nullA) inter += 1 else extra += 1 }
        } else {
          val v = b.getUTF8String(j)
          if (seenB.add(v)) {
            if (setA.contains(v)) inter += 1 else extra += 1
          }
        }
        j += 1
      }
    }
    val uni = da + extra
    if (uni == 0) 1.0 else inter.toDouble / uni.toDouble
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    run(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  // reference-object call, NOT CodegenFallback (the TokensExpr pattern):
  // stays inside the enclosing whole-stage-codegen span
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jaccardSimExpr", this,
      classOf[JaccardSimExpr].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.run($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSimExpr =
    copy(left = newLeft, right = newRight)
}

object JaccardSimExpr {
  def jaccardNative(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      JaccardSimExpr(
        org.apache.spark.sql.graftbridge.Bridge.expression(a),
        org.apache.spark.sql.graftbridge.Bridge.expression(b)))
}
