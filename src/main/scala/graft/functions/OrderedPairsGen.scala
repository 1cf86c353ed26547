package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Generator: all strictly-ordered pairs (a < b) of an array<long> of ids.
  *
  * This is the in-row replacement for the LSH candidate SELF-JOIN: where
  * `bands.join(bands, Seq("band","bucket")).filter(a < b)` needs the band
  * rows shuffled, SORTED, and sort-merge-joined (the exchange read twice,
  * the sort run twice — once per join side), `groupBy(band, bucket) +
  * collect_list(doc_id)` followed by this generator reads the one exchange
  * once and emits the identical pair multiset: for a bucket membership
  * list of n ids it yields the n·(n−1)/2 pairs {(x, y) : x < y} — exactly
  * the rows the join's `a < b` filter keeps (ids equal under `<` never
  * pair, matching the join; duplicate ids in the list yield duplicate
  * cross pairs, matching the join — the downstream `distinct()` collapses
  * both identically).
  *
  * The expansion is LAZY (an iterator, not a materialized pair array), so
  * a near-cap bucket (maxBucket = 1000 → ~500k pairs) streams through
  * GenerateExec without a per-row half-megastruct allocation.
  *
  * Input contract: non-null long ids (collect_list never emits null
  * elements, and the LSH doc_id spaces are non-null by construction).
  */
case class OrderedPairsGen(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("a", LongType, nullable = true),
    StructField("b", LongType, nullable = true)))

  override def prettyName: String = "ordered_pairs"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val ids = v.asInstanceOf[ArrayData].toLongArray()
      val n = ids.length
      if (n < 2) Iterator.empty
      else {
        // ascending sort makes (ids(i), ids(j)) with i < j exactly the
        // a < b pairs; equal ids sort adjacent and are skipped below
        java.util.Arrays.sort(ids)
        new Iterator[InternalRow] {
          private var i = 0
          private var j = 1
          // position (i, j) on the next strict pair: skip j over ids equal
          // to ids(i) (only possible right after i advances — the array is
          // sorted, so equals are adjacent), roll i when j runs off
          private def advance(): Unit = {
            while (i < n - 1) {
              while (j < n && ids(i) == ids(j)) j += 1
              if (j < n) return
              i += 1
              j = i + 1
            }
          }
          advance()
          override def hasNext: Boolean = i < n - 1 && j < n
          override def next(): InternalRow = {
            val r = new GenericInternalRow(Array[Any](ids(i), ids(j)))
            j += 1
            advance()
            r
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): OrderedPairsGen =
    copy(child = newChild)
}

object OrderedPairsGen {
  /** Column API: explode-style generator of the strictly-ordered id pairs
    * of an array<long>; use as `select(orderedPairs(col).as(Seq("a","b")))`.
    */
  def orderedPairs(ids: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      OrderedPairsGen(org.apache.spark.sql.graftbridge.Bridge.expression(ids)))
}
