package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k state: a min-heap of (sim, id) pairs whose head is the
  * WORST kept pair under the (sim desc, id asc) ranking, so an incoming
  * pair replaces the head in O(log k) only when it beats it. At most k
  * entries live at any time — this is what bounds the shuffle.
  *
  * The bound may be supplied lazily (`k <= 0` = "unsized"): a buffer
  * created before any input row has been seen adopts the k carried on the
  * first row (or absorbed buffer) it meets. This is what lets the bound be
  * a PLAN value — e.g. `greatest(50, corpus_count / 10)` from a 1-row
  * broadcast stats frame — instead of a driver-side `count()` job run
  * before the plan is built.
  */
final class TopKHeap(private var k: Int) {
  // worst-first: lower sim first; on ties, higher id first (ranking
  // prefers the lower id, so the higher id is the worse pair)
  private val heap = new java.util.PriorityQueue[(Double, Long)](
    math.max(1, k),
    (a: (Double, Long), b: (Double, Long)) => {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    })

  def capacity: Int = k

  /** Adopt a bound for an unsized heap; a sized heap keeps its bound (all
    * rows of one group carry the same plan-computed k, so a conflict can
    * only come from a caller bug — shrinking a live heap would silently
    * drop kept pairs, so we never do it).
    */
  def ensureSized(k0: Int): Unit = if (k <= 0) {
    require(k0 > 0, s"topk_pairs: k must be positive, got $k0")
    k = k0
  }

  // Double.compare (not >) so NaN orders the same way here as in the heap
  // comparator and in Spark's `sim DESC` sort: NaN ranks above every other
  // value instead of being silently dropped once the heap fills.
  private def beats(s: Double, i: Long, worst: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(s, worst._1)
    c > 0 || (c == 0 && i < worst._2)
  }

  def offer(s: Double, i: Long): Unit =
    if (heap.size < k) heap.add((s, i))
    else if (k > 0 && beats(s, i, heap.peek())) { heap.poll(); heap.add((s, i)) }

  def absorb(other: TopKHeap): Unit = {
    if (k <= 0) k = other.k
    val it = other.heap.iterator()
    while (it.hasNext) { val (s, i) = it.next(); offer(s, i) }
  }

  /** Contents best-first: (sim desc, id asc). */
  def sortedBest: Array[(Double, Long)] = {
    val arr = new Array[(Double, Long)](heap.size)
    heap.toArray(arr)
    arr.sortWith { (a, b) =>
      val c = java.lang.Double.compare(a._1, b._1)
      c > 0 || (c == 0 && a._2 < b._2)
    }
  }

  def toBytes: Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(8 + heap.size * 16)
    buf.putInt(k)
    buf.putInt(heap.size)
    val it = heap.iterator()
    while (it.hasNext) { val (s, i) = it.next(); buf.putDouble(s); buf.putLong(i) }
    buf.array()
  }
}

object TopKHeap {
  def fromBytes(bytes: Array[Byte]): TopKHeap = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val k = buf.getInt
    val n = buf.getInt
    val h = new TopKHeap(k)
    var j = 0
    while (j < n) { h.offer(buf.getDouble, buf.getLong); j += 1 }
    h
  }
}

/** Partial-merge top-k aggregate: `topk_pairs(sim, id, k)` returns the k
  * best (id, sim) pairs as an array of structs, best-first.
  *
  * This replaces the rank-window idiom for exact nearest-neighbor search:
  * a window must shuffle EVERY (query, candidate) pair to the query's
  * partition before ranking — O(|corpus| × |queries|) rows through the
  * exchange. As a TypedImperativeAggregate the map side reduces each
  * partition to one k-entry heap per query before the shuffle, so the
  * exchange carries partitions × queries × k entries no matter how big
  * the corpus is. That is the difference between an exact-search plan
  * that survives 100 TB and one that does not.
  *
  * `k` is an ordinary child expression: a literal for the classic fixed-k
  * search, or a plan-computed column (e.g. a corpus-fraction shortlist
  * bound carried on every row from a 1-row broadcast stats frame) — which
  * removes the driver-side `count()` job the fraction would otherwise
  * need. All rows of one group must carry the same k; the buffer adopts
  * the first one it sees and rejects a conflicting k on any later row.
  *
  * Rank ties resolve exactly like `row_number() OVER (ORDER BY sim DESC,
  * id ASC)`: callers that need oracle-stable output should pass an
  * already-rounded sim (see [[stableRound]]) so ranking happens on the
  * values being compared downstream.
  */
final case class TopKPairsAgg(
    sim: Expression, id: Expression, kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with ImplicitCastInputTypes {

  // a literal k fails fast at plan time; a plan-computed k is validated
  // when the first row's value reaches the buffer (ensureSized)
  private val staticK: Option[Int] = kExpr match {
    case Literal(v: Int, IntegerType) => Some(v)
    case _ => None
  }
  staticK.foreach(k => require(k > 0, s"topk_pairs: k must be positive, got $k"))

  override def children: Seq[Expression] = Seq(sim, id, kExpr)
  // Analyzer casts or rejects mistyped args (e.g. topk_pairs(int_col, id, 5)
  // via the SQL surface) instead of a per-row ClassCastException in update().
  // Return type inferred as Seq[DataType] (covariant with the base's
  // Seq[AbstractDataType], which is private[sql] and unnameable here).
  override def inputTypes = Seq[DataType](DoubleType, LongType, IntegerType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n_id", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKHeap =
    new TopKHeap(staticK.getOrElse(0))

  override def update(h: TopKHeap, input: InternalRow): TopKHeap = {
    if (h.capacity <= 0) {
      val kv = kExpr.eval(input)
      require(kv != null, "topk_pairs: k must not be null")
      h.ensureSized(kv.asInstanceOf[Int])
    } else if (staticK.isEmpty) {
      // dynamic k adopts the first row's value; a caller bug feeding a
      // non-constant k within one group would otherwise silently bound
      // the shortlist by whichever row arrived first. The extra eval is
      // a field read off the joined stats column, dynamic-k paths only.
      val kv = kExpr.eval(input)
      require(kv != null && kv.asInstanceOf[Int] == h.capacity,
        s"topk_pairs: k must be constant per group — heap sized ${h.capacity}, row has $kv")
    }
    val s = sim.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      h.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    h
  }

  override def merge(a: TopKHeap, b: TopKHeap): TopKHeap = { a.absorb(b); a }

  override def eval(h: TopKHeap): Any =
    new GenericArrayData(h.sortedBest.map { case (s, i) =>
      new GenericInternalRow(Array[Any](i, s))
    })

  override def serialize(h: TopKHeap): Array[Byte] = h.toBytes
  override def deserialize(bytes: Array[Byte]): TopKHeap =
    TopKHeap.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKPairsAgg =
    copy(sim = c(0), id = c(1), kExpr = c(2))
  override def prettyName: String = "topk_pairs"
}
