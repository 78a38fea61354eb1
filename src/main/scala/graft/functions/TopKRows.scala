package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap group-wise top-k aggregate: keeps the k best
  * (value DESC, id ASC) pairs per group in a k-entry heap.
  *
  * Why a custom `TypedImperativeAggregate` (the library's fifth native
  * expression, and its first aggregate): the standard group top-k —
  * `row_number() OVER (PARTITION BY g ORDER BY v DESC)` then `rn <= k`
  * — must co-locate EVERY row of a group on one reducer before ranking;
  * a hot group (one viral key with 10⁹ rows at web scale) serializes
  * there. The composable aggregate escape,
  * `slice(array_sort(collect_list(struct(...))), 1, k)`, looks
  * partial-aggregated but is not bounded: `collect_list`'s partial
  * state grows with the rows seen, so the hot group's whole payload
  * still travels. This aggregate's state is ≤ k entries at every
  * moment — map-side partials, shuffled partials, and the merged
  * final are all k-bounded, so a group's cost is O(rows·log k) compute
  * and O(k) bytes moved no matter how hot it is.
  *
  * Determinism: the kept set and its order are a pure function of the
  * multiset of inputs — "better" = higher value, then smaller id
  * (ties on both keep the first-seen, but (value, id) pairs are unique
  * when id is unique, which callers ensure). Output is the k best as
  * `array<struct<value double, id long>>`, best first.
  *
  * Null contract: rows with a null value or null id are ignored (the
  * window formulation drops them via ORDER BY semantics too once
  * filtered; callers filter nulls for cross-engine parity).
  */
case class TopKRows(valueExpr: Expression, idExpr: Expression, k: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(valueExpr, idExpr)

  // AbstractDataType (what ExpectsInputTypes wants) is private[sql],
  // so type discipline is a plain check: callers cast to the exact
  // primitive pair ([[graft.ext.GroupTopK]] does).
  override def checkInputDataTypes(): TypeCheckResult =
    if (valueExpr.dataType == DoubleType && idExpr.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_rows expects (double, bigint), got " +
        s"${valueExpr.dataType.simpleString}, ${idExpr.dataType.simpleString}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))),
    containsNull = false)

  /** Heap ordering with the WORST kept entry at the head (greatest):
    * smaller value is worse; on equal values a larger id is worse. */
  private def worstFirst: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    new mutable.PriorityQueue[(Double, Long)]()(worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
                    cand: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(cand)
    else if (worstFirst.compare(cand, buf.head) < 0) {
      buf.dequeue(); buf.enqueue(cand)
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val v = valueExpr.eval(input)
    val i = idExpr.eval(input)
    if (v != null && i != null)
      offer(buf, (v.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // ascending under worstFirst = best first ("less" = better)
    val best = buf.toArray.sorted(worstFirst)
    new GenericArrayData(best.map { case (v, i) =>
      InternalRow(v, i): Any
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (v, i) => bb.putDouble(v); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.enqueue((bb.getDouble, bb.getLong)); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRows =
    copy(valueExpr = newChildren(0), idExpr = newChildren(1))

  override def prettyName: String = "top_k_rows"
}
