package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** I20 — `TopKMinL`: the k smallest BIGINT values of a group as a
  * sorted array, held in an O(k) bounded buffer — the custom-AGGREGATE
  * leg of the extension ladder (I1/I7–I19 are scalar expressions, I12 a
  * planner strategy, I16 an optimizer rule; this is
  * `TypedImperativeAggregate`, the remaining Catalyst extension point).
  *
  * Why not `row_number() ≤ k`: a window must shuffle and SORT every
  * group's full row set before discarding all but k rows — at 100 TB
  * that is a corpus-sized sort for a k-row answer. This aggregate keeps
  * a k-element max-heap per group, combines map-side (partial
  * aggregation applies — each partition ships at most k values per
  * group), and merges heaps associatively, so the exchange carries
  * O(groups·k), not O(rows). Multiset semantics (duplicates retained)
  * make the result a pure function of the group's value multiset —
  * deterministic, so the DuckDB twin is the plain window form.
  */
case class TopKMinL(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKMinL.MaxHeap] {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "topk_min_l"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects BIGINT")

  override def createAggregationBuffer(): TopKMinL.MaxHeap =
    new TopKMinL.MaxHeap(k)

  override def update(b: TopKMinL.MaxHeap, input: InternalRow): TopKMinL.MaxHeap = {
    val v = child.eval(input)
    if (v != null) b.offer(v.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKMinL.MaxHeap, o: TopKMinL.MaxHeap): TopKMinL.MaxHeap = {
    var i = 0
    while (i < o.size) { b.offer(o.values(i)); i += 1 }
    b
  }

  override def eval(b: TopKMinL.MaxHeap): Any =
    UnsafeArrayData.fromPrimitiveArray(b.sortedAsc)

  override def serialize(b: TopKMinL.MaxHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * b.size)
    bb.putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putLong(b.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKMinL.MaxHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKMinL.MaxHeap(k)
    var i = 0
    while (i < n) { h.offer(bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKMinL =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKMinL =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKMinL =
    copy(child = newChildren.head)
}

object TopKMinL {

  /** Fixed-capacity max-heap over primitive longs: root = largest kept
    * value, so replacing the root with any smaller candidate maintains
    * "the k smallest seen". No boxing, O(log k) per offer. */
  final class MaxHeap(capacity: Int) {
    val values = new Array[Long](capacity)
    var size: Int = 0

    def offer(v: Long): Unit =
      if (size < capacity) {
        values(size) = v
        size += 1
        var i = size - 1
        while (i > 0 && values((i - 1) / 2) < values(i)) {
          val t = values(i); values(i) = values((i - 1) / 2)
          values((i - 1) / 2) = t
          i = (i - 1) / 2
        }
      } else if (v < values(0)) {
        values(0) = v
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1
          val r = 2 * i + 2
          var m = i
          if (l < size && values(l) > values(m)) m = l
          if (r < size && values(r) > values(m)) m = r
          if (m == i) done = true
          else {
            val t = values(i); values(i) = values(m); values(m) = t
            i = m
          }
        }
      }

    def sortedAsc: Array[Long] = {
      val out = java.util.Arrays.copyOf(values, size)
      java.util.Arrays.sort(out)
      out
    }
  }

  def apply(c: Column, k: Int): Column =
    Bridge.column(
      new TopKMinL(Bridge.expression(c), k).toAggregateExpression())
}
