package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Custom Catalyst aggregate: the k SMALLEST longs of a group, as a
  * sorted array — the bounded-state alternative to `row_number() OVER
  * (PARTITION BY group ORDER BY v) <= k`, which must sort a group's
  * ENTIRE row set through one window task (for a posting-list sample,
  * that is a stopword's whole corpus-sized posting through one
  * reducer).
  *
  * Buffer = a max-heap of ≤ k values (O(k) state regardless of group
  * size); update admits a value iff the heap is under k or the value
  * beats the current max; merge folds one heap into the other. Fully
  * mergeable → Spark plans partial aggregation: each map partition
  * ships ONE ≤k-element buffer per group, and no per-group sort ever
  * happens anywhere. Ties/duplicates are kept (multiset semantics),
  * matching `list_slice(list(v ORDER BY v), 1, k)`. */
case class MinKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"min-k needs k > 0, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  /** Analysis-time rejection of mistyped children: `update` casts via
    * `asInstanceOf[Long]`, so an Int child would otherwise surface as a
    * ClassCastException deep inside an executor instead of a plan
    * error. Same hardening as [[ZOrder60.checkInputDataTypes]]. */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minK needs a BIGINT child, got ${child.dataType} — cast explicitly " +
          "at the call site")

  override def createAggregationBuffer(): mutable.PriorityQueue[Long] =
    mutable.PriorityQueue.empty[Long] // max-heap under the default Long ordering

  private def admit(heap: mutable.PriorityQueue[Long], v: Long): Unit =
    if (heap.size < k) heap.enqueue(v)
    else if (v < heap.head) { heap.dequeue(); heap.enqueue(v) }

  override def update(heap: mutable.PriorityQueue[Long],
      input: InternalRow): mutable.PriorityQueue[Long] = {
    val v = child.eval(input)
    if (v != null) admit(heap, v.asInstanceOf[Long])
    heap
  }

  override def merge(h1: mutable.PriorityQueue[Long],
      h2: mutable.PriorityQueue[Long]): mutable.PriorityQueue[Long] = {
    h2.foreach(admit(h1, _))
    h1
  }

  override def eval(heap: mutable.PriorityQueue[Long]): Any =
    new GenericArrayData(heap.toArray.sorted)

  override def serialize(heap: mutable.PriorityQueue[Long]): Array[Byte] = {
    val vs = heap.toArray
    val bb = ByteBuffer.allocate(4 + vs.length * 8)
    bb.putInt(vs.length)
    vs.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = createAggregationBuffer()
    var i = 0
    while (i < n) { heap.enqueue(bb.getLong); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinKAgg =
    copy(child = newChild)
}

object MinKAgg {
  /** Column-API entry point: sorted array of the k smallest values. */
  def minK(c: Column, k: Int): Column =
    Bridge.column(MinKAgg(Bridge.expression(c), k).toAggregateExpression())
}
