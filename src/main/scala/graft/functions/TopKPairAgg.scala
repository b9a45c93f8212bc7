package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Custom Catalyst aggregate: the k BEST (score, id) pairs of a group —
  * best = highest score, ties broken by smallest id — returned as a
  * struct array already sorted best-first. The bounded-state
  * alternative to `row_number() OVER (PARTITION BY grp ORDER BY score
  * DESC, id) <= k`: the window form sorts each group's ENTIRE row set
  * through one task (a per-domain quota over a 100 TB corpus funnels
  * the hottest domain's every row through one reducer), while this
  * buffer is a min-heap of ≤ k pairs (O(k) state regardless of group
  * size) that Spark partial-aggregates — each map partition ships one
  * ≤k-element buffer per group and no per-group sort ever happens.
  *
  * Same family as [[MinKAgg]] (single-column min-k); this carries the
  * (score, id) pair so rank order and survivor identity travel
  * together. NaN scores are NEVER ADMITTED: under java.lang.Double's
  * total order NaN is the LARGEST value, so a NaN row (e.g. a 0/0
  * quality ratio on empty text) would silently outrank every real
  * score and occupy top slots. A NaN quality is a broken input, not a
  * best input — it is skipped like a NULL. (SQL engines would instead
  * rank it first under ORDER BY score DESC; callers gated against a
  * SQL oracle must keep NaN out of the input, which the gated corpora
  * satisfy.) */
case class TopKPairAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with BinaryLike[Expression] {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def left: Expression = score
  override def right: Expression = id

  /** Analysis-time rejection of mistyped children: `update` casts via
    * `asInstanceOf`, so an Int/Float child would otherwise surface as a
    * ClassCastException deep inside an executor instead of a plan
    * error. Same hardening as [[ZOrder60.checkInputDataTypes]]. */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topK needs (DOUBLE score, BIGINT id), got (${score.dataType}, " +
          s"${id.dataType}) — cast explicitly at the call site")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  /** `(s1, i1)` strictly better than `(s2, i2)`: higher score wins,
    * equal scores fall to the smaller id. `Double.compare` (not `<`)
    * so NaN has a stable total-order slot instead of poisoning every
    * comparison false. */
  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  /** Heap head = the WORST kept pair, so admit tests are O(1). */
  private val worstFirst: Ordering[(Double, Long)] =
    (a: (Double, Long), b: (Double, Long)) =>
      if (better(b._1, b._2, a._1, a._2)) 1
      else if (better(a._1, a._2, b._1, b._2)) -1
      else 0

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  private def admit(heap: mutable.PriorityQueue[(Double, Long)],
      s: Double, i: Long): Unit =
    if (s.isNaN) ()                   // see scaladoc: NaN is skipped, not ranked
    else if (heap.size < k) heap.enqueue((s, i))
    else if (better(s, i, heap.head._1, heap.head._2)) {
      heap.dequeue(); heap.enqueue((s, i))
    }

  override def update(heap: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      admit(heap, s.asInstanceOf[Double], i.asInstanceOf[Long])
    heap
  }

  override def merge(h1: mutable.PriorityQueue[(Double, Long)],
      h2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    h2.foreach { case (s, i) => admit(h1, s, i) }
    h1
  }

  override def eval(heap: mutable.PriorityQueue[(Double, Long)]): Any = {
    val best = heap.toArray.sortWith { case ((s1, i1), (s2, i2)) =>
      better(s1, i1, s2, i2)
    }
    new GenericArrayData(best.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    })
  }

  override def serialize(heap: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val vs = heap.toArray
    val bb = ByteBuffer.allocate(4 + vs.length * 16)
    bb.putInt(vs.length)
    vs.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = createAggregationBuffer()
    var i = 0
    while (i < n) { heap.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairAgg =
    copy(score = newLeft, id = newRight)
}

object TopKPairAgg {
  /** Column-API entry point: the k best (score desc, id asc) pairs as
    * `array<struct<score, id>>`, sorted best-first. */
  def topK(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKPairAgg(Bridge.expression(score), Bridge.expression(id), k)
        .toAggregateExpression())
}
