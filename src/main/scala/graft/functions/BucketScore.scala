package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Static kernel: Σ weights[b] over an `array<long>` of bucket ids. */
object BucketScoreKernel {
  def compute(bs: ArrayData, w: Array[Long]): Long = {
    var acc = 0L
    var i = 0
    val n = bs.numElements()
    while (i < n) { acc += w(bs.getLong(i).toInt); i += 1 }
    acc
  }
}

/** Codegen'd per-ROW weighted bucket sum — the stateless DSIR scorer:
  * with [[NgramHash60s.gramBuckets]] feeding it, a document scores in
  * one narrow projection with no explode, no shuffle, and no
  * aggregation state, which is exactly the shape a streaming
  * micro-batch scorer needs (and the built-in `aggregate(transform(…))`
  * chain is an interpreted CodegenFallback lambda per element). The
  * weight table rides along as a codegen reference object — O(B) per
  * task, zero per-row setup. */
case class BucketScore(child: Expression, weights: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(x: Any): Any =
    BucketScoreKernel.compute(x.asInstanceOf[ArrayData], weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("bucketWeights", weights, "long[]")
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.BucketScoreKernel.compute($x, $wRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BucketScore =
    copy(child = newChild)
}

object BucketScore {
  def score(buckets: Column, weights: Array[Long]): Column =
    Bridge.column(BucketScore(Bridge.expression(buckets), weights))
}
