package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Static kernel — top-level object so Scala emits static forwarders the
  * generated Java can call directly. Sequential double fold, identical
  * arithmetic to [[Portable.cosine]]'s built-in formulation and to the
  * DuckDB oracle ([[Portable.cosineSql]]). */
object CosineKernel {
  def compute(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements()
    // fail loudly on a truncated/corrupt embedding — silently folding
    // over min(len) would rank the corrupt vector with a plausible
    // cosine (and diverge from the fixed-dim oracle formulation)
    require(y.numElements() == n,
      s"embedding length mismatch: $n vs ${y.numElements()}")
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val a = x.getFloat(i).toDouble
      val b = y.getFloat(i).toDouble
      dot += a * b; nx += a * a; ny += b * b
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }
}

/** Codegen'd cosine similarity over two `array<float>` columns.
  *
  * The built-in formulation (`aggregate(zip_with(...))`) allocates an
  * intermediate product array and evaluates a lambda per element through
  * `HigherOrderFunction` plumbing; this expression is one tight static
  * loop inlined into whole-stage codegen — the hot kernel of every ANN /
  * near-dup query, O(Q·N·d) invocations at scale. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(x: Any, y: Any): Any =
    CosineKernel.compute(x.asInstanceOf[ArrayData], y.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.CosineKernel.compute($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry point. */
  def cosineSim(x: Column, y: Column): Column =
    Bridge.column(CosineSimilarity(
      Bridge.expression(x), Bridge.expression(y)))
}
