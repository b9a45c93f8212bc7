package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Static kernel: Morton (Z-order) interleave of two 30-bit keys into one
  * 60-bit long — bit i of x lands at position 2i, bit i of y at 2i+1.
  * The spread is the classic parallel-prefix bit twiddle (5 shift/mask
  * steps), not a per-bit loop. Inputs are masked to 30 bits: the gated
  * queries feed surrogate keys that fit; a caller with wider keys range-
  * buckets them first (layout keys need locality, not injectivity). */
object ZOrderKernel {
  private final val Mask30 = 0x3fffffffL

  /** Spread the low 30 bits of v to even bit positions 0,2,4,…,58. */
  def spread(v: Long): Long = {
    var x = v & Mask30
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def zorder(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)
}

/** Codegen'd Z-order key of two integral columns.
  *
  * This is a LAYOUT primitive, not a query operator: sorting a table by
  * `zorder(a, b)` before writing gives every output file a tight min/max
  * envelope on BOTH a and b, so parquet footer stats (or a lakehouse
  * manifest) prune file scans for range predicates on EITHER column —
  * single-column sort orders prune only their own column. At 100 TB the
  * write-side sort is one range exchange; the read-side payoff is
  * permanent. See [[graft.operators.Layout]] for the measured skipping
  * law and the gated bit-exactness query.
  */
case class ZOrder60(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  /** Integral inputs only, enforced at ANALYSIS time: the codegen path
    * casts with `(long)$x`, which would silently TRUNCATE a float/double
    * child while the interpreted path threw — the key would then depend
    * on whether whole-stage codegen kicked in, breaking the layout-key
    * stability contract. Rejecting fractional types up front keeps the
    * two paths bit-identical by construction. */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"zorder needs integral inputs, got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(x: Any, y: Any): Any = {
    def asLong(v: Any): Long = v match {
      case l: Long => l
      case i: Int  => i.toLong
      case s: Short => s.toLong
      case b: Byte => b.toLong
      case other => throw new IllegalArgumentException(
        s"zorder needs an integral input, got ${other.getClass}")
    }
    ZOrderKernel.zorder(asLong(x), asLong(y))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.ZOrderKernel.zorder((long)$x, (long)$y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder60 =
    copy(left = newLeft, right = newRight)
}

object ZOrder60 {
  /** Column-API entry point. */
  def zorder(x: Column, y: Column): Column =
    Bridge.column(ZOrder60(Bridge.expression(x), Bridge.expression(y)))
}
