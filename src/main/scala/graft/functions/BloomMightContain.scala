package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe of a BROADCAST Bloom filter over a long key
  * column — the filter arm of [[graft.operators.BloomJoin]].
  *
  * Spark's own runtime-filter expression (`BloomFilterMightContain`,
  * `InjectRuntimeFilter`) is not exposed to the public API in 4.1 (no
  * registered `might_contain` function), and it requires its filter side
  * to be a scalar subquery — unusable for an explicitly pre-built filter.
  * This expression holds a `Broadcast` handle instead: tasks fetch the
  * filter once per executor (torrent broadcast), NOT once per task via
  * the closure, so a 100 MB filter at 100 TB scale ships to each machine
  * once. The generated code caches `broadcast.value()` in a class field
  * at partition init, leaving one virtual call per row inside
  * whole-stage codegen.
  */
case class BloomMightContainLong(child: Expression,
                                 bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def nullSafeEval(v: Any): Any =
    bloom.value.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfClass = classOf[BloomFilter].getName
    val bcClass = classOf[Broadcast[_]].getName
    val bcRef = ctx.addReferenceObj("graftBloomBc", bloom, bcClass)
    val bfField = ctx.addMutableState(bfClass, "graftBloom",
      v => s"$v = ($bfClass) $bcRef.value();")
    defineCodeGen(ctx, ev, c => s"$bfField.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

object BloomMightContainLong {
  /** Column-API entry point. */
  def mightContain(key: Column, bloom: Broadcast[BloomFilter]): Column =
    Bridge.column(BloomMightContainLong(Bridge.expression(key), bloom))
}
