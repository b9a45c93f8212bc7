package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel: the whole 60-bit SimHash of a space-separated text in
  * one pass — per token, md5 the (offset, length) byte slice (same
  * word-boundary rule as [[NgramHash60Kernel]]), take the 60-bit prefix,
  * and add ±1 per bit into 60 counters; bit j of the result is set iff
  * counter j > 0. Arithmetic identical to [[SimHashAgg]] over exploded
  * token hashes and to the DuckDB oracle (`Dedup.ddSimhashSql`). */
object SimHash60Kernel {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def compute(text: UTF8String): Long = {
    val bytes = text.getBytes
    val d = md.get()
    val counters = new Array[Int](60)
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        d.reset()
        d.update(bytes, start, i - start)
        val dig = d.digest()
        var v = 0L
        var k = 0
        while (k < 8) { v = (v << 8) | (dig(k) & 0xffL); k += 1 }
        v = v >>> 4
        var j = 0
        while (j < 60) {
          if (((v >>> j) & 1L) == 1L) counters(j) += 1 else counters(j) -= 1
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) { if (counters(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }
}

/** Codegen'd per-row SimHash: because a document's text is one row, the
  * signature needs NO explode and NO aggregation at all — a narrow
  * projection at scan speed. [[SimHashAgg]] remains the mergeable form
  * for inputs where one logical document spans many rows (streamed
  * chunks); equality of the two is asserted in ExtensionSpec. */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(x: Any): Any =
    SimHash60Kernel.compute(x.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.SimHash60Kernel.compute($x)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  def simhash60(c: Column): Column = Bridge.column(SimHash60(Bridge.expression(c)))
}
