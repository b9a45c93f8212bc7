package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel: the 60-bit md5 prefix of a string, taken directly from
  * the digest bytes. Bit-identical to the composed built-in formulation
  * `conv(substring(md5(x), 1, 15), 16, 10)` — 15 hex chars = the first
  * 60 bits big-endian = (first 8 digest bytes as unsigned BE long) >>> 4
  * — and to the DuckDB oracle [[Portable.hash60Sql]]. */
object Hash60Kernel {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def hash60(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    v >>> 4
  }
}

/** Codegen'd 60-bit md5-prefix hash of a string column.
  *
  * The built-in chain allocates a 32-char hex string per row, substrings
  * it, and parses 15 hex digits through `conv`'s BigInteger path; this
  * expression digests once and masks bits — the hashing kernel under
  * every shingle/token of the dedup and fingerprint families. */
case class Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(x: Any): Any =
    Hash60Kernel.hash60(x.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.Hash60Kernel.hash60($x)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {
  def hash60(c: Column): Column = Bridge.column(Hash60(Bridge.expression(c)))
}
