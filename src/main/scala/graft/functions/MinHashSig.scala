package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel: the K-permutation MinHash signature of a text's
  * distinct word n-gram set, in one pass — shingle hashes via the
  * byte-range md5 of [[NgramHash60Kernel]] reduced mod P, then
  * mh_k = min over shingles of (a_k·h + b_k) mod P. All values are
  * < 2^31 so a_k·h stays well inside a long. Arithmetic identical to
  * `min(pmod(a*h + b, P))` over the exploded shingle relation and to
  * the DuckDB oracle. */
object MinHashSigKernel {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def compute(text: UTF8String, n: Int, a: Array[Long], b: Array[Long],
              p: Long): ArrayData = {
    val k = a.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val bytes = text.getBytes
    var nw = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nw += 1; i += 1 }
    if (nw >= n) {
      val starts = new Array[Int](nw)
      val ends = new Array[Int](nw)
      var w = 0
      i = 0
      while (i < bytes.length) {
        if (bytes(i) == ' ') { ends(w) = i; w += 1; starts(w) = i + 1 }
        i += 1
      }
      ends(w) = bytes.length
      val d = md.get()
      // dedup of shingle hashes only affects which h values exist, and
      // min() is idempotent under duplicates — so no seen-set is needed
      var pos = 0
      while (pos + n <= nw) {
        val off = starts(pos)
        d.reset()
        d.update(bytes, off, ends(pos + n - 1) - off)
        val dig = d.digest()
        var v = 0L
        var j = 0
        while (j < 8) { v = (v << 8) | (dig(j) & 0xffL); j += 1 }
        val h = (v >>> 4) % p
        var kk = 0
        while (kk < k) {
          val m = (a(kk) * h + b(kk)) % p
          if (m < mins(kk)) mins(kk) = m
          kk += 1
        }
        pos += 1
      }
    }
    new GenericArrayData(mins)
  }
}

/** Codegen'd per-row MinHash signature (`array<long>` of K mins).
  * One doc = one row, so the signature stage needs NO shingle explode
  * and NO K-aggregate groupBy — a narrow projection replacing the
  * widest shuffle of the LSH dedup pipeline. Texts with fewer than n
  * words yield Long.MaxValue sentinels (empty set ⇒ no min), matching
  * the aggregate form which produces no row — callers filter either
  * way. */
case class MinHashSig(child: Expression, n: Int, a: Seq[Long], b: Seq[Long],
                      p: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val aArr = a.toArray
  private lazy val bArr = b.toArray

  override def nullSafeEval(x: Any): Any =
    MinHashSigKernel.compute(x.asInstanceOf[UTF8String], n, aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bArr, "long[]")
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.MinHashSigKernel.compute($x, $n, $aRef, $bRef, ${p}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def minhashSig(c: Column, n: Int, a: Seq[Long], b: Seq[Long], p: Long): Column =
    Bridge.column(MinHashSig(Bridge.expression(c), n, a, b, p))
}
