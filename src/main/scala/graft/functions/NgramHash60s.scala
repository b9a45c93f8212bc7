package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel: 60-bit md5-prefix hashes of every word n-gram of a
  * space-separated text, in one pass over the UTF-8 bytes.
  *
  * Key identity: the n-gram string `w_i ++ " " ++ … ++ w_{i+n−1}` is
  * byte-identical to the SOURCE TEXT's byte range from the start of
  * `w_i` to the end of `w_{i+n−1}` (splitting on single spaces keeps
  * empty words, and `concat_ws` re-inserts exactly the separators the
  * split consumed — including runs of spaces). So no shingle string is
  * ever materialized: the digest runs over `(offset, length)` slices of
  * the input bytes. 0x20 never occurs inside a UTF-8 multi-byte
  * sequence, so byte-level splitting is codepoint-safe.
  *
  * Output values are bit-identical to
  * `transform(split(text,' '), …concat_ws…)` → `hash60` (the composed
  * built-in chain and the DuckDB oracle). With `distinct`, first-seen
  * order dedup matches `array_distinct` on the strings (two different
  * shingles colliding in 60 bits would merge — probability ≈ n²·2⁻⁶⁰
  * per doc, accepted). */
object NgramHash60Kernel {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def compute(text: UTF8String, n: Int, distinct: Boolean, modP: Long): ArrayData = {
    val bytes = text.getBytes
    var nw = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nw += 1; i += 1 }
    if (nw < n) return new GenericArrayData(Array.emptyLongArray)
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
    val out = new Array[Long](nw - n + 1)
    val seen = if (distinct) new java.util.HashSet[java.lang.Long]() else null
    var m = 0
    var p = 0
    while (p + n <= nw) {
      val off = starts(p)
      d.reset()
      d.update(bytes, off, ends(p + n - 1) - off)
      val dig = d.digest()
      var v = 0L
      var k = 0
      while (k < 8) { v = (v << 8) | (dig(k) & 0xffL); k += 1 }
      v = v >>> 4
      if (modP > 0) v = v % modP // v is non-negative: % == pmod
      if (seen == null || seen.add(v)) { out(m) = v; m += 1 }
      p += 1
    }
    new GenericArrayData(if (m == out.length) out else java.util.Arrays.copyOf(out, m))
  }
}

/** Codegen'd `array<long>` of 60-bit n-gram hashes — replaces the
  * split → transform/concat_ws → array_distinct → md5 built-in chain
  * that allocates every shingle as a string before hashing it. */
case class NgramHash60s(child: Expression, n: Int, distinct: Boolean, modP: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(x: Any): Any =
    NgramHash60Kernel.compute(x.asInstanceOf[UTF8String], n, distinct, modP)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.NgramHash60Kernel.compute($x, $n, $distinct, ${modP}L)")

  override protected def withNewChildInternal(newChild: Expression): NgramHash60s =
    copy(child = newChild)
}

object NgramHash60s {
  /** Distinct n-gram (shingle) hashes of a text column, optionally
    * reduced mod P BEFORE the dedup — so the per-doc value set equals
    * SQL's `DISTINCT doc_id, hash % P` with no downstream distinct
    * shuffle needed. */
  def shingleHashes(c: Column, n: Int, modP: Long = 0L): Column =
    Bridge.column(NgramHash60s(Bridge.expression(c), n, distinct = true, modP))

  /** Per-token (1-gram, duplicates kept) hashes of a text column. */
  def tokenHashes(c: Column): Column =
    Bridge.column(NgramHash60s(Bridge.expression(c), 1, distinct = false, modP = 0L))

  /** Per-OCCURRENCE n-gram hashes reduced mod `modP` — hashed feature
    * bucket ids for count-weighted models (DSIR histograms). */
  def gramBuckets(c: Column, n: Int, modP: Long): Column =
    Bridge.column(NgramHash60s(Bridge.expression(c), n, distinct = false, modP))
}
