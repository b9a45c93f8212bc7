package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel: 60-bit hashes of every ≤`maxDist`-character-deletion
  * variant of a string (the FastSS deletion neighborhood,
  * [[graft.operators.EntityResolution]]), in one pass — WITHOUT ever
  * materializing a variant string.
  *
  * The built-in chain this replaces
  * (`transform(sequence(...), i -> concat(substr, substr))` nested twice,
  * `array_distinct`, then `xxhash64` per variant) allocates ~C(L,2)
  * variant strings per row at maxDist=2 — measured as the single largest
  * stage of the sf0.1 d2 gate (~7.7 s of ~10 s). A deletion variant IS
  * the source bytes minus one or two codepoint spans, so this kernel
  * digests the 2–3 surviving byte slices directly (MD5 streams over
  * (offset, length) ranges; 60-bit prefix as [[Hash60Kernel]]).
  *
  * Correctness contract (the blocking only needs EQUAL variants to get
  * EQUAL hashes): equal variant strings are equal byte sequences, so
  * slice-digesting preserves every join collision the string form had —
  * recall 1.0 is untouched. The per-row hash-set dedup collapses exactly
  * the duplicate JOIN KEYS `array_distinct` collapsed (a 60-bit
  * cross-variant collision only merges key values on both sides
  * simultaneously, and a cross-STRING collision can only add a candidate
  * the exact-levenshtein verify kills — the same
  * generate-with-guarantee/verify-exact argument as the xxhash64 form).
  * The hash VALUES differ from the old `xxhash64(variant)` — nothing
  * pins them: the ER oracle is the quadratic levenshtein ground truth,
  * and batch/stream share THIS generator so the streaming variant index
  * stays consistent by construction.
  *
  * Deletions are CODEPOINT-level (offsets walk UTF-8 boundaries), so the
  * neighborhood matches the char-based `levenshtein` the verify uses —
  * not byte-level, which would split multi-byte characters. */
object DelVariantHash60Kernel {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def compute(name: UTF8String, maxDist: Int): ArrayData = {
    val bytes = name.getBytes
    val n = bytes.length
    // codepoint start offsets (+ end sentinel): starts(c) .. starts(c+1)
    // is character c's byte span
    var nc = 0
    var i = 0
    while (i < n) { i += UTF8String.numBytesForFirstByte(bytes(i)); nc += 1 }
    val starts = new Array[Int](nc + 1)
    i = 0; var c = 0
    while (i < n) {
      starts(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    starts(nc) = n
    val d = md.get()
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new java.util.ArrayList[java.lang.Long]()
    // digest the bytes minus char spans [c1] and [c2] (−1 = no deletion;
    // c1 < c2 when both set)
    def emit(c1: Int, c2: Int): Unit = {
      d.reset()
      var from = 0
      if (c1 >= 0) {
        d.update(bytes, 0, starts(c1))
        from = starts(c1 + 1)
      }
      if (c2 >= 0) {
        d.update(bytes, from, starts(c2) - from)
        from = starts(c2 + 1)
      }
      d.update(bytes, from, n - from)
      val dig = d.digest()
      var v = 0L
      var k = 0
      while (k < 8) { v = (v << 8) | (dig(k) & 0xffL); k += 1 }
      v = v >>> 4
      if (seen.add(v)) out.add(v)
    }
    emit(-1, -1)
    var a = 0
    while (a < nc) {
      emit(a, -1)
      if (maxDist >= 2) {
        var b = a + 1
        while (b < nc) { emit(a, b); b += 1 }
      }
      a += 1
    }
    val arr = new Array[Long](out.size)
    var m = 0
    while (m < arr.length) { arr(m) = out.get(m); m += 1 }
    new GenericArrayData(arr)
  }
}

/** Codegen'd `array<long>` of distinct deletion-variant hashes — the
  * blocking key generator of the fuzzy-match family. */
case class DelVariantHash60s(child: Expression, maxDist: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(x: Any): Any =
    DelVariantHash60Kernel.compute(x.asInstanceOf[UTF8String], maxDist)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.DelVariantHash60Kernel.compute($x, $maxDist)")

  override protected def withNewChildInternal(newChild: Expression): DelVariantHash60s =
    copy(child = newChild)
}

object DelVariantHash60s {
  def variantHashes(c: Column, maxDist: Int): Column =
    Bridge.column(DelVariantHash60s(Bridge.expression(c), maxDist))
}
