package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Static kernel: content-defined chunking of a binary payload + 60-bit
  * md5-prefix hash per chunk, in ONE pass over the bytes.
  *
  * Boundary rule (rsync/LBFS family, the shape FastCDC/Gear refine): a
  * cut falls after byte position q (1-based, q ≥ w) iff the rolling
  * polynomial hash of the last `w` bytes
  *
  *   H(q) = ( Σ_{j=0}^{w−1} byte(q−j) · B^j ) mod P,   B = [[CdcChunkHash60Kernel.B]], P = [[Portable.P]]
  *
  * satisfies `H(q) % divisor == 0`; the payload end is always a cut.
  * Because H is WINDOW-LOCAL, boundaries are self-synchronizing: an
  * insert/append/truncate disturbs only the chunks it touches and every
  * later boundary realigns — the property that makes chunk-level near-dup
  * catch re-encoded/extended/clipped assets where whole-payload digests
  * ([[graft.operators.Multimodal.mmExactDedup]]) structurally cannot.
  * The same window-local property is what makes the rule ORACLE-EXPRESSIBLE:
  * DuckDB recomputes H(q) per position as a w-term list_sum (no recursion),
  * while this kernel maintains it rolling in O(1) per byte
  * (H(q+1) = H(q)·B − byte(q+1−w)·B^w + byte(q+1), all mod P) — the two
  * formulations are algebraically identical, which CdcChunkSpec pins.
  *
  * Per chunk the kernel emits the 60-bit md5 prefix of the chunk's bytes
  * ([[Hash60Kernel]]'s arithmetic over a byte slice — no chunk string or
  * array copy is ever materialized), deduped first-seen per payload, so
  * the per-doc value set equals the oracle's `list_distinct` over
  * `hash60(substring(...))`. Two different chunks colliding in 60 bits
  * merge — probability ≈ n²·2⁻⁶⁰ per doc, the [[NgramHash60Kernel]]
  * acceptance, mirrored bit-for-bit by the oracle.
  *
  * Production notes: expected chunk length ≈ `divisor` bytes; FastCDC's
  * min/max chunk-size clamps are [[CdcChunkHash60Kernel.computeClamped]]
  * (gated rows-only — clamping makes the boundary decision STATEFUL,
  * which has no positional SQL twin, so it is spec-pinned against an
  * independent scalar reference instead; THIS stateless rule stays the
  * hash-exact anchor both share at minLen=1/maxLen=∞). ASCII-payload note: the
  * oracle recomputes bytes as `ord(substring(text, …))` codepoints, equal
  * to UTF-8 bytes for the ASCII corpus (the [[graft.operators.Multimodal]]
  * chars==bytes note); a non-ASCII corpus would need a BLOB-typed oracle.
  */
object CdcChunkHash60Kernel {
  /** Polynomial base — coprime to 2^31−1 and > any byte value. */
  val B = 257L

  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** B^w mod P, derived once per (tiny) distinct w. */
  def powB(w: Int): Long = {
    var r = 1L
    var i = 0
    while (i < w) { r = r * B % Portable.P; i += 1 }
    r
  }

  def compute(payload: Array[Byte], w: Int, divisor: Int): ArrayData = {
    val len = payload.length
    if (len == 0) return new GenericArrayData(Array.emptyLongArray)
    val p = Portable.P
    val bw = powB(w)
    val d = md.get()
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new java.util.ArrayList[java.lang.Long]()
    def emit(from: Int, until: Int): Unit = {
      d.reset()
      d.update(payload, from, until - from)
      val dig = d.digest()
      var v = 0L
      var k = 0
      while (k < 8) { v = (v << 8) | (dig(k) & 0xffL); k += 1 }
      v = v >>> 4
      if (seen.add(v)) out.add(v)
    }
    var h = 0L
    var start = 0 // 0-based chunk start
    var i = 0
    while (i < len) {
      h = (h * B + (payload(i) & 0xffL)) % p
      if (i >= w) {
        // drop the byte that left the window: subtract byte(i−w)·B^w
        h = (h - (payload(i - w) & 0xffL) * bw % p + p) % p
      }
      val q = i + 1 // 1-based end position of the window
      if ((q >= w && h % divisor == 0) || q == len) {
        emit(start, q)
        start = q
      }
      i += 1
    }
    val arr = new Array[Long](out.size)
    var m = 0
    while (m < arr.length) { arr(m) = out.get(m); m += 1 }
    new GenericArrayData(arr)
  }

  /** FastCDC-style min/max-clamped chunking — the production guard
    * against DEGENERATE content the plain divisor rule has no answer
    * for: a byte pattern whose window hash hits the divisor every
    * position (e.g. long zero runs — H = 0 forever) yields 1-byte
    * chunks, and a pattern that never hits it yields one payload-sized
    * chunk; `minLen` suppresses boundary tests until a chunk has
    * `minLen` bytes and `maxLen` forces a cut, so every chunk length
    * lies in [minLen, maxLen] (except the final remainder, which may be
    * shorter). The price is STATE: a cut decision now depends on the
    * previous cut position, so — unlike [[compute]] — the rule has no
    * positional SQL twin (position q cuts or not depending on history);
    * the gate is therefore rows-only, with the kernel pinned against an
    * independent scalar Scala reference in CdcChunkSpec
    * (the BPE-fit no-oracle pattern). The rolling window itself is
    * untouched (it may straddle the previous cut, as in LBFS), so
    * `minLen = 1, maxLen = ∞` degenerates EXACTLY to [[compute]] —
    * spec-pinned, which anchors the clamped rule to the oracled one.
    * Self-synchronization survives clamping in the FastCDC sense:
    * boundaries realign once a divisor cut fires clear of the clamps. */
  def computeClamped(payload: Array[Byte], w: Int, divisor: Int,
                     minLen: Int, maxLen: Int): ArrayData = {
    require(minLen >= 1 && maxLen >= minLen,
      s"chunk clamps need 1 <= minLen <= maxLen; got [$minLen, $maxLen]")
    val len = payload.length
    if (len == 0) return new GenericArrayData(Array.emptyLongArray)
    val p = Portable.P
    val bw = powB(w)
    val d = md.get()
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new java.util.ArrayList[java.lang.Long]()
    def emit(from: Int, until: Int): Unit = {
      d.reset()
      d.update(payload, from, until - from)
      val dig = d.digest()
      var v = 0L
      var k = 0
      while (k < 8) { v = (v << 8) | (dig(k) & 0xffL); k += 1 }
      v = v >>> 4
      if (seen.add(v)) out.add(v)
    }
    var h = 0L
    var start = 0
    var i = 0
    while (i < len) {
      h = (h * B + (payload(i) & 0xffL)) % p
      if (i >= w) h = (h - (payload(i - w) & 0xffL) * bw % p + p) % p
      val q = i + 1
      val chunkLen = q - start
      if ((q >= w && chunkLen >= minLen && h % divisor == 0) ||
          chunkLen == maxLen || q == len) {
        emit(start, q)
        start = q
      }
      i += 1
    }
    val arr = new Array[Long](out.size)
    var m = 0
    while (m < arr.length) { arr(m) = out.get(m); m += 1 }
    new GenericArrayData(arr)
  }
}

/** Codegen'd `array<long>` of distinct 60-bit chunk hashes of a binary
  * payload under content-defined chunking — the one kernel under the
  * chunk-level binary near-dup ([[graft.operators.Multimodal.mmChunkNearDup]]). */
case class CdcChunkHash60s(child: Expression, w: Int, divisor: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(x: Any): Any =
    CdcChunkHash60Kernel.compute(x.asInstanceOf[Array[Byte]], w, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.CdcChunkHash60Kernel.compute($x, $w, $divisor)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunkHash60s =
    copy(child = newChild)
}

object CdcChunkHash60s {
  def chunkHashes(c: Column, w: Int, divisor: Int): Column =
    Bridge.column(CdcChunkHash60s(Bridge.expression(c), w, divisor))
}

/** Codegen'd clamped twin of [[CdcChunkHash60s]] —
  * [[CdcChunkHash60Kernel.computeClamped]] as an expression; same
  * output type, chunk lengths clamped to [minLen, maxLen]. */
case class CdcChunkHash60sClamped(child: Expression, w: Int, divisor: Int,
                                  minLen: Int, maxLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(x: Any): Any =
    CdcChunkHash60Kernel.computeClamped(
      x.asInstanceOf[Array[Byte]], w, divisor, minLen, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.CdcChunkHash60Kernel.computeClamped($x, $w, $divisor, $minLen, $maxLen)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunkHash60sClamped =
    copy(child = newChild)
}

object CdcChunkHash60sClamped {
  def chunkHashes(c: Column, w: Int, divisor: Int,
                  minLen: Int, maxLen: Int): Column =
    Bridge.column(CdcChunkHash60sClamped(Bridge.expression(c), w, divisor,
      minLen, maxLen))
}
