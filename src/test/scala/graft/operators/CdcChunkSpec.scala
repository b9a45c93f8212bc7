package graft.operators

import graft.SparkSpec
import graft.functions.{CdcChunkHash60Kernel, Portable}
import org.apache.spark.sql.functions._

/** Content-defined chunking kernel + chunk-level binary near-dup. */
class CdcChunkSpec extends SparkSpec {
  import spark.implicits._

  private val W = Multimodal.ChunkW
  private val Div = Multimodal.ChunkDivisor

  /** Positional reimplementation of the kernel — the ORACLE's window-sum
    * formulation (H(q) = Σ byte(q−j)·B^j mod P per position, no rolling
    * state), chunk hash60s deduped first-seen. The kernel's O(1) rolling
    * update must equal this algebraically at every byte. */
  private def naive(bytes: Array[Byte], w: Int, div: Int): Seq[Long] = {
    val P = Portable.P
    val B = CdcChunkHash60Kernel.B
    val len = bytes.length
    if (len == 0) return Seq.empty
    val pow = Iterator.iterate(1L)(_ * B % P).take(w).toArray
    val cuts = (w to len).filter { q =>
      val s = (0 until w).map(j => (bytes(q - 1 - j) & 0xffL) * pow(j)).sum
      s % P % div == 0
    }
    val ends = (cuts :+ len).distinct.sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    var start = 0
    val out = ends.map { e =>
      md.reset(); md.update(bytes, start, e - start)
      val dig = md.digest()
      var v = 0L
      (0 until 8).foreach(k => v = (v << 8) | (dig(k) & 0xffL))
      start = e
      v >>> 4
    }
    out.distinct
  }

  private def kernel(bytes: Array[Byte]): Seq[Long] =
    CdcChunkHash60Kernel.compute(bytes, W, Div).toLongArray().toSeq

  test("rolling chunker equals the positional window-sum formulation") {
    val rnd = new scala.util.Random(42)
    val lengths = Seq(0, 1, 5, 15, 16, 17, 63, 64, 100, 1000, 5000)
    lengths.foreach { n =>
      // full byte range — the rolling identity must hold beyond ASCII
      // (the ORACLE's ord() equivalence is the ASCII-only part)
      val bytes = Array.fill[Byte](n)(rnd.nextInt(256).toByte)
      assert(kernel(bytes) == naive(bytes, W, Div), s"mismatch at len=$n")
    }
  }

  test("boundaries self-synchronize: append/truncate keep most chunks") {
    val rnd = new scala.util.Random(7)
    val base = Array.fill[Byte](4000)((32 + rnd.nextInt(95)).toByte) // ASCII
    val appended = base ++ Multimodal.AppendTail.getBytes("UTF-8")
    val truncated = base.take(3000)
    val prefixed = "completely new leading content, then the old bytes: "
      .getBytes("UTF-8") ++ base
    val hb = kernel(base).toSet
    def containment(other: Array[Byte]): Double = {
      val ho = kernel(other).toSet
      (hb & ho).size.toDouble / math.min(hb.size, ho.size)
    }
    assert(containment(appended) >= 0.8,
      "append must disturb only the tail chunk(s)")
    assert(containment(truncated) >= 0.8,
      "truncation must disturb only the clipped chunk")
    // the case a FIXED-SIZE blocker gets 0% on: a prepend shifts every
    // byte, but content-defined boundaries realign after one window
    assert(containment(prefixed) >= 0.8,
      "prepend must realign after the first content-defined cut")
  }

  test("mm_chunk_neardup links every planted mutation to its source") {
    val dir = sf()
    val pairs = Multimodal.mmChunkNearDup(spark, dir)
      .select($"id_a", $"id_b", $"containment")
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    graft.Caches.releaseAll()
    val planted = Multimodal.chunkCorpus(spark, dir)
      .filter($"doc_id" >= 20000).select($"doc_id")
      .as[Long].collect()
    graft.Caches.releaseAll()
    assert(planted.nonEmpty)
    planted.foreach { v =>
      val basis = v % 10000
      val c = pairs.get((basis, v))
      assert(c.isDefined, s"planted variant $v not linked to doc $basis")
      if (v >= 20000 && v < 30000)
        assert(c.get == 1.0, s"byte-exact copy $v must have containment 1.0")
      else
        assert(c.get >= Multimodal.ChunkContainment)
    }
    // output is threshold-clean and oriented
    pairs.foreach { case ((a, b), c) =>
      assert(a < b && c >= Multimodal.ChunkContainment && c <= 1.0)
    }
  }

  // ------------------------------------------------- clamped chunker

  /** Independent scalar reference for the CLAMPED rule — positional
    * window sums (no rolling state) with the stateful cut selection
    * applied sequentially. This is the spec-side truth the rows-only
    * `mm_chunk_clamped` gate leans on (the BPE-fit pattern: stateful
    * rules have no positional SQL twin). Returns (hashes, cut ends) so
    * the clamp-bound assertions can inspect chunk LENGTHS too. */
  private def naiveClamped(bytes: Array[Byte], w: Int, div: Int,
                           minLen: Int, maxLen: Int): (Seq[Long], Seq[Int]) = {
    val P = Portable.P
    val B = CdcChunkHash60Kernel.B
    val len = bytes.length
    if (len == 0) return (Seq.empty, Seq.empty)
    val pow = Iterator.iterate(1L)(_ * B % P).take(w).toArray
    def h(q: Int): Long =
      (0 until w).map(j => (bytes(q - 1 - j) & 0xffL) * pow(j)).sum % P
    // Structurally INDEPENDENT statement of the clamp rule (the kernel
    // scans positions and tests a compound condition per byte; a shared
    // bug in that condition would pass both sides — ADVICE r11): first
    // enumerate EVERY divisor position of the whole input, then select
    // cuts greedily — from each chunk start, the next cut is whichever
    // comes first of (a) the earliest divisor position at least minLen
    // away, (b) the maxLen clamp, (c) end of input. Only the rolling
    // hash arithmetic is shared, and that is pinned separately by the
    // unclamped kernel's own reference.
    val divisorPositions = (w to len).filter(q => h(q) % div == 0)
    val ends = scala.collection.mutable.ArrayBuffer[Int]()
    var start = 0
    while (start < len) {
      val nextDiv = divisorPositions.find(_ >= start + minLen)
        .getOrElse(Int.MaxValue)
      val cut = math.min(math.min(nextDiv.toLong, start.toLong + maxLen), len.toLong).toInt
      ends += cut; start = cut
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    var s0 = 0
    val out = ends.toSeq.map { e =>
      md.reset(); md.update(bytes, s0, e - s0)
      val dig = md.digest()
      var v = 0L
      (0 until 8).foreach(k => v = (v << 8) | (dig(k) & 0xffL))
      s0 = e
      v >>> 4
    }
    (out.distinct, ends.toSeq)
  }

  private val MinL = Multimodal.ChunkMinLen
  private val MaxL = Multimodal.ChunkMaxLen

  private def kernelClamped(bytes: Array[Byte]): Seq[Long] =
    CdcChunkHash60Kernel.computeClamped(bytes, W, Div, MinL, MaxL)
      .toLongArray().toSeq

  test("clamped kernel equals the scalar reference; clamps bound chunk lengths") {
    val rnd = new scala.util.Random(11)
    val cases: Seq[Array[Byte]] =
      Seq(0, 1, 15, 16, 17, 31, 32, 33, 100, 1000, 5000)
        .map(n => Array.fill[Byte](n)(rnd.nextInt(256).toByte)) ++ Seq(
        // the two degenerate contents the clamps exist for: a zero run
        // cuts at EVERY position unclamped (window hash 0 ≡ 0 mod div),
        // and 0x01-runs almost never hit the divisor
        Array.fill[Byte](1000)(0.toByte),
        Array.fill[Byte](1000)(1.toByte))
    cases.foreach { bytes =>
      val (refHashes, ends) = naiveClamped(bytes, W, Div, MinL, MaxL)
      assert(kernelClamped(bytes) == refHashes,
        s"clamped kernel != reference at len=${bytes.length}")
      // every chunk length in [minLen, maxLen] except a final remainder
      val lens =
        if (ends.isEmpty) Seq.empty
        else (0 +: ends).sliding(2).map(p => p(1) - p(0)).toSeq
      lens.dropRight(1).foreach(l =>
        assert(l >= MinL && l <= MaxL, s"interior chunk length $l outside clamps"))
      if (lens.nonEmpty) assert(lens.last <= MaxL)
    }
    // the zero run specifically: unclamped degenerates to 1-byte cuts
    // past the first window; clamped yields exactly minLen-sized chunks
    val zeros = Array.fill[Byte](320)(0.toByte)
    val (_, zEnds) = naiveClamped(zeros, W, Div, MinL, MaxL)
    assert((0 +: zEnds).sliding(2).forall(p => p(1) - p(0) == MinL),
      "zero-run chunks must all be exactly minLen under the clamp")
  }

  test("minLen=1 / maxLen=MaxValue degenerates to the oracled stateless rule") {
    val rnd = new scala.util.Random(13)
    Seq(0, 1, 40, 500, 3000).foreach { n =>
      val bytes = Array.fill[Byte](n)(rnd.nextInt(256).toByte)
      assert(
        CdcChunkHash60Kernel.computeClamped(bytes, W, Div, 1, Int.MaxValue)
          .toLongArray().toSeq == kernel(bytes),
        s"clamped(1, ∞) must equal the stateless kernel at len=$n")
    }
    intercept[IllegalArgumentException] {
      CdcChunkHash60Kernel.computeClamped(Array[Byte](1, 2, 3), W, Div, 0, 10)
    }
    intercept[IllegalArgumentException] {
      CdcChunkHash60Kernel.computeClamped(Array[Byte](1, 2, 3), W, Div, 8, 4)
    }
  }

  test("mm_chunk_clamped still links the planted mutations") {
    val pairs = Multimodal.mmChunkNearDupClamped(spark, sf())
      .select($"id_a", $"id_b", $"containment")
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    graft.Caches.releaseAll()
    // byte-exact copies must stay containment 1.0 under any chunking;
    // the byte-level mutations must still clear the threshold (clamping
    // preserves self-synchronization in the FastCDC sense)
    val copies = pairs.keys.filter { case (a, b) => a < 10000 && b == a + 20000 }
    assert(copies.nonEmpty)
    copies.foreach(k => assert(pairs(k) == 1.0))
    assert(pairs.keys.exists { case (a, b) => b == a + 30000 },
      "appended variants must link under the clamped chunker")
    assert(pairs.keys.exists { case (a, b) => b == a + 40000 },
      "truncated variants must link under the clamped chunker")
  }

  // ------------------------------------------------- hot-chunk df cap

  test("df cap keeps content linkage and kills boilerplate-only pairs") {
    val dir = sf()
    val capped = Multimodal.mmChunkNearDupCap(spark, dir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    graft.Caches.releaseAll()
    // long originals still link to their header-prepended variants
    // through CONTENT chunks (realigned past the header) alone
    val longOrig = Multimodal.chunkCapCorpus(spark, dir)
      .filter($"doc_id" >= 50 && $"doc_id" < 150 &&
        length($"text") > Multimodal.ChunkMutMinLen)
      .select($"doc_id").as[Long].collect()
    graft.Caches.releaseAll()
    assert(longOrig.nonEmpty)
    longOrig.foreach { d =>
      assert(capped.contains((d, d + 50000)),
        s"header-prepended $d must link to its original via content chunks")
    }
    // no pair rides on the boilerplate header alone: any capped pair
    // WITHIN the header family must be explained by its originals also
    // pairing (the header's chunks have df ≈ 100 > cap and are dropped)
    val withinFamily = capped.filter { case (a, b) => a >= 50000 && b >= 50000 }
    withinFamily.foreach { case (a, b) =>
      assert(capped.contains((a - 50000, b - 50000)),
        s"family pair ($a,$b) not backed by its originals — header leakage")
    }
  }
}
