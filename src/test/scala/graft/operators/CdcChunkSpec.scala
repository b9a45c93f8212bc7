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
}
