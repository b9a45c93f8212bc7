package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.ZOrderKernel

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("kernel: exhaustive interleave check against the per-bit definition") {
    def reference(x: Long, y: Long): Long = {
      var r = 0L
      (0 until 30).foreach { i =>
        r |= ((x >> i) & 1L) << (2 * i)
        r |= ((y >> i) & 1L) << (2 * i + 1)
      }
      r
    }
    for (x <- 0L to 63L; y <- 0L to 63L)
      assert(ZOrderKernel.zorder(x, y) == reference(x, y), s"($x,$y)")
    // known Morton values + 30-bit masking of wider inputs
    assert(ZOrderKernel.zorder(2, 3) == 14)
    assert(ZOrderKernel.zorder(1L << 35, 0) == 0, "bits past 30 are masked")
    assert(ZOrderKernel.zorder((1L << 30) - 1, (1L << 30) - 1) == (1L << 60) - 1)
  }

  /** Fraction of bucket envelopes a predicate lo<=c<=hi must still read. */
  private def readFrac(env: DataFrame, c: String, lo: Long, hi: Long): Double = {
    val n = env.count().toDouble
    env.filter(col(s"${c}_max") >= lo && col(s"${c}_min") <= hi).count() / n
  }

  test("skipping law: z-layout prunes BOTH dims; single-column sort only its own") {
    val li = spark.read.parquet(s"${sf("sf0.01")}/lineitem.parquet")
      .select($"l_partkey", $"l_suppkey")
    val zEnv = Layout.bucketEnvelopes(
      Layout.withZOrderKey(li, "l_partkey", "l_suppkey"),
      "z", Seq("l_partkey", "l_suppkey"), buckets = 64)
    val pEnv = Layout.bucketEnvelopes(
      li, "l_partkey", Seq("l_partkey", "l_suppkey"), buckets = 64)

    val (supLo, supHi) = (10L, 19L)   // ~10% of the supplier domain
    val (partLo, partHi) = (100L, 299L) // ~10% of the part domain

    // single-column layout: partkey prunes hard, suppkey reads everything
    assert(readFrac(pEnv, "l_partkey", partLo, partHi) < 0.25)
    assert(readFrac(pEnv, "l_suppkey", supLo, supHi) > 0.9)

    // z layout: BOTH dimensions prune
    val zPart = readFrac(zEnv, "l_partkey", partLo, partHi)
    val zSup = readFrac(zEnv, "l_suppkey", supLo, supHi)
    assert(zPart < 0.7, s"z layout must prune partkey ranges, read-frac $zPart")
    assert(zSup < 0.7, s"z layout must prune suppkey ranges, read-frac $zSup")
    assert(zSup < readFrac(pEnv, "l_suppkey", supLo, supHi),
      "z must beat the single-column layout on the second dimension")
  }

  test("clusterByZOrder emits the requested file count, z-sorted within each") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val clustered = Layout.clusterByZOrder(li, "l_partkey", "l_suppkey", files = 8)
    assert(clustered.rdd.getNumPartitions == 8)
    val unsorted = clustered.mapPartitions { it =>
      val zs = it.map(_.getAs[Long]("z")).toSeq
      Iterator.single(if (zs == zs.sorted) 0 else 1)
    }(org.apache.spark.sql.Encoders.scalaInt).reduce(_ + _)
    assert(unsorted == 0, "every output partition must be sorted by z")
    assert(clustered.count() == li.count())
  }

  test("fractional zorder inputs are rejected at analysis, not truncated") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1.5, 2L)).toDF("x", "y")
    val e = intercept[Exception](
      df.select(graft.functions.ZOrder60.zorder(col("x"), col("y"))).collect())
    assert(e.getMessage.toLowerCase.contains("integral")
      || e.getMessage.contains("DATATYPE_MISMATCH"),
      s"unexpected error: ${e.getMessage}")
  }
}
