package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def fragment(n: Int): String = {
    val dir = Files.createTempDirectory("compact_in").toString
    spark.read.parquet(s"${sf("sf0.01")}/lineitem.parquet")
      .repartition(n).write.mode("overwrite").parquet(dir)
    dir
  }

  test("file-count law from real on-disk bytes; content preserved exactly") {
    val in = fragment(32)
    val bytes = Compaction.dataBytes(spark, in)
    assert(bytes > 0)
    val out = Files.createTempDirectory("compact_out").toString
    // target = just over a third of the data -> exactly 3 files
    val target = bytes / 3 + 1
    val n = Compaction.compact(spark, in, out, target)
    assert(n == 3)
    val files = new java.io.File(out).listFiles
      .filter(f => f.getName.endsWith(".parquet")).toSeq
    assert(files.size == 3, s"expected 3 data files, got ${files.map(_.getName)}")

    val before = spark.read.parquet(in)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), sum($"l_quantity".cast("decimal(18,2)")).as("q"))
      .orderBy($"l_returnflag").collect().toSeq
    val after = spark.read.parquet(out)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), sum($"l_quantity".cast("decimal(18,2)")).as("q"))
      .orderBy($"l_returnflag").collect().toSeq
    assert(after == before)
  }

  test("default mode is exchange-free; shuffle mode pays exactly one") {
    val in = fragment(16)
    val df = spark.read.parquet(in)
    val co = df.coalesce(2).queryExecution.executedPlan.toString
    assert(!co.contains("Exchange"), s"coalesce must not shuffle:\n$co")
    val re = df.repartition(2).queryExecution.executedPlan.toString
    assert(re.contains("Exchange"), "repartition mode is the explicit shuffle")
  }

  test("oversized target floors at one file; zero target rejected") {
    assert(Compaction.targetFileCount(10L, Long.MaxValue) == 1)
    assert(Compaction.targetFileCount(0L, 128) == 1)
    assert(Compaction.targetFileCount(1000L, 128) == 8)
    intercept[IllegalArgumentException](Compaction.targetFileCount(1L, 0L))
  }

  test("dataBytes recurses into hive-partitioned subdirectories") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cmp_hive_").toString
    graft.sources.Tables.supplier(spark, sf())
      .withColumn("part", org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("s_suppkey"),
        org.apache.spark.sql.functions.lit(3)))
      .write.mode("overwrite").partitionBy("part").parquet(dir)
    val sized = Compaction.dataBytes(spark, dir)
    assert(sized > 0, "partitioned layout must not size at 0 bytes")
    // equal to the sum of all nested part-files
    // skip "_" markers AND "."-hidden .crc checksums (Hadoop's
    // ChecksumFileSystem hides the latter from listStatus)
    val walked = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_))
      .filter { f =>
        val n = f.getFileName.toString
        !n.startsWith("_") && !n.startsWith(".")
      }
      .mapToLong(java.nio.file.Files.size(_)).sum()
    assert(sized == walked)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
