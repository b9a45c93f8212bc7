package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Small-file compaction: rewrite a parquet directory into files of
  * ~`targetBytes` each.
  *
  * Streaming ingest and fine-grained partitioning both leave 100 TB
  * tables as millions of KB-sized files; every downstream scan then pays
  * per-file open/footer/seek costs that dwarf the data read, and the
  * NameNode/manifest carries the metadata. Compaction is the standing
  * maintenance job that fixes it. Sizing is decided from the ACTUAL
  * on-disk bytes (filesystem listing — no data scan), not a row-count
  * guess, so the law holds for any row width.
  *
  * Two rewrite modes:
  *   - `shuffle = false` (default): `coalesce` — merges input partitions
  *     with NO exchange; each task streams several small files into one
  *     output. The right mode for pure compaction.
  *   - `shuffle = true`: `repartition` — one round-robin exchange that
  *     also rebalances pathological skew (one giant file among crumbs)
  *     at the cost of shuffling the data once.
  *
  * The reference writes whatever partitioning the pipeline happens to
  * end with (reference `PipelineProcessor.scala:160-168`, optional fixed
  * `repartition(n)` from config) — a fixed n is wrong at every scale but
  * the one it was tuned for.
  */
object Compaction {

  /** Total bytes of the data files under a directory, RECURSIVE
    * (driver-side listing; no Spark job). Recursion matters: a
    * hive-partitioned layout ([[PartitionedWrite]] — the exact
    * small-files case compaction exists to clean up) holds its data
    * files inside `col=value/` subdirectories, and a top-level-only
    * listing would size the whole tree at 0 bytes and coalesce the
    * table into a single giant file. */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(path: Path): Long =
      fs.listStatus(path).iterator.map { s =>
        if (s.getPath.getName.startsWith("_")) 0L
        else if (s.isFile) s.getLen
        else walk(s.getPath)
      }.sum
    walk(p)
  }

  /** Number of output files for a byte total: ceil(bytes/target), >= 1. */
  def targetFileCount(totalBytes: Long, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
  }

  /** Compact `inDir` into `outDir` at ~`targetBytes`/file; returns the
    * file count written. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long, shuffle: Boolean = false): Int = {
    val n = targetFileCount(dataBytes(spark, inDir), targetBytes)
    val df = spark.read.parquet(inDir)
    val sized = if (shuffle) df.repartition(n) else df.coalesce(n)
    sized.write.mode("overwrite").parquet(outDir)
    n
  }

  private lazy val scratch: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_compact_")
    sys.addShutdownHook(org.apache.commons.io.FileUtils.deleteQuietly(d.toFile))
    d.toString
  }

  /** Gated round-trip: fragment the supplier table into 32 shard files,
    * compact them back to one, and read the result — oracle is the
    * original table, proving compaction content-preserving through the
    * real write path. */
  def k2CompactRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val frag = s"$scratch/frag"
    val packed = s"$scratch/packed"
    Tables.supplier(spark, dir).repartition(32)
      .write.mode("overwrite").parquet(frag)
    compact(spark, frag, packed, targetBytes = 1L << 30)
    spark.read.schema(Tables.supplierSchema).parquet(packed)
      .orderBy(col("s_suppkey"))
  }

  val k2CompactRoundtripSql: String =
    "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier ORDER BY s_suppkey"
}
