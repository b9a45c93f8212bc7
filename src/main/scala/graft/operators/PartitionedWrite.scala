package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Hive-style partitioned writes + partition-pruned reads.
  *
  * `partitionBy(col)` turns a predicate on the partition column into
  * DIRECTORY pruning: the scan lists only matching partitions and never
  * opens a non-matching file — at 100 TB, `WHERE lang = 'en'` against a
  * language-partitioned corpus reads the en/ tree and nothing else
  * (`PartitionFilters` in the plan, vs `PushedFilters` which still
  * opens every footer). Partition columns must be low-cardinality:
  * partitioning by a high-cardinality key is the small-files anti-
  * pattern [[Compaction]] exists to clean up.
  *
  * The reference's sink writes one flat directory per path (reference
  * `PipelineProcessor.scala:160-168`, no partitionBy surface); this is
  * the layout feature a table that is always filtered by tenant/date/
  * language needs.
  */
object PartitionedWrite {

  /** Write `df` Hive-partitioned by `parts` (moved to directory keys). */
  def writePartitioned(df: DataFrame, dir: String, parts: Seq[String]): Unit =
    df.write.partitionBy(parts: _*).mode("overwrite").parquet(dir)

  private lazy val scratch: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_part_")
    sys.addShutdownHook(org.apache.commons.io.FileUtils.deleteQuietly(d.toFile))
    d.toString
  }

  /** Gated round-trip: documents partitioned by lang, read back with a
    * partition predicate — oracle is the flat table filtered the same
    * way, proving the layout transform content-transparent. The
    * pruning itself (PartitionFilters, only en/ read) is asserted in
    * PartitionedWriteSpec. */
  def k4PartitionPrune(spark: SparkSession, dir: String): DataFrame = {
    val out = s"$scratch/docs_by_lang"
    writePartitioned(
      Tables.documents(spark, dir).select(col("doc_id"), col("lang"), col("n_chars")),
      out, Seq("lang"))
    spark.read.parquet(out)
      .filter(col("lang") === "en")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  val k4PartitionPruneSql: String = """
    SELECT doc_id, lang, n_chars FROM documents
    WHERE lang = 'en' ORDER BY doc_id"""
}
