package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table write path — the co-partitioned-join story at 100 TB.
  *
  * A lineitem ⋈ orders equi-join on the order key shuffles BOTH fact
  * tables every run. Bucketing pays that shuffle once at write time:
  * `bucketBy(n, key)` hash-partitions rows into n buckets per the same
  * hash Spark's Exchange uses, so a join between two tables bucketed on
  * the join key with the same bucket count plans with NO Exchange on
  * either side — each task reads bucket i of both tables. `sortBy(key)`
  * additionally pre-sorts within each bucket file, letting the
  * sort-merge join skip its Sort when one file per bucket exists.
  *
  * At 100 TB this is the difference between re-shuffling ~100 TB per
  * analytical run and a one-time bucketed write amortized over every
  * subsequent join, aggregation, or window partitioned by the same key.
  * Bucket count sizing: total size / bucket ≈ executor-memory-sized
  * splits (e.g. 100 TB / 4096 buckets ≈ 25 GB per bucket, further split
  * by parquet row groups for read parallelism).
  *
  * The reference engine (PipelineProcessor.scala:115-146) writes plain
  * directories; bucketing is the Spark-native upgrade of its file sink
  * for relations that will be re-joined.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-file-sorted parquet table registered
    * in the session catalog. `path` makes it an external table (tests
    * point this at a temp dir; production at the warehouse root). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    path: Option[String] = None): Unit = {
    val w = df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
    path.fold(w.saveAsTable(table))(p => w.option("path", p).saveAsTable(table))
  }

  /** Co-bucket two relations on their join keys with one shared bucket
    * count, returning the catalog-backed DataFrames. The returned pair
    * joins Exchange-free (asserted in PlanSpec). */
  def coBucket(spark: SparkSession,
               left: DataFrame, leftTable: String, leftKey: String,
               right: DataFrame, rightTable: String, rightKey: String,
               buckets: Int, basePath: String): (DataFrame, DataFrame) = {
    writeBucketed(left, leftTable, leftKey, buckets, Some(s"$basePath/$leftTable"))
    writeBucketed(right, rightTable, rightKey, buckets, Some(s"$basePath/$rightTable"))
    (spark.table(leftTable), spark.table(rightTable))
  }
}
