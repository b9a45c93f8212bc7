package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ZOrder60
import graft.sources.Tables

/** Multi-dimensional data layout: Z-order (Morton) clustering for scan
  * pruning.
  *
  * A 100 TB fact table is read through its file/row-group min-max stats;
  * which predicates can skip is decided at WRITE time by the sort order.
  * Sorting by one column gives that column tight per-file envelopes and
  * leaves every other column's envelope at full domain width; sorting by
  * the interleaved [[ZOrder60]] key shares envelope tightness across both
  * dimensions, so range predicates on EITHER column skip most files.
  * The write-side cost is one range exchange (`repartitionByRange` +
  * `sortWithinPartitions` on z) — paid once, amortized over every read.
  *
  * [[LayoutSpec]] measures the law on real data: bucket envelopes from a
  * z-sorted layout intersect a point/range predicate on the second
  * dimension in a small fraction of buckets, where the single-column
  * layout intersects ~all of them. The gated query pins the KEY ITSELF
  * bit-exact against a per-bit DuckDB formulation — layout keys must be
  * stable across engine versions or every historical file's clustering
  * silently rots.
  *
  * The reference writes files in arrival order (no layout control at
  * all — reference `PipelineProcessor.scala:160-168`); this is the
  * write-path posture that replaces that at scale.
  */
object Layout {

  /** Append the z-order layout key of two integral key columns. */
  def withZOrderKey(df: DataFrame, a: String, b: String,
                    out: String = "z"): DataFrame =
    df.withColumn(out, ZOrder60.zorder(col(a), col(b)))

  /** Cluster a table for writing: range-partition + sort by the z key.
    * The returned frame is what `.write.parquet` should consume. */
  def clusterByZOrder(df: DataFrame, a: String, b: String,
                      files: Int): DataFrame = {
    val keyed = withZOrderKey(df, a, b)
    keyed.repartitionByRange(files, col("z")).sortWithinPartitions(col("z"))
  }

  /** Per-bucket [min,max] envelopes of `stats` columns after laying the
    * table out in `orderCol` order, cut into `buckets` contiguous runs —
    * an in-memory model of per-file footer stats (bucket = file).
    * NEVER a production operator: the global `ntile` is a deliberate
    * single-partition sort, acceptable only because this is a
    * LayoutSpec-scale diagnostic of what a WRITER would lay out; the
    * real write path is `PartitionedWrite`/`Bucketing`, which never
    * global-sorts. */
  def bucketEnvelopes(df: DataFrame, orderCol: String, stats: Seq[String],
                      buckets: Int): DataFrame = {
    val w = Window.orderBy(col(orderCol))
    val aggs = stats.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    df.withColumn("bucket", ntile(buckets).over(w))
      .groupBy(col("bucket"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Gated query: the z key of (l_partkey, l_suppkey) over early-1995
    * shipments, bit-exact vs the per-bit SQL expansion. The filter is
    * pushed to the scan; the key is one codegen'd expression. */
  def layoutZorder(spark: SparkSession, dir: String): DataFrame =
    withZOrderKey(
      Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") < lit("1995-04-01").cast("timestamp")),
      "l_partkey", "l_suppkey")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"), col("z"))
      .orderBy(col("z"), col("l_orderkey"), col("l_linenumber"))

  val layoutZorderSql: String = """
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           CAST(list_sum([(((l_partkey >> i) & 1) << (2*i))
                          + (((l_suppkey >> i) & 1) << (2*i + 1))
                          FOR i IN range(0, 30)]) AS BIGINT) AS z
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1995-04-01'
    ORDER BY z, l_orderkey, l_linenumber"""
}
