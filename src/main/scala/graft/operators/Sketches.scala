package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sketch-based approximate aggregates — the mergeable-summary family a
  * 100 TB engine leans on when exact distinct/quantile costs a full
  * shuffle of the key space:
  *
  *   - `approx_count_distinct` = HyperLogLog++: 2^p registers per group
  *     regardless of cardinality, fully mergeable (partial aggregation);
  *   - `percentile_approx` = KLL-ish quantile sketch, same property.
  *
  * No DuckDB oracle: sketch estimates are implementation-specific, so the
  * driver records the weaker rows-only check; accuracy bounds against the
  * exact answers are asserted in ScalaTest instead. */
object Sketches {

  def skApproxStats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), rsd = 0.01).as("approx_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(2500)).as("approx_median_price"),
        percentile_approx(col("l_quantity"), lit(0.95), lit(2500)).as("approx_p95_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
}
