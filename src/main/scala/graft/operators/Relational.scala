package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Relational query pack over the TPC-H-ish test tables.
  *
  * The reference engine has no joins/aggregations/windows of its own (its
  * whole relational surface is `expr()` strings fed to Catalyst, reference
  * `PipelineProcessor.scala:99`) — these queries exercise the stock Spark
  * operators the driver's DuckDB oracle demands, written Spark-first so
  * Catalyst gets declarative plans (pushdown, pruning, broadcast, AQE).
  *
  * == Exactness conventions (oracle hash-match) ==
  * All monetary/value doubles in the test data carry exactly 2 decimal
  * digits and quantities are whole numbers, so:
  *   - every SUM first casts its input to DECIMAL — decimal addition is
  *     exact and associative, hence identical across Spark's partial-agg
  *     tree and DuckDB's single-node fold (double summation would differ
  *     in the last ulp depending on reduction order);
  *   - products are computed in decimal, then summed;
  *   - averages/ratios are a decimal-exact sum divided by a count in
  *     IEEE double (a single deterministic rounding, identical in both
  *     engines);
  *   - final decimal results are cast back to double so the compare sees
  *     one numeric type regardless of each engine's decimal widening.
  * Every query ends in a total deterministic ORDER BY.
  */
object Relational {

  /** Exact decimal view of a 2-decimal double column. */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  /** Exact decimal sum of a 2-decimal double column, surfaced as double. */
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** TPC-H Q1 flavor: pricing summary report.
    * Scan → filter (pushed to parquet) → hash-agg with map-side partial
    * aggregation → tiny 6-row result. At 100 TB this is the ideal shape:
    * one shuffle of pre-aggregated partials, no wide rows.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val disc = lit(1).cast("decimal(18,2)") - dec(col("l_discount"))
    val tax  = lit(1).cast("decimal(18,2)") + dec(col("l_tax"))
    li.filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * disc).cast("double").as("sum_disc_price"),
        sum(dec(col("l_extendedprice")) * disc * tax).cast("double").as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        (sum(dec(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1PricingSummarySql: String = """
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  /** TPC-H Q6 flavor: single-pass filter + global aggregate.
    * No groupBy — partial sums per partition, one tiny final reduce.
    */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(
        col("l_shipdate") >= lit("1999-01-01").cast("timestamp") &&
        col("l_shipdate") <  lit("2000-01-01").cast("timestamp") &&
        col("l_discount").between(0.03, 0.07) &&
        col("l_quantity") < 24)
      .agg(
        sum(dec(col("l_extendedprice")) * dec(col("l_discount"))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q6ForecastRevenueSql: String = """
    SELECT
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '2000-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24"""
}
