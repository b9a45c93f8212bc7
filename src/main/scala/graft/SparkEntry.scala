package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator (SURVEY §2 inventory plus the
  * LLM-data-pipeline extensions) to a `(spark, sfDir) => DataFrame`;
  * `oracleSql` carries the DuckDB-equivalent SQL for the driver's
  * correctness gate. Column names are aliased identically on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> ((s, d) => Relational.q1PricingSummary(s, d)),
    "q6_forecast_revenue" -> ((s, d) => Relational.q6ForecastRevenue(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> Relational.q1PricingSummarySql,
    "q6_forecast_revenue" -> Relational.q6ForecastRevenueSql,
  )
}
