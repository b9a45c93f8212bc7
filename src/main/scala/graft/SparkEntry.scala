package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Parity, Relational}

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
    // SURVEY §2 parity operators (through the production pipeline code)
    "s1_scan_prune_filter" -> (Parity.s1ScanPruneFilter _),
    "s2_union_by_name"     -> (Parity.s2UnionByName _),
    "p1_add_fields"        -> (Parity.p1AddFields _),
    "p2_kafka_payload"     -> (Parity.p2KafkaPayload _),
    "f_validate_ok"        -> (Parity.fValidateOk _),
    "f_validate_ko"        -> (Parity.fValidateKo _),
    "k1_file_sink_roundtrip" -> (Parity.k1FileSinkRoundtrip _),
    // Relational pack
    "q1_pricing_summary" -> (Relational.q1PricingSummary _),
    "q6_forecast_revenue" -> (Relational.q6ForecastRevenue _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "s1_scan_prune_filter" -> Parity.s1Sql,
    "s2_union_by_name"     -> Parity.s2Sql,
    "p1_add_fields"        -> Parity.p1Sql,
    "p2_kafka_payload"     -> Parity.p2Sql,
    "f_validate_ok"        -> Parity.fValidateOkSql,
    "f_validate_ko"        -> Parity.fValidateKoSql,
    "k1_file_sink_roundtrip" -> Parity.k1Sql,
    "q1_pricing_summary" -> Relational.q1PricingSummarySql,
    "q6_forecast_revenue" -> Relational.q6ForecastRevenueSql,
  )
}
