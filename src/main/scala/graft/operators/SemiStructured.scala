package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Semi-structured payload promotion: parse a JSON string column ONCE
  * into a typed struct with an EXPLICIT schema (`from_json`), then
  * treat the promoted fields as ordinary columns — the standard shape
  * for Kafka payloads, metadata sidecars, and event properties, and the
  * one place the reference's string-typed `props` column
  * (reference `PipelineProcessor.scala:69-77` admits only flat `expr()`
  * projections over it) needs a real parser.
  *
  * Design choices, all scale-driven:
  *   - `from_json` with an explicit DDL schema, not `schema_of_json`
  *     inference: inference needs a sampling pass over the data (a
  *     second scan at 100 TB) and produces a schema that can DRIFT with
  *     the sample; the explicit schema also lets the parser skip every
  *     key the query never reads.
  *   - one parse per row, in the scan projection: `from_json` is a
  *     native Catalyst expression (Jackson under the hood), evaluated
  *     once and then field-accessed for free — N `get_json_object`
  *     calls would re-parse the payload N times per row.
  *   - malformed rows become a NULL struct (PERMISSIVE), they never
  *     kill the job: the gate's aggregate carries `n_events` vs
  *     `n_with_k` so silent null-eating is hash-visible, and
  *     [[SemiStructuredSpec]] pins the planted-corrupt behavior the
  *     synthetic corpus (all well-formed) cannot exercise. The
  *     quarantine split for payloads that MUST be valid is
  *     [[graft.sources.SourceReader]]'s corrupt-record path — same
  *     posture, source tier.
  *
  * Scale shape: one narrow projection (event_type, parsed k) feeding a
  * map-side-combined aggregate over the ~5-value event_type key space —
  * the exchange carries #types × #partitions partial rows, never
  * events. All integer arithmetic, so no decimal recipe is needed.
  */
object SemiStructured {

  /** Typed per-event-type stats of the JSON payload field `k`. */
  def evJsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        sum(col("k")).cast("long").as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val evJsonExtractSql: String = """
    WITH parsed AS (
      SELECT event_type, CAST(props->>'$.k' AS INTEGER) AS k FROM events)
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(k) AS n_with_k,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           MIN(k) AS min_k,
           MAX(k) AS max_k
    FROM parsed GROUP BY event_type ORDER BY event_type"""
}
