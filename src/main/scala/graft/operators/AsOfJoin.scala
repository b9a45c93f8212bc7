package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** As-of (time-series) join — an operator Spark lacks natively.
  *
  * Semantics: for every left row, attach the value columns of the LATEST
  * right row with the same key and `rightTime <= leftTime` (nulls if no
  * such row).
  *
  * Implementation is the scale shape: tag and UNION the two inputs, one
  * shuffle on the key, one sort on (time, side, tie), and a running
  * `last(value, ignoreNulls)` over ROWS UNBOUNDED PRECEDING — the
  * streaming-merge formulation. Never a range cross-product (the naive
  * `l JOIN r ON key AND r.t <= l.t` + windowed max explodes to the full
  * history per left row), and never a per-key collect. Cost is
  * O((|L|+|R|) log) in the sort, partitioned by key.
  *
  * Determinism: right rows at the same (key, time) are ordered by the
  * caller-supplied tie column, and `side` orders right rows BEFORE left
  * rows at an identical timestamp, so the match is inclusive (<=) and
  * reproducible across engines — the DuckDB oracle mirrors this window
  * formulation clause for clause.
  */
object AsOfJoin {

  /** Columns of `valueCols` must exist in `right`; tie columns must be
    * unique per (key, time) on their side for full determinism. Output =
    * every left column plus `asof_<valueCol>` for each value column
    * (value columns travel inside a struct, so they may share names with
    * left columns). */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String, valueCols: Seq[String],
           leftTie: String, rightTie: String): DataFrame = {
    val internal = Seq("__k", "__t", "__side", "__tie", "__rv", "__asof")
    ReservedCols.requireAbsent(left, "asOf(left)", internal: _*)
    ReservedCols.requireAbsent(right, "asOf(right)", internal: _*)
    val leftFields = left.schema.fields
    // the right row's values travel as ONE nullable struct, so the
    // running last(ignoreNulls) picks whole right rows — a null value
    // INSIDE the latest right row stays null rather than tearing back to
    // an older row's value per column
    val rvType = org.apache.spark.sql.types.StructType(
      valueCols.map(v => right.schema(v)))
    val l = left.select(
      Seq(col(key).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
        col(leftTie).as("__tie")) ++
      leftFields.map(f => col(f.name)) :+
      lit(null).cast(rvType).as("__rv"): _*)
    val r = right.select(
      Seq(col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
        col(rightTie).as("__tie")) ++
      leftFields.map(f => lit(null).cast(f.dataType).as(f.name)) :+
      struct(valueCols.map(col): _*).as("__rv"): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withAsof = l.unionByName(r)
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
    withAsof.filter(col("__side") === 1).select(
      leftFields.map(f => col(f.name)) ++
      valueCols.map(v => col("__asof").getField(v).as(s"asof_$v")): _*)
  }

  /** Gated query: every click event with the user's most recent purchase
    * (event id + value) at or before the click. */
  def q21AsofLastPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"),
        col("event_id").as("p_event_id"), col("value").as("p_value"))
    asOf(clicks, purchases, key = "user_id", leftTime = "ts", rightTime = "pts",
        valueCols = Seq("p_event_id", "p_value"),
        leftTie = "event_id", rightTie = "p_event_id")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
        col("asof_p_event_id"), col("asof_p_value"))
      .orderBy(col("event_id"))
  }

  val q21AsofLastPurchaseSql: String = """
    WITH u AS (
      SELECT user_id AS k, ts AS t, 1 AS side, event_id AS tie,
             user_id, ts, event_id, value,
             NULL::STRUCT(p_event_id BIGINT, p_value DOUBLE) AS rv
      FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, ts, 0, event_id,
             NULL::BIGINT, NULL::TIMESTAMP, NULL::BIGINT, NULL::DOUBLE,
             struct_pack(p_event_id := event_id, p_value := value)
      FROM events WHERE event_type = 'purchase'),
    w AS (
      SELECT *, last_value(rv IGNORE NULLS) OVER win AS asof_rv
      FROM u
      WINDOW win AS (PARTITION BY k ORDER BY t, side, tie
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT user_id, ts, event_id, value,
           struct_extract(asof_rv, 'p_event_id') AS asof_p_event_id,
           struct_extract(asof_rv, 'p_value') AS asof_p_value
    FROM w WHERE side = 1 ORDER BY event_id"""
}
