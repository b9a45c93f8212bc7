package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sequence analytics over the events table: ordered funnel conversion
  * and cohort retention — the two event-table staples the relational
  * pack lacked (the reference engine has neither; its event handling is
  * `expr()` projection only, reference `PipelineProcessor.scala:99`).
  *
  * == Scale posture ==
  * Both operators attach per-user state with a window over
  * `partitionBy(user_id)` instead of a self-join — ONE shuffle of the
  * fact table, no join back (an events⋈per-user-mins join would shuffle
  * the fact twice and is the classic funnel anti-pattern). The funnel's
  * two chained running-mins share the same window frame, so Catalyst
  * plans them in a single Window operator over a single sort. Per-user
  * partitions are bounded by per-user event counts (heavy users are the
  * skew unit, not total corpus), which is the right unit at 100 TB.
  *
  * == Exactness ==
  * Timestamps compare in integer microseconds (`unix_micros` /
  * `epoch_us`) with `event_id` as the total tie-break — identical sort
  * in both engines, so the row-framed running mins agree bit-for-bit.
  */
object Funnel {

  private val WeekUs = 7L * 24 * 3600 * 1000000L

  /** Strict-order funnel view → click → purchase per user.
    *
    * Semantics: a click qualifies only if SOME view precedes it (row
    * order, ties broken by event_id); a purchase qualifies only if some
    * QUALIFIED click precedes it. `stage` is the furthest step reached
    * (0 = never viewed, 3 = full conversion). The chained "after"
    * conditions are two running mins over the same user-ordered frame —
    * one Window operator, one Exchange, no self-join.
    */
  def q31FunnelSteps(spark: SparkSession, dir: String): DataFrame = {
    val prev = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val viewUs = when(col("event_type") === "view", col("us"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("view_before", min(viewUs).over(prev))
      .withColumn("qual_click_us",
        when(col("event_type") === "click" && col("view_before").isNotNull, col("us")))
      .withColumn("click_before", min(col("qual_click_us")).over(prev))
      .groupBy(col("user_id"))
      .agg(
        min(viewUs).as("first_view_us"),
        min(col("qual_click_us")).as("first_click_us"),
        min(when(col("event_type") === "purchase" && col("click_before").isNotNull,
          col("us"))).as("first_purchase_us"))
      .withColumn("stage",
        when(col("first_purchase_us").isNotNull, lit(3))
          .when(col("first_click_us").isNotNull, lit(2))
          .when(col("first_view_us").isNotNull, lit(1))
          .otherwise(lit(0)))
      .orderBy(col("user_id"))
  }

  val q31FunnelStepsSql: String = """
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
    w1 AS (
      SELECT *,
        min(CASE WHEN event_type = 'view' THEN us END) OVER (
          PARTITION BY user_id ORDER BY us, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS view_before
      FROM e),
    w2 AS (
      SELECT *,
        CASE WHEN event_type = 'click' AND view_before IS NOT NULL
             THEN us END AS qual_click_us,
        min(CASE WHEN event_type = 'click' AND view_before IS NOT NULL
                 THEN us END) OVER (
          PARTITION BY user_id ORDER BY us, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_before
      FROM w1),
    agg AS (
      SELECT user_id,
        min(CASE WHEN event_type = 'view' THEN us END) AS first_view_us,
        min(qual_click_us) AS first_click_us,
        min(CASE WHEN event_type = 'purchase' AND click_before IS NOT NULL
                 THEN us END) AS first_purchase_us
      FROM w2 GROUP BY user_id)
    SELECT user_id, first_view_us, first_click_us, first_purchase_us,
      CAST(CASE WHEN first_purchase_us IS NOT NULL THEN 3
                WHEN first_click_us IS NOT NULL THEN 2
                WHEN first_view_us IS NOT NULL THEN 1
                ELSE 0 END AS INT) AS stage
    FROM agg ORDER BY user_id"""

  /** Weekly cohort retention: users bucketed by the ISO week of their
    * first event; `n_users` counts distinct users active `week_offset`
    * whole weeks after their own first event.
    *
    * The cohort timestamp is attached join-free (`min(us) over
    * (partition by user_id)`); the offset is integer microsecond
    * division (`div` / `//`, exact in both engines). Output is the
    * dense retention matrix ordered by (cohort_week, week_offset).
    */
  def q32CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val wUser = Window.partitionBy(col("user_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("cohort_us", min(col("us")).over(wUser))
      .select(col("user_id"),
        // string-typed: the driver comparator sees date cells as python
        // dates on one side and ISO strings on the other
        date_trunc("week", timestamp_micros(col("cohort_us"))).cast("date")
          .cast("string").as("cohort_week"),
        expr(s"(us - cohort_us) div ${WeekUs}L").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val q32CohortRetentionSql: String = s"""
    WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
    c AS (
      SELECT user_id, us,
             min(us) OVER (PARTITION BY user_id) AS cohort_us
      FROM e)
    SELECT CAST(CAST(date_trunc('week', make_timestamp(cohort_us)) AS DATE) AS VARCHAR) AS cohort_week,
           (us - cohort_us) // ${WeekUs} AS week_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM c GROUP BY 1, 2 ORDER BY 1, 2"""
}
