package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Incremental aggregation maintenance: keep a PRE-AGGREGATED per-key
  * partial table for closed history and fold each new delta into it —
  * the materialized-rollup pattern every warehouse uses so daily jobs
  * don't rescan years of raw facts.
  *
  * Scale shape: history is touched only as |distinct keys| partial rows
  * (kilobytes per million keys), never as raw facts; the delta is
  * partially aggregated map-side before its (small) shuffle; the final
  * merge is a groupBy over 2×|keys| partial rows. At 100 TB this turns
  * an O(history) daily job into O(delta + keys). Partials use
  * sum/count — the decomposable-aggregate algebra (avg is derived at
  * read time; decimal sums keep the fold order-insensitive and
  * bit-exact vs the full recompute, same discipline as [[Relational]]).
  *
  * The reference recomputes every aggregate from raw inputs on each run
  * (no state between runs — reference `PipelineProcessor.scala:96-109`);
  * this operator is the posture that replaces that at scale.
  */
object Incremental {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Partial-aggregate table of an orders-shaped fact: one row per key
    * carrying the decomposed (count, decimal sum) state. */
  def orderPartials(orders: DataFrame): DataFrame =
    orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).as("total_dec"))

  /** Fold a raw delta into a stored partial table: aggregate the delta
    * to partials, union BY NAME with history partials, re-sum. The
    * history side contributes |keys| rows to the merge shuffle — the
    * raw history is never read. */
  def mergeDelta(historyPartials: DataFrame, delta: DataFrame): DataFrame =
    historyPartials.unionByName(orderPartials(delta))
      .groupBy(col("o_custkey"))
      .agg(sum(col("n_orders")).as("n_orders"),
        sum(col("total_dec")).as("total_dec"))

  /** Read-time view: surface the derived aggregates (avg from the
    * decomposed state; decimal → double for a stable compare type). */
  def finalizeStats(partials: DataFrame): DataFrame =
    partials.select(col("o_custkey"), col("n_orders"),
      col("total_dec").cast("double").as("total_price"),
      (col("total_dec").cast("double") / col("n_orders")).as("avg_price"))

  // ------------------------------------------------- retract stream

  /** Signed partials — the Flink-style retract-stream algebra: each row
    * carries `_sign` ∈ {+1, −1} (insert / retraction), and the partial
    * state is the SIGNED (count, decimal sum). Both components are
    * group-invertible, so retracting rows is the same fold as ingesting
    * them — and because the sums are decimal, the inverse is EXACT (a
    * float sum would cancel with rounding error and drift from the
    * recompute). This is the aggregate-tier half of a
    * right-to-be-forgotten delete: the delta stores remove the ROWS
    * ([[graft.streaming.StreamingPipeline.writeTombstones]]); this
    * removes their CONTRIBUTION from a materialized rollup without
    * rescanning history. */
  def orderPartialsSigned(rows: DataFrame): DataFrame =
    rows.groupBy(col("o_custkey"))
      .agg(sum(col("_sign").cast("long")).as("n_orders"),
        sum(dec(col("o_totalprice")) * col("_sign")).as("total_dec"))

  /** Fold a signed delta into stored partials. Keys whose signed count
    * AND signed sum both reach zero are DROPPED — a fully-retracted key
    * must disappear from the store, not linger as a zero row a reader
    * could mistake for a real customer with no orders. A key at count 0
    * with a NONZERO sum is kept: that is a retraction whose row count
    * matched but whose prices did not (an upstream bug), and silently
    * vanishing it would hide the evidence from
    * [[finalizeStatsChecked]]'s refusal — same reason negative counts
    * are left in place rather than checked here (a per-micro-batch
    * action). */
  def mergeSignedDelta(historyPartials: DataFrame, delta: DataFrame): DataFrame =
    historyPartials.unionByName(orderPartialsSigned(delta))
      .groupBy(col("o_custkey"))
      .agg(sum(col("n_orders")).as("n_orders"),
        sum(col("total_dec")).as("total_dec"))
      .filter(col("n_orders") =!= 0 || col("total_dec") =!= dec(lit(0)))

  /** [[finalizeStats]] plus the retract-stream sanity gate: a negative
    * signed count means a retraction arrived for rows that were never
    * ingested, and a zero count with a nonzero sum (the only way a zero
    * count survives [[mergeSignedDelta]]'s filter) means a retraction's
    * prices disagreed with the rows it claimed to retract — both are
    * upstream replay bugs; refuse loudly instead of serving a negative
    * order count or dividing by zero. One pass over |keys| partial
    * rows. */
  def finalizeStatsChecked(partials: DataFrame): DataFrame = {
    val p = graft.Caches.persist(partials)
    val bad = p.filter(col("n_orders") < 0).count()
    require(bad == 0,
      s"$bad keys have negative signed counts — retraction without ingest")
    val mismatched = p.filter(col("n_orders") === 0).count()
    require(mismatched == 0,
      s"$mismatched keys have zero signed counts but nonzero signed sums — " +
        "a retraction's prices disagreed with the ingested rows it retracted")
    finalizeStats(p)
  }

  /** Pinned history/delta boundary for the gated query. */
  val SPLIT = "1999-01-01"

  /** Gated query: partials built from pre-split history, merged with the
    * post-split delta; oracle is the flat GROUP BY over all orders —
    * proving the incremental path bit-equal to the full recompute. */
  def aggIncrementalOrders(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val history = orders.filter(col("o_orderdate") < lit(SPLIT).cast("timestamp"))
    val delta = orders.filter(col("o_orderdate") >= lit(SPLIT).cast("timestamp"))
    finalizeStats(mergeDelta(orderPartials(history), delta))
      .orderBy(col("o_custkey"))
  }

  val aggIncrementalOrdersSql: String = s"""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
             AS avg_price
    FROM orders
    GROUP BY o_custkey
    ORDER BY o_custkey"""

  /** Oracle for the retract-stream gate
    * ([[graft.streaming.StreamingGates.streamAggRetract]]): the flat
    * GROUP BY over the orders MINUS the retracted slice — ingesting
    * then exactly-retracting rows must be indistinguishable from never
    * having ingested them, including keys vanishing entirely when all
    * their orders are retracted. */
  def aggIncrementalExcludingSql(pred: String): String = s"""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
             AS avg_price
    FROM orders
    WHERE NOT ($pred)
    GROUP BY o_custkey
    ORDER BY o_custkey"""
}
