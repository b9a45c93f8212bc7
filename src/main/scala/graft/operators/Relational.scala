package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Star-schema join: region ⋈ nation ⋈ customer with the two dims
    * EXPLICITLY broadcast — at 100 TB region/nation are KB-sized while the
    * fact side is huge; a shuffle join here would be the classic mistake. */
  def q2CustomerByRegion(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir); val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("total_bal"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val q2CustomerByRegionSql: String = """
    SELECT r_name, n_name, COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name"""

  /** TPC-H Q3 flavor: 3-way join, aggregation, top-10 by revenue.
    * Catalyst broadcasts the filtered customer side under AQE; the
    * orders⋈lineitem join shuffles on orderkey — the natural key. */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1999-06-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1999-06-01").cast("timestamp"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3ShippingPrioritySql: String = """
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1999-06-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1999-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10"""

  /** TPC-H Q4 flavor: EXISTS as a LEFT SEMI join (no duplication, the
    * lineitem side never leaves the join — at scale this is the only
    * correct shape for EXISTS, never an inner join + distinct). */
  def q4OrderPrioritySemi(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir).filter(col("l_discount") > 0.08)
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q4OrderPrioritySemiSql: String = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_discount > 0.08)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""

  /** NOT EXISTS as a LEFT ANTI join: customers with no half-million order. */
  def q5CustomersWithoutBigOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_totalprice") > 450000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("total_bal"))
      .orderBy(col("c_mktsegment"))
  }

  val q5CustomersWithoutBigOrdersSql: String = """
    SELECT c_mktsegment, COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment"""

  /** Window rank: top-3 parts by retail price within each brand.
    * row_number (not rank) with a unique tie-break → deterministic. */
  def q7TopPartsPerBrand(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("p_brand"), col("rn"), col("p_partkey"), col("p_retailprice"))
      .orderBy(col("p_brand"), col("rn"))
  }

  val q7TopPartsPerBrandSql: String = """
    SELECT p_brand, rn, p_partkey, p_retailprice FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             CAST(row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS INTEGER) AS rn
      FROM part) t
    WHERE rn <= 3
    ORDER BY p_brand, rn"""

  /** Running total + lag per customer (explicit ROWS frame — the default
    * RANGE frame differs between engines on ties). */
  def q8RunningOrderTotal(spark: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val frame = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .filter(col("o_custkey") < 200)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
        sum(dec(col("o_totalprice"))).over(frame).cast("double").as("running_total"),
        lag(col("o_totalprice"), 1).over(order).as("prev_price"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  val q8RunningOrderTotalSql: String = """
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
           lag(o_totalprice, 1) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
    FROM orders
    WHERE o_custkey < 200
    ORDER BY o_custkey, o_orderdate, o_orderkey"""

  /** Global top-K: Spark plans sort+limit as TakeOrderedAndProject — a
    * per-partition top-K then a single driver merge, no full sort. */
  def q9TopOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .limit(20)

  val q9TopOrdersSql: String = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"""

  /** Exact distinct-aggregation (expand + two-phase agg under the hood). */
  def q10DistinctCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  val q10DistinctCountsSql: String = """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Set operators beyond the reference's UNION ALL: INTERSECT / EXCEPT
    * (both plan as aggregate + semi/anti join in Spark). */
  def q11NationSetOps(spark: SparkSession, dir: String): DataFrame = {
    val custNations = Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey"))
    val suppNations = Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey"))
    val both = custNations.intersect(suppNations).withColumn("side", lit("both"))
    val custOnly = custNations.except(suppNations).withColumn("side", lit("customer_only"))
    both.unionByName(custOnly).orderBy(col("side"), col("nationkey"))
  }

  val q11NationSetOpsSql: String = """
    SELECT nationkey, 'both' AS side FROM
      (SELECT c_nationkey AS nationkey FROM customer
       INTERSECT SELECT s_nationkey FROM supplier) t1
    UNION ALL
    SELECT nationkey, 'customer_only' AS side FROM
      (SELECT c_nationkey AS nationkey FROM customer
       EXCEPT SELECT s_nationkey FROM supplier) t2
    ORDER BY side, nationkey"""

  /** ROLLUP over the region→nation hierarchy. */
  def q12RollupRegionNation(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir); val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("total_bal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  val q12RollupRegionNationSql: String = """
    SELECT r_name, n_name, COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST"""

  /** GROUPING SETS through the SQL entry point (`spark.sql`) — the one
    * grouping shape the DataFrame API doesn't expose directly. */
  def q13GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    spark.sql("""
      SELECT l_returnflag, l_linestatus,
             CAST(grouping(l_returnflag) AS INT) AS g_rf,
             CAST(grouping(l_linestatus) AS INT) AS g_ls,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
  }

  val q13GroupingSetsSql: String = """
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INT) AS g_rf,
           CAST(grouping(l_linestatus) AS INT) AS g_ls,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""

  /** TPC-H Q14 flavor: conditional aggregation over a broadcast join;
    * the ratio is one double division over two exact decimal sums. */
  def q14PromoRevenueShare(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1999-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("2000-01-01").cast("timestamp"))
    val p = Tables.part(spark, dir)
    val rev = dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .agg(
        (lit(100.0) * sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast("decimal(18,2)"))).cast("double")
          / sum(rev).cast("double")).as("promo_share_pct"),
        count(lit(1)).as("n_items"))
  }

  val q14PromoRevenueShareSql: String = """
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS promo_share_pct,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '2000-01-01 00:00:00'"""

  /** TPC-H Q15 flavor: scalar subquery (max over an aggregate) expressed
    * as an unpartitioned window max — one extra exchange over the tiny
    * aggregate, not a second scan of lineitem. */
  def q15TopSupplierRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("2000-04-01").cast("timestamp"))
    // the max is a 1-row aggregate broadcast back against the per-supplier
    // relation — NOT max().over(Window.partitionBy()), which funnels every
    // supplier row through a single partition; rev is persisted so the
    // lineitem shuffle runs once for both consumers
    val rev = graft.Caches.persist(l.groupBy(col("l_suppkey"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .cast("double").as("total_revenue")))
    val maxRev = rev.agg(max(col("total_revenue")).as("max_rev"))
    val s = Tables.supplier(spark, dir)
    rev.join(broadcast(maxRev), col("total_revenue") === col("max_rev"))
      .join(s, col("l_suppkey") === s("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q15TopSupplierRevenueSql: String = """
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '2000-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey"""

  /** GROUP BY + HAVING (post-aggregation filter). */
  def q16NationsHaving(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir); val c = Tables.customer(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"))
      .filter(col("n_cust") > 60)
      .orderBy(col("n_name"))
  }

  val q16NationsHavingSql: String = """
    SELECT n_name, COUNT(*) AS n_cust
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name HAVING COUNT(*) > 60
    ORDER BY n_name"""

  /** TPC-H Q17 flavor: per-part average as a joined aggregate (the
    * correlated-subquery shape decorrelated by hand — same plan Catalyst
    * produces for the subquery form). */
  def q17SmallQuantityRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val avgQ = l.groupBy(col("l_partkey").as("ap_partkey"))
      .agg((sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"))
    l.join(avgQ, l("l_partkey") === avgQ("ap_partkey"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg(dsum(col("l_extendedprice")).as("total_price"), count(lit(1)).as("n_items"))
  }

  val q17SmallQuantityRevenueSql: String = """
    WITH a AS (
      SELECT l_partkey AS ap_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
           COUNT(*) AS n_items
    FROM lineitem JOIN a ON l_partkey = ap_partkey
    WHERE l_quantity < 0.5 * avg_qty"""

  /** Hourly tumbling-window aggregation over the events table — the batch
    * shape of the streaming windowed agg (same date_trunc bucketing). */
  def q18EventsHourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy(col("bucket"), col("event_type"))

  val q18EventsHourlySql: String = """
    SELECT date_trunc('hour', ts) AS bucket, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    ORDER BY bucket, event_type"""

  /** Sessionization: 30-minute-gap sessions per user via lag + conditional
    * count — the batch equivalent of stateful streaming sessionization.
    * Timestamps are compared in integer MICROseconds (exact in both
    * engines; fractional-second doubles would round differently). */
  def q19UserSessions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNotNull &&
             unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1).otherwise(0))
      .groupBy(col("user_id"))
      .agg((sum(col("new_session")) + 1).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  val q19UserSessionsSql: String = """
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events)
    SELECT user_id,
           CAST(SUM(CASE WHEN gap_us > 1800000000 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM g GROUP BY user_id ORDER BY user_id"""

  /** Pivot: per-user event-type counts with an explicit value list (an
    * implicit list would need an extra distinct pass — never at scale). */
  def q20EventTypePivot(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pivoted = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .count()
    types.foldLeft(pivoted)((df, t) => df.withColumn(t, coalesce(col(t), lit(0L))))
      .orderBy(col("user_id"))
  }

  val q20EventTypePivotSql: String = """
    SELECT user_id,
           CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
           CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
           CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
           CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
    FROM events GROUP BY user_id ORDER BY user_id"""

  /** lead/lag: per-user gap between consecutive events (integer-exact
    * micros; window partitioned by user, never global). */
  def q25EventGaps(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .groupBy(col("user_id"))
      .agg(count(col("gap_us")).as("n_gaps"),
        max(col("gap_us")).as("max_gap_us"),
        sum(col("gap_us")).as("total_gap_us"))
      .orderBy(col("user_id"))
  }

  val q25EventGapsSql: String = """
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events)
    SELECT user_id, COUNT(gap_us) AS n_gaps, MAX(gap_us) AS max_gap_us,
           CAST(SUM(gap_us) AS BIGINT) AS total_gap_us
    FROM g GROUP BY user_id ORDER BY user_id"""

  /** CUBE over (region, nation) — all four grouping combinations. */
  def q26CubeRegionNation(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir); val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .cube(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("total_bal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  val q26CubeRegionNationSql: String = """
    SELECT r_name, n_name, COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY CUBE (r_name, n_name)
    ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST"""

  /** Array aggregation, DETERMINISTICALLY: `collect_list`'s element
    * order is whatever the distributed reduction produced — at 1000
    * executors it differs run to run, which both breaks the oracle
    * compare and makes any downstream consumer of the array
    * order-sensitive by accident. `sort_array` on the aggregated result
    * pins it; per-group arrays stay bounded (lines per order ≤ 7) so no
    * unbounded-group blowup. */
  def q27OrderLineArrays(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(pmod(col("l_orderkey"), lit(1000)) === 0)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_linenumber"))).as("line_numbers"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("l_orderkey"))

  /** Gated form of [[q27OrderLineArrays]]: the driver's oracle
    * comparator hashes cells through pandas, and array cells arrive as
    * numpy arrays — unhashable, so the compare errors out. Encode the
    * array as a comma-joined string (stable because the array is
    * already deterministically sorted); the DuckDB SQL mirrors the
    * encoding. The array-returning form stays the real API. */
  def q27OrderLineArraysGated(spark: SparkSession, dir: String): DataFrame =
    q27OrderLineArrays(spark, dir)
      .withColumn("line_numbers",
        array_join(transform(col("line_numbers"), _.cast("string")), ","))

  val q27OrderLineArraysSql: String = """
    SELECT l_orderkey,
           array_to_string(list_sort(list(l_linenumber)), ',') AS line_numbers,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_orderkey % 1000 = 0
    GROUP BY l_orderkey
    ORDER BY l_orderkey"""

  /** Exact per-group quantiles (median / p95) — the continuous
    * (interpolating) definition: rank p·(n−1), linear blend of the two
    * bracketing sorted values, identical in Spark's `percentile` and
    * DuckDB's `quantile_cont`; the blend is ONE deterministic double
    * expression over 2-decimal inputs, so the bit-exact compare holds.
    * Exact group quantiles buffer each group's values
    * (ObjectHashAggregate, no partial reduction of the sorted state) —
    * fine for bounded groups like the 3 return flags; at 100 TB with
    * big groups the swap is `approx_percentile` (mergeable KLL-style
    * sketch, same call shape), the same exact→approx trade
    * `sk_approx_stats` records for distinct counts. */
  def q28GroupQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_quantity"), lit(0.5)).as("median_qty"),
        percentile(col("l_quantity"), lit(0.95)).as("p95_qty"),
        percentile(col("l_extendedprice"), lit(0.5)).as("median_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  val q28GroupQuantilesSql: String = """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.95) AS p95_qty,
           quantile_cont(l_extendedprice, 0.5) AS median_price,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag"""

  /** Correlated scalar subquery, through the `spark.sql` entry point
    * (SURVEY §2.5 exercises `expr()` strings; this exercises full-query
    * SQL): orders strictly above their own customer's average order
    * value. Catalyst DECORRELATES the per-row subquery into one
    * aggregate + join — `.explain` shows no per-row re-execution, the
    * plan is the same two-shuffle aggregate⋈join a hand-written
    * DataFrame version would produce. The avg is decimal-exact then one
    * double division (the file-header float convention). */
  def q29AboveCustomerAvg(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(q29AboveCustomerAvgSql)
  }

  val q29AboveCustomerAvgSql: String = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > (
      SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*)
      FROM orders o2
      WHERE o2.o_custkey = o.o_custkey)
    ORDER BY o_orderkey"""

  /** TPC-H Q21 flavor: suppliers who were the SOLE late supplier on a
    * multi-supplier finished order (the classic EXISTS + NOT-EXISTS
    * double correlation). Instead of two correlated self-joins of the
    * fact table (three lineitem scans in the textbook SQL), the Spark
    * plan folds both quantifiers into ONE per-order aggregate:
    * `ns` = distinct suppliers, `nl` = distinct LATE suppliers, and the
    * single late supplier's key via `min(when(late))` — EXISTS(other
    * supplier) ⇔ ns ≥ 2, NOT EXISTS(other late) ⇔ nl = 1. One shuffle
    * on orderkey + a broadcast of the supplier dim replaces two extra
    * corpus joins; at 100 TB that is the difference between one pass
    * and three. "Late" = shipped > 90 days after the order date, on raw
    * timestamps so both engines compare identically. */
  def q33WaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val s  = Tables.supplier(spark, dir)
    val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")
    val perOrder = li.select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(
        countDistinct(col("l_suppkey")).as("ns"),
        countDistinct(when(late, col("l_suppkey"))).as("nl"),
        min(when(late, col("l_suppkey"))).as("late_supp"))
      .filter(col("ns") >= 2 && col("nl") === 1)
    perOrder
      .groupBy(col("late_supp"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(s), col("late_supp") === s("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  val q33WaitingSuppliersSql: String = """
    WITH oa AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS ns,
             COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                                 THEN l_suppkey END) AS nl,
             MIN(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                      THEN l_suppkey END) AS late_supp
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY l_orderkey)
    SELECT s_name, COUNT(*) AS numwait
    FROM oa JOIN supplier ON late_supp = s_suppkey
    WHERE ns >= 2 AND nl = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10"""

  /** Rolling-window anomaly flags over the event stream: per user, in
    * (ts, event_id) order, a row is anomalous when its value deviates
    * from the mean of its trailing 5-row window by more than $100.
    * Exact integers throughout (file-header convention): with cents
    * c and the window's count n / sum S, `|c − S/n| > 100  ⇔
    * |n·c − S| > 10000·n` — no division, so Spark's and DuckDB's window
    * folds agree bit-for-bit. One shuffle on user_id; the window state
    * is 5 rows deep regardless of corpus size, so the same plan holds
    * at 100 TB (and the same predicate is the streaming
    * mapGroupsWithState kernel — see StreamingPipeline). */
  def q34RollingAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val cents = col("value").cast("decimal(18,2)").multiply(lit(100)).cast("long")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-4, Window.currentRow)
    ev.select(col("event_id"), col("user_id"), col("ts"), col("value"),
        cents.as("c"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("c")).over(w))
      .filter(abs(col("n") * col("c") - col("s")) > lit(10000L) * col("n"))
      .select(col("event_id"), col("user_id"), col("value"),
        (col("n") * col("c") - col("s")).as("dev_n_cents"))
      .orderBy(col("event_id"))
  }

  val q34RollingAnomalySql: String = """
    WITH c AS (
      SELECT event_id, user_id, ts, value,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      FROM events),
    w AS (
      SELECT event_id, user_id, value, c,
             COUNT(*) OVER win AS n,
             SUM(c)   OVER win AS s
      FROM c
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
    SELECT event_id, user_id, value, CAST(n*c - s AS BIGINT) AS dev_n_cents
    FROM w
    WHERE ABS(n*c - s) > 10000*n
    ORDER BY event_id"""
}
