package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Range (interval-point) join — the second time-series operator Spark
  * has no native scale path for (a raw `l.lo <= p AND p <= l.hi` theta
  * join plans as BroadcastNestedLoopJoin).
  *
  * Scale shape: BIN the range dimension. Each interval explodes to the
  * bins it covers (⌈span/binWidth⌉+1 rows), each point maps to exactly
  * one bin, and the join becomes an EQUI-join on the bin id with the
  * exact containment predicate as a post-filter — the binning is a
  * pruning device, never an approximation. Shuffle cost
  * O(|points| + |intervals|·bins-per-interval); choose `binWidth` near
  * the typical interval span so bins-per-interval stays ~2.
  *
  * The DuckDB oracle uses the plain theta-join formulation — same exact
  * semantics, so the binned plan is verified against the naive one.
  */
object RangeJoin {

  /** Join every point row to every interval row whose `[loCol, hiCol]`
    * (inclusive) contains `pointCol`. All three columns must be LONG on
    * a shared scale (e.g. epoch micros); callers convert first. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    ReservedCols.requireAbsent(points, "pointInInterval(points)", "__bin")
    ReservedCols.requireAbsent(intervals, "pointInInterval(intervals)", "__bin")
    val p = points.withColumn("__bin", floor(col(pointCol) / binWidth))
    val iv = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    p.join(iv, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Interval-overlap join: every (a, b) pair whose inclusive ranges
    * `[loA, hiA]` and `[loB, hiB]` intersect (and whose `extraKeys`
    * match). Same binning device as [[pointInInterval]], with the
    * FIRST-OVERLAPPING-BIN trick for dedup: a pair co-occurs in every
    * bin their ranges share, so instead of a distinct shuffle over the
    * output, each pair is emitted only from the bin containing
    * `max(loA, loB)` — plain arithmetic, no extra exchange. */
  def intervalOverlap(a: DataFrame, b: DataFrame,
                      loA: String, hiA: String, loB: String, hiB: String,
                      binWidth: Long, extraKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    ReservedCols.requireAbsent(a, "intervalOverlap(a)", "__bin")
    ReservedCols.requireAbsent(b, "intervalOverlap(b)", "__bin")
    val ab = a.withColumn("__bin",
      explode(sequence(floor(col(loA) / binWidth), floor(col(hiA) / binWidth))))
    val bb = b.withColumn("__bin",
      explode(sequence(floor(col(loB) / binWidth), floor(col(hiB) / binWidth))))
    ab.join(bb, extraKeys :+ "__bin")
      .filter(col(loA) <= col(hiB) && col(loB) <= col(hiA))
      .filter(col("__bin") === floor(greatest(col(loA), col(loB)) / binWidth))
      .drop("__bin")
  }

  private val DayUs = 86400L * 1000000L

  /** Gated query: for a 1-in-100 sample of orders, how many lineitems
    * (any order) shipped within 1 day of the order's date — an
    * interval-point range join binned by day. */
  def q22RangeShipWindow(spark: SparkSession, dir: String): DataFrame = {
    val intervals = Tables.orders(spark, dir)
      .filter(pmod(col("o_orderkey"), lit(100)) === 0)
      .select(col("o_orderkey"),
        unix_micros(col("o_orderdate")).as("lo"),
        (unix_micros(col("o_orderdate")) + lit(DayUs)).as("hi"))
    val points = Tables.lineitem(spark, dir)
      .select(unix_micros(col("l_shipdate")).as("p"))
    pointInInterval(points, "p", intervals, "lo", "hi", binWidth = DayUs)
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_shipped"))
      .orderBy(col("o_orderkey"))
  }

  val q22RangeShipWindowSql: String = s"""
    SELECT o_orderkey, COUNT(*) AS n_shipped
    FROM (SELECT o_orderkey,
                 epoch_us(o_orderdate) AS lo,
                 epoch_us(o_orderdate) + $DayUs AS hi
          FROM orders WHERE o_orderkey % 100 = 0) iv
    JOIN (SELECT epoch_us(l_shipdate) AS p FROM lineitem) pt
      ON pt.p >= iv.lo AND pt.p <= iv.hi
    GROUP BY o_orderkey
    ORDER BY o_orderkey"""

  /** Gated query: pairs of a customer's sampled orders whose 30-day
    * windows overlap — an interval-interval overlap join keyed by
    * customer, binned by the window span. */
  def q24OverlappingOrderWindows(spark: SparkSession, dir: String): DataFrame = {
    def side(p: String) = Tables.orders(spark, dir)
      .filter(pmod(col("o_orderkey"), lit(5)) === 0)
      .select(col("o_custkey"), col("o_orderkey").as(s"${p}_key"),
        unix_micros(col("o_orderdate")).as(s"${p}_lo"),
        (unix_micros(col("o_orderdate")) + lit(30L * DayUs)).as(s"${p}_hi"))
    intervalOverlap(side("a"), side("b"), "a_lo", "a_hi", "b_lo", "b_hi",
        binWidth = 30L * DayUs, extraKeys = Seq("o_custkey"))
      .filter(col("a_key") < col("b_key"))
      .select(col("o_custkey"), col("a_key"), col("b_key"))
      .orderBy(col("o_custkey"), col("a_key"), col("b_key"))
  }

  val q24OverlappingOrderWindowsSql: String = s"""
    WITH s AS (
      SELECT o_custkey, o_orderkey AS k,
             epoch_us(o_orderdate) AS lo,
             epoch_us(o_orderdate) + ${30L * DayUs} AS hi
      FROM orders WHERE o_orderkey % 5 = 0)
    SELECT a.o_custkey, a.k AS a_key, b.k AS b_key
    FROM s a JOIN s b USING (o_custkey)
    WHERE a.k < b.k AND a.lo <= b.hi AND b.lo <= a.hi
    ORDER BY o_custkey, a_key, b_key"""
}
