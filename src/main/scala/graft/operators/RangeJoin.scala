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
    val p = points.withColumn("__bin", floor(col(pointCol) / binWidth))
    val iv = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    p.join(iv, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
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
}
