package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin`) is the first
  * line of defense and is on in every entry point; salting is the
  * explicit fallback for the cases AQE can't fix — e.g. a single hot key
  * whose one partition exceeds executor memory BEFORE the join, or
  * aggregations (AQE only splits join partitions). No reference
  * counterpart; this is 100 TB posture.
  */
object Skew {

  /** Salted equi-join: the (big, skewed) left side gets a deterministic
    * salt in [0, buckets); the right side is replicated `buckets`× via
    * one `explode` of a literal range; the join key becomes
    * (keys..., salt) so the hot key's rows spread over `buckets`
    * partitions. Right-side replication cost is `buckets × |right|` —
    * use for mid-size right relations that are too big to broadcast but
    * far smaller than the left.
    *
    * `saltOn` must be deterministic per left row (any column(s) —
    * typically a unique id); the bucket assignment only needs to spread
    * rows, never to be stable across runs, but a deterministic choice
    * keeps retried tasks idempotent under exactly-once sinks. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltOn: Column, buckets: Int = 16): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    ReservedCols.requireAbsent(left, "saltedJoin(left)", "__salt")
    ReservedCols.requireAbsent(right, "saltedJoin(right)", "__salt")
    val salted = left.withColumn("__salt", pmod(xxhash64(saltOn), lit(buckets)).cast("int"))
    val replicated = right
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Gated query: per-event-type stats through the two-phase salted
    * aggregation — event_type has 5 hot keys over the whole table, the
    * exact shape where a single-phase groupBy funnels each key through
    * one reducer. The oracle is the plain GROUP BY (same exact result:
    * counts and long sums are associative across salt buckets). */
  def q23SaltedEventStats(spark: SparkSession, dir: String): DataFrame =
    saltedAgg(graft.sources.Tables.events(spark, dir),
        keys = Seq("event_type"), saltOn = col("event_id"), buckets = 16,
        partial = Seq(count(lit(1)).as("c"),
          sum(col("value").cast("decimal(18,2)")).as("v")),
        merge = Seq(sum(col("c")).as("n_events"),
          sum(col("v")).cast("double").as("total_value")))
      .orderBy(col("event_type"))

  val q23SaltedEventStatsSql: String = """
    SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type ORDER BY event_type"""

  /** Two-phase (partial → final) aggregation for a skewed group key:
    * aggregate on (keys..., salt) first — the hot group's rows combine in
    * `buckets` parallel partial groups — then re-aggregate on the real
    * keys. `merge` must be the associative second-phase combiner of the
    * partial aggregates (sum for counts/sums, etc.). */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltOn: Column, buckets: Int,
                partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    ReservedCols.requireAbsent(df, "saltedAgg", "__salt")
    df.withColumn("__salt", pmod(xxhash64(saltOn), lit(buckets)).cast("int"))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }
}
