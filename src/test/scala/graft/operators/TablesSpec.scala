package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Data contract + encoding-branch tests for the events catalog entry.
  *
  * Round-7 lesson: the upstream generator silently switched `events.ts`
  * from TIMESTAMP(NANOS) to timestamp[us] and the hard-coded `div 1000`
  * compressed 30 days of events into ~43 minutes, corrupting every
  * session/window/cohort result while all plumbing stayed "green".
  * These tests pin both decode branches AND the loud-failure contract.
  */
class TablesSpec extends SparkSpec {

  test("driver testdata decodes to a sane multi-day event-time range") {
    val mm = Tables.events(spark, sf())
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
      .head()
    val (lo, hi) = (mm.getTimestamp(0), mm.getTimestamp(1))
    val (y2000, y2100) = (946684800000L, 4102444800000L)
    assert(lo.getTime >= y2000 && hi.getTime < y2100,
      s"decoded range [$lo, $hi] outside years [2000, 2100)")
    assert(hi.getTime - lo.getTime > 86400000L,
      s"decoded span ${hi.getTime - lo.getTime} ms is under one day — unit-compressed?")
    assert(Tables.events(spark, sf()).schema("ts").dataType == TimestampType)
  }

  test("unannotated int64 ts (legacy raw nanos) takes the div-1000 branch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nanos").toString
    // 2024-01-01T00:00:00Z .. +2 days, in NANOS, written as plain LongType
    // (Spark cannot write TIMESTAMP(NANOS); an unannotated int64 exercises
    // the same probe branch — no timestamp logical annotation → NANOS)
    val base = 1704067200L * 1000000000L
    val rows = (0 until 10).map { i =>
      Row(i.toLong, base + i.toLong * 17280L * 1000000000L, i.toLong % 3,
        "click", i.toDouble, "{}")
    }
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Tables.eventsRawSchema)
    raw.write.mode("overwrite").parquet(s"$dir/events.parquet")

    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    val mm = ev.agg(min(col("ts")), max(col("ts"))).head()
    assert(mm.getTimestamp(0).getTime == 1704067200000L)
    // 9 * 17280 s = 155520 s → exactly +1.8 days in micros→millis
    assert(mm.getTimestamp(1).getTime == 1704067200000L + 155520L * 1000L)
  }

  test("a unit-compressed file fails the data contract loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-badts").toString
    // micros values written into an unannotated int64 column: the probe
    // reads NANOS, decode divides by 1000 → the epoch lands in 1970,
    // outside the contract's year window — it must name the problem
    val base = 1704067200L * 1000000L
    val rows = (0 until 10).map { i =>
      Row(i.toLong, base + i.toLong * 17280L * 1000000L, i.toLong % 3,
        "click", i.toDouble, "{}")
    }
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Tables.eventsRawSchema)
    raw.write.mode("overwrite").parquet(s"$dir/events.parquet")

    val e = intercept[IllegalArgumentException](Tables.events(spark, dir))
    assert(e.getMessage.contains("data contract"))
  }
}
