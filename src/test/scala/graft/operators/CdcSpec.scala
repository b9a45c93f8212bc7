package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

object CdcSpec {
  final case class Snap(k: Long, v: String)
  final case class Change(k: Long, v: String, _seq: Long, _op: String)
}

class CdcSpec extends SparkSpec {
  import CdcSpec._
  import spark.implicits._

  private def snap = Seq(Snap(1, "a"), Snap(2, "b"), Snap(3, "c")).toDF()

  test("applyChangelog: last-wins update, delete-after-update, insert, passthrough") {
    val changes = Seq(
      Change(2, "b1", 1, "U"), Change(2, "b2", 2, "U"), // double update: seq 2 wins
      Change(3, "c1", 1, "U"), Change(3, "c1", 2, "D"), // delete-after-update: gone
      Change(4, "d", 1, "I")                            // brand-new key
    ).toDF()
    val merged = Cdc.applyChangelog(snap, changes, Seq("k"))
      .as[Snap].collect().sortBy(_.k)
    assert(merged.toSeq == Seq(Snap(1, "a"), Snap(2, "b2"), Snap(4, "d")),
      s"got ${merged.toSeq}")
  }

  test("applyChangelog: out-of-order delivery merges identically") {
    // CDC feeds replay out of order within a batch; seq decides, not
    // arrival position
    val changes = Seq(
      Change(2, "b2", 2, "U"), Change(2, "b1", 1, "U"),
      Change(3, "c1", 2, "D"), Change(3, "c1", 1, "U"),
      Change(4, "d", 1, "I")).toDF()
    val merged = Cdc.applyChangelog(snap, changes, Seq("k"))
      .as[Snap].collect().sortBy(_.k)
    assert(merged.toSeq == Seq(Snap(1, "a"), Snap(2, "b2"), Snap(4, "d")))
  }

  test("applyChangelog: empty changelog is identity") {
    val merged = Cdc.applyChangelog(snap, Seq.empty[Change].toDF(), Seq("k"))
      .as[Snap].collect().sortBy(_.k)
    assert(merged.toSeq == Seq(Snap(1, "a"), Snap(2, "b"), Snap(3, "c")))
  }

  test("applyChangelog rejects schema drift") {
    val bad = Seq(("x", 1L, 1L, "U")).toDF("v", "k", "_seq", "_badname")
    intercept[IllegalArgumentException] {
      Cdc.applyChangelog(snap, bad, Seq("k"))
    }
    intercept[IllegalArgumentException] {
      Cdc.applyChangelog(snap.withColumnRenamed("v", "_seq"),
        Seq.empty[Change].toDF(), Seq("k"))
    }
  }

  test("cdc gated query: inserts land under offset keys, deletes shrink the snapshot") {
    val merged = Cdc.cdcMergeOrders(spark, sf())
    val o = graft.sources.Tables.orders(spark, sf())
    val nOrig = o.count()
    val nDeleted = o.filter(pmod(col("o_orderkey"), lit(10)) === 7).count()
    val nInserted = o.filter(pmod(col("o_orderkey"), lit(10)) === 9).count()
    assert(merged.count() == nOrig - nDeleted + nInserted)
    assert(merged.filter(col("o_orderkey") >= Cdc.InsertOffset).count() == nInserted)
    // the changelog window must shuffle the changelog only — the
    // snapshot side of the anti join must not sort on key (anti join of
    // a tiny touched-key set plans as broadcast under AQE)
    val upd2 = merged.filter(pmod(col("o_orderkey"), lit(20)) === 3
      && col("o_orderkey") < Cdc.InsertOffset)
    assert(upd2.filter(col("o_orderstatus") =!= "U2").count() == 0,
      "seq-2 update must win over seq-1")
  }
}
