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

  test("strict mode fails loudly on (key, seq) ties; lenient mode does not") {
    val tied = Seq(
      Change(2, "b1", 1, "U"), Change(2, "b2", 1, "U")).toDF()
    val e = intercept[IllegalArgumentException] {
      Cdc.applyChangelog(snap, tied, Seq("k"), strict = true)
    }
    assert(e.getMessage.contains("tied"), e.getMessage)
    intercept[IllegalArgumentException] {
      Cdc.applyChangelogScd2(snap, tied, Seq("k"), strict = true)
    }
    // lenient mode keeps the old pick-one behavior (one row for key 2)
    assert(Cdc.applyChangelog(snap, tied, Seq("k"))
      .filter(col("k") === 2).count() == 1)
  }

  test("scd2: versions chain per key, one current row max, deletes close history") {
    val changes = Seq(
      Change(2, "b1", 1, "U"), Change(2, "b2", 2, "U"), // two versions + closed snapshot row
      Change(3, "c1", 1, "U"), Change(3, "c1", 2, "D"), // history ends deleted: no current
      Change(4, "d", 1, "I")                            // insert: one open version
    ).toDF()
    val hist = Cdc.applyChangelogScd2(snap, changes, Seq("k"), strict = true)
      .select("k", "v", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Option[Long], Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._3.getOrElse(Long.MinValue)))
    assert(hist.toSeq == Seq(
      (1L, "a", None, None, true),            // untouched passthrough
      (2L, "b", None, Some(1L), false),       // snapshot row closed at first change
      (2L, "b1", Some(1L), Some(2L), false),  // superseded by seq 2
      (2L, "b2", Some(2L), None, true),       // open current version
      (3L, "c", None, Some(1L), false),
      (3L, "c1", Some(1L), Some(2L), false),  // closed by the delete, which emits no row
      (4L, "d", Some(1L), None, true)
    ), s"got ${hist.toSeq}")
  }

  test("scd2 current rows reconstruct exactly the applyChangelog snapshot") {
    // the two operators must agree: filtering SCD2 history to is_current
    // and dropping the validity columns IS the merged snapshot
    val o = graft.sources.Tables.orders(spark, sf())
    val changes = Cdc.syntheticOrdersChangelog(o)
    val fromScd2 = Cdc.applyChangelogScd2(o, changes, Seq("o_orderkey"))
      .filter(col("is_current"))
      .drop("valid_from", "valid_to", "is_current")
    val merged = Cdc.applyChangelog(o, changes, Seq("o_orderkey"))
    assert(fromScd2.exceptAll(merged).isEmpty && merged.exceptAll(fromScd2).isEmpty,
      "SCD2 current slice diverges from the merge result")
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

  test("scd2 delta fold: chained slice folds equal the one-shot merge") {
    // every arm crosses the slice boundary: update→update, update→delete,
    // insert-then-update, and a slice-2-only insert
    val changes = Seq(
      Change(2, "b1", 1, "U"), Change(2, "b2", 2, "U"),
      Change(3, "c1", 1, "U"), Change(3, "c1", 2, "D"),
      Change(9, "i1", 1, "I"), Change(9, "i2", 2, "U"),
      Change(8, "j1", 2, "I")).toDF()
    val oneShot = Cdc.applyChangelogScd2(snap, changes, Seq("k"))
      .collect().toSet
    val seed = snap
      .withColumn("valid_from", lit(null).cast("long"))
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))
    val folded = Seq(1L, 2L).foldLeft(seed) { (h, s) =>
      Cdc.applyChangelogScd2Delta(h, changes.filter(col("_seq") === s), Seq("k"))
    }.collect().toSet
    assert(folded == oneShot,
      s"fold diverged: missing=${(oneShot -- folded).take(3)} extra=${(folded -- oneShot).take(3)}")
  }
}
