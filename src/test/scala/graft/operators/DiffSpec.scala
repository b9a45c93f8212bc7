package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DiffSpec extends SparkSpec {
  import spark.implicits._

  private def diffMap(v1: Seq[(Long, String, Option[String])],
      v2: Seq[(Long, String, Option[String])]): Map[Long, String] =
    Diff.snapshotDiff(
        v1.toDF("k", "a", "b"), v2.toDF("k", "a", "b"),
        Seq("k"), Seq(col("a"), col("b")))
      .select($"k", $"status").as[(Long, String)].collect().toMap

  test("statuses: added / removed / changed / unchanged, including null flips") {
    val got = diffMap(
      v1 = Seq((1L, "x", Some("p")), (2L, "y", None), (3L, "z", Some("q")),
               (4L, "w", Some("r"))),
      v2 = Seq((1L, "x", Some("p")), (2L, "y", Some("now-set")),
               (4L, "CHANGED", Some("r")), (5L, "new", None)))
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "added"))
  }

  test("an actual NULL never collides with its sentinel or empty rendering") {
    // null vs the literal strings "<null>" and "" must all be CHANGED
    val got = diffMap(
      v1 = Seq((1L, "x", None), (2L, "x", None)),
      v2 = Seq((1L, "x", Some("<null>")), (2L, "x", Some(""))))
    assert(got == Map(1L -> "changed", 2L -> "changed"))
  }

  test("embedded separators cannot shift column boundaries into a collision") {
    // ("a|0", "b") vs ("a", "0|b") concatenate identically without the
    // length prefix; the digest must still see them as different rows
    val got = diffMap(
      v1 = Seq((1L, "a|0", Some("b"))),
      v2 = Seq((1L, "a", Some("0|b"))))
    assert(got == Map(1L -> "changed"))
  }

  test("gated orders diff: statuses follow the synthetic v2 derivation law") {
    val o = graft.sources.Tables.orders(spark, sf())
    val keys = o.select($"o_orderkey").as[Long].collect().toSet
    val got = Diff.profDatasetDiff(spark, sf())
      .as[(Long, String)].collect()
    val byStatus = got.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byStatus("removed") == keys.filter(_ % 13 == 0))
    assert(byStatus("added") == keys.filter(_ % 11 == 0).map(_ + Diff.AddOffset))
    // changed = status flip on %7==1 keys that survived the removal
    assert(byStatus("changed") == keys.filter(k => k % 7 == 1 && k % 13 != 0))
    // nothing else leaks through the churn filter
    assert(got.map(_._2).toSet == Set("added", "removed", "changed"))
  }

  test("empty versions diff cleanly (all added / all removed)") {
    val empty = Seq.empty[(Long, String, Option[String])]
    val some = Seq((1L, "x", Option("y")))
    assert(diffMap(empty, some) == Map(1L -> "added"))
    assert(diffMap(some, empty) == Map(1L -> "removed"))
    assert(diffMap(empty, empty).isEmpty)
  }
}
