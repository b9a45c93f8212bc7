package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deletion-neighborhood fuzzy matching: recall guarantee + verify. */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private def pairsAt(rows: Seq[(Long, String)], d: Int) =
    EntityResolution.fuzzyMatchPairs(rows.toDF("id", "name"), "id", "name", d)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet

  private def pairs(rows: Seq[(Long, String)]) = pairsAt(rows, 1)

  test("finds substitution, insertion and deletion pairs") {
    val got = pairs(Seq(1L -> "karen", 2L -> "caren", // substitution
      3L -> "karena", // insertion vs 1
      4L -> "aren"    // deletion vs 1
    ))
    assert(got == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 4L)))
    // (2,4): caren vs aren is also one deletion; (3,4) distance 2; (2,3) distance 2
  }

  test("distance-2 pairs share a variant but are verified out") {
    // "ab" del 0 = "b" = "ba" del 1 -> candidate; levenshtein = 2 -> out
    assert(pairs(Seq(1L -> "ab", 2L -> "ba")).isEmpty)
  }

  test("repeated chars yield one output row per pair, not per shared variant") {
    // "aab" and "ab" share variants via deleting either 'a'
    val df = EntityResolution.fuzzyMatchPairs(
      Seq(1L -> "aab", 2L -> "ab").toDF("id", "name"), "id", "name")
    assert(df.count() == 1L)
  }

  test("identical strings under different ids pair up") {
    assert(pairs(Seq(1L -> "same", 2L -> "same")) == Set((1L, 2L)))
  }

  test("recall 1.0 vs the quadratic ground truth on real customer names") {
    val c = graft.sources.Tables.customer(spark, sf())
      .select($"c_custkey", $"c_name")
    val blocked = EntityResolution.fuzzyMatchPairs(c, "c_custkey", "c_name")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val a = c.select($"c_custkey".as("ia"), $"c_name".as("na"))
    val quadratic = a.crossJoin(c.select($"c_custkey".as("ib"), $"c_name".as("nb")))
      .filter($"ia" < $"ib" && levenshtein($"na", $"nb") <= 1)
      .select($"ia", $"ib").as[(Long, Long)].collect().toSet
    assert(blocked == quadratic)
    assert(blocked.nonEmpty, "fixture should contain near-miss names")
  }

  test("plan: equi-join on the variant, no cartesian pass") {
    val plan = EntityResolution.erFuzzyMatch(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("radius 2: transpositions, double substitutions, mixed edits all match") {
    val got = pairsAt(Seq(
      1L -> "karen",
      2L -> "kraen",  // transposition = 2 substitutions -> d2 only
      3L -> "caten",  // two substitutions vs 1
      4L -> "karenXY", // two insertions vs 1
      5L -> "ren",    // two deletions vs 1
      6L -> "qqqqq"   // distance 5 from everything karen-like
    ), d = 2)
    assert(got.contains((1L, 2L)) && got.contains((1L, 3L)) &&
      got.contains((1L, 4L)) && got.contains((1L, 5L)))
    assert(!got.exists(p => p._1 == 6L || p._2 == 6L), s"far string matched: $got")
    // d1 finds none of the distance-2 pairs
    val d1 = pairsAt(Seq(1L -> "karen", 2L -> "kraen", 3L -> "caten"), d = 1)
    assert(d1.isEmpty)
  }

  test("radius 2: far pairs sharing a 2-deletion variant are verified out") {
    // "12ab" del {1,2} = "ab" = "ab34" del {3,4} -> candidate generated,
    // but levenshtein("12ab", "ab34") = 4 -> the verify must drop it
    assert(pairsAt(Seq(1L -> "12ab", 2L -> "ab34"), d = 2).isEmpty,
      "a shared 2-deletion variant at distance 4 must not survive the verify")
  }

  test("radius 2: recall 1.0 vs the quadratic ground truth on customer names") {
    val c = graft.sources.Tables.customer(spark, sf())
      .select($"c_custkey", $"c_name")
    val blocked = EntityResolution.fuzzyMatchPairs(c, "c_custkey", "c_name", 2)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val a = c.select($"c_custkey".as("ia"), $"c_name".as("na"))
    val quadratic = a.crossJoin(c.select($"c_custkey".as("ib"), $"c_name".as("nb")))
      .filter($"ia" < $"ib" && levenshtein($"na", $"nb") <= 2)
      .select($"ia", $"ib").as[(Long, Long)].collect().toSet
    assert(blocked == quadratic)
    assert((quadratic -- EntityResolution.fuzzyMatchPairs(c, "c_custkey", "c_name", 1)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet).nonEmpty,
      "fixture should contain genuinely-distance-2 pairs")
  }

  test("entity clusters equal a union-find over the pairs; canonical is the min id") {
    val pairs = EntityResolution.erFuzzyMatch(spark, sf())
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    graft.Caches.releaseAll()
    val ent = EntityResolution.erCluster(spark, sf())
      .as[(Long, Long, Boolean)].collect()
    graft.Caches.releaseAll()
    assert(ent.nonEmpty)
    val label = ent.map(r => r._1 -> r._2).toMap
    // ground truth: driver-side union-find over the same pairs
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val roots = parent.keys.map(x => x -> find(x)).toMap
    assert(label.keySet == roots.keySet, "vertex sets differ")
    // same partition, min-id labels
    label.foreach { case (id, e) => assert(e == roots(id), s"label of $id") }
    // canonical law: exactly one per entity, the min
    ent.groupBy(_._2).foreach { case (e, ms) =>
      assert(e == ms.map(_._1).min, s"entity $e label not min")
      assert(ms.count(_._3) == 1 && ms.find(_._3).get._1 == e,
        s"entity $e canonical flag")
    }
  }

  test("radius 3 is rejected loudly (wants a different blocker, not C(len,3))") {
    val e = intercept[IllegalArgumentException] {
      EntityResolution.fuzzyMatchPairs(
        Seq(1L -> "x").toDF("id", "name"), "id", "name", 3)
    }
    assert(e.getMessage.contains("{1, 2}"))
  }
}
