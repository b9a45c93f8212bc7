package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deletion-neighborhood fuzzy matching: recall guarantee + verify. */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: Seq[(Long, String)]) =
    EntityResolution.fuzzyMatchPairs(rows.toDF("id", "name"), "id", "name")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet

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
}
