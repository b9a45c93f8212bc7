package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact-arithmetic k-sigma outlier semantics. */
class OutlierSpec extends SparkSpec {
  import spark.implicits._

  // group "a": values [0,0,0,0,100] → μ=20, σ_pop=40 exactly
  private def fixture = Seq(
    (1L, "a", 0.00), (2L, "a", 0.00), (3L, "a", 0.00), (4L, "a", 0.00),
    (5L, "a", 100.00),
    // group "b": constant → σ=0, nothing can be an outlier
    (6L, "b", 7.00), (7L, "b", 7.00)
  ).toDF("event_id", "event_type", "value")

  test("k=1 flags the far point and not the near ones") {
    val got = Profiling.valueOutliers(fixture, 1)
      .select($"event_id").as[Long].collect().toSeq
    assert(got == Seq(5L), "only the 100 (dev 80 > sigma 40) is out at k=1")
  }

  test("a point EXACTLY at k·sigma is not an outlier (strict, exact integers)") {
    // dev(100) = 80 = 2·sigma — float arithmetic could tip either way,
    // the integer predicate cannot
    val got = Profiling.valueOutliers(fixture, 2).count()
    assert(got == 0L)
  }

  test("zero-variance groups flag nothing") {
    val got = Profiling.valueOutliers(fixture, 1)
      .filter($"event_type" === "b").count()
    assert(got == 0L)
  }

  test("matches the float z-score form on the real fixture") {
    val ev = graft.sources.Tables.events(spark, sf())
    val exact = Profiling.valueOutliers(ev, 3)
      .select($"event_id").as[Long].collect().toSet
    val stats = ev.groupBy($"event_type")
      .agg(avg($"value").as("m"), stddev_pop($"value").as("sd"))
    val float = ev.join(stats, "event_type")
      .filter(abs($"value" - $"m") > lit(3.0) * $"sd")
      .select($"event_id").as[Long].collect().toSet
    // the two formulations may disagree only within float ulps of the
    // 3-sigma boundary; none of the fixture points sit there
    assert(exact == float)
  }

  test("plan: stats broadcast back, no second corpus shuffle") {
    val plan = Profiling.profValueOutliers(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "group stats must broadcast")
    assert(!plan.contains("SortMergeJoin"))
  }
}
