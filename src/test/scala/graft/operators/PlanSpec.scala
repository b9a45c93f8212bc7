package graft.operators

import graft.{Caches, SparkEntry, SparkSpec}

/** Suite-wide physical-plan audit — the 100 TB shape invariants, checked
  * over EVERY gated query so a regression in any operator's plan fails
  * CI, not the next scale test. */
class PlanSpec extends SparkSpec {

  /** The only sanctioned nested-loop joins: a tiny broadcast side with a
    * genuinely non-equi condition (the brute-force ANN query set, and
    * the 16-row IVF codebook) — both O(corpus · small-constant). */
  private val bnljAllowed = Set("sim_bruteforce_topk", "sim_ivf_topk")

  test("no gated query plans a CartesianProduct, and BNLJ only where sanctioned") {
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sf()).queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"), s"$name plans a CartesianProduct")
        if (!bnljAllowed(name))
          assert(!plan.contains("BroadcastNestedLoopJoin"),
            s"$name plans a BroadcastNestedLoopJoin")
      } finally Caches.releaseAll()
    }
  }

  test("dimension joins broadcast; scans push filters; top-k never global-sorts") {
    val broadcastExpected = Seq("q2_customer_by_region", "q3_shipping_priority",
      "q15_top_supplier_revenue", "q16_nations_having")
    broadcastExpected.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf()).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$name should broadcast its dim side")
      Caches.releaseAll()
    }
    val s1 = SparkEntry.queries("s1_scan_prune_filter")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(s1.contains("PushedFilters: [") && !s1.contains("PushedFilters: []"),
      "s1 filter must reach the parquet scan")
    val q9 = SparkEntry.queries("q9_top_orders")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(q9.contains("TakeOrderedAndProject"), "q9 top-k must not global-sort")
  }
}
