package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Opt-in approximate query mode — a Catalyst optimizer [[Rule]], the
  * engine-extension surface for whole-plan rewrites (custom
  * `Expression`s cover scalar kernels; this covers semantics switches).
  *
  * When `spark.graft.approx.distinct` is `true`, every
  * `COUNT(DISTINCT col)` in the optimized plan is rewritten to
  * HyperLogLog++ (`approx_count_distinct`, default 5% relative error).
  * Why a rule rather than "just write approx in the query": interactive
  * exploration and scheduled dashboards share query text with exact
  * pipelines; the flag turns the SAME queries into one-pass sketch
  * aggregations (no Expand, no distinct shuffle — partial HLL buffers
  * merge associatively) for a 100 TB-scale interactive tier, without
  * forking the query set. Exact runs (the oracle-gated default) are
  * untouched — the rule is a no-op unless the flag is set.
  *
  * Only single-argument COUNT(DISTINCT x) rewrites; multi-arg distinct
  * counts and other distinct aggregates (SUM DISTINCT) pass through
  * unchanged — their sketch equivalents have different semantics.
  *
  * Registration: production sessions install [[GraftExtensions]] via
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `.withExtensions`); an already-running session can inject through
  * `spark.experimental.extraOptimizations` (both paths end in the same
  * optimizer batch; the rule is tested through the latter since a test
  * JVM shares one SparkContext). */
object ApproxDistinctRule extends Rule[LogicalPlan] {

  val FLAG = "spark.graft.approx.distinct"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!SQLConf.get.getConfString(FLAG, "false").toBoolean) plan
    else plan.transformAllExpressions {
      case ae @ AggregateExpression(c: Count, _, true, _, _) if c.children.size == 1 =>
        ae.copy(aggregateFunction = HyperLogLogPlusPlus(c.children.head),
          isDistinct = false)
    }
}

/** `SparkSessionExtensions` installer for the graft engine's planner
  * extensions (currently [[ApproxDistinctRule]]); wire with
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => ApproxDistinctRule)
}
