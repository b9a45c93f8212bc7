package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloom prune keeps every true match (no false negatives)") {
    val dim = Tables.orders(spark, sf())
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val fact = Tables.lineitem(spark, sf())
    val pruned = BloomJoin.pruneFactKeys(fact, "l_orderkey",
      dim, "o_orderkey", expectedItems = 100000L, fpp = 0.01)
    // every fact row that joins must survive the prune: the exact join
    // over the pruned fact equals the exact join over the raw fact
    val exact = fact.join(dim, col("l_orderkey") === col("o_orderkey")).count()
    val prunedJoin = pruned.join(dim, col("l_orderkey") === col("o_orderkey")).count()
    assert(prunedJoin == exact, s"prune lost matches: $prunedJoin vs $exact")
  }

  test("bloom prune actually prunes (and fpp bounds the leakage)") {
    val dim = Tables.orders(spark, sf())
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val fact = Tables.lineitem(spark, sf())
    val pruned = BloomJoin.pruneFactKeys(fact, "l_orderkey",
      dim, "o_orderkey", expectedItems = 100000L, fpp = 0.01)
    val nFact = fact.count()
    val nPruned = pruned.count()
    val nTrue = fact.join(dim.hint("broadcast"), col("l_orderkey") === col("o_orderkey"),
      "left_semi").count()
    assert(nPruned < nFact, "prune must drop some rows on a selective dim")
    // leakage = pruned rows that are NOT true matches; bounded by
    // ~fpp of the non-matching volume (generous 5x slack for the tiny
    // test scale)
    val leaked = nPruned - nTrue
    assert(leaked <= math.max(16L, (0.05 * (nFact - nTrue)).toLong),
      s"false-positive leakage $leaked too high ($nPruned pruned, $nTrue true)")
  }

  test("auto-sizing holds fpp under dim growth where a pinned capacity saturates") {
    // dim keys [0, n), fact keys [0, 20n) -> 19n true non-matchers; grow
    // the dim 10x and check the AUTO-sized filter's false-positive rate
    // stays within 2x the requested fpp at both sizes, while a filter
    // pinned at the small capacity saturates on the big dim
    val fpp = 0.01
    def leakRate(dimN: Long, expected: Option[Long]): Double = {
      val dim = spark.range(dimN).select(col("id").as("k"))
      val fact = spark.range(20L * dimN).select(col("id").as("k"))
      val pruned = expected match {
        case Some(n) => BloomJoin.pruneFactKeys(fact, "k", dim, "k", n, fpp)
        case None    => BloomJoin.pruneFactKeysAuto(fact, "k", dim, "k", fpp)
      }
      (pruned.count() - dimN).toDouble / (19L * dimN)
    }
    assert(leakRate(20000L, None) <= 2 * fpp, "auto-sized filter leaks at base size")
    assert(leakRate(200000L, None) <= 2 * fpp, "auto-sized filter leaks at 10x size")
    // sanity that the failure mode the auto path removes is real: a
    // capacity pinned 100x under the key count saturates toward fpp ~ 1
    assert(leakRate(200000L, Some(2000L)) > 0.5,
      "undersized filter should saturate (else this test proves nothing)")
  }

  test("gated q30 equals the plain join and keeps the probe in codegen") {
    val withBloom = BloomJoin.q30BloomPrejoin(spark, sf())
    val dim = Tables.orders(spark, sf())
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val plain = Tables.lineitem(spark, sf())
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("urgent_revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("l_returnflag"))
      .as[(String, Double, Long)].collect().toSeq
    assert(withBloom.as[(String, Double, Long)].collect().toSeq == plain,
      "bloom prune must be transparent under the exact join")
    // the membership probe is a codegen'd expression in the scan stage,
    // not a UDF/BNLJ
    val plan = withBloom.queryExecution.executedPlan.toString
    assert(plan.contains("bloommightcontainlong") || plan.contains("BloomMightContainLong"),
      s"bloom probe missing from plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }
}
