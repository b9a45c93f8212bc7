package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Per-group quota via the bounded-heap [[graft.functions.TopKPairAgg]]
  * — indistinguishable from the window formulation, without the
  * per-group sort. */
class QuotaSpec extends SparkSpec {
  import spark.implicits._

  test("groupTopK equals the window form, under forced partial merges") {
    val docs = Tables.documents(spark, sf()).repartition(7) // force merge()
    val got = TextAnalysis.groupTopK(docs, "source",
        TextAnalysis.quality, col("doc_id"), TextAnalysis.DomainCap)
      .select($"source", $"rank_in_group", $"doc_id")
      .as[(String, Int, Long)].collect().toSet
    val w = Window.partitionBy($"source")
      .orderBy(TextAnalysis.quality.desc, $"doc_id")
    val expect = Tables.documents(spark, sf())
      .withColumn("rank_in_group", row_number().over(w))
      .filter($"rank_in_group" <= TextAnalysis.DomainCap)
      .select($"source", $"rank_in_group".cast("int"), $"doc_id")
      .as[(String, Int, Long)].collect().toSet
    assert(got == expect, "bounded-heap quota must equal the window form")
  }

  test("score ties break to the smallest id, k > group size keeps all") {
    val rows = Seq( // group a: all scores tie; group b: 2 rows, k is 3
      ("a", 1.0, 30L), ("a", 1.0, 10L), ("a", 1.0, 20L), ("a", 1.0, 40L),
      ("b", 0.5, 2L), ("b", 0.7, 1L)
    ).toDF("g", "s", "id")
    val got = TextAnalysis.groupTopK(rows, "g", $"s", $"id", 3)
      .select($"g", $"rank_in_group", $"doc_id")
      .as[(String, Int, Long)].collect().sorted.toSeq
    assert(got == Seq(("a", 1, 10L), ("a", 2, 20L), ("a", 3, 30L),
      ("b", 1, 1L), ("b", 2, 2L)))
  }

  test("null scores and ids are ignored, not admitted as zeros") {
    val rows = Seq[(String, Option[Double], Option[Long])](
      ("a", Some(0.9), Some(1L)), ("a", None, Some(2L)),
      ("a", Some(0.8), None), ("a", Some(0.1), Some(3L))
    ).toDF("g", "s", "id")
    val got = TextAnalysis.groupTopK(rows, "g", $"s", $"id", 2)
      .select($"rank_in_group", $"doc_id").as[(Int, Long)].collect().sorted.toSeq
    assert(got == Seq((1, 1L), (2, 3L)))
  }

  test("NaN scores are never admitted — they would outrank every real score") {
    // java.lang.Double total order puts NaN LARGEST: unguarded, the 0/0
    // quality of an empty text would occupy top slots. Pinned: skipped.
    val rows = Seq(("a", Double.NaN, 1L), ("a", 0.9, 2L), ("a", 0.1, 3L))
      .toDF("g", "s", "id")
    val got = TextAnalysis.groupTopK(rows, "g", $"s", $"id", 2)
      .select($"rank_in_group", $"doc_id").as[(Int, Long)].collect().sorted.toSeq
    assert(got == Seq((1, 2L), (2, 3L)), s"NaN must be skipped, got $got")
    // all-NaN group: no rows survive (not an empty-array crash)
    val allNaN = Seq(("b", Double.NaN, 1L)).toDF("g", "s", "id")
    assert(TextAnalysis.groupTopK(allNaN, "g", $"s", $"id", 2).count() == 0)
  }

  test("mistyped aggregate children fail at analysis, not in an executor") {
    import graft.functions.{MinKAgg, TopKPairAgg}
    val rows = Seq((1, 0.5f, 2)).toDF("i", "f", "j")
    // Int child where BIGINT is required -> AnalysisException up front
    intercept[org.apache.spark.sql.AnalysisException] {
      rows.groupBy().agg(MinKAgg.minK($"i", 3)).collect()
    }
    // (Float score, Int id) where (DOUBLE, BIGINT) is required
    intercept[org.apache.spark.sql.AnalysisException] {
      rows.groupBy().agg(TopKPairAgg.topK($"f", $"j", 3)).collect()
    }
    // correctly-typed forms still pass analysis and run
    assert(rows.groupBy().agg(MinKAgg.minK($"i".cast("long"), 3)).count() == 1)
    assert(rows.groupBy()
      .agg(TopKPairAgg.topK($"f".cast("double"), $"j".cast("long"), 3))
      .count() == 1)
  }

  test("quota plan: bounded aggregate, no window over the corpus") {
    val plan = TextAnalysis.txDomainCap(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"the quota must never window-sort a domain:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"expected the TypedImperativeAggregate path:\n$plan")
  }

  test("gated query: every domain at most DomainCap, ranks dense from 1") {
    val got = TextAnalysis.txDomainCap(spark, sf())
      .select($"source", $"rank_in_domain").as[(String, Int)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq)
    got.foreach { case (src, ranks) =>
      assert(ranks.size <= TextAnalysis.DomainCap, s"$src over cap")
      assert(ranks == (1 to ranks.size), s"$src ranks not dense: $ranks")
    }
  }
}
