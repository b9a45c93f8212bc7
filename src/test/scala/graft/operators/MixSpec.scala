package graft.operators

import graft.SparkSpec

/** Data-mixing operators: epoch oversampling multiplicities and the
  * corpus-frequency quality signals. */
class MixSpec extends SparkSpec {
  import spark.implicits._

  test("epoch mix: copy counts match ⌊w⌋/⌈w⌉ and realized rates approach frac(w)") {
    val rows = TextAnalysis.txEpochMix(spark, sf("sf0.01"))
      .as[(Long, String, Long)].collect()
    val perDoc = rows.groupBy(_._1).map { case (id, rs) =>
      (id, rs.head._2, rs.map(_._3).sorted)
    }
    val weights = TextAnalysis.EPOCH_WEIGHTS.toMap
    perDoc.foreach { case (id, lang, idxs) =>
      val w = weights(lang)
      val (lo, hi) = (math.floor(w).toLong, math.ceil(w).toLong)
      assert(idxs.length == lo || idxs.length == hi,
        s"doc $id ($lang, w=$w) got ${idxs.length} copies")
      assert(idxs.toSeq == (1L to idxs.length.toLong),
        s"doc $id copy_idx not 1..n: ${idxs.mkString(",")}")
    }
    // realized mean copies per stratum ≈ its weight (hash uniformity);
    // 3/20 absolute slack covers the smallest stratum (~64 docs)
    val docsPerLang = perDoc.groupBy(_._2)
    docsPerLang.foreach { case (lang, ds) =>
      val mean = ds.map(_._3.length.toDouble).sum / ds.size
      assert(math.abs(mean - weights(lang)) < 0.15,
        s"$lang mean copies $mean vs weight ${weights(lang)}")
    }
  }

  test("token-budget mix: realized stratum tokens track share*budget; rates capped") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val tokensByLang = docs
      .groupBy($"lang").agg(sum(size(split($"text", " "))).as("toks"))
      .as[(String, Long)].collect().toMap
    val total = tokensByLang.values.sum
    val budget = total / 4
    val kept = TextAnalysis.txTokenBudgetMix(spark, sf("sf0.01"))
      .groupBy($"lang").agg(sum($"n_words").as("kept_toks"))
      .as[(String, Long)].collect().toMap
    TextAnalysis.BUDGET_SHARES.foreach { case (lang, pm) =>
      val alloc = math.min(budget * pm / 1000, tokensByLang(lang))
      val got = kept.getOrElse(lang, 0L).toDouble
      // hash sampling over ~60-220-doc strata: ±~2σ of doc-level
      // Bernoulli noise is ~±40% of small targets, so the spec asserts
      // the LAW loosely (exact bit-equivalence is the DuckDB oracle's
      // job, not this test's)
      assert(math.abs(got - alloc) <= 0.45 * alloc + 100,
        s"$lang kept $got tokens vs target $alloc")
      assert(got <= tokensByLang(lang).toDouble)
    }
    // global: the mix lands near the budget, never above total
    val keptTotal = kept.values.sum.toDouble
    assert(math.abs(keptTotal - budget) < 0.2 * budget,
      s"kept $keptTotal vs budget $budget")
  }

  test("epoch mix is deterministic across runs") {
    val a = TextAnalysis.txEpochMix(spark, sf("sf0.01")).as[(Long, String, Long)].collect()
    val b = TextAnalysis.txEpochMix(spark, sf("sf0.01")).as[(Long, String, Long)].collect()
    assert(a.sameElements(b))
  }

  test("temperature mix: quotas are exact Hamilton apportionment of sqrt weights") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val n = docs.groupBy($"source").count().as[(String, Long)].collect().toMap
    val budget = n.values.sum / 4
    // independent Hamilton apportionment over floor(sqrt(n)) weights
    val wt = n.map { case (s, c) => s -> math.floor(math.sqrt(c.toDouble)).toLong }
    val wsum = wt.values.sum
    val base = wt.map { case (s, w) => s -> budget * w / wsum }
    val leftover = budget - base.values.sum
    val extras = wt.toSeq
      .map { case (s, w) => (s, budget * w % wsum) }
      .sortBy { case (s, rem) => (-rem, s) }
      .take(leftover.toInt).map(_._1).toSet
    val quota = base.map { case (s, b) => s -> (b + (if (extras(s)) 1L else 0L)) }

    val got = TextAnalysis.txTemperatureMix(spark, sf("sf0.01"))
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(got.values.sum == budget, s"selected ${got.values.sum} vs budget $budget")
    quota.foreach { case (s, q) =>
      assert(got.getOrElse(s, 0L) == q, s"stratum $s got ${got.get(s)} vs quota $q")
    }
  }

  test("temperature mix: skewed corpus — tail boosted, head shrunk toward uniform") {
    import org.apache.spark.sql.functions._
    // 900/100 split: sqrt weights 30/10 → sample shares 75%/25% vs
    // corpus 90%/10% — granularity can't mask the pull toward uniform
    val docs = (1 to 1000).map(i =>
      (i.toLong, if (i <= 900) "head" else "tail")).toDF("doc_id", "stratum")
    val got = TextAnalysis.temperatureMix(docs, $"stratum")
      .groupBy($"stratum").count().as[(String, Long)].collect().toMap
    val budget = 250.0
    assert(got.values.sum == 250L)
    assert(got("tail") / budget > 0.1, s"tail share ${got("tail") / budget}")
    assert(got("head") / budget < 0.9, s"head share ${got("head") / budget}")
    // and the exact sqrt law: 250·30/40 = 187(+r), 250·10/40 = 62(+r)
    assert(got("head") == 187L || got("head") == 188L)
  }

  test("word freq: hand corpus — rare fraction and average corpus count") {
    // corpus counts: a=4, b=1, c=2; both b and c are rare (< 3)
    val docs = Seq(
      (1L, "a a b"),
      (2L, "a a c c")).toDF("doc_id", "text")
    val got = TextAnalysis.wordFreq(docs)
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      1L -> (9.0 / 3, 1.0 / 3),   // [4,4,1]; one rare occurrence
      2L -> (12.0 / 4, 2.0 / 4))) // [4,4,2,2]; two rare occurrences
  }
}
