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

  test("epoch mix is deterministic across runs") {
    val a = TextAnalysis.txEpochMix(spark, sf("sf0.01")).as[(Long, String, Long)].collect()
    val b = TextAnalysis.txEpochMix(spark, sf("sf0.01")).as[(Long, String, Long)].collect()
    assert(a.sameElements(b))
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
