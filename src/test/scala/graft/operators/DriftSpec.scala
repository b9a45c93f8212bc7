package graft.operators

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def drift(a: Seq[Option[String]], b: Seq[Option[String]])
      : Map[String, (Long, Long, Long, Long, Long)] =
    Profiling.categoryDrift(a.toDF("k"), b.toDF("k"), "k")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6)).toMap

  test("shares are exact integer ppm and TVD halves the L1 delta") {
    val got = drift(
      a = Seq(Some("x"), Some("x"), Some("x"), Some("y")),
      b = Seq(Some("x"), Some("y"), Some("y"), Some("y")))
    // a: x 750000, y 250000; b: x 250000, y 750000; deltas 500000 each
    assert(got("x") == (3L, 1L, 750000L, 250000L, 500000L))
    assert(got("y") == (1L, 3L, 250000L, 750000L, 500000L))
    assert(got("__tvd__") == (4L, 4L, 1000000L, 1000000L, 500000L))
  }

  test("categories unique to one slice read as full drift mass") {
    val got = drift(
      a = Seq(Some("only-a"), Some("both")),
      b = Seq(Some("both"), Some("only-b")))
    assert(got("only-a") == (1L, 0L, 500000L, 0L, 500000L))
    assert(got("only-b") == (0L, 1L, 0L, 500000L, 500000L))
    assert(got("__tvd__")._5 == 500000L)
  }

  test("a NULL category is one category, not a dropped row") {
    val got = drift(
      a = Seq(None, Some("x")),
      b = Seq(None, None, Some("x"), Some("x")))
    assert(got(null) == (1L, 2L, 500000L, 500000L, 0L))
    assert(got("__tvd__")._5 == 0L)
  }

  test("an empty slice reads as the all-zero distribution, not NULL rows") {
    // degenerate input the engines disagree on when unguarded (Spark
    // div -> NULL, DuckDB // -> error): pinned as shares 0 for the
    // empty side, TVD = half the other side's full mass
    val got = drift(a = Seq(Some("x"), Some("x"), Some("y")), b = Seq.empty)
    assert(got("x") == (2L, 0L, 666666L, 0L, 666666L))
    assert(got("y") == (1L, 0L, 333333L, 0L, 333333L))
    assert(got("__tvd__") == (3L, 0L, 1000000L, 1000000L, 499999L))
    // both empty: no category rows at all, TVD row reports 0 drift
    val both = drift(Seq.empty, Seq.empty)
    assert(both.keySet == Set("__tvd__"))
    assert(both("__tvd__")._5 == 0L)
  }

  test("corpus card: metrics consistent with each other and the dedup keep-set") {
    val card = Profiling.profCorpusCard(spark, sf())
      .as[(String, Long)].collect().toMap
    assert(card("n_docs") > 0)
    assert(card("total_tokens") <= card("total_words") * 4,
      "alnum runs per word should be bounded")
    assert(card("n_docs_ge20_words") <= card("n_docs"))
    assert(card.keys.count(_.startsWith("docs_lang_")) == card("n_langs"))
    assert(card.filter(_._1.startsWith("docs_lang_")).values.sum == card("n_docs"))
    // dup count against an independent recomputation of the canonical
    // content identity (ddExact gates the AUGMENTED corpus, so its keep
    // count is not directly comparable)
    val texts = graft.sources.Tables.documents(spark, sf())
      .select($"text").as[String].collect()
      .map(_.toLowerCase.replaceAll("\\s+", " "))
    assert(card("n_exact_dup_docs") == texts.length - texts.distinct.length)
  }

  test("identical slices yield zero TVD; gated report covers all event types") {
    val e = Seq(Some("p"), Some("q"), Some("q"))
    assert(drift(e, e)("__tvd__")._5 == 0L)
    val gated = Profiling.profDriftReport(spark, sf())
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val cats = gated.map(_._1).toSet
    assert(cats == Set("click", "error", "purchase", "signup", "view", "__tvd__"))
    val tvd = gated.find(_._1 == "__tvd__").get
    // both halves non-empty and masses conserved
    assert(tvd._2 > 0 && tvd._3 > 0)
    assert(gated.filter(_._1 != "__tvd__").map(_._2).sum == tvd._2)
    assert(gated.filter(_._1 != "__tvd__").map(_._3).sum == tvd._3)
  }
}
