package graft.operators

import graft.SparkSpec
import graft.sources.Tables

class SearchSpec extends SparkSpec {
  import spark.implicits._

  // raw space-split (the engine's n_words length law); empty tokens are
  // dropped only where the engine drops them (the token relation)
  private lazy val corpus: Array[(Long, Array[String])] =
    Tables.documents(spark, sf()).select($"doc_id", $"text")
      .as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ", -1) }

  test("inverted index: df/tf totals exact, postings capped, ascending, prefix") {
    val got = Search.txInvertedIndex(spark, sf())
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // independent recomputation from the raw corpus
    val expect = corpus.flatMap { case (id, ws) =>
        ws.filter(_.nonEmpty).map(_ -> id) }
      .groupBy(_._1).map { case (term, occ) =>
        val byDoc = occ.groupBy(_._2).view.mapValues(_.length)
        term -> (byDoc.size.toLong, occ.length.toLong,
          byDoc.keys.toSeq.sorted.take(Search.PostingsCap).mkString(","))
      }
    assert(got.keySet == expect.keySet, "vocabulary drift")
    expect.foreach { case (term, e) =>
      assert(got(term) == e, s"index row for term '$term'") }
    got.values.foreach { case (_, _, docs) =>
      assert(docs.split(",").length <= Search.PostingsCap) }
  }

  test("BM25 top-k: ranking matches an independent Scala recomputation") {
    val got = Search.txBm25TopK(spark, sf())
      .select($"rank", $"doc_id").as[(Int, Long)].collect()
    graft.Caches.releaseAll()
    // reference BM25 over the collected corpus
    val n = corpus.length.toLong
    val avgLen = corpus.map(_._2.length.toLong).sum.toDouble / n
    val df = Search.QueryTerms.map(t =>
      t -> corpus.count(_._2.contains(t)).toLong).toMap
    val scored = corpus.map { case (id, ws) =>
      val len = ws.length
      val score = Search.QueryTerms.map { t =>
        val tf = ws.count(_ == t).toDouble
        val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
        idf * (tf * (Search.K1 + 1.0)) /
          (tf + Search.K1 * (1.0 - Search.B + Search.B * len / avgLen))
      }.sum
      (id, score)
    }
    val expectIds = scored.sortBy { case (id, s) => (-s, id) }
      .take(Search.SearchTopN).map(_._1).toSeq
    assert(got.map(_._2).toSeq == expectIds, "top-k ordering drift")
    assert(got.map(_._1).toSeq == (1 to Search.SearchTopN), "ranks not dense")
    // the rare high-idf term dominates: every top doc must contain it,
    // as long as at least TopN docs do (true for the synthetic corpus)
    val rare = Search.QueryTerms.head
    if (corpus.count(_._2.contains(rare)) >= Search.SearchTopN)
      assert(expectIds.forall(id => corpus.find(_._1 == id).get._2.contains(rare)),
        s"top docs should all contain the rare term '$rare'")
  }

  test("inverted-index plan: bounded min-k aggregate, no per-term window sort") {
    val plan = Search.txInvertedIndex(spark, sf()).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "posting sample must come from the mergeable min-k aggregate, not a window")
    assert(plan.contains("minkagg") || plan.toLowerCase.contains("minkagg"),
      s"expected the MinKAgg kernel in the plan:\n$plan")
  }

  test("BM25 plan: top-k via TakeOrderedAndProject, no corpus-wide window") {
    val plan = Search.txBm25TopK(spark, sf()).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), "top-k must not global-sort")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "stats must fold in as literals, not a stats join")
  }

  test("hybrid RRF equals a Scala fusion of the two legs' own outputs") {
    import graft.functions.Portable
    import org.apache.spark.sql.functions.{broadcast, col, size}
    // lexical leg at fusion depth, through the operator's own ranker
    val docs = Tables.documents(spark, sf())
    val lens = graft.Caches.persist(docs.select(col("doc_id"),
      size(Portable.words(col("text"))).as("n_words")))
    val qtd = graft.Caches.persist(Search.termDocs(docs)
      .filter(col("term").isin(Search.QueryTerms: _*)))
    val lex = Search.bm25Rank(qtd, lens, Search.QueryTerms, Search.HybridDepth)
      .select($"doc_id", $"rank").as[(Long, Int)].collect().toMap
    // dense leg recomputed independently (driver-side exact cosine)
    val vecs = Tables.embeddings(spark, sf())
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val qe = vecs.find(_._1 == Search.HybridQueryVec).get._2
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val den = vecs.filter(_._1 != Search.HybridQueryVec)
      .map { case (id, v) => (id, cos(v, qe)) }
      .sortBy { case (id, c) => (-c, id) }.take(Search.HybridDepth)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    // expected fusion: integer-ppm RRF over the union of both lists
    def ppm(r: Option[Int]): Long =
      r.map(rk => 1000000L / (Search.RrfK + rk)).getOrElse(0L)
    val expect = (lex.keySet ++ den.keySet).toSeq
      .map(id => (id, ppm(lex.get(id)) + ppm(den.get(id))))
      .sortBy { case (id, s) => (-s, id) }.take(Search.HybridTopN)
      .zipWithIndex
      .map { case ((id, s), i) =>
        (i + 1, id, s, lex.getOrElse(id, 0), den.getOrElse(id, 0)) }
    val got = Search.txHybridRrf(spark, sf())
      .as[(Int, Long, Long, Int, Int)].collect().toSeq
    assert(got == expect, s"fusion drift:\ngot    $got\nexpect $expect")
    // and the fusion is genuinely hybrid here: both legs contribute
    assert(got.exists { case (_, id, _, l, d) => l > 0 && d == 0 } ||
      got.exists { case (_, id, _, l, d) => l > 0 && d > 0 })
    assert(got.exists { case (_, id, _, l, d) => d > 0 })
  }
}
