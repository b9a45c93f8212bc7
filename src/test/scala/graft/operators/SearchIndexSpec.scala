package graft.operators

import graft.SparkSpec
import graft.sources.Tables

class SearchIndexSpec extends SparkSpec {
  import spark.implicits._

  private def withIndex[A](f: (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame) => A): A = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_searchidx").toFile
    try {
      val (postings, lens) = SearchIndex.buildIndex(spark,
        Tables.documents(spark, sf()).select($"doc_id", $"text"),
        "sidx", tmp.getAbsolutePath, buckets = 8)
      f(postings, lens)
    } finally {
      graft.Caches.releaseAll()
      spark.sql("DROP TABLE IF EXISTS sidx_postings")
      org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    }
  }

  test("index probe is bit-identical to the from-scratch BM25 query") {
    withIndex { (postings, lens) =>
      val fromIndex = SearchIndex
        .bm25TopKFromIndex(postings, lens, Search.QueryTerms)
        .collect().map(_.toSeq)
      val fromScratch = Search.txBm25TopK(spark, sf())
        .collect().map(_.toSeq)
      assert(fromIndex.toSeq == fromScratch.toSeq)
    }
  }

  test("probe plan: term filter pushed to the postings scan, no corpus explode") {
    withIndex { (postings, lens) =>
      val plan = SearchIndex.bm25TopKFromIndex(postings, lens, Search.QueryTerms)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [In(term"),
        s"term filter must reach the parquet scan:\n$plan")
      assert(!plan.contains("Generate"),
        "the probe must not re-explode the corpus")
    }
  }

  test("term-keyed join off the index plans Exchange-free on the index side") {
    withIndex { (postings, _) =>
      val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        // df-stats join keyed on term: both sides derive from the SAME
        // bucketed table, so the sort-merge join needs no full shuffle
        // of the postings; only the tiny aggregate side exchanges
        val dfStats = postings.groupBy($"term")
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("df"))
        val joined = postings.join(dfStats, "term")
        val plan = joined.queryExecution.executedPlan.toString
        // the raw postings side must read straight off the bucketed scan:
        // no Exchange between its FileScan and the join
        val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
        assert(exchanges <= 1,
          s"expected at most the aggregate-side exchange, got $exchanges:\n$plan")
        assert(joined.count() > 0)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
    }
  }
}
