package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Persisted inverted index — the build-once/probe-many posture for
  * lexical search, the [[AnnIndex]] twin on the text side.
  *
  * [[Search.txBm25TopK]] re-explodes the whole corpus per query, which
  * is the right one-shot shape but not a production search index that
  * serves thousands of queries between corpus refreshes. This operator
  * pays the tokenize-explode-aggregate pass ONCE:
  *
  *   - `<name>_postings` (term, doc_id, tf) — bucketed + per-file
  *     sorted by `term`, so (a) a query probe's `term IN (...)` filter
  *     is PUSHED to the parquet scan (only matching row groups read —
  *     at 100 TB the probe touches the queried terms' postings, not the
  *     corpus) and (b) any term-keyed join (df stats, stoplists, another
  *     index) plans Exchange-free off the bucketed scan.
  *   - `<name>_lens` (doc_id, n_words) — the narrow length relation
  *     BM25's normalization needs, written once alongside.
  *
  * The probe's own doc-side aggregation still shuffles — but only the
  * matched postings (query-term df rows, not corpus rows). Honest cost
  * at 100 TB: probe ∝ Σ df(query terms), build ∝ corpus.
  *
  * Probe output is bit-identical to the in-query operator at the same
  * terms (asserted in SearchIndexSpec), so an index refresh can be
  * validated against the from-scratch path query-for-query. */
object SearchIndex {

  /** Tokenize + aggregate `docs` (doc_id, text) and persist the
    * postings/lengths pair under `basePath`; returns (postings, lens)
    * catalog-backed relations. */
  def buildIndex(spark: SparkSession, docs: DataFrame, name: String,
                 basePath: String, buckets: Int = 32): (DataFrame, DataFrame) = {
    val td = docs
      .select(col("doc_id"),
        explode(graft.functions.Portable.words(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    Bucketing.writeBucketed(td, s"${name}_postings", "term", buckets,
      Some(s"$basePath/${name}_postings"))
    val lens = docs.select(col("doc_id"),
      size(graft.functions.Portable.words(col("text"))).as("n_words"))
    lens.write.mode("overwrite").parquet(s"$basePath/${name}_lens")
    (spark.table(s"${name}_postings"),
      spark.read.parquet(s"$basePath/${name}_lens"))
  }

  /** BM25 top-k off the persisted index — same scoring shape and
    * integer-only output contract as [[Search.txBm25TopK]], minus the
    * corpus explode: the postings scan reads only `terms`' rows. */
  def bm25TopKFromIndex(postings: DataFrame, lens: DataFrame,
      terms: Seq[String], topN: Int = Search.SearchTopN): DataFrame = {
    require(terms.nonEmpty, "empty query")
    // persisted: the filtered postings feed the df collect AND the
    // per-doc tf aggregate (tiny: Σ df(query terms) rows)
    val qtd = graft.Caches.persist(postings.filter(col("term").isin(terms: _*)))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      coalesce(sum(when(col("term") === t, col("tf"))), lit(0L)).as(s"tf_$i") }
    val tfs = qtd.groupBy(col("doc_id")).agg(tfCols.head, tfCols.tail: _*)
    val stats = lens.agg(count(lit(1)).as("n_docs"),
      avg(col("n_words")).as("avg_len")).head()
    val (nDocs, avgLen) = (stats.getLong(0), stats.getDouble(1))
    val dfByTerm = qtd.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val score = terms.zipWithIndex
      .map { case (t, i) =>
        Search.bm25Contrib(col(s"tf_$i"), nDocs, dfByTerm.getOrElse(t, 0L), avgLen) }
      .reduce(_ + _)
    val ranked = tfs
      .join(lens, "doc_id")
      .withColumn("score", score)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topN)
    ranked
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id"))))
      .select(Seq(col("rank"), col("doc_id"), col("n_words")) ++
        terms.indices.map(i => col(s"tf_$i")): _*)
      .orderBy(col("rank"))
  }
}
