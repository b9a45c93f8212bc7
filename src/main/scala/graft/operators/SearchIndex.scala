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
    val td = Search.termDocs(docs)
    Bucketing.writeBucketed(td, s"${name}_postings", "term", buckets,
      Some(s"$basePath/${name}_postings"))
    val lens = docs.select(col("doc_id"),
      size(graft.functions.Portable.words(col("text"))).as("n_words"))
    lens.write.mode("overwrite").parquet(s"$basePath/${name}_lens")
    (spark.table(s"${name}_postings"),
      spark.read.parquet(s"$basePath/${name}_lens"))
  }

  private lazy val scratch: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_search_gate_")
    sys.addShutdownHook(org.apache.commons.io.FileUtils.deleteQuietly(d.toFile))
    d.toString
  }

  /** Gated query: BM25 THROUGH the persisted postings — build (eager,
    * overwrite) then probe. Oracle = `tx_bm25_topk`'s SQL: the hash
    * compare proves the index probe bit-identical to the from-scratch
    * ranking through DuckDB itself, not just the SearchIndexSpec
    * assertion. */
  def txBm25FromIndex(spark: SparkSession, dir: String): DataFrame = {
    val (postings, lens) = buildIndex(spark,
      graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text")),
      "graft_gate_search_idx", scratch)
    bm25TopKFromIndex(postings, lens, Search.QueryTerms)
  }

  /** BM25 top-k off the persisted index — same scoring shape and
    * integer-only output contract as [[Search.txBm25TopK]], minus the
    * corpus explode: the postings scan reads only `terms`' rows. */
  def bm25TopKFromIndex(postings: DataFrame, lens: DataFrame,
      terms: Seq[String], topN: Int = Search.SearchTopN): DataFrame = {
    // persisted: the filtered postings feed the df collect AND the
    // per-doc tf aggregate (tiny: Σ df(query terms) rows); the scoring
    // tail is Search.bm25Rank — ONE definition, so the probe can never
    // diverge from the gated from-scratch query
    val qtd = graft.Caches.persist(postings.filter(col("term").isin(terms: _*)))
    Search.bm25Rank(qtd, lens, terms, topN)
  }

  // ------------------------------------------------------------- erasure

  /** Tombstone root — a sibling of the index artifacts, shared by BOTH
    * of them (postings and lens must forget a doc in the same logical
    * instant; one tombstone set covers both, exactly the streaming
    * stores' shared-set discipline). */
  private def deleteRoot(basePath: String, name: String): String =
    s"$basePath/${name}_deletes"

  /** Register a right-to-be-forgotten delete against the persisted
    * search index — the retract half the build-once artifacts never
    * had. Two-phase: serving through [[postingsExcludingDeletes]] /
    * [[lensExcludingDeletes]] hides the docs immediately (term
    * frequencies, df, AND the length normalization all shift — BM25's
    * corpus statistics derive from the postings at probe time, so the
    * mask is statistically complete, not cosmetic); [[vacuumDeletes]]
    * then removes the bytes and retires the tombstones. */
  def deleteDocs(spark: SparkSession, name: String, basePath: String,
                 ids: DataFrame): Long =
    graft.streaming.StreamingPipeline.writeTombstones(
      spark, deleteRoot(basePath, name), ids)

  private def excludingDeletes(spark: SparkSession, df: DataFrame,
                               basePath: String, name: String): DataFrame = {
    val tomb = graft.streaming.StreamingPipeline
      .storeTombstones(spark, deleteRoot(basePath, name))
      .select(col("tomb_id").as("__deleted_id"))
    df.join(broadcast(tomb), df("doc_id") === tomb("__deleted_id"),
      "left_anti")
  }

  /** The postings relation minus tombstoned docs — the serving read
    * between a [[deleteDocs]] and its [[vacuumDeletes]]. The anti-join
    * broadcasts the delete-sized tombstones, so the bucketed postings
    * scan keeps its distribution. */
  def postingsExcludingDeletes(spark: SparkSession, name: String,
                               basePath: String): DataFrame =
    excludingDeletes(spark, spark.table(s"${name}_postings"), basePath, name)

  /** The lengths relation minus tombstoned docs. */
  def lensExcludingDeletes(spark: SparkSession, name: String,
                           basePath: String): DataFrame =
    excludingDeletes(spark,
      spark.read.parquet(s"$basePath/${name}_lens"), basePath, name)

  /** Physically rebuild BOTH index artifacts without the tombstoned
    * docs, then retire the tombstones — postings last ... lens first so
    * a crash between the two leaves the tombstones live and serving
    * still masked (retirement is last, the composed-erasure ordering).
    * Run quiesced; the artifacts are derived state, rebuildable from
    * the document corpus on any unrecoverable failure. */
  def vacuumDeletes(spark: SparkSession, name: String, basePath: String,
                    buckets: Int = 32): Unit =
   // single-writer lease, anchored at the sibling delete root (the two
   // artifact rewrites below overwrite their own dirs): two racing
   // vacuums would interleave the lens/postings rebuilds
   graft.streaming.MaintenanceLease.withLease(spark,
       deleteRoot(basePath, name)) {
    val keptLens = lensExcludingDeletes(spark, name, basePath)
      .localCheckpoint(true)
    try keptLens.write.mode("overwrite").parquet(s"$basePath/${name}_lens")
    finally graft.Caches.freeCheckpoint(keptLens)
    val keptPostings = postingsExcludingDeletes(spark, name, basePath)
      .localCheckpoint(true)
    try Bucketing.writeBucketed(keptPostings, s"${name}_postings", "term",
      buckets, Some(s"$basePath/${name}_postings"))
    finally graft.Caches.freeCheckpoint(keptPostings)
    graft.streaming.StreamingPipeline.retireTombstones(
      spark, deleteRoot(basePath, name), Long.MaxValue)
   }

  /** The doc slice erased by [[txBm25FromIndexDelete]] — one SQL
    * predicate shared verbatim by the gate and its oracle. */
  val IndexDeleteSliceSql = "(doc_id % 7) = 3"

  /** Gated query: BM25 through the persisted postings POST-ERASURE —
    * build on the full corpus, [[deleteDocs]] a slice, probe MASKED
    * (both artifacts' excluding reads), then [[vacuumDeletes]] and
    * probe the plain rebuilt index; the gate requires the two probes
    * bit-equal (mask ≡ physical) and returns the post-vacuum one,
    * hash-gated against the from-scratch BM25 chain recomputed on the
    * survivors ([[Search.txBm25TopKExcludingSql]]) — df, N, and avg_len
    * must all shift to the surviving corpus, or the ranking mismatches. */
  def txBm25FromIndexDelete(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val name = "graft_gate_search_del_idx"
    buildIndex(spark, docs, name, scratch)
    deleteDocs(spark, name, scratch,
      docs.filter(expr(IndexDeleteSliceSql)).select(col("doc_id")))
    val masked = bm25TopKFromIndex(
      postingsExcludingDeletes(spark, name, scratch),
      lensExcludingDeletes(spark, name, scratch),
      Search.QueryTerms).collect().toSeq
    vacuumDeletes(spark, name, scratch)
    val served = bm25TopKFromIndex(spark.table(s"${name}_postings"),
      spark.read.parquet(s"$scratch/${name}_lens"), Search.QueryTerms)
    require(served.collect().toSeq == masked,
      "masked and post-vacuum probes must be bit-equal")
    served
  }
}
