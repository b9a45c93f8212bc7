package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.sources.Tables

/** Lexical search over the documents table: inverted-index build and
  * BM25 ranked retrieval — the retrieval half of a training-data
  * pipeline (dedup mining, contamination lookups, corpus QA all start
  * from "find the documents containing/scoring highest for X").
  *
  * Scale shape:
  *   - The index build is one explode → two map-side-combined
  *     aggregations keyed by term. The posting LIST is capped at
  *     [[PostingsCap]] ids per term — an uncapped `collect_list` over a
  *     stopword's posting would materialize a corpus-sized array in one
  *     aggregation buffer at 100 TB. df/tf totals stay exact over ALL
  *     occurrences; only the sample list is capped. Hot-term skew is
  *     the [[HeavyHitters]] report's job to surface (and a stoplist
  *     derived from it is the standard fix).
  *   - BM25 scoring never materializes a dense doc×term matrix: the
  *     exploded token relation is filtered to the query's terms FIRST
  *     (predicate on the scan), conditional-aggregated per doc to one
  *     row of per-term tfs, and the global stats (N, avg length, per
  *     -term df) ride in on a broadcast of two single-row aggregates.
  *     Top-k is orderBy+limit — `TakeOrderedAndProject`, per-partition
  *     heaps, no global sort.
  *
  * Determinism: BM25 needs `ln`, which is NOT bit-stable across engines
  * (unlike `sqrt`, libm's log is only near-correctly-rounded — see
  * [[Portable]]'s no-transcendentals rule). The gated output therefore
  * carries ONLY integer columns (rank, doc_id, lengths, tfs): a rank
  * flip between engines would need two docs whose exact rational scores
  * differ by < 1 ulp yet are unequal — impossible with small-integer
  * tf/df/len inputs whose distinct score gaps are ≥ ~1e-9 — and exact
  * rational TIES are broken by doc_id on both sides. The float score
  * itself is asserted against an independent Scala recomputation in
  * SearchSpec instead.
  *
  * Summation-order note: per-doc scores add a FIXED left-to-right chain
  * of per-term contributions (tf conditional-aggregated to columns
  * first), never a float `sum()` over rows whose partial order Spark
  * does not define. The only float aggregate feeding the score is
  * `avg(n_words)` — exact because integer-valued doubles add exactly
  * below 2^53 tokens (~9e15; a 100 TB corpus holds ~2e13).
  *
  * Reference scope note: no search surface in the reference engine
  * (`/root/reference/src/main/scala/com/pipeline/PipelineProcessor.scala`
  * is scan/validate/sink); extension pack alongside [[TextAnalysis]]. */
object Search {

  /** Posting-list sample cap per term in the gated index. */
  val PostingsCap = 10

  /** BM25 constants (the standard Robertson defaults). */
  val K1 = 1.2
  val B = 0.75

  /** Fixed gated query: one rare term ("dup", df≈5% — high idf) plus
    * two common ones, exercising the idf spread. */
  val QueryTerms: Seq[String] = Seq("dup", "vector", "join")

  val SearchTopN = 10

  /** (term, doc_id, tf) — the exploded, per-doc aggregated token
    * relation both the in-query operators and [[SearchIndex.buildIndex]]
    * start from (ONE definition of tokenization — a drift would break
    * the index-probe ≡ from-scratch bit-identity SearchIndexSpec
    * asserts). Empty tokens (split artifacts of empty text) are
    * dropped. */
  def termDocs(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(Portable.words(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

  private def termDocs(spark: SparkSession, dir: String): DataFrame =
    termDocs(Tables.documents(spark, dir))

  /** Inverted index: per term, exact document frequency and total
    * occurrence count, plus the first [[PostingsCap]] doc ids (ascending)
    * as a csv sample of the posting list. The sample comes from the
    * bounded-state [[graft.functions.MinKAgg]] kernel — O(k) aggregation
    * state per term with map-side partial merge, so a hot term's full
    * posting never funnels through one task (the `row_number` window
    * formulation this replaced sorted each term's ENTIRE posting in a
    * single window partition — exactly the hot-reducer the cap exists
    * to avoid). */
  def txInvertedIndex(spark: SparkSession, dir: String): DataFrame =
    termDocs(Tables.documents(spark, dir))
      .groupBy(col("term"))
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("tf_total"),
        concat_ws(",",
          graft.functions.MinKAgg.minK(col("doc_id"), PostingsCap))
          .as("top_docs"))
      .orderBy(col("term"))

  val txInvertedIndexSql: String = s"""
    WITH tok AS (
      SELECT doc_id, unnest(${Portable.wordsSql("text")}) AS term FROM documents),
    td AS (
      SELECT term, doc_id, COUNT(*) AS tf FROM tok
      WHERE term <> '' GROUP BY term, doc_id)
    SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS tf_total,
           array_to_string(list_slice(list(doc_id ORDER BY doc_id),
             1, $PostingsCap), ',') AS top_docs
    FROM td GROUP BY term ORDER BY term"""

  /** BM25 score column for one term's tf column, in a FIXED arithmetic
    * shape shared with the SQL oracle and the SearchSpec recomputation:
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5)) (Lucene's non-negative
    * form), tf saturation with [[K1]]/[[B]] length normalization. */
  private[operators] def bm25Contrib(tf: org.apache.spark.sql.Column, nDocs: Long,
      df: Long, avgLen: Double): org.apache.spark.sql.Column = {
    val idf = math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
    val denom = tf.cast("double") +
      lit(K1) * (lit(1.0) - lit(B) + lit(B) * col("n_words") / lit(avgLen))
    lit(idf) * (tf.cast("double") * lit(K1 + 1.0)) / denom
  }

  /** BM25 top-[[SearchTopN]] for [[QueryTerms]]. Output is integer-only
    * (see object doc); per-term tfs ride along for inspectability.
    *
    * The four global stats (N, avg length, per-term dfs) are pulled to
    * the driver as SCALARS from two tiny aggregates — the same
    * driver/executor split as the k-means objective — and fold into the
    * scoring expression as literals, keeping the corpus-side plan free
    * of even a broadcast nested-loop stats join. */
  def txBm25TopK(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // persisted: lens feeds the stats scalar AND the ranked join; qtd
    // feeds the df collect AND the per-doc tf aggregate — unpersisted,
    // each consumer would re-tokenize the corpus (3× redundant passes)
    val lens = graft.Caches.persist(docs.select(col("doc_id"),
      size(Portable.words(col("text"))).as("n_words")))
    val qtd = graft.Caches.persist(
      termDocs(docs).filter(col("term").isin(QueryTerms: _*)))
    bm25Rank(qtd, lens, QueryTerms, SearchTopN)
  }

  /** THE BM25 ranking tail — shared by the in-query operator and
    * [[SearchIndex.bm25TopKFromIndex]], so a scoring change can never
    * diverge the gated query from the index probe. `qtd` must already
    * be filtered to `terms` (and persisted by the caller — it is read
    * twice: df collect + tf aggregate); `lens` is (doc_id, n_words). */
  private[operators] def bm25Rank(qtd: DataFrame, lens: DataFrame,
      terms: Seq[String], topN: Int): DataFrame = {
    require(terms.nonEmpty, "empty query")
    // one row per matched doc: tf per query term as fixed columns
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
        bm25Contrib(col(s"tf_$i"), nDocs, dfByTerm.getOrElse(t, 0L), avgLen) }
      .reduce(_ + _) // fixed left-to-right chain, no row-order dependence
    val ranked = tfs
      .join(lens, "doc_id")
      .withColumn("score", score)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topN)
    // rank over the already-limited topN rows — a 10-row window, not a
    // corpus-wide one. Portable.onePartition, not lit(0): Spark 4's
    // EliminateWindowPartitions strips foldable keys, resurrecting
    // WindowExec's no-partition warning (PlanSpec pins the sweep).
    ranked
      .withColumn("rank", row_number().over(
        Window.partitionBy(Portable.onePartition(col("doc_id")))
          .orderBy(col("score").desc, col("doc_id"))))
      .select(Seq(col("rank"), col("doc_id"), col("n_words")) ++
        terms.indices.map(i => col(s"tf_$i")): _*)
      .orderBy(col("rank"))
  }

  /** The BM25 CTE chain through `ranked` (top-`topN` scored docs), shared
    * by the plain-retrieval oracle and the hybrid-fusion oracle so the
    * lexical leg can never drift between them. */
  private def bm25RankedCtes(topN: Int, rel: String = "documents"): String = {
    val termList = QueryTerms.map(t => s"'$t'").mkString(", ")
    val tfCols = QueryTerms.zipWithIndex.map { case (t, i) =>
      s"COALESCE(SUM(CASE WHEN term = '$t' THEN tf END), 0) AS tf_$i" }
      .mkString(",\n             ")
    val dfCols = QueryTerms.zipWithIndex.map { case (t, i) =>
      s"COALESCE(SUM(CASE WHEN term = '$t' THEN df END), 0) AS df_$i" }
      .mkString(",\n             ")
    // ::DOUBLE pins the idf ratio to double division (DuckDB would
    // otherwise route the +0.5 arithmetic through DECIMAL); the sums
    // themselves are integer+0.5, exact in either representation
    val scoreSql = QueryTerms.indices.map { i =>
      s"""(ln(1.0 + ((n_docs - df_$i + 0.5)::DOUBLE) / ((df_$i + 0.5)::DOUBLE))
         * (tf_$i * ${K1 + 1.0}) / (tf_$i + $K1 * (1.0 - $B + $B * n_words / avg_len)))"""
    }.mkString(" + ")
    s"""lens AS (
      SELECT doc_id, CAST(len(${Portable.wordsSql("text")}) AS INT) AS n_words
      FROM $rel),
    tok AS (
      SELECT doc_id, unnest(${Portable.wordsSql("text")}) AS term FROM $rel),
    td AS (
      SELECT term, doc_id, COUNT(*) AS tf FROM tok
      WHERE term IN ($termList) GROUP BY term, doc_id),
    tfs AS (
      SELECT doc_id,
             $tfCols
      FROM td GROUP BY doc_id),
    corpus AS (
      SELECT COUNT(*) AS n_docs, AVG(n_words) AS avg_len FROM lens),
    dfs AS (
      SELECT $dfCols
      FROM (SELECT term, COUNT(*) AS df FROM td GROUP BY term)),
    ranked AS (
      SELECT tfs.doc_id, lens.n_words,
             ${QueryTerms.indices.map(i => s"tf_$i").mkString(", ")},
             ($scoreSql) AS score
      FROM tfs JOIN lens ON tfs.doc_id = lens.doc_id, corpus, dfs
      ORDER BY score DESC, tfs.doc_id LIMIT $topN)"""
  }

  val txBm25TopKSql: String = s"""
    WITH ${bm25RankedCtes(SearchTopN)}
    SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank,
           doc_id, n_words,
           ${QueryTerms.indices.map(i => s"CAST(tf_$i AS BIGINT) AS tf_$i").mkString(", ")}
    FROM ranked ORDER BY rank"""

  /** Oracle for the tombstone-delete gate
    * ([[graft.streaming.StreamingGates.streamBm25Delete]]): the SAME
    * bm25 chain as [[txBm25TopKSql]] over the corpus MINUS the deleted
    * slice — from-scratch-on-the-survivors is exactly what a
    * right-to-be-forgotten delete must be indistinguishable from.
    * Every statistic the score depends on (df, N, avg_len) shifts with
    * the deletion, so a store that only masked rows but served stale
    * aggregates would hash-mismatch here. */
  def txBm25TopKExcludingSql(pred: String): String = s"""
    WITH docs_kept AS (SELECT doc_id, text FROM documents WHERE NOT ($pred)),
    ${bm25RankedCtes(SearchTopN, "docs_kept")}
    SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank,
           doc_id, n_words,
           ${QueryTerms.indices.map(i => s"CAST(tf_$i AS BIGINT) AS tf_$i").mkString(", ")}
    FROM ranked ORDER BY rank"""

  // ---------------------------------------------------------------- hybrid

  /** Reciprocal-rank-fusion constant (the standard 60) — and the fused
    * score in integer ppm, `1000000 div (RrfK + rank)`, so fusion is
    * integer-exact in both engines (a float 1/(k+r) sum would hang the
    * gate on summation rounding; at two retrievers the integer form
    * loses nothing that matters to rank order). */
  val RrfK = 60

  /** Per-retriever candidate-list depth feeding the fusion. */
  val HybridDepth = 20

  val HybridTopN = 10

  /** The dense leg's query vector id. */
  val HybridQueryVec = 0L

  /** Hybrid retrieval: the BM25 lexical list for [[QueryTerms]] fused
    * with the exact dense cosine list for query vector
    * [[HybridQueryVec]] by reciprocal-rank fusion — the standard
    * lexical+semantic retrieval composition (each leg catches what the
    * other misses: BM25 the exact-term matches, dense the paraphrases).
    *
    * Scale shape: each leg ends in a TakeOrderedAndProject of
    * [[HybridDepth]] rows, so the fusion join touches 2·depth rows no
    * matter the corpus size; the dense leg is the sanctioned one-row
    * broadcast over the embeddings scan (swap in the ANN index probe
    * ([[AnnIndex.probeBands]]) for the scan at production corpus sizes —
    * fusion is agnostic to how each list was produced). */
  def txHybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val lens = graft.Caches.persist(docs.select(col("doc_id"),
      size(Portable.words(col("text"))).as("n_words")))
    val qtd = graft.Caches.persist(
      termDocs(docs).filter(col("term").isin(QueryTerms: _*)))
    val lex = bm25Rank(qtd, lens, QueryTerms, HybridDepth)
      .select(col("doc_id"), col("rank").as("lex_rank"))
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") === HybridQueryVec)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val den = broadcast(q).join(e, col("qid") =!= col("vec_id"))
      .select(col("vec_id").as("doc_id"),
        Portable.cosine(col("qe"), col("embedding")).as("cosine"))
      .orderBy(col("cosine").desc, col("doc_id"))
      .limit(HybridDepth)
      // rank over the already-limited depth rows, as in bm25Rank
      // (onePartition key: see the warning note there)
      .withColumn("den_rank", row_number().over(
        Window.partitionBy(Portable.onePartition(col("doc_id")))
          .orderBy(col("cosine").desc, col("doc_id"))))
      .select(col("doc_id"), col("den_rank"))
    val fused = lex.join(den, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(expr(s"1000000 div ($RrfK + lex_rank)"), lit(0L)) +
         coalesce(expr(s"1000000 div ($RrfK + den_rank)"), lit(0L)))
          .cast("long").as("rrf_ppm"),
        coalesce(col("lex_rank"), lit(0)).cast("int").as("lex_rank"),
        coalesce(col("den_rank"), lit(0)).cast("int").as("den_rank"))
      .orderBy(col("rrf_ppm").desc, col("doc_id"))
      .limit(HybridTopN)
    fused
      .withColumn("rank", row_number().over(
        Window.partitionBy(Portable.onePartition(col("doc_id")))
          .orderBy(col("rrf_ppm").desc, col("doc_id"))))
      .select(col("rank"), col("doc_id"), col("rrf_ppm"),
        col("lex_rank"), col("den_rank"))
      .orderBy(col("rank"))
  }

  val txHybridRrfSql: String = s"""
    WITH ${bm25RankedCtes(HybridDepth)},
    lexr AS (
      SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS lex_rank
      FROM ranked),
    dpairs AS (
      SELECT c.vec_id AS doc_id,
             ${Portable.cosineSql("q.embedding", "c.embedding", Similarity.Dim)} AS cosine
      FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
      WHERE q.vec_id = $HybridQueryVec),
    dtop AS (
      SELECT doc_id, cosine FROM dpairs
      ORDER BY cosine DESC, doc_id LIMIT $HybridDepth),
    denr AS (
      SELECT doc_id, CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS INT) AS den_rank
      FROM dtop),
    fused AS (
      SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
             CAST(COALESCE(1000000 // ($RrfK + l.lex_rank), 0)
                + COALESCE(1000000 // ($RrfK + d.den_rank), 0) AS BIGINT) AS rrf_ppm,
             CAST(COALESCE(l.lex_rank, 0) AS INT) AS lex_rank,
             CAST(COALESCE(d.den_rank, 0) AS INT) AS den_rank
      FROM lexr l FULL OUTER JOIN denr d ON l.doc_id = d.doc_id),
    top AS (
      SELECT * FROM fused ORDER BY rrf_ppm DESC, doc_id LIMIT $HybridTopN)
    SELECT CAST(row_number() OVER (ORDER BY rrf_ppm DESC, doc_id) AS INT) AS rank,
           doc_id, rrf_ppm, lex_rank, den_rank
    FROM top ORDER BY rank"""
}
