package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Portable
import graft.sources.Tables

/** DSIR-style data selection: score every candidate document by how
  * target-like its hashed n-gram distribution is (Xie et al., "Data
  * Selection for Language Models via Importance Resampling", NeurIPS
  * 2023). The importance weight of doc x is
  * log p_target(x) − log p_raw(x) under two hashed-bigram unigram
  * models — the standard recipe for picking a Wikipedia/books-like
  * slice out of a web crawl before pretraining.
  *
  * Exactness: both models are quantized to WHOLE-BIT surprisals via the
  * same transcendental-free trick as [[TextAnalysis.surprisal]] —
  * Laplace-smoothed `bits(cnt, total) = bitlen((total + B) div
  * (cnt + 1)) − 1`, an integer two engines agree on to the last digit
  * (libm `log` has no cross-engine bit contract; integer bit-length
  * does). The per-bucket weight is `bits_raw − bits_target`
  * (= quantized log p_t/p_r), a doc's score the integer sum over its
  * gram OCCURRENCES ([[Portable.ngrams]], not distinct shingles —
  * DSIR weights by count). Sub-bit resolution is irrelevant for a
  * selection score whose cutoff is itself a tuned hyperparameter.
  *
  * Scale shape (the 100 TB story): gram occurrences reduce by hashed
  * bucket with map-side combine into two ≤ [[B]]-bucket histograms —
  * the model is O(B), NOT O(vocab), which is the entire point of
  * hashed DSIR; the weight table broadcasts (≤ B rows); the per-doc
  * score is one more map-side-combined integer aggregate. No join ever
  * carries text. At real scale B grows to 10⁴–10⁶ buckets and the
  * target histogram is trained once offline — both are the same plan.
  */
object Dsir {

  /** Hashed feature buckets. sf-sized here; the operator is O(B) state
    * regardless of corpus size, so scaling B with vocab is free. */
  val B = 1024

  /** Feature width: word bigrams (DSIR's default). */
  val GramN = 2

  /** The gated query's proxy "curated" slice: 4 of the 20 synthetic
    * sources stand in for the Wikipedia-like target corpus. */
  val TargetSources: Seq[String] = Seq("src0", "src1", "src2", "src3")

  private def bucket(c: Column): Column = pmod(Portable.hash60(c), lit(B.toLong))
  private def bucketSql(x: String): String =
    s"((${Portable.hash60Sql(x)} % $B + $B) % $B)"

  /** Per-document importance scores: (doc_id, is_target, n_grams,
    * dsir_score), every input doc present (gram-less docs score 0).
    * `isTarget` marks the rows whose distribution defines the target
    * model; raw = the whole relation (the candidate pool, target
    * included — standard when selecting FROM the pool). */
  def importanceWeights(docs: DataFrame, isTarget: Column): DataFrame = {
    // persisted: feeds the two histograms AND the per-doc score probe
    val occ = graft.Caches.persist(
      docs.select(col("doc_id"), isTarget.as("is_target"),
          explode(Portable.ngrams(col("text"), GramN)).as("g"))
        .select(col("doc_id"), col("is_target"), bucket(col("g")).as("b")))
    val totals = occ.agg(count(lit(1)).as("tot_r"),
      sum(when(col("is_target"), 1L).otherwise(0L)).as("tot_t")).head
    val (totR, totT) = (totals.getLong(0), totals.getLong(1))
    val raw = occ.groupBy(col("b")).agg(count(lit(1)).as("cnt_r"))
    val tgt = occ.filter(col("is_target"))
      .groupBy(col("b")).agg(count(lit(1)).as("cnt_t"))
    val wt = raw.join(tgt, Seq("b"), "left")
      .na.fill(0L, Seq("cnt_t"))
      .select(col("b"),
        (expr(s"length(bin(${totR + B}L div (cnt_r + 1L))) - 1").cast("long") -
         expr(s"length(bin(${totT + B}L div (cnt_t + 1L))) - 1").cast("long")).as("w"))
    val perdoc = occ.join(wt, Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("w")).as("dsir_score"))
    docs.select(col("doc_id"), isTarget.cast("int").as("is_target"))
      .join(perdoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_grams", "dsir_score"))
      .orderBy(col("doc_id"))
  }

  /** Gated query: DSIR scores over the documents table with the
    * [[TargetSources]] slice as the target model. */
  def txDsirWeights(spark: SparkSession, dir: String): DataFrame =
    importanceWeights(Tables.documents(spark, dir),
      col("source").isin(TargetSources: _*))

  val txDsirWeightsSql: String = {
    val inList = TargetSources.map(s => s"'$s'").mkString(", ")
    s"""
    WITH occ AS (
      SELECT doc_id, source IN ($inList) AS is_target,
             ${bucketSql("g")} AS b
      FROM (SELECT doc_id, source,
                   unnest(${Portable.ngramsSql("text", GramN)}) AS g
            FROM documents)),
    tot AS (
      SELECT COUNT(*) AS tot_r,
             COALESCE(SUM(CASE WHEN is_target THEN 1 ELSE 0 END), 0) AS tot_t
      FROM occ),
    raw AS (SELECT b, COUNT(*) AS cnt_r FROM occ GROUP BY b),
    tgt AS (SELECT b, COUNT(*) AS cnt_t FROM occ WHERE is_target GROUP BY b),
    wt AS (
      SELECT raw.b,
             CAST(length(bin((tot_r + $B) // (cnt_r + 1))) - 1 AS BIGINT)
           - CAST(length(bin((tot_t + $B) // (COALESCE(cnt_t, 0) + 1))) - 1
                  AS BIGINT) AS w
      FROM raw LEFT JOIN tgt ON raw.b = tgt.b, tot),
    perdoc AS (
      SELECT doc_id, COUNT(*) AS n_grams, CAST(SUM(w) AS BIGINT) AS dsir_score
      FROM occ JOIN wt ON occ.b = wt.b GROUP BY doc_id)
    SELECT d.doc_id,
           CASE WHEN d.source IN ($inList) THEN 1 ELSE 0 END AS is_target,
           COALESCE(p.n_grams, 0) AS n_grams,
           COALESCE(p.dsir_score, 0) AS dsir_score
    FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
    ORDER BY d.doc_id"""
  }
}
