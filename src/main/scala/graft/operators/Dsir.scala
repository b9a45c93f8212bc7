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
  * gram OCCURRENCES (not distinct shingles — DSIR weights by count;
  * semantics = [[Portable.ngrams]]→hash, computed by the codegen'd
  * [[graft.functions.NgramHash60s]] byte-range kernel). Sub-bit resolution is irrelevant for a
  * selection score whose cutoff is itself a tuned hyperparameter.
  *
  * Scale shape (the 100 TB story): gram occurrences reduce by hashed
  * bucket with map-side combine into ONE ≤ [[B]]-row histogram — the
  * model is O(B), NOT O(vocab), which is the entire point of hashed
  * DSIR; it collects to the driver and the weight table ships back as
  * a dense array literal indexed by bucket (O(1) per-gram lookup in
  * codegen — a MAP literal would linear-scan its keys), so scoring is
  * one more map-side-combined integer aggregate with NO weight join. Nothing ever shuffles text.
  * At real scale B grows to 10⁴–10⁶ buckets and the target histogram
  * is trained once offline — the same plan either way.
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

  private def bucketSql(x: String): String =
    s"((${Portable.hash60Sql(x)} % $B + $B) % $B)"

  /** Per-document importance scores: (doc_id, is_target, n_grams,
    * dsir_score), every input doc present (gram-less docs score 0).
    * `isTarget` marks the rows whose distribution defines the target
    * model; raw = the whole relation (the candidate pool, target
    * included — standard when selecting FROM the pool). */
  /** Laplace-smoothed whole-bit surprisal: bitlen((total+B) div
    * (cnt+1)) − 1 — the integer quantization both engines agree on. */
  private def bits(cnt: Long, total: Long): Long =
    63L - java.lang.Long.numberOfLeadingZeros((total + B) / (cnt + 1))

  /** The trained model: the two bucket histograms, dense by bucket id.
    * O(B) state — train once offline, apply to any corpus. */
  case class DsirModel(cntRaw: Array[Long], cntTarget: Array[Long]) {
    require(cntRaw.length == B && cntTarget.length == B,
      s"model histograms must be dense over $B buckets")
    val totRaw: Long = cntRaw.sum
    val totTarget: Long = cntTarget.sum
    /** Per-bucket weight = quantized log p_target/p_raw. Buckets unseen
      * in BOTH corpora get the smoothing-mass constant
      * bits(0,totRaw) − bits(0,totTarget) — the standard Laplace bias
      * for out-of-vocabulary features. */
    def weights: Array[Long] =
      Array.tabulate(B)(b => bits(cntRaw(b), totRaw) - bits(cntTarget(b), totTarget))
  }

  /** (doc_id, is_target, b) — one row per gram OCCURRENCE. Bucket ids
    * straight off the text bytes via the codegen'd n-gram kernel — no
    * shingle strings, no interpreted transform lambda (the built-in
    * ngrams→hash chain is ~6× slower end-to-end at sf0.1; equivalence
    * asserted in ExtensionSpec). */
  private def occurrences(docs: DataFrame, isTarget: Column): DataFrame =
    docs.select(col("doc_id"), isTarget.as("is_target"),
      explode(graft.functions.NgramHash60s.gramBuckets(
        col("text"), GramN, B.toLong)).as("b"))

  /** ONE map-side-combined pass builds both histograms; they are ≤ B
    * rows by construction, so the model collects to the driver —
    * O(B) driver state at any corpus size. */
  private def trainFromOcc(occ: DataFrame): DsirModel = {
    val cntR = new Array[Long](B)
    val cntT = new Array[Long](B)
    occ.groupBy(col("b"))
      .agg(count(lit(1)).as("cnt_r"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("cnt_t"))
      .collect()
      .foreach { r =>
        cntR(r.getLong(0).toInt) = r.getLong(1)
        cntT(r.getLong(0).toInt) = r.getLong(2)
      }
    DsirModel(cntR, cntT)
  }

  /** Train the model on a corpus: the offline half. */
  def train(docs: DataFrame, isTarget: Column): DsirModel =
    trainFromOcc(occurrences(docs, isTarget))

  /** Persist a model as parquet (b, cnt_raw, cnt_target) — rebuildable
    * anywhere, mergeable by adding histograms. */
  def saveModel(spark: SparkSession, model: DsirModel, path: String): Unit = {
    import spark.implicits._
    (0 until B).map(b => (b, model.cntRaw(b), model.cntTarget(b)))
      .toDF("b", "cnt_raw", "cnt_target")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadModel(spark: SparkSession, path: String): DsirModel = {
    val cntR = new Array[Long](B)
    val cntT = new Array[Long](B)
    spark.read.parquet(path).collect().foreach { r =>
      cntR(r.getInt(0)) = r.getLong(1)
      cntT(r.getInt(0)) = r.getLong(2)
    }
    DsirModel(cntR, cntT)
  }

  private def scoreFromOcc(docs: DataFrame, isTarget: Column,
                           occ: DataFrame, model: DsirModel): DataFrame = {
    // dense array literal indexed by bucket (buckets are 0..B-1): O(1)
    // codegen'd lookup per gram — a MAP literal here would linear-scan
    // its keys per row, a join would shuffle-plan for B rows
    val wCol = element_at(typedLit(model.weights.toSeq), (col("b") + 1).cast("int"))
    val perdoc = occ
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), sum(wCol).as("dsir_score"))
    // coalesce: a NULL predicate (e.g. NULL source) must read as
    // "not target" — the oracle's CASE WHEN yields 0 there, and a NULL
    // is_target would also silently drop the doc from Dsir.select's
    // `is_target === 0` candidate pool
    docs.select(col("doc_id"),
        coalesce(isTarget.cast("int"), lit(0)).as("is_target"))
      .join(perdoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_grams", "dsir_score"))
      .orderBy(col("doc_id"))
  }

  /** Score any corpus against an already-trained model — the online
    * half of the offline-train / online-apply split (the 100 TB
    * posture: the target histogram is trained once on the curated
    * corpus, then applied to every crawl shard). */
  def scoreWith(docs: DataFrame, isTarget: Column, model: DsirModel): DataFrame =
    scoreFromOcc(docs, isTarget, occurrences(docs, isTarget), model)

  /** [[scoreWith]] as ONE stateless narrow projection — per-row bucket
    * ids ([[graft.functions.NgramHash60s]]) folded through the per-row
    * weighted sum ([[graft.functions.BucketScore]]): no explode, no
    * groupBy, no state. Equality with [[scoreWith]] is asserted in
    * ExtensionSpec. This is the form that runs unchanged on a
    * STREAMING DataFrame (no aggregation → no watermark, no output-mode
    * constraints), and the cheapest batch form when the model is
    * already trained. Unordered (streams cannot sort). NULL text must
    * score (0, 0) like [[scoreWith]]'s gram-less left join does — bare
    * `size(NULL)` is -1 under the legacy semantics this repo pins and
    * BucketScore(NULL) is NULL, so both columns are null-guarded here
    * to keep the documented scoreWith ≡ scorePerRow contract. */
  def scorePerRow(docs: DataFrame, isTarget: Column, model: DsirModel): DataFrame = {
    val bs = graft.functions.NgramHash60s.gramBuckets(col("text"), GramN, B.toLong)
    docs.select(col("doc_id"),
        coalesce(isTarget.cast("int"), lit(0)).as("is_target"),
        bs.as("bs"))
      .select(col("doc_id"), col("is_target"),
        greatest(size(col("bs")), lit(0)).cast("long").as("n_grams"),
        coalesce(graft.functions.BucketScore.score(col("bs"), model.weights),
          lit(0L)).as("dsir_score"))
  }

  def importanceWeights(docs: DataFrame, isTarget: Column): DataFrame = {
    // persisted: feeds the histogram collect AND the per-doc score pass
    val occ = graft.Caches.persist(occurrences(docs, isTarget))
    scoreFromOcc(docs, isTarget, occ, trainFromOcc(occ))
  }

  /** Gated query: DSIR scores over the documents table with the
    * [[TargetSources]] slice as the target model. */
  def txDsirWeights(spark: SparkSession, dir: String): DataFrame =
    importanceWeights(Tables.documents(spark, dir),
      col("source").isin(TargetSources: _*))

  /** Docs kept by the gated selection query. */
  val SelectN = 100

  /** The selection half of DSIR: keep the top-`n` most target-like
    * non-target docs. The paper samples from the softmax of the
    * weights; the deterministic (and oracle-able) twin is top-n by
    * score with doc_id tie-break — the zero-temperature limit. The
    * top-n is a `TakeOrderedAndProject` (no global sort); the rank
    * window runs over the already-limited n rows. */
  def select(docs: DataFrame, isTarget: Column, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Seq(col("dsir_score").desc, col("doc_id"))
    importanceWeights(docs, isTarget)
      .filter(col("is_target") === 0)
      .orderBy(ord: _*)
      .limit(n)
      // onePartition key: ≤ SelectN rows here; keeps WindowExec's
      // no-partition warning out of bench logs (see Search.bm25Rank —
      // lit(0) no longer works: EliminateWindowPartitions strips it)
      .withColumn("sel_rank",
        row_number().over(Window
          .partitionBy(graft.functions.Portable.onePartition(col("doc_id")))
          .orderBy(ord: _*)))
      .select(col("sel_rank"), col("doc_id"), col("dsir_score"))
      .orderBy(col("sel_rank"))
  }

  /** Gated query: the [[SelectN]]-doc DSIR selection. */
  def txDsirSelect(spark: SparkSession, dir: String): DataFrame =
    select(Tables.documents(spark, dir),
      col("source").isin(TargetSources: _*), SelectN)

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

  val txDsirSelectSql: String = s"""
    WITH weights AS ($txDsirWeightsSql),
    kept AS (
      SELECT doc_id, dsir_score FROM weights WHERE is_target = 0
      ORDER BY dsir_score DESC, doc_id LIMIT $SelectN)
    SELECT CAST(row_number() OVER (ORDER BY dsir_score DESC, doc_id) AS INT)
             AS sel_rank,
           doc_id, dsir_score
    FROM kept ORDER BY sel_rank"""
}
