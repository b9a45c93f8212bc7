package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Column profiling — the data-quality pass every large-scale pipeline
  * runs before and after a transformation: per-column null counts,
  * distinct counts, and min/max.
  *
  * Shape: one aggregation branch PER COLUMN, unioned. Putting every
  * column's exact COUNT(DISTINCT) into one aggregation makes Catalyst
  * plan an Expand — the input multiplies by (distinct columns + 1)
  * before the shuffle, measured 6.2 s vs 1.0 s at sf0.1 for the union
  * form. Per column, a single-distinct aggregate plans WITHOUT Expand
  * (partial agg keyed by the column, then final), each branch's parquet
  * scan reads exactly ONE column (pruned ReadSchema), and the branches
  * share nothing — at 100 TB the union reads the same total bytes as a
  * single all-column scan, shuffles only per-column distinct values,
  * and parallelizes across the cluster per branch. Exact distinct is
  * kept because it is DuckDB-oracle-checkable; at 100 TB production
  * swaps in `approx_count_distinct` — one narrow scan, no distinct
  * shuffle at all, mergeable HLL sketches (see [[Sketches]]).
  *
  * Min/max are computed on the NATIVE type (a string min over numeric
  * values would be wrong) and cast to string afterwards for a uniform
  * output schema. No reference counterpart; extension surface. */
object Profiling {

  /** Profile of `cols` (must exist in `df`; restricted to types whose
    * string rendering is engine-portable — ints, strings, dates). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    cols.map { c =>
      df.select(col(c)).agg(
          count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
          count_distinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_value"),
          max(col(c)).cast("string").as("max_value"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_value"), col("max_value"))
    }.reduce(_ unionByName _).orderBy(col("col_name"))
  }

  private val ProfCols = Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate")

  /** Gated query: profile four lineitem columns (bigint, int, string,
    * date — the portable-rendering types). */
  def profColumnStats(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.lineitem(spark, dir), ProfCols)

  val profColumnStatsSql: String = ProfCols.map { c => s"""
    SELECT '$c' AS col_name, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           COUNT(DISTINCT $c) AS n_distinct,
           CAST(MIN($c) AS VARCHAR) AS min_value,
           CAST(MAX($c) AS VARCHAR) AS max_value
    FROM lineitem"""
  }.mkString(" UNION ALL ") + " ORDER BY col_name"

  /** Embedding-table profiler — the dataset card for the VECTOR column
    * the text profilers can't see: per-dimension min/max and
    * sign/zero/NaN counts over the whole corpus. This is the drift/
    * sanity report an embedding pipeline needs before indexing — a
    * dimension that went all-zero (truncated model output), a NaN leak,
    * or a min/max blow-up (missing normalization) each shows as one
    * anomalous row of the 64. Every aggregate is order-independent
    * (min/max/integer counts — no float SUM whose accumulation order
    * would break the bit-exact oracle; mean/variance belong to the
    * approx tier at 100 TB, same posture as `approx_percentile`).
    *
    * Scale shape: posexplode widens to dim× rows but the shuffle
    * carries only (dim, partial aggregates) — map-side combined into
    * exactly [[Similarity.Dim]] groups, corpus-size-independent. */
  def embeddingCard(e: DataFrame): DataFrame =
    e.select(posexplode(col("embedding")).as(Seq("i0", "v")))
      .select((col("i0") + 1).cast("long").as("dim"), col("v"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"),
        // NaN guard on the positive bucket: both Spark and DuckDB order
        // NaN above every number, so an unguarded v > 0 would count a
        // NaN in n_pos AND n_nan — breaking the partition law exactly
        // when the NaN-leak anomaly this card exists to surface occurs
        sum(when(col("v") > 0 && !isnan(col("v")), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("v") < 0, 1L).otherwise(0L)).as("n_neg"),
        sum(when(col("v") === 0, 1L).otherwise(0L)).as("n_zero"),
        sum(when(isnan(col("v")), 1L).otherwise(0L)).as("n_nan"))
      .orderBy(col("dim"))

  def profEmbeddingCard(spark: SparkSession, dir: String): DataFrame =
    embeddingCard(Tables.embeddings(spark, dir))

  /** Oracle: DuckDB's zipped unnest (positions zipped with values) is
    * the posexplode twin — it emits one row per ACTUAL element, so a
    * ragged corpus (a truncated 63-wide vector, an over-long one)
    * produces the same per-dim counts in both engines, where a fixed
    * 1..Dim grid would silently diverge. */
  val profEmbeddingCardSql: String = s"""
    WITH ev AS (
      SELECT unnest(range(1, len(embedding) + 1)) AS dim,
             unnest(embedding) AS v
      FROM embeddings)
    SELECT dim, COUNT(*) AS n,
           MIN(v) AS min_v, MAX(v) AS max_v,
           CAST(SUM(CASE WHEN v > 0 AND NOT isnan(v) THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           CAST(SUM(CASE WHEN v < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
           CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
           CAST(SUM(CASE WHEN isnan(v) THEN 1 ELSE 0 END) AS BIGINT) AS n_nan
    FROM ev GROUP BY dim ORDER BY dim"""

  /** Join-key skew diagnosis: the report that decides whether a key
    * needs [[Skew]]'s salting or can rely on AQE's skew-join split.
    * Per-key counts are map-side combined (the only corpus-sized
    * shuffle carries (key, partial-count)); the distribution stats then
    * run over |distinct keys| rows. Exact percentiles keep the oracle
    * checkable — at 100 TB swap `percentile` for `approx_percentile`
    * (same plan shape, sketch-mergeable). top_share >> 1/n_keys is the
    * salting signal. */
  def skewStats(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("total_rows"),
        max(col("cnt")).as("max_cnt"),
        percentile(col("cnt"), lit(0.5)).as("p50_cnt"),
        percentile(col("cnt"), lit(0.99)).as("p99_cnt"))
      .select(lit(keyCol).as("key_col"), col("n_keys"), col("total_rows"),
        col("max_cnt"), col("p50_cnt"), col("p99_cnt"),
        (col("max_cnt").cast("double") / col("total_rows")).as("top_share"))

  /** Gated query: skew report over the three hot join keys. */
  def profSkewReport(spark: SparkSession, dir: String): DataFrame =
    Seq(
      skewStats(Tables.events(spark, dir), "user_id"),
      skewStats(Tables.lineitem(spark, dir), "l_partkey"),
      skewStats(Tables.orders(spark, dir), "o_custkey"))
      .reduce(_ unionByName _)
      .orderBy(col("key_col"))

  val profSkewReportSql: String = Seq(
    ("events", "user_id"), ("lineitem", "l_partkey"), ("orders", "o_custkey"))
    .map { case (t, c) => s"""
    SELECT '$c' AS key_col,
           COUNT(*) AS n_keys,
           CAST(SUM(cnt) AS BIGINT) AS total_rows,
           CAST(MAX(cnt) AS BIGINT) AS max_cnt,
           quantile_cont(cnt, 0.5) AS p50_cnt,
           quantile_cont(cnt, 0.99) AS p99_cnt,
           CAST(MAX(cnt) AS DOUBLE) / SUM(cnt) AS top_share
    FROM (SELECT $c, COUNT(*) AS cnt FROM $t GROUP BY $c)"""
    }.mkString(" UNION ALL ") + " ORDER BY key_col"

  /** Corpus card — the one-stop dataset report a training-data release
    * ships with: volume, token mass, language mix, exact-duplicate rate,
    * and a length-floor quality count, as (metric, value) BIGINT rows.
    *
    * Shape: independent aggregate branches unioned (the [[profile]]
    * argument — each branch's scan prunes to exactly the columns it
    * needs and plans its own map-side-combined aggregation; no Expand,
    * no shared shuffle). The duplicate count reuses THE canonical
    * content identity ([[TextAnalysis.normText]] md5) so the card's
    * dup rate is definitionally consistent with [[Dedup.ddExact]]'s
    * keep-set. Everything is a count — integer-exact, hash-exact. */
  def corpusCard(docs: DataFrame): DataFrame = {
    val words = size(graft.functions.Portable.words(col("text")))
    val branches = Seq(
      docs.agg(count(lit(1)).as("value"))
        .select(lit("n_docs").as("metric"), col("value")),
      docs.agg(sum(words.cast("long")).as("value"))
        .select(lit("total_words").as("metric"), col("value")),
      docs.agg(sum(regexp_count(col("text"), lit("[A-Za-z0-9]+")).cast("long"))
          .as("value"))
        .select(lit("total_tokens").as("metric"), col("value")),
      docs.agg(sum(col("n_chars")).as("value"))
        .select(lit("total_chars").as("metric"), col("value")),
      docs.agg(count_distinct(col("lang")).as("value"))
        .select(lit("n_langs").as("metric"), col("value")),
      docs.groupBy(col("lang")).agg(count(lit(1)).as("value"))
        .select(concat(lit("docs_lang_"), col("lang")).as("metric"), col("value")),
      docs.agg((count(lit(1)) -
          count_distinct(md5(TextAnalysis.normText(col("text"))))).as("value"))
        .select(lit("n_exact_dup_docs").as("metric"), col("value")),
      docs.filter(words >= 20).agg(count(lit(1)).as("value"))
        .select(lit("n_docs_ge20_words").as("metric"), col("value")))
    branches.reduce(_ unionByName _).orderBy(col("metric"))
  }

  /** Gated query: the card over the documents table. */
  def profCorpusCard(spark: SparkSession, dir: String): DataFrame =
    corpusCard(Tables.documents(spark, dir))

  val profCorpusCardSql: String = s"""
    SELECT 'n_docs' AS metric, COUNT(*) AS value FROM documents
    UNION ALL
    SELECT 'total_words', CAST(SUM(len(${graft.functions.Portable.wordsSql("text")})) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'total_tokens', CAST(SUM(len(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'total_chars', CAST(SUM(n_chars) AS BIGINT) FROM documents
    UNION ALL
    SELECT 'n_langs', COUNT(DISTINCT lang) FROM documents
    UNION ALL
    SELECT 'docs_lang_' || lang, COUNT(*) FROM documents GROUP BY lang
    UNION ALL
    SELECT 'n_exact_dup_docs',
           COUNT(*) - COUNT(DISTINCT md5(${TextAnalysis.normTextSql("text")}))
    FROM documents
    UNION ALL
    SELECT 'n_docs_ge20_words', COUNT(*) FROM documents
    WHERE len(${graft.functions.Portable.wordsSql("text")}) >= 20
    ORDER BY metric"""

  /** Slice boundary for the gated drift report: first vs second half of
    * the events month. */
  val DriftSplit = "2024-01-15 00:00:00"

  /** Categorical-distribution drift between two slices of the same
    * stream — the monitor that catches "the upstream mix shifted"
    * before a model trains on it. Per category: counts and shares in
    * ppm (integer-exact: share = n·1e6 div total — no float division
    * anywhere), absolute share delta, plus a `__tvd__` summary row
    * carrying the total variation distance (½·Σ|Δshare|, THE standard
    * distribution-shift metric) in the same ppm units.
    *
    * Scale shape: each slice collapses to |categories| rows via one
    * map-side-combined groupBy before anything joins — the full-outer
    * category join and the TVD fold run on frames the size of the
    * category vocabulary, never the stream. Slice totals ride along as
    * window-free aggregates OVER that tiny frame (a 2-row shuffle),
    * not driver round-trips, so the report is a single lazy plan.
    * Null-safe: a NULL category is one category (joined with <=>).
    * An EMPTY slice reads as the all-zero distribution (every share 0,
    * TVD = half the other side's full share mass = 500000 ppm when the
    * other side is non-empty) — pinned explicitly because the two
    * engines otherwise disagree on the degenerate input: Spark's `div`
    * yields NULL on 0-div-0 while DuckDB's `//` errors. */
  def categoryDrift(a: DataFrame, b: DataFrame, keyCol: String): DataFrame =
    driftFromCounts(
      a.groupBy(col(keyCol)).agg(count(lit(1)).as("n_a"))
        .select(col(keyCol).as("category"), col("n_a")),
      b.groupBy(col(keyCol)).agg(count(lit(1)).as("n_b"))
        .select(col(keyCol).as("category"), col("n_b")))

  /** The share/TVD law over PRE-COUNTED category frames — `ca`
    * (category, n_a) vs `cb` (category, n_b). Factored from
    * [[categoryDrift]] so the streaming mix-drift gate can run the
    * EXACT batch formulation over its closed-window count sink instead
    * of a third copy of the law drifting on its own. */
  def driftFromCounts(ca0: DataFrame, cb0: DataFrame): DataFrame = {
    // renamed keys keep the full-outer join unambiguous even when both
    // slices are filters of the SAME DataFrame (a self-join by lineage)
    val ca = ca0.select(col("category").as("__ka"), col("n_a"))
    val cb = cb0.select(col("category").as("__kb"), col("n_b"))
    val j = ca.join(cb, col("__ka") <=> col("__kb"), "full_outer")
      .select(
        coalesce(col("__ka").cast("string"), col("__kb").cast("string")).as("category"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    // global window over the |categories|-row frame — tiny by
    // contract. PARTITION BY n_a % 1 (constant, non-foldable): an
    // empty OVER () warns per run, and a foldable key gets stripped
    // back to empty by EliminateWindowPartitions (Portable.onePartition).
    // Both totals compute in ONE projection so Catalyst plans ONE
    // WindowExec — the per-withColumn form planned two chained
    // Window(Sort(Exchange)) stages (+1.2 s on the mix-drift gate,
    // measured), because the interleaved Projects block CollapseWindow
    val shares = j
      .select(col("*"),
        expr("sum(n_a) over (partition by n_a % 1)").as("__tot_a"),
        expr("sum(n_b) over (partition by n_a % 1)").as("__tot_b"))
      .withColumn("share_ppm_a",
        expr("case when __tot_a = 0 then 0L else n_a * 1000000L div __tot_a end"))
      .withColumn("share_ppm_b",
        expr("case when __tot_b = 0 then 0L else n_b * 1000000L div __tot_b end"))
      .withColumn("delta_ppm", abs(col("share_ppm_a") - col("share_ppm_b")))
      .drop("__tot_a", "__tot_b")
    // coalesce: sums over a zero-category frame (both slices empty) are
    // NULL in both engines — the convention pins the summary row to 0s
    val tvd = shares
      .agg(coalesce(sum(col("n_a")), lit(0L)).as("n_a"),
        coalesce(sum(col("n_b")), lit(0L)).as("n_b"),
        expr("coalesce(sum(delta_ppm) div 2, 0L)").as("delta_ppm"))
      .select(lit("__tvd__").as("category"), col("n_a"), col("n_b"),
        lit(1000000L).as("share_ppm_a"), lit(1000000L).as("share_ppm_b"),
        col("delta_ppm"))
    shares.unionByName(tvd).orderBy(col("category"))
  }

  /** Gated query: event-type mix drift across [[DriftSplit]]. */
  def profDriftReport(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    categoryDrift(
      e.filter(col("ts") < lit(DriftSplit).cast("timestamp")),
      e.filter(col("ts") >= lit(DriftSplit).cast("timestamp")),
      "event_type")
  }

  val profDriftReportSql: String = s"""
    WITH ca AS (
      SELECT event_type, COUNT(*) AS n_a FROM events
      WHERE ts < TIMESTAMP '$DriftSplit' GROUP BY event_type),
    cb AS (
      SELECT event_type, COUNT(*) AS n_b FROM events
      WHERE ts >= TIMESTAMP '$DriftSplit' GROUP BY event_type),
    j AS (
      SELECT COALESCE(CAST(ca.event_type AS VARCHAR),
                      CAST(cb.event_type AS VARCHAR)) AS category,
             COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
      FROM ca FULL OUTER JOIN cb
        ON ca.event_type IS NOT DISTINCT FROM cb.event_type),
    shares AS (
      SELECT category, n_a, n_b,
             CASE WHEN SUM(n_a) OVER () = 0 THEN 0
                  ELSE n_a * 1000000 // SUM(n_a) OVER () END AS share_ppm_a,
             CASE WHEN SUM(n_b) OVER () = 0 THEN 0
                  ELSE n_b * 1000000 // SUM(n_b) OVER () END AS share_ppm_b
      FROM j),
    d AS (
      SELECT category, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             CAST(share_ppm_a AS BIGINT) AS share_ppm_a,
             CAST(share_ppm_b AS BIGINT) AS share_ppm_b,
             CAST(abs(share_ppm_a - share_ppm_b) AS BIGINT) AS delta_ppm
      FROM shares)
    SELECT * FROM d
    UNION ALL
    SELECT '__tvd__', CAST(COALESCE(SUM(n_a), 0) AS BIGINT),
           CAST(COALESCE(SUM(n_b), 0) AS BIGINT),
           1000000, 1000000, CAST(COALESCE(SUM(delta_ppm) // 2, 0) AS BIGINT)
    FROM d
    ORDER BY category"""

  /** Per-group k-sigma outlier flagging in EXACT integer arithmetic —
    * the numeric data-cleaning pass (drop rows whose `value` deviates
    * from its group's mean by more than k population stddevs).
    *
    * Floating σ would hash-differ across engines (reduction order), so
    * the predicate is cleared of division entirely: with cents
    * c = 100·value (exact — values carry 2 decimals), n = |group|,
    * S = Σc, Q = Σc², `|x−μ| > k·σ  ⇔  (n·c − S)² > k²·(n·Q − S²)`.
    * Both sides are products of exact integer aggregates, computed here
    * in decimal(38,0) for headroom (n·Q at trillion-row groups
    * overflows the i64 the sf-scale oracle can still use; the oracle
    * only sees output columns, so internal widths are free).
    *
    * Plan shape: one map-side-combined aggregate to 5 group rows,
    * broadcast back, narrow filter — the canonical "corpus stats then
    * filter" pass. Nothing corpus-sized shuffles twice. */
  def valueOutliers(events: DataFrame, k: Int): DataFrame = {
    val cents = col("value").cast("decimal(18,2)").multiply(lit(100))
      .cast("decimal(38,0)")
    val stats = events.select(col("event_type"), cents.as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("c")).cast("decimal(38,0)").as("s"),
        sum(col("c") * col("c")).cast("decimal(38,0)").as("q"))
    events.select(col("event_id"), col("event_type"), col("value"),
        cents.as("c"))
      .join(broadcast(stats), Seq("event_type"))
      .filter({
        val dev = col("n") * col("c") - col("s")
        dev * dev > lit(k * k) * (col("n") * col("q") - col("s") * col("s"))
      })
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }

  private val OutlierK = 3

  /** Gated query: 3-sigma value outliers per event type. */
  def profValueOutliers(spark: SparkSession, dir: String): DataFrame =
    valueOutliers(Tables.events(spark, dir), OutlierK)

  val profValueOutliersSql: String = s"""
    WITH c AS (
      SELECT event_id, event_type, value,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      FROM events),
    st AS (
      SELECT event_type, COUNT(*) AS n, SUM(c) AS s, SUM(c*c) AS q
      FROM c GROUP BY event_type)
    SELECT event_id, c.event_type, value
    FROM c JOIN st ON c.event_type = st.event_type
    WHERE (n*c.c - s)*(n*c.c - s) > ${OutlierK * OutlierK}*(n*q - s*s)
    ORDER BY event_id"""
}
