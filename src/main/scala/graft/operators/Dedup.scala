package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Portable
import graft.sources.Tables

/** Deduplication family for a training-data pipeline: exact, n-gram
  * Jaccard, MinHash+LSH banding, SimHash. No reference counterpart — this
  * is the BASELINE.json extension surface, designed scale-first:
  *
  *   - exact dedup groups on a 128-bit digest, never on the document body
  *     (shuffling full documents at 100 TB is the classic mistake);
  *   - MinHash/LSH is the scale path for near-dup: signatures are K longs
  *     per doc, banding turns the quadratic pair search into an equi-join
  *     on (band, signature) — shuffle cost O(docs·K), not O(docs²);
  *   - the exact-Jaccard pair join exists as the correctness baseline and
  *     oracle anchor (quadratic in the shingle-match graph; only for
  *     validation scale);
  *   - everything is built on [[Portable]] md5-derived integer hashing, so
  *     each step is reproducible in DuckDB SQL and the whole family is
  *     oracle-checked exactly — including LSH's candidate set.
  *
  * The synthetic `documents` table has no near-duplicates, so dedup
  * queries operate on [[augmented]]: documents ∪ deterministic variants
  * (first five words dropped, doc_id + 10000) — constructed identically in
  * the SQL oracles.
  */
object Dedup {

  // ---------------------------------------------------------------- corpus

  /** documents ∪ near-dup variants of docs 0..24 (drop first 5 words).
    * Repartitioned: the table arrives as one parquet file → one input
    * partition, which would serialize every downstream hash/shingle
    * pipeline onto a single core. Compute-bound stages must not inherit
    * file partitioning (same rule at 100 TB, where the shuffle cost is
    * amortized by the hash work it parallelizes). */
  def augmented(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
    val w = Portable.words(col("text"))
    val variants = docs.filter(col("doc_id") < 25 && size(w) > 10)
      .select((col("doc_id") + 10000).as("doc_id"),
        array_join(slice(w, 6, 1000000), " ").as("text"))
    docs.unionByName(variants)
  }

  val augmentedSql: String = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 10000 AS doc_id,
           array_to_string(string_split(text, ' ')[6:], ' ') AS text
    FROM documents
    WHERE doc_id < 25 AND len(string_split(text, ' ')) > 10"""

  // ----------------------------------------------------------- exact dedup

  /** Exact dedup: one digest per body, keep the smallest doc_id. */
  def ddExact(spark: SparkSession, dir: String): DataFrame =
    augmented(spark, dir)
      .groupBy(md5(col("text")).as("digest"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_id"))

  val ddExactSql: String = s"""
    WITH aug AS ($augmentedSql)
    SELECT md5(text) AS digest, min(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM aug GROUP BY md5(text) ORDER BY keep_id"""

  // -------------------------------------------------- exact n-gram Jaccard

  /** Shingle relation: (doc_id, h) — distinct word n-grams REDUCED TO
    * their portable hash, the string dropped immediately. Every
    * downstream step (sizes, the pair self-join, MinHash signatures,
    * the LSH verify join) operates on the 8-byte long, so shuffles carry
    * longs instead of ~25-byte shingle strings — a ~3× shuffle-width cut
    * that compounds at 100 TB. Jaccard is therefore hashed-shingle
    * Jaccard (deterministic, mirrored exactly in the oracle; MinHash
    * itself is built on the same hash anyway). The mod-P reduction AND
    * the per-doc dedup happen inside the kernel, so the per-doc value
    * set equals SQL's `SELECT DISTINCT doc_id, h` with no distinct
    * shuffle in the plan at all. Persisted: every consumer re-reads this
    * relation — without the persist the md5-per-shingle pipeline
    * recomputes once per reference. */
  private[graft] def shingleRowsOf(corpus: DataFrame): DataFrame =
    graft.Caches.persist(corpus
      .select(col("doc_id"),
        explode(graft.functions.NgramHash60s.shingleHashes(
          col("text"), Portable.ShingleN, modP = Portable.P)).as("h")))

  private def shingleRows(spark: SparkSession, dir: String): DataFrame =
    shingleRowsOf(augmented(spark, dir))

  private def shingleRowsSqlOf(corpus: String): String = s"""
    SELECT DISTINCT doc_id, ${Portable.hashPSql("shingle")} AS h
    FROM (SELECT doc_id, unnest(${Portable.shinglesSql("text")}) AS shingle
          FROM $corpus)"""

  private val shingleRowsSql: String = shingleRowsSqlOf("aug")

  /** Exact n-gram Jaccard near-dup pairs (j ≥ 0.5). Quadratic in shingle
    * co-occurrence — the validation baseline the LSH path is checked
    * against, not the 100 TB path. */
  def ddNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    allPairsJaccardOnShingles(shingleRows(spark, dir), t = 0.5)

  private def allPairsJaccardOnShingles(s: DataFrame, t: Double): DataFrame = {
    val a = s.as("a"); val b = s.as("b")
    val common = a.join(b, col("a.h") === col("b.h") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    jaccardFinalize(common, s, threshold = t)
  }

  /** Exact set-similarity join via prefix filtering (SSJoin/All-Pairs
    * lineage — Chaudhuri et al. ICDE'06, Bayardo et al. WWW'07):
    * IDENTICAL output to [[ddNgramJaccard]] — it is gated against the
    * same oracle SQL, so every run hash-proves the filter lossless —
    * but the candidate join touches only each document's PREFIX: its
    * `|S| - ceil(t*|S|) + 1` globally-RAREST shingles under a corpus
    * rarity order (document frequency asc, hash asc). Overlap lemma:
    * jaccard >= t forces `|A∩B| >= ceil(t*|A|)`; if the prefixes
    * shared no token, whichever prefix ends earlier in the global
    * order would confine the whole intersection to its
    * `ceil(t*|side|) - 1` suffix slots — too few. So every qualifying
    * pair collides on a prefix token.
    *
    * 100 TB shape: the exact baseline's candidate count is collisions
    * on ALL tokens — Zipf's head tokens each contribute df² pairs. The
    * prefix join collides only on each doc's rarest tokens (the head
    * falls outside every prefix), the classic order-of-magnitude
    * candidate cut, while staying EXACT — no LSH false-negative
    * budget. Costs one extra df aggregation + per-doc sort; the verify
    * stage is the shared [[jaccardFinalize]] arithmetic. */
  def ddSsjoinPrefix(spark: SparkSession, dir: String): DataFrame =
    ssjoinPrefixOf(augmented(spark, dir), t = 0.5)

  /** [[ddSsjoinPrefix]] over an arbitrary (doc_id, text) corpus. */
  def ssjoinPrefixOf(corpus: DataFrame, t: Double): DataFrame =
    prefixJaccardOnShingles(shingleRowsOf(corpus), t)

  private def prefixJaccardOnShingles(s: DataFrame, t: Double): DataFrame = {
    val common = prefixCandidatesOf(s, t)
      .join(s.withColumnRenamed("doc_id", "id_a"), "id_a")
      .join(s.withColumnRenamed("doc_id", "id_b"), Seq("id_b", "h"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_common"))
    jaccardFinalize(common, s, threshold = t)
  }

  /** Head-heaviness decision for [[ssjoinAutoOf]]: true when ONE
    * shingle alone carries over 10% of the corpus collision mass
    * (Σ df² — each token's df² is the candidate pairs it forces into
    * the all-pairs join). One map-side-combined aggregate and a
    * 2-scalar driver pull — the same corpus-derived-constant posture
    * as `Similarity.autoPlanes`. */
  private[graft] def ssjoinHeadHeavyOf(s: DataFrame): Boolean = {
    val row = s.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .agg(max(col("df") * col("df")).as("head_mass"),
        sum(col("df") * col("df")).as("mass")).head()
    row.getLong(0) * 10L > row.getLong(1)
  }

  /** Production entry: measure the df profile, then run the prefix
    * filter exactly when the Zipf head dominates the collision mass
    * (the regime SCALING.md's probe numbers carve out) and the plain
    * equi-join otherwise. BOTH branches are exact, so unlike the
    * other auto variants this one is gated HASH-EXACT against the
    * same oracle as [[ddNgramJaccard]] — the chooser cannot change
    * the answer, only the plan. */
  def ssjoinAutoOf(corpus: DataFrame, t: Double): DataFrame = {
    val s = shingleRowsOf(corpus)
    if (ssjoinHeadHeavyOf(s)) prefixJaccardOnShingles(s, t)
    else allPairsJaccardOnShingles(s, t)
  }

  /** Gated query for [[ssjoinAutoOf]]. */
  def ddSsjoinAuto(spark: SparkSession, dir: String): DataFrame =
    ssjoinAutoOf(augmented(spark, dir), t = 0.5)

  /** Distinct candidate pairs colliding on a prefix token — exposed for
    * the candidate-count law in ExtensionSpec (prefix candidates ≪
    * all-token candidates exactly when df is Zipfian). */
  private[graft] def prefixCandidatesOf(s: DataFrame, t: Double): DataFrame = {
    val dfreq = s.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val prefix = s.join(dfreq, "h")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("toks"))
      .select(col("doc_id"), explode(expr(
        s"slice(toks, 1, size(toks) - CAST(ceil($t * size(toks)) AS INT) + 1)")).as("tk"))
      .select(col("doc_id"), col("tk.h").as("h"))
    prefix.as("a").join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** All-token candidate pairs (the exact baseline's join input) — the
    * contrast relation for the same candidate-count law. */
  private[graft] def allPairCandidatesOf(s: DataFrame): DataFrame =
    s.as("a").join(s.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()

  /** Shared jaccard finalize: join per-doc shingle counts onto an
    * (id_a, id_b, n_common) relation, compute jaccard, threshold, and
    * order — ONE definition of the jaccard arithmetic for the exact
    * baseline, the LSH verify, and the streaming verify (a change to
    * the formula applied to one copy would silently diverge the
    * baseline from the paths it validates). */
  private def jaccardFinalize(common: DataFrame, s: DataFrame,
                              threshold: Double): DataFrame = {
    val sizes = s.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    common
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_shingles", "na"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_shingles", "nb"), "id_b")
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("na") + col("nb") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val ddNgramJaccardSql: String = s"""
    WITH aug AS ($augmentedSql),
    s AS ($shingleRowsSql),
    sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM s GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM s a JOIN s b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT id_a, id_b,
           CAST(n_common AS DOUBLE) / (na.n_shingles + nb.n_shingles - n_common) AS jaccard
    FROM common
    JOIN sizes na ON na.doc_id = id_a
    JOIN sizes nb ON nb.doc_id = id_b
    WHERE CAST(n_common AS DOUBLE) / (na.n_shingles + nb.n_shingles - n_common) >= 0.5
    ORDER BY id_a, id_b"""

  /** Containment near-dup — the ASYMMETRIC companion to
    * [[ddNgramJaccard]]: containment(A,B) = |A∩B| / min(|A|,|B|)
    * catches a short document quoted wholesale inside a long one, which
    * Jaccard structurally misses (the union in its denominator is
    * dominated by the long side — a 50-shingle doc fully contained in a
    * 500-shingle doc scores jaccard 0.1 but containment 1.0). This is
    * the quote/subset detector curation pipelines run NEXT TO the
    * symmetric near-dup pass (Broder's containment measure). Same
    * declared-quadratic oracle-anchor role as the Jaccard form: the
    * scale path reuses the MinHash/LSH candidate machinery and swaps
    * this formula into the verify stage. */
  def ddContainment(spark: SparkSession, dir: String): DataFrame = {
    val s = shingleRows(spark, dir)
    val a = s.as("a"); val b = s.as("b")
    val common = a.join(b, col("a.h") === col("b.h") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    val sizes = s.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    common
      .join(sizes.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("n_shingles", "na"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("n_shingles", "nb"), "id_b")
      .withColumn("containment",
        col("n_common").cast("double") / least(col("na"), col("nb")))
      .filter(col("containment") >= ContainmentThreshold)
      .select(col("id_a"), col("id_b"), col("containment"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Pairs whose smaller side is ≥ 80% contained in the other. */
  val ContainmentThreshold = 0.8

  val ddContainmentSql: String = s"""
    WITH aug AS ($augmentedSql),
    s AS ($shingleRowsSql),
    sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM s GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM s a JOIN s b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT id_a, id_b,
           CAST(n_common AS DOUBLE) / least(na.n_shingles, nb.n_shingles)
             AS containment
    FROM common
    JOIN sizes na ON na.doc_id = id_a
    JOIN sizes nb ON nb.doc_id = id_b
    WHERE CAST(n_common AS DOUBLE) / least(na.n_shingles, nb.n_shingles)
          >= $ContainmentThreshold
    ORDER BY id_a, id_b"""

  // ---------------------------------------------------------- MinHash + LSH

  /** K hash permutations mh_k(h) = (a_k·h + b_k) mod P over the portable
    * shingle hash; LSH banding with BANDS bands of R rows. */
  val K = 16
  val BANDS = 4
  val R = 4
  /** Affine permutation constants — arbitrary but fixed, mirrored in SQL. */
  val A: Seq[Long] = (0 until K).map(k => 37L * k + 11L)
  val B: Seq[Long] = (0 until K).map(k => 101L * k + 7L)

  private def minhashColSql(k: Int): String =
    s"min((${A(k)} * h + ${B(k)}) % ${Portable.P}) AS mh_$k"

  /** Per-doc MinHash signature (K columns mh_0..mh_{K-1}), computed as a
    * NARROW PROJECTION by the codegen'd [[graft.functions.MinHashSig]]
    * kernel — one doc is one row, so no shingle explode and no
    * K-aggregate groupBy (the widest shuffle of the round-1 pipeline).
    * Docs with fewer than n words have no shingle set → sentinel mins →
    * filtered, matching the aggregate form which produces no group. */
  def signaturesOf(corpus: DataFrame): DataFrame = {
    val sig = graft.functions.MinHashSig.minhashSig(
      col("text"), Portable.ShingleN, A, B, Portable.P)
    corpus
      .select(col("doc_id"), sig.as("sig"))
      .filter(element_at(col("sig"), 1) =!= Long.MaxValue)
      .select(col("doc_id") +:
        (0 until K).map(k => element_at(col("sig"), k + 1).as(s"mh_$k")): _*)
  }

  def signatures(spark: SparkSession, dir: String): DataFrame =
    signaturesOf(augmented(spark, dir))

  private val signaturesSql: String = s"""
    SELECT doc_id, ${(0 until K).map(minhashColSql).mkString(",\n           ")}
    FROM s
    GROUP BY doc_id"""

  /** LSH candidate pairs → exact-Jaccard verification (j ≥ 0.5).
    * The LSH part is the 100 TB path: an equi-join on (band, band
    * signature) instead of an all-pairs comparison; the verify join then
    * touches only candidate docs. */
  def ddMinhashLsh(spark: SparkSession, dir: String): DataFrame =
    minhashLshPairs(augmented(spark, dir))

  /** The LSH near-dup stage over an arbitrary (doc_id, text) corpus —
    * the unit [[ddMinhashLsh]] runs on the augmented corpus and
    * [[ddPipeline]] runs on exact-dedup survivors. */
  def minhashLshPairs(corpus: DataFrame): DataFrame = {
    // persisted for the self-join's two consumers — 4 short rows per doc
    val banded = graft.Caches.persist(bandedRowsOf(corpus))
    // exact verification on the candidate set only
    verifyPairs(selfBandCandidates(banded), shingleRowsOf(corpus))
  }

  /** LSH candidate pairs of ONE band relation (doc_id, band, sig)
    * against itself — the equi-self-join at the heart of
    * [[minhashLshPairs]], factored out so consumers holding a PERSISTED
    * band relation ([[softDedupIncremental]]'s stored history state)
    * probe it without re-banding the corpus. */
  private def selfBandCandidates(banded: DataFrame): DataFrame = {
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** Cross candidates between two band relations — history side id_a,
    * batch side id_b (disjoint id ranges by the ingest contract, so no
    * orientation filter is needed). The history side is the PERSISTED
    * relation; only the batch side was banded this ingest. */
  private def crossBandCandidates(histBands: DataFrame,
      batchBands: DataFrame): DataFrame =
    histBands.select(col("doc_id").as("id_a"), col("band"), col("sig"))
      .join(batchBands.select(col("doc_id").as("id_b"), col("band"), col("sig")),
        Seq("band", "sig"))
      .select(col("id_a"), col("id_b")).distinct()

  /** (doc_id, band, sig) LSH band rows of a corpus — band signature =
    * concat of the R member hashes; ONE posexplode pass (a per-band
    * union would re-run the signature computation once per band per
    * join side). Shared by the self-join ([[minhashLshPairs]]) and the
    * cross-join ([[crossNearDupPairs]]) so the two can never band
    * differently. */
  private def bandedRowsOf(corpus: DataFrame): DataFrame = {
    val sigCols = (0 until BANDS).map { bnd =>
      concat_ws("_", (bnd * R until (bnd + 1) * R).map(k => col(s"mh_$k")): _*)
    }
    signaturesOf(corpus)
      .select(col("doc_id"), posexplode(array(sigCols: _*)).as(Seq("band", "sig")))
  }

  /** Cross-corpus near-dup — the daily-ingest shape for NEAR duplicates,
    * the MinHash twin of [[ddIncremental]]'s exact-digest probe: band
    * the (huge) history and the (small) new batch separately and join
    * ONLY across the two sides, so the C(|history|,2) intra-history
    * candidate mass a full [[minhashLshPairs]] over history ∪ batch
    * would generate never materializes — per-ingest cost is batch
    * bands ⋈ history collisions, not history². Output: one row per
    * (history doc, batch doc) near-dup pair; intra-batch duplicates are
    * deliberately out of scope (run the within-batch dedup first, then
    * probe survivors — the [[ddPipeline]] composition order).
    *
    * Caller contract: history and batch doc_ids are disjoint, with
    * every history id below every batch id (the append-only ingest
    * convention the streaming stores state for batch ids) — that makes
    * cross-banding provably equal to the full self-join FILTERED to
    * cross pairs (orientation a < b puts the history doc first), which
    * is exactly how the oracle states it.
    *
    * 100 TB shape: the history band relation is computed once per
    * corpus refresh and persisted BUCKETED on (band, sig) (the
    * [[graft.operators.AnnIndex]] posture at the text tier — probes
    * then plan Exchange-free on the history side); the batch side is
    * ingest-sized, so AQE broadcasts it. Verification joins shingle
    * hashes back by id for candidate docs only. */
  def crossNearDupPairs(history: DataFrame, batch: DataFrame): DataFrame = {
    val h = bandedRowsOf(history)
      .select(col("doc_id").as("id_a"), col("band"), col("sig"))
    val b = bandedRowsOf(batch)
      .select(col("doc_id").as("id_b"), col("band"), col("sig"))
    val candidates = h.join(b, Seq("band", "sig"))
      .select(col("id_a"), col("id_b")).distinct()
    verifyPairs(candidates, shingleRowsOf(history.unionByName(batch)))
  }

  /** Gated query: cross near-dup over the augmented corpus split at the
    * planted-variant boundary — base docs (< 10000) are the history,
    * the appended near-dup variants (≥ 10000) the new batch. Oracle:
    * the FULL [[ddMinhashLshSql]] chain filtered to cross pairs, so the
    * hash compare proves cross-banding ≡ self-join-then-filter (no
    * cross pair lost, no intra-side pair invented). */
  def ddCrossNearDup(spark: SparkSession, dir: String): DataFrame = {
    val aug = graft.Caches.persist(augmented(spark, dir))
    crossNearDupPairs(
      aug.filter(col("doc_id") < 10000),
      aug.filter(col("doc_id") >= 10000))
  }

  val ddCrossNearDupSql: String = s"""
    WITH aug AS ($augmentedSql),
    ${lshCtesSql("aug")}
    SELECT id_a, id_b, jaccard FROM lsh_pairs
    WHERE id_a < 10000 AND id_b >= 10000
    ORDER BY id_a, id_b"""

  /** Exact hashed-shingle-Jaccard verification of candidate pairs
    * (id_a, id_b) against a shingle-hash relation (doc_id, h) — the
    * verify stage shared verbatim by the batch LSH dedup and the
    * streaming near-dup pipeline's foreachBatch
    * ([[graft.streaming.StreamingPipeline.startNearDupVerify]]). */
  def verifyPairs(candidates: DataFrame, s: DataFrame,
                  threshold: Double = 0.5): DataFrame = {
    val common = candidates
      .join(s.withColumnRenamed("doc_id", "id_a"), "id_a")
      .join(s.withColumnRenamed("doc_id", "id_b").withColumnRenamed("h", "h_b"), "id_b")
      .filter(col("h") === col("h_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"))
    jaccardFinalize(common, s, threshold)
  }

  /** CTE chain of the LSH stage over the named corpus CTE, ending in a
    * `lsh_pairs` CTE — shared verbatim by [[ddMinhashLshSql]],
    * [[ddPipelineSql]] and [[ddCurateSql]] so every composed oracle IS
    * the unit oracle with a different input. */
  private def lshCtesSql(corpus: String): String = {
    val bandSelects = (0 until BANDS).map { bnd =>
      val sig = (bnd * R until (bnd + 1) * R).map(k => s"mh_$k").mkString(" || '_' || ")
      s"SELECT doc_id, $bnd AS band, $sig AS sig FROM sigs"
    }.mkString("\n      UNION ALL\n      ")
    s"""s AS (${shingleRowsSqlOf(corpus)}),
    sigs AS ($signaturesSql),
    banded AS (
      $bandSelects),
    candidates AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
    sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM s GROUP BY doc_id),
    common AS (
      SELECT id_a, id_b, COUNT(*) AS n_common
      FROM candidates c
      JOIN s sa ON sa.doc_id = c.id_a
      JOIN s sb ON sb.doc_id = c.id_b AND sb.h = sa.h
      GROUP BY id_a, id_b),
    lsh_pairs AS (
      SELECT id_a, id_b,
             CAST(n_common AS DOUBLE) / (na.n_shingles + nb.n_shingles - n_common) AS jaccard
      FROM common
      JOIN sizes na ON na.doc_id = id_a
      JOIN sizes nb ON nb.doc_id = id_b
      WHERE CAST(n_common AS DOUBLE) / (na.n_shingles + nb.n_shingles - n_common) >= 0.5)"""
  }

  private def lshTailSql(corpus: String): String = s"""${lshCtesSql(corpus)}
    SELECT id_a, id_b, jaccard FROM lsh_pairs
    ORDER BY id_a, id_b"""

  val ddMinhashLshSql: String = s"""
    WITH aug AS ($augmentedSql),
    ${lshTailSql("aug")}"""

  /** Oracle for the near-dup pipeline erasure gate
    * ([[graft.streaming.StreamingGates.streamNearDupDelete]]): the SAME
    * LSH chain over the corpus minus the erased docs — verified pairs
    * are pairwise-local (banding only generates candidates; the exact
    * shingle jaccard decides), so erase-then-continue must equal
    * never-ingested on the survivors. */
  def ddMinhashLshExcludingSql(pred: String): String = s"""
    WITH aug AS (SELECT * FROM ($augmentedSql) WHERE NOT ($pred)),
    ${lshTailSql("aug")}"""

  // ------------------------------------------------ composed dedup pipeline

  /** Corpus for the composed pipeline: augmented ∪ EXACT copies of docs
    * 25..49 (doc_id + 20000, body unchanged). The augmented corpus holds
    * no exact duplicates, so without planted copies exact-dedup-first
    * would be a no-op and the composition untested. */
  def pipelineCorpus(spark: SparkSession, dir: String): DataFrame = {
    val copies = Tables.documents(spark, dir)
      .filter(col("doc_id") >= 25 && col("doc_id") < 50)
      .select((col("doc_id") + 20000).as("doc_id"), col("text"))
    augmented(spark, dir).unionByName(copies)
  }

  /** Exact-dedup survivors: one row per distinct body, smallest doc_id
    * kept. The groupBy shuffles (digest, doc_id) — 128-bit digests,
    * never bodies; the left-semi join then filters the corpus by keeper
    * id (bodies shuffled once, by id, only for rows that survive). */
  def survivors(corpus: DataFrame): DataFrame = {
    val keep = corpus
      .groupBy(md5(col("text")).as("digest"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    corpus.join(keep, Seq("doc_id"), "left_semi")
  }

  /** The production composition SCALING.md mandates: near-dup OUTPUT is
    * quadratic in exact-duplicate cluster size (a k-fold copy cluster
    * yields C(k,2) pairs no matter the index), so exact dedup runs FIRST
    * and LSH near-dup sees survivors only. Survivors are persisted — the
    * LSH stage consumes its corpus twice (signatures + shingles), and
    * re-running the dedup digest groupBy per consumer would double the
    * heaviest scan. */
  def ddPipeline(spark: SparkSession, dir: String): DataFrame =
    minhashLshPairs(graft.Caches.persist(survivors(pipelineCorpus(spark, dir))))

  /** The `pipe` corpus CTE shared by every pipeline-composition oracle
    * (mirrors [[pipelineCorpus]]). */
  private[operators] val pipeSql: String = """
    pipe AS (
      SELECT doc_id, text FROM aug
      UNION ALL
      SELECT doc_id + 20000 AS doc_id, text FROM documents
      WHERE doc_id >= 25 AND doc_id < 50)"""

  val ddPipelineSql: String = s"""
    WITH aug AS ($augmentedSql),
    $pipeSql,
    keep AS (SELECT min(doc_id) AS doc_id FROM pipe GROUP BY md5(text)),
    surv AS (SELECT p.doc_id, p.text FROM pipe p JOIN keep USING (doc_id)),
    ${lshTailSql("surv")}"""

  // --------------------------------------------- incremental (batch-vs-history)

  /** Incremental exact dedup — the daily-ingest shape: a small new batch
    * arrives against a huge historical corpus, and HISTORY MUST NOT
    * SHUFFLE. The plan scans history exactly once against the broadcast
    * batch-digest set to extract the (tiny, ≤ |batch|) set of digests
    * that already exist, then anti-joins the batch against that set —
    * both joins broadcast, the only shuffle is the within-batch
    * keep-min-doc_id groupBy over batch rows. At 100 TB of history the
    * cost is one history scan (or far less: a production digest store is
    * a bucketed table on `digest`, turning the probe into a pruned
    * merge join — see [[graft.sources.Bucketing]]).
    *
    * Returns the batch rows that survive: not an exact copy of any
    * history doc, and the smallest doc_id among in-batch copies. */
  def incrementalDedup(history: DataFrame, batch: DataFrame): DataFrame = {
    val bd = graft.Caches.persist(
      batch.select(col("doc_id"), md5(col("text")).as("digest")))
    val matched = history.select(md5(col("text")).as("digest"))
      .join(broadcast(bd.select(col("digest")).distinct()), Seq("digest"), "left_semi")
      .distinct()
    bd.join(broadcast(matched), Seq("digest"), "left_anti")
      .groupBy(col("digest")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("digest"))
      .orderBy(col("doc_id"))
  }

  /** Gated query: history = the base corpus (doc_id < 10000), batch =
    * the augmented variants (10xxx, near-dups but not exact copies —
    * survive) plus the planted exact copies (20xxx — dropped). */
  def ddIncremental(spark: SparkSession, dir: String): DataFrame = {
    val corpus = pipelineCorpus(spark, dir)
    incrementalDedup(
      history = corpus.filter(col("doc_id") < 10000),
      batch = corpus.filter(col("doc_id") >= 10000))
  }

  val ddIncrementalSql: String = s"""
    WITH aug AS ($augmentedSql),
    $pipeSql,
    hist AS (SELECT DISTINCT md5(text) AS digest FROM pipe WHERE doc_id < 10000),
    batch AS (SELECT doc_id, md5(text) AS digest FROM pipe WHERE doc_id >= 10000),
    fresh AS (SELECT * FROM batch WHERE digest NOT IN (SELECT digest FROM hist))
    SELECT min(doc_id) AS doc_id, digest FROM fresh
    GROUP BY digest ORDER BY doc_id"""

  // ------------------------------------- persisted digest-store dedup

  /** PERSISTED HISTORY DIGEST ARTIFACT for ingest-time exact dedup —
    * the build-once/probe-daily form of [[incrementalDedup]] for the
    * scale where the history digest set neither broadcasts nor should
    * be recomputed per ingest (at 100 TB the distinct digest relation
    * is itself billions of rows). Two probe layers, cheapest first:
    *
    *   1. a serialized BLOOM FILTER over the digests' 60-bit hashes
    *      (`_graft_digest_bloom`, [[graft.operators.BloomJoin]]'s
    *      membership-sketch regime: keys fit a broadcastable bitmap
    *      when the rows do not). Bloom-NEGATIVE batch rows — the bulk
    *      of a typical ingest — are definitely fresh and never join
    *      anything: they die into the output inside the scan's
    *      codegen stage;
    *   2. the digest relation as a BUCKETED snapshot on `digest`
    *      ([[graft.streaming.BucketedFamily]]): the bloom-positive
    *      tail (true duplicates + ~fpp leak) anti-joins it with NO
    *      Exchange on the corpus-sized side. False positives die in
    *      this exact anti-join, so the bloom is a pure pruning layer —
    *      the gate's oracle is [[ddIncrementalSql]] itself, and the
    *      hash compare proves artifact-probe ≡ in-query recompute. */
  private val DigestRel = ("digests", "digest STRING")
  private val DigestBloomFile = "_graft_digest_bloom"
  val DigestBloomFpp = 0.01

  def digestStoreBuild(history: DataFrame, storeDir: String): Unit = {
    val spark = history.sparkSession
    val dir = s"$storeDir/${DigestRel._1}"
    val digests = graft.Caches.persist(
      history.select(md5(col("text")).as("digest")).distinct())
    graft.streaming.StreamingPipeline.ensureSchemaCompat(spark, dir, DigestRel._2)
    graft.streaming.BucketedFamily.publishSnapshot(spark, dir, digests, 0L,
      graft.streaming.BucketedFamily.BucketSpec(Seq("digest"), GeoBuckets))
    // auto-sized like BloomJoin.pruneFactKeysAuto: a pinned capacity
    // saturates at scale and silently stops pruning
    val bf = digests.select(Portable.hash60(col("digest")).as("h"))
      .stat.bloomFilter("h", math.max(digests.count(), 1L), DigestBloomFpp)
    val p = new org.apache.hadoop.fs.Path(storeDir, DigestBloomFile)
    val out = p.getFileSystem(spark.sessionState.newHadoopConf()).create(p, true)
    try bf.writeTo(out) finally out.close()
  }

  private def readDigestBloom(spark: SparkSession, storeDir: String)
      : org.apache.spark.util.sketch.BloomFilter = {
    val p = new org.apache.hadoop.fs.Path(storeDir, DigestBloomFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p),
      s"no $DigestBloomFile under $storeDir — not a digestStoreBuild " +
        "artifact; rebuild rather than probing without the prune layer")
    val in = fs.open(p)
    try org.apache.spark.util.sketch.BloomFilter.readFrom(in)
    finally in.close()
  }

  /** One ingest's fresh rows against the persisted digest store —
    * never recomputes, rescans, or shuffles the history side. */
  def incrementalDedupFromStore(spark: SparkSession, storeDir: String,
      batch: DataFrame): DataFrame = {
    val bd = graft.Caches.persist(
      batch.select(col("doc_id"), md5(col("text")).as("digest")))
    val bc = spark.sparkContext.broadcast(readDigestBloom(spark, storeDir))
    val might = graft.functions.BloomMightContainLong.mightContain(
      Portable.hash60(col("digest")), bc)
    val store = graft.streaming.BucketedFamily
      .readSnapshot(spark, s"$storeDir/${DigestRel._1}", DigestRel._2)
      .getOrElse(sys.error(
        s"no committed digest snapshot under $storeDir"))._1
    val fresh = bd.filter(!might).unionByName(
      bd.filter(might).join(store, Seq("digest"), "left_anti"))
    fresh.groupBy(col("digest")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("digest"))
      .orderBy(col("doc_id"))
  }

  /** Gated query: [[ddIncremental]]'s corpus split, THROUGH the
    * persisted artifact (bloom + bucketed digest snapshot). Same
    * oracle as `dd_incremental`, so the hash compare proves the
    * two-layer probe loses nothing and invents nothing. */
  def ddIncrementalStore(spark: SparkSession, dir: String): DataFrame = {
    val corpus = pipelineCorpus(spark, dir)
    val storeDir = graft.TmpDirs.create("graft_digeststore_")
    digestStoreBuild(corpus.filter(col("doc_id") < 10000), storeDir)
    incrementalDedupFromStore(spark, storeDir,
      corpus.filter(col("doc_id") >= 10000))
  }

  val ddIncrementalStoreSql: String = ddIncrementalSql

  // ------------------------------------------------------- decontamination

  /** Benchmark decontamination — the training-data hygiene op: drop every
    * corpus document that shares ANY n-gram (hashed shingle) with a
    * benchmark/eval document, so evaluation data cannot leak into
    * training data through near-verbatim inclusion. Exact-copy matching
    * is not enough (a contaminated doc usually embeds the benchmark text
    * inside other content), hence n-gram overlap, the standard
    * decontamination predicate.
    *
    * Scale shape: the benchmark set is small (thousands of docs) — its
    * hashed-shingle relation BROADCASTS. One scan of the corpus explodes
    * shingle hashes (8-byte longs, in-kernel per-doc dedup), a broadcast
    * semi-join marks contaminated doc_ids, and a broadcast anti-join
    * keeps the rest. No corpus shuffle at all. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame): DataFrame = {
    val benchShingles = shingleRowsOf(benchmark).select(col("h")).distinct()
    val contaminated = shingleRowsOf(corpus)
      .join(broadcast(benchShingles), Seq("h"), "left_semi")
      .select(col("doc_id")).distinct()
    // NO broadcast hint on the contaminated set: it is bounded by the
    // CORPUS, not the benchmark — widely-syndicated benchmark text (the
    // common real contamination mode) can mark a large id set, and a
    // forced broadcast would OOM the driver. AQE broadcasts it when it
    // is actually small and shuffles otherwise.
    corpus.join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Gated query: benchmark = base docs 25..49 (stand-in eval set);
    * candidates = the ingest batch (doc_id ≥ 10000). Their variants
    * (10025..10049) and exact copies (20025..20049) share shingles with
    * the benchmark and are dropped, along with any batch doc colliding
    * on a 4-gram of the low-entropy corpus vocabulary — all mirrored
    * exactly by the oracle. */
  def ddDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val corpus = pipelineCorpus(spark, dir)
    decontaminate(
      corpus = corpus.filter(col("doc_id") >= 10000),
      benchmark = corpus.filter(col("doc_id") >= 25 && col("doc_id") < 50))
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }

  val ddDecontaminateSql: String = s"""
    WITH aug AS ($augmentedSql),
    $pipeSql,
    bench AS (
      SELECT DISTINCT h FROM (${shingleRowsSqlOf(
        "(SELECT * FROM pipe WHERE doc_id >= 25 AND doc_id < 50)")})),
    batch AS (SELECT doc_id, text FROM pipe WHERE doc_id >= 10000),
    bs AS (${shingleRowsSqlOf("batch")}),
    contaminated AS (SELECT DISTINCT doc_id FROM bs JOIN bench USING (h))
    SELECT doc_id FROM batch
    WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ORDER BY doc_id"""

  /** GRADED contamination: per doc, the fraction of its distinct shingle
    * hashes that appear in the benchmark set — the report a release
    * review wants ("how contaminated, by how much") where
    * [[decontaminate]] is the binary drop. Same scale shape: benchmark
    * shingles broadcast, corpus shingles left-join them without
    * shuffling (the per-doc aggregate shuffles only (doc_id, two
    * longs)). Docs shorter than the shingle width have no shingles and
    * no row — they cannot be n-gram-contaminated. */
  def contaminationScore(corpus: DataFrame, benchmark: DataFrame): DataFrame = {
    val benchShingles = shingleRowsOf(benchmark).select(col("h")).distinct()
      .withColumn("hit", lit(1L))
    shingleRowsOf(corpus)
      .join(broadcast(benchShingles), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        coalesce(sum(col("hit")), lit(0L)).as("n_hit"))
      .select(col("doc_id"), col("n_shingles"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_shingles")).as("contamination"))
  }

  /** Gated query: same corpus/benchmark split as [[ddDecontaminate]],
    * scored instead of dropped. */
  def ddContamination(spark: SparkSession, dir: String): DataFrame = {
    val corpus = pipelineCorpus(spark, dir)
    contaminationScore(
      corpus = corpus.filter(col("doc_id") >= 10000),
      benchmark = corpus.filter(col("doc_id") >= 25 && col("doc_id") < 50))
      .orderBy(col("doc_id"))
  }

  val ddContaminationSql: String = s"""
    WITH aug AS ($augmentedSql),
    $pipeSql,
    bench AS (
      SELECT DISTINCT h FROM (${shingleRowsSqlOf(
        "(SELECT * FROM pipe WHERE doc_id >= 25 AND doc_id < 50)")})),
    batch AS (SELECT doc_id, text FROM pipe WHERE doc_id >= 10000),
    bs AS (${shingleRowsSqlOf("batch")})
    SELECT bs.doc_id,
           COUNT(*) AS n_shingles,
           CAST(COALESCE(SUM(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_hit,
           CAST(COALESCE(SUM(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END), 0)
                AS DOUBLE) / COUNT(*) AS contamination
    FROM bs LEFT JOIN bench b ON bs.h = b.h
    GROUP BY bs.doc_id
    ORDER BY bs.doc_id"""

  // ------------------------------------------------------ curation pipeline

  /** Minimum whitespace-token count for the curation quality gate. */
  val CurateMinWords = 20

  /** The END-TO-END training-data curation pipeline — every gated family
    * composed in production order, as one plan:
    *
    *  1. QUALITY GATE (token-count floor) first: a narrow projection, so
    *     the cheapest filter runs before anything that shuffles.
    *  2. EXACT dedup (digest groupBy): removes copy clusters BEFORE
    *     near-dup, whose output is otherwise quadratic in cluster size.
    *  3. DECONTAMINATION against the benchmark/eval set — broadcast-only;
    *     note the benchmark docs themselves leave the corpus here (they
    *     trivially share every shingle with themselves), which is exactly
    *     eval-set removal.
    *  4. NEAR-DUP removal: verified MinHash-LSH pairs, drop EVERY doc
    *     that appears as the larger side of any verified pair. Slightly
    *     more aggressive than sequential greedy keep-first on chains —
    *     for pairs (a,b),(b,c) with no (a,c), greedy would keep c once
    *     b is gone, this drops both b and c. The set-based form is the
    *     one that distributes (no sequential pass over pairs), and
    *     over-removal is the safe direction for training data.
    *  5. PII REDACTION over the survivors' text, fused into the final
    *     projection.
    *
    * Output: (doc_id, clean_md5) of the curated corpus. The DuckDB
    * oracle mirrors every stage, so the whole composition — not just the
    * pieces — is hash-checked. */
  /** The curated corpus with its REDACTED text — the shared tail of the
    * curation chain, projected two ways: [[ddCurate]] hashes it for the
    * gate, [[ddCuratePack]] carries it on into split+pack. */
  def curatedDocs(spark: SparkSession, dir: String): DataFrame = {
    val corpus = pipelineCorpus(spark, dir)
    val benchmark = corpus.filter(col("doc_id") >= 25 && col("doc_id") < 50)
    val quality = corpus.filter(
      size(Portable.words(col("text"))) >= CurateMinWords)
    val clean = graft.Caches.persist(
      decontaminate(survivors(quality), benchmark))
    // no broadcast hint: the drop set scales with near-dup density, not
    // a fixed small relation — AQE decides (see decontaminate)
    val dropIds = minhashLshPairs(clean)
      .select(col("id_b").as("doc_id")).distinct()
    clean.join(dropIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"),
        TextAnalysis.redact(col("text")).as("clean_text"))
  }

  def ddCurate(spark: SparkSession, dir: String): DataFrame =
    curatedDocs(spark, dir)
      .select(col("doc_id"), md5(col("clean_text")).as("clean_md5"))
      .orderBy(col("doc_id"))

  val ddCurateSql: String = s"""
    WITH aug AS ($augmentedSql),
    $pipeSql,
    q AS (
      SELECT doc_id, text FROM pipe
      WHERE len(string_split(text, ' ')) >= $CurateMinWords),
    keep AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
    surv AS (SELECT q.doc_id, q.text FROM q JOIN keep USING (doc_id)),
    bench AS (
      SELECT DISTINCT h FROM (${shingleRowsSqlOf(
        "(SELECT * FROM pipe WHERE doc_id >= 25 AND doc_id < 50)")})),
    ss AS (${shingleRowsSqlOf("surv")}),
    contaminated AS (SELECT DISTINCT doc_id FROM ss JOIN bench USING (h)),
    cleanc AS (
      SELECT * FROM surv
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
    ${lshCtesSql("cleanc")}
    SELECT doc_id, md5(${TextAnalysis.redactSql("text")}) AS clean_md5
    FROM cleanc
    WHERE doc_id NOT IN (SELECT id_b FROM lsh_pairs)
    ORDER BY doc_id"""

  /** END-TO-END training-data pipeline, hash-checked as ONE oracle:
    * quality gate → exact dedup → decontamination → LSH near-dup
    * removal → PII redaction ([[curatedDocs]]) → content-fingerprint
    * split assignment (the [[TextAnalysis.txSplitAssign]] law, applied
    * to the REDACTED text) → GPT-style sequence packing of the train
    * split ([[Pack.packByOrder]], two-phase cumsum). The output is the
    * artifact a trainer actually consumes: every train document's
    * packed position. One hash compare proves the entire DAG — seven
    * stages across three operator families — lands byte-identically
    * where the declarative oracle says it must. */
  def ddCuratePack(spark: SparkSession, dir: String): DataFrame = {
    val curated = curatedDocs(spark, dir)
    val bucket = pmod(Portable.hash60(
      concat(lit("split:"), md5(TextAnalysis.normText(col("clean_text"))))), lit(100L))
    // persisted: packByOrder's two-phase cumsum pulls a bounds scalar
    // BEFORE building the final plan — unpersisted, that first action
    // would re-execute the entire curation chain (measured: 7.7 s vs
    // 4.6 s for the cached form at sf0.1)
    val train = graft.Caches.persist(curated
      .filter(bucket < 80)
      .select(col("doc_id"),
        regexp_count(col("clean_text"), lit("[A-Za-z0-9]+"))
          .cast("long").as("n_tokens")))
    Pack.packByOrder(train, "doc_id", "n_tokens", Pack.GateBudget)
      .select(col("doc_id"), col("n_tokens"), col("cum_excl"),
        col("seq_id"), col("seq_offset"), col("n_splits"))
      .orderBy(col("doc_id"))
  }

  val ddCuratePackSql: String = s"""
    WITH aug AS ($augmentedSql),
    $pipeSql,
    q AS (
      SELECT doc_id, text FROM pipe
      WHERE len(string_split(text, ' ')) >= $CurateMinWords),
    keep AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
    surv AS (SELECT q.doc_id, q.text FROM q JOIN keep USING (doc_id)),
    bench AS (
      SELECT DISTINCT h FROM (${shingleRowsSqlOf(
        "(SELECT * FROM pipe WHERE doc_id >= 25 AND doc_id < 50)")})),
    ss AS (${shingleRowsSqlOf("surv")}),
    contaminated AS (SELECT DISTINCT doc_id FROM ss JOIN bench USING (h)),
    cleanc AS (
      SELECT * FROM surv
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
    ${lshCtesSql("cleanc")},
    curated AS (
      SELECT doc_id, ${TextAnalysis.redactSql("text")} AS clean_text
      FROM cleanc
      WHERE doc_id NOT IN (SELECT id_b FROM lsh_pairs)),
    train AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(clean_text, '[A-Za-z0-9]+')) AS BIGINT)
               AS n_tokens
      FROM curated
      WHERE ((${Portable.hash60Sql(
        s"('split:' || md5(${TextAnalysis.normTextSql("clean_text")}))")}
              % 100) + 100) % 100 < 80),
    c AS (
      SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_excl
      FROM train)
    SELECT doc_id, n_tokens, cum_excl,
           cum_excl // ${Pack.GateBudget} AS seq_id,
           cum_excl % ${Pack.GateBudget} AS seq_offset,
           CASE WHEN n_tokens = 0 THEN 0
                ELSE (cum_excl + n_tokens - 1) // ${Pack.GateBudget}
                     - cum_excl // ${Pack.GateBudget}
           END AS n_splits
    FROM c ORDER BY doc_id"""

  /** THE RELEASE CAPSTONE — [[ddCuratePack]]'s sibling for the export
    * half of a training run: the same five-stage curation
    * ([[curatedDocs]]: quality gate → exact dedup → decontamination →
    * LSH near-dup removal → PII redaction), then the corpus-wide
    * deterministic shuffle ([[Pack.globalShuffle]] — training order),
    * then the size-balanced shard manifest over that order
    * ([[Pack.shardManifest]] — what a consumer checks before training).
    * SEVEN stages across three operator families, hash-checked as ONE
    * oracle: the manifest digests are XORs of the redacted texts'
    * hashes, so a single doc wrongly kept, dropped, or mis-sharded
    * anywhere in the DAG flips a digest cell.
    *
    * The curated relation is persisted for the same reason
    * [[ddCuratePack]] persists its train slice: both the shuffle's
    * hash-bounds scalar and the manifest's cumsum bounds are ACTIONS
    * pulled before the final plan — unpersisted, each would re-execute
    * the whole curation chain. */
  def ddCurateRelease(spark: SparkSession, dir: String): DataFrame = {
    val curated = graft.Caches.persist(curatedDocs(spark, dir))
    val pos = Pack.globalShuffle(curated, "clean_text", "doc_id")
      .select(col("doc_id"), col("position"))
    // localCheckpoint, NOT persist: the position relation is a window
    // over a bucketed join above the curated cache, and derived plans
    // on a persist of that shape re-executed the chain on every action
    // (cache lookup missed; measured ~3 s per action, 33 s total at
    // sf0.1). The eager RDD-level checkpoint truncates lineage so the
    // manifest's bounds scalar and final aggregate both rescan 3.9k
    // checkpointed rows (measured: release = curation + ~4 s, was 33 s).
    val withPos = graft.Caches.track(
      curated.join(pos, "doc_id").localCheckpoint(true))
    // the EAGER checkpoint above just materialized everything downstream
    // reads; holding the curation chain's cached blocks through the
    // manifest aggregate is pure heap pressure (the 10-21 s run-to-run
    // breathing SCALING.md recorded) — free them here, blocking, so the
    // final stage starts from a quiet heap
    curated.unpersist(true)
    Pack.shardManifest(withPos, "clean_text", "position", Pack.ShardTokens)
  }

  val ddCurateReleaseSql: String = s"""
    WITH aug AS ($augmentedSql),
    $pipeSql,
    q AS (
      SELECT doc_id, text FROM pipe
      WHERE len(string_split(text, ' ')) >= $CurateMinWords),
    keep AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
    surv AS (SELECT q.doc_id, q.text FROM q JOIN keep USING (doc_id)),
    bench AS (
      SELECT DISTINCT h FROM (${shingleRowsSqlOf(
        "(SELECT * FROM pipe WHERE doc_id >= 25 AND doc_id < 50)")})),
    ss AS (${shingleRowsSqlOf("surv")}),
    contaminated AS (SELECT DISTINCT doc_id FROM ss JOIN bench USING (h)),
    cleanc AS (
      SELECT * FROM surv
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
    ${lshCtesSql("cleanc")},
    curated AS (
      SELECT doc_id, ${TextAnalysis.redactSql("text")} AS clean_text
      FROM cleanc
      WHERE doc_id NOT IN (SELECT id_b FROM lsh_pairs)),
    toks AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(clean_text, '[A-Za-z0-9]+')) AS BIGINT)
               AS n_tokens,
             ${Portable.hash60Sql("clean_text")} AS h
      FROM curated),
    pos AS (
      SELECT doc_id, n_tokens, h,
             CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) - 1 AS BIGINT)
               AS position
      FROM toks),
    c AS (
      SELECT position, n_tokens, h,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY position
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_excl
      FROM pos)
    SELECT cum_excl // ${Pack.ShardTokens} AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           MIN(position) AS first_doc,
           MAX(position) AS last_doc,
           BIT_XOR(h) AS digest
    FROM c GROUP BY shard_id ORDER BY shard_id"""

  // ------------------------------------------------- semantic curation

  /** Perplexity-gate ceiling for [[ddCurateSemantic]], in mean
    * millibits/transition under the corpus bigram LM
    * ([[TextAnalysis.bigramScores]]). 4450 sits past the synthetic
    * corpus's p95 (scores span ~4000–5000 across the driver's scale
    * factors), so the gate drops a real high-surprisal tail at every
    * tested sf without gutting the corpus — the CCNet posture of
    * cutting the worst tail, as a pinned constant so the oracle can
    * mirror it. */
  val CurateSemanticMaxMillibits = 4450L

  /** EMBEDDING-AWARE curation capstone, hash-checked as ONE oracle:
    * perplexity gate → exact-substring dedup → semantic dedup.
    *
    *  1. PERPLEXITY GATE: score every document under the corpus's OWN
    *     bigram LM ([[TextAnalysis.bigramScores]], whole-bit integer
    *     surprisal) and drop docs above
    *     [[CurateSemanticMaxMillibits]] mean millibits/transition —
    *     the CCNet recipe with the corpus standing in for the external
    *     LM. Docs too short to score (< 2 words) drop with the
    *     unscorable tail.
    *  2. EXACT-SUBSTRING DEDUP ([[substringDedup]], Lee et al.
    *     ExactSubstr) over the survivors: every token inside a ≥
    *     [[SUB_W]]-token substring repeated among SURVIVORS is removed
    *     (gating first means a dropped doc's text no longer poisons
    *     survivors' window counts — the stage order is semantic, not
    *     cosmetic).
    *  3. SEMANTIC DEDUP: cosine near-dup graph over the survivors'
    *     embeddings ([[Similarity.nearDupPairsOf]] — banding over the
    *     filtered slice, not the whole catalog table), connected
    *     components, one representative (min id) kept per cluster.
    *     Docs with no embedding row pass through — embed-a-subset is
    *     the realistic 100 TB posture.
    *
    * Output: (doc_id, clean_md5, n_removed). This is the capstone that
    * crosses the text/embedding boundary: [[ddCurate]] composes five
    * text stages; this one proves the engine composes a corpus-LM
    * filter, alignment-free dedup, and an embedding-space graph into
    * one hash-exact DAG. Scale shape: every stage is the gated unit
    * operator's plan — nothing new shuffles. */
  def ddCurateSemantic(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val keep = TextAnalysis.bigramScores(docs)
      .filter(col("mean_millibits") <= CurateSemanticMaxMillibits)
      .select(col("doc_id"))
    val q = docs.join(keep, "doc_id")
    val cleaned = graft.Caches.persist(substringDedup(q, SUB_W))
    val e = Tables.embeddings(spark, dir)
      .join(cleaned.select(col("doc_id").as("vec_id")), "vec_id")
      .select(col("vec_id"), col("embedding"))
    val pairs = Similarity.nearDupPairsOf(e)
    val drop = Cluster.connectedComponents(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as("doc_id"))
    cleaned.join(drop, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), md5(col("clean_text")).as("clean_md5"),
        col("n_removed"))
      .orderBy(col("doc_id"))
  }

  // lazy: SUB_W is declared further down the object; an eager val here
  // would interpolate its pre-init 0 into the window arithmetic
  // (silently producing `ws[i:(i + -1)]` — caught by the oracle gate)
  lazy val ddCurateSemanticSql: String = s"""
    WITH RECURSIVE d AS (SELECT doc_id, text FROM documents),
    ${TextAnalysis.bigramScoreCtesOf("d")},
    q AS (
      SELECT d.doc_id, d.text FROM d JOIN perdoc USING (doc_id)
      WHERE perdoc.sum_bits * 1000 // perdoc.n_bigrams
              <= $CurateSemanticMaxMillibits),
    ${substringCleanCtesOf("q")},
    e AS (
      SELECT em.vec_id, em.embedding
      FROM embeddings em JOIN clean c ON em.vec_id = c.doc_id),
    ${Similarity.neardupCtesAfterE},
    ${Portable.closureLabelsSql("nd_pairs", "vec_id", prefix = "sem_")},
    sem_drop AS (
      SELECT vec_id FROM sem_labels WHERE vec_id <> cluster_id)
    SELECT doc_id, md5(clean_text) AS clean_md5, n_removed
    FROM clean
    WHERE doc_id NOT IN (SELECT vec_id FROM sem_drop)
    ORDER BY doc_id"""

  // ---------------------------------------------------------------- SimHash

  /** 60-bit SimHash over word tokens: bit j of the signature is the sign
    * of Σ_tokens (bit_j(hash60(token)) ? +1 : −1). One doc = one row, so
    * the signature is a NARROW PROJECTION via the codegen'd
    * [[graft.functions.SimHash60]] kernel — no token explode, no
    * aggregation, zero shuffle. The mergeable
    * [[graft.functions.SimHashAgg]] form stays available for inputs
    * where a document spans rows (identical arithmetic; the SQL oracle
    * keeps the explicit per-bit form). */
  def simhashes(spark: SparkSession, dir: String): DataFrame =
    augmented(spark, dir)
      .select(col("doc_id"),
        graft.functions.SimHash60.simhash60(col("text")).as("simhash"))

  private val simhashesSql: String = """
    SELECT doc_id,
           CAST(SUM(CASE WHEN w > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash
    FROM (
      SELECT doc_id, j,
             SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS w
      FROM toks, range(60) r(j)
      GROUP BY doc_id, j)
    GROUP BY doc_id"""

  /** SimHash banding: the 60-bit signature split into SIM_BANDS
    * contiguous 12-bit chunks, with MULTI-PROBE for exhaustive recall.
    * Plain banding (agree exactly on some chunk) guarantees a candidate
    * only for hamming < SIM_BANDS; measured recall on this corpus at
    * hamming ≤ 12 was 0.35 — two thirds of true pairs have their
    * differing bits spread over every chunk. Multi-probe closes that: a
    * pair within hamming ≤ 12 has, by pigeonhole, some chunk differing
    * in ≤ ⌊12/5⌋ = [[SIM_PROBE_DIST]] bits, so ONE join side also
    * probes every chunk value within hamming 2 of its own (1+12+66 = 79
    * XOR masks per chunk). Candidate generation stays an EQUI-join on
    * (band, chunk) — never all-pairs — and the candidate set provably
    * covers the full hamming ≤ 12 pair set, so the DuckDB oracle is the
    * clean quadratic formulation rather than a banding mirror (recall
    * ≡ 1.0 is asserted against the all-pairs baseline in
    * `ExtensionSpec`). The price of exactness: probe-side inflation is
    * 79× on a 20-byte relation (linear in n), and random-collision
    * candidates carry an n²·(79/4096) term per band — cheap to verify
    * (two-long bit_count) but real; ScaleProbe measured 5.2× wall-clock
    * at 10× data. At larger corpora shrink the radius (plain banding is
    * already exact for hamming < 5 at zero probe cost) or re-split to
    * fewer, wider chunks (see SCALING.md). */
  val SIM_BANDS = 5
  val SIM_BAND_BITS = 12
  val SIM_PROBE_DIST = 2

  /** XOR masks enumerating the hamming ≤ `dist` neighborhood of a
    * 12-bit chunk (dist 0 → 1 mask, 1 → 13, 2 → 79; distinct masks give
    * distinct probes, so no within-band double-count). */
  private def probeMasks(dist: Int): Seq[Long] = {
    require(dist >= 0 && dist <= SIM_PROBE_DIST, s"probe distance $dist unsupported")
    val singles = (0 until SIM_BAND_BITS).map(1L << _).map(_.toLong)
    val doubles = for {
      i <- 0 until SIM_BAND_BITS; j <- i + 1 until SIM_BAND_BITS
    } yield (1L << i) | (1L << j)
    0L +: (Seq(singles, doubles).take(dist).flatten)
  }

  /** EXACTLY the signature pairs at Hamming distance ≤ `radius`, by
    * 5×12-bit banding with hamming-⌊radius/5⌋ multi-probe — exhaustive
    * by pigeonhole for any radius (< 5 needs zero probes, ≤ 9 one-bit
    * probes ×13, ≤ 14 two-bit probes ×79). The RADIUS IS THE COST KNOB:
    * the random-candidate term is n²·(probes/2^12) per band, so
    * tightening the radius at bigger corpora (or re-splitting to wider
    * chunks) holds candidate density — see SCALING.md. Shuffle cost
    * O(docs·SIM_BANDS·probes) over a narrow relation, never O(docs²). */
  def simhashPairs(spark: SparkSession, dir: String, radius: Int): DataFrame = {
    val masks = probeMasks(radius / SIM_BANDS)
    val chunks = (0 until SIM_BANDS).map(bnd =>
      shiftright(col("simhash"), bnd * SIM_BAND_BITS)
        .bitwiseAND(lit((1L << SIM_BAND_BITS) - 1)))
    // persisted: both sides of the self-join consume it (otherwise each
    // side re-runs the md5-per-token signature pass)
    val banded = graft.Caches.persist(simhashes(spark, dir)
      .select(col("doc_id"), col("simhash"),
        posexplode(array(chunks: _*)).as(Seq("band", "chunk"))))
    // probe side: every chunk value within hamming ⌊radius/5⌋
    val probed = banded.select(col("doc_id"), col("simhash"), col("band"),
      explode(array(masks.map(m =>
        col("chunk").bitwiseXOR(lit(m))): _*)).as("chunk"))
    val a = probed.as("a"); val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
        col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming",
        expr("cast(bit_count(a.simhash ^ b.simhash) as int)"))
      .filter(col("hamming") <= radius)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"), col("hamming"))
      .distinct() // a pair can collide in several (band, probe) cells
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Gated: the loose radius (12) — two-bit probes. */
  def ddSimhash(spark: SparkSession, dir: String): DataFrame =
    simhashPairs(spark, dir, radius = 12)

  /** Gated: the tight radius (4) — plain banding, ZERO probe inflation
    * (pigeonhole: 4 differing bits cannot touch all 5 chunks). The
    * config a 100× corpus runs when the loose radius's n² random-
    * candidate term bites. */
  def ddSimhashR4(spark: SparkSession, dir: String): DataFrame =
    simhashPairs(spark, dir, radius = 4)

  /** Multi-probe banding is recall-exhaustive at the given radius, so
    * the oracle states the SEMANTICS (all pairs within hamming radius),
    * not the plan — DuckDB's quadratic join and Spark's probed
    * equi-join must produce identical pair sets. */
  private def simhashPairsSql(radius: Int): String = s"""
    WITH aug AS ($augmentedSql),
    toks AS (
      SELECT doc_id, ${Portable.hash60Sql("tok")} AS h
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM aug)),
    sh AS ($simhashesSql)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sh a JOIN sh b
      ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= $radius
    ORDER BY id_a, id_b"""

  val ddSimhashSql: String = simhashPairsSql(12)
  val ddSimhashR4Sql: String = simhashPairsSql(4)

  // ------------------------------------------------------ dedup clustering

  /** Duplicate GROUPS, not pairs: connected components over the
    * LSH-verified near-dup pairs ([[ddMinhashLsh]]), labeling every
    * clustered doc with the min doc_id of its component
    * ([[Cluster.connectedComponents]]). This is the step that makes
    * dedup deletion correct: with pairs (a,b) and (b,c) but not (a,c),
    * pair-wise deletion keeps two of the three docs — component-wise
    * keeps exactly one representative per group. Output: one row per
    * doc that appears in any verified pair. */
  def ddCluster(spark: SparkSession, dir: String): DataFrame = {
    val pairs = minhashLshPairs(augmented(spark, dir))
    Cluster.connectedComponents(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      .select(col("id").as("doc_id"), col("cluster_id"))
      .orderBy(col("doc_id"))
  }

  /** Same clustering through [[Cluster.connectedComponentsAlternating]]
    * (large-star/small-star contraction) — gated against the SAME oracle
    * as [[ddCluster]], so the driver's hash compare proves the two CC
    * algorithms land on identical labels, not just "both plausible". */
  def ddClusterAltstar(spark: SparkSession, dir: String): DataFrame = {
    val pairs = minhashLshPairs(augmented(spark, dir))
    Cluster.connectedComponentsAlternating(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      .select(col("id").as("doc_id"), col("cluster_id"))
      .orderBy(col("doc_id"))
  }

  /** The oracle states the SEMANTICS (min reachable id in the undirected
    * pair graph) via a recursive transitive closure — quadratic in
    * component size, fine for an oracle; the engine's label propagation
    * must land on identical labels. */
  val ddClusterSql: String = s"""
    WITH RECURSIVE aug AS ($augmentedSql),
    ${lshCtesSql("aug")},
    ${Portable.closureLabelsSql("lsh_pairs", "doc_id")}
    SELECT doc_id, cluster_id FROM labels ORDER BY doc_id"""

  /** QUALITY-ranked survivor selection — the production policy
    * [[ddCluster]]'s min-id representative stands in for: within each
    * near-dup cluster keep the HIGHEST-quality member (the composite
    * [[TextAnalysis.quality]] score the `tx_quality_score` gate proves
    * bit-identical across engines), ties broken by doc_id. Min-id is
    * an arbitrary-but-deterministic placeholder; real curation keeps
    * the longest/cleanest duplicate and deletes the rest — this gate
    * pins that policy end to end (clustering ∘ scoring ∘ per-cluster
    * argmax) under one oracle hash.
    *
    * Scale shape: everything up to the rank is [[ddCluster]]'s plan;
    * the quality score is one narrow codegen'd projection; the rank
    * window partitions by `cluster_id` over CLUSTER-sized groups
    * (bounded by near-dup cluster size — and exact-dedup-first keeps
    * those small, the [[ddPipeline]] composition argument), never the
    * corpus. */
  def ddClusterKeepBest(spark: SparkSession, dir: String): DataFrame = {
    val aug = graft.Caches.persist(augmented(spark, dir))
    val pairs = minhashLshPairs(aug)
    val labels = Cluster.connectedComponents(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      .select(col("id").as("doc_id"), col("cluster_id"))
    val scored = aug.select(col("doc_id"),
      graft.operators.TextAnalysis.quality.as("quality"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("quality").desc, col("doc_id"))
    labels.join(scored, "doc_id")
      .withColumn("rk", row_number().over(w))
      .select(col("doc_id"), col("cluster_id"), col("quality"),
        (col("rk") === 1).as("keep"))
      .orderBy(col("doc_id"))
  }

  val ddClusterKeepBestSql: String = s"""
    WITH RECURSIVE aug AS ($augmentedSql),
    ${lshCtesSql("aug")},
    ${Portable.closureLabelsSql("lsh_pairs", "doc_id")},
    scored AS (
      SELECT doc_id, ${graft.operators.TextAnalysis.qualitySql("text")} AS quality
      FROM aug),
    ranked AS (
      SELECT l.doc_id, l.cluster_id, s.quality,
             row_number() OVER (PARTITION BY l.cluster_id
                                ORDER BY s.quality DESC, l.doc_id) AS rk
      FROM labels l JOIN scored s USING (doc_id))
    SELECT doc_id, cluster_id, quality, rk = 1 AS keep
    FROM ranked ORDER BY doc_id"""

  // --------------------------------------------------------- span dedup

  /** Span width for the gated query. Real text at 100 TB wants wider
    * spans (C4 removes three-SENTENCE spans); the synthetic corpus has a
    * ~30-word vocabulary, so 3-word blocks are the narrowest width where
    * cross-doc collisions actually occur (30³ combinations vs ~10⁴
    * corpus blocks) while wider blocks collide never — the knob, not
    * the algorithm, is corpus-dependent. */
  val SPAN_W = 3

  /** C4-style span-level dedup (Raffel et al. 2020 §2.2 discard any
    * three-sentence span occurring more than once in the corpus),
    * adapted to word blocks: cut each doc into non-overlapping W-word
    * blocks, count every block's occurrences across the WHOLE corpus,
    * drop blocks occurring more than once (both copies — boilerplate,
    * not content), and reassemble each doc from its kept blocks in
    * order. Unlike doc-level dedup this rewrites documents, removing
    * repeated boilerplate embedded in otherwise-unique pages.
    *
    * Scale shape: the block relation is ~tokens/W rows; the occurrence
    * count is one hash-partitioned aggregate with map-side combine, the
    * dup check is an equi-join on the block string, and reassembly is a
    * per-doc collect_list whose size is bounded by doc length. Nothing
    * is quadratic and nothing is driver-side. */
  def spanDedup(docs: DataFrame, w: Int): DataFrame = {
    // the split is materialized as a column FIRST: transform/slice are
    // interpreted higher-order functions with no subexpression hoisting,
    // so an inline split(text) inside the lambda would re-split the
    // whole doc per block — O(words²/W) per doc
    val ws = col("ws")
    val nblocks = ceil(size(ws).cast("double") / w).cast("int")
    val blocks = graft.Caches.persist(
      docs.withColumn("ws", Portable.words(col("text")))
        .select(col("doc_id"),
          explode(transform(sequence(lit(0), nblocks - 1),
            i => struct(i.as("pos"),
              array_join(slice(ws, i * w + 1, lit(w)), " ").as("blk")))).as("b"))
        .select(col("doc_id"), col("b.pos").as("pos"), col("b.blk").as("blk")))
    val counts = blocks.groupBy(col("blk"))
      .agg(count(lit(1)).as("cnt"))
    blocks.join(counts, Seq("blk"))
      .groupBy(col("doc_id"))
      .agg(
        coalesce(
          array_join(transform(
            array_sort(collect_list(
              when(col("cnt") === 1, struct(col("pos"), col("blk"))))),
            s => s.getField("blk")), " "),
          lit("")).as("clean_text"),
        sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_removed"))
      .orderBy(col("doc_id"))
  }

  def ddSpanDedup(spark: SparkSession, dir: String): DataFrame =
    spanDedup(augmented(spark, dir), SPAN_W)

  val ddSpanDedupSql: String = s"""
    WITH aug AS ($augmentedSql),
    wsplit AS (SELECT doc_id, ${Portable.wordsSql("text")} AS ws FROM aug),
    pos AS (
      SELECT doc_id, ws,
             unnest(range(0, CAST(ceil(len(ws) / $SPAN_W.0) AS BIGINT))) AS pos
      FROM wsplit),
    b AS (
      SELECT doc_id, pos,
             array_to_string(ws[(pos * $SPAN_W + 1):(pos * $SPAN_W + $SPAN_W)], ' ') AS blk
      FROM pos),
    c AS (SELECT blk, COUNT(*) AS cnt FROM b GROUP BY blk)
    SELECT b.doc_id,
           COALESCE(string_agg(CASE WHEN cnt = 1 THEN blk END, ' ' ORDER BY pos), '')
             AS clean_text,
           CAST(COALESCE(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_removed
    FROM b JOIN c USING (blk)
    GROUP BY b.doc_id
    ORDER BY b.doc_id"""

  // ---------------------------------------------------- substring dedup

  /** Window width (tokens) for the gated exact-substring dedup. Lee et
    * al. use 50 BPE tokens on natural text; the synthetic ~30-word
    * vocabulary makes 6-word windows already collision-free for
    * unrelated docs while the planted near-dup variants share hundreds
    * of aligned windows — same knob-vs-algorithm note as [[SPAN_W]]. */
  val SUB_W = 6

  /** Exact repeated-SUBSTRING dedup at arbitrary alignment (Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models Better" —
    * the ExactSubstr recipe, there built on a corpus suffix array):
    * remove every token that lies inside some ≥`w`-token substring
    * occurring more than once in the corpus. [[spanDedup]]'s
    * non-overlapping blocks miss a repeated span that straddles a block
    * boundary (any alignment shift hides it); OVERLAPPING windows make
    * the guarantee alignment-free: a substring of length ≥ w repeats
    * iff each of its w-token windows repeats, so "token covered by a
    * duplicated window" ⟺ "token inside a maximal repeated substring
    * of length ≥ w" — exact semantics, no suffix array needed.
    *
    * Scale shape (the suffix-array replacement argument): the window
    * relation is ~tokens rows but shuffles only (doc_id, pos, 60-bit
    * window hash) — never window STRINGS; the duplicate test is one
    * map-side-combined count over hashes; coverage explodes each
    * duplicated window to ≤ w token positions (duplicate-volume-, not
    * corpus-, sized); reassembly is the [[spanDedup]] per-doc
    * collect_list, bounded by doc length. Nothing quadratic, nothing
    * driver-side, and a distributed suffix array is never built — at
    * 10¹² corpus windows the 60-bit hash space incurs ~n²/2⁶¹ chance
    * collisions marking a non-repeated window as repeated; the
    * `verify = true` mode of [[substringDedup]] closes exactly that gap
    * with one string equi-join on the colliding hashes only (the
    * candidates-then-verify posture of [[ddMinhashLsh]]). The gated
    * query keeps the hash form because both engines hash identically;
    * [[ddSubstringVerify]] gates the verify path against the same
    * from-scratch oracle, and DedupSpec plants a synthetic collision
    * the verify mode survives and the hash form over-deletes. */
  /** (doc_id, pos, h): all overlapping w-token windows of a tokenized
    * corpus (`ws` column present), hashed BEFORE any shuffle. Guard:
    * Spark's sequence(1, 0) counts DOWN (cf. Portable.shingles), so
    * sub-w docs need the explicit empty case. */
  private[operators] def windowRows(tokenized: DataFrame, w: Int,
                                    hash: Column => Column = Portable.hash60): DataFrame = {
    val ws = col("ws")
    tokenized
      .select(col("doc_id"),
        explode(when(size(ws) < w, array().cast("array<int>"))
          .otherwise(sequence(lit(1), size(ws) - (w - 1)))).as("pos"),
        ws)
      .select(col("doc_id"), col("pos"),
        hash(array_join(slice(ws, col("pos"), lit(w)), " ")).as("h"))
  }

  /** Removal tail on explicit window POSITIONS: mark every token covered
    * by a (doc_id, pos) in `dupWins`, reassemble per doc. `tokenized`
    * carries `ws`. */
  private def removeAt(tokenized: DataFrame, dupWins: DataFrame,
                       w: Int): DataFrame = {
    val covered = dupWins
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (w - 1))).as("tpos"))
      .distinct()
      .withColumn("rm", lit(true))
    val toks = tokenized
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("i0", "tok")))
      .select(col("doc_id"), (col("i0") + 1).as("tpos"), col("tok"))
    toks.join(covered, Seq("doc_id", "tpos"), "left")
      .withColumn("rm", coalesce(col("rm"), lit(false)))
      .groupBy(col("doc_id"))
      .agg(
        coalesce(array_join(transform(
          array_sort(collect_list(
            when(!col("rm"), struct(col("tpos"), col("tok"))))),
          s => s.getField("tok")), " "), lit("")).as("clean_text"),
        sum(when(col("rm"), 1L).otherwise(0L)).as("n_removed"))
      .orderBy(col("doc_id"))
  }

  /** Shared removal tail: mark every token covered by a window whose
    * hash is in `dup`, reassemble per doc. `tokenized` carries `ws`. */
  private def removeCovered(tokenized: DataFrame, wins: DataFrame,
                            dup: DataFrame, w: Int): DataFrame =
    removeAt(tokenized,
      wins.join(dup, "h").select(col("doc_id"), col("pos")), w)

  /** (doc_id, pos, h, s): window STRINGS re-derived ONLY for windows
    * whose hash is in `candHashes` — the collision-verify stage's input.
    * The corpus-wide window relation ([[windowRows]]) never carries
    * strings; candidate positions are pruned FIRST (a hash-only
    * left-semi join), then each candidate doc's token array moves once
    * to re-slice its colliding windows. String volume is candidate-,
    * not corpus-window-, sized — the candidates-then-verify posture. */
  private[operators] def substringCollisionCandidates(
      base: DataFrame, wins: DataFrame, candHashes: DataFrame,
      w: Int): DataFrame = {
    val candPos = wins.join(candHashes, Seq("h"), "left_semi")
    candPos.join(base.select(col("doc_id"), col("ws")), Seq("doc_id"))
      .select(col("doc_id"), col("pos"), col("h"),
        array_join(slice(col("ws"), col("pos"), lit(w)), " ").as("s"))
  }

  /** Exact-substring dedup; see the ExactSubstr scaladoc above.
    *
    * `verify = false` (the gated form) treats equal 60-bit window
    * hashes as equal windows — exact while the corpus stays well under
    * ~2³⁰ windows. `verify = true` is the production-exact deployment
    * for 10¹²-window corpora: hash-colliding windows (count > 1) are
    * re-verified by their exact STRINGS, so a chance 60-bit collision
    * between two distinct windows no longer over-deletes either. Only
    * colliding windows' strings are ever materialized or shuffled
    * ([[substringCollisionCandidates]]); the expected extra cost at
    * n ≪ 2⁶⁰ is the duplicate volume itself, nothing corpus-sized.
    * `hash` is injectable so tests can plant collisions (a real 60-bit
    * collision is not constructible on demand); production callers
    * leave the default. */
  def substringDedup(docs: DataFrame, w: Int, verify: Boolean = false,
                     hash: Column => Column = Portable.hash60): DataFrame = {
    val base = graft.Caches.persist(
      docs.withColumn("ws", Portable.words(col("text"))))
    val wins = graft.Caches.persist(windowRows(base, w, hash))
    val dup = wins.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1).select(col("h"))
    if (!verify) removeCovered(base, wins, dup, w)
    else {
      // persisted: the (h, s) duplicate count and the semi-join probe
      // side both consume the candidate relation
      val cand = graft.Caches.persist(
        substringCollisionCandidates(base, wins, dup, w))
      val dupWins = cand.join(
        cand.groupBy(col("h"), col("s")).agg(count(lit(1)).as("c"))
          .filter(col("c") > 1).select(col("h"), col("s")),
        Seq("h", "s"), "left_semi")
        .select(col("doc_id"), col("pos"))
      removeAt(base, dupWins, w)
    }
  }

  def ddSubstringDedup(spark: SparkSession, dir: String): DataFrame =
    substringDedup(augmented(spark, dir), SUB_W)

  /** Gated query: the collision-VERIFY path over the same corpus. With
    * the production 60-bit hash and a test-scale corpus no collision
    * exists, so the verify path must reproduce the hash form's result
    * bit-for-bit — the gate proves the verify plumbing (candidate
    * prune → string re-derive → exact-string count → positional
    * removal) is a no-op exactly when it should be. The collision
    * SEMANTICS (survive a planted collision the hash form over-deletes
    * on) are DedupSpec's job; no SQL oracle can state them because
    * DuckDB hashes identically. */
  def ddSubstringVerify(spark: SparkSession, dir: String): DataFrame =
    substringDedup(augmented(spark, dir), SUB_W, verify = true)

  /** Build + persist the (h, cnt) window-count index of a base corpus —
    * the state that makes substring dedup INCREMENTAL. At 100 TB the
    * index is corpus-windows-sized but 16 bytes/row; write it bucketed
    * by h (cf. [[graft.sources.Bucketing]]) and the per-batch merge
    * join below plans Exchange-free on the index side. */
  /** (h, cnt) window-count relation of a corpus — the index delta a
    * batch contributes. */
  def substringWindowCounts(docs: DataFrame, w: Int): DataFrame =
    windowRows(docs.withColumn("ws", Portable.words(col("text"))), w)
      .groupBy(col("h")).agg(count(lit(1)).as("cnt"))

  def buildSubstringIndex(spark: SparkSession, docs: DataFrame, w: Int,
                          path: String): DataFrame = {
    substringWindowCounts(docs, w).write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** Incremental substring dedup — the streaming-ingest semantic of
    * [[Dedup.ddIncremental]] applied to ExactSubstr: dedup ONLY the
    * appended batch, where "duplicated window" means duplicated in
    * base ∪ append (append count + indexed base count > 1). For the
    * appended docs this is EXACTLY the from-scratch full-corpus
    * result — the gate proves it by sharing the from-scratch oracle
    * restricted to the appended ids — without ever rescanning the base
    * corpus: per batch the work is batch windows + one merge join
    * against the index. A window of a BASE doc newly duplicated by the
    * append changes that base doc's clean text only under re-dedup;
    * like every append-only ingest, retroactive cleaning is a separate
    * backfill pass — [[substringDedupBackfill]], driven off the
    * positional index. */
  def substringDedupIncremental(appendDocs: DataFrame, index: DataFrame,
                                w: Int): DataFrame = {
    val base = graft.Caches.persist(
      appendDocs.withColumn("ws", Portable.words(col("text"))))
    val wins = graft.Caches.persist(windowRows(base, w))
    val dup = wins.groupBy(col("h")).agg(count(lit(1)).as("cnt_a"))
      .join(index.select(col("h"), col("cnt").as("cnt_b")), Seq("h"), "left")
      .filter(col("cnt_a") + coalesce(col("cnt_b"), lit(0L)) > 1)
      .select(col("h"))
    removeCovered(base, wins, dup, w)
  }

  /** Fixed artifact location of the gated incremental gate's window
    * index — the `/tmp/graft_artifacts` convention of
    * [[graft.operators.Bpe.DictArtifactPath]]/Pca/QualityClassifier, so
    * the bench's warmup+3 timed runs overwrite ONE index copy instead
    * of leaking a fresh temp dir per invocation. SINGLE-WRITER
    * assumption (shared by every fixed-path artifact gate): the
    * driver's verify and bench mains run sequentially in one JVM; two
    * CONCURRENT JVMs would race overwrite-vs-lazy-read on this path.
    * Production callers pass their own (job-scoped, e.g. run-id-
    * suffixed) path to [[buildSubstringIndex]] — the fixed constant is
    * the GATE's path, not a library default. */
  val SubstringIndexArtifactPath = "/tmp/graft_artifacts/substr_idx"

  /** Gated query: index the original documents, then incrementally
    * dedup the appended near-dup variants against base ∪ append. */
  def ddSubstringIncremental(spark: SparkSession, dir: String): DataFrame = {
    val aug = augmented(spark, dir)
    val idx = buildSubstringIndex(
      spark, aug.filter(col("doc_id") < 10000), SUB_W, SubstringIndexArtifactPath)
    substringDedupIncremental(aug.filter(col("doc_id") >= 10000), idx, SUB_W)
  }

  /** Build + persist the POSITIONAL window index (doc_id, pos, h) of a
    * base corpus — the postings relation the retroactive backfill pass
    * prunes by (the (h, cnt) count index says a window crossed into
    * duplication; only the positional index can say WHICH base docs own
    * it). Corpus-windows-sized at 20 bytes/row; at 100 TB write it
    * bucketed by h so the crossed-hash semi-join below plans
    * Exchange-free, exactly the [[buildSubstringIndex]] note. */
  def buildSubstringPosIndex(spark: SparkSession, docs: DataFrame, w: Int,
                             path: String): DataFrame = {
    windowRows(docs.withColumn("ws", Portable.words(col("text"))), w)
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** Retroactive BACKFILL for the append-only ingest: re-clean exactly
    * the base docs owning a window whose merged (base ∪ append) count
    * CROSSED 1 — unique in base (cnt = 1), duplicated by the append.
    * Those are the only base docs whose [[substringDedup]] output under
    * merged counts differs from their base-time result: a window with
    * base count ≥ 2 was already removed when the base was deduped, and
    * one absent from the append kept its base count. Everything is
    * pruned through the indexes — crossed hashes from the two count
    * relations, affected doc ids from the positional index, the docs'
    * text via one semi-join, their windows straight off the positional
    * index (never re-windowed) — so the pass's cost is
    * affected-doc-sized and the base corpus is NEVER rescanned. For the
    * affected docs the output is bit-equal to the from-scratch
    * full-corpus dedup restricted to their ids, which is what the gate
    * states in SQL. */
  def substringDedupBackfill(baseDocs: DataFrame, posIndex: DataFrame,
                             baseCounts: DataFrame, appendCounts: DataFrame,
                             w: Int): DataFrame = {
    val crossed = baseCounts.filter(col("cnt") === 1)
      .join(appendCounts, Seq("h"), "left_semi")
      .select(col("h"))
    val affected = posIndex.join(crossed, Seq("h"), "left_semi")
      .select(col("doc_id")).distinct()
    val docs = graft.Caches.persist(
      baseDocs.join(affected, Seq("doc_id"), "left_semi")
        .withColumn("ws", Portable.words(col("text"))))
    val wins = graft.Caches.persist(
      posIndex.join(affected, Seq("doc_id"), "left_semi"))
    val mergedDup = baseCounts.select(col("h"), col("cnt"))
      .unionByName(appendCounts.select(col("h"), col("cnt")))
      .groupBy(col("h")).agg(sum(col("cnt")).as("cnt"))
      .filter(col("cnt") > 1).select(col("h"))
    removeCovered(docs, wins, mergedDup, w)
  }

  /** Fixed artifact location of the gated backfill's positional index
    * (same convention as [[SubstringIndexArtifactPath]]). */
  val SubstringPosIndexArtifactPath = "/tmp/graft_artifacts/substr_pos_idx"

  /** Gated query: positional-index the original documents, then
    * backfill-clean the base docs newly duplicated by the appended
    * near-dup variants. Completes the incremental story: appends are
    * cleaned forward by [[ddSubstringIncremental]], the base is cleaned
    * backward by this pass, and base ∪ append ends bit-equal to the
    * from-scratch dedup of the merged corpus. */
  def ddSubstringBackfill(spark: SparkSession, dir: String): DataFrame = {
    val aug = augmented(spark, dir)
    val base = aug.filter(col("doc_id") < 10000)
    val posIdx = buildSubstringPosIndex(
      spark, base, SUB_W, SubstringPosIndexArtifactPath)
    val baseCounts = posIdx.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
    val appCounts = substringWindowCounts(
      aug.filter(col("doc_id") >= 10000), SUB_W)
    substringDedupBackfill(base, posIdx, baseCounts, appCounts, SUB_W)
  }

  /** The full from-scratch dedup as a CTE body ending in relation
    * `clean` — shared by the from-scratch gate and the incremental
    * gate's restricted oracle. */
  /** The ExactSubstr CTE chain from a named (doc_id, text) relation to
    * `clean(doc_id, clean_text, n_removed)` — parameterized by source so
    * composed oracles (semantic curation) can dedup a filtered slice. */
  private[operators] def substringCleanCtesOf(src: String): String = s"""
    t AS (SELECT doc_id, ${Portable.wordsSql("text")} AS ws FROM $src),
    win AS (
      SELECT doc_id, i AS pos,
             ${Portable.hash60Sql(s"array_to_string(ws[i:(i + ${SUB_W - 1})], ' ')")} AS h
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - ${SUB_W - 2})) AS i
            FROM t)),
    dup AS (SELECT h FROM win GROUP BY h HAVING COUNT(*) > 1),
    cov AS (
      SELECT DISTINCT doc_id, pos + o AS tpos
      FROM win JOIN dup USING (h)
           CROSS JOIN (SELECT unnest(range(0, $SUB_W)) AS o)),
    tok AS (
      SELECT doc_id, i AS tpos, ws[CAST(i AS INT)] AS tok
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM t)),
    flags AS (
      SELECT tok.doc_id, tok.tpos, tok.tok, cov.tpos IS NOT NULL AS rm
      FROM tok LEFT JOIN cov
        ON tok.doc_id = cov.doc_id AND tok.tpos = cov.tpos),
    clean AS (
      SELECT doc_id,
             COALESCE(string_agg(CASE WHEN NOT rm THEN tok END, ' ' ORDER BY tpos), '')
               AS clean_text,
             CAST(SUM(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
      FROM flags GROUP BY doc_id)"""

  private val ddSubstringDedupCore: String = s"""
    WITH aug AS ($augmentedSql),
    ${substringCleanCtesOf("aug")}"""

  val ddSubstringDedupSql: String = s"""
    $ddSubstringDedupCore
    SELECT * FROM clean ORDER BY doc_id"""

  /** Oracle for the incremental gate: the from-scratch full-corpus
    * dedup restricted to the appended ids — the equality the
    * incremental formulation claims. */
  val ddSubstringIncrementalSql: String = s"""
    $ddSubstringDedupCore
    SELECT * FROM clean WHERE doc_id >= 10000 ORDER BY doc_id"""

  /** Oracle for the backfill gate: the from-scratch full-corpus dedup
    * restricted to the AFFECTED base ids — base docs owning a window
    * unique in the base (count = 1) but present in the append. The
    * affected-set definition is stated independently in SQL, so the
    * compare pins both the re-clean arithmetic AND the pruning
    * predicate (a backfill that touched too few docs would come up
    * short on rows; too many, long). */
  val ddSubstringBackfillSql: String = s"""
    $ddSubstringDedupCore,
    bc AS (SELECT h, COUNT(*) AS c FROM win WHERE doc_id < 10000 GROUP BY h),
    crossed AS (
      SELECT h FROM bc
      WHERE c = 1 AND h IN (SELECT h FROM win WHERE doc_id >= 10000)),
    affected AS (
      SELECT DISTINCT doc_id FROM win
      WHERE doc_id < 10000 AND h IN (SELECT h FROM crossed))
    SELECT * FROM clean WHERE doc_id IN (SELECT doc_id FROM affected)
    ORDER BY doc_id"""

  /** Oracle for the STREAMING substring-dedup gate: the prefix-CAUSAL
    * relation itself. Each appended window's visible count = the base
    * corpus's count of its hash + the running per-batch count over
    * batches ≤ its own (batch = (doc_id − 10000) mod 3, mirroring the
    * replay chunking); a token is removed iff some covering window is
    * visible-duplicated. This is deliberately NOT the full-corpus
    * dedup: a window duplicated only by a later batch must leave the
    * earlier doc intact, and the hash compare proves the stream honors
    * exactly that. */
  val streamSubstringDedupSql: String = s"""
    WITH aug AS ($augmentedSql),
    t AS (SELECT doc_id, ${Portable.wordsSql("text")} AS ws FROM aug),
    winb AS (
      SELECT ${Portable.hash60Sql(s"array_to_string(ws[i:(i + ${SUB_W - 1})], ' ')")} AS h,
             COUNT(*) AS cnt
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - ${SUB_W - 2})) AS i
            FROM t WHERE doc_id < 10000)
      GROUP BY 1),
    wina AS (
      SELECT doc_id, i AS pos, (doc_id - 10000) % 3 AS b,
             ${Portable.hash60Sql(s"array_to_string(ws[i:(i + ${SUB_W - 1})], ' ')")} AS h
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - ${SUB_W - 2})) AS i
            FROM t WHERE doc_id >= 10000)),
    cum AS (
      SELECT h, b, SUM(COUNT(*)) OVER (PARTITION BY h ORDER BY b) AS cum
      FROM wina GROUP BY h, b),
    vis AS (
      SELECT w.doc_id, w.pos
      FROM wina w
      JOIN cum ON cum.h = w.h AND cum.b = w.b
      LEFT JOIN winb ON winb.h = w.h
      WHERE COALESCE(winb.cnt, 0) + cum.cum > 1),
    cov AS (
      SELECT DISTINCT doc_id, pos + o AS tpos
      FROM vis CROSS JOIN (SELECT unnest(range(0, $SUB_W)) AS o)),
    tok AS (
      SELECT doc_id, i AS tpos, ws[CAST(i AS INT)] AS tok
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i
            FROM t WHERE doc_id >= 10000)),
    flags AS (
      SELECT tok.doc_id, tok.tpos, tok.tok, cov.tpos IS NOT NULL AS rm
      FROM tok LEFT JOIN cov
        ON tok.doc_id = cov.doc_id AND tok.tpos = cov.tpos)
    SELECT doc_id,
           COALESCE(string_agg(CASE WHEN NOT rm THEN tok END, ' ' ORDER BY tpos), '')
             AS clean_text,
           CAST(SUM(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
    FROM flags GROUP BY doc_id ORDER BY doc_id"""

  /** Oracle for the substring-index ERASURE gate
    * ([[graft.streaming.StreamingGates.streamSubstringDelete]]): the
    * prefix-causal relation of [[streamSubstringDedupSql]] with an
    * erasure between stream batches 1 and 2 (chunk timeline: chunks 0–1
    * ingest, the erase batch decrements, chunk 2 ingests against the
    * decremented index). Per append window in chunk c, the visible
    * count is therefore
    *
    *   c ∈ {0,1}:  ALL base counts + ALL append counts over chunks ≤ c
    *               (the erase has not happened yet — and an output row
    *               emitted then is causal history, EXCEPT the erased
    *               docs' own rows, which the tombstone fold purges);
    *   c = 2:      KEPT base counts + KEPT append counts over chunks ≤ 2
    *               (duplicates of forgotten text must STOP being
    *               suppressed — the property this gate exists to pin).
    *
    * `pred` names the erased doc_ids (base docs and chunk-0/1 append
    * docs only — erased ids never re-arrive). Erased docs are absent
    * from the output rows entirely. */
  def streamSubstringDeleteSql(pred: String): String = s"""
    WITH aug AS ($augmentedSql),
    t AS (SELECT doc_id, ${Portable.wordsSql("text")} AS ws FROM aug),
    er AS (SELECT doc_id FROM aug WHERE $pred),
    winb AS (
      SELECT h, COUNT(*) AS cnt_all,
             SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS cnt_kept
      FROM (
        SELECT ${Portable.hash60Sql(s"array_to_string(ws[i:(i + ${SUB_W - 1})], ' ')")} AS h,
               doc_id NOT IN (SELECT doc_id FROM er) AS kept
        FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - ${SUB_W - 2})) AS i
              FROM t WHERE doc_id < 10000))
      GROUP BY h),
    wina AS (
      SELECT doc_id, i AS pos, (doc_id - 10000) % 3 AS c,
             doc_id NOT IN (SELECT doc_id FROM er) AS kept,
             ${Portable.hash60Sql(s"array_to_string(ws[i:(i + ${SUB_W - 1})], ' ')")} AS h
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - ${SUB_W - 2})) AS i
            FROM t WHERE doc_id >= 10000)),
    aa AS (
      SELECT h, c, COUNT(*) AS n_all,
             SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS n_kept
      FROM wina GROUP BY h, c),
    cum AS (
      SELECT h, c,
             SUM(n_all) OVER (PARTITION BY h ORDER BY c) AS cum_all,
             SUM(n_kept) OVER (PARTITION BY h ORDER BY c) AS cum_kept
      FROM aa),
    vis AS (
      SELECT w.doc_id, w.pos
      FROM wina w
      JOIN cum ON cum.h = w.h AND cum.c = w.c
      LEFT JOIN winb ON winb.h = w.h
      WHERE w.kept AND
        (CASE WHEN w.c < 2 THEN COALESCE(winb.cnt_all, 0) + cum.cum_all
              ELSE COALESCE(winb.cnt_kept, 0) + cum.cum_kept END) > 1),
    cov AS (
      SELECT DISTINCT doc_id, pos + o AS tpos
      FROM vis CROSS JOIN (SELECT unnest(range(0, $SUB_W)) AS o)),
    tok AS (
      SELECT doc_id, i AS tpos, ws[CAST(i AS INT)] AS tok
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i
            FROM t WHERE doc_id >= 10000
              AND doc_id NOT IN (SELECT doc_id FROM er))),
    flags AS (
      SELECT tok.doc_id, tok.tpos, tok.tok, cov.tpos IS NOT NULL AS rm
      FROM tok LEFT JOIN cov
        ON tok.doc_id = cov.doc_id AND tok.tpos = cov.tpos)
    SELECT doc_id,
           COALESCE(string_agg(CASE WHEN NOT rm THEN tok END, ' ' ORDER BY tpos), '')
             AS clean_text,
           CAST(SUM(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
    FROM flags GROUP BY doc_id ORDER BY doc_id"""

  // ------------------------------------------------------------ soft dedup

  /** SOFT DEDUP — duplicate-aware REWEIGHTING instead of removal (the
    * SoftDeDup recipe, He et al. 2024: down-weight common documents in
    * the sampling distribution rather than deleting all but one; hard
    * dedup is the degenerate weight {1, 0, 0, …}). Each doc's
    * "commonness" is the size m of its near-dup component (connected
    * components over the LSH-verified pair graph — the same clusters
    * [[ddCluster]] labels); its sampling weight is 1/m in parts per
    * million, so a cluster's total mass stays ~1 doc regardless of how
    * many copies crawled in, while singletons keep weight 1. All-integer
    * output (ppm), so the gate is hash-exact.
    *
    * Scale shape: pairs/labels/sizes are DUPLICATE-sized relations (docs
    * that appear in some verified pair), not corpus-sized; the only
    * corpus-wide step is one left equi-join attaching labels back, and
    * the weight is a pure projection. Nothing here adds to the LSH
    * pipeline's cost profile. */
  def softDedupWeights(corpus: DataFrame): DataFrame = {
    val pairs = minhashLshPairs(corpus)
    val labels = Cluster.connectedComponents(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      .select(col("id").as("doc_id"), col("cluster_id"))
    val sizes = labels.groupBy(col("cluster_id")).agg(count(lit(1)).as("m"))
    corpus.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .join(sizes, Seq("cluster_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        coalesce(col("m"), lit(1L)).as("multiplicity"))
      .withColumn("weight_ppm", expr("1000000L DIV multiplicity"))
      .orderBy(col("doc_id"))
  }

  def ddSoftDedup(spark: SparkSession, dir: String): DataFrame =
    softDedupWeights(augmented(spark, dir))

  private val softDedupSelectSql: String = s"""
    SELECT a.doc_id,
           COALESCE(l.cluster_id, a.doc_id) AS cluster_id,
           COALESCE(msize.m, 1) AS multiplicity,
           1000000 // COALESCE(msize.m, 1) AS weight_ppm
    FROM aug a
    LEFT JOIN labels l ON l.doc_id = a.doc_id
    LEFT JOIN msize ON msize.cluster_id = l.cluster_id"""

  val ddSoftDedupSql: String = s"""
    WITH RECURSIVE aug AS ($augmentedSql),
    ${lshCtesSql("aug")},
    ${Portable.closureLabelsSql("lsh_pairs", "doc_id")},
    msize AS (SELECT cluster_id, COUNT(*) AS m FROM labels GROUP BY cluster_id)
    $softDedupSelectSql
    ORDER BY a.doc_id"""

  /** The persisted soft-dedup state's layout under one state root —
    * two kinds of durability matched to two growth shapes:
    *
    *   - GEOMETRY (bands, shingles): corpus-sized, append-only — two
    *     delta-store families (`b<k>` dirs, the [[graft.streaming.StreamingPipeline]]
    *     convention) whose compaction snapshots are BUCKETED
    *     ([[graft.streaming.BucketedFamily]]: bands on (band, sig),
    *     shingles on doc_id) so ingest probes plan Exchange-free on
    *     the corpus-sized side. An ingest appends ONLY its batch-sized
    *     plain delta; the history relation is never rewritten between
    *     sweeps ([[softDedupSweep]] folds the delta tail back into the
    *     bucketed snapshot). Delta id = the cluster fold version it
    *     feeds, and the write is mode-overwrite at that id, so a
    *     crashed ingest re-runs idempotently (no duplicated shingle
    *     rows to corrupt Jaccard counts); the duplicate-id guard is
    *     the versioned high-water marker ([[readIdHighWater]]).
    *   - CLUSTERS (labels, sizes): duplicate-sized, mutated by every
    *     fold — one [[graft.streaming.SoftState]] family, both
    *     relations in one atomic leased `v=<fold>` publish (a torn
    *     labels/sizes pair is the failure mode the protocol rules out).
    */
  private[graft] val StateBands = ("geometry_bands", "doc_id BIGINT, band INT, sig STRING")
  private[graft] val StateShingles = ("geometry_shingles", "doc_id BIGINT, h BIGINT")
  private[graft] val StateLabels = ("labels", "doc_id BIGINT, cluster_id BIGINT")
  private[graft] val StateSizes = ("sizes", "cluster_id BIGINT, m BIGINT")
  private def clustersDir(stateDir: String) = s"$stateDir/clusters"

  /** Bucket layout of the persisted geometry families — the 100 TB
    * probe posture ([[crossNearDupPairs]]'s scaladoc, the
    * [[AnnIndex]] discipline at the text tier): the band family hashes
    * on its probe key (band, sig) so an ingest's cross-candidate join
    * plans with NO Exchange on the corpus-sized stored side (only the
    * batch side shuffles to the bucket count, or broadcasts); the
    * shingle family hashes on doc_id so the verify stage's
    * candidate-doc lookups stream off the bucketed scan the same way.
    * 32 buckets at gate scale; production sizes this like any bucketed
    * table (store bytes / executor-memory-sized splits). */
  private val GeoBuckets = 32
  private def geoBucketCols(rel: (String, String)): Seq[String] =
    if (rel == StateBands) Seq("band", "sig") else Seq("doc_id")
  private def geoDir(stateDir: String, rel: (String, String)): String =
    s"$stateDir/${rel._1}"

  /** (bucketed committed snapshot, plain delta tail) of one geometry
    * family. Probe paths consume the halves SEPARATELY — snapshot via
    * its Exchange-free bucketed layout, deltas as batch-sized plain
    * joins — because a Union of the two would erase the snapshot's
    * output partitioning and re-shuffle the corpus per ingest.
    *
    * `upToDelta` is the COMMITTED cluster fold version (delta id = the
    * fold it feeds): a crashed ingest leaves an UNCOMMITTED b(ver+1)
    * in the tail, and reading it as stored history would double the
    * batch's own band/shingle rows on the re-run (self-candidate pairs,
    * inflated Jaccard counts). Restricting the tail to ids ≤ the
    * committed fold makes the crash-rerun read-side idempotent. */
  private def geometryParts(spark: SparkSession, stateDir: String,
      rel: (String, String), upToDelta: Long): (Option[DataFrame], DataFrame) = {
    val dir = geoDir(stateDir, rel)
    (graft.streaming.BucketedFamily.readSnapshot(spark, dir, rel._2).map(_._1),
      graft.streaming.BucketedFamily.deltasAfterSnapshot(spark, dir, rel._2,
        Some(upToDelta)))
  }

  /** Full contents of one geometry family, keeping the snapshot's
    * bucket layout when no delta tail exists (post-sweep, post-erase) —
    * the serving read for paths where partitioning still helps but
    * completeness matters more than the probe plan. Same committed-fold
    * tail restriction as [[geometryParts]]. */
  private def geometryContents(spark: SparkSession, stateDir: String,
      rel: (String, String), upToDelta: Long): DataFrame = {
    val (snap, deltas) = geometryParts(spark, stateDir, rel, upToDelta)
    snap match {
      case Some(s) if graft.streaming.BucketedFamily.fullyCompacted(
        spark, geoDir(stateDir, rel), Some(upToDelta)) => s
      case Some(s) => s.unionByName(deltas)
      case None => deltas
    }
  }

  private def writeGeometryDelta(stateDir: String, rel: (String, String),
      df: DataFrame, deltaId: Long): Unit =
    df.write.mode("overwrite").parquet(s"$stateDir/${rel._1}/b$deltaId")

  /** Publish one geometry family's bucketed snapshot directly (the
    * state BUILD's path — no delta to fold yet, so the corpus is
    * written exactly once, already in probe layout). */
  private def publishGeometrySnapshot(spark: SparkSession, stateDir: String,
      rel: (String, String), df: DataFrame, version: Long): Unit = {
    val dir = geoDir(stateDir, rel)
    graft.streaming.StreamingPipeline.ensureSchemaCompat(spark, dir, rel._2)
    graft.streaming.BucketedFamily.publishSnapshot(spark, dir, df, version,
      graft.streaming.BucketedFamily.BucketSpec(geoBucketCols(rel), GeoBuckets))
  }

  /** INGEST-ORDER ID HIGH-WATER MARK — the cheap guard enforcing the
    * documented disjoint-id ingest contract (without it, re-running a
    * COMPLETED batch would append duplicate band/shingle rows into a
    * new geometry delta and silently corrupt Jaccard counts and cluster
    * sizes). One tiny `_graft_id_highwater_v<fold>` file per cluster
    * fold, stamped with the max ingested doc_id AS OF that fold, so the
    * guard is a marker read + one batch-sized agg — never a corpus
    * scan. Versioning is what makes the guard crash-consistent: a
    * crashed ingest leaves its v+1 marker behind, but the committed
    * cluster version never advanced, so the re-run reads the OLD
    * marker and passes; after a successful publish the new marker
    * gates, so re-ingesting the same batch refuses loudly. */
  private def hwPath(stateDir: String, ver: Long) =
    new org.apache.hadoop.fs.Path(stateDir, s"_graft_id_highwater_v$ver")

  private def writeIdHighWater(spark: SparkSession, stateDir: String,
      ver: Long, hw: Long): Unit = {
    val p = hwPath(stateDir, ver)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(hw.toString.getBytes("UTF-8")) finally out.close()
  }

  private def readIdHighWater(spark: SparkSession, stateDir: String,
      ver: Long): Long = {
    val p = hwPath(stateDir, ver)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p),
      s"soft-dedup state $stateDir carries no id high-water marker for " +
        s"fold $ver — not a softDedupStateBuild artifact (or written by " +
        "a pre-marker build); rebuild the state rather than ingesting " +
        "with the duplicate-id guard disabled")
    val in = fs.open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in),
      "UTF-8").trim.toLong
    finally in.close()
  }

  /** FULL RUN over a history corpus, persisting the soft-dedup state a
    * later [[softDedupIngest]] resumes from: ONE banding pass, ONE
    * shingle pass, history-internal pairs from those two relations, one
    * clustering — geometry lands as delta 0 of its two families, and
    * (labels, sizes) as the single atomic `v=0` cluster snapshot. This
    * is the artifact a production daily-ingest pipeline writes once per
    * corpus refresh; its cost is the full-recompute cost, paid once,
    * never per ingest. */
  def softDedupStateBuild(history: DataFrame, stateDir: String): Unit = {
    val spark = history.sparkSession
    // stamp the complete family set first, so StoreFsck audits the root
    // for drift and a composed erasure can refuse a partial list
    graft.streaming.StreamingPipeline.stampFamilies(spark, stateDir, Seq(
      StateBands._1, StateShingles._1, "clusters"))
    val hist = graft.Caches.persist(history)
    val histBands = graft.Caches.persist(bandedRowsOf(hist))
    val histShingles = shingleRowsOf(hist) // self-persisting
    val histLabels = Cluster.connectedComponents(
        verifyPairs(selfBandCandidates(histBands), histShingles)
          .select(col("id_a").as("src"), col("id_b").as("dst")))
      .select(col("id").as("doc_id"), col("cluster_id"))
    val histSizes = histLabels.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("m"))
    // geometry lands DIRECTLY as the bucketed v=0 snapshot of each
    // family — the very first ingest already probes Exchange-free, and
    // the corpus is written exactly once, in probe layout. The two
    // families are independent relations (both read from cache):
    // publish them concurrently so the second write's jobs back-fill
    // the first one's tail (guide §2.6 / graft.Par)
    graft.Par.run2(
      publishGeometrySnapshot(spark, stateDir, StateBands, histBands, 0L),
      publishGeometrySnapshot(spark, stateDir, StateShingles, histShingles, 0L))
    graft.streaming.SoftState.publish(spark, clustersDir(stateDir), 0L,
      Seq(StateLabels._1 -> histLabels, StateSizes._1 -> histSizes))
    // bounded 1-row scalar: the ingest-contract guard's ceiling
    val hw = hist.agg(max(col("doc_id"))).head()
    writeIdHighWater(spark, stateDir, 0L,
      if (hw.isNullAt(0)) Long.MinValue else hw.getLong(0))
  }

  /** ONE INGEST against a persisted soft-dedup state: every
    * history-sized relation is READ BACK from the store — the history
    * corpus is never re-shingled, re-banded, or re-clustered. New edges
    * are batch-internal candidates (batch band self-join) plus cross
    * candidates (batch bands probing the STORED band relation),
    * verified against the STORED shingles ∪ this batch's shingles,
    * folded into the stored (labels, sizes) via [[foldSoftLabels]].
    * Durability advances in ingest order: batch-sized geometry deltas
    * land first (idempotent at their id), then the cluster fold
    * publishes as the next atomic snapshot — a crash between the two
    * re-runs cleanly from the unadvanced cluster version. Per-ingest
    * cost: batch banding/shingling + band-collision joins +
    * new-edge-sized CC + batch-sized delta writes — never O(history),
    * except the unavoidable history-ID scan of the per-doc weight
    * OUTPUT itself (production pays that projection too: the weights
    * table is corpus-sized by definition). `historyIds`: one (doc_id)
    * column, the corpus registry the weights are served over. */
  def softDedupIngest(stateDir: String, batch: DataFrame,
      historyIds: DataFrame): DataFrame = {
    val spark = batch.sparkSession
    // the whole read-fold-write sequence runs under the state root's
    // MaintenanceLease, like every sibling mutator (sweep, erase,
    // publish): two concurrently scheduled ingests both pass the
    // high-water guard (same committed marker), and the loser's
    // mode-overwrite delta write at b(ver+1) would silently drop the
    // winner's geometry rows while the winner's cluster fold commits —
    // the lease makes the second ingest refuse loudly instead. The
    // nested SoftState.publish lease is the documented re-entrant
    // composed-sweep shape. The committed version is read UNDER the
    // lease, so it cannot move between guard and write.
    graft.streaming.MaintenanceLease.withLease(spark, stateDir) {
    val st = graft.streaming.SoftState
    val clusters = clustersDir(stateDir)
    val ver = st.currentVersion(spark, clusters).getOrElse(
      sys.error(s"softDedupIngest: no committed state under $stateDir — " +
        "run softDedupStateBuild first"))
    val bat = graft.Caches.persist(batch)
    // enforce the disjoint-id ingest contract instead of documenting
    // it: a re-run of a COMPLETED batch (or an id collision) would
    // append duplicate geometry rows and silently corrupt Jaccard
    // counts and cluster sizes. One batch-sized agg (bounded 2-scalar
    // collect) against the committed fold's high-water marker.
    val hw = readIdHighWater(spark, stateDir, ver)
    val ext = bat.agg(min(col("doc_id")), max(col("doc_id"))).head()
    require(ext.isNullAt(0) || ext.getLong(0) > hw,
      s"softDedupIngest: batch min doc_id ${ext.getLong(0)} does not " +
        s"exceed the state's ingested high-water $hw — this batch (or an " +
        "id range overlapping it) was already folded into fold <= " +
        s"$ver; re-ingesting would double its geometry rows")
    val batBands = graft.Caches.persist(bandedRowsOf(bat))
    val batShingles = graft.Caches.persist(shingleRowsOf(bat))
    // candidate pairs: batch-internal collisions, plus the batch
    // probing each stored half SEPARATELY — the bucketed snapshot joins
    // on its (band, sig) layout with NO Exchange on the corpus-sized
    // side (plan-asserted in SoftDedupSpec), and the delta tail (if a
    // sweep has not folded it yet) is batch-sized joins. A single
    // unioned store relation would erase the snapshot's partitioning
    // and re-shuffle the corpus per ingest.
    val (bandSnap, bandDeltas) = geometryParts(spark, stateDir, StateBands, ver)
    val candidates = graft.Caches.persist(
      (Seq(selfBandCandidates(batBands)) ++
        bandSnap.map(s => crossBandCandidates(s, batBands)).toSeq ++
        Seq(crossBandCandidates(bandDeltas, batBands)))
        .reduce(_ unionByName _))
    // verification reads ONLY candidate docs' shingles: each stored
    // half is pre-filtered by a candidate-endpoint semi-join (snapshot
    // side Exchange-free off its doc_id buckets; candidate ids are
    // collision-volume, not corpus-volume), so the corpus-sized shingle
    // relation is never unioned raw into the verify joins
    val candIds = graft.Caches.persist(
      candidates.select(col("id_a").as("doc_id"))
        .unionByName(candidates.select(col("id_b").as("doc_id")))
        .distinct())
    val (shSnap, shDeltas) = geometryParts(spark, stateDir, StateShingles, ver)
    val storedShingles =
      (shSnap.map(s => s.join(candIds, Seq("doc_id"), "left_semi")).toSeq ++
        Seq(shDeltas.join(candIds, Seq("doc_id"), "left_semi")))
        .reduce(_ unionByName _)
    val newEdges = verifyPairs(candidates, storedShingles.unionByName(batShingles))
      .select(col("id_a"), col("id_b"))
    val (labels, sizes) = foldSoftLabels(
      st.read(spark, clusters, StateLabels._1, StateLabels._2),
      st.read(spark, clusters, StateSizes._1, StateSizes._2),
      newEdges)
    // batch-sized, independent, both read from cache — write them
    // concurrently (guide §2.6)
    graft.Par.run2(
      writeGeometryDelta(stateDir, StateBands, batBands, ver + 1L),
      writeGeometryDelta(stateDir, StateShingles, batShingles, ver + 1L))
    // the next fold's high-water BEFORE the cluster publish: a crash
    // between the two leaves a stale v+1 marker the re-run overwrites
    // (committed version still gates), never a committed fold without
    // its guard
    writeIdHighWater(spark, stateDir, ver + 1L,
      if (ext.isNullAt(1)) hw else math.max(hw, ext.getLong(1)))
    st.publish(spark, clusters, ver + 1L,
      Seq(StateLabels._1 -> labels, StateSizes._1 -> sizes))
    softWeightsOf(
      historyIds.unionByName(bat.select(col("doc_id"))),
      st.read(spark, clusters, StateLabels._1, StateLabels._2),
      st.read(spark, clusters, StateSizes._1, StateSizes._2))
    }
  }

  /** TEST HOOK for plan assertions (SoftDedupSpec): the stored-side
    * halves of one ingest probe against the BUCKETED snapshots — the
    * band cross-candidate join and the shingle candidate semi-join —
    * built exactly as [[softDedupIngest]] builds them, returned
    * unexecuted so the spec can pin the Exchange-free plan shape. */
  private[graft] def ingestProbeHalves(spark: SparkSession, stateDir: String,
      batch: DataFrame): (DataFrame, DataFrame) = {
    val batBands = bandedRowsOf(batch)
    val committed = graft.streaming.SoftState
      .currentVersion(spark, clustersDir(stateDir)).getOrElse(0L)
    val bandSnap = geometryParts(spark, stateDir, StateBands, committed)
      ._1.getOrElse(sys.error(s"no committed band snapshot under $stateDir"))
    val cross = crossBandCandidates(bandSnap, batBands)
    val candIds = cross.select(col("id_a").as("doc_id"))
      .unionByName(cross.select(col("id_b").as("doc_id"))).distinct()
    val shSnap = geometryParts(spark, stateDir, StateShingles, committed)
      ._1.getOrElse(sys.error(s"no committed shingle snapshot under $stateDir"))
    (cross, shSnap.join(candIds, Seq("doc_id"), "left_semi"))
  }

  /** ROUTINE MAINTENANCE SWEEP of a persisted soft-dedup state — the
    * one call a production scheduler runs between ingests (the
    * [[graft.streaming.StreamingPipeline.sweepAnnStore]] shape): under
    * the state root's lease, fold each geometry family's accumulated
    * plain deltas into its BUCKETED snapshot at the committed cluster
    * fold boundary (probes go back to one Exchange-free join instead
    * of snapshot + k per-delta joins), and retire superseded id
    * high-water markers. Cluster snapshots need no retention step
    * here — [[graft.streaming.SoftState.publish]] retires superseded
    * versions at every fold. Sweep-neutrality (post-sweep ingest ≡
    * full recompute) is oracle-hashed by `dd_soft_dedup_sweep` and
    * spec-pinned in SoftDedupSpec; run it quiesced between ingests,
    * the [[graft.streaming.StreamingPipeline.compactDeltas]]
    * discipline. */
  def softDedupSweep(spark: SparkSession, stateDir: String): Unit =
    graft.streaming.MaintenanceLease.withLease(spark, stateDir) {
      val sp = graft.streaming.StreamingPipeline
      val ver = graft.streaming.SoftState
        .currentVersion(spark, clustersDir(stateDir)).getOrElse(
          sys.error(s"softDedupSweep: no committed state under $stateDir"))
      // independent family folds, run concurrently (guide §2.6): each
      // acquires its OWN family-dir lease on its thread; the root lease
      // held here stays the single-sweep guard
      graft.Par.run2(
        sp.compactDeltasBucketed(spark, geoDir(stateDir, StateBands),
          StateBands._2, ver, geoBucketCols(StateBands), GeoBuckets),
        sp.compactDeltasBucketed(spark, geoDir(stateDir, StateShingles),
          StateShingles._2, ver, geoBucketCols(StateShingles), GeoBuckets))
      // superseded ingest-guard markers (every fold below the committed
      // one) are retirement residue, exactly like covered deltas
      val root = new org.apache.hadoop.fs.Path(stateDir)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      (0L until ver).foreach { v =>
        fs.delete(hwPath(stateDir, v), false)
      }
    }

  /** DOCUMENT ERASURE over the persisted BATCH soft-dedup state — the
    * right-to-be-forgotten path for [[softDedupStateBuild]]'s artifact
    * (the streaming twin is
    * [[graft.streaming.StreamingGates.streamSoftDedupDelete]]): one
    * composed sweep under the state root's [[graft.streaming.MaintenanceLease]]:
    *
    *   1. the erased ids register as TOMBSTONES (shared by both
    *      geometry families — deleting a doc must hide it from bands
    *      AND shingles in the same logical instant);
    *   2. both geometry families run an EXCLUDING compaction
    *      ([[graft.streaming.StreamingPipeline.compactDeltasExcluding]]):
    *      the erased docs' band and shingle rows are physically absent
    *      from the published snapshot's bytes, with that protocol's
    *      full staging/marker/heal crash story;
    *   3. the cluster state folds DOWN via [[unfoldSoftLabels]]:
    *      surviving pairs among the AFFECTED components' members are
    *      re-derived from the folded geometry (erased endpoints are
    *      already gone there, so no pair can resurrect them), bridge
    *      splits and retired min-labels re-cluster, untouched clusters
    *      pass through unread — published as the next atomic snapshot;
    *   4. the tombstones retire (every family has folded past the
    *      delete).
    *
    * Cost: the verify/CC work is AFFECTED-COMPONENT-sized (the
    * delete-independent fold price every erasure path here pays); the
    * geometry refold is one snapshot rewrite per family, republished
    * BUCKETED so the store keeps its Exchange-free probe layout, and
    * the member probes broadcast the (cluster-sized) survivor set to
    * stream the bucketed snapshots instead of shuffling them. */
  def softDedupErase(spark: SparkSession, stateDir: String,
      erasedIds: DataFrame): Unit =
    graft.streaming.MaintenanceLease.withLease(spark, stateDir) {
      val sp = graft.streaming.StreamingPipeline
      val st = graft.streaming.SoftState
      val clusters = clustersDir(stateDir)
      val ver = st.currentVersion(spark, clusters).getOrElse(
        sys.error(s"softDedupErase: no committed state under $stateDir"))
      val erased = graft.Caches.persist(erasedIds.select(col("doc_id")))
      val tid = sp.writeTombstones(spark, stateDir, erased)
      // the excluding fold republishes each family BUCKETED — erasure
      // must not cost the store its Exchange-free probe layout
      // NOT run through graft.Par here, a MEASURED decision (r17): the
      // concurrent excluding folds read the erase gate +0.9–1.1 s in
      // both the filtered A/B and the full-suite record (the two
      // tombstone-filtered rewrites contend on the same broadcast
      // tombstone build mid-erase), while build/sweep/ingest each got
      // faster from the same overlap — sequential stays correct here
      sp.compactDeltasExcludingBucketed(spark, geoDir(stateDir, StateBands),
        StateBands._2, ver, stateDir, "doc_id",
        geoBucketCols(StateBands), GeoBuckets)
      sp.compactDeltasExcludingBucketed(spark, geoDir(stateDir, StateShingles),
        StateShingles._2, ver, stateDir, "doc_id",
        geoBucketCols(StateShingles), GeoBuckets)
      val labels = st.read(spark, clusters, StateLabels._1, StateLabels._2)
      val sizes = st.read(spark, clusters, StateSizes._1, StateSizes._2)
      // surviving members of the affected components — the only docs
      // whose pairs the fold-down needs
      val affected = labels.join(erased, Seq("doc_id"), "left_semi")
        .select(col("cluster_id")).distinct()
      val members = graft.Caches.persist(
        labels.join(affected, Seq("cluster_id"), "left_semi")
          .join(erased, Seq("doc_id"), "left_anti")
          .select(col("doc_id")))
      // members are affected-component survivors (cluster-sized, not
      // corpus-sized) — broadcast them so the member probes STREAM the
      // just-folded bucketed snapshots instead of shuffling them, and
      // the band self-join below keeps the (band, sig) bucket layout
      val mBands = geometryContents(spark, stateDir, StateBands, ver)
        .join(broadcast(members), Seq("doc_id"), "left_semi")
      val mShingles = geometryContents(spark, stateDir, StateShingles, ver)
        .join(broadcast(members), Seq("doc_id"), "left_semi")
      val survPairs = verifyPairs(selfBandCandidates(mBands), mShingles)
        .select(col("id_a"), col("id_b"))
      val (l2, s2) = unfoldSoftLabels(labels, sizes, erased, survPairs)
      // erasure never raises the id ceiling, and a forgotten id must
      // NOT be re-ingestable (the tombstone contract) — carry the
      // committed high-water forward to the new fold
      writeIdHighWater(spark, stateDir, ver + 1L,
        readIdHighWater(spark, stateDir, ver))
      st.publish(spark, clusters, ver + 1L,
        Seq(StateLabels._1 -> l2, StateSizes._1 -> s2))
      sp.retireTombstones(spark, stateDir, tid)
    }

  /** The doc slice erased by the gated batch-state erasure. */
  private val SoftEraseSliceSql = "(doc_id % 8) = 2"

  /** Gated query: build the persisted state over the full augmented
    * corpus, ERASE a slice through [[softDedupErase]] (tombstones +
    * geometry excluding-fold + cluster fold-down), and serve weights
    * for the survivors from the folded state. Oracle: the full
    * recompute on the corpus minus the slice — erase-then-serve ≡
    * never-ingested, hash-proven THROUGH the physical geometry fold
    * (an under-deleted band/shingle row would re-link a survivor pair
    * and flip a multiplicity cell). */
  def ddSoftDedupErase(spark: SparkSession, dir: String): DataFrame = {
    val aug = graft.Caches.persist(augmented(spark, dir))
    val stateDir = graft.TmpDirs.create("graft_softstate_erase_")
    softDedupStateBuild(aug, stateDir)
    softDedupErase(spark, stateDir, aug.filter(expr(SoftEraseSliceSql)))
    val st = graft.streaming.SoftState
    softWeightsOf(
      aug.filter(!expr(SoftEraseSliceSql)).select(col("doc_id")),
      st.read(spark, clustersDir(stateDir), StateLabels._1, StateLabels._2),
      st.read(spark, clustersDir(stateDir), StateSizes._1, StateSizes._2))
  }

  val ddSoftDedupEraseSql: String = ddSoftDedupExcludingSql(SoftEraseSliceSql)

  /** INCREMENTAL soft dedup — the daily-ingest form, now measuring what
    * production actually pays: [[softDedupStateBuild]] persists the
    * history's (bands, shingles, labels, sizes) once (the last full
    * run's artifact — built here only because the gate is
    * self-contained), then [[softDedupIngest]] folds the batch in
    * reading ONLY that stored state:
    *
    *   1. new edges = batch-internal LSH pairs ∪ cross pairs (the batch
    *      probes the STORED band relation — history is never re-banded,
    *      and verification reads the STORED shingle relation — history
    *      is never re-shingled);
    *   2. each new edge's history endpoint is CONTRACTED to its stored
    *      component label (a super-node — old labels are component MIN
    *      ids, so min-label CC over the contracted graph lands on the
    *      merged component's true min);
    *   3. stored components relabel through the merge map (untouched
    *      ones keep their label — the common case at scale), sizes
    *      merge additively, and the advanced state publishes as the
    *      next atomic snapshot.
    *
    * Gated against the SAME oracle as [[ddSoftDedup]], so the driver's
    * hash compare proves state-build + incremental-fold ≡ full
    * recompute (no pair lost at the history/batch seam, no size drift
    * through the contraction, no relation dropped through the
    * parquet round-trip). Per-ingest cost: batch bands ⋈ stored band
    * collisions + label-relation joins — never O(history²), never a
    * history rescan. */
  def softDedupIncremental(history: DataFrame, batch: DataFrame): DataFrame = {
    val hist = graft.Caches.persist(history)
    val stateDir = graft.TmpDirs.create("graft_softstate_inc_")
    softDedupStateBuild(hist, stateDir)
    softDedupIngest(stateDir, batch, hist.select(col("doc_id")))
  }

  /** ONE FOLD of the soft-dedup cluster state: merge a set of NEW
    * verified pairs into (labels, sizes) — labels (doc_id, cluster_id)
    * one row per clustered doc, sizes (cluster_id, m). Invariant in and
    * out: every cluster_id is its component's min member doc_id (and
    * therefore itself a labels row), which is what makes contraction
    * sound — each labeled endpoint collapses to its component label (a
    * super-node), min-label CC over the contracted graph lands on the
    * merged component's true min, untouched components keep their label
    * through the left-join coalesce, and sizes merge additively (old
    * size flows to the new label; each newly clustered doc adds 1).
    * Edges between members of one existing component contract to
    * self-loops and no-op; re-delivered pairs are therefore harmless.
    * Cost: CC on the contracted graph (new-edge-sized) plus
    * label-relation joins — never corpus- or history-sized. */
  def foldSoftLabels(labels: DataFrame, sizes: DataFrame,
      newEdges: DataFrame): (DataFrame, DataFrame) = {
    val la = labels.select(col("doc_id").as("id_a"), col("cluster_id").as("la"))
    val lb = labels.select(col("doc_id").as("id_b"), col("cluster_id").as("lb"))
    val merged = graft.Caches.persist(
      Cluster.connectedComponents(newEdges
          .join(la, Seq("id_a"), "left")
          .join(lb, Seq("id_b"), "left")
          .select(coalesce(col("la"), col("id_a")).as("src"),
            coalesce(col("lb"), col("id_b")).as("dst")))
        .select(col("id").as("node"), col("cluster_id").as("nl")))
    // old components flow through the merge map; untouched keep labels
    val relabeled = labels
      .join(merged.withColumnRenamed("node", "cluster_id"),
        Seq("cluster_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nl"), col("cluster_id")).as("cluster_id"))
    // merged nodes that are docs (new docs, old singletons), not
    // super-nodes: every super-node id is an existing label and labels
    // are themselves member doc_ids, so the anti-join is exactly the
    // doc/super-node split
    val direct = merged
      .select(col("node").as("doc_id"), col("nl").as("cluster_id"))
      .join(labels.select(col("doc_id")), Seq("doc_id"), "left_anti")
    val newSizes = sizes
      .join(merged.withColumnRenamed("node", "cluster_id"),
        Seq("cluster_id"), "left")
      .select(coalesce(col("nl"), col("cluster_id")).as("cluster_id"), col("m"))
      .unionByName(
        direct.groupBy(col("cluster_id")).agg(count(lit(1)).as("m")))
      .groupBy(col("cluster_id")).agg(sum(col("m")).as("m"))
    (relabeled.unionByName(direct), newSizes)
  }

  /** Soft dedup over the PIPELINE corpus — COMBINED multiplicity from
    * both duplicate kinds, in the production composition order
    * ([[ddPipeline]]): exact copies collapse to digest groups first
    * (each non-keeper contributes an exact edge to its keeper — no LSH
    * work spent re-discovering byte-identical text), the LSH near-dup
    * graph is built over the exact SURVIVORS only, and the component
    * over exact ∪ near edges prices every doc: a doc crawled as 3 exact
    * copies inside a 2-member near-dup cluster weighs 1/4th. The
    * augmented-only [[ddSoftDedup]] exercises the near-dup half; this
    * gate proves the weights survive the composition the 100 TB
    * pipeline actually runs. */
  def ddSoftDedupPipeline(spark: SparkSession, dir: String): DataFrame =
    softDedupPipelineWeights(pipelineCorpus(spark, dir))

  /** The combined-multiplicity engine over an arbitrary (doc_id, text)
    * corpus — see [[ddSoftDedupPipeline]] for the composition. */
  def softDedupPipelineWeights(corpus0: DataFrame): DataFrame = {
    val corpus = graft.Caches.persist(corpus0)
    val dig = corpus.select(col("doc_id"), md5(col("text")).as("digest"))
    val keepers = dig.groupBy(col("digest")).agg(min(col("doc_id")).as("id_a"))
    val exactPairs = dig.join(keepers, Seq("digest"))
      .filter(col("doc_id") =!= col("id_a"))
      .select(col("id_a"), col("doc_id").as("id_b"))
    val nearPairs = minhashLshPairs(graft.Caches.persist(survivors(corpus)))
      .select(col("id_a"), col("id_b"))
    val labels = Cluster.connectedComponents(
        exactPairs.unionByName(nearPairs)
          .select(col("id_a").as("src"), col("id_b").as("dst")))
      .select(col("id").as("doc_id"), col("cluster_id"))
    val sizes = labels.groupBy(col("cluster_id")).agg(count(lit(1)).as("m"))
    softWeightsOf(corpus.select(col("doc_id")), labels, sizes)
  }

  val ddSoftDedupPipelineSql: String = s"""
    WITH RECURSIVE aug AS ($augmentedSql),
    $pipeSql,
    dig AS (SELECT doc_id, md5(text) AS digest FROM pipe),
    keepers AS (SELECT digest, MIN(doc_id) AS kid FROM dig GROUP BY digest),
    epairs AS (
      SELECT k.kid AS id_a, d.doc_id AS id_b
      FROM dig d JOIN keepers k USING (digest) WHERE d.doc_id <> k.kid),
    surv AS (SELECT p.doc_id, p.text FROM pipe p JOIN keepers k ON p.doc_id = k.kid),
    ${lshCtesSql("surv")},
    allp AS (SELECT id_a, id_b FROM epairs
             UNION SELECT id_a, id_b FROM lsh_pairs),
    ${Portable.closureLabelsSql("allp", "doc_id")},
    msize AS (SELECT cluster_id, COUNT(*) AS m FROM labels GROUP BY cluster_id)
    SELECT p.doc_id,
           COALESCE(l.cluster_id, p.doc_id) AS cluster_id,
           COALESCE(msize.m, 1) AS multiplicity,
           1000000 // COALESCE(msize.m, 1) AS weight_ppm
    FROM pipe p
    LEFT JOIN labels l ON l.doc_id = p.doc_id
    LEFT JOIN msize ON msize.cluster_id = l.cluster_id
    ORDER BY p.doc_id"""

  /** FOLD-DOWN of the soft-dedup cluster state for DOCUMENT ERASURE —
    * the right-to-be-forgotten path: removing docs can SPLIT a
    * component (the erased doc may be the only bridge) and can retire
    * its label (the min member may be the erased one), so sizes cannot
    * simply decrement. The fold re-clusters ONLY the affected
    * components: members of clusters naming an erased doc are re-CC'd
    * from the SURVIVING verified pairs (the erasure-folded pair store —
    * no erased endpoint appears in it), members left with no surviving
    * pair fall back to singletons, and every untouched cluster's label
    * and size pass through unread. Cost is affected-component-sized —
    * the delete-independent fold price every erasure path here pays,
    * never a corpus or pair-store re-cluster. */
  def unfoldSoftLabels(labels: DataFrame, sizes: DataFrame,
      erasedIds: DataFrame, survivingPairs: DataFrame)
      : (DataFrame, DataFrame) = {
    val erased = erasedIds.select(col("doc_id"))
    val affected = graft.Caches.persist(
      labels.join(erased, Seq("doc_id"), "left_semi")
        .select(col("cluster_id")).distinct())
    val keptLabels = labels.join(affected, Seq("cluster_id"), "left_anti")
      .select(col("doc_id"), col("cluster_id"))
    val keptSizes = sizes.join(affected, Seq("cluster_id"), "left_anti")
      .select(col("cluster_id"), col("m"))
    // surviving members of the affected components
    val members = graft.Caches.persist(
      labels.join(affected, Seq("cluster_id"), "left_semi")
        .join(erased, Seq("doc_id"), "left_anti")
        .select(col("doc_id")))
    // pairs among those members — pairs never cross components, so the
    // double left-semi is exactly the affected subgraph
    val recc = Cluster.connectedComponents(survivingPairs
        .join(members.withColumnRenamed("doc_id", "id_a"),
          Seq("id_a"), "left_semi")
        .join(members.withColumnRenamed("doc_id", "id_b"),
          Seq("id_b"), "left_semi")
        .select(col("id_a").as("src"), col("id_b").as("dst")))
      .select(col("id").as("doc_id"), col("cluster_id"))
    (keptLabels.unionByName(recc),
      keptSizes.unionByName(
        recc.groupBy(col("cluster_id")).agg(count(lit(1)).as("m"))))
  }

  /** Oracle for the soft-dedup erasure gate: the SAME clustering +
    * weights over the corpus minus the erased docs — erase-then-
    * continue must equal never-ingested on the survivors. */
  def ddSoftDedupExcludingSql(pred: String): String = s"""
    WITH RECURSIVE aug AS (SELECT * FROM ($augmentedSql) AS a0 WHERE NOT ($pred)),
    ${lshCtesSql("aug")},
    ${Portable.closureLabelsSql("lsh_pairs", "doc_id")},
    msize AS (SELECT cluster_id, COUNT(*) AS m FROM labels GROUP BY cluster_id)
    $softDedupSelectSql
    ORDER BY a.doc_id"""

  /** Per-doc soft weights from a (labels, sizes) cluster state: docs in
    * no cluster are singletons with weight 1. */
  def softWeightsOf(corpusIds: DataFrame, labels: DataFrame,
      sizes: DataFrame): DataFrame =
    corpusIds
      .join(labels, Seq("doc_id"), "left")
      .join(sizes, Seq("cluster_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        coalesce(col("m"), lit(1L)).as("multiplicity"))
      .withColumn("weight_ppm", expr("1000000L DIV multiplicity"))
      .orderBy(col("doc_id"))

  /** Gated query: the augmented corpus split at the planted-variant
    * boundary (base docs are history, variants the new batch — the
    * [[ddCrossNearDup]] convention), folded incrementally. Same oracle
    * as [[ddSoftDedup]]. */
  def ddSoftDedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val aug = graft.Caches.persist(augmented(spark, dir))
    softDedupIncremental(
      aug.filter(col("doc_id") < 10000),
      aug.filter(col("doc_id") >= 10000))
  }

  val ddSoftDedupIncrementalSql: String = ddSoftDedupSql

  /** Gated query: the FULL maintenance lifecycle of the persisted
    * soft-dedup state — build on the history, ingest wave 1, run the
    * ROUTINE [[softDedupSweep]] (the delta tail folds into the
    * bucketed geometry snapshots, superseded ingest guards retire),
    * then ingest wave 2 against the SWEPT store and serve. Oracle: the
    * same full-recompute SQL as `dd_soft_dedup`, so the hash compare
    * proves SWEEP NEUTRALITY — compacting the geometry changes no
    * candidate, no Jaccard count, no cluster — through two persisted
    * folds and one maintenance boundary. */
  def ddSoftDedupSweep(spark: SparkSession, dir: String): DataFrame = {
    val aug = graft.Caches.persist(augmented(spark, dir))
    val hist = aug.filter(col("doc_id") < 10000)
    // split the variant batch at its exact median id (bounded 1-row
    // scalar) — two ingest waves honoring the append-only id contract
    // at any corpus scale
    val midRow = aug.filter(col("doc_id") >= 10000)
      .agg(expr("percentile(doc_id, 0.5)")).head()
    val mid = if (midRow.isNullAt(0)) Long.MaxValue.toDouble
      else midRow.getDouble(0)
    val stateDir = graft.TmpDirs.create("graft_softstate_sweep_")
    softDedupStateBuild(hist, stateDir)
    softDedupIngest(stateDir,
      aug.filter(col("doc_id") >= 10000 && col("doc_id") <= mid),
      hist.select(col("doc_id")))
    softDedupSweep(spark, stateDir)
    softDedupIngest(stateDir,
      aug.filter(col("doc_id") > mid),
      aug.filter(col("doc_id") <= mid).select(col("doc_id")))
  }

  val ddSoftDedupSweepSql: String = ddSoftDedupSql

  /** Soft-dedup-weighted token-budget mix — the composition that makes
    * the weights ACTIONABLE: [[graft.operators.TextAnalysis.txTokenBudgetMix]]'s
    * budget allocator run on EFFECTIVE token mass (Σ n_words·weight —
    * a cluster of m near-dups contributes ~one doc's tokens to its
    * stratum, so over-crawled strata stop inflating their own budget),
    * and each doc's keep probability is its stratum rate FURTHER
    * thinned by its weight: keep iff hash-bucket(10⁹) < rate_pm ·
    * weight_ppm. Expected kept effective tokens per stratum = share ×
    * budget, exactly the hard mix's invariant, but duplicates are
    * down-sampled smoothly instead of deleted. All-integer arithmetic
    * (ppm × permille over 10⁹ buckets), deterministic hash sampling.
    *
    * Scale shape: the weights join is the soft-dedup label join, the
    * per-stratum aggregate is 5 rows, rates broadcast back, and the
    * keep decision is a codegen'd filter — no corpus shuffle beyond
    * soft-dedup's own. */
  def softBudgetMix(docs: DataFrame, weights: DataFrame): DataFrame = {
    // persisted: the stratum aggregate AND the final keep-filter both
    // consume it, and lw embeds the corpus ⋈ labels join — recomputing
    // that per consumer is the one plan shape that would not survive
    // 100 TB (four narrow columns per row cache cheaply)
    val lw = graft.Caches.persist(
      softMixLens(docs).join(
        weights.select(col("doc_id"), col("weight_ppm")), Seq("doc_id")))
    lw.join(broadcast(softMixRates(lw)), Seq("lang"))
      .filter(softMixKeep)
      .select(col("doc_id"), col("lang"), col("n_words"), col("weight_ppm"))
      .orderBy(col("doc_id"))
  }

  /** (doc_id, lang, n_words) of a document relation — the stateless
    * projection both the batch mix and the per-batch streaming serve
    * compute, shared so the two can never tokenize differently. */
  private def softMixLens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      size(Portable.words(col("text"))).cast("long").as("n_words"))

  /** Per-stratum keep rates (lang, rate_pm) from the weighted length
    * relation — the 5-row model artifact of the soft mix, computed once
    * per corpus refresh and PERSISTED for the streaming serve. */
  private[graft] def softMixRates(lw: DataFrame): DataFrame =
    lw.groupBy(col("lang"))
      .agg(sum(col("n_words") * col("weight_ppm")).as("toks_eff"))
      .withColumn("total", sum(col("toks_eff"))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(Portable.onePartition(col("toks_eff")))))
      // ELSE 0, not null: an unknown stratum must be dropped (rate 0),
      // matching the oracle's inner join against the shares VALUES —
      // least() skips a null alloc and would keep the stratum whole
      .withColumn("alloc", expr("(total DIV 4) * "
        + "CASE " + TextAnalysis.BUDGET_SHARES.map { case (l, pm) =>
            s"WHEN lang = '$l' THEN ${pm}L" }.mkString(" ")
        + " ELSE 0L END DIV 1000"))
      .withColumn("rate_pm", least(lit(1000L), expr("alloc * 1000 DIV toks_eff")))
      .select(col("lang"), col("rate_pm"))

  /** The deterministic keep decision: hash-bucket(10⁹) < rate·weight —
    * a codegen'd filter, no state, no RNG. */
  private def softMixKeep: Column =
    pmod(
      Portable.hash60(concat(lit("softmix:"), col("doc_id").cast("string"))),
      lit(1000000000L)) < col("rate_pm") * col("weight_ppm")

  /** STATELESS serve of the soft budget mix against its persisted model
    * (weights by doc, rates by stratum): one projection + a static
    * weights join + a broadcast rates join + the codegen'd keep filter —
    * attaches to a micro-batch stream with no watermark and no state,
    * the [[graft.streaming.StreamingGates.streamQcScore]] posture. */
  def softMixServe(batch: DataFrame, weights: DataFrame,
      rates: DataFrame): DataFrame =
    softMixLens(batch)
      .join(weights.select(col("doc_id"), col("weight_ppm")), Seq("doc_id"))
      .join(broadcast(rates), Seq("lang"))
      .filter(softMixKeep)
      .select(col("doc_id"), col("lang"), col("n_words"), col("weight_ppm"))

  /** Gated query: weights from the augmented clustering restricted to
    * the real corpus (variants exist only to plant duplicate mass), mix
    * over the documents table. */
  def txSoftBudgetMix(spark: SparkSession, dir: String): DataFrame =
    softBudgetMix(Tables.documents(spark, dir),
      ddSoftDedup(spark, dir).filter(col("doc_id") < 10000))

  /** Stamped schemas of the persisted soft-mix model family — the
    * weights relation carries (lang, n_words) alongside the weight so
    * a later [[softMixErase]] can re-derive the 5-row rates from the
    * surviving rows alone (rates sum weighted token mass; a weights
    * relation without the mass columns would make every erasure a full
    * offline model rebuild). */
  private[graft] val MixWeightsSchema =
    "doc_id BIGINT, lang STRING, n_words BIGINT, weight_ppm BIGINT"
  private[graft] val MixRatesSchema = "lang STRING, rate_pm BIGINT"

  /** Publish the soft-mix model — the per-doc weighted length relation
    * and its derived 5-row rates — as ONE atomic [[graft.streaming.SoftState]]
    * snapshot (the two are only meaningful together: rates derive from
    * the weighted token mass). `lw`: (doc_id, lang, n_words,
    * weight_ppm), the [[softBudgetMix]] join. */
  def softMixStateBuild(spark: SparkSession, stateDir: String,
      lw: DataFrame): Unit =
    graft.streaming.SoftState.publish(spark, stateDir, 0L, Seq(
      "weights" -> lw.select(col("doc_id"), col("lang"), col("n_words"),
        col("weight_ppm")),
      "rates" -> softMixRates(lw)))

  /** RIGHT-TO-BE-FORGOTTEN fold of the persisted soft-mix model — the
    * erase path BETWEEN corpus refreshes (before this, an erased doc
    * kept serving its weight until the next offline rebuild — the one
    * persisted family without a delete gate, VERDICT r15): under the
    * family's lease, the erased docs' weight rows are dropped (their
    * bytes leave the published snapshot — the anti-join rewrite every
    * physical-erasure path here pays) and the 5-row rates RE-DERIVE
    * from the survivors in the same staged write (the rates aggregate
    * rides the rewrite scan — no extra pass), publishing both
    * relations as the next atomic snapshot. An erased doc then neither
    * serves a weight (the serve joins weights inner) nor inflates its
    * stratum's effective token mass. NOTE the scope: this erases the
    * MODEL rows; re-clustering the soft-dedup weights themselves is
    * [[softDedupErase]]'s job on its own state family. */
  def softMixErase(spark: SparkSession, stateDir: String,
      erasedIds: DataFrame): Unit =
    graft.streaming.MaintenanceLease.withLease(spark, stateDir) {
      val st = graft.streaming.SoftState
      val ver = st.currentVersion(spark, stateDir).getOrElse(
        sys.error(s"softMixErase: no committed soft-mix state under $stateDir"))
      val surv = graft.Caches.persist(
        st.read(spark, stateDir, "weights", MixWeightsSchema)
          .join(broadcast(erasedIds.select(col("doc_id"))),
            Seq("doc_id"), "left_anti"))
      st.publish(spark, stateDir, ver + 1L, Seq(
        "weights" -> surv, "rates" -> softMixRates(surv)))
    }

  /** Oracle builder for the soft-budget-mix gates: the full model +
    * serve chain, with the weighted length relation optionally
    * restricted (`lwPred` — the erase gates' survivor corpus; rates
    * re-derive from the restricted relation exactly as
    * [[softMixErase]] re-derives them from the surviving rows). */
  private def txSoftBudgetMixSqlWhere(lwPred: String): String = {
    val vals = TextAnalysis.BUDGET_SHARES
      .map { case (l, pm) => s"('$l', $pm)" }.mkString(", ")
    s"""
    WITH RECURSIVE aug AS ($augmentedSql),
    ${lshCtesSql("aug")},
    ${Portable.closureLabelsSql("lsh_pairs", "doc_id")},
    msize AS (SELECT cluster_id, COUNT(*) AS m FROM labels GROUP BY cluster_id),
    soft AS (
      SELECT * FROM ($softDedupSelectSql) AS sd WHERE doc_id < 10000),
    lens AS (
      SELECT doc_id, lang,
             CAST(len(${Portable.wordsSql("text")}) AS BIGINT) AS n_words
      FROM documents),
    lw AS (
      SELECT lens.doc_id, lens.lang, lens.n_words, soft.weight_ppm
      FROM lens JOIN soft USING (doc_id) WHERE $lwPred),
    c AS (SELECT lang, CAST(SUM(n_words * weight_ppm) AS BIGINT) AS toks_eff
          FROM lw GROUP BY lang),
    t AS (SELECT CAST(SUM(toks_eff) AS BIGINT) AS total FROM c),
    wsh AS (SELECT * FROM (VALUES $vals) AS v(lang, pm)),
    r AS (SELECT c.lang,
                 LEAST(1000, (((t.total // 4) * wsh.pm // 1000) * 1000) // c.toks_eff)
                   AS rate_pm
          FROM c JOIN wsh USING (lang) CROSS JOIN t)
    SELECT lw.doc_id, lw.lang, lw.n_words, lw.weight_ppm
    FROM lw JOIN r USING (lang)
    WHERE ((${Portable.hash60Sql("('softmix:' || CAST(doc_id AS VARCHAR))")} % 1000000000)
           + 1000000000) % 1000000000 < r.rate_pm * lw.weight_ppm
    ORDER BY lw.doc_id"""
  }

  val txSoftBudgetMixSql: String = txSoftBudgetMixSqlWhere("TRUE")

  /** Oracle for a soft-mix serve after [[softMixErase]] of `pred`:
    * weights AND rates over the survivor relation only — erase-then-
    * serve ≡ model-built-on-survivors. */
  def txSoftBudgetMixExcludingSql(pred: String): String =
    txSoftBudgetMixSqlWhere(s"NOT ($pred)")

  // ----------------------------------------------------------- LSH tuning

  /** Candidate bandings of the K=16 signature (every divisor split
    * b·r = K), the integration grid, the Jaccard target expressed on
    * the grid (512/1024 = the pipeline's 0.5 verify threshold), and the
    * per-sample quantization (2²⁰ — a power of two, so quantizing is
    * EXACT exponent arithmetic, see [[lshTune]]). */
  val TuneConfigs: Seq[(Int, Int)] = Seq(1 -> 16, 2 -> 8, 4 -> 4, 8 -> 2, 16 -> 1)
  val TuneGrid = 1024
  val TuneThresholdK = 512
  val TuneQ = 1048576L

  /** LSH BANDING AUTO-TUNER — the pre-flight computation a 100 TB LSH
    * job runs before committing to a banding: for each (bands b, rows
    * r) with b·r = K, integrate the S-curve P(s) = 1 − (1 − sʳ)ᵇ
    * (probability a pair at Jaccard s becomes a candidate) against the
    * verify threshold τ — false-positive mass ∫₀^τ P(s) ds (candidates
    * the verify join must reject: wasted shuffle) and false-negative
    * mass ∫_τ¹ (1 − P(s)) ds (true pairs banding never surfaces:
    * recall loss) — and flag the banding minimizing their sum. The
    * datasketch library ships this computation as `_optimal_param`;
    * here it is a relational query, gated like any operator.
    *
    * Hash-exactness without a numeric-determinism leap of faith: the
    * grid is midpoints s = (2k+1)/2048 (dyadic — exact doubles), every
    * power is an EXPLICIT repeated-squaring multiply chain (s², s⁴, s⁸,
    * s¹⁶ — each step one correctly-rounded IEEE multiply, identical in
    * any engine; no libm pow, whose rounding is implementation-
    * defined), quantization multiplies by 2²⁰ (exact — pure exponent
    * shift) and floors after adding 0.5 (exact at this magnitude), and
    * the integral is a BIGINT sum of the quantized samples — order-
    * independent, unlike a double sum. */
  def lshTune(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val cfg = TuneConfigs.toDF("b", "r")
    val grid = spark.range(TuneGrid.toLong).select(col("id").as("k"))
    cfg.crossJoin(grid)
      .withColumn("s",
        (col("k") * 2 + 1).cast("double") / lit((2 * TuneGrid).toDouble))
      .withColumn("s2", col("s") * col("s"))
      .withColumn("s4", col("s2") * col("s2"))
      .withColumn("s8", col("s4") * col("s4"))
      .withColumn("s16", col("s8") * col("s8"))
      .withColumn("sr",
        when(col("r") === 1, col("s")).when(col("r") === 2, col("s2"))
          .when(col("r") === 4, col("s4")).when(col("r") === 8, col("s8"))
          .otherwise(col("s16")))
      .withColumn("u", lit(1.0) - col("sr"))
      .withColumn("u2", col("u") * col("u"))
      .withColumn("u4", col("u2") * col("u2"))
      .withColumn("u8", col("u4") * col("u4"))
      .withColumn("u16", col("u8") * col("u8"))
      .withColumn("p", lit(1.0) -
        (when(col("b") === 1, col("u")).when(col("b") === 2, col("u2"))
          .when(col("b") === 4, col("u4")).when(col("b") === 8, col("u8"))
          .otherwise(col("u16"))))
      .withColumn("qp", floor(col("p") * lit(TuneQ.toDouble) + lit(0.5)))
      .withColumn("qn",
        floor((lit(1.0) - col("p")) * lit(TuneQ.toDouble) + lit(0.5)))
      .groupBy(col("b"), col("r"))
      .agg(
        sum(when(col("k") < TuneThresholdK, col("qp")).otherwise(0L)).as("fp_q"),
        sum(when(col("k") >= TuneThresholdK, col("qn")).otherwise(0L)).as("fn_q"))
      .withColumn("cost_q", col("fp_q") + col("fn_q"))
      .withColumn("chosen", col("cost_q") ===
        min(col("cost_q")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(Portable.onePartition(col("cost_q")))))
      .select(col("b"), col("r"), col("fp_q"), col("fn_q"),
        col("cost_q"), col("chosen"))
      .orderBy(col("b"))
  }

  def ddLshTune(spark: SparkSession, dir: String): DataFrame = lshTune(spark)

  val ddLshTuneSql: String = {
    val vals = TuneConfigs.map { case (b, r) => s"($b, $r)" }.mkString(", ")
    s"""
    WITH cfg AS (SELECT * FROM (VALUES $vals) AS v(b, r)),
    g AS (SELECT unnest(range(0, $TuneGrid)) AS k),
    pt AS (SELECT b, r, k,
                  CAST(2 * k + 1 AS DOUBLE) / ${2 * TuneGrid}.0 AS s
           FROM cfg CROSS JOIN g),
    e1 AS (SELECT *, s * s AS s2 FROM pt),
    e2 AS (SELECT *, s2 * s2 AS s4 FROM e1),
    e3 AS (SELECT *, s4 * s4 AS s8 FROM e2),
    e4 AS (SELECT *, s8 * s8 AS s16 FROM e3),
    e5 AS (SELECT *, CASE r WHEN 1 THEN s WHEN 2 THEN s2 WHEN 4 THEN s4
                            WHEN 8 THEN s8 ELSE s16 END AS sr FROM e4),
    e6 AS (SELECT *, 1.0 - sr AS u FROM e5),
    e7 AS (SELECT *, u * u AS u2 FROM e6),
    e8 AS (SELECT *, u2 * u2 AS u4 FROM e7),
    e9 AS (SELECT *, u4 * u4 AS u8 FROM e8),
    e10 AS (SELECT *, u8 * u8 AS u16 FROM e9),
    e11 AS (SELECT *, 1.0 - (CASE b WHEN 1 THEN u WHEN 2 THEN u2 WHEN 4 THEN u4
                                    WHEN 8 THEN u8 ELSE u16 END) AS p FROM e10),
    q AS (SELECT b, r, k,
                 CAST(floor(p * $TuneQ.0 + 0.5) AS BIGINT) AS qp,
                 CAST(floor((1.0 - p) * $TuneQ.0 + 0.5) AS BIGINT) AS qn
          FROM e11),
    agg AS (SELECT b, r,
                   CAST(SUM(CASE WHEN k < $TuneThresholdK THEN qp ELSE 0 END)
                     AS BIGINT) AS fp_q,
                   CAST(SUM(CASE WHEN k >= $TuneThresholdK THEN qn ELSE 0 END)
                     AS BIGINT) AS fn_q
            FROM q GROUP BY b, r),
    costed AS (SELECT *, fp_q + fn_q AS cost_q FROM agg)
    SELECT b, r, fp_q, fn_q, cost_q,
           cost_q = (SELECT MIN(cost_q) FROM costed) AS chosen
    FROM costed ORDER BY b"""
  }
}
