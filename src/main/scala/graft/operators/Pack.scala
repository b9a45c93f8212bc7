package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Training-sequence packing: concatenate documents in a deterministic
  * order and chunk the stream into fixed token-budget sequences (the
  * standard GPT-style pretraining layout — every sequence except the
  * last is exactly `budget` tokens; documents straddle boundaries
  * rather than leaving pad waste). The operator assigns each document
  * its position in that layout without materializing the concatenation:
  * everything derives from the EXCLUSIVE cumulative token count.
  *
  * The cumsum is the scale problem: the naive form is one global window
  * (`Window.orderBy(key)`) which Spark executes on a SINGLE partition —
  * the whole corpus through one task, a non-starter at 100 TB. This
  * implementation is the classic two-phase prefix sum instead:
  *
  *   1. bucket rows by a monotone function of the order key
  *      (`width_bucket` over the key's min/max — one footer-cheap
  *      min/max aggregate; uniform buckets are right for dense ids,
  *      quantile boundaries are the skew-robust swap-in);
  *   2. per-bucket totals (tiny: `buckets` rows) → exclusive bucket
  *      offsets via a window over that TINY frame (single-partition is
  *      correct there — 32 rows, not 100 TB);
  *   3. broadcast the offsets back and finish with a window
  *      PARTITIONED by bucket — each task scans one bucket's rows,
  *      nothing funnels through one partition.
  *
  * Reference scope note: the reference engine has no packing operator
  * (its surface is config-driven scan/validate/sink —
  * `/root/reference/src/main/scala/com/pipeline/PipelineProcessor.scala`);
  * this belongs to the training-data extension pack alongside
  * [[TextAnalysis]] epoch mixing and split assignment. */
object Pack {

  /** Buckets for the two-phase cumsum. At local[32]/sf0.1 this matches
    * the shuffle-partition count; at cluster scale raise it with the
    * core count — correctness is bucket-count-independent (asserted in
    * PackSpec), only balance changes. */
  val CumsumBuckets = 32

  /** Token budget per packed sequence for the gated query. Real
    * pretraining uses the model context (2k-8k); the synthetic docs
    * run ~40-60 tokens, so 512 yields ~10 docs/sequence with straddles
    * actually occurring at sf0.01 — the knob, not the algorithm, is
    * corpus-dependent. */
  val GateBudget = 512L

  /** Adds `cum_excl` — the exclusive running sum of `weightCol` in
    * `orderCol` order (first row 0) — without a global single-partition
    * window. `orderCol` must be numeric and unique; `weightCol`
    * non-negative. Empty input passes through (no min/max to bucket). */
  def exclusiveCumsum(df: DataFrame, orderCol: String, weightCol: String,
      buckets: Int = CumsumBuckets): DataFrame = {
    // cast-to-long in the aggregate, not Row.getLong — getLong does not
    // widen, so an Int/Short order column would ClassCastException here
    // while the skewed variant accepted it
    val bounds = df.agg(min(col(orderCol).cast("long")),
      max(col(orderCol).cast("long"))).head()
    if (bounds.isNullAt(0)) return df.withColumn("cum_excl", lit(0L))
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    // width_bucket is monotone in the key, so bucket order == key order;
    // hi+1 keeps the max key inside bucket `buckets` (no overflow bucket)
    cumsumOverBuckets(df.withColumn("__bkt",
      expr(s"width_bucket($orderCol, ${lo}L, ${hi + 1}L, $buckets)")),
      orderCol, weightCol)
  }

  /** Skew-robust variant: bucket boundaries from `approxQuantile`
    * instead of a uniform min/max split. Uniform buckets collapse when
    * keys cluster (one bucket holds the corpus and the per-bucket window
    * degenerates toward the single-partition scan this operator exists
    * to avoid); quantile boundaries equalize ROW counts per bucket no
    * matter the key distribution. The output is identical either way —
    * ANY monotone bucketing yields the same cumsum (the PackSpec law
    * test runs both variants against the naive global window) — so the
    * choice is purely a balance knob: uniform is one cheap min/max
    * aggregate, quantile is a GK-sketch pass. Boundary assignment is a
    * codegen'd `when`-chain (buckets-1 comparisons/row), monotone even
    * with duplicate boundaries. */
  def exclusiveCumsumSkewed(df: DataFrame, orderCol: String, weightCol: String,
      buckets: Int = CumsumBuckets): DataFrame = {
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    // buckets=1 yields zero quantile probes by construction — that is a
    // single-bucket cumsum, not an empty input; conflating the two (an
    // empty `qs` guard alone) would return cum_excl=0 for EVERY row
    if (probs.isEmpty)
      return cumsumOverBuckets(df.withColumn("__bkt", lit(1)), orderCol, weightCol)
    val qs = df.stat.approxQuantile(orderCol, probs, 0.001)
    if (qs.isEmpty) return df.withColumn("cum_excl", lit(0L))
    val bkt = qs.distinct.sorted.foldLeft(lit(1)) { (acc, b) =>
      acc + when(col(orderCol).cast("double") >= lit(b), 1).otherwise(0)
    }
    cumsumOverBuckets(df.withColumn("__bkt", bkt), orderCol, weightCol)
  }

  /** Phases 2+3 shared by both bucketings: tiny per-bucket offsets →
    * broadcast back → bucket-partitioned in-bucket window. */
  private def cumsumOverBuckets(bucketed: DataFrame, orderCol: String,
      weightCol: String): DataFrame = {
    val offsets = bucketed.groupBy(col("__bkt"))
      .agg(sum(col(weightCol)).as("__tot"))
      .withColumn("__off",
        coalesce(sum(col("__tot")).over(
          // onePartition key: the offsets frame is ≤ #buckets rows by
          // construction; a bare orderBy window has an EMPTY
          // partitionSpec and warns per run (see Portable.onePartition)
          Window.partitionBy(graft.functions.Portable.onePartition(col("__bkt")))
            .orderBy(col("__bkt")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__bkt"), col("__off"))
    val inBucket = Window.partitionBy(col("__bkt")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(offsets), "__bkt")
      .withColumn("cum_excl",
        col("__off") + coalesce(sum(col(weightCol)).over(inBucket), lit(0L)))
      .drop("__bkt", "__off")
  }

  /** Packs rows into `budget`-sized sequences by `orderCol` order:
    * adds `cum_excl` plus
    *   - `seq_id`     — sequence holding the row's FIRST token,
    *   - `seq_offset` — position of that token within the sequence,
    *   - `n_splits`   — boundaries the row straddles (0 = fits whole;
    *                    zero-weight rows straddle nothing by definition).
    */
  def packByOrder(df: DataFrame, orderCol: String, weightCol: String,
      budget: Long, buckets: Int = CumsumBuckets): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = col(weightCol)
    exclusiveCumsum(df, orderCol, weightCol, buckets)
      .withColumn("seq_id", expr(s"cum_excl div ${budget}L"))
      .withColumn("seq_offset", col("cum_excl") % budget)
      .withColumn("n_splits",
        when(w === 0L, 0L).otherwise(
          expr(s"(cum_excl + $weightCol - 1L) div ${budget}L") - col("seq_id")))
  }

  /** Gated query: pack `documents` by doc_id order at [[GateBudget]]
    * tokens, token count = the BPE-ish alnum-run count whose DuckDB
    * parity is already proven by tx_token_stats. */
  def txPackSequences(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        regexp_count(col("text"), lit("[A-Za-z0-9]+")).cast("long").as("n_tokens"))
    packByOrder(toks, "doc_id", "n_tokens", GateBudget)
      .select(col("doc_id"), col("n_tokens"), col("cum_excl"),
        col("seq_id"), col("seq_offset"), col("n_splits"))
      .orderBy(col("doc_id"))
  }

  /** DETERMINISTIC GLOBAL SHUFFLE — the training-order step every
    * pretraining pipeline runs between curation and export (consecutive
    * crawl documents correlate; a model fed un-shuffled shards sees
    * topic runs): assign each doc its position in the corpus-wide
    * pseudo-random order keyed by [[graft.functions.Portable.hash60]]
    * of the text (doc_id tiebreak, so exact-dup texts still get
    * distinct, stable positions). Deterministic — same corpus, same
    * order, any cluster size — unlike `ORDER BY rand()`, which no two
    * runs (or engines) reproduce.
    *
    * The scale problem is the same as [[exclusiveCumsum]]'s: a global
    * rank is a single-partition window. Same cure, two-phase rank:
    * bucket by a monotone function of the hash (uniform `width_bucket`
    * — hashes are uniform by construction, so uniform buckets are
    * balanced WITHOUT the quantile pass ids need), tiny per-bucket
    * count → exclusive offsets window, in-bucket `row_number` over
    * (hash, doc_id). No corpus-wide sort anywhere; the physical write
    * that realizes the order is `repartitionByRange(position)` +
    * `sortWithinPartitions` — range exchange, not a funnel. */
  def globalShuffle(docs: DataFrame, textCol: String, idCol: String,
      buckets: Int = CumsumBuckets): DataFrame = {
    val hashed = docs.select(col(idCol),
      graft.functions.Portable.hash60(col(textCol)).as("h"))
    val bounds = hashed.agg(min(col("h")), max(col("h"))).head()
    if (bounds.isNullAt(0)) return hashed.withColumn("position", lit(0L))
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val bucketed = hashed.withColumn("__bkt",
      expr(s"width_bucket(h, ${lo}L, ${hi + 1}L, $buckets)"))
    val offsets = bucketed.groupBy(col("__bkt"))
      .agg(count(lit(1)).as("__tot"))
      .withColumn("__off",
        coalesce(sum(col("__tot")).over(
          Window.partitionBy(graft.functions.Portable.onePartition(col("__bkt")))
            .orderBy(col("__bkt")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__bkt"), col("__off"))
    val inBucket = Window.partitionBy(col("__bkt"))
      .orderBy(col("h"), col(idCol))
    bucketed.join(broadcast(offsets), "__bkt")
      .withColumn("position",
        col("__off") + row_number().over(inBucket).cast("long") - 1L)
      .drop("__bkt", "__off")
  }

  /** Gated query: the shuffle order of the documents table. */
  def txGlobalShuffle(spark: SparkSession, dir: String): DataFrame =
    globalShuffle(Tables.documents(spark, dir), "text", "doc_id")
      .select(col("doc_id"), col("h"), col("position"))
      .orderBy(col("doc_id"))

  /** The oracle states the order law directly as one global window. */
  val txGlobalShuffleSql: String = s"""
    WITH hashed AS (
      SELECT doc_id, ${graft.functions.Portable.hash60Sql("text")} AS h
      FROM documents)
    SELECT doc_id, h,
           CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS position
    FROM hashed ORDER BY doc_id"""

  /** Token budget per exported shard for the gated query — same
    * corpus-dependent-knob caveat as [[GateBudget]]. */
  val ShardTokens = 2048L

  /** SIZE-BALANCED TRAINING-SHARD EXPORT — the release step after
    * curation/packing: assign every document to a shard such that
    * shards hold ≈`shardTokens` tokens each (whole docs — unlike
    * [[packByOrder]] sequences, export shards never split a document;
    * a shard overflows by at most its last doc), and emit the MANIFEST
    * a consumer checks before training: per shard, the doc count, token
    * sum, id range, and an order-independent content digest (XOR of the
    * per-doc [[graft.functions.Portable.hash60]] — any dropped,
    * duplicated, or swapped doc flips it; XOR rather than SUM so the
    * aggregate cannot overflow and needs no modulus).
    *
    * shard_id = exclusive-cumsum(tokens) div shardTokens — the same
    * deterministic layout law as packing, computed by the same
    * two-phase bucketed prefix sum ([[exclusiveCumsum]]), so no global
    * single-partition window exists here either. The manifest aggregate
    * shuffles one row per DOC (shard_id key), map-side combined; output
    * is one row per shard. At 100 TB the physical write is
    * `df.write.partitionBy("shard_id")` over the assignment this
    * operator returns — the manifest is the verification artifact. */
  def shardManifest(docs: DataFrame, textCol: String, orderCol: String,
      shardTokens: Long, buckets: Int = CumsumBuckets): DataFrame = {
    require(shardTokens > 0, s"shardTokens must be positive, got $shardTokens")
    val toks = docs.select(col(orderCol),
      regexp_count(col(textCol), lit("[A-Za-z0-9]+")).cast("long").as("n_tokens"),
      graft.functions.Portable.hash60(col(textCol)).as("__h"))
    exclusiveCumsum(toks, orderCol, "n_tokens", buckets)
      .withColumn("shard_id", expr(s"cum_excl div ${shardTokens}L"))
      .groupBy(col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col(orderCol)).as("first_doc"),
        max(col(orderCol)).as("last_doc"),
        expr("bit_xor(__h)").as("digest"))
      .orderBy(col("shard_id"))
  }

  /** Gated query: shard manifest of the documents table at
    * [[ShardTokens]] tokens/shard, doc_id order. */
  def txShardManifest(spark: SparkSession, dir: String): DataFrame =
    shardManifest(Tables.documents(spark, dir), "text", "doc_id", ShardTokens)

  /** Per-doc shard ASSIGNMENT carrying the document payload — the
    * relation the physical release write partitions by. Same layout law
    * as [[shardManifest]] (exclusive cumsum div shardTokens, two-phase —
    * the manifest gate keeps its payload-free twin because text has no
    * business flowing through a cumsum when only the aggregate is
    * wanted); any drift between the two would break the roundtrip
    * gate's hash against the shared oracle. */
  def shardAssign(docs: DataFrame, textCol: String, orderCol: String,
      shardTokens: Long, buckets: Int = CumsumBuckets): DataFrame = {
    require(shardTokens > 0, s"shardTokens must be positive, got $shardTokens")
    val toks = docs.select(col(orderCol), col(textCol),
      regexp_count(col(textCol), lit("[A-Za-z0-9]+")).cast("long").as("n_tokens"))
    exclusiveCumsum(toks, orderCol, "n_tokens", buckets)
      .withColumn("shard_id", expr(s"cum_excl div ${shardTokens}L"))
      .select(col(orderCol), col(textCol), col("n_tokens"), col("shard_id"))
  }

  /** Gated query: the PHYSICAL release write, round-tripped — closes
    * the gap where `tx_shard_manifest` oracles the manifest RELATION
    * while nothing proved an actual `write.partitionBy("shard_id")`
    * export lands files whose contents reproduce the manifest (the
    * `k1_file_sink_roundtrip` pattern, applied to the release step):
    *
    *   1. assign shards ([[shardAssign]]) and write (doc_id, text)
    *      physically partitioned by shard_id — repartitioned on the
    *      shard key first, so at scale each shard is written by one
    *      task as one file (partitionBy alone would fan every input
    *      task across every shard dir: tasks × shards small files);
    *   2. RE-READ the export directory — recovering shard membership
    *      from the directory structure alone — and recompute every
    *      manifest column (doc counts, token sums, id ranges, XOR
    *      digests) from the re-read bytes, not from anything remembered
    *      in-plan;
    *   3. gate that reconstruction hash-exact against the SAME oracle
    *      as `tx_shard_manifest`.
    *
    * A dropped/duplicated/corrupted row, a doc landing in the wrong
    * shard dir, or a partition-column round-trip bug each flip a digest
    * or a count. */
  def txShardReleaseRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    // tracked scratch (fresh per call — the gate proves a NEW export
    // lands files ≡ manifest, so reuse would mask a stale-dir read);
    // the harness reclaims it after the returned frame is consumed
    val out = graft.TmpDirs.create("graft_release_shards_")
    shardAssign(Tables.documents(spark, dir), "text", "doc_id", ShardTokens)
      .select(col("doc_id"), col("text"), col("shard_id"))
      .repartition(col("shard_id"))
      .write.mode("overwrite").partitionBy("shard_id").parquet(out)
    spark.read.parquet(out)
      // partition-column inference narrows shard_id to int — pin the
      // manifest's BIGINT before aggregating
      .select(col("doc_id"), col("text"), col("shard_id").cast("long").as("shard_id"))
      .withColumn("__t",
        regexp_count(col("text"), lit("[A-Za-z0-9]+")).cast("long"))
      .withColumn("__h", graft.functions.Portable.hash60(col("text")))
      .groupBy(col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__t")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        expr("bit_xor(__h)").as("digest"))
      .orderBy(col("shard_id"))
  }

  val txShardManifestSql: String = s"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
             ${graft.functions.Portable.hash60Sql("text")} AS h
      FROM documents),
    c AS (
      SELECT doc_id, n_tokens, h,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_excl
      FROM toks)
    SELECT cum_excl // ${ShardTokens} AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc,
           BIT_XOR(h) AS digest
    FROM c GROUP BY shard_id ORDER BY shard_id"""

  /** INCREMENTAL RELEASE APPEND — the workflow releases actually run at
    * 100 TB: a curated corpus ships in waves, and re-sharding the whole
    * corpus per wave is a full-corpus scan per append. This continues
    * an EXISTING manifest instead: the batch's exclusive cumsum is
    * offset by the base manifest's total token mass (one scalar off the
    * manifest — the base DOCS are never read), the boundary shard fills
    * up from where the base left it, and the merged manifest comes from
    * a full-outer join on shard_id with additive counts and XOR'd
    * digests (XOR's identity/associativity is exactly why the manifest
    * digest is an XOR — incremental maintenance is closed under it).
    *
    * Contract: the batch continues the order key PAST the base (checked
    * eagerly — appending out of order would interleave shards the base
    * already sealed). The law the gate pins: append(base, batch) is
    * byte-identical to the full recompute over base ∪ batch — the
    * incremental path buys a batch-sized scan, not a different answer. */
  def shardManifestAppend(baseManifest: DataFrame, batch: DataFrame,
      textCol: String, orderCol: String, shardTokens: Long,
      buckets: Int = CumsumBuckets): DataFrame = {
    require(shardTokens > 0, s"shardTokens must be positive, got $shardTokens")
    val base = baseManifest.select(
      col("shard_id"), col("n_docs").as("__bnd"), col("n_tokens").as("__bnt"),
      col("first_doc").as("__bfd"), col("last_doc").as("__bld"),
      col("digest").as("__bdg"))
    val bounds = base.agg(max(col("__bld")), sum(col("__bnt"))).head()
    val (baseLast, offset) =
      if (bounds.isNullAt(0)) (Long.MinValue, 0L)
      else (bounds.getLong(0), bounds.getLong(1))
    val toks = batch.select(col(orderCol),
      regexp_count(col(textCol), lit("[A-Za-z0-9]+")).cast("long").as("n_tokens"),
      graft.functions.Portable.hash60(col(textCol)).as("__h"))
    val batchMin = toks.agg(min(col(orderCol).cast("long"))).head()
    if (!batchMin.isNullAt(0))
      require(batchMin.getLong(0) > baseLast,
        s"append batch starts at ${batchMin.getLong(0)} but the base " +
          s"manifest already seals keys through $baseLast — appends must " +
          "continue the order key past the base")
    val bm = exclusiveCumsum(toks, orderCol, "n_tokens", buckets)
      .withColumn("shard_id", expr(s"(cum_excl + ${offset}L) div ${shardTokens}L"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("__and"), sum(col("n_tokens")).as("__ant"),
        min(col(orderCol)).as("__afd"), max(col(orderCol)).as("__ald"),
        expr("bit_xor(__h)").as("__adg"))
    base.join(bm, Seq("shard_id"), "full_outer")
      .select(col("shard_id"),
        (coalesce(col("__bnd"), lit(0L)) + coalesce(col("__and"), lit(0L)))
          .as("n_docs"),
        (coalesce(col("__bnt"), lit(0L)) + coalesce(col("__ant"), lit(0L)))
          .as("n_tokens"),
        // base ids precede batch ids by the append contract
        coalesce(col("__bfd"), col("__afd")).as("first_doc"),
        coalesce(col("__ald"), col("__bld")).as("last_doc"),
        coalesce(col("__bdg"), lit(0L))
          .bitwiseXOR(coalesce(col("__adg"), lit(0L))).as("digest"))
      .orderBy(col("shard_id"))
  }

  /** Split point for the gated append: documents below continue into
    * documents at-or-above, proving the incremental path lands exactly
    * on the full recompute. */
  val AppendSplitId = 250L

  /** Gated query: seal a base manifest over the first half of the
    * corpus, append the second half MANIFEST-ONLY (the base docs are
    * not rescanned by the append path), and gate the merged manifest
    * against the full-recompute oracle — the same SQL as
    * `tx_shard_manifest`. */
  def txReleaseAppend(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val base = shardManifest(
      docs.filter(col("doc_id") < AppendSplitId), "text", "doc_id", ShardTokens)
    shardManifestAppend(base,
      docs.filter(col("doc_id") >= AppendSplitId), "text", "doc_id", ShardTokens)
  }

  /** Per-doc shard assignment for an APPEND wave: the batch's exclusive
    * cumsum starts from the base manifest's total token mass — the same
    * offset law as [[shardManifestAppend]], carrying the payload so the
    * physical export can partition by it. Base DOCS are never read;
    * the offset is two scalars off the sealed manifest. Enforces the
    * same order-continuation contract. */
  def shardAssignAppend(baseManifest: DataFrame, batch: DataFrame,
      textCol: String, orderCol: String, shardTokens: Long,
      buckets: Int = CumsumBuckets): DataFrame = {
    require(shardTokens > 0, s"shardTokens must be positive, got $shardTokens")
    val bounds = baseManifest
      .agg(max(col("last_doc")), sum(col("n_tokens"))).head()
    val (baseLast, offset) =
      if (bounds.isNullAt(0)) (Long.MinValue, 0L)
      else (bounds.getLong(0), bounds.getLong(1))
    val toks = batch.select(col(orderCol), col(textCol),
      regexp_count(col(textCol), lit("[A-Za-z0-9]+")).cast("long").as("n_tokens"))
    val batchMin = toks.agg(min(col(orderCol).cast("long"))).head()
    if (!batchMin.isNullAt(0))
      require(batchMin.getLong(0) > baseLast,
        s"append batch starts at ${batchMin.getLong(0)} but the base " +
          s"manifest already seals keys through $baseLast — appends must " +
          "continue the order key past the base")
    exclusiveCumsum(toks, orderCol, "n_tokens", buckets)
      .withColumn("shard_id", expr(s"(cum_excl + ${offset}L) div ${shardTokens}L"))
      .select(col(orderCol), col(textCol), col("n_tokens"), col("shard_id"))
  }

  /** Gated query: the INCREMENTAL-RELEASE PHYSICAL roundtrip — the
    * composition `tx_release_append` (manifest merge) and
    * `tx_release_roundtrip` (physical export) each gate half of:
    * an APPENDED export must land files ≡ the merged manifest without
    * rescanning or rewriting the sealed wave. The gate runs the real
    * two-wave workflow:
    *
    *   1. wave 1 exports the base half partitioned by shard_id and
    *      seals its manifest;
    *   2. wave 2 exports ONLY the batch, offset by the sealed
    *      manifest's token mass ([[shardAssignAppend]] — a batch-sized
    *      scan), in APPEND mode: the boundary shard's directory gains
    *      the batch's continuation file, strictly-new shards appear,
    *      and every base FILE stays byte-untouched — asserted by
    *      inventory (name+length) before/after, because "incremental"
    *      that quietly rewrites history is a full-export in disguise;
    *   3. the whole directory is RE-READ, every manifest column
    *      recomputed from the landed bytes, required row-identical to
    *      [[shardManifestAppend]]'s merged manifest (files ≡ merged
    *      manifest, the composed law), and gated hash-exact against
    *      the full-recompute oracle (same SQL as `tx_shard_manifest`).
    *
    * Scale shape: wave-2 cost is batch-sized (scan, cumsum, write) plus
    * a manifest-sized join — the base corpus is touched only as
    * directory metadata. The file inventory is one listing of
    * shard-count × files-per-shard entries (the export repartitions by
    * shard, so ~1 file per shard), driver-bounded by construction. */
  def txReleaseAppendRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val out = graft.TmpDirs.create("graft_release_append_")
    val baseDocs = docs.filter(col("doc_id") < AppendSplitId)
    val batchDocs = docs.filter(col("doc_id") >= AppendSplitId)
    shardAssign(baseDocs, "text", "doc_id", ShardTokens)
      .select(col("doc_id"), col("text"), col("shard_id"))
      .repartition(col("shard_id"))
      .write.mode("overwrite").partitionBy("shard_id").parquet(out)
    // the sealed artifact of wave 1 — the append path reads THIS, never
    // the base docs (persisted: offset scalars + the merge join both
    // consume it)
    val baseManifest = graft.Caches.persist(
      shardManifest(baseDocs, "text", "doc_id", ShardTokens))
    def inventory(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(out))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.length()).toMap
    }
    val baseFiles = inventory()
    shardAssignAppend(baseManifest, batchDocs, "text", "doc_id", ShardTokens)
      .select(col("doc_id"), col("text"), col("shard_id"))
      .repartition(col("shard_id"))
      .write.mode("append").partitionBy("shard_id").parquet(out)
    val afterFiles = inventory()
    baseFiles.foreach { case (p, len) =>
      require(afterFiles.get(p).contains(len),
        s"incremental release rewrote sealed wave-1 file $p — the append " +
          "path must only add files, never touch the base export")
    }
    // manifest recomputed from the landed bytes only
    val fromFiles = graft.Caches.persist(spark.read.parquet(out)
      .select(col("doc_id"), col("text"),
        col("shard_id").cast("long").as("shard_id"))
      .withColumn("__t",
        regexp_count(col("text"), lit("[A-Za-z0-9]+")).cast("long"))
      .withColumn("__h", graft.functions.Portable.hash60(col("text")))
      .groupBy(col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__t")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        expr("bit_xor(__h)").as("digest"))
      .orderBy(col("shard_id")))
    // files ≡ merged manifest, row for row (both shard-count-bounded)
    val merged = shardManifestAppend(
      baseManifest, batchDocs, "text", "doc_id", ShardTokens)
    require(fromFiles.collect().toSeq == merged.collect().toSeq,
      "re-read export disagrees with the merged manifest — a row moved " +
        "shards, duplicated, or dropped through the append write")
    fromFiles
  }

  /** Gated query: the RELEASE composition — shards cut over the
    * [[globalShuffle]] order instead of doc_id order (shuffle, THEN
    * shard: each shard is a pseudo-random corpus slice, which is the
    * point of shuffling before export). `first_doc`/`last_doc` are
    * positions here — shards cover contiguous POSITION ranges by
    * construction, while their doc ids interleave. One oracle spans
    * both operators, so the hash certifies the composition, not just
    * the parts. */
  def txShuffledShards(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pos = globalShuffle(docs, "text", "doc_id")
      .select(col("doc_id"), col("position"))
    shardManifest(docs.join(pos, "doc_id"), "text", "position", ShardTokens)
  }

  val txShuffledShardsSql: String = s"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
             ${graft.functions.Portable.hash60Sql("text")} AS h
      FROM documents),
    pos AS (
      SELECT doc_id, n_tokens, h,
             CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS position
      FROM toks),
    c AS (
      SELECT position, n_tokens, h,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY position
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_excl
      FROM pos)
    SELECT cum_excl // ${ShardTokens} AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           MIN(position) AS first_doc,
           MAX(position) AS last_doc,
           BIT_XOR(h) AS digest
    FROM c GROUP BY shard_id ORDER BY shard_id"""

  /** Same semantics as one global window cumsum — the oracle states the
    * layout law directly; the engine must land on identical positions
    * through the two-phase path. */
  val txPackSequencesSql: String = s"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, n_tokens,
             -- DuckDB SUM(BIGINT) is HUGEINT -> pandas float64; pin BIGINT
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_excl
      FROM toks)
    SELECT doc_id, n_tokens, cum_excl,
           cum_excl // ${GateBudget} AS seq_id,
           cum_excl % ${GateBudget} AS seq_offset,
           CASE WHEN n_tokens = 0 THEN 0
                ELSE (cum_excl + n_tokens - 1) // ${GateBudget} - cum_excl // ${GateBudget}
           END AS n_splits
    FROM c ORDER BY doc_id"""
}
