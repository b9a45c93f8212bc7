package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Portable
import graft.sources.Tables

/** Entity resolution: fuzzy record matching with an EXACT recall
  * guarantee, no quadratic pass.
  *
  * The reference pipeline has no fuzzy matching (its filter surface is
  * equality/null predicates, reference `PipelineProcessor.scala:120-135`);
  * this is the record-linkage step a real curation pipeline needs when
  * the same entity arrives spelled slightly differently from two feeds.
  *
  * == Algorithm: deletion-neighborhood blocking (FastSS family) ==
  * Let `D_k(s)` be the set of strings obtainable from `s` by deleting
  * at most `k` characters. If `levenshtein(u, v) <= k` then
  * `D_k(u) ∩ D_k(v)` is non-empty: align u and v under a minimal edit
  * script — deleting from u every position it substitutes or inserts,
  * and from v every position it is substituted by or deletes, leaves
  * the identical common subsequence, and each side deleted at most k
  * chars. So generating `D_k` per row and equi-joining on the variant
  * string finds EVERY qualifying pair — recall 1.0 by construction,
  * like LSH banding but exact. Shared variants also arise from pairs
  * beyond distance k (u del 2 = v del 2 can bridge distance up to 4),
  * so candidates are verified with the codegen'd `levenshtein` builtin;
  * precision comes from the verify, recall from the blocking.
  *
  * == Scale shape ==
  * The variant relation is ids-only — (8-byte id, short string), the
  * name travels NOWHERE through the blocking shuffle; names join back
  * by id only onto the DEDUPED candidate pairs, so the wide strings
  * touch one equi-join over the (collision-bounded) candidate set
  * instead of riding every variant row (~3× narrower variant shuffle on
  * short names, more on long ones). |D_1| ≈ len+1 variants/row;
  * |D_2| ≈ C(len,2) — the documented growth price of the deeper radius
  * (≈170 variants for an 18-char name; `array_distinct` inside the
  * generator keeps repeated-char duplicates out of the exchange).
  * The equi-join shuffles candidates only — bucket sizes are bounded by
  * how many strings actually collide on a variant, never n²; the probe
  * section of [[graft.ScaleProbe]] measures candidates ∝ collisions on
  * a 10× synthetic name corpus. Verification is a per-candidate
  * codegen'd expression. This is the canonical 100 TB fuzzy-join:
  * generate-with-guarantee, verify-exact. The whole pipeline is builtin
  * expressions (sequence/transform/flatten/explode/levenshtein) —
  * whole-stage codegen end to end, no UDF.
  */
object EntityResolution {

  /** All pairs (idA < idB) with `levenshtein(name_a, name_b) <= maxDist`.
    * `maxDist` ∈ {1, 2}: the variant count per row is ~len+1 at 1 and
    * ~C(len,2) at 2 — radius 3+ squares it again (C(len,3) plus far
    * looser candidate precision) and wants a different blocker
    * (q-gram/LSH) rather than a deeper neighborhood. */
  def fuzzyMatchPairs(rows: DataFrame, idCol: String, nameCol: String,
                      maxDist: Int = 1): DataFrame =
    fuzzyMatchPairsUnordered(rows, idCol, nameCol, maxDist)
      .orderBy(col("id_a"), col("id_b"))

  /** The unordered core — consumers that immediately destroy order
    * (clustering's symmetrize/distinct in [[erCluster]]) take this and
    * skip the gated wrapper's global sort (a range-partition + sort
    * exchange over the whole pair relation, bought for nothing). */
  def fuzzyMatchPairsUnordered(rows: DataFrame, idCol: String,
                               nameCol: String, maxDist: Int): DataFrame = {
    // persisted: BOTH sides of the variant self-join consume this
    // relation, and the differing id_a/id_b projections block exchange
    // reuse — without the persist the (compute-bound, ~L²/2 string
    // builds per row at maxDist=2) generation runs twice, measured ~2×
    // on the sf0.1 d2 gate. Same rule as Dedup.nearDupPairsOf's banded.
    val variants = graft.Caches.persist(
      variantHashes(rows, idCol, nameCol, maxDist))
    val a = variants.select(col("id").as("id_a"), col("variant"))
    val b = variants.select(col("id").as("id_b"), col("variant"))
    // one pair can share several variants; dedup BEFORE the name
    // join-back and the verify so each runs once per candidate pair
    val candidates = a.join(b, Seq("variant"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val names = rows.select(col(idCol).as("id"), col(nameCol).as("name"))
    verifyPairs(candidates, names, maxDist)
  }

  /** The ids-only blocking relation — (id, 8-byte variant hash), one row
    * per deletion variant. This is both halves' shared state: the batch
    * join consumes it twice, and the streaming ingest
    * ([[graft.streaming.StreamingPipeline.startErPairStore]]) PERSISTS
    * it per batch as the accumulated match index, so stream ≡ batch is
    * by construction, not by parallel implementation.
    *
    * Variants ship as 60-bit slice hashes, not strings
    * ([[graft.functions.DelVariantHash60s]] — one codegen'd kernel,
    * MD5 streamed over the byte ranges around the deleted codepoints,
    * NO variant string ever allocated; it replaced a nested
    * transform/concat/array_distinct/xxhash64 chain that built ~C(L,2)
    * strings per row and dominated the sf0.1 d2 gate at ~7.7 s): equal
    * variants keep equal hashes (recall unchanged); a cross-string hash
    * collision can only ADD a candidate, which the exact levenshtein
    * verify kills — the generate-with-guarantee/verify-exact contract,
    * with a ~2× narrower shuffle on realistic name lengths. */
  def variantHashes(rows: DataFrame, idCol: String, nameCol: String,
                    maxDist: Int): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"deletion-neighborhood blocking implemented for maxDist in {1, 2}, got $maxDist")
    // repartition first: the input often arrives as ONE parquet file →
    // one partition, which would serialize the (compute-bound) variant
    // generation onto a single core — measured 4× on the sf0.1 gate.
    // Same rule as Dedup.augmented: compute-bound stages must not
    // inherit file partitioning.
    val spread = rows.repartition(
      rows.sparkSession.sparkContext.defaultParallelism, col(idCol))
    spread.select(
      col(idCol).as("id"),
      explode(graft.functions.DelVariantHash60s.variantHashes(
        col(nameCol), maxDist)).as("variant"))
  }

  /** Exact-levenshtein verify + name join-back over DEDUPED candidate
    * (id_a, id_b) pairs — `names` is the (id, name) relation covering
    * every id the candidates mention. Unordered output; callers sort. */
  def verifyPairs(candidates: DataFrame, names: DataFrame,
                  maxDist: Int): DataFrame =
    candidates
      .join(names.select(col("id").as("id_a"), col("name").as("name_a")), "id_a")
      .join(names.select(col("id").as("id_b"), col("name").as("name_b")), "id_b")
      .filter(levenshtein(col("name_a"), col("name_b")) <= maxDist)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"))

  /** Gated query: customer names within edit distance 1 of each other.
    * The synthetic names ("Customer#000000042") make near-misses dense —
    * every pair of custkeys whose zero-padded digits differ in one
    * position qualifies — so the oracle output is a real workload, not a
    * handful of planted rows. */
  def erFuzzyMatch(spark: SparkSession, dir: String): DataFrame =
    fuzzyMatchPairs(Tables.customer(spark, dir), "c_custkey", "c_name")

  /** Gated query: the radius-2 variant — two substituted digits, or a
    * transposition (distance 2 as two substitutions), now qualify. */
  def erFuzzyMatchD2(spark: SparkSession, dir: String): DataFrame =
    fuzzyMatchPairs(Tables.customer(spark, dir), "c_custkey", "c_name",
      maxDist = 2)

  /** DuckDB oracle: the quadratic ground truth the blocking must equal.
    * (The oracle may be O(n²) at sf0.01 — the Spark side must not be.) */
  private def erOracleSql(maxDist: Int): String = s"""
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           a.c_name AS name_a, b.c_name AS name_b
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= $maxDist
    ORDER BY id_a, id_b"""

  val erFuzzyMatchSql: String = erOracleSql(1)
  val erFuzzyMatchD2Sql: String = erOracleSql(2)

  /** Oracle for the entity-erasure gate
    * ([[graft.streaming.StreamingGates.streamErDelete]]): the SAME
    * quadratic ground truth over the customers MINUS the deleted slice.
    * ER pairs are pairwise-local (whether a,b match depends on nobody
    * else), so delete-then-continue must be INDISTINGUISHABLE from
    * never having ingested the deleted records — which is exactly this
    * filtered recompute. */
  def erFuzzyMatchExcludingSql(pred: String): String = s"""
    WITH kept AS (
      SELECT c_custkey, c_name FROM customer WHERE NOT ($pred))
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           a.c_name AS name_a, b.c_name AS name_b
    FROM kept a JOIN kept b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    ORDER BY id_a, id_b"""

  /** Entity CLUSTERS from the fuzzy pairs — the golden-record step that
    * turns pair-wise matches into resolved entities: connected
    * components over the match graph ([[Cluster.connectedComponents]]),
    * min-id label as the entity id, the label-carrier flagged
    * `canonical` (a production run would pick the survivor by
    * recency/completeness — same plan, different ranking key).
    * Pair-wise output alone under-links chains (a~b, b~c with a≁c is
    * ONE entity); components close the chain — the same argument as
    * [[graft.operators.Dedup.ddCluster]] for duplicate groups, here
    * applied to the record-linkage graph. Rows not in any pair are
    * singleton entities and are absent, as from the pair relation.
    *
    * Scale shape: blocking as [[fuzzyMatchPairs]]; clustering is one
    * shuffle per round over the (pair-graph-sized) vertex set, rounds =
    * component diameter — near-dup name graphs are shallow. */
  def erCluster(spark: SparkSession, dir: String): DataFrame = {
    val pairs = fuzzyMatchPairsUnordered(Tables.customer(spark, dir),
      "c_custkey", "c_name", maxDist = 1)
    Cluster.connectedComponents(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      .select(col("id").as("c_custkey"), col("cluster_id").as("entity_id"),
        (col("id") === col("cluster_id")).as("canonical"))
      .orderBy(col("c_custkey"))
  }

  /** Oracle: the quadratic pair ground truth closed transitively by a
    * recursive CTE — the [[graft.operators.Similarity.simSemanticDedupSql]]
    * recursion tail over the ER match graph. */
  val erClusterSql: String = s"""
    WITH RECURSIVE p AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
      FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= 1),
    ${Portable.closureLabelsSql("p", "c_custkey", labelName = "entity_id")}
    SELECT c_custkey, entity_id, c_custkey = entity_id AS canonical
    FROM labels ORDER BY c_custkey"""
}
