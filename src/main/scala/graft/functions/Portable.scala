package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable primitives: every helper here has a bit-identical DuckDB
  * SQL formulation (the paired `*Sql` string builders), so operators built
  * from them can be oracle-checked exactly — no float tolerance, no seed
  * dependence. This is what makes MinHash/SimHash/LSH verifiable rather
  * than rows-only.
  */
object Portable {

  /** 60-bit hash of a string via md5: first 15 hex chars as a long,
    * computed by the codegen'd [[Hash60]] expression (digest bytes
    * directly — no hex string/`conv` round-trip; bit-identical to
    * `conv(substring(md5(x), 1, 15), 16, 10)`).
    * DuckDB: `('0x' || substr(md5(x),1,15))::BIGINT`. */
  def hash60(c: Column): Column = Hash60.hash60(c)

  def hash60Sql(x: String): String =
    s"CAST('0x' || substr(md5($x), 1, 15) AS BIGINT)"

  /** Mersenne prime 2^31-1 — modulus for the MinHash permutation family. */
  val P: Long = 2147483647L

  /** hash60 reduced into [0, P) for overflow-safe affine permutations. */
  def hashP(c: Column): Column = pmod(hash60(c), lit(P))

  /** Constant-but-NON-FOLDABLE single-partition window key. Spark 4's
    * `EliminateWindowPartitions` optimizer rule strips FOLDABLE keys
    * (`lit(k)` included) from window partitionSpecs, leaving them empty
    * — and WindowExec warns "No Partition Defined … single partition"
    * on every run for empty specs, burying real warnings in bench
    * logs. `coalesce(anchor, 0) % 1` evaluates to one partition but
    * survives the rule (attribute references are never foldable). Use
    * ONLY over frames that are tiny by contract — the single partition
    * is still real. PlanSpec pins the absence of empty partitionSpecs
    * suite-wide. */
  def onePartition(anchor: Column): Column =
    pmod(coalesce(anchor.cast("long"), lit(0L)), lit(1L))
  def hashPSql(x: String): String = s"(${hash60Sql(x)} % $P + $P) % $P"

  /** Word array of a space-separated text. */
  def words(c: Column): Column = split(c, " ")
  def wordsSql(x: String): String = s"string_split($x, ' ')"

  /** Shingle width. Word 4-grams, not bigrams: the synthetic corpus has a
    * ~30-word vocabulary, so bigrams are near-universal (931 distinct
    * across 5000 sf0.1 docs, hottest in 338 docs → the shingle equi-join
    * explodes to 73M pairs). 4-grams are selective (210k distinct,
    * hottest 6, 361k join pairs) — the same document-frequency argument
    * applies to any low-entropy corpus at 100 TB. */
  val ShingleN = 4

  /** Distinct word n-gram shingles. Guard: Spark's `sequence(1, 0)` counts
    * DOWN (yields [1,0]) so short texts need the explicit empty case;
    * DuckDB's `range(1, 1)` is already empty. */
  def shingles(c: Column, n: Int = ShingleN): Column = {
    val w = words(c)
    when(size(w) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k)): _*))))
  }

  def shinglesSql(x: String, n: Int = ShingleN): String = {
    val parts = (0 until n).map(k => s"${wordsSql(x)}[i+$k]").mkString(" || ' ' || ")
    s"""list_distinct(list_transform(range(1, len(${wordsSql(x)}) - ${n - 2}),
        i -> $parts))"""
  }

  /** Word n-grams WITHOUT the distinct — one element per occurrence, for
    * operators that weight by count (DSIR feature histograms) rather
    * than set membership (shingle dedup). Same guard as [[shingles]]. */
  def ngrams(c: Column, n: Int): Column = {
    val w = words(c)
    when(size(w) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k)): _*)))
  }

  def ngramsSql(x: String, n: Int): String = {
    val parts = (0 until n).map(k => s"${wordsSql(x)}[i+$k]").mkString(" || ' ' || ")
    s"list_transform(range(1, len(${wordsSql(x)}) - ${n - 2}), i -> $parts)"
  }

  /** Sequential-fold double dot product of two float arrays — identical to
    * DuckDB's `list_sum(list_transform(range(1, n+1), i -> x[i]::DOUBLE *
    * y[i]::DOUBLE))` (DuckDB's own `list_inner_product` accumulates in
    * FLOAT and does NOT match). */
  def dotDouble(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (a, b) => a.cast("double") * b.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def dotDoubleSql(x: String, y: String, dim: Int): String =
    s"list_sum(list_transform(range(1, ${dim + 1}), i -> $x[i]::DOUBLE * $y[i]::DOUBLE))"

  /** Cosine similarity in sequential double arithmetic — the codegen'd
    * custom expression ([[CosineSimilarity]]); same fold as the built-in
    * `dotDouble` composition and the SQL formulation. */
  def cosine(x: Column, y: Column): Column =
    CosineSimilarity.cosineSim(x, y)

  def cosineSql(x: String, y: String, dim: Int): String =
    s"""(${dotDoubleSql(x, y, dim)} /
        (sqrt(${dotDoubleSql(x, x, dim)}) * sqrt(${dotDoubleSql(y, y, dim)})))"""

  /** Recursive-CTE connected-components tail — THE oracle statement of
    * "min reachable id in the undirected pair graph", shared by every
    * clustering oracle (semantic dedup, duplicate clusters, entity
    * resolution, the semantic-curation capstone) so the closure
    * semantics exist in exactly one place. Defines
    * `${prefix}edges` / `${prefix}reach` / `${prefix}labels` from a
    * pair relation exposing `id_a`/`id_b`; `labels` carries
    * (`idName`, `labelName`). Quadratic in component size — fine for an
    * oracle, never for the engine (that side is
    * [[graft.operators.Cluster]]). Callers must open `WITH RECURSIVE`. */
  def closureLabelsSql(pairsRel: String, idName: String,
                       labelName: String = "cluster_id",
                       prefix: String = ""): String = s"""
    ${prefix}edges AS (
      SELECT id_a AS src, id_b AS dst FROM $pairsRel
      UNION
      SELECT id_b AS src, id_a AS dst FROM $pairsRel),
    ${prefix}reach AS (
      SELECT src, dst FROM ${prefix}edges
      UNION
      SELECT r.src, e2.dst
      FROM ${prefix}reach r JOIN ${prefix}edges e2 ON r.dst = e2.src),
    ${prefix}labels AS (
      SELECT src AS $idName, LEAST(src, MIN(dst)) AS $labelName
      FROM ${prefix}reach GROUP BY src)"""
}
