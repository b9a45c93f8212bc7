package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Entity resolution: fuzzy record matching with an EXACT recall
  * guarantee, no quadratic pass.
  *
  * The reference pipeline has no fuzzy matching (its filter surface is
  * equality/null predicates, reference `PipelineProcessor.scala:120-135`);
  * this is the record-linkage step a real curation pipeline needs when
  * the same entity arrives spelled slightly differently from two feeds.
  *
  * == Algorithm: deletion-neighborhood blocking ==
  * For edit distance ≤ 1, if `levenshtein(u, v) <= 1` then u and v share
  * a member of the set `{s} ∪ {s minus one char}` (delete the
  * substituted/inserted position from whichever side has it). So
  * generating the ~(len+1) deletion variants per row and equi-joining on
  * the variant string finds EVERY qualifying pair — recall 1.0 by
  * construction, like LSH banding but exact. Shared variants can also
  * arise from true-distance-2 pairs (u del i = v del j, i ≠ j), so
  * candidates are verified with the codegen'd `levenshtein` builtin;
  * precision comes from the verify, recall from the blocking.
  *
  * == Scale shape ==
  * The variant relation is ~(len+1)·n narrow rows (two longs + a short
  * string); the equi-join shuffles candidates only — bucket sizes are
  * bounded by how many strings actually collide on a variant, never n².
  * Verification is a per-candidate codegen'd expression. This is the
  * canonical 100 TB fuzzy-join: generate-with-guarantee, verify-exact.
  * The whole pipeline is builtin expressions (sequence/transform/
  * explode/levenshtein) — whole-stage codegen end to end, no UDF.
  */
object EntityResolution {

  /** All pairs (idA < idB) with `levenshtein(name_a, name_b) <= maxDist`.
    * `maxDist` must be 1 — the deletion-neighborhood guarantee is for a
    * single edit (for d>1 one would block on d-deletion neighborhoods;
    * variant count grows as C(len, d), documented not implemented). */
  def fuzzyMatchPairs(rows: DataFrame, idCol: String, nameCol: String,
                      maxDist: Int = 1): DataFrame = {
    require(maxDist == 1, "deletion-neighborhood blocking implemented for maxDist=1")
    // variant 0 = the string itself; variant i>=1 = the string with char i
    // deleted. All builtin higher-order functions -> codegen'd, no UDF.
    val variants = rows.select(
        col(idCol).as("id"), col(nameCol).as("name"),
        explode(expr(
          s"""transform(sequence(0, length($nameCol)),
              i -> case when i = 0 then $nameCol
                   else concat(substr($nameCol, 1, i - 1), substr($nameCol, i + 1)) end)"""
        )).as("variant"))
    val a = variants.select(col("id").as("id_a"), col("name").as("name_a"),
      col("variant"))
    val b = variants.select(col("id").as("id_b"), col("name").as("name_b"),
      col("variant"))
    a.join(b, Seq("variant"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"))
      // one pair can share several variants (repeated chars); dedup the
      // candidate pair before the verify so levenshtein runs once per pair
      .distinct()
      .filter(levenshtein(col("name_a"), col("name_b")) <= maxDist)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Gated query: customer names within edit distance 1 of each other.
    * The synthetic names ("Customer#000000042") make near-misses dense —
    * every pair of custkeys whose zero-padded digits differ in one
    * position qualifies — so the oracle output is a real workload, not a
    * handful of planted rows. */
  def erFuzzyMatch(spark: SparkSession, dir: String): DataFrame =
    fuzzyMatchPairs(Tables.customer(spark, dir), "c_custkey", "c_name")

  /** DuckDB oracle: the quadratic ground truth the blocking must equal.
    * (The oracle may be O(n²) at sf0.01 — the Spark side must not be.) */
  val erFuzzyMatchSql: String = """
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           a.c_name AS name_a, b.c_name AS name_b
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    ORDER BY id_a, id_b"""
}
