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

  /** 60-bit hash of a string via md5: first 15 hex chars as a long.
    * DuckDB: `('0x' || substr(md5(x),1,15))::BIGINT`. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def hash60Sql(x: String): String =
    s"CAST('0x' || substr(md5($x), 1, 15) AS BIGINT)"

  /** Mersenne prime 2^31-1 — modulus for the MinHash permutation family. */
  val P: Long = 2147483647L

  /** hash60 reduced into [0, P) for overflow-safe affine permutations. */
  def hashP(c: Column): Column = pmod(hash60(c), lit(P))
  def hashPSql(x: String): String = s"(${hash60Sql(x)} % $P + $P) % $P"

  /** Word array of a space-separated text. */
  def words(c: Column): Column = split(c, " ")
  def wordsSql(x: String): String = s"string_split($x, ' ')"

  /** Distinct word-bigram shingles. Guard: Spark's `sequence(1, 0)` counts
    * DOWN (yields [1,0]) so short texts need the explicit empty case;
    * DuckDB's `range(1, 1)` is already empty. */
  def bigramShingles(c: Column): Column = {
    val w = words(c)
    when(size(w) < 2, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(w) - 1),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1)))))
  }

  def bigramShinglesSql(x: String): String =
    s"""list_distinct(list_transform(range(1, len(${wordsSql(x)})),
        i -> ${wordsSql(x)}[i] || ' ' || ${wordsSql(x)}[i+1]))"""

  /** Sequential-fold double dot product of two float arrays — identical to
    * DuckDB's `list_sum(list_transform(range(1, n+1), i -> x[i]::DOUBLE *
    * y[i]::DOUBLE))` (DuckDB's own `list_inner_product` accumulates in
    * FLOAT and does NOT match). */
  def dotDouble(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (a, b) => a.cast("double") * b.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def dotDoubleSql(x: String, y: String, dim: Int): String =
    s"list_sum(list_transform(range(1, ${dim + 1}), i -> $x[i]::DOUBLE * $y[i]::DOUBLE))"

  /** Cosine similarity in sequential double arithmetic. */
  def cosine(x: Column, y: Column): Column =
    dotDouble(x, y) / (sqrt(dotDouble(x, x)) * sqrt(dotDouble(y, y)))

  def cosineSql(x: String, y: String, dim: Int): String =
    s"""(${dotDoubleSql(x, y, dim)} /
        (sqrt(${dotDoubleSql(x, x, dim)}) * sqrt(${dotDoubleSql(y, y, dim)})))"""
}
