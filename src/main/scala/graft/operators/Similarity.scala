package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Portable
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the embeddings table
  * (`embedding: array<float>[64]`).
  *
  * Two paths:
  *   - [[simBruteForceTopK]]: exact cosine top-k — broadcast the (small)
  *     query set against the corpus, per-query window top-k. O(Q·N·d);
  *     the CORRECTNESS baseline, and still the right plan when Q is tiny
  *     (the corpus is scanned once, no index build).
  *   - [[simLshTopK]]: random-hyperplane LSH — an 8-bit signed-projection
  *     bucket per vector, candidates = same-bucket pairs, exact cosine
  *     re-rank within bucket. At 100 TB the bucket join replaces the
  *     all-pairs product; recall is tested against the brute-force path
  *     in ScalaTest. Hyperplanes are ±1 vectors derived from the portable
  *     hash (no RNG, no seed) so the whole path — including bucket ids —
  *     is reproducible in DuckDB SQL and oracle-checked.
  *
  * All dot products are sequential double folds ([[Portable.dotDouble]])
  * — bit-identical between Spark and the DuckDB formulation.
  */
object Similarity {

  val Dim = 64
  val Planes = 8
  val QuerySetSize = 10
  val TopK = 5

  /** Deterministic ±1 hyperplane weight for (plane, dim): the parity of
    * the portable 60-bit hash of "plane_dim". Materialized as Scala
    * constants at class-load (pure function of constants). */
  lazy val planeSigns: Array[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(Planes, Dim) { (p, d) =>
      val hex = md.digest(s"${p}_$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      if ((java.lang.Long.parseLong(hex, 16) & 1L) == 1L) 1 else -1
    }
  }

  /** Signed projection of an embedding onto plane `p` (sequential fold). */
  private def projection(x: Column, p: Int): Column =
    aggregate(
      zip_with(x, typedLit(planeSigns(p).map(_.toDouble).toSeq), (v, s) => v.cast("double") * s),
      lit(0.0), (acc, v) => acc + v)

  private def projectionSql(x: String, p: Int): String = {
    val signs = planeSigns(p).mkString("[", ", ", "]")
    s"list_sum(list_transform(range(1, ${Dim + 1}), i -> $x[i]::DOUBLE * ($signs)[i]))"
  }

  /** LSH bucket id: Planes sign bits packed into an int. */
  def bucketId(x: Column): Column =
    (0 until Planes).map(p =>
      when(projection(x, p) > 0, lit(1 << p)).otherwise(lit(0)))
      .reduce(_ + _)

  def bucketIdSql(x: String): String =
    (0 until Planes).map(p =>
      s"CASE WHEN ${projectionSql(x, p)} > 0 THEN ${1 << p} ELSE 0 END")
      .mkString("(", " + ", ")")

  /** Exact cosine top-K neighbors for the first [[QuerySetSize]] vectors. */
  def simBruteForceTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val cand = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(q).join(cand, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Portable.cosine(col("qe"), col("ne")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  val simBruteForceTopKSql: String = s"""
    WITH pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ${Portable.cosineSql("q.embedding", "c.embedding", Dim)} AS cosine
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < $QuerySetSize),
    ranked AS (
      SELECT query_id, neighbor_id, cosine,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
      FROM pairs)
    SELECT query_id, rank, neighbor_id, cosine
    FROM ranked WHERE rank <= $TopK
    ORDER BY query_id, rank"""

  /** LSH-bucketed ANN: same output shape, but neighbors only searched
    * within the query's hyperplane bucket. */
  def simLshTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .withColumn("bucket", bucketId(col("embedding")))
    val q = e.filter(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("bucket"))
    val cand = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"),
      col("bucket").as("nbucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(q).join(cand,
        col("bucket") === col("nbucket") && col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Portable.cosine(col("qe"), col("ne")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  val simLshTopKSql: String = s"""
    WITH b AS (
      SELECT vec_id, embedding, ${bucketIdSql("embedding")} AS bucket
      FROM embeddings),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ${Portable.cosineSql("q.embedding", "c.embedding", Dim)} AS cosine
      FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
      WHERE q.vec_id < $QuerySetSize),
    ranked AS (
      SELECT query_id, neighbor_id, cosine,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
      FROM pairs)
    SELECT query_id, rank, neighbor_id, cosine
    FROM ranked WHERE rank <= $TopK
    ORDER BY query_id, rank"""

  /** Embedding-cosine near-duplicate pairs (cosine ≥ 0.35 among the first
    * 200 vectors — the all-pairs form; the LSH bucket join is the scale
    * form of the same predicate). */
  def simCosineNearDup(spark: SparkSession, dir: String): DataFrame = {
    // single-file table → repartition so the O(n²) cosine work spreads
    // across cores instead of inheriting one input partition
    val e = Tables.embeddings(spark, dir).filter(col("vec_id") < 200)
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", Portable.cosine(col("ea"), col("eb")))
      .filter(col("cosine") >= 0.35)
      .select(col("id_a"), col("id_b"), col("cosine"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val simCosineNearDupSql: String = s"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ${Portable.cosineSql("a.embedding", "b.embedding", Dim)} AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.vec_id < 200 AND b.vec_id < 200
      AND ${Portable.cosineSql("a.embedding", "b.embedding", Dim)} >= 0.35
    ORDER BY id_a, id_b"""
}
