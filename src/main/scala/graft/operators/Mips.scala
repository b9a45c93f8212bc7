package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Portable
import graft.sources.Tables

/** Maximum-inner-product search (MIPS) over the embeddings table.
  *
  * Cosine ANN ([[Similarity]]) ranks by angle; MIPS ranks by the raw dot
  * product ⟨q, x⟩ — the scoring used when the embedding NORM carries
  * signal (retrieval scores, recommender item popularity, classifier
  * logits). The two orders differ exactly when corpus norms vary, so
  * MIPS is a distinct operator, not a cosine variant.
  *
  * Two paths, mirroring the cosine family:
  *   - [[simMipsTopK]]: exact brute force — broadcast the query set,
  *     one corpus pass, per-query window top-k. O(Q·N·d), the
  *     correctness baseline, hash-exact against DuckDB (the dot is the
  *     same sequential double fold every `sim_*` oracle uses).
  *   - [[mipsLshTopK]]: the scale path via the norm-augmentation
  *     reduction (Neyshabur & Srebro, "On Symmetric and Asymmetric
  *     LSHs for Inner Product Search", ICML 2015, and Bachrach et al.,
  *     RecSys 2014): append one coordinate
  *     `x̂ = [x, sqrt(M² − ‖x‖²)]`, `q̂ = [q, 0]` where M is the corpus
  *     max norm. Then ‖x̂‖ = M for every corpus vector, so
  *     cos(q̂, x̂) = ⟨q,x⟩ / (‖q‖·M) — monotone in the inner product —
  *     and the existing random-hyperplane banding machinery
  *     ([[graft.functions.HyperplaneBuckets]]) applies unchanged on the
  *     (d+1)-dim family. Candidates from shared buckets re-rank by the
  *     EXACT dot on the original vectors. Recall vs [[simMipsTopK]] is
  *     pinned in ExtensionSpec, and `sim_mips_lsh` is gated HASH-EXACT
  *     against [[mipsLshTopKSql]] — the augmented coordinate's float
  *     round-trip and the 65-dim projections replicate bit-for-bit in
  *     DuckDB (same IEEE FLOAT cast, same sequential folds).
  *
  * Scale shape: the augmentation is one narrow projection (norms are a
  * per-row fold, M is one driver scalar via a tree-aggregated max); the
  * band index is `tables` short rows per vector exactly like the cosine
  * banding, so the 100 TB posture is identical to [[Similarity]] — and
  * the persisted-index path ([[AnnIndex]]) would hold the augmented
  * family the same way.
  */
object Mips {

  import Similarity.{Dim, QuerySetSize, TopK, TOPK_TABLES, TOPK_PLANES}

  /** Sign family for the augmented (d+1)-dim space. Same MD5-parity
    * construction as [[Similarity.planeSigns]]; the first [[Dim]]
    * columns of each plane coincide with the cosine family, the extra
    * column is the parity at d = [[Dim]]. */
  lazy val augSigns: Array[Array[Int]] =
    Similarity.mkSigns(TOPK_TABLES * TOPK_PLANES, Dim + 1)

  /** Exact MIPS top-K for the first [[Similarity.QuerySetSize]] vectors:
    * rank by ⟨q, x⟩ (sequential double fold), ties by neighbor_id. */
  def simMipsTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val cand = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("neighbor_id"))
    broadcast(q).join(cand, col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", Portable.dotDouble(col("qe"), col("ne")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("dot"))
      .orderBy(col("query_id"), col("rank"))
  }

  val simMipsTopKSql: String = s"""
    WITH pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ${Portable.dotDoubleSql("q.embedding", "c.embedding", Dim)} AS dot
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < $QuerySetSize),
    ranked AS (
      SELECT query_id, neighbor_id, dot,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY dot DESC, neighbor_id) AS INT) AS rank
      FROM pairs)
    SELECT query_id, rank, neighbor_id, dot
    FROM ranked WHERE rank <= $TopK
    ORDER BY query_id, rank"""

  /** Norm-augmented corpus relation (vec_id, aug: array<float>[Dim+1]).
    * `m2` is the corpus max squared norm; the augmented coordinate is
    * sqrt(max(m2 − ‖x‖², 0)) — the max() guards the float rounding of
    * the maximal vector itself. */
  private[operators] def augmented(e: DataFrame, m2: Double): DataFrame = {
    val n2 = Portable.dotDouble(col("embedding"), col("embedding"))
    e.select(col("vec_id"), col("embedding"),
      concat(col("embedding"),
        array(sqrt(greatest(lit(m2) - n2, lit(0.0))).cast("float"))).as("aug"))
  }

  /** The full MIPS-LSH pipeline as DuckDB SQL — hash-exact after all
    * (the scaladoc above's last-ulp caution proved unfounded in
    * practice): the max-norm scalar is a max over per-row sequential
    * dots (order-independent), the augmented coordinate's FLOAT
    * round-trip is the same IEEE round-to-nearest in both engines
    * (`CAST(... AS FLOAT)`), each hyperplane projection is the proven
    * sequential fold over the 64 float dims plus one ordered extra
    * term (`(Σ₆₄) + s₆₅·augc` — the kernel's own association), the
    * query side's zero coordinate contributes exactly ±0.0 in both,
    * and the re-rank is the shared exact-dot law. Verified hash-exact
    * at sf0.01 AND sf0.1. */
  val mipsLshTopKSql: String = {
    val dot = Portable.dotDoubleSql("embedding", "embedding", Dim)
    def proj(p: Int, withAug: Boolean): String = {
      val sl = augSigns(p).take(Dim).mkString("[", ", ", "]")
      val base = s"list_sum(list_transform(range(1, ${Dim + 1}), " +
        s"i -> embedding[i]::DOUBLE * ($sl)[i]))"
      if (withAug) s"($base + ${augSigns(p)(Dim)} * augc::DOUBLE)" else s"($base)"
    }
    def bucket(t: Int, withAug: Boolean): String =
      (0 until TOPK_PLANES).map(i =>
        s"CASE WHEN ${proj(t * TOPK_PLANES + i, withAug)} > 0 THEN ${1 << i} ELSE 0 END")
        .mkString("(", " + ", ")")
    def bands(rel: String, withAug: Boolean, where: String): String =
      (0 until TOPK_TABLES).map(t =>
        s"SELECT vec_id, $t AS tbl, ${bucket(t, withAug)} AS bucket FROM $rel$where")
        .mkString("\n      UNION ALL\n      ")
    s"""
    WITH e AS (SELECT vec_id, embedding FROM embeddings),
    m2 AS (SELECT MAX($dot) AS v FROM e),
    a AS (
      SELECT vec_id, embedding,
             CAST(sqrt(greatest((SELECT v FROM m2) - $dot, 0)) AS FLOAT) AS augc
      FROM e),
    cbands AS (
      ${bands("a", withAug = true, "")}),
    qbands AS (
      ${bands("e", withAug = false, s" WHERE vec_id < $QuerySetSize")}),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM qbands q JOIN cbands c
        ON q.tbl = c.tbl AND q.bucket = c.bucket AND q.vec_id <> c.vec_id),
    pairs AS (
      SELECT query_id, neighbor_id,
             ${Portable.dotDoubleSql("qe.embedding", "ne.embedding", Dim)} AS dot
      FROM cand
      JOIN e qe ON qe.vec_id = cand.query_id
      JOIN e ne ON ne.vec_id = cand.neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, dot,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY dot DESC, neighbor_id) AS INT) AS rank
      FROM pairs)
    SELECT query_id, rank, neighbor_id, dot
    FROM ranked WHERE rank <= $TopK
    ORDER BY query_id, rank"""
  }

  /** Approximate MIPS top-K through the augmentation + hyperplane LSH:
    * band the augmented corpus ([[augSigns]]), band queries as [q, 0],
    * candidates = shared bucket in any table, exact-dot re-rank. */
  def mipsLshTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val m2Row = e.select(max(Portable.dotDouble(col("embedding"), col("embedding")))).head
    require(!m2Row.isNullAt(0), "MIPS LSH needs a non-empty embeddings corpus")
    val m2 = m2Row.getDouble(0)
    // one banding pass over the augmented corpus feeds both join sides
    // (queries ARE corpus rows here, with aug coordinate 0 — but a query
    // batch from outside the corpus bands identically via [q, 0])
    val aug = graft.Caches.persist(augmented(e, m2))
    def bands(df: DataFrame, idCol: String): DataFrame =
      df.select(col("vec_id").as(idCol),
        posexplode(graft.functions.HyperplaneBuckets.buckets(
          col("aug"), TOPK_TABLES, TOPK_PLANES, augSigns)).as(Seq("tbl", "bucket")))
    val qb = bands(aug.filter(col("vec_id") < QuerySetSize)
        .select(col("vec_id"),
          concat(col("embedding"), array(lit(0.0f))).as("aug")), "query_id")
    val cb = bands(aug, "neighbor_id")
      .select(col("neighbor_id"), col("tbl").as("tbl_b"), col("bucket").as("bucket_b"))
    val candidates = broadcast(qb).join(cb,
        col("tbl") === col("tbl_b") && col("bucket") === col("bucket_b") &&
        col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    val qe = e.filter(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val ne = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("neighbor_id"))
    candidates
      .join(broadcast(qe), "query_id")
      .join(ne, "neighbor_id")
      .withColumn("dot", Portable.dotDouble(col("qe"), col("ne")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("dot"))
      .orderBy(col("query_id"), col("rank"))
  }
}
