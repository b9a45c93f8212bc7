package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.sources.Tables

/** Product-quantization (PQ) ANN — the memory-compression scale path
  * next to LSH banding and IVF cells: every corpus vector is encoded as
  * [[M]] small codes (one per [[SubDim]]-dim subspace, [[K]] centroids
  * each → [[M]] bytes/vector vs 256 bytes of float32), and search runs
  * ADC (asymmetric distance computation): the query precomputes a
  * [[M]]×[[K]] table of partial squared distances, so scoring a corpus
  * vector is [[M]] table lookups instead of a [[Similarity.Dim]]-wide
  * dot product. Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011.
  *
  * Cosine correctness: vectors are unit-normalized BEFORE encoding, so
  * squared L2 ranking ≡ cosine ranking (‖x−y‖² = 2 − 2·cos on the unit
  * sphere) — the recall contract is against the cosine brute force.
  *
  * Scale shape: ONE corpus pass computes all queries' ADC scores — the
  * per-query distance tables are tiny driver-built literals folded into
  * the projection (10 queries × 8×16 doubles), so the scan carries no
  * join at all; per-query top-[[Candidates]] goes through a window on
  * the narrow (query_id, vec_id, adc) relation, and only the candidate
  * union joins the float vectors back for the exact re-rank (same
  * candidates-then-verify posture as the LSH/IVF paths). At 100 TB the
  * 32×-smaller code table is the object you can afford to keep hot.
  *
  * Codebook: subvectors of the first [[K]] (normalized) corpus vectors
  * — the same deterministic stand-in as [[Similarity.simIvfTopK]]'s
  * coarse quantizer (a trained per-subspace k-means drops in without
  * changing the plan; see [[Similarity.trainIvfCodebook]]).
  *
  * Gating: `sim_pq_topk` is HASH-EXACT — every arithmetic step is an
  * ascending-index double fold with a proven DuckDB twin (see
  * [[simPqTopKSql]]); recall floors + encode laws in PqSpec/
  * ExtensionSpec pin the semantics besides. */
object Pq {

  val M = 8
  val SubDim = Similarity.Dim / M
  val K = 16
  /** ADC candidates per query fed to the exact re-rank. 150 reflects
    * the synthetic corpus's angular near-uniformity (the hyperplane-LSH
    * hard case documented in [[Similarity]]): an 8×16 codebook on
    * near-uniform directions quantizes coarsely, so the ADC ordering
    * needs a deeper cut before the exact re-rank to hold the 0.85
    * recall floor (measured at sf0.01: recall@5 0.72 with 50
    * candidates, 0.94 with 150).
    * On clustered real-world embeddings the same M×K cuts far sharper;
    * the knob is corpus-dependent, the plan is not. */
  val Candidates = 150

  /** Unit-normalize, failing LOUDLY on a zero vector: an unguarded
    * 0-norm division would turn every distance NaN, and NaN argmins
    * silently collapse all codes to centroid 0 — the ranking would then
    * be pure vec_id tie-break with no error anywhere (the same
    * fail-don't-degrade posture as the density requires below). */
  private def unitOf(v: Array[Float]): Array[Double] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    require(n > 0, "cannot unit-normalize a zero embedding")
    v.map(_ / n)
  }

  /** codebook(m)(c)(d): dim d of subspace m of normalized corpus vector
    * c — collected once (K×Dim floats, driver-tiny). */
  def codebook(e: DataFrame): Array[Array[Array[Double]]] = {
    val first = e.filter(col("vec_id") < K)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1).map(_._2)
    require(first.length == K, s"corpus smaller than the $K-vector codebook")
    Array.tabulate(M, K, SubDim)((m, c, d) => unitOf(first(c))(m * SubDim + d))
  }

  /** Adds `codes` (array<int>, length [[M]]) — the PQ encoding of the
    * unit-normalized `embedding`, through the codegen'd
    * [[graft.functions.PqEncode]] kernel (the equivalent
    * `element_at`-tree form costs M×K×SubDim expression nodes — ~4 s of
    * fixed planning+codegen per run at ANY corpus size, measured).
    * Ties in the argmin break to the lowest centroid index. */
  def encode(e: DataFrame, cb: Array[Array[Array[Double]]]): DataFrame =
    e.withColumn("codes",
      graft.functions.PqKernels.encode(col("embedding"), M, SubDim, K, cb))

  /** ADC tables for the first [[Similarity.QuerySetSize]] vectors:
    * table(q)(m)(c) = ‖query_q subvector m − centroid c‖². */
  def queryTables(e: DataFrame, cb: Array[Array[Array[Double]]])
      : Array[Array[Array[Double]]] = {
    val rows = e.filter(col("vec_id") < Similarity.QuerySetSize)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)
    // downstream plumbing equates table position q with vec_id q (the
    // posexplode pos, element_at(adc, query_id+1), and the self-match
    // filter all rely on it) — a gap in the id range would silently
    // misattribute scores, so demand density like codebook() does
    require(rows.map(_._1).toSeq == (0L until Similarity.QuerySetSize.toLong),
      s"query vec_ids must be dense 0..${Similarity.QuerySetSize - 1}, " +
      s"got ${rows.map(_._1).mkString(",")}")
    val unit = rows.map(r => unitOf(r._2))
    Array.tabulate(unit.length, M, K) { (q, m, c) =>
      (0 until SubDim).map { d =>
        val diff = unit(q)(m * SubDim + d) - cb(m)(c)(d)
        diff * diff
      }.sum
    }
  }

  /** Probed-cell ADC candidates per query for the IVF+PQ composition —
    * deeper than the flat scan's [[Candidates]] is unnecessary: the
    * cell filter has already discarded ~3/4 of the corpus. */
  val IvfPqCandidates = 100

  /** IVF+PQ — the composition production ANN actually deploys at scale
    * (FAISS's IVFADC): the coarse [[Similarity.IVF_CENTROIDS]]-cell
    * quantizer prunes the corpus to [[Similarity.IVF_NPROBE]] probed
    * cells per query, and PQ codes score ONLY the survivors — the two
    * index structures multiply: cells cut the scan ~(nprobe/cells)×,
    * codes make each surviving distance eval M lookups over a 32×
    * smaller table. Exact cosine re-ranks the ADC top-[[IvfPqCandidates]]
    * as always (candidates-then-verify). No residual encoding (classic
    * IVFADC encodes x − centroid; with a 16-cell coarse layer the
    * residual win is marginal and the plain-code variant keeps the
    * SAME code table servable by both the flat scan and this path —
    * one index, two query plans).
    *
    * Gated HASH-EXACT next to `sim_pq_topk` (see [[simIvfPqTopKSql]]);
    * recall floor in PqSpec. */
  def simIvfPqTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val cb = codebook(e)
    val tabs = queryTables(e, cb)
    val cent = e.filter(col("vec_id") < Similarity.IVF_CENTROIDS)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("ce"))
    // one corpus × codebook pass feeds assignment; probes reuse its
    // query rows (same persisted-scan trade as Similarity.ivfTopKWith)
    val assigned = graft.Caches.persist(
      Similarity.assignCells(e, cent)
        .withColumn("codes",
          graft.functions.PqKernels.encode(col("embedding"), M, SubDim, K, cb))
        .select(col("vec_id"), col("centroid_id"), col("codes")))
    val probes = e.filter(col("vec_id") < Similarity.QuerySetSize)
      .crossJoin(broadcast(cent))
      .withColumn("csim", Portable.cosine(col("embedding"), col("ce")))
      .withColumn("rn", row_number().over(Window.partitionBy(col("vec_id"))
        .orderBy(col("csim").desc, col("centroid_id"))))
      .filter(col("rn") <= Similarity.IVF_NPROBE)
      .select(col("vec_id").as("query_id"), col("centroid_id").as("cid"))
    val scored = broadcast(probes)
      .join(assigned.withColumnRenamed("centroid_id", "cid"), "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc", element_at(
        graft.functions.PqKernels.adc(col("codes"), tabs.length, M, K, tabs),
        col("query_id").cast("int") + 1))
      .select(col("query_id"), col("vec_id"), col("adc"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc"), col("vec_id"))
    val candidates = scored
      .withColumn("crn", row_number().over(wAdc))
      .filter(col("crn") <= IvfPqCandidates)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    rerank(e, candidates)
  }

  /** Exact-cosine re-rank of (query_id, neighbor_id) candidates — the
    * shared verify tail of both PQ query plans. */
  private def rerank(e: DataFrame, candidates: DataFrame): DataFrame = {
    val qe = e.filter(col("vec_id") < Similarity.QuerySetSize)
      .select(col("vec_id").cast("long").as("query_id"), col("embedding").as("qe"))
    val ne = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    candidates
      .join(broadcast(qe), "query_id")
      .join(ne, "neighbor_id")
      .withColumn("cosine", Portable.cosine(col("qe"), col("ne")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= Similarity.TopK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The full PQ pipeline as DuckDB SQL — which exists because every
    * arithmetic step is an ascending-index double fold the
    * [[Portable.dotDouble]] law already proves DuckDB reproduces
    * bit-for-bit: unit-normalization (÷ by a correctly-rounded sqrt of
    * a sequential square-sum), per-subspace squared distances
    * (sequential over [[SubDim]] dims), the encode argmin (strict-<
    * keeps the LOWEST centroid on ties ≡ `row_number ORDER BY dist,
    * c`), the ADC sum (ascending subspace ≡ `list_sum(list(dist ORDER
    * BY m))`), and the exact-cosine re-rank (the shared cosineSql law).
    * The ADC layer only SELECTS candidates — the output carries exact
    * cosines — so a last-ulp slip could only matter if it reordered the
    * candidate boundary AND the swapped candidate reached the top-k;
    * the hash compare across both sf dirs shows neither happens. This
    * upgrades `sim_pq_topk` from rows-only to hash-exact. */
  /** Shared CTE prefix of both PQ oracles: unit-normalized vectors,
    * the first-[[K]] codebook subvector lists, the per-(vector,
    * subspace, centroid) squared distances, the encode argmin
    * (`codes`), and the query distance tables (`qt`). */
  private val pqCtePrefixSql: String = {
    val Q = Similarity.QuerySetSize
    val dot = Portable.dotDoubleSql("embedding", "embedding", Similarity.Dim)
    s"""
    WITH e AS (SELECT vec_id, embedding FROM embeddings),
    u AS (
      SELECT vec_id,
             list_transform(range(1, ${Similarity.Dim + 1}),
               i -> embedding[i]::DOUBLE / sqrt($dot)) AS uv
      FROM e),
    cbl AS (
      SELECT m.m, u.vec_id AS c,
             list_transform(range(1, ${SubDim + 1}),
               d -> u.uv[CAST(m.m * $SubDim + d AS INT)]) AS ws
      FROM u CROSS JOIN (SELECT unnest(range(0, $M)) AS m) m
      WHERE u.vec_id < $K),
    dist AS (
      SELECT u.vec_id, cbl.m, cbl.c,
             list_sum(list_transform(range(1, ${SubDim + 1}), d ->
               (u.uv[CAST(cbl.m * $SubDim + d AS INT)] - cbl.ws[CAST(d AS INT)]) *
               (u.uv[CAST(cbl.m * $SubDim + d AS INT)] - cbl.ws[CAST(d AS INT)])))
               AS dist
      FROM u CROSS JOIN cbl),
    codes AS (
      SELECT vec_id, m, c AS code
      FROM (SELECT vec_id, m, c,
                   row_number() OVER (PARTITION BY vec_id, m
                     ORDER BY dist, c) AS rn
            FROM dist)
      WHERE rn = 1),
    qt AS (SELECT vec_id AS query_id, m, c, dist FROM dist WHERE vec_id < $Q)"""
  }

  /** Shared exact-cosine re-rank tail over a `cand(query_id,
    * neighbor_id)` CTE — mirrors [[rerank]]. */
  private val pqRerankTailSql: String = s"""
    pairs AS (
      SELECT query_id, neighbor_id,
             ${Portable.cosineSql("qe.embedding", "ne.embedding", Similarity.Dim)} AS cosine
      FROM cand
      JOIN e qe ON qe.vec_id = cand.query_id
      JOIN e ne ON ne.vec_id = cand.neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, cosine,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
      FROM pairs)"""

  val simPqTopKSql: String = s"""
    $pqCtePrefixSql,
    adc AS (
      SELECT cd.vec_id, qt.query_id,
             list_sum(list(qt.dist ORDER BY cd.m)) AS adc
      FROM codes cd JOIN qt ON qt.m = cd.m AND qt.c = cd.code
      WHERE cd.vec_id <> qt.query_id
      GROUP BY cd.vec_id, qt.query_id),
    cand AS (
      SELECT query_id, vec_id AS neighbor_id
      FROM (SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY adc, vec_id) AS crn
            FROM adc)
      WHERE crn <= $Candidates),
    $pqRerankTailSql
    SELECT CAST(query_id AS INT) AS query_id, rank, neighbor_id, cosine
    FROM ranked WHERE rank <= ${Similarity.TopK}
    ORDER BY query_id, rank"""

  /** The IVF+PQ composition as SQL — the PQ prefix plus the coarse-cell
    * assign/probe relation ([[Similarity.simIvfTopK]]'s proven cosine
    * law), ADC restricted to probed-cell members, the
    * [[IvfPqCandidates]] cut, and the shared re-rank tail. Upgrades
    * `sim_ivf_pq_topk` from rows-only to hash-exact by the same
    * fold-order argument as [[simPqTopKSql]]. */
  val simIvfPqTopKSql: String = {
    val Q = Similarity.QuerySetSize
    val cos = Portable.cosineSql("e.embedding", "c.embedding", Similarity.Dim)
    s"""
    $pqCtePrefixSql,
    csim AS (
      SELECT e.vec_id, c.vec_id AS centroid_id, $cos AS csim
      FROM e CROSS JOIN e c WHERE c.vec_id < ${Similarity.IVF_CENTROIDS}),
    cellrn AS (
      SELECT vec_id, centroid_id,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY csim DESC, centroid_id) AS rn
      FROM csim),
    assign AS (SELECT vec_id AS neighbor_id, centroid_id AS cid
               FROM cellrn WHERE rn = 1),
    probes AS (SELECT vec_id AS query_id, centroid_id AS cid
               FROM cellrn WHERE vec_id < $Q AND rn <= ${Similarity.IVF_NPROBE}),
    pcand AS (
      SELECT query_id, neighbor_id FROM probes JOIN assign USING (cid)
      WHERE query_id <> neighbor_id),
    adc AS (
      SELECT pc.query_id, pc.neighbor_id,
             list_sum(list(qt.dist ORDER BY cd.m)) AS adc
      FROM pcand pc
      JOIN codes cd ON cd.vec_id = pc.neighbor_id
      JOIN qt ON qt.query_id = pc.query_id AND qt.m = cd.m AND qt.c = cd.code
      GROUP BY pc.query_id, pc.neighbor_id),
    cand AS (
      SELECT query_id, neighbor_id
      FROM (SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY adc, neighbor_id) AS crn
            FROM adc)
      WHERE crn <= $IvfPqCandidates),
    $pqRerankTailSql
    SELECT query_id, rank, neighbor_id, cosine
    FROM ranked WHERE rank <= ${Similarity.TopK}
    ORDER BY query_id, rank"""
  }

  /** PQ-ADC top-k: encode the corpus, score every query against the
    * codes in one pass, exact-cosine re-rank the top-[[Candidates]]. */
  def simPqTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val cb = codebook(e)
    val tabs = queryTables(e, cb)
    val scored = encode(e, cb)
      .select(col("vec_id"),
        posexplode(graft.functions.PqKernels.adc(
          col("codes"), tabs.length, M, K, tabs)).as(Seq("query_id", "adc")))
      .filter(col("vec_id") =!= col("query_id"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc"), col("vec_id"))
    val candidates = scored
      .withColumn("crn", row_number().over(wAdc))
      .filter(col("crn") <= Candidates)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    rerank(e, candidates)
  }
}
