package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Distributed PCA over the embeddings table — the standard
  * dimensionality-reduction step before ANN indexing / clustering /
  * visualization of an embedding corpus (and the basis of whitening,
  * which decorrelates dimensions so cosine behaves like Euclidean).
  *
  * Scale shape (the 100 TB story): the model is ONE `treeAggregate`
  * pass computing (n, Σx, ΣxxT) — d=64 means d(d+1)/2 = 2080 doubles
  * of driver state regardless of corpus size; the eigendecomposition
  * of the 64×64 covariance runs on the driver (cyclic Jacobi,
  * deterministic — no RNG, no LAPACK dependency); projection ships the
  * k×d component matrix back as a broadcast-closure constant inside
  * one narrow codegen-friendly projection. Same posture as
  * [[Dsir]]'s histogram and [[HeavyHitters]]' sketch: bounded driver
  * state, one corpus pass per phase, nothing wide.
  *
  * Gating: eigenvectors are sign-ambiguous and iteration-order
  * sensitive in the last ulps, so the projection has no ulp-stable SQL
  * twin — the gated query is rows-only (like `sim_ivf_trained`), and
  * the semantics are asserted in PcaSpec instead: components
  * orthonormal, eigenvalues descending and summing to the covariance
  * trace, per-component projection variance = eigenvalue,
  * reconstruction error at full rank ~ 0, and bit-determinism across
  * fits (fixed sweep order + largest-|entry|-positive sign convention).
  */
object Pca {

  val Dim: Int = Similarity.Dim

  /** Components kept by the gated query. */
  val K = 8

  case class PcaModel(n: Long, mean: Array[Double],
                      eigenvalues: Array[Double],
                      components: Array[Array[Double]]) // row c = component c

  /** One-pass (n, Σx, upper-triangular ΣxxT) accumulator. */
  private final class MomentAcc(d: Int) extends Serializable {
    var n = 0L
    val sum = new Array[Double](d)
    val gram = new Array[Double](d * (d + 1) / 2) // row-major upper triangle
    def add(x: Seq[Float]): MomentAcc = {
      n += 1
      var i = 0; var t = 0
      while (i < sum.length) {
        val xi = x(i).toDouble
        sum(i) += xi
        var j = i
        while (j < sum.length) { gram(t) += xi * x(j).toDouble; j += 1; t += 1 }
        i += 1
      }
      this
    }
    def merge(o: MomentAcc): MomentAcc = {
      n += o.n
      var i = 0
      while (i < sum.length) { sum(i) += o.sum(i); i += 1 }
      i = 0
      while (i < gram.length) { gram(i) += o.gram(i); i += 1 }
      this
    }
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (in-place
    * on a copy). Fixed (p,q) sweep order and a monotone off-diagonal
    * threshold make it deterministic. Returns (eigenvalues desc,
    * eigenvector rows in the same order). */
  private[operators] def jacobiEigen(aIn: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    val a = Array.tabulate(d, d)((i, j) => aIn(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > 1e-12) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off = math.max(off, math.abs(apq))
          if (math.abs(apq) > 1e-14) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // sign(0) must be +1 (equal diagonal → exact 45° rotation),
            // or the rotation degenerates to identity and never converges
            val sgn = if (theta >= 0) 1.0 else -1.0
            val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vpk = v(p)(k); val vqk = v(q)(k)
              v(p)(k) = c * vpk - s * vqk
              v(q)(k) = s * vpk + c * vqk
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // order by eigenvalue desc (stable: equal values keep index order),
    // and fix the sign so each component's largest-|entry| is positive
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = order.map { i =>
      val row = v(i)
      var bi = 0
      var bv = 0.0
      var k = 0
      while (k < d) { if (math.abs(row(k)) > bv) { bv = math.abs(row(k)); bi = k }; k += 1 }
      if (row(bi) < 0) row.map(-_) else row.clone()
    }.toArray
    (evals, evecs)
  }

  /** Fit: one treeAggregate pass + driver-side Jacobi. Covariance uses
    * the n−1 (sample) denominator. */
  def fit(e: DataFrame, k: Int = K): PcaModel = {
    require(k >= 1 && k <= Dim, s"k $k out of [1, $Dim]")
    val spark = e.sparkSession
    import spark.implicits._
    val acc = e.select(col("embedding")).as[Seq[Float]].rdd
      .treeAggregate(new MomentAcc(Dim))((s, x) => s.add(x), (a, b) => a.merge(b))
    require(acc.n >= 2, s"PCA needs >= 2 vectors, got ${acc.n}")
    val n = acc.n.toDouble
    val mean = acc.sum.map(_ / n)
    val cov = Array.ofDim[Double](Dim, Dim)
    var i = 0; var t = 0
    while (i < Dim) {
      var j = i
      while (j < Dim) {
        val c = (acc.gram(t) - n * mean(i) * mean(j)) / (n - 1.0)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; t += 1
      }
      i += 1
    }
    val (evals, evecs) = jacobiEigen(cov)
    PcaModel(acc.n, mean, evals.take(k), evecs.take(k))
  }

  /** Project onto the model's components: one narrow projection, the
    * (k×d) matrix and mean folded in as literals. Output
    * (vec_id, p1..pk) doubles. */
  def project(e: DataFrame, model: PcaModel): DataFrame = {
    val projCols = model.components.zipWithIndex.map { case (comp, c) =>
      // sequential fold Σ_d (x[d] − mean[d])·comp[d] in ascending d —
      // same accumulation-order discipline as Portable.dotDouble
      (1 to Dim).map(d =>
          (element_at(col("embedding"), d).cast("double") - lit(model.mean(d - 1))) *
            lit(comp(d - 1)))
        .reduceLeft(_ + _).as(s"p${c + 1}")
    }
    e.select(col("vec_id") +: projCols.toSeq: _*).orderBy(col("vec_id"))
  }

  /** PCA whitening: the projection scaled by 1/sqrt(eigenvalue), so
    * every output dimension has unit variance and the covariance of the
    * output is the identity — the preprocessing that makes cosine
    * behave like (scaled) Euclidean and stops high-variance directions
    * from dominating ANN distances. Components with eigenvalue ≤ eps
    * are rejected (whitening a near-null direction divides by ~0 and
    * amplifies noise unboundedly — cap k below the effective rank
    * instead). */
  def projectWhitened(e: DataFrame, model: PcaModel,
                      eps: Double = 1e-12): DataFrame = {
    require(model.eigenvalues.forall(_ > eps),
      s"whitening needs strictly positive eigenvalues; got " +
        s"${model.eigenvalues.mkString(", ")} (reduce k below the effective rank)")
    val scaled = model.copy(components = model.components.zip(model.eigenvalues)
      .map { case (comp, ev) => comp.map(_ / math.sqrt(ev)) })
    project(e, scaled)
  }

  /** Gated query (rows-only): fit on the corpus, project every vector
    * onto the top-[[K]] components. */
  def simPcaProject(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    project(e, fit(e, K))
  }

  /** Fixed artifact path for the gated from-model projection. */
  val ModelArtifactPath = "/tmp/graft_artifacts/pca_model"

  /** Persist a model as (c, d, mean, w) rows — component c's weight for
    * dimension d, with the (c-independent) mean alongside. Double
    * parquet round-trips are bit-exact, so reload reproduces the model
    * exactly. */
  def saveModel(spark: SparkSession, m: PcaModel, path: String): Unit = {
    import spark.implicits._
    (for (c <- 1 to m.components.length; d <- 1 to Dim)
      yield (c, d, m.mean(d - 1), m.components(c - 1)(d - 1)))
      .toDF("c", "d", "mean", "w")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadModel(spark: SparkSession, path: String): PcaModel = {
    val rows = spark.read.parquet(path).collect()
    val k = rows.map(_.getInt(0)).max
    val mean = new Array[Double](Dim)
    val comps = Array.ofDim[Double](k, Dim)
    rows.foreach { r =>
      val (c, d) = (r.getInt(0), r.getInt(1))
      mean(d - 1) = r.getDouble(2)
      comps(c - 1)(d - 1) = r.getDouble(3)
    }
    PcaModel(0L, mean, Array.empty, comps)
  }

  /** Gated HASH-EXACT: projection through the PERSISTED model — the
    * [[QualityClassifier.qcScore]] posture applied to PCA. The fit
    * stays rows-only (eigenvectors are sign/iteration-sensitive in the
    * last ulps, PcaSpec pins the semantics), but projection GIVEN the
    * frozen (mean, components) relation is a per-row sequential double
    * fold in ascending dimension — the [[graft.functions.Portable]]
    * `dotDouble` accumulation-order discipline, which DuckDB's
    * `list_sum(list_transform(...))` reproduces bit-for-bit. Both
    * engines read the identical parquet artifact, so the compare pins
    * the model-serving path with zero float tolerance. */
  def simPcaFromModel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    saveModel(spark, fit(e, K), ModelArtifactPath)
    project(e, loadModel(spark, ModelArtifactPath))
  }

  val simPcaFromModelSql: String = s"""
    WITH model AS (
      SELECT c, list(w ORDER BY d) AS ws, list(mean ORDER BY d) AS ms
      FROM read_parquet('$ModelArtifactPath/*.parquet') GROUP BY c),
    proj AS (
      SELECT e.vec_id, m.c,
             list_sum(list_transform(range(1, ${Dim + 1}),
               i -> (e.embedding[i]::DOUBLE - m.ms[i]) * m.ws[i])) AS p
      FROM embeddings e CROSS JOIN model m)
    SELECT vec_id, ${(1 to K).map(c => s"MAX(CASE WHEN c = $c THEN p END) AS p$c").mkString(", ")}
    FROM proj GROUP BY vec_id ORDER BY vec_id"""
}
