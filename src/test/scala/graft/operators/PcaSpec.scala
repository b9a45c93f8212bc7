package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic checks for the PCA fit/project path — the gated query is
  * rows-only (eigenvectors have no ulp-stable SQL twin), so the linear-
  * algebra contract is asserted here instead. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = graft.sources.Tables.embeddings(spark, sf())
  private lazy val full = Pca.fit(e, Pca.Dim) // full-rank model

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("components are orthonormal") {
    val c = full.components
    for (i <- c.indices; j <- i until c.length) {
      val d = dot(c(i), c(j))
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(d - expect) < 1e-9, s"<c$i,c$j> = $d")
    }
  }

  test("eigenvalues are descending, non-negative, and sum to the total variance") {
    val ev = full.eigenvalues
    ev.sliding(2).foreach { case Array(a, b) => assert(a >= b - 1e-12) }
    assert(ev.forall(_ >= -1e-9), "covariance eigenvalues must be >= 0")
    val totalVar = e.select((1 to Pca.Dim).map(i =>
        var_samp(element_at($"embedding", i).cast("double"))).reduce(_ + _))
      .head.getDouble(0)
    assert(math.abs(ev.sum - totalVar) / totalVar < 1e-9,
      s"trace mismatch: ${ev.sum} vs $totalVar")
  }

  test("per-component projection variance equals the eigenvalue") {
    val proj = Pca.project(e, Pca.PcaModel(full.n, full.mean,
      full.eigenvalues.take(3), full.components.take(3)))
    val vars = proj.select(var_samp($"p1"), var_samp($"p2"), var_samp($"p3"))
      .head
    (0 until 3).foreach { i =>
      val v = vars.getDouble(i)
      assert(math.abs(v - full.eigenvalues(i)) / full.eigenvalues(i) < 1e-6,
        s"var(p${i + 1}) $v != eigenvalue ${full.eigenvalues(i)}")
    }
  }

  test("full-rank projection reconstructs the input") {
    val rows = Pca.project(e, full).limit(5).collect()
    val orig = e.orderBy($"vec_id").limit(5)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    rows.foreach { r =>
      val x = orig(r.getLong(0))
      val recon = (0 until Pca.Dim).map { d =>
        full.mean(d) + full.components.indices
          .map(c => r.getDouble(c + 1) * full.components(c)(d)).sum
      }
      (0 until Pca.Dim).foreach { d =>
        assert(math.abs(recon(d) - x(d)) < 1e-4,
          s"vec ${r.getLong(0)} dim $d: ${recon(d)} vs ${x(d)}")
      }
    }
  }

  test("fit is deterministic across runs") {
    val a = Pca.fit(e, 4)
    val b = Pca.fit(e, 4)
    assert(a.n == b.n)
    assert(a.mean.sameElements(b.mean))
    assert(a.eigenvalues.sameElements(b.eigenvalues))
    a.components.zip(b.components).foreach { case (x, y) =>
      assert(x.sameElements(y))
    }
  }

  test("gated projection: one row per vector, K + 1 scalar columns") {
    val p = Pca.simPcaProject(spark, sf())
    assert(p.columns.toSeq == "vec_id" +: (1 to Pca.K).map(i => s"p$i"))
    assert(p.count() == e.count())
  }

  test("whitened projection has unit variance per component, identity covariance") {
    val model = Pca.PcaModel(full.n, full.mean,
      full.eigenvalues.take(3), full.components.take(3))
    val w = Pca.projectWhitened(e, model)
    val stats = w.select(var_samp($"p1"), var_samp($"p2"), var_samp($"p3"),
      covar_samp($"p1", $"p2"), covar_samp($"p1", $"p3"), covar_samp($"p2", $"p3"))
      .head
    (0 until 3).foreach(i =>
      assert(math.abs(stats.getDouble(i) - 1.0) < 1e-9,
        s"whitened var(p${i + 1}) = ${stats.getDouble(i)}"))
    (3 until 6).foreach(i =>
      assert(math.abs(stats.getDouble(i)) < 1e-9,
        s"whitened cross-covariance ${stats.getDouble(i)} != 0"))
  }

  test("whitening rejects a rank-deficient model") {
    val degenerate = Pca.PcaModel(full.n, full.mean,
      Array(full.eigenvalues(0), 0.0),
      Array(full.components(0), full.components(1)))
    val ex = intercept[IllegalArgumentException] {
      Pca.projectWhitened(e, degenerate)
    }
    assert(ex.getMessage.contains("effective rank"))
  }

  test("save/load roundtrip is bit-exact; from-model projection equals direct") {
    val e = graft.sources.Tables.embeddings(spark, sf())
    val m = Pca.fit(e, Pca.K)
    val dir = java.nio.file.Files.createTempDirectory("pca").toString
    Pca.saveModel(spark, m, s"$dir/m")
    val m2 = Pca.loadModel(spark, s"$dir/m")
    assert(m2.mean.sameElements(m.mean))
    assert(m2.components.zip(m.components).forall { case (a, b) => a.sameElements(b) })
    // doubles round-trip parquet exactly, so the projections are equal
    val direct = Pca.project(e, m).collect().toSeq
    val loaded = Pca.project(e, m2).collect().toSeq
    assert(direct == loaded)
  }

  test("jacobi solves a known 2x2 exactly") {
    // [[2,1],[1,2]] has eigenvalues 3 (along [1,1]) and 1 (along [1,-1])
    val (ev, vec) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(ev(0) - 3.0) < 1e-12 && math.abs(ev(1) - 1.0) < 1e-12)
    val inv = 1.0 / math.sqrt(2.0)
    assert(math.abs(math.abs(dot(vec(0), Array(inv, inv))) - 1.0) < 1e-12)
    assert(math.abs(math.abs(dot(vec(1), Array(inv, -inv))) - 1.0) < 1e-12)
  }
}
