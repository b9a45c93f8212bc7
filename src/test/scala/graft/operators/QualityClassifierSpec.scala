package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Trained logistic quality classifier: learning works where the data
  * is learnable, training is bit-deterministic, and the scoring pass
  * is consistent with the model. (The sf corpus itself has NO
  * text↔label correlation — every lang/source draws from one shared
  * vocabulary — so the gated query's accuracy there equals the
  * majority prior by construction; separation is proven on a corpus
  * that has signal.) */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def synth(n: Int) = {
    // positives speak vocab A, negatives vocab B — linearly separable
    val a = Array("alpha", "beta", "gamma", "delta", "epsilon")
    val b = Array("zork", "grue", "xyzzy", "plugh", "foobar")
    (1 to n).map { i =>
      val v = if (i % 2 == 0) a else b
      val words = (0 until 12).map(k => v((i * 7 + k * 3) % v.length))
      (i.toLong, words.mkString(" "), i % 2 == 0)
    }.toDF("doc_id", "text", "y")
  }

  test("separable corpus: perfect train accuracy, loss collapses") {
    val docs = synth(200)
    // mean-of-bucket features are O(1/n_grams) scaled, so separation
    // needs a hotter schedule than the default profile
    val m = QualityClassifier.train(docs, col("y"), iters = 50, lr = 10.0)
    assert(m.loss.head > 0.69 && m.loss.last < 0.1,
      s"loss ${m.loss.head} -> ${m.loss.last}")
    val acc = QualityClassifier.scoreWith(docs, m)
      .join(docs.select(col("doc_id"), col("y")), "doc_id")
      .filter(col("pred") === col("y")).count()
    assert(acc == 200L, s"train accuracy $acc/200")
  }

  test("loss decreases monotonically on the sf corpus") {
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val m = QualityClassifier.train(docs,
      col("source").isin(Dsir.TargetSources: _*), iters = 6)
    m.loss.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-12, s"loss rose: $a -> $b")
    }
    assert(m.loss.last < m.loss.head)
  }

  test("training is bit-deterministic across runs") {
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
      .repartition(7) // different partitioning must not change the model
    val l = col("lang") === "en"
    val m1 = QualityClassifier.train(docs, l, iters = 3)
    val m2 = QualityClassifier.train(docs.repartition(13), l, iters = 3)
    assert(m1.w.sameElements(m2.w) && m1.bias == m2.bias,
      "integer-quantized gradients must make training partition-invariant")
  }

  test("scoreWith: pred <=> positive margin; save/load roundtrip; empty doc") {
    val docs = synth(50)
    val m = QualityClassifier.train(docs, col("y"), iters = 4)
    val scored = QualityClassifier.scoreWith(
      docs.union(Seq((999L, "", false)).toDF("doc_id", "text", "y")), m)
      .as[(Long, Long, Boolean)].collect()
    scored.foreach { case (id, q, pred) =>
      assert(pred == (q > 0), s"doc $id: pred $pred vs q_margin $q")
    }
    // empty doc scores exactly the quantized intercept
    val empty = scored.find(_._1 == 999L).get
    assert(empty._2 == (m.bias * QualityClassifier.QScale).toLong)

    val dir = java.nio.file.Files.createTempDirectory("qc").toString
    QualityClassifier.saveModel(spark, m, s"$dir/m")
    val m3 = QualityClassifier.loadModel(spark, s"$dir/m")
    assert(m3.w.sameElements(m.w) && m3.bias == m.bias)
  }

  test("qcScore: integer decision agrees with the double margin away from 0") {
    import graft.operators.{Dsir, QualityClassifier => QC}
    val dir = sf()
    val docs = graft.sources.Tables.documents(spark, dir)
    val m = QC.train(docs, col("source").isin(Dsir.TargetSources: _*))
    val dbl = QC.scoreWith(docs, m)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r._2).toMap
    val gated = QC.qcScore(spark, dir)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(gated.length == dbl.size)
    gated.foreach { case (id, n, qsum, pred) =>
      // double margin in 1e-9 units vs the fixed-point decision: the two
      // quantizations can only disagree within a few ulps of zero
      val qm = dbl(id)
      if (math.abs(qm) > 1000L)
        assert(pred == (qm > 0), s"doc $id: pred $pred vs q_margin $qm")
      if (n > 0) {
        // q_sum/n tracks the margin-minus-bias at 1e-9 resolution
        val approx = qsum.toDouble / n + m.bias * QC.QScale
        assert(math.abs(approx - qm) < 1e4,
          s"doc $id: integer margin $approx drifts from double $qm")
      }
    }
  }
}
