package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class PqSpec extends SparkSpec {
  import spark.implicits._

  test("encode laws: codes in range, codebook vectors self-encode") {
    val e = Tables.embeddings(spark, sf())
    val cb = Pq.codebook(e)
    assert(cb.length == Pq.M && cb.forall(_.length == Pq.K) &&
      cb.forall(_.forall(_.length == Pq.SubDim)))
    val codes = Pq.encode(e, cb)
      .select($"vec_id", $"codes").as[(Long, Seq[Int])].collect().toMap
    assert(codes.values.forall(cs =>
      cs.length == Pq.M && cs.forall(c => c >= 0 && c < Pq.K)))
    // vector c IS centroid c of every subspace -> exact self-encode
    (0L until Pq.K.toLong).foreach { c =>
      assert(codes(c) == Seq.fill(Pq.M)(c.toInt),
        s"codebook vector $c should self-encode, got ${codes(c)}")
    }
  }

  test("ADC approximates unit-sphere distance: table lookup == recomputed partial") {
    val e = Tables.embeddings(spark, sf())
    val cb = Pq.codebook(e)
    val tabs = Pq.queryTables(e, cb)
    assert(tabs.length == Similarity.QuerySetSize)
    // spot-recompute table entries against the definition
    val q0 = e.filter($"vec_id" === 0).select($"embedding")
      .as[Seq[Float]].head().toArray
    val n0 = math.sqrt(q0.map(x => x.toDouble * x).sum)
    (0 until Pq.M).foreach { m =>
      (0 until Pq.K).foreach { c =>
        val expect = (0 until Pq.SubDim).map { d =>
          val diff = q0(m * Pq.SubDim + d) / n0 - cb(m)(c)(d)
          diff * diff
        }.sum
        assert(math.abs(tabs(0)(m)(c) - expect) < 1e-12)
      }
    }
  }

  test("PQ ANN recall@5 vs brute force meets the floor") {
    val bf = Similarity.simBruteForceTopK(spark, sf("sf0.01"))
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val pq = Pq.simPqTopK(spark, sf("sf0.01"))
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect pq).size.toDouble / bf.size
    info(s"PQ recall@5 at sf0.01 = $recall")
    assert(recall >= 0.85, s"PQ ANN recall@5 $recall below floor")
  }

  test("IVF+PQ recall@5 vs brute force meets the floor") {
    val bf = Similarity.simBruteForceTopK(spark, sf("sf0.01"))
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val ivfpq = Pq.simIvfPqTopK(spark, sf("sf0.01"))
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    graft.Caches.releaseAll()
    val recall = (bf intersect ivfpq).size.toDouble / bf.size
    info(s"IVF+PQ recall@5 at sf0.01 = $recall")
    assert(recall >= 0.8, s"IVF+PQ recall@5 $recall below floor")
    // the cell prune can only LOSE candidates vs the flat PQ scan at
    // equal depth; with the deeper IvfPqCandidates cut it must still
    // return full result sets
    assert(ivfpq.size == bf.size, "result sets must be TopK per query")
  }

  test("Matryoshka prefix search: recall floor and full-rank agreement on survivors") {
    val bf = Similarity.simBruteForceTopK(spark, sf("sf0.01"))
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val pf = Similarity.simPrefixTopK(spark, sf("sf0.01"))
      .select($"query_id", $"neighbor_id", $"cosine")
      .as[(Long, Long, Double)].collect()
    val recall = (bf intersect pf.map(t => (t._1, t._2)).toSet).size.toDouble / bf.size
    info(s"prefix-search recall@5 at sf0.01 = $recall")
    // the synthetic corpus is NOT MRL-trained (prefix carries 1/4 of a
    // uniform signal), so the floor is modest; the semantics gate is the
    // hash-exact oracle, this pins the coarse pass stays useful at all
    assert(recall >= 0.3, s"prefix recall@5 $recall below floor")
    // survivors must carry the TRUE full-dim cosine (re-rank is exact)
    val full = Similarity.simBruteForceTopK(spark, sf("sf0.01"))
    val trueCos = full.select($"query_id", $"neighbor_id", $"cosine")
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    pf.foreach { case (q, n, c) =>
      trueCos.get((q, n)).foreach(exp => assert(c == exp, s"cosine drift at ($q,$n)")) }
  }

  test("scored scan carries no join: tables fold in as literals") {
    val e = Tables.embeddings(spark, sf())
    val plan = Pq.simPqTopK(spark, sf()).queryExecution.executedPlan.toString
    // the only joins are the candidate re-rank joins AFTER the window;
    // specifically no cartesian/BNLJ anywhere
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }
}
