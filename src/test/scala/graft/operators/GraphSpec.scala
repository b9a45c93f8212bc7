package graft.operators

import graft.SparkSpec

/** Integer PageRank: the distributed loop must equal an independent
  * in-memory reimplementation of the same integer recurrence, and
  * satisfy the classic rank-ordering properties. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Independent scalar model of the exact integer update. */
  private def model(edges: Seq[(Long, Long)], iters: Int,
                    scale: Long): Map[Long, Long] = {
    val e = edges.distinct
    val odeg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val base = scale * 15 / 100
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => r(s) * 85 / (odeg(s) * 100) }.sum
      }
      r = nodes.map(n => n -> (base + in.getOrElse(n, 0L))).toMap
    }
    r
  }

  test("pageRank equals the scalar model on an asymmetric digraph") {
    // 1→2, 1→3, 2→3, 3→1, 4→3 (4 has no in-edges; 3 is the authority)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L))
    val got = Graph.pageRank(edges.toDF("src", "dst"), iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(got == model(edges, 5, Graph.Scale))
    // 4 receives nothing: exactly the damping base
    assert(got(4L) == Graph.Scale * 15 / 100)
    // 3 has the most in-links but funnels ALL its mass to 1 (odeg 1),
    // while 3's own inflow arrives diluted — so 1 out-ranks 3: rank is
    // recursive authority, not in-degree
    assert(got(1L) == got.values.max && got(1L) > got(3L))
  }

  test("star graph: hub outranks leaves; leaves tie") {
    val leaves = (2L to 9L)
    val edges = leaves.flatMap(l => Seq((1L, l), (l, 1L)))
    val got = Graph.pageRank(edges.toDF("src", "dst"), iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(leaves.map(got).toSet.size == 1, "leaves must tie exactly")
    assert(got(1L) > got(2L) * leaves.size / 2, "hub must dominate")
    assert(got == model(edges, 5, Graph.Scale))
  }

  test("pageRankUntil: stops at a fixpoint bit-equal to fixed-K at its round count") {
    val leaves = (2L to 9L)
    val edges = leaves.flatMap(l => Seq((1L, l), (l, 1L)))
    // 10% of total rank mass: delta decays ~0.85×/round from ~|V|·Scale,
    // so this converges in ~17 rounds — enough to prove the detector
    // without a 100+-round tail chasing single ulps
    val eps = (leaves.size + 1).toLong * Graph.Scale / 10
    val (ranks, rounds) = Graph.pageRankUntil(edges.toDF("src", "dst"), eps)
    assert(rounds > 0 && rounds < 50, s"no convergence in $rounds rounds")
    val got = ranks.as[(Long, Long)].collect().toMap
    // the shared integer update is deterministic, so the converged
    // ranks must equal fixed-K run exactly `rounds` times...
    assert(got == model(edges, rounds, Graph.Scale))
    // ...and be a true fixpoint under eps: one MORE round moves less
    // than eps of L1 mass (the scalar model gives the exact next state)
    val next = model(edges, rounds + 1, Graph.Scale)
    val delta = got.map { case (n, r) => math.abs(next(n) - r) }.sum
    assert(delta <= eps, s"stopped ranks move $delta > eps=$eps")
  }

  test("duplicate edges collapse before degree counting") {
    val once = Graph.pageRank(Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"))
      .as[(Long, Long)].collect().toSet
    val dup = Graph.pageRank(
      Seq((1L, 2L), (1L, 2L), (2L, 1L)).toDF("src", "dst"))
      .as[(Long, Long)].collect().toSet
    assert(once == dup)
  }

  test("triangles: clique counts, bipartite zero, wedge orientation exactness") {
    import org.apache.spark.sql.functions.col
    // K4 on {1..4}: every node sits on C(3,2)=3 triangles
    val k4 = (for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b)).toDF("a", "b")
    val got = Graph.triangleCounts(k4).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $got")
    // bipartite C4 (1-5, 1-6, 2-5, 2-6): wedges exist, no triangle closes
    val c4 = Seq((1L, 5L), (1L, 6L), (2L, 5L), (2L, 6L)).toDF("a", "b")
    assert(Graph.triangleCounts(c4).count() == 0)
  }

  test("kcore: peels the pendant tail, keeps the clique, fixpoint at gate rounds") {
    import org.apache.spark.sql.functions.col
    // K4 {1..4} + tail 4-5-6: the 3-core is exactly the K4 (degree 3 each)
    val edges = ((for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b)) ++
      Seq((4L, 5L), (5L, 6L))).toDF("a", "b")
    val got = Graph.kcore(edges, k = 3, rounds = Graph.CoreRounds)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $got")
    // fixed-round idempotence ON THE GATED GRAPH: one extra round
    // changes nothing, so CoreRounds has truly converged (the oracle
    // mirrors rounds, so this is what makes the gate output THE k-core)
    val e = Graph.cooccurrenceEdges(spark, sf())
    val atRounds = Graph.kcore(e, Graph.CoreK, Graph.CoreRounds)
      .as[(Long, Long)].collect().toSet
    val onePast = Graph.kcore(e, Graph.CoreK, Graph.CoreRounds + 1)
      .as[(Long, Long)].collect().toSet
    assert(atRounds == onePast, "peel must reach its fixpoint within CoreRounds")
  }

  test("pageRankUntil frees superseded iterates instead of pinning one per round") {
    graft.Caches.releaseAll()
    val before = spark.sparkContext.getPersistentRDDs.size
    // asymmetric digraph (a symmetric one starts AT the uniform
    // fixpoint and stops in one round); eps=0 forces the exact integer
    // fixpoint so several rounds run and several iterates are superseded
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 2L), (1L, 3L))
      .toDF("src", "dst")
    val (ranks, rounds) = Graph.pageRankUntil(edges, epsMass = 0L, maxRounds = 10)
    ranks.write.mode("overwrite").format("noop").save()
    assert(rounds >= 2, s"expected a multi-round run, got $rounds")
    // live checkpoint blocks: e/ed/nodes + initial-and-final iterates +
    // slack — NOT one per round (the leak this test pins; Dataset
    // .unpersist alone would leave maxRounds copies)
    val during = spark.sparkContext.getPersistentRDDs.size - before
    assert(during <= 6,
      s"$during checkpointed relations alive after $rounds rounds — " +
        "superseded iterates are not being freed")
    graft.Caches.releaseAll()
    assert(spark.sparkContext.getPersistentRDDs.size <= before,
      "releaseAll should free every tracked checkpoint RDD-level")
  }
}
