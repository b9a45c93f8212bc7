package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Connected components ([[Cluster.connectedComponents]]) and the
  * operators composed on it. The oracle gate checks dd_cluster /
  * sim_semantic_dedup end-to-end; these tests pin the primitive's
  * semantics on hand graphs where the expected components are obvious,
  * including the chain case pair-wise dedup gets wrong. */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val out = Cluster.connectedComponents(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    graft.Caches.releaseAll()
    out
  }

  test("chain a-b-c collapses to one component labeled min id") {
    // the motivating case: (1,2) and (2,3) near-dup pairs but no (1,3)
    // pair — pair-wise deletion keeps two docs, components keep one
    assert(cc(Seq((2L, 1L), (2L, 3L))) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("disjoint components keep distinct labels") {
    val got = cc(Seq((1L, 2L), (10L, 11L), (11L, 12L), (20L, 21L)))
    assert(got == Map(1L -> 1L, 2L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("long chain converges (diameter rounds) and a cycle does not loop") {
    val chain = (0L until 12L).sliding(2).map(p => (p(1), p(0))).toSeq
    val cycle = Seq((30L, 31L), (31L, 32L), (32L, 30L))
    val got = cc(chain ++ cycle)
    assert((0L until 12L).forall(got(_) == 0L))
    assert(Seq(30L, 31L, 32L).forall(got(_) == 30L))
  }

  test("clustering leaves no cached relations after release") {
    Dedup.ddCluster(spark, sf()).write.mode("overwrite").format("noop").save()
    graft.Caches.releaseAll()
    assert(spark.sharedState.cacheManager.isEmpty,
      "CacheManager should be empty after Caches.releaseAll()")
  }

  test("semantic dedup keeps exactly one representative per cluster") {
    val rows = Similarity.simSemanticDedup(spark, sf())
      .select($"vec_id", $"cluster_id", $"keep").as[(Long, Long, Boolean)]
      .collect()
    graft.Caches.releaseAll()
    assert(rows.nonEmpty, "sf0.001 embeddings should contain near-dup pairs")
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      assert(members.count(_._3) == 1, s"cluster $cid must keep exactly one")
      assert(members.filter(_._3).head._1 == members.map(_._1).min,
        s"cluster $cid representative must be the min vec_id")
      assert(cid == members.map(_._1).min, s"cluster label must be the min id")
    }
  }
}
