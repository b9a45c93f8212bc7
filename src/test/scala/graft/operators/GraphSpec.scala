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

  test("duplicate edges collapse before degree counting") {
    val once = Graph.pageRank(Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"))
      .as[(Long, Long)].collect().toSet
    val dup = Graph.pageRank(
      Seq((1L, 2L), (1L, 2L), (2L, 1L)).toDF("src", "dst"))
      .as[(Long, Long)].collect().toSet
    assert(once == dup)
  }
}
