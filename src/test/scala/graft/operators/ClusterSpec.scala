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

  test("empty edge set yields an empty label frame, not an NPE") {
    // legal input: a clean corpus produces zero verified pairs
    assert(cc(Seq.empty[(Long, Long)]) == Map.empty[Long, Long])
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

  private def ccAlt(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val out = Cluster.connectedComponentsAlternating(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    graft.Caches.releaseAll()
    out
  }

  test("alternating star contraction matches the propagator on mixed graphs") {
    val graphs = Seq(
      Seq((2L, 1L), (2L, 3L)),
      Seq.empty[(Long, Long)],
      Seq((1L, 2L), (10L, 11L), (11L, 12L), (20L, 21L)),
      (0L until 12L).sliding(2).map(p => (p(1), p(0))).toSeq
        ++ Seq((30L, 31L), (31L, 32L), (32L, 30L)),
      Seq((5L, 5L)),                         // self-loop-only vertex stays labeled
      Seq((7L, 3L), (3L, 7L), (7L, 3L)))     // duplicate + reversed edges
    graphs.foreach { g =>
      assert(ccAlt(g) == cc(g), s"divergence on $g")
    }
  }

  test("alternating contraction converges on a 1000-chain in O(log^2) rounds") {
    // the adversarial case for min-label propagation: diameter 999 needs
    // 1000 propagation rounds (MaxRounds-capped); star contraction
    // roughly halves chain length per alternation
    val n = 1000L
    val chain = spark.range(n - 1)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    val (labels, rounds) = Cluster.alternatingWithRounds(chain)
    val got = labels.as[(Long, Long)].collect()
    graft.Caches.releaseAll()
    assert(got.length == n)
    assert(got.forall(_._2 == 0L), "every chain vertex must label to min id 0")
    val bound = 2 * math.pow(math.log(n.toDouble) / math.log(2), 2)
    assert(rounds <= bound.toInt,
      s"$rounds rounds exceeds the 2·log² bound ${bound.toInt}")
  }

  test("stratified sample equalizes strata and is deterministic") {
    val a = TextAnalysis.txStratifiedSample(spark, sf())
      .as[(Long, String)].collect()
    val b = TextAnalysis.txStratifiedSample(spark, sf())
      .as[(Long, String)].collect()
    assert(a.sameElements(b), "hash sampling must be re-runnable bit-identically")
    val perLang = a.groupBy(_._2).view.mapValues(_.length)
    val (lo, hi) = (perLang.values.min, perLang.values.max)
    // every stratum is sampled toward the smallest; permille flooring and
    // hash granularity leave bounded spread, not the raw 3x lang skew
    assert(hi <= lo * 2, s"strata should be near-equal after rebalance: $perLang")
  }

  test("clustering leaves no cached relations after release") {
    Dedup.ddCluster(spark, sf()).write.mode("overwrite").format("noop").save()
    graft.Caches.releaseAll()
    assert(spark.sharedState.cacheManager.isEmpty,
      "CacheManager should be empty after Caches.releaseAll()")
  }

  test("span dedup removes exactly the cross-corpus repeated blocks") {
    // doc 1/2 share block "a b c"; doc 3 repeats "x y z" within itself;
    // doc 4 is unique; doc 5 is shorter than one block (partial tail)
    val docs = Seq(
      (1L, "a b c p q r"), (2L, "a b c s t u"),
      (3L, "x y z m m m x y z"), (4L, "only unique words here ok yes"),
      (5L, "hi")).toDF("doc_id", "text")
    val got = Dedup.spanDedup(docs, 3)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      1L -> ("p q r", 1L),              // shared "a b c" block dropped
      2L -> ("s t u", 1L),
      3L -> ("m m m", 2L),              // within-doc repeat dropped twice
      4L -> ("only unique words here ok yes", 0L),
      5L -> ("hi", 0L)))                // partial tail block is a block
  }

  test("substring dedup removes repeats at ANY alignment, unlike block dedup") {
    // docs 1/2 share the 4-token run "a b c d" but at DIFFERENT offsets
    // (1-based pos 2 vs pos 1): block dedup at w=3 would cut them into
    // non-identical blocks ("x a b"/"c d y" vs "a b c"/"d z w") and
    // remove nothing; overlapping windows catch the shared run exactly.
    // doc 3 repeats "m n o" within itself at overlapping-free offsets;
    // doc 4 is unique; doc 5 is shorter than one window.
    val docs = Seq(
      (1L, "x a b c d y"), (2L, "a b c d z w"),
      (3L, "m n o t m n o"), (4L, "only unique words here ok"),
      (5L, "hi")).toDF("doc_id", "text")
    val got = Dedup.substringDedup(docs, 3)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      1L -> ("x y", 4L),                // covered: a b c d (pos 2-5)
      2L -> ("z w", 4L),                // covered: a b c d (pos 1-4)
      3L -> ("t", 6L),                  // both m n o copies removed
      4L -> ("only unique words here ok", 0L),
      5L -> ("hi", 0L)), s"got $got")
  }

  test("incremental substring dedup equals from-scratch restricted to the batch") {
    val base = Seq(
      (1L, "x a b c d y"), (3L, "m n o t m n o"),
      (4L, "only unique words here ok")).toDF("doc_id", "text")
    // append doc 2 duplicates "a b c d" ONLY against base doc 1 (a
    // cross-batch repeat the batch alone cannot see), and docs 6/7
    // share "p q r" within the append batch itself
    val app = Seq(
      (2L, "a b c d z w"), (6L, "p q r u v"), (7L, "k p q r j"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("subidx").toString
    val idx = Dedup.buildSubstringIndex(spark, base, 3, s"$dir/idx")
    val inc = Dedup.substringDedupIncremental(app, idx, 3)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(inc == Map(
      2L -> (("z w", 4L)), 6L -> (("u v", 3L)), 7L -> (("k j", 3L))),
      s"got $inc")
    // the contract the gate states: equal to from-scratch on base∪append
    // restricted to the appended ids
    val scratch = Dedup.substringDedup(base.unionByName(app), 3)
      .filter(col("doc_id") >= 2L && col("doc_id") =!= 3L && col("doc_id") =!= 4L)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(inc == scratch)
  }

  test("collision-verify survives a planted collision the hash form over-deletes on") {
    // A real 60-bit collision is not constructible on demand, so the
    // test injects a deliberately COARSE window hash — the first token
    // only — giving docs 1/2 hash-equal but string-UNEQUAL windows
    // ("p q r" vs "p z w": a planted collision), while docs 3/4 are a
    // true duplicate (equal strings, equal hashes either way).
    val docs = Seq(
      (1L, "p q r"), (2L, "p z w"),
      (3L, "m n o"), (4L, "m n o")).toDF("doc_id", "text")
    val firstTok = (c: org.apache.spark.sql.Column) =>
      xxhash64(split(c, " ").getItem(0))
    def run(verify: Boolean) =
      Dedup.substringDedup(docs, 3, verify = verify, hash = firstTok)
        .as[(Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    // hash form: the collision marks BOTH colliding windows duplicated
    // -> docs 1 and 2 are provably over-deleted
    assert(run(verify = false) == Map(
      1L -> (("", 3L)), 2L -> (("", 3L)),
      3L -> (("", 3L)), 4L -> (("", 3L))))
    // verify mode: exact strings disagree -> the planted collision
    // survives; the true duplicate is still removed
    assert(run(verify = true) == Map(
      1L -> (("p q r", 0L)), 2L -> (("p z w", 0L)),
      3L -> (("", 3L)), 4L -> (("", 3L))))
  }

  test("collision-verify equals the hash form under the production hash") {
    val docs = Seq(
      (1L, "x a b c d y"), (2L, "a b c d z w"),
      (3L, "m n o t m n o"), (4L, "only unique words here ok"),
      (5L, "hi")).toDF("doc_id", "text")
    def run(verify: Boolean) =
      Dedup.substringDedup(docs, 3, verify = verify)
        .as[(Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(run(verify = true) == run(verify = false))
  }

  test("verify-mode window strings derive from the colliding-hash subset, not the corpus") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Project}
    val docs = Seq((1L, "p q r"), (2L, "p z w")).toDF("doc_id", "text")
    val base = docs.withColumn("ws",
      graft.functions.Portable.words(col("text")))
    val wins = Dedup.windowRows(base, 3)
    val cand = wins.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1).select(col("h"))
    val strings = Dedup.substringCollisionCandidates(base, wins, cand, 3)
    val projs = strings.queryExecution.optimizedPlan.collect {
      case p: Project if p.projectList.exists(_.name == "s") => p
    }
    assert(projs.nonEmpty, "expected a Project deriving the window string column")
    assert(projs.forall(p => p.collectFirst {
        case j: Join if j.joinType.sql == "LEFT SEMI" => j
      }.nonEmpty),
      "every window-string Project must sit ABOVE the colliding-hash " +
        "left-semi prune — strings may never be derived corpus-wide")
  }

  test("backfill re-cleans exactly the base docs newly duplicated by the append") {
    // base doc 1 owns windows of "a b c d" that are UNIQUE in the base;
    // append doc 2 duplicates them -> crossed. Base doc 3's internal
    // "m n o" repeat had base count 2 (already handled by the base's
    // own dedup) and doc 4 shares nothing -> neither may be touched.
    val base = Seq(
      (1L, "x a b c d y"), (3L, "m n o t m n o"),
      (4L, "only unique words here ok")).toDF("doc_id", "text")
    val app = Seq((2L, "a b c d z w")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("subposidx").toString
    val posIdx = Dedup.buildSubstringPosIndex(spark, base, 3, s"$dir/idx")
    val baseCounts = posIdx.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
    val appCounts = Dedup.substringWindowCounts(app, 3)
    val got = Dedup.substringDedupBackfill(base, posIdx, baseCounts, appCounts, 3)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(1L -> (("x y", 4L))), s"got $got")
    // the contract the gate states: equal to from-scratch on base∪append
    // restricted to the affected base ids
    val scratch = Dedup.substringDedup(base.unionByName(app), 3)
      .filter(col("doc_id") === 1L)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == scratch)
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
