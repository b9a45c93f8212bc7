package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic checks the DuckDB oracle can't express: LSH recall against the
  * exact baseline, SimHash metric properties, multimodal batch shape. */
class ExtensionSpec extends SparkSpec {
  import spark.implicits._

  test("minhash LSH finds every planted near-duplicate pair") {
    // every variant doc (id+10000, first 5 words dropped) should pair with
    // its source: jaccard is high by construction
    val pairs = Dedup.ddMinhashLsh(spark, sf())
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.ddNgramJaccard(spark, sf())
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "augmented corpus must contain near-dup pairs")
    val recall = (exact intersect pairs).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall below 0.9 (found ${pairs.size} of ${exact.size})")
  }

  test("prefix-filtered set-similarity join is lossless vs the exact baseline") {
    // the overlap lemma says the rarest-token prefix join may drop NO
    // qualifying pair; jaccard values must also agree bit-for-bit since
    // both paths share jaccardFinalize (the sf0.01 oracle gate re-proves
    // this per round against DuckDB — this pins it in CI at sf0.001)
    val exact = Dedup.ddNgramJaccard(spark, sf())
      .as[(Long, Long, Double)].collect().toSet
    val pref = Dedup.ddSsjoinPrefix(spark, sf())
      .as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty, "augmented corpus must contain near-dup pairs")
    assert(pref == exact,
      s"prefix join diverged: missing=${(exact -- pref).take(3)} extra=${(pref -- exact).take(3)}")
  }

  test("prefix filtering cuts candidates on a Zipfian corpus; lossless there too") {
    // every doc shares one stopword run (the Zipf head: df = n, so the
    // all-token join pays n(n-1)/2 collisions on it alone); each doc's
    // remaining shingles are private. Prefix filtering must (a) exclude
    // the head token from every prefix — rarest-first ordering — so
    // candidates collapse to ~the planted near-dup pairs, and (b) still
    // find every qualifying pair.
    val head = "the of and to in that it is was for"
    val docs = (0 until 40).flatMap { i =>
      val body = s"$head unique$i word$i token$i item$i thing$i part$i bit$i last$i"
      // plant a near-dup twin for every 4th doc (same body, one word off)
      val twin = if (i % 4 == 0)
        Seq((i + 1000L, body.replace(s"bit$i", s"alt$i"))) else Nil
      (i.toLong, body) +: twin
    }.toDF("doc_id", "text")
    val s = Dedup.shingleRowsOf(docs)
    val allC = Dedup.allPairCandidatesOf(s).count()
    val prefC = Dedup.prefixCandidatesOf(s, 0.5).count()
    // with 50 docs the head run alone forces >=1225 all-pair candidates;
    // prefixes see only the rare tail
    assert(allC >= 1000L, s"head token must dominate all-pair candidates, got $allC")
    assert(prefC * 10 <= allC,
      s"prefix filter must cut candidates >=10x on a Zipf head, got $prefC of $allC")
    val exact = Dedup.ssjoinPrefixOf(docs, 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert((0 until 40 by 4).forall(i => exact.contains((i.toLong, i + 1000L))),
      s"planted twins missing from prefix join output: $exact")
    // the df-profile chooser must route THIS corpus to the prefix
    // branch (one stopword shingle owns >10% of the collision mass)
    // and the flat-df test corpus to the plain equi-join
    assert(Dedup.ssjoinHeadHeavyOf(s), "Zipf-head corpus must measure head-heavy")
    val sFlat = Dedup.shingleRowsOf(graft.sources.Tables.documents(spark, sf()))
    assert(!Dedup.ssjoinHeadHeavyOf(sFlat), "probe corpus must measure flat-df")
    graft.Caches.releaseAll()
  }

  test("containment flags every planted subset pair at exactly 1.0") {
    // a variant's 4-gram shingles are a strict subset of its source's
    // (dropping leading words removes shingles, never invents one), so
    // containment(min side) must be exactly 1.0 for every planted pair
    val got = Dedup.ddContainment(spark, sf())
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val planted = graft.sources.Tables.documents(spark, sf())
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .filter { case (id, t) => id < 25 && t.split(" ", -1).length > 10 }
      .map(_._1)
    assert(planted.nonEmpty, "augmented corpus must plant variant pairs")
    planted.foreach { id =>
      assert(got.get((id, id + 10000)).contains(1.0),
        s"planted subset pair ($id, ${id + 10000}) missing or != 1.0")
    }
    // asymmetry law on everything reported: containment >= jaccard always
    val jac = Dedup.ddNgramJaccard(spark, sf())
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    jac.foreach { case (pair, j) =>
      got.get(pair).foreach(c => assert(c >= j, s"containment < jaccard at $pair")) }
  }

  test("curate→split→pack composition: ids from curation, layout obeys the pack law") {
    val packed = Dedup.ddCuratePack(spark, sf())
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    graft.Caches.releaseAll()
    val curatedIds = Dedup.ddCurate(spark, sf())
      .select($"doc_id").as[Long].collect().toSet
    graft.Caches.releaseAll()
    assert(packed.nonEmpty, "train split must be non-empty")
    // packed docs are exactly a subset of the curated corpus (the train
    // split), and roughly the 80% the split law promises
    val packedIds = packed.map(_._1).toSet
    assert(packedIds.subsetOf(curatedIds))
    val frac = packedIds.size.toDouble / curatedIds.size
    assert(frac > 0.6 && frac < 0.95, s"train fraction $frac far from 80%")
    // pack layout law: exclusive cumsum is consistent and offsets bounded
    packed.sortBy(_._1).foldLeft(0L) { case (cum, (_, n, cumGot, seq, off, spl)) =>
      assert(cumGot == cum, "cumsum drift")
      assert(seq == cum / graft.operators.Pack.GateBudget)
      assert(off == cum % graft.operators.Pack.GateBudget)
      assert(spl >= 0)
      cum + n
    }
  }

  test("hash kernels equal the pure built-in formulation") {
    // NgramHash60s (byte-slice md5, in-kernel mod-P dedup) vs the
    // composed split/concat_ws/array_distinct/md5/conv/pmod chain —
    // pure Spark builtins, no custom expressions on the right side
    import graft.functions.{NgramHash60s, Portable}
    val docs = graft.sources.Tables.documents(spark, sf()).limit(50)
    val viaKernel = docs.select($"doc_id",
        explode(NgramHash60s.shingleHashes($"text", Portable.ShingleN, modP = Portable.P)).as("h"))
      .as[(Long, Long)].collect().toSet
    val viaBuiltins = docs
      .select($"doc_id", explode(Portable.shingles($"text")).as("s"))
      .select($"doc_id",
        pmod(conv(substring(md5($"s"), 1, 15), 16, 10).cast("long"), lit(Portable.P)).as("h"))
      .distinct().as[(Long, Long)].collect().toSet
    assert(viaKernel == viaBuiltins)
  }

  test("hash kernel edges: empty text, short text, space runs, trailing space, unicode") {
    import graft.functions.{NgramHash60s, Portable}
    val fixture = Seq("", "a", "a b c", "a b c d", "a  b  c  d e",
      "x y z w ", "é ü 漢 字 test", "a b c d a b c d").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val viaKernel = fixture.select($"doc_id",
        explode(NgramHash60s.shingleHashes($"text", Portable.ShingleN, modP = Portable.P)).as("h"))
      .as[(Long, Long)].collect().toSet
    val viaBuiltins = fixture
      .select($"doc_id", explode(Portable.shingles($"text")).as("s"))
      .select($"doc_id",
        pmod(conv(substring(md5($"s"), 1, 15), 16, 10).cast("long"), lit(Portable.P)).as("h"))
      .distinct().as[(Long, Long)].collect().toSet
    assert(viaKernel == viaBuiltins)
    // SimHash60 against the explicit per-token builtin formulation
    val shKernel = fixture.select($"doc_id",
        graft.functions.SimHash60.simhash60($"text").as("sh"))
      .as[(Long, Long)].collect().toMap
    val shBuiltins = fixture
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
      .select($"doc_id", conv(substring(md5($"tok"), 1, 15), 16, 10).cast("long").as("h"))
      .groupBy($"doc_id")
      .agg(graft.functions.SimHashAgg.simhashAgg($"h").as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(shKernel == shBuiltins)
  }

  test("per-row SimHash60 expression equals the mergeable SimHashAgg") {
    // the agg is the multi-row form (doc spanning streamed chunks);
    // identical arithmetic to the projection kernel
    val viaExpr = Dedup.simhashes(spark, sf())
      .select($"doc_id", $"simhash").as[(Long, Long)].collect().toMap
    val viaAgg = Dedup.augmented(spark, sf())
      .select(col("doc_id"),
        explode(graft.functions.NgramHash60s.tokenHashes(col("text"))).as("h"))
      .groupBy(col("doc_id"))
      .agg(graft.functions.SimHashAgg.simhashAgg(col("h")).as("simhash"))
      .select($"doc_id", $"simhash").as[(Long, Long)].collect().toMap
    assert(viaExpr == viaAgg)
  }

  test("simhash: identical texts collide, planted variants are close") {
    val sh = Dedup.simhashes(spark, sf())
      .select($"doc_id", $"simhash").as[(Long, Long)].collect().toMap
    val variantPairs = sh.keys.filter(_ >= 10000).map(v => (v - 10000, v))
    assert(variantPairs.nonEmpty)
    val hammings = variantPairs.map { case (a, b) =>
      java.lang.Long.bitCount(sh(a) ^ sh(b))
    }
    // dropping 5 of >10 words keeps most token mass → small hamming
    assert(hammings.max <= 20, s"variant hamming too large: ${hammings.max}")
    // unrelated docs should usually be far: median over a fixed sample
    val unrelated = (0L until 50L).map(i => java.lang.Long.bitCount(sh(i) ^ sh(i + 100)))
    assert(unrelated.sorted.apply(unrelated.size / 2) > 10)
  }

  test("multi-table LSH ANN recall@5 vs brute force meets the 0.8 floor") {
    // measured on the synthetic corpus: 12 tables × 4 planes gives
    // recall@5 = 0.86 (sf0.01) / 0.90 (sf0.1); assert the floor at sf0.01
    val bf = Similarity.simBruteForceTopK(spark, sf("sf0.01"))
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.simLshTopK(spark, sf("sf0.01"))
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect lsh).size.toDouble / bf.size
    assert(recall >= 0.8, s"LSH ANN recall@5 $recall below 0.8 floor")
  }

  test("recall report equals the set arithmetic it claims to measure") {
    // the harness-is-right check: the report's per-query n_hit must be
    // EXACTLY |bf-topk ∩ lsh-topk| per query (recomputed here from the
    // two gated relations), n_exact == TopK, and the permille law holds
    val bf = Similarity.simBruteForceTopK(spark, sf("sf0.01"))
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val lsh = Similarity.simLshTopK(spark, sf("sf0.01"))
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val report = Similarity.simRecallReport(spark, sf("sf0.01"))
      .select($"query_id", $"n_exact", $"n_hit", $"recall_permille")
      .as[(Long, Long, Long, Long)].collect()
    assert(report.map(_._1).toSet == bf.keySet)
    report.foreach { case (q, nExact, nHit, permille) =>
      assert(nExact == Similarity.TopK, s"q=$q n_exact=$nExact")
      val want = (bf(q) intersect lsh.getOrElse(q, Set.empty)).size.toLong
      assert(nHit == want, s"q=$q n_hit=$nHit want=$want")
      assert(permille == nHit * 1000L / Similarity.TopK)
    }
  }

  test("IVF ANN recall@5 vs brute force meets the 0.85 floor") {
    // measured: 0.92 at sf0.01 (1.00 at sf0.1) probing 4 of 16 cells
    val bf = Similarity.simBruteForceTopK(spark, sf("sf0.01"))
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.simIvfTopK(spark, sf("sf0.01"))
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall >= 0.85, s"IVF ANN recall@5 $recall below 0.85 floor")
  }

  test("autoNlist: √n rule, power of two, floored and capped") {
    import Similarity.{autoNlist, IVF_CENTROIDS}
    // floor: tiny corpora keep the gated cell count
    assert(autoNlist(1) == IVF_CENTROIDS && autoNlist(256) == IVF_CENTROIDS)
    // the √n band: k/2 < √n ≤ k once past the floor
    Seq(2000L, 60000L, 1000000L, 100000000L).foreach { n =>
      val k = autoNlist(n)
      val r = math.sqrt(n.toDouble)
      assert(k >= IVF_CENTROIDS && (k & (k - 1)) == 0, s"n=$n k=$k not pow2")
      assert(k >= r && (k == IVF_CENTROIDS || k / 2 < r),
        s"n=$n k=$k off the √n band")
      assert(autoNlist(n) <= autoNlist(n * 10), "monotone")
    }
    // cap: never past 2^14 (hierarchical-quantizer territory)
    assert(autoNlist(Long.MaxValue / 2) == (1 << 14))
    intercept[IllegalArgumentException] { autoNlist(0) }
    // the auto gate's codebook really is auto-sized (not the pinned 16)
    val n = graft.sources.Tables.embeddings(spark, sf("sf0.01")).count()
    Similarity.simIvfAutoFromCodebook(spark, sf("sf0.01")).count()
    graft.Caches.releaseAll()
    val k = spark.read.parquet(Similarity.IvfAutoArtifactPath).count()
    assert(k == autoNlist(n), s"persisted auto codebook has $k cells, want ${autoNlist(n)}")
  }

  test("k-means codebook: objective descends, training is deterministic, recall holds") {
    val e = graft.sources.Tables.embeddings(spark, sf("sf0.01"))
    val standIn = e.filter($"vec_id" < Similarity.IVF_CENTROIDS)
      .select($"vec_id".cast("int").as("centroid_id"), $"embedding".as("ce"))
    val objs = (0 to 3).map(i =>
      Similarity.ivfObjective(e, Similarity.trainIvfCodebook(e, iters = i)))
    objs.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"k-means objective increased: $objs")
    }
    assert(objs.last < Similarity.ivfObjective(e, standIn),
      "trained codebook should beat the first-k stand-in")
    val c1 = Similarity.trainIvfCodebook(e).as[(Int, Seq[Float])].collect().toMap
    val c2 = Similarity.trainIvfCodebook(e).as[(Int, Seq[Float])].collect().toMap
    // element-wise within epsilon, not exact Map equality: float avg
    // aggregation order is stable under fixed local partitioning but can
    // shift with partition counts / AQE, and that must not read as
    // nondeterministic training
    assert(c1.keySet == c2.keySet, "training must yield the same centroid ids")
    c1.foreach { case (cid, v1) =>
      val v2 = c2(cid)
      assert(v1.size == v2.size, s"centroid $cid dim mismatch")
      v1.zip(v2).zipWithIndex.foreach { case ((a, b), d) =>
        assert(math.abs(a - b) <= 1e-5f,
          s"centroid $cid dim $d differs beyond epsilon: $a vs $b")
      }
    }
    val bf = Similarity.simBruteForceTopK(spark, sf("sf0.01"))
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.simIvfTopKTrained(spark, sf("sf0.01"))
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall >= 0.85, s"trained-IVF recall@5 $recall below 0.85 floor")
    graft.Caches.releaseAll()
  }

  test("banded near-dup plans contain no all-pairs join") {
    // the 100 TB criterion: candidate generation must be an equi-join on
    // band keys, never a nested-loop/cartesian pair scan
    Seq(
      Dedup.ddSimhash(spark, sf()),
      Dedup.ddMinhashLsh(spark, sf()),
      Similarity.simCosineNearDup(spark, sf()),
      Similarity.simLshTopK(spark, sf())).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"all-pairs join in plan:\n${plan.linesIterator.take(30).mkString("\n")}")
    }
  }

  test("dedup pipeline: exact-first removes copy clusters, near-dup output unchanged") {
    // planted exact copies (doc_id+20000) must all lose to their originals
    val surv = Dedup.survivors(Dedup.pipelineCorpus(spark, sf())).cache()
    val augN = Dedup.augmented(spark, sf()).count()
    assert(surv.count() == augN, "every planted copy must be deduped away")
    assert(surv.filter($"doc_id" >= 20000).count() == 0)
    surv.unpersist(true)
    // LSH directly on the un-deduped corpus would emit the copy pairs
    val naive = Dedup.minhashLshPairs(Dedup.pipelineCorpus(spark, sf()))
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(naive.exists(_._2 >= 20000), "un-deduped corpus must show copy pairs")
    // the composed pipeline equals the unit LSH query on the clean corpus
    val pipe = Dedup.ddPipeline(spark, sf()).collect().toSeq
    val unit = Dedup.ddMinhashLsh(spark, sf()).collect().toSeq
    assert(pipe == unit)
    graft.Caches.releaseAll()
  }

  test("near-dup auto-scaling derives planes from corpus size") {
    import Similarity.autoPlanes
    // floors at the gated config, then grows log2(n) to hold per-table
    // bucket occupancy at NEARDUP_TARGET_OCCUPANCY
    assert(autoPlanes(100) == 8)
    assert(autoPlanes(1L << 12) == 8)   // 4096/16 = 256 buckets -> 8
    assert(autoPlanes(1L << 13) == 9)
    assert(autoPlanes(1L << 30) == 26)
    assert(autoPlanes(1L << 36) == 32)  // the int-bucket ceiling: 16·2^32 rows
    // beyond 32 planes the 1-bit-per-plane Int packing would alias
    // silently — the derivation must fail loudly instead
    val e = intercept[IllegalArgumentException] { autoPlanes(1L << 40) }
    assert(e.getMessage.contains("32"))
    // at test scale the derived count floors to the gated (4, 8), so the
    // production entry point must return exactly the gated result
    val auto = Similarity.cosineNearDupAuto(spark, sf("sf0.01")).collect().toSeq
    val pinned = Similarity.simCosineNearDup(spark, sf("sf0.01")).collect().toSeq
    assert(auto == pinned)
    // same for the clustering tail: the gated rows-only
    // sim_semantic_dedup_auto must coincide with the oracled pinned
    // form wherever the derived plane count floors to the gated config
    val autoSem = Similarity.semanticDedupAuto(spark, sf("sf0.01")).collect().toSeq
    val pinnedSem = Similarity.simSemanticDedup(spark, sf("sf0.01")).collect().toSeq
    assert(autoSem == pinnedSem)
    graft.Caches.releaseAll()
  }

  test("k-NN graph: contiguous sorted ranks, high recall vs the exact graph") {
    val k = Similarity.KNN_GRAPH_K
    val g = Similarity.simKnnGraph(spark, sf())
      .as[(Long, Long, Double, Long)].collect()
    graft.Caches.releaseAll()
    // per-node invariants: ranks contiguous from 1, at most k, cosine
    // non-increasing with the id tiebreak, no self-loops
    g.groupBy(_._1).foreach { case (v, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to rows.length.toLong), s"node $v ranks")
      assert(rows.length <= k, s"node $v has ${rows.length} > k neighbors")
      assert(rows.forall(_._2 != v), s"node $v self-loop")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2),
            s"node $v order violated at ranks ${a._4},${b._4}")
        case _ =>
      }
    }
    // semantic equality: the graph IS the exact top-k over the banded
    // candidate set — recompute candidates + driver-side cosines
    // independently and compare edge sets exactly. (Recall vs the
    // unrestricted exact graph is corpus-dependent by design: banding
    // recovers high-cosine neighbors, which is the near-dup use case —
    // the thresholded check below pins that without asserting an LSH
    // guarantee random low-cosine neighbors don't have.)
    val e = graft.sources.Tables.embeddings(spark, sf())
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val emb = e.toMap
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var d, nx, ny = 0.0
      var i = 0
      while (i < x.length) {
        d += x(i).toDouble * y(i); nx += x(i).toDouble * x(i)
        ny += y(i).toDouble * y(i); i += 1
      }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    val bands = Similarity
      .banded(graft.sources.Tables.embeddings(spark, sf()),
        Similarity.NEARDUP_TABLES, Similarity.NEARDUP_PLANES)
      .as[(Long, Int, Int)].collect()
    graft.Caches.releaseAll()
    val byBucket: Seq[Seq[(Long, Int, Int)]] =
      bands.toSeq.groupBy(t => (t._2, t._3)).values.toSeq
    val candOf: Map[Long, Set[(Long, Long)]] = byBucket.flatMap { rows =>
      for (a <- rows; b <- rows if a._1 != b._1) yield (a._1, b._1)
    }.toSet.groupBy((p: (Long, Long)) => p._1)
    val expect: Set[(Long, Long, Double, Long)] =
      candOf.toSeq.flatMap { case (v, cands) =>
        cands.toSeq.map { case (_, u) => (v, u, cos(emb(v), emb(u))) }
          .sortBy { case (_, u, c) => (-c, u) }.take(k)
          .zipWithIndex.map { case ((_, u, c), i) => (v, u, c, (i + 1).toLong) }
      }.toSet
    assert(g.toSet == expect,
      s"graph != exact top-k over banded candidates: missing=" +
        s"${(expect -- g.toSet).take(3)} extra=${(g.toSet -- expect).take(3)}")
    // every near-dup-threshold pair the banding surfaces must appear in
    // the graph (both directions) unless crowded out by k closer ones
    val nd = Similarity.simCosineNearDup(spark, sf())
      .as[(Long, Long, Double)].collect()
    graft.Caches.releaseAll()
    val gotEdges = g.map(t => (t._1, t._2)).toSet
    nd.foreach { case (a, b, c) =>
      Seq((a, b), (b, a)).foreach { case (v, u) =>
        val closer = g.count(t => t._1 == v && (t._3 > c || (t._3 == c && t._2 < u)))
        if (closer < k)
          assert(gotEdges.contains((v, u)),
            s"near-dup edge ($v,$u) cosine=$c missing with only $closer closer")
      }
    }
  }

  test("k-NN graph auto form floors to the pinned gate at test scale") {
    val auto = Similarity.knnGraphAuto(spark, sf("sf0.01")).collect().toSeq
    graft.Caches.releaseAll()
    val pinned = Similarity.simKnnGraph(spark, sf("sf0.01")).collect().toSeq
    graft.Caches.releaseAll()
    assert(auto == pinned)
  }

  test("semantic curation capstone: gate, dedup, and representative laws hold") {
    val out = Dedup.ddCurateSemantic(spark, sf("sf0.01"))
      .as[(Long, String, Long)].collect()
    graft.Caches.releaseAll()
    assert(out.nonEmpty)
    val outIds = out.map(_._1).toSet
    // perplexity-gate law: every emitted doc scored at or under the
    // ceiling; every doc over it is absent
    val docs = graft.sources.Tables.documents(spark, sf("sf0.01"))
      .select($"doc_id", $"text")
    val scores = TextAnalysis.bigramSurprisal(docs)
      .select($"doc_id", $"mean_millibits").as[(Long, Long)].collect().toMap
    graft.Caches.releaseAll()
    outIds.foreach { id =>
      assert(scores(id) <= Dedup.CurateSemanticMaxMillibits, s"doc $id over gate")
    }
    assert(scores.exists(_._2 > Dedup.CurateSemanticMaxMillibits),
      "corpus must have a high-surprisal tail for the gate to be meaningful")
    scores.filter(_._2 > Dedup.CurateSemanticMaxMillibits).keys.foreach { id =>
      assert(!outIds.contains(id), s"gated-out doc $id present")
    }
    // substring-dedup law: some doc lost tokens (the corpus repeats
    // >= SUB_W-token substrings) and n_removed matches the unit
    // operator run on exactly the gate survivors
    assert(out.exists(_._3 > 0), "no substring removals — stage inert")
    val keep = scores.filter(_._2 <= Dedup.CurateSemanticMaxMillibits).keySet
    val unit = Dedup.substringDedup(
        docs.filter($"doc_id".isInCollection(keep)), Dedup.SUB_W)
      .select($"doc_id", $"n_removed").as[(Long, Long)].collect().toMap
    graft.Caches.releaseAll()
    out.foreach { case (id, _, n) => assert(unit(id) == n, s"doc $id n_removed") }
    // representative law: for each survivor near-dup cluster, exactly
    // the min id is kept
    val survEmb = graft.sources.Tables.embeddings(spark, sf("sf0.01"))
      .filter($"vec_id".isInCollection(unit.keySet))
      .select($"vec_id", $"embedding")
    val pairs = Similarity.nearDupPairsOf(survEmb)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    graft.Caches.releaseAll()
    val clusters = Cluster.connectedComponents(
        pairs.toSeq.toDF("src", "dst"))
      .as[(Long, Long)].collect().groupBy(_._2).values
    clusters.foreach { members =>
      val ids = members.map(_._1).toSet
      val kept = ids intersect outIds
      assert(kept == Set(ids.min),
        s"cluster $ids kept $kept, expected only min")
    }
  }

  test("embedding card: per-dim partition law, and planted anomalies surface") {
    val card = graft.operators.Profiling
      .profEmbeddingCard(spark, sf("sf0.01"))
      .as[(Long, Long, Float, Float, Long, Long, Long, Long)].collect()
    val n = graft.sources.Tables.embeddings(spark, sf("sf0.01")).count()
    assert(card.map(_._1).toSeq == (1L to Similarity.Dim))
    card.foreach { case (dim, cnt, mn, mx, pos, neg, zero, nan) =>
      assert(cnt == n, s"dim $dim count")
      assert(pos + neg + zero + nan == cnt, s"dim $dim sign partition")
      assert(mn <= mx, s"dim $dim min>max")
    }
    // planted anomalies: an all-zero dim and a NaN leak each show as
    // exactly one anomalous row
    val bad = Seq(
      (1L, Array(0.0f, 1.5f, Float.NaN)),
      (2L, Array(0.0f, -2.0f, 0.5f))).toDF("vec_id", "embedding")
    val got = graft.operators.Profiling.embeddingCard(bad)
      .as[(Long, Long, Float, Float, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._7 == 2, "dim 1 must read all-zero")
    assert(got(3L)._8 == 1, "dim 3 must count the NaN")
    assert(got(2L)._5 == 1 && got(2L)._6 == 1, "dim 2 sign counts")
  }

  test("IVF cell card matches a driver-side assignment recomputation") {
    val card = Similarity.simClusterCard(spark, sf())
      .as[(Long, Long, Long, Option[Double], Option[Double])].collect()
    graft.Caches.releaseAll()
    val e = graft.sources.Tables.embeddings(spark, sf())
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val cb = spark.read.parquet(Similarity.IvfArtifactPath)
      .select($"centroid_id", $"ce").as[(Long, Array[Float])].collect()
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var d, nx, ny = 0.0; var i = 0
      while (i < x.length) {
        d += x(i).toDouble * y(i); nx += x(i).toDouble * x(i)
        ny += y(i).toDouble * y(i); i += 1
      }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    val assigned = e.map { case (_, v) =>
      cb.map { case (cid, ce) => (cid, cos(v, ce)) }
        .minBy { case (cid, c) => (-c, cid) }
    }
    val byCell = assigned.groupBy(_._1)
    val expect = cb.map(_._1).map { cid =>
      byCell.get(cid) match {
        case Some(ms) =>
          (cid, ms.length.toLong, ms.length.toLong * 1000000L / e.length,
            Some(ms.map(_._2).min), Some(ms.map(_._2).max))
        case None => (cid, 0L, 0L, None, None)
      }
    }.toSet
    assert(card.toSet == expect, "card diverges from driver recomputation")
    assert(card.map(_._2).sum == e.length, "members must partition the corpus")
    card.foreach { case (cid, _, _, mn, mx) =>
      (mn, mx) match {
        case (Some(a), Some(b)) => assert(a <= b, s"cell $cid min>max")
        case _ =>
      }
    }
    // planted empty cell: every vector nearest centroid A leaves B as an
    // explicit n=0 row — the imbalance signal must never be a silently
    // missing centroid_id
    val ve = Seq(
      (10L, Array.fill(Similarity.Dim)(1.0f)),
      (11L, Array.fill(Similarity.Dim)(1.0f)),
      (12L, Array.fill(Similarity.Dim)(0.9f))).toDF("vec_id", "embedding")
    val cc = Seq(
      (0L, Array.fill(Similarity.Dim)(1.0f)),
      (1L, Array.fill(Similarity.Dim)(-1.0f))).toDF("centroid_id", "ce")
    val tiny = Similarity.ivfCellCard(ve, cc)
      .as[(Long, Long, Long, Option[Double], Option[Double])].collect()
    graft.Caches.releaseAll()
    assert(tiny.map(t => t._1 -> (t._2, t._3)).toMap ==
      Map(0L -> (3L, 1000000L), 1L -> (0L, 0L)),
      s"empty cell must read n=0 share=0: ${tiny.toSeq}")
  }

  test("binary payload dedup: every planted byte-copy loses to its source") {
    val rows = Multimodal.mmExactDedup(spark, sf())
      .as[(Long, String, Boolean)].collect()
    graft.Caches.releaseAll()
    val keep = rows.map(r => r._1 -> r._3).toMap
    val planted = rows.map(_._1).filter(_ >= 20000)
    assert(planted.nonEmpty, "pipeline corpus must plant byte-exact copies")
    planted.foreach { id =>
      assert(!keep(id), s"planted copy $id must not be kept")
      assert(keep(id - 20000), s"source of $id must be kept")
    }
    // digest law: within a digest group exactly one keeper, the min id
    rows.groupBy(_._2).values.foreach { g =>
      assert(g.count(_._3) == 1 && g.filter(_._3).head._1 == g.map(_._1).min)
    }
  }

  test("near-dup runs with a sign family beyond the gated MaxPlanes") {
    // 4 tables x 14 planes = 56 > MaxPlanes(48): signs generate on demand
    val pairs = Similarity.cosineNearDupPairs(spark, sf(), 4, 14)
      .select($"cosine").as[Double].collect()
    assert(pairs.forall(_ >= Similarity.NEARDUP_THRESHOLD))
    graft.Caches.releaseAll()
  }

  test("bucketing kernel rejects an embedding whose dim mismatches the sign family") {
    val bad = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      bad.select(graft.functions.HyperplaneBuckets.buckets(
        $"embedding", 1, 8, Similarity.planeSigns)).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => c.getMessage != null && c.getMessage.contains("sign family")),
      s"expected the dim-mismatch error, got: $e")
  }

  test("query builders leave no cached relations behind after release") {
    Dedup.ddMinhashLsh(spark, sf()).write.mode("overwrite").format("noop").save()
    graft.Caches.releaseAll()
    assert(spark.sharedState.cacheManager.isEmpty,
      "CacheManager should be empty after Caches.releaseAll()")
  }

  test("bucket ids are stable and bounded") {
    val buckets = Similarity.simLshTopK(spark, sf())
    assert(buckets.count() > 0)
    val ids = graft.sources.Tables.embeddings(spark, sf())
      .withColumn("b", Similarity.bucketId($"embedding"))
      .select("b").as[Int].collect()
    assert(ids.forall(b => b >= 0 && b < 256))
  }

  test("multimodal: features computed per partition batch, frames explode") {
    val feats = Multimodal.mmExtractFeatures(spark, sf())
    assert(feats.count() == 500)
    val row = feats.filter($"doc_id" === 0).head()
    assert(row.getAs[Long]("n_bytes") > 0)
    assert(row.getAs[Long]("n_frames") == row.getAs[Long]("n_bytes") / 256 + 1)
    val frames = Multimodal.mmFrameSample(spark, sf())
    // every video doc contributes exactly n_frames rows
    val perDoc = frames.groupBy($"doc_id").count()
      .join(feats.filter(pmod($"doc_id", lit(3)) === 2), "doc_id")
    assert(perDoc.filter($"count" =!= $"n_frames").count() == 0)
  }

  test("as-of join: inclusive match, latest-by-tie, null when no prior row, no tearing") {
    val left = Seq((1L, 10L, 100L), (1L, 5L, 101L), (2L, 7L, 102L)).toDF("k", "t", "lid")
    val right = Seq((1L, 10L, 200L, Some(1.0)), (1L, 3L, 201L, Some(2.0)),
      (1L, 10L, 202L, Some(3.0)), (3L, 1L, 203L, Some(4.0)),
      (1L, 4L, 205L, None)).toDF("k", "rt", "rid", "rv")
    val out = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("rid", "rv"), "lid", "rid")
      .select($"lid", $"asof_rid", $"asof_rv")
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    assert(out == Set(
      (100L, Some(202L), Some(3.0)), // t=10 matches rt=10 inclusively; tie picks rid 202
      // latest row ≤ t=5 is (rt=4, rid=205, rv=NULL): its null rv must
      // NOT tear back to the older rt=3 row's 2.0 — whole-row semantics
      (101L, Some(205L), None),
      (102L, None, None)))           // key 2 has no right rows
    // value columns may share names with left columns (they travel
    // inside the struct and emerge as asof_<name>)
    val collide = AsOfJoin.asOf(
      left.withColumnRenamed("lid", "rid"), right, "k", "t", "rt",
      Seq("rid"), leftTie = "rid", rightTie = "rid")
    assert(collide.columns.toSeq == Seq("k", "t", "rid", "asof_rid"))
    assert(collide.filter($"rid" === 100L).select($"asof_rid")
      .as[Option[Long]].head().contains(202L))
  }

  test("binned range join equals the naive theta join; plan is an equi-join") {
    val points = spark.range(0, 1000).select(($"id" * 7 % 500).as("p"), $"id")
    val intervals = spark.range(0, 40)
      .select($"id".as("iv_id"), ($"id" * 11 % 300).as("lo"))
      .withColumn("hi", $"lo" + 25)
    val binned = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", binWidth = 20)
      .select($"iv_id", $"id")
    val naive = points.join(intervals, $"p" >= $"lo" && $"p" <= $"hi")
      .select($"iv_id", $"id")
    assert(binned.count() == naive.count())
    assert(naive.exceptAll(binned).count() == 0)
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "binned range join must be an equi-join")
  }

  test("interval-overlap join equals the naive theta join, without a dedup shuffle") {
    val a = spark.range(0, 300).select($"id".as("a_id"),
      ($"id" * 13 % 400).as("a_lo")).withColumn("a_hi", $"a_lo" + ($"a_id" % 60))
    val b = spark.range(0, 300).select($"id".as("b_id"),
      ($"id" * 7 % 400).as("b_lo")).withColumn("b_hi", $"b_lo" + ($"b_id" % 45))
    val binned = RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi", binWidth = 25)
      .select($"a_id", $"b_id")
    val naive = a.join(b, $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
      .select($"a_id", $"b_id")
    assert(binned.count() == naive.count(), "first-bin emission must dedupe exactly")
    assert(naive.exceptAll(binned).count() == 0)
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("salted join and salted agg equal their unsalted forms on a skewed key") {
    // 90% of rows share key 1 — the shape AQE can't always save
    val left = spark.range(0, 10000).select(
      when($"id" < 9000, lit(1L)).otherwise(pmod($"id", lit(100))).as("k"), $"id")
    val right = (0L until 100L).map(k => (k, s"dim_$k")).toSeq.toDF("k", "v")
    val plain = left.join(right, Seq("k")).select($"id", $"v")
    val salted = Skew.saltedJoin(left, right, Seq("k"), saltOn = $"id", buckets = 8)
      .select($"id", $"v")
    assert(salted.count() == plain.count())
    assert(plain.exceptAll(salted).count() == 0)

    val expected = left.groupBy("k").agg(count(lit(1)).as("c"), sum($"id").as("s"))
    val twoPhase = Skew.saltedAgg(left, Seq("k"), saltOn = $"id", buckets = 8,
      partial = Seq(count(lit(1)).as("c"), sum($"id").as("s")),
      merge = Seq(sum($"c").as("c"), sum($"s").as("s")))
    assert(twoPhase.exceptAll(expected).count() == 0 &&
      expected.exceptAll(twoPhase).count() == 0)
  }

  test("simhash multi-probe banding is EXHAUSTIVE vs the all-pairs hamming<=12 set") {
    // plain 5x12 banding measured recall 0.35 at hamming <= 12 on this
    // corpus (differing bits spread over every chunk); the hamming-2
    // multi-probe guarantees, by pigeonhole, that every such pair
    // collides in some band. Assert set EQUALITY against the quadratic
    // all-pairs baseline — the shape the production query exists to
    // avoid, test-only.
    val sh = Dedup.simhashes(spark, sf())
    val a = sh.select($"doc_id".as("id_a"), $"simhash".as("sa"))
    val b = sh.select($"doc_id".as("id_b"), $"simhash".as("sb"))
    val exact = a.crossJoin(b).filter($"id_a" < $"id_b")
      .filter(expr("cast(bit_count(sa ^ sb) as int)") <= 12)
      .select("id_a", "id_b")
    val banded = Dedup.ddSimhash(spark, sf()).select("id_a", "id_b")
    val nExact = exact.count()
    val nBanded = banded.count()
    val hit = banded.join(exact, Seq("id_a", "id_b"), "left_semi").count()
    graft.Caches.releaseAll()
    assert(nExact > 0, "corpus must contain hamming<=12 pairs")
    assert(hit == nBanded, "banded pairs must all satisfy hamming<=12")
    assert(nBanded == nExact,
      s"multi-probe banding must be exhaustive: banded $nBanded vs exact $nExact")
    // the tight radius is exhaustive with ZERO probes (pigeonhole at r<5)
    val exact4 = a.crossJoin(b).filter($"id_a" < $"id_b")
      .filter(expr("cast(bit_count(sa ^ sb) as int)") <= 4).count()
    val banded4 = Dedup.ddSimhashR4(spark, sf()).count()
    graft.Caches.releaseAll()
    assert(banded4 == exact4,
      s"plain banding must be exhaustive at radius 4: $banded4 vs $exact4")
  }

  test("incremental dedup drops exact copies of history, keeps near-dup variants") {
    val inc = Dedup.ddIncremental(spark, sf())
      .select($"doc_id").as[Long].collect().toSet
    val variants = Dedup.pipelineCorpus(spark, sf())
      .filter($"doc_id" >= 10000 && $"doc_id" < 20000)
      .select($"doc_id").as[Long].collect().toSet
    graft.Caches.releaseAll()
    assert(inc.nonEmpty)
    assert(inc.forall(id => id >= 10000 && id < 20000),
      s"planted exact copies (2xxxx) must be dropped, got ${inc.filter(_ >= 20000)}")
    assert(inc == variants, "every near-dup (not exact) variant must survive")
  }

  test("incremental dedup never shuffles the history side") {
    val plan = Dedup.ddIncremental(spark, sf()).queryExecution.executedPlan.toString
    graft.Caches.releaseAll()
    // Catalyst pushes the history semi-join below the corpus union (one
    // broadcast join per branch) — the invariant is that NO join
    // shuffles, not the join count
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"history must join via broadcast, not a shuffle:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"expected broadcast semi + anti joins:\n$plan")
  }

  test("decontamination drops every batch doc sharing an n-gram with the benchmark") {
    val kept = Dedup.ddDecontaminate(spark, sf())
      .select($"doc_id").as[Long].collect().toSet
    graft.Caches.releaseAll()
    (25L until 50L).foreach { b =>
      assert(!kept.contains(b + 20000), s"exact copy of benchmark doc $b kept")
      assert(!kept.contains(b + 10000), s"near-dup variant of benchmark doc $b kept")
    }
    assert(kept.nonEmpty, "decontamination must not nuke the whole batch")
  }

  test("curation pipeline removes copies, benchmark overlap, and near-dup variants") {
    val curated = Dedup.ddCurate(spark, sf())
      .select($"doc_id").as[Long].collect().toSet
    graft.Caches.releaseAll()
    assert(curated.nonEmpty)
    // planted exact copies (2xxxx) die at exact dedup; benchmark docs
    // (25..49) and anything sharing their shingles die at decontamination
    assert(curated.forall(_ < 20000), s"exact copies survived: ${curated.filter(_ >= 20000)}")
    assert((25L until 50L).forall(!curated.contains(_)),
      "benchmark docs must leave the corpus during decontamination")
    // near-dup removal drops the larger id of every pair the LSH stage
    // VERIFIES (jaccard >= 0.5). A variant may survive alongside its
    // original only when the pair itself is below threshold / missed by
    // banding — i.e. exactly when it is absent from the unit LSH query's
    // own pair set over the same document universe
    val lshPairs = Dedup.ddMinhashLsh(spark, sf())
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    graft.Caches.releaseAll()
    val bothSurvived = curated.filter(id => id >= 10000 && curated.contains(id - 10000))
    val flaggedButKept = bothSurvived.filter(id => lshPairs.contains((id - 10000, id)))
    assert(flaggedButKept.isEmpty,
      s"LSH flagged these pairs yet both sides survived curation: $flaggedButKept")
  }

  test("column profile counts nulls (lineitem has none — use planted data)") {
    val df = Seq(
      (Some("a"), Some(1L)), (None, Some(2L)), (Some("a"), None), (None, None))
      .toDF("s", "n")
    val prof = Profiling.profile(df, Seq("s", "n"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(prof("s") == ((4L, 2L, 1L, "a", "a")))
    assert(prof("n") == ((4L, 2L, 2L, "1", "2")))
  }

  test("column profile equals per-column direct aggregation") {
    val li = graft.sources.Tables.lineitem(spark, sf())
    val prof = Profiling.profile(li, Seq("l_orderkey", "l_returnflag"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    val n = li.count()
    val ok = li.agg(count_distinct($"l_orderkey"), min($"l_orderkey"), max($"l_orderkey"))
      .head()
    assert(prof("l_orderkey") == ((n, 0L, ok.getLong(0),
      ok.getLong(1).toString, ok.getLong(2).toString)))
    val rf = li.agg(count_distinct($"l_returnflag"), min($"l_returnflag"), max($"l_returnflag"))
      .head()
    assert(prof("l_returnflag") == ((n, 0L, rf.getLong(0), rf.getString(1), rf.getString(2))))
  }

  test("quantized embeddings reconstruct within the int8 error bound") {
    val q = Similarity.simQuantize(spark, sf())
    val joined = q.join(graft.sources.Tables.embeddings(spark, sf()), "vec_id")
      .selectExpr("scale",
        """array_max(zip_with(q, embedding,
             (qi, x) -> abs(cast(x as double) - qi * scale / 127D))) AS max_err""")
      .selectExpr("max(max_err / nullif(scale, 0))").as[Double].head()
    // half-step of the 254-level grid, plus float slack
    assert(joined <= 1.0 / 254 + 1e-9, s"reconstruction error $joined")
    val bounds = q.selectExpr("min(array_min(q))", "max(array_max(q))")
      .as[(Int, Int)].head()
    assert(bounds._1 >= -127 && bounds._2 <= 127, s"int8 range violated: $bounds")
  }

  test("approx-distinct rule rewrites COUNT(DISTINCT) only when the flag is on") {
    import graft.plans.ApproxDistinctRule
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ ApproxDistinctRule
    try {
      val li = graft.sources.Tables.lineitem(spark, sf())
      def q = li.agg(countDistinct($"l_orderkey").as("n"))
      spark.conf.set(ApproxDistinctRule.FLAG, "true")
      val approxPlan = q.queryExecution.optimizedPlan.toString
      assert(approxPlan.contains("approx_count_distinct"),
        s"flag on must rewrite to HLL:\n$approxPlan")
      val approx = q.as[Long].head()
      val exact = li.select($"l_orderkey").distinct().count()
      assert(math.abs(approx - exact).toDouble / exact <= 0.1,
        s"approx $approx vs exact $exact outside HLL error")
      spark.conf.set(ApproxDistinctRule.FLAG, "false")
      val exactPlan = q.queryExecution.optimizedPlan.toString
      assert(!exactPlan.contains("approx_count_distinct"),
        s"flag off must leave the exact aggregate:\n$exactPlan")
      assert(q.as[Long].head() == exact)
    } finally {
      spark.conf.unset(ApproxDistinctRule.FLAG)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == ApproxDistinctRule)
    }
  }

  test("PII redaction scrubs emails, phones, and IPs; leaves clean text alone") {
    val df = Seq(
      "mail me at jane.doe+x@corp.example.org today",
      "call +351 912 345 678 or ping 192.168.1.7",
      "clean text stays untouched").toDF("text")
    val out = df.select(TextAnalysis.redact($"text").as("t")).as[String].collect()
    assert(out(0) == "mail me at [EMAIL] today")
    assert(out(1) == "call [PHONE] or ping [IP]")
    assert(out(2) == "clean text stays untouched")
    // the gated query must report every doc fully redacted
    val flags = TextAnalysis.txRedact(spark, sf())
      .select($"fully_redacted").as[Boolean].collect()
    assert(flags.nonEmpty && flags.forall(identity), "un-redacted PII survived")
  }

  test("native session_window equals the lag-based q19 sessionization") {
    // prefer-builtins check: Spark's session_window (gap-close semantics
    // differ only at EXACTLY-gap boundaries, absent in this data) must
    // reproduce the windowed-lag formulation the oracle checks
    val sw = graft.sources.Tables.events(spark, sf())
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("sw_sessions"), sum($"n").as("sw_events"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val q19 = Relational.q19UserSessions(spark, sf())
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(sw == q19)
  }

  test("spark.sql over registered views equals the DataFrame formulation") {
    graft.sources.Tables.registerViews(spark, sf())
    val viaSql = spark.sql("""
      SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    val viaDf = graft.sources.Tables.lineitem(spark, sf())
      .groupBy($"l_returnflag")
      .agg(sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy($"l_returnflag")
    assert(viaSql.collect().toSeq == viaDf.collect().toSeq)
    // the view path must keep scan pruning: only 2 of 11 lineitem columns read
    val plan = viaSql.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<l_quantity:double,l_returnflag:string>")
      || plan.contains("ReadSchema: struct<l_returnflag:string,l_quantity:double>"),
      s"view query must prune the scan:\n$plan")
  }

  test("internal-column operators reject inputs that already use reserved names") {
    val withSalt = spark.range(3).select($"id".as("k"), lit(0).as("__salt"))
    val clean = spark.range(3).select($"id".as("k"), $"id".as("v"))
    val e1 = intercept[IllegalArgumentException] {
      Skew.saltedJoin(withSalt, clean, Seq("k"), saltOn = $"k")
    }
    assert(e1.getMessage.contains("__salt"))
    val withBin = spark.range(3).select($"id".as("p"), lit(0L).as("__bin"))
    val iv = spark.range(3).select($"id".as("lo"), ($"id" + 1).as("hi"))
    val e2 = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(withBin, "p", iv, "lo", "hi", binWidth = 10L)
    }
    assert(e2.getMessage.contains("__bin"))
    val withK = spark.range(3).select($"id".as("t"), $"id".as("__k"))
    val e3 = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(withK, clean.withColumn("t", $"v"), key = "k",
        leftTime = "t", rightTime = "t", valueCols = Seq("v"),
        leftTie = "t", rightTie = "v")
    }
    assert(e3.getMessage.contains("__k"))
  }

  test("exact dedup collapses identical bodies only") {
    val d = Dedup.ddExact(spark, sf())
    // no two distinct originals share a body; variants differ from sources
    assert(d.filter($"n_copies" > 1).count() == 0)
  }

  test("MIPS augmentation makes every corpus norm equal to the max") {
    val e = graft.sources.Tables.embeddings(spark, sf())
    val m2 = e.select(max(graft.functions.Portable.dotDouble(
      $"embedding", $"embedding"))).head.getDouble(0)
    val aug = Mips.augmented(e, m2)
      .select(graft.functions.Portable.dotDouble($"aug", $"aug").as("n2"))
      .as[Double].collect()
    // float round-trip of the appended coordinate costs a few ulps of m2
    aug.foreach(n2 => assert(math.abs(n2 - m2) / m2 < 1e-6,
      s"augmented norm^2 $n2 != corpus max $m2"))
  }

  test("MIPS LSH recall@5 vs exact MIPS meets the floor") {
    val bf = Mips.simMipsTopK(spark, sf("sf0.01"))
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Mips.mipsLshTopK(spark, sf("sf0.01"))
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect lsh).size.toDouble / bf.size
    assert(recall >= 0.8, s"MIPS LSH recall@5 $recall below 0.8 floor")
    graft.Caches.releaseAll()
  }

  test("gramBuckets kernel equals the built-in ngrams -> hash60 -> pmod chain") {
    val docs = graft.sources.Tables.documents(spark, sf()).limit(200)
    val kernel = docs.select($"doc_id",
      graft.functions.NgramHash60s.gramBuckets($"text", 2, 1024L).as("bs"))
    val builtin = docs.select($"doc_id",
      transform(graft.functions.Portable.ngrams($"text", 2),
        g => pmod(graft.functions.Portable.hash60(g), lit(1024L))).as("bs"))
    val mismatches = kernel.as[(Long, Seq[Long])].collect().toMap
      .toSet.diff(builtin.as[(Long, Seq[Long])].collect().toMap.toSet)
    assert(mismatches.isEmpty, s"kernel != builtin for ${mismatches.take(3)}")
  }

  test("DSIR offline train + apply equals the in-query path; model round-trips") {
    val docs = graft.sources.Tables.documents(spark, sf())
    val isTgt = col("source").isin(Dsir.TargetSources: _*)
    val inQuery = Dsir.importanceWeights(docs, isTgt).collect().toSeq
    graft.Caches.releaseAll()
    val model = Dsir.train(docs, isTgt)
    val applied = Dsir.scoreWith(docs, isTgt, model).collect().toSeq
    assert(applied == inQuery, "train+apply must equal the single-pass path")
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir_model_").toString
    Dsir.saveModel(spark, model, dir)
    val loaded = Dsir.loadModel(spark, dir)
    assert(loaded.cntRaw.sameElements(model.cntRaw) &&
      loaded.cntTarget.sameElements(model.cntTarget), "model must round-trip")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("DSIR scores docs of entirely unseen grams at the Laplace constant") {
    val train = Seq((0L, "alpha beta alpha beta alpha", "tgt"),
      (1L, "gamma delta gamma delta gamma", "raw")).toDF("doc_id", "text", "source")
    val model = Dsir.train(train, $"source" === "tgt")
    val fresh = Seq((9L, "zzq wwx yyv uut", "raw")).toDF("doc_id", "text", "source")
    // confirm the fresh grams hash to buckets unseen in BOTH histograms
    // (deterministic md5 — if a word edit ever collides, pick new words)
    val freshBuckets = fresh.select(explode(
        graft.functions.NgramHash60s.gramBuckets($"text", Dsir.GramN, Dsir.B.toLong)))
      .as[Long].collect()
    assert(freshBuckets.forall(b =>
      model.cntRaw(b.toInt) == 0 && model.cntTarget(b.toInt) == 0))
    // all unseen buckets share one weight: the Laplace smoothing-mass bias
    val constants = freshBuckets.map(b => model.weights(b.toInt)).distinct
    assert(constants.length == 1)
    val row = Dsir.scoreWith(fresh, $"source" === "tgt", model)
      .select($"n_grams", $"dsir_score").head
    assert(row.getLong(0) == 3L)
    assert(row.getLong(1) == 3L * constants.head,
      s"unseen-gram score ${row.getLong(1)} != 3 x Laplace constant ${constants.head}")
  }

  test("DSIR per-row scorer equals the explode+aggregate path") {
    val docs = graft.sources.Tables.documents(spark, sf())
    val isTgt = col("source").isin(Dsir.TargetSources: _*)
    val model = Dsir.train(docs, isTgt)
    val viaAgg = Dsir.scoreWith(docs, isTgt, model).collect().toSet
    val perRow = Dsir.scorePerRow(docs, isTgt, model).collect().toSet
    assert(perRow == viaAgg, "one-projection scorer must equal the agg path")
    // degenerate texts: NULL (bare size() would read -1/NULL under the
    // pinned legacy semantics), empty, and gram-less — all must score
    // (n_grams=0, dsir_score=0) on BOTH paths, keeping the contract
    val edge = Seq((1L, null.asInstanceOf[String], "src0"),
      (2L, "", "src9"), (3L, "xy", "src1")).toDF("doc_id", "text", "source")
    val edgeTgt = col("source").isin(Dsir.TargetSources: _*)
    val perRowEdge = Dsir.scorePerRow(edge, edgeTgt, model)
      .orderBy($"doc_id").collect().toSeq
    val viaAggEdge = Dsir.scoreWith(edge, edgeTgt, model).collect().toSeq
    assert(perRowEdge == viaAggEdge,
      s"per-row $perRowEdge must equal agg $viaAggEdge on degenerate text")
    perRowEdge.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L,
        s"gram-less doc must score (0,0), got $r")
    }
  }

  test("DSIR separates planted target-like docs from junk") {
    val tgtVocab = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val junkVocab = Seq("zip", "zap", "zop", "quux", "blort")
    def doc(v: Seq[String], seed: Int): String =
      (0 until 30).map(i => v((i * 7 + seed) % v.size)).mkString(" ")
    val docs = (
      (0 until 8).map(i => (i.toLong, doc(tgtVocab, i), "tgt")) ++
      (8 until 12).map(i => (i.toLong, doc(junkVocab, i), "raw")) ++
      Seq((12L, doc(tgtVocab, 3), "raw"),   // target-like candidate
          (13L, "solo", "raw"))             // gram-less doc
    ).toDF("doc_id", "text", "source")
    val w = Dsir.importanceWeights(docs, $"source" === "tgt")
      .select($"doc_id", $"n_grams", $"dsir_score")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(w.size == 14, "every input doc must be scored")
    assert(w(13L) == (0L, 0L), "gram-less doc scores 0 with 0 grams")
    val junkMax = (8L until 12L).map(w(_)._2).max
    assert(w(12L)._2 > junkMax,
      s"target-like candidate ${w(12L)._2} must outscore junk (max $junkMax)")
    graft.Caches.releaseAll()
  }
}
