package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SoftDedupSpec extends SparkSpec {
  import spark.implicits._

  test("soft dedup: cluster mass conserves — sum of weights over a cluster ~ 1 doc") {
    val w = Dedup.ddSoftDedup(spark, sf()).collect()
    graft.Caches.releaseAll()
    assert(w.nonEmpty)
    // every doc appears exactly once
    assert(w.map(_.getLong(0)).distinct.length == w.length)
    w.foreach { r =>
      val m = r.getLong(2); val ppm = r.getLong(3)
      assert(m >= 1 && ppm == 1000000L / m, s"weight must be 1/m in ppm: $r")
    }
    // per-cluster: m members each carrying 1e6/m ppm => cluster mass
    // within m of 1e6 (integer floor), and singletons carry exactly 1e6
    w.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val m = rows.head.getLong(2)
      assert(rows.length == m, s"multiplicity must equal member count")
      val mass = rows.map(_.getLong(3)).sum
      assert(mass <= 1000000L && mass > 1000000L - m)
    }
    val planted = w.filter(_.getLong(2) > 1)
    assert(planted.nonEmpty, "augmented corpus must contain clusters")
  }

  test("incremental fold is bit-equal to the full recompute") {
    val want = Dedup.ddSoftDedup(spark, sf()).collect().toSeq
    graft.Caches.releaseAll()
    val got = Dedup.ddSoftDedupIncremental(spark, sf()).collect().toSeq
    graft.Caches.releaseAll()
    assert(got == want)
  }

  test("two successive ingests through the persisted state equal one batch clustering") {
    val want = Dedup.ddSoftDedup(spark, sf()).collect().toSeq
    graft.Caches.releaseAll()
    // three corpus slices by id range (history < 9000 ≤ batch1 < 10000 ≤
    // batch2 — the ingest contract's append-only id convention); the
    // second ingest proves the state a fold WRITES is the state the next
    // fold can RESUME from (geometry deltas accumulate, cluster snapshot
    // advances v0→v1→v2)
    val aug = graft.Caches.persist(Dedup.augmented(spark, sf()))
    val stateDir = graft.TmpDirs.create("graft_softstate_spec_")
    Dedup.softDedupStateBuild(aug.filter($"doc_id" < 9000), stateDir)
    Dedup.softDedupIngest(stateDir,
      aug.filter($"doc_id" >= 9000 && $"doc_id" < 10000),
      aug.filter($"doc_id" < 9000).select($"doc_id")).collect()
    val got = Dedup.softDedupIngest(stateDir,
      aug.filter($"doc_id" >= 10000),
      aug.filter($"doc_id" < 10000).select($"doc_id")).collect().toSeq
    // the state root is a real store: families stamped, cluster snapshot
    // committed and retired, geometry deltas live — fsck audits it clean
    val audit = graft.streaming.StoreFsck.fsckStore(spark, stateDir)
      .select($"check").as[String].collect().toSeq
    assert(audit == Seq("clean"), audit.toString)
    graft.Caches.releaseAll(); graft.TmpDirs.releaseAll()
    assert(got == want)
  }

  test("full state lifecycle: ingest, geometry compaction, erasure, ingest ≡ never-ingested") {
    import org.apache.spark.sql.functions.expr
    val aug = graft.Caches.persist(Dedup.augmented(spark, sf()))
    val erasePred = "(doc_id % 8) = 2 AND doc_id < 10000"
    val want = Dedup.softDedupWeights(aug.filter(!expr(erasePred)))
      .collect().toSeq
    graft.Caches.releaseAll()
    val stateDir = graft.TmpDirs.create("graft_softstate_life_")
    Dedup.softDedupStateBuild(aug.filter($"doc_id" < 9000), stateDir)
    Dedup.softDedupIngest(stateDir,
      aug.filter($"doc_id" >= 9000 && $"doc_id" < 10000),
      aug.filter($"doc_id" < 9000).select($"doc_id")).collect()
    // routine maintenance mid-lifecycle: the build's bucketed v=0
    // snapshots and the ingest's b1 deltas fold to bucketed v=1 per
    // family — later ingests and the erasure must read through the
    // swept snapshot exactly as they read the delta tail
    Dedup.softDedupSweep(spark, stateDir)
    Dedup.softDedupErase(spark, stateDir,
      aug.filter(expr(erasePred)).select($"doc_id"))
    val got = Dedup.softDedupIngest(stateDir,
      aug.filter($"doc_id" >= 10000),
      aug.filter($"doc_id" < 10000 && !expr(erasePred)).select($"doc_id"))
      .collect().toSeq
    graft.Caches.releaseAll(); graft.TmpDirs.releaseAll()
    assert(got == want)
  }

  test("ingest probes plan Exchange-free on the stored geometry side") {
    val aug = graft.Caches.persist(Dedup.augmented(spark, sf()))
    val stateDir = graft.TmpDirs.create("graft_softstate_plan_")
    Dedup.softDedupStateBuild(aug.filter($"doc_id" < 9000), stateDir)
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the planner must consider distribution —
      // at a 100 TB corpus with a large daily batch neither side
      // broadcasts, and this is exactly the regime the bucketed
      // snapshot exists for
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val (cross, shSemi) = Dedup.ingestProbeHalves(spark, stateDir,
        aug.filter($"doc_id" >= 9000))
      val planC = cross.queryExecution.executedPlan.toString
      // exactly ONE hash Exchange on (band, sig): the batch side
      // aligning to the bucket layout; the corpus-sized snapshot reads
      // straight off its buckets
      val nC = "Exchange hashpartitioning\\(band".r.findAllIn(planC).length
      assert(planC.contains("SortMergeJoin"), s"expected SMJ:\n$planC")
      assert(nC == 1,
        s"band probe must shuffle ONLY the batch side (got $nC):\n$planC")
      // shingle semi-join: the candidate-id side shuffles (batch-sized
      // banding + distinct), but the STORED side must stream off its
      // doc_id buckets with no Exchange anywhere in its subtree
      val planS = shSemi.queryExecution.executedPlan.toString
      val rootS = shSemi.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.initialPlan
        case o => o
      }
      val semis = rootS.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
            if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
      }
      assert(semis.nonEmpty, s"expected a sort-merge semi join:\n$planS")
      val stored = semis.head.left
      assert(stored.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }.isEmpty, s"stored shingle side must not shuffle:\n$planS")
      assert(stored.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.relation.bucketSpec.isDefined => f
      }.nonEmpty, s"stored side must be the bucketed scan:\n$planS")
      // sanity: the same joins over a BARE parquet read of the snapshot
      // files (the layout silently lost) shuffle both sides
      val bareDir = {
        val d = s"$stateDir/${Dedup.StateBands._1}"
        val v = graft.streaming.BucketedFamily.readSnapshot(spark, d,
          Dedup.StateBands._2).get._2
        s"$d/v=$v"
      }
      val bareRel = spark.read.schema(Dedup.StateBands._2).parquet(bareDir)
      val bare = bareRel.as("a").join(bareRel.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig"))
      val nBare = "Exchange hashpartitioning\\(band".r
        .findAllIn(bare.queryExecution.executedPlan.toString).length
      assert(nBare == 2, s"sanity: bare read should shuffle both sides ($nBare)")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      graft.Caches.releaseAll(); graft.TmpDirs.releaseAll()
    }
  }

  test("state handoff: a fresh session resumes ingest from the on-disk root alone") {
    val aug = graft.Caches.persist(Dedup.augmented(spark, sf()))
    val want = Dedup.softDedupWeights(aug).collect().toSeq
    val stateDir = graft.TmpDirs.create("graft_softstate_restart_")
    Dedup.softDedupStateBuild(aug.filter($"doc_id" < 10000), stateDir)
    graft.Caches.releaseAll()
    // the production restart in miniature: a DIFFERENT session (fresh
    // session state and conf view) must recover the banding geometry,
    // the bucketed snapshot layout, the cluster fold version, and the
    // ingest-guard high-water from disk markers alone. Defensively drop
    // any bucketed-table registrations the build session could have
    // left (Spark's external catalog is shared across newSession).
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_bfam_"))
      .foreach(t => spark.sql(s"DROP TABLE ${t.name}"))
    val fresh = spark.newSession()
    val augF = graft.Caches.persist(Dedup.augmented(fresh, sf()))
    val got = Dedup.softDedupIngest(stateDir,
      augF.filter(col("doc_id") >= 10000),
      augF.filter(col("doc_id") < 10000).select(col("doc_id")))
      .collect().toSeq
    // the fresh session served the probe through a RE-REGISTERED
    // external bucketed table, not a bare parquet read
    assert(fresh.catalog.listTables().collect()
      .exists(_.name.startsWith("graft_bfam_")),
      "ingest must re-register the bucketed snapshot in the fresh session")
    graft.Caches.releaseAll(); graft.TmpDirs.releaseAll()
    assert(got == want)
  }

  test("ingest holds the state root's maintenance lease: a concurrent ingest refuses loudly") {
    val aug = graft.Caches.persist(Dedup.augmented(spark, sf()))
    val stateDir = graft.TmpDirs.create("graft_softstate_race_")
    Dedup.softDedupStateBuild(aug.filter($"doc_id" < 9000), stateDir)
    val batch = aug.filter($"doc_id" >= 9000 && $"doc_id" < 10000)
    val histIds = aug.filter($"doc_id" < 9000).select($"doc_id")
    // deterministic race: the main thread holds the root lease (a
    // scheduler's sweep, or the winner ingest mid-flight); a second
    // ingest on another thread must refuse BEFORE writing anything —
    // pre-fix it would overwrite the winner's b(ver+1) geometry delta
    // and only the later cluster publish would refuse.
    graft.streaming.MaintenanceLease.withLease(spark, stateDir) {
      val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val t = new Thread(() => {
        try Dedup.softDedupIngest(stateDir, batch, histIds).collect()
        catch { case e: Throwable => err.set(e) }
      })
      t.start(); t.join()
      assert(err.get() != null, "concurrent ingest must not succeed")
      assert(err.get().isInstanceOf[
        graft.streaming.MaintenanceLease.LeaseHeldException],
        s"expected LeaseHeldException, got ${err.get()}")
      // the refused ingest wrote NOTHING: no b1 geometry delta exists
      assert(!new java.io.File(s"$stateDir/geometry_bands/b1").exists(),
        "refused ingest must not have written a geometry delta")
    }
    // after the lease releases, the same ingest succeeds and the final
    // weights equal the one-shot recompute over history ∪ batch
    val want = Dedup.softDedupWeights(aug.filter($"doc_id" < 10000))
      .collect().toSeq
    val got = Dedup.softDedupIngest(stateDir, batch, histIds).collect().toSeq
    graft.Caches.releaseAll(); graft.TmpDirs.releaseAll()
    assert(got == want)
  }

  test("crashed ingest's uncommitted geometry delta is invisible to the re-run") {
    val aug = graft.Caches.persist(Dedup.augmented(spark, sf()))
    val stateDir = graft.TmpDirs.create("graft_softstate_crash_")
    Dedup.softDedupStateBuild(aug.filter($"doc_id" < 10000), stateDir)
    val batch = graft.Caches.persist(aug.filter($"doc_id" >= 10000))
    // simulate the crash window (delta written, cluster fold v1 never
    // committed): plant a b1 delta in BOTH geometry families holding the
    // batch's own rows. Pre-fix, the re-run's geometryParts read this
    // stale tail as stored history, so the batch collided with itself —
    // self-candidate pairs and doubled shingle rows corrupting Jaccard.
    val payload = batch.select($"doc_id", $"text")
    payload.select($"doc_id", lit(0).as("band"),
        md5($"text").as("sig"))
      .write.parquet(s"$stateDir/geometry_bands/b1")
    payload.select($"doc_id",
        xxhash64($"text").as("h"))
      .write.parquet(s"$stateDir/geometry_shingles/b1")
    val want = Dedup.softDedupWeights(aug).collect().toSeq
    val got = Dedup.softDedupIngest(stateDir, batch,
      aug.filter($"doc_id" < 10000).select($"doc_id")).collect().toSeq
    graft.Caches.releaseAll(); graft.TmpDirs.releaseAll()
    assert(got == want,
      "re-run after a crash must ignore the uncommitted delta tail")
  }

  test("ingest refuses a batch overlapping already-ingested ids (duplicate-id guard)") {
    val aug = graft.Caches.persist(Dedup.augmented(spark, sf()))
    val stateDir = graft.TmpDirs.create("graft_softstate_guard_")
    // split INSIDE the base id range so the re-delivered batch is
    // genuinely non-empty at spec scale
    Dedup.softDedupStateBuild(aug.filter($"doc_id" < 250), stateDir)
    Dedup.softDedupIngest(stateDir,
      aug.filter($"doc_id" >= 250 && $"doc_id" < 10000),
      aug.filter($"doc_id" < 250).select($"doc_id"))
    // re-delivering the COMPLETED batch must refuse loudly, not
    // silently double its geometry rows
    val e = intercept[IllegalArgumentException] {
      Dedup.softDedupIngest(stateDir,
        aug.filter($"doc_id" >= 250 && $"doc_id" < 10000),
        aug.filter($"doc_id" < 250).select($"doc_id"))
    }
    assert(e.getMessage.contains("high-water"), e.getMessage)
    graft.Caches.releaseAll(); graft.TmpDirs.releaseAll()
  }

  test("incremental fold with an empty batch reproduces history state") {
    val aug = Dedup.augmented(spark, sf())
    val want = Dedup.softDedupWeights(aug.filter($"doc_id" < 10000))
      .collect().toSeq
    graft.Caches.releaseAll()
    val got = Dedup.softDedupIncremental(
      aug.filter($"doc_id" < 10000), aug.filter(lit(false)))
      .collect().toSeq
    graft.Caches.releaseAll()
    assert(got == want)
  }

  test("repeated folds from empty state over arbitrary pair slices equal one batch clustering") {
    val want = Dedup.ddSoftDedup(spark, sf()).collect().toSeq
    graft.Caches.releaseAll()
    val aug = graft.Caches.persist(Dedup.augmented(spark, sf()))
    val pairs = graft.Caches.persist(
      Dedup.minhashLshPairs(aug).select($"id_a", $"id_b"))
    var labels = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
    var sizes = Seq.empty[(Long, Long)].toDF("cluster_id", "m")
    (0 until 3).foreach { i =>
      // slices are arbitrary w.r.t. components: an edge can arrive with
      // neither, one, or both endpoints already labeled — every
      // contraction branch of foldSoftLabels fires across the 3 folds
      val slice = pairs.filter(pmod($"id_a" + $"id_b", lit(3)) === i)
      val (l2, s2) = Dedup.foldSoftLabels(labels, sizes, slice)
      labels = l2.localCheckpoint(true)
      sizes = s2.localCheckpoint(true)
    }
    // re-delivering an already-folded slice must be a no-op (self-loops)
    val (l3, s3) = Dedup.foldSoftLabels(labels, sizes,
      pairs.filter(pmod($"id_a" + $"id_b", lit(3)) === 1))
    val got = Dedup.softWeightsOf(aug.select($"doc_id"), l3, s3)
      .collect().toSeq
    graft.Caches.releaseAll()
    assert(got == want)
  }

  test("unfold: bridge erasure splits, min-label retirement relabels, untouched clusters pass through") {
    // components {1,2,3} (label 1) and {10,11} (label 10)
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val sizes = Seq((1L, 3L), (10L, 2L)).toDF("cluster_id", "m")
    // erase doc 2 (the bridge of a (1,2),(2,3) chain): survivors 1 and 3
    // have no surviving pair -> both fall back to singletons
    val (l2, s2) = Dedup.unfoldSoftLabels(labels, sizes,
      Seq(Tuple1(2L)).toDF("doc_id"),
      Seq((10L, 11L)).toDF("id_a", "id_b"))
    assert(l2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(10L -> 10L, 11L -> 10L))
    assert(s2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(10L -> 2L))
    graft.Caches.releaseAll()
    // erase doc 1 (the min member): {2,3} survives pair (2,3) -> the
    // component relabels to its new min 2
    val (l3, s3) = Dedup.unfoldSoftLabels(labels, sizes,
      Seq(Tuple1(1L)).toDF("doc_id"),
      Seq((2L, 3L), (10L, 11L)).toDF("id_a", "id_b"))
    assert(l3.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(2L -> 2L, 3L -> 2L, 10L -> 10L, 11L -> 10L))
    assert(s3.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(2L -> 2L, 10L -> 2L))
    graft.Caches.releaseAll()
  }

  test("∀ random graphs and slicings: fold/unfold equal the one-shot union-find reference") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed

    // plain-scala reference: CC by union-find, label = component min,
    // labels only for docs that appear in some edge
    def reference(edges: Seq[(Long, Long)]): (Map[Long, Long], Map[Long, Long]) = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val labels = nodes.map(n => n -> find(n)).toMap
      (labels, labels.groupBy(_._2).map { case (c, g) => c -> g.size.toLong })
    }

    def checkState(labels: org.apache.spark.sql.DataFrame,
        sizes: org.apache.spark.sql.DataFrame,
        edges: Seq[(Long, Long)], ctx: String): Unit = {
      val (wantL, wantM) = reference(edges)
      assert(labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        == wantL, s"$ctx labels")
      assert(sizes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        == wantM, s"$ctx sizes")
    }

    val genEdge = for {
      a <- Gen.choose(0L, 23L); d <- Gen.choose(1L, 6L)
    } yield (a, a + d)

    Seq(11L, 23L, 47L, 101L).foreach { seed =>
      val edges = Gen.listOfN(40, genEdge)
        .pureApply(Gen.Parameters.default, Seed(seed))
      var labels = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
      var sizes = Seq.empty[(Long, Long)].toDF("cluster_id", "m")
      (0 until 3).foreach { k =>
        val slice = edges.filter { case (a, b) => (a * 31 + b) % 3 == k }
        val (l2, s2) = Dedup.foldSoftLabels(labels, sizes,
          slice.toDF("id_a", "id_b"))
        labels = l2.localCheckpoint(true); sizes = s2.localCheckpoint(true)
      }
      checkState(labels, sizes, edges, s"seed=$seed folded")
      // erase a random-ish slice of the ids and fold down
      val erased = (0L to 29L).filter(i => (i + seed) % 5 == 0)
      val surviving = edges.filter { case (a, b) =>
        !erased.contains(a) && !erased.contains(b) }
      val (l3, s3) = Dedup.unfoldSoftLabels(labels, sizes,
        erased.toDF("doc_id"), surviving.toDF("id_a", "id_b"))
      checkState(l3.localCheckpoint(true), s3.localCheckpoint(true),
        surviving, s"seed=$seed unfolded")
      graft.Caches.releaseAll()
    }
  }

  test("pipeline weights: a cluster spanning exact copies AND near-dups prices as one component") {
    val body = (1 to 40).map(i => s"w$i").mkString(" ")
    val near = (6 to 40).map(i => s"w$i").mkString(" ")  // drop 5 words
    val docs = Seq(
      (1L, body), (2L, near), (3L, body),   // exact (1,3) ∪ near (1,2)
      (9L, "q r s t u v " * 10)             // singleton
    ).toDF("doc_id", "text")
    val w = Dedup.softDedupPipelineWeights(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    graft.Caches.releaseAll()
    assert(w(1L) == ((1L, 3L, 333333L)) && w(2L) == ((1L, 3L, 333333L))
      && w(3L) == ((1L, 3L, 333333L)), s"spanning cluster must weigh 1/3: $w")
    assert(w(9L) == ((9L, 1L, 1000000L)))
  }

  test("soft budget mix keeps per-stratum effective tokens near share x budget") {
    val docs = graft.sources.Tables.documents(spark, sf())
    val weights = Dedup.ddSoftDedup(spark, sf()).filter($"doc_id" < 10000)
    val kept = Dedup.softBudgetMix(docs, weights).collect()
    assert(kept.nonEmpty)
    // every kept doc must be a real doc with its soft weight attached
    kept.foreach { r => assert(r.getLong(3) >= 1 && r.getLong(3) <= 1000000L) }
    // total effective kept mass must be far below the corpus (budget = 1/4)
    val keptEff = kept.map(r => r.getLong(2) * r.getLong(3)).sum
    val totalEff = docs
      .join(weights.select($"doc_id", $"weight_ppm"), Seq("doc_id"))
      .select(sum(size(split($"text", " ")).cast("long") * $"weight_ppm"))
      .as[Long].head()
    graft.Caches.releaseAll()
    assert(keptEff < totalEff / 2, s"kept=$keptEff total=$totalEff")
  }

  test("lsh tuner: integrals are sane and the pipeline banding is the argmin") {
    val rows = Dedup.lshTune(spark).collect()
    assert(rows.length == Dedup.TuneConfigs.length)
    val full = Dedup.TuneGrid.toLong * Dedup.TuneQ
    rows.foreach { r =>
      assert(r.getInt(0) * r.getInt(1) == 16)
      assert(r.getLong(2) >= 0 && r.getLong(2) <= full / 2)
      assert(r.getLong(3) >= 0 && r.getLong(3) <= full / 2)
    }
    val chosen = rows.filter(_.getBoolean(5))
    assert(chosen.nonEmpty)
    assert(chosen.map(_.getLong(4)).distinct.length == 1)
    assert(chosen.forall(c => rows.forall(_.getLong(4) >= c.getLong(4))))
    // monotone extremes: 16 bands of 1 row candidates nearly everything
    // (max FP, min FN); 1 band of 16 rows the reverse
    val byB = rows.map(r => r.getInt(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(byB(16)._1 > byB(1)._1 && byB(16)._2 < byB(1)._2)
  }

  test("intradoc dedup: within-doc repeats drop, cross-doc repeats survive") {
    val docs = Seq(
      (1L, "a b a b c d"),   // block "a b" repeats inside the doc
      (2L, "a b x y"),       // shares "a b" with doc 1 — must survive
      (3L, "q r s")          // odd tail block "s"
    ).toDF("doc_id", "text")
    val out = TextAnalysis.intradocDedup(docs, 2).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getLong(1) == 3 && byId(1L).getLong(2) == 2)
    assert(byId(1L).getString(3) == "a b c d")
    assert(byId(2L).getString(3) == "a b x y")
    assert(byId(3L).getString(3) == "q r s")
    // idempotence: deduping the cleaned text changes nothing
    val again = TextAnalysis.intradocDedup(
      out.map(r => (r.getLong(0), r.getString(3))).toSeq.toDF("doc_id", "text"), 2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    out.foreach(r => assert(again(r.getLong(0)) == r.getString(3)))
  }

  test("intradoc dedup on the corpus: kept never exceeds blocks, text stays ordered") {
    val out = TextAnalysis.txIntradocDedup(spark, sf()).collect()
    assert(out.length == 500)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getString(3).nonEmpty)
    }
    assert(out.exists(r => r.getLong(2) < r.getLong(1)),
      "the 2-word blocks must actually collide within some doc")
  }
}
