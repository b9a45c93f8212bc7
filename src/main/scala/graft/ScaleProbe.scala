package graft

import org.apache.spark.sql.SparkSession

/** Output-cardinality probe: `runMain graft.CountQuery <dir> <name...>`
  * prints each gated query's output row count on `dir`. Companion to
  * [[ScaleProbe]] — for output-growth-bound operators (ER blocking,
  * near-dup pairs) the honest scale law is wall-clock ∝ OUTPUT, and
  * this measures the output side of that ratio. */
object CountQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Caches.quietCheckpointFreeWarnings()
    args.drop(1).foreach { name =>
      val n = try SparkEntry.queries(name)(spark, dir).count()
              finally Caches.releaseAll()
      println(s"[count] $name $dir rows=$n")
    }
    spark.stop()
  }
}

/** Scale-growth probe: times the document/embedding scale-path queries
  * on two directories (typically sf0.1 and a replicated N× copy) and
  * prints the growth ratio per query. Sub-linear-to-linear growth is the
  * empirical check behind SCALING.md's claims — a quadratic pair scan
  * would show ~N² here. Usage:
  * `runMain graft.ScaleProbe <dirSmall> <dirBig> [query ...]` — trailing
  * names restrict the run to those probes (the special sections still
  * run only in a full, unfiltered run). */
object ScaleProbe {
  private val Probes = Seq(
    "dd_exact", "dd_minhash_lsh", "dd_simhash",
    "dd_pipeline", "dd_incremental", "dd_decontaminate", "dd_curate",
    "dd_cluster", "dd_span_dedup", "dd_substring_dedup",
    "sim_lsh_topk", "sim_ivf_topk", "sim_cosine_neardup",
    "sim_semantic_dedup", "tx_token_stats", "tx_repetition",
    "tx_pack_sequences", "tx_chunk_overlap", "tx_heavy_hitters",
    "tx_length_pctile", "dd_contamination",
    "tx_weighted_sample", "tx_inverted_index", "tx_bm25_topk",
    "sim_pq_topk", "sim_ivf_pq_topk", "sim_prefix_topk",
    "tx_surprisal", "prof_corpus_card", "dd_containment", "dd_curate_pack",
    "sim_mips_topk", "tx_dsir_weights", "tx_dsir_select",
    "sim_neardup_from_index", "tx_bm25_from_index", "sim_pca_project",
    "sim_mips_lsh", "tx_domain_cap", "tx_hybrid_rrf",
    "dd_ngram_jaccard", "dd_ssjoin_prefix", "tok_encode", "qc_score",
    "dd_substring_incremental", "dd_substring_verify", "dd_substring_backfill",
    "tx_bigram_surprisal", "sim_knn_graph", "dd_curate_semantic",
    "sim_knn_from_index", "prof_embedding_card", "mm_exact_dedup",
    // the production auto-plane k-NN graph: the pinned-plane sim_knn_graph
    // carries the documented n²/2^planes candidate term; the auto form
    // must stay ~linear (same law as sim_cosine_neardup_auto)
    "sim_cluster_card", "sim_knn_graph_auto",
    // ER family over the probe corpus's replicated customer table
    // (fresh dense keys per replica — the collision-heavy case); output
    // itself grows ~n·log²n at radius 2, so healthy ratios are ~10-20×
    // at 10× rows while a quadratic blocker would read ~100×
    "er_fuzzy_match", "er_fuzzy_match_d2", "er_cluster", "stream_er",
    "mm_chunk_neardup",
    // the AUTO-plane persisted-index paths: the pinned from-index twins
    // carry the documented n²/2^planes term at 30× (30.8×/11.9×,
    // SCALING.md); these must stay ~linear — the build-once/probe-many
    // answer to that row
    "sim_neardup_from_index_auto", "sim_knn_from_index_auto",
    // df-capped chunk near-dup (hot chunks dropped pre-join) and the
    // clamped chunker — both expected ~mm_chunk_neardup-shaped
    "mm_chunk_neardup_cap", "mm_chunk_clamped",
    // √n-cell IVF through the persisted trained codebook: train cost
    // ~n·√n per k-means pass, probe share ∝ nprobe/√n — the auto
    // sizing for the second ANN family
    "sim_ivf_auto_from_codebook",
    // PII redaction — byte-linear narrow projection, the
    // tx_token_stats family
    "tx_pii_audit",
    // cross near-dup: batch-vs-history banding, no intra-history
    // candidate mass — expected sub-minhashLsh growth
    "dd_cross_neardup",
    // quality-ranked survivor pick: dd_cluster's plan + a narrow score
    // projection + cluster-partitioned rank — expected ~dd_cluster
    "dd_cluster_keep_best",
    // per-batch Misra-Gries sketches: store grows by <= capacity rows
    // per batch regardless of corpus size — expected ~byte-linear
    // (the corpus pass), the tx_heavy_hitters law plus gate fixed cost
    "stream_heavy_hitters",
    // one native JSON parse per row + a tiny-key aggregate — byte-linear
    "ev_json_extract",
    // five regexp passes in one codegen'd projection — byte-linear
    "tx_gopher_rules",
    // tombstone + excluding-fold + retire mid-stream: the fold is one
    // union-and-filter rewrite of snapshot-sized state — ~stream_bm25
    "stream_bm25_delete",
    // entity/vector erasure and aggregate retraction: each is its base
    // gate's replay plus delete-sized anti-joins and one snapshot
    // rewrite per family — expected ~the base gate's law
    "stream_er_delete", "stream_ann_delete", "stream_agg_retract",
    // the base ANN ingest, for attributing stream_ann_delete's ratio
    "stream_ann_neardup",
    // the AUTO-geometry streaming ANN store: planes derived from the
    // corpus at store creation — must kill the pinned store's
    // n²/2^planes law (8.6–9.1× @30× in r11) the way the batch auto
    // paths killed the pinned from-index one
    "stream_ann_neardup_auto", "stream_ann_delete_auto",
    // signed decrement of the window-count index + out-family fold:
    // expected ~stream_substring_dedup plus delete-sized arithmetic
    "stream_substring_delete",
    // the full auto-index lifecycle (build half → append → rebuild when
    // stale → probe); at probe scales the rebuild branch FIRES, so this
    // measures build+rebuild+probe — expected ~2× the from-index-auto
    // path's cost, still ~linear in n
    "sim_neardup_rebuild",
    // sketch-store erasure: base replay + one signed totals row + the
    // survivor-filtered exact verify — expected ~stream_heavy_hitters
    "stream_hh_delete",
    // near-dup pipeline erasure: base two-stream replay + one store
    // fold + output/backlog swaps — expected ~stream_neardup
    "stream_neardup_delete", "stream_neardup",
    // CCNet buckets: the bigram chain + a histogram-sized threshold
    // tail — expected ~tx_bigram_surprisal
    "tx_ccnet_buckets",
    // embedding decontamination: |corpus|·|bench| map-side kernels with
    // the bench fixed — expected ~linear (the bench side does not grow
    // with the corpus in the probe either: the replicas' vec_ids fall
    // outside the 25..49 bench slice)
    "dd_embed_decontaminate",
    // shard manifest / global shuffle / shuffled shards: two-phase
    // prefix-sum and rank — expected ~tx_pack_sequences (byte-linear)
    "tx_shard_manifest", "tx_global_shuffle", "tx_shuffled_shards",
    // the release capstone: the dd_curate chain + the byte-linear
    // shuffle/manifest tail — expected ~dd_curate_pack
    "dd_curate_release",
    // CCNet serve-on-stream: LM train (byte-linear) + 3-batch replay
    // with an LM-sized broadcast join per batch — expected
    // ~tx_ccnet_buckets plus gate fixed cost
    "stream_ccnet_score",
    // paragraph-granularity CCNet: the bigram chain with a para-keyed
    // aggregate + the same histogram cut — expected ~tx_ccnet_buckets
    "tx_ccnet_paragraphs",
    // physical release export + re-read + re-digest: byte-linear write
    // and scan on top of tx_shard_manifest's prefix-sum law
    "tx_release_roundtrip",
    // CCNet selection: the bucket chain + one hash projection — expected
    // ~tx_ccnet_buckets
    "tx_ccnet_select",
    // exact paragraph dedup: digest groupBy (map-side combined, one
    // candidate row per distinct paragraph) + per-doc reassembly lists
    // bounded by each doc's own paragraph count — expected ~dd_exact
    // over the paragraph relation (byte-linear)
    "tx_paragraph_dedup",
    // paragraph-artifact serving: one paragraph-LM train + 3-batch
    // replay — expected ~stream_ccnet_score
    "stream_ccnet_paragraphs",
    // incremental release: batch-sized cumsum + manifest-sized merge —
    // expected ~tx_shard_manifest (the gate recomputes the base
    // manifest in-query; production reads it as an artifact)
    "tx_release_append",
    // soft dedup: dd_cluster's pair/CC cost + one corpus-wide label
    // attach — expected ~dd_cluster
    "dd_soft_dedup",
    // incremental soft dedup: history state + batch/cross banding +
    // label-relation joins — the dd_cross_neardup law plus CC on the
    // contracted (new-edge-sized) graph
    "dd_soft_dedup_incremental",
    // weighted budget mix: soft-dedup's law + a 5-row aggregate and a
    // codegen'd keep filter — expected ~dd_soft_dedup
    "tx_soft_budget_mix",
    // banding auto-tuner: corpus-INDEPENDENT (5 configs × 1024 grid
    // points, constant work) — the ratio itself is the assertion
    "dd_lsh_tune",
    // within-doc block dedup: two doc-keyed aggregates, ~tokens/w short
    // shuffle rows — expected ~tx_paragraph_dedup (byte-linear)
    "tx_intradoc_dedup",
    // streaming cluster-state folds: stream_neardup's replay + three
    // new-edge-sized CC folds + cluster-state-sized parquet rewrites —
    // expected ~stream_neardup plus fold fixed cost
    "stream_soft_dedup",
    // cluster-state erasure: the base replay + store folds + ONE
    // affected-component re-cluster — expected ~stream_neardup_delete
    "stream_soft_dedup_delete",
    // combined exact ∪ near weights in pipeline order — expected
    // ~dd_pipeline plus the CC/label-attach tail (dd_soft_dedup's law)
    "dd_soft_dedup_pipeline",
    // soft mix served per micro-batch from the persisted (weights,
    // rates) snapshot: tx_soft_budget_mix's law plus the 3-batch replay
    // fixed cost — the serve itself is a stateless projection + static
    // join per batch
    "stream_soft_budget_mix",
    // appended physical export: batch-sized cumsum/write + a re-read of
    // the whole landed directory for the digest — expected
    // ~tx_release_roundtrip (the re-read dominates; the append write
    // itself is batch-sized)
    "tx_release_append_roundtrip",
    // batch-state erasure: the state build (dd_soft_dedup's law) + two
    // geometry excluding-folds (snapshot-rewrite-sized) + ONE
    // affected-component verify/CC — the delete-independent fold price
    "dd_soft_dedup_erase",
    // full state lifecycle (build, ingest, SWEEP, ingest): the
    // incremental law plus one bucketed geometry refold — expected
    // ~dd_soft_dedup_incremental plus the snapshot-rewrite term
    "dd_soft_dedup_sweep",
    // soft-mix RTBF: the base serve's law + one weights anti-join
    // rewrite and a 5-row rates re-derivation riding the same scan —
    // expected ~stream_soft_budget_mix
    "stream_soft_budget_mix_delete",
    // persisted digest artifact: one history digest pass + bloom build
    // at store build, then a batch-sized bloom filter + positive-tail
    // anti-join at probe — expected ~dd_incremental (byte-linear in
    // the history pass, probe batch-sized)
    "dd_incremental_store")

  def main(args: Array[String]): Unit = {
    val Array(dirSmall, dirBig) = args.take(2)
    val only = args.drop(2).toSet
    val selected = if (only.isEmpty) Probes else Probes.filter(only)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Caches.quietCheckpointFreeWarnings()

    def timed(df: => org.apache.spark.sql.DataFrame): Double = {
      // release happens OUTSIDE the measured window — a blocking
      // unpersist of ~N× more blocks at the big corpus would otherwise
      // inflate exactly the growth ratios this probe exists to measure
      val t0 = System.nanoTime()
      try {
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      } finally {
        Caches.releaseAll()
        // gate scratch (streaming state, persisted stores) is dead once
        // the action ran — reclaim per probe, not per JVM, or a full
        // probe run accumulates every gate's scratch until exit (the
        // Bench per-query discipline, ADVICE r15)
        TmpDirs.releaseAll()
        // and re-anchor the state-store maintenance timer (the Bench
        // inter-query discipline — see Bridge.resetStreamingStateMaintenance)
        org.apache.spark.sql.graft.Bridge.resetStreamingStateMaintenance()
      }
    }
    // best-of-two timing via two EXPLICIT sequential evaluations of the
    // by-name argument — the old inline `math.min(f(x), f(x))` computed
    // the same thing but read as a copy-paste bug, inviting a wrong "fix"
    // to a single run
    def bestOf2(run: => Double): Double = {
      val r1 = run; val r2 = run; math.min(r1, r2)
    }
    def time(name: String, dir: String): Double =
      timed(SparkEntry.queries(name)(spark, dir))
    // warmup
    time("tx_token_stats", dirSmall)
    selected.foreach { name =>
      val s = bestOf2(time(name, dirSmall))
      val b = bestOf2(time(name, dirBig))
      println(f"[probe] $name%-22s small=$s%7.2fs big=$b%7.2fs ratio=${b / s}%5.1fx")
    }
    // special sections: all in a full run; the ER and ccnet_cap probes
    // are also individually addressable (cheap to re-run alone)
    if (only.nonEmpty && !only("er_fuzzy_d2") && !only("ccnet_cap")) {
      spark.stop(); return
    }
    if (only.isEmpty) {
    // the documented mitigation for near-dup's n²/2^planes candidate
    // growth: scale planes with the corpus (+3 planes ≈ 8× fewer
    // in-bucket pairs at 10× data)
    def timeNd(dir: String, planes: Int): Double =
      timed(graft.operators.Similarity.cosineNearDupPairs(spark, dir, 4, planes))
    val nd8 = bestOf2(timeNd(dirBig, 8))
    val nd11 = bestOf2(timeNd(dirBig, 11))
    println(f"[probe] neardup@big planes=8 ${nd8}%.2fs vs planes=11 ${nd11}%.2fs")
    // the production entry point derives planes from the corpus count —
    // its growth at 10× data is the number that must stay ~linear
    def timeAuto(dir: String): Double =
      timed(graft.operators.Similarity.cosineNearDupAuto(spark, dir))
    val as = bestOf2(timeAuto(dirSmall))
    val ab = bestOf2(timeAuto(dirBig))
    println(f"[probe] sim_cosine_neardup_auto small=$as%7.2fs big=$ab%7.2fs ratio=${ab / as}%5.1fx")
    // adversarial chain graph: min-label propagation needs DIAMETER
    // rounds (a 10k chain would blow the 64-round cap ~156x over);
    // alternating star contraction is the O(log²) drop-in — rounds must
    // grow ~log n, wall-clock ~rounds, NOT ~n
    def chainRounds(n: Long): (Double, Int) = {
      import org.apache.spark.sql.functions.col
      val edges = spark.range(n - 1)
        .select(col("id").as("src"), (col("id") + 1).as("dst"))
      val t0 = System.nanoTime()
      val (labels, rounds) = graft.operators.Cluster.alternatingWithRounds(edges)
      val bad = labels.filter(col("cluster_id") =!= 0).count()
      require(bad == 0, s"chain($n) mislabeled $bad vertices")
      ((System.nanoTime() - t0) / 1e9, rounds)
    }
    val (c1, r1) = chainRounds(1000)
    val (c10, r10) = chainRounds(10000)
    println(f"[probe] cc_chain_altstar 1k=${c1}%.2fs/$r1%d rounds 10k=${c10}%.2fs/$r10%d rounds " +
      f"ratio=${c10 / c1}%4.1fx (diameter-bound propagation: 1000 vs 10000 rounds)")
    }
    if (only.isEmpty || only("ccnet_cap")) {
    // the LM cap's scale contract: with topK FIXED, the persisted LM —
    // and therefore the serving join's build side — stays the same size
    // no matter how large the training corpus, so serving a FIXED doc
    // batch costs ~the same against a 10x-corpus LM. Uncapped, LM rows
    // grow with the corpus vocabulary and the serve cost follows.
    def ccnetCapProbe(trainDir: String): (Long, Double) = {
      val lmDir = graft.TmpDirs.create("graft_probe_ccnet_lm_")
      graft.operators.TextAnalysis.trainPersistCcnet(
        spark, trainDir, lmDir, topK = 5000L)
      val big = spark.read.parquet(s"$lmDir/big")
      val rows = big.count()
      val served = bestOf2(timed(graft.operators.TextAnalysis.ccnetServeFrom(
        spark, lmDir, graft.sources.Tables.documents(spark, dirSmall)
          .select(org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.col("lang"),
            org.apache.spark.sql.functions.col("text")))))
      (rows, served)
    }
    val (lmS, srvS) = ccnetCapProbe(dirSmall)
    val (lmB, srvB) = ccnetCapProbe(dirBig)
    println(f"[probe] ccnet_cap@K=5000 lm_rows small=$lmS%d big=$lmB%d " +
      f"serve small=$srvS%5.2fs big=$srvB%5.2fs ratio=${srvB / srvS}%4.1fx " +
      "(fixed doc batch; capped LM pins the build side)")
    }
    if (only.nonEmpty && !only("er_fuzzy_d2")) { spark.stop(); return }
    // (below here: full runs and er-only runs)
    // deletion-neighborhood ER at radius 2: candidates must track
    // variant COLLISIONS, not n². Dense zero-padded decimal keys are
    // the adversarially collision-heavy case (every pair differing in
    // ≤2 digit positions collides AND matches) — output pairs grow
    // ~n·log²n there, so a healthy wall-clock ratio at 10× rows is
    // ~10-20×, while a quadratic blocker would show ~100×.
    def erProbe(n: Long): Double = {
      import org.apache.spark.sql.functions.{col, format_string}
      val names = spark.range(n).select(col("id"),
        format_string("Customer#%09d", col("id")).as("name"))
      timed(graft.operators.EntityResolution.fuzzyMatchPairs(
        names, "id", "name", maxDist = 2))
    }
    val er1 = bestOf2(erProbe(1500))
    val er10 = bestOf2(erProbe(15000))
    println(f"[probe] er_fuzzy_d2 1.5k=${er1}%.2fs 15k=${er10}%.2fs ratio=${er10 / er1}%4.1fx")
    spark.stop()
  }
}
