package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13 curation operators: CCNet perplexity buckets, embedding
  * decontamination, training-shard manifest. The DuckDB hash gates are
  * the correctness instrument; these specs pin the LAWS (bucket mass,
  * subset/threshold semantics, manifest conservation) that a hash match
  * alone would not explain. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("ccnet buckets: per-lang thirds up to tie mass, ties never split, all scored docs covered") {
    val docs = graft.sources.Tables.documents(spark, sf())
    val out = TextAnalysis.ccnetBuckets(docs)
      .select($"doc_id", $"lang", $"mean_millibits", $"bucket")
      .collect()
    val scored = TextAnalysis.bigramScores(docs).count()
    assert(out.length == scored, "every LM-scored doc gets exactly one bucket")
    // ties never split: one bucket per (lang, score)
    val perScore = out.groupBy(r => (r.getString(1), r.getLong(2)))
      .values.map(_.map(_.getString(3)).toSet)
    assert(perScore.forall(_.size == 1), "equal scores landed in different buckets")
    out.groupBy(_.getString(1)).foreach { case (lang, rows) =>
      val n = rows.length.toLong
      val byBucket = rows.groupBy(_.getString(3)).map { case (b, rs) => b -> rs.length.toLong }
      val head = byBucket.getOrElse("head", 0L)
      val mid = byBucket.getOrElse("middle", 0L)
      // threshold semantics: head reaches ceil(n/3) and overshoots only
      // by the tie mass at the cut score; same for head+middle at 2n/3
      val k1 = (n + 2) / 3; val k2 = (2 * n + 2) / 3
      assert(head >= k1, s"$lang: head $head < ceil(n/3)=$k1")
      assert(head + mid >= k2, s"$lang: head+middle ${head + mid} < $k2")
      val t1 = rows.filter(_.getString(3) == "head").map(_.getLong(2)).max
      val tieAtT1 = rows.count(_.getLong(2) == t1).toLong
      assert(head - tieAtT1 < k1, s"$lang: head overshoots beyond the t1 tie mass")
      // ordering: every head score <= every middle score <= every tail score
      def scores(b: String) = rows.filter(_.getString(3) == b).map(_.getLong(2))
      if (scores("middle").nonEmpty) {
        assert(scores("head").max <= scores("middle").min)
        if (scores("tail").nonEmpty)
          assert(scores("middle").max <= scores("tail").min)
      }
    }
  }

  test("embed decontaminate: survivors = corpus minus threshold hits; benchmark itself excluded") {
    val e = graft.sources.Tables.embeddings(spark, sf())
    val survivors = Similarity.ddEmbedDecontaminate(spark, sf())
      .select($"vec_id").as[Long].collect().toSet
    val bench = e.filter($"vec_id" >= 25 && $"vec_id" < 50)
      .select($"vec_id").as[Long].collect().toSet
    val corpus = e.select($"vec_id").as[Long].collect().toSet -- bench
    assert(survivors.subsetOf(corpus), "a benchmark vector leaked into the output")
    // quadratic ground truth on the small fixture
    val be = e.filter($"vec_id".isin(bench.toSeq: _*))
      .select($"vec_id".as("bid"), $"embedding".as("eb"))
    val hits = e.filter(!$"vec_id".isin(bench.toSeq: _*))
      .crossJoin(be)
      .withColumn("cos", graft.functions.Portable.cosine($"embedding", $"eb"))
      .filter($"cos" >= Similarity.NEARDUP_THRESHOLD)
      .select($"vec_id").as[Long].collect().toSet
    assert(survivors == corpus -- hits, "survivor set diverges from the exact rule")
    assert(hits.nonEmpty, "fixture should actually contain contamination")
  }

  test("shard manifest: token mass conserved, doc ranges contiguous, shards fill to the budget") {
    val docs = graft.sources.Tables.documents(spark, sf())
    val m = Pack.txShardManifest(spark, sf()).collect()
    val totalToks = docs.select(
      sum(regexp_count($"text", lit("[A-Za-z0-9]+")).cast("long"))).as[Long].head()
    assert(m.map(_.getLong(2)).sum == totalToks, "token mass not conserved")
    assert(m.map(_.getLong(1)).sum == docs.count(), "doc count not conserved")
    // shard ids dense from 0; id ranges non-overlapping and ordered
    assert(m.map(_.getLong(0)).toSeq == m.indices.map(_.toLong))
    m.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(4) < b.getLong(3),
        s"shard ${a.getLong(0)} id range overlaps shard ${b.getLong(0)}")
      case _ =>
    }
    // every shard but the last reaches the budget (whole docs overflow,
    // never underflow: a shard closes only when cum crosses the budget)
    m.dropRight(1).foreach { r =>
      assert(r.getLong(2) >= 1L,
        s"empty shard ${r.getLong(0)}") }
    // cum-based law: sum of tokens of shards 0..k-1 >= k * budget
    val cums = m.map(_.getLong(2)).scanLeft(0L)(_ + _).drop(1)
    cums.dropRight(1).zipWithIndex.foreach { case (c, i) =>
      assert(c >= (i + 1L) * Pack.ShardTokens,
        s"shards 0..$i hold $c tokens < ${(i + 1) * Pack.ShardTokens}")
    }
    // digest sanity: dropping a doc flips its shard's digest
    val full = Pack.shardManifest(docs, "text", "doc_id", Pack.ShardTokens)
      .select($"shard_id", $"digest").as[(Long, Long)].collect().toMap
    val dropped = Pack.shardManifest(docs.filter($"doc_id" =!= 0L),
      "text", "doc_id", Pack.ShardTokens)
      .select($"shard_id", $"digest").as[(Long, Long)].collect().toMap
    assert(full(0L) != dropped(0L), "digest blind to a dropped doc")
  }

  test("global shuffle: positions are a permutation, order follows (h, doc_id), no corpus-wide window") {
    val docs = graft.sources.Tables.documents(spark, sf())
    val out = Pack.globalShuffle(docs, "text", "doc_id")
    val rows = out.select($"doc_id", $"h", $"position")
      .as[(Long, Long, Long)].collect()
    val n = docs.count()
    assert(rows.map(_._3).sorted.toSeq == (0L until n), "not a permutation")
    // order law: position ascending == (h, doc_id) ascending
    val byPos = rows.sortBy(_._3).map(r => (r._2, r._1)).toSeq
    assert(byPos == byPos.sorted, "positions do not follow (h, doc_id) order")
    // deterministic: a second evaluation lands identically
    val again = Pack.globalShuffle(docs, "text", "doc_id")
      .select($"doc_id", $"position").as[(Long, Long)].collect().toMap
    assert(rows.map(r => r._1 -> r._3).toMap == again, "shuffle not deterministic")
    // scale law: the per-row rank window is bucket-partitioned; only the
    // tiny per-bucket offsets frame may be a global window
    val plan = out.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val global = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(global.size <= 1, s"corpus-wide window in the shuffle plan: ${global.size}")
  }

  test("curate-release capstone: manifest covers exactly the curated corpus") {
    val m = Dedup.ddCurateRelease(spark, sf()).collect()
    graft.Caches.releaseAll()
    val curated = Dedup.ddCurate(spark, sf()).count()
    graft.Caches.releaseAll()
    assert(m.map(_.getLong(1)).sum == curated,
      "manifest doc mass != curated survivor count")
    // positions tile [0, curated) — the shuffle ran over the curated
    // relation, not the raw corpus
    assert(m.head.getLong(3) == 0L && m.last.getLong(4) == curated - 1)
  }

  test("LM top-K cap: exact K under tie cuts, deterministic, transparent above the vocabulary") {
    val big = Seq(
      ("a a", 5L), ("a b", 3L), ("b a", 3L),
      ("c a", 1L), ("c b", 1L), ("c c", 1L), ("c d", 1L))
      .toDF("g", "cnt2")
    // cap above the vocabulary: byte-identical relation (the transparent
    // case the hash gate proves end to end)
    val uncapped = TextAnalysis.capTopK(big, 100L)
      .as[(String, Long)].collect().toSet
    assert(uncapped == big.as[(String, Long)].collect().toSet)
    // cap cutting INSIDE the cnt=1 tie class: exactly K rows, everything
    // strictly above the floor kept, and the tie break is deterministic
    val k5a = TextAnalysis.capTopK(big, 5L).as[(String, Long)].collect().toSet
    val k5b = TextAnalysis.capTopK(big, 5L).as[(String, Long)].collect().toSet
    assert(k5a == k5b, "tie break is not deterministic")
    assert(k5a.size == 5)
    assert(Set(("a a", 5L), ("a b", 3L), ("b a", 3L)).subsetOf(k5a),
      "a bigram above the floor count was dropped")
    assert(k5a.count(_._2 == 1L) == 2, "tie class not cut to the remaining budget")
    // cap exactly at a class boundary: whole classes, no tie cut needed
    val k3 = TextAnalysis.capTopK(big, 3L).as[(String, Long)].collect().toSet
    assert(k3 == Set(("a a", 5L), ("a b", 3L), ("b a", 3L)))
  }

  test("capped CCNet trainer: LM bounded at K, ctx self-consistent with the kept transitions") {
    val lmDir = java.nio.file.Files.createTempDirectory("graft_ccnet_cap_").toString
    TextAnalysis.trainPersistCcnet(spark, sf(), lmDir, topK = 10L)
    val big = spark.read.parquet(s"$lmDir/big").as[(String, Long)].collect()
    assert(big.length == 10, s"cap not applied: ${big.length} bigram types")
    val ctx = spark.read.parquet(s"$lmDir/ctx").as[(String, Long)].collect().toMap
    // self-consistency: each context count is the sum of its KEPT
    // bigrams' counts (Σ p(w2|w1) = 1 over kept transitions, bits >= 0)
    big.groupBy(_._1.split(" ").head).foreach { case (w1, rows) =>
      assert(ctx(w1) == rows.map(_._2).sum,
        s"ctx($w1) != sum of kept bigram counts")
    }
    assert(ctx.keySet == big.map(_._1.split(" ").head).toSet,
      "ctx carries contexts with no kept transitions")
    // serving against the capped artifact: runs, skips unknown
    // transitions, and never scores negative bits
    val served = TextAnalysis.ccnetServeFrom(spark, lmDir,
      graft.sources.Tables.documents(spark, sf())
        .select($"doc_id", $"lang", $"text"))
      .collect()
    assert(served.nonEmpty, "nothing scored against the capped LM")
    assert(served.forall(_.getLong(2) >= 0L), "negative surprisal under the cap")
  }

  test("paragraph CCNet: windows tile each doc, mean-of-means law, thresholds shared") {
    val docs = graft.sources.Tables.documents(spark, sf())
    val paras = TextAnalysis.paragraphsByWindow(docs, TextAnalysis.ParaWords)
    // windows tile: per doc, para count = ceil(words / width) and text
    // mass is conserved through the split
    val words = docs.filter($"text".isNotNull).select($"doc_id",
      size(graft.functions.Portable.words($"text")).as("n")).as[(Long, Int)]
      .collect().toMap
    val perDoc = paras.groupBy($"doc_id")
      .agg(count(lit(1)).as("np"), sum(size(graft.functions.Portable.words($"ptext"))).as("nw"))
      .as[(Long, Long, Long)].collect()
    perDoc.foreach { case (id, np, nw) =>
      val n = words(id)
      assert(np == (n + TextAnalysis.ParaWords - 1) / TextAnalysis.ParaWords,
        s"doc $id: wrong window count")
      assert(nw == n, s"doc $id: words lost in the split")
    }
    val out = TextAnalysis.txCcnetParagraphs(spark, sf()).collect()
    graft.Caches.releaseAll()
    // bucket semantics identical to the doc-level form: ties never split
    val perScore = out.groupBy(r => (r.getString(1), r.getLong(3)))
      .values.map(_.map(_.getString(4)).toSet)
    assert(perScore.forall(_.size == 1), "equal scores landed in different buckets")
    // a doc at most one window wide scores exactly its single paragraph
    assert(out.filter(_.getLong(2) == 1L).nonEmpty ||
      words.values.forall(_ > TextAnalysis.ParaWords))
  }

  test("paragraph dedup: first occurrence survives, reassembly preserves order, mass accounted") {
    val docs = graft.sources.Tables.documents(spark, sf())
    val paras = TextAnalysis.paragraphsByWindow(docs, TextAnalysis.ParaWords)
    val out = TextAnalysis.paragraphDedup(paras).collect()
    val all = paras.select($"doc_id", $"para_idx", $"ptext")
      .as[(Long, Long, String)].collect()
    // ground truth keep-first on the tiny fixture
    val keepTruth = all.groupBy(_._3).values
      .map(_.minBy(r => (r._1, r._2))).toSeq
    val keptByDoc = keepTruth.groupBy(_._1)
    out.foreach { r =>
      val (id, nParas, nKept, clean) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      val truth = keptByDoc.getOrElse(id, Seq.empty).sortBy(_._2)
      assert(nKept == truth.size, s"doc $id kept $nKept, truth ${truth.size}")
      assert(clean == truth.map(_._3).mkString(" "),
        s"doc $id reassembled out of order or with wrong paragraphs")
      assert(nParas == all.count(_._1 == id))
    }
    // docs with zero survivors are absent, and only those
    assert(out.map(_.getLong(0)).toSet == keptByDoc.keySet)
    // the fixture genuinely exercises dedup: some paragraph was dropped
    assert(out.map(r => r.getLong(1) - r.getLong(2)).sum > 0 ||
      all.map(_._3).distinct.length == all.length)
    // an UNDUPLICATED corpus round-trips every doc to its exact text
    val clean = out.filter(r => r.getLong(1) == r.getLong(2))
    val texts = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().toMap
    clean.foreach(r => assert(r.getString(3) == texts(r.getLong(0)),
      s"doc ${r.getLong(0)}: untouched doc did not round-trip byte-exact"))
  }

  test("ccnet select: head kept whole, middle hash-sampled, tail absent, decision stable") {
    val docs = graft.sources.Tables.documents(spark, sf())
    val buckets = TextAnalysis.ccnetBuckets(docs).collect()
    graft.Caches.releaseAll()
    val sel = TextAnalysis.txCcnetSelect(spark, sf()).collect()
    graft.Caches.releaseAll()
    val selIds = sel.map(_.getLong(0)).toSet
    val byBucket = buckets.groupBy(_.getString(3))
    byBucket.getOrElse("head", Array.empty).foreach(r =>
      assert(selIds(r.getLong(0)), s"head doc ${r.getLong(0)} dropped"))
    byBucket.getOrElse("tail", Array.empty).foreach(r =>
      assert(!selIds(r.getLong(0)), s"tail doc ${r.getLong(0)} kept"))
    val mid = byBucket.getOrElse("middle", Array.empty).map(_.getLong(0)).toSet
    val midKept = selIds.intersect(mid)
    assert(midKept.nonEmpty && midKept.size < mid.size,
      "middle sampling did not genuinely split the bucket")
    // determinism: a second run selects the identical set
    val sel2 = TextAnalysis.txCcnetSelect(spark, sf()).collect()
    graft.Caches.releaseAll()
    assert(sel2.map(_.getLong(0)).toSet == selIds)
  }

  test("release roundtrip: the partitioned export re-reads to the manifest exactly") {
    val m = Pack.txShardManifest(spark, sf()).collect().toSeq
    val rt = Pack.txShardReleaseRoundtrip(spark, sf()).collect().toSeq
    assert(rt.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5))) ==
      m.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))),
      "files round-tripped to a different manifest than the relation")
  }

  test("release append: boundary shard merges, batch-only scan lands on the full recompute, out-of-order refused") {
    val docs = graft.sources.Tables.documents(spark, sf())
    val full = Pack.txShardManifest(spark, sf()).collect().toSeq
    val inc = Pack.txReleaseAppend(spark, sf()).collect().toSeq
    def rows(m: Seq[org.apache.spark.sql.Row]) =
      m.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows(inc) == rows(full),
      "incremental append diverged from the full recompute")
    // the boundary shard genuinely merged: the base's last shard id
    // appears in BOTH halves' contributions (otherwise the split was a
    // clean boundary and the test proves less than it claims)
    val base = Pack.shardManifest(docs.filter($"doc_id" < Pack.AppendSplitId),
      "text", "doc_id", Pack.ShardTokens).collect()
    val boundary = base.map(_.getLong(0)).max
    val baseDocsInBoundary = base.find(_.getLong(0) == boundary).get.getLong(1)
    val fullDocsInBoundary = full.find(_.getLong(0) == boundary).get.getLong(1)
    assert(fullDocsInBoundary > baseDocsInBoundary,
      "split landed on a shard boundary — move AppendSplitId to exercise the merge")
    // an empty base continues from zero: append(empty, all) == full
    val emptyBase = Pack.shardManifest(docs.filter($"doc_id" < 0),
      "text", "doc_id", Pack.ShardTokens)
    val fromEmpty = Pack.shardManifestAppend(emptyBase, docs,
      "text", "doc_id", Pack.ShardTokens).collect().toSeq
    assert(rows(fromEmpty) == rows(full))
    // out-of-order append refuses loudly instead of interleaving
    val boom = intercept[IllegalArgumentException] {
      Pack.shardManifestAppend(
        Pack.shardManifest(docs.filter($"doc_id" >= Pack.AppendSplitId),
          "text", "doc_id", Pack.ShardTokens),
        docs.filter($"doc_id" < Pack.AppendSplitId),
        "text", "doc_id", Pack.ShardTokens)
    }
    assert(boom.getMessage.contains("continue the order key"))
  }

  test("shuffled shards: contiguous position ranges, conserved mass, doc ids interleave") {
    val m = Pack.txShuffledShards(spark, sf()).collect()
    val docs = graft.sources.Tables.documents(spark, sf())
    assert(m.map(_.getLong(1)).sum == docs.count())
    // position ranges tile [0, n) without overlap
    m.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(4) + 1 == b.getLong(3),
        s"position ranges not contiguous at shard ${b.getLong(0)}")
      case _ =>
    }
    assert(m.head.getLong(3) == 0L)
  }
}
