package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Persisted-LSH-index invariants: the bucketed self-join must be
  * Exchange-free (the whole point of paying the bucketed write), probes
  * must not shuffle the index side, and results must be bit-identical to
  * the in-query banding operator. */
class AnnIndexSpec extends SparkSpec {

  private def withIndex[A](f: org.apache.spark.sql.DataFrame => A): A = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ann_idx").toFile
    try {
      val e = Tables.embeddings(spark, sf())
      f(AnnIndex.buildNearDupIndex(spark, e, "ann_idx_test",
        tmp.getAbsolutePath, buckets = 8))
    } finally {
      spark.sql("DROP TABLE IF EXISTS ann_idx_test")
      org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    }
  }

  test("index self-join plans with no Exchange on either side") {
    withIndex { idx =>
      val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        // disable broadcast so the planner must consider distribution —
        // at real index sizes neither side broadcasts
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val plan = AnnIndex.bandSelfJoin(idx).queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
        assert(!plan.contains("Exchange"),
          s"bucketed index self-join must not shuffle either side:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
    }
  }

  test("probe broadcasts the query bands and never shuffles the index side") {
    withIndex { idx =>
      val q = Tables.embeddings(spark, sf())
        .filter(col("vec_id") < Similarity.QuerySetSize)
      val cand = AnnIndex.probeBands(idx, AnnIndex.queryBands(q))
      // distinct adds its own candidate-sized shuffle downstream (on the
      // pair columns — fine); a shuffle of the INDEX would show up as an
      // exchange hash-partitioned on band_key
      val plan = cand.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"probe must plan a broadcast hash join:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(band_key"),
        s"index side of the probe must not shuffle:\n$plan")
    }
  }

  test("k-NN graph through the index is bit-identical; self-join stays Exchange-free") {
    withIndex { idx =>
      val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val plan = AnnIndex.knnCandidates(idx).queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
        assert(!plan.contains("Exchange hashpartitioning(band_key"),
          s"symmetric index self-join must not shuffle either side:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      val fromIndex = Similarity.knnFromCandidates(
          Tables.embeddings(spark, sf()).select(col("vec_id"), col("embedding")),
          AnnIndex.knnCandidates(idx), Similarity.KNN_GRAPH_K)
        .collect().toSeq
      graft.Caches.releaseAll()
      val inQuery = Similarity.simKnnGraph(spark, sf()).collect().toSeq
      graft.Caches.releaseAll()
      assert(fromIndex.nonEmpty)
      assert(fromIndex == inQuery,
        "index-path k-NN graph must equal the in-query band join bit-for-bit")
    }
  }

  test("pairs through the index are bit-identical to the in-query operator") {
    withIndex { idx =>
      val fromIndex = AnnIndex.nearDupPairsFromIndex(spark, idx, sf())
        .collect().toSeq
      val inQuery = Similarity.cosineNearDupPairs(spark, sf(),
          Similarity.NEARDUP_TABLES, Similarity.NEARDUP_PLANES)
        .collect().toSeq
      graft.Caches.releaseAll()
      assert(fromIndex == inQuery,
        s"index path diverges: ${fromIndex.size} vs ${inQuery.size} pairs")
    }
  }

  test("probe candidates equal the in-query band join's query slice") {
    withIndex { idx =>
      val e = Tables.embeddings(spark, sf())
      val q = e.filter(col("vec_id") < Similarity.QuerySetSize)
      val probed = AnnIndex.probeBands(idx, AnnIndex.queryBands(q))
        .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
        .collect().toSet
      // reference: same-bucket collisions computed straight off the
      // banding (query side restricted, either join side may hold the query)
      val bd = Similarity.banded(e, Similarity.NEARDUP_TABLES,
        Similarity.NEARDUP_PLANES)
      val a = bd.as("a"); val b = bd.as("b")
      val ref = a.join(b,
          col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") =!= col("b.vec_id"))
        .filter(col("a.vec_id") < Similarity.QuerySetSize)
        .select(col("a.vec_id"), col("b.vec_id"))
        .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
        .collect().toSet
      assert(probed == ref, s"probe candidates diverge: ${probed.size} vs ${ref.size}")
    }
  }

  test("incremental append: build(half)+append(rest) ≡ full build, still Exchange-free") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ann_append").toFile
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      val e = Tables.embeddings(spark, sf())
      val half = e.filter(col("vec_id") % 2 === 0)
      val rest = e.filter(col("vec_id") % 2 =!= 0)
      AnnIndex.buildNearDupIndex(spark, half, "ann_idx_inc",
        tmp.getAbsolutePath, buckets = 8)
      val idx = AnnIndex.appendVectors(spark, rest, "ann_idx_inc", buckets = 8)
      // candidate pairs identical to a from-scratch full build
      val tmp2 = java.nio.file.Files.createTempDirectory("graft_ann_full").toFile
      try {
        val full = AnnIndex.buildNearDupIndex(spark, e, "ann_idx_full",
          tmp2.getAbsolutePath, buckets = 8)
        val gotPairs = AnnIndex.nearDupCandidates(idx)
          .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
          .collect().toSet
        val fullPairs = AnnIndex.nearDupCandidates(full)
          .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
          .collect().toSet
        assert(gotPairs == fullPairs, "append-built index diverges from full build")
      } finally {
        spark.sql("DROP TABLE IF EXISTS ann_idx_full")
        org.apache.commons.io.FileUtils.deleteQuietly(tmp2)
      }
      // the bucketed-join property survives the append
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = AnnIndex.bandSelfJoin(idx).queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") && !plan.contains("Exchange"),
        s"appended index must still self-join without an Exchange:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS ann_idx_inc")
      org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    }
  }

  test("auto index: meta round-trips, append reads the persisted constants") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ann_auto").toFile
    try {
      val e = Tables.embeddings(spark, sf())
      val half = e.filter(col("vec_id") % 2 === 0)
      val rest = e.filter(col("vec_id") % 2 =!= 0)
      val (_, built) = AnnIndex.buildNearDupIndexAuto(spark, half,
        "ann_idx_auto", tmp.getAbsolutePath, buckets = 8)
      // the marker is the cross-session source of truth
      val (_, meta) =
        AnnIndex.openAutoIndex(spark, "ann_idx_auto", tmp.getAbsolutePath)
      assert(meta == built)
      assert(meta.planes == Similarity.autoPlanes(half.count()))
      // append under the PERSISTED constants (no caller-supplied config)
      val idx =
        AnnIndex.appendVectorsAuto(spark, rest, "ann_idx_auto", tmp.getAbsolutePath)
      // ≡ a from-scratch build of the full corpus at the index's own
      // constants — the banding geometry did not drift across the append
      val tmp2 = java.nio.file.Files.createTempDirectory("graft_ann_auto_f").toFile
      try {
        val full = AnnIndex.buildNearDupIndex(spark, e, "ann_idx_auto_full",
          tmp2.getAbsolutePath, meta.tables, meta.planes, meta.buckets)
        val got = AnnIndex.nearDupCandidates(idx)
          .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
          .collect().toSet
        val want = AnnIndex.nearDupCandidates(full)
          .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
          .collect().toSet
        assert(got == want, "auto append diverges from full build")
      } finally {
        spark.sql("DROP TABLE IF EXISTS ann_idx_auto_full")
        org.apache.commons.io.FileUtils.deleteQuietly(tmp2)
      }
      // probing with queryBandsFor(meta) collides exactly as the build
      val q = e.filter(col("vec_id") < Similarity.QuerySetSize)
      assert(AnnIndex.probeBands(idx, AnnIndex.queryBandsFor(meta, q)).count() > 0)
      // a dir with no marker refuses instead of guessing constants
      intercept[IllegalArgumentException] {
        AnnIndex.readIndexMeta(spark, tmp.getAbsolutePath + "/nope")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS ann_idx_auto")
      org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    }
  }

  test("cross-session open: a fresh catalog re-registers the index from marker + files") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ann_xs").toFile
    try {
      val e = Tables.embeddings(spark, sf())
      val (builtIdx, built) = AnnIndex.buildNearDupIndexAuto(spark, e,
        "ann_idx_xs", tmp.getAbsolutePath, buckets = 8)
      val want = builtIdx
        .as[(Long, Int)](org.apache.spark.sql.Encoders.product[(Long, Int)])
        .collect().toSet
      // simulate a fresh session's empty metastore: drop the catalog
      // entry (external table — files stay), then open in a new session
      spark.sql("DROP TABLE ann_idx_xs")
      val s2 = spark.newSession()
      val (idx, meta) = AnnIndex.openAutoIndex(s2, "ann_idx_xs", tmp.getAbsolutePath)
      assert(meta == built, "marker must round-trip through the fresh session")
      assert(idx.as[(Long, Int)](
        org.apache.spark.sql.Encoders.product[(Long, Int)])
        .collect().toSet == want, "re-registered table must serve the same rows")
      // the load-bearing half: the re-registered table keeps the BUCKET
      // layout, so the self-join still plans Exchange-free
      val bcast = s2.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val plan = AnnIndex.bandSelfJoin(idx).queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin") && !plan.contains("Exchange"),
          s"cross-session open lost the bucket spec:\n$plan")
      } finally s2.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      // appends through the persisted constants also work cross-session
      // (the table is back in the catalog after the open)
      assert(AnnIndex.shouldRebuild(meta,
        Similarity.NEARDUP_TARGET_OCCUPANCY << (meta.planes + 1)),
        "sanity: shouldRebuild still consults the recovered meta")
      // an open when the catalog ALREADY has the table is a no-op read
      val (again, meta2) = AnnIndex.openAutoIndex(s2, "ann_idx_xs", tmp.getAbsolutePath)
      assert(meta2 == meta && again.count() == want.size)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ann_idx_xs")
      org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    }
  }

  test("rebuild cadence: appends drift occupancy; rebuilt index ≡ fresh-built") {
    // a synthetic corpus big enough that half vs full derive DIFFERENT
    // plane counts (gate tables never do at test scale): 2000 rows → 8
    // planes, 5000 → 9, so the append makes the stamp stale by one and
    // shouldRebuild must fire
    import spark.implicits._
    val dim = Similarity.Dim
    val vecs = spark.range(5000).select($"id".as("vec_id"),
      expr(s"transform(sequence(0, ${dim - 1}), j -> " +
        "cast(sin(vec_id * 31 + j * 17) as float))").as("embedding"))
      .localCheckpoint(true)
    val half = vecs.filter($"vec_id" < 2000)
    val rest = vecs.filter($"vec_id" >= 2000)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ann_rb").toFile
    try {
      val (_, meta0) = AnnIndex.buildNearDupIndexAuto(spark, half,
        "ann_idx_rb", tmp.getAbsolutePath, buckets = 8)
      assert(meta0.planes == Similarity.autoPlanes(2000))
      assert(!AnnIndex.shouldRebuild(meta0, 2000),
        "fresh build must not immediately demand a rebuild")
      AnnIndex.appendVectorsAuto(spark, rest, "ann_idx_rb", tmp.getAbsolutePath)
      assert(AnnIndex.shouldRebuild(meta0, 5000),
        "a full plane's worth of growth must trigger the rebuild")
      // rebuild at the fresh derivation; ≡ a from-scratch build of the
      // full corpus (same table name — the production in-place refresh)
      val (rebuilt, meta1) = AnnIndex.buildNearDupIndexAuto(spark, vecs,
        "ann_idx_rb", tmp.getAbsolutePath, buckets = 8)
      assert(meta1.planes == Similarity.autoPlanes(5000) && meta1 != meta0)
      val tmp2 = java.nio.file.Files.createTempDirectory("graft_ann_rb_f").toFile
      try {
        val fresh = AnnIndex.buildNearDupIndex(spark, vecs, "ann_idx_rb_fresh",
          tmp2.getAbsolutePath, meta1.tables, meta1.planes, meta1.buckets)
        assert(rebuilt.as[(Long, Long)].collect().toSet ==
          fresh.as[(Long, Long)].collect().toSet,
          "rebuilt index must equal a fresh build at the new geometry")
      } finally {
        spark.sql("DROP TABLE IF EXISTS ann_idx_rb_fresh")
        org.apache.commons.io.FileUtils.deleteQuietly(tmp2)
      }
      // the marker now serves the NEW geometry to later sessions
      assert(AnnIndex.readIndexMeta(spark,
        tmp.getAbsolutePath + "/ann_idx_rb") == meta1)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ann_idx_rb")
      org.apache.commons.io.FileUtils.deleteQuietly(tmp)
      graft.Caches.freeCheckpoint(vecs)
    }
  }
}
