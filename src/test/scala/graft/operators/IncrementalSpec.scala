package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def full(dir: String) = {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    Incremental.finalizeStats(Incremental.orderPartials(orders))
      .orderBy($"o_custkey")
  }

  test("partials + delta merge is bit-equal to the full recompute at any split") {
    val want = full(sf()).collect().toSeq
    Seq("1996-06-15", "1999-01-01", "2002-01-01", "1990-01-01").foreach { split =>
      val orders = spark.read.parquet(s"${sf()}/orders.parquet")
      val history = orders.filter($"o_orderdate" < lit(split).cast("timestamp"))
      val delta = orders.filter($"o_orderdate" >= lit(split).cast("timestamp"))
      val got = Incremental.finalizeStats(
        Incremental.mergeDelta(Incremental.orderPartials(history), delta))
        .orderBy($"o_custkey").collect().toSeq
      assert(got == want, s"divergence at split=$split")
    }
  }

  test("digest store: artifact probe is bit-equal to in-query dedup; bloom negatives bypass the join; store side never shuffles") {
    val want = Dedup.ddIncremental(spark, sf()).collect().toSeq
    graft.Caches.releaseAll()
    val got = Dedup.ddIncrementalStore(spark, sf()).collect().toSeq
    graft.Caches.releaseAll(); graft.TmpDirs.releaseAll()
    assert(got == want)
    // plan shape: with broadcast off, the bloom-positive tail's
    // anti-join must read the digest snapshot off its buckets with no
    // Exchange on the store side (only the candidate side aligns)
    val corpus = graft.Caches.persist(Dedup.pipelineCorpus(spark, sf()))
    val storeDir = graft.TmpDirs.create("graft_digeststore_spec_")
    Dedup.digestStoreBuild(corpus.filter($"doc_id" < 10000), storeDir)
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = Dedup.incrementalDedupFromStore(spark, storeDir,
        corpus.filter($"doc_id" >= 10000))
      val plan = probe.queryExecution.executedPlan.toString
      val n = "Exchange hashpartitioning\\(digest".r.findAllIn(plan).length
      // one digest Exchange for the candidate side of the anti-join and
      // one for the final min-by-digest aggregate — never a third for
      // the corpus-sized snapshot (it reads straight off its buckets)
      assert(plan.contains("Bucketed: true"), s"expected bucketed scan:\n$plan")
      assert(n <= 2, s"store side of the anti-join must not shuffle ($n):\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      graft.Caches.releaseAll(); graft.TmpDirs.releaseAll()
    }
  }

  test("merge reads ONLY the stored partial table on the history side") {
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    val split = lit("1999-01-01").cast("timestamp")
    val store = Files.createTempDirectory("partials").toString
    Incremental.orderPartials(orders.filter($"o_orderdate" < split))
      .write.mode("overwrite").parquet(store)

    val merged = Incremental.mergeDelta(
      spark.read.parquet(store), orders.filter($"o_orderdate" >= split))
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("partials"), s"history partial store must be scanned:\n$plan")
    assert("orders\\.parquet".r.findAllIn(plan).size == 1,
      s"raw orders must be scanned exactly once (the delta):\n$plan")

    val got = Incremental.finalizeStats(merged).orderBy($"o_custkey").collect().toSeq
    assert(got == full(sf()).collect().toSeq)
  }

  test("empty delta leaves the rollup unchanged") {
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    val none = orders.filter(lit(false))
    val got = Incremental.finalizeStats(
      Incremental.mergeDelta(Incremental.orderPartials(orders), none))
      .orderBy($"o_custkey").collect().toSeq
    assert(got == full(sf()).collect().toSeq)
  }

  test("signed retraction: ingest-then-retract is bit-equal to never-ingested") {
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    val slice = $"o_orderkey" % 17 === 3
    val inserted = Incremental.orderPartialsSigned(
      orders.withColumn("_sign", lit(1)))
    val retracted = Incremental.mergeSignedDelta(inserted,
      orders.filter(slice).withColumn("_sign", lit(-1)))
    val got = Incremental.finalizeStatsChecked(retracted)
      .orderBy($"o_custkey").collect().toSeq
    val want = Incremental.finalizeStats(
        Incremental.orderPartials(orders.filter(!slice)))
      .orderBy($"o_custkey").collect().toSeq
    assert(got == want)
  }

  test("a fully-retracted key vanishes from the store, not a zero row") {
    val rows = Seq((1L, 10L, 5.0), (2L, 10L, 7.0), (3L, 20L, 9.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val ins = Incremental.orderPartialsSigned(rows.withColumn("_sign", lit(1)))
    val after = Incremental.mergeSignedDelta(ins,
      rows.filter($"o_custkey" === 10L).withColumn("_sign", lit(-1)))
    assert(after.select($"o_custkey").as[Long].collect().toSeq == Seq(20L))
  }

  test("retraction without ingest is refused loudly, not served negative") {
    val rows = Seq((1L, 10L, 5.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val phantom = Seq((9L, 99L, 1.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val bad = Incremental.mergeSignedDelta(
      Incremental.orderPartialsSigned(rows.withColumn("_sign", lit(1))),
      phantom.withColumn("_sign", lit(-1)))
    intercept[IllegalArgumentException] {
      Incremental.finalizeStatsChecked(bad).collect()
    }
  }

  test("count-matched price-mismatched retraction is refused, not vanished") {
    // one ingested order, then a retraction with the SAME key and row
    // count but a DIFFERENT price: the signed count nets to 0 but the
    // signed sum does not — the key must SURVIVE the fold (dropping it
    // would silently forgive the mismatch) and the checked serve must
    // refuse it loudly
    val rows = Seq((1L, 10L, 5.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val wrongPrice = Seq((1L, 10L, 7.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val folded = Incremental.mergeSignedDelta(
      Incremental.orderPartialsSigned(rows.withColumn("_sign", lit(1))),
      wrongPrice.withColumn("_sign", lit(-1)))
    assert(folded.count() == 1, "mismatched key must not vanish from the store")
    val ex = intercept[IllegalArgumentException] {
      Incremental.finalizeStatsChecked(folded).collect()
    }
    assert(ex.getMessage.contains("zero signed counts"))
    graft.Caches.releaseAll()
  }
}
