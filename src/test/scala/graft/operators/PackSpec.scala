package graft.operators

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq( // (key with gaps, weight incl. zeros)
    (3L, 10L), (7L, 0L), (8L, 500L), (100L, 5L), (101L, 512L),
    (250L, 1L), (999L, 1024L), (1000L, 0L), (5000L, 7L))

  test("two-phase exclusive cumsum matches the global-window law for any bucket count") {
    val df = rows.toDF("k", "w")
    val naive = df.withColumn("cum_excl",
        coalesce(sum($"w").over(Window.orderBy($"k")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"k", $"cum_excl").as[(Long, Long)].collect().toMap
    Seq(1, 5, 32, 100).foreach { b =>
      val got = Pack.exclusiveCumsum(df, "k", "w", buckets = b)
        .select($"k", $"cum_excl").as[(Long, Long)].collect().toMap
      assert(got == naive, s"divergence at buckets=$b")
    }
  }

  test("packing positions: offsets bounded, straddle count exact, zero-weight rows") {
    val got = Pack.packByOrder(rows.toDF("k", "w"), "k", "w", budget = 512L)
      .select($"k", $"cum_excl", $"seq_id", $"seq_offset", $"n_splits")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // hand-computed layout at budget 512:
    // k=3   cum 0    seq 0 off 0   w=10   no straddle
    // k=7   cum 10   seq 0 off 10  w=0    zero-weight -> 0 splits
    // k=8   cum 10   seq 0 off 10  w=500  ends at 509 -> fits
    // k=100 cum 510  seq 0 off 510 w=5    ends at 514 -> 1 boundary
    // k=101 cum 515  seq 1 off 3   w=512  ends at 1026 -> 1 boundary
    // k=250 cum 1027 seq 2 off 3   w=1    fits
    // k=999 cum 1028 seq 2 off 4   w=1024 ends at 2051 -> 2 boundaries
    // k=1000 cum 2052 seq 4 off 4  w=0    0 splits
    // k=5000 cum 2052 seq 4 off 4  w=7    fits
    val expect = Map(
      3L -> (0L, 0L, 0L, 0L), 7L -> (10L, 0L, 10L, 0L), 8L -> (10L, 0L, 10L, 0L),
      100L -> (510L, 0L, 510L, 1L), 101L -> (515L, 1L, 3L, 1L),
      250L -> (1027L, 2L, 3L, 0L), 999L -> (1028L, 2L, 4L, 2L),
      1000L -> (2052L, 4L, 4L, 0L), 5000L -> (2052L, 4L, 4L, 0L))
    expect.foreach { case (k, (cum, seq, off, spl)) =>
      val (_, gc, gs, go, gn) = got(k)
      assert((gc, gs, go, gn) == (cum, seq, off, spl), s"row k=$k")
    }
    assert(got.values.forall(_._4 < 512L), "seq_offset must stay under the budget")
  }

  test("empty input yields an empty packing, not a crash") {
    val empty = Seq.empty[(Long, Long)].toDF("k", "w")
    assert(Pack.packByOrder(empty, "k", "w", 512L).count() == 0L)
    assert(Pack.exclusiveCumsumSkewed(empty, "k", "w").count() == 0L)
    assert(Pack.exclusiveCumsumSkewed(empty, "k", "w", buckets = 1).count() == 0L)
  }

  test("int-typed order column widens instead of ClassCastException") {
    val df = Seq((3, 10L), (8, 500L), (100, 5L)).toDF("k", "w")
    val got = Pack.exclusiveCumsum(df, "k", "w")
      .select($"k", $"cum_excl").as[(Int, Long)].collect().toMap
    assert(got == Map(3 -> 0L, 8 -> 10L, 100 -> 510L))
  }

  test("property: both bucketings obey the cumsum law on skewed random corpora") {
    // plain ScalaCheck under fixed seeds (PropertySpec convention — no
    // scalatest-plus bridge offline). Keys deliberately SKEWED: 90% of
    // rows cluster in a 100-wide band, the rest spread over ±10^9 incl.
    // negatives — the distribution that collapses uniform width_bucket
    // into one hot bucket and exists to exercise the quantile variant.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genRow = for {
      clustered <- Gen.prob(0.9)
      k <- if (clustered) Gen.choose(5_000_000L, 5_000_100L)
           else Gen.choose(-1_000_000_000L, 1_000_000_000L)
      w <- Gen.frequency(5 -> Gen.choose(0L, 100L), 1 -> Gen.const(0L))
    } yield (k, w)
    Seq(11L, 42L, 777L).foreach { seed =>
      val rows = Gen.listOfN(300, genRow)
        .pureApply(Gen.Parameters.default, Seed(seed))
        .distinctBy(_._1) // unique-key precondition
      val df = rows.toDF("k", "w")
      val naive = df.withColumn("cum_excl",
          coalesce(sum($"w").over(Window.orderBy($"k")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select($"k", $"cum_excl").as[(Long, Long)].collect().toMap
      val uniform = Pack.exclusiveCumsum(df, "k", "w")
        .select($"k", $"cum_excl").as[(Long, Long)].collect().toMap
      val skewed = Pack.exclusiveCumsumSkewed(df, "k", "w")
        .select($"k", $"cum_excl").as[(Long, Long)].collect().toMap
      assert(uniform == naive, s"uniform bucketing diverges at seed=$seed")
      assert(skewed == naive, s"quantile bucketing diverges at seed=$seed")
      // buckets=1 regression: zero quantile probes is a single-bucket
      // cumsum, NOT an empty input (the empty-qs guard once zeroed it)
      val oneBucket = Pack.exclusiveCumsumSkewed(df, "k", "w", buckets = 1)
        .select($"k", $"cum_excl").as[(Long, Long)].collect().toMap
      assert(oneBucket == naive, s"skewed buckets=1 diverges at seed=$seed")
      // conservation: last row's cum_excl + weight == total mass
      val total = rows.map(_._2).sum
      val last = rows.maxBy(_._1)
      assert(naive(last._1) + last._2 == total, s"mass not conserved at seed=$seed")
    }
  }

  test("the corpus-side window is partitioned; only the tiny offsets window is global") {
    // the whole point of the two-phase cumsum: the full-data window must
    // carry a partitionSpec (per-bucket tasks), leaving at most the
    // bucket-offsets frame (CumsumBuckets rows) as a global window
    val plan = Pack.txPackSequences(spark, sf()).queryExecution.executedPlan match {
      // AQE root has no children; unwrap to the physical plan underneath
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val globalWindows = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
    assert(globalWindows.size <= 1,
      s"expected at most the tiny offsets window to be global, got ${globalWindows.size}")
    val partitioned = plan.collect { case w: WindowExec if w.partitionSpec.nonEmpty => w }
    assert(partitioned.nonEmpty, "the corpus cumsum window must be bucket-partitioned")
  }

  test("PPS systematic sample: tick law, certainty stratum, pick-count mass") {
    val df = rows.toDF("k", "w") // total weight 2059
    val k = 4L
    val step = 2059L / k // 514
    val got = TextAnalysis.ppsSystematic(df, "k", "w", k)
      .select($"k", $"w", $"n_picks").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // every doc with w >= step is ALWAYS kept (certainty stratum)
    rows.filter(_._2 >= step).foreach { case (key, _) =>
      assert(got.contains(key), s"certainty-stratum doc k=$key missing") }
    // zero-weight docs can never be picked
    rows.filter(_._2 == 0L).foreach { case (key, _) =>
      assert(!got.contains(key), s"zero-weight doc k=$key sampled") }
    // total picks == number of ticks on the closed weight line
    assert(got.values.map(_._2).sum == 2059L / step, "tick mass off")
    // n_picks >= 2 only when w > step
    got.foreach { case (key, (w, n)) =>
      assert(n == 1 || w > step, s"doc k=$key picked $n times with w=$w") }
  }

  test("PPS sample is invariant to the cumsum bucketing") {
    val df = rows.toDF("k", "w")
    val base = TextAnalysis.ppsSystematic(df, "k", "w", 4L, buckets = 1)
      .select($"k", $"n_picks").as[(Long, Long)].collect().toMap
    Seq(5, 32).foreach { b =>
      val got = TextAnalysis.ppsSystematic(df, "k", "w", 4L, buckets = b)
        .select($"k", $"n_picks").as[(Long, Long)].collect().toMap
      assert(got == base, s"divergence at buckets=$b")
    }
  }

  test("PPS sample on an empty corpus is empty, not a crash") {
    val empty = Seq.empty[(Long, Long)].toDF("k", "w")
    assert(TextAnalysis.ppsSystematic(empty, "k", "w", 4L).count() == 0L)
  }
}
