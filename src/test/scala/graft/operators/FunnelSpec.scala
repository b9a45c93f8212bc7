package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sequence semantics of the funnel and cohort operators — the ordering
  * edge cases the oracle hash can't isolate on its own. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(rows: Seq[(Long, Long, Long, String)]): String = {
    // (event_id, user_id, second-offset, event_type) → a tiny sf-dir;
    // ts is written as raw epoch NANOS, the driver fixtures' layout
    // (Tables.eventsRawSchema reads it as Long and converts to micros)
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    rows.map { case (id, u, sec, t) =>
      (id, 1700000000000000000L + sec * 1000000000L, u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("funnel enforces strict view < click < purchase order per user") {
    val dir = writeEvents(Seq(
      // u1 converts fully, in order
      (1L, 1L, 0L, "view"), (2L, 1L, 10L, "click"), (3L, 1L, 20L, "purchase"),
      // u2: purchase BEFORE its click — stage stops at 2
      (4L, 2L, 0L, "view"), (5L, 2L, 10L, "purchase"), (6L, 2L, 20L, "click"),
      // u3: click BEFORE any view — click unqualified, stage 1
      (7L, 3L, 0L, "click"), (8L, 3L, 10L, "view"),
      // u4: no view at all — stage 0 even with click+purchase
      (9L, 4L, 0L, "click"), (10L, 4L, 10L, "purchase"),
      // u5: second click is the qualified one (first precedes the view)
      (11L, 5L, 0L, "click"), (12L, 5L, 5L, "view"), (13L, 5L, 9L, "click"),
      (14L, 5L, 12L, "purchase")))
    val got = Funnel.q31FunnelSteps(spark, dir)
      .select($"user_id", $"stage").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 0, 5L -> 3))
  }

  test("funnel picks the FIRST qualified click, not the first click") {
    val dir = writeEvents(Seq(
      (1L, 1L, 0L, "click"), (2L, 1L, 5L, "view"), (3L, 1L, 9L, "click")))
    val row = Funnel.q31FunnelSteps(spark, dir)
      .select($"first_view_us", $"first_click_us").as[(Long, Long)].head()
    assert(row._1 == 1700000005000000L && row._2 == 1700000009000000L)
  }

  test("same-timestamp ties break by event_id (view id 1 < click id 2 qualifies)") {
    val dir = writeEvents(Seq((1L, 1L, 0L, "view"), (2L, 1L, 0L, "click")))
    val stage = Funnel.q31FunnelSteps(spark, dir)
      .select($"stage").as[Int].head()
    assert(stage == 2, "a click tied on ts but after the view by id must qualify")
  }

  test("cohort retention: offsets are whole weeks from each user's OWN start") {
    val week = 7L * 24 * 3600
    val dir = writeEvents(Seq(
      // u1 starts week 0, active weeks 0, 1, 3 (two events in week 1)
      (1L, 1L, 0L, "view"), (2L, 1L, week + 10L, "click"),
      (3L, 1L, week + 20L, "view"), (4L, 1L, 3 * week, "view"),
      // u2 starts 2 weeks later (same ISO cohort only if truncation says so);
      // active its own weeks 0 and 1
      (5L, 2L, 2 * week, "view"), (6L, 2L, 3 * week, "view")))
    val got = Funnel.q32CohortRetention(spark, dir)
      .select($"cohort_week".cast("string"), $"week_offset", $"n_users")
      .as[(String, Long, Long)].collect().toSet
    // 1700000000 = 2023-11-14 (Tue); ISO weeks → u1 cohort 2023-11-13,
    // u2 cohort 2023-11-27
    assert(got == Set(
      ("2023-11-13", 0L, 1L), ("2023-11-13", 1L, 1L), ("2023-11-13", 3L, 1L),
      ("2023-11-27", 0L, 1L), ("2023-11-27", 1L, 1L)))
  }

  test("gated queries run on the fixture: stages partition users, matrix is dense-keyed") {
    val f = Funnel.q31FunnelSteps(spark, sf()).cache()
    try {
      val users = f.count()
      assert(users > 0)
      // dense fixtures convert everyone — just bound the stage domain
      assert(f.filter($"stage" < 0 || $"stage" > 3).count() == 0)
      // per-user mins are consistent: stage 3 rows carry all three timestamps
      assert(f.filter($"stage" === 3 && ($"first_view_us".isNull ||
        $"first_click_us".isNull || $"first_purchase_us".isNull)).count() == 0)
      assert(f.filter($"first_purchase_us" < $"first_click_us" ||
        $"first_click_us" < $"first_view_us").count() == 0,
        "qualified steps must be time-ordered")
    } finally f.unpersist()
    val m = Funnel.q32CohortRetention(spark, sf())
    assert(m.filter($"week_offset" < 0).count() == 0)
    assert(m.count() > 0)
  }

  test("funnel plans ONE window exchange — the two running mins share a sort") {
    val plan = Funnel.q31FunnelSteps(spark, sf())
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    // one for the user window (the groupBy reuses its partitioning)
    assert(exchanges <= 2, s"expected <=2 hash exchanges, got $exchanges:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "funnel must be join-free")
  }
}
