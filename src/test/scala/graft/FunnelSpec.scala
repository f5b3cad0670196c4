package graft

import graft.ops.Funnel

/** Hand-built event sequences with known funnel outcomes. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  // (event_id, ts_us, user_id, event_type)
  private val events = Seq(
    // user 1: clean view → click → purchase
    (1L, 100L, 1L, "view"), (2L, 200L, 1L, "click"), (3L, 300L, 1L, "purchase"),
    // user 2: click BEFORE the first view must not count; no purchase
    (4L, 100L, 2L, "click"), (5L, 200L, 2L, "view"), (6L, 300L, 2L, "click"),
    // user 3: same-timestamp click is NOT strictly after the view
    (7L, 100L, 3L, "view"), (8L, 100L, 3L, "click"),
    // user 4: never enters the funnel
    (9L, 100L, 4L, "error"),
    // user 5: second view is irrelevant once stage 1 is set
    (10L, 100L, 5L, "view"), (11L, 150L, 5L, "view"), (12L, 160L, 5L, "click")
  ).toDF("event_id", "ts_us", "user_id", "event_type")

  test("funnel walks stages strictly in order and strictly forward in time") {
    val r = Funnel.funnel(events, Seq("view", "click", "purchase"))
      .orderBy("user_id").collect()
      .map(x => (x.getLong(0), x.getLong(1),
        Option(x.get(2)), Option(x.get(3)), Option(x.get(4)))).toSeq
    assert(r === Seq(
      (1L, 3L, Some(100L), Some(200L), Some(300L)),
      (2L, 2L, Some(200L), Some(300L), None),
      (3L, 1L, Some(100L), None, None),
      (4L, 0L, None, None, None),
      (5L, 2L, Some(100L), Some(160L), None)))
  }

  test("conversion rollup counts final stages and averages full-convert time exactly") {
    val r = Funnel.conversionRollup(events, Seq("view", "click", "purchase"))
      .orderBy("stage_reached").collect()
      .map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) None else Some(x.getDouble(2)))).toSeq
    // users: 4→stage0, 3→stage1, 2 and 5→stage2, 1→stage3 (t3-t1 = 200µs)
    assert(r === Seq((0L, 1L, None), (1L, 1L, None), (2L, 2L, None),
      (3L, 1L, Some(200.0))))
  }

  test("a single-stage funnel reduces to first-occurrence") {
    val r = Funnel.funnel(events, Seq("click")).orderBy("user_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(r === Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 0L), (5L, 1L)))
  }

  test("cohort retention counts each cohort's active users per week offset") {
    val wk = 7L * 24 * 3600 * 1000000L
    // user 1: weeks 0,1,3 (cohort 0); user 2: weeks 0,0,1 (dup-week events
    // collapse); user 3: first seen week 1, returns week 2 (cohort 1);
    // null-ts event ignored
    val ev = Seq(
      (1L, Some(0L * wk), 1L, "view"), (2L, Some(1L * wk + 5L), 1L, "view"),
      (3L, Some(3L * wk), 1L, "view"),
      (4L, Some(0L * wk + 9L), 2L, "view"), (5L, Some(0L * wk + 10L), 2L, "view"),
      (6L, Some(1L * wk), 2L, "view"),
      (7L, Some(1L * wk + 1L), 3L, "view"), (8L, Some(2L * wk), 3L, "view"),
      (9L, Option.empty[Long], 3L, "view"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    val r = Funnel.retentionCohorts(ev).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(r === Map(
      (0L, 0L) -> 2L, // users 1 and 2 in week 0
      (0L, 1L) -> 2L, // both return in week 1
      (0L, 3L) -> 1L, // only user 1 at offset 3
      (1L, 0L) -> 1L, // user 3's cohort starts week 1
      (1L, 1L) -> 1L))
  }

  test("null-time events are excluded from the walk, not planted as null stages") {
    val withNull = Seq(
      (1L, Some(100L), 9L, "view"),
      (2L, None, 9L, "view"),        // must not occupy a stage slot
      (3L, Some(200L), 9L, "click"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    val r = Funnel.funnel(withNull, Seq("view", "click", "purchase"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r === Map(9L -> 2L))
  }
}
