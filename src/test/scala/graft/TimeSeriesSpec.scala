package graft

import org.apache.spark.sql.functions._
import graft.ops.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  // (key, ts_us, event_id, value) rows; tieCol = event_id
  private def frame(rows: Seq[(Long, Long, Long, Double)]) =
    rows.toDF("user_id", "ts_us", "event_id", "value")

  test("asof join picks the greatest prior right row per key, inclusive at equal ts") {
    val left = frame(Seq((1L, 100L, 10L, 1.0), (1L, 200L, 11L, 2.0), (2L, 150L, 12L, 3.0)))
    val right = frame(Seq(
      (1L, 50L, 1L, 0.5), (1L, 100L, 2L, 0.7), // ts=100 ties left event 10 → inclusive match
      (1L, 180L, 3L, 0.9), (2L, 160L, 4L, 0.4))) // 160 > 150: user 2 has no prior
    val got = TimeSeries.asofJoin(left, right, Seq("user_id"), "ts_us", "event_id",
        payload = Seq("event_id", "value"))
      .select("event_id", "asof_event_id", "asof_ts_us")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(got === Set(
      (10L, Some(2L), Some(100L)), // equal-ts right row matched (>= semantics)
      (11L, Some(3L), Some(180L)), // greatest prior, not first prior
      (12L, None, None)))          // no prior → left-join nulls
  }

  test("right rows tied on (key, ts) resolve to the greatest tiebreak, atomically") {
    val left = frame(Seq((1L, 100L, 10L, 1.0)))
    val right = frame(Seq((1L, 90L, 1L, 0.1), (1L, 90L, 3L, 0.3), (1L, 90L, 2L, 0.2)))
    val got = TimeSeries.asofJoin(left, right, Seq("user_id"), "ts_us", "event_id",
        payload = Seq("event_id", "value"))
      .select("asof_event_id", "asof_value").as[(Long, Double)].collect().toSeq
    // event_id 3 wins the tie and its OWN value comes with it (struct-carried
    // payload — per-column last() could mix rows when a field is null)
    assert(got === Seq((3L, 0.3)))
  }

  test("output is exactly one row per left row with left columns unchanged") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
    val out = TimeSeries.purchaseAttribution(ev)
    assert(out.count() === purchases.count())
    val sums = out.agg(
      sum(when(col("view_event_id").isNull, 1).otherwise(0)).as("unmatched"),
      sum(when(col("lag_us") < 0, 1).otherwise(0)).as("negative_lag"))
      .collect().head
    assert(sums.getLong(0) > 0, "sf0.001 should contain early purchases with no prior view")
    assert(sums.getLong(1) === 0, "as-of match must never be in the left row's future")
  }

  test("as-of join scopes matches to the full composite key") {
    val left = Seq((1L, "a", 100L, 10L, 1.0), (1L, "b", 100L, 11L, 2.0))
      .toDF("user_id", "region", "ts_us", "event_id", "value")
    val right = Seq((1L, "a", 50L, 1L, 0.5))
      .toDF("user_id", "region", "ts_us", "event_id", "value")
    val got = TimeSeries.asofJoin(left, right, Seq("user_id", "region"),
        "ts_us", "event_id", payload = Seq("event_id"))
      .select("event_id", "asof_event_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    // (1,"b") must NOT see (1,"a")'s right row
    assert(got === Set((10L, Some(1L)), (11L, None)))
  }

  test("bucketed as-of equals the single-pass as-of, including across empty buckets") {
    // fixture: match must carry across buckets 1-4 (no right rows there)
    val left = frame(Seq((1L, 450L, 10L, 1.0), (1L, 40L, 11L, 2.0)))
    val right = frame(Seq((1L, 50L, 1L, 0.5), (1L, 60L, 2L, 0.7)))
    val a = TimeSeries.asofJoin(left, right, Seq("user_id"), "ts_us", "event_id",
      payload = Seq("event_id", "value"))
    val b = TimeSeries.asofJoinBucketed(left, right, Seq("user_id"), "ts_us", "event_id",
      payload = Seq("event_id", "value"), bucketUs = 100L)
    assert(b.exceptAll(a).isEmpty && a.exceptAll(b).isEmpty,
      s"bucketed mismatch:\n${b.collect().mkString("\n")}\nvs\n${a.collect().mkString("\n")}")
    // and on real data, at a bucket width that forces many carries
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
    val views = ev.filter(col("event_type") === "view")
    val fa = TimeSeries.asofJoin(purchases, views, Seq("user_id"), "ts_us", "event_id",
      payload = Seq("event_id", "value"))
    val fb = TimeSeries.asofJoinBucketed(purchases, views, Seq("user_id"), "ts_us", "event_id",
      payload = Seq("event_id", "value"), bucketUs = 600L * 1000000L)
    assert(fb.exceptAll(fa).isEmpty && fa.exceptAll(fb).isEmpty)
    // plan contract: the bucket census is folded into the stage-1 aggregate,
    // so the whole three-stage variant needs exactly 3 exchanges (union agg,
    // carry-in window repartition, stage-3 join+window repartition) — the
    // old separate distinct() census cost a fourth
    val exchanges = fb.queryExecution.executedPlan.toString.linesIterator
      .count(_.trim.matches("""^[+:\-\s]*Exchange .*"""))
    assert(exchanges <= 3, s"expected <=3 exchanges in bucketed as-of, got $exchanges")
  }

  test("nearest join picks the closer side and breaks distance ties by smaller id") {
    val left = frame(Seq((1L, 100L, 10L, 1.0), (2L, 100L, 11L, 1.0)))
    val right = frame(Seq(
      (1L, 90L, 1L, 0.1),   // backward d=10
      (1L, 105L, 2L, 0.2),  // forward d=5  → wins for plain case...
      (1L, 95L, 3L, 0.3)))  // backward d=5 → ties forward; id 2 < 3 wins
    val got = TimeSeries.nearestJoin(left, right, Seq("user_id"), "ts_us", "event_id",
        payload = Seq("event_id"))
      .select("event_id", "nearest_event_id", "nearest_dist")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(got === Set(
      (10L, Some(2L), Some(5L)),  // (5, 2) beats (5, 3) and (10, 1)
      (11L, None, None)))         // user 2 has no views at all
  }

  test("range join is inclusive at both interval ends and drops outside points") {
    val points = frame(Seq(
      (1L, 100L, 1L, 0.0), (1L, 150L, 2L, 0.0), (1L, 200L, 3L, 0.0),
      (1L, 201L, 4L, 0.0), (2L, 150L, 5L, 0.0)))
    val intervals = Seq((1L, 7L, 100L, 200L)).toDF("user_id", "iv_id", "start_us", "end_us")
    val got = TimeSeries.rangeJoin(points, intervals, Seq("user_id"),
        "ts_us", "start_us", "end_us", bucketUs = 50L)
      .select("event_id", "iv_id").as[(Long, Long)].collect().toSet
    // 100 and 200 are the closed ends; 201 is out; user 2 has no interval
    assert(got === Set((1L, 7L), (2L, 7L), (3L, 7L)))
  }

  test("a pair joins exactly once even when the interval spans many buckets") {
    val points = frame(Seq((1L, 500L, 1L, 0.0)))
    val intervals = Seq((1L, 7L, 0L, 1000L)).toDF("user_id", "iv_id", "start_us", "end_us")
    val out = TimeSeries.rangeJoin(points, intervals, Seq("user_id"),
      "ts_us", "start_us", "end_us", bucketUs = 10L) // interval covers 101 buckets
    assert(out.count() === 1)
  }

  test("guarded range join bounds a degenerate interval's replication, output unchanged") {
    // 200 routine one-hour sessions plus one pathological YEAR-long
    // interval; points scattered across the year
    val hourUs = 3600L * 1000000L
    val points = frame((0L until 500L).map(i =>
      (i % 3, i * (365L * 24 * hourUs / 500), i, 0.0)))
    val routine = (0L until 200L).map(i => (i % 3, i, i * 40 * hourUs, i * 40 * hourUs + hourUs))
    val intervals = (routine :+ (1L, 999L, 0L, 365L * 24 * hourUs))
      .toDF("user_id", "iv_id", "start_us", "end_us")
    val plain = TimeSeries.rangeJoin(points, intervals, Seq("user_id"),
      "ts_us", "start_us", "end_us", bucketUs = hourUs)
    val guarded = TimeSeries.rangeJoinGuarded(points, intervals, Seq("user_id"),
      "ts_us", "start_us", "end_us", bucketUs = hourUs, maxBucketsPerInterval = 64)
    assert(guarded.exceptAll(plain).isEmpty && plain.exceptAll(guarded).isEmpty,
      "guarded output differs from plain")
    // replication accounting, counted on the actual exploded interval sides:
    // plain pays the full year at 1h buckets; the guard's coarse branch pays
    // year/(64h) and its fine branch only the routine intervals
    val plainRows = TimeSeries.explodeToBuckets(intervals, "start_us", "end_us", hourUs).count()
    val span = (col("end_us") - col("start_us")) / hourUs
    val fineRows = TimeSeries.explodeToBuckets(
      intervals.filter(span < 64), "start_us", "end_us", hourUs).count()
    val coarseRows = TimeSeries.explodeToBuckets(
      intervals.filter(span >= 64), "start_us", "end_us", hourUs * 64).count()
    assert(plainRows > 8760L, s"fixture should explode plain ($plainRows rows)")
    assert(fineRows + coarseRows < 600L,
      s"guard should bound replication, got ${fineRows + coarseRows}")
  }

  test("floor-div bucket ids stay monotonic across negative timestamps") {
    // pre-epoch point inside a pre-epoch interval: truncating div would
    // fold (-b, b) into bucket 0 and still find it, but a point in
    // (-2b, -b) against an interval ending before -b is the breaking case
    val points = frame(Seq((1L, -150L, 1L, 0.0), (1L, -50L, 2L, 0.0), (1L, 50L, 3L, 0.0)))
    val intervals = Seq((1L, 7L, -180L, -120L), (1L, 8L, -60L, 60L))
      .toDF("user_id", "iv_id", "start_us", "end_us")
    val got = TimeSeries.rangeJoin(points, intervals, Seq("user_id"),
        "ts_us", "start_us", "end_us", bucketUs = 100L)
      .select("event_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 7L), (2L, 8L), (3L, 8L)))
  }

  test("range-join plan is an equi-join, never a nested-loop fallback") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val plan = TimeSeries.purchasesInSessions(ev).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"bucketed range join must stay an equi-join:\n$plan")
  }

  test("trailing stats use a RANGE frame: burst rows share one time window") {
    val ev = Seq(
      // (event_id, ts_us, value): three rows inside one hour, one beyond it
      (1L, 0L, 10.0), (2L, 1000L, 20.0), (3L, 2000L, 30.0),
      (4L, 5000000000L, 40.0))
      .map { case (id, ts, v) => (id, ts, "x", v) }
      .toDF("event_id", "ts_us", "event_type", "value")
    val got = graft.ops.Monitoring.trailingStats(ev)
      .orderBy("event_id").as[(Long, String, Double, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "x", 10.0, 1L),
      (2L, "x", 15.0, 2L),          // (10+20)/2 — ROW frame would differ only
      (3L, "x", 20.0, 3L),          // (10+20+30)/3: all three in the hour
      (4L, "x", 40.0, 1L)))         // hour expired: frame restarts
  }

  test("plan contract: no join operator, one window over the key") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val plan = TimeSeries.purchaseAttribution(ev).queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin")
      && !plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must be the union+window plan, not a range join:\n$plan")
    assert(plan.contains("Window"), s"expected a window operator:\n$plan")
  }

  test("SCD2 intervals: tie pre-reduce, half-open adjacency, and as-of equivalence") {
    val versions = frame(Seq(
      (1L, 100L, 1L, 10.0), (1L, 100L, 2L, 11.0), // same-ts tie → id 2 wins
      (1L, 300L, 3L, 12.0),
      (2L, 50L, 4L, 7.0)))
    val iv = TimeSeries.validityIntervals(versions, Seq("user_id"), "ts_us",
        "event_id", Seq("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getDouble(3))).toSet
    assert(iv === Set(
      (1L, 100L, Some(300L), 11.0), // tie reduced to id 2's value; closed by v300
      (1L, 300L, None, 12.0),       // open-ended last version
      (2L, 50L, None, 7.0)))
    // the kinship claim: an interval-containment join against the history
    // table IS the as-of join (the asofStreamStatic rewrite, batch-side)
    val queries = frame(Seq((1L, 99L, 20L, 0.0), (1L, 100L, 21L, 0.0),
      (1L, 250L, 22L, 0.0), (1L, 300L, 23L, 0.0), (2L, 60L, 24L, 0.0)))
    val hist = TimeSeries.validityIntervals(versions, Seq("user_id"), "ts_us",
      "event_id", Seq("value"))
    val viaIntervals = queries.as("q")
      .join(hist.as("h"),
        col("q.user_id") === col("h.user_id") &&
          col("q.ts_us") >= col("h.valid_from") &&
          (col("h.valid_to").isNull || col("q.ts_us") < col("h.valid_to")),
        "left")
      .select(col("q.event_id"), col("h.value"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val viaAsof = TimeSeries.asofJoin(queries, versions, Seq("user_id"),
        "ts_us", "event_id", payload = Seq("value"))
      .select(col("event_id"), col("asof_value"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(viaIntervals === viaAsof)
    assert(viaAsof(20L) === None && viaAsof(21L) === Some(11.0) &&
      viaAsof(23L) === Some(12.0))
  }

  test("hourly resample of an empty frame returns an empty, correctly-shaped grid") {
    val empty = Seq.empty[(String, java.sql.Timestamp, Long, Double)]
      .toDF("event_type", "ts", "event_id", "value")
    val out = TimeSeries.resampleHourly(empty)
    assert(out.columns.toSeq === Seq("event_type", "bucket", "n_obs", "filled_value"))
    assert(out.collect().isEmpty)
  }

  test("hourly linear interpolation: exact at observations, weighted between, null outside") {
    def t(h: Int, m: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val ev = Seq(
      // key A: obs at 01:00 (=10) and 03:00 (=30): bucket 01 exact 10,
      // bucket 02 halfway = 20, bucket 03 exact 30, bucket 00 null (before)
      ("A", t(1, 0), 1L, 10.0), ("A", t(3, 0), 2L, 30.0),
      // key B: obs at 00:30 (=8) and 01:30 (=12): bucket 01 is 2/3 of the
      // hour past 00:30 → 8 + 4*(1/2) = 10 at 01:00 (30 of 60 min)
      ("B", t(0, 30), 3L, 8.0), ("B", t(1, 30), 4L, 12.0))
      .toDF("event_type", "ts", "event_id", "value")
    val got = graft.ops.TimeSeries.resampleHourlyInterp(ev)
      .orderBy("event_type", "bucket").collect()
      .map(r => (r.getString(0), r.getString(1).substring(11, 13),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.toSeq === Seq(
      ("A", "00", None),        // before A's first observation
      ("A", "01", Some(10.0)),  // exact-time obs → weight 0
      ("A", "02", Some(20.0)),  // halfway between 10 and 30
      ("A", "03", Some(30.0)),
      ("B", "00", None),        // 00:00 precedes B's first obs at 00:30
      ("B", "01", Some(10.0)),  // 30 of 60 minutes between 8 and 12
      ("B", "02", None),        // past B's last obs: no extrapolation
      ("B", "03", None)))
  }

  test("interpolateAt attaches point-in-time values at arbitrary query instants") {
    def t(h: Int, m: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val obs = Seq(
      ("A", t(1, 0), 1L, 10.0), ("A", t(2, 0), 2L, 40.0),
      ("A", t(2, 0), 3L, 50.0)) // same-ts tie: greater id (50.0) wins
      .toDF("event_type", "ts", "event_id", "value")
    def us(h: Int, m: Int): Long = t(h, m).getTime * 1000L
    val queries = Seq(
      (100L, "A", us(1, 15)),  // quarter of the hour: 10 + 40*0.25 = 20
      (101L, "A", us(2, 0)),   // exact at the tie → 50
      (102L, "A", us(0, 30)),  // before first obs → null
      (103L, "B", us(1, 30))   // key with no obs → null
    ).toDF("q_id", "event_type", "q_ts_us")
    val got = TimeSeries.interpolateAt(queries, obs, "event_type", "q_ts_us")
      .orderBy("q_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got === Map(100L -> Some(20.0), 101L -> Some(50.0), 102L -> None, 103L -> None))
  }


  test("burst hours: quiet baseline then a spike, first-hour exemption") {
    val hr = 3600000000L
    // key A: hours 0..3 have 1 event each (baseline), hour 4 has 9 —
    // 9 * 4 > 3 * 4 → burst, ratio 9.0. Hours 1..3: n=1, 1*t_cnt ==
    // t_sum < 3*t_sum → quiet. Hour 0 has no baseline → exempt.
    val quiet = (0 to 3).map(i => ("A", i.toLong + 1L, i * hr + 7L, 1.0))
    val spike = (0 until 9).map(i => ("A", 100L + i, 4 * hr + i.toLong, 1.0))
    val ev = (quiet ++ spike).toDF("event_type", "event_id", "ts_us", "value")
    val r = TimeSeries.burstHours(ev).collect()(0)
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ===
      (("A", 5L, 1L, 9.0)))
    val ex = intercept[IllegalArgumentException] {
      TimeSeries.burstHours(ev, window = 0)
    }
    assert(ex.getMessage.contains("burstHours"))
  }

  test("lead-lag scan: a planted 2-hour shift is recovered as best_lag = 2") {
    val hr = 3600000000L
    // B pulses at hour 0, A pulses at hour 2 — the only lag with any
    // overlap is a.bucket = b.bucket + 2h, so b LEADS a by 2 hours and
    // the dot is 5e6 * 3e6 = 15e12 over one overlapping hour
    val ev = Seq(
      ("A", 1L, 2 * hr + 11L, 5.0),
      ("B", 2L, 13L, 3.0))
      .toDF("event_type", "event_id", "ts_us", "value")
    val r = TimeSeries.leadLagDot(ev).collect()
    assert(r.length === 1)
    assert((r(0).getString(0), r(0).getString(1), r(0).getLong(2),
        r(0).getLong(3), r(0).getString(4)) ===
      (("A", "B", 2L, 1L, "15000000000000")))
    val ex = intercept[IllegalArgumentException] { TimeSeries.leadLagDot(ev, maxLag = 0) }
    assert(ex.getMessage.contains("leadLagDot"))
  }

  test("PAA profile distance: hand-built two-segment series, grid zero-fill") {
    val hr = 3600000000L
    // two segments over a 2-hour span: hour 0 -> seg 0, hour 1 -> seg 1.
    // A = [1e6, 2e6], B = [3e6, 5e6], C = [10e6, 0 (grid fill)]:
    //   d(A,B) = (2e6)^2 + (3e6)^2 = 13e12
    //   d(A,C) = (9e6)^2 + (2e6)^2 = 85e12
    //   d(B,C) = (7e6)^2 + (5e6)^2 = 74e12
    val ev = Seq(
      ("A", 1L, 100L, 1.0), ("A", 2L, hr + 5L, 2.0),
      ("B", 3L, 200L, 3.0), ("B", 4L, hr + 9L, 5.0),
      ("C", 5L, 300L, 10.0))
      .toDF("event_type", "event_id", "ts_us", "value")
    val got = TimeSeries.paaProfileDistance(ev, segments = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getString(3))))
      .toMap
    assert(got === Map(
      ("A", "B") -> ((2L, "13000000000000")),
      ("A", "C") -> ((2L, "85000000000000")),
      ("B", "C") -> ((2L, "74000000000000"))))
  }

  test("EWMA fold equals the driver recurrence, floors on negatives, handles one hour") {
    import graft.ops.TimeSeries
    val h = 3600000000L
    // two keys: X has positive AND negative hourly sums (floor vs
    // truncation diverge on the negatives — the case the portable
    // spelling exists for); Y has a single hour (empty fold tail)
    val rows = Seq(
      ("X", 0L, 8.0), ("X", 0L, 4.0), ("X", 1L, -7.0), ("X", 2L, 1.0),
      ("X", 3L, -60.0), ("Y", 0L, 5.0))
    val ev = rows.zipWithIndex.map { case ((k, hr, v), i) =>
      (k, i.toLong, v, hr * h)
    }.toDF("event_type", "event_id", "value", "ts_us")
    val got = TimeSeries.ewmaHourly(ev).orderBy("key", "bucket_us")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // driver recurrence: s1 = x1; s_t = floor((x_t + 3 s_{t-1}) / 4)
    def series(k: String): Seq[(Long, Long)] = rows.filter(_._1 == k)
      .map { case (_, hr, v) => (hr, math.floor(v * 1000000.0).toLong) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (hr, vs) => (hr * h, vs.map(_._2).sum) }
    def fold(xs: Seq[(Long, Long)]): Seq[(Long, Long, Long)] =
      xs.tail.scanLeft((xs.head._1, xs.head._2, xs.head._2)) {
        case ((_, _, s), (bu, x)) =>
          (bu, x, Math.floorDiv(1L * x + 3L * s, 4L))
      }
    val want = (fold(series("X")).map { case (b, x, s) => ("X", b, x, s) } ++
      fold(series("Y")).map { case (b, x, s) => ("Y", b, x, s) }).toArray
    assert(got === want)
    // the negative hours really exercised the floor branch
    assert(got.exists(_._4 < 0L))
  }

  test("Holt fold equals the driver recurrence; trend floors on declines; one hour OK") {
    import graft.ops.TimeSeries
    val h = 3600000000L
    // X ramps then DECLINES: the decline makes l_t - l_{t-1} negative,
    // exercising the trend step's floor branch over all-positive values;
    // Y has a single hour (pure level, zero trend, empty fold tail)
    val rows = Seq(
      ("X", 0L, 4.0), ("X", 1L, 8.0), ("X", 2L, 16.0), ("X", 3L, 1.0),
      ("X", 4L, 1.0), ("Y", 0L, 5.0))
    val ev = rows.zipWithIndex.map { case ((k, hr, v), i) =>
      (k, i.toLong, v, hr * h)
    }.toDF("event_type", "event_id", "value", "ts_us")
    val got = TimeSeries.holtHourly(ev).orderBy("key", "bucket_us")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // driver recurrence: l1 = x1, b1 = 0;
    //   l_t = floor((x_t + 3 (l + b)) / 4), b_t = floor(((l_t - l) + b) / 2)
    def series(k: String): Seq[(Long, Long)] = rows.filter(_._1 == k)
      .map { case (_, hr, v) => (hr * h, math.floor(v * 1000000.0).toLong) }
    def fold(xs: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long)] =
      xs.tail.scanLeft((xs.head._1, xs.head._2, xs.head._2, 0L)) {
        case ((_, _, l, b), (bu, x)) =>
          val lNew = Math.floorDiv(1L * x + 3L * (l + b), 4L)
          val bNew = Math.floorDiv(1L * (lNew - l) + 1L * b, 2L)
          (bu, x, lNew, bNew)
      }
    val want = Seq("X", "Y").flatMap(k => fold(series(k)).map {
      case (bu, x, l, b) => (k, bu, x, l, b, l + b)
    }).toArray
    assert(got === want)
    // the decline really exercised the trend floor branch
    assert(got.exists(_._5 < 0L), "expected a negative trend hour")
    // ... and on the ramp the forecast sits ABOVE the pure-level EWMA
    // (the reason the trend term exists)
    val ramp = got.filter(r => r._1 == "X" && r._2 == 2L * h).head
    val ewmaRamp = TimeSeries.ewmaHourly(ev).orderBy("key", "bucket_us")
      .collect().filter(r => r.getString(0) == "X" && r.getLong(1) == 2L * h)
      .head.getLong(3)
    assert(ramp._6 > ewmaRamp, "Holt forecast should lead EWMA on a ramp")
  }

  test("CUSUM via the prefix-min identity equals the recursive definition and resets") {
    import graft.ops.TimeSeries
    // one key, six hours: level k_ref-ish, then a drift burst, then quiet
    // (the statistic must RESET through the prefix minimum, not linger)
    val h = 3600000000L
    val rows = Seq(
      // (hour, value, count-of-events folded into distinct event rows)
      (0L, 10.0), (0L, 10.0), (1L, 10.0), (2L, 50.0), (2L, 50.0),
      (3L, 50.0), (4L, 1.0), (4L, 1.0), (5L, 10.0))
    val ev = rows.zipWithIndex.map { case ((hr, v), i) =>
      ("X", i.toLong, v, hr * h)
    }.toDF("event_type", "event_id", "value", "ts_us")
    val got = TimeSeries.cusumDrift(ev).orderBy("bucket_us")
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getBoolean(4)))
    // recursive reference: S_t = max(0, S_{t-1} + (swq - k*n))
    val q = rows.map { case (hr, v) => (hr, math.floor(v * 1000000.0).toLong) }
    val k = q.map(_._2).sum / q.size
    val hours = q.groupBy(_._1).toSeq.sortBy(_._1).map { case (hr, vs) =>
      (hr, vs.map(_._2).sum, vs.size.toLong)
    }
    var s = 0L
    val expected = hours.map { case (hr, swq, n) =>
      s = math.max(0L, s + (swq - k * n))
      (hr * h, s, s * 10L > k * n)
    }
    assert(got.toSeq === expected)
    // the quiet hours DID decay the statistic below the burst peak (full
    // reset to zero would need a longer quiet run at this threshold —
    // the decay direction is the property the prefix minimum provides)
    assert(expected.last._2 < expected.map(_._2).max)
    assert(expected.exists(_._3), "the burst should flag drift")
    assert(expected.take(2).forall(!_._3), "the level hours must not flag")
  }

  test("hourly resample excludes null keys explicitly rather than emitting empty grid rows") {
    def t(h: Int): java.sql.Timestamp = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val ev = Seq(
      (Some("A"), t(0), 1L, 1.0), (Some("A"), t(1), 2L, 2.0),
      (None, t(0), 3L, 9.0)) // null key: dropped, not an all-empty grid row
      .toDF("event_type", "ts", "event_id", "value")
    val got = TimeSeries.resampleHourly(ev).collect()
    assert(got.forall(!_.isNullAt(0)), "null key leaked into the resample grid")
    assert(got.length === 2) // A's two hour buckets only
  }

  test("hourly resample fills gaps forward, leaves leading holes null, ties on (ts,id)") {
    def t(h: Int, m: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val ev = Seq(
      // key A: obs in hours 0 and 3 (gap hours 1, 2); tie in hour 0 —
      // two events at the same ts, larger event_id must win
      ("A", t(0, 30), 1L, 10.0), ("A", t(0, 30), 2L, 11.0), ("A", t(3, 0), 3L, 30.0),
      // key B: first obs in hour 2 → hours 0-1 stay null
      ("B", t(2, 15), 4L, 7.0))
      .toDF("event_type", "ts", "event_id", "value")
    val got = TimeSeries.resampleHourly(ev)
      .orderBy("event_type", "bucket").collect()
      .map(r => (r.getString(0), r.getString(1).substring(11, 13),
        r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.toSeq === Seq(
      ("A", "00", 2L, Some(11.0)), // tie → event_id 2
      ("A", "01", 0L, Some(11.0)), // forward-filled
      ("A", "02", 0L, Some(11.0)),
      ("A", "03", 1L, Some(30.0)),
      ("B", "00", 0L, None),       // before B's first observation
      ("B", "01", 0L, None),
      ("B", "02", 1L, Some(7.0)),
      ("B", "03", 0L, Some(7.0))))
  }

  test("hourlyAcf: an alternating hourly series autocorrelates to exactly ±1") {
    // counts alternate 1, 3, 1, 3, ... over 8 hours → y = 4 − x at odd
    // lags (corr −1), y = x at even lags (corr +1); both exact because
    // the moments are integers and num = ±dx cancels to ±1.0 in doubles
    val hr = 3600000000L
    val rows = for {
      h <- 0 until 8
      k <- 0 until (if (h % 2 == 0) 1 else 3)
    } yield h.toLong * hr + k * 1000L
    val ev = rows.toDF("ts_us")
    val acf = TimeSeries.hourlyAcf(ev, maxLag = 3).orderBy("lag").collect()
    assert(acf.map(_.getAs[Long]("lag")).toSeq === Seq(1L, 2L, 3L))
    assert(acf(0).getAs[Double]("acf") === -1.0)
    assert(acf(1).getAs[Double]("acf") === 1.0)
    assert(acf(2).getAs[Double]("acf") === -1.0)
    assert(acf(0).getAs[Long]("n_pairs") === 7L)
    assert(acf(2).getAs[Long]("n_pairs") === 5L)
  }

  test("hourlyAcfByKey isolates each key's series: a planted cycle shows only on its own key") {
    // key A alternates 1,3 (period 2 → acf(2) = +1); key B is constant 2
    // per hour (degenerate variance → null acf); the pair join must
    // never mix their hours
    val hr = 3600000000L
    val rows =
      (for { h <- 0 until 8; k <- 0 until (if (h % 2 == 0) 1 else 3) }
        yield ("A", h.toLong * hr + k * 1000L)) ++
      (for { h <- 0 until 8; k <- 0 until 2 }
        yield ("B", h.toLong * hr + k * 1000L))
    val ev = rows.toDF("event_type", "ts_us")
    val acf = TimeSeries.hourlyAcfByKey(ev, maxLag = 2)
      .orderBy("key", "lag").collect()
    assert(acf.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("A", 1L), ("A", 2L), ("B", 1L), ("B", 2L)))
    assert(acf(0).getAs[Double]("acf") === -1.0) // A lag 1
    assert(acf(1).getAs[Double]("acf") === 1.0)  // A lag 2
    assert(acf(2).isNullAt(acf(2).fieldIndex("acf"))) // B: zero variance
    assert(acf(3).isNullAt(acf(3).fieldIndex("acf")))
  }

  test("acfServe over the hourly state table equals the batch ACF on the same population") {
    val hr = 3600000000L
    val rows = for {
      h <- 0 until 10
      k <- 0 until (h % 4 + 1)
    } yield (s"k${k % 2}", 1.5 + k, h.toLong * hr + k * 7000L)
    val ev = rows.toDF("event_type", "value", "ts_us")
    val viaState = TimeSeries.acfServe(TimeSeries.hourlyQuantized(ev), maxLag = 4)
      .orderBy("lag").collect().toSeq
    val viaBatch = TimeSeries.hourlyAcf(
      ev.filter(col("event_type").isNotNull && col("value").isNotNull), maxLag = 4)
      .orderBy("lag").collect().toSeq
    assert(viaState === viaBatch)
    // the keyed face serves from the SAME state table
    val keyedState = TimeSeries.acfServeByKey(TimeSeries.hourlyQuantized(ev), maxLag = 4)
      .orderBy("key", "lag").collect().toSeq
    val keyedBatch = TimeSeries.hourlyAcfByKey(
      ev.filter(col("value").isNotNull), maxLag = 4)
      .orderBy("key", "lag").collect().toSeq
    assert(keyedState === keyedBatch && keyedState.nonEmpty)
  }

  test("seasonal backtest: periodic series scores zero error; gaps drop, never misalign") {
    val hr = 3600000000L
    // type A: value v(h) = 10 + (h mod 24) exactly periodic over 3 days
    // -> every matched hour has actual == forecast -> MAE = bias = 0
    val periodic = (0 until 72).map { h =>
      ("A", h.toLong * hr + 7L, (10 + h % 24).toDouble)
    }
    // type B: two days, but hour 30 is MISSING; hour 54 (= 30 + 24) must
    // therefore produce NO matched row (a row-lag would misalign instead)
    val gappy = (24 until 72).filter(h => h != 30).map { h =>
      ("B", h.toLong * hr + 7L, (100 + h % 24).toDouble)
    }
    val events = (periodic ++ gappy).toDF("event_type", "ts_us", "value")
    val r = graft.ops.TimeSeries.seasonalBacktest(events)
      .orderBy("event_type").collect()
    val a = r(0); val b = r(1)
    assert(a.getAs[String]("event_type") === "A")
    assert(a.getAs[Long]("n_hours") === 48L) // hours 24..71 have a prior day
    assert(a.getAs[Double]("mae") === 0.0 && a.getAs[Double]("bias") === 0.0)
    // B spans hours 24..71 minus {30}: matched hours are 48..71 except
    // 54 (prior missing) and 30 itself (absent) -> 23 matched, all exact
    assert(b.getAs[String]("event_type") === "B")
    assert(b.getAs[Long]("n_hours") === 23L)
    assert(b.getAs[Double]("mae") === 0.0)
  }
}
