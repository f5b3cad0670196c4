package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The monitoring/serving-side read surface (reference dashboard + NiFi
  * metrics aggregations, SURVEY.md §2.4):
  *  - A1 count-by-level buckets: dashboard.html:991-1009
  *  - A2 top-N recent alerts:    dashboard.html:947,1025-1043
  *  - A3 max-threshold gauge:    dashboard.html:1236-1248
  *  - A6 delta/rate detection:   NiFiMonitoringService.java:522-604,722-802
  *  - A7 per-record average:     NiFiMonitoringService.java:500-516
  *  - T14/T15 station list / detail projections: StationService.java:50-59,88-98
  *
  * All are single-shuffle (or shuffle-free) declarative plans: the window
  * functions partition by station key so state never concentrates on the
  * driver, and top-N is a sort-limit Catalyst turns into TakeOrdered.
  */
object Monitoring {

  /** Latest observation per station: the one window function of the
    * flagship path (row_number over ts, event_id tiebreak). Shared by
    * SparkEntry.entry and q_latest_per_station. */
  def latestPerStation(classified: DataFrame): DataFrame = {
    val w = Window.partitionBy("wlobscd").orderBy(col("ts_us").desc, col("event_id").desc)
    classified.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** A2: newest N alerts; ns-long tiebreak keeps ordering identical to the
    * nanosecond-precision oracle. */
  def topNRecent(alerts: DataFrame, n: Int = 500): DataFrame =
    alerts
      .orderBy(col("ts_us").desc, col("event_id").desc)
      .limit(n)
      .select(
        col("event_id"), col("wlobscd").as("observation_code"),
        col("alert_level").as("warning_level"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("alert_ts"))

  /** A3: per-station gauge scale = max(positive thresholds) * 1.2, default
    * 10 when no threshold qualifies (dashboard.html:1236-1248 filters
    * `l != null && l > 0` and starts from maxLevel = 10). */
  def thresholdGaugeScale(dim: DataFrame): DataFrame = {
    def pos(c: String): Column = when(col(c) > 0.0, col(c))
    dim.select(
      col("wlobscd"),
      coalesce(greatest(pos("attwl"), pos("wrnwl"), pos("almwl"), pos("srswl")) * 1.2,
        lit(10.0)).as("gauge_max"))
  }

  /** A6: previous-vs-current delta and per-second rate per station, the
    * lag() form of the NiFi counter-delta activity detection. Exact long
    * arithmetic for the time delta; rate guarded against zero gaps. */
  def deltaRate(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("ts_us"), col("event_id"))
    events
      .withColumn("prev_value", lag("value", 1).over(w))
      .withColumn("delta", col("value") - col("prev_value"))
      .withColumn("gap_us", col("ts_us") - lag("ts_us", 1).over(w))
      .withColumn("rate_per_sec", col("delta") / nullif(col("gap_us") / lit(1.0e6), lit(0.0)))
      .withColumn("is_active", col("delta").isNotNull && col("delta") =!= 0.0)
      .select("event_id", "event_type", "value", "prev_value", "delta", "rate_per_sec", "is_active")
  }

  /** A7: per-record average cost — value per unit of work
    * (tasksDurationNanos / max(flowFiles,1) in the reference). */
  def perRecordAvg(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      col("event_type"),
      (col("value") / greatest(get_json_object(col("props"), "$.k").cast("int"), lit(1))
        .cast("double")).as("per_record_avg"))

  /** A4: queue/backpressure rollup (NiFiMonitoringService.java:671-717):
    * totals of queued units/bytes plus the count of saturated connections.
    * Role mapping: each event is a "connection" sample — props.k plays
    * flowFilesQueued, value plays bytesQueued, saturation = value ≥ the
    * pressure threshold. */
  def queueBackpressure(events: DataFrame, pressureThreshold: Double = 300.0): DataFrame =
    events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("queued"),
        col("value"))
      .groupBy("event_type")
      .agg(
        sum("queued").as("flow_files_queued"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("bytes_queued"),
        count(when(col("value") >= pressureThreshold, 1)).as("saturated"),
        count(lit(1)).as("connections"))

  /** A5: processor-status rollup (NiFiMonitoringService.java:807-883):
    * running/active/with-data counts and totals per group. Role mapping:
    * user_id plays the processor id, event presence plays activity. */
  def processorRollup(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("work"))
      .groupBy("event_type")
      .agg(
        countDistinct("user_id").as("processors"),
        count(when(col("work") > 0, 1)).as("active_samples"),
        sum("work").as("total_work"),
        count(lit(1)).as("samples"))

  /** Diurnal peak: each type's busiest hour-of-day and its share of the
    * type's volume — struct-max pick (tie → earliest hour), one division
    * of exact longs. Batch form over raw events; the hour-of-day counts
    * are the SAME mergeable frame the daily-diversity family maintains
    * (Expectations.typeTimeCounts), so the streaming face serves this
    * from one shared state table. */
  def diurnalPeak(events: DataFrame, category: String = "event_type"): DataFrame =
    diurnalServe(graft.ops.Expectations.typeTimeCounts(events, category), category)

  /** The serve half of [[diurnalPeak]] over a (day, hour, category, c)
    * counts frame — live or merged from the streaming state seam. */
  def diurnalServe(counts: DataFrame, category: String = "event_type"): DataFrame =
    counts
      .groupBy(category, "hour").agg(sum("c").as("c"))
      .groupBy(category)
      .agg(sum("c").as("n"),
        max_by(col("hour"), struct(col("c"), -col("hour"))).as("peak_hour"),
        max(struct(col("c"), -col("hour"))).getField("c").as("peak_n"))
      .withColumn("peak_share", col("peak_n").cast("double") / col("n"))

  /** §2.5 humanized byte formatting (NiFiMetricsUtils.java:20-103): the
    * dashboard's B/KB/MB/GB rendering as a column expression. Thresholds
    * and one-decimal rounding mirror the reference. */
  def humanizeBytes(bytes: Column): Column = {
    // explicit half-up rounding BEFORE formatting: Java's %.1f rounds
    // half-up but C/DuckDB printf rounds half-to-even, and bytes/1024.0
    // is an exact dyadic double, so ties (x.x5) actually occur (~1/512) —
    // floor(v*10 + 0.5)/10 is bit-identical in both engines
    def r1(v: Column): Column = floor(v * 10.0 + 0.5) / 10.0
    when(bytes < 1024L, concat(bytes.cast("string"), lit(" B")))
      .when(bytes < 1024L * 1024,
        format_string("%.1f KB", r1(bytes.cast("double") / 1024.0)))
      .when(bytes < 1024L * 1024 * 1024,
        format_string("%.1f MB", r1(bytes.cast("double") / (1024.0 * 1024))))
      .otherwise(format_string("%.1f GB", r1(bytes.cast("double") / (1024.0 * 1024 * 1024))))
  }

  /** §2.5 inverse: parse a humanized byte string back to bytes
    * (NiFiMetricsUtils.java:38-82 — the dashboard round-trips formatted
    * values). Unknown units / garbage → null, matching the reference's
    * defensive parse. */
  def parseBytes(human: Column): Column = {
    val num = regexp_extract(human, "^([0-9]+(?:\\.[0-9]+)?) ", 1).try_cast("double")
    val unit = regexp_extract(human, " (B|KB|MB|GB|TB)$", 1)
    when(unit === "B", num)
      .when(unit === "KB", num * 1024.0)
      .when(unit === "MB", num * 1024.0 * 1024)
      .when(unit === "GB", num * 1024.0 * 1024 * 1024)
      .when(unit === "TB", num * 1024.0 * 1024 * 1024 * 1024)
      .otherwise(lit(null).cast("double"))
  }

  /** §2.5 duration humanization (NiFiMetricsUtils.java:85-103): millis →
    * "2h 5m" / "3m 12s" / "45s". */
  def humanizeDuration(millis: Column): Column = {
    val totalSec = (millis / 1000L).cast("long")
    val h = (totalSec / 3600L).cast("long")
    val m = ((totalSec % 3600L) / 60L).cast("long")
    val s = (totalSec % 60L).cast("long")
    when(h > 0, format_string("%dh %dm", h, m))
      .when(m > 0, format_string("%dm %ds", m, s))
      .otherwise(format_string("%ds", s))
  }

  /** Exact discrete quantiles per station (type-1 / lower quantile: the
    * element at rank ceil(p·n)). Unlike interpolated percentiles, the
    * picked value is an actual data point, so it is bit-identical across
    * engines — the deterministic way to derive per-key thresholds. */
  def discreteQuantiles(events: DataFrame, ps: Seq[Double] = Seq(0.5, 0.9)): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    val ranked = events
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
    val aggs = ps.map { p =>
      max(when(col("rn") === greatest(lit(1L), ceil(lit(p) * col("n"))), col("value")))
        .as(s"p${math.round(p * 100)}") // round, not truncate: 0.29*100 is 28.999…
    }
    ranked.groupBy("event_type").agg(aggs.head, aggs.tail: _*)
  }

  /** Equi-depth histogram edges per type in EXACT integer arithmetic —
    * the feature-binning staple: edge i is the ceil(i·n/bins)-th
    * smallest micro-quantized value, computed as the (i·n + bins − 1)
    * div bins rank (pure integer ceil — no doubles in the selection),
    * alongside the EXACT count of rows ≤ that edge (max row_number of
    * the edge's value group — with ties the count exceeds the nominal
    * depth, and emitting it makes tie inflation visible instead of
    * silently pretending depths are equal). One rank window + one
    * per-value aggregate; the explode ×bins filters on the ranks. */
  def equidepthBins(events: DataFrame, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"equidepthBins: bins=$bins must be >= 2")
    val q = events
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * 1000000.0).cast("long").as("qv"))
    val byType = Window.partitionBy("event_type")
    val ranked = q
      .withColumn("rn", row_number().over(byType.orderBy(col("qv"))))
      .withColumn("n", count(lit(1)).over(byType))
    val cumLe = q.groupBy("event_type", "qv")
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("n_le", sum(col("__cnt")).over(
        Window.partitionBy("event_type").orderBy(col("qv"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("event_type"), col("qv"), col("n_le"))
    ranked
      .select(col("event_type"), col("qv"), col("rn"), col("n"),
        explode(sequence(lit(1), lit(bins))).as("bin"))
      .filter(col("rn").cast("long") ===
        expr(s"(bin * n + ${bins - 1}) DIV $bins"))
      .select(col("event_type"), col("bin"), col("qv").as("edge_q"))
      .join(cumLe.withColumnRenamed("qv", "edge_q"), Seq("event_type", "edge_q"))
      .select("event_type", "bin", "edge_q", "n_le")
  }

  /** Robust per-type anomaly stats — median, MAD, and the heavy-tail
    * outlier count — in EXACT integer arithmetic end to end: values are
    * micro-quantized (the repo money rule), the median and the MAD are
    * both LOWER medians selected by rank ((n+1) div 2-th smallest — pure
    * integer selection, no interpolation for engines to disagree about),
    * deviations are integer absolute differences, and the outlier gate
    * dev > k·mad multiplies exact longs. The classic threshold-free
    * anomaly screen next to the reference's fixed threshold table (T11).
    *
    * Shape: two rank windows over the type partitioning + one broadcast
    * join of the one-row-per-type medians back to the quantized frame.
    * Skew note: a single giant event_type serializes its rank window —
    * at real scale pre-aggregate equal values (qv, count) first if types
    * are few and huge.
    *
    * Streaming disposition: exact rank-selected medians are NOT
    * mergeable state (unlike counts, sketches, or MG counters), so this
    * op deliberately has no streaming twin — the streaming answer to
    * "where is the distribution" is the mergeable GK sketch
    * (q_quantiles_approx) with its rank-error bound, not a pretend-exact
    * median. */
  def madOutliers(events: DataFrame, k: Long = 3L): DataFrame = {
    require(k >= 1L, s"madOutliers: k=$k must be >= 1")
    val q = events
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_type"), floor(col("value") * 1000000.0).cast("long").as("qv"))
    val byType = Window.partitionBy("event_type")
    val med = q
      .withColumn("rn", row_number().over(byType.orderBy(col("qv"))))
      .withColumn("n", count(lit(1)).over(byType))
      .filter(col("rn") === expr("(n + 1) DIV 2"))
      .select(col("event_type"), col("qv").as("med_q"))
    val dev = q.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("qv") - col("med_q")))
    val mad = dev
      .withColumn("rn", row_number().over(byType.orderBy(col("dev"))))
      .withColumn("n", count(lit(1)).over(byType))
      .filter(col("rn") === expr("(n + 1) DIV 2"))
      .select(col("event_type"), col("dev").as("mad_q"))
    dev.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), max("med_q").as("med_q"),
        max("mad_q").as("mad_q"),
        sum(when(col("dev") > lit(k) * col("mad_q"), 1L).otherwise(0L)).as("n_out"))
  }

  /** Event-time disorder audit — the batch statistic that SIZES the
    * streaming watermarks (streaming/StreamingMonitors picks lateness
    * bounds; this measures what the data actually needs): per type,
    * taking event_id as the arrival order, an event is late iff its
    * event time is behind the running max of everything that arrived
    * before it, and its lateness is that deficit. Reports the late
    * fraction and the worst lateness — a watermark below max_late_us
    * provably drops rows of this corpus. One rank window (running max
    * by arrival) + one aggregate, all integer micros until the single
    * rate division. */
  def disorderAudit(events: DataFrame): DataFrame = {
    val byArrival = Window.partitionBy("event_type").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .filter(col("event_type").isNotNull)
      .select(col("event_type"), col("event_id"), col("ts_us"))
      .withColumn("prev_max_us", max("ts_us").over(byArrival))
      .withColumn("late_us",
        when(col("prev_max_us") > col("ts_us"), col("prev_max_us") - col("ts_us"))
          .otherwise(0L))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("late_us") > 0L, 1L).otherwise(0L)).as("n_late"),
        max("late_us").as("max_late_us"))
      .withColumn("late_rate", col("n_late").cast("double") / col("n"))
  }

  /** Winsorized per-type mean — the robust-location companion to
    * [[madOutliers]]'s robust-spread screen: clamp values to the exact
    * rank-selected [p5, p95] cut points, then average. Same integer
    * discipline end to end: micro-quantized values, cut points selected
    * by pure integer rank ((n−1)·p div 100 + 1, zero interpolation),
    * clamping and the sum on exact longs; only the final rendering
    * divides (sum → double → /1e6 → /n, the unigram_lp order), so the
    * compared aggregate is engine-exact. The heavy-tail-immune mean a
    * pipeline alerts on when a few wild sensor spikes would swamp avg().
    *
    * Shape: ONE rank window over the type partitioning (both cut points
    * fall out of the same pass via conditional min/max — vs MAD's two
    * windows, since deviations need the median first), one broadcast
    * join of the per-type cuts, one aggregate. Same skew note as MAD. */
  def winsorizedStats(events: DataFrame, pLow: Long = 5L, pHigh: Long = 95L): DataFrame = {
    require(0L <= pLow && pLow < pHigh && pHigh <= 100L,
      s"winsorizedStats: need 0 <= pLow < pHigh <= 100, got [$pLow, $pHigh]")
    val q = events
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_type"), floor(col("value") * 1000000.0).cast("long").as("qv"))
    val byType = Window.partitionBy("event_type")
    val cuts = q
      .withColumn("rn", row_number().over(byType.orderBy(col("qv"))))
      .withColumn("n", count(lit(1)).over(byType))
      .filter(col("rn") === expr(s"(n - 1) * $pLow DIV 100 + 1") ||
        col("rn") === expr(s"(n - 1) * $pHigh DIV 100 + 1"))
      .groupBy("event_type").agg(min("qv").as("lo_q"), max("qv").as("hi_q"))
    q.join(broadcast(cuts), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), max("lo_q").as("lo_q"), max("hi_q").as("hi_q"),
        sum(least(greatest(col("qv"), col("lo_q")), col("hi_q"))).as("sum_w_q"))
      .withColumn("mean_w",
        col("sum_w_q").cast("double") / 1000000.0 / col("n"))
  }

  /** Empirical-CDF (quantile) normalization — the rank-based feature
    * transform that makes per-type values comparable across wildly
    * different scales (the percentile-normalize step before mixing
    * heterogeneous signals into one model): each event's value maps to
    * the fraction of its type at or below it. Exact integers up to the
    * one division: the ≤-count is a RANGE-frame window count (peers
    * included, so ties share one deterministic position — no
    * row_number arbitrariness to diverge between engines), n is the
    * partition count, and cdf = n_le/n is a single double division of
    * exact longs. Same one-rank-window shape and skew note as MAD. */
  def quantileNormalize(events: DataFrame): DataFrame = {
    val q = events
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_id"), col("event_type"),
        floor(col("value") * 1000000.0).cast("long").as("qv"))
    val le = Window.partitionBy("event_type").orderBy("qv")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    q.withColumn("n_le", count(lit(1)).over(le))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .withColumn("cdf", col("n_le").cast("double") / col("n"))
  }

  /** Pearson correlation between value and hour-of-day per type, exact
    * until the last operation: both variables are integers (micro-
    * quantized value, hour 0-23), every moment (Σx, Σy, Σxy, Σx², Σy²)
    * is an exact integer sum, and the textbook combination
    * n·Σxy − Σx·Σy runs in DECIMAL(38,0) — n·Σxy alone can pass 2^63 —
    * so both engines hold bit-identical integers right up to the final
    * double division and IEEE-754 sqrt (both correctly rounded, hence
    * deterministic). Spark's own corr() streams doubles and is NOT
    * reproducible across engines — that is exactly why this shape
    * exists. Degenerate variance yields null, never NaN. */
  def valueHourCorr(events: DataFrame): DataFrame = {
    val q = events
      .filter(col("event_type").isNotNull && col("value").isNotNull &&
        col("ts_us").isNotNull)
      .select(col("event_type"),
        floor(col("value") * 1000000.0).cast("long").as("x"),
        // sign-following % + integral DIV, same rule family as the
        // CUSUM bucket — no float intermediary anywhere
        expr("ts_us % 86400000000 DIV 3600000000").cast("long").as("y"))
    val d = (c: Column) => c.cast("decimal(38,0)")
    q.groupBy("event_type")
      // x² reaches 10^22 — past Long — so the x-bearing products run in
      // decimal per row (the oracle mirrors with HUGEINT); y² ≤ 529
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(d(col("x")) * d(col("y"))).as("sxy"),
        sum(d(col("x")) * d(col("x"))).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("num", d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy")))
      .withColumn("dx", d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx")))
      .withColumn("dy", d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy")))
      .withColumn("corr_xy",
        when(col("dx") === 0 || col("dy") === 0, lit(null).cast("double"))
          .otherwise(col("num").cast("double") /
            sqrt(col("dx").cast("double") * col("dy").cast("double"))))
      .select("event_type", "n", "corr_xy")
  }

  /** Per-type extreme values — the "show me the actual spikes" query an
    * operator runs after any screen (MAD, winsorize, CUSUM) flags a
    * type: the k lowest and k highest readings with their event ids.
    * Both sides rank by the (micro-quantized value, event_id) tuple, so
    * duplicate readings order deterministically; the raw double rides
    * along per-row. Two rank windows over one shuffle. */
  def valueExtremes(events: DataFrame, k: Int = 3): DataFrame = {
    require(k >= 1, s"valueExtremes: k=$k must be >= 1")
    val q = events
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_type"), col("event_id"), col("value"),
        floor(col("value") * 1000000.0).cast("long").as("qv"))
    val byType = Window.partitionBy("event_type")
    val low = q
      .withColumn("rank",
        row_number().over(byType.orderBy(col("qv"), col("event_id"))).cast("long"))
      .filter(col("rank") <= k).withColumn("side", lit("low"))
    val high = q
      .withColumn("rank",
        row_number().over(byType.orderBy(col("qv").desc, col("event_id").desc)).cast("long"))
      .filter(col("rank") <= k).withColumn("side", lit("high"))
    low.unionByName(high).select("event_type", "side", "rank", "event_id", "value")
  }

  /** Spearman-flavored rank correlation between value and hour-of-day —
    * the monotone-robust companion to [[valueHourCorr]]: Pearson's
    * formula applied to the value's within-type RANK instead of the
    * value itself, so one wild sensor spike moves x by one rank, not
    * five orders of magnitude. Ties take the MIN rank (`rank()`), not
    * the textbook tie-averaged fractional rank — average ranks would
    * reintroduce non-integer arithmetic, and the min-rank convention is
    * deterministic, engine-identical, and monotone-invariant, which is
    * the property actually wanted. Same decimal(38,0) moment
    * discipline, single double division + correctly-rounded sqrt as
    * the exact-moment form; same skew note (one giant type serializes
    * its rank window). */
  def valueHourRankCorr(events: DataFrame): DataFrame = {
    val q0 = events
      .filter(col("event_type").isNotNull && col("value").isNotNull &&
        col("ts_us").isNotNull)
      .select(col("event_type"),
        floor(col("value") * 1000000.0).cast("long").as("qv"),
        expr("ts_us % 86400000000 DIV 3600000000").cast("long").as("y"))
    val q = q0.withColumn("x",
      rank().over(Window.partitionBy("event_type").orderBy("qv")).cast("long"))
    val d = (c: Column) => c.cast("decimal(38,0)")
    q.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(d(col("x")) * d(col("y"))).as("sxy"),
        sum(d(col("x")) * d(col("x"))).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("num", d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy")))
      .withColumn("dx", d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx")))
      .withColumn("dy", d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy")))
      .withColumn("rank_corr",
        when(col("dx") === 0 || col("dy") === 0, lit(null).cast("double"))
          .otherwise(col("num").cast("double") /
            sqrt(col("dx").cast("double") * col("dy").cast("double"))))
      .select("event_type", "n", "rank_corr")
  }

  /** Sketch-based distinct: HyperLogLog++ via approx_count_distinct — at
    * 100 TB an exact distinct over a high-cardinality key is a massive
    * shuffle, while the sketch is mergeable constant-size state per
    * partition. Engine-specific estimates can't hash-match an oracle, so
    * this is spec-checked against the exact count (relative error bound
    * driven by rsd). */
  def approxDistinct(events: DataFrame, keyCol: String, byCol: String,
                     rsd: Double = 0.02): DataFrame =
    events.groupBy(byCol)
      .agg(
        approx_count_distinct(col(keyCol), rsd).as("approx_distinct"),
        countDistinct(col(keyCol)).as("exact_distinct"))

  /** Sketch-based percentiles: percentile_approx (Greenwald-Khanna) — the
    * quantile member of the sketch family next to [[approxDistinct]]'s
    * HLL. At 100 TB the exact discrete quantile pays a per-key global
    * sort; the GK sketch is mergeable bounded-size state with a RANK
    * error guarantee of n/accuracy. Engine sketches differ by algorithm,
    * so like approxDistinct this is spec-checked against
    * [[discreteQuantiles]] (rank distance of the returned value bounded
    * by the accuracy guarantee) instead of hash-compared to an oracle. */
  def approxQuantiles(events: DataFrame, ps: Seq[Double] = Seq(0.5, 0.9),
                      accuracy: Int = 10000): DataFrame = {
    val aggs = ps.map(p =>
      percentile_approx(col("value"), lit(p), lit(accuracy))
        .as(s"p${math.round(p * 100)}_approx"))
    events.groupBy("event_type").agg(aggs.head, aggs.tail: _*)
  }

  /** Sessionization: split each user's event stream into sessions at
    * inactivity gaps — two stacked window functions (gap flag via lag,
    * session id via running sum), both partitioned by user so state never
    * leaves the key's partition. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessionIntervals(events, gapMinutes)
      .select(
        col("user_id"), col("session_seq"), col("n_events"),
        ((col("end_us") - col("start_us")) / lit(1000000L)).cast("double").as("duration_sec"))

  /** Session bounds per (user, session_seq) — the interval form consumed by
    * TimeSeries.rangeJoin; sessionize is its duration projection. */
  def sessionIntervals(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("prev_us", lag("ts_us", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"),
        max("ts_us").as("end_us"))
  }

  /** Trailing time-window stats: each event's 1-hour-lookback mean and
    * count within its event_type — the RANGE-frame window shape (frame
    * bounds in event-time units, not row counts; rows arriving in a burst
    * share a frame regardless of how many there are). Sum runs over
    * decimal, not double: both engines aggregate a window frame in
    * whatever association order their segment-tree picks, and decimal
    * addition is the one that's exact under every order. */
  def trailingStats(events: DataFrame, lookbackUs: Long = 3600L * 1000000L): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("ts_us")
      .rangeBetween(-lookbackUs, Window.currentRow)
    events.select(
      col("event_id"), col("event_type"),
      (sum(col("value").cast("decimal(18,4)")).over(w).cast("double") /
        count(lit(1)).over(w)).as("trailing_avg"),
      count(lit(1)).over(w).as("n_window"))
  }

  /** T14: station list projection (code/name/address). */
  def stationList(dim: DataFrame): DataFrame =
    dim.select(
      col("wlobscd").as("code"),
      col("obsnm").as("name"),
      col("addr").as("address"))

  /** S6 + T15: point lookup with `_id`→observationCode remap. On a
    * broadcast-sized dim this is a partition-pruned local filter. */
  def stationDetail(dim: DataFrame, code: String): DataFrame =
    dim.filter(col("wlobscd") === code)
      .select(
        col("wlobscd").as("observation_code"),
        col("obsnm").as("name"), col("addr").as("address"),
        col("attwl"), col("wrnwl"), col("almwl"), col("srswl"))

  /** Inline pipeline metrics via `observe` (CollectMetrics): the
    * reference's per-processor counters (NiFi queue/processor stats it
    * polls over REST) as zero-cost instrumentation — the aggregates ride
    * the existing pass as accumulator-style partials, adding NO scan, NO
    * shuffle, and NO action of their own, and surface on the driver via
    * `queryExecution.observedMetrics` (batch — on the QueryExecution that
    * actually runs; writes plan their own QE, so production write paths
    * read them from a QueryExecutionListener) or
    * `StreamingQueryProgress.observedMetrics` (per micro-batch). The
    * default metric set is the ingest health trio: rows seen, rows
    * missing both measurements, parse-clean fraction denominators. */
  def withIngestMetrics(df: DataFrame, name: String = "graft_ingest"): DataFrame =
    df.observe(name,
      count(lit(1)).as("n_rows"),
      sum(when(col("water_level").isNull && col("flow_rate").isNull, 1L)
        .otherwise(0L)).as("n_no_measurement"),
      sum(when(col("observation_time").isNull, 1L).otherwise(0L)).as("n_bad_time"))
}
