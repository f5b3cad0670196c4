package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Time-series joins over the events stream. The reference joins each
  * observation to dimension state current *at processing time*
  * (hrfco-kafka-streams WaterLevelProcessor holds the latest station map in
  * memory); the batch/analytics generalization of that lookup is the as-of
  * join: attach, to every left row, the right row with the greatest
  * timestamp <= the left row's timestamp within the same key.
  */
object TimeSeries {

  /** Exact integer floor division for bucket ids. SQL `div` truncates
    * toward zero, which would fold pre-epoch timestamps in (-b, b) into one
    * bucket 0 and break bucket monotonicity; all tested data is epoch-micros
    * (non-negative) so this only matters for exotic domains, but floor is
    * cheap and unconditionally correct. Never double division: at
    * epoch-micros magnitude a double quotient can round across an integer
    * boundary and silently misplace a point within ~100µs of a bucket edge. */
  private[graft] def floorDiv(x: Column, b: Long): Column =
    // x - pmod(x,b) is the exact greatest multiple of b <= x, so the
    // truncating SQL `div` of it IS floor division — all integer arithmetic
    call_function("div", x - pmod(x, lit(b)), lit(b))

  /** Interval side of the bucketed range join: one row per (interval,
    * overlapped bucket). Exposed package-private so specs can count the
    * replication a bucket size actually produces. */
  private[graft] def explodeToBuckets(
      intervals: DataFrame, startCol: String, endCol: String, bucketUs: Long): DataFrame =
    intervals.withColumn("__bucket",
      explode(sequence(floorDiv(col(startCol), bucketUs), floorDiv(col(endCol), bucketUs))))

  /** Scale-safe as-of join, union + window form.
    *
    * For every `left` row, attaches the columns of the `right` row with the
    * greatest `tsCol` <= the left row's `tsCol` (inclusive-prior, i.e.
    * DuckDB/pandas ASOF semantics) sharing the same `keys`; left rows with
    * no prior right row keep the left-join shape (null payload). Output has
    * exactly one row per left row: left columns unchanged, plus
    * `prefix<col>` for each carried right column.
    *
    * Why not a range join: `l JOIN r ON l.k = r.k AND l.ts >= r.ts` + argmax
    * builds O(|L|·|R|) intermediate rows per key before pruning — quadratic
    * in the hot keys, fatal at 100 TB. This form instead tags the sides,
    * unions them, and runs ONE window pass: a single shuffle of |L|+|R|
    * rows on `keys`, a linear scan per key, O(1) carried state (the last
    * right payload seen). It is the sorted-merge as-of plan expressed
    * declaratively, so Catalyst keeps whole-stage codegen and AQE sizes the
    * exchange.
    *
    * Determinism: within a key, rows order by (`tsCol`, side, `tieCol`)
    * with right rows BEFORE left rows at equal timestamps — that ordering
    * IS the inclusive `>=` boundary. Among right rows tied on (key, ts),
    * the greatest `tieCol` wins. The carried payload travels as ONE struct,
    * so `last(_, ignoreNulls)` can never stitch columns from different
    * right rows when a payload field is legitimately null.
    *
    * Skew: a hot key serializes into one task, like any keyed window. If a
    * single key's row count outgrows a task at cluster scale, pre-bucket by
    * coarse time range and carry each bucket's final right row into the
    * next bucket's head — the standard two-pass refinement; not needed at
    * bench SFs.
    *
    * `keys`, `tsCol`, `tieCol` must exist on BOTH sides; (`tsCol`,
    * `tieCol`) must totally order rows within a key on each side.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tieCol: String,
      payload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    val carried = (payload ++ Seq(tsCol, tieCol)).distinct
    val carriedType = StructType(carried.map(c => right.schema(c).copy(name = c)))
    val orderCols = keys ++ Seq(tsCol, tieCol)
    val leftCols = left.columns.toSeq

    // identical select order on both branches: left columns, payload
    // struct, side tag (right=0 sorts before left=1 at equal ts)
    val leftBranch = left.select(
      leftCols.map(col) ++ Seq(
        lit(null).cast(carriedType).as("__asof"), lit(1).as("__side")): _*)
    val rightBranch = right.select(
      leftCols.map { c =>
        if (orderCols.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } ++ Seq(
        struct(carried.map(col): _*).as("__asof"), lit(0).as("__side")): _*)

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    leftBranch.unionByName(rightBranch)
      .withColumn("__match", last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        carried.map(c => col("__match").getField(c).as(s"$prefix$c")): _*)
  }

  /** The hot-key refinement of `asofJoin`: identical output, but no single
    * task ever holds a whole key. The plain form serializes each key into
    * one window task — correct until one key's row count outgrows a task
    * at cluster scale. This variant runs three bounded stages:
    *
    *  1. per-(key, time-bucket) last right payload — ONE parallel aggregate
    *     over the tagged union (`max_by` over the (ts, tie) order, null
    *     ordering for left rows), which doubles as the bucket census:
    *     buckets holding only left rows summarize to a null payload, so no
    *     separate distinct() shuffle is needed to materialize them;
    *  2. carry-in per bucket: the last payload of any STRICTLY EARLIER
    *     bucket, a window over the per-bucket summary (rows per key =
    *     #buckets, not #events — right-empty buckets included via their
    *     null summaries, so a carry can cross them);
    *  3. within-bucket as-of windowed by (key, bucket) — the hot key now
    *     spreads across #buckets tasks — seeded with the bucket's carry-in
    *     for left rows preceding every in-bucket right row.
    *
    * Costs one extra shuffle and an aggregate vs `asofJoin`; worth it only
    * when keys are hot enough to straggle. Equality with `asofJoin` is
    * spec-asserted (TimeSeriesSpec) — same inclusive `>=` boundary, same
    * (ts, side, tie) total order, same struct-carried payload. */
  def asofJoinBucketed(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tieCol: String,
      payload: Seq[String],
      bucketUs: Long = 3600L * 1000000L,
      prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "asofJoinBucketed needs at least one key column")
    val carried = (payload ++ Seq(tsCol, tieCol)).distinct
    val carriedType = StructType(carried.map(c => right.schema(c).copy(name = c)))
    val orderCols = keys ++ Seq(tsCol, tieCol)
    val leftCols = left.columns.toSeq
    val keyCols = keys.map(col)

    val leftBranch = left.select(
      leftCols.map(col) ++ Seq(
        lit(null).cast(carriedType).as("__asof"), lit(1).as("__side")): _*)
    val rightBranch = right.select(
      leftCols.map { c =>
        if (orderCols.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } ++ Seq(
        struct(carried.map(col): _*).as("__asof"), lit(0).as("__side")): _*)
    val unioned = leftBranch.unionByName(rightBranch)
      .withColumn("__bucket", floorDiv(col(tsCol), bucketUs))

    // 1. parallel per-bucket summary over the UNION: one aggregate yields
    //    every (key, bucket) present on either side AND the bucket's last
    //    right payload (max_by skips rows whose ordering is null, so left
    //    rows contribute the bucket's existence but never a payload — a
    //    right-empty bucket summarizes to null and the carry can cross it).
    //    Folding the bucket census in here saves the full second
    //    |L|+|R|-row distinct() shuffle the census used to cost.
    val bucketLast = unioned
      .groupBy(keyCols :+ col("__bucket"): _*)
      .agg(max_by(col("__asof"),
        when(col("__side") === 0, struct(col(tsCol), col(tieCol)))).as("__last"))
    // 2. carry-in across buckets (frame excludes the current bucket)
    val carryW = Window.partitionBy(keyCols: _*).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = bucketLast
      .withColumn("__carry", last(col("__last"), ignoreNulls = true).over(carryW))
      .select(keyCols ++ Seq(col("__bucket"), col("__carry")): _*)
    // 3. within-bucket as-of, seeded by the carry-in
    val w = Window
      .partitionBy(keyCols :+ col("__bucket"): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned.join(carryIn, keys :+ "__bucket")
      .withColumn("__match",
        coalesce(last(col("__asof"), ignoreNulls = true).over(w), col("__carry")))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        carried.map(c => col("__match").getField(c).as(s"$prefix$c")): _*)
  }

  /** Scale-safe interval (range) join via time bucketing: inner-joins each
    * `points` row to every `intervals` row of the same `keys` whose
    * [`startCol`, `endCol`] contains `ptsCol` (both ends inclusive).
    *
    * A literal `p.ts BETWEEN i.start AND i.end` range predicate gives Spark
    * no equi-key and degenerates to BroadcastNestedLoopJoin — O(|P|·|I|)
    * per key. Instead each interval is exploded to the coarse time buckets
    * it overlaps (`sequence(start div b, end div b)`) and each point to the
    * ONE bucket containing it, turning the range predicate into an
    * equi-join on (keys, bucket) + a residual filter. Replication factor is
    * interval_length/bucketUs + 1 — bounded, and tunable to the workload's
    * median interval. Each qualifying (point, interval) pair joins in
    * exactly one bucket (the point's), so no post-join dedup is needed.
    *
    * Bucket ids use integer floor division (see floorDiv), never double
    * division: at epoch-micros magnitude a double quotient can round across
    * an integer boundary and silently misplace a point within ~100µs of a
    * bucket edge.
    *
    * Replication is linear in interval length, so a degenerate tail (one
    * year-long interval at the default 1 h bucket → ~8,760 rows) is the
    * scale risk — [[rangeJoinGuarded]] bounds it and is the production
    * default; this single-granularity form is the building block.
    *
    * Non-key column names must be disjoint between the two sides (the
    * query selects from both).
    */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      ptsCol: String,
      startCol: String,
      endCol: String,
      bucketUs: Long = 3600L * 1000000L): DataFrame = {
    require(keys.nonEmpty, "rangeJoin needs at least one key column")
    points
      .withColumn("__bucket", floorDiv(col(ptsCol), bucketUs))
      .join(explodeToBuckets(intervals, startCol, endCol, bucketUs), keys :+ "__bucket")
      .filter(col(ptsCol) >= col(startCol) && col(ptsCol) <= col(endCol))
      .drop("__bucket")
  }

  /** [[rangeJoin]] with bounded replication under a degenerate interval
    * tail. Intervals spanning fewer than `maxBucketsPerInterval` fine
    * buckets take the plain bucketed path (replication ≤
    * maxBucketsPerInterval); longer ones — the tail that would explode, a
    * year-long interval being ~8,760 fine buckets — are exploded at the
    * COARSE granularity `bucketUs · maxBucketsPerInterval` instead, cutting
    * their replication by that factor (the year-long interval: ~138 rows at
    * the defaults). Worst-case per-interval replication is therefore
    * max(maxBucketsPerInterval, len/(bucketUs·maxBucketsPerInterval) + 1)
    * instead of len/bucketUs + 1; more tiers would tighten the bound
    * logarithmically but two covers every realistic tail.
    *
    * Exactly-once still holds: each interval lives in exactly ONE branch,
    * and within a branch a point joins only the single bucket containing it.
    * The coarse branch re-scans the points side, but its interval side is
    * the tail — typically tiny or empty — so AQE broadcasts it and the
    * second pass is a cheap map-side join, no extra shuffle of points. */
  def rangeJoinGuarded(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      ptsCol: String,
      startCol: String,
      endCol: String,
      bucketUs: Long = 3600L * 1000000L,
      maxBucketsPerInterval: Int = 64): DataFrame = {
    require(maxBucketsPerInterval > 1, "maxBucketsPerInterval must exceed 1")
    val span = floorDiv(col(endCol), bucketUs) - floorDiv(col(startCol), bucketUs)
    val shortSide = intervals.filter(span < maxBucketsPerInterval)
    val longSide = intervals.filter(span >= maxBucketsPerInterval)
    val coarseUs = bucketUs * maxBucketsPerInterval
    rangeJoin(points, shortSide, keys, ptsCol, startCol, endCol, bucketUs)
      .unionByName(rangeJoin(points, longSide, keys, ptsCol, startCol, endCol, coarseUs))
  }

  /** SCD2 validity intervals from a versioned dimension feed: version v
    * of a key is current on [v.ts, next_version.ts), the open-ended last
    * version has valid_to null — the standard slowly-changing-dimension
    * history table, and the batch face of the interval rewrite
    * streaming/StreamingMonitors.asofStreamStatic performs inline (an
    * as-of join against the result is a plain interval-containment join,
    * no per-event argmax). Same-timestamp versions pre-reduce to the
    * greatest tieCol (the as-of tie rule); null keys and null timestamps
    * are excluded explicitly (a version without a key or an effective
    * time is meaningless, and the two engines disagree on null window
    * ordering). One window pair over the versions — at scale this is a
    * single hash exchange of the dimension feed, nothing touches a fact. */
  def validityIntervals(versions: DataFrame, keys: Seq[String], tsCol: String,
                        tieCol: String, payload: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "validityIntervals needs at least one key column")
    val clean = versions.filter(
      keys.map(col(_).isNotNull).reduce(_ && _) && col(tsCol).isNotNull)
    val tieW = Window.partitionBy((keys :+ tsCol).map(col): _*).orderBy(col(tieCol).desc)
    val validW = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    clean
      .withColumn("__vrank", row_number().over(tieW)).filter(col("__vrank") === 1)
      .withColumn("valid_to", lead(col(tsCol), 1).over(validW))
      .select(keys.map(col) ++ Seq(col(tsCol).as("valid_from"), col("valid_to")) ++
        payload.filterNot(c => keys.contains(c) || c == tsCol).map(col): _*)
  }

  /** Nearest-event join: for every left row, the right row with the
    * MINIMUM |Δt| within the key — either direction (the sensor-alignment
    * shape; as-of is its backward-only half). ONE pass over the tagged
    * union: both directions are windows over the SAME key partitioning —
    * backward = `last(payload)` over (unboundedPreceding, current],
    * forward = `first(payload)` over [current, unboundedFollowing) — so
    * the whole operator costs a single hash exchange and zero join
    * operators (plan-contracted like as-of; the second window only adds
    * an in-partition re-sort). The earlier two-as-of-passes + re-join
    * form cost two shuffles and required (keys, tieCol) to uniquely
    * identify left rows; this form has no such precondition.
    *
    * Tie policy, mirrored by the oracle: candidates order by
    * (|Δt|, tieCol) ascending, so equidistant prior/next resolve to the
    * smaller tiebreak, and ties WITHIN a timestamp do too. Each window's
    * ordering encodes its inclusive boundary and tie rule: backward
    * orders (ts asc, right-before-left, tieCol DESC) so `last` lands on
    * the smallest-tie right row at the greatest ts <= left.ts; forward
    * orders (ts asc, LEFT-before-right, tieCol asc) so equal-ts right
    * rows fall inside the forward frame and `first` lands on the
    * smallest-tie right row at the least ts >= left.ts. An equal-ts
    * right row is both candidates at distance 0 — the pick is identical
    * either way. */
  def nearestJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tieCol: String,
      payload: Seq[String],
      prefix: String = "nearest_"): DataFrame = {
    require(keys.nonEmpty, "nearestJoin needs at least one key column")
    val carried = (payload ++ Seq(tsCol, tieCol)).distinct
    val carriedType = StructType(carried.map(c => right.schema(c).copy(name = c)))
    val orderCols = keys ++ Seq(tsCol, tieCol)
    val leftCols = left.columns.toSeq

    val leftBranch = left.select(
      leftCols.map(col) ++ Seq(
        lit(null).cast(carriedType).as("__asof"), lit(1).as("__side")): _*)
    val rightBranch = right.select(
      leftCols.map { c =>
        if (orderCols.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } ++ Seq(
        struct(carried.map(col): _*).as("__asof"), lit(0).as("__side")): _*)

    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col(tieCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the forward pick runs over the REVERSED ordering with an unbounded-
    // PRECEDING frame: Spark's unbounded-FOLLOWING frame re-scans the
    // partition tail per row (O(n²) in partition size — measured 176 s on
    // a 30k-row partition); the reversed accumulation is one O(n) pass
    // and selects the identical row (last-before-current in reverse order
    // == first-after-current in forward order)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).desc, col("__side").asc, col(tieCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val picked = leftBranch.unionByName(rightBranch)
      .withColumn("__b", last(col("__asof"), ignoreNulls = true).over(wB))
      .withColumn("__f", last(col("__asof"), ignoreNulls = true).over(wF))
      .filter(col("__side") === 1)
    val dB = col(tsCol) - col("__b").getField(tsCol)
    val dF = col("__f").getField(tsCol) - col(tsCol)
    val pickBack = col("__f").isNull ||
      (col("__b").isNotNull &&
        struct(dB.as("d"), col("__b").getField(tieCol).as("t")) <=
          struct(dF.as("d"), col("__f").getField(tieCol).as("t")))
    picked.select(leftCols.map(col) ++
      carried.map(c =>
        when(pickBack, col("__b").getField(c))
          .otherwise(col("__f").getField(c)).as(s"$prefix$c")) :+
      when(pickBack, dB).otherwise(dF).as(s"${prefix}dist"): _*)
  }

  /** Range-join query: purchases landing within `padUs` of the same user's
    * browse sessions (sessions built from click/view events only, so
    * containment is not tautological). The pad makes this an attribution
    * window — and since adjacent padded windows can overlap, a purchase may
    * legitimately attribute to several sessions (the inner join keeps every
    * qualifying pair). `offset_us` is measured from the UNPADDED session
    * start; negative means the purchase preceded the session. */
  def purchasesInSessions(events: DataFrame, padUs: Long = 3600L * 1000000L): DataFrame = {
    val sessions = Monitoring
      .sessionIntervals(events.filter(col("event_type").isin("click", "view")))
      .select(
        col("user_id"), col("session_seq"), col("start_us"),
        (col("start_us") - padUs).as("win_start_us"),
        (col("end_us") + padUs).as("win_end_us"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_us", "value")
    rangeJoinGuarded(purchases, sessions, Seq("user_id"), "ts_us", "win_start_us", "win_end_us")
      .select(
        col("user_id"), col("session_seq"), col("event_id"),
        col("value").as("purchase_value"),
        (col("ts_us") - col("start_us")).as("offset_us"))
  }

  /** Attribution query over the events stream: each purchase joined as-of
    * to the same user's most recent prior view. The analytics shape of the
    * reference's "current state at event time" lookup, over the synthetic
    * clickstream. */
  def purchaseAttribution(events: DataFrame, bucketUs: Option[Long] = None): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
    val views = events.filter(col("event_type") === "view")
    val joined = bucketUs match {
      case Some(b) => asofJoinBucketed(purchases, views, Seq("user_id"), "ts_us", "event_id",
        payload = Seq("event_id", "value"), bucketUs = b)
      case None => asofJoin(purchases, views, Seq("user_id"), "ts_us", "event_id",
        payload = Seq("event_id", "value"))
    }
    joined
      .select(
        col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
        col("value").as("purchase_value"),
        col("asof_event_id").as("view_event_id"),
        col("asof_value").as("view_value"),
        (col("ts_us") - col("asof_ts_us")).as("lag_us"))
  }

  /** Resample to a regular hourly grid with forward fill — the time-series
    * store staple (downsample + gap-fill) the reference's dashboard
    * queries approximate with application code. Every (key, hour) bucket
    * between the corpus's first and last hour gets a row: observed buckets
    * carry their count and LAST observation (max (ts, id) — deterministic
    * under ties), empty buckets carry n_obs = 0 and the most recent
    * earlier value per key (null before a key's first observation).
    *
    * Scale shape: the dense grid is keys × hours — a dimension-sized
    * frame built from a distinct + a generated sequence, never from the
    * fact; the fact aggregates once into hourly partials (map-side
    * combine) and left-joins the grid. The forward fill is one window per
    * key over the GRID (bounded rows), not over the fact. The [lo, hi]
    * bounds are two scalars from one aggregate — driver state is O(1). */
  def resampleHourly(events: DataFrame, keyCol: String = "event_type",
                     tsCol: String = "ts", idCol: String = "event_id",
                     valCol: String = "value"): DataFrame = {
    // Null keys are excluded EXPLICITLY (mirroring the null-ts handling):
    // the grid⋈hourly equi-join below is not null-safe, so a null key
    // would otherwise produce a silent all-empty grid row (n_obs=0,
    // filled_value null) rather than resampling its observations.
    val events0 = events.filter(col(keyCol).isNotNull)
    val bounds = events0
      .agg(date_trunc("hour", min(col(tsCol))).as("lo"),
           date_trunc("hour", max(col(tsCol))).as("hi")).head()
    if (bounds.isNullAt(0)) {
      // empty (or all-null-time) input: no grid — sequence(null, null)
      // would not even analyze
      import org.apache.spark.sql.types._
      return events.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(Seq(
          StructField(keyCol, events.schema(keyCol).dataType),
          StructField("bucket", StringType),
          StructField("n_obs", LongType, nullable = false),
          StructField("filled_value", events.schema(valCol).dataType))))
    }
    val (lo, hi) = (bounds.getTimestamp(0), bounds.getTimestamp(1))
    val grid = events0.select(col(keyCol)).distinct()
      .select(col(keyCol),
        explode(sequence(lit(lo), lit(hi), expr("INTERVAL 1 HOUR"))).as("bucket"))
    val hourly = events0
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n_obs"),
        max_by(col(valCol), struct(col(tsCol), col(idCol))).as("last_value"))
    grid.join(hourly, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        last(col("last_value"), ignoreNulls = true)
          .over(Window.partitionBy(keyCol).orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("filled_value"))
      .select(col(keyCol),
        date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("n_obs"), col("filled_value"))
  }

  /** Hourly resampling with LINEAR interpolation — the sensor-data
    * companion to [[resampleHourly]]'s step fill: the value AT each grid
    * instant is interpolated between the latest observation at-or-before
    * it and the earliest one strictly after; null outside the key's
    * observed range (no extrapolation). Among same-timestamp observations
    * the greatest (ts, id) wins, matching the step fill's tie rule.
    *
    * Single-pass shape (the nearestJoin pattern): grid and observation
    * rows UNION into one frame, one window per direction over the
    * ordering (ts, side, id) — observations sort before the grid instant
    * they coincide with, so an exact-time observation is the "previous"
    * endpoint and the weight degenerates to 0 (the interpolation then
    * returns it bit-exactly). No join of the fact against the grid at
    * all; two window passes over keys × (hours + observations). The
    * weight arithmetic is micros-exact integer differences divided once
    * in double — engine-portable. */
  def resampleHourlyInterp(events: DataFrame, keyCol: String = "event_type",
                           tsCol: String = "ts", idCol: String = "event_id",
                           valCol: String = "value"): DataFrame = {
    val events0 = events.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
    val bounds = events0
      .agg(date_trunc("hour", min(col(tsCol))).as("lo"),
           date_trunc("hour", max(col(tsCol))).as("hi")).head()
    if (bounds.isNullAt(0)) {
      import org.apache.spark.sql.types._
      return events.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(Seq(
          StructField(keyCol, events.schema(keyCol).dataType),
          StructField("bucket", StringType),
          StructField("interp_value", DoubleType))))
    }
    val (lo, hi) = (bounds.getTimestamp(0), bounds.getTimestamp(1))
    val grid = events0.select(col(keyCol)).distinct()
      .select(col(keyCol),
        explode(sequence(lit(lo), lit(hi), expr("INTERVAL 1 HOUR"))).as("bucket"))
      .select(col(keyCol), col("bucket"), unix_micros(col("bucket")).as("t_us"))
    interpolateAt(grid, events0, keyCol, "t_us", tsCol, idCol, valCol)
      .select(col(keyCol),
        date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("interp_value"))
  }

  /** Point-in-time LINEAR interpolation join — the general form behind
    * [[resampleHourlyInterp]], and the training-time feature-attach
    * shape: for every query row, the observation series' value AT the
    * query instant, interpolated between the latest observation
    * at-or-before it and the earliest strictly after; null outside the
    * key's observed range (no extrapolation); an exact-time observation
    * passes through bit-exactly (including at the range end). Among
    * same-timestamp observations the greatest (ts, id) wins.
    *
    * Single-pass: queries and observations UNION into one frame, one
    * window per direction over (ts, side, id) — no join of the fact
    * against the queries. Null-valued observations are dropped up front
    * so both interpolation endpoints come from the SAME row (`v` is
    * non-null iff the row is an observation). Output: the query frame's
    * columns plus `interp_value`. */
  /** Weighted CUSUM drift detection over hourly buckets, in EXACT
    * integer arithmetic end to end. The classic recursive form
    * S_t = max(0, S_{t-1} + x_t) cannot be written as a plain window —
    * but it EQUALS P_t − min_{i≤t} P_i for P = the running sum of x
    * (the floor-at-zero resets exactly where the prefix minimum
    * updates), so two cumulative windows compute it in any engine with
    * no recursion.
    *
    * x_t = swq_t − k·n_t, where swq/n are the hour's micro-quantized
    * value sum and count and k is the corpus-wide reference level
    * floor(Σqv div N) — so x_t is n_t·(mean_t − k) in integer units:
    * hours drifting above the reference accumulate, quiet hours decay
    * the statistic through the prefix minimum. `threshold` flags
    * S_t > threshold·k·n̄ scaled equivalently in integers (documented
    * in-line) — every comparison is Long arithmetic, no doubles
    * anywhere until the serving projection. */
  def cusumDrift(events: DataFrame, keyCol: String = "event_type",
                 thresholdNum: Long = 1L, thresholdDen: Long = 10L): DataFrame =
    cusumServe(hourlyQuantized(events, keyCol), thresholdNum, thresholdDen)

  /** The mergeable half of [[cusumDrift]]: per-(key, hour) quantized
    * value sums and counts — plain sums, so a bucket whose events
    * straddle micro-batches merges EXACTLY (unlike the basket pairs,
    * the grain here is a single event; there is nothing a split can
    * sever). The streaming face maintains this frame through the
    * versioned state seam and serves the sequential statistic from it. */
  def hourlyQuantized(events: DataFrame, keyCol: String = "event_type"): DataFrame =
    events
      .filter(col(keyCol).isNotNull && col("value").isNotNull && col("ts_us").isNotNull)
      .select(col(keyCol).as("key"),
        // sign-following % (not pmod): matches SQL % exactly even for
        // pre-epoch timestamps, so the oracle can never diverge on sign
        (col("ts_us") - col("ts_us") % lit(3600000000L)).as("bucket_us"),
        floor(col("value") * 1000000.0).cast("long").as("qv"))
      .groupBy("key", "bucket_us")
      .agg(sum("qv").as("swq"), count(lit(1)).as("n"))

  /** Integer-exact exponential smoothing (EWMA) over the hourly series —
    * the LEVEL tracker beside [[cusumDrift]]'s change detector and
    * [[burstHours]]' spike detector: s₁ = x₁, s_t = ⌊(α·x_t +
    * (1−α)·s_{t−1})⌋ with rational α = num/den and FLOOR division each
    * step, so the whole recurrence is exact integers and a fixed series
    * is bit-deterministic in any engine (the DuckDB oracle replays it
    * with a recursive CTE). Floor (not truncation) is used explicitly —
    * value sums can be negative and the two diverge there.
    *
    * Shape: the recurrence is inherently sequential per key, so each
    * key's hourly points fold in ONE linear pass of the codegen'd
    * sequential-recurrence kernel over its collect_list'd series —
    * bounded by the time range (a year of hours is 8760 rows), the
    * same per-key-sequence discipline as the ACF family. Keys are
    * independent; the fold never crosses them. */
  def ewmaHourly(events: DataFrame, keyCol: String = "event_type",
                 alphaNum: Long = 1L, alphaDen: Long = 4L): DataFrame =
    ewmaServe(hourlyQuantized(events, keyCol), alphaNum, alphaDen)

  /** The serve half of [[ewmaHourly]] over a stored/streamed hourly
    * frame (the [[cusumServe]] split — the mergeable hourly state
    * already has a streaming face, so the smoother gets one for free). */
  def ewmaServe(hourly: DataFrame, alphaNum: Long = 1L,
                alphaDen: Long = 4L): DataFrame = {
    require(alphaNum >= 1L && alphaNum < alphaDen,
      s"ewma alpha $alphaNum/$alphaDen out of (0, 1)")
    // the recurrence runs in the codegen'd linear-time fold
    // (functions/RecurrenceKernel — Math.floorDiv IS the portable
    // `(x - posmod(x, den)) DIV den` floor the oracle replays), not an
    // `aggregate` HOF whose per-step accumulator concat copies the
    // whole series again: O(n) per key, bit-identical output
    hourly
      .groupBy("key")
      .agg(sort_array(collect_list(struct(col("bucket_us"), col("swq")))).as("xs"))
      .select(col("key"), explode(
        graft.functions.RecurrenceFunctions.ewmaFold(
          col("xs"), alphaNum, alphaDen)).as("e"))
      .select(col("key"), col("e.bucket_us").as("bucket_us"),
        col("e.swq").as("swq"), col("e.s").as("ewma_q"))
  }

  /** Integer-exact Holt (double-exponential) smoothing over the hourly
    * series — the LEVEL+TREND forecaster beside [[ewmaHourly]]'s pure
    * level tracker: where EWMA lags a ramping series by construction,
    * Holt carries an explicit trend term and its one-step-ahead
    * forecast tracks the ramp. Recurrence with rational α = aNum/aDen,
    * β = bNum/bDen and FLOOR division at each of the two steps:
    *
    *   l₁ = x₁, b₁ = 0
    *   l_t = ⌊(α·x_t + (1−α)·(l_{t−1} + b_{t−1}))⌋
    *   b_t = ⌊(β·(l_t − l_{t−1}) + (1−β)·b_{t−1})⌋
    *   forecast_t = l_t + b_t   (the next-hour prediction)
    *
    * Floor (not truncation) explicitly: the trend difference
    * l_t − l_{t−1} goes NEGATIVE on any declining series even over
    * all-positive values, which is exactly where the two diverge — the
    * same portable ((x − posmod(x, den)) DIV den) spelling as the EWMA,
    * so the whole recurrence is exact integers and the DuckDB oracle
    * replays it with a recursive CTE. b₁ = 0 (not x₂−x₁) so a
    * single-hour key is well-defined and the first step is pure level.
    *
    * Shape: identical to [[ewmaServe]] — inherently sequential per key,
    * one linear codegen'd fold over the collect_list'd series, bounded
    * by the time range, keys independent. */
  def holtHourly(events: DataFrame, keyCol: String = "event_type",
                 alphaNum: Long = 1L, alphaDen: Long = 4L,
                 betaNum: Long = 1L, betaDen: Long = 2L): DataFrame =
    holtServe(hourlyQuantized(events, keyCol), alphaNum, alphaDen,
      betaNum, betaDen)

  /** The serve half of [[holtHourly]] over a stored/streamed hourly
    * frame — the seventh consumer of the shared hourly state seam
    * (streaming/StreamingMonitors.hourlyStateSink): cusum, burst, ewma,
    * acf, quantiles, and now the trend forecaster all serve off the
    * SAME (key, bucket_us, swq, n) plain-sum state, because hourly sums
    * merge exactly across micro-batch straddles. */
  def holtServe(hourly: DataFrame, alphaNum: Long = 1L,
                alphaDen: Long = 4L, betaNum: Long = 1L,
                betaDen: Long = 2L): DataFrame = {
    require(alphaNum >= 1L && alphaNum < alphaDen,
      s"holt alpha $alphaNum/$alphaDen out of (0, 1)")
    require(betaNum >= 1L && betaNum < betaDen,
      s"holt beta $betaNum/$betaDen out of (0, 1)")
    // same linear-time codegen'd fold as ewmaServe — the two-register
    // (level, trend) recurrence with Math.floorDiv at BOTH steps, so
    // declining series floor (not truncate) exactly as the oracle's
    // recursive CTE does
    hourly
      .groupBy("key")
      .agg(sort_array(collect_list(struct(col("bucket_us"), col("swq")))).as("xs"))
      .select(col("key"), explode(
        graft.functions.RecurrenceFunctions.holtFold(
          col("xs"), alphaNum, alphaDen, betaNum, betaDen)).as("e"))
      .select(col("key"), col("e.bucket_us").as("bucket_us"),
        col("e.swq").as("swq"), col("e.l").as("level_q"),
        col("e.b").as("trend_q"),
        (col("e.l") + col("e.b")).as("forecast_q"))
  }

  /** Burst detection over hourly event volume — the SPIKE axis next to
    * [[cusumDrift]]'s sustained-drift axis: an hour bursts when its
    * event count exceeds `factorNum/factorDen` times the mean of the
    * trailing `window` OBSERVED hours (gap hours are skipped, not
    * zero-filled — resample first via [[resampleHourly]] for strict
    * clock-hour baselines). The burst test is the cross-multiplied
    * integer comparison n·t_cnt·den > num·t_sum — no division decides
    * anything — and only the reported peak ratio divides (once, exact
    * longs). A key's first hours (empty baseline) never burst. One
    * rank window over the hourly frame + one aggregate. */
  def burstHours(events: DataFrame, keyCol: String = "event_type",
                 factorNum: Long = 3L, factorDen: Long = 1L,
                 window: Int = 24): DataFrame =
    burstServe(hourlyQuantized(events, keyCol), factorNum, factorDen, window)

  /** The sequential half of [[burstHours]] over an hourly frame — live
    * or merged from the streaming state seam: the same
    * (key, bucket_us, n) plain-sum partials the CUSUM sink maintains
    * (streaming/StreamingMonitors.hourlyStateSink) serve burst stats
    * identically, because hourly counts merge exactly across
    * micro-batch straddles. One more prefix-dependent statistic off
    * ONE maintained state table. */
  def burstServe(hourly: DataFrame,
                 factorNum: Long = 3L, factorDen: Long = 1L,
                 window: Int = 24): DataFrame = {
    require(factorNum >= 1L && factorDen >= 1L && window >= 1,
      s"burstHours: factor $factorNum/$factorDen and window $window must be positive")
    val trailing = Window.partitionBy("key").orderBy("bucket_us")
      .rowsBetween(-window, -1)
    hourly
      .withColumn("t_sum", sum("n").over(trailing))
      .withColumn("t_cnt", count(lit(1)).over(trailing))
      .withColumn("is_burst",
        col("t_cnt") > 0L &&
          col("n") * col("t_cnt") * lit(factorDen) > lit(factorNum) * col("t_sum"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_hours"),
        sum(when(col("is_burst"), 1L).otherwise(0L)).as("n_burst_hours"),
        max(when(col("t_cnt") > 0L,
          (col("n") * col("t_cnt")).cast("double") / col("t_sum"))).as("max_ratio"))
  }

  /** Lead-lag scan between key series — [[paaProfileDistance]] answers
    * "which series have the same shape"; this answers "who moves
    * FIRST": for every ordered key pair and every lag in [−maxLag,
    * +maxLag] hours, the exact cross-correlation numerator
    * Σ_t a[t]·b[t−L] over the hourly quantized sums, keeping the lag
    * that maximizes it (ties → smallest lag). best_lag > 0 means b's
    * series leads a's by that many hours — the alerting-precedence
    * question (which sensor moves first?) the reference's fixed
    * thresholds cannot ask. Dots are exact decimal(38,0) sums of long
    * products, rendered as the decimal string (the PAA 2^64 rule);
    * pair selection is one rank window. The lag expansion replicates
    * ONE side (2·maxLag+1)× before an equi-join on the shifted bucket —
    * never a θ-join — and the pair stream is bounded by overlap hours ·
    * lags · key pairs, independent of raw event count. */
  def leadLagDot(events: DataFrame, maxLag: Int = 3,
                 keyCol: String = "event_type"): DataFrame = {
    require(maxLag >= 1 && maxLag <= 168,
      s"leadLagDot: maxLag=$maxLag must be in [1, 168]")
    val hr = 3600000000L
    val d = (c: Column) => c.cast("decimal(38,0)")
    val hourly = hourlyQuantized(events, keyCol)
      .select(col("key"), col("bucket_us"), col("swq"))
    val shifted = hourly
      .select(col("key").as("key_b"), col("bucket_us"), col("swq").as("swq_b"))
      .withColumn("lag", explode(sequence(lit(-maxLag), lit(maxLag))))
      .withColumn("bucket_join", col("bucket_us") + col("lag").cast("long") * lit(hr))
    val byPair = Window.partitionBy("key_a", "key_b")
      .orderBy(col("dot_d").desc, col("lag"))
    hourly
      .select(col("key").as("key_a"), col("bucket_us").as("b_a"), col("swq").as("swq_a"))
      .join(shifted, col("b_a") === col("bucket_join") && col("key_a") < col("key_b"))
      .groupBy("key_a", "key_b", "lag")
      .agg(sum(d(col("swq_a")) * d(col("swq_b"))).as("dot_d"),
        count(lit(1)).as("n_overlap"))
      .withColumn("rn", row_number().over(byPair))
      .filter(col("rn") === 1)
      .select(col("key_a"), col("key_b"), col("lag").cast("long").as("best_lag"),
        col("n_overlap"), col("dot_d").cast("string").as("dot"))
  }

  /** Lag-k autocorrelation of the hourly event-count series — the
    * seasonality diagnostic read before trusting any day-over-day
    * comparison (a 24h peak says "this metric has a daily cycle;
    * compare same-hour, not adjacent-hour"). Self-correlation of ONE
    * aggregate series, complementing [[leadLagDot]]'s cross-KEY
    * alignment. Hours with zero events are missing rows, so pairs
    * require both endpoints present (the sparse-series convention,
    * shared with leadLagDot's overlap join).
    *
    * Exact-moment discipline (the [[Monitoring.valueHourCorr]] shape):
    * counts are integers, every moment accumulates in DECIMAL(38,0)
    * (counts at corpus scale put n·Σxy past 2^63), and only the final
    * division + correctly-rounded sqrt run in doubles. The hourly frame
    * is bounded by the TIME SPAN, not the corpus (one row per hour
    * forever ≈ 9k rows/year), so the lag explosion and self-join cost
    * maxLag × hours regardless of input size. */
  def hourlyAcf(events: DataFrame, maxLag: Int = 12): DataFrame =
    acfFromCounts(
      events
        .filter(col("ts_us").isNotNull)
        .groupBy(floorDiv(col("ts_us"), 3600000000L).as("h"))
        .agg(count(lit(1)).as("c")),
      maxLag)

  /** Per-key lag-k autocorrelation — [[hourlyAcf]] resolved to the same
    * grain as the rest of the per-type monitoring family (valueHourCorr,
    * burstHours): each event type gets its own seasonality row per lag,
    * so "clicks have a daily cycle but errors don't" is one query. Same
    * exact-moment discipline and sparse-pair convention; the pair join
    * keys on (key, hour), so no type ever correlates against another's
    * hours. Cost: maxLag × per-key span-hours, corpus-independent. */
  def hourlyAcfByKey(events: DataFrame, maxLag: Int = 12,
                     keyCol: String = "event_type"): DataFrame =
    acfFromKeyedCounts(
      events
        .filter(col("ts_us").isNotNull && col(keyCol).isNotNull)
        .groupBy(col(keyCol).as("key"), floorDiv(col("ts_us"), 3600000000L).as("h"))
        .agg(count(lit(1)).as("c")),
      maxLag)

  /** Per-key ACF served from the SAME hourly state table as
    * [[acfServe]]/cusumServe/burstServe — the state is already keyed,
    * so the per-type seasonality table is one more consumer of the one
    * maintained seam. Population note as [[acfServe]]. */
  def acfServeByKey(hourly: DataFrame, maxLag: Int = 12): DataFrame =
    acfFromKeyedCounts(
      hourly
        .groupBy(col("key"), floorDiv(col("bucket_us"), 3600000000L).as("h"))
        .agg(sum("n").as("c")),
      maxLag)

  private def acfFromKeyedCounts(counts: DataFrame, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 168,
      s"hourlyAcfByKey: maxLag=$maxLag must be in [1, 168]")
    val d = (c: Column) => c.cast("decimal(38,0)")
    Dedup.withScopedCache(counts) { hourly =>
      val left = hourly
        .withColumn("lag", explode(sequence(lit(1L), lit(maxLag.toLong))))
        .select(col("key"), col("lag"), (col("h") + col("lag")).as("h_pair"),
          col("c").as("x"))
      hourly
        .select(col("key"), col("h").as("h_pair"), col("c").as("y"))
        .join(left, Seq("key", "h_pair"))
        .groupBy("key", "lag")
        .agg(count(lit(1)).as("n_pairs"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(d(col("x")) * d(col("y"))).as("sxy"),
          sum(d(col("x")) * d(col("x"))).as("sxx"),
          sum(d(col("y")) * d(col("y"))).as("syy"))
        .withColumn("num", d(col("n_pairs")) * col("sxy") - d(col("sx")) * d(col("sy")))
        .withColumn("dx", d(col("n_pairs")) * col("sxx") - d(col("sx")) * d(col("sx")))
        .withColumn("dy", d(col("n_pairs")) * col("syy") - d(col("sy")) * d(col("sy")))
        .withColumn("acf",
          when(col("dx") === 0 || col("dy") === 0, lit(null).cast("double"))
            .otherwise(col("num").cast("double") /
              sqrt(col("dx").cast("double") * col("dy").cast("double"))))
        .select(col("key"), col("lag"), col("n_pairs"), col("acf"))
    }
  }

  /** ACF served from the maintained hourly state table — the same
    * (key, bucket_us, n) plain-sum partials the CUSUM/burst sinks keep
    * (streaming/StreamingMonitors.hourlyStateSink): counts merge exactly
    * across micro-batch straddles, so summing keys up to global hourly
    * volume and running the same moment arithmetic serves the identical
    * ACF one more statistic off ONE state table. Population note: the
    * state excludes null-key/value rows (hourlyQuantized's filter), so
    * serve ≡ batch holds against events under that same filter. */
  def acfServe(hourly: DataFrame, maxLag: Int = 12): DataFrame =
    acfFromCounts(
      hourly
        .groupBy(floorDiv(col("bucket_us"), 3600000000L).as("h"))
        .agg(sum("n").as("c")),
      maxLag)

  private def acfFromCounts(counts: DataFrame, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 168,
      s"hourlyAcf: maxLag=$maxLag must be in [1, 168]")
    val d = (c: Column) => c.cast("decimal(38,0)")
    // both sides of the lag self-join read the SAME hourly aggregate —
    // scope-cache it so the corpus is scanned once, not once per side
    // (the frame is span-bounded: one row per observed hour)
    Dedup.withScopedCache(counts) { hourly =>
    val left = hourly
      .withColumn("lag", explode(sequence(lit(1L), lit(maxLag.toLong))))
      .select(col("lag"), (col("h") + col("lag")).as("h_pair"), col("c").as("x"))
    hourly
      .select(col("h").as("h_pair"), col("c").as("y"))
      .join(left, "h_pair")
      .groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(d(col("x")) * d(col("y"))).as("sxy"),
        sum(d(col("x")) * d(col("x"))).as("sxx"),
        sum(d(col("y")) * d(col("y"))).as("syy"))
      .withColumn("num", d(col("n_pairs")) * col("sxy") - d(col("sx")) * d(col("sy")))
      .withColumn("dx", d(col("n_pairs")) * col("sxx") - d(col("sx")) * d(col("sx")))
      .withColumn("dy", d(col("n_pairs")) * col("syy") - d(col("sy")) * d(col("sy")))
      .withColumn("acf",
        when(col("dx") === 0 || col("dy") === 0, lit(null).cast("double"))
          .otherwise(col("num").cast("double") /
            sqrt(col("dx").cast("double") * col("dy").cast("double"))))
      .select(col("lag"), col("n_pairs"), col("acf"))
    }
  }

  /** PAA (piecewise aggregate approximation) profile distance between
    * keys — the time-series-similarity primitive (which event types
    * have the same temporal activity shape?): each key's hourly
    * quantized-sum series compresses to `segments` equal time slices,
    * and every key pair gets the exact squared Euclidean distance
    * between profiles. PAA is THE standard dimensionality reduction
    * before any series index (SAX, iSAX); here the segment count — not
    * the raw hour span — bounds all downstream work, so the all-pairs
    * stage costs #keys²·segments however long the series grow.
    *
    * Integer-exact end to end: hourly sums reuse [[hourlyQuantized]]'s
    * frame, the segment id is pure integer arithmetic off a one-row
    * min/max broadcast, per-segment totals are exact longs, and the
    * distance accumulates (a−b)² in DECIMAL(38,0) — RENDERED AS THE
    * EXACT DECIMAL STRING, because the totals clear 2^64 where DuckDB's
    * hugeint→double cast double-rounds (upper·2^64 + lower in float)
    * while Spark's BigDecimal cast rounds once: the two engines can
    * disagree by one ulp on a plain double column (observed at sf0.01),
    * and a distance used for RANKING loses nothing as a string.
    * Absolute sums on
    * purpose: share-normalizing would square a product of two 10^21
    * terms past decimal(38,0); normalize upstream if shape-only
    * comparison is wanted. The key×segment grid is a documented
    * bounded cross (#keys · ≤`segments` rows). */
  def paaProfileDistance(events: DataFrame, segments: Int = 64,
                         keyCol: String = "event_type"): DataFrame = {
    require(segments >= 1 && segments <= 4096,
      s"paaProfileDistance: segments=$segments must be in [1, 4096]")
    val hourly = hourlyQuantized(events, keyCol)
    val span = hourly.agg(min("bucket_us").as("h_min"), max("bucket_us").as("h_max"))
    val seg = hourly.crossJoin(broadcast(span))
      .select(col("key"),
        expr(s"CAST((bucket_us - h_min) * ${segments}L DIV (h_max - h_min + 3600000000) AS INT)")
          .as("seg"),
        col("swq"))
      .groupBy("key", "seg").agg(sum("swq").as("sv"))
    val grid = seg.select("key").distinct()
      .crossJoin(broadcast(seg.select("seg").distinct()))
    val dense = grid.join(seg, Seq("key", "seg"), "left").na.fill(0L, Seq("sv"))
    val d = (c: Column) => c.cast("decimal(38,0)")
    dense.as("a").join(dense.as("b"),
        col("a.seg") === col("b.seg") && col("a.key") < col("b.key"))
      .groupBy(col("a.key").as("key_a"), col("b.key").as("key_b"))
      .agg(count(lit(1)).as("n_segs"),
        sum((d(col("a.sv")) - d(col("b.sv"))) * (d(col("a.sv")) - d(col("b.sv"))))
          .as("dist_d"))
      .select(col("key_a"), col("key_b"), col("n_segs"),
        col("dist_d").cast("string").as("dist_sq"))
  }

  /** The sequential half: the two-window prefix-min CUSUM over an
    * hourly frame (live or merged-from-state — identical either way,
    * because the corpus reference Σswq div Σn equals the event-level
    * Σqv div N exactly). */
  def cusumServe(hourly: DataFrame,
                 thresholdNum: Long = 1L, thresholdDen: Long = 10L): DataFrame = {
    require(thresholdDen > 0, s"cusumDrift: thresholdDen=$thresholdDen must be > 0")
    // corpus-wide reference: one integer division, broadcast back
    val ref = hourly.agg(expr("sum(swq) DIV sum(n)").as("k_ref"))
    val prefix = Window.partitionBy("key").orderBy("bucket_us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourly
      .crossJoin(broadcast(ref))
      .withColumn("x", col("swq") - col("k_ref") * col("n"))
      .withColumn("p", sum(col("x")).over(prefix))
      .withColumn("s", col("p") - min(col("p")).over(prefix))
      // flag: S_t > (num/den)·k_ref·n_t in exact cross-multiplied longs
      .withColumn("drift",
        col("s") * thresholdDen > lit(thresholdNum) * col("k_ref") * col("n"))
      .select(col("key"), col("bucket_us"), col("n"), col("s").as("cusum_q"),
        col("drift"))
  }

  def interpolateAt(queries: DataFrame, obs: DataFrame, keyCol: String,
                    qTsUsCol: String, tsCol: String = "ts",
                    idCol: String = "event_id", valCol: String = "value"): DataFrame = {
    val qCols = queries.columns.toSeq
    val qSide = queries.select(
      qCols.map(col) :+ col(qTsUsCol).as("__t_us") :+ lit(1).as("__side") :+
        lit(null).cast("double").as("__v") :+ lit(null).cast("long").as("__oid"): _*)
    val oSide = obs
      .filter(col(valCol).isNotNull && col(tsCol).isNotNull)
      .select(
        qCols.map(c => (if (c == keyCol) col(keyCol)
                        else lit(null).cast(queries.schema(c).dataType)).as(c)) :+
          unix_micros(col(tsCol)).as("__t_us") :+ lit(0).as("__side") :+
          col(valCol).cast("double").as("__v") :+ col(idCol).cast("long").as("__oid"): _*)
    val prevW = Window.partitionBy(keyCol)
      .orderBy(col("__t_us"), col("__side"), col("__oid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // the next endpoint runs over the REVERSED ordering with an unbounded-
    // PRECEDING frame: Spark's unbounded-FOLLOWING frame re-scans the
    // partition tail per row — O(n²) in partition size, measured 176 s on
    // 30k-row key partitions at sf0.1 — while the reversed accumulation is
    // one O(n) pass selecting the identical row. The reversed order
    // (t_us desc, side desc, oid asc) of the intended (t_us asc, side asc,
    // oid desc) keeps the same tie rule as prev — greatest (ts, id) wins —
    // and still sorts observations ahead of queries at an equal instant.
    val nextW = Window.partitionBy(keyCol)
      .orderBy(col("__t_us").desc, col("__side").desc, col("__oid").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    qSide.unionByName(oSide)
      .withColumn("__prev_v", last(col("__v"), ignoreNulls = true).over(prevW))
      .withColumn("__prev_t",
        last(when(col("__side") === 0, col("__t_us")), ignoreNulls = true).over(prevW))
      .withColumn("__next_v", last(col("__v"), ignoreNulls = true).over(nextW))
      .withColumn("__next_t",
        last(when(col("__side") === 0, col("__t_us")), ignoreNulls = true).over(nextW))
      .filter(col("__side") === 1)
      .select(qCols.map(col) :+
        // an exact-time observation IS the value — including at the range
        // end, where no "next" endpoint exists
        when(col("__prev_t") === col("__t_us"), col("__prev_v"))
          .when(col("__prev_t").isNotNull && col("__next_t").isNotNull,
            col("__prev_v") + (col("__next_v") - col("__prev_v"))
              * ((col("__t_us") - col("__prev_t")).cast("double")
                 / (col("__next_t") - col("__prev_t")).cast("double")))
          .as("interp_value"): _*)
  }

  /** Seasonal-naive forecast backtest — the capacity-planning baseline:
    * forecast(hour) = actual(hour − period), scored per key as MAE and
    * signed bias over every hour with a matching prior-period hour.
    * Per-row values quantize to micro-units BEFORE the hourly sums (raw
    * double sums are partitioning-dependent; integer sums are exact), so
    * both error aggregates are exact integers with single final
    * divisions. ONE corpus scan: each hourly total plays BOTH roles —
    * actual at its own hour, forecast at hour + period — via a dual-role
    * explode over the (keys × hours)-bounded frame, never a self-join
    * re-scan; gap-safe by construction (missing prior hours simply
    * produce no matched row, where a window lag(24 rows) would silently
    * misalign across gaps). */
  def seasonalBacktest(events: DataFrame, periodHours: Int = 24,
                       quantum: Long = 1000000L): DataFrame = {
    require(periodHours > 0, s"periodHours must be positive, got $periodHours")
    val hourUs = 3600000000L
    val shiftUs = periodHours.toLong * hourUs
    val hourly = events
      .filter(col("event_type").isNotNull && col("value").isNotNull &&
        col("ts_us").isNotNull)
      .select(col("event_type"),
        (col("ts_us") - col("ts_us") % hourUs).as("bucket_us"),
        round(col("value") * lit(quantum.toDouble)).cast("long").as("vq"))
      .groupBy("event_type", "bucket_us").agg(sum("vq").as("aq"))
    hourly
      .select(col("event_type"), explode(array(
        struct(col("bucket_us"), col("aq").as("actual_q"),
          lit(null).cast("long").as("forecast_q")),
        struct((col("bucket_us") + lit(shiftUs)).as("bucket_us"),
          lit(null).cast("long").as("actual_q"),
          col("aq").as("forecast_q")))).as("r"))
      .select(col("event_type"), col("r.bucket_us").as("bucket_us"),
        col("r.actual_q").as("actual_q"), col("r.forecast_q").as("forecast_q"))
      .groupBy("event_type", "bucket_us")
      .agg(max("actual_q").as("aq"), max("forecast_q").as("fq"))
      .filter(col("aq").isNotNull && col("fq").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"),
        sum(abs(col("aq") - col("fq"))).as("sum_abs_err_q"),
        sum(col("aq") - col("fq")).as("sum_err_q"))
      .select(col("event_type"), col("n_hours"),
        (col("sum_abs_err_q").cast("double") / col("n_hours") /
          lit(quantum.toDouble)).as("mae"),
        (col("sum_err_q").cast("double") / col("n_hours") /
          lit(quantum.toDouble)).as("bias"))
  }
}
