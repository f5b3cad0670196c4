package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-sequence (funnel) analysis over an event stream: for each user,
  * the earliest time each stage of `stages` was reached, where stage k+1
  * must occur STRICTLY after the recorded stage-k time. The canonical
  * product-analytics question (view → click → purchase) the reference's
  * record-at-a-time pipeline could only answer with per-key mutable state;
  * here it is one shuffle and a codegen'd array fold:
  *
  *  - one `groupBy(user)` collects the user's (ts, id, type) events into a
  *    sorted array (ties broken by event id — deterministic);
  *  - a single `aggregate` HOF walks the array once with the stage vector
  *    as the accumulator: k = #completed stages; an event advances the
  *    funnel iff it matches stage k+1's type and is strictly later than
  *    the stage-k timestamp. O(events · n_stages) per user, no window, no
  *    self-join. (HOF lambdas evaluate interpreted inside the codegen'd
  *    stage — the shuffle dominates regardless; a native expression is
  *    the documented escalation if a profile ever says otherwise, the
  *    same bar WordShingles cleared.)
  *
  * Scale: state per user is one n-long array; the collected event array is
  * bounded by the user's own history — cap upstream (e.g. perSourceCap on
  * user) if a key can emit unbounded events. Skewed users land in one task
  * each; the fold is linear, so a million-event user is ~ms, not a blowup.
  * Equivalent min-cascade SQL (the oracle) needs n self-joins of the fact.
  */
object Funnel {

  /** Per-user funnel: (user, stage_reached, t1_us .. tn_us). */
  def funnel(events: DataFrame, stages: Seq[String],
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts_us", idCol: String = "event_id"): DataFrame = {
    val n = stages.length
    require(n >= 1, "funnel needs at least one stage")
    val stageArr = array(stages.map(lit): _*)
    val nulls = (c: Column) => array_repeat(lit(null).cast("long"), c)
    val merge: (Column, Column) => Column = (acc, e) => {
      val k = size(filter(acc, a => a.isNotNull))
      val ts = e.getField(tsCol)
      val advance = (k < lit(n)) &&
        (e.getField(typeCol) === get(stageArr, k)) &&
        (k === lit(0) || ts > get(acc, k - 1))
      when(advance,
        concat(slice(acc, lit(1), k), array(ts), nulls(lit(n) - k - 1)))
        .otherwise(acc)
    }
    val walked = events
      // a null-time event has no position in the sequence; letting it in
      // would plant a null stage timestamp that resets the completed-count
      .where(col(tsCol).isNotNull)
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(col(tsCol), col(idCol), col(typeCol))))
        .as("seq"))
      .select(col(userCol),
        aggregate(col("seq"), nulls(lit(n)), merge).as("stages"))
    walked.select(
      col(userCol) +:
      size(filter(col("stages"), a => a.isNotNull)).cast("long").as("stage_reached") +:
      (1 to n).map(i => element_at(col("stages"), i).as(s"t${i}_us")): _*)
  }

  /** Cohort retention triangle — the other canonical product-analytics
    * rollup: users grouped by their FIRST-activity week (the cohort), and
    * for each later week-offset, how many of that cohort were active.
    * Weeks are exact integer epoch-week indices (floor of epoch-micros /
    * week — no calendar/timezone dependence, portable to any engine).
    * Two shuffles: user-week distinct (map-side combined), then the
    * cohort min per user rides the same user partitioning; the final
    * (cohort, offset) aggregate counts rows of an already user-week-
    * distinct frame, so no count-distinct state anywhere. */
  def retentionCohorts(events: DataFrame, userCol: String = "user_id",
                       tsUsCol: String = "ts_us"): DataFrame = {
    val weekUs = 7L * 24 * 3600 * 1000000L
    val weeks = events
      .where(col(tsUsCol).isNotNull)
      // integral DIV, not double division: epoch-micros exceed 2^50 and
      // the quotient must be exact; timestamps are non-negative so
      // truncating DIV ≡ floor division in every engine
      .select(col(userCol), expr(s"$tsUsCol DIV $weekUs").as("week"))
      .distinct()
    val cohorts = weeks.groupBy(userCol).agg(min("week").as("cohort_week"))
    weeks.join(cohorts, userCol)
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** The dashboard rollup over [[funnel]]: users per final stage, and for
    * full converters the mean end-to-end time — exact Long micros summed,
    * one double division at the end (the cross-engine money rule applied
    * to durations). One extra aggregation over the per-user frame. */
  def conversionRollup(events: DataFrame, stages: Seq[String],
                       userCol: String = "user_id"): DataFrame = {
    val n = stages.length
    funnel(events, stages, userCol)
      .groupBy("stage_reached")
      .agg(count(lit(1)).as("n_users"),
        (sum(col(s"t${n}_us") - col("t1_us")).cast("double") /
          count(col(s"t${n}_us"))).as("avg_convert_us"))
  }
}
