package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance: the nightly-rollup shape
  * where tonight's view is yesterday's view MERGED with today's partial,
  * never a recompute over the whole history. The reference recomputes its
  * dashboard aggregates from the store on every request
  * (hrfco-monitoring-server .../service/DashboardService.java); at 100 TB
  * the only viable form is a mergeable state table.
  *
  * Every column in the partial is an element of a commutative monoid —
  * count and integer-quantized sum (exact: no double summation order to
  * disagree about), min/max, and an HLL distinct sketch (registers merge
  * by max, so the merged estimate is BIT-identical to the estimate over
  * the union — spec-pinned) — so merge(partial(A), partial(B)) ==
  * partial(A ∪ B) exactly, which is the associativity law the oracle
  * checks end-to-end: the engine computes merge over a two-way split, the
  * oracle computes the direct rollup over everything.
  *
  * At scale: partials shuffle once on (key, day); the merge shuffles the
  * (small) state tables, not the facts. Keep the state table bucketed by
  * key and the nightly merge is exchange-free on the corpus side.
  */
object Incremental {

  /** Per-(event_type, day) mergeable partial: count, exact micro-quantized
    * value sum, min/max, and the HLL user sketch. */
  def partialRollup(events: DataFrame): DataFrame =
    events
      .filter(col("event_type").isNotNull && col("ts").isNotNull)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(
        count(lit(1)).as("n"),
        sum(floor(col("value") * 1000000.0).cast("long")).as("sum_q"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"),
        hll_sketch_agg(col("user_id")).as("user_sketch"))

  /** Merge any number of partial state tables: one aggregate over the
    * unioned partials, every column through its monoid's combine. */
  def mergeRollups(partials: DataFrame*): DataFrame = {
    require(partials.nonEmpty, "mergeRollups needs at least one partial")
    partials.reduce(_ unionByName _)
      .groupBy(col("event_type"), col("day"))
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum_q")).as("sum_q"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"),
        hll_union_agg(col("user_sketch")).as("user_sketch"))
  }

  /** The serving projection: deterministic columns plus the sketch
    * estimate (the estimate column is engine-specific, so the oracle
    * compares the deterministic four; the sketch's merge-exactness is
    * spec-pinned instead). */
  def serveRollup(state: DataFrame): DataFrame =
    state.select(col("event_type"), col("day"), col("n"), col("sum_q"),
      col("min_v"), col("max_v"),
      hll_sketch_estimate(col("user_sketch")).as("approx_users"))
}
