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

  /** Mergeable market-basket state: ONE monoid table holding all three
    * grains the lift computation needs — (a, b) pair co-order counts,
    * (a, null) per-part order counts, (null, null) the total order
    * count. Every row is "number of distinct orders", so the merge is a
    * plain sum at every grain — PROVIDED the increment split never
    * severs a basket. Partition increments by the ORDER key: a
    * shipdate/file/arrival split puts one basket's lineitems in two
    * increments, each too poor to see their cross-increment pairs, and
    * no merge can recover them (spec'd as a negative law, not just
    * asserted). Support filtering happens at SERVE time only — a
    * filtered partial would under-merge pairs that cross the support
    * floor later. */
  def partialBasketStats(lineitem: DataFrame): DataFrame = {
    // same shapes as the direct computation (Graph.basketLift): the pair
    // grain via the shared generator chain, the part/total grains via the
    // pipelined two-column distinct — measured faster than materializing
    // the order-set arrays once and deriving everything from them
    val op = lineitem
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val pairs = Graph.orderedPairs(Graph.orderPartSets(lineitem))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
    val parts = op.groupBy(col("p").as("a"))
      .agg(count(lit(1)).as("n"))
      .select(col("a"), lit(null).cast("long").as("b"), col("n"))
    val total = op.agg(countDistinct(col("o")).as("n"))
      .select(lit(null).cast("long").as("a"), lit(null).cast("long").as("b"),
        col("n"))
    pairs.select(col("a"), col("b"), col("n"))
      .unionByName(parts).unionByName(total)
  }

  /** Merge basket-state increments: one aggregate, one monoid (null
    * grain keys group together, so all three grains merge in the same
    * pass). */
  def mergeBasketStats(partials: DataFrame*): DataFrame = {
    require(partials.nonEmpty, "mergeBasketStats needs at least one partial")
    partials.reduce(_ unionByName _)
      .groupBy(col("a"), col("b")).agg(sum(col("n")).as("n"))
  }

  /** Serve lift from a merged state table — same output contract as
    * Graph.basketLift computed directly. The state is persisted before
    * the three grain slices read it (in production it would be a
    * materialized table; here the persist models that read-back). */
  def serveBasketLift(state: DataFrame, minSupport: Long = 2L): DataFrame = {
    require(minSupport >= 1L,
      s"serveBasketLift: minSupport=$minSupport must be >= 1")
    val s = state.persist()
    val pairs = s.filter(col("a").isNotNull && col("b").isNotNull &&
        col("n") >= minSupport)
      .select(col("a"), col("b"), col("n").as("n_ab"))
    val parts = s.filter(col("a").isNotNull && col("b").isNull)
      .select(col("a").as("p"), col("n").as("n_p"))
    val total = s.filter(col("a").isNull && col("b").isNull)
      .select(col("n").as("n_orders"))
    // a state without its (null, null) total row is not a basket state;
    // serving it would silently cross-join against nothing and emit an
    // EMPTY result — fail loudly instead (the serveHeavyTokens rule)
    require(total.count() == 1L,
      "serveBasketLift: state has no (null, null) total-orders row — not a basket state")
    pairs
      .join(broadcast(parts.select(col("p").as("a"), col("n_p").as("n_a"))), "a")
      .join(broadcast(parts.select(col("p").as("b"), col("n_p").as("n_b"))), "b")
      .crossJoin(broadcast(total))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        ((col("n_orders") * col("n_ab")).cast("double") / (col("n_a") * col("n_b")))
          .as("lift"))
  }

  /** CDC snapshot diff — the audit a table-maintenance pipeline runs
    * after every sync: given two keyed snapshots, count keys added,
    * removed, changed, and unchanged. One full-outer equi-join on the
    * key, one aggregate, no row-level output — scan speed at any size,
    * and the counts are the exact reconciliation numbers a sync report
    * needs (added + unchanged + changed = |new|). Values compare by
    * exact equality — quantize upstream if the source is lossy. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   key: String, value: String): DataFrame =
    oldSnap.select(col(key).as("k"), col(value).as("v_old"))
      .join(newSnap.select(col(key).as("k"), col(value).as("v_new")), Seq("k"), "full_outer")
      .agg(
        count(col("v_old")).as("n_old"),
        count(col("v_new")).as("n_new"),
        sum(when(col("v_old").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("v_new").isNull, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("v_old").isNotNull && col("v_new").isNotNull &&
          col("v_old") =!= col("v_new"), 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("v_old").isNotNull && col("v_new").isNotNull &&
          col("v_old") === col("v_new"), 1L).otherwise(0L)).as("n_unchanged"))
}
