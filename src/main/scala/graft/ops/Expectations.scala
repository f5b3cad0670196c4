package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality expectations — the validation pass a training pipeline
  * runs BEFORE a 100 TB job consumes a new drop: profile the columns in
  * ONE aggregate pass, then check declared expectations against the
  * profile and fail loudly naming every violated rule (the deequ-style
  * contract; silent bad data is how a week of training dies).
  *
  * The profile is a single groupBy-free aggregate — every metric is a
  * partial-aggregable expression, so the pass is one map-side-combined
  * job over the scan at any scale; nothing driver-side but the one
  * profile row. Exact counts only (null/distinct/bounds) — estimates
  * belong to the monitoring surface (approxDistinct), not a gate that
  * decides whether data ships. */
object Expectations {

  /** One row per profiled column: n, n_null, n_distinct, min/max as
    * strings (type-erased for the cross-column long format). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    val aggs = cols.flatMap { c =>
      // floating columns render through a fixed-scale decimal: raw
      // double→string formatting differs between engines, decimal→string
      // does not (the portable-report requirement)
      val shown: Column => Column = df.schema(c).dataType match {
        case org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType =>
          x => x.cast("decimal(28,6)").cast("string")
        case _ => x => x.cast("string")
      }
      Seq(count(lit(1)).as(s"__n_$c"),
        count(when(col(c).isNull, 1)).as(s"__null_$c"),
        count_distinct(col(c)).as(s"__dist_$c"),
        shown(min(col(c))).as(s"__min_$c"),
        shown(max(col(c))).as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("column"), col(s"__n_$c").as("n_rows"),
        col(s"__null_$c").as("n_null"), col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"), col(s"__max_$c").as("max_value"))
    }
    row.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }

  /** One declared expectation over a profiled column; `bound` only
    * applies to the threshold checks (NaN otherwise). */
  final case class Rule(column: String, check: String, describe: String,
                        bound: Double = Double.NaN)

  /** Common rule builders. */
  def notNull(c: String): Rule =
    Rule(c, "not_null", s"$c must contain no nulls")
  def unique(c: String): Rule =
    Rule(c, "unique", s"$c must be unique among non-null values")
  def nonEmpty(c: String): Rule =
    Rule(c, "non_empty", s"$c must have rows")
  def minAtLeast(c: String, bound: Double): Rule =
    Rule(c, "min_at_least", s"$c minimum must be >= $bound", bound)
  def maxAtMost(c: String, bound: Double): Rule =
    Rule(c, "max_at_most", s"$c maximum must be <= $bound", bound)

  /** Evaluate rules against the profile: one row per rule with a pass
    * flag — the auditable report form (write it next to the data drop).
    * ONE profile scan total: the declared rules join the profile as a
    * literal frame and the verdict is a CASE over the check kind — a
    * per-rule branch would re-run the full profile aggregate per rule
    * (measured 8× the scan cost on an 8-rule set). */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "report needs at least one rule")
    val spark = df.sparkSession
    import spark.implicits._
    val prof = profile(df, rules.map(_.column).distinct)
    val ruleRows = rules.map(r => (r.column, r.check, r.describe, r.bound))
      .toDF("column", "check", "expectation", "bound")
    prof.join(ruleRows, "column")
      .withColumn("passed",
        when(col("check") === "non_empty", col("n_rows") > 0)
          .when(col("check") === "not_null", col("n_null") === 0)
          .when(col("check") === "unique",
            col("n_distinct") === col("n_rows") - col("n_null"))
          .when(col("check") === "min_at_least",
            col("min_value").cast("double") >= col("bound"))
          .when(col("check") === "max_at_most",
            col("max_value").cast("double") <= col("bound"))
          .otherwise(raise_error(concat(lit("unknown check: "), col("check")))))
      .select("column", "check", "expectation", "passed",
        "n_rows", "n_null", "n_distinct", "min_value", "max_value")
  }

  /** The gate form: throws listing EVERY violated expectation by name —
    * never a partial signal, never a silent pass-through. */
  def enforce(df: DataFrame, rules: Seq[Rule]): Unit = {
    val failed = report(df, rules).filter(!col("passed"))
      .select("expectation").collect().map(_.getString(0))
    if (failed.nonEmpty) throw new IllegalStateException(
      s"data expectations violated (${failed.length}): ${failed.mkString("; ")}")
  }

  /** Streaming form: the profile metrics ride the pass as an `observe`
    * payload — zero extra jobs, surfaced on every micro-batch's progress
    * (the CollectMetrics channel withIngestMetrics uses) — and
    * [[evaluateObserved]] turns one batch's metrics row into the same
    * named-violation list `enforce` throws. The stream is validated
    * continuously without a second scan; wiring the evaluation into a
    * StreamingQueryListener makes it a per-batch circuit breaker. */
  def observed(df: DataFrame, rules: Seq[Rule],
               name: String = "graft_expectations"): DataFrame = {
    require(rules.nonEmpty, "observed needs at least one rule")
    // DISTINCT aggregates are illegal in CollectMetrics, and a per-batch
    // distinct count could not check cross-batch uniqueness anyway —
    // reject the rule loudly instead of silently weakening it (streaming
    // dedup is dropDuplicatesWithinWatermark's job, before this observer)
    rules.find(_.check == "unique").foreach(r =>
      throw new IllegalArgumentException(
        s"observed: '${r.describe}' is not checkable per micro-batch — " +
          "enforce uniqueness upstream with dropDuplicatesWithinWatermark"))
    // double bounds only where a threshold rule needs them — an ANSI cast
    // of a non-numeric column's extrema would fail the whole stream
    val byCol = rules.groupBy(_.column).toSeq.sortBy(_._1)
    val aggs = byCol.flatMap { case (c, rs) =>
      val bounds =
        if (rs.exists(r => r.check == "min_at_least" || r.check == "max_at_most"))
          Seq(min(col(c)).cast("double").as(s"min_$c"),
            max(col(c)).cast("double").as(s"max_$c"))
        else Nil
      Seq(count(lit(1)).as(s"n_rows_$c"),
        count(when(col(c).isNull, 1)).as(s"n_null_$c")) ++ bounds
    }
    df.observe(name, aggs.head, aggs.tail: _*)
  }

  /** Referential-integrity audit for one child→parent relation: how many
    * child rows carry a key with no parent (orphans) or no key at all.
    * The fact-table preflight before any join-dependent pipeline runs —
    * an orphan rate that moved since yesterday means the upstream export
    * raced or truncated. Shape: one anti join of the child's non-null
    * keys against the DEDUPED parent key projection (broadcast when the
    * parent is a dim), plus two one-row aggregates combined by the
    * documented bounded scalar cross — no row-level output, so the audit
    * runs at scan speed regardless of child size. */
  def orphanAudit(child: DataFrame, childKey: String,
                  parent: DataFrame, parentKey: String,
                  relation: String): DataFrame = {
    val keys = child.select(col(childKey).as("k"))
    val totals = keys.agg(count(lit(1)).as("n_child"), count(col("k")).as("n_nonnull"))
    val orphans = keys.filter(col("k").isNotNull)
      .join(parent.select(col(parentKey).as("k")).distinct(), Seq("k"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    totals.crossJoin(orphans)
      .select(lit(relation).as("relation"), col("n_child"),
        (col("n_child") - col("n_nonnull")).as("n_null_keys"), col("n_orphans"),
        (col("n_orphans").cast("double") / col("n_child")).as("orphan_rate"))
  }

  /** Chi-square distribution drift between two snapshots of a categorical
    * column — the pre-training check that yesterday's event mix still
    * looks like today's. Per category: old/new counts and the category's
    * χ² contribution (o_new − e)²/e with e the old share scaled to the
    * new total. The arithmetic is EXACT until one double division per
    * row: the contribution is algebraically
    * (o·N_old − c_old·N_new)² / (c_old·N_new·N_old), whose numerator
    * runs in DECIMAL(38,0) (the square passes 2^63 long before the
    * counts do — the valueHourCorr discipline) and whose denominator is
    * a decimal product of exact longs; both engines cast the same exact
    * decimals to double and divide once. Categories absent from the old
    * snapshot have no finite expectation — reported with a null term,
    * never a division by zero. */
  def distributionDrift(oldSnap: DataFrame, newSnap: DataFrame,
                        category: String): DataFrame = {
    val d = (c: Column) => c.cast("decimal(38,0)")
    val oldC = oldSnap.filter(col(category).isNotNull)
      .groupBy(col(category)).agg(count(lit(1)).as("c_old"))
    val newC = newSnap.filter(col(category).isNotNull)
      .groupBy(col(category)).agg(count(lit(1)).as("c_new"))
    val oldTot = oldC.agg(sum("c_old").as("n_old"))
    val newTot = newC.agg(sum("c_new").as("n_new"))
    val diff = d(col("c_new")) * d(col("n_old")) - d(col("c_old")) * d(col("n_new"))
    oldC.join(newC, Seq(category), "full_outer")
      .na.fill(0L, Seq("c_old", "c_new"))
      .crossJoin(broadcast(oldTot)).crossJoin(broadcast(newTot))
      .select(col(category), col("c_old"), col("c_new"),
        when(col("c_old") > 0L,
          (diff * diff).cast("double") /
            (d(col("c_old")) * d(col("n_new")) * d(col("n_old"))).cast("double"))
          .as("chi2_term"))
  }

  /** Two-sample Kolmogorov–Smirnov distance in PURE integers — the
    * nonparametric drift test for a numeric column, next to
    * [[distributionDrift]]'s categorical χ²: D = max_x |F_a(x) − F_b(x)|
    * cross-multiplies into max |cum_a(x)·n_b − cum_b(x)·n_a| over the
    * merged value grid — every candidate is an exact integer, the max
    * is order-insensitive, and ONE division renders D ∈ [0, 1]. No
    * binning to tune, no distributional assumption, and ties are exact
    * (both CDFs step at the same grid point). Per group: one counts
    * aggregate, one cumulative window over distinct values, one max.
    * Empty side → null (no distribution to compare). */
  def ksDistance(df: DataFrame, valueCol: String, isB: Column,
                 groupCol: String): DataFrame = {
    val counts = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(valueCol).as("v"))
      .agg(sum(when(!isB, 1L).otherwise(0L)).as("ca"),
        sum(when(isB, 1L).otherwise(0L)).as("cb"))
    val cum = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("cum_a", sum("ca").over(cum))
      .withColumn("cum_b", sum("cb").over(cum))
      .withColumn("tot_a", sum("ca").over(Window.partitionBy("g")))
      .withColumn("tot_b", sum("cb").over(Window.partitionBy("g")))
      .withColumn("num",
        abs(col("cum_a") * col("tot_b") - col("cum_b") * col("tot_a")))
      .groupBy("g")
      .agg(max("tot_a").as("n_a"), max("tot_b").as("n_b"), max("num").as("d_num"))
      .withColumn("ks",
        when(col("n_a") > 0L && col("n_b") > 0L,
          col("d_num").cast("double") / (col("n_a") * col("n_b")).cast("double")))
      .select(col("g").as(groupCol), col("n_a"), col("n_b"), col("ks"))
  }

  /** Per-day categorical diversity by the Gini-Simpson index — the
    * log-free entropy surrogate (1 − Σp², the probability two sampled
    * rows differ in category), so the daily "is the event mix
    * collapsing?" monitor stays engine-exact where Shannon entropy's
    * transcendentals could not: diversity = (N² − Σc²)/N², exact
    * integer squares in decimal and ONE double division. Complements
    * [[distributionDrift]]: drift compares two snapshots against each
    * other, diversity watches one stream's mix concentration day by
    * day. Two cascaded aggregates, no joins. */
  def dailyDiversity(events: DataFrame, category: String = "event_type"): DataFrame =
    dailyDiversityServe(typeTimeCounts(events, category), category)

  /** The mergeable half shared by [[dailyDiversityServe]] and
    * Monitoring.diurnalServe: exact per-(day, hour-of-day, category)
    * counts. Plain sums at single-event grain — micro-batch boundaries
    * cannot sever anything, so the streaming seam
    * (streaming/StreamingMonitors.typeTimeStateSink) maintains THIS
    * frame and every daily-mix/diurnal consumer serves from it. */
  def typeTimeCounts(events: DataFrame, category: String = "event_type"): DataFrame =
    events
      .filter(col(category).isNotNull && col("ts").isNotNull)
      // hour-of-day from the INSTANT (unix_micros is timezone-free, and
      // equals ts_us on normalized frames), so ts is the only required
      // column — streaming batches and hand-built specs need no ts_us
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        expr("unix_micros(ts) % 86400000000 DIV 3600000000").cast("long").as("hour"),
        col(category))
      .groupBy("day", "hour", category).agg(count(lit(1)).as("c"))

  /** The serve half of [[dailyDiversity]] over a (day, hour, category, c)
    * counts frame — live or merged from the streaming state seam. */
  def dailyDiversityServe(counts: DataFrame, category: String = "event_type"): DataFrame = {
    val d = (c: Column) => c.cast("decimal(38,0)")
    counts
      .groupBy("day", category).agg(sum("c").as("c"))
      .groupBy("day")
      .agg(sum("c").as("n"), count(lit(1)).as("n_categories"),
        sum(d(col("c")) * d(col("c"))).as("sc2"))
      .withColumn("diversity",
        (d(col("n")) * d(col("n")) - col("sc2")).cast("double") /
          (d(col("n")) * d(col("n"))).cast("double"))
      .select("day", "n", "n_categories", "diversity")
  }

  /** k-anonymity census over a quasi-identifier tuple — the privacy
    * sibling of the PII scrub (TextAnalysis.piiScrub redacts direct
    * identifiers; this audits INDIRECT ones): group by the QI columns,
    * then per (first QI column) report how many QI groups exist, how
    * many are smaller than k, and how many rows sit in those small
    * groups — the re-identification exposure a release gate checks
    * before publishing a training corpus. Two cascaded integer
    * aggregates, no joins; the inner groupBy carries the full QI tuple
    * so the shuffle key is as wide as the audit itself. */
  def kAnonymityCensus(df: DataFrame, qiCols: Seq[String], k: Long = 5L): DataFrame = {
    require(qiCols.nonEmpty, "kAnonymityCensus: need at least one QI column")
    require(k >= 2L, s"kAnonymityCensus: k=$k must be >= 2")
    val groups = df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("n_rows"))
    groups.groupBy(col(qiCols.head))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("n_rows") < k, 1L).otherwise(0L)).as("n_small_groups"),
        sum(when(col("n_rows") < k, col("n_rows")).otherwise(0L)).as("n_rows_at_risk"))
  }

  /** Violated-expectation descriptions for one observed metrics row. */
  def evaluateObserved(metrics: org.apache.spark.sql.Row, rules: Seq[Rule]): Seq[String] =
    rules.filterNot { r =>
      val n = metrics.getAs[Long](s"n_rows_${r.column}")
      val nNull = metrics.getAs[Long](s"n_null_${r.column}")
      def minV = Option(metrics.getAs[java.lang.Double](s"min_${r.column}"))
      def maxV = Option(metrics.getAs[java.lang.Double](s"max_${r.column}"))
      r.check match {
        case "not_null" => nNull == 0L
        case "non_empty" => n > 0L
        case "min_at_least" => minV.forall(_ >= r.bound)
        case "max_at_most" => maxV.forall(_ <= r.bound)
        case other => throw new IllegalArgumentException(
          s"unknown or non-streaming check: $other")
      }
    }.map(_.describe)
}
