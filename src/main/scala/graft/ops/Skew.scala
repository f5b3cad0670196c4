package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-handling utilities for the 100 TB path. At test scale nothing here
  * matters; at cluster scale a single hot key (one station producing most
  * observations, one ubiquitous shingle) turns a groupBy/join into one
  * straggler task. Two standard remedies, kept as composable frame
  * transforms:
  *
  *  - salted two-phase aggregation: groupBy((key, salt)) partial → groupBy
  *    (key) final. Spark's map-side partial aggregation already handles
  *    commutative aggs; explicit salting is for the cases where the
  *    *reduce* side still concentrates (high-cardinality payload per key,
  *    e.g. collect-style or distinct-count aggs).
  *  - salted broadcast-replicated join: salt the big side, replicate the
  *    small side across salts — an equi-join that spreads one hot key over
  *    `salts` reducers. (AQE's skewJoin handles sort-merge skew
  *    automatically; this form is for deliberate pre-salting.)
  */
object Skew {

  /** Deterministic salt in [0, salts) from stable row attributes. */
  def salt(salts: Int, on: Column): Column = pmod(hash(on), lit(salts))

  /** Two-phase salted count-distinct per key: the canonical reduce-skew
    * agg (distinct explodes per-key state). Phase 1 dedups (key, salt,
    * value); phase 2 merges per-salt partial counts. */
  def saltedCountDistinct(df: DataFrame, key: String, value: String, salts: Int = 16): DataFrame =
    df.select(col(key), col(value), salt(salts, col(value)).as("__salt"))
      .groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(value)).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as(s"${value}_distinct"))

  /** Salt the fact side, replicate the dim side across all salts, join on
    * (key, salt). Result is identical to a plain equi-join. The salt is
    * derived from the row's CONTENT, never from monotonically_increasing_id
    * or rand(): nondeterministic salts change under task recomputation and
    * can duplicate/lose rows mid-shuffle (the rand()-salting failure
    * class). Identical rows share a salt — acceptable: the hot KEY still
    * spreads across salts because its rows differ in payload. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      salt(salts, struct(fact.columns.map(col): _*)))
    val replicated = dim.crossJoin(
      fact.sparkSession.range(salts).select(col("id").cast("int").as("__salt")))
    saltedFact.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Join-key skew audit — the measurement that DECIDES when the salting
    * above is worth its replication cost: the top-k hottest values of a
    * prospective join/aggregation key, each with its share of all rows
    * and the running cumulative share. A top key near 1/#partitions of
    * the total serializes its shuffle partition; reading this profile
    * before wiring a big join is how the 100 TB plan picks between a
    * plain shuffle, AQE skew splitting, and [[saltedJoin]]. One
    * aggregate + TakeOrdered(k) + a one-row total cross; the global
    * rank window runs over k rows, never the key universe. Shares are
    * single divisions of exact longs. */
  def keySkewAudit(df: DataFrame, keyCol: String, topK: Int = 20): DataFrame = {
    require(topK >= 1, s"keySkewAudit: topK=$topK must be >= 1")
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("n_total"))
    val byHeat = Window.orderBy(col("n").desc, col("key"))
    counts.orderBy(col("n").desc, col("key")).limit(topK)
      .crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(byHeat).cast("long"))
      .withColumn("share", col("n").cast("double") / col("n_total"))
      .withColumn("cum_share",
        sum("n").over(byHeat.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double") / col("n_total"))
      .select("key", "n", "rank", "share", "cum_share")
  }
}
