package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
}
