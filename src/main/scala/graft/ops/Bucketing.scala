package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins: for a join key used repeatedly (orders ⋈
  * lineitem on orderkey at every monitoring refresh), pre-bucketing both
  * sides by that key removes the shuffle from EVERY subsequent join — at
  * 100 TB that is the difference between re-shuffling the fact table per
  * query and a zero-exchange sort-merge join.
  *
  * Bucketed layout requires catalog tables (bucket metadata lives in the
  * catalog, not the files), hence saveAsTable rather than parquet paths. */
object Bucketing {

  /** Write both sides bucketed by the join key into the session catalog. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int = 8): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables — plan should contain no Exchange on
    * either side (verify with .explain / the BucketingSpec assertion). */
  def colocatedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
