package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composite a training-data pipeline
  * runs over raw documents: drop near-duplicate losers (keep the lowest
  * doc_id of each dup pair), enforce a quality floor, attach language, and
  * report per-language corpus stats. Composes the dedup/quality/langid
  * operators; one extra anti-join and one aggregation on top of them. */
object Curation {

  def curate(docs: DataFrame, jaccardThreshold: Double = 0.8,
             qualityFloor: Double = 0.46): DataFrame = {
    val quality = TextAnalysis.quality(docs).select("doc_id", "quality_score")
    val losers = Dedup.ngramJaccard(docs, jaccardThreshold)
      .select(col("id2").as("doc_id")).distinct()
    docs.select("doc_id", "lang")
      .join(quality, "doc_id")
      .join(losers, Seq("doc_id"), "left_anti")
      .filter(col("quality_score") >= qualityFloor)
  }

  /** Per-language stats of the curated corpus (decimal-exact mean). */
  def curationStats(docs: DataFrame): DataFrame =
    curate(docs)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_kept"),
        (sum(col("quality_score").cast("decimal(18,12)")).cast("double") / count(lit(1)))
          .as("mean_quality"),
        min("quality_score").as("min_quality"),
        max("quality_score").as("max_quality"))
      .orderBy("lang")
}
