package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composite a training-data pipeline
  * runs over raw documents: drop near-duplicate losers (keep the lowest
  * doc_id of each dup pair), enforce a quality floor, attach language, and
  * report per-language corpus stats. Composes the dedup/quality/langid
  * operators; one extra anti-join and one aggregation on top of them. */
object Curation {

  /** At 100 TB set `useLsh = true` (bucket-bounded MinHash candidates) or
    * cap `maxDocFreq` (drop ubiquitous shingles) — the curated output is
    * identical up to LSH's documented false-negative rate because both
    * paths verify candidates with exact Jaccard at the same threshold. */
  def curate(docs: DataFrame, jaccardThreshold: Double = 0.8,
             qualityFloor: Double = 0.46, useLsh: Boolean = false,
             maxDocFreq: Int = Int.MaxValue): DataFrame = {
    val quality = TextAnalysis.quality(docs).select("doc_id", "quality_score")
    val pairs =
      if (useLsh) Dedup.minhashLsh(docs, jaccardThreshold)
      else Dedup.ngramJaccard(docs, jaccardThreshold, maxDocFreq = maxDocFreq)
    val losers = pairs.select(col("id2").as("doc_id")).distinct()
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

  /** The full training-corpus pipeline: near-dup removal + quality floor,
    * then the repetition cap, eval-set decontamination, and the
    * reproducible train split — the complete chain a corpus walks from raw
    * documents to train-ready, every stage oracle-checked on its own and
    * here in composition. All stages are per-row filters or key-bounded
    * anti-joins over ids, so the composite inherits each stage's scale
    * shape unchanged.
    *
    * Jaccard dedup and decontamination both consume shingle postings, so
    * the composite builds them ONCE under a shared scoped cache (the
    * `__eval` flag is a pure function of doc_id and is re-derived on the
    * postings) instead of paying two shingling passes — at 100 TB the
    * shingling scan is the dominant cost of both stages. */
  def trainReady(docs: DataFrame, jaccardThreshold: Double = 0.8,
                 qualityFloor: Double = 0.46, repetitionCap: Double = 0.1,
                 contaminationThreshold: Double = 0.5,
                 useLsh: Boolean = false): DataFrame = {
    val quality = TextAnalysis.quality(docs).select("doc_id", "quality_score")
    val rep = TextAnalysis.repetition(docs).select("doc_id", "top_bigram_frac")
    Dedup.withScopedCache(Dedup.postings(docs, n = 3)) { tok =>
      // useLsh swaps the quadratic-within-posting-list exact pair join for
      // banded MinHash candidates + exact verify — same threshold, same
      // shared postings, output identical up to LSH's documented
      // false-negative rate; the 100 TB default
      val pairs =
        if (useLsh) Dedup.minhashFrom(tok, jaccardThreshold)
        else Dedup.jaccardFrom(tok, jaccardThreshold, Int.MaxValue)
      val losers = pairs.select(col("id2").as("doc_id")).distinct()
      val contaminated = Dedup.decontaminateFrom(
          tok.withColumn("__eval", Sampling.splitColumn(col("doc_id")) === "eval"),
          contaminationThreshold, Int.MaxValue)
        .select(col("train_id").as("doc_id")).distinct()
      docs.select("doc_id", "lang")
        .join(quality, "doc_id")
        .filter(col("quality_score") >= qualityFloor)
        .join(losers, Seq("doc_id"), "left_anti")
        .filter(Sampling.splitColumn(col("doc_id")) === "train")
        // LEFT join: a doc too short to have a bigram (one word) has no
        // repetition row — that's vacuously unrepetitive, not a drop
        .join(rep, Seq("doc_id"), "left")
        .filter(coalesce(col("top_bigram_frac"), lit(0.0)) <= repetitionCap)
        .join(contaminated, Seq("doc_id"), "left_anti")
    }
  }

  /** Per-source post-curation token budget: what a training run will
    * actually READ — documents and whitespace tokens surviving the full
    * train-ready chain, per source. The capstone number a data lead asks
    * of a corpus ("how many tokens survive cleaning, and from where") —
    * trainReadyStats censuses quality by language; this prices the
    * budget by source. One join back to the corpus projection + one
    * aggregate past the chain. */
  def tokenBudget(docs: DataFrame): DataFrame =
    trainReady(docs).select("doc_id")
      .join(docs.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens")), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs_kept"), sum("n_tokens").as("n_tokens_kept"))

  /** Per-language census of the train-ready corpus. */
  def trainReadyStats(docs: DataFrame): DataFrame =
    trainReady(docs)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        (sum(col("quality_score").cast("decimal(18,12)")).cast("double") / count(lit(1)))
          .as("mean_quality"))
      .orderBy("lang")
}
