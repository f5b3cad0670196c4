package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) subword tokenizer beside BPE — the
  * other production tokenizer family: where BPE composes pieces bottom-up
  * by greedy pair merges, the unigram model holds a CANDIDATE piece
  * vocabulary with per-piece costs and segments each word by the
  * minimum-cost path (Viterbi); training alternates segmentation and
  * cost re-estimation (EM).
  *
  * This is the HARD-EM (Viterbi-E-step) variant in exact integer
  * arithmetic, which is what makes it engine-portable: piece costs are
  * quantized micro-nats (the bigram-LM discipline — one `round(ln·10⁶)`
  * per piece per round, HALF_UP like both engines' round(), never a
  * float accumulation), the Viterbi DP adds LONG costs with a
  * (cost, segmentation-string) lexicographic tie rule, and the M-step
  * recount is an integer sum. A fixed round count is therefore
  * bit-deterministic, and the DuckDB oracle replays the WHOLE trainer —
  * seed substring counts, per-position DP (unrolled CTEs, the PageRank
  * pattern), recount, re-score — and hash-matches vocabulary, token
  * counts, and fertility.
  *
  * Vocabulary contract: candidate pieces are substrings (length ≤
  * [[maxPieceLen]]) of the `[a-z]+` word universe (Bpe.wordCounts'
  * regex), words longer than [[maxWordLen]] excluded — the oracle's DP
  * unroll bound, stated loudly rather than silently mis-segmented. All
  * single characters stay candidates, so every word always segments.
  *
  * Scale shape — the Bpe.trainFromCountsDeep seam: the sufficient
  * statistic is the SAME bounded weighted word-count frame BPE trains
  * from (ONE corpus scan, ≤ [[wordLimit]] rows by (count desc, word)),
  * collected once; the EM rounds run driver-side on those bounded rows
  * (an earlier in-engine relational DP was measured at ~40 Spark jobs
  * of pure scheduling overhead over ≤65k rows — the driver loop is the
  * honest shape for bounded-artifact training, exactly like the deep
  * BPE trainer). Apply-side pricing is one broadcast join of the
  * word→pieces table against the corpus — merge-table-replay economics. */
object Ulm {

  /** Oracle DP unroll bound — words longer than this are outside the
    * trained vocabulary (both engines apply the same filter). */
  val maxWordLen = 16

  /** Longest candidate piece. */
  val maxPieceLen = 4

  /** Multi-char candidate cap (single chars always kept). */
  val vocabSize = 1024

  /** Word-statistic cap, Bpe.trainFromCounts' convention. */
  val wordLimit = 65536

  /** One trained piece: final hard count and micro-nat cost. */
  final case class Piece(piece: String, cnt: Long, qcost: Long)

  /** One segmented vocabulary word: weight, total cost, space-joined
    * pieces, piece count. */
  final case class WordSeg(word: String, n: Long, cost: Long, seg: String,
                           n_pieces: Long)

  /** round(x) with BOTH engines' tie rule (HALF_UP = away from zero —
    * Spark round() and DuckDB round(); math.round would round −2.5 to
    * −2 instead of −3). */
  private def roundHalfUp(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  private def qcostOf(cnt: Long, total: Long, v: Long): Long =
    -roundHalfUp(math.log((cnt + 1).toDouble / (total + v).toDouble) * 1000000.0)

  /** The driver trainer: seed substring counts → (rounds ×) Viterbi
    * segmentation + recount + re-score. Pure integers except the one
    * quantized log per piece per round. */
  private[ops] def trainDriver(words: Array[(String, Long)], rounds: Int)
      : (Seq[Piece], Seq[WordSeg]) = {
    require(rounds >= 1 && rounds <= 8, s"Ulm rounds=$rounds out of [1, 8]")
    import scala.collection.mutable
    // seed: every substring of length <= maxPieceLen, weighted
    val seed = mutable.HashMap.empty[String, Long]
    for ((w, n) <- words; i <- 0 until w.length;
         k <- 1 to math.min(maxPieceLen, w.length - i))
      seed.updateWith(w.substring(i, i + k)) { c => Some(c.getOrElse(0L) + n) }
    // candidate set: top vocabSize by (cnt desc, piece) + all single chars
    val ranked = seed.toSeq.sortBy { case (p, c) => (-c, p) }
    val cand: Seq[String] =
      (ranked.take(vocabSize).map(_._1) ++
        seed.keys.filter(_.length == 1)).distinct.sorted
    val candSet = cand.toSet
    val v = cand.size.toLong
    val total0 = cand.map(seed).sum
    var costs: Map[String, Long] =
      cand.map(p => p -> qcostOf(seed(p), total0, v)).toMap

    def segment(): Seq[WordSeg] = words.toSeq.map { case (w, n) =>
      // dp(j) = best (cost, seg) over the first j chars; ties by seg,
      // compared WITH the leading space (the oracle's exact strings)
      val dp = new Array[(Long, String)](w.length + 1)
      dp(0) = (0L, "")
      for (j <- 1 to w.length) {
        var best: (Long, String) = null
        for (k <- 1 to math.min(maxPieceLen, j)) {
          val piece = w.substring(j - k, j)
          costs.get(piece).foreach { qc =>
            val c = dp(j - k)._1 + qc
            val s = dp(j - k)._2 + " " + piece
            if (best == null || c < best._1 ||
              (c == best._1 && s.compareTo(best._2) < 0)) best = (c, s)
          }
        }
        dp(j) = best // never null: single chars are always candidates
      }
      val (c, s) = dp(w.length)
      val trimmed = s.substring(1)
      WordSeg(w, n, c, trimmed, trimmed.count(_ == ' ') + 1L)
    }

    var segs: Seq[WordSeg] = Seq.empty
    var lastCnts: Map[String, Long] = Map.empty
    for (_ <- 1 to rounds) {
      segs = segment()
      val cnts = mutable.HashMap.empty[String, Long]
      for (ws <- segs; p <- ws.seg.split(" "))
        cnts.updateWith(p) { c => Some(c.getOrElse(0L) + ws.n) }
      val totalR = cnts.valuesIterator.sum
      costs = cand.map(p => p -> qcostOf(cnts.getOrElse(p, 0L), totalR, v)).toMap
      lastCnts = cnts.toMap
    }
    require(candSet.nonEmpty)
    val pieces = cand.collect {
      case p if lastCnts.getOrElse(p, 0L) > 0L => Piece(p, lastCnts(p), costs(p))
    }
    (pieces, segs)
  }

  /** The bounded word statistic, collected once (the trainDeep seam). */
  private def collectWords(docs: DataFrame): Array[(String, Long)] =
    Bpe.wordCounts(docs)
      .filter(length(col("word")) <= maxWordLen)
      .orderBy(col("n").desc, col("word"))
      .limit(wordLimit)
      .collect().map(r => (r.getString(0), r.getLong(1)))

  /** The trained model as frames: (vocab = (piece, cnt, qcost) with the
    * final segmentation's counts and re-estimated costs; segments =
    * (word, n, cost, seg, n_pieces) under the final Viterbi pass). */
  def model(docs: DataFrame, rounds: Int = 2): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (pieces, segs) = trainDriver(collectWords(docs), rounds)
    (pieces.toDF("piece", "cnt", "qcost"),
      segs.toDF("word", "n", "cost", "seg", "n_pieces"))
  }

  /** The vocabulary entry: final pieces in use, counts, micro-nat costs. */
  def vocab(docs: DataFrame, rounds: Int = 2): DataFrame =
    model(docs, rounds)._1

  /** The stored word→pieces table through the Artifacts seam — the
    * train-once/serve-many face (the bigramModel pattern): first touch
    * trains and writes the ≤[[wordLimit]]-row segmentation table; every
    * later pricing run reads the parquet, ZERO training jobs. Training
    * is bit-deterministic and longs/strings round-trip parquet exactly,
    * so the artifact is a cache, never a fork. */
  def segmentArtifact(docs: DataFrame, path: String, rounds: Int = 2): DataFrame =
    Artifacts.parquetArtifact(docs.sparkSession, path)(
      model(docs, rounds)._2.coalesce(1))

  /** [[tokenCounts]] against a STORED segmentation table. On the
    * training corpus itself every priced word is in the table, so the
    * stored face equals the live entry exactly — it shares the oracle.
    *
    * CAP-INDUCED DROP, stated loudly (like the [[maxWordLen]]
    * exclusion): the segmentation table is bounded at [[wordLimit]]
    * distinct words. On a corpus with MORE distinct in-universe words
    * than the cap, the inner join silently drops out-of-cap words from
    * BOTH n_words and n_ulm_tokens — they are neither counted nor
    * priced. Both engines apply the same cap so oracles stay green, and
    * "every priced word is in the table" holds only below the cap;
    * raise [[wordLimit]] (or pre-filter the corpus) if full coverage of
    * a larger vocabulary is required. The same cap governs
    * [[fertility]]. */
  def tokenCountsFrom(docs: DataFrame, segs: DataFrame): DataFrame = {
    require(segs.columns.contains("word") && segs.columns.contains("n_pieces"),
      s"tokenCountsFrom: need (word, n_pieces) columns, got ${segs.columns.mkString(",")}")
    val agg = docWords(docs)
      .join(broadcast(segs.select(col("word"), col("n_pieces"))), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nw"), sum("n_pieces").as("np"))
    docs.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nw"), lit(0L)).as("n_words"),
        coalesce(col("np"), lit(0L)).as("n_ulm_tokens"))
  }

  /** Per-doc ULM token pricing: one broadcast join of the word→pieces
    * table against the corpus words (the trained-vocabulary universe:
    * `[a-z]+`, ≤ [[maxWordLen]] chars), zero-word docs priced 0. */
  def tokenCounts(docs: DataFrame, rounds: Int = 2): DataFrame =
    tokenCountsFrom(docs, model(docs, rounds)._2)

  /** Per-language fertility (pieces per priced word) — the
    * Bpe.fertility comparison entry in ULM units, over the trained
    * vocabulary's word universe; exact integer sums, ONE division per
    * language. */
  def fertility(docs: DataFrame, rounds: Int = 2): DataFrame = {
    val segs = model(docs, rounds)._2
    docWords(docs, withLang = true)
      .join(broadcast(segs.select(col("word"), col("n_pieces"))), "word")
      .groupBy("lang")
      .agg(countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_words"), sum("n_pieces").as("n_ulm_pieces"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_ulm_pieces"),
        (col("n_ulm_pieces").cast("double") / col("n_words")).as("fertility"))
  }

  private def docWords(docs: DataFrame, withLang: Boolean = false): DataFrame = {
    val base = if (withLang) docs.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("word"))
    else docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    base.filter(col("word").rlike("^[a-z]+$") &&
      length(col("word")) <= maxWordLen)
  }
}
