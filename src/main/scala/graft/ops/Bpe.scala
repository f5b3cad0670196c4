package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Subword (BPE) tokenization — the pricing unit a training-data
  * pipeline actually budgets in. Whitespace tokens (TextAnalysis
  * .tokenCounts, Curation.tokenBudget) over-count short function words
  * and under-count rare long ones; a byte-pair-encoded vocabulary prices
  * every document in the units the trainer consumes.
  *
  * Word-level BPE in the classic Sennrich formulation: merges never
  * cross word boundaries, so the training state is the WEIGHTED WORD
  * VOCABULARY — one corpus scan collects (word, count), and every merge
  * round runs on that bounded frame, never the corpus again. The same
  * train-once/apply-many artifact seam as Similarity's centroids and
  * codebooks: [[train]] emits the merge table (≤ 64 rows, the k-center
  * bound), [[tokenCounts]] applies it per row in a single zero-shuffle
  * corpus scan.
  *
  * Sequence encoding — the engine-portability core: a word's token
  * sequence is one string, tokens separated by DOUBLE spaces with a
  * single leading/trailing space (" h  e  l  l  o "). Applying merge
  * (A, B) is then plain `replace(seq, " A  B ", " AB ")`: the
  * single-space boundaries stop a pair from matching inside a longer
  * token ("aa a" never matches " a  a "), and sequential leftmost
  * non-overlapping replacement — the semantics Spark's `replace` and
  * DuckDB's share — IS BPE's greedy left-to-right merge order, because
  * each match consumes one boundary space from each side and the
  * replacement restores them, so back-to-back pairs stay matchable
  * (" a  a  a  a " → " aa  aa ") while overlapping ones don't
  * (" a  a  a " → " aa  a "). No regex, no lookaround, no UDF: the
  * whole family is codegen'd string/array expressions, and the DuckDB
  * oracle unrolls the identical rounds as chained materialized CTEs and
  * hash-matches bit-for-bit (the kCenterSelect pattern).
  *
  * Scope convention: only all-lowercase-ASCII words (`^[a-z]+$`) enter
  * the vocabulary and the subword count; any other word prices as ONE
  * token (an OOV), so the count is total over arbitrary text. Pair
  * counts count every adjacent occurrence (overlaps included — "aaa"
  * holds (a,a) twice), ties break (count desc, left, right) — all
  * conventions the oracle replays exactly.
  *
  * 100 TB shape: training is one corpus scan + `nMerges` jobs over a
  * `vocabLimit`-capped frame (top words by (count desc, word) — the
  * deterministic bounded-sample seam; frequency-ranked words carry
  * almost all pair mass, so the cap costs little fidelity), each round
  * a 1-row collect like the k-center loop. Application is a per-row
  * expression chain — no shuffle, no state, embarrassingly parallel. */
object Bpe {

  /** One learned merge: rank-th most frequent adjacent pair at its
    * round, with the weighted pair count that won it. */
  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** The spaced sequence encoding of a word: chars joined by double
    * spaces, single-space boundaries. */
  private def seqEncode(word: Column): Column =
    concat(lit(" "), array_join(split(word, ""), "  "), lit(" "))

  private def applyMerge(seq: Column, a: String, b: String): Column =
    replace(seq, lit(s" $a  $b "), lit(s" $a$b "))

  /** The weighted word-count frame (word, n) — BPE training's SUFFICIENT
    * STATISTIC, and a count monoid: training depends on the corpus only
    * through these counts, and counts of a union are the summed counts
    * of the parts. That makes the stored vocab frame the natural
    * incremental artifact: [[vocabIncrement]] merges a batch without
    * touching the seen corpus, and [[trainFromCounts]] on the merged
    * frame is EXACTLY a full retrain (spec'd, and the increment query's
    * oracle IS the full-corpus training SQL). One corpus scan. */
  def wordCounts(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Merge a NEW batch into a stored word-count frame: union + sum, the
    * monoid merge — O(batch) new work plus one aggregate over distinct
    * words, the seen corpus never re-read. The rolling-ingest member
    * that keeps the tokenizer artifact current (the exactIncrement /
    * indexIncrement shape, but EXACT by algebra, not by index probing:
    * retraining on the merged counts equals retraining on the union
    * corpus bit-for-bit). */
  def vocabIncrement(stored: DataFrame, newDocs: DataFrame): DataFrame = {
    require(stored.columns.toSet == Set("word", "n"),
      s"vocabIncrement: stored must be a (word, n) frame, got ${stored.columns.mkString(",")}")
    // type-validate like componentsIncrement's stored frame: an
    // arbitrary frame that happens to share the column names must fail
    // loudly, not silently merge garbage into the artifact
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
    require(stored.schema("word").dataType == StringType,
      s"vocabIncrement: stored.word is ${stored.schema("word").dataType}, need string")
    val nOk = stored.schema("n").dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    require(nOk,
      s"vocabIncrement: stored.n is ${stored.schema("n").dataType}, need an integral count")
    stored.select(col("word"), col("n").cast("long").as("n"))
      .unionByName(wordCounts(newDocs))
      .groupBy("word").agg(sum("n").as("n"))
  }

  /** Train a BPE merge table on the corpus: `nMerges` greedy rounds over
    * the weighted word vocabulary (capped at `vocabLimit` words by
    * (count desc, word)). One corpus scan total; each round is one
    * aggregate + one 1-row collect on the bounded vocab frame. Stops
    * early when no adjacent pair remains (every word fully merged). */
  def train(docs: DataFrame, nMerges: Int = 16,
            vocabLimit: Int = 65536): Seq[Merge] =
    trainFromCounts(wordCounts(docs), nMerges, vocabLimit)

  /** [[train]] from a word-count frame (the stored artifact or a
    * [[vocabIncrement]] result). Delegates to the driver greedy loop of
    * [[trainFromCountsDeep]]: greedy BPE is prefix-consistent and the
    * two trainers are merge-for-merge identical (BpeSpec pins the
    * property on random corpora, counts included), and the shallow
    * per-round Spark shape paid 2 jobs PER MERGE over a
    * vocabLimit-bounded frame — 32 driver round-trips at the default
    * depth where one capped collect (the deep/artifact path's
    * documented bounded transfer) suffices. The distributed per-round
    * implementation stays as [[trainFromCountsDistributed]], both as
    * the spec's comparison subject and as the escape hatch for a vocab
    * cap too large to collect. */
  def trainFromCounts(vocab: DataFrame, nMerges: Int = 16,
                      vocabLimit: Int = 65536): Seq[Merge] = {
    require(nMerges >= 1 && nMerges <= 64,
      s"Bpe.train: nMerges=$nMerges out of [1, 64] — this is a bounded " +
        "artifact trainer, not an unbounded vocabulary builder")
    require(vocabLimit >= 1, s"Bpe.train: vocabLimit=$vocabLimit")
    trainFromCountsDeep(vocab, nMerges, vocabLimit)
  }

  /** The per-round DISTRIBUTED trainer the shallow entry used before
    * delegating to the driver loop: each round aggregates pair counts
    * over the capped vocab frame and TakeOrdered-collects the single
    * winner. Kept (package-visible) so BpeSpec can keep pinning the
    * driver loop against an independently-computed merge sequence —
    * and for a deployment whose vocab cap genuinely cannot collect. */
  private[graft] def trainFromCountsDistributed(
      vocab: DataFrame, nMerges: Int = 16,
      vocabLimit: Int = 65536): Seq[Merge] = {
    require(nMerges >= 1 && nMerges <= 64,
      s"Bpe.train: nMerges=$nMerges out of [1, 64] — this is a bounded " +
        "artifact trainer, not an unbounded vocabulary builder")
    require(vocabLimit >= 1, s"Bpe.train: vocabLimit=$vocabLimit")
    // ordering by the encoded seq ≡ ordering by word (the encoding maps
    // each char to a fixed block, preserving lexicographic comparison),
    // so the cap's tie rule is the oracle's ORDER BY n DESC, seq
    var state = vocab
      .select(seqEncode(col("word")).as("seq"), col("n"))
      .orderBy(col("n").desc, col("seq"))
      .limit(vocabLimit)
      .localCheckpoint(false) // the ONE corpus scan; rounds run off this
    var merges = Seq.empty[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      val best = state
        .select(col("n"), split(trim(col("seq")), "  ").as("tk"))
        .filter(size(col("tk")) > 1)
        .select(col("n"), explode(expr(
          "transform(sequence(1, size(tk) - 1), i -> struct(tk[i-1] AS t1, tk[i] AS t2))"))
          .as("pr"))
        .groupBy(col("pr.t1").as("t1"), col("pr.t2").as("t2"))
        .agg(sum("n").as("c"))
        .orderBy(col("c").desc, col("t1"), col("t2"))
        .limit(1).collect() // 1 row per round, nMerges ≤ 64 enforced
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, c) = (best.head.getString(0), best.head.getString(1),
          best.head.getLong(2))
        merges :+= Merge(rank, a, b, c)
        state = state
          .select(applyMerge(col("seq"), a, b).as("seq"), col("n"))
          .localCheckpoint(false) // vocabLimit-bounded, lineage cut per round
        rank += 1
      }
    }
    merges
  }

  /** PRODUCTION-DEPTH trainer: the same greedy algorithm past the
    * unrolled oracle's 64-round bound. The vocabLimit-capped weighted
    * word vocabulary is the bounded sufficient statistic — ONE corpus
    * scan builds it, one capped collect brings it to the driver, and
    * the ≥1024 merge rounds run there with incrementally-maintained
    * pair counts (the classic Sennrich trainer: only words containing
    * the winning pair re-count). Identical conventions to [[train]] —
    * overlap-counted pairs, (count desc, left, right) ties, leftmost
    * non-overlapping application, early stop on exhaustion — and greedy
    * BPE is PREFIX-CONSISTENT, so the first k merges of a deep table
    * ARE the k-round table: the oracle-green 16-round entry is the deep
    * entry's structural companion, and BpeSpec pins the prefix equality
    * plus the golden sequence on the deep path.
    *
    * 100 TB shape: the corpus cost is ONE scan (the word-count
    * aggregate); the driver works on ≤ vocabLimit rows — the same
    * bounded-artifact seam as the k-center exemplars, just a deeper
    * in-memory loop. Apply-side depth is free: [[docSeqReplay]]'s replay is a
    * constant-size codegen'd loop over the table. */
  def trainDeep(docs: DataFrame, nMerges: Int = 1024,
                vocabLimit: Int = 65536): Seq[Merge] =
    trainFromCountsDeep(wordCounts(docs), nMerges, vocabLimit)

  /** [[trainDeep]] from a stored word-count frame. */
  def trainFromCountsDeep(vocab: DataFrame, nMerges: Int = 1024,
                          vocabLimit: Int = 65536): Seq[Merge] = {
    require(nMerges >= 1 && nMerges <= 65536,
      s"Bpe.trainDeep: nMerges=$nMerges out of [1, 65536]")
    require(vocabLimit >= 1 && vocabLimit <= (1 << 20),
      s"Bpe.trainDeep: vocabLimit=$vocabLimit out of [1, 2^20]")
    // accept the same stored artifacts vocabIncrement does: validate the
    // (word, integral n) shape loudly, then widen n to long BEFORE the
    // collect so an int/short/byte-counted frame doesn't ClassCastException
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
    require(vocab.schema("word").dataType == StringType,
      s"Bpe.trainDeep: vocab.word is ${vocab.schema("word").dataType}, need string")
    val nOk = vocab.schema("n").dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    require(nOk,
      s"Bpe.trainDeep: vocab.n is ${vocab.schema("n").dataType}, need an integral count")
    val rows = vocab
      .select(col("word"), col("n").cast("long").as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(vocabLimit)
      .collect() // bounded by vocabLimit — the one driver transfer
    trainDriver(rows.map(r => (r.getString(0), r.getLong(1))), nMerges)
  }

  /** The driver loop: exact incremental pair bookkeeping. `index` maps a
    * pair to the word ids that held it when last (re-)encoded — entries
    * go stale as words merge (append-only sets), so applications
    * re-check adjacency; `counts` is maintained EXACTLY by +/- deltas,
    * so selection never sees a stale number. Vocabulary is ^[a-z]+$ by
    * [[wordCounts]], where JVM string order == UTF8 binary order, so
    * the tie rule is the distributed trainer's bit-for-bit. */
  private[ops] def trainDriver(vocab: Array[(String, Long)],
                               nMerges: Int): Seq[Merge] = {
    import scala.collection.mutable
    val words = vocab.map { case (w, n) => (w.map(_.toString).toArray, n) }
    val counts = mutable.HashMap.empty[(String, String), Long]
    val index = mutable.HashMap.empty[(String, String), mutable.ArrayBuffer[Int]]
    def bump(toks: Array[String], n: Long, id: Int, fresh: Boolean): Unit = {
      var i = 0
      while (i < toks.length - 1) {
        val p = (toks(i), toks(i + 1))
        counts(p) = counts.getOrElse(p, 0L) + n
        if (fresh) index.getOrElseUpdate(p, mutable.ArrayBuffer.empty) += id
        i += 1
      }
    }
    words.zipWithIndex.foreach { case ((t, n), id) => bump(t, n, id, fresh = true) }
    def applyTo(t: Array[String], a: String, b: String): Array[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < t.length) {
        if (i + 1 < t.length && t(i) == a && t(i + 1) == b) { out += (a + b); i += 2 }
        else { out += t(i); i += 1 }
      }
      out.toArray
    }
    val merges = mutable.ArrayBuffer.empty[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      var best: (String, String) = null
      var bestC = 0L
      counts.foreach { case (p, c) =>
        if (c > 0 && (best == null || c > bestC || (c == bestC &&
          (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2))))) {
          best = p; bestC = c
        }
      }
      if (best == null) exhausted = true
      else {
        val (a, b) = best
        merges += Merge(rank, a, b, bestC)
        index.getOrElse(best, mutable.ArrayBuffer.empty).distinct.foreach { id =>
          val (toks, n) = words(id)
          // stale-entry check: the id may have merged past this pair
          var holds = false
          var i = 0
          while (!holds && i < toks.length - 1) {
            holds = toks(i) == a && toks(i + 1) == b; i += 1
          }
          if (holds) {
            bump(toks, -n, id, fresh = false)
            val merged = applyTo(toks, a, b)
            words(id) = (merged, n)
            bump(merged, n, id, fresh = true)
          }
        }
        rank += 1
      }
    }
    merges.toSeq
  }

  /** [[trainDeep]] as the persistable artifact frame. */
  def trainDeepMerges(docs: DataFrame, nMerges: Int = 1024,
                      vocabLimit: Int = 65536): DataFrame =
    mergesFrame(docs.sparkSession, trainDeep(docs, nMerges, vocabLimit))

  /** Write-once merge-table artifact — the nightly-tokenizer seam: the
    * first touch trains [[trainDeep]] and persists the frame, every
    * later touch READS the ≤nMerges-row file (the centroidArtifact
    * _SUCCESS-probe pattern), so pricing consumers NEVER retrain.
    * Training is bit-deterministic and the frame round-trips parquet
    * exactly, so the artifact is a cache, never a semantic fork;
    * callers own invalidation (retrain on corpus change). */
  def mergeArtifact(docs: DataFrame, path: String, nMerges: Int = 1024,
                    vocabLimit: Int = 65536): DataFrame =
    Artifacts.parquetArtifact(docs.sparkSession, path)(
      trainDeepMerges(docs, nMerges, vocabLimit).coalesce(1))

  /** A STORED merge frame back to the replayable merge list — the apply
    * side of the artifact seam, feeding [[tokenCounts]]/[[segments]]/
    * [[tokenCountColumn]] without a training job. Validates the shape
    * loudly (the vocabIncrement convention) and re-sorts by rank:
    * parquet carries no order and replay order IS the model. Bounded by
    * the trainer's 65536-merge cap — a bigger frame is not a merge
    * table and fails before the collect. */
  def mergesFromFrame(frame: DataFrame): Seq[Merge] = {
    import org.apache.spark.sql.types.StringType
    val need = Set("rank", "left_tok", "right_tok", "pair_count")
    require(need.subsetOf(frame.columns.toSet),
      s"mergesFromFrame: need columns $need, got ${frame.columns.mkString(",")}")
    require(frame.schema("left_tok").dataType == StringType &&
      frame.schema("right_tok").dataType == StringType,
      "mergesFromFrame: left_tok/right_tok must be strings")
    val rows = frame
      .select(col("rank").cast("int"), col("left_tok"), col("right_tok"),
        col("pair_count").cast("long"))
      .orderBy(col("rank"))
      .limit(65537)
      .collect() // bounded by the 65536 cap checked right below
    require(rows.length <= 65536,
      s"mergesFromFrame: ${rows.length} rows exceed the 65536-merge cap")
    rows.map(r => Merge(r.getInt(0), r.getString(1), r.getString(2),
      r.getLong(3))).toSeq
  }

  /** A merge list as the persistable artifact frame:
    * (rank, left_tok, right_tok, merged, pair_count). */
  def mergesFrame(spark: org.apache.spark.sql.SparkSession,
                  merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges
      .map(m => (m.rank, m.left, m.right, m.left + m.right, m.count))
      .toDF("rank", "left_tok", "right_tok", "merged", "pair_count")
  }

  /** [[train]] as the persistable artifact frame. */
  def trainMerges(docs: DataFrame, nMerges: Int = 16,
                  vocabLimit: Int = 65536): DataFrame =
    mergesFrame(docs.sparkSession, train(docs, nMerges, vocabLimit))

  /** The replayed sequence of a whole document under a trained merge
    * table. Every word encodes into ONE joined string — vocabulary
    * (`[a-z]+`) words as spaced char sequences, OOV words embedded
    * VERBATIM as one unmergeable token (they contain a non-[a-z] char
    * and no spaces, so no " A  B " pattern can fire inside them; the
    * degenerate empty word becomes the U+0001 sentinel), words
    * separated by a 3-space join (so with each element's boundary
    * spaces, 5 spaces stand between words) — and the merge replay runs
    * as `nMerges` GLOBAL replaces over that one string. Equivalent to a
    * per-word replay: merge patterns carry exactly one boundary space
    * each side and restore it, so the 5-space word gap can never
    * match, and global leftmost order restricted to one word IS that
    * word's leftmost order. The degenerate EMPTY word (consecutive
    * input spaces) becomes the control char U+0001 — a sentinel
    * OUTSIDE the input alphabet, so it still prices as one token but
    * can never be conflated with a genuine document token the way a
    * printable placeholder would (r13 advice: "0" fabricated tokens
    * byte-identical to a real OOV "0"). The point is codegen: a per-word fold runs
    * the replace chain inside an interpreted higher-order lambda
    * (measured ~3x slower); here the lambda only encodes, and the 16
    * replaces are codegen'd string ops. Tokens = non-space runs. */
  private[graft] def docSeqReplay(text: Column, merges: Seq[Merge]): Column = {
    val encoded = transform(split(text, " "), w =>
      when(w.rlike("^[a-z]+$"), seqEncode(w))
        .when(length(w) === 0, lit(" \u0001 "))
        .otherwise(concat(lit(" "), w, lit(" "))))
    // the replay is a depth-independent codegen'd loop, not an unrolled
    // replace fold: a fold nests one expression node per merge and
    // janino's 64 KB method limit silently drops ~64+ merges to
    // interpreted eval, while a production table carries 1024+
    graft.functions.TextFunctions.mergeReplay(array_join(encoded, "   "),
      merges.map(m => s" ${m.left}  ${m.right} "),
      merges.map(m => s" ${m.left}${m.right} "))
  }

  /** The replace-chain pricer — [[docSeqReplay]] counted. Retained as the
    * semantic reference the word-wise encoder is spec-pinned against
    * (BpeSpec: fast ≡ replay, bit-for-bit). */
  private[graft] def docTokensReplay(text: Column, merges: Seq[Merge]): Column =
    size(split(trim(docSeqReplay(text, merges)), " +")).cast("long")

  /** [[docSeqReplay]]'s normalized token stream — the segments form. */
  private[graft] def docSegmentsReplay(text: Column, merges: Seq[Merge]): Column =
    regexp_replace(trim(docSeqReplay(text, merges)), " +", " ")

  // The serving path: the word-wise compiled-table encoder
  // (functions/BpeEncodeKernel). O(applicable merges × word len) int
  // compares per word instead of O(table depth × doc len) byte compares
  // per document — the replay chain measured ~7 µs/byte at production
  // depth (1024 merges), which prices a 100 TB corpus in cluster-months;
  // the compiled table is depth-independent. Bit-equality with the
  // replay chain is spec-pinned on the golden corpus, the real documents
  // table, and adversarial generated tables.
  private def docTokens(text: Column, merges: Seq[Merge]): Column =
    graft.functions.TextFunctions.bpeCount(text,
      merges.map(_.left), merges.map(_.right))

  /** The per-row BPE token pricer as a bare column — the composition
    * seam for consumers that take a token expression (sequence packing,
    * length bucketing) rather than a frame. */
  def tokenCountColumn(text: Column, merges: Seq[Merge]): Column =
    docTokens(text, merges)

  /** Per-document subword pricing: BPE token count under `merges` next
    * to the whitespace count it refines. One corpus scan, zero shuffle —
    * the whole merge replay is a per-row codegen'd expression chain.
    * STREAMING-TRANSPARENT: a pure per-row select, so the same code
    * prices an arriving micro-batch against the stored merge artifact
    * (spec-pinned stream ≡ batch). */
  def tokenCounts(docs: DataFrame, merges: Seq[Merge]): DataFrame =
    docs.select(
      col("doc_id"),
      docTokens(col("text"), merges).as("n_bpe_tokens"),
      size(split(col("text"), " ")).cast("long").as("n_ws_tokens"))

  /** The tokenizer's actual OUTPUT, not just its count: each document's
    * BPE token sequence as a single-space-joined string (word
    * boundaries flatten — a token stream is what the trainer consumes),
    * with the count alongside. OOV words pass through verbatim as one
    * token. Same one-scan zero-shuffle per-row shape as
    * [[tokenCounts]], and STREAMING-TRANSPARENT the same way: the
    * replay is a pure per-row expression, so arriving micro-batches
    * segment against the stored merge artifact with this same code
    * (spec-pinned stream ≡ batch in StreamingMonitorsSpec); the oracle
    * replays the identical merges per word and reassembles in position
    * order. */
  def segments(docs: DataFrame, merges: Seq[Merge]): DataFrame =
    docs.select(
      col("doc_id"),
      graft.functions.TextFunctions.bpeJoin(col("text"),
        merges.map(_.left), merges.map(_.right)).as("bpe_text"))
      .withColumn("n_bpe_tokens",
        size(split(col("bpe_text"), " ")).cast("long"))

  /** Tokenizer-quality scorecard: per-source corpus BYTES against BPE
    * tokens — bytes-per-token is THE compression metric a tokenizer
    * evaluation tracks (a source whose ratio collapses toward 1 is
    * pricing almost every byte as its own token: boilerplate, foreign
    * script, or junk the vocabulary never learned). Exact integer sums
    * (byte and token counts are per-row longs), the ratio ONE
    * correctly-rounded division of the two exact totals per source —
    * engine-portable. One corpus scan, the per-row replay chain, one
    * aggregate; sources are a dimension, so the result is tiny at any
    * corpus scale. */
  def compression(docs: DataFrame, merges: Seq[Merge]): DataFrame =
    docs.select(col("source"),
        octet_length(col("text")).cast("long").as("nb"),
        docTokens(col("text"), merges).as("nt"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("nb").as("n_bytes"),
        sum("nt").as("n_bpe_tokens"))
      .select(col("source"), col("n_docs"), col("n_bytes"), col("n_bpe_tokens"),
        (col("n_bytes").cast("double") / col("n_bpe_tokens"))
          .as("bytes_per_token"))

  /** Per-language tokenizer fertility — BPE tokens per whitespace word,
    * the multilingual-equity metric a tokenizer eval tracks (a vocabulary
    * trained on one language over-segments the others; fertility near 1
    * is parity, 2+ means that language pays double for every context
    * window). Same per-row codegen'd replay as [[compression]], grouped
    * by the document's language; exact integer sums, ONE division per
    * language at the end. */
  def fertility(docs: DataFrame, merges: Seq[Merge]): DataFrame =
    docs.select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("nw"),
        docTokens(col("text"), merges).as("nt"))
      .groupBy("lang")
      .agg(countDistinct("doc_id").as("n_docs"), sum("nw").as("n_words"),
        sum("nt").as("n_bpe_tokens"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_bpe_tokens"),
        (col("n_bpe_tokens").cast("double") / col("n_words"))
          .as("fertility"))

  /** The subword-priced twin of Curation.tokenBudget: documents and BPE
    * tokens surviving the full train-ready chain, per source — the
    * budget number in the units the trainer bills. Trains the merge
    * table on the SAME corpus first (train-once seam), then one join
    * past the chain + one aggregate, like the whitespace twin. */
  def tokenBudget(docs: DataFrame, nMerges: Int = 16,
                  vocabLimit: Int = 65536): DataFrame =
    priceBudget(docs, train(docs, nMerges, vocabLimit))

  /** [[tokenBudget]] against a STORED merge table — the
    * train-once/apply-many face of the budget: a nightly pipeline
    * trains [[mergeArtifact]] once and every budget run prices with
    * the artifact's merges, ZERO training jobs (spec-pinned). */
  def tokenBudgetFrom(docs: DataFrame, mergeTable: DataFrame): DataFrame =
    priceBudget(docs, mergesFromFrame(mergeTable))

  private def priceBudget(docs: DataFrame, merges: Seq[Merge]): DataFrame =
    Curation.trainReady(docs).select("doc_id")
      .join(docs.select(col("doc_id"), col("source"),
        docTokens(col("text"), merges).as("n_tokens")), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs_kept"), sum("n_tokens").as("n_bpe_tokens_kept"))
}
