package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis for a training-data pipeline, over `documents`:
  * language-ID heuristic, quality scoring, token counting, and rolling-hash
  * fingerprinting. Pure column expressions — per-row, shuffle-free,
  * codegen'd; at 100 TB these run at scan speed as a narrow stage. */
object TextAnalysis {

  private def nTokens(text: Column): Column = size(split(text, " "))

  private def vowelRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[aeiou]", ""))).cast("double") / length(text)

  private def avgWordLen(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast("double") / nTokens(text)

  /** Character n-gram-flavoured language heuristic: vowel density + word
    * shape. (The synthetic corpus shares one vocabulary across langs, so
    * accuracy is not the point — the mechanism and its per-row cost are.) */
  def langId(docs: DataFrame): DataFrame = {
    val t = col("text")
    docs.select(
      col("doc_id"),
      vowelRatio(t).as("vowel_ratio"),
      avgWordLen(t).as("avg_word_len"),
      col("lang").as("actual_lang"))
      .withColumn("predicted_lang",
        when(col("vowel_ratio") >= 0.38, "es")
          .when(col("avg_word_len") >= 4.6, "de")
          .when(col("vowel_ratio") <= 0.33, "zh")
          .otherwise("en"))
      .withColumn("match", col("predicted_lang") === col("actual_lang"))
  }

  /** The character-bigram TYPE-COUNT frame language-ID trains and
    * scores on: (doc_id, lang, g, cnt) — every adjacent code-point
    * pair of a doc with its occurrence count (the curation-stack
    * routing signal CCNet/C4/fastText build on char n-grams), emitted
    * at TYPE grain by the one-pass codegen'd kernel
    * ([[graft.functions.CharBigramKernel]]): no per-occurrence explode,
    * no re-aggregation shuffle, no per-position substring re-scan.
    * Docs shorter than 2 code points carry no rows. The kernel slices
    * byte boundaries = code points, pinned by spec against a
    * driver-side codePoints window model on supplementary-plane
    * text; the DuckDB oracles keep the per-occurrence substr replay
    * (sum over occurrences ≡ the counts, exactly). */
  private def charBigramCountsFrame(docs: DataFrame): DataFrame =
    docs
      .filter(col("text").isNotNull && length(col("text")) >= 2)
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.TextFunctions.charBigramCounts(col("text")))
          .as("e"))
      .select(col("doc_id"), col("lang"),
        col("e.g").as("g"), col("e.n").as("cnt"))

  /** TRAINED language ID, the model half: a char-bigram naive-Bayes
    * classifier as ONE persistable frame (the bigramModel shape) —
    * pair rows (lang, g, n = count of bigram g in lang-labeled text),
    * prefix rows (lang, NULL, n = total bigram count of the lang), and
    * the single vocabulary row (NULL, NULL, n = V, distinct bigrams
    * corpus-wide). Counts round-trip parquet exactly and training is
    * deterministic, so a stored model is a cache, never a fork — the
    * production stack trains nightly and scores at scan speed. One
    * corpus scan; the frame is (langs × char-bigram vocabulary)-sized,
    * broadcast-small at any corpus scale. */
  def langIdModel(docs: DataFrame): DataFrame = {
    // unlabeled docs cannot train a supervised router; the NULL slot in
    // the model frame is reserved for the prefix/vocabulary rows
    val grams = charBigramCountsFrame(docs).filter(col("lang").isNotNull)
    Dedup.withScopedCache(grams) { b =>
      val ns = lit(null).cast("string")
      b.groupBy("lang", "g").agg(sum("cnt").as("n"))
        .unionByName(b.groupBy("lang").agg(sum("cnt").as("n"))
          .select(col("lang"), ns.as("g"), col("n")))
        .unionByName(b.agg(count_distinct(col("g")).as("n"))
          .select(ns.as("lang"), ns.as("g"), col("n")))
    }
  }

  /** TRAINED language ID, the scoring half: per doc, the add-one NB
    * likelihood of its char-bigram stream under every language in the
    * model — P(g|lang) = (c+1)/(tot+V), priced in exact micro-nat
    * integers (the bigram-LM quantize-before-sum discipline, so both
    * engines sum identical longs) — and the argmax as the routed
    * label, ties broken by lang ascending (deterministic, replayed as
    * a rank window at doc grain — partitioned, never global). Plan
    * shape: batch gram TYPES cross the bounded lang list and join the
    * vocabulary-sized model tables once; the corpus-sized stream is
    * probed by ONE join (fan-out = n_langs, a dimension); unseen
    * grams price at the add-one floor instead of crashing. Gram-less
    * docs (< 2 chars) carry no evidence and are excluded, the
    * pplBuckets rule. */
  def langIdScoreFrom(docs: DataFrame, model: DataFrame,
                      quantum: Long = 1000000L): DataFrame = {
    require(model.columns.toSet == Set("lang", "g", "n"),
      s"langIdScoreFrom: model must be a (lang, g, n) frame, got ${model.columns.mkString(",")}")
    val pairs = model.filter(col("lang").isNotNull && col("g").isNotNull)
      .select(col("lang"), col("g"), col("n").cast("long").as("c"))
    val totals = model.filter(col("lang").isNotNull && col("g").isNull)
      .select(col("lang"), col("n").cast("long").as("tot"))
    val vRow = model.filter(col("lang").isNull && col("g").isNull)
      .select(col("n").cast("long").as("v"))
    // (doc, gram) COUNTS straight from the kernel — the probe join and
    // its n_langs fan-out run at type-per-doc grain (each doc repeats
    // its grams heavily), and sum(qlp · cnt) ≡ the per-occurrence sum
    // exactly: integer multiply, no result change, zero shuffles
    // before the join
    val gcnt = charBigramCountsFrame(docs)
      .select(col("doc_id"), col("lang").as("actual_lang"),
        col("g"), col("cnt"))
    Dedup.withScopedCache(gcnt) { b =>
      val typeScores = b.select("g").distinct()
        .crossJoin(broadcast(totals))
        .join(pairs, Seq("lang", "g"), "left")
        .crossJoin(broadcast(vRow))
        .select(col("g"), col("lang"),
          round(log((coalesce(col("c"), lit(0L)) + 1).cast("double") /
            (col("tot") + col("v")).cast("double")) * quantum)
            .cast("long").as("qlp"))
      val byDoc = b
        .join(typeScores, Seq("g"))
        .groupBy(col("doc_id"), col("actual_lang"), col("lang"))
        .agg(sum(col("qlp") * col("cnt")).as("score"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("score").desc, col("lang"))))
        .filter(col("rk") === 1)
      byDoc.select(col("doc_id"),
        col("lang").as("predicted_lang"),
        col("actual_lang"),
        col("score").as("score_qnat"),
        (col("lang") === col("actual_lang")).as("match"))
    }
  }

  /** [[langIdModel]] + [[langIdScoreFrom]] composed — the live-trained
    * face; the stored-artifact face reads the model frame back from
    * parquet and shares this entry's oracle (training is deterministic
    * and counts round-trip exactly). FUSED: training and scoring both
    * reduce the same (doc, lang, gram, cnt) frame, so one scoped cache
    * feeds both and the corpus is scanned/exploded ONCE, not once per
    * half — the model's pair/total counts are sums of the per-doc
    * counts (exact regroup, identical values); measured ~2× at sf0.1. */
  def langIdTrained(docs: DataFrame, quantum: Long = 1000000L): DataFrame = {
    val gcnt = charBigramCountsFrame(docs)
    Dedup.withScopedCache(gcnt) { b =>
      val labeled = b.filter(col("lang").isNotNull)
      val pairs = labeled.groupBy("lang", "g").agg(sum("cnt").as("c"))
      val totals = labeled.groupBy("lang").agg(sum("cnt").as("tot"))
      val vRow = labeled.agg(count_distinct(col("g")).as("v"))
      val typeScores = b.select("g").distinct()
        .crossJoin(broadcast(totals))
        .join(pairs, Seq("lang", "g"), "left")
        .crossJoin(broadcast(vRow))
        .select(col("g"), col("lang"),
          round(log((coalesce(col("c"), lit(0L)) + 1).cast("double") /
            (col("tot") + col("v")).cast("double")) * quantum)
            .cast("long").as("qlp"))
      val byDoc = b
        .withColumnRenamed("lang", "actual_lang")
        .join(typeScores, Seq("g"))
        .groupBy(col("doc_id"), col("actual_lang"), col("lang"))
        .agg(sum(col("qlp") * col("cnt")).as("score"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("score").desc, col("lang"))))
        .filter(col("rk") === 1)
      byDoc.select(col("doc_id"),
        col("lang").as("predicted_lang"),
        col("actual_lang"),
        col("score").as("score_qnat"),
        (col("lang") === col("actual_lang")).as("match"))
    }
  }

  /** Quality signals: length, type-token ratio, stopword ratio, word
    * shape; combined into one score for threshold-filtering a corpus.
    * The tokenization is staged into its own projection so the split runs
    * once per row, not once per consuming column (CollapseProject keeps
    * the stage because duplicating a non-cheap expression is against its
    * policy; size() on the materialized array is O(1)). */
  def quality(docs: DataFrame): DataFrame = {
    val t = col("text")
    val w = col("__words")
    docs
      .select(col("doc_id"), t, split(t, " ").as("__words"))
      .select(
        col("doc_id"),
        length(t).as("n_chars"),
        size(w).as("n_tokens"),
        (size(array_distinct(w)).cast("double") / size(w)).as("ttr"),
        (size(filter(w, x => x.isin("the", "a"))).cast("double") / size(w)).as("stopword_ratio"),
        (length(regexp_replace(t, " ", "")).cast("double") / size(w)).as("avg_word_len"))
      .withColumn("quality_score",
        col("ttr") * 0.4 + col("stopword_ratio") * 0.3 +
          when(col("n_tokens") >= 40, 0.3).otherwise(col("n_tokens").cast("double") / 40.0 * 0.3))
  }

  /** Repetition metrics, the Gopher-rule family the scalar quality score
    * can't see: the most frequent word's share of all words and the most
    * frequent bigram's share of all bigrams (high values = boilerplate /
    * degenerate loops, filtered before training). Relational shape —
    * explode → per-(doc, gram) count → per-doc max/sum — two map-side-
    * combined shuffles keyed by doc, no interpreted HOFs; a single
    * pathological doc serializes into one task, like any per-doc window. */
  def repetition(docs: DataFrame): DataFrame = {
    val ws = docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
    val topWord = ws.select(col("doc_id"), explode(col("ws")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_wc"), sum("c").as("n_words"))
    val byPos = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("p")
    val topBigram = ws.select(col("doc_id"), posexplode(col("ws")).as(Seq("p", "w")))
      .withColumn("nx", lead("w", 1).over(byPos))
      .filter(col("nx").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("w"), col("nx")).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_bc"), sum("c").as("n_bigrams"))
    topWord.join(topBigram, "doc_id")
      .select(
        col("doc_id"), col("n_words"),
        (col("top_wc").cast("double") / col("n_words")).as("top_word_frac"),
        (col("top_bc").cast("double") / col("n_bigrams")).as("top_bigram_frac"))
  }

  /** Token counting: whitespace tokens and a BPE-ish regex segmentation
    * (letter runs / digit runs / single punctuation). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      nTokens(col("text")).as("n_ws_tokens"),
      size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")).as("n_re_tokens"),
      length(regexp_replace(col("text"), " ", "")).as("n_token_chars"))

  /** Term frequency per language: tokenize → explode → count, ranked
    * within each language (the classic tf table; one shuffle on
    * (lang, token), map-side combined). */
  def termFrequency(docs: DataFrame, topK: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("n").desc, col("token"))
    docs
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .groupBy("lang", "token")
      .agg(count(lit(1)).as("n"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= topK)
  }

  /** Per-doc distinctive terms — TF-IDF with a LOG-FREE inverse-frequency
    * weight, `score = tf · (N+1)/(df+1)`: the weight keeps tf-idf's
    * ordering within a document (monotone in tf and 1/df) while staying
    * engine-portable — one integer-exact division and one multiply, no
    * transcendental whose last ulp differs between libm builds. The
    * corpus size N is one metadata-cheap count (the trainCentroids
    * pattern). Two shuffles (doc×token tf, then token df joined back);
    * per-doc top-k via a doc-partitioned window — no global sort. */
  def distinctiveTerms(docs: DataFrame, topK: Int = 5): DataFrame = {
    val n = docs.count()
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("token"))
    tf.join(df, "token")
      .withColumn("score",
        col("tf").cast("double") * (lit((n + 1).toDouble) / (col("df") + lit(1)).cast("double")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select("doc_id", "token", "tf", "df", "score")
  }

  /** Sliding-window document chunking — context-window preparation: token
    * windows of `window` tokens starting every `stride` tokens (the last
    * chunk may run short; overlap = window − stride). One explode over a
    * per-row computed chunk count, pure codegen'd array ops — chunking
    * 100 TB is exactly one scan wide with output ~len/stride per doc.
    * Chunk starts stop once they pass the end, so every token lands in
    * ≥1 chunk and no empty trailing chunks are emitted. */
  def chunkDocuments(docs: DataFrame, window: Int = 64, stride: Int = 48): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0),
          floor((size(col("toks")) - 1).cast("double") / stride).cast("long"))).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        array_join(slice(col("toks"), (col("chunk_id") * stride + 1).cast("int"), lit(window)), " ")
          .as("chunk_text"),
        least(size(col("toks")) - col("chunk_id") * stride, lit(window)).cast("long")
          .as("n_tokens"))
  }

  /** Vocabulary coverage / OOV rate — the tokenizer-coverage proxy: build
    * the top-`vocabSize` token vocabulary by corpus frequency (TakeOrdered,
    * never a full sort), then score each doc's fraction of token
    * OCCURRENCES outside it. The vocab is bounded, so the membership join
    * broadcasts at any corpus scale; the rate is one division of exact
    * counts. */
  def oovRate(docs: DataFrame, vocabSize: Int = 100): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val vocab = tok.groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(vocabSize)
      .select(col("token"), lit(1).as("__in_vocab"))
    tok.join(broadcast(vocab), Seq("token"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        count(col("__in_vocab")).as("n_in_vocab"))
      .select(col("doc_id"), col("n_tokens"), col("n_in_vocab"),
        (lit(1.0) - col("n_in_vocab").cast("double") / col("n_tokens").cast("double"))
          .as("oov_rate"))
  }

  /** Corpus-trained unigram log-likelihood — the KenLM-style fluency
    * proxy: P(w) = count(w)/N over the whole corpus, per-doc score the
    * mean ln P over its tokens (rare-token-heavy docs score low). Trained
    * on the corpus itself, every token has a nonzero count, so no
    * smoothing is needed; scoring against an external vocabulary would
    * add the usual add-one.
    *
    * Engine-portable by construction: the per-token logprob is quantized
    * to integer micro-nats BEFORE the per-doc sum, so the compared
    * aggregate is an exact integer — summation order can't perturb it
    * (the raw-double-sum rule); the mean is then one per-row division of
    * exact integers. Plan shape: one exploded token pass cached for its
    * three consumers (counts, total, score join), the count join an
    * equi-join on token (vocabulary-sized build side — AQE broadcasts
    * when small), the corpus total a broadcast one-row cross join. */
  def unigramLogLik(docs: DataFrame, quantum: Long = 1000000L): DataFrame =
    Dedup.withScopedCache(
      docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))) { toks =>
      val counts = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
      val total = toks.agg(count(lit(1)).as("n_total"))
      toks
        .join(counts, "w")
        .crossJoin(broadcast(total))
        .select(col("doc_id"),
          round(log(col("cnt").cast("double") / col("n_total")) * quantum)
            .cast("long").as("qlp"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"), sum(col("qlp")).as("sum_qlp"))
        .select(col("doc_id"), col("n_tok"), col("sum_qlp"),
          (col("sum_qlp").cast("double") / quantum.toDouble / col("n_tok"))
            .as("mean_logprob"))
    }

  /** Corpus-trained BIGRAM log-likelihood with add-one smoothing — the
    * fluency scorer above [[unigramLogLik]]: order-sensitive, so
    * shuffled-word salad scores low where the unigram model can't see
    * it. P(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V): c(w1,w2) the corpus
    * bigram count, c(w1) the bigram-PREFIX count (w1 in non-final
    * position), V the distinct-suffix vocabulary — Laplace add-one, so
    * a rare continuation backs off toward 1/(c(w1)+V) instead of
    * dominating the mean. Per-doc score = mean ln P over its
    * n_tok−1 bigrams; a single-token doc has no bigram and reports
    * n_bigram 0 with a NULL mean (total, never dropped).
    *
    * Engine-portable by the unigram discipline: each bigram's logprob is
    * quantized to integer micro-nats BEFORE the per-doc sum (exact
    * integer aggregate, order-free), the mean one division of exact
    * integers. Plan shape: ONE exploded bigram pass cached for its
    * three consumers (pair counts, prefix counts, score join) plus the
    * broadcast one-row V cross join; the totality join reads only the
    * pruned doc_id column. Pair/prefix joins are equi-joins on
    * vocabulary-sized build sides — at 100 TB they shuffle on the token
    * keys exactly like the unigram count join, nothing quadratic. */
  /** The exploded (doc_id, w1, w2) bigram occurrence frame every bigram
    * op shares. Tokenize ONCE per row in its own projection: split
    * referenced inside the transform lambda re-evaluates per element
    * (quadratic per doc); then guard BEFORE the sequence — size-1 docs
    * would otherwise generate the descending sequence(1, 0) and index
    * tk[-1]. */
  private def bigramFrame(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> " +
          "struct(tk[i - 1] AS w1, tk[i] AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))

  def bigramLogLik(docs: DataFrame, quantum: Long = 1000000L): DataFrame = {
    val bg = bigramFrame(docs)
    Dedup.withScopedCache(bg) { b =>
      val c12 = b.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val c1 = b.groupBy("w1").agg(count(lit(1)).as("c1"))
      val v = b.agg(count_distinct(col("w2")).as("v"))
      // score bigram TYPES first (vocabulary-sized joins), then probe the
      // corpus-sized frame exactly once — scoring per occurrence joined
      // the corpus twice (this plus the split hoist above: 4.1 s → 1.9 s
      // at sf0.1)
      val typeScores = c12
        .join(c1, Seq("w1"))
        .crossJoin(broadcast(v))
        .select(col("w1"), col("w2"),
          round(log((col("c12") + 1).cast("double") /
            (col("c1") + col("v")).cast("double")) * quantum)
            .cast("long").as("qlp"))
      val scored = b
        .join(typeScores, Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigram"), sum(col("qlp")).as("sum_qlp"))
      docs.select(col("doc_id"))
        .join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigram"), lit(0L)).as("n_bigram"),
          coalesce(col("sum_qlp"), lit(0L)).as("sum_qlp"),
          when(col("n_bigram") > 0,
            col("sum_qlp").cast("double") / quantum.toDouble / col("n_bigram"))
            .as("mean_logprob"))
    }
  }

  /** The trained bigram LM as ONE persistable frame — the
    * train-once/score-many artifact the fluency scorer stores (the BPE
    * merge-table shape applied to the LM): pair rows (w1, w2, n = c12),
    * prefix rows (w1, NULL, n = c1), and the single vocabulary row
    * (NULL, NULL, n = V). One corpus scan; the frame is
    * vocabulary-sized. Counts round-trip parquet exactly and training
    * is deterministic, so a stored model is a cache, never a fork. */
  def bigramModel(docs: DataFrame): DataFrame = {
    val bg = bigramFrame(docs)
    Dedup.withScopedCache(bg) { b =>
      val ns = lit(null).cast("string")
      b.groupBy("w1", "w2").agg(count(lit(1)).as("n"))
        .unionByName(b.groupBy("w1").agg(count(lit(1)).as("n"))
          .select(col("w1"), ns.as("w2"), col("n")))
        .unionByName(b.agg(count_distinct(col("w2")).as("n"))
          .select(ns.as("w1"), ns.as("w2"), col("n")))
    }
  }

  /** [[bigramLogLik]] scoring against a STORED model — the serve half:
    * P(w2|w1) = (c12+1)/(c1+V) with c12/c1 read as 0 when the pair or
    * prefix is unseen, so the add-one floor 1/(c1+V) (or 1/V for an
    * unseen prefix) prices out-of-corpus continuations instead of
    * crashing or skipping them (spec'd against a driver model). On the
    * training corpus itself every pair is present, so scoring through
    * the stored model equals [[bigramLogLik]] exactly — the stored
    * entry shares the live entry's oracle. Same plan discipline: batch
    * bigram TYPES join the vocabulary-sized model tables, then ONE
    * corpus-sized probe join; the V row is the only cross join. */
  def bigramScoreFrom(docs: DataFrame, model: DataFrame,
                      quantum: Long = 1000000L): DataFrame = {
    require(model.columns.toSet == Set("w1", "w2", "n"),
      s"bigramScoreFrom: model must be a (w1, w2, n) frame, got ${model.columns.mkString(",")}")
    val pairs = model.filter(col("w1").isNotNull && col("w2").isNotNull)
      .select(col("w1"), col("w2"), col("n").cast("long").as("c12"))
    val prefixes = model.filter(col("w1").isNotNull && col("w2").isNull)
      .select(col("w1"), col("n").cast("long").as("c1"))
    val vRow = model.filter(col("w1").isNull && col("w2").isNull)
      .select(col("n").cast("long").as("v"))
    val bg = bigramFrame(docs)
    Dedup.withScopedCache(bg) { b =>
      val typeScores = b.select("w1", "w2").distinct()
        .join(pairs, Seq("w1", "w2"), "left")
        .join(prefixes, Seq("w1"), "left")
        .crossJoin(broadcast(vRow))
        .select(col("w1"), col("w2"),
          round(log((coalesce(col("c12"), lit(0L)) + 1).cast("double") /
            (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")) * quantum)
            .cast("long").as("qlp"))
      val scored = b
        .join(typeScores, Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigram"), sum(col("qlp")).as("sum_qlp"))
      docs.select(col("doc_id"))
        .join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigram"), lit(0L)).as("n_bigram"),
          coalesce(col("sum_qlp"), lit(0L)).as("sum_qlp"),
          when(col("n_bigram") > 0,
            col("sum_qlp").cast("double") / quantum.toDouble / col("n_bigram"))
            .as("mean_logprob"))
    }
  }

  /** Fused self-scoring for the ppl-bucket family: scores the corpus
    * against the model trained on ITSELF over ONE scoped cache of the
    * exploded bigram frame — `bigramScoreFrom(docs, bigramModel(docs))`
    * computes the same values but materializes the bigram explode
    * TWICE (once inside the model's scope, once inside the scorer's).
    * On the training corpus every observed pair/prefix is present in
    * the model, so the inner count joins here price each bigram type
    * exactly like the left-join + coalesce path: qlp is bit-identical,
    * and restricting to docs with >= 1 bigram matches the callers'
    * `filter(n_bigram > 0)` on the totality-joined frame row for row.
    * (The [[bigramLogLik]] plan, minus the totality join the ppl faces
    * immediately filter away; measured 2x fewer corpus explodes per
    * ppl query at sf0.1.) */
  private def bigramSelfScored(docs: DataFrame, quantum: Long): DataFrame = {
    val bg = bigramFrame(docs)
    Dedup.withScopedCache(bg) { b =>
      val c12 = b.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val c1 = b.groupBy("w1").agg(count(lit(1)).as("c1"))
      val v = b.agg(count_distinct(col("w2")).as("v"))
      val typeScores = c12
        .join(c1, Seq("w1"))
        .crossJoin(broadcast(v))
        .select(col("w1"), col("w2"),
          round(log((col("c12") + 1).cast("double") /
            (col("c1") + col("v")).cast("double")) * quantum)
            .cast("long").as("qlp"))
      b.join(typeScores, Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigram"), sum(col("qlp")).as("sum_qlp"))
    }
  }

  /** CCNet-style perplexity bucketing — the head/middle/tail split a
    * web corpus takes before mixture weighting (Wenzek et al. 2020):
    * docs rank by MEAN bigram log-probability under the corpus-trained
    * LM ([[bigramScoreFrom]]'s exact micro-nat integers), highest
    * first (head = lowest perplexity), and the rank terciles become
    * the buckets. Exactness: the per-doc mean is the FLOOR division of
    * a (possibly negative) micro-nat sum — pmod is subtracted first so
    * the quotient is an exact integer under ANY division semantics,
    * engine-independently; ranking breaks ties by doc_id. The global
    * rank window is the oracle-able exact face (one sort of
    * doc-grain rows); at 100 TB the boundaries come from a quantile
    * sketch instead (the q_quantiles_approx trade, documented there).
    * Docs without a bigram carry no LM evidence and are excluded. */
  def pplBuckets(docs: DataFrame, quantum: Long = 1000000L): DataFrame = {
    val scored = bigramSelfScored(docs, quantum)
      .select(col("doc_id"), col("n_bigram"),
        expr("(sum_qlp - pmod(sum_qlp, n_bigram)) DIV n_bigram").as("mq"))
    val byScore = Window.orderBy(col("mq").desc, col("doc_id"))
    scored
      .withColumn("rn", row_number().over(byScore).cast("long"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy().orderBy().rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)).cast("long"))
      .withColumn("bucket",
        when(col("rn") * 3 <= col("n"), "head")
          .when(col("rn") * 3 <= col("n") * 2, "middle")
          .otherwise("tail"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_bigram").as("n_bigrams"),
        min("mq").as("min_mq"),
        max("mq").as("max_mq"))
  }

  /** The 100 TB face of [[pplBuckets]] — the SAME head/middle/tail
    * split served from tercile CUT POINTS instead of a global rank:
    * the exact face's one unpartitioned window (every doc-grain row
    * through a single task) is replaced by (1) a deterministic
    * bottom-k row sample of the scored corpus (the
    * [[Sketches.quantileSample]] idea with TakeOrdered instead of a
    * window — each partition contributes its own bottom-k by the
    * portable 60-bit md5 row hash, no global sort materializes),
    * (2) two cut values read at the sample's tercile ranks (a window
    * over the ≤k-row frame — the limit(k) precedent), and (3) one
    * broadcast of the 1-row cut frame joined back for a per-row
    * comparison at scan speed. Rank error is the classic O(1/√k)
    * sample bound; with k ≥ corpus size and no mq ties at a boundary
    * the buckets equal the exact face's (spec'd, with the tie rule:
    * the sketch buckets by VALUE, so boundary-tied docs land together
    * in the upper bucket where the exact face splits them by rank).
    * Every step — hash, ranks, floor arithmetic — replays in DuckDB,
    * so this face is oracle-checked like the exact one. */
  def pplBucketsSketch(docs: DataFrame, k: Int = 512,
                       quantum: Long = 1000000L): DataFrame = {
    require(k >= 16, s"pplBucketsSketch: sample k must be >= 16, got $k")
    val scored = bigramSelfScored(docs, quantum)
      .select(col("doc_id"), col("n_bigram"),
        expr("(sum_qlp - pmod(sum_qlp, n_bigram)) DIV n_bigram").as("mq"))
    Dedup.withScopedCache(scored) { sc =>
      val sample = sc
        .select(Sketches.kmv60(col("doc_id"), "pplq:").as("h"), col("mq"))
        .orderBy("h").limit(k)
      val ranked = sample
        .withColumn("rn", row_number().over(
          Window.orderBy(col("mq").desc, col("h"))).cast("long"))
        .withColumn("n_s", count(lit(1)).over(
          Window.partitionBy().orderBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)).cast("long"))
      val cuts = ranked.agg(
        max(when(col("rn") === greatest(lit(1L), expr("n_s DIV 3")),
          col("mq"))).as("cut_head"),
        max(when(col("rn") === greatest(lit(1L), expr("(n_s * 2) DIV 3")),
          col("mq"))).as("cut_mid"))
      sc.crossJoin(broadcast(cuts))
        .withColumn("bucket",
          when(col("mq") >= col("cut_head"), "head")
            .when(col("mq") >= col("cut_mid"), "middle")
            .otherwise("tail"))
        .groupBy("bucket")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_bigram").as("n_bigrams"),
          min("mq").as("min_mq"),
          max("mq").as("max_mq"))
    }
  }

  /** [[pplBucketsSketch]] PER LANGUAGE — the split CCNet actually
    * ships (Wenzek et al. 2020 buckets each language separately; a
    * global cut would let a verbose language crowd out a terse one):
    * the SAME sketch discipline keyed by lang — a per-lang bottom-k
    * row sample ([[Sketches.quantileSample]], the q_quantiles_sketch
    * precedent: per-key bottom-k by the portable row hash), per-lang
    * tercile cut values over the ≤k-per-lang sample, and one
    * broadcast of the langs×1 cut frame (languages are a dimension)
    * joined back for the per-row comparison. Same tie rule, same
    * O(1/√k) per-lang rank bound, fully oracle-replayable. */
  def pplBucketsSketchByLang(docs: DataFrame, k: Int = 512,
                             quantum: Long = 1000000L): DataFrame = {
    require(k >= 16, s"pplBucketsSketchByLang: sample k must be >= 16, got $k")
    val scored = bigramSelfScored(docs, quantum)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .select(col("doc_id"), col("lang"), col("n_bigram"),
        expr("(sum_qlp - pmod(sum_qlp, n_bigram)) DIV n_bigram").as("mq"))
    Dedup.withScopedCache(scored) { sc =>
      val sample = Sketches.quantileSample(sc, Seq("lang"), col("doc_id"),
        col("mq"), k, seed = "pplq:")
      val ranked = sample
        .withColumn("rn", row_number().over(Window.partitionBy("lang")
          .orderBy(col("v").desc, col("h"))).cast("long"))
        .withColumn("n_s", count(lit(1)).over(
          Window.partitionBy("lang")).cast("long"))
      val cuts = ranked.groupBy("lang").agg(
        max(when(col("rn") === greatest(lit(1L), expr("n_s DIV 3")),
          col("v"))).as("cut_head"),
        max(when(col("rn") === greatest(lit(1L), expr("(n_s * 2) DIV 3")),
          col("v"))).as("cut_mid"))
      sc.join(broadcast(cuts), Seq("lang"))
        .withColumn("bucket",
          when(col("mq") >= col("cut_head"), "head")
            .when(col("mq") >= col("cut_mid"), "middle")
            .otherwise("tail"))
        .groupBy("lang", "bucket")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_bigram").as("n_bigrams"),
          min("mq").as("min_mq"),
          max("mq").as("max_mq"))
    }
  }

  /** Per-source quality scorecard — the dashboard row that ranks sources
    * for inclusion: doc count, exact total token count, how many docs
    * clear the quality floor, and the source's dominant language. One
    * [[quality]] scan feeding one aggregate; the dominant language is a
    * max_by over exact per-(source, lang) counts with the tie broken by
    * lang (deterministic). Sources and languages are dimensions, so every
    * frame past the scan is tiny at any corpus scale. */
  def sourceScorecard(docs: DataFrame, qualityFloor: Double = 0.5): DataFrame =
    sourceScorecardServe(scorecardPartials(docs, qualityFloor))

  /** The mergeable half of [[sourceScorecard]]: per-(source, lang)
    * doc/token/quality-pass counters. Every column is a plain sum or
    * count at single-document grain — micro-batch boundaries cannot
    * sever anything — so the streaming seam
    * (streaming/StreamingMonitors.scorecardStateSink) maintains THIS
    * frame and the serve half reads it. The quality floor is compared
    * in integer micro-units (the repo money rule): both engines floor
    * the same double product, so the gate is exact. */
  def scorecardPartials(docs: DataFrame, qualityFloor: Double = 0.5): DataFrame = {
    val q = quality(docs).select(col("doc_id"), col("n_tokens"), col("quality_score"))
    val qFloorMicro = math.floor(qualityFloor * 1000000.0).toLong
    docs.select(col("doc_id"), col("source"), col("lang"))
      .join(q, "doc_id")
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("n_tokens_total"),
        count(when(floor(col("quality_score") * 1000000.0) >= qFloorMicro, 1))
          .as("n_quality_pass"))
  }

  /** The serve half of [[sourceScorecard]] over a partials frame — live
    * or merged from the streaming state seam: sum the counters up to
    * source grain and pick the dominant language as the per-(source,
    * lang) doc-count max with the tie broken by lang (deterministic,
    * identical to the batch max_by rule). */
  def sourceScorecardServe(partials: DataFrame): DataFrame =
    partials
      .groupBy("source")
      .agg(sum("n_docs").as("n_docs"),
        sum("n_tokens_total").as("n_tokens_total"),
        sum("n_quality_pass").as("n_quality_pass"),
        max_by(col("lang"), struct(col("n_docs"), col("lang"))).as("dominant_lang"))
      .select("source", "n_docs", "n_tokens_total", "n_quality_pass", "dominant_lang")

  /** Per-doc character-class composition — the C4-family quality signal
    * the composite score doesn't expose individually: how much of the
    * doc is letters, digits, whitespace, or other (markup debris, emoji
    * soup, base64 blobs all surface as high `other`). Counts are exact
    * (length after deleting the complement class — Spark replaces ALL
    * matches; the oracle needs DuckDB's explicit 'g' flag to match);
    * each share is one per-row division. Scan-speed, no shuffle. */
  def charClasses(docs: DataFrame): DataFrame = {
    val n = length(col("text"))
    val cnt = (re: String) => length(regexp_replace(col("text"), re, ""))
    docs.select(
      col("doc_id"), n.as("n_chars"),
      cnt("[^A-Za-z]").as("n_alpha"),
      cnt("[^0-9]").as("n_digit"),
      cnt("[^ ]").as("n_space"))
      .withColumn("n_other",
        col("n_chars") - col("n_alpha") - col("n_digit") - col("n_space"))
      .withColumn("alpha_share",
        when(col("n_chars") > 0, col("n_alpha").cast("double") / col("n_chars")))
      .withColumn("other_share",
        when(col("n_chars") > 0, col("n_other").cast("double") / col("n_chars")))
  }

  /** Vocabulary-growth checkpoints (the Heaps-law curve, sampled): how
    * many distinct tokens exist among the first 1% / 10% / 100% of the
    * corpus by doc id. Sub-linear growth between checkpoints is healthy;
    * a flat curve means the tail is boilerplate/near-dup (new docs add
    * no new language) and a linear one means noise — the single
    * cheapest corpus-health curve a pipeline can watch. Computed WITHOUT
    * any cumulative-distinct machinery: vocab(cut) = #tokens whose MIN
    * doc id ≤ cut, so one groupBy(token) agg + three conditional counts
    * replace three distinct passes; cuts are integer fractions of the
    * max id off a one-row broadcast. */
  def vocabGrowth(docs: DataFrame, pcts: Seq[Int] = Seq(1, 10, 100)): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"vocabGrowth: pcts $pcts must be in [1, 100]")
    val firstSeen = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(min("doc_id").as("first_id"))
    val mx = docs.agg(max("doc_id").as("max_id"))
    firstSeen.crossJoin(broadcast(mx))
      .select(explode(array(pcts.map(p => lit(p)): _*)).as("pct"),
        col("first_id"), col("max_id"))
      .filter(col("first_id") <= expr("max_id * pct DIV 100"))
      .groupBy("pct")
      .agg(count(lit(1)).as("vocab"))
      .join(
        docs.crossJoin(broadcast(mx))
          .select(explode(array(pcts.map(p => lit(p)): _*)).as("pct"),
            col("doc_id"), col("max_id"))
          .filter(col("doc_id") <= expr("max_id * pct DIV 100"))
          .groupBy("pct").agg(count(lit(1)).as("n_docs")),
        Seq("pct"))
      .select(col("pct").cast("long").as("pct"), col("n_docs"), col("vocab"))
  }

  /** Per-source Gini concentration of document length — the corpus-
    * balance inequality audit (is one source's volume a few mega-docs
    * or many small ones? the answer changes dedup and packing
    * strategy). The rank form of the Gini coefficient rearranges into
    * ONE division: G = (2·Σ r·x − (n+1)·Σx) / (n·Σx) with x ascending
    * and r its row_number (ties ordered by doc_id — equal x commute,
    * so the statistic is tie-order-invariant while the plan stays
    * deterministic). The r·x products run in decimal(38,0) (r·x alone
    * passes 2^63 at ~10^9 docs/source); numerator and denominator stay
    * below 2^53 at every test SF, so the one double division is
    * bit-identical cross-engine. Empty volume → null, never NaN. */
  def sourceGini(docs: DataFrame): DataFrame = {
    val d = (c: Column) =>
      c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("n_chars"), col("doc_id"))
    docs.select(col("source"), col("n_chars"), col("doc_id"))
      // null lengths must not enter the rank: Spark windows sort NULLS
      // FIRST while SQL row_number defaults NULLS LAST — a single null
      // would shift every real rank AND corrupt the rank-form identity
      .filter(col("n_chars").isNotNull && col("doc_id").isNotNull)
      .withColumn("r", row_number().over(w).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars_total"),
        sum(d(col("r")) * d(col("n_chars"))).as("srx"))
      .withColumn("gini",
        when(col("n_chars_total") > 0L,
          (d(lit(2L)) * col("srx") -
            d(col("n_docs") + lit(1L)) * d(col("n_chars_total"))).cast("double") /
            (d(col("n_docs")) * d(col("n_chars_total"))).cast("double"))
          .otherwise(lit(null).cast("double")))
      .select("source", "n_docs", "n_chars_total", "gini")
  }

  /** Per-source token Shannon entropy — the vocabulary-DIVERSITY half of
    * the source ranking signal (sourceGini measures length concentration;
    * this measures how repetitive a source's language is: template/boiler-
    * plate farms score low, natural prose high). Each distinct token's
    * −p·ln p term is quantized to integer micro-nats BEFORE the per-source
    * sum (the raw-double-sum rule: the compared aggregate is an exact
    * integer, so summation order can't perturb it). Plan: one exploded
    * pass → (source, token) counts (map-side partial combine does the
    * heavy lifting); per-source totals derive from the counts frame — no
    * second corpus scan — and join back broadcast (sources are a
    * dimension). Terms are ≥ 0 (p ≤ 1), so round() can't face a negative
    * half-boundary in either engine.
    *
    * Accepted host-pinned convention (the raw-double-sum rule's libm
    * corollary): the per-term −p·ln p comes from the platform's 1-ulp
    * (not correctly-rounded) `log`, so a term landing within 1 ulp of a
    * .5 micro-nat boundary could round to different integers under a
    * different libm and flip the cross-engine hash. No quantization of a
    * libm-derived double has a boundary-free form (floor/half-up only
    * move the boundary); the exposure is ~2⁻⁴⁰ per distinct term and the
    * oracle runs on the same host, so this is pinned as a convention
    * rather than papered over with a coarser quantum. */
  def sourceEntropy(docs: DataFrame, quantum: Long = 1000000L): DataFrame =
    sourceEntropyServe(entropyPartials(docs), quantum)

  /** The mergeable half of [[sourceEntropy]]: per-(source, token)
    * counts. Vocabulary-grain state — the heaviest state table in the
    * family, but bounded by the vocabulary, not the corpus, and counts
    * merge by plain addition; the streaming seam
    * (streaming/StreamingMonitors.entropyStateSink) maintains THIS
    * frame. */
  def entropyPartials(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("cnt"))

  /** The serve half of [[sourceEntropy]] over a counts frame — live or
    * merged from the streaming state seam. */
  def sourceEntropyServe(counts: DataFrame, quantum: Long = 1000000L): DataFrame = {
    // per-source totals as a window over the counts frame, NOT a second
    // aggregate branch — a derived-frame branch re-executes the whole
    // counts subtree (two corpus scans); the window keeps the plan one
    // scan end to end. Skew note: one giant source serializes its
    // window partition — the sourceGini caveat, vocabulary-bounded.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
    val p = col("cnt").cast("double") / col("n_tokens").cast("double")
    counts.withColumn("n_tokens", sum("cnt").over(w))
      .select(col("source"), col("n_tokens"),
        round(-log(p) * p * lit(quantum.toDouble)).cast("long").as("qent"))
      .groupBy("source")
      .agg(max("n_tokens").as("n_tokens"),
        count(lit(1)).as("n_distinct_tokens"),
        sum("qent").as("sum_qent"))
      .select(col("source"), col("n_tokens"), col("n_distinct_tokens"),
        col("sum_qent"),
        (col("sum_qent").cast("double") / quantum.toDouble).as("entropy_nats"))
  }

  /** Per-source KL divergence from the corpus token distribution —
    * KL(source ‖ corpus) = Σ_w p_s(w)·ln(p_s(w)·N/C_w) — the data-mixture
    * drift signal a curation engineer reads next to [[sourceEntropy]]:
    * a source whose language matches the corpus scores near 0; a
    * template farm or off-domain crawl scores high. Decomposed as
    * Σ p_s·(ln p_s − ln C_w) + ln N so the corpus-total term leaves the
    * vocabulary-grain stage entirely: the per-token stage needs only the
    * per-source total (source window) and the per-token corpus count
    * (token window) over the SAME counts frame — one corpus scan, no
    * second aggregate branch — and the scalar +ln N lands on the
    * #sources-row rollup, where a global window is free. Per-token terms
    * are quantized to integer micro-nats BEFORE the per-source sum (the
    * raw-double-sum rule); terms here CAN be negative (ln p − ln C_w
    * flips sign), and both engines round doubles half-away-from-zero, so
    * the boundary convention matches. Shares [[entropyPartials]] as its
    * mergeable state frame, so the streaming entropy state sink serves
    * this op too. */
  def sourceKl(docs: DataFrame, quantum: Long = 1000000L): DataFrame =
    sourceKlServe(entropyPartials(docs), quantum)

  /** The serve half of [[sourceKl]] over a (source, w, cnt) counts frame
    * — live or merged from the streaming entropy state seam. */
  def sourceKlServe(counts: DataFrame, quantum: Long = 1000000L): DataFrame = {
    val bySource = org.apache.spark.sql.expressions.Window.partitionBy("source")
    val byToken = org.apache.spark.sql.expressions.Window.partitionBy("w")
    // global window ONLY on the #sources-row rollup (sources are a
    // dimension; the vocabulary-grain frame never single-partitions)
    val global = org.apache.spark.sql.expressions.Window.partitionBy()
    val p = col("cnt").cast("double") / col("n_tokens").cast("double")
    counts
      .withColumn("n_tokens", sum("cnt").over(bySource))
      .withColumn("cw", sum("cnt").over(byToken))
      .select(col("source"), col("n_tokens"),
        round((log(p) - log(col("cw").cast("double"))) * p *
          lit(quantum.toDouble)).cast("long").as("qkl"))
      .groupBy("source")
      .agg(max("n_tokens").as("n_tokens"), sum("qkl").as("sum_qkl_rel"))
      .withColumn("corpus_tokens", sum("n_tokens").over(global))
      .select(col("source"), col("n_tokens"), col("corpus_tokens"),
        (col("sum_qkl_rel") +
          round(log(col("corpus_tokens").cast("double")) *
            lit(quantum.toDouble)).cast("long")).as("sum_qkl"))
      .withColumn("kl_nats", col("sum_qkl").cast("double") / quantum.toDouble)
  }

  /** Quality-floor calibration curve: for each candidate floor t = k·5%,
    * how many docs and tokens survive — the sweep a curation engineer
    * reads before committing to [[sourceScorecard]]'s floor (choosing a
    * floor blind to its token cost is how corpora lose half their data).
    * Per-doc scores histogram ONCE into 21 exact micro-unit bins (floor
    * to integer micro before bucketing — the repo money rule), so the
    * sweep is a ≥-join of the 21-row threshold dim against the 21-row
    * histogram: nothing past the first aggregate scales with the corpus,
    * and the corpus totals derive from the histogram, not a second scan. */
  def qualityCalibration(docs: DataFrame): DataFrame =
    qualityCalibrationServe(calibrationPartials(docs))

  /** The mergeable half of [[qualityCalibration]]: the 21-bin exact
    * micro-unit score histogram with per-bin doc/token counts. Counts at
    * single-document grain merge by plain addition — the streaming seam
    * (streaming/StreamingMonitors.calibrationStateSink) maintains THIS
    * ≤21-row frame, the cheapest state table in the family. */
  def calibrationPartials(docs: DataFrame): DataFrame =
    quality(docs).select(col("n_tokens"), col("quality_score"))
      .groupBy(least(
        (floor(col("quality_score") * 1000000.0).cast("long") / lit(50000L)).cast("long"),
        lit(20L)).as("b"))
      .agg(count(lit(1)).as("h_docs"), sum(col("n_tokens").cast("long")).as("h_tokens"))

  /** The serve half of [[qualityCalibration]] over a histogram frame —
    * live or merged from the streaming state seam: the threshold sweep
    * is a 21×21 ≥-join against the bounded histogram, and the corpus
    * totals are the floor-0 row itself (the sweep is monotone, so
    * max-over-the-21-rows IS the total) — a window over the bounded
    * sweep instead of a second pass over the histogram branch, keeping
    * the whole query one corpus scan. */
  def qualityCalibrationServe(hist: DataFrame): DataFrame = {
    val thresholds = hist.sparkSession.range(0, 21).select(col("id").as("t"))
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    thresholds
      .join(hist, col("b") >= col("t"), "left")
      .groupBy("t")
      .agg(coalesce(sum("h_docs"), lit(0L)).as("n_docs_pass"),
        coalesce(sum("h_tokens"), lit(0L)).as("n_tokens_pass"))
      .withColumn("tot_docs", max("n_docs_pass").over(all))
      .withColumn("tot_tokens", max("n_tokens_pass").over(all))
      .select(
        (col("t") * 5L).cast("int").as("floor_pct"),
        col("n_docs_pass"), col("n_tokens_pass"),
        (col("n_docs_pass").cast("double") / col("tot_docs").cast("double")).as("doc_share"),
        (col("n_tokens_pass").cast("double") / col("tot_tokens").cast("double")).as("token_share"))
  }

  /** Canonical text normalization — the first pass of any corpus build:
    * lowercase, collapse whitespace runs to one space, trim. Pure per-row
    * string ops (scan speed). The whitespace class is spelled out rather
    * than `\s` because Java's `\s` includes vertical tab while RE2's is
    * `[\t\n\f\r ]` — the explicit class means the same thing in both
    * engines for ANY input, so the normalized TEXT is hash-comparable
    * data-independently. */
  val WhitespaceRunRe = "[ \\t\\n\\x0B\\f\\r]+"

  def normalize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars_raw"),
      trim(regexp_replace(lower(col("text")), WhitespaceRunRe, " ")).as("normalized"))
      .withColumn("n_chars_norm", length(col("normalized")))

  /** PII patterns chosen to mean the same thing in Java regex (Spark)
    * and RE2 (DuckDB): plain classes, bounded repetition, ASCII word
    * boundaries — no backreferences or lookaround, which RE2 lacks.
    * Redaction order is PINNED (email → card → phone → IPv4) so one
    * pattern's leftovers can never half-match a later one: an address's
    * host part as an IP, a card's 4-digit groups as a phone, a
    * dot-separated phone's prefix as an IP. */
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val CardRe = "\\b[0-9]{4}([- ]?[0-9]{4}){3}\\b"
  private val PhoneRe = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"
  private val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** PII scrub, the pass a corpus takes before any text leaves the
    * pipeline: count and redact email addresses, 16-digit card numbers
    * (bare or 4-4-4-4 grouped), NANP-style phone numbers, and IPv4
    * literals. Pure per-row regex — scan speed, no shuffle. Redaction
    * order and patterns are mirrored in the oracle, so the redacted TEXT
    * is hash-compared, not just the counts. */
  def piiScrub(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(CardRe)).cast("long").as("n_cards"),
      regexp_count(col("text"), lit(PhoneRe)).cast("long").as("n_phones"),
      regexp_count(col("text"), lit(Ipv4Re)).cast("long").as("n_ipv4"),
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), EmailRe, "<EMAIL>"),
            CardRe, "<CARD>"),
          PhoneRe, "<PHONE>"),
        Ipv4Re, "<IP>").as("redacted"))

  /** Polynomial rolling hash (base 31, mod 1e9+7) over the codepoints —
    * the classic content fingerprint; `prefix_fp` over the head is the
    * cheap first-pass cluster key. */
  def fingerprintExpr(text: Column): Column =
    aggregate(
      split(text, ""),
      lit(0L),
      (acc, c) => (acc * 31 + ascii(c).cast("long")) % 1000000007L)

  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      fingerprintExpr(col("text")).as("content_fp"),
      fingerprintExpr(substring(col("text"), 1, 64)).as("prefix_fp"))

  /** Zipf-law fit over the token frequency spectrum — the vocabulary-
    * health scalar: natural corpora sit near slope −1 on the
    * log-rank/log-frequency line; a collapsed slope (≫ −1, flat) marks
    * boilerplate/template farms, a steep one (≪ −1) a vocabulary
    * starved of mid-frequency words. The OLS fit runs over the top-K
    * tokens by (count desc, token) — the frequency head carries the
    * law; the long tail is where Zipf breaks down in every corpus.
    *
    * Exactness discipline (the unigramLogLik micro-nat rule): ln(rank)
    * and ln(count) quantize to integer micro-nats per row, every OLS
    * moment (Σx, Σy, Σxy, Σx²) is then an exact integer, and
    * slope/intercept are single divisions of exact decimal
    * cross-products — the micro-nat scale cancels in the slope, and one
    * final /1e6 returns the intercept to nats (the fitted ln count at
    * rank 1). Moment bounds for K ≤ 1e4 and counts ≤ 1e18 sit inside
    * decimal(20,0); the cross-products inside decimal(38,0).
    *
    * 100 TB shape: one exploded scan → vocabulary aggregate → top-K by
    * TakeOrdered (distributed, never a global sort), then the fit is
    * arithmetic over K rows. A sub-2-point spectrum has no line and
    * fails loudly. */
  def zipfFit(docs: DataFrame, topK: Int = 500,
              quantum: Long = 1000000L): DataFrame = {
    require(topK >= 2, s"zipfFit: topK=$topK needs at least 2 points")
    val d19 = (c: Column) => c.cast("decimal(19,0)")
    val pts = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(topK) // TakeOrdered
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("cnt").desc, col("w"))))
      .select(
        round(log(col("rnk").cast("double")) * quantum).cast("long").as("x"),
        round(log(col("cnt").cast("double")) * quantum).cast("long").as("y"))
    pts
      .agg(
        count(lit(1)).as("k"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum((col("x") * col("y")).cast("decimal(20,0)")).as("sxy"),
        sum((col("x") * col("x")).cast("decimal(20,0)")).as("sxx"))
      .select(
        col("k").as("n_fit"),
        when(col("k") >= 2L,
          (d19(col("k")) * col("sxy") - d19(col("sx")) * d19(col("sy")))
            .cast("double") /
            (d19(col("k")) * col("sxx") - d19(col("sx")) * d19(col("sx")))
              .cast("double"))
          .otherwise(raise_error(lit(
            "zipfFit: need at least 2 distinct tokens to fit a line")))
          .as("zipf_slope"),
        ((d19(col("sy")) * col("sxx") - d19(col("sx")) * col("sxy"))
          .cast("double") /
          (d19(col("k")) * col("sxx") - d19(col("sx")) * d19(col("sx")))
            .cast("double") / lit(1000000.0)).as("intercept_ln"))
  }

  /** Deterministic doc-id-varied HTML page around the doc text — the
    * builder half of the HTML→text seam (the warcPayload pattern: the
    * fixture carries no HTML, so a page is CONSTRUCTED by expression
    * and the extractor is then tested against a real markup stream, not
    * against the construction's parts). Structure: head with an
    * id-titled `<title>`, an id-cycled `<style>` block (elided content),
    * an id-cycled `<script>` block and comment, a body paragraph whose
    * first 10+(id%7) characters are wrapped in an `<a>` (the link-
    * density signal), and a trailing paragraph of the five core
    * entities. Text is HTML-escaped (`& < >` → entities) BEFORE the
    * anchor split so extraction decodes back to the original text
    * verbatim — and the escape happens per anchor side so a multi-byte
    * entity can never straddle the anchor boundary. Every piece is
    * engine-portable string arithmetic, so the oracle rebuilds the
    * identical page and prices every census column analytically. */
  def htmlPayload(docId: Column, text: Column): Column = {
    def esc(c: Column): Column =
      replace(replace(replace(c, lit("&"), lit("&amp;")),
        lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))
    val w = (lit(10) + (docId % 7)).cast("int")
    val id = docId.cast("string")
    concat(
      lit("<!DOCTYPE html><html><head><title>Doc "), id, lit("</title>"),
      when(docId % 3 === 0, lit("<style>p{margin:0}</style>")).otherwise(lit("")),
      lit("</head><body>"),
      when(docId % 4 === 0,
        concat(lit("<script>var x="), id, lit(";</script>"))).otherwise(lit("")),
      when(docId % 5 === 0,
        concat(lit("<!--c"), id, lit("-->"))).otherwise(lit("")),
      lit("<p><a href=\"/d/"), id, lit("\">"),
      esc(text.substr(lit(1), w)),
      lit("</a>"),
      esc(text.substr(w + lit(1), length(text))),
      lit("</p><p>&amp;&lt;&gt;&quot;&apos;</p></body></html>"))
  }

  /** HTML→text extraction census — per document: the md5 of the
    * extracted text (pins the extraction end to end, not just counts)
    * and the markup census off the same single-pass codegen'd walk
    * (functions/HtmlKernel): codepoint counts of page/text, tag and
    * anchor tokens, anchor-text chars, decoded entities, elided
    * script/style/comment content, plus the two boilerplate signals —
    * link_density_ppm (anchor text over text, the jusText axis) and
    * markup_ratio_ppm (non-text page share, the C4 axis), both
    * exact-integer ppm divisions. One scan, all expression-side. */
  def htmlExtractCensus(docs: DataFrame): DataFrame =
    // null text builds no page (htmlPayload's concat propagates null) —
    // filter it out on BOTH sides (the lineDedup discipline) rather than
    // emit an all-null stats row the oracle's CASE arithmetic wouldn't
    htmlCensusFrom(docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        htmlPayload(col("doc_id"), col("text")).as("__html")))

  /** The census half over any (doc_id, __html) page frame — shared by
    * [[htmlExtractCensus]] (pages built directly) and the composed
    * WARC read path (pages sliced back out of a container by the
    * record walk: ops/Multimodal.warcHtmlTextCensus). */
  private[ops] def htmlCensusFrom(pages: DataFrame): DataFrame = {
    import graft.functions.TextFunctions
    pages
      .select(col("doc_id"),
        TextFunctions.htmlText(col("__html")).as("__t"),
        TextFunctions.htmlStats(col("__html")).as("__s"))
      .select(col("doc_id"), md5(col("__t")).as("text_md5"),
        col("__s").getItem(0).as("n_chars_html"),
        col("__s").getItem(1).as("n_chars_text"),
        col("__s").getItem(2).as("n_tags"),
        col("__s").getItem(3).as("n_anchors"),
        col("__s").getItem(4).as("n_anchor_chars"),
        col("__s").getItem(5).as("n_entities"),
        col("__s").getItem(6).as("n_elided_chars"),
        col("__s").getItem(7).as("malformed"))
      .withColumn("link_density_ppm",
        expr("1000000L * n_anchor_chars DIV n_chars_text"))
      .withColumn("markup_ratio_ppm",
        expr("1000000L * (n_chars_html - n_chars_text) DIV n_chars_html"))
  }

  /** The composition face: documents with `text` REPLACED by what the
    * extractor recovers from the constructed page — the frame every
    * downstream text op (quality, train-ready, tokenization) consumes
    * when the corpus arrives as WARC response payloads. */
  def htmlExtractDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), col("source"),
      graft.functions.TextFunctions.htmlText(
        htmlPayload(col("doc_id"), col("text"))).as("text"))

  /** Code-vs-prose detection — the routing signal a mixed web corpus
    * needs before language-ID or quality scoring (code pages poison
    * prose perplexity and vice versa; StarCoder-era pipelines gate on
    * exactly these surface statistics). Pure per-row regex counts in
    * exact integer ppm (the piiScrub pattern discipline: plain
    * classes, ASCII word boundaries — RE2-safe so the oracle replays
    * them): code-symbol density, camelCase identifiers, language
    * keywords as whole words, and indented lines. The verdict is a
    * threshold OR over the signals — a heuristic gate, priced by its
    * inputs which are all exact. */
  private val CodeSymbolRe = "[{}();=<>\\[\\]]"
  private val CamelRe = "\\b[a-z][a-z0-9]*[A-Z]"
  private val CodeKwRe =
    "\\b(def|class|return|import|void|int|function|var|const|if|else|for|while)\\b"
  private val IndentRe = "\\n  +[^ ]"

  def codeDetect(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      regexp_count(col("text"), lit(CodeSymbolRe)).cast("long").as("n_symbols"),
      regexp_count(col("text"), lit(CamelRe)).cast("long").as("n_camel"),
      regexp_count(col("text"), lit(CodeKwRe)).cast("long").as("n_keywords"),
      regexp_count(col("text"), lit(IndentRe)).cast("long").as("n_indented"))
      .withColumn("symbol_ppm",
        expr("1000000L * n_symbols DIV greatest(n_chars, 1)"))
      .withColumn("is_code",
        (col("symbol_ppm") >= 40000L) ||
          (col("n_keywords") >= 3L && col("n_symbols") >= 5L) ||
          col("n_indented") >= 3L)

  /** documents → RAW-byte frame with doc_id-cycled ill-formed UTF-8
    * planted after the text — the wire shape a crawler actually hands a
    * pipeline (container payloads are bytes, and real captures carry
    * mojibake): class 0 clean, 1 broken 2-byte pair (C3 28 — one
    * maximal subpart + '('), 2 overlong slash (C0 AF — two invalid
    * leads), 3 CESU surrogate (ED A0 80 — the JDK substitutes the
    * whole structurally-decodable unit ONCE), 4 truncated 4-byte (F0 90 28 — a two-byte valid
    * prefix + '('). Each class's repair is construction-determined, so
    * the census oracle is exact for ANY text. */
  def rawBytesFrame(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat(col("text").cast("binary"),
        element_at(array(
          lit(Array.empty[Byte]), unhex(lit("C328")), unhex(lit("C0AF")),
          unhex(lit("EDA080")), unhex(lit("F09028"))),
          (pmod(col("doc_id"), lit(5L)) + 1).cast("int"))).as("payload"))

  /** RAW bytes → the decode-gate census: byte/codepoint accounting,
    * repair count, and the md5 of the REPAIRED string (one U+FFFD per
    * maximal ill-formed subpart — the JDK policy, property-pinned).
    * Pure per-row kernel work over one scan; at 100 TB this is the
    * first pass after the container walk, before any string operator. */
  def utf8Census(frame: DataFrame): DataFrame = {
    val s = graft.functions.TextFunctions.utf8Stats(col("payload"))
    frame.select(
      col("doc_id"),
      element_at(s, 1).as("n_bytes"),
      element_at(s, 2).as("n_cp_out"),
      element_at(s, 7).as("n_bad"),
      md5(graft.functions.TextFunctions.utf8Sanitize(col("payload"))
        .cast("binary")).as("clean_md5"))
  }
}
