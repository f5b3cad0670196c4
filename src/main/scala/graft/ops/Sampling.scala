package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reproducible sampling/splitting primitives for the training-data
  * pipeline. A corpus feeding a training run needs (a) a train/eval split
  * that never moves between runs or engines, (b) per-source quotas so one
  * over-represented domain can't dominate a mixture, and (c) a
  * deterministic global shuffle for training order. All three key off
  * content hashes, never `rand()`/`monotonically_increasing_id`: a
  * nondeterministic split changes under task retry and silently leaks eval
  * rows into train on a 1000-executor cluster (same failure class as
  * rand()-salting, ops/Skew.scala).
  *
  * md5 is the hash on purpose — every engine renders it as identical
  * lowercase hex, so splits reproduce bit-for-bit outside Spark (DuckDB,
  * Python) and the assignment itself is oracle-checkable. Spark's native
  * `hash()`/`xxhash64` are Spark-private seeds, non-portable.
  */
object Sampling {

  /** Lowercase-hex md5 of a stable id rendered as a string; the seed folds
    * in so distinct use sites (split vs shuffle) decorrelate. */
  private def idHash(idCol: Column, seed: String): Column =
    md5(concat(lit(seed), idCol.cast("string")))

  /** Deterministic train/eval assignment from the first two hex chars of
    * the id hash: 256 buckets, `trainBuckets` of them → train (230 ≈ a
    * 90/10 split). Purely per-row — no shuffle, survives repartitioning,
    * and composes with any downstream filter. */
  def splitColumn(idCol: Column, trainBuckets: Int = 230, seed: String = "split:"): Column = {
    require(trainBuckets > 0 && trainBuckets < 256, "trainBuckets must be in (0, 256)")
    // string compare on fixed-width lowercase hex == numeric bucket compare
    val bound = f"${trainBuckets - 1}%02x"
    when(substring(idHash(idCol, seed), 1, 2) <= bound, "train").otherwise("eval")
  }

  /** Split census: per-(lang, split) document and char volume — the
    * sanity-check a pipeline runs before training (is eval ~10% in every
    * language, or did a skewed id space starve one?). */
  def splitCensus(docs: DataFrame): DataFrame =
    docs
      .withColumn("split", splitColumn(col("doc_id")))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))

  /** Deterministic k-fold assignment: fold = (first hash byte) mod k.
    * The cross-validation sibling of [[splitColumn]] — per-row, no
    * shuffle, survives repartitioning and task retry, and reproduces
    * bit-for-bit in any engine that can render md5 hex (the byte parses
    * with plain string ops — no engine-private hash seeds). Folds are
    * equal-probability only when 256 mod k == 0; the residue classes are
    * off by at most 1/256 of the mass, which a census makes visible. */
  def kfoldColumn(idCol: Column, k: Int = 5, seed: String = "fold:"): Column = {
    require(k >= 2 && k <= 256, s"kfold: k=$k must be in [2, 256]")
    (conv(substring(idHash(idCol, seed), 1, 2), 16, 10).cast("int") % k).as("fold")
  }

  /** k-fold census: per-(fold, lang) document and char volume — the
    * pre-training check that no fold starves a language (same role as
    * [[splitCensus]] for the train/eval split). */
  def kfoldCensus(docs: DataFrame, k: Int = 5): DataFrame =
    docs
      .withColumn("fold", kfoldColumn(col("doc_id"), k))
      .groupBy("fold", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))

  /** Token-length histogram over power-of-two buckets — the statistic a
    * packing planner reads before choosing sequence lengths: how many
    * docs and tokens land in each ceil-pow2 length class, and how many
    * pad tokens a naive one-doc-per-sequence batching of that class
    * would burn (`pad_tokens` = Σ bucket − n). The bucket is computed
    * WITHOUT transcendentals — ceil(log2(n)) is the bit length of n−1
    * (`length(bin(n-1))`), exact integer-only and engine-portable, where
    * a float log2 could mis-bin near exact powers of two. Purely per-row
    * until one small aggregate (≤ ~40 buckets). */
  def lengthBuckets(docs: DataFrame): DataFrame =
    docs
      .select(size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("bucket",
        when(col("n_tokens") <= 1L, 1L)
          .otherwise(expr("CAST(shiftleft(1L, length(bin(n_tokens - 1))) AS BIGINT)")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens_total"),
        sum(col("bucket") - col("n_tokens")).as("pad_tokens"))

  /** Per-source quota: keep at most `cap` docs per source, preferring the
    * longest (n_chars desc, doc_id tiebreak). One shuffle on source; the
    * window prunes to a per-partition top-k before anything downstream.
    * At 100 TB a hot source still funnels through one task — for extreme
    * skew use [[perSourceCapSalted]], the two-phase form; single-phase is
    * right below that scale. */
  def perSourceCap(docs: DataFrame, cap: Int = 100): DataFrame = {
    val w = Window.partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))
    docs.withColumn("rank_in_source", row_number().over(w))
      .filter(col("rank_in_source") <= cap)
  }

  /** Two-phase [[perSourceCap]] for hot-source skew (same shape as
    * Skew.saltedCountDistinct): phase 1 ranks within (source, salt) and
    * keeps each salt's top `cap`, spreading a 10 TB source across `salts`
    * tasks; phase 2 re-ranks the ≤ salts·cap survivors per source. Every
    * row in the global top `cap` is in its own salt's top `cap`, so the
    * result — including `rank_in_source` — is row-for-row identical to the
    * single-phase form (spec-pinned, SamplingSpec). The salt hashes the
    * doc_id (never `rand()`: a retried task must re-deal identically), and
    * it needs no cross-engine portability — it shapes the plan, not the
    * output. */
  def perSourceCapSalted(docs: DataFrame, cap: Int = 100, salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    val order = Seq(col("n_chars").desc, col("doc_id"))
    val pre = Window.partitionBy(col("source"), pmod(xxhash64(col("doc_id")), lit(salts)))
      .orderBy(order: _*)
    val post = Window.partitionBy("source").orderBy(order: _*)
    docs
      .withColumn("salt_rank", row_number().over(pre))
      .filter(col("salt_rank") <= cap)
      .drop("salt_rank")
      .withColumn("rank_in_source", row_number().over(post))
      .filter(col("rank_in_source") <= cap)
  }

  /** Deterministic sequence packing: deal the corpus into training
    * sequences of exactly `budgetTokens` whitespace tokens — contiguous
    * fill in a reproducible order, the standard pretraining packing (docs
    * may span pack boundaries; no padding waste). Docs shard by the first
    * hex digit of their id-hash, so packing is embarrassingly parallel (one
    * shuffle, 16 independent window scans) and the assignment is invariant
    * to input partitioning, engine, and retries; within a shard the order
    * is (hash, doc_id). Emits, per doc, the pack holding its FIRST token
    * and the offset there — enough for a reader to slice exact sequences.
    * At 100 TB, widen to more shards by keying on more hex digits; the
    * per-shard scan is linear and the cumsum never materializes a pack. */
  def packSequences(docs: DataFrame, budgetTokens: Long = 2048L,
                    seed: String = "pack:"): DataFrame =
    packSequencesBy(docs, size(split(col("text"), " ")).cast("long"),
      budgetTokens, seed)

  /** [[packSequences]] under ANY per-row token pricer — the seam that
    * lets the packer deal in the units the trainer bills (pass the BPE
    * counter) without a second implementation. Same sharded window,
    * same reproducible order, same output contract. */
  def packSequencesBy(docs: DataFrame, nTokens: Column,
                      budgetTokens: Long = 2048L,
                      seed: String = "pack:"): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w = Window.partitionBy("shard").orderBy("h", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), idHash(col("doc_id"), seed).as("h"),
        nTokens.cast("long").as("n_tokens"))
      .withColumn("shard", conv(substring(col("h"), 1, 1), 16, 10).cast("int"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .select(
        col("doc_id"), col("shard"), col("n_tokens"),
        expr(s"(cum_tokens - n_tokens) div $budgetTokens").as("pack_id"),
        ((col("cum_tokens") - col("n_tokens")) % budgetTokens).as("pack_offset"))
  }

  /** Best-fit-decreasing sequence packing — WHOLE-DOC bins beside
    * [[packSequences]]' contiguous-fill spans: the packing discipline an
    * SFT/eval planner ships when documents must not cross sequence
    * boundaries, so bins carry real pad waste and the packer's job is to
    * minimize it. Docs shard by the same first-hex-digit id-hash as
    * [[packSequences]] (embarrassingly parallel, retry/partitioning
    * invariant), then each shard folds its docs in (n_tokens desc,
    * doc_id) order: a doc goes to the open bin with the LEAST remaining
    * room that still fits (= max load among fitting bins), ties to the
    * smallest bin id, or opens a new bin when none fits. Emits one row
    * per doc: (doc_id, shard, n_tokens, bin) with bin ids 0-based per
    * shard in opening order.
    *
    * Docs longer than the budget raise loudly — whole-doc placement is
    * the contract; truncate or span upstream ([[packSequences]] spans).
    *
    * Shape: the fold is inherently sequential per shard, so it runs as
    * ONE linear pass of the codegen'd sequential-recurrence kernel over
    * the shard's collect_list'd docs — the
    * ewmaServe/ACF per-key-fold discipline, bounded by shard size; at
    * 100 TB widen to more shards by keying on more hex digits (pack
    * quality is per-shard either way). Exact integers end to end, so
    * the DuckDB oracle replays the fold as a recursive CTE and the
    * frame hash-matches. */
  def packSequencesBfd(docs: DataFrame, budgetTokens: Long = 256L,
                       seed: String = "pack:"): DataFrame =
    bfdFold(docs, budgetTokens, seed)
      .select(col("shard"), explode(col("asg")).as("a"))
      .select(col("a.doc_id").as("doc_id"), col("shard"),
        col("a.n").as("n_tokens"), col("a.bin").as("bin"))

  /** Pad-waste accounting for [[packSequencesBfd]] vs the greedy
    * next-fit packer (same shards, same decreasing order, but only the
    * CURRENT bin stays open) — the measurable answer to "what did
    * best-fit buy": per shard, bin counts and waste = bins·budget −
    * Σ n_tokens for both disciplines, plus the delta. Connects
    * q_length_buckets' padding arithmetic to an actual packing plan. */
  def packWasteReport(docs: DataFrame, budgetTokens: Long = 256L,
                      seed: String = "pack:"): DataFrame = {
    val b = budgetTokens
    bfdFold(docs, b, seed)
      .select(col("shard"),
        size(col("xs")).cast("long").as("n_docs"),
        aggregate(col("xs"), lit(0L), (acc, d) => acc + d.getField("n"))
          .as("total_tokens"),
        // bins in opening order, so the bin count is the max id + 1
        (expr("array_max(transform(asg, a -> a.bin))") + 1L).as("bins_bfd"),
        expr(
          s"""aggregate(xs,
             |  struct(CAST(0 AS BIGINT) AS nbins, CAST($b AS BIGINT) AS cur),
             |  (acc, d) -> IF(acc.cur + d.n <= $b,
             |    struct(acc.nbins AS nbins, acc.cur + d.n AS cur),
             |    struct(acc.nbins + 1L AS nbins, d.n AS cur)),
             |  acc -> acc.nbins)""".stripMargin).as("bins_greedy"))
      .select(col("shard"), col("n_docs"), col("total_tokens"),
        col("bins_bfd"),
        (col("bins_bfd") * b - col("total_tokens")).as("waste_bfd"),
        col("bins_greedy"),
        (col("bins_greedy") * b - col("total_tokens")).as("waste_greedy"),
        ((col("bins_greedy") - col("bins_bfd")) * b).as("waste_delta"))
  }

  /** The shared BFD fold: per shard, (xs = docs sorted n-desc/id-asc,
    * asg = one (doc_id, bin, n) per doc, bins 0-based in opening
    * order). The placement runs in the codegen'd linear-time fold
    * (functions/RecurrenceKernel, kind bfd) — same best-fit rule as
    * the retired `aggregate` HOF (greatest fitting load, FIRST index
    * on ties, the array_position discipline) without the per-step
    * accumulator concat that copied the whole assignment again. */
  private def bfdFold(docs: DataFrame, budgetTokens: Long,
                      seed: String): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val b = budgetTokens
    val guarded = docs
      .select(col("doc_id"), idHash(col("doc_id"), seed).as("h"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("n_tokens",
        when(col("n_tokens") > b, raise_error(concat(
          lit(s"packSequencesBfd: doc "), col("doc_id").cast("string"),
          lit(s" has more tokens than the budget $b — whole-doc placement"),
          lit(" is the contract; truncate or use packSequences"))))
          .otherwise(col("n_tokens")))
      .withColumn("shard", conv(substring(col("h"), 1, 1), 16, 10).cast("int"))
    // ascending struct sort on (-n, id) = the BFD (n desc, id asc) order
    guarded.groupBy("shard")
      .agg(sort_array(collect_list(struct((-col("n_tokens")).as("neg"),
        col("doc_id"), col("n_tokens").as("n")))).as("xs"))
      .withColumn("asg",
        graft.functions.RecurrenceFunctions.bfdFold(col("xs"), b))
  }

  /** Quality-proportional thinning — per-doc importance sampling: doc i
    * is kept with probability (targetNum/targetDen) · quality(i), so the
    * surviving corpus is quality-weighted without ranking or sorting
    * (the DCLM-style soft filter, vs [[stratifiedSample]]'s hard
    * per-stratum rates). Purely per-row like splitColumn — no global
    * aggregate, no shuffle, scan-speed at 100 TB, deterministic under
    * retries and repartitioning; the expected kept fraction is
    * target · mean(quality) (budget a fixed fraction by solving target
    * from a separate mean pass, or use [[mixtureRates]] for stratum
    * budgets). Engine-portable by the same trick as stratifiedSample:
    * the keep test compares a fixed-width hex slice of the portable md5
    * against a PER-ROW integer threshold rendered in hex —
    * floor(target · qq · 16^5 / 10^6) over the micro-quantized quality,
    * all Long arithmetic; rate ≥ 1 short-circuits to keep-all (a 6-hex
    * threshold would compare lexicographically wrong). */
  def qualityThin(docs: DataFrame, targetNum: Long = 1L, targetDen: Long = 1L,
                  seed: String = "qthin:"): DataFrame = {
    require(targetNum > 0 && targetDen > 0 && targetNum <= targetDen,
      s"target $targetNum/$targetDen out of (0,1]")
    TextAnalysis.quality(docs)
      .select(col("doc_id"),
        floor(col("quality_score") * 1000000.0).cast("long").as("qq"))
      .filter((lit(targetNum) * col("qq") >= lit(targetDen) * lit(1000000L)) ||
        substring(idHash(col("doc_id"), seed), 1, 5) <
          lpad(lower(hex(expr(
            s"($targetNum * qq * 1048576) DIV ($targetDen * 1000000)"))), 5, "0"))
  }

  /** Deterministic global shuffle: orders by the seeded id hash. Changing
    * the seed re-deals the order; the same seed reproduces it anywhere.
    * A total sort costs one range-partitioning exchange — at cluster scale
    * that IS the intended plan (training shards then read back in hash
    * order); for shard-local orders, sortWithinPartitions on the same key. */
  /** Stratified downsampling at a per-stratum rate — the corpus-mixing
    * primitive (e.g. keep 50% of English, all of the low-resource
    * languages). Purely per-row like [[splitColumn]]: the doc's md5 maps
    * it into 65536 buckets and the stratum's rate keeps the first
    * ⌈rate·65536⌉ of them, so membership is deterministic under retries,
    * repartitioning, and streaming; no shuffle, no sampling state. The
    * rate quantization error is ≤ 1/65536 per stratum; fixed-width
    * lowercase-hex string compare == numeric bucket compare (same trick
    * as splitColumn, portable to any engine with md5). */
  def stratifiedSample(docs: DataFrame, rates: Map[String, Double],
                       strataCol: String = "lang", idCol: String = "doc_id",
                       defaultRate: Double = 1.0,
                       seed: String = "strat:"): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rate out of [0,1]: $r"))
    def keep(rate: Double): Column = {
      val n = math.ceil(rate * 65536).toLong
      if (n <= 0L) lit(false)
      else if (n >= 65536L) lit(true)
      else substring(idHash(col(idCol), seed), 1, 4) <= f"${n - 1}%04x"
    }
    val cond = rates.foldLeft(when(lit(false), lit(false))) {
      case (acc, (stratum, rate)) => acc.when(col(strataCol) === stratum, keep(rate))
    }.otherwise(keep(defaultRate))
    docs.filter(cond)
  }

  /** Temperature-based mixture rates for [[stratifiedSample]]: stratum l
    * gets share p_l ∝ n_l^alpha (alpha 1 → proportional, i.e. uniform
    * downsampling; alpha 0 → equal share per stratum, maximally
    * up-weighting rare strata; multilingual pipelines typically run
    * 0.2-0.7). The per-doc keep rate targets `targetFraction` of the
    * corpus in expectation, capped at 1 per stratum (a capped stratum
    * contributes all it has; the realized total then undershoots — by
    * design, never oversample). Driver-side O(#strata) arithmetic over
    * the per-stratum counts (one small aggregate to produce). */
  def mixtureRates(counts: Map[String, Long], alpha: Double,
                   targetFraction: Double): Map[String, Double] = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha out of [0,1]: $alpha")
    require(targetFraction > 0.0 && targetFraction <= 1.0,
      s"targetFraction out of (0,1]: $targetFraction")
    // a zero-count stratum with alpha > 0 yields 0/0 = NaN, which would
    // only surface later in stratifiedSample's rate check with no hint of
    // which stratum — name it here at the source instead
    counts.collectFirst { case (k, c) if c <= 0 => k }.foreach(k =>
      throw new IllegalArgumentException(
        s"mixtureRates: stratum '$k' has non-positive count ${counts(k)}"))
    val n = counts.values.map(_.toDouble).sum
    val weights = counts.map { case (k, c) => k -> math.pow(c.toDouble, alpha) }
    val z = weights.values.sum
    counts.map { case (k, c) =>
      k -> math.min(1.0, targetFraction * n * (weights(k) / z) / c.toDouble)
    }
  }

  /** The temperature-mixing PLAN as an oracle-checkable frame — the
    * token-priced twin of [[mixtureRates]]. mixtureRates answers "what
    * per-doc keep rate per stratum" driver-side (arbitrary α via
    * `math.pow`, fine off-plan); this op answers the budgeting question
    * a run actually starts from: given a token budget B and per-source
    * token masses n_s, the α=½ temperature allocation
    * share_s = √n_s / Σ√n_t, alloc_s = share_s·B, epochs_s = alloc_s/n_s
    * — the standard up-weighting of small sources (mC4/XLM-R style).
    *
    * α is FIXED at ½ here on purpose: `sqrt` is IEEE
    * correctly-rounded in every engine, `pow(x, 0.3)` is not — a
    * libm-dependent ulp would break the oracle hash. The weight
    * quantizes to micro-units (floor(1e6·√n), per-row double ops are
    * engine-exact) so the normalizer is an INTEGER sum — order-free,
    * partitioning-invariant — and shares/allocations are per-row
    * divisions of exact integers. Sources are a bounded dimension: one
    * corpus scan, one tiny aggregate, a window total over ≤ sources
    * rows. Weight bound: 1e6·√n holds in long to n ≈ 8e25 tokens. */
  def temperatureMix(docs: DataFrame, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0L, s"temperatureMix: budget $budgetTokens")
    val perSource = docs
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      .withColumn("weight",
        floor(lit(1000000.0) * sqrt(col("n_tokens").cast("double"))))
    val total = Window.partitionBy()
    perSource
      .withColumn("tw", sum("weight").over(total))
      .select(
        col("source"), col("n_docs"), col("n_tokens"), col("weight"),
        (col("weight").cast("double") / col("tw").cast("double")).as("share"),
        (col("weight").cast("double") * lit(budgetTokens.toDouble) /
          col("tw").cast("double")).as("alloc_tokens"),
        (col("weight").cast("double") * lit(budgetTokens.toDouble) /
          col("tw").cast("double") / col("n_tokens").cast("double")).as("epochs"))
  }

  def deterministicShuffle(docs: DataFrame, seed: String): DataFrame =
    docs.withColumn("shuffle_key", idHash(col("doc_id"), seed))
      .orderBy("shuffle_key")

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006):
    * each row draws priority u^(1/w) for a uniform u — here ranked by
    * the monotone equivalent ln(u)/w — and the k largest priorities are
    * the sample, which realizes inclusion probabilities proportional to
    * the weights. The quality-weighted corpus pick the plain
    * [[deterministicShuffle]] (w ≡ 1) cannot express.
    *
    * Portability discipline: u = (h+1)/2^60 from the row's 60-bit md5
    * slice (never 0, so ln is finite); ln(u) is quantized to integer
    * micro-nats FIRST (one round per row — the bigram rule), and the
    * ONLY other float op is the single division of that exact integer
    * by the exact weight, identical IEEE in any engine — so the ranking
    * key is bit-stable and the TakeOrdered sample replays in the
    * oracle. Weights must be strictly positive — zero would make every
    * u map to priority 0 (ties decided by id, not weight) and a
    * negative weight flips the ranking; both raise loudly. Weights must
    * also be INTEGRAL: the priority divides the quantized micro-nat by
    * the weight as an exact long, so a fractional weight would be
    * silently truncated (0.5 → 0, 2.9 → 2) and distort inclusion
    * probabilities — a fractional input raises loudly instead (scale
    * fractional weights to an integer grid upstream, e.g. ×1000).
    *
    * Scale shape: one scan, per-row arithmetic, TakeOrdered(k) — no
    * shuffle beyond the bounded merge of per-partition heads. */
  def weightedSample(docs: DataFrame, weight: Column, k: Int = 100,
                     seed: String = "wsample:"): DataFrame = {
    require(k >= 1, s"weightedSample: k=$k must be >= 1")
    val h = conv(substring(md5(concat(lit(seed), col("doc_id").cast("string"))),
      1, 15), 16, 10).cast("long")
    val w = weight.cast("long")
    // integrality first: a fractional 0.5 must raise as fractional, not
    // truncate to 0 and raise the misleading "non-positive weight 0"
    val guarded = when(weight.cast("double") =!= w.cast("double"),
      raise_error(concat(lit("weightedSample: fractional weight "),
        weight.cast("string"), lit(" for doc_id "),
        col("doc_id").cast("string"),
        lit(" — weights are exact longs; scale to an integer grid upstream"))))
      .when(w <= 0L,
        raise_error(concat(lit("weightedSample: non-positive weight "),
          w.cast("string"), lit(" for doc_id "), col("doc_id").cast("string"))))
      .otherwise(w)
    docs
      .select(col("doc_id"), guarded.as("w"),
        round(log((h + 1L).cast("double") / lit(1.152921504606846976e18)) *
          1000000.0).cast("long").as("qln"))
      .select(col("doc_id"), col("w"),
        (col("qln").cast("double") / col("w").cast("double")).as("priority"))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(k)
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * how much it resembles a TARGET domain, log w(d) = Σ_f [ln p̂_target(f)
    * − ln p̂_raw(f)] over the doc's hashed n-gram features (unigrams +
    * bigrams into `buckets` bins — the bounded sufficient statistic that
    * makes both models ≤buckets rows regardless of corpus size). Raw is
    * the whole corpus; both models are add-one smoothed, and each
    * per-bucket log-ratio is quantized to integer micro-nats BEFORE the
    * per-doc sum (the raw-double-sum rule), so the score is an exact
    * integer. Plan: the feature frame is scope-cached (the dedup postings
    * pattern) and feeds (a) the ≤buckets-row count table — global-window
    * totals over that BOUNDED frame only — and (b) the scoring join
    * against the broadcast ratio table: one corpus scan, shuffles keyed
    * by bucket/doc only. Re-sampling is then a per-row keep test against
    * the weights — [[deterministicShuffle]]/[[splitColumn]] territory —
    * so the scorer is the whole distributed cost. */
  def dsirWeights(docs: DataFrame, isTarget: Column,
                  buckets: Int = 4096, quantum: Long = 1000000L): DataFrame = {
    require(buckets > 0 && 4096 % buckets == 0,
      s"buckets must divide the 12-bit hash space, got $buckets")
    val tk = split(col("text"), " ")
    val uni = docs.select(col("doc_id"), isTarget.cast("int").as("is_t"),
      explode(tk).as("f"))
    val bi = docs.select(col("doc_id"), isTarget.cast("int").as("is_t"), tk.as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), col("is_t"), explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> concat(tk[i - 1], ' ', tk[i]))"))
        .as("f"))
    val feats = uni.unionByName(bi).select(col("doc_id"), col("is_t"),
      (conv(substring(md5(concat(lit("dsir:"), col("f"))), 1, 3), 16, 10)
        .cast("int") % buckets).as("bucket"))
    Dedup.withScopedCache(feats) { fr =>
      val bc = fr.groupBy("bucket")
        .agg(sum("is_t").cast("long").as("ct"), count(lit(1)).as("cr"))
      val total = Window.partitionBy() // ≤buckets rows — bounded
      val ratio = bc
        .withColumn("nt", sum("ct").over(total))
        .withColumn("nr", sum("cr").over(total))
        .select(col("bucket"),
          round((log((col("ct") + lit(1L)).cast("double") /
              (col("nt") + lit(buckets.toLong)).cast("double")) -
            log((col("cr") + lit(1L)).cast("double") /
              (col("nr") + lit(buckets.toLong)).cast("double"))) *
            lit(quantum.toDouble)).cast("long").as("qlr"))
      fr.join(broadcast(ratio), Seq("bucket"))
        .groupBy("doc_id", "is_t")
        .agg(count(lit(1)).as("n_feats"), sum("qlr").as("sum_qlw"))
        .select(col("doc_id"), col("is_t").as("is_target"), col("n_feats"),
          col("sum_qlw"),
          (col("sum_qlw").cast("double") / quantum.toDouble).as("logweight_nats"))
    }
  }

  /** The selection face of [[dsirWeights]]: the top-N most
    * target-resembling documents, ranked by the exact integer score with
    * doc_id as the total tie-break. TakeOrdered shape (orderBy+limit —
    * per-partition top-N then a merge of N-row heads, never a global
    * sort); the display rank is a window over the N selected rows only.
    * This is the importance-RESAMPLING step run after the scorer: a
    * budget of N docs drawn from the pool by target resemblance. */
  def dsirSelect(docs: DataFrame, isTarget: Column, topN: Int = 100,
                 buckets: Int = 4096): DataFrame = {
    require(topN > 0, s"topN must be positive, got $topN")
    val head = dsirWeights(docs, isTarget, buckets)
      .orderBy(col("sum_qlw").desc, col("doc_id")).limit(topN)
    head.withColumn("rank",
      row_number().over(Window.orderBy(col("sum_qlw").desc, col("doc_id"))))
      .select("rank", "doc_id", "is_target", "sum_qlw")
  }

  /** Leakage-safe train/eval split: assignment by the doc's near-dup
    * CLUSTER, not the doc. Hashing raw doc ids lets a near-duplicate of
    * an eval doc land in train — the silent benchmark-inflation path
    * decontamination exists to close. Hashing the CANONICAL id (the
    * cluster representative from [[Graph.canonicalize]]) gives every
    * member of a dup cluster the same assignment, so no cluster can
    * straddle the boundary — same 256-bucket hash rule as [[splitColumn]],
    * so singleton docs split exactly as before. */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame,
                       trainBuckets: Int = 230, seed: String = "split:"): DataFrame =
    leakageSafeSplitFromCanon(Graph.canonicalize(docs, pairs), trainBuckets, seed)

  /** [[leakageSafeSplit]] over a prebuilt canonical frame (doc_id,
    * canonical_id) — see [[Graph.canonicalizeFromComponents]]: the
    * closure resolution is a shared (at scale, nightly-artifact) seam,
    * and the split itself is one hash expression over it. */
  def leakageSafeSplitFromCanon(canon: DataFrame, trainBuckets: Int = 230,
                                seed: String = "split:"): DataFrame =
    canon.withColumn("split", splitColumn(col("canonical_id"), trainBuckets, seed))

  /** Deterministic Poisson-bootstrap confidence interval for the
    * per-type mean — resampling with NO randomness at run time: each
    * (event, replicate) draws its Poisson(1) weight by comparing the
    * first 8 hex chars of the portable md5 of (seed, id, replicate)
    * against the Poisson CDF thresholds rendered as fixed-width
    * lowercase hex (string compare ≡ numeric compare, the
    * [[qualityThin]] device), so every engine resamples IDENTICALLY and
    * the whole CI is hash-matchable. Replicate means divide exact
    * integer sums (micro-quantized values, integer weights ≤ 7 — the
    * CDF tail beyond 7 is < 1e-4 and maps to 7); the band endpoints are
    * rank-selected replicate means (ceil(p·B), the discrete-quantile
    * rule — no interpolation).
    *
    * 100 TB shape: one explode ×B/4 with each md5 sliced into FOUR
    * replicate weights (an md5 has 32 hex chars — burning 8 and
    * discarding 24 per draw would quadruple the hash bill, the actual
    * hot cost), one shuffle whose map-side combine collapses to
    * (type × B) rows per partition, one rank window over B-sized
    * partitions with BOTH band endpoints picked in the same pass (a
    * second consumer would re-run the whole hash pipeline). B scales
    * the explode linearly — the classic Poisson-bootstrap trade,
    * embarrassingly parallel. */
  def bootstrapCI(events: DataFrame, replicates: Int = 100,
                  loP: Double = 0.05, hiP: Double = 0.95,
                  seed: String = "boot:"): DataFrame = {
    require(replicates >= 4 && replicates % 4 == 0,
      s"bootstrapCI: replicates=$replicates must be a positive multiple of 4 " +
        "(each portable md5 is sliced into four draws)")
    require(loP > 0 && loP < hiP && hiP < 1,
      s"bootstrapCI: need 0 < loP=$loP < hiP=$hiP < 1")
    // Poisson(1) CDF · 2^32, floor, as fixed-width lowercase hex
    val thresholds = Seq(
      "5e2d58d8", "bc5ab1b1", "eb715e1d", "fb239797",
      "ff1025f5", "ffd90f3b", "fffa8b71")
    val q = events
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_type"), col("event_id"),
        floor(col("value") * 1000000.0).cast("long").as("qv"))
    val h8 = col("h8")
    val w = thresholds.zipWithIndex
      .foldRight(lit(7L)) { case ((t, i), rest) => when(h8 < t, i.toLong).otherwise(rest) }
    // ONE corpus scan, enforced by construction: the exact per-type mean
    // rides the SAME exploded aggregate as a sentinel "replicate" g = −1
    // (one row per event, weight 1, no md5 spent), so its group lands at
    // (type, rep = −4) with swq = Σqv and sw = n — the second corpus
    // branch the old two-consumer form paid (and at 100 TB the corpus
    // scan IS the cost) is gone; PlanContractSpec pins the single scan.
    val hashCol = when(col("g") === -1, lit(""))
      .otherwise(md5(concat(lit(seed), col("event_id").cast("string"),
        lit(":"), col("g").cast("string"))))
    val means = q
      .select(col("event_type"), col("event_id"), col("qv"),
        explode(sequence(lit(-1), lit(replicates / 4 - 1))).as("g"))
      .withColumn("h", hashCol)
      .select(col("event_type"), col("qv"), col("g"),
        posexplode(slice(
          array((0 until 4).map(j => substring(col("h"), j * 8 + 1, 8)): _*),
          lit(1), when(col("g") === -1, 1).otherwise(4)))
          .as(Seq("j", "h8")))
      .select(col("event_type"), col("qv"),
        (col("g") * 4 + col("j")).as("rep"),
        when(col("g") === -1, lit(1L)).otherwise(w).as("w"))
      .groupBy("event_type", "rep")
      .agg(sum(col("w") * col("qv")).as("swq"), sum(col("w")).as("sw"))
      .filter(col("sw") > 0) // a zero-weight replicate has no mean
      .withColumn("mean_b", col("swq").cast("double") / col("sw"))
    // rank-select both band endpoints AND pick up the sentinel's exact
    // totals in one window + one aggregate: the sentinel sorts last
    // (flag 1) so replicate ranks 1..nb are exactly the old ordering
    val isSent = col("rep") < 0
    val byType = Window.partitionBy("event_type")
    means
      .withColumn("rn", row_number().over(
        byType.orderBy(when(isSent, 1).otherwise(0), col("mean_b"))))
      .withColumn("nb", count(when(!isSent, 1)).over(byType))
      .groupBy("event_type")
      .agg(
        max(when(isSent, col("sw"))).as("n"),
        max(when(isSent, col("swq"))).as("sq"),
        max(when(!isSent && col("rn") === greatest(lit(1L), ceil(lit(loP) * col("nb"))),
          col("mean_b"))).as("ci_lo"),
        max(when(!isSent && col("rn") === greatest(lit(1L), ceil(lit(hiP) * col("nb"))),
          col("mean_b"))).as("ci_hi"))
      .select(col("event_type"), col("n"),
        (col("sq").cast("double") / col("n")).as("mean_q"),
        col("ci_lo"), col("ci_hi"))
      // a type whose every replicate drew zero total weight has no band
      // at all (nb = 0 ⇒ no rank matches): drop it, matching both the
      // pre-sentinel inner-join semantics and the oracle's pt JOIN lo
      // JOIN hi, which never emits a null-CI row
      .filter(col("ci_lo").isNotNull && col("ci_hi").isNotNull)
  }

  /** Per-key rate cap within a time bucket: keep at most `cap` events
    * per (key, bucket) — the ingest throttle bounding any key's
    * contribution per period (a runaway logger must not dominate a
    * period's training slice). Deterministic keep rule: earliest
    * (ts, id) first. One shuffle on (key, bucket); the window prunes per
    * partition. `bucket` is any date_trunc unit ("hour", "day", ...). */
  def rateCap(events: DataFrame, cap: Int = 5, bucket: String = "hour",
              keyCol: String = "user_id",
              tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    require(cap > 0, "cap must be positive")
    val w = Window.partitionBy(col(keyCol), date_trunc(bucket, col(tsCol)))
      .orderBy(col(tsCol), col(idCol))
    events.where(col(tsCol).isNotNull)
      .withColumn("rank_in_bucket", row_number().over(w))
      .filter(col("rank_in_bucket") <= cap)
  }
}
