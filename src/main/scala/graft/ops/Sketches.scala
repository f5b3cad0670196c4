package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed cardinality sketching — a HyperLogLog built from the
  * repo's portable md5 hash (Flajolet/Fusy/Gandouet/Meunier 2007), as
  * relational operators instead of an opaque binary blob: the register
  * table IS a DataFrame, so it merges by `max`, persists as parquet,
  * serves from streaming state, and — unlike `approx_count_distinct`'s
  * engine-private HLL++ — replays bit-for-bit in ANY engine that can
  * render md5 hex and a minimal binary string (the DuckDB oracle
  * recomputes every register and the whole estimate).
  *
  * Scale shape: the builder is one corpus scan into a ≤m-group hash
  * aggregate — map-side combine collapses each partition to ≤m rows
  * before the (tiny) shuffle, so a 1000-executor run moves KBs. The
  * certificate entry additionally prices the EXACT distinct count
  * (value-grain shuffle) to report the sketch's realized error; real
  * 100 TB use calls [[hllRegisters]]/[[hllEstimate]] and skips it. */
object Sketches {

  /** Register index and rank for one hashed value: bucket = 12-bit hex
    * prefix mod m (uniform while m divides 4096, i.e. b ≤ 12); rank =
    * leading zeros in the NEXT 60 hash bits + 1 ∈ [1, 61] (via the
    * minimal binary rendering both engines share: bitlen = length(bin x),
    * rank = 61 − bitlen, x = 0 ⇒ 61). */
  private[ops] def bucketCol(h: Column, m: Int): Column =
    (conv(substring(h, 1, 3), 16, 10).cast("int") % m).as("bucket")

  private[ops] def rhoCol(h: Column): Column = {
    val x = conv(substring(h, 4, 15), 16, 10).cast("long")
    when(x === 0L, 61).otherwise(lit(61) - length(bin(x))).cast("int").as("rho")
  }

  private def hash(value: Column, seed: String): Column =
    md5(concat(lit(seed), value.cast("string")))

  private def requireB(b: Int): Int = {
    require(b >= 4 && b <= 12, s"HLL precision b must be in [4, 12], got $b")
    1 << b
  }

  /** The sketch builder — the 100 TB path: one scan, per-partition
    * combine to ≤m register rows, one tiny shuffle. Output (bucket, m_j)
    * is the mergeable state: union two register frames and re-max to
    * merge sketches (see [[hllMerge]]); maintain it from a stream the
    * same way. */
  def hllRegisters(df: DataFrame, value: Column, b: Int = 9,
                   seed: String = "hll:"): DataFrame = {
    val m = requireB(b)
    val h = hash(value, seed)
    df.filter(value.isNotNull)
      .select(bucketCol(h, m), rhoCol(h))
      .groupBy("bucket").agg(max("rho").as("m_j"))
  }

  /** Sketch union: registers merge by plain max — the property that makes
    * HLL shardable across days/sources/executors with zero error added. */
  def hllMerge(regsA: DataFrame, regsB: DataFrame): DataFrame =
    regsA.unionByName(regsB).groupBy("bucket").agg(max("m_j").as("m_j"))

  /** Estimate from a (bucket, m_j) register frame (≤m rows). The raw
    * harmonic-mean estimate keeps the indicator sum EXACT: each register
    * contributes the integer 2^(63−m_j) (absent registers contribute
    * 2^63), summed in decimal(38,0) — no float accumulation — with ONE
    * final double division; the small-range (linear counting) correction
    * applies below 2.5m when empty registers remain, exactly as
    * published. Every double op mirrors the oracle literally. */
  def hllEstimate(regs: DataFrame, b: Int = 9): DataFrame = {
    val m = requireB(b)
    estimateCore(regs.agg(
      count(lit(1)).as("n_present"),
      sum(expr("shiftleft(CAST(1 AS BIGINT), 63 - m_j)").cast(DecimalType(38, 0)))
        .as("sum_present")), m)
      .select("m_registers", "n_present", "est_hll")
  }

  /** The oracle-checked certificate: sketch AND exact distinct count from
    * one linear plan (value-grain pre-aggregate → register aggregate →
    * single-row estimate), reporting the realized relative error next to
    * the estimate. This is the expensive form — the exact count is the
    * thing the sketch exists to avoid — run at audit time, not per-batch. */
  def hllCertificate(df: DataFrame, value: Column, b: Int = 9,
                     seed: String = "hll:"): DataFrame =
    hllCertificateBy(df, Seq.empty, value, b, seed)

  /** Per-key registers — "distinct users per event type" in ONE pass:
    * the register table gains the key columns and stays ≤ m rows PER KEY,
    * still max-mergeable shard-by-shard. This is what a sketch-as-relation
    * buys over an opaque blob: GROUP BY composes with it. */
  def hllRegistersBy(df: DataFrame, keys: Seq[String], value: Column,
                     b: Int = 9, seed: String = "hll:"): DataFrame = {
    val m = requireB(b)
    val h = hash(value, seed)
    df.filter(value.isNotNull)
      .select(keys.map(col) :+ bucketCol(h, m) :+ rhoCol(h): _*)
      .groupBy((keys :+ "bucket").map(col): _*).agg(max("rho").as("m_j"))
  }

  /** Per-key certificate: estimate + exact + realized error, one row per
    * key, one linear plan (the [[hllCertificate]] shape with the key
    * threaded through every grain). */
  def hllCertificateBy(df: DataFrame, keys: Seq[String], value: Column,
                       b: Int = 9, seed: String = "hll:"): DataFrame = {
    val m = requireB(b)
    val h = hash(col("v"), seed)
    val kc = keys.map(col)
    val regs = df.filter(value.isNotNull)
      .select(kc :+ value.as("v"): _*)
      .groupBy(kc :+ col("v"): _*).agg(count(lit(1)).as("n_occ"))
      .select(kc :+ bucketCol(h, m) :+ rhoCol(h): _*)
      .groupBy(kc :+ col("bucket"): _*)
      .agg(max("rho").as("m_j"), count(lit(1)).as("n_vals"))
    val agg1 = regs.groupBy(kc: _*).agg(
      count(lit(1)).as("n_present"),
      sum(expr("shiftleft(CAST(1 AS BIGINT), 63 - m_j)").cast(DecimalType(38, 0)))
        .as("sum_present"),
      sum("n_vals").as("n_exact"))
    estimateCore(agg1, m, keys)
      .select(kc ++ Seq(col("m_registers"), col("n_exact"), col("n_present"),
        col("est_hll"),
        when(col("n_exact") > 0L,
          (col("est_hll") - col("n_exact").cast("double")) /
            col("n_exact").cast("double")).as("rel_err")): _*)
  }

  /** Set-overlap certificate by inclusion–exclusion over THREE register
    * sets (A, B, A∪B) — the audience-overlap question ("how many users
    * did both?") answered from sketches alone: est(A∩B) = est(A) +
    * est(B) − est(A∪B), since HLL unions are exact register maxes. One
    * value-grain pass builds per-value membership flags (scope-cached);
    * a role explode derives all three register sets from it, and the
    * exact flag sums sit beside the estimates. The overlap estimate is
    * a DIFFERENCE of estimates, so its relative error is amplified when
    * |A∩B| ≪ |A∪B| — the certificate exists to measure exactly that. */
  def hllOverlapCertificate(df: DataFrame, key: Column, value: Column,
                            keyA: String, keyB: String, b: Int = 9,
                            seed: String = "hll:"): DataFrame = {
    val m = requireB(b)
    val perValue = df
      .filter(value.isNotNull && (key === keyA || key === keyB))
      .select(value.as("v"),
        when(key === keyA, 1L).otherwise(0L).as("fa"),
        when(key === keyB, 1L).otherwise(0L).as("fb"))
      .groupBy("v").agg(max("fa").as("fa"), max("fb").as("fb"))
    Dedup.withScopedCache(perValue) { pu =>
      val h = hash(col("v"), seed)
      val regs = pu
        .select(col("v"), explode(array(
          when(col("fa") === 1L, "a"), when(col("fb") === 1L, "b"),
          lit("u"))).as("role"))
        .filter(col("role").isNotNull)
        .select(col("role"), bucketCol(h, m), rhoCol(h))
        .groupBy("role", "bucket").agg(max("rho").as("m_j"))
      val ests = estimateCore(regs.groupBy("role").agg(
        count(lit(1)).as("n_present"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 63 - m_j)").cast(DecimalType(38, 0)))
          .as("sum_present")), m, Seq("role"))
        .agg(
          max(when(col("role") === "a", col("est_hll"))).as("est_a"),
          max(when(col("role") === "b", col("est_hll"))).as("est_b"),
          max(when(col("role") === "u", col("est_hll"))).as("est_union"))
      val exact = pu.agg(
        sum("fa").as("n_a_exact"), sum("fb").as("n_b_exact"),
        sum(col("fa") * col("fb")).as("n_overlap_exact"))
      exact.crossJoin(ests)
        .select(col("n_a_exact"), col("n_b_exact"), col("n_overlap_exact"),
          col("est_a"), col("est_b"), col("est_union"),
          (col("est_a") + col("est_b") - col("est_union")).as("est_overlap"),
          when(col("n_overlap_exact") > 0L,
            (col("est_a") + col("est_b") - col("est_union") -
              col("n_overlap_exact").cast("double")) /
              col("n_overlap_exact").cast("double")).as("rel_err_overlap"))
    }
  }

  // ---------------------------------------------------------------------
  // Count-min sketch (Cormode/Muthukrishnan 2005) — the frequency sibling
  // of the HLL: d=4 salted md5 rows × w=1024 columns of EXACT counted
  // cells, so point estimates are never under the truth (min over rows ≥
  // true count, overcount bounded by 2N/w per row in expectation). Cells
  // merge by plain SUM — shard/stream union is lossless, the same
  // monoid discipline as the HLL's max and the BPE vocab's add.
  // ---------------------------------------------------------------------

  private val cmsDepth = 4
  private val cmsWidth = 1024

  private def cmsCol(i: Int, token: Column): Column =
    (conv(substring(md5(concat(lit(s"cms:$i:"), token)), 1, 3), 16, 10)
      .cast("int") % cmsWidth).as("col")

  /** Sketch cells from a (w, cnt) token-count frame: ≤ d·w = 4096 rows.
    * The explode is per-VOCAB-row (d structs each), not per-corpus-row —
    * the corpus was already collapsed by the counts aggregate. */
  def cmsCells(counts: DataFrame): DataFrame = {
    val rows = (0 until cmsDepth).map { i =>
      struct(lit(i).as("row"), cmsCol(i, col("w")).as("col"))
    }
    counts
      .select(explode(array(rows: _*)).as("rc"), col("cnt"))
      .groupBy(col("rc.row").as("row"), col("rc.col").as("col"))
      .agg(sum("cnt").as("cell"))
  }

  /** Sketch union: cells merge by sum (counts are a monoid). */
  def cmsMerge(cellsA: DataFrame, cellsB: DataFrame): DataFrame =
    cellsA.unionByName(cellsB).groupBy("row", "col").agg(sum("cell").as("cell"))

  /** Point estimates for a frame of probe tokens (column `w`): min over
    * the d probed cells. The cells side is ≤4096 rows — broadcast, so a
    * million-token probe frame runs join-local with zero shuffle. */
  def cmsEstimate(cells: DataFrame, probes: DataFrame): DataFrame = {
    val rows = (0 until cmsDepth).map { i =>
      struct(lit(i).as("row"), cmsCol(i, col("w")).as("col"))
    }
    probes
      .select(col("w"), explode(array(rows: _*)).as("rc"))
      .select(col("w"), col("rc.row").as("row"), col("rc.col").as("col"))
      .join(broadcast(cells), Seq("row", "col"))
      .groupBy("w").agg(min("cell").as("est_cms"))
  }

  /** The oracle-checked certificate: exact top-k token counts next to
    * their sketch estimates, overcount on display. ONE corpus scan — the
    * token-count frame is scope-cached (the dedup postings pattern) and
    * feeds both the 4096-cell sketch and the exact top-k head. */
  def cmsCertificate(docs: DataFrame, k: Int = 20): DataFrame = {
    val counts = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    Dedup.withScopedCache(counts) { c =>
      val top = c.orderBy(col("cnt").desc, col("w")).limit(k)
        .select(col("w"), col("cnt").as("n_exact"))
      cmsEstimate(cmsCells(c), top.select("w"))
        .join(broadcast(top), Seq("w"))
        .select(col("w").as("token"), col("n_exact"), col("est_cms"),
          (col("est_cms") - col("n_exact")).as("overcount"))
    }
  }

  // ---------------------------------------------------------------------
  // Bloom filter (Bloom 1970) — the membership sibling: k=4 positions
  // sliced from ONE md5 (4 hex chars each, 16 bits mod m=32768 — uniform
  // since 65536 = 2·32768) into a ≤m-row set-bit table. The table is a
  // DataFrame like the other sketches: bits merge by plain DISTINCT
  // union, persist as parquet, and broadcast for probe joins. Use: the
  // incremental-dedup pre-filter — probe a new batch against the corpus
  // Bloom before paying the exact anti-join; no member ever slips
  // through (no false negatives, structurally), only an FPR-bounded
  // slice of non-members pays the exact check.
  // ---------------------------------------------------------------------

  private val bloomM = 32768
  private val bloomK = 4

  private def bloomPositionArray(value: Column, seed: String): Column = {
    val h = md5(concat(lit(seed), value.cast("string")))
    array((0 until bloomK).map { i =>
      conv(substring(h, 1 + 4 * i, 4), 16, 10).cast("int") % bloomM
    }: _*)
  }

  /** The set-bit table of a value column: ≤m rows, one scan, map-side
    * distinct combine. */
  def bloomBits(df: DataFrame, value: Column, seed: String = "bloom:"): DataFrame =
    df.filter(value.isNotNull)
      .select(explode(bloomPositionArray(value, seed)).as("pos"))
      .distinct()

  /** Per-probe verdict: bloom_hit ⇔ all k positions are set. The bits
    * side is ≤m rows — broadcast; the count-of-matches==k form needs no
    * bitmap type and no UDF. */
  def bloomProbe(bits: DataFrame, probes: DataFrame, value: Column,
                 seed: String = "bloom:"): DataFrame =
    probes.filter(value.isNotNull)
      .select(value.as("v")).distinct()
      .select(col("v"), explode(bloomPositionArray(col("v"), seed)).as("pos"))
      .join(broadcast(bits.withColumnRenamed("pos", "bpos")),
        col("pos") === col("bpos"), "left")
      .groupBy("v")
      .agg((count(col("bpos")) === bloomK).as("bloom_hit"))

  /** The oracle-checked certificate: probe one corpus slice against the
    * other slice's Bloom and reconcile with EXACT membership — zero
    * false negatives is structural (asserted by the oracle: every member
    * is a hit), and the measured false-positive rate sits next to it. */
  def bloomCertificate(corpus: DataFrame, probes: DataFrame,
                       value: Column, seed: String = "bloom:"): DataFrame =
    Dedup.withScopedCache(
      corpus.filter(value.isNotNull).select(value.as("v")).distinct()) { cv =>
      bloomCertificateFromCorpus(cv, probes, value, seed)
    }

  private def bloomCertificateFromCorpus(cv: DataFrame, probes: DataFrame,
                                         value: Column, seed: String): DataFrame = {
    val bits = cv.select(explode(bloomPositionArray(col("v"), seed)).as("pos"))
      .distinct()
    val members = cv.withColumn("is_member", lit(1L))
    bloomProbe(bits, probes, value, seed)
      .join(members, Seq("v"), "left")
      .agg(
        count(lit(1)).as("n_probes"),
        sum(coalesce(col("is_member"), lit(0L))).as("n_members"),
        sum(when(col("bloom_hit"), 1L).otherwise(0L)).as("n_bloom_hits"),
        sum(when(col("bloom_hit") && col("is_member").isNull, 1L).otherwise(0L))
          .as("n_false_pos"),
        sum(when(!col("bloom_hit") && col("is_member").isNotNull, 1L).otherwise(0L))
          .as("n_false_neg"))
      .select(col("n_probes"), col("n_members"), col("n_bloom_hits"),
        col("n_false_pos"), col("n_false_neg"),
        when(col("n_probes") - col("n_members") > 0L,
          col("n_false_pos").cast("double") /
            (col("n_probes") - col("n_members")).cast("double"))
          .as("fpr_measured"))
  }

  /** Shared final-select: alpha_m·m²·2^63 / Σ 2^(63−M_j) with the
    * linear-counting branch. All literals combine left-associatively in
    * the exact order the oracle writes them. */
  private def estimateCore(agg1: DataFrame, m: Int,
                           keys: Seq[String] = Seq.empty): DataFrame = {
    val md = m.toDouble
    val two63 = lit(9.223372036854775808e18)
    val withExact = agg1.columns.contains("n_exact")
    val kc = keys.map(col)
    val base = agg1.select(
      (kc ++ Seq(
        lit(m).as("m_registers"),
        col("n_present").cast("long").as("n_present"),
        (coalesce(col("sum_present"), lit(0).cast(DecimalType(38, 0))) +
          (lit(m) - col("n_present")).cast(DecimalType(38, 0)) *
            lit(BigDecimal(2).pow(63)).cast(DecimalType(38, 0))).as("sum_scaled")) ++
        (if (withExact) Seq(coalesce(col("n_exact"), lit(0L)).cast("long").as("n_exact"))
         else Seq.empty)): _*)
    base.select(
      (kc ++ Seq(
        col("m_registers"), col("n_present"),
        (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(md)) * lit(md * md) *
          two63 / col("sum_scaled").cast("double")).as("est_raw"),
        (lit(m).cast("long") - col("n_present")).as("v_zero")) ++
        (if (withExact) Seq(col("n_exact")) else Seq.empty)): _*)
      .withColumn("est_hll",
        when(col("est_raw") <= lit(2.5) * lit(md) && col("v_zero") > 0L,
          lit(md) * log(lit(md) / col("v_zero").cast("double")))
          .otherwise(col("est_raw")))
  }
}
