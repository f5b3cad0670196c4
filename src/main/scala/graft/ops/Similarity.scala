package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Similarity search over `embeddings` (vec_id, embedding float[64],
  * label). Two paths:
  *
  *  - topKBrute: a bounded query set against the full corpus — each query
  *    is a linear scan (the exact baseline every ANN variant is judged
  *    against). The query side is tiny and broadcast, so the "cross" join
  *    is a broadcast nested loop over one pass of the corpus: at 100 TB
  *    this is the plan you'd run for a handful of ad-hoc queries.
  *  - topKIvf: IVF-style ANN — deterministic centroid set, vectors
  *    partitioned into cells by nearest centroid, queries probe only the
  *    nprobe nearest cells. Candidate generation is an equi-join on
  *    cell id; corpus-side work drops by ~#cells/nprobe. This is the
  *    scale path for query sets that are themselves large.
  *
  * Cosine arithmetic intentionally mirrors DuckDB's
  * list_cosine_similarity bit-for-bit (sequential double sums,
  * dot/(sqrt(na)*sqrt(nb))) so results are oracle-exact.
  */
object Similarity {

  /** float[] → double[] (exact widening). */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential-sum cosine, DuckDB-identical. The dot products use the
    * codegen'd native expression (graft.functions.DotProduct) — same
    * arithmetic as `aggregate(zip_with(...))`, compiled instead of
    * interpreted. */
  def cosine(a: Column, b: Column): Column =
    VectorFunctions.dot(a, b) / (sqrt(VectorFunctions.dot(a, a)) * sqrt(VectorFunctions.dot(b, b)))

  /** sqrt of the self-dot — precompute once per vector; feeding it into
    * cosinePrenormed gives bit-identical results to cosine() at a third of
    * the per-pair work. */
  def norm(v: Column): Column = VectorFunctions.l2Norm(v)

  def cosinePrenormed(a: Column, b: Column, normA: Column, normB: Column): Column =
    VectorFunctions.dot(a, b) / (normA * normB)

  /** Exact top-k neighbours for queries `vec_id < numQueries`. */
  def topKBrute(embeddings: DataFrame, k: Int = 5, numQueries: Int = 10): DataFrame = {
    val queries = broadcast(
      embeddings.filter(col("vec_id") < numQueries)
        .select(col("vec_id").as("query_id"), toDouble(col("embedding")).as("qv"))
        .withColumn("qn", norm(col("qv"))))
    val corpus = embeddings
      .select(col("vec_id").as("neighbor_id"), toDouble(col("embedding")).as("nv"))
      .withColumn("nn", norm(col("nv")))
    val scored = queries.join(corpus, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePrenormed(col("qv"), col("nv"), col("qn"), col("nn")).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Hybrid dense+sparse retrieval by reciprocal-rank fusion (Cormack,
    * Clarke & Buettcher 2009) — the production shape that fuses a BM25
    * lexical arm with a dense-embedding arm instead of shipping either
    * alone: rrf(d) = Σ_arms floor(10^6 / (rrfK + rank_arm(d))), summed
    * over the arms that retrieved d within `depth`. Queries are the
    * doc-as-query probes both arms already use (doc_id/vec_id <
    * `numQueries` — the documents and embeddings tables share the id
    * space), and the fused list keeps each query's top `k` by (score
    * desc, neighbor id).
    *
    * Exact-integer on purpose: the classic 1/(60+r) is replaced by the
    * floor-scaled 10^6 DIV (rrfK + r) — order-identical for any two
    * single-arm ranks (the map r ↦ 10^6 DIV (60+r) is strictly
    * decreasing for the rank range any depth here reaches) and exactly
    * summable, so the fusion replays bit-for-bit in any engine with
    * integer division; no float accumulation order, ties by neighbor id.
    *
    * 100 TB shape: each arm is already bounded (BM25 = df-capped
    * inverted-index joins; dense = broadcast query block), and the
    * fusion itself is ONE equi-join of two ≤ numQueries·depth-row rank
    * frames plus one window — never doc×doc. A doc retrieved by only
    * one arm keeps that arm's contribution (full outer join, missing
    * arm contributes 0), which is the standard RRF treatment. */
  def hybridTopK(docs: DataFrame, embeddings: DataFrame, k: Int = 5,
                 depth: Int = 10, numQueries: Int = 5,
                 rrfK: Int = 60): DataFrame = {
    require(k >= 1 && depth >= 1,
      s"hybridTopK: k=$k and depth=$depth must be >= 1")
    // the floor-scaled map r ↦ 10^6 DIV (rrfK + r) is strictly decreasing
    // only while (rrfK + r)^2 <= 10^6 — past rank 1000 - rrfK adjacent
    // ranks collide and ties would silently fall to neighbor-id order, so
    // the documented order-identical property is ENFORCED, not just true
    // at the default depth
    require(depth + rrfK <= 1000,
      s"hybridTopK: depth + rrfK = ${depth + rrfK} > 1000 breaks the " +
        "floor-scaled RRF's order-preserving property (10^6 DIV x " +
        "collides once x^2 > 10^6)")
    val lex = Dedup.bm25TopK(docs, k = depth, numQueries = numQueries)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("lex_rank"))
    val dense = topKBrute(embeddings, k = depth, numQueries = numQueries)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("dense_rank"))
    fuseRanks(lex, dense, rrfK).filter(col("rank") <= k)
  }

  /** The fusion core of [[hybridTopK]], split out so [[mrrAudit]] (and
    * any spec planting complementary arms) can fuse prebuilt rank
    * frames without re-running either arm: full-outer equi-join on the
    * pair key, floor-scaled RRF sum, one rank window. Inputs are
    * (query_id, neighbor_id, lex_rank) / (query_id, neighbor_id,
    * dense_rank) frames already bounded to their retrieval depth. */
  private[graft] def fuseRanks(lex: DataFrame, dense: DataFrame,
                               rrfK: Int = 60): DataFrame = {
    val fused = lex.join(dense, Seq("query_id", "neighbor_id"), "full_outer")
      .select(col("query_id"), col("neighbor_id"), col("lex_rank"),
        col("dense_rank"),
        (coalesce(expr(s"1000000L DIV ($rrfK + lex_rank)"), lit(0L)) +
          coalesce(expr(s"1000000L DIV ($rrfK + dense_rank)"), lit(0L)))
          .as("rrf"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("neighbor_id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .select("query_id", "rank", "neighbor_id", "rrf", "lex_rank",
        "dense_rank")
  }

  /** MRR@k audit of the hybrid retrieval stack — the graded
    * ranking-quality metric [[recallAudit]] does not provide (recall@k
    * is position-blind; a serving list that buries every true neighbor
    * at rank k scores the same as one that leads with them). Truth is
    * brute-force cosine top-k over the bounded query sample; each of
    * the three serving lists — the BM25 lexical arm @k, the dense arm
    * @k, and the RRF fusion @k — is scored by the rank of its FIRST
    * true neighbor: rr_scaled = 10^6 DIV first_rank (0 when no true
    * neighbor appears within k), the same exact-integer discipline as
    * the fusion itself, so the whole audit replays bit-for-bit in any
    * engine with integer division (MRR itself = mean of rr_scaled/10^6,
    * one division the consumer owns). The dense arm IS brute force
    * here, so its row always reads first_rank 1 — the audit's built-in
    * calibration line; swap an ANN serving frame into the dense slot
    * via [[mrrFromRanks]] and the same machinery measures its
    * degradation, and a spec plants complementary arms against an
    * INDEPENDENT truth to pin the fusion-beats-both-arms property the
    * RRF construction exists for.
    *
    * 100 TB shape: the brute pass over the bounded query sample is the
    * audit's price (shared shape with [[recallAudit]]); every join
    * after it runs on ≤ numQueries·depth rows. */
  def mrrAudit(docs: DataFrame, embeddings: DataFrame, k: Int = 5,
               depth: Int = 10, numQueries: Int = 5,
               rrfK: Int = 60): DataFrame = {
    require(k >= 1 && depth >= k,
      s"mrrAudit: need 1 <= k=$k <= depth=$depth")
    // each arm is consumed several times downstream (fusion, per-arm
    // first-hit, truth, query totality): materialize the ≤ nq·depth-row
    // rank frames ONCE so the corpus-scale passes behind them (the BM25
    // inverted index and the brute cosine scan) run once, not once per
    // consumer — without the checkpoint the dense arm re-ran its brute
    // pass 6× per audit (fusion + 3 truth joins + first-hit + totality;
    // measured 6.58 → 3.14 s at sf0.1). Eager + tiny: ≤ 50 rows here.
    val lex = Dedup.bm25TopK(docs, k = depth, numQueries = numQueries)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("lex_rank"))
      .localCheckpoint()
    val dense = topKBrute(embeddings, k = depth, numQueries = numQueries)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("dense_rank"))
      .localCheckpoint()
    val truth = dense.filter(col("dense_rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    mrrFromRanks(lex, dense, truth, k, rrfK)
  }

  /** The generic half of [[mrrAudit]]: score prebuilt lexical/dense
    * rank frames and their fusion against an EXPLICIT truth set.
    * Queries are taken from the union of both arms, so an arm that
    * retrieved nothing for a query still yields that query's row
    * (all-miss rows read 0, never disappear). */
  def mrrFromRanks(lex: DataFrame, dense: DataFrame, truth: DataFrame,
                   k: Int = 5, rrfK: Int = 60): DataFrame = {
    val fused = fuseRanks(lex, dense, rrfK)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
    val t = truth.select("query_id", "neighbor_id")
    def firstHit(arm: DataFrame, rankCol: String, out: String): DataFrame =
      arm.filter(col(rankCol) <= k)
        .join(t, Seq("query_id", "neighbor_id"))
        .groupBy("query_id")
        .agg(min(col(rankCol)).cast("long").as(out))
    val queries = lex.select("query_id")
      .unionByName(dense.select("query_id")).distinct()
    def rr(fr: String): Column =
      when(col(fr).isNull, 0L).otherwise(expr(s"1000000L DIV $fr"))
    queries
      .join(firstHit(lex, "lex_rank", "lex_first_rank"), Seq("query_id"), "left")
      .join(firstHit(dense, "dense_rank", "dense_first_rank"), Seq("query_id"), "left")
      .join(firstHit(fused, "rank", "fused_first_rank"), Seq("query_id"), "left")
      .select(col("query_id"),
        col("lex_first_rank"), rr("lex_first_rank").as("lex_rr"),
        col("dense_first_rank"), rr("dense_first_rank").as("dense_rr"),
        col("fused_first_rank"), rr("fused_first_rank").as("fused_rr"))
  }

  /** Greedy k-center (farthest-first) diversity selection — the
    * coverage-maximizing subset picker a curation pass runs when it wants
    * k exemplars spanning the embedding space rather than k random draws
    * (random sampling over-picks dense regions; farthest-first is the
    * classic 2-approximation to the k-center objective, Gonzalez 1985).
    * Deterministic end to end: the seed is the MIN vec_id; each round
    * adds the point whose max-cosine-to-any-selected-center is SMALLEST
    * (the least-covered point), ties broken by smaller vec_id. Output:
    * (rank, vec_id, nearest_cos) — the selection order with each pick's
    * coverage at selection time (the seed's nearest_cos is null).
    *
    * 100 TB shape: the selected set is ≤k driver-side rows (the
    * trainCentroids pattern); each round is ONE map over the corpus —
    * update mc := greatest(mc, cos(v, newCenter)) against a single
    * broadcast center — plus one argmin aggregate; iterates are
    * localCheckpoint'ed so the plan stays one-round deep. k bounded at
    * 64: this is an exemplar picker, not a sampler (use qualityThin /
    * stratifiedSample for volume).
    *
    * Engine-portable exactly: per-row cosine is the sequential-sum
    * kernel both engines share, max over selected is order-insensitive,
    * and the argmin compares raw doubles with the (mc, vec_id) tie rule
    * — so the DuckDB oracle can unroll the same k rounds and hash-match
    * the frame bit-for-bit. */
  def kCenterSelect(embeddings: DataFrame, k: Int = 8): DataFrame = {
    require(k >= 1 && k <= 64, s"kCenterSelect: k=$k out of [1, 64]")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val corpus = embeddings.select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val seedRow = corpus.orderBy("vec_id").limit(1)
      .collect().headOption.getOrElse(
        throw new IllegalArgumentException("kCenterSelect: empty corpus"))
    var selected = Seq[(Int, Long, Option[Double])]((1, seedRow.getLong(0), None))
    var centerVec: Seq[Double] = seedRow.getSeq[Double](1)
    // running coverage: per remaining vector, max cosine to any selected
    // center so far (exact: max of the same per-row doubles in any order)
    var state = corpus
      .filter(col("vec_id") =!= seedRow.getLong(0))
      .select(col("vec_id"), col("v"),
        cosine(col("v"), typedLit(centerVec)).as("mc"))
      .localCheckpoint(false)
    var rank = 2
    var exhausted = false
    while (rank <= k && !exhausted) {
      // one argmin job per round; an empty result means the corpus ran
      // out before k — stop, don't re-count per round
      val picks = state.orderBy(col("mc").asc, col("vec_id").asc).limit(1).collect()
      if (picks.isEmpty) exhausted = true
      else {
        val pick = picks.head
        val pid = pick.getLong(0)
        centerVec = pick.getSeq[Double](1)
        selected :+= ((rank, pid, Some(pick.getDouble(2))))
        state = state
          .filter(col("vec_id") =!= pid)
          .select(col("vec_id"), col("v"),
            greatest(col("mc"), cosine(col("v"), typedLit(centerVec))).as("mc"))
          .localCheckpoint(false)
        rank += 1
      }
    }
    selected.toDF("rank", "vec_id", "nearest_cos")
      .select(col("rank").cast("int").as("rank"), col("vec_id"),
        col("nearest_cos"))
  }

  /** Coverage assignment over the [[kCenterSelect]] exemplars: every
    * corpus vector maps to its most-similar exemplar (ties by smaller
    * exemplar id), rolled up to the per-exemplar stratum census —
    * n_assigned and the micro-quantized-exact mean cosine. This is what
    * the selection is FOR: the strata a curation pass samples from, and
    * the coverage report that says whether k exemplars actually span the
    * space (a stratum with low mean_cos is under-covered — raise k).
    * One corpus pass against the ≤k broadcast exemplar frame, one
    * aggregate; the cross join is the bounded-broadcast exception. */
  def kCenterAssign(embeddings: DataFrame, k: Int = 8): DataFrame =
    kCenterAssignRows(embeddings, k)
      .groupBy("rank", "center_id")
      .agg(count(lit(1)).as("n_assigned"),
        sum(floor(col("c") * 1000000.0).cast("long")).as("sum_cos_micro"))
      .withColumn("mean_cos",
        col("sum_cos_micro").cast("double") / 1000000.0 / col("n_assigned"))

  /** Per-row nearest-exemplar assignment — the shared first stage of
    * [[kCenterAssign]]'s census and [[semanticDedup]]'s cells: every
    * vector against the ≤k broadcast exemplars, winner by (cosine desc,
    * center id). Carries the double vector `v` so a consumer can score
    * within-cell pairs without re-reading the corpus. */
  def kCenterAssignRows(embeddings: DataFrame, k: Int = 8): DataFrame = {
    val centers = kCenterSelect(embeddings, k)
      .select(col("rank"), col("vec_id").as("center_id"))
      .join(embeddings.select(col("vec_id").as("center_id"),
        toDouble(col("embedding")).as("cv")), "center_id")
    embeddings.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .crossJoin(broadcast(centers))
      .select(col("vec_id"), col("v"), col("rank"), col("center_id"),
        cosine(col("v"), col("cv")).as("c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("c").desc, col("center_id"))))
      .filter(col("rn") === 1)
      .select("vec_id", "v", "rank", "center_id", "c")
  }

  /** The SemDeDup pair stage (Abbas et al. 2023, "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication"):
    * vectors are assigned to k-center cells, and only WITHIN-CELL pairs
    * are cosine-scored — the cells bound the pair stage exactly the way
    * LSH bands do for the lexical family (pairs per cell ≈ (N/k)²,
    * never N²; production runs raise k with the corpus so cells stay
    * bounded — k is small here because the oracle unrolls the k-center
    * selection as k CTE rounds). Emits every within-cell pair at or
    * above `threshold`: (center_id, id1, id2, cos), id1 < id2.
    *
    * Cross-cell near-duplicates are invisible by construction — the
    * documented SemDeDup approximation (a pair split across cells is
    * not scored). Deterministic: the assignment, the pair set, and the
    * cosines all replay bit-for-bit in DuckDB (the sim_topk_kcenter
    * precedent), so the pair frame is hash-checkable end to end. */
  def semanticDedupPairs(embeddings: DataFrame, threshold: Double = 0.9,
                         k: Int = 8): DataFrame =
    Dedup.withScopedCache(
      kCenterAssignRows(embeddings, k).select("vec_id", "center_id", "v"))(
      semanticDedupPairsFrom(_, threshold))

  private def semanticDedupPairsFrom(asg: DataFrame,
                                     threshold: Double): DataFrame =
    asg.select(col("center_id"), col("vec_id").as("id1"), col("v").as("v1"))
      .join(asg.select(col("center_id"), col("vec_id").as("id2"),
        col("v").as("v2")), Seq("center_id"))
      .filter(col("id1") < col("id2"))
      .select(col("center_id"), col("id1"), col("id2"),
        cosine(col("v1"), col("v2")).as("cos"))
      .filter(col("cos") >= threshold)

  /** The SemDeDup keeper terminal: a vector is PRUNED iff some
    * smaller-id member of its cell sits at or above `threshold` cosine
    * (keeper = the cell-local min-id representative of each duplicate
    * neighborhood — the deterministic variant of the paper's
    * keep-one-per-group rule). Emits one row per vector: (vec_id,
    * center_id, pruned_by = min such smaller id or null, keep 1/0,
    * max_cos = the strongest above-threshold smaller neighbor or null).
    * The pair frame this derives from is [[semanticDedupPairs]]; its
    * (id1, id2) columns feed Sampling.leakageSafeSplit directly so a
    * train/eval split never separates semantic duplicates. */
  def semanticDedup(embeddings: DataFrame, threshold: Double = 0.9,
                    k: Int = 8): DataFrame =
    Dedup.withScopedCache(
      kCenterAssignRows(embeddings, k).select("vec_id", "center_id", "v")) {
      asg =>
        val pruned = semanticDedupPairsFrom(asg, threshold)
          .groupBy(col("id2").as("vec_id"))
          .agg(min("id1").as("pruned_by"), max("cos").as("max_cos"))
        asg.select("vec_id", "center_id")
          .join(pruned, Seq("vec_id"), "left")
          .select(col("vec_id"), col("center_id"), col("pruned_by"),
            when(col("pruned_by").isNull, 1L).otherwise(0L).as("keep"),
            col("max_cos"))
    }

  /** Incremental SemDeDup — the semantic-dedup terminal's
    * maintenance face (the [[kCenterIndexIncrement]] pattern): a
    * late-arriving batch is assigned per-row against exemplars selected
    * from the STORED corpus only, and each new vector is pruned iff it
    * sits at or above `threshold` cosine to a stored KEPT cellmate or
    * to a smaller-id batch cellmate. Two deliberate rules, both
    * documented: (1) stored PRUNED docs never prune new docs — dedup
    * runs against the corpus AS SERVED, so a newcomer that duplicates
    * only an already-discarded doc is genuinely novel to the kept
    * corpus and survives (spec'd with an on-the-τ-cone fixture);
    * (2) the in-batch rule matches [[semanticDedup]]'s batch terminal
    * (any smaller id, kept or not). Emits only the BATCH rows —
    * (vec_id, center_id, pruned_by, keep, max_cos), the append frame —
    * stored keepers are untouched by construction.
    *
    * Fully replayable: exemplar selection (seed-filtered greedy),
    * both assignments, the stored keeper frame, and every pruning
    * cosine are the shared engine-portable kernels, so the WHOLE
    * increment hash-matches the DuckDB chain
    * (dedup_semantic_increment). Scale shape: assignments are per-row
    * argmax against ≤k broadcast centers; both pair stages stay
    * within-cell. */
  def semanticDedupIncrement(stored: DataFrame, batch: DataFrame,
                             threshold: Double = 0.9,
                             k: Int = 8): DataFrame = {
    val centers = semanticCenters(stored, k)
    Dedup.withScopedCache(assignToCenters(centers)(stored)) { storedAsg =>
      semanticDedupIncrementAgainst(centers,
        semanticKeptOf(storedAsg, threshold), None, batch, threshold)
        .drop("v")
    }
  }

  /** The served-state pieces of [[semanticDedupIncrement]], exposed so
    * the streaming face computes them ONCE from the stored corpus
    * instead of per micro-batch: the broadcast-scale exemplar frame
    * (center_id, cv) and, via [[semanticKeptOf]], the kept-corpus
    * frame the increments prune against. */
  private[graft] def semanticCenters(stored: DataFrame, k: Int): DataFrame =
    // ≤k rows, but the derivation joins the stored corpus and every
    // consumer broadcast-builds it separately (stored + batch
    // assignment) — materialize once so the corpus join runs once
    kCenterSelect(stored, k)
      .select(col("vec_id").as("center_id"))
      .join(stored.select(col("vec_id").as("center_id"),
        toDouble(col("embedding")).as("cv")), "center_id")
      .localCheckpoint()

  /** Per-row argmax assignment against the broadcast ≤k-row center
    * frame — (vec_id, center_id, v). */
  private[graft] def assignToCenters(centers: DataFrame)(df: DataFrame): DataFrame =
    df.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .crossJoin(broadcast(centers))
      .select(col("vec_id"), col("v"), col("center_id"),
        cosine(col("v"), col("cv")).as("c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("c").desc, col("center_id"))))
      .filter(col("rn") === 1)
      .select("vec_id", "center_id", "v")

  /** The stored corpus AS SERVED: assigned rows minus those pruned by a
    * smaller-id cellmate at or above the threshold. */
  private[graft] def semanticKeptOf(storedAsg: DataFrame,
                                    threshold: Double): DataFrame = {
    val storedPruned = storedAsg
      .select(col("center_id"), col("vec_id").as("id1"), col("v").as("v1"))
      .join(storedAsg.select(col("center_id"), col("vec_id").as("id2"),
        col("v").as("v2")), Seq("center_id"))
      .filter(col("id1") < col("id2") &&
        cosine(col("v1"), col("v2")) >= threshold)
      .select(col("id2").as("vec_id")).distinct()
    storedAsg.join(storedPruned, Seq("vec_id"), "left_anti")
  }

  /** The increment core: prune an assigned batch against (1) stored
    * KEPT cellmates, (2) optionally the EARLIER-ARRIVAL rows a
    * streaming run has already decided (any keep status — under
    * monotone id ingest these are exactly the smaller-id batch-mates
    * the batch terminal compares against, so stream ≡ batch; under
    * out-of-order ingest the semantics is earlier-arrival-prunes-later,
    * documented on the sink), and (3) smaller-id same-batch cellmates.
    * Emits the batch rows WITH the assigned vector `v` (the streaming
    * segments need it to serve as future batches' earlier frame; the
    * batch op drops it). */
  private[graft] def semanticDedupIncrementAgainst(
      centers: DataFrame, storedKept: DataFrame, earlier: Option[DataFrame],
      batch: DataFrame, threshold: Double): DataFrame =
    // the assigned batch feeds FIVE subtrees (stored/earlier/in-batch
    // candidate joins — the in-batch self-join twice — plus the final
    // totality join), and each re-ran the assignment window and the
    // batch derivation behind it (20 corpus scans in
    // dedup_semantic_increment's plan; 5 after). Batch-grain, so the
    // scope cache is bounded by the increment itself.
    Dedup.withScopedCache(assignToCenters(centers)(batch)) { batchAsg =>
    val candStored = batchAsg.as("b")
      .join(storedKept.as("s"), col("b.center_id") === col("s.center_id"))
      .select(col("b.vec_id").as("vec_id"), col("s.vec_id").as("cand_id"),
        cosine(col("b.v"), col("s.v")).as("cos"))
    val candEarlier = earlier.map { e =>
      batchAsg.as("b")
        .join(e.select(col("vec_id").as("__eid"), col("center_id"),
          col("v").as("__ev")), Seq("center_id"))
        .select(col("vec_id"), col("__eid").as("cand_id"),
          cosine(col("v"), col("__ev")).as("cos"))
    }
    val candBatch = batchAsg.as("b")
      .join(batchAsg.as("o"), col("b.center_id") === col("o.center_id") &&
        col("o.vec_id") < col("b.vec_id"))
      .select(col("b.vec_id").as("vec_id"), col("o.vec_id").as("cand_id"),
        cosine(col("b.v"), col("o.v")).as("cos"))
    val pruned = candEarlier.foldLeft(candStored.unionByName(candBatch))(_ unionByName _)
      .filter(col("cos") >= threshold)
      .groupBy("vec_id")
      .agg(min("cand_id").as("pruned_by"), max("cos").as("max_cos"))
    batchAsg
      .join(pruned, Seq("vec_id"), "left")
      .select(col("vec_id"), col("center_id"), col("pruned_by"),
        when(col("pruned_by").isNull, 1L).otherwise(0L).as("keep"),
        col("max_cos"), col("v"))
  }

  /** Planted-cluster corpus for certifying IVF recall on CLUSTERED data
    * (the regime IVF is for — `sim_topk_ivf`'s recall story on the
    * near-random synthetic corpus is only nprobe/#cells). Each seed vector
    * (vec_id < seeds) spawns `copies` members: copy j adds 0.002·j to every
    * component. The embeddings are unit-norm with ~0.125-scale components,
    * so the tilt keeps intra-cluster cosines ≥ ~0.997 — far above any
    * random 64-dim background pair (max ~0.4 at tested SFs), so the true
    * top-(copies-1) of each seed are exactly its siblings — yet ≥1e-4
    * clear of DuckDB's ±1 cosine clamp (see dedup_embedding_lsh's 1-ulp
    * note). Seeds keep their id and are the
    * queries; copies and background get disjoint id ranges, and the
    * original seed rows are excluded from the background so no exactly
    * -parallel pair exists. Fully deterministic, so brute-force top-k over
    * the derived corpus is a DuckDB-expressible oracle: IVF achieving
    * recall 1.0 here is a structural property (siblings share the query's
    * cell direction), not luck. */
  def plantedClusterCorpus(embeddings: DataFrame, seeds: Int = 8, copies: Int = 6): DataFrame = {
    val base = embeddings
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val members = base.filter(col("vec_id") < seeds)
      .select(col("vec_id"), explode(sequence(lit(0), lit(copies - 1))).as("j"), col("v"))
      .select(
        when(col("j") === 0, col("vec_id"))
          .otherwise(lit(1000L) + col("vec_id") * copies + col("j")).as("vec_id"),
        transform(col("v"), x => x + lit(0.002) * col("j")).as("embedding"))
    val background = base.filter(col("vec_id") >= seeds)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("v").as("embedding"))
    members.unionByName(background)
  }

  /** k-means centroid training with BOUNDED cardinality and BOUNDED input:
    * exactly min(k, ⌊√N⌋) seeds — never a count that grows with the corpus
    * (the round-5 audit flagged the old stride parameterization as
    * #centroids = N/stride, a driver OOM and a quadratic assign step at
    * 100 TB) — refined by Lloyd iterations over a deterministic hash-drawn
    * sample of at most `maxSample` vectors, so training cost is flat in
    * corpus size: one metadata-cheap count + one filtering scan, then all
    * iteration work on the bounded cached sample. This is the offline
    * training job at 100 TB, runnable as-is.
    *
    * Deterministic end to end: seeds are the kEff sample vectors with the
    * smallest id-hash (a pseudo-random but reproducible draw, spread
    * independently of id layout); the per-dimension mean sums
    * DECIMAL(38,30) (exact, so order-independent across partitionings —
    * the same trick Relational uses for money sums) rather than avg() on
    * doubles, whose partial-merge order varies run to run. Trained
    * centroids, and therefore topKIvf output, are bit-identical across
    * executions. */
  def trainCentroids(embeddings: DataFrame, k: Int = 16, iterations: Int = 3,
                     maxSample: Int = 65536): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val corpus = embeddings.select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val n = corpus.count() // bounds kEff and the sample stride; not cached — one pass
    val kEff = math.max(1L, math.min(k.toLong, math.sqrt(n.toDouble).toLong)).toInt
    val sampleStride = math.max(1L, n / math.max(1, maxSample))
    val sample = (
      if (sampleStride == 1L) corpus
      else corpus.filter(pmod(xxhash64(col("vec_id")), lit(sampleStride)) === 0)
    ).persist()
    sample.count() // eager: the per-iteration collects below must hit the cache
    // centroids are tiny (≤ k rows): materialize them to the driver each
    // iteration so the lineage doesn't nest one full sample scan per
    // iteration (the standard iterative-algorithm pattern)
    var centroids: Seq[(Long, Seq[Double])] = sample
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(kEff)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    (1 to iterations).foreach { _ =>
      val cdf = broadcast(centroids.toDF("centroid_id", "cv"))
      centroids = sample
        .crossJoin(cdf)
        .select(col("vec_id"), col("v"), col("centroid_id"), cosine(col("v"), col("cv")).as("csim"))
        .withColumn("r", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("csim").desc, col("centroid_id"))))
        .filter(col("r") === 1)
        .select(col("centroid_id"), posexplode(col("v")))
        .groupBy(col("centroid_id"), col("pos"))
        // decimal(38,30): 8 integer digits hold any cell's sum of these
        // O(1)-magnitude components; 30 fractional digits fix the rounding
        // point so the sum is exact and merge-order-independent
        .agg((sum(col("col").cast("decimal(38,30)")) / count(lit(1)))
          .cast("double").as("m"))
        .groupBy("centroid_id")
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("cv"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    }
    sample.unpersist()
    centroids.toDF("centroid_id", "cv")
  }

  /** IVF cell assignment: nearest centroid by cosine over the bounded
    * trained centroid set (see trainCentroids). */
  private def assignCells(embeddings: DataFrame, centroids: DataFrame, probe: Int): DataFrame = {
    val scored = embeddings
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .crossJoin(broadcast(centroids)) // centroid side is tiny: nested-loop over one corpus pass
      .select(col("vec_id"), col("v"),
        col("centroid_id"), cosine(col("v"), col("cv")).as("csim"))
    val w = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("centroid_id"))
    scored.withColumn("crank", row_number().over(w)).filter(col("crank") <= probe)
      .select(col("vec_id"), col("v"), col("centroid_id").as("cell"))
  }

  /** Train-once/apply-many seam: persist the (tiny) trained centroid frame
    * as a parquet artifact and reuse it on every later invocation — the
    * shape a real deployment runs, where centroid training is an OFFLINE
    * job and query serving only assigns + probes. First call trains and
    * writes; later calls read the ≤k-row file. Doubles round-trip parquet
    * bit-exactly and training is bit-deterministic (see trainCentroids),
    * so the artifact path produces identical output to self-training —
    * the artifact is a cache, never a semantic fork. Callers own artifact
    * invalidation (retrain on corpus change), as with any offline model
    * artifact. */
  def centroidArtifact(embeddings: DataFrame, path: String, k: Int = 16,
                       iterations: Int = 3, maxSample: Int = 65536): DataFrame =
    Artifacts.parquetArtifact(embeddings.sparkSession, path)(
      trainCentroids(embeddings, k, iterations, maxSample).coalesce(1))

  /** ANN top-k: corpus vectors live in their 1 nearest cell; queries probe
    * their `nprobe` nearest cells; ranking within candidates only.
    * `trainIterations` > 0 runs Lloyd refinement on the seed centroids;
    * either way the centroid set is BOUNDED at min(numCells, ⌊√N⌋) — never
    * proportional to the corpus — so the broadcast stays kilobytes and the
    * assign step stays one linear pass at any scale.
    *
    * `pretrained` supplies an existing (centroid_id, cv) frame — typically
    * [[centroidArtifact]] — and skips training entirely, so repeated query
    * sets amortize the count + Lloyd jobs; None self-trains (the
    * exploratory default).
    *
    * On near-random vectors with no cluster structure (the synthetic
    * corpus), recall is governed by nprobe/#cells — the scanned corpus
    * fraction; on real embedding corpora — which cluster — IVF recall
    * rises sharply with training. The recall lever is nprobe, trading back
    * toward the brute scan. */
  def topKIvf(embeddings: DataFrame, k: Int = 5, numQueries: Int = 10,
              numCells: Int = 16, nprobe: Int = 3,
              trainIterations: Int = 2,
              pretrained: Option[DataFrame] = None): DataFrame = {
    // Bit-deterministic end to end: hash-drawn seeds, decimal-mean Lloyd
    // refinement (see trainCentroids), and tie-broken row_number ranking —
    // two runs produce identical bits (asserted by LlmOpsSpec). The
    // driver's check stays rows-only because ANN internals aren't
    // SQL-expressible, not because output varies.
    val centroids = broadcast(pretrained.getOrElse(
      trainCentroids(embeddings, numCells, iterations = math.max(0, trainIterations))))
    val cells = assignCells(embeddings, centroids, probe = 1)
    val queryCells = assignCells(embeddings.filter(col("vec_id") < numQueries), centroids, probe = nprobe)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("cell"))
    val scored = queryCells
      .withColumn("qn", norm(col("qv")))
      .join(cells.select(col("vec_id").as("neighbor_id"), col("v").as("nv"), col("cell"))
        .withColumn("nn", norm(col("nv"))), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePrenormed(col("qv"), col("nv"), col("qn"), col("nn")).as("cosine"))
    // no dedup needed: each corpus vector lives in exactly one cell and a
    // query's probed cells are distinct, so every pair occurs once —
    // aggregating here would only add a shuffle
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Per-label embedding centroid, long form (label, pos, mean) — the
    * class prototype a curation pass scores against. Components are
    * quantized to exact 1e-6 integers BEFORE summing (floor(e·1e6) — one
    * IEEE multiply + floor, identical in any engine), the sum is exact
    * Long arithmetic, and the mean is derived in pure double ops — so the
    * centroid is bit-deterministic across partitionings, runs, AND engines
    * with no dependence on decimal-cast rounding conventions. (The
    * IVF trainer's decimal(38,30) means are equally deterministic but not
    * oracle-portable; this form is.) Long-safe: |e|·1e6 < 2^43 for any
    * unit-scale embedding, times 2^63-capacity leaves room for 2^20 rows
    * per (label,pos) cell at full magnitude — and 100 TB corpora aggregate
    * per label×dim, far below that. One shuffle on (label, pos). */
  def labelCentroids(embeddings: DataFrame): DataFrame =
    embeddings.select(col("label"), posexplode(toDouble(col("embedding"))))
      .groupBy("label", "pos")
      .agg((sum(floor(col("col") * lit(1000000.0)).cast("long")).cast("double")
        / (lit(1000000.0) * count(lit(1)))).as("mean"))

  /** Label-affinity matrix: pairwise cosine between label centroids — the
    * class-confusion structure a curation pass reads before merging or
    * splitting labels. Engine-portable by construction: cosine is
    * scale-invariant, so instead of the means it uses the UNNORMALIZED
    * integer vectors of quantized component sums (the [[labelCentroids]]
    * quantization), and every dot product is an exact decimal sum of
    * integer products — no cross-row double addition anywhere, the last
    * operations (sqrt, one division, one multiply) are correctly-rounded
    * IEEE on identical inputs in any engine. labels×dim rows shuffle
    * once on pos for the pair join; labels are a dimension, so the
    * matrix is tiny at any corpus scale. */
  def labelAffinity(embeddings: DataFrame): DataFrame = {
    val q = embeddings.select(col("label"), posexplode(toDouble(col("embedding"))))
      .groupBy("label", "pos")
      .agg(sum(floor(col("col") * lit(1000000.0)).cast("long")).as("sq"))
    val a = q.toDF("label_a", "pos", "qa")
    val b = q.toDF("label_b", "pos", "qb")
    val dot = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
      sum((x.cast("decimal(18,0)") * y.cast("decimal(18,0)")))
    a.join(b, Seq("pos")).filter(col("label_a") < col("label_b"))
      .groupBy("label_a", "label_b")
      .agg(dot(col("qa"), col("qb")).as("dab"),
        dot(col("qa"), col("qa")).as("daa"),
        dot(col("qb"), col("qb")).as("dbb"))
      .select(col("label_a"), col("label_b"),
        (col("dab").cast("double")
          / (sqrt(col("daa").cast("double")) * sqrt(col("dbb").cast("double"))))
          .as("affinity"))
  }

  /** Embedding-space outlier scoring: each vector's cosine to its OWN
    * label's centroid, lowest-n returned — the "does this doc belong to
    * its class?" curation filter. The centroid frame is labels×dim rows
    * (bounded — labels are a dimension), broadcast into one corpus pass;
    * global bottom-n is TakeOrdered (per-partition heap, no full sort). */
  /** (label, cv): the per-label prototype vectors assembled wide — the
    * bounded (labels are a dimension) broadcast side of every
    * belongs-to-class pass, batch or streaming. */
  def labelPrototypes(embeddings: DataFrame): DataFrame =
    labelCentroids(embeddings)
      .groupBy("label")
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("mean")))),
        x => x.getField("mean")).as("cv"))

  def centroidOutliers(embeddings: DataFrame, n: Int = 25): DataFrame = {
    val cent = labelPrototypes(embeddings)
    embeddings.select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
      .join(broadcast(cent), "label")
      .select(col("vec_id"), col("label"), cosine(col("v"), col("cv")).as("centroid_sim"))
      .orderBy(col("centroid_sim").asc, col("vec_id")).limit(n)
  }

  /** Per-label centroid drift between two corpus halves — the embedding
    * analogue of the categorical drift check (ops/Expectations
    * .distributionDrift): has a label's mean vector MOVED between
    * yesterday's corpus and today's? Exact by cross-multiplication:
    * the mean difference C_a/n_a − C_b/n_b rescales to the integer
    * vector C_a·n_b − C_b·n_a over quantized component sums, and the
    * reported squared shift Σ_pos(·)² accumulates in decimal(38,0),
    * rendered as the exact decimal string (the PAA 2^64 rule). Compare
    * shifts ACROSS labels after dividing by (n_a·n_b)² downstream —
    * kept raw here so the compared value stays integer-exact. One
    * exploded aggregate + a bounded per-label count join. */
  def centroidDrift(embeddings: DataFrame, isNew: Column): DataFrame = {
    val d = (c: Column) => c.cast("decimal(38,0)")
    val qv = floor(col("col") * lit(1000000.0)).cast("long")
    // empty embeddings are non-members on BOTH branches: the exploded sum
    // branch drops them structurally (no pos rows), so the row-count
    // branch must drop them too or n would count vectors that contributed
    // nothing to C — the serve face (centroidDriftFromPartials) applies
    // the identical rule, keeping serve ≡ batch
    val nonEmpty = embeddings.filter(size(col("embedding")) > 0)
    val sums = nonEmpty
      .select(col("label"), isNew.as("__new"), posexplode(toDouble(col("embedding"))))
      .groupBy("label", "pos")
      .agg(sum(when(!col("__new"), qv).otherwise(0L)).as("ca"),
        sum(when(col("__new"), qv).otherwise(0L)).as("cb"))
    val counts = nonEmpty
      .select(col("label"), isNew.as("__new"))
      .groupBy("label")
      .agg(sum(when(!col("__new"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__new"), 1L).otherwise(0L)).as("n_b"))
    val diff = d(col("ca")) * d(col("n_b")) - d(col("cb")) * d(col("n_a"))
    sums.join(broadcast(counts), "label")
      .groupBy("label")
      .agg(max("n_a").as("n_a"), max("n_b").as("n_b"),
        sum(diff * diff).as("shift_d"))
      .select(col("label"), col("n_a"), col("n_b"),
        col("shift_d").cast("string").as("shift_sq"))
  }

  /** The mergeable half of the centroid state: per-(label, pos)
    * quantized component sums with the member count. Partials merge by
    * plain addition at single-vector grain — micro-batch boundaries
    * cannot sever anything — so the streaming seam
    * (streaming/StreamingMonitors.centroidStateSink) maintains THIS
    * frame. Assumes fixed-dimension embeddings (every vector of a label
    * contributes every pos), which is what makes the per-label member
    * count recoverable as max over pos — and the assumption is ENFORCED,
    * not just documented: empty embeddings are filtered here (they
    * contribute no pos rows, so counting them would skew the recovered
    * n; same rule as [[centroidDrift]]'s batch face), and a RAGGED label
    * (vectors of differing dimension, which makes n vary across pos and
    * max(n) diverge from the row count) raises at serve time in
    * [[centroidDriftFromPartials]] rather than drifting unnoticed. */
  def centroidPartials(embeddings: DataFrame): DataFrame =
    embeddings
      .filter(size(col("embedding")) > 0)
      .select(col("label"), posexplode(toDouble(col("embedding"))))
      .groupBy("label", "pos")
      .agg(sum(floor(col("col") * lit(1000000.0)).cast("long")).as("csum"),
        count(lit(1)).as("n"))

  /** The serve half of [[centroidDrift]] over two partials frames —
    * reference corpus vs live merged state: the same cross-multiplied
    * integer form (C_a·n_b − C_b·n_a per pos, squared-sum in
    * decimal(38,0), exact decimal string out), so live embedding-drift
    * monitoring ("is today's stream drifting from the train corpus?")
    * runs off ONE maintained state table with no re-scan of the stream.
    * Labels present on only one side appear with zero sums/count on the
    * other, matching the batch op's conditional-sum convention. A ragged
    * label — n varying across pos, the signature of mixed-dimension
    * vectors, which [[centroidPartials]]'s fixed-dim member-count
    * recovery cannot represent — RAISES here instead of silently
    * reporting a wrong n. */
  def centroidDriftFromPartials(ref: DataFrame, live: DataFrame): DataFrame = {
    val d = (c: Column) => c.cast("decimal(38,0)")
    val sums = ref.select(col("label"), col("pos"), col("csum").as("ca"))
      .join(live.select(col("label"), col("pos"), col("csum").as("cb")),
        Seq("label", "pos"), "full_outer")
      .select(col("label"), col("pos"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val guardedN = (c: Column, side: String) =>
      when(min(c) =!= max(c), raise_error(concat(
        lit(s"centroidDriftFromPartials: ragged $side partials for label "),
        col("label").cast("string"),
        lit(" — mixed embedding dimensions within a label"))))
        .otherwise(max(c))
    val counts = ref.groupBy("label").agg(guardedN(col("n"), "ref").as("n_a"))
      .join(live.groupBy("label").agg(guardedN(col("n"), "live").as("n_b")),
        Seq("label"), "full_outer")
      .select(col("label"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val diff = d(col("ca")) * d(col("n_b")) - d(col("cb")) * d(col("n_a"))
    sums.join(broadcast(counts), "label")
      .groupBy("label")
      .agg(max("n_a").as("n_a"), max("n_b").as("n_b"),
        sum(diff * diff).as("shift_d"))
      .select(col("label"), col("n_a"), col("n_b"),
        col("shift_d").cast("string").as("shift_sq"))
  }

  /** Per-label cohesion rollup — [[centroidOutliers]] ranks individual
    * strays; this scores each CLASS: the mean and worst member→own-
    * centroid cosine, the label-quality table a curation pass reads
    * before trusting labels as dedup blocks or eval strata (a label
    * with low cohesion is two clusters wearing one name — see
    * labelAffinity for which other label it is confused with). The
    * per-member cosine is the per-row deterministic kernel (portable —
    * both engines accumulate the dot in index order); the cross-row
    * MEAN micro-quantizes each cosine first (the unigram_lp rule), so
    * the compared aggregate is an exact integer sum; min and its
    * argmin are order-insensitive with the (sim, vec_id) tie rule.
    * One broadcast of the bounded prototype frame, one corpus pass. */
  def labelCohesion(embeddings: DataFrame): DataFrame = {
    val cent = labelPrototypes(embeddings)
    embeddings.select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
      .join(broadcast(cent), "label")
      .select(col("label"), col("vec_id"), cosine(col("v"), col("cv")).as("sim"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("sim") * 1000000.0).cast("long")).as("sum_sim_q"),
        min("sim").as("min_sim"),
        min_by(col("vec_id"), struct(col("sim"), col("vec_id"))).as("worst_vec_id"))
      .withColumn("mean_sim",
        col("sum_sim_q").cast("double") / 1000000.0 / col("n"))
      .select("label", "n", "mean_sim", "min_sim", "worst_vec_id")
  }

  // ---- Product quantization ----------------------------------------------

  /** Squared L2 over double arrays via the codegen'd dot kernel:
    * |a−b|² = a·a − 2a·b + b·b (per-row ops, deterministic). */
  private def l2sq(a: Column, b: Column): Column =
    VectorFunctions.dot(a, a) - lit(2.0) * VectorFunctions.dot(a, b) +
      VectorFunctions.dot(b, b)

  /** (vec_id, sub, sv): the M contiguous subvector slices of each vector. */
  private def subSlices(vecs: DataFrame, m: Int, subDim: Int): DataFrame =
    vecs.select(col("vec_id"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col("v"))
      .select(col("vec_id"), col("sub"),
        slice(col("v"), col("sub") * subDim + 1, lit(subDim)).as("sv"))

  /** Nearest codeword per (vec_id, sub): L2 argmin with the
    * (distance, centroid_id) tie rule. The codebook side is m·k rows —
    * always broadcast. */
  private def pqAssign(slices: DataFrame, books: DataFrame): DataFrame =
    slices.join(broadcast(books), "sub")
      .select(col("vec_id"), col("sub"), col("sv"), col("centroid_id"),
        l2sq(col("sv"), col("cv")).as("d"))
      .withColumn("r", row_number().over(
        Window.partitionBy("vec_id", "sub").orderBy(col("d"), col("centroid_id"))))
      .filter(col("r") === 1)
      .select(col("vec_id"), col("sub"), col("centroid_id").as("code"))

  /** Product-quantization codebooks: the vector space splits into `m`
    * contiguous subspaces and each trains an independent k-means codebook
    * (proper L2 — PQ approximates distances, not directions), ALL M
    * trainings riding one exploded frame so an iteration is one job
    * regardless of m. Same determinism contract as [[trainCentroids]]:
    * hash-drawn seeds per subspace, decimal-exact means, bounded sample —
    * codebooks are bit-identical across runs, so
    * [[pqCodebookArtifact]] is a cache, never a semantic fork.
    * Output: (sub, centroid_id, cv) with |cv| = dim/m. */
  def trainPqCodebooks(embeddings: DataFrame, m: Int = 4, kCode: Int = 16,
                       iterations: Int = 3, maxSample: Int = 65536): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val corpus = embeddings.select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val dim = corpus.select(size(col("v"))).head().getInt(0)
    require(m > 0 && dim % m == 0, s"dim $dim not divisible into m=$m subspaces")
    val subDim = dim / m
    val n = corpus.count()
    val kEff = math.max(1L, math.min(kCode.toLong, math.sqrt(n.toDouble).toLong)).toInt
    val stride = math.max(1L, n / math.max(1, maxSample))
    val sample =
      if (stride == 1L) corpus
      else corpus.filter(pmod(xxhash64(col("vec_id")), lit(stride)) === 0)
    val sub = subSlices(sample, m, subDim).persist()
    sub.count() // eager, as in trainCentroids
    var books: Seq[(Int, Long, Seq[Double])] = sub
      .withColumn("r", row_number().over(
        Window.partitionBy("sub").orderBy(xxhash64(col("vec_id")), col("vec_id"))))
      .filter(col("r") <= kEff)
      .select(col("sub"), (col("r") - 1).cast("long").as("centroid_id"), col("sv"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2))).toSeq
    (1 to iterations).foreach { _ =>
      val bdf = books.toDF("sub", "centroid_id", "cv")
      books = subSlicesAssignMeans(sub, bdf)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2))).toSeq
    }
    sub.unpersist()
    books.toDF("sub", "centroid_id", "cv")
  }

  /** One Lloyd step over the exploded slices: L2 argmin assignment, then
    * decimal-exact per-(sub, centroid, pos) means re-assembled to cv. */
  private def subSlicesAssignMeans(sub: DataFrame, books: DataFrame): DataFrame =
    sub.join(broadcast(books), "sub")
      .select(col("vec_id"), col("sub"), col("sv"), col("centroid_id"),
        l2sq(col("sv"), col("cv")).as("d"))
      .withColumn("r", row_number().over(
        Window.partitionBy("vec_id", "sub").orderBy(col("d"), col("centroid_id"))))
      .filter(col("r") === 1)
      .select(col("sub"), col("centroid_id"), posexplode(col("sv")))
      .groupBy(col("sub"), col("centroid_id"), col("pos"))
      .agg((sum(col("col").cast("decimal(38,30)")) / count(lit(1)))
        .cast("double").as("mval"))
      .groupBy("sub", "centroid_id")
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("mval")))),
        x => x.getField("mval")).as("cv"))

  /** Train-once seam for the PQ codebooks (see centroidArtifact — same
    * contract: deterministic training, Hadoop-FS probe, m·k-row file). */
  def pqCodebookArtifact(embeddings: DataFrame, path: String, m: Int = 4,
                         kCode: Int = 16, iterations: Int = 3): DataFrame =
    Artifacts.parquetArtifact(embeddings.sparkSession, path)(
      trainPqCodebooks(embeddings, m, kCode, iterations).coalesce(1))

  /** PQ top-k with asymmetric-distance shortlist + EXACT rerank — the
    * standard serving shape: the corpus is stored as m small integer
    * codes per vector (here 4 codes for 64 dims — a 64× compression of
    * the scan), queries stay exact. Per query the ADC table (m·k
    * sub-dots, computed once against the codebook) scores every corpus
    * vector through an equi-join on (sub, code) — the corpus side touches
    * CODES only, never vectors — and the top `shortlist` by approximate
    * dot (decimal-exact sum, so the cut is order-independent) are
    * re-scored with exact cosine against the true vectors. Output matches
    * [[topKBrute]] whenever the shortlist captures the true top-k — on a
    * clustered corpus that is structural (cluster siblings share
    * near-identical codes and dominate the ADC ranking), which is what
    * sim_topk_pq_planted proves against the brute-force oracle.
    *
    * 100 TB shape: codes are the only corpus-sized frame (m longs per
    * vector); the ADC table and codebooks broadcast; the rerank touches
    * `shortlist` vectors per query. No cartesian — candidate generation
    * is the (sub, code) equi-join. */
  /** The production ANN stack — IVF cells × PQ codes: corpus vectors
    * live in their nearest cell AND are stored as m codes; a query probes
    * its `nprobe` cells and ADC-scores ONLY the codes in them, then the
    * shortlist reranks exactly. Composes the two certificates: the
    * planted variant's true top-k are cluster siblings, siblings land in
    * the query's probed cells (the IVF argument) with dominant ADC
    * scores (the PQ argument), so the output is brute force and
    * hash-checks against the same oracle. Every join is an equi-join on
    * a broadcast side (cells, ADC table, ids); the only corpus-sized
    * frames are the cell assignment and the m-codes table. */
  def topKIvfPq(embeddings: DataFrame, k: Int = 5, numQueries: Int = 8,
                numCells: Int = 16, nprobe: Int = 3,
                m: Int = 4, kCode: Int = 16, shortlist: Int = 32,
                centroids: Option[DataFrame] = None,
                codebooks: Option[DataFrame] = None): DataFrame = {
    val cents = broadcast(centroids.getOrElse(
      trainCentroids(embeddings, numCells, iterations = 2)))
    val books = broadcast(codebooks.getOrElse(
      trainPqCodebooks(embeddings, m, kCode, iterations = 2)))
    // ONE dim probe shared by the build and serve halves
    val dim = dimOf(embeddings).getOrElse(
      throw new IllegalArgumentException("topKIvfPq: empty corpus"))
    serveFromIndex(embeddings, buildIndexAt(embeddings, cents, books, m, dim),
      cents, books, k, numQueries, nprobe, m, shortlist, dimHint = Some(dim))
  }

  /** Embedding dimension from the first row — one tiny job; None on an
    * empty frame (never a head() crash: an empty micro-batch is a
    * routine streaming event, not an error). */
  private def dimOf(embeddings: DataFrame): Option[Int] =
    embeddings.select(size(toDouble(col("embedding"))))
      .head(1).headOption.map(_.getInt(0))

  /** The IVF-PQ index rows for a corpus against FIXED model artifacts:
    * each vector's 1-nearest cell and its m PQ codes — (vec_id, cell,
    * sub, code), the only corpus-sized frame the serving path probes.
    * Assignment is strictly per-row (argmin against a broadcast ≤k·m
    * model), which is what makes the index APPENDABLE — see
    * [[indexIncrement]]. An EMPTY corpus yields an empty index frame
    * with the right schema (annIndexStateSink feeds this from micro-
    * batches, and empty batches must not kill the stream). */
  def buildIndex(embeddings: DataFrame, centroids: DataFrame,
                 books: DataFrame, m: Int = 4): DataFrame =
    dimOf(embeddings) match {
      case Some(dim) => buildIndexAt(embeddings, centroids, books, m, dim)
      case None => embeddings.select(col("vec_id"), lit(0L).as("cell"),
        lit(0).as("sub"), lit(0L).as("code"))
    }

  private def buildIndexAt(embeddings: DataFrame, centroids: DataFrame,
                           books: DataFrame, m: Int, dim: Int): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim $dim not divisible into m=$m subspaces")
    val corpus = embeddings.select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val cells = assignCells(embeddings, broadcast(centroids), probe = 1)
      .select(col("vec_id"), col("cell"))
    pqAssign(subSlices(corpus, m, dim / m), broadcast(books))
      .join(cells, "vec_id")
      .select("vec_id", "cell", "sub", "code")
  }

  /** Incremental ANN index maintenance — the rolling-ingest member of
    * the family next to Dedup.exactIncrement/minhashLshIncrement: assign
    * a NEW embedding batch against the STORED centroid + codebook
    * artifacts ([[centroidArtifact]], [[pqCodebookArtifact]]) and emit
    * exactly the rows to APPEND to the serving index — no retraining, no
    * touch of the seen corpus (the batch never joins corpus-sized state;
    * the model side is a broadcast ≤k·m rows). Because assignment is
    * per-row, the appended rows are bit-equal to what a full index
    * rebuild over the union corpus would assign to the same ids (spec'd)
    * — the index grows by appends, and centroid/codebook refresh stays a
    * separate OFFLINE decision, exactly how an IVF-PQ deployment ages. */
  def indexIncrement(batch: DataFrame, centroids: DataFrame,
                     books: DataFrame, m: Int = 4): DataFrame =
    buildIndex(batch, centroids, books, m)

  /** IVF-PQ serving over a PREBUILT index frame (vec_id, cell, sub,
    * code) — stored rows plus any [[indexIncrement]] appends: probe the
    * query's nprobe cells, ADC-score only the codes in them, exact-rerank
    * the shortlist. The split of [[topKIvfPq]] that lets the index be a
    * maintained table rather than a per-query rebuild. */
  def serveFromIndex(embeddings: DataFrame, index: DataFrame,
                     centroids: DataFrame, books: DataFrame,
                     k: Int = 5, numQueries: Int = 8, nprobe: Int = 3,
                     m: Int = 4, shortlist: Int = 32,
                     dimHint: Option[Int] = None): DataFrame = {
    require(shortlist >= k,
      s"shortlist=$shortlist < k=$k would silently return fewer than k neighbors")
    val corpus = embeddings.select(col("vec_id"), toDouble(col("embedding")).as("v"))
    // dimHint saves the probe job when the caller already knows the dim
    val dim = dimHint.orElse(dimOf(embeddings)).getOrElse(
      throw new IllegalArgumentException("serveFromIndex: empty corpus"))
    require(dim % m == 0, s"dim $dim not divisible into m=$m subspaces")
    val subDim = dim / m
    val queryCells = assignCells(embeddings.filter(col("vec_id") < numQueries),
      broadcast(centroids), probe = nprobe)
      .select(col("vec_id").as("query_id"), col("cell"))
    val adc = subSlices(corpus.filter(col("vec_id") < numQueries), m, subDim)
      .join(broadcast(books), "sub")
      .select(col("vec_id").as("query_id"), col("sub"),
        col("centroid_id").as("code"),
        VectorFunctions.dot(col("sv"), col("cv")).as("dsub"))
    val short = index
      .join(broadcast(queryCells), "cell") // probe restriction: cell equi-join
      .join(broadcast(adc), Seq("query_id", "sub", "code"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy("query_id", "vec_id")
      .agg(sum(col("dsub").cast("decimal(38,30)")).cast("double").as("approx_dot"))
      .withColumn("r", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("approx_dot").desc, col("vec_id"))))
      .filter(col("r") <= shortlist)
    short
      .join(corpus.select(col("vec_id"), col("v").as("nv")), "vec_id")
      .join(broadcast(corpus.filter(col("vec_id") < numQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))), "query_id")
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("nv")).as("cosine"))
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  def topKPqRerank(embeddings: DataFrame, k: Int = 5, numQueries: Int = 8,
                   m: Int = 4, kCode: Int = 16, shortlist: Int = 32,
                   trainIterations: Int = 2,
                   pretrained: Option[DataFrame] = None): DataFrame = {
    require(shortlist >= k,
      s"shortlist=$shortlist < k=$k would silently return fewer than k neighbors")
    val corpus = embeddings.select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val dim = corpus.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into m=$m subspaces")
    val subDim = dim / m
    val books = broadcast(pretrained.getOrElse(
      trainPqCodebooks(embeddings, m, kCode, iterations = trainIterations)))
    val codes = pqAssign(subSlices(corpus, m, subDim), books)
    val adc = subSlices(corpus.filter(col("vec_id") < numQueries), m, subDim)
      .join(broadcast(books), "sub")
      .select(col("vec_id").as("query_id"), col("sub"),
        col("centroid_id").as("code"),
        VectorFunctions.dot(col("sv"), col("cv")).as("dsub"))
    val short = codes.join(broadcast(adc), Seq("sub", "code"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy("query_id", "vec_id")
      .agg(sum(col("dsub").cast("decimal(38,30)")).cast("double").as("approx_dot"))
      .withColumn("r", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("approx_dot").desc, col("vec_id"))))
      .filter(col("r") <= shortlist)
    short
      .join(corpus.select(col("vec_id"), col("v").as("nv")), "vec_id")
      .join(broadcast(corpus.filter(col("vec_id") < numQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))), "query_id")
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("nv")).as("cosine"))
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Exact integer Gram sketch of the milli-quantized corpus — the ONE
    * corpus scan the whole spectral family runs on. Per row each element
    * quantizes to q_j = ⌊1000·x_j⌋ (exact long, codegen'd SQL transform);
    * a typed [[GramAgg]] aggregator then multiply-adds the row's upper
    * triangle q_i·q_j into ONE fixed-width primitive long array per
    * partition (d(d+1)/2 ≤ 33k entries at the 257 slice cap — the cap is
    * applied BEFORE the bound check so a hostile width can't blow up the
    * scan that would reject it), merged element-wise up the aggregate
    * tree and collected as a single bounded row. The buffer also carries
    * n and min/max row width, so a RAGGED corpus fails loudly here
    * instead of silently null-padding loadings. Integer sums are
    * order-free, so G is partitioning-invariant and bit-identical to any
    * engine's replay of the same quantization — the DuckDB oracle
    * replays the Gram RELATION, not this encoding, so the r14 struct
    * explode (d(d+1)/2+1 structs per row into a hash aggregate, ~2081×
    * row expansion at d=64) was replaced by this zero-expansion
    * accumulator with no oracle change.
    * Overflow: |q_i·q_j| ≤ 1e6·max|x|² per row, so the long sums hold
    * to n·max|x|² ≲ 9e12 — beyond that, lower the quantization scale. */
  private[ops] final case class GramSketch(d: Int, n: Long, g: Array[Array[Long]])

  /** Slice cap on embedding width (> the 256 bound so finish() still
    * sees an out-of-bound width and rejects it loudly). */
  private final val GramCap = 257
  private final val GramTri = GramCap * (GramCap + 1) / 2

  /** Mutable aggregation buffer: row count, min/max row width (the
    * ragged-corpus sentinel), and the flat upper-triangle sums indexed
    * at the FIXED cap width — fixed so two buffers always merge
    * element-wise even when the corpus is ragged (raggedness is
    * detected at finish, never mis-indexed mid-scan). */
  private[ops] final case class GramBuf(
      var n: Long, var szMin: Long, var szMax: Long, g: Array[Long])

  /** The Gram accumulator: per row a d(d+1)/2 multiply-add loop on one
    * primitive array (no row expansion, no hash-aggregate probes), the
    * Misra-Gries/[[HeavyHitters]] typed-Aggregator pattern applied to a
    * fixed-width numeric buffer. Buffers are mutated in place (the
    * object-hash aggregate keeps one live buffer per partition) and
    * merged element-wise; an empty or short row contributes nothing to
    * `g` but still moves the width sentinel, so zero-length embeddings
    * surface as the intended ragged/width error, not a mid-scan throw. */
  private[ops] final class GramAgg
      extends org.apache.spark.sql.expressions.Aggregator[(Array[Long], Long), GramBuf, GramBuf] {
    override def zero: GramBuf =
      GramBuf(0L, Long.MaxValue, Long.MinValue, new Array[Long](GramTri))
    override def reduce(b: GramBuf, row: (Array[Long], Long)): GramBuf = {
      val (q, sz) = row
      b.n += 1L
      if (sz < b.szMin) b.szMin = sz
      if (sz > b.szMax) b.szMax = sz
      val w = q.length // ≤ GramCap by the slice
      var i = 0
      while (i < w) {
        val qi = q(i)
        val base = i * GramCap - i * (i - 1) / 2 - i
        var j = i
        while (j < w) { b.g(base + j) += qi * q(j); j += 1 }
        i += 1
      }
      b
    }
    override def merge(a: GramBuf, b: GramBuf): GramBuf = {
      a.n += b.n
      if (b.szMin < a.szMin) a.szMin = b.szMin
      if (b.szMax > a.szMax) a.szMax = b.szMax
      var t = 0
      while (t < GramTri) { a.g(t) += b.g(t); t += 1 }
      a
    }
    override def finish(b: GramBuf): GramBuf = b
    override def bufferEncoder: org.apache.spark.sql.Encoder[GramBuf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: org.apache.spark.sql.Encoder[GramBuf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  private[ops] def gramSketch(embeddings: DataFrame, who: String): GramSketch = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val q = transform(slice(col("embedding"), 1, GramCap),
      e => floor(e.cast("double") * lit(1000.0)).cast("long"))
    val buf = embeddings
      // null embeddings carry no axis information — skipped, exactly as
      // the r14 explode dropped them (explode of a null pair array)
      .filter(col("embedding").isNotNull)
      .select(q.as("q"), size(col("embedding")).cast("long").as("sz"))
      .as[(Array[Long], Long)]
      .select(new GramAgg().toColumn)
      .head() // ONE bounded row: the ≤33k-long triangle + width stats
    require(buf.n > 0L, s"$who: empty corpus")
    require(buf.szMin == buf.szMax,
      s"$who: ragged embedding dimensions [${buf.szMin}, ${buf.szMax}] — mixed-width corpora have no single axis")
    require(buf.szMax >= 1L && buf.szMax <= 256L, s"$who: d=${buf.szMax} out of [1, 256]")
    val d = buf.szMax.toInt
    val g = Array.ofDim[Long](d, d)
    var i = 0
    while (i < d) {
      val base = i * GramCap - i * (i - 1) / 2 - i
      var j = i
      while (j < d) { g(i)(j) = buf.g(base + j); g(j)(i) = g(i)(j); j += 1 }
      i += 1
    }
    GramSketch(d, buf.n, g)
  }

  /** The Gram sketch as a MERGEABLE bounded partial frame — the
    * streaming-state form of [[gramSketch]], completing train-side
    * streaming parity for the spectral family (the apply side already
    * streams via axisDriftStream/principalScores). Rows: (i ≥ 0, j, v)
    * the NONZERO upper-triangle integer sums, plus three sentinel rows
    * carrying the scan stats — (-1,-1, n), (-2,-2, min row width),
    * (-3,-3, max row width). Data rows and n merge by SUM, the width
    * sentinels by MIN/MAX per kind
    * (streaming/StreamingMonitors.gramStateSink applies exactly that),
    * so the merged state after ANY batch split is bit-identical to one
    * full scan — integer sums are order-free. An empty batch yields an
    * EMPTY frame (no state perturbation). Bounded ≤ 33k+3 rows. */
  def gramPartials(embeddings: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val q = transform(slice(col("embedding"), 1, GramCap),
      e => floor(e.cast("double") * lit(1000.0)).cast("long"))
    val buf = embeddings
      .filter(col("embedding").isNotNull)
      .select(q.as("q"), size(col("embedding")).cast("long").as("sz"))
      .as[(Array[Long], Long)]
      .select(new GramAgg().toColumn)
      .head() // one bounded row (the zero buffer on an empty batch)
    val rows =
      if (buf.n == 0L) Seq.empty[(Int, Int, Long)]
      else {
        val tri = for {
          i <- 0 until GramCap
          j <- i until GramCap
          v = buf.g(i * GramCap - i * (i - 1) / 2 - i + j)
          if v != 0L
        } yield (i, j, v)
        tri ++ Seq((-1, -1, buf.n), (-2, -2, buf.szMin), (-3, -3, buf.szMax))
      }
    rows.toDF("i", "j", "v")
  }

  /** Rebuild the exact [[GramSketch]] from a merged partial-frame state
    * — the serve half of the streaming seam, with the same loud
    * empty/ragged/width checks as the one-shot scan (a missing pair row
    * is a genuine zero sum; a missing SENTINEL is not a Gram state). */
  private[ops] def gramFromState(state: DataFrame, who: String): GramSketch = {
    val rows = state
      .select(col("i").cast("int"), col("j").cast("int"), col("v").cast("long"))
      .collect() // bounded like the sketch: ≤ 33k + 3 rows
    val m = rows.map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val n = m.getOrElse((-1, -1), 0L)
    require(n > 0L, s"$who: empty corpus")
    val szMin = m.getOrElse((-2, -2),
      sys.error(s"$who: state has no min-width sentinel — not a Gram state"))
    val szMax = m.getOrElse((-3, -3),
      sys.error(s"$who: state has no max-width sentinel — not a Gram state"))
    require(szMin == szMax,
      s"$who: ragged embedding dimensions [$szMin, $szMax] — mixed-width corpora have no single axis")
    require(szMax >= 1L && szMax <= 256L, s"$who: d=$szMax out of [1, 256]")
    val d = szMax.toInt
    val g = Array.ofDim[Long](d, d)
    m.foreach { case ((i, j), v) =>
      if (i >= 0) {
        require(i < d && j >= i && j < d,
          s"$who: pair ($i, $j) outside the d=$d triangle — not a Gram state")
        g(i)(j) = v; g(j)(i) = v
      }
    }
    GramSketch(d, n, g)
  }

  /** [[principalDirection]] served from a STREAMED Gram state — the
    * train face of the spectral family over the versioned merge seam:
    * the state after any batch split carries the identical integer
    * sums, so the served axis is bit-equal to the one-shot corpus train
    * (spec-pinned in StreamingMonitorsSpec). */
  def principalDirectionFromState(state: DataFrame, iters: Int = 8): DataFrame = {
    require(iters >= 1 && iters <= 32, s"iters=$iters out of [1, 32]")
    val spark = state.sparkSession
    import spark.implicits._
    val gram = gramFromState(state, "principalDirectionFromState")
    val (v, lambda, _) = powerIterateGram(gram, iters, Nil)
    (0 until gram.d).map(j => (j, v(j), lambda)).toDF("dim", "loading", "lambda")
  }

  /** [[principalDirections]] served from a streamed Gram state — the
    * deflated rank-k twin, zero corpus reads at serve time. */
  def principalDirectionsFromState(state: DataFrame, components: Int = 2,
                                   iters: Int = 8): DataFrame = {
    require(components >= 1 && components <= 4,
      s"principalDirectionsFromState: components=$components out of [1, 4]")
    require(iters >= 1 && iters <= 32, s"iters=$iters out of [1, 32]")
    val spark = state.sparkSession
    import spark.implicits._
    val gram = gramFromState(state, "principalDirectionsFromState")
    val priors = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    val out = (1 to components).flatMap { c =>
      val (v, lambda, vq) = powerIterateGram(gram, iters, priors.toSeq)
      priors += vq
      (0 until gram.d).map(j => (c, j, v(j), lambda))
    }
    out.toDF("component", "dim", "loading", "lambda")
  }

  /** floor-to-BigInt of an integral double (floor makes it integral;
    * the conversion is then exact — the same truncation DuckDB's
    * CAST(floor(·) AS HUGEINT) performs). */
  private def dfloor(x: Double): BigInt = BigDecimal(math.floor(x)).toBigInt

  /** The driver-side iteration core over an exact Gram sketch: every
    * cross-term sum is INTEGER (BigInt — order-free, engine-exact) and
    * every float step is a single correctly-rounded IEEE scalar op, so
    * the DuckDB oracle replays the rounds as chained CTEs over the same
    * Gram relation and hash-matches each loading bit-for-bit. Per round
    * (for component c with stored quantized priors u, scale 1e6):
    * y = G·v_q exactly; for each prior, the one-sided re-orthogonalization
    * y ← y − ⌊(Σu_q·y)/1e12·u_q⌋ (the classic deflated power step, its
    * float part per-ELEMENT only); then norm = √(Σy²) on exact integers,
    * v = y/norm, v_q = ⌊1e6·v⌋ for the next round. λ = norm/1e12 (the
    * 1e3 data scale × 1e3 again in G × 1e6 iterate scale). A zero
    * iterate (all-zero corpus, or a fully-deflated ~rank-c one) has no
    * principal direction and raises instead of propagating NaN. */
  private def powerIterateGram(gram: GramSketch, iters: Int,
                               priors: Seq[Array[Long]]): (Array[Double], Double, Array[Long]) = {
    val d = gram.d
    var vq = Array.fill(d)(math.floor(1000000.0 / math.sqrt(d.toDouble)).toLong)
    var v = Array.fill(d)(0.0)
    var lambda = 0.0
    for (_ <- 1 to iters) {
      var y = Array.tabulate(d) { j =>
        var acc = BigInt(0); var k = 0
        while (k < d) { acc += BigInt(gram.g(j)(k)) * BigInt(vq(k)); k += 1 }
        acc
      }
      priors.foreach { uq =>
        var dp = BigInt(0); var k = 0
        while (k < d) { dp += BigInt(uq(k)) * y(k); k += 1 }
        val dpd = dp.toDouble
        y = Array.tabulate(d)(j => y(j) - dfloor(dpd / 1.0e12 * uq(j).toDouble))
      }
      val normSq = y.foldLeft(BigInt(0))((a, x) => a + x * x)
      require(normSq.signum != 0,
        "powerIterate: zero iterate — the (deflated) corpus has no principal direction")
      val norm = math.sqrt(normSq.toDouble)
      lambda = norm / 1.0e12
      v = y.map(_.toDouble / norm)
      vq = v.map(x => math.floor(1000000.0 * x).toLong)
    }
    (v, lambda, vq)
  }

  /** Top principal direction of the embedding corpus — the spectral op
    * (drift axes, whitening, outlier projection) the similarity family
    * lacked — by power iteration over the EXACT GRAM SKETCH: one corpus
    * scan aggregates the d(d+1)/2 milli-quantized integer second
    * moments ([[gramSketch]]), then all `iters` rounds run driver-side
    * on exact integers ([[powerIterateGram]]) — at 100 TB the scan IS
    * the cost, and this shape pays it exactly once where a per-round
    * distributed iterate would pay it `iters` times. Uncentered (the
    * raw moment direction, not covariance) by documented convention:
    * centering needs a portable mean, and embedding corpora are
    * ~zero-mean by construction. Seed v₀ = ⌊1e6/√d⌋ on every axis;
    * convergence to the top eigenvector needs the usual
    * non-orthogonal-seed and spectral-gap assumptions — `iters` fixes
    * COST, the oracle replays whatever the iterate is. */
  def principalDirection(embeddings: DataFrame, iters: Int = 8): DataFrame = {
    require(iters >= 1 && iters <= 32, s"iters=$iters out of [1, 32]")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val gram = gramSketch(embeddings, "principalDirection")
    val (v, lambda, _) = powerIterateGram(gram, iters, Nil)
    (0 until gram.d).map(j => (j, v(j), lambda)).toDF("dim", "loading", "lambda")
  }

  /** The leading `components` directions by DEFLATED power iteration
    * over the SAME one-scan Gram sketch: each component's rounds
    * re-orthogonalize the iterate against every already-converged
    * direction (quantized to the 1e6 grid — the stored-artifact form),
    * so deflation costs ZERO extra corpus reads where the per-row
    * residual form paid a full re-materialization per component.
    * Components come out near-orthogonal (exactly orthogonal up to the
    * quantization residual); their lambda estimates order decreasingly
    * ONCE CONVERGED — on a nearly flat spectrum a fixed iteration
    * budget can leave them unordered, which is a property of power
    * iteration, not of this encoding. The oracle unrolls every
    * component's rounds and hash-matches each loading. components ≤ 4
    * enforced (this is a top-of-spectrum sketch, not an eigensolver). */
  def principalDirections(embeddings: DataFrame, components: Int = 2,
                          iters: Int = 8): DataFrame = {
    require(components >= 1 && components <= 4,
      s"principalDirections: components=$components out of [1, 4]")
    require(iters >= 1 && iters <= 32, s"iters=$iters out of [1, 32]")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val gram = gramSketch(embeddings, "principalDirections")
    val priors = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    val out = (1 to components).flatMap { c =>
      val (v, lambda, vq) = powerIterateGram(gram, iters, priors.toSeq)
      priors += vq
      (0 until gram.d).map(j => (c, j, v(j), lambda))
    }
    out.toDF("component", "dim", "loading", "lambda")
  }

  /** Projection of every vector onto a stored principal axis — what the
    * axis is FOR: the 1-D corpus coordinate a drift monitor tracks and
    * an outlier screen thresholds. `axis` is the collected `loading`
    * column of [[principalDirection]]'s frame in dim order (d ≤ 256
    * doubles — a bounded artifact like centroids), the score is the
    * same sequential-sum kernel dot, per-row and oracle-exact. One
    * corpus scan, zero shuffle; STREAMING-TRANSPARENT, so arriving
    * embeddings score against the stored axis with this same code. */
  def principalScores(embeddings: DataFrame, axis: Seq[Double]): DataFrame = {
    require(axis.nonEmpty && axis.size <= 256,
      s"principalScores: axis size ${axis.size} out of [1, 256]")
    embeddings.select(col("vec_id"),
      VectorFunctions.dot(toDouble(col("embedding")), typedLit(axis))
        .as("score"))
  }

  /** The 2-D spectral map: every vector's coordinates on the leading
    * two deflated directions — the plane a corpus drift dashboard plots
    * and a coverage-stratifier bins. IMPORTANT second-coordinate
    * convention: c2 is the RESIDUAL's coordinate, x·v2 computed after
    * shedding the v1 component per row (x − (x·v1)·v1), not the raw
    * x·v2 — with near-orthogonal axes they differ only by the
    * quantization residual, but only the residual form is exactly what
    * the deflated iteration optimized, and both engines replay it
    * identically. One corpus scan, zero shuffle, per-row kernel dots
    * against two bounded axis artifacts. */
  def principalCoords(embeddings: DataFrame, axis1: Seq[Double],
                      axis2: Seq[Double]): DataFrame = {
    require(axis1.nonEmpty && axis1.size <= 256 && axis2.size == axis1.size,
      s"principalCoords: axis sizes ${axis1.size}/${axis2.size} invalid")
    val x = toDouble(col("embedding"))
    val v1 = typedLit(axis1)
    val c1 = VectorFunctions.dot(x, v1)
    val resid = zip_with(x, v1, (xe, ve) => xe - c1 * ve)
    embeddings.select(col("vec_id"), c1.as("c1"),
      VectorFunctions.dot(resid, typedLit(axis2)).as("c2"))
  }

  /** Robust outlier screen on the principal-axis coordinate, PER LABEL —
    * the drift monitor the axis and scores exist to feed: train the
    * direction once, project every vector, then per class the exact
    * rank-selected median and MAD of the micro-quantized coordinate and
    * the count beyond k·MAD (Monitoring.madOutliers' integer discipline
    * — lower medians by pure rank, no interpolation, the gate on exact
    * longs). A class whose n_out share jumps batch-over-batch moved
    * along the corpus's dominant axis — embedding drift in one number.
    * Label partitioning keeps the rank windows parallel (labels are a
    * dimension); the same skew note as madOutliers applies if one label
    * dominates. */
  def axisOutliers(embeddings: DataFrame, k: Long = 3L,
                   iters: Int = 8): DataFrame = {
    require(k >= 1L, s"axisOutliers: k=$k must be >= 1")
    val axis = principalDirection(embeddings, iters)
      .orderBy("dim").collect().map(_.getDouble(1)).toSeq
    val q = embeddings
      .filter(col("label").isNotNull)
      .select(col("label"),
        floor(VectorFunctions.dot(toDouble(col("embedding")), typedLit(axis))
          * 1000000.0).cast("long").as("qv"))
    val byLabel = Window.partitionBy("label")
    val med = q
      .withColumn("rn", row_number().over(byLabel.orderBy(col("qv"))))
      .withColumn("n", count(lit(1)).over(byLabel))
      .filter(col("rn") === expr("(n + 1) DIV 2"))
      .select(col("label"), col("qv").as("med_q"))
    val dev = q.join(broadcast(med), "label")
      .withColumn("dev", abs(col("qv") - col("med_q")))
    val mad = dev
      .withColumn("rn", row_number().over(byLabel.orderBy(col("dev"))))
      .withColumn("n", count(lit(1)).over(byLabel))
      .filter(col("rn") === expr("(n + 1) DIV 2"))
      .select(col("label"), col("dev").as("mad_q"))
    dev.join(broadcast(mad), "label")
      .groupBy("label")
      .agg(count(lit(1)).as("n"), max("med_q").as("med_q"),
        max("mad_q").as("mad_q"),
        sum(when(col("dev") > lit(k) * col("mad_q"), 1L).otherwise(0L)).as("n_out"))
  }

  /** IVF serving over K-CENTER cells: the same assign/probe/rank
    * machinery as [[topKIvf]], with the cell centers drawn by the
    * deterministic farthest-first exemplar picker instead of
    * hash-seeded Lloyd. Every step — greedy selection, nearest-center
    * assignment (cosine desc, center-id ties), nprobe probing,
    * candidate ranking — is engine-portable relational arithmetic, so
    * unlike the Lloyd path (whose xxhash64 seed draw has no SQL twin)
    * this serving path has a FULL DuckDB replay: sim_topk_kcenter
    * hash-matches it end-to-end and sim_recall_audit's recall over it is
    * oracle-green on the REAL corpus, not a planted fixture.
    * Same 100 TB shape as topKIvf: bounded broadcast center set, one
    * corpus assign pass, equi-join candidate generation. */
  def topKIvfKCenter(embeddings: DataFrame, k: Int = 5, numQueries: Int = 10,
                     numCenters: Int = 8, nprobe: Int = 3): DataFrame = {
    val centers = kCenterSelect(embeddings, numCenters)
      .select(col("vec_id").as("centroid_id"))
      .join(embeddings.select(col("vec_id").as("centroid_id"),
        toDouble(col("embedding")).as("cv")), "centroid_id")
    val cb = broadcast(centers)
    val cells = assignCells(embeddings, cb, probe = 1)
    val queryCells = assignCells(
      embeddings.filter(col("vec_id") < numQueries), cb, probe = nprobe)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("cell"))
    val scored = queryCells
      .join(cells.select(col("vec_id").as("neighbor_id"), col("v").as("nv"),
        col("cell")), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("nv")).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Incremental k-center ANN index maintenance — [[indexIncrement]]'s
    * fully-replayable twin: assign a NEW embedding batch against the
    * STORED farthest-first exemplars (the offline artifact) and emit
    * exactly the (vec_id, cell, assign_cos) rows to append. Assignment
    * is per-row argmax against a broadcast ≤k-row center set, so the
    * appended rows are bit-equal to what a full rebuild over the union
    * corpus assigns to the same ids (spec'd) — and because every step
    * (greedy selection, cosine, (cos desc, id) ties) is engine-portable
    * relational arithmetic, the WHOLE increment replays in DuckDB
    * (sim_index_increment_kcenter), unlike the Lloyd-trained IVF
    * increment whose hash-seeded centroids have no SQL twin. */
  def kCenterIndexIncrement(stored: DataFrame, batch: DataFrame,
                            numCenters: Int = 8): DataFrame = {
    val centers = kCenterSelect(stored, numCenters)
      .select(col("vec_id").as("centroid_id"))
      .join(stored.select(col("vec_id").as("centroid_id"),
        toDouble(col("embedding")).as("cv")), "centroid_id")
    val scored = batch
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .crossJoin(broadcast(centers.select(col("centroid_id"), col("cv"))))
      .select(col("vec_id"), col("centroid_id"),
        cosine(col("v"), col("cv")).as("csim"))
    val w = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("centroid_id"))
    scored.withColumn("crank", row_number().over(w)).filter(col("crank") === 1)
      .select(col("vec_id"), col("centroid_id").as("cell"),
        col("csim").as("assign_cos"))
  }

  /** Exact recall@k of an ANN serving result against brute-force truth
    * — the MEASURED-quality generalization of the planted certificates:
    * `_planted` fixtures prove recall 1.0 structurally on constructed
    * data; this reports it on the real corpus, the number a production
    * serving stack actually monitors. `served` is any (query_id,
    * neighbor_id, …) frame ([[topKIvf]] / [[topKPqRerank]] /
    * [[topKIvfPq]] / [[topKIvfKCenter]] output); truth is [[topKBrute]]
    * over the same bounded query sample. Per query: n_true (k, fewer
    * only on a sub-k corpus), n_hits = |served ∩ truth| by exact set
    * intersection, recall = n_hits/n_true — one correctly-rounded
    * division of small exact longs, engine-portable. Cost: the brute
    * pass over the bounded query sample (the audit's price); every join
    * after it runs on k×numQueries rows. Full-probe serving must score
    * exactly 1.0 — spec-pinned (LlmOpsSpec "recall audit"), and the
    * real-corpus number is the oracle-checked sim_recall_audit entry. */
  def recallAudit(embeddings: DataFrame, served: DataFrame, k: Int = 5,
                  numQueries: Int = 10): DataFrame = {
    val truth = topKBrute(embeddings, k, numQueries)
      .select(col("query_id"), col("neighbor_id"))
    // dedupe served on the pair key BEFORE the join: a served frame with
    // duplicate (query_id, neighbor_id) rows would otherwise fan out the
    // left join and inflate n_true past the truth cardinality
    val hit = served.select(col("query_id"), col("neighbor_id"))
      .distinct().withColumn("hit", lit(1L))
    truth.join(hit, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_true"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .select(col("query_id"), col("n_true"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_true")).as("recall"))
  }

  /** Position-aware ANN serving quality — [[recallAudit]]'s MRR
    * sibling: per query, the rank of the FIRST brute-truth neighbor in
    * the SERVED list (rr_scaled = 10^6 DIV first_rank, 0 on all-miss,
    * the exact-integer discipline of the RRF family). recall@k is
    * position-blind — a serving list that buries every true neighbor
    * at rank k scores the same as one that leads with them — and
    * unlike [[mrrAudit]]'s dense calibration arm, the served frame
    * here is a real ANN path, so the number measures actual serving
    * degradation. Queries come from the truth side, so a query whose
    * served list misses everything still yields its row at 0. Same
    * cost shape as [[recallAudit]]: one brute pass over the bounded
    * query sample, then k×numQueries-row joins. Fully replayable on
    * the k-center serving path (the sim_topk_kcenter precedent). */
  def mrrServedAudit(embeddings: DataFrame, served: DataFrame, k: Int = 5,
                     numQueries: Int = 10): DataFrame = {
    // consumed twice (hit join + query totality): materialize the
    // ≤ k·numQueries-row truth once so the brute pass behind it runs
    // once, not per consumer (the mrrAudit arm-checkpoint pattern)
    val truth = topKBrute(embeddings, k, numQueries)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint()
    // enforce the @k contract here, not by caller convention: a served
    // frame deeper than k must not score hits beyond position k (the
    // per-arm rank <= k filter mrrFromRanks already applies)
    val fh = served.select(col("query_id"), col("neighbor_id"), col("rank"))
      .filter(col("rank") <= k)
      .join(truth, Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(min("rank").cast("long").as("first_rank"))
    truth.select("query_id").distinct()
      .join(fh, Seq("query_id"), "left")
      .select(col("query_id"), col("first_rank"),
        when(col("first_rank").isNull, 0L)
          .otherwise(expr("1000000L DIV first_rank")).as("rr_scaled"))
  }

  /** Dimension-truncation retrieval audit — the Matryoshka question a
    * serving team asks before halving its vector store: does top-k under
    * the FIRST d/2 coordinates still retrieve the full-dimension top-k?
    * Exact recall@k of truncated-cosine serving vs full-cosine truth
    * over the bounded query sample — the [[recallAudit]] machinery with
    * the served side swapped for a brute pass over sliced vectors, so
    * the whole audit is oracle-replayable (no ANN approximation in
    * either arm). Cost: two brute passes over the bounded sample; every
    * join after runs on k×numQueries rows. */
  def dimTruncationAudit(embeddings: DataFrame, k: Int = 5,
                         numQueries: Int = 10): DataFrame = {
    val truncated = embeddings.select(col("vec_id"),
      expr("slice(embedding, 1, CAST(size(embedding) / 2 AS INT))").as("embedding"))
    recallAudit(embeddings, topKBrute(truncated, k, numQueries), k, numQueries)
  }

  /** Embedding-space anisotropy diagnostics — the representation-health
    * check a training pipeline runs before trusting cosine similarity
    * at all. An isotropic embedding space has mean pairwise cosine ≈ 0;
    * contextual encoders are notoriously anisotropic (all vectors
    * share a dominant direction), which silently inflates every
    * similarity score downstream (dedup thresholds, ANN recall, label
    * cohesion). Two numbers over the unit-normalized corpus:
    *
    *  - `mean_pair_cosine`: the exact mean cosine over ALL n(n−1)
    *    ordered pairs — computed WITHOUT the pairwise join via the
    *    identity Σ_{r≠s} ⟨u_r,u_s⟩ = ‖Σ_r u_r‖² − Σ_r ‖u_r‖²;
    *  - `mean_vector_norm`: ‖mean vector‖ — the anisotropy direction's
    *    magnitude (≈ √mean_pair_cosine for large n).
    *
    * Exactness discipline (the gramSketch pattern): each normalized
    * coordinate quantizes to micro-units (floor(1e6·x/‖x‖), per-row
    * double ops are engine-exact), then everything is INTEGER sums —
    * per-dimension S_k and per-dimension Σq² — combined by the identity
    * above in decimal, with ONE double division at the end. Order-free,
    * partitioning-invariant, and the oracle replays the identical
    * relation.
    *
    * 100 TB shape: ONE corpus scan, no pairwise join — the explode
    * shuffles d small integer partials per input partition (map-side
    * combined), the final reduce is d rows. Null embeddings and
    * zero-norm rows carry no direction and are excluded; a ragged
    * corpus (mixed widths — detectable as unequal per-dimension row
    * counts, dimension 0 is in every surviving row) fails loudly via
    * raise_error rather than averaging incomparable spaces. Overflow
    * bound: |S_k| ≤ n·1e6 holds in decimal(19) to n ≈ 1e13 rows,
    * Σ S_k² ≤ d·n²·1e12 in decimal(38) far past that. */
  def isotropy(embeddings: DataFrame): DataFrame = {
    val q = embeddings
      .filter(col("embedding").isNotNull)
      .select(toDouble(col("embedding")).as("x"))
      .select(col("x"), sqrt(VectorFunctions.dot(col("x"), col("x"))).as("nr"))
      .filter(col("nr") > 0.0)
      .select(transform(col("x"),
        e => floor(lit(1000000.0) * e / col("nr"))).as("q"))
    val dims = q
      .select(posexplode(col("q")).as(Seq("i", "e")))
      .groupBy("i")
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("e").cast("decimal(19,0)")).as("s"),
        sum((col("e") * col("e")).cast("decimal(38,0)")).as("t2"))
    dims
      .agg(
        count(lit(1)).as("d"),
        max("cnt").as("n"),
        min("cnt").as("cmin"),
        sum(col("s").cast("decimal(19,0)") * col("s").cast("decimal(19,0)")).as("ss"),
        sum(col("t2")).as("t"))
      .select(
        col("n").as("n_vectors"),
        when(col("cmin") === col("n"), col("d"))
          .otherwise(raise_error(format_string(
            "isotropy: ragged embedding widths (dimension seen %s..%s times)",
            col("cmin"), col("n")))).as("n_dims"),
        when(col("n") >= 2L,
          (col("ss") - col("t")).cast("double") /
            (col("n").cast("double") * (col("n") - 1L).cast("double") * lit(1.0e12)))
          .otherwise(raise_error(lit(
            "isotropy: need at least 2 non-null nonzero vectors"))).as("mean_pair_cosine"),
        (sqrt(col("ss").cast("double")) / col("n").cast("double") / lit(1000000.0))
          .as("mean_vector_norm"))
  }
}
