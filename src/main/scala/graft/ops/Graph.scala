package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed connected components over a near-dup pair list, and the
  * canonical-document resolution it enables — the terminal stage every
  * dedup pipeline needs: the pair generators (Dedup.ngramJaccard /
  * minhashLsh / simhashPairs / embeddingNearDupLsh) emit EDGES, but a
  * corpus pass must resolve those edges into CLUSTERS and keep exactly one
  * representative per cluster. (The reference pipeline has no analog — its
  * record-at-a-time flow never joins records to records; this is part of
  * the LLM-pipeline surface built beyond it.)
  *
  * Algorithm: min-label propagation with pointer doubling. Every node
  * starts labeled with itself; each round first lowers a node's label to
  * the min over its neighbors' labels (one equi-join + min-aggregate),
  * then compresses one hop — lab := lab(lab) — via a self-equi-join
  * (labels are always node ids, so the join always hits). Lowering alone
  * needs O(diameter) rounds; the doubling step halves chain depth each
  * round, giving O(log n) convergence on paths — the same shortcutting
  * idea as the alternating-star MapReduce algorithms (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). Both steps
  * are per-element monotonically non-increasing on a finite id domain, so
  * sum(label) equality between rounds certifies the exact fixpoint — and
  * at the fixpoint labels are constant per component and equal the
  * component's min node id.
  *
  * 100 TB shape: every step is an equi-join or an aggregate — no cartesian
  * anywhere, no driver-side graph state (the driver sees one scalar per
  * round). Each iterate is `localCheckpoint`ed: the convergence aggregate
  * materializes it, lineage is severed so the plan stays one-round deep
  * regardless of iteration count, and superseded iterates are GC'd by the
  * context cleaner. (On a real cluster swap in reliable `checkpoint` for
  * executor-loss tolerance — same contract, durable storage.) The label
  * frame holds only nodes that appear in a pair — for near-dup edges that
  * is a small fraction of the corpus. Skew: a giant dup cluster makes its
  * min id a hot key on the jump join's PROBE side (build side stays
  * unique-per-id); that is the partition AQE's skew-join splitting exists
  * for, and the aggregate steps are partial-agg'd before the shuffle
  * either way.
  */
object Graph {

  /** (id, comp) for every node appearing in `pairs`, comp = min node id of
    * the node's connected component. Ids must be integral (cast to long). */
  def connectedComponents(pairs: DataFrame, srcCol: String = "id1",
                          dstCol: String = "id2", maxIter: Int = 64): DataFrame = {
    // a silent cast("long") of string ids would null both endpoints and
    // drop every edge — fail loudly instead of returning empty components
    Seq(srcCol, dstCol).foreach { c =>
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val ok = pairs.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      require(ok,
        s"connectedComponents needs integral node ids; $c is ${pairs.schema(c).dataType}")
    }
    val oriented = pairs
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .where(col("u") =!= col("v"))
    val sym = oriented
      .union(oriented.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .persist()
    // seed labels with round 1's lowering for free: min(N(u) ∪ {u}) is one
    // aggregate over the symmetric edges — no join, and it both enumerates
    // the nodes and saves a full iteration
    // lazy checkpoints: the convergence aggregate below is the first
    // action on each iterate, so it materializes the checkpoint and
    // certifies the fixpoint in ONE job per round instead of two
    var labels = sym.groupBy(col("u").as("id"))
      .agg(least(min(col("v")), col("u")).as("lab"))
      .localCheckpoint(false)
    // sum over distinct longs (node ids) can exceed Long on a 100 TB id
    // space — certify the fixpoint in decimal
    def labSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("lab").cast("decimal(38,0)")), lit(java.math.BigDecimal.ZERO))
        .as("s")).head().getDecimal(0)
    var prev = labSum(labels)
    var converged = false
    var i = 0
    while (i < maxIter && !converged) {
      val nbrMin = sym
        .join(labels.select(col("id").as("v"), col("lab").as("vlab")), "v")
        .groupBy("u").agg(min("vlab").as("nmin"))
      val lowered = labels
        .join(nbrMin.select(col("u").as("id"), col("nmin")), Seq("id"), "left")
        .select(col("id"), least(col("lab"), coalesce(col("nmin"), col("lab"))).as("lab"))
      val jumped = lowered
        .join(lowered.select(col("id").as("lab"), col("lab").as("lab2")), Seq("lab"))
        .select(col("id"), col("lab2").as("lab"))
        .localCheckpoint(false)
      val s = labSum(jumped)
      // per-element non-increasing ⇒ equal sums ⇔ nothing moved ⇒ fixpoint
      converged = s.compareTo(prev) == 0
      prev = s
      labels = jumped
      i += 1
    }
    sym.unpersist(blocking = false)
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    labels.select(col("id"), col("lab").as("comp"))
  }

  /** Incremental closure maintenance — the rolling-ingest member for the
    * TERMINAL dedup stage (exact/LSH/ANN increments exist; without this,
    * every pair-list delta forces a full pointer-doubling re-run over the
    * corpus): merge a NEW pair batch into a STORED components frame
    * (id, comp) and return the updated frame, equal to
    * [[connectedComponents]] over the union pair set (spec'd on random
    * graphs and oracle-checked end to end).
    *
    * The trick is the QUOTIENT graph: each new edge's endpoints map to
    * their stored roots (themselves when unseen), and the pointer
    * doubling runs only on the deduped root-root edges — a frame bounded
    * by the BATCH, never the corpus. Stored labels then remap through
    * the quotient result with one left equi-join (the unavoidable
    * update write), and the batch's unseen nodes label themselves
    * through the same map. Correct because stored roots are the min ids
    * of their components, so the quotient minimum IS the global minimum
    * of every merged component. 100 TB shape: O(batch) closure work +
    * one corpus-sized equi-join remap, vs O(corpus) closure rounds for
    * the full re-run. */
  def componentsIncrement(stored: DataFrame, newPairs: DataFrame,
                          srcCol: String = "id1", dstCol: String = "id2",
                          maxIter: Int = 64): DataFrame = {
    def requireIntegral(df: DataFrame, frame: String, cols: String*): Unit =
      cols.foreach { c =>
        import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
        val ok = df.schema(c).dataType match {
          case ByteType | ShortType | IntegerType | LongType => true
          case _ => false
        }
        require(ok,
          s"componentsIncrement needs integral node ids; $frame.$c is ${df.schema(c).dataType}")
      }
    requireIntegral(newPairs, "newPairs", srcCol, dstCol)
    // `stored` must be genuine [[connectedComponents]] output — comp is
    // the MIN id of each component and every comp value appears as a
    // self-labeled root row (id === comp). The merge below leans on that
    // invariant (the quotient minimum is only the global minimum when
    // stored labels are component minima), and an arbitrary (id, comp)
    // labeling — e.g. quality-argmax representatives — would silently
    // produce wrong merged components. The schema is validated here; the
    // data-level invariant (roots self-labeled, a full scan) is pinned in
    // GraphSpec, not re-checked per call at corpus scale.
    requireIntegral(stored, "stored", "id", "comp")
    val edges = newPairs
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      // self-pairs carry no edge: connectedComponents drops them, and the
      // incremental result must match it node-for-node
      .where(col("u") =!= col("v"))
    val roots = stored.select(col("id"), col("comp"))
    val quotientEdges = edges
      .join(roots.select(col("id").as("u"), col("comp").as("cu")), Seq("u"), "left")
      .join(roots.select(col("id").as("v"), col("comp").as("cv")), Seq("v"), "left")
      .select(coalesce(col("cu"), col("u")).as("id1"),
        coalesce(col("cv"), col("v")).as("id2"))
      .where(col("id1") =!= col("id2"))
      .distinct()
    // closure over roots only — batch-bounded, corpus never re-walked
    val q = connectedComponents(quotientEdges, maxIter = maxIter)
    val storedUpdated = stored
      .join(q.select(col("id").as("comp"), col("comp").as("__merged")),
        Seq("comp"), "left")
      .select(col("id"), coalesce(col("__merged"), col("comp")).as("comp"))
    // unseen endpoints: their root is themselves, so the quotient result
    // keys them directly; untouched unseen nodes label themselves
    val newNodes = edges.select(col("u").as("id"))
      .union(edges.select(col("v").as("id")))
      .distinct()
      .join(stored.select(col("id")), Seq("id"), "left_anti")
      .join(q, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
    storedUpdated.unionByName(newNodes)
  }

  /** Per-document canonical id: the min doc id of the document's near-dup
    * component, itself for documents in no pair. `SELECT ... WHERE doc_id =
    * canonical_id` (or a join on it) is the deduplicated corpus. The
    * component frame only holds paired nodes, so the join back to the full
    * corpus is a left equi-join against a much smaller right side —
    * broadcast-able when the dup rate is low, AQE-planned otherwise. */
  def canonicalize(docs: DataFrame, pairs: DataFrame,
                   idCol: String = "doc_id"): DataFrame =
    canonicalizeFromComponents(docs, connectedComponents(pairs), idCol)

  /** [[canonicalize]] over an ALREADY-RESOLVED component frame (id, comp)
    * — the consumption seam that lets one pointer-doubling run (or a
    * persisted components artifact; at 100 TB the closure is the dominant
    * dedup cost and runs as a nightly job) feed every downstream consumer:
    * canonical mapping, cluster histogram, leakage-safe split, per-source
    * dup rate. Just the left equi-join back to the corpus. */
  def canonicalizeFromComponents(docs: DataFrame, components: DataFrame,
                                 idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol))
      .join(components.select(col("id").as(idCol), col("comp")),
            Seq(idCol), "left")
      .select(col(idCol), coalesce(col("comp"), col(idCol).cast("long")).as("canonical_id"))

  /** Duplicate-cluster size histogram over a canonical-id frame — the
    * corpus-report curve next to [[sourceDupMatrix]]'s WHERE: how BAD is
    * duplication (a long tail of pair-clusters is routine crawl overlap;
    * a few giant clusters are template farms worth a source-level fix).
    * For each cluster size: the cluster count and the docs they hold
    * (their product — n_docs sums to the corpus). Two aggregates; the
    * output is at most max-cluster-size rows. */
  def clusterSizeHistogram(canon: DataFrame): DataFrame =
    canon.groupBy("canonical_id").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", col("cluster_size") * col("n_clusters"))
      .select("cluster_size", "n_clusters", "n_docs")

  /** Cross-source duplication matrix — which sources copy which: each
    * near-dup pair attributed to its unordered (source, source) cell.
    * The curation dashboard that decides WHERE to point the dedup effort
    * at 100 TB (a hot off-diagonal cell means one source mirrors
    * another; a hot diagonal means within-source churn). The pair list
    * is the small side; the (doc_id, source) projection joins back
    * per-endpoint as an equi-join (AQE broadcasts the pair side when the
    * dup rate is low). One shuffle for the final cell count. */
  def sourceDupMatrix(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val src = docs.select(col("doc_id"), col("source"))
    pairs
      .join(src.toDF("id1", "s1"), "id1")
      .join(src.toDF("id2", "s2"), "id2")
      .select(least(col("s1"), col("s2")).as("source_a"),
        greatest(col("s1"), col("s2")).as("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Per-source duplication rate: how many of each source's docs are
    * non-canonical (the rows a dedup pass would drop) — the quality
    * metric that ranks sources for exclusion. Component resolution once,
    * one join to the source dimension, one aggregate. */
  def sourceDupRate(docs: DataFrame, pairs: DataFrame): DataFrame =
    sourceDupRateFromCanon(canonicalize(docs, pairs), docs)

  /** [[sourceDupRate]] over a prebuilt canonical frame — see
    * [[canonicalizeFromComponents]] for why the resolution is a seam. */
  def sourceDupRateFromCanon(canon: DataFrame, docs: DataFrame): DataFrame =
    canon
      .join(docs.select("doc_id", "source"), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("canonical_id") =!= col("doc_id"), 1)).as("n_dups"))

  /** Weighted event-type transition edges: per user, consecutive events
    * in (ts, id) order yield one (src → dst) transition; edge weight m =
    * transition count over the corpus. One window over the user
    * partitioning + one aggregate — the standard path-to-graph reduction
    * feeding [[pagerankInt]]. */
  def eventTransitions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    events
      .filter(col("user_id").isNotNull && col("event_type").isNotNull &&
        col("ts_us").isNotNull)
      .withColumn("__next", lead(col("event_type"), 1).over(
        Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))))
      .filter(col("__next").isNotNull)
      .groupBy(col("event_type").as("src"), col("__next").as("dst"))
      .agg(count(lit(1)).as("m"))
  }

  /** Markov transition probabilities over a weighted edge list: per-src
    * row shares m / Σm — the normalized form of [[eventTransitions]] a
    * next-event model consumes. Integer counts carried alongside; the one
    * double division divides two exact longs per row, so every engine
    * agrees bitwise. One window sum over the src partitioning — no joins,
    * no second aggregate pass. */
  def transitionProbs(edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    edges
      .withColumn("w", sum(col("m")).over(Window.partitionBy("src")))
      .select(col("src"), col("dst"), col("m"), col("w"),
        (col("m").cast("double") / col("w")).as("p"))
  }

  /** Synchronous label-propagation communities (Raghavan et al. 2007)
    * over a weighted edge list — the community-detection member of the
    * graph family next to [[pagerankInt]] and [[connectedComponents]].
    * The graph is treated as UNDIRECTED (per-direction weights summed
    * per neighbor pair; self-loops dropped — a self vote would just
    * entrench every init label). Every node starts as its own label;
    * each of the fixed `iterations` rounds relabels EVERY node
    * simultaneously to the label with the greatest total incident
    * weight among its neighbors' PREVIOUS labels, ties to the smallest
    * label — so the run is bit-deterministic (classic async LPA is
    * order-dependent; the synchronous + min-tie variant is the
    * oracle-able one, and the fixed iteration count makes even
    * bipartite label oscillation deterministic). Neighborless nodes
    * keep their own label. Emits (node, community, n_members).
    *
    * 100 TB shape: per iteration ONE equi-join of the label frame to
    * the neighbor list, one (node, label) aggregate, one row_number
    * pick, one left join back to nodes — no cartesian, no driver graph
    * state; iterates localCheckpoint like pagerankInt so the plan stays
    * one-round deep. The DuckDB oracle unrolls the same rounds. */
  def labelPropagation(edges: DataFrame, iterations: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(iterations >= 1, "labelPropagation needs at least one iteration")
    val e = edges
      .select(col("src"), col("dst"), col("m").cast("long").as("m"))
      .filter(col("src").isNotNull && col("dst").isNotNull && col("m") > 0)
    val und = e.filter(col("src") =!= col("dst"))
    val nbrs = und.select(col("src").as("node"), col("dst").as("nbr"), col("m"))
      .unionByName(und.select(col("dst").as("node"), col("src").as("nbr"), col("m")))
      .groupBy("node", "nbr").agg(sum("m").as("w")).persist()
    // nodes from the FULL edge list: a self-loop-only node is still a
    // (singleton) community, not a dropped row
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    var lab = nodes.select(col("node"), col("node").as("community"))
      .localCheckpoint(false)
    (1 to iterations).foreach { _ =>
      val votes = nbrs
        .join(lab.select(col("node").as("nbr"), col("community")), "nbr")
        .groupBy("node", "community").agg(sum("w").as("vw"))
      val winner = votes
        .withColumn("rn", row_number().over(Window.partitionBy("node")
          .orderBy(col("vw").desc, col("community"))))
        .filter(col("rn") === 1)
        .select(col("node"), col("community").as("next_community"))
      lab = nodes.join(winner, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("next_community"), col("node")).as("community"))
        .localCheckpoint(false)
      lab.count() // sever lineage now, free the prior iterate
    }
    nbrs.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    lab.withColumn("n_members",
      count(lit(1)).over(Window.partitionBy("community")).cast("long"))
  }

  /** k-core decomposition by the synchronous h-operator iteration (Lü,
    * Zhou, Zhang & Stanley 2016, "The H-index of a network node and its
    * relation to degree and coreness") — the degeneracy member of the
    * graph family next to [[labelPropagation]], [[triangleCounts]] and
    * [[connectedComponents]]: c₀(v) = deg(v), and each round replaces
    * every node's value simultaneously with the H-INDEX of its
    * neighbors' previous values (the largest h such that ≥ h neighbors
    * carry value ≥ h). The iterates are proven monotonically
    * non-increasing and convergent to the coreness, so the classic
    * sequential peel (which is order-dependent and inherently serial)
    * is replaced by a fixed number of synchronous rounds every engine
    * replays identically. Emits (node, degree, core) where `core` is
    * the `iterations`-th iterate — equal to the true core number once
    * the iteration has converged (an upper bound before then; the
    * h-index of a multiset is tie-order-invariant, so the round is
    * bit-deterministic without any tie rule doing semantic work).
    *
    * Edges are UNDIRECTED distinct pairs ([[coOrderedParts]] shape);
    * self-loops dropped (a self-edge inflates degree but can never
    * bind a node into a deeper core), so a self-loop-ONLY node has no
    * qualifying edges and is absent from the output — coreness is
    * defined over the simple graph. 100 TB shape: per round ONE
    * equi-join of the value frame to the neighbor list, one rank
    * window partitioned by node, one max aggregate, one left join back
    * — no cartesian, no driver graph state; iterates localCheckpoint
    * like [[pagerankInt]] so the plan stays one-round deep, and the
    * materializing action each round counts CHANGED values so the loop
    * stops at the fixpoint (provably ≡ running all `iterations` rounds
    * — a converged h-iterate is stationary — so the DuckDB oracle
    * still unrolls the full fixed count).
    *
    * FRONTIER iterate (the standard distributed-kcore refinement): a
    * node's h value is a pure function of its NEIGHBORS' values, so a
    * round only needs to recompute nodes with at least one neighbor
    * whose value changed last round — everyone else is provably
    * stationary and keeps its value through the left join. The frontier
    * (changed-node set) comes free from the same materializing action
    * that detects convergence (one aggregate returns total and changed
    * counts together); while the frontier is DENSE (≥ half the nodes,
    * always round 0) the candidate derivation would cost more than it
    * saves, so the round falls back to the full-graph join — two longs
    * of driver state decide, never a collected node set. Output is
    * BIT-IDENTICAL to the full iterate by the stationarity argument
    * (spec'd against a driver model on random graphs), so the oracle
    * is untouched. */
  def kCore(edges: DataFrame, iterations: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(iterations >= 1, "kCore needs at least one iteration")
    val e = edges.select(col("a"), col("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
    // persist the adjacency HASH-PARTITIONED BY NODE: the degree
    // aggregate, every round's h window, and the rank groupBy all
    // cluster on node, so the stored partitioning satisfies their
    // required distribution and no round re-exchanges the 2·|E| frame
    // (the value join's small side is the per-node frame — AQE
    // broadcasts it while it fits and falls back to a shuffle join at
    // billion-node scale, either way preserving the streamed side's
    // partitioning; measured at sf0.1: 1.3 → 0.95 s per round)
    val nbrs = e.select(col("a").as("node"), col("b").as("nbr"))
      .unionByName(e.select(col("b").as("node"), col("a").as("nbr")))
      .repartition(col("node"))
      .persist()
    val degrees = nbrs.groupBy("node")
      .agg(count(lit(1)).cast("long").as("degree"))
    var cur = degrees.select(col("node"), col("degree").as("c"))
      .localCheckpoint(false)
    var round = 0
    var converged = false
    var nNodes = -1L              // learned by round 0's aggregate
    var lastChanged = Long.MaxValue // round 0 recomputes everyone
    var frontier: DataFrame = null
    while (round < iterations && !converged) {
      val dense = nNodes < 0L || lastChanged * 2 >= nNodes
      val scope =
        if (dense) nbrs
        else nbrs.join(
          nbrs.join(frontier.select(col("node").as("nbr")), "nbr")
            .select("node").distinct(), "node")
      val vals = scope
        .join(cur.select(col("node").as("nbr"), col("c")), "nbr")
      // (an aggregate-first h — groupBy (node, c) counts then
      // max(min(c, running_count)) — was measured and REJECTED this
      // round: in early rounds values are degrees, so distinct-(node,c)
      // ≈ degree and the extra hash-aggregate pass costs more than the
      // smaller window sort saves; 10.3 → 11.9 s at sf0.1)
      val h = vals
        .withColumn("rn", row_number().over(Window.partitionBy("node")
          .orderBy(col("c").desc, col("nbr"))).cast("long"))
        .filter(col("c") >= col("rn"))
        .groupBy("node").agg(max("rn").as("h"))
      // a node outside the recompute scope is stationary and keeps c;
      // inside the scope every node has >= 1 neighbor of value >= 1,
      // so the coalesce is the frontier keep-rule, not a zero floor
      val next = cur.join(h, Seq("node"), "left")
        .select(col("node"), col("c").as("c_prev"),
          coalesce(col("h"), col("c")).as("c"))
        .localCheckpoint(false)
      // ONE action serves convergence, frontier density, and lineage
      val stats = next.agg(
        count(lit(1)).cast("long"),
        sum(when(col("c") =!= col("c_prev"), 1L).otherwise(0L))).head()
      nNodes = stats.getLong(0)
      lastChanged = if (stats.isNullAt(1)) 0L else stats.getLong(1)
      converged = lastChanged == 0L
      frontier = next.filter(col("c") =!= col("c_prev")).select("node")
      cur = next.select("node", "c")
      round += 1
    }
    val out = degrees.join(cur, "node")
      .select(col("node"), col("degree"), col("c").as("core"))
      .localCheckpoint(true)
    nbrs.unpersist(blocking = false)
    out
  }

  /** Per-user event-chain edges at EVENT granularity: each event links to
    * the user's next event (same (ts, id) order and null filter as
    * [[eventTransitions]]), weight 1. Unlike the type-level graph — where
    * every type re-occurs as a source and nothing dangles — every user's
    * terminal event is a CERTIFIED dangling sink here (it has no
    * out-edge by construction), which is exactly what
    * [[pagerankInt]]'s `redistributeDangling` variant needs a graph to
    * exercise: without redistribution ~|users|/|events| of the damped
    * mass drains per iteration; with it, total mass is conserved up to
    * integer truncation (spec'd both ways). */
  def eventChainEdges(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    events
      .filter(col("user_id").isNotNull && col("event_type").isNotNull &&
        col("ts_us").isNotNull)
      .withColumn("__next", lead(col("event_id"), 1).over(
        Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))))
      .filter(col("__next").isNotNull)
      .select(col("event_id").as("src"), col("__next").as("dst"),
        lit(1L).as("m"))
  }

  /** Undirected distinct-edge co-occurrence graph over parts: two parts
    * are adjacent iff some order contains both (a < b canonical). The
    * classic market-basket projection, built WITHOUT a self-join: one
    * shuffle groups each order into its sorted part set, two chained
    * generators emit exactly the ordered pairs (slice from i+2 — no
    * overgenerate-then-filter), one dedup. 100 TB note: the group-by
    * fan-in is items-per-order (≤7 here, bounded by basket size on any
    * retail-shaped corpus), so the collected arrays stay tiny and the
    * skew-prone hot-part keys only appear AFTER the pair dedup. */
  /** One grouped scan: each order's sorted distinct part set — the frame
    * every basket-family consumer (pairs, per-part counts, totals)
    * derives from. */
  private[ops] def orderPartSets(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_orderkey").as("o"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))

  /** Ordered co-order pairs from the part-set arrays: two chained
    * generators emit exactly the a < b pairs (slice from i+2 — no
    * overgenerate-then-filter). */
  private[ops] def orderedPairs(sets: DataFrame): DataFrame =
    sets
      .select(col("ps"), posexplode(col("ps")).as(Seq("i", "a")))
      .select(col("a"), explode(expr("slice(ps, i + 2, size(ps))")).as("b"))

  def coOrderedParts(lineitem: DataFrame): DataFrame =
    orderedPairs(orderPartSets(lineitem)).distinct()

  /** Association scores over the same co-order projection: for every
    * part pair sharing at least `minSupport` orders, the lift
    * n·c(a,b) / (c(a)·c(b)) — the observed-vs-independent co-occurrence
    * ratio that ranks market-basket rules. All counts are exact integers
    * (distinct orders), so the one double division at the end is
    * bit-exact in any engine. 100 TB shape: the pair-count aggregate
    * shuffles the generator stream (bounded by basket² per order); the
    * support filter runs BEFORE the enrichment joins, so only the
    * surviving pairs (a tiny fraction) join the broadcast per-part
    * counts; the total-order count is the one documented bounded scalar
    * cross join. */
  def basketLift(lineitem: DataFrame, minSupport: Long = 2L): DataFrame = {
    require(minSupport >= 1L,
      s"basketLift: minSupport=$minSupport must be >= 1 (0 would divide by unjoined parts)")
    // deliberately NOT a shared persisted scan: materializing the
    // order-set arrays costs more than the work it saves (measured —
    // the per-part and total counts are a cheap distinct over the
    // two-column projection, fully pipelined, and AQE's ReuseExchange
    // dedupes the identical broadcast builds at execution)
    val op = lineitem
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val pairCounts = orderedPairs(orderPartSets(lineitem))
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    val partCounts = op.groupBy("p").agg(count(lit(1)).as("n_p"))
    val total = op.agg(countDistinct(col("o")).as("n_orders"))
    pairCounts
      .join(broadcast(partCounts.select(col("p").as("a"), col("n_p").as("n_a"))), "a")
      .join(broadcast(partCounts.select(col("p").as("b"), col("n_p").as("n_b"))), "b")
      .crossJoin(broadcast(total))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        ((col("n_orders") * col("n_ab")).cast("double") / (col("n_a") * col("n_b")))
          .as("lift"))
  }

  /** Directional association rules from the same counts: confidence
    * P(consequent | antecedent) = c(a,b) / c(antecedent) — the
    * asymmetric companion of [[basketLift]] (lift cannot tell which way
    * a rule points; confidence can). Each surviving pair emits BOTH
    * directions; the one double division divides two exact
    * distinct-order counts. */
  def basketConfidence(lineitem: DataFrame, minSupport: Long = 2L): DataFrame = {
    require(minSupport >= 1L,
      s"basketConfidence: minSupport=$minSupport must be >= 1")
    val op = lineitem
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val pairCounts = orderedPairs(orderPartSets(lineitem))
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    val partCounts = op.groupBy("p").agg(count(lit(1)).as("n_p"))
    val directed = pairCounts
      .select(col("a").as("ante"), col("b").as("cons"), col("n_ab"))
      .unionByName(pairCounts
        .select(col("b").as("ante"), col("a").as("cons"), col("n_ab")))
    directed
      .join(broadcast(partCounts.select(col("p").as("ante"), col("n_p").as("n_ante"))),
        "ante")
      .select(col("ante"), col("cons"), col("n_ab"), col("n_ante"),
        (col("n_ab").cast("double") / col("n_ante")).as("confidence"))
  }

  /** Per-node triangle counts by degree-ordered wedge closure (the
    * node-iterator / compact-forward algorithm): orient every undirected
    * edge toward its higher-(degree, id) endpoint — the resulting DAG has
    * max out-degree O(√m) on any graph — enumerate wedges as a
    * self-equi-join of the oriented edges on their source, and close each
    * wedge with one more equi-join probing the oriented edge set. Every
    * triangle is found exactly once (its lowest-ordered vertex is the
    * wedge pivot), so the counts are exact integers and the DuckDB oracle
    * can enumerate by plain id-order instead — same set, no degree logic.
    *
    * 100 TB shape: degrees are one aggregate; the orientation is a
    * per-row expression after two broadcast-or-shuffle equi-joins of the
    * (node, deg) frame; the wedge join shuffles on the pivot, whose
    * fan-out the orientation bounds (a hot celebrity node of degree d
    * contributes wedges from its LOW-degree neighbors, not d² of its
    * own); the closure join shuffles on (v, w). No cartesian, no driver
    * state. Ids must be non-negative and < 2^40 so (deg, id) packs into
    * one monotone long — violations raise, never wrap; the domain is
    * validated inside the degree scan (every endpoint passes it anyway),
    * never per row in the wedge-key arithmetic, which is the hot path.
    *
    * The closure-probe strategy is chosen BY DATA, not by caller
    * knowledge: the deduped oriented edge list is counted (one cheap
    * aggregate that also materializes its cache) and broadcast only
    * while it stays under `broadcastMaxEdges` rows (~24 B/row, so the
    * 8M default is ≈200 MB of build side — executor-memory scale);
    * past the ceiling both wedge expansion and closure fall back to
    * shuffle equi-joins with identical semantics. The result is
    * eagerly materialized (it is node-count-bounded and tiny next to
    * the wedge stream) so the oriented cache can be unpersisted before
    * returning — no slow leak across repeated calls in a long session. */
  def triangleCounts(edges: DataFrame,
                     broadcastMaxEdges: Long = 8000000L): DataFrame = {
    val (counts, oriented) = triangleCountsPlan(edges, broadcastMaxEdges)
    val out = counts.localCheckpoint(true)
    oriented.unpersist()
    out
  }

  /** The lazy planning half of [[triangleCounts]] — exposed package-
    * private so specs can assert the chosen plan SHAPE on either side
    * of the broadcast ceiling. Returns (counts, the persisted oriented
    * frame the caller must unpersist). */
  private[graft] def triangleCountsPlan(
      edges: DataFrame, broadcastMaxEdges: Long): (DataFrame, DataFrame) = {
    // id-domain guard moved OUT of the wedge-key hot path (where the
    // branch ran ~6× per edge across the three oriented-projection
    // columns) and INTO the degree scan, which reads every endpoint
    // anyway: each id is validated exactly twice per edge inside an
    // already-running pass — same loud failure, zero extra jobs. (An
    // eager min/max pre-aggregate was measured first and RETIRED: its
    // separate O(m) job cost ~0.6 s at sf0.1, more than the codegen'd
    // guard branch it replaced — interleaved A/B in one JVM, 4 rounds.)
    val checkedId = (c: Column) =>
      when(c < 0L || c >= (1L << 40),
        raise_error(concat(lit("triangleCounts: id out of [0, 2^40): "), c.cast("string"))))
        .otherwise(c)
    val deg = edges.select(checkedId(col("a")).as("node"))
      .union(edges.select(checkedId(col("b")).as("node")))
      .groupBy("node").agg(count(lit(1)).cast("long").as("deg"))
    val key = (d: Column, id: Column) => d * (1L << 40) + id
    // persisted: consumed three times (both wedge sides + the closure
    // build); without it the deg joins re-run per consumer
    val oriented = edges
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(
        when(key(col("da"), col("a")) < key(col("db"), col("b")), col("a"))
          .otherwise(col("b")).as("u"),
        when(key(col("da"), col("a")) < key(col("db"), col("b")), col("b"))
          .otherwise(col("a")).as("v"),
        greatest(key(col("da"), col("a")), key(col("db"), col("b"))).as("kv"))
      .persist()
    // both build sides below are the DEDUPED edge projection — orders of
    // magnitude smaller than the wedge stream flowing between them — so
    // while it fits, broadcast it and the whole hot path fuses into ONE
    // codegen stage with no exchange of the intermediate: scan oriented →
    // hash-expand wedges on the pivot → hash-probe the closure on (v, w)
    // → explode corners → partial count. The count below sizes the build
    // side AND materializes the persist in the same pass; past the
    // ceiling, shuffle joins on the pivot and on (v, w) — same
    // semantics, two more wedge-sized exchanges.
    val edgeCount = oriented.count()
    val maybeBcast = (df: DataFrame) =>
      if (edgeCount <= broadcastMaxEdges) broadcast(df) else df
    // wedge generation from per-pivot sorted adjacency ARRAYS instead of
    // a self-join: one shuffle of the edge list builds the arrays, then
    // two chained generators emit exactly the ordered out-neighbor pairs
    // (slice from i+2 on the kv-sorted array) — no outdeg² overgenerate-
    // then-filter, no join machinery in the hottest loop
    val adj = oriented.groupBy(col("u"))
      .agg(sort_array(collect_list(struct(col("kv"), col("v")))).as("nbrs"))
    val wedges = adj
      .select(col("u").as("t1"), col("nbrs"),
        posexplode(col("nbrs")).as(Seq("i", "x")))
      .select(col("t1"), col("x.v").as("t2"),
        explode(expr("slice(nbrs, i + 2, size(nbrs))")).as("y"))
      .select(col("t1"), col("t2"), col("y.v").as("t3"))
    val closure = oriented.select(col("u").as("t2"), col("v").as("t3"))
    val triangles = wedges.join(maybeBcast(closure), Seq("t2", "t3"))
    // ONE pass over the triangle stream: explode the three corners —
    // a 3-way union would recompute the wedge pipeline per branch
    val counts = triangles
      .select(explode(array(col("t1"), col("t2"), col("t3"))).as("part"))
      .groupBy("part").agg(count(lit(1)).as("n_tri"))
    (counts, oriented)
  }

  /** Damped PageRank over a weighted edge list in EXACT integer
    * arithmetic — the weighted, damped member of the graph family next
    * to [[connectedComponents]]'s unweighted closure. Ranks live in
    * integer `scale`-units and every update is integer division, so a
    * fixed iteration count is bit-deterministic and ENGINE-PORTABLE: the
    * DuckDB oracle unrolls the same five iterations in SQL and
    * hash-matches (no floating-point accumulation order anywhere).
    *
    * Update rule per node v:
    *   r'(v) = (scale·(dampDen−dampNum)) div (dampDen·n)
    *         + (dampNum · Σ_{(u,v,m)∈E} contrib(u, m)) div dampDen
    * with the per-edge term computed overflow-free as
    *   contrib = (r(u) div w(u))·m + ((r(u) mod w(u))·m) div w(u)
    * (= floor(r·m/w) exactly: r·m alone can pass 2^63 once scale·maxDeg
    * does, while both summands here stay ≤ scale and w², and Σ contrib
    * over ALL edges is ≤ scale because each node distributes at most its
    * own rank). Dangling nodes (no out-edges) leak their damped mass in
    * the default simple variant; `redistributeDangling = true` instead
    * spreads each iteration's dangling mass D uniformly — every node's
    * contribution gains the scalar `D div n` before damping. D is read
    * by the SAME one-row aggregate that materializes each iterate
    * (bounded driver state — one long, the kCore frontier-stats
    * pattern) and folded into the next update as a literal, so the
    * recurrence stays integer-exact and engine-portable (the oracle
    * computes the same scalar per unrolled iteration). On a graph with
    * no dangling nodes D = 0 every iteration and the two variants are
    * bit-identical (spec'd).
    *
    * 100 TB shape: per iteration one equi-join of ranks to edges, one
    * aggregate, one left join back to nodes — no cartesian, no driver
    * graph state (the driver holds three scalars: n, the loop counter,
    * and the dangling mass); iterates are lazily `localCheckpoint`ed
    * like connectedComponents so the plan stays one-round deep. */
  def pagerankInt(edges: DataFrame, iterations: Int = 5,
                  scale: Long = 1000000000000L,
                  dampNum: Long = 85, dampDen: Long = 100,
                  redistributeDangling: Boolean = false): DataFrame = {
    require(iterations >= 1, "pagerankInt needs at least one iteration")
    require(dampNum >= 0 && dampNum <= dampDen && dampDen > 0,
      s"damping $dampNum/$dampDen out of [0,1]")
    val e = edges
      .select(col("src"), col("dst"), col("m").cast("long").as("m"))
      .filter(col("src").isNotNull && col("dst").isNotNull && col("m") > 0)
    val outw = e.groupBy("src").agg(sum("m").as("w"))
    val ew = e.join(outw, "src").persist()
    // dangling-ness is TOPOLOGY, not rank: carried as ONE boolean column
    // on the persisted node frame (left join against the distinct
    // out-edge sources), so each iteration's dangling-mass scalar is a
    // plain conditional sum over the rank frame that the materializing
    // action computes anyway. The old shape instead semi-joined the rank
    // frame against a separate dangling-node set, aggregated, and
    // broadcast-crossed the 1-row result back in — a broadcast build plus
    // two joins per iteration. The scalar now crosses iterations as a
    // DRIVER LONG (the kCore frontier-stats pattern: bounded driver
    // state, never a collected frame) and is folded into the update
    // expression as a literal — `dsum DIV n` precomputed with Long
    // division, identical floor semantics on the non-negative mass.
    val nodesBase = ew.select(col("src").as("node"))
      .union(ew.select(col("dst").as("node"))).distinct()
    // the simple variant never reads the flag: keep its node frame (and
    // per-iteration action) byte-identical to the flag-free shape
    val nodes = (if (redistributeDangling)
      nodesBase
        .join(ew.select(col("src").as("node")).distinct()
          .withColumn("__has_out", lit(true)), Seq("node"), "left")
        .select(col("node"),
          coalesce(col("__has_out"), lit(false)).as("has_out"))
    else nodesBase).persist()
    val (n, nDang) = if (redistributeDangling) {
      val cnt0 = nodes.agg(
        count(lit(1)).cast("long").as("n"),
        coalesce(sum(when(!col("has_out"), 1L).otherwise(0L)), lit(0L))
          .cast("long").as("n_dang")).head()
      (cnt0.getLong(0), cnt0.getLong(1))
    } else (nodes.count(), 0L)
    require(n > 0, "pagerankInt: empty graph")
    val base = (scale * (dampDen - dampNum)) / (dampDen * n)
    val rCols: Seq[Column] =
      if (redistributeDangling) Seq(col("node"), col("has_out"))
      else Seq(col("node"))
    var r = nodes.select(rCols :+ lit(scale / n).as("r"): _*)
      .localCheckpoint(false)
    // iteration i redistributes Σ r_{i-1} over dangling nodes; r_0 is
    // uniform at scale/n, so the first scalar costs no job at all
    var dsum: Long = nDang * (scale / n)
    (1 to iterations).foreach { _ =>
      val contrib = r.join(ew, col("node") === col("src"))
        .select(col("dst"),
          expr("(r DIV w) * m + ((r % w) * m) DIV w").as("c"))
        .groupBy(col("dst").as("node")).agg(sum("c").as("contrib"))
      val withContrib = nodes.join(contrib, Seq("node"), "left")
      r = (if (!redistributeDangling) {
        withContrib.select(col("node"), (lit(base) +
          expr(s"($dampNum * coalesce(contrib, CAST(0 AS BIGINT))) DIV $dampDen")).as("r"))
      } else {
        val dd = dsum / n // non-negative mass: / is the same floor as DIV
        withContrib.select(col("node"), col("has_out"), (lit(base) +
          expr(s"($dampNum * (coalesce(contrib, CAST(0 AS BIGINT)) + $dd)) DIV $dampDen")).as("r"))
      }).localCheckpoint(false)
      if (redistributeDangling) {
        // ONE action materializes the iterate (severs lineage, frees the
        // prior one) AND reads the next iteration's dangling scalar
        dsum = r.agg(coalesce(sum(when(!col("has_out"), col("r"))), lit(0L))
          .cast("long").as("dsum")).head().getLong(0)
      } else {
        r.count() // materialize: sever lineage NOW, free the prior iterate
      }
    }
    ew.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    r.select(col("node"), col("r").as("rank_q"),
      (col("r").cast("double") / lit(scale)).as("rank"))
  }
}
