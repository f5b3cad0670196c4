package graft

import org.apache.spark.sql.functions._

/** Plan contracts: the scale properties the code comments promise must be
  * visible in the executed plans, or a refactor silently regressed them. */
class PlanContractSpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString

  test("hot-path classify joins the dim by broadcast, never sort-merge") {
    val p = plan("q_classify")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected sort-merge join in:\n$p")
  }

  test("pricing summary pushes the shipdate filter into the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"shipdate filter not pushed in:\n$p")
  }

  test("q6 pushes every predicate to the scan and prunes to the 4 needed columns") {
    // the scan node caps each metadata value (PushedFilters, ReadSchema)
    // at 100 chars in the plan string — raise it so every pushed
    // predicate is assertable
    spark.conf.set("spark.sql.maxMetadataStringLength", 1000)
    val p = try plan("q6_revenue_change")
      finally spark.conf.unset("spark.sql.maxMetadataStringLength")
    // all four predicates must reach the parquet reader (row-group skipping)
    Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.04)", "LessThanOrEqual(l_discount,0.06)",
        "LessThan(l_quantity,24.0)").foreach { f =>
      assert(p.contains(f), s"predicate $f not pushed in:\n$p")
    }
    // and the scan must read only the referenced columns, not the row
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    Seq("l_shipdate", "l_discount", "l_quantity", "l_extendedprice").foreach { c =>
      assert(read.contains(c), s"$c missing from ReadSchema: $read")
    }
    Seq("l_orderkey", "l_partkey", "l_returnflag").foreach { c =>
      assert(!read.contains(c), s"$c should be pruned from ReadSchema: $read")
    }
  }

  test("classify prunes unused columns from the events scan") {
    val p = plan("q_classify")
    assert(!p.contains("user_id"), s"user_id should be pruned from:\n$p")
  }

  test("top-N recent compiles to TakeOrdered, not a global sort") {
    val p = plan("q_topn_recent")
    assert(p.contains("TakeOrderedAndProject"), s"expected TakeOrdered in:\n$p")
  }

  test("shingle projection stays inside whole-stage codegen") {
    // WordShingles generates a static kernel call — if a refactor breaks
    // its doGenCode, the Generate drops out of codegen ('Generate' loses
    // its '*(n)' prefix) and the dedup family pays interpreted eval again
    val p = plan("dedup_jaccard")
    val generateLines = p.linesIterator.filter(_.contains("Generate explode")).toSeq
    assert(generateLines.nonEmpty, s"no explode in:\n$p")
    assert(generateLines.forall(_.trim.matches("""^[+:\-\s]*\*\(\d+\) Generate explode.*""")),
      s"shingle Generate not codegen'd:\n${generateLines.mkString("\n")}")
  }

  test("near-dup operators have no cartesian product") {
    Seq("dedup_jaccard", "dedup_minhash", "dedup_simhash", "dedup_embedding",
        "dedup_embedding_lsh", "text_decontaminate").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join:\n$p")
    }
  }

  test("split census never reads the text column") {
    // the split keys off doc_id alone; at 100 TB reading `text` for a
    // census would be the dominant IO cost of the whole query
    val p = plan("q_split_census")
    assert(!p.contains("text"), s"text should be pruned from the documents scan:\n$p")
  }

  test("multimodal DSP projection stays inside whole-stage codegen") {
    // PcmStats/ByteChannelStats implement doGenCode; if a refactor breaks
    // it, the Project drops out of codegen (loses its '*(n)' prefix) and
    // the feature pass pays interpreted eval per row. The operator output
    // is inspected directly (no presentation sort) so the plan has no AQE
    // wrapper deferring codegen collapse.
    val df = graft.ops.Multimodal.extractFeatures(
      graft.ops.Multimodal.mediaFrame(Tables.documents(spark, "/root/testdata/sf0.001")))
    val p = df.queryExecution.executedPlan.toString
    val dspLines = p.linesIterator
      .filter(l => l.contains("graft_pcm_stats") || l.contains("graft_byte_channel_stats"))
      .toSeq
    assert(dspLines.nonEmpty, s"no DSP projection found in:\n$p")
    assert(dspLines.forall(_.trim.matches("""^[+:\-\s]*\*\(\d+\) Project.*""")),
      s"DSP Project not codegen'd:\n${dspLines.mkString("\n")}")
  }

  test("as-of attribution is the union+window plan: one exchange, zero joins") {
    val p = plan("q_asof_attribution")
    Seq("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct", "BroadcastNestedLoopJoin")
      .foreach(j => assert(!p.contains(j), s"as-of must not contain $j:\n$p"))
    // one shuffle on the key (the final orderBy adds a range exchange for
    // presentation; the JOIN itself costs exactly the hashpartitioning one)
    val hashExchanges = p.linesIterator
      .count(l => l.trim.matches("""^[+:\-\s]*Exchange hashpartitioning.*"""))
    assert(hashExchanges === 1, s"expected exactly 1 hash exchange, got $hashExchanges:\n$p")
  }

  test("nearest view is the single-pass union+window plan: one exchange, zero joins") {
    // both directions (backward last, forward first) ride ONE key
    // partitioning — the second window adds only an in-partition re-sort
    val p = plan("q_nearest_view")
    Seq("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct", "BroadcastNestedLoopJoin")
      .foreach(j => assert(!p.contains(j), s"nearest must not contain $j:\n$p"))
    val hashExchanges = p.linesIterator
      .count(l => l.trim.matches("""^[+:\-\s]*Exchange hashpartitioning.*"""))
    assert(hashExchanges === 1, s"expected exactly 1 hash exchange, got $hashExchanges:\n$p")
  }

  test("range-session attribution joins by equi-key in both guard branches") {
    val p = plan("q_range_sessions")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to a non-equi join:\n$p")
  }

  test("correlated subqueries decorrelate to equi-joins, never cartesians") {
    // Q17: the correlated scalar avg must materialize once and equi-join
    // back on p_partkey; Q21: EXISTS/NOT EXISTS become semi/anti joins on
    // l_orderkey. A per-outer-row re-evaluation would surface as a
    // cartesian or nested-loop join.
    Seq("q17_small_qty_revenue", "q21_late_suppliers").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join:\n$p")
    }
    // the EXISTS/NOT EXISTS pair must actually be semi/anti joins
    val p21 = plan("q21_late_suppliers")
    assert(p21.contains("LeftSemi"), s"q21 lost its semi join:\n$p21")
    assert(p21.contains("LeftAnti"), s"q21 lost its anti join:\n$p21")
  }

  test("q18/q19/q22 subquery and disjunction shapes stay cartesian-free") {
    Seq("q18_large_orders", "q19_branded_revenue", "q22_dormant_balances",
        "q7_bilateral_trade").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join:\n$p")
    }
    // Q18's IN-over-grouped-HAVING must become a semi join against ONE
    // pre-aggregation, not a re-aggregation per outer row
    val p18 = plan("q18_large_orders")
    assert(p18.contains("LeftSemi"), s"q18 lost its semi join:\n$p18")
    // Q22's NOT EXISTS must be an anti join; the scalar avg is a separate
    // one-row subquery, never a join blow-up
    val p22 = plan("q22_dormant_balances")
    assert(p22.contains("LeftAnti"), s"q22 lost its anti join:\n$p22")
    // Q19: the equi-key must survive CNF extraction — a disjunction that
    // swallowed the join key would plan as a nested loop (asserted absent
    // above); the join must also not degrade to sort-merge given part is
    // broadcast-able at every SF the suite runs
    val p19 = plan("q19_branded_revenue")
    assert(p19.contains("BroadcastHashJoin") || p19.contains("ShuffledHashJoin"),
      s"q19 lost its hash equi-join:\n$p19")
    // Q7: both nation arms must be broadcasts — a 25-row dim that plans as
    // a shuffle join would shuffle the whole fact twice for nothing
    val p7 = plan("q7_bilateral_trade")
    assert(p7.split("BroadcastHashJoin").length - 1 >= 2,
      s"q7 lost a broadcast nation arm:\n$p7")
    // the CTE form of Q18 exists to run ONE lineitem aggregation: exactly
    // one lineitem scan in the plan (the IN form has three — outer + two
    // duplicated semi-probe aggregations, Catalyst's decorrelation artifact)
    val p18cte = plan("q18_large_orders_cte")
    assert(p18cte.split("lineitem.parquet").length - 1 === 1,
      s"q18 CTE form must scan lineitem once:\n$p18cte")
  }

  test("q2/q4/q11/q15/q20 subquery shapes stay cartesian-free and keep their join kinds") {
    Seq("q2_min_cost_supplier", "q4_late_priority", "q11_important_parts",
        "q15_top_supplier", "q20_volume_suppliers", "q8_market_share",
        "q9_product_profit", "q10_returned_items").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join:\n$p")
    }
    // Q4's correlated EXISTS (with the outer-date predicate in the
    // correlation) must become a semi join on the order key
    val p4 = plan("q4_late_priority")
    assert(p4.contains("LeftSemi"), s"q4 lost its semi join:\n$p4")
    // Q20's IN must be a semi join; its correlated per-part threshold is a
    // grouped aggregate equi-joined on partkey (no per-row re-aggregation,
    // asserted cartesian-free above)
    val p20 = plan("q20_volume_suppliers")
    assert(p20.contains("LeftSemi"), s"q20 lost its semi join:\n$p20")
    // Q10's global top-20 must be TakeOrdered (per-partition heaps), never
    // a full sort of the grouped frame
    val p10 = plan("q10_returned_items")
    assert(p10.contains("TakeOrderedAndProject"), s"q10 lost TakeOrdered:\n$p10")
    // Q8: the one-pass conditional-aggregation share means exactly ONE
    // lineitem scan — a numerator/denominator self-join would show two
    val p8 = plan("q8_market_share")
    assert(p8.split("lineitem.parquet").length - 1 === 1,
      s"q8 must scan lineitem once:\n$p8")
    // the production CTE forms exist to run ONE base aggregation: exactly
    // one lineitem scan each, vs the IN forms' duplicated decorrelation
    // trees (same contract as q18_large_orders_cte)
    Seq("q2_min_cost_supplier_cte", "q20_volume_suppliers_cte").foreach { q =>
      val p = plan(q)
      assert(p.split("lineitem.parquet").length - 1 === 1,
        s"$q must scan lineitem once:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q has a non-equi join:\n$p")
    }
  }

  test("round-9 llm entries stay equi-join-only (no cartesian, no nested loop)") {
    // dedup_incremental_lsh: band-signature equi-join candidates + shingle
    // equi-join verify; sim_label_affinity: pos equi-join over bounded
    // label×dim frames; dedup_source_*: pair-to-dim equi-joins; text_tfidf:
    // token equi-join (N is a driver scalar, never a cross join)
    Seq("dedup_incremental_lsh", "sim_label_affinity", "dedup_source_matrix",
        "dedup_source_rate", "text_tfidf").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join:\n$p")
    }
    // top-shingles must be TakeOrdered over the df aggregate, not a full
    // sort of the shingle universe
    val pts = plan("text_top_shingles")
    assert(pts.contains("TakeOrderedAndProject"), s"top-shingles lost TakeOrdered:\n$pts")
  }

  test("interpolation resample is the union+window plan: no fact-grid join in the interp pass") {
    val p = plan("q_resample_interp")
    // the interpolation itself must be windows over ONE union — the only
    // join allowed is the grid constructor (keys × hours, dim-sized);
    // a fact-vs-grid join (the naive per-bucket lookup) must not appear
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"interp resample degenerated to a fact join:\n$p")
    assert(p.contains("Window"), s"expected window operators:\n$p")
    assert(p.contains("Union"), s"expected the grid+obs union:\n$p")
  }

  test("funnel is one hash exchange and zero joins — never the n-self-join cascade") {
    val p = plan("q_funnel")
    assert(!p.contains("Join"), s"funnel must not join:\n$p")
    val hashExchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(hashExchanges === 1, s"expected exactly one hash exchange in:\n$p")
  }

  test("train-ready pipeline shares ONE cached postings scan") {
    val p = plan("text_train_ready")
    // every consumer (jaccard pairing, decontamination) must read the same
    // InMemoryRelation — a second one means the shingling scan is paid twice
    val relations = p.linesIterator.filter(_.trim.matches("""^[+:\-\s]*InMemoryRelation.*""")).toSeq
    assert(relations.nonEmpty, s"expected a cached postings relation in:\n$p")
    // InMemoryRelation lines repeat once per consumer in the plan STRING
    // with fresh attribute ids; after normalizing ids they must all be the
    // same [doc_id, shingle, scope] postings cache
    assert(relations.map(_.replaceAll("""#\d+""", "").replaceAll("""^[+:\-\s]*""", ""))
        .distinct.size === 1,
      s"more than one distinct cache in train-ready:\n${relations.mkString("\n")}")
  }

  test("the late-round-9 entries stay equi-join-only; unigram's one cross join is the broadcast scalar") {
    // pagerank: rank-to-edge equi-joins per iteration; rollup merge: a
    // union + re-aggregate, no join of facts; scd2: one window pair, no
    // join at all
    // triangles: every join keys on an equi column (order, pivot, (v,w));
    // the < conditions ride along as post-join filters, never a loop
    Seq("graph_pagerank", "graph_pagerank_dangling", "graph_triangles",
        "q_rollup_increment", "q_scd2_intervals").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join:\n$p")
    }
    // unigram's corpus total N is a ONE-ROW aggregate broadcast-crossed
    // into the per-token projection (the IVF-centroid exception shape);
    // anything beyond that single bounded cross join is a regression
    val pu = plan("text_unigram_lp")
    assert(!pu.contains("CartesianProduct"), s"unigram has an unplanned cartesian:\n$pu")
    val bnlj = pu.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj === 1, s"unigram must have exactly the one broadcast scalar cross join, found $bnlj:\n$pu")
    // bigram inherits the shape: the one-row V vocab is the only cross
    // join; pair/prefix enrichments and the totality join stay equi-joins
    val pb = plan("text_bigram_lp")
    assert(!pb.contains("CartesianProduct"), s"bigram has an unplanned cartesian:\n$pb")
    assert(pb.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) === 1,
      s"bigram must have exactly the one broadcast scalar cross join:\n$pb")
    // basket lift has the same shape: two broadcast-hash part-count
    // enrichments plus exactly the one n_orders scalar cross join
    val pbl = plan("q_basket_lift")
    assert(!pbl.contains("CartesianProduct"), s"basket lift has a cartesian:\n$pbl")
    assert(pbl.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) === 1,
      s"basket lift must have exactly the one scalar cross join:\n$pbl")
    assert(pbl.contains("BroadcastHashJoin"),
      s"the part-count enrichments should broadcast:\n$pbl")
    // PQ: every join in the serving path is an equi-join (codebook assign
    // on sub, ADC on (sub, code), rerank on ids) — broadcast-hashed, never
    // nested-loop; quality thinning is pure per-row — NO join at all
    val ppq = plan("sim_topk_pq")
    assert(!ppq.contains("CartesianProduct") && !ppq.contains("BroadcastNestedLoopJoin"),
      s"PQ serving path lost its equi-join-only shape:\n$ppq")
    // ivfpq additionally pays assignCells' bounded centroid passes — the
    // documented broadcast-tiny cross joins (≤k centroid rows); every
    // BNLJ in the plan must be that Cross shape and nothing else
    val pivfpq = plan("sim_topk_ivfpq")
    assert(!pivfpq.contains("CartesianProduct"),
      s"ivfpq has an unplanned cartesian:\n$pivfpq")
    val badBnlj = pivfpq.linesIterator
      .filter(_.contains("BroadcastNestedLoopJoin")).filterNot(_.contains("Cross"))
    assert(badBnlj.isEmpty,
      s"ivfpq has a non-centroid nested-loop join:\n${badBnlj.mkString("\n")}")
    val pqt = plan("q_quality_thin")
    assert(!pqt.contains("Join"), s"quality thinning must stay join-free per-row:\n$pqt")
  }

  test("the session-4 statistics entries stay equi-join-only with bounded scalar crosses") {
    // bootstrap: the reference-level and band frames broadcast; cusum:
    // one one-row reference cross; MAD: two broadcast median joins;
    // transition probs: window-only (no join at all); heavy tokens: the
    // exact pass is a single aggregate over an isin-filtered scan
    Seq("q_bootstrap_ci", "q_cusum_drift", "q_value_mad",
        "graph_transition_probs", "q_heavy_tokens").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian:\n$p")
      val badBnlj = p.linesIterator
        .filter(_.contains("BroadcastNestedLoopJoin")).filterNot(_.contains("Cross"))
      assert(badBnlj.isEmpty,
        s"$q has a non-scalar nested-loop join:\n${badBnlj.mkString("\n")}")
      assert(!p.contains("SortMergeJoin"),
        s"$q should never sort-merge (all build sides are tiny):\n$p")
    }
    val ptp = plan("graph_transition_probs")
    assert(!ptp.contains("Join"), s"transition probs must stay window-only:\n$ptp")
    // correlation is ONE aggregate — no join, no window, no second pass
    val pc = plan("q_value_hour_corr")
    assert(!pc.contains("Join") && !pc.contains("Window"),
      s"correlation must stay a single aggregate:\n$pc")
    // equi-depth: the edge/cumulative join is an equi-join on
    // (type, value) — never a loop
    val pb = plan("q_equidepth_bins")
    assert(!pb.contains("CartesianProduct") && !pb.contains("BroadcastNestedLoopJoin"),
      s"equi-depth bins lost the equi-join shape:\n$pb")
  }

  test("the round-10 entries stay equi-join-only; lexical's one cross is the broadcast scalar") {
    // winsorize: one window + one broadcast cuts join; disorder: window
    // then aggregate, no join at all; kfold/length/anonymity: pure
    // aggregates; dup coverage: one equi-join on the shingle key;
    // lexical: postings equi-self-join + the one-row n_docs cross
    Seq("q_value_winsorize", "q_kfold_census", "q_length_buckets",
        "q_anonymity_census", "text_dup_coverage", "sim_lexical_topk").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian:\n$p")
      val badBnlj = p.linesIterator
        .filter(_.contains("BroadcastNestedLoopJoin")).filterNot(_.contains("Cross"))
      assert(badBnlj.isEmpty,
        s"$q has a non-scalar nested-loop join:\n${badBnlj.mkString("\n")}")
    }
    Seq("q_kfold_census", "q_length_buckets", "q_anonymity_census",
        "q_disorder_audit").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join"), s"$q must stay join-free:\n$p")
    }
    // the census entries never read the text column (kfold keys off the
    // id; anonymity keys off lang/source/n_chars) — column pruning at
    // the scan is the 100 TB difference between a metadata pass and a
    // full-corpus read
    Seq("q_kfold_census", "q_anonymity_census").foreach { q =>
      val p = plan(q)
      val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
      assert(!read.contains("text"), s"$q reads text:\n$read")
    }
    // the audit trio: integrity's anti joins and drift/diff's outer
    // joins stay equi-keyed; the only nested loops are the documented
    // one-row scalar crosses
    Seq("q_ref_integrity", "q_snapshot_diff", "q_type_drift").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian:\n$p")
      val badBnlj = p.linesIterator
        .filter(_.contains("BroadcastNestedLoopJoin")).filterNot(_.contains("Cross"))
      assert(badBnlj.isEmpty,
        s"$q has a non-scalar nested-loop join:\n${badBnlj.mkString("\n")}")
    }
  }

  test("a selective dim filter injects a bloom runtime filter into a shuffle join's fact side") {
    // The row-level sibling of dynamic partition pruning (LayoutSpec): when
    // the fact is NOT partitioned by the join key and the join is too big
    // to broadcast, Spark can still build a bloom filter from the filtered
    // dim and apply it on the fact side BEFORE the shuffle — at 100 TB
    // that's the difference between shuffling every fact row and shuffling
    // only candidate matches. The size thresholds exist for real clusters;
    // pinning them down for sf-scale data only makes the rule fire, it
    // does not change the plan shape being contracted.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force the shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dir = "/root/testdata/sf0.001"
      val lineitem = Tables.lineitem(spark, dir)
      val part = Tables.part(spark, dir).filter(col("p_brand") === "Brand#1")
      val joined = lineitem.join(part, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").agg(sum("l_quantity").as("qty"))
      val p = joined.queryExecution.executedPlan.toString
      // the probe renders as might_contain(subquery, xxhash64(l_partkey))
      // in a Filter on the fact side; the build as bloom_filter_agg over
      // the FILTERED dim
      assert(p.contains("might_contain") && p.contains("bloom_filter_agg"),
        s"no bloom runtime filter on the fact side:\n$p")
      assert(p.linesIterator.exists(l =>
        l.contains("might_contain") && l.contains("l_partkey")),
        s"bloom probe not applied to the fact join key:\n$p")
      assert(joined.collect().nonEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("source entropy computes totals by window, never a second corpus scan") {
    val p = plan("text_source_entropy")
    assert(p.contains("Window"), s"per-source totals lost the window form in:\n$p")
    assert(!p.contains("Join"), s"unexpected join in:\n$p")
    assert(p.linesIterator.count(_.contains("documents.parquet")) == 1,
      s"entropy rescanned the corpus:\n$p")
  }

  test("hll certificate is one linear pass: a single events scan, zero joins") {
    val p = plan("q_distinct_hll")
    assert(!p.contains("Join"), s"unexpected join in:\n$p")
    assert(p.linesIterator.count(_.contains("events.parquet")) == 1,
      s"hll rescanned events:\n$p")
    val pk = plan("q_distinct_hll_by_type")
    assert(!pk.contains("Join"), s"unexpected join in the per-key form:\n$pk")
    assert(pk.linesIterator.count(_.contains("events.parquet")) == 1,
      s"per-key hll rescanned events:\n$pk")
  }

  test("cms certificate scans the corpus once and joins only by broadcast") {
    val p = plan("q_heavy_cms")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
    assert(!p.contains("SortMergeJoin"), s"sort-merge crept into the cell join:\n$p")
    // the scoped cache IS the one-scan proof (withScopedCache counts the
    // input eagerly, so every consumer reads the InMemoryRelation); a
    // FileScan line-count would miscount the cached plan's re-renderings
    assert(p.contains("InMemoryTableScan"), s"counts frame lost its cache:\n$p")
  }

  test("dsir scoring joins the bounded ratio table by broadcast only") {
    val p = plan("text_dsir_weights")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
    assert(!p.contains("SortMergeJoin"), s"sort-merge crept into the score join:\n$p")
    assert(p.contains("InMemoryTableScan"), s"feature frame lost its cache:\n$p")
  }

  test("bloom certificate caches the corpus values: one corpus-side scan, broadcast probes") {
    val p = plan("dedup_bloom_prefilter")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
    // the corpus side reads its scoped cache; the probe side scans once
    assert(p.contains("InMemoryTableScan"), s"corpus values lost their cache:\n$p")
  }

  test("bm25 rides the scoped tf cache and never degenerates to a cartesian") {
    val p = plan("sim_bm25_topk")
    assert(p.contains("InMemoryTableScan"), s"tf frame lost its cache:\n$p")
    assert(!p.contains("CartesianProduct"), s"bm25 has a cartesian product:\n$p")
    // the one-row stats scalar is the only nested-loop join allowed
    val nlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(nlj <= 1, s"unexpected nested-loop joins ($nlj):\n$p")
  }

  test("seasonal backtest is one linear events pass: no join, no second scan") {
    val p = plan("q_seasonal_backtest")
    assert(!p.contains("Join"), s"unexpected join in:\n$p")
    assert(p.linesIterator.count(_.contains("events.parquet")) == 1,
      s"backtest rescanned events:\n$p")
  }

  test("source KL computes both totals by window over one corpus scan, never a join") {
    val p = plan("text_source_kl")
    assert(p.contains("Window"), s"windowed totals lost in:\n$p")
    assert(!p.contains("Join"), s"unexpected join in:\n$p")
    assert(p.linesIterator.count(_.contains("documents.parquet")) == 1,
      s"source KL rescanned the corpus:\n$p")
  }

  test("quality calibration scans the corpus once; the sweep joins only the bounded histogram") {
    val p = plan("text_quality_calibration")
    assert(p.linesIterator.count(_.contains("documents.parquet")) == 1,
      s"calibration rescanned the corpus:\n$p")
  }

  test("hourly ACF joins the lag expansion as a hash equi-join over the cached hourly frame") {
    val p = plan("q_series_acf")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"ACF pair join fell back to a loop join:\n$p")
    // both self-join sides must read the scoped cache — the corpus is
    // materialized once, not scanned per side (the raw FileScan strings
    // inside the printed InMemoryRelation definitions don't execute)
    assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
      s"ACF self-join sides not served from the hourly cache:\n$p")
  }

  test("codec header decode stays expression-side with no RDD hop") {
    val p = plan("q_multimodal_codecs")
    assert(!p.contains("ExistingRDD"), s"codec decode dropped to an RDD scan:\n$p")
    assert(p.linesIterator.count(_.contains("documents.parquet")) == 1,
      s"codec decode rescanned the corpus:\n$p")
  }

  /** Capture every plan EXECUTED while `body` runs — iterative operators
    * (pagerank) materialize per round, so the returned frame's own plan
    * shows only the final checkpointed select; the per-iteration shape
    * lives in the plans the actions ran. */
  private def executedPlans(body: => Unit): Seq[String] = {
    val plans = new scala.collection.mutable.ArrayBuffer[String]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try { body; org.apache.spark.sql.graft.Bridge.drainListenerBus(spark) }
    finally spark.listenerManager.unregister(listener)
    plans.synchronized { plans.toSeq }
  }

  test("pagerank iterations are equi-join + aggregate + left join — never a loop join") {
    // the bench-tail contract (VERDICT r11 item 6): the per-iteration
    // recurrence must stay one rank-to-edge equi-join, one aggregate and
    // one left join back to nodes; a cartesian or non-scalar nested loop
    // in ANY executed round is a scale regression the result-frame plan
    // cannot show (iterates are checkpointed)
    val edges = graft.ops.Graph.eventTransitions(
      Tables.events(spark, "/root/testdata/sf0.001"))
    val simple = executedPlans {
      graft.ops.Graph.pagerankInt(edges, iterations = 2).collect()
    }
    assert(simple.nonEmpty)
    simple.foreach { p =>
      assert(!p.contains("CartesianProduct"), s"pagerank iteration has a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"simple pagerank must never nested-loop:\n$p")
    }
    // the iteration plans (the ones that join) carry the left join back
    // to the node universe
    assert(simple.exists(p => p.contains("LeftOuter")),
      s"no iteration plan shows the left join back to nodes:\n${simple.mkString("\n---\n")}")
    // dangling redistribution adds EXACTLY the one-row broadcast cross
    // per iteration — every nested-loop line must be that Cross
    val dangling = executedPlans {
      graft.ops.Graph.pagerankInt(edges, iterations = 2,
        redistributeDangling = true).collect()
    }
    dangling.foreach { p =>
      assert(!p.contains("CartesianProduct"), s"dangling pagerank has a cartesian:\n$p")
      val badBnlj = p.linesIterator
        .filter(_.contains("BroadcastNestedLoopJoin")).filterNot(_.contains("Cross"))
      assert(badBnlj.isEmpty,
        s"dangling pagerank has a non-scalar nested loop:\n${badBnlj.mkString("\n")}")
    }
  }

  test("incremental closure merge stays equi-join-only in every executed round") {
    // the quotient merge must never degenerate: endpoint->root mapping
    // and the label remap are left equi-joins, and the quotient
    // pointer-doubling rounds (captured via the listener — they execute
    // eagerly) are the same equi-join + aggregate shape as the full
    // closure
    import spark.implicits._
    val stored = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L)).toDF("id", "comp")
    val batch = Seq((2L, 10L), (20L, 21L)).toDF("id1", "id2")
    val plans = executedPlans {
      graft.ops.Graph.componentsIncrement(stored, batch).collect()
    }
    assert(plans.nonEmpty)
    plans.foreach { p =>
      assert(!p.contains("CartesianProduct"), s"quotient merge has a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"quotient merge has a nested-loop join:\n$p")
    }
  }

  test("bootstrap CI scans the events corpus exactly once") {
    // B replicates ride ONE explode over ONE scan; a second events scan
    // means some consumer (totals, bands) re-reads the corpus — at 100 TB
    // that doubles the dominant IO cost
    val p = plan("q_bootstrap_ci")
    assert(p.linesIterator.count(_.contains("events.parquet")) == 1,
      s"bootstrap CI must scan events exactly once:\n$p")
  }

  test("incremental LSH probes the stored band table by (band, sig) equi-join") {
    // the stream-static shape: candidates MUST come from a hash equi-join
    // on the band signature — losing the keys to a filter-after-join (or
    // any loop join) turns the nightly increment into batch x seen
    val p = plan("dedup_incremental_lsh")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"incremental LSH lost the equi-join shape:\n$p")
    val bandJoin = p.linesIterator.filter(l =>
      (l.contains("HashJoin") || l.contains("SortMergeJoin")) &&
        l.contains("band") && l.contains("sig")).toSeq
    assert(bandJoin.nonEmpty, s"no (band, sig)-keyed join in:\n$p")
    // one shared shingling pass serves both sides via the scoped cache
    val relations = p.linesIterator
      .filter(_.trim.matches("""^[+:\-\s]*InMemoryRelation.*""")).toSeq
    assert(relations.nonEmpty, s"expected the scoped postings cache in:\n$p")
    assert(relations.map(_.replaceAll("""#\d+""", "").replaceAll("""^[+:\-\s]*""", ""))
      .distinct.size === 1,
      s"more than one distinct cache in incremental LSH:\n${relations.mkString("\n")}")
  }

  test("alerts pipeline joins the threshold dim by broadcast, never sort-merge") {
    val p = plan("q_alerts")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast dim join in:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected sort-merge join in:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"alerts must stay equi-join-only:\n$p")
  }

  test("basket increment merges partials by union + re-aggregate with only the scalar cross") {
    // merge-then-serve must not join fact to fact: the two partials meet
    // in a Union feeding one aggregate; the only nested loop is the
    // n_orders scalar broadcast (the basket-lift shape)
    val p = plan("q_basket_increment")
    assert(p.contains("Union"), s"expected the partials union in:\n$p")
    assert(!p.contains("CartesianProduct"), s"basket increment has a cartesian:\n$p")
    val badBnlj = p.linesIterator
      .filter(_.contains("BroadcastNestedLoopJoin")).filterNot(_.contains("Cross"))
    assert(badBnlj.isEmpty,
      s"basket increment has a non-scalar nested loop:\n${badBnlj.mkString("\n")}")
  }

  test("k-center assignment's only nested loop is the bounded exemplar broadcast") {
    // the corpus-side pass may cross-join ONLY the ≤k broadcast exemplar
    // frame; any other loop join (or a cartesian) is a scale regression
    val p = plan("q_diverse_kcenter_assign")
    assert(!p.contains("CartesianProduct"), s"kcenter assign has a cartesian:\n$p")
    val badBnlj = p.linesIterator
      .filter(_.contains("BroadcastNestedLoopJoin")).filterNot(_.contains("Cross"))
    assert(badBnlj.isEmpty,
      s"kcenter assign has a non-broadcast nested loop:\n${badBnlj.mkString("\n")}")
  }

  test("token budget shares the train-ready chain's single postings cache") {
    val p = plan("text_token_budget")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"token budget lost the equi-join shape:\n$p")
    val relations = p.linesIterator
      .filter(_.trim.matches("""^[+:\-\s]*InMemoryRelation.*""")).toSeq
    assert(relations.nonEmpty, s"expected the shared postings cache in:\n$p")
    assert(relations.map(_.replaceAll("""#\d+""", "").replaceAll("""^[+:\-\s]*""", ""))
      .distinct.size === 1,
      s"more than one distinct cache in token budget:\n${relations.mkString("\n")}")
  }

  test("curation rollup stays equi-join-only over one documents scan family") {
    val p = plan("text_curation")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"curation lost the equi-join shape:\n$p")
    // the postings side must be a single shared cache, not re-shingled
    val relations = p.linesIterator
      .filter(_.trim.matches("""^[+:\-\s]*InMemoryRelation.*""")).toSeq
    assert(relations.map(_.replaceAll("""#\d+""", "").replaceAll("""^[+:\-\s]*""", ""))
      .distinct.size <= 1,
      s"more than one distinct cache in curation:\n${relations.mkString("\n")}")
  }

  test("triangle closure broadcasts under the edge ceiling, shuffles past it, never loops") {
    // the top of the cost tail (7.3 s clean at sf0.1): the wedge-closure
    // probe must stay a hash equi-join in BOTH regimes — broadcast for
    // graphs under the 8M-oriented-edge ceiling (the query entry's shape
    // at every test SF), shuffle past it — and never degrade to a
    // cartesian or nested-loop closure. Duplicated from GraphSpec so the
    // whole top-10 tail fails THIS suite on a shape regression.
    // the entry's returned frame is the checkpointed result — the
    // closure shape lives in the plans EXECUTED while it materializes
    val plans = executedPlans {
      SparkEntry.queries("graph_triangles")(spark, "/root/testdata/sf0.001")
        .collect()
    }
    plans.foreach(p =>
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"triangle closure lost the equi-join shape:\n$p"))
    assert(plans.exists(_.contains("BroadcastHashJoin")),
      s"under-ceiling closure must broadcast the adjacency probe:\n${plans.mkString("\n---\n")}")
    // past the ceiling (forced to 0), the explicit hint is gone and the
    // closure must become a shuffle join — auto-broadcast disabled so
    // the tiny test frame can't convert it back
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s2.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val (counts, oriented) = graft.ops.Graph.triangleCountsPlan(edges, 0L)
    val over = counts.queryExecution.executedPlan.toString
    oriented.unpersist()
    assert(!over.contains("BroadcastHashJoin") &&
      (over.contains("SortMergeJoin") || over.contains("ShuffledHashJoin")),
      s"past the ceiling the closure must shuffle, not broadcast:\n$over")
  }

  test("kmv overlap is three TakeOrdered heads over one cached pass, only scalar crosses") {
    val p = plan("q_distinct_kmv")
    // the three bottom-k sketches are TakeOrdered(256) — never a global sort
    assert("TakeOrderedAndProject\\(limit=256".r.findAllIn(p).size === 3,
      s"expected three bottom-256 heads in:\n$p")
    // one value-grain pass, scope-cached, feeds all of them
    assert(p.contains("InMemoryRelation"), s"per-value flags frame not cached:\n$p")
    assert(!p.contains("CartesianProduct"), s"kmv overlap has a cartesian:\n$p")
    val badBnlj = p.linesIterator
      .filter(_.contains("BroadcastNestedLoopJoin")).filterNot(_.contains("Cross"))
    assert(badBnlj.isEmpty,
      s"kmv overlap has a non-scalar nested loop:\n${badBnlj.mkString("\n")}")
  }

  test("quantile sketch certificate: cached base, equi-joins only, broadcast estimates") {
    val p = plan("q_quantiles_sketch")
    assert(p.contains("InMemoryRelation"), s"corpus projection not cached:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"quantile certificate lost the equi-join shape:\n$p")
    // the 1-row-per-key estimates reach the CDF arm as a broadcast build
    assert(p.contains("BroadcastHashJoin"), s"estimates not broadcast:\n$p")
  }

  test("quality-model training is one broadcast grid fan-out ending in TakeOrdered(1)") {
    val p = plan("text_quality_model")
    assert(p.contains("TakeOrderedAndProject(limit=1"),
      s"argmin must be TakeOrdered(1), not a global sort:\n$p")
    // the hypothesis grid is the broadcast side of the only nested loops
    val badBnlj = p.linesIterator
      .filter(_.contains("BroadcastNestedLoopJoin")).filterNot(_.contains("Cross"))
    assert(badBnlj.isEmpty && !p.contains("CartesianProduct"),
      s"non-broadcast grid fan-out:\n$p")
    // exactly the two feature/label corpus arms — no hidden re-reads
    assert(p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("doc_id")) <= 2,
      s"more than two documents scans:\n$p")
  }

  test("ULM pricing joins the driver-trained word table by broadcast, no corpus lineage") {
    val p = plan("text_ulm_tokens")
    // the model side is a collected bounded artifact (LocalTableScan),
    // so no downstream action can re-trigger training
    assert(p.contains("LocalTableScan"), s"expected the collected word→pieces table:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"pricing join must broadcast the model:\n$p")
  }

  test("portable simhash pairs by the pigeonhole equi-join, never all-pairs") {
    val p = plan("dedup_simhash_md5")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"simhash pairing lost the pigeonhole equi-join:\n$p")
  }

  test("the BPE merge table is a materialized bounded artifact, not a lazy recompute") {
    // the train-once/apply-many seam: consumers read ≤64 collected rows
    // (LocalTableScan), so no downstream plan can re-trigger the
    // training rounds the way a lazy lineage would at every action
    val p = plan("text_bpe_vocab")
    assert(p.contains("LocalTableScan"),
      s"expected the collected merge-table artifact:\n$p")
    assert(!p.contains("documents.parquet"),
      s"the artifact frame must not carry corpus lineage:\n$p")
  }

  test("BPE training scans the corpus once; every merge round runs off the checkpointed vocab") {
    // one corpus scan builds the weighted vocab; all subsequent round
    // jobs (pair count + argmax) must read the localCheckpoint, never
    // documents again — at 100 TB the rounds are priced on the vocab
    // frame, and a re-scan per round would dwarf the whole family
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val plans = executedPlans {
      graft.ops.Bpe.train(docs, nMerges = 3)
    }
    val corpusScans = plans.count(_.contains("documents.parquet"))
    assert(corpusScans <= 1,
      s"BPE training read the corpus $corpusScans times (expected 1):\n" +
        plans.filter(_.contains("documents.parquet")).mkString("\n---\n"))
  }

  test("BPE apply is one corpus scan with zero joins") {
    // the per-row merge replay must stay a codegen'd expression chain:
    // any join (or second scan) means the apply left the
    // embarrassingly-parallel shape that makes subword pricing free at
    // scale
    val p = plan("text_bpe_tokens")
    assert(p.linesIterator.count(_.contains("documents.parquet")) == 1,
      s"BPE apply must scan the corpus exactly once:\n$p")
    assert(!p.contains("Join"), s"BPE apply must not join:\n$p")
  }

  test("power iteration scans the embedding corpus EXACTLY once") {
    // the exact Gram sketch is the only distributed work: one scan
    // aggregates the d(d+1)/2 integer second moments and every round
    // runs driver-side on them — at 100 TB the scan IS the cost, and
    // 8 rounds x full re-read (the pre-r14 shape) would dwarf it
    val plans = executedPlans {
      graft.ops.Similarity.principalDirection(
        Tables.embeddings(spark, "/root/testdata/sf0.001")).collect()
    }
    val corpusScans = plans.count(_.contains("embeddings.parquet"))
    assert(corpusScans == 1,
      s"power iteration read the corpus $corpusScans times:\n" +
        plans.filter(_.contains("embeddings.parquet")).mkString("\n---\n"))
  }

  test("the whole deflated spectral family scans the corpus EXACTLY once") {
    // deflation runs on the SAME Gram sketch (quantized-prior
    // re-orthogonalization), so the rank-2 sketch costs zero extra
    // corpus reads — the pre-r14 shape paid ~16 reads + 3
    // corpus-sized checkpoint writes for the same output
    val plans = executedPlans {
      graft.ops.Similarity.principalDirections(
        Tables.embeddings(spark, "/root/testdata/sf0.001"), components = 2).collect()
    }
    val corpusScans = plans.count(_.contains("embeddings.parquet"))
    assert(corpusScans == 1,
      s"deflated spectral family read the corpus $corpusScans times:\n" +
        plans.filter(_.contains("embeddings.parquet")).mkString("\n---\n"))
  }

  test("PNG walk stays expression-side with no RDD hop") {
    val p = plan("q_multimodal_png")
    assert(!p.contains("ExistingRDD"), s"PNG walk dropped to an RDD scan:\n$p")
    assert(p.linesIterator.count(_.contains("documents.parquet")) == 1,
      s"PNG walk rescanned the corpus:\n$p")
  }

  test("MP4 walk stays expression-side with no RDD hop") {
    val p = plan("q_multimodal_mp4")
    assert(!p.contains("ExistingRDD"), s"MP4 walk dropped to an RDD scan:\n$p")
    assert(p.linesIterator.count(_.contains("documents.parquet")) == 1,
      s"MP4 walk rescanned the corpus:\n$p")
  }

  test("WARC build+walk stays expression-side with no RDD hop, one scan") {
    val p = plan("q_multimodal_warc")
    assert(!p.contains("ExistingRDD"), s"WARC walk dropped to an RDD scan:\n$p")
    assert(p.linesIterator.count(_.contains("documents.parquet")) == 1,
      s"WARC walk rescanned the corpus:\n$p")
  }

  test("WARC per-record explode stays expression-side with no RDD hop, one scan") {
    val p = plan("q_multimodal_warc_records")
    assert(!p.contains("ExistingRDD"), s"WARC records dropped to an RDD scan:\n$p")
    assert(p.linesIterator.count(_.contains("documents.parquet")) == 1,
      s"WARC records rescanned the corpus:\n$p")
  }

  test("gzip build+walk stays expression-side with no RDD hop, one scan") {
    val p = plan("q_multimodal_gzip")
    assert(!p.contains("ExistingRDD"), s"gzip walk dropped to an RDD scan:\n$p")
    assert(p.linesIterator.count(_.contains("documents.parquet")) == 1,
      s"gzip walk rescanned the corpus:\n$p")
  }

  test("gzip per-member explode stays expression-side with no RDD hop, one scan") {
    val p = plan("q_multimodal_gzip_members")
    assert(!p.contains("ExistingRDD"), s"gzip members dropped to an RDD scan:\n$p")
    assert(p.linesIterator.count(_.contains("documents.parquet")) == 1,
      s"gzip members rescanned the corpus:\n$p")
  }

  test("warc.gz build+inflate+walk stays expression-side with no RDD hop, one scan") {
    val p = plan("q_multimodal_warc_gz")
    assert(!p.contains("ExistingRDD"), s"warc.gz path dropped to an RDD scan:\n$p")
    assert(p.linesIterator.count(_.contains("documents.parquet")) == 1,
      s"warc.gz path rescanned the corpus:\n$p")
  }

  test("tar build+walk stays expression-side with no RDD hop, one scan") {
    Seq("q_multimodal_tar", "q_multimodal_tar_members", "q_multimodal_tar_gz")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("ExistingRDD"), s"$q dropped to an RDD scan:\n$p")
        assert(p.linesIterator.count(_.contains("documents.parquet")) == 1,
          s"$q rescanned the corpus:\n$p")
      }
  }

  test("zip build+walk (stored, entries, JDK-real) stays expression-side, one scan each") {
    Seq("q_multimodal_zip", "q_multimodal_zip_entries", "q_multimodal_zip_real")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("ExistingRDD"), s"$q dropped to an RDD scan:\n$p")
        assert(p.linesIterator.count(_.contains("documents.parquet")) == 1,
          s"$q rescanned the corpus:\n$p")
      }
  }

  test("WebDataset sample reassembly is one scan + one partial-aggregated grouping") {
    val p = plan("q_multimodal_wds")
    assert(!p.contains("ExistingRDD"), s"wds grouping dropped to an RDD scan:\n$p")
    assert(p.linesIterator.count(_.contains("documents.parquet")) == 1,
      s"wds grouping rescanned the corpus:\n$p")
    // map-side combine before the exchange: partial_ aggregates present
    assert(p.contains("partial_"),
      s"wds grouping shuffles raw member rows (no map-side combine):\n$p")
  }

  test("ewma/holt/bfd recurrences run in the codegen'd linear fold, never the quadratic HOF") {
    // the optimized LOGICAL plan prints full projection lists — the
    // physical string hides result expressions inside the aggregate
    // node (q_seq_pack_bfd's fold collapses there), so the physical
    // form can't certify presence
    Seq("q_ewma_hourly", "q_holt_trend", "q_seq_pack_bfd").foreach { q =>
      val p = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.optimizedPlan.toString
      assert(p.contains("graft_seq_recurrence"),
        s"$q does not use the sequential-recurrence kernel:\n$p")
      assert(!p.contains("aggregate(lambdafunction"),
        s"$q still folds through an aggregate HOF (per-step accumulator copy):\n$p")
    }
  }

  test("image aHash pairs by the pigeonhole equi-join, never all-pairs") {
    val p = plan("dedup_image_ahash")
    assert(!p.contains("CartesianProduct"),
      s"image near-dup degenerated to a cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"image near-dup degenerated to a nested-loop join:\n$p")
  }

  test("substring dedup rounds are equi-joins and aggregates, never a cartesian") {
    // the query entry reads the rank ARTIFACT, so the round shape is
    // asserted on the inline op directly
    val p = graft.ops.Dedup.substringDedup(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"substring dedup degenerated to a cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"substring dedup degenerated to a nested-loop join:\n$p")
  }

  test("ppl sketch face: no window reads an unbounded frame (the exact face's scale defect stays retired)") {
    // the exact face ranks the whole corpus through ONE partition by
    // design (it is the oracle twin); the sketch face must not — its
    // only windows are the sample ranks, and the sample is limit(k)
    val exec = graft.ops.TextAnalysis.pplBucketsSketch(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"))
      .queryExecution.sparkPlan
    val windows = exec.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, s"expected the sample-rank window in:\n$exec")
    windows.foreach { w =>
      assert(w.find(n => n.nodeName.contains("TakeOrderedAndProject") ||
        n.nodeName.contains("GlobalLimit")).isDefined,
        s"a window reads an unbounded frame:\n$w")
    }
    val p = exec.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"the bottom-k sample must be TakeOrdered, not a global sort:\n$p")
  }

  test("real-deflate build+inflate+walk stays expression-side with no RDD hop, one scan") {
    val p = plan("q_multimodal_gzip_real")
    assert(!p.contains("ExistingRDD"), s"real-deflate path dropped to an RDD scan:\n$p")
    assert(p.linesIterator.count(_.contains("documents.parquet")) == 1,
      s"real-deflate path rescanned the corpus:\n$p")
  }
}
