package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("split assignment matches an independent JVM md5, id by id") {
    val got = Seq(0L, 1L, 42L, 999999L).toDF("doc_id")
      .select(col("doc_id"), Sampling.splitColumn(col("doc_id")).as("split"))
      .as[(Long, String)].collect().toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    got.foreach { case (id, split) =>
      val hex = md.digest(s"split:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val want = if (hex.substring(0, 2) <= "e5") "train" else "eval"
      assert(split === want, s"doc $id: hash $hex")
    }
  }

  test("split is ~90/10, covers every row, and is stable across evaluations") {
    val splits = docs.select(Sampling.splitColumn(col("doc_id")).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    val total = splits.values.sum
    assert(total === docs.count())
    val trainFrac = splits("train").toDouble / total
    assert(trainFrac > 0.80 && trainFrac < 0.97, s"train fraction $trainFrac")
    // re-evaluating yields the identical assignment (content hash, not rand)
    val again = docs.select(Sampling.splitColumn(col("doc_id")).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(again === splits)
  }

  test("kfold assignment matches an independent JVM md5 byte mod k, id by id") {
    val k = 5
    val got = Seq(0L, 1L, 42L, 999999L).toDF("doc_id")
      .select(col("doc_id"), Sampling.kfoldColumn(col("doc_id"), k).as("fold"))
      .as[(Long, Int)].collect().toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    got.foreach { case (id, fold) =>
      val b0 = md.digest(s"fold:$id".getBytes("UTF-8"))(0) & 0xff
      assert(fold === b0 % k, s"doc $id: byte $b0")
    }
  }

  test("kfold census covers every doc exactly once with folds in [0, k)") {
    val k = 5
    val census = Sampling.kfoldCensus(docs, k)
      .as[(Int, String, Long, Long)].collect()
    assert(census.map(_._3).sum === docs.count())
    assert(census.forall(r => r._1 >= 0 && r._1 < k))
    assert(census.map(_._1).distinct.length === k, "some fold got no docs")
    // per-(fold, lang) char volume re-derives from the assignment column
    val perLang = docs.select(Sampling.kfoldColumn(col("doc_id"), k).as("fold"),
        col("lang"), col("n_chars"))
      .groupBy("fold", "lang").agg(sum("n_chars").as("n_chars"))
      .as[(Int, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    census.foreach { case (f, l, _, chars) => assert(perLang((f, l)) === chars) }
  }

  test("length buckets: ceil-pow2 edges by hand, pad arithmetic exact") {
    // token counts 1..9 land in buckets 1,2,4,4,8,8,8,8,16
    val rows = Seq.tabulate(9)(i => (i.toLong, ("w " * (i + 1)).trim))
      .toDF("doc_id", "text")
    val got = Sampling.lengthBuckets(rows)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got === Map(
      1L -> (1L, 1L, 0L),              // n=1
      2L -> (1L, 2L, 0L),              // n=2
      4L -> (2L, 3L + 4L, 1L),         // n=3,4
      8L -> (4L, 5L + 6L + 7L + 8L, 3L + 2L + 1L), // n=5..8
      16L -> (1L, 9L, 7L)))            // n=9
  }

  test("source Gini: zero on equal lengths, hand-computed concentration, null on empty volume") {
    import graft.ops.TextAnalysis
    // eq: {5,5} -> G = 0; hot: {0,0,0,10} -> (2*40 - 5*10)/(4*10) = 0.75;
    // zero: all-zero volume -> null, never NaN
    val rows = Seq(
      ("eq", 1L, 5L), ("eq", 2L, 5L),
      ("hot", 1L, 0L), ("hot", 2L, 0L), ("hot", 3L, 0L), ("hot", 4L, 10L),
      ("zero", 1L, 0L))
      .toDF("source", "doc_id", "n_chars")
    val got = TextAnalysis.sourceGini(rows).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    assert(got === Map(
      "eq" -> ((2L, 10L, Some(0.0))),
      "hot" -> ((4L, 10L, Some(0.75))),
      "zero" -> ((1L, 0L, None))))
  }

  test("per-source cap keeps at most N, longest-first, deterministic tiebreak") {
    val capped = Sampling.perSourceCap(docs, cap = 10)
    val bySource = capped.groupBy("source").agg(
      count(lit(1)).as("n"), min("n_chars").as("kept_min"))
      .as[(String, Long, Long)].collect()
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, n, keptMin) =>
      assert(n <= 10, s"source $src kept $n > cap")
      // nothing dropped is longer than the shortest kept doc
      val droppedMax = docs.filter(col("source") === src)
        .join(capped.select("doc_id"), Seq("doc_id"), "left_anti")
        .agg(max("n_chars")).collect().head
      if (!droppedMax.isNullAt(0))
        assert(droppedMax.getLong(0) <= keptMin, s"source $src dropped a longer doc")
    }
  }

  test("salted two-phase cap equals single-phase on a hot-source fixture, with the pre-prune in the plan") {
    // one hot source carrying 80% of the rows plus a long tail, with
    // n_chars ties to exercise the doc_id tiebreak across salts
    val rows = (0L until 2000L).map { i =>
      val src = if (i < 1600) "hot" else s"cold_${i % 7}"
      (i, src, (i % 50) + 100L)
    }
    val fixture = rows.toDF("doc_id", "source", "n_chars")
    val single = Sampling.perSourceCap(fixture, cap = 25)
      .select("source", "rank_in_source", "doc_id", "n_chars")
    val salted = Sampling.perSourceCapSalted(fixture, cap = 25, salts = 8)
      .select("source", "rank_in_source", "doc_id", "n_chars")
    assert(single.exceptAll(salted).isEmpty && salted.exceptAll(single).isEmpty,
      "two-phase output differs from single-phase")
    // plan contract: two window stages — the salted pre-prune then the re-rank
    val p = salted.queryExecution.executedPlan.toString
    val windowLines = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windowLines.size === 2, s"expected 2 window stages in:\n$p")
    // the pre-prune partitions by (source, salt) — the salt shows up as a
    // pre-projected _w0 column in its partition spec; the re-rank by source alone
    assert(windowLines.count(_.contains("_w0")) === 1,
      s"salted pre-prune window missing in:\n$p")
    // both phases get map-side WindowGroupLimit pre-pruning (Partial before
    // each exchange) — the property that makes phase 1 spread a hot source
    assert(p.linesIterator.count(l => l.contains("WindowGroupLimit") && l.contains("Partial")) === 2,
      s"expected partial window-group-limits in:\n$p")
  }

  test("decontamination scores eval-side containment, not jaccard") {
    val corpus = Seq(
      // train doc 1 quotes ALL of eval doc 10 inside a longer text
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (10L, "gamma delta epsilon zeta"), // 2 shingles, both inside doc 1
      (2L, "one two three four five six"), // unrelated train doc
      (11L, "seven eight nine ten eleven twelve")) // unrelated eval doc
      .toDF("doc_id", "text")
    val pairs = graft.ops.Dedup.decontaminate(corpus, isEval = col("doc_id") >= 10)
      .as[(Long, Long, Double)].collect().toSet
    // full containment despite tiny jaccard (2 shared / 8+2-2 = 0.25)
    assert(pairs === Set((1L, 10L, 1.0)))
  }

  test("repetition fractions match hand counts on a degenerate doc") {
    val corpus = Seq(
      (1L, "spam spam spam ham"),          // top word 3/4; top bigram "spam spam" 2/3
      (2L, "a b c d"))                     // all distinct: 1/4 and 1/3
      .toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.repetition(corpus)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 4L, 3.0 / 4.0, 2.0 / 3.0),
      (2L, 4L, 1.0 / 4.0, 1.0 / 3.0)))
  }

  test("train-ready LSH scale path keeps the exact path's output on this corpus") {
    val exact = graft.ops.Curation.trainReady(docs).select("doc_id")
      .as[Long].collect().toSet
    val lsh = graft.ops.Curation.trainReady(docs, useLsh = true).select("doc_id")
      .as[Long].collect().toSet
    // false-negative odds at j>=0.8 are (1-j^4)^16 ≈ 2e-4 per pair — on
    // this corpus the candidate sets coincide, so outputs match exactly
    assert(lsh === exact)
  }

  test("domain census extracts from the URL string; blocklist gate keeps columns and composes") {
    // every construction branch: www-subdomain ids (0, 21), all five TLD
    // cycle positions, an id past 100 (bucket wraps, path keeps full id)
    val corpus = Seq(
      (0L, "alpha beta", "en", "src0", 10L), //  www.src0-0.com
      (7L, "gamma delta", "en", "src0", 11L), // src0-7.net   (blocklisted)
      (13L, "epsilon", "fr", "src1", 7L), //     src1-13.io   (blocklisted)
      (21L, "zeta", "de", "src2", 4L), //        www.src2-21.org (blocklisted)
      (104L, "eta", "en", "src0", 3L)) //        src0-4.edu
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val census = graft.ops.Curation.domainCensus(corpus).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(census === Map(
      "src0-0.com" -> (("com", 1L, 10L)),
      "src0-7.net" -> (("net", 1L, 11L)),
      "src1-13.io" -> (("io", 1L, 7L)),
      "src2-21.org" -> (("org", 1L, 4L)),
      "src0-4.edu" -> (("edu", 1L, 3L))))
    // the gate drops exactly the blocklisted domains (the www doc 21 is
    // caught because extraction STRIPS the subdomain before matching)
    // and preserves every input column for downstream stages
    val kept = graft.ops.Curation.domainGate(corpus)
    assert(kept.columns.toSeq ===
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    assert(kept.select("doc_id").as[Long].collect().toSet === Set(0L, 104L))
    val stats = graft.ops.Curation.domainGatedStats(corpus).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(stats === Map(
      "src0" -> ((3L, 1L, 2L)), "src1" -> ((1L, 1L, 0L)),
      "src2" -> ((1L, 1L, 0L))))
    // composition: the gated frame walks the full train-ready chain
    val gated = graft.ops.Curation.domainGate(
      Tables.documents(spark, "/root/testdata/sf0.001"))
    val ready = graft.ops.Curation.trainReadyStats(gated).collect()
    assert(ready.nonEmpty)
    // an empty blocklist is a configuration error, not a no-op gate
    val ex = intercept[IllegalArgumentException] {
      graft.ops.Curation.domainGate(corpus, Seq.empty)
    }
    assert(ex.getMessage.contains("blocklist"))
  }

  test("PSL-aware registered domains: multi-label suffixes, deep subdomains, two-label fallback") {
    import org.apache.spark.sql.functions.col
    import graft.ops.Curation
    // the extraction rules, straight on hosts: the longest matching
    // public suffix takes the label to its left; www/cdn/any depth
    // drops because labels come from the RIGHT; single-label TLDs fall
    // back to the last two labels; a bare label maps to itself
    val cases = Seq(
      ("www.foo.co.uk", "foo.co.uk", "co.uk"),
      ("cdn.news.bbc.co.uk", "bbc.co.uk", "co.uk"),
      ("a.b.c.example.com.au", "example.com.au", "com.au"),
      ("plain.example.com", "example.com", "com"),
      ("www.example.org", "example.org", "org"),
      ("example.io", "example.io", "io"),
      ("localhost", "localhost", "localhost"),
      ("ox.ac.uk", "ox.ac.uk", "ac.uk"),
      ("hmrc.gov.uk", "hmrc.gov.uk", "gov.uk"),
      ("sony.co.jp", "sony.co.jp", "co.jp"))
    val got = cases.map(_._1).toDF("host")
      .select(col("host"), Curation.registeredDomain(col("host")).as("d"),
        Curation.publicSuffixOf(col("host")).as("s"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSeq === cases)
    // the census keys (domain, suffix) and counts per registered
    // domain, multi-label branches live via the builder's cycles
    val corpus = Seq(
      (1L, "a", "en", "src0", 5L),  //     src0-1.co.uk
      (6L, "b", "en", "src0", 7L),  // www.src0-6.co.uk  (same registrant)
      (3L, "c", "en", "src1", 9L),  // www.src1-3.com.au
      (0L, "d", "en", "src2", 2L),  // www.cdn.src2-0.com
      (4L, "e", "en", "src2", 1L))  //     src2-4.io
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val census = Curation.domainCensusPsl(corpus).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(census === Set(
      ("src0-1.co.uk", "co.uk", 1L, 5L),
      ("src0-6.co.uk", "co.uk", 1L, 7L),
      ("src1-3.com.au", "com.au", 1L, 9L),
      ("src2-0.com", "com", 1L, 2L),
      ("src2-4.io", "io", 1L, 1L)))
  }

  test("HTML extraction recovers the exact text, prices markup, and composes with quality") {
    import graft.ops.TextAnalysis
    import graft.functions.TextFunctions
    // ids exercise every optional branch: 60 takes style+script+comment,
    // 7 and 13 none; 60's text carries raw & < > (escaped by the builder,
    // decoded back by the walker); 13 is SHORTER than its anchor width
    val docs = Seq(
      (60L, "a & b < c > d plus tail words here", "en", "src0"),
      (7L, "short doc body", "en", "src1"),
      (13L, "tiny", "fr", "src2")).toDF("doc_id", "text", "lang", "source")
    // extraction is exact: title text + original doc text + the decoded
    // entity line, for every branch combination
    val texts = docs
      .select(col("doc_id"), col("text"), TextFunctions.htmlText(
        TextAnalysis.htmlPayload(col("doc_id"), col("text"))).as("t"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    texts.foreach { case (id, (orig, got)) =>
      assert(got === s"Doc $id$orig" + "&<>\"'", s"doc $id")
    }
    val census = TextAnalysis.htmlExtractCensus(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    def c(id: Long, col: String): Long =
      census(id).getAs[Long](col)
    // doc 60: all three elided blocks (style 11 + script 7+2 + comment
    // 1+2), 19 tag tokens, anchor covers W = 10 + 60%7 = 14 chars,
    // entities = 5 fixed + the three escaped specials
    assert(c(60L, "n_tags") === 19L)
    assert(c(60L, "n_elided_chars") === 23L)
    assert(c(60L, "n_anchors") === 1L)
    assert(c(60L, "n_anchor_chars") === 14L)
    assert(c(60L, "n_entities") === 8L)
    assert(c(60L, "malformed") === 0L)
    // doc 7: no optional blocks; doc 13: anchor clipped to the 4-char doc
    assert(c(7L, "n_tags") === 15L)
    assert(c(7L, "n_elided_chars") === 0L)
    assert(c(7L, "n_anchor_chars") === 10L)
    assert(c(13L, "n_anchor_chars") === 4L)
    // text census: 'Doc ' + digits + text + 5 decoded entity chars
    texts.foreach { case (id, (orig, _)) =>
      assert(c(id, "n_chars_text") ===
        4L + id.toString.length + orig.length + 5L, s"doc $id")
      assert(c(id, "link_density_ppm") ===
        1000000L * c(id, "n_anchor_chars") / c(id, "n_chars_text"))
    }
    // lenient rules: a bare '<' before a non-tag char is literal text;
    // unknown entities pass through; EOF inside a tag flags malformed
    val edge = Seq((0L, "5 < 6 &nbsp; <p>x"), (1L, "<p unclosed"))
      .toDF("i", "h")
      .select(col("i"), TextFunctions.htmlText(col("h")).as("t"),
        TextFunctions.htmlStats(col("h")).as("s"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getSeq[Long](2)))).toMap
    assert(edge(0L)._1 === "5 < 6 &nbsp; x")
    assert(edge(0L)._2(7) === 0L)
    assert(edge(1L)._1 === "")
    assert(edge(1L)._2(7) === 1L)
    // composition: quality over the EXTRACTED corpus equals quality over
    // the analytically expected text — the downstream ops consume the
    // extractor's output as if the corpus had arrived as clean text
    val extracted = graft.ops.TextAnalysis.quality(
        TextAnalysis.htmlExtractDocs(docs))
      .orderBy("doc_id").collect().map(_.toSeq)
    val expected = graft.ops.TextAnalysis.quality(
        docs.select(col("doc_id"),
          concat(lit("Doc "), col("doc_id").cast("string"), col("text"),
            lit("&<>\"'")).as("text")))
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(extracted === expected)
    assert(extracted.nonEmpty)
  }

  test("token gate blocks on exact tokens only, keeps columns, and refuses an empty list") {
    // "ass" blocked must NOT take "class" down: exact-token, not substring
    val docs = Seq(
      (1L, "clean words only here", "en", "srcA"),
      (2L, "contains ass somewhere", "en", "srcA"),
      (3L, "the class keyword is fine", "fr", "srcB"),
      (4L, null.asInstanceOf[String], "de", "srcB")) // null can't certify clean
      .toDF("doc_id", "text", "lang", "source")
    val kept = graft.ops.Curation.tokenGate(docs, Seq("ass", "unused"))
    assert(kept.columns.toSeq === Seq("doc_id", "text", "lang", "source"))
    assert(kept.select("doc_id").as[Long].collect().toSet === Set(1L, 3L))
    val stats = graft.ops.Curation.tokenGatedStats(docs, Seq("ass", "unused"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(stats === Map("srcA" -> ((2L, 1L, 1L)), "srcB" -> ((2L, 1L, 1L))))
    // the default list is live on the real corpus: 'dup' blocks a
    // minority, and gate + stats agree on the kept count
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val realStats = graft.ops.Curation.tokenGatedStats(real)
      .agg(sum("n_docs"), sum("n_blocked"), sum("n_kept")).head
    assert(realStats.getLong(1) > 0L, "default list should block some docs")
    assert(realStats.getLong(1) < realStats.getLong(0) / 2,
      "default list should block a minority")
    assert(graft.ops.Curation.tokenGate(real).count() === realStats.getLong(2))
    val ex = intercept[IllegalArgumentException] {
      graft.ops.Curation.tokenGate(docs, Seq.empty)
    }
    assert(ex.getMessage.contains("blocklist"))
  }

  test("WARC→HTML→text composition: the container round-trip is lossless") {
    import graft.ops.{Multimodal, TextAnalysis}
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // the composed path must equal the direct page census row-for-row:
    // the record walk sliced the response payload back bit-identically
    val composed = Multimodal.warcHtmlTextCensus(docs)
      .orderBy("doc_id").collect().map(_.toSeq)
    val direct = TextAnalysis.htmlExtractCensus(docs)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(composed === direct)
    assert(composed.length === docs.count())
    // ... and the frame really is a two-record WARC per doc (the walk
    // went through the container, not around it)
    val stats = Multimodal.warcStats(Multimodal.warcHtmlFrame(docs)).collect()
    stats.foreach { r =>
      assert(r.getAs[Long]("n_records") === 2L)
      assert(r.getAs[Long]("n_warcinfo") === 1L)
      assert(r.getAs[Long]("n_response") === 1L)
    }
  }

  test("split column is stateless and stream-safe: streaming assignment equals batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ids = (0L until 200L).toSeq
    val stream = MemoryStream[Long]
    stream.addData(ids: _*)
    val q = stream.toDF().withColumnRenamed("value", "doc_id")
      .select(col("doc_id"), Sampling.splitColumn(col("doc_id")).as("split"))
      .writeStream.format("memory").queryName("split_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("split_stream").as[(Long, String)].collect().toMap
    val batch = ids.toDF("doc_id")
      .select(col("doc_id"), Sampling.splitColumn(col("doc_id")).as("split"))
      .as[(Long, String)].collect().toMap
    assert(streamed === batch)
  }

  test("stratified sample is stateless and stream-safe: streaming membership equals batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = (0L until 200L).map(i => (i, if (i % 2 == 0) "en" else "de"))
    val stream = MemoryStream[(Long, String)]
    stream.addData(rows: _*)
    val q = stream.toDF().toDF("doc_id", "lang")
      .transform(df => Sampling.stratifiedSample(df, rates = Map("en" -> 0.3)))
      .writeStream.format("memory").queryName("strat_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("strat_stream").as[(Long, String)].collect().toSet
    val batch = Sampling.stratifiedSample(
      rows.toDF("doc_id", "lang"), rates = Map("en" -> 0.3))
      .as[(Long, String)].collect().toSet
    assert(streamed === batch)
    assert(batch.exists(_._2 == "en") && batch.count(_._2 == "de") === 100)
  }

  test("quality thinning keeps proportionally to quality, deterministically") {
    // two quality tiers: rich diverse docs with stopwords vs one repeated
    // word; thinning at rate 1 keeps the high tier much more often
    val hi = (0L until 200L).map(i =>
      (i, s"the a w$i x$i y$i z$i " + (1 to 40).map(j => s"t${i}_$j").mkString(" ")))
    val lo = (200L until 400L).map(i => (i, Array.fill(45)("same").mkString(" ")))
    val docs = (hi ++ lo).toDF("doc_id", "text")
    val kept = Sampling.qualityThin(docs).collect().map(_.getLong(0)).toSet
    val keptHi = kept.count(_ < 200L)
    val keptLo = kept.count(_ >= 200L)
    // hi quality ≈ 0.4+0.3·(2/45)+0.3 ≈ 0.71; lo ≈ 0.4/45+0.3 ≈ 0.31 —
    // expected keeps 142 vs 62; allow generous slack, require separation
    assert(keptHi > 110 && keptHi < 175, s"hi tier kept $keptHi of 200")
    assert(keptLo > 35 && keptLo < 90, s"lo tier kept $keptLo of 200")
    assert(keptHi > keptLo + 30, "thinning must favor the high-quality tier")
    // determinism: a second evaluation keeps the identical set
    assert(Sampling.qualityThin(docs).collect().map(_.getLong(0)).toSet === kept)
    // halving the target roughly halves each tier, and keeps a subset
    val half = Sampling.qualityThin(docs, 1L, 2L).collect().map(_.getLong(0)).toSet
    assert(half.size < kept.size)
  }

  test("sequence packing is a gapless token stream per shard") {
    val budget = 256L
    val packed = Sampling.packSequences(docs, budgetTokens = budget)
      .select("shard", "pack_id", "pack_offset", "n_tokens").collect()
    assert(packed.nonEmpty)
    packed.groupBy(_.getInt(0)).values.foreach { rs =>
      // stream order within a shard == (pack_id, pack_offset); walking it,
      // every doc must start exactly where the previous one ended — no
      // gaps, no overlaps, offsets always inside the budget
      val sorted = rs.sortBy(r => (r.getLong(1), r.getLong(2)))
      var cursor = 0L
      sorted.foreach { r =>
        assert(r.getLong(1) * budget + r.getLong(2) === cursor, "gap in packed stream")
        assert(r.getLong(2) < budget)
        cursor += r.getLong(3)
      }
    }
  }

  test("stratified sample matches an independent JVM md5 per stratum and hits its rates") {
    val kept = Sampling.stratifiedSample(docs, rates = Map("en" -> 0.5, "zh" -> 0.25))
      .select("doc_id", "lang").as[(Long, String)].collect()
    val all = docs.select("doc_id", "lang").as[(Long, String)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Int = Integer.parseInt(
      md.digest(s"strat:$id".getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString, 16)
    val expect = all.filter { case (id, lang) =>
      lang match {
        case "en" => bucket(id) < 32768
        case "zh" => bucket(id) < 16384
        case _    => true
      }
    }
    assert(kept.sortBy(_._1).toSeq === expect.sortBy(_._1).toSeq)
    // rate edges: 0 drops the stratum entirely, 1 keeps it whole
    val edges = Sampling.stratifiedSample(docs, rates = Map("en" -> 0.0, "zh" -> 1.0))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(!edges.contains("en"))
    assert(edges("zh") === all.count(_._2 == "zh"))
  }

  test("mixture rates: alpha=1 is uniform downsampling, alpha=0 equalizes strata, caps at 1") {
    val counts = Map("en" -> 8000L, "de" -> 1500L, "rare" -> 500L)
    val uniform = Sampling.mixtureRates(counts, alpha = 1.0, targetFraction = 0.25)
    uniform.values.foreach(r => assert(math.abs(r - 0.25) < 1e-12))
    val equal = Sampling.mixtureRates(counts, alpha = 0.0, targetFraction = 0.3)
    // expected docs per stratum: 0.3 * 10000 / 3 = 1000 each; rare (500)
    // caps at rate 1.0 and contributes all it has
    assert(equal("rare") === 1.0)
    assert(math.abs(equal("en") * 8000 - 1000.0) < 1e-9)
    assert(math.abs(equal("de") * 1500 - 1000.0) < 1e-9)
    // rates feed stratifiedSample directly
    val sampled = Sampling.stratifiedSample(docs, rates = uniform)
    assert(sampled.count() > 0)
  }

  test("temperature mix: hand-computed sqrt allocation on perfect-square masses") {
    // token masses 9/4/1 → weights 3e6/2e6/1e6 EXACTLY (sqrt of a
    // perfect square is exact, the micro-floor is a no-op) → shares
    // 1/2, 1/3, 1/6 and a 6000-token budget deals 3000/2000/1000;
    // epochs re-price each allocation in the source's own mass
    val docs = Seq(
      (0L, "t t t t t", "a"), (1L, "t t t t", "a"), // 9 tokens
      (2L, "t t t t", "b"), //                         4 tokens
      (3L, "t", "c") //                                1 token
    ).toDF("doc_id", "text", "source")
    val r = Sampling.temperatureMix(docs, budgetTokens = 6000L)
      .orderBy("source").collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3),
        x.getDouble(4), x.getDouble(5), x.getDouble(6)))).toMap
    assert(r("a") === ((2L, 9L, 3000000L, 0.5, 3000.0, 3000.0 / 9.0)))
    assert(r("b") === ((1L, 4L, 2000000L, 1.0 / 3.0, 2000.0, 500.0)))
    assert(r("c") === ((1L, 1L, 1000000L, 1.0 / 6.0, 1000.0, 1000.0)))
    // shares always sum to 1 within one ulp-per-source; epochs > 1 marks
    // a source the budget would repeat — here the rare ones
    assert(math.abs(r.values.map(_._4).sum - 1.0) < 1e-12)
    val e = intercept[IllegalArgumentException](
      Sampling.temperatureMix(docs, budgetTokens = 0L))
    assert(e.getMessage.contains("budget"))
  }

  test("leakage-safe split gives every member of a dup cluster the same assignment") {
    val docs = (0L until 40L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    // clusters {0,1,2} and {10,11}; everything else singleton
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("id1", "id2")
    val r = Sampling.leakageSafeSplit(docs, pairs, trainBuckets = 128).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getString(2))).toMap
    assert(r(0L)._2 === r(1L)._2 && r(1L)._2 === r(2L)._2, "cluster {0,1,2} straddles the split")
    assert(r(10L)._2 === r(11L)._2, "cluster {10,11} straddles the split")
    // cluster members key off the canonical id, singletons off their own —
    // so a singleton's assignment matches splitColumn exactly
    val single = docs.filter(col("doc_id") === 20L)
      .select(Sampling.splitColumn(col("doc_id"), trainBuckets = 128)).head().getString(0)
    assert(r(20L)._2 === single)
    // with a 50/50 bucket split over 40 docs both sides must be inhabited
    assert(r.values.map(_._2).toSet === Set("train", "eval"))
  }

  test("rate cap keeps the earliest `cap` events per key and bucket") {
    def t(d: Int, h: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    val ev = Seq(
      (1L, t(1, 0), 7L, 1.0), (2L, t(1, 5), 7L, 1.0), (3L, t(1, 9), 7L, 1.0),
      (4L, t(2, 0), 7L, 1.0), // next day: counter resets
      (5L, t(1, 3), 8L, 1.0)) // other key unaffected
      .toDF("event_id", "ts", "user_id", "value")
    val kept = Sampling.rateCap(ev, cap = 2, bucket = "day")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 4L, 5L)) // event 3 is user 7's third that day
  }

  test("mixture rates reject a zero-count stratum by name instead of propagating NaN") {
    val e = intercept[IllegalArgumentException] {
      Sampling.mixtureRates(Map("en" -> 8000L, "ghost" -> 0L), alpha = 0.5, targetFraction = 0.2)
    }
    assert(e.getMessage.contains("ghost"), s"error must name the offending stratum: ${e.getMessage}")
  }


  test("bootstrap CI is partitioning-invariant, ordered, and brackets the point mean") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val a = Sampling.bootstrapCI(ev).orderBy("event_type")
      .collect().map(_.toSeq)
    val b = Sampling.bootstrapCI(ev.repartition(13)).orderBy("event_type")
      .collect().map(_.toSeq)
    // md5-driven weights + exact integer sums: the layout cannot matter
    assert(a === b)
    a.foreach { r =>
      val (mean, lo, hi) = (r(2).asInstanceOf[Double],
        r(3).asInstanceOf[Double], r(4).asInstanceOf[Double])
      assert(lo <= hi, s"band inverted: $r")
      // 100 replicates over hundreds of rows: the 90% band brackets the
      // point mean (deterministic given the fixed seed, so never flaky)
      assert(lo <= mean && mean <= hi, s"band misses the point mean: $r")
    }
    val ex = intercept[IllegalArgumentException] {
      Sampling.bootstrapCI(ev, loP = 0.9, hiP = 0.1)
    }
    assert(ex.getMessage.contains("bootstrapCI"))
  }

  test("dsir weights: driver-replicated log-ratio model on a hand fixture") {
    // target = docs 0,1 (all "cat"); raw = everything. Feature sets:
    // doc0 "cat cat" → uni cat×2 + bigram "cat cat"; doc2 "dog" → uni dog
    val fix = Seq((0L, "cat cat", "T"), (1L, "cat", "T"), (2L, "dog", "R"))
      .toDF("doc_id", "text", "cls")
    val r = Sampling.dsirWeights(fix, col("cls") === "T")
      .orderBy("doc_id").collect()
    // driver model: same hashed buckets, add-one, micro-nat quantization
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(f: String): Int = {
      val hex = md.digest(s"dsir:$f".getBytes("UTF-8")).map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 3), 16) % 4096
    }
    val featsByDoc = Map(
      0L -> Seq("cat", "cat", "cat cat"), 1L -> Seq("cat"), 2L -> Seq("dog"))
    val isT = Map(0L -> true, 1L -> true, 2L -> false)
    val all = featsByDoc.toSeq.flatMap { case (d, fs) => fs.map(f => (d, bucket(f))) }
    val ct = all.filter(x => isT(x._1)).groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val cr = all.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val (nt, nr) = (ct.values.sum, cr.values.sum)
    def qlr(b: Int): Long = math.round(
      (math.log((ct.getOrElse(b, 0L) + 1).toDouble / (nt + 4096).toDouble) -
        math.log((cr(b) + 1).toDouble / (nr + 4096).toDouble)) * 1e6)
    r.foreach { row =>
      val d = row.getAs[Long]("doc_id")
      val want = featsByDoc(d).map(f => qlr(bucket(f))).sum
      assert(row.getAs[Long]("sum_qlw") === want, s"doc $d")
      assert(row.getAs[Int]("is_target") === (if (isT(d)) 1 else 0))
      assert(row.getAs[Long]("n_feats") === featsByDoc(d).size.toLong)
    }
    // the target-resembling doc outranks the off-domain one
    val byDoc = r.map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("logweight_nats")).toMap
    assert(byDoc(1L) > byDoc(2L))
  }

  test("dsir selection is exactly the driver-sorted top-N of the weights") {
    val fix = docs.select("doc_id", "text", "lang")
    val weights = Sampling.dsirWeights(fix, col("lang") === "en").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("sum_qlw")))
    val want = weights.sortBy { case (id, w) => (-w, id) }.take(25).map(_._1).toSeq
    val got = Sampling.dsirSelect(fix, col("lang") === "en", topN = 25)
      .orderBy("rank").collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(got === want)
  }

  test("deterministic shuffle reproduces under the same seed and moves under a new one") {
    val a = Sampling.deterministicShuffle(docs, "epoch1:").select("doc_id")
      .limit(50).as[Long].collect().toSeq
    val b = Sampling.deterministicShuffle(docs, "epoch1:").select("doc_id")
      .limit(50).as[Long].collect().toSeq
    val c = Sampling.deterministicShuffle(docs, "epoch2:").select("doc_id")
      .limit(50).as[Long].collect().toSeq
    assert(a === b)
    assert(a !== c)
  }

  test("weighted sample equals the driver-side E-S top-k; weight raises priority") {
    def jvmMd5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // independent driver model: same md5 draw, quantized ln, one division
    val rows = docs.select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def priority(id: Long, w: Long): Double = {
      val h = java.lang.Long.parseLong(jvmMd5Hex("wsample:" + id).substring(0, 15), 16)
      val qln = java.math.BigDecimal.valueOf(
        math.log((h + 1).toDouble / 1.152921504606846976e18) * 1000000.0)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      qln.toDouble / w.toDouble
    }
    val want = rows.map { case (id, w) => (id, priority(id, w)) }
      .sortBy { case (id, p) => (-p, id) }.take(30).map(_._1).toSeq
    val got = Sampling.weightedSample(docs, col("n_chars"), k = 30)
      .collect().map(_.getLong(0)).toSeq
    assert(got === want)
    assert(got.distinct.length === 30) // without replacement by construction
    // inclusion tracks weight: the SAME draw under a doubled weight has
    // strictly higher priority (ln u < 0, so dividing by a larger w
    // moves it toward 0)
    rows.take(20).foreach { case (id, w) =>
      assert(priority(id, 2 * w) > priority(id, w), s"doc $id")
    }
    // non-positive weights fail loudly, never silently rank
    val bad = Seq((1L, 0L)).toDF("doc_id", "w")
    val e = intercept[Exception] {
      Sampling.weightedSample(bad, col("w"), k = 1).collect()
    }
    assert(e.getMessage.contains("non-positive weight") ||
      Option(e.getCause).exists(_.getMessage.contains("non-positive weight")))
    // fractional weights raise AS fractional — 0.5 must not truncate to 0
    // and surface as the misleading "non-positive weight 0", and 2.9 must
    // not silently price as 2 (distorted inclusion probability)
    for (bw <- Seq(0.5, 2.9)) {
      val badFrac = Seq((1L, bw)).toDF("doc_id", "w")
      val ef = intercept[Exception] {
        Sampling.weightedSample(badFrac, col("w"), k = 1).collect()
      }
      assert(ef.getMessage.contains("fractional weight") ||
        Option(ef.getCause).exists(_.getMessage.contains("fractional weight")),
        s"weight $bw: ${ef.getMessage}")
    }
  }

  private def packShard(id: Long): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"pack:$id".getBytes("UTF-8"))
    (d(0) >> 4) & 0xF
  }

  test("BFD packing: best-fit wins over greedy, ties to the smallest bin, oversize raises") {
    // five same-shard docs (ids brute-forced onto one first-hex-digit
    // shard so the whole fixture folds in ONE shard), sizes 6,5,4,3,2,
    // budget 10 — the classic case where best-fit packs 2 bins and
    // greedy next-fit needs 3
    val ids = Iterator.iterate(0L)(_ + 1).filter(packShard(_) == 0).take(5).toSeq
    def doc(id: Long, n: Int) = (id, Seq.fill(n)("w").mkString(" "))
    val sizes = Seq(6, 5, 4, 3, 2)
    val docs = ids.zip(sizes).map { case (id, n) => doc(id, n) }.toDF("doc_id", "text")
    val got = Sampling.packSequencesBfd(docs, budgetTokens = 10L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("bin"))).toMap
    // BFD trace: 6→bin0; 5 no-fit→bin1; 4 fits both, bin0 fuller→bin0;
    // 3→bin1; 2→bin1 — note ids ascend with DESCENDING size here, so
    // the (n desc, id asc) fold order is exactly the id order
    val wantBins = Seq(0L, 1L, 0L, 1L, 1L)
    ids.zip(sizes).zip(wantBins).foreach { case ((id, n), b) =>
      assert(got(id) === ((n.toLong, b)), s"doc $id size $n")
    }
    // per-bin loads never exceed the budget, every doc placed once
    assert(got.size === 5)
    val loads = got.values.groupBy(_._2).view.mapValues(_.map(_._1).sum)
    loads.foreach { case (b, l) => assert(l <= 10L, s"bin $b overloaded: $l") }
    // waste report: BFD 2 bins / zero waste, greedy 3 bins / waste 10
    val w = Sampling.packWasteReport(docs, budgetTokens = 10L).collect()
    assert(w.length === 1)
    val row = w.head
    assert(row.getAs[Long]("n_docs") === 5L)
    assert(row.getAs[Long]("total_tokens") === 20L)
    assert(row.getAs[Long]("bins_bfd") === 2L)
    assert(row.getAs[Long]("waste_bfd") === 0L)
    assert(row.getAs[Long]("bins_greedy") === 3L)
    assert(row.getAs[Long]("waste_greedy") === 10L)
    assert(row.getAs[Long]("waste_delta") === 10L)
    // load ties go to the SMALLEST bin id: 6,6 open two bins; the first
    // 3 fits both at equal load and must land in bin 0
    val tieIds = Iterator.iterate(0L)(_ + 1).filter(packShard(_) == 1).take(4).toSeq
    val tieDocs = tieIds.zip(Seq(6, 6, 3, 3)).map { case (id, n) => doc(id, n) }
      .toDF("doc_id", "text")
    val tie = Sampling.packSequencesBfd(tieDocs, budgetTokens = 9L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bin")).toMap
    assert(tie(tieIds(0)) === 0L && tie(tieIds(1)) === 1L)
    assert(tie(tieIds(2)) === 0L, "equal-load tie must go to the smallest bin id")
    assert(tie(tieIds(3)) === 1L)
    // whole-doc placement is the contract: oversize raises loudly
    val over = Seq(doc(0L, 11)).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Sampling.packSequencesBfd(over, budgetTokens = 10L).collect()
    }
    assert(e.getMessage.contains("whole-doc placement") ||
      Option(e.getCause).exists(_.getMessage.contains("whole-doc placement")))
  }

  test("url canonicalization: every noise class collapses except the kept-param class") {
    import spark.implicits._
    import graft.ops.Curation
    // hand cases pin each normalization step on the STRING, including
    // the two-pass coverage of adjacent tracking params and the rule
    // that a kept param never merges
    val cases = Seq(
      ("https://EX.COM/a", "https://ex.com/a"),                 // host case
      ("HTTPS://EX.COM/a", "https://ex.com/a"),                 // scheme case
      ("https://ex.com:443/a", "https://ex.com/a"),             // default port
      ("http://ex.com:80/a", "http://ex.com/a"),                // http default
      ("https://ex.com:4433/a", "https://ex.com:4433/a"),       // NOT default
      ("https://ex.com/a#frag", "https://ex.com/a"),            // fragment
      ("https://ex.com/a/", "https://ex.com/a"),                // trailing slash
      ("https://ex.com/", "https://ex.com"),                    // root slash
      ("https://ex.com/a?utm_source=x", "https://ex.com/a"),    // lone tracker
      ("https://ex.com/a?utm_source=x&utm_medium=y&ref=r",      // adjacent pair
        "https://ex.com/a?ref=r"),
      ("https://ex.com/a?ref=r&gclid=123", "https://ex.com/a?ref=r"),
      ("https://ex.com/a?ref=r", "https://ex.com/a?ref=r"),     // kept param
      // order-independent scrub: runs of 4+ ADJACENT trackers (the
      // shape the old two-pass mid-scrub leaked one of) clear fully,
      // wherever the kept param sits — before, after, or absent
      ("https://ex.com/a?utm_a=1&utm_b=2&utm_c=3&utm_d=4&ref=r",
        "https://ex.com/a?ref=r"),
      ("https://ex.com/a?ref=r&utm_a=1&gclid=2&fbclid=3&utm_d=4",
        "https://ex.com/a?ref=r"),
      ("https://ex.com/a?utm_a=1&utm_b=2&ref=r&utm_c=3&utm_d=4&utm_e=5",
        "https://ex.com/a?ref=r"),
      ("https://ex.com/a?utm_a=1&utm_b=2&utm_c=3&utm_d=4&utm_e=5",
        "https://ex.com/a"))
    val got = cases.map(_._1).toDF("u")
      .select(col("u"), Curation.canonicalUrl(col("u")).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq === cases)
    // the frontier: clean + messy per doc; every class collapses to the
    // clean canonical except class 3, whose kept param is a DIFFERENT
    // resource
    val docs = (0L to 11L).map(i => (i, "t", "en", s"src${i % 3}"))
      .toDF("doc_id", "text", "lang", "source")
    val frontier = Curation.urlFrontier(docs)
    val perDoc = frontier.groupBy("doc_id")
      .agg(countDistinct(col("url_canonical")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (0L to 11L).foreach { i =>
      val expected = if (i % 6 == 3) 2L else 1L
      assert(perDoc(i) === expected, s"doc $i (class ${i % 6})")
    }
    val census = Curation.urlDedupCensus(frontier).collect()(0)
    assert(census.getAs[Long]("n_urls") === 24L)
    assert(census.getAs[Long]("n_canonical") === 14L) // 12 + two class-3
    assert(census.getAs[Long]("n_merged") === 10L)
  }

  test("robots parse: grouping, case, comments, empty patterns, and headerless rules") {
    import graft.ops.Curation
    val robots = Seq(("ex.com",
      "junk: x\nDisallow: /lost\n# comment line\nUser-Agent: A\n" +
        "user-agent: B\nDisallow: /a\nAllow:\n\nUser-agent: *\n" +
        "DISALLOW: /b # tail comment\n")).toDF("domain", "robots_txt")
    val got = Curation.robotsRules(robots)
      .select("agent", "rule", "prefix").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set(
      // two consecutive user-agent lines share ONE group (RFC 9309),
      // agents lowercased, field names case-insensitive, comments
      // stripped wherever they sit, empty patterns dropped, and the
      // pre-group "Disallow: /lost" belongs to no agent and vanishes
      ("a", "disallow", "/a"), ("b", "disallow", "/a"),
      ("*", "disallow", "/b")), s"unexpected rule table: $got")
  }

  test("robots gate precedence: longest prefix wins, Allow breaks ties, exact agent beats *") {
    import graft.ops.Curation
    // (doc_id, source) chosen so length(domain) % 3 hits every fixture
    // class: "src-7.net"/"src-13.io" are class 0 (bot-specific group),
    // "src-10.com"/"src-30.com" class 1 (block-all + re-allow),
    // "s-25.com"/"s-35.com"/"s-55.com" class 2 (shared group + tie)
    val docs = Seq((7L, "src"), (13L, "src"), (10L, "src"), (130L, "src"),
      (25L, "s"), (35L, "s"), (55L, "s"))
      .map { case (i, src) => (i, "body text", "en", src) }
      .toDF("doc_id", "text", "lang", "source")
    val got = Curation.robotsGate(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(5)))).toMap
    assert(got(7L)  === (("src-7.net", false)),  "class 0: Disallow /doc must block /doc/7")
    assert(got(13L) === (("src-13.io", true)),   "class 0: Allow /doc/1 (longer) must beat Disallow /doc")
    assert(got(10L) === (("src-10.com", true)),  "class 1: Allow /doc must beat Disallow /")
    assert(got(130L) === (("src-30.com", false)), "class 1: Disallow /doc/13 (longest) must re-block")
    assert(got(25L) === (("s-25.com", true)),    "class 2: Allow wins the equal-length tie")
    assert(got(35L) === (("s-35.com", false)),   "class 2: Disallow /doc/3 blocks")
    assert(got(55L) === (("s-55.com", true)),    "class 2: no matching rule means allowed")
    // agent specificity: otherbot has no group in class 0 -> the
    // catch-all (empty Disallow = no restriction) applies; in class 2
    // it SHARES graftbot's group and never sees the * block-all
    val other = Curation.robotsGate(docs, agent = "otherbot").collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(other(7L) === true, "class 0: otherbot falls back to the empty catch-all")
    assert(other(25L) === true && other(35L) === false,
      "class 2: otherbot shares graftbot's group verbatim")
  }

  test("crawl-delay: group-scoped, agent-specific, min-of-many, default 1, header-block rule") {
    import graft.ops.Curation
    // handcrafted robots: graftbot group carries two delays (min wins)
    // and a non-numeric one (dropped); a delay BETWEEN user-agent lines
    // ends the header block, so the second agent starts a NEW group and
    // never sees the first group's rules (RFC 9309 §2.1)
    val robots = Seq(("ex.com",
      "User-agent: graftbot\nCrawl-delay: 5\nCrawl-delay: 3\n" +
        "Crawl-delay: soon\nUser-agent: late\nDisallow: /x\n\n" +
        "User-agent: *\nCrawl-delay: 7\n")).toDF("domain", "robots_txt")
    val d = Curation.robotsDelays(robots).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(d === Map("graftbot" -> 3L, "*" -> 7L),
      s"unexpected delays: $d")
    // the header-block rule: 'late' opened a NEW group (the delay line
    // ended graftbot's header block), so /x binds to late alone
    val rules = Curation.robotsRules(robots).collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(rules === Set(("late", "disallow", "/x")), s"unexpected: $rules")
    // effective delay on the fixture corpus: class 0 domains carry the
    // graftbot group's 2 s, class 1 the catch-all's 1 s, class 2 none
    // (the 1 s polite default) — and est_serial_s = n_allowed * delay
    val docs = Seq((7L, "src"), (10L, "src"), (25L, "s"))
      .map { case (i, src) => (i, "body text", "en", src) }
      .toDF("doc_id", "text", "lang", "source")
    val ct = Curation.robotsCrawlTime(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(ct("src-7.net") === ((0L, 2L, 0L)))   // class 0: blocked, bot delay 2
    assert(ct("src-10.com") === ((1L, 1L, 1L)))  // class 1: allowed, * delay 1
    assert(ct("s-25.com") === ((1L, 1L, 1L)))    // class 2: allowed, default 1
  }

  test("sitemap build + walk: chunk cap, index resolution, optional-field omissions") {
    import graft.ops.Curation
    // ONE domain (ids congruent mod 100 share source-10.com), five
    // corpus docs + the two discovered rows = 7 URLs; cap 2 -> 4
    // chunks ((-2,-1 | 10,110 | 210,310 | 410)): the discovered rows'
    // negative sort keys land them in chunk 0 under any cap
    val docs = Seq(10L, 110L, 210L, 310L, 410L)
      .map(i => (i, "body", "en", "src"))
      .toDF("doc_id", "text", "lang", "source")
    val chunks = Curation.sitemapChunks(docs, cap = 2)
    assert(chunks.count() === 4L, "7 URLs at cap 2 must make 4 chunks")
    val entries = Curation.sitemapEntries(docs, cap = 2).collect()
      .map(r => r.getString(2) ->
        ((r.getLong(1), Option(r.getString(3)), Option(r.get(4))))).toMap
    assert(entries.size === 7, s"walk must return all 7 listed URLs: $entries")
    // discovered rows in chunk 0; corpus rows in listing order behind
    // them (doc 210 carries the www. subdomain — stripped in the
    // domain key, kept in the listed URL string)
    assert(entries("https://src-10.com/private/new-2")._1 === 0L) // ord -2
    assert(entries("https://src-10.com/doc/new-1")._1 === 0L)     // ord -1
    assert(entries("https://src-10.com/doc/110")._1 === 1L)
    assert(entries("https://www.src-10.com/doc/210")._1 === 2L)
    assert(entries("https://src-10.com/doc/410")._1 === 3L)       // 7th listed
    // field cycling: ord 110 -> lastmod day-of-year 111, priority 0.0
    val d110 = entries("https://src-10.com/doc/110")
    assert(d110._2 === Some("2020-04-20"), s"lastmod must cycle off ord: $d110")
    assert(d110._3 === Some(0.0), s"priority must parse as the 0.<d> literal: $d110")
    // null-branch liveness: ord 0 mod 4 omits lastmod, 1 mod 4 omits priority
    val omit = Seq(4L, 5L).map(i => (i, "body", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val om = Curation.sitemapEntries(omit, cap = 50000).collect()
      .map(r => r.getString(2) ->
        ((Option(r.getString(3)), Option(r.get(4))))).toMap
    assert(om("https://s-4.edu/doc/4") === ((None, Some(0.4))),
      "ord 4 (0 mod 4) must omit lastmod")
    assert(om("https://s-5.com/doc/5") === ((Some("2020-01-06"), None)),
      "ord 5 (1 mod 4) must omit priority")
    // the protocol bound is enforced, not advisory
    intercept[IllegalArgumentException] { Curation.sitemapChunks(docs, cap = 0) }
    intercept[IllegalArgumentException] { Curation.sitemapChunks(docs, cap = 50001) }
  }

  test("sitemap parse reads noisy third-party XML, not just our builder's") {
    import graft.ops.Curation
    // whitespace between tags, attributes on <url>, an unknown child
    // element, and a multi-line block: the STRING parse must not care
    val chunkXml =
      """<?xml version="1.0"?><urlset xmlns="x">
        |  <url changefreq="daily">
        |    <loc>https://ex.com/a</loc>
        |    <lastmod>2021-02-03</lastmod>
        |    <unknown>zzz</unknown>
        |  </url>
        |  <url><loc>https://ex.com/b</loc><priority>0.9</priority></url>
        |</urlset>""".stripMargin
    val indexXml = "<sitemapindex>\n  <sitemap>\n    " +
      "<loc>https://ex.com/sitemap-0.xml</loc>\n  </sitemap>\n</sitemapindex>"
    val entries = Curation.sitemapEntriesFrom(
      Seq(("ex.com", indexXml)).toDF("domain", "xml"),
      Seq(("ex.com", 0L, chunkXml)).toDF("domain", "chunk_no", "xml"))
      .collect().map(r => r.getString(2) ->
        ((Option(r.getString(3)), Option(r.get(4))))).toMap
    assert(entries === Map(
      "https://ex.com/a" -> ((Some("2021-02-03"), None)),
      "https://ex.com/b" -> ((None, Some(0.9)))), s"unexpected: $entries")
  }

  test("sitemap frontier: discovery routes through the robots gate and the delay") {
    import graft.ops.Curation
    // the robots-gate spec's domains, one per fixture class:
    // class 0 (src-7.net, graftbot group: Disallow /doc, Allow /doc/1,
    // delay 2): /doc/new-1 blocked, /private/new-2 unmatched -> allowed;
    // class 1 (src-10.com, *: Disallow /, Allow /doc, delay 1):
    // /doc/new-1 allowed, /private/new-2 blocked;
    // class 2 (s-25.com, shared group, no delay -> default 1): both new
    // URLs unmatched -> allowed
    val docs = Seq((7L, "src"), (10L, "src"), (25L, "s"))
      .map { case (i, src) => (i, "body text", "en", src) }
      .toDF("doc_id", "text", "lang", "source")
    val got = Curation.sitemapFrontier(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got("src-7.net") === ((3L, 1L, 2L, 1L, 2L, 2L)),
      s"class 0: 1 fetchable new URL at delay 2: $got")
    assert(got("src-10.com") === ((3L, 1L, 2L, 1L, 1L, 1L)),
      s"class 1: /doc/new-1 re-allowed, /private blocked: $got")
    assert(got("s-25.com") === ((3L, 1L, 2L, 2L, 1L, 2L)),
      s"class 2: both new URLs allowed at the default delay: $got")
    // corpus URLs the sitemap lists are never "new": n_listed =
    // n_in_corpus + n_new and n_fetchable <= n_new hold by construction
    got.values.foreach { case (l, c, n, f, _, _) =>
      assert(l === c + n && f <= n)
    }
  }

  test("robots Sitemap directive: group-independent, case-insensitive, resolution census") {
    import graft.ops.Curation
    // a Sitemap line INSIDE a user-agent group must neither join the
    // group (no rule row) nor terminate its header block (both agents
    // still share the rule), and must parse wherever it sits; field
    // name case-insensitive; empty values dropped
    val robots = Seq(("ex.com",
      "User-agent: a\nSITEMAP: https://ex.com/sm.xml\nUser-agent: b\n" +
        "Disallow: /x\nsitemap:\nSitemap: https://ex.com/other.xml\n"))
      .toDF("domain", "robots_txt")
    val dirs = Curation.robotsSitemaps(robots).collect()
      .map(r => r.getString(2)).toSet
    assert(dirs === Set("https://ex.com/sm.xml", "https://ex.com/other.xml"),
      s"directive parse diverged: $dirs")
    val rules = Curation.robotsRules(robots).collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(rules === Set(("a", "disallow", "/x"), ("b", "disallow", "/x")),
      s"a sitemap line must not perturb the grouping: $rules")
    // the fixture handshake: class 0 (top-of-file) and class 2
    // (end-of-file) advertise exactly the index actually serving the
    // domain; class 1 carries none — the convention-fallback branch —
    // yet still counts its chunks (1 corpus URL + 2 discovered = 3
    // URLs, one chunk at the 50k default cap)
    val docs = Seq((7L, "src"), (10L, "src"), (25L, "s"))
      .map { case (i, src) => (i, "body text", "en", src) }
      .toDF("doc_id", "text", "lang", "source")
    val got = Curation.robotsSitemapCensus(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("src-7.net") === ((1L, 1L, 1L)), s"class 0: $got")
    assert(got("src-10.com") === ((0L, 0L, 1L)), s"class 1: $got")
    assert(got("s-25.com") === ((1L, 1L, 1L)), s"class 2: $got")
  }

  test("gate kappa matches a driver 2x2 model; degenerate tables yield null") {
    import spark.implicits._
    import graft.ops.Curation
    // plant all four cells of the 2x2 gate table: long+clean (A=B=1),
    // long+repetitive (A=1,B=0), a short doc (A=0, and B=0 too: with 3
    // bigrams ANY top bigram exceeds the 10% cap — short docs fail the
    // repetition gate by arithmetic, exactly as trainReady's fraction
    // form does), and a single-token doc (A=0, B vacuously 1 — the
    // trainReady no-bigram rule)
    val long = ("w" + (1 to 45).map(i => s" t$i").mkString)  // 46 distinct tokens
    val longRep = ("spam ham " * 25).trim                     // top bigram >> 10%
    val docs = Seq(
      (0L, long), (1L, long + " tail"), (2L, longRep),
      (3L, "short clean text here"), (4L, "solo"))
      .toDF("doc_id", "text")
    val r = Curation.gateKappa(docs).collect()(0)
    // driver model: a = [1,1,1,0,0], b = [1,1,0,0,1]
    val (n, ap, bp, agree) = (5L, 3L, 3L, 3L)
    assert(r.getAs[Long]("n_docs") === n)
    assert(r.getAs[Long]("a_pos") === ap)
    assert(r.getAs[Long]("b_pos") === bp)
    assert(r.getAs[Long]("n_agree") === agree)
    val num = (n * agree - ap * bp - (n - ap) * (n - bp)).toDouble
    val den = (n * n - ap * bp - (n - ap) * (n - bp)).toDouble
    assert(r.getAs[Double]("kappa") === num / den)
    assert(r.getAs[Double]("kappa") > 0.0 && r.getAs[Double]("kappa") < 1.0,
      "partially agreeing gates must land strictly between chance and perfect")
    // perfect agreement with variation: kappa = 1
    val agreeDocs = Seq((0L, long), (1L, "short one")).toDF("doc_id", "text")
    assert(Curation.gateKappa(agreeDocs).collect()(0).getAs[Double]("kappa") === 1.0)
    // degenerate table (both gates constant): pe = 1 -> null, not 0/0
    val allPass = Seq((0L, long), (1L, long + " more")).toDF("doc_id", "text")
    assert(Curation.gateKappa(allPass).collect()(0).isNullAt(4))
  }

  test("code detect: planted code routes true, prose false, signals exact") {
    import spark.implicits._
    import graft.ops.TextAnalysis
    val code =
      "def f(x):\n  if x > 0:\n    return x\n  else:\n    return -x\n" +
        "class Foo:\n  var myCount = 0;"
    val prose = "the river rose gently and the village watched it pass " +
      "with the patience of people who had seen many floods"
    val docs = Seq((0L, code), (1L, prose), (2L, "")).toDF("doc_id", "text")
    val rows = TextAnalysis.codeDetect(docs).orderBy("doc_id").collect()
    assert(rows(0).getAs[Boolean]("is_code") === true)
    assert(rows(0).getAs[Long]("n_keywords") >= 5L) // def/if/return/else/class/var
    assert(rows(0).getAs[Long]("n_indented") >= 4L)
    assert(rows(0).getAs[Long]("n_camel") === 1L)   // myCount
    assert(rows(1).getAs[Boolean]("is_code") === false)
    assert(rows(1).getAs[Long]("n_symbols") === 0L)
    // empty text: the greatest() guard keeps the ppm division total
    assert(rows(2).getAs[Long]("symbol_ppm") === 0L)
    assert(rows(2).getAs[Boolean]("is_code") === false)
  }
}
