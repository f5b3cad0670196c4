package graft

import graft.ops.Bpe
import graft.ops.Bpe.Merge

/** Golden and semantics pins for the BPE family. The golden sequence is
  * HAND-COMPUTED (the classic low/lower/newest/widest corpus), so a
  * drift in pair counting, tie-breaking, or merge application fails
  * against arithmetic done on paper, not against the code's own output. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // corpus: low ×5, lower ×2, newest ×6, widest ×3 — spread over docs so
  // word counts aggregate across rows
  private def goldenDocs = Seq(
    (0L, "low low low newest newest"),
    (1L, "low low lower newest newest"),
    (2L, "lower newest newest widest"),
    (3L, "widest widest")
  ).toDF("doc_id", "text")

  // hand computation: pair counts over the weighted char vocab
  //   round 1: es 9 (newest 6 + widest 3) ties st 9 → left asc → (e,s)
  //   round 2: (es,t) 9       round 3: lo 7 ties ow 7 → (l,o)
  //   round 4: (lo,w) 7       round 5: ew/ne/w-est all 6 → (e,w)
  //   round 6: (ew,est) 6 vs (n,ew) 6 → "ew" < "n" → (ew,est)
  private val golden = Seq(
    Merge(1, "e", "s", 9), Merge(2, "es", "t", 9), Merge(3, "l", "o", 7),
    Merge(4, "lo", "w", 7), Merge(5, "e", "w", 6), Merge(6, "ew", "est", 6))

  test("train reproduces the hand-computed merge sequence") {
    assert(Bpe.train(goldenDocs, nMerges = 6) === golden)
  }

  test("tokenCounts replays merges in rank order; OOV words price as one") {
    val merges = Bpe.train(goldenDocs, nMerges = 6)
    // hand-applied: low→[low] 1, lower→[low,e,r] 3, newest→[n,ewest] 2,
    // widest→[w,i,d,est] 4; "x9" fails ^[a-z]+$ → 1 token
    val docs = Seq((0L, "low lower newest widest x9")).toDF("doc_id", "text")
    val row = Bpe.tokenCounts(docs, merges).collect().head
    assert(row.getLong(1) === 1L + 3L + 2L + 4L + 1L)
    assert(row.getLong(2) === 5L)
  }

  test("greedy leftmost overlap semantics: runs merge left-to-right, passes halve") {
    // 'aaaa aaaa' → (a,a) weighted 6 (3 overlapping pairs × 2 words),
    // then (aa,aa) 2, then exhausted — train must stop early, and the
    // double-space replace must merge runs as BPE does: aaa → [aa, a]
    val docs = Seq((0L, "aaaa aaaa")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, nMerges = 8)
    assert(merges === Seq(Merge(1, "a", "a", 6), Merge(2, "aa", "aa", 2)))
    val counts = Bpe.tokenCounts(Seq((0L, "aaa aaaa aaaaa")).toDF("doc_id", "text"), merges)
      .collect().head
    // aaa → [aa, a] = 2; aaaa → [aaaa] = 1; aaaaa → [aaaa, a] = 2
    assert(counts.getLong(1) === 2L + 1L + 2L)
  }

  test("pair boundaries: a pair never matches across a longer token") {
    // vocab {ab, b}: seq ' a  b ' must not fire inside ' ab ' — token
    // count of 'ab' under merge (a,b) is 1, of 'aab' is 2 ([a, ab]...
    // no: greedy leftmost takes (a,a)? no such merge — [ab? no:
    // 'aab' = a,a,b → leftmost (a,b) match is at position 2 → [a, ab])
    val merges = Seq(Merge(1, "a", "b", 1))
    val counts = Bpe.tokenCounts(
      Seq((0L, "ab aab abab")).toDF("doc_id", "text"), merges).collect().head
    // ab→[ab] 1; aab→[a,ab] 2; abab→[ab,ab] 2
    assert(counts.getLong(1) === 1L + 2L + 2L)
  }

  test("segments emit the hand-applied token stream; OOV words pass through verbatim") {
    val merges = Bpe.train(goldenDocs, nMerges = 6)
    val docs = Seq((0L, "low lower newest widest x9")).toDF("doc_id", "text")
    val row = Bpe.segments(docs, merges).collect().head
    // hand-applied under the 6 golden merges: low→[low], lower→[low,e,r],
    // newest→[n,ewest], widest→[w,i,d,est], x9 verbatim
    assert(row.getString(1) === "low low e r n ewest w i d est x9")
    assert(row.getLong(2) === 11L)
  }

  test("empty words emit the U+0001 sentinel, never a printable fake token") {
    // consecutive input spaces make an empty word; it must price as one
    // token but can never be byte-identical to a genuine token (the old
    // "0" placeholder conflated with a real OOV "0")
    val merges = Bpe.train(goldenDocs, nMerges = 6)
    val docs = Seq((0L, "low  0")).toDF("doc_id", "text")
    val row = Bpe.segments(docs, merges).collect().head
    assert(row.getString(1) === "low \u0001 0")
    assert(row.getLong(2) === 3L)
    val counts = Bpe.tokenCounts(docs, merges).collect().head
    assert(counts.getLong(1) === 3L) // low + sentinel + the REAL "0"
    assert(counts.getLong(2) === 3L) // ws split sees the empty word too
  }

  test("vocab cap is deterministic: (count desc, word) prefix survives") {
    val docs = Seq((0L, "bb bb bb aa aa cc")).toDF("doc_id", "text")
    // vocabLimit 2 keeps bb (3) and aa (2); cc never contributes pairs
    val merges = Bpe.train(docs, nMerges = 1, vocabLimit = 2)
    assert(merges === Seq(Merge(1, "b", "b", 3)))
  }

  test("BPE-priced packing deals the exact subword cumsum into packs") {
    val merges = Bpe.train(goldenDocs, nMerges = 6)
    val packed = graft.ops.Sampling.packSequencesBy(goldenDocs,
        Bpe.tokenCountColumn($"text", merges), budgetTokens = 5L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val counts = Bpe.tokenCounts(goldenDocs, merges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(packed.map(p => p._1 -> p._3).toMap === counts,
      "the packer must price docs with the SAME subword counts")
    // per shard, in (hash, doc_id) order: pack/offset are exactly the
    // running-total deal at budget 5 — recomputed independently here
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): String =
      md.digest(s"pack:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    packed.groupBy(_._2).foreach { case (shard, rows) =>
      var cum = 0L
      // re-derive the shard order from an independent JVM md5
      rows.sortBy(p => (h(p._1), p._1)).foreach { case (_, _, n, packId, off) =>
        assert(packId === cum / 5 && off === cum % 5, s"shard $shard")
        cum += n
      }
    }
  }

  test("vocab increment + retrain equals full training on every random split") {
    // word counts are the training's sufficient statistic and a monoid:
    // merging a batch into the stored counts then training must equal
    // training on the union corpus — for ANY split
    val rnd = new scala.util.Random(7)
    val words = Seq("low", "lower", "newest", "widest", "wide", "newer")
    val docs = (0L until 12L).map(i =>
      (i, Seq.fill(6)(words(rnd.nextInt(words.size))).mkString(" ")))
    val full = Bpe.train(docs.toDF("doc_id", "text"), nMerges = 6)
    (0 until 3).foreach { k =>
      val (seen, batch) = docs.zipWithIndex.partition(_._2 % 3 != k)
      val stored = Bpe.wordCounts(seen.map(_._1).toDF("doc_id", "text"))
      val merged = Bpe.vocabIncrement(stored, batch.map(_._1).toDF("doc_id", "text"))
      assert(Bpe.trainFromCounts(merged, nMerges = 6) === full, s"split $k")
    }
    // a frame that isn't (word, n) is rejected, not silently mis-merged
    val e = intercept[IllegalArgumentException] {
      Bpe.vocabIncrement(Seq(("a", 1L)).toDF("token", "n"),
        Seq((0L, "x")).toDF("doc_id", "text"))
    }
    assert(e.getMessage.contains("word, n") || e.getMessage.contains("(word, n)"))
  }

  test("deep trainer reproduces the golden sequence and is prefix-consistent with train") {
    // greedy BPE is prefix-consistent: the first k merges of a deep run
    // ARE the k-round table — this is what makes the oracle-green
    // 16-round entry the deep entry's structural companion
    assert(Bpe.trainDeep(goldenDocs, nMerges = 6) === golden)
    val deep = Bpe.trainDeep(goldenDocs, nMerges = 1024)
    assert(deep.take(6) === golden)
    assert(deep.size > 6, "the deep run must extend past the shallow table")
    // it must also run TO exhaustion without ever repeating a pair
    assert(deep.map(m => (m.left, m.right)).distinct.size === deep.size)
  }

  test("property: deep trainer equals the distributed trainer on random corpora") {
    // generated corpora (fixed seeds, the raw-ScalaCheck convention):
    // the driver's incremental pair bookkeeping must match the
    // distributed per-round aggregate merge-for-merge, counts included
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val word: Gen[String] = Gen.choose(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    val corpus: Gen[List[String]] = Gen.choose(4, 10).flatMap(n =>
      Gen.listOfN(n, Gen.choose(2, 6).flatMap(k =>
        Gen.listOfN(k, word).map(_.mkString(" ")))))
    (1L to 6L).foreach { seed =>
      val texts = corpus.pureApply(Gen.Parameters.default, Seed(seed))
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      // train() now delegates to the driver loop, so the distributed
      // per-round trainer is exercised explicitly — the pin stays a
      // comparison of two INDEPENDENT implementations
      val shallow = Bpe.trainFromCountsDistributed(Bpe.wordCounts(docs), nMerges = 8)
      val deep = Bpe.trainDeep(docs, nMerges = 8)
      assert(deep === shallow, s"seed $seed diverged:\n  deep    $deep\n  shallow $shallow")
    }
  }

  test("deep apply: the codegen'd loop replay equals a driver replay past 64 merges") {
    // a merge table deeper than the old unrolled fold could carry must
    // still price exactly: compare tokenCounts against an independent
    // in-JVM replay of the same merges in rank order
    val rnd = new scala.util.Random(11)
    val alphabet = "abcdefgh"
    val trainTexts = (0L until 40L).map(i =>
      (i, Seq.fill(8)(Seq.fill(2 + rnd.nextInt(5))(
        alphabet(rnd.nextInt(alphabet.size))).mkString).mkString(" ")))
    val trainDocs = trainTexts.toDF("doc_id", "text")
    val merges = Bpe.trainDeep(trainDocs, nMerges = 512)
    assert(merges.size > 64, s"need a past-janino-depth table, got ${merges.size}")
    def replayWord(w: String): Int =
      if (!w.forall(c => c >= 'a' && c <= 'z') || w.isEmpty) 1
      else {
        var toks = w.map(_.toString).toList
        merges.foreach { m =>
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var rest = toks
          while (rest.nonEmpty) rest match {
            case a :: b :: tl if a == m.left && b == m.right =>
              out += (a + b); rest = tl
            case h :: tl => out += h; rest = tl
            case Nil =>
          }
          toks = out.toList
        }
        toks.size
      }
    val applyDocs = trainTexts.take(10).toDF("doc_id", "text")
    val got = Bpe.tokenCounts(applyDocs, merges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    trainTexts.take(10).foreach { case (id, text) =>
      val want = text.split(" ", -1).map(replayWord).sum.toLong
      assert(got(id) === want, s"doc $id")
    }
  }

  test("word-wise encoder ≡ replace-chain replay on the real corpus at production depth") {
    import org.apache.spark.sql.functions.col
    // the serving path (compiled-table encoder) must be bit-identical to
    // the retained replace-chain reference on REAL documents under the
    // full production-depth table — token streams and counts both
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = Bpe.trainDeep(docs, nMerges = 1024)
    assert(merges.size > 64, s"need a production-depth table, got ${merges.size}")
    val seg = docs.select(col("doc_id"),
        Bpe.docSegmentsReplay(col("text"), merges).as("want"))
      .join(Bpe.segments(docs, merges), "doc_id")
    assert(seg.filter(col("want") =!= col("bpe_text")).count() === 0L,
      "token streams diverged from the replay reference")
    val cnt = docs.select(col("doc_id"),
        Bpe.docTokensReplay(col("text"), merges).as("want"))
      .join(Bpe.tokenCounts(docs, merges), "doc_id")
      .filter(col("want") =!= col("n_bpe_tokens")).count()
    assert(cnt === 0L, "token counts diverged from the replay reference")
  }

  test("property: encoder ≡ replay under adversarial merge tables") {
    import org.apache.spark.sql.functions.col
    // generated corpora (fixed seeds, the raw-ScalaCheck convention)
    // with multi-space runs, OOV, unicode, and empty words, against
    // tables holding DEAD merges (unproducible sides), DUPLICATE pairs,
    // and compound-token chains in arbitrary order — the compiled
    // table's liveness/first-rank/minAllowed rules must reproduce the
    // replace chain bit-for-bit on every one
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val word: Gen[String] = Gen.frequency(
      6 -> Gen.choose(1, 6).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd', 'e')).map(_.mkString)),
      1 -> Gen.oneOf("X9", "a-b", "é", "Ab", "9", ""),
      1 -> Gen.const(""))
    val text: Gen[String] = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val tok: Gen[String] = Gen.oneOf(
      "a", "b", "c", "d", "e", "f", "ab", "bc", "cd", "ea",
      "abc", "bcd", "abab", "q", "qq")
    val table: Gen[List[(String, String)]] = Gen.choose(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.zip(tok, tok)))
    (1L to 8L).foreach { seed =>
      val texts = Gen.listOfN(6, text)
        .pureApply(Gen.Parameters.default, Seed(seed))
      val pairs = table.pureApply(Gen.Parameters.default, Seed(seed + 100))
      val merges = pairs.zipWithIndex.map { case ((l, r), i) => Merge(i + 1, l, r, 1L) }
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val seg = docs.select(col("doc_id"),
          Bpe.docSegmentsReplay(col("text"), merges).as("want"))
        .join(Bpe.segments(docs, merges), "doc_id")
        .select("doc_id", "want", "bpe_text").collect()
      seg.foreach(r => assert(r.getString(1) === r.getString(2),
        s"seed $seed doc ${r.getLong(0)} under $pairs"))
    }
    // the empty table is the identity encoding
    val docs = Seq((0L, "ab  x9 c")).toDF("doc_id", "text")
    val row = Bpe.segments(docs, Seq.empty).collect().head
    assert(row.getString(1) === "a b \u0001 x9 c")
  }

  test("the compiled table rejects non-[a-z]+ merge tokens loudly") {
    // a stored artifact with a space or uppercase inside a token would
    // make the string pattern depend on bytes the token model cannot
    // see — the builder must refuse, not silently diverge
    val e = intercept[IllegalArgumentException] {
      Bpe.tokenCounts(Seq((0L, "ab")).toDF("doc_id", "text"),
        Seq(Merge(1, "a b", "c", 1L))).collect()
    }
    assert(e.getMessage.contains("[a-z]+"))
  }

  test("tokenBudget twin prices the same kept set as the whitespace budget") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val ws = graft.ops.Curation.tokenBudget(docs)
      .select("source", "n_docs_kept").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bpe = Bpe.tokenBudget(docs)
      .select("source", "n_docs_kept", "n_bpe_tokens_kept").collect()
    assert(bpe.map(r => r.getString(0) -> r.getLong(1)).toMap === ws)
    // subword counts refine, never exceed char count; at least 1/word
    bpe.foreach(r => assert(r.getLong(2) > 0))
  }

  test("compression scorecard: hand-computed bytes-per-token per source") {
    val merges = Bpe.train(goldenDocs, nMerges = 6)
    // hand-applied under the golden table: "low lower" → 1 + 3 = 4 tokens,
    // 9 bytes; "newest x9" → 2 + 1 (OOV) = 3 tokens, 9 bytes
    val docs = Seq((0L, "low lower", "a"), (1L, "newest x9", "b"))
      .toDF("doc_id", "text", "source")
    val r = Bpe.compression(docs, merges).collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4))).toMap
    assert(r("a") === ((1L, 9L, 4L, 2.25)))
    assert(r("b") === ((1L, 9L, 3L, 3.0)))
  }

  test("fertility scorecard: hand-computed tokens-per-word per language") {
    val merges = Bpe.train(goldenDocs, nMerges = 6)
    // same golden application as the compression spec, keyed by lang:
    // "low lower" → 1 + 3 = 4 tokens over 2 words; "newest x9" → 2 + 1
    // (OOV prices as one) = 3 tokens over 2 words
    val docs = Seq((0L, "low lower", "en"), (1L, "newest x9", "zh"))
      .toDF("doc_id", "text", "lang")
    val r = Bpe.fertility(docs, merges).collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4))).toMap
    assert(r("en") === ((1L, 2L, 4L, 2.0)))
    assert(r("zh") === ((1L, 2L, 3L, 1.5)))
  }

  test("fertility totals agree with the per-doc tokenCounts frame") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = Bpe.train(docs)
    val fert = Bpe.fertility(docs, merges).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val perDoc = Bpe.tokenCounts(docs, merges)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy("lang")
      .agg(org.apache.spark.sql.functions.sum("n_ws_tokens").as("nw"),
        org.apache.spark.sql.functions.sum("n_bpe_tokens").as("nt"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fert === perDoc)
  }

  test("merge artifact: train once, price many — a re-touch runs zero training jobs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = { val b = new java.io.File("target/test-out").getAbsoluteFile.toPath
      java.nio.file.Files.createDirectories(b)
      java.nio.file.Files.createTempDirectory(b, "bpe") }.toString
    val path = s"$dir/merges"
    // first touch trains deep and persists the frame
    val stored = Bpe.mergeArtifact(docs, path, nMerges = 24)
    assert(new java.io.File(path, "_SUCCESS").exists())
    // the stored table replays to exactly the live-trained merge list,
    // and the budget priced THROUGH it equals the live-trained budget
    assert(Bpe.mergesFromFrame(stored) === Bpe.trainDeep(docs, nMerges = 24))
    val viaStored16 = Bpe.tokenBudgetFrom(docs,
      Bpe.mergeArtifact(docs, s"$dir/m16", nMerges = 16))
      .orderBy("source").collect().map(_.toSeq)
    assert(viaStored16 === Bpe.tokenBudget(docs).orderBy("source")
      .collect().map(_.toSeq))
    // second touch must READ, not retrain: poison the corpus — a
    // retrain would change counts and the golden prefix — and count
    // jobs; an artifact read schedules at most the footer-listing job
    val poisoned = docs.filter(org.apache.spark.sql.functions.col("doc_id") =!= 0)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val again =
      try {
        val r = Bpe.mergeArtifact(poisoned, path, nMerges = 24)
        org.apache.spark.sql.graft.Bridge.drainListenerBus(spark)
        r
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs.get() <= 1,
      s"second mergeArtifact call ran ${jobs.get()} jobs — it retrained")
    assert(Bpe.mergesFromFrame(again) === Bpe.mergesFromFrame(stored))
    // the apply side validates stored frames loudly
    val junk = Seq((1, "a")).toDF("rank", "left_tok")
    val e = intercept[IllegalArgumentException](Bpe.mergesFromFrame(junk))
    assert(e.getMessage.contains("need columns"))
  }
}
