package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity, TextAnalysis, Multimodal, Ingest}

/** Unit fixtures for the LLM-pipeline operators: known duplicates, known
  * vectors, known strings — independent of the driver test tables. */
class LlmOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again"),
    (1L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat again and again"), // near dup of 0
    (3L, "completely different content about spark query engines here now"),
    (4L, "another unrelated document speaking of benchmarks and storage")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min doc_id and counts copies") {
    val r = Dedup.exact(docs).orderBy("keep_id").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSeq ===
      Seq((0L, 2L), (2L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("ngram jaccard finds exact and near duplicates, not unrelated pairs") {
    val pairs = Dedup.ngramJaccard(docs, threshold = 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))       // identical: jaccard 1.0
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L))) // near dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash LSH with exact verification matches the exact algorithm") {
    val exact = Dedup.ngramJaccard(docs, threshold = 0.5)
      .select("id1", "id2", "jaccard").collect().map(_.toSeq).toSet
    val lsh = Dedup.minhashLsh(docs, threshold = 0.5)
      .select("id1", "id2", "jaccard").collect().map(_.toSeq).toSet
    assert(lsh === exact)
  }

  test("scoped postings cache is materialized eagerly and released after the consuming action") {
    spark.catalog.clearCache() // isolate from earlier suites' leftovers
    // construction runs the ONE index-materialization job (eager count —
    // the round-6 fix for concurrent cache-block computation races), and
    // the cache must hold data before any consumer runs
    val pairs = Dedup.ngramJaccard(docs, threshold = 0.5)
    assert(!org.apache.spark.sql.graft.Bridge.cacheIsEmpty(spark),
      "postings cache not registered at construction time")
    pairs.collect() // first consuming action
    // the postings cache must actually be SUBSTITUTED into the job (the
    // scope-tag projection must not break sameResult matching) — otherwise
    // shingling silently recomputes per use
    assert(pairs.queryExecution.executedPlan.toString.contains("InMemoryTableScan"),
      "postings cache not substituted into the dedup plan")
    // the QueryExecutionListener fires on the async listener bus
    val deadline = System.nanoTime() + 10_000_000_000L
    while (!org.apache.spark.sql.graft.Bridge.cacheIsEmpty(spark) &&
           System.nanoTime() < deadline) Thread.sleep(50)
    assert(org.apache.spark.sql.graft.Bridge.cacheIsEmpty(spark),
      "postings cache still registered 10s after the consuming action")
  }

  test("edit-distance and curation scale paths (LSH candidates) match the exact path") {
    val exactEd = Dedup.editDistancePairs(docs, candidateThreshold = 0.5)
      .collect().map(_.toSeq).toSet
    val lshEd = Dedup.editDistancePairs(docs, candidateThreshold = 0.5, useLsh = true)
      .collect().map(_.toSeq).toSet
    assert(lshEd === exactEd)
    val withLang = docs.withColumn("lang", lit("en"))
    val exactCur = graft.ops.Curation.curate(withLang, jaccardThreshold = 0.5, qualityFloor = 0.0)
      .collect().map(_.getLong(0)).toSet
    val lshCur = graft.ops.Curation.curate(withLang, jaccardThreshold = 0.5, qualityFloor = 0.0,
      useLsh = true).collect().map(_.getLong(0)).toSet
    assert(lshCur === exactCur)
  }

  test("simhash of identical docs has hamming 0 and is reported as a pair") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.get((0L, 1L)).contains(0))
  }

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f, 0.0f), 0),  // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f), 0),  // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f), 1), // opposite of 0, other label
    (4L, Array(0.5f, 0.5f, 0.0f), 0)
  ).toDF("vec_id", "embedding", "label")

  test("cosine expression: identical=1, orthogonal=0") {
    val c = vecs.as("a").crossJoin(vecs.as("b"))
      .filter(col("a.vec_id") === 0 && col("b.vec_id").isin(0, 2))
      .select(col("b.vec_id"), Similarity.cosine(
        Similarity.toDouble(col("a.embedding")), Similarity.toDouble(col("b.embedding"))).as("c"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(math.abs(c(0L) - 1.0) < 1e-12 && math.abs(c(2L)) < 1e-12)
  }

  test("brute top-k ranks the closest vector first") {
    val top = Similarity.topKBrute(vecs, k = 2, numQueries = 1).orderBy("rank").collect()
    assert(top(0).getAs[Long]("neighbor_id") === 1L) // 0.9,0.1 is nearest to 1,0
    assert(top.length === 2)
  }

  test("embedding near-dup is blocked by label: opposite-label pair never compared") {
    val pairs = Dedup.embeddingNearDup(vecs, threshold = -2.0) // keep all compared pairs
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(pairs.contains((0L, 1L)))
  }

  test("SRP-LSH near-dup finds planted duplicates without labels, exactly") {
    val base = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("embedding"))
    val planted = base.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), _ * lit(1.001)).as("embedding"))
    val corpus = base.unionByName(planted)
    val got = graft.ops.Dedup.embeddingNearDupLsh(corpus, threshold = 0.99)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth by brute force over the same corpus
    val a = corpus.select(col("vec_id").as("id1"), col("embedding").as("va"))
    val b = corpus.select(col("vec_id").as("id2"), col("embedding").as("vb"))
    val expect = a.join(b, col("id1") < col("id2"))
      .select(col("id1"), col("id2"), Similarity.cosine(col("va"), col("vb")).as("c"))
      .filter(col("c") >= 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expect.size === 10) // exactly the planted pairs
    assert(got === expect)
  }

  test("SRP signature is scale-invariant and flips under negation") {
    import graft.functions.VectorFunctions.srpSignature
    val vs = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(50)
      .select(Similarity.toDouble(col("embedding")).as("v"))
    val sigs = vs.select(
      srpSignature(col("v"), 64).as("s"),
      srpSignature(transform(col("v"), _ * lit(7.5)), 64).as("scaled"),
      srpSignature(transform(col("v"), _ * lit(-1.0)), 64).as("negated")).collect()
    sigs.foreach { r =>
      assert(r.getLong(0) === r.getLong(1)) // positive scaling preserves signs
      // negation flips every sign bit: s>0 becomes s<0 (never exactly 0
      // on real-valued embeddings), so the signatures are complements
      assert(r.getLong(2) === ~r.getLong(0))
    }
  }

  test("IVF centroid count is bounded by k and √N, independent of corpus size") {
    val small = Tables.embeddings(spark, "/root/testdata/sf0.001") // 500 rows
    val big = Tables.embeddings(spark, "/root/testdata/sf0.1")     // 2000 rows
    // seeds (iterations = 0): exactly min(k, ⌊√N⌋) on ANY corpus — the
    // round-5 N/stride parameterization grew linearly with the corpus
    assert(Similarity.trainCentroids(small, k = 8, iterations = 0).count() === 8L)
    assert(Similarity.trainCentroids(big, k = 8, iterations = 0).count() === 8L)
    // √N cap: a 9-row corpus can host at most 3 centroids
    assert(Similarity.trainCentroids(small.limit(9), k = 16, iterations = 0).count() === 3L)
    // Lloyd refinement can only empty cells, never add them
    assert(Similarity.trainCentroids(big, k = 8, iterations = 2).count() <= 8L)
  }

  test("IVF top-k is bit-identical across runs and input partitionings") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    // different physical partitionings exercise different partial-agg merge
    // orders in centroid training — the decimal mean must absorb them
    def run(parts: Int): Seq[Seq[Any]] =
      Similarity.topKIvf(emb.repartition(parts), k = 5, numQueries = 5)
        .orderBy("query_id", "rank").collect().toSeq.map(_.toSeq)
    val a = run(3)
    val b = run(7)
    assert(a === b) // includes the cosine doubles, bit for bit
  }

  test("rolling-hash fingerprint matches the reference formula") {
    val text = "ab c"
    var expect = 0L
    text.foreach(ch => expect = (expect * 31 + ch.toLong) % 1000000007L)
    val got = Seq((0L, text)).toDF("doc_id", "text")
      .select(TextAnalysis.fingerprintExpr(col("text")).as("fp")).collect()(0).getLong(0)
    assert(got === expect)
  }

  test("token counts on a known string") {
    val r = TextAnalysis.tokenCounts(Seq((0L, "ab 12 c.")).toDF("doc_id", "text")).collect()(0)
    assert(r.getAs[Int]("n_ws_tokens") === 3)
    assert(r.getAs[Int]("n_re_tokens") === 4) // ab | 12 | c | .
    assert(r.getAs[Int]("n_token_chars") === 6)
  }

  test("quality: type-token ratio and stopword ratio") {
    val r = TextAnalysis.quality(Seq((0L, "the cat the dog")).toDF("doc_id", "text")).collect()(0)
    assert(r.getAs[Double]("ttr") === 0.75)            // 3 distinct / 4
    assert(r.getAs[Double]("stopword_ratio") === 0.5)  // 2×'the' / 4
  }

  test("pii scrub counts both kinds and redacts emails before ips") {
    val df = Seq(
      (1L, "mail a@b.co then 1.2.3.4 then c@d.org end"),
      (2L, "clean text no pii"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.piiScrub(df).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, 2L, 1L, "mail <EMAIL> then <IP> then <EMAIL> end"),
      (2L, 0L, 0L, "clean text no pii")))
  }

  test("langid emits a prediction and match flag for every row") {
    val r = TextAnalysis.langId(Seq((0L, "aeiou aeiou", "es")).toDF("doc_id", "text", "lang")).collect()(0)
    assert(r.getAs[String]("predicted_lang") === "es" && r.getAs[Boolean]("match"))
  }

  test("multimodal: header decode and feature DSP match an independent byte computation") {
    val docs = Seq((7L, "some payload bytes", "en", "src", 18L),
                   (6L, "pixels go here....", "en", "src", 18L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.mediaFrame(docs)
    val f = Multimodal.extractFeatures(media).orderBy("doc_id").collect()
    val bmp = f(0) // doc 6: image → BMP container
    val wav = f(1) // doc 7: 7 % 3 == 1 → audio → WAV container
    assert(wav.getAs[String]("media_type") === "audio")
    assert(wav.getAs[String]("container") === "wav")
    assert(wav.getAs[Int]("n_bytes") === 18 + 44)
    assert(wav.getAs[Int]("sample_rate") === (7 % 8) * 4000 + 8000)
    assert(wav.getAs[Int]("channels") === 2)
    assert(wav.isNullAt(wav.fieldIndex("width")))
    assert(bmp.getAs[String]("container") === "bmp")
    assert(bmp.getAs[Int]("n_bytes") === 18 + 54)
    assert(bmp.getAs[Int]("width") === 6 % 640 + 64)
    assert(bmp.getAs[Int]("height") === 6 % 480 + 48)
    assert(bmp.isNullAt(bmp.fieldIndex("sample_rate")))
    // features recomputed independently from the raw text bytes
    val wb = "some payload bytes".getBytes("UTF-8")
    val samples = wb.grouped(2).filter(_.length == 2)
      .map(p => (p(1) << 8) | (p(0) & 0xff)).toSeq
    val expRms = math.sqrt(samples.map(s => s.toLong * s).sum.toDouble / samples.size)
    val expZcr = samples.sliding(2).count(w => (w(0) >= 0) != (w(1) >= 0))
      .toDouble / (samples.size - 1)
    assert(wav.getSeq[Double](8) === Seq(expRms, expZcr))
    val bb = "pixels go here....".getBytes("UTF-8")
    val byCh = bb.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
      .map(_._2.map(x => (x._1 & 0xff).toLong).toSeq)
    val expMeans = byCh.map(c => c.sum.toDouble / c.size)
    val expStds = byCh.map { c =>
      val n = c.size.toLong
      math.sqrt((n * c.map(v => v * v).sum - c.sum * c.sum).toDouble / (n * n).toDouble)
    }
    assert(bmp.getSeq[Double](8) === expMeans ++ expStds)
  }

  test("pcm kernel: signed samples, zero crossings, and the no-sample null") {
    def le(s: Int) = Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)
    val body = Seq(1000, -1000, -2000, 5).flatMap(le).toArray
    val stats = graft.functions.DspKernel.pcmStats(body, 0)
    assert(stats.getDouble(0) ===
      math.sqrt((1000L * 1000 + 1000L * 1000 + 2000L * 2000 + 25L).toDouble / 4))
    assert(stats.getDouble(1) === 2.0 / 3.0) // + → - → - → + : 2 of 3 transitions
    assert(graft.functions.DspKernel.pcmStats(Array[Byte](1), 0) === null)
    assert(graft.functions.DspKernel.byteChannelStats(Array[Byte](1, 2), 0, 3) === null)
  }

  test("multimodal: expression header decode matches the JVM twin, with no RDD scan") {
    val docs = Seq((6L, "pixels go here....", "en", "src", 18L),
                   (7L, "some payload bytes", "en", "src", 18L),
                   (8L, "video keyframe data", "en", "src", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.mediaFrame(docs)
    val expr = Multimodal.decodeHeaders(media).orderBy("doc_id").collect()
    val jvm = media.orderBy("doc_id").collect().map { r =>
      val (c, w, h, sr, ch) = Multimodal.decodeHeader(r.getAs[Array[Byte]]("payload"))
      (r.getLong(0), c, w, h, sr, ch)
    }
    assert(expr.map(r => (r.getLong(0), r.getString(2),
      Option(r.get(4)), Option(r.get(5)), Option(r.get(6)), Option(r.get(7)))).toSeq === jvm.toSeq)
    // the oracle-checked decode path must stay expression-side (codegen'd)
    val plan = Multimodal.decodeHeaders(media).queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), "header decode dropped to an RDD scan")
  }

  test("multimodal: decodeHeader reads golden BMP/WAV bytes (pins endianness)") {
    // hand-assembled 54-byte BMP header, width=300 (0x012C), height=200
    // (0xC8) — little-endian at offsets 18/22 per the spec
    val bmp = new Array[Byte](54)
    bmp(0) = 'B'; bmp(1) = 'M'
    bmp(18) = 0x2C; bmp(19) = 0x01 // 300 LE
    bmp(22) = 0xC8.toByte          // 200 LE
    assert(Multimodal.decodeHeader(bmp) === ("bmp", Some(300), Some(200), None, None))
    // hand-assembled 44-byte WAV header, sampleRate=44100 (0xAC44) at
    // offset 24, channels=2 at offset 22
    val wav = new Array[Byte](44)
    wav(0) = 'R'; wav(1) = 'I'; wav(2) = 'F'; wav(3) = 'F'
    wav(8) = 'W'; wav(9) = 'A'; wav(10) = 'V'; wav(11) = 'E'
    wav(22) = 2
    wav(24) = 0x44; wav(25) = 0xAC.toByte // 44100 LE
    assert(Multimodal.decodeHeader(wav) === ("wav", None, None, Some(44100), Some(2)))
    // unknown magic → metadata-free passthrough, never a crash
    assert(Multimodal.decodeHeader(Array[Byte](1, 2, 3))._1 === "unknown")
  }

  test("ingest envelopes round-trip through to_json/from_json/explode") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val back = Ingest.splitEnvelopes(Ingest.envelopes(ev))
    val orig = ev.select("event_id", "event_type", "value")
    assert(back.count() === orig.count())
    assert(back.exceptAll(orig).count() === 0)
  }
}
