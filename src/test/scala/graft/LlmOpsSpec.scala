package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity, TextAnalysis, Multimodal, Ingest, Sampling}

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

  test("incremental dedup drops seen texts and keeps one copy per new text") {
    val seen = Seq((0L, "already in the corpus")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "already in the corpus"),   // dropped: seen
      (11L, "fresh content one"),
      (12L, "fresh content one"),       // batch dup of 11
      (13L, "fresh content two")
    ).toDF("doc_id", "text")
    val r = Dedup.exactIncrement(batch, seen).orderBy("keep_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(r === Seq((11L, 2L), (13L, 1L)))
  }

  test("vocab growth: min-first-seen checkpoints equal brute distinct counts") {
    import graft.ops.TextAnalysis
    // ids 1..10; cuts at 50% (id<=5) and 100%. doc i contributes token
    // "t<i>" plus the shared "the" — vocab(50%) = 5 + 1, vocab(100%) = 11
    val planted = (1 to 10).map(i => (i.toLong, s"the t$i"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabGrowth(planted, pcts = Seq(50, 100)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(50L -> ((5L, 6L)), 100L -> ((10L, 11L))))
  }

  test("dup-shingle coverage: planted overlap by hand, independent doc at zero") {
    // doc 0 and 1 are identical (every shingle df >= 2 → rate 1.0);
    // doc 2 shares its first trigram with them ("a b c") but not the
    // second; doc 3 shares nothing.
    val planted = Seq(
      (0L, "a b c d"),   // shingles: "a b c", "b c d"
      (1L, "a b c d"),
      (2L, "a b c x"),   // shingles: "a b c" (shared), "b c x" (unique)
      (3L, "p q r s")    // shingles: "p q r", "q r s" — both unique
    ).toDF("doc_id", "text")
    val got = Dedup.dupShingleCoverage(planted).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(
      0L -> ((2L, 2L, 1.0)), 1L -> ((2L, 2L, 1.0)),
      2L -> ((2L, 1L, 0.5)), 3L -> ((2L, 0L, 0.0))))
  }

  test("lexical top-k: rare shared token outranks common one, ties by neighbor id") {
    // token "zebra" appears in docs 0,1 only (df 2); "the" in all four
    // (df 4). N=4 → w(zebra) = 5e6 // 3 = 1666666, w(the) = 5e6 // 5 =
    // 1000000. doc 0's best neighbor must be 1 (zebra + the =
    // 2666666) over 2 and 3 (the = 1000000, tie broken by id).
    val planted = Seq(
      (0L, "the zebra"), (1L, "the zebra"),
      (2L, "the cat"), (3L, "the dog")).toDF("doc_id", "text")
    val got = Dedup.lexicalTopK(planted, k = 3)
      .select("doc_id", "nbr_id", "score", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val doc0 = got.filter(_._1 == 0L).sortBy(_._4)
    assert(doc0 === Array((0L, 1L, 2666666L, 1L), (0L, 2L, 1000000L, 2L),
      (0L, 3L, 1000000L, 3L)))
    // the df cap drops the ubiquitous token entirely: with maxDocFreq=3,
    // "the" (df 4) generates no pairs, so 2 and 3 lose every neighbor
    val capped = Dedup.lexicalTopK(planted, k = 3, maxDocFreq = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(capped === Set(0L, 1L))
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

  test("incremental dedup drops null text on both sides (anti join vs NOT IN pin)") {
    // a null hash in `seen` must not nuke the whole batch (the SQL NOT IN
    // hazard), and null-text batch rows must not survive as keepers
    val seen = Seq((0L, Option("kept text")), (1L, Option.empty[String]))
      .toDF("doc_id", "text")
    val batch = Seq((10L, Option("kept text")), (11L, Option.empty[String]),
      (12L, Option("fresh text"))).toDF("doc_id", "text")
    val r = Dedup.exactIncrement(batch, seen).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(r === Seq((12L, 1L)))
  }

  test("incremental minhash equals the cross-side slice of full-corpus LSH") {
    val seen = docs // ids 0-4
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again"), // dup of seen 0/1
      (11L, "some genuinely new content that matches nothing at all today"),
      (12L, "another unrelated document speaking of benchmarks and storage")  // dup of seen 4
    ).toDF("doc_id", "text")
    val inc = Dedup.minhashIncrement(batch, seen, threshold = 0.5)
      .select("batch_id", "seen_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: full-corpus LSH over the union, restricted to pairs
    // that cross the batch/seen boundary (batch ids are the larger side)
    val full = Dedup.minhashLsh(seen.unionByName(batch), threshold = 0.5)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a < 10L && b >= 10L }
      .map { case (a, b) => (b, a) }.toSet
    assert(inc === full)
    assert(inc.contains((10L, 0L)) && inc.contains((10L, 1L)) && inc.contains((12L, 4L)))
    assert(!inc.exists(_._1 == 11L))
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

  test("portable simhash replays the md5 sign-aggregate bit-for-bit (JVM recompute)") {
    // identical docs pair at hamming 0 through the portable twin too
    val pairs = Dedup.simhashPairsPortable(docs, maxHamming = 3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs.get((0L, 1L)).contains(0L))
    // fingerprint vs an independent JVM model on one doc's shingle set
    val text = docs.filter(col("doc_id") === 0L).select("text").head().getString(0)
    val words = text.split(" ")
    val shingleSet = (if (words.length <= 2) Seq(words.mkString(" "))
      else words.sliding(3).map(_.mkString(" ")).toSeq).distinct
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val votes = Array.fill(60)(0L)
    shingleSet.foreach { s =>
      val h = java.lang.Long.parseLong(md5Hex("sh:" + s).substring(0, 15), 16)
      (0 until 60).foreach(j =>
        votes(j) += (if (((h >> j) & 1L) == 1L) 1L else -1L))
    }
    val want = (0 until 60).map(j => if (votes(j) > 0) 1L << j else 0L).sum
    val got = Dedup.simhashPortable(docs).filter(col("doc_id") === 0L)
      .head().getLong(1)
    assert(got === want)
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

  test("label centroid is the quantized per-dimension mean; outliers rank by distance to it") {
    // label 0 vectors: (1,0,0),(0.9,0.1,0),(0,1,0),(0.5,0.5,0) → mean
    // (0.6, 0.4, 0.0) exactly at 1e-6 quantization
    val cent = Similarity.labelCentroids(vecs).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(math.abs(cent((0, 0)) - 0.6) < 1e-6)
    assert(math.abs(cent((0, 1)) - 0.4) < 1e-6)
    assert(cent((0, 2)) === 0.0)
    assert(cent((1, 0)) === -1.0)
    // label 1 has one member: its centroid is itself → similarity 1; the
    // least-typical label-0 member is the orthogonal-ish (0,1,0)
    val out = Similarity.centroidOutliers(vecs, n = 5).collect()
    assert(out.head.getAs[Long]("vec_id") === 2L)
    assert(math.abs(out.last.getAs[Double]("centroid_sim") - 1.0) < 1e-12)
  }

  test("embedding near-dup is blocked by label: opposite-label pair never compared") {
    val pairs = Dedup.embeddingNearDup(vecs, threshold = -2.0) // keep all compared pairs
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(pairs.contains((0L, 1L)))
  }

  test("label cohesion: perfect class at 1.0, split class flagged with the tie-rule argmin") {
    import graft.ops.Similarity
    // label 0: two identical vectors -> mean = min = 1.0 (cosine of a
    // vector with its own centroid direction). label 1: orthogonal pair
    // -> both members sit cos(45°) from the mean centroid; equal sims
    // tie, so worst_vec_id is the smaller id.
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f), 0),
      (10L, Array(1.0f, 0.0f), 1), (11L, Array(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.labelCohesion(emb).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))))
      .toMap
    assert(got(0)._1 === 2L && got(0)._2 === 1.0 && got(0)._3 === 1.0)
    assert(got(1)._1 === 2L)
    assert(math.abs(got(1)._3 - math.sqrt(0.5)) < 1e-9, s"min_sim ${got(1)._3}")
    assert(got(1)._4 === 10L, "equal sims must tie-break to the smaller vec_id")
    // the quantized mean can only sit at/below the raw per-member value
    assert(got(1)._2 <= got(1)._3 && got(1)._2 > got(1)._3 - 1e-6)
  }

  test("centroid drift: identical halves at zero, a planted 90-degree move measured exactly") {
    import graft.ops.Similarity
    // label 0: both halves identical -> shift 0. label 1: old half on
    // the x axis, new half on y -> per-component diffs (1e6, -1e6),
    // shift = 2e12 exactly.
    val emb = Seq(
      (0L, Array(0.5f, 0.5f), 0), (1L, Array(0.5f, 0.5f), 0),
      (10L, Array(1.0f, 0.0f), 1), (11L, Array(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.centroidDrift(emb, col("vec_id") % 2 === 1).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got === Map(
      0 -> ((1L, 1L, "0")),
      1 -> ((1L, 1L, "2000000000000"))))
  }

  test("centroid partials: empty embeddings are non-members on both faces; ragged labels raise") {
    import graft.ops.Similarity
    // an EMPTY embedding must not count as a member (it contributes no
    // component sums) — and the rule must hold identically on the batch
    // face and the partials/serve face, or live drift silently diverges
    val emb = Seq(
      (0L, Array(0.5f, 0.5f), 0), (1L, Array(0.5f, 0.5f), 0),
      (2L, Array.empty[Float], 0),
      (10L, Array(1.0f, 0.0f), 1), (11L, Array(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val batch = Similarity.centroidDrift(emb, col("vec_id") % 2 === 1)
      .orderBy("label").collect().map(_.toSeq)
    val served = Similarity.centroidDriftFromPartials(
      Similarity.centroidPartials(emb.filter(col("vec_id") % 2 === 0)),
      Similarity.centroidPartials(emb.filter(col("vec_id") % 2 === 1)))
      .orderBy("label").collect().map(_.toSeq)
    assert(batch === served)
    assert(batch.head(1) === 1L, "the empty vector must not inflate n_a")
    // mixed dimensions within a label break the max(n) member-count
    // recovery — the serve face must raise, never report a wrong n
    val ragged = Seq(
      (0L, Array(0.5f, 0.5f), 0), (1L, Array(0.25f), 0))
      .toDF("vec_id", "embedding", "label")
    val p = Similarity.centroidPartials(ragged)
    val e = intercept[Exception] {
      Similarity.centroidDriftFromPartials(p, p).collect()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ rootMessages(x.getCause))
    assert(rootMessages(e).exists(_.contains("ragged")), s"unexpected: $e")
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

  test("embeddingNearDup routes hot labels through SRP-LSH, same pairs, no pair explosion") {
    import org.apache.spark.sql.functions.{array, col, lit, transform => htransform}
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    // plant a scaled copy of vec 0 (identical direction → identical SRP
    // signature structurally, so LSH recall for the pair is 1.0, not luck)
    val copy = emb.filter(col("vec_id") === 0)
      .select(lit(100000L).as("vec_id"),
        htransform(col("embedding"), x => x * lit(1.001f)).as("embedding"),
        col("label"))
    val corpus = emb.select("vec_id", "embedding", "label").unionByName(copy)
    def pairs(cap: Long) =
      graft.ops.Dedup.embeddingNearDup(corpus, threshold = 0.99, maxExactLabelSize = cap)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
    val viaExact = pairs(Long.MaxValue)      // every label on the quadratic path
    val viaLsh = pairs(30L)                  // every label (~50 rows) is HOT → LSH path
    // identical pair sets: the planted near-copy, and nothing else at 0.99
    // (random 64-dim background pairs top out near cos 0.4)
    assert(viaExact.contains((0L, 100000L)))
    assert(viaLsh === viaExact)
    // the hot branch really is the banded-LSH plan, not a quadratic join
    val hotPlan = graft.ops.Dedup.embeddingNearDup(corpus, threshold = 0.99,
      maxExactLabelSize = 30L).queryExecution.executedPlan.toString
    assert(hotPlan.contains("graft_srp_sig"), s"hot labels not routed via SRP:\n$hotPlan")
  }

  test("IVF pre-trained centroid artifact reproduces self-training output bit-for-bit") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = { val b = new java.io.File("target/test-out").getAbsoluteFile.toPath
      java.nio.file.Files.createDirectories(b)
      java.nio.file.Files.createTempDirectory(b, "centroids") }.toString
    val path = s"$dir/c"
    // first touch trains and writes; the artifact is a tiny parquet file
    val c1 = Similarity.centroidArtifact(emb, path, k = 16, iterations = 2)
    assert(new java.io.File(path, "_SUCCESS").exists())
    val pre = Similarity.topKIvf(emb, pretrained = Some(c1))
      .orderBy("query_id", "rank").collect().toSeq.map(_.toSeq)
    val self = Similarity.topKIvf(emb)
      .orderBy("query_id", "rank").collect().toSeq.map(_.toSeq)
    assert(pre === self) // doubles round-trip parquet exactly
    // second touch must READ, not retrain: poison the corpus — a retrain
    // on it would produce different centroids and differing top-k
    val poisoned = emb.filter(col("vec_id") =!= 0)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val c2 =
      try {
        val r = Similarity.centroidArtifact(poisoned, path, k = 16, iterations = 2)
        org.apache.spark.sql.graft.Bridge.drainListenerBus(spark)
        r
      } finally spark.sparkContext.removeSparkListener(listener)
    // training schedules ≥6 jobs (corpus count, sample count, seed +
    // per-iteration collects, write); a pure artifact read schedules at
    // most the one parquet footer/schema-listing job
    assert(jobs.get() <= 1, s"second centroidArtifact call ran ${jobs.get()} jobs — it retrained")
    assert(c2.collect().toSeq.map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
      === c1.collect().toSeq.map(_.toSeq).sortBy(_.head.asInstanceOf[Long]))
  }

  test("k-center selection: hand-computed farthest-first order and monotone coverage") {
    import graft.ops.Similarity
    // seed = min id (1,0). Farthest (lowest cosine) is the antipode,
    // then the orthogonal, then the diagonal — and each pick's coverage
    // cosine is non-decreasing (the classic farthest-first property)
    val s = math.sqrt(0.5).toFloat
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(s, s)), (3L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kCenterSelect(emb, k = 4)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.map(_._2).toSeq === Seq(0L, 3L, 1L, 2L))
    assert(got.head._3.isEmpty, "the seed has no prior coverage")
    val covs = got.tail.map(_._3.get)
    assert(math.abs(covs(0) - (-1.0)) < 1e-12)
    assert(math.abs(covs(1) - 0.0) < 1e-12)
    assert(math.abs(covs(2) - math.sqrt(0.5)) < 1e-9)
    assert(covs.zip(covs.tail).forall { case (a, b) => a <= b },
      s"coverage must be non-decreasing: ${covs.mkString(",")}")
    // k past the corpus size stops at the corpus, never loops
    assert(Similarity.kCenterSelect(emb, k = 10).count() === 4)
  }

  test("isotropy: hand-computed mean pairwise cosine; nulls, zeros, scale drop out") {
    // e1, e1, e2 — pairs: (1,2) cos 1 twice, the four e1/e2 pairs cos 0
    // → mean 2/6 = 1/3 EXACTLY (quantized micro-coords are ±1e6/0, so
    // the sum-of-sums identity is integer-exact here). The third e1 is
    // scaled — normalization must erase magnitude — and a null row plus
    // a zero vector carry no direction and must not perturb anything.
    val rows = Seq(
      (0L, Some(Array(1.0, 0.0, 0.0))),
      (1L, Some(Array(4.5, 0.0, 0.0))), // scaled e1
      (2L, Some(Array(0.0, 1.0, 0.0))),
      (3L, None),
      (4L, Some(Array(0.0, 0.0, 0.0)))) // zero norm
      .toDF("vec_id", "embedding")
    val r = Similarity.isotropy(rows).collect().head
    assert(r.getLong(0) === 3L)
    assert(r.getLong(1) === 3L)
    assert(r.getDouble(2) === 1.0 / 3.0)
    // ‖Σu‖ = ‖(2,1,0)‖·1e6 micro-units → √5/3 exactly at this fixture
    assert(math.abs(r.getDouble(3) - math.sqrt(5.0) / 3.0) < 1e-9)

    // independent driver-side brute force on an irrational fixture:
    // quantize with the same formula, sum all ordered pairs directly
    val vecs = Seq(
      Array(0.3, -1.2, 0.77), Array(-0.9, 0.4, 0.1),
      Array(2.0, 2.0, -0.5), Array(-0.2, -0.2, -0.2), Array(1.1, 0.0, 0.9))
    val q = vecs.map { v =>
      val nr = math.sqrt(v.map(x => x * x).sum)
      v.map(x => math.floor(1000000.0 * x / nr).toLong)
    }
    val n = q.length
    var num = BigInt(0)
    for (a <- q; b <- q if !(a eq b))
      num += (0 until 3).map(k => BigInt(a(k)) * b(k)).sum
    val want = num.toDouble / (n.toDouble * (n - 1).toDouble * 1.0e12)
    val got = Similarity.isotropy(
      vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")).collect().head
    assert(got.getDouble(2) === want)

    // ragged widths and sub-2 corpora fail loudly, never average
    val ragged = intercept[Exception] {
      Similarity.isotropy(Seq((0L, Array(1.0, 0.0)), (1L, Array(1.0, 0.0, 0.0)))
        .toDF("vec_id", "embedding")).collect()
    }
    assert(ragged.getMessage.contains("ragged embedding widths"))
    val tiny = intercept[Exception] {
      Similarity.isotropy(Seq((0L, Array(1.0, 0.0)))
        .toDF("vec_id", "embedding")).collect()
    }
    assert(tiny.getMessage.contains("at least 2"))
  }

  test("recall audit: full-probe k-center serving scores exactly 1.0; dup served rows don't inflate") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    // full probe (nprobe = numCenters) degenerates to brute force — every
    // neighbor's cell is probed, so recall MUST be exactly 1.0 per query,
    // not approximately: n_hits == n_true as exact longs
    val full = Similarity.recallAudit(emb,
      Similarity.topKIvfKCenter(emb, nprobe = 8, numCenters = 8))
      .orderBy("query_id").collect()
    assert(full.length === 10)
    assert(full.forall(r => r.getLong(1) === 5L && r.getLong(2) === 5L
      && r.getDouble(3) === 1.0),
      s"full-probe recall != 1.0: ${full.mkString(",")}")
    // the audit contract accepts ANY (query_id, neighbor_id, ...) frame:
    // duplicated served rows must not fan out the truth join — n_true
    // stays at the truth cardinality and recall is unchanged
    val served = Similarity.topKIvfKCenter(emb)
    val once = Similarity.recallAudit(emb, served)
      .orderBy("query_id").collect().map(_.toSeq)
    val duped = Similarity.recallAudit(emb, served.unionAll(served))
      .orderBy("query_id").collect().map(_.toSeq)
    assert(once.map(_(1)).forall(_ == 5L), "n_true must be the truth cardinality")
    assert(duped === once)
    // restricted probing can only lose neighbors, never invent them
    assert(once.forall(r => r(2).asInstanceOf[Long] <= r(1).asInstanceOf[Long]))
  }

  test("MRR of a served ranking: full probe is exact, buried truth is priced, all-miss reads zero") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    // full probe degenerates to brute force, so the FIRST served
    // neighbor is always a truth member: first_rank 1, rr 10^6 exactly
    val full = Similarity.mrrServedAudit(emb,
      Similarity.topKIvfKCenter(emb, nprobe = 8, numCenters = 8))
      .orderBy("query_id").collect()
    assert(full.length === 10)
    assert(full.forall(r => r.getLong(1) === 1L && r.getLong(2) === 1000000L))
    // a served list that BURIES the truth behind junk is priced by
    // position — the axis recall@k cannot see: construct query 0's
    // serving with two non-truth rows ahead of a true neighbor
    val truth0 = Similarity.topKBrute(emb).collect()
      .filter(_.getAs[Long]("query_id") == 0L).map(_.getAs[Long]("neighbor_id"))
    val junk = Seq(9000L, 9001L).filterNot(truth0.contains)
    val buried = Seq(
      (0L, junk(0), 1L), (0L, junk(1), 2L), (0L, truth0.head, 3L))
      .toDF("query_id", "neighbor_id", "rank")
    val priced = Similarity.mrrServedAudit(emb, buried)
      .orderBy("query_id").collect()
    assert(priced.length === 10) // queries come from the TRUTH side
    val q0 = priced.find(_.getLong(0) == 0L).get
    assert(q0.getLong(1) === 3L && q0.getLong(2) === 333333L)
    // every other query's served list is empty: the row survives at 0
    priced.filter(_.getLong(0) != 0L).foreach { r =>
      assert(r.isNullAt(1) && r.getLong(2) === 0L)
    }
  }

  test("index increment: appended rows are bit-equal to full-rebuild assignment on the union") {
    // the rolling-ingest contract: assignment against FIXED stored models
    // is per-row, so incrementing the index with a batch must produce
    // exactly the rows a full rebuild over the union corpus would assign
    // to the same ids — any cross-row contamination (retraining, seen-
    // corpus state) would break the equality
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val base = emb.filter(col("vec_id") % 8 =!= 7)
    val batch = emb.filter(col("vec_id") % 8 === 7)
    val cents = Similarity.trainCentroids(base, k = 16, iterations = 2)
    val books = Similarity.trainPqCodebooks(base, iterations = 2)
    val incr = Similarity.indexIncrement(batch, cents, books)
      .orderBy("vec_id", "sub").collect().map(_.toSeq)
    val rebuild = Similarity.buildIndex(emb, cents, books)
      .filter(col("vec_id") % 8 === 7)
      .orderBy("vec_id", "sub").collect().map(_.toSeq)
    assert(incr.nonEmpty)
    assert(incr === rebuild)
    // and the batch rows are complete: m=4 codes per batch vector
    assert(incr.length === batch.count() * 4)
    // an EMPTY batch yields an empty frame with the index schema — a
    // routine streaming event (empty micro-batch), never a crash that
    // would kill annIndexStateSink's query
    val empty = Similarity.indexIncrement(emb.limit(0), cents, books)
    assert(empty.columns.toSeq === Seq("vec_id", "cell", "sub", "code"))
    assert(empty.count() === 0L)
  }

  test("k-center increment equals full-rebuild assignment; serve-through finds late rows") {
    // same rolling-ingest contract as the Lloyd increment, but through
    // the fully-replayable k-center path: assignment against the STORED
    // exemplars is per-row, so the appended rows must be bit-equal to
    // assigning the union corpus against the same exemplars
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val stored = emb.filter(col("vec_id") % 5 =!= 4)
    val batch = emb.filter(col("vec_id") % 5 === 4)
    val incr = Similarity.kCenterIndexIncrement(stored, batch)
      .orderBy("vec_id").collect().map(_.toSeq)
    val union = Similarity.kCenterIndexIncrement(stored, emb)
      .filter(col("vec_id") % 5 === 4)
      .orderBy("vec_id").collect().map(_.toSeq)
    assert(incr.nonEmpty)
    assert(incr === union)
    // every batch vector lands in exactly one cell, and every cell is a
    // stored exemplar id (never a batch id — the artifact is frozen)
    assert(incr.length === batch.count())
    val storedIds = stored.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(incr.forall(r => storedIds.contains(r(1).asInstanceOf[Long])))
  }

  test("PQ: deterministic codebooks, m codes per vector, full shortlist equals brute") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    // bit-identical training across runs — the artifact-is-a-cache premise
    val b1 = Similarity.trainPqCodebooks(emb, m = 4, kCode = 8, iterations = 2)
      .orderBy("sub", "centroid_id").collect().toSeq.map(_.toSeq)
    val b2 = Similarity.trainPqCodebooks(emb, m = 4, kCode = 8, iterations = 2)
      .orderBy("sub", "centroid_id").collect().toSeq.map(_.toSeq)
    assert(b1 === b2)
    // the codebook is (sub, centroid_id, cv) with |cv| = dim/m and every
    // subspace populated — the 64x scan-compression claim's shape
    val bySub = b1.groupBy(_.head.asInstanceOf[Int])
    assert(bySub.keySet === Set(0, 1, 2, 3))
    assert(b1.forall(_(2).asInstanceOf[scala.collection.Seq[Double]].length === 16))
    // an exhaustive shortlist makes the exact rerank reproduce brute force
    // regardless of codebook quality — the arithmetic certificate
    val full = Similarity.topKPqRerank(emb, numQueries = 6,
        shortlist = Int.MaxValue, trainIterations = 1)
      .orderBy("query_id", "rank").collect().toSeq.map(_.toSeq)
    val brute = Similarity.topKBrute(emb, numQueries = 6)
      .orderBy("query_id", "rank").collect().toSeq.map(_.toSeq)
    assert(full === brute)
  }

  test("IVF-PQ with full probe and full shortlist degenerates to brute force") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val got = Similarity.topKIvfPq(emb, numQueries = 6,
        nprobe = Int.MaxValue, shortlist = Int.MaxValue)
      .orderBy("query_id", "rank").collect().toSeq.map(_.toSeq)
    val brute = Similarity.topKBrute(emb, numQueries = 6)
      .orderBy("query_id", "rank").collect().toSeq.map(_.toSeq)
    assert(got === brute)
  }

  test("a partial artifact dir without _SUCCESS is rebuilt, not trusted") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = { val b = new java.io.File("target/test-out").getAbsoluteFile.toPath
      java.nio.file.Files.createDirectories(b)
      java.nio.file.Files.createTempDirectory(b, "centroidsPartial") }.toString
    val path = s"$dir/c"
    // simulate a crash mid-write: a parquet file landed but no _SUCCESS
    val c1 = Similarity.centroidArtifact(emb, path, k = 4, iterations = 0)
    val expected = c1.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    new java.io.File(path, "_SUCCESS").delete()
    val c2 = Similarity.centroidArtifact(emb, path, k = 4, iterations = 0)
    // the rebuild must run (marker restored) and reproduce identical bits
    assert(new java.io.File(path, "_SUCCESS").exists(), "rebuild did not restore the marker")
    assert(c2.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long]) === expected)
  }

  test("centroidArtifact probes through the Hadoop FileSystem, not java.io.File") {
    // An explicit file:-scheme URI path: java.io.File("file:/…") never
    // exists, so the old local-only probe would retrain on EVERY call.
    // The Hadoop-resolved probe must see the artifact on the second call.
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = { val b = new java.io.File("target/test-out").getAbsoluteFile.toPath
      java.nio.file.Files.createDirectories(b)
      java.nio.file.Files.createTempDirectory(b, "centroidsFsUri") }.toString
    val path = s"file:$dir/c"
    assert(!new java.io.File(path, "_SUCCESS").exists()) // the probe java.io.File can't model
    Similarity.centroidArtifact(emb, path, k = 4, iterations = 0)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Similarity.centroidArtifact(emb, path, k = 4, iterations = 0)
      org.apache.spark.sql.graft.Bridge.drainListenerBus(spark)
    } finally spark.sparkContext.removeSparkListener(listener)
    // ≤1: the footer/schema-listing job of the read; a missed probe would
    // schedule the full training cascade (≥4 jobs even at iterations=0)
    assert(jobs.get() <= 1, s"URI-path artifact re-touch ran ${jobs.get()} jobs — probe missed it")
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

  test("chunking: window/stride coverage, overlap, short tail") {
    // 7 tokens, window 3 stride 2 → starts 0,2,4,6: chunks of 3,3,3,1
    val doc = Seq((0L, "t0 t1 t2 t3 t4 t5 t6")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocuments(doc, window = 3, stride = 2)
      .orderBy("chunk_id").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (0L, "t0 t1 t2", 3L), (1L, "t2 t3 t4", 3L),
      (2L, "t4 t5 t6", 3L), (3L, "t6", 1L)))
    // every token covered; consecutive chunks overlap by window - stride
    assert(got.flatMap(_._2.split(" ")).toSet === (0 to 6).map(i => s"t$i").toSet)
  }

  test("oov rate against a tiny vocabulary") {
    // vocab (size 2, by freq then token): "a" (3), "b" (2); doc 1 is fully
    // in-vocab, doc 2 has 2 of 3 occurrences outside it
    val docs = Seq((1L, "a b a"), (2L, "a x y"), (3L, "b")).toDF("doc_id", "text")
    val r = TextAnalysis.oovRate(docs, vocabSize = 2).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r(1L) === ((3L, 3L, 0.0)))
    assert(r(2L)._2 === 1L && math.abs(r(2L)._3 - 2.0 / 3.0) < 1e-15)
    assert(r(3L) === ((1L, 1L, 0.0)))
  }

  test("zipf fit: slope −1 on a perfect 1/r spectrum; exact OLS vs driver moments") {
    import graft.ops.TextAnalysis
    // perfect Zipf: counts 12/6/4/3 at ranks 1..4 → ln c = ln 12 − ln r,
    // so the fitted slope is −1 and the intercept ln 12 (up to the
    // micro-nat quantization of each point)
    val words = Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")
    val perfect = TextAnalysis.zipfFit(
      Seq((0L, words.mkString(" "))).toDF("doc_id", "text")).collect().head
    assert(perfect.getLong(0) === 4L)
    assert(math.abs(perfect.getDouble(1) + 1.0) < 1e-5)
    assert(math.abs(perfect.getDouble(2) - math.log(12.0)) < 1e-5)
    // driver-side exact replication of the quantized OLS on the real
    // corpus: same ranks, same micro-nat points, BigInt moments — the
    // fit must match to the last bit (same JVM log, exact integer sums)
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = TextAnalysis.zipfFit(real, topK = 50).collect().head
    val counts = real.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().collect()
      .map(r2 => r2.getString(0) -> r2.getLong(1))
    val top = counts.sortBy { case (w, c) => (-c, w) }.take(50)
    val pts = top.zipWithIndex.map { case ((_, c), i) =>
      (Math.round(math.log(i + 1.0) * 1e6), Math.round(math.log(c.toDouble) * 1e6))
    }
    val k = BigInt(pts.length)
    val sx = pts.map(p => BigInt(p._1)).sum
    val sy = pts.map(p => BigInt(p._2)).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val den = (k * sxx - sx * sx).toDouble
    assert(got.getLong(0) === top.length.toLong)
    assert(got.getDouble(1) === (k * sxy - sx * sy).toDouble / den)
    assert(got.getDouble(2) === (sy * sxx - sx * sxy).toDouble / den / 1e6)
    // a single-token vocabulary has no line — loud, not NaN
    val e = intercept[Exception](TextAnalysis.zipfFit(
      Seq((0L, "x x x")).toDF("doc_id", "text")).collect())
    assert(e.getMessage.contains("at least 2"))
  }

  test("unigram log-likelihood: quantized sums match a driver-side model, common beats rare") {
    // corpus: N=6 tokens; counts a=3, b=2, z=1
    val docs = Seq((1L, "a a a"), (2L, "b b"), (3L, "z")).toDF("doc_id", "text")
    val r = TextAnalysis.unigramLogLik(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    def qlp(cnt: Long): Long = math.round(math.log(cnt.toDouble / 6.0) * 1e6)
    assert(r(1L) === ((3L, 3 * qlp(3), 3 * qlp(3) / 1e6 / 3)))
    assert(r(2L) === ((2L, 2 * qlp(2), 2 * qlp(2) / 1e6 / 2)))
    assert(r(3L) === ((1L, qlp(1), qlp(1) / 1e6 / 1)))
    // the fluency ordering: all-common > mid > rare, and every score < 0
    assert(r(1L)._3 > r(2L)._3 && r(2L)._3 > r(3L)._3 && r(1L)._3 < 0.0)
  }

  test("ppl buckets: rank terciles partition exactly, ordered head >= middle >= tail") {
    import graft.ops.TextAnalysis
    // 10 scorable docs: a planted head doc repeats the corpus's most
    // common bigram (highest mean log-prob = lowest perplexity) and a
    // planted tail doc is one-off gibberish (every bigram unique)
    val head = "the cat " * 12
    val tail = "zq xv jk wm pf bd ln rs tg hc"
    val mids = (0 until 8).map(i => s"the cat sat on mat $i the cat")
    val docs = (Seq(head.trim, tail) ++ mids).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TextAnalysis.pplBuckets(docs).collect()
      .map(r => r.getAs[String]("bucket") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("min_mq"), r.getAs[Long]("max_mq")))
      .toMap
    // 10 docs → tercile sizes 3/3/4 by the rank rule rn*3 <= n / <= 2n
    assert(out("head")._1 === 3L)
    assert(out("middle")._1 === 3L)
    assert(out("tail")._1 === 4L)
    // bucket score ranges are totally ordered (rank-exact split)
    assert(out("head")._2 >= out("middle")._3,
      "head's worst doc must score >= middle's best")
    assert(out("middle")._2 >= out("tail")._3,
      "middle's worst doc must score >= tail's best")
    // the planted extremes land where CCNet puts them
    val scored = TextAnalysis.bigramScoreFrom(docs,
      TextAnalysis.bigramModel(docs)).collect()
      .map(r => r.getAs[Long]("doc_id") -> Option(r.get(3)).map(_ => r.getDouble(3)))
      .toMap
    assert(scored(0L).get > scored(1L).get,
      "the repeated-bigram doc must out-score the gibberish doc")
  }

  test("ppl sketch buckets equal the exact face when the sample holds the corpus") {
    import graft.ops.TextAnalysis
    // fixture with DISTINCT mean scores (no boundary ties — the tie
    // rule is pinned separately below): with k >= n the bottom-k
    // sample IS the corpus, so the value cuts at ranks
    // floor(n/3)/floor(2n/3) reproduce the rank terciles exactly
    val head = "the cat " * 12
    val tail = "zq xv jk wm pf bd ln rs tg hc"
    val mids = (0 until 8).map(i =>
      (("the cat " * (2 + i)).trim + s" mat$i x$i"))
    val docs = (Seq(head.trim, tail) ++ mids).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // precondition the whole test rests on: all 10 means distinct
    val mqs = graft.ops.TextAnalysis.bigramScoreFrom(docs,
      graft.ops.TextAnalysis.bigramModel(docs)).collect()
      .map(r => r.getLong(2) / math.max(r.getLong(1), 1)).toSeq
    assert(mqs.distinct.size === mqs.size, s"fixture scores tied: $mqs")
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[String]("bucket") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_bigrams"),
          r.getAs[Long]("min_mq"), r.getAs[Long]("max_mq"))).toMap
    val exact = asMap(TextAnalysis.pplBuckets(docs))
    val sketch = asMap(TextAnalysis.pplBucketsSketch(docs, k = 512))
    assert(sketch === exact,
      "full-sample sketch buckets must equal the exact rank terciles")
    // the documented tie rule: docs TIED at a cut value land together
    // in the upper bucket (the exact face splits them by doc_id rank)
    val same = "tied text body " * 6
    val tied = (0L to 5L).map(i => (i, same.trim)).toDF("doc_id", "text")
    val st = asMap(TextAnalysis.pplBucketsSketch(tied))
    assert(st("head")._1 === 6L && !st.contains("middle") && !st.contains("tail"),
      s"all-tied corpus must land whole in head under the value rule: $st")
    // under-sampled corpora still PARTITION (every doc lands in exactly
    // one bucket) and keep the bucket ordering head >= middle >= tail
    val many = (0 until 120).map(i =>
      (i.toLong, s"the cat sat on mat $i the cat " * (1 + i % 3)))
      .toDF("doc_id", "text")
    val sm = asMap(TextAnalysis.pplBucketsSketch(many, k = 16))
    assert(sm.values.map(_._1).sum === 120L, s"buckets must partition: $sm")
    if (sm.contains("head") && sm.contains("middle"))
      assert(sm("head")._3 >= sm("middle")._4,
        "head's worst doc must score >= middle's best")
    if (sm.contains("middle") && sm.contains("tail"))
      assert(sm("middle")._3 >= sm("tail")._4,
        "middle's worst doc must score >= tail's best")
  }

  test("per-language ppl buckets: each lang gets its own terciles, full-sample ≡ per-lang exact") {
    import graft.ops.TextAnalysis
    // two languages with very different score scales — a GLOBAL cut
    // would put every lang-B doc in the tail; the per-lang split must
    // bucket each language against itself
    val langA = (0 until 6).map(i =>
      ((("the cat " * (2 + i)).trim + s" mat$i x$i"), "en"))
    val langB = (0 until 6).map(i =>
      ((("zq xv " * (2 + i)).trim + s" wm$i pf$i"), "zz"))
    val docs = (langA ++ langB).zipWithIndex
      .map { case ((t, l), i) => (i.toLong, t, l) }
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.pplBucketsSketchByLang(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // every lang carries DOCS IN EVERY BUCKET (6 docs → 2/2/2 when
    // scores are distinct) — the claim a global cut would violate
    Seq("en", "zz").foreach { l =>
      Seq("head", "middle", "tail").foreach { b =>
        assert(out.getOrElse((l, b), 0L) === 2L,
          s"($l, $b): ${out.filter(_._1._1 == l)}")
      }
    }
  }

  test("trained langid: NB routes the distinct-script corpus the heuristic cannot") {
    import graft.ops.TextAnalysis
    // four languages with genuinely different character distributions
    // (the real routing signal); ~6 docs each with shared function-word
    // noise so the problem is not trivially separable by one token
    val en = Seq("the quick brown fox jumps over the lazy dog",
      "a stitch in time saves nine they say", "all that glitters is not gold",
      "the early bird catches the worm", "practice makes perfect they insist",
      "better late than never the saying goes")
    val de = Seq("der schnelle braune fuchs springt ueber den faulen hund",
      "uebung macht den meister sagt man", "wer zuletzt lacht lacht am besten",
      "der fruehe vogel faengt den wurm", "aller anfang ist schwer bekanntlich",
      "ende gut alles gut sagt der volksmund")
    val es = Seq("el rapido zorro marron salta sobre el perro perezoso",
      "mas vale tarde que nunca dicen", "no es oro todo lo que reluce",
      "a quien madruga dios le ayuda", "la practica hace al maestro claro",
      "el que rie ultimo rie mejor")
    val zh = Seq("zhong wen pin yin ce shi zi fu chuan la",
      "xue xi shi jian chang le jiu hui shu lian",
      "zao qi de niao er you chong chi ne",
      "shu neng sheng qiao gu ren shuo de dui",
      "xiao de zui hou de ren xiao de zui hao",
      "wan shi kai tou nan da jia dou zhi dao")
    val docs = (en.map(("en", _)) ++ de.map(("de", _)) ++
      es.map(("es", _)) ++ zh.map(("zh", _))).zipWithIndex
      .map { case ((l, t), i) => (i.toLong, t, l) }
      .toDF("doc_id", "text", "lang")
    val nb = TextAnalysis.langIdTrained(docs).collect()
    val nbAcc = nb.count(_.getAs[Boolean]("match")).toDouble / nb.length
    val heur = TextAnalysis.langId(docs).collect()
    val heurAcc = heur.count(_.getAs[Boolean]("match")).toDouble / heur.length
    assert(nbAcc > heurAcc,
      s"trained NB ($nbAcc) must beat the vowel heuristic ($heurAcc)")
    assert(nbAcc >= 0.95, s"NB must route the training corpus: $nbAcc")
    // the stored model is a cache, never a fork: scoring through a
    // parquet round-trip serves identical rows
    val dir = java.nio.file.Files.createTempDirectory("langid-nb").toString
    TextAnalysis.langIdModel(docs).write.mode("overwrite").parquet(dir)
    val stored = TextAnalysis.langIdScoreFrom(docs, spark.read.parquet(dir))
      .orderBy("doc_id").collect().toSeq
    val live = TextAnalysis.langIdTrained(docs).orderBy("doc_id").collect().toSeq
    assert(stored === live, "stored-model scoring diverged from live")
    // unseen grams price at the add-one floor and still route
    // deterministically (no crash, no skip): a pure-OOV doc scores
    // n_grams * round(ln(1/(tot_lang+V))*1e6) per lang — the driver
    // model predicts the winner (smallest total, tie by lang asc)
    val model = TextAnalysis.langIdModel(docs).collect()
    val v = model.find(r => r.isNullAt(0) && r.isNullAt(1)).get.getLong(2)
    val oovText = "#### @@@@ $$$$"
    val expected = model.filter(r => !r.isNullAt(0) && r.isNullAt(1))
      .map(r => r.getString(0) ->
        (oovText.length - 1).toLong *
          math.round(math.log(1.0 / (r.getLong(2) + v)) * 1e6))
      .sortBy { case (l, s) => (-s, l) }.head._1
    val oov = Seq((99L, oovText, "en")).toDF("doc_id", "text", "lang")
    val r = TextAnalysis.langIdScoreFrom(oov, TextAnalysis.langIdModel(docs))
      .collect()(0)
    assert(r.getAs[String]("predicted_lang") === expected,
      s"OOV doc must route by the add-one floor (expected $expected)")
  }

  test("langid gram frame windows by CODE POINT, including the supplementary plane") {
    import graft.ops.TextAnalysis
    // the split-then-index gram build (the linear form that replaced
    // the O(L^2) per-position substring scan) must slice the identical
    // code-point windows: mix BMP text, a supplementary-plane musical
    // symbol (a surrogate PAIR in UTF-16 — a split that broke pairs
    // would emit lone-surrogate garbage grams), CJK, and an emoji
    val texts = Seq((1L, "ab𝄞cd", "x"),      // a𝄞 in the middle
      (2L, "😀😀ok", "y"),           // two emoji lead
      (3L, "中文ab", "x"))
    val docs = texts.toDF("doc_id", "text", "lang")
    val got = TextAnalysis.langIdModel(docs).collect()
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // driver model: window adjacent CODE POINTS
    val expected = texts.flatMap { case (_, t, l) =>
      val cps = t.codePoints().toArray
      cps.sliding(2).filter(_.length == 2).map(w =>
        (l, new String(w, 0, 2)))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got === expected, s"gram frame diverged from code-point windows: $got")
  }

  test("bigram log-likelihood: quantized sums match a driver-side add-one model") {
    // corpus bigrams: doc1 (a,b)(b,a)(a,b)(b,c), doc2 (a,b), doc4 (b,c)(c,a);
    // doc3 is single-token — total output, zero bigrams, NULL mean
    val docs = Seq((1L, "a b a b c"), (2L, "a b"), (3L, "solo"), (4L, "b c a"))
      .toDF("doc_id", "text")
    // the driver model: the exact counts and the same quantize-then-sum
    val all = Seq("a b a b c", "a b", "b c a")
      .flatMap(t => { val w = t.split(" "); w.zip(w.tail) })
    val c12 = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = all.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val vocab = all.map(_._2).distinct.size.toLong
    def qlp(p: (String, String)): Long =
      math.round(math.log((c12(p) + 1).toDouble / (c1(p._1) + vocab)) * 1e6)
    def expect(text: String): (Long, Long, Double) = {
      val w = text.split(" "); val bs = w.zip(w.tail)
      val s = bs.map(qlp).sum
      (bs.length.toLong, s, s / 1e6 / bs.length)
    }
    val r = TextAnalysis.bigramLogLik(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    Seq(1L -> "a b a b c", 2L -> "a b", 4L -> "b c a").foreach { case (id, t) =>
      val (n, s, m) = expect(t)
      assert(r(id).getLong(1) === n, s"doc $id n_bigram")
      assert(r(id).getLong(2) === s, s"doc $id sum_qlp")
      assert(r(id).getDouble(3) === m, s"doc $id mean")
    }
    assert(r(3L).getLong(1) === 0L && r(3L).getLong(2) === 0L && r(3L).isNullAt(3),
      "single-token doc must be total with a NULL mean")
    // order sensitivity: the common continuation (a,b) outscores (b,a)
    assert(qlp(("a", "b")) > qlp(("b", "a")))
  }

  test("bigram stored model: serve equals train on the corpus; unseen bigrams back off") {
    val train = Seq((1L, "a b a b c"), (2L, "a b"), (3L, "b c a"))
      .toDF("doc_id", "text")
    val model = TextAnalysis.bigramModel(train)
    // on the training corpus, scoring through the stored model is the
    // live trainer bit-for-bit (every pair and prefix present)
    val served = TextAnalysis.bigramScoreFrom(train, model)
      .orderBy("doc_id").collect().map(_.toSeq)
    val live = TextAnalysis.bigramLogLik(train)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(served === live)
    // out-of-corpus continuations: driver model with add-one backoff.
    // Corpus counts: c12(a,b)=3, c1(a)=3, c1(b)=3, c1(c)=1, V=3.
    // "a b" seen; "a c" unseen pair, seen prefix -> (0+1)/(3+3);
    // "z q" unseen prefix -> (0+1)/(0+3)
    def q(c12: Long, c1: Long): Long =
      math.round(math.log((c12 + 1).toDouble / (c1 + 3)) * 1e6)
    val eval = Seq((10L, "a c"), (11L, "z q"), (12L, "a b"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.bigramScoreFrom(eval, model).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(10L) === ((1L, q(0, 3))))
    assert(r(11L) === ((1L, q(0, 0))))
    assert(r(12L) === ((1L, q(3, 3))))
    // a frame that is not a model fails loudly
    val e = intercept[IllegalArgumentException](
      TextAnalysis.bigramScoreFrom(eval, Seq((1L, "x")).toDF("doc_id", "text")))
    assert(e.getMessage.contains("model"))
  }

  test("source scorecard: counts, floor pass, dominant language with deterministic tie") {
    val docs = Seq(
      (1L, "the a the a one", "web", "en"),   // high stopword ratio → passes floor
      (2L, "x y z w v", "web", "de"),
      (3L, "p q r s t", "web", "de"),
      (4L, "m n o", "books", "fr"),
      (5L, "u v w", "books", "zh"))           // books: fr/zh tie at 1 → zh (lang desc)
      .toDF("doc_id", "text", "source", "lang")
    val r = graft.ops.TextAnalysis.sourceScorecard(docs, qualityFloor = 0.5).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getString(4))).toMap
    assert(r("web") === ((3L, 15L, "de")))   // de count 2 beats en 1
    assert(r("books") === ((2L, 6L, "zh")))  // tie broken by lang desc
  }

  test("quality: type-token ratio and stopword ratio") {
    val r = TextAnalysis.quality(Seq((0L, "the cat the dog")).toDF("doc_id", "text")).collect()(0)
    assert(r.getAs[Double]("ttr") === 0.75)            // 3 distinct / 4
    assert(r.getAs[Double]("stopword_ratio") === 0.5)  // 2×'the' / 4
  }

  test("pii scrub counts all four kinds and redacts in pinned order") {
    val df = Seq(
      (1L, "mail a@b.co then 1.2.3.4 then c@d.org end"),
      (2L, "clean text no pii"),
      (3L, "card 4111-1111-1111-1234 or 4111111111111234 pay"),
      (4L, "call 555-123-4567 or 555.123.4567 now"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.piiScrub(df).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, 2L, 0L, 0L, 1L, "mail <EMAIL> then <IP> then <EMAIL> end"),
      (2L, 0L, 0L, 0L, 0L, "clean text no pii"),
      (3L, 0L, 2L, 0L, 0L, "card <CARD> or <CARD> pay"),
      (4L, 0L, 0L, 2L, 0L, "call <PHONE> or <PHONE> now")))
  }

  test("pii scrub: a dot-separated phone never half-matches as an IPv4") {
    val got = TextAnalysis.piiScrub(Seq((1L, "dial 555.123.4567 end")).toDF("doc_id", "text"))
      .select("n_phones", "n_ipv4", "redacted").collect()(0)
    assert(got.getLong(0) === 1L && got.getLong(1) === 0L)
    assert(got.getString(2) === "dial <PHONE> end")
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

  test("byte-channel stats stay exact past the Long-safe channel bound") {
    // 30e6 alternating 0/255 bytes on one channel. Two's-complement wrap
    // CANCELS in n·Σv² − (Σv)² while the true difference fits in a signed
    // 64-bit (the identity is exact mod 2^64), so a low-variance input
    // would mask the bug; at maximal variance the difference itself is
    // n²·127.5² ≈ 1.46e19 > 2^63 and the wrapped Long identity goes
    // negative → NaN std — this input must take the exact BigInteger path
    val n = 30000001
    val p = new Array[Byte](n)
    var i = 0
    while (i < n) { p(i) = (if (i % 2 == 0) 0 else 255).toByte; i += 1 }
    val c255 = n / 2L
    val sum = 255L * c255
    val sumSq = 255L * 255L * c255
    val bn = java.math.BigInteger.valueOf(n)
    val num = bn.multiply(java.math.BigInteger.valueOf(sumSq))
      .subtract(java.math.BigInteger.valueOf(sum).pow(2))
    val expected = math.sqrt(num.doubleValue() / bn.pow(2).doubleValue())
    val wrapped = math.sqrt((n * sumSq - sum * sum).toDouble / (n.toLong * n).toDouble)
    assert(wrapped.isNaN || math.abs(wrapped - expected) > 1e-3,
      "test input no longer overflows the Long identity — raise n")
    val stats = graft.functions.DspKernel.byteChannelStats(p, 0, 1)
    assert(stats.getDouble(0) === sum.toDouble / n)
    assert(stats.getDouble(1) === expected)
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

  test("qualityCalibration: monotone sweep with exact endpoint rows") {
    val docs = Seq((1L, "a b c d e f", "en", "A", 11L),   // distinct-heavy → high ttr
                   (2L, "x x x x x x x x", "en", "A", 15L), // repetitive → low score
                   (3L, "the a the a quick brown fox", "en", "B", 27L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = TextAnalysis.qualityCalibration(docs).orderBy("floor_pct").collect()
    assert(rows.length === 21)
    assert(rows.head.getAs[Int]("floor_pct") === 0 && rows.last.getAs[Int]("floor_pct") === 100)
    // floor 0 keeps everything
    assert(rows.head.getAs[Long]("n_docs_pass") === 3L)
    assert(rows.head.getAs[Double]("doc_share") === 1.0)
    // the survivor count can only fall as the floor rises
    val counts = rows.map(_.getAs[Long]("n_docs_pass")).toSeq
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b }, counts)
    // token mass is conserved at the bottom of the sweep
    val totalTokens = 6L + 8L + 7L
    assert(rows.head.getAs[Long]("n_tokens_pass") === totalTokens)
    assert(rows.head.getAs[Double]("token_share") === 1.0)
  }

  test("sourceEntropy: quantized micro-nat terms sum to the exact Shannon entropy") {
    // source A: "a a b" + "a" → counts a=3, b=1, N=4 → H = 3/4·ln(4/3) + 1/4·ln 4
    // source B: "c c" → single token → H = 0
    val docs = Seq((1L, "a a b", "en", "A", 5L), (2L, "a", "en", "A", 1L),
                   (3L, "c c", "en", "B", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.sourceEntropy(docs).orderBy("source").collect()
    val a = r(0); val b = r(1)
    assert(a.getAs[Long]("n_tokens") === 4L && a.getAs[Long]("n_distinct_tokens") === 2L)
    val qa = math.round(-math.log(3.0 / 4) * (3.0 / 4) * 1e6) +
      math.round(-math.log(1.0 / 4) * (1.0 / 4) * 1e6)
    assert(a.getAs[Long]("sum_qent") === qa)
    assert(a.getAs[Double]("entropy_nats") === qa.toDouble / 1e6)
    assert(b.getAs[Long]("n_tokens") === 2L && b.getAs[Long]("sum_qent") === 0L)
  }

  test("bm25TopK matches a driver-replicated model term for term") {
    // corpus: doc0 is the query; docs 1-3 share terms with varying tf/len
    val fix = Seq(
      (0L, "spark query engine"),
      (1L, "spark spark engine runs fast"),
      (2L, "query engine"),
      (3L, "unrelated words entirely here now then")).toDF("doc_id", "text")
    val got = Dedup.bm25TopK(fix, k = 3, numQueries = 1)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Long]("rank"), r.getAs[Double]("bm25")))
    // driver model with the same quantize-before-sum discipline
    val docsT = Map(
      0L -> Seq("spark", "query", "engine"),
      1L -> Seq("spark", "spark", "engine", "runs", "fast"),
      2L -> Seq("query", "engine"),
      3L -> Seq("unrelated", "words", "entirely", "here", "now", "then"))
    val n = docsT.size.toDouble
    val nTokens = docsT.values.map(_.size).sum.toDouble
    val avgdl = nTokens / n
    val dfm = docsT.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size).toMap
    def score(qt: Seq[String], d: Long): Long = {
      val tfs = docsT(d).groupBy(identity).view.mapValues(_.size).toMap
      qt.distinct.flatMap { t =>
        tfs.get(t).map { tf =>
          val idf = math.log((n - dfm(t) + 0.5) / (dfm(t) + 0.5) + 1.0)
          math.round(idf * (tf * 2.2) /
            (tf + 1.2 * (0.25 + 0.75 * docsT(d).size / avgdl)) * 1e6)
        }
      }.sum
    }
    val want = Seq(1L, 2L, 3L).map(d => d -> score(docsT(0L), d))
      .filter(_._2 != 0L)
      .sortBy { case (d, s) => (-s, d) }
      .zipWithIndex.map { case ((d, s), i) => (d, (i + 1).toLong, s.toDouble / 1e6) }
    assert(got.toSeq === want)
  }

  test("hybridTopK fuses the two arms exactly as the driver-side RRF model") {
    // texts and embeddings deliberately DISAGREE about neighborhoods so
    // the fused list mixes both-arm and single-arm entries; the model
    // fuses the op's own arm outputs (each arm has its own spec), so
    // this pins the full-outer join, the 10^6 DIV (60+r) contributions,
    // the missing-arm-contributes-0 rule, and the (rrf desc, id) window
    val docs = Seq(
      (0L, "alpha beta gamma"), (1L, "alpha beta delta"),
      (2L, "alpha epsilon zeta"), (3L, "beta gamma eta"),
      (4L, "theta iota kappa"), (5L, "gamma delta epsilon"))
      .toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)), (3L, Array(0.1f, 0.9f, 0.1f)),
      (4L, Array(0.0f, 0.0f, 1.0f)), (5L, Array(0.5f, 0.5f, 0.0f)))
      .toDF("vec_id", "embedding")
    val lex = Dedup.bm25TopK(docs, k = 3, numQueries = 2).collect()
      .map(r => ((r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")),
        r.getAs[Long]("rank"))).toMap
    val dense = Similarity.topKBrute(emb, k = 3, numQueries = 2).collect()
      .map(r => ((r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")),
        r.getAs[Int]("rank").toLong)).toMap
    def contrib(r: Option[Long]): Long = r.map(x => 1000000L / (60L + x)).getOrElse(0L)
    val want = (lex.keySet ++ dense.keySet).groupBy(_._1).toSeq.flatMap {
      case (q, ks) =>
        ks.toSeq.map { key =>
          val lr = lex.get(key); val dr = dense.get(key)
          (key._2, lr, dr, contrib(lr) + contrib(dr))
        }.sortBy { case (nbr, _, _, rrf) => (-rrf, nbr) }.take(3).zipWithIndex
          .map { case ((nbr, lr, dr, rrf), i) =>
            (q, (i + 1).toLong, nbr, rrf, lr, dr) }
    }.sortBy(t => (t._1, t._2))
    val got = Similarity.hybridTopK(docs, emb, k = 3, depth = 3, numQueries = 2)
      .orderBy("query_id", "rank").collect()
      .map { r =>
        def opt(c: String): Option[Long] =
          if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getAs[Long](c))
        (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
          r.getAs[Long]("neighbor_id"), r.getAs[Long]("rrf"),
          opt("lex_rank"), opt("dense_rank"))
      }.toSeq
    assert(got === want)
    // the disagreement planted above must actually surface single-arm
    // rows (missing arm null), or the full-outer path went untested
    assert(got.exists(t => t._5.isEmpty || t._6.isEmpty),
      "fixture produced no single-arm fused rows")
    // and a doc both arms agree on at moderate rank must beat a doc only
    // one arm found at rank 1: 2*(10^6 DIV 63) > 10^6 DIV 61
    assert(2L * (1000000L / 63L) > 1000000L / 61L)
  }

  test("line dedup flags only the cross-doc boilerplate window and pins the reassembly") {
    // an 8-word boilerplate header shared VERBATIM by docs 1 and 2 at
    // the first window boundary; everything after differs; doc 3 is
    // fully unique — the C4 regime document-level dedup cannot touch
    val boiler = "nav home about contact login search terms privacy"
    val a = boiler + " alpha beta gamma delta epsilon zeta eta theta iota"
    val b = boiler + " one two three four five six seven eight nine"
    val c = "totally unique words that appear in no other document here"
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val got = graft.ops.Dedup.lineDedup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))).toMap
    // driver model: the same fixed-window slicing and reassembly
    def lines(t: String): Seq[String] =
      t.split(" ").grouped(8).map(_.mkString(" ")).toSeq
    val all = Seq(1L -> a, 2L -> b, 3L -> c).flatMap { case (id, t) =>
      lines(t).map(id -> _)
    }
    val nd = all.distinct.groupBy(_._2).view.mapValues(_.size).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    Seq(1L -> a, 2L -> b, 3L -> c).foreach { case (id, t) =>
      val ls = lines(t)
      val dup = ls.count(nd(_) >= 2)
      val kept = ls.filter(nd(_) < 2).mkString(" ")
      assert(got(id) === ((ls.size.toLong, dup.toLong, md5hex(kept),
        1000000L * dup / ls.size)), s"doc $id")
    }
    // the boilerplate really was flagged in BOTH carriers and nowhere else
    assert(got(1L)._2 === 1L)
    assert(got(2L)._2 === 1L)
    assert(got(3L)._2 === 0L)
    // guards: a 1-doc threshold would flag everything — refused
    val ex = intercept[IllegalArgumentException] {
      graft.ops.Dedup.lineDedup(docs, minDocs = 1)
    }
    assert(ex.getMessage.contains("minDocs"))
  }

  test("MRR audit: fusion beats both arms on planted complementary ranks; all-miss reads zero") {
    // query 0's only TRUE neighbor is doc 7; each arm buries it at rank 2
    // behind arm-SPECIFIC junk (doc 1 for lex, doc 2 for dense) — the
    // complementary regime RRF exists for: the arms agree on 7 and
    // disagree on their junk, so 7's two rank-2 contributions
    // (2 × (10^6 DIV 62) = 32258) beat each junk doc's single rank-1
    // contribution (10^6 DIV 61 = 16393) and the fusion leads with it.
    // query 1's true neighbor was retrieved by NEITHER arm.
    val lex = Seq((0L, 1L, 1L), (0L, 7L, 2L), (1L, 3L, 1L))
      .toDF("query_id", "neighbor_id", "lex_rank")
    val dense = Seq((0L, 2L, 1L), (0L, 7L, 2L), (1L, 4L, 1L))
      .toDF("query_id", "neighbor_id", "dense_rank")
    val truth = Seq((0L, 7L), (1L, 9L)).toDF("query_id", "neighbor_id")
    val got = Similarity.mrrFromRanks(lex, dense, truth, k = 5)
      .orderBy("query_id").collect()
    assert(got.length === 2)
    def opt(r: org.apache.spark.sql.Row, c: String): Option[Long] =
      if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getAs[Long](c))
    val q0 = got(0)
    assert(q0.getAs[Long]("query_id") === 0L)
    assert(opt(q0, "lex_first_rank") === Some(2L))
    assert(q0.getAs[Long]("lex_rr") === 500000L)
    assert(opt(q0, "dense_first_rank") === Some(2L))
    assert(q0.getAs[Long]("dense_rr") === 500000L)
    assert(opt(q0, "fused_first_rank") === Some(1L))
    assert(q0.getAs[Long]("fused_rr") === 1000000L)
    // the property the fusion exists for, pinned: fused > each arm
    assert(q0.getAs[Long]("fused_rr") > q0.getAs[Long]("lex_rr"))
    assert(q0.getAs[Long]("fused_rr") > q0.getAs[Long]("dense_rr"))
    // all-miss query: the row survives (never disappears) and reads 0
    val q1 = got(1)
    assert(q1.getAs[Long]("query_id") === 1L)
    for (c <- Seq("lex_first_rank", "dense_first_rank", "fused_first_rank"))
      assert(opt(q1, c) === None, c)
    for (c <- Seq("lex_rr", "dense_rr", "fused_rr"))
      assert(q1.getAs[Long](c) === 0L, c)
    // the real-corpus audit's calibration line: the dense arm IS the
    // truth generator, so its first hit is rank 1 on every query
    val audit = Similarity.mrrAudit(
      Tables.documents(spark, "/root/testdata/sf0.001"),
      Tables.embeddings(spark, "/root/testdata/sf0.001")).collect()
    assert(audit.length === 5)
    audit.foreach { r =>
      assert(r.getAs[Long]("dense_first_rank") === 1L)
      assert(r.getAs[Long]("dense_rr") === 1000000L)
      assert(r.getAs[Long]("fused_rr") >= 0L &&
        r.getAs[Long]("fused_rr") <= 1000000L)
    }
  }

  test("semantic dedup prunes planted clusters to min-id keepers and feeds the leakage-safe split") {
    // three tight clusters on orthogonal axes (intra-cos ≈ 1, inter ≈ 0)
    // plus a lone w-axis vector that lands in SOME cell but sits below
    // the threshold against every cellmate — kept, never pruned
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (10L, Array(0.999f, 0.01f, 0.0f, 0.0f)),
      (11L, Array(0.998f, 0.02f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (12L, Array(0.01f, 0.999f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (13L, Array(0.0f, 0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val keep = Similarity.semanticDedup(emb, threshold = 0.9, k = 3)
      .collect().map { r =>
        r.getAs[Long]("vec_id") ->
          (r.getAs[Long]("keep"),
            if (r.isNullAt(r.fieldIndex("pruned_by"))) None
            else Some(r.getAs[Long]("pruned_by")))
      }.toMap
    assert(keep.keySet === Set(0L, 1L, 2L, 10L, 11L, 12L, 13L))
    // keepers are the cell-local min ids of each duplicate neighborhood;
    // the lone vector survives despite sharing a cell with a cluster
    for (id <- Seq(0L, 1L, 2L, 13L)) assert(keep(id) === ((1L, None)), s"vec $id")
    assert(keep(10L) === ((0L, Some(0L))))
    assert(keep(11L) === ((0L, Some(0L)))) // min pruner, not just any
    assert(keep(12L) === ((0L, Some(1L))))
    // pair frame: exactly the within-cluster pairs, id1 < id2
    val pairs = Similarity.semanticDedupPairs(emb, threshold = 0.9, k = 3)
    val pairSet = pairs.collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    assert(pairSet === Set((0L, 10L), (0L, 11L), (10L, 11L), (1L, 12L)))
    pairs.collect().foreach(r => assert(r.getAs[Double]("cos") >= 0.9))
    // composition: the pair frame drives leakageSafeSplit, so every
    // semantic-dup cluster gets ONE split assignment (the benchmark-
    // leakage path SemDeDup exists to close)
    val docs = emb.select(col("vec_id").as("doc_id"))
    val split = Sampling.leakageSafeSplit(docs, pairs.select("id1", "id2"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(split(0L) === split(10L) && split(0L) === split(11L))
    assert(split(1L) === split(12L))
  }

  test("incremental semantic dedup prunes against the corpus AS SERVED, never against pruned docs") {
    // stored: x-axis pair (0 keeps, 10 at 25 degrees is pruned — cos .906)
    // and a z-axis lone keeper (2). batch: a near-copy of keeper 0 (20),
    // a near-copy of keeper 2 (21), a novel w-axis doc (22), its in-batch
    // dup (23), and the SHARP case (24): 50 degrees in the x-y plane —
    // within tau of the PRUNED 10 (cos 25deg = .906) but outside tau of
    // every KEPT doc (cos 50deg = .64 to 0) — it must SURVIVE, because
    // dedup runs against the corpus as served
    val c25 = math.cos(math.toRadians(25)).toFloat
    val s25 = math.sin(math.toRadians(25)).toFloat
    val c50 = math.cos(math.toRadians(50)).toFloat
    val s50 = math.sin(math.toRadians(50)).toFloat
    val stored = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (10L, Array(c25, s25, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val batch = Seq(
      (20L, Array(0.999f, 0.01f, 0.0f, 0.0f)),
      (21L, Array(0.0f, 0.0f, 0.995f, 0.1f)),
      (22L, Array(0.0f, 0.0f, 0.0f, 1.0f)),
      (23L, Array(0.01f, 0.0f, 0.0f, 0.999f)),
      (24L, Array(c50, s50, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.semanticDedupIncrement(stored, batch,
      threshold = 0.9, k = 2).collect()
      .map { r =>
        r.getAs[Long]("vec_id") -> ((r.getAs[Long]("keep"),
          if (r.isNullAt(r.fieldIndex("pruned_by"))) None
          else Some(r.getAs[Long]("pruned_by"))))
      }.toMap
    // batch rows only — stored keepers are untouched by construction
    assert(got.keySet === Set(20L, 21L, 22L, 23L, 24L))
    assert(got(20L) === ((0L, Some(0L))))  // dup of stored keeper 0
    assert(got(21L) === ((0L, Some(2L))))  // dup of stored keeper 2
    assert(got(22L) === ((1L, None)))      // novel direction
    assert(got(23L) === ((0L, Some(22L)))) // in-batch smaller-id rule
    // the sharp case: 24 duplicates ONLY the pruned stored doc 10
    // (cos 25deg = .906 >= .9) and clears every kept doc (cos 50deg =
    // .64 to keeper 0) — kept, because pruned docs are not served
    assert(got(24L) === ((1L, None)),
      "a doc duplicating only a PRUNED stored doc must survive")
  }

  test("sourceKl: quantized micro-nat terms sum to the exact corpus KL") {
    // same fixture as sourceEntropy: A = {a:3, b:1} of 4; B = {c:2} of 2;
    // corpus N=6 with C_a=3, C_b=1, C_c=2
    val docs = Seq((1L, "a a b", "en", "A", 5L), (2L, "a", "en", "A", 1L),
                   (3L, "c c", "en", "B", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.sourceKl(docs).orderBy("source").collect()
    def q(p: Double, cw: Double): Long =
      math.round((math.log(p) - math.log(cw)) * p * 1e6)
    val lnN = math.round(math.log(6.0) * 1e6)
    val a = r(0); val b = r(1)
    assert(a.getAs[Long]("n_tokens") === 4L)
    assert(a.getAs[Long]("corpus_tokens") === 6L)
    val qa = q(3.0 / 4, 3.0) + q(1.0 / 4, 1.0) + lnN
    assert(a.getAs[Long]("sum_qkl") === qa)
    assert(a.getAs[Double]("kl_nats") === qa.toDouble / 1e6)
    val qb = q(1.0, 2.0) + lnN
    assert(b.getAs[Long]("n_tokens") === 2L && b.getAs[Long]("sum_qkl") === qb)
    // degenerate: a single source IS the corpus ⇒ KL = 0 up to the
    // per-term quantization residue (≤ half a micro-nat per distinct token)
    val solo = Seq((1L, "x y", "en", "S", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r2 = TextAnalysis.sourceKl(solo).collect()(0)
    assert(math.abs(r2.getAs[Long]("sum_qkl")) <= 2L)
  }

  test("sourceKl serve over the entropy state frame equals the direct batch form") {
    val docs = Seq((1L, "a a b", "en", "A", 5L), (2L, "a", "en", "A", 1L),
                   (3L, "c c", "en", "B", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val viaState = TextAnalysis.sourceKlServe(TextAnalysis.entropyPartials(docs))
      .orderBy("source").collect()
    val direct = TextAnalysis.sourceKl(docs).orderBy("source").collect()
    assert(viaState.toSeq === direct.toSeq)
  }

  test("multimodal: JPEG marker walk and FLAC bit-group decode round-trip the built bytes") {
    val docs = Seq((6L, "pixels go here....", "en", "src", 18L),
                   (7L, "some payload bytes", "en", "src", 18L),
                   (8L, "another image body!", "en", "src", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.codecFrame(docs)
    val rows = Multimodal.decodeCodecHeaders(media).orderBy("doc_id").collect()
    val j6 = rows(0); val f7 = rows(1); val j8 = rows(2)
    // doc 6 (image → jpeg): COM len = 6%13+1 = 7 → SOF at 25+7 = 32
    assert(j6.getAs[String]("container") === "jpeg")
    assert(j6.getAs[Int]("sof_off") === 32)
    assert(j6.getAs[Int]("width") === 6 % 640 + 64)
    assert(j6.getAs[Int]("height") === 6 % 480 + 48)
    assert(j6.getAs[Int]("sof_precision") === 8 && j6.getAs[Int]("n_components") === 3)
    assert(j6.getAs[Int]("n_bytes") === 45 + 7 + 18)
    assert(j6.isNullAt(j6.fieldIndex("sample_rate")))
    // doc 8 (video → jpeg) lands SOF at a DIFFERENT offset: COM len
    // 8%13+1 = 9 → SOF at 34 — the walk really is per-row variable
    assert(j8.getAs[Int]("sof_off") === 25 + 8 % 13 + 1)
    assert(j8.getAs[Int]("width") === 8 % 640 + 64)
    // doc 7 (audio → flac)
    assert(f7.getAs[String]("container") === "flac")
    assert(f7.getAs[Int]("sample_rate") === (7 % 8) * 4000 + 8000)
    assert(f7.getAs[Int]("channels") === 2)
    assert(f7.getAs[Int]("bits_per_sample") === 16)
    assert(f7.getAs[Long]("total_samples") === 18L / (2 * 2))
    assert(f7.getAs[Int]("n_bytes") === 42 + 18)
    assert(f7.isNullAt(f7.fieldIndex("width")))
    // byte-level golden checks on the built containers
    val payloads = media.orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    val jp = payloads(6L)
    assert((jp(0) & 0xff) === 0xFF && (jp(1) & 0xff) === 0xD8)          // SOI
    assert((jp(jp.length - 2) & 0xff) === 0xFF && (jp.last & 0xff) === 0xD9) // EOI
    assert((jp(31) & 0xff) === 0xFF && (jp(32) & 0xff) === 0xC0)        // SOF0 at walked offset (0-based 31)
    assert(((jp(36) & 0xff) << 8 | (jp(37) & 0xff)) === 6 % 480 + 48)   // height BE at sof+5
    val fp = payloads(7L)
    assert(new String(fp.take(4), "US-ASCII") === "fLaC")
    assert((fp(4) & 0xff) === 0x80 && (fp(7) & 0xff) === 0x22)          // last STREAMINFO, len 34
    val packed = (18 until 26).foldLeft(0L)((a, i) => (a << 8) | (fp(i) & 0xff))
    assert((packed >>> 44) === (7 % 8) * 4000 + 8000)
    assert(((packed >>> 41) & 7) + 1 === 2)
  }

  test("jpeg walk exhausting its segment bound yields null fields, not a garbage read") {
    // SOI + nine 3-byte COM segments (one more than the 8-hop bound)
    // before SOF0: the walk must give up cleanly — sof_off and every
    // SOF-relative field null — instead of decoding from a wrong offset
    val segs = "FFFE0003AA" * 9
    val hexPayload = "FFD8" + segs + "FFC0001108" + "0040" + "0050" +
      "03012200021101031101" + "FFD9"
    val df = Seq((1L, "image")).toDF("doc_id", "media_type")
      .withColumn("payload", unhex(lit(hexPayload)))
    val r = Multimodal.decodeCodecHeaders(df).collect()(0)
    assert(r.getAs[String]("container") === "jpeg")
    assert(r.isNullAt(r.fieldIndex("sof_off")))
    assert(r.isNullAt(r.fieldIndex("width")) && r.isNullAt(r.fieldIndex("height")))
    // and the codec feature path must null out too, not read a wrong body
    val f = Multimodal.extractCodecFeatures(df).collect()(0)
    assert(f.isNullAt(f.fieldIndex("feature")))
  }

  test("codec-body DSP equals the BMP/WAV features on the same text bodies") {
    // mediaFrame and codecFrame wrap the SAME text bytes in different
    // containers with the same audio/image split — so the dynamic-offset
    // JPEG kernel (walked SOF + EOI trim) and the fixed-42 FLAC kernel
    // must land bit-identically on the BMP/WAV feature values; any
    // off-by-one in the walked body offset or the tail trim breaks this
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val viaCodec = Multimodal.extractCodecFeatures(Multimodal.codecFrame(docs))
      .select("doc_id", "feature").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val viaBmpWav = Multimodal.extractFeatures(Multimodal.mediaFrame(docs))
      .select("doc_id", "feature").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(viaCodec.length === viaBmpWav.length && viaCodec.nonEmpty)
    assert(viaCodec.toSeq === viaBmpWav.toSeq)
  }

  test("ingest envelopes round-trip through to_json/from_json/explode") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val back = Ingest.splitEnvelopes(Ingest.envelopes(ev))
    val orig = ev.select("event_id", "event_type", "value")
    assert(back.count() === orig.count())
    assert(back.exceptAll(orig).count() === 0)
  }

  test("principal direction matches a driver-side exact replay and finds a planted axis") {
    // the distributed power iteration must be BIT-equal to a plain JVM
    // replay of the same quantized rounds (partitioning-invariant: the
    // one cross-row sum is integer), and on data with an overwhelming
    // planted axis it must actually find it
    val d = 6
    val rnd = new scala.util.Random(42)
    // planted: strong axis 2, noise elsewhere
    val vecs = (0L until 40L).map { i =>
      val sign = if (i % 2 == 0) 1.0f else -1.0f
      (i, Array.tabulate(d)(j =>
        if (j == 2) sign * (3.0f + rnd.nextFloat())
        else (rnd.nextFloat() - 0.5f) * 0.2f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.principalDirection(df, iters = 8)
      .orderBy("dim").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    // exact model: a SEQUENTIAL Gram matrix from the raw vecs (the
    // distributed scan must be partitioning-invariant — its one
    // cross-row sum is integer), then the same driver rounds
    val g = Array.ofDim[Long](d, d)
    vecs.foreach { case (_, xf) =>
      val q = xf.map(x => math.floor(1000.0 * x.toDouble).toLong)
      for (i <- 0 until d; j <- 0 until d) g(i)(j) += q(i) * q(j)
    }
    var vq = Array.fill(d)(math.floor(1000000.0 / math.sqrt(d.toDouble)).toLong)
    var v = Array.fill(d)(0.0)
    var lambda = 0.0
    for (_ <- 1 to 8) {
      val y = Array.tabulate(d)(j =>
        (0 until d).foldLeft(BigInt(0))((a, k) => a + BigInt(g(j)(k)) * BigInt(vq(k))))
      val ss = y.foldLeft(BigInt(0))((a, yj) => a + yj * yj)
      val norm = math.sqrt(ss.toDouble)
      lambda = norm / 1.0e12
      v = y.map(_.toDouble / norm).toArray
      vq = v.map(x => math.floor(1000000.0 * x).toLong)
    }
    got.foreach { case (dim, loading, lam) =>
      assert(loading === v(dim), s"dim $dim")
      assert(lam === lambda)
    }
    // the planted axis dominates the direction
    assert(math.abs(v(2)) > 0.95, s"expected axis 2 to dominate, got ${v.toSeq}")
  }

  test("spectral family raises loudly on ragged or all-zero corpora") {
    // a mixed-dimension corpus must fail, not silently null-pad
    // loadings; an all-zero one has no principal direction and must
    // raise instead of propagating NaN to every consumer
    val ragged = Seq((0L, Array(1.0f, 2.0f)), (1L, Array(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      Similarity.principalDirection(ragged)
    }
    assert(e1.getMessage.contains("ragged"), e1.getMessage)
    val zeros = Seq((0L, Array(0.0f, 0.0f)), (1L, Array(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException] {
      Similarity.principalDirection(zeros)
    }
    assert(e2.getMessage.contains("no principal direction"), e2.getMessage)
  }

  test("deflated directions: component 1 unchanged, near-orthogonal, decreasing lambda") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val both = Similarity.principalDirections(emb, components = 2)
      .orderBy("component", "dim").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    val v1 = both.filter(_._1 == 1).sortBy(_._2).map(_._3)
    val v2 = both.filter(_._1 == 2).sortBy(_._2).map(_._3)
    val single = Similarity.principalDirection(emb)
      .orderBy("dim").collect().map(_.getDouble(1))
    assert(v1.toSeq === single.toSeq,
      "deflation must not perturb the leading direction")
    val dot12 = v1.zip(v2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot12) < 1e-2,
      s"components must be near-orthogonal (quantization residual), got $dot12")
    // NO lambda-monotonicity assert: the estimates only order once the
    // iteration has converged, and this synthetic corpus's spectrum is
    // nearly flat — 8 rounds fix COST, not convergence (documented)
    assert(math.abs(v2.map(x => x * x).sum - 1.0) < 1e-12, "v2 unit norm")
  }

  test("2-D coords: c1 is the axis score, c2 is the residual coordinate, energy bounded") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val both = Similarity.principalDirections(emb, components = 2)
      .orderBy("component", "dim").collect()
    val a1 = both.filter(_.getInt(0) == 1).map(_.getDouble(2)).toSeq
    val a2 = both.filter(_.getInt(0) == 2).map(_.getDouble(2)).toSeq
    val coords = Similarity.principalCoords(emb, a1, a2)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    val scores = Similarity.principalScores(emb, a1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    coords.foreach { case (id, c1, _) =>
      assert(c1 === scores(id), s"vec $id: c1 must BE the axis-1 score")
    }
    // projection energy cannot exceed the vector's (unit axes, c2 on the
    // residual): c1^2 + c2^2 <= ||x||^2 up to the quantization residual
    val norms = emb.select(col("vec_id"),
        graft.functions.VectorFunctions.dot(
          Similarity.toDouble(col("embedding")),
          Similarity.toDouble(col("embedding"))).as("nn"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    coords.foreach { case (id, c1, c2) =>
      assert(c1 * c1 + c2 * c2 <= norms(id) * (1.0 + 1e-6) + 1e-9, s"vec $id")
    }
  }

  test("axis outlier screen equals a driver-side exact median/MAD on the projections") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val axis = Similarity.principalDirection(emb)
      .orderBy("dim").collect().map(_.getDouble(1)).toSeq
    val got = Similarity.axisOutliers(emb).orderBy("label").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // independent replay: collected scores, integer median/MAD per label
    val scores = Similarity.principalScores(emb, axis)
      .join(emb.select("vec_id", "label"), "vec_id")
      .collect().map(r => (r.getAs[Int]("label"), math.floor(r.getAs[Double]("score") * 1e6).toLong))
    def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply(((xs.size + 1) / 2) - 1)
    val want = scores.groupBy(_._1).map { case (label, rows) =>
      val qv = rows.map(_._2).toSeq
      val med = lowerMedian(qv)
      val dev = qv.map(q => math.abs(q - med))
      val mad = lowerMedian(dev)
      label -> (qv.size.toLong, med, mad, dev.count(_ > 3L * mad).toLong)
    }
    got.foreach { case (label, n, med, mad, nOut) =>
      assert((n, med, mad, nOut) === want(label), s"label $label")
    }
    assert(got.length === want.size)
  }
}
