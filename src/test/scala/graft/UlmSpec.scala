package graft

import org.apache.spark.sql.functions._
import graft.ops.Ulm

/** The unigram-LM tokenizer: hand-computed fixture (every count and
  * micro-nat cost pinned), structural segmentation invariants on the
  * real corpus, determinism, and the pricing-universe contract. */
class UlmSpec extends SparkSpec {
  import spark.implicits._

  test("hand fixture: counts, costs, and the Viterbi pick are exactly as computed") {
    // corpus "ab ab b": words ab(2), b(1); substrings a(2), b(3), ab(2);
    // V=3, total0=7 → seed costs a:-round(ln(3/10)e6)=1203973,
    // b:916291, ab:1203973. Viterbi("ab"): a+b=2120264 > ab=1203973 →
    // "ab" wins. Hard counts ab:2, b:1, total 3 → final costs
    // ab:-round(ln(3/6)e6)=693147, b:-round(ln(2/6)e6)=1098612.
    val docs = Seq((1L, "ab ab b", "en", "s")).toDF("doc_id", "text", "lang", "source")
    val vocab = Ulm.vocab(docs).orderBy("piece").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(vocab.toSeq === Seq(("ab", 2L, 693147L), ("b", 1L, 1098612L)))
    val toks = Ulm.tokenCounts(docs).collect()(0)
    assert(toks.getAs[Long]("n_words") === 3L)
    assert(toks.getAs[Long]("n_ulm_tokens") === 3L) // ab, ab, b → one piece each
  }

  test("segmentations concatenate back to their words, pieces bounded, deterministic") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val segs = Ulm.model(docs)._2.collect()
    assert(segs.nonEmpty)
    segs.foreach { r =>
      val word = r.getAs[String]("word")
      val pieces = r.getAs[String]("seg").split(" ")
      assert(pieces.mkString("") === word, s"seg does not reassemble $word")
      assert(pieces.forall(p => p.nonEmpty && p.length <= Ulm.maxPieceLen))
      assert(r.getAs[Long]("n_pieces") === pieces.length.toLong)
    }
    // the LM actually compresses: multi-char pieces are in use
    assert(segs.exists(_.getAs[String]("seg").split(" ").exists(_.length > 1)),
      "no multi-char piece survived training — degenerate char model")
    // fixed rounds are bit-deterministic
    val again = Ulm.model(docs)._2.orderBy("word").collect().map(_.toSeq)
    assert(again === Ulm.model(docs)._2.orderBy("word").collect().map(_.toSeq))
  }

  test("segment artifact: train once, price many — a re-touch runs zero training jobs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = { val b = new java.io.File("target/test-out").getAbsoluteFile.toPath
      java.nio.file.Files.createDirectories(b)
      java.nio.file.Files.createTempDirectory(b, "ulm") }.toString
    val path = s"$dir/segs"
    val stored = Ulm.segmentArtifact(docs, path)
    assert(new java.io.File(path, "_SUCCESS").exists())
    // pricing through the stored table equals the live-trained pricing
    val viaStored = Ulm.tokenCountsFrom(docs, stored)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(viaStored === Ulm.tokenCounts(docs).orderBy("doc_id")
      .collect().map(_.toSeq))
    // second touch must READ, not retrain: poison the corpus (a retrain
    // would change the word statistic) and count scheduled jobs
    val poisoned = docs.filter(col("doc_id") =!= 0)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val again =
      try {
        val r = Ulm.segmentArtifact(poisoned, path)
        org.apache.spark.sql.graft.Bridge.drainListenerBus(spark)
        r.collect()
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs.get() <= 2,
      s"second segmentArtifact call ran ${jobs.get()} jobs — it retrained")
    assert(again.map(_.toSeq).sortBy(_.toString) ===
      stored.collect().map(_.toSeq).sortBy(_.toString))
    // the serve side validates stored frames loudly
    val junk = Seq((1L, "a")).toDF("word", "n")
    val e = intercept[IllegalArgumentException](Ulm.tokenCountsFrom(docs, junk))
    assert(e.getMessage.contains("n_pieces"))
  }

  test("pricing covers exactly the trained word universe; fertility sits in its bounds") {
    // uppercase and over-long words are OUTSIDE the vocabulary contract
    // (the oracle's DP unroll bound) — excluded from pricing, loudly
    // documented, never silently mis-segmented
    val docs = Seq(
      (1L, "Hello thiswordisfartoolongtoprice ab ab", "en", "s"),
      (2L, "", "en", "s")).toDF("doc_id", "text", "lang", "source")
    val t = Ulm.tokenCounts(docs).orderBy("doc_id").collect()
    assert(t(0).getAs[Long]("n_words") === 2L) // only the two "ab"
    assert(t(1).getAs[Long]("n_words") === 0L)
    assert(t(1).getAs[Long]("n_ulm_tokens") === 0L)
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val f = Ulm.fertility(real).collect()
    assert(f.nonEmpty)
    f.foreach { r =>
      val fert = r.getAs[Double]("fertility")
      // >= 1 piece per word; < the word length upper bound
      assert(fert >= 1.0 && fert <= Ulm.maxWordLen.toDouble, r.toString)
    }
    // tokens are bounded by characters priced and below char-level cost
    val tc = Ulm.tokenCounts(real)
      .agg(sum("n_words").as("w"), sum("n_ulm_tokens").as("t")).collect()(0)
    assert(tc.getAs[Long]("t") >= tc.getAs[Long]("w"))
  }
}
