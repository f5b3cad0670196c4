package graft

import org.apache.spark.sql.functions._
import graft.ops.Sketches

/** HyperLogLog register/estimate fixtures: the registers replay the
  * portable md5 exactly (JVM-recomputed), merge is lossless, and the
  * estimate lands inside the published error envelope in BOTH regimes
  * (linear counting and raw harmonic). */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def jvmMd5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def jvmRegister(v: String): (Int, Int) = {
    val h = jvmMd5Hex("hll:" + v)
    val bucket = (Integer.parseInt(h.substring(0, 3), 16) % 512)
    val x = java.lang.Long.parseLong(h.substring(3, 18), 16)
    val rho = if (x == 0L) 61 else 61 - (64 - java.lang.Long.numberOfLeadingZeros(x))
    (bucket, rho)
  }

  test("hll registers replay the portable md5 bit-for-bit (JVM recompute)") {
    val vals = Seq(17L, 23L, 99L, 100000L, 7L)
    val df = vals.map(Tuple1(_)).toDF("user_id")
    val got = Sketches.hllRegisters(df, col("user_id"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toMap
    val want = vals.map(v => jvmRegister(v.toString))
      .groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
    assert(got === want)
  }

  test("hll merge of two shards equals the sketch of the union; dups are free") {
    val a = (0L until 400L).map(Tuple1(_)).toDF("user_id")
    val b = (200L until 700L).map(Tuple1(_)).toDF("user_id") // overlaps a
    val merged = Sketches.hllMerge(
      Sketches.hllRegisters(a, col("user_id")),
      Sketches.hllRegisters(b, col("user_id")))
      .orderBy("bucket").collect().toSeq
    val whole = Sketches.hllRegisters(
      (0L until 700L).map(Tuple1(_)).toDF("user_id"), col("user_id"))
      .orderBy("bucket").collect().toSeq
    assert(merged === whole)
    // each occurrence hashes identically, so copies cannot move a register
    val withDups = Sketches.hllRegisters(
      ((0L until 700L) ++ (0L until 700L)).map(Tuple1(_)).toDF("user_id"),
      col("user_id")).orderBy("bucket").collect().toSeq
    assert(withDups === whole)
  }

  test("hll estimate: raw-harmonic regime lands inside 3 standard errors") {
    // 20000 distinct >> 2.5·m = 1280, so the raw branch is exercised;
    // md5 is fixed, so the realized error is a deterministic constant —
    // the assert pins it inside 3·1.04/√512 ≈ 13.8%
    val df = (0L until 20000L).map(Tuple1(_)).toDF("user_id")
    val cert = Sketches.hllCertificate(df, col("user_id")).collect()(0)
    assert(cert.getAs[Long]("n_exact") === 20000L)
    assert(math.abs(cert.getAs[Double]("rel_err")) < 0.138,
      s"realized error ${cert.getAs[Double]("rel_err")} outside the envelope")
    // the serve path over the builder's registers reproduces the same estimate
    val served = Sketches.hllEstimate(
      Sketches.hllRegisters(df, col("user_id"))).collect()(0)
    assert(served.getAs[Double]("est_hll") === cert.getAs[Double]("est_hll"))
  }

  test("hll estimate: empty input estimates exactly zero, never NaN") {
    val df = Seq.empty[Tuple1[Long]].toDF("user_id")
    val cert = Sketches.hllCertificate(df, col("user_id")).collect()(0)
    assert(cert.getAs[Long]("n_exact") === 0L)
    assert(cert.getAs[Long]("n_present") === 0L)
    assert(cert.getAs[Double]("est_hll") === 0.0)
    assert(cert.isNullAt(cert.fieldIndex("rel_err")))
  }

  test("per-key hll certificate equals the single-key certificate slice by slice") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val by = Sketches.hllCertificateBy(events, Seq("event_type"), col("user_id"))
      .orderBy("event_type").collect()
    assert(by.nonEmpty)
    by.foreach { r =>
      val k = r.getAs[String]("event_type")
      val solo = Sketches.hllCertificate(
        events.filter(col("event_type") === k), col("user_id")).collect()(0)
      assert(r.toSeq.drop(1) === solo.toSeq, s"key $k")
    }
  }

  test("hll overlap certificate: inclusion-exclusion lands near the planted intersection") {
    // A = users 0..999, B = users 500..1499 → exact overlap 500; both
    // slices in the linear-counting regime where the estimates are tight
    val rows = (0L until 1000L).map(u => ("click", u)) ++
      (500L until 1500L).map(u => ("purchase", u))
    val df = rows.toDF("event_type", "user_id")
    val r = Sketches.hllOverlapCertificate(df, col("event_type"),
      col("user_id"), "click", "purchase").collect()(0)
    assert(r.getAs[Long]("n_a_exact") === 1000L)
    assert(r.getAs[Long]("n_b_exact") === 1000L)
    assert(r.getAs[Long]("n_overlap_exact") === 500L)
    // the union estimate can never exceed the sum of the parts
    assert(r.getAs[Double]("est_union") <=
      r.getAs[Double]("est_a") + r.getAs[Double]("est_b"))
    // difference-of-estimates error is amplified; 15% is generous here
    assert(math.abs(r.getAs[Double]("rel_err_overlap")) < 0.15,
      s"overlap err ${r.getAs[Double]("rel_err_overlap")}")
  }

  test("cms cells replay the salted md5 columns bit-for-bit (JVM recompute)") {
    val counts = Seq(("alpha", 5L), ("beta", 3L), ("gamma", 2L)).toDF("w", "cnt")
    val got = Sketches.cmsCells(counts).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val want = (for {
      (w, c) <- Seq(("alpha", 5L), ("beta", 3L), ("gamma", 2L))
      i <- 0 until 4
    } yield ((i, Integer.parseInt(jvmMd5Hex(s"cms:$i:$w").substring(0, 3), 16) % 1024), c))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    assert(got === want)
  }

  test("cms merge of two shards equals the sketch of the summed counts") {
    val cA = Seq(("x", 4L), ("y", 1L)).toDF("w", "cnt")
    val cB = Seq(("y", 2L), ("z", 7L)).toDF("w", "cnt")
    val whole = Seq(("x", 4L), ("y", 3L), ("z", 7L)).toDF("w", "cnt")
    val merged = Sketches.cmsMerge(Sketches.cmsCells(cA), Sketches.cmsCells(cB))
      .orderBy("row", "col").collect().toSeq
    val direct = Sketches.cmsCells(whole).orderBy("row", "col").collect().toSeq
    assert(merged === direct)
  }

  test("cms certificate: estimates never undercount and match the exact head here") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = Sketches.cmsCertificate(docs, k = 20).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L, r.toString)
      assert(r.getAs[Long]("est_cms") >= r.getAs[Long]("n_exact"), r.toString)
    }
    // the exact column really is the corpus count
    val top = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().orderBy(col("count").desc, col("w")).limit(1).collect()(0)
    val lead = rows.maxBy(_.getAs[Long]("n_exact"))
    assert(lead.getAs[String]("token") === top.getString(0))
    assert(lead.getAs[Long]("n_exact") === top.getLong(1))
  }

  test("bloom positions replay the md5 slices bit-for-bit (JVM recompute)") {
    val vals = Seq("alpha", "beta", "gamma")
    val df = vals.map(Tuple1(_)).toDF("v")
    val got = Sketches.bloomBits(df, col("v")).collect().map(_.getInt(0)).toSet
    val want = vals.flatMap { v =>
      val h = jvmMd5Hex("bloom:" + v)
      (0 until 4).map(i => Integer.parseInt(h.substring(4 * i, 4 * i + 4), 16) % 32768)
    }.toSet
    assert(got === want)
  }

  test("bloom certificate: zero false negatives, FPR inside the envelope") {
    // corpus n=2000, m=32768, k=4 → expected FPR (1−e^{−kn/m})^4 ≈ 0.0022;
    // md5 is fixed, so the realized rate is a deterministic constant —
    // pinned under 0.01 (≈4.5× the expectation, generous for one draw)
    val corpus = (0L until 2000L).map(i => Tuple1(s"doc-$i")).toDF("text")
    val probes = ((0L until 1000L).map(i => s"doc-$i") ++        // members
      (0L until 5000L).map(i => s"unseen-$i")).map(Tuple1(_)).toDF("text")
    val r = Sketches.bloomCertificate(corpus, probes, col("text")).collect()(0)
    assert(r.getAs[Long]("n_probes") === 6000L)
    assert(r.getAs[Long]("n_members") === 1000L)
    assert(r.getAs[Long]("n_false_neg") === 0L)
    assert(r.getAs[Double]("fpr_measured") < 0.01,
      s"measured FPR ${r.getAs[Double]("fpr_measured")}")
    // every member is a hit: hits = members + false positives exactly
    assert(r.getAs[Long]("n_bloom_hits") ===
      1000L + r.getAs[Long]("n_false_pos"))
  }

  test("dim truncation audit: a zero tail half makes truncated serving exact") {
    // vectors whose last half is all zeros: cosine over the first half
    // IS the full cosine, so recall@k must be exactly 1.0 for every query
    val rnd = new scala.util.Random(7)
    val rows = (0L until 40L).map { i =>
      val head = Array.fill(8)(rnd.nextFloat())
      (i, head ++ Array.fill(8)(0.0f))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val r = graft.ops.Similarity.dimTruncationAudit(emb).collect()
    assert(r.length === 10)
    r.foreach { row =>
      assert(row.getAs[Double]("recall") === 1.0, row.toString)
      assert(row.getAs[Long]("n_hits") === row.getAs[Long]("n_true"))
    }
  }

  test("hll precision bound rejects out-of-range b before any job") {
    intercept[IllegalArgumentException] {
      Sketches.hllRegisters(Seq(Tuple1(1L)).toDF("user_id"), col("user_id"), b = 13)
    }
    intercept[IllegalArgumentException] {
      Sketches.hllRegisters(Seq(Tuple1(1L)).toDF("user_id"), col("user_id"), b = 3)
    }
    // m < 128 would use the closed-form alpha outside its published
    // domain (the per-m constants differ there) — rejected, not biased
    intercept[IllegalArgumentException] {
      Sketches.hllRegisters(Seq(Tuple1(1L)).toDF("user_id"), col("user_id"), b = 6)
    }
  }

  test("cms probe for a never-seen token estimates zero, not a vanished row") {
    // absent cells are implicit zeros in a true count-min: the min must
    // include them, so an all-absent probe survives with estimate 0 and
    // a some-absent probe can never exceed its present-cell minimum
    val counts = Seq(("alpha", 5L), ("beta", 3L)).toDF("w", "cnt")
    val probes = Seq("alpha", "never-in-corpus").map(Tuple1(_)).toDF("w")
    val got = Sketches.cmsEstimate(Sketches.cmsCells(counts), probes)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set("alpha", "never-in-corpus"))
    assert(got("alpha") >= 5L)
    assert(got("never-in-corpus") === 0L)
  }

  test("kmv merge of two shards equals the sketch of the union; exact below k") {
    val a = (0L until 5000L).map(Tuple1(_)).toDF("v")
    val b = (3000L until 9000L).map(Tuple1(_)).toDF("v") // overlaps a
    val merged = Sketches.kmvMerge(
      Sketches.kmvSketch(a, col("v")), Sketches.kmvSketch(b, col("v")))
      .orderBy("h").collect().toSeq
    val whole = Sketches.kmvSketch(
      (0L until 9000L).map(Tuple1(_)).toDF("v"), col("v"))
      .orderBy("h").collect().toSeq
    assert(merged === whole)
    // below k distinct values the sketch holds every hash → exact count
    val small = (0L until 100L).map(Tuple1(_)).toDF("v")
    val est = Sketches.kmvEstimate(Sketches.kmvSketch(small, col("v"))).collect()(0)
    assert(est.getAs[Long]("n_in_sketch") === 100L)
    assert(est.getAs[Double]("est_kmv") === 100.0)
  }

  test("kmv estimate lands inside 3 standard errors on 20k distinct") {
    // (k−1)/h_k estimator, std error ≈ 1/√(k−2) ≈ 6.3% at k=256; md5 is
    // fixed so the realized error is deterministic (measured −0.60%)
    val df = (0L until 20000L).map(Tuple1(_)).toDF("v")
    val est = Sketches.kmvEstimate(Sketches.kmvSketch(df, col("v"))).collect()(0)
    assert(est.getAs[Long]("n_in_sketch") === 256L)
    val rel = est.getAs[Double]("est_kmv") / 20000.0 - 1.0
    assert(math.abs(rel) < 0.19, s"realized kmv error $rel outside 3 std errors")
  }

  test("kmv overlap keeps bounded error where hll inclusion-exclusion degrades") {
    // planted SMALL intersection: |A∩B| = 500 of |A∪B| = 20500 (2.4%).
    // HLL's est(A)+est(B)−est(U) subtracts three ~10-20k estimates to
    // reach 500, so its per-estimate error is amplified ~40× (measured
    // +75.3% here); KMV reads the intersection directly off the union's
    // bottom-k sample (measured +11.7% at the same k=256 state size)
    val rows = (0L until 10500L).map(u => ("click", u)) ++
      (10000L until 20500L).map(u => ("purchase", u))
    val df = rows.toDF("event_type", "user_id")
    val kmv = Sketches.kmvOverlapCertificate(df, col("event_type"),
      col("user_id"), "click", "purchase").collect()(0)
    assert(kmv.getAs[Long]("n_a_exact") === 10500L)
    assert(kmv.getAs[Long]("n_b_exact") === 10500L)
    assert(kmv.getAs[Long]("n_overlap_exact") === 500L)
    val kmvErr = kmv.getAs[Double]("rel_err_overlap")
    assert(math.abs(kmvErr) < 0.25, s"kmv overlap err $kmvErr")
    val hll = Sketches.hllOverlapCertificate(df, col("event_type"),
      col("user_id"), "click", "purchase").collect()(0)
    val hllErr = hll.getAs[Double]("rel_err_overlap")
    assert(math.abs(kmvErr) < math.abs(hllErr),
      s"kmv $kmvErr should beat inclusion-exclusion $hllErr on a small intersection")
  }

  test("per-key kmv certificate equals the single-set certificate slice by slice") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val by = Sketches.kmvCertificateBy(events, Seq("event_type"), col("user_id"))
      .orderBy("event_type").collect()
    assert(by.nonEmpty)
    by.foreach { r =>
      val key = r.getAs[String]("event_type")
      val slice = events.filter(col("event_type") === key)
      val est = Sketches.kmvEstimate(
        Sketches.kmvSketch(slice, col("user_id"))).collect()(0)
      assert(r.getAs[Long]("n_in_sketch") === est.getAs[Long]("n_in_sketch"), key)
      assert(r.getAs[Double]("est_kmv") === est.getAs[Double]("est_kmv"), key)
      val exact = slice.filter(col("user_id").isNotNull)
        .select("user_id").distinct().count()
      assert(r.getAs[Long]("n_exact") === exact, key)
    }
  }

  test("kmv overlap is exact below k: every count reproduced bit-for-bit") {
    val rows = (0L until 100L).map(u => ("click", u)) ++
      (80L until 180L).map(u => ("purchase", u))
    val df = rows.toDF("event_type", "user_id")
    val r = Sketches.kmvOverlapCertificate(df, col("event_type"),
      col("user_id"), "click", "purchase").collect()(0)
    assert(r.getAs[Double]("est_a") === 100.0)
    assert(r.getAs[Double]("est_b") === 100.0)
    assert(r.getAs[Double]("est_union") === 180.0)
    // (20/180)·180 — one rounded division then a multiply, so allow 1 ulp
    assert(math.abs(r.getAs[Double]("est_overlap") - 20.0) < 1e-9,
      s"est_overlap ${r.getAs[Double]("est_overlap")}")
    assert(r.getAs[Long]("n_overlap_exact") === 20L)
  }

  test("quantile sample merge of two row-shards equals the sample of the whole") {
    val a = (0L until 4000L).map(i => (i, "t", i.toDouble))
      .toDF("event_id", "event_type", "value")
    val b = (4000L until 9000L).map(i => (i, "t", i.toDouble))
      .toDF("event_id", "event_type", "value")
    def samp(df: org.apache.spark.sql.DataFrame) =
      Sketches.quantileSample(df, Seq("event_type"), col("event_id"), col("value"))
    val merged = Sketches.quantileSampleMerge(samp(a), samp(b), Seq("event_type"))
      .orderBy("h").collect().toSeq
    val whole = samp((0L until 9000L).map(i => (i, "t", i.toDouble))
      .toDF("event_id", "event_type", "value")).orderBy("h").collect().toSeq
    assert(merged === whole)
    // replaying a shard is idempotent: the (keys, h) dedup absorbs it
    val replayed = Sketches.quantileSampleMerge(
      Sketches.quantileSampleMerge(samp(a), samp(b), Seq("event_type")),
      samp(b), Seq("event_type")).orderBy("h").collect().toSeq
    assert(replayed === whole)
  }

  test("quantile sketch is exact below k and inside the rank envelope above it") {
    // n ≤ k: the sample IS the data, so the sketch quantile equals the
    // exact discrete quantile
    val small = (0L until 300L).map(i => (i, "t", i.toDouble))
      .toDF("event_id", "event_type", "value")
    val cs = Sketches.quantileCertificate(small).collect()(0)
    assert(cs.getAs[Double]("p50_sketch") === cs.getAs[Double]("p50_exact"))
    assert(cs.getAs[Double]("p90_sketch") === cs.getAs[Double]("p90_exact"))
    // n = 20000 ≫ k = 512: realized CDF error is a deterministic
    // constant under the fixed seed (measured 3.05% / 2.20%), pinned
    // inside the 3/√k ≈ 13.3% envelope
    val big = (0L until 20000L).map(i => (i, "t", i.toDouble))
      .toDF("event_id", "event_type", "value")
    val cb = Sketches.quantileCertificate(big).collect()(0)
    assert(cb.getAs[Long]("n_sample") === 512L)
    assert(cb.getAs[Double]("cdf_err_p50") < 0.1,
      s"p50 cdf err ${cb.getAs[Double]("cdf_err_p50")}")
    assert(cb.getAs[Double]("cdf_err_p90") < 0.1,
      s"p90 cdf err ${cb.getAs[Double]("cdf_err_p90")}")
  }
}
