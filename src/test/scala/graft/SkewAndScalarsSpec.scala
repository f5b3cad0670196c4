package graft

import org.apache.spark.sql.functions._
import graft.ops.{Monitoring, Skew}

class SkewAndScalarsSpec extends SparkSpec {
  import spark.implicits._

  test("parseBytes inverts humanizeBytes units; garbage parses to null") {
    val got = Seq("512 B", "2.0 KB", "5.0 MB", "3.0 GB", "1.5 TB", "oops")
      .toDF("h").select(Monitoring.parseBytes(col("h")).as("b"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(got === Seq(Some(512.0), Some(2048.0), Some(5.0 * 1024 * 1024),
      Some(3.0 * 1024 * 1024 * 1024), Some(1.5 * 1024 * 1024 * 1024 * 1024), None))
  }

  test("humanizeDuration renders h/m/s breaks") {
    val got = Seq(45000L, 192000L, 7500000L)
      .toDF("ms").select(Monitoring.humanizeDuration(col("ms")).as("d"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("45s", "3m 12s", "2h 5m"))
  }

  test("approx distinct sketch lands within its error bound of exact") {
    val r = graft.ops.Monitoring.approxDistinct(
      Tables.events(spark, "/root/testdata/sf0.001"), "user_id", "event_type", rsd = 0.02)
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val approx = row.getAs[Long]("approx_distinct").toDouble
      val exact = row.getAs[Long]("exact_distinct").toDouble
      assert(math.abs(approx - exact) / exact <= 0.1,
        s"sketch off by ${math.abs(approx - exact) / exact} for ${row.get(0)}")
    }
  }

  test("approx quantile sketch lands within its rank-error bound of exact") {
    // accuracy=50 on a few-thousand-row key actually exercises the sketch
    // (n > accuracy); the GK guarantee is rank error <= n/accuracy
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val approx = graft.ops.Monitoring.approxQuantiles(ev, Seq(0.5, 0.9), accuracy = 50)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.nonEmpty)
    val values = ev.select("event_type", "value").collect()
      .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    approx.foreach { case (k, (p50, p90)) =>
      val vs = values(k); val n = vs.length
      Seq(0.5 -> p50, 0.9 -> p90).foreach { case (p, got) =>
        // rank of the returned value (it must be an actual data point)
        val lo = vs.indexWhere(_ >= got); val hi = vs.lastIndexWhere(_ <= got)
        assert(lo >= 0 && hi >= 0, s"$k p$p: $got is not inside the data range")
        val target = math.ceil(p * n)
        val dist = math.min(math.abs(lo + 1 - target), math.abs(hi + 1 - target))
        assert(dist <= n / 50.0 + 1,
          s"$k p$p: rank distance $dist exceeds n/accuracy = ${n / 50.0}")
      }
    }
  }

  test("expectations gate fails loudly naming EVERY violated rule") {
    import graft.ops.{Expectations => E}
    val df = Seq((1L, Option("a"), 1.5), (2L, Option("a"), -0.5),
      (2L, Option.empty[String], 9.0)).toDF("id", "tag", "score")
    val report = E.report(df, Seq(
      E.notNull("id"), E.unique("id"), E.notNull("tag"),
      E.minAtLeast("score", 0.0), E.maxAtMost("score", 10.0)))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(3)).toMap
    assert(report === Map(
      ("id", "not_null") -> true, ("id", "unique") -> false,
      ("tag", "not_null") -> false,
      ("score", "min_at_least") -> false, ("score", "max_at_most") -> true))
    val err = intercept[IllegalStateException] {
      E.enforce(df, Seq(E.unique("id"), E.notNull("tag"), E.minAtLeast("score", 0.0)))
    }
    // all three violations named in one failure — never a partial signal
    assert(err.getMessage.contains("id must be unique"))
    assert(err.getMessage.contains("tag must contain no nulls"))
    assert(err.getMessage.contains("score minimum must be >= 0.0"))
    // a clean frame passes the gate silently
    E.enforce(df.filter(col("tag").isNotNull && col("score") >= 0),
      Seq(E.notNull("tag"), E.minAtLeast("score", 0.0)))
  }

  test("expectations ride a stream per micro-batch via observe") {
    import graft.ops.{Expectations => E}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val rules = Seq(E.notNull("tag"), E.minAtLeast("score", 0.0),
      E.maxAtMost("score", 10.0))
    val mem = MemoryStream[(Long, Option[String], Double)]
    // uniqueness is not per-batch-checkable — rejected loudly, not weakened
    intercept[IllegalArgumentException] {
      E.observed(mem.toDF().toDF("id", "tag", "score"), Seq(E.unique("id")))
    }
    val sdf = E.observed(mem.toDF().toDF("id", "tag", "score"), rules)
    val q = sdf.writeStream.format("noop")
      .option("checkpointLocation", s"${work()}/ckpt").start()
    try {
      // batch 1: one null tag, score over the bound
      mem.addData((1L, Some("a"), 1.0), (1L, None, 99.0))
      q.processAllAvailable()
      val m1 = q.lastProgress.observedMetrics.get("graft_expectations")
      val v1 = E.evaluateObserved(m1, rules)
      assert(v1.toSet === Set("tag must contain no nulls",
        "score maximum must be <= 10.0"))
      // batch 2: clean — no violations
      mem.addData((2L, Some("b"), 2.0), (3L, Some("c"), 3.0))
      q.processAllAvailable()
      val v2 = E.evaluateObserved(
        q.lastProgress.observedMetrics.get("graft_expectations"), rules)
      assert(v2.isEmpty, s"clean batch reported: $v2")
    } finally q.stop()
  }

  private def work(): String = {
    val base = new java.io.File("target/test-out").getAbsoluteFile.toPath
    java.nio.file.Files.createDirectories(base)
    java.nio.file.Files.createTempDirectory(base, "exp").toString
  }

  test("rollup merge is the monoid law: merge of partials equals the direct partial") {
    import graft.ops.Incremental
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    // three-way split by an arbitrary non-day key, so partial day rows
    // genuinely straddle the splits and the merge has real work to do
    val parts = (0 until 3).map(i => Incremental.partialRollup(
      ev.filter(pmod(col("event_id"), lit(3)) === i)))
    val merged = Incremental.serveRollup(Incremental.mergeRollups(parts: _*))
    val direct = Incremental.serveRollup(Incremental.partialRollup(ev))
    // the HLL estimate column participates: register-max merge makes the
    // merged sketch's estimate BIT-identical to the direct sketch's
    assert(merged.count() === direct.count())
    assert(merged.exceptAll(direct).count() === 0, "merged rows differ from direct")
    assert(direct.exceptAll(merged).count() === 0)
    // and merging in a different order changes nothing (commutativity)
    val reversed = Incremental.serveRollup(Incremental.mergeRollups(parts.reverse: _*))
    assert(reversed.exceptAll(direct).count() === 0)
  }

  test("heavy hitters: the MG guarantee makes the verified output exact under any partitioning") {
    import graft.ops.HeavyHitters
    // adversarial-ish stream: two true heavies (a: 30, b: 12 of n=60,
    // both > 60/8), a mid item below the gate, and a 16-item tail that
    // churns the sketch's counters
    val words = Seq.fill(30)("a") ++ Seq.fill(12)("b") ++ Seq.fill(2)("mid") ++
      (0 until 16).map(i => s"tail$i")
    def docsOf(texts: Seq[String]) = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // one doc per token and one doc holding many — the splitter must agree
    val docs = docsOf(words.grouped(7).map(_.mkString(" ")).toSeq)
    val exact = Map("a" -> 30L, "b" -> 12L)
    Seq(1, 7).foreach { parts =>
      val got = HeavyHitters.heavyTokens(docs.repartition(parts), k = 8)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === exact, s"partitioning=$parts must not change the verified output")
    }
    // tightest interesting k: every item with cnt*k > n survives even
    // when the sketch holds only k-1 = 2 counters
    val got3 = HeavyHitters.heavyTokens(docs, k = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got3 === Map("a" -> 30L), "k=3 keeps only the one-third-heavy item")
    val ex = intercept[IllegalArgumentException] { new HeavyHitters.MisraGries(1) }
    assert(ex.getMessage.contains("k >= 2"))
  }

  test("exact-moment correlation: perfect, inverted, degenerate, and a BigInt model") {
    import graft.ops.Monitoring
    val h = 3600000000L
    // type P: value grows exactly with the hour → r = 1.0 EXACTLY (the
    // integer moments factor perfectly; no float noise to blur it);
    // type N: value falls with the hour → r = -1.0; type Z: constant
    // value → zero variance → null, never NaN
    val ev = ((0 until 8).map(i => ("P", 1L + i, (i + 1).toDouble, i * h)) ++
      (0 until 8).map(i => ("N", 20L + i, (8 - i).toDouble, i * h)) ++
      (0 until 8).map(i => ("Z", 40L + i, 7.0, i * h)))
      .toDF("event_type", "event_id", "value", "ts_us")
    val got = Monitoring.valueHourCorr(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), Option(r.get(2)))).toMap
    assert(got("P") === ((8L, Some(1.0))))
    assert(got("N") === ((8L, Some(-1.0))))
    assert(got("Z") === ((8L, None)))
    // real data: the engine's r equals a driver-side BigInt recomputation
    val real = Tables.events(spark, "/root/testdata/sf0.001")
    val rows = real.filter(col("event_type").isNotNull && col("value").isNotNull &&
        col("ts_us").isNotNull)
      .select(col("event_type"), floor(col("value") * 1000000.0).cast("long"),
        expr("ts_us % 86400000000 DIV 3600000000").cast("long"))
      .collect().map(r => (r.getString(0), BigInt(r.getLong(1)), BigInt(r.getLong(2))))
    val model = rows.groupBy(_._1).map { case (t, vs) =>
      val n = BigInt(vs.length)
      val (sx, sy) = (vs.map(_._2).sum, vs.map(_._3).sum)
      val sxy = vs.map(v => v._2 * v._3).sum
      val (sxx, syy) = (vs.map(v => v._2 * v._2).sum, vs.map(v => v._3 * v._3).sum)
      val (dx, dy) = (n * sxx - sx * sx, n * syy - sy * sy)
      t -> ((n * sxy - sx * sy).toDouble / math.sqrt(dx.toDouble * dy.toDouble))
    }
    val engine = Monitoring.valueHourCorr(real).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(engine === model)
  }

  test("rank correlation is exactly monotone-invariant where Pearson is not") {
    import graft.ops.Monitoring
    val hr = 3600000000L
    // hours 0..4 with strictly increasing values: linear (1..5) vs
    // convex (1,2,4,8,16) have IDENTICAL ranks, so rank_corr is exactly
    // 1.0 for both — while Pearson drops below 1 on the curved series
    def series(vals: Seq[Double], typ: String) =
      vals.zipWithIndex.map { case (v, h) => (typ, h.toLong + 1L, h * hr + 3L, v) }
    val ev = (series(Seq(1, 2, 3, 4, 5).map(_.toDouble), "LIN") ++
        series(Seq(1, 2, 4, 8, 16).map(_.toDouble), "EXP"))
      .toDF("event_type", "event_id", "ts_us", "value")
    val rank = Monitoring.valueHourRankCorr(ev).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rank === Map("LIN" -> 1.0, "EXP" -> 1.0))
    val pearson = Monitoring.valueHourCorr(ev).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(pearson("LIN") === 1.0)
    assert(pearson("EXP") < 1.0)
  }

  test("equi-depth bins: rank-selected edges, tie inflation visible, tiny-n collapse") {
    import graft.ops.Monitoring
    // type A: n=10, values 1..10 → with bins=5 the edges are the
    // 2,4,6,8,10-th smallest = 2,4,6,8,10; all n_le equal the nominal
    // depth (no ties). Type B: n=10, eight copies of 5 then 7, 9 →
    // edges land INSIDE the tie run: edge=5 with n_le=8 (inflation
    // the emitted count makes visible)
    val ev = ((1 to 10).map(v => ("A", v.toDouble)) ++
      (Seq.fill(8)(5.0) ++ Seq(7.0, 9.0)).map(("B", _))).toDF("event_type", "value")
    val got = Monitoring.equidepthBins(ev, bins = 5).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val m = 1000000L
    assert(got(("A", 1)) === ((2L * m, 2L)) && got(("A", 3)) === ((6L * m, 6L)) &&
      got(("A", 5)) === ((10L * m, 10L)))
    assert(got(("B", 1)) === ((5L * m, 8L)), "edge inside the tie run reports the true <= count")
    assert(got(("B", 4)) === ((5L * m, 8L)) && got(("B", 5)) === ((9L * m, 10L)))
    // n < bins: every edge still selects a valid rank (ceil collapses
    // several bins onto the same order statistics)
    val tiny = Seq(("C", 1.0), ("C", 2.0)).toDF("event_type", "value")
    val gotTiny = Monitoring.equidepthBins(tiny, bins = 5).collect()
      .map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(gotTiny.size === 5 && gotTiny(5) === 2L * m && gotTiny(1) === 1L * m)
    val ex = intercept[IllegalArgumentException] { Monitoring.equidepthBins(ev, bins = 1) }
    assert(ex.getMessage.contains("equidepthBins"))
  }

  test("MAD outliers: hand-computed lower medians, odd and even counts, the k gate") {
    import graft.ops.Monitoring
    // type A (n=5, odd): values 1..4 and a far outlier 100.
    //   quantized {1e6,2e6,3e6,4e6,100e6} → med = 3e6 (rank 3);
    //   devs {2e6,1e6,0,1e6,97e6} sorted {0,1e6,1e6,2e6,97e6} → mad = 1e6
    //   (rank 3); gate 3·mad = 3e6 → only dev 97e6 exceeds → n_out 1.
    // type B (n=4, even): {10,20,30,40} → lower med = 20e6 (rank 2);
    //   devs {10e6,0,10e6,20e6} sorted {0,10e6,10e6,20e6} → mad = 10e6
    //   (rank 2); gate 30e6 → nothing exceeds → n_out 0.
    val ev = Seq(
      ("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 4.0), ("A", 100.0),
      ("B", 10.0), ("B", 20.0), ("B", 30.0), ("B", 40.0))
      .toDF("event_type", "value")
    val got = Monitoring.madOutliers(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got === Map(
      "A" -> ((5L, 3000000L, 1000000L, 1L)),
      "B" -> ((4L, 20000000L, 10000000L, 0L))))
    val ex = intercept[IllegalArgumentException] { Monitoring.madOutliers(ev, k = 0L) }
    assert(ex.getMessage.contains("madOutliers"))
  }

  test("key skew audit: planted hot key, shares against the FULL total") {
    import graft.ops.Skew
    // key 1 x6, key 2 x3, key 3 x1 (total 10); topK=2 must still share
    // against all 10 rows, not just the kept keys
    val rows = (Seq.fill(6)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L)).toDF("k")
    val got = Skew.keySkewAudit(rows, "k", topK = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got === Array((1L, 6L, 1L, 0.6, 0.6), (2L, 3L, 2L, 0.3, 0.9)))
  }

  test("value extremes: both sides ranked, duplicate readings tie by event_id") {
    import graft.ops.Monitoring
    // values 1,1,5,9 (k=3): low side takes both 1s (ids 1 then 2) then 5;
    // high side takes 9, 5, then the LATER duplicate 1 (id 2, desc order)
    val ev = Seq((1L, "A", 1.0), (2L, "A", 1.0), (3L, "A", 5.0), (4L, "A", 9.0))
      .toDF("event_id", "event_type", "value")
    val got = Monitoring.valueExtremes(ev).collect()
      .map(r => (r.getString(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(got === Map(
      ("low", 1L) -> 1L, ("low", 2L) -> 2L, ("low", 3L) -> 3L,
      ("high", 1L) -> 4L, ("high", 2L) -> 3L, ("high", 3L) -> 2L))
  }

  test("char classes: hand-counted composition, zero-length doc guarded") {
    import graft.ops.TextAnalysis
    val docs = Seq((1L, "ab 12!"), (2L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.charClasses(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
        r.getInt(5), if (r.isNullAt(6)) None else Some(r.getDouble(6))))).toMap
    // "ab 12!": 6 chars = 2 alpha + 2 digit + 1 space + 1 other
    assert(got(1L) === ((6, 2, 2, 1, 1, Some(2.0 / 6.0))))
    assert(got(2L) === ((0, 0, 0, 0, 0, None)))
  }

  test("quantile normalization: ties share a RANGE-frame position") {
    import graft.ops.Monitoring
    // values 1,1,2,3: both 1s count 2 rows at-or-below (peers included),
    // so ties get ONE deterministic cdf — 0.5, 0.5, 0.75, 1.0
    val ev = Seq((1L, "A", 1.0), (2L, "A", 1.0), (3L, "A", 2.0), (4L, "A", 3.0))
      .toDF("event_id", "event_type", "value")
    val got = Monitoring.quantileNormalize(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got === Map(
      1L -> ((2L, 4L, 0.5)), 2L -> ((2L, 4L, 0.5)),
      3L -> ((3L, 4L, 0.75)), 4L -> ((4L, 4L, 1.0))))
  }

  test("orphan audit: planted orphans and null keys count exactly") {
    import graft.ops.Expectations
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    // 5 child rows: two valid, one orphan (99), two null keys
    val child = Seq(Some(1L), Some(2L), Some(99L), None, None).toDF("ck")
    val r = Expectations.orphanAudit(child, "ck", parent, "pk", "rel").collect()(0)
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)) ===
      (("rel", 5L, 2L, 1L, 0.2)))
  }

  test("snapshot diff: planted add/remove/change/unchanged reconcile") {
    import graft.ops.Incremental
    val old = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val neu = Seq((2L, 20.0), (3L, 99.0), (4L, 40.0)).toDF("k", "v")
    val r = Incremental.snapshotDiff(old, neu, "k", "v").collect()(0)
    // key 1 removed, 2 unchanged, 3 changed, 4 added
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ===
      ((3L, 3L, 1L, 1L, 1L, 1L)))
  }

  test("KS distance: hand-computed CDF gap, zero on identical halves, null on an empty side") {
    import graft.ops.Expectations
    // g1: A={1,2}, B={2,3} -> grid cum_a 1,2,2 / cum_b 0,1,2 -> max
    // |cum_a*2 - cum_b*2| = 2 -> ks 0.5. g2: identical halves -> 0.
    // g3: only the A side -> null.
    val rows = Seq(
      ("g1", 1L, 1L), ("g1", 3L, 2L), ("g1", 2L, 2L), ("g1", 4L, 3L),
      ("g2", 5L, 7L), ("g2", 6L, 7L),
      ("g3", 7L, 9L), ("g3", 9L, 9L))
      .toDF("grp", "doc_id", "v")
    val got = Expectations.ksDistance(rows, "v", col("doc_id") % 2 === 0, "grp")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    assert(got === Map(
      "g1" -> ((2L, 2L, Some(0.5))),
      "g2" -> ((1L, 1L, Some(0.0))),
      "g3" -> ((2L, 0L, None))))
  }

  test("daily diversity: uniform mix, monoculture, and the hand-computed middle") {
    import graft.ops.Expectations
    val hr = 3600000000L
    def at(day: Int, i: Long, typ: String) =
      (typ, i, timestampMicros(day.toLong * 24L * hr + i * 1000L))
    // day 1: A,B uniform (2+2): 1 - (4+4)/16 = 0.5
    // day 2: all A (monoculture): 1 - 9/9 = 0.0
    // day 3: A x3, B x1: 1 - (9+1)/16 = 0.375
    val rows = (Seq(at(1, 1, "A"), at(1, 2, "A"), at(1, 3, "B"), at(1, 4, "B")) ++
      (1 to 3).map(i => at(2, i.toLong + 10L, "A")) ++
      Seq(at(3, 21L, "A"), at(3, 22L, "A"), at(3, 23L, "A"), at(3, 24L, "B")))
    val ev = rows.toDF("event_type", "event_id", "ts")
    val got = Expectations.dailyDiversity(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(
      "1970-01-02" -> ((4L, 2L, 0.5)),
      "1970-01-03" -> ((3L, 1L, 0.0)),
      "1970-01-04" -> ((4L, 2L, 0.375))))
  }

  private def timestampMicros(us: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.EPOCH.plus(us, java.time.temporal.ChronoUnit.MICROS))

  test("distribution drift: hand-computed chi-square terms, new-only category is null") {
    import graft.ops.Expectations
    // old {A:2, B:2} (n=4) vs new {A:3, B:1, C:1} (n=5):
    //   term_A = (3*4 - 2*5)^2 / (2*5*4) = 4/40 = 0.1
    //   term_B = (1*4 - 2*5)^2 / (2*5*4) = 36/40 = 0.9
    //   C has no old mass -> null, never a division by zero
    val old = Seq("A", "A", "B", "B").toDF("cat")
    val neu = Seq("A", "A", "A", "B", "C").toDF("cat")
    val got = Expectations.distributionDrift(old, neu, "cat").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    assert(got === Map(
      "A" -> ((2L, 3L, Some(0.1))), "B" -> ((2L, 1L, Some(0.9))),
      "C" -> ((0L, 1L, None))))
  }

  test("k-anonymity census: hand-planted small groups, rows-at-risk arithmetic") {
    import graft.ops.Expectations
    // lang en: group (en,web) has 5 rows (safe at k=5), (en,books) has 2
    // (risky). lang zh: one group of 1 (risky).
    val rows = (Seq.fill(5)(("en", "web")) ++ Seq.fill(2)(("en", "books")) ++
      Seq(("zh", "web"))).toDF("lang", "source")
    val got = Expectations.kAnonymityCensus(rows, Seq("lang", "source"), k = 5L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map("en" -> ((2L, 1L, 2L)), "zh" -> ((1L, 1L, 1L))))
    val ex = intercept[IllegalArgumentException] {
      Expectations.kAnonymityCensus(rows, Seq.empty, k = 5L)
    }
    assert(ex.getMessage.contains("kAnonymityCensus"))
  }

  test("disorder audit: hand-built arrival sequence, lateness vs running max") {
    import graft.ops.Monitoring
    // arrival order (event_id): ts 10, 30, 20, 40, 25 (micros).
    // late events: id 3 (30-20=10 late), id 5 (40-25=15 late) → n_late 2,
    // max_late 15, rate 0.4. Type B is in order → 0 late.
    val ev = Seq(
      ("A", 1L, 10L), ("A", 2L, 30L), ("A", 3L, 20L), ("A", 4L, 40L), ("A", 5L, 25L),
      ("B", 1L, 1L), ("B", 2L, 2L))
      .toDF("event_type", "event_id", "ts_us")
    val got = Monitoring.disorderAudit(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got === Map("A" -> ((5L, 2L, 15L, 0.4)), "B" -> ((2L, 0L, 0L, 0.0))))
  }

  test("winsorized mean: hand-computed rank cuts, clamping, and the degenerate type") {
    import graft.ops.Monitoring
    // type A (n=10, values 1..9 and outlier 1000): lo rank (9*5)//100+1 = 1
    //   → lo = 1e6; hi rank (9*95)//100+1 = 9 → hi = 9e6 (the outlier is
    //   rank 10, so it clamps to 9e6). winsorized sum = (1+..+9 + 9)e6 =
    //   54e6 → mean 54e6/1e6/10 = 5.4 — vs the raw mean 104.5 the
    //   outlier would have dragged.
    // type B (n=1): both cut ranks = 1 → lo = hi = 7e6, sum 7e6, mean 7.0.
    val ev = Seq("A" -> 1000.0, "B" -> 7.0)
      .++((1 to 9).map(i => "A" -> i.toDouble))
      .toDF("event_type", "value")
    val got = Monitoring.winsorizedStats(ev).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got === Map(
      "A" -> ((10L, 1000000L, 9000000L, 54000000L, 5.4)),
      "B" -> ((1L, 7000000L, 7000000L, 7000000L, 7.0))))
    val ex = intercept[IllegalArgumentException] {
      Monitoring.winsorizedStats(ev, pLow = 50L, pHigh = 40L)
    }
    assert(ex.getMessage.contains("winsorizedStats"))
  }

  test("basket merge law holds on an order split and BREAKS on a basket-severing split") {
    import graft.ops.{Graph, Incremental}
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val direct = Graph.basketLift(li).orderBy("a", "b").collect().toSeq
    // order-key split: baskets stay atomic → merge-then-serve == direct
    val byOrder = (0 until 3).map(i => Incremental.partialBasketStats(
      li.filter(pmod(col("l_orderkey"), lit(3)) === i)))
    val merged = Incremental.serveBasketLift(
        Incremental.mergeBasketStats(byOrder: _*))
      .orderBy("a", "b").collect().toSeq
    assert(merged === direct)
    // the NEGATIVE law: a lineitem-level split severs baskets — the two
    // halves each miss the pairs whose legs land on opposite sides, and
    // no merge can recover them. This is why increments must be cut on
    // the basket key, not arrival/date/file order.
    val severed = (0 until 2).map(i => Incremental.partialBasketStats(
      li.filter(pmod(col("l_linenumber"), lit(2)) === i)))
    val wrong = Incremental.serveBasketLift(
        Incremental.mergeBasketStats(severed: _*))
      .orderBy("a", "b").collect().toSeq
    assert(wrong !== direct,
      "a basket-severing split should NOT satisfy the merge law")
  }

  test("salted count-distinct matches plain count-distinct") {
    val df = Seq.tabulate(1000)(i => ("k" + i % 3, "v" + i % 47)).toDF("k", "v")
    val plain = df.groupBy("k").agg(countDistinct("v").as("v_distinct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCountDistinct(df, "k", "v", salts = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("salted join equals plain join") {
    val fact = Seq.tabulate(500)(i => ("k" + i % 5, i)).toDF("k", "x")
    val dim = Seq(("k0", "a"), ("k1", "b"), ("k2", "c"), ("k3", "d"), ("k4", "e")).toDF("k", "name")
    val plain = fact.join(dim, "k").select("k", "x", "name")
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 4).select("k", "x", "name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
  }
}
