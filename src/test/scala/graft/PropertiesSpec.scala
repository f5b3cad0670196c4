package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.Hrfco

/** ScalaCheck properties from SURVEY §5's test plan: coercions are total
  * (never throw), classification is monotone in the water level, and the
  * cascade respects its priority order. Raw ScalaCheck generators with
  * fixed seeds (the scalatest bridge artifact isn't in the offline cache),
  * evaluated over generated DataFrame batches. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  /** NUL as a string, from the code point — test sources carry no raw
    * control bytes (the ops/Multimodal.Nul rule). */
  private val TNul: String = 0.toChar.toString

  private val anyString: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr, Gen.asciiPrintableStr, Gen.const(""), Gen.const(" "),
    Gen.const(null: String), Gen.numStr.map(s => " " + s + " "),
    Gen.chooseNum(-1e6, 1e6).map(d => f"$d%.3f"))

  test("property: guardedDouble is total over arbitrary strings") {
    (1L to 10L).foreach { seed =>
      val ss = sample(Gen.listOfN(50, anyString), seed)
      val n = ss.map(Option(_)).toDF("v")
        .select(Hrfco.guardedDouble(col("v")).as("d")).count()
      assert(n === ss.length) // no exception, one row out per row in
    }
  }

  test("property: formattedObservationTime is total and length-guarded") {
    (1L to 10L).foreach { seed =>
      val ss = sample(Gen.listOfN(50, anyString), seed).map(s => Option(s).getOrElse(""))
      val out = ss.toDF("ymdhm")
        .select(col("ymdhm"), Hrfco.formattedObservationTime(col("ymdhm")).as("t"))
        .collect()
      out.foreach { r =>
        val in = r.getString(0)
        if (in.length != 12) assert(r.getString(1) === in) // passthrough
      }
    }
  }

  test("property: native shingle kernel matches the HOF expression form exactly") {
    // the codegen'd WordShingles replaced this chain — any divergence on
    // empties, multi-spaces, or short texts breaks the dedup oracles
    def hofShingles(n: Int) = array_distinct(transform(
      sequence(lit(0), greatest(size(split(col("text"), " ")) - n, lit(0))),
      i => concat_ws(" ", slice(split(col("text"), " "), i + 1, lit(n)))))
    val adversarial = Seq("", " ", "  ", "a", "a b", "a  b", " a b ",
      "a b c d", "tab\tkept as one word", "a b a b a b", "ü ñ 漢字 word")
    val wordy: Gen[String] =
      Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.const(""), Gen.const("x")))
        .map(_.mkString(" "))
    (1L to 10L).foreach { seed =>
      val texts = adversarial ++ sample(Gen.listOfN(30, wordy), seed)
      Seq(1, 2, 3, 5).foreach { n =>
        val rows = texts.toDF("text")
          .select(graft.ops.Dedup.shingles(col("text"), n).as("native"),
            hofShingles(n).as("hof"))
          .collect()
        rows.zip(texts).foreach { case (r, t) =>
          assert(r.getSeq[String](0) === r.getSeq[String](1),
            s"shingle divergence on '${t.take(40)}' n=$n")
        }
      }
    }
  }

  test("property: char-bigram kernel equals the code-point window model on unicode strings") {
    import graft.functions.TextFunctions
    // the one-pass kernel replaced the per-occurrence explode — any
    // divergence on supplementary-plane slicing or count aggregation
    // breaks the three langid oracles
    val uniChar: Gen[String] = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const("中"), Gen.const("文"),
      Gen.const("𝄞"), Gen.const("😀"), Gen.const("é"), Gen.const(" "))
    val uniStr: Gen[String] = Gen.listOf(uniChar).map(_.mkString)
    (1L to 10L).foreach { seed =>
      val ss = sample(Gen.listOfN(40, uniStr), seed)
      val got = ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "text")
        .select(col("doc_id"),
          explode(TextFunctions.charBigramCounts(col("text"))).as("e"))
        .select(col("doc_id"), col("e.g"), col("e.n")).collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      val expected = ss.zipWithIndex.flatMap { case (s, i) =>
        val cps = s.codePoints().toArray
        cps.sliding(2).filter(_.length == 2)
          .map(w => (i.toLong, new String(w, 0, 2))).toSeq
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(got === expected, s"kernel diverged from code-point windows at seed $seed")
    }
    // degenerate inputs: empty, one code point (a surrogate PAIR in
    // UTF-16 — a char-naive walk would emit a phantom bigram), null
    val edge = Seq((1L, ""), (2L, "𝄞"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.charBigramCounts(col("text")).as("a"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(edge(1L).getSeq[Any](1).isEmpty, "empty string must count nothing")
    assert(edge(2L).getSeq[Any](1).isEmpty, "one code point carries no window")
    assert(edge(3L).isNullAt(1), "null text must stay null")
    // SQL surface, with the documented first-occurrence order
    graft.functions.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_char_bigram_counts('abcab') AS a").collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(viaSql === Seq(("ab", 2L), ("bc", 1L), ("ca", 1L)),
      s"SQL surface diverged: $viaSql")
  }

  test("property: floorDiv is true floor division over arbitrary longs") {
    val xs = (1 to 200).map(i =>
      sample(Gen.chooseNum(Long.MinValue / 4, Long.MaxValue / 4), 9000 + i))
    val bs = Seq(1L, 2L, 3L, 100L, 3600000000L)
    val rows = for { x <- xs; b <- bs } yield (x, b)
    val got = rows.toDF("x", "b")
      .select(col("x"), col("b"),
        graft.ops.TimeSeries.floorDiv(col("x"), 1L).as("q1"))
      // per-b evaluation below; q1 covers the b=1 identity inline
      .collect()
    got.foreach(r => assert(r.getLong(2) === r.getLong(0)))
    bs.foreach { b =>
      val qs = xs.toDF("x")
        .select(col("x"), graft.ops.TimeSeries.floorDiv(col("x"), b).as("q"))
        .as[(Long, Long)].collect()
      qs.foreach { case (x, q) =>
        assert(q === Math.floorDiv(x, b), s"floorDiv($x, $b)")
      }
    }
  }

  test("property: flood classification is monotone non-decreasing in wl") {
    val rank = Map("NORMAL" -> 0, "ATTENTION" -> 1, "CAUTION" -> 2,
      "WARNING" -> 3, "CRITICAL" -> 4)
    (1L to 10L).foreach { seed =>
      val wls = sample(Gen.listOfN(30, Gen.chooseNum(-5.0, 15.0)), seed)
      val levels = wls.map(Some(_)).toDF("wl")
        .withColumn("attwl", lit(3.0)).withColumn("wrnwl", lit(5.0))
        .withColumn("almwl", lit(7.0)).withColumn("srswl", lit(9.0))
        .select(col("wl"), Hrfco.floodLevel(col("wl")).as("lvl"))
        .orderBy("wl").collect().map(_.getString(1))
      levels.toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(rank(a) <= rank(b), s"$a -> $b not monotone")
        case _ =>
      }
    }
  }

  test("property: cascade priority — level matches the closed-form threshold rule") {
    (1L to 40L).foreach { seed =>
      val wl = sample(Gen.chooseNum(-5.0, 15.0), seed)
      val lvl = Seq(Some(wl)).toDF("wl")
        .withColumn("attwl", lit(3.0)).withColumn("wrnwl", lit(5.0))
        .withColumn("almwl", lit(7.0)).withColumn("srswl", lit(9.0))
        .select(Hrfco.floodLevel(col("wl")).as("lvl")).collect()(0).getString(0)
      val expected =
        if (wl >= 9.0) "CRITICAL" else if (wl >= 7.0) "WARNING"
        else if (wl >= 5.0) "CAUTION" else if (wl >= 3.0) "ATTENTION" else "NORMAL"
      assert(lvl === expected)
    }
  }

  test("property: zorder key round-trips — deinterleaving recovers (x, y) exactly") {
    def deinterleave(z: Long, bits: Int): (Long, Long) = {
      var x = 0L; var y = 0L
      (0 until bits).foreach { i =>
        x |= ((z >> (2 * i)) & 1L) << i
        y |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (x, y)
    }
    (1L to 5L).foreach { seed =>
      val bits = 1 + (seed % 31).toInt // exercise the full legal range incl. 31
      val dom = (1L << bits) - 1L
      val pts = sample(Gen.listOfN(200,
        Gen.zip(Gen.chooseNum(0L, dom), Gen.chooseNum(0L, dom))), seed)
      val keys = pts.toDF("x", "y")
        .select(col("x"), col("y"),
          graft.ops.Layout.zorderKey(col("x"), col("y"), bits).as("z"))
        .collect()
      keys.foreach { r =>
        assert(deinterleave(r.getLong(2), bits) === ((r.getLong(0), r.getLong(1))),
          s"bits=$bits x=${r.getLong(0)} y=${r.getLong(1)} z=${r.getLong(2)}")
      }
    }
  }

  test("property: chunking covers every token with the promised window/stride/overlap") {
    (1L to 5L).foreach { seed =>
      val window = 1 + (seed * 3 % 7).toInt
      val stride = 1 + ((seed * 2) % window).toInt
      val nTok = 1 + (seed * 13 % 40).toInt
      val text = (0 until nTok).map(i => s"t$i").mkString(" ")
      val chunks = graft.ops.TextAnalysis.chunkDocuments(
          Seq((0L, text)).toDF("doc_id", "text"), window, stride)
        .orderBy("chunk_id").collect()
        .map(r => (r.getLong(1), r.getString(2).split(" ").toSeq, r.getLong(3)))
      // chunk i starts at token i*stride, is window long except the tail,
      // every token is covered, and n_tokens matches the actual slice
      chunks.foreach { case (i, toks, n) =>
        assert(toks.head === s"t${i * stride}", s"seed=$seed chunk $i misaligned")
        assert(toks.length === math.min(window, nTok - i * stride).toInt)
        assert(n === toks.length.toLong)
      }
      assert(chunks.flatMap(_._2).toSet === (0 until nTok).map(i => s"t$i").toSet,
        s"seed=$seed w=$window s=$stride: tokens lost")
      assert(chunks.last._1 * stride < nTok, s"seed=$seed: empty trailing chunk emitted")
    }
  }

  test("property: funnel equals a driver-side sequential fold on random event streams") {
    val stages = Seq("view", "click", "purchase")
    (1L to 5L).foreach { seed =>
      val events = sample(Gen.listOfN(80, Gen.zip(
        Gen.chooseNum(0L, 9L),                       // user
        Gen.chooseNum(0L, 19L),                      // ts (dense → ties)
        Gen.oneOf("view", "click", "purchase", "error"))), 8000 + seed)
        .zipWithIndex.map { case ((u, ts, ty), i) => (u, ts, i.toLong, ty) }
      // reference: walk each user's (ts, id)-sorted history sequentially
      val expected = events.groupBy(_._1).map { case (u, evs) =>
        var done = Vector.empty[Long]
        evs.sortBy(e => (e._2, e._3)).foreach { e =>
          if (done.length < stages.length && e._4 == stages(done.length) &&
              (done.isEmpty || e._2 > done.last)) done = done :+ e._2
        }
        u -> done
      }
      val got = graft.ops.Funnel.funnel(
          events.toDF("user_id", "ts_us", "event_id", "event_type"), stages)
        .collect().map { r =>
          r.getLong(0) -> (2 to 4).flatMap(i =>
            if (r.isNullAt(i)) None else Some(r.getLong(i))).toVector
        }.toMap
      assert(got === expected, s"seed $seed")
    }
  }

  test("property: q20's two decorrelation forms agree at every share threshold") {
    // the 0.15 the oracle entry ships is a presentation choice; the
    // correctness claim is the DERIVATION, cross-validated here by two
    // independent forms (correlated-scalar decorrelation vs one-scan
    // window CTE) at thresholds spanning empty to everything
    val dir = "/root/testdata/sf0.001"
    val counts = Seq(0.05, 0.15, 0.3, 0.5, 0.9).map { t =>
      val a = graft.ops.Relational.volumeSuppliers(spark, dir, t)
        .collect().map(_.toSeq).toSeq
      val b = graft.ops.Relational.volumeSuppliersCte(spark, dir, t)
        .collect().map(_.toSeq).toSeq
      assert(a === b, s"forms diverge at threshold $t")
      a.size
    }
    // raising the share floor can only shrink the supplier set
    assert(counts === counts.sorted.reverse,
      s"supplier counts should be non-increasing in threshold: $counts")
    assert(counts.head > 0, "lowest threshold should return suppliers")
  }

  test("property: sketch-verified heavy hitters equal the exact heavy set on random streams") {
    import graft.ops.HeavyHitters
    (1L to 5L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // skewed draw: cubing pushes mass onto the low token ids
      val words = Seq.fill(400)(s"w${(math.pow(rnd.nextDouble(), 3) * 40).toInt}")
      val docs = words.grouped(9).zipWithIndex
        .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
        .toDF("doc_id", "text")
      val k = 10
      val exact = words.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
        .filter { case (_, c) => c * k > words.size }
      val got = HeavyHitters.heavyTokens(docs.repartition(3), k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === exact, s"seed $seed: sketch-verified set diverged from exact")
    }
  }

  test("property: equi-depth edges equal a driver-side model on random tied values") {
    import graft.ops.Monitoring
    (1L to 5L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // coarse rounding forces heavy ties — the regime where naive
      // binning silently lies about depths
      val rows = Seq.fill(90)(("T", (rnd.nextInt(12) + 1).toDouble)) ++
        Seq.fill(7)(("U", (rnd.nextInt(3) + 1).toDouble))
      val got = Monitoring.equidepthBins(rows.toDF("event_type", "value"), bins = 4)
        .collect().map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      val expected = rows.groupBy(_._1).flatMap { case (t, vs) =>
        val q = vs.map(v => math.floor(v._2 * 1000000.0).toLong).sorted
        val n = q.size
        (1 to 4).map { bin =>
          val edge = q((bin * n + 3) / 4 - 1)
          (t, bin) -> ((edge, q.count(_ <= edge).toLong))
        }
      }
      assert(got === expected, s"seed $seed")
    }
  }

  test("property: MAD screen equals a driver-side model on random skewed values") {
    import graft.ops.Monitoring
    (1L to 5L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // two types, heavy-tailed: mostly unit-scale, a few 100x spikes
      val rows = Seq.tabulate(120) { i =>
        val t = if (i % 2 == 0) "X" else "Y"
        val v = if (rnd.nextDouble() < 0.08) rnd.nextDouble() * 500.0
                else rnd.nextDouble() * 5.0
        (t, v)
      }
      val got = Monitoring.madOutliers(rows.toDF("event_type", "value"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      // plain-Scala model: same quantization, same lower-median rank
      val expected = rows.groupBy(_._1).map { case (t, vs) =>
        val q = vs.map(v => math.floor(v._2 * 1000000.0).toLong).sorted
        val med = q((q.size + 1) / 2 - 1)
        val dev = q.map(x => math.abs(x - med)).sorted
        val mad = dev((dev.size + 1) / 2 - 1)
        t -> ((q.size.toLong, med, mad, dev.count(_ > 3 * mad).toLong))
      }
      assert(got === expected, s"seed $seed")
    }
  }

  test("property: triangle counts equal a driver-side enumeration on random graphs") {
    import graft.ops.Graph
    (1L to 5L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(80)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      val got = Graph.triangleCounts(edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val es = edges.toSet
      val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
      val tris = for {
        i <- nodes; j <- nodes if j > i; k <- nodes if k > j
        if es((i, j)) && es((i, k)) && es((j, k))
      } yield Seq(i, j, k)
      val expected = tris.flatten.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      assert(got === expected, s"seed $seed (${tris.size} triangles)")
    }
  }

  test("property: connected components equal a driver-side union-find on random graphs") {
    (1L to 5L).foreach { seed =>
      val edges = sample(Gen.listOfN(60,
        Gen.zip(Gen.chooseNum(0L, 39L), Gen.chooseNum(0L, 39L))), 7000 + seed)
      // reference: plain union-find with min-id relabeling
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      def union(a: Long, b: Long): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val loops = edges.filter { case (a, b) => a == b }
      edges.filterNot { case (a, b) => a == b }.foreach { case (a, b) => union(a, b) }
      val nodes = edges.filterNot { case (a, b) => a == b }
        .flatMap { case (a, b) => Seq(a, b) }.toSet
      val expected = nodes.map(n => n -> find(n)).toMap
      val got = graft.ops.Graph.connectedComponents(
          edges.toDF("id1", "id2"), maxIter = 16)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"seed $seed (self-loops dropped: ${loops.size})")
    }
  }

  test("property: k-center selection equals a driver-side greedy model on random vectors") {
    // farthest-first is fully deterministic (min-id seed, (mc, id)
    // argmin): the distributed incremental-coverage form must reproduce
    // a plain driver-side greedy loop exactly, selection order and all
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val vecGen = Gen.listOfN(4, Gen.chooseNum(-8, 8).map(_.toDouble / 8.0))
      .suchThat(_.exists(_ != 0.0))
    (1L to 5L).foreach { seed =>
      val vecs = sample(Gen.listOfN(25, vecGen), 11000 + seed)
        .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val k = 6
      // driver model
      var sel = Seq(vecs.minBy(_._1))
      var mc = vecs.filterNot(_._1 == sel.head._1)
        .map { case (id, v) => (id, v, cos(v, sel.head._2)) }
      val order = scala.collection.mutable.ArrayBuffer(sel.head._1 -> Option.empty[Double])
      (2 to k).foreach { _ =>
        val pick = mc.minBy { case (id, _, m) => (m, id) }
        order += (pick._1 -> Some(pick._3))
        mc = mc.filterNot(_._1 == pick._1)
          .map { case (id, v, m) => (id, v, math.max(m, cos(v, pick._2))) }
      }
      val got = graft.ops.Similarity.kCenterSelect(
        vecs.map { case (id, v) => (id, v.map(_.toFloat).toArray) }
          .toDF("vec_id", "embedding"), k = k)
        .orderBy("rank").collect()
        .map(r => r.getLong(1) ->
          (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      assert(got.map(_._1).toSeq === order.map(_._1).toSeq, s"seed $seed order")
      got.zip(order).foreach { case ((_, g), (_, e)) =>
        (g, e) match {
          case (Some(gv), Some(ev)) => assert(math.abs(gv - ev) < 1e-9, s"seed $seed")
          case (a, b) => assert(a.isEmpty && b.isEmpty, s"seed $seed")
        }
      }
    }
  }

  test("property: incremental closure equals the full re-resolution on every random split") {
    // merge-a-batch must equal recompute-from-scratch for ANY partition
    // of the edge set — including batches that bridge many stored
    // components, re-link all-new nodes, or land entirely inside one
    // component (quotient edge drops to nothing)
    (1L to 5L).foreach { seed =>
      val edges = sample(Gen.listOfN(60,
        Gen.zip(Gen.chooseNum(0L, 39L), Gen.chooseNum(0L, 39L))), 9000 + seed)
      val full = graft.ops.Graph.connectedComponents(
          edges.toDF("id1", "id2"), maxIter = 16)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (0 until 3).foreach { k =>
        val (oldE, newE) = edges.zipWithIndex.partition { case (_, i) => i % 3 != k }
        val stored = graft.ops.Graph.connectedComponents(
          oldE.map(_._1).toDF("id1", "id2"), maxIter = 16)
        val got = graft.ops.Graph.componentsIncrement(stored,
            newE.map(_._1).toDF("id1", "id2"), maxIter = 16)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === full, s"seed $seed split $k")
      }
    }
  }

  test("componentsIncrement stored-frame contract: min-label self-rooted producer, integral schema") {
    // the merge's correctness leans on `stored` being genuine
    // connectedComponents output — comp is the MIN member id and every
    // comp value appears as a self-labeled root row. Pin the producer
    // invariant the function can't afford to re-scan for at corpus
    // scale, and reject frames whose schema can't be component labels.
    val stored = graft.ops.Graph.connectedComponents(
      Seq((5L, 2L), (2L, 3L), (11L, 10L), (7L, 7L)).toDF("id1", "id2"),
      maxIter = 16)
    val rows = stored.collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.groupBy(_._2).foreach { case (comp, members) =>
      assert(members.map(_._1).min === comp, s"comp $comp is the member minimum")
      assert(members.exists(m => m._1 == m._2), s"root $comp is self-labeled")
    }
    val bad = Seq(("a", "b")).toDF("id", "comp")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Graph.componentsIncrement(bad, Seq((1L, 2L)).toDF("id1", "id2"))
    }
    assert(e.getMessage.contains("stored.id"))
  }

  test("property: codec decode is total over arbitrary binary garbage") {
    // random bytes — including ones starting with partial magics — must
    // decode to a row (container 'unknown' unless a real magic matches),
    // never throw from a walk or a field read off the payload end
    import graft.ops.Multimodal
    val bytesGen = Gen.chooseNum(0, 80).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    (1L to 5L).foreach { seed =>
      val payloads = sample(Gen.listOfN(30, bytesGen), seed) ++ Seq(
        Array[Byte](),                                       // empty
        Array(0xFF.toByte, 0xD8.toByte),                     // bare SOI
        Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte),        // truncated marker
        "fLaC".getBytes("US-ASCII"))                         // bare magic
      val df = payloads.zipWithIndex
        .map { case (p, i) => (i.toLong, "x", p) }
        .toDF("doc_id", "media_type", "payload")
      val rows = Multimodal.decodeCodecHeaders(df).collect()
      assert(rows.length === payloads.length) // total: no exception, no drop
      rows.foreach(r => assert(r.getAs[String]("container") != null))
    }
  }

  test("property: codec containers round-trip every generated geometry") {
    // arbitrary dims / sample rates / COM lengths / bodies (including
    // empty and 1-byte) must decode back exactly: the walked SOF offset,
    // the BE dimension fields, and the bit-packed FLAC group each
    // round-trip or the whole container seam is off by one somewhere
    import graft.ops.Multimodal
    val geom = for {
      w <- Gen.chooseNum(1, 65535); h <- Gen.chooseNum(1, 65535)
      cl <- Gen.chooseNum(1, 13)
      sr <- Gen.chooseNum(1, 655350); ch <- Gen.chooseNum(1, 8)
      body <- Gen.asciiPrintableStr
    } yield (w, h, cl, sr, ch, body)
    (1L to 5L).foreach { seed =>
      val cases = sample(Gen.listOfN(20, geom), seed).zipWithIndex
      val df = cases.map { case ((w, h, cl, sr, ch, body), i) =>
        (i.toLong, w, h, cl, sr, ch, body)
      }.toDF("doc_id", "w", "h", "cl", "sr", "chn", "body")
        .select(col("doc_id"), col("w"), col("h"), col("cl"), col("sr"), col("chn"),
          when(col("doc_id") % 2 === 0,
            Multimodal.jpegPayload(col("w"), col("h"), col("cl"), col("body").cast("binary")))
          .otherwise(
            Multimodal.flacPayload(col("sr"), col("chn"), col("body").cast("binary")))
          .as("payload"))
        .withColumn("media_type", lit("x"))
      val decoded = Multimodal.decodeCodecHeaders(df.select("doc_id", "media_type", "payload"))
        .orderBy("doc_id").collect()
      cases.foreach { case ((w, h, cl, sr, ch, _), i) =>
        val r = decoded(i)
        if (i % 2 == 0) {
          assert(r.getAs[String]("container") === "jpeg", s"seed $seed case $i")
          assert(r.getAs[Int]("sof_off") === 25 + cl, s"seed $seed case $i")
          assert(r.getAs[Int]("width") === w && r.getAs[Int]("height") === h,
            s"seed $seed case $i")
        } else {
          assert(r.getAs[String]("container") === "flac", s"seed $seed case $i")
          assert(r.getAs[Int]("sample_rate") === sr, s"seed $seed case $i")
          assert(r.getAs[Int]("channels") === ch, s"seed $seed case $i")
        }
      }
    }
  }

  test("property: progressive scan walk recovers tables and the exact scan split") {
    // every generated geometry — table counts, scan counts, bodies down
    // to empty — must walk back to exactly the planted integers: a wrong
    // hop length, missed stuffing rule, or off-by-one scan boundary
    // shows up as a wrong count or length here before any driver run
    import graft.ops.Multimodal
    val geom = for {
      w <- Gen.chooseNum(1, 65535); h <- Gen.chooseNum(1, 65535)
      cl <- Gen.chooseNum(1, 13)
      nq <- Gen.chooseNum(1, 2); nh <- Gen.chooseNum(1, 4); ns <- Gen.chooseNum(1, 3)
      body <- Gen.asciiPrintableStr
    } yield (w, h, cl, nq, nh, ns, body)
    (1L to 5L).foreach { seed =>
      val cases = sample(Gen.listOfN(20, geom), seed).zipWithIndex
      val df = cases.map { case ((w, h, cl, nq, nh, ns, body), i) =>
        (i.toLong, w, h, cl, nq, nh, ns, body)
      }.toDF("doc_id", "w", "h", "cl", "nq", "nh", "ns", "body")
        .select(col("doc_id"), lit("x").as("media_type"),
          Multimodal.jpegScanPayload(col("w"), col("h"), col("cl"),
            col("nq"), col("nh"), col("ns"), col("body")).as("payload"))
      val got = Multimodal.scanStats(df).orderBy("doc_id").collect()
      cases.foreach { case ((_, _, _, nq, nh, ns, body), i) =>
        val r = got(i)
        val L = body.length
        assert(r.getAs[String]("container") === "jpeg", s"seed $seed case $i")
        assert(r.getAs[Int]("n_dqt") === nq, s"seed $seed case $i")
        assert(r.getAs[Int]("n_dht") === nh, s"seed $seed case $i")
        assert(r.getAs[Int]("n_scans") === ns, s"seed $seed case $i")
        assert(r.getAs[Long]("scan_bytes_total") === L.toLong, s"seed $seed case $i")
        assert(r.getAs[Int]("scan_bytes_min") === L / ns, s"seed $seed case $i")
        assert(r.getAs[Int]("scan_bytes_max") === (L + ns - 1) / ns, s"seed $seed case $i")
      }
    }
  }

  test("fill bytes before markers are skipped, never parsed as segments") {
    // T.81 §B.1.1.2: any marker may be preceded by FF fill bytes — a
    // walker that reads them as a length-prefixed segment would land at
    // a garbage offset. Splice fills before the EOI of a real stream:
    // stats must be unchanged (fills are framing, not scan data)
    import graft.ops.Multimodal
    val base = Seq((0L, "some scan body text here"))
      .toDF("doc_id", "body")
      .select(Multimodal.jpegScanPayload(lit(64), lit(48), lit(3),
        lit(2), lit(2), lit(2), col("body")).as("p"))
      .collect().head.getAs[Array[Byte]](0)
    val clean = graft.functions.DspKernel.jpegScanStats(base)
    assert(clean != null)
    val spliced = base.dropRight(2) ++
      Array(0xFF.toByte, 0xFF.toByte) ++ base.takeRight(2)
    val withFills = graft.functions.DspKernel.jpegScanStats(spliced)
    assert(withFills != null, "fill bytes must not fail the walk")
    assert(withFills.toLongArray().toSeq === clean.toLongArray().toSeq)
    // the generator refuses a comLen its 13-byte filler cannot honor —
    // an unwalkable stream must raise at build, not null at read
    val e = intercept[Exception] {
      Seq((0L, "body")).toDF("doc_id", "body")
        .select(Multimodal.jpegScanPayload(lit(64), lit(48), lit(20),
          lit(1), lit(1), lit(1), col("body")))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("comLen")), s"unexpected: $e")
  }

  test("property: the scan walk is total over arbitrary binary garbage") {
    // malformed streams (truncated segments, lost marker alignment,
    // scans running off the end) must yield NULL stats, never a throw
    // or a read at a garbage offset
    import graft.ops.Multimodal
    val bytesGen = Gen.chooseNum(0, 80).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    (1L to 5L).foreach { seed =>
      val payloads = sample(Gen.listOfN(30, bytesGen), seed) ++ Seq(
        Array[Byte](),
        Array(0xFF.toByte, 0xD8.toByte),                       // bare SOI
        Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte),          // truncated marker
        Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xDA.toByte), // SOS, no header
        Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xDA.toByte,
          0x00.toByte, 0x02.toByte),                           // scan runs off the end
        Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xD9.toByte)) // SOI+EOI: 0 scans
      val df = payloads.zipWithIndex
        .map { case (p, i) => (i.toLong, "x", p) }
        .toDF("doc_id", "media_type", "payload")
      val rows = Multimodal.scanStats(df).orderBy("doc_id").collect()
      assert(rows.length === payloads.length) // total: no exception, no drop
      // the well-formed zero-scan stream decodes to explicit zeros
      val soiEoi = rows.last
      assert(soiEoi.getAs[Int]("n_scans") === 0)
      assert(soiEoi.getAs[Long]("scan_bytes_total") === 0L)
    }
  }

  test("property: PNG chunk walk recovers IHDR fields and the exact IDAT split") {
    // every generated geometry must walk back to the planted integers
    // with crc_bad = 0 — the builder's Spark-crc32 and the walker's
    // independent CRC recompute must agree bit-for-bit
    import graft.ops.Multimodal
    val geom = for {
      w <- Gen.chooseNum(1, 1 << 20); h <- Gen.chooseNum(1, 1 << 20)
      ct <- Gen.oneOf(0, 2, 3, 4, 6); il <- Gen.chooseNum(0, 1)
      ni <- Gen.chooseNum(1, 4)
      body <- Gen.asciiPrintableStr
    } yield (w, h, ct, il, ni, body)
    (1L to 5L).foreach { seed =>
      val cases = sample(Gen.listOfN(20, geom), seed).zipWithIndex
      val df = cases.map { case ((w, h, ct, il, ni, body), i) =>
        (i.toLong, w, h, ct, il, ni, body)
      }.toDF("doc_id", "w", "h", "ct", "il", "ni", "body")
        .select(col("doc_id"), lit("x").as("media_type"),
          Multimodal.pngPayload(col("w"), col("h"), col("ct"),
            col("il"), col("ni"), col("body")).as("payload"))
      val got = Multimodal.pngStats(df).orderBy("doc_id").collect()
      cases.foreach { case ((w, h, ct, il, ni, body), i) =>
        val r = got(i)
        assert(r.getAs[String]("container") === "png", s"seed $seed case $i")
        assert(r.getAs[Int]("width") === w, s"seed $seed case $i")
        assert(r.getAs[Int]("height") === h, s"seed $seed case $i")
        assert(r.getAs[Int]("bit_depth") === 8, s"seed $seed case $i")
        assert(r.getAs[Int]("color_type") === ct, s"seed $seed case $i")
        assert(r.getAs[Int]("interlace") === il, s"seed $seed case $i")
        assert(r.getAs[Int]("n_chunks") === ni + 2, s"seed $seed case $i")
        assert(r.getAs[Int]("n_idat") === ni, s"seed $seed case $i")
        assert(r.getAs[Long]("idat_bytes_total") === body.length.toLong,
          s"seed $seed case $i")
        assert(r.getAs[Int]("crc_bad") === 0, s"seed $seed case $i")
      }
    }
  }

  test("PNG CRC integrity: a corrupted data byte counts, truncation nulls, bad args raise") {
    import graft.ops.Multimodal
    val base = Seq((0L, "png body payload bytes here"))
      .toDF("doc_id", "body")
      .select(Multimodal.pngPayload(lit(64), lit(48), lit(2), lit(0),
        lit(2), col("body")).as("p"))
      .collect().head.getAs[Array[Byte]](0)
    val clean = graft.functions.DspKernel.pngChunkStats(base)
    assert(clean != null && clean.toLongArray()(8) === 0L)
    // flip one byte INSIDE the first IDAT's data (signature 8 + IHDR 25
    // + idat length/type 8 lands at the first body byte): the walk must
    // still complete — framing intact — but count exactly one bad CRC
    val corrupted = base.clone()
    corrupted(8 + 25 + 8) = (corrupted(8 + 25 + 8) ^ 0x01).toByte
    val flagged = graft.functions.DspKernel.pngChunkStats(corrupted)
    assert(flagged != null, "a bad CRC is a flag, not a malformed stream")
    assert(flagged.toLongArray()(8) === 1L)
    assert(flagged.toLongArray().take(8).toSeq === clean.toLongArray().take(8).toSeq)
    // truncating mid-chunk is malformed: null, never a garbage-offset read
    assert(graft.functions.DspKernel.pngChunkStats(base.dropRight(5)) == null)
    // the generator refuses arguments it cannot frame
    val e = intercept[Exception] {
      Seq((0L, "body")).toDF("doc_id", "body")
        .select(Multimodal.pngPayload(lit(4), lit(4), lit(5), lit(0),
          lit(1), col("body")))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("colorType")), s"unexpected: $e")
  }

  test("property: the PNG walk is total over arbitrary binary garbage") {
    import graft.ops.Multimodal
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val bytesGen = Gen.chooseNum(0, 80).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    (1L to 5L).foreach { seed =>
      val payloads = sample(Gen.listOfN(30, bytesGen), seed) ++ Seq(
        Array[Byte](),
        sig,                                          // bare signature
        sig ++ Array[Byte](0, 0, 0),                  // truncated length
        sig ++ Array[Byte](0, 0, 0, 13),              // IHDR length, no type
        // garbage AFTER the signature with a giant declared length
        sig ++ Array[Byte](0x7F, -1, -1, -1, 'I', 'H', 'D', 'R'))
      val df = payloads.zipWithIndex
        .map { case (p, i) => (i.toLong, "x", p) }
        .toDF("doc_id", "media_type", "payload")
      val rows = Multimodal.pngStats(df).orderBy("doc_id").collect()
      assert(rows.length === payloads.length) // total: no exception, no drop
      rows.foreach(r => assert(r.getAs[String]("container") != null))
    }
  }

  test("property: WARC walk recovers the planted record census over generated geometry") {
    // builder and walker must agree byte-for-byte: census counts,
    // Content-Length-framed payload totals, and the header-byte
    // accounting (65 fixed framing bytes + type + record id + the
    // decimal width of each per-record length)
    import graft.ops.Multimodal
    val geom = for {
      nr <- Gen.chooseNum(1, 4)
      variant <- Gen.chooseNum(0, 999999)
      body <- Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    } yield (nr, variant.toLong, body)
    (1L to 5L).foreach { seed =>
      val cases = sample(Gen.listOfN(15, geom), seed).zipWithIndex
      val df = cases.map { case ((nr, v, body), i) => (i.toLong, nr, v, body) }
        .toDF("doc_id", "nr", "variant", "body")
        .select(col("doc_id"),
          Multimodal.warcPayload(col("nr"), col("variant"), col("body"))
            .as("payload"))
      val got = Multimodal.warcStats(df).orderBy("doc_id").collect()
      cases.foreach { case ((nr, v, body), i) =>
        val r = got(i)
        val l = body.length
        val chunks = (0 until nr).map(k => l / nr + (if (k < l % nr) 1 else 0))
        val types = (0 until nr).map(k => if (k == 0) "warcinfo"
          else Seq("response", "request", "metadata")(((v + k) % 3).toInt))
        val headers = (0 until nr).map(k => 65 + types(k).length +
          s"<urn:graft:$v-$k>".length + chunks(k).toString.length)
        assert(r.getAs[Long]("n_records") === nr.toLong, s"seed $seed case $i")
        assert(r.getAs[Long]("n_warcinfo") === 1L, s"seed $seed case $i")
        assert(r.getAs[Long]("n_response") ===
          types.count(_ == "response").toLong, s"seed $seed case $i")
        assert(r.getAs[Long]("n_request") ===
          types.count(_ == "request").toLong, s"seed $seed case $i")
        assert(r.getAs[Long]("n_metadata") ===
          types.count(_ == "metadata").toLong, s"seed $seed case $i")
        assert(r.getAs[Long]("n_other") === 0L, s"seed $seed case $i")
        assert(r.getAs[Long]("payload_bytes") === l.toLong, s"seed $seed case $i")
        assert(r.getAs[Long]("header_bytes") === headers.sum.toLong,
          s"seed $seed case $i")
        assert(r.getAs[Long]("total_bytes") === (l + headers.sum).toLong,
          s"seed $seed case $i")
      }
      // per-record geometry: slicing the raw stream at each walked
      // payload_offset recovers the planted chunk BIT-exactly — offsets
      // are useful, not just consistent (substring is 1-based)
      val sliced = Multimodal.warcRecords(df).join(df, "doc_id")
        .select(col("doc_id"), col("rec_idx"), col("wtype"),
          substring(col("payload"), (col("payload_offset") + 1).cast("int"),
            col("content_length").cast("int")).cast("string").as("body"))
        .orderBy("doc_id", "rec_idx").collect()
      cases.foreach { case ((nr, v, body), i) =>
        val l = body.length
        val chunks = (0 until nr).scanLeft(0) { (off, k) =>
          off + l / nr + (if (k < l % nr) 1 else 0) }
        val rows = sliced.filter(_.getAs[Long]("doc_id") == i.toLong)
        assert(rows.length === nr, s"seed $seed case $i")
        rows.zipWithIndex.foreach { case (row, k) =>
          val want = body.substring(chunks(k), chunks(k + 1))
          assert(row.getAs[String]("body") === want,
            s"seed $seed case $i record $k")
          val wantType = if (k == 0) "warcinfo"
            else Seq("response", "request", "metadata")(((v + k) % 3).toInt)
          assert(row.getAs[String]("wtype") === wantType,
            s"seed $seed case $i record $k")
        }
      }
    }
  }

  test("WARC walk: version/case tolerance, other-type census, malformed streams null, bad args raise") {
    import graft.ops.Multimodal
    def walk(s: String) =
      graft.functions.DspKernel.warcStats(s.getBytes("UTF-8"))
    // WARC/1.1 + case-insensitive header names and type values + an
    // unknown header whose VALUE contains colons — all per ISO 28500
    val tolerant = "WARC/1.1\r\n" +
      "warc-type: RESPONSE\r\n" +
      "X-Custom: colons: allowed in values\r\n" +
      "Content-LENGTH: 5\r\n" +
      "\r\nhello\r\n\r\n"
    val t = walk(tolerant)
    assert(t != null && t.toLongArray().toSeq ===
      Seq(1L, 0L, 1L, 0L, 0L, 0L, 5L, tolerant.length - 5L))
    // an unrecognized WARC-Type counts as other, never breaks the walk
    val revisit = "WARC/1.0\r\nWARC-Type: revisit\r\n" +
      "WARC-Record-ID: <urn:x:1>\r\nContent-Length: 2\r\n\r\nok\r\n\r\n"
    val rv = walk(revisit)
    assert(rv != null && rv.toLongArray().toSeq ===
      Seq(1L, 0L, 0L, 0L, 0L, 1L, 2L, revisit.length - 2L))
    // malformed: null, never a throw or a garbage-offset read
    val wellFormed = revisit
    assert(walk(wellFormed.dropRight(1)) == null)             // truncated terminator
    assert(walk(wellFormed.replace(": 2\r", ": 3\r")) == null) // payload overruns framing
    assert(walk(wellFormed.replace(": 2\r", ": 2a\r")) == null) // non-numeric length
    assert(walk("WARC/1.0\r\nWARC-Type: response\r\n\r\n\r\n\r\n") == null) // no Content-Length
    assert(walk("WARC/1.0\r\nno colon line\r\n\r\n\r\n\r\n") == null) // colonless header
    assert(walk("WARC/1.0\r\nContent-Length: 1234567890123456789012\r\n\r\n") == null) // > 18 digits
    assert(walk("HTTP/1.1 200 OK\r\n\r\n") == null)           // not WARC at all
    // the generator refuses record counts it cannot frame
    val e = intercept[Exception] {
      Seq((0L, "body")).toDF("doc_id", "body")
        .select(Multimodal.warcPayload(lit(5), col("doc_id"), col("body")))
        .collect()
    }
    def msgs(t2: Throwable): Seq[String] =
      Option(t2).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("nRecords out of")), s"unexpected: $e")
    // ...and on the LOW side too: nRecords = 0 must raise, not silently
    // yield an empty payload (the guard lives on the final concat — an
    // unconditionally evaluated slot — precisely so the low side cannot
    // slip past a gated record-0 slot)
    val e0 = intercept[Exception] {
      Seq((0L, "body")).toDF("doc_id", "body")
        .select(Multimodal.warcPayload(lit(0), col("doc_id"), col("body")))
        .collect()
    }
    assert(msgs(e0).exists(_.contains("nRecords out of")), s"unexpected: $e0")
  }

  test("property: the WARC walk is total over arbitrary binary garbage") {
    import graft.ops.Multimodal
    val bytesGen = Gen.chooseNum(0, 80).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    (1L to 5L).foreach { seed =>
      val payloads = sample(Gen.listOfN(30, bytesGen), seed) ++ Seq(
        Array[Byte](),
        "WARC/1.0\r\n".getBytes("UTF-8"),              // bare version line
        "WARC/1.0".getBytes("UTF-8"),                  // unterminated version
        "WARC/1.0\r\nContent-Length: 99999\r\n\r\n".getBytes("UTF-8"),
        ("WARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n" * 3).getBytes("UTF-8"))
      val df = payloads.zipWithIndex
        .map { case (p, i) => (i.toLong, p) }
        .toDF("doc_id", "payload")
      val rows = Multimodal.warcStats(df).orderBy("doc_id").collect()
      assert(rows.length === payloads.length) // total: no exception, no drop
    }
  }

  test("property: the HTML walker is total and self-consistent over arbitrary strings") {
    import graft.functions.TextFunctions
    val htmlish: Gen[String] = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.const(""), Gen.const("<"), Gen.const("<p"), Gen.const("<!--"),
      Gen.const("<script>never closed"), Gen.const("<style>p{"),
      Gen.const("&amp"), Gen.const("&nbsp;"), Gen.const("a < b & c"),
      Gen.const("<a href=x>link</a> tail"), Gen.const("</a></a>"),
      Gen.listOf(Gen.oneOf('<', '>', '&', '/', '!', '-', 'a', 's', ' '))
        .map(_.mkString))
    (1L to 5L).foreach { seed =>
      val ss = sample(Gen.listOfN(40, htmlish), seed)
      val rows = ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("i", "h")
        .select(col("i"), TextFunctions.htmlText(col("h")).as("t"),
          TextFunctions.htmlStats(col("h")).as("s"))
        .orderBy("i").collect()
      assert(rows.length === ss.length) // total: no exception, no drop
      rows.zip(ss).foreach { case (r, s) =>
        val st = r.getSeq[Long](2)
        assert(st.length === 8)
        assert(st.forall(_ >= 0L), s"negative count on ${s.take(40)}")
        // extracted text never exceeds the page, char-for-char
        assert(st(1) <= st(0), s"text > page on ${s.take(40)}")
        assert(st(7) === 0L || st(7) === 1L)
        // the walker's own text length equals its census's text count
        assert(r.getString(1).codePointCount(0, r.getString(1).length).toLong
          === st(1), s"census/text disagree on ${s.take(40)}")
      }
    }
    // plain text with no markup chars passes through IDENTICALLY
    val plain = Seq((0L, "just some plain words, no markup at all"))
      .toDF("i", "h")
      .select(TextFunctions.htmlText(col("h")).as("t")).head.getString(0)
    assert(plain === "just some plain words, no markup at all")
  }

  test("property: gzip member walk recovers the planted geometry, and inflate is the identity") {
    // builder and walker must agree byte-for-byte: member count, the
    // flag-selected optional fields, MTIME, the stored-block split, the
    // per-member byte accounting, and the recomputed CRC32+ISIZE checks
    // — and concatenating the stored blocks back (the no-inflater
    // "inflate") must recover the original text bit-exactly
    import graft.ops.Multimodal
    val geom = for {
      nm <- Gen.chooseNum(1, 4)
      variant <- Gen.chooseNum(0, 999999)
      body <- Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    } yield (nm, variant.toLong, body)
    (1L to 5L).foreach { seed =>
      val cases = sample(Gen.listOfN(15, geom), seed).zipWithIndex
      val df = cases.map { case ((nm, v, body), i) => (i.toLong, nm, v, body) }
        .toDF("doc_id", "nm", "variant", "body")
        .select(col("doc_id"), col("body"),
          Multimodal.gzipPayload(col("nm"), col("variant"), col("body"))
            .as("payload"))
      val got = Multimodal.gzipStats(df.select("doc_id", "payload"))
        .orderBy("doc_id").collect()
      cases.foreach { case ((nm, v, body), i) =>
        val r = got(i)
        val l = body.length
        val chunks = (0 until nm).map(k => l / nm + (if (k < l % nm) 1 else 0))
        val flgs = (0 until nm).map(k => Seq(0, 8, 4)(((v + k) % 3).toInt))
        val nblks = (0 until nm).map(k => ((v + k) % 4 + 1).toInt)
        val headers = flgs.map(f => 10 + (if (f == 8) 9 else if (f == 4) 6 else 0))
        val deflates = nblks.zip(chunks).map { case (b, c) => 5 * b + c }
        assert(r.getAs[Long]("n_members") === nm.toLong, s"seed $seed case $i")
        assert(r.getAs[Long]("n_fname") === flgs.count(_ == 8).toLong, s"seed $seed case $i")
        assert(r.getAs[Long]("n_fextra") === flgs.count(_ == 4).toLong, s"seed $seed case $i")
        assert(r.getAs[Long]("n_blocks") === nblks.sum.toLong, s"seed $seed case $i")
        assert(r.getAs[Long]("header_bytes") === headers.sum.toLong, s"seed $seed case $i")
        assert(r.getAs[Long]("deflate_bytes") === deflates.sum.toLong, s"seed $seed case $i")
        assert(r.getAs[Long]("trailer_bytes") === 8L * nm, s"seed $seed case $i")
        assert(r.getAs[Long]("isize_total") === l.toLong, s"seed $seed case $i")
        assert(r.getAs[Long]("mtime_sum") ===
          (0 until nm).map(k => (v * 16 + k) % 4294967296L).sum, s"seed $seed case $i")
        assert(r.getAs[Long]("crc_ok") === nm.toLong,
          s"seed $seed case $i: a member failed its recomputed CRC32/ISIZE check")
        assert(r.getAs[Long]("total_bytes") ===
          (headers.sum + deflates.sum + 8 * nm).toLong, s"seed $seed case $i")
      }
      // per-member geometry face agrees with the same model
      val members = Multimodal.gzipMembers(df.select("doc_id", "payload"))
        .orderBy("doc_id", "member_idx").collect()
      cases.foreach { case ((nm, v, body), i) =>
        val rows = members.filter(_.getAs[Long]("doc_id") == i.toLong)
        assert(rows.length === nm, s"seed $seed case $i")
        rows.zipWithIndex.foreach { case (row, k) =>
          val l = body.length
          val chunk = l / nm + (if (k < l % nm) 1 else 0)
          val flg = Seq(0, 8, 4)(((v + k) % 3).toInt)
          val nblk = ((v + k) % 4 + 1).toInt
          assert(row.getAs[Long]("flg") === flg.toLong, s"seed $seed case $i member $k")
          assert(row.getAs[Long]("mtime") === (v * 16 + k) % 4294967296L, s"seed $seed case $i member $k")
          assert(row.getAs[Long]("header_len") ===
            (10 + (if (flg == 8) 9 else if (flg == 4) 6 else 0)).toLong, s"seed $seed case $i member $k")
          assert(row.getAs[Long]("deflate_len") === (5 * nblk + chunk).toLong, s"seed $seed case $i member $k")
          assert(row.getAs[Long]("n_blocks") === nblk.toLong, s"seed $seed case $i member $k")
          assert(row.getAs[Long]("isize") === chunk.toLong, s"seed $seed case $i member $k")
          assert(row.getAs[Long]("crc_ok") === 1L, s"seed $seed case $i member $k")
        }
      }
      // inflate identity: the stored-block concatenation IS the input
      val inflated = df.select(col("doc_id"), col("body"),
        graft.functions.MediaFunctions.gzipInflate(col("payload"))
          .cast("string").as("back"))
        .orderBy("doc_id").collect()
      inflated.foreach { r =>
        assert(r.getAs[String]("back") === r.getAs[String]("body"),
          s"seed $seed doc ${r.getAs[Long]("doc_id")}: inflate not the identity")
      }
    }
  }

  test("gzip walk: optional-field tolerance, malformed streams null, CRC/ISIZE mismatches counted, bad args raise") {
    import graft.ops.Multimodal
    def walk(p: Array[Byte]) = graft.functions.DspKernel.gzipMemberStats(p)
    // a hand-built well-formed member with FCOMMENT + FHCRC — fields the
    // builder never emits but RFC 1952 allows; the walker must consume
    // them in the spec's order
    def wellFormed(data: Array[Byte], flg: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte](0x1f, 0x8b.toByte, 8, flg.toByte, 1, 0, 0, 0, 0, 3))
      if ((flg & 4) != 0) out.write(Array[Byte](4, 0, 'G', 'R', 0, 0))
      if ((flg & 8) != 0) { out.write("n.txt".getBytes("UTF-8")); out.write(0) }
      if ((flg & 16) != 0) { out.write("a comment".getBytes("UTF-8")); out.write(0) }
      if ((flg & 2) != 0) out.write(Array[Byte](0x42, 0x42))
      out.write(Array[Byte](1, (data.length & 0xff).toByte,
        ((data.length >> 8) & 0xff).toByte,
        ((data.length ^ 0xffff) & 0xff).toByte,
        (((data.length ^ 0xffff) >> 8) & 0xff).toByte))
      out.write(data)
      val crc = new java.util.zip.CRC32(); crc.update(data)
      val c = crc.getValue
      out.write(Array[Byte](c.toByte, (c >> 8).toByte, (c >> 16).toByte,
        (c >> 24).toByte, data.length.toByte, (data.length >> 8).toByte,
        (data.length >> 16).toByte, (data.length >> 24).toByte))
      out.toByteArray
    }
    val data = "hello stored world".getBytes("UTF-8")
    val full = wellFormed(data, 2 | 4 | 8 | 16) // FHCRC+FEXTRA+FNAME+FCOMMENT
    val s = walk(full)
    assert(s != null && s.toLongArray()(0) === 1L && s.toLongArray()(8) === 1L)
    assert(s.toLongArray()(6) === data.length.toLong) // isize_total
    // two members concatenate
    val two = wellFormed(data, 0) ++ wellFormed(Array[Byte](), 8)
    val s2 = walk(two)
    assert(s2 != null && s2.toLongArray()(0) === 2L && s2.toLongArray()(8) === 2L)
    // malformed: null, never a throw or a garbage-offset read
    assert(walk(Array[Byte]()) == null)                       // empty stream
    assert(walk("not gzip".getBytes("UTF-8")) == null)        // bad magic
    assert(walk(full.take(9)) == null)                        // truncated header
    val base = wellFormed(data, 0)
    assert(walk(base.dropRight(1)) == null)                   // truncated trailer
    assert(walk(base.updated(2, 7.toByte)) == null)           // CM != deflate
    assert(walk(base.updated(3, 0x20.toByte)) == null)        // reserved FLG bit
    assert(walk(base.updated(10, 6.toByte)) == null)          // BTYPE 11: reserved
    assert(walk(base.updated(13, 0.toByte)) == null)          // NLEN complement broken
    val named = wellFormed(data, 8)
    assert(walk(named.take(named.length - data.length - 13 - 5)
      .map(b => if (b == 0) 'x'.toByte else b)) == null)      // unterminated FNAME
    // a block claiming more data than the buffer holds
    assert(walk(base.updated(11, 0xff.toByte).updated(12, 0xff.toByte)
      .updated(13, 0.toByte).updated(14, 0.toByte)) == null)
    // CRC / ISIZE corruption is NOT malformation — the member walks,
    // the mismatch is counted (crc_ok drops), geometry stays exact
    val badCrc = base.clone(); badCrc(base.length - 8) = (badCrc(base.length - 8) ^ 1).toByte
    val sc = walk(badCrc)
    assert(sc != null && sc.toLongArray()(0) === 1L && sc.toLongArray()(8) === 0L)
    val badIsize = base.clone(); badIsize(base.length - 4) = (badIsize(base.length - 4) ^ 1).toByte
    val si = walk(badIsize)
    assert(si != null && si.toLongArray()(0) === 1L && si.toLongArray()(8) === 0L)
    // the generator refuses member counts it cannot frame — BOTH sides
    // (the guard is on the final concat, the unconditional slot)
    def msgs(t2: Throwable): Seq[String] =
      Option(t2).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    for (bad <- Seq(0, 5)) {
      val e = intercept[Exception] {
        Seq((0L, "body")).toDF("doc_id", "body")
          .select(Multimodal.gzipPayload(lit(bad), col("doc_id"), col("body")))
          .collect()
      }
      assert(msgs(e).exists(_.contains("nMembers out of")), s"unexpected: $e")
    }
  }

  test("cdx index serves random access: seek the indexed member, inflate locally, slice the record bit-exactly") {
    import graft.ops.Multimodal
    val docs = (0L until 16L)
      .map(i => (i, s"record payload body $i " * (i.toInt % 5 + 2)))
      .toDF("doc_id", "text")
    val frame = Multimodal.warcGzFrame(docs)
    val cdx = Multimodal.cdxIndex(frame).collect()
    assert(cdx.nonEmpty)
    val raws = frame.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("payload"))
      .toMap
    cdx.foreach { row =>
      val doc = row.getAs[Long]("doc_id")
      val comp = raws(doc)
      val full = graft.functions.DspKernel.gzipInflate(comp)
      val off = row.getAs[Long]("payload_offset").toInt
      val clen = row.getAs[Long]("content_length").toInt
      val want = java.util.Arrays.copyOfRange(full, off, off + clen)
      val mo = row.getAs[Long]("member_offset").toInt
      val mclen = row.getAs[Long]("member_clen").toInt
      val ustart = row.getAs[Long]("member_ustart").toInt
      // the indexed (member_offset, member_clen) span is a VALID
      // standalone gzip member whose data is exactly the uncompressed
      // stream from member_ustart — the seek contract
      val one = graft.functions.DspKernel.gzipInflate(
        java.util.Arrays.copyOfRange(comp, mo, mo + mclen))
      assert(one != null, s"doc $doc: indexed member span is not a valid member")
      assert(java.util.Arrays.equals(one,
        java.util.Arrays.copyOfRange(full, ustart, ustart + one.length)),
        s"doc $doc: member data diverged from the uncompressed span")
      assert(off >= ustart && off < ustart + one.length,
        s"doc $doc: payload start not inside the indexed member")
      // random access: inflate from the indexed member FORWARD only
      // (bytes before member_offset are never touched) and slice the
      // payload at the local offset — bit-identical to the direct read
      val local = graft.functions.DspKernel.gzipInflate(
        java.util.Arrays.copyOfRange(comp, mo, comp.length))
      val got = java.util.Arrays.copyOfRange(local, off - ustart,
        off - ustart + clen)
      assert(java.util.Arrays.equals(got, want),
        s"doc $doc rec ${row.getAs[Long]("rec_idx")}: sliced payload diverged")
    }
  }

  test("property: BMP average hash matches a driver model; planted low-bit noise survives the bands") {
    import graft.ops.{Dedup, Multimodal}
    // driver model of the kernel: cells by 64*i/n floor mapping, byte-sum
    // grayscale, cross-multiplied mean test, MSB-first hex nibbles
    def model(body: Array[Byte]): Option[String] = {
      val n = body.length / 3
      if (n == 0) return None
      val sums = new Array[Long](64); val cnts = new Array[Long](64)
      (0 until n).foreach { i =>
        val g = (body(3 * i) & 0xff) + (body(3 * i + 1) & 0xff) + (body(3 * i + 2) & 0xff)
        val c = ((64L * i) / n).toInt
        sums(c) += g; cnts(c) += 1
      }
      val total = sums.sum
      Some((0 until 16).map { k =>
        val v = (0 until 4).foldLeft(0) { (acc, b) =>
          (acc << 1) | (if (sums(4 * k + b) * n > total * cnts(4 * k + b)) 1 else 0)
        }
        "0123456789abcdef"(v)
      }.mkString)
    }
    val bodyGen = Gen.chooseNum(0, 400).flatMap(m =>
      Gen.listOfN(m, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    (1L to 5L).foreach { seed =>
      val bodies = sample(Gen.listOfN(20, bodyGen), seed)
      val df = bodies.zipWithIndex.map { case (b, i) =>
        val p = new java.io.ByteArrayOutputStream()
        p.write('B'); p.write('M'); p.write(new Array[Byte](52)); p.write(b)
        (i.toLong, p.toByteArray)
      }.toDF("doc_id", "payload")
      val got = Multimodal.imageAHash(df).orderBy("doc_id").collect()
        .map(r => Option(r.getString(1)))
      assert(got.toSeq === bodies.map(model).toSeq,
        s"seed $seed: kernel diverged from the driver model")
    }
    // planted near-dup: STRONG-contrast pixel rows (cells far from the
    // mean), then low-bit noise in a few pixels — the perceptual-dup
    // shape a re-encode introduces. The hash must be IDENTICAL (every
    // cell stays on its side of the mean), so the banded join recovers
    // the pair at hamming 0; an unrelated inverted image must NOT pair.
    val strong = Array.tabulate(64 * 6 * 3)(i => if ((i / (6 * 3)) % 2 == 0) 10.toByte else 200.toByte)
    val noisy = strong.clone()
    (0 until 20).foreach(k => noisy(k * 17) = (noisy(k * 17) ^ 0x3).toByte)
    val inverted = strong.map(b => (255 - (b & 0xff)).toByte)
    def bmp(b: Array[Byte]): Array[Byte] = {
      val p = new java.io.ByteArrayOutputStream()
      p.write('B'); p.write('M'); p.write(new Array[Byte](52)); p.write(b)
      p.toByteArray
    }
    val planted = Seq((0L, bmp(strong)), (1L, bmp(noisy)), (2L, bmp(inverted)))
      .toDF("doc_id", "payload")
    val pairs = Dedup.imageAHashPairs(Multimodal.imageAHash(planted))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((0L, 1L, 0L)),
      s"expected exactly the planted (0,1) pair at hamming 0, got ${pairs.toSeq}")
    // totality: non-BMP and pixel-less payloads null, never throw
    val junk = Seq((0L, Array[Byte]()), (1L, "nope".getBytes("UTF-8")),
      (2L, bmp(Array[Byte]()))).toDF("doc_id", "payload")
    val nulls = Multimodal.imageAHash(junk).collect()
    assert(nulls.length === 3 && nulls.forall(_.isNullAt(1)))
  }

  test("property: BMP difference hash matches a driver model and survives the ramp aHash cannot") {
    import graft.ops.{Dedup, Multimodal}
    def bmp(b: Array[Byte]): Array[Byte] = {
      val p = new java.io.ByteArrayOutputStream()
      p.write('B'); p.write('M'); p.write(new Array[Byte](52)); p.write(b)
      p.toByteArray
    }
    // driver model: 65 cells by the floor mapping, bit c = the exact
    // cross-multiplied adjacent comparison
    def dmodel(body: Array[Byte]): Option[String] = {
      val n = body.length / 3
      if (n == 0) return None
      val sums = new Array[Long](65); val cnts = new Array[Long](65)
      (0 until n).foreach { i =>
        val g = (body(3 * i) & 0xff) + (body(3 * i + 1) & 0xff) + (body(3 * i + 2) & 0xff)
        val c = ((65L * i) / n).toInt
        sums(c) += g; cnts(c) += 1
      }
      Some((0 until 16).map { k =>
        val v = (0 until 4).foldLeft(0) { (acc, b) =>
          val c = 4 * k + b
          (acc << 1) | (if (sums(c) * cnts(c + 1) > sums(c + 1) * cnts(c)) 1 else 0)
        }
        "0123456789abcdef"(v)
      }.mkString)
    }
    val bodyGen = Gen.chooseNum(0, 400).flatMap(m =>
      Gen.listOfN(m, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    (1L to 5L).foreach { seed =>
      val bodies = sample(Gen.listOfN(20, bodyGen), seed)
      val df = bodies.zipWithIndex.map { case (b, i) => (i.toLong, bmp(b)) }
        .toDF("doc_id", "payload")
      val got = Multimodal.imageDHash(df).orderBy("doc_id").collect()
        .map(r => Option(r.getString(1)))
      assert(got.toSeq === bodies.map(dmodel).toSeq,
        s"seed $seed: dHash kernel diverged from the driver model")
    }
    // the complementary axis: a smooth brightness ramp preserves
    // every adjacent-cell ordering (dHash identical) while pushing
    // dark cells past the global mean (aHash flips) — the vignette /
    // exposure-gradient edit class
    val n = 390 // 65 cells x 6 px, pattern period 12 px = 2 cells
    val base = Array.tabulate(n * 3)(i =>
      if ((i / (6 * 3)) % 2 == 0) 10.toByte else 60.toByte)
    val ramped = base.zipWithIndex.map { case (b, i) =>
      ((b & 0xff) + (180 * (i / 3)) / n).toByte
    }
    val dBase = graft.functions.DspKernel.bmpDHash(bmp(base)).toString
    val dRamp = graft.functions.DspKernel.bmpDHash(bmp(ramped)).toString
    assert(dBase === dRamp, "dHash did not survive the brightness ramp")
    val aBase = graft.functions.DspKernel.bmpAHash(bmp(base)).toString
    val aRamp = graft.functions.DspKernel.bmpAHash(bmp(ramped)).toString
    assert(aBase !== aRamp,
      "aHash unexpectedly survived the ramp — the axes are not complementary")
    // and the dHash bands recover the ramped near-dup where the aHash
    // bands cannot: the pair frame under each hash
    val frame = Seq((0L, bmp(base)), (1L, bmp(ramped))).toDF("doc_id", "payload")
    val dPairs = Dedup.imageHashPairs(Multimodal.imageDHash(frame), "dhash")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(dPairs.toSeq === Seq((0L, 1L, 0L)),
      s"dHash bands missed the ramped twin: ${dPairs.toSeq}")
  }

  test("property: prefix-doubling rank classes equal direct window-string classes") {
    // the whole correctness of substringDedup rests on one claim: after
    // log2(L) doubling rounds, two positions share a rank IFF their
    // L-token windows are equal strings — so the census must match a
    // driver model that brute-materializes every window
    import graft.ops.Dedup
    val wordy: Gen[String] = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "dog", "cat")).map(_.mkString(" ")))
    val L = 4
    (1L to 5L).foreach { seed =>
      val texts = sample(Gen.listOfN(20, wordy), seed)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Dedup.substringDedup(docs, windowTokens = L)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // driver model: every L-gram string, grouped
      val wins = texts.zipWithIndex.flatMap { case (t, i) =>
        val toks = t.split(" ", -1)
        (0 to toks.length - L).map(p => (i.toLong, toks.slice(p, p + L).mkString(" ")))
      }
      val occ = wins.groupBy(_._2).view.mapValues(_.size).toMap
      val dd = wins.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size).toMap
      val model = texts.indices.map { i =>
        val mine = wins.filter(_._1 == i.toLong).map(_._2)
        (i.toLong, mine.size.toLong,
          mine.count(w => occ(w) >= 2).toLong,
          mine.count(w => dd(w) >= 2).toLong)
      }
      assert(got.toSeq === model,
        s"seed $seed: doubling classes diverged from brute window strings")
      // and the REMOVAL face equals a brute driver model: cut every
      // token covered by any repeated window, md5 the reassembly
      def md5hex(s: String): String =
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val rmGot = graft.ops.Dedup.substringDedupRemove(docs, windowTokens = L)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
          r.getLong(4)))
      val rmModel = texts.zipWithIndex.map { case (t, i) =>
        val toks = t.split(" ", -1)
        val flags = (0 to toks.length - L)
          .filter(p => occ(toks.slice(p, p + L).mkString(" ")) >= 2)
        val covered = toks.indices.map(x => flags.exists(p => p <= x && x < p + L))
        val kept = toks.indices.filterNot(covered).map(toks).mkString(" ")
        (i.toLong, toks.length.toLong, covered.count(identity).toLong,
          md5hex(kept), 1000000L * covered.count(identity) / toks.length)
      }
      assert(rmGot.toSeq === rmModel,
        s"seed $seed: removal face diverged from the brute model")
    }
  }

  test("substring rank artifact: read-back faces equal the inline recompute") {
    // the doubling rounds are the family's dominant cost and both
    // faces consume the same ranks — the artifact must be a pure
    // cache, never a semantic fork (integral columns round-trip
    // parquet exactly)
    import graft.ops.{Artifacts, Dedup}
    val docs = (0L until 12L)
      .map(i => (i, s"shared prefix tokens here then unique tail t$i " * 2))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("substr_ranks")
      .toString
    val stored = Artifacts.parquetArtifact(spark, path)(
      Dedup.substringRanks(docs, windowTokens = 4))
    val census = Dedup.substringDedupFromRanks(docs, stored)
      .orderBy("doc_id").collect()
    assert(census.toSeq ===
      Dedup.substringDedup(docs, windowTokens = 4).orderBy("doc_id")
        .collect().toSeq, "census face diverged through the artifact")
    val removal = Dedup.substringDedupRemoveFromRanks(docs, stored,
      windowTokens = 4).orderBy("doc_id").collect()
    assert(removal.toSeq ===
      Dedup.substringDedupRemove(docs, windowTokens = 4).orderBy("doc_id")
        .collect().toSeq, "removal face diverged through the artifact")
  }

  test("real-deflate WARC->HTML->text chain censuses identically to the direct extraction") {
    // the END-TO-END Common-Crawl shape over actual zlib bytes: html
    // page -> warc response record -> dynamic-Huffman gzip -> OUR
    // inflater -> record walk -> payload slice -> extraction census
    // must equal extracting from the page directly (lossless round
    // trip through two container layers and a real codec)
    import graft.ops.{Multimodal, TextAnalysis}
    val docs = (0L until 24L)
      .map(i => (i, s"crawled page body $i with words " * (i.toInt % 5 + 1)))
      .toDF("doc_id", "text")
    val direct = TextAnalysis.htmlExtractCensus(docs)
      .orderBy("doc_id").collect()
    val viaChain = Multimodal.warcGzRealHtmlCensus(docs)
      .orderBy("doc_id").collect()
    assert(viaChain.toSeq === direct.toSeq,
      "the real-deflate chain diverged from the direct extraction")
  }

  test("substring dedup flags the misaligned cross-doc repeat that line dedup cannot see") {
    import graft.ops.Dedup
    // a 50-token run planted at offset 3 of doc 0 and offset 7 of doc 1:
    // different alignments mod 8, so the two docs' fixed 8-word lines
    // never coincide — lineDedup finds ZERO duplicate lines, while the
    // suffix-rank windows flag every covered position in both docs
    val repeat = (0 until 50).map(k => s"r$k").mkString(" ")
    val docA = ((0 until 3).map(k => s"a$k") :+ repeat).mkString(" ") +
      " " + (0 until 9).map(k => s"az$k").mkString(" ")
    val docB = ((0 until 7).map(k => s"b$k") :+ repeat).mkString(" ") +
      " " + (0 until 5).map(k => s"bz$k").mkString(" ")
    val docs = Seq((0L, docA), (1L, docB)).toDF("doc_id", "text")
    val line = Dedup.lineDedup(docs).orderBy("doc_id").collect()
    assert(line.forall(_.getAs[Long]("n_dup_lines") === 0L),
      "line dedup unexpectedly saw the misaligned repeat")
    val sub = Dedup.substringDedup(docs, windowTokens = 32)
      .orderBy("doc_id").collect()
    // 50-token repeat → 19 fully-contained 32-windows per doc
    sub.foreach { r =>
      assert(r.getAs[Long]("n_crossdoc_windows") === 19L,
        s"doc ${r.getLong(0)}: expected 19 flagged cross-doc windows, " +
          s"got ${r.getAs[Long]("n_crossdoc_windows")}")
    }
    // the removal face cuts exactly the repeat's token span in both
    // docs and reassembles the unique remainder
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rem = Dedup.substringDedupRemove(docs).orderBy("doc_id").collect()
    val keptA = ((0 until 3).map(k => s"a$k") ++ (0 until 9).map(k => s"az$k")).mkString(" ")
    val keptB = ((0 until 7).map(k => s"b$k") ++ (0 until 5).map(k => s"bz$k")).mkString(" ")
    assert(rem.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3), r.getLong(4))).toSeq === Seq(
      (0L, 62L, 50L, md5hex(keptA), 1000000L * 50 / 62),
      (1L, 62L, 50L, md5hex(keptB), 1000000L * 50 / 62)),
      "removal did not cut exactly the planted repeat span")
    // short and null docs carry zero windows, not dropped rows
    val edge = Seq((0L, "tiny doc"), (1L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val er = Dedup.substringDedup(edge, windowTokens = 32)
      .orderBy("doc_id").collect()
    assert(er.length === 2 && er.forall(_.getAs[Long]("n_windows") === 0L))
    // the packed key refuses what it cannot encode
    val bad = Seq((-1L, ("w " * 40).trim)).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.substringDedup(bad, windowTokens = 4).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("packed key")), s"unexpected: $e")
    // ... and the UPPER doc_id bound fails as loudly as the lower one
    // (doc_id·2^20 at 2^43 would wrap Long silently without the guard)
    val big = Seq((1L << 43, ("w " * 40).trim)).toDF("doc_id", "text")
    val eb = intercept[Exception] {
      Dedup.substringDedup(big, windowTokens = 4).collect()
    }
    assert(msgs(eb).exists(_.contains("packed key")), s"unexpected: $eb")
  }

  test("property: the linear recurrence fold equals the retired HOF aggregate form bit for bit") {
    // ewmaServe/holtServe/bfdFold moved from the O(n²) `aggregate(...,
    // concat(acc, ...))` shape to the codegen'd RecurrenceKernel — the
    // HOF forms are replayed HERE as the independent model, including
    // negative sums (where floor != truncation) and load-tie packing
    val seriesGen = for {
      n <- Gen.chooseNum(1, 40)
      xs <- Gen.listOfN(n, Gen.chooseNum(-5000000L, 5000000L))
    } yield xs
    (1L to 5L).foreach { seed =>
      val keys = sample(Gen.listOfN(8, seriesGen), seed)
      val hourly = keys.zipWithIndex.flatMap { case (xs, k) =>
        xs.zipWithIndex.map { case (x, t) =>
          (s"k$k", t.toLong * 3600000000L, x, 1L)
        }
      }.toDF("key", "bucket_us", "swq", "n")
      // EWMA vs the HOF replica at alpha = 1/4
      val got = graft.ops.TimeSeries.ewmaServe(hourly, 1L, 4L)
        .orderBy("key", "bucket_us").collect()
      val hof = hourly.groupBy("key")
        .agg(sort_array(collect_list(struct(col("bucket_us"), col("swq")))).as("xs"))
        .select(col("key"), explode(expr(
          """aggregate(
            |  slice(xs, 2, size(xs) - 1),
            |  array(struct(xs[0].bucket_us AS bucket_us, xs[0].swq AS swq,
            |               CAST(xs[0].swq AS BIGINT) AS s)),
            |  (acc, e) -> concat(acc, array(struct(
            |    e.bucket_us AS bucket_us, e.swq AS swq,
            |    ((1 * e.swq + 3 * element_at(acc, -1).s)
            |      - (((1 * e.swq + 3 * element_at(acc, -1).s) % 4 + 4) % 4))
            |      DIV 4 AS s)))
            |)""".stripMargin)).as("e"))
        .select(col("key"), col("e.bucket_us"), col("e.swq"),
          col("e.s").as("ewma_q"))
        .orderBy("key", "bucket_us").collect()
      assert(got.toSeq === hof.toSeq, s"seed $seed: ewma diverged from the HOF form")
      // Holt vs a driver-side integer model at alpha 1/4, beta 1/2
      val holtGot = graft.ops.TimeSeries.holtServe(hourly, 1L, 4L, 1L, 2L)
        .orderBy("key", "bucket_us").collect()
      val model = keys.zipWithIndex.flatMap { case (xs, k) =>
        var l = 0L; var b = 0L
        xs.zipWithIndex.map { case (x, t) =>
          if (t == 0) { l = x; b = 0L }
          else {
            val lp = l
            l = Math.floorDiv(1L * x + 3L * (lp + b), 4L)
            b = Math.floorDiv(1L * (l - lp) + 1L * b, 2L)
          }
          (s"k$k", t.toLong * 3600000000L, x, l, b, l + b)
        }
      }.sortBy(r => (r._1, r._2))
      assert(holtGot.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq === model.toSeq,
        s"seed $seed: holt diverged from the driver model")
    }
    // BFD vs the retired HOF packer, load ties included
    val docsGen = for {
      n <- Gen.chooseNum(1, 60)
      toks <- Gen.listOfN(n, Gen.chooseNum(1L, 256L))
    } yield toks
    (1L to 5L).foreach { seed =>
      val toks = sample(docsGen, seed)
      val docs = toks.zipWithIndex
        .map { case (t, i) => (i.toLong, ("w " * t.toInt).trim) }
        .toDF("doc_id", "text")
      val got = graft.ops.Sampling.packSequencesBfd(docs, 256L)
        .orderBy("doc_id").collect()
      val hof = docs
        .select(col("doc_id"),
          md5(concat(lit("pack:"), col("doc_id").cast("string"))).as("h"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .withColumn("shard", conv(substring(col("h"), 1, 1), 16, 10).cast("int"))
        .groupBy("shard")
        .agg(sort_array(collect_list(struct((-col("n_tokens")).as("neg"),
          col("doc_id"), col("n_tokens").as("n")))).as("xs"))
        .withColumn("folded", expr(
          """aggregate(xs,
            |  struct(CAST(array() AS ARRAY<BIGINT>) AS loads,
            |    CAST(array() AS ARRAY<STRUCT<doc_id: BIGINT, bin: BIGINT, n: BIGINT>>) AS asg),
            |  (acc, d) -> IF(
            |    size(filter(acc.loads, l -> l + d.n <= 256)) = 0,
            |    struct(
            |      concat(acc.loads, array(d.n)) AS loads,
            |      concat(acc.asg, array(struct(d.doc_id AS doc_id,
            |        CAST(size(acc.loads) AS BIGINT) AS bin, d.n AS n))) AS asg),
            |    struct(
            |      transform(acc.loads, (l, i) -> IF(
            |        i = array_position(acc.loads,
            |          array_max(filter(acc.loads, l2 -> l2 + d.n <= 256))) - 1,
            |        l + d.n, l)) AS loads,
            |      concat(acc.asg, array(struct(d.doc_id AS doc_id,
            |        array_position(acc.loads,
            |          array_max(filter(acc.loads, l2 -> l2 + d.n <= 256))) - 1 AS bin,
            |        d.n AS n))) AS asg)))""".stripMargin))
        .select(col("shard"), explode(col("folded.asg")).as("a"))
        .select(col("a.doc_id").as("doc_id"), col("shard"),
          col("a.n").as("n_tokens"), col("a.bin").as("bin"))
        .orderBy("doc_id").collect()
      assert(got.toSeq === hof.toSeq, s"seed $seed: BFD diverged from the HOF form")
    }
  }

  test("the recurrence fold scales linearly: a 10k-hour series folds in one pass") {
    // the quadratic HOF shape copied the whole accumulator per step —
    // ~5·10⁷ struct copies at this length; the kernel walks once. The
    // driver model pins every value, so this is both the long-series
    // correctness check and an implicit linearity check (a quadratic
    // fold here would blow the suite budget, not just this test)
    val n = 10000
    val xs = (0 until n).map(t => ((t * 2654435761L) % 10000000L) - 5000000L)
    val hourly = xs.zipWithIndex
      .map { case (x, t) => ("k", t.toLong * 3600000000L, x, 1L) }
      .toDF("key", "bucket_us", "swq", "n")
    val got = graft.ops.TimeSeries.holtServe(hourly, 1L, 4L, 1L, 2L)
      .orderBy("bucket_us").collect()
    assert(got.length === n)
    var l = 0L; var b = 0L
    xs.zipWithIndex.foreach { case (x, t) =>
      if (t == 0) { l = x; b = 0L }
      else {
        val lp = l
        l = Math.floorDiv(x + 3L * (lp + b), 4L)
        b = Math.floorDiv((l - lp) + b, 2L)
      }
      assert(got(t).getLong(3) === l && got(t).getLong(4) === b,
        s"hour $t diverged from the driver model")
    }
  }

  test("property: the real RFC 1951 inflater matches java.util.zip round-trips at every level and strategy") {
    // the inflater must read what ANY conforming deflater writes:
    // levels 1-9 (dynamic Huffman on natural text, stored on
    // incompressible noise), HUFFMAN_ONLY and FILTERED strategies, and
    // level 0 (all stored) — each member's inflate must be the identity
    // and the walker's recomputed CRC32/ISIZE must match the trailer
    // zlib wrote (crc_ok = 1 certifies the inflater against zlib)
    def member(data: Array[Byte], level: Int, strategy: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte))
      val d = new java.util.zip.Deflater(level, true)
      d.setStrategy(strategy)
      d.setInput(data); d.finish()
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      val crc = new java.util.zip.CRC32(); crc.update(data)
      val c = crc.getValue
      out.write(Array[Byte](c.toByte, (c >> 8).toByte, (c >> 16).toByte,
        (c >> 24).toByte, data.length.toByte, (data.length >> 8).toByte,
        (data.length >> 16).toByte, (data.length >> 24).toByte))
      out.toByteArray
    }
    import java.util.zip.Deflater._
    val textGen = Gen.chooseNum(0, 2000).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        (8, Gen.alphaNumChar), (2, Gen.const(' ')))).map(_.mkString.getBytes("UTF-8")))
    val noiseGen = Gen.chooseNum(0, 500).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    val cases = for {
      data <- Gen.oneOf(textGen, noiseGen)
      level <- Gen.chooseNum(0, 9)
      strategy <- Gen.oneOf(DEFAULT_STRATEGY, FILTERED, HUFFMAN_ONLY)
    } yield (data, level, strategy)
    (1L to 5L).foreach { seed =>
      sample(Gen.listOfN(40, cases), seed).zipWithIndex.foreach {
        case ((data, level, strategy), i) =>
          val m = member(data, level, strategy)
          val back = graft.functions.DspKernel.gzipInflate(m)
          assert(back != null,
            s"seed $seed case $i (level $level strat $strategy): inflate nulled")
          assert(java.util.Arrays.equals(back, data),
            s"seed $seed case $i (level $level strat $strategy): not the identity")
          val s = graft.functions.DspKernel.gzipMemberStats(m)
          assert(s.toLongArray()(8) === 1L,
            s"seed $seed case $i: recomputed CRC32/ISIZE mismatch")
      }
      // members of DIFFERENT levels/strategies concatenate into one
      // stream, and back-references never cross the member seam
      val parts = sample(Gen.listOfN(4, cases), seed + 100)
      val stream = parts.map { case (d, l, st) => member(d, l, st) }
        .foldLeft(Array.empty[Byte])(_ ++ _)
      if (stream.nonEmpty) {
        val joined = graft.functions.DspKernel.gzipInflate(stream)
        assert(java.util.Arrays.equals(joined,
          parts.map(_._1).foldLeft(Array.empty[Byte])(_ ++ _)),
          s"seed $seed: concatenated members did not inflate to concatenated data")
        val st = graft.functions.DspKernel.gzipMemberStats(stream)
        assert(st.toLongArray()(0) === parts.length.toLong &&
          st.toLongArray()(8) === parts.length.toLong, s"seed $seed")
      }
    }
    // the engine-side builder twin round-trips through the expression path
    val docs = (0L until 20L)
      .map(i => (i, s"deflate me properly $i " * (i.toInt % 9 + 1)))
      .toDF("doc_id", "text")
    val rt = docs.select(col("doc_id"), col("text"),
      graft.functions.MediaFunctions.gzipInflate(
        graft.functions.MediaFunctions.gzipDeflate(
          col("text").cast("binary"), 6)).cast("string").as("back"))
      .collect()
    rt.foreach(r => assert(r.getAs[String]("back") === r.getAs[String]("text"),
      s"doc ${r.getAs[Long]("doc_id")}: expression round-trip broke"))
  }

  test("real-deflate malformation: corrupt Huffman streams null, never throw, and the bomb guard holds") {
    def walk(p: Array[Byte]) = graft.functions.DspKernel.gzipMemberStats(p)
    def deflated(data: Array[Byte]): Array[Byte] =
      graft.functions.DspKernel.gzipDeflate(data, 6)
    val base = deflated(("a real dynamic huffman stream, repetitive " * 40).getBytes("UTF-8"))
    assert(walk(base) != null)
    // flip bits THROUGHOUT the deflate body: every corruption must end
    // in null or a walked member with crc_ok = 0 — never a throw
    (10 until base.length - 8).foreach { i =>
      val bad = base.clone(); bad(i) = (bad(i) ^ 0x55).toByte
      val s = walk(bad) // may be null (structural break) or crc-flagged
      if (s != null) {
        val a = s.toLongArray()
        assert(a(0) >= 1L, s"byte $i: walked to a nonsense member count")
      }
    }
    // truncation anywhere inside the deflate stream nulls
    (11 until base.length - 1).foreach { i =>
      assert(walk(base.take(i)) == null, s"truncation at $i not nulled")
    }
    // a back-reference before the member start (hand-built: fixed-Huffman
    // block whose first symbol is a length/distance pair) nulls
    // 0b110 = bfinal 1, btype 01; then symbol 257 (len 3) = 0000001,
    // distance 0 (dist 1) = 00000 — references output that doesn't exist
    val badRef = Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte,
      0x03, 0x02, 0x00, 0, 0, 0, 0, 0, 0, 0, 0)
    assert(walk(badRef) == null, "out-of-window back-reference not nulled")
  }

  test("property: the gzip walk is total over arbitrary binary garbage") {
    import graft.ops.Multimodal
    val bytesGen = Gen.chooseNum(0, 80).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    (1L to 5L).foreach { seed =>
      val payloads = sample(Gen.listOfN(30, bytesGen), seed) ++ Seq(
        Array[Byte](),
        Array[Byte](0x1f, 0x8b.toByte),                 // bare magic
        Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 3), // header, no blocks
        Array[Byte](0x1f, 0x8b.toByte, 8, 8, 0, 0, 0, 0, 0, 3, 'n'), // FNAME never ends
        Array[Byte](0x1f, 0x8b.toByte, 8, 4, 0, 0, 0, 0, 0, 3, 0x7f.toByte, 0x7f.toByte)) // XLEN overruns
      val df = payloads.zipWithIndex
        .map { case (p, i) => (i.toLong, p) }
        .toDF("doc_id", "payload")
      val rows = Multimodal.gzipStats(df).orderBy("doc_id").collect()
      assert(rows.length === payloads.length) // total: no exception, no drop
    }
  }

  test("warc.gz composition: the census through the gzip layer equals the uncompressed census") {
    // the full Common-Crawl read path — gzip member framing over WARC
    // record framing — must census identically to reading the stream
    // uncompressed, for any member/record geometry combination
    import graft.ops.Multimodal
    val docs = (0L until 24L).map(i => (i, s"document body $i " * (i.toInt % 7 + 1)))
      .toDF("doc_id", "text")
    val direct = Multimodal.warcStats(Multimodal.warcFrame(docs))
      .orderBy("doc_id").collect()
    val throughGz = Multimodal.warcGzStats(Multimodal.warcGzFrame(docs))
      .orderBy("doc_id").collect()
    assert(throughGz.toSeq === direct.toSeq,
      "warc.gz path diverged from the uncompressed census")
    // and the inflated bytes are EXACTLY the uncompressed build
    val side = Multimodal.warcFrame(docs).withColumnRenamed("payload", "direct")
    val both = Multimodal.warcGzFrame(docs).join(side, "doc_id")
      .select(col("doc_id"),
        graft.functions.MediaFunctions.gzipInflate(col("payload"))
          .as("inflated"), col("direct")).collect()
    both.foreach { r =>
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]]("inflated"),
        r.getAs[Array[Byte]]("direct")),
        s"doc ${r.getAs[Long]("doc_id")}: inflated stream not byte-identical")
    }
  }

  test("property: MP4 box walk recovers mvhd fields and the exact trak/mdat census") {
    // every generated geometry must walk back to the planted integers —
    // the builder's box framing and the walker's size/type hops must
    // agree byte-for-byte, including the moov-children tiling
    import graft.ops.Multimodal
    val geom = for {
      ts <- Gen.chooseNum(1, Int.MaxValue)
      dur <- Gen.chooseNum(0, Int.MaxValue)
      nt <- Gen.chooseNum(1, 3); nm <- Gen.chooseNum(1, 4)
      body <- Gen.asciiPrintableStr
    } yield (ts, dur, nt, nm, body)
    (1L to 5L).foreach { seed =>
      val cases = sample(Gen.listOfN(20, geom), seed).zipWithIndex
      val df = cases.map { case ((ts, dur, nt, nm, body), i) =>
        (i.toLong, ts, dur, nt, nm, body)
      }.toDF("doc_id", "ts", "dur", "nt", "nm", "body")
        .select(col("doc_id"), lit("x").as("media_type"),
          Multimodal.mp4Payload(col("ts"), col("dur"), col("nt"),
            col("nm"), col("body")).as("payload"))
      val got = Multimodal.mp4Stats(df).orderBy("doc_id").collect()
      cases.foreach { case ((ts, dur, nt, nm, body), i) =>
        val r = got(i)
        assert(r.getAs[String]("container") === "mp4", s"seed $seed case $i")
        assert(r.getAs[Int]("timescale") === ts, s"seed $seed case $i")
        assert(r.getAs[Long]("duration") === dur.toLong, s"seed $seed case $i")
        assert(r.getAs[Int]("n_trak") === nt, s"seed $seed case $i")
        assert(r.getAs[Int]("n_boxes") === 3 + nt + nm, s"seed $seed case $i")
        assert(r.getAs[Int]("n_mdat") === nm, s"seed $seed case $i")
        assert(r.getAs[Long]("mdat_bytes_total") === body.length.toLong,
          s"seed $seed case $i")
      }
    }
  }

  test("MP4 walk: largesize/size-0 framing, truncation nulls, bad args raise") {
    import graft.ops.Multimodal
    val base = Seq((0L, "mp4 body payload bytes"))
      .toDF("doc_id", "body")
      .select(Multimodal.mp4Payload(lit(600), lit(4800), lit(2), lit(1),
        col("body")).as("p"))
      .collect().head.getAs[Array[Byte]](0)
    val clean = graft.functions.DspKernel.mp4BoxStats(base)
    assert(clean != null &&
      clean.toLongArray().toSeq === Seq(600L, 4800L, 2L, 6L, 1L, 22L))
    // re-frame the trailing mdat (8-byte header + 22 body bytes) as a
    // largesize box: size=1 marker + 64-bit size 38 — same body, and
    // the walk must count the 16-byte header out of the byte total
    val mdatAt = base.length - 30
    val big = base.take(mdatAt) ++
      Array[Byte](0, 0, 0, 1) ++ "mdat".getBytes ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 38) ++ base.takeRight(22)
    val bigStats = graft.functions.DspKernel.mp4BoxStats(big)
    assert(bigStats != null && bigStats.toLongArray().toSeq ===
      Seq(600L, 4800L, 2L, 6L, 1L, 22L))
    // size-0 (to end of file) on the trailing mdat: same census
    val zero = base.clone()
    zero(mdatAt) = 0; zero(mdatAt + 1) = 0; zero(mdatAt + 2) = 0; zero(mdatAt + 3) = 0
    val zeroStats = graft.functions.DspKernel.mp4BoxStats(zero)
    assert(zeroStats != null && zeroStats.toLongArray().toSeq ===
      Seq(600L, 4800L, 2L, 6L, 1L, 22L))
    // truncating mid-box is malformed: null, never a garbage-offset read
    assert(graft.functions.DspKernel.mp4BoxStats(base.dropRight(5)) == null)
    // a corrupted moov child size breaks the tiling: null
    val untiled = base.clone()
    untiled(24 + 11) = (untiled(24 + 11) ^ 0x01).toByte // mvhd size low byte
    assert(graft.functions.DspKernel.mp4BoxStats(untiled) == null)
    // the generator refuses arguments it cannot frame
    val e = intercept[Exception] {
      Seq((0L, "body")).toDF("doc_id", "body")
        .select(Multimodal.mp4Payload(lit(600), lit(100), lit(5), lit(1),
          col("body")))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("nTrak")), s"unexpected: $e")
  }

  test("property: MP4 mdat features equal the BMP kernel on the same bytes, any split") {
    // the global body index spans mdat boundaries, so features over a
    // body split across 1..4 mdat boxes must be BIT-identical to
    // byteChannelStats over the raw unsplit bytes — and invariant in
    // the split count itself
    import graft.ops.Multimodal
    val geom = for {
      nm <- Gen.chooseNum(1, 4)
      body <- Gen.asciiPrintableStr.suchThat(_.length >= 3)
    } yield (nm, body)
    (1L to 5L).foreach { seed =>
      val cases = sample(Gen.listOfN(15, geom), seed).zipWithIndex
      val df = cases.map { case ((nm, body), i) => (i.toLong, nm, body) }
        .toDF("doc_id", "nm", "body")
        .select(col("doc_id"), lit("x").as("media_type"),
          Multimodal.mp4Payload(lit(600), lit(4800), lit(1), col("nm"),
            col("body")).as("payload"),
          col("body").cast("binary").as("raw"))
      val got = df
        .select(col("doc_id"),
          graft.functions.MediaFunctions.mp4MdatChannelStats(
            col("payload"), stride = 3).as("viaWalk"),
          graft.functions.MediaFunctions.byteChannelStats(
            col("raw"), offset = 0, stride = 3).as("direct"))
        .orderBy("doc_id").collect()
      got.foreach { r =>
        assert(!r.isNullAt(1) && !r.isNullAt(2), s"seed $seed doc ${r.getLong(0)}")
        assert(r.getSeq[Double](1) === r.getSeq[Double](2),
          s"seed $seed doc ${r.getLong(0)}: walked features != direct kernel")
      }
    }
    // sub-stride bodies have an empty channel: null, never a division
    val tiny = Seq((0L, "x", "ab")).toDF("doc_id", "media_type", "body")
      .select(Multimodal.mp4Payload(lit(1), lit(0), lit(1), lit(1),
        col("body")).as("p"))
      .collect().head.getAs[Array[Byte]](0)
    assert(graft.functions.DspKernel.mp4MdatChannelStats(tiny, 3) == null)
  }

  test("property: the MP4 walk is total over arbitrary binary garbage") {
    import graft.ops.Multimodal
    val ftypHdr = Array[Byte](0, 0, 0, 24) ++ "ftyp".getBytes
    val bytesGen = Gen.chooseNum(0, 80).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    (1L to 5L).foreach { seed =>
      val payloads = sample(Gen.listOfN(30, bytesGen), seed) ++ Seq(
        Array[Byte](),
        ftypHdr,                                       // header, body truncated
        ftypHdr ++ Array.fill(16)(0.toByte),           // ftyp but no moov
        // giant declared size past the buffer
        Array[Byte](0x7F, -1, -1, -1) ++ "ftyp".getBytes ++ Array.fill(16)(0.toByte),
        // largesize marker with a truncated 64-bit size
        Array[Byte](0, 0, 0, 1) ++ "ftyp".getBytes ++ Array[Byte](0, 0, 0),
        // an empty-box flood past the hop bound (4200 size-8 boxes) must
        // be DECLARED malformed by the bound, not walked open-endedly
        ftypHdr ++ Array.fill(16)(0.toByte) ++
          Array.fill(4200)(Array[Byte](0, 0, 0, 8) ++ "free".getBytes).flatten)
      val df = payloads.zipWithIndex
        .map { case (p, i) => (i.toLong, "x", p) }
        .toDF("doc_id", "media_type", "payload")
      val rows = Multimodal.mp4Stats(df).orderBy("doc_id").collect()
      assert(rows.length === payloads.length) // total: no exception, no drop
      rows.foreach(r => assert(r.getAs[String]("container") != null))
      // the feature walk shares the framing rules — total on the same set
      val feats = Multimodal.mp4Features(df).orderBy("doc_id").collect()
      assert(feats.length === payloads.length)
    }
  }

  test("property: tar walk recovers the planted WebDataset geometry, byte-framed") {
    // builder and walker certify each other: member count, per-field
    // sizes (BYTE lengths — the multi-byte bodies below break any
    // char-count framing), block padding, mtimes, the RECOMPUTED header
    // checksums, and the sample reassembly a WebDataset reader performs
    import graft.ops.Multimodal
    val bodyGen: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr, Gen.const(""),
      Gen.alphaNumStr.map(_ + "é日𐍈"), // 2-, 3-, 4-byte UTF-8 tails
      Gen.listOfN(600, Gen.alphaNumChar).map(_.mkString)) // >512B body
    (1L to 5L).foreach { seed =>
      val texts = sample(Gen.listOfN(15, bodyGen), seed)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val frame = Multimodal.tarFrame(docs)
      // driver model: the construction arithmetic, byte-denominated
      def model(i: Long, t: String): (Int, Seq[Long], Seq[Long]) = {
        val nm = (i % 3 + 1).toInt
        val tb = t.getBytes("UTF-8").length.toLong
        val sizes = Seq(tb, 1L,
          (s"""{"id":$i,"len":$tb}""").length.toLong).take(nm)
        val mtimes = (0 until nm).map(k => (i * 16 + k) % 8589934592L)
        (nm, sizes, mtimes)
      }
      val stats = Multimodal.tarStats(frame).orderBy("doc_id").collect()
      texts.zipWithIndex.foreach { case (t, i) =>
        val (nm, sizes, mtimes) = model(i.toLong, t)
        val padded = sizes.map(s => (s + 511) / 512 * 512)
        val r = stats(i)
        assert(r.getAs[Long]("n_members") === nm.toLong, s"seed $seed doc $i")
        assert(r.getAs[Long]("body_bytes") === sizes.sum, s"seed $seed doc $i")
        assert(r.getAs[Long]("pad_bytes") === padded.sum - sizes.sum, s"seed $seed doc $i")
        assert(r.getAs[Long]("chksum_ok") === nm.toLong,
          s"seed $seed doc $i: a header failed its recomputed checksum")
        assert(r.getAs[Long]("ustar_ok") === nm.toLong, s"seed $seed doc $i")
        assert(r.getAs[Long]("n_txt") === 1L, s"seed $seed doc $i")
        assert(r.getAs[Long]("n_cls") === (if (nm >= 2) 1L else 0L), s"seed $seed doc $i")
        assert(r.getAs[Long]("n_json") === (if (nm >= 3) 1L else 0L), s"seed $seed doc $i")
        assert(r.getAs[Long]("n_other") === 0L, s"seed $seed doc $i")
        assert(r.getAs[Long]("mtime_sum") === mtimes.sum, s"seed $seed doc $i")
        assert(r.getAs[Long]("n_blocks") === nm + padded.sum / 512 + 2, s"seed $seed doc $i")
        assert(r.getAs[Long]("total_bytes") === 512L * nm + padded.sum + 1024L,
          s"seed $seed doc $i")
      }
      // per-member geometry face agrees with the same model
      val members = Multimodal.tarMembers(frame)
        .orderBy("doc_id", "member_idx").collect()
      texts.zipWithIndex.foreach { case (t, i) =>
        val (nm, sizes, mtimes) = model(i.toLong, t)
        val rows = members.filter(_.getAs[Long]("doc_id") == i.toLong)
        assert(rows.length === nm, s"seed $seed doc $i")
        var offset = 0L
        rows.zipWithIndex.foreach { case (row, k) =>
          offset += 512L
          assert(row.getAs[Long]("sample_id") === i.toLong, s"seed $seed doc $i member $k")
          assert(row.getAs[Long]("ext_code") === (k + 1).toLong, s"seed $seed doc $i member $k")
          assert(row.getAs[Long]("body_offset") === offset, s"seed $seed doc $i member $k")
          assert(row.getAs[Long]("size") === sizes(k), s"seed $seed doc $i member $k")
          assert(row.getAs[Long]("mtime") === mtimes(k), s"seed $seed doc $i member $k")
          assert(row.getAs[Long]("chksum_ok") === 1L, s"seed $seed doc $i member $k")
          offset += (sizes(k) + 511) / 512 * 512
        }
      }
      // sample reassembly: one complete sample per doc, fields grouped
      val samples = Multimodal.wdsSamples(frame).orderBy("doc_id").collect()
      texts.zipWithIndex.foreach { case (t, i) =>
        val (nm, sizes, _) = model(i.toLong, t)
        val r = samples(i)
        assert(r.getAs[Long]("sample_id") === i.toLong, s"seed $seed doc $i")
        assert(r.getAs[Long]("n_fields") === nm.toLong, s"seed $seed doc $i")
        assert(r.getAs[Long]("has_txt") === 1L, s"seed $seed doc $i")
        assert(r.getAs[Long]("has_cls") === (if (nm >= 2) 1L else 0L), s"seed $seed doc $i")
        assert(r.getAs[Long]("has_json") === (if (nm >= 3) 1L else 0L), s"seed $seed doc $i")
        assert(r.getAs[Long]("body_bytes") === sizes.sum, s"seed $seed doc $i")
      }
    }
  }

  test("tar walk: checksum verification, malformation nulls, totality over garbage") {
    import graft.ops.Multimodal
    def walk(p: Array[Byte]) = graft.functions.DspKernel.tarStats(p)
    // spec-side independent header writer — NOT the builder's expression
    // tree: a second implementation of the ustar layout the walker is
    // checked against (the hand-built-header discipline of the gzip spec)
    def header(name: String, size: Long, mtime: Long,
               breakChksum: Boolean = false, magic: String = "ustar" + TNul,
               sizeField: String = null): Array[Byte] = {
      val h = new Array[Byte](512)
      def put(at: Int, s: String): Unit =
        s.getBytes("ISO-8859-1").zipWithIndex.foreach { case (b, k) => h(at + k) = b }
      put(0, name)
      put(100, "0000644" + TNul + "0000000" + TNul + "0000000" + TNul)
      put(124, if (sizeField != null) sizeField
               else f"${java.lang.Long.toOctalString(size)}%11s".replace(' ', '0'))
      put(136, f"${java.lang.Long.toOctalString(mtime)}%11s".replace(' ', '0'))
      put(156, "0")
      put(257, magic + "00")
      put(265, "graft")
      (148 until 156).foreach(k => h(k) = ' ')
      val sum = h.map(_ & 0xff).sum + (if (breakChksum) 1 else 0)
      put(148, f"${java.lang.Long.toOctalString(sum)}%6s".replace(' ', '0') + TNul + " ")
      h
    }
    def pad512(b: Array[Byte]): Array[Byte] =
      b ++ new Array[Byte](((b.length + 511) / 512 * 512) - b.length)
    val end = new Array[Byte](1024)
    val body = "hello webdataset".getBytes("UTF-8")
    // a well-formed single-member archive from the INDEPENDENT writer
    val good = header("7.txt", body.length.toLong, 42L) ++ pad512(body) ++ end
    val g = walk(good)
    assert(g != null)
    assert(g.getLong(0) === 1L)   // n_members
    assert(g.getLong(1) === body.length.toLong)
    assert(g.getLong(3) === 1L)   // chksum_ok
    assert(g.getLong(4) === 1L)   // ustar_ok
    assert(g.getLong(5) === 1L)   // n_txt
    assert(g.getLong(9) === 42L)  // mtime_sum
    // a corrupted checksum is COUNTED, not nulled (the CRC discipline)
    val badSum = header("7.txt", body.length.toLong, 42L, breakChksum = true) ++
      pad512(body) ++ end
    val b = walk(badSum)
    assert(b != null && b.getLong(0) === 1L && b.getLong(3) === 0L)
    // GNU old-magic counts ustar_ok = 0 but still walks
    val gnu = header("7.txt", body.length.toLong, 42L, magic = "ustar ") ++
      pad512(body) ++ end
    val u = walk(gnu)
    assert(u != null && u.getLong(0) === 1L && u.getLong(4) === 0L)
    // non-numeric basename / foreign extension classify, never null
    val other = header("readme.md", body.length.toLong, 7L) ++ pad512(body) ++ end
    val o = walk(other)
    assert(o != null && o.getLong(8) === 1L) // n_other
    val t = graft.functions.DspKernel.tarMemberTable(other)
    assert(t != null && t.getLong(0) === -1L && t.getLong(1) === 0L)
    // malformations null: bad octal size, truncated body, missing
    // terminator, short terminator, trailing garbage, misaligned length
    assert(walk(header("7.txt", 1L, 1L, sizeField = "0000000009" + TNul) ++
      pad512(body) ++ end) == null)
    assert(walk(header("7.txt", 4096L, 1L) ++ pad512(body) ++ end) == null)
    assert(walk(header("7.txt", body.length.toLong, 1L) ++ pad512(body)) == null)
    assert(walk(header("7.txt", body.length.toLong, 1L) ++ pad512(body) ++
      new Array[Byte](512)) == null)
    assert(walk(good ++ pad512("junk".getBytes)) == null)
    assert(walk(good.dropRight(1)) == null)
    assert(walk(Array.empty[Byte]) == null)
    // totality: arbitrary binary garbage never throws
    val garbage = Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray)
    (1L to 20L).foreach { seed =>
      val p = sample(garbage, seed)
      walk(p); graft.functions.DspKernel.tarMemberTable(p) // no throw
    }
    // expression totality over a mixed frame: no exception, one row per row
    val df = Seq((0L, good), (1L, badSum), (2L, Array[Byte](1, 2, 3)),
      (3L, new Array[Byte](1024))).toDF("doc_id", "payload")
    assert(Multimodal.tarStats(df).count() === 4L)
  }

  test("property: zip walk recovers the planted stored geometry through all three layers") {
    import graft.ops.Multimodal
    val bodyGen: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr, Gen.const(""),
      Gen.alphaNumStr.map(_ + "é日𐍈"),
      Gen.listOfN(300, Gen.alphaNumChar).map(_.mkString))
    (1L to 5L).foreach { seed =>
      val texts = sample(Gen.listOfN(12, bodyGen), seed)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val frame = Multimodal.zipFrame(docs)
      def model(i: Long, t: String): (Int, Seq[Long], Seq[Long], Seq[Long]) = {
        val nm = (i % 3 + 1).toInt
        val tb = t.getBytes("UTF-8").length.toLong
        val sizes = Seq(tb, 1L, (s"""{"id":$i,"len":$tb}""").length.toLong).take(nm)
        val nlens = Seq(4L, 4L, 5L).map(_ + i.toString.length).take(nm)
        val dtimes = (0 until nm).map(k => (i * 16 + k) % 65536L)
        (nm, sizes, nlens, dtimes)
      }
      val stats = Multimodal.zipStats(frame).orderBy("doc_id").collect()
      texts.zipWithIndex.foreach { case (t, i) =>
        val (nm, sizes, nlens, dtimes) = model(i.toLong, t)
        val r = stats(i)
        assert(r.getAs[Long]("n_entries") === nm.toLong, s"seed $seed doc $i")
        assert(r.getAs[Long]("n_stored") === nm.toLong, s"seed $seed doc $i")
        assert(r.getAs[Long]("n_deflated") === 0L, s"seed $seed doc $i")
        assert(r.getAs[Long]("usize_total") === sizes.sum, s"seed $seed doc $i")
        assert(r.getAs[Long]("csize_total") === sizes.sum, s"seed $seed doc $i")
        assert(r.getAs[Long]("crc_ok") === nm.toLong,
          s"seed $seed doc $i: an entry failed its recomputed CRC32")
        assert(r.getAs[Long]("cd_ok") === nm.toLong,
          s"seed $seed doc $i: a directory entry diverged from its local header")
        assert(r.getAs[Long]("dtime_sum") === dtimes.sum, s"seed $seed doc $i")
        assert(r.getAs[Long]("total_bytes") ===
          sizes.zip(nlens).map { case (s, l) => 30 + l + s }.sum +
            nlens.map(46L + _).sum + 22L, s"seed $seed doc $i")
      }
      val entries = Multimodal.zipEntries(frame)
        .orderBy("doc_id", "entry_idx").collect()
      texts.zipWithIndex.foreach { case (t, i) =>
        val (nm, sizes, nlens, dtimes) = model(i.toLong, t)
        val rows = entries.filter(_.getAs[Long]("doc_id") == i.toLong)
        assert(rows.length === nm, s"seed $seed doc $i")
        var offset = 0L
        rows.zipWithIndex.foreach { case (row, k) =>
          assert(row.getAs[Long]("sample_id") === i.toLong, s"seed $seed doc $i entry $k")
          assert(row.getAs[Long]("ext_code") === (k + 1).toLong, s"seed $seed doc $i entry $k")
          assert(row.getAs[Long]("method") === 0L, s"seed $seed doc $i entry $k")
          assert(row.getAs[Long]("lfh_offset") === offset, s"seed $seed doc $i entry $k")
          assert(row.getAs[Long]("data_offset") === offset + 30 + nlens(k), s"seed $seed doc $i entry $k")
          assert(row.getAs[Long]("csize") === sizes(k), s"seed $seed doc $i entry $k")
          assert(row.getAs[Long]("usize") === sizes(k), s"seed $seed doc $i entry $k")
          assert(row.getAs[Long]("dtime") === dtimes(k), s"seed $seed doc $i entry $k")
          assert(row.getAs[Long]("crc_ok") === 1L && row.getAs[Long]("cd_ok") === 1L,
            s"seed $seed doc $i entry $k")
          offset += 30 + nlens(k) + sizes(k)
        }
      }
    }
  }

  test("property: zip walk matches java.util.zip on random archives at every level") {
    // the reference implementation writes; our walker must recover the
    // exact entry census — entry count, methods, byte totals, and a
    // clean CRC + directory verdict — for ANY mix of stored/deflated
    // entries, sizes (incl. empty), names, and compression levels
    val entryGen = for {
      ext <- Gen.oneOf("txt", "cls", "json", "bin")
      stored <- Gen.oneOf(true, false)
      data <- Gen.oneOf(
        Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
        Gen.alphaNumStr.map(s => (s * 8).getBytes("UTF-8")))
    } yield (ext, stored, data)
    (1L to 10L).foreach { seed =>
      val entries = sample(Gen.chooseNum(0, 9).flatMap(n =>
        Gen.listOfN(n, entryGen)), seed)
      val level = (seed % 9 + 1).toInt
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      zos.setLevel(level)
      entries.zipWithIndex.foreach { case ((ext, stored, data), i) =>
        val e = new java.util.zip.ZipEntry(s"$i.$ext")
        e.setTimeLocal(java.time.LocalDateTime.of(2020, 1, 1, 0, 0, 0))
        if (stored) {
          e.setMethod(java.util.zip.ZipEntry.STORED)
          e.setSize(data.length.toLong)
          e.setCompressedSize(data.length.toLong)
          val c = new java.util.zip.CRC32(); c.update(data); e.setCrc(c.getValue)
        }
        zos.putNextEntry(e); zos.write(data); zos.closeEntry()
      }
      zos.close()
      val s = graft.functions.DspKernel.zipStats(bos.toByteArray)
      assert(s != null, s"seed $seed: JDK archive must walk")
      assert(s.getLong(0) === entries.length.toLong, s"seed $seed")
      assert(s.getLong(1) === entries.count(_._2).toLong, s"seed $seed stored")
      assert(s.getLong(2) === entries.count(!_._2).toLong, s"seed $seed deflated")
      assert(s.getLong(3) === entries.map(_._3.length.toLong).sum, s"seed $seed usize")
      assert(s.getLong(5) === entries.length.toLong,
        s"seed $seed: an entry failed its recomputed CRC against the JDK writer")
      assert(s.getLong(6) === entries.length.toLong,
        s"seed $seed: the central directory diverged from the local chain")
      // the geometry face agrees entry-for-entry on sample keys
      val t = graft.functions.DspKernel.zipEntryTable(bos.toByteArray)
      entries.zipWithIndex.foreach { case ((ext, _, data), i) =>
        assert(t.getLong(10 * i) === i.toLong, s"seed $seed entry $i key")
        assert(t.getLong(10 * i + 6) === data.length.toLong, s"seed $seed entry $i usize")
      }
    }
  }

  test("zip walk: JDK-written archives, corruption counted, malformation nulls, totality") {
    def walk(p: Array[Byte]) = graft.functions.DspKernel.zipStats(p)
    // the REFERENCE implementation writes a mixed archive: two DEFLATED
    // entries (streaming descriptors) and one STORED (sizes up front) —
    // our walker and inflater must read back what the JDK produced
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    val t0 = java.time.LocalDateTime.of(2021, 6, 15, 12, 0, 0)
    def put(name: String, data: Array[Byte], stored: Boolean): Unit = {
      val e = new java.util.zip.ZipEntry(name)
      e.setTimeLocal(t0)
      if (stored) {
        e.setMethod(java.util.zip.ZipEntry.STORED)
        e.setSize(data.length.toLong)
        e.setCompressedSize(data.length.toLong)
        val c = new java.util.zip.CRC32(); c.update(data)
        e.setCrc(c.getValue)
      }
      zos.putNextEntry(e); zos.write(data); zos.closeEntry()
    }
    put("12.txt", ("deflate me, repetitive repetitive " * 40).getBytes("UTF-8"), stored = false)
    put("12.cls", "7".getBytes("UTF-8"), stored = true)
    put("12.json", """{"id":12}""".getBytes("UTF-8"), stored = false)
    zos.close()
    val jdk = bos.toByteArray
    val s = walk(jdk)
    assert(s != null, "JDK-written zip must walk")
    assert(s.getLong(0) === 3L) // n_entries
    assert(s.getLong(1) === 1L && s.getLong(2) === 2L) // stored / deflated
    assert(s.getLong(5) === 3L, "crc_ok must certify the inflater against the JDK")
    assert(s.getLong(6) === 3L, "cd_ok must cross-check the JDK's directory")
    assert(s.getLong(8) === 1L && s.getLong(9) === 1L && s.getLong(10) === 1L)
    // a corrupted STORED data byte: counted (crc_ok, cd_ok drop), not nulled
    val storedDataOff = {
      val t = graft.functions.DspKernel.zipEntryTable(jdk)
      // entry 1 is the stored .cls — its data_offset is slot 10*1+5 (1-based 5th)
      t.getLong(10 * 1 + 4).toInt
    }
    val corrupt = jdk.clone()
    corrupt(storedDataOff) = (corrupt(storedDataOff) ^ 0x01).toByte
    val c = walk(corrupt)
    assert(c != null && c.getLong(0) === 3L)
    assert(c.getLong(5) === 2L, "corrupted entry must fail its CRC")
    // truncation, bad EOCD count, trailing garbage: null
    assert(walk(jdk.dropRight(1)) == null)
    val badCount = jdk.clone()
    badCount(jdk.length - 12) = 9 // EOCD total-entries field
    assert(walk(badCount) == null)
    assert(walk(jdk ++ Array[Byte](0)) == null)
    assert(walk(Array.empty[Byte]) == null)
    assert(walk("PK not really".getBytes("UTF-8")) == null)
    // totality over arbitrary binary garbage
    val garbage = Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    (1L to 20L).foreach { seed =>
      val p = sample(garbage, seed)
      walk(p); graft.functions.DspKernel.zipEntryTable(p) // no throw
    }
  }

  test("property: audio dHash matches a driver model, survives gain, twins survive the bands") {
    import graft.ops.Multimodal
    // driver model: int16 LE samples from offset 44, 65 |amplitude|
    // bands, adjacent cross-multiplied gradient bits, MSB-first hex
    def model(p: Array[Byte]): String = {
      val n = (p.length - 44) / 2
      val sums = new Array[Long](65); val cnts = new Array[Long](65)
      (0 until n).foreach { i =>
        val s = (p(44 + 2 * i + 1) << 8) | (p(44 + 2 * i) & 0xff)
        val band = ((65L * i) / n).toInt
        sums(band) += math.abs(s); cnts(band) += 1
      }
      (0 until 64).map(c =>
        if (sums(c) * cnts(c + 1) > sums(c + 1) * cnts(c)) 1 else 0)
        .grouped(4).map(g => "%x".format(g.foldLeft(0)((a, b) => (a << 1) | b)))
        .mkString
    }
    def wav(samples: Array[Short]): Array[Byte] = {
      val body = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        body(2 * i) = (s & 0xff).toByte; body(2 * i + 1) = (s >> 8).toByte
      }
      "RIFF....WAVE".getBytes("ISO-8859-1") ++ new Array[Byte](32) ++ body
    }
    val rnd = new java.util.Random(11)
    (1 to 8).foreach { k =>
      val samples = Array.fill(40 + rnd.nextInt(4000))(rnd.nextInt(65536).toShort)
      val p = wav(samples)
      val got = graft.functions.DspKernel.wavDHash(p)
      assert(got != null && got.toString === model(p), s"case $k")
      // uniform gain halves/doubles every band sum together: the
      // gradient bits are invariant (the dHash axis property)
      val gained = wav(samples.map(s => (s / 2).toShort))
      assert(graft.functions.DspKernel.wavDHash(gained).toString ===
        model(gained), s"case $k gained-model")
    }
    // exact uniform doubling (no rounding): gain invariance holds
    val base = Array.tabulate(513)(i => ((i % 97) - 48).toShort)
    assert(graft.functions.DspKernel.wavDHash(wav(base)).toString ===
      graft.functions.DspKernel.wavDHash(wav(base.map(s => (s * 2).toShort))).toString,
      "uniform 2x gain must not move a gradient bit")
    // non-WAV and sample-less payloads null, never throw
    assert(graft.functions.DspKernel.wavDHash("not a wav".getBytes) == null)
    assert(graft.functions.DspKernel.wavDHash(wav(Array.empty[Short])) == null)
    // the planted one-byte twins come back through the pigeonhole bands
    import spark.implicits._
    val docs = (0L to 61L).map(i => (i, ("loudness shape " * 20) + i))
      .toDF("doc_id", "text")
    val pairs = graft.ops.Dedup.imageHashPairs(
      Multimodal.audioDHash(Multimodal.audioNearDupFrame(docs)), "dhash")
      .collect().map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    Seq(1L, 31L, 61L).foreach { i =>
      assert(pairs.contains((i, i + 1000000L)),
        s"planted twin of audio doc $i not recovered")
    }
  }

  test("exif walk: hand-built TIFFs decode exactly; garbage, cycles, and truncations null") {
    import graft.functions.DspKernel
    // hand-assemble a JPEG wrapper + TIFF in BOTH byte orders with an
    // independent byte-level writer (not the engine's hex builder)
    def jpeg(tiff: Array[Byte]): Array[Byte] = {
      val len = 2 + 6 + tiff.length
      Array(0xff, 0xd8, 0xff, 0xe1, len >> 8, len & 0xff,
        'E', 'x', 'i', 'f', 0, 0).map(_.toByte) ++ tiff ++
        Array(0xff.toByte, 0xd9.toByte)
    }
    def tiff(be: Boolean)(words: Seq[(Int, Long)]): Array[Byte] = {
      // words: (byteWidth, value) pairs laid down in the tiff order
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      out ++= (if (be) "MM" else "II").getBytes("ISO-8859-1")
      def w(width: Int, v: Long): Unit = {
        val bs = (0 until width).map(i => ((v >> (8 * i)) & 0xff).toByte)
        out ++= (if (be) bs.reverse else bs)
      }
      w(2, 42); w(4, 8)
      words.foreach { case (width, v) => w(width, v) }
      out.toArray
    }
    // one IFD: orientation=5 (inline SHORT, left-justified = written
    // as a 2-byte value then 2 raw zero bytes) + width=321 (LONG)
    def oneIfd(be: Boolean): Array[Byte] = {
      val pre = tiff(be)(Seq((2, 2L),
        (2, 0x0100L), (2, 4L), (4, 1L), (4, 321L),
        (2, 0x0112L), (2, 3L), (4, 1L), (2, 5L)))
      val tail = tiff(be)(Seq((4, 0L))).drop(8) // just the next-IFD zero
      pre ++ Array[Byte](0, 0) ++ tail
    }
    Seq(false, true).foreach { be =>
      val s = DspKernel.exifStats(jpeg(oneIfd(be)))
      assert(s != null, s"be=$be walk nulled")
      val a = s.toLongArray()
      assert(a.toSeq === Seq(if (be) 1L else 0L, 1L, 2L, 5L, 321L,
        -1L, -1L, 0L, 0L, -1L, -1L), s"be=$be: ${a.toSeq}")
    }
    // a GPS pointer that points BACK at IFD0 is a cycle -> null
    val cyc = tiff(false)(Seq((2, 1L),
      (2, 0x8825L), (2, 4L), (4, 1L), (4, 8L), (4, 0L)))
    assert(DspKernel.exifStats(jpeg(cyc)) == null, "pointer cycle must null")
    // unknown field type -> null (strict, never a guess)
    val badType = tiff(false)(Seq((2, 1L),
      (2, 0x0100L), (2, 11L), (4, 1L), (4, 1L), (4, 0L)))
    assert(DspKernel.exifStats(jpeg(badType)) == null)
    // garbage totality: random bytes never throw
    val rnd = new java.util.Random(7)
    (1 to 300).foreach { k =>
      val junk = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(junk)
      DspKernel.exifStats(junk); DspKernel.exifGpsScrub(junk)
      // ... including junk behind a valid JPEG/APP1 preamble
      val framed = jpeg(junk)
      DspKernel.exifStats(framed); DspKernel.exifGpsScrub(framed)
      assert(true, s"case $k survived")
    }
    // truncation sweep: every prefix that cuts the APP1 segment nulls,
    // never throws; the two prefixes that only lose the EOI still walk
    // (metadata precedes the scan by the APP1 placement rule)
    val full = jpeg(oneIfd(false))
    (0 until full.length - 2).foreach { cut =>
      val t = java.util.Arrays.copyOf(full, cut)
      assert(DspKernel.exifStats(t) == null, s"prefix $cut must not walk")
      DspKernel.exifGpsScrub(t)
    }
    val whole = DspKernel.exifStats(full).toLongArray().toSeq
    Seq(full.length - 2, full.length - 1).foreach { cut =>
      assert(DspKernel.exifStats(java.util.Arrays.copyOf(full, cut))
        .toLongArray().toSeq === whole, s"EOI-only cut $cut must still walk")
    }
  }

  test("exif gps scrub: coordinates zeroed, every structural byte preserved") {
    import graft.ops.Multimodal
    import spark.implicits._
    // layout A (gps, both endians), layout B (no gps), COM-prefixed
    val docs = Seq(0L, 1L, 3L, 7L, 14L, 21L).map(i => (i, "x"))
      .toDF("doc_id", "text")
    val frames = Multimodal.exifFrame(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val scrubbed = frames.map { case (id, p) =>
      id -> graft.functions.DspKernel.exifGpsScrub(p)
    }
    // no-GPS payloads come back BIT-IDENTICAL (nothing to erase)
    Seq(3L, 7L).foreach { id =>
      assert(java.util.Arrays.equals(frames(id), scrubbed(id)),
        s"doc $id (layout B) must be untouched")
    }
    // GPS payloads: same length, and the census reconciles — identical
    // except the coordinate numerators read 0
    Seq(0L, 1L, 14L, 21L).foreach { id =>
      assert(frames(id).length === scrubbed(id).length)
      val a = graft.functions.DspKernel.exifStats(frames(id)).toLongArray()
      val b = graft.functions.DspKernel.exifStats(scrubbed(id)).toLongArray()
      assert(b.toSeq === (a.take(9).toSeq ++ Seq(0L, 0L)),
        s"doc $id census did not reconcile: ${a.toSeq} vs ${b.toSeq}")
      // the erasure is real: the original coordinates were nonzero for
      // ids where doc_id % 90 != 0
      if (id % 90 != 0) assert(a(9) === id % 90 && b(9) === 0L)
    }
    // scrub of the scrub is a fixpoint
    Seq(0L, 1L).foreach { id =>
      assert(java.util.Arrays.equals(scrubbed(id),
        graft.functions.DspKernel.exifGpsScrub(scrubbed(id))),
        s"doc $id scrub must be idempotent")
    }
  }

  test("the perceptual-hash frames assert the ASCII-fixture invariant loudly") {
    // the engine hashes UTF-8 BYTES; the oracle replays per-character
    // code points — a non-ASCII fixture doc must fail at the frame, not
    // silently desynchronize the 2-byte sample pairing downstream
    import graft.ops.Multimodal
    import spark.implicits._
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val bad = Seq((1L, "loudness shäpe body"), (3L, "plain ascii body"))
      .toDF("doc_id", "text")
    val ea = intercept[Exception] {
      Multimodal.audioNearDupFrame(bad).collect()
    }
    assert(msgs(ea).exists(_.contains("non-ASCII")), s"unexpected: $ea")
    val ei = intercept[Exception] {
      Multimodal.imageNearDupFrame(
        Seq((0L, "pixël body")).toDF("doc_id", "text")).collect()
    }
    assert(msgs(ei).exists(_.contains("non-ASCII")), s"unexpected: $ei")
    // pure-ASCII (and null) text passes untouched: docs 1 and 4 are
    // audio rows (% 3 = 1), doc 1 plants a twin (% 30 = 1) — 3 rows,
    // no raise
    val ok = Seq((1L, "plain ascii body " * 4), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(Multimodal.audioNearDupFrame(ok).count() === 3L)
  }

  test("cross-modality components: image and audio twins resolve in one closure") {
    import graft.ops.{Dedup, Graph, Multimodal}
    import spark.implicits._
    val docs = (0L to 61L).map(i => (i, ("steady signal body " * 20) + i))
      .toDF("doc_id", "text")
    val img = Dedup.imageAHashPairs(Multimodal.imageAHash(
      Multimodal.imageNearDupFrame(docs)))
    val aud = Dedup.imageHashPairs(Multimodal.audioDHash(
      Multimodal.audioNearDupFrame(docs)), "dhash")
    val comp = Graph.connectedComponents(
      img.select("id1", "id2").unionByName(aud.select("id1", "id2")))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("comp"))).toMap
    // each planted twin lands in its base doc's cluster — image
    // (doc_id % 30 = 0, the non-audio share) and audio (doc_id % 30 = 1)
    // resolved by the SAME closure in one pass
    Seq(0L, 30L, 60L).foreach { i =>
      assert(comp(i + 1000000L) === comp(i), s"image twin of $i split off")
    }
    Seq(1L, 31L, 61L).foreach { i =>
      assert(comp(i + 1000000L) === comp(i), s"audio twin of $i split off")
    }
    // the modalities never share a node: id spaces are disjoint by
    // construction (doc_id mod 3 routes), so no cluster spans both
    val imgIds = img.select("id1").union(img.select("id2"))
      .collect().map(_.getLong(0)).toSet
    val audIds = aud.select("id1").union(aud.select("id2"))
      .collect().map(_.getLong(0)).toSet
    assert(imgIds.intersect(audIds).isEmpty)
  }

  test("container sniff identifies every family the engine parses, unknown on garbage") {
    import graft.ops.Multimodal
    val docs = (0L to 11L).map(i => (i, s"sniff me properly $i")).toDF("doc_id", "text")
    def detected(frame: org.apache.spark.sql.DataFrame): Set[String] =
      frame.select(Multimodal.containerOf(col("payload")).as("c"))
        .distinct().collect().map(_.getString(0)).toSet
    // each builder family lands on exactly its own magic
    assert(detected(Multimodal.mediaFrame(docs)) === Set("bmp", "wav"))
    assert(detected(Multimodal.codecFrame(docs)) === Set("jpeg", "flac"))
    // png/mp4 frames carry FLAC rows for their audio share — both magics
    val png = detected(Multimodal.pngFrame(docs))
    assert(png.contains("png") && png.subsetOf(Set("png", "flac")))
    val mp4 = detected(Multimodal.mp4Frame(docs))
    assert(mp4.contains("mp4") && mp4.subsetOf(Set("mp4", "flac")))
    assert(detected(Multimodal.tarFrame(docs)) === Set("tar"))
    assert(detected(Multimodal.zipFrame(docs)) === Set("zip"))
    assert(detected(Multimodal.zipRealFrame(docs)) === Set("zip"))
    assert(detected(Multimodal.gzipFrame(docs)) === Set("gzip"))
    assert(detected(Multimodal.tarGzFrame(docs)) === Set("gzip"))
    assert(detected(Multimodal.warcFrame(docs)) === Set("warc"))
    // the mixed frame routes by doc_id mod 4 and sniffs back exactly so
    val census = Multimodal.sniffCensus(Multimodal.mixedContainerFrame(docs))
      .orderBy("container").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(census === Seq(("gzip", 3L), ("tar", 3L), ("warc", 3L), ("zip", 3L)))
    // garbage and short payloads: unknown, never a throw
    val junk = Seq((0L, Array[Byte](1, 2, 3)), (1L, Array.empty[Byte]),
      (2L, "P".getBytes("UTF-8"))).toDF("doc_id", "payload")
    assert(detected(junk) === Set("unknown"))
  }

  test("property: utf8 sanitize and census match the JDK decoder on arbitrary bytes") {
    // the JDK's CharsetDecoder implements the same Unicode §3.9 maximal-
    // subpart U+FFFD policy — a fully independent model, so random bytes
    // pin the kernel's validity table AND its substitution boundaries
    val bytes = Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray)
    // bias toward NEAR-valid streams: valid UTF-8 with planted corruption
    val nearValid = for {
      s <- Gen.listOf(Gen.oneOf(Gen.alphaNumChar.map(_.toString),
        Gen.const("é"), Gen.const("日"), Gen.const("𐍈"))).map(_.mkString)
      junk <- Gen.listOf(Gen.chooseNum(0x80, 0xFF).map(_.toByte)).map(_.toArray)
      cut <- Gen.chooseNum(0, 3)
    } yield s.getBytes("UTF-8").dropRight(cut) ++ junk
    (1L to 30L).foreach { seed =>
      val p = sample(if (seed % 2 == 0) bytes else nearValid, seed)
      val got = graft.functions.Utf8Kernel.sanitize(p).toString
      val want = new String(p, java.nio.charset.StandardCharsets.UTF_8)
      assert(got === want, s"seed $seed: sanitize diverged from the JDK decoder")
      val s = graft.functions.Utf8Kernel.stats(p)
      assert(s.getLong(0) === p.length.toLong, s"seed $seed")
      assert(s.getLong(1) === s.getLong(2) + s.getLong(3) + s.getLong(4) +
        s.getLong(5) + s.getLong(6), s"seed $seed: class counts don't sum")
      assert(s.getLong(1) === got.codePointCount(0, got.length).toLong,
        s"seed $seed: n_cp_out vs the repaired string")
      assert(s.getLong(6) === got.count(_ == '�').toLong,
        s"seed $seed: n_bad vs the substitution count")
      // idempotence: the repaired bytes are WELL-FORMED (a raw-byte
      // pass-through of an invalid sequence would hide behind
      // UTF8String.toString's own substitution — this pins the bytes)
      val fixed = graft.functions.Utf8Kernel.sanitize(p).getBytes
      val s2 = graft.functions.Utf8Kernel.stats(fixed)
      assert(s2.getLong(6) === 0L, s"seed $seed: sanitize output ill-formed")
      assert(graft.functions.Utf8Kernel.sanitize(fixed).toString === got,
        s"seed $seed: sanitize not idempotent")
    }
  }

  test("utf8 census: corruption classes, BOM/NUL validity, truncation at EOF") {
    import graft.ops.TextAnalysis
    def stats(hex: String) = graft.functions.Utf8Kernel.stats(
      java.util.HexFormat.of().parseHex(hex))
    // well-formed edge codepoints count in their classes: NUL (ascii),
    // BOM EF BB BF (3-byte), DF BF (2-byte max), F4 8F BF BF (U+10FFFF)
    val ok = stats("00" + "EFBBBF" + "DFBF" + "F48FBFBF")
    assert(Seq(ok.getLong(2), ok.getLong(3), ok.getLong(4), ok.getLong(5),
      ok.getLong(6)) === Seq(1L, 1L, 1L, 1L, 0L))
    // overlong/surrogate/out-of-range leads never decode: C0 80, ED A0 80,
    // F5 90 80 80 — every byte its own subpart (leads invalid, orphans)
    assert(stats("C080").getLong(6) === 2L)
    assert(stats("EDA080").getLong(6) === 1L) // JDK: whole CESU unit
    assert(stats("F5908080").getLong(6) === 4L)
    // truncation at EOF: one FFFD for the whole valid prefix
    assert(stats("E282").getLong(6) === 1L)
    assert(stats("F09080").getLong(6) === 1L)
    // the planted-class frame repairs to text + the class suffix exactly
    import spark.implicits._
    val docs = (0L to 9L).map(i => (i, s"döc$i")).toDF("doc_id", "text")
    val rows = TextAnalysis.utf8Census(TextAnalysis.rawBytesFrame(docs))
      .orderBy("doc_id").collect()
    val suffix = Seq("", "�(", "��", "�", "�(")
    (0 to 9).foreach { i =>
      val want = s"döc$i" + suffix(i % 5)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(want.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(rows(i).getAs[String]("clean_md5") === md, s"doc $i repaired wrong")
      assert(rows(i).getAs[Long]("n_bad") === Seq(0L, 1L, 2L, 1L, 1L)(i % 5))
    }
  }

  test("tar.gz composition: the shard census through real deflate equals the uncompressed census") {
    import graft.ops.Multimodal
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(120)
    val direct = Multimodal.tarStats(Multimodal.tarFrame(docs))
      .orderBy("doc_id").collect()
    val viaGz = Multimodal.tarGzStats(Multimodal.tarGzFrame(docs))
      .orderBy("doc_id").collect()
    assert(direct.length === viaGz.length)
    direct.zip(viaGz).foreach { case (d, g) =>
      assert(g.getAs[Long]("gz_members") === 1L)
      assert(g.getAs[Long]("gz_crc_ok") === 1L,
        s"doc ${d.getAs[Long]("doc_id")}: inflater failed its CRC certificate")
      assert(g.getAs[Long]("gz_isize") === d.getAs[Long]("total_bytes"))
      Seq("n_members", "body_bytes", "pad_bytes", "chksum_ok", "ustar_ok",
        "n_txt", "n_cls", "n_json", "mtime_sum", "n_blocks").foreach { c =>
        assert(g.getAs[Long](c) === d.getAs[Long](c),
          s"doc ${d.getAs[Long]("doc_id")} column $c diverged through the gzip layer")
      }
    }
    // and the sample reassembly reads identically through the layer
    val inflated = Multimodal.tarGzFrame(docs).select(col("doc_id"),
      graft.functions.MediaFunctions.gzipInflate(col("payload")).as("payload"))
    val s1 = Multimodal.wdsSamples(Multimodal.tarFrame(docs)).orderBy("doc_id").collect()
    val s2 = Multimodal.wdsSamples(inflated).orderBy("doc_id").collect()
    assert(s1.map(_.toString).toSeq === s2.map(_.toString).toSeq)
  }
}
