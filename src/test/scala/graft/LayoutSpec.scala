package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorder key interleaves bits exactly") {
    // x=3 (011), y=5 (101): bits → k0=x0=1, k1=y0=1, k2=x1=1, k3=y1=0,
    // k4=x2=0, k5=y2=1 → 1+2+4+32 = 39
    val r = Seq((3L, 5L), (1L, 0L), (0L, 1L), (0L, 0L), (65535L, 65535L))
      .toDF("x", "y")
      .select(Layout.zorderKey(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(r === Seq(39L, 1L, 2L, 0L, (1L << 32) - 1))
  }

  test("zorder key masks to the requested bit width and matches its SQL form") {
    // bits=4: only the low 4 bits of each input participate
    val df = Seq((0x1F3L, 0x2A5L)).toDF("x", "y")
    val fromCols = df.select(Layout.zorderKey(col("x"), col("y"), bits = 4).as("z"))
      .head().getLong(0)
    val fromSql = df.selectExpr(s"${Layout.zorderSql("x", "y", bits = 4)} AS z")
      .head().getLong(0)
    assert(fromCols === fromSql)
    // x low nibble 3 (0011), y low nibble 5 (0101) → same as z(3,5) = 39
    assert(fromCols === 39L)
  }

  test("zorder key raises on negative input instead of scattering the row") {
    val e = intercept[Exception] {
      Seq((-1L, 5L)).toDF("x", "y")
        .select(Layout.zorderKey(col("x"), col("y")).as("z")).collect()
    }
    assert(e.getMessage.contains("negative input") ||
      Option(e.getCause).exists(_.getMessage.contains("negative input")))
  }

  test("zorder layout prunes the parquet scan on BOTH dimensions vs an unclustered write") {
    // 128×128 grid, one row per cell. Unclustered baseline: hash-shuffled
    // across the same file count, so any range predicate touches every
    // file. Z-ordered: 16 files tile the curve in aligned 32×32 blocks,
    // so a 16-wide band on EITHER axis lives in the 4 files whose block
    // overlaps it — min/max stats let the reader skip the rest.
    val n = 128L
    val df = spark.range(n * n).select((col("id") % n).as("x"), (col("id") / n).cast("long").as("y"))
    val base = { val b = new java.io.File("target/test-out").getAbsoluteFile.toPath
      java.nio.file.Files.createDirectories(b)
      java.nio.file.Files.createTempDirectory(b, "zorder") }.toString
    df.repartition(16).write.parquet(s"$base/flat")
    Layout.clusterByZorder(df, col("x"), col("y"), partitions = 16, bits = 7)
      .drop("zkey").write.parquet(s"$base/z")
    def filesTouched(dir: String, pred: org.apache.spark.sql.Column): Int =
      spark.read.parquet(dir).filter(pred)
        .select(input_file_name()).distinct().count().toInt
    def filesTotal(dir: String): Int =
      spark.read.parquet(dir).select(input_file_name()).distinct().count().toInt
    assert(filesTotal(s"$base/z") === 16)
    for (dim <- Seq("x", "y")) {
      val pred = col(dim) < 16
      val flat = filesTouched(s"$base/flat", pred)
      val z = filesTouched(s"$base/z", pred)
      // matching rows concentrate in a strict file subset — the min/max
      // stats bound the files a reader must open; the hash layout smears
      // them everywhere
      assert(z < flat, s"$dim-range touched $z z-ordered files vs $flat unclustered — no pruning win")
      assert(z <= 4, s"$dim-range touched $z of 16 z-ordered files; expected the 4 overlapping blocks")
      assert(flat === filesTotal(s"$base/flat"), "baseline unexpectedly clustered")
    }
    // and the predicate actually reaches the scan (row-group skipping
    // needs the pushed filter, not a post-scan Filter alone)
    val scanned = spark.read.parquet(s"$base/z").filter(col("y") < 16)
    val scanStr = scanned.queryExecution.executedPlan.toString
    assert(scanStr.contains("PushedFilters: [IsNotNull(y), LessThan(y,16)"),
      s"filter not pushed to the parquet scan:\n$scanStr")
  }

  test("clusterByZorder sorts every partition by the key") {
    val df = (0L until 256L).map(i => (i % 16, i / 16)).toDF("x", "y")
    val parts = Layout.clusterByZorder(df, col("x"), col("y"), partitions = 4, bits = 4)
      .select("zkey").rdd.glom().collect()
    assert(parts.count(_.nonEmpty) >= 2)
    parts.foreach { p =>
      val ks = p.map(_.getLong(0)).toSeq
      assert(ks === ks.sorted, "partition not sorted by zkey")
    }
    // range partitioning: partitions tile the key space in order
    val bounds = parts.filter(_.nonEmpty).map(p => (p.head.getLong(0), p.last.getLong(0)))
    bounds.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo, "partitions overlap")
      case _ =>
    }
  }

  test("hive-partitioned fact scan is dynamically pruned by a filtered dim join") {
    // The third layout lever after pushdown and z-order: a fact written
    // partitionBy(dim key) lets a join against a FILTERED dimension prune
    // fact partitions at RUNTIME — the dim filter's surviving keys become
    // a dynamicpruning subquery in the scan's PartitionFilters (fed from
    // the reused broadcast, so the pruning is free). At 100 TB this is
    // the difference between scanning 2 and 8 date/type partitions when
    // the dim filter survives 2 — no static predicate could know which.
    val base = { val b = new java.io.File("target/test-out").getAbsoluteFile.toPath
      java.nio.file.Files.createDirectories(b)
      java.nio.file.Files.createTempDirectory(b, "dpp") }.toString
    spark.range(800)
      .select((col("id") % 8).cast("string").as("pt"), col("id").as("v"))
      .selectExpr("concat('type_', pt) AS event_type", "v")
      .write.partitionBy("event_type").parquet(s"$base/fact")
    val fact = spark.read.parquet(s"$base/fact")
    // the dim must be a real source, not a LocalRelation — the optimizer
    // folds a filter over local rows into the relation itself, and the
    // pruning rule then sees no selective predicate on the build side
    (0 until 8).map(i => (s"type_$i", if (i < 2) "keep" else "drop"))
      .toDF("event_type", "category").write.parquet(s"$base/dim")
    val dim = spark.read.parquet(s"$base/dim")
    val joined = fact.join(dim.filter(col("category") === "keep"), Seq("event_type"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    val planStr = joined.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning"),
      s"no dynamicpruning expression in the fact scan's PartitionFilters:\n$planStr")
    assert(joined.collect().map(_.getLong(1)).toSeq === Seq(100L, 100L))
    // runtime proof, not just the plan: the scan opened 2 of 8 partitions.
    // AQE wraps materialized stages in QueryStageExec leaves, so the scan
    // hunt must descend into each stage's subplan.
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.flatMap {
      case s: FileSourceScanExec => Seq(s)
      case q: QueryStageExec => scans(q.plan)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case _ => Nil
    }
    val scan = scans(joined.queryExecution.executedPlan)
      .find(_.metrics.contains("numPartitions"))
      .getOrElse(fail("no partitioned FileSourceScanExec in the final plan"))
    val read = scan.metrics("numPartitions").value
    assert(read === 2, s"scan read $read partitions; expected the dim filter's 2 survivors of 8")
  }
}
