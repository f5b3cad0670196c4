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
    val base = java.nio.file.Files.createTempDirectory(
      new java.io.File("target/test-out").getAbsoluteFile.toPath, "zorder").toString
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
}
