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
