package graft

import org.apache.spark.sql.functions._
import graft.ops.Bucketing

/** The point of bucketing is the plan, not the rows: a join of two
  * same-bucketed tables must be exchange-free. */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key join has no shuffle exchange; results match plain join") {
    // the in-memory catalog forgets tables between sessions but their
    // directories persist — clear both
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"target/test-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val lineitem = Tables.lineitem(spark, "/root/testdata/sf0.001")
    Bucketing.writeBucketed(orders.withColumnRenamed("o_orderkey", "k"), "orders_b", "k")
    Bucketing.writeBucketed(lineitem.withColumnRenamed("l_orderkey", "k"), "lineitem_b", "k")

    val joined = Bucketing.colocatedJoin(spark, "orders_b", "lineitem_b", "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected exchange-free bucketed join, got:\n$plan")

    val expected = orders.join(lineitem, col("o_orderkey") === col("l_orderkey")).count()
    assert(joined.count() === expected)
  }
}
