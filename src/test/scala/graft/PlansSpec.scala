package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.RangeJoinRewrite

/** The band-join rewrite: a user-written abs(x − y) <= d inner join must
  * plan as a bucketed equi-join under the rule, produce exactly the
  * naive join's rows, and leave non-candidates untouched. */
class PlansSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations = Seq(RangeJoinRewrite)
    try f finally spark.experimental.extraOptimizations = Nil
  }

  private def bandJoin(a: DataFrame, b: DataFrame, d: Long): DataFrame =
    a.join(b, abs(col("x_us") - col("y_us")) <= d)

  test("band join rewrites to an equi-join, no nested loop, identical rows") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val a = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("a_id"), col("ts_us").as("x_us"))
    val b = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("b_id"), col("ts_us").as("y_us"))
    val d = 600L * 1000000L
    val naive = bandJoin(a, b, d).select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty, "fixture produced no band pairs")
    withRule {
      val rewritten = bandJoin(a, b, d)
      val phys = rewritten.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin"),
        s"band join still plans a nested loop:\n$phys")
      assert(phys.contains("HashJoin") || phys.contains("SortMergeJoin"),
        s"no equi join in rewritten plan:\n$phys")
      val got = rewritten.select("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === naive)
    }
  }

  test("band join is exact across zero (floor, not truncate-toward-zero)") {
    val a = Seq((1L, -5L), (2L, -1L), (3L, 0L), (4L, 7L)).toDF("a_id", "x_us")
    val b = Seq((10L, -4L), (11L, 2L), (12L, 9L)).toDF("b_id", "y_us")
    val d = 3L
    val naive = bandJoin(a, b, d).select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = withRule {
      bandJoin(a, b, d).select("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(got === naive)
    // sanity of the fixture itself: pairs straddle zero (x=-1 with y=2,
    // and x=-1 with y=-4 at exactly the bound)
    assert(naive.contains((2L, 11L)) && naive.contains((2L, 10L)))
  }

  test("a join that already has an equi key is left untouched") {
    val a = Seq((1L, 1L, 10L)).toDF("a_id", "k", "x_us")
    val b = Seq((2L, 1L, 12L)).toDF("b_id", "k2", "y_us")
    withRule {
      val j = a.join(b, col("k") === col("k2") &&
        abs(col("x_us") - col("y_us")) <= 5L)
      val opt = j.queryExecution.optimizedPlan.toString
      assert(!opt.contains("__graft_band"),
        s"equi-keyed join was needlessly expanded:\n$opt")
      assert(j.count() === 1L)
    }
  }

  test("outer joins and non-literal bounds never rewrite") {
    val a = Seq((1L, 10L)).toDF("a_id", "x_us")
    val b = Seq((2L, 12L, 5L)).toDF("b_id", "y_us", "bound")
    withRule {
      val outer = a.join(b, abs(col("x_us") - col("y_us")) <= 5L, "left")
      assert(!outer.queryExecution.optimizedPlan.toString.contains("__graft_band"))
      val dynamic = a.join(b, abs(col("x_us") - col("y_us")) <= col("bound"))
      assert(!dynamic.queryExecution.optimizedPlan.toString.contains("__graft_band"))
      assert(outer.count() === 1L && dynamic.count() === 1L)
    }
  }
}
