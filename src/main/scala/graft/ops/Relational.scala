package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** General relational coverage over the TPC-H-ish tables — the monitoring
  * tier's scan/join/aggregate shapes at bench-relevant volume (lineitem is
  * the only table that's large at sf0.1; everything else joins against it).
  *
  * Scale notes (the part the small-SF test can't see):
  *  - money sums go through DECIMAL so partial-aggregate merge order can
  *    never change the answer (double addition is not associative; decimal
  *    addition is) — then back to DOUBLE for a stable output schema;
  *  - only fixed-size dims (region: 5 rows, nation: 25) carry explicit
  *    broadcast hints; customer/orders/supplier scale with the fact, so
  *    they stay shuffle joins and AQE is left to downgrade them to
  *    broadcast when a filter makes a side small at runtime;
  *  - top-N is orderBy+limit, which Catalyst executes as TakeOrderedAndProject
  *    (per-partition heap + driver merge of N rows, not a global sort). */
object Relational {

  /** Exact-in-decimal money aggregate, emitted as double. */
  private def moneySum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,4)")).cast("double")

  /** Pricing summary (TPC-H Q1 shape): scan + partial agg, no join. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Shipping-priority top-10 (TPC-H Q3 shape): two joins into the fact,
    * group, top-N by revenue. customer/orders scale with the fact, so these
    * are shuffle joins by design (AQE may still downgrade to broadcast at
    * small SF); only fixed-size dims get explicit broadcast hints. */
  def topUnshippedOrders(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, dir).filter(col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
    val li = Tables.lineitem(s, dir).filter(col("l_shipdate") > to_timestamp(lit("1998-01-01 00:00:00")))
    li.join(ord.join(cust, col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_orderpriority"))
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Local-supplier volume per nation (TPC-H Q5 shape): fact joined to a
    * star of broadcast dims. */
  def regionRevenue(s: SparkSession, dir: String, regionName: String = "ASIA"): DataFrame = {
    val nat = Tables.nation(s, dir)
    val reg = Tables.region(s, dir).filter(col("r_name") === regionName)
    val natInRegion = nat.join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
    val sup = Tables.supplier(s, dir).join(broadcast(natInRegion), col("s_nationkey") === col("n_nationkey"))
    val cust = Tables.customer(s, dir)
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
    Tables.lineitem(s, dir)
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(ord.join(cust, col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_nationkey"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Forecast-revenue-change (TPC-H Q6 shape): pure scan + filter + agg —
    * the pushdown benchmark (every predicate reaches the parquet scan). */
  def revenueChange(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(
        col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")) &&
          col("l_discount").between(0.04, 0.06) && col("l_quantity") < 24)
      .agg(moneySum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))

  /** Shipping-mode priority buckets (TPC-H Q12 shape): conditional
    * aggregation — CASE inside sum. */
  def shipmodePriority(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_priority"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("low_priority"))
      .orderBy("l_linestatus")

  /** Promo revenue share (TPC-H Q14 shape): ratio of two decimal-exact
    * sums — both operands deterministic, so the double division is too. */
  def promoShare(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-06-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1997-07-01 00:00:00")))
      .agg(
        (lit(100.0) * moneySum(when(col("p_type").startsWith("PROMO"),
          col("l_extendedprice") * (lit(1.0) - col("l_discount"))).otherwise(lit(0.0)))
          / moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("promo_share_pct"))

  /** Top-spending customers: fact→orders rollup then broadcast-joined to
    * customer names. */
  def topCustomers(s: SparkSession, dir: String, n: Int = 20): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_custkey")
      .agg(moneySum(col("o_totalprice")).as("total_spent"), count(lit(1)).as("n_orders"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("total_spent"), col("n_orders"))
      .orderBy(col("total_spent").desc, col("c_custkey"))
      .limit(n)

  /** Ranking-window family over per-customer spend: ntile quartiles,
    * percent_rank, cume_dist — all integer-ratio arithmetic on exact
    * counts, so bit-identical across engines. One shuffle (the agg);
    * the unpartitioned window is a presentation-sized scan here, and at
    * scale would partition by a bucketing key exactly like q_seq_pack's
    * shards. */
  def customerSpendRanks(s: SparkSession, dir: String, n: Int = 50): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("total_spent").desc, col("o_custkey"))
    Tables.orders(s, dir)
      .groupBy("o_custkey")
      .agg(moneySum(col("o_totalprice")).as("total_spent"))
      .select(
        col("o_custkey").as("custkey"), col("total_spent"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy(col("total_spent").desc, col("custkey"))
      .limit(n)
  }

  /** Semi/anti join pair: nations that have at least one customer vs
    * nations with none — the EXISTS / NOT EXISTS shapes. The probe column
    * is pre-aggregated to its distinct values (bounded by the 25-row dim,
    * regardless of customer volume) so the broadcast build side can never
    * scale with the fact table. */
  def nationCustomerPresence(s: SparkSession, dir: String): DataFrame = {
    val nations = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
    val custNations = Tables.customer(s, dir).select(col("c_nationkey")).distinct()
    nations.join(custNations, col("n_nationkey") === col("c_nationkey"), "left_semi")
      .withColumn("has_customers", lit(true))
      .unionByName(
        nations.join(custNations, col("n_nationkey") === col("c_nationkey"), "left_anti")
          .withColumn("has_customers", lit(false)))
      .orderBy("n_nationkey")
  }

  /** Customer order-count distribution (TPC-H Q13 shape): LEFT join so
    * order-less customers land in the 0 bucket, then a second-level
    * aggregation over the first — the classic histogram-of-groups plan
    * (two shuffles, both map-side combined). */
  def customerOrderDistribution(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_custkey"))
      .join(Tables.orders(s, dir).select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders")) // count() skips the null-extended rows
      .groupBy("n_orders")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_customers").desc, col("n_orders").desc)

  /** Supplier variety per part type (TPC-H Q16 shape): the
    * distinct-aggregate plan — Spark expands count(DISTINCT) into a
    * two-phase aggregate on (group, value) then (group), so a hot part
    * type never funnels its duplicates through one task. */
  def supplierVarietyByType(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(col("l_partkey"), col("l_suppkey"))
      .join(Tables.part(s, dir).select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_type")
      .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("n_suppliers").desc, col("p_type"))

  /** INTERSECT: customer keys that placed orders in BOTH halves of the
    * order date range (set semantics — Spark compiles to a left-semi
    * aggregate join, no full distinct shuffle of the union). */
  def repeatCustomersIntersect(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val mid = to_timestamp(lit("1998-06-01 00:00:00"))
    orders.filter(col("o_orderdate") < mid).select(col("o_custkey"))
      .intersect(orders.filter(col("o_orderdate") >= mid).select(col("o_custkey")))
      .orderBy("o_custkey")
  }

  /** The two decorrelation shapes are written as SQL TEXT and parsed by
    * both engines: Spark executes the string below and the driver's DuckDB
    * oracle runs the IDENTICAL string, so the semantics can never drift
    * between the sides. Arithmetic follows the cross-engine rules: money
    * sums through DECIMAL, ONE cast to double, integer-exact counts. */
  private def tpchViews(s: SparkSession, dir: String): Unit = {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
    Tables.part(s, dir).createOrReplaceTempView("part")
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    Tables.supplier(s, dir).createOrReplaceTempView("supplier")
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    Tables.nation(s, dir).createOrReplaceTempView("nation")
    Tables.region(s, dir).createOrReplaceTempView("region")
  }

  /** TPC-H Q17 shape: small-quantity revenue per brand, gated by a
    * CORRELATED scalar subquery (each part's own average quantity). This
    * forces Catalyst's scalar-subquery decorrelation: the per-part
    * aggregate materializes ONCE and equi-joins back on p_partkey — never
    * a per-outer-row re-aggregation, never a cartesian (plan-contracted).
    * The threshold is built from a decimal-exact sum divided by an exact
    * count so both engines land on the identical double. */
  val smallQuantityRevenueSql: String =
    """SELECT p_brand,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly,
      |  count(*) AS n_small
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE l_quantity < (
      |  SELECT CAST(0.2 AS DOUBLE) * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*))
      |  FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  def smallQuantityRevenue(s: SparkSession, dir: String): DataFrame = {
    tpchViews(s, dir)
    s.sql(smallQuantityRevenueSql)
  }

  /** TPC-H Q21 shape (adapted to this schema: lateness = shipped more than
    * 90 days after the order date): suppliers who were the SOLE late
    * shipper on a multi-supplier finalized order — an EXISTS + NOT EXISTS
    * chain. Catalyst decorrelates the pair into a left-semi and a
    * left-anti join on l_orderkey (the correlated equality), with the
    * `<>`-supplier and lateness predicates riding the join condition; the
    * NOT EXISTS branch joins orders internally rather than referencing the
    * outer order date, so its only correlation is the equi-key.
    * No cartesian, no nested-loop (plan-contracted). */
  val lateSoleSuppliersSql: String =
    """SELECT s_name, count(*) AS numwait
      |FROM lineitem l1
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN supplier ON s_suppkey = l1.l_suppkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    JOIN orders o2 ON o2.o_orderkey = l3.l_orderkey
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > o2.o_orderdate + INTERVAL 90 DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name""".stripMargin

  def lateSoleSuppliers(s: SparkSession, dir: String): DataFrame = {
    tpchViews(s, dir)
    s.sql(lateSoleSuppliersSql)
  }

  /** TPC-H Q18 shape: large-volume orders. The IN over a grouped-HAVING
    * subquery rewrites to a left-semi join against a pre-aggregated
    * lineitem — the aggregate runs ONCE (map-side partials + one shuffle
    * on l_orderkey), then semi-prunes the fact before the customer join.
    * At 100 TB the semi join keeps only the handful of >350-qty orders, so
    * the 3-way join that follows is over a vanishing fraction of the fact. */
  val largeVolumeOrdersSql: String =
    """SELECT c_name, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |FROM customer
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 350)
      |GROUP BY c_name, o_orderkey, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin

  def largeVolumeOrders(s: SparkSession, dir: String): DataFrame = {
    tpchViews(s, dir)
    s.sql(largeVolumeOrdersSql)
  }

  /** The production form of Q18: Catalyst decorrelates the IN-subquery
    * above by semi-pruning BOTH join inputs, which duplicates the
    * lineitem pre-aggregation (no exchange reuse — the two semi probes
    * differ); at 100 TB that is two full-fact aggregations. Hoisting the
    * aggregate into a CTE and joining it directly runs ONE aggregation
    * and drops the second lineitem scan entirely — identical results
    * (plan-contracted to a single lineitem scan). Keep the IN form too:
    * it exercises the decorrelation facility on purpose. */
  val largeVolumeOrdersCteSql: String =
    """WITH big AS (
      |  SELECT l_orderkey,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 350)
      |SELECT c_name, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, sum_qty
      |FROM big
      |JOIN orders ON o_orderkey = big.l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin

  def largeVolumeOrdersCte(s: SparkSession, dir: String): DataFrame = {
    tpchViews(s, dir)
    s.sql(largeVolumeOrdersCteSql)
  }

  /** TPC-H Q19 shape (adapted: brand/size/quantity in place of the missing
    * container/shipmode columns): revenue under a DISJUNCTION of per-brand
    * branch predicates. Exercises Catalyst's CNF conversion: the common
    * `p_partkey = l_partkey` stays the equi-join key, extractable
    * conjuncts (`l_quantity <= 40` below is implied per-branch) push to
    * the scans, and the residual OR rides the join — never a cartesian.
    * Revenue follows the cross-engine money rule (decimal sum, one cast
    * to double at the end). */
  val brandedRevenueSql: String =
    """SELECT
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
      |   OR (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)""".stripMargin

  def brandedRevenue(s: SparkSession, dir: String): DataFrame = {
    tpchViews(s, dir)
    s.sql(brandedRevenueSql)
  }

  /** TPC-H Q22 shape (adapted: nation in place of the missing phone
    * prefix): dormant high-balance customers — balance above the global
    * positive-balance average (UNCORRELATED scalar subquery, computed once
    * and broadcast as a literal-like input) with no order since the
    * cutoff (NOT EXISTS → left-anti join on o_custkey, the date predicate
    * riding the anti-join's build side). Two different subquery facilities
    * in one query, both decorrelation-free-cartesian by contract. */
  val dormantBalancesSql: String =
    """SELECT n_name, count(*) AS numcust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
      |FROM customer JOIN nation ON n_nationkey = c_nationkey
      |WHERE c_acctbal > (
      |    SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*)
      |    FROM customer c2 WHERE c2.c_acctbal > 0.0)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey
      |      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  def dormantBalances(s: SparkSession, dir: String): DataFrame = {
    tpchViews(s, dir)
    s.sql(dormantBalancesSql)
  }

  /** TPC-H Q4 shape (adapted: lateness = shipped more than 60 days after
    * the order date, the Q21 adaptation, in place of the missing
    * commit/receipt dates): order-priority counts over orders with at
    * least one late line — a correlated EXISTS whose predicate references
    * the OUTER order date. Catalyst decorrelates to a left-semi join on
    * o_orderkey with the date comparison riding the join condition; the
    * orders scan keeps its own date-window pushdown. No cartesian. */
  val latePriorityCountSql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  def latePriorityCount(s: SparkSession, dir: String): DataFrame = {
    tpchViews(s, dir)
    s.sql(latePriorityCountSql)
  }

  /** TPC-H Q15 shape: top supplier by quarterly revenue. The revenue CTE
    * is referenced TWICE — once as the join input, once under the
    * uncorrelated scalar max — and the planner must reuse one aggregation
    * result (or at worst re-run the same deterministic agg), never
    * re-aggregate per outer row. Revenue is a decimal-exact sum cast once
    * to double, so the max-equality comparison lands on identical bits in
    * both engines. */
  val topSupplierSql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  def topSupplier(s: SparkSession, dir: String): DataFrame = {
    tpchViews(s, dir)
    s.sql(topSupplierSql)
  }

  /** TPC-H Q2 shape (adapted: the offer table — each supplier's minimum
    * observed unit price per part — is derived from lineitem in place of
    * the missing partsupp): for each small-size part, the region's
    * suppliers matching the part's MINIMUM regional unit cost. The
    * correlated scalar min re-derives the same offer CTE under
    * region-restricted joins; Catalyst decorrelates it into one grouped
    * aggregate equi-joined back on partkey. Unit cost is a per-row IEEE
    * division and min() is exact, so the equality is engine-portable. */
  val minCostSupplierSql: String =
    """WITH offer AS (
      |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
      |    min(l_extendedprice / l_quantity) AS unit_cost
      |  FROM lineitem WHERE l_quantity > 0.0
      |  GROUP BY 1, 2)
      |SELECT s_acctbal, s_name, n_name, p_partkey, unit_cost
      |FROM part
      |JOIN offer ON partkey = p_partkey
      |JOIN supplier ON s_suppkey = suppkey
      |JOIN nation ON n_nationkey = s_nationkey
      |JOIN region ON r_regionkey = n_regionkey
      |WHERE p_size <= 3 AND p_type = 'SMALL' AND r_name = 'EUROPE'
      |  AND unit_cost = (
      |    SELECT min(o2.unit_cost)
      |    FROM offer o2
      |    JOIN supplier s2 ON s2.s_suppkey = o2.suppkey
      |    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
      |    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
      |    WHERE o2.partkey = p_partkey AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin

  def minCostSupplier(s: SparkSession, dir: String): DataFrame = {
    tpchViews(s, dir)
    s.sql(minCostSupplierSql)
  }

  /** The production form of Q2: the correlated scalar min re-derives the
    * whole region-restricted offer pipeline per Catalyst's decorrelation
    * (two lineitem scans + two aggregation trees in the IN-form plan);
    * here the regional minimum is a window over ONE offer derivation, so
    * the plan carries exactly one lineitem scan (plan-contracted). Same
    * result set as [[minCostSupplierSql]] by construction. */
  val minCostSupplierCteSql: String =
    """WITH offer AS (
      |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
      |    min(l_extendedprice / l_quantity) AS unit_cost
      |  FROM lineitem WHERE l_quantity > 0.0
      |  GROUP BY 1, 2),
      |regional AS (
      |  SELECT partkey, suppkey, unit_cost, s_acctbal, s_name, n_name,
      |    min(unit_cost) OVER (PARTITION BY partkey) AS min_cost
      |  FROM offer
      |  JOIN supplier ON s_suppkey = suppkey
      |  JOIN nation ON n_nationkey = s_nationkey
      |  JOIN region ON r_regionkey = n_regionkey
      |  WHERE r_name = 'EUROPE')
      |SELECT s_acctbal, s_name, n_name, p_partkey, unit_cost
      |FROM part JOIN regional ON partkey = p_partkey
      |WHERE p_size <= 3 AND p_type = 'SMALL' AND unit_cost = min_cost
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin

  def minCostSupplierCte(s: SparkSession, dir: String): DataFrame = {
    tpchViews(s, dir)
    s.sql(minCostSupplierCteSql)
  }

  /** TPC-H Q11 shape (adapted: part value = lineitem revenue through one
    * nation's suppliers, in place of the missing partsupp stock value):
    * parts whose single-nation value exceeds a FRACTION of the nation
    * total — a grouped aggregate filtered against an uncorrelated scalar
    * over the same CTE. Values are decimal-exact sums (and the global
    * total re-sums them in decimal), so the threshold is bit-stable. */
  val importantPartsSql: String =
    """WITH val AS (
      |  SELECT l_partkey AS partkey,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS value
      |  FROM lineitem
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation ON n_nationkey = s_nationkey
      |  WHERE n_name = 'NATION_3'
      |  GROUP BY 1)
      |SELECT partkey, value FROM val
      |WHERE value > (
      |  SELECT CAST(0.002 AS DOUBLE) * CAST(sum(CAST(v2.value AS DECIMAL(18,4))) AS DOUBLE)
      |  FROM val v2)
      |ORDER BY value DESC, partkey""".stripMargin

  def importantParts(s: SparkSession, dir: String): DataFrame = {
    tpchViews(s, dir)
    s.sql(importantPartsSql)
  }

  /** TPC-H Q20 shape (adapted: "shipped more than 15% of the part's total
    * volume" in place of the missing partsupp availability threshold):
    * suppliers dominating any small-part's supply — an IN subquery whose
    * inner rows are gated by a CORRELATED scalar over the same shipped
    * CTE (per-part total). Two decorrelations stacked: the scalar becomes
    * a grouped agg joined on partkey; the IN becomes a left-semi join on
    * suppkey. Per-(part,supplier) and per-part sums are decimal-exact.
    * The share threshold is a PARAMETER (0.15 default keeps the oracle
    * entry's output non-empty at the small test SFs — a presentation
    * choice, not a correctness dependency: the spec cross-validates this
    * form against the CTE form across thresholds). */
  def volumeSuppliersSql(threshold: Double = 0.15): String =
    s"""WITH shipped AS (
      |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
      |  FROM lineitem JOIN part ON p_partkey = l_partkey
      |  WHERE p_name LIKE 'small%'
      |  GROUP BY 1, 2)
      |SELECT s_suppkey, s_name, s_acctbal
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT sh.suppkey FROM shipped sh
      |  WHERE sh.qty > (
      |    SELECT CAST($threshold AS DOUBLE) * CAST(sum(CAST(sh2.qty AS DECIMAL(18,4))) AS DOUBLE)
      |    FROM shipped sh2 WHERE sh2.partkey = sh.partkey))
      |ORDER BY s_suppkey""".stripMargin

  def volumeSuppliers(s: SparkSession, dir: String,
                      threshold: Double = 0.15): DataFrame = {
    tpchViews(s, dir)
    s.sql(volumeSuppliersSql(threshold))
  }

  /** The production form of Q20: the correlated per-part total becomes a
    * window sum over ONE shipped derivation — one lineitem scan
    * (plan-contracted) instead of the decorrelation's re-aggregated
    * second pass. The share comparison divides nothing: qty is compared
    * against 0.15 × an exact-decimal total, same bits as the IN form. */
  def volumeSuppliersCteSql(threshold: Double = 0.15): String =
    s"""WITH shipped AS (
      |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
      |  FROM lineitem JOIN part ON p_partkey = l_partkey
      |  WHERE p_name LIKE 'small%'
      |  GROUP BY 1, 2),
      |shares AS (
      |  SELECT suppkey, qty,
      |    CAST($threshold AS DOUBLE) * CAST(sum(CAST(qty AS DECIMAL(18,4)))
      |      OVER (PARTITION BY partkey) AS DOUBLE) AS threshold
      |  FROM shipped)
      |SELECT s_suppkey, s_name, s_acctbal
      |FROM supplier
      |WHERE s_suppkey IN (SELECT suppkey FROM shares WHERE qty > threshold)
      |ORDER BY s_suppkey""".stripMargin

  def volumeSuppliersCte(s: SparkSession, dir: String,
                         threshold: Double = 0.15): DataFrame = {
    tpchViews(s, dir)
    s.sql(volumeSuppliersCteSql(threshold))
  }

  /** TPC-H Q8 shape: one nation's share of a region's market by order
    * year. The fact flows through orders→customer (market restriction,
    * region dim broadcast through nation) and supplier→nation (share
    * attribution); the share is a ratio of two decimal-exact sums per
    * year, one double division at the end. Conditional aggregation keeps
    * it to ONE pass — no self-join of the numerator against the
    * denominator. */
  def marketShare(s: SparkSession, dir: String,
                  nation: String = "NATION_3", region: String = "ASIA"): DataFrame = {
    val nat = Tables.nation(s, dir)
    val marketNations = nat
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("mkt_nationkey"))
    val marketCust = Tables.customer(s, dir)
      .join(broadcast(marketNations), col("c_nationkey") === col("mkt_nationkey"))
      .select("c_custkey")
    val supNation = Tables.supplier(s, dir)
      .join(broadcast(nat.select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "supp_nation")
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(marketCust, col("o_custkey") === col("c_custkey"))
      .join(supNation, col("l_suppkey") === col("s_suppkey"))
      .select(year(col("o_orderdate")).cast("long").as("o_year"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"),
        col("supp_nation"))
      .groupBy("o_year")
      .agg((moneySum(when(col("supp_nation") === nation, col("volume")).otherwise(lit(0.0)))
        / moneySum(col("volume"))).as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q9 shape (adapted: supply cost = 60% of the part's retail
    * price, in place of the missing partsupp cost): profit per supplier
    * nation per order year over name-matched parts. The LIKE filter rides
    * the part scan; nation is the only broadcast-hinted dim; the profit
    * expression is per-row IEEE arithmetic written identically in the
    * oracle, summed in decimal. */
  def productProfit(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir).filter(col("p_name").contains("widget"))
        .select("p_partkey", "p_retailprice"), col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("n_name").as("nation"), year(col("o_orderdate")).cast("long").as("o_year"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          - lit(0.6) * col("p_retailprice") * col("l_quantity")).as("amount"))
      .groupBy("nation", "o_year")
      .agg(moneySum(col("amount")).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)

  /** TPC-H Q10 shape: returned-item revenue — top customers by lost
    * revenue in a quarter. Fact filtered on return flag (pushed to the
    * scan), two scaling joins left to AQE, nation broadcast; global
    * top-20 is TakeOrdered, never a full sort. */
  def returnedItems(s: SparkSession, dir: String, n: Int = 20): DataFrame =
    Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, dir)
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1996-04-01 00:00:00")))
        .select("o_orderkey", "o_custkey"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(n)

  /** TPC-H Q7 shape: bilateral trade volume — the fact joined out to TWO
    * different nation lookups (supplier's and customer's) with a
    * symmetric pair filter and a year rollup. The planner must reuse the
    * 25-row nation dim on both arms as broadcasts, keep the fact in one
    * pipeline through four joins, and push the nation-pair disjunction
    * down each dim arm. Year extraction is integer-exact; revenue follows
    * the decimal money rule. */
  val bilateralTradeSql: String =
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
      |    l_extendedprice * (1.0 - l_discount) AS volume
      |  FROM lineitem
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON n1.n_nationkey = s_nationkey
      |  JOIN nation n2 ON n2.n_nationkey = c_nationkey
      |  WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      |     OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  def bilateralTrade(s: SparkSession, dir: String): DataFrame = {
    tpchViews(s, dir)
    s.sql(bilateralTradeSql)
  }
}
