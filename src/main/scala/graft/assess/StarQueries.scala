package graft.assess

import graft.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Star-schema workload over the TPC-H-ish tables — the join/aggregate
  * backbone the assessment layer leans on (SURVEY.md §2.2 A2/A3/A6 at the
  * "report" granularity). These are also the bench headliners, so plan shape
  * matters most here:
  *
  *  - dimensions (`region`, `nation`, `supplier`, filtered `customer`) are
  *    explicitly `broadcast()` so the big fact tables never shuffle for them;
  *  - fact-fact joins (orders⋈lineitem) shuffle once on the join key and AQE
  *    coalesces the result;
  *  - filters sit directly on the scans so they reach the parquet reader as
  *    pushed predicates.
  */
object StarQueries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** TPC-H Q1-style pricing summary: one scan, one partial+final aggregate. */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
        // +1e-9 nudge before rounding — see a2_user_rollup note
        round(avg("l_quantity") + lit(1e-9), 4).as("avg_qty"),
        round(avg("l_extendedprice") + lit(1e-9), 4).as("avg_price"),
        round(avg("l_discount") + lit(1e-9), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-style: top-10 orders by revenue for one market segment.
    * Filtered customer keys are broadcast; lineitem⋈orders is the only
    * shuffle. */
  def q3TopOrders(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = t(s, dir, "orders")
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_orderpriority")
    t(s, dir, "lineitem")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey", "o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(desc("revenue"), asc("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q4-style: order priority with an EXISTS (left-semi join with a
    * non-equi component folded into the condition). */
  def q4OrderPriority(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem")
    o.join(l,
        o("o_orderkey") === l("l_orderkey") && l("l_shipdate") > o("o_orderdate"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q5-style: revenue per nation where customer and supplier share the
    * nation — a 6-way join whose four dimension sides are broadcast; lineitem
    * shuffles once. */
  def q5NationRevenue(s: SparkSession, dir: String): DataFrame = {
    val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val nation = t(s, dir, "nation")
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = t(s, dir, "customer")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"))
    val supp = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_nationkey")
    t(s, dir, "lineitem")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy("n_name")
  }

  /** TPC-H Q6-style: highly selective scan-and-sum — lives or dies on
    * predicate pushdown (all four predicates reach the parquet reader;
    * zero shuffle, single partial+final agg). */
  def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
        .as("revenue"))

  /** TPC-H Q10-style: top returned-revenue customers with nation attached —
    * fact⋈fact shuffle plus two broadcast dimensions. */
  def q10ReturnedRevenue(s: SparkSession, dir: String): DataFrame = {
    val nation = t(s, dir, "nation").select("n_nationkey", "n_name")
    val cust = t(s, dir, "customer")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "c_name", "n_name")
    t(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(20)
  }

  /** Rollup over the part dimension (A3 at report granularity). */
  def qPartRollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .rollup("p_brand", "p_type")
      .agg(round(avg("p_retailprice") + lit(1e-9), 4).as("avg_price"),
        count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("p_brand"), asc_nulls_first("p_type"))

  /** CUBE over segment × nation (A3 at full granularity lattice); the
    * nation dimension is broadcast. */
  def qCubeCustNation(s: SparkSession, dir: String): DataFrame = {
    // Expressed in SQL: Spark 4.1's DetectAmbiguousSelfJoin false-positives
    // on DataFrame `.cube` over post-join columns (dataset-id tags survive
    // aliasing); SQL builds the identical Catalyst plan without the
    // Dataset-lineage bookkeeping.
    t(s, dir, "customer").createOrReplaceTempView("customer")
    t(s, dir, "nation").createOrReplaceTempView("nation")
    s.sql(
      """SELECT /*+ BROADCAST(nation) */
        |  c_mktsegment AS segment, n_name AS nation, count(*) AS n_cust,
        |  round(sum(c_acctbal), 2) AS acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE(c_mktsegment, n_name)
        |ORDER BY segment ASC NULLS FIRST, nation ASC NULLS FIRST""".stripMargin)
  }

  /** Explicit GROUPING SETS (the general lattice form of rollup/cube). */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "q_grouping_sets" -> qGroupingSets,
    "q1_pricing_summary" -> q1PricingSummary,
    "q3_top_orders" -> q3TopOrders,
    "q4_order_priority" -> q4OrderPriority,
    "q5_nation_revenue" -> q5NationRevenue,
    "q6_forecast_revenue" -> q6ForecastRevenue,
    "q10_returned_revenue" -> q10ReturnedRevenue,
    "q_part_rollup" -> qPartRollup,
    "q_cube_custnation" -> qCubeCustNation
  )

  val oracles: Map[String, String] = Map(
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
        |round(sum(l_extendedprice),2) AS sum_base_price,
        |round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        |round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
        |round(avg(l_quantity) + 1e-9,4) AS avg_qty,
        |round(avg(l_extendedprice) + 1e-9,4) AS avg_price,
        |round(avg(l_discount) + 1e-9,4) AS avg_disc, count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q3_top_orders" ->
      """SELECT o_orderkey, o_orderpriority,
        |round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |GROUP BY 1,2 ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS n_orders FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q5_nation_revenue" ->
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |AND r_name = 'ASIA'
        |AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q10_returned_revenue" ->
      """SELECT c_custkey, c_name, n_name,
        |round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY 1,2,3 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q_part_rollup" ->
      """SELECT p_brand, p_type,
        |round(avg(p_retailprice) + 1e-9,4) AS avg_price, count(*) AS n
        |FROM part GROUP BY ROLLUP(p_brand, p_type)
        |ORDER BY p_brand NULLS FIRST, p_type NULLS FIRST""".stripMargin,
    "q_cube_custnation" ->
      """SELECT c_mktsegment AS segment, n_name AS nation, count(*) AS n_cust,
        |round(sum(c_acctbal),2) AS acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE(c_mktsegment, n_name)
        |ORDER BY segment NULLS FIRST, nation NULLS FIRST""".stripMargin
  )
}
