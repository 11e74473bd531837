package graft.assess

import graft.Tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality and governance audits over the warehouse tables — the
  * pre-migration health check every assessment starts with (you cannot
  * promise parity on data you haven't profiled) and the admission gate a
  * training pipeline runs before a source feeds the corpus.
  *
  *  - [[aDqAudit]] is a declarative constraint suite (completeness, key
  *    uniqueness, value ranges, domain membership, referential integrity)
  *    evaluated in ONE aggregate pass per table plus one anti-join — the
  *    pattern popularized by declarative DQ libraries: constraints compile
  *    to metrics of a single scan, never one job per check.
  *  - [[xKAnonymity]] is the re-identification risk screen: quasi-identifier
  *    equivalence-class sizes with one generalization step up a public
  *    hierarchy (nation → region), the standard k-anonymity mechanic.
  *
  * Scale shape (100 TB): every constraint is a conditional-count column of
  * the same grouped-by-nothing aggregate, so the suite costs one scan per
  * table with map-side partials; referential integrity is a key-partitioned
  * anti join (orders dim broadcast when small). k-anonymity is two grouped
  * counts (QI-bounded output) and a broadcast dim join — no per-row
  * secondary work anywhere.
  */
object Audit {

  type Q = (SparkSession, String) => DataFrame

  /** 1 where the predicate holds — the conditional-count building block
    * (stays a codegen'd sum, no UDF). */
  private def viol(c: Column): Column = sum(when(c, 1L).otherwise(0L))

  /** `a_dq_audit` — the constraint suite as a long-format verdict frame:
    * one row per check with its violation count (or row count for volume
    * checks) and pass/fail. The customer balance non-negativity check FAILS
    * on this data (negative balances are in-domain for account ledgers) —
    * deliberately kept so the suite demonstrably reports failures rather
    * than rubber-stamping. */
  def aDqAudit(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val ord = Tables.load(s, dir, "orders")
    val cust = Tables.load(s, dir, "customer")

    def longF(src: DataFrame, checks: (String, Column, Boolean)*): DataFrame = {
      // one aggregate pass computing every metric, then explode to rows;
      // `volume` checks pass when value > 0, violation checks when == 0
      val agged = src.agg(checks.head._2.as(checks.head._1),
        checks.tail.map { case (n, c, _) => c.as(n) }: _*)
      agged.select(explode(array(checks.map { case (n, _, isVolume) =>
        struct(lit(n).as("dq_check"), col(n).cast("long").as("value"),
          (if (isVolume) col(n) > 0 else col(n) === 0).as("pass"))
      }: _*)).as("r")).select("r.*")
    }

    val liChecks = longF(li,
      ("li_volume", count(lit(1)), true),
      ("li_pk_unique",
        count(lit(1)) - countDistinct(col("l_orderkey"), col("l_linenumber")),
        false),
      ("li_quantity_range",
        viol(col("l_quantity") < 1 || col("l_quantity") > 50), false),
      ("li_discount_range",
        viol(col("l_discount") < 0 || col("l_discount") > 0.1), false),
      ("li_price_positive", viol(col("l_extendedprice") <= 0), false),
      ("li_shipdate_complete", viol(col("l_shipdate").isNull), false))
    val ordChecks = longF(ord,
      ("ord_volume", count(lit(1)), true),
      ("ord_pk_unique", count(lit(1)) - countDistinct(col("o_orderkey")), false),
      ("ord_status_domain",
        viol(!col("o_orderstatus").isin("O", "F", "P")), false),
      ("ord_price_positive", viol(col("o_totalprice") <= 0), false))
    val custChecks = longF(cust,
      ("cust_volume", count(lit(1)), true),
      ("cust_name_unique", count(lit(1)) - countDistinct(col("c_name")), false),
      ("cust_balance_nonneg", viol(col("c_acctbal") < 0), false))
    // referential integrity: lineitem orders that don't exist. Key-partitioned
    // anti join; at 100 TB this co-partitions on the join key (AQE picks
    // broadcast when orders is small enough).
    val orphans = li.select("l_orderkey")
      .join(ord.select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
      .select(lit("li_order_ri").as("dq_check"), col("v").cast("long").as("value"),
        (col("v") === 0).as("pass"))

    liChecks.unionByName(ordChecks).unionByName(custChecks)
      .unionByName(orphans)
      .orderBy("dq_check")
  }

  /** `x_k_anonymity` — equivalence-class risk screen: group customers by
    * the quasi-identifier (nation, market segment, balance-sign) and flag
    * classes smaller than k=5 — each such class is a re-identification
    * risk. One generalization step up the public hierarchy (nation →
    * region) reports whether coarsening resolves the class, the decision a
    * release pipeline makes before suppressing rows. */
  def xKAnonymity(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"),
        (col("c_acctbal") < 0).as("neg_bal"))
    val nation = Tables.load(s, dir, "nation")
      .select(col("n_nationkey"), col("n_regionkey"))
    val g0 = cust.groupBy("c_nationkey", "c_mktsegment", "neg_bal")
      .agg(count(lit(1)).as("k0"))
    val g1 = cust.join(broadcast(nation),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_regionkey", "c_mktsegment", "neg_bal")
      .agg(count(lit(1)).as("k1"))
    g0.join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(g1, Seq("n_regionkey", "c_mktsegment", "neg_bal"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("neg_bal"),
        col("k0"), (col("k0") < k).as("risky"),
        col("n_regionkey"), col("k1"),
        (col("k0") < k && col("k1") >= k).as("resolved"))
      .orderBy("c_nationkey", "c_mktsegment", "neg_bal")
  }

  val queries: Map[String, Q] = Map(
    "a_dq_audit" -> ((s, d) => aDqAudit(s, d)),
    "x_k_anonymity" -> ((s, d) => xKAnonymity(s, d))
  )

  val oracles: Map[String, String] = Map(
    "a_dq_audit" ->
      """WITH li AS (
        |  SELECT count(*) AS li_volume,
        |  count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS li_pk_unique,
        |  count(*) FILTER (l_quantity < 1 OR l_quantity > 50) AS li_quantity_range,
        |  count(*) FILTER (l_discount < 0 OR l_discount > 0.1) AS li_discount_range,
        |  count(*) FILTER (l_extendedprice <= 0) AS li_price_positive,
        |  count(*) FILTER (l_shipdate IS NULL) AS li_shipdate_complete
        |  FROM lineitem),
        |o AS (
        |  SELECT count(*) AS ord_volume,
        |  count(*) - count(DISTINCT o_orderkey) AS ord_pk_unique,
        |  count(*) FILTER (o_orderstatus NOT IN ('O','F','P')) AS ord_status_domain,
        |  count(*) FILTER (o_totalprice <= 0) AS ord_price_positive
        |  FROM orders),
        |c AS (
        |  SELECT count(*) AS cust_volume,
        |  count(*) - count(DISTINCT c_name) AS cust_name_unique,
        |  count(*) FILTER (c_acctbal < 0) AS cust_balance_nonneg
        |  FROM customer),
        |ri AS (SELECT count(*) AS v FROM lineitem
        |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        |SELECT * FROM (
        |  SELECT 'li_volume' AS dq_check, CAST(li_volume AS BIGINT) AS value,
        |    li_volume > 0 AS pass FROM li
        |  UNION ALL SELECT 'li_pk_unique', CAST(li_pk_unique AS BIGINT),
        |    li_pk_unique = 0 FROM li
        |  UNION ALL SELECT 'li_quantity_range', CAST(li_quantity_range AS BIGINT),
        |    li_quantity_range = 0 FROM li
        |  UNION ALL SELECT 'li_discount_range', CAST(li_discount_range AS BIGINT),
        |    li_discount_range = 0 FROM li
        |  UNION ALL SELECT 'li_price_positive', CAST(li_price_positive AS BIGINT),
        |    li_price_positive = 0 FROM li
        |  UNION ALL SELECT 'li_shipdate_complete', CAST(li_shipdate_complete AS BIGINT),
        |    li_shipdate_complete = 0 FROM li
        |  UNION ALL SELECT 'ord_volume', CAST(ord_volume AS BIGINT),
        |    ord_volume > 0 FROM o
        |  UNION ALL SELECT 'ord_pk_unique', CAST(ord_pk_unique AS BIGINT),
        |    ord_pk_unique = 0 FROM o
        |  UNION ALL SELECT 'ord_status_domain', CAST(ord_status_domain AS BIGINT),
        |    ord_status_domain = 0 FROM o
        |  UNION ALL SELECT 'ord_price_positive', CAST(ord_price_positive AS BIGINT),
        |    ord_price_positive = 0 FROM o
        |  UNION ALL SELECT 'cust_volume', CAST(cust_volume AS BIGINT),
        |    cust_volume > 0 FROM c
        |  UNION ALL SELECT 'cust_name_unique', CAST(cust_name_unique AS BIGINT),
        |    cust_name_unique = 0 FROM c
        |  UNION ALL SELECT 'cust_balance_nonneg', CAST(cust_balance_nonneg AS BIGINT),
        |    cust_balance_nonneg = 0 FROM c
        |  UNION ALL SELECT 'li_order_ri', CAST(v AS BIGINT), v = 0 FROM ri)
        |ORDER BY dq_check""".stripMargin,
    "x_k_anonymity" ->
      """WITH cu AS (SELECT c_nationkey, c_mktsegment, c_acctbal < 0 AS neg_bal
        |  FROM customer),
        |g0 AS (SELECT c_nationkey, c_mktsegment, neg_bal, count(*) AS k0
        |  FROM cu GROUP BY 1, 2, 3),
        |g1 AS (SELECT n.n_regionkey, cu.c_mktsegment, cu.neg_bal,
        |  count(*) AS k1
        |  FROM cu JOIN nation n ON cu.c_nationkey = n.n_nationkey
        |  GROUP BY 1, 2, 3)
        |SELECT g0.c_nationkey, g0.c_mktsegment, g0.neg_bal,
        |CAST(g0.k0 AS BIGINT) AS k0, g0.k0 < 5 AS risky,
        |n.n_regionkey, CAST(g1.k1 AS BIGINT) AS k1,
        |(g0.k0 < 5 AND g1.k1 >= 5) AS resolved
        |FROM g0 JOIN nation n ON g0.c_nationkey = n.n_nationkey
        |JOIN g1 ON g1.n_regionkey = n.n_regionkey
        |  AND g1.c_mktsegment = g0.c_mktsegment AND g1.neg_bal = g0.neg_bal
        |ORDER BY g0.c_nationkey, g0.c_mktsegment, g0.neg_bal""".stripMargin
  )
}
