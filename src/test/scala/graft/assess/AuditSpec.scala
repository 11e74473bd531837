package graft.assess

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DQ-audit and k-anonymity pinned against brute-force recomputation from
  * the raw tables (the DuckDB oracle re-checks cross-engine). */
class AuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  test("dq audit: verdicts match brute-force counts; failures are loud") {
    val rows = Audit.aDqAudit(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rows.size == 14)
    val li = graft.Tables.load(spark, dir, "lineitem")
    val cust = graft.Tables.load(spark, dir, "customer")
    assert(rows("li_volume") == ((li.count(), true)))
    val negBal = cust.filter(col("c_acctbal") < 0).count()
    assert(negBal > 0, "fixture must exercise the failing branch")
    assert(rows("cust_balance_nonneg") == ((negBal, false)))
    val dupPk = li.count() -
      li.select("l_orderkey", "l_linenumber").distinct().count()
    assert(rows("li_pk_unique") == ((dupPk, dupPk == 0)))
    // clean-by-construction checks really are clean AND pass
    Seq("li_quantity_range", "li_discount_range", "li_price_positive",
      "li_shipdate_complete", "ord_status_domain", "li_order_ri")
      .foreach(c => assert(rows(c) == ((0L, true)), s"check $c"))
  }

  test("k-anonymity: class sizes match brute force; hierarchy is consistent") {
    val got = Audit.xKAnonymity(spark, dir).collect()
    val cust = graft.Tables.load(spark, dir, "customer").collect()
      .map(r => (r.getInt(2), r.getString(4), r.getDouble(3) < 0))
    val nation = graft.Tables.load(spark, dir, "nation").collect()
      .map(r => r.getInt(0) -> r.getInt(2)).toMap
    val k0 = cust.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val k1 = cust.groupBy { case (n, s, b) => (nation(n), s, b) }
      .view.mapValues(_.length.toLong).toMap
    assert(got.length == k0.size)
    got.foreach { r =>
      val key = (r.getInt(0), r.getString(1), r.getBoolean(2))
      assert(r.getLong(3) == k0(key))
      assert(r.getBoolean(4) == (k0(key) < 5))
      assert(r.getInt(5) == nation(key._1))
      assert(r.getLong(6) == k1((nation(key._1), key._2, key._3)))
      assert(r.getBoolean(7) == (k0(key) < 5 && r.getLong(6) >= 5))
      // generalizing can only grow a class
      assert(r.getLong(6) >= r.getLong(3))
    }
    // the screen finds risk at this sf, and generalization resolves some
    assert(got.exists(_.getBoolean(4)), "no risky class — vacuous fixture")
    assert(got.exists(_.getBoolean(7)), "generalization never resolves")
  }
}
