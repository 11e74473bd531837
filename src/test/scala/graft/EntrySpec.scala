package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() returns rows; queries/oracleSql stay in
  * sync (every oracle key must have a query). */
class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry flagship returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys ⊆ queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query runs at sf0.001; all but known-empty return rows") {
    // a1_abandoned_users is legitimately empty at sf0.001 (all 50 users
    // both sign up and purchase in 1k events); its oracle pins that.
    // q7_volume_shipping filters to 2 specific nations x cross-traffic x a
    // 2-year ship window — nothing qualifies in the ~60-row sf0.001
    // lineitem; its oracle pins 4 rows at sf0.01.
    val mayBeEmpty = Set("a1_abandoned_users", "q7_volume_shipping")
    val empty = SparkEntry.queries.flatMap { case (name, fn) =>
      val n = fn(spark, TestSpark.Sf0001).count()
      if (n == 0 && !mayBeEmpty(name)) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with zero rows: $empty")
  }
}
