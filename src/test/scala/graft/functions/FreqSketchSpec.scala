package graft.functions

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries sketch pinned on its order-independent contract: exactness
  * under no overflow, and the `true − N/(k+1) ≤ est ≤ true` guarantee under
  * skew, across several partitionings (merge orders). */
class FreqSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sketch(items: Seq[String], k: Int, parts: Int): Map[String, Long] =
    items.toDF("key").repartition(parts)
      .agg(FreqSketchMG.freqSketch(k)(col("key")).as("m"))
      .select(explode(col("m")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact when the key domain fits in k counters") {
    val items = Seq.fill(40)("a") ++ Seq.fill(7)("b") ++ Seq.fill(1)("c")
    for (parts <- Seq(1, 3, 8)) {
      val m = sketch(items, k = 8, parts = parts)
      assert(m == Map("a" -> 40L, "b" -> 7L, "c" -> 1L), s"parts=$parts")
    }
  }

  test("MG guarantee holds under skew for every merge order") {
    // 4 heavy keys at ~N/8 each, the rest near-unique
    val items = (0 until 2000).map { i =>
      if (i % 2 == 0) s"hot_${i % 8 / 2}" else s"cold_$i"
    }
    val exact = items.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = items.size
    val k = 16
    val slack = n / (k + 1)
    for (parts <- Seq(1, 4, 13)) {
      val m = sketch(items, k, parts)
      assert(m.size <= k)
      m.foreach { case (key, est) =>
        val t = exact.getOrElse(key, 0L)
        assert(est <= t, s"overestimate at $key parts=$parts")
        assert(est >= t - slack, s"past guarantee at $key parts=$parts")
      }
      exact.filter(_._2 > slack).keys.foreach { key =>
        assert(m.contains(key), s"heavy key $key missing at parts=$parts")
      }
    }
  }

  test("freq_sketch resolves through spark.sql after registration") {
    FreqSketchMG.register(spark)
    val rows = spark.sql(
      """SELECT explode(freq_sketch(CAST(id % 3 AS STRING), 8))
        |FROM range(30)""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("0" -> 10L, "1" -> 10L, "2" -> 10L))
  }

  test("non-string input fails at analysis, not with a task-time cast") {
    FreqSketchMG.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT freq_sketch(id, 8) FROM range(10)").collect()
    }
    assert(e.getMessage.contains("freq_sketch requires a string column"),
      e.getMessage)
  }

  test("keys past the 64KB writeUTF limit survive the serde round trip") {
    val agg = FreqSketchMG(org.apache.spark.sql.classic.GraftBridge
      .expression(col("x")), 4)
    val big = "k" * 100000
    val buf = scala.collection.mutable.HashMap(big -> 2L, "small" -> 1L)
    assert(agg.deserialize(agg.serialize(buf)) == buf)
  }

  test("partial buffers survive the binary serialization round trip") {
    val agg = FreqSketchMG(org.apache.spark.sql.classic.GraftBridge
      .expression(col("x")), 4)
    val buf = scala.collection.mutable.HashMap("a" -> 3L, "b" -> 1L)
    assert(agg.deserialize(agg.serialize(buf)) == buf)
  }
}
