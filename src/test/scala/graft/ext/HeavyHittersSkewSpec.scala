package graft.ext

import graft.TestSpark

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Misra–Gries guarantee GATE under skew (VERDICT r12 #1): when one
  * hot key owns ~90% of the stream, the other hot keys fall below the MG
  * survival threshold `N/(k+1)`, where sketch survivorship is
  * merge-order-dependent. The verdict queries must therefore report NULL
  * `found`/`est_ok` for sub-threshold keys — a deterministic output no
  * matter how Spark partitions the input — while the dominant key keeps
  * its unconditional true bits. Pins both SQL query shapes and the shared
  * [[SqlSurface.hotKeyVerdict]] helper (the streaming twin's verdict
  * frame) so the contract can't regress. */
class HeavyHittersSkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Skewed events fixture: even event_ids map to hot_(user%4); 90% of
    * them carry user_id=1 → hot_1 ≈ 900 of N=2000 (far above N/17 ≈ 117),
    * hot_0/2/3 ≈ 33 each (far below). Odd ids become near-unique cold
    * keys. Written at a chosen file count so each run exercises a
    * different merge order. */
  private def writeSkewEvents(files: Int): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_hh_skew_")
    val rows = (0L until 2000L).map { id =>
      // even ids: 90% user 1 (→ hot_1), the rest cycle users 0/2/3 so
      // hot_0/2/3 each land ~33 of N=2000 — far below N/17 ≈ 118
      val user = if (id % 2 == 0) {
        if (id % 20 < 18) 1L else Seq(0L, 2L, 3L)(((id / 20) % 3).toInt)
      } else id
      (id, user, if (id % 3 == 0) "read" else "write",
        id.toDouble, new java.sql.Timestamp(1700000000000L + id * 1000))
    }
    rows.toDF("event_id", "user_id", "event_type", "value", "ts")
      .repartition(files)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp.toString
  }

  private def verdictRows(df: DataFrame): Map[String, (Long, Option[Boolean], Option[Boolean])] =
    df.collect().map { r =>
      val key = r.getString(r.fieldIndex("key"))
      val n = r.getLong(r.fieldIndex("n_exact"))
      def bit(c: String): Option[Boolean] =
        if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getBoolean(r.fieldIndex(c)))
      key -> ((n, bit("found"), bit("est_ok")))
    }.toMap

  test("xHeavyHitters under 90%-one-key skew: NULL below guarantee, " +
    "true above, identical across merge orders") {
    val perOrder = Seq(1, 4, 13).map { files =>
      val dir = writeSkewEvents(files)
      val m = verdictRows(SqlSurface.xHeavyHitters(spark, dir))
      // the dominant key is guaranteed and verified
      val (n1, f1, ok1) = m("hot_1")
      assert(n1 > 700, s"fixture shape: hot_1 count $n1")
      assert(f1.contains(true) && ok1.contains(true), s"hot_1 bits $f1/$ok1")
      // every sub-threshold hot key: exact count present, verdict NULL
      (m - "hot_1").foreach { case (k, (n, f, ok)) =>
        assert(n * 17 <= 2000, s"fixture shape: $k count $n not sub-threshold")
        assert(f.isEmpty && ok.isEmpty, s"$k must report NULL verdicts, got $f/$ok")
      }
      m
    }
    // the whole frame is deterministic regardless of partitioning
    assert(perOrder.distinct.size == 1,
      s"verdict frame varies with merge order: $perOrder")
  }

  test("xHeavyHittersGrouped gates on the PER-GROUP threshold") {
    val dir = writeSkewEvents(5)
    val rows = SqlSurface.xHeavyHittersGrouped(spark, dir).collect()
    assert(rows.nonEmpty)
    // recompute each group's total independently and check the gate
    val totals = graft.Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull && col("user_id").isNotNull)
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val kind = r.getString(0)
      val n = r.getLong(2)
      val gated = n * 17 > totals(kind)
      assert(r.isNullAt(3) == !gated, s"$kind/${r.getString(1)} found gate")
      assert(r.isNullAt(4) == !gated, s"$kind/${r.getString(1)} est_ok gate")
      if (gated) assert(r.getBoolean(3) && r.getBoolean(4),
        s"$kind/${r.getString(1)} guaranteed bits must be true")
    }
    // skew shape: at least one gated-out row actually exists per kind
    assert(rows.count(_.isNullAt(3)) >= 2, "fixture must exercise the NULL arm")
  }

  test("hotKeyVerdict (streaming twin's frame): sub-threshold survivorship " +
    "does not leak into the verdict") {
    val exact = Seq(("hot_a", 900L), ("hot_b", 30L), ("cold_1", 1000L), ("cold_2", 70L))
      .toDF("key", "n_exact")
    // two merge orders of the same stream: one dropped hot_b, one kept it
    val estKept = Seq(("hot_a", 860L), ("hot_b", 2L), ("cold_1", 950L))
      .toDF("key", "est")
    val estDropped = Seq(("hot_a", 860L), ("cold_1", 950L)).toDF("key", "est")
    val out = Seq(estKept, estDropped).map { est =>
      SqlSurface.hotKeyVerdict(exact, est, k = 16).collect().map(_.toSeq).toSeq
    }
    assert(out.head == out.last,
      s"verdict frame must not depend on sub-threshold survivorship: $out")
    val m = verdictRows(SqlSurface.hotKeyVerdict(exact, estDropped, 16))
    assert(m("hot_a") == ((900L, Some(true), Some(true))))
    assert(m("hot_b") == ((30L, None, None)))
  }
}
