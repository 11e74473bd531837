package graft.assess

import graft.TestSpark

import org.scalatest.funsuite.AnyFunSuite

/** Semantics pinned beyond the DuckDB oracle: sketch error bounds and
  * cross-query consistency invariants. */
class AssessmentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  test("pivot round-trips through unpivot back to the long form") {
    import org.apache.spark.sql.functions._
    val wide = Assessments.a3PivotDaily(spark, dir)
    val long = wide.unpivot(
      Array(col("day")),
      Array(col("click"), col("view"), col("purchase"), col("signup"),
        col("error")),
      "event_type", "n")
      .filter(col("n") > 0)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val expected = graft.Tables.events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(long == expected)
  }

  test("A5 sketches: approx within documented error of exact") {
    val rows = Assessments.a5ApproxSketches(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50a, p50e) = (r.getDouble(1), r.getDouble(2))
      val (ua, ue) = (r.getLong(3), r.getLong(4))
      // percentile_approx with accuracy=10000 on 1k rows is near-exact
      assert(math.abs(p50a - p50e) <= math.max(0.05 * math.abs(p50e), 0.5),
        s"p50 approx $p50a vs exact $p50e")
      // HLL++ default rsd = 5%
      assert(math.abs(ua - ue).toDouble / ue <= 0.15,
        s"distinct approx $ua vs exact $ue")
    }
  }

  test("salted rollup equals direct rollup exactly") {
    val direct = Assessments.a2UserRollup(spark, dir)
      .select("user_id", "n_events", "sum_value").collect().map(_.toSeq)
    val salted = Assessments.a2SaltedRollup(spark, dir).collect().map(_.toSeq)
    assert(direct.toSeq == salted.toSeq)
  }

  test("bucketed range join equals naive per-row scan on a sample") {
    import org.apache.spark.sql.functions._
    val got = Assessments.a13RangeJoinBucketed(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive recomputation for 20 sampled error events
    val e = graft.Tables.events(spark, dir)
    val errors = e.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts").limit(20).collect()
    val clicks = e.filter(col("event_type") === "click")
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime))
    errors.foreach { r =>
      val (id, uid, ts) = (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime)
      val want = clicks.count { case (u, c) => u == uid && c >= ts - 600000 && c < ts }
      assert(got(id) == want.toLong, s"event $id")
    }
  }

  test("retry chains match a brute-force gaps-and-islands recompute") {
    import org.apache.spark.sql.functions._
    val got = Assessments.a11RetryChains(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val events = graft.Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // per user: split the (ts, event_id)-ordered stream into maximal error
    // runs; a run recovers iff it is not the stream's suffix
    case class Chain(len: Long, spanUs: Long, recovered: Boolean)
    val chains = events.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._3, e._2))
      val runs = scala.collection.mutable.ArrayBuffer.empty[Chain]
      var i = 0
      while (i < sorted.length) {
        if (sorted(i)._4 == "error") {
          var j = i
          while (j + 1 < sorted.length && sorted(j + 1)._4 == "error") j += 1
          runs += Chain(j - i + 1L, sorted(j)._3 - sorted(i)._3,
            recovered = j + 1 < sorted.length)
          i = j + 1
        } else i += 1
      }
      runs
    }.toSeq
    assert(chains.nonEmpty && chains.exists(_.len > 1),
      "fixture must contain a multi-event chain")
    val exp = chains.groupBy(_.len).map { case (len, cs) =>
      val mean = BigDecimal(
        cs.map(_.spanUs).sum.toDouble / cs.size / 1e6 + 1e-9)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      len -> (cs.size.toLong, cs.count(_.recovered).toLong, mean)
    }
    assert(got == exp)
  }

  test("funnel conversion matches a brute-force recompute") {
    import org.apache.spark.sql.functions._
    val got = Assessments.aFunnelConversion(spark, dir).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    val byUser = graft.Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    var (nv, nc, np) = (0L, 0L, 0L)
    byUser.values.foreach { es0 =>
      val es = es0.toArray
      val v = es.collect { case (_, "view", us) => us }.minOption
      v.foreach { t0 =>
        nv += 1
        val c = es.collect { case (_, "click", us) if us > t0 => us }.minOption
        c.foreach { t1 =>
          nc += 1
          if (es.exists { case (_, k, us) => k == "purchase" && us > t1 })
            np += 1
        }
      }
    }
    assert(got == Map("view" -> nv, "click" -> nc, "purchase" -> np))
    assert(nv >= nc && nc >= np && np > 0, s"degenerate funnel $nv/$nc/$np")
  }

  test("latency drift: halves partition the census; flags follow the deltas") {
    import org.apache.spark.sql.functions._
    val rows = Assessments.aLatencyDrift(spark, dir).collect()
    val census = graft.Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull)
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length == census.size)
    rows.foreach { r =>
      val (t, p50a, p50b, p95a, p95b) = (r.getString(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(r.getLong(5) + r.getLong(6) == census(t), s"halves must partition $t")
      assert(math.abs(r.getDouble(7) - BigDecimal(p50b - p50a)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      assert(r.getBoolean(9) == (p95b - p95a > p95a * 0.1), s"flag at $t")
      assert(p95a >= p50a && p95b >= p50b, s"percentile order at $t")
      assert(r.getString(10) == "steady", "shipped data spans both halves")
    }
  }

  test("seasonal anomaly: baselines match brute force; flags follow ratio") {
    import org.apache.spark.sql.functions._
    val rows = Assessments.a15SeasonalDow(spark, dir).collect()
    val daily = graft.Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        dayofweek(col("ts")).as("dow"), col("event_type"))
      .count().collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)) -> r.getLong(3))
      .toMap
    assert(rows.length == daily.size)
    val base = daily.groupBy { case ((_, dow, t), _) => (dow, t) }
      .map { case (k, vs) => k -> (vs.values.sum, vs.size) }
    rows.foreach { r =>
      val key = (r.getString(0), r.getInt(2), r.getString(1))
      val n = r.getLong(3)
      assert(n == daily(key))
      val (tot, nDays) = base((key._2, key._3))
      val ratio = BigDecimal(n.toDouble * nDays / tot + 1e-9)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(5) == ratio, s"ratio at $key")
      assert(r.getBoolean(6) == (ratio > 1.5 || ratio < 0.5), s"flag at $key")
    }
  }

  test("latency drift surfaces appeared/vanished kinds via full outer") {
    import spark.implicits._
    val fixture = Seq(
      ("old", true, 1.0), ("old", true, 2.0),       // only first half
      ("new", false, 5.0), ("new", false, 7.0),     // only second half
      ("both", true, 1.0), ("both", false, 10.0)    // regresses hard
    ).toDF("event_type", "p1", "value")
    val rows = Assessments.latencyDriftOver(fixture).collect()
      .map(r => r.getString(0) ->
        (r.getString(10), r.getBoolean(9), r.getLong(5), r.getLong(6))).toMap
    assert(rows("old") == (("vanished", false, 2L, 0L)))
    assert(rows("new") == (("appeared", false, 0L, 2L)))
    assert(rows("both") == (("steady", true, 1L, 1L)))
  }

  test("funnel ordering is load-bearing: pre-view clicks do not convert") {
    import spark.implicits._
    // user 1: view(1) -> click(2) -> purchase(3): full funnel
    // user 2: click(1) -> view(2) -> purchase(3): click precedes the first
    //   view, so the funnel stops at 'view' (set-intersect would count it)
    // user 3: purchase(1), view(2): no click stage at all
    val fixture = Seq(
      (1L, "view", 1L), (1L, "click", 2L), (1L, "purchase", 3L),
      (2L, "click", 1L), (2L, "view", 2L), (2L, "purchase", 3L),
      (3L, "purchase", 1L), (3L, "view", 2L)
    ).toDF("user_id", "event_type", "us")
    val got = Assessments.funnelOver(fixture).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("view", 3L, 1.0), ("click", 1L, 0.3333),
      ("purchase", 1L, 1.0)))
  }
}
