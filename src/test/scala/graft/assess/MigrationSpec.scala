package graft.assess

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Migration-planning analytics pinned against independent recomputation
  * from the raw events (the DuckDB oracle checks the same numbers
  * cross-engine; these specs check them against the event-type census, a
  * derivation the queries never touch). */
class MigrationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  private lazy val typeCounts: Map[String, Long] =
    graft.Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull && col("user_id").isNotNull)
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("dialect scan counts equal the event-type census per construct") {
    val scan = Migration.aDialectScan(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // each statement shape carries a fixed feature set, so per-feature
    // query counts are exactly the type counts
    assert(scan("lateral_view") == typeCounts("click"))
    assert(scan("transform_using") == typeCounts("error"))
    assert(scan("rlike") == typeCounts("error"))
    assert(scan("distribute_by") == typeCounts("purchase"))
    assert(scan("sort_by") == typeCounts("purchase"))
    assert(scan("insert_overwrite") == typeCounts("purchase"))
    assert(scan("cluster_by") == typeCounts("signup"))
    assert(scan("stored_as") == typeCounts("signup"))
  }

  test("per-user complexity totals match the closed-form type weights") {
    // view=0, click=3, purchase=2+1+2, signup=2+1, error=5+1
    val expected = graft.Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull && col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(sum(
        when(col("event_type") === "click", 3L)
          .when(col("event_type") === "purchase", 5L)
          .when(col("event_type") === "signup", 3L)
          .when(col("event_type") === "error", 6L)
          .otherwise(0L)).as("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Migration.aDialectComplexity(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(2) == expected(r.getLong(0)),
        s"user ${r.getLong(0)} tot_weight")
      val avg = r.getDouble(3)
      val effort = r.getString(5)
      assert(effort == (if (avg < 1.5) "low"
      else if (avg < 3.0) "medium" else "high"))
    }
  }

  test("affinity pairs are ordered and co-read totals add up") {
    val aff = Migration.aTableAffinity(spark, dir).collect()
    assert(aff.forall(r => r.getLong(0) < r.getLong(1)))
    // per-event closed form: an ad-hoc query (event_id % 37 == 0)
    // contributes exactly its one rare pair; otherwise a non-head primary
    // (ta % 3 != 0) always pairs with its head and a cross event adds 2
    // more (or 1 when ta is a head)
    val expectedTotal = graft.Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull && col("user_id").isNotNull)
      .select(
        when(col("event_id") % 37 === 0, 1)
          .otherwise(
            when(col("user_id") % 30 % 3 =!= 0, 1).otherwise(0) +
              when(col("user_id") % 31 === 0,
                when(col("user_id") % 30 % 3 =!= 0, 2).otherwise(1))
                .otherwise(0)).as("k"))
      .agg(sum("k")).collect()(0).getLong(0)
    assert(aff.map(_.getLong(4)).sum == expectedTotal)
  }

  test("concurrency profile matches a brute-force interval sweep") {
    val iv = graft.Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull && col("user_id").isNotNull)
      .selectExpr("date_format(ts, 'yyyy-MM-dd') AS day", "event_id",
        "unix_micros(ts) AS st",
        "least(unix_micros(ts) + cast(floor(value * 1e6) AS long), " +
          "unix_micros(date_trunc('day', ts)) + 86399999999L) AS en")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = iv.groupBy(_._1).map { case (day, xs) =>
      val bounds = xs.flatMap { case (_, id, st, en) =>
        Seq((st, 1, id), (en, -1, id))
      }.sortBy { case (t, d, id) => (t, -d, id) }
      var cur = 0L; var mx = Long.MinValue
      bounds.foreach { b => cur += b._2; mx = math.max(mx, cur) }
      day -> (mx, xs.length.toLong)
    }
    val got = Migration.aConcurrencyProfile(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (mx, n) = expected(r.getString(0))
      assert(r.getLong(1) == mx, s"max_concurrent on ${r.getString(0)}")
      assert(r.getLong(2) == n, s"n_queries on ${r.getString(0)}")
    }
    assert(got.length == expected.size)
  }

  test("waves partition the catalog and keep table groups together") {
    val waves = Migration.aMigrationWaves(spark, dir).collect()
    val byTable = waves.map(r => r.getLong(0) -> r.getLong(2)).toMap
    // every table in exactly one wave; wave label is a member (min) table
    assert(waves.map(_.getLong(0)).distinct.length == waves.length)
    waves.foreach(r => assert(byTable(r.getLong(2)) == r.getLong(2),
      "wave label must itself belong to the wave"))
    // the always-on (member, head) edge keeps each group of 3 together —
    // for tables that actually HAVE member traffic (a table reached only
    // by the rare ad-hoc tail is legitimately a singleton wave)
    val memberTables = graft.Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull && col("user_id").isNotNull &&
        col("event_id") % 37 =!= 0)
      .select((col("user_id") % 30).as("t")).distinct()
      .collect().map(_.getLong(0)).filter(t => t % 3 != 0)
    assert(memberTables.nonEmpty)
    memberTables.foreach { t =>
      assert(byTable(t) == byTable(t - t % 3), s"table $t split from its head")
    }
    // wave_tables is consistent with the partition
    val sizes = waves.groupBy(_.getLong(2)).view.mapValues(_.size.toLong).toMap
    waves.foreach(r => assert(r.getLong(3) == sizes(r.getLong(2))))
  }

  test("wave rollup partitions the workload; cut cost is non-vacuous") {
    val total = graft.Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull && col("user_id").isNotNull).count()
    val roll = Migration.aWaveRollup(spark, dir).collect()
    // every query has a primary table, so wave query counts partition the
    // workload, and wave table counts partition the catalog
    assert(roll.map(_.getLong(2)).sum == total)
    assert(roll.map(_.getLong(1)).sum ==
      Migration.aMigrationWaves(spark, dir).count())
    val cut = Migration.aWaveCutCost(spark, dir).collect()
    assert(cut.nonEmpty, "ad-hoc tail must produce severed co-reads")
    cut.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "wave pair must be ordered")
      assert(r.getLong(3) >= r.getLong(2), "each edge carries >= 1 co-read")
    }
  }

  test("join advisor applies the strategy rule; both regimes populated") {
    val rows = Migration.aJoinAdvisor(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getLong(6)))
    assert(rows.nonEmpty)
    def sz(t: Long) = (t + 1) * 500 + (t % 7) * 1300
    rows.foreach { case (lo, hi, rl, rh, nCo, strat, shuf) =>
      assert(rl == sz(lo) && rh == sz(hi))
      assert(nCo > 0)
      val (small, big) = (math.min(rl, rh), math.max(rl, rh))
      val want =
        if (small <= 3000) "broadcast"
        else if (big <= small * 2) "shuffle_hash"
        else "sort_merge"
      assert(strat == want, s"pair ($lo,$hi)")
      assert(shuf == (if (small <= 3000) 0L else rl + rh))
    }
    val strategies = rows.map(_._6).toSet
    assert(strategies.contains("broadcast") && strategies.size >= 2,
      s"strategy mix degenerate: $strategies")
  }

  test("wave schedule: contiguous phases, smallest-first, cumulative to 1") {
    val rows = Migration.aWaveSchedule(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to rows.length))
    // smallest-and-quietest first: the sort key is non-decreasing
    val ord = Ordering.Tuple3[Long, Long, Long]
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(ord.lteq((a._3, a._4, a._2), (b._3, b._4, b._2)), s"phase ${b._1}")
    }
    // workload partition: cumulative share ends at 1, monotone on the way
    rows.sliding(2).foreach { case Array(a, b) => assert(a._6 <= b._6) }
    assert(math.abs(rows.last._6 - 1.0) < 1e-6)
    // agrees with the rollup's per-wave numbers
    val roll = Migration.aWaveRollup(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { case (_, wave, nt, nq, _, _) =>
      assert(roll(wave) == ((nt, nq)), s"wave $wave")
    }
  }

  test("capacity forecast matches a brute-force least-squares fit") {
    val prof = Migration.aConcurrencyProfile(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble)
    val d0 = prof.map(_._1).min
    def dayIdx(d: String) = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(d0), java.time.LocalDate.parse(d)).toDouble
    val pts = prof.map { case (d, y) => (dayIdx(d), y) }
    val n = pts.length.toDouble
    val (st, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val stt = pts.map(p => p._1 * p._1).sum
    val sty = pts.map(p => p._1 * p._2).sum
    val slope = (n * sty - st * sy) / (n * stt - st * st)
    val icept = (sy - slope * st) / n
    val r = Migration.aCapacityForecast(spark, dir).collect().head
    assert(r.getLong(0) == pts.length)
    assert(math.abs(r.getDouble(1) - slope) < 1e-3, s"slope ${r.getDouble(1)} vs $slope")
    assert(math.abs(r.getDouble(2) - icept) < 1e-2 + 1e-6)
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0 + 1e-9, "r2 range")
    val fc = icept + slope * (pts.map(_._1).max + 7)
    assert(math.abs(r.getDouble(4) - fc) < 1e-2 + 1e-6)
  }

  test("stale tables: brute-force heat/idle recompute; verdicts follow") {
    val rows = Migration.aStaleTables(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3), r.getLong(4),
        r.getDouble(5), r.getString(6))).toMap
    val daily = graft.Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull && col("user_id").isNotNull)
      .select((col("user_id") % 30).as("t"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .groupBy("t", "day").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val dmax = daily.map(_._2).max
    def days(a: String, b: String) = java.time.temporal.ChronoUnit.DAYS
      .between(java.time.LocalDate.parse(a), java.time.LocalDate.parse(b))
    val exp = daily.groupBy(_._1).map { case (t, ds) =>
      val heat = ds.map { case (_, day, n) =>
        n / math.pow(2.0, days(day, dmax) / 7)
      }.sum
      val last = ds.map(_._2).max
      val idle = days(last, dmax)
      t -> (ds.map(_._3).sum, last, idle,
        BigDecimal(heat).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        if (idle <= 7) "active" else if (idle <= 21) "cooling" else "stale")
    }
    assert(rows == exp)
    assert(rows.values.map(_._5).toSet.contains("active"))
  }

  test("readiness scorecard composes its constituents consistently") {
    val rows = Migration.aReadinessScorecard(spark, dir).collect()
    val cx = Migration.aDialectComplexity(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(5)))
      .toMap
    val sched = Migration.aRecurringJobs(spark, dir).collect()
      .filter(_.getBoolean(5)).groupBy(_.getLong(0))
      .view.mapValues(_.length.toLong).toMap
    assert(rows.length == cx.size, "one row per dialect-complexity user")
    val classes = scala.collection.mutable.Set.empty[String]
    rows.foreach { r =>
      val u = r.getLong(0)
      assert((r.getLong(1), r.getLong(2), r.getString(3)) == cx(u))
      assert(r.getLong(4) == sched.getOrElse(u, 0L), s"n_sched at $u")
      val effortPts = r.getString(3) match {
        case "low" => 0L; case "medium" => 1L; case _ => 2L
      }
      val want = effortPts + math.min(r.getLong(4), 3L) +
        (if (r.getDouble(5) > 0.25) 1L else 0L)
      assert(r.getLong(6) == want, s"score at $u")
      val cls = if (want <= 1) "ready" else if (want <= 3) "assisted"
        else "complex"
      assert(r.getString(7) == cls)
      classes += cls
    }
    assert(classes.size >= 2, s"degenerate triage: $classes")
  }

  test("template mining strips every literal and partitions the workload") {
    val rows = Migration.aTemplateMining(spark, dir).collect()
    // literal stripping is total: no '= <digits>' survives, every quoted
    // string is collapsed to '?'
    rows.foreach { r =>
      val t = r.getString(1)
      assert(!"= [0-9]".r.findFirstIn(t).isDefined, s"unstripped literal: $t")
      assert(!t.replace("'?'", "").contains("'"), s"unstripped string: $t")
    }
    // every query lands in exactly one template (5 shapes x <=7 tables)
    assert(rows.map(_.getLong(2)).sum == typeCounts.values.sum)
    assert(rows.length <= 35)
    // the compression ratio IS the point: templates << queries
    assert(rows.length.toLong < typeCounts.values.sum / 10)
  }

  test("recurring jobs match a brute-force modal-gap recomputation") {
    val got = Migration.aRecurringJobs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5))).toMap
    val raw = graft.Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"),
        unix_micros(date_trunc("day", col("ts"))).as("day_us"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val exp = raw.groupBy(e => (e._1, e._2)).flatMap { case ((u, k), es) =>
      val subs = es.map { case (_, _, us, dayUs) =>
        if (u % 41 == 0) dayUs + (u % 24) * 3600000000L else us
      }.distinct.sorted
      val gaps = subs.toSeq.sliding(2).collect { case Seq(a, b) =>
        math.floorDiv(b - a, 60000000L)
      }.toSeq
      if (gaps.isEmpty) None
      else {
        val (gap, n) = gaps.groupBy(identity).view.mapValues(_.size)
          .toSeq.minBy { case (g, c) => (-c, g) }: @unchecked
        val reg = BigDecimal(n.toDouble / gaps.size + 1e-9)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        Some((u, k) -> (subs.size.toLong, gap, reg,
          gaps.size >= 3 && reg >= 0.5))
      }
    }
    assert(got.keySet == exp.keySet)
    exp.foreach { case (key, v) => assert(got(key) == v, s"mismatch at $key") }
    // the cron cohort's gaps sit on the daily grid — the fixture signal the
    // detector exists to find
    val sched = got.collect { case ((u, _), v) if u % 41 == 0 => v }
    assert(sched.nonEmpty)
    sched.foreach { case (_, gap, _, _) => assert(gap % 1440 == 0) }
  }
}
