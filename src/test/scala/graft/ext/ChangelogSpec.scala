package graft.ext

import graft.{Tables, TestSpark}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force reconstructions of the changelog/lakehouse operators at
  * sf0.001: each test recomputes the expected answer from the raw collected
  * events in plain Scala and compares exactly — the same shape the DuckDB
  * oracle pins at sf0.01, but with the semantics spelled out locally. */
class ChangelogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  /** (event_id, ts_ms, user_id (null→Long.MinValue sentinel), type, value) */
  private lazy val raw: Seq[(Long, Long, Option[Long], String, Double)] =
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull)
      .select(col("event_id"), unix_millis(col("ts")).as("ts_ms"),
        col("user_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getString(3), r.getDouble(4)))
      .toSeq

  test("cdc upsert: one row per key, winner is max (ts, event_id)") {
    val got = Changelog.xCdcUpsert(spark, dir).collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(5)))
      .toMap
    val exp = raw.groupBy(e => (e._3, e._4)).map { case (k, es) =>
      val w = es.maxBy(e => (e._2, e._1))
      k -> (w._2, w._1, es.length.toLong)
    }
    assert(got == exp)
    assert(got.values.map(_._3).sum == raw.length.toLong)
  }

  test("scd2 intervals: contiguous versions, chained bounds, one current") {
    val rows = Changelog.xScd2Intervals(spark, dir).collect()
      .map(r => ((Option(r.get(0)).map(_.asInstanceOf[Long]), r.getString(1)),
        r.getInt(2), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))
    assert(rows.length == raw.length)
    rows.groupBy(_._1).foreach { case (key, h0) =>
      val h = h0.sortBy(_._2)
      assert(h.map(_._2).toSeq == (1 to h.length), s"versions not 1..n at $key")
      h.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"interval chain broken at $key")
        case _ =>
      }
      assert(h.count(_._4.isEmpty) == 1, s"current-row count wrong at $key")
    }
  }

  test("gapfill: complete per-user grid, forward-fill matches brute force") {
    val rows = Changelog.xGapfillDaily(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3)))
    val sub = raw.filter(e => e._3.exists(u => u >= 0 && u < 50))
    def day(tsMs: Long) = java.time.Instant.ofEpochMilli(tsMs)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate
    val allDays = {
      val ds = sub.map(e => day(e._2))
      val (mn, mx) = (ds.min, ds.max)
      Iterator.iterate(mn)(_.plusDays(1)).takeWhile(!_.isAfter(mx)).toSeq
    }
    val users = sub.flatMap(_._3).distinct
    assert(rows.length == users.length * allDays.length, "grid incomplete")
    // last observation per (user, day) by (ts, event_id), then forward fill
    val obs = sub.groupBy(e => (e._3.get, day(e._2))).map { case (k, es) =>
      k -> es.maxBy(e => (e._2, e._1))._5
    }
    users.foreach { u =>
      var lastV: Option[Double] = None
      allDays.foreach { d =>
        val o = obs.get((u, d))
        o.foreach(v => lastV = Some(v))
        val gotRow = rows.find(r => r._1 == u && r._2 == d.toString).get
        assert(gotRow._4 == o.isEmpty, s"is_filled wrong at ($u, $d)")
        assert(gotRow._3.isDefined == lastV.isDefined, s"null-ness at ($u, $d)")
        lastV.foreach(v =>
          assert(math.abs(gotRow._3.get - v) < 1e-6, s"value wrong at ($u, $d)"))
      }
    }
  }

  test("funnel: counts match brute force; monotone; rates off the top") {
    val rows = Changelog.xFunnelSteps(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(rows.map(_._1).toSeq == Seq("1_signup", "2_click", "3_purchase"))
    val byUser = raw.filter(_._3.isDefined)
      .groupBy(_._3.get).view.mapValues(_.toSeq)
    def firstAtOrAfter(es: Seq[(Long, Long, Option[Long], String, Double)],
                       tpe: String, t0: Long): Option[Long] =
      es.filter(e => e._4 == tpe && e._2 >= t0).map(_._2).minOption
    val s1 = byUser.flatMap { case (u, es) =>
      es.filter(_._4 == "signup").map(_._2).minOption.map(u -> _)
    }.toMap
    val c1 = s1.flatMap { case (u, t) =>
      firstAtOrAfter(byUser(u), "click", t).map(u -> _)
    }
    val p1 = c1.flatMap { case (u, t) =>
      firstAtOrAfter(byUser(u), "purchase", t).map(u -> _)
    }
    assert(rows.map(_._2).toSeq ==
      Seq(s1.size.toLong, c1.size.toLong, p1.size.toLong))
    assert(rows(0)._2 >= rows(1)._2 && rows(1)._2 >= rows(2)._2)
    rows.foreach { case (_, n, conv) =>
      assert(conv.isDefined && math.abs(
        conv.get - n.toDouble / s1.size) < 1e-5)
    }
  }

  test("table stats: one row per column, stats match direct aggregates") {
    val rows = Changelog.xTableStats(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(rows.keySet == Set("l_orderkey", "l_quantity", "l_returnflag",
      "l_shipdate"))
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val n = li.count()
    assert(rows.values.forall(_._1 == n))
    Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate").foreach {
      c =>
        val nn = li.filter(col(c).isNull).count()
        val ndv = li.select(c).na.drop().distinct().count()
        assert(rows(c)._2 == nn, s"$c null count")
        assert(rows(c)._3 == ndv, s"$c ndv")
    }
    val qMin = li.agg(min("l_quantity")).head.getDouble(0)
    assert(rows("l_quantity")._4 == f"$qMin%.2f", "quantity min formatting")
  }

  test("snapshot diff: full-outer classification matches brute force") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val v2 = docs.flatMap { case (id, text) =>
      val nib = md5hex(id.toString).head
      val kept = if (nib == 'f') None
      else Some(id -> (if (nib <= '1') text + " [rev2]" else text))
      val added = if (nib == 'e') Some((id + 10000000L) -> (text + " [new]"))
      else None
      kept ++ added
    }
    val exp = (docs.keySet ++ v2.keySet).flatMap { id =>
      (docs.get(id), v2.get(id)) match {
        case (None, Some(_))              => Some(id -> "added")
        case (Some(_), None)              => Some(id -> "removed")
        case (Some(a), Some(b)) if a != b => Some(id -> "changed")
        case _                            => None
      }
    }
    val got = Changelog.xSnapshotDiff(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(got == exp, s"got ${got.size} diffs, expected ${exp.size}")
    assert(Set("added", "removed", "changed").subsetOf(got.map(_._2)),
      "a diff class is missing — the mutation no longer exercises it")
  }

  test("column histogram: partitions the rows, brute-force bucket parity") {
    val xs = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_extendedprice").na.drop().collect().map(_.getDouble(0))
    val (mn, mx) = (xs.min, xs.max)
    val w = (mx - mn) / 16
    val rows = Changelog.xColumnHistogram(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._2).sum == xs.length, "histogram must partition rows")
    val exp = xs.groupBy(x => math.min(15, math.floor((x - mn) / w).toInt))
      .view.mapValues(_.length.toLong).toMap
    rows.foreach { case (b, n, lo, hi) =>
      assert(exp(b) == n, s"bucket $b count")
      assert(math.abs(lo - (mn + b * w)) < 1e-3, s"bucket $b lo")
      assert(math.abs(hi - (mn + (b + 1) * w)) < 1e-3, s"bucket $b hi")
    }
  }

  test("column corr: Pearson matches brute force on all three pairs") {
    val rows = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_quantity", "l_extendedprice", "l_discount").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    def pearson(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.length
      val (ma, mb) = (a.sum / n, b.sum / n)
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      val (va, vb) = (a.map(x => (x - ma) * (x - ma)).sum,
        b.map(y => (y - mb) * (y - mb)).sum)
      cov / math.sqrt(va * vb)
    }
    val got = Changelog.xColumnCorr(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val exp = Map(
      "l_quantity~l_extendedprice" -> pearson(rows.map(_._1), rows.map(_._2)),
      "l_quantity~l_discount" -> pearson(rows.map(_._1), rows.map(_._3)),
      "l_extendedprice~l_discount" -> pearson(rows.map(_._2), rows.map(_._3)))
    assert(got.keySet == exp.keySet)
    exp.foreach { case (k, v) =>
      assert(math.abs(got(k) - v) < 1e-3, s"$k: got ${got(k)}, expected $v")
    }
  }

  test("pit lookup: each purchase sees exactly the version valid at its ts") {
    val byUser = raw.filter(_._3.isDefined).groupBy(_._3.get)
    val exp = byUser.toSeq.flatMap { case (u, es) =>
      val versions = es.filter(_._4 == "signup").sortBy(e => (e._2, e._1))
      es.filter(_._4 == "purchase").flatMap { p =>
        val live = versions.zipWithIndex.find { case (v, i) =>
          p._2 >= v._2 &&
            (i + 1 >= versions.length || p._2 < versions(i + 1)._2)
        }
        live.map { case (v, _) => (p._1, u, v._2) }
      }
    }.toSet
    val got = Changelog.xPitLookup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    assert(got == exp, s"got ${got.size} lookups, expected ${exp.size}")
    assert(got.nonEmpty, "no purchase matched any version — vacuous")
    assert(got.map(_._1).size == got.size, "a purchase matched two versions")
  }

  test("stable ids: contiguous 1..N in doc_id order, no global sort needed") {
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val got = Changelog.xStableIds(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.size == ids.length)
    ids.zipWithIndex.foreach { case (id, i) =>
      assert(got(id) == i + 1L, s"doc $id numbered ${got(id)}, want ${i + 1}")
    }
  }

  test("skew report: top keys match brute force, factors consistent") {
    val counts = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy("o_custkey").count().collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getLong(1))
    val total = counts.map(_._2).sum
    val mean = total.toDouble / counts.length
    val expTop = counts.sortBy { case (k, n) => (-n, k) }.take(20)
    val got = Changelog.xSkewReport(spark, dir).collect()
      .map(r => ((if (r.isNullAt(0)) -1L else r.getLong(0)), r.getLong(1),
        r.getDouble(2), r.getDouble(3)))
    assert(got.map(g => (g._1, g._2)).toSeq == expTop.toSeq)
    got.foreach { case (k, n, share, skew) =>
      assert(math.abs(share - n.toDouble / total) < 1e-5, s"share at $k")
      assert(math.abs(skew - n / mean) < 1e-3, s"skew factor at $k")
    }
  }

  test("daily uniques: exact matches brute force; HLL in tolerance") {
    def day(tsMs: Long) = java.time.Instant.ofEpochMilli(tsMs)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
    val exp = raw.groupBy(e => day(e._2)).view
      .mapValues(_.flatMap(_._3).distinct.size.toLong).toMap
    val got = Changelog.xDailyUniques(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (d, n) =>
      assert(got(d)._1 == n, s"exact uniques wrong on $d")
      assert(got(d)._2, s"HLL outside tolerance on $d")
    }
  }

  test("transitions: counts match brute force, rows normalize to 1") {
    val exp = raw.filter(_._3.isDefined).groupBy(_._3.get).toSeq
      .flatMap { case (_, es) =>
        es.sortBy(e => (e._2, e._1)).map(_._4).sliding(2).collect {
          case Seq(a, b) => (a, b)
        }
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Changelog.xEventTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (k, n) => assert(got(k)._1 == n, s"count wrong at $k") }
    got.groupBy(_._1._1).foreach { case (from, rs) =>
      val mass = rs.values.map(_._2).sum
      assert(math.abs(mass - 1.0) < 1e-4, s"row $from sums to $mass")
    }
  }

  test("ohlc: open/close pick the first/last by (ts, event_id)") {
    def day(tsMs: Long) = java.time.Instant.ofEpochMilli(tsMs)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
    val exp = raw.groupBy(e => (e._4, day(e._2))).map { case (k, es) =>
      val open = es.minBy(e => (e._2, e._1))._5
      val close = es.maxBy(e => (e._2, e._1))._5
      k -> (open, es.map(_._5).max, es.map(_._5).min, close, es.length.toLong)
    }
    val got = Changelog.xOhlcDaily(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (k, (o, h, l, c, n)) =>
      val g = got(k)
      assert(math.abs(g._1 - o) < 1e-3 && math.abs(g._2 - h) < 1e-3 &&
        math.abs(g._3 - l) < 1e-3 && math.abs(g._4 - c) < 1e-3 && g._5 == n,
        s"bar mismatch at $k: got $g expected ($o,$h,$l,$c,$n)")
      assert(g._3 <= g._1 + 1e-9 && g._1 <= g._2 + 1e-9, s"open outside range at $k")
      assert(g._3 <= g._4 + 1e-9 && g._4 <= g._2 + 1e-9, s"close outside range at $k")
    }
  }

  test("impute: only md5-selected rows repaired, with the survivor median") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val corrupted = raw.map(e => (e._1, e._4, e._5,
      md5hex(e._1.toString).head <= '1'))
    val meds = corrupted.filterNot(_._4).groupBy(_._2)
      .map { case (t, es) => t -> median(es.map(_._3)) }
    val got = Changelog.xImputeMedian(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2),
        r.getBoolean(3))).toMap
    assert(got.size == raw.length)
    corrupted.foreach { case (id, tpe, v, hit) =>
      val (gt, gv, gflag) = got(id)
      assert(gt == tpe && gflag == hit, s"flag wrong at $id")
      val expV = if (hit) meds(tpe) else v
      assert(math.abs(gv - expV) < 1e-3, s"value wrong at $id")
    }
    assert(corrupted.exists(_._4), "corruption selected nothing — vacuous")
  }

  test("ndv sketch: exact counts match; HLL within tolerance everywhere") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val rows = Changelog.xNdvSketch(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rows.keySet == Set("l_orderkey", "l_partkey", "l_suppkey",
      "l_shipdate"))
    rows.foreach { case (c, (ndv, ok)) =>
      assert(ndv == li.select(c).na.drop().distinct().count(), s"$c ndv")
      assert(ok, s"$c HLL estimate outside 10% of exact")
    }
  }

  test("mad outliers: medians match brute force; flags consistent with z") {
    val rows = Changelog.xMadOutliers(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)), r.getBoolean(6)))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    def day(tsMs: Long) = java.time.Instant.ofEpochMilli(tsMs)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
    val daily = raw.groupBy(e => (e._4, day(e._2))).view.mapValues(_.length)
    assert(rows.length == daily.size)
    rows.groupBy(_._1).foreach { case (tpe, rs) =>
      val ns = daily.collect { case ((t, _), n) if t == tpe => n.toDouble }.toSeq
      val med = median(ns)
      val mad = median(ns.map(n => math.abs(n - med)))
      rs.foreach { r =>
        assert(daily((tpe, r._2)).toLong == r._3, s"count wrong at $tpe ${r._2}")
        assert(math.abs(r._4 - med) < 1e-9, s"median wrong for $tpe")
        assert(math.abs(r._5 - mad) < 1e-9, s"MAD wrong for $tpe")
        if (mad == 0.0) {
          assert(r._6.isEmpty && !r._7, s"mad=0 must yield null z at $tpe")
        } else {
          val z = 0.6745 * (r._3 - med) / mad
          assert(math.abs(r._6.get - z) < 1e-5, s"z wrong at $tpe ${r._2}")
          assert(r._7 == (math.abs(z) > 3.5), s"flag wrong at $tpe ${r._2}")
        }
      }
    }
  }
}
