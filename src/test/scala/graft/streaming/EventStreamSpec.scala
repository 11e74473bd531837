package graft.streaming

import graft.TestSpark

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

case class Ev(ts: Timestamp, event_id: Long, user_id: Long,
              event_type: String, value: Double)

/** MemoryStream-driven streaming tests: watermark windows, session windows,
  * within-watermark dedup (SURVEY.md §5 — streaming via MemoryStream +
  * watermark late-data cases). */
class EventStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def t(min: Int) = new Timestamp(min * 60000L)

  private def runToMemory(name: String, df: org.apache.spark.sql.DataFrame,
                          mode: OutputMode): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    try q.processAllAvailable()
    finally q.stop()
  }

  test("A14 dropDuplicatesWithinWatermark removes replayed events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    in.addData(
      Ev(t(0), 1L, 10L, "click", 1.0),
      Ev(t(1), 1L, 10L, "click", 1.0), // replay of event 1
      Ev(t(2), 2L, 10L, "view", 2.0))
    runToMemory("dedup_out",
      EventStream.dedupWithinWatermark(in.toDF(), "10 minutes"),
      OutputMode.Append)
    val got = spark.table("dedup_out").collect()
    assert(got.map(_.getAs[Long]("event_id")).sorted.toSeq == Seq(1L, 2L))
  }

  test("O21 bounded admission drops and counts overflow rows") {
    import spark.implicits._
    val df = spark.range(100).selectExpr("id").repartition(4)
    val (admitted, dropped) = EventStream.boundedAdmission(df.toDF(), 10)
    val n = admitted.count()
    assert(n == 40, s"admitted $n") // 4 partitions × capacity 10
    assert(dropped.value == 60, s"dropped ${dropped.value}")
  }

  test("A7 windowed counts drop late data beyond watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val agg = EventStream.hourlyCounts(in.toDF(), "30 minutes")
    val q = agg.writeStream.format("memory").queryName("hourly_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(Ev(t(10), 1L, 1L, "click", 1.0), Ev(t(20), 2L, 1L, "click", 1.0))
      q.processAllAvailable()
      // advance watermark far past the first hour...
      in.addData(Ev(t(200), 3L, 1L, "click", 1.0))
      q.processAllAvailable()
      // ...then replay something ancient: must be dropped, not re-emitted
      in.addData(Ev(t(5), 4L, 1L, "click", 9.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("hourly_out").collect()
      .map(r => (r.getAs[Timestamp]("hour_start").getTime / 60000, r.getAs[Long]("n")))
      .toSet
    assert(rows.contains((0L, 2L))) // hour 0 closed with exactly 2 events
    assert(!rows.contains((0L, 3L)))
  }

  test("mapGroupsWithState accumulates per-user totals across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // In this environment stateful queries schedule no-data micro-batches
    // continuously, which livelocks processAllAvailable — disable them.
    val key = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    val in = MemoryStream[EventRow]
    val q = EventStream.runningUserTotals(in.toDS())
      .writeStream.format("memory").queryName("totals_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update).start()
    try {
      in.addData(EventRow(t(0), 1L, 7L, "click", 1.5),
        EventRow(t(1), 2L, 7L, "view", 2.5))
      q.processAllAvailable()
      in.addData(EventRow(t(2), 3L, 7L, "click", 4.0),
        EventRow(t(3), 4L, 8L, "click", 1.0))
      q.processAllAvailable()
    } finally { q.stop(); spark.conf.set(key, prev) }
    val rows = spark.table("totals_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // user 7: first batch (2, 4.0), second batch accumulates to (3, 8.0)
    assert(rows.contains((7L, 2L, 4.0)))
    assert(rows.contains((7L, 3L, 8.0)))
    assert(rows.contains((8L, 1L, 1.0)))
  }

  test("O23/O24 streaming file sink: checkpointed, date-partitioned, resumable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_stream_sink")
    val (out, ckpt) = (s"$base/data", s"$base/ckpt")
    def ev(id: Long, dayOffset: Int) = graft.model.QueryEvent(
      QueryId = Some(s"q$id"), EventType = Some("QUERY_COMPLETED"),
      EndTime = Some(new Timestamp(1671969622334L + dayOffset * 86400000L)))
    val in = MemoryStream[graft.model.QueryEvent]
    in.addData(ev(1, 0), ev(2, 1))
    val q1 = graft.sink.EventSink.writeStream(in.toDF(), out, ckpt,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q1.awaitTermination(60000)
    // restart from the same checkpoint — exactly-once across restarts
    in.addData(ev(3, 0))
    val q2 = graft.sink.EventSink.writeStream(in.toDF(), out, ckpt,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q2.awaitTermination(60000)
    val back = graft.sink.EventSink.read(spark, out)
    assert(back.count() == 3)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filterNot(_ == "_spark_metadata").toSet
    assert(dirs == Set("EventDate=2022-12-25", "EventDate=2022-12-26"))
  }

  test("flatMapGroupsWithState emits one alert per threshold crossing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    val in = MemoryStream[EventRow]
    val q = EventStream.burstAlerts(in.toDS(), every = 3L)
      .toDF("user_id", "at_count")
      .writeStream.format("memory").queryName("alerts_out")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData((1 to 2).map(i => EventRow(t(i), i, 7L, "click", 1.0)): _*)
      q.processAllAvailable() // 2 events: below threshold, no alert
      in.addData((3 to 7).map(i => EventRow(t(i), i, 7L, "click", 1.0)): _*)
      q.processAllAvailable() // now 7 events: crossings at 3 and 6
    } finally { q.stop(); spark.conf.set(key, prev) }
    val rows = spark.table("alerts_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((7L, 3L), (7L, 6L)))
  }

  test("A1 stream-stream lifecycle join pairs within the delay bound only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val subs = MemoryStream[Ev]
    val dones = MemoryStream[Ev]
    val joined = EventStream.lifecyclePairs(
      subs.toDF(), dones.toDF(), "10 minutes", "1 hour")
    val q = joined.writeStream.format("memory").queryName("pairs_out")
      .outputMode(OutputMode.Append).start()
    try {
      // NB: event times must sit strictly ABOVE the initial watermark
      // (epoch 0) — a row at exactly the watermark is dropped as late.
      subs.addData(Ev(t(60), 1L, 7L, "submit", 0.0),
        Ev(t(65), 2L, 8L, "submit", 0.0))
      // q1 completes in-bound (40 min); q2 completes out-of-bound (2 h)
      dones.addData(Ev(t(100), 1L, 7L, "done", 0.0),
        Ev(t(185), 2L, 8L, "done", 0.0))
      q.processAllAvailable()
      // push both watermarks so in-bound results are final
      subs.addData(Ev(t(600), 90L, 9L, "submit", 0.0))
      dones.addData(Ev(t(600), 91L, 9L, "done", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("pairs_out").collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("latency_ms")))
    assert(rows.contains((1L, 2400000L))) // 40 min latency
    assert(!rows.exists(_._1 == 2L)) // out-of-bound completion never pairs
  }

  test("A7 session_window groups by inactivity gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val agg = EventStream.sessionStats(in.toDF(), "30 minutes", "0 seconds")
    val q = agg.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // two bursts 2 h apart → two sessions once the watermark passes
      in.addData(Ev(t(0), 1L, 7L, "click", 1.0), Ev(t(10), 2L, 7L, "view", 1.0))
      q.processAllAvailable()
      in.addData(Ev(t(120), 3L, 7L, "click", 1.0))
      q.processAllAvailable()
      in.addData(Ev(t(500), 99L, 8L, "click", 1.0)) // push watermark
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sess_out").collect()
      .filter(_.getAs[Long]("user_id") == 7L)
      .map(r => (r.getAs[Timestamp]("sess_start").getTime / 60000,
        r.getAs[Long]("n_events"))).toSet
    assert(rows == Set((0L, 2L), (120L, 1L)))
  }
}
