package graft.capture

import java.nio.file.Files

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Spark-side capture hook (reference entry-point analog): every SQL
  * execution becomes a QueryEvent; bounded admission; sink round trip. */
class SparkCaptureListenerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Listener-bus delivery is asynchronous: await a condition instead of
    * asserting on a race. */
  private def awaitUntil(timeoutMs: Long = 20000L)(cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(cond, s"condition not met within $timeoutMs ms")
  }

  test("success + failure executions become QUERY_COMPLETED events") {
    val l = SparkCaptureListener.install(spark)
    try {
      spark.range(100).agg(sum("id")).collect()
      intercept[Throwable] {
        spark.range(10).selectExpr("raise_error('boom')").collect()
      }
      awaitUntil()(l.seen >= 2)
      val events = l.drain()
      assert(events.size >= 2)
      val ok = events.find(_.Status.contains("SUCCESS"))
      val ko = events.find(_.Status.contains("FAIL"))
      assert(ok.nonEmpty && ko.nonEmpty, events.map(_.Status).toString)
      val e = ok.get
      assert(e.EventType.contains("QUERY_COMPLETED"))
      assert(e.ExecutionMode.contains("SPARK") && e.ExecutionEngine.contains("spark"))
      assert(e.QueryId.exists(_.startsWith(spark.sparkContext.applicationId)))
      assert(e.YarnApplicationId.contains(spark.sparkContext.applicationId))
      assert(e.RequestUser.exists(_.nonEmpty))
      assert(!e.EndTime.get.before(e.StartTime.get), "duration must be >= 0")
      assert(e.CountersObject.exists(_.contains("\"durationMs\"")))
      assert(ko.get.ErrorMessage.exists(_.contains("boom")))
    } finally spark.listenerManager.unregister(l)
  }

  test("file-source reads surface as TablesRead; counters JSON parses") {
    val l = SparkCaptureListener.install(spark)
    try {
      graft.Tables.load(spark, TestSpark.Sf0001, "region").count()
      awaitUntil()(l.seen >= 1)
      val events = l.drain()
      val withRead = events.filter(_.TablesRead.nonEmpty)
      assert(withRead.nonEmpty, s"no TablesRead in ${events.map(_.TablesRead)}")
      assert(withRead.exists(_.TablesRead.exists(_.contains("region"))),
        withRead.map(_.TablesRead).toString)
      // counters must be valid JSON with a numeric durationMs
      import spark.implicits._
      val parsed = events.flatMap(_.CountersObject).toDF("c")
        .select(get_json_object(col("c"), "$.durationMs").cast("long").as("d"))
        .collect()
      assert(parsed.nonEmpty && parsed.forall(r => !r.isNullAt(0) && r.getLong(0) >= 0))
    } finally spark.listenerManager.unregister(l)
  }

  test("bounded admission drops-and-counts past capacity (O21)") {
    val l = SparkCaptureListener.install(spark, maxBuffered = 1)
    try {
      (1 to 4).foreach(i => spark.range(i * 10L).count())
      awaitUntil()(l.seen >= 4)
      assert(l.drain().size <= 1, "cap must hold")
      assert(l.dropped >= 3, s"dropped=${l.dropped}")
    } finally spark.listenerManager.unregister(l)
  }

  test("capture -> sink -> read-back round trip in the QueryEvents schema") {
    val l = SparkCaptureListener.install(spark)
    try {
      spark.range(1000).groupBy(expr("id % 7")).count().collect()
      awaitUntil()(l.seen >= 1)
      val frame = l.drainToFrame(spark)
      val n = frame.count()
      assert(n >= 1)
      assert(frame.columns.length == 33, "full QueryEvents column set")
      val dir = Files.createTempDirectory("graft_hook").toString
      graft.sink.EventSink.writeBatch(frame, dir)
      val back = graft.sink.EventSink.readAsEvents(spark, dir)
      assert(back.count() == n)
      assert(back.filter(col("Status") === "SUCCESS").count() >= 1)
    } finally spark.listenerManager.unregister(l)
  }
}
