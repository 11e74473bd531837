package graft.sink

import java.io.{IOException, UncheckedIOException}
import java.nio.file.Files
import java.sql.Timestamp

import graft.TestSpark
import graft.model.QueryEvent

import org.scalatest.funsuite.AnyFunSuite

/** O22 — the reference's retry-with-backoff contract
  * (EventLogger.java:196-239) re-expressed at the batch-commit level:
  * quadratic schedule, IO-only retry, no silent drop. */
class RetrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private class Sleeps {
    val recorded = scala.collection.mutable.ArrayBuffer.empty[Long]
    def sleep(ms: Long): Unit = recorded += ms
  }

  test("IO failure retries on the reference's quadratic schedule, then succeeds") {
    val s = new Sleeps
    var calls = 0
    val out = Retry.withBackoff(maxRetries = 2, sleep = s.sleep) {
      calls += 1
      if (calls <= 2) throw new UncheckedIOException(new IOException(s"flake $calls"))
      "ok"
    }
    assert(out == "ok" && calls == 3)
    // 0 s before the first retry ("fs reopen will fix it"), 1 s before the second
    assert(s.recorded.toSeq == Seq(0L, 1000L))
  }

  test("final failure PROPAGATES (no reference-style silent drop, no parting sleep)") {
    val s = new Sleeps
    var calls = 0
    val e = intercept[UncheckedIOException] {
      Retry.withBackoff(maxRetries = 2, sleep = s.sleep) {
        calls += 1
        throw new UncheckedIOException(new IOException(s"down $calls"))
      }
    }
    assert(calls == 3, "maxRetries=2 means exactly 3 attempts")
    assert(e.getMessage.contains("down 3"), "last failure must surface")
    assert(s.recorded.toSeq == Seq(0L, 1000L),
      "no sleep after the final failure (reference sleeps 4s then drops)")
  }

  test("non-IO failure is never retried") {
    var calls = 0
    intercept[IllegalArgumentException] {
      Retry.withBackoff(maxRetries = 2, sleep = _ => fail("must not sleep")) {
        calls += 1
        throw new IllegalArgumentException("schema error")
      }
    }
    assert(calls == 1)
  }

  test("ioShaped looks through Spark's wrapper layers and survives cause cycles") {
    val wrapped = new RuntimeException("outer",
      new RuntimeException("mid", new IOException("disk")))
    assert(Retry.ioShaped(wrapped))
    assert(!Retry.ioShaped(new RuntimeException("logic")))
    val a = new RuntimeException("a"); val b = new RuntimeException("b", a)
    a.initCause(b) // cycle
    assert(!Retry.ioShaped(a))
  }

  test("writeBatchWithRetry lands the batch after transient failures") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_retry").toString
    val events = Seq(QueryEvent(
      QueryId = Some("q1"), EventType = Some("QUERY_COMPLETED"),
      StartTime = Some(new Timestamp(1671969621334L)),
      EndTime = Some(new Timestamp(1671969622334L)),
      Status = Some("SUCCESS"))).toDF()
    // First attempt throws an injected IO flake, second runs the REAL
    // write — proving the composition (retry → writeBatch → parquet
    // commit → read-back) is wired, not just the policy in isolation.
    var attempts = 0
    val s = new Sleeps
    Retry.withBackoff(maxRetries = 2, sleep = s.sleep) {
      attempts += 1
      if (attempts == 1) throw new IOException("transient fs outage")
      EventSink.writeBatch(events, dir)
    }
    assert(attempts == 2 && s.recorded.toSeq == Seq(0L))
    assert(EventSink.read(spark, dir).count() == 1)
    // and the public wrapper happy-path writes too (append mode: +1 row)
    EventSink.writeBatchWithRetry(events, dir, sleep = _ => ())
    assert(EventSink.read(spark, dir).count() == 2)
  }
}
