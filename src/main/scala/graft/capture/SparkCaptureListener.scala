package graft.capture

import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import graft.model.{EventStatus, EventType, ExecutionMode, QueryEvent}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.command.DataWritingCommandExec
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.util.QueryExecutionListener

/** The Spark-side capture hook — this library's analog of the reference's
  * ENTRY POINT (`MigrationAssessmentLoggingHook.java:40-68`, a Hive
  * `ExecuteWithHookContext`): every SQL execution that completes on the
  * session becomes one `QUERY_COMPLETED` [[QueryEvent]], ready for the
  * existing sink / assessment layer. A user of the reference gets the same
  * loop on Spark: attach the hook, run the workload, assess the log.
  *
  * Hook-context field mapping (reference `EventRecordConstructor.java`):
  * query id ← `QueryExecution.id` under the app id; user ← `sparkUser`;
  * engine/mode ← the reference's own `SPARK` enum arm; tables read ←
  * catalog names (or file-source root paths — the lakehouse "table") of
  * the plan's leaf relations; tables written ← data-writing command
  * targets; counters ← a JSON object with duration and the root plan's
  * output-row metric, the same "summary counters as one JSON column" shape
  * as O16.
  *
  * Listener-bus discipline (callbacks must never block or throw, and a
  * slow consumer must not OOM the driver — the reference solves the same
  * problem with its bounded queue, O21): events land in a bounded buffer
  * with drop-and-count admission; [[drain]] hands them to the host, which
  * writes through [[graft.sink.EventSink]] (optionally under
  * [[graft.sink.Retry]] — O22) on its own thread.
  */
final class SparkCaptureListener(maxBuffered: Int = 8192)
    extends QueryExecutionListener {

  private val buf = new ConcurrentLinkedQueue[QueryEvent]
  private val buffered = new AtomicInteger(0)
  private val droppedN = new AtomicLong(0L)
  private val seenN = new AtomicLong(0L)

  override def onSuccess(funcName: String, qe: QueryExecution,
                         durationNs: Long): Unit =
    admit(() => record(funcName, qe, Some(durationNs), None))

  override def onFailure(funcName: String, qe: QueryExecution,
                         error: Exception): Unit =
    admit(() => record(funcName, qe, None, Some(error)))

  /** Events captured so far, in arrival order; removes them from the
    * buffer. The host thread calls this, never the listener bus. */
  def drain(): Seq[QueryEvent] = {
    val out = Vector.newBuilder[QueryEvent]
    var e = buf.poll()
    while (e != null) {
      buffered.decrementAndGet()
      out += e
      e = buf.poll()
    }
    out.result()
  }

  /** [[drain]] as a DataFrame in the 33-column QueryEvents schema —
    * directly writable by `EventSink.writeBatch`. */
  def drainToFrame(s: SparkSession): DataFrame = {
    import s.implicits._
    s.createDataset(drain()).toDF()
  }

  /** O21 contract: events dropped because the buffer was full. */
  def dropped: Long = droppedN.get()

  /** Total callbacks observed (admitted + dropped) — lets a test await
    * asynchronous listener-bus delivery without sleeping blind. */
  def seen: Long = seenN.get()

  private def admit(make: () => QueryEvent): Unit = {
    // Reserve-then-build keeps the cap exact under concurrent callbacks.
    // `seen` increments LAST: a waiter that observes seen == N is
    // guaranteed the N-th event is already in the buffer (or counted
    // dropped), so awaiting on seen then draining cannot race the add.
    if (buffered.incrementAndGet() <= maxBuffered) {
      try buf.add(make())
      catch {
        case _: Throwable => // never throw on the listener bus
          buffered.decrementAndGet()
          droppedN.incrementAndGet()
      }
    } else {
      buffered.decrementAndGet()
      droppedN.incrementAndGet()
    }
    seenN.incrementAndGet()
  }

  private def record(funcName: String, qe: QueryExecution,
                     durationNs: Option[Long],
                     error: Option[Throwable]): QueryEvent = {
    val sc = qe.sparkSession.sparkContext
    val nowMs = System.currentTimeMillis()
    val startMs = durationNs.map(d => nowMs - d / 1000000L).getOrElse(nowMs)
    // Leaf relations → "tables read": catalog identifier when the relation
    // has one, else the file-source root path (the path IS the table name
    // of a pathed lakehouse — same normalization the assessment layer's
    // a11_source_parse mines).
    val reads = qe.analyzed.collectLeaves().flatMap {
      case lr: LogicalRelation =>
        lr.catalogTable.map(_.qualifiedName).orElse(Some(lr.relation match {
          case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            f.location.rootPaths.mkString(",")
          case other => other.toString.take(256)
        }))
      case r if r.nodeName == "DataSourceV2Relation" => Some(r.toString.take(256))
      case _ => None
    }.distinct
    val writes = qe.executedPlan.collect {
      case w: DataWritingCommandExec => w.cmd.nodeName
    }.distinct
    val outputRows =
      qe.executedPlan.metrics.get("numOutputRows").map(_.value)
    val counters = Seq(
      Some(s""""durationMs": ${durationNs.map(_ / 1000000L).getOrElse(-1L)}"""),
      outputRows.map(n => s""""outputRows": $n""")
    ).flatten.mkString("{", ", ", "}")
    QueryEvent(
      QueryId = Some(s"${sc.applicationId}_${qe.id}"),
      QueryType =
        Some(if (writes.nonEmpty || funcName == "command") "DDL" else "QUERY"),
      QueryText = Some(qe.analyzed.toString.take(2048)),
      EventType = Some(EventType.QueryCompleted.name),
      ExecutionMode = Some(ExecutionMode.Spark_.name),
      ExecutionEngine = Some("spark"),
      RequestUser = Some(sc.sparkUser),
      UserName = Some(sc.sparkUser),
      StartTime = Some(new Timestamp(startMs)),
      EndTime = Some(new Timestamp(nowMs)),
      TablesRead = reads,
      TablesWritten = writes,
      Status = Some(
        if (error.isEmpty) EventStatus.Success.name else EventStatus.Fail.name),
      ErrorMessage = error.map(e =>
        Option(e.getMessage).getOrElse(e.toString).take(2048)),
      CountersObject = Some(counters),
      InvokerInfo = Some(funcName),
      ThreadName = Some(Thread.currentThread().getName),
      YarnApplicationId = Some(sc.applicationId)
    )
  }
}

object SparkCaptureListener {
  /** Attach a capture hook to the session (reference analog:
    * `hive.exec.post.hooks=MigrationAssessmentLoggingHook`). Returns the
    * listener; call `drain`/`drainToFrame` to collect and
    * `session.listenerManager.unregister` to detach. */
  def install(session: SparkSession,
              maxBuffered: Int = 8192): SparkCaptureListener = {
    val l = new SparkCaptureListener(maxBuffered)
    session.listenerManager.register(l)
    l
  }
}
