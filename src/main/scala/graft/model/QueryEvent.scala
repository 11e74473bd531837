package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** The reference's event-type discriminator.
  * Reference: logger/EventType.java:19-22. */
sealed abstract class EventType(val name: String)
object EventType {
  case object QuerySubmitted extends EventType("QUERY_SUBMITTED")
  case object QueryCompleted extends EventType("QUERY_COMPLETED")
  val values: Seq[EventType] = Seq(QuerySubmitted, QueryCompleted)
}

/** Reference: logger/EventStatus.java:19-22. */
sealed abstract class EventStatus(val name: String)
object EventStatus {
  case object Success extends EventStatus("SUCCESS")
  case object Fail extends EventStatus("FAIL")
}

/** Classification of how a query executed.
  * Reference: logger/ExecutionMode.java:23-31. */
sealed abstract class ExecutionMode(val name: String)
object ExecutionMode {
  case object None_ extends ExecutionMode("NONE")
  case object Llap extends ExecutionMode("LLAP")
  case object Mr extends ExecutionMode("MR")
  case object Tez extends ExecutionMode("TEZ")
  case object Spark_ extends ExecutionMode("SPARK")
  case object Ddl extends ExecutionMode("DDL")
  case object ClientOnly extends ExecutionMode("CLIENT_ONLY")
  val values: Seq[ExecutionMode] =
    Seq(None_, Llap, Mr, Tez, Spark_, Ddl, ClientOnly)
}

/** One query-lifecycle event. Field names and order follow the reference's
  * `avro/QueryEvents.avsc:1-288` exactly (33 fields, all nullable, arrays
  * default empty). Two logical subtypes share this one physical schema,
  * discriminated by `EventType` (reference EventRecordConstructor.java:80-92):
  * QUERY_SUBMITTED populates the pre-exec fields, QUERY_COMPLETED the
  * post-exec ones.
  */
case class QueryEvent(
    QueryId: Option[String] = None,
    QueryType: Option[String] = None,
    QueryText: Option[String] = None,
    EventType: Option[String] = None,
    ExecutionMode: Option[String] = None,
    ExecutionEngine: Option[String] = None,
    RequestUser: Option[String] = None,
    UserName: Option[String] = None,
    Queue: Option[String] = None,
    OperationId: Option[String] = None,
    StartTime: Option[Timestamp] = None,
    EndTime: Option[Timestamp] = None,
    TablesRead: Seq[String] = Nil,
    TablesWritten: Seq[String] = Nil,
    PartitionsRead: Seq[String] = Nil,
    PartitionsWritten: Seq[String] = Nil,
    Status: Option[String] = None,
    ErrorMessage: Option[String] = None,
    PerfObject: Option[String] = None,
    CountersObject: Option[String] = None,
    SessionId: Option[String] = None,
    InvokerInfo: Option[String] = None,
    ThreadName: Option[String] = None,
    HookVersion: Option[String] = Some(QueryEvent.HookVersion),
    HiveVersion: Option[String] = None,
    ClientIpAddress: Option[String] = None,
    HiveAddress: Option[String] = None,
    HiveHostName: Option[String] = None,
    HiveInstanceType: Option[String] = None,
    YarnApplicationId: Option[String] = None,
    DatabasesRead: Seq[String] = Nil,
    DatabasesWritten: Seq[String] = Nil,
    DefaultDatabase: Option[String] = None
)

object QueryEvent {
  /** Reference: logger/LoggingHookConstants.java:27. */
  val HookVersion = "1.0"

  private def s(n: String) = StructField(n, StringType, nullable = true)
  private def ts(n: String) = StructField(n, TimestampType, nullable = true)
  private def arr(n: String) =
    StructField(n, ArrayType(StringType, containsNull = false), nullable = true)

  /** Spark StructType mirroring `QueryEvents.avsc` field-for-field (§1.2 of
    * SURVEY.md). Timestamps are millis-precision epoch instants (UTC). */
  val schema: StructType = StructType(
    Seq(
      s("QueryId"), s("QueryType"), s("QueryText"), s("EventType"),
      s("ExecutionMode"), s("ExecutionEngine"), s("RequestUser"), s("UserName"),
      s("Queue"), s("OperationId"), ts("StartTime"), ts("EndTime"),
      arr("TablesRead"), arr("TablesWritten"), arr("PartitionsRead"),
      arr("PartitionsWritten"), s("Status"), s("ErrorMessage"), s("PerfObject"),
      s("CountersObject"), s("SessionId"), s("InvokerInfo"), s("ThreadName"),
      s("HookVersion"), s("HiveVersion"), s("ClientIpAddress"), s("HiveAddress"),
      s("HiveHostName"), s("HiveInstanceType"), s("YarnApplicationId"),
      arr("DatabasesRead"), arr("DatabasesWritten"), s("DefaultDatabase")
    )
  )
}
