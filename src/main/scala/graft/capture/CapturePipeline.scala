package graft.capture

import graft.model.QueryEvent

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch/streaming-agnostic pipeline from a raw hook-event DataFrame to the
  * 33-column `QueryEvent` log (SURVEY.md §2.1 O4/O5 projections plus the O20
  * enrichment join).
  *
  * Expected input schema (one row per hook firing — the Spark-side analog of
  * the reference's `HookContext`, see testing fixtures):
  *
  * {{{
  * hookType: string            // PRE | POST | FAILURE
  * queryId, queryText, queryType, operationId, sessionId, threadName,
  * hiveVersion, clientIp, hiveInstanceAddress, defaultDatabase,
  * errorMessage: string
  * userName, ugiUserName: string
  * isHs2: boolean
  * startTimeMs, endTimeMs: long      // epoch millis
  * executionEngine: string
  * entities: array<struct<type:string, name:string>>
  * tasks:    array<struct<engine:string, llap:boolean, ddl:boolean>>
  * conf:     map<string,string>
  * perf:     map<string,long>
  * tezCounters, mrCounters: array<array<map<string,map<string,long>>>>
  * jobIds:   array<string>
  * }}}
  *
  * The whole thing is a narrow projection (no shuffle): at 100 TB/day of hook
  * events this runs as a single map stage; the only wide operation in the
  * capture path is the optional YARN-dimension join, which is broadcast.
  */
object CapturePipeline {

  import CaptureOps._

  private def msToTs(c: Column): Column = timestamp_millis(c)
  private val nullStr = lit(null).cast("string")
  private val emptyArr = array().cast("array<string>")

  /** O4 — pre-execution projection (QUERY_SUBMITTED).
    * Reference: EventRecordConstructor.java:94-132. */
  def submittedEvents(raw: DataFrame, localHost: String = "localhost"): DataFrame =
    raw
      .filter(col("hookType") === "PRE")
      .filter(col("queryId").isNotNull) // O3 null-plan filter (EventLogger.java:138-142)
      .filter(supportedVersion(col("hiveVersion"))) // O2 gate
      .select(
        col("queryId").as("QueryId"),
        col("queryType").as("QueryType"),
        col("queryText").as("QueryText"),
        lit("QUERY_SUBMITTED").as("EventType"),
        executionMode(col("tasks")).as("ExecutionMode"),
        col("executionEngine").as("ExecutionEngine"),
        requestUser(col("userName"), col("ugiUserName")).as("RequestUser"),
        col("ugiUserName").as("UserName"),
        queueName(executionMode(col("tasks")), col("conf")).as("Queue"),
        col("operationId").as("OperationId"),
        msToTs(col("startTimeMs")).as("StartTime"),
        lit(null).cast("timestamp").as("EndTime"),
        entityNames(col("entities"), "TABLE").as("TablesRead"),
        emptyArr.as("TablesWritten"),
        entityNames(col("entities"), "PARTITION").as("PartitionsRead"),
        emptyArr.as("PartitionsWritten"),
        nullStr.as("Status"),
        nullStr.as("ErrorMessage"),
        nullStr.as("PerfObject"),
        nullStr.as("CountersObject"),
        col("sessionId").as("SessionId"),
        col("sessionId").as("InvokerInfo"),
        col("threadName").as("ThreadName"),
        lit(QueryEvent.HookVersion).as("HookVersion"),
        col("hiveVersion").as("HiveVersion"),
        col("clientIp").as("ClientIpAddress"),
        hiveAddress(col("hiveInstanceAddress"), localHost).as("HiveAddress"),
        nullStr.as("HiveHostName"),
        hiveInstanceType(col("isHs2")).as("HiveInstanceType"),
        nullStr.as("YarnApplicationId"),
        entityNames(col("entities"), "DATABASE").as("DatabasesRead"),
        emptyArr.as("DatabasesWritten"),
        col("defaultDatabase").as("DefaultDatabase")
      )

  /** O5 — post-execution projection (QUERY_COMPLETED), covering both POST
    * (success) and FAILURE hooks.
    * Reference: EventRecordConstructor.java:134-172. */
  def completedEvents(raw: DataFrame): DataFrame =
    raw
      .filter(col("hookType").isin("POST", "FAILURE"))
      .filter(col("queryId").isNotNull) // O3
      .filter(supportedVersion(col("hiveVersion")))
      .select(
        col("queryId").as("QueryId"),
        nullStr.as("QueryType"),
        nullStr.as("QueryText"),
        lit("QUERY_COMPLETED").as("EventType"),
        executionMode(col("tasks")).as("ExecutionMode"),
        nullStr.as("ExecutionEngine"),
        requestUser(col("userName"), col("ugiUserName")).as("RequestUser"),
        col("ugiUserName").as("UserName"),
        nullStr.as("Queue"),
        col("operationId").as("OperationId"),
        msToTs(col("startTimeMs")).as("StartTime"),
        msToTs(col("endTimeMs")).as("EndTime"),
        emptyArr.as("TablesRead"),
        emptyArr.as("TablesWritten"),
        emptyArr.as("PartitionsRead"),
        emptyArr.as("PartitionsWritten"),
        status(col("hookType") === "POST").as("Status"),
        col("errorMessage").as("ErrorMessage"),
        perfJson(col("perf"), col("startTimeMs"), col("endTimeMs"))
          .as("PerfObject"),
        countersPrecedence( // O17
          countersJson(col("tezCounters")),
          countersJson(col("mrCounters"))
        ).as("CountersObject"),
        col("sessionId").as("SessionId"),
        col("sessionId").as("InvokerInfo"),
        col("threadName").as("ThreadName"),
        lit(QueryEvent.HookVersion).as("HookVersion"),
        col("hiveVersion").as("HiveVersion"),
        nullStr.as("ClientIpAddress"),
        nullStr.as("HiveAddress"),
        nullStr.as("HiveHostName"),
        nullStr.as("HiveInstanceType"),
        yarnApplicationId(try_element_at(col("jobIds"), lit(1))) // O18: first job id
          .as("YarnApplicationId"),
        emptyArr.as("DatabasesRead"),
        emptyArr.as("DatabasesWritten"),
        nullStr.as("DefaultDatabase")
      )

  /** Full capture pipeline: both projections unioned into one event log. */
  def events(raw: DataFrame, localHost: String = "localhost"): DataFrame =
    submittedEvents(raw, localHost).unionByName(completedEvents(raw))

  /** O20 — YARN enrichment as a broadcast dimension join (NOT the reference's
    * per-event ResourceManager RPC, its biggest scalability anti-pattern —
    * SURVEY.md §3 E3). `apps` is `(YarnApplicationId, host, queue)`; on a
    * match, Queue and HiveHostName are overwritten.
    * Reference: YarnApplicationRetriever.java:38-50 applied at
    * EventRecordConstructor.java:153-164. */
  def withYarnEnrichment(events: DataFrame, apps: DataFrame): DataFrame = {
    val dim = broadcast(
      apps.select(
        col("YarnApplicationId"),
        col("host").as("__yarn_host"),
        col("queue").as("__yarn_queue")
      )
    )
    events
      .join(dim, Seq("YarnApplicationId"), "left")
      .withColumn("Queue", coalesce(col("__yarn_queue"), col("Queue")))
      .withColumn("HiveHostName", coalesce(col("__yarn_host"), col("HiveHostName")))
      .drop("__yarn_host", "__yarn_queue")
      .select(graft.model.QueryEvent.schema.fieldNames.toIndexedSeq.map(col): _*)
  }
}
