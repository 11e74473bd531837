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

  /** Conf key the reference reads for the LLAP service registry
    * (HiveConf.ConfVars.LLAP_DAEMON_SERVICE_HOSTS,
    * ApplicationIdRetriever.java:106). */
  val LlapServiceHostsKey = "hive.llap.daemon.service.hosts"

  /** O19 — attach the TEZ/LLAP application-id columns via broadcast
    * dimension joins (the Spark-native stand-in for the reference's live
    * SessionState / LlapRegistryService lookups,
    * ApplicationIdRetriever.java:58-72,100-120):
    *  - `tezSessions(sessionId, YarnApplicationId)` — one row per live Tez
    *    session (a session always maps to one app; queue changes recreate
    *    the app, hence the snapshot is keyed by session);
    *  - `llapApps(serviceHosts, YarnApplicationId)` — one row per LLAP
    *    service-hosts registry entry, matched against the event's
    *    `conf[hive.llap.daemon.service.hosts]` (no hosts configured → no
    *    match → null, the reference's no-registry branch).
    * Both dims are O(live sessions/clusters) — tiny — so the join is a
    * broadcast hash join and the capture path stays shuffle-free. */
  private def withAppIdDims(raw: DataFrame,
                            tezSessions: Option[DataFrame],
                            llapApps: Option[DataFrame]): DataFrame = {
    val withTez = tezSessions match {
      case Some(dim) =>
        raw.join(
          broadcast(dim.select(col("sessionId").as("__tez_sid"),
            col("YarnApplicationId").as("__tezAppId"))),
          col("sessionId") === col("__tez_sid"), "left")
          .drop("__tez_sid")
      case None => raw.withColumn("__tezAppId", nullStr)
    }
    llapApps match {
      case Some(dim) =>
        withTez.join(
          broadcast(dim.select(col("serviceHosts").as("__llap_hosts"),
            col("YarnApplicationId").as("__llapAppId"))),
          // try_element_at: events without the LLAP hosts key simply miss
          // the dim (left join NULL); element_at throws under ANSI mode
          try_element_at(col("conf"), lit(LlapServiceHostsKey)) === col("__llap_hosts"),
          "left")
          .drop("__llap_hosts")
      case None => withTez.withColumn("__llapAppId", nullStr)
    }
  }

  /** O5 — post-execution projection (QUERY_COMPLETED), covering both POST
    * (success) and FAILURE hooks; O19 app-id dispatch by execution mode.
    * Reference: EventRecordConstructor.java:134-172. */
  def completedEvents(raw: DataFrame,
                      tezSessions: Option[DataFrame] = None,
                      llapApps: Option[DataFrame] = None): DataFrame =
    withAppIdDims(raw, tezSessions, llapApps)
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
        determineApplicationId( // O19 three-way dispatch; O18 inside the MR arm
          executionMode(col("tasks")), col("jobIds"),
          col("__tezAppId"), col("__llapAppId")
        ).as("YarnApplicationId"),
        emptyArr.as("DatabasesRead"),
        emptyArr.as("DatabasesWritten"),
        nullStr.as("DefaultDatabase")
      )

  /** Full capture pipeline: both projections unioned into one event log. */
  def events(raw: DataFrame, localHost: String = "localhost",
             tezSessions: Option[DataFrame] = None,
             llapApps: Option[DataFrame] = None): DataFrame =
    submittedEvents(raw, localHost)
      .unionByName(completedEvents(raw, tezSessions, llapApps))

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
