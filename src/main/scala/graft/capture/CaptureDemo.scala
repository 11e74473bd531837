package graft.capture

import graft.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checkable exercise of the capture operators (SURVEY.md §2.1) over
  * the driver's `events` table: each event row is deterministically mapped to
  * a synthetic hook context (version string, task DAG, conf map, job ids,
  * session id), then pushed through the real `CaptureOps` column functions —
  * so the DuckDB oracle checks O2 (version gate), O9 (mode classifier), O11
  * (queue lookup), O12 (request-user coalesce), O14 (instance type), and the
  * full O19 dispatch (MR job-id parse incl. skip-malformed, TEZ
  * session-snapshot join, LLAP registry join) end-to-end on 10k+ rows,
  * complementing the golden-record unit tests.
  */
object CaptureDemo {

  import CaptureOps._

  def capPipeline(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val task = (engine: String, llap: Boolean, ddl: Boolean) =>
      array(struct(
        lit(engine).as("engine"), lit(llap).as("llap"), lit(ddl).as("ddl")))
    val tasks = when(col("event_type") === "signup", array().cast(
        "array<struct<engine:string,llap:boolean,ddl:boolean>>"))
      .when(col("event_type") === "click", task("TEZ", false, false))
      .when(col("event_type") === "view", task("MR", false, false))
      .when(col("event_type") === "purchase" && col("user_id") % 3 === 0,
        task("TEZ", true, false)) // LLAP: tez task with llap daemons
      .when(col("event_type") === "purchase", task("SPARK", false, false))
      .otherwise(task("OTHER", false, true)) // error → DDL task
    val conf = typedLit(Map(
      "tez.queue.name" -> "tezq",
      "mapreduce.job.queuename" -> "mrq",
      "hive.llap.daemon.queue.name" -> "llapq",
      CapturePipeline.LlapServiceHostsKey -> "@llap0"))
    val raw = e.select(
      col("event_id"), col("user_id"), col("ts"),
      concat(lit("2."), (col("user_id") % 10).cast("string"), lit(".0"))
        .as("hive_version"),
      // first entry malformed on purpose: O19's MR arm must skip it
      array(lit("job_malformed"),
        when(col("user_id") % 5 === 0, concat(lit("badjob_"), col("event_id")))
          .otherwise(concat(lit("job_"), unix_millis(col("ts")).cast("string"),
            lit("_"), col("event_id")))).as("job_ids"),
      concat(lit("s"), (col("user_id") % 100).cast("string")).as("session_id"),
      when(col("user_id") % 7 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("u"), col("user_id"))).as("user_name"),
      lit("svc").as("ugi_user"),
      (col("user_id") % 2 === 0).as("is_hs2"),
      tasks.as("tasks"))
    // O19 dimension snapshots: Tez sessions (session → app master) and the
    // LLAP registry (service hosts → long-lived daemon app). Both tiny →
    // broadcast hash joins.
    val tezDim = e.select(
      concat(lit("s"), (col("user_id") % 100).cast("string")).as("sessionId"),
      concat(lit("application_9000_"), (col("user_id") % 100).cast("string"))
        .as("tez_app")).distinct()
    val llapDim = s.range(1).select(
      lit("@llap0").as("hosts"), lit("application_llap_0").as("llap_app"))
    val mode = executionMode(col("tasks"))
    raw
      .filter(supportedVersion(col("hive_version"))) // O2 gate
      .join(broadcast(tezDim), col("session_id") === col("sessionId"), "left")
      .join(broadcast(llapDim),
        element_at(conf, CapturePipeline.LlapServiceHostsKey) === col("hosts"),
        "left")
      .select(
        col("event_id"),
        mode.as("exec_mode"),
        queueName(mode, conf).as("queue"),
        requestUser(col("user_name"), col("ugi_user")).as("request_user"),
        hiveInstanceType(col("is_hs2")).as("instance_type"),
        determineApplicationId(mode, col("job_ids"),
          col("tez_app"), col("llap_app")).as("yarn_app_id"))
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("cap_pipeline" -> capPipeline)

  val oracles: Map[String, String] = Map(
    "cap_pipeline" ->
      """SELECT event_id,
        |CASE WHEN event_type = 'signup' THEN 'CLIENT_ONLY'
        |  WHEN event_type = 'click' THEN 'TEZ'
        |  WHEN event_type = 'view' THEN 'MR'
        |  WHEN event_type = 'purchase' THEN
        |    (CASE WHEN user_id % 3 = 0 THEN 'LLAP' ELSE 'SPARK' END)
        |  ELSE 'DDL' END AS exec_mode,
        |CASE WHEN event_type = 'click' THEN 'tezq'
        |  WHEN event_type = 'view' THEN 'mrq'
        |  WHEN event_type = 'purchase' AND user_id % 3 = 0 THEN 'llapq'
        |  ELSE NULL END AS queue,
        |COALESCE(CASE WHEN user_id % 7 = 0 THEN NULL
        |  ELSE 'u' || CAST(user_id AS VARCHAR) END, 'svc') AS request_user,
        |CASE WHEN user_id % 2 = 0 THEN 'HS2' ELSE 'CLI' END AS instance_type,
        |CASE WHEN event_type = 'view' THEN
        |    (CASE WHEN user_id % 5 = 0 THEN NULL
        |     ELSE 'application_' || CAST(epoch_ms(ts) AS VARCHAR) || '_' || CAST(event_id AS VARCHAR) END)
        |  WHEN event_type = 'click' THEN 'application_9000_' || CAST(user_id % 100 AS VARCHAR)
        |  WHEN event_type = 'purchase' AND user_id % 3 = 0 THEN 'application_llap_0'
        |  ELSE NULL END AS yarn_app_id
        |FROM events WHERE (user_id % 10) >= 2 ORDER BY event_id""".stripMargin
  )
}
