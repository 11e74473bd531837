package graft.capture

import graft.TestSpark
import graft.model.QueryEvent

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end pipeline tests against the reference's golden pre/post records
  * (FIXTURES.md §A, transcribed from testing/TestUtils.java:136-171). */
class CapturePipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val rawSchema = CaptureSource.rawSchema

  private def mkRaw(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), rawSchema)

  private def preRow = Row(
    "PRE", "hive_query_id_999", "SELECT * FROM employees", "QUERY",
    "test_op_id", "test_session_id", "test_thread_id", "2.2.0",
    "192.168.10.10", "hive_addr", "default", null,
    "test_user", "os_user", true, 1234L, 0L, "mr",
    Seq(Row("TABLE", "dbName@employees"), Row("DATABASE", "dbName")),
    Seq.empty, Map.empty, Map.empty, null, null, Seq.empty)

  private def postRow = Row(
    "POST", "hive_query_id_999", null, null,
    "test_op_id", "test_session_id", "test_thread_id", "2.2.0",
    null, null, null, null,
    "test_user", "os_user", true, 1234L, 9999L, "mr",
    Seq.empty, Seq(Row("MR", false, false)), Map.empty, Map("RUN" -> 40L),
    null, null, Seq("job_1685098059769_1951"))

  test("pre event golden (TestUtils.java:136-157)") {
    val out = CapturePipeline.events(mkRaw(Seq(preRow)))
    assert(out.columns.toSeq == QueryEvent.schema.fieldNames.toSeq)
    val r = out.collect().head
    def f(n: String) = r.get(r.fieldIndex(n))
    assert(f("QueryId") == "hive_query_id_999")
    assert(f("EventType") == "QUERY_SUBMITTED")
    assert(f("ExecutionMode") == "CLIENT_ONLY") // no tasks
    assert(f("QueryText") == "SELECT * FROM employees")
    assert(f("RequestUser") == "test_user")
    assert(f("UserName") == "os_user")
    assert(f("HiveInstanceType") == "HS2")
    assert(f("HookVersion") == "1.0")
    assert(r.getAs[java.sql.Timestamp]("StartTime").getTime == 1234L)
    assert(f("EndTime") == null && f("Status") == null)
    assert(r.getAs[Seq[String]]("TablesRead").toList == List("dbName@employees"))
    assert(r.getAs[Seq[String]]("DatabasesRead").toList == List("dbName"))
    assert(f("DefaultDatabase") == "default")
  }

  test("post event golden incl. status/app-id/perf (TestUtils.java:159-171)") {
    val out = CapturePipeline.events(mkRaw(Seq(postRow)))
    val r = out.collect().head
    def f(n: String) = r.get(r.fieldIndex(n))
    assert(f("EventType") == "QUERY_COMPLETED")
    assert(f("Status") == "SUCCESS")
    assert(r.getAs[java.sql.Timestamp]("EndTime").getTime == 9999L)
    assert(f("YarnApplicationId") == "application_1685098059769_1951")
    assert(f("PerfObject") == """{"RUN":40}""")
    assert(f("QueryText") == null) // post leaves pre-only fields null
  }

  test("FAILURE hook → Status FAIL; unsupported version filtered (O2)") {
    val fail = Row(
      "FAILURE", "q2", null, null, null, null, null, "2.2.0",
      null, null, null, "boom", "u", "u", false, 1L, 2L, "mr",
      Seq.empty, Seq.empty, Map.empty, Map.empty, null, null, Seq.empty)
    val old = Row(
      "PRE", "q3", "SELECT 1", "QUERY", null, null, null, "2.1.0",
      null, null, null, null, "u", "u", false, 1L, 0L, "mr",
      Seq.empty, Seq.empty, Map.empty, Map.empty, null, null, Seq.empty)
    val out = CapturePipeline.events(mkRaw(Seq(fail, old))).collect()
    assert(out.length == 1) // 2.1.0 dropped by the version gate
    val r = out.head
    assert(r.getAs[String]("Status") == "FAIL" &&
      r.getAs[String]("ErrorMessage") == "boom")
  }

  test("O19 app id dispatches by mode: MR parse / TEZ session / LLAP registry") {
    import spark.implicits._
    def rowWith(qid: String, tasks: Seq[Row], conf: Map[String, String],
                jobIds: Seq[String], session: String) = Row(
      "POST", qid, null, null, null, session, null, "2.2.0",
      null, null, null, null, "u", "u", false, 1L, 2L, "mr",
      Seq.empty, tasks, conf, Map.empty[String, Long], null, null, jobIds)
    val rows = Seq(
      rowWith("qmr", Seq(Row("MR", false, false)), Map.empty,
        Seq("job_malformed", "job_1_2"), "s1"),
      rowWith("qtez", Seq(Row("TEZ", false, false)), Map.empty,
        Seq("job_1_3"), "s1"),
      rowWith("qllap", Seq(Row("TEZ", true, false)),
        Map(CapturePipeline.LlapServiceHostsKey -> "@llap0"), Seq.empty, "s2"),
      rowWith("qclient", Seq.empty, Map.empty, Seq("job_1_4"), "s3"))
    val tezDim = Seq(("s1", "application_tez_1"))
      .toDF("sessionId", "YarnApplicationId")
    val llapDim = Seq(("@llap0", "application_llap_9"))
      .toDF("serviceHosts", "YarnApplicationId")
    val out = CapturePipeline
      .completedEvents(mkRaw(rows), Some(tezDim), Some(llapDim))
      .select("QueryId", "YarnApplicationId").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out == Map(
      "qmr" -> Some("application_1_2"), // first VALID id; malformed skipped
      "qtez" -> Some("application_tez_1"), // session snapshot, not job parse
      "qllap" -> Some("application_llap_9"), // registry keyed by conf hosts
      "qclient" -> None)) // CLIENT_ONLY → Optional.empty
    // dims must broadcast — the capture path stays shuffle-free
    val plan = CapturePipeline
      .completedEvents(mkRaw(rows), Some(tezDim), Some(llapDim))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("O20 yarn enrichment overwrites queue/host via broadcast join") {
    import spark.implicits._
    val events = CapturePipeline.events(mkRaw(Seq(postRow)))
    val apps = Seq(("application_1685098059769_1951", "test_host", "test_queue"))
      .toDF("YarnApplicationId", "host", "queue")
    val enriched = CapturePipeline.withYarnEnrichment(events, apps)
    assert(enriched.columns.toSeq == QueryEvent.schema.fieldNames.toSeq)
    val r = enriched.collect().head
    assert(r.getAs[String]("Queue") == "test_queue")
    assert(r.getAs[String]("HiveHostName") == "test_host")
    // and the plan actually broadcasts the dimension
    val plan = enriched.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }
}
