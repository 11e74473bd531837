package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Full-loop integration: raw hook events → capture pipeline → partitioned
  * sink → read-back → assessment aggregates. The composition the reference
  * implements as hook + writer + (implied) downstream assessment, run end to
  * end through every graft layer (SURVEY.md §7.2's "minimum end-to-end
  * slice", widened).
  */
class E2ESpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("capture -> sink -> read -> assess round trip") {
    // Synthesize raw hook events from the events table: one PRE + one POST
    // per source row, deterministic ids/times.
    val e = Tables.events(spark, TestSpark.Sf0001).limit(200)
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ms"))
    def common = Seq(
      expr("concat('q', event_id) as queryId"),
      expr("'SELECT 1' as queryText"), expr("'QUERY' as queryType"),
      expr("cast(null as string) as operationId"),
      expr("concat('sess', user_id) as sessionId"),
      expr("'thread-1' as threadName"), expr("'3.1.3' as hiveVersion"),
      expr("cast(null as string) as clientIp"),
      expr("cast(null as string) as hiveInstanceAddress"),
      expr("'default' as defaultDatabase"),
      expr("cast(null as string) as errorMessage"),
      expr("concat('u', user_id) as userName"), expr("'svc' as ugiUserName"),
      expr("true as isHs2"), expr("ms as startTimeMs"),
      expr("'tez' as executionEngine"),
      expr("array(named_struct('type','TABLE','name','db@t1')) as entities"),
      expr("array(named_struct('engine','TEZ','llap',false,'ddl',false)) as tasks"),
      expr("map('tez.queue.name','etl') as conf"),
      expr("map('RUN', cast(5 as long)) as perf"),
      expr("cast(null as array<array<map<string,map<string,bigint>>>>) as tezCounters"),
      expr("cast(null as array<array<map<string,map<string,bigint>>>>) as mrCounters"),
      expr("array(concat('job_12345_', event_id)) as jobIds"))
    val pre = e.select(Seq(expr("'PRE' as hookType"),
      expr("cast(0 as long) as endTimeMs")) ++ common: _*)
    val post = e.select(Seq(expr("'POST' as hookType"),
      expr("ms + 1000 + event_id % 5000 as endTimeMs")) ++ common: _*)
    val raw = pre.unionByName(post)

    // capture — TEZ mode resolves the app id via the session-snapshot dim
    // (O19), not the MR job-id parse
    val tezSessions = e.select(
      expr("concat('sess', user_id) as sessionId"),
      expr("concat('application_tez_', user_id) as YarnApplicationId"))
      .distinct()
    val events = capture.CapturePipeline.events(raw,
      tezSessions = Some(tezSessions))
    assert(events.columns.toSeq == model.QueryEvent.schema.fieldNames.toSeq)

    // sink + read-back
    val dir = Files.createTempDirectory("graft_e2e").toString
    sink.EventSink.writeBatch(events, dir)
    val log = sink.EventSink.read(spark, dir)
    assert(log.count() == 400) // 200 SUBMITTED + 200 COMPLETED

    // assess: pair lifecycle events, per-queue duration stats (A1 + A2)
    val sub = log.filter(col("EventType") === "QUERY_SUBMITTED")
      .select(col("QueryId"), col("Queue"))
    val fin = log.filter(col("EventType") === "QUERY_COMPLETED")
      .select(col("QueryId"),
        (unix_millis(col("EndTime")) - unix_millis(col("StartTime"))).as("dur"))
    val stats = sub.join(fin, Seq("QueryId"))
      .groupBy("Queue")
      .agg(count(lit(1)).as("n"), min("dur").as("min_dur"), max("dur").as("max_dur"))
      .collect()
    assert(stats.length == 1)
    val r = stats.head
    assert(r.getAs[String]("Queue") == "etl") // O11 queue via TEZ conf key
    assert(r.getAs[Long]("n") == 200)
    assert(r.getAs[Long]("min_dur") >= 1000 && r.getAs[Long]("max_dur") < 6000)

    // and the completed events carry the session-dispatched app id (O19)
    val apps = log.filter(col("EventType") === "QUERY_COMPLETED")
      .select("YarnApplicationId").distinct().collect().map(_.getString(0))
    assert(apps.nonEmpty && apps.forall(
      a => a != null && a.startsWith("application_tez_")))
  }
}
