package graft.capture

import graft.TestSpark

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JSON-lines ingestion (O1 file path) and schema-evolution read. */
class CaptureSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("json-lines ingest parses events and quarantines corrupt lines") {
    val dir = Files.createTempDirectory("graft_jsonl")
    val lines = Seq(
      """{"hookType":"PRE","queryId":"q1","hiveVersion":"3.1.3","startTimeMs":1234,"isHs2":true,"tasks":[{"engine":"TEZ","llap":false,"ddl":false}],"conf":{"tez.queue.name":"etl"}}""",
      """{"hookType":"POST","queryId":"q1","hiveVersion":"3.1.3","startTimeMs":1234,"endTimeMs":2345,"jobIds":["job_1_1"]}""",
      """this is not json at all{{{"""
    )
    Files.write(Paths.get(dir.toString, "events.jsonl"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val (events, corrupt) = CaptureSource.fromJsonLines(spark, dir.toString)
    assert(events.count() == 2)
    assert(events.schema == CaptureSource.rawSchema)
    assert(corrupt.count() == 1)
    assert(corrupt.head().getString(0).startsWith("this is not json"))
    // parsed events flow straight into the capture pipeline
    val out = CapturePipeline.events(events)
    assert(out.count() == 2)
    val pre = out.filter(col("EventType") === "QUERY_SUBMITTED").head()
    assert(pre.getAs[String]("Queue") == "etl") // O11 via parsed conf map
  }

  test("readAsEvents applies avro-default evolution to old logs") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evo").toString
    // an "old hook version" log: only 4 of the 33 columns
    Seq(("q1", "QUERY_COMPLETED", "SUCCESS", "u1"))
      .toDF("QueryId", "EventType", "Status", "RequestUser")
      .write.mode("overwrite").parquet(dir)
    val full = graft.sink.EventSink.readAsEvents(spark, dir)
    assert(full.columns.toSeq ==
      graft.model.QueryEvent.schema.fieldNames.toSeq)
    val r = full.head()
    assert(r.getAs[String]("QueryId") == "q1")
    assert(r.getAs[String]("Status") == "SUCCESS")
    // absent scalars → null; absent arrays → [] (QueryEvents.avsc defaults)
    assert(r.isNullAt(r.fieldIndex("QueryText")))
    assert(r.getSeq[String](r.fieldIndex("TablesRead")).isEmpty)
    assert(r.isNullAt(r.fieldIndex("StartTime")))
  }
}
