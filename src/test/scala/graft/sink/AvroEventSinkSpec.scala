package graft.sink

import java.io.File
import java.nio.file.Files
import java.sql.Timestamp

import graft.TestSpark
import graft.model.QueryEvent

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level Avro container output: reference layout + round-trip goldens
  * (reference RecordsWriterTest.java:94-106,
  * DatePartitionedRecordsWriterFactoryTest.java:100-165). */
class AvroEventSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("avro schema mirrors all 33 QueryEvents fields") {
    val s = AvroEventSink.avroSchema
    assert(s.getName == "QueryEvents")
    assert(s.getFields.size() == 33)
    assert(QueryEvent.schema.fieldNames.forall(n => s.getField(n) != null))
  }

  test("write + read-back: reference dir layout, file names, values") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_avro").toString
    val events = Seq(
      QueryEvent(QueryId = Some("q1"), EventType = Some("QUERY_COMPLETED"),
        StartTime = Some(new Timestamp(1671969621334L)),
        EndTime = Some(new Timestamp(1671969622334L)),
        Status = Some("SUCCESS"), TablesRead = Seq("db@t1", "db@t2")),
      QueryEvent(QueryId = Some("q2"), EventType = Some("QUERY_COMPLETED"),
        EndTime = Some(new Timestamp(1671969622334L + 86400000L)),
        Status = Some("FAIL"))
    ).toDF()
    AvroEventSink.write(events, base, "a665f132ab", 1671969622334L)
    // reference layout: bare date dirs, dwhassessment_ files
    val dirs = new File(base).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("2022-12-25", "2022-12-26"))
    val files = new File(s"$base/2022-12-25").listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.nonEmpty && files.forall(
      _.getName.matches("dwhassessment_2022-12-25T120022\\.334_a665f132ab_\\d+\\.avro")))
    // round-trip values through the raw Avro reader
    val recs = new File(base).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".avro"))
      .flatMap(AvroEventSink.readRecords)
    assert(recs.length == 2)
    val byId = recs.map(r => r.get("QueryId").toString -> r).toMap
    assert(byId("q1").get("Status").toString == "SUCCESS")
    assert(byId("q1").get("EndTime") == 1671969622334L)
    assert(byId("q1").get("TablesRead").toString.contains("db@t1"))
    assert(byId("q2").get("StartTime") == null)
  }
}
