package graft.capture

import graft.TestSpark

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the per-operator column functions, pinned to the
  * reference's own test vectors (FIXTURES.md §A; reference
  * javatests/.../EventRecordConstructorTest.java,
  * VersionValidatorTest.java, ApplicationIdRetrieverTest.java).
  */
class CaptureOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def evalStr(c: org.apache.spark.sql.Column): Row =
    spark.range(1).select(c).head()

  test("O2 supported versions (VersionValidatorTest.java:118-138)") {
    val supported = Seq("2.2.0", "2.3.8", "2.3", "3.1.3")
    val rejected = Seq("2.1.9", "1.1.2", "4.0.0", "unexpected", "5", "3.abc1")
    val got = (supported ++ rejected).toDF("v")
      .select($"v", CaptureOps.supportedVersion($"v").as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    supported.foreach(v => assert(got(v), s"$v should be supported"))
    rejected.foreach(v => assert(!got(v), s"$v should be rejected"))
  }

  test("O6/O7 entity extraction + dedupe (EventRecordConstructorTest.java:115-148)") {
    val df = Seq(
      (Seq(("PARTITION", "dbName@tableName@continent=Europe"),
        ("PARTITION", "dbName@tableName@continent=Asia"),
        ("PARTITION", "dbName@tableName@continent=Europe"), // dupe dropped
        ("TABLE", "dbName@tableName")))
    ).toDF("raw")
      .select(transform($"raw",
        e => struct(e.getField("_1").as("type"), e.getField("_2").as("name")))
        .as("entities"))
    val row = df.select(
      CaptureOps.entityNames($"entities", "PARTITION").as("parts"),
      CaptureOps.entityNames($"entities", "TABLE").as("tables")).head()
    assert(row.getSeq[String](0) ==
      Seq("dbName@tableName@continent=Europe", "dbName@tableName@continent=Asia"))
    assert(row.getSeq[String](1) == Seq("dbName@tableName"))
  }

  test("O9 execution-mode precedence (EventRecordConstructorTest.java:150-175)") {
    val cases = Seq(
      (Seq.empty[(String, Boolean, Boolean)], "CLIENT_ONLY"),
      (Seq(("TEZ", false, false)), "TEZ"),
      (Seq(("TEZ", true, false)), "LLAP"),
      (Seq(("TEZ", false, false), ("TEZ", true, false)), "LLAP"), // any llap wins
      (Seq(("MR", false, false)), "MR"),
      (Seq(("OTHER", false, true)), "DDL"),
      (Seq(("SPARK", false, false)), "SPARK"),
      (Seq(("OTHER", false, false)), "NONE"), // copy-only
      (Seq(("TEZ", false, false), ("MR", false, false)), "TEZ") // precedence
    )
    cases.zipWithIndex.foreach { case ((tasks, want), i) =>
      val df = Seq(tasks).toDF("raw")
        .select(transform($"raw", t => struct(
          t.getField("_1").as("engine"), t.getField("_2").as("llap"),
          t.getField("_3").as("ddl"))).as("tasks"))
      val got = df.select(CaptureOps.executionMode($"tasks")).head().getString(0)
      assert(got == want, s"case $i: tasks=$tasks")
    }
  }

  test("O11 queue lookup per mode (LoggerVarsConfig.java:22-24)") {
    val conf = typedLit(Map(
      "hive.llap.daemon.queue.name" -> "lq",
      "mapreduce.job.queuename" -> "mq",
      "tez.queue.name" -> "tq"))
    val got = Seq("LLAP", "MR", "TEZ", "NONE", "CLIENT_ONLY").toDF("m")
      .select($"m", CaptureOps.queueName($"m", conf).as("q"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("LLAP").contains("lq") && got("MR").contains("mq") &&
      got("TEZ").contains("tq") && got("NONE").isEmpty && got("CLIENT_ONLY").isEmpty)
  }

  test("O12/O13/O14 coalesces and instance type") {
    val r = evalStr(struct(
      CaptureOps.requestUser(lit(null).cast("string"), lit("ugi")),
      CaptureOps.requestUser(lit("u1"), lit("ugi")),
      CaptureOps.hiveAddress(lit(null).cast("string"), "127.0.0.1"),
      CaptureOps.hiveInstanceType(lit(true)),
      CaptureOps.hiveInstanceType(lit(false)))).getStruct(0)
    assert(r.getString(0) == "ugi" && r.getString(1) == "u1" &&
      r.getString(2) == "127.0.0.1" && r.getString(3) == "HS2" &&
      r.getString(4) == "CLI")
  }

  test("O15 perf JSON with zero-duration imputation (EventRecordConstructor.java:255-271)") {
    val df = Seq((Map("PARSE" -> 40L, "OPEN" -> 0L), 100L, 1000L))
      .toDF("perf", "start", "now")
    val json = df.select(
      CaptureOps.perfJson($"perf", $"start", $"now")).head().getString(0)
    val parsed = ujsonLike(json)
    assert(parsed == Map("PARSE" -> 40L, "OPEN" -> 900L))
  }

  /** Minimal flat {string:long} JSON parse for golden compare (parsed-JSON
    * equality, not string equality — map order is not semantics,
    * SURVEY.md §7.4). */
  private def ujsonLike(s: String): Map[String, Long] =
    s.stripPrefix("{").stripSuffix("}").split(",").filter(_.nonEmpty).map { kv =>
      val Array(k, v) = kv.split(":", 2)
      k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toLong
    }.toMap

  test("O16 counters JSON golden (EventRecordConstructorTest.java:284-287)") {
    // [[{"counters_group1":{"metric_key1":123}},{"counters_group2":{"metric_key1":456,"metric_key2":789}}]]
    val counters = Seq(Seq(
      Map("counters_group1" -> Map("metric_key1" -> 123L)),
      Map("counters_group2" -> Map("metric_key1" -> 456L, "metric_key2" -> 789L))))
    val json = Seq(Tuple1(counters)).toDF("counters")
      .select(CaptureOps.countersJson($"counters")).head().getString(0)
    // parsed-JSON equality (not string equality — map order is not
    // semantics, SURVEY.md §7.4): assert every golden path/value.
    val paths = Seq(
      "$[0][0].counters_group1.metric_key1" -> "123",
      "$[0][1].counters_group2.metric_key1" -> "456",
      "$[0][1].counters_group2.metric_key2" -> "789")
    val got = Seq(json).toDF("j")
      .select(paths.map { case (p, _) => get_json_object($"j", p) }: _*)
      .head()
    paths.zipWithIndex.foreach { case ((p, want), i) =>
      assert(got.getString(i) == want, s"path $p")
    }
    // empty → null (absent), reference :252
    val empty = Seq(Tuple1(Seq.empty[Seq[Map[String, Map[String, Long]]]]))
      .toDF("counters").select(CaptureOps.countersJson($"counters")).head()
    assert(empty.isNullAt(0))
  }

  test("O17 counters precedence: tez else mr") {
    val r = spark.range(1).select(
      CaptureOps.countersPrecedence(lit("tez"), lit("mr")),
      CaptureOps.countersPrecedence(lit(null).cast("string"), lit("mr"))).head()
    assert(r.getString(0) == "tez" && r.getString(1) == "mr")
  }

  test("O18 app-id rewrite + malformed drop (ApplicationIdRetrieverTest.java:68-94)") {
    val got = Seq("job_1685098059769_1951", "job_bad", "application_1_2", "x")
      .toDF("j").select($"j", CaptureOps.yarnApplicationId($"j").as("a"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("job_1685098059769_1951").contains("application_1685098059769_1951"))
    assert(got("job_bad").isEmpty && got("application_1_2").isEmpty && got("x").isEmpty)
  }

  test("O25 logger id is 10 alphanumeric chars (IdGeneratorTest.java:27-32)") {
    val id = CaptureOps.newLoggerId()
    assert(id.length == 10 && id.forall(_.isLetterOrDigit))
  }
}
