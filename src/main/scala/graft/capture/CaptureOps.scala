package graft.capture

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's record-level transformations (SURVEY.md §2.1, O2–O18),
  * re-expressed as pure `Column` functions so Catalyst can fuse them into one
  * whole-stage-codegen'd projection. Each function cites the behavior it
  * reproduces; none of them shuffles — the whole capture pipeline is a single
  * narrow map over the event stream, which is exactly what you want when the
  * stream is 100 TB/day: no state, no exchange, embarrassingly parallel.
  */
object CaptureOps {

  /** O2 — version gate. Keep events only when the engine version is in
    * [2.2, 4.0). Parse failures (no `major.minor` prefix) are rejected.
    * Reference: utils/VersionValidator.java:43-55.
    */
  def supportedVersion(version: Column): Column = {
    // regexp_extract yields "" on no match; nullify before the cast so the
    // ANSI-mode cast can't throw on malformed versions (they must filter,
    // not fail — reference behavior for "unexpected", "5", "3.abc1").
    def part(i: Int): Column = {
      val m = regexp_extract(version, "^(\\d+)\\.(\\d+)", i)
      when(m === "", lit(null)).otherwise(m).cast("int")
    }
    val (major, minor) = (part(1), part(2))
    val inRange = (major > 2 || (major === 2 && minor >= 2)) && major < 4
    coalesce(inRange, lit(false))
  }

  /** O6/O7/O8 — entity extraction: from an `array<struct<type,name>>` column,
    * keep entities of one type, project the name, dedupe (order-preserving on
    * first occurrence). Reference: EventRecordConstructor.java:273-301.
    */
  def entityNames(entities: Column, entityType: String): Column =
    array_distinct(
      transform(
        filter(entities, e => e.getField("type") === entityType),
        e => e.getField("name")
      )
    )

  /** O9/O10 — execution-mode classifier over the task DAG, an order-sensitive
    * precedence chain: no tasks → CLIENT_ONLY; any tez+llap task → LLAP;
    * tez → TEZ; mr → MR; spark → SPARK; any DDL anywhere in the DAG → DDL;
    * else NONE. `tasks` is `array<struct<engine:string,llap:boolean,
    * ddl:boolean>>` (the DAG pre-flattened — the reference walks it
    * recursively, utils/TasksRetriever.java:27-40; we flatten at ingest and
    * use `exists`, which also fixes the reference's first-child-only early
    * return bug noted in SURVEY.md §7.4).
    * Reference: EventRecordConstructor.java:312-344.
    */
  def executionMode(tasks: Column): Column = {
    def eng(t: Column, e: String) = upper(t.getField("engine")) === e
    when(tasks.isNull || size(tasks) === 0, "CLIENT_ONLY")
      .when(exists(tasks, t => eng(t, "TEZ") && t.getField("llap")), "LLAP")
      .when(exists(tasks, t => eng(t, "TEZ")), "TEZ")
      .when(exists(tasks, t => eng(t, "MR")), "MR")
      .when(exists(tasks, t => eng(t, "SPARK")), "SPARK")
      .when(exists(tasks, t => t.getField("ddl")), "DDL")
      .otherwise("NONE")
  }

  /** O11 — queue-name lookup: mode-dispatched key into the session conf map.
    * Reference: EventRecordConstructor.java:182-193; LoggerVarsConfig.java:22-24.
    */
  def queueName(mode: Column, conf: Column): Column =
    // try_element_at: a conf map missing the mode's key yields NULL (the
    // reference's Map.get semantics); element_at throws under ANSI mode
    when(mode === "LLAP", try_element_at(conf, lit("hive.llap.daemon.queue.name")))
      .when(mode === "MR", try_element_at(conf, lit("mapreduce.job.queuename")))
      .when(mode === "TEZ", try_element_at(conf, lit("tez.queue.name")))
      .otherwise(lit(null).cast("string"))

  /** O12 — request user with UGI fallback.
    * Reference: EventRecordConstructor.java:307-310. */
  def requestUser(userName: Column, ugiUserName: Column): Column =
    coalesce(userName, ugiUserName)

  /** O13 — hive address with a driver-computed local-host fallback.
    * Reference: EventRecordConstructor.java:346-356. */
  def hiveAddress(instanceAddress: Column, localHost: String): Column =
    coalesce(instanceAddress, lit(localHost))

  /** O14 — boolean→categorical instance type.
    * Reference: EventRecordConstructor.java:358-360. */
  def hiveInstanceType(isHiveServerQuery: Column): Column =
    when(isHiveServerQuery, "HS2").otherwise("CLI")

  /** O15 — perf map → JSON with zero-duration imputation: entries whose
    * duration is 0 are replaced by `now - startTime` (the phase never closed).
    * `perf` is `map<string,long>`. Reference: EventRecordConstructor.java:255-271.
    */
  def perfJson(perf: Column, startTimeMs: Column, nowMs: Column): Column =
    when(
      perf.isNull,
      lit(null).cast("string")
    ).otherwise(
      to_json(
        transform_values(
          perf,
          (_, v) => when(v === 0L, nowMs - startTimeMs).otherwise(v)
        )
      )
    )

  /** O16 — nested counters → JSON, preserving nesting; null groups skipped;
    * empty counters → null (absent). `counters` is
    * `array<array<map<string,map<string,long>>>>`.
    * Reference: EventRecordConstructor.java:223-253.
    */
  def countersJson(counters: Column): Column = {
    val cleaned = transform(counters, grp => filter(grp, m => m.isNotNull))
    when(counters.isNull || size(counters) === 0, lit(null).cast("string"))
      .otherwise(to_json(cleaned))
  }

  /** O17 — counters source precedence: Tez if present, else MapReduce.
    * Reference: EventRecordConstructor.java:166-169. */
  def countersPrecedence(tezJson: Column, mrJson: Column): Column =
    coalesce(tezJson, mrJson)

  /** O18 — Hadoop job id → YARN application id. Malformed ids yield null.
    * `job_1685098059769_1951` → `application_1685098059769_1951`.
    * Reference: ApplicationIdRetriever.java:78-94.
    */
  def yarnApplicationId(jobId: Column): Column =
    when(
      jobId.rlike("^job_\\d+_\\d+$"),
      regexp_replace(jobId, "^job_", "application_")
    ).otherwise(lit(null).cast("string"))

  /** O19 (MR arm) — first job id that parses as a valid Hadoop job id; the
    * reference skips malformed ids and takes the first convertible one
    * (ApplicationIdRetriever.java:78-94 — `flatMap` drops failures, then
    * `findFirst`). */
  def firstValidJobId(jobIds: Column): Column =
    try_element_at(filter(jobIds, j => j.rlike("^job_\\d+_\\d+$")), lit(1))

  /** O19 — mode-dispatched application-id retrieval
    * (ApplicationIdRetriever.java:39-51):
    *  - MR   → convert the first valid Hadoop job id (`:78-94`);
    *  - TEZ  → the session's app-master application id (`:58-72`), supplied
    *    here as a column joined from a session-snapshot dimension;
    *  - LLAP → the long-lived LLAP daemon application (`:100-120`), supplied
    *    as a column joined from a service-registry snapshot;
    *  - anything else → null (`default: Optional.empty`).
    */
  def determineApplicationId(mode: Column, jobIds: Column,
                             tezAppId: Column, llapAppId: Column): Column =
    when(mode === "MR", yarnApplicationId(firstValidJobId(jobIds)))
      .when(mode === "TEZ", tezAppId)
      .when(mode === "LLAP", llapAppId)
      .otherwise(lit(null).cast("string"))

  /** O5 — status enum selection for completed events.
    * Reference: EventRecordConstructor.java:85-87. */
  def status(success: Column): Column =
    when(success, "SUCCESS").otherwise("FAIL")

  /** O25 — 10-char alphanumeric writer id (driver-side, once per logger).
    * Reference: utils/IdGenerator.java:27-29. */
  def newLoggerId(): String =
    scala.util.Random.alphanumeric.take(10).mkString
}
