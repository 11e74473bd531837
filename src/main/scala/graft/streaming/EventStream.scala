package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over the live event log (SURVEY.md §2.2 A7/A14 and
  * §2.1 O1/O21): the capture stream consumed incrementally with bounded
  * state. All state here is watermark-capped — the property that keeps a
  * 100 TB/day stream from accreting unbounded executor state:
  *
  *  - late events beyond the watermark are dropped (the reference's
  *    bounded-queue load-shed, O21, re-expressed as event-time bounds);
  *  - dedup keys expire with `dropDuplicatesWithinWatermark` (A14) instead
  *    of living forever;
  *  - windows/sessions emit and evict on watermark passage.
  *
  * Inputs are any streaming DataFrame with the `events` shape
  * (`ts timestamp, event_id long, user_id long, event_type string,
  * value double`); production would use `spark.readStream.parquet` over the
  * capture sink or a Kafka source — same plan either way.
  */
/** Typed row for stateful operators. */
case class EventRow(ts: java.sql.Timestamp, event_id: Long, user_id: Long,
                    event_type: String, value: Double)

/** Accumulated per-user state/output of [[EventStream.runningUserTotals]]. */
case class UserTotals(user_id: Long, n_events: Long, sum_value: Double)

object EventStream {

  /** O21 — explicit drop-on-overflow admission (the reference's bounded
    * queue: events beyond capacity are dropped and counted, never buffered).
    * Spark's native answer is source backpressure (`maxFilesPerTrigger` /
    * `maxOffsetsPerTrigger`), which this library uses by default; this
    * operator reproduces the reference's LOAD-SHED semantic for sources
    * that cannot be throttled: each partition of each micro-batch admits at
    * most `capacity` rows and drops the rest, counting drops in the
    * `droppedRows` accumulator (the observable the reference logs).
    * Works identically on batch and streaming DataFrames. */
  def boundedAdmission(events: DataFrame, capacity: Int)
      : (DataFrame, org.apache.spark.util.LongAccumulator) = {
    val spark = events.sparkSession
    val dropped = spark.sparkContext.longAccumulator("droppedRows")
    val admitted = events.mapPartitions { it =>
      var n = 0
      it.filter { _ =>
        n += 1
        if (n <= capacity) true else { dropped.add(1); false }
      }
    }(org.apache.spark.sql.Encoders.row(events.schema))
    (admitted, dropped)
  }

  /** A14 — at-least-once capture dedup with expiring state. */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "1 hour")
      : DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  /** A7 — tumbling-window traffic with late-data drop. */
  def hourlyCounts(events: DataFrame, watermark: String = "30 minutes")
      : DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Per-user lifetime counters via `mapGroupsWithState` — the custom-state
    * escape hatch for logic windows can't express (here: monotone running
    * totals emitted once per micro-batch per active user). State is one
    * `UserTotals` per user and is dropped after `idleTimeout` of processing-
    * time inactivity, so the state store stays bounded by the active-user
    * working set, not lifetime cardinality. */
  def runningUserTotals(events: Dataset[EventRow],
                        idleTimeout: String = "1 hour"): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserTotals, UserTotals](
        GroupStateTimeout.ProcessingTimeTimeout) {
        (uid: Long, batch: Iterator[EventRow], state: GroupState[UserTotals]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last
          } else {
            val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
            val evs = batch.toSeq
            val next = UserTotals(uid, prev.n_events + evs.size,
              math.rint((prev.sum_value + evs.map(_.value).sum) * 100) / 100)
            state.update(next)
            state.setTimeoutDuration(idleTimeout)
            next
          }
      }
  }

  /** Threshold-crossing alerts via `flatMapGroupsWithState` — the 0-to-n
    * output shape `mapGroupsWithState` can't express: a group emits NOTHING
    * until its running event count crosses a multiple of `every`, then one
    * alert row per crossing. State is a single long per active user, dropped
    * after `idleTimeout` — bounded by the active working set. */
  def burstAlerts(events: Dataset[EventRow], every: Long = 3L,
                  idleTimeout: String = "1 hour"): Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Update, GroupStateTimeout.ProcessingTimeTimeout) {
        (uid: Long, batch: Iterator[EventRow], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prev = state.getOption.getOrElse(0L)
            val next = prev + batch.size
            state.update(next)
            state.setTimeoutDuration(idleTimeout)
            // one alert per multiple of `every` crossed in this batch
            ((prev / every + 1) to (next / every)).iterator
              .map(k => (uid, k * every))
          }
      }
  }

  /** A1 streaming twin — pair each submission with its completion as a
    * stream-stream inner join on the id key, with an event-time range bound
    * (completion within `maxDelay` of submission). Both watermarks PLUS the
    * range condition are what let Spark evict join state: without the time
    * bound each side buffers forever; with it, a submitted row is dropped
    * once the completed-side watermark passes `sub_ts + maxDelay` — state
    * stays proportional to the in-flight window, the only safe shape for an
    * unbounded pairing join at 100 TB/day. */
  def lifecyclePairs(submitted: DataFrame, completed: DataFrame,
                     watermark: String = "30 minutes",
                     maxDelay: String = "1 hour"): DataFrame = {
    val sub = submitted.withWatermark("ts", watermark)
      .select(col("event_id").as("qid"), col("user_id"),
        col("ts").as("sub_ts"))
    val done = completed.withWatermark("ts", watermark)
      .select(col("event_id").as("done_qid"), col("ts").as("done_ts"))
    sub.join(done,
      col("qid") === col("done_qid") &&
        col("done_ts") >= col("sub_ts") &&
        col("done_ts") <= col("sub_ts") + expr(s"interval $maxDelay"))
      .select(col("qid"), col("user_id"), col("sub_ts"), col("done_ts"),
        (unix_millis(col("done_ts")) - unix_millis(col("sub_ts")))
          .as("latency_ms"))
  }

  /** A7 — native session windows (30-min gap), the streaming twin of the
    * batch gaps-and-islands `a7_sessionize`. State per open session only. */
  def sessionStats(events: DataFrame, gap: String = "30 minutes",
                   watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("sess"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sess.start").as("sess_start"),
        col("sess.end").as("sess_end"), col("n_events"))
}
