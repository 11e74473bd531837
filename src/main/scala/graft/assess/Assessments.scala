package graft.assess

import graft.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The assessment analytics surface (SURVEY.md §2.2, A1–A14) — the workload
  * questions the reference's event log exists to answer, expressed over the
  * driver test tables (`events` stands in for the hook stream, FIXTURES.md §B).
  *
  * Every query here is a declarative DataFrame plan: Catalyst gets predicate
  * pushdown / column pruning / join selection for free, and each query's
  * shuffle structure is noted where it matters for 100 TB.
  *
  * Each query has a DuckDB oracle twin in [[Assessments.oracles]]; aliases are
  * kept identical on both sides (driver hash-compares by column name).
  */
object Assessments {

  type Q = (SparkSession, String) => DataFrame

  /** The assessment layer's input contract: events with a timestamp, a
    * type, and a value. Rows missing any of the three can't participate in
    * time-series/classified/summed analytics, and each engine's null
    * handling (null-key joins, window frames over null days, pandas dtype
    * widening on null epochs) diverges in its own way — one source filter
    * keeps 30+ queries hash-identical cross-engine under dirty data.
    * user_id and props stay nullable (a5/a9/a10 handle them explicitly).
    * Every oracle carries the identical WHERE via [[EventsSql]]. */
  private def ev(s: SparkSession, dir: String) = Tables.events(s, dir)
    .filter(col("ts").isNotNull && col("event_type").isNotNull &&
      col("value").isNotNull)

  /** DuckDB twin of [[ev]]'s valid-event filter; oracle SQL carries a
    * plain `FROM ($EVENTS) events` token that the map constructor
    * substitutes (no string interpolation — JSON paths contain `$`). */
  private val EventsSql =
    "SELECT * FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL"

  /** A1 — lifecycle pairing: first `signup` joined to first `purchase` per
    * user. Two partial aggregations shrink both sides *before* the join
    * (shuffle carries one row per user, not per event); at scale the join is
    * co-partitioned on the groupBy key so no extra exchange. */
  def a1LifecyclePairs(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val sub = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("st"))
    val fin = e.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min("ts").as("ft"))
    sub.join(fin, Seq("user_id"))
      .filter(col("ft") >= col("st"))
      .select(
        col("user_id"),
        (unix_millis(col("ft")) - unix_millis(col("st"))).as("ms_to_purchase"))
      .orderBy("user_id")
  }

  /** A1 — never-completed analog: signed-up users with no purchase
    * (left-anti join). */
  def a1AbandonedUsers(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val sub = e.filter(col("event_type") === "signup").select("user_id").distinct()
    val fin = e.filter(col("event_type") === "purchase").select("user_id").distinct()
    sub.join(fin, Seq("user_id"), "left_anti").orderBy("user_id")
  }

  /** A2 — per-user workload rollup (partial+final hash aggregate). */
  def a2UserRollup(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        round(sum("value"), 2).as("sum_value"),
        // +1e-9 nudge before rounding: sum/count of 2-dp values lands
        // exactly on x.xxxx5 half-boundaries, where Spark (HALF_UP on the
        // decimal string) and DuckDB (exact binary) disagree by design. The
        // nudge is 10^4 larger than any cross-engine float noise, so both
        // engines consistently round boundary cases up.
        round(avg("value") + lit(1e-9), 4).as("avg_value"),
        round(max("value"), 2).as("max_value"))
      .orderBy("user_id")

  /** A3 — multi-granularity rollup (event_type × day hierarchy). */
  def a3TypeDailyRollup(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .rollup("event_type", "day")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy(asc_nulls_first("event_type"), asc_nulls_first("day"))

  /** A3 — pivoted day × event-type count matrix (`groupBy().pivot()` with
    * an explicit value list, so no extra distinct-values job; bounded
    * column fan-out is the scale contract for pivot). The DuckDB twin is
    * conditional aggregation — pivot IS sugar for exactly that. */
  def a3PivotDaily(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy("day")
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("day")

  /** A2 via the SQL-string entry path — same logical plan as the DataFrame
    * form (Catalyst parses to the identical tree), pinned against the same
    * oracle; demonstrates the `spark.sql` + temp-view surface. */
  def a2UserRollupSql(s: SparkSession, dir: String): DataFrame = {
    ev(s, dir).createOrReplaceTempView("graft_events")
    s.sql(
      """SELECT user_id,
        |  count(*) AS n_events,
        |  count(DISTINCT event_type) AS n_types,
        |  round(sum(value), 2) AS sum_value,
        |  round(avg(value) + 1e-9, 4) AS avg_value,
        |  round(max(value), 2) AS max_value
        |FROM graft_events GROUP BY user_id ORDER BY user_id""".stripMargin)
  }

  /** A4 — heat map via explode: token frequencies over `documents`
    * (the TablesRead/PartitionsRead analog). Top-50, fully tiebroken. */
  def a4TokenHeatmap(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("token"))
      .limit(50)

  /** A5 — latency/value distribution: exact percentiles per event type.
    * (`percentile_approx` is the 100 TB path; the exact variant is used here
    * because the DuckDB oracle must agree bit-for-bit.) */
  def a5ValuePercentiles(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5D)"), 4).as("p50"),
        round(expr("percentile(value, 0.9D)"), 4).as("p90"),
        round(expr("percentile(value, 0.99D)"), 4).as("p99"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** A5 — the 100 TB path: mergeable sketches instead of exact state.
    * `percentile_approx` (KLL-style) and `approx_count_distinct` (HLL++) keep
    * fixed-size state per group regardless of cardinality. Exact twins ride
    * along so the error contract is testable (AssessmentsSpec); rows-only at
    * the driver (sketch internals differ from DuckDB's). */
  def a5ApproxSketches(s: SparkSession, dir: String): DataFrame = {
    // Distinct-user arms ride on a pre-deduped (type, user) frame instead of
    // a count(DISTINCT) inside the main aggregate: avoids Catalyst's Expand
    // (which doubles the scanned rows), and HLL over the deduped set yields
    // the identical estimate (register-max sketches are duplicate- and
    // order-insensitive). Both aggregates partial-combine map-side; the tiny
    // per-type results meet in a broadcast join.
    val perc = ev(s, dir)
      .groupBy("event_type")
      .agg(
        round(percentile_approx(col("value"), lit(0.5), lit(10000)), 4)
          .as("p50_approx"),
        round(expr("percentile(value, 0.5D)"), 4).as("p50_exact"))
    val users = ev(s, dir)
      // count(DISTINCT x) ignores NULLs; the deduped-frame rewrite must too,
      // or a null user_id would count as one extra "user" in users_exact
      .filter(col("user_id").isNotNull)
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("_n"))
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("users_approx"),
        count(lit(1)).as("users_exact"))
    perc.join(broadcast(users), Seq("event_type"))
      .orderBy("event_type")
  }

  /** A5 — the sketch error contract as an oracle-checkable row: the approx
    * values themselves are engine-specific (KLL / HLL++ internals stay
    * rows-only in [[a5ApproxSketches]]), but the CONTRACT — approx within a
    * deterministic bound of exact — is a boolean both engines agree on.
    * Spark computes sketch and exact and emits the bound checks; the DuckDB
    * twin computes the same exact values with literal TRUE bounds, so a
    * sketch drifting out of contract hash-fails the round. Bounds:
    * percentile_approx at accuracy 10000 must land between the exact 49th
    * and 51st percentiles (the KLL contract is rank-space, so the bound is
    * expressed in rank space with wide slack; groups under 100 rows pass
    * vacuously — see inline note); approx_count_distinct at its default 5%
    * rsd must be within 10% relative of exact (vacuous when a type has no
    * non-null users). */
  def a5SketchBounds(s: SparkSession, dir: String): DataFrame = {
    val perc = ev(s, dir)
      .groupBy("event_type")
      .agg(
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("pa"),
        expr("percentile(value, 0.49D)").as("lo"),
        expr("percentile(value, 0.51D)").as("hi"),
        round(expr("percentile(value, 0.5D)"), 4).as("p50_exact"),
        count(lit(1)).as("n_vals"))
    val users = ev(s, dir)
      .filter(col("user_id").isNotNull)
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("_n"))
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("ua"),
        count(lit(1)).as("users_exact"))
    // LEFT join: an event_type whose every valid event has a NULL user_id
    // has no `users` row; the oracle's single GROUP BY still emits it, so
    // dropping it here would be a rows mismatch. No users → both checks
    // are vacuously true (nothing to bound).
    // n_vals < 100: percentile_approx returns an OBSERVED element, and the
    // rank-space KLL contract only implies the value-space [p49, p51] test
    // when the group is large enough that adjacent ranks are value-close —
    // a 2-row group's observed median sits far outside the interpolated
    // band on perfectly correct sketches. Small groups pass vacuously.
    perc.join(broadcast(users), Seq("event_type"), "left")
      .select(col("event_type"), col("p50_exact"),
        coalesce(col("users_exact"), lit(0L)).as("users_exact"),
        (col("n_vals") < 100 ||
          (col("pa") >= col("lo") && col("pa") <= col("hi")))
          .as("p50_in_bound"),
        coalesce(abs(col("ua") - col("users_exact")) <=
          col("users_exact") * 0.1, lit(true)).as("users_in_bound"))
      .orderBy("event_type")
  }

  /** A5 — deterministic approximation twin for [[a5ApproxSketches]]: the
    * same estimate-vs-exact shape (approximate median, approximate distinct
    * users, exact companions) built from DETERMINISTIC estimators both
    * engines compute bit-for-bit, so the whole row hash-matches the DuckDB
    * oracle instead of going rows-only. The md5 twins gave SimHash this
    * treatment in r6; this closes the a5 gap the same way.
    *
    *  - p50_sample: exact median over the md5(event_id)-prefix 25% sample
    *    (the [[graft.ext.Curation.xSampleHash]] draw) — a deterministic
    *    stand-in for a sampled-percentile sketch.
    *  - users_kmv: bottom-k (k=64) KMV distinct estimate over
    *    md5(user_id): exact when a type has ≤ k users, else
    *    (k-1)/fraction(kth smallest hash) — the same estimator as
    *    x_kmv_setops, reproduced hex-nibble-for-nibble in the oracle.
    *
    * Scale shape: the sample arm is a narrow filter + one grouped
    * aggregate; the KMV arm rides the deduped (type, user) frame — the
    * per-type bottom-k window sees k·|types| rows after the partial
    * row_number prune, never the corpus; all joins broadcast |types| rows. */
  def a5ApproxTwin(s: SparkSession, dir: String, k: Int = 64): DataFrame = {
    val base = ev(s, dir)
    val exact = base.groupBy("event_type")
      .agg(round(expr("percentile(value, 0.5D)"), 4).as("p50_exact"))
    val sample = base
      .filter(substring(md5(col("event_id").cast("string")), 1, 1) <= "3")
      .groupBy("event_type")
      .agg(round(expr("percentile(value, 0.5D)"), 4).as("p50_sample"))
    val users = base.filter(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id")).distinct()
      .withColumn("h", md5(col("user_id").cast("string")))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val kth = users.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .groupBy("event_type")
      .agg(max(col("h")).as("kth"))
    val exactUsers = users.groupBy("event_type")
      .agg(count(lit(1)).as("users_exact"))
    // kth-hash fraction of the hash space from the first 8 hex chars;
    // KMV estimate (k-1)/frac, exact below k. conv() is the Spark half of
    // the oracle's strpos-nibble arithmetic.
    val frac = conv(substring(col("kth"), 1, 8), 16, 10).cast("double") /
      lit(4294967296.0)
    exact
      .join(broadcast(sample), Seq("event_type"), "left")
      .join(broadcast(exactUsers), Seq("event_type"), "left")
      .join(broadcast(kth), Seq("event_type"), "left")
      .select(col("event_type"), col("p50_sample"), col("p50_exact"),
        coalesce(
          when(col("users_exact") <= k, col("users_exact"))
            .otherwise(round(lit((k - 1).toDouble) / frac, 0).cast("long")),
          lit(0L)).as("users_kmv"),
        coalesce(col("users_exact"), lit(0L)).as("users_exact"))
      .orderBy("event_type")
  }

  /** A6 — top-K heaviest per group via ranking window. */
  def a6TopkByType(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id").asc)
    ev(s, dir)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("event_type"), col("rnk"), col("event_id"),
        round(col("value"), 2).as("value"))
      .orderBy("event_type", "rnk")
  }

  /** A6 — distribution ranking: per-user totals bucketed into quartiles
    * with `ntile` + `percent_rank` (fully tiebroken for determinism).
    * CAVEAT: the un-partitioned window is a single-reducer global sort —
    * fine for a report-sized user dimension, a bottleneck at 100×; the
    * scale path is [[a6QuartilesScaled]], which buckets by broadcast
    * percentile cut points instead of ranking every row on one task. */
  def a6ValueQuartiles(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("total"), col("user_id"))
    ev(s, dir)
      .groupBy("user_id")
      .agg(round(sum("value"), 2).as("total"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", round(percent_rank().over(w), 4))
      .orderBy("user_id")
  }

  /** A6 (scale path) — quartile assignment WITHOUT a global window: compute
    * the three quartile cut points as one tiny aggregate, broadcast them,
    * and bucket every user by value comparison. Two narrow passes, no
    * single-reducer sort — survives a billion-user dimension (swap the
    * exact `percentile` for `percentile_approx` when the user count itself
    * is too large to sort-buffer per partition). Semantics differ from
    * `ntile` on ties/remainders by design: buckets are value-based
    * (quantile_cont), not equal-count. */
  def a6QuartilesScaled(s: SparkSession, dir: String): DataFrame = {
    val totals = ev(s, dir)
      .groupBy("user_id")
      .agg(round(sum("value"), 2).as("total"))
    val cuts = totals.agg(
      expr("percentile(total, 0.25D)").as("c1"),
      expr("percentile(total, 0.5D)").as("c2"),
      expr("percentile(total, 0.75D)").as("c3"))
    totals.crossJoin(broadcast(cuts))
      .select(col("user_id"), col("total"),
        (lit(1) + (col("total") > col("c1")).cast("int")
          + (col("total") > col("c2")).cast("int")
          + (col("total") > col("c3")).cast("int")).as("quartile"))
      .orderBy("user_id")
  }

  /** A7 — tumbling-window traffic (Spark `window()`; oracle uses the
    * equivalent `date_trunc`). */
  def a7HourlyTraffic(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("hour"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("hour", "event_type")

  /** A7 — sessionization as gaps-and-islands (30-min inactivity gap): a pure
    * window-function formulation that needs exactly one shuffle on user_id
    * (the streaming variant with `session_window` lives in the streaming
    * suite — this is the batch/oracle-checkable twin). */
  def a7Sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapMs = 1800000L
    ev(s, dir)
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ms").isNull ||
          unix_millis(col("ts")) - col("prev_ms") > gapMs, 1).otherwise(0))
      .withColumn("sess_id",
        sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sess_id")
      .agg(
        count(lit(1)).as("n_events"),
        (unix_millis(max(col("ts"))) - unix_millis(min(col("ts")))).as("dur_ms"))
      .orderBy("user_id", "sess_id")
  }

  /** A8 — daily counts with running total and day-over-day delta. */
  def a8DailyRunning(s: SparkSession, dir: String): DataFrame = {
    val daily = ev(s, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy("day")
    daily
      .withColumn("running",
        sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("delta", col("n") - lag("n", 1).over(w))
      .orderBy("day")
  }

  /** A8 — trailing 7-day sum per event type via a RANGE window frame
    * (value-based, so gap days are handled correctly — a ROWS frame would
    * silently span across missing days). Partitioned by type: the sort is
    * per-partition, never global. */
  def a8TrailingWindow(s: SparkSession, dir: String): DataFrame = {
    val daily = ev(s, dir)
      .groupBy(col("event_type"),
        datediff(col("ts").cast("date"), to_date(lit("1970-01-01")))
          .cast("bigint").as("day_num"))
      .agg(sum("value").as("sv"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_num"))
      .rangeBetween(-6, 0)
    daily
      .select(col("event_type"), col("day_num"),
        round(col("sv") + lit(1e-9), 2).as("day_value"),
        round(sum("sv").over(w) + lit(1e-9), 2).as("trailing_7d"))
      .orderBy("event_type", "day_num")
  }

  /** A9 — JSON counter mining: `get_json_object` + bucketed aggregate. */
  def a9JsonProps(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn("k_bucket",
        (get_json_object(col("props"), "$.k").cast("long") % 10).as("k_bucket"))
      .groupBy("k_bucket")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("k_bucket")

  /** A10 — parse JSON to a native map and explode its entries. */
  def a10PropsMapExplode(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .select(explode(from_json(col("props"),
        org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>"))))
      .groupBy("key")
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .orderBy("key")

  /** A11 — failure analysis: error events bucketed by user cohort. */
  def a11ErrorCohorts(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .filter(col("event_type") === "error")
      .groupBy((col("user_id") % 20).as("cohort"))
      .agg(count(lit(1)).as("n_errors"), round(sum("value"), 2).as("impact"))
      .orderBy("cohort")

  /** A11 — string/regex extraction over `documents.source`. */
  def a11SourceParse(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .groupBy(
        regexp_extract(col("source"), "([0-9]+)", 1).as("src_num"),
        col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .orderBy("src_num", "lang")

  /** A11 — retry-chain analysis (gaps-and-islands): maximal runs of
    * consecutive error events per user, rolled up by chain length with how
    * many chains recovered (a non-error followed) versus ended the user's
    * stream — the retry-storm signature an assessment flags before sizing
    * the target (a workload that fails 5× then succeeds costs 6 slots per
    * logical query). Chain id is the classic `rn − rn_within_errors`
    * difference; "recovered" falls out of `end_rn < n_events` — no
    * self-join against successors needed.
    *
    * Scale shape: both row_number windows and the chain groupBy partition
    * by user (then (user, grp)); the n_events side reduces to one row per
    * user before its co-partitioned join. Mean span divides an exact
    * integer micros sum, so the rounding is engine-identical. */
  def a11RetryChains(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        (col("event_type") === "error").as("is_err"))
    val wAll = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val wErr = Window.partitionBy("user_id", "is_err")
      .orderBy(col("us"), col("event_id"))
    val marked = e.withColumn("rn", row_number().over(wAll))
      .withColumn("grp", col("rn") - row_number().over(wErr))
    val perUser = e.groupBy("user_id").agg(count(lit(1)).as("n_events"))
    val chains = marked.filter(col("is_err"))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("len"), min("us").as("st"), max("us").as("en"),
        max("rn").as("end_rn"))
      .join(perUser, Seq("user_id"))
    chains.groupBy("len")
      .agg(count(lit(1)).as("n_chains"),
        sum(when(col("end_rn") < col("n_events"), 1L).otherwise(0L))
          .as("n_recovered"),
        round(sum(col("en") - col("st")) / count(lit(1)) / 1e6 + lit(1e-9), 2)
          .as("mean_span_s"))
      .orderBy("len")
  }

  /** Latency-percentile drift: p50/p95 of the duration proxy per statement
    * kind, first half-month versus second, with the deltas and a
    * one-sided >10% p95 regression flag — the SLA watch an assessment
    * keeps running through a migration (percentile shifts, not means, are
    * what users feel). Two grouped exact-percentile aggregates + one
    * co-partitioned join on the kind key; the flag compares identically
    * rounded inputs with exact IEEE arithmetic on both engines. */
  def aLatencyDrift(s: SparkSession, dir: String): DataFrame =
    latencyDriftOver(ev(s, dir)
      .select(col("event_type"), (dayofmonth(col("ts")) <= 15).as("p1"),
        col("value")))

  /** The drift report over a pre-shaped (event_type, p1, value) frame —
    * split out so the appeared/vanished arms (absent from the shipped
    * data, where every kind spans both halves) are pinnable on a
    * fixture. */
  private[assess] def latencyDriftOver(e: DataFrame): DataFrame = {
    val agg = e
      .groupBy("event_type", "p1")
      .agg(round(expr("percentile(value, 0.5D)"), 4).as("p50"),
        round(expr("percentile(value, 0.95D)"), 4).as("p95"),
        count(lit(1)).as("n"))
    val a = agg.filter(col("p1")).select(col("event_type"),
      col("p50").as("p50_a"), col("p95").as("p95_a"), col("n").as("n_a"))
    val b = agg.filter(!col("p1")).select(col("event_type"),
      col("p50").as("p50_b"), col("p95").as("p95_b"), col("n").as("n_b"))
    // FULL OUTER: a kind present in only one half is the loudest drift
    // signal of all (appeared / vanished) — an inner join would silently
    // drop exactly those rows
    a.join(b, Seq("event_type"), "full_outer")
      .select(col("event_type"), col("p50_a"), col("p50_b"),
        col("p95_a"), col("p95_b"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        round(col("p50_b") - col("p50_a"), 4).as("d_p50"),
        round(col("p95_b") - col("p95_a"), 4).as("d_p95"),
        coalesce(col("p95_b") - col("p95_a") > col("p95_a") * 0.1, lit(false))
          .as("regressed"),
        when(col("p50_a").isNull, "appeared")
          .when(col("p50_b").isNull, "vanished")
          .otherwise("steady").as("status"))
      .orderBy("event_type")
  }

  /** Ordered funnel conversion: view → click (after the first view) →
    * purchase (after that click), counted per user with stage-over-stage
    * conversion rates — the adoption-lifecycle readout (for captured query
    * logs: explored → scheduled → migrated). Each stage is "first
    * qualifying event strictly after the previous stage's instant", so a
    * click that precedes every view does NOT convert — ordering is the
    * point of a funnel.
    *
    * Scale shape: three per-user aggregates chained by co-partitioned
    * joins on user_id (each stage's frame is one row per surviving user);
    * the final lag window runs on the THREE-row stage frame, the bounded
    * exception. */
  def aFunnelConversion(s: SparkSession, dir: String): DataFrame =
    funnelOver(ev(s, dir).filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us")))

  /** The funnel over a pre-shaped (user_id, event_type, us) frame — split
    * out so the ordering semantics are pinnable on a handcrafted fixture
    * (the shipped data's streams are dense enough that first-view almost
    * always precedes some click, which would leave the ordered/unordered
    * distinction untested). */
  private[assess] def funnelOver(e: DataFrame): DataFrame = {
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t0"))
    val c = e.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("us") > col("t0"))
      .groupBy("user_id").agg(min("us").as("t1"))
    val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("us") > col("t1"))
      .groupBy("user_id").agg(min("us").as("t2"))
    def stage(df: DataFrame, i: Int, name: String) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i.toLong).as("stage"), lit(name).as("stage_name"),
          col("n_users"))
    val stages = stage(v, 1, "view")
      .unionByName(stage(c, 2, "click"))
      .unionByName(stage(p, 3, "purchase"))
    val w = Window.orderBy("stage") // 3 rows — bounded by construction
    stages
      .withColumn("conv_rate", round(
        col("n_users") / coalesce(lag("n_users", 1).over(w), col("n_users"))
          + lit(1e-9), 4))
      .orderBy("stage")
  }

  /** A12 — day-over-day set ops: churned (EXCEPT) and retained (INTERSECT)
    * users between the first two days. */
  def a12ChurnRetention(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    def users(day: String) =
      e.filter(date_format(col("ts"), "yyyy-MM-dd") === day)
        .select("user_id").distinct()
    val d1 = users("2024-01-01")
    val d2 = users("2024-01-02")
    d1.except(d2).withColumn("cohort", lit("churned"))
      .unionByName(d2.intersect(d1).withColumn("cohort", lit("retained")))
      .select("cohort", "user_id")
      .orderBy("cohort", "user_id")
  }

  /** A13 — as-of join: each purchase attributed to the user's most recent
    * prior (or same-instant) click. Formulated as union + `last(ignoreNulls)`
    * over an ordered window — ONE shuffle on user_id, no range join blowup;
    * this is the shape that survives 100 TB (vs. a theta join). */
  def a13AsofAttribution(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).filter(col("event_type").isin("click", "purchase"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    e.withColumn("cv",
        when(col("event_type") === "click", col("value")))
      .withColumn("lcv", last(col("cv"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id"), col("user_id"),
        round(col("value"), 2).as("purchase_value"),
        round(col("lcv"), 2).as("last_click_value"))
      .orderBy("event_id")
  }

  /** A12 — multiset set-op: per-type event surplus of day 1 over day 2
    * (`exceptAll` keeps multiplicity; the grouped count makes the result
    * deterministic). */
  def a12ExceptAll(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    def day(d: String) =
      e.filter(date_format(col("ts"), "yyyy-MM-dd") === d).select("event_type")
    day("2024-01-01").exceptAll(day("2024-01-02"))
      .groupBy("event_type").agg(count(lit(1)).as("surplus"))
      .orderBy("event_type")
  }

  /** A13 via the native [[graft.plans.AsOfJoin]] operator (custom
    * LogicalPlan + SparkStrategy + SparkPlan): purchases joined to the
    * user's latest prior-or-equal click with a linear co-partitioned merge —
    * one shuffle per side, O(1) merge state, vs. the window formulation's
    * full union sort. Same semantics as `a13_asof_attribution`, different
    * physical engine; its own oracle hash-checks it. */
  def a13AsofCustom(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("pus"),
        round(col("value"), 2).as("purchase_value"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), unix_micros(col("ts")).as("cus"),
        col("value").as("click_value"))
    graft.plans.AsOfJoin.asofJoin(purchases, clicks,
        "user_id", "c_uid", "pus", "cus")
      .select(col("event_id"), col("user_id"), col("purchase_value"),
        round(col("click_value"), 2).as("last_click_value"))
      .orderBy("event_id")
  }

  /** A13 — the broadcast as-of variant: identical semantics and oracle as
    * [[a13AsofCustom]], but the click side is broadcast and the purchase
    * stream is never shuffled or sorted
    * ([[graft.plans.AsOfJoin.asofJoinBroadcast]]). */
  def a13AsofBroadcast(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("pus"),
        round(col("value"), 2).as("purchase_value"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), unix_micros(col("ts")).as("cus"),
        col("value").as("click_value"))
    graft.plans.AsOfJoin.asofJoinBroadcast(purchases, clicks,
        "user_id", "c_uid", "pus", "cus")
      .select(col("event_id"), col("user_id"), col("purchase_value"),
        round(col("click_value"), 2).as("last_click_value"))
      .orderBy("event_id")
  }

  /** A13 — range join done scale-safe: "clicks in the 10 minutes before
    * each error, per user". A naive theta join (`c.ts BETWEEN e.ts-10m AND
    * e.ts`) is a broadcast-nested-loop at scale; instead each click is
    * tagged into its 10-minute bucket and the one following (explode ×2),
    * the join is an equi-join on (user_id, bucket), and the exact range
    * predicate filters the small candidate set. Shuffle is hash-partitioned,
    * candidates per row are bounded by bucket width — this survives 100 TB
    * where the theta join cannot. */
  def a13RangeJoinBucketed(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val win = 600000L // 10 min in ms
    val errors = e.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ems"))
      .withColumn("bucket", (col("ems") / win).cast("long"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), unix_millis(col("ts")).as("cms"))
      .withColumn("bucket",
        explode(array((col("cms") / win).cast("long"),
          (col("cms") / win).cast("long") + 1)))
    errors.join(clicks, Seq("user_id", "bucket"), "left")
      .withColumn("hit",
        col("cms").isNotNull &&
          col("cms") >= col("ems") - win && col("cms") < col("ems"))
      .groupBy("event_id")
      .agg(sum(when(col("hit"), 1).otherwise(0)).cast("long")
        .as("clicks_before"))
      .orderBy("event_id")
  }

  /** A2 at skew — two-stage salted aggregation: keys are salted into 16
    * shards for the partial aggregate, then combined. Same result as a
    * direct groupBy (the oracle proves it); the pattern is what keeps one
    * hot user from pinning a single reducer at 100 TB. */
  def a2SaltedRollup(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn("salt", (col("event_id") % 16).cast("int"))
      .groupBy("user_id", "salt")
      .agg(count(lit(1)).as("pn"), sum("value").as("pv"))
      .groupBy("user_id")
      .agg(sum("pn").cast("long").as("n_events"),
        round(sum("pv"), 2).as("sum_value"))
      .orderBy("user_id")

  /** A14 — dedup of replayed events: deterministic first event per
    * (user, type) via ranking (NOT `dropDuplicates`, whose survivor is
    * partition-order dependent). */
  def a14DedupFirst(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    ev(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        col("event_id").as("first_event_id"),
        unix_millis(col("ts")).as("first_ts_ms"))
      .orderBy("user_id", "event_type")
  }

  /** A15 — volume anomaly detection: each day's event count z-scored
    * against the all-days mean/stddev (the "did capture break / did load
    * spike" check an assessment run leads with). The daily frame is
    * day-cardinality (tiny at any corpus size); its one-row stats aggregate
    * broadcasts back onto it, so the fact table contributes only the
    * partial-aggregated daily counts. */
  def a15AnomalyDays(s: SparkSession, dir: String): DataFrame = {
    val daily = ev(s, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
    val stats = daily.agg(avg("n").as("mu"), stddev_samp("n").as("sigma"))
    // sigma = 0 (all days identical) must yield z NULL on BOTH engines:
    // Spark's Divide returns NULL on /0 but DuckDB's IEEE division gives
    // ±inf/nan, so the guard is explicit here and NULLIF in the oracle.
    val z = (col("n") - col("mu")) /
      when(col("sigma") === 0, lit(null)).otherwise(col("sigma"))
    daily.crossJoin(broadcast(stats))
      .select(col("day"), col("n"),
        round(z + lit(1e-9), 4).as("z"),
        when(abs(z) > 1.5, 1).otherwise(0).as("is_anomaly"))
      .orderBy("day")
  }

  /** A15 — SEASONALITY-aware volume anomaly: each (day, kind) count
    * against its day-of-week × kind baseline, not the global mean — a
    * Monday batch window is normal on Mondays and an anomaly on Sundays,
    * which the flat z-score ([[a15AnomalyDays]]) cannot see. The ratio is
    * computed as `n·cnt / sum` (one division over exact integer
    * aggregates) so the rounding is engine-identical; flags use the
    * ROUNDED ratio.
    *
    * Scale shape: the event table reduces to day×kind counts in one
    * partial-aggregated pass; the baseline groups that tiny frame by
    * (dow, kind) and joins back co-partitioned. Nothing downstream is
    * event-bounded. */
  def a15SeasonalDow(s: SparkSession, dir: String): DataFrame = {
    val daily = ev(s, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        dayofweek(col("ts")).as("dow"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val base = daily.groupBy("dow", "event_type")
      .agg(sum("n").as("tot"), count(lit(1)).as("n_days"))
    val ratio = round(col("n") * col("n_days") / col("tot") + lit(1e-9), 4)
    daily.join(base, Seq("dow", "event_type"))
      .select(col("day"), col("event_type"), col("dow"), col("n"),
        round(col("tot") / col("n_days") + lit(1e-9), 2).as("expected"),
        ratio.as("ratio"),
        (ratio > 1.5 || ratio < 0.5).as("anomalous"))
      .orderBy("day", "event_type")
  }

  /** The migration-assessment capstone (VERDICT r8 #7): the reference's
    * entire downstream purpose is an assessment REPORT over the captured
    * log (reference README.md:5-7) — this composes the assessment families
    * into one per-user frame: the A2 workload rollup, A1 lifecycle duration
    * + abandonment, A11 failure rate, A5 exact percentiles, and the
    * A4-style activity heat (each user's dominant event type,
    * deterministically tie-broken).
    *
    * Lifecycle labels follow A1's pairing semantics exactly: `converted`
    * iff the first purchase is at-or-after the first signup
    * ([[a1LifecyclePairs]]'s join predicate), `abandoned` for signed-up
    * users without such a purchase ([[a1AbandonedUsers]] plus the
    * purchase-before-signup edge), `no_signup` otherwise.
    *
    * Scale shape: every constituent is a per-user aggregate of the same
    * fact table — the one-row-per-user frames meet on the groupBy key, so
    * the joins are co-partitioned hash joins with no exchange beyond the
    * aggregates' own shuffles. The percentile arm carries exact per-group
    * state like A5; at 100 TB swap in percentile_approx, whose error
    * contract is already pinned by [[a5SketchBounds]]. */
  def aMigrationReport(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val base = e.groupBy("user_id").agg(
      count(lit(1)).as("n_events"),
      round(sum("value"), 2).as("sum_value"),
      sum(when(col("event_type") === "error", 1L).otherwise(0L))
        .as("n_errors"),
      round(expr("percentile(value, 0.5D)"), 4).as("p50_value"),
      round(expr("percentile(value, 0.95D)"), 4).as("p95_value"))
    val sub = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("st"))
    val fin = e.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min("ts").as("ft"))
    val life = sub.join(fin, Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("ft") >= col("st"),
          unix_millis(col("ft")) - unix_millis(col("st")))
          .as("ms_to_purchase"),
        lit(1).as("has_signup"))
    val wTop = Window.partitionBy(col("user_id"))
      .orderBy(desc("n"), asc("event_type"))
    val top = e.groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("top_type"))
    base
      .join(life, Seq("user_id"), "left")
      .join(top, Seq("user_id"))
      .select(col("user_id"), col("n_events"), col("sum_value"),
        round(col("n_errors") / col("n_events") + lit(1e-9), 4)
          .as("error_rate"),
        col("p50_value"), col("p95_value"), col("top_type"),
        when(col("has_signup").isNull, "no_signup")
          .when(col("ms_to_purchase").isNull, "abandoned")
          .otherwise("converted").as("lifecycle"),
        col("ms_to_purchase"))
      .orderBy("user_id")
  }

  val queries: Map[String, Q] = Map(
    "a_migration_report" -> aMigrationReport,
    "a15_anomaly_days" -> a15AnomalyDays,
    "a15_seasonal_dow" -> a15SeasonalDow,
    "a1_lifecycle_pairs" -> a1LifecyclePairs,
    "a1_abandoned_users" -> a1AbandonedUsers,
    "a2_user_rollup" -> a2UserRollup,
    "a2_rollup_sql" -> a2UserRollupSql,
    "a3_pivot_daily" -> a3PivotDaily,
    "a3_type_daily_rollup" -> a3TypeDailyRollup,
    "a4_token_heatmap" -> a4TokenHeatmap,
    "a5_value_percentiles" -> a5ValuePercentiles,
    "a5_approx_sketches" -> a5ApproxSketches,
    "a5_sketch_bounds" -> a5SketchBounds,
    "a5_approx_twin" -> ((s, dir) => a5ApproxTwin(s, dir)),
    "a6_topk_by_type" -> a6TopkByType,
    "a6_value_quartiles" -> a6ValueQuartiles,
    "a6_quartiles_scaled" -> a6QuartilesScaled,
    "a7_hourly_traffic" -> a7HourlyTraffic,
    "a7_sessionize" -> a7Sessionize,
    "a8_daily_running" -> a8DailyRunning,
    "a8_trailing_window" -> a8TrailingWindow,
    "a9_json_props" -> a9JsonProps,
    "a10_props_map_explode" -> a10PropsMapExplode,
    "a11_error_cohorts" -> a11ErrorCohorts,
    "a11_source_parse" -> a11SourceParse,
    "a11_retry_chains" -> a11RetryChains,
    "a_funnel_conversion" -> aFunnelConversion,
    "a_latency_drift" -> aLatencyDrift,
    "a12_churn_retention" -> a12ChurnRetention,
    "a12_except_all" -> a12ExceptAll,
    "a13_asof_attribution" -> a13AsofAttribution,
    "a13_asof_custom" -> a13AsofCustom,
    "a13_asof_broadcast" -> a13AsofBroadcast,
    "a13_range_join" -> a13RangeJoinBucketed,
    "a2_salted_rollup" -> a2SaltedRollup,
    "a14_dedup_first" -> a14DedupFirst
  )

  /** Shared by a13_asof_custom and a13_asof_broadcast: the two operators
    * produce identical results by construction. */
  private val AsofOracleSql =
    """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS pus, round(value,2) AS purchase_value
      |  FROM ($EVENTS) events WHERE event_type='purchase'),
      |c AS (SELECT user_id AS c_uid, epoch_us(ts) AS cus, value AS click_value
      |  FROM ($EVENTS) events WHERE event_type='click'),
      |j AS (SELECT p.event_id, p.user_id, p.purchase_value, c.click_value,
      |  row_number() OVER (PARTITION BY p.event_id ORDER BY c.cus DESC) AS rn
      |  FROM p LEFT JOIN c ON c.c_uid = p.user_id AND c.cus <= p.pus)
      |SELECT event_id, user_id, purchase_value, round(click_value,2) AS last_click_value
      |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "a15_anomaly_days" ->
      """WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        |  FROM ($EVENTS) events GROUP BY 1),
        |s AS (SELECT avg(n) AS mu, stddev_samp(n) AS sigma FROM d)
        |SELECT day, n, round((n - mu) / NULLIF(sigma, 0) + 1e-9, 4) AS z,
        |CASE WHEN abs((n - mu) / NULLIF(sigma, 0)) > 1.5 THEN 1 ELSE 0 END AS is_anomaly
        |FROM d, s ORDER BY day""".stripMargin,
    "a15_seasonal_dow" ->
      """WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  dayofweek(ts) + 1 AS dow, event_type, count(*) AS n
        |  FROM ($EVENTS) events GROUP BY 1, 2, 3),
        |b AS (SELECT dow, event_type, CAST(sum(n) AS BIGINT) AS tot,
        |  count(*) AS n_days FROM d GROUP BY 1, 2)
        |SELECT d.day, d.event_type, CAST(d.dow AS INTEGER) AS dow, d.n,
        |round(CAST(b.tot AS DOUBLE) / b.n_days + 1e-9, 2) AS expected,
        |round(CAST(d.n * b.n_days AS DOUBLE) / b.tot + 1e-9, 4) AS ratio,
        |(round(CAST(d.n * b.n_days AS DOUBLE) / b.tot + 1e-9, 4) > 1.5 OR
        | round(CAST(d.n * b.n_days AS DOUBLE) / b.tot + 1e-9, 4) < 0.5)
        |  AS anomalous
        |FROM d JOIN b USING (dow, event_type) ORDER BY day, event_type""".stripMargin,
    "a_migration_report" ->
      """WITH base AS (SELECT user_id, count(*) AS n_events,
        |  round(sum(value), 2) AS sum_value,
        |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_errors,
        |  round(quantile_cont(value, 0.5), 4) AS p50_value,
        |  round(quantile_cont(value, 0.95), 4) AS p95_value
        |  FROM ($EVENTS) events GROUP BY 1),
        |s AS (SELECT user_id, min(ts) st FROM ($EVENTS) events WHERE event_type='signup' GROUP BY 1),
        |p AS (SELECT user_id, min(ts) ft FROM ($EVENTS) events WHERE event_type='purchase' GROUP BY 1),
        |life AS (SELECT s.user_id,
        |  CASE WHEN p.ft >= s.st THEN epoch_ms(p.ft) - epoch_ms(s.st) END AS ms_to_purchase
        |  FROM s LEFT JOIN p ON s.user_id = p.user_id),
        |tt AS (SELECT user_id, event_type, count(*) AS n FROM ($EVENTS) events GROUP BY 1, 2),
        |top AS (SELECT user_id, event_type AS top_type FROM (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rn
        |  FROM tt) WHERE rn = 1)
        |SELECT b.user_id, b.n_events, b.sum_value,
        |round(CAST(b.n_errors AS DOUBLE) / b.n_events + 1e-9, 4) AS error_rate,
        |b.p50_value, b.p95_value, top.top_type,
        |CASE WHEN life.user_id IS NULL THEN 'no_signup'
        |  WHEN life.ms_to_purchase IS NULL THEN 'abandoned'
        |  ELSE 'converted' END AS lifecycle,
        |life.ms_to_purchase
        |FROM base b JOIN top ON b.user_id = top.user_id
        |LEFT JOIN life ON b.user_id = life.user_id
        |ORDER BY b.user_id""".stripMargin,
    "a1_lifecycle_pairs" ->
      """WITH s AS (SELECT user_id, min(ts) st FROM ($EVENTS) events WHERE event_type='signup' GROUP BY 1),
        |p AS (SELECT user_id, min(ts) ft FROM ($EVENTS) events WHERE event_type='purchase' GROUP BY 1)
        |SELECT s.user_id, epoch_ms(p.ft) - epoch_ms(s.st) AS ms_to_purchase
        |FROM s JOIN p ON s.user_id = p.user_id WHERE p.ft >= s.st ORDER BY s.user_id""".stripMargin,
    "a1_abandoned_users" ->
      """SELECT DISTINCT user_id FROM ($EVENTS) events WHERE event_type='signup'
        |AND user_id NOT IN (SELECT user_id FROM ($EVENTS) events WHERE event_type='purchase')
        |ORDER BY user_id""".stripMargin,
    "a2_user_rollup" ->
      """SELECT user_id, count(*) AS n_events, count(DISTINCT event_type) AS n_types,
        |round(sum(value),2) AS sum_value,
        |round(avg(value) + 1e-9, 4) AS avg_value,
        |round(max(value),2) AS max_value FROM ($EVENTS) events GROUP BY 1 ORDER BY 1""".stripMargin,
    "a2_rollup_sql" ->
      """SELECT user_id, count(*) AS n_events, count(DISTINCT event_type) AS n_types,
        |round(sum(value),2) AS sum_value,
        |round(avg(value) + 1e-9, 4) AS avg_value,
        |round(max(value),2) AS max_value FROM ($EVENTS) events GROUP BY 1 ORDER BY 1""".stripMargin,
    "a3_pivot_daily" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
        |CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
        |FROM ($EVENTS) events GROUP BY 1 ORDER BY 1""".stripMargin,
    "a3_type_daily_rollup" ->
      """SELECT event_type, day, count(*) AS n, round(sum(value),2) AS sum_value
        |FROM (SELECT event_type, strftime(ts,'%Y-%m-%d') AS day, value FROM ($EVENTS) events)
        |GROUP BY ROLLUP(event_type, day)
        |ORDER BY event_type NULLS FIRST, day NULLS FIRST""".stripMargin,
    "a4_token_heatmap" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text,' ')) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin,
    "a5_value_percentiles" ->
      """SELECT event_type, round(quantile_cont(value,0.5),4) AS p50,
        |round(quantile_cont(value,0.9),4) AS p90, round(quantile_cont(value,0.99),4) AS p99,
        |count(*) AS n FROM ($EVENTS) events GROUP BY 1 ORDER BY 1""".stripMargin,
    // The sketch-contract twin: exact values + literal TRUE bound columns;
    // Spark computes the real bound checks (a5SketchBounds scaladoc).
    "a5_sketch_bounds" ->
      """SELECT event_type, round(quantile_cont(value,0.5),4) AS p50_exact,
        |count(DISTINCT user_id) AS users_exact,
        |TRUE AS p50_in_bound, TRUE AS users_in_bound
        |FROM ($EVENTS) events GROUP BY 1 ORDER BY 1""".stripMargin,
    // Deterministic estimators (hash-sample median, KMV bottom-64) the
    // oracle reproduces exactly — see a5ApproxTwin scaladoc.
    "a5_approx_twin" ->
      """WITH e AS (SELECT event_type, event_id, user_id, value FROM ($EVENTS) events),
        |ex AS (SELECT event_type, round(quantile_cont(value, 0.5), 4) AS p50_exact
        |  FROM e GROUP BY 1),
        |smp AS (SELECT event_type, round(quantile_cont(value, 0.5), 4) AS p50_sample
        |  FROM e WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 1) <= '3'
        |  GROUP BY 1),
        |u AS (SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS h
        |  FROM e WHERE user_id IS NOT NULL),
        |ks AS (SELECT event_type, count(*) AS users_exact,
        |  list_sort(list(h)) AS hs FROM u GROUP BY 1),
        |est AS (SELECT event_type, users_exact,
        |  CASE WHEN users_exact <= 64 THEN users_exact
        |  ELSE CAST(round(63.0 / (CAST(list_sum(list_transform(range(1, 9), j ->
        |    CAST(strpos('0123456789abcdef', substring(hs[64], j, 1)) - 1 AS DOUBLE)
        |      * 16 ** (8 - j))) AS DOUBLE) / 4294967296.0)) AS BIGINT) END AS users_kmv
        |  FROM ks)
        |SELECT ex.event_type, smp.p50_sample, ex.p50_exact,
        |  coalesce(est.users_kmv, 0) AS users_kmv,
        |  coalesce(est.users_exact, 0) AS users_exact
        |FROM ex LEFT JOIN smp USING (event_type) LEFT JOIN est USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "a6_topk_by_type" ->
      """SELECT event_type, rnk, event_id, round(value,2) AS value FROM (
        |SELECT event_type, event_id, value,
        |row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rnk
        |FROM ($EVENTS) events) WHERE rnk <= 5 ORDER BY event_type, rnk""".stripMargin,
    "a6_value_quartiles" ->
      """WITH t AS (SELECT user_id, round(sum(value),2) AS total FROM ($EVENTS) events GROUP BY 1)
        |SELECT user_id, total, ntile(4) OVER (ORDER BY total, user_id) AS quartile,
        |round(percent_rank() OVER (ORDER BY total, user_id), 4) AS pct_rank
        |FROM t ORDER BY user_id""".stripMargin,
    // Spark's exact percentile and DuckDB's quantile_cont share the
    // linear-interpolation definition, so the cut points agree.
    "a6_quartiles_scaled" ->
      """WITH t AS (SELECT user_id, round(sum(value),2) AS total FROM ($EVENTS) events GROUP BY 1),
        |c AS (SELECT quantile_cont(total, 0.25) AS c1, quantile_cont(total, 0.5) AS c2,
        |  quantile_cont(total, 0.75) AS c3 FROM t)
        |SELECT user_id, total,
        |1 + CAST(total > c1 AS INT) + CAST(total > c2 AS INT) + CAST(total > c3 AS INT) AS quartile
        |FROM t, c ORDER BY user_id""".stripMargin,
    "a7_hourly_traffic" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour, event_type,
        |count(*) AS n, round(sum(value),2) AS sum_value
        |FROM ($EVENTS) events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "a7_sessionize" ->
      """WITH x AS (SELECT user_id, event_id, ts,
        |CASE WHEN lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |  OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000
        |  THEN 1 ELSE 0 END AS new_sess FROM ($EVENTS) events),
        |s AS (SELECT user_id, ts, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id FROM x)
        |SELECT user_id, sess_id, count(*) AS n_events,
        |epoch_ms(max(ts)) - epoch_ms(min(ts)) AS dur_ms
        |FROM s GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "a8_daily_running" ->
      """WITH d AS (SELECT strftime(ts,'%Y-%m-%d') AS day, count(*) AS n FROM ($EVENTS) events GROUP BY 1)
        |SELECT day, n, CAST(sum(n) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running,
        |n - lag(n,1) OVER (ORDER BY day) AS delta FROM d ORDER BY day""".stripMargin,
    "a8_trailing_window" ->
      """WITH d AS (SELECT event_type,
        |  date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num,
        |  sum(value) AS sv FROM ($EVENTS) events GROUP BY 1, 2)
        |SELECT event_type, day_num, round(sv + 1e-9, 2) AS day_value,
        |round(sum(sv) OVER (PARTITION BY event_type ORDER BY day_num
        |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) + 1e-9, 2) AS trailing_7d
        |FROM d ORDER BY event_type, day_num""".stripMargin,
    // json_valid guard: Spark's get_json_object/from_json yield NULL on
    // malformed JSON, DuckDB's json functions raise — the CASE/WHERE makes
    // the engines agree (malformed props → NULL bucket / no exploded keys).
    "a9_json_props" ->
      """SELECT (CASE WHEN json_valid(props)
        |  THEN CAST(json_extract_string(props,'$.k') AS BIGINT) END) % 10 AS k_bucket,
        |count(*) AS n, round(sum(value),2) AS sum_value
        |FROM ($EVENTS) events GROUP BY 1 ORDER BY 1""".stripMargin,
    "a10_props_map_explode" ->
      """SELECT key, count(*) AS n,
        |CAST(sum(CAST(json_extract_string(props, '$.' || key) AS BIGINT)) AS BIGINT) AS total
        |FROM (SELECT unnest(json_keys(props)) AS key, props FROM ($EVENTS) events
        |      WHERE props IS NOT NULL AND json_valid(props))
        |GROUP BY key ORDER BY key""".stripMargin,
    "a11_error_cohorts" ->
      """SELECT user_id % 20 AS cohort, count(*) AS n_errors, round(sum(value),2) AS impact
        |FROM ($EVENTS) events WHERE event_type = 'error' GROUP BY 1 ORDER BY 1""".stripMargin,
    "a11_source_parse" ->
      """SELECT regexp_extract(source, '([0-9]+)', 1) AS src_num, lang,
        |count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "a11_retry_chains" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |  (event_type = 'error') AS is_err
        |  FROM ($EVENTS) events WHERE user_id IS NOT NULL),
        |m AS (SELECT *,
        |  row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn,
        |  row_number() OVER (PARTITION BY user_id, is_err
        |    ORDER BY us, event_id) AS rne FROM e),
        |um AS (SELECT user_id, count(*) AS n_events FROM e GROUP BY 1),
        |c AS (SELECT user_id, rn - rne AS grp, count(*) AS len,
        |  min(us) AS st, max(us) AS en, max(rn) AS end_rn
        |  FROM m WHERE is_err GROUP BY 1, 2)
        |SELECT len, count(*) AS n_chains,
        |CAST(sum(CASE WHEN c.end_rn < um.n_events THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_recovered,
        |round(CAST(sum(c.en - c.st) AS DOUBLE) / count(*) / 1e6 + 1e-9, 2)
        |  AS mean_span_s
        |FROM c JOIN um USING (user_id) GROUP BY 1 ORDER BY 1""".stripMargin,
    "a_funnel_conversion" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
        |  FROM ($EVENTS) events WHERE user_id IS NOT NULL),
        |v AS (SELECT user_id, min(us) AS t0 FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(us) AS t1 FROM e JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND us > v.t0 GROUP BY 1),
        |p AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN c USING (user_id)
        |  WHERE event_type = 'purchase' AND us > c.t1 GROUP BY 1),
        |st AS (SELECT 1 AS stage, 'view' AS stage_name, count(*) AS n_users FROM v
        |  UNION ALL SELECT 2, 'click', count(*) FROM c
        |  UNION ALL SELECT 3, 'purchase', count(*) FROM p)
        |SELECT CAST(stage AS BIGINT) AS stage, stage_name,
        |CAST(n_users AS BIGINT) AS n_users,
        |round(CAST(n_users AS DOUBLE) /
        |  coalesce(lag(n_users) OVER (ORDER BY stage), n_users) + 1e-9, 4)
        |  AS conv_rate
        |FROM st ORDER BY stage""".stripMargin,
    "a_latency_drift" ->
      """WITH g AS (SELECT event_type, day(ts) <= 15 AS p1,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.95), 4) AS p95,
        |  count(*) AS n FROM ($EVENTS) events GROUP BY 1, 2),
        |a AS (SELECT event_type, p50 AS p50_a, p95 AS p95_a, n AS n_a
        |  FROM g WHERE p1),
        |b AS (SELECT event_type, p50 AS p50_b, p95 AS p95_b, n AS n_b
        |  FROM g WHERE NOT p1)
        |SELECT event_type, p50_a, p50_b, p95_a, p95_b,
        |CAST(coalesce(n_a, 0) AS BIGINT) AS n_a,
        |CAST(coalesce(n_b, 0) AS BIGINT) AS n_b,
        |round(p50_b - p50_a, 4) AS d_p50, round(p95_b - p95_a, 4) AS d_p95,
        |coalesce(p95_b - p95_a > p95_a * 0.1, false) AS regressed,
        |CASE WHEN p50_a IS NULL THEN 'appeared'
        |  WHEN p50_b IS NULL THEN 'vanished' ELSE 'steady' END AS status
        |FROM a FULL JOIN b USING (event_type) ORDER BY event_type""".stripMargin,
    "a12_churn_retention" ->
      """SELECT 'churned' AS cohort, user_id FROM (
        |  SELECT user_id FROM (SELECT DISTINCT user_id FROM ($EVENTS) events WHERE strftime(ts,'%Y-%m-%d')='2024-01-01')
        |  EXCEPT SELECT user_id FROM (SELECT DISTINCT user_id FROM ($EVENTS) events WHERE strftime(ts,'%Y-%m-%d')='2024-01-02'))
        |UNION ALL
        |SELECT 'retained' AS cohort, user_id FROM (
        |  SELECT user_id FROM (SELECT DISTINCT user_id FROM ($EVENTS) events WHERE strftime(ts,'%Y-%m-%d')='2024-01-02')
        |  INTERSECT SELECT user_id FROM (SELECT DISTINCT user_id FROM ($EVENTS) events WHERE strftime(ts,'%Y-%m-%d')='2024-01-01'))
        |ORDER BY cohort, user_id""".stripMargin,
    "a13_asof_attribution" ->
      """WITH t AS (SELECT event_id, user_id, ts, event_type, value,
        |  CASE WHEN event_type='click' THEN value END AS cv
        |  FROM ($EVENTS) events WHERE event_type IN ('click','purchase')),
        |f AS (SELECT event_id, user_id, event_type, value,
        |  last_value(cv IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lcv FROM t)
        |SELECT event_id, user_id, round(value,2) AS purchase_value,
        |round(lcv,2) AS last_click_value
        |FROM f WHERE event_type='purchase' ORDER BY event_id""".stripMargin,
    "a12_except_all" ->
      """SELECT event_type, count(*) AS surplus FROM (
        |  SELECT event_type FROM ($EVENTS) events WHERE strftime(ts,'%Y-%m-%d')='2024-01-01'
        |  EXCEPT ALL
        |  SELECT event_type FROM ($EVENTS) events WHERE strftime(ts,'%Y-%m-%d')='2024-01-02')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "a13_asof_custom" -> AsofOracleSql,
    "a13_asof_broadcast" -> AsofOracleSql, // broadcast variant, same results
    "a13_range_join" ->
      """SELECT e.event_id,
        |CAST(count(c.cms) AS BIGINT) AS clicks_before
        |FROM (SELECT event_id, user_id, epoch_ms(ts) AS ems FROM ($EVENTS) events WHERE event_type='error') e
        |LEFT JOIN (SELECT user_id, epoch_ms(ts) AS cms FROM ($EVENTS) events WHERE event_type='click') c
        |  ON c.user_id = e.user_id AND c.cms >= e.ems - 600000 AND c.cms < e.ems
        |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin,
    "a2_salted_rollup" ->
      """SELECT user_id, count(*) AS n_events, round(sum(value),2) AS sum_value
        |FROM ($EVENTS) events GROUP BY 1 ORDER BY 1""".stripMargin,
    "a14_dedup_first" ->
      """SELECT user_id, event_type, event_id AS first_event_id, epoch_ms(ts) AS first_ts_ms
        |FROM (SELECT user_id, event_type, event_id, ts,
        |  row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        |  FROM ($EVENTS) events) WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin
  ).map { case (k, v) => k -> v.replace("$EVENTS", EventsSql) }
}
