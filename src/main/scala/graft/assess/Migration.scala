package graft.assess

import graft.Tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Migration-planning analytics — the assessment layer's "what do we move,
  * and in what order" surface. The reference's captured log exists so the
  * downstream assessment can answer exactly these questions over the
  * `QueryText` and `TablesRead` fields it records (reference
  * `EventRecordConstructor.java:96-117`, `README.md:5-7`):
  *
  *  1. '''Dialect scan''' — which engine-specific SQL constructs appear in
  *     the workload, how often, and how concentrated per user. Hive-isms
  *     (`LATERAL VIEW`, `DISTRIBUTE BY`, `TRANSFORM ... USING`, `STORED
  *     AS`, …) are precisely what a migration must rewrite, so the
  *     per-feature frequency table IS the translation-effort budget.
  *  2. '''Table affinity''' — which tables are read together by the same
  *     query. Tables that co-occur must move in the same migration wave or
  *     every co-read becomes a cross-system join.
  *  3. '''Migration waves''' — connected components of the affinity graph
  *     above a support threshold: the partition of the warehouse into
  *     independently movable units.
  *
  * The driver's `events` table has no SQL text, so — same approach as
  * [[graft.capture.CaptureDemo.capPipeline]]'s synthetic hook contexts —
  * each event row is deterministically rendered into a HiveQL-shaped
  * `query_text` and a tables-read set first, and the REAL scan/affinity
  * operators run on those columns. The DuckDB oracle reproduces the
  * rendering, so it checks the operators end-to-end on 10k+ rows.
  *
  * Scale shape (100 TB log): the render and the feature scan are narrow
  * maps riding the scan (no UDFs — `instr` and `array_compact`/`explode`
  * stay inside codegen); everything downstream aggregates by feature
  * (#features rows), by user, or by table pair (catalog²-bounded, not
  * event-bounded). The wave computation runs label propagation on the
  * catalog-sized affinity graph, never on events.
  */
object Migration {

  type Q = (SparkSession, String) => DataFrame

  /** Valid-event filter shared with [[Assessments]] plus non-null user_id
    * (the render keys statement and table choice off it). */
  private def ev(s: SparkSession, dir: String) = Tables.events(s, dir)
    .filter(col("ts").isNotNull && col("event_type").isNotNull &&
      col("value").isNotNull && col("user_id").isNotNull)

  private val EventsSql =
    "SELECT * FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL " +
      "AND value IS NOT NULL AND user_id IS NOT NULL"

  // ---------------------------------------------------------------- dialect

  /** Migration-relevant dialect features: (name, needle, rewrite weight).
    * Substring needles, not regexes — `instr` is engine-portable and
    * codegen-friendly; weights rank rewrite effort (a `TRANSFORM` script
    * is a manual port; a `SORT BY` is a mechanical edit). */
  private val Features: Seq[(String, String, Int)] = Seq(
    ("lateral_view", "LATERAL VIEW", 3),
    ("transform_using", "TRANSFORM(", 5),
    ("distribute_by", "DISTRIBUTE BY", 2),
    ("cluster_by", "CLUSTER BY", 2),
    ("sort_by", "SORT BY", 1),
    ("insert_overwrite", "INSERT OVERWRITE", 2),
    ("stored_as", "STORED AS", 1),
    ("rlike", " RLIKE ", 1))

  private def tblName(id: Column): Column =
    concat(lit("tbl_"), id.cast("string"))

  /** Deterministic HiveQL render: event_type picks the statement shape,
    * user_id/event_id pick the tables and literals. Each shape carries the
    * dialect features a real workload of that kind would; `view` is
    * deliberately feature-free (portable ANSI) so zero-feature users
    * exist. */
  private def queryText: Column = {
    val t0 = tblName(col("user_id") % 7)
    val t1 = tblName((col("user_id") + 1) % 7)
    val t2 = tblName((col("user_id") + 2) % 7)
    val t3 = tblName((col("user_id") + 3) % 7)
    when(col("event_type") === "view",
      concat(lit("SELECT c1, c2 FROM "), t0,
        lit(" WHERE id = "), col("event_id").cast("string")))
      .when(col("event_type") === "click",
        concat(lit("SELECT a.c1, t.item FROM "), t0,
          lit(" a LATERAL VIEW explode(a.items) t AS item JOIN "), t1,
          lit(" b ON a.id = b.id")))
      .when(col("event_type") === "purchase",
        concat(lit("INSERT OVERWRITE TABLE "), t0,
          lit(" PARTITION (ds) SELECT c1 FROM "), t2,
          lit(" DISTRIBUTE BY c1 SORT BY c2")))
      .when(col("event_type") === "signup",
        concat(lit("CREATE TABLE "), t0,
          lit(" STORED AS ORC AS SELECT c1 FROM "), t3, lit(" CLUSTER BY c1")))
      .otherwise(
        concat(lit("SELECT TRANSFORM(c1) USING 'parse.py' AS c2 FROM "), t0,
          lit(" WHERE c1 RLIKE '^x'")))
  }

  /** The per-query matched-feature array: one `instr` per feature, nulls
    * compacted away — narrow, codegen'd, no UDF. */
  private def matchedFeatures(text: Column): Column =
    array_compact(array(Features.map { case (n, needle, w) =>
      when(instr(text, needle) > 0,
        struct(lit(n).as("feature"), lit(w).as("w")))
    }: _*))

  /** `a_dialect_scan` — workload-wide dialect-feature census: queries and
    * distinct users touching each construct, and that construct's share of
    * the workload. Feature-count output rows; the total-count denominator
    * rides in as a one-row broadcast. */
  def aDialectScan(s: SparkSession, dir: String): DataFrame = {
    val q = ev(s, dir).select(col("user_id"), queryText.as("q_text"))
    val total = q.agg(count(lit(1)).as("n_total"))
    q.select(col("user_id"), explode(matchedFeatures(col("q_text"))).as("f"))
      .select(col("user_id"), col("f.feature").as("feature"), col("f.w").as("w"))
      .groupBy("feature")
      .agg(count(lit(1)).as("n_queries"),
        countDistinct("user_id").as("n_users"),
        first("w").as("weight"))
      .crossJoin(broadcast(total)) // one-row denominator
      .select(col("feature"), col("weight"), col("n_queries"), col("n_users"),
        round(col("n_queries") / col("n_total") + lit(1e-9), 4).as("share"))
      .orderBy("feature")
  }

  /** `a_dialect_complexity` — per-user migration effort: query count,
    * total and average rewrite weight, distinct features touched, and an
    * effort bucket (cut on the ROUNDED average so the label is
    * engine-identical). The ranking is who to sit with first.
    *
    * Scale shape: both constituents reduce to one row per user before the
    * join, so the join is co-partitioned on the groupBy key (A2's payload
    * discipline). */
  def aDialectComplexity(s: SparkSession, dir: String): DataFrame = {
    val q = ev(s, dir).select(col("user_id"),
      matchedFeatures(queryText).as("fs"))
    val perUser = q
      .select(col("user_id"),
        aggregate(col("fs"), lit(0), (acc, f) => acc + f.getField("w"))
          .cast("long").as("q_weight"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_queries"), sum("q_weight").as("tot_weight"))
    val distinctFeats = q
      .select(col("user_id"), explode_outer(col("fs.feature")).as("feature"))
      .groupBy("user_id")
      .agg(countDistinct("feature").as("n_features")) // nulls (no match) skipped
    val avg = round(col("tot_weight") / col("n_queries") + lit(1e-9), 4)
    perUser.join(distinctFeats, Seq("user_id"))
      .select(col("user_id"), col("n_queries"), col("tot_weight"),
        avg.as("avg_weight"), col("n_features"),
        when(avg < 1.5, "low").when(avg < 3.0, "medium").otherwise("high")
          .as("effort"))
      .orderBy("user_id")
  }

  // --------------------------------------------------------------- affinity

  /** Deterministic tables-read render: each query reads its primary table
    * (`user_id % 30`), that table's group head (`ta - ta % 3` — the
    * fact/dim locality every warehouse has), and — for the occasional
    * power user (`user_id % 31 == 0`) — a cross-group table
    * (`(ta + 3) % 30`), which is what makes the wave structure
    * non-trivial. Every 37th query (`event_id % 37 == 0`) is instead an
    * AD-HOC exploration reading `{ta, (ta + 7 + event_id % 11) % 30}` —
    * rare pairs that fall below the wave support threshold, so the cut
    * set ([[aWaveCutCost]]) is non-empty the way a real workload's tail
    * is. Returns (user_id, pairs) with the per-query UNORDERED DISTINCT
    * table pairs as an array — within-query dedup is an `array_distinct`
    * on a ≤3-element array, never a shuffle. */
  private def pairFrame(s: SparkSession, dir: String): DataFrame = {
    val ta = col("user_id") % 30
    val lead = ta - (ta % 3)
    val cross = col("user_id") % 31 === 0
    val tc = (ta + 3) % 30
    val rare = col("event_id") % 37 === 0
    val tr = (ta + 7 + (col("event_id") % 11)) % 30 // never == ta (7..17 mod 30)
    def pair(a: Column, b: Column, keep: Column) =
      when(keep && a =!= b, struct(least(a, b).as("t_lo"), greatest(a, b).as("t_hi")))
    ev(s, dir).select(col("user_id"),
      when(rare, array_compact(array(pair(ta, tr, lit(true)))))
        .otherwise(array_distinct(array_compact(array(
          pair(ta, lead, lit(true)),
          pair(ta, tc, cross),
          pair(lead, tc, cross))))).as("pairs"))
  }

  /** `a_table_affinity` — co-read counts per unordered table pair: how
    * often two tables appear in the same query and how many distinct users
    * depend on the combination. The output is catalog²-bounded; events
    * flow through exactly one explode + grouped aggregate. */
  def aTableAffinity(s: SparkSession, dir: String): DataFrame =
    pairFrame(s, dir)
      .select(col("user_id"), explode(col("pairs")).as("p"))
      .select(col("user_id"), col("p.t_lo").as("t_lo"), col("p.t_hi").as("t_hi"))
      .groupBy("t_lo", "t_hi")
      .agg(count(lit(1)).as("n_co"), countDistinct("user_id").as("n_users"))
      .select(col("t_lo"), col("t_hi"), tblName(col("t_lo")).as("table_a"),
        tblName(col("t_hi")).as("table_b"), col("n_co"), col("n_users"))
      .orderBy("t_lo", "t_hi")

  /** `a_migration_waves` — connected components of the affinity graph
    * above a support threshold (co-read in ≥ 0.5% of queries — scale-free,
    * so the same constant works at every sf): each component is a set of
    * tables that can migrate together without severing frequent co-reads.
    * Singleton tables form their own wave. Same bounded min-label
    * propagation as [[graft.ext.Curation.xDupClusters]]; here the frame is
    * catalog-sized, so each round is a tiny co-partitioned join. */
  /** The wave labeling shared by [[aMigrationWaves]], [[aWaveRollup]] and
    * [[aWaveCutCost]]: (t, wave) for every table read anywhere, wave = min
    * table id of its support-thresholded affinity component. */
  private def waveLabels(s: SparkSession, dir: String,
                         maxRounds: Int = 40): DataFrame =
    waveState(s, dir, maxRounds)._1

  /** (labels, affinity): the wave labeling plus the (t_lo, t_hi, n_co)
    * aggregate it was thresholded from — shared so [[aWaveCutCost]] never
    * pays a second event scan for the identical affinity matrix. */
  private def waveState(s: SparkSession, dir: String,
                        maxRounds: Int = 40): (DataFrame, DataFrame) = {
    val pf = pairFrame(s, dir).localCheckpoint() // shared by edges + nodes
    val total = pf.agg(count(lit(1)).as("n_total"))
    val aff = pf.select(explode(col("pairs")).as("p"))
      .select(col("p.t_lo").as("t_lo"), col("p.t_hi").as("t_hi"))
      .groupBy("t_lo", "t_hi").agg(count(lit(1)).as("n_co"))
      .localCheckpoint() // catalog²-sized; consumed by kept + cut cost
    // support threshold 0.5% of queries: the always-on group edges clear
    // it at every sf, the ad-hoc tail never does — scale-free constant
    val kept = aff.crossJoin(broadcast(total))
      .filter(col("n_co") * 200 >= col("n_total"))
      .select("t_lo", "t_hi")
    val edges = kept.unionByName(
      kept.select(col("t_hi").as("t_lo"), col("t_lo").as("t_hi")))
      .localCheckpoint()
    // universe = every table read anywhere, so waves partition the catalog
    val nodes = pf.select(explode(col("pairs")).as("p"))
      .select(explode(array(col("p.t_lo"), col("p.t_hi"))).as("t"))
      .distinct()
    var labels = nodes.withColumn("wave", col("t")).localCheckpoint()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      val next = labels
        .select(col("t"), col("wave"), col("wave").as("old"))
        .unionByName(edges
          .join(labels, edges("t_hi") === labels("t"))
          .select(edges("t_lo").as("t"), col("wave"),
            lit(null).cast("long").as("old")))
        .groupBy("t")
        .agg(min("wave").as("wave"), max("old").as("old"))
        .localCheckpoint()
      changed = next.filter(col("wave") =!= col("old")).count()
      labels = next.select("t", "wave")
      rounds += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"affinity components did not converge in $maxRounds rounds")
    (labels, aff)
  }

  def aMigrationWaves(s: SparkSession, dir: String,
                      maxRounds: Int = 40): DataFrame = {
    val labels = waveLabels(s, dir, maxRounds)
    val sizes = labels.groupBy("wave").agg(count(lit(1)).as("wave_tables"))
    labels.join(sizes, Seq("wave"))
      .select(col("t").as("table_id"), tblName(col("t")).as("table_name"),
        col("wave"), col("wave_tables"))
      .orderBy("table_id")
  }

  /** `a_wave_rollup` — the migration plan one row per wave: table count,
    * query volume (events whose PRIMARY table lands in the wave), distinct
    * users affected, and the wave's share of the workload. This is the
    * sequencing input: big-share waves migrate when the target is proven,
    * small isolated waves go first.
    *
    * Scale shape: labels are catalog-sized and broadcast into the event
    * scan's groupBy; events flow through one aggregate keyed by primary
    * table, then the catalog-sized frames join. */
  def aWaveRollup(s: SparkSession, dir: String): DataFrame = {
    val labels = waveLabels(s, dir).localCheckpoint()
    val total = ev(s, dir).agg(count(lit(1)).as("n_total"))
    // catalog-sized label dim broadcast into the event scan; events flow
    // through ONE aggregate keyed by wave
    val perWave = ev(s, dir)
      .select((col("user_id") % 30).as("t"), col("user_id"))
      .join(broadcast(labels), Seq("t"))
      .groupBy("wave")
      .agg(count(lit(1)).as("n_q"), countDistinct("user_id").as("n_u"))
    val sizes = labels.groupBy("wave").agg(count(lit(1)).as("n_tables"))
    sizes.join(perWave, Seq("wave"), "left")
      .crossJoin(broadcast(total))
      .select(col("wave"), col("n_tables"),
        coalesce(col("n_q"), lit(0L)).as("n_queries"),
        coalesce(col("n_u"), lit(0L)).as("n_users"),
        round(coalesce(col("n_q"), lit(0L)) / col("n_total") + lit(1e-9), 4)
          .as("share"))
      .orderBy("wave")
  }

  /** `a_wave_cut_cost` — what the wave partition severs: co-read volume
    * between tables that landed in DIFFERENT waves (the below-threshold
    * affinity edges). Every severed co-read is a future cross-system join
    * during the migration window, so this matrix is the coordination-cost
    * estimate per wave pair — and the review gate for the support
    * threshold itself.
    *
    * Scale shape: the affinity matrix is catalog²-bounded; two label
    * joins + one grouped aggregate on it. */
  def aWaveCutCost(s: SparkSession, dir: String): DataFrame = {
    val (labels0, aff) = waveState(s, dir)
    val labels = labels0.localCheckpoint()
    aff
      .join(labels.select(col("t").as("t_lo"), col("wave").as("wave_a")), Seq("t_lo"))
      .join(labels.select(col("t").as("t_hi"), col("wave").as("wave_b")), Seq("t_hi"))
      .filter(col("wave_a") =!= col("wave_b"))
      .select(least(col("wave_a"), col("wave_b")).as("wave_x"),
        greatest(col("wave_a"), col("wave_b")).as("wave_y"), col("n_co"))
      .groupBy("wave_x", "wave_y")
      .agg(count(lit(1)).as("n_edges"), sum("n_co").as("severed_coreads"))
      .orderBy("wave_x", "wave_y")
  }

  /** `a_concurrency_profile` — per-day peak query concurrency: the
    * capacity-planning number that sizes the migration target (slots /
    * warehouses are provisioned against peak concurrent queries, not query
    * counts). Each query becomes an interval `[ts, ts + value sec)`
    * (value is the duration analog the events table carries), clamped to
    * its start day; the classic boundary sweep — +1 at start, −1 at end,
    * running sum — yields the concurrency level at every instant, and the
    * per-day max is the answer. Arrivals sort before departures at the
    * same instant, so touching intervals count as overlapping (the
    * conservative sizing convention); `event_id` makes the sweep order
    * total, hence engine-identical.
    *
    * Scale shape: the sweep window partitions by DAY — each partition is
    * one day's boundaries, never the whole log (the `x_stable_ids`
    * single-partition-window trap). Day-end clamping keeps every
    * interval's two boundaries inside one partition, so no day can go
    * concurrency-negative. */
  def aConcurrencyProfile(s: SparkSession, dir: String): DataFrame = {
    val st = unix_micros(col("ts"))
    val dayEnd = unix_micros(date_trunc("day", col("ts"))) + lit(86399999999L)
    val en = least(st + floor(col("value") * 1e6).cast("long"), dayEnd)
    val base = ev(s, dir).select(
      date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_id"),
      st.as("st"), en.as("en"))
    val bounds = base
      .select(col("day"), col("st").as("t"), lit(1).as("d"), col("event_id"))
      .unionByName(base
        .select(col("day"), col("en").as("t"), lit(-1).as("d"), col("event_id")))
    val w = Window.partitionBy("day")
      .orderBy(col("t").asc, col("d").desc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bounds.withColumn("conc", sum("d").over(w))
      .groupBy("day")
      .agg(max("conc").as("max_concurrent"),
        sum(when(col("d") === 1, 1L).otherwise(0L)).as("n_queries"))
      .orderBy("day")
  }

  // -------------------------------------------------------------- templates

  /** Literal stripping shared by Spark and the oracle: equality literals
    * (`= 123`) and single-quoted strings become `?`. Both patterns are
    * RE2-safe (no lookarounds), so DuckDB's regex engine and the JVM's
    * agree; Spark replaces every occurrence by default, DuckDB needs the
    * `'g'` flag (applied in the oracle). */
  private def template(text: Column): Column =
    regexp_replace(regexp_replace(text, "= [0-9]+", "= ?"), "'[^']*'", "'?'")

  /** `a_template_mining` — recurring-statement census: strip literals from
    * every query text, group by the resulting template, report volume,
    * distinct users, and a stable md5 fingerprint. This is the assessment's
    * unit of translation work — a migration rewrites TEMPLATES, not the
    * millions of literal-varying instances, so the template count (dozens)
    * versus the query count (millions) is the effort compression ratio.
    *
    * Scale shape: the render + two `regexp_replace`s + `md5` ride the scan
    * inside codegen; one grouped aggregate keyed by template (template-count
    * output rows, never event-bounded). */
  def aTemplateMining(s: SparkSession, dir: String): DataFrame =
    templateMiningOver(ev(s, dir)
      .select(col("user_id").cast("string").as("user"),
        queryText.as("query_text")))

  /** [[aTemplateMining]]'s implementation over ANY query log — a frame
    * with `user` and `query_text` columns. The oracle-pinned fixture query
    * and the live capture→assess loop share this one body, so what the
    * DuckDB hash pins is exactly what runs on self-captured events. */
  def templateMiningOver(log: DataFrame): DataFrame =
    log
      .select(col("user"), template(col("query_text")).as("template"))
      .groupBy("template")
      .agg(count(lit(1)).as("n_queries"), countDistinct("user").as("n_users"))
      .select(md5(col("template")).as("tpl_fp"), col("template"),
        col("n_queries"), col("n_users"))
      .orderBy("template")

  /** Adapter from the captured 33-column QueryEvents log to the query-log
    * shape the assessment duals consume: one row per COMPLETED execution
    * with `user`, `kind`, `query_text`, `sub_us`, `duration_ms`,
    * `status`. Plan text is canonicalized (`#123` expression ids and
    * `[id=#42]` plan tags stripped) so two runs of the SAME statement
    * yield the SAME template even though Spark assigns fresh expression
    * ids per analysis — the live analog of literal-stripping. */
  def liveQueryLog(captured: DataFrame): DataFrame =
    captured
      .filter(col("EventType") === "QUERY_COMPLETED" &&
        col("QueryText").isNotNull)
      .select(
        coalesce(col("RequestUser"), col("UserName"), lit("unknown"))
          .as("user"),
        coalesce(col("QueryType"), lit("QUERY")).as("kind"),
        regexp_replace(col("QueryText"), "#\\d+", "#").as("query_text"),
        unix_micros(col("StartTime")).as("sub_us"),
        (unix_millis(col("EndTime")) - unix_millis(col("StartTime")))
          .as("duration_ms"),
        coalesce(col("Status"), lit("UNKNOWN")).as("status"))

  // -------------------------------------------------------------- schedules

  /** Per-run submission instant in epoch micros. Scheduler users
    * (`user_id % 41 == 0` — the cron cohort) submit on a daily grid at a
    * fixed per-user hour, so their inter-run gaps are exact multiples of
    * 24 h; everyone else keeps the raw event instant (ad-hoc). Same
    * deterministic-render approach as [[queryText]]: the events table has
    * no scheduler metadata, so the fixture synthesizes the signal and the
    * DuckDB oracle reproduces it, leaving the DETECTOR (modal-gap
    * regularity) checked end-to-end. */
  private def subUs: Column = {
    val sched = col("user_id") % 41 === 0
    when(sched,
      unix_micros(date_trunc("day", col("ts"))) +
        (col("user_id") % 24) * lit(3600000000L))
      .otherwise(unix_micros(col("ts")))
  }

  /** `a_recurring_jobs` — scheduled-workload detector: for each
    * (user, statement kind), the modal inter-run gap in minutes and the
    * share of gaps hitting that mode (regularity). High-regularity,
    * multi-run series are cron jobs — the migration must port their
    * SCHEDULE (dependencies, calendars), not just their SQL, and they are
    * the safe first movers because reruns are cheap. Runs collapse to
    * distinct submission instants first (a retried cron tick is one run).
    *
    * Scale shape: everything is keyed by (user_id, event_type) — the
    * dedup, the lag window, the gap-histogram groupBy, and the final joins
    * all co-partition on that key; no global window, no driver loop. Output
    * is user×kind-bounded. */
  def aRecurringJobs(s: SparkSession, dir: String): DataFrame =
    recurringJobsOver(ev(s, dir)
      .select(col("user_id"), col("event_type"), subUs.as("sub_us")))

  /** [[aRecurringJobs]]'s implementation over ANY run log — a frame with
    * `user_id`, `event_type` (the series key: statement kind, or a
    * template fingerprint for live plan text) and `sub_us` submission
    * instants. Shared by the fixture oracle and the live loop. */
  def recurringJobsOver(runLog: DataFrame): DataFrame = {
    val runs = runLog
      .select(col("user_id"), col("event_type"), col("sub_us"))
      .distinct()
    val w = Window.partitionBy("user_id", "event_type").orderBy("sub_us")
    val gaps = runs
      .withColumn("gap_min",
        floor((col("sub_us") - lag("sub_us", 1).over(w)) / lit(60000000L)))
      .filter(col("gap_min").isNotNull)
    val hist = gaps.groupBy("user_id", "event_type", "gap_min")
      .agg(count(lit(1)).as("n_gap"))
    val top = Window.partitionBy("user_id", "event_type")
      .orderBy(col("n_gap").desc, col("gap_min").asc)
    val modal = hist.withColumn("rk", row_number().over(top))
      .filter(col("rk") === 1)
      .drop("rk")
    val per = gaps.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_gaps"))
    val reg = round(col("n_gap") / col("n_gaps") + lit(1e-9), 4)
    per.join(modal, Seq("user_id", "event_type"))
      .select(col("user_id"), col("event_type"),
        (col("n_gaps") + 1).as("n_runs"), col("gap_min").as("modal_gap_min"),
        reg.as("regularity"),
        (col("n_gaps") >= 3 && reg >= 0.5).as("scheduled"))
      .orderBy("user_id", "event_type")
  }

  /** The migration report's LIVE face: per-user workload summary over a
    * captured query log ([[liveQueryLog]] shape) — volume, failure rate,
    * duration p50/p95, dominant statement kind, and how many distinct
    * templates the user's queries compress to (the per-user translation
    * effort). Composes the same A2-rollup + A5-percentile + A6-top-kind +
    * template-census shapes the oracle-pinned queries run on the fixture.
    *
    * Scale shape: every constituent is a per-user aggregate of the one
    * log; the joins meet on the groupBy key. percentile() carries exact
    * per-group state — at 100 TB swap percentile_approx, whose error
    * contract a5_sketch_bounds pins. */
  def liveWorkloadReport(log: DataFrame): DataFrame = {
    val base = log.groupBy("user").agg(
      count(lit(1)).as("n_queries"),
      sum(when(col("status") =!= "SUCCESS", 1L).otherwise(0L)).as("n_fail"),
      round(expr("percentile(duration_ms, 0.5D)"), 2).as("p50_ms"),
      round(expr("percentile(duration_ms, 0.95D)"), 2).as("p95_ms"))
    val wTop = Window.partitionBy(col("user"))
      .orderBy(desc("n"), asc("kind"))
    val top = log.groupBy("user", "kind").agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") === 1)
      .select(col("user"), col("kind").as("top_kind"))
    val tpl = log
      .select(col("user"), template(col("query_text")).as("template"))
      .groupBy("user")
      .agg(countDistinct("template").as("n_templates"))
    base
      .join(top, Seq("user"))
      .join(tpl, Seq("user"))
      .select(col("user"), col("n_queries"),
        round(col("n_fail") / col("n_queries") + lit(1e-9), 4)
          .as("fail_rate"),
        col("p50_ms"), col("p95_ms"), col("top_kind"), col("n_templates"))
      .orderBy("user")
  }

  /** `a_wave_schedule` — the wave partition turned into a PHASED PLAN:
    * waves ordered smallest-and-quietest first (fewest tables, then least
    * workload — the proven-path sequencing every migration runbook uses:
    * cheap isolated waves validate the target before the big ones move),
    * with each phase's workload share and the cumulative share migrated
    * so far — "after phase k, X% of queries run on the target".
    *
    * Scale shape: reuses [[waveState]]'s labels; events contribute one
    * aggregate keyed by wave; the ordering window runs on the wave-count
    * frame (bounded by construction). */
  def aWaveSchedule(s: SparkSession, dir: String): DataFrame = {
    val labels = waveLabels(s, dir).localCheckpoint()
    val total = ev(s, dir).agg(count(lit(1)).as("n_total"))
    val perWave = ev(s, dir)
      .select((col("user_id") % 30).as("t"), col("user_id"))
      .join(broadcast(labels), Seq("t"))
      .groupBy("wave").agg(count(lit(1)).as("n_q"))
    val sizes = labels.groupBy("wave").agg(count(lit(1)).as("n_tables"))
    val joined = sizes.join(perWave, Seq("wave"), "left")
      .select(col("wave"), col("n_tables"),
        coalesce(col("n_q"), lit(0L)).as("n_queries"))
    val ord = Window.orderBy(col("n_tables").asc, col("n_queries").asc,
      col("wave").asc)
    val cum = Window.orderBy(col("n_tables").asc, col("n_queries").asc,
      col("wave").asc).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined.crossJoin(broadcast(total))
      .select(row_number().over(ord).cast("long").as("phase"),
        col("wave"), col("n_tables"), col("n_queries"),
        round(col("n_queries") / col("n_total") + lit(1e-9), 4).as("share"),
        round(sum("n_queries").over(cum) / col("n_total") + lit(1e-9), 4)
          .as("cum_share"))
      .orderBy("phase")
  }

  /** `a_capacity_forecast` — the sizing number projected FORWARD: ordinary
    * least squares over the per-day peak-concurrency series (day index →
    * peak), reporting slope, intercept, fit quality, and the projected
    * peak one week past the window — the "how many slots do we buy for
    * cutover month" input. Closed-form OLS from five sums, all over exact
    * integers (day indices and peaks), so every division happens once on
    * the final one-row frame and rounding is engine-identical.
    *
    * Scale shape: the daily-peak series is day-bounded (the concurrency
    * sweep already reduced the log); the regression is ONE grouped-by-
    * nothing aggregate over it — map-side-combinable sums, one output
    * row. */
  def aCapacityForecast(s: SparkSession, dir: String): DataFrame = {
    val prof = aConcurrencyProfile(s, dir)
      .select(col("day"), col("max_concurrent").as("y"))
    val t0 = prof.agg(min("day").as("d0"))
    val series = prof.crossJoin(broadcast(t0))
      .select(datediff(to_date(col("day")), to_date(col("d0")))
        .cast("long").as("t"), col("y"))
    val sums = series.agg(count(lit(1)).as("n"), sum("t").as("st"),
      sum("y").as("sy"), sum(col("t") * col("t")).as("stt"),
      sum(col("t") * col("y")).as("sty"), sum(col("y") * col("y")).as("syy"),
      max("t").as("tmax"))
    val num = col("n") * col("sty") - col("st") * col("sy")
    // nullif guards: a degenerate profile (single day, or all peaks
    // identical) zeroes a denominator, and the two engines disagree on 0/0
    // (ANSI Spark throws, IEEE DuckDB yields inf/NaN) — NULL-on-degenerate
    // is the one answer both produce identically (ADVICE r9).
    val den = nullif(col("n") * col("stt") - col("st") * col("st"), lit(0L))
    val slope = num / den
    val icept = (col("sy") - slope * col("st")) / col("n")
    val r2num = num * num
    val r2den =
      nullif(den * (col("n") * col("syy") - col("sy") * col("sy")), lit(0L))
    sums.select(col("n").as("n_days"),
      round(slope + lit(1e-9), 4).as("slope_per_day"),
      round(icept + lit(1e-9), 2).as("intercept"),
      round(r2num / r2den + lit(1e-9), 4).as("r2"),
      round(icept + slope * (col("tmax") + 7) + lit(1e-9), 2)
        .as("forecast_p7"))
  }

  /** `a_stale_tables` — the "don't migrate dead weight" screen: per table,
    * total reads, LAST read day, days idle versus the corpus's latest
    * activity, a recency-decayed heat score (weight ½ per week of age —
    * exact powers of two, so the float sums are dyadic and
    * engine-identical), and an active/cooling/stale verdict on integer
    * idle-days thresholds. Stale tables get archived, not migrated; the
    * verdict column is the scope cut every assessment starts with.
    *
    * Scale shape: events reduce to (table, day) counts in one pass; the
    * decay/verdict math runs on that day×catalog-bounded frame against a
    * one-row broadcast max-date. */
  def aStaleTables(s: SparkSession, dir: String): DataFrame = {
    val daily = ev(s, dir)
      .select((col("user_id") % 30).as("t"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .groupBy("t", "day").agg(count(lit(1)).as("n"))
    val maxd = daily.agg(max("day").as("dmax"))
    val aged = daily.crossJoin(broadcast(maxd))
      .withColumn("age_w",
        floor(datediff(to_date(col("dmax")), to_date(col("day"))) / 7)
          .cast("int"))
    val perTable = aged.groupBy("t")
      .agg(sum("n").as("n_reads"), max("day").as("last_day"),
        // pow(2, n) is exact for small integer n, so the decayed weights
        // are dyadic rationals and the float sum is engine-identical
        round(sum(col("n") / pow(lit(2.0), col("age_w"))), 4)
          .as("heat"))
    perTable.crossJoin(broadcast(maxd))
      .select(col("t").as("table_id"), tblName(col("t")).as("table_name"),
        col("n_reads"), col("last_day"),
        datediff(to_date(col("dmax")), to_date(col("last_day")))
          .cast("long").as("idle_days"),
        col("heat"),
        when(datediff(to_date(col("dmax")), to_date(col("last_day"))) <= 7,
          "active")
          .when(datediff(to_date(col("dmax")), to_date(col("last_day"))) <= 21,
            "cooling")
          .otherwise("stale").as("verdict"))
      .orderBy("table_id")
  }

  // ---------------------------------------------------------------- advisor

  /** Deterministic catalog-size render: row counts per table id (the
    * catalog stats a real advisor reads from ANALYZE output; the events
    * table carries none, so — as with [[queryText]] — the render supplies
    * them and the oracle reproduces it). Mix spans 500..~23k rows so both
    * sides of the broadcast threshold are populated. */
  private def tblRows(t: Column): Column =
    (t + 1) * 500 + (t % 7) * 1300

  /** `a_join_advisor` — per co-read table pair, the join strategy the
    * target engine should use: BROADCAST when the smaller side fits the
    * broadcast threshold (3k rows here; 10 MB in production), SHUFFLE_HASH
    * when sides are within 2× of each other, SORT_MERGE otherwise — the
    * planner triage a migration runs over its hottest joins, ranked by
    * co-read volume with the per-query shuffled-row cost of the choice.
    *
    * Scale shape: the pair census is the one event-bounded aggregate
    * (catalog²-bounded output); the size render and strategy CASE are
    * narrow integer expressions on that tiny frame. */
  def aJoinAdvisor(s: SparkSession, dir: String): DataFrame = {
    val aff = pairFrame(s, dir)
      .select(explode(col("pairs")).as("p"))
      .select(col("p.t_lo").as("t_lo"), col("p.t_hi").as("t_hi"))
      .groupBy("t_lo", "t_hi").agg(count(lit(1)).as("n_co"))
    val lo = tblRows(col("t_lo"))
    val hi = tblRows(col("t_hi"))
    val small = least(lo, hi)
    val big = greatest(lo, hi)
    val strategy = when(small <= 3000, "broadcast")
      .when(big <= small * 2, "shuffle_hash")
      .otherwise("sort_merge")
    aff.select(col("t_lo"), col("t_hi"),
      lo.as("rows_lo"), hi.as("rows_hi"), col("n_co"),
      strategy.as("strategy"),
      when(small <= 3000, 0L).otherwise(lo + hi).as("shuffle_rows_per_q"))
      .orderBy("t_lo", "t_hi")
  }

  /** `a_readiness_scorecard` — the per-user migration triage, composed
    * from the layer's own analytics: dialect rewrite effort
    * ([[aDialectComplexity]]), scheduled-workload surface (count of
    * [[aRecurringJobs]] cron series — schedules must be ported, not just
    * SQL), and failure pressure (error share of the user's events). The
    * integer score buckets users into ready / assisted / complex — the
    * list that decides who migrates self-serve and who gets an engineer.
    *
    * Scale shape: every constituent reduces to ONE row per user before
    * joining, so the composition is three co-partitioned joins on the
    * groupBy key (the A2 payload discipline), nothing event-bounded past
    * its own aggregate. */
  def aReadinessScorecard(s: SparkSession, dir: String): DataFrame = {
    val cx = aDialectComplexity(s, dir)
      .select("user_id", "n_queries", "tot_weight", "effort")
    val sched = aRecurringJobs(s, dir).filter(col("scheduled"))
      .groupBy("user_id").agg(count(lit(1)).as("n_sched"))
    val fails = ev(s, dir).groupBy("user_id")
      .agg(sum(when(col("event_type") === "error", 1L).otherwise(0L))
        .as("n_err"), count(lit(1)).as("n_ev"))
    readinessScorecardOver(cx, sched, fails)
  }

  /** [[aReadinessScorecard]]'s composition over ANY three per-user
    * frames — `cx(user_id, n_queries, tot_weight, effort)`,
    * `sched(user_id, n_sched)`, `fails(user_id, n_err, n_ev)` — the same
    * shared-body pattern as [[templateMiningOver]]/[[recurringJobsOver]]:
    * the DuckDB-pinned fixture query and the live capture→assess loop run
    * this one body, so the scoring/bucketing the oracle hashes is exactly
    * what triages self-captured workloads. */
  def readinessScorecardOver(cx: DataFrame, sched: DataFrame,
                             fails: DataFrame): DataFrame = {
    val score =
      when(col("effort") === "low", 0L)
        .when(col("effort") === "medium", 1L).otherwise(2L) +
        least(col("n_sched"), lit(3L)) +
        when(col("fail_ratio") > 0.25, 1L).otherwise(0L)
    cx.join(sched, Seq("user_id"), "left")
      .join(fails, Seq("user_id"))
      .withColumn("n_sched", coalesce(col("n_sched"), lit(0L)))
      .withColumn("fail_ratio",
        round(col("n_err") / col("n_ev") + lit(1e-9), 4))
      .withColumn("score", score)
      .select(col("user_id"), col("n_queries"), col("tot_weight"),
        col("effort"), col("n_sched"), col("fail_ratio"), col("score"),
        when(col("score") <= 1, "ready").when(col("score") <= 3, "assisted")
          .otherwise("complex").as("readiness"))
      .orderBy("user_id")
  }

  /** The scorecard's LIVE face over a [[liveQueryLog]]-shaped frame: the
    * dialect-weight constituent has no meaning on Spark plan text, so
    * translation effort comes from TEMPLATE COMPRESSION instead (distinct
    * canonical statements the user must port — `tot_weight` is the
    * template count, bucketed ≤2 low / ≤5 medium / else high); scheduled
    * series are [[recurringJobsOver]] keyed by template fingerprint;
    * failure pressure is the captured Status. Composition, scoring and
    * bucketing are [[readinessScorecardOver]] — identical to the
    * oracle-pinned path. */
  def liveReadinessScorecard(log: DataFrame): DataFrame = {
    val cx = log
      .select(col("user").as("user_id"),
        template(col("query_text")).as("template"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_queries"),
        countDistinct("template").as("tot_weight"))
      .withColumn("effort",
        when(col("tot_weight") <= 2, "low")
          .when(col("tot_weight") <= 5, "medium").otherwise("high"))
    val sched = recurringJobsOver(log.select(col("user").as("user_id"),
        md5(template(col("query_text"))).as("event_type"), col("sub_us")))
      .filter(col("scheduled"))
      .groupBy("user_id").agg(count(lit(1)).as("n_sched"))
    val fails = log.groupBy(col("user").as("user_id"))
      .agg(sum(when(col("status") =!= "SUCCESS", 1L).otherwise(0L))
        .as("n_err"), count(lit(1)).as("n_ev"))
    readinessScorecardOver(cx, sched, fails)
  }

  /** [[Assessments.aLatencyDrift]]'s LIVE face: captured duration drift
    * per statement kind, first half of the OBSERVED capture window versus
    * the second (the fixture splits on day-of-month; a live log's window
    * is whatever was captured, so the midpoint is computed from the log
    * itself and broadcast back — one extra one-row join, no second pass).
    * The drift report body — percentiles, full-outer appeared/vanished
    * arms, regression flag — is [[Assessments.latencyDriftOver]],
    * identical to the oracle-pinned path. */
  def liveLatencyDrift(log: DataFrame): DataFrame = {
    val bounds = log.agg(
      ((min("sub_us") + max("sub_us")) / 2).cast("long").as("mid_us"))
    Assessments.latencyDriftOver(
      log.crossJoin(broadcast(bounds))
        .select(col("kind").as("event_type"),
          (col("sub_us") <= col("mid_us")).as("p1"),
          col("duration_ms").cast("double").as("value")))
  }

  val queries: Map[String, Q] = Map(
    "a_wave_schedule" -> aWaveSchedule,
    "a_capacity_forecast" -> aCapacityForecast,
    "a_stale_tables" -> aStaleTables,
    "a_readiness_scorecard" -> aReadinessScorecard,
    "a_join_advisor" -> aJoinAdvisor,
    "a_template_mining" -> aTemplateMining,
    "a_recurring_jobs" -> aRecurringJobs,
    "a_dialect_scan" -> aDialectScan,
    "a_dialect_complexity" -> aDialectComplexity,
    "a_table_affinity" -> aTableAffinity,
    "a_migration_waves" -> ((s, dir) => aMigrationWaves(s, dir)),
    "a_wave_rollup" -> aWaveRollup,
    "a_wave_cut_cost" -> aWaveCutCost,
    "a_concurrency_profile" -> aConcurrencyProfile
  )

  /** DuckDB twin of [[queryText]] + [[Features]] as CTEs: `q(user_id,
    * q_text)` and `f(feature, needle, weight)`. */
  private val DialectCte =
    """q AS (SELECT user_id, event_id, CASE event_type
      |  WHEN 'view' THEN 'SELECT c1, c2 FROM tbl_' || CAST(user_id % 7 AS VARCHAR)
      |    || ' WHERE id = ' || CAST(event_id AS VARCHAR)
      |  WHEN 'click' THEN 'SELECT a.c1, t.item FROM tbl_' || CAST(user_id % 7 AS VARCHAR)
      |    || ' a LATERAL VIEW explode(a.items) t AS item JOIN tbl_'
      |    || CAST((user_id + 1) % 7 AS VARCHAR) || ' b ON a.id = b.id'
      |  WHEN 'purchase' THEN 'INSERT OVERWRITE TABLE tbl_' || CAST(user_id % 7 AS VARCHAR)
      |    || ' PARTITION (ds) SELECT c1 FROM tbl_' || CAST((user_id + 2) % 7 AS VARCHAR)
      |    || ' DISTRIBUTE BY c1 SORT BY c2'
      |  WHEN 'signup' THEN 'CREATE TABLE tbl_' || CAST(user_id % 7 AS VARCHAR)
      |    || ' STORED AS ORC AS SELECT c1 FROM tbl_' || CAST((user_id + 3) % 7 AS VARCHAR)
      |    || ' CLUSTER BY c1'
      |  ELSE 'SELECT TRANSFORM(c1) USING ''parse.py'' AS c2 FROM tbl_'
      |    || CAST(user_id % 7 AS VARCHAR) || ' WHERE c1 RLIKE ''^x''' END AS q_text
      |  FROM ($EVENTS) events),
      |f AS (SELECT * FROM (VALUES
      |  ('lateral_view', 'LATERAL VIEW', 3), ('transform_using', 'TRANSFORM(', 5),
      |  ('distribute_by', 'DISTRIBUTE BY', 2), ('cluster_by', 'CLUSTER BY', 2),
      |  ('sort_by', 'SORT BY', 1), ('insert_overwrite', 'INSERT OVERWRITE', 2),
      |  ('stored_as', 'STORED AS', 1), ('rlike', ' RLIKE ', 1))
      |  v(feature, needle, weight))""".stripMargin

  /** DuckDB twin of [[pairFrame]]: `pr(user_id, event_id, t_lo, t_hi)`,
    * per-query distinct pairs (ad-hoc queries contribute only their rare
    * pair, like the Spark side). */
  private val PairsCte =
    """g AS (SELECT user_id, event_id, user_id % 30 AS ta,
      |  (user_id % 30) - ((user_id % 30) % 3) AS lead,
      |  (user_id % 31 = 0) AS crossu, ((user_id % 30) + 3) % 30 AS tc,
      |  (event_id % 37 = 0) AS rare,
      |  ((user_id % 30) + 7 + (event_id % 11)) % 30 AS tr
      |  FROM ($EVENTS) events),
      |pr AS (SELECT DISTINCT user_id, event_id, t_lo, t_hi FROM (
      |  SELECT user_id, event_id, least(ta, lead) AS t_lo, greatest(ta, lead) AS t_hi
      |    FROM g WHERE NOT rare AND ta <> lead
      |  UNION ALL
      |  SELECT user_id, event_id, least(ta, tc), greatest(ta, tc)
      |    FROM g WHERE NOT rare AND crossu AND ta <> tc
      |  UNION ALL
      |  SELECT user_id, event_id, least(lead, tc), greatest(lead, tc)
      |    FROM g WHERE NOT rare AND crossu AND lead <> tc
      |  UNION ALL
      |  SELECT user_id, event_id, least(ta, tr), greatest(ta, tr)
      |    FROM g WHERE rare))""".stripMargin

  /** The waves labeling as a CTE suffix (`cl(t, wave)`), shared by the
    * three wave oracles; prepend WITH RECURSIVE. */
  private lazy val WavesCte =
    s"$PairsCte,\n" +
      """tot AS (SELECT count(*) AS n_total FROM ($EVENTS) events),
        |aff0 AS (SELECT t_lo, t_hi, count(*) AS n_co FROM pr GROUP BY 1, 2),
        |ed0 AS (SELECT t_lo, t_hi FROM aff0, tot WHERE n_co * 200 >= tot.n_total),
        |edges AS (SELECT t_lo AS a, t_hi AS b FROM ed0
        |  UNION ALL SELECT t_hi, t_lo FROM ed0),
        |nodes AS (SELECT DISTINCT t FROM (
        |  SELECT t_lo AS t FROM pr UNION ALL SELECT t_hi FROM pr)),
        |reach(t, r) AS (
        |  SELECT t, t FROM nodes
        |  UNION
        |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.t),
        |cl AS (SELECT t, min(r) AS wave FROM reach GROUP BY 1)""".stripMargin

  /** The concurrency-profile oracle, shared verbatim with the capacity
    * forecast (which regresses over the identical daily-peak series). */
  private val ConcProfileSql =
    """WITH b AS (
      |  SELECT strftime(ts, '%Y-%m-%d') AS day, epoch_us(ts) AS t, 1 AS d, event_id
      |    FROM ($EVENTS) events
      |  UNION ALL
      |  SELECT strftime(ts, '%Y-%m-%d'),
      |    least(epoch_us(ts) + CAST(floor(value * 1e6) AS BIGINT),
      |      epoch_us(date_trunc('day', ts)) + 86399999999), -1, event_id
      |    FROM ($EVENTS) events),
      |c AS (SELECT day, d, sum(d) OVER (PARTITION BY day
      |  ORDER BY t, d DESC, event_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc FROM b)
      |SELECT day, CAST(max(conc) AS BIGINT) AS max_concurrent,
      |CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_queries
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  val oracles: Map[String, String] = Map(
    "a_stale_tables" ->
      """WITH daily AS (SELECT user_id % 30 AS t,
        |  strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        |  FROM ($EVENTS) events GROUP BY 1, 2),
        |mx AS (SELECT max(day) AS dmax FROM daily),
        |aged AS (SELECT t, day, n,
        |  CAST(floor(date_diff('day', CAST(day AS DATE), CAST(dmax AS DATE))
        |    / 7.0) AS INTEGER) AS age_w FROM daily, mx),
        |pt AS (SELECT t, CAST(sum(n) AS BIGINT) AS n_reads,
        |  max(day) AS last_day,
        |  round(sum(n / CAST(1 << age_w AS DOUBLE)), 4) AS heat
        |  FROM aged GROUP BY 1)
        |SELECT t AS table_id, 'tbl_' || CAST(t AS VARCHAR) AS table_name,
        |n_reads, last_day,
        |CAST(date_diff('day', CAST(last_day AS DATE), CAST(mx.dmax AS DATE))
        |  AS BIGINT) AS idle_days,
        |heat,
        |CASE WHEN date_diff('day', CAST(last_day AS DATE),
        |    CAST(mx.dmax AS DATE)) <= 7 THEN 'active'
        |  WHEN date_diff('day', CAST(last_day AS DATE),
        |    CAST(mx.dmax AS DATE)) <= 21 THEN 'cooling'
        |  ELSE 'stale' END AS verdict
        |FROM pt, mx ORDER BY table_id""".stripMargin,
    "a_wave_schedule" ->
      (s"WITH RECURSIVE $WavesCte,\n" +
        """q2 AS (SELECT user_id % 30 AS t, user_id FROM ($EVENTS) events),
        |per AS (SELECT cl.wave, count(*) AS n_q
        |  FROM q2 JOIN cl ON q2.t = cl.t GROUP BY 1),
        |sz AS (SELECT wave, count(*) AS n_tables FROM cl GROUP BY 1),
        |j AS (SELECT sz.wave, sz.n_tables,
        |  CAST(coalesce(per.n_q, 0) AS BIGINT) AS n_queries
        |  FROM sz LEFT JOIN per USING (wave)),
        |o AS (SELECT j.*, row_number() OVER (
        |    ORDER BY n_tables, n_queries, wave) AS phase,
        |  sum(n_queries) OVER (ORDER BY n_tables, n_queries, wave
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM j)
        |SELECT CAST(phase AS BIGINT) AS phase, wave, n_tables, n_queries,
        |round(CAST(n_queries AS DOUBLE) / tot.n_total + 1e-9, 4) AS share,
        |round(CAST(cum AS DOUBLE) / tot.n_total + 1e-9, 4) AS cum_share
        |FROM o, tot ORDER BY phase""".stripMargin),
    "a_readiness_scorecard" ->
      (s"WITH $DialectCte,\n" +
        """m AS (SELECT q.event_id, q.user_id, f.weight
        |  FROM q LEFT JOIN f ON instr(q.q_text, f.needle) > 0),
        |pq AS (SELECT event_id, user_id,
        |  CAST(coalesce(sum(weight), 0) AS BIGINT) AS q_weight
        |  FROM m GROUP BY 1, 2),
        |pu AS (SELECT user_id, count(*) AS n_queries,
        |  CAST(sum(q_weight) AS BIGINT) AS tot_weight FROM pq GROUP BY 1),
        |eff AS (SELECT user_id, n_queries, tot_weight,
        |  CASE WHEN round(CAST(tot_weight AS DOUBLE) / n_queries + 1e-9, 4) < 1.5
        |    THEN 'low'
        |  WHEN round(CAST(tot_weight AS DOUBLE) / n_queries + 1e-9, 4) < 3.0
        |    THEN 'medium' ELSE 'high' END AS effort FROM pu),
        |runs AS (SELECT DISTINCT user_id, event_type,
        |  CASE WHEN user_id % 41 = 0
        |    THEN epoch_us(date_trunc('day', ts)) + (user_id % 24) * 3600000000
        |    ELSE epoch_us(ts) END AS sub_us
        |  FROM ($EVENTS) events),
        |gaps AS (SELECT user_id, event_type,
        |  CAST(floor((sub_us - lag(sub_us) OVER (PARTITION BY user_id, event_type
        |    ORDER BY sub_us)) / 60000000.0) AS BIGINT) AS gap_min
        |  FROM runs QUALIFY gap_min IS NOT NULL),
        |hist AS (SELECT user_id, event_type, gap_min, count(*) AS n_gap
        |  FROM gaps GROUP BY 1, 2, 3),
        |modal AS (SELECT user_id, event_type, n_gap FROM hist
        |  QUALIFY row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY n_gap DESC, gap_min ASC) = 1),
        |per AS (SELECT user_id, event_type, count(*) AS n_gaps
        |  FROM gaps GROUP BY 1, 2),
        |sched AS (SELECT per.user_id, count(*) AS n_sched
        |  FROM per JOIN modal USING (user_id, event_type)
        |  WHERE per.n_gaps >= 3 AND
        |    round(CAST(modal.n_gap AS DOUBLE) / per.n_gaps + 1e-9, 4) >= 0.5
        |  GROUP BY 1),
        |fl AS (SELECT user_id,
        |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_err,
        |  count(*) AS n_ev FROM ($EVENTS) events GROUP BY 1),
        |sc AS (SELECT eff.user_id, eff.n_queries, eff.tot_weight, eff.effort,
        |  CAST(coalesce(sched.n_sched, 0) AS BIGINT) AS n_sched,
        |  round(CAST(fl.n_err AS DOUBLE) / fl.n_ev + 1e-9, 4) AS fail_ratio,
        |  CAST((CASE eff.effort WHEN 'low' THEN 0 WHEN 'medium' THEN 1
        |      ELSE 2 END)
        |    + least(coalesce(sched.n_sched, 0), 3)
        |    + (CASE WHEN round(CAST(fl.n_err AS DOUBLE) / fl.n_ev + 1e-9, 4)
        |        > 0.25 THEN 1 ELSE 0 END) AS BIGINT) AS score
        |  FROM eff LEFT JOIN sched USING (user_id) JOIN fl USING (user_id))
        |SELECT *, CASE WHEN score <= 1 THEN 'ready'
        |  WHEN score <= 3 THEN 'assisted' ELSE 'complex' END AS readiness
        |FROM sc ORDER BY user_id""".stripMargin),
    "a_join_advisor" ->
      (s"WITH $PairsCte,\n" +
        """aff AS (SELECT t_lo, t_hi, count(*) AS n_co FROM pr GROUP BY 1, 2),
        |sz AS (SELECT t_lo, t_hi, n_co,
        |  (t_lo + 1) * 500 + (t_lo % 7) * 1300 AS rows_lo,
        |  (t_hi + 1) * 500 + (t_hi % 7) * 1300 AS rows_hi FROM aff)
        |SELECT t_lo, t_hi, CAST(rows_lo AS BIGINT) AS rows_lo,
        |CAST(rows_hi AS BIGINT) AS rows_hi, n_co,
        |CASE WHEN least(rows_lo, rows_hi) <= 3000 THEN 'broadcast'
        |  WHEN greatest(rows_lo, rows_hi) <= least(rows_lo, rows_hi) * 2
        |    THEN 'shuffle_hash'
        |  ELSE 'sort_merge' END AS strategy,
        |CAST(CASE WHEN least(rows_lo, rows_hi) <= 3000 THEN 0
        |  ELSE rows_lo + rows_hi END AS BIGINT) AS shuffle_rows_per_q
        |FROM sz ORDER BY t_lo, t_hi""".stripMargin),
    "a_template_mining" ->
      (s"WITH $DialectCte,\n" +
        """t AS (SELECT user_id,
        |  regexp_replace(regexp_replace(q_text, '= [0-9]+', '= ?', 'g'),
        |    '''[^'']*''', '''?''', 'g') AS template FROM q)
        |SELECT md5(template) AS tpl_fp, template, count(*) AS n_queries,
        |count(DISTINCT user_id) AS n_users
        |FROM t GROUP BY template ORDER BY template""".stripMargin),
    "a_recurring_jobs" ->
      """WITH runs AS (SELECT DISTINCT user_id, event_type,
        |  CASE WHEN user_id % 41 = 0
        |    THEN epoch_us(date_trunc('day', ts)) + (user_id % 24) * 3600000000
        |    ELSE epoch_us(ts) END AS sub_us
        |  FROM ($EVENTS) events),
        |gaps AS (SELECT user_id, event_type,
        |  CAST(floor((sub_us - lag(sub_us) OVER (PARTITION BY user_id, event_type
        |    ORDER BY sub_us)) / 60000000.0) AS BIGINT) AS gap_min
        |  FROM runs QUALIFY gap_min IS NOT NULL),
        |hist AS (SELECT user_id, event_type, gap_min, count(*) AS n_gap
        |  FROM gaps GROUP BY 1, 2, 3),
        |modal AS (SELECT user_id, event_type, gap_min, n_gap FROM hist
        |  QUALIFY row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY n_gap DESC, gap_min ASC) = 1),
        |per AS (SELECT user_id, event_type, count(*) AS n_gaps
        |  FROM gaps GROUP BY 1, 2)
        |SELECT per.user_id, per.event_type, per.n_gaps + 1 AS n_runs,
        |modal.gap_min AS modal_gap_min,
        |round(CAST(modal.n_gap AS DOUBLE) / per.n_gaps + 1e-9, 4) AS regularity,
        |(per.n_gaps >= 3 AND
        |  round(CAST(modal.n_gap AS DOUBLE) / per.n_gaps + 1e-9, 4) >= 0.5)
        |  AS scheduled
        |FROM per JOIN modal USING (user_id, event_type)
        |ORDER BY user_id, event_type""".stripMargin,
    // NB: the dialect CTE contains lines that BEGIN with `||`, so it must
    // be concatenated after stripMargin, never interpolated into another
    // stripMargin string (the outer strip would eat the first `|`).
    "a_dialect_scan" ->
      (s"WITH $DialectCte,\n" +
        """tot AS (SELECT count(*) AS n_total FROM q)
        |SELECT f.feature, f.weight, count(*) AS n_queries,
        |count(DISTINCT q.user_id) AS n_users,
        |round(CAST(count(*) AS DOUBLE) / tot.n_total + 1e-9, 4) AS share
        |FROM q JOIN f ON instr(q.q_text, f.needle) > 0, tot
        |GROUP BY f.feature, f.weight, tot.n_total ORDER BY feature""".stripMargin),
    "a_dialect_complexity" ->
      (s"WITH $DialectCte,\n" +
        """m AS (SELECT q.event_id, q.user_id, f.feature, f.weight
        |  FROM q LEFT JOIN f ON instr(q.q_text, f.needle) > 0),
        |pq AS (SELECT event_id, user_id,
        |  CAST(coalesce(sum(weight), 0) AS BIGINT) AS q_weight
        |  FROM m GROUP BY 1, 2),
        |pu AS (SELECT user_id, count(*) AS n_queries,
        |  CAST(sum(q_weight) AS BIGINT) AS tot_weight FROM pq GROUP BY 1),
        |uf AS (SELECT user_id, count(DISTINCT feature) AS n_features FROM m GROUP BY 1)
        |SELECT pu.user_id, pu.n_queries, pu.tot_weight,
        |round(CAST(pu.tot_weight AS DOUBLE) / pu.n_queries + 1e-9, 4) AS avg_weight,
        |uf.n_features,
        |CASE WHEN round(CAST(pu.tot_weight AS DOUBLE) / pu.n_queries + 1e-9, 4) < 1.5 THEN 'low'
        |  WHEN round(CAST(pu.tot_weight AS DOUBLE) / pu.n_queries + 1e-9, 4) < 3.0 THEN 'medium'
        |  ELSE 'high' END AS effort
        |FROM pu JOIN uf USING (user_id) ORDER BY user_id""".stripMargin),
    "a_table_affinity" ->
      s"""WITH $PairsCte
        |SELECT t_lo, t_hi, 'tbl_' || CAST(t_lo AS VARCHAR) AS table_a,
        |'tbl_' || CAST(t_hi AS VARCHAR) AS table_b,
        |count(*) AS n_co, count(DISTINCT user_id) AS n_users
        |FROM pr GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "a_concurrency_profile" -> ConcProfileSql,
    "a_capacity_forecast" ->
      (s"WITH prof AS ($ConcProfileSql),\n" +
        """d0 AS (SELECT min(day) AS d0 FROM prof),
        |se AS (SELECT date_diff('day', CAST(d0.d0 AS DATE), CAST(day AS DATE))
        |  AS t, max_concurrent AS y FROM prof, d0),
        |su AS (SELECT count(*) AS n, CAST(sum(t) AS BIGINT) AS st,
        |  CAST(sum(y) AS BIGINT) AS sy, CAST(sum(t * t) AS BIGINT) AS stt,
        |  CAST(sum(t * y) AS BIGINT) AS sty, CAST(sum(y * y) AS BIGINT) AS syy,
        |  max(t) AS tmax FROM se)
        |SELECT n AS n_days,
        |round(CAST(n * sty - st * sy AS DOUBLE) / nullif(n * stt - st * st, 0) + 1e-9, 4)
        |  AS slope_per_day,
        |round((sy - CAST(n * sty - st * sy AS DOUBLE) / nullif(n * stt - st * st, 0) * st)
        |  / n + 1e-9, 2) AS intercept,
        |round(CAST(n * sty - st * sy AS DOUBLE) * (n * sty - st * sy) /
        |  nullif((n * stt - st * st) * CAST(n * syy - sy * sy AS DOUBLE), 0) + 1e-9, 4)
        |  AS r2,
        |round((sy - CAST(n * sty - st * sy AS DOUBLE) / nullif(n * stt - st * st, 0) * st)
        |  / n + CAST(n * sty - st * sy AS DOUBLE) / nullif(n * stt - st * st, 0)
        |  * (tmax + 7) + 1e-9, 2) AS forecast_p7
        |FROM su""".stripMargin),
    "a_migration_waves" ->
      (s"WITH RECURSIVE $WavesCte,\n" +
        """sz AS (SELECT wave, count(*) AS wave_tables FROM cl GROUP BY 1)
        |SELECT cl.t AS table_id, 'tbl_' || CAST(cl.t AS VARCHAR) AS table_name,
        |cl.wave, sz.wave_tables
        |FROM cl JOIN sz USING (wave) ORDER BY table_id""".stripMargin),
    "a_wave_rollup" ->
      (s"WITH RECURSIVE $WavesCte,\n" +
        """q2 AS (SELECT user_id % 30 AS t, user_id FROM ($EVENTS) events),
        |per AS (SELECT cl.wave, count(*) AS n_q, count(DISTINCT q2.user_id) AS n_u
        |  FROM q2 JOIN cl ON q2.t = cl.t GROUP BY 1),
        |sz AS (SELECT wave, count(*) AS n_tables FROM cl GROUP BY 1)
        |SELECT sz.wave, sz.n_tables,
        |CAST(coalesce(per.n_q, 0) AS BIGINT) AS n_queries,
        |CAST(coalesce(per.n_u, 0) AS BIGINT) AS n_users,
        |round(CAST(coalesce(per.n_q, 0) AS DOUBLE) / tot.n_total + 1e-9, 4) AS share
        |FROM sz LEFT JOIN per USING (wave), tot ORDER BY wave""".stripMargin),
    "a_wave_cut_cost" ->
      (s"WITH RECURSIVE $WavesCte,\n" +
        """x AS (SELECT la.wave AS wave_a, lb.wave AS wave_b, aff0.n_co
        |  FROM aff0 JOIN cl la ON aff0.t_lo = la.t JOIN cl lb ON aff0.t_hi = lb.t
        |  WHERE la.wave <> lb.wave)
        |SELECT least(wave_a, wave_b) AS wave_x, greatest(wave_a, wave_b) AS wave_y,
        |count(*) AS n_edges, CAST(sum(n_co) AS BIGINT) AS severed_coreads
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  ).map { case (k, v) => k -> v.replace("$EVENTS", EventsSql) }
}
