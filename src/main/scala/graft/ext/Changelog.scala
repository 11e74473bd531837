package graft.ext

import graft.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog / lakehouse maintenance analytics: the MERGE-shaped operations a
  * 100 TB table sees every day — latest-wins upsert compaction, SCD2 history
  * reconstruction, time-series gap repair, and robust (median/MAD) outlier
  * detection over ingestion volumes. The `events` table stands in for a CDC
  * change stream keyed by (user_id, event_type).
  *
  * Scale notes per operator are inline; the common theme is that every
  * operator reduces the corpus with ONE map-side-combinable aggregate or ONE
  * key-partitioned window — no self-joins, no global sorts before the final
  * presentation `orderBy`, and dimension frames (date grids, per-key medians)
  * stay broadcast-sized.
  */
object Changelog {

  type Q = (SparkSession, String) => DataFrame

  /** Same valid-event contract as the assessment layer (Assessments.ev):
    * rows missing ts/type/value can't participate, and engine-specific null
    * semantics would otherwise diverge. */
  private def ev(s: SparkSession, dir: String) = Tables.events(s, dir)
    .filter(col("ts").isNotNull && col("event_type").isNotNull &&
      col("value").isNotNull)

  private val EventsSql =
    "SELECT * FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL"

  /** Latest-wins CDC upsert: collapse a change log to its current-state
    * snapshot, one row per (user_id, event_type) key carrying the most
    * recent change (ties broken by event_id) and the change count.
    *
    * This is MERGE INTO's read side expressed as an aggregate:
    * `max(struct(ts, event_id, value))` picks the winner with a PARTIAL,
    * map-side-combinable aggregate — each input partition reduces to at most
    * one candidate row per key before the shuffle, so the exchange carries
    * ~|keys| rows no matter how many changes a hot key absorbed. The usual
    * `row_number() = 1` formulation shuffles every change row and sorts each
    * key group; at a billion changes per day the struct-max plan is the one
    * that survives. */
  def xCdcUpsert(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy("user_id", "event_type")
      .agg(
        max(struct(col("ts"), col("event_id"), col("value"))).as("last"),
        count(lit(1)).as("n_changes"))
      .select(
        col("user_id"), col("event_type"),
        unix_millis(col("last.ts")).as("last_ts_ms"),
        col("last.event_id").as("last_event_id"),
        round(col("last.value"), 6).as("last_value"),
        col("n_changes"))
      .orderBy("user_id", "event_type")

  /** SCD2 history reconstruction: turn the change log into slowly-changing-
    * dimension validity intervals — one row per change with
    * [valid_from, valid_to) bounds, a per-key version number, and the
    * is_current flag (open interval). The inverse of [[xCdcUpsert]]: upsert
    * keeps the last version, this keeps them all with temporal extent.
    *
    * One window, partitioned on the dimension key and ordered by change
    * time — the single required shuffle, and each key's history sorts
    * independently (no global order). At 100 TB the partition count scales
    * with keys, not history depth; a key's full history must fit an
    * executor's sort spill, which SCD dimensions satisfy by construction. */
  def xScd2Intervals(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    ev(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts"), col("value"))
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from_ms", unix_millis(col("ts")))
      .withColumn("valid_to_ms", lead(unix_millis(col("ts")), 1).over(w))
      .select(
        col("user_id"), col("event_type"), col("version"),
        col("event_id"), round(col("value"), 6).as("value"),
        col("valid_from_ms"), col("valid_to_ms"),
        col("valid_to_ms").isNull.as("is_current"))
      .orderBy("user_id", "event_type", "version")
  }

  /** Daily gap-fill + forward fill: regularize a sparse per-user daily
    * series onto the complete calendar grid, carrying the last observed
    * value forward through gaps (the repair step before any
    * fixed-frequency model reads the series). Bounded to user_id < 50 so
    * the emitted grid stays presentation-sized at every sf.
    *
    * Scale shape: the events flow through one (user, day) aggregate
    * (struct-max picks the day's last observation map-side); the calendar
    * bounds are a ONE-ROW broadcast; the grid is |users| × |days| — the
    * output size, unavoidable by definition — and the forward fill is a
    * per-user window over that grid, partitioned on the same key as the
    * aggregate so AQE can reuse the exchange. */
  def xGapfillDaily(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
      .filter(col("user_id").isNotNull && col("user_id") < 50)
    val daily = e
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("last"))
      .select(col("user_id"), col("day"), col("last.value").as("v"))
    val bounds = e.agg(min(to_date(col("ts"))).as("mn"),
      max(to_date(col("ts"))).as("mx"))
    val grid = daily.select("user_id").distinct()
      .crossJoin(broadcast(bounds)) // one-row bounds frame
      .select(col("user_id"), explode(sequence(col("mn"), col("mx"))).as("day"))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(
        col("user_id"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        round(last(col("v"), ignoreNulls = true).over(w), 6).as("value"),
        col("v").isNull.as("is_filled"))
      .orderBy("user_id", "day")
  }

  /** Robust volume anomaly detection: median/MAD z-scores over daily
    * per-type ingestion counts — the outlier-resistant twin of the
    * mean/stddev a15 detector (a single crazy day inflates a stddev and
    * hides itself; it cannot move a median). Uses the 0.6745 consistency
    * constant so |z| ~ N(0,1) scale; MAD=0 (constant series) yields null z
    * and is_outlier=false rather than a division blow-up.
    *
    * The corpus reduces through ONE (type, day) count; medians, deviation
    * medians, and the flag math all run on the days×types frame (30×5 here,
    * still tiny at any corpus scale). Exact interpolated `median` on that
    * reduced frame is cheap — approximation is only warranted where the
    * aggregate itself would explode, which a per-type-day count never does. */
  def xMadOutliers(s: SparkSession, dir: String): DataFrame = {
    val daily = ev(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val med = daily.groupBy("event_type")
      .agg(median(col("n")).as("med"))
    val mad = daily.join(med, "event_type")
      .groupBy("event_type")
      .agg(median(abs(col("n") - col("med"))).as("mad"))
    val z = when(col("mad") === 0, lit(null).cast("double"))
      .otherwise(lit(0.6745) * (col("n") - col("med")) / col("mad"))
    daily.join(med, "event_type").join(mad, "event_type")
      .select(
        col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n"),
        round(col("med"), 6).as("med"),
        round(col("mad"), 6).as("mad"),
        round(z, 6).as("robust_z"),
        coalesce(abs(z) > 3.5, lit(false)).as("is_outlier"))
      .orderBy("event_type", "day")
  }

  /** Ordered conversion funnel: of the users who signed up, how many then
    * clicked (at or after their first signup), and how many of those then
    * purchased (at or after that first qualifying click) — the classic
    * event-sequence analysis, with per-step user counts and conversion
    * rates from the top of the funnel.
    *
    * Scale shape: each step PRE-AGGREGATES to one row per user before the
    * next join (the same payload-shrinking discipline as a1), and every
    * join is a user_id equi-join — co-partitioned with the groupBys, so
    * the chain reuses one exchange layout. The final counts are one-row
    * frames; the funnel table itself is 3 rows at any corpus scale. */
  def xFunnelSteps(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).filter(col("user_id").isNotNull)
    def first(tpe: String) = e.filter(col("event_type") === tpe)
    val s1 = first("signup").groupBy("user_id").agg(min("ts").as("t1"))
    val c1 = first("click").join(s1, "user_id")
      .filter(col("ts") >= col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val p1 = first("purchase").join(c1, "user_id")
      .filter(col("ts") >= col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    def cnt(df: DataFrame, step: String) =
      df.agg(count(lit(1)).as("n_users")).select(lit(step).as("step"),
        col("n_users"))
    val top = s1.agg(count(lit(1)).as("n_top"))
    cnt(s1, "1_signup")
      .unionByName(cnt(c1, "2_click"))
      .unionByName(cnt(p1, "3_purchase"))
      .crossJoin(broadcast(top)) // one-row top-of-funnel count
      .select(col("step"), col("n_users"),
        round(col("n_users") /
          when(col("n_top") === 0, lit(null).cast("double"))
            .otherwise(col("n_top").cast("double")) + lit(1e-9), 6)
          .as("conversion"))
      .orderBy("step")
  }

  /** ANALYZE-style column statistics — the stats collector a cost-based
    * optimizer (or a data-quality monitor) runs over a 100 TB fact table:
    * per-column row count, null count, exact NDV, and min/max, for a
    * representative column of each type class (int key, numeric measure,
    * low-cardinality flag, event time).
    *
    * One single-column aggregate per analyzed column, unioned. With
    * parquet's columnar layout four 1-column scans read exactly the bytes
    * one 4-column scan would, and each distinct count stays a two-phase
    * (partial-dedup, then merge) aggregate over its own column. The
    * alternative — one aggregate with four DISTINCT groups — makes Catalyst
    * Expand every input row 5x (one replica per distinct group plus one for
    * the plain aggregates) before the partial phase; measured at sf0.1 that
    * plan is 3.5x slower (7.1 s vs 2.0 s), and the row multiplication
    * scales with the table. */
  def xTableStats(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    def stats(c: String, minMax: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      li.agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col(c))).as("n_null"),
        countDistinct(col(c)).as("ndv"),
        minMax(min(col(c))).cast("string").as("min_value"),
        minMax(max(col(c))).cast("string").as("max_value"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_null"),
          col("ndv"), col("min_value"), col("max_value"))
    stats("l_orderkey", identity)
      .unionByName(stats("l_quantity", _.cast("decimal(18,2)")))
      .unionByName(stats("l_returnflag", identity))
      .unionByName(stats("l_shipdate", unix_millis))
      .orderBy("column_name")
  }

  /** Snapshot diff — the change-data-feed between two table versions
    * (what a lakehouse MERGE audit or an incremental-sync job computes):
    * v2 is a deterministic mutation of the documents table (1/16 of docs
    * dropped, 2/16 edited, 1/16 cloned as new ids, keyed by the first
    * md5(doc_id) nibble so both engines reproduce it), and the diff is a
    * FULL OUTER join of content fingerprints per id classifying every key
    * as added / removed / changed.
    *
    * Scale shape: both sides reduce to (id, 16-byte fingerprint) at the
    * scan; the full-outer hash join is co-partitioned on the id — the one
    * shuffle — and only non-identical keys survive to the output. */
  def xSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val nib = substring(md5(col("doc_id").cast("string")), 1, 1)
    val v1 = docs.select(col("doc_id"), md5(col("text")).as("fp1"))
    val v2 = docs
      .filter(nib =!= "f") // dropped in v2
      .select(col("doc_id"),
        when(nib <= "1", concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text")).as("text"))
      .unionByName(docs.filter(nib === "e") // cloned under a new id
        .select((col("doc_id") + 10000000L).as("doc_id"),
          concat(col("text"), lit(" [new]")).as("text")))
      .select(col("doc_id"), md5(col("text")).as("fp2"))
    v1.join(v2, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("fp1").isNull, "added")
          .when(col("fp2").isNull, "removed")
          .when(col("fp1") =!= col("fp2"), "changed")
          .otherwise("unchanged").as("status"))
      .filter(col("status") =!= "unchanged")
      .orderBy("doc_id")
  }

  /** Equi-width histogram of a numeric measure — the per-bucket counts a
    * cost-based optimizer's column histogram (or a data-profiling UI)
    * needs beyond min/max: 16 buckets over l_extendedprice with closed
    * bounds. Bucket bounds derive from a ONE-ROW broadcast min/max
    * aggregate; assignment is a narrow map (`least` pins x = max into the
    * last bucket); one grouped count ends it — two scans of one column,
    * no shuffle wider than 16 rows. */
  def xColumnHistogram(s: SparkSession, dir: String,
                       nBuckets: Int = 16): DataFrame = {
    val x = Tables.load(s, dir, "lineitem")
      .select(col("l_extendedprice").as("x"))
      .filter(col("x").isNotNull)
    val b = x.agg(min("x").as("mn"), max("x").as("mx"))
    val w = (col("mx") - col("mn")) / nBuckets
    x.crossJoin(broadcast(b)) // one-row bounds frame
      .select(
        when(col("mx") === col("mn"), lit(0))
          .otherwise(least(lit(nBuckets - 1),
            floor((col("x") - col("mn")) / w)).cast("int")).as("bucket"),
        col("mn"), col("mx"))
      .groupBy("bucket", "mn", "mx") // mn/mx constant: bounds stay in scope
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"), col("n"),
        round(col("mn") + col("bucket") * w + lit(1e-9), 4).as("lo"),
        round(col("mn") + (col("bucket") + 1) * w + lit(1e-9), 4).as("hi"))
      .orderBy("bucket")
  }

  /** Pairwise Pearson correlations between the lineitem measures — the
    * column-dependence profile (price tracks quantity; discount doesn't)
    * that feeds both CBO selectivity guesses and feature-redundancy
    * pruning. ONE aggregate computes all three co-moments in a single
    * scan (each is map-side-combinable), a 3-row stack unpivots; rounding
    * to 4 dp absorbs the partial-merge-order fp noise inherent to
    * distributed co-moment aggregation. */
  def xColumnCorr(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .agg(
        count(lit(1)).as("n"),
        round(corr(col("l_quantity"), col("l_extendedprice")) + lit(1e-9), 4)
          .as("c_qp"),
        round(corr(col("l_quantity"), col("l_discount")) + lit(1e-9), 4)
          .as("c_qd"),
        round(corr(col("l_extendedprice"), col("l_discount")) + lit(1e-9), 4)
          .as("c_pd"))
      .select(expr(
        """stack(3,
          |'l_quantity~l_extendedprice', c_qp,
          |'l_quantity~l_discount', c_qd,
          |'l_extendedprice~l_discount', c_pd)
          |AS (pair, pearson_r)""".stripMargin), col("n"))
      .select(col("pair"), col("n"), col("pearson_r"))
      .orderBy("pair")

  /** OHLC downsampling — the open/high/low/close bars a time-series store
    * derives per (series, day): open/close are the day's first/last value
    * (ties broken by event_id), high/low the extremes. ONE grouped
    * aggregate over the corpus; open/close ride `min_by`/`max_by` on the
    * (ts, event_id) struct so they partial-aggregate map-side like the
    * CDC upsert — never a per-day sort or window. */
  def xOhlcDaily(s: SparkSession, dir: String): DataFrame = {
    val key = struct(col("ts"), col("event_id"))
    ev(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(
        round(min_by(col("value"), key) + lit(1e-9), 4).as("open"),
        round(max("value") + lit(1e-9), 4).as("high"),
        round(min("value") + lit(1e-9), 4).as("low"),
        round(max_by(col("value"), key) + lit(1e-9), 4).as("close"),
        count(lit(1)).as("n"))
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("open"), col("high"), col("low"), col("close"), col("n"))
      .orderBy("event_type", "day")
  }

  /** Median imputation under deterministic corruption: 1/8 of event values
    * are nulled (md5-nibble keyed, so both engines corrupt identically)
    * and repaired with their event-type's median of the SURVIVING values —
    * the standard numeric-imputation step of a cleaning pipeline, with the
    * repair auditable via the imputed flag.
    *
    * Scale shape: the type->median dimension comes from one grouped exact
    * median over the surviving values (a handful of groups — median cost
    * is per-group, not per-corpus) and joins back broadcast-sized; the
    * null injection and repair are narrow maps. */
  def xImputeMedian(s: SparkSession, dir: String): DataFrame = {
    val corrupt = ev(s, dir)
      .select(col("event_id"), col("event_type"),
        when(substring(md5(col("event_id").cast("string")), 1, 1) <= "1",
          lit(null).cast("double"))
          .otherwise(col("value")).as("value"))
    val med = corrupt.filter(col("value").isNotNull)
      .groupBy("event_type")
      .agg(median(col("value")).as("med"))
    corrupt.join(broadcast(med), "event_type")
      .select(
        col("event_id"), col("event_type"),
        round(coalesce(col("value"), col("med")) + lit(1e-9), 4)
          .as("value_imputed"),
        col("value").isNull.as("was_imputed"))
      .orderBy("event_id")
  }

  /** NDV sketch accuracy report — exact distinct counts beside the
    * HyperLogLog estimate a 100 TB profiler would actually run, with the
    * relative error asserted in-plan (the a5_sketch_bounds idiom: the
    * estimate itself is engine-specific, so the oracle-checkable outputs
    * are the exact value and the within-tolerance verdict, which is
    * deterministic because HLL register merges are order-independent).
    * Exact NDV per column is the same two-phase distinct shape as
    * [[xTableStats]]; the HLL runs in the same single-column aggregate. */
  def xNdvSketch(s: SparkSession, dir: String, relTol: Double = 0.1)
      : DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    def one(c: String) = li.agg(
      countDistinct(col(c)).as("ndv_exact"),
      approx_count_distinct(col(c)).as("est"))
      .select(lit(c).as("column_name"), col("ndv_exact"),
        (abs(col("est") - col("ndv_exact")) <=
          col("ndv_exact") * relTol).as("within_tol"))
    one("l_orderkey")
      .unionByName(one("l_partkey"))
      .unionByName(one("l_suppkey"))
      .unionByName(one("l_shipdate"))
      .orderBy("column_name")
  }

  /** Event-type transition matrix — the first-order Markov chain over each
    * user's time-ordered event sequence (what follows a click? how often
    * does a view convert?): per (from, to) pair the transition count and
    * the row-normalized probability. The behavioral fingerprint that
    * drift-checks a funnel redesign, and the input a sequence simulator
    * samples from.
    *
    * One `lead` window partitioned on the user key (each user's history
    * sorts independently — the same single required shuffle as SCD2), then
    * type-pair counting on map-side-combinable aggregates; the row totals
    * join is #types-squared-sized. */
  def xEventTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = ev(s, dir).filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy("event_type", "next_type").agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("event_type").agg(sum("n").as("n_from"))
    pairs.join(totals, "event_type")
      .select(col("event_type").as("from_type"),
        col("next_type").as("to_type"), col("n"),
        round(col("n") / col("n_from") + lit(1e-9), 6).as("p"))
      .orderBy("from_type", "to_type")
  }

  /** Join-key skew report — the diagnostic that decides whether a join
    * needs salting / AQE skew splitting before it melts an executor: the
    * heaviest keys of orders.o_custkey with each key's row count, share of
    * the table, and skew factor vs the mean key. Key counting is one
    * map-side-combinable aggregate; the corpus-wide stats ride a one-row
    * broadcast; the head is TakeOrdered (per-partition top-k), never a
    * full sort of the key histogram. */
  def xSkewReport(s: SparkSession, dir: String, topK: Int = 20): DataFrame = {
    val counts = Tables.load(s, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    val stats = counts.agg(
      sum("n").as("n_rows"),
      avg("n").as("mean_n"))
    counts.orderBy(col("n").desc, col("o_custkey").asc).limit(topK)
      .crossJoin(broadcast(stats)) // one-row stats frame
      .select(col("o_custkey"), col("n"),
        round(col("n") / col("n_rows") + lit(1e-9), 6).as("share"),
        round(col("n") / col("mean_n") + lit(1e-9), 4).as("skew_factor"))
      .orderBy(col("n").desc, col("o_custkey").asc)
  }

  /** Daily unique users, exact beside the HLL estimate with the error
    * asserted in-plan — [[xNdvSketch]]'s idiom applied per group, the way
    * a 100 TB dashboard would actually compute uniques (grouped HLL
    * partials merge map-side; the exact twin is the audit). */
  def xDailyUniques(s: SparkSession, dir: String, relTol: Double = 0.1)
      : DataFrame =
    ev(s, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        countDistinct(col("user_id")).as("uniques_exact"),
        approx_count_distinct(col("user_id")).as("est"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("uniques_exact"),
        (abs(col("est") - col("uniques_exact")) <=
          col("uniques_exact") * relTol).as("within_tol"))
      .orderBy("day")

  /** Stable contiguous row numbering by key order — `row_number() OVER
    * (ORDER BY doc_id)` without the single-partition global sort that
    * window requires (the classic zipWithIndex problem;
    * `monotonically_increasing_id` is neither contiguous nor stable).
    * Range-partition on the key, rank locally within each partition, and
    * add per-partition offsets computed from the partition-size histogram:
    * identical output to the global window, but every corpus-sized step is
    * partition-local. The offset frame is #partitions rows (a running sum
    * over a frame that small is free) and broadcasts back. Partition
    * boundaries come from range-partitioner sampling; ANY boundary choice
    * yields the same final numbering because offsets are derived from the
    * actual partition sizes. */
  def xStableIds(s: SparkSession, dir: String, nParts: Int = 8): DataFrame = {
    val ranged = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"))
      .repartitionByRange(nParts, col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // freeze row->partition placement for both reads
    val offsets = ranged.groupBy("pid").agg(count(lit(1)).as("cnt"))
      .withColumn("offset",
        coalesce(sum("cnt").over(Window.orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "offset")
    val local = Window.partitionBy("pid").orderBy("doc_id")
    ranged.join(broadcast(offsets), "pid")
      .select(col("doc_id"), col("lang"),
        (row_number().over(local) + col("offset")).as("stable_id"))
      .orderBy("doc_id")
  }

  /** Point-in-time dimension lookup — the consumer side of [[xScd2Intervals]]:
    * each purchase joins the signup "profile version" that was valid AT its
    * event time ([valid_from, valid_to) containment, open current
    * interval), which is how a feature store guarantees no future leakage
    * and how a versioned dimension is read correctly.
    *
    * Scale shape: the version history is built with one key-partitioned
    * lead window; the PIT join is a user_id EQUI-join (co-partitioned with
    * the window) plus the containment filter — per-key histories are small
    * by construction, so the range predicate prunes inside a bucket and
    * nothing is quadratic in the corpus. Exactly one interval matches per
    * fact because consecutive versions partition the timeline. */
  def xPitLookup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val dim = ev(s, dir)
      .filter(col("event_type") === "signup" && col("user_id").isNotNull)
      .select(col("user_id"), col("value"), col("ts"), col("event_id"))
      .withColumn("valid_from", col("ts"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id").as("d_uid"), col("value").as("profile_value"),
        col("valid_from"), col("valid_to"))
    val facts = ev(s, dir)
      .filter(col("event_type") === "purchase" && col("user_id").isNotNull)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"), col("value").as("amount"))
    facts.join(dim,
        col("user_id") === col("d_uid") &&
          col("p_ts") >= col("valid_from") &&
          (col("valid_to").isNull || col("p_ts") < col("valid_to")))
      .select(col("purchase_id"), col("user_id"),
        round(col("amount") + lit(1e-9), 4).as("amount"),
        round(col("profile_value") + lit(1e-9), 4).as("profile_value"),
        unix_millis(col("valid_from")).as("version_ms"))
      .orderBy("purchase_id")
  }

  val queries: Map[String, Q] = Map(
    "x_pit_lookup" -> xPitLookup,
    "x_stable_ids" -> ((s, dir) => xStableIds(s, dir)),
    "x_skew_report" -> ((s, dir) => xSkewReport(s, dir)),
    "x_daily_uniques" -> ((s, dir) => xDailyUniques(s, dir)),
    "x_event_transitions" -> xEventTransitions,
    "x_snapshot_diff" -> xSnapshotDiff,
    "x_column_histogram" -> ((s, dir) => xColumnHistogram(s, dir)),
    "x_column_corr" -> xColumnCorr,
    "x_ohlc_daily" -> xOhlcDaily,
    "x_impute_median" -> xImputeMedian,
    "x_ndv_sketch" -> ((s, dir) => xNdvSketch(s, dir)),
    "x_cdc_upsert" -> xCdcUpsert,
    "x_scd2_intervals" -> xScd2Intervals,
    "x_gapfill_daily" -> xGapfillDaily,
    "x_mad_outliers" -> xMadOutliers,
    "x_funnel_steps" -> xFunnelSteps,
    "x_table_stats" -> xTableStats
  )

  val oracles: Map[String, String] = Map(
    "x_column_histogram" ->
      """WITH x AS (SELECT l_extendedprice AS x FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL),
        |b AS (SELECT min(x) AS mn, max(x) AS mx FROM x),
        |h AS (SELECT CASE WHEN mx = mn THEN 0
        |  ELSE CAST(least(15, floor((x - mn) / ((mx - mn) / 16))) AS INT)
        |  END AS bucket, mn, mx FROM x, b)
        |SELECT bucket, count(*) AS n,
        |round(mn + bucket * ((mx - mn) / 16) + 1e-9, 4) AS lo,
        |round(mn + (bucket + 1) * ((mx - mn) / 16) + 1e-9, 4) AS hi
        |FROM h GROUP BY bucket, mn, mx ORDER BY bucket""".stripMargin,
    "x_column_corr" ->
      """WITH a AS (SELECT count(*) AS n,
        |  round(corr(l_quantity, l_extendedprice) + 1e-9, 4) AS c_qp,
        |  round(corr(l_quantity, l_discount) + 1e-9, 4) AS c_qd,
        |  round(corr(l_extendedprice, l_discount) + 1e-9, 4) AS c_pd
        |  FROM lineitem)
        |SELECT 'l_quantity~l_extendedprice' AS pair, n, c_qp AS pearson_r FROM a
        |UNION ALL SELECT 'l_quantity~l_discount', n, c_qd FROM a
        |UNION ALL SELECT 'l_extendedprice~l_discount', n, c_pd FROM a
        |ORDER BY pair""".stripMargin,
    "x_snapshot_diff" ->
      """WITH v1 AS (SELECT doc_id, md5(text) AS fp1 FROM documents),
        |v2raw AS (
        |  SELECT doc_id,
        |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '1'
        |      THEN text || ' [rev2]' ELSE text END AS text
        |  FROM documents
        |  WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> 'f'
        |  UNION ALL
        |  SELECT doc_id + 10000000 AS doc_id, text || ' [new]' AS text
        |  FROM documents
        |  WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = 'e'),
        |v2 AS (SELECT doc_id, md5(text) AS fp2 FROM v2raw),
        |d AS (SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
        |  CASE WHEN fp1 IS NULL THEN 'added'
        |       WHEN fp2 IS NULL THEN 'removed'
        |       WHEN fp1 <> fp2 THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
        |SELECT doc_id, status FROM d WHERE status <> 'unchanged'
        |ORDER BY doc_id""".stripMargin,
    "x_cdc_upsert" ->
      """SELECT user_id, event_type, epoch_ms(ts) AS last_ts_ms,
        |event_id AS last_event_id, round(value, 6) AS last_value, n_changes
        |FROM (SELECT *,
        |  row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts DESC, event_id DESC) AS rn,
        |  count(*) OVER (PARTITION BY user_id, event_type) AS n_changes
        |  FROM ($EVENTS) events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "x_scd2_intervals" ->
      """SELECT user_id, event_type,
        |CAST(row_number() OVER w AS INT) AS version, event_id,
        |round(value, 6) AS value, epoch_ms(ts) AS valid_from_ms,
        |lead(epoch_ms(ts), 1) OVER w AS valid_to_ms,
        |(lead(epoch_ms(ts), 1) OVER w IS NULL) AS is_current
        |FROM ($EVENTS) events
        |WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
        |ORDER BY user_id, event_type, version""".stripMargin,
    "x_gapfill_daily" ->
      """WITH e AS (SELECT * FROM ($EVENTS) events
        |  WHERE user_id IS NOT NULL AND user_id < 50),
        |d AS (SELECT user_id, CAST(ts AS DATE) AS day, value,
        |  row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
        |    ORDER BY ts DESC, event_id DESC) AS rn FROM e),
        |dd AS (SELECT user_id, day, value AS v FROM d WHERE rn = 1),
        |b AS (SELECT min(CAST(ts AS DATE)) AS mn, max(CAST(ts AS DATE)) AS mx
        |  FROM e),
        |g AS (SELECT u.user_id, unnest(generate_series(b.mn, b.mx,
        |  INTERVAL 1 DAY))::DATE AS day
        |  FROM (SELECT DISTINCT user_id FROM e) u, b)
        |SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
        |round(last_value(dd.v IGNORE NULLS) OVER (PARTITION BY g.user_id
        |  ORDER BY g.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
        |  AS value,
        |(dd.v IS NULL) AS is_filled
        |FROM g LEFT JOIN dd ON g.user_id = dd.user_id AND g.day = dd.day
        |ORDER BY g.user_id, day""".stripMargin,
    "x_pit_lookup" ->
      """WITH e AS (SELECT * FROM ($EVENTS) events WHERE user_id IS NOT NULL),
        |dim AS (SELECT user_id AS d_uid, value AS profile_value,
        |  ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS valid_to
        |  FROM e WHERE event_type = 'signup'),
        |f AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts,
        |  value AS amount FROM e WHERE event_type = 'purchase')
        |SELECT purchase_id, user_id,
        |round(amount + 1e-9, 4) AS amount,
        |round(profile_value + 1e-9, 4) AS profile_value,
        |epoch_ms(valid_from) AS version_ms
        |FROM f JOIN dim ON user_id = d_uid
        |  AND p_ts >= valid_from
        |  AND (valid_to IS NULL OR p_ts < valid_to)
        |ORDER BY purchase_id""".stripMargin,
    "x_stable_ids" ->
      """SELECT doc_id, lang,
        |CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS stable_id
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_skew_report" ->
      """WITH c AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1),
        |st AS (SELECT CAST(sum(n) AS BIGINT) AS n_rows, avg(n) AS mean_n
        |  FROM c),
        |top AS (SELECT * FROM c ORDER BY n DESC, o_custkey ASC LIMIT 20)
        |SELECT o_custkey, n,
        |round(n / n_rows::DOUBLE + 1e-9, 6) AS share,
        |round(n / mean_n + 1e-9, 4) AS skew_factor
        |FROM top, st ORDER BY n DESC, o_custkey ASC""".stripMargin,
    "x_daily_uniques" ->
      """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |count(DISTINCT user_id) AS uniques_exact, true AS within_tol
        |FROM ($EVENTS) events GROUP BY 1 ORDER BY 1""".stripMargin,
    "x_event_transitions" ->
      """WITH e AS (SELECT user_id, event_type, ts, event_id
        |  FROM ($EVENTS) events WHERE user_id IS NOT NULL),
        |t AS (SELECT event_type, lead(event_type) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id) AS next_type FROM e),
        |n AS (SELECT event_type, next_type, count(*) AS n FROM t
        |  WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n_from
        |  FROM n GROUP BY 1)
        |SELECT n.event_type AS from_type, next_type AS to_type, n,
        |round(n / n_from::DOUBLE + 1e-9, 6) AS p
        |FROM n JOIN tot USING (event_type) ORDER BY 1, 2""".stripMargin,
    "x_ohlc_daily" ->
      """WITH w AS (SELECT event_type, CAST(ts AS DATE) AS day, value,
        |  row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |    ORDER BY ts, event_id) AS rn_a,
        |  row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |    ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM ($EVENTS) events)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
        |round(max(CASE WHEN rn_a = 1 THEN value END) + 1e-9, 4) AS open,
        |round(max(value) + 1e-9, 4) AS high,
        |round(min(value) + 1e-9, 4) AS low,
        |round(max(CASE WHEN rn_d = 1 THEN value END) + 1e-9, 4) AS close,
        |count(*) AS n
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "x_impute_median" ->
      """WITH c AS (SELECT event_id, event_type,
        |  CASE WHEN substring(md5(CAST(event_id AS VARCHAR)), 1, 1) <= '1'
        |    THEN NULL ELSE value END AS value
        |  FROM ($EVENTS) events),
        |m AS (SELECT event_type, median(value) AS med FROM c
        |  WHERE value IS NOT NULL GROUP BY 1)
        |SELECT event_id, c.event_type,
        |round(coalesce(value, med) + 1e-9, 4) AS value_imputed,
        |(value IS NULL) AS was_imputed
        |FROM c JOIN m USING (event_type) ORDER BY event_id""".stripMargin,
    // The estimate itself is engine-specific; the oracle-checkable outputs
    // are the exact NDV and the within-tolerance verdict (expected true —
    // an HLL drifting past 10% breaks the hash and we WANT to hear it).
    "x_ndv_sketch" ->
      """SELECT 'l_orderkey' AS column_name,
        |  count(DISTINCT l_orderkey) AS ndv_exact, true AS within_tol
        |  FROM lineitem
        |UNION ALL SELECT 'l_partkey', count(DISTINCT l_partkey), true
        |  FROM lineitem
        |UNION ALL SELECT 'l_suppkey', count(DISTINCT l_suppkey), true
        |  FROM lineitem
        |UNION ALL SELECT 'l_shipdate', count(DISTINCT l_shipdate), true
        |  FROM lineitem
        |ORDER BY column_name""".stripMargin,
    "x_funnel_steps" ->
      """WITH e AS (SELECT * FROM ($EVENTS) events WHERE user_id IS NOT NULL),
        |s1 AS (SELECT user_id, min(ts) AS t1 FROM e
        |  WHERE event_type = 'signup' GROUP BY 1),
        |c1 AS (SELECT e.user_id, min(ts) AS t2 FROM e
        |  JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND ts >= t1 GROUP BY 1),
        |p1 AS (SELECT e.user_id, min(ts) AS t3 FROM e
        |  JOIN c1 USING (user_id)
        |  WHERE event_type = 'purchase' AND ts >= t2 GROUP BY 1),
        |f AS (SELECT '1_signup' AS step, count(*) AS n_users FROM s1
        |  UNION ALL SELECT '2_click', count(*) FROM c1
        |  UNION ALL SELECT '3_purchase', count(*) FROM p1)
        |SELECT step, n_users,
        |round(n_users / nullif((SELECT count(*)::DOUBLE FROM s1), 0.0)
        |  + 1e-9, 6) AS conversion
        |FROM f ORDER BY step""".stripMargin,
    "x_table_stats" ->
      """WITH li AS (SELECT * FROM lineitem)
        |SELECT 'l_orderkey' AS column_name, count(*) AS n_rows,
        |  count(*) - count(l_orderkey) AS n_null,
        |  count(DISTINCT l_orderkey) AS ndv,
        |  CAST(min(l_orderkey) AS VARCHAR) AS min_value,
        |  CAST(max(l_orderkey) AS VARCHAR) AS max_value FROM li
        |UNION ALL
        |SELECT 'l_quantity', count(*), count(*) - count(l_quantity),
        |  count(DISTINCT l_quantity),
        |  CAST(CAST(min(l_quantity) AS DECIMAL(18,2)) AS VARCHAR),
        |  CAST(CAST(max(l_quantity) AS DECIMAL(18,2)) AS VARCHAR) FROM li
        |UNION ALL
        |SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
        |  count(DISTINCT l_returnflag), min(l_returnflag), max(l_returnflag)
        |  FROM li
        |UNION ALL
        |SELECT 'l_shipdate', count(*), count(*) - count(l_shipdate),
        |  count(DISTINCT l_shipdate),
        |  CAST(epoch_ms(min(l_shipdate)) AS VARCHAR),
        |  CAST(epoch_ms(max(l_shipdate)) AS VARCHAR) FROM li
        |ORDER BY column_name""".stripMargin,
    "x_mad_outliers" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |  count(*) AS n FROM ($EVENTS) events GROUP BY 1, 2),
        |med AS (SELECT event_type, median(n) AS med FROM daily GROUP BY 1),
        |mad AS (SELECT daily.event_type, median(abs(n - med)) AS mad
        |  FROM daily JOIN med USING (event_type) GROUP BY 1)
        |SELECT daily.event_type, strftime(day, '%Y-%m-%d') AS day, n,
        |round(med, 6) AS med, round(mad, 6) AS mad,
        |round(CASE WHEN mad = 0 THEN NULL
        |  ELSE 0.6745 * (n - med) / mad END, 6) AS robust_z,
        |coalesce(abs(CASE WHEN mad = 0 THEN NULL
        |  ELSE 0.6745 * (n - med) / mad END) > 3.5, false) AS is_outlier
        |FROM daily JOIN med USING (event_type) JOIN mad USING (event_type)
        |ORDER BY event_type, day""".stripMargin
  ).map { case (k, v) => k -> v.replace("$EVENTS", EventsSql) }
}
