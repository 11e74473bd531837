package graft.ext

import graft.Tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout optimization: Z-order clustering and its data-skipping
  * payoff (the capability behind Delta/Iceberg `OPTIMIZE ZORDER BY` —
  * Morton-interleave the hot filter dimensions so min/max file statistics
  * prune multi-dimensional box queries; linear layouts only prune the one
  * leading dimension).
  */
object Layout {

  type Q = (SparkSession, String) => DataFrame

  /** Morton/Z-value: interleave the low `bits` bits of `a` (even positions)
    * and `b` (odd positions). Unrolled into 2·bits shift-and-mask terms so
    * the whole thing stays one codegen'd integer expression — no UDF, no
    * loop at runtime. */
  def zValue(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      (shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  /** Data-skipping report: lay `lineitem` out into 32 files two ways —
    * Z-ordered on (ship-day, partkey) versus linearly ordered on ship-day
    * alone — collect per-file min/max statistics for both dimensions, and
    * count how many files a two-dimensional box predicate must read under
    * each layout. The emitted `files_hit` / `rows_in_hit_files` gap IS the
    * scan I/O a 100 TB table saves from Z-ordering its two hot filter
    * columns.
    *
    * Scale shape: file assignment is VALUE-range bucketing against
    * broadcast global bounds (a narrow map — exactly what
    * `repartitionByRange` does with sampled bounds at scale; never a
    * global-sort `ntile` window); the per-file statistics are two 32-row
    * aggregates; the box probe runs on those 32-row frames. Everything
    * corpus-wide is map + partial aggregate. */
  def xZorderLayout(s: SparkSession, dir: String,
                    files: Int = 32, bits: Int = 12): DataFrame = {
    val mask = (1 << bits) - 1
    val fact = Tables.load(s, dir, "lineitem")
      .select(
        (datediff(col("l_shipdate"), lit(java.sql.Date.valueOf("1992-01-01")))
          .cast("long") % mask).as("a"),
        (col("l_partkey").cast("long") % mask).as("b"))
      .withColumn("z", zValue(col("a"), col("b"), bits))
    val bounds = fact.agg(
      (max(col("z")) + 1).cast("double").as("z_hi"),
      (max(col("a")) + 1).cast("double").as("a_hi"),
      min(col("a")).as("a_min"), max(col("a")).as("a_max"),
      min(col("b")).as("b_min"), max(col("b")).as("b_max"))
    val placed = fact.crossJoin(broadcast(bounds))
      .select(col("a"), col("b"),
        floor(col("z") * files / col("z_hi")).as("file_z"),
        floor(col("a") * files / col("a_hi")).as("file_lin"))
    def stats(fileCol: String, layout: String): DataFrame =
      placed.groupBy(col(fileCol).as("file"))
        .agg(count(lit(1)).as("n_rows"),
          min("a").as("min_a"), max("a").as("max_a"),
          min("b").as("min_b"), max("b").as("max_b"))
        .select(lit(layout).as("layout"), col("file"), col("n_rows"),
          col("min_a"), col("max_a"), col("min_b"), col("max_b"))
    // Two probes, box edges derived from the OBSERVED dimension ranges (an
    // absolute box would silently go vacuous on a corpus whose dates sit
    // elsewhere): `band_a` filters the middle 10% of ship-days, `band_b`
    // the middle 10% of partkeys. The min/max overlap test is exactly the
    // file-pruning decision a lakehouse reader makes from footer stats —
    // linear can only prune `band_a`; Z-order prunes both.
    def band(lo: Column, hi: Column): (Column, Column) =
      (floor(lo + (hi - lo) * 0.45), floor(lo + (hi - lo) * 0.55))
    val (aLo, aHi) = band(col("a_min"), col("a_max"))
    val (bLo, bHi) = band(col("b_min"), col("b_max"))
    val hitA = col("min_a") <= aHi && col("max_a") >= aLo
    val hitB = col("min_b") <= bHi && col("max_b") >= bLo
    stats("file_z", "zorder").unionAll(stats("file_lin", "linear"))
      .crossJoin(broadcast(bounds))
      .select(col("layout"), col("n_rows"),
        explode(array(
          struct(lit("band_a").as("probe"), hitA.as("hit")),
          struct(lit("band_b").as("probe"), hitB.as("hit"))))
          .as("p"))
      .groupBy(col("layout"), col("p.probe").as("probe"))
      .agg(count(lit(1)).as("n_files"),
        sum(when(col("p.hit"), 1L).otherwise(0L)).as("files_hit"),
        sum(when(col("p.hit"), col("n_rows")).otherwise(0L))
          .as("rows_in_hit_files"))
      .orderBy("layout", "probe")
  }

  /** `x_compaction_plan` — the small-file `OPTIMIZE` planner: given a
    * date-partitioned file listing, pack each partition's small files into
    * target-sized rewrite groups and leave already-compact files alone —
    * the bin-packing pass behind lakehouse `OPTIMIZE` / compaction jobs.
    *
    * The listing is rendered from lineitem (one "file" per partition-month
    * and ship-day, size = its row count) with a deliberate heavy tail —
    * every 13th day's file is 10× — so the keep/rewrite split is
    * non-vacuous at every sf. The per-partition size target is
    * `ceil(total/8)` (scale-free); files at or above it are kept as-is
    * (rewriting them buys nothing), the rest pack sequentially in listing
    * order: bin = exclusive-running-size div target — one window pass, the
    * single-scan greedy a streaming compactor does.
    *
    * Scale shape: the listing aggregate is one grouped count; targets are
    * one partition-count-sized frame broadcast back; packing is a window
    * partitioned BY DATE PARTITION (never global); output is
    * partitions×(bins+1) rows. All integer arithmetic — `div`, no float
    * boundaries. */
  def xCompactionPlan(s: SparkSession, dir: String, bins: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val files = Tables.load(s, dir, "lineitem")
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("part"),
        dayofmonth(col("l_shipdate")).cast("long").as("file_id"))
      .agg(count(lit(1)).as("n_rows"))
      .select(col("part"), col("file_id"),
        (col("n_rows") *
          when(col("file_id") % 13 === 0, 10L).otherwise(1L)).as("size"))
    val tgt = files.groupBy("part")
      .agg(expr(s"(sum(size) + ${bins - 1}) div $bins").as("tgt"))
    val sized = files.join(broadcast(tgt), Seq("part"))
    val keeps = sized.filter(col("size") >= col("tgt"))
      .groupBy("part")
      .agg(count(lit(1)).as("n_files"), sum("size").as("bytes"))
      .select(col("part"), lit(-1L).as("bin"), col("n_files"), col("bytes"),
        lit("keep").as("action"))
    val w = Window.partitionBy("part").orderBy("file_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val rewrites = sized.filter(col("size") < col("tgt"))
      .withColumn("cum_before", coalesce(sum("size").over(w), lit(0L)))
      .withColumn("bin", expr("cum_before div tgt"))
      .groupBy("part", "bin")
      .agg(count(lit(1)).as("n_files"), sum("size").as("bytes"))
      .withColumn("action", lit("rewrite"))
    keeps.unionByName(rewrites).orderBy("part", "bin")
  }

  /** `x_range_partition_plan` — the sampled range partitioner made
    * inspectable: draw a deterministic ~1/16 sample of the sort key, take
    * its rank-based boundary values at the 8 bucket edges, assign EVERY
    * row to a bucket by counting boundaries below it (a broadcast
    * array + one codegen'd HOF — exactly how `repartitionByRange` places
    * rows against its collected sample bounds), and report the per-bucket
    * row counts and key ranges. The report IS the skew check a 100 TB sort
    * runs before committing to a layout: sampled bounds promise ≈N/8 per
    * bucket; the output shows what they deliver.
    *
    * Scale shape: the only global ordering touches the SAMPLE (the one
    * frame a range partitioner centralizes by design — Spark's own
    * RangePartitioner collects it); the full-data pass is a narrow map
    * against broadcast bounds plus one grouped aggregate. The md5 draw
    * makes the sample — hence the whole report — engine-deterministic. */
  def xRangePartitionPlan(s: SparkSession, dir: String,
                          buckets: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").as("v"))
    val sample = li.filter(substring(md5(concat_ws("-",
      col("l_orderkey"), col("l_linenumber"))), 1, 1) === "0")
    // rank the sample under a total order; boundary i sits at rank
    // floor(i*m/buckets) — the sample is the bounded frame, so the global
    // window is the legitimate single-partition exception here
    val m = sample.agg(count(lit(1)).as("m"))
    val ranked = sample
      .withColumn("rn", row_number().over(
        Window.orderBy(col("v"), col("l_orderkey"), col("l_linenumber"))))
    // boundary ranks floor(i*m/buckets), i = 1..buckets-1 — strictly
    // increasing (hence distinct) whenever m >= buckets; under a degenerate
    // sample (m < buckets) colliding ranks still select each boundary row
    // ONCE (this is a filter, and the oracle dedupes its rank set to match),
    // so the two engines agree at every m, buckets just collapse
    val bounds = ranked.crossJoin(broadcast(m))
      .filter(array_contains(
        expr(s"transform(sequence(1, ${buckets - 1}), " +
          "i -> (CAST(i AS BIGINT) * m) div " + buckets + ")"),
        col("rn").cast("long")))
      .groupBy().agg(sort_array(collect_list(col("v"))).as("bnds"))
    val assigned = li.crossJoin(broadcast(bounds))
      .select(aggregate(col("bnds"), lit(0L),
        (acc, b) => acc + when(col("v") > b, 1L).otherwise(0L)).as("bucket"),
        col("v"))
    assigned.groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        round(min("v"), 2).as("lo"), round(max("v"), 2).as("hi"))
      .orderBy("bucket")
  }

  val queries: Map[String, Q] = Map(
    "x_zorder_layout" -> ((s, dir) => xZorderLayout(s, dir)),
    "x_compaction_plan" -> ((s, dir) => xCompactionPlan(s, dir)),
    "x_range_partition_plan" -> ((s, dir) => xRangePartitionPlan(s, dir))
  )

  // Morton interleave in DuckDB: the same 24 shift-and-mask terms, summed.
  private val ZTerms: String = (0 until 12).map { i =>
    s"(((a >> $i) & 1) << ${2 * i}) + (((b >> $i) & 1) << ${2 * i + 1})"
  }.mkString(" + ")

  val oracles: Map[String, String] = Map(
    "x_zorder_layout" ->
      s"""WITH f AS (SELECT
        |  CAST(datediff('day', DATE '1992-01-01', l_shipdate) AS BIGINT)
        |    % 4095 AS a,
        |  CAST(l_partkey AS BIGINT) % 4095 AS b FROM lineitem),
        |z AS (SELECT a, b, $ZTerms AS z FROM f),
        |bounds AS (SELECT CAST(max(z) + 1 AS DOUBLE) AS z_hi,
        |  CAST(max(a) + 1 AS DOUBLE) AS a_hi,
        |  min(a) AS a_min, max(a) AS a_max,
        |  min(b) AS b_min, max(b) AS b_max FROM z),
        |placed AS (SELECT a, b,
        |  CAST(floor(z * 32 / z_hi) AS BIGINT) AS file_z,
        |  CAST(floor(a * 32 / a_hi) AS BIGINT) AS file_lin FROM z, bounds),
        |sz AS (SELECT 'zorder' AS layout, file_z AS file, count(*) AS n_rows,
        |  min(a) AS min_a, max(a) AS max_a, min(b) AS min_b, max(b) AS max_b
        |  FROM placed GROUP BY 2),
        |sl AS (SELECT 'linear' AS layout, file_lin AS file, count(*) AS n_rows,
        |  min(a) AS min_a, max(a) AS max_a, min(b) AS min_b, max(b) AS max_b
        |  FROM placed GROUP BY 2),
        |u AS (SELECT * FROM sz UNION ALL SELECT * FROM sl),
        |e AS (SELECT floor(a_min + 0.45 * (a_max - a_min)) AS a_lo,
        |  floor(a_min + 0.55 * (a_max - a_min)) AS a_hi2,
        |  floor(b_min + 0.45 * (b_max - b_min)) AS b_lo,
        |  floor(b_min + 0.55 * (b_max - b_min)) AS b_hi2 FROM bounds),
        |h AS (SELECT layout, n_rows, probe,
        |  CASE WHEN probe = 'band_a'
        |    THEN (min_a <= a_hi2 AND max_a >= a_lo)
        |    ELSE (min_b <= b_hi2 AND max_b >= b_lo) END AS hit
        |  FROM u, e, (VALUES ('band_a'), ('band_b')) p(probe))
        |SELECT layout, probe, count(*) AS n_files,
        |CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS files_hit,
        |CAST(sum(CASE WHEN hit THEN n_rows ELSE 0 END) AS BIGINT)
        |  AS rows_in_hit_files
        |FROM h GROUP BY layout, probe ORDER BY layout, probe""".stripMargin,
    "x_compaction_plan" ->
      """WITH f0 AS (SELECT strftime(l_shipdate, '%Y-%m') AS part,
        |  CAST(day(l_shipdate) AS BIGINT) AS file_id FROM lineitem),
        |files AS (SELECT part, file_id,
        |  count(*) * (CASE WHEN file_id % 13 = 0 THEN 10 ELSE 1 END) AS size
        |  FROM f0 GROUP BY 1, 2),
        |tgt AS (SELECT part, (sum(size) + 7) // 8 AS tgt FROM files GROUP BY 1),
        |sized AS (SELECT f.*, t.tgt FROM files f JOIN tgt t USING (part)),
        |keeps AS (SELECT part, CAST(-1 AS BIGINT) AS bin,
        |  count(*) AS n_files, CAST(sum(size) AS BIGINT) AS bytes,
        |  'keep' AS action
        |  FROM sized WHERE size >= tgt GROUP BY 1),
        |packed AS (SELECT part, tgt, size,
        |  coalesce(sum(size) OVER (PARTITION BY part ORDER BY file_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM sized WHERE size < tgt),
        |rewrites AS (SELECT part, CAST(cum_before // tgt AS BIGINT) AS bin,
        |  count(*) AS n_files, CAST(sum(size) AS BIGINT) AS bytes,
        |  'rewrite' AS action
        |  FROM packed GROUP BY 1, 2)
        |SELECT * FROM keeps UNION ALL SELECT * FROM rewrites
        |ORDER BY part, bin""".stripMargin,
    "x_range_partition_plan" ->
      """WITH li AS (SELECT l_orderkey, l_linenumber, l_extendedprice AS v
        |  FROM lineitem),
        |s AS (SELECT * FROM li WHERE substring(md5(
        |  CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)
        |  ), 1, 1) = '0'),
        |r AS (SELECT v, row_number() OVER (
        |  ORDER BY v, l_orderkey, l_linenumber) AS rn FROM s),
        |mm AS (SELECT count(*) AS m FROM s),
        |rk AS (SELECT DISTINCT (i * m) // 8 AS rk
        |  FROM mm, (SELECT unnest(range(1, 8)) AS i) g),
        |b AS (SELECT v FROM r JOIN rk ON r.rn = rk.rk),
        |bl AS (SELECT coalesce(list_sort(list(v)), []) AS bnds FROM b),
        |a AS (SELECT li.v,
        |  len(list_filter(bl.bnds, b -> li.v > b)) AS bucket FROM li, bl)
        |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_rows,
        |round(min(v), 2) AS lo, round(max(v), 2) AS hi
        |FROM a GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
