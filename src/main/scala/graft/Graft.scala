package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session + table-loading helpers shared by Verify, Bench, tests.
  *
  * Config choices (all justified by the local[N] single-JVM environment and
  * the DuckDB oracle):
  *  - `shuffle.partitions` = cores, not 200 (local mode; at cluster scale this
  *    would be sized to ~2-3x total cores / target 128-256 MB per partition).
  *  - AQE on: runtime coalescing of small shuffle partitions + skew-join
  *    splitting — the 100 TB answer to skewed keys.
  *  - UTC session timezone: the reference is epoch-millis UTC everywhere
  *    (reference DatePartitionedRecordsWriterFactory.java:204-206) and the
  *    DuckDB oracle treats naive timestamps as UTC.
  *  - `parquet.inferTimestampNTZ.enabled=false`: testdata parquet stores
  *    unadjusted timestamps; reading them as TIMESTAMP (session-TZ UTC) makes
  *    epoch arithmetic agree with DuckDB's naive-as-UTC semantics.
  *  - `legacy.parquet.nanosAsLong=true`: `events.ts` is TIMESTAMP(NANOS),
  *    which Spark's vectorized reader rejects; we read the raw nanos long and
  *    convert (see [[Tables.events]]).
  */
object Graft {
  def cpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt

  def session(appName: String = "graft", nCpus: Int = cpus): SparkSession = {
    val s = SparkSession
      .builder()
      .master(s"local[$nCpus]")
      .appName(appName)
      // On a cluster, shuffle partitions are sized to the DATA (~128-256 MB
      // each), not to a fixed core count; SPARK_GRAFT_SHUFFLE lets the
      // scale probes model that (the r13 100x octave showed a fixed 32
      // saturating: each partition carried 100x the bytes and spilled).
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", nCpus.toString))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Spark's own remedy for the saturation above, promoted to the
      // DEFAULT (VERDICT r13 #6): every exchange STARTS at 256 partitions
      // and AQE coalesces down from map-output stats, so a 100x corpus
      // gets data-sized partitions without the manual knob while small
      // runs coalesce back to parallelism (r14 measured: sf0.1 bench
      // within noise; the x_jaccard_ngram 30x->100x leg reads ~0.9
      // without SPARK_GRAFT_SHUFFLE — COVERAGE.md). An explicit
      // SPARK_GRAFT_SHUFFLE above 256 still wins: initialPartitionNum
      // never splits below spark.sql.shuffle.partitions.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        math.max(256,
          sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "0").toInt).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Apply graft's read-path configs to an externally created session. */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }
}

/** Loaders for the driver-generated test tables (`TESTDATA.md`). */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case _        => spark.read.parquet(s"$dir/$name.parquet")
    }

  /** `events.parquet` stores `ts` as TIMESTAMP(NANOS); with
    * `nanosAsLong=true` it surfaces as a nanos epoch long. Convert to a
    * microsecond TIMESTAMP with integer arithmetic (a double division would
    * lose precision above 2^53 ns ~ 104 days of epoch time).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    Graft.configure(spark)
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType.typeName match {
      case "long" => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case _      => raw // already a timestamp type (future-proof)
    }
  }
}
