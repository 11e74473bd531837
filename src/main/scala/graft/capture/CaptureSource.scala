package graft.capture

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion surface for raw hook events (SURVEY.md §2.1 O1).
  *
  * The reference receives events in-process (`run(HookContext)`); a
  * Spark-native deployment receives them as files or a stream. This object
  * owns the raw-event schema (the contract every ingest path shares — the
  * Spark-side analog of the reference's `HookContext` view) and a JSON-lines
  * reader with explicit corrupt-record accounting: malformed lines land in a
  * `_corrupt` column and are surfaced to the caller instead of silently
  * dropped (the reference's "log and skip" on bad events,
  * EventLogger.java:138-147, made observable).
  */
object CaptureSource {

  /** One row per hook firing — the input contract of
    * [[CapturePipeline.events]]. */
  val rawSchema: StructType = StructType(Seq(
    StructField("hookType", StringType),
    StructField("queryId", StringType),
    StructField("queryText", StringType),
    StructField("queryType", StringType),
    StructField("operationId", StringType),
    StructField("sessionId", StringType),
    StructField("threadName", StringType),
    StructField("hiveVersion", StringType),
    StructField("clientIp", StringType),
    StructField("hiveInstanceAddress", StringType),
    StructField("defaultDatabase", StringType),
    StructField("errorMessage", StringType),
    StructField("userName", StringType),
    StructField("ugiUserName", StringType),
    StructField("isHs2", BooleanType),
    StructField("startTimeMs", LongType),
    StructField("endTimeMs", LongType),
    StructField("executionEngine", StringType),
    StructField("entities", ArrayType(StructType(Seq(
      StructField("type", StringType), StructField("name", StringType))))),
    StructField("tasks", ArrayType(StructType(Seq(
      StructField("engine", StringType), StructField("llap", BooleanType),
      StructField("ddl", BooleanType))))),
    StructField("conf", MapType(StringType, StringType)),
    StructField("perf", MapType(StringType, LongType)),
    StructField("tezCounters", ArrayType(ArrayType(
      MapType(StringType, MapType(StringType, LongType))))),
    StructField("mrCounters", ArrayType(ArrayType(
      MapType(StringType, MapType(StringType, LongType))))),
    StructField("jobIds", ArrayType(StringType))
  ))

  /** Read hook events from JSON-lines files. Returns `(events, corrupt)`:
    * well-formed rows with the raw schema, and the original text of every
    * malformed line (for quarantine/alerting). Parsing is text +
    * `from_json` — one scan, and the malformed split is a plain column
    * filter (the DataFrameReader corrupt-column path refuses
    * corrupt-only projections). */
  private val withCorrupt = StructType(
    rawSchema.fields :+ StructField("_corrupt", StringType))
  private val corruptOpts = Map(
    "mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt")

  def fromJsonLines(spark: SparkSession, path: String)
      : (DataFrame, DataFrame) = {
    val parsed = spark.read.text(path)
      .select(from_json(col("value"), withCorrupt, corruptOpts).as("e"))
    val events = parsed.filter(col("e._corrupt").isNull)
      .select(col("e.*")).drop("_corrupt")
    val corrupt = parsed.filter(col("e._corrupt").isNotNull)
      .select(col("e._corrupt").as("raw_line"))
    (events, corrupt)
  }

  /** Streaming twin of [[fromJsonLines]] (corrupt lines dropped; route
    * them via the batch reader in a quarantine job if needed). */
  def streamJsonLines(spark: SparkSession, path: String): DataFrame =
    spark.readStream.text(path)
      .select(from_json(col("value"), withCorrupt, corruptOpts).as("e"))
      .filter(col("e._corrupt").isNull)
      .select(col("e.*")).drop("_corrupt")
}
