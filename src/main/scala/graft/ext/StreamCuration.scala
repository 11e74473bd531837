package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming ingestion curation — the continuous face of the corpus
  * pipeline: documents arrive as files, are quality-filtered and
  * exact-deduplicated IN THE STREAM, and land in a lang-partitioned,
  * checkpointed parquet sink. This is how a crawl feed reaches the corpus
  * without a nightly batch re-read: only new files are processed per
  * trigger, dedup state is the 16-byte content-fingerprint set (bounded by
  * the corpus's distinct-text count, not its volume; at web scale pair
  * with a TTL'd watermark state or hand incremental batches to
  * [[Dedup.xDedupIncremental]]).
  *
  * The round trip is verified end-to-end: the DuckDB oracle aggregates the
  * deduplicated BATCH view of the same table, so the check passes only if
  * the stream kept exactly one row per (lang, content) surviving the
  * quality floor — exactly-once through the sink included.
  */
object StreamCuration {

  type Q = (SparkSession, String) => DataFrame

  private lazy val scratchRoot: java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft_doc_stream_")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    sys.addShutdownHook(rm(root.toFile))
    root
  }

  def xStreamCurate(s: SparkSession, dir: String,
                    minTokens: Int = 20): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory(scratchRoot, "run_")
    val out = s"$tmp/corpus"
    val ckpt = s"$tmp/ckpt"
    val src = s"$dir/documents.parquet"
    val batchSchema = s.read.parquet(src).schema
    // The file source streams the parent DIRECTORY with a glob pinned to
    // the one table file (same idiom as the capture round trips).
    val raw = s.readStream.schema(batchSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    def curate(df: DataFrame): DataFrame = df
      .filter(col("text").isNotNull)
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .filter(col("n_tok") >= minTokens)
      .withColumn("fp", md5(col("text")))
    val q = curate(raw)
      .dropDuplicates("lang", "fp")
      .select("doc_id", "lang", "fp", "n_tok")
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .partitionBy("lang")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // Loud-failure guard: a silent 0-row stream (e.g. the glob no longer
    // matches the table layout) must not pass as an empty-but-green result.
    // The expected count comes from the batch view of the same source
    // through the same curation filters.
    val expected = curate(s.read.parquet(src))
      .select("lang", "fp").distinct().count()
    if (expected == 0L) {
      // Legitimately-empty source (every doc below the floor): the sink may
      // hold no data files at all, so return the typed empty aggregate
      // instead of reading it.
      import s.implicits._
      return Seq.empty[(String, Long, Long)]
        .toDF("lang", "n_docs", "n_tokens")
    }
    val back = s.read.schema(
      new org.apache.spark.sql.types.StructType()
        .add("doc_id", "long").add("fp", "string")
        .add("n_tok", "long").add("lang", "string"))
      .parquet(out)
    require(back.count() == expected,
      s"stream curate round trip: sink has ${back.count()} rows, " +
        s"batch view expects $expected (source $src)")
    back
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
      .orderBy("lang")
  }

  val queries: Map[String, Q] = Map(
    "x_stream_curate" -> ((s, dir) => xStreamCurate(s, dir))
  )

  val oracles: Map[String, String] = Map(
    // One row per (lang, distinct content) above the quality floor; token
    // count is a function of the text so min() is exact, not a choice.
    "x_stream_curate" ->
      """WITH t AS (SELECT lang, md5(text) AS fp,
        |  len(string_split(text, ' ')) AS n_tok FROM documents
        |  WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 20),
        |d AS (SELECT lang, fp, min(n_tok) AS n_tok FROM t GROUP BY 1, 2)
        |SELECT lang, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
