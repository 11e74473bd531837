package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** One observation of a band value: band index, band minhash, doc id.
    * (Public visibility: Catalyst's generated object projections access
    * the constructor from outside this object's Java scope.) */
  case class BandObs(bi: Int, bv: String, doc_id: Long)

  /** Per-(doc, band) staleness flag emitted by the streaming state fn. */
  case class BandFlag(doc_id: Long, bi: Int, stale: Int)

  /** The multiband signature of one document, computed natively: 3-token
    * shingles exactly as [[Dedup.shingles]] builds them (concat_ws null-
    * skip at the tail included), one md5 per shingle per salt group, band
    * i = min over shingles of digest chunk `i % 4` — byte-identical to
    * the SQL/DuckDB md5-chunk arithmetic (lowercase hex; lexicographic
    * min on fixed-width hex = numeric min). Duplicate shingles need no
    * dedup: a min is multiset-invariant. */
  private[ext] def bandObs(docId: Long, text: String,
                           bands: Int): Seq[BandObs] = {
    val toks = text.split(" ", -1)
    val n = toks.length
    val nHashes = (bands + 3) / 4
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(str: String): String = {
      md.reset()
      val d = md.digest(str.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val sb = new java.lang.StringBuilder(32)
      d.foreach { b =>
        sb.append(Character.forDigit((b & 0xf0) >> 4, 16))
        sb.append(Character.forDigit(b & 0x0f, 16))
      }
      sb.toString
    }
    val mins = new Array[String](bands)
    var i = 0
    val last = math.max(n - 2, 1)
    while (i < last) {
      val sb = new java.lang.StringBuilder(toks(i))
      if (i + 1 < n) sb.append(' ').append(toks(i + 1))
      if (i + 2 < n) sb.append(' ').append(toks(i + 2))
      val sh = sb.toString
      var k = 0
      while (k < nHashes) {
        val h = md5hex(if (k == 0) sh else k.toString + sh)
        var b = k * 4
        val hi = math.min(bands, k * 4 + 4)
        while (b < hi) {
          val c = h.substring(8 * (b % 4), 8 * (b % 4) + 8)
          if (mins(b) == null || c < mins(b)) mins(b) = c
          b += 1
        }
        k += 1
      }
      i += 1
    }
    (0 until bands).map(b => BandObs(b, mins(b), docId))
  }

  /** Streaming NEAR-duplicate admission — the multi-band OR-LSH operator
    * ([[Dedup.xMinhashPairsMultiband]]) running in Structured Streaming
    * with `flatMapGroupsWithState`: documents arrive in micro-batches, each
    * carries its 8 one-row minhash bands, and per (band_idx, band_value)
    * group the state store remembers the smallest doc id that has claimed
    * the band. A document is flagged `near_dup` iff ANY of its bands was
    * already claimed by an earlier document — the in-stream gate a crawl
    * ingest applies BEFORE paying to store or embed a template near-copy
    * (exact dedup, [[xStreamCurate]], only stops byte-identical text).
    *
    * Determinism contract (what makes this oracle-checkable): the corpus
    * is staged as doc_id-ordered batch files replayed one per micro-batch,
    * and within a batch each band group processes its rows in doc_id
    * order, so "earlier" means exactly `doc_id` order and the verdict
    * frame equals the batch rule "shares a band with any smaller doc_id"
    * — which the DuckDB oracle states as a plain self-join. Arrival-order
    * admission (first crawled wins) is the same code with the staging
    * dropped.
    *
    * Scale shape: state is ONE long per distinct (band_idx, band_value) —
    * the sketch stream, never text; per micro-batch the shuffle carries
    * (8 bands × 8 hex chars + id) per doc. At 100 TB the state store is
    * the standing cost (bounded by distinct band values ≈ 8/doc worst
    * case); a production deployment pairs it with state TTL or periodic
    * snapshot-compaction into the batch signature index
    * ([[Dedup.xDedupIncremental]]'s corpus side). */
  def xStreamNeardup(s: SparkSession, dir: String,
                     bands: Int = 8, nBatches: Int = 4): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val tmp = java.nio.file.Files.createTempDirectory(scratchRoot, "neardup_")
    val src = new java.io.File(s"$tmp/in"); src.mkdirs()
    val out = s"$tmp/flags"
    val ckpt = s"$tmp/ckpt"
    val docs = graft.Tables.load(s, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    // Stage nBatches doc_id-ordered files (quantile split; any monotone
    // split yields the same verdicts). Distinct mtimes pin replay order.
    val cuts = if (nBatches <= 1) Array.empty[Double]
      else docs.stat.approxQuantile("doc_id",
        (1 until nBatches).map(_.toDouble / nBatches).toArray, 0.0)
    val ranges = (Double.MinValue +: cuts) :+ Double.MaxValue
    val t0 = System.currentTimeMillis() - 3600 * 1000L
    (0 until nBatches).foreach { i =>
      val part = s"$tmp/stage_$i"
      docs.filter(col("doc_id") > ranges(i) && col("doc_id") <= ranges(i + 1))
        .coalesce(1).write.mode("overwrite").parquet(part)
      val file = new java.io.File(part).listFiles()
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"stream neardup: no part file under $part"))
      val dst = new java.io.File(src, f"batch_$i%04d.parquet")
      java.nio.file.Files.move(file.toPath, dst.toPath)
      dst.setLastModified(t0 + i * 2000L)
    }
    // Per-doc band values in plain Scala inside a typed flatMap. The
    // column-expression formulation (8 × array_min(transform(sh, md5…)))
    // was MEASURED at 26-28 s for 5k docs regardless of parallelism:
    // higher-order array functions evaluate interpreted, CollapseProject
    // re-inlines the shingle pipeline into every band, and the batch
    // path's explode+agg cure needs an aggregation, which Structured
    // Streaming forbids upstream of flatMapGroupsWithState. The native
    // loop computes each salted digest once per shingle (md5 of UTF-8,
    // hex chunks — byte-identical to the oracle's md5 arithmetic) and
    // took the query from 34.5 to 4.2 s at sf0.1 (isolated bench).
    val raw = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src.toString)
    val nBands = bands
    val obs = raw.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) => bandObs(id, text, nBands) }
    // Keyed state: smallest doc id that ever claimed this band value.
    // Rows of a group arrive unordered WITHIN a batch — sort locally (a
    // band bucket is small by LSH design); batches themselves arrive in
    // doc_id order by the staging above.
    val flagged = obs.groupByKey(r => (r.bi, r.bv))
      .flatMapGroupsWithState[Long, BandFlag](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, rows, state) =>
          var mn = state.getOption.getOrElse(Long.MaxValue)
          val outRows = rows.toIndexedSeq.sortBy(_.doc_id).map { r =>
            val stale = if (mn < r.doc_id) 1 else 0
            mn = math.min(mn, r.doc_id)
            BandFlag(r.doc_id, r.bi, stale)
          }
          state.update(mn)
          outRows.iterator
      }
    // Scoped partition reduction for the stateful stage (the capture
    // round-trips' idiom): streaming state stores are one instance PER
    // shuffle partition PER micro-batch, and their open/commit overhead —
    // not the data — dominates an eval-sized run (measured r14 at sf0.1:
    // 32 partitions ≈ 35 s, 8 partitions ≈ 12 s, verdicts identical). A
    // real deployment sizes this to its ingest volume.
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, "8")
    try {
      val q = flagged.writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally s.conf.set(key, old)
    val nDocs = docs.count()
    val back = s.read.schema(
      new org.apache.spark.sql.types.StructType()
        .add("doc_id", "long").add("bi", "int").add("stale", "int"))
      .parquet(out)
    // Loud completeness guard: every doc must have emitted every band —
    // a lost micro-batch or silent 0-row stream fails here, not as a
    // subtly-wrong verdict frame.
    require(back.count() == nDocs * bands,
      s"stream neardup: sink has ${back.count()} band flags, " +
        s"expected $nDocs docs x $bands bands (source $src)")
    back.groupBy("doc_id")
      .agg(sum("stale").as("n_stale_bands"))
      .select(col("doc_id"),
        col("n_stale_bands").cast("bigint").as("n_stale_bands"),
        when(col("n_stale_bands") > 0, "near_dup")
          .otherwise("admit").as("verdict"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "x_stream_curate" -> ((s, dir) => xStreamCurate(s, dir)),
    "x_stream_neardup" -> ((s, dir) => xStreamNeardup(s, dir))
  )

  val oracles: Map[String, String] = Map(
    // The streaming verdict frame is doc_id-order-deterministic by the
    // staging contract, so the oracle is the BATCH rule: a doc is
    // near_dup iff it shares any of its 8 band values with a smaller
    // doc_id; n_stale_bands counts the distinct stale band indices.
    "x_stream_neardup" ->
      (s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(toks)-1, 2)),
        |  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS sh FROM t),
        |${Dedup.MultibandCtesSql},
        |stale AS (SELECT a.doc_id, count(DISTINCT a.bi) AS n_stale
        |  FROM banded a JOIN banded b
        |  ON a.bi = b.bi AND a.bv = b.bv AND b.doc_id < a.doc_id
        |  GROUP BY a.doc_id)
        |SELECT t.doc_id, CAST(COALESCE(n_stale, 0) AS BIGINT) AS n_stale_bands,
        |CASE WHEN COALESCE(n_stale, 0) > 0 THEN 'near_dup' ELSE 'admit' END AS verdict
        |FROM t LEFT JOIN stale USING (doc_id) ORDER BY doc_id""").stripMargin,
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
