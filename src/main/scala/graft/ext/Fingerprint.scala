package graft.ext

import graft.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document fingerprinting by winnowing (the MOSS scheme: Schleimer,
  * Wilkerson, Aiken, "Winnowing: Local Algorithms for Document
  * Fingerprinting", SIGMOD 2003): hash every positional k-gram, slide a
  * window of `w` consecutive hashes, keep each window's minimum — the
  * selected set is guaranteed to share a fingerprint with any copy that
  * overlaps by at least w+k-1 grams, at ~2/(w+1) the density of the full
  * hash set. This is the containment-detection primitive (partial overlap,
  * quotes, section reuse) that set-level MinHash misses: MinHash estimates
  * whole-document resemblance, winnowing localizes shared substrings.
  *
  * Everything is per-document higher-order-function work over the shingle
  * array — one narrow map stage, no explode, no shuffle except the
  * presentation sort; at 100 TB the fingerprint index build is
  * embarrassingly parallel and the output is ~2/(w+1) of shingle volume.
  */
object Fingerprint {

  type Q = (SparkSession, String) => DataFrame

  /** Winnowed fingerprint set per document: 3-token shingles (positional,
    * duplicates preserved — winnowing is positional by construction), each
    * hashed to 8 md5 hex chars, window w=4 minima, distinct. Selecting by
    * min VALUE makes the reference's rightmost-tie-break irrelevant: tied
    * windows select equal values, and the emitted set is identical. */
  def xWinnowFingerprint(s: SparkSession, dir: String): DataFrame = {
    val hs = transform(Dedup.shingles(col("toks")),
      x => substring(md5(x), 1, 8))
    val fps = array_sort(array_distinct(transform(
      sequence(lit(1), greatest(size(col("hs")) - 3, lit(1))),
      i => array_min(slice(col("hs"), i, lit(4))))))
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("hs", hs)
      .select(col("doc_id"),
        size(col("hs")).cast("bigint").as("n_grams"),
        fps.as("fps"))
      .select(col("doc_id"), col("n_grams"),
        size(col("fps")).cast("bigint").as("n_fps"),
        array_join(col("fps"), ",").as("fingerprint"))
      .orderBy("doc_id")
  }

  /** Fingerprint-overlap containment pairs: documents sharing >= `minShared`
    * winnowed fingerprints, with the overlap counted — the "find documents
    * quoting this one" query. The inverted index (fingerprint -> docs) is an
    * explode + self equi-join on the 8-char fingerprint key: shuffle carries
    * (fingerprint, doc_id) pairs only, in-bucket work is quadratic in docs
    * PER FINGERPRINT (tiny by winnowing's density guarantee), and the
    * full corpus text never moves — the standard plagiarism-index shape. */
  def xWinnowPairs(s: SparkSession, dir: String,
                   minShared: Long = 8L): DataFrame = {
    val hs = transform(Dedup.shingles(col("toks")),
      x => substring(md5(x), 1, 8))
    val fps = array_distinct(transform(
      sequence(lit(1), greatest(size(col("hs")) - 3, lit(1))),
      i => array_min(slice(col("hs"), i, lit(4)))))
    // Materialized once: the shingle+md5+winnow pipeline is the expensive
    // part and the self-join references the index on both sides — without
    // this it runs twice (same idiom as Dedup.lshPairs). Size is the
    // fingerprint stream (~2/(w+1) of shingle volume), never the text.
    val inv = Tables.load(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("hs", hs)
      .select(col("doc_id"), explode(fps).as("fp"))
      .localCheckpoint()
    inv.as("a").join(inv.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy("doc_a", "doc_b")
  }

  val queries: Map[String, Q] = Map(
    "x_winnow_fingerprint" -> xWinnowFingerprint,
    "x_winnow_pairs" -> ((s, dir) => xWinnowPairs(s, dir))
  )

  private val WinnowFpsSql =
    """t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
      |sh AS (SELECT doc_id, list_transform(range(1, greatest(len(toks)-1, 2)),
      |  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) AS sh FROM t),
      |h AS (SELECT doc_id, list_transform(sh, x -> substring(md5(x), 1, 8)) AS hs FROM sh),
      |fp AS (SELECT doc_id, len(hs) AS n_grams,
      |  list_distinct(list_transform(range(1, greatest(len(hs) - 3, 1) + 1),
      |    i -> list_min(hs[i:least(i + 3, len(hs))]))) AS fps FROM h)""".stripMargin

  val oracles: Map[String, String] = Map(
    "x_winnow_fingerprint" ->
      s"""WITH $WinnowFpsSql
         |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
         |CAST(len(fps) AS BIGINT) AS n_fps,
         |array_to_string(list_sort(fps), ',') AS fingerprint
         |FROM fp ORDER BY doc_id""".stripMargin,
    "x_winnow_pairs" ->
      s"""WITH $WinnowFpsSql,
         |inv AS (SELECT doc_id, unnest(fps) AS fp FROM fp)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
         |FROM inv a JOIN inv b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 8
         |ORDER BY doc_a, doc_b""".stripMargin
  )
}
