package graft.ext

import graft.Tables

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2.3): image/audio/video handled as opaque
  * `binary` payloads + typed metadata, with decode / feature-extract /
  * resize / frame-sample implemented batch-wise over `Dataset.mapPartitions`
  * — the Scala-native analog of `mapInPandas` (one iterator per partition,
  * codec state amortized across the batch, nothing collected to the driver).
  *
  * No media codecs exist in this container, so the decode step is a
  * clearly-marked DETERMINISTIC STUB (bytes → fake "pixels"); everything
  * around it — schema, encoders, partition batching, the feature query — is
  * real and tested. At 100 TB the payload column stays opaque until the one
  * mapPartitions stage that needs it; metadata-only queries never touch it
  * (parquet column pruning drops the blob at the scan).
  */
object Multimodal {

  /** Binary asset + typed metadata. `content` is the opaque media payload. */
  case class MediaAsset(asset_id: Long, kind: String, format: String,
                        content: Array[Byte])

  case class MediaFeatures(asset_id: Long, kind: String, n_bytes: Long,
                           n_frames: Int, mean_byte: Double,
                           histogram: Seq[Long], fingerprint: String)

  val FrameBytes = 256

  /** Deterministic synthetic corpus: each document's UTF-8 bytes as a fake
    * media payload, kind round-robined by id. Stands in for a real
    * `binary`-column table; shape and encoders are production-identical. */
  def assets(s: SparkSession, dir: String): Dataset[MediaAsset] = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(
        col("doc_id").as("asset_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3).cast("int") + 1).as("kind"),
        element_at(typedLit(Seq("png", "wav", "mkv")),
          (col("doc_id") % 3).cast("int") + 1).as("format"),
        // coalesce: a NULL payload is a zero-byte asset (the stubs guard
        // empties; a null Array[Byte] NPEs every codec) — oracles mirror it
        encode(coalesce(col("text"), lit("")), "UTF-8").as("content"))
      .as[MediaAsset]
  }

  // ---- STUBS (no codecs in this environment) ---------------------------
  // A real deployment swaps these bodies for the actual codec calls; the
  // signatures and the surrounding Spark plumbing are the contract.

  /** STUB decode: media bytes → "pixel" intensities (unsigned byte values).
    * Real impl: image decode / audio PCM samples / video frame luma. */
  def decodeStub(content: Array[Byte]): Array[Int] =
    content.map(_ & 0xff)

  /** STUB resize: keep every `factor`-th sample (nearest-neighbor analog). */
  def resizeStub(pixels: Array[Int], factor: Int): Array[Int] =
    Array.tabulate((pixels.length + factor - 1) / factor)(i => pixels(i * factor))

  /** STUB frame sampling: fixed-size byte windows standing in for container
    * frames; returns (frameCount, first/middle/last frame checksums). */
  def frameSampleStub(content: Array[Byte]): (Int, Seq[Long]) = {
    val frames = content.grouped(FrameBytes).toArray
    val picks = Seq(0, frames.length / 2, frames.length - 1).distinct
      .filter(frames.isDefinedAt)
    (frames.length, picks.map(i => frames(i).map(_ & 0xffL).sum))
  }

  /** Batch feature extraction — ONE pass per partition, the mapInPandas
    * shape: iterator in, iterator out, per-batch state (digest instance)
    * reused. */
  def features(in: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import in.sparkSession.implicits._
    in.mapPartitions { batch =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      batch.map { a =>
        val px = decodeStub(a.content)
        val hist = Array.fill(16)(0L)
        var sum = 0L
        px.foreach { v => hist(v / 16) += 1; sum += v }
        digest.reset()
        val fp = digest.digest(a.content).map("%02x".format(_)).mkString
        MediaFeatures(a.asset_id, a.kind, a.content.length.toLong,
          frameSampleStub(a.content)._1,
          if (px.isEmpty) 0.0 else sum.toDouble / px.length,
          hist.toSeq, fp)
      }
    }
  }

  // ---- queries ----------------------------------------------------------

  /** Oracle-checked slice of the feature pipeline (byte counts, frame
    * counts, content fingerprint — all DuckDB-reproducible). */
  def xMediaFeatures(s: SparkSession, dir: String): DataFrame =
    features(assets(s, dir))
      .select(col("asset_id"), col("kind"), col("n_bytes"), col("n_frames"),
        col("fingerprint"))
      .orderBy("asset_id")

  /** Full decoded-feature set incl. histogram/mean. The stub decode is
    * byte-value identity, so DuckDB can reproduce it from hex(encode(coalesce(text, '')));
    * the histogram is comma-joined to a scalar (array columns crash the
    * driver's pandas sort) and the mean gets the +1e-9 half-boundary nudge
    * on both sides. */
  def xMediaHistograms(s: SparkSession, dir: String): DataFrame =
    features(assets(s, dir))
      .select(col("asset_id"),
        round(col("mean_byte") + lit(1e-9), 4).as("mean_byte"),
        array_join(col("histogram").cast("array<string>"), ",")
          .as("histogram"))
      .orderBy("asset_id")

  case class MediaResize(asset_id: Long, n_px: Long, mean_resized: Double)

  /** Resize pass over the decoded samples (keep every 4th) — same
    * mapPartitions batch shape as [[features]]; at scale this is the
    * thumbnail/downsample stage that shrinks the payload before any
    * shuffle. Oracle-checked: the stub decode is byte-identity, so DuckDB
    * recomputes the kept positions from the hex dump. */
  def xMediaResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    assets(s, dir).mapPartitions { batch =>
      batch.map { a =>
        val px = resizeStub(decodeStub(a.content), 4)
        MediaResize(a.asset_id, px.length.toLong,
          if (px.isEmpty) 0.0 else px.map(_.toLong).sum.toDouble / px.length)
      }
    }
      .select(col("asset_id"), col("n_px"),
        round(col("mean_resized") + lit(1e-9), 4).as("mean_resized"))
      .orderBy("asset_id")
  }

  /** Frame sampling (first / middle / last frame checksums) as a real
    * query — the sparse-probe pattern for video: only 3 frames of each
    * container are ever touched. */
  def xMediaFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    assets(s, dir).mapPartitions { batch =>
      batch.map { a =>
        val frames = a.content.grouped(FrameBytes).toArray
        def fsum(i: Int): Long = frames(i).map(_ & 0xffL).sum
        // zero-byte asset: no frames to probe — emit zeros, don't throw
        if (frames.isEmpty) (a.asset_id, 0L, 0L, 0L, 0L)
        else (a.asset_id, frames.length.toLong,
          fsum(0), fsum(frames.length / 2), fsum(frames.length - 1))
      }
    }
      .toDF("asset_id", "n_frames", "f_first", "f_mid", "f_last")
      .orderBy("asset_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_media_features" -> xMediaFeatures,
    "x_media_histograms" -> xMediaHistograms,
    "x_media_resize" -> xMediaResize,
    "x_media_frames" -> xMediaFrames
  )

  val oracles: Map[String, String] = Map(
    "x_media_features" ->
      """SELECT doc_id AS asset_id,
        |CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes,
        |CAST(ceil(octet_length(encode(coalesce(text, ''))) / 256.0) AS INT) AS n_frames,
        |md5(coalesce(text, '')) AS fingerprint
        |FROM documents ORDER BY asset_id""".stripMargin,
    // Stub decode = unsigned byte values of the UTF-8 text, so the mean is
    // the byte average and bucket v/16 is the high hex nibble of each byte.
    "x_media_histograms" ->
      """WITH h AS (SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
        |  octet_length(encode(coalesce(text, ''))) AS n FROM documents),
        |nib AS (SELECT doc_id, n,
        |  list_transform(range(1, n + 1),
        |    i -> strpos('0123456789ABCDEF', substring(hx, 2*i - 1, 1)) - 1) AS hi,
        |  list_transform(range(1, n + 1),
        |    i -> strpos('0123456789ABCDEF', substring(hx, 2*i, 1)) - 1) AS lo
        |  FROM h)
        |SELECT doc_id AS asset_id,
        |CASE WHEN n = 0 THEN 0.0 ELSE
        |  round((16.0 * list_sum(hi) + list_sum(lo)) / n + 1e-9, 4) END AS mean_byte,
        |array_to_string(list_transform(range(0, 16),
        |  j -> CAST(len(list_filter(hi, x -> x = j)) AS VARCHAR)), ',') AS histogram
        |FROM nib ORDER BY asset_id""".stripMargin,
    // Kept positions are 1+4k (1-based bytes) → hex chars 8k+1 / 8k+2.
    "x_media_resize" ->
      """WITH h AS (SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
        |  octet_length(encode(coalesce(text, ''))) AS n FROM documents),
        |b AS (SELECT doc_id, list_transform(range(0, CAST(ceil(n / 4.0) AS BIGINT)), k ->
        |  16 * (strpos('0123456789ABCDEF', substring(hx, 8*k + 1, 1)) - 1)
        |     + (strpos('0123456789ABCDEF', substring(hx, 8*k + 2, 1)) - 1)) AS pxs
        |  FROM h)
        |SELECT doc_id AS asset_id, len(pxs) AS n_px,
        |CASE WHEN len(pxs) = 0 THEN 0.0 ELSE
        |  round(list_sum(pxs) * 1.0 / len(pxs) + 1e-9, 4) END AS mean_resized
        |FROM b ORDER BY asset_id""".stripMargin,
    // Frame k covers bytes [256k+1, least(256(k+1), n)]; probes 3 frames.
    "x_media_frames" ->
      """WITH h AS (SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
        |  octet_length(encode(coalesce(text, ''))) AS n,
        |  CAST(ceil(octet_length(encode(coalesce(text, ''))) / 256.0) AS BIGINT) AS nf
        |  FROM documents)
        |SELECT doc_id AS asset_id, nf AS n_frames,
        |CAST(COALESCE(list_sum(list_transform(range(1, least(256, n) + 1), p ->
        |  16 * (strpos('0123456789ABCDEF', substring(hx, 2*p - 1, 1)) - 1)
        |     + (strpos('0123456789ABCDEF', substring(hx, 2*p, 1)) - 1))), 0) AS BIGINT) AS f_first,
        |CAST(COALESCE(list_sum(list_transform(range(256 * CAST(floor(nf / 2.0) AS BIGINT) + 1,
        |    least(256 * (CAST(floor(nf / 2.0) AS BIGINT) + 1), n) + 1), p ->
        |  16 * (strpos('0123456789ABCDEF', substring(hx, 2*p - 1, 1)) - 1)
        |     + (strpos('0123456789ABCDEF', substring(hx, 2*p, 1)) - 1))), 0) AS BIGINT) AS f_mid,
        |CAST(COALESCE(list_sum(list_transform(range(256 * (nf - 1) + 1, n + 1), p ->
        |  16 * (strpos('0123456789ABCDEF', substring(hx, 2*p - 1, 1)) - 1)
        |     + (strpos('0123456789ABCDEF', substring(hx, 2*p, 1)) - 1))), 0) AS BIGINT) AS f_last
        |FROM h ORDER BY asset_id""".stripMargin
  )
}
