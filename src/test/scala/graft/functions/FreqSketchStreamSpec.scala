package graft.functions

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The MG sketch inside Structured Streaming: buffers must serialize
  * through the state store and merge ACROSS micro-batches (one file per
  * trigger forces it), not just within one batch. */
class FreqSketchStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming aggregation merges sketch state across micro-batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fsstream").toString
    // three files -> three micro-batches; 'a' is split across all of them
    // so its count is only right if cross-batch merge works
    Seq(Seq("a", "a", "b"), Seq("a", "c", "c"), Seq("a", "b", "d"))
      .zipWithIndex.foreach { case (keys, i) =>
        keys.toDF("key").coalesce(1).write.parquet(s"$dir/f$i")
      }
    val q = spark.readStream.schema("key STRING")
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/f*")
      .agg(FreqSketchMG.freqSketch(8)(col("key")).as("m"))
      .writeStream.format("memory").queryName("fs_stream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
        "expected at least three non-empty micro-batches")
      val m = spark.table("fs_stream").select(explode(col("m"))).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // domain (4 keys) fits in k=8, so the sketch must be EXACT even
      // through state-store round trips
      assert(m == Map("a" -> 4L, "b" -> 2L, "c" -> 2L, "d" -> 1L), m.toString)
    } finally q.stop()
  }

  test("skewed stream: the watermarked sketch path carries the guarantee " +
    "gate — sub-threshold keys NULL, dominant key verified, any batch split") {
    // VERDICT r12 #7: the streaming verdict frame (cap_stream_topk's
    // shape) under the 90%-one-key distribution. One dominant hot key far
    // above N/(k+1), two hot keys far below (state-store merge order
    // decides their survivorship), cold tail near-unique. The verdict via
    // SqlSurface.hotKeyVerdict must be IDENTICAL for every micro-batch
    // split: true bits for the dominant key, NULL for sub-threshold.
    import spark.implicits._
    val keys = Seq.fill(900)("hot_big") ++ Seq.fill(30)("hot_s1") ++
      Seq.fill(25)("hot_s2") ++ (0 until 1045).map(i => s"cold_$i")
    val exact = keys.toDF("key").groupBy("key")
      .agg(count(lit(1)).as("n_exact"))
    val verdicts = Seq(3, 7).map { nFiles =>
      val dir = java.nio.file.Files.createTempDirectory("fsskew").toString
      // deterministic shuffle so each split ALSO reorders the stream
      val perm = keys.zipWithIndex
        .sortBy { case (_, i) => (i * 31 + nFiles) % keys.size }.map(_._1)
      perm.grouped((perm.size + nFiles - 1) / nFiles).zipWithIndex.foreach {
        case (chunk, i) =>
          chunk.toDF("key").coalesce(1).write.parquet(s"$dir/f$i")
      }
      val q = spark.readStream.schema("key STRING")
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/f*")
        .agg(FreqSketchMG.freqSketch(16)(col("key")).as("m"))
        .writeStream.format("memory").queryName(s"fs_skew_$nFiles")
        .outputMode("complete").start()
      val est = try {
        q.processAllAvailable()
        spark.table(s"fs_skew_$nFiles")
          .select(explode(col("m")).as(Seq("key", "est"))).localCheckpoint()
      } finally q.stop()
      graft.ext.SqlSurface.hotKeyVerdict(exact, est, k = 16)
        .collect().map(_.toSeq).toSeq
    }
    assert(verdicts.head == verdicts.last,
      s"streaming verdict varies with batch split: $verdicts")
    val byKey = verdicts.head.map(r => r.head.toString -> r).toMap
    assert(byKey("hot_big") == Seq("hot_big", 900L, true, true))
    assert(byKey("hot_s1") == Seq("hot_s1", 30L, null, null))
    assert(byKey("hot_s2") == Seq("hot_s2", 25L, null, null))
  }
}
