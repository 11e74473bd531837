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
}
