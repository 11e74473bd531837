package graft.ext

import graft.TestSpark

import org.scalatest.funsuite.AnyFunSuite

/** Goldens for the multimodal plumbing: stub decode determinism, resize /
  * frame-sample shapes, batch feature extraction, payload pruning. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  test("stub decode/resize/frame-sample goldens on a known payload") {
    val bytes = "hello".getBytes("UTF-8") // 104,101,108,108,111
    assert(Multimodal.decodeStub(bytes).toSeq == Seq(104, 101, 108, 108, 111))
    assert(Multimodal.resizeStub(Array(1, 2, 3, 4, 5), 2).toSeq == Seq(1, 3, 5))
    val big = Array.fill(600)(1.toByte)
    val (n, sums) = Multimodal.frameSampleStub(big)
    assert(n == 3) // 256+256+88
    assert(sums == Seq(256L, 256L, 88L))
  }

  test("feature extraction over the corpus: schema, counts, utf8 vs chars") {
    val f = Multimodal.features(Multimodal.assets(spark, dir)).collect()
    assert(f.length == 500)
    f.foreach { m =>
      assert(m.histogram.sum == m.n_bytes) // every byte lands in one bin
      assert(m.fingerprint.matches("[0-9a-f]{32}"))
      assert(m.n_frames == (m.n_bytes + 255) / 256)
      assert(Set("image", "audio", "video")(m.kind))
    }
    // Payload length equals the document byte length (this corpus is ASCII,
    // so bytes == chars; multi-byte text would make n_bytes strictly larger).
    val docs = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f.forall(m => m.n_bytes >= docs(m.asset_id)))
  }

  test("zero-byte asset: frame probe emits zeros instead of throwing") {
    import spark.implicits._
    // corpus with an empty document — the real query must not index frames(0)
    val tmp = java.nio.file.Files.createTempDirectory("graft_mm_empty").toString
    Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = Multimodal.xMediaFrames(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, 1L, 294L), (2L, 0L, 0L))) // 97+98+99=294
    // and the stub helper agrees: no frames, no checksums
    assert(Multimodal.frameSampleStub(Array.empty[Byte]) == ((0, Seq.empty[Long])))
  }

  test("metadata-only query prunes the binary payload at the scan") {
    val q = Multimodal.assets(spark, dir).select("asset_id", "kind")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema") && !scan.contains("content"),
      s"binary column should be pruned:\n$scan")
  }
}
