package graft.ext

import graft.TestSpark

import org.scalatest.funsuite.AnyFunSuite

/** Properties for the streaming near-dup admission gate
  * ([[StreamCuration.xStreamNeardup]]) beyond its DuckDB oracle row. */
class StreamCurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  test("stream neardup: verdicts equal the batch multi-band rule") {
    val got = StreamCuration.xStreamNeardup(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // the batch rule, derived from the independently-oracle-checked
    // candidate generator: a doc is near_dup iff it appears as the LARGER
    // id of any OR-8 candidate pair (= shares a band with a smaller doc)
    val staleDocs = Dedup.multibandCandidates(spark, dir, bands = 8)
      .collect().map(_.getLong(1)).toSet
    val nDocs = graft.Tables.load(spark, dir, "documents")
      .filter(org.apache.spark.sql.functions.col("text").isNotNull).count()
    assert(got.size == nDocs)
    got.foreach { case (id, (nStale, verdict)) =>
      assert(nStale >= 0L && nStale <= 8L, s"doc $id n_stale $nStale")
      assert((verdict == "near_dup") == (nStale > 0L), s"doc $id inconsistent")
      assert((verdict == "near_dup") == staleDocs(id),
        s"doc $id verdict $verdict disagrees with the batch band rule")
    }
    assert(got.values.exists(_._2 == "near_dup"), "no near-dup found at all")
    assert(got.values.exists(_._2 == "admit"), "everything flagged near-dup")
  }

  test("stream neardup: state crosses micro-batches without changing truth") {
    // one batch (no state handoff) and four batches (band minima must
    // survive the state store between triggers) are the same contract —
    // any divergence means cross-batch state is wrong
    val one = StreamCuration.xStreamNeardup(spark, dir, nBatches = 1)
      .collect().map(_.toSeq)
    val four = StreamCuration.xStreamNeardup(spark, dir, nBatches = 4)
      .collect().map(_.toSeq)
    assert(one.toSeq == four.toSeq)
  }
}
