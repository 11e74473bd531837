package graft.ext

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the corpus-curation operators beyond the DuckDB oracle. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  test("dup clusters: edges stay within a cluster, cluster id = min member") {
    val labels = Curation.xDupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.nonEmpty)
    // cluster id is itself a member and the minimum of its members
    val members = labels.groupBy(_._2).view.mapValues(_.keys.toSeq)
    members.foreach { case (c, ms) =>
      assert(ms.min == c, s"cluster $c: min member ${ms.min}")
    }
    // every thresholded pair is intra-cluster (the defining CC property)
    val pairs = Dedup.xMinhashPairs(spark, dir)
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b").collect()
    pairs.foreach { r =>
      assert(labels(r.getLong(0)) == labels(r.getLong(1)),
        s"edge ${r.getLong(0)}-${r.getLong(1)} crosses clusters")
    }
  }

  test("hash sample: deterministic membership, ~25% rate") {
    val a = Curation.xSampleHash(spark, dir).collect().map(_.getLong(0))
    val b = Curation.xSampleHash(spark, dir).collect().map(_.getLong(0))
    assert(a.toSeq == b.toSeq) // reproducible split
    val total = graft.Tables.load(spark, dir, "documents").count()
    val rate = a.length.toDouble / total
    assert(rate > 0.15 && rate < 0.35, s"sample rate $rate")
  }

  test("stratified sample: exactly the quota per present class") {
    val rows = Curation.xSampleStratified(spark, dir, perClass = 20).collect()
    val perLang = rows.groupBy(_.getString(0)).view.mapValues(_.length)
    perLang.foreach { case (lang, n) => assert(n <= 20, s"$lang: $n") }
    assert(rows.map(_.getLong(2)).distinct.length == rows.length) // no dup docs
  }

  test("tfidf: ranks are 1..3 per doc and scores non-increasing") {
    val rows = Curation.xTfidfTop(spark, dir).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      val scores = sorted.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
    }
  }
}
