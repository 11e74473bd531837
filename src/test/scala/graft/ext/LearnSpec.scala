package graft.ext

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-primitive semantics pinned by brute-force recomputation on the
  * driver (sf0.001 is small enough to collect) plus the property that
  * actually matters: the gradient step descends the loss. */
class LearnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  private lazy val data: Array[(Array[Double], Double)] =
    graft.Tables.load(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull)
      .select(col("embedding").cast("array<double>"), (col("label") % 2).cast("double"))
      .collect()
      .map(r => (r.getSeq[Double](0).toArray, r.getDouble(1)))

  private def w0(dims: Int): Array[Double] =
    Array.tabulate(dims)(j => 0.1 * ((j % 5) - 2))

  private def logLoss(w: Array[Double], bias: Double): Double = {
    data.map { case (x, y) =>
      val m = bias + x.indices.map(j => w(j) * x(j)).sum
      val p = 1.0 / (1.0 + math.exp(-m))
      -(y * math.log(p) + (1 - y) * math.log(1 - p))
    }.sum / data.length
  }

  test("logreg gradient matches the brute-force batch gradient") {
    val rows = Learn.xLogregStep(spark, dir).collect()
    assert(rows.length == 65) // 64 dims + bias
    val dims = 64
    val w = w0(dims)
    val resid = data.map { case (x, y) =>
      val m = x.indices.map(j => w(j) * x(j)).sum
      1.0 / (1.0 + math.exp(-m)) - y
    }
    val n = data.length
    rows.foreach { r =>
      val dim = r.getLong(0).toInt
      val expected =
        if (dim == -1) resid.sum / n
        else data.indices.map(i => resid(i) * data(i)._1(dim)).sum / n
      assert(math.abs(r.getDouble(2) - expected) < 1e-5,
        s"grad_mean at dim $dim")
      val wOld = if (dim == -1) 0.0 else w(dim)
      assert(math.abs(r.getDouble(3) - (wOld - 0.5 * expected)) < 1e-5,
        s"w_new at dim $dim")
    }
  }

  test("the step descends the log loss") {
    val rows = Learn.xLogregStep(spark, dir).collect()
    val newBias = rows.find(_.getLong(0) == -1L).get.getDouble(3)
    val newW = Array.ofDim[Double](64)
    rows.filter(_.getLong(0) >= 0).foreach(r =>
      newW(r.getLong(0).toInt) = r.getDouble(3))
    val before = logLoss(w0(64), 0.0)
    val after = logLoss(newW, newBias)
    assert(after < before, s"loss must decrease: $before -> $after")
  }

  test("bpe pair counts match brute force and rank by weighted frequency") {
    val words = graft.Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("text")).collect().map(_.getString(0))
      .flatMap(_.toLowerCase.split("[^a-z]+"))
      .filter(_.length >= 2)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pairCounts = words.toSeq
      .flatMap { case (word, n) =>
        (0 until word.length - 1).map(i => word.substring(i, i + 2) -> n)
      }
      .groupBy(_._1)
      .map { case (p, xs) => (p, xs.map(_._2).sum, xs.length.toLong) }
    val expected = pairCounts.toSeq
      .sortBy { case (p, freq, _) => (-freq, p) }
      .take(32)
    val got = Learn.xBpePairs(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected.map { case (p, f, nw) => (p, f, nw) })
  }
}
