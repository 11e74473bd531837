package graft.functions

import scala.collection.immutable.TreeSet

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV ("bottom-k minimum values") sketch as a typed Catalyst
  * [[Aggregator]]: keeps the k lexicographically smallest distinct hash
  * values seen per group. The union of two KMV sketches is the bottom-k of
  * their merged sets, so the aggregate is fully mergeable — partial sketches
  * combine map-side and the shuffle carries at most k strings per group
  * regardless of group size. That's the property that lets near-dup /
  * distinct-estimation passes run over 100 TB with bounded state (the same
  * role MinHash signatures play, but with one k-sized sketch instead of k
  * independent hash families).
  *
  * Jaccard estimate between two sketches A, B (|A|=|B|=k over the hashed
  * universe): |bottomK(A∪B) ∩ A ∩ B| / k.
  */
class BottomKSketch(k: Int)
    extends Aggregator[String, TreeSet[String], Seq[String]] {

  override def zero: TreeSet[String] = TreeSet.empty[String]

  private def trim(s: TreeSet[String]): TreeSet[String] =
    if (s.size <= k) s else s.take(k)

  override def reduce(buf: TreeSet[String], in: String): TreeSet[String] =
    if (in == null) buf
    else if (buf.size < k) buf + in
    else if (in < buf.last) trim(buf + in)
    else buf

  override def merge(a: TreeSet[String], b: TreeSet[String]): TreeSet[String] =
    trim(a ++ b)

  override def finish(buf: TreeSet[String]): Seq[String] = buf.toSeq

  override def bufferEncoder: Encoder[TreeSet[String]] =
    Encoders.kryo[TreeSet[String]]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object BottomKSketch {
  /** Column form: `bottom_k_sketch(hashCol)` usable in `agg(...)`. */
  def bottomK(k: Int)(hashes: Column): Column =
    udaf(new BottomKSketch(k), Encoders.STRING).apply(hashes)
}
