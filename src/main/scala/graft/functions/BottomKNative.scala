package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV bottom-k sketch as a Catalyst-native [[TypedImperativeAggregate]] —
  * the heavyweight aggregate API: an arbitrary mutable object as the
  * aggregation buffer, binary-serialized between partial and final stages.
  * Semantics are identical to the typed [[BottomKSketch]] Aggregator (k
  * lexicographically smallest distinct values, emitted comma-joined); the
  * native form needs no Dataset encoders, works from pure Column/SQL
  * contexts, and its partial buffers ship as compact byte arrays instead of
  * kryo-serialized objects. Mergeable, bounded k-state per group — the
  * 100 TB-safe sketch shape.
  */
case class BottomKNative(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[String]] {

  require(k > 0, s"bottom_k: k must be positive, got $k")

  override def createAggregationBuffer(): mutable.TreeSet[String] =
    mutable.TreeSet.empty[String]

  private def add(buf: mutable.TreeSet[String], s: String): Unit = {
    if (buf.size < k) buf += s
    else if (s < buf.last && !buf.contains(s)) {
      buf += s
      buf -= buf.last
    }
  }

  override def update(buf: mutable.TreeSet[String],
                      input: InternalRow): mutable.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(a: mutable.TreeSet[String],
                     b: mutable.TreeSet[String]): mutable.TreeSet[String] = {
    b.foreach(add(a, _))
    a
  }

  override def eval(buf: mutable.TreeSet[String]): Any =
    UTF8String.fromString(buf.mkString(","))

  override def serialize(buf: mutable.TreeSet[String]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach(out.writeUTF)
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeSet.empty[String]
    var i = 0
    while (i < n) { buf += in.readUTF(); i += 1 }
    buf
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "bottom_k"

  override def withNewMutableAggBufferOffset(offset: Int): BottomKNative =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BottomKNative =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKNative =
    copy(child = newChildren.head)
}

object BottomKNative {
  /** Column form: `bottom_k(hashCol, k)` usable in `agg(...)`. */
  def bottomK(k: Int)(hashes: Column): Column =
    org.apache.spark.sql.classic.GraftBridge.column(
      BottomKNative(
        org.apache.spark.sql.classic.GraftBridge.expression(hashes),
        k).toAggregateExpression())

  /** Register `bottom_k(col, k)` in the session's function registry so it
    * is usable from SQL and `expr(...)`. Idempotent; k must be an integer
    * literal. Sessions built with [[graft.plans.GraftExtensions]] get this
    * automatically. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bottom_k",
      exprs => {
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"bottom_k: k must be an integer literal, got $other")
        }
        BottomKNative(exprs.head, k).toAggregateExpression()
      },
      "scala_udf")
}
