package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a Catalyst-native
  * [[TypedImperativeAggregate]]: at most `k` (item, weight) counters per
  * buffer, in the MERGEABLE formulation (Agarwal et al., "Mergeable
  * Summaries", PODS 2012): inserting past capacity — or merging two
  * summaries — sums counters pointwise, then subtracts the (k+1)-th
  * largest count from every counter and drops the non-positive ones, which
  * leaves ≤ k survivors by construction.
  *
  * Guarantee (order-independent, so it holds under ANY Spark merge order):
  * for every item, `true − N/(k+1) ≤ est ≤ true` where N is the total
  * weight aggregated; hence every item with frequency above N/(k+1) is
  * guaranteed present. The surviving LOW-count items may differ with
  * partition/merge order — queries must assert the guarantee (the
  * `x_ndv_sketch` idiom), never hash the raw sketch.
  *
  * Scale shape: constant k-bounded state per group, compact binary partial
  * buffers, map-side partials merge associatively — the sketch a 100 TB
  * top-talkers rollup wants instead of a full groupBy on an unbounded key
  * domain.
  */
case class FreqSketchMG(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, s"freq_sketch: k must be positive, got $k")

  // reject non-string children at ANALYSIS time, not with a task-time
  // ClassCastException (AbstractDataType/ExpectsInputTypes are private[sql],
  // so the check lives here)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_sketch requires a string column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  /** Subtract the (k+1)-th largest count from everyone, drop ≤0 — the MG
    * reduction; ≤ k counters survive because only values strictly above
    * the pivot can stay positive. */
  private def shrink(m: mutable.HashMap[String, Long]): Unit =
    if (m.size > k) {
      val vs = m.values.toArray
      java.util.Arrays.sort(vs)
      val t = vs(vs.length - 1 - k) // (k+1)-th largest
      m.filterInPlace((_, v) => v > t)
      m.mapValuesInPlace((_, v) => v - t)
    }

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.update(key, buf.getOrElse(key, 0L) + 1L)
      shrink(buf)
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (key, w) => a.update(key, a.getOrElse(key, 0L) + w) }
    shrink(a)
    a
  }

  /** Emit as `map<string,bigint>` with keys in lexical order (ordering is
    * cosmetic: consumers explode the map). */
  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val ks = buf.keys.toArray.sorted
    new ArrayBasedMapData(
      new GenericArrayData(ks.map(UTF8String.fromString(_): Any)),
      new GenericArrayData(ks.map(buf(_): Any)))
  }

  // length-prefixed UTF-8, not writeUTF: the sketch is advertised for
  // unbounded key domains, and writeUTF caps a key at 64 KB of modified
  // UTF-8 (a long text key would kill the shuffle/state-store round trip)
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (key, v) =>
      val kb = key.getBytes(StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(v)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.update(new String(kb, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "freq_sketch"

  override def withNewMutableAggBufferOffset(offset: Int): FreqSketchMG =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FreqSketchMG =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketchMG =
    copy(child = newChildren.head)
}

object FreqSketchMG {
  /** Column form: `freqSketch(16)(col)` usable in `agg(...)`. */
  def freqSketch(k: Int)(items: Column): Column =
    org.apache.spark.sql.classic.GraftBridge.column(
      FreqSketchMG(
        org.apache.spark.sql.classic.GraftBridge.expression(items),
        k).toAggregateExpression())

  /** SQL-expression builder shared by [[register]] and
    * [[graft.plans.GraftExtensions]] — one place owns the arity/literal
    * validation for both install paths. */
  def builder(exprs: Seq[Expression]): Expression = {
    if (exprs.size != 2)
      throw new IllegalArgumentException(
        s"freq_sketch expects (col, k), got ${exprs.size} arguments")
    val k = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"freq_sketch: k must be an integer literal, got $other")
    }
    FreqSketchMG(exprs.head, k).toAggregateExpression()
  }

  /** Register `freq_sketch(col, k)` for SQL / `expr(...)` use. Idempotent;
    * k must be an integer literal. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "freq_sketch", builder, "scala_udf")
}
