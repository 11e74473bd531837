package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, MapType, StructType}

/** Per-row element histogram: `array<T>` → `map<T, bigint>` of occurrence
  * counts, first-occurrence key order (deterministic output). The building
  * block of the flag-gated explode+count rewrite
  * ([[graft.plans.RewriteExplodeCountToHistogram]], SURVEY §4 anticipated
  * rule (b)): pre-counting inside the row turns a Generate that emits one
  * row per element OCCURRENCE into one per DISTINCT element, so heavily
  * repetitive arrays (document token lists, partition-path explosions)
  * push fewer rows through the generate → partial-aggregate pipeline.
  *
  * Elements are restricted to non-null atomic types: a map key cannot be
  * null (explode emits null-element rows that a null-keyed map cannot
  * represent), and atomic-typed catalyst values have the value-equality
  * semantics a JVM hash map relies on.
  *
  * Codegen: one static call — the loop stays in
  * [[ArrayHistogram.build]], the expression itself never falls back to
  * interpreted mode, so surrounding whole-stage codegen spans are
  * preserved.
  */
case class ArrayHistogram(child: Expression) extends UnaryExpression {

  private def elementType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, false) if ArrayHistogram.hashableElement(et) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      "array_histogram requires array<atomic NOT NULL> input, got " +
        other.simpleString)
  }

  override def dataType: DataType =
    MapType(elementType, LongType, valueContainsNull = false)

  override def prettyName: String = "array_histogram"

  override def nullSafeEval(input: Any): Any =
    ArrayHistogram.build(input.asInstanceOf[ArrayData], elementType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("elementType", elementType,
      classOf[DataType].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ArrayHistogram.build($c, $et)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArrayHistogram {
  /** Register `array_histogram(arr)` in the session's function registry so
    * it is usable from SQL and `expr(...)`. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_histogram", exprs => ArrayHistogram(exprs.head), "scala_udf")

  /** Element types whose catalyst runtime values carry the value-equality
    * a JVM hash map relies on: everything except nested containers and
    * binary (`Array[Byte]` equality is by reference). */
  def hashableElement(t: DataType): Boolean = t match {
    case _: StructType | _: ArrayType | _: MapType | BinaryType => false
    case _ => true
  }

  /** The shared eval/codegen body: one pass, first-occurrence key order. */
  def build(arr: ArrayData, elementType: DataType): MapData = {
    val n = arr.numElements()
    val counts =
      new java.util.LinkedHashMap[Any, java.lang.Long](math.max(8, n / 4))
    var i = 0
    while (i < n) {
      // SQL equality, not java.lang equals: -0.0 groups with 0.0 and every
      // NaN bit pattern is one key (java Double.equals would split them
      // into duplicate map keys, breaking Spark's no-duplicate-key
      // invariant and element_at lookups)
      val k = arr.get(i, elementType) match {
        case d: java.lang.Double =>
          if (d.isNaN) java.lang.Double.valueOf(Double.NaN)
          else if (d.doubleValue() == 0.0d) java.lang.Double.valueOf(0.0d)
          else d
        case f: java.lang.Float =>
          if (f.isNaN) java.lang.Float.valueOf(Float.NaN)
          else if (f.floatValue() == 0.0f) java.lang.Float.valueOf(0.0f)
          else f
        case other => other
      }
      val prev = counts.get(k)
      counts.put(k,
        if (prev == null) java.lang.Long.valueOf(1L)
        else java.lang.Long.valueOf(prev.longValue() + 1L))
      i += 1
    }
    val keys = new Array[Any](counts.size())
    val values = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      values(j) = e.getValue
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(values))
  }
}
