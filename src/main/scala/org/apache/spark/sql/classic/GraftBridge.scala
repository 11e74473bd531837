package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into Spark's package-private surfaces so graft's custom Catalyst
  * pieces can interoperate with the public API — the standard pattern for
  * third-party extensions:
  *  - `Dataset.ofRows` surfaces custom logical operators
  *    ([[graft.plans.AsOfJoin]]) as DataFrames;
  *  - `ExpressionUtils.column`/`expression` convert between public
  *    [[org.apache.spark.sql.Column]] and catalyst [[Expression]] (needed
  *    for native aggregate functions like [[graft.functions.BottomKNative]]).
  */
object GraftBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)

  def column(e: Expression): org.apache.spark.sql.Column =
    ExpressionUtils.column(e)

  def expression(c: org.apache.spark.sql.Column): Expression =
    ExpressionUtils.expression(c)
}
