package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into Spark's package-private `Dataset.ofRows` so graft's custom
  * logical operators ([[graft.plans.AsOfJoin]]) can surface as DataFrames —
  * the standard pattern for third-party Catalyst extensions. */
object GraftBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
