package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Graft read-path configs on). */
object TestSpark {
  lazy val spark: SparkSession = Graft.session("graft-test", 4)
  val Sf0001 = "/root/testdata/sf0.001"
}
