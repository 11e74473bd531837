package graft.plans

import graft.TestSpark

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Unit semantics + plan shape for the custom as-of join operator. */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("as-of semantics: latest <= match, key isolation, null when none") {
    import spark.implicits._
    val trades = Seq(
      (1L, 100L, "t1"), (1L, 200L, "t2"), (2L, 150L, "t3"), (3L, 50L, "t4")
    ).toDF("key", "t_time", "trade")
    val quotes = Seq(
      (1L, 90L, 1.0), (1L, 150L, 2.0), (1L, 201L, 9.0), // 201 is after t2
      (2L, 150L, 5.0) // exactly-equal time matches
    ).toDF("q_key", "q_time", "px")
    val got = AsOfJoin.asofJoin(trades, quotes, "key", "q_key", "t_time", "q_time")
      .select("trade", "px").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got == Map(
      "t1" -> Some(1.0), // quote@90 is latest <= 100
      "t2" -> Some(2.0), // quote@150; quote@201 is in the future
      "t3" -> Some(5.0), // equal timestamps match
      "t4" -> None)) // key 3 has no quotes
  }

  test("plan uses AsOfJoinExec with one exchange per side") {
    import spark.implicits._
    val l = spark.range(100).selectExpr("id as key", "id * 10 as lt")
    val r = spark.range(50).selectExpr("id as rkey", "id * 10 as rt")
    val df = AsOfJoin.asofJoin(l.toDF(), r.toDF(), "key", "rkey", "lt", "rt")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan) // Exec nodes render without suffix
    assert("Exchange hashpartitioning".r.findAllIn(plan).length >= 2, plan)
  }

  test("left-only filters push through AsOfJoin; results unchanged") {
    import spark.implicits._
    val l = spark.range(1000).selectExpr("id % 10 as key", "id as lt")
    val r = spark.range(100).selectExpr("id % 10 as rkey", "id as rt")
    val base = AsOfJoin.asofJoin(l.toDF(), r.toDF(), "key", "rkey", "lt", "rt")
    val filtered = base.filter(col("lt") < 100)
    val opt = filtered.queryExecution.optimizedPlan
    // after PushFilterThroughAsOfJoin the top node is the join, not Filter
    assert(opt.isInstanceOf[AsOfJoin], s"filter not pushed:\n$opt")
    val direct = AsOfJoin.asofJoin(
      l.toDF().filter(col("lt") < 100), r.toDF(), "key", "rkey", "lt", "rt")
    assert(filtered.collect().map(_.toSeq).sortBy(_.toString).toSeq ==
      direct.collect().map(_.toSeq).sortBy(_.toString).toSeq)
  }

  test("column pruning pushes through the custom node to the children") {
    import spark.implicits._
    val l = spark.range(100)
      .selectExpr("id as key", "id * 10 as lt", "id as extra_l1",
        "id as extra_l2")
    val r = spark.range(50)
      .selectExpr("id as rkey", "id * 10 as rt", "id as px",
        "id as extra_r1")
    val df = AsOfJoin.asofJoin(l.toDF(), r.toDF(), "key", "rkey", "lt", "rt")
      .select("key", "px") // needs 2 of 8 columns (+ keys/times)
    val opt = df.queryExecution.optimizedPlan
    // both children must be narrowed: no extra_* column survives below join
    val joinNode = opt.collectFirst { case j: AsOfJoin => j }.get
    val childCols = (joinNode.left.output ++ joinNode.right.output)
      .map(_.name).toSet
    assert(!childCols.exists(_.startsWith("extra_")), childCols.toString)
    assert(childCols == Set("key", "lt", "rkey", "rt", "px"))
    // and the result is still right (keys >= 50 have no right match)
    val got = df.collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(49L) == Some(49L) && got(50L) == None)
  }

  test("downstream groupBy on the join key adds no extra exchange") {
    import spark.implicits._
    val l = spark.range(100).selectExpr("id % 10 as key", "id as lt")
    val r = spark.range(50).selectExpr("id % 10 as rkey", "id as rt")
    val agg = AsOfJoin.asofJoin(l.toDF(), r.toDF(), "key", "rkey", "lt", "rt")
      .groupBy("key").count()
    agg.collect()
    // AQE's toString prints the initial plan too — audit the final plan only
    val plan = agg.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // one exchange per join input; the post-join aggregate reuses the
    // left side's partitioning (outputPartitioning passthrough)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 2, plan)
  }

  test("null keys/times follow join semantics: match nothing, never 0") {
    import spark.implicits._
    // left null key/time → row survives null-extended (left-join shape);
    // right null key/time → row can never be "the latest" for anyone.
    // (Blind unboxing would treat null as key 0 and silently match.)
    val l = Seq((Some(1L), Some(100L)), (None, Some(200L)),
      (Some(0L), Some(300L)), (Some(3L), None)).toDF("key", "lt")
    val r = Seq((Some(1L), Some(90L), 1.0), (None, Some(50L), 7.0),
      (Some(0L), None, 8.0)).toDF("rkey", "rt", "px")
    for (df <- Seq(
        AsOfJoin.asofJoin(l, r, "key", "rkey", "lt", "rt"),
        AsOfJoin.asofJoinBroadcast(l, r, "key", "rkey", "lt", "rt"))) {
      val got = df.collect()
        .map(x => (if (x.isNullAt(0)) None else Some(x.getLong(0)),
          if (x.isNullAt(4)) None else Some(x.getDouble(4)))).toSet
      assert(got == Set(
        (Some(1L), Some(1.0)), // real match unaffected
        (None, None), // null left key: no match
        (Some(0L), None), // key 0 must NOT pick up the null-key right rows
        (Some(3L), None)), // null left time: no match
        got.toString)
    }
  }

  test("broadcast variant: same results as the shuffled operator, no exchange") {
    import spark.implicits._
    val trades = Seq(
      (1L, 100L, "t1"), (1L, 200L, "t2"), (2L, 150L, "t3"), (3L, 50L, "t4")
    ).toDF("key", "t_time", "trade")
    val quotes = Seq(
      (1L, 90L, 1.0), (1L, 150L, 2.0), (1L, 201L, 9.0), (2L, 150L, 5.0)
    ).toDF("q_key", "q_time", "px")
    val a = AsOfJoin.asofJoin(trades, quotes, "key", "q_key", "t_time", "q_time")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val bDf = AsOfJoin.asofJoinBroadcast(
      trades, quotes, "key", "q_key", "t_time", "q_time")
    val b = bDf.collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(a == b)
    assert(!bDf.queryExecution.executedPlan.toString.contains("Exchange"),
      "broadcast as-of must not shuffle")
  }

  test("broadcast variant agrees on the events table") {
    val a = graft.assess.Assessments
      .a13AsofCustom(spark, TestSpark.Sf0001).collect().map(_.toSeq)
    val b = graft.assess.Assessments
      .a13AsofBroadcast(spark, TestSpark.Sf0001).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("agrees with the window-function formulation on the events table") {
    val a = graft.assess.Assessments
      .a13AsofAttribution(spark, TestSpark.Sf0001).collect().map(_.toSeq)
    val b = graft.assess.Assessments
      .a13AsofCustom(spark, TestSpark.Sf0001).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
