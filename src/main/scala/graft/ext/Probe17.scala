package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch measurement harness for optimization round 17 — NOT part of the
  * driver contract; A/Bs pair-expansion shapes and streaming pieces in
  * isolation (noop sink per guide §1.4). Deleted or inert at round close.
  */
object Probe17 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Graft.session("graft-probe17", cpus.toInt)
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.Tables.load(spark, sfDir, "region").count()
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def jitMs: Long = java.lang.management.ManagementFactory
      .getCompilationMXBean.getTotalCompilationTime
    def time[T](name: String)(f: => T): T = {
      val (g0, j0, t0) = (gcMs, jitMs, System.nanoTime())
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s" +
        f" (gc ${(gcMs - g0) / 1e3}%.1f s, jit ${(jitMs - j0) / 1e3}%.1f s)")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // The three in-bucket pair-expansion shapes over sorted posting lists.
    def vPosexplode2(lists: DataFrame): DataFrame = lists
      .select(col("entries"), posexplode(col("entries")).as(Seq("i", "ea")))
      .select(col("i"), col("ea"),
        posexplode(col("entries")).as(Seq("j", "eb")))
      .filter(col("j") > col("i"))
      .select(col("ea.doc_id").as("doc_a"), col("eb.doc_id").as("doc_b"),
        col("ea.n_bg").as("n_a"), col("eb.n_bg").as("n_b"))
    def vSliceSuffix(lists: DataFrame): DataFrame = lists
      .select(col("entries"), posexplode(col("entries")).as(Seq("i", "ea")))
      .select(col("ea"),
        explode(slice(col("entries"), col("i") + lit(2),
          greatest(size(col("entries")) - col("i") - lit(1), lit(0))))
          .as("eb"))
      .select(col("ea.doc_id").as("doc_a"), col("eb.doc_id").as("doc_b"),
        col("ea.n_bg").as("n_a"), col("eb.n_bg").as("n_b"))
    def vLambda(lists: DataFrame): DataFrame = lists
      .select(explode(expr(Dedup.PairExpansionSql)).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"),
        col("p.n_a").as("n_a"), col("p.n_b").as("n_b"))

    def agg(df: DataFrame): DataFrame = df
      .groupBy("doc_a", "doc_b", "n_a", "n_b")
      .agg(count(lit(1)).as("ni_s"))

    args.headOption.getOrElse("expandab") match {
      case "expandab" =>
        val grouped = Dedup.bigramPostings(
          Dedup.bigramDocs(spark, sfDir, 20))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        val lists = grouped
          .filter(size(col("entries")).between(2, 50))
          .select(sort_array(col("entries")).as("entries"))
        time("postings persist")(grouped.count())
        val variants = Seq(
          "posexplode2" -> vPosexplode2 _,
          "sliceSuffix" -> vSliceSuffix _,
          "lambda" -> vLambda _)
        // sanity: identical pair sets
        variants.foreach { case (n, v) =>
          val cnt = agg(v(lists)).count()
          println(s"[probe] $n distinct pairs: $cnt")
        }
        (1 to 4).foreach { round =>
          variants.foreach { case (n, v) =>
            time(s"round $round $n")(noop(agg(v(lists))))
          }
        }
        // executed plan of the winner candidates (codegen ids visible)
        Seq("posexplode2" -> vPosexplode2 _,
            "sliceSuffix" -> vSliceSuffix _).foreach { case (n, v) =>
          val df = agg(v(lists))
          noop(df)
          println(s"== executed plan: $n ==")
          println(df.queryExecution.executedPlan.toString.take(6000))
        }
      case "plans" =>
        // args: plans <suffix> — dump explain(formatted) for the r17
        // touched queries into plans/r17/ (plan-audit surfaces where the
        // eager localCheckpoint would hide the tree).
        val suffix = args(1)
        val dir = java.nio.file.Paths.get("plans/r17")
        java.nio.file.Files.createDirectories(dir)
        val planFns: Seq[(String, () => DataFrame)] = Seq(
          "x_jaccard_ngram" -> (() => Dedup.xJaccardNgramPlan(spark, sfDir)),
          "x_jaccard_recall" -> (() => Dedup.xJaccardRecallPlan(spark, sfDir)),
          "x_lsh_recall" -> (() => Dedup.xLshRecallPlan(spark, sfDir)),
          "x_minhash_signatures" ->
            (() => Dedup.queries("x_minhash_signatures")(spark, sfDir)))
        planFns.foreach { case (n, fn) =>
          val plan = fn().queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.writeString(dir.resolve(s"${n}_$suffix.txt"), plan)
          println(s"[probe] wrote plans/r17/${n}_$suffix.txt")
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
        }
      case "full" =>
        // full x_jaccard_ngram repeats (shipped path)
        (1 to 4).foreach { k =>
          time(s"x_jaccard_ngram #$k") {
            noop(Dedup.xJaccardNgram(spark, sfDir))
          }
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          System.gc()
        }
    }
    spark.stop()
  }
}
