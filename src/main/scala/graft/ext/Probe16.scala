package graft.ext

import org.apache.spark.sql.functions._

/** Scratch measurement harness for optimization round 16 — NOT part of the
  * driver contract; times pipeline pieces of heavy queries in isolation
  * (noop sink per guide §1.4). Deleted or inert at round close.
  */
object Probe16 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Graft.session("graft-probe16", cpus.toInt)
    // same warmup as Bench
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.Tables.load(spark, sfDir, "region").count()
    graft.Tables.events(spark, sfDir).count()
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
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val what = args.headOption.getOrElse("jaccard")
    what match {
      case "jaccard" =>
        (1 to 2).foreach { round =>
          println(s"== round $round ==")
          val docs = time("docs build+persist") {
            val d = Dedup.bigramDocs(spark, sfDir, 20)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
            d.count(); d
          }
          val grouped = time("postings build+persist") {
            val g = Dedup.bigramPostings(docs)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
            g.count(); g
          }
          val cand = time("cand pair expansion (codegen)") {
            val c = grouped
              .filter(size(col("entries")).between(2, 50))
              .select(sort_array(col("entries")).as("entries"))
              .select(col("entries"),
                posexplode(col("entries")).as(Seq("i", "ea")))
              .select(col("i"), col("ea"),
                posexplode(col("entries")).as(Seq("j", "eb")))
              .filter(col("j") > col("i"))
              .groupBy(col("ea.doc_id").as("doc_a"),
                col("eb.doc_id").as("doc_b"),
                col("ea.n_bg").as("n_a"), col("eb.n_bg").as("n_b"))
              .agg(count(lit(1)).as("ni_s"))
            noop(c); c
          }
          val capped = time("capped counts") {
            val cp = grouped.filter(size(col("entries")) > 50)
              .select(explode(col("entries.doc_id")).as("doc_id"))
              .groupBy("doc_id").agg(count(lit(1)).as("n_capped"))
            noop(cp); cp
          }
          (1 to 3).foreach { k =>
            time(s"full query (fresh) #$k") {
              spark.catalog.clearCache()
              noop(Dedup.xJaccardNgram(spark, sfDir))
            }
          }
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          System.gc()
        }
      case "plans" =>
        // args: plans <suffix> <query1,query2,...> — dump explain(formatted)
        val suffix = args(1)
        val names = args(2).split(",").map(_.trim)
        val dir = java.nio.file.Paths.get("plans/r16")
        java.nio.file.Files.createDirectories(dir)
        // Queries that eagerly localCheckpoint their result (the cache-
        // lifecycle contract) explain as one ExistingRDD scan; use their
        // plan-audit surfaces (barriers removed) so the whole tree shows.
        val planFns: Map[String, (org.apache.spark.sql.SparkSession, String)
            => org.apache.spark.sql.DataFrame] = Map(
          "x_jaccard_ngram" -> ((s, d) => Dedup.xJaccardNgramPlan(s, d)),
          "x_lsh_recall" -> ((s, d) => Dedup.xLshRecallPlan(s, d)),
          "x_jaccard_recall" -> ((s, d) => Dedup.xJaccardRecallPlan(s, d)))
        names.foreach { n =>
          val df = planFns.getOrElse(n, graft.SparkEntry.queries(n))(
            spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.writeString(dir.resolve(s"${n}_$suffix.txt"), plan)
          println(s"[probe] wrote plans/r16/${n}_$suffix.txt")
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
        }
      case "repeat" =>
        // args: repeat <n> <q1,q2,...> — run each query n times in one JVM
        val n = args(1).toInt
        val names = args(2).split(",").map(_.trim)
        names.foreach { q =>
          (1 to n).foreach { k =>
            time(s"$q #$k") {
              graft.SparkEntry.queries(q)(spark, sfDir)
                .queryExecution.toRdd.count()
            }
            spark.sparkContext.getPersistentRDDs.values
              .foreach(_.unpersist(blocking = true))
            System.gc()
          }
        }
      case "minhash" =>
        (1 to 3).foreach { round =>
          println(s"== round $round ==")
          time("x_minhash_pairs full") {
            noop(Dedup.queries("x_minhash_pairs")(spark, sfDir))
          }
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          System.gc()
        }
    }
    spark.stop()
  }
}
