package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale probe (VERDICT r9 #3): synthesizes a ~10× corpus from sf0.1
  * by self-union with re-keyed ids and copy-perturbed content, then
  * measures the heaviest queries on both scales so the "linear at 100×"
  * design claims get MEASURED evidence, not just plan audits.
  *
  * Content is perturbed per copy — every third WORD is rewritten with a
  * copy-specific suffix, so cross-copy shingle/gram overlap collapses to
  * ~zero while per-document statistics (length, word count, language
  * marker density) stay realistic; embeddings get an epsilon, event times
  * a shift. A byte-exact (or prefix-marked) ×10 duplication is NOT a
  * bigger corpus — it is a pathological near-dup cluster: every true-pair
  * and candidate count grows ~100× BY CONSTRUCTION (measured: the first
  * probe cut used a prefix marker and x_lsh_recall's exact ground truth
  * went 20× for 10× data purely from the synthetic cross-copy pairs),
  * which measures the corpus, not the operator. Realistic growth is
  * mostly new content, and that is what the substitution produces.
  *
  * Usage: `runMain graft.ScaleProbe [outDir]` — writes the corpus (once;
  * reused if present), times each probe query on sf0.1 and on the 10× dir,
  * prints one JSON line per query and a summary ratio table.
  */
object ScaleProbe {

  val ProbeQueries: Seq[String] = Seq(
    "x_edit_pairs", "x_lsh_recall", "x_jaccard_ngram",
    "x_quality_calibration", "x_triangles", "x_split_leakage_safe",
    "x_dup_pagerank", "x_cluster_histogram", "x_minhash_pairs",
    "x_dedup_threshold_curve")

  /** Build the 10× dir: documents/embeddings/events get 10 re-keyed,
    * perturbed copies; every other table is carried over unchanged (the
    * probe queries don't scale with them). */
  def synthesize(s: SparkSession, srcDir: String, outDir: String): Unit = {
    val copies = s.range(10).select(col("id").cast("int").as("copy"))
    def tenfold(name: String)(rekey: DataFrame => DataFrame): Unit = {
      val base = s.read.parquet(s"$srcDir/$name.parquet")
      rekey(base.crossJoin(broadcast(copies)))
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    }
    tenfold("documents") { d =>
      val rewritten = concat_ws(" ",
        zip_with(
          split(col("text"), " "),
          sequence(lit(0), size(split(col("text"), " ")) - 1),
          (w, i) => when((i + col("copy")) % 3 === 0,
            concat(w, lit("x"), col("copy"))).otherwise(w)))
      val txt = when(col("copy") === 0, col("text")).otherwise(rewritten)
      d.select(
        (col("doc_id") * 10 + col("copy")).as("doc_id"),
        txt.as("text"),
        col("lang"), col("source"),
        length(txt).as("n_chars"))
    }
    tenfold("embeddings") { e =>
      e.select(
        (col("vec_id") * 10 + col("copy")).as("vec_id"),
        transform(col("embedding"),
          x => (x + col("copy").cast("float") * lit(0.001f)).cast("float"))
          .as("embedding"),
        col("label"))
    }
    tenfold("events") { ev =>
      ev.select(
        (col("event_id") * 10 + col("copy")).as("event_id"),
        (col("ts") + expr("make_interval(0, 0, 0, 0, 0, 0, copy)")).as("ts"),
        (col("user_id") * 10 + col("copy")).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }
    // remaining tables: unchanged carry-over so any incidental load works
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { t =>
      val f = new java.io.File(s"$srcDir/$t.parquet")
      if (f.exists())
        s.read.parquet(f.toString).write.mode("overwrite")
          .parquet(s"$outDir/$t.parquet")
    }
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_sf1x10")
    val srcDir = "/root/testdata/sf0.1"
    val s = Graft.session("graft-scale-probe", 32)
    if (!new java.io.File(s"$outDir/documents.parquet").exists()) {
      println(s"[scale] synthesizing 10x corpus at $outDir")
      synthesize(s, srcDir, outDir)
    }
    // same warmup + inter-query hygiene as Bench
    s.range(1000).selectExpr("sum(id)").collect()
    Tables.events(s, srcDir).count()
    def measure(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(s, dir).queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
      dt
    }
    val rows = ProbeQueries.map { q =>
      val t1 = measure(q, srcDir)
      val t10 = measure(q, outDir)
      println(f"""{"query":"$q","sf01_s":$t1%.2f,"x10_s":$t10%.2f,"ratio":${t10 / t1}%.2f}""")
      (q, t1, t10, t10 / t1)
    }
    println(f"| query | sf0.1 s | 10x s | ratio |")
    println(f"|---|---|---|---|")
    rows.foreach { case (q, a, b, r) =>
      println(f"| $q | $a%.2f | $b%.2f | $r%.2f |")
    }
    s.stop()
  }
}
