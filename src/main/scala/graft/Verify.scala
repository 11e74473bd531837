package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Graft.session("graft-verify", cpus.toInt)
    new java.io.File(outDir).mkdirs()
    // Dev loop: SPARK_GRAFT_ONLY=a,b dumps a subset (same contract as
    // Bench); the driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    // A query that throws must surface as an `err` row, not silent absence
    // (round 7: x_triangles failed analysis and simply vanished from
    // CORRECTNESS — 160 rows for 161 queries). On catch we (a) record the
    // failure, (b) leave a marker dir the driver's reader will trip on
    // instead of an ordinary missing key, and (c) exit nonzero at the end.
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // Dev-only failure injection (SPARK_GRAFT_FAIL=a,b): proves the err
    // channel stays live — a broken query must yield a marker + nonzero
    // exit, never silent absence. The driver never sets it.
    val failInject = sys.env.get("SPARK_GRAFT_FAIL")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    selected.foreach { case (name, fn) =>
      try {
        if (failInject(name))
          sys.error(s"injected failure for $name (SPARK_GRAFT_FAIL)")
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures(name) = Option(e.getMessage).getOrElse(e.toString)
          .linesIterator.next()
        val marker = Paths.get(s"$outDir/$name")
        Files.createDirectories(marker)
        Files.writeString(marker.resolve("QUERY_FAILED.txt"),
          s"$name\n${e.toString}\n")
      }
      // Queries are independent units of work: drop any localCheckpoint
      // blocks this one left behind so storage memory stays flat across
      // the ~100-query dump (same hygiene as Bench).
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    if (failures.nonEmpty) {
      val ej = failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/verify_errors.json"), ej)
      System.err.println(s"[verify] ${failures.size} quer" +
        s"${if (failures.size == 1) "y" else "ies"} FAILED: " +
        failures.keys.mkString(", "))
    }
    // Stop any streaming query a capture round-trip left active before
    // tearing the session down — the StateStore maintenance thread races
    // SparkEnv shutdown otherwise (r6 bench tail crash).
    spark.streams.active.foreach(sq => try sq.stop() catch { case _: Throwable => })
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
