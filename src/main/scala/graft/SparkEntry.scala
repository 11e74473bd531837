package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` has one entry per implemented operator (SURVEY.md §2 inventory);
  * `oracleSql` holds the DuckDB twin for every SQL-expressible one (same
  * column names — the driver hash-compares by name). Queries without an
  * oracle (heuristic/bit-level ops) get the driver's rows-only check and are
  * pinned by ScalaTest goldens instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Points at the curation capstone — a composed pipeline (exact-dup
    * keeper → language/quality gates → decontamination → boilerplate
    * ceiling) — so the smoke exercises the ext layer end-to-end, not just
    * one star join (the star workload is already 23-query oracle-pinned). */
  def entry(spark: SparkSession): DataFrame = {
    Graft.configure(spark)
    ext.Curation.xCurateCorpus(spark, "/root/testdata/sf0.001")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (assess.Assessments.queries ++
      assess.Migration.queries ++
      assess.Audit.queries ++
      assess.StarQueries.queries ++
      capture.CaptureDemo.queries ++
      ext.TextOps.queries ++
      ext.Dedup.queries ++
      ext.Similarity.queries ++
      ext.Multimodal.queries ++
      ext.Curation.queries ++
      ext.Learn.queries ++
      ext.Layout.queries ++
      ext.Fingerprint.queries ++
      ext.StreamCuration.queries ++
      ext.Changelog.queries ++
      ext.SqlSurface.queries)
      .map { case (k, f) =>
        // Ensure graft read-path configs even on a driver-created session.
        k -> ((s: SparkSession, dir: String) => { Graft.configure(s); f(s, dir) })
      }

  def oracleSql: Map[String, String] =
    assess.Assessments.oracles ++
      assess.Migration.oracles ++
      assess.Audit.oracles ++
      assess.StarQueries.oracles ++
      capture.CaptureDemo.oracles ++
      ext.TextOps.oracles ++
      ext.Dedup.oracles ++
      ext.Similarity.oracles ++
      ext.Multimodal.oracles ++
      ext.Curation.oracles ++
      ext.Learn.oracles ++
      ext.Layout.oracles ++
      ext.Fingerprint.oracles ++
      ext.StreamCuration.oracles ++
      ext.Changelog.oracles ++
      ext.SqlSurface.oracles +
      ext.Similarity.fusedOracle
}
