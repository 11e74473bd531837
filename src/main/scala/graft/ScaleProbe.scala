package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe (VERDICT r9 #3, extended r11): synthesizes ~10× and ~30×
  * corpora from sf0.1 by self-union with re-keyed ids and copy-perturbed
  * content, then measures the heaviest queries at every scale so the
  * "linear at 100×" design claims get MEASURED evidence, not just plan
  * audits — including a fitted growth EXPONENT across the 1×/10×/30×
  * scales for the two worst 10× ratios (VERDICT r10 #3: one decade is a
  * point, two pin the slope).
  *
  * Content is perturbed per copy — every third WORD is rewritten with a
  * copy-specific suffix, so cross-copy shingle/gram overlap collapses to
  * ~zero while per-document statistics (length, word count, language
  * marker density) stay realistic; embeddings get an epsilon, event times
  * a shift. A byte-exact (or prefix-marked) ×N duplication is NOT a
  * bigger corpus — it is a pathological near-dup cluster: every true-pair
  * and candidate count grows ~N² BY CONSTRUCTION (measured: the first
  * probe cut used a prefix marker and x_lsh_recall's exact ground truth
  * went 20× for 10× data purely from the synthetic cross-copy pairs),
  * which measures the corpus, not the operator. Realistic growth is
  * mostly new content, and that is what the substitution produces.
  *
  * Timing discipline (ADVICE r10): each (query, scale) runs TWICE and the
  * SECOND pass is what ratios and exponents are computed from — the first
  * pass absorbs cold file listing, code generation and first-touch page
  * cache of the scaled directory, which otherwise folds fixed overhead
  * into the scaling ratio (x_edit_pairs' 10× ratio read 1.14 with
  * single-pass timing — mostly overhead, not scaling).
  *
  * Usage: `runMain graft.ScaleProbe [probe] [base]` or
  * `runMain graft.ScaleProbe x100 [queries] [base]` — writes the corpora
  * (once; factor-marker-validated reuse) at `<base>_x10` / `<base>_x30` /
  * `<base>_x100`, prints one JSON line per query and summary tables.
  */
object ScaleProbe {

  val ProbeQueries: Seq[String] = Seq(
    "x_edit_pairs", "x_lsh_recall", "x_jaccard_ngram",
    "x_quality_calibration", "x_triangles", "x_split_leakage_safe",
    "x_dup_pagerank", "x_cluster_histogram", "x_minhash_pairs",
    "x_dedup_threshold_curve",
    // the three heaviest ASSESS-layer queries (VERDICT r10 stretch #8) —
    // event-bounded, so they scale with the synthesized events table
    "a_readiness_scorecard", "a_dialect_complexity", "a_wave_cut_cost",
    // next tier (r11): the remaining bench top-10 batch queries, so the
    // measured-coverage frontier tracks the cost ranking, not history
    "x_canonical_docs", "x_dup_clusters", "x_dup_quality",
    "x_repeated_spans", "x_containment_pairs",
    // r14: the new multi-band OR-LSH family — b x the 1-band sketch
    // stream through one exchange; probe that the b factor stays a
    // constant, never a growth term
    "x_minhash_pairs_multiband", "x_multiband_recall",
    // r15: the ADC-scored IVF+PQ probe — the distance table is |q|·m·k
    // regardless of corpus, so growth should ride the one assignment +
    // codes pass; probe both the operator and its recall eval
    "x_ann_ivfpq", "x_ann_ivfpq_recall",
    // r15: the streaming admission gate — state stores and the staged
    // micro-batch replay should scale with the sketch stream (8 fixed-
    // width bands/doc), never with text volume
    "x_stream_neardup")

  /** How many of the WORST measured 10× ratios get a second octave (30×)
    * and a fitted exponent — derived from the rows the run just computed,
    * not a hardcoded list (a super-linear slope should chase whichever
    * query is steepest NOW, per review r11). */
  val OctaveCount: Int = 2

  /** Marker written by [[synthesize]] and validated by [[ensureCorpus]]:
    * existence-only reuse silently accepted a dir from an older layout or
    * a different factor, quietly corrupting the fitted exponents (ADVICE
    * r11). The marker records the factor + source; reuse requires a match. */
  private def markerFile(outDir: String) = new java.io.File(outDir, "_FACTOR")

  /** Reuse `outDir` only if its marker says it was built from `srcDir`
    * with exactly `factor`; otherwise (re)synthesize. */
  def ensureCorpus(s: SparkSession, srcDir: String, outDir: String,
                   factor: Int): Unit = {
    val want = s"factor=$factor src=$srcDir"
    val m = markerFile(outDir)
    val have = if (m.exists())
      Some(java.nio.file.Files.readString(m.toPath).trim) else None
    if (!have.contains(want)) {
      if (new java.io.File(outDir).exists())
        println(s"[scale] $outDir marker ${have.getOrElse("ABSENT")} != " +
          s"'$want' — resynthesizing")
      else println(s"[scale] synthesizing ${factor}x corpus at $outDir")
      synthesize(s, srcDir, outDir, factor)
    }
  }

  /** Build a `factor`× dir: documents/embeddings/events get `factor`
    * re-keyed, perturbed copies; every other table is carried over
    * unchanged (the probe queries don't scale with them). */
  def synthesize(s: SparkSession, srcDir: String, outDir: String,
                 factor: Int = 10): Unit = {
    // drop any stale marker FIRST (ADVICE r12): a crash mid-resynthesis at
    // a NEW factor must not leave mixed-factor tables under a still-valid
    // OLD marker that a later ensureCorpus for the old factor would accept
    java.nio.file.Files.deleteIfExists(markerFile(outDir).toPath)
    val copies = s.range(factor).select(col("id").cast("int").as("copy"))
    val f = lit(factor.toLong)
    def nfold(name: String)(rekey: DataFrame => DataFrame): Unit = {
      val base = s.read.parquet(s"$srcDir/$name.parquet")
      rekey(base.crossJoin(broadcast(copies)))
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    }
    nfold("documents") { d =>
      val rewritten = concat_ws(" ",
        zip_with(
          split(col("text"), " "),
          sequence(lit(0), size(split(col("text"), " ")) - 1),
          (w, i) => when((i + col("copy")) % 3 === 0,
            concat(w, lit("x"), col("copy"))).otherwise(w)))
      val txt = when(col("copy") === 0, col("text")).otherwise(rewritten)
      d.select(
        (col("doc_id") * f + col("copy")).as("doc_id"),
        txt.as("text"),
        col("lang"), col("source"),
        length(txt).as("n_chars"))
    }
    nfold("embeddings") { e =>
      e.select(
        (col("vec_id") * f + col("copy")).as("vec_id"),
        transform(col("embedding"),
          x => (x + col("copy").cast("float") * lit(0.001f)).cast("float"))
          .as("embedding"),
        col("label"))
    }
    nfold("events") { ev =>
      ev.select(
        (col("event_id") * f + col("copy")).as("event_id"),
        (col("ts") + expr("make_interval(0, 0, 0, 0, 0, 0, copy)")).as("ts"),
        (col("user_id") * f + col("copy")).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }
    // remaining tables: unchanged carry-over so any incidental load works
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { t =>
      val src = new java.io.File(s"$srcDir/$t.parquet")
      if (src.exists())
        s.read.parquet(src.toString).write.mode("overwrite")
          .parquet(s"$outDir/$t.parquet")
    }
    // marker LAST: a crash mid-synthesis must not leave a dir that
    // ensureCorpus would accept
    java.nio.file.Files.writeString(markerFile(outDir).toPath,
      s"factor=$factor src=$srcDir\n")
    ()
  }

  /** Least-squares slope of log(t) on log(n) — the growth exponent
    * (1.0 = linear in data size; the shuffle-bound ideal is ≲ 1 plus a
    * log factor from sort-based exchange). */
  def fitExponent(points: Seq[(Double, Double)]): Double = {
    val xs = points.map(p => math.log(p._1))
    val ys = points.map(p => math.log(p._2))
    val xm = xs.sum / xs.size
    val ym = ys.sum / ys.size
    val num = xs.zip(ys).map { case (x, y) => (x - xm) * (y - ym) }.sum
    val den = xs.map(x => (x - xm) * (x - xm)).sum
    num / den
  }

  private def pass(s: SparkSession, name: String, dir: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(s, dir).queryExecution.toRdd.count()
    val dt = (System.nanoTime() - t0) / 1e9
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    System.gc()
    dt
  }

  // two passes; the SECOND is the number (first absorbs cold listing +
  // codegen + page-cache first touch of the scaled directory)
  private def measure(s: SparkSession, name: String, dir: String)
      : (Double, Double) = {
    val first = pass(s, name, dir)
    val second = pass(s, name, dir)
    (first, second)
  }

  /** Cap-saturation octave (VERDICT r11 #2): one more decade for the
    * queries whose 1×/10×/30× fits leaned on the first decade — measure
    * 30× and ~100× second-pass times and report the 30×→100× LEG exponent
    * alone (log(t100/t30)/log(100/30)), the number that says whether the
    * df-cap has started absorbing growth or the last leg is still ~linear.
    * `runMain graft.ScaleProbe x100 [query,...]` (default: the two 0.89-
    * fit queries from the r11 table). */
  def runX100(s: SparkSession, srcDir: String, base: String,
              queries: Seq[String]): Unit = {
    val d30 = base + "_x30"
    val d100 = base + "_x100"
    ensureCorpus(s, srcDir, d30, 30)
    ensureCorpus(s, srcDir, d100, 100)
    s.range(1000).selectExpr("sum(id)").collect()
    println("| query | 30x s | 100x s | 30x->100x leg exponent |")
    println("|---|---|---|---|")
    queries.foreach { q =>
      val (_, t30) = measure(s, q, d30)
      val (_, t100) = measure(s, q, d100)
      val leg = math.log(t100 / t30) / math.log(100.0 / 30.0)
      println(f"""{"query":"$q","x30_s":$t30%.2f,"x100_s":$t100%.2f,"leg_exponent":$leg%.3f}""")
      println(f"| $q | $t30%.2f | $t100%.2f | $leg%.3f |")
    }
  }

  /** Subcommand-style args (ADVICE r12 — one base governs every scaled
    * dir, so a custom base can't produce a split layout):
    * `runMain graft.ScaleProbe [probe] [base]` — the 1×/10×/30× sweep over
    * `<base>_x10` / `<base>_x30`;
    * `runMain graft.ScaleProbe x100 [q1,q2,...] [base]` — the 30×→100×
    * octave over `<base>_x30` / `<base>_x100`.
    * Default base `/tmp/graft_sf1` (factor markers make reuse safe). */
  def main(args: Array[String]): Unit = {
    val srcDir = "/root/testdata/sf0.1"
    val s = Graft.session("graft-scale-probe", 32)
    if (args.headOption.contains("x100")) {
      val qs = if (args.length > 1 && args(1).nonEmpty) args(1).split(",").toSeq
        else Seq("x_jaccard_ngram", "x_repeated_spans")
      val base = if (args.length > 2) args(2) else "/tmp/graft_sf1"
      // same guard + resolved-path print as the probe path (VERDICT r14
      // #4): an already-scaled dir passed as base would silently
      // synthesize a second multi-GB corpus tree at <dir>_x30/_x100
      require(!base.matches(".*_x\\d+$"),
        s"base '$base' looks like an already-scaled corpus dir; pass the " +
          "BASE path (scaled dirs are derived as <base>_x30 / <base>_x100)")
      println(s"[scale] x100 corpora: 30x=${base}_x30 100x=${base}_x100")
      runX100(s, srcDir, base, qs)
      s.stop()
      return
    }
    val base = (if (args.headOption.contains("probe")) args.drop(1)
                else args).headOption.getOrElse("/tmp/graft_sf1")
    // ADVICE r13: a bare first arg used to BE the 10x dir; now it is a base
    // that gets _x10/_x30 appended. An old-style invocation passing an
    // already-scaled dir would silently synthesize a second multi-GB corpus
    // tree at <dir>_x10 — reject it loudly instead.
    require(!base.matches(".*_x\\d+$"),
      s"base '$base' looks like an already-scaled corpus dir; pass the " +
        "BASE path (scaled dirs are derived as <base>_x10 / <base>_x30)")
    val base10 = base + "_x10"
    val base30 = base + "_x30"
    println(s"[scale] corpora: 1x=$srcDir 10x=$base10 30x=$base30")
    ensureCorpus(s, srcDir, base10, 10)
    ensureCorpus(s, srcDir, base30, 30)
    // same warmup + inter-query hygiene as Bench
    s.range(1000).selectExpr("sum(id)").collect()
    Tables.events(s, srcDir).count()
    def measure(name: String, dir: String): (Double, Double) =
      ScaleProbe.measure(s, name, dir)
    // same dev-loop subset contract as Bench/Verify
    val probeSet = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
      .map(names => ProbeQueries.filter(names))
      .getOrElse(ProbeQueries)
    val rows = probeSet.map { q =>
      val (a1, a2) = measure(q, srcDir)
      val (b1, b2) = measure(q, base10)
      println(f"""{"query":"$q","sf01_s":$a2%.2f,"x10_s":$b2%.2f,"ratio":${b2 / a2}%.2f,"sf01_first_s":$a1%.2f,"x10_first_s":$b1%.2f}""")
      (q, a2, b2, b2 / a2)
    }
    println("| query | sf0.1 s (2nd pass) | 10x s (2nd pass) | ratio |")
    println("|---|---|---|---|")
    rows.foreach { case (q, a, b, r) =>
      println(f"| $q | $a%.2f | $b%.2f | $r%.2f |")
    }
    // the 30x octave + exponent fit for the worst MEASURED 10x ratios
    val octave = rows.sortBy(-_._4).take(OctaveCount)
    println(s"[scale] octave set (worst ${OctaveCount} measured ratios): " +
      octave.map(_._1).mkString(", "))
    println("| query | 1x s | 10x s | 30x s | exponent |")
    println("|---|---|---|---|---|")
    octave.foreach { case (q, t1, t10, _) =>
      val (_, t30) = measure(q, base30)
      val e = fitExponent(Seq((1.0, t1), (10.0, t10), (30.0, t30)))
      println(f"""{"query":"$q","sf01_s":$t1%.2f,"x10_s":$t10%.2f,"x30_s":$t30%.2f,"exponent":$e%.3f}""")
      println(f"| $q | $t1%.2f | $t10%.2f | $t30%.2f | $e%.3f |")
    }
    s.stop()
  }
}
