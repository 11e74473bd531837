package graft.ext

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the corpus-curation operators beyond the DuckDB oracle. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  test("dup clusters: edges stay within a cluster, cluster id = min member") {
    val labels = Curation.xDupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.nonEmpty)
    // cluster id is itself a member and the minimum of its members
    val members = labels.groupBy(_._2).view.mapValues(_.keys.toSeq)
    members.foreach { case (c, ms) =>
      assert(ms.min == c, s"cluster $c: min member ${ms.min}")
    }
    // every thresholded pair is intra-cluster (the defining CC property)
    val pairs = Dedup.xMinhashPairs(spark, dir)
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b").collect()
    pairs.foreach { r =>
      assert(labels(r.getLong(0)) == labels(r.getLong(1)),
        s"edge ${r.getLong(0)}-${r.getLong(1)} crosses clusters")
    }
  }

  test("hash sample: deterministic membership, ~25% rate") {
    val a = Curation.xSampleHash(spark, dir).collect().map(_.getLong(0))
    val b = Curation.xSampleHash(spark, dir).collect().map(_.getLong(0))
    assert(a.toSeq == b.toSeq) // reproducible split
    val total = graft.Tables.load(spark, dir, "documents").count()
    val rate = a.length.toDouble / total
    assert(rate > 0.15 && rate < 0.35, s"sample rate $rate")
  }

  test("stratified sample: exactly the quota per present class") {
    val rows = Curation.xSampleStratified(spark, dir, perClass = 20).collect()
    val perLang = rows.groupBy(_.getString(0)).view.mapValues(_.length)
    perLang.foreach { case (lang, n) => assert(n <= 20, s"$lang: $n") }
    assert(rows.map(_.getLong(2)).distinct.length == rows.length) // no dup docs
  }

  test("tfidf: ranks are 1..3 per doc and scores non-increasing") {
    val rows = Curation.xTfidfTop(spark, dir).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      val scores = sorted.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
    }
  }

  test("sequence packing: complete partition of each shard, contiguous ids") {
    // (lang, shard, seq_id, n_docs, n_tokens, first_doc, last_doc)
    val rows = Curation.xPackSequences(spark, dir, budget = 512).collect()
    assert(rows.nonEmpty)
    // every document lands in exactly one packed sequence
    val total = graft.Tables.load(spark, dir, "documents").count()
    assert(rows.map(_.getLong(3)).sum == total)
    rows.groupBy(r => (r.getString(0), r.getLong(1))).foreach {
      case ((lang, shard), seqs) =>
        val sorted = seqs.sortBy(_.getLong(2))
        // seq ids are assigned by doc START offset: the first doc always
        // starts at 0 so id 0 exists, ids are strictly increasing, but a
        // doc longer than the budget legitimately leaves a gap (no doc
        // STARTS inside the window it spans) — don't assert contiguity
        assert(sorted.head.getLong(2) == 0L, s"$lang/$shard first id")
        assert(sorted.map(_.getLong(2)).distinct.length == sorted.length,
          s"$lang/$shard duplicate ids")
        // doc spans are disjoint and ordered across consecutive sequences
        sorted.sliding(2).foreach { w =>
          if (w.length == 2) assert(w(0).getLong(6) < w(1).getLong(5),
            s"$lang/$shard spans overlap")
        }
        // a sequence holds > budget tokens only via its straddling last doc
        sorted.foreach { r =>
          assert(r.getLong(4) > 0)
          assert(r.getLong(3) >= 1)
        }
    }
  }

  test("shingle family survives 1- and 2-token documents (ANSI OOB)") {
    // Under ANSI mode element_at throws past the array end, and the
    // optimizer's inferred explode pre-filter evaluates shingle/bigram
    // lambdas on rows the size filters later remove — so every shingle
    // construction must be OOB-safe by itself (try_element_at + clamped
    // sequence). A corpus with short docs crashed 12 queries before r6.
    import spark.implicits._
    val docs = Seq(
      (1L, "single", "en", "syn", 6L),
      (2L, "two words", "en", "syn", 9L),
      (3L, "three token doc here", "en", "syn", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_short").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // 1-token doc: one degenerate shingle "single"; 2-token: "two words"
    val sh = docs.select(col("doc_id"),
        Dedup.shingles(split(col("text"), " ")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(1L) == Seq("single"))
    assert(sh(2L) == Seq("two words"))
    assert(sh(3L) == Seq("three token doc", "token doc here"))
    // the end-to-end queries that crashed: construct + materialize
    assert(Dedup.xMinhashSignatures(spark, tmp).count() == 3)
    assert(Dedup.xJaccardNgram(spark, tmp).count() >= 0)
    assert(Fingerprint.xWinnowFingerprint(spark, tmp).count() == 3)
    assert(TextOps.xBigramLogprob(spark, tmp).count() == 2) // 1-token excluded
  }

  test("canonical docs: partition of the corpus, keeper is the longest member") {
    // (cluster, n_members, keeper_doc, keeper_tokens)
    val rows = Curation.xCanonicalDocs(spark, dir).collect()
    val total = graft.Tables.load(spark, dir, "documents").count()
    assert(rows.map(_.getLong(1)).sum == total) // every doc in exactly one cluster
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    val clusterOf = Curation.xDupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nTokens = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (c, keeper, keeperTok) = (r.getLong(0), r.getLong(2), r.getInt(3))
      assert(clusterOf.getOrElse(keeper, keeper) == c, s"keeper $keeper not in $c")
      assert(nTokens(keeper) == keeperTok)
      // no member of the cluster is strictly longer than the keeper
      val members = clusterOf.collect { case (d, cl) if cl == c => d } ++
        (if (clusterOf.contains(c)) Nil else Seq(c))
      members.foreach(m => assert(nTokens(m) <= keeperTok,
        s"member $m of $c longer than keeper"))
    }
  }

  test("leakage-safe split: near-duplicates never straddle a split") {
    // (doc_id, cluster, split)
    val rows = Curation.xSplitLeakageSafe(spark, dir).collect()
    val total = graft.Tables.load(spark, dir, "documents").count()
    assert(rows.length == total)
    assert(rows.forall(r => Set("train", "val", "test")(r.getString(2))))
    // the defining property: one split per cluster
    rows.groupBy(_.getLong(1)).foreach { case (c, ms) =>
      assert(ms.map(_.getString(2)).distinct.length == 1,
        s"cluster $c straddles splits")
    }
    // and specifically across every thresholded near-dup pair
    val splitOf = rows.map(r => r.getLong(0) -> r.getString(2)).toMap
    Dedup.xMinhashPairs(spark, dir).filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b").collect().foreach { r =>
        assert(splitOf(r.getLong(0)) == splitOf(r.getLong(1)),
          s"pair ${r.getLong(0)}-${r.getLong(1)} split apart")
      }
  }

  test("contamination report is the exact transpose of decontamination") {
    val fwd = Curation.xDecontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rep = Curation.xContaminationReport(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rep.foreach { case (evalId, nDocs, nShared) =>
      assert(evalId < 10, s"non-eval id $evalId in report")
      assert(nDocs > 0 && nShared >= nDocs, s"$evalId counts inconsistent")
    }
    // total shared occurrences must agree between the two directions when
    // each corpus hit is weighted by how many eval docs carry the shingle —
    // weaker cross-check: every eval doc with hits implies forward hits
    assert(rep.nonEmpty == fwd.nonEmpty)
  }

  test("bloom decontamination is byte-identical to the exact probe") {
    val exact = Curation.xDecontaminate(spark, dir).collect().map(_.toSeq).toSeq
    val bloom = Curation.xDecontaminateBloom(spark, dir).collect().map(_.toSeq).toSeq
    assert(exact.nonEmpty && exact == bloom)
  }

  test("shard manifest: full partition, checksum flips when a doc changes") {
    val rows = Curation.xShardManifest(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_._2).sum == total, "shards do not partition the corpus")
    assert(rows.forall(_._4.matches("[0-9a-f]{32}")), "malformed checksum")
    // deterministic across runs
    val again = Curation.xShardManifest(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.toSeq == again.toSeq)
    // XOR property: identical twin docs cancel — a shard containing exactly
    // two copies of one text contributes zero words from those copies
    import spark.implicits._
    val tiny = Seq((0L, "a b c"), (8L, "a b c")) // both hash to one shard set
      .toDF("doc_id", "text")
    tiny.createOrReplaceTempView("x") // exercise via direct aggregation
    val w = tiny.select(expr("conv(substring(md5(text), 1, 8), 16, 10)")
      .cast("long").as("w0"))
      .agg(expr("bit_xor(w0)")).head().getLong(0)
    assert(w == 0L, "identical fingerprints must cancel under XOR")
  }

  test("ngram novelty: first doc all-novel, bounds hold, counts partition") {
    val rows = Curation.xNgramNovelty(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nSh, nNovel, nov) =>
      assert(nNovel >= 0 && nNovel <= nSh, s"doc $id novel > total")
      assert(nov >= 0.0 && nov <= 1.0 + 1e-6, s"doc $id novelty $nov")
    }
    // the lowest doc_id owns every one of its shingles by construction
    val first = rows.minBy(_._1)
    assert(first._2 == first._3, s"doc ${first._1} not fully novel")
    // conservation: every distinct shingle is owned by exactly one doc, so
    // the novel counts partition the corpus-wide distinct shingle set
    val distinctShingles = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(array_distinct(
        Dedup.shingles(split(col("text"), " ")))).as("sh"))
      .distinct().count()
    assert(rows.map(_._3).sum == distinctShingles,
      "novel counts do not partition the distinct shingle set")
  }

  test("source budget: kept within totals, overweight sources downsampled") {
    val rows = Curation.xSourceBudget(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val total = rows.map(_._3).sum.toDouble
    rows.foreach { case (src, nDocs, tokTotal, nKept, tokKept, ppm) =>
      assert(nKept <= nDocs && tokKept <= tokTotal, s"$src kept > total")
      assert(ppm > 0.0 && ppm <= 1e6 + 1, s"$src rate_ppm $ppm out of range")
      // rate = min(1, (total/2/n_src)/tokens): exact per-source check
      val expect = math.min(1.0, total * 0.5 / rows.length / tokTotal)
      assert(math.abs(ppm - (expect * 1e6 + 1e-9)) < 0.51, s"$src rate wrong")
    }
    // the whole point: at least one source is actually downsampled
    assert(rows.exists(r => r._4 < r._2), "no source downsampled — vacuous")
  }

  test("corpus overlap: symmetric shared counts, containment bounded") {
    val rows = Curation.xCorpusOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case ((a, b), (n, c)) =>
      assert(a != b, "self pairs excluded")
      // |S_a ∩ S_b| is symmetric even though containment is directed
      assert(rows((b, a))._1 == n, s"asymmetric shared count for ($a,$b)")
      assert(n > 0 && c > 0.0 && c <= 1.0, s"($a,$b) out of bounds: $n, $c")
    }
  }

  test("zipf fit: one row, negative slope, matches a direct least-squares") {
    val row = Curation.xZipfFit(spark, dir).head()
    assert(row.getLong(0) > 0 && row.getLong(0) <= 256)
    val slope = row.getDouble(1)
    assert(slope < 0.0, s"zipf slope $slope must be negative (freq falls with rank)")
    // reconstruct: same head, closed-form least squares
    val head = Curation.xVocabTopk(spark, dir, k = 256).collect()
      .map(r => r.getLong(1).toDouble)
    val pts = head.zipWithIndex.map { case (f, i) =>
      (math.log(i + 1.0), math.log(f)) }
    val n = pts.length
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val direct = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(slope - direct) < 1e-6,
      s"regr_slope $slope vs direct fit $direct")
  }

  test("vocab top-k: deterministic ranking, doc frequency bounded by count") {
    // (token, n_occurrences, n_docs)
    val rows = Curation.xVocabTopk(spark, dir, k = 50).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val occ = rows.map(_.getLong(1))
    assert(occ.zip(occ.tail).forall { case (a, b) => a >= b }) // sorted
    rows.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1))
      assert(r.getString(0).nonEmpty)
    }
  }

  test("dsir selection tilts toward the target domain") {
    val sel = Curation.xDsirSelect(spark, dir).collect()
    assert(sel.length == 50)
    // scores are presented sorted, ties broken by doc_id
    val scores = sel.map(_.getAs[Double]("dsir_logratio"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // the whole point: the en-targeted selection must over-represent en
    // relative to its ~39% base rate in the corpus
    val langOf = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val nEn = sel.count(r => langOf(r.getAs[Long]("doc_id")) == "en")
    assert(nEn >= 25, s"only $nEn/50 selected docs are en — no tilt")
  }

  test("repetition: ratio bounded by construction and consistent") {
    // (doc_id, n_tokens, n_trigrams, n_distinct, rep_ratio)
    val rows = TextOps.xRepetition(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nTri, nDis, ratio) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nTri == nTok - 2) // positional trigram count
      assert(nDis >= 1 && nDis <= nTri)
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(math.abs(ratio - (1.0 - nDis.toDouble / nTri)) < 1e-3)
    }
  }

  test("paragraph dedup matches a brute-force first-occurrence recompute") {
    val got = Curation.xParagraphDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val docs = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
      .sortBy(_._1)
    val seen = scala.collection.mutable.Set.empty[String]
    val exp = docs.map { case (id, toks) =>
      val chunks = toks.grouped(8).map(_.mkString(" ")).toSeq
      val kept = chunks.filter(seen.add) // first occurrence wins, in order
      val chars = kept.map(_.length).sum + math.max(kept.size - 1, 0)
      id -> (chunks.size.toLong, kept.size.toLong, chars.toLong)
    }.toMap
    assert(got == exp)
    // the pass must actually remove something at this sf
    assert(got.exists { case (_, (n, k, _)) => k < n }, "no cross-doc dups")
  }
}
