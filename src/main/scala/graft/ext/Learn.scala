package graft.ext

import graft.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed training primitives — the two inner loops a large-scale
  * data pipeline actually runs over its corpus once curation is done:
  * fitting a quality/domain classifier on embeddings, and learning a
  * tokenizer merge table from text. Both are single-pass grouped
  * aggregates in Spark form — the "training step as a query" pattern that
  * scales to 100 TB because the corpus only ever flows through map-side
  * combinable aggregation (the model state, not the data, is what
  * iterates).
  */
object Learn {

  type Q = (SparkSession, String) => DataFrame

  private def emb(s: SparkSession, dir: String) =
    Tables.load(s, dir, "embeddings").filter(col("embedding").isNotNull)

  /** `x_logreg_step` — one exact batch gradient-descent step of logistic
    * regression (binary target `label % 2`) over the embedding table,
    * from a fixed deterministic weight vector `w0_j = 0.1 * ((j % 5) - 2)`
    * and zero bias. This is the quality-classifier training loop (e.g.
    * fastText-style corpus filters) expressed Spark-first:
    *
    *  - per-row margin/sigmoid/residual is a narrow codegen'd map
    *    (`zip_with` + `aggregate` HOFs against a broadcast literal weight
    *    vector — no UDF);
    *  - the gradient `g_j = Σ_i (σ(w·x_i) − y_i) · x_ij` is a posexplode +
    *    per-dimension sum: map-side combinable, shuffle carries exactly
    *    `dims × partitions` partial rows regardless of corpus size;
    *  - the updated weights `w' = w0 − η·g/n` come out as `dims + 1` rows
    *    (bias as dim −1), i.e. the MODEL is the result set — driver never
    *    sees the data.
    *
    * At 100 TB the same plan is the full-batch step; minibatching is a
    * [[Curation.xSampleHash]]-style deterministic filter upstream.
    * Rounded at 6 digits with the +1e-9 half-tie guard — engine libm
    * `exp` agreement is well inside that. */
  def xLogregStep(s: SparkSession, dir: String,
                  dims: Int = 64, lr: Double = 0.5): DataFrame = {
    val w0 = typedLit(Seq.tabulate(dims)(j => 0.1 * ((j % 5) - 2)))
    val x = col("embedding").cast("array<double>")
    val rows = emb(s, dir).select(
      x.as("x"),
      (col("label") % 2).cast("double").as("y"),
      aggregate(zip_with(x, w0, (a, b) => a * b), lit(0.0), (acc, v) => acc + v)
        .as("margin"))
      .select(col("x"), col("y"),
        (lit(1.0) / (lit(1.0) + exp(-col("margin"))) - col("y")).as("resid"))
    val byDim = rows
      .select(col("resid"), posexplode(col("x")).as(Seq("dim", "xj")))
      .groupBy("dim")
      .agg(sum(col("resid") * col("xj")).as("g"), count(lit(1)).as("n"))
      .select(col("dim").cast("long").as("dim"),
        round(lit(0.1) * ((col("dim") % 5) - 2) + lit(1e-9), 6).as("w_old"),
        round(col("g") / col("n") + lit(1e-9), 6).as("grad_mean"),
        round(lit(0.1) * ((col("dim") % 5) - 2) - lit(lr) * col("g") / col("n")
          + lit(1e-9), 6).as("w_new"))
    val bias = rows.agg(sum("resid").as("g"), count(lit(1)).as("n"))
      .select(lit(-1L).as("dim"), lit(0.0).as("w_old"),
        round(col("g") / col("n") + lit(1e-9), 6).as("grad_mean"),
        round(-lit(lr) * col("g") / col("n") + lit(1e-9), 6).as("w_new"))
    bias.unionByName(byDim).orderBy("dim")
  }

  /** `x_bpe_pairs` — one merge-selection iteration of byte-pair-encoding
    * tokenizer training (Sennrich et al., ACL'16): count adjacent symbol
    * pairs across the corpus vocabulary, weighted by word frequency, and
    * rank the merge candidates. Spark shape:
    *
    *  - the corpus collapses to the VOCABULARY first (`groupBy word` —
    *    map-side combinable, and the heavy-tail word distribution is
    *    exactly what AQE skew handling absorbs);
    *  - pair generation is a per-word `transform(sequence(...))` over the
    *    word's ≤ len−1 adjacent pairs — narrow, no UDF;
    *  - the top-32 merge candidates come via TakeOrdered on (freq desc,
    *    pair), never a global sort.
    *
    * Subsequent BPE iterations re-run the same aggregate over the merged
    * vocabulary — each step is this query with the merge applied; the
    * corpus itself is read once (vocabulary extraction). */
  def xBpePairs(s: SparkSession, dir: String, k: Int = 32): DataFrame = {
    val words = Tables.load(s, dir, "documents")
      .filter(col("text").isNotNull)
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("n"))
    words
      .select(col("n"), explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
        .as("pair"))
      .groupBy("pair")
      .agg(sum("n").as("freq"), count(lit(1)).as("n_words"))
      .orderBy(desc("freq"), asc("pair"))
      .limit(k)
  }

  val queries: Map[String, Q] = Map(
    "x_logreg_step" -> ((s, dir) => xLogregStep(s, dir)),
    "x_bpe_pairs" -> ((s, dir) => xBpePairs(s, dir))
  )

  val oracles: Map[String, String] = Map(
    "x_logreg_step" ->
      """WITH e AS (SELECT embedding::DOUBLE[] AS x, CAST(label % 2 AS DOUBLE) AS y
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |r AS (SELECT x, y,
        |  1.0 / (1.0 + exp(-list_dot_product(x,
        |    list_transform(range(0, len(x)), j -> 0.1 * ((j % 5) - 2))))) - y AS resid
        |  FROM e),
        |d AS (SELECT unnest(x) AS xj, unnest(range(len(x))) AS dim, resid FROM r),
        |g AS (SELECT dim, sum(resid * xj) AS g, count(*) AS n FROM d GROUP BY 1),
        |byd AS (SELECT CAST(dim AS BIGINT) AS dim,
        |  round(0.1 * ((dim % 5) - 2) + 1e-9, 6) AS w_old,
        |  round(g / n + 1e-9, 6) AS grad_mean,
        |  round(0.1 * ((dim % 5) - 2) - 0.5 * g / n + 1e-9, 6) AS w_new FROM g),
        |bias AS (SELECT CAST(-1 AS BIGINT) AS dim, 0.0 AS w_old,
        |  round(sum(resid) / count(*) + 1e-9, 6) AS grad_mean,
        |  round(-0.5 * sum(resid) / count(*) + 1e-9, 6) AS w_new FROM r)
        |SELECT * FROM bias UNION ALL SELECT * FROM byd ORDER BY dim""".stripMargin,
    "x_bpe_pairs" ->
      """WITH w0 AS (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
        |  FROM documents WHERE text IS NOT NULL),
        |wc AS (SELECT word, count(*) AS n FROM w0 WHERE len(word) >= 2 GROUP BY 1),
        |p AS (SELECT n, unnest(list_transform(range(1, len(word)),
        |  i -> substr(word, CAST(i AS INTEGER), 2))) AS pair FROM wc)
        |SELECT pair, CAST(sum(n) AS BIGINT) AS freq, count(*) AS n_words
        |FROM p GROUP BY 1 ORDER BY freq DESC, pair LIMIT 32""".stripMargin
  )
}
