package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift monitors: per-source two-sample tests of the document
  * token-count distribution against the rest of the corpus — the statistical
  * gate a production ingest runs before accepting a new crawl batch (the
  * reference's freshness checks stop at row counts and recency,
  * e.g. fct_* dbt tests; these extend that to SHAPE: "did source X's length
  * distribution move?"). Three classic statistics, one shared scan:
  *
  *  - [[driftKs]] — exact two-sample Kolmogorov–Smirnov D (the supremum CDF
  *    gap), sensitive to any distributional change, no binning choices;
  *  - [[driftChi2]] — Pearson two-sample chi-square over fixed-width
  *    buckets, the classic frequency test (large-sample χ² reading);
  *  - [[driftTv]] — total-variation distance between bucket histograms, the
  *    "what fraction of mass moved" number dashboards want.
  *
  * All three stay in the registry's exact-integer discipline: counts are
  * exact, every ratio is a `div` in ppm (or ‰ for χ²) with decimal(38,0)
  * guarding the products — no transcendental, no float accumulation, so the
  * DuckDB oracle reproduces each statistic bit-exactly. (A p-value would
  * need the KS/χ² tail functions — transcendental — so the operators emit
  * the statistic and leave thresholding to the monitor, which is how
  * production drift gates are configured anyway.)
  *
  * Scale shape (the reason these are safe at 100 TB): the corpus is touched
  * by ONE aggregate with map-side combine down to (source × distinct-value)
  * rows — vocabulary-bounded, like [[TextAnalysis]]'s LM tables — and all
  * window/grid work happens on that model-sized frame (|sources| × |distinct
  * token counts|). The KS trick that makes per-source-vs-REST one pass
  * instead of |sources| passes: out-slice counts at each value are
  * `global − in` where the global per-value counts come from a broadcast of
  * the same aggregate re-reduced, so no per-source rescan of the corpus.
  */
object Drift {

  /** Per-doc metric: exact token count (NULL-safe, 0 for empty/NULL text —
    * the dsirScorer NULL-parity lesson).
    */
  private def toksCol: Column =
    coalesce(size(split(col("text"), " ")).cast("long"), lit(0L))

  /** (source, v, cnt_in, g_cnt, n_in, n_out) over the full grid of
    * sources × distinct metric values — the shared model-sized frame all
    * three statistics reduce. `g_cnt` is the GLOBAL doc count at value v,
    * so `cnt_out = g_cnt − cnt_in` without a second corpus pass.
    */
  private def grid(documents: DataFrame, metric: Column): DataFrame = {
    // NULL-source docs are excluded up front, in BOTH engines (oracle CTE
    // mirrors the WHERE): a NULL source isn't a batch a monitor can page
    // on. Plan-wise this is also what keeps the corpus scan UNIQUE — the
    // grid's left join would otherwise infer IsNotNull(source) on only the
    // perVal arm, splitting the canonical exchange and doubling the scan
    // (PlanAuditSpec pins one scan per statistic).
    // the v filter is a semantic no-op (every metric coalesces to non-null)
    // with the same plan purpose: Catalyst can't prove non-null through the
    // bucket division, so without the explicit constraint the join arm gets
    // an inferred isnotnull(v) the other arms lack
    val per = documents.where(col("source").isNotNull)
      .select(col("source"), metric.as("v"))
      .where(col("v").isNotNull)
    val perVal = per.groupBy(col("source"), col("v"))
      .agg(count(lit(1)).as("cnt_in"))
    // vals/srcs/total RE-REDUCE perVal instead of re-aggregating `per`: the
    // four identical corpus-side exchanges canonicalize onto ONE, so
    // ReuseExchange leaves a single documents scan in the plan (pinned by
    // PlanAuditSpec). The r15 form aggregated `per` four separate times —
    // four corpus scans for one statistic.
    val vals = perVal.groupBy(col("v")).agg(sum(col("cnt_in")).as("g_cnt"))
    val srcs = perVal.groupBy(col("source")).agg(sum(col("cnt_in")).as("n_in"))
    val total = vals.agg(sum(col("g_cnt")).as("n_total"))
    srcs.crossJoin(broadcast(total))
      .withColumn("n_out", col("n_total") - col("n_in"))
      .crossJoin(broadcast(vals))
      .join(perVal, Seq("source", "v"), "left")
      .withColumn("cnt_in", coalesce(col("cnt_in"), lit(0L)))
      .withColumn("cnt_out", col("g_cnt") - col("cnt_in"))
  }

  /** `drift_ks`: exact two-sample Kolmogorov–Smirnov statistic per source
    * vs the rest of the corpus, over the token-count distribution.
    * D = sup_v |F_in(v) − F_out(v)| evaluated at every distinct value (the
    * correct discrete-data form: between observed values both CDFs are
    * constant, so the supremum is attained at a value). Integer-exact:
    * d_num(v) = |n_out·cum_in(v) − n_in·cum_out(v)| and
    * ks_d_ppm = max(d_num)·10⁶ div (n_in·n_out) — the decimal(38,0) product
    * guard holds per-slice counts to ~10¹⁵ before the ×10⁶ would overflow.
    * D = 0 ⇔ identical CDFs; D = 1 (10⁶ ppm) ⇔ complete separation.
    */
  def driftKs(documents: DataFrame): DataFrame = {
    val w = Window.partitionBy("source").orderBy("v")
    grid(documents, toksCol)
      .withColumn("cum_in", sum(col("cnt_in")).over(w))
      .withColumn("cum_out", sum(col("cnt_out")).over(w))
      .withColumn("d_num",
        abs(expr("cast(n_out as decimal(38,0)) * cum_in") -
          expr("cast(n_in as decimal(38,0)) * cum_out")))
      .groupBy(col("source"), col("n_in"), col("n_out"))
      .agg(max(col("d_num")).as("max_d_num"))
      .withColumn("ks_d_ppm",
        expr("cast((max_d_num * 1000000) div (cast(n_in as decimal(38,0)) * n_out) as bigint)"))
      .select(col("source"), col("n_in"), col("n_out"), col("ks_d_ppm"))
  }

  /** Fixed-width length buckets for the histogram statistics: token count
    * div 16 — deterministic, data-independent edges (quantile edges would
    * make the statistic depend on the pooled sample, breaking the
    * "reference window is frozen" monitoring contract).
    */
  private[graft] val BucketWidth = 16L

  /** `drift_chi2`: Pearson two-sample chi-square per source vs rest over
    * fixed-width token-count buckets. The two-sample identity
    * χ² = Σ_b (O_in·n_out − O_out·n_in)² / (T_b·n_in·n_out), T_b = O_in+O_out,
    * makes every term RATIONAL — no expected-count floats — so the operator
    * emits χ²×1000 (`chi2_milli`) with a per-bucket integer `div` (floor)
    * before the sum, mirrored exactly in the oracle. Magnitude guard: the
    * squared numerator stays inside decimal(38,0)/HUGEINT for per-slice
    * counts up to ~10⁹; beyond that a deployment rescales counts (the
    * statistic is scale-invariant under proportional rescaling) — noted
    * here because 100 TB corpora do reach 10¹⁰ docs.
    */
  def driftChi2(documents: DataFrame): DataFrame = {
    val bucket = (toksCol / BucketWidth).cast("long")
    grid(documents, bucket)
      .withColumn("delta",
        expr("cast(cnt_in as decimal(38,0)) * n_out") -
          expr("cast(cnt_out as decimal(38,0)) * n_in"))
      .withColumn("contrib_milli",
        expr("(delta * delta * 1000) div " +
          "((cnt_in + cnt_out) * cast(n_in as decimal(38,0)) * n_out)"))
      .groupBy(col("source"), col("n_in"), col("n_out"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("contrib_milli")).cast("long").as("chi2_milli"))
      .select(col("source"), col("n_in"), col("n_out"),
        col("n_buckets"), col("chi2_milli"))
  }

  /** `drift_tv`: total-variation distance between the source's and the
    * rest-of-corpus bucket histograms —
    * TV = ½ Σ_b |p_in(b) − p_out(b)| ∈ [0, 1], emitted in ppm with each
    * share floored to ppm first (`cnt·10⁶ div n`), mirrored in the oracle.
    * TV is the number a mix dashboard plots: "this fraction of the source's
    * probability mass sits in buckets where the corpus doesn't".
    */
  def driftTv(documents: DataFrame): DataFrame = {
    val bucket = (toksCol / BucketWidth).cast("long")
    grid(documents, bucket)
      .withColumn("share_in_ppm",
        expr("(cast(cnt_in as decimal(38,0)) * 1000000) div n_in"))
      .withColumn("share_out_ppm",
        expr("(cast(cnt_out as decimal(38,0)) * 1000000) div n_out"))
      .groupBy(col("source"), col("n_in"), col("n_out"))
      .agg((sum(abs(col("share_in_ppm") - col("share_out_ppm"))) / 2)
        .cast("long").as("tv_ppm"))
      .select(col("source"), col("n_in"), col("n_out"), col("tv_ppm"))
  }

  /** Shared oracle CTE: the sources × values grid with in/out counts, over
    * metric `expr` (a SQL expression over `documents`).
    */
  private def gridSql(metricSql: String): String =
    s"""per AS (
       |  SELECT * FROM (
       |    SELECT source, $metricSql AS v FROM documents
       |    WHERE source IS NOT NULL)
       |  WHERE v IS NOT NULL),
       |perval AS (
       |  SELECT source, v, COUNT(*) AS cnt_in FROM per GROUP BY 1, 2),
       |vals AS (SELECT v, COUNT(*) AS g_cnt FROM per GROUP BY 1),
       |srcs AS (SELECT source, COUNT(*) AS n_in FROM per GROUP BY 1),
       |tot AS (SELECT COUNT(*) AS n_total FROM per),
       |grid AS (
       |  SELECT s.source, s.n_in, t.n_total - s.n_in AS n_out, v.v, v.g_cnt,
       |         COALESCE(pv.cnt_in, 0) AS cnt_in,
       |         v.g_cnt - COALESCE(pv.cnt_in, 0) AS cnt_out
       |  FROM srcs s CROSS JOIN tot t CROSS JOIN vals v
       |  LEFT JOIN perval pv ON pv.source = s.source AND pv.v = v.v)""".stripMargin

  private val toksSql =
    "COALESCE(CAST(len(string_split(text, ' ')) AS BIGINT), 0)"
  private val bucketSql = s"$toksSql // ${BucketWidth}"

  val oracles: Map[String, String] = Map(
    "drift_ks" ->
      s"""WITH ${gridSql(toksSql)},
         |cum AS (
         |  SELECT source, n_in, n_out,
         |         SUM(cnt_in) OVER (PARTITION BY source ORDER BY v) AS cum_in,
         |         SUM(cnt_out) OVER (PARTITION BY source ORDER BY v) AS cum_out
         |  FROM grid)
         |SELECT source, n_in, n_out,
         |       CAST(MAX(ABS(n_out::HUGEINT * cum_in - n_in::HUGEINT * cum_out))
         |            * 1000000 // (n_in::HUGEINT * n_out) AS BIGINT) AS ks_d_ppm
         |FROM cum GROUP BY source, n_in, n_out""".stripMargin,
    "drift_chi2" ->
      s"""WITH ${gridSql(bucketSql)},
         |terms AS (
         |  SELECT source, n_in, n_out,
         |         (cnt_in::HUGEINT * n_out - cnt_out::HUGEINT * n_in) AS delta,
         |         cnt_in + cnt_out AS t_b
         |  FROM grid)
         |SELECT source, n_in, n_out, COUNT(*) AS n_buckets,
         |       CAST(SUM((delta * delta * 1000)
         |                // (t_b::HUGEINT * n_in * n_out)) AS BIGINT) AS chi2_milli
         |FROM terms GROUP BY source, n_in, n_out""".stripMargin,
    "drift_tv" ->
      s"""WITH ${gridSql(bucketSql)}
         |SELECT source, n_in, n_out,
         |       CAST(SUM(ABS((cnt_in::HUGEINT * 1000000) // n_in
         |                    - (cnt_out::HUGEINT * 1000000) // n_out)) // 2
         |            AS BIGINT) AS tv_ppm
         |FROM grid GROUP BY source, n_in, n_out""".stripMargin
  )
}
