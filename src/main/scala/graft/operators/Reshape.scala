package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.functions.Num

/** Serve-layer reshaping + statistics (SURVEY.md §2.9). The scipy tests
  * (linregress, t-test, autocorrelation) are re-expressed as closed forms over
  * exact integer moments — one distributed aggregation, deterministic doubles,
  * no driver-side math library (maps `stats_tests` per SURVEY §2.9).
  */
object Reshape {

  private def d(c: Column): Column = c.cast(DoubleType)

  /** zero → NULL denominator guard: Spark's double divide-by-zero yields
    * NULL but DuckDB's IEEE default yields inf/NaN — guarding both sides
    * with NULLIF keeps degenerate groups (single point, zero variance)
    * cross-engine identical.
    */
  private def safeDen(c: Column): Column = when(c === 0.0, null).otherwise(c)

  /** `pivot_assignee` (pages/1_Linear_Issues.py:209-240): pivot_table with
    * row totals — groupBy().pivot().sum() + total column.
    */
  def pivotAssignee(orders: DataFrame, customer: DataFrame): DataFrame = {
    val joined = orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .select(col("c_mktsegment").as("segment"), col("o_orderpriority").as("priority"),
        Num.cents(col("o_totalprice")).as("cents"))
    def pivotCents(grouped: DataFrame): DataFrame = grouped
      .withColumnRenamed("1-URGENT", "urgent_cents")
      .withColumnRenamed("2-HIGH", "high_cents")
      .withColumnRenamed("3-MEDIUM", "medium_cents")
      .withColumnRenamed("4-NOT SPECIFIED", "not_specified_cents")
      .withColumnRenamed("5-LOW", "low_cents")
    val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val perSegment = pivotCents(joined.groupBy(col("segment"))
      .pivot("priority", priorities).agg(sum(col("cents"))))
    // margins row (pandas pivot_table(margins=True), pages/1_Linear_Issues
    // .py:209-240): column totals over all segments, keyed 'All'. A global
    // agg (not groupBy(lit)): SQL's no-GROUP-BY aggregate emits exactly one
    // row even on empty input, and the oracle must agree
    val marginsRow = joined.agg(
      sum(when(col("priority") === "1-URGENT", col("cents"))).as("urgent_cents"),
      sum(when(col("priority") === "2-HIGH", col("cents"))).as("high_cents"),
      sum(when(col("priority") === "3-MEDIUM", col("cents"))).as("medium_cents"),
      sum(when(col("priority") === "4-NOT SPECIFIED", col("cents"))).as("not_specified_cents"),
      sum(when(col("priority") === "5-LOW", col("cents"))).as("low_cents"))
      .select(lit("All").as("segment"), col("urgent_cents"), col("high_cents"),
        col("medium_cents"), col("not_specified_cents"), col("low_cents"))
    val wide = perSegment.unionByName(marginsRow)
    wide.select(
      col("segment"),
      Num.dollars(col("urgent_cents")).as("urgent"),
      Num.dollars(col("high_cents")).as("high"),
      Num.dollars(col("medium_cents")).as("medium"),
      Num.dollars(col("not_specified_cents")).as("not_specified"),
      Num.dollars(col("low_cents")).as("low"),
      Num.dollars(
        coalesce(col("urgent_cents"), lit(0L)) + coalesce(col("high_cents"), lit(0L)) +
          coalesce(col("medium_cents"), lit(0L)) + coalesce(col("not_specified_cents"), lit(0L)) +
          coalesce(col("low_cents"), lit(0L))).as("total"))
  }

  /** `melt_scores` (pages/2_GitHub_PRs.py:255): wide metric columns → long
    * (metric, value) rows via stack.
    */
  def meltScores(events: DataFrame): DataFrame = {
    val v = Num.cents(col("value"))
    events
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "purchase", v)).as("purchase_cents"),
        sum(when(col("event_type") === "click", v)).as("click_cents"),
        sum(when(col("event_type") === "view", v)).as("view_cents"))
      .select(col("user_id"),
        expr("stack(3, 'purchase', purchase_cents, 'click', click_cents, 'view', view_cents)")
          .as(Seq("metric", "metric_cents")))
      .select(col("user_id"), col("metric"), Num.dollars(col("metric_cents")).as("metric_value"))
  }

  /** `norm_first` (pages/10_Stock_Prices.py:264-283): normalize each series to
    * its first value in range (investment-of-100).
    */
  def normFirst(prices: DataFrame): DataFrame = {
    val w = Window.partitionBy("ticker").orderBy("trade_date")
      .rowsBetween(Window.unboundedPreceding, 0)
    prices
      .withColumn("first_cents", first(col("close_cents")).over(w))
      .select(
        col("ticker"), col("trade_date"),
        Num.dollars(col("close_cents")).as("close_price"),
        (d(col("close_cents")) / d(col("first_cents")) * 100.0).as("indexed_price"))
  }

  /** `period_compare` (pages/3_Oura_Wellness.py:16-55): current-vs-prior
    * period averages + pct change per metric group.
    */
  def periodCompare(events: DataFrame): DataFrame = {
    val v = Num.cents(col("value"))
    val inCur = col("ts") >= to_timestamp(lit("2024-01-16 00:00:00"))
    val inPrior = col("ts") < to_timestamp(lit("2024-01-16 00:00:00"))
    val g = events
      .groupBy(col("event_type"))
      .agg(
        sum(when(inCur, v)).as("cur_cents"),
        count(when(inCur, lit(1))).as("cur_n"),
        sum(when(inPrior, v)).as("prior_cents"),
        count(when(inPrior, lit(1))).as("prior_n"))
    g.select(
      col("event_type"),
      (d(col("cur_cents")) / d(col("cur_n")) / 100.0).as("current_avg"),
      (d(col("prior_cents")) / d(col("prior_n")) / 100.0).as("prior_avg"),
      ((d(col("cur_cents")) / d(col("cur_n")) - d(col("prior_cents")) / d(col("prior_n")))
        / safeDen(d(col("prior_cents")) / d(col("prior_n"))) * 100.0).as("pct_change"))
  }

  /** `autocorr` (pages/Oura_Investigation.py:309-335): lag-1..3
    * autocorrelation of the daily interest series per keyword, via the
    * closed-form Pearson r over exact integer pair-moments.
    */
  def autocorr(trends: DataFrame): DataFrame = {
    val byKw = Window.partitionBy("keyword").orderBy("date")
    // single pass: all three lags in one window projection, all 18 moments in
    // one aggregation (2 shuffles instead of 6 — union of selects is narrow)
    val lagged = (1 to 3).foldLeft(trends) { (df, k) =>
      df.withColumn(s"b$k", lag(col("interest"), k).over(byKw))
    }
    val moments = (1 to 3).flatMap { k =>
      val b = col(s"b$k")
      Seq(
        count(b).as(s"n_$k"),
        sum(when(b.isNotNull, col("interest"))).as(s"sa_$k"),
        sum(b).as(s"sb_$k"),
        sum(col("interest") * b).as(s"sab_$k"),
        sum(when(b.isNotNull, col("interest") * col("interest"))).as(s"saa_$k"),
        sum(b * b).as(s"sbb_$k"))
    }
    val g = lagged.groupBy(col("keyword")).agg(moments.head, moments.tail: _*)
    def rowFor(k: Int) = g
      .where(col(s"n_$k") > 0)
      .select(
        col("keyword"), lit(k.toLong).as("lag_k"),
        ((d(col(s"n_$k")) * d(col(s"sab_$k")) - d(col(s"sa_$k")) * d(col(s"sb_$k"))) /
          safeDen(sqrt(d(col(s"n_$k")) * d(col(s"saa_$k")) - d(col(s"sa_$k")) * d(col(s"sa_$k"))) *
            sqrt(d(col(s"n_$k")) * d(col(s"sbb_$k")) - d(col(s"sb_$k")) * d(col(s"sb_$k")))))
          .as("autocorr"))
    rowFor(1).unionByName(rowFor(2)).unionByName(rowFor(3))
  }

  /** `stats_tests` (pages/Oura_Investigation.py:91-93,220-221,255-259):
    * linregress (slope/intercept/r) of interest vs day index + Welch t-stat of
    * weekend-vs-weekday values — closed forms over exact moments.
    */
  def statsTests(trends: DataFrame): DataFrame = {
    val x = datediff(col("date"), to_date(lit("2024-01-01"))).cast("long")
    val g = trends
      .withColumn("x", x)
      .withColumn("is_weekend", weekday(col("date")) >= 5)
      .groupBy(col("keyword"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("interest")).as("sy"),
        sum(col("x") * col("interest")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("interest") * col("interest")).as("syy"),
        // weekend vs weekday moment split for Welch t
        count(when(col("is_weekend"), lit(1))).as("n1"),
        sum(when(col("is_weekend"), col("interest"))).as("s1"),
        Num.sumSq(when(col("is_weekend"), col("interest"))).as("q1"),
        count(when(!col("is_weekend"), lit(1))).as("n2"),
        sum(when(!col("is_weekend"), col("interest"))).as("s2"),
        Num.sumSq(when(!col("is_weekend"), col("interest"))).as("q2"))
    val slope = (d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
      safeDen(d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx")))
    val m1 = d(col("s1")) / d(col("n1"))
    val m2 = d(col("s2")) / d(col("n2"))
    val v1 = (d(col("q1")) - d(col("s1")) * d(col("s1")) / d(col("n1"))) / (d(col("n1")) - 1.0)
    val v2 = (d(col("q2")) - d(col("s2")) * d(col("s2")) / d(col("n2"))) / (d(col("n2")) - 1.0)
    g.select(
      col("keyword"), col("n"),
      slope.as("slope"),
      ((d(col("sy")) - slope * d(col("sx"))) / d(col("n"))).as("intercept"),
      ((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
        safeDen(sqrt(d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
          sqrt(d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))))).as("r_value"),
      ((m1 - m2) / safeDen(sqrt(v1 / d(col("n1")) + v2 / d(col("n2"))))).as("weekend_t_stat"))
  }

  /** `ts_gapfill`: zero-filled daily (event_type, day) counts/sums over the
    * full observed date range — the serve-layer "no missing x-axis points"
    * contract every dashboard in the reference implicitly relies on
    * (pandas `.resample('D').sum()` / reindex fills; e.g.
    * pages/Oura_Investigation.py builds daily series before charting).
    *
    * Scale shape: the only corpus-sized work is ONE (type, day) aggregate —
    * the date bounds, the type dim, and the fill join all derive from that
    * dimension-sized counts frame (scope-cached: three consumers, zero
    * corpus re-scans), so the corpus is read exactly once. The spine is a
    * single-row bounds aggregate exploded into the day axis, cross-joined
    * with the type dim; the fill join is spine-vs-counts, both tiny, so
    * Spark broadcasts them.
    */
  def tsGapfill(events: DataFrame): DataFrame = {
    val counts = CacheScope.cached(events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(Num.cents(col("value"))).as("value_cents")))
    // min/max over the aggregated days == min/max over raw dates; computing
    // them here keeps this a one-corpus-scan operator
    val bounds = counts.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    // sequence(date, date) steps 1 day; empty input => NULL bounds => no rows
    val days = bounds.select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val spine = counts.select(col("event_type")).distinct().crossJoin(days)
    spine.join(counts, Seq("event_type", "day"), "left")
      .select(
        col("event_type"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        (d(coalesce(col("value_cents"), lit(0L))) / 100.0).as("value_sum"))
  }

  private val trendsCte = graft.sources.Tables.trendsSql

  val oracles: Map[String, String] = Map(
    "ts_gapfill" ->
      """WITH counts AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |         COUNT(*) AS n_events,
        |         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM counts),
        |days AS (SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
        |         FROM bounds),
        |types AS (SELECT DISTINCT event_type FROM counts)
        |SELECT t.event_type, d.day,
        |       COALESCE(c.n_events, 0) AS n_events,
        |       CAST(COALESCE(c.value_cents, 0) AS DOUBLE) / 100.0 AS value_sum
        |FROM types t CROSS JOIN days d
        |LEFT JOIN counts c ON c.event_type = t.event_type AND c.day = d.day""".stripMargin,
    "pivot_assignee" ->
      """WITH j AS (
        |  SELECT c_mktsegment AS segment, o_orderpriority AS priority,
        |         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |w AS (
        |  SELECT segment,
        |    CAST(SUM(cents) FILTER (WHERE priority = '1-URGENT') AS BIGINT) AS urgent_cents,
        |    CAST(SUM(cents) FILTER (WHERE priority = '2-HIGH') AS BIGINT) AS high_cents,
        |    CAST(SUM(cents) FILTER (WHERE priority = '3-MEDIUM') AS BIGINT) AS medium_cents,
        |    CAST(SUM(cents) FILTER (WHERE priority = '4-NOT SPECIFIED') AS BIGINT) AS not_specified_cents,
        |    CAST(SUM(cents) FILTER (WHERE priority = '5-LOW') AS BIGINT) AS low_cents
        |  FROM j GROUP BY 1
        |  UNION ALL
        |  SELECT 'All' AS segment,
        |    CAST(SUM(cents) FILTER (WHERE priority = '1-URGENT') AS BIGINT),
        |    CAST(SUM(cents) FILTER (WHERE priority = '2-HIGH') AS BIGINT),
        |    CAST(SUM(cents) FILTER (WHERE priority = '3-MEDIUM') AS BIGINT),
        |    CAST(SUM(cents) FILTER (WHERE priority = '4-NOT SPECIFIED') AS BIGINT),
        |    CAST(SUM(cents) FILTER (WHERE priority = '5-LOW') AS BIGINT)
        |  FROM j)
        |SELECT segment,
        |  CAST(urgent_cents AS DOUBLE) / 100.0 AS urgent,
        |  CAST(high_cents AS DOUBLE) / 100.0 AS high,
        |  CAST(medium_cents AS DOUBLE) / 100.0 AS medium,
        |  CAST(not_specified_cents AS DOUBLE) / 100.0 AS not_specified,
        |  CAST(low_cents AS DOUBLE) / 100.0 AS low,
        |  CAST(COALESCE(urgent_cents, 0) + COALESCE(high_cents, 0) + COALESCE(medium_cents, 0)
        |       + COALESCE(not_specified_cents, 0) + COALESCE(low_cents, 0) AS DOUBLE) / 100.0 AS total
        |FROM w""".stripMargin,
    "melt_scores" ->
      """WITH g AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(ROUND(value * 100) AS BIGINT) END) AS BIGINT) AS purchase_cents,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(ROUND(value * 100) AS BIGINT) END) AS BIGINT) AS click_cents,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(ROUND(value * 100) AS BIGINT) END) AS BIGINT) AS view_cents
        |  FROM events GROUP BY 1)
        |SELECT user_id, metric, CAST(metric_cents AS DOUBLE) / 100.0 AS metric_value FROM (
        |  SELECT user_id, 'purchase' AS metric, purchase_cents AS metric_cents FROM g
        |  UNION ALL SELECT user_id, 'click', click_cents FROM g
        |  UNION ALL SELECT user_id, 'view', view_cents FROM g)""".stripMargin,
    "norm_first" ->
      s"""WITH ${graft.sources.Tables.pricesSql}
         |SELECT ticker, trade_date,
         |  CAST(close_cents AS DOUBLE) / 100.0 AS close_price,
         |  CAST(close_cents AS DOUBLE) /
         |    CAST(FIRST_VALUE(close_cents) OVER (PARTITION BY ticker ORDER BY trade_date
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) * 100.0 AS indexed_price
         |FROM prices""".stripMargin,
    "period_compare" ->
      """WITH g AS (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16 00:00:00' THEN CAST(ROUND(value * 100) AS BIGINT) END) AS BIGINT) AS cur_cents,
        |    COUNT(CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 END) AS cur_n,
        |    CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00' THEN CAST(ROUND(value * 100) AS BIGINT) END) AS BIGINT) AS prior_cents,
        |    COUNT(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00' THEN 1 END) AS prior_n
        |  FROM events GROUP BY 1)
        |SELECT event_type,
        |  CAST(cur_cents AS DOUBLE) / CAST(cur_n AS DOUBLE) / 100.0 AS current_avg,
        |  CAST(prior_cents AS DOUBLE) / CAST(prior_n AS DOUBLE) / 100.0 AS prior_avg,
        |  (CAST(cur_cents AS DOUBLE) / CAST(cur_n AS DOUBLE) - CAST(prior_cents AS DOUBLE) / CAST(prior_n AS DOUBLE))
        |    / NULLIF(CAST(prior_cents AS DOUBLE) / CAST(prior_n AS DOUBLE), 0.0) * 100.0 AS pct_change
        |FROM g""".stripMargin,
    "autocorr" -> {
      def block(k: Int) =
        s"""  SELECT keyword, $k AS lag_k, interest AS a,
           |         LAG(interest, $k) OVER (PARTITION BY keyword ORDER BY date) AS b
           |  FROM trends""".stripMargin
      s"""WITH $trendsCte,
         |lagged AS (
         |${block(1)}
         |  UNION ALL
         |${block(2)}
         |  UNION ALL
         |${block(3)}),
         |m AS (
         |  SELECT keyword, lag_k, COUNT(*) AS n,
         |         CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
         |         CAST(SUM(a * b) AS BIGINT) AS sab,
         |         CAST(SUM(a * a) AS BIGINT) AS saa, CAST(SUM(b * b) AS BIGINT) AS sbb
         |  FROM lagged WHERE b IS NOT NULL GROUP BY 1, 2)
         |SELECT keyword, CAST(lag_k AS BIGINT) AS lag_k,
         |  (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)) /
         |  NULLIF(SQRT(CAST(n AS DOUBLE) * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) *
         |   SQRT(CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)), 0.0) AS autocorr
         |FROM m""".stripMargin
    },
    "stats_tests" ->
      s"""WITH $trendsCte,
         |t AS (
         |  SELECT keyword, interest,
         |         CAST(date_diff('day', DATE '2024-01-01', date) AS BIGINT) AS x,
         |         isodow(date) >= 6 AS is_weekend
         |  FROM trends),
         |g AS (
         |  SELECT keyword, COUNT(*) AS n,
         |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(interest) AS BIGINT) AS sy,
         |         CAST(SUM(x * interest) AS BIGINT) AS sxy,
         |         CAST(SUM(x * x) AS BIGINT) AS sxx,
         |         CAST(SUM(interest * interest) AS BIGINT) AS syy,
         |         COUNT(CASE WHEN is_weekend THEN 1 END) AS n1,
         |         CAST(SUM(CASE WHEN is_weekend THEN interest END) AS BIGINT) AS s1,
         |         SUM(CASE WHEN is_weekend THEN CAST(interest AS DECIMAL(19,0)) * CAST(interest AS DECIMAL(19,0)) END) AS q1,
         |         COUNT(CASE WHEN NOT is_weekend THEN 1 END) AS n2,
         |         CAST(SUM(CASE WHEN NOT is_weekend THEN interest END) AS BIGINT) AS s2,
         |         SUM(CASE WHEN NOT is_weekend THEN CAST(interest * interest AS DECIMAL(38,0)) END) AS q2
         |  FROM t GROUP BY 1)
         |SELECT keyword, n,
         |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
         |    NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0) AS slope,
         |  (CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
         |    NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0)) * CAST(sx AS DOUBLE))
         |    / CAST(n AS DOUBLE) AS intercept,
         |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
         |    NULLIF(SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
         |     SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0.0) AS r_value,
         |  ((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) - (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))) /
         |    NULLIF(SQRT(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE)
         |       + ((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0)) / CAST(n2 AS DOUBLE)), 0.0) AS weekend_t_stat
         |FROM g""".stripMargin
  )
}
