package graft

import graft.sources.Tables.{pricesSql, trendsSql}

/** DuckDB oracle SQL, one entry per SparkEntry.queries key. Each statement is
  * value-identical (not just semantically equal) to the Spark query: exact
  * integer aggregation + fixed-order final double casts (see
  * graft.functions.Num) and identical output column names/aliases.
  */
object Oracles {

  private val stockWindowCte: String =
    s"""WITH $pricesSql,
       |w AS (
       |  SELECT ticker, trade_date, close_cents, volume,
       |         LAG(close_cents) OVER (PARTITION BY ticker ORDER BY trade_date) AS prev_close_cents,
       |         SUM(close_cents) OVER w7 AS ma7_sum, COUNT(*) OVER w7 AS n7,
       |         SUM(close_cents) OVER w30 AS ma30_sum, COUNT(*) OVER w30 AS n30,
       |         MAX(close_cents) OVER w252 AS high52_cents,
       |         MIN(close_cents) OVER w252 AS low52_cents,
       |         SUM(volume) OVER w7 AS vol7_sum,
       |         ROW_NUMBER() OVER (PARTITION BY ticker ORDER BY trade_date DESC) AS recency_rank
       |  FROM prices
       |  WINDOW
       |    w7 AS (PARTITION BY ticker ORDER BY trade_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
       |    w30 AS (PARTITION BY ticker ORDER BY trade_date ROWS BETWEEN 29 PRECEDING AND CURRENT ROW),
       |    w252 AS (PARTITION BY ticker ORDER BY trade_date ROWS BETWEEN 251 PRECEDING AND CURRENT ROW)
       |)""".stripMargin

  private lazy val winCusumSql: String =
      """WITH base AS (
        |  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |         CAST(ROUND(value * 100) AS BIGINT) AS v
        |  FROM events),
        |mu AS (
        |  SELECT event_type, COUNT(*) AS n_events,
        |         CAST(SUM(v) // COUNT(*) AS BIGINT) AS mu_cents
        |  FROM base GROUP BY 1),
        |scored AS (
        |  SELECT b.event_type, m.n_events, m.mu_cents,
        |         CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
        |         SUM(b.v - m.mu_cents) OVER
        |           (w ROWS UNBOUNDED PRECEDING) AS c
        |  FROM base b JOIN mu m USING (event_type)
        |  WINDOW w AS (PARTITION BY b.event_type ORDER BY b.ts, b.event_id)),
        |s2 AS (
        |  SELECT *,
        |         c - LEAST(0, MIN(c) OVER
        |           (w ROWS UNBOUNDED PRECEDING)) AS s_up,
        |         GREATEST(0, MAX(c) OVER
        |           (w ROWS UNBOUNDED PRECEDING)) - c AS s_dn
        |  FROM scored
        |  WINDOW w AS (PARTITION BY event_type ORDER BY rn)),
        |peaks AS (
        |  SELECT event_type, MAX(s_up) AS max_cusum_up,
        |         MAX(s_dn) AS max_cusum_down
        |  FROM s2 GROUP BY 1)
        |SELECT s.event_type,
        |       CAST(MIN(s.n_events) AS BIGINT) AS n_events,
        |       CAST(MIN(s.mu_cents) AS BIGINT) AS mu_cents,
        |       CAST(MIN(p.max_cusum_up) AS BIGINT) AS max_cusum_up,
        |       CAST(MIN(CASE WHEN s.s_up = p.max_cusum_up THEN s.rn END)
        |            AS BIGINT) AS peak_up_idx,
        |       CAST(MIN(p.max_cusum_down) AS BIGINT) AS max_cusum_down,
        |       CAST(MIN(CASE WHEN s.s_dn = p.max_cusum_down THEN s.rn END)
        |            AS BIGINT) AS peak_down_idx
        |FROM s2 s JOIN peaks p USING (event_type)
        |GROUP BY s.event_type""".stripMargin

  val all: Map[String, String] = Map(
    "fct_stock_prices" ->
      s"""$stockWindowCte
         |SELECT ticker, trade_date,
         |  CAST(close_cents AS DOUBLE) / 100.0 AS close_price,
         |  CAST(prev_close_cents AS DOUBLE) / 100.0 AS prev_close,
         |  CAST(close_cents - prev_close_cents AS DOUBLE) / CAST(NULLIF(prev_close_cents, 0) AS DOUBLE) * 100.0 AS daily_change_pct,
         |  CAST(ma7_sum AS DOUBLE) / CAST(n7 AS DOUBLE) / 100.0 AS ma_7d,
         |  CAST(ma30_sum AS DOUBLE) / CAST(n30 AS DOUBLE) / 100.0 AS ma_30d,
         |  CAST(high52_cents AS DOUBLE) / 100.0 AS high_52w,
         |  CAST(low52_cents AS DOUBLE) / 100.0 AS low_52w,
         |  CAST(close_cents - low52_cents AS DOUBLE) / CAST(NULLIF(high52_cents - low52_cents, 0) AS DOUBLE) * 100.0 AS position_in_52w_range,
         |  volume,
         |  CAST(vol7_sum AS DOUBLE) / CAST(n7 AS DOUBLE) AS avg_volume_7d,
         |  CASE WHEN close_cents * n30 > ma30_sum THEN 'above_30d_ma'
         |       WHEN close_cents * n30 < ma30_sum THEN 'below_30d_ma'
         |       ELSE 'at_30d_ma' END AS ma_trend,
         |  CASE WHEN volume * n7 * 2 > vol7_sum * 3 THEN 'high_volume'
         |       WHEN volume * n7 * 2 < vol7_sum THEN 'low_volume'
         |       ELSE 'normal_volume' END AS volume_trend,
         |  recency_rank
         |FROM w""".stripMargin,

    "fct_keyword_trends" ->
      s"""WITH $trendsSql,
         |w AS (
         |  SELECT keyword, date, interest,
         |         LAG(interest, 7) OVER bk AS interest_wow,
         |         LAG(interest, 30) OVER bk AS interest_mom,
         |         SUM(interest) OVER w7 AS sum7, COUNT(*) OVER w7 AS n7,
         |         SUM(interest) OVER w30 AS sum30, COUNT(*) OVER w30 AS n30,
         |         MAX(interest) OVER c7 AS local_max
         |  FROM trends
         |  WINDOW
         |    bk AS (PARTITION BY keyword ORDER BY date),
         |    w7 AS (PARTITION BY keyword ORDER BY date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
         |    w30 AS (PARTITION BY keyword ORDER BY date ROWS BETWEEN 29 PRECEDING AND CURRENT ROW),
         |    c7 AS (PARTITION BY keyword ORDER BY date ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
         |SELECT keyword, date, interest,
         |       interest - interest_wow AS wow_change,
         |       interest - interest_mom AS mom_change,
         |       CAST(sum7 AS DOUBLE) / CAST(n7 AS DOUBLE) AS avg_7d,
         |       CAST(sum30 AS DOUBLE) / CAST(n30 AS DOUBLE) AS avg_30d,
         |       interest >= local_max AS is_local_peak
         |FROM w""".stripMargin,

    "win_lag1" ->
      s"""WITH $pricesSql
         |SELECT ticker, trade_date,
         |  CAST(close_cents AS DOUBLE) / 100.0 AS close_price,
         |  CAST(LAG(close_cents) OVER (PARTITION BY ticker ORDER BY trade_date) AS DOUBLE) / 100.0 AS prev_close,
         |  CAST(close_cents - LAG(close_cents) OVER (PARTITION BY ticker ORDER BY trade_date) AS DOUBLE) / 100.0 AS day_change
         |FROM prices""".stripMargin,

    "win_twap" ->
      s"""WITH $pricesSql,
         |l AS (
         |  SELECT ticker, close_cents, volume,
         |         CAST(date_diff('day', trade_date,
         |           LEAD(trade_date) OVER (PARTITION BY ticker ORDER BY trade_date)) AS BIGINT) AS dt
         |  FROM prices)
         |SELECT ticker, COUNT(*) AS n_obs,
         |       -- products summed as DECIMAL(38,0) to mirror the Spark
         |       -- side's overflow guard (DuckDB would promote to HUGEINT;
         |       -- the decimal keeps the two engines' lattices aligned)
         |       CAST(SUM(CAST(close_cents * dt AS DECIMAL(38,0))) AS DOUBLE)
         |         / CAST(SUM(dt) AS DOUBLE) / 100.0 AS twap,
         |       CAST(SUM(CAST(close_cents * volume AS DECIMAL(38,0))) AS DOUBLE)
         |         / CAST(SUM(volume) AS DOUBLE) / 100.0 AS vwap
         |FROM l GROUP BY 1""".stripMargin,

    "win_drawdown" ->
      s"""WITH $pricesSql,
         |w AS (
         |  SELECT ticker, close_cents,
         |         MAX(close_cents) OVER (PARTITION BY ticker ORDER BY trade_date
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak_cents
         |  FROM prices),
         |d AS (
         |  SELECT ticker, close_cents, peak_cents,
         |         (peak_cents - close_cents) * 1000000 // peak_cents AS dd_ppm
         |  FROM w)
         |SELECT ticker, COUNT(*) AS n_obs,
         |       MAX(close_cents) AS peak_close_cents,
         |       CAST(MAX(dd_ppm) AS BIGINT) AS max_drawdown_ppm,
         |       CAST(MAX(dd_ppm) AS DOUBLE) / 10000.0 AS max_drawdown_pct
         |FROM d GROUP BY 1""".stripMargin,

    "agg_ohlc_weekly" ->
      s"""WITH $pricesSql
         |SELECT ticker, CAST(date_trunc('week', trade_date) AS DATE) AS week,
         |       arg_min(close_cents, trade_date) AS open_cents,
         |       MAX(high_cents) AS high_cents,
         |       MIN(low_cents) AS low_cents,
         |       arg_max(close_cents, trade_date) AS close_cents,
         |       CAST(SUM(volume) AS BIGINT) AS volume,
         |       COUNT(*) AS n_days
         |FROM prices GROUP BY 1, 2""".stripMargin,

    "win_rsi" ->
      s"""WITH $pricesSql,
         |g AS (
         |  -- CASE keeps the first row's undefined delta NULL (GREATEST
         |  -- would swallow it to 0 and count a phantom warmup period)
         |  SELECT ticker, trade_date, close_cents,
         |         CASE WHEN LAG(close_cents) OVER w IS NULL THEN NULL
         |              ELSE GREATEST(close_cents - LAG(close_cents) OVER w, 0) END AS gain,
         |         CASE WHEN LAG(close_cents) OVER w IS NULL THEN NULL
         |              ELSE GREATEST(LAG(close_cents) OVER w - close_cents, 0) END AS loss
         |  FROM prices
         |  WINDOW w AS (PARTITION BY ticker ORDER BY trade_date)),
         |r AS (
         |  SELECT ticker, trade_date, close_cents,
         |         COUNT(gain) OVER f AS n_periods,
         |         CAST(SUM(gain) OVER f AS BIGINT) AS sum_gain,
         |         CAST(SUM(loss) OVER f AS BIGINT) AS sum_loss
         |  FROM g
         |  WINDOW f AS (PARTITION BY ticker ORDER BY trade_date
         |               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
         |SELECT ticker, trade_date,
         |       CAST(close_cents AS DOUBLE) / 100.0 AS close_price,
         |       CASE WHEN n_periods < 14 THEN NULL
         |            WHEN sum_loss = 0 THEN 100.0
         |            ELSE 100.0 - 100.0 /
         |              (1.0 + CAST(sum_gain AS DOUBLE) / CAST(sum_loss AS DOUBLE))
         |       END AS rsi_14
         |FROM r""".stripMargin,

    "win_volatility" ->
      s"""WITH $pricesSql,
         |rets AS (
         |  -- Spark's `div` truncates toward zero; DuckDB's // floors.
         |  -- Negative returns would differ by one ppm, so truncation is
         |  -- spelled out via the sign split (prev close is always > 0).
         |  SELECT ticker,
         |         CASE WHEN close_cents >= LAG(close_cents) OVER w
         |              THEN (close_cents - LAG(close_cents) OVER w) * 1000000
         |                     // LAG(close_cents) OVER w
         |              ELSE -((LAG(close_cents) OVER w - close_cents) * 1000000
         |                     // LAG(close_cents) OVER w)
         |         END AS ret_ppm
         |  FROM prices
         |  WINDOW w AS (PARTITION BY ticker ORDER BY trade_date)),
         |m AS (
         |  SELECT ticker, COUNT(*) AS n_rets,
         |         SUM(ret_ppm) AS s, SUM(ret_ppm * ret_ppm) AS sq
         |  FROM rets WHERE ret_ppm IS NOT NULL GROUP BY 1)
         |SELECT ticker, n_rets,
         |       -- n_rets = 1 guard mirrors the Spark side: 0/0 is NaN in
         |       -- Spark doubles but NULL here — define the degenerate
         |       -- two-row ticker as NULL in both engines
         |       CASE WHEN n_rets > 1 THEN
         |         SQRT((CAST(n_rets AS DOUBLE) * CAST(sq AS DOUBLE)
         |                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
         |              / (CAST(n_rets AS DOUBLE) * (CAST(n_rets AS DOUBLE) - 1.0)))
         |           / 10000.0
         |       END AS daily_vol_pct
         |FROM m""".stripMargin,

    "win_lag_n" ->
      s"""WITH $trendsSql,
         |w AS (
         |  SELECT keyword, date, interest,
         |         LAG(interest, 7) OVER (PARTITION BY keyword ORDER BY date) AS interest_7d_ago,
         |         LAG(interest, 30) OVER (PARTITION BY keyword ORDER BY date) AS interest_30d_ago
         |  FROM trends)
         |SELECT keyword, date, interest, interest_7d_ago, interest_30d_ago,
         |       interest - interest_7d_ago AS wow_change,
         |       CAST(interest - interest_7d_ago AS DOUBLE) / CAST(NULLIF(interest_7d_ago, 0) AS DOUBLE) * 100.0 AS wow_change_pct,
         |       interest - interest_30d_ago AS mom_change
         |FROM w""".stripMargin,

    "win_rolling_avg" ->
      s"""$stockWindowCte
         |SELECT ticker, trade_date,
         |  CAST(close_cents AS DOUBLE) / 100.0 AS close_price,
         |  CAST(ma7_sum AS DOUBLE) / CAST(n7 AS DOUBLE) / 100.0 AS ma_7d,
         |  CAST(ma30_sum AS DOUBLE) / CAST(n30 AS DOUBLE) / 100.0 AS ma_30d
         |FROM w""".stripMargin,

    "win_rolling_extrema" ->
      s"""$stockWindowCte
         |SELECT ticker, trade_date,
         |  CAST(close_cents AS DOUBLE) / 100.0 AS close_price,
         |  CAST(high52_cents AS DOUBLE) / 100.0 AS high_52w,
         |  CAST(low52_cents AS DOUBLE) / 100.0 AS low_52w,
         |  CAST(close_cents - low52_cents AS DOUBLE) / CAST(NULLIF(high52_cents - low52_cents, 0) AS DOUBLE) * 100.0 AS position_in_52w_range
         |FROM w""".stripMargin,

    "win_recency_rank" ->
      s"""$stockWindowCte
         |SELECT ticker, trade_date,
         |  CAST(close_cents AS DOUBLE) / 100.0 AS close_price,
         |  recency_rank
         |FROM w WHERE recency_rank <= 30""".stripMargin,

    "win_centered" ->
      s"""WITH $trendsSql
         |SELECT keyword, date, interest,
         |       interest >= MAX(interest) OVER (PARTITION BY keyword ORDER BY date ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS is_local_peak
         |FROM trends""".stripMargin,

    "win_dedup" ->
      s"""WITH ranked AS (
         |  SELECT event_id, user_id, event_type, CAST(ts AS DATE) AS event_date, value,
         |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
         |                            ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
         |  FROM events)
         |SELECT event_id, user_id, event_type, event_date, value
         |FROM ranked WHERE rn = 1""".stripMargin,

    // win_topk_custom = the same semantics through the custom TopKPerKey
    // physical operator; both check against the identical ranked-window SQL
    "win_topk_custom" -> topkOracle,
    "win_topk_group" -> topkOracle,

    // rank-based definitions are tie-stable: (rank-1)/(n-1) and cume_dist
    // depend only on the key's position among DISTINCT values, so the
    // engines agree without a tiebreak column; the division is one int/int
    // double op, identical both sides
    "win_percent_rank" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |       l_returnflag, l_quantity,
        |       PERCENT_RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
        |         AS pct_rank,
        |       CUME_DIST() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
        |         AS cume
        |FROM lineitem""".stripMargin,
    // the scalable twin is row-identical BY CONTRACT (two-level parallel
    // prefix scan vs one window pass) — one oracle proves both
    "win_cusum" -> winCusumSql,
    "win_cusum_scalable" -> winCusumSql,


    "win_streak" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |r AS (
        |  SELECT user_id, day,
        |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
        |  FROM days),
        |runs AS (
        |  SELECT user_id, day - CAST(rn AS INT) AS anchor, COUNT(*) AS streak_days,
        |         MIN(day) AS streak_start, MAX(day) AS streak_end
        |  FROM r GROUP BY user_id, day - CAST(rn AS INT)),
        |best AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |           ORDER BY streak_days DESC, streak_start) AS brn
        |  FROM runs)
        |SELECT user_id, streak_days, streak_start, streak_end
        |FROM best WHERE brn = 1""".stripMargin,
    "win_ratio_to_report" ->
      """WITH p AS (
        |  SELECT o_custkey AS customer_id, o_orderpriority AS priority,
        |         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1, 2)
        |SELECT customer_id, priority,
        |       CAST(cents AS DOUBLE) / 100.0 AS revenue,
        |       CAST(cents AS DOUBLE) /
        |         CAST(NULLIF(SUM(cents) OVER (PARTITION BY customer_id), 0) AS DOUBLE)
        |         AS share_of_customer
        |FROM p""".stripMargin
  )

  private lazy val topkOracle: String =
      s"""WITH per_part AS (
         |  SELECT l_suppkey AS supp, l_partkey AS part,
         |         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS revenue_cents
         |  FROM lineitem GROUP BY 1, 2),
         |ranked AS (
         |  SELECT supp, part, revenue_cents,
         |         ROW_NUMBER() OVER (PARTITION BY supp ORDER BY revenue_cents DESC, part) AS part_rank
         |  FROM per_part)
         |SELECT supp, part, CAST(revenue_cents AS DOUBLE) / 100.0 AS revenue, part_rank
         |FROM ranked WHERE part_rank <= 5""".stripMargin
}
