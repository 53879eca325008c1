package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.functions.Num

/** Window-analytic operators (SURVEY.md §2.5). All frames are ROWS-based —
  * the reference uses trading-day semantics where calendar gaps are
  * intentional (fct_stock_prices.sql:36-64).
  *
  * Scale: each operator windows over `partitionBy(key)` where `key` is the
  * same key its input was aggregated on, so Catalyst reuses the existing
  * hash-partitioning — one shuffle total. Per-partition state is a bounded
  * frame (≤252 rows), safe at any scale factor. Skew: tickers/keywords are
  * uniformly distributed in the testdata; at 100 TB a hot key would need
  * salting only for unbounded frames, which none of these use.
  */
object Windows {

  private val byTicker = Window.partitionBy("ticker").orderBy("trade_date")
  private val byTickerDesc = Window.partitionBy("ticker").orderBy(col("trade_date").desc)
  private val w7 = byTicker.rowsBetween(-6, 0)
  private val w30 = byTicker.rowsBetween(-29, 0)
  private val w252 = byTicker.rowsBetween(-251, 0)

  /** Flagship mart: fct_stock_prices semantics (reference
    * dbt/models/marts/stocks/fct_stock_prices.sql) on the prices adapter —
    * lag-1 prev close, 7/30-row moving averages, 252-row (52-week) extrema,
    * recency rank, derived pct-change and trend buckets.
    */
  def fctStockPrices(prices: DataFrame): DataFrame = {
    val withWins = prices
      .withColumn("prev_close_cents", lag(col("close_cents"), 1).over(byTicker))
      .withColumn("ma7_sum", sum(col("close_cents")).over(w7))
      .withColumn("n7", count(lit(1)).over(w7))
      .withColumn("ma30_sum", sum(col("close_cents")).over(w30))
      .withColumn("n30", count(lit(1)).over(w30))
      .withColumn("high52_cents", max(col("close_cents")).over(w252))
      .withColumn("low52_cents", min(col("close_cents")).over(w252))
      .withColumn("vol7_sum", sum(col("volume")).over(w7))
      .withColumn("recency_rank", row_number().over(byTickerDesc))

    withWins.select(
      col("ticker"),
      col("trade_date"),
      Num.dollars(col("close_cents")).as("close_price"),
      Num.dollars(col("prev_close_cents")).as("prev_close"),
      // safe_divide semantics (fct_stock_prices.sql:25-28): NULL when no prev
      (((col("close_cents") - col("prev_close_cents")).cast(DoubleType) /
        when(col("prev_close_cents") === 0, null)
          .otherwise(col("prev_close_cents")).cast(DoubleType)) * 100.0)
        .as("daily_change_pct"),
      Num.meanDollars(col("ma7_sum"), col("n7")).as("ma_7d"),
      Num.meanDollars(col("ma30_sum"), col("n30")).as("ma_30d"),
      Num.dollars(col("high52_cents")).as("high_52w"),
      Num.dollars(col("low52_cents")).as("low_52w"),
      // position_in_52w_range (fct_stock_prices.sql:111-115)
      (((col("close_cents") - col("low52_cents")).cast(DoubleType) /
        when(col("high52_cents") === col("low52_cents"), null)
          .otherwise(col("high52_cents") - col("low52_cents")).cast(DoubleType)) * 100.0)
        .as("position_in_52w_range"),
      col("volume"),
      Num.ratio(col("vol7_sum"), col("n7")).as("avg_volume_7d"),
      // ma_trend bucket (fct_stock_prices.sql:117-123) — exact integer compare:
      // close > ma30  ⇔  close_cents * n30 > ma30_sum
      when(col("close_cents") * col("n30") > col("ma30_sum"), "above_30d_ma")
        .when(col("close_cents") * col("n30") < col("ma30_sum"), "below_30d_ma")
        .otherwise("at_30d_ma").as("ma_trend"),
      // volume vs 1.5×/0.5× of 7d avg (fct_stock_prices.sql:125-129):
      // vol > 1.5*avg ⇔ 2*vol*n7 > 3*sum ; vol < 0.5*avg ⇔ 2*vol*n7 < sum
      when(col("volume") * col("n7") * 2 > col("vol7_sum") * 3, "high_volume")
        .when(col("volume") * col("n7") * 2 < col("vol7_sum"), "low_volume")
        .otherwise("normal_volume").as("volume_trend"),
      col("recency_rank").cast("long").as("recency_rank"))
  }

  /** `win_lag1` (fct_stock_prices.sql:30-34): prev_close + day-over-day change. */
  def winLag1(prices: DataFrame): DataFrame =
    prices
      .withColumn("prev_close_cents", lag(col("close_cents"), 1).over(byTicker))
      .select(
        col("ticker"), col("trade_date"),
        Num.dollars(col("close_cents")).as("close_price"),
        Num.dollars(col("prev_close_cents")).as("prev_close"),
        Num.dollars(col("close_cents") - col("prev_close_cents")).as("day_change"))

  /** `win_twap`: time- and volume-weighted average price per ticker — the
    * two canonical fair-price summaries of an irregular daily series. TWAP
    * weights each close by the number of days it was the standing price
    * (lead-date gap; the last observation has no forward interval and
    * drops out of the numerator AND denominator), so gaps in the calendar
    * weight correctly instead of every row counting equally. VWAP weights
    * by traded volume. All weights are exact integer products
    * (cents × days, cents × volume — bounded far below 2^53), one double
    * division each at the end, fixed op order (Num discipline) so both
    * engines agree bit for bit.
    *
    * Plan: one lead() window over a hash(ticker) exchange, then the
    * per-ticker aggregate rides the SAME partitioning — window and groupBy
    * share one exchange (the prices adapter's own (ticker, date) shuffle
    * is upstream and unavoidable for any consumer).
    */
  def winTwap(prices: DataFrame): DataFrame =
    prices
      .withColumn("dt",
        datediff(lead(col("trade_date"), 1).over(byTicker), col("trade_date")).cast("long"))
      .groupBy(col("ticker"))
      .agg(
        count(lit(1)).as("n_obs"),
        // products ride DECIMAL(38,0) like winVolatility's sums: a Long
        // product sum silently wraps at corpus scale (ANSI off) while
        // DuckDB promotes to HUGEINT — the decimal keeps both exact
        (sum((col("close_cents") * col("dt")).cast("decimal(38,0)")).cast(DoubleType) /
          sum(col("dt")).cast(DoubleType) / 100.0).as("twap"),
        (sum((col("close_cents") * col("volume")).cast("decimal(38,0)")).cast(DoubleType) /
          sum(col("volume")).cast(DoubleType) / 100.0).as("vwap"))

  /** `win_drawdown`: maximum drawdown per ticker — the standard risk
    * summary: how far the price fell from its running peak, at the worst
    * point of the series. The running peak is an unbounded-preceding max
    * over the ticker sort; the per-row drawdown is EXACT integer
    * parts-per-million (`(peak − close) · 10⁶ div peak` — integer division,
    * no float in the scan), and only the final pct rendering divides once.
    * Window and aggregate share one hash(ticker) exchange, same shape as
    * [[winTwap]].
    */
  def winDrawdown(prices: DataFrame): DataFrame =
    prices
      .withColumn("peak_cents",
        max(col("close_cents")).over(
          byTicker.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("dd_ppm",
        expr("((peak_cents - close_cents) * 1000000) div peak_cents"))
      .groupBy(col("ticker"))
      .agg(
        count(lit(1)).as("n_obs"),
        max(col("close_cents")).as("peak_close_cents"),
        max(col("dd_ppm")).as("max_drawdown_ppm"),
        (max(col("dd_ppm")).cast(DoubleType) / 10000.0).as("max_drawdown_pct"))

  /** `agg_ohlc_weekly`: daily → weekly OHLC resample — the canonical
    * financial downsample: per (ticker, week) the OPEN is the first close
    * of the week, HIGH/LOW the extrema, CLOSE the last, volume summed.
    * First/last are `min_by`/`max_by` on the date — deterministic because
    * (ticker, trade_date) is unique — which DuckDB mirrors as
    * `arg_min`/`arg_max`; no window pass at all, one hash aggregate with
    * map-side combine, so the resample costs a single shuffle of
    * (ticker, week) partials at any scale.
    */
  def aggOhlcWeekly(prices: DataFrame): DataFrame =
    prices
      .groupBy(col("ticker"),
        to_date(date_trunc("week", col("trade_date"))).as("week"))
      .agg(
        min_by(col("close_cents"), col("trade_date")).as("open_cents"),
        max(col("high_cents")).as("high_cents"),
        min(col("low_cents")).as("low_cents"),
        max_by(col("close_cents"), col("trade_date")).as("close_cents"),
        sum(col("volume")).as("volume"),
        count(lit(1)).as("n_days"))

  /** `win_rsi`: 14-period relative strength index, Cutler's variant —
    * plain rolling averages of gains and losses rather than Wilder's
    * recursive smoothing, BECAUSE the recursion is sequential state a
    * declarative plan can't express and Cutler's is the standard
    * order-n-window equivalent. Gains/losses are exact integer cents
    * (greatest(Δ,0) / greatest(−Δ,0)); the 14-row sums stay integers
    * (the /14 cancels inside RS), so the only float is the final
    * 100 − 100/(1+RS) with its conventional avgLoss=0 → 100 branch.
    * Rows without 14 full periods emit NULL. One ticker-sorted window
    * pass — shares [[winTwap]]'s single exchange shape.
    */
  def winRsi(prices: DataFrame, periods: Int = 14): DataFrame = {
    val delta = col("close_cents") - lag(col("close_cents"), 1).over(byTicker)
    val frame = byTicker.rowsBetween(-(periods - 1), Window.currentRow)
    prices
      // greatest() ignores NULLs in both engines, which would silently turn
      // the first row's undefined delta into a counted zero-gain period —
      // preserve the NULL so warmup really means `periods` FULL deltas
      .withColumn("gain", when(delta.isNotNull, greatest(delta, lit(0L))))
      .withColumn("loss", when(delta.isNotNull, greatest(-delta, lit(0L))))
      .withColumn("n_periods", count(col("gain")).over(frame))
      .withColumn("sum_gain", sum(col("gain")).over(frame))
      .withColumn("sum_loss", sum(col("loss")).over(frame))
      .select(col("ticker"), col("trade_date"),
        Num.dollars(col("close_cents")).as("close_price"),
        when(col("n_periods") < periods, lit(null).cast("double"))
          .when(col("sum_loss") === 0, 100.0)
          .otherwise(lit(100.0) - lit(100.0) /
            (lit(1.0) + col("sum_gain").cast(DoubleType) / col("sum_loss").cast(DoubleType)))
          .as("rsi_14"))
  }

  /** `win_volatility`: per-ticker volatility of daily simple returns —
    * the risk number beside [[winDrawdown]]'s worst case. Returns are
    * EXACT integer parts-per-million (`(close − prev) · 10⁶ div prev`), so
    * the five-moment variance arithmetic is order-independent integer sums
    * (the [[Aggregates.aggCorr]] discipline — no float until one final
    * fixed-order expression; sums ride DECIMAL(38,0) against overflow) and
    * the sample stddev matches the oracle bit for bit. Output in percent.
    */
  def winVolatility(prices: DataFrame): DataFrame = {
    val rets = prices
      .withColumn("ret_ppm", expr(
        s"((close_cents - lag(close_cents, 1) over (partition by ticker order by trade_date))" +
          s" * 1000000) div lag(close_cents, 1) over (partition by ticker order by trade_date)"))
      .where(col("ret_ppm").isNotNull)
    val d = (c: org.apache.spark.sql.Column) => c.cast(DoubleType)
    rets
      .groupBy(col("ticker"))
      .agg(
        count(lit(1)).as("n_rets"),
        sum(col("ret_ppm").cast("decimal(38,0)")).as("s"),
        sum((col("ret_ppm") * col("ret_ppm")).cast("decimal(38,0)")).as("sq"))
      .select(col("ticker"), col("n_rets"),
        // n_rets = 1 (a two-row ticker) makes the denominator 0: Spark
        // doubles give NaN where DuckDB's 0/0 yields NULL — guard the
        // degenerate case to NULL identically in both engines
        when(col("n_rets") > 1,
          sqrt((d(col("n_rets")) * d(col("sq")) - d(col("s")) * d(col("s"))) /
            (d(col("n_rets")) * (d(col("n_rets")) - 1.0))) / 10000.0)
          .as("daily_vol_pct"))
  }

  /** `win_lag_n` (fct_keyword_trends.sql:36-46): 7-row WoW / 30-row MoM offsets. */
  def winLagN(trends: DataFrame): DataFrame = {
    val byKw = Window.partitionBy("keyword").orderBy("date")
    trends
      .withColumn("interest_7d_ago", lag(col("interest"), 7).over(byKw))
      .withColumn("interest_30d_ago", lag(col("interest"), 30).over(byKw))
      .select(
        col("keyword"), col("date"), col("interest"),
        col("interest_7d_ago"), col("interest_30d_ago"),
        (col("interest") - col("interest_7d_ago")).as("wow_change"),
        (Num.ratio(col("interest") - col("interest_7d_ago"), col("interest_7d_ago")) * 100.0)
          .as("wow_change_pct"),
        (col("interest") - col("interest_30d_ago")).as("mom_change"))
  }

  /** `win_rolling_avg` (fct_stock_prices.sql:36-64): 7/30-row trailing means. */
  def winRollingAvg(prices: DataFrame): DataFrame =
    prices
      .withColumn("ma7_sum", sum(col("close_cents")).over(w7))
      .withColumn("n7", count(lit(1)).over(w7))
      .withColumn("ma30_sum", sum(col("close_cents")).over(w30))
      .withColumn("n30", count(lit(1)).over(w30))
      .select(
        col("ticker"), col("trade_date"),
        Num.dollars(col("close_cents")).as("close_price"),
        Num.meanDollars(col("ma7_sum"), col("n7")).as("ma_7d"),
        Num.meanDollars(col("ma30_sum"), col("n30")).as("ma_30d"))

  /** `win_rolling_extrema` (fct_stock_prices.sql:66-78): 252-row hi/lo + range position. */
  def winRollingExtrema(prices: DataFrame): DataFrame =
    prices
      .withColumn("high52_cents", max(col("close_cents")).over(w252))
      .withColumn("low52_cents", min(col("close_cents")).over(w252))
      .select(
        col("ticker"), col("trade_date"),
        Num.dollars(col("close_cents")).as("close_price"),
        Num.dollars(col("high52_cents")).as("high_52w"),
        Num.dollars(col("low52_cents")).as("low_52w"),
        (((col("close_cents") - col("low52_cents")).cast(DoubleType) /
          when(col("high52_cents") === col("low52_cents"), null)
            .otherwise(col("high52_cents") - col("low52_cents")).cast(DoubleType)) * 100.0)
          .as("position_in_52w_range"))

  /** `win_recency_rank` (fct_stock_prices.sql:80-84): latest-first rank, last 30 rows. */
  def winRecencyRank(prices: DataFrame): DataFrame =
    prices
      .withColumn("recency_rank", row_number().over(byTickerDesc))
      .where(col("recency_rank") <= 30)
      .select(
        col("ticker"), col("trade_date"),
        Num.dollars(col("close_cents")).as("close_price"),
        col("recency_rank").cast("long").as("recency_rank"))

  /** `win_centered` (fct_keyword_trends.sql:48-57): centered-frame local peaks. */
  def winCentered(trends: DataFrame): DataFrame = {
    val c7 = Window.partitionBy("keyword").orderBy("date").rowsBetween(-3, 3)
    trends
      .withColumn("local_max", max(col("interest")).over(c7))
      .select(
        col("keyword"), col("date"), col("interest"),
        (col("interest") >= col("local_max")).as("is_local_peak"))
  }

  /** `win_dedup` (stg_hn__comments.sql:6-33): keep-one-per-key by recency
    * with a deterministic tiebreaker. Key = (user_id, event_type).
    */
  /** `win_percent_rank`: relative standing of every row within its group —
    * `percent_rank` ((rank−1)/(n−1)) and `cume_dist`, the two rank-ratio
    * window functions. Tie-stable by definition (both depend only on the
    * key's position among distinct values, not intra-tie row order), so no
    * tiebreak column is needed for engine agreement. Scale: PARTITIONED
    * ranks — each group sorts independently after one hash exchange; a
    * GLOBAL percent_rank would be a single-partition sort (for global
    * standing use the per-group NTILE of `quality_decile_filter` or the
    * exact quartiles of `agg_quantiles` instead).
    */
  def winPercentRank(lineitem: DataFrame): DataFrame = {
    val w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    lineitem.select(
      col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
      col("l_returnflag"), col("l_quantity"),
      percent_rank().over(w).as("pct_rank"),
      cume_dist().over(w).as("cume"))
  }

  /** `win_ratio_to_report`: each row's share of its group total — the
    * serve-layer "% of segment" column every BI page derives. The group sum
    * is an unbounded-frame window over the SAME key the input aggregate
    * grouped on, so it reuses that exchange (no second shuffle); numerator
    * and denominator are exact integer cents and the share is one final
    * exact-rounded division, identical in the oracle.
    */
  def winRatioToReport(orders: DataFrame): DataFrame = {
    val perCust = orders
      .groupBy(col("o_custkey").as("customer_id"), col("o_orderpriority").as("priority"))
      .agg(sum(Num.cents(col("o_totalprice"))).as("cents"))
    val w = Window.partitionBy("customer_id")
    perCust
      .withColumn("total_cents", sum(col("cents")).over(w))
      .select(col("customer_id"), col("priority"),
        Num.dollars(col("cents")).as("revenue"),
        Num.ratio(col("cents"), col("total_cents")).as("share_of_customer"))
  }

  /** `win_streak`: longest consecutive-day activity streak per user — the
    * gaps-and-islands pattern (daily-active streaks, uptime runs, coverage
    * gaps). Consecutive days share an anchor (`day − row_number`), so runs
    * fall out of one keyed aggregate; the longest-run pick is a rank-1
    * filter that RewriteRankLimitToTopK plans through TopKPerKey. Both the
    * run groupBy (user, anchor) and the rank (user) are satisfied by the
    * row_number window's hash(user) clustering — after the distinct, the
    * whole chain runs in ONE exchange.
    */
  def winStreak(events: DataFrame): DataFrame = {
    val days = events.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val runs = days
      .withColumn("rn", row_number().over(w))
      .withColumn("anchor", date_sub(col("day"), col("rn")))
      .groupBy(col("user_id"), col("anchor"))
      .agg(count(lit(1)).as("streak_days"),
        min(col("day")).as("streak_start"), max(col("day")).as("streak_end"))
    val best = Window.partitionBy("user_id")
      .orderBy(col("streak_days").desc, col("streak_start"))
    runs
      .withColumn("brn", row_number().over(best))
      .where(col("brn") === 1)
      .select(col("user_id"), col("streak_days"), col("streak_start"), col("streak_end"))
  }

  /** `win_cusum`: CUSUM change-point detection over each event type's
    * value series — the classic sequential shift detector (Page 1954),
    * re-expressed so the textbook RECURSION S_i = max(0, S_{i-1} + y_i)
    * becomes window algebra: S_up_i = C_i − min_{j≤i} C_j and
    * S_dn_i = max_{j≤i} C_j − C_i where C is the running sum of centered
    * values y = cents(value) − μ (μ = the series' integer mean in cents,
    * truncated toward zero like DuckDB `//`) —
    * cumulative sum plus running extrema, both partitioned windows, no
    * sequential state. The report per event type: the largest upward and
    * downward excursions and the ORDINAL POSITION where each peaks — the
    * change-point location estimate a monitor pages with ("type X's value
    * level shifted around event #N"). Peak positions tie-break to the
    * EARLIEST row via a tiny self-join on the per-type maxima (portable;
    * arg_max's tie order is unspecified in both engines). Exact integers
    * throughout: cents quantization ([[Num.cents]]), truncated mean, long
    * sums (at 10¹⁰⁺-row series a deployment widens C to decimal — the
    * magnitude note every cumsum operator here carries).
    */
  def winCusum(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("ts"), col("event_id"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = events.select(col("event_type"), col("ts"), col("event_id"),
      Num.cents(col("value")).as("v"))
    val mu = base.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // TRUNCATED mean, exactly: DuckDB 1.0.0's `//` truncates toward zero
        // (verified: -400//3 = -133), same as Spark's `div` — so plain `div`
        // is bit-exact with the oracle's SUM(v) // COUNT(*) for EVERY sign of
        // sum(v). (r16 briefly shipped a pmod floor shift here on the wrong
        // belief that `//` floors; ADVICE r16 caught the divergence.)
        expr("sum(v) div count(1)").as("mu_cents"))
    val scored = base.join(broadcast(mu), Seq("event_type"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("c", sum(col("v") - col("mu_cents")).over(cum))
      // the virtual empty prefix C_0 = 0 participates in the extrema
      // (the recursion's max(0, ...) floor), hence the least/greatest
      .withColumn("s_up", col("c") - least(lit(0L), min(col("c")).over(cum)))
      .withColumn("s_dn", greatest(lit(0L), max(col("c")).over(cum)) - col("c"))
    val peaks = scored.groupBy(col("event_type"))
      .agg(max(col("s_up")).as("max_cusum_up"), max(col("s_dn")).as("max_cusum_down"))
    scored.join(broadcast(peaks), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(first(col("n_events")).as("n_events"),
        first(col("mu_cents")).as("mu_cents"),
        first(col("max_cusum_up")).as("max_cusum_up"),
        min(when(col("s_up") === col("max_cusum_up"), col("rn"))).as("peak_up_idx"),
        first(col("max_cusum_down")).as("max_cusum_down"),
        min(when(col("s_dn") === col("max_cusum_down"), col("rn"))).as("peak_down_idx"))
  }

  /** `win_cusum_scalable`: [[winCusum]] re-planned as a two-level parallel
    * prefix scan — the answer to the plain form's one scale ceiling: its
    * per-TYPE windows give parallelism = |event types| (measured at x1000:
    * 206 s wall on 1475 cpu-s — 5 types serialize 32 cores,
    * docs/SCALE.md). The CUSUM quantities are all prefix-decomposable
    * (running sum, running min/max), so the classic parallel-prefix
    * treatment applies: rows are chunked by calendar DAY, the within-chunk
    * windows partition by (type, day) — thousands of parallel partitions —
    * and the cross-chunk carry (per-day sums, row counts, prefix extrema)
    * lives on a MODEL-SIZED per-(type, day) frame whose own windows cost
    * nothing. Global values reassemble as
    * C_i = day_offset + c_within, running_min_i = min(prev-days min,
    * day_offset + within-day running min) — exactly associative-scan
    * algebra. Output contract: row-identical to [[winCusum]] (same oracle
    * SQL, DedupSpec-style equality pinned in OperatorSpec), so a caller
    * chooses by corpus shape: few huge series → this; many small series →
    * the plain form's single window pass is already parallel.
    *
    * Skew (round 16): calendar days are NOT uniform on real event streams —
    * a bursty day (precisely when a monitor wants CUSUM) would drag its
    * within-chunk window back toward the plain form's per-type ceiling. The
    * chunk key is therefore HIERARCHICAL: a (type, day) whose row count
    * exceeds `hourSplitThreshold` splits into per-HOUR sub-chunks (sub = 0
    * otherwise), decided from a model-sized per-(type, day) count that the
    * μ aggregate now re-reduces (one corpus exchange serves both). Hour is
    * monotone in ts within a day, so ordering carry chunks by (day, sub)
    * preserves the global series order and the prefix algebra is unchanged.
    * Residual assumption: no single HOUR dominates the corpus — the next
    * split level (minutes) is the same 3-line pattern if a deployment's
    * burst profile needs it.
    */
  def winCusumScalable(events: DataFrame,
      hourSplitThreshold: Long = 500000L): DataFrame = {
    val base = events.select(col("event_type"), col("ts"), col("event_id"),
      Num.cents(col("value")).as("v"), to_date(col("ts")).as("day"),
      hour(col("ts")).cast("long").as("hh"))
    // ONE corpus exchange on (type, day): μ re-reduces it (floor-consistent
    // mean — see winCusum's mu note), and the split decision reads it
    // directly. ReuseExchange collapses the two consumers onto one scan.
    val dayAgg = base.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_d_rows"), sum(col("v")).as("sum_v_d"))
    val mu = dayAgg.groupBy(col("event_type"))
      .agg(sum(col("n_d_rows")).as("n_events"),
        expr("sum(sum_v_d) div sum(n_d_rows)").as("mu_cents"))
    val splitDays = dayAgg.where(col("n_d_rows") > hourSplitThreshold)
      .select(col("event_type"), col("day"), lit(true).as("hour_split"))
    val chunked = base.join(broadcast(splitDays), Seq("event_type", "day"), "left")
      .withColumn("sub", when(col("hour_split"), col("hh")).otherwise(0L))
    val wd = Window.partitionBy("event_type", "day", "sub")
      .orderBy(col("ts"), col("event_id"))
    val wdCum = wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // staged: BOTH the carry aggregate and the reassembly join read this
    // frame — unstaged, the within-chunk windows replay twice and the
    // reassembly becomes a sort-merge join of two live window pipelines,
    // which exhausted the executor memory pool at x1000
    // (SparkOutOfMemoryError acquiring pages); staged (parquet past the
    // auto threshold) each side is a plain scan
    val within = graft.operators.CacheScope.cached(
      chunked.join(broadcast(mu), Seq("event_type"))
        .withColumn("rn_d", row_number().over(wd).cast("long"))
        .withColumn("c_d", sum(col("v") - col("mu_cents")).over(wdCum))
        .withColumn("runmin_d", min(col("c_d")).over(wdCum))
        .withColumn("runmax_d", max(col("c_d")).over(wdCum)))
    // the cross-chunk carry: per-(type, day, sub) sums and prefix extrema —
    // |types| × |chunks| rows, windowed over chunks within a type
    // (model-sized; (day, sub) order = global ts order, hour monotone in ts)
    val wDay = Window.partitionBy("event_type").orderBy("day", "sub")
    val prev = wDay.rowsBetween(Window.unboundedPreceding, -1)
    val carry = within.groupBy(col("event_type"), col("day"), col("sub"))
      .agg(count(lit(1)).as("n_d"), sum(col("v") - col("mu_cents")).as("sum_d"),
        min(col("c_d")).as("min_d"), max(col("c_d")).as("max_d"))
      .withColumn("day_offset",
        coalesce(sum(col("sum_d")).over(prev), lit(0L)))
      .withColumn("rn_offset",
        coalesce(sum(col("n_d")).over(prev), lit(0L)))
      .withColumn("prev_min",
        min(col("day_offset") + col("min_d")).over(prev))
      .withColumn("prev_max",
        max(col("day_offset") + col("max_d")).over(prev))
      .select(col("event_type"), col("day"), col("sub"), col("day_offset"),
        col("rn_offset"), col("prev_min"), col("prev_max"))
    // also staged: peaks AND the final aggregate both read `scored`
    val scored = graft.operators.CacheScope.cached(
      within.join(broadcast(carry), Seq("event_type", "day", "sub"))
        .withColumn("rn", col("rn_offset") + col("rn_d"))
        .withColumn("c", col("day_offset") + col("c_d"))
        .withColumn("s_up", col("c") - least(lit(0L),
          coalesce(col("prev_min"), lit(Long.MaxValue)),
          col("day_offset") + col("runmin_d")))
        .withColumn("s_dn", greatest(lit(0L),
          coalesce(col("prev_max"), lit(Long.MinValue)),
          col("day_offset") + col("runmax_d")) - col("c"))
        .select(col("event_type"), col("n_events"), col("mu_cents"),
          col("rn"), col("s_up"), col("s_dn")))
    val peaks = scored.groupBy(col("event_type"))
      .agg(max(col("s_up")).as("max_cusum_up"), max(col("s_dn")).as("max_cusum_down"))
    scored.join(broadcast(peaks), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(first(col("n_events")).as("n_events"),
        first(col("mu_cents")).as("mu_cents"),
        first(col("max_cusum_up")).as("max_cusum_up"),
        min(when(col("s_up") === col("max_cusum_up"), col("rn"))).as("peak_up_idx"),
        first(col("max_cusum_down")).as("max_cusum_down"),
        min(when(col("s_dn") === col("max_cusum_down"), col("rn"))).as("peak_down_idx"))
  }

  def winDedup(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts").desc, col("event_id").desc)
    events
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("event_type"),
        to_date(col("ts")).as("event_date"), col("value"))
  }

  /** `win_topk_group` (fct_sales_by_county.sql:35-50): rank over a grouped
    * aggregate, keep top 5 parts per supplier by revenue; partkey tiebreak
    * makes ties deterministic (SURVEY §7.5.5).
    */
  def winTopkGroup(lineitem: DataFrame): DataFrame = {
    val perPart = lineitem
      .groupBy(col("l_suppkey").as("supp"), col("l_partkey").as("part"))
      .agg(sum(Num.cents(col("l_extendedprice"))).as("revenue_cents"))
    val w = Window.partitionBy("supp").orderBy(col("revenue_cents").desc, col("part"))
    perPart
      .withColumn("part_rank", row_number().over(w))
      .where(col("part_rank") <= 5)
      .select(col("supp"), col("part"), Num.dollars(col("revenue_cents")).as("revenue"),
        col("part_rank").cast("long").as("part_rank"))
  }

  /** `win_topk_custom`: the same top-5-parts-per-supplier semantics as
    * [[winTopkGroup]], planned through the custom
    * [[graft.plans.TopKPerKey]] operator (partial bounded-heap pass →
    * k-rows-per-key shuffle → final heap + rank) instead of
    * window/row_number (full shuffle + full per-partition sort). Shares
    * winTopkGroup's oracle verbatim — identical results, different physics.
    */
  def winTopkCustom(lineitem: DataFrame): DataFrame = {
    val perPart = lineitem
      .groupBy(col("l_suppkey").as("supp"), col("l_partkey").as("part"))
      .agg(sum(Num.cents(col("l_extendedprice"))).as("revenue_cents"))
    graft.plans.TopK.topKPerKey(perPart,
        keyCols = Seq("supp"),
        orderBy = Seq(("revenue_cents", true), ("part", false)),
        k = 5, rankName = "part_rank")
      .select(col("supp"), col("part"), Num.dollars(col("revenue_cents")).as("revenue"),
        col("part_rank"))
  }
}
