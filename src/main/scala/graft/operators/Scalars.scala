package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar string/date/time operators (SURVEY.md §2.8). All expressions are
  * codegen'd built-ins — no UDFs — so they stay inside whole-stage codegen.
  */
object Scalars {

  /** `scan_derived_cols` (sources/hacker_news.py:66-76): scan-time derived
    * columns — regexp_extract with a capture group + Monday-based week trunc.
    */
  def scanDerivedCols(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      regexp_extract(col("props"), "\"k\": (\\d+)", 1).as("k_str"),
      regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("k_value"),
      to_date(date_trunc("week", col("ts"))).as("event_week"))

  /** `scan_pushdown_param` (sources/hacker_news.py:61-94): parameterized
    * date-range scan with projection + ordering; Catalyst pushes the range
    * predicate into the parquet scan (verify via explain: PushedFilters).
    */
  def scanPushdownParam(lineitem: DataFrame): DataFrame =
    lineitem
      .where(col("l_shipdate") >= to_timestamp(lit("2000-06-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("2000-09-01 00:00:00")))
      .select(col("l_orderkey").as("order_id"), col("l_linenumber").cast("long").as("line_no"),
        col("l_shipdate").as("ship_date"), col("l_returnflag").as("return_flag"))

  /** date/time function family (stg/fct models; SURVEY §2.8 date table):
    * date_trunc month/week, extract year/month, to_date, datediff vs a fixed
    * as-of, and NULL-skipping least().
    */
  def fnDatetime(orders: DataFrame): DataFrame =
    orders
      .withColumn("maybe_early",
        when(col("o_orderstatus") === "O", null)
          .otherwise(to_date(col("o_orderdate"))))
      .select(
        col("o_orderkey").as("order_id"),
        to_date(col("o_orderdate")).as("order_date"),
        to_date(date_trunc("month", col("o_orderdate"))).as("order_month"),
        to_date(date_trunc("week", col("o_orderdate"))).as("order_week"),
        year(col("o_orderdate")).cast("long").as("order_year"),
        month(col("o_orderdate")).cast("long").as("order_month_num"),
        datediff(to_date(lit("2001-12-31")), to_date(col("o_orderdate")))
          .cast("long").as("days_before_cutoff"),
        least(col("maybe_early"), to_date(lit("1997-01-01"))).as("earliest_date"))

  /** `fn_timestamp_diff_hour` (fct_pull_requests.sql:74-84): BQ
    * timestamp_diff(a,b,HOUR) — truncation toward zero, negatives included.
    * Spark `div` truncates toward zero (Java long division); the oracle
    * emulates that on DuckDB's floor-based `//` with a sign split.
    */
  def fnTimestampDiffHour(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("micros_since_prev", unix_micros(col("ts")) - unix_micros(col("prev_ts")))
      .withColumn("micros_back", unix_micros(col("prev_ts")) - unix_micros(col("ts")))
      .select(
        col("event_id"), col("user_id"),
        expr("micros_since_prev div 3600000000").as("hours_since_prev"),
        expr("micros_back div 3600000000").as("hours_back"))
  }

  /** String function family (SURVEY §2.8 string table): lower/upper/trim,
    * concat with `||` semantics, regexp_contains/extract/replace together.
    */
  def fnString(customer: DataFrame): DataFrame =
    customer.select(
      col("c_custkey").as("customer_id"),
      lower(col("c_name")).as("name_lower"),
      upper(col("c_mktsegment")).as("segment_upper"),
      trim(concat(lit("  "), col("c_name"), lit("  "))).as("name_trimmed"),
      concat(lit("cust_"), col("c_custkey"), lit("@"), lower(col("c_mktsegment")))
        .as("synthetic_email"),
      col("c_name").rlike("[0-9]{3}").as("has_triple_digit"),
      regexp_extract(col("c_name"), "#(\\d+)", 1).as("name_number"),
      regexp_replace(col("c_name"), "[0-9]", "#").as("name_masked"))

  val oracles: Map[String, String] = Map(
    "fn_string" ->
      """SELECT c_custkey AS customer_id,
        |       lower(c_name) AS name_lower,
        |       upper(c_mktsegment) AS segment_upper,
        |       trim('  ' || c_name || '  ') AS name_trimmed,
        |       'cust_' || c_custkey || '@' || lower(c_mktsegment) AS synthetic_email,
        |       regexp_matches(c_name, '[0-9]{3}') AS has_triple_digit,
        |       regexp_extract(c_name, '#(\d+)', 1) AS name_number,
        |       regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked
        |FROM customer""".stripMargin,
    "scan_derived_cols" ->
      """SELECT event_id,
        |       regexp_extract(props, '"k": (\d+)', 1) AS k_str,
        |       CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k_value,
        |       CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS event_week
        |FROM events""".stripMargin,
    "scan_pushdown_param" ->
      """SELECT l_orderkey AS order_id, CAST(l_linenumber AS BIGINT) AS line_no,
        |       l_shipdate AS ship_date, l_returnflag AS return_flag
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-06-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '2000-09-01 00:00:00'""".stripMargin,
    "fn_datetime" ->
      """SELECT o_orderkey AS order_id,
        |       CAST(o_orderdate AS DATE) AS order_date,
        |       CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
        |       CAST(date_trunc('week', o_orderdate) AS DATE) AS order_week,
        |       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
        |       CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS order_month_num,
        |       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2001-12-31') AS BIGINT) AS days_before_cutoff,
        |       LEAST(CASE WHEN o_orderstatus = 'O' THEN NULL ELSE CAST(o_orderdate AS DATE) END,
        |             DATE '1997-01-01') AS earliest_date
        |FROM orders""".stripMargin,
    "fn_timestamp_diff_hour" ->
      """WITH w AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts_us,
        |         LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_ts
        |  FROM events),
        |d AS (
        |  SELECT event_id, user_id,
        |         epoch_us(ts_us) - epoch_us(prev_ts) AS m_fwd,
        |         epoch_us(prev_ts) - epoch_us(ts_us) AS m_back
        |  FROM w)
        |SELECT event_id, user_id,
        |       CASE WHEN m_fwd >= 0 THEN m_fwd // 3600000000
        |            ELSE -((-m_fwd) // 3600000000) END AS hours_since_prev,
        |       CASE WHEN m_back >= 0 THEN m_back // 3600000000
        |            ELSE -((-m_back) // 3600000000) END AS hours_back
        |FROM d""".stripMargin
  )
}
