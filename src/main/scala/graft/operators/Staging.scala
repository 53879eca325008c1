package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Num

/** Staging-layer operators (SURVEY.md §2.2): pure projections/renames,
  * NULL-aware filters, CASE mappings/buckets. The testdata has no NULLs, so
  * queries that exercise NULL semantics derive them deterministically first
  * (CASE on a key) — same operator surface, reproducible inputs.
  *
  * Scale: all of these are narrow (no shuffle); filters and projections are
  * pushed into the parquet scan by Catalyst.
  */
object Staging {

  /** `stg_rename` (stg_linear__issues.sql:5-22): pure projection + rename. */
  def stgRename(customer: DataFrame): DataFrame =
    customer.select(
      col("c_custkey").as("customer_id"),
      col("c_name").as("customer_name"),
      col("c_nationkey").cast("long").as("nation_id"),
      col("c_acctbal").as("account_balance"),
      col("c_mktsegment").as("market_segment"))

  /** `stg_unit_convert` (stg_oura__daily_activity.sql:22-26): seconds→minutes
    * (BQ CAST rounds half away from zero) and seconds→hours rounded to 2dp.
    * Both emulated with integer arithmetic: round(n/d) = (2n+d) div 2d for
    * n≥0 — bit-identical across engines, unlike round() on doubles.
    */
  def stgUnitConvert(events: DataFrame): DataFrame = {
    val secs = Num.cents(col("value")) // value*100 as exact integer "seconds"
    events
      .withColumn("duration_seconds", secs)
      .select(
        col("event_id"),
        col("duration_seconds"),
        expr("(duration_seconds * 2 + 60) div 120").as("duration_minutes"),
        (expr("(duration_seconds * 200 + 3600) div 7200").cast("double") / 100.0)
          .as("duration_hours"))
  }

  /** `filter_null_empty` (fct_hn_domain_stats.sql:14-16): x IS NOT NULL AND x != ''. */
  def filterNullEmpty(customer: DataFrame): DataFrame =
    customer
      .withColumn("segment",
        when(col("c_mktsegment") === "MACHINERY", null)
          .when(col("c_mktsegment") === "AUTOMOBILE", "")
          .otherwise(col("c_mktsegment")))
      .where(col("segment").isNotNull && col("segment") =!= "")
      .select(col("c_custkey").as("customer_id"), col("segment"))

  /** `filter_not_true` (sources/hacker_news.py:80-81): BQ `flag IS NOT TRUE` —
    * NULL-safe negation; NULL rows are KEPT (unlike `flag != true`).
    */
  def filterNotTrue(events: DataFrame): DataFrame =
    events
      .withColumn("flagged",
        when(col("value") > 150.0, true)
          .when(col("value") > 100.0, null)
          .otherwise(false))
      .where(!(col("flagged") <=> true))
      .select(col("event_id"), col("user_id"), col("event_type"), col("flagged"))

  /** `filter_in_subquery` (stg_fda__recalls.sql:56-57): key IN (SELECT ...) —
    * planned as a left-semi join; broadcast (tiny build side) at any scale.
    * The membership list names nations that EXIST in the fixture
    * (`NATION_0..24`) so the oracle certifies semi-join behavior on a
    * non-empty build side, not 0=0 vacuity.
    */
  def filterInSubquery(supplier: DataFrame, nation: DataFrame): DataFrame = {
    val wanted = nation
      .where(col("n_name").isin("NATION_3", "NATION_7", "NATION_11", "NATION_19"))
      .select(col("n_nationkey"))
    supplier
      .join(wanted, supplier("s_nationkey") === wanted("n_nationkey"), "left_semi")
      .select(col("s_suppkey").as("supplier_id"), col("s_name").as("supplier_name"),
        col("s_nationkey").cast("long").as("nation_id"))
  }

  /** `filter_sentinel` (stg_fda__recalls.sql:60-62): drop string sentinel garbage. */
  def filterSentinel(part: DataFrame): DataFrame =
    part
      .withColumn("brand",
        when(col("p_size") % 7 === 0, "nan").otherwise(col("p_brand")))
      .where(col("brand") =!= "nan")
      .select(col("p_partkey").as("part_id"), col("brand"), col("p_name").as("part_name"))

  /** `case_map` (stg_fda__food_events.sql:45-73): CASE-WHEN value prettification. */
  def caseMap(orders: DataFrame): DataFrame =
    orders.select(
      col("o_orderkey").as("order_id"),
      when(col("o_orderpriority") === "1-URGENT", "Urgent")
        .when(col("o_orderpriority") === "2-HIGH", "High")
        .when(col("o_orderpriority") === "3-MEDIUM", "Medium")
        .when(col("o_orderpriority") === "4-NOT SPECIFIED", "Not Specified")
        .when(col("o_orderpriority") === "5-LOW", "Low")
        .otherwise("Unknown").as("priority_label"))

  /** `case_ordinal` (stg_fda__recalls.sql:31-36): label → ordinal severity. */
  def caseOrdinal(orders: DataFrame): DataFrame =
    orders.select(
      col("o_orderkey").as("order_id"),
      when(col("o_orderpriority") === "1-URGENT", 1L)
        .when(col("o_orderpriority") === "2-HIGH", 2L)
        .when(col("o_orderpriority") === "3-MEDIUM", 3L)
        .when(col("o_orderpriority") === "4-NOT SPECIFIED", 4L)
        .when(col("o_orderpriority") === "5-LOW", 5L)
        .as("priority_rank"))

  /** `case_bucket` (fct_oura_daily.sql:96-123): threshold buckets on exact cents. */
  def caseBucket(orders: DataFrame): DataFrame = {
    val cents = Num.cents(col("o_totalprice"))
    orders.select(
      col("o_orderkey").as("order_id"),
      Num.dollars(cents).as("total_price"),
      when(cents >= 30000000L, "very_large")
        .when(cents >= 15000000L, "large")
        .when(cents >= 5000000L, "medium")
        .otherwise("small").as("order_size"))
  }

  /** `gender_clean` (fct_fda_events_by_gender.sql:20-27): messy categorical
    * normalization (upper/trim, NULL/empty → Not Reported).
    */
  def genderClean(customer: DataFrame): DataFrame =
    customer
      .withColumn("raw_gender",
        when(col("c_custkey") % 5 === 0, "F")
          .when(col("c_custkey") % 5 === 1, "female")
          .when(col("c_custkey") % 5 === 2, " ")
          .when(col("c_custkey") % 5 === 3, null)
          .otherwise("m"))
      .select(
        col("c_custkey").as("customer_id"),
        when(upper(col("raw_gender")).isin("F", "FEMALE"), "Female")
          .when(upper(col("raw_gender")).isin("M", "MALE"), "Male")
          .when(col("raw_gender").isNull || trim(col("raw_gender")) === "", "Not Reported")
          .otherwise("Other").as("gender"))

  /** `flag_derive` (fct_issues.sql:54-56): boolean derivations incl. the
    * `merged = merged_at IS NOT NULL` pattern on a derived nullable timestamp.
    */
  def flagDerive(orders: DataFrame): DataFrame =
    orders
      .withColumn("closed_at",
        when(col("o_orderstatus") === "O", null).otherwise(col("o_orderdate")))
      .select(
        col("o_orderkey").as("order_id"),
        (col("o_orderstatus") === "F").as("is_fulfilled"),
        col("closed_at").isNotNull.as("is_closed"),
        (Num.cents(col("o_totalprice")) > 20000000L).as("is_high_value"))

  /** `between_ts` (fct_issues.sql:59-64): point-in-time BETWEEN window test
    * (fixed as-of instead of current_timestamp for determinism).
    */
  def betweenTs(orders: DataFrame): DataFrame = {
    val asof = to_timestamp(lit("1998-06-15 00:00:00"))
    orders.select(
      col("o_orderkey").as("order_id"),
      col("o_orderdate").as("starts_at"),
      (col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("ends_at"),
      asof.between(col("o_orderdate"), col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .as("is_active"))
  }

  val oracles: Map[String, String] = Map(
    "stg_rename" ->
      """SELECT c_custkey AS customer_id, c_name AS customer_name,
        |       CAST(c_nationkey AS BIGINT) AS nation_id,
        |       c_acctbal AS account_balance, c_mktsegment AS market_segment
        |FROM customer""".stripMargin,
    "stg_unit_convert" ->
      """SELECT event_id,
        |       CAST(ROUND(value * 100) AS BIGINT) AS duration_seconds,
        |       (CAST(ROUND(value * 100) AS BIGINT) * 2 + 60) // 120 AS duration_minutes,
        |       CAST((CAST(ROUND(value * 100) AS BIGINT) * 200 + 3600) // 7200 AS DOUBLE) / 100.0 AS duration_hours
        |FROM events""".stripMargin,
    "filter_null_empty" ->
      """WITH s AS (
        |  SELECT c_custkey AS customer_id,
        |         CASE WHEN c_mktsegment = 'MACHINERY' THEN NULL
        |              WHEN c_mktsegment = 'AUTOMOBILE' THEN ''
        |              ELSE c_mktsegment END AS segment
        |  FROM customer)
        |SELECT customer_id, segment FROM s
        |WHERE segment IS NOT NULL AND segment != ''""".stripMargin,
    "filter_not_true" ->
      """WITH s AS (
        |  SELECT event_id, user_id, event_type,
        |         CASE WHEN value > 150.0 THEN TRUE
        |              WHEN value > 100.0 THEN NULL
        |              ELSE FALSE END AS flagged
        |  FROM events)
        |SELECT event_id, user_id, event_type, flagged FROM s
        |WHERE NOT COALESCE(flagged, FALSE)""".stripMargin,
    "filter_in_subquery" ->
      """SELECT s_suppkey AS supplier_id, s_name AS supplier_name,
        |       CAST(s_nationkey AS BIGINT) AS nation_id
        |FROM supplier
        |WHERE s_nationkey IN (
        |  SELECT n_nationkey FROM nation
        |  WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11', 'NATION_19'))""".stripMargin,
    "filter_sentinel" ->
      """WITH s AS (
        |  SELECT p_partkey AS part_id,
        |         CASE WHEN p_size % 7 = 0 THEN 'nan' ELSE p_brand END AS brand,
        |         p_name AS part_name
        |  FROM part)
        |SELECT part_id, brand, part_name FROM s WHERE brand != 'nan'""".stripMargin,
    "case_map" ->
      """SELECT o_orderkey AS order_id,
        |       CASE o_orderpriority
        |         WHEN '1-URGENT' THEN 'Urgent'
        |         WHEN '2-HIGH' THEN 'High'
        |         WHEN '3-MEDIUM' THEN 'Medium'
        |         WHEN '4-NOT SPECIFIED' THEN 'Not Specified'
        |         WHEN '5-LOW' THEN 'Low'
        |         ELSE 'Unknown' END AS priority_label
        |FROM orders""".stripMargin,
    "case_ordinal" ->
      """SELECT o_orderkey AS order_id,
        |       CAST(CASE o_orderpriority
        |         WHEN '1-URGENT' THEN 1
        |         WHEN '2-HIGH' THEN 2
        |         WHEN '3-MEDIUM' THEN 3
        |         WHEN '4-NOT SPECIFIED' THEN 4
        |         WHEN '5-LOW' THEN 5
        |         END AS BIGINT) AS priority_rank
        |FROM orders""".stripMargin,
    "case_bucket" ->
      """SELECT o_orderkey AS order_id,
        |       CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE) / 100.0 AS total_price,
        |       CASE WHEN CAST(ROUND(o_totalprice * 100) AS BIGINT) >= 30000000 THEN 'very_large'
        |            WHEN CAST(ROUND(o_totalprice * 100) AS BIGINT) >= 15000000 THEN 'large'
        |            WHEN CAST(ROUND(o_totalprice * 100) AS BIGINT) >= 5000000 THEN 'medium'
        |            ELSE 'small' END AS order_size
        |FROM orders""".stripMargin,
    "gender_clean" ->
      """WITH s AS (
        |  SELECT c_custkey AS customer_id,
        |         CASE WHEN c_custkey % 5 = 0 THEN 'F'
        |              WHEN c_custkey % 5 = 1 THEN 'female'
        |              WHEN c_custkey % 5 = 2 THEN ' '
        |              WHEN c_custkey % 5 = 3 THEN NULL
        |              ELSE 'm' END AS raw_gender
        |  FROM customer)
        |SELECT customer_id,
        |       CASE WHEN UPPER(raw_gender) IN ('F', 'FEMALE') THEN 'Female'
        |            WHEN UPPER(raw_gender) IN ('M', 'MALE') THEN 'Male'
        |            WHEN raw_gender IS NULL OR TRIM(raw_gender) = '' THEN 'Not Reported'
        |            ELSE 'Other' END AS gender
        |FROM s""".stripMargin,
    "flag_derive" ->
      """SELECT o_orderkey AS order_id,
        |       o_orderstatus = 'F' AS is_fulfilled,
        |       (CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderdate END) IS NOT NULL AS is_closed,
        |       CAST(ROUND(o_totalprice * 100) AS BIGINT) > 20000000 AS is_high_value
        |FROM orders""".stripMargin,
    "between_ts" ->
      """SELECT o_orderkey AS order_id,
        |       o_orderdate AS starts_at,
        |       o_orderdate + INTERVAL 90 DAY AS ends_at,
        |       TIMESTAMP '1998-06-15 00:00:00'
        |         BETWEEN o_orderdate AND o_orderdate + INTERVAL 90 DAY AS is_active
        |FROM orders""".stripMargin
  )
}
