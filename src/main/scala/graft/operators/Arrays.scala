package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Array / struct / lateral operators (SURVEY.md §2.8 array table). Arrays are
  * transient (built, filtered, exploded inside a query) exactly as in the
  * reference; outputs surface as scalars (joined strings, counts, exploded
  * rows) so the oracle compare is representation-stable.
  */
object Arrays {

  /** Flag family on part names (mirrors the symptom-flag battery of
    * int_fda__food_event_reactions.sql:35-79, scaled to the testdata corpus).
    */
  private def flags(df: DataFrame): DataFrame = {
    val n = lower(col("p_name"))
    df.withColumn("is_red", n.rlike("red"))
      .withColumn("is_blue", n.rlike("blue"))
      .withColumn("is_green", n.rlike("green"))
      .withColumn("is_widget", n.rlike("widget|gizmo|gadget"))
      .withColumn("is_hardware", n.rlike("bolt|screw|gear"))
      .withColumn("is_small", n.rlike("small|tiny"))
  }

  private def labelArray: Column = filter(
    array(
      when(col("is_red"), "Red"),
      when(col("is_blue"), "Blue"),
      when(col("is_green"), "Green"),
      when(col("is_widget"), "Widget"),
      when(col("is_hardware"), "Hardware"),
      when(col("is_small"), "Small")),
    x => x.isNotNull)

  /** `arr_literal_unnest` (stg_fda__recalls.sql:14-23): inline literal array
    * as a value table.
    */
  def arrLiteralUnnest(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq("AL", "AK", "AZ", "CA", "CO", "CT", "IA", "NY")
      .toDF("state_code")
  }

  /** `struct_arr_lookup` (fct_hn_keyword_trends.sql:8-56): inline struct-array
    * lookup table joined (auto-broadcast) against the fact.
    */
  def structArrLookup(spark: SparkSession, orders: DataFrame): DataFrame = {
    import spark.implicits._
    val lookup = Seq(
      ("1-URGENT", "Urgent", 1L),
      ("2-HIGH", "High", 2L),
      ("3-MEDIUM", "Medium", 3L),
      ("4-NOT SPECIFIED", "Not Specified", 4L),
      ("5-LOW", "Low", 5L)).toDF("code", "label", "rank")
    orders.join(broadcast(lookup), orders("o_orderpriority") === lookup("code"), "left")
      .groupBy(col("label"), col("rank"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** `arr_build_filtered` (int_fda__food_event_reactions.sql:89-135): array of
    * matched labels from boolean flags, NULLs filtered out.
    */
  def arrBuildFiltered(part: DataFrame): DataFrame =
    flags(part)
      .withColumn("labels", labelArray)
      .select(
        col("p_partkey").as("part_id"),
        array_join(col("labels"), ",").as("labels_str"),
        size(col("labels")).cast("long").as("label_count"))

  /** `arr_len_default` (int_fda__food_event_reactions.sql:149-159): empty
    * array → ['Other'] default + has_other flag.
    */
  def arrLenDefault(part: DataFrame): DataFrame =
    flags(part)
      .withColumn("labels", labelArray)
      .withColumn("categories",
        when(size(col("labels")) === 0, array(lit("Other"))).otherwise(col("labels")))
      .select(
        col("p_partkey").as("part_id"),
        array_join(col("categories"), ",").as("categories_str"),
        size(col("categories")).cast("long").as("category_count"),
        array_contains(col("categories"), "Other").as("has_other"))

  /** `arr_explode` + `pd_explode` (fct_fda_events_by_reaction.sql:17-28):
    * correlated lateral explode of the category array, aggregated per label.
    */
  def arrExplode(part: DataFrame): DataFrame =
    flags(part)
      .withColumn("labels", labelArray)
      .withColumn("categories",
        when(size(col("labels")) === 0, array(lit("Other"))).otherwise(col("labels")))
      // outer: exempt from InferFiltersFromGenerate's size>0 filter, which
      // would re-inline the regex flags into the scan; never empty by the
      // 'Other' fallback
      .select(col("p_partkey"), explode_outer(col("categories")).as("category"))
      .groupBy(col("category"))
      .agg(count(lit(1)).as("part_count"))

  /** `arr_bool_rollup` (int_fda__food_event_reactions.sql:137-143): OR-rollups
    * over flag families.
    */
  def arrBoolRollup(part: DataFrame): DataFrame =
    flags(part).select(
      col("p_partkey").as("part_id"),
      (col("is_red") || col("is_blue") || col("is_green")).as("has_color"),
      (col("is_widget") || col("is_hardware")).as("has_product_kind"),
      (col("is_red") || col("is_blue") || col("is_green") ||
        col("is_widget") || col("is_hardware") || col("is_small")).as("has_any_flag"))

  /** `json_flatten` (sources/linear.py:179-198): nested JSON → flat columns
    * with null-safe navigation (from_json on the props payload).
    */
  def jsonFlatten(events: DataFrame): DataFrame =
    events
      .withColumn("parsed", from_json(col("props"), lit("k BIGINT")))
      .select(
        col("event_id"),
        col("parsed.k").as("prop_k"),
        (col("parsed.k") >= 50).as("k_is_high"))

  /** `pd_explode` (pages/1_Linear_Issues.py:113): explode a string-array
    * column (document tokens) and count occurrences.
    */
  def pdExplode(documents: DataFrame): DataFrame =
    documents
      .select(explode(split(col("text"), " ")).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("token_count"))

  val oracles: Map[String, String] = Map(
    "arr_literal_unnest" ->
      """SELECT * FROM (VALUES ('AL'), ('AK'), ('AZ'), ('CA'), ('CO'), ('CT'),
        | ('IA'), ('NY')) AS t(state_code)""".stripMargin,
    "struct_arr_lookup" ->
      """WITH lookup AS (
        |  SELECT * FROM (VALUES
        |    ('1-URGENT', 'Urgent', 1),
        |    ('2-HIGH', 'High', 2),
        |    ('3-MEDIUM', 'Medium', 3),
        |    ('4-NOT SPECIFIED', 'Not Specified', 4),
        |    ('5-LOW', 'Low', 5)) AS t(code, label, rank))
        |SELECT label, CAST(rank AS BIGINT) AS rank, COUNT(*) AS order_count
        |FROM orders LEFT JOIN lookup ON o_orderpriority = code
        |GROUP BY 1, 2""".stripMargin,
    "arr_build_filtered" ->
      """WITH f AS (
        |  SELECT p_partkey AS part_id,
        |         list_filter([
        |           CASE WHEN regexp_matches(LOWER(p_name), 'red') THEN 'Red' END,
        |           CASE WHEN regexp_matches(LOWER(p_name), 'blue') THEN 'Blue' END,
        |           CASE WHEN regexp_matches(LOWER(p_name), 'green') THEN 'Green' END,
        |           CASE WHEN regexp_matches(LOWER(p_name), 'widget|gizmo|gadget') THEN 'Widget' END,
        |           CASE WHEN regexp_matches(LOWER(p_name), 'bolt|screw|gear') THEN 'Hardware' END,
        |           CASE WHEN regexp_matches(LOWER(p_name), 'small|tiny') THEN 'Small' END],
        |           x -> x IS NOT NULL) AS labels
        |  FROM part)
        |SELECT part_id, COALESCE(array_to_string(labels, ','), '') AS labels_str,
        |       CAST(len(labels) AS BIGINT) AS label_count
        |FROM f""".stripMargin,
    "arr_len_default" ->
      """WITH f AS (
        |  SELECT p_partkey AS part_id,
        |         list_filter([
        |           CASE WHEN regexp_matches(LOWER(p_name), 'red') THEN 'Red' END,
        |           CASE WHEN regexp_matches(LOWER(p_name), 'blue') THEN 'Blue' END,
        |           CASE WHEN regexp_matches(LOWER(p_name), 'green') THEN 'Green' END,
        |           CASE WHEN regexp_matches(LOWER(p_name), 'widget|gizmo|gadget') THEN 'Widget' END,
        |           CASE WHEN regexp_matches(LOWER(p_name), 'bolt|screw|gear') THEN 'Hardware' END,
        |           CASE WHEN regexp_matches(LOWER(p_name), 'small|tiny') THEN 'Small' END],
        |           x -> x IS NOT NULL) AS labels
        |  FROM part),
        |d AS (
        |  SELECT part_id,
        |         CASE WHEN len(labels) = 0 THEN ['Other'] ELSE labels END AS categories
        |  FROM f)
        |SELECT part_id, array_to_string(categories, ',') AS categories_str,
        |       CAST(len(categories) AS BIGINT) AS category_count,
        |       list_contains(categories, 'Other') AS has_other
        |FROM d""".stripMargin,
    "arr_explode" ->
      """WITH f AS (
        |  SELECT p_partkey,
        |         list_filter([
        |           CASE WHEN regexp_matches(LOWER(p_name), 'red') THEN 'Red' END,
        |           CASE WHEN regexp_matches(LOWER(p_name), 'blue') THEN 'Blue' END,
        |           CASE WHEN regexp_matches(LOWER(p_name), 'green') THEN 'Green' END,
        |           CASE WHEN regexp_matches(LOWER(p_name), 'widget|gizmo|gadget') THEN 'Widget' END,
        |           CASE WHEN regexp_matches(LOWER(p_name), 'bolt|screw|gear') THEN 'Hardware' END,
        |           CASE WHEN regexp_matches(LOWER(p_name), 'small|tiny') THEN 'Small' END],
        |           x -> x IS NOT NULL) AS labels
        |  FROM part),
        |d AS (
        |  SELECT p_partkey,
        |         UNNEST(CASE WHEN len(labels) = 0 THEN ['Other'] ELSE labels END) AS category
        |  FROM f)
        |SELECT category, COUNT(*) AS part_count FROM d GROUP BY 1""".stripMargin,
    "arr_bool_rollup" ->
      """SELECT p_partkey AS part_id,
        |       regexp_matches(LOWER(p_name), 'red') OR regexp_matches(LOWER(p_name), 'blue')
        |         OR regexp_matches(LOWER(p_name), 'green') AS has_color,
        |       regexp_matches(LOWER(p_name), 'widget|gizmo|gadget')
        |         OR regexp_matches(LOWER(p_name), 'bolt|screw|gear') AS has_product_kind,
        |       regexp_matches(LOWER(p_name), 'red') OR regexp_matches(LOWER(p_name), 'blue')
        |         OR regexp_matches(LOWER(p_name), 'green')
        |         OR regexp_matches(LOWER(p_name), 'widget|gizmo|gadget')
        |         OR regexp_matches(LOWER(p_name), 'bolt|screw|gear')
        |         OR regexp_matches(LOWER(p_name), 'small|tiny') AS has_any_flag
        |FROM part""".stripMargin,
    "json_flatten" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50 AS k_is_high
        |FROM events""".stripMargin,
    "pd_explode" ->
      """WITH tokens AS (
        |  SELECT UNNEST(string_split(text, ' ')) AS token FROM documents)
        |SELECT token, COUNT(*) AS token_count
        |FROM tokens WHERE token != '' GROUP BY 1""".stripMargin
  )
}
