package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic testdata adapters that put the remaining Models marts
  * (fct_issues, fct_pull_requests, fct_reviewer_activity, fct_oura_daily)
  * on the driver scoreboard: every input the fixture-shaped model functions
  * expect is derived from the TPC-H-ish tables by pure expressions, so each
  * mart has an exact DuckDB oracle. With these, all reference marts are
  * registered, oracle-checked queries.
  */
object ModelAdapters {

  /** Fixed as-of (mid orderdate range) so active-cycle/days metrics vary. */
  val asof = "1996-06-01 00:00:00"

  // ---- linear (fct_issues) ------------------------------------------------

  def issues(orders: DataFrame): DataFrame = orders.select(
    col("o_orderkey").as("id"),
    concat(lit("ISS-"), col("o_orderkey")).as("identifier"),
    concat(lit("Issue "), col("o_orderkey")).as("title"),
    when(col("o_orderstatus") === "P", "In Progress")
      .when(col("o_orderstatus") === "O", "Todo")
      .otherwise("Done").as("state"),
    pmod(col("o_orderkey"), lit(8)).cast("long").as("estimate"),
    col("o_custkey").as("assignee_id"),
    pmod(col("o_orderkey"), lit(20)).as("cycle_id"),
    col("o_orderpriority").as("labels"),
    when(pmod(col("o_orderkey"), lit(10)) =!= 0,
      expr("(o_orderkey div 10) * 10")).as("parent_id"),
    col("o_orderdate").as("created_at"))

  def users(customer: DataFrame): DataFrame =
    customer.select(col("c_custkey").as("user_id"), col("c_name").as("name"))

  /** stg_linear__users-shaped (stg_linear__users.sql): [[users]] plus the
    * dim_users email scheme (Marts.dimUsers) — unique by construction.
    */
  def linearUsers(customer: DataFrame): DataFrame =
    customer.select(
      col("c_custkey").as("user_id"),
      col("c_name").as("name"),
      concat(lit("user"), col("c_custkey") * 2, lit("@x.com")).as("email"))

  def cycles(spark: SparkSession): DataFrame =
    spark.range(0, 20).select(
      col("id").as("cycle_id"),
      concat(lit("Cycle "), col("id")).as("name"),
      expr("timestampadd(DAY, CAST(id * 30 AS INT), TIMESTAMP '1995-01-01 00:00:00')")
        .as("starts_at"),
      expr("timestampadd(DAY, CAST(id * 30 + 30 AS INT), TIMESTAMP '1995-01-01 00:00:00')")
        .as("ends_at"))

  def fctIssues(spark: SparkSession, orders: DataFrame, customer: DataFrame): DataFrame =
    Models.fctIssues(issues(orders), users(customer), cycles(spark),
      to_timestamp(lit(asof)))

  // ---- github (fct_pull_requests, fct_reviewer_activity) ------------------

  // parquet timestamps load as TIMESTAMP_NTZ; the PR model diffs epochs via
  // unix_micros, which needs TIMESTAMP — cast once here (session TZ is UTC,
  // so the wall-clock reinterpretation is identity)
  def prs(orders: DataFrame): DataFrame = orders.select(
    col("o_orderkey").as("id"),
    concat(lit("PR "), col("o_orderkey")).as("title"),
    when(col("o_orderstatus") === "F", "MERGED").otherwise("OPEN").as("state"),
    col("o_custkey").as("author_id"),
    col("o_orderdate").cast("timestamp").as("created_at"),
    expr("timestampadd(HOUR, 1, CAST(o_orderdate AS TIMESTAMP))").as("ready_for_review_at"),
    when(col("o_orderstatus") === "F",
      expr("timestampadd(HOUR, CAST(o_orderkey % 72 + 2 AS INT), CAST(o_orderdate AS TIMESTAMP))"))
      .as("merged_at"))

  def reviews(lineitem: DataFrame): DataFrame = lineitem.select(
    col("l_orderkey").as("pull_request_id"),
    col("l_suppkey").as("reviewer_id"),
    when(col("l_returnflag") === "R", "APPROVED").otherwise("COMMENTED").as("state"),
    col("l_shipdate").cast("timestamp").as("submitted_at"))

  def comments(lineitem: DataFrame): DataFrame = lineitem
    .where(col("l_linenumber") <= 2)
    .select(
      col("l_orderkey").as("pull_request_id"),
      (col("l_suppkey") + 1000).as("author_id"))

  def fctPullRequests(orders: DataFrame, lineitem: DataFrame): DataFrame =
    Models.fctPullRequests(prs(orders), reviews(lineitem), comments(lineitem))

  def fctReviewerActivity(orders: DataFrame, lineitem: DataFrame): DataFrame =
    Models.fctReviewerActivity(reviews(lineitem), comments(lineitem), prs(orders))

  // ---- oura (fct_oura_daily) ----------------------------------------------

  private def dailyScore(events: DataFrame, eventType: String, base: Int,
      span: Int): DataFrame =
    events.where(col("event_type") === eventType)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        (lit(base) + pmod(count(lit(1)), lit(span.toLong))).as("score"),
        count(lit(1)).as("__n"))

  /** stg_oura__sleep-shaped: the day-grain score the mart consumes plus the
    * reference staging columns (stg_oura__sleep.sql:8-18) — a synthetic id
    * and the eight contributor_* scores, each a deterministic [0,100]
    * derivation of the day's event count. fct_oura_daily reads only
    * (day, score), so the mart and its oracle are unaffected.
    */
  def sleep(events: DataFrame): DataFrame = {
    val contributors = Seq(
      "contributor_deep_sleep" -> 7, "contributor_efficiency" -> 11,
      "contributor_latency" -> 13, "contributor_rem_sleep" -> 17,
      "contributor_restfulness" -> 19, "contributor_timing" -> 23,
      "contributor_total_sleep" -> 29)
    contributors.foldLeft(
      dailyScore(events, "view", 50, 50)
        .withColumn("sleep_id", concat(lit("sleep_"), col("day")))) {
      case (df, (name, prime)) =>
        df.withColumn(name, pmod(col("__n") * prime, lit(101L)))
    }.drop("__n")
  }

  /** stg_oura__daily_readiness-shaped (stg_oura__daily_readiness.sql:7-12):
    * score plus synthetic id and a [-3.0, 3.0] temperature deviation.
    */
  def readiness(events: DataFrame): DataFrame =
    dailyScore(events, "click", 40, 60)
      .withColumn("readiness_id", concat(lit("readiness_"), col("day")))
      .withColumn("temperature_deviation",
        (pmod(col("__n"), lit(61L)) - 30L).cast("double") / 10.0)
      .drop("__n")

  /** stg_oura__daily_activity-shaped (stg_oura__daily_activity.sql:8-20):
    * score/steps plus synthetic id and calorie columns holding the
    * reference's active <= total invariant by construction.
    */
  def activity(events: DataFrame): DataFrame =
    events.where(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        (lit(30) + pmod(count(lit(1)), lit(70L))).as("score"),
        pmod(sum(round(col("value")).cast("long")), lit(15000L)).as("steps"),
        pmod(count(lit(1)) * 37, lit(800L)).as("active_calories"),
        (lit(1200L) + pmod(count(lit(1)) * 37, lit(800L)) +
          pmod(count(lit(1)), lit(500L))).as("total_calories"))
      .withColumn("activity_id", concat(lit("activity_"), col("day")))

  /** stg_oura__sleep_sessions-shaped (stg_oura__sleep_sessions.sql:4-16):
    * session grain below [[sleep]]'s day grain — one row per sleep event with
    * a deterministic duration.
    */
  def sleepSessions(events: DataFrame): DataFrame =
    events.where(col("event_type") === "view")
      .select(
        col("event_id").as("sleep_session_id"),
        to_date(col("ts")).as("day"),
        (lit(18000L) + pmod(col("event_id") * 97, lit(14400L)))
          .as("total_sleep_duration_seconds"))

  def fctOuraDaily(events: DataFrame): DataFrame = {
    // scope-cached: each daily aggregate feeds BOTH the union spine and its
    // own left join — uncached, the three aggregations would each run
    // twice; raw .cache() leaked three relations per invocation
    import graft.operators.CacheScope.cached
    Models.fctOuraDaily(cached(sleep(events)), cached(readiness(events)),
      cached(activity(events)))
  }

  // ---- oracles ------------------------------------------------------------

  private[models] val issuesCtes: String =
    """issues AS (
      |  SELECT o_orderkey AS id,
      |         'ISS-' || o_orderkey AS identifier,
      |         'Issue ' || o_orderkey AS title,
      |         CASE o_orderstatus WHEN 'P' THEN 'In Progress'
      |              WHEN 'O' THEN 'Todo' ELSE 'Done' END AS state,
      |         CAST(o_orderkey % 8 AS BIGINT) AS estimate,
      |         o_custkey AS assignee_id,
      |         o_orderkey % 20 AS cycle_id,
      |         o_orderpriority AS labels,
      |         CASE WHEN o_orderkey % 10 != 0 THEN (o_orderkey // 10) * 10 END AS parent_id,
      |         o_orderdate AS created_at
      |  FROM orders),
      |users AS (SELECT c_custkey AS user_id, c_name AS name FROM customer),
      |cycles AS (
      |  SELECT i AS cycle_id, 'Cycle ' || i AS name,
      |         TIMESTAMP '1995-01-01 00:00:00' + INTERVAL (i * 30) DAY AS starts_at,
      |         TIMESTAMP '1995-01-01 00:00:00' + INTERVAL (i * 30 + 30) DAY AS ends_at
      |  FROM (SELECT UNNEST(range(0, 20)) AS i))""".stripMargin

  private[models] val prsCtes: String =
    """prs AS (
      |  SELECT o_orderkey AS id,
      |         'PR ' || o_orderkey AS title,
      |         CASE WHEN o_orderstatus = 'F' THEN 'MERGED' ELSE 'OPEN' END AS state,
      |         o_custkey AS author_id,
      |         o_orderdate AS created_at,
      |         o_orderdate + INTERVAL 1 HOUR AS ready_for_review_at,
      |         CASE WHEN o_orderstatus = 'F'
      |              THEN o_orderdate + INTERVAL (o_orderkey % 72 + 2) HOUR END AS merged_at
      |  FROM orders),
      |reviews AS (
      |  SELECT l_orderkey AS pull_request_id, l_suppkey AS reviewer_id,
      |         CASE WHEN l_returnflag = 'R' THEN 'APPROVED' ELSE 'COMMENTED' END AS state,
      |         CAST(l_shipdate AS TIMESTAMP) AS submitted_at
      |  FROM lineitem),
      |comments AS (
      |  SELECT l_orderkey AS pull_request_id, l_suppkey + 1000 AS author_id
      |  FROM lineitem WHERE l_linenumber <= 2)""".stripMargin

  val oracles: Map[String, String] = Map(
    "fct_issues" ->
      s"""WITH $issuesCtes,
         |cc AS (
         |  SELECT parent_id AS cc_parent, COUNT(*) AS child_count
         |  FROM issues WHERE parent_id IS NOT NULL GROUP BY 1),
         |parents AS (
         |  SELECT id AS p_id, identifier AS parent_identifier, title AS parent_title
         |  FROM issues)
         |SELECT i.id AS issue_id, i.identifier, i.title, i.state, i.estimate,
         |       u.name AS assignee_name, c.name AS cycle_name, i.labels,
         |       p.parent_identifier, p.parent_title,
         |       i.parent_id IS NOT NULL AS is_child,
         |       COALESCE(cc.child_count, 0) > 0 AS is_parent,
         |       CAST(COALESCE(cc.child_count, 0) AS BIGINT) AS child_count,
         |       TIMESTAMP '1996-06-01 00:00:00' BETWEEN c.starts_at AND c.ends_at AS is_active_cycle,
         |       CAST(date_diff('day', CAST(i.created_at AS DATE), DATE '1996-06-01') AS BIGINT) AS days_since_created
         |FROM issues i
         |LEFT JOIN users u ON i.assignee_id = u.user_id
         |LEFT JOIN cycles c ON i.cycle_id = c.cycle_id
         |LEFT JOIN parents p ON i.parent_id = p.p_id
         |LEFT JOIN cc ON i.id = cc.cc_parent""".stripMargin,
    "fct_pull_requests" ->
      s"""WITH $prsCtes,
         |rs AS (
         |  SELECT pull_request_id AS rv_pr, COUNT(*) AS review_count,
         |         COUNT(CASE WHEN state = 'APPROVED' THEN 1 END) AS approved_count,
         |         MIN(submitted_at) AS first_review_at
         |  FROM reviews GROUP BY 1),
         |cs AS (
         |  SELECT pull_request_id AS cm_pr, COUNT(*) AS comment_count
         |  FROM comments GROUP BY 1)
         |SELECT p.id AS pull_request_id, p.title, p.state, p.author_id,
         |       p.merged_at IS NOT NULL AS merged,
         |       COALESCE(rs.review_count, 0) AS review_count,
         |       COALESCE(rs.approved_count, 0) AS approved_count,
         |       COALESCE(cs.comment_count, 0) AS comment_count,
         |       rs.first_review_at,
         |       CASE WHEN epoch_us(p.merged_at) - epoch_us(p.created_at) >= 0
         |            THEN (epoch_us(p.merged_at) - epoch_us(p.created_at)) // 3600000000
         |            ELSE -((epoch_us(p.created_at) - epoch_us(p.merged_at)) // 3600000000)
         |       END AS hours_to_merge,
         |       CASE WHEN epoch_us(rs.first_review_at) - epoch_us(p.ready_for_review_at) >= 0
         |            THEN (epoch_us(rs.first_review_at) - epoch_us(p.ready_for_review_at)) // 3600000000
         |            ELSE -((epoch_us(p.ready_for_review_at) - epoch_us(rs.first_review_at)) // 3600000000)
         |       END AS hours_to_first_review
         |FROM prs p
         |LEFT JOIN rs ON p.id = rs.rv_pr
         |LEFT JOIN cs ON p.id = cs.cm_pr""".stripMargin,
    "fct_reviewer_activity" ->
      s"""WITH $prsCtes,
         |r AS (
         |  SELECT reviewer_id AS rv_actor, pull_request_id AS rv_pr,
         |         COUNT(*) AS review_count
         |  FROM reviews GROUP BY 1, 2),
         |c AS (
         |  SELECT author_id AS cm_actor, pull_request_id AS cm_pr,
         |         COUNT(*) AS comment_count
         |  FROM comments GROUP BY 1, 2),
         |participants AS (
         |  SELECT COALESCE(rv_actor, cm_actor) AS participant_id,
         |         COALESCE(rv_pr, cm_pr) AS pull_request_id,
         |         COALESCE(review_count, 0) AS review_count,
         |         COALESCE(comment_count, 0) AS comment_count
         |  FROM r FULL OUTER JOIN c ON rv_actor = cm_actor AND rv_pr = cm_pr)
         |SELECT pt.participant_id, pt.pull_request_id,
         |       CAST(pt.review_count AS BIGINT) AS review_count,
         |       CAST(pt.comment_count AS BIGINT) AS comment_count,
         |       p.author_id
         |FROM participants pt
         |JOIN prs p ON pt.pull_request_id = p.id
         |WHERE pt.participant_id != p.author_id""".stripMargin,
    "fct_oura_daily" ->
      """WITH s AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |         50 + COUNT(*) % 50 AS score
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |r AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |         40 + COUNT(*) % 60 AS score
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |a AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |         30 + COUNT(*) % 70 AS score,
        |         CAST(SUM(CAST(ROUND(value) AS BIGINT)) % 15000 AS BIGINT) AS steps
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |spine AS (
        |  SELECT day FROM s UNION SELECT day FROM r UNION SELECT day FROM a),
        |j AS (
        |  SELECT spine.day,
        |         s.score AS sleep_score, r.score AS readiness_score,
        |         a.score AS activity_score, a.steps,
        |         (CASE WHEN s.score IS NOT NULL THEN 1 ELSE 0 END
        |          + CASE WHEN r.score IS NOT NULL THEN 1 ELSE 0 END
        |          + CASE WHEN a.score IS NOT NULL THEN 1 ELSE 0 END) AS present
        |  FROM spine
        |  LEFT JOIN s ON spine.day = s.day
        |  LEFT JOIN r ON spine.day = r.day
        |  LEFT JOIN a ON spine.day = a.day)
        |SELECT day, sleep_score, readiness_score, activity_score, steps,
        |       CAST(COALESCE(sleep_score, 0) + COALESCE(readiness_score, 0)
        |            + COALESCE(activity_score, 0) AS DOUBLE)
        |         / CAST(NULLIF(present, 0) AS DOUBLE) AS combined_wellness_score,
        |       CASE WHEN sleep_score >= 85 THEN 'excellent'
        |            WHEN sleep_score >= 70 THEN 'good'
        |            WHEN sleep_score >= 60 THEN 'fair'
        |            WHEN sleep_score IS NOT NULL THEN 'poor' END AS sleep_category,
        |       CASE WHEN readiness_score >= 85 THEN 'optimal'
        |            WHEN readiness_score >= 70 THEN 'good'
        |            WHEN readiness_score >= 55 THEN 'fair'
        |            WHEN readiness_score IS NOT NULL THEN 'poor' END AS readiness_category,
        |       CASE WHEN steps >= 10000 THEN 'very_active'
        |            WHEN steps >= 7500 THEN 'active'
        |            WHEN steps >= 5000 THEN 'moderate'
        |            WHEN steps IS NOT NULL THEN 'sedentary' END AS activity_category
        |FROM j""".stripMargin)
}
