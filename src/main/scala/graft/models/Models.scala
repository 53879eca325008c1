package graft.models

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The reference's mart models as composable DataFrame functions over
  * reference-shaped inputs (FIXTURES.md §2 schemas). `ref()` composition in
  * dbt becomes plain function composition; materialization is the caller's
  * `.cache()`/write decision (dbt_project.yml:19-26 policy).
  *
  * A fixed `asof` timestamp replaces current_timestamp()/current_date() so
  * every model is a pure function of its inputs (replayable, oracle-able).
  */
object Models {

  private def d(c: Column): Column = c.cast(DoubleType)

  /** dim_users (dbt/models/marts/core/dim_users.sql:11-43): cross-system
    * identity resolution — FULL OUTER on lowered email, coalesced key with
    * `gh_` fallback, name precedence, provenance.
    * Inputs: linear(user_id, email, name), github(user_id, email, name).
    */
  def dimUsers(linear: DataFrame, github: DataFrame): DataFrame = {
    val l = linear.select(col("user_id").as("l_user_id"), col("email").as("l_email"),
      col("name").as("l_name"))
    val g = github.select(col("user_id").as("g_user_id"), col("email").as("g_email"),
      col("name").as("g_name"))
    l.join(g, lower(col("l_email")) === lower(col("g_email")), "full_outer")
      .select(
        coalesce(col("l_user_id"), concat(lit("gh_"), col("g_user_id"))).as("user_key"),
        coalesce(col("l_name"), col("g_name")).as("display_name"),
        coalesce(lower(col("l_email")), lower(col("g_email"))).as("email"),
        when(col("l_user_id").isNotNull && col("g_user_id").isNotNull, "both")
          .when(col("l_user_id").isNotNull, "linear")
          .otherwise("github").as("source_system"))
  }

  /** fct_issues (dbt/models/marts/linear/fct_issues.sql): star denorm with
    * self-join for parent title, child counts, boolean flags, active-cycle
    * test, days_since_created vs a fixed as-of.
    * Input schema: FIXTURES §2 linear.raw_issues (+ users, cycles dims).
    */
  def fctIssues(issues: DataFrame, users: DataFrame, cycles: DataFrame,
      asof: Column): DataFrame = {
    val childCounts = issues.where(col("parent_id").isNotNull)
      .groupBy(col("parent_id").as("cc_parent"))
      .agg(count(lit(1)).as("child_count"))
    val parents = issues.select(col("id").as("p_id"), col("identifier").as("parent_identifier"),
      col("title").as("parent_title"))
    issues.as("i")
      .join(users.as("u"), col("i.assignee_id") === col("u.user_id"), "left")
      .join(cycles.as("c"), col("i.cycle_id") === col("c.cycle_id"), "left")
      .join(parents, col("i.parent_id") === col("p_id"), "left")
      .join(childCounts, col("i.id") === col("cc_parent"), "left")
      .select(
        col("i.id").as("issue_id"),
        col("i.identifier").as("identifier"),
        col("i.title").as("title"),
        col("i.state").as("state"),
        col("i.estimate").as("estimate"),
        col("u.name").as("assignee_name"),
        col("c.name").as("cycle_name"),
        col("i.labels").as("labels"),
        col("parent_identifier"),
        col("parent_title"),
        col("i.parent_id").isNotNull.as("is_child"),
        (coalesce(col("child_count"), lit(0L)) > 0).as("is_parent"),
        coalesce(col("child_count"), lit(0L)).as("child_count"),
        // between_ts (fct_issues.sql:59-64) against the pure as-of
        asof.between(col("c.starts_at"), col("c.ends_at")).as("is_active_cycle"),
        // date_diff(current_date, created, day) (fct_issues.sql:66)
        datediff(to_date(asof), to_date(col("i.created_at"))).cast("long")
          .as("days_since_created"))
  }

  /** fct_pull_requests (dbt/models/marts/github/fct_pull_requests.sql):
    * PR fact with pre-aggregated review/comment stats, conditional counts,
    * first-review timestamp, cycle-time hours (BQ truncation semantics).
    */
  def fctPullRequests(prs: DataFrame, reviews: DataFrame, comments: DataFrame): DataFrame = {
    val reviewStats = reviews.groupBy(col("pull_request_id").as("rv_pr"))
      .agg(
        count(lit(1)).as("review_count"),
        count(when(col("state") === "APPROVED", lit(1))).as("approved_count"),
        min(col("submitted_at")).as("first_review_at"))
    val commentStats = comments.groupBy(col("pull_request_id").as("cm_pr"))
      .agg(count(lit(1)).as("comment_count"))
    prs
      .join(reviewStats, col("id") === col("rv_pr"), "left")
      .join(commentStats, col("id") === col("cm_pr"), "left")
      .select(
        col("id").as("pull_request_id"),
        col("title"), col("state"), col("author_id"),
        col("merged_at").isNotNull.as("merged"),
        coalesce(col("review_count"), lit(0L)).as("review_count"),
        coalesce(col("approved_count"), lit(0L)).as("approved_count"),
        coalesce(col("comment_count"), lit(0L)).as("comment_count"),
        col("first_review_at"),
        // timestamp_diff(merged_at, created_at, hour) — trunc toward zero
        expr("(unix_micros(merged_at) - unix_micros(created_at)) div 3600000000")
          .as("hours_to_merge"),
        // first response can precede ready_for_review (negative) — preserved
        expr("(unix_micros(first_review_at) - unix_micros(ready_for_review_at)) div 3600000000")
          .as("hours_to_first_review"))
  }

  /** fct_reviewer_activity (fct_reviewer_activity.sql:43-55,117-120):
    * reviewer∪commenter participants by composite key, self-reviews excluded.
    */
  def fctReviewerActivity(reviews: DataFrame, comments: DataFrame, prs: DataFrame): DataFrame = {
    val r = reviews.groupBy(col("reviewer_id").as("rv_actor"), col("pull_request_id").as("rv_pr"))
      .agg(count(lit(1)).as("review_count"))
    val c = comments.groupBy(col("author_id").as("cm_actor"), col("pull_request_id").as("cm_pr"))
      .agg(count(lit(1)).as("comment_count"))
    val participants = r.join(c,
        col("rv_actor") === col("cm_actor") && col("rv_pr") === col("cm_pr"), "full_outer")
      .select(
        coalesce(col("rv_actor"), col("cm_actor")).as("participant_id"),
        coalesce(col("rv_pr"), col("cm_pr")).as("pull_request_id"),
        coalesce(col("review_count"), lit(0L)).as("review_count"),
        coalesce(col("comment_count"), lit(0L)).as("comment_count"))
    participants
      .join(prs.select(col("id"), col("author_id")),
        col("pull_request_id") === col("id"))
      .where(col("participant_id") =!= col("author_id")) // exclude self-review
      .drop("id")
  }

  /** fct_oura_daily (dbt/models/marts/oura/fct_oura_daily.sql): calendar
    * spine over four fact streams, LEFT JOIN each, null-aware combined
    * wellness score (:125-135) and threshold buckets (:96-123).
    * Inputs: each (day, score[, steps]) per FIXTURES §2 oura schemas.
    */
  def fctOuraDaily(sleep: DataFrame, readiness: DataFrame, activity: DataFrame): DataFrame = {
    val spine = sleep.select(col("day"))
      .union(readiness.select(col("day")))
      .union(activity.select(col("day")))
      .distinct()
    val s = sleep.select(col("day"), col("score").as("sleep_score"))
    val r = readiness.select(col("day"), col("score").as("readiness_score"))
    val a = activity.select(col("day"), col("score").as("activity_score"),
      col("steps"))
    def present(c: Column) = when(c.isNotNull, 1).otherwise(0)
    spine
      .join(s, Seq("day"), "left")
      .join(r, Seq("day"), "left")
      .join(a, Seq("day"), "left")
      .select(
        col("day"),
        col("sleep_score"), col("readiness_score"), col("activity_score"), col("steps"),
        // null-aware average over present components only
        (d(coalesce(col("sleep_score"), lit(0L)) + coalesce(col("readiness_score"), lit(0L)) +
          coalesce(col("activity_score"), lit(0L))) /
          d(when(
            present(col("sleep_score")) + present(col("readiness_score")) +
              present(col("activity_score")) === 0, null)
            .otherwise(present(col("sleep_score")) + present(col("readiness_score")) +
              present(col("activity_score"))))).as("combined_wellness_score"),
        when(col("sleep_score") >= 85, "excellent")
          .when(col("sleep_score") >= 70, "good")
          .when(col("sleep_score") >= 60, "fair")
          .when(col("sleep_score").isNotNull, "poor").as("sleep_category"),
        // fct_oura_daily.sql:103-108 (85/70/55 tiers, null-propagating like
        // the other category columns)
        when(col("readiness_score") >= 85, "optimal")
          .when(col("readiness_score") >= 70, "good")
          .when(col("readiness_score") >= 55, "fair")
          .when(col("readiness_score").isNotNull, "poor").as("readiness_category"),
        when(col("steps") >= 10000, "very_active")
          .when(col("steps") >= 7500, "active")
          .when(col("steps") >= 5000, "moderate")
          .when(col("steps").isNotNull, "sedentary").as("activity_category"))
  }

  /** fct_keyword_trends (dbt/models/marts/trends/fct_keyword_trends.sql):
    * WoW/MoM offset lags, 7/30-row rolling means, centered-frame local peaks
    * over a (keyword, date, interest) series.
    */
  def fctKeywordTrends(trends: DataFrame): DataFrame = {
    val byKw = Window.partitionBy("keyword").orderBy("date")
    val w7 = byKw.rowsBetween(-6, 0)
    val w30 = byKw.rowsBetween(-29, 0)
    val c7 = byKw.rowsBetween(-3, 3)
    trends
      .withColumn("interest_wow", lag(col("interest"), 7).over(byKw))
      .withColumn("interest_mom", lag(col("interest"), 30).over(byKw))
      .withColumn("sum7", sum(col("interest")).over(w7))
      .withColumn("n7", count(lit(1)).over(w7))
      .withColumn("sum30", sum(col("interest")).over(w30))
      .withColumn("n30", count(lit(1)).over(w30))
      .withColumn("local_max", max(col("interest")).over(c7))
      .select(
        col("keyword"), col("date"), col("interest"),
        (col("interest") - col("interest_wow")).as("wow_change"),
        (col("interest") - col("interest_mom")).as("mom_change"),
        (d(col("sum7")) / d(col("n7"))).as("avg_7d"),
        (d(col("sum30")) / d(col("n30"))).as("avg_30d"),
        (col("interest") >= col("local_max")).as("is_local_peak"))
  }
}
