package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics operators over the event stream — the strictly-ordered
  * funnel and the cohort retention matrix, the two queries behind every
  * Streamlit/BI "conversion" and "retention" page (the reference's serve
  * layer computes this class of rollup client-side in pandas, e.g. the
  * weekly activity pivots in pages/; here they are engine operators).
  *
  * Both are single-exchange plans: every per-user computation sits in
  * stacked unbounded-frame window passes over ONE hash(user_id) shuffle
  * (Catalyst plans consecutive same-partitioning Window nodes over one
  * exchange + one sort), and the final rollup is a tiny keyed aggregate.
  * Nothing is ever collected per user into an unbounded buffer — at 100 TB
  * the state per row is three timestamps, not an event list.
  */
object Funnel {

  /** `funnel_steps`: strictly-ordered three-step funnel (view → click →
    * purchase). Step k's entry time is the user's EARLIEST step-k event
    * STRICTLY AFTER their step-(k−1) entry time — the standard ordered
    * funnel, immune to purchase-before-view reorderings. Emits one row per
    * step with the count of users who reached it (monotone non-increasing).
    */
  def funnelSteps(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    val staged = events
      .select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("t1", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" && col("ts") > col("t1"), col("ts"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" && col("ts") > col("t2"), col("ts"))).over(w))
    val perUser = staged
      .groupBy(col("user_id"))
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"), max(col("t3")).as("t3"))
    perUser
      .select(explode(array(
        struct(lit(1L).as("step"), lit("view").as("step_name"), col("t1").isNotNull.as("reached")),
        struct(lit(2L).as("step"), lit("click").as("step_name"), col("t2").isNotNull.as("reached")),
        struct(lit(3L).as("step"), lit("purchase").as("step_name"), col("t3").isNotNull.as("reached")))).as("s"))
      .where(col("s.reached"))
      .groupBy(col("s.step").as("step"), col("s.step_name").as("step_name"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** `retention_cohorts`: the cohort retention matrix — users bucketed by
    * first-seen week, counted in every subsequent week they were active.
    * (cohort_week, week_offset=0) is the cohort size; later offsets over it
    * are the retention curve. Weeks are Monday-truncated in both engines,
    * so the day gap is an exact multiple of 7 and the offset division is
    * integer-exact. Plan: distinct (user, week) — pre-combined map-side, at
    * most |weeks| rows per user — then the cohort min as a window over the
    * same user hashing, then the tiny (cohort, offset) rollup.
    */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val weeks = events
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("week"))
      .distinct()
    val w = Window.partitionBy("user_id")
    weeks
      .withColumn("cohort_week", min(col("week")).over(w))
      .withColumn("week_offset", expr("datediff(week, cohort_week) div 7"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  val oracles: Map[String, String] = Map(
    "funnel_steps" ->
      """WITH staged AS (
        |  SELECT user_id,
        |         MIN(CASE WHEN event_type = 'view' THEN ts END)
        |           OVER (PARTITION BY user_id) AS t1,
        |         ts, event_type
        |  FROM events),
        |s2 AS (
        |  SELECT user_id, t1,
        |         MIN(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
        |           OVER (PARTITION BY user_id) AS t2,
        |         ts, event_type
        |  FROM staged),
        |s3 AS (
        |  SELECT user_id, t1, t2,
        |         MIN(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
        |           OVER (PARTITION BY user_id) AS t3
        |  FROM s2),
        |per_user AS (
        |  SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
        |  FROM s3 GROUP BY 1)
        |SELECT step, step_name, COUNT(*) AS n_users FROM (
        |  SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name, t1 IS NOT NULL AS reached FROM per_user
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), 'click', t2 IS NOT NULL FROM per_user
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT), 'purchase', t3 IS NOT NULL FROM per_user)
        |WHERE reached GROUP BY 1, 2""".stripMargin,
    "retention_cohorts" ->
      """WITH weeks AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
        |  FROM events),
        |c AS (
        |  SELECT user_id, week,
        |         MIN(week) OVER (PARTITION BY user_id) AS cohort_week
        |  FROM weeks)
        |SELECT cohort_week,
        |       CAST((week - cohort_week) // 7 AS BIGINT) AS week_offset,
        |       COUNT(*) AS n_users
        |FROM c GROUP BY 1, 2""".stripMargin
  )
}
