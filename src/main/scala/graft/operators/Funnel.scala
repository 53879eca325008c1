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

  /** Conversion window for [[funnelStepsWindowed]] — shared with the
    * oracle so the registered query and its SQL cannot silently diverge.
    */
  private[operators] val FunnelConvWindowUs = 86400000000L // 1 day

  /** `funnel_windowed`: the TIME-BOUNDED funnel — the analytics-product
    * default ([[funnelSteps]] is the unbounded variant): step k counts only
    * if it happens strictly after step k−1 AND within the conversion
    * window of it, so a purchase three weeks after the click no longer
    * "converts". Same single-exchange stacked-window plan as the unbounded
    * funnel — the bound is one more predicate inside each step's
    * conditional min, zero additional shuffles or state.
    */
  def funnelStepsWindowed(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    def within(prev: String) =
      unix_micros(col("ts")) <= unix_micros(col(prev)) + FunnelConvWindowUs
    val staged = events
      .select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("t1", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t2", min(when(
        col("event_type") === "click" && col("ts") > col("t1") && within("t1"),
        col("ts"))).over(w))
      .withColumn("t3", min(when(
        col("event_type") === "purchase" && col("ts") > col("t2") && within("t2"),
        col("ts"))).over(w))
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

  /** Lookback for [[attributionFirstTouch]] — shared with the oracle so
    * the registered query and its SQL cannot silently diverge.
    */
  private[operators] val AttributionLookbackUs = 7L * 86400000000L // 7 days

  /** `attribution_first_touch`: marketing attribution — each purchase is
    * credited to the user's EARLIEST click inside a 7-day lookback window
    * (ties at the first timestamp break on the smaller click id; purchases
    * with no in-window click surface NULLs = "direct"). The third leg of
    * the product-analytics family: funnel counts conversions, retention
    * counts return visits, attribution answers which touch earned the
    * purchase.
    *
    * Scale shape: the same bucket decomposition as `join_range_bucketed` —
    * a purchase explodes into its lookback's 8 day-buckets, clicks key by
    * their own bucket, and the (user, bucket) hash equi-join + exact bound
    * post-filter finds candidates in O(purchases × 8 + clicks + matches),
    * never a per-user cross product. The first-touch pick is a candidate-
    * sized min + tie-break join — both orders of magnitude below the event
    * corpus. A hot day-bucket splits under AQE skew handling like every
    * bucketed join here.
    */
  def attributionFirstTouch(events: DataFrame): DataFrame = {
    val DayUs = 86400000000L
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("c_t"),
        col("event_id").as("click_id"))
      .withColumn("blk", expr(s"c_t div $DayUs"))
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("p_t"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    val cand = purchases
      .withColumn("blk", explode(sequence(
        expr(s"(p_t - $AttributionLookbackUs) div $DayUs"), expr(s"p_t div $DayUs"))))
      .join(clicks, Seq("user_id", "blk"))
      .where(col("c_t") > col("p_t") - AttributionLookbackUs && col("c_t") <= col("p_t"))
      .select(col("purchase_id"), col("c_t"), col("click_id"))
    val firstTs = cand.groupBy(col("purchase_id")).agg(min(col("c_t")).as("first_t"))
    val first = cand.join(firstTs, Seq("purchase_id"))
      .where(col("c_t") === col("first_t"))
      .groupBy(col("purchase_id"))
      .agg(min(col("click_id")).as("first_click_id"), min(col("c_t")).as("ft"))
    purchases.join(first, Seq("purchase_id"), "left")
      .select(
        col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("first_click_id"),
        timestamp_micros(col("ft")).as("first_click_ts"),
        (col("p_t") - col("ft")).as("latency_us"))
  }

  /** `retention_rolling`: ROLLING (a.k.a. unbounded) retention — a user
    * counts at offset k if they returned at week k OR ANY LATER week, the
    * "will they ever come back" curve product teams pair with the classic
    * matrix ([[retentionCohorts]] counts only exact-week returns). Per
    * user the state collapses to one row (cohort, last-seen offset); the
    * explode emits at most the series' week span per user, and the rollup
    * is the tiny (cohort, offset) aggregate. Monotone non-increasing per
    * cohort by construction.
    */
  def retentionRolling(events: DataFrame): DataFrame = {
    val weeks = events
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("week"))
      .distinct()
    val w = Window.partitionBy("user_id")
    val perUser = weeks
      .withColumn("cohort_week", min(col("week")).over(w))
      .groupBy(col("user_id"), col("cohort_week"))
      .agg(max(expr("datediff(week, cohort_week) div 7")).as("last_offset"))
    perUser
      .select(col("cohort_week"),
        explode(sequence(lit(0L), col("last_offset"))).as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  val oracles: Map[String, String] = Map(
    "retention_rolling" ->
      """WITH weeks AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
        |  FROM events),
        |c AS (
        |  SELECT user_id, week,
        |         MIN(week) OVER (PARTITION BY user_id) AS cohort_week
        |  FROM weeks),
        |p AS (
        |  SELECT user_id, cohort_week,
        |         MAX((week - cohort_week) // 7) AS last_offset
        |  FROM c GROUP BY 1, 2),
        |e AS (
        |  SELECT cohort_week, UNNEST(range(0, last_offset + 1)) AS week_offset
        |  FROM p)
        |SELECT cohort_week, CAST(week_offset AS BIGINT) AS week_offset,
        |       COUNT(*) AS n_users
        |FROM e GROUP BY 1, 2""".stripMargin,
    "attribution_first_touch" ->
      s"""WITH clicks AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS c_t, event_id AS click_id
        |  FROM events WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS p_t,
        |         event_id AS purchase_id, CAST(ts AS TIMESTAMP) AS purchase_ts
        |  FROM events WHERE event_type = 'purchase'),
        |cand AS (
        |  SELECT p.purchase_id, c.c_t, c.click_id
        |  FROM purchases p JOIN clicks c
        |    ON p.user_id = c.user_id
        |   AND c.c_t > p.p_t - $AttributionLookbackUs
        |   AND c.c_t <= p.p_t),
        |f AS (SELECT purchase_id, MIN(c_t) AS first_t FROM cand GROUP BY 1),
        |fc AS (
        |  SELECT cand.purchase_id,
        |         MIN(cand.click_id) AS first_click_id,
        |         MIN(cand.c_t) AS ft
        |  FROM cand JOIN f ON cand.purchase_id = f.purchase_id
        |                  AND cand.c_t = f.first_t
        |  GROUP BY 1)
        |SELECT p.purchase_id, p.user_id, p.purchase_ts,
        |       fc.first_click_id,
        |       make_timestamp(fc.ft) AS first_click_ts,
        |       CAST(p.p_t - fc.ft AS BIGINT) AS latency_us
        |FROM purchases p LEFT JOIN fc ON p.purchase_id = fc.purchase_id""".stripMargin,
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
    "funnel_windowed" ->
      s"""WITH staged AS (
        |  SELECT user_id,
        |         MIN(CASE WHEN event_type = 'view' THEN ts END)
        |           OVER (PARTITION BY user_id) AS t1,
        |         ts, event_type
        |  FROM events),
        |s2 AS (
        |  SELECT user_id, t1,
        |         MIN(CASE WHEN event_type = 'click' AND ts > t1
        |                   AND epoch_us(ts) <= epoch_us(t1) + $FunnelConvWindowUs
        |                  THEN ts END)
        |           OVER (PARTITION BY user_id) AS t2,
        |         ts, event_type
        |  FROM staged),
        |s3 AS (
        |  SELECT user_id, t1, t2,
        |         MIN(CASE WHEN event_type = 'purchase' AND ts > t2
        |                   AND epoch_us(ts) <= epoch_us(t2) + $FunnelConvWindowUs
        |                  THEN ts END)
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
