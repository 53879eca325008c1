package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Num

/** Set operators (SURVEY.md §2.7). No INTERSECT/EXCEPT exists in the
  * reference; the "rollup" is a hand-built UNION ALL, mapped to unionByName
  * (NOT Spark rollup()) to preserve the reference's row shape.
  */
object SetOps {

  /** `union_distinct` (fct_oura_daily.sql:37-46,137-141): calendar spine —
    * distinct weeks from three facts unioned, then LEFT JOIN each fact's
    * weekly aggregate onto the spine (missing weeks stay NULL).
    */
  def unionDistinct(orders: DataFrame, lineitem: DataFrame, events: DataFrame): DataFrame = {
    def weekOf(c: String) = to_date(date_trunc("week", col(c))).as("week")
    val spine = orders.select(weekOf("o_orderdate"))
      .union(lineitem.select(weekOf("l_shipdate")))
      .union(events.select(weekOf("ts")))
      .distinct()
    val placed = orders.groupBy(weekOf("o_orderdate"))
      .agg(count(lit(1)).as("orders_placed"))
    val shipped = lineitem.groupBy(weekOf("l_shipdate"))
      .agg(count(lit(1)).as("lines_shipped"))
    val evs = events.groupBy(weekOf("ts"))
      .agg(count(lit(1)).as("event_count"))
    spine
      .join(placed, Seq("week"), "left")
      .join(shipped, Seq("week"), "left")
      .join(evs, Seq("week"), "left")
      .select(col("week"), col("orders_placed"), col("lines_shipped"), col("event_count"))
  }

  /** `union_all_rollup` (fct_fda_recalls_by_topic.sql:73-109): per-group
    * aggregates UNION ALL hand-built rollup rows.
    *
    * Plan (round 16): the corpus is aggregated ONCE to the per-priority
    * (count, cents) base; the "Urgent (Any)" and "All" rollup rows
    * RE-REDUCE that 5-row frame — exact integer cents, so re-summing
    * groups equals summing the corpus directly. The urgent slice uses a
    * conditional aggregate (`sum(when(...))`, NOT a where): a filter on
    * the grouping column would push below the aggregate into that arm's
    * scan and split the canonical exchange, re-scanning the corpus —
    * the same inferred/pushed-predicate asymmetry the drift grid pins.
    * All three UNION ALL legs therefore share one exchange + one scan
    * (the r15 form scanned `orders` three times).
    */
  def unionAllRollup(orders: DataFrame): DataFrame = {
    val cents = Num.cents(col("o_totalprice"))
    val base = orders.groupBy(col("o_orderpriority").as("priority_group"))
      .agg(count(lit(1)).as("n"), sum(cents).as("c"))
    val urgent = col("priority_group").isin("1-URGENT", "2-HIGH")
    val perPriority = base.select(col("priority_group"),
      col("n").as("order_count"), Num.dollars(col("c")).as("total_sales"))
    val urgentAny = base
      .agg(coalesce(sum(when(urgent, col("n"))), lit(0L)).as("order_count"),
        Num.dollars(sum(when(urgent, col("c")))).as("total_sales"))
      .withColumn("priority_group", lit("Urgent (Any)"))
    val allRow = base
      .agg(coalesce(sum(col("n")), lit(0L)).as("order_count"),
        Num.dollars(sum(col("c"))).as("total_sales"))
      .withColumn("priority_group", lit("All"))
    perPriority
      .unionByName(urgentAny.select("priority_group", "order_count", "total_sales"))
      .unionByName(allRow.select("priority_group", "order_count", "total_sales"))
  }

  /** `union_participants` (fct_reviewer_activity.sql:43-55): participant
    * set-union by key with a role label — the FULL OUTER form of union
    * (see also [[Joins.joinFullOuterComposite]]).
    */
  def unionParticipants(lineitem: DataFrame): DataFrame =
    Joins.joinFullOuterComposite(lineitem)
      .withColumn("participant_role",
        when(col("review_count") > 0 && col("comment_count") > 0, "both")
          .when(col("review_count") > 0, "reviewer")
          .otherwise("commenter"))

  /** `union_by_name_evolve`: union across SCHEMA GENERATIONS by column
    * name — the `unionByName(allowMissingColumns = true)` surface that a
    * long-lived ingested table needs when old partitions predate a column.
    * Two generations are carved deterministically from `orders`: the "v1"
    * era (orderkey mod 2 = 0) predates the `priority` column and the "v2"
    * era carries it; v1 rows surface the missing column as NULL, and the
    * generation tag records provenance. Pure per-row projection + UNION
    * ALL — no shuffle; Catalyst pushes each era's filter and pruning into
    * its scan.
    */
  def unionByNameEvolve(orders: DataFrame): DataFrame = {
    val v1 = orders.where(pmod(col("o_orderkey"), lit(2)) === 0)
      .select(col("o_orderkey").as("order_id"),
        col("o_orderstatus").as("status"),
        Num.dollars(Num.cents(col("o_totalprice"))).as("total_price"),
        lit("v1").as("schema_gen"))
    val v2 = orders.where(pmod(col("o_orderkey"), lit(2)) === 1)
      .select(col("o_orderkey").as("order_id"),
        col("o_orderstatus").as("status"),
        Num.dollars(Num.cents(col("o_totalprice"))).as("total_price"),
        col("o_orderpriority").as("priority"),
        lit("v2").as("schema_gen"))
    v1.unionByName(v2, allowMissingColumns = true)
  }

  val oracles: Map[String, String] = Map(
    "union_by_name_evolve" ->
      """SELECT o_orderkey AS order_id, o_orderstatus AS status,
        |       CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE) / 100.0 AS total_price,
        |       'v1' AS schema_gen, CAST(NULL AS VARCHAR) AS priority
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus,
        |       CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE) / 100.0,
        |       'v2', o_orderpriority
        |FROM orders WHERE o_orderkey % 2 = 1""".stripMargin,
    "union_distinct" ->
      """WITH spine AS (
        |  SELECT DISTINCT week FROM (
        |    SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week FROM orders
        |    UNION ALL
        |    SELECT CAST(date_trunc('week', l_shipdate) AS DATE) AS week FROM lineitem
        |    UNION ALL
        |    SELECT CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week FROM events)),
        |placed AS (
        |  SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
        |         COUNT(*) AS orders_placed FROM orders GROUP BY 1),
        |shipped AS (
        |  SELECT CAST(date_trunc('week', l_shipdate) AS DATE) AS week,
        |         COUNT(*) AS lines_shipped FROM lineitem GROUP BY 1),
        |evs AS (
        |  SELECT CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week,
        |         COUNT(*) AS event_count FROM events GROUP BY 1)
        |SELECT s.week, orders_placed, lines_shipped, event_count
        |FROM spine s
        |LEFT JOIN placed p ON s.week = p.week
        |LEFT JOIN shipped sh ON s.week = sh.week
        |LEFT JOIN evs e ON s.week = e.week""".stripMargin,
    "union_all_rollup" ->
      """SELECT o_orderpriority AS priority_group, COUNT(*) AS order_count,
        |       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_sales
        |FROM orders GROUP BY 1
        |UNION ALL
        |SELECT 'Urgent (Any)', COUNT(*),
        |       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
        |FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |UNION ALL
        |SELECT 'All', COUNT(*),
        |       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
        |FROM orders""".stripMargin,
    "union_participants" ->
      """WITH reviews AS (
        |  SELECT l_suppkey AS rv_actor, l_orderkey AS rv_order, COUNT(*) AS review_count
        |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1, 2),
        |comments AS (
        |  SELECT l_suppkey AS cm_actor, l_orderkey AS cm_order, COUNT(*) AS comment_count
        |  FROM lineitem WHERE l_returnflag = 'A' GROUP BY 1, 2),
        |u AS (
        |  SELECT COALESCE(rv_actor, cm_actor) AS actor_id,
        |         COALESCE(rv_order, cm_order) AS order_id,
        |         COALESCE(review_count, 0) AS review_count,
        |         COALESCE(comment_count, 0) AS comment_count
        |  FROM reviews FULL OUTER JOIN comments
        |    ON rv_actor = cm_actor AND rv_order = cm_order)
        |SELECT actor_id, order_id, review_count, comment_count,
        |       CASE WHEN review_count > 0 AND comment_count > 0 THEN 'both'
        |            WHEN review_count > 0 THEN 'reviewer'
        |            ELSE 'commenter' END AS participant_role
        |FROM u""".stripMargin
  )
}
