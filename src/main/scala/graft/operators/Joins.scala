package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Num

/** Join operators (SURVEY.md §2.3). Every reference join is an equi-join
  * except the regex theta-join; physical notes:
  *  - dimension sides (nation/region/supplier, inline lookups) are far below
  *    autoBroadcastJoinThreshold → Catalyst broadcasts them; no shuffle of the
  *    fact side. At 100 TB the fact table never re-partitions for these.
  *  - fact-to-fact joins (orders↔lineitem) shuffle both sides on the join key
  *    once; AQE handles skew splitting.
  *  - the cross+regex join broadcasts the tiny keyword table under a nested
  *    loop — the correct plan for a theta-join with a 3-row build side.
  */
object Joins {

  /** Registered-query parameters shared with the oracles below, so the
    * Spark plan and its SQL cannot silently diverge on a constant.
    */
  private[operators] val AsofToleranceUs = 21600000000L // 6h
  private[operators] val SnmWindow = 6
  private[operators] val SnmThreshold = 2

  /** `join_left_denorm` (fct_issues.sql:68-72): star denormalization with a
    * self-join (customer → referrer customer via derived referrer_id).
    */
  def joinLeftDenorm(orders: DataFrame, customer: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame = {
    val cust = customer.as("c")
    val referrer = customer.select(col("c_custkey").as("ref_custkey"),
      col("c_name").as("ref_name"))
    orders.as("o")
      .join(cust, col("o.o_custkey") === col("c.c_custkey"), "left")
      .join(nation.as("n"), col("c.c_nationkey") === col("n.n_nationkey"), "left")
      .join(region.as("r"), col("n.n_regionkey") === col("r.r_regionkey"), "left")
      .join(referrer, expr("c.c_custkey div 10") === col("ref_custkey"), "left")
      .select(
        col("o.o_orderkey").as("order_id"),
        col("c.c_name").as("customer_name"),
        col("n.n_name").as("nation_name"),
        col("r.r_name").as("region_name"),
        col("ref_name").as("referrer_name"))
  }

  /** `join_left_agg` (fct_pull_requests.sql:94-97): fact LEFT JOIN
    * pre-aggregated subqueries.
    */
  def joinLeftAgg(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val lineStats = lineitem.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("line_count"),
        sum(Num.cents(col("l_extendedprice"))).as("revenue_cents"))
    orders
      .join(lineStats, orders("o_orderkey") === lineStats("l_orderkey"), "left")
      .select(
        col("o_orderkey").as("order_id"),
        col("o_orderstatus").as("status"),
        coalesce(col("line_count"), lit(0L)).as("line_count"),
        Num.dollars(coalesce(col("revenue_cents"), lit(0L))).as("line_revenue"))
  }

  /** `join_full_outer_expr` (dim_users.sql:11-43): cross-system identity
    * resolution — FULL OUTER on a lowered email expression, coalesced key with
    * source-prefix fallback, provenance label.
    */
  def joinFullOuterExpr(customer: DataFrame, supplier: DataFrame): DataFrame = {
    val l = customer.select(
      concat(lit("c_"), col("c_custkey")).as("l_user_id"),
      concat(lit("user"), col("c_custkey") * 2, lit("@x.com")).as("l_email"),
      col("c_name").as("l_name"))
    val g = supplier.select(
      col("s_suppkey").cast("string").as("g_user_id"),
      concat(lit("USER"), col("s_suppkey") * 3, lit("@X.COM")).as("g_email"),
      col("s_name").as("g_name"))
    l.join(g, lower(col("l_email")) === lower(col("g_email")), "full_outer")
      .select(
        coalesce(col("l_user_id"), concat(lit("gh_"), col("g_user_id"))).as("user_key"),
        coalesce(col("l_name"), col("g_name")).as("display_name"),
        coalesce(lower(col("l_email")), lower(col("g_email"))).as("email"),
        when(col("l_user_id").isNotNull && col("g_user_id").isNotNull, "both")
          .when(col("l_user_id").isNotNull, "linear")
          .otherwise("github").as("source_system"))
  }

  /** `join_full_outer_composite` + `union_participants`
    * (fct_reviewer_activity.sql:43-55): reviewers∪commenters keyed by the
    * composite (actor, order) — set-union by key via FULL OUTER + coalesce.
    */
  def joinFullOuterComposite(lineitem: DataFrame): DataFrame = {
    val reviews = lineitem.where(col("l_returnflag") === "R")
      .groupBy(col("l_suppkey").as("rv_actor"), col("l_orderkey").as("rv_order"))
      .agg(count(lit(1)).as("review_count"))
    val comments = lineitem.where(col("l_returnflag") === "A")
      .groupBy(col("l_suppkey").as("cm_actor"), col("l_orderkey").as("cm_order"))
      .agg(count(lit(1)).as("comment_count"))
    reviews.join(comments,
        col("rv_actor") === col("cm_actor") && col("rv_order") === col("cm_order"),
        "full_outer")
      .select(
        coalesce(col("rv_actor"), col("cm_actor")).as("actor_id"),
        coalesce(col("rv_order"), col("cm_order")).as("order_id"),
        coalesce(col("review_count"), lit(0L)).as("review_count"),
        coalesce(col("comment_count"), lit(0L)).as("comment_count"))
  }

  /** `join_inner_filter` (fct_reviewer_activity.sql:117-120): inner join +
    * anti-predicate (exclude self-review).
    */
  def joinInnerFilter(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .where(col("l_suppkey") =!= col("o_custkey") % 100)
      .select(
        col("l_orderkey").as("order_id"),
        col("l_suppkey").as("participant_id"),
        (col("o_custkey") % 100).as("author_id"))

  /** `join_semi_recent` (data.py:102-125): double left-semi filter against
    * recently-active actors on both sides of a pair table.
    */
  def joinSemiRecent(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val cutoff = to_timestamp(lit("2001-01-01 00:00:00"))
    val recentSupp = lineitem.where(col("l_shipdate") >= cutoff)
      .select(col("l_suppkey")).distinct()
    val recentCust = orders.where(col("o_orderdate") >= cutoff)
      .select(col("o_custkey")).distinct()
    lineitem
      .join(orders.select("o_orderkey", "o_custkey"),
        lineitem("l_orderkey") === col("o_orderkey"))
      .join(recentSupp, Seq("l_suppkey"), "left_semi")
      .join(recentCust, Seq("o_custkey"), "left_semi")
      .groupBy(col("l_suppkey").as("supplier_id"), col("o_custkey").as("customer_id"))
      .agg(count(lit(1)).as("interaction_count"))
  }

  /** `join_cross_regex` (fct_hn_keyword_trends.sql:59-71): tiny keyword table
    * × text rows, regex-contains theta-join. Patterns restricted to syntax
    * with identical semantics in Java regex (Spark) and RE2 (DuckDB).
    */
  def joinCrossRegex(spark: SparkSession, part: DataFrame): DataFrame = {
    val keywords = Seq(
      ("color", "red|blue|green"),
      ("widgets", "widget|gizmo|gadget"),
      ("hardware", "bolt|screw|gear"),
      ("size", "small|big|large"))
    // The keyword table is a compile-time constant, so the theta-join unrolls
    // into one scan with N literal rlike patterns (each compiled once per
    // task) + explode — same relation as crossJoin(broadcast)+filter, but a
    // column-typed regex forces per-row Pattern.compile; this form stays in
    // whole-stage codegen. At 100 TB: one pass over the fact, zero shuffle
    // before the final tiny aggregation.
    // concat of singleton arrays, not filter(array(...)): the filter() HOF is
    // a codegen fallback that would interpret the rlike chain; explode_outer
    // dodges the inferred size>0 filter that re-inlines it at the scan
    val matches = concat(keywords.map { case (k, p) =>
      when(lower(col("p_name")).rlike(p), array(lit(k)))
        .otherwise(array().cast("array<string>"))
    }: _*)
    part
      .select(col("p_brand"), explode_outer(matches).as("keyword"))
      .where(col("keyword").isNotNull)
      .groupBy(col("keyword"))
      .agg(count(lit(1)).as("part_count"),
        countDistinct(col("p_brand")).as("brand_count"))
  }

  /** `join_fact_to_story` (sources/hacker_news.py:335-341): facts joined to a
    * filtered dimension (comments of top stories).
    */
  def joinFactToStory(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val topOrders = orders.where(Num.cents(col("o_totalprice")) > 30000000L)
      .select(col("o_orderkey"))
    lineitem
      .join(topOrders, lineitem("l_orderkey") === topOrders("o_orderkey"))
      .groupBy(col("o_orderkey").as("order_id"))
      .agg(count(lit(1)).as("line_count"),
        Num.dollars(sum(Num.cents(col("l_extendedprice")))).as("line_revenue"))
  }

  /** `join_value_backref` (fct_sector_performance.sql:68-73): join an
    * aggregate back to detail on (group, value) to recover the argmax row.
    * `max_by` would collapse this to one agg — kept in join form for oracle
    * parity with the reference's SQL shape.
    */
  def joinValueBackref(supplier: DataFrame, nation: DataFrame): DataFrame = {
    val best = supplier
      .groupBy(col("s_nationkey").as("b_nationkey"))
      .agg(max(Num.cents(col("s_acctbal"))).as("best_balance_cents"))
    supplier
      .withColumn("acct_cents", Num.cents(col("s_acctbal")))
      .join(best, col("s_nationkey") === col("b_nationkey") &&
        col("acct_cents") === col("best_balance_cents"))
      .join(nation, col("s_nationkey") === nation("n_nationkey"))
      .select(
        col("n_name").as("nation_name"),
        col("s_name").as("best_supplier"),
        Num.dollars(col("best_balance_cents")).as("best_balance"))
  }

  /** `join_topk_back` (fct_sales_by_county.sql:52-56): per-group aggregates
    * LEFT JOIN the rank-1 row of a windowed sub-aggregate.
    */
  def joinTopkBack(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val perPart = lineitem
      .join(part, lineitem("l_partkey") === part("p_partkey"))
      .groupBy(col("p_brand").as("brand"), col("p_partkey"), col("p_name"))
      .agg(sum(Num.cents(col("l_extendedprice"))).as("part_rev_cents"))
    val brandTotals = perPart.groupBy(col("brand"))
      .agg(sum(col("part_rev_cents")).as("brand_rev_cents"),
        count(lit(1)).as("part_count"))
    val w = Window.partitionBy("brand").orderBy(col("part_rev_cents").desc, col("p_partkey"))
    val top = perPart.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("brand").as("t_brand"), col("p_name").as("top_part"),
        col("part_rev_cents").as("top_part_cents"))
    brandTotals.join(top, col("brand") === col("t_brand"), "left")
      .select(
        col("brand"),
        Num.dollars(col("brand_rev_cents")).as("brand_revenue"),
        col("part_count"),
        col("top_part"),
        Num.dollars(col("top_part_cents")).as("top_part_revenue"))
  }

  /** `join_pd_merge` (pages/2_GitHub_PRs.py:136,169-171): weekly series outer
    * merge + fillna(0).
    */
  def joinPdMerge(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val placed = orders
      .groupBy(to_date(date_trunc("week", col("o_orderdate"))).as("week"))
      .agg(count(lit(1)).as("orders_placed"))
    val shipped = lineitem
      .groupBy(to_date(date_trunc("week", col("l_shipdate"))).as("week"))
      .agg(count(lit(1)).as("lines_shipped"))
    placed.join(shipped, Seq("week"), "full_outer")
      .na.fill(0, Seq("orders_placed", "lines_shipped"))
      .select(col("week"), col("orders_placed"), col("lines_shipped"))
  }

  /** `join_asof`: AS-OF join — for each click, the most recent error AT OR
    * BEFORE it for the same user (attribution semantics). Spark has no
    * native ASOF operator (DuckDB does — it IS the oracle here), so this is
    * the canonical distributed composition, SURVEY §7.4 preference (a):
    * union both sides tagged, ONE window pass carrying the last non-null
    * right-side values forward in time order, keep left rows. Cost: one
    * shuffle on the key + one sort — identical to what a native as-of
    * operator would need (it cannot avoid co-locating and time-ordering);
    * no join node at all, no range explosion, skew bounded by the per-user
    * event volume.
    *
    * Determinism: the right side dedups to one error per (user, ts) keeping
    * the max event_id (same in the oracle — native ASOF leaves equal-ts
    * duplicates unspecified), and at equal timestamps the error sorts
    * before the click (is_left tiebreak) = the inclusive `>=` bound.
    */
  def joinAsof(events: DataFrame): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(1).as("is_left"),
        col("event_id"), lit(null).cast("long").as("err_id"),
        lit(null).cast("timestamp").as("err_ts"))
    val errors = events.where(col("event_type") === "error")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("err_id"))
      .select(col("user_id"), col("ts"), lit(0).as("is_left"),
        lit(null).cast("long").as("event_id"),
        col("err_id"), col("ts").as("err_ts"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.union(errors)
      .withColumn("error_event_id", last(col("err_id"), ignoreNulls = true).over(w))
      .withColumn("error_ts", last(col("err_ts"), ignoreNulls = true).over(w))
      .where(col("is_left") === 1)
      .select(
        col("event_id"), col("user_id"), col("ts"),
        col("error_event_id"), col("error_ts"),
        (unix_micros(col("ts")) - unix_micros(col("error_ts"))).as("staleness_us"))
  }

  /** `join_asof_tolerance`: the backward as-of join under pandas
    * `merge_asof`'s `tolerance` parameter — a match older than the window
    * is no match at all. Composition, not a new operator: [[joinAsof]]'s
    * union+window construction already carries the most recent error
    * forward, and the tolerance is a pure projection over its output
    * (staleness beyond the bound nulls the whole right side), so the plan
    * keeps the single key shuffle + single sort and gains nothing but a
    * WHEN per row. Tolerance default 6h in exact integer micros.
    */
  def joinAsofTolerance(events: DataFrame, tolUs: Long = AsofToleranceUs): DataFrame = {
    val in = col("staleness_us") <= tolUs
    joinAsof(events).select(
      col("event_id"), col("user_id"), col("ts"),
      when(in, col("error_event_id")).as("error_event_id"),
      when(in, col("error_ts")).as("error_ts"),
      when(in, col("staleness_us")).as("staleness_us"))
  }

  /** `join_range_bucketed`: RANGE (point-in-interval) join — for each
    * user's first-day activity window [first_event, first_event + 1 day),
    * count every event landing inside it. Spark has no native range-join
    * operator: the declarative `e.t >= i.lo AND e.t < i.hi` predicate plans
    * as a broadcast-nested-loop join, O(|events| × |intervals|) — the
    * classic scale killer once intervals number in the millions. This is
    * the canonical distributed decomposition (the same trick behind
    * Databricks' range-join optimization, public docs): quantize time into
    * fixed-width BUCKETS, explode each interval into the buckets it
    * overlaps (bounded: interval_len/bucket + 1 rows — here ≤ 2), hash
    * equi-join points to interval-buckets on the bucket id, then apply the
    * exact containment predicate as a post-filter. Work becomes
    * O(|events| + |intervals| + |true matches|) with one hash shuffle each
    * side — never a cross product.
    *
    * All bounds are integer epoch micros (no timestamp float math); the
    * bucket width (1 day) matches the interval length — production tunes it
    * to ~median interval length, the published heuristic. A burst day makes
    * a hot bucket: AQE skew-join splits it (the salting pattern of
    * operators/Skew.scala composes if one bucket dominates).
    */
  def joinRangeBucketed(events: DataFrame): DataFrame = {
    val DayUs = 86400000000L
    val ev = events.select(unix_micros(col("ts")).as("t"), col("user_id"))
    val intervals = ev.groupBy(col("user_id").as("owner"))
      .agg(min(col("t")).as("lo"))
      .withColumn("hi", col("lo") + DayUs)
    val intervalBuckets = intervals.select(col("owner"), col("lo"), col("hi"),
      explode(sequence(expr(s"lo div $DayUs"), expr(s"(hi - 1) div $DayUs")))
        .as("bucket"))
    ev.withColumn("bucket", expr(s"t div $DayUs"))
      .join(intervalBuckets, Seq("bucket"))
      .where(col("t") >= col("lo") && col("t") < col("hi"))
      .groupBy(col("owner"))
      .agg(count(lit(1)).as("n_events_in_window"))
      .select(col("owner").as("user_id"), col("n_events_in_window"))
  }

  /** `join_interval_overlap`: INTERVAL×INTERVAL overlap join — the
    * two-sided generalization of [[joinRangeBucketed]]'s point-in-interval
    * form (which user sessions overlapped which incident windows). The
    * declarative `a.lo <= b.hi AND b.lo <= a.hi` predicate has no equi-key,
    * so Spark would plan a nested-loop cross product. Same decomposition,
    * both sides: each interval explodes into the hour buckets it covers
    * (bounded by duration/bucket + 1), the two bucket sets hash equi-join
    * on the bucket id, the exact overlap predicate post-filters, and a
    * DISTINCT on the pair key collapses the multi-bucket double-counts a
    * long overlap produces. Work is O(|A| + |B| + |candidate pairs|), one
    * hash shuffle per side — never |A|×|B|.
    *
    * Intervals here: gap-sessionized user sessions vs ±30 min windows
    * around error events; emits per-session counts of overlapped incident
    * windows. All bounds are exact integer epoch micros.
    */
  def joinIntervalOverlap(events: DataFrame, padMinutes: Int = 30): DataFrame = {
    val HourUs = 3600L * 1000000L
    val padUs = padMinutes * 60L * 1000000L
    val sessions = graft.streaming.Sessionize.sessionizeBatch(events)
      .select(col("user_id"), col("session_idx"),
        unix_micros(col("session_start")).as("s_lo"),
        unix_micros(col("session_end")).as("s_hi"))
    val windows = events.where(col("event_type") === "error")
      .select(col("event_id").as("error_id"),
        (unix_micros(col("ts")) - padUs).as("w_lo"),
        (unix_micros(col("ts")) + padUs).as("w_hi"))
    val sessionBuckets = sessions.withColumn("bucket",
      explode(sequence(expr(s"s_lo div $HourUs"), expr(s"s_hi div $HourUs"))))
    val windowBuckets = windows.withColumn("bucket",
      explode(sequence(expr(s"w_lo div $HourUs"), expr(s"w_hi div $HourUs"))))
    sessionBuckets.join(windowBuckets, Seq("bucket"))
      .where(col("s_lo") <= col("w_hi") && col("w_lo") <= col("s_hi"))
      .select(col("user_id"), col("session_idx"), col("error_id"))
      .distinct()
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_error_windows"))
  }

  /** `join_asof_forward`: the FORWARD as-of join — for each click, the
    * EARLIEST error at or after it (lead-time semantics: "how long until
    * things broke"), pandas `merge_asof(direction='forward')`. Same
    * union-and-one-window-pass construction as [[joinAsof]] mirrored in
    * time: `first` over the (current row → following) frame, with the
    * tiebreak flipped (clicks sort BEFORE equal-ts errors) so the `<=`
    * bound stays inclusive. Identical scale shape: one shuffle on the key,
    * one sort, no join node.
    */
  def joinAsofForward(events: DataFrame): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(1).as("is_left"),
        col("event_id"), lit(null).cast("long").as("err_id"),
        lit(null).cast("timestamp").as("err_ts"))
    val errors = events.where(col("event_type") === "error")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("err_id"))
      .select(col("user_id"), col("ts"), lit(0).as("is_left"),
        lit(null).cast("long").as("event_id"),
        col("err_id"), col("ts").as("err_ts"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("is_left").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    clicks.union(errors)
      .withColumn("error_event_id", first(col("err_id"), ignoreNulls = true).over(w))
      .withColumn("error_ts", first(col("err_ts"), ignoreNulls = true).over(w))
      .where(col("is_left") === 1)
      .select(
        col("event_id"), col("user_id"), col("ts"),
        col("error_event_id"), col("error_ts"),
        (unix_micros(col("error_ts")) - unix_micros(col("ts"))).as("lead_us"))
  }

  /** `join_asof_nearest`: the NEAREST as-of join — for each click, the
    * error closest in time in EITHER direction, ties to the backward match
    * (pandas `merge_asof(direction='nearest')`, tie rule documented).
    * Both directions come out of ONE union + one (ts, is_left) sort: the
    * backward column is `last` over the preceding frame, the forward
    * column `first` over the following frame — the two WindowExecs share
    * the exchange and the sort (plan-audited shape, same as scd2_build).
    * The forward frame misses an EQUAL-ts error under this shared ordering,
    * but the backward frame captures it at staleness 0, which always wins
    * `nearest` — so the composition is exact while paying one sort instead
    * of two.
    */
  def joinAsofNearest(events: DataFrame): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(1).as("is_left"),
        col("event_id"), lit(null).cast("long").as("err_id"),
        lit(null).cast("timestamp").as("err_ts"))
    val errors = events.where(col("event_type") === "error")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("err_id"))
      .select(col("user_id"), col("ts"), lit(0).as("is_left"),
        lit(null).cast("long").as("event_id"),
        col("err_id"), col("ts").as("err_ts"))
    val order = Window.partitionBy("user_id").orderBy(col("ts"), col("is_left"))
    val back = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    clicks.union(errors)
      .withColumn("back_id", last(col("err_id"), ignoreNulls = true).over(back))
      .withColumn("back_ts", last(col("err_ts"), ignoreNulls = true).over(back))
      .withColumn("fwd_id", first(col("err_id"), ignoreNulls = true).over(fwd))
      .withColumn("fwd_ts", first(col("err_ts"), ignoreNulls = true).over(fwd))
      .where(col("is_left") === 1)
      .withColumn("back_st", unix_micros(col("ts")) - unix_micros(col("back_ts")))
      .withColumn("fwd_st", unix_micros(col("fwd_ts")) - unix_micros(col("ts")))
      .withColumn("take_back",
        col("fwd_ts").isNull || (col("back_ts").isNotNull && col("back_st") <= col("fwd_st")))
      .select(
        col("event_id"), col("user_id"), col("ts"),
        when(col("take_back"), col("back_id")).otherwise(col("fwd_id")).as("error_event_id"),
        when(col("take_back"), col("back_ts")).otherwise(col("fwd_ts")).as("error_ts"),
        when(col("take_back"), col("back_st")).otherwise(col("fwd_st")).as("distance_us"),
        when(col("back_ts").isNull && col("fwd_ts").isNull, lit(null).cast("string"))
          .when(col("take_back"), lit("backward")).otherwise(lit("forward")).as("direction"))
  }

  /** `join_fuzzy_blocked`: edit-distance fuzzy self-join — the entity-
    * resolution operator (typo'd titles, OCR'd names, near-identical
    * product labels). The naive form is an all-pairs Levenshtein — O(n²)
    * cross join, the canonical scale killer. Blocking makes it an
    * equi-join: edit distance ≤ t implies length difference ≤ t, so with
    * length buckets of width 4 ≥ t+1 every qualifying pair lands in the
    * SAME or ADJACENT buckets — the probe side explodes into its three
    * candidate buckets (3× row inflation, constant), hash-joins on the
    * bucket id, and the exact Levenshtein post-filters. The blocking is
    * LOSSLESS for the threshold (mirrored in the oracle, so results are
    * value-identical by construction), and work is O(pairs within blocks),
    * never n². Emits each part's fuzzy-match count — the "how ambiguous is
    * this name" audit — including zero-match rows via the left join.
    */
  def joinFuzzyBlocked(part: DataFrame, threshold: Int = 1): DataFrame = {
    // Lossless blocking requires bucket width ≥ threshold + 1 (a pair can
    // only skip past the adjacent bucket when its length gap exceeds the
    // width); deriving the width — rather than trusting the caller — keeps
    // the guarantee for ANY threshold while leaving the registered
    // threshold ≤ 3 on the oracle's width of 4.
    val width = math.max(4, threshold + 1)
    val b = part.select(col("p_partkey"), col("p_name"),
      expr(s"length(p_name) div $width").as("blk"))
    val probe = b.select(col("p_partkey").as("k"), col("p_name").as("name"),
        explode(sequence(col("blk") - 1, col("blk") + 1)).as("blk"))
    val matches = probe.join(b, Seq("blk"))
      .where(col("k") =!= col("p_partkey") &&
        levenshtein(col("name"), col("p_name")) <= threshold)
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
    b.join(matches, b("p_partkey") === matches("k"), "left")
      .select(col("p_partkey"), col("p_name"),
        coalesce(col("n"), lit(0L)).as("n_fuzzy_matches"))
  }

  /** `join_sorted_neighborhood`: entity resolution by the SORTED-
    * NEIGHBORHOOD method (Hernández & Stolfo, SIGMOD 1995) — order the
    * corpus by a sort key that clusters likely duplicates (here the name),
    * slide a fixed window of `window` positions, and verify only pairs
    * inside it: candidates are O(n·window) by construction. The blocking
    * complement of [[joinFuzzyBlocked]]: length buckets key on an attribute
    * VALUE (one hot length ⇒ one hot bucket), while SNM's buckets are RANK
    * ranges — every bucket holds exactly `window` records no matter how
    * skewed the data, so the candidate join cannot have a hot key.
    *
    * The global dense rank is computed the scale-honest way, not with a
    * single-partition window: RDD `sortBy` + `zipWithIndex` in ONE
    * structure. `sortBy` fixes its range-partitioner bounds eagerly (the
    * sampling job runs at call time and the bounds live in the partitioner
    * object), so — unlike a `repartitionByRange` plan whose sampling seed
    * is re-drawn per execution — the zipWithIndex count job and the final
    * query cannot disagree on the partitioning; the only driver-side state
    * is one row count per partition (model-sized, same discipline as every
    * collect here), and the rank itself is total-order-determined by
    * (p_name, p_partkey) wherever the bounds fall. Pairs within
    * `window − 1` positions span at most adjacent width-`window` rank
    * buckets, so a 3-bucket probe equi-join + exact |Δrank| post-filter is
    * lossless.
    */
  def joinSortedNeighborhood(part: DataFrame, window: Int = SnmWindow,
      threshold: Int = SnmThreshold): DataFrame = {
    val spark = part.sparkSession
    import spark.implicits._
    val parts = spark.sparkContext.defaultParallelism
    val ranked = part.select(col("p_partkey").cast("long"), col("p_name"))
      .as[(Long, String)].rdd
      .sortBy({ case (key, name) => (name, key) }, ascending = true,
        numPartitions = parts)
      .zipWithIndex()
      // index is 0-based: bucketing it directly keeps EVERY bucket exactly
      // `window` ranks wide (a 1-based rank would leave bucket 0 short)
      .map { case ((key, name), idx) => (key, name, idx + 1L, idx / window) }
      .toDF("p_partkey", "p_name", "rn", "blk")
    val probe = ranked.select(col("p_partkey").as("k"), col("p_name").as("name"),
      col("rn").as("krn"),
      explode(sequence(col("blk") - 1, col("blk") + 1)).as("blk"))
    val matches = probe.join(ranked, Seq("blk"))
      .where(col("k") =!= col("p_partkey") &&
        abs(col("krn") - col("rn")) < window &&
        levenshtein(col("name"), col("p_name")) <= threshold)
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
    ranked.join(matches, ranked("p_partkey") === matches("k"), "left")
      .select(col("p_partkey"), col("p_name"),
        coalesce(col("n"), lit(0L)).as("n_snm_matches"))
  }

  val oracles: Map[String, String] = Map(
    "join_sorted_neighborhood" ->
      s"""WITH r AS (
        |  SELECT p_partkey, p_name,
        |         CAST(ROW_NUMBER() OVER (ORDER BY p_name, p_partkey) AS BIGINT) AS rn
        |  FROM part),
        |m AS (
        |  SELECT a.p_partkey AS k, COUNT(*) AS n
        |  FROM r a JOIN r c
        |    ON c.rn BETWEEN a.rn - ${SnmWindow - 1} AND a.rn + ${SnmWindow - 1}
        |   AND c.rn != a.rn
        |   AND levenshtein(a.p_name, c.p_name) <= $SnmThreshold
        |  GROUP BY 1)
        |SELECT r.p_partkey, r.p_name, COALESCE(m.n, 0) AS n_snm_matches
        |FROM r LEFT JOIN m ON r.p_partkey = m.k""".stripMargin,
    "join_fuzzy_blocked" ->
      """WITH b AS (
        |  SELECT p_partkey, p_name, length(p_name) // 4 AS blk FROM part),
        |m AS (
        |  SELECT a.p_partkey AS k, COUNT(*) AS n
        |  FROM b a JOIN b c
        |    ON c.blk BETWEEN a.blk - 1 AND a.blk + 1
        |   AND a.p_partkey != c.p_partkey
        |   AND levenshtein(a.p_name, c.p_name) <= 1
        |  GROUP BY 1)
        |SELECT b.p_partkey, b.p_name, COALESCE(m.n, 0) AS n_fuzzy_matches
        |FROM b LEFT JOIN m ON b.p_partkey = m.k""".stripMargin,
    "join_range_bucketed" ->
      // DuckDB plans the raw range predicate natively (IEJoin) — the oracle
      // needs no bucket trick, which is the point of the comparison
      """WITH ev AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS t, user_id FROM events),
        |iv AS (
        |  SELECT user_id AS owner, MIN(t) AS lo, MIN(t) + 86400000000 AS hi
        |  FROM ev GROUP BY user_id)
        |SELECT iv.owner AS user_id, COUNT(*) AS n_events_in_window
        |FROM iv JOIN ev ON ev.t >= iv.lo AND ev.t < iv.hi
        |GROUP BY 1""".stripMargin,
    "join_interval_overlap" ->
      // DuckDB's IEJoin handles the raw overlap predicate natively — the
      // oracle states the θ-join directly; the engine's bucket
      // decomposition must produce value-identical pairs
      """WITH l AS (
        |  SELECT user_id, ts, event_id,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |f AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN prev_ts IS NULL
        |                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |              THEN 1 ELSE 0 END AS ns
        |  FROM l),
        |s AS (
        |  SELECT user_id, ts,
        |         SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM f),
        |sess AS (
        |  SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |         epoch_us(MIN(ts)) AS s_lo, epoch_us(MAX(ts)) AS s_hi
        |  FROM s GROUP BY user_id, session_idx),
        |w AS (
        |  SELECT event_id AS error_id,
        |         epoch_us(ts) - 1800000000 AS w_lo,
        |         epoch_us(ts) + 1800000000 AS w_hi
        |  FROM events WHERE event_type = 'error')
        |SELECT user_id, session_idx, COUNT(*) AS n_error_windows
        |FROM sess JOIN w ON s_lo <= w_hi AND w_lo <= s_hi
        |GROUP BY 1, 2""".stripMargin,
    "join_asof" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |err AS (
        |  SELECT user_id, ts, MAX(event_id) AS err_id
        |  FROM events WHERE event_type = 'error' GROUP BY 1, 2)
        |SELECT c.event_id, c.user_id, c.ts,
        |       e.err_id AS error_event_id, e.ts AS error_ts,
        |       CAST(epoch_us(c.ts) - epoch_us(e.ts) AS BIGINT) AS staleness_us
        |FROM clicks c ASOF LEFT JOIN err e
        |  ON c.user_id = e.user_id AND c.ts >= e.ts""".stripMargin,
    "join_asof_tolerance" ->
      s"""WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |err AS (
        |  SELECT user_id, ts, MAX(event_id) AS err_id
        |  FROM events WHERE event_type = 'error' GROUP BY 1, 2),
        |m AS (
        |  SELECT c.event_id, c.user_id, c.ts,
        |         e.err_id, e.ts AS e_ts,
        |         CAST(epoch_us(c.ts) - epoch_us(e.ts) AS BIGINT) AS stale
        |  FROM clicks c ASOF LEFT JOIN err e
        |    ON c.user_id = e.user_id AND c.ts >= e.ts)
        |SELECT event_id, user_id, ts,
        |       CASE WHEN stale <= $AsofToleranceUs THEN err_id END AS error_event_id,
        |       CASE WHEN stale <= $AsofToleranceUs THEN e_ts END AS error_ts,
        |       CASE WHEN stale <= $AsofToleranceUs THEN stale END AS staleness_us
        |FROM m""".stripMargin,
    "join_asof_forward" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |err AS (
        |  SELECT user_id, ts, MAX(event_id) AS err_id
        |  FROM events WHERE event_type = 'error' GROUP BY 1, 2)
        |SELECT c.event_id, c.user_id, c.ts,
        |       e.err_id AS error_event_id, e.ts AS error_ts,
        |       CAST(epoch_us(e.ts) - epoch_us(c.ts) AS BIGINT) AS lead_us
        |FROM clicks c ASOF LEFT JOIN err e
        |  ON c.user_id = e.user_id AND c.ts <= e.ts""".stripMargin,
    "join_asof_nearest" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |err AS (
        |  SELECT user_id, ts, MAX(event_id) AS err_id
        |  FROM events WHERE event_type = 'error' GROUP BY 1, 2),
        |b AS (
        |  SELECT c.event_id, e.err_id AS back_id, e.ts AS back_ts
        |  FROM clicks c ASOF LEFT JOIN err e
        |    ON c.user_id = e.user_id AND c.ts >= e.ts),
        |f AS (
        |  SELECT c.event_id, e.err_id AS fwd_id, e.ts AS fwd_ts
        |  FROM clicks c ASOF LEFT JOIN err e
        |    ON c.user_id = e.user_id AND c.ts <= e.ts)
        |SELECT c.event_id, c.user_id, c.ts,
        |       CASE WHEN take_back THEN b.back_id ELSE f.fwd_id END AS error_event_id,
        |       CASE WHEN take_back THEN b.back_ts ELSE f.fwd_ts END AS error_ts,
        |       CASE WHEN take_back THEN epoch_us(c.ts) - epoch_us(b.back_ts)
        |            ELSE epoch_us(f.fwd_ts) - epoch_us(c.ts) END AS distance_us,
        |       CASE WHEN b.back_ts IS NULL AND f.fwd_ts IS NULL THEN NULL
        |            WHEN take_back THEN 'backward' ELSE 'forward' END AS direction
        |FROM clicks c
        |JOIN b ON b.event_id = c.event_id
        |JOIN f ON f.event_id = c.event_id
        |CROSS JOIN LATERAL (SELECT f.fwd_ts IS NULL OR (b.back_ts IS NOT NULL
        |  AND epoch_us(c.ts) - epoch_us(b.back_ts) <= epoch_us(f.fwd_ts) - epoch_us(c.ts))
        |  AS take_back) t""".stripMargin,
    "join_left_denorm" ->
      """SELECT o.o_orderkey AS order_id,
        |       c.c_name AS customer_name,
        |       n.n_name AS nation_name,
        |       r.r_name AS region_name,
        |       ref.c_name AS referrer_name
        |FROM orders o
        |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
        |LEFT JOIN customer ref ON c.c_custkey // 10 = ref.c_custkey""".stripMargin,
    "join_left_agg" ->
      """WITH line_stats AS (
        |  SELECT l_orderkey, COUNT(*) AS line_count,
        |         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |  FROM lineitem GROUP BY 1)
        |SELECT o_orderkey AS order_id, o_orderstatus AS status,
        |       COALESCE(line_count, 0) AS line_count,
        |       CAST(COALESCE(revenue_cents, 0) AS DOUBLE) / 100.0 AS line_revenue
        |FROM orders LEFT JOIN line_stats ON o_orderkey = l_orderkey""".stripMargin,
    "join_full_outer_expr" ->
      """WITH l AS (
        |  SELECT 'c_' || c_custkey AS l_user_id,
        |         'user' || (c_custkey * 2) || '@x.com' AS l_email,
        |         c_name AS l_name
        |  FROM customer),
        |g AS (
        |  SELECT CAST(s_suppkey AS VARCHAR) AS g_user_id,
        |         'USER' || (s_suppkey * 3) || '@X.COM' AS g_email,
        |         s_name AS g_name
        |  FROM supplier)
        |SELECT COALESCE(l_user_id, 'gh_' || g_user_id) AS user_key,
        |       COALESCE(l_name, g_name) AS display_name,
        |       COALESCE(LOWER(l_email), LOWER(g_email)) AS email,
        |       CASE WHEN l_user_id IS NOT NULL AND g_user_id IS NOT NULL THEN 'both'
        |            WHEN l_user_id IS NOT NULL THEN 'linear'
        |            ELSE 'github' END AS source_system
        |FROM l FULL OUTER JOIN g ON LOWER(l_email) = LOWER(g_email)""".stripMargin,
    "join_full_outer_composite" ->
      """WITH reviews AS (
        |  SELECT l_suppkey AS rv_actor, l_orderkey AS rv_order, COUNT(*) AS review_count
        |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1, 2),
        |comments AS (
        |  SELECT l_suppkey AS cm_actor, l_orderkey AS cm_order, COUNT(*) AS comment_count
        |  FROM lineitem WHERE l_returnflag = 'A' GROUP BY 1, 2)
        |SELECT COALESCE(rv_actor, cm_actor) AS actor_id,
        |       COALESCE(rv_order, cm_order) AS order_id,
        |       COALESCE(review_count, 0) AS review_count,
        |       COALESCE(comment_count, 0) AS comment_count
        |FROM reviews FULL OUTER JOIN comments
        |  ON rv_actor = cm_actor AND rv_order = cm_order""".stripMargin,
    "join_inner_filter" ->
      """SELECT l_orderkey AS order_id,
        |       l_suppkey AS participant_id,
        |       o_custkey % 100 AS author_id
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_suppkey != o_custkey % 100""".stripMargin,
    "join_semi_recent" ->
      """WITH recent_supp AS (
        |  SELECT DISTINCT l_suppkey FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'),
        |recent_cust AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        |SELECT l.l_suppkey AS supplier_id, o.o_custkey AS customer_id,
        |       COUNT(*) AS interaction_count
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_suppkey IN (SELECT l_suppkey FROM recent_supp)
        |  AND o.o_custkey IN (SELECT o_custkey FROM recent_cust)
        |GROUP BY 1, 2""".stripMargin,
    "join_cross_regex" ->
      """WITH keywords AS (
        |  SELECT * FROM (VALUES
        |    ('color', 'red|blue|green'),
        |    ('widgets', 'widget|gizmo|gadget'),
        |    ('hardware', 'bolt|screw|gear'),
        |    ('size', 'small|big|large')) AS t(keyword, pattern))
        |SELECT keyword, COUNT(*) AS part_count,
        |       COUNT(DISTINCT p_brand) AS brand_count
        |FROM part CROSS JOIN keywords
        |WHERE regexp_matches(LOWER(p_name), pattern)
        |GROUP BY 1""".stripMargin,
    "join_fact_to_story" ->
      """WITH top_orders AS (
        |  SELECT o_orderkey FROM orders
        |  WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT) > 30000000)
        |SELECT l_orderkey AS order_id, COUNT(*) AS line_count,
        |       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS line_revenue
        |FROM lineitem JOIN top_orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,
    "join_value_backref" ->
      """WITH best AS (
        |  SELECT s_nationkey AS b_nationkey,
        |         MAX(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS best_balance_cents
        |  FROM supplier GROUP BY 1)
        |SELECT n_name AS nation_name, s_name AS best_supplier,
        |       CAST(best_balance_cents AS DOUBLE) / 100.0 AS best_balance
        |FROM supplier
        |JOIN best ON s_nationkey = b_nationkey
        |         AND CAST(ROUND(s_acctbal * 100) AS BIGINT) = best_balance_cents
        |JOIN nation ON s_nationkey = n_nationkey""".stripMargin,
    "join_topk_back" ->
      """WITH per_part AS (
        |  SELECT p_brand AS brand, p_partkey, p_name,
        |         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS part_rev_cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2, 3),
        |brand_totals AS (
        |  SELECT brand, CAST(SUM(part_rev_cents) AS BIGINT) AS brand_rev_cents,
        |         COUNT(*) AS part_count
        |  FROM per_part GROUP BY 1),
        |top AS (
        |  SELECT brand AS t_brand, p_name AS top_part, part_rev_cents AS top_part_cents
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY brand
        |          ORDER BY part_rev_cents DESC, p_partkey) AS rn FROM per_part)
        |  WHERE rn = 1)
        |SELECT brand,
        |       CAST(brand_rev_cents AS DOUBLE) / 100.0 AS brand_revenue,
        |       part_count, top_part,
        |       CAST(top_part_cents AS DOUBLE) / 100.0 AS top_part_revenue
        |FROM brand_totals LEFT JOIN top ON brand = t_brand""".stripMargin,
    "join_pd_merge" ->
      """WITH placed AS (
        |  SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
        |         COUNT(*) AS orders_placed
        |  FROM orders GROUP BY 1),
        |shipped AS (
        |  SELECT CAST(date_trunc('week', l_shipdate) AS DATE) AS week,
        |         COUNT(*) AS lines_shipped
        |  FROM lineitem GROUP BY 1)
        |SELECT COALESCE(p.week, s.week) AS week,
        |       COALESCE(orders_placed, 0) AS orders_placed,
        |       COALESCE(lines_shipped, 0) AS lines_shipped
        |FROM placed p FULL OUTER JOIN shipped s ON p.week = s.week""".stripMargin
  )
}
