package graft

import java.sql.Timestamp
import graft.operators.{Funnel, Windows}

/** Semantics gates for the product-analytics rollups: strict funnel
  * ordering, cohort offsets, and group-share arithmetic on crafted inputs.
  */
class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(day: Int, h: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  private def events(rows: (Long, Int, Int, Long, String)*) =
    rows.map { case (id, day, h, user, tpe) => (id, ts(day, h), user, tpe, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("funnel_steps enforces strict event ordering per user") {
    val df = events(
      // user 1 completes in order: counted at every step
      (1L, 1, 1, 1L, "view"), (2L, 1, 2, 1L, "click"), (3L, 1, 3, 1L, "purchase"),
      // user 2 purchases BEFORE clicking: purchase must not count
      (4L, 2, 1, 2L, "view"), (5L, 2, 3, 2L, "click"), (6L, 2, 2, 2L, "purchase"),
      // user 3 clicks before viewing: only the view counts
      (7L, 3, 2, 3L, "view"), (8L, 3, 1, 3L, "click"),
      // user 4 never views: no step reached
      (9L, 4, 1, 4L, "click"), (10L, 4, 2, 4L, "purchase"))
    val out = Funnel.funnelSteps(df).orderBy("step").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((1L, 3L), (2L, 2L), (3L, 1L)))
  }

  test("funnel_steps: equal timestamps are not 'after' (strict inequality)") {
    val df = events((1L, 1, 1, 1L, "view"), (2L, 1, 1, 1L, "click"))
    val out = Funnel.funnelSteps(df).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSet == Set((1L, 1L)))
  }

  test("funnel_windowed: steps beyond the conversion window do not convert") {
    val df = events(
      // user 1: view -> click (+4h) -> purchase (+3h): all inside the 1d window
      (1L, 1, 1, 1L, "view"), (2L, 1, 5, 1L, "click"), (3L, 1, 8, 1L, "purchase"),
      // user 2: click lands 2 DAYS after the view -> step 2 not reached
      (4L, 1, 1, 2L, "view"), (5L, 3, 1, 2L, "click"),
      // user 3: purchase lands 2 days after the click -> step 3 not reached
      (6L, 1, 1, 3L, "view"), (7L, 1, 3, 3L, "click"), (8L, 3, 3, 3L, "purchase"))
    val out = Funnel.funnelStepsWindowed(df).orderBy("step").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((1L, 3L), (2L, 2L), (3L, 1L)))
    // the unbounded funnel counts all three users through every step
    val unbounded = Funnel.funnelSteps(df).orderBy("step").collect()
    assert(unbounded.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((1L, 3L), (2L, 3L), (3L, 2L)))
  }

  test("attribution_first_touch: earliest in-window click, tie on id, window bounds") {
    val df = events(
      // user 1: clicks on day 2 and 4, purchase day 5 → first touch = day-2 click
      (1L, 2, 1, 1L, "click"), (2L, 4, 1, 1L, "click"), (3L, 5, 1, 1L, "purchase"),
      // user 2: two clicks at the SAME first instant → smaller id wins
      (5L, 3, 2, 2L, "click"), (4L, 3, 2, 2L, "click"), (6L, 6, 1, 2L, "purchase"),
      // user 3: only click is 8 days before the purchase → outside 7d lookback
      (7L, 1, 1, 3L, "click"), (8L, 9, 2, 3L, "purchase"),
      // user 4: click EXACTLY at the purchase instant → inclusive bound
      (9L, 7, 4, 4L, "click"), (10L, 7, 4, 4L, "purchase"))
    val out = Funnel.attributionFirstTouch(df).collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        (if (r.isNullAt(3)) -1L else r.getAs[Long]("first_click_id"))).toMap
    assert(out == Map(3L -> 1L, 6L -> 4L, 8L -> -1L, 10L -> 9L))
    // latency is exact micros between purchase and first click
    val lat = Funnel.attributionFirstTouch(df).collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        (if (r.isNullAt(5)) -1L else r.getAs[Long]("latency_us"))).toMap
    assert(lat(3L) == 3L * 86400000000L)
    assert(lat(10L) == 0L)
  }

  test("retention_rolling: active-later users fill intermediate offsets") {
    val df = events(
      // user 1 active in week 0 and week 2 (skips week 1)
      (1L, 1, 1, 1L, "view"), (2L, 15, 1, 1L, "view"),
      // user 2 active only in week 0
      (3L, 2, 1, 2L, "view"))
    val out = Funnel.retentionRolling(df).collect()
      .map(r => r.getAs[Long]("week_offset") -> r.getAs[Long]("n_users")).toMap
    // rolling: user 1 counts at offsets 0,1,2 (came back at-or-after each)
    assert(out == Map(0L -> 2L, 1L -> 1L, 2L -> 1L))
    // the classic matrix leaves the skipped week empty
    val classic = Funnel.retentionCohorts(df).collect()
      .map(r => r.getAs[Long]("week_offset") -> r.getAs[Long]("n_users")).toMap
    assert(classic == Map(0L -> 2L, 2L -> 1L))
  }

  test("retention_cohorts: offset 0 holds cohort size; returning users counted once per week") {
    // 2024-01-01 is a Monday. user 1 active weeks 0 and 2 (twice in week 2);
    // user 2 joins week 1, returns week 2.
    val df = events(
      (1L, 1, 1, 1L, "view"), (2L, 15, 1, 1L, "view"), (3L, 15, 2, 1L, "click"),
      (4L, 8, 1, 2L, "view"), (5L, 16, 1, 2L, "view"))
    val out = Funnel.retentionCohorts(df).collect()
      .map(r => ((r.getDate(0).toString, r.getLong(1)), r.getLong(2))).toMap
    assert(out == Map(
      ("2024-01-01", 0L) -> 1L, ("2024-01-01", 2L) -> 1L,
      ("2024-01-08", 0L) -> 1L, ("2024-01-08", 1L) -> 1L))
  }

  test("win_streak finds the longest run; ties resolve to the earliest") {
    val df = events(
      // user 1: runs {1,2,3} and {10,11} (two events on day 2 collapse)
      (1L, 1, 1, 1L, "view"), (2L, 2, 1, 1L, "view"), (3L, 2, 5, 1L, "click"),
      (4L, 3, 1, 1L, "view"), (5L, 10, 1, 1L, "view"), (6L, 11, 1, 1L, "view"),
      // user 2: runs {5,6} and {8,9} — tie, earliest start wins
      (7L, 5, 1, 2L, "view"), (8L, 6, 1, 2L, "view"),
      (9L, 8, 1, 2L, "view"), (10L, 9, 1, 2L, "view"))
    val out = graft.operators.Windows.winStreak(df).orderBy("user_id").collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 3L && out(0).getDate(2).toString == "2024-01-01"
      && out(0).getDate(3).toString == "2024-01-03")
    assert(out(1).getLong(1) == 2L && out(1).getDate(2).toString == "2024-01-05")
  }

  test("agg_grouping_sets emits exactly the two requested lattice cells") {
    val df = Seq(("A", "F", 1.0), ("A", "O", 2.0), ("B", "F", 3.0))
      .map { case (f, st, p) => (1L, 2L, 3L, 4, 1.0, p, 0.0, 0.0, f, st,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00")) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
    val out = graft.operators.Aggregates.aggGroupingSets(df).collect()
    // sets: per-flag (gid=1, status NULL) and per-status (gid=2, flag NULL)
    assert(out.map(_.getLong(2)).toSet == Set(1L, 2L))
    val perFlag = out.filter(_.getLong(2) == 1L)
    assert(perFlag.forall(_.isNullAt(1)) && perFlag.map(_.getString(0)).toSet == Set("A", "B"))
    val perStatus = out.filter(_.getLong(2) == 2L)
    assert(perStatus.forall(_.isNullAt(0)) && perStatus.map(_.getString(1)).toSet == Set("F", "O"))
    assert(out.map(_.getLong(3)).sum == 6L) // every base row counted once per set
  }

  test("win_ratio_to_report: shares within a customer sum to 1") {
    val df = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
    val sums = Windows.winRatioToReport(df)
      .groupBy("customer_id").sum("share_of_customer").collect()
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9))
  }
}
