package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.functions._
import graft.models.Models
import graft.quality.Checks
import graft.quality.Checks._

/** Reference-shaped fixtures (FIXTURES.md §1-2, mirroring the reference's
  * pytest mocks tests/test_streamlit_pages.py:19-88) driven through the mart
  * models, with the edge values the reference handles: NULL assignees,
  * orphan parents, negative review latencies, multi-source days.
  */
class ModelsSpec extends SparkTestBase {
  import spark.implicits._

  private val asof = to_timestamp(lit("2025-02-01 00:00:00"))

  test("dim_users resolves identity across systems with provenance") {
    val linear = Seq(
      ("l1", "Alice@x.com", "Alice"),
      ("l2", "bob@x.com", "Bob")).toDF("user_id", "email", "name")
    val github = Seq(
      ("g1", "alice@X.COM", "alice-gh"),
      ("g3", "carol@x.com", "Carol")).toDF("user_id", "email", "name")
    val out = Models.dimUsers(linear, github).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(3))).toMap
    assert(out("l1") == (("Alice", "both"))) // matched case-insensitively, linear name wins
    assert(out("l2") == (("Bob", "linear")))
    assert(out("gh_g3") == (("Carol", "github"))) // fallback key prefix
  }

  test("fct_issues: parent/child flags, active cycle, days since created") {
    val issues = Seq(
      ("i1", "DDX-1", "Parent issue", "In Progress", 3.0, "u1", "c1", null,
        Timestamp.valueOf("2025-01-01 00:00:00"), Seq("bug")),
      ("i2", "DDX-2", "Child issue", "Todo", 1.0, null, "c1", "i1",
        Timestamp.valueOf("2025-01-22 00:00:00"), Seq.empty[String])
    ).toDF("id", "identifier", "title", "state", "estimate", "assignee_id", "cycle_id",
      "parent_id", "created_at", "labels")
    val users = Seq(("u1", "Alice")).toDF("user_id", "name")
    val cycles = Seq(("c1", "Sprint 1",
      Timestamp.valueOf("2025-01-20 00:00:00"), Timestamp.valueOf("2025-02-03 00:00:00")))
      .toDF("cycle_id", "name", "starts_at", "ends_at")

    val out = Models.fctIssues(issues, users, cycles, asof)
    val byId = out.collect().map(r => r.getString(0) -> r).toMap
    assert(byId("i1").getAs[Boolean]("is_parent") && !byId("i1").getAs[Boolean]("is_child"))
    assert(byId("i2").getAs[Boolean]("is_child") && byId("i2").getAs[String]("parent_title") == "Parent issue")
    assert(byId("i2").getAs[String]("assignee_name") == null) // NULL assignee survives left join
    assert(byId("i1").getAs[Boolean]("is_active_cycle")) // asof inside sprint window
    assert(byId("i1").getAs[Long]("days_since_created") == 31L)
    Checks.assertAll(Seq(
      unique(out, "issue_id"),
      acceptedRange(out, "child_count", 0, 1e9)))
  }

  test("fct_pull_requests: conditional counts and negative first-review latency") {
    val prs = Seq(
      (10L, "PR ten", "closed", "a1",
        Timestamp.valueOf("2025-01-01 00:00:00"), Timestamp.valueOf("2025-01-02 00:00:00"),
        Timestamp.valueOf("2025-01-03 12:30:00"))
    ).toDF("id", "title", "state", "author_id", "created_at", "ready_for_review_at", "merged_at")
    val reviews = Seq(
      (10L, "r1", "APPROVED", Timestamp.valueOf("2025-01-01 06:00:00")), // BEFORE ready_for_review
      (10L, "r2", "COMMENTED", Timestamp.valueOf("2025-01-02 08:00:00"))
    ).toDF("pull_request_id", "reviewer_id", "state", "submitted_at")
    val comments = Seq((10L, "r2")).toDF("pull_request_id", "author_id")

    val row = Models.fctPullRequests(prs, reviews, comments).collect().head
    assert(row.getAs[Long]("review_count") == 2L)
    assert(row.getAs[Long]("approved_count") == 1L)
    assert(row.getAs[Boolean]("merged"))
    assert(row.getAs[Long]("hours_to_merge") == 60L) // 60.5h truncates toward zero
    assert(row.getAs[Long]("hours_to_first_review") == -18L) // negative, trunc toward zero
  }

  test("fct_reviewer_activity excludes self-reviews, unions participants") {
    val reviews = Seq((10L, "alice"), (10L, "author")).toDF("pull_request_id", "reviewer_id")
    val comments = Seq((10L, "bob"), (10L, "alice")).toDF("pull_request_id", "author_id")
    val prs = Seq((10L, "author")).toDF("id", "author_id")
    val out = Models.fctReviewerActivity(reviews, comments, prs)
    val parts = out.select("participant_id").as[String].collect().toSet
    assert(parts == Set("alice", "bob")) // author's own review excluded
    val alice = out.where($"participant_id" === "alice").collect().head
    assert(alice.getAs[Long]("review_count") == 1L && alice.getAs[Long]("comment_count") == 1L)
  }

  test("fct_oura_daily: spine keeps partial days, null-aware combined score") {
    val sleep = Seq((Date.valueOf("2025-01-01"), 80L), (Date.valueOf("2025-01-02"), 90L))
      .toDF("day", "score")
    val readiness = Seq((Date.valueOf("2025-01-01"), 70L)).toDF("day", "score")
    val activity = Seq((Date.valueOf("2025-01-03"), 60L, 10500L))
      .toDF("day", "score", "steps")
    val out = Models.fctOuraDaily(sleep, readiness, activity)
    val byDay = out.collect().map(r => r.getDate(0).toString -> r).toMap
    assert(byDay.keySet == Set("2025-01-01", "2025-01-02", "2025-01-03"))
    assert(byDay("2025-01-01").getAs[Double]("combined_wellness_score") == 75.0) // (80+70)/2
    assert(byDay("2025-01-02").getAs[Double]("combined_wellness_score") == 90.0) // sleep only
    assert(byDay("2025-01-03").getAs[String]("activity_category") == "very_active")
    Checks.assertAll(Seq(unique(out, "day"),
      acceptedValues(out, "sleep_category", Seq("excellent", "good", "fair", "poor")),
      acceptedRange(out, "combined_wellness_score", 0, 100)))
  }

  test("fct_keyword_trends over the testdata trends adapter holds invariants") {
    val out = Models.fctKeywordTrends(graft.sources.Tables.trends(spark, sf))
    Checks.assertAll(Seq(
      unique(out, "keyword", "date"),
      notNull(out, "interest"),
      expressionIsTrue(out, "avg7 positive", col("avg_7d") > 0),
      expressionIsTrue(out, "local peak implies >= own interest",
        !col("is_local_peak") || col("interest") >= col("avg_7d") - 1e9)))
  }

  test("FDA battery word-boundary traps: BRASH/COUGHING/FEVERISH do not match") {
    val fda = Seq(
      (1L, "BRASH, COUGHING, FEVERISH", "Other", "Male", 2024L),
      (2L, "RASH, COUGH, FEVER", "Other", "Male", 2024L)
    ).toDF("report_number", "reactions", "outcomes", "gender", "event_year")
    val out = graft.models.TextMarts.intFdaReactions(fda).collect()
      .map(r => r.getAs[Long]("report_number") -> r).toMap
    assert(!out(1L).getAs[Boolean]("is_rash") && !out(1L).getAs[Boolean]("is_cough") &&
      !out(1L).getAs[Boolean]("is_fever"), "trap words must not match \\b patterns")
    assert(out(1L).getAs[String]("reaction_categories") == "Other")
    assert(out(2L).getAs[Boolean]("is_rash") && out(2L).getAs[Boolean]("is_cough") &&
      out(2L).getAs[Boolean]("is_fever"))
    assert(out(2L).getAs[Long]("reaction_count") == 3L)
  }

  test("FDA fct: rollup counts bound individual categories; pct in range") {
    // assert on collected rows: stacking Checks' extra aggregations on top of
    // the 5-distinct-agg Expand plan blows planning memory in the shared
    // test JVM (the query itself is driver-verified at sf0.01)
    val rows = graft.models.TextMarts.fctFdaEventsByReaction(
      graft.models.TextMarts.fdaEvents(graft.sources.Tables.events(spark, sf))).collect()
    assert(rows.map(_.getAs[String]("reaction")).distinct.length == rows.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("female_count") + r.getAs[Long]("male_count") <=
        r.getAs[Long]("event_count"))
      val pct = r.getAs[Double]("hospitalization_pct")
      assert(pct >= 0.0 && pct <= 100.0)
    }
    assert(rows.length >= 30, "battery should surface >= 30 distinct reactions")
  }

  test("HN keyword battery traps: metadata/pineapple/frustrated/devops do not match") {
    val docs = Seq(
      (1L, "reading metadata about pineapple while frustrated with devops"),
      (2L, "meta ships an apple rust dev tool")
    ).toDF("doc_id", "text")
    // adapter appends vocab terms; isolate battery behavior via raw matcher
    val kws = graft.models.TextMarts.keywords
    def matches(t: String): Set[String] =
      kws.filter { case (_, p) => java.util.regex.Pattern.compile(p).matcher(t).find() }
        .map(_._1).toSet
    val trapHits = matches("reading metadata about pineapple while frustrated with devops")
    assert(!trapHits.contains("Meta") && !trapHits.contains("Apple") &&
      !trapHits.contains("Rust") && !trapHits.contains("Developer"), s"traps hit: $trapHits")
    val realHits = matches("meta ships an apple rust dev tool")
    assert(realHits.contains("Meta") && realHits.contains("Apple") &&
      realHits.contains("Rust") && realHits.contains("Developer"))
  }

  test("fct_hn_keyword_sentiment invariants over testdata") {
    val rows = graft.models.TextMarts.fctHnKeywordSentiment(
      graft.sources.Tables.documents(spark, sf)).collect()
    assert(rows.map(r => (r.getAs[String]("keyword"), r.getAs[java.sql.Date]("day")))
      .distinct.length == rows.length)
    rows.foreach { r =>
      val (pos, neg, neu) = (r.getAs[Double]("positive_pct"),
        r.getAs[Double]("negative_pct"), r.getAs[Double]("neutral_pct"))
      assert(pos >= 0 && pos <= 100)
      assert(math.abs(pos + neg + neu - 100.0) < 1e-9, s"pct split $pos+$neg+$neu")
      assert(r.getAs[Double]("avg_sentiment") >= r.getAs[Double]("min_sentiment") - 0.001)
      assert(r.getAs[Double]("avg_sentiment") <= r.getAs[Double]("max_sentiment") + 0.001)
    }
    assert(rows.map(_.getAs[String]("keyword")).distinct.length >= 40,
      "battery should surface >= 40 distinct keywords")
  }

  test("hn_thread_resolve matches a sequential walk of the synthetic tree") {
    // independent ground truth: the same parent arithmetic walked one hop at
    // a time in plain Scala (the O(depth) algorithm the doubling loop replaces)
    def parent(id: Long): Option[Long] = {
      val step = id - (1 + id % 3)
      if (id % 23 == 0 || step < 0) None else Some(step)
    }
    def walk(id: Long): (Long, Long) = {
      var cur = id; var depth = 0L
      while (parent(cur).isDefined) { cur = parent(cur).get; depth += 1 }
      (cur, depth)
    }
    val rows = graft.models.TextMarts.hnThreadResolve(
      graft.sources.Tables.documents(spark, sf)).collect()
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    assert(rows.length == docs.length, "one resolved row per comment")
    val maxDepth = rows.map(_.getAs[Long]("thread_depth")).max
    assert(maxDepth >= 4, s"tree must be deep enough to need doubling (max=$maxDepth)")
    rows.foreach { r =>
      val id = r.getAs[Long]("comment_id")
      val (root, depth) = walk(id)
      assert(r.getAs[Long]("root_comment_id") == root, s"root of $id")
      assert(r.getAs[Long]("thread_depth") == depth, s"depth of $id")
      assert(r.getAs[Long]("story_id") == root % 97, s"story of $id")
      assert(parent(root).isEmpty, s"resolved root $root must be top-level")
    }
  }

  test("hn_thread_stats rolls up the sequential-walk ground truth") {
    def parent(id: Long): Option[Long] = {
      val step = id - (1 + id % 3)
      if (id % 23 == 0 || step < 0) None else Some(step)
    }
    def root(id: Long): Long = parent(id).map(root).getOrElse(id)
    def depth(id: Long): Long = parent(id).map(depth(_) + 1).getOrElse(0L)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    val expected = docs.groupBy(root).map { case (r, ids) =>
      r -> ((ids.length.toLong, ids.map(depth).max,
        ids.count(i => depth(i) == 1).toLong))
    }
    val rows = graft.models.TextMarts.hnThreadStats(
      graft.sources.Tables.documents(spark, sf)).collect()
    assert(rows.length == expected.size, "one row per thread root")
    rows.foreach { r =>
      val rid = r.getAs[Long]("root_comment_id")
      val (n, d, dr) = expected(rid)
      assert(r.getAs[Long]("comment_count") == n, s"size of thread $rid")
      assert(r.getAs[Long]("max_depth") == d, s"max depth of thread $rid")
      assert(r.getAs[Long]("direct_replies") == dr, s"fan-out of thread $rid")
      assert(r.getAs[Long]("story_id") == rid % 97, s"story of thread $rid")
    }
  }

  test("sector performance: counts partition tickers; sentiment consistent") {
    val rows = graft.models.Marts.fctSectorPerformance(
      graft.sources.Tables.prices(spark, sf),
      graft.sources.Tables.supplier(spark, sf),
      graft.sources.Tables.nation(spark, sf)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("gainers") + r.getAs[Long]("losers") +
        r.getAs[Long]("unchanged") <= r.getAs[Long]("ticker_count"))
      val pctMa = r.getAs[Double]("pct_above_30d_ma")
      assert(pctMa >= 0 && pctMa <= 100)
      assert(Seq("bullish", "bearish", "neutral").contains(r.getAs[String]("sector_sentiment")))
      assert(r.getAs[Double]("best_performer_pct") >= r.getAs[Double]("worst_performer_pct"))
    }
  }

  test("dim_users: provenance and key fallback") {
    val rows = graft.models.Marts.dimUsers(
      graft.sources.Tables.customer(spark, sf), graft.sources.Tables.supplier(spark, sf))
      .collect()
    assert(rows.map(_.getAs[String]("user_id")).distinct.length == rows.length)
    rows.foreach { r =>
      assert(r.getAs[String]("display_name") != null)
      val src = r.getAs[String]("source")
      assert(Seq("both", "linear", "github").contains(src))
      if (src == "github") assert(r.getAs[String]("user_id").startsWith("gh_"))
    }
    assert(rows.count(_.getAs[String]("source") == "both") > 0,
      "email overlap must produce 'both' rows")
  }
}
