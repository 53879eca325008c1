package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Num
import graft.models.{Marts, ModelAdapters, TextMarts}
import graft.operators.{Aggregates, Windows}
import graft.sources.Tables

/** Executes the reference's COMPLETE dbt schema-test census ([[DbtCensus]]:
  * all 204 declarative tests from dbt/models/**/*.yml, models and sources)
  * against the graft twin of every reference model.
  *
  * 204 is the grep-grounded total over the reference ymls — 80 not_null,
  * 49 unique, 28 dbt_utils.expression_is_true, 27 dbt_utils.accepted_range,
  * 14 accepted_values, 6 relationships. (SURVEY §5.1's "208 schema tests"
  * was a pre-census estimate; this file is the per-declaration ground
  * truth, and the reference has no singular tests/ directory to add.)
  *
  * Three twin classes:
  *  - library marts/stages used verbatim (fct_stock_prices, fct_oura_daily,
  *    fdaEvents, hnComments, the ModelAdapters staging frames, ...);
  *  - spec-level views for models whose graft coverage is an operator query
  *    (rebuilt here at the reference grain from the same adapted inputs —
  *    since r17 only a handful of staging shapes remain in this class; the
  *    nine once-proxied marts now bind to their RefMarts full-fidelity
  *    implementations directly);
  *  - column RENAMES where the twin names a column differently
  *    (week → order_week) — mechanical, recorded in each twin's `cols` map.
  *
  * Entries whose check had to be semantically RE-GROUNDED for the synthetic
  * adapters (domain swaps, bound relaxations, provenance-based
  * relationships) are enumerated in [[adaptations]] with a reason each; the
  * suite asserts that exact set, so silently adding one fails the build.
  */
class DbtCensusSpec extends SparkTestBase {

  private lazy val orders = Tables.orders(spark, sf)
  private lazy val customer = Tables.customer(spark, sf)
  private lazy val supplier = Tables.supplier(spark, sf)
  private lazy val nation = Tables.nation(spark, sf)
  private lazy val part = Tables.part(spark, sf)
  private lazy val lineitem = Tables.lineitem(spark, sf)
  private lazy val events = Tables.events(spark, sf)
  private lazy val documents = Tables.documents(spark, sf)

  // ---- spec-level twin views (reference grain, adapted inputs) -----------

  /** stg_stocks__prices: OHLC at (ticker, trade_date) from the same lineitem
    * stream as Tables.prices, with coherent O/H/L/C — open = first line of
    * the day, high/low = extrema, close = floor-mean (∈ [low, high]).
    */
  private lazy val stgPrices: DataFrame = {
    val cents = Num.cents(col("l_extendedprice"))
    lineitem
      .groupBy(col("l_suppkey").as("ticker"), to_date(col("l_shipdate")).as("trade_date"))
      .agg(
        min_by(cents, struct(col("l_orderkey"), col("l_linenumber"))).as("open_price"),
        max(cents).as("high_price"),
        min(cents).as("low_price"),
        (sum(cents) / count(lit(1))).cast("long").as("close_price"),
        sum(Num.asLong(col("l_quantity"))).as("volume"))
      .join(broadcast(supplier.join(nation, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey").as("ticker"), col("n_name").as("sector"))), Seq("ticker"))
      .withColumn("price_id", concat_ws("_", col("ticker"), col("trade_date")))
  }

  /** stg_hn__stories from the comment corpus: story grain with derived
    * title/score/domain (stg_hn__stories.sql grain; scores synthetic).
    */
  private lazy val stories: DataFrame = TextMarts.hnStories(documents)

  /** stg_fda__recalls-shaped adapter (same synthesis discipline as
    * TextMarts.fdaEvents): classification hits the reference's exact
    * Class I/II/III domain.
    */
  private lazy val recalls: DataFrame = TextMarts.fdaRecalls(orders)

  /** int_fda__recall_topics: recall grain + derived topic
    * (int_fda__recall_topics.sql classifies reason text; topic synthetic).
    */
  private lazy val recallTopics: DataFrame = recalls.select(
    col("recall_number"),
    element_at(
      typedLit(Seq("contamination", "allergen", "mislabeling",
        "foreign_material", "processing", "other")),
      (pmod(col("recall_number"), lit(6)) + 1).cast("int")).as("topic"))

  private lazy val fdaEvents: DataFrame = TextMarts.fdaEvents(events)

  /** The synthetic lineitem contains exact duplicate rows (no natural key
    * exists, unlike real TPC-H), so the source-assigned ids the reference
    * staging models carry are synthesized with a deterministic per-key
    * ordinal: ties are identical rows, so the id multiset is stable.
    */
  private def lineitemWithId(idName: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    lineitem
      .withColumn("__ord", row_number().over(
        Window.partitionBy(col("l_orderkey"), col("l_linenumber"))
          .orderBy(col("l_partkey"), col("l_suppkey"), col("l_shipdate"),
            col("l_extendedprice"), col("l_quantity"), col("l_discount"),
            col("l_tax"), col("l_returnflag"), col("l_linestatus"))))
      .withColumn(idName,
        concat_ws("_", col("l_orderkey"), col("l_linenumber"), col("__ord")))
      .drop("__ord")
  }

  private lazy val reviewsWithId: DataFrame = lineitemWithId("review_id").select(
    col("review_id"),
    col("l_orderkey").as("pull_request_id"),
    col("l_suppkey").as("reviewer_id"),
    when(col("l_returnflag") === "R", "APPROVED").otherwise("COMMENTED").as("review_state"),
    col("l_shipdate").cast("timestamp").as("submitted_at"))

  private lazy val commentsWithId: DataFrame = lineitemWithId("comment_id")
    .where(col("l_linenumber") <= 2)
    .select(
      col("comment_id"),
      col("l_orderkey").as("pull_request_id"),
      (col("l_suppkey") + 1000).as("author_id"))

  private lazy val linearUsers: DataFrame = ModelAdapters.linearUsers(customer)

  private def eventRows(eventType: String): DataFrame =
    events.where(col("event_type") === eventType)
      .select(col("event_id").as("id"), to_date(col("ts")).as("day"))

  private lazy val trends: DataFrame = Tables.trends(spark, sf)
    .withColumn("trend_id", concat_ws("_", col("keyword"), col("date")))

  private lazy val salesStg: DataFrame =
    Marts.sales(lineitem, orders, customer, nation, part, supplier)

  // ---- twin registry ------------------------------------------------------

  private case class Twin(
      df: () => DataFrame,
      cols: Map[String, Column] = Map.empty,
      domains: Map[String, Seq[String]] = Map.empty)

  private lazy val nationNames: Seq[String] =
    nation.select("n_name").collect().map(_.getString(0)).toSeq
  private lazy val tickerDomain: Seq[String] =
    supplier.select(col("s_suppkey").cast("string")).collect().map(_.getString(0)).toSeq

  private lazy val twins: Map[String, Twin] = Map(
    // fda
    "int_fda__recall_topics" -> Twin(() => recallTopics),
    "int_fda__food_event_reactions" -> Twin(() => TextMarts.intFdaReactions(fdaEvents)),
    "stg_fda__food_events" -> Twin(() => fdaEvents),
    "stg_fda__recalls" -> Twin(() => recalls),
    // r17: full-fidelity marts replace the spec-level shape twins
    "fct_fda_recalls_by_state" -> Twin(() =>
      graft.models.RefMarts.fctFdaRecallsByState(orders)),
    "fct_fda_recalls_by_topic" -> Twin(() =>
      graft.models.RefMarts.fctFdaRecallsByTopic(orders)),
    "fct_fda_events_by_reaction" -> Twin(() => TextMarts.fctFdaEventsByReaction(fdaEvents)),
    "fct_fda_events_by_product" -> Twin(() =>
      graft.models.RefMarts.fctFdaEventsByProduct(events)),
    "fct_fda_events_monthly" -> Twin(() =>
      graft.models.RefMarts.fctFdaEventsMonthly(events)),
    // hacker_news
    "int_hn__comment_keywords" -> Twin(() => TextMarts.intHnKeywords(documents)),
    "int_hn__comment_sentiment" -> Twin(() => TextMarts.stgCommentSentiment(documents)),
    "stg_hn__comments" -> Twin(() => TextMarts.stgCommentSentiment(documents),
      cols = Map("posted_at" -> col("day"))),
    "stg_hn__stories" -> Twin(() => stories),
    "fct_hn_weekly_stats" -> Twin(() =>
      graft.models.RefMarts.fctHnWeeklyStats(documents)),
    "fct_hn_domain_stats" -> Twin(() =>
      graft.models.RefMarts.fctHnDomainStats(documents)),
    "fct_hn_keyword_trends" -> Twin(() =>
      graft.models.RefMarts.fctHnKeywordTrends(documents)),
    "fct_hn_keyword_sentiment" -> Twin(() => TextMarts.fctHnKeywordSentiment(documents)),
    // core / linear / github
    "dim_users" -> Twin(() => Marts.dimUsers(customer, supplier)),
    "stg_linear__issues" -> Twin(() => ModelAdapters.issues(orders),
      cols = Map("issue_id" -> col("id"), "priority" -> col("estimate")),
      domains = Map("priority" -> (0 to 7).map(_.toString))),
    "stg_linear__users" -> Twin(() => linearUsers),
    "stg_linear__cycles" -> Twin(() => ModelAdapters.cycles(spark)),
    "fct_issues" -> Twin(() => ModelAdapters.fctIssues(spark, orders, customer)),
    "stg_github__users" -> Twin(() => ModelAdapters.users(customer)),
    "stg_github__pull_requests" -> Twin(() => ModelAdapters.prs(orders),
      cols = Map("pull_request_id" -> col("id")),
      domains = Map("state" -> Seq("MERGED", "OPEN"))),
    "stg_github__pr_reviews" -> Twin(() => reviewsWithId),
    "stg_github__pr_comments" -> Twin(() => commentsWithId),
    "fct_pull_requests" -> Twin(() =>
      ModelAdapters.fctPullRequests(orders, lineitem),
      cols = Map(
        "additions" -> col("review_count"),
        "deletions" -> col("comment_count"),
        "approval_count" -> col("approved_count"))),
    "fct_reviewer_activity" -> Twin(() =>
      ModelAdapters.fctReviewerActivity(orders, lineitem),
      cols = Map("reviewer_id" -> col("participant_id"))),
    // oura
    "stg_oura__sleep" -> Twin(() => ModelAdapters.sleep(events),
      cols = Map("sleep_score" -> col("score"))),
    "stg_oura__daily_readiness" -> Twin(() => ModelAdapters.readiness(events)),
    "stg_oura__daily_activity" -> Twin(() => ModelAdapters.activity(events)),
    "stg_oura__sleep_sessions" -> Twin(() =>
      eventRows("view").select(col("id").as("sleep_session_id"), col("day"))),
    "fct_oura_daily" -> Twin(() => ModelAdapters.fctOuraDaily(events)),
    // iowa / trends / stocks — sale_id at the lineitem grain, which the
    // 6-way dim join preserves 1:1 (all dim keys unique), so uniqueness on
    // this frame is uniqueness on the staging join
    "stg_iowa_liquor__sales" -> Twin(() => lineitemWithId("sale_id")),
    "fct_sales_monthly" -> Twin(() => graft.models.RefMarts.fctSalesMonthly(salesStg)),
    "fct_sales_by_county" -> Twin(() => Marts.fctSalesByCounty(salesStg)),
    "fct_top_vendors" -> Twin(() => Marts.fctTopVendors(salesStg)),
    "stg_trends__interest_over_time" -> Twin(() => trends),
    "fct_keyword_trends" -> Twin(() =>
      graft.models.Models.fctKeywordTrends(Tables.trends(spark, sf))
        .withColumn("trend_id", concat_ws("_", col("keyword"), col("date")))),
    "stg_stocks__prices" -> Twin(() => stgPrices,
      domains = Map("ticker" -> tickerDomain, "sector" -> nationNames)),
    "fct_stock_prices" -> Twin(() => Windows.fctStockPrices(Tables.prices(spark, sf))
      .withColumn("price_id", concat_ws("_", col("ticker"), col("trade_date"))),
      cols = Map(
        "close_7d_ma" -> col("ma_7d"),
        "close_30d_ma" -> col("ma_30d"),
        "close_change_pct" -> col("daily_change_pct"))),
    "fct_sector_performance" -> Twin(() =>
      Marts.fctSectorPerformance(Tables.prices(spark, sf), supplier, nation),
      cols = Map("pct_above_30d_ma" ->
        (col("above_ma_count") * 100.0 / col("ticker_count"))),
      domains = Map("sector" -> nationNames)),
    // sources (raw_* grain = the adapter inputs)
    "raw_users" -> Twin(() => customer, cols = Map("id" -> col("c_custkey"))),
    "raw_pull_requests" -> Twin(() => orders, cols = Map("id" -> col("o_orderkey"))),
    "raw_pr_reviews" -> Twin(() => reviewsWithId, cols = Map("id" -> col("review_id"))),
    "raw_pr_comments" -> Twin(() => commentsWithId, cols = Map("id" -> col("comment_id"))),
    "raw_issues" -> Twin(() => orders, cols = Map("id" -> col("o_orderkey"))),
    "raw_cycles" -> Twin(() => ModelAdapters.cycles(spark), cols = Map("id" -> col("cycle_id"))),
    "raw_sleep" -> Twin(() => eventRows("view")),
    "raw_daily_readiness" -> Twin(() => eventRows("click")),
    "raw_daily_activity" -> Twin(() => eventRows("purchase")),
    "raw_sleep_sessions" -> Twin(() => eventRows("view")),
    "raw_prices" -> Twin(() => stgPrices, cols = Map("id" -> col("price_id"))),
    "raw_interest_over_time" -> Twin(() => trends, cols = Map("id" -> col("trend_id"))))

  // ---- adaptations (semantic re-groundings, each with its reason) --------

  /** (model, column, kind) → why the faithful check needed re-grounding on
    * the synthetic twins. Asserted exhaustively: an entry here that matches
    * no census row, or a future re-grounding missing from here, fails.
    */
  private val adaptations: Map[(String, String, String), String] = Map(
    ("stg_stocks__prices", "ticker", "accepted_values") ->
      "domain = the synthetic ticker dimension (supplier keys), not the 32 yfinance tickers",
    ("stg_stocks__prices", "sector", "accepted_values") ->
      "domain = nation names (the sector adapter), not the 5 reference sectors",
    ("fct_sector_performance", "sector", "accepted_values") ->
      "domain = nation names (the sector adapter)",
    ("fct_sector_performance", "sector", "unique") ->
      "unique on (sector, trade_date) — the twin's documented grain (Marts.fctSectorPerformance)",
    ("fct_sector_performance", "pct_above_30d_ma", "accepted_range") ->
      "derived above_ma_count*100/ticker_count (twin materializes the count, not the pct)",
    ("fct_sector_performance", "avg_daily_change_pct", "accepted_range") ->
      "lower bound only: synthetic day-sum closes can legitimately gain >100% day-over-day",
    ("fct_stock_prices", "daily_change_pct", "accepted_range") ->
      "lower bound only: synthetic closes can gain >100% day-over-day",
    ("fct_stock_prices", "close_change_pct", "accepted_range") ->
      "mapped to the twin's close-vs-prev-close pct; lower bound only (as above)",
    ("fct_stock_prices", "daily_range", "expression_is_true") ->
      "evaluated on the staging twin's high_price - low_price (fct twin keeps 52w extrema instead)",
    ("fct_pull_requests", "additions", "expression_is_true") ->
      "twin keeps review/comment counts, not diff stats; same >= 0 contract on review_count",
    ("fct_pull_requests", "deletions", "expression_is_true") ->
      "as additions, on comment_count",
    ("stg_github__pull_requests", "state", "accepted_values") ->
      "domain = the adapter's MERGED/OPEN states, not GitHub's open/closed",
    ("stg_github__pr_comments", "author_id", "relationships") ->
      "comment authors are suppliers+1000 by construction; provenance checked against supplier keys",
    ("stg_linear__issues", "priority", "accepted_values") ->
      "twin materializes estimate (0-7); same closed-small-int-domain contract",
    ("stg_iowa_liquor__sales", "sale_id", "unique") ->
      "synthetic lineitem has exact duplicate rows; id carries a deterministic per-(order,line) ordinal",
    ("stg_github__pr_reviews", "review_id", "unique") ->
      "as sale_id: ordinal-disambiguated synthetic source id",
    ("stg_github__pr_comments", "comment_id", "unique") ->
      "as sale_id: ordinal-disambiguated synthetic source id",
    ("raw_pr_reviews", "id", "unique") ->
      "as sale_id: ordinal-disambiguated synthetic source id",
    ("raw_pr_comments", "id", "unique") ->
      "as sale_id: ordinal-disambiguated synthetic source id")

  /** Redirects: census entries evaluated on a different twin's frame. */
  private val redirects: Map[(String, String), (String, Column)] = Map(
    ("fct_stock_prices", "daily_range") ->
      ("stg_stocks__prices", col("high_price") - col("low_price")))

  /** Relationship re-groundings (child expr, parent twin, parent column). */
  private val relOverrides: Map[(String, String), (Column, () => DataFrame, Column)] = Map(
    ("stg_github__pr_comments", "author_id") ->
      ((col("author_id") - 1000, () => supplier, col("s_suppkey"))))

  /** Bound relaxations for the range adaptations above. */
  private val boundsOverrides: Map[(String, String), (Double, Double)] = Map(
    ("fct_stock_prices", "daily_change_pct") -> ((-100.0, Double.MaxValue)),
    ("fct_stock_prices", "close_change_pct") -> ((-100.0, Double.MaxValue)),
    ("fct_sector_performance", "avg_daily_change_pct") -> ((-100.0, Double.MaxValue)))

  /** Composite-grain uniques for the grain adaptations above. */
  private val uniqueOverrides: Map[(String, String), Seq[Column]] = Map(
    ("fct_sector_performance", "sector") -> Seq(col("sector"), col("trade_date")))

  // ---- runner -------------------------------------------------------------

  private def resolve(twin: Twin, name: String): Column =
    twin.cols.getOrElse(name, col(name))

  private val exprPattern = "^(>=|<=|>|<|=)\\s*(.+)$".r

  private def runOne(t: DbtTest, modelDf: DataFrame, twin: Twin): Long = {
    // a redirected entry evaluates on ANOTHER twin's frame (e.g. daily_range
    // on the staging twin)
    val (df, c) = redirects.get((t.model, t.column)) match {
      case Some((twinKey, expr)) => (twins(twinKey).df(), expr)
      case None => (modelDf, resolve(twin, t.column))
    }
    t.kind match {
      case "unique" =>
        val keys = uniqueOverrides.getOrElse((t.model, t.column), Seq(c))
        df.where(keys.map(_.isNotNull).reduce(_ && _))
          .groupBy(keys: _*).count().where(col("count") > 1).count()
      case "not_null" =>
        df.where(c.isNull).count()
      case "accepted_values" =>
        val domain = twin.domains.getOrElse(t.column, t.values)
        df.where(c.isNotNull && !c.cast("string").isin(domain: _*)).count()
      case "accepted_range" =>
        val (lo, hi) = boundsOverrides.getOrElse((t.model, t.column), (t.lo, t.hi))
        df.where(c.isNotNull && (c < lo || c > hi)).count()
      case "expression_is_true" =>
        val predicate = t.expr.trim match {
          case exprPattern(op, operand) =>
            val rhs: Column = operand.trim.toDoubleOption
              .map(lit(_)).getOrElse(resolve(twin, operand.trim))
            op match {
              case ">=" => c >= rhs
              case "<=" => c <= rhs
              case ">" => c > rhs
              case "<" => c < rhs
              case "=" => c === rhs
            }
          case other => fail(s"unparsed expression_is_true: '$other'")
        }
        // dbt generates WHERE NOT (expr): NULL is not true → passes
        df.where(!predicate).count()
      case "relationships" =>
        val (childExpr, parentDf, parentCol) =
          relOverrides.getOrElse((t.model, t.column),
            (c, twins(t.relTo).df, resolve(twins(t.relTo), t.relField)))
        df.where(childExpr.isNotNull)
          .join(parentDf().select(parentCol.as("__pk")), childExpr === col("__pk"), "left_anti")
          .count()
      case other => fail(s"unknown test kind: $other")
    }
  }

  test("the complete 204-test dbt census is enumerated and green on the graft twins") {
    assert(DbtCensus.all.size == 204)
    // every adaptation must correspond to a census row
    val keys = DbtCensus.all.map(t => (t.model, t.column, t.kind)).toSet
    val orphaned = adaptations.keySet.filterNot(keys)
    assert(orphaned.isEmpty, s"adaptations without a census row: $orphaned")

    val byModel = DbtCensus.all.groupBy(_.model)
    val missingTwins = byModel.keySet.filterNot(twins.keySet)
    assert(missingTwins.isEmpty, s"census models without a twin: $missingTwins")

    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    var executed = 0
    byModel.toSeq.sortBy(_._1).foreach { case (model, tests) =>
      val twin = twins(model)
      val df = twin.df().cache()
      try {
        assert(df.head(1).nonEmpty, s"twin for $model is empty — vacuous census")
        tests.foreach { t =>
          val violations =
            try runOne(t, df, twin)
            catch { case e: Exception => failures += s"$t threw ${e.getMessage}"; -1L }
          if (violations > 0)
            failures += s"${t.model}.${t.column} ${t.kind}: $violations violating rows"
          if (violations == 0) executed += 1
        }
      } finally df.unpersist()
    }
    assert(failures.isEmpty, s"census failures (${failures.size}):\n${failures.mkString("\n")}")
    assert(executed == 204, s"executed $executed of 204")
  }
}
