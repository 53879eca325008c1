package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** `dag_full_build`: the reference's `dbt build` lifecycle as ONE Spark
  * program (Makefile:110-111, dbt/dbt_project.yml:19-26 — the reference
  * materializes its 43-model DAG with dbt; the registry's per-model queries
  * verify each model in isolation, this composes them the way a production
  * run actually executes: one driver program, one planner pass, shared
  * staging subtrees).
  *
  * The output is a per-model MANIFEST row — `(model, n_rows, key_digest)` —
  * the digest being a multiset checksum: sum over rows of the portable
  * 32-bit hash ([[PortableHash]], DuckDB-exact) of the model's exact-typed
  * columns rendered canonically (`string` verbatim, integers/dates/booleans
  * via CAST-to-string, NULL → `ø`; both engines render these types
  * identically). Double columns are excluded BY DESIGN — their values are
  * verified value-exactly by each model's own registry entry, while a
  * cross-engine string render of a double is formatting-fragile. The digest
  * therefore certifies the COMPOSITION (every model present, every row
  * multiset intact through the one-program build), not per-column float
  * equality it would re-verify redundantly.
  *
  * Scale/plan note: building all models in one plan is what lets Catalyst
  * dedup the shared staging work — the per-model queries build their
  * staging subtrees through the same code paths, so equivalent subtrees
  * canonicalize equal and `ReuseExchange`/CacheScope collapse them (the
  * prices series feeds its staging row and two stock marts, the 6-table
  * sales join feeds its staging row and two Iowa marts, the FDA regex
  * battery feeds two FDA models, the HN comment stage feeds its staging
  * row, the stories view, and two HN models). PlanAuditSpec pins the
  * effect: the one-program plan must carry FEWER exchanges than the ~45
  * models planned separately, and must contain reused subtrees.
  */
object Dag {

  /** Model → digest columns (exact-typed only: string/bigint/date/boolean).
    * For `int_fda_reactions` (49 columns, mostly a regex-flag battery whose
    * members are hash-verified by its own entry) the digest keys on the
    * grain + the category rollups rather than all 42 flags.
    */
  val digestCols: Seq[(String, Seq[String])] = Seq(
    "fct_stock_prices" -> Seq("ticker", "trade_date", "volume", "recency_rank",
      "ma_trend", "volume_trend"),
    "fct_sector_performance" -> Seq("sector", "trade_date", "ticker_count",
      "gainers", "losers", "unchanged", "high_volume_count", "low_volume_count",
      "above_ma_count", "below_ma_count", "best_performer_ticker",
      "worst_performer_ticker", "sector_sentiment"),
    "fct_sales_by_county" -> Seq("county", "total_bottles", "transaction_count",
      "store_count", "top_category"),
    "fct_top_vendors" -> Seq("vendor_name", "total_bottles", "product_count",
      "store_count", "top_product"),
    "dim_users" -> Seq("user_id", "email", "linear_user_id",
      "linear_display_name", "linear_name", "linear_is_active", "github_user_id",
      "github_username", "github_name", "github_avatar_url", "display_name",
      "source"),
    "fct_issues" -> Seq("issue_id", "identifier", "title", "state", "estimate",
      "assignee_name", "cycle_name", "labels", "parent_identifier",
      "parent_title", "is_child", "is_parent", "child_count", "is_active_cycle",
      "days_since_created"),
    "fct_pull_requests" -> Seq("pull_request_id", "title", "state", "author_id",
      "merged", "review_count", "approved_count", "comment_count",
      "hours_to_merge", "hours_to_first_review"),
    "fct_reviewer_activity" -> Seq("participant_id", "pull_request_id",
      "review_count", "comment_count", "author_id"),
    "fct_oura_daily" -> Seq("day", "sleep_score", "readiness_score",
      "activity_score", "steps", "sleep_category", "readiness_category",
      "activity_category"),
    "fct_keyword_trends" -> Seq("keyword", "date", "interest", "wow_change",
      "mom_change", "is_local_peak"),
    "int_fda_reactions" -> Seq("report_number", "reactions", "outcomes",
      "gender", "event_year", "reaction_categories", "reaction_count"),
    "fct_fda_events_by_reaction" -> Seq("reaction", "reaction_category",
      "event_count", "female_count", "male_count", "hospitalization_count",
      "death_count", "first_year", "last_year"),
    "int_hn_keywords" -> Seq("comment_id", "story_id", "day", "keyword"),
    "fct_hn_keyword_sentiment" -> Seq("keyword", "day", "comment_count",
      "story_count"),
    "hn_thread_resolve" -> Seq("comment_id", "root_comment_id", "thread_depth",
      "story_id"),
    "hn_thread_stats" -> Seq("root_comment_id", "story_id", "comment_count",
      "max_depth", "direct_replies"),
    // ---- r17: the nine once-proxied models now build FULL-FIDELITY in the
    // DAG (RefMarts); double-typed aggregates (pcts, avgs, total_sales)
    // are excluded per the digest contract above.
    "fct_fda_events_by_gender" -> Seq("gender", "event_count",
      "gastrointestinal_count", "allergic_count", "respiratory_count",
      "cardiovascular_count", "neurological_count", "systemic_count",
      "other_count", "hospitalization_count", "death_count"),
    "fct_fda_events_by_product" -> Seq("industry_name", "event_count",
      "gastrointestinal_count", "allergic_count", "respiratory_count",
      "cardiovascular_count", "neurological_count", "systemic_count",
      "other_count", "hospitalization_count", "death_count", "top_reaction"),
    "fct_fda_events_monthly" -> Seq("month", "year", "event_count",
      "gastrointestinal_count", "allergic_count", "respiratory_count",
      "cardiovascular_count", "neurological_count", "systemic_count",
      "other_count", "hospitalization_count", "death_count", "female_count",
      "male_count"),
    "fct_fda_recalls_by_state" -> Seq("state_code", "state_name", "fips_code",
      "total_recalls", "class_i_recalls", "class_ii_recalls",
      "class_iii_recalls", "ongoing_recalls", "terminated_recalls",
      "earliest_recall", "latest_recall"),
    "fct_fda_recalls_by_topic" -> Seq("topic", "topic_category",
      "recall_count", "class_i_count", "class_ii_count", "class_iii_count",
      "states_affected", "firms_affected", "earliest_recall", "latest_recall"),
    "fct_hn_weekly_stats" -> Seq("week", "story_count", "total_score",
      "total_comments", "unique_authors"),
    "fct_hn_domain_stats" -> Seq("week", "domain", "story_count", "total_score"),
    "fct_hn_keyword_trends" -> Seq("week", "keyword", "mention_count",
      "total_score"),
    "fct_sales_monthly" -> Seq("sale_month", "category_name", "total_bottles",
      "transaction_count", "store_count"),
    // the two intermediates still keyed by the operator query that IS the
    // model's shape (round 12 scheme; dbt_project.yml:19-26)
    "udf_sentiment" -> Seq("doc_id", "sentiment_label",
      "sentiment_category"), // int_hn__comment_sentiment
    "arr_build_filtered" -> Seq("part_id", "labels_str",
      "label_count")) // int_fda__recall_topics (flag→label array build)

  /** One digest row for `df` under `name` (shared by fullBuild and the
    * per-model plan audit).
    */
  def digestRow(name: String, df: DataFrame, cols: Seq[String]): DataFrame = {
    val rendered = cols.map(c => coalesce(col(c).cast("string"), lit("ø")))
    df.select(PortableHash.hash32(concat_ws("|", rendered: _*)).as("__h"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("__h")), lit(0L)).as("key_digest"))
      .select(lit(name).as("model"), col("n_rows"), col("key_digest"))
  }

  /** The whole DAG, one program: every model — the 18 staging views of
    * [[StagingModels.census]] plus every mart/intermediate — built from the
    * raw inputs via the registry's own closures (staging via the same
    * builder functions the marts consume), reduced to its manifest row,
    * unioned — the reference's complete `dbt build`. Census note: the
    * reference tree on disk holds 43 model .sql files (18 staging /
    * 4 intermediate / 21 marts, counted per `find dbt/models -name
    * '*.sql'`); SURVEY §5.1's "45 (19/4/22)" was an off-by-two census,
    * adjudicated in the r15 verdict. All 43 on-disk models are covered.
    *
    * CacheScope's retention bound is raised for the build (the models
    * register ~10 staged frames between them; at the default bound of 4 the
    * early stages — the sales join, the oura dailies — would be evicted
    * before the single execution ever runs, silently recomputing). Restored
    * after: the bound is consulted at registration time, so the staged
    * frames themselves survive until other queries register past them.
    */
  def fullBuild(spark: SparkSession, sfDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame]): DataFrame = {
    val prev = spark.conf.getOption("spark.graft.staging.keep")
    spark.conf.set("spark.graft.staging.keep",
      3 * (digestCols.size + StagingModels.census.size))
    try {
      // One SHARED final aggregate for all ~45 manifest rows (r17, guide
      // §2.4 "remove shuffles outright"): the historical form aggregated
      // each model separately — 45 global aggregates, each paying its own
      // SinglePartition exchange and AQE stage barrier — then unioned the
      // 45 one-row frames. Instead each model contributes raw
      // (model, __h) rows to ONE union; partial aggregation reduces every
      // map partition to ≤45 rows before a single hash exchange on
      // `model`, and one final aggregate emits the manifest. Measured at
      // sf0.1/local[32]: 45 Exchange nodes fewer (plans/r17/
      // dag_full_build_{before,after}.txt), same rows. The per-model
      // [[digestRow]] stays — it is the per-model plan-audit surface and
      // the `separate` baseline the DAG pin compares against.
      // GRAFT_DAG_DEBUG=1 prints per-model construction time (the DAG's
      // wall is ~95% driver-side construction — analyzer passes + the
      // eager pointer-doubling loops — not execution; measured r17)
      def timed[T](name: String)(body: => T): T =
        if (!sys.env.contains("GRAFT_DAG_DEBUG")) body
        else {
          val t0 = System.nanoTime()
          val r = body
          System.err.println(f"[dag] construct $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
          r
        }
      // Parallel model construction (r17, guide §2.6 "overlap independent
      // jobs", applied to the DRIVER side): the DAG's wall is ~95%
      // DataFrame construction — analyzer passes over 45 model plans plus
      // the eager pointer-doubling loops — measured 9-19 s construct vs
      // 0.3-0.7 s action at sf0.1. The models are independent, Spark's
      // analyzer and scheduler are driver-thread-safe (CacheScope is
      // synchronized; the one session-conf window, hnThreadResolve's, is
      // serialized behind its own lock), so build them on a small pool and
      // let the eager loops' tiny jobs backfill each other. The two thread
      // models additionally share ONE resolve: the stats rollup reads the
      // same materialized forest instead of re-running the loop (intra-
      // query staging, the sales-feeds-two-marts discipline).
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(8, Runtime.getRuntime.availableProcessors()))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      val perModel: Seq[(String, DataFrame, Seq[String])] =
        try {
          lazy val resolveF = Future(timed("hn_thread_resolve")(
            TextMarts.hnThreadResolve(graft.sources.Tables.documents(spark, sfDir))))
          def buildF(name: String): Future[DataFrame] = name match {
            case "hn_thread_resolve" => resolveF
            case "hn_thread_stats" =>
              resolveF.map(r => timed(name)(TextMarts.hnThreadStatsFrom(r)))
            case _ => Future(timed(name)(queries(name)(spark, sfDir)))
          }
          val futures: Seq[(String, Future[DataFrame], Seq[String])] =
            StagingModels.census.map(e =>
              (e.name, Future(timed(e.name)(e.build(spark, sfDir))), e.digest)) ++
              digestCols.map { case (name, cols) => (name, buildF(name), cols) }
          futures.map { case (n, f, cols) => (n, Await.result(f, Duration.Inf), cols) }
        } finally pool.shutdown()
      // balanced union tree: a left-fold union re-analyzes a growing plan
      // (the k-th union pays analyzer passes over all k earlier subtrees —
      // O(n²) across 45 large model plans, measured as multi-second
      // construction time); pairing halves keeps each subtree analyzed
      // O(log n) times
      def unionTree(dfs: Seq[DataFrame]): DataFrame =
        if (dfs.size == 1) dfs.head
        else unionTree(dfs.grouped(2).map {
          case Seq(a, b) => a.union(b)
          case Seq(a) => a
        }.toSeq)
      val hashed = unionTree(perModel.map { case (name, df, cols) =>
        val rendered = cols.map(c => coalesce(col(c).cast("string"), lit("ø")))
        df.select(lit(name).as("model"),
          PortableHash.hash32(concat_ws("|", rendered: _*)).as("__h"))
      })
      val grouped = hashed.groupBy(col("model"))
        .agg(count(lit(1)).as("n_rows"),
          coalesce(sum(col("__h")), lit(0L)).as("key_digest"))
      // a zero-row model contributes no group; restore its (model, 0, 0)
      // row so the manifest contract (one row per model, like the oracle's
      // per-model UNION ALL) is scale-independent. `grouped` is ≤45 rows —
      // broadcast it so the name grid never shuffles.
      import spark.implicits._
      val names = perModel.map(_._1).toDF("model")
      names.join(broadcast(grouped), Seq("model"), "left")
        .select(col("model"),
          coalesce(col("n_rows"), lit(0L)).as("n_rows"),
          coalesce(col("key_digest"), lit(0L)).as("key_digest"))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.graft.staging.keep", v)
      case None => spark.conf.unset("spark.graft.staging.keep")
    }
  }

  /** One model's DuckDB manifest-row twin over its standalone base SQL. */
  private def digestSql(name: String, cols: Seq[String], baseSql: String): String = {
    val concat = "concat_ws('|', " +
      cols.map(c => s"COALESCE(CAST($c AS VARCHAR), 'ø')").mkString(", ") + ")"
    s"""SELECT '$name' AS model, COUNT(*) AS n_rows,
       |       COALESCE(CAST(SUM(${PortableHash.duckSql("__k")}) AS BIGINT), 0) AS key_digest
       |FROM (SELECT $concat AS __k FROM ($baseSql) __m) __h""".stripMargin
  }

  /** DuckDB twin: the same manifest from the same per-model oracle SQL. */
  def oracle(base: Map[String, String]): String =
    (StagingModels.census.map(e => digestSql(e.name, e.digest, e.oracle)) ++
      digestCols.map { case (name, cols) => digestSql(name, cols, base(name)) })
      .mkString("\nUNION ALL\n")
}
