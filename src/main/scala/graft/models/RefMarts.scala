package graft.models

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.Num
import graft.operators.CacheScope

/** The nine reference marts that previously had only shape-operator proxies
  * (r16 verdict "What's missing" #1), now registered full-fidelity: every
  * column of the reference contract, DuckDB-oracled on the same adapters.
  *
  *  - FDA events: fct_fda_events_by_gender (.sql:20-46), _by_product
  *    (.sql:18-82), _monthly (.sql:23-37) over a full-width
  *    stg_fda__food_events adapter (gender_raw/product_role/industry/
  *    month columns added to the established [[TextMarts.fdaEvents]]
  *    vocabulary scheme).
  *  - FDA recalls: fct_fda_recalls_by_state (.sql:17-168: the 56-row state
  *    name + FIPS lookups and the classification/status countif battery)
  *    and fct_fda_recalls_by_topic (.sql:13-109 via int_fda__recall_topics
  *    .sql:19-120: the 16-regex topic battery, topic arrays, pathogen/
  *    allergen rollup rows).
  *  - HN: fct_hn_weekly_stats (.sql:5-17), fct_hn_domain_stats (.sql:6-28),
  *    fct_hn_keyword_trends (.sql:8-86: the 39-keyword title battery) over
  *    a corpus-grain stg_hn__stories adapter (one story per document, so
  *    the batteries scale with the corpus instead of the 97-row thread
  *    skeleton [[TextMarts.hnStories]] serves the thread marts with).
  *  - Iowa: fct_sales_monthly (.sql:13-33) over the shared
  *    [[Marts.sales]] staging join (sale_month added).
  *
  * Numeric discipline is [[Num]]'s engine-wide scheme: exact integer
  * aggregation, fixed-order double conversion at the very end, and the
  * reference's cosmetic round(x, n) display rounding intentionally not
  * reproduced (Num scaladoc). The reference's rank()-based "top" picks get
  * a deterministic tiebreak (category/reaction name asc), the same fix
  * [[Marts.fctSalesByCounty]] documents.
  */
object RefMarts {

  // =====================================================================
  // FDA events — full-width staging adapter
  // =====================================================================

  private val genderRawDomain: Seq[String] =
    Seq("F", "FEMALE", "female", "M", "MALE", "Male", "", " ", "X")
  private val productRoles: Seq[String] =
    Seq("SUSPECT", "Suspect", "suspect", "CONCOMITANT")
  private val industries: Seq[String] =
    Seq("Bakery", "Beverage", "Ice Cream", "Snack Food", "Seafood",
      "Dietary Supplement", "Candy")

  /** stg_fda__food_events full shape (stg_fda__food_events.sql): the
    * [[TextMarts.fdaEvents]] vocabulary scheme plus the columns the three
    * events marts consume — RAW gender variants (every branch of the
    * reference's gender_clean fires: F/FEMALE/female -> Female, M/MALE/Male
    * -> Male, NULL/''/' ' -> Not Reported, 'X' -> Other), mixed-case
    * product_role (upper() filter non-vacuous both ways), a 7-value
    * industry vocabulary with planted NULLs, and a month-start date with
    * planted NULLs (the reference's IS NOT NULL month filter is real).
    */
  def fdaEventsFull(events: DataFrame): DataFrame = {
    val vocab = typedLit(TextMarts.fdaVocab)
    def pick(mul: Int, add: Int): Column =
      element_at(vocab, (pmod(col("event_id") * mul + add, lit(40)) + 1).cast("int"))
    events.select(
      col("event_id").as("report_number"),
      concat_ws(", ", pick(7, 3), pick(13, 5),
        when(pmod(col("event_id"), lit(3)) === 0, pick(17, 11))).as("reactions"),
      element_at(typedLit(TextMarts.fdaOutcomes),
        (pmod(col("event_id") * 11 + 2, lit(5)) + 1).cast("int")).as("outcomes"),
      when(pmod(col("event_id"), lit(3)) === 0, "Female")
        .when(pmod(col("event_id"), lit(3)) === 1, "Male")
        .otherwise("Unknown").as("gender"),
      when(pmod(col("event_id"), lit(10)) === 0, lit(null).cast("string"))
        .otherwise(element_at(typedLit(genderRawDomain),
          (pmod(col("event_id"), lit(9)) + 1).cast("int"))).as("gender_raw"),
      element_at(typedLit(productRoles),
        (pmod(col("event_id") * 3 + 1, lit(4)) + 1).cast("int")).as("product_role"),
      when(pmod(col("event_id"), lit(11)) === 0, lit(null).cast("string"))
        .otherwise(element_at(typedLit(industries),
          (pmod(col("event_id") * 5 + 2, lit(7)) + 1).cast("int"))).as("industry_name"),
      // synthetic event date spanning ~10 months across a year boundary
      // (the fixture's ts all land in one calendar month, which would
      // collapse the monthly mart to a single row — a date derived from the
      // id keeps the month grain real, like the HN adapter's posted days)
      year(date_add(lit("2023-09-01").cast("date"),
        pmod(col("event_id") * 31 + 7, lit(300)).cast("int"))).cast("long")
        .as("event_year"),
      when(pmod(col("event_id"), lit(13)) === 0, lit(null).cast("date"))
        .otherwise(trunc(date_add(lit("2023-09-01").cast("date"),
          pmod(col("event_id") * 31 + 7, lit(300)).cast("int")), "month"))
        .as("event_month_start"))
      // spread the 35-regex battery across cores; see TextMarts.fdaEvents
      .repartition(events.sparkSession.sparkContext.defaultParallelism,
        col("report_number"))
  }

  private[models] val fdaEventsFullSql: String = {
    val vocab = TextMarts.fdaVocab.map(v => s"'$v'").mkString("[", ", ", "]")
    val outc = TextMarts.fdaOutcomes.map(v => s"'$v'").mkString("[", ", ", "]")
    val gend = genderRawDomain.map(v => s"'$v'").mkString("[", ", ", "]")
    val role = productRoles.map(v => s"'$v'").mkString("[", ", ", "]")
    val inds = industries.map(v => s"'$v'").mkString("[", ", ", "]")
    s"""fdaf AS (
       |  SELECT event_id AS report_number,
       |         concat_ws(', ',
       |           ($vocab)[CAST((event_id * 7 + 3) % 40 AS INT) + 1],
       |           ($vocab)[CAST((event_id * 13 + 5) % 40 AS INT) + 1],
       |           CASE WHEN event_id % 3 = 0
       |                THEN ($vocab)[CAST((event_id * 17 + 11) % 40 AS INT) + 1] END) AS reactions,
       |         ($outc)[CAST((event_id * 11 + 2) % 5 AS INT) + 1] AS outcomes,
       |         CASE WHEN event_id % 3 = 0 THEN 'Female'
       |              WHEN event_id % 3 = 1 THEN 'Male'
       |              ELSE 'Unknown' END AS gender,
       |         CASE WHEN event_id % 10 = 0 THEN NULL
       |              ELSE ($gend)[CAST(event_id % 9 AS INT) + 1] END AS gender_raw,
       |         ($role)[CAST((event_id * 3 + 1) % 4 AS INT) + 1] AS product_role,
       |         CASE WHEN event_id % 11 = 0 THEN NULL
       |              ELSE ($inds)[CAST((event_id * 5 + 2) % 7 AS INT) + 1] END AS industry_name,
       |         CAST(year(DATE '2023-09-01' + CAST((event_id * 31 + 7) % 300 AS INT)) AS BIGINT) AS event_year,
       |         CASE WHEN event_id % 13 = 0 THEN NULL
       |              ELSE CAST(date_trunc('month',
       |                     DATE '2023-09-01' + CAST((event_id * 31 + 7) % 300 AS INT)) AS DATE)
       |         END AS event_month_start
       |  FROM events)""".stripMargin
  }

  /** The 35-regex reaction battery ([[TextMarts.symptoms]], the exact
    * int_fda__food_event_reactions.sql:35-80 patterns) over the full
    * staging, reduced to what the marts consume: the 6 group rollup flags,
    * has_other, reaction_count, plus the requested passthrough columns.
    * Optionally the matched-category ARRAY (with the engine's established
    * 'Other' fallback — intFdaReactions convention) for the per-category
    * explode in by_product.
    */
  private def flaggedEvents(fdaf: DataFrame, keep: Seq[String],
      withCategories: Boolean = false): DataFrame = {
    val lowered = lower(col("reactions"))
    val flagged = fdaf.select(
      (keep.map(col) :+ col("outcomes")) ++
        TextMarts.symptoms.map(s => lowered.rlike(s.pattern).as(s.flag)): _*)
    val matched = TextMarts.symptoms
      .map(s => when(col(s.flag), 1).otherwise(0)).reduce(_ + _)
    val rollups = TextMarts.groups.map { g =>
      TextMarts.symptoms.filter(_.group == g)
        .map(s => col(s.flag)).reduce(_ || _).as(s"has_$g")
    }
    // concat of singleton arrays, NOT filter(array(...)): the HOF is a
    // CodegenFallback and would interpret the whole battery projection
    // (fctFdaEventsByReaction's measured 2x) — same construction here
    val catArr = concat(TextMarts.symptoms.map(s =>
      when(col(s.flag), array(lit(s.category)))
        .otherwise(array().cast("array<string>"))): _*)
    val cats =
      if (withCategories)
        Seq(when(matched === 0, array(lit("Other"))).otherwise(catArr).as("categories"))
      else Nil
    flagged.select(
      (keep.map(col) :+ col("outcomes")) ++ rollups ++ Seq(
        (matched === 0).as("has_other"),
        when(matched === 0, 1L).otherwise(matched.cast("long")).as("reaction_count")) ++
        cats: _*)
  }

  /** Oracle twin of [[flaggedEvents]]: CTEs `flags` + `flagged` over `fdaf`. */
  private def flaggedSql(keep: Seq[String], withCategories: Boolean = false): String = {
    val keepCols = keep.mkString(", ")
    val flagCols = TextMarts.symptoms.map(s =>
      s"regexp_matches(lower(reactions), '${s.pattern}') AS ${s.flag}")
      .mkString(",\n         ")
    val matched = TextMarts.symptoms
      .map(s => s"(CASE WHEN ${s.flag} THEN 1 ELSE 0 END)").mkString(" + ")
    val rollups = TextMarts.groups.map { g =>
      TextMarts.symptoms.filter(_.group == g).map(_.flag)
        .mkString("(", " OR ", s") AS has_$g")
    }.mkString(",\n         ")
    val catList = TextMarts.symptoms
      .map(s => s"CASE WHEN ${s.flag} THEN '${s.category}' END")
      .mkString("[", ",\n            ", "]")
    val cats =
      if (withCategories)
        s""",
           |         CASE WHEN ($matched) = 0 THEN ['Other']
           |              ELSE list_filter($catList, x -> x IS NOT NULL)
           |         END AS categories""".stripMargin
      else ""
    s"""flags AS (
       |  SELECT $keepCols, outcomes,
       |         $flagCols
       |  FROM fdaf),
       |flagged AS (
       |  SELECT $keepCols, outcomes,
       |         $rollups,
       |         ($matched) = 0 AS has_other,
       |         CAST(CASE WHEN ($matched) = 0 THEN 1 ELSE ($matched) END AS BIGINT)
       |           AS reaction_count$cats
       |  FROM flags)""".stripMargin
  }

  private val reactionGroupCounts: Seq[(String, String)] = TextMarts.groups.map(g =>
    s"has_$g" -> s"${g}_count") :+ ("has_other" -> "other_count")

  /** fct_fda_events_by_gender (fct_fda_events_by_gender.sql:20-80):
    * SUSPECT-only filter, the 4-way gender_clean CASE, per-gender distinct
    * event counts, the 7 reaction-group countifs, hospitalization/death
    * distinct-report counts, and the 8 percentage columns (full-precision
    * doubles per the Num discipline).
    */
  def fctFdaEventsByGender(events: DataFrame): DataFrame = {
    val flagged = flaggedEvents(fdaEventsFull(events),
      Seq("report_number", "gender_raw", "product_role"))
      .where(upper(col("product_role")) === "SUSPECT")
      .withColumn("gender",
        when(upper(col("gender_raw")).isin("F", "FEMALE"), "Female")
          .when(upper(col("gender_raw")).isin("M", "MALE"), "Male")
          .when(col("gender_raw").isNull || trim(col("gender_raw")) === "", "Not Reported")
          .otherwise("Other"))
    val groupCounts = reactionGroupCounts.map { case (flag, out) =>
      count(when(col(flag), 1)).as(out)
    }
    val agg = flagged.groupBy(col("gender")).agg(
      countDistinct(col("report_number")).as("event_count"),
      groupCounts ++ Seq(
        countDistinct(when(col("outcomes").rlike("Hospitalization"), col("report_number")))
          .as("hospitalization_count"),
        countDistinct(when(col("outcomes").rlike("Death"), col("report_number")))
          .as("death_count")): _*)
    val pcts = (Seq("hospitalization_count") ++ reactionGroupCounts.map(_._2)).map { c =>
      Num.pct(col(c), col("event_count")).as(c.stripSuffix("_count") + "_pct")
    }
    agg.select(Seq(col("gender"), col("event_count")) ++
      reactionGroupCounts.map(c => col(c._2)) ++
      Seq(col("hospitalization_count"), col("death_count")) ++ pcts: _*)
  }

  /** fct_fda_events_by_product (fct_fda_events_by_product.sql:18-82):
    * SUSPECT + non-null industry, per-industry rollup, and the top reaction
    * per industry from the exploded category counts (row_number with a
    * deterministic category tiebreak). The flagged frame is staged once —
    * the industry rollup and the category explode both consume the 35-regex
    * battery output.
    */
  def fctFdaEventsByProduct(events: DataFrame): DataFrame = {
    val flagged = CacheScope.cached(
      flaggedEvents(fdaEventsFull(events),
        Seq("report_number", "product_role", "industry_name"), withCategories = true)
        .where(upper(col("product_role")) === "SUSPECT" && col("industry_name").isNotNull))
    // explode_outer + null-filter, not plain explode: InferFiltersFromGenerate
    // would push a size>0 filter below (categories is never empty anyway —
    // the 'Other' fallback); see fctFdaEventsByReaction
    val catCounts = flagged
      .select(col("industry_name"), explode_outer(col("categories")).as("category"))
      .where(col("category").isNotNull)
      .groupBy(col("industry_name"), col("category"))
      .agg(count(lit(1)).as("category_count"))
    val topReaction = catCounts
      .withColumn("rn", row_number().over(Window.partitionBy("industry_name")
        .orderBy(col("category_count").desc, col("category"))))
      .where(col("rn") === 1)
      .select(col("industry_name"), col("category").as("top_reaction"))
    val groupCounts = reactionGroupCounts.map { case (flag, out) =>
      count(when(col(flag), 1)).as(out)
    }
    val byIndustry = flagged.groupBy(col("industry_name")).agg(
      countDistinct(col("report_number")).as("event_count"),
      groupCounts ++ Seq(
        countDistinct(when(col("outcomes").rlike("Hospitalization"), col("report_number")))
          .as("hospitalization_count"),
        countDistinct(when(col("outcomes").rlike("Death"), col("report_number")))
          .as("death_count")): _*)
    byIndustry.join(topReaction, Seq("industry_name"), "left")
      .select(Seq(col("industry_name"), col("event_count")) ++
        reactionGroupCounts.map(c => col(c._2)) ++
        Seq(col("hospitalization_count"), col("death_count"),
          Num.pct(col("hospitalization_count"), col("event_count"))
            .as("hospitalization_pct"),
          col("top_reaction")): _*)
  }

  /** fct_fda_events_monthly (fct_fda_events_monthly.sql:23-60): calendar
    * month grain (planted-NULL months filtered like the reference), the
    * group countifs, raw Female/Male demographic counts, and the average
    * reactions per event as an exact-integer ratio.
    */
  def fctFdaEventsMonthly(events: DataFrame): DataFrame = {
    val flagged = flaggedEvents(fdaEventsFull(events),
      Seq("report_number", "gender", "event_year", "event_month_start"))
      .where(col("event_month_start").isNotNull)
    val groupCounts = reactionGroupCounts.map { case (flag, out) =>
      count(when(col(flag), 1)).as(out)
    }
    flagged.groupBy(col("event_month_start").as("month"), col("event_year").as("year"))
      .agg(
        countDistinct(col("report_number")).as("event_count"),
        groupCounts ++ Seq(
          countDistinct(when(col("outcomes").rlike("Hospitalization"), col("report_number")))
            .as("hospitalization_count"),
          countDistinct(when(col("outcomes").rlike("Death"), col("report_number")))
            .as("death_count"),
          count(when(col("gender") === "Female", 1)).as("female_count"),
          count(when(col("gender") === "Male", 1)).as("male_count"),
          sum(col("reaction_count")).as("reaction_sum"),
          count(lit(1)).as("n_rows")): _*)
      .select(Seq(col("month"), col("year"), col("event_count")) ++
        reactionGroupCounts.map(c => col(c._2)) ++
        Seq(col("hospitalization_count"), col("death_count"),
          col("female_count"), col("male_count"),
          Num.ratio(col("reaction_sum"), col("n_rows")).as("avg_reactions_per_event"),
          Num.pct(col("hospitalization_count"), col("event_count"))
            .as("hospitalization_pct")): _*)
  }

  // =====================================================================
  // FDA recalls — full-width staging + topic battery
  // =====================================================================

  /** The reference's 56-entry state lookups (fct_fda_recalls_by_state
    * .sql:18-76 names, :79-137 FIPS) — expressed as broadcast-free literal
    * MAP lookups (element_at returns NULL for an unknown code, exactly the
    * reference's LEFT JOIN semantics, with zero shuffle and full codegen).
    */
  private val stateNames: Seq[(String, String)] = Seq(
    "AL" -> "Alabama", "AK" -> "Alaska", "AZ" -> "Arizona", "AR" -> "Arkansas",
    "CA" -> "California", "CO" -> "Colorado", "CT" -> "Connecticut",
    "DE" -> "Delaware", "FL" -> "Florida", "GA" -> "Georgia", "HI" -> "Hawaii",
    "ID" -> "Idaho", "IL" -> "Illinois", "IN" -> "Indiana", "IA" -> "Iowa",
    "KS" -> "Kansas", "KY" -> "Kentucky", "LA" -> "Louisiana", "ME" -> "Maine",
    "MD" -> "Maryland", "MA" -> "Massachusetts", "MI" -> "Michigan",
    "MN" -> "Minnesota", "MS" -> "Mississippi", "MO" -> "Missouri",
    "MT" -> "Montana", "NE" -> "Nebraska", "NV" -> "Nevada",
    "NH" -> "New Hampshire", "NJ" -> "New Jersey", "NM" -> "New Mexico",
    "NY" -> "New York", "NC" -> "North Carolina", "ND" -> "North Dakota",
    "OH" -> "Ohio", "OK" -> "Oklahoma", "OR" -> "Oregon", "PA" -> "Pennsylvania",
    "RI" -> "Rhode Island", "SC" -> "South Carolina", "SD" -> "South Dakota",
    "TN" -> "Tennessee", "TX" -> "Texas", "UT" -> "Utah", "VT" -> "Vermont",
    "VA" -> "Virginia", "WA" -> "Washington", "WV" -> "West Virginia",
    "WI" -> "Wisconsin", "WY" -> "Wyoming", "DC" -> "District of Columbia",
    "PR" -> "Puerto Rico", "VI" -> "Virgin Islands", "GU" -> "Guam",
    "AS" -> "American Samoa", "MP" -> "Northern Mariana Islands")

  private val stateFips: Seq[(String, Long)] = Seq(
    "AL" -> 1L, "AK" -> 2L, "AZ" -> 4L, "AR" -> 5L, "CA" -> 6L, "CO" -> 8L,
    "CT" -> 9L, "DE" -> 10L, "FL" -> 12L, "GA" -> 13L, "HI" -> 15L, "ID" -> 16L,
    "IL" -> 17L, "IN" -> 18L, "IA" -> 19L, "KS" -> 20L, "KY" -> 21L, "LA" -> 22L,
    "ME" -> 23L, "MD" -> 24L, "MA" -> 25L, "MI" -> 26L, "MN" -> 27L, "MS" -> 28L,
    "MO" -> 29L, "MT" -> 30L, "NE" -> 31L, "NV" -> 32L, "NH" -> 33L, "NJ" -> 34L,
    "NM" -> 35L, "NY" -> 36L, "NC" -> 37L, "ND" -> 38L, "OH" -> 39L, "OK" -> 40L,
    "OR" -> 41L, "PA" -> 42L, "RI" -> 44L, "SC" -> 45L, "SD" -> 46L, "TN" -> 47L,
    "TX" -> 48L, "UT" -> 49L, "VT" -> 50L, "VA" -> 51L, "WA" -> 53L, "WV" -> 54L,
    "WI" -> 55L, "WY" -> 56L, "DC" -> 11L, "PR" -> 72L, "VI" -> 78L, "GU" -> 66L,
    "AS" -> 60L, "MP" -> 69L)

  private val recallStatuses: Seq[String] =
    Seq("Ongoing", "Terminated", "Completed", "Ongoing", "Terminated")

  /** Recall reasons vocabulary: each of the 16 topic regexes fires on at
    * least one phrase, two phrases are multi-topic (pathogen+allergen, so
    * the rollup rows differ from any single topic's count), and two match
    * nothing (empty topic arrays — the reference's unnest drops them).
    */
  private val recallReasons: Seq[String] = Seq(
    "Product may be contaminated with Listeria monocytogenes",
    "Potential Salmonella contamination discovered during routine testing",
    "Possible E. coli O157 contamination found",
    "Risk of botulism due to under processing",
    "Undeclared milk allergen present in product",
    "Undeclared eggs in snack mix",
    "Product contains undeclared peanuts",
    "Undeclared tree nuts including almond and cashew pieces",
    "Undeclared wheat and gluten in flour blend",
    "Undeclared soy lecithin in chocolate coating",
    "Undeclared fish anchovy in worcestershire sauce",
    "Undeclared shellfish shrimp paste used in flavoring",
    "Undeclared sesame seeds on bun",
    "Pieces of plastic found in frozen product",
    "Metal shavings discovered in canned goods",
    "Product is misbranded and mislabeled",
    "Incorrect label applied to wrong product",
    "Temperature abuse during transportation",
    "Packaging defect causing seal failure",
    "Quality defect reported by consumer",
    "Undeclared milk and eggs with potential salmonella risk",
    "Listeria found and product also has undeclared peanuts",
    "Glass fragments may be present in jars",
    "Norovirus contamination traced to supplier")

  /** stg_fda__recalls full shape: the real 56-code state domain (plus a
    * planted unknown 'XX' so the name/FIPS lookups' LEFT-JOIN-NULL path is
    * non-vacuous), Ongoing/Terminated/Completed status mix, firm ids, and
    * the reason vocabulary above.
    */
  /** @param spreadBattery hash-repartition so the 16-regex topic battery
    *   parallelizes past a small file's split count (see
    *   [[TextMarts.fdaEvents]]). Consumers that PRUNE reason_for_recall
    *   (by_state reads only code/class/status/date) must pass false — for
    *   them the repartition is a full corpus shuffle in front of an
    *   aggregate whose partial side already reduces to ~57 rows/partition.
    */
  def fdaRecallsFull(orders: DataFrame, spreadBattery: Boolean = true): DataFrame = {
    val k = col("o_orderkey")
    val staged = orders.select(
      k.as("recall_number"),
      when(pmod(k, lit(3)) === 0, "Class I")
        .when(pmod(k, lit(3)) === 1, "Class II")
        .otherwise("Class III").as("classification"),
      when(pmod(k, lit(53)) === 0, "XX")
        .otherwise(element_at(typedLit(stateNames.map(_._1)),
          (pmod(k, lit(56)) + 1).cast("int"))).as("state_code"),
      element_at(typedLit(recallStatuses),
        (pmod(k * 3 + 2, lit(5)) + 1).cast("int")).as("status"),
      concat(lit("Firm "), pmod(k * 11 + 5, lit(37))).as("recalling_firm"),
      element_at(typedLit(recallReasons),
        (pmod(k * 7 + 3, lit(24)) + 1).cast("int")).as("reason_for_recall"),
      col("o_orderdate").as("recall_initiation_date"))
    if (spreadBattery)
      staged.repartition(orders.sparkSession.sparkContext.defaultParallelism,
        col("recall_number"))
    else staged
  }

  private[models] val fdaRecallsFullSql: String = {
    val codes = stateNames.map(s => s"'${s._1}'").mkString("[", ", ", "]")
    val st = recallStatuses.map(s => s"'$s'").mkString("[", ", ", "]")
    val rs = recallReasons.map(s => s"'$s'").mkString("[", ",\n           ", "]")
    s"""recf AS (
       |  SELECT o_orderkey AS recall_number,
       |         CASE WHEN o_orderkey % 3 = 0 THEN 'Class I'
       |              WHEN o_orderkey % 3 = 1 THEN 'Class II'
       |              ELSE 'Class III' END AS classification,
       |         CASE WHEN o_orderkey % 53 = 0 THEN 'XX'
       |              ELSE ($codes)[CAST(o_orderkey % 56 AS INT) + 1]
       |         END AS state_code,
       |         ($st)[CAST((o_orderkey * 3 + 2) % 5 AS INT) + 1] AS status,
       |         'Firm ' || CAST((o_orderkey * 11 + 5) % 37 AS VARCHAR) AS recalling_firm,
       |         ($rs)[CAST((o_orderkey * 7 + 3) % 24 AS INT) + 1] AS reason_for_recall,
       |         o_orderdate AS recall_initiation_date
       |  FROM orders)""".stripMargin
  }

  /** fct_fda_recalls_by_state (fct_fda_recalls_by_state.sql:17-168): state
    * grain with display name + FIPS code, the classification/status countif
    * battery, and first/last recall dates.
    */
  def fctFdaRecallsByState(orders: DataFrame): DataFrame = {
    val nameMap = typedLit(stateNames.toMap)
    val fipsMap = typedLit(stateFips.toMap)
    fdaRecallsFull(orders, spreadBattery = false)
      .withColumn("state_name", element_at(nameMap, col("state_code")))
      .withColumn("fips_code", element_at(fipsMap, col("state_code")))
      .groupBy(col("state_code"), col("state_name"), col("fips_code"))
      .agg(
        count(lit(1)).as("total_recalls"),
        count(when(col("classification") === "Class I", 1)).as("class_i_recalls"),
        count(when(col("classification") === "Class II", 1)).as("class_ii_recalls"),
        count(when(col("classification") === "Class III", 1)).as("class_iii_recalls"),
        count(when(col("status") === "Ongoing", 1)).as("ongoing_recalls"),
        count(when(col("status") === "Terminated", 1)).as("terminated_recalls"),
        min(col("recall_initiation_date")).as("earliest_recall"),
        max(col("recall_initiation_date")).as("latest_recall"))
  }

  /** The int_fda__recall_topics regex battery (int_fda__recall_topics
    * .sql:28-52), mirrored verbatim — RE2-safe constructs only, evaluated
    * by BOTH engines so any `\b` disagreement would flip a flag (none do;
    * the symptom battery established the discipline).
    */
  final case class RecallTopic(flag: String, pattern: String, topic: String,
      category: String)
  private[models] val topicBattery: Seq[RecallTopic] = Seq(
    RecallTopic("is_listeria", """listeria|l\.\s*monocytogenes""", "Listeria", "Pathogen"),
    RecallTopic("is_salmonella", """salmonella""", "Salmonella", "Pathogen"),
    RecallTopic("is_ecoli", """e\.?\s*coli|escherichia""", "E. coli", "Pathogen"),
    RecallTopic("is_other_pathogen",
      """clostridium|botulism|cronobacter|hepatitis|norovirus|cyclospora""",
      "Other Pathogen", "Pathogen"),
    RecallTopic("is_milk",
      """(undeclared|unlisted|undisclosed|not\s+declar|fail.*declar|without.*list|omitted)[\w\s,]*\b(milk|dairy|cream|butter|cheese|lactose)\b|\bmilk\b.*allergen|allergen.*\bmilk\b""",
      "Milk/Dairy", "Allergen"),
    RecallTopic("is_eggs",
      """(undeclared|unlisted|undisclosed|not\s+declar|fail.*declar|without.*list|omitted)[\w\s,]*\beggs?\b|\beggs?\b.*allergen|allergen.*\beggs?\b""",
      "Eggs", "Allergen"),
    RecallTopic("is_peanuts",
      """(undeclared|unlisted|undisclosed|not\s+declar|fail.*declar|without.*list|omitted)[\w\s,]*\bpeanuts?\b|\bpeanuts?\b.*allergen|allergen.*\bpeanuts?\b""",
      "Peanuts", "Allergen"),
    RecallTopic("is_tree_nuts",
      """(undeclared|unlisted|undisclosed|not\s+declar|fail.*declar|without.*list|omitted)[\w\s,]*\b(almond|walnut|cashew|pecan|pistachio|hazelnut|macadamia|tree\s*nut)|\b(almond|walnut|cashew|pecan|pistachio).*allergen""",
      "Tree Nuts", "Allergen"),
    RecallTopic("is_wheat",
      """(undeclared|unlisted|undisclosed|not\s+declar|fail.*declar|without.*list|omitted)[\w\s,]*\b(wheat|gluten)\b|\b(wheat|gluten)\b.*allergen|allergen.*\b(wheat|gluten)\b""",
      "Wheat/Gluten", "Allergen"),
    RecallTopic("is_soy",
      """(undeclared|unlisted|undisclosed|not\s+declar|fail.*declar|without.*list|omitted)[\w\s,]*\bsoy(bean)?\b|\bsoy\b.*allergen|allergen.*\bsoy\b""",
      "Soy", "Allergen"),
    RecallTopic("is_fish",
      """(undeclared|unlisted|undisclosed|not\s+declar|fail.*declar|without.*list|omitted)[\w\s,]*\b(fish|anchov|cod|salmon|tuna|tilapia)\b""",
      "Fish", "Allergen"),
    RecallTopic("is_shellfish",
      """(undeclared|unlisted|undisclosed|not\s+declar|fail.*declar|without.*list|omitted)[\w\s,]*\b(shellfish|shrimp|crab|lobster|crustacean|crawfish|prawn)\b""",
      "Shellfish", "Allergen"),
    RecallTopic("is_sesame",
      """(undeclared|unlisted|undisclosed|not\s+declar|fail.*declar|without.*list|omitted)[\w\s,]*\bsesame\b|\bsesame\b.*allergen|allergen.*\bsesame\b""",
      "Sesame", "Allergen"),
    RecallTopic("is_foreign_material",
      """foreign\s*(material|object|matter|body)|plastic.*(piece|fragment|found|present)|metal.*(piece|fragment|shaving)|glass.*(piece|fragment)|wood.*(particle|chip|piece)""",
      "Foreign Material", "Physical"),
    RecallTopic("is_labeling",
      """mislabel|misbranded|incorrect.*label|label.*incorrect|fail.*label|label.*fail|does not (include|declare|list)|not properly.*label""",
      "Labeling", "Labeling"),
    RecallTopic("is_temperature",
      """temperature\s*(abuse|excursion)|improper.*temperature|cold chain""",
      "Temperature", "Process"))

  private val pathogenFlags =
    Set("is_listeria", "is_salmonella", "is_ecoli", "is_other_pathogen")
  private val allergenFlags = Set("is_milk", "is_eggs", "is_peanuts",
    "is_tree_nuts", "is_wheat", "is_soy", "is_fish", "is_shellfish", "is_sesame")

  /** int_fda__recall_topics (.sql:19-120): topic array + pathogen/allergen
    * rollup flags over the full recalls staging. Arrays may legitimately be
    * empty here (no 'Other' fallback — the reference's by-topic unnest
    * drops uncategorized recalls).
    */
  def intFdaRecallTopics(recalls: DataFrame): DataFrame = {
    val lowered = lower(col("reason_for_recall"))
    val flagged = recalls.select(
      Seq(col("recall_number"), col("recall_initiation_date"), col("state_code"),
        col("classification"), col("recalling_firm")) ++
        topicBattery.map(t => lowered.rlike(t.pattern).as(t.flag)): _*)
    val topicsArr = concat(topicBattery.map(t =>
      when(col(t.flag), array(lit(t.topic))).otherwise(array().cast("array<string>"))): _*)
    flagged.select(
      col("recall_number"), col("recall_initiation_date"), col("state_code"),
      col("classification"), col("recalling_firm"),
      topicsArr.as("topics"),
      topicBattery.filter(t => pathogenFlags(t.flag))
        .map(t => col(t.flag)).reduce(_ || _).as("has_pathogen"),
      topicBattery.filter(t => allergenFlags(t.flag))
        .map(t => col(t.flag)).reduce(_ || _).as("has_allergen"))
  }

  /** fct_fda_recalls_by_topic (fct_fda_recalls_by_topic.sql:13-112):
    * per-topic distinct-recall aggregates with the UI category CASE, plus
    * the two hand rollup rows (Pathogen (Any) / Allergen (Any)) computed
    * from the UN-exploded staging so multi-topic recalls aren't
    * double-counted. The topics frame is staged once — the explode and both
    * rollup arms consume the 16-regex battery output.
    */
  def fctFdaRecallsByTopic(orders: DataFrame): DataFrame = {
    val t = CacheScope.cached(intFdaRecallTopics(fdaRecallsFull(orders)))
    def aggs = Seq(
      countDistinct(col("recall_number")).as("recall_count"),
      count(when(col("classification") === "Class I", 1)).as("class_i_count"),
      count(when(col("classification") === "Class II", 1)).as("class_ii_count"),
      count(when(col("classification") === "Class III", 1)).as("class_iii_count"),
      countDistinct(col("state_code")).as("states_affected"),
      countDistinct(col("recalling_firm")).as("firms_affected"),
      min(col("recall_initiation_date")).as("earliest_recall"),
      max(col("recall_initiation_date")).as("latest_recall"))
    val catCase = topicBattery.map(b => (b.topic, b.category))
      .foldRight(lit("Other"): Column) { case ((topic, cat), acc) =>
        when(col("topic") === topic, cat).otherwise(acc)
      }
    val byTopic = t
      .select(col("recall_number"), col("recall_initiation_date"), col("state_code"),
        col("classification"), col("recalling_firm"),
        explode_outer(col("topics")).as("topic"))
      .where(col("topic").isNotNull)
      .groupBy(col("topic")).agg(aggs.head, aggs.tail: _*)
      .withColumn("topic_category", catCase)
    def rollup(flag: String, label: String, cat: String): DataFrame =
      t.where(col(flag))
        .agg(aggs.head, aggs.tail: _*)
        .withColumn("topic", lit(label))
        .withColumn("topic_category", lit(cat))
    val cols = Seq("topic", "topic_category", "recall_count", "class_i_count",
      "class_ii_count", "class_iii_count", "states_affected", "firms_affected",
      "earliest_recall", "latest_recall").map(col)
    byTopic.select(cols: _*)
      .unionByName(rollup("has_pathogen", "Pathogen (Any)", "Pathogen Rollup")
        .select(cols: _*))
      .unionByName(rollup("has_allergen", "Allergen (Any)", "Allergen Rollup")
        .select(cols: _*))
  }

  // =====================================================================
  // HN stories — corpus-grain staging + keyword trends battery
  // =====================================================================

  /** The fct_hn_keyword_trends battery (fct_hn_keyword_trends.sql:8-56),
    * mirrored verbatim like the comment-keyword battery the sentiment mart
    * carries ([[TextMarts.keywords]]) — the lookup IS the query semantics.
    */
  val trendKeywords: Seq[(String, String)] = Seq(
    "Python" -> """\bpython\b""",
    "JavaScript" -> """\bjavascript\b""",
    "Rust" -> """\brust\b""",
    "Go" -> """\bgolang\b|\bgo\s+lang""",
    "TypeScript" -> """\btypescript\b""",
    "Java" -> """\bjava\b""",
    "C++" -> """\bc\+\+\b""",
    "Ruby" -> """\bruby\b""",
    "Swift" -> """\bswift\b""",
    "Kotlin" -> """\bkotlin\b""",
    "React" -> """\breact\b""",
    "Vue" -> """\bvue\.?js\b|\bvuejs\b""",
    "Next.js" -> """\bnext\.?js\b""",
    "Node" -> """\bnode\.?js\b|\bnodejs\b""",
    "Django" -> """\bdjango\b""",
    "Rails" -> """\brails\b""",
    "AI" -> """\bai\b|\bartificial intelligence\b""",
    "LLM" -> """\bllm\b|\blarge language model""",
    "GPT" -> """\bgpt\b""",
    "ChatGPT" -> """\bchatgpt\b""",
    "OpenAI" -> """\bopenai\b""",
    "Claude" -> """\bclaude\b""",
    "Anthropic" -> """\banthropic\b""",
    "Machine Learning" -> """\bmachine learning\b|\bml\b""",
    "Kubernetes" -> """\bkubernetes\b|\bk8s\b""",
    "Docker" -> """\bdocker\b""",
    "AWS" -> """\baws\b|\bamazon web services\b""",
    "Azure" -> """\bazure\b""",
    "Cloud" -> """\bcloud\b""",
    "Crypto" -> """\bcrypto\b|\bcryptocurrency\b""",
    "Blockchain" -> """\bblockchain\b""",
    "Bitcoin" -> """\bbitcoin\b|\bbtc\b""",
    "Startup" -> """\bstartup\b""",
    "Remote Work" -> """\bremote work\b|\bwork from home\b|\bwfh\b""",
    "Open Source" -> """\bopen source\b|\bopen-source\b""",
    "Security" -> """\bsecurity\b""",
    "Privacy" -> """\bprivacy\b""",
    "Encryption" -> """\bencryption\b""",
    "Hack" -> """\bhack\b|\bhacker\b""")

  /** Title-injection vocabulary: every battery keyword fires somewhere
    * (c++17 rather than bare c++ — `\b` needs a word char after the
    * trailing +), plus non-matching fillers so unmatched titles exist.
    */
  private val titleTerms: Seq[String] = Seq(
    "python", "javascript", "rust", "golang", "typescript", "java", "c++17",
    "ruby", "swift", "kotlin", "react", "vuejs", "next.js", "nodejs", "django",
    "rails", "ai", "llm", "gpt", "chatgpt", "openai", "claude", "anthropic",
    "machine learning", "kubernetes", "docker", "aws", "azure", "cloud",
    "crypto", "blockchain", "bitcoin", "startup", "remote work", "open source",
    "security", "privacy", "encryption", "hacker", "gardening", "cooking",
    "espresso", "woodworking", "cycling")

  private val headDomains: Seq[String] = Seq(
    "github.com", "example.com", "blog.example.org", "news.site.com",
    "arxiv.org", "docs.site.io")

  /** stg_hn__stories at CORPUS grain (stg_hn__stories.sql:10-20): one story
    * per document — titles carry a text prefix plus two injected vocabulary
    * terms (the keyword battery runs against real corpus-sized input),
    * scores/authors/comment counts derived deterministically, a half-head /
    * half-long-tail domain distribution (797 tail domains, so the domain
    * mart's >=3-stories filter is genuinely selective at every sf), planted
    * NULL and '' domains, and planted NULL posted weeks.
    */
  /** @param spreadBattery see [[fdaRecallsFull]] — only the keyword-trends
    *   consumer runs the 39-regex title battery; weekly/domain stats prune
    *   the title and must not pay a corpus shuffle for it.
    */
  def hnStoriesFull(documents: DataFrame,
      spreadBattery: Boolean = true): DataFrame = {
    val id = col("doc_id")
    val terms = typedLit(titleTerms)
    def pick(mul: Int, add: Int): Column =
      element_at(terms, (pmod(id * mul + add, lit(titleTerms.size)) + 1).cast("int"))
    val postedAt = date_add(lit("2024-01-01").cast("date"), pmod(id, lit(45)).cast("int"))
    val staged = documents.select(
      id.as("story_id"),
      concat(substring(col("text"), 1, 60), lit(" "), pick(5, 1), lit(" "), pick(11, 4))
        .as("title"),
      pmod(id * 7, lit(500)).as("score"),
      pmod(id * 3 + 1, lit(40)).as("comment_count"),
      concat(lit("user"), pmod(id * 13, lit(211))).as("author"),
      when(pmod(id, lit(17)) === 0, lit(null).cast("string"))
        .when(pmod(id, lit(13)) === 0, "")
        .when(pmod(id, lit(2)) === 0, element_at(typedLit(headDomains),
          (pmod(id * 3 + 2, lit(6)) + 1).cast("int")))
        .otherwise(concat(lit("site"), pmod(id * 7 + 1, lit(797)), lit(".com")))
        .as("domain"),
      postedAt.as("posted_at"),
      when(pmod(id, lit(19)) === 0, lit(null).cast("date"))
        .otherwise(date_trunc("week", postedAt).cast("date")).as("posted_week"))
    if (spreadBattery)
      staged.repartition(documents.sparkSession.sparkContext.defaultParallelism,
        col("story_id"))
    else staged
  }

  private[models] val hnStoriesFullSql: String = {
    val terms = titleTerms.map(t => s"'$t'").mkString("[", ", ", "]")
    val doms = headDomains.map(d => s"'$d'").mkString("[", ", ", "]")
    val n = titleTerms.size
    s"""sto AS (
       |  SELECT doc_id AS story_id,
       |         substr(text, 1, 60) || ' ' ||
       |           ($terms)[CAST((doc_id * 5 + 1) % $n AS INT) + 1] || ' ' ||
       |           ($terms)[CAST((doc_id * 11 + 4) % $n AS INT) + 1] AS title,
       |         (doc_id * 7) % 500 AS score,
       |         (doc_id * 3 + 1) % 40 AS comment_count,
       |         'user' || CAST((doc_id * 13) % 211 AS VARCHAR) AS author,
       |         CASE WHEN doc_id % 17 = 0 THEN NULL
       |              WHEN doc_id % 13 = 0 THEN ''
       |              WHEN doc_id % 2 = 0
       |                THEN ($doms)[CAST((doc_id * 3 + 2) % 6 AS INT) + 1]
       |              ELSE 'site' || CAST((doc_id * 7 + 1) % 797 AS VARCHAR) || '.com'
       |         END AS domain,
       |         DATE '2024-01-01' + CAST(doc_id % 45 AS INT) AS posted_at,
       |         CASE WHEN doc_id % 19 = 0 THEN NULL
       |              ELSE CAST(date_trunc('week', DATE '2024-01-01' + CAST(doc_id % 45 AS INT)) AS DATE)
       |         END AS posted_week
       |  FROM documents)""".stripMargin
  }

  /** fct_hn_weekly_stats (fct_hn_weekly_stats.sql:5-17): weekly story
    * volume, score/comment totals and exact-ratio means, distinct authors.
    */
  def fctHnWeeklyStats(documents: DataFrame): DataFrame =
    hnStoriesFull(documents, spreadBattery = false)
      .where(col("posted_week").isNotNull)
      .groupBy(col("posted_week").as("week"))
      .agg(
        count(lit(1)).as("story_count"),
        sum(col("score")).as("total_score"),
        sum(col("comment_count")).as("total_comments"),
        countDistinct(col("author")).as("unique_authors"))
      .select(col("week"), col("story_count"), col("total_score"),
        Num.ratio(col("total_score"), col("story_count")).as("avg_score"),
        col("total_comments"),
        Num.ratio(col("total_comments"), col("story_count")).as("avg_comments"),
        col("unique_authors"))

  /** fct_hn_domain_stats (fct_hn_domain_stats.sql:6-28): week x domain
    * grain, NULL/'' domains dropped, noise-floor filter story_count >= 3.
    */
  def fctHnDomainStats(documents: DataFrame): DataFrame =
    hnStoriesFull(documents, spreadBattery = false)
      .where(col("posted_week").isNotNull && col("domain").isNotNull &&
        col("domain") =!= "")
      .groupBy(col("posted_week").as("week"), col("domain"))
      .agg(count(lit(1)).as("story_count"), sum(col("score")).as("total_score"))
      .where(col("story_count") >= 3)
      .select(col("week"), col("domain"), col("story_count"), col("total_score"),
        Num.ratio(col("total_score"), col("story_count")).as("avg_score"))

  /** fct_hn_keyword_trends (fct_hn_keyword_trends.sql:59-86): weekly
    * mention counts per battery keyword over story titles. Literal-unrolled
    * match array (codegen) + explode_outer/null-filter — the
    * [[TextMarts.intHnKeywords]] plan shape at corpus scale.
    */
  def fctHnKeywordTrends(documents: DataFrame): DataFrame = {
    val lowered = lower(col("title"))
    val kwArr = concat(trendKeywords.map { case (k, p) =>
      when(lowered.rlike(p), array(lit(k))).otherwise(array().cast("array<string>"))
    }: _*)
    hnStoriesFull(documents)
      .where(col("posted_week").isNotNull)
      .select(col("posted_week").as("week"), col("score"),
        explode_outer(kwArr).as("keyword"))
      .where(col("keyword").isNotNull)
      .groupBy(col("week"), col("keyword"))
      .agg(count(lit(1)).as("mention_count"), sum(col("score")).as("total_score"))
      .select(col("week"), col("keyword"), col("mention_count"), col("total_score"),
        Num.ratio(col("total_score"), col("mention_count")).as("avg_score"))
  }

  // =====================================================================
  // Iowa — monthly category sales
  // =====================================================================

  /** fct_sales_monthly (fct_sales_monthly.sql:13-33): month x category
    * grain over the shared 6-table [[Marts.sales]] staging join. The
    * reference's category IS NOT NULL filter is kept (vacuous on this
    * fixture — p_brand is never null — but part of the contract).
    */
  def fctSalesMonthly(sales: DataFrame): DataFrame =
    sales
      .where(col("category_name").isNotNull)
      .groupBy(col("sale_month"), col("category_name"))
      .agg(
        sum(col("sale_cents")).as("sale_cents_sum"),
        sum(col("bottles")).as("total_bottles"),
        sum(col("vol_ml")).as("vol_ml_sum"),
        count(lit(1)).as("transaction_count"),
        sum(col("retail_cents")).as("retail_cents_sum"),
        countDistinct(col("store_id")).as("store_count"))
      .select(
        col("sale_month"), col("category_name"),
        Num.dollars(col("sale_cents_sum")).as("total_sales"),
        col("total_bottles"),
        (col("vol_ml_sum").cast(DoubleType) / 1000.0).as("total_volume_liters"),
        col("transaction_count"),
        Num.meanDollars(col("retail_cents_sum"), col("transaction_count"))
          .as("avg_bottle_price"),
        col("store_count"))

  // =====================================================================
  // oracles
  // =====================================================================

  private def groupCountSql: String = reactionGroupCounts.map { case (flag, out) =>
    s"COUNT(CASE WHEN $flag THEN 1 END) AS $out"
  }.mkString(",\n         ")

  private val hospDeathSql: String =
    """COUNT(DISTINCT CASE WHEN regexp_matches(outcomes, 'Hospitalization')
      |                    THEN report_number END) AS hospitalization_count,
      |         COUNT(DISTINCT CASE WHEN regexp_matches(outcomes, 'Death')
      |                    THEN report_number END) AS death_count""".stripMargin

  private def pctSql(num: String, den: String, as: String): String =
    s"CAST($num AS DOUBLE) / CAST(NULLIF($den, 0) AS DOUBLE) * 100.0 AS $as"

  val oracles: Map[String, String] = Map(
    "fct_fda_events_by_gender" -> {
      val pcts = (Seq("hospitalization_count") ++
        reactionGroupCounts.map(_._2)).map { c =>
        pctSql(c, "event_count", c.stripSuffix("_count") + "_pct")
      }.mkString(",\n       ")
      s"""WITH $fdaEventsFullSql,
         |${flaggedSql(Seq("report_number", "gender_raw", "product_role"))},
         |cleaned AS (
         |  SELECT *,
         |         CASE WHEN upper(gender_raw) IN ('F', 'FEMALE') THEN 'Female'
         |              WHEN upper(gender_raw) IN ('M', 'MALE') THEN 'Male'
         |              WHEN gender_raw IS NULL OR trim(gender_raw) = '' THEN 'Not Reported'
         |              ELSE 'Other' END AS gender
         |  FROM flagged
         |  WHERE upper(product_role) = 'SUSPECT'),
         |by_gender AS (
         |  SELECT gender,
         |         COUNT(DISTINCT report_number) AS event_count,
         |         $groupCountSql,
         |         $hospDeathSql
         |  FROM cleaned GROUP BY 1)
         |SELECT gender, event_count,
         |       ${reactionGroupCounts.map(_._2).mkString(", ")},
         |       hospitalization_count, death_count,
         |       $pcts
         |FROM by_gender""".stripMargin
    },
    "fct_fda_events_by_product" ->
      s"""WITH $fdaEventsFullSql,
         |${flaggedSql(Seq("report_number", "product_role", "industry_name"),
            withCategories = true)},
         |suspect AS (
         |  SELECT * FROM flagged
         |  WHERE upper(product_role) = 'SUSPECT' AND industry_name IS NOT NULL),
         |cat_counts AS (
         |  SELECT industry_name, category, COUNT(*) AS category_count
         |  FROM (SELECT industry_name, unnest(categories) AS category FROM suspect)
         |  GROUP BY 1, 2),
         |top_r AS (
         |  SELECT industry_name, category AS top_reaction
         |  FROM (SELECT industry_name, category,
         |               ROW_NUMBER() OVER (PARTITION BY industry_name
         |                 ORDER BY category_count DESC, category) AS rn
         |        FROM cat_counts)
         |  WHERE rn = 1),
         |by_industry AS (
         |  SELECT industry_name,
         |         COUNT(DISTINCT report_number) AS event_count,
         |         $groupCountSql,
         |         $hospDeathSql
         |  FROM suspect GROUP BY 1)
         |SELECT bi.industry_name, bi.event_count,
         |       ${reactionGroupCounts.map(_._2).mkString(", ")},
         |       bi.hospitalization_count, bi.death_count,
         |       ${pctSql("bi.hospitalization_count", "bi.event_count", "hospitalization_pct")},
         |       tr.top_reaction
         |FROM by_industry bi
         |LEFT JOIN top_r tr ON bi.industry_name = tr.industry_name""".stripMargin,
    "fct_fda_events_monthly" ->
      s"""WITH $fdaEventsFullSql,
         |${flaggedSql(Seq("report_number", "gender", "event_year", "event_month_start"))},
         |monthly AS (
         |  SELECT event_month_start AS month, event_year AS year,
         |         COUNT(DISTINCT report_number) AS event_count,
         |         $groupCountSql,
         |         $hospDeathSql,
         |         COUNT(CASE WHEN gender = 'Female' THEN 1 END) AS female_count,
         |         COUNT(CASE WHEN gender = 'Male' THEN 1 END) AS male_count,
         |         CAST(SUM(reaction_count) AS BIGINT) AS reaction_sum,
         |         COUNT(*) AS n_rows
         |  FROM flagged
         |  WHERE event_month_start IS NOT NULL
         |  GROUP BY 1, 2)
         |SELECT month, year, event_count,
         |       ${reactionGroupCounts.map(_._2).mkString(", ")},
         |       hospitalization_count, death_count, female_count, male_count,
         |       CAST(reaction_sum AS DOUBLE) / CAST(NULLIF(n_rows, 0) AS DOUBLE)
         |         AS avg_reactions_per_event,
         |       ${pctSql("hospitalization_count", "event_count", "hospitalization_pct")}
         |FROM monthly""".stripMargin,
    "fct_fda_recalls_by_state" -> {
      val nameVals = stateNames.map { case (c, n) => s"('$c', '$n')" }
        .mkString(",\n    ")
      val fipsVals = stateFips.map { case (c, f) => s"('$c', $f)" }
        .mkString(",\n    ")
      s"""WITH $fdaRecallsFullSql,
         |state_names(sn_code, state_name) AS (VALUES
         |    $nameVals),
         |state_fips(sf_code, fips_code) AS (VALUES
         |    $fipsVals)
         |SELECT r.state_code, sn.state_name, CAST(sf.fips_code AS BIGINT) AS fips_code,
         |       COUNT(*) AS total_recalls,
         |       COUNT(CASE WHEN r.classification = 'Class I' THEN 1 END) AS class_i_recalls,
         |       COUNT(CASE WHEN r.classification = 'Class II' THEN 1 END) AS class_ii_recalls,
         |       COUNT(CASE WHEN r.classification = 'Class III' THEN 1 END) AS class_iii_recalls,
         |       COUNT(CASE WHEN r.status = 'Ongoing' THEN 1 END) AS ongoing_recalls,
         |       COUNT(CASE WHEN r.status = 'Terminated' THEN 1 END) AS terminated_recalls,
         |       MIN(r.recall_initiation_date) AS earliest_recall,
         |       MAX(r.recall_initiation_date) AS latest_recall
         |FROM recf r
         |LEFT JOIN state_names sn ON r.state_code = sn.sn_code
         |LEFT JOIN state_fips sf ON r.state_code = sf.sf_code
         |GROUP BY 1, 2, 3""".stripMargin
    },
    "fct_fda_recalls_by_topic" -> {
      val flagCols = topicBattery.map(t =>
        s"regexp_matches(lower(reason_for_recall), '${t.pattern}') AS ${t.flag}")
        .mkString(",\n         ")
      val topicList = topicBattery
        .map(t => s"CASE WHEN ${t.flag} THEN '${t.topic}' END")
        .mkString("[", ",\n            ", "]")
      val pathogen = pathogenFlags.toSeq.sorted.mkString("(", " OR ", ")")
      val allergen = allergenFlags.toSeq.sorted.mkString("(", " OR ", ")")
      val catCase = topicBattery.map(t =>
        s"WHEN topic = '${t.topic}' THEN '${t.category}'").mkString("\n         ")
      val aggCols =
        """COUNT(DISTINCT recall_number) AS recall_count,
          |         COUNT(CASE WHEN classification = 'Class I' THEN 1 END) AS class_i_count,
          |         COUNT(CASE WHEN classification = 'Class II' THEN 1 END) AS class_ii_count,
          |         COUNT(CASE WHEN classification = 'Class III' THEN 1 END) AS class_iii_count,
          |         COUNT(DISTINCT state_code) AS states_affected,
          |         COUNT(DISTINCT recalling_firm) AS firms_affected,
          |         MIN(recall_initiation_date) AS earliest_recall,
          |         MAX(recall_initiation_date) AS latest_recall""".stripMargin
      s"""WITH $fdaRecallsFullSql,
         |tflags AS (
         |  SELECT recall_number, recall_initiation_date, state_code,
         |         classification, recalling_firm,
         |         $flagCols
         |  FROM recf),
         |tarr AS (
         |  SELECT recall_number, recall_initiation_date, state_code,
         |         classification, recalling_firm,
         |         list_filter($topicList, x -> x IS NOT NULL) AS topics,
         |         $pathogen AS has_pathogen,
         |         $allergen AS has_allergen
         |  FROM tflags),
         |exploded AS (
         |  SELECT recall_number, recall_initiation_date, state_code,
         |         classification, recalling_firm, unnest(topics) AS topic
         |  FROM tarr),
         |by_topic AS (
         |  SELECT topic,
         |         $aggCols
         |  FROM exploded GROUP BY 1)
         |SELECT topic,
         |       CASE $catCase
         |            ELSE 'Other' END AS topic_category,
         |       recall_count, class_i_count, class_ii_count, class_iii_count,
         |       states_affected, firms_affected, earliest_recall, latest_recall
         |FROM by_topic
         |UNION ALL
         |SELECT 'Pathogen (Any)' AS topic, 'Pathogen Rollup' AS topic_category,
         |       $aggCols
         |FROM tarr WHERE has_pathogen
         |UNION ALL
         |SELECT 'Allergen (Any)' AS topic, 'Allergen Rollup' AS topic_category,
         |       $aggCols
         |FROM tarr WHERE has_allergen""".stripMargin
    },
    "fct_hn_weekly_stats" ->
      s"""WITH $hnStoriesFullSql
         |SELECT posted_week AS week,
         |       COUNT(*) AS story_count,
         |       CAST(SUM(score) AS BIGINT) AS total_score,
         |       CAST(SUM(score) AS DOUBLE) / CAST(NULLIF(COUNT(*), 0) AS DOUBLE) AS avg_score,
         |       CAST(SUM(comment_count) AS BIGINT) AS total_comments,
         |       CAST(SUM(comment_count) AS DOUBLE) / CAST(NULLIF(COUNT(*), 0) AS DOUBLE) AS avg_comments,
         |       COUNT(DISTINCT author) AS unique_authors
         |FROM sto
         |WHERE posted_week IS NOT NULL
         |GROUP BY 1""".stripMargin,
    "fct_hn_domain_stats" ->
      s"""WITH $hnStoriesFullSql,
         |dw AS (
         |  SELECT posted_week AS week, domain,
         |         COUNT(*) AS story_count,
         |         CAST(SUM(score) AS BIGINT) AS total_score
         |  FROM sto
         |  WHERE posted_week IS NOT NULL AND domain IS NOT NULL AND domain != ''
         |  GROUP BY 1, 2)
         |SELECT week, domain, story_count, total_score,
         |       CAST(total_score AS DOUBLE) / CAST(NULLIF(story_count, 0) AS DOUBLE) AS avg_score
         |FROM dw
         |WHERE story_count >= 3""".stripMargin,
    "fct_hn_keyword_trends" -> {
      val kwList = trendKeywords.map { case (k, p) =>
        s"CASE WHEN regexp_matches(lower(title), '$p') THEN '$k' END"
      }.mkString("[", ",\n           ", "]")
      s"""WITH $hnStoriesFullSql,
         |matches AS (
         |  SELECT posted_week AS week, score,
         |         UNNEST(list_filter(
         |           $kwList,
         |           x -> x IS NOT NULL)) AS keyword
         |  FROM sto
         |  WHERE posted_week IS NOT NULL)
         |SELECT week, keyword,
         |       COUNT(*) AS mention_count,
         |       CAST(SUM(score) AS BIGINT) AS total_score,
         |       CAST(SUM(score) AS DOUBLE) / CAST(NULLIF(COUNT(*), 0) AS DOUBLE) AS avg_score
         |FROM matches
         |GROUP BY 1, 2""".stripMargin
    },
    "fct_sales_monthly" ->
      s"""WITH ${Marts.salesSql}
         |SELECT sale_month, category_name,
         |       CAST(SUM(sale_cents) AS DOUBLE) / 100.0 AS total_sales,
         |       CAST(SUM(bottles) AS BIGINT) AS total_bottles,
         |       CAST(SUM(vol_ml) AS DOUBLE) / 1000.0 AS total_volume_liters,
         |       COUNT(*) AS transaction_count,
         |       CAST(SUM(retail_cents) AS DOUBLE) / CAST(NULLIF(COUNT(*), 0) AS DOUBLE) / 100.0
         |         AS avg_bottle_price,
         |       COUNT(DISTINCT store_id) AS store_count
         |FROM sales
         |WHERE category_name IS NOT NULL
         |GROUP BY 1, 2""".stripMargin)
}
