package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators._

/** Per-operator unit tests on tiny in-memory frames — NULL edges the
  * reference encodes (SURVEY §5.2): IS NOT TRUE, safe divide, least
  * null-skip, conditional distinct counts, dedup ordering, window frames.
  */
class OperatorSpec extends SparkTestBase {
  import spark.implicits._

  test("filter_not_true keeps NULL and false rows (BQ IS NOT TRUE)") {
    val df = Seq(
      (1L, 7L, "a", 200.0), // flagged=true  -> dropped
      (2L, 7L, "a", 120.0), // flagged=NULL  -> kept
      (3L, 7L, "a", 50.0) //   flagged=false -> kept
    ).toDF("event_id", "user_id", "event_type", "value")
    val kept = Staging.filterNotTrue(df).select("event_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("win_dedup keeps latest row per key with id tiebreak") {
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 5L, "click", 1.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-02 10:00:00"), 5L, "click", 2.0, "{}"),
      (3L, Timestamp.valueOf("2024-01-02 10:00:00"), 5L, "click", 3.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Windows.winDedup(df).collect()
    assert(out.length == 1 && out.head.getLong(0) == 3L) // same ts -> higher id wins
  }

  test("rolling average window is ROWS-based with partial leading frames") {
    val prices = Seq(
      (1L, "2024-01-01", 100L), (1L, "2024-01-05", 200L), (1L, "2024-01-20", 600L)
    ).map { case (t, d, c) => (t, java.sql.Date.valueOf(d), c, c, c, 1L) }
      .toDF("ticker", "trade_date", "close_cents", "high_cents", "low_cents", "volume")
    val out = Windows.winRollingAvg(prices).orderBy("trade_date")
      .select("ma_7d").as[Double].collect()
    // 1.00 ; (1+2)/2 ; (1+2+6)/3 dollars — calendar gaps intentionally ignored
    assert(out.toSeq == Seq(1.0, 1.5, 3.0))
  }

  test("agg_count_distinct_if excludes NULLs from the distinct set") {
    val df = Seq(
      (1L, 10L, "F", 100.0, "1998-01-01"),
      (2L, 10L, "O", 100.0, "1998-01-02"),
      (3L, 11L, "F", 100.0, "1998-01-03"),
      (4L, 11L, "F", 100.0, "1998-01-04")
    ).map { case (k, c, s, p, d) =>
      (k, c, s, p, Timestamp.valueOf(d + " 00:00:00"), "3-MEDIUM")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
      "o_orderpriority")
    val out = Aggregates.aggCountDistinctIf(df)
      .agg(sum("fulfilled_customers")).as[Long].collect().head
    assert(out == 2L) // custkeys 10 and 11, never double-counted
  }

  test("least() skips NULLs (fn_datetime earliest_date)") {
    val df = Seq(
      (1L, 5L, "O", 10.0, Timestamp.valueOf("1998-05-05 00:00:00"), "5-LOW"),
      (2L, 5L, "F", 10.0, Timestamp.valueOf("1995-05-05 00:00:00"), "5-LOW")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
      "o_orderpriority")
    val out = Scalars.fnDatetime(df).orderBy("order_id")
      .select("earliest_date").as[java.sql.Date].collect()
    // status O -> maybe_early NULL -> least skips -> 1997-01-01
    assert(out(0) == java.sql.Date.valueOf("1997-01-01"))
    // status F -> least(1995-05-05, 1997-01-01) = 1995-05-05
    assert(out(1) == java.sql.Date.valueOf("1995-05-05"))
  }

  test("timestamp hour diff truncates toward zero on negatives (BQ semantics)") {
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 9L, "a", 0.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-01 01:30:00"), 9L, "a", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Scalars.fnTimestampDiffHour(df).orderBy("event_id")
      .select("hours_since_prev", "hours_back").collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1))
    assert(out(1).getLong(0) == 1L && out(1).getLong(1) == -1L) // -1.5h -> -1, not -2
  }

  test("sentiment scorer honors contract thresholds") {
    import graft.operators.Enrich.scoreSentiment
    assert(scoreSentiment("fast good spark merge ok") ==
      ((4.0 / 4.0, "POSITIVE", "positive")))
    assert(scoreSentiment("slow error text here")._3 == "negative")
    assert(scoreSentiment("short") == ((0.0, "NEUTRAL", "neutral")))
    val mixed = scoreSentiment("fast slow neutral words here")
    assert(mixed._1 == 0.0 && mixed._3 == "neutral")
    // 1000-char truncation: positives beyond the horizon don't count
    val far = ("x " * 500) + "good good good"
    assert(scoreSentiment(far)._1 == 0.0)
  }

  test("approx distinct stays within the configured error of exact counts") {
    val li = graft.sources.Tables.lineitem(spark, sf)
    val approx = Aggregates.aggApproxDistinct(li).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val exact = Aggregates.aggNuniqueMulti(li).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    exact.foreach { case (k, (p, s, o)) =>
      val (ap, as_, ao) = approx(k)
      def close(a: Long, e: Long) = math.abs(a - e) <= math.max(5L, (e * 0.05).toLong)
      assert(close(ap, p) && close(as_, s) && close(ao, o),
        s"approx too far for $k: approx=${approx(k)} exact=${exact(k)}")
    }
    // the xxhash64 fast path holds the same error bound
    val fast = Aggregates.aggApproxDistinct(li, fastHash = true).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    exact.foreach { case (k, (p, s, o)) =>
      val (ap, as_, ao) = fast(k)
      def close(a: Long, e: Long) = math.abs(a - e) <= math.max(5L, (e * 0.05).toLong)
      assert(close(ap, p) && close(as_, s) && close(ao, o),
        s"fast-hash approx too far for $k: approx=${fast(k)} exact=${exact(k)}")
    }
  }

  test("salted two-phase sum equals the direct aggregation") {
    val df = (1 to 500).map(i => (i % 3L, i.toLong, i.toLong * 10)).toDF("k", "row_id", "v")
    val salted = graft.operators.Skew.saltedSum(df, col("k"), col("row_id"), col("v"),
      "k", "total", salts = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = df.groupBy("k").agg(sum("v").as("total"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("LongDot matches HOF dot semantics incl. NULL on length mismatch") {
    import graft.functions.LongDot.long_dot
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))).toDF("a", "b")
    assert(df.select(long_dot(col("a"), col("b"))).as[Long].collect().head == 32L)
    // unequal lengths → NULL, exactly like aggregate(zip_with(...)) where
    // zip_with pads with NULL and the NULL product poisons the sum
    val skew = Seq((Seq(2L, 3L), Seq(10L, 10L, 99L))).toDF("a", "b")
    assert(skew.select(long_dot(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("as-of join: inclusive at equal ts, NULL before the first error") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1L, "click"), // before any error -> NULL
      (2L, ts("2024-01-01 10:00:00"), 1L, "error"),
      (3L, ts("2024-01-01 10:00:00"), 1L, "click"), // tie -> inclusive match
      (4L, ts("2024-01-01 11:00:00"), 1L, "error"),
      (5L, ts("2024-01-01 11:30:00"), 1L, "click"), // latest preceding = 4
      (6L, ts("2024-01-01 12:00:00"), 2L, "click")  // other user -> NULL
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.operators.Joins.joinAsof(events)
      .select("event_id", "error_event_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(1L -> -1L, 3L -> 2L, 5L -> 4L, 6L -> -1L))

    // forward: inclusive at equal ts, NULL after the last error
    val fwd = graft.operators.Joins.joinAsofForward(events)
      .select("event_id", "error_event_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(fwd == Map(1L -> 2L, 3L -> 2L, 5L -> -1L, 6L -> -1L))

    // nearest: equal-ts counts as backward at distance 0; strictly closer
    // forward beats farther backward; tie prefers backward
    val near = graft.operators.Joins.joinAsofNearest(events).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((if (r.isNullAt(3)) -1L else r.getLong(3)), r.getAs[String]("direction"))).toMap
    assert(near(1L) == ((2L, "forward")))  // only a later error exists
    assert(near(3L) == ((2L, "backward"))) // distance 0 via the backward frame
    assert(near(5L) == ((4L, "backward"))) // 30min back vs nothing ahead
    assert(near(6L) == ((-1L, null)))      // other user: no match either way

    // tolerance: a match older than the window is no match at all — event 5
    // keeps its 30-min-stale error under a 1h bound but loses it at 10min;
    // matched rows inside the bound are identical to the plain as-of
    def tol(us: Long) = graft.operators.Joins.joinAsofTolerance(events, us)
      .select("event_id", "error_event_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(tol(3600000000L) == Map(1L -> -1L, 3L -> 2L, 5L -> 4L, 6L -> -1L))
    assert(tol(600000000L) == Map(1L -> -1L, 3L -> 2L, 5L -> -1L, 6L -> -1L))
  }

  test("weighted reservoir sample: per-group cap, weight bias, exact priorities") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val out = graft.operators.Curation.sampleReservoirWeighted(docs, k = 20).collect()
    val bySource = out.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, rows) =>
      assert(rows.length <= 20, s"source $src over cap")
      val ranks = rows.map(_.getAs[Long]("sample_rank")).sorted
      assert(ranks.sameElements(1L to rows.length), s"ranks not dense for $src")
    }
    // exact replay: the k largest driver-computed priorities per source
    // must be precisely the sampled ids (determinism + correct top-k)
    val all = docs.select(col("doc_id"), col("source"), col("n_chars"),
        graft.functions.PortableHash.hash32(
          concat(lit("rw:"), col("doc_id").cast("string"))).as("u"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = all.groupBy(_._2).values.flatMap { rows =>
      rows.sortBy { case (id, _, w, u) => (-(w.toDouble / (u + 1).toDouble), id) }
        .take(20).map(_._1).toSeq
    }.toSet
    assert(out.map(_.getAs[Long]("doc_id")).toSet == expected)
    // weight bias: sampled docs should skew long — their mean length beats
    // the corpus mean (deterministic given the fixed hash, not a flaky
    // statistical assertion: checked once, holds for this corpus)
    val sampledMean = out.map(_.getAs[Long]("weight")).sum.toDouble / out.length
    val corpusMean = all.map(_._3).sum.toDouble / all.length
    assert(sampledMean > corpusMean,
      f"weighted sample not length-biased: $sampledMean%.1f <= $corpusMean%.1f")
  }

  test("hll overlap estimates track the exact audience overlap") {
    val events = graft.sources.Tables.events(spark, sf)
    val exact = Aggregates.aggAudienceOverlap(events).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        ((r.getAs[Long]("size_a"), r.getAs[Long]("size_b"), r.getAs[Long]("shared_users"))))
      .toMap
    val est = Aggregates.aggHllOverlap(events).collect()
    // the exact twin only emits pairs with shared > 0; the sketch emits all
    assert(est.length >= exact.size)
    // the per-pair bounds below only run on matched keys — make sure the
    // key conventions actually line up or the loop is vacuous
    val matched = est.map(r => (r.getAs[String]("seg_a"), r.getAs[String]("seg_b")))
      .count(exact.contains)
    assert(matched == exact.size,
      s"only $matched of ${exact.size} exact pairs matched the sketch keys")
    est.foreach { r =>
      val key = (r.getAs[String]("seg_a"), r.getAs[String]("seg_b"))
      exact.get(key).foreach { case (sa, sb, shared) =>
        val union = sa + sb - shared
        def within(e: Long, x: Long, what: String): Unit =
          assert(math.abs(e - x) <= math.max(5.0, 0.05 * x),
            s"$key $what: est $e vs exact $x")
        within(r.getAs[Long]("est_a"), sa, "A")
        within(r.getAs[Long]("est_b"), sb, "B")
        within(r.getAs[Long]("est_union"), union, "union")
        // inclusion-exclusion compounds three estimates: union-magnitude slack
        assert(math.abs(r.getAs[Long]("est_shared") - shared) <=
          math.max(10.0, 0.08 * union),
          s"$key shared: est ${r.getAs[Long]("est_shared")} vs exact $shared")
      }
    }
  }

  test("win_twap: lead-gap day weights, last row drops, vwap hand-checked") {
    import java.sql.Date
    val prices = Seq(
      (1L, Date.valueOf("2024-01-01"), 100L, 10L),
      (1L, Date.valueOf("2024-01-03"), 200L, 30L), // 2-day gap before it
      (1L, Date.valueOf("2024-01-04"), 400L, 60L)  // last: no forward interval
    ).toDF("ticker", "trade_date", "close_cents", "volume")
    val r = graft.operators.Windows.winTwap(prices).collect().head
    assert(r.getAs[Long]("n_obs") == 3L)
    // twap = (100*2 + 200*1) / 3 / 100 — day-1's close stood for 2 days
    assert(math.abs(r.getAs[Double]("twap") - 400.0 / 3 / 100) < 1e-12)
    // vwap = (100*10 + 200*30 + 400*60) / 100 / 100
    assert(math.abs(r.getAs[Double]("vwap") - 3.1) < 1e-12)
  }

  test("agg_ohlc_weekly: first/last by date, extrema, week boundary") {
    import java.sql.Date
    val prices = Seq(
      (1L, Date.valueOf("2024-01-01"), 100L, 110L, 90L, 10L),
      (1L, Date.valueOf("2024-01-03"), 200L, 220L, 180L, 20L),
      (1L, Date.valueOf("2024-01-08"), 300L, 310L, 290L, 30L) // next Monday
    ).toDF("ticker", "trade_date", "close_cents", "high_cents", "low_cents", "volume")
    val out = graft.operators.Windows.aggOhlcWeekly(prices).collect()
      .map(r => r.getAs[Date]("week").toString ->
        ((r.getAs[Long]("open_cents"), r.getAs[Long]("high_cents"),
          r.getAs[Long]("low_cents"), r.getAs[Long]("close_cents"),
          r.getAs[Long]("volume"), r.getAs[Long]("n_days")))).toMap
    assert(out("2024-01-01") == ((100L, 220L, 90L, 200L, 30L, 2L)))
    assert(out("2024-01-08") == ((300L, 310L, 290L, 300L, 30L, 1L)))
  }

  test("win_rsi: warmup NULL, gain/loss arithmetic, all-gain convention") {
    import java.sql.Date
    val prices = Seq(
      ("2024-01-01", 100L), ("2024-01-02", 110L),
      ("2024-01-03", 105L), ("2024-01-04", 105L))
      .map { case (d, c) => (1L, Date.valueOf(d), c, c + 5, c - 5, 1L) }
      .toDF("ticker", "trade_date", "close_cents", "high_cents", "low_cents", "volume")
    val out = graft.operators.Windows.winRsi(prices, periods = 2).collect()
      .map(r => r.getAs[java.sql.Date]("trade_date").toString ->
        (if (r.isNullAt(3)) Double.NaN else r.getAs[Double]("rsi_14"))).toMap
    assert(out("2024-01-01").isNaN && out("2024-01-02").isNaN) // warmup
    // frame (+10, -5): RS = 2 -> RSI = 100 - 100/3
    assert(math.abs(out("2024-01-03") - (100.0 - 100.0 / 3)) < 1e-12)
    // frame (-5, 0): no gains -> RSI 0
    assert(out("2024-01-04") == 0.0)
    // monotone rise: sum_loss = 0 -> the conventional 100
    val rising = Seq(("2024-01-01", 100L), ("2024-01-02", 110L), ("2024-01-03", 120L))
      .map { case (d, c) => (1L, Date.valueOf(d), c, c, c, 1L) }
      .toDF("ticker", "trade_date", "close_cents", "high_cents", "low_cents", "volume")
    val r3 = graft.operators.Windows.winRsi(rising, periods = 2).collect()
      .filter(_.getAs[java.sql.Date]("trade_date").toString == "2024-01-03").head
    assert(r3.getAs[Double]("rsi_14") == 100.0)
  }

  test("win_volatility: exact ppm returns, sample stddev hand-checked") {
    import java.sql.Date
    val prices = Seq(
      ("2024-01-01", 100L), ("2024-01-02", 110L), ("2024-01-03", 99L))
      .map { case (d, c) => (1L, Date.valueOf(d), c, c, c, 1L) }
      .toDF("ticker", "trade_date", "close_cents", "high_cents", "low_cents", "volume")
    val r = graft.operators.Windows.winVolatility(prices).collect().head
    assert(r.getAs[Long]("n_rets") == 2L)
    // rets: +100000 ppm, then (-11e6) div 110 = -100000 ppm (truncation);
    // mean 0, sample var = 2e10 -> sd/1e4 = sqrt(2e10)/1e4
    assert(math.abs(r.getAs[Double]("daily_vol_pct") - math.sqrt(2e10) / 10000.0) < 1e-9)
  }

  test("win_drawdown: running-peak fall in exact ppm") {
    import java.sql.Date
    val prices = (Seq(
      ("2024-01-01", 100L), ("2024-01-02", 80L),   // 20% below the 100 peak
      ("2024-01-03", 120L), ("2024-01-04", 60L))   // then 50% below the 120 peak
      .map { case (d, c) => (1L, Date.valueOf(d), c, 1L) })
      .toDF("ticker", "trade_date", "close_cents", "volume")
    val r = graft.operators.Windows.winDrawdown(prices).collect().head
    assert(r.getAs[Long]("n_obs") == 4L)
    assert(r.getAs[Long]("peak_close_cents") == 120L)
    assert(r.getAs[Long]("max_drawdown_ppm") == 500000L)
    assert(r.getAs[Double]("max_drawdown_pct") == 50.0)
  }

  test("sorted-neighborhood join equals the naive windowed pair count") {
    import spark.implicits._
    // 40 rows across the session's partitions — the distributed rank must
    // stitch window pairs across every range-partition boundary
    val rows = (0 until 40).map(i => ((i * 7 % 40).toLong, f"rec${i * 7 % 40}%03d"))
    val df = rows.toDF("p_partkey", "p_name")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val window = 4
    val ranked = rows.sortBy(r => (r._2, r._1)).zipWithIndex
    val expected = ranked.map { case ((k, name), rn) =>
      k -> ranked.count { case ((k2, n2), rn2) =>
        k2 != k && math.abs(rn - rn2) < window && lev(name, n2) <= 2 }.toLong
    }.toMap
    val out = graft.operators.Joins.joinSortedNeighborhood(df, window = window)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_snm_matches")).toMap
    assert(out == expected)
  }

  test("kmv + hll overlap estimators hold on the truncated-sketch branch") {
    // the testdata has only 150 users (every sketch complete → exact path);
    // this synthetic pair forces the estimator branch: |A|=10k, |B|=10k,
    // |A∩B|=5k ⇒ union 15k, jaccard 1/3
    val a = spark.range(0L, 10000L)
      .select(lit("a").as("event_type"), col("id").as("user_id"))
    val b = spark.range(5000L, 15000L)
      .select(lit("b").as("event_type"), col("id").as("user_id"))
    val events = a.union(b)

    val kmv = Aggregates.aggKmvOverlap(events).collect()
    assert(kmv.length == 1)
    val kr = kmv.head
    // k=256 ⇒ relative error ~1/sqrt(k) ≈ 6%; bounds at ~2.5σ
    assert(math.abs(kr.getAs[Long]("est_union") - 15000L) <= 2250,
      s"kmv union: ${kr.getAs[Long]("est_union")}")
    assert(math.abs(kr.getAs[Double]("jaccard_est") - 1.0 / 3) <= 0.1,
      s"kmv jaccard: ${kr.getAs[Double]("jaccard_est")}")
    assert(math.abs(kr.getAs[Long]("est_shared") - 5000L) <= 1500,
      s"kmv shared: ${kr.getAs[Long]("est_shared")}")

    val hll = Aggregates.aggHllOverlap(events).collect()
    assert(hll.length == 1)
    val hr = hll.head
    assert(math.abs(hr.getAs[Long]("est_a") - 10000L) <= 800,
      s"hll |A|: ${hr.getAs[Long]("est_a")}")
    assert(math.abs(hr.getAs[Long]("est_union") - 15000L) <= 1200,
      s"hll union: ${hr.getAs[Long]("est_union")}")
    // inclusion-exclusion compounds three estimates — looser bound
    assert(math.abs(hr.getAs[Long]("est_shared") - 5000L) <= 2000,
      s"hll shared: ${hr.getAs[Long]("est_shared")}")
  }

  test("union by name across schema generations null-fills the missing column") {
    val orders = graft.sources.Tables.orders(spark, sf)
    val out = graft.operators.SetOps.unionByNameEvolve(orders)
    assert(out.count() == orders.count(), "every order survives the union")
    val gens = out.groupBy("schema_gen")
      .agg(count(lit(1)).as("n"),
        count(col("priority")).as("with_priority"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(gens("v1")._2 == 0L, "v1 era must have NULL priority throughout")
    assert(gens("v2")._1 == gens("v2")._2, "v2 era must carry priority on every row")
  }

  test("range join (bucketed) equals the naive range predicate, incl. cross-bucket spans") {
    import java.sql.Timestamp
    // user 1's first event at 23:30 → window crosses the day-bucket
    // boundary; user 2's sits mid-day; both must count events from OTHER
    // users falling in their window
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 23:30:00")), // user 1 window start
      (2L, 11L, ts("2024-01-02 10:00:00")), // inside u1 (next bucket!)
      (3L, 12L, ts("2024-01-02 23:29:59")), // inside u1, last micro
      (4L, 13L, ts("2024-01-02 23:30:00")), // exact hi — excluded (half-open)
      (5L, 11L, ts("2024-01-05 00:00:00"))  // far away
    ).map { case (id, u, t) => (id, t, u, "click", 1.0, "p") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Joins.joinRangeBucketed(ev).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // u1 window [01-01 23:30, 01-02 23:30): events 10,11,12 → 3
    assert(out(10L) == 3L, s"got $out")
    // u11's first event 01-02 10:00 window catches events 12 and 13 → 3 incl. own
    assert(out(11L) == 3L, s"got $out")
    // independent naive check: cross join + range predicate
    val naive = ev.select(unix_micros(col("ts")).as("t"), col("user_id"))
    val iv = naive.groupBy(col("user_id").as("owner")).agg(min(col("t")).as("lo"))
      .withColumn("hi", col("lo") + 86400000000L)
    val expected = naive.crossJoin(iv)
      .where(col("t") >= col("lo") && col("t") < col("hi"))
      .groupBy(col("owner")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == expected, s"bucketed=$out naive=$expected")
  }

  test("interval overlap join equals the naive θ-join, incl. cross-bucket spans") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // user 1: one session 01:00–02:00 (30-min gap chain). error at 02:25
    // (user 99) → window [01:55, 02:55] overlaps it by 5 min across an hour
    // bucket boundary; error at 04:00 → [03:30, 04:30] does not.
    val ev = Seq(
      (1L, ts("2024-01-01 01:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 01:20:00"), 1L, "click"),
      (3L, ts("2024-01-01 01:40:00"), 1L, "view"),
      (4L, ts("2024-01-01 02:00:00"), 1L, "purchase"),
      (5L, ts("2024-01-01 02:25:00"), 99L, "error"),
      (6L, ts("2024-01-01 04:00:00"), 99L, "error"))
      .map { case (id, t, u, tp) => (id, t, u, tp, 1.0, "p") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Joins.joinIntervalOverlap(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // u1 session overlaps window 5; u99's two single-event sessions each
    // overlap their own window only
    assert(out == Map((1L, 1L) -> 1L, (99L, 1L) -> 1L, (99L, 2L) -> 1L), s"got $out")
    // independent naive check: cross join + raw overlap predicate
    val sess = graft.streaming.Sessionize.sessionizeBatch(ev)
      .select(col("user_id"), col("session_idx"),
        unix_micros(col("session_start")).as("s_lo"),
        unix_micros(col("session_end")).as("s_hi"))
    val win = ev.where(col("event_type") === "error")
      .select(col("event_id").as("error_id"),
        (unix_micros(col("ts")) - 1800000000L).as("w_lo"),
        (unix_micros(col("ts")) + 1800000000L).as("w_hi"))
    val naive = sess.crossJoin(win)
      .where(col("s_lo") <= col("w_hi") && col("w_lo") <= col("s_hi"))
      .groupBy("user_id", "session_idx").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == naive, s"bucketed=$out naive=$naive")
  }

  test("agg_quantiles: interpolated quartiles are exact at binary-exact fractions") {
    import java.sql.Timestamp
    // n=4 values 1,2,3,4 dollars: p25 at pos 0.75 → 1.75; median 2.5; p75 3.25
    val ev = (1 to 4).map(i =>
      (i.toLong, Timestamp.valueOf("2024-01-01 00:00:00"), i.toLong, "a", i.toDouble, "p"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Aggregates.aggQuantiles(ev).collect().head
    assert(r.getAs[Double]("p25_value") == 1.75)
    assert(r.getAs[Double]("median_value") == 2.5)
    assert(r.getAs[Double]("p75_value") == 3.25)
  }

  test("fuzzy join finds cross-bucket typo pairs and nothing beyond the threshold") {
    // "abc"(len 3, blk 0) vs "abcd"(len 4, blk 1): lev 1 ACROSS a bucket
    // boundary — the case the adjacent-bucket probe exists for; "zzzz" is
    // within-bucket of "abcd" but lev 4 — must not match
    val df = Seq((1L, "abc"), (2L, "abcd"), (3L, "zzzz"))
      .toDF("p_partkey", "p_name")
    val out = Joins.joinFuzzyBlocked(df).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_fuzzy_matches")).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 0L), s"got $out")
  }

  test("fuzzy join blocking stays lossless when the threshold exceeds the default width") {
    // lev("aaaa", "aaaaaaaaa") = 5: with the fixed width-4 blocking these
    // land 2 buckets apart and the pair would be silently dropped; the
    // derived width (>= threshold + 1) must recover it
    val df = Seq((1L, "aaaa"), (2L, "aaaaaaaaa")).toDF("p_partkey", "p_name")
    val out = Joins.joinFuzzyBlocked(df, threshold = 5).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_fuzzy_matches")).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L), s"got $out")
  }

  test("agg_histogram clamps negative values into bin 0 on both engines' semantics") {
    import java.sql.Timestamp
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    // -10 dollars: a refund bins to 0 via the lower clamp (semantic choice:
    // no negative bins, and non-negative inputs keep the bin division
    // convention-proof); 10000 exercises the upper clamp
    val ev = Seq((-10.0, 1L), (25.0, 2L), (10000.0, 3L)).map { case (v, i) =>
      (i, ts, i, "a", v, "p")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val bins = Aggregates.aggHistogram(ev).collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n")).toMap
    assert(bins == Map(0L -> 2L, 9L -> 1L), s"got $bins")
  }

  test("CacheScope bounds live scoped caches and keeps re-registrations warm") {
    import org.apache.spark.storage.StorageLevel
    val frames = (0 until 6).map(i => spark.range(100L + i).toDF("v"))
    val first = graft.operators.CacheScope.cached(frames.head)
    // re-registering the same plan is a no-op that returns the live frame
    assert(graft.operators.CacheScope.cached(spark.range(100L).toDF("v"))
      .storageLevel != StorageLevel.NONE)
    frames.tail.foreach(graft.operators.CacheScope.cached(_).count())
    // the retention bound has evicted + unpersisted the oldest entries
    assert(first.storageLevel == StorageLevel.NONE,
      "oldest scoped cache should have been unpersisted")
    val recent = graft.operators.CacheScope.cached(spark.range(105L).toDF("v"))
    assert(recent.storageLevel != StorageLevel.NONE)
    // an external clearCache drops the relation but not the registry entry:
    // re-registration must RE-ARM the cache, not return an uncached frame
    spark.catalog.clearCache()
    assert(recent.storageLevel == StorageLevel.NONE)
    val rearmed = graft.operators.CacheScope.cached(spark.range(105L).toDF("v"))
    assert(rearmed.storageLevel != StorageLevel.NONE,
      "registry hit after clearCache must re-cache")
    spark.catalog.clearCache()
  }

  test("winsorize clamps exactly at the group's interpolated tail percentiles") {
    import java.sql.Timestamp
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    // 9 values 1..9 dollars: p12.5 at pos 1.0 → 2.0; p87.5 at pos 7.0 → 8.0
    val ev = (1 to 9).map(i => (i.toLong, ts, i.toLong, "a", i.toDouble, "p"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Aggregates.winsorize(ev).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Double]("value_winsorized"), r.getAs[Boolean]("clamped"))).toMap
    assert(out(1L) == ((2.0, true)) && out(9L) == ((8.0, true)))
    assert(out(2L) == ((2.0, false)) && out(5L) == ((5.0, false)) && out(8L) == ((8.0, false)))
  }

  test("graph_centrality equals a driver-side exact PageRank over the same kNN edges") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val edges = Similarity.knnGraph(emb)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val vertices = emb.select(col("vec_id")).collect().map(_.getLong(0))
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var ref = vertices.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val inflow = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => ref(s) / deg(s) }.sum).toMap
      ref = vertices.map(v => v -> (150000L + 85L * inflow.getOrElse(v, 0L) / 100L)).toMap
    }
    val got = Similarity.graphCentrality(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
  }

  test("BPE merges: hand-computed rules incl. overlap and single-symbol words") {
    // corpus: "aaab" x2, "ab" x1, "x" (single symbol, yields no pairs)
    // round 1: "a a" = 2+2 beats "a b" = 3 -> merge "aa"
    //   (" a a a b " -> " aa a b ": leftmost non-overlapping replace)
    // round 2: "a b" = 2+1 beats "aa a" = 2 -> merge "ab"
    // round 3: "aa ab" = 2 -> merge "aaab"
    val docs = Seq((1L, "aaab x", "en"), (2L, "aaab", "en"), (3L, "ab", "en"))
      .toDF("doc_id", "text", "lang")
    val got = graft.operators.TextAnalysis.bpeTrainMerges(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "a a", "aa", 4L), (2L, "a b", "ab", 3L), (3L, "aa ab", "aaab", 2L)),
      s"got ${got.toSeq}")
  }

  test("BPE merges: corpus is evaluated exactly once, independent of merge count") {
    // a side-effect-counting projection on the text column observes every
    // corpus evaluation: the vocabulary checkpoint means k merge rounds must
    // touch the raw corpus exactly once (the pre-fix lineage re-ran the
    // tokenize+aggregate — and all prior replaces — every round)
    val evals = spark.sparkContext.longAccumulator("bpe-corpus-evals")
    val touch = udf { (s: String) => { evals.add(1); s } }
    val base = Seq(
      (1L, "aaab x"), (2L, "aaab"), (3L, "ab"), (4L, "abab baba"),
      (5L, "banana bandana"), (6L, "a cabana"), (7L, "ban ban cab"))
      .toDF("doc_id", "text")
    val docs = base.select(col("doc_id"), touch(col("text")).as("text"))
    val rules = graft.operators.TextAnalysis.bpeTrainMerges(docs, k = 6).collect()
    assert(rules.length == 6)
    assert(evals.value == base.count(),
      s"corpus text evaluated ${evals.value} times for 7 rows / 6 merge rounds " +
        "— the vocabulary frame is no longer materialized once")
  }

  test("BPE encode + token count: hand-computed segmentations after 3 rules") {
    // same corpus as the rules test: learned rules are
    //   1: "a a"->aa   2: "a b"->ab   3: "aa ab"->aaab
    // encode traces (leftmost non-overlapping per rule, rank order):
    //   aaab: " a a a b " -r1-> " aa a b " -r2-> " aa ab " -r3-> " aaab "
    //   ab:   " a b "     -r2-> " ab "
    //   x:    " x "       (no rule applies)
    val docs = Seq((1L, "aaab x", "en"), (2L, "aaab", "en"), (3L, "ab", "en"))
      .toDF("doc_id", "text", "lang")
    val enc = graft.operators.TextAnalysis.bpeEncode(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(enc == Map(
      "aaab" -> ((2L, 1L, "aaab")),
      "ab" -> ((1L, 1L, "ab")),
      "x" -> ((1L, 1L, "x"))), s"got $enc")
    // per-doc budgets: doc1 = aaab(1) + x(1); a doc with no [a-z]+ words
    // must still appear with 0
    val withEmpty = docs.union(Seq((4L, "123 456", "en")).toDF("doc_id", "text", "lang"))
    val counts = graft.operators.TextAnalysis.bpeTokenCount(withEmpty).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 0L), s"got $counts")
  }

  test("bpe_vocab_coverage: hand-computed rates on the rules-test corpus") {
    // rules learned: aa, ab, aaab (see the merges test). words: aaab, x,
    // aaab, ab (alpha) + 123, 456 (gate-rejected) -> alpha 4/6;
    // all 4 alpha occurrences segment to ONE token; aaab x2 and ab
    // benefited from merges, x did not -> merged 3/4
    val docs = Seq((1L, "aaab x", "en"), (2L, "aaab", "en"), (3L, "ab", "en"),
      (4L, "123 456", "en")).toDF("doc_id", "text", "lang")
    val r = graft.operators.TextAnalysis.bpeVocabCoverage(docs).collect()
    assert(r.length == 1)
    val m = r.head
    assert(m.getAs[Long]("n_words") == 6L)
    assert(m.getAs[Long]("n_alpha_words") == 4L)
    assert(m.getAs[Long]("alpha_ppm") == 4L * 1000000L / 6L)
    assert(m.getAs[Long]("n_single_token") == 4L)
    assert(m.getAs[Long]("single_token_ppm") == 1000000L)
    assert(m.getAs[Long]("n_merged") == 3L)
    assert(m.getAs[Long]("merged_ppm") == 750000L)
  }

  test("win_cusum: hand-computed level shift, peak positions exact") {
    import java.sql.Timestamp
    // one type, values 1,1,1,5,5,5 (cents 100/500, mu = 300):
    // C = -200,-400,-600,-400,-200,0
    // s_up peaks at 600 on row 6; s_dn peaks at 600 on row 3
    val ev = (1 to 6).map(i => (i.toLong,
      Timestamp.valueOf(f"2024-01-01 00:0$i:00"), 1L, "t",
      if (i <= 3) 1.0 else 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.operators.Windows.winCusum(ev).collect()
    assert(r.length == 1)
    val m = r.head
    assert(m.getAs[Long]("n_events") == 6L)
    assert(m.getAs[Long]("mu_cents") == 300L)
    assert(m.getAs[Long]("max_cusum_up") == 600L)
    assert(m.getAs[Long]("peak_up_idx") == 6L)
    assert(m.getAs[Long]("max_cusum_down") == 600L)
    assert(m.getAs[Long]("peak_down_idx") == 3L)
  }

  test("win_cusum: negative-sum series uses the TRUNCATED mean (oracle `//` semantics)") {
    import java.sql.Timestamp
    // values -1,-1,-2 cents -> sum = -400, n = 3. DuckDB 1.0.0 `//` TRUNCATES
    // toward zero: -400//3 = -133 (verified against the oracle engine itself —
    // scripts/oracle_div_check.py pins it in CI fashion). Spark's plain `div`
    // truncates identically, so the engine must yield -133 here; a FLOOR mean
    // (-134) would shift every centered value and diverge from the oracle
    // (the r16 pmod shift made exactly that mistake — ADVICE r16).
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:01:00"), 1L, "t", -1.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-02 00:02:00"), 1L, "t", -1.0, "{}"),
      (3L, Timestamp.valueOf("2024-01-03 00:03:00"), 1L, "t", -2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.operators.Windows.winCusum(ev).collect()
    assert(r.length == 1 && r.head.getAs[Long]("mu_cents") == -133L,
      s"mu must truncate to -133 (DuckDB // semantics), got ${r.head.getAs[Long]("mu_cents")}")
    // y = v - mu = 33,33,-67; C = 33,66,-1; s_up peak 66@2, s_dn peak 67@3
    assert(r.head.getAs[Long]("max_cusum_up") == 66L)
    assert(r.head.getAs[Long]("peak_up_idx") == 2L)
    assert(r.head.getAs[Long]("max_cusum_down") == 67L)
    assert(r.head.getAs[Long]("peak_down_idx") == 3L)
    val s = graft.operators.Windows.winCusumScalable(ev)
    val p = graft.operators.Windows.winCusum(ev)
    assert(p.except(s).isEmpty && s.except(p).isEmpty)
  }

  test("win_cusum_scalable: row-identical to the single-window form") {
    import java.sql.Timestamp
    // multi-day, multi-type series with ties-in-day and a level shift so
    // the cross-chunk carry (offsets, prefix extrema, rn stitching) is
    // actually exercised
    val ev = (1 to 200).map { i =>
      val day = 1 + (i - 1) / 40                      // 5 days, 40 rows each
      (i.toLong, Timestamp.valueOf(f"2024-01-0$day 00:${(i % 60)}%02d:00"),
        (i % 7).toLong, if (i % 2 == 0) "a" else "b",
        if (i <= 100) 1.0 + (i % 5) else 9.0 + (i % 3), "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val plain = graft.operators.Windows.winCusum(ev)
    val scalable = graft.operators.Windows.winCusumScalable(ev)
    assert(plain.except(scalable).isEmpty && scalable.except(plain).isEmpty,
      "two-level prefix scan must reproduce the single-window CUSUM exactly")
    // and on the fixture
    val fx = graft.sources.Tables.events(spark, sf)
    val p2 = graft.operators.Windows.winCusum(fx)
    val s2 = graft.operators.Windows.winCusumScalable(fx)
    assert(p2.except(s2).isEmpty && s2.except(p2).isEmpty)
  }

  test("win_cusum_scalable: a dominant day hour-splits and stays row-identical") {
    import java.sql.Timestamp
    // skew fixture: day 1 carries 50% of all rows (a burst — exactly when a
    // monitor wants CUSUM); with the threshold forced low, day 1 must split
    // into per-hour sub-chunks while days 2-5 stay whole, and the stitched
    // result must still equal the plain single-window form exactly
    val burst = (1 to 100).map { i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-01 ${i % 24}%02d:${i % 60}%02d:00"),
        1L, if (i % 2 == 0) "a" else "b", 1.0 + (i % 7), "{}")
    }
    val tail = (101 to 200).map { i =>
      val day = 2 + (i - 101) / 25
      (i.toLong, Timestamp.valueOf(f"2024-01-0$day 00:${i % 60}%02d:00"),
        1L, if (i % 2 == 0) "a" else "b", 9.0 + (i % 3), "{}")
    }
    val ev = (burst ++ tail)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val plain = graft.operators.Windows.winCusum(ev)
    val split = graft.operators.Windows.winCusumScalable(ev, hourSplitThreshold = 20L)
    assert(plain.except(split).isEmpty && split.except(plain).isEmpty,
      "hour-split chunking must reproduce the single-window CUSUM exactly")
  }

  test("BPE: vocabulary with no adjacent pairs stops early instead of crashing") {
    // every word is a single symbol -> the pair aggregate is empty in round
    // 1; training must return zero rules (not MatchError), encode must
    // still give each word a 1-token segmentation, and every doc must get
    // a budget row (doc 3 has no [a-z]+ words at all)
    val docs = Seq((1L, "a b c", "en"), (2L, "x y", "en"), (3L, "123 456", "en"))
      .toDF("doc_id", "text", "lang")
    assert(graft.operators.TextAnalysis.bpeTrainMerges(docs).collect().isEmpty)
    val enc = graft.operators.TextAnalysis.bpeEncode(docs).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(enc == Map("a" -> 1L, "b" -> 1L, "c" -> 1L, "x" -> 1L, "y" -> 1L))
    val counts = graft.operators.TextAnalysis.bpeTokenCount(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 3L, 2L -> 2L, 3L -> 0L), s"got $counts")
    // pairs exhausted mid-run: "ab" x2 has one pair -> rule 1 merges it,
    // round 2 finds nothing and stops with the single learned rule
    val ab = Seq((1L, "ab ab", "en")).toDF("doc_id", "text", "lang")
    val rules = graft.operators.TextAnalysis.bpeTrainMerges(ab, k = 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rules.toSeq == Seq((1L, "a b", "ab", 2L)), s"got ${rules.toSeq}")
  }

  test("BPE fertility by lang: hand-computed tokens/word and chars/token") {
    // rules from the aaab/ab/x corpus: aa, ab, aaab (lang-agnostic train);
    // encodings: aaab -> 1 token, ab -> 1, x -> 1.
    // en: words {aaab, x, aaab} -> 3 words / 3 tokens / 9 chars ->
    //     tpw 1e6, cpt 3e6; fr: {ab} -> 1/1/2 -> tpw 1e6, cpt 2e6
    val docs = Seq((1L, "aaab x", "en"), (2L, "aaab", "en"), (3L, "ab", "fr"))
      .toDF("doc_id", "text", "lang")
    val got = graft.operators.TextAnalysis.bpeFertilityByLang(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))).toMap
    assert(got("en") == ((3L, 3L, 9L, 1000000L, 3000000L)), s"got ${got("en")}")
    assert(got("fr") == ((1L, 1L, 2L, 1000000L, 2000000L)), s"got ${got("fr")}")
  }

  test("BPE batched: multi-accept round, overlap rejection, early exhaustion") {
    // two symbol-disjoint pairs in one round: "ab" x3, "cd" x2 ->
    // round 1 ranks "a b"(3) then "c d"(2); disjoint -> BOTH accepted;
    // round 2 finds no pairs and stops
    val two = Seq((1L, "ab ab ab", "en"), (2L, "cd cd", "en"))
      .toDF("doc_id", "text", "lang")
    val gotTwo = graft.operators.TextAnalysis.bpeTrainBatched(two).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(gotTwo.toSeq == Seq(
      (1L, 1L, "a b", "ab", 3L), (2L, 1L, "c d", "cd", 2L)), s"got ${gotTwo.toSeq}")

    // overlap rejection: "abx" x2 -> round 1 candidates "a b"(2), "b x"(2);
    // "b x" shares 'b' with the higher-ranked "a b" -> rejected, applied
    // alone; round 2 then merges the surviving "ab x"
    val abx = Seq((1L, "abx abx", "en")).toDF("doc_id", "text", "lang")
    val gotAbx = graft.operators.TextAnalysis.bpeTrainBatched(abx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(gotAbx.toSeq == Seq(
      (1L, 1L, "a b", "ab", 2L), (2L, 2L, "ab x", "abx", 2L)), s"got ${gotAbx.toSeq}")

    // single-symbol vocabulary: no pairs anywhere -> zero rules, no crash
    val flat = Seq((1L, "a b c", "en")).toDF("doc_id", "text", "lang")
    assert(graft.operators.TextAnalysis.bpeTrainBatched(flat).collect().isEmpty)
  }

  test("graph_centrality survives convergence-depth iteration counts (bounded-depth plans)") {
    // 16 rounds: without periodic localCheckpoint the plan nests 16 joins
    // deep and analysis time explodes; with the every-8-rounds truncation,
    // depth is bounded by the period while short runs stay lazy/single-job.
    // Equality against the driver-side exact PageRank pins semantics at the
    // deeper count too (same integer-ppm arithmetic as the iters=3 test).
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val edges = Similarity.knnGraph(emb)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val vertices = emb.select(col("vec_id")).collect().map(_.getLong(0))
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var ref = vertices.map(_ -> 1000000L).toMap
    for (_ <- 1 to 16) {
      val inflow = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => ref(s) / deg(s) }.sum).toMap
      ref = vertices.map(v => v -> (150000L + 85L * inflow.getOrElse(v, 0L) / 100L)).toMap
    }
    val got = Similarity.graphCentrality(emb, iters = 16).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
  }

  test("CentroidArgmin matches the least-of-structs encoding incl. ties and NULLs") {
    import graft.functions.CentroidArgmin.centroid_argmin
    import graft.functions.LongDot.long_dot
    val cents = Seq(Array(1L, 0L), Array(0L, 1L), Array(1L, 0L)) // cid 2 duplicates cid 0
    val df = Seq(
      (1L, Some(Seq(5L, 1L))),   // closest to (1,0): tie between cid 0 and 2 → 0
      (2L, Some(Seq(0L, 9L))),   // closest to (0,1) → 1
      (3L, None),                // NULL vector → NULL
      (4L, Some(Seq(1L, 2L, 3L))) // dim mismatch → NULL
    ).toDF("id", "q")
    val got = df.select(col("id"), centroid_argmin(col("q"), cents).as("cid"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(1L -> Some(0L), 2L -> Some(1L), 3L -> None, 4L -> None))
    // equivalence with the struct encoding on a real vector column
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(round(cast(x as double) * 10000) as bigint))").as("q"))
    val model = emb.orderBy("vec_id").limit(4).select("q")
      .collect().map(_.getSeq[Long](0).toArray).toSeq
    val structForm = model.zipWithIndex.map { case (c, cid) =>
      struct((lit(c.map(v => v * v).sum) - long_dot(col("q"), typedLit(c.toSeq)) * 2).as("score"),
        lit(cid.toLong).as("cid"))
    }
    val both = emb.select(
      centroid_argmin(col("q"), model).as("native"),
      least(structForm: _*).getField("cid").as("structs"))
    assert(both.where(col("native") =!= col("structs")).count() == 0)
  }

  test("HyperplaneSig matches the when/long_dot composition incl. NULLs and mismatch") {
    import graft.functions.HyperplaneSig.hyperplane_sig
    import graft.functions.LongDot.long_dot
    val planes: Seq[Seq[Long]] = (0 until 64).map(j => (0 until 64).map(d =>
      ((j * 131 + d * 37) % 19 - 9 + ((j * 67 + d * 29) % 17 - 8) * 19).toLong))
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(round(cast(x as double) * 10000) as bigint))").as("q"))
    // composed form: 64 separate sign columns folded into the same long
    val composed = planes.zipWithIndex.map { case (p, j) =>
      when(long_dot(col("q"), typedLit(p)) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val both = emb.select(hyperplane_sig(col("q"), planes).as("native"), composed.as("slow"))
    assert(both.where(col("native") =!= col("slow")).count() == 0)
    assert(both.where(col("native").isNull).count() == 0)
    // NULL vector and dimension mismatch → NULL (the poisoned-dot contract)
    val edge = Seq((1L, Some(Seq(1L, 2L))), (2L, None))
      .toDF("id", "q")
    val got = edge.select(col("id"), hyperplane_sig(col("q"), planes).as("sig"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(got == Map(1L -> true, 2L -> true), s"got $got")
  }

  test("RollingHash matches the HOF ascii-fold on ASCII strings") {
    import graft.functions.RollingHash.rolling_hash
    val df = Seq("the quick brown fox", "", "a", "x " * 500).toDF("s")
    val hof = aggregate(
      transform(sequence(lit(1), length(col("s"))),
        i => ascii(col("s").substr(i, lit(1))).cast("long")),
      lit(0L), (acc, c) => (acc * 31 + c) % 2147483647L)
    val rows = df.select(rolling_hash(col("s")).as("native"), hof.as("hof"))
      .as[(Long, Long)].collect()
    rows.foreach { case (n, h) => assert(n == h, s"native=$n hof=$h") }
    // NULL input → NULL output
    val n = Seq[Option[String]](None).toDF("s")
    assert(n.select(rolling_hash(col("s"))).collect().head.isNullAt(0))
  }

  test("ts_gapfill zero-fills every (type, day) hole across the full range") {
    val df = Seq(
      // type a: days 1 and 4 present, 2-3 are holes
      (1L, Timestamp.valueOf("2024-01-01 09:00:00"), 5L, "a", 1.00, "{}"),
      (2L, Timestamp.valueOf("2024-01-04 23:59:59"), 5L, "a", 2.50, "{}"),
      (3L, Timestamp.valueOf("2024-01-04 00:00:00"), 6L, "a", 0.50, "{}"),
      // type b: only day 2 — its days 1, 3, 4 must still appear as zeros
      (4L, Timestamp.valueOf("2024-01-02 12:00:00"), 7L, "b", 4.00, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Reshape.tsGapfill(df)
      .as[(String, java.sql.Date, Long, Double)].collect()
      .map { case (t, day, n, v) => ((t, day.toString), (n, v)) }.toMap
    assert(out.size == 8) // 2 types x 4 days, no extras
    assert(out(("a", "2024-01-01")) == ((1L, 1.00)))
    assert(out(("a", "2024-01-02")) == ((0L, 0.0)))
    assert(out(("a", "2024-01-03")) == ((0L, 0.0)))
    assert(out(("a", "2024-01-04")) == ((2L, 3.00)))
    assert(out(("b", "2024-01-02")) == ((1L, 4.00)))
    assert(out(("b", "2024-01-01")) == ((0L, 0.0)))
    // empty input: NULL bounds must yield an empty frame, not a crash
    assert(Reshape.tsGapfill(df.limit(0)).count() == 0)
  }

  test("parquet staging backend is result-identical to the cache backend") {
    // CacheScope's production staging shape (spark.graft.staging=parquet)
    // must be a pure plan substitution: same values, same column types,
    // for an operator that stages an intermediate (tf-idf stages the tf
    // table; minhash stages its signature frame)
    def run(s: org.apache.spark.sql.SparkSession): Map[String, Seq[org.apache.spark.sql.Row]] = {
      val docs = graft.sources.Tables.documents(s, sf)
      Map(
        "tfidf" -> graft.operators.TextAnalysis.textTfidfTerms(docs)
          .orderBy("doc_id", "term").collect().toSeq,
        "minhash" -> graft.operators.Dedup.dedupMinhashLsh(docs)
          .orderBy("doc_id_1", "doc_id_2").collect().toSeq)
    }
    val viaCache = run(spark)
    // a fresh session: its own conf AND its own CacheScope registry, so the
    // staged frames re-register under the parquet backend instead of
    // hitting the cache-mode entries
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.staging", "parquet")
    s2.conf.set("spark.graft.scratch", "/tmp/graft_test_scratch")
    val viaParquet = run(s2)
    assert(viaParquet == viaCache, "staging backend changed operator results")
  }

  test("orc_ingest round-trips the canonical event projection value-exactly") {
    val events = graft.sources.Tables.events(spark, sf)
    val back = graft.sources.FileFormats.orcIngest(spark, events)
    val want = events.select(col("event_id"), col("user_id"), col("event_type"),
      graft.functions.Num.cents(col("value")).as("value_cents"))
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      want.schema.map(f => (f.name, f.dataType)))
    assert(back.count() == want.count())
    assert(back.exceptAll(want).isEmpty && want.exceptAll(back).isEmpty)
  }
}
