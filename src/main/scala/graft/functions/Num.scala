package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Cross-engine numeric determinism helpers.
  *
  * The driver's correctness gate hash-compares Spark results against DuckDB
  * running the oracle SQL on the same parquet. Floating-point SUM/AVG are
  * order-dependent, and both engines aggregate in different orders, so raw
  * double aggregation can never hash-match. Discipline used engine-wide:
  *
  *  1. Money-like doubles are converted ONCE to integer cents via
  *     `round(x * 100)` — for any double y=x*100 that is not exactly ?.5,
  *     Spark (HALF_UP on shortest decimal repr) and DuckDB (half away from
  *     zero on the binary value) agree; when y is exactly ?.5 both round away
  *     from zero. So the conversion is bit-identical across engines.
  *  2. All aggregation happens on exact integer (or decimal) types —
  *     order-independent, overflow-safe via DECIMAL when needed.
  *  3. Ratios/averages convert the exact aggregates to double at the very
  *     end with a FIXED operation order, identical in the oracle SQL, so the
  *     few IEEE ops performed are exact-rounded and identical.
  *
  * Reference motivation: the reference rounds display values (e.g.
  * round(avg(score),1) dbt/models/marts/hacker_news/fct_hn_weekly_stats.sql:10)
  * — cosmetic rounding of doubles is NOT reproducible across engines, so the
  * engine emits full-precision deterministic doubles instead.
  */
object Num {
  /** money double -> exact integer cents (see scheme above). */
  def cents(c: Column): Column = round(c * 100).cast(LongType)

  /** integral-valued double -> exact long. */
  def asLong(c: Column): Column = round(c).cast(LongType)

  /** integer cents -> double dollars; single exact-rounded division. */
  def dollars(c: Column): Column = c.cast(DoubleType) / 100.0

  /** exact ints a/b as double; canonical order. NULL if b is 0. */
  def ratio(num: Column, den: Column): Column =
    num.cast(DoubleType) / nullif(den, lit(0)).cast(DoubleType)

  /** mean in dollars from (cents sum, count): sum/n/100 in fixed order. */
  def meanDollars(sumCents: Column, n: Column): Column =
    sumCents.cast(DoubleType) / nullif(n, lit(0)).cast(DoubleType) / 100.0

  /** percent num/den*100 from exact ints. */
  def pct(num: Column, den: Column): Column = ratio(num, den) * 100.0

  /** Deterministic double -> fixed-point 2^-20 grid: floor(x*2^20 + 0.5) as
    * BIGINT (round-half-up toward +inf; floor and the IEEE multiply/add are
    * exact-rounded and identical across engines). Quantized values are exact
    * multiples of 2^-20 with bounded magnitude, so their integer sums are
    * order-independent — this is how derived doubles (pct changes, scores)
    * become exactly averageable. NULL propagates.
    * Oracle twin: CAST(FLOOR(x * 1048576.0 + 0.5) AS BIGINT).
    */
  def fix20(c: Column): Column = floor(c * 1048576.0 + 0.5).cast(LongType)

  /** fixed-point 2^-20 sum + count -> double mean, fixed op order.
    * Oracle twin: CAST(SUM(q) AS DOUBLE)/CAST(NULLIF(n,0) AS DOUBLE)/1048576.0.
    */
  def meanFix20(sumQ: Column, n: Column): Column =
    sumQ.cast(DoubleType) / nullif(n, lit(0)).cast(DoubleType) / 1048576.0

  /** 2^-10 variant for bounded scores in [-1,1]: squares stay < 2^22 so the
    * per-row terms and their BIGINT sums are safe to ~2^41 rows per group.
    * Oracle twin scale: 1024.0.
    */
  def fix10(c: Column): Column = floor(c * 1024.0 + 0.5).cast(LongType)

  /** sample stddev from 2^-10 fixed-point moments (n, sum q, sum q^2):
    * sqrt((n*sq - s^2)/(n*(n-1)))/1024 in fixed op order; NULL when n < 2.
    * The n*sq and s*s products grow as n^2·2^20 — past ~3M rows per group
    * they overflow BIGINT — so the moments are combined in DECIMAL(38,0)
    * (safe to ~10^9 rows per group); oracle twin uses HUGEINT the same way.
    * The decimal→double conversion is exact-rounded in both engines and the
    * test-scale values are < 2^53, so exactness is unchanged.
    */
  def stddevFix10(n: Column, s: Column, sq: Column): Column = {
    val d38 = DecimalType(38, 0)
    sqrt((n.cast(d38) * sq.cast(d38) - s.cast(d38) * s.cast(d38)).cast(DoubleType) /
      nullif(n.cast(d38) * (n - lit(1)).cast(d38), lit(0)).cast(DoubleType)) / 1024.0
  }

  /** overflow-safe exact sum of squares of an integer-cents column — cast to
    * decimal BEFORE multiplying (a long×long square silently wraps past
    * ~3.04e9 cents).
    */
  def sumSq(centsCol: Column): Column =
    sum(centsCol.cast(DecimalType(19, 0)) * centsCol.cast(DecimalType(19, 0)))

  private def nullif(c: Column, v: Column): Column = when(c === v, null).otherwise(c)
}
