package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality checks — the engine's translation of the reference's 208
  * declarative dbt schema tests (SURVEY §5.1: 53 unique, 80 not_null,
  * 14 accepted_values, 6 relationships, 27 accepted_range, 28
  * expression_is_true). Each check compiles to one aggregation returning the
  * number of violating rows; `0` passes — exactly dbt's contract ("a test is
  * a SELECT that must return zero rows").
  *
  * Scale: every check is a single filtered count (or two-sided anti-join for
  * relationships) — no collect, no row-by-row validation.
  */
object Checks {

  final case class CheckResult(name: String, violations: Long) {
    def passed: Boolean = violations == 0L
  }

  /** dbt `unique` */
  def unique(df: DataFrame, cols: String*): CheckResult = {
    val v = df.groupBy(cols.map(col): _*).count().where(col("count") > 1).count()
    CheckResult(s"unique(${cols.mkString(",")})", v)
  }

  /** dbt `not_null` */
  def notNull(df: DataFrame, c: String): CheckResult =
    CheckResult(s"not_null($c)", df.where(col(c).isNull).count())

  /** dbt `accepted_values` */
  def acceptedValues(df: DataFrame, c: String, values: Seq[String]): CheckResult =
    CheckResult(s"accepted_values($c)",
      df.where(col(c).isNotNull && !col(c).isin(values: _*)).count())

  /** dbt_utils `accepted_range` (inclusive bounds; NULLs pass, as in dbt) */
  def acceptedRange(df: DataFrame, c: String, lo: Double, hi: Double): CheckResult =
    CheckResult(s"accepted_range($c)",
      df.where(col(c).isNotNull && (col(c) < lo || col(c) > hi)).count())

  /** dbt_utils `expression_is_true`: violations are rows where the
    * expression is FALSE; NULL rows pass, matching dbt's generated
    * `WHERE NOT (expr)` (NULL is not true → not selected).
    */
  def expressionIsTrue(df: DataFrame, name: String, e: Column): CheckResult =
    CheckResult(s"expression_is_true($name)", df.where(!e).count())

  /** dbt `relationships`: every non-null fk value exists in the parent. */
  def relationships(child: DataFrame, fk: String, parent: DataFrame, pk: String): CheckResult = {
    val orphans = child.where(col(fk).isNotNull)
      .join(parent.select(col(pk)), col(fk) === col(pk), "left_anti").count()
    CheckResult(s"relationships($fk -> $pk)", orphans)
  }

  /** Run a suite; throws with a readable report if any check fails. */
  def assertAll(results: Seq[CheckResult]): Unit = {
    val failed = results.filterNot(_.passed)
    require(failed.isEmpty,
      s"data-quality failures:\n${failed.map(f => s"  ${f.name}: ${f.violations} rows").mkString("\n")}")
  }
}
