package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (builder brief: "salting for skew"). AQE's skew-join
  * splitting handles moderate skew automatically; this is the explicit
  * two-phase pattern for pathological hot keys where even one post-split
  * partition overwhelms an executor.
  */
object Skew {

  /** Two-phase salted sum: rows of a hot key scatter across `salts` partial
    * groups (salt = hash of a row-distinct column), partials combine in a
    * second tiny aggregation. Exact for sums/counts (commutative monoids).
    *
    * At 100 TB: phase 1 shuffles on (key, salt) — hot keys spread over
    * `salts` reducers; phase 2 shuffles |keys|×salts pre-combined rows.
    */
  def saltedSum(df: DataFrame, key: Column, saltBy: Column, value: Column,
      outKey: String, outValue: String, salts: Int = 16): DataFrame =
    df.select(key.as(outKey), pmod(hash(saltBy), lit(salts)).as("__salt"),
        value.as("__v"))
      .groupBy(col(outKey), col("__salt"))
      .agg(sum(col("__v")).as("__partial"))
      .groupBy(col(outKey))
      .agg(sum(col("__partial")).as(outValue))

  /** `skew_salted_sum`: the salted two-phase sum over a deliberately skewed
    * key (l_returnflag — 3 values over the whole fact table, the hot-key
    * worst case). Exactness is the point of the oracle: the salted route is
    * bit-identical to the plain GROUP BY because integer-cents sums are
    * associative-commutative (partition-independent).
    */
  def skewSaltedSum(lineitem: DataFrame): DataFrame =
    saltedSum(lineitem, col("l_returnflag"), col("l_orderkey"),
      graft.functions.Num.cents(col("l_extendedprice")),
      "flag", "revenue_cents")

  val oracles: Map[String, String] = Map(
    "skew_salted_sum" ->
      """SELECT l_returnflag AS flag,
        |       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem GROUP BY 1""".stripMargin)
}
