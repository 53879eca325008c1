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
}
