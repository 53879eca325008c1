package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Layout
import graft.sources.Tables

/** Proves the z-order layout actually buys multi-dimensional data-skipping
  * on the real table: partition a frame 16 ways under two layouts and count
  * how many partitions a single-dimension predicate touches. A partition
  * stands in for a file; "touched partitions" is exactly what min/max file
  * stats would admit.
  */
class LayoutSpec extends SparkTestBase {

  private lazy val z = Layout.zorderKey(Tables.lineitem(spark, sf)).cache()
  private val nParts = 16

  /** Partitions (= files) containing at least one row matching `pred` when
    * the data is range-partitioned and sorted on `sortCol`.
    */
  private def touched(df: DataFrame, sortCol: String, pred: org.apache.spark.sql.Column): Long =
    df.repartitionByRange(nParts, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .select(col("dq"), col("sq"), spark_partition_id().as("pid"))
      .where(pred)
      .select("pid").distinct().count()

  test("z-order prunes on BOTH dimensions; a linear sort prunes on one") {
    // quarter-2 band of each dimension (tile-aligned: top two bits = 10)
    val dqBand = col("dq").between(32768, 49151)
    val sqBand = col("sq").between(32768, 49151)

    // date-sorted layout: perfect pruning on the sort dim...
    assert(touched(z, "dq", dqBand) <= 6)
    // ...and NONE on the other — every partition spans the full sq range
    assert(touched(z, "dq", sqBand) == nParts)

    // z-order: BOTH single-dim bands touch well under all partitions
    val zd = touched(z, "zvalue", dqBand)
    val zs = touched(z, "zvalue", sqBand)
    assert(zd <= 8, s"z-layout should bound dq-band partitions, got $zd")
    assert(zs <= 8, s"z-layout should bound sq-band partitions, got $zs")

    // the 2-dim box prunes multiplicatively under z (quarter x quarter of
    // the plane ~ 1/16 of the curve), far below the linear layout's floor
    val zBox = touched(z, "zvalue", dqBand && sqBand)
    assert(zBox <= 4, s"2-dim box under z-order touched $zBox partitions")
  }

  test("zvalue is a bijective interleave: distinct (dq, sq) gives distinct zvalue") {
    val n = z.select("dq", "sq").distinct().count()
    val nz = z.select("zvalue").distinct().count()
    assert(n == nz, s"interleave must be injective: $n grid cells vs $nz zvalues")
  }
}
