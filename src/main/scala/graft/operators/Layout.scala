package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: multi-dimensional clustering keys for
  * data-skipping. The reference serves its marts from a warehouse whose
  * clustering is server-side (BigQuery table clustering); the Spark-native
  * equivalent is writing files Z-ORDERED on the filter dimensions so
  * min/max file statistics prune multi-dimensional predicates — the
  * lakehouse layout primitive (public Delta/Iceberg feature; the interleave
  * math itself is the classic Morton code).
  *
  * Why a linear sort is not enough: files sorted by `l_shipdate` alone give
  * perfect pruning on date predicates and NONE on supplier predicates —
  * every file spans the whole supplier range. Interleaving the bits of both
  * dimensions gives every file a narrow range in BOTH (locality of the
  * Z-curve), so a (date AND supplier) box predicate prunes multiplicatively.
  * LayoutSpec measures exactly that on real data.
  */
object Layout {

  private val Bits = 16

  /** Morton-interleave two [[Bits]]-bit ints: bit b of x lands at 2b, of y
    * at 2b+1. Pure shift/mask integer expression — whole-stage codegen, and
    * bit-identical in the DuckDB oracle (same operators, same widths).
    */
  private def morton(x: Column, y: Column): Column =
    (0 until Bits).map { b =>
      (shiftright(x, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b))) +
        (shiftright(y, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1)))
    }.reduce(_ + _)

  /** Range-map column `v` from [lo, hi] onto the [[Bits]]-bit grid with
    * exact integer arithmetic (the `div` keeps both engines on truncated
    * integer division; hi == lo degenerates to 0). Takes column NAMES —
    * the div expression is built as SQL text.
    */
  private def quantize(v: String, lo: String, hi: String): Column =
    when(col(hi) > col(lo),
      expr(s"(($v - $lo) * ${(1 << Bits) - 1}) div ($hi - $lo)"))
      .otherwise(lit(0L))

  /** `zorder_key`: the Z-order clustering key over
    * (l_shipdate, l_suppkey) for every lineitem row — date as epoch days,
    * both dimensions range-mapped onto a 16-bit grid from their actual
    * min/max (one tiny scalar aggregate, broadcast as a subquery), then
    * Morton-interleaved into one BIGINT. Writing with
    * `repartitionByRange($"zvalue").sortWithinPartitions($"zvalue")`
    * clusters files so BOTH dimensions carry narrow per-file min/max
    * stats. The key computation is one codegen'd projection — at 100 TB it
    * runs at scan speed; the range exchange is the same one any sorted
    * write pays.
    */
  def zorderKey(lineitem: DataFrame): DataFrame = {
    val base = lineitem.select(
      col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
      datediff(col("l_shipdate"), lit("1970-01-01").cast("date"))
        .cast("long").as("d"),
      col("l_suppkey").as("s"))
    val bounds = base.agg(
      min(col("d")).as("d_lo"), max(col("d")).as("d_hi"),
      min(col("s")).as("s_lo"), max(col("s")).as("s_hi"))
    base.crossJoin(broadcast(bounds))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        quantize("d", "d_lo", "d_hi").as("dq"),
        quantize("s", "s_lo", "s_hi").as("sq"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("dq"), col("sq"),
        morton(col("dq"), col("sq")).as("zvalue"))
  }

  val oracles: Map[String, String] = Map(
    "zorder_key" -> {
      val interleave = (0 until Bits).map { b =>
        s"((dq >> $b) & 1) * ${1L << (2 * b)} + ((sq >> $b) & 1) * ${1L << (2 * b + 1)}"
      }.mkString(" + ")
      s"""WITH base AS (
         |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         |         CAST(date_diff('day', DATE '1970-01-01', l_shipdate) AS BIGINT) AS d,
         |         l_suppkey AS s
         |  FROM lineitem),
         |b AS (
         |  SELECT MIN(d) AS d_lo, MAX(d) AS d_hi, MIN(s) AS s_lo, MAX(s) AS s_hi
         |  FROM base),
         |q AS (
         |  SELECT l_orderkey, l_linenumber,
         |         CASE WHEN d_hi > d_lo
         |              THEN ((d - d_lo) * 65535) // (d_hi - d_lo) ELSE 0 END AS dq,
         |         CASE WHEN s_hi > s_lo
         |              THEN ((s - s_lo) * 65535) // (s_hi - s_lo) ELSE 0 END AS sq
         |  FROM base CROSS JOIN b)
         |SELECT l_orderkey, l_linenumber, CAST(dq AS BIGINT) AS dq,
         |       CAST(sq AS BIGINT) AS sq,
         |       CAST($interleave AS BIGINT) AS zvalue
         |FROM q""".stripMargin
    })
}
