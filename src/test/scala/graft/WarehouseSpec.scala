package graft

import graft.sources.{Tables, Warehouse}
import graft.functions.Num
import org.apache.spark.sql.functions._

/** Bucketed co-located join: correct results AND the plan property that
  * justifies it — no shuffle exchange on either join side.
  */
class WarehouseSpec extends SparkTestBase {

  test("bucketed join produces no shuffle exchange and matches shuffle join") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Warehouse.colocatedOrderRevenue(spark, sf)
      val plan = df.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected zero shuffle exchanges in bucketed join plan:\n$plan")

      // same result as the plain shuffle join on the raw parquet
      val raw = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey").as("order_id"), col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("line_count"),
          Num.dollars(sum(Num.cents(col("l_extendedprice")))).as("line_revenue"))
      assert(df.exceptAll(raw).isEmpty && raw.exceptAll(df).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("date-partitioned layout turns the ship-date predicate into partition pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toFile.getAbsolutePath
    Tables.lineitem(spark, sf)
      .withColumn("ship_year", year(col("l_shipdate")))
      .write.partitionBy("ship_year").mode("overwrite").parquet(dir)

    val q = spark.read.parquet(dir).where(col("ship_year") === 1997)
      .agg(count(lit(1)).as("n"))
    val scan = q.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters") && scan.contains("ship_year"),
      s"expected partition filters in scan:\n$scan")

    val expected = Tables.lineitem(spark, sf)
      .where(year(col("l_shipdate")) === 1997).count()
    assert(q.collect().head.getLong(0) == expected)
  }
}
