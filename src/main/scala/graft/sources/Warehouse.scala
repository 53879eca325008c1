package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Num

/** Bucketed-warehouse layout — the shuffle-elimination path for repeated
  * fact-to-fact joins (SURVEY §7.3 step notes; builder brief "bucketing for
  * co-located joins").
  *
  * At 100 TB the lineitem↔orders join is the dominant shuffle: both sides
  * repartition on the order key for every query. Writing both tables bucketed
  * (and sorted) by that key once moves the shuffle to ingest time — every
  * subsequent equi-join on the key is planned as a zero-exchange sort-merge
  * join over co-located buckets (WarehouseSpec asserts the plan). Bucket
  * count scales with cluster size (buckets ≈ executors × cores-per-executor
  * × small factor); 8 here for local[4].
  */
object Warehouse {

  def ensureBucketed(spark: SparkSession, sfDir: String, buckets: Int = 8): Unit = {
    freshTable(spark, "lineitem_bkt") {
      Tables.lineitem(spark, sfDir).write
        .format("parquet")
        .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_bkt")
    }
    freshTable(spark, "orders_bkt") {
      Tables.orders(spark, sfDir).write
        .format("parquet")
        .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_bkt")
    }
  }

  /** Create the table unless already registered; an orphaned warehouse
    * location (fresh in-memory catalog, stale dir from a prior JVM) is
    * removed first — saveAsTable refuses to reuse it otherwise.
    */
  private def freshTable(spark: SparkSession, name: String)(write: => Unit): Unit = {
    if (!spark.catalog.tableExists(name)) {
      val whDir = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      val loc = new java.io.File(whDir, name)
      if (loc.exists()) delete(loc)
      write
    }
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete()
  }

  /** Order revenue via the co-located join: no exchange on either side. */
  def colocatedOrderRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    ensureBucketed(spark, sfDir)
    val li = spark.table("lineitem_bkt")
    val o = spark.table("orders_bkt")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderkey").as("order_id"), col("o_orderstatus").as("status"))
      .agg(
        count(lit(1)).as("line_count"),
        Num.dollars(sum(Num.cents(col("l_extendedprice")))).as("line_revenue"))
  }
}
