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

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    // the 100-TB star-join shape: the fact is partitioned on a derived key,
    // the filter lives on the DIMENSION — static pruning can't see it, so
    // Catalyst must inject a runtime subquery filter into the fact scan
    // (spark.sql.optimizer.dynamicPartitionPruning, on by default)
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toFile.getAbsolutePath
    Tables.lineitem(spark, sf)
      .withColumn("ship_year", year(col("l_shipdate")))
      .write.partitionBy("ship_year").mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    // dimension filter must be DATA-dependent (order volume), not an
    // equality on the join key — an equality would propagate through the
    // join constraint into STATIC pruning and prove nothing about DPP
    val dim = Tables.orders(spark, sf)
      .groupBy(year(col("o_orderdate")).as("ship_year"))
      .agg(count(lit(1)).as("cnt"))
    val cutoff = dim.agg(max(col("cnt"))).collect().head.getLong(0)
    val q = fact.join(dim.where(col("cnt") === cutoff), Seq("ship_year"))
      .agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic-pruning subquery in the fact scan:\n$plan")
    val busiestYears = dim.where(col("cnt") === cutoff)
      .collect().map(_.getInt(0)).toSet
    val expected = Tables.lineitem(spark, sf)
      .where(year(col("l_shipdate")).isInCollection(busiestYears)).count()
    assert(q.collect().head.getLong(0) == expected)
  }

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete()
  }

  test("small-file compaction: fewer, even files; identical content; atomic swap") {
    val path = "target/compact_test"
    rmTree(new java.io.File(path))
    val src = Tables.lineitem(spark, sf).select("l_orderkey", "l_linenumber", "l_quantity")
    // fragment: 48 tiny files
    src.repartition(48).write.mode("overwrite").parquet(path)
    val beforeHash = spark.read.parquet(path)
      .agg(sum((col("l_orderkey") * col("l_quantity")).cast("long"))).collect().head.getLong(0)
    val beforeCount = spark.read.parquet(path).count()
    // target sized so the table needs ~4 files
    val totalBytes = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val (nBefore, nAfter, rows) =
      Warehouse.compactSmallFiles(spark, path, targetBytes = totalBytes / 4)
    assert(nBefore == 48, s"fragmented table should have 48 files, had $nBefore")
    assert(nAfter <= 6 && nAfter >= 3, s"expected ~4-5 compacted files, got $nAfter")
    assert(rows == beforeCount)
    val after = spark.read.parquet(path)
    assert(after.count() == beforeCount)
    assert(after.agg(sum((col("l_orderkey") * col("l_quantity")).cast("long")))
      .collect().head.getLong(0) == beforeHash, "content changed under compaction")
    // no stale temp/old dirs left behind
    assert(!new java.io.File(path + ".compact_tmp").exists())
    assert(!new java.io.File(path + ".compact_old").exists())
    rmTree(new java.io.File(path))
  }

  test("interrupted compaction swap recovers: table restored from the aside dir") {
    val path = "target/compact_crash_test"
    rmTree(new java.io.File(path))
    Tables.nation(spark, sf).write.mode("overwrite").parquet(path)
    val rows = spark.read.parquet(path).count()
    // simulate a crash between move-aside and move-in: table only in .compact_old
    java.nio.file.Files.move(
      new java.io.File(path).toPath,
      new java.io.File(path + ".compact_old").toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    new java.io.File(path + ".compact_tmp").mkdirs() // stale partial write
    assert(!new java.io.File(path).exists())
    Warehouse.repairInterruptedCompaction(path)
    assert(spark.read.parquet(path).count() == rows, "table lost after repair")
    assert(!new java.io.File(path + ".compact_old").exists())
    assert(!new java.io.File(path + ".compact_tmp").exists())
    // a full compaction entered mid-crash also self-repairs
    java.nio.file.Files.move(
      new java.io.File(path).toPath,
      new java.io.File(path + ".compact_old").toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    val (_, _, n) = Warehouse.compactSmallFiles(spark, path)
    assert(n == rows)
    rmTree(new java.io.File(path))
  }
}
