package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a single query in isolation (3 runs). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    args.foreach { name =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime() // construction (incl. eager driver loops)
        val n = df.count()
        val t2 = System.nanoTime()
        println(f"[timeone] $name run$i: ${(t2 - t0) / 1e9}%.2f s " +
          f"(construct ${(t1 - t0) / 1e9}%.2f s, action ${(t2 - t1) / 1e9}%.2f s, $n rows)")
      }
    }
    spark.stop()
  }
}
